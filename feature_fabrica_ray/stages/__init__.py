"""Physical planning/execution of compiled specs over Ray Datasets."""

from .executor import FeatureEngine

__all__ = ["FeatureEngine"]
