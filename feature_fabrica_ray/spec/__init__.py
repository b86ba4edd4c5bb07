"""Spec layer: YAML loading, expression language, feature models, DAG."""

from .expressions import ExpressionError, parse_expression
from .models import (CompiledFeature, CyclicDependencyError, FeatureSpec,
                     SpecError, build_features, level_features)
from .yaml_loader import load_spec

__all__ = ["parse_expression", "ExpressionError", "FeatureSpec", "CompiledFeature",
           "build_features", "level_features", "CyclicDependencyError", "SpecError",
           "load_spec"]
