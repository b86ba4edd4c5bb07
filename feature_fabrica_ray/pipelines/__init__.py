"""End-to-end pipelines: validation suite runner, uniqueness shuffle,
dedup, similarity search, text analysis."""

from .uniqueness import uniqueness_violations
from .validate import (ValidationResult, bind_baselines, compute_baseline,
                       run_suite)

__all__ = ["run_suite", "ValidationResult", "compute_baseline", "bind_baselines",
           "uniqueness_violations"]
