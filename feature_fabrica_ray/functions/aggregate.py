"""Grouped window-reduce (reference: feature_fabrica/transform/aggregate.py).

``GroupByReduce`` has SQL window-function semantics — ``f(x) OVER
(PARTITION BY key)``: group rows by the key column, reduce per group, then
broadcast the group result back to every member row; output row count ==
input row count (reference: aggregate.py:67-111, broadcast-back at
:107-109).

In Ray this is a SHUFFLE stage, not a per-batch map: the planner executes
it as ``ds.groupby(key).map_groups(...)`` (hash partition on the key). Row
ORDER is not preserved across the shuffle — correctness comparisons must be
key-based (SURVEY.md §7.3). The per-group reduction itself is vectorized
numpy/pandas inside each group.

Skew note (100 TB): ``map_groups`` materializes one group per task; for
Zipf-hot keys the planner's two-step variant (partial per-block pair
aggregation -> tiny groupby -> broadcast-join back) should be preferred for
algebraic reductions (sum/mean/min/max) — implemented in
stages/executor.py as the default for those reductions."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .base import Transformation, TransformationError

__all__ = ["GroupByReduce", "GROUP_REDUCTIONS"]


def _mode(s: pd.Series):
    # smallest most-frequent value (scipy.stats.mode semantics used by the
    # reference, aggregate.py:50-57)
    vc = s.value_counts()
    top = vc[vc == vc.iloc[0]].index
    return min(top)


GROUP_REDUCTIONS = {
    "sum": lambda s: s.sum(),
    "mean": lambda s: s.mean(),
    "min": lambda s: s.min(),
    "max": lambda s: s.max(),
    "median": lambda s: s.median(),
    "mode": _mode,
    "count": lambda s: s.size,
    "concat": lambda s: "".join(s.astype(str)),
}

# reductions expressible as partial-per-block + merge (no group
# materialization needed; used by the scalable two-step path)
ALGEBRAIC = {"sum", "mean", "min", "max", "count"}
__all__.append("ALGEBRAIC")


class GroupByReduce(Transformation):
    """Declarative node only: captures (key_feature, agg) plus an optional
    inner transformation chain applied to the data column before reduction
    (reference: aggregate.py:67-91). The planner lowers it to a shuffle —
    its ``execute`` is the within-group reducer used by map_groups."""

    _name_ = "group_reduce"
    _ref_params_ = ("key_feature",)

    def __init__(self, key_feature: str, agg: str = "mean"):
        if agg not in GROUP_REDUCTIONS:
            raise TransformationError(
                f"group_reduce agg {agg!r} not in {sorted(GROUP_REDUCTIONS)}")
        self.key_feature = key_feature
        self.agg = agg

    @property
    def is_shuffle(self) -> bool:
        return True

    def reduce_group(self, values: pd.Series):
        return GROUP_REDUCTIONS[self.agg](values)

    def execute(self, data):  # pragma: no cover - lowered by the planner
        raise TransformationError(
            "group_reduce is a shuffle stage; it must be lowered by the planner, "
            "not executed per batch")
