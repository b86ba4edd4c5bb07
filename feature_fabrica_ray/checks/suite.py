"""Check-suite spec: parse a YAML/dict list of checks into typed check
objects, split by execution strategy.

Strategies (SURVEY.md §4.3):
- row checks      -> fused single-pass ``map_batches`` violation masks
- referential     -> broadcast parent-key set -> becomes a row check
- unique          -> hash shuffle pipeline (checks/uniqueness.py)
- stats           -> mergeable sketch partials in the same single pass
- drift           -> fixed-edge histogram partials vs broadcast baseline
- schema          -> plan-time column/type assertion

Example spec::

    checks:
      - {type: not_null, column: lang}
      - {type: min_length, column: content, min_length: 1}
      - {type: regex, column: commit, pattern: "[0-9a-f]{32}"}
      - {type: unique, columns: [repo, path, commit]}
      - {type: referential, column: repo, parent: repos, parent_column: repo}
      - {type: stats, column: size_bytes, quantiles: [0.5, 0.95], distinct: true}
      - {type: quantile_bound, column: size_bytes, q: 0.95, max: 4096}
      - {type: distinct_bound, column: lang, min: 2, max: 50}
      - {type: shape_bound, column: size_bytes, stat: skewness, max: 5.0}
      - {type: top_share_bound, column: lang, max_share: 0.9}
      - {type: drift, column: size_bytes, method: psi, threshold: 0.2}
      - {type: schema, columns: {repo: string, lang: string}}
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml

from .row_checks import (_ROW_CHECKS, CheckSpecError, RowCheck,
                         build_row_check)

__all__ = ["CheckSuite", "UniqueCheck", "ReferentialCheck", "StatsCheck",
           "DriftCheck", "SchemaCheck", "FreshnessCheck", "GroupStatsCheck",
           "QuantileBoundCheck", "DistinctBoundCheck", "ShapeBoundCheck",
           "TopShareBoundCheck"]


@dataclass
class UniqueCheck:
    name: str
    columns: list[str]
    kind: str = "unique"
    max_violation_rate: float = 0.0
    severity: str = "error"


@dataclass
class ReferentialCheck:
    name: str
    column: str
    parent: str          # key into the `parents` mapping passed at run time
    parent_column: str
    kind: str = "referential"
    max_violation_rate: float = 0.0
    severity: str = "error"


@dataclass
class StatsCheck:
    name: str
    column: str
    quantiles: list[float] = field(default_factory=list)
    distinct: bool = False
    numeric: bool = True  # False -> categorical (distinct/freq only)
    shape: bool = False   # also sketch M3/M4 (skewness/kurtosis)
    top_share: bool = False  # also sketch SpaceSaving heavy hitters
    ss_k: int = 256          # SpaceSaving counter budget
    kind: str = "stats"


@dataclass
class DriftCheck:
    name: str
    column: str
    method: str = "psi"            # psi | ks
    threshold: float = 0.2
    categorical: bool = False
    bins: int = 64
    baseline: dict | None = None   # from ValidationRunner.compute_baseline
    kind: str = "drift"
    severity: str = "error"


@dataclass
class FreshnessCheck:
    """Per-segment staleness: max(ts_col) within each group_col segment
    must lag the explicit ``as_of`` instant by at most ``max_lag_s``
    seconds. ``as_of`` is part of the spec (not wall clock) so runs are
    deterministic and checkpoint-resumable; per-segment max timestamps
    are algebraic partials that merge across shards."""
    name: str
    column: str                    # timestamp column
    group: str                     # segment column
    as_of: str                     # ISO instant the lag is measured against
    max_lag_s: float = 3600.0
    kind: str = "freshness"
    severity: str = "error"


@dataclass
class GroupStatsCheck:
    """Per-segment null-rate threshold: within each ``group`` segment,
    nulls(column)/rows must stay <= ``max_null_rate``. Answers "WHICH
    segment is broken" declaratively; per-segment (rows, nulls) counts
    are algebraic partials that merge exactly across checkpoint
    shards."""
    name: str
    column: str
    group: str
    max_null_rate: float = 0.0
    kind: str = "group_stats"
    severity: str = "error"


@dataclass
class QuantileBoundCheck:
    """Distribution-shape bound: the ``q``-quantile of ``column`` must
    lie within [lo, hi] (e.g. "p95 of content size <= 4 KB"). The
    estimate comes from the suite's mergeable t-digest sketches, so the
    check costs no extra pass, works on checkpointed shards (the merger
    recomputes the quantile from the MERGED digest, never a per-shard
    max), and stays KB-sized at any data scale. The verdict's ``metric``
    column carries the estimated quantile. Empty/all-null columns pass
    with a NaN metric (no evidence of violation)."""
    name: str
    column: str
    q: float = 0.5
    lo: float = float("-inf")
    hi: float = float("inf")
    kind: str = "quantile_bound"
    severity: str = "error"


@dataclass
class DistinctBoundCheck:
    """Cardinality expectation: the number of distinct values of
    ``column`` must lie within [lo, hi] (e.g. "lang has 5-40 distinct
    values", "event_type has exactly 5"). Estimated from the suite's
    mergeable HyperLogLog sketches (<=0.82% rel. error at 2^14
    registers) — no extra pass, KB-sized at any scale, recomputed from
    the MERGED sketch on checkpointed shards. ``metric`` carries the
    estimate; bounds should leave margin for the HLL error."""
    name: str
    column: str
    lo: float = 0.0
    hi: float = float("inf")
    kind: str = "distinct_bound"
    severity: str = "error"


@dataclass
class ShapeBoundCheck:
    """Distribution-shape expectation: the ADJUSTED sample skewness or
    excess kurtosis (DuckDB skewness()/kurtosis() definitions) of
    ``column`` must lie within [lo, hi]. Computed EXACTLY from the fused
    pass's mergeable Pébay M3/M4 states (state/welford.py::
    HigherMoments) — no extra pass, 5 scalars per block, recomputed from
    the MERGED state on checkpointed shards (per-shard skewness does NOT
    average). ``metric`` carries the statistic."""
    name: str
    column: str
    stat: str = "skewness"         # skewness | kurtosis
    lo: float = float("-inf")
    hi: float = float("inf")
    kind: str = "shape_bound"
    severity: str = "error"


@dataclass
class TopShareBoundCheck:
    """Dominance / imbalance expectation: the share of the single most
    frequent non-null value of ``column`` must not exceed ``max_share``
    (e.g. "no one language is >90% of the corpus"). Estimated from the
    fused pass's mergeable SpaceSaving sketches (state/spacesaving.py)
    — exact when the sketch's k exceeds the column's distinct count,
    otherwise the estimate only ever OVERCOUNTS (so a pass is
    trustworthy; set max_share with margin for a borderline fail).
    ``metric`` carries the estimated top share."""
    name: str
    column: str
    max_share: float = 1.0
    k: int = 256
    kind: str = "top_share_bound"
    severity: str = "error"


@dataclass
class SchemaCheck:
    name: str
    columns: dict[str, str]        # name -> arrow type name (prefix match)
    strict: bool = False           # True: no extra columns allowed
    kind: str = "schema"
    severity: str = "error"


class CheckSuite:
    def __init__(self, spec: str | dict | list):
        if isinstance(spec, str):
            spec = yaml.safe_load(spec)
        if isinstance(spec, dict):
            spec = spec.get("checks", [])
        self.row_checks: list[RowCheck] = []
        self.unique_checks: list[UniqueCheck] = []
        self.referential_checks: list[ReferentialCheck] = []
        self.stats_checks: list[StatsCheck] = []
        self.drift_checks: list[DriftCheck] = []
        self.schema_checks: list[SchemaCheck] = []
        self.freshness_checks: list[FreshnessCheck] = []
        self.group_stats_checks: list[GroupStatsCheck] = []
        self.quantile_checks: list[QuantileBoundCheck] = []
        self.distinct_checks: list[DistinctBoundCheck] = []
        self.shape_checks: list[ShapeBoundCheck] = []
        self.top_share_checks: list[TopShareBoundCheck] = []
        for raw in spec:
            self._add(dict(raw))

    def _add(self, raw: dict) -> None:
        kind = raw.get("type")
        if kind in _ROW_CHECKS:  # builtins + user-registered subclasses
            self.row_checks.append(build_row_check(raw))
        elif kind == "unique":
            cols = raw["columns"]
            self.unique_checks.append(UniqueCheck(
                name=raw.get("name", f"unique:{'+'.join(cols)}"), columns=cols,
                max_violation_rate=raw.get("max_violation_rate", 0.0),
                severity=raw.get("severity", "error")))
        elif kind == "referential":
            self.referential_checks.append(ReferentialCheck(
                name=raw.get("name", f"referential:{raw['column']}"),
                column=raw["column"], parent=raw["parent"],
                parent_column=raw.get("parent_column", raw["column"]),
                max_violation_rate=raw.get("max_violation_rate", 0.0),
                severity=raw.get("severity", "error")))
        elif kind == "stats":
            self.stats_checks.append(StatsCheck(
                name=raw.get("name", f"stats:{raw['column']}"),
                column=raw["column"], quantiles=raw.get("quantiles", []),
                distinct=raw.get("distinct", False),
                numeric=raw.get("numeric", True)))
        elif kind == "drift":
            self.drift_checks.append(DriftCheck(
                name=raw.get("name", f"drift:{raw['column']}"),
                column=raw["column"], method=raw.get("method", "psi"),
                threshold=raw.get("threshold", 0.2),
                categorical=raw.get("categorical", False),
                bins=raw.get("bins", 64), baseline=raw.get("baseline"),
                severity=raw.get("severity", "error")))
        elif kind == "freshness":
            self.freshness_checks.append(FreshnessCheck(
                name=raw.get("name", f"freshness:{raw['column']}"),
                column=raw["column"], group=raw["group"],
                as_of=raw["as_of"],
                max_lag_s=float(raw.get("max_lag_s", 3600.0)),
                severity=raw.get("severity", "error")))
        elif kind == "group_stats":
            self.group_stats_checks.append(GroupStatsCheck(
                name=raw.get("name", f"group_stats:{raw['column']}"),
                column=raw["column"], group=raw["group"],
                max_null_rate=float(raw.get("max_null_rate", 0.0)),
                severity=raw.get("severity", "error")))
        elif kind == "quantile_bound":
            if "min" not in raw and "max" not in raw:
                raise CheckSpecError(
                    "quantile_bound needs at least one of min:/max:")
            q = float(raw.get("q", 0.5))
            if not 0.0 <= q <= 1.0:
                raise CheckSpecError(f"quantile_bound q must be in [0,1], got {q}")
            self.quantile_checks.append(QuantileBoundCheck(
                name=raw.get("name", f"quantile_bound:{raw['column']}@q{q}"),
                column=raw["column"], q=q,
                lo=float(raw.get("min", float("-inf"))),
                hi=float(raw.get("max", float("inf"))),
                severity=raw.get("severity", "error")))
        elif kind == "distinct_bound":
            if "min" not in raw and "max" not in raw:
                raise CheckSpecError(
                    "distinct_bound needs at least one of min:/max:")
            self.distinct_checks.append(DistinctBoundCheck(
                name=raw.get("name", f"distinct_bound:{raw['column']}"),
                column=raw["column"],
                lo=float(raw.get("min", 0.0)),
                hi=float(raw.get("max", float("inf"))),
                severity=raw.get("severity", "error")))
        elif kind == "shape_bound":
            if "min" not in raw and "max" not in raw:
                raise CheckSpecError(
                    "shape_bound needs at least one of min:/max:")
            stat = raw.get("stat", "skewness")
            if stat not in ("skewness", "kurtosis"):
                raise CheckSpecError(
                    f"shape_bound stat must be skewness|kurtosis, got {stat!r}")
            self.shape_checks.append(ShapeBoundCheck(
                name=raw.get("name", f"shape_bound:{raw['column']}@{stat}"),
                column=raw["column"], stat=stat,
                lo=float(raw.get("min", float("-inf"))),
                hi=float(raw.get("max", float("inf"))),
                severity=raw.get("severity", "error")))
        elif kind == "top_share_bound":
            if "max_share" not in raw:
                raise CheckSpecError("top_share_bound needs max_share:")
            ms = float(raw["max_share"])
            if not 0.0 < ms <= 1.0:
                raise CheckSpecError(
                    f"top_share_bound max_share must be in (0,1], got {ms}")
            self.top_share_checks.append(TopShareBoundCheck(
                name=raw.get("name", f"top_share_bound:{raw['column']}"),
                column=raw["column"], max_share=ms,
                k=int(raw.get("k", 256)),
                severity=raw.get("severity", "error")))
        elif kind == "schema":
            self.schema_checks.append(SchemaCheck(
                name=raw.get("name", "schema"), columns=raw["columns"],
                strict=raw.get("strict", False),
                severity=raw.get("severity", "error")))
        else:
            raise CheckSpecError(f"unknown check type {kind!r}")

    def all_names(self) -> list[str]:
        return ([c.name for c in self.row_checks]
                + [c.name for c in self.unique_checks]
                + [c.name for c in self.referential_checks]
                + [c.name for c in self.stats_checks]
                + [c.name for c in self.drift_checks]
                + [c.name for c in self.schema_checks]
                + [c.name for c in self.freshness_checks]
                + [c.name for c in self.group_stats_checks]
                + [c.name for c in self.quantile_checks]
                + [c.name for c in self.distinct_checks]
                + [c.name for c in self.shape_checks]
                + [c.name for c in self.top_share_checks])
