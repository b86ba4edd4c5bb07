"""Checkpointed, resumable validation runs — the north rule's
per-partition lineage + resume-skips-completed-partitions story.

Sharding model: the input is processed as independent SHARDS (at 100 TB:
one shard per input-file group / key range; here: a deterministic slice
predicate over the synthetic table). Each shard runs the full suite and
atomically commits

    {out_dir}/shard={id}/verdicts.parquet     per-check, per-pid verdicts
    {out_dir}/shard={id}/violations.parquet   violation rows
    {out_dir}/shard={id}/lineage.json         rows, wall_s, per-pid xor
                                              content digests, suite spec
    {out_dir}/shard={id}/_SUCCESS             commit marker (written last)

A re-run skips every shard whose ``_SUCCESS`` exists (crash-and-restart
= finish the remaining shards only). ``merge_results`` folds the shard
outputs into the global verdict — counts add, digests xor, violations
concatenate — all keyed by (check, pid), never by row order, so the
merged result is byte-stable across shard counts and parallelism levels
(pytest asserts sharded == unsharded).
"""

from __future__ import annotations

import json
import os
import threading
import time
from collections.abc import Callable

import numpy as np
import pandas as pd

from ..checks.suite import CheckSuite
from .validate import (ValidationResult, drift_metric_from_state,
                       freshness_verdict_from_state,
                       group_stats_verdict_from_state, merge_drift_states,
                       merge_freshness_states, merge_group_stats_states,
                       distinct_verdict_from_state, merge_distinct_states,
                       merge_quantile_states, merge_sketch_states,
                       merge_shape_states, shape_verdict_from_state,
                       merge_top_share_states, top_share_verdict_from_state,
                       quantile_verdict_from_state, run_suite,
                       stats_row_from_state)


def _encode_state(state: dict) -> dict:
    import base64

    return {k: (base64.b64encode(v).decode() if isinstance(v, bytes) else v)
            for k, v in state.items()}


def _decode_state(state: dict) -> dict:
    import base64

    return {k: (base64.b64decode(v) if k in ("hll", "tdigest", "ss") else v)
            for k, v in state.items()}

def _suite_thresholds(suite: CheckSuite) -> dict[str, float]:
    """check name -> max_violation_rate (checks without one are
    zero-tolerance; drift checks are handled via their own state)."""
    thr: dict[str, float] = {}
    for c in suite.row_checks + suite.referential_checks + suite.unique_checks:
        thr[c.name] = float(getattr(c, "max_violation_rate", 0.0))
    return thr


def _suite_severities(suite: CheckSuite) -> dict[str, str]:
    """check name -> severity, so merged verdicts keep warn/error."""
    sev: dict[str, str] = {}
    for c in (suite.row_checks + suite.referential_checks
              + suite.unique_checks + suite.drift_checks
              + suite.schema_checks
              + getattr(suite, "freshness_checks", [])
              + getattr(suite, "group_stats_checks", [])
              + getattr(suite, "quantile_checks", [])
              + getattr(suite, "distinct_checks", [])
              + getattr(suite, "shape_checks", [])
              + getattr(suite, "top_share_checks", [])):
        sev[c.name] = getattr(c, "severity", "error")
    return sev


__all__ = ["validate_resumable", "merge_results", "codetable_shards"]

_ROWS = "__rows__"


def codetable_shards(sf_dir: str, n_shards: int, replicate: int = 1,
                     with_size: bool = True) -> dict[str, Callable]:
    """Deterministic shard builders over the synthetic codetable: shard k
    holds rows with hash(path) % n_shards == k (content-derived, stable
    across runs — the stand-in for per-file shards).

    NOTE: the shard predicate hashes ``path``, a prefix of the uniqueness
    key (repo, path, commit) is NOT enough in general — duplicates of one
    key tuple share the same ``path`` hash, so they always land in one
    shard and per-shard uniqueness counts merge exactly. A custom shard
    predicate must likewise be a function of the dedup key."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..sources import read_codetable
    from ..state import hash64

    def make(k: int) -> Callable:
        def build():
            ds = read_codetable(sf_dir, replicate=replicate)

            def shard_filter(batch: pa.Table) -> pa.Table:
                h = hash64(batch.column("path")) % np.uint64(n_shards)
                t = batch.filter(pa.array(h == np.uint64(k)))
                if with_size:
                    t = t.append_column(
                        "size_bytes",
                        pc.utf8_length(t.column("content")).cast(pa.int64()))
                return t

            return ds.map_batches(shard_filter, batch_format="pyarrow",
                                  batch_size=None)

        return build

    return {f"{k:04d}": make(k) for k in range(n_shards)}


def _shard_dir(out_dir: str, shard_id: str) -> str:
    return os.path.join(out_dir, f"shard={shard_id}")


def validate_resumable(shards: dict[str, Callable], suite: CheckSuite,
                       out_dir: str, *, parents: dict | None = None,
                       num_partitions: int = 64,
                       key_columns: list[str] | None = None,
                       partition_col: str = "repo",
                       max_parallel_shards: int = 1) -> dict:
    """Run the suite per shard with checkpoint commit; returns
    {"completed": [...], "skipped": [...], "result": merged ValidationResult}.

    ``max_parallel_shards > 1`` runs that many shard pipelines from
    concurrent driver threads — shard outputs are independent
    directories with atomic commits, so parallelism changes nothing
    about resume semantics; it just lets Ray interleave the pipelines'
    tasks (same scheduler-filling effect as the suite's overlapped
    uniqueness pass)."""
    os.makedirs(out_dir, exist_ok=True)
    completed, skipped, todo = [], [], []
    for shard_id, build in shards.items():
        sdir = _shard_dir(out_dir, shard_id)
        if os.path.exists(os.path.join(sdir, "_SUCCESS")):
            skipped.append(shard_id)
        else:
            todo.append((shard_id, build))
    if max_parallel_shards > 1 and len(todo) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_parallel_shards) as pool:
            list(pool.map(lambda sb: _run_one_shard(
                sb[0], sb[1], suite, out_dir, parents, num_partitions,
                key_columns, partition_col), todo))
        completed = [sid for sid, _ in todo]
    else:
        for shard_id, build in todo:
            _run_one_shard(shard_id, build, suite, out_dir, parents,
                           num_partitions, key_columns, partition_col)
            completed.append(shard_id)
    return {"completed": completed, "skipped": skipped,
            "result": merge_results(out_dir)}


# Serializes plan-time Dataset construction across shard threads.
# ray.data.read_parquet's path resolution lazily imports
# fsspec.implementations.http; with aiohttp absent that import fails and
# is retried on every call, and two threads importing at once can observe
# a torn half-initialized module (plain ImportError instead of the
# ModuleNotFoundError Ray catches). Planning is milliseconds — execution,
# the part worth parallelizing, happens later under run_suite.
_PLAN_LOCK = threading.Lock()


def _run_one_shard(shard_id: str, build: Callable, suite: CheckSuite,
                   out_dir: str, parents, num_partitions,
                   key_columns, partition_col: str = "repo") -> None:
    sdir = _shard_dir(out_dir, shard_id)
    os.makedirs(sdir, exist_ok=True)
    t0 = time.perf_counter()
    with _PLAN_LOCK:
        ds = build()
    res = run_suite(ds, suite, parents=parents,
                    num_partitions=num_partitions, key_columns=key_columns,
                    partition_col=partition_col)
    wall = time.perf_counter() - t0
    res.verdicts.to_parquet(os.path.join(sdir, "verdicts.parquet"))
    res.violations.to_parquet(os.path.join(sdir, "violations.parquet"))
    lineage = {
        "shard": shard_id,
        "n_rows": int(res.n_rows),
        "wall_s": round(wall, 3),
        "digests": {str(k): int(v) for k, v in res.digests.items()},
        "checks": suite.all_names(),
        # per-check pass thresholds so the merger applies each check's
        # max_violation_rate to the MERGED rate (not hardcoded zero)
        "thresholds": _suite_thresholds(suite),
        "severities": _suite_severities(suite),
        # mergeable sketch state (KB-sized): lets the shard merger
        # rebuild exact global stats without re-reading any data
        "sketches": {name: _encode_state(st)
                     for name, st in res.sketch_state.items()},
        # mergeable drift state + baseline/threshold: the merger
        # recomputes the drift metric GLOBALLY from merged sketches
        "drift": res.drift_state,
        # mergeable per-segment max timestamps: the merger recomputes
        # freshness verdicts from MERGED maxima, not per-shard verdicts
        "freshness": res.freshness_state,
        # mergeable per-segment (rows, nulls) counts, same recompute rule
        "group_stats": res.group_stats_state,
        # mergeable t-digests + bounds: the merger recomputes each
        # quantile_bound verdict from the MERGED digest
        "quantile": {name: _encode_state(st)
                     for name, st in res.quantile_state.items()},
        # mergeable HLLs + bounds: distinct counts do NOT add across
        # shards, the merger recomputes from the MERGED sketch
        "distinct_bound": {name: _encode_state(st)
                           for name, st in res.distinct_state.items()},
        # mergeable Pébay M3/M4 moments + bounds: skewness/kurtosis do
        # NOT average across shards, the merger recomputes from the
        # MERGED moments
        "shape_bound": {name: _encode_state(st)
                        for name, st in res.shape_state.items()},
        # mergeable SpaceSaving sketches + counts: the top value of the
        # union needs the MERGED sketch, per-shard shares never combine
        "top_share": {name: _encode_state(st)
                      for name, st in res.top_share_state.items()},
    }
    tmp = os.path.join(sdir, "lineage.json.tmp")
    with open(tmp, "w") as f:
        json.dump(lineage, f)
    os.replace(tmp, os.path.join(sdir, "lineage.json"))
    # commit marker LAST: a crash before this point leaves no _SUCCESS,
    # so the rerun redoes the shard (writes above are idempotent)
    with open(os.path.join(sdir, "_SUCCESS"), "w") as f:
        f.write("ok\n")


def merge_results(out_dir: str) -> ValidationResult:
    """Fold all committed shards into the global result: violation counts
    add per (check, pid); rates and pass/fail are recomputed from the
    merged counts; digests xor; violations concatenate."""
    verdict_parts, violation_parts = [], []
    digests: dict[int, int] = {}
    sketch_parts: dict[str, list] = {}
    drift_parts: dict[str, list] = {}
    fresh_parts: dict[str, list] = {}
    gstats_parts: dict[str, list] = {}
    quantile_parts: dict[str, list] = {}
    distinct_parts: dict[str, list] = {}
    shape_parts: dict[str, list] = {}
    top_share_parts: dict[str, list] = {}
    thresholds: dict[str, float] = {}
    severities: dict[str, str] = {}
    n_rows = 0
    for name in sorted(os.listdir(out_dir)):
        sdir = os.path.join(out_dir, name)
        if not name.startswith("shard=") or \
                not os.path.exists(os.path.join(sdir, "_SUCCESS")):
            continue
        v = pd.read_parquet(os.path.join(sdir, "verdicts.parquet"))
        verdict_parts.append(v)
        violation_parts.append(pd.read_parquet(os.path.join(sdir, "violations.parquet")))
        with open(os.path.join(sdir, "lineage.json")) as f:
            lin = json.load(f)
        n_rows += lin["n_rows"]
        thresholds.update(lin.get("thresholds", {}))
        severities.update(lin.get("severities", {}))
        mask = (1 << 64) - 1
        for pid, d in lin.get("digests", {}).items():
            p = int(pid)
            acc = (digests.get(p, 0) & mask) ^ (int(d) & mask)
            digests[p] = acc - (1 << 64) if acc >= (1 << 63) else acc  # signed view
        for name, st in lin.get("sketches", {}).items():
            sketch_parts.setdefault(name, []).append(_decode_state(st))
        for name, st in lin.get("drift", {}).items():
            drift_parts.setdefault(name, []).append(st)
        for name, st in lin.get("freshness", {}).items():
            fresh_parts.setdefault(name, []).append(st)
        for name, st in lin.get("group_stats", {}).items():
            gstats_parts.setdefault(name, []).append(st)
        for name, st in lin.get("quantile", {}).items():
            quantile_parts.setdefault(name, []).append(_decode_state(st))
        for name, st in lin.get("distinct_bound", {}).items():
            distinct_parts.setdefault(name, []).append(_decode_state(st))
        for name, st in lin.get("shape_bound", {}).items():
            shape_parts.setdefault(name, []).append(_decode_state(st))
        for name, st in lin.get("top_share", {}).items():
            top_share_parts.setdefault(name, []).append(_decode_state(st))

    if not verdict_parts:
        empty = pd.DataFrame(columns=["check", "pid", "n_rows", "n_violations",
                                      "violation_rate", "metric", "passed"])
        return ValidationResult(verdicts=empty, violations=pd.DataFrame(),
                                stats=pd.DataFrame(), n_rows=0)
    allv = pd.concat(verdict_parts, ignore_index=True)
    merged = (allv.groupby(["check", "pid"], as_index=False)
              .agg(n_rows=("n_rows", "sum"), n_violations=("n_violations", "sum"),
                   metric=("metric", "max")))
    merged["severity"] = merged["check"].map(severities).fillna("error")
    merged["violation_rate"] = np.where(
        merged["n_rows"] > 0, merged["n_violations"] / merged["n_rows"], 0.0)
    # pass iff each check's own max_violation_rate holds on the MERGED
    # rate (checks without a persisted threshold are zero-tolerance);
    # violations with no counted rows (schema checks on empty shards)
    # can't hide behind a 0/0 rate
    merged["passed"] = (merged["violation_rate"] <=
                        merged["check"].map(thresholds).fillna(0.0).to_numpy()) \
        & ~((merged["n_rows"] == 0) & (merged["n_violations"] > 0))
    # drift verdicts: recompute the metric GLOBALLY from merged sketch
    # state (a per-shard max is not the global statistic, and a drift
    # failure carries n_violations=0 so the count rule can't see it)
    merged_drift = {name: merge_drift_states(parts)
                    for name, parts in drift_parts.items()}
    for name, dstate in merged_drift.items():
        metric = drift_metric_from_state(dstate)
        sel = merged["check"] == name
        merged.loc[sel, "metric"] = metric
        merged.loc[sel, "passed"] = metric <= dstate["threshold"]
    # freshness verdicts: recompute from MERGED per-segment maxima (a
    # sum of per-shard segment counts / a max of per-shard verdicts is
    # not the global answer; a segment stale in one shard may be fresh
    # in the union)
    merged_fresh = {name: merge_freshness_states(parts)
                    for name, parts in fresh_parts.items()}
    for name, st in merged_fresh.items():
        v = freshness_verdict_from_state(st)
        sel = merged["check"] == name
        merged.loc[sel, "n_rows"] = v["n_segments"]
        merged.loc[sel, "n_violations"] = v["n_stale"]
        merged.loc[sel, "violation_rate"] = v["rate"]
        merged.loc[sel, "metric"] = v["max_lag_s"]
        merged.loc[sel, "passed"] = v["passed"]
    # quantile_bound verdicts: recompute the quantile from the MERGED
    # t-digest (a per-shard max of quantile estimates is not the global
    # quantile; a quantile failure carries n_violations=0 like drift)
    merged_quant = {name: merge_quantile_states(parts)
                    for name, parts in quantile_parts.items()}
    for name, st in merged_quant.items():
        v = quantile_verdict_from_state(st)
        sel = merged["check"] == name
        merged.loc[sel, "metric"] = v["value"]
        merged.loc[sel, "passed"] = v["passed"]
    # distinct_bound verdicts: recompute the cardinality from the MERGED
    # HLL (per-shard distinct counts do not add: values recur across
    # shards; n_violations=0 like drift, the metric carries the verdict)
    merged_dist = {name: merge_distinct_states(parts)
                   for name, parts in distinct_parts.items()}
    for name, st in merged_dist.items():
        v = distinct_verdict_from_state(st)
        sel = merged["check"] == name
        merged.loc[sel, "metric"] = v["value"]
        merged.loc[sel, "passed"] = v["passed"]
    # shape_bound verdicts: recompute skewness/kurtosis from the MERGED
    # Pébay moments (per-shard statistics do not average; n_violations=0
    # like drift, the metric carries the statistic)
    merged_shape = {name: merge_shape_states(parts)
                    for name, parts in shape_parts.items()}
    for name, st in merged_shape.items():
        v = shape_verdict_from_state(st)
        sel = merged["check"] == name
        merged.loc[sel, "metric"] = v["value"]
        merged.loc[sel, "passed"] = v["passed"]
    # top_share verdicts: recompute the top share from the MERGED
    # SpaceSaving sketch + merged counts
    merged_ts = {name: merge_top_share_states(parts)
                 for name, parts in top_share_parts.items()}
    for name, st in merged_ts.items():
        v = top_share_verdict_from_state(st)
        sel = merged["check"] == name
        merged.loc[sel, "metric"] = v["value"]
        merged.loc[sel, "passed"] = v["passed"]
    # group_stats verdicts: same recompute-from-merged-counts rule (a
    # segment over threshold in one shard may be under it in the union)
    merged_gstats = {name: merge_group_stats_states(parts)
                     for name, parts in gstats_parts.items()}
    for name, st in merged_gstats.items():
        v = group_stats_verdict_from_state(st)
        sel = merged["check"] == name
        merged.loc[sel, "n_rows"] = v["n_segments"]
        merged.loc[sel, "n_violations"] = v["n_bad"]
        merged.loc[sel, "violation_rate"] = v["rate"]
        merged.loc[sel, "metric"] = v["worst_null_rate"]
        merged.loc[sel, "passed"] = v["passed"]
    violations = pd.concat(violation_parts, ignore_index=True) \
        if violation_parts else pd.DataFrame()
    if merged_gstats and len(violations):
        violations = violations[~violations["check"].isin(set(merged_gstats))]
    for name, st in merged_gstats.items():
        det = group_stats_verdict_from_state(st)["bad_details"]
        if det:
            vrows = pd.DataFrame({"pid": np.full(len(det), -1, np.int64),
                                  "check": name, "detail": det})
            cols = violations.columns if len(violations.columns) else vrows.columns
            violations = pd.concat([violations, vrows.reindex(columns=cols)],
                                   ignore_index=True)
    if merged_fresh and len(violations):
        # drop per-shard stale-segment rows and rebuild from merged maxima
        violations = violations[~violations["check"].isin(set(merged_fresh))]
    for name, st in merged_fresh.items():
        det = freshness_verdict_from_state(st)["stale_details"]
        if det:
            vrows = pd.DataFrame({"pid": np.full(len(det), -1, np.int64),
                                  "check": name, "detail": det})
            cols = violations.columns if len(violations.columns) else vrows.columns
            violations = pd.concat([violations, vrows.reindex(columns=cols)],
                                   ignore_index=True)
    # exact global stats from the per-shard mergeable sketches
    merged_state = {name: merge_sketch_states(parts)
                    for name, parts in sketch_parts.items()}
    stats = pd.DataFrame([stats_row_from_state(st)
                          for st in merged_state.values()])
    return ValidationResult(verdicts=merged, violations=violations,
                            stats=stats, n_rows=n_rows, digests=digests,
                            sketch_state=merged_state, drift_state=merged_drift,
                            quantile_state=merged_quant,
                            distinct_state=merged_dist)
