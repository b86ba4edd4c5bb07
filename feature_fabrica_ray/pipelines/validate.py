"""The validation runner — executes a CheckSuite over a Ray Dataset in as
few streaming passes as the check semantics allow.

Physical plan (north rule; SURVEY.md §3.4, §4.3):

- PASS 1 (single fused ``map_batches``, zero-copy Arrow): per batch —
  deterministic partition id ``pid = hash64(partition_col) % P``; all row
  checks (incl. referential lowered to a broadcast membership test) as
  vectorized violation masks; per-(pid, check) violation counts; mergeable
  sketch partials (Welford / HLL / t-digest / fixed-edge histograms) for
  stats + drift. The pass emits ONLY small records (violations + counts +
  sketches), so the output is materialized once and consumed repeatedly
  without re-running the input pipeline; the 100 TB input itself streams
  through with backpressure and is never pinned.
- PASS 2 (uniqueness, only if requested): hash-shuffle pipeline over the
  pruned key-hash column — see checks/uniqueness.py.
- Driver: merge KB-sized sketches, assemble per-partition and global
  verdicts.

Partition ids are content-derived (hash of ``partition_col``), NOT block
ids — stable across parallelism levels, which is what makes verdicts
byte-comparable between N- and 4N-CPU runs and lets checkpoint resume key
off them."""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..checks.row_checks import MembershipCheck, RowCheck
from ..checks.suite import CheckSuite, DriftCheck, StatsCheck
from ..state import (HLL, CategoricalFreq, HigherMoments, Moments,
                     NumericHistogram, SpaceSaving, TDigest,
                     hash64, ks_from_counts, psi_categorical, psi_from_counts)
from .uniqueness import uniqueness_violations

__all__ = ["ValidationResult", "run_suite", "compute_baseline",
           "pk_candidate_profile",
           "profile_table", "stats_row_from_state", "merge_sketch_states",
           "drift_metric_from_state", "merge_drift_states",
           "merge_freshness_states", "freshness_verdict_from_state",
           "merge_group_stats_states", "group_stats_verdict_from_state",
           "merge_quantile_states", "quantile_verdict_from_state",
           "merge_distinct_states", "distinct_verdict_from_state",
           "merge_shape_states", "shape_verdict_from_state",
           "merge_top_share_states", "top_share_verdict_from_state",
           "infer_checks"]

_ROWS = "__rows__"
_SCOPE_PREFIX = "__scope__:"   # per-check in-scope row counts (where:)


@dataclass
class ValidationResult:
    verdicts: pd.DataFrame          # check, pid, n_rows, n_violations, rate, metric, passed
    violations: pd.DataFrame        # pid, check, detail + key columns
    stats: pd.DataFrame             # one row per stats column
    n_rows: int = 0
    baselines: dict = field(default_factory=dict)
    digests: dict = field(default_factory=dict)  # pid -> xor content digest (int)
    sketch_state: dict = field(default_factory=dict)  # check -> mergeable state
    drift_state: dict = field(default_factory=dict)  # drift check -> freq/hist + threshold
    freshness_state: dict = field(default_factory=dict)  # check -> seg max-ts (us) + spec
    pid_rows: dict = field(default_factory=dict)  # pid -> row count (skew diagnostics)
    group_stats_state: dict = field(default_factory=dict)  # check -> seg (rows, nulls)
    quantile_state: dict = field(default_factory=dict)  # quantile_bound -> tdigest + bounds
    distinct_state: dict = field(default_factory=dict)  # distinct_bound -> hll + bounds
    shape_state: dict = field(default_factory=dict)  # shape_bound -> Pébay M3/M4 + bounds
    top_share_state: dict = field(default_factory=dict)  # top_share_bound -> SpaceSaving + n

    @property
    def passed(self) -> bool:
        v = self.verdicts
        if "severity" in v.columns:   # warn-severity failures don't gate
            return bool((v["passed"] | (v["severity"] == "warn")).all())
        return bool(v["passed"].all())

    def global_verdicts(self) -> pd.DataFrame:
        return self.verdicts[self.verdicts["pid"] == -1].reset_index(drop=True)

    def partition_skew(self) -> dict:
        """Partition-balance diagnostics from the per-pid row counts:
        ``max/mean`` is the straggler factor an all-to-all shuffle or
        per-partition writer would see (1.0 = perfectly balanced). Use
        it to decide whether the partition key needs salting before
        scaling a run up."""
        if not self.pid_rows:
            return {"partitions": 0, "rows": 0, "max_over_mean": 1.0,
                    "cv": 0.0}
        c = np.array(list(self.pid_rows.values()), dtype=np.float64)
        mean = float(c.mean())
        return {"partitions": int(len(c)), "rows": int(c.sum()),
                "max_over_mean": float(c.max() / mean) if mean else 1.0,
                "cv": float(c.std() / mean) if mean else 0.0}


def _union_schema(key_columns: list[str]) -> pa.Schema:
    fields = [("record_type", pa.string()), ("pid", pa.int32()),
              ("check", pa.string()), ("detail", pa.string()),
              ("n_rows", pa.int64()), ("n_viol", pa.int64()),
              ("column", pa.string()), ("sketch_kind", pa.string()),
              ("payload", pa.binary())]
    return pa.schema([(k, pa.string()) for k in key_columns] + fields)


def _empty_cols(schema: pa.Schema, n: int) -> dict:
    """Default record fields: ints are 0 (nullable int64 would round-trip
    through pandas as float64 and corrupt 64-bit digest values), the rest
    null."""
    return {f.name: (pa.array(np.zeros(n, np.int64))
                     if pa.types.is_integer(f.type) else pa.nulls(n, f.type))
            for f in schema}


class _ValidatorStage:
    """The fused pass-1 batch function. Pure w.r.t. the batch (idempotent
    under Ray task retries); all state (check objects, broadcast parent key
    sets, baseline edges) is baked into the serialized closure once."""

    def __init__(self, row_checks: list[RowCheck], stats_checks: list[StatsCheck],
                 drift_checks: list[DriftCheck], partition_col: str,
                 num_partitions: int, key_columns: list[str]):
        self.row_checks = row_checks
        self.stats_checks = stats_checks
        self.drift_checks = drift_checks
        self.partition_col = partition_col
        self.P = num_partitions
        self.key_columns = key_columns
        self.schema = _union_schema(key_columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        pid = (hash64(batch.column(self.partition_col)) % np.uint64(self.P)).astype(np.int32)
        out_tables: list[pa.Table] = []

        # per-pid row counts (denominator for violation rates)
        pids, counts = np.unique(pid, return_counts=True)
        out_tables.append(self._records(
            record_type="counts", pid=pids.tolist(), check=[_ROWS] * len(pids),
            n_rows=counts.tolist(), n_viol=[0] * len(pids)))

        # per-pid content digest (xor of row sha hashes — order-independent,
        # mergeable across batches/shards; the lineage/resume fingerprint)
        if "content_sha256" in batch.column_names:
            h = hash64(batch.column("content_sha256"))
            acc = np.zeros(len(pids), np.uint64)
            pid_index = np.searchsorted(pids, pid)
            np.bitwise_xor.at(acc, pid_index, h)
            out_tables.append(self._records(
                record_type="digest", pid=pids.tolist(),
                check=["__digest__"] * len(pids),
                n_rows=acc.view(np.int64).tolist(), n_viol=[0] * len(pids)))

        for chk in self.row_checks:
            mask = chk.mask(batch)
            if chk.where is not None:
                # scoped check: violations only inside the scope; emit the
                # per-pid IN-SCOPE counts as this check's own denominator
                sm = chk.scope_mask(batch)
                mask = pc.and_(mask, sm)
                sm_np = np.asarray(sm.to_numpy(zero_copy_only=False), dtype=bool)
                sp, sc_counts = np.unique(pid[sm_np], return_counts=True)
                if len(sp):
                    out_tables.append(self._records(
                        record_type="counts", pid=sp.tolist(),
                        check=[_SCOPE_PREFIX + chk.name] * len(sp),
                        n_rows=sc_counts.tolist(), n_viol=[0] * len(sp)))
            mask_np = np.asarray(mask.to_numpy(zero_copy_only=False), dtype=bool)
            nv = int(mask_np.sum())
            if nv:
                # violation rows: key columns + detail
                viol = batch.filter(mask)
                keys = {k: viol.column(k).cast(pa.string()) for k in self.key_columns
                        if k in viol.column_names}
                vp, vc = np.unique(pid[mask_np], return_counts=True)
                out_tables.append(self._records(
                    record_type="counts", pid=vp.tolist(), check=[chk.name] * len(vp),
                    n_rows=[0] * len(vp), n_viol=vc.tolist()))
                cols = _empty_cols(self.schema, nv)
                for k, v in keys.items():
                    cols[k] = v
                cols["record_type"] = pa.array(["violation"] * nv)
                cols["pid"] = pa.array(pid[mask_np], pa.int32())
                cols["check"] = pa.array([chk.name] * nv)
                cols["detail"] = pa.array([chk.detail()] * nv)
                out_tables.append(pa.table(cols, schema=self.schema))

        for sc in self.stats_checks:
            col = batch.column(sc.column)
            sketches: dict[str, bytes] = {}
            if sc.numeric:
                vals = col.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
                m = Moments.from_array(vals)
                m.null_count = col.null_count
                sketches["moments"] = json.dumps(m.to_dict()).encode()
                if sc.quantiles:
                    sketches["tdigest"] = TDigest.from_array(vals).to_bytes()
                if getattr(sc, "shape", False):
                    sketches["hmom"] = json.dumps(
                        HigherMoments.from_array(vals).to_dict()).encode()
            else:
                m = Moments(count=n - col.null_count, null_count=col.null_count)
                sketches["moments"] = json.dumps(m.to_dict()).encode()
            if sc.distinct:
                sketches["hll"] = HLL().add_column(col).to_bytes()
            if getattr(sc, "top_share", False):
                vc = pc.value_counts(col.drop_null().combine_chunks())
                ss = SpaceSaving(getattr(sc, "ss_k", 256)).add_counts(
                    [str(v) for v in vc.field("values").to_pylist()],
                    vc.field("counts").to_pylist())
                sketches["ssketch"] = ss.to_bytes()
            for kind, payload in sketches.items():
                out_tables.append(self._records(
                    record_type="sketch", pid=[-1], check=[sc.name],
                    column=[sc.column], sketch_kind=[kind], payload=[payload]))

        for dc in self.drift_checks:
            col = batch.column(dc.column)
            if dc.categorical:
                vc = pc.value_counts(col.combine_chunks())
                freq = {("\0null" if v is None else str(v)): int(c)
                        for v, c in zip(vc.field("values").to_pylist(),
                                        vc.field("counts").to_pylist())}
                payload = json.dumps(freq).encode()
                kind = "catfreq"
            else:
                edges = np.asarray(dc.baseline["edges"], dtype=np.float64)
                h = NumericHistogram(edges).add(
                    col.drop_null().to_numpy(zero_copy_only=False).astype(np.float64))
                payload = json.dumps(h.to_dict()).encode()
                kind = "hist"
            out_tables.append(self._records(
                record_type="sketch", pid=[-1], check=[dc.name],
                column=[dc.column], sketch_kind=[kind], payload=[payload]))

        return pa.concat_tables(out_tables)

    def _records(self, **kw) -> pa.Table:
        n = next(len(v) for v in kw.values() if isinstance(v, (list, np.ndarray)))
        cols = _empty_cols(self.schema, n)
        for k, v in kw.items():
            if not isinstance(v, (list, np.ndarray)):
                v = [v] * n  # broadcast scalar field
            cols[k] = pa.array(list(v), self.schema.field(k).type)
        return pa.table(cols, schema=self.schema)


def stats_row_from_state(state: dict) -> dict:
    """One stats-report row from merged sketch state (shared by the
    single-pass runner and the checkpoint shard merger)."""
    m = Moments.from_dict(state["moments"])
    numeric = state["numeric"]
    row = {"column": state["column"], "count": m.count,
           "null_count": m.null_count, "null_rate": m.null_rate,
           "mean": m.mean if numeric else np.nan,
           "std": m.std if numeric else np.nan,
           "min": m.min if numeric else np.nan,
           "max": m.max if numeric else np.nan,
           "sum": m.sum if numeric else np.nan}
    if state.get("distinct"):
        row["distinct_est"] = HLL.from_bytes(state["hll"]).estimate()
    for q in state.get("quantiles", []):
        row[f"q{q}"] = TDigest.from_bytes(state["tdigest"]).quantile(q)
    return row


def merge_sketch_states(states: list[dict]) -> dict:
    """Associatively merge per-shard sketch states for one check."""
    out = dict(states[0])
    m = Moments.from_dict(states[0]["moments"])
    for s in states[1:]:
        m = m.merge(Moments.from_dict(s["moments"]))
    out["moments"] = m.to_dict()
    if out.get("distinct"):
        out["hll"] = HLL.merge_bytes([s["hll"] for s in states]).to_bytes()
    if out.get("quantiles"):
        out["tdigest"] = TDigest.merge_bytes(
            [s["tdigest"] for s in states]).to_bytes()
    return out


def quantile_verdict_from_state(state: dict) -> dict:
    """Verdict for one quantile_bound check from (merged) t-digest state —
    the single definition used by both the one-shot runner and the
    checkpoint shard merger, so merged shards get a quantile recomputed
    from the MERGED digest (a per-shard max of quantiles is not the
    global quantile). Empty/all-null data passes with a NaN metric."""
    val = TDigest.from_bytes(state["tdigest"]).quantile(state["q"])
    if np.isnan(val):
        return {"value": float("nan"), "passed": True}
    return {"value": float(val),
            "passed": bool(state["lo"] <= val <= state["hi"])}


def distinct_verdict_from_state(state: dict) -> dict:
    """Verdict for one distinct_bound check from (merged) HLL state —
    shared by the one-shot runner and the checkpoint shard merger, so
    merged shards get a cardinality recomputed from the MERGED sketch
    (per-shard distinct counts do NOT add: values recur across shards).
    The estimate is rounded to the nearest integer — cardinality is
    integral, and the raw estimator is biased epsilon-high on tiny sets
    (2 distinct -> 2.0001), which would fail an exact bound like
    [2, 2]."""
    est = float(np.rint(HLL.from_bytes(state["hll"]).estimate()))
    return {"value": est,
            "passed": bool(state["lo"] <= est <= state["hi"])}


def merge_distinct_states(states: list[dict]) -> dict:
    """Associatively merge per-shard distinct_bound states."""
    out = dict(states[0])
    out["hll"] = HLL.merge_bytes([s["hll"] for s in states]).to_bytes()
    return out


def shape_verdict_from_state(state: dict) -> dict:
    """Verdict for one shape_bound check from (merged) Pébay M3/M4
    state — shared by the one-shot runner and the checkpoint shard
    merger, so merged shards get the statistic recomputed from the
    MERGED moments (per-shard skewness/kurtosis do NOT average)."""
    hm = HigherMoments.from_dict(state["hmom"])
    val = hm.skewness if state["stat"] == "skewness" else hm.kurtosis
    ok = (not np.isnan(val)) and state["lo"] <= val <= state["hi"]
    return {"value": float(val), "passed": bool(ok)}


def merge_shape_states(states: list[dict]) -> dict:
    """Associatively merge per-shard shape_bound states."""
    out = dict(states[0])
    hm = HigherMoments()
    for s in states:
        hm = hm.merge(HigherMoments.from_dict(s["hmom"]))
    out["hmom"] = hm.to_dict()
    return out


def top_share_verdict_from_state(state: dict) -> dict:
    """Verdict for one top_share_bound check from (merged) SpaceSaving
    state + merged non-null count — shared by the one-shot runner and
    the checkpoint shard merger (per-shard shares do NOT combine: the
    top value of the union needs the merged sketch)."""
    ss = SpaceSaving.from_bytes(state["ss"])
    n = int(state["n"])
    top = ss.top(1)
    share = (top[0][1] / n) if (top and n) else 0.0
    return {"value": float(share),
            "passed": bool(share <= state["max_share"])}


def merge_top_share_states(states: list[dict]) -> dict:
    """Associatively merge per-shard top_share_bound states."""
    out = dict(states[0])
    ss = SpaceSaving.from_bytes(states[0]["ss"])
    for s in states[1:]:
        ss.merge(SpaceSaving.from_bytes(s["ss"]))
    out["ss"] = ss.to_bytes()
    out["n"] = int(sum(s["n"] for s in states))
    return out


def merge_quantile_states(states: list[dict]) -> dict:
    """Associatively merge per-shard quantile_bound states."""
    out = dict(states[0])
    out["tdigest"] = TDigest.merge_bytes(
        [s["tdigest"] for s in states]).to_bytes()
    return out


def drift_metric_from_state(state: dict) -> float:
    """Recompute the drift metric from (merged) drift sketch state — the
    single definition used by both the one-shot runner and the checkpoint
    shard merger, so merged shards get a globally-recomputed statistic."""
    baseline = state["baseline"]
    if state["categorical"]:
        return psi_categorical(baseline["freq"], state["freq"])
    base_counts = np.array(baseline["full_counts"], dtype=np.float64)
    h = state.get("hist")
    cur = (NumericHistogram.from_dict(h).full_counts() if h is not None
           else np.zeros_like(base_counts))
    return (psi_from_counts(base_counts, cur) if state["method"] == "psi"
            else ks_from_counts(base_counts, cur))


def merge_freshness_states(states: list[dict]) -> dict:
    """Associatively merge per-shard freshness states: per-segment max
    timestamp is an algebraic max."""
    out = dict(states[0])
    seg: dict[str, int] = {}
    for s in states:
        for k, v in s["seg_max_us"].items():
            seg[k] = max(seg.get(k, v), int(v))
    out["seg_max_us"] = seg
    return out


def freshness_verdict_from_state(state: dict) -> dict:
    """Recompute the global freshness verdict row fields + stale-segment
    details from (merged) state — the single definition used by both the
    one-shot runner's merge path and the checkpoint shard merger."""
    as_of_us = int(np.datetime64(pd.Timestamp(state["as_of"]), "us")
                   .astype(np.int64))
    lag = {k: (as_of_us - int(v)) // 1_000_000
           for k, v in state["seg_max_us"].items()}
    stale = {k: v for k, v in lag.items() if v > state["max_lag_s"]}
    n_seg = len(lag)
    return {"n_segments": n_seg, "n_stale": len(stale),
            "rate": len(stale) / n_seg if n_seg else 0.0,
            "max_lag_s": float(max(lag.values())) if lag else 0.0,
            "passed": not stale,
            "stale_details": [f"{k}: lag_s={v}"
                              for k, v in sorted(stale.items())]}


def merge_group_stats_states(states: list[dict]) -> dict:
    """Associatively merge per-shard group-stats states: per-segment
    (rows, nulls) counts add."""
    out = dict(states[0])
    seg: dict[str, list[int]] = {}
    for s in states:
        for k, (rows, nulls) in s["seg_counts"].items():
            acc = seg.setdefault(k, [0, 0])
            acc[0] += int(rows)
            acc[1] += int(nulls)
    out["seg_counts"] = seg
    return out


def group_stats_verdict_from_state(state: dict) -> dict:
    """Recompute the per-segment null-rate verdict from (merged) state —
    shared by the one-shot runner and the checkpoint merger."""
    thr = state["max_null_rate"]
    bad = {}
    worst = 0.0
    for k, (rows, nulls) in state["seg_counts"].items():
        rate = nulls / rows if rows else 0.0
        worst = max(worst, rate)
        if rate > thr:
            bad[k] = rate
    n_seg = len(state["seg_counts"])
    return {"n_segments": n_seg, "n_bad": len(bad),
            "rate": len(bad) / n_seg if n_seg else 0.0,
            "worst_null_rate": worst, "passed": not bad,
            "bad_details": [f"{k}: null_rate={v:.6f}"
                            for k, v in sorted(bad.items())]}


def merge_drift_states(states: list[dict]) -> dict:
    """Associatively merge per-shard drift states for one check."""
    out = dict(states[0])
    if out["categorical"]:
        freq = CategoricalFreq()
        for s in states:
            freq = freq.merge(CategoricalFreq.from_dict(s["freq"]))
        out["freq"] = dict(freq.counts)
    else:
        h = None
        for s in states:
            if s.get("hist") is None:
                continue
            hh = NumericHistogram.from_dict(s["hist"])
            h = hh if h is None else h.merge(hh)
        out["hist"] = h.to_dict() if h is not None else None
    return out


def _parent_membership(parent, bloom_threshold: int,
                       fp_rate: float = 1e-4) -> tuple[str, object]:
    """Build the broadcastable membership structure for a referential
    check WITHOUT materializing the parent key column on the driver.

    Returns ``("set", keys)`` (plain broadcast set) or
    ``("bloom", bloom_bytes)`` (scale path, SURVEY.md §2.4).

    Dataset parents: one streaming pass emits ONLY a KB-sized HLL
    partial per block; the driver merges them to estimate global
    cardinality FIRST and nothing else reaches the driver until the
    path is chosen. When the estimate fits the plain broadcast, a
    second pass reduces to per-block distinct keys and dedups them
    DISTRIBUTEDLY (groupby) before collecting the <= threshold global
    distinct rows. Otherwise the second pass builds per-block partial
    Bloom filters of identical geometry that OR-merge on the driver —
    the huge parent key set never lands on the driver as rows on
    either path."""
    from ..state import BloomFilter

    try:
        import ray.data

        is_ds = isinstance(parent, ray.data.Dataset)
    except ImportError:  # pragma: no cover
        is_ds = False
    if not is_ds:
        keys = set(parent)
        keys.discard(None)
        if len(keys) <= bloom_threshold:
            return "set", keys
        return "bloom", BloomFilter(len(keys), fp_rate).add(sorted(keys)).to_bytes()

    def sketch(batch: pa.Table) -> pa.Table:
        uniq = pc.unique(batch.column(0).combine_chunks().drop_null())
        hll_b = HLL().add_column(uniq).to_bytes()
        return pa.table({"hll": pa.array([hll_b], pa.binary())})

    rows = parent.map_batches(sketch, batch_format="pyarrow",
                              batch_size=None).take_all()
    if not rows:
        return "set", set()
    est = HLL.merge_bytes([r["hll"] for r in rows]).estimate()
    if est <= bloom_threshold:
        kname = parent.schema().names[0]

        def block_distinct(batch: pa.Table) -> pa.Table:
            uniq = pc.unique(batch.column(0).combine_chunks().drop_null())
            return pa.table({kname: uniq})

        # distributed dedup of the per-block distincts: the driver only
        # ever receives the <= bloom_threshold GLOBAL distinct keys,
        # not the (potentially blocks x distinct) per-block union
        reduced = parent.map_batches(block_distinct, batch_format="pyarrow",
                                     batch_size=None)
        keys = set(reduced.unique(kname))
        keys.discard(None)
        return "set", keys

    # scale path: per-block partial Blooms, same geometry -> bitwise OR
    n_est = int(est * 1.2) + 1024

    def partial_bloom(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(n_est, fp_rate).add(batch.column(0).drop_null())
        return pa.table({"bloom": pa.array([bf.to_bytes()], pa.binary())})

    parts = parent.map_batches(partial_bloom, batch_format="pyarrow",
                               batch_size=None).take_all()
    bits = None
    for r in parts:
        b = np.frombuffer(r["bloom"][24:], np.uint64)
        bits = b.copy() if bits is None else np.bitwise_or(bits, b)
    return "bloom", bytes(parts[0]["bloom"][:24]) + bits.tobytes()


def run_suite(ds, suite: CheckSuite, *, parents: dict | None = None,
              partition_col: str = "repo", num_partitions: int = 64,
              key_columns: list[str] | None = None,
              bloom_threshold: int = 2_000_000,
              unique_input=None) -> ValidationResult:
    """Run the full constraint suite; returns per-partition + global
    verdicts, violation rows, and the stats profile."""
    parents = parents or {}
    key_columns = key_columns or [c for c in ("repo", "path", "commit", "content_sha256")
                                  if c in ds.schema().names]

    # referential -> broadcast membership row checks
    row_checks = list(suite.row_checks)
    for rc in suite.referential_checks:
        parent = parents.get(rc.parent)
        if parent is None:
            raise ValueError(f"referential check {rc.name}: parents[{rc.parent!r}] not given")
        if hasattr(parent, "select_columns"):
            parent = parent.select_columns([rc.parent_column])
        kind, payload = _parent_membership(parent, bloom_threshold)
        if kind == "bloom":
            # parent key set too large for a plain broadcast set: ship a
            # Bloom filter instead (false-positive rate 1e-4 — an orphan
            # slips with that probability; valid rows never flag)
            from ..checks.row_checks import BloomMembershipCheck

            mc = BloomMembershipCheck(rc.name, rc.column, payload,
                                      max_violation_rate=rc.max_violation_rate,
                                      severity=rc.severity)
        else:
            mc = MembershipCheck(rc.name, rc.column, payload,
                                 max_violation_rate=rc.max_violation_rate,
                                 severity=rc.severity)
        row_checks.append(mc)

    # schema checks: plan-time. Dictionary-encoded columns validate as
    # their VALUE type: dictionary<string> is the same logical column as
    # string (Parquet readers produce either layout for the same data)
    schema_verdicts = []
    sch = ds.schema()
    have = dict(zip(sch.names,
                    [str(t.value_type) if isinstance(t, pa.DataType)
                     and pa.types.is_dictionary(t) else str(t)
                     for t in sch.types]))
    for sc in suite.schema_checks:
        bad = []
        for cname, tprefix in sc.columns.items():
            if cname not in have:
                bad.append(f"missing:{cname}")
            elif not have[cname].startswith(tprefix):
                bad.append(f"type:{cname}={have[cname]}!~{tprefix}")
        if sc.strict:
            bad += [f"extra:{c}" for c in have if c not in sc.columns]
        schema_verdicts.append((sc.name, bad))

    # quantile_bound needs a numeric (or temporal) column — fail at plan
    # time with a clear message, not a cast error deep in the fused pass
    _NUMERIC_PREFIXES = ("int", "uint", "float", "double", "decimal",
                         "halffloat", "bool")
    for qc in getattr(suite, "quantile_checks", []):
        t = have.get(qc.column)
        if t is not None and not t.startswith(_NUMERIC_PREFIXES):
            raise ValueError(
                f"quantile_bound check {qc.name}: column {qc.column!r} has "
                f"non-numeric type {t} — quantiles need a numeric column")
    for sc_ in getattr(suite, "shape_checks", []):
        t = have.get(sc_.column)
        if t is not None and not t.startswith(_NUMERIC_PREFIXES):
            raise ValueError(
                f"shape_bound check {sc_.name}: column {sc_.column!r} has "
                f"non-numeric type {t} — skewness/kurtosis need a numeric column")

    # prune to the columns the suite actually touches (schema checks saw
    # the full schema above): unneeded wide columns never leave the read
    needed = {partition_col, *key_columns}
    needed |= {c.column for c in row_checks}
    needed |= {c.where["column"] for c in row_checks if c.where is not None}
    needed |= {c.other for c in row_checks if hasattr(c, "other")}
    for fc in getattr(suite, "freshness_checks", []):
        needed |= {fc.column, fc.group}
    for gc in getattr(suite, "group_stats_checks", []):
        needed |= {gc.column, gc.group}
    needed |= {c.column for c in suite.stats_checks}
    needed |= {c.column for c in getattr(suite, "quantile_checks", [])}
    needed |= {c.column for c in getattr(suite, "distinct_checks", [])}
    needed |= {c.column for c in getattr(suite, "shape_checks", [])}
    needed |= {c.column for c in getattr(suite, "top_share_checks", [])}
    needed |= {c.column for c in suite.drift_checks}
    for uc in suite.unique_checks:
        needed |= set(uc.columns)
    # plan-time pre-flight: a check naming a column the table does not
    # have should fail HERE with the offending names, not as a wrapped
    # CheckSpecError from inside a Ray task mid-pass
    missing = sorted((needed - set(sch.names)) - {None, "content_sha256"})
    if missing:
        raise ValueError(
            f"suite references columns missing from the input schema: "
            f"{missing} (have: {list(sch.names)})")
    needed.add("content_sha256")   # lineage digests, when the column exists
    keep = [c for c in sch.names if c in needed]
    if len(keep) < len(sch.names):
        ds = ds.select_columns(keep)

    # drift baselines must be bound before pass 1
    for dc in suite.drift_checks:
        if dc.baseline is None:
            raise ValueError(f"drift check {dc.name}: no baseline bound "
                             f"(use compute_baseline + bind_baselines)")

    # kick off the uniqueness pass CONCURRENTLY with pass 1: the two
    # pipelines are independent until verdict assembly, so running them
    # from separate driver threads lets Ray's scheduler interleave their
    # tasks and fill the idle gaps of each pipeline's serial phases
    # (projection -> shuffle -> collect). Same results, better utilization.
    uniq_ds = unique_input if unique_input is not None else ds
    uniq_keys = key_columns
    if unique_input is not None:
        have_u = set(uniq_ds.schema().names)
        uniq_keys = [c for c in key_columns if c in have_u]
    uniq_out: dict = {}
    uniq_thread = None
    if suite.unique_checks:
        import threading

        def _run_uniqueness():
            try:
                import time as _time

                # let pass-1's first wave warm the worker pool (clean
                # module imports) before the second pipeline's tasks land
                _time.sleep(1.0)
                for uc in suite.unique_checks:
                    uniq_out[uc.name] = uniqueness_violations(
                        uniq_ds, uc.columns, partition_col=partition_col,
                        num_partitions=num_partitions, key_columns=uniq_keys)
            except BaseException as e:  # re-raised on join
                uniq_out["__error__"] = e

        uniq_thread = threading.Thread(target=_run_uniqueness, daemon=True)
        uniq_thread.start()

    # quantile_bound checks ride on the stats sketching machinery: each
    # becomes a synthetic single-quantile StatsCheck in the fused pass
    # (moments + t-digest partials tagged with the check's name)
    stage_stats = list(suite.stats_checks) + [
        StatsCheck(name=qc.name, column=qc.column, quantiles=[qc.q])
        for qc in getattr(suite, "quantile_checks", [])] + [
        StatsCheck(name=dc.name, column=dc.column, distinct=True,
                   numeric=False)
        for dc in getattr(suite, "distinct_checks", [])] + [
        StatsCheck(name=sh.name, column=sh.column, shape=True)
        for sh in getattr(suite, "shape_checks", [])] + [
        StatsCheck(name=tc.name, column=tc.column, numeric=False,
                   top_share=True, ss_k=tc.k)
        for tc in getattr(suite, "top_share_checks", [])]
    stage = _ValidatorStage(row_checks, stage_stats, suite.drift_checks,
                            partition_col, num_partitions, key_columns)
    out = ds.map_batches(stage, batch_format="pyarrow", batch_size=None).materialize()

    records = out.to_pandas()   # small by construction (no raw rows)
    if records.empty:           # empty input/shard: keep the union schema
        records = pa.table(_empty_cols(stage.schema, 0),
                           schema=stage.schema).to_pandas()
    n_rows_total = 0
    verdict_rows = []
    counts = records[records["record_type"] == "counts"]
    rows_per_pid = (counts[counts["check"] == _ROWS]
                    .groupby("pid")["n_rows"].sum())
    n_rows_total = int(rows_per_pid.sum())

    check_threshold = {c.name: c.max_violation_rate for c in row_checks}
    for chk in row_checks:
        viol_per_pid = (counts[counts["check"] == chk.name]
                        .groupby("pid")["n_viol"].sum())
        if chk.where is not None:
            # scoped check: denominator is the check's own in-scope counts
            denom_per_pid = (counts[counts["check"] == _SCOPE_PREFIX + chk.name]
                             .groupby("pid")["n_rows"].sum())
            denom_total = int(denom_per_pid.sum())
        else:
            denom_per_pid, denom_total = rows_per_pid, n_rows_total
        for pid_val, nr in denom_per_pid.items():
            nv = int(viol_per_pid.get(pid_val, 0))
            rate = nv / nr if nr else 0.0
            verdict_rows.append((chk.name, int(pid_val), int(nr), nv, rate, np.nan,
                                 rate <= check_threshold[chk.name]))
        nv = int(viol_per_pid.sum())
        rate = nv / denom_total if denom_total else 0.0
        verdict_rows.append((chk.name, -1, denom_total, nv, rate, np.nan,
                             rate <= check_threshold[chk.name]))

    for name, bad in schema_verdicts:
        verdict_rows.append((name, -1, n_rows_total, len(bad), 0.0, np.nan, not bad))

    # stats assembly — merged sketch STATE is kept (ValidationResult.
    # sketch_state) so checkpointed shards can merge stats exactly
    sketches = records[records["record_type"] == "sketch"]
    stats_rows = []
    sketch_state: dict[str, dict] = {}
    for sc in suite.stats_checks:
        sel = sketches[sketches["check"] == sc.name]
        m = Moments()
        for b in sel[sel["sketch_kind"] == "moments"]["payload"]:
            m = m.merge(Moments.from_dict(json.loads(bytes(b))))
        state = {"column": sc.column, "numeric": sc.numeric,
                 "distinct": sc.distinct, "quantiles": list(sc.quantiles),
                 "moments": m.to_dict()}
        if sc.distinct:
            state["hll"] = HLL.merge_bytes(
                [bytes(b) for b in sel[sel["sketch_kind"] == "hll"]["payload"]]
            ).to_bytes()
        if sc.quantiles:
            state["tdigest"] = TDigest.merge_bytes(
                [bytes(b) for b in sel[sel["sketch_kind"] == "tdigest"]["payload"]]
            ).to_bytes()
        sketch_state[sc.name] = state
        stats_rows.append(stats_row_from_state(state))

    # quantile_bound assembly — one merged t-digest per check; the
    # verdict's metric column carries the estimated quantile
    quantile_state: dict[str, dict] = {}
    for qc in getattr(suite, "quantile_checks", []):
        sel = sketches[sketches["check"] == qc.name]
        qstate = {"column": qc.column, "q": qc.q, "lo": qc.lo, "hi": qc.hi,
                  "tdigest": TDigest.merge_bytes(
                      [bytes(b) for b in
                       sel[sel["sketch_kind"] == "tdigest"]["payload"]]
                  ).to_bytes()}
        quantile_state[qc.name] = qstate
        v = quantile_verdict_from_state(qstate)
        verdict_rows.append((qc.name, -1, n_rows_total, 0, 0.0,
                             v["value"], v["passed"]))

    # distinct_bound assembly — one merged HLL per check; the verdict's
    # metric column carries the cardinality estimate
    distinct_state: dict[str, dict] = {}
    for dc in getattr(suite, "distinct_checks", []):
        sel = sketches[sketches["check"] == dc.name]
        dstate = {"column": dc.column, "lo": dc.lo, "hi": dc.hi,
                  "hll": HLL.merge_bytes(
                      [bytes(b) for b in
                       sel[sel["sketch_kind"] == "hll"]["payload"]]
                  ).to_bytes()}
        distinct_state[dc.name] = dstate
        v = distinct_verdict_from_state(dstate)
        verdict_rows.append((dc.name, -1, n_rows_total, 0, 0.0,
                             v["value"], v["passed"]))

    # shape_bound assembly — one merged Pébay M3/M4 state per check;
    # the verdict's metric column carries the statistic
    shape_state: dict[str, dict] = {}
    for sh in getattr(suite, "shape_checks", []):
        sel = sketches[sketches["check"] == sh.name]
        hm = HigherMoments()
        for b in sel[sel["sketch_kind"] == "hmom"]["payload"]:
            hm = hm.merge(HigherMoments.from_dict(json.loads(bytes(b))))
        sstate = {"column": sh.column, "stat": sh.stat, "lo": sh.lo,
                  "hi": sh.hi, "hmom": hm.to_dict()}
        shape_state[sh.name] = sstate
        v = shape_verdict_from_state(sstate)
        verdict_rows.append((sh.name, -1, n_rows_total, 0, 0.0,
                             v["value"], v["passed"]))

    # top_share_bound assembly — one merged SpaceSaving sketch + the
    # merged non-null count per check; metric carries the top share
    top_share_state: dict[str, dict] = {}
    for tc in getattr(suite, "top_share_checks", []):
        sel = sketches[sketches["check"] == tc.name]
        ss = SpaceSaving(tc.k)
        for b in sel[sel["sketch_kind"] == "ssketch"]["payload"]:
            ss.merge(SpaceSaving.from_bytes(bytes(b)))
        mm = Moments()
        for b in sel[sel["sketch_kind"] == "moments"]["payload"]:
            mm = mm.merge(Moments.from_dict(json.loads(bytes(b))))
        tstate = {"column": tc.column, "max_share": tc.max_share,
                  "ss": ss.to_bytes(), "n": int(mm.count)}
        top_share_state[tc.name] = tstate
        v = top_share_verdict_from_state(tstate)
        verdict_rows.append((tc.name, -1, n_rows_total, 0, 0.0,
                             v["value"], v["passed"]))

    # drift assembly — merged drift STATE is kept (ValidationResult.
    # drift_state) so checkpointed shards can recompute the GLOBAL metric
    # from merged sketches instead of taking a per-shard max
    drift_state: dict[str, dict] = {}
    for dc in suite.drift_checks:
        sel = sketches[sketches["check"] == dc.name]
        dstate = {"column": dc.column, "categorical": dc.categorical,
                  "method": dc.method, "threshold": dc.threshold,
                  "baseline": dc.baseline}
        if dc.categorical:
            freq = CategoricalFreq()
            for b in sel[sel["sketch_kind"] == "catfreq"]["payload"]:
                freq = freq.merge(CategoricalFreq.from_dict(json.loads(bytes(b))))
            dstate["freq"] = dict(freq.counts)
        else:
            h = None
            for b in sel[sel["sketch_kind"] == "hist"]["payload"]:
                hh = NumericHistogram.from_dict(json.loads(bytes(b)))
                h = hh if h is None else h.merge(hh)
            dstate["hist"] = h.to_dict() if h is not None else None
        metric = drift_metric_from_state(dstate)
        drift_state[dc.name] = dstate
        verdict_rows.append((dc.name, -1, n_rows_total, 0, 0.0, metric,
                             metric <= dc.threshold))

    # violations
    viol = records[records["record_type"] == "violation"].copy()
    keep = key_columns + ["pid", "check", "detail"]
    violations = viol[keep].reset_index(drop=True) if len(viol) else \
        pd.DataFrame(columns=keep)

    # uniqueness (pass 2: hash shuffle) — already running concurrently
    # with pass 1 (see above); it re-executes its input pipeline and only
    # needs the key columns, so callers whose upstream stages are
    # expensive (sha256 stamping, feature derivation) should pass a
    # cheaper equivalent-rows pipeline as ``unique_input``.
    if uniq_thread is not None:
        uniq_thread.join()
        if "__error__" in uniq_out:
            raise uniq_out["__error__"]
    for uc in suite.unique_checks:
        uv = uniq_out[uc.name]
        uv["check"] = uc.name
        uv["detail"] = uc.name
        nv = len(uv)
        per_pid = uv.groupby("pid").size() if nv else pd.Series(dtype=int)
        for pid_val, nr in rows_per_pid.items():
            npv = int(per_pid.get(pid_val, 0))
            rate = npv / nr if nr else 0.0
            verdict_rows.append((uc.name, int(pid_val), int(nr), npv, rate, np.nan,
                                 rate <= uc.max_violation_rate))
        rate = nv / n_rows_total if n_rows_total else 0.0
        verdict_rows.append((uc.name, -1, n_rows_total, nv, rate, np.nan,
                             rate <= uc.max_violation_rate))
        violations = pd.concat(
            [violations, uv.reindex(columns=keep)], ignore_index=True)

    # freshness (pass 3, declarative form of grouped.freshness_check):
    # per-segment max-ts partials + one keyed shuffle of |segments| rows;
    # one global verdict row per check, stale segments as violation rows.
    # Per-segment max timestamps are kept as mergeable state (int us) so
    # checkpoint shards recompute verdicts from the MERGED maxima.
    freshness_state: dict[str, dict] = {}
    for fc in getattr(suite, "freshness_checks", []):
        from .grouped import freshness_check as _fresh

        fr = _fresh(ds, fc.column, fc.group, as_of=fc.as_of,
                    max_lag_s=fc.max_lag_s)
        seg_max = {("\0null" if pd.isna(s) else str(s)):
                   int(np.datetime64(t, "us").astype(np.int64))
                   for s, t in zip(fr[fc.group], fr["max_ts"])}
        state = {"as_of": fc.as_of, "group": fc.group,
                 "max_lag_s": fc.max_lag_s, "seg_max_us": seg_max}
        freshness_state[fc.name] = state
        # single verdict definition shared with the checkpoint merger
        v = freshness_verdict_from_state(state)
        verdict_rows.append((fc.name, -1, v["n_segments"], v["n_stale"],
                             v["rate"], v["max_lag_s"], v["passed"]))
        if v["stale_details"]:
            vrows = pd.DataFrame({
                "pid": np.full(len(v["stale_details"]), -1, np.int64),
                "check": fc.name, "detail": v["stale_details"]})
            violations = pd.concat([violations, vrows.reindex(columns=keep)],
                                   ignore_index=True)

    # group_stats (declarative per-segment null-rate): per-segment
    # (rows, nulls) from the grouped_stats combiner; counts are exactly
    # mergeable state for checkpoint shards
    group_stats_state: dict[str, dict] = {}
    for gc in getattr(suite, "group_stats_checks", []):
        from .grouped import grouped_stats as _gstats

        gs = _gstats(ds, gc.group, gc.column)
        seg_counts = {("\0null" if pd.isna(s) else str(s)):
                      [int(c) + int(nl), int(nl)]
                      for s, c, nl in zip(gs[gc.group], gs["cnt"],
                                          gs["nulls"])}
        gstate = {"column": gc.column, "group": gc.group,
                  "max_null_rate": gc.max_null_rate,
                  "seg_counts": seg_counts}
        group_stats_state[gc.name] = gstate
        v = group_stats_verdict_from_state(gstate)
        verdict_rows.append((gc.name, -1, v["n_segments"], v["n_bad"],
                             v["rate"], v["worst_null_rate"], v["passed"]))
        if v["bad_details"]:
            vrows = pd.DataFrame({
                "pid": np.full(len(v["bad_details"]), -1, np.int64),
                "check": gc.name, "detail": v["bad_details"]})
            violations = pd.concat([violations, vrows.reindex(columns=keep)],
                                   ignore_index=True)

    # per-pid content digests (xor-merge across batches)
    digests: dict[int, int] = {}
    drec = records[records["record_type"] == "digest"]
    for pid_val, grp in drec.groupby("pid"):
        acc = np.uint64(0)
        for v in grp["n_rows"]:
            acc ^= np.int64(v).astype(np.uint64)
        digests[int(pid_val)] = int(acc.view(np.int64))

    verdicts = pd.DataFrame(verdict_rows, columns=[
        "check", "pid", "n_rows", "n_violations", "violation_rate", "metric", "passed"])
    # severity per check: "warn" rows report but never fail the suite
    sev_map = {c.name: getattr(c, "severity", "error") for c in row_checks}
    for group in (suite.unique_checks, suite.drift_checks, suite.schema_checks,
                  getattr(suite, "freshness_checks", []),
                  getattr(suite, "group_stats_checks", []),
                  getattr(suite, "quantile_checks", []),
                  getattr(suite, "distinct_checks", [])):
        sev_map.update({c.name: c.severity for c in group})
    verdicts["severity"] = verdicts["check"].map(sev_map).fillna("error")
    stats = pd.DataFrame(stats_rows)
    return ValidationResult(verdicts=verdicts, violations=violations, stats=stats,
                            n_rows=n_rows_total, digests=digests,
                            sketch_state=sketch_state, drift_state=drift_state,
                            freshness_state=freshness_state,
                            group_stats_state=group_stats_state,
                            quantile_state=quantile_state,
                            distinct_state=distinct_state,
                            shape_state=shape_state,
                            top_share_state=top_share_state,
                            pid_rows={int(p): int(n)
                                      for p, n in rows_per_pid.items()},
                            baselines={dc.name: dc.baseline for dc in suite.drift_checks})


# ---------------------------------------------------------------------------
# drift baselines
# ---------------------------------------------------------------------------

def compute_baseline(ds, drift_checks: list[DriftCheck]) -> dict:
    """Build drift baselines from a reference Dataset.

    Numeric columns: a moments pre-pass finds [min, max] -> fixed equal-width
    edges -> a histogram pass; categorical: one frequency pass. Returns a
    JSON-able dict {check_name: baseline}; bind with ``bind_baselines``."""
    numeric = [dc for dc in drift_checks if not dc.categorical]
    categorical = [dc for dc in drift_checks if dc.categorical]
    baselines: dict[str, dict] = {}

    if numeric:
        def momentum(batch: pa.Table) -> pa.Table:
            out = {}
            for dc in numeric:
                arr = batch.column(dc.column).drop_null() \
                    .to_numpy(zero_copy_only=False).astype(np.float64)
                out[dc.name] = [json.dumps(Moments.from_array(arr).to_dict())]
            return pa.table(out)

        rows = ds.map_batches(momentum, batch_format="pyarrow", batch_size=None).take_all()
        edges = {}
        for dc in numeric:
            m = Moments()
            for r in rows:
                m = m.merge(Moments.from_dict(json.loads(r[dc.name])))
            edges[dc.name] = np.linspace(m.min, m.max, dc.bins + 1)

        def hists(batch: pa.Table) -> pa.Table:
            out = {}
            for dc in numeric:
                arr = batch.column(dc.column).drop_null() \
                    .to_numpy(zero_copy_only=False).astype(np.float64)
                out[dc.name] = [json.dumps(NumericHistogram(edges[dc.name]).add(arr).to_dict())]
            return pa.table(out)

        rows = ds.map_batches(hists, batch_format="pyarrow", batch_size=None).take_all()
        for dc in numeric:
            h = None
            for r in rows:
                hh = NumericHistogram.from_dict(json.loads(r[dc.name]))
                h = hh if h is None else h.merge(hh)
            baselines[dc.name] = {"edges": h.edges.tolist(),
                                  "counts": h.counts.tolist(),
                                  "full_counts": h.full_counts().tolist()}

    if categorical:
        def freqs(batch: pa.Table) -> pa.Table:
            out = {}
            for dc in categorical:
                vc = pd.Series(batch.column(dc.column).to_pandas()).value_counts(dropna=False)
                out[dc.name] = [json.dumps({("\0null" if pd.isna(k) else str(k)): int(v)
                                            for k, v in vc.items()})]
            return pa.table(out)

        rows = ds.map_batches(freqs, batch_format="pyarrow", batch_size=None).take_all()
        for dc in categorical:
            f = CategoricalFreq()
            for r in rows:
                f = f.merge(CategoricalFreq.from_dict(json.loads(r[dc.name])))
            baselines[dc.name] = {"freq": dict(f.counts)}
    return baselines


def bind_baselines(suite: CheckSuite, baselines: dict) -> CheckSuite:
    for dc in suite.drift_checks:
        if dc.name in baselines:
            dc.baseline = baselines[dc.name]
    return suite


__all__.append("bind_baselines")


def profile_table(ds, *, columns: list[str] | None = None,
                  quantiles: list[float] | None = None,
                  distinct: bool = True, num_partitions: int = 64,
                  partition_col: str | None = None) -> pd.DataFrame:
    """One-pass profile of every (or the given) column: count, null rate,
    min/max/mean/std/sum for numerics, HLL distinct for all, t-digest
    quantiles for numerics — the data-profiling front door built on the
    same fused pass as the validation suite."""
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    cols = columns or sch.names
    checks = []
    for c in cols:
        numeric = pa.types.is_integer(types[c]) or pa.types.is_floating(types[c])
        checks.append(StatsCheck(
            name=f"stats:{c}", column=c, numeric=numeric,
            distinct=distinct, quantiles=list(quantiles or []) if numeric else []))
    suite = CheckSuite([])
    suite.stats_checks = checks
    pcol = partition_col or cols[0]
    res = run_suite(ds, suite, num_partitions=num_partitions,
                    partition_col=pcol, key_columns=[pcol])
    return res.stats


def infer_checks(ds, *, quantiles: tuple[float, ...] = (0.5, 0.95),
                 null_slack: float = 2.0, range_slack: float = 0.05,
                 distinct_slack: float = 2.0,
                 num_partitions: int = 64,
                 partition_col: str | None = None) -> list[dict]:
    """Profile ``ds`` once and GENERATE a check spec that passes on data
    distributed like it, with explicit slack margins (the
    Great-Expectations-profiler workflow: baseline a healthy snapshot,
    validate future loads against it). Returns a plain list-of-dicts
    spec — inspect/edit it, then ``CheckSuite(spec)``.

    Generated per column: a schema type expectation; a null-rate cap at
    ``null_slack`` x the observed rate (plain ``not_null`` when the
    profile saw zero nulls); for numerics a ``range`` check widened by
    ``range_slack`` x the observed span and ``quantile_bound`` bands at
    each requested quantile; for every column a ``distinct_bound`` at
    [1, ceil(distinct_est x distinct_slack)] (HLL error + growth
    margin). One fused profiling pass — the same machinery as
    ``profile_table``."""
    sch = ds.schema()
    types = dict(zip(sch.names, [str(t) for t in sch.types]))
    prof = profile_table(ds, quantiles=list(quantiles),
                         num_partitions=num_partitions,
                         partition_col=partition_col)
    spec: list[dict] = [{
        "type": "schema", "name": "inferred:schema",
        "columns": {c: t for c, t in types.items()}}]
    for row in prof.to_dict("records"):     # itertuples mangles "q0.5"
        c = row["column"]
        if row["null_rate"] == 0.0:
            spec.append({"type": "not_null", "column": c,
                         "name": f"inferred:not_null:{c}"})
        else:
            spec.append({"type": "not_null", "column": c,
                         "name": f"inferred:null_rate:{c}",
                         "max_violation_rate":
                             min(1.0, float(row["null_rate"]) * null_slack)})
        if not np.isnan(row["mean"]):         # numeric column
            span = float(row["max"] - row["min"])                 or abs(float(row["max"])) or 1.0
            pad = span * range_slack
            spec.append({"type": "range", "column": c,
                         "name": f"inferred:range:{c}",
                         "min": float(row["min"]) - pad,
                         "max": float(row["max"]) + pad})
            for q in quantiles:
                obs = float(row[f"q{q}"])
                spec.append({"type": "quantile_bound", "column": c,
                             "q": float(q),
                             "name": f"inferred:q{q}:{c}",
                             "min": obs - span * 0.5,
                             "max": obs + span * 0.5})
        d = float(row.get("distinct_est", float("nan")))
        if not np.isnan(d):
            spec.append({"type": "distinct_bound", "column": c,
                         "name": f"inferred:distinct:{c}",
                         "min": 1,
                         "max": int(np.ceil(d * distinct_slack))})
    return spec


def segment_drift(ds, group_col: str, col: str, baseline_ds, *,
                  method: str = "psi", threshold: float = 0.2,
                  bins: int = 64) -> pd.DataFrame:
    """Per-SEGMENT distribution drift: WHICH segment moved?

    The global drift check (DriftCheck) answers "did the column move";
    this answers the triage question per ``group_col`` segment. Shared
    fixed edges come from the BASELINE's global [min, max] (one moments
    pre-pass) so every segment histograms onto the same grid; each
    dataset then streams once, emitting a (bins+2)-long count vector
    per (block, segment) — KB-sized partials, merged per segment on the
    driver (segments are assumed dimension-sized: langs, sources,
    event types). Metric per segment = PSI or KS on the merged count
    vectors; segments present on only one side still get a (large,
    finite) metric via the standard zero-floor smoothing. Null segment
    values form their own segment."""
    if method not in ("psi", "ks"):
        raise ValueError(f"method must be psi|ks, got {method!r}")

    def momentum(batch: pa.Table) -> pa.Table:
        arr = batch.column(col).drop_null() \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"m": [json.dumps(Moments.from_array(arr).to_dict())]})

    rows = baseline_ds.map_batches(momentum, batch_format="pyarrow",
                                   batch_size=None).take_all()
    m = Moments()
    for r in rows:
        m = m.merge(Moments.from_dict(json.loads(r["m"])))
    lo, hi = m.min, (m.max if m.max > m.min else m.min + 1.0)
    edges = np.linspace(lo, hi, bins + 1)

    def hist_partials(batch: pa.Table) -> pa.Table:
        seg = pc.fill_null(pc.cast(batch.column(group_col), pa.string()),
                           "\0null").to_pandas()
        vals = batch.column(col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        segs, counts = [], []
        for u in pd.unique(seg):
            h = NumericHistogram(edges).add(vals[(seg == u).to_numpy()])
            segs.append(u)
            counts.append(h.full_counts().astype(np.int64).tolist())
        return pa.table({"seg": pa.array(segs, pa.string()),
                         "fc": pa.array(counts, pa.list_(pa.int64()))})

    def merged_counts(d) -> dict[str, np.ndarray]:
        parts = d.map_batches(hist_partials, batch_format="pyarrow",
                              batch_size=None).to_pandas()
        acc: dict[str, np.ndarray] = {}
        for seg, fc in zip(parts["seg"], parts["fc"]):
            v = np.asarray(fc, dtype=np.float64)
            acc[seg] = acc.get(seg, 0) + v
        return acc

    base, cur = merged_counts(baseline_ds), merged_counts(ds)
    zeros = np.zeros(bins + 2, np.float64)
    fn = psi_from_counts if method == "psi" else ks_from_counts
    out_rows = []
    for seg in sorted(set(base) | set(cur)):
        b, c = base.get(seg, zeros), cur.get(seg, zeros)
        metric = fn(b, c)
        out_rows.append((None if seg == "\0null" else seg,
                         int(b.sum()), int(c.sum()), metric,
                         metric <= threshold))
    return pd.DataFrame(out_rows, columns=[group_col, "n_base", "n_cur",
                                           "metric", "passed"])


__all__.append("segment_drift")


def drift_timeline(ds, ts_col: str, col: str, *, bins: int = 64,
                   threshold: float = 0.2,
                   freq: str = "month") -> pd.DataFrame:
    """Period-over-period distribution drift of ``col`` — WHEN did the
    column move: PSI between every calendar period (``freq`` =
    "month" or "day") and its predecessor,
    the temporal complement to ``segment_drift``'s per-segment triage
    (a slow upstream schema/unit change shows up here as the first
    failing month).

    Shared fixed edges come from ONE global [min, max] moments pass
    (every month histograms onto the same grid — the precondition for
    comparable PSI); then one streaming pass emits a (bins+2)-long
    count vector per (block, month) — KB-sized partials merged on the
    driver (months are calendar-bounded, never row-scale). Consecutive
    months with identical distributions measure PSI 0; the standard
    1e-6 zero-floor keeps one-sided bins finite. Null timestamps and
    null values are excluded. Returns (period, prev_period, n_prev,
    n_cur, metric, passed) sorted by period — the earliest month has
    no predecessor and emits no row. Note the pairing is between
    ADJACENT OBSERVED periods in sort order (an empty calendar period
    is skipped, not treated as an all-zero distribution)."""
    if freq not in ("month", "day"):
        raise ValueError(f"freq must be month|day, got {freq!r}")

    def momentum(batch: pa.Table) -> pa.Table:
        arr = batch.column(col).drop_null() \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"m": [json.dumps(
            Moments.from_array(arr).to_dict())]})

    rows = ds.map_batches(momentum, batch_format="pyarrow",
                          batch_size=None).take_all()
    m = Moments()
    for r in rows:
        m = m.merge(Moments.from_dict(json.loads(r["m"])))
    lo, hi = m.min, (m.max if m.max > m.min else m.min + 1.0)
    edges = np.linspace(lo, hi, bins + 1)

    def hist_partials(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        ok = pc.and_(pc.is_valid(ts), pc.is_valid(batch.column(col)))
        b = batch.filter(ok)
        ts = b.column(ts_col)
        period = pc.add(pc.multiply(pc.year(ts).cast(pa.int64()),
                                    pa.scalar(100, pa.int64())),
                        pc.month(ts).cast(pa.int64()))
        if freq == "day":
            period = pc.add(pc.multiply(period,
                                        pa.scalar(100, pa.int64())),
                            pc.day(ts).cast(pa.int64()))
        period = period.to_numpy(zero_copy_only=False)
        vals = b.column(col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        pers, counts = [], []
        for u in np.unique(period):
            h = NumericHistogram(edges).add(vals[period == u])
            pers.append(int(u))
            counts.append(h.full_counts().astype(np.int64).tolist())
        return pa.table({"period": pa.array(pers, pa.int64()),
                         "fc": pa.array(counts, pa.list_(pa.int64()))})

    parts = ds.map_batches(hist_partials, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    acc: dict[int, np.ndarray] = {}
    for per, fc in zip(parts["period"], parts["fc"]):
        v = np.asarray(fc, dtype=np.float64)
        acc[int(per)] = acc.get(int(per), 0) + v
    periods = sorted(acc)
    out = []
    for prev, cur in zip(periods, periods[1:]):
        metric = psi_from_counts(acc[prev], acc[cur])
        out.append((cur, prev, int(acc[prev].sum()),
                    int(acc[cur].sum()), metric, metric <= threshold))
    df = pd.DataFrame(out, columns=["period", "prev_period", "n_prev",
                                    "n_cur", "metric", "passed"])
    for c in ("period", "prev_period", "n_prev", "n_cur"):
        df[c] = df[c].astype("int64")
    return df


__all__.append("drift_timeline")


def schema_diff(ds_a, ds_b) -> "pd.DataFrame":
    """Schema drift between two datasets/snapshots: one row per column
    name with its status — ``added`` (only in B), ``removed`` (only in
    A), ``common`` — the pre-flight check before unioning snapshots or
    resuming an append job. Metadata-only: no data is read beyond what
    schema resolution already fetched, so it costs nothing at any
    scale. Returns (column, status) sorted."""
    import pandas as pd

    a = set(ds_a.schema().names)
    b = set(ds_b.schema().names)
    rows = ([(c, "removed") for c in a - b] +
            [(c, "added") for c in b - a] +
            [(c, "common") for c in a & b])
    return pd.DataFrame(rows, columns=["column", "status"]) \
        .sort_values(["column", "status"]).reset_index(drop=True)


__all__.append("schema_diff")


def reconcile_sums(child, parent, *, key: str, child_val: str,
                   parent_key: str | None = None,
                   parent_val: str, tol: float = 1e-6,
                   top: int = 20):
    """Cross-table SUM reconciliation — the classic financial/DQ check
    "does the detail roll up to the header" (lineitem totals vs
    o_totalprice, ledger entries vs account balance). Emits the
    worst-``top`` violating keys plus a one-row summary.

    Scale shape: the child side folds to per-key partial sums with the
    per-block Arrow group_by combiner (one row per key per block — the
    detail rows never shuffle), merges in one keyed groupby, then ONE
    narrow hash join against the parent's (key, value) projection;
    violations filter map-side and only per-block worst-``top``
    partials reach the driver. Parent keys missing from the child
    compare against a child sum of 0 (full reconciliation, not just
    matched keys); child keys missing from the parent are orphans —
    the referential check's job, not this one's.

    Returns (summary_df, violations_df): summary = (n_keys, n_viol,
    max_abs_diff); violations = (key, child_sum, parent_val, diff)
    ordered by |diff| desc, key asc."""
    import pandas as pd

    from ..tuning import shuffle_partitions

    pkey = parent_key or key
    nparts = shuffle_partitions()

    def child_partial(t: pa.Table) -> pa.Table:
        sel = t.select([key, child_val]).filter(
            pc.is_valid(t.column(key)))
        g = sel.group_by(key).aggregate([(child_val, "sum")])
        return pa.table({key: g.column(key).cast(pa.int64()),
                         "child_sum": g.column(f"{child_val}_sum")
                         .cast(pa.float64())})

    def canon2f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns != 2:
            return pa.table({key: pa.array([], pa.int64()),
                             "child_sum": pa.array([], pa.float64())})
        return pa.table({key: t.column(0).cast(pa.int64()),
                         "child_sum": t.column(1).cast(pa.float64())})

    sums = (child.map_batches(child_partial, batch_format="pyarrow",
                              batch_size=None)
            .groupby(key, num_partitions=nparts).sum("child_sum")
            .map_batches(canon2f, batch_format="pyarrow", batch_size=None)
            .materialize())
    ns = sums.count()
    sums = sums.repartition(min(nparts, max(ns, 1))).materialize()

    def parent_proj(t: pa.Table) -> pa.Table:
        return pa.table({key: t.column(pkey).cast(pa.int64()),
                         "parent_val": t.column(parent_val)
                         .cast(pa.float64())})

    par = parent.map_batches(parent_proj, batch_format="pyarrow",
                             batch_size=None).materialize()
    np_rows = par.count()
    par = par.repartition(min(nparts, max(np_rows, 1))).materialize()
    # left_outer from the PARENT: header keys with no detail rows
    # reconcile against 0
    joined = par.join(sums, join_type="left_outer", on=(key,),
                      num_partitions=nparts)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key not in t.column_names:
            return pa.table({key: pa.array([], pa.int64()),
                             "child_sum": pa.array([], pa.float64()),
                             "parent_val": pa.array([], pa.float64()),
                             "diff": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64()),
                             "viol": pa.array([], pa.int64())})
        cs = t.column("child_sum").fill_null(0.0).to_numpy(
            zero_copy_only=False)
        pv = t.column("parent_val").cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        diff = cs - pv
        bad = np.abs(diff) > tol
        k = t.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(-np.abs(diff[bad]), kind="stable")[:top]
        return pa.table({key: pa.array(k[bad][order]),
                         "child_sum": pa.array(cs[bad][order]),
                         "parent_val": pa.array(pv[bad][order]),
                         "diff": pa.array(diff[bad][order]),
                         "n": pa.array(np.full(order.size, t.num_rows,
                                               np.int64)),
                         "viol": pa.array(np.full(order.size,
                                                  int(bad.sum()),
                                                  np.int64))})

    # per-block counters ride along so the summary needs no second pass
    def count_row(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key not in t.column_names:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "viol": pa.array([0], pa.int64()),
                             "mx": pa.array([0.0], pa.float64())})
        cs = t.column("child_sum").fill_null(0.0).to_numpy(
            zero_copy_only=False)
        pv = t.column("parent_val").cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        d = np.abs(cs - pv)
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "viol": pa.array([int((d > tol).sum())], pa.int64()),
                         "mx": pa.array([float(d.max()) if d.size else 0.0])})

    joined = joined.materialize()
    counts = joined.map_batches(count_row, batch_format="pyarrow",
                                batch_size=None).to_pandas()
    parts = joined.map_batches(score, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    summary = pd.DataFrame({
        "n_keys": np.array([int(counts["n"].sum())], np.int64),
        "n_viol": np.array([int(counts["viol"].sum())], np.int64),
        "max_abs_diff": [float(counts["mx"].max()) if len(counts)
                         else 0.0]})
    if parts.empty:
        viol = pd.DataFrame({key: pd.Series([], dtype="int64"),
                             "child_sum": [], "parent_val": [],
                             "diff": []})
    else:
        viol = parts.assign(_absd=parts["diff"].abs()) \
            .sort_values(["_absd", key], ascending=[False, True],
                         kind="mergesort").head(top)
        viol = viol[[key, "child_sum", "parent_val", "diff"]]
    return summary, viol.reset_index(drop=True)


def null_pattern_profile(ds, cols: list[str]):
    """Null-COMBINATION profile: row counts per is-null bitmask over
    ``cols`` — the missingness-structure diagnostic ("do lang and
    content go null TOGETHER?") that per-column null rates cannot see;
    patterns with correlated nulls usually mean a broken upstream join
    or a partial ingest.

    One per-block Arrow group_by over the is-null mask columns (at most
    2^|cols| rows per block on the exchange — dimension-sized by
    construction), merged driver-side. Returns a pandas DataFrame
    (<col>_null ... , n) sorted by the mask columns."""
    import pandas as pd

    mask_cols = [f"{c}_null" for c in cols]

    def partial(t: pa.Table) -> pa.Table:
        m = pa.table({mc: pc.is_null(t.column(c))
                      for mc, c in zip(mask_cols, cols)})
        g = m.group_by(mask_cols).aggregate([([], "count_all")])
        return pa.table({**{mc: g.column(mc) for mc in mask_cols},
                         "n": g.column("count_all").cast(pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({**{mc: pd.Series([], dtype=bool)
                                for mc in mask_cols},
                             "n": pd.Series([], dtype="int64")})
    out = parts.groupby(mask_cols, as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(mask_cols).reset_index(drop=True)


_TYPE_PATTERNS = {
    "p_int": r"^[+-]?\d+$",
    "p_float": r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$",
    "p_date": r"^\d{4}-\d{2}-\d{2}",
    "p_bool": r"^(?i:true|false)$",
    "p_json": r"^\{.*\}$",
}


def type_inference_profile(ds, col: str):
    """Ingest-time "what IS this string column" profiler: the fraction
    of non-null values that parse as int / float / ISO date / bool /
    JSON object, plus row and null counts — the evidence for tightening
    a stringly-typed schema (the profile behind ``infer_checks``'
    dtype expectations; a column that is 99.8% int with 0.2% junk is a
    cast-with-quarantine, not a string).

    All five detectors are anchored RE2 kernels over the batch (one
    vectorized pass each); per-block counts fold through a 7-scalar
    combiner. Patterns are DuckDB ``regexp_matches`` parity so the
    fractions are SQL-checkable. Returns one row: (n, nulls, p_int,
    p_float, p_date, p_bool, p_json) with fractions of NON-NULL rows
    rounded to 6 (NaN if all null)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        c = t.column(col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        c = c.cast(pa.string())
        valid = pc.is_valid(c)
        nn = int(pc.sum(pc.cast(valid, pa.int64())).as_py() or 0)
        out = {"n": pa.array([t.num_rows], pa.int64()),
               "nn": pa.array([nn], pa.int64())}
        for name, pat in _TYPE_PATTERNS.items():
            m = pc.match_substring_regex(c, pat)
            cnt = int(pc.sum(pc.cast(pc.and_(valid, m), pa.int64()))
                      .as_py() or 0)
            out[name] = pa.array([cnt], pa.int64())
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas().sum()
    n, nn = int(parts["n"]), int(parts["nn"])
    row = {"n": np.int64(n), "nulls": np.int64(n - nn)}
    for name in _TYPE_PATTERNS:
        row[name] = round(parts[name] / nn, 6) if nn else np.nan
    return pd.DataFrame([row])


def grid_completeness(ds, key_col: str, ts_col: str):
    """Calendar-grid completeness — "every key should report every
    day": per key, the count of distinct active days vs the global
    [min_day, max_day] span, and how many days are missing — the
    freshness check's COVERAGE dual (a sensor that reports daily but
    skipped 11 days passes freshness and fails this).

    One distinct-(key, day) combiner (the activity_streaks projection)
    plus a 2-scalar global span aggregate; per-key outputs are
    dimension-sized. Returns (key, n_days, expected_days, n_missing,
    complete) sorted by key."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            key_col: batch.column(key_col),
            "day": pc.cast(pc.floor_temporal(
                batch.column(ts_col).cast(pa.timestamp("us")),
                unit="day"), pa.timestamp("us")).cast(pa.int64()),
        })
        return t.group_by([key_col, "day"]).aggregate([])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                             "n_days": pd.Series([], dtype="int64"),
                             "expected_days": pd.Series([], dtype="int64"),
                             "n_missing": pd.Series([], dtype="int64"),
                             "complete": pd.Series([], dtype=bool)})
    day_us = 86_400_000_000
    lo, hi = int(parts["day"].min()), int(parts["day"].max())
    expected = (hi - lo) // day_us + 1
    g = parts.drop_duplicates([key_col, "day"]) \
        .groupby(key_col, as_index=False).agg(n_days=("day", "nunique"))
    out = pd.DataFrame({key_col: g[key_col].astype("int64"),
                        "n_days": g["n_days"].astype("int64")})
    out["expected_days"] = np.int64(expected)
    out["n_missing"] = (expected - out["n_days"]).astype("int64")
    out["complete"] = out["n_missing"] == 0
    return out.sort_values(key_col).reset_index(drop=True)


def volume_anomalies(ds, ts_col: str, k: float = 5.0):
    """Daily-volume anomaly check — "did ingest double or halve on
    Tuesday": row counts per day, flagged when the count sits more
    than ``k`` scaled-MAD units from the median daily volume (the
    robust fence — a mean/std fence would be dragged by the very
    outage it should flag).

    One per-block (day, n) count combiner (day-scale exchange); the
    median/MAD fence is driver arithmetic on the day table. Returns
    (day_us, n, dev, anomaly) sorted by day, with dev = |n - median| /
    (1.4826 * MAD) rounded to 6 (NaN dev when MAD is 0 and the count
    equals the median; infinite-dev days always flag)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(
            batch.column(ts_col).cast(pa.timestamp("us")), unit="day"),
            pa.timestamp("us")).cast(pa.int64())
        g = pa.table({"day_us": day}).group_by("day_us") \
            .aggregate([([], "count_all")])
        return pa.table({"day_us": g.column("day_us"),
                         "n": g.column("count_all").cast(pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({"day_us": pd.Series([], dtype="int64"),
                             "n": pd.Series([], dtype="int64"),
                             "dev": [], "anomaly": pd.Series([],
                                                             dtype=bool)})
    g = parts.groupby("day_us", as_index=False)["n"].sum()
    n = g["n"].to_numpy(np.float64)
    med = float(np.median(n))
    mad = float(np.median(np.abs(n - med)))
    scale = 1.4826 * mad
    with np.errstate(divide="ignore", invalid="ignore"):
        dev = np.abs(n - med) / scale if scale > 0 else \
            np.where(n == med, np.nan, np.inf)
    out = pd.DataFrame({"day_us": g["day_us"].astype("int64"),
                        "n": g["n"].astype("int64"),
                        "dev": np.round(dev, 6),
                        "anomaly": dev > k})
    return out.sort_values("day_us").reset_index(drop=True)


def sortedness(ds, order_col: str, val_col: str):
    """How sorted is ``val_col`` when rows are laid out in
    ``order_col`` order — the fraction of adjacent pairs that are
    non-decreasing (1.0 = already sorted: a merge-append layout; ~0.5
    = random: plan a sort/Z-order before range-partitioned writes).

    One keyed-order pass: per-block (order, val) projections fold to
    per-block pair counts AFTER a global sort by ``order_col`` — the
    sort is on the narrow 2-column projection only (16 B/row), never
    the table. Block-boundary pairs are accounted exactly by carrying
    each block's first/last rows to the driver. Returns one row
    (n_pairs, n_sorted, frac_sorted)."""
    import pandas as pd

    proj = ds.map_batches(
        lambda t, c=(order_col, val_col): t.select(list(c)),
        batch_format="pyarrow", batch_size=None).sort(order_col)

    def partial(t: pa.Table) -> pa.Table:
        o = t.column(order_col).to_numpy(zero_copy_only=False)
        v = t.column(val_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        n_pairs = max(len(v) - 1, 0)
        n_sorted = int((np.diff(v) >= 0).sum()) if n_pairs else 0
        return pa.table({
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "n_sorted": pa.array([n_sorted], pa.int64()),
            "first_o": pa.array([float(o[0]) if len(o) else np.nan]),
            "first_v": pa.array([float(v[0]) if len(v) else np.nan]),
            "last_o": pa.array([float(o[-1]) if len(o) else np.nan]),
            "last_v": pa.array([float(v[-1]) if len(v) else np.nan])})

    parts = proj.map_batches(partial, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    parts = parts[np.isfinite(parts["first_o"])]
    if parts.empty:
        return pd.DataFrame({"n_pairs": np.array([0], np.int64),
                             "n_sorted": np.array([0], np.int64),
                             "frac_sorted": [np.nan]})
    parts = parts.sort_values("first_o").reset_index(drop=True)
    n_pairs = int(parts["n_pairs"].sum())
    n_sorted = int(parts["n_sorted"].sum())
    # boundary pairs between consecutive blocks
    for i in range(1, len(parts)):
        n_pairs += 1
        if parts.loc[i, "first_v"] >= parts.loc[i - 1, "last_v"]:
            n_sorted += 1
    frac = round(n_sorted / n_pairs, 6) if n_pairs else np.nan
    return pd.DataFrame({"n_pairs": np.array([n_pairs], np.int64),
                         "n_sorted": np.array([n_sorted], np.int64),
                         "frac_sorted": [frac]})


def pk_candidate_profile(ds, candidates: list[list[str]]) -> "pd.DataFrame":
    """Primary-key discovery profile: for each candidate column combo,
    how close it comes to being a key — total rows, rows with the
    combo fully non-null, distinct combo tuples among those, and the
    verdict (``is_key`` = no nulls AND no duplicates). The profiling
    complement to ``UniqueCheck``: that check verifies a DECLARED key,
    this one finds which combos COULD be declared.

    Scale shape per candidate: columns pruned at the projection, ONE
    per-block distinct-tuple combiner (each block folds to its
    distinct combos + partial counts), ONE keyed exchange bounded by
    the candidate's true cardinality, then two scalar reads off the
    materialized grouped table (row count = n_distinct, count sum =
    n_valid). Candidates are profiled independently — pass the cheap
    single columns first; a combo whose cardinality approaches the
    row count costs a row-scale exchange (that is what being a key
    means). Returns (combo, n_rows, n_valid, n_distinct, is_key)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..tuning import shuffle_partitions

    n_rows = ds.count()
    out = []
    for combo in candidates:
        cols = list(combo)

        def partial(batch: pa.Table, cols=tuple(cols)) -> pa.Table:
            cols = list(cols)
            ok = None
            for c in cols:
                v = pc.is_valid(batch.column(c))
                ok = v if ok is None else pc.and_(ok, v)
            t = batch.select(cols).filter(ok)
            g = t.group_by(cols).aggregate([([], "count_all")])
            return g.rename_columns([*cols, "cnt"])

        grouped = (ds.map_batches(partial, batch_format="pyarrow",
                                  batch_size=None)
                   .groupby(cols, num_partitions=shuffle_partitions())
                   .sum("cnt")
                   .materialize())
        n_distinct = grouped.count()
        n_valid = int(grouped.sum("sum(cnt)") or 0)
        out.append({"combo": ",".join(cols), "n_rows": n_rows,
                    "n_valid": n_valid, "n_distinct": n_distinct,
                    "is_key": int(n_valid == n_rows
                                  and n_distinct == n_rows)})
    df = pd.DataFrame(out)
    for c in ("n_rows", "n_valid", "n_distinct", "is_key"):
        df[c] = df[c].astype("int64")
    return df


def categorical_profile(ds, cols: list[str]):
    """One-pass profile of several CATEGORICAL columns at once — per
    column: rows, nulls, distinct count, Shannon entropy (log2) and
    the top value's share — the string-column counterpart of
    ``profile_table``'s numeric sketch row (the four numbers that
    decide encode-vs-hash-vs-drop for each column).

    One per-block (col, value, n) count combiner over all columns
    (distinct values per block per column on the exchange), one keyed
    merge; entropy/top-share are exact on the merged value table
    (dimension-sized per categorical column by assumption). Returns
    (column, n, nulls, n_distinct, entropy, top_share) sorted."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        outs = []
        for c in cols:
            col = batch.column(c).cast(pa.string())
            t = pa.table({"v": col})
            g = t.group_by("v").aggregate([([], "count_all")])
            outs.append(pa.table({
                "column": pa.array([c] * g.num_rows, pa.string()),
                "v": g.column("v"),
                "n": g.column("count_all").cast(pa.int64())}))
        return pa.concat_tables(outs)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    rows = []
    for c in cols:
        sub = parts[parts["column"] == c]
        g = sub.groupby("v", dropna=False)["n"].sum()
        n_total = int(g.sum())
        nulls = int(g[g.index.isna()].sum()) if g.index.isna().any() \
            else 0
        nn = g[~g.index.isna()]
        n_nn = int(nn.sum())
        if n_nn:
            p = nn.to_numpy() / n_nn
            ent = float(-(p * np.log2(p)).sum())
            top = float(nn.max() / n_nn)
        else:
            ent, top = np.nan, np.nan
        rows.append({"column": c, "n": np.int64(n_total),
                     "nulls": np.int64(nulls),
                     "n_distinct": np.int64(len(nn)),
                     "entropy": round(ent, 6) if ent == ent else np.nan,
                     "top_share": round(top, 6) if top == top
                     else np.nan})
    return pd.DataFrame(rows).sort_values("column") \
        .reset_index(drop=True)
