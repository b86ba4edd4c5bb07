"""FeatureEngine — compiles a YAML spec and executes it over a
``ray.data.Dataset`` (the reference FeatureManager's role, re-planned for
streaming execution; reference: feature_fabrica/core.py:128-351).

Physical plan per DAG level (reference levels: core.py:186-260):

1. FIT PASSES — every self-fitting op (z_score/min_max/kbins/encoders
   without params) gets a global two-phase aggregate: one extra streaming
   pass over the upstream Dataset computes per-block partials (Welford
   moments / distinct sets / t-digests), merged driver-side (KB-sized) and
   broadcast into the op. We deliberately RECOMPUTE the upstream rather
   than materialize it: at 100 TB, re-streaming blocks through the
   (deterministic, idempotent) upstream map stages is cheaper than pinning
   the whole intermediate dataset in the object store.
2. SHUFFLE STAGES — group_reduce window features lower to
   ``groupby(key).map_groups`` (hash-partitioned exchange, row count
   preserved, order NOT preserved — comparisons must be key-based).
3. ONE FUSED ``map_batches`` evaluating all remaining (pure-vector)
   features of the level over zero-copy Arrow batches; intermediates that
   other features reference as ``feat:stage`` are published as extra
   columns.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.aggregate import GroupByReduce
from ..functions.base import BatchCtx, ColumnRef, TransformationError, as_arrow
from ..spec.expressions import Call, Infix, Node, Ref, Tup
from ..spec.models import (CompiledFeature, build_features, level_features)
from ..spec.yaml_loader import load_spec
from ..state import Moments, TDigest, ValueHist


def _merge_fit_blobs(kind: str, blobs: list):
    """Associatively merge serialized fit partials of one kind (used at
    every tree-merge level and for the final driver fold)."""
    if kind == "moments":
        m = Moments()
        for b in blobs:
            m = m.merge(Moments.from_dict(json.loads(b)))
        return m
    if kind == "distinct":
        vals: set = set()
        for b in blobs:
            vals.update(json.loads(b))
        return vals
    if kind == "quantiles_exact":
        return ValueHist.merge_bytes(blobs)
    return TDigest.merge_bytes(blobs)


def _serialize_fit_state(kind: str, state):
    """Inverse of the per-block partial encoding (same wire format)."""
    if kind == "moments":
        return json.dumps(state.to_dict())
    if kind == "distinct":
        return json.dumps(sorted(state))
    return state.to_bytes()

__all__ = ["FeatureEngine"]


def _replace_node(tree: Node, old: Node, new: Node) -> Node:
    if tree is old:
        return new
    if isinstance(tree, Call) and tree.recv is not None:
        tree.recv = _replace_node(tree.recv, old, new)
    elif isinstance(tree, Infix):
        tree.left = _replace_node(tree.left, old, new)
        tree.right = _replace_node(tree.right, old, new)
    elif isinstance(tree, Tup):
        tree.items = [_replace_node(it, old, new) for it in tree.items]
    return tree


def _finalize(val, ty: pa.DataType):
    """Cast a feature's final value to its declared dtype. List-typed
    outputs (one-hot etc.) keep their layout — the declared dtype describes
    the element type (reference quirk: validate-only, features.py:59-84)."""
    arr = as_arrow(val)
    if pa.types.is_nested(arr.type):
        return arr
    if arr.type == ty:
        return arr
    return arr.cast(ty, safe=False)


class FeatureEngine:
    """Compile once (driver-side, pure Python), run on any Dataset.

    >>> eng = FeatureEngine("features.yaml")
    >>> out = eng.transform(ray.data.read_parquet(...))
    """

    def __init__(self, spec: str | dict):
        spec_dict = load_spec(spec)
        self.features = build_features(spec_dict)
        self.levels = level_features(self.features)
        self.groups: dict[str, list[str]] = {}
        for f in self.features.values():
            if f.spec.group:
                self.groups.setdefault(f.spec.group, []).append(f.name)
        self._mark_published_intermediates()

    # ------------------------------------------------------------------
    def _mark_published_intermediates(self) -> None:
        """Find every ``feat:stage`` reference and mark the producing Call
        node to publish its output as that column (reference promise
        publication: promise_manager.py:84-85)."""
        needed: set[tuple[str, str]] = set()
        for f in self.features.values():
            if f.tree is None:
                continue
            for n in f.tree.walk():
                if isinstance(n, Ref) and n.stage:
                    needed.add((n.name, n.stage))
        self._published: set[str] = set()
        for feat_name, stage in needed:
            feat = self.features.get(feat_name)
            if feat is None or feat.tree is None:
                raise TransformationError(
                    f"intermediate ref {feat_name}:{stage} has no producing feature")
            hit = None
            for n in feat.tree.walk():
                if isinstance(n, Call) and (
                        n.fn_name == stage or getattr(n, "stage_key", None) == stage):
                    hit = n
            if hit is None:
                raise TransformationError(
                    f"feature {feat_name} has no stage {stage!r} to publish")
            hit.publish_as = f"{feat_name}:{stage}"
            self._published.add(f"{feat_name}:{stage}")

    # ------------------------------------------------------------------
    def transform(self, ds, select_groups: list[str] | None = None,
                  keep_input: bool = True):
        """Execute the DAG over a Dataset; returns the Dataset with feature
        columns appended (and inputs kept unless keep_input=False).

        The compiled plan (feature trees + transform objects) is COPIED per
        invocation: group_reduce lowering rewrites trees and fit passes set
        fitted state, and neither may leak into the engine — 'compile once,
        run on any Dataset' means transform() is repeatable."""
        ds, _ = self._execute(ds, select_groups, keep_input, lineage=False)
        return ds

    def transform_with_lineage(self, ds, select_groups: list[str] | None = None,
                               keep_input: bool = True):
        """``transform`` plus per-stage lineage (reference TNode parity:
        models/data_struct.py:9-46, core.py:90-125 — per executed
        transformation stage: wall time, shape, output digest).

        Returns ``(dataset, lineage)`` where lineage has one row per
        (level, feature): ``level, feature, n_rows, wall_s, digest`` —
        the digest is an order-independent xor of per-row hash64 values,
        comparable across parallelism levels. Materializes at each level
        boundary to time it, so this is the observability mode (the
        reference's ``log_transformation_chain=True`` analogue);
        production runs use ``transform``."""
        return self._execute(ds, select_groups, keep_input, lineage=True)

    def _execute(self, ds, select_groups, keep_input, lineage: bool):
        import copy
        import time

        features, levels = copy.deepcopy((self.features, self.levels))
        published = set(self._published)
        input_cols = list(ds.schema().names)
        lin_rows: list[dict] = []
        for level, feats in levels.items():
            t0 = time.perf_counter()
            ds = self._run_fit_passes(ds, feats)
            for f in [f for f in feats if self._root_shuffles(f)]:
                ds = self._apply_group_reduce(ds, f, published)
            # after lowering, every feature has a pure tree -> one fused pass
            ds = self._fused_level_pass(ds, feats, features, published)
            if lineage:
                ds = ds.materialize()
                wall = time.perf_counter() - t0
                n_rows = ds.count()
                digs = self._level_digests(ds, [f.name for f in feats])
                for f in feats:
                    lin_rows.append({"level": level, "feature": f.name,
                                     "n_rows": n_rows,
                                     "wall_s": round(wall, 6),
                                     "digest": digs.get(f.name)})
        drop = list(published)
        if not keep_input:
            drop += [c for c in input_cols if c not in features]
        if select_groups:
            keep_feats = {n for g in select_groups for n in self.groups.get(g, [])}
            drop += [f.name for f in features.values()
                     if f.name not in keep_feats and f.name not in input_cols]
        if drop:
            ds = ds.map_batches(
                lambda b, d=tuple(drop): b.drop_columns([c for c in d if c in b.column_names]),
                batch_format="pyarrow", batch_size=None)
        return ds, (pd.DataFrame(lin_rows) if lineage else None)

    def _level_digests(self, ds, names: list[str]) -> dict[str, int]:
        """Order-independent xor-of-hash64 digest per feature column:
        per-batch partials xor-merge on the driver (KB-sized exchange)."""
        from ..state import hash64

        def partial(batch: pa.Table) -> pa.Table:
            out = {}
            for nm in names:
                if nm not in batch.column_names:
                    continue
                col = batch.column(nm)
                try:
                    h = hash64(col)
                except Exception:
                    h = hash64(col.cast(pa.string()))
                acc = np.bitwise_xor.reduce(h) if h.size else np.uint64(0)
                out[nm] = [int(acc.astype(np.int64))]
            return pa.table(out)

        rows = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None).take_all()
        digs: dict[str, int] = {}
        for r in rows:
            for nm, v in r.items():
                digs[nm] = digs.get(nm, 0) ^ (int(v) & ((1 << 64) - 1))
        return digs

    # -- fit passes ----------------------------------------------------
    def _run_fit_passes(self, ds, feats: list[CompiledFeature]):
        requests: list[tuple[CompiledFeature, Call, str]] = []
        for f in feats:
            for call in f.calls():
                kind = call.transform.fit_request()
                if kind:
                    requests.append((f, call, kind))
        if not requests:
            return ds

        feat_names = [(f.spec.input or f.name) for f, _, _ in requests]
        recvs = [c.recv for _, c, _ in requests]
        kinds = [k for _, _, k in requests]

        def partials(batch: pa.Table) -> pa.Table:
            ctx = BatchCtx(batch)
            out: dict[str, list] = {}
            for i, (fname, recv, kind) in enumerate(zip(feat_names, recvs, kinds)):
                data = ctx.cols.get(fname)
                val = as_arrow(recv.eval(data, ctx)) if recv is not None else data
                if kind == "moments":
                    arr = val.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
                    m = Moments.from_array(arr)
                    m.null_count = val.null_count
                    out[f"fit_{i}"] = [json.dumps(m.to_dict())]
                elif kind == "distinct":
                    uniq = val.drop_null().unique().to_pylist()
                    out[f"fit_{i}"] = [json.dumps(sorted(map(str, uniq)))]
                elif kind == "quantiles":
                    arr = val.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
                    out[f"fit_{i}"] = [TDigest.from_array(arr).to_bytes()]
                elif kind == "quantiles_exact":
                    arr = val.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
                    out[f"fit_{i}"] = [ValueHist.from_array(arr).to_bytes()]
                else:  # pragma: no cover
                    raise TransformationError(f"unknown fit kind {kind}")
            return pa.table(out)

        def combine(batch: pa.Table) -> pa.Table:
            # tree-merge level: fold this batch's per-block partials into
            # ONE row so the driver receives O(n_blocks / 64^levels)
            # partials rather than one per block (the quantiles_exact /
            # distinct partials can be MBs each at wide value domains)
            if batch.num_rows <= 1:
                return batch
            out: dict[str, list] = {}
            for i, kind in enumerate(kinds):
                blobs = batch.column(f"fit_{i}").to_pylist()
                out[f"fit_{i}"] = [_serialize_fit_state(
                    kind, _merge_fit_blobs(kind, blobs))]
            return pa.table(out)

        parts = ds.map_batches(partials, batch_format="pyarrow", batch_size=None)
        for _ in range(2):
            parts = parts.map_batches(combine, batch_format="pyarrow",
                                      batch_size=64)
        rows = parts.take_all()
        for i, (f, call, kind) in enumerate(requests):
            blobs = [r[f"fit_{i}"] for r in rows]
            call.transform.set_fitted(_merge_fit_blobs(kind, blobs))
        return ds

    # -- shuffle (window) stages ---------------------------------------
    def _root_shuffles(self, f: CompiledFeature) -> bool:
        return any(isinstance(c.transform, GroupByReduce) for c in f.calls())

    def _apply_group_reduce(self, ds, f: CompiledFeature, published: set):
        """Lower every GroupByReduce node (deepest-first) to a hash-shuffle
        stage; rewrite the tree so the remaining ops are pure. Operates on
        the per-call plan copy — never on the engine's compiled trees."""
        counter = 0
        while True:
            nodes = [n for n in f.tree.walk()
                     if isinstance(n, Call) and isinstance(n.transform, GroupByReduce)]
            if not nodes:
                break
            node = nodes[-1]  # walk yields parents before children; take deepest
            gr: GroupByReduce = node.transform
            key = gr.key_feature
            key_col = key.key if isinstance(key, ColumnRef) else str(key)
            tmp_in = f"__gr_in__{f.name}_{counter}"
            tmp_out = f"__gr_out__{f.name}_{counter}"
            counter += 1
            recv = node.recv

            def add_input(batch: pa.Table, recv=recv, fname=(f.spec.input or f.name), tmp=tmp_in) -> pa.Table:
                ctx = BatchCtx(batch)
                data = ctx.cols.get(fname)
                val = as_arrow(recv.eval(data, ctx))
                return batch.append_column(tmp, val)

            ds = ds.map_batches(add_input, batch_format="pyarrow", batch_size=None)

            from ..functions.aggregate import ALGEBRAIC

            broadcast_done = False
            if gr.agg in ALGEBRAIC:
                # skew-proof two-step: per-block partial (sum/count/min/max
                # per key) -> tiny driver merge -> broadcast lookup. No
                # shuffle, no per-group task — a Zipf-hot key costs the
                # same as any other. Holistic aggs (median/mode/concat)
                # and very-high-cardinality keys fall through to the
                # map_groups shuffle below.
                res = self._group_reduce_broadcast(ds, gr, key_col, tmp_in, tmp_out)
                if res is not None:
                    ds = res
                    broadcast_done = True
            if not broadcast_done:
                # holistic (median/mode/concat) or past-the-guard
                # algebraic reduces: one uniform key-hash BUCKET shuffle
                # (events.bucketed_by_key), never one Python/Ray call per
                # key — each bucket resolves ALL its keys in one call;
                # the common aggs use pandas' Cython transform kernels
                from ..pipelines.events import bucketed_by_key

                cython = {"sum": "sum", "mean": "mean", "min": "min",
                          "max": "max", "median": "median",
                          "count": "size"}.get(gr.agg)

                def per_bucket(df: pd.DataFrame, gr=gr, key_col=key_col,
                               tmp_in=tmp_in, tmp_out=tmp_out,
                               cython=cython) -> pd.DataFrame:
                    df = df.copy()
                    g = df.groupby(key_col, sort=False,
                                   dropna=False)[tmp_in]
                    df[tmp_out] = g.transform(cython if cython is not None
                                              else gr.reduce_group)
                    return df

                ds = bucketed_by_key(ds, key_col, per_bucket)
            # drop the temp input AND strip pandas schema metadata that the
            # pandas map_groups round trip attaches (keeps schemas hashable
            # for Ray's block-schema dedup)
            ds = ds.map_batches(
                lambda b, t=tmp_in: b.drop_columns([t]).replace_schema_metadata(None),
                batch_format="pyarrow", batch_size=None)
            f.tree = _replace_node(f.tree, node, Ref(tmp_out, None))
            # tmp_out is a plain column now; drop it after the fused pass
            published.add(tmp_out)
        return ds

    def _group_reduce_broadcast(self, ds, gr, key_col: str, tmp_in: str,
                                tmp_out: str, max_keys: int = 2_000_000):
        """Algebraic window reduce as partial-aggregate + broadcast join:
        one streaming pass emits an Arrow (key, sum, count, min, max)
        partial per block; the partials are merged in a DISTRIBUTED
        groupby (small shuffle — partials only, never raw rows), and the
        driver collects nothing until the merged per-key row count is
        known to fit the broadcast guard. A high-cardinality key (10^8
        repos) therefore falls back to the shuffle path without ever
        materializing num_blocks x keys_per_block rows on the driver."""
        import ray
        from ray.data.aggregate import Max, Min, Sum

        def partial(batch: pa.Table) -> pa.Table:
            t = pa.table({key_col: batch.column(key_col),
                          "v": batch.column(tmp_in)})
            g = t.group_by(key_col).aggregate(
                [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")])
            return pa.table({key_col: g.column(key_col),
                             "s": g.column("v_sum"),
                             "c": g.column("v_count").cast(pa.int64()),
                             "mn": g.column("v_min"), "mx": g.column("v_max")})

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=None).materialize()
        if parts.count() <= max_keys:
            # common case (low-cardinality key): the per-block partials
            # themselves fit the guard — merge them on the driver, no
            # extra shuffle. The count is materialized METADATA, so the
            # guard is decided before any row reaches the driver.
            merged = parts.to_pandas().rename(
                columns={"s": "sum(s)", "c": "sum(c)",
                         "mn": "min(mn)", "mx": "max(mx)"}) \
                .groupby(key_col, dropna=False) \
                .agg({"sum(s)": "sum", "sum(c)": "sum",
                      "min(mn)": "min", "max(mx)": "max"})
        else:
            # many partial rows: merge DISTRIBUTEDLY (small shuffle of
            # partials, never raw rows) and only collect if the merged
            # per-key table fits the broadcast guard
            merged_ds = parts.groupby(key_col).aggregate(
                Sum("s"), Sum("c"), Min("mn"), Max("mx")).materialize()
            if merged_ds.count() > max_keys:
                # per-key table not "small": the broadcast would strain
                # the driver — signal the caller to use the shuffle path
                return None
            merged = merged_ds.to_pandas().set_index(key_col)
        if gr.agg == "sum":
            lut = merged["sum(s)"]
        elif gr.agg == "count":
            lut = merged["sum(c)"]
        elif gr.agg == "mean":
            lut = merged["sum(s)"] / merged["sum(c)"]
        elif gr.agg == "min":
            lut = merged["min(mn)"]
        else:
            lut = merged["max(mx)"]
        # null keys form their own group (SQL PARTITION BY semantics —
        # what the map_groups shuffle path already does); a NaN dict key
        # is unreliable as a lookup key, so its value ships separately
        null_mask = lut.index.isna()
        null_val = float(lut[null_mask].iloc[0]) if null_mask.any() else None
        lut_ref = ray.put((lut[~null_mask].to_dict(), null_val))

        def attach(batch: pa.Table) -> pa.Table:
            lu, null_val = ray.get(lut_ref)
            keys = batch.column(key_col).to_pandas()
            vals = keys.map(lu).astype(np.float64)
            if null_val is not None:
                vals[keys.isna()] = null_val
            return batch.append_column(tmp_out, pa.array(vals, pa.float64()))

        return ds.map_batches(attach, batch_format="pyarrow", batch_size=None)

    # -- fused vector pass ---------------------------------------------
    def _fused_level_pass(self, ds, feats: list[CompiledFeature],
                          features: dict, published: set):
        if not feats:
            return ds
        specs = [(f.name, f.spec.input or f.name, f.tree, f.spec.arrow_type) for f in feats]
        feat_names = frozenset(features)
        pub = frozenset(published)

        def fn(batch: pa.Table) -> pa.Table:
            ctx = BatchCtx(batch)
            for name, input_col, tree, ty in specs:
                raw = ctx.cols.get(input_col)
                if tree is None:
                    if raw is None:
                        raise TransformationError(
                            f"feature {name} has no input column and no transformation")
                    val = raw
                else:
                    val = tree.eval(raw, ctx)
                if not isinstance(val, (pa.Array, pa.ChunkedArray, np.ndarray, list)):
                    if isinstance(val, pa.Scalar):
                        val = val.as_py()
                    val = pa.array([val] * ctx.num_rows)  # scalar broadcast
                ctx.put(name, _finalize(val, ty))
            keep = list(batch.column_names)
            keep += [n for n in ctx.cols if n not in keep and
                     (n in feat_names or n in pub)]
            return ctx.to_table(keep)

        return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)

    # ------------------------------------------------------------------
    def feature_names(self) -> list[str]:
        return list(self.features)
