"""Distributed distinct set operations (UNION / INTERSECT / EXCEPT)
over one key column of two Datasets.

Physical shape: each block first collapses to its DISTINCT keys tagged
with a side flag — only those block-local distinct keys enter the ONE
keyed shuffle — then a sort-based ``groupby(key).aggregate(Max(flag))``
ORs the side flags per key and a stateless vectorized filter keeps the
keys the operation selects. No per-key Python calls anywhere: the
reduce is Ray's native aggregate and the filter is an Arrow kernel, so
the path is safe at web-scale key cardinalities (the output is a
Dataset, never driver-collected here).

Null keys follow SQL set-operation semantics (NULLs compare equal to
each other): they ride the engine's "\\0null" sentinel group and come
back as a null key row.

Reference parity: feature-fabrica has no multi-table operators at all;
set ops are part of this engine's table-level toolkit alongside the
join family (pipelines/join.py).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..tuning import shuffle_partitions

__all__ = ["set_op_keys", "snapshot_delta"]

_OPS = ("union", "intersect", "except")


def set_op_keys(ds_a, ds_b, col_a: str, col_b: str, op: str):
    """Distinct keys of ``ds_a[col_a] <op> ds_b[col_b]``.

    ``op``: ``"union"`` | ``"intersect"`` | ``"except"`` (a minus b),
    all with SQL DISTINCT set semantics. Returns a Dataset with one
    column ``k`` in the key's original dtype, one row per surviving
    distinct key (null key included when it survives).
    """
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}, got {op!r}")
    from ray.data.aggregate import Max

    def partial(col: str, a_flag: int):
        def fn(batch: pa.Table) -> pa.Table:
            g = batch.select([col]).group_by([col]).aggregate([])
            k = g.column(col)
            gkey = pc.fill_null(pc.cast(k, pa.string()), "\0null")
            n = len(k)
            return pa.table({
                "__gkey": gkey,
                "k": k,
                "is_a": pa.array([a_flag] * n, pa.int64()),
                "is_b": pa.array([1 - a_flag] * n, pa.int64())})
        return fn

    tagged = (
        ds_a.map_batches(partial(col_a, 1), batch_format="pyarrow",
                         batch_size=None)
        .union(ds_b.map_batches(partial(col_b, 0), batch_format="pyarrow",
                                batch_size=None)))
    merged = tagged.groupby("__gkey", num_partitions=shuffle_partitions()) \
        .aggregate(Max("k"), Max("is_a"), Max("is_b"))

    def keep(batch: pa.Table) -> pa.Table:
        has_a = pc.equal(batch.column("max(is_a)"), 1)
        has_b = pc.equal(batch.column("max(is_b)"), 1)
        if op == "union":
            mask = pc.or_(has_a, has_b)
        elif op == "intersect":
            mask = pc.and_(has_a, has_b)
        else:
            mask = pc.and_(has_a, pc.invert(has_b))
        return pa.table({"k": batch.column("max(k)").filter(mask)})

    return merged.map_batches(keep, batch_format="pyarrow",
                              batch_size=None)


def snapshot_delta(ds_a, ds_b, key_cols: list[str],
                   compare_cols: list[str], buckets: int | None = None):
    """Row-level change-data-capture between two snapshots of the same
    table keyed by ``key_cols``: classify every key as ``added`` (only
    in B), ``removed`` (only in A) or ``changed`` (in both with any
    ``compare_cols`` value differing, NULL-safe ``IS DISTINCT FROM``
    semantics); unchanged keys never leave the shuffle. The incremental-
    revalidation primitive: validate only the delta, not the snapshot.

    Physical shape: each side is projected to ``key_cols +
    compare_cols`` and tagged, then ONE bucket-grouped keyed shuffle
    (uniform hash buckets over the key — the ``uniqueness.py`` shape,
    no per-key Python) and a vectorized pandas outer-merge per bucket.
    Keys must be unique within each snapshot (the CDC contract) —
    duplicates fail loud. Returns a Dataset with ``key_cols``,
    ``change_type``, and ``old_<c>`` / ``new_<c>`` for every compared
    column (NULL on the absent side)."""
    import numpy as np

    from ..state import combine_hashes, hash64
    from ..tuning import shuffle_partitions

    nb = buckets or shuffle_partitions()
    cols = list(dict.fromkeys([*key_cols, *compare_cols]))

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(cols)
            h = combine_hashes(*[hash64(t.column(c)) for c in key_cols])
            return t.append_column("__side", pa.array(
                np.full(len(t), side, np.int64))) \
                .append_column("__bucket", pa.array(
                    (h % np.uint64(nb)).astype(np.int64)))
        return fn

    def classify(df):
        import pandas as pd

        a = df[df["__side"] == 0].drop(columns=["__side", "__bucket"])
        b = df[df["__side"] == 1].drop(columns=["__side", "__bucket"])
        for side, name in ((a, "A"), (b, "B")):
            if side.duplicated(subset=key_cols).any():
                dup = side[side.duplicated(subset=key_cols)].iloc[0]
                raise ValueError(
                    f"snapshot_delta: duplicate key in snapshot {name}: "
                    f"{dup[key_cols].to_dict()} — CDC requires unique "
                    f"keys per snapshot")
        m = a.merge(b, on=key_cols, how="outer", suffixes=("_a", "_b"),
                    indicator=True)
        old = {c: m[f"{c}_a"] if c in compare_cols and c not in key_cols
               else m[c] for c in compare_cols}
        new = {c: m[f"{c}_b"] if c in compare_cols and c not in key_cols
               else m[c] for c in compare_cols}
        diff = np.zeros(len(m), bool)
        for c in compare_cols:
            o, n = old[c], new[c]
            diff |= ((o != n) & ~(o.isna() & n.isna())).to_numpy()
        change = np.where(
            m["_merge"] == "right_only", "added",
            np.where(m["_merge"] == "left_only", "removed",
                     np.where(diff, "changed", "")))
        out = m[key_cols].copy()
        out["change_type"] = change
        for c in compare_cols:
            out[f"old_{c}"] = old[c].where(m["_merge"] != "right_only")
            out[f"new_{c}"] = new[c].where(m["_merge"] != "left_only")
        out = out[out["change_type"] != ""].reset_index(drop=True)
        if out.empty:   # typed empty so Ray keeps the schema
            return pd.DataFrame(
                {c: pd.Series([], dtype=m[c].dtype) for c in key_cols}
                | {"change_type": pd.Series([], dtype=object)}
                | {f"old_{c}": pd.Series([], dtype="float64")
                   for c in compare_cols}
                | {f"new_{c}": pd.Series([], dtype="float64")
                   for c in compare_cols})
        return out

    tagged = ds_a.map_batches(tag(0), batch_format="pyarrow",
                              batch_size=None) \
        .union(ds_b.map_batches(tag(1), batch_format="pyarrow",
                                batch_size=None))
    return tagged.groupby("__bucket", num_partitions=nb) \
        .map_groups(classify, batch_format="pandas")


def golden_record(ds, key_cols: list[str], order_col: str,
                  value_cols: list[str], descending: bool = True):
    """Survivorship merge / golden-record consolidation: duplicate
    rows per key collapse into ONE record where each value column
    independently takes its first NON-NULL value in ``order_col``
    priority order (recency, source trust, completeness score) — the
    entity-resolution merge step after duplicate detection; plain
    keep-one dedup would throw away a newer row's only-filled field.

    One uniform key-hash BUCKET shuffle (``events.bucketed_by_key`` on
    a combined null-safe key), then inside each bucket ONE stable sort
    by (key, order desc, values asc) + pandas' Cython
    ``groupby(...).first()`` (first NON-NULL per column, vectorized
    across ALL the bucket's keys) — entity resolution is exactly the
    high-cardinality-key workload where one Python call per key would
    be interpreter-bound; here Python cost is one call per bucket.
    Ties in ``order_col`` break by the remaining columns for
    determinism. Returns a Dataset with key_cols + value_cols, one row
    per distinct key."""
    from .events import bucketed_by_key
    from .grouped import _restore_null_keys, _with_shuffle_key_multi

    cols = list(dict.fromkeys(key_cols + [order_col] + value_cols))

    def project(b: pa.Table) -> pa.Table:
        return _with_shuffle_key_multi(b.select(cols), key_cols)

    pre = ds.map_batches(project, batch_format="pyarrow", batch_size=None)

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        rows = df.drop(columns="__gkey").sort_values(
            key_cols + [order_col] + value_cols,
            ascending=[True] * len(key_cols) + [not descending]
            + [True] * len(value_cols),
            kind="mergesort")
        # rows of a key are contiguous and priority-ordered, so
        # groupby.first() == first non-null per column per key
        out = rows.groupby(key_cols, sort=False, dropna=False)[
            value_cols].first().reset_index()
        return _restore_null_keys(out, key_cols)[key_cols + value_cols]

    return bucketed_by_key(pre, "__gkey", per_bucket)
