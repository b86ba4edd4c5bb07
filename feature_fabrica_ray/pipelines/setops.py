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

__all__ = ["set_op_keys"]

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
