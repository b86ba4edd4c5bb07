"""Row-reshaping operators: explode (SQL UNNEST) over list columns.

``explode_list`` is a stateless vectorized flat-map: each block expands
independently (no shuffle, no state), so it streams at any scale — the
only cost is the output being larger than the input. Positions are
computed from the flattened parent indices with one run-length pass, so
sliced/chunked Arrow list arrays are handled without touching raw
offsets.

SQL parity (DuckDB ``unnest``): a NULL list and an empty list both
produce no rows; positions are 1-based like ``generate_subscripts``.

Reference parity: feature-fabrica's Split produces list columns
(transform/string.py:59-67) but has no row-expanding operator; explode
completes that family for token-level corpus work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["explode_list", "unpivot", "global_row_number"]


def explode_list(ds, list_col: str, pos_col: str = "pos",
                 val_col: str = "val", base: int = 1):
    """One output row per list element of ``list_col``; all other
    columns are repeated per element, ``pos_col`` is the (``base``-based)
    position within the list and ``val_col`` the element value. NULL and
    empty lists emit no rows (SQL UNNEST parity). Returns a Dataset."""

    def fn(batch: pa.Table) -> pa.Table:
        lst = batch.column(list_col)
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        parent = pc.list_parent_indices(lst)
        flat = pc.list_flatten(lst)
        p = parent.to_numpy(zero_copy_only=False)
        n = p.size
        if n:
            idx = np.arange(n, dtype=np.int64)
            run_start = np.where(
                np.concatenate(([True], p[1:] != p[:-1])), idx, 0)
            pos = idx - np.maximum.accumulate(run_start) + base
        else:
            pos = np.zeros(0, np.int64)
        rest = batch.drop_columns([list_col]).take(parent)
        return rest.append_column(pos_col, pa.array(pos, pa.int64())) \
                   .append_column(val_col, flat)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def unpivot(ds, value_cols: list[str], name_col: str = "name",
            val_col: str = "value", drop_null: bool = True):
    """Wide-to-long reshape (SQL UNPIVOT, the inverse of
    ``grouped.pivot_agg``): one output row per (input row, column in
    ``value_cols``), with ``name_col`` holding the source column's name
    and ``val_col`` its value; all other columns repeat. NULL cells emit
    no row by default (DuckDB UNPIVOT parity; ``drop_null=False`` keeps
    them). Stateless per-block flat-map — no shuffle, streams at any
    scale; output is ``len(value_cols)``x the input row count.

    The measure columns are unified to a common type: float64 when all
    are numeric, utf8 otherwise (SQL UNPIVOT requires compatible types).
    """
    if not value_cols:
        raise ValueError("unpivot: value_cols must be non-empty")

    def fn(batch: pa.Table) -> pa.Table:
        numeric = all(
            pa.types.is_integer(batch.schema.field(c).type)
            or pa.types.is_floating(batch.schema.field(c).type)
            for c in value_cols)
        common = pa.float64() if numeric else pa.string()
        rest = batch.drop_columns(value_cols)
        pieces = []
        for c in value_cols:
            vals = batch.column(c).cast(common)
            piece = rest.append_column(
                name_col, pa.array([c] * len(batch), pa.string())) \
                .append_column(val_col, vals)
            if drop_null:
                piece = piece.filter(pc.is_valid(vals))
            pieces.append(piece)
        return pa.concat_tables(pieces)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def global_row_number(ds, sort_keys, *, id_col: str = "row_num",
                      base: int = 1, descending: bool = False):
    """SQL ``row_number() OVER (ORDER BY sort_keys)`` — a global total
    order. ``ds.sort`` is the unavoidable all-to-all range exchange
    (Ray samples key boundaries, so skew is the sort's problem); then
    each sorted block is stamped with its offset range by a raw Ray
    task. Only the per-block ROW COUNTS ever reach the driver (one int
    per block, read from block metadata); the cumulative offsets are
    shipped back with the task args and every block numbers itself —
    no data moves twice. Raw tasks (not ``map_batches``) are used
    because a batch UDF cannot know its block's global position; this
    is the documented Dataset-API escape hatch.

    Ties in ``sort_keys`` get an arbitrary (but total) order, exactly
    like SQL row_number without a fully-deterministic key — pass a
    unique tiebreaker column for reproducible output. The flagship use
    is the deterministic TRAINING-DATA SHUFFLE: sort by a (salted)
    hash of the document key and the row numbers are a reproducible
    global shuffle order (see __ray_entry__.q_sp_shuffle).

    Note ``ray.data.range(n).zip(sorted)`` would NOT work: zip aligns
    row counts but does not preserve the id dataset's block ORDER
    (verified empirically), so the stamped ids would be permuted.
    """
    import ray
    import ray.data

    out = ds.sort(sort_keys, descending=descending).materialize()

    @ray.remote
    def stamp(block, start: int) -> pa.Table:
        if not isinstance(block, pa.Table):   # pandas-backed block
            block = pa.Table.from_pandas(block, preserve_index=False)
        ids = np.arange(start, start + block.num_rows, dtype=np.int64)
        return block.append_column(id_col, pa.array(ids, pa.int64()))

    refs, offset = [], base
    for bundle in out.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            refs.append(stamp.remote(block_ref, offset))
            offset += meta.num_rows
    return ray.data.from_arrow_refs(refs)
