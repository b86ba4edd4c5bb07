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

__all__ = ["explode_list", "unpivot", "global_row_number",
           "list_column_stats"]


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


def list_column_stats(ds, list_col: str, out_prefix: str = ""):
    """Per-row element-wise statistics over a list<number> column
    (embeddings, token-id arrays): ``dim`` (element count), ``first``
    (element 0), ``vsum`` / ``vmin`` / ``vmax`` and ``l2_norm`` — the
    schema-level profile of a vector column before any ANN work.

    Stateless vectorized flat-map: one ``np.add/min/max.reduceat`` pass
    over the flattened float64 buffer per block — no per-row loop, no
    shuffle, streams at any scale. SQL parity (DuckDB
    ``list_aggregate``): NULL and EMPTY lists yield NULL stats (dim is
    0 for the empty list, NULL for a NULL list). Elements are cast to
    float64 BEFORE aggregation on both engines so the accumulations
    agree to rounding."""
    p = out_prefix

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(list_col)
        arr = (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
               else col)
        if isinstance(arr, pa.LargeListArray):
            arr = arr.cast(pa.list_(arr.type.value_type))
        # slice-safe flatten: rebase offsets onto the flattened values
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        lens = pc.fill_null(pc.list_value_length(arr), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        vals = pc.cast(pc.list_flatten(arr), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
        n = len(arr)
        nonempty = lens > 0
        vsum = np.full(n, np.nan)
        vmin = np.full(n, np.nan)
        vmax = np.full(n, np.nan)
        sq = np.full(n, np.nan)
        first = np.full(n, np.nan)
        if vals.size and nonempty.any():
            idx = offs[nonempty]
            vsum[nonempty] = np.add.reduceat(vals, idx)
            vmin[nonempty] = np.minimum.reduceat(vals, idx)
            vmax[nonempty] = np.maximum.reduceat(vals, idx)
            sq[nonempty] = np.add.reduceat(vals * vals, idx)
            first[nonempty] = vals[idx]
            # segment boundaries are exact: empty lists contribute no
            # flattened values, so consecutive nonempty starts (and the
            # array end) delimit precisely one list's elements each
        stats = {
            f"{p}dim": pa.array(lens, pa.int64(), mask=~valid),
            f"{p}first": pa.array(np.where(valid & nonempty, first,
                                           np.nan)),
            f"{p}vsum": pa.array(np.where(valid & nonempty, vsum,
                                          np.nan)),
            f"{p}vmin": pa.array(np.where(valid & nonempty, vmin,
                                          np.nan)),
            f"{p}vmax": pa.array(np.where(valid & nonempty, vmax,
                                          np.nan)),
            f"{p}l2_norm": pa.array(np.where(valid & nonempty,
                                             np.sqrt(sq), np.nan)),
        }
        out = batch
        for name, a in stats.items():
            out = out.append_column(name, a)
        return out

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def budget_select(ds, value_col: str, cost_col: str, budget: float,
                  tiebreak_col: str, cum_col: str = "cum_cost"):
    """Greedy data selection under a GLOBAL cost budget: rows are
    ranked by value-per-cost ratio (descending, ties broken by
    ``tiebreak_col``) and kept while the running cost total stays
    within ``budget`` — the token-budget corpus-selection step of a
    training-data pipeline ("best quality-per-token documents until
    the budget is spent"), i.e. ``WHERE sum(cost) OVER (ORDER BY
    value/cost DESC, tiebreak) <= budget`` with the inclusive SQL
    frame. Rows with null value or cost are excluded; cost is floored
    at 1 in the ratio so zero-cost rows rank by raw value instead of
    dividing by zero.

    Scale shape: ONE range-exchange sort on the ratio (Ray samples
    boundaries; the same unavoidable all-to-all ``global_row_number``
    documents), then two raw-task passes over the sorted blocks — a
    per-block cost SUM (one float per block to the driver, the
    ``global_row_number`` offsets pattern) and a per-block prefix
    cumsum + filter stamped with the shipped offsets. Blocks whose
    offset already exceeds the budget are skipped without being
    touched. Appends ``cum_col`` (float64 running cost including the
    row). Raw tasks are the documented Dataset-API escape hatch: a
    batch UDF cannot know its block's global position."""
    import ray
    import ray.data
    import pyarrow.compute as pc

    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")

    def add_ratio(b: pa.Table) -> pa.Table:
        v = b.column(value_col).cast(pa.float64())
        c = b.column(cost_col).cast(pa.float64())
        ok = pc.and_(pc.is_valid(v), pc.is_valid(c))
        t = b.filter(ok)
        v = t.column(value_col).cast(pa.float64())
        c = t.column(cost_col).cast(pa.float64())
        # the past-budget block skip assumes a monotone running cost,
        # which requires non-negative costs — fail fast, not silently
        if t.num_rows and pc.min(c).as_py() < 0:
            raise ValueError(
                "budget_select: negative cost encountered — the "
                "running-budget cutoff requires cost >= 0")
        r = pc.divide(v, pc.max_element_wise(c, 1.0))
        return t.append_column("__ratio", r)

    srt = ds.map_batches(add_ratio, batch_format="pyarrow",
                         batch_size=None) \
        .sort(["__ratio", tiebreak_col],
              descending=[True, False]).materialize()

    @ray.remote
    def cost_sum(block) -> float:
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        s = pc.sum(block.column(cost_col).cast(pa.float64())).as_py()
        return float(s or 0.0)

    @ray.remote
    def select(block, start: float, budget: float) -> pa.Table:
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        c = block.column(cost_col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        cum = start + np.cumsum(c)
        t = block.append_column(cum_col, pa.array(cum, pa.float64()))
        return t.filter(pa.array(cum <= budget)) \
            .drop_columns(["__ratio"])

    block_refs = [block_ref
                  for bundle in srt.iter_internal_ref_bundles()
                  for block_ref, _meta in bundle.blocks]
    sums = ray.get([cost_sum.remote(br) for br in block_refs])
    offsets = np.concatenate([[0.0], np.cumsum(sums)[:-1]]) \
        if sums else np.zeros(0)
    keep = [(br, off) for br, off in zip(block_refs, offsets)
            if off <= budget]
    if not keep:
        # empty result with the input schema + cum_col
        schema = srt.schema().base_schema
        cols = {f.name: pa.array([], f.type) for f in schema
                if f.name != "__ratio"}
        cols[cum_col] = pa.array([], pa.float64())
        return ray.data.from_arrow(pa.table(cols))
    return ray.data.from_arrow_refs(
        [select.remote(br, off, float(budget)) for br, off in keep])
