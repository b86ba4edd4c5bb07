"""Sequence packing: greedy next-fit assignment of documents into
fixed-size context windows — the standard pre-training batching step
(pack short documents together so a context window wastes no tokens).

Scale shape: packing is inherently sequential WITHIN a stream, so the
corpus is split into deterministic shards (``doc_id % n_shards`` — id-
derived, layout-independent) and each shard packs independently inside
one ``groupby().map_groups`` task, docs in ascending id order. Packs
never span shards; ``n_shards`` is the parallelism knob (at 100 TB,
thousands of shards keep every core busy while each task holds only its
shard). Output rows = input rows — this is an assignment, not a
materialization of packed token buffers.

A document longer than the context gets its own pack with
``truncated=True``; the assignment never splits a document across packs
(the common "no cross-doc attention" convention).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["pack_sequences", "zorder_key", "hilbert_key",
           "zonemap_stats"]

_SHARD_STRIDE = 10_000_000_000  # pack_id = shard * stride + seq-in-shard


def pack_sequences(ds, id_col: str = "doc_id", len_col: str = "n_tokens",
                   context_len: int = 2048, n_shards: int = 16):
    """Assign each document to a pack id under greedy next-fit.

    Returns a Dataset (id_col, len_col, pack_id int64, pack_offset int64,
    truncated bool): ``pack_offset`` is the document's token start within
    its pack; ``truncated`` marks single-doc packs exceeding the context.
    Deterministic for a given (ids, lengths) regardless of partitioning.
    """

    def add_shard(batch):
        import pyarrow as pa
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        shard = np.abs(ids) % n_shards
        return batch.append_column("__shard", pa.array(shard, pa.int64()))

    def pack_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        lens = df[len_col].to_numpy(dtype=np.int64)
        shard = int(df["__shard"].iloc[0])
        n = len(df)
        # next-fit = repeatedly take the maximal prefix fitting the
        # context; one searchsorted per PACK (not per doc) over the
        # cumulative lengths — the recurrence is sequential by nature,
        # but the loop runs O(packs) times, each O(log n)
        cum = np.concatenate([[0], np.cumsum(lens)])
        starts = []
        i = 0
        while i < n:
            starts.append(i)
            j = int(np.searchsorted(cum, cum[i] + context_len,
                                    side="right")) - 1
            i = max(j, i + 1)            # oversize doc -> its own pack
        starts = np.asarray(starts, np.int64)
        pack_seq = np.searchsorted(starts, np.arange(n), side="right") - 1
        offset = cum[:-1] - cum[starts[pack_seq]]
        out = pd.DataFrame({
            id_col: df[id_col],
            len_col: df[len_col],
            "pack_id": shard * _SHARD_STRIDE + pack_seq,
            "pack_offset": offset,
            "truncated": lens > context_len,
        })
        return out

    sharded = ds.map_batches(add_shard, batch_format="pyarrow",
                             batch_size=None)
    return sharded.groupby("__shard").map_groups(pack_group,
                                                 batch_format="pandas")


def zorder_key(ds, x_col: str, y_col: str, *,
               x_lo: float, x_hi: float, y_lo: float, y_hi: float,
               bits: int = 8, n_buckets: int | None = None):
    """Z-order (Morton) clustering key over two numeric columns — the
    multidimensional data-layout stamp: sorting / range-partitioning by
    ``zkey`` co-locates rows that are close in BOTH dimensions, so a
    reader filtering on either column prunes most files (the layout
    trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``).

    Each coordinate is quantized onto a fixed 2^bits grid over
    [lo, hi) (fixed, data-independent bounds — same contract as
    histogram2d_fixed: deterministic, mergeable, no fit pass), then
    bits interleave x1 y1 x0 y0 ... with x taking the higher slot.
    Stateless vectorized ``map_batches`` stamp — rows never move; pair
    with ``write_range_partitioned(col="zkey")`` to realize the
    layout. Out-of-range values clamp to the edge cells; nulls go to
    cell 0 of that dimension.

    With ``n_buckets`` (power of two) a coarse ``zbucket`` column is
    added (the top log2(n_buckets) bits of zkey) for direct use as a
    partition key. Adds int64 columns; input columns are preserved.
    """
    if bits < 1 or bits > 31:
        raise ValueError(f"zorder_key: bits must be in [1, 31], got {bits}")
    shift = None
    if n_buckets is not None:
        nb = int(n_buckets)
        if nb < 1 or nb & (nb - 1):
            raise ValueError(f"zorder_key: n_buckets must be a power of "
                             f"two, got {n_buckets}")
        if nb > 4 ** bits:
            # shift would go negative, and numpy right-shift by a
            # negative count is undefined (garbage buckets, not an error)
            raise ValueError(
                f"zorder_key: n_buckets={n_buckets} exceeds the "
                f"4**bits={4 ** bits} grid cells at bits={bits}")
        shift = 2 * bits - nb.bit_length() + 1

    import pyarrow as pa

    cells = float(1 << bits)
    top = (1 << bits) - 1

    def quant(col, lo: float, hi: float) -> np.ndarray:
        x = col.cast(pa.float64()).fill_null(lo).to_numpy(
            zero_copy_only=False)
        q = np.floor((x - lo) / (hi - lo) * cells)
        return np.clip(q, 0, top).astype(np.int64)

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            out = t.append_column("zkey", pa.array([], pa.int64()))
            if shift is not None:
                out = out.append_column("zbucket", pa.array([], pa.int64()))
            return out
        xi = quant(t.column(x_col), x_lo, x_hi)
        yi = quant(t.column(y_col), y_lo, y_hi)
        z = np.zeros(t.num_rows, np.int64)
        for j in range(bits):
            z |= ((xi >> j) & 1) << (2 * j + 1)
            z |= ((yi >> j) & 1) << (2 * j)
        out = t.append_column("zkey", pa.array(z, pa.int64()))
        if shift is not None:
            out = out.append_column("zbucket",
                                    pa.array(z >> shift, pa.int64()))
        return out

    return ds.map_batches(stamp, batch_format="pyarrow", batch_size=None)


def hilbert_key(ds, x_col: str, y_col: str, *,
                x_lo: float, x_hi: float, y_lo: float, y_hi: float,
                bits: int = 8, n_buckets: int | None = None):
    """Hilbert-curve clustering key over two numeric columns — same
    layout contract as ``zorder_key`` (fixed 2^bits grid, stateless
    vectorized stamp, pair with ``write_range_partitioned``), but the
    Hilbert curve preserves locality strictly better than Morton:
    consecutive keys are ALWAYS grid-adjacent (Z-order jumps across
    the plane at quadrant seams), so range-partitioned files get
    tighter bounding boxes and better skip rates on both columns.

    Standard xy→d bit-twiddling (one rotate/reflect per bit level,
    Wikipedia's iterative form), vectorized: the loop is over
    ``bits`` levels, never rows. Out-of-range clamps to the edge,
    nulls to cell 0 (the zorder_key contract). Appends ``hkey`` and,
    with ``n_buckets`` (power of two), ``hbucket`` = top bits."""
    if bits < 1 or bits > 31:
        raise ValueError(f"hilbert_key: bits must be in [1, 31], "
                         f"got {bits}")
    shift = None
    if n_buckets is not None:
        nb = int(n_buckets)
        if nb < 1 or nb & (nb - 1):
            raise ValueError(f"hilbert_key: n_buckets must be a power "
                             f"of two, got {n_buckets}")
        if nb > 4 ** bits:
            # shift would go negative, and numpy right-shift by a
            # negative count is undefined (garbage buckets, not an error)
            raise ValueError(
                f"hilbert_key: n_buckets={n_buckets} exceeds the "
                f"4**bits={4 ** bits} grid cells at bits={bits}")
        shift = 2 * bits - nb.bit_length() + 1

    import pyarrow as pa

    cells = float(1 << bits)
    top = (1 << bits) - 1

    def quant(col, lo: float, hi: float) -> np.ndarray:
        x = col.cast(pa.float64()).fill_null(lo).to_numpy(
            zero_copy_only=False)
        q = np.floor((x - lo) / (hi - lo) * cells)
        return np.clip(q, 0, top).astype(np.int64)

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            out = t.append_column("hkey", pa.array([], pa.int64()))
            if shift is not None:
                out = out.append_column("hbucket",
                                        pa.array([], pa.int64()))
            return out
        x = quant(t.column(x_col), x_lo, x_hi)
        y = quant(t.column(y_col), y_lo, y_hi)
        d = np.zeros(t.num_rows, np.int64)
        n = 1 << bits
        s = n >> 1
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            # rotate/reflect the quadrant so the next level sees the
            # curve in canonical orientation (reflection is over the
            # FULL grid side n, per the standard xy2d form)
            swap = ry == 0
            refl = swap & (rx == 1)
            x = np.where(refl, n - 1 - x, x)
            y = np.where(refl, n - 1 - y, y)
            x2 = np.where(swap, y, x)
            y2 = np.where(swap, x, y)
            x, y = x2, y2
            s >>= 1
        out = t.append_column("hkey", pa.array(d, pa.int64()))
        if shift is not None:
            out = out.append_column("hbucket",
                                    pa.array(d >> shift, pa.int64()))
        return out

    return ds.map_batches(stamp, batch_format="pyarrow", batch_size=None)


def zonemap_stats(ds, bucket_col: str, cols: list[str],
                  predicate: dict[str, tuple[float, float]] | None = None
                  ) -> "pd.DataFrame":
    """Per-bucket ZONE MAPS — the payoff measurement for the layout
    keys: min/max of each listed column + row count per ``bucket_col``
    partition (what a Parquet writer would persist as row-group
    statistics), and, given a box ``predicate`` {col: (lo, hi)}, the
    per-bucket ``skippable`` verdict (zone disjoint from the box on
    ANY predicated column) plus the headline skip fraction a reader
    would achieve. Clustering quality becomes a NUMBER: the same
    predicate over a zorder/hilbert-bucketed layout skips most
    buckets; over a random layout it skips ~none.

    Scale shape: one per-block Arrow ``group_by`` min/max/count
    combiner (rows never leave their block), a driver merge over the
    ≤|buckets| x blocks partial rows, and closed-form flags. NULLs are
    ignored for bounds (a null never matches a box predicate).
    Returns (bucket, n, <col>_min, <col>_max, ..., skippable) sorted
    by bucket."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        aggs = [([], "count_all")]
        for c in cols:
            aggs += [(c, "min"), (c, "max")]
        g = batch.select([bucket_col, *cols])             .group_by([bucket_col]).aggregate(aggs)
        out = {bucket_col: g.column(bucket_col),
               "n": g.column("count_all").cast(pa.int64())}
        for c in cols:
            out[f"{c}_min"] = g.column(f"{c}_min").cast(pa.float64())
            out[f"{c}_max"] = g.column(f"{c}_max").cast(pa.float64())
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    agg = {"n": ("n", "sum")}
    for c in cols:
        agg[f"{c}_min"] = (f"{c}_min", "min")
        agg[f"{c}_max"] = (f"{c}_max", "max")
    out = parts.groupby(bucket_col, as_index=False).agg(**agg)
    out["n"] = out["n"].astype(np.int64)
    if predicate:
        skip = np.zeros(len(out), bool)
        for c, (lo, hi) in predicate.items():
            skip |= (out[f"{c}_max"].to_numpy() < lo)                 | (out[f"{c}_min"].to_numpy() > hi)
        out["skippable"] = skip
    return out.sort_values(bucket_col).reset_index(drop=True)
