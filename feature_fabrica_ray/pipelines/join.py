"""Broadcast (map-side) hash join — the scale-correct join for
fact-table x dimension-table enrichment.

The small side is collected once, pruned to the needed columns, shipped
to the object store with ``ray.put``, and every block joins against it
with pyarrow's vectorized hash join — zero shuffle of the big side
(SURVEY.md §2.4: broadcast small sides instead of a co-group exchange).
For two large sides, co-group via ``groupby(key).map_groups`` instead;
this module deliberately only implements the broadcast form and asserts
the small side stays small."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["broadcast_join", "broadcast_cross_join", "broadcast_range_join",
           "shuffle_join", "bloom_filtered_join", "join_cardinality_estimate",
           "salted_join", "sized_join", "upsert_latest"]

_MAX_BROADCAST_ROWS = 5_000_000  # guard: a "small side" must actually be small


def _collect_small(right, columns: list[str] | None) -> pa.Table:
    if hasattr(right, "to_arrow_refs"):          # ray Dataset
        if columns:
            right = right.select_columns(columns)
        out = pa.Table.from_pandas(right.to_pandas(limit=_MAX_BROADCAST_ROWS + 1),
                                   preserve_index=False)
    elif isinstance(right, pa.Table):
        out = right.select(columns) if columns else right
    else:                                        # pandas
        out = pa.Table.from_pandas(right[columns] if columns else right,
                                   preserve_index=False)
    if out.num_rows > _MAX_BROADCAST_ROWS:
        raise ValueError(
            f"broadcast_join small side has {out.num_rows} rows — too large to "
            f"broadcast; use a co-group join (groupby(key).map_groups) instead")
    return out.replace_schema_metadata(None)  # keep joined schemas canonical


def broadcast_join(ds, right, *, left_on: str | list[str],
                   right_on: str | list[str] | None = None,
                   right_columns: list[str] | None = None,
                   how: str = "inner"):
    """Join every block of ``ds`` against the broadcast ``right`` side.

    how: 'inner' | 'left outer' | 'left semi' | 'left anti' (pyarrow
    join types; right-side rows never survive alone — this is map-side)."""
    import ray

    left_keys = [left_on] if isinstance(left_on, str) else list(left_on)
    right_keys = left_keys if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    small = _collect_small(right, right_columns)
    ref = ray.put(small)   # broadcast once; tasks read from the object store

    def fn(batch: pa.Table) -> pa.Table:
        rt = ray.get(ref)
        return batch.join(rt, keys=left_keys, right_keys=right_keys,
                          join_type=how)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def broadcast_cross_join(ds, right, *, right_columns: list[str] | None = None,
                         max_right_rows: int = 10_000,
                         batch_size: int | None = 4096):
    """Cartesian product of every row of ``ds`` with a DIMENSION-sized
    ``right`` table (SQL CROSS JOIN). The right side is broadcast once
    via ``ray.put``; each block expands map-side with two vectorized
    takes — no shuffle, streams at any scale on the left.

    Output is ``len(right)``x the input, so the right side is guarded
    much tighter than ``broadcast_join`` (default 10k rows) and
    ``batch_size`` defaults small to bound the expanded block size. A
    large x large cross join is a deliberate non-goal: at 100 TB it is
    an output-size bug, not a missing feature."""
    import ray

    small = _collect_small(right, right_columns)
    if small.num_rows > max_right_rows:
        raise ValueError(
            f"broadcast_cross_join right side has {small.num_rows} rows > "
            f"max_right_rows={max_right_rows}; a cross join this size "
            f"explodes the output — restructure the pipeline instead")
    ref = ray.put(small)

    def fn(batch: pa.Table) -> pa.Table:
        rt = ray.get(ref)
        n, m = batch.num_rows, rt.num_rows
        out = batch.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), m)))
        tile = pa.array(np.tile(np.arange(m, dtype=np.int64), n))
        for c in rt.column_names:
            out = out.append_column(c, rt.column(c).take(tile))
        return out

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def broadcast_range_join(ds, bands, *, value_col: str, lo_col: str = "lo",
                         hi_col: str = "hi", how: str = "left"):
    """Map-side RANGE join: each row matched to the band whose
    ``[lo, hi)`` interval contains ``value_col`` (bands must be
    non-overlapping). The band table is dimension-sized: sorted once on
    the driver, broadcast, and every block resolves membership with one
    vectorized searchsorted — zero shuffle.

    how: 'left' keeps unmatched rows with null band columns; 'inner'
    drops them. Band columns (all except lo/hi) are appended."""
    import ray

    if isinstance(bands, pa.Table):
        bt = bands
    else:                                    # pandas
        bt = pa.Table.from_pandas(bands, preserve_index=False)
    bt = bt.replace_schema_metadata(None)
    order = pc.sort_indices(bt, sort_keys=[(lo_col, "ascending")])
    bt = bt.take(order).combine_chunks()
    los = bt.column(lo_col).to_numpy(zero_copy_only=False).astype(np.float64)
    his = bt.column(hi_col).to_numpy(zero_copy_only=False).astype(np.float64)
    if (his[:-1] > los[1:]).any() if len(los) > 1 else False:
        raise ValueError("broadcast_range_join: bands overlap")
    out_cols = [c for c in bt.column_names if c not in (lo_col, hi_col)]
    ref = ray.put((bt, los, his))

    def fn(batch: pa.Table) -> pa.Table:
        bt, los, his = ray.get(ref)
        v = batch.column(value_col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        idx = np.searchsorted(los, v, side="right") - 1
        ok = (idx >= 0) & np.isfinite(v)
        ok &= v < his[np.maximum(idx, 0)]
        take = pa.array(np.where(ok, idx, 0), pa.int64())
        null_mask = pa.array(~ok)
        for c in out_cols:
            vals = bt.column(c).take(take)
            vals = pc.if_else(null_mask, pa.nulls(len(batch), vals.type), vals)
            batch = batch.append_column(c, vals)
        if how == "inner":
            batch = batch.filter(pa.array(ok))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def partitions_for_bytes(total_bytes: int | None,
                         target_bytes: int = 128 << 20) -> int:
    """Size-aware hash-partition count for a shuffle join: ~one
    partition per ``target_bytes`` of combined input, clamped to
    [8, 4096]. Ray's hash join pays a fixed per-partition cost
    (aggregator task + exchange round-trip), so a KB..MB join at the
    CPU-derived default (2 x CPUs, measured 8.8 s at 64 partitions vs
    1.8 s at 8 for the same 300k-row join) wastes most of its wall time
    on overhead, while a 100 TB join needs thousands of partitions to
    bound per-partition memory. Callers should pass the cheap
    metadata-level estimate (``ds.size_bytes()`` on the READ stage —
    parquet metadata, no execution; on a transformed dataset it
    executes, so never call it there). ``FFR_SHUFFLE_PARTITIONS``
    overrides everything; unknown size falls back to the CPU-derived
    default."""
    import os

    from ..tuning import shuffle_partitions

    if os.environ.get("FFR_SHUFFLE_PARTITIONS") or not total_bytes:
        return shuffle_partitions()
    return max(8, min(4096, -(-int(total_bytes) // target_bytes)))


def shuffle_join(left, right, *, on, right_on=None, how: str = "inner",
                 num_partitions: int | None = None):
    """Large x large equi-join: Ray Data's native hash join (both sides
    hash-partition on the key across ``num_partitions`` aggregators) —
    the co-group exchange ``broadcast_join`` explicitly does not do.
    Use when the small side stops fitting the broadcast guard."""
    from ..tuning import shuffle_partitions

    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = None if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on))
    return left.join(right, join_type=how,
                     num_partitions=num_partitions or shuffle_partitions(),
                     on=on, right_on=right_on)


_SIZED_BROADCAST_BYTES = 64 << 20  # right side at/below this broadcasts


def sized_join(left, right, *, on, right_on=None, how: str = "inner",
               left_bytes: int | None = None, right_bytes: int | None = None):
    """Size-aware join dispatch: broadcast the right side when its
    known byte size fits a worker's heap, else Ray's hash join with a
    partition count sized to the combined input bytes.

    This is the broadcast-vs-exchange decision every distributed
    engine makes at plan time. Ray's ``JoinOperator`` pays a fixed
    actor-pool spin-up (~5 s on this box) regardless of data size, so
    a KB..MB join is pure overhead through the exchange path, while a
    broadcast join is one ``ray.put`` plus a map-side pyarrow hash
    join per block (zero shuffle of the big side). At 100 TB an edge
    or dimension side larger than the ``FFR_BROADCAST_BYTES``
    threshold (default 64 MB) falls back to the sized shuffle join.

    Pass byte sizes from MATERIALIZED datasets (``ds.size_bytes()`` is
    free metadata there) or a read stage; ``None`` means unknown and
    forces the shuffle path — never call ``size_bytes()`` on a lazy
    transformed dataset (it would execute it).

    Broadcast only dispatches for pyarrow-expressible ``how`` values
    ('inner', 'left outer', 'left semi', 'left anti'); anything else
    takes the shuffle path."""
    import os

    thr = int(os.environ.get("FFR_BROADCAST_BYTES", _SIZED_BROADCAST_BYTES))
    # pyarrow spells join types with spaces, Ray Data with underscores;
    # accept either, plus the bare SQL aliases, and translate per backend
    how = {"left": "left outer", "right": "right outer",
           "full": "full outer", "semi": "left semi",
           "anti": "left anti"}.get(how, how)
    pa_how = how.replace("_", " ")
    broadcastable = pa_how in ("inner", "left outer", "left semi",
                               "left anti")
    if broadcastable and right_bytes is not None and right_bytes <= thr:
        return broadcast_join(left, right, left_on=on, right_on=right_on,
                              how=pa_how)
    total = (left_bytes or 0) + (right_bytes or 0)
    return shuffle_join(left, right, on=on, right_on=right_on,
                        how=how.replace(" ", "_"),
                        num_partitions=partitions_for_bytes(total or None))


def bloom_filtered_join(left, right, *, on: str, right_on: str | None = None,
                        how: str = "inner", fp_rate: float = 1e-4,
                        num_partitions: int | None = None,
                        max_bloom_bytes: int = 64 * 1024 * 1024):
    """Bloom-pruned large x large equi-join: before the all-to-all hash
    join, LEFT rows whose key cannot exist on the right are dropped
    map-side by probing a Bloom filter of the right side's keys — the
    classic shuffle-volume reducer when the join is selective (most left
    rows match nothing, e.g. fact table vs a filtered dimension).

    The filter is built DISTRIBUTEDLY: per-block partial Blooms of
    identical geometry (same technique as the referential-check scale
    path, validate.py::_parent_payload), OR-merged on the driver (the
    KB..MB filter is the only thing collected), broadcast once via
    ``ray.put``. False positives only let a few extra rows into the
    exact join — the result is identical to ``shuffle_join``; false
    negatives are impossible, so no matching row is ever lost.

    Inner joins only: an OUTER join must keep unmatched left rows (so
    pre-filtering is wrong) and semi/anti need an exact membership
    structure anyway. Costs one extra pass over the right side (the
    Bloom build) — worth it when left is much bigger than right and the
    join is selective. When the filter would exceed ``max_bloom_bytes``
    (i.e. the right key set is too big for ANY broadcast structure),
    the pre-filter is skipped and this degrades gracefully to the plain
    hash join — identical result either way.
    """
    import ray

    from ..state import BloomFilter
    from ..tuning import shuffle_partitions

    if how != "inner":
        raise ValueError(f"bloom_filtered_join: how={how!r} unsupported — "
                         f"only inner joins can be Bloom-pruned safely")
    rkey = right_on or on
    right = right.materialize()
    n_right = right.count()
    n_est = int(n_right * 1.2) + 1024

    # OR-mergeable partials must share FULL geometry, so every partial
    # is filter-sized: the build only pays off while the filter itself
    # stays broadcast-sized. Beyond the cap (default 64 MB ≈ 2.2e8 keys
    # at fp 1e-4), skip the pre-filter and run the plain hash join —
    # never ship blocks x GB of filter bytes for a "optimization".
    probe = BloomFilter(n_est, fp_rate)
    if probe.m // 8 > max_bloom_bytes:
        return left.join(right, join_type="inner", on=(on,),
                         right_on=(rkey,),
                         num_partitions=num_partitions
                         or shuffle_partitions())
    # Compact UNCONDITIONALLY into balanced non-empty blocks: (a) at
    # most ~shuffle_partitions() filter-sized Bloom partials move, and
    # (b) Ray's hash join skips a side's schema broadcast when the
    # first block it streams is empty (hash_shuffle.py:223) — an
    # upstream filter can leave empty blocks even when the block count
    # is already small, crashing acero with "No match for key field on
    # right side" (seen at sf0.001). Same guard as graph.py's joins.
    nparts = shuffle_partitions()
    right = right.repartition(min(nparts, max(n_right, 1))).materialize()

    def partial_bloom(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(n_est, fp_rate).add(batch.column(rkey).drop_null())
        return pa.table({"bloom": pa.array([bf.to_bytes()], pa.binary())})

    parts = right.map_batches(partial_bloom, batch_format="pyarrow",
                              batch_size=None).take_all()
    header = bytes(parts[0]["bloom"][:24])
    bits = None
    for r in parts:
        b = np.frombuffer(r["bloom"][24:], np.uint64)
        bits = b.copy() if bits is None else np.bitwise_or(bits, b)
    bloom_ref = ray.put(header + bits.tobytes())

    def prune(batch: pa.Table) -> pa.Table:
        bf = BloomFilter.from_bytes(ray.get(bloom_ref))
        keys = batch.column(on)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return batch.filter(pa.array(bf.contains(keys)))

    # The pruned left needs the same empty-block guard (pruning a
    # selective join can empty whole blocks). The materialize is the
    # price of compaction, and it is marginal here: the hash join
    # buffers both sides in its aggregators anyway, and Bloom pruning
    # exists precisely because the surviving left side is small.
    pruned = left.map_batches(prune, batch_format="pyarrow",
                              batch_size=None).materialize()
    n_pruned = pruned.count()
    if n_pruned == 0:
        # inner join with an empty probe side is empty; derive the
        # result schema from the same acero join Ray would run
        import ray.data as _rd

        def _empty(ds_):
            import ray
            refs = ds_.to_arrow_refs()      # both sides are materialized
            t = ray.get(refs[0]) if refs else pa.table({})
            return t.schema.empty_table()
        res = _empty(pruned).join(_empty(right), keys=[on],
                                  right_keys=[rkey], join_type="inner")
        return _rd.from_arrow(res)
    pruned = pruned.repartition(min(nparts, n_pruned)).materialize()
    return pruned.join(right, join_type="inner", on=(on,), right_on=(rkey,),
                       num_partitions=num_partitions or shuffle_partitions())


def join_cardinality_estimate(left, right, *, on: str,
                              right_on: str | None = None) -> dict:
    """Pre-join planning diagnostics: approximate distinct-key counts
    of each side, of their union, and (by inclusion-exclusion) of their
    intersection — the numbers that decide broadcast vs Bloom-pruned vs
    plain shuffle join before any all-to-all runs.

    Scale shape: one HLL per side built with the combiner pattern (each
    block reduces to a KB-sized sketch, the driver ORs them); the union
    sketch is the merge of the two — no key ever leaves its block.
    Estimates carry HLL error (~2% at the default precision). Returns
    {nd_left, nd_right, nd_union, nd_intersect}."""
    from ..state import HLL

    def side_sketch(ds, col):
        def sk(batch: pa.Table) -> pa.Table:
            uniq = pc.unique(batch.column(col).combine_chunks()
                             .drop_null())
            return pa.table({"h": pa.array([HLL().add_column(uniq)
                                            .to_bytes()], pa.binary())})

        rows = ds.map_batches(sk, batch_format="pyarrow",
                              batch_size=None).take_all()
        h = HLL()
        for r in rows:
            h = h.merge(HLL.from_bytes(r["h"]))
        return h

    hl = side_sketch(left, on)
    hr = side_sketch(right, right_on or on)
    nd_l, nd_r = hl.estimate(), hr.estimate()
    nd_u = hl.merge(hr).estimate()
    return {"nd_left": int(nd_l), "nd_right": int(nd_r),
            "nd_union": int(nd_u),
            "nd_intersect": max(int(nd_l + nd_r - nd_u), 0)}


def salted_join(left, right, *, on: str, right_on: str | None = None,
                salt: int = 8, hot_threshold: float = 0.01,
                num_partitions: int | None = None):
    """Skew-proof large x large inner equi-join: HOT keys (a Zipf head
    that would pin one reduce partition) are SALTED on the left and
    REPLICATED ``salt`` ways on the right, so the hot key's rows spread
    across ``salt`` partitions instead of one straggler — the classic
    hot-key join treatment, the join-side dual of
    curation.salted_group_agg. Result is row-identical to the plain
    hash join.

    Hot-key detection: per-block partial key counts fold through
    mergeable SpaceSaving sketches (KB-sized, never the key space);
    keys whose estimated share of left rows exceeds ``hot_threshold``
    (plus any sketch overcount) get the treatment — a handful by
    construction. Cold keys join on salt 0 with no replication, so the
    overhead is `salt` copies of only the hot RIGHT rows.

    Inner joins only (an outer join must track unmatched rows across
    salt replicas). Columns: the salt key is internal and dropped."""
    import ray

    from ..state import SpaceSaving, hash64
    from ..tuning import shuffle_partitions
    from .topk import approx_heavy_hitters

    rkey = right_on or on
    nparts = num_partitions or shuffle_partitions()
    left = left.materialize()
    n_left = left.count()
    if n_left == 0:
        return left.join(right, join_type="inner", on=(on,),
                         right_on=(rkey,), num_partitions=nparts)

    hh = approx_heavy_hitters(left, on, k=256, top=64)
    thr = hot_threshold * n_left
    hot = [row["v"] for _, row in hh.iterrows() if row["est"] > thr]
    if not hot:
        return left.join(right, join_type="inner", on=(on,),
                         right_on=(rkey,), num_partitions=nparts)
    hot_ref = ray.put(pa.array(pd.Series(hot)))

    def salt_left(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_hot = pc.is_in(t.column(on), value_set=ray.get(hot_ref)
                          .cast(t.schema.field(on).type))
        h = hash64(np.arange(t.num_rows), seed=17) % np.uint64(salt)
        s = np.where(is_hot.to_numpy(zero_copy_only=False), h.astype(np.int64), 0)
        return t.append_column("__salt", pa.array(s, pa.int64()))

    def replicate_right(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_hot = pc.is_in(t.column(rkey), value_set=ray.get(hot_ref)
                          .cast(t.schema.field(rkey).type))
        cold = t.filter(pc.invert(is_hot)).append_column(
            "__salt", pa.array(np.zeros(
                int(pc.sum(pc.invert(is_hot)).as_py() or 0), np.int64)))
        hot_t = t.filter(is_hot)
        parts = [cold]
        for s in range(salt):
            parts.append(hot_t.append_column(
                "__salt", pa.array(np.full(hot_t.num_rows, s, np.int64))))
        return pa.concat_tables(parts)

    lsalted = left.map_batches(salt_left, batch_format="pyarrow",
                               batch_size=None).materialize()
    rsalted = right.map_batches(replicate_right, batch_format="pyarrow",
                                batch_size=None).materialize()
    nr = rsalted.count()
    rsalted = rsalted.repartition(min(nparts, max(nr, 1))).materialize()
    lsalted = lsalted.repartition(min(nparts, max(n_left, 1))).materialize()
    out = lsalted.join(rsalted, join_type="inner",
                       on=(on, "__salt"), right_on=(rkey, "__salt"),
                       num_partitions=nparts)
    return out.drop_columns(["__salt"])


def upsert_latest(base, updates, key_cols: list[str],
                  version_col: str):
    """CDC apply / latest-wins MERGE: union the base snapshot with an
    updates stream and keep, per key, the row with the highest
    ``version_col`` — ties break toward the UPDATES side, then are
    deterministic (the standard "changelog overrides snapshot"
    compaction every incremental table maintenance job runs).

    Scale shape: both inputs stream through a source-tagging map, the
    union shuffles ONCE on hash(key) % B (``events.bucketed_by_key``
    — per-BUCKET Python), and each bucket resolves ALL its keys with
    one vectorized sort + drop_duplicates; no driver state, no
    per-key calls. New keys insert, existing keys update, absent keys
    pass through. Returns a Dataset with the winning rows (input
    columns, tag dropped)."""
    import pyarrow.compute as pc

    from .events import bucketed_by_key

    def tag(src: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("__src", pa.array(
                np.full(t.num_rows, src, np.int8), pa.int8()))
        return fn

    both = base.map_batches(tag(0), batch_format="pyarrow",
                            batch_size=None)         .union(updates.map_batches(tag(1), batch_format="pyarrow",
                                   batch_size=None))
    kc = list(key_cols)

    def add_ukey(t: pa.Table) -> pa.Table:
        k = pc.fill_null(pc.cast(t.column(kc[0]), pa.string()), "\0null")
        for c in kc[1:]:
            k = pc.binary_join_element_wise(
                k, pc.fill_null(pc.cast(t.column(c), pa.string()),
                                "\0null"), "\x1f")
        return t.append_column("__ukey", k)

    def per_bucket(df):
        df = df.sort_values("__src", kind="mergesort")             .sort_values(version_col, kind="mergesort")
        win = df.drop_duplicates("__ukey", keep="last")
        return win.drop(columns=["__src", "__ukey"])

    return bucketed_by_key(
        both.map_batches(add_ukey, batch_format="pyarrow",
                         batch_size=None), "__ukey", per_bucket)
