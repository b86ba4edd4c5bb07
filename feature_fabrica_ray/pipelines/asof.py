"""As-of join: match every left row to the nearest right row at-or-before
(backward) / at-or-after (forward) its timestamp, per key.

Two physical forms (the custom-operator playbook: composition of
map_batches + groupby().map_groups, with a broadcast map-side variant):

- ``asof_join``: CO-GROUP form for two large sides — both sides are
  hash-partitioned by key in ONE shuffle (tagged union), then each key
  group is resolved with a vectorized searchsorted. Partitioning
  assumption: a single key's rows fit in one task (same bound as any
  keyed map_groups; salt hot keys upstream if a key exceeds it).
- ``asof_join_broadcast``: map-side form when the right side is a
  dimension-sized table — right is collected once (guarded), sorted,
  ``ray.put`` once, and every left block resolves matches locally with
  zero shuffle.

Matched right columns are appended to the left row (left outer: no
match -> nulls), mirroring pandas ``merge_asof`` semantics with
``allow_exact_matches=True``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..tuning import shuffle_partitions

__all__ = ["asof_join", "asof_join_broadcast"]

_MAX_BROADCAST_ROWS = 5_000_000


def _ts_us(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.cast(pa.timestamp("us")).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)


def _match_segment(lts: np.ndarray, rts: np.ndarray, direction: str,
                   tolerance_us: int | None) -> np.ndarray:
    """Indices into rts for each left ts (-1 = no match). rts sorted asc."""
    if direction == "backward":
        idx = np.searchsorted(rts, lts, side="right") - 1
        ok = idx >= 0
        if tolerance_us is not None:
            ok &= (lts - rts[np.maximum(idx, 0)]) <= tolerance_us
    elif direction == "forward":
        idx = np.searchsorted(rts, lts, side="left")
        ok = idx < rts.size
        if tolerance_us is not None:
            ok &= (rts[np.minimum(idx, rts.size - 1)] - lts) <= tolerance_us
    elif direction == "nearest":
        # closest right row on EITHER side; equal distance -> the
        # earlier (backward) row, pandas merge_asof "nearest" parity
        bi = np.searchsorted(rts, lts, side="right") - 1
        fi = np.searchsorted(rts, lts, side="left")
        bok, fok = bi >= 0, fi < rts.size
        far = np.iinfo(np.int64).max
        bd = np.where(bok, lts - rts[np.maximum(bi, 0)], far)
        fd = np.where(fok, rts[np.minimum(fi, rts.size - 1)] - lts, far)
        use_b = bd <= fd
        idx = np.where(use_b, bi, fi)
        ok = bok | fok
        if tolerance_us is not None:
            ok &= np.where(use_b, bd, fd) <= tolerance_us
    else:
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}")
    return np.where(ok, idx, -1)


def _append_matched(batch: pa.Table, rt: pa.Table, match: np.ndarray,
                    right_cols: list[str]) -> pa.Table:
    take = pa.array(np.where(match >= 0, match, 0), pa.int64())
    null_mask = pa.array(match < 0)
    for c in right_cols:
        vals = rt.column(c).take(take)
        vals = pc.if_else(null_mask, pa.nulls(len(batch), vals.type), vals)
        batch = batch.append_column(c, vals)
    return batch


def asof_join_broadcast(left, right, *, on: str, by: str,
                        right_cols: list[str], direction: str = "backward",
                        tolerance_us: int | None = None):
    """Map-side as-of join against a broadcast right side (zero shuffle).

    ``right`` may be a Ray Dataset, Arrow table, or pandas DataFrame; it
    is pruned to ``[by, on] + right_cols``, guarded small, sorted once,
    and shipped via ``ray.put``."""
    import ray

    cols = [by, on] + [c for c in right_cols if c not in (by, on)]
    if hasattr(right, "select_columns"):     # ray Dataset
        sel = right.select_columns(cols)
        blocks = [t for t in ray.get(sel.to_arrow_refs()) if t.num_rows]
        sch = sel.schema()
        rt = pa.concat_tables(blocks) if blocks else pa.table(
            {n: pa.array([], t) for n, t in zip(sch.names, sch.types)})
    elif isinstance(right, pa.Table):
        rt = right.select(cols)
    else:
        rt = pa.Table.from_pandas(right[cols], preserve_index=False)
    if rt.num_rows > _MAX_BROADCAST_ROWS:
        raise ValueError(
            f"asof_join_broadcast right side has {rt.num_rows} rows — use "
            f"the co-group asof_join instead")
    rt = rt.replace_schema_metadata(None)
    order = pc.sort_indices(rt, sort_keys=[(by, "ascending"), (on, "ascending")])
    rt = rt.take(order).combine_chunks()
    # per-key segment bounds over the sorted right side
    rkeys = rt.column(by).to_numpy(zero_copy_only=False)
    seg_starts = np.flatnonzero(
        np.concatenate([[True], rkeys[1:] != rkeys[:-1]]))
    seg_bounds = {rkeys[s]: (int(s), int(e)) for s, e in
                  zip(seg_starts, np.concatenate([seg_starts[1:], [rkeys.size]]))}
    rts_all = _ts_us(rt.column(on))
    ref = ray.put((rt, seg_bounds, rts_all))

    def fn(batch: pa.Table) -> pa.Table:
        rt, seg_bounds, rts_all = ray.get(ref)
        lkeys = batch.column(by).to_numpy(zero_copy_only=False)
        lts = _ts_us(batch.column(on))
        match = np.full(len(batch), -1, np.int64)
        order = np.argsort(lkeys, kind="stable")
        ks = lkeys[order]
        starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
        ends = np.concatenate([starts[1:], [ks.size]])
        for s, e in zip(starts, ends):      # one searchsorted per distinct key
            seg = seg_bounds.get(ks[s])
            if seg is None:
                continue
            rs, re = seg
            rows = order[s:e]
            m = _match_segment(lts[rows], rts_all[rs:re], direction, tolerance_us)
            match[rows] = np.where(m >= 0, m + rs, -1)
        return _append_matched(batch, rt, match,
                               [c for c in rt.column_names if c not in (by, on)])

    return left.map_batches(fn, batch_format="pyarrow", batch_size=None)


def asof_join(left, right, *, on: str, by: str, right_cols: list[str],
              direction: str = "backward", tolerance_us: int | None = None,
              num_partitions: int | None = None):
    """Co-group as-of join for two large sides: ONE hash shuffle of the
    tagged union of both sides on ``by``, then a vectorized per-key
    searchsorted. Returns a Dataset of left columns + matched right
    columns (left outer: unmatched -> null).

    Matched right columns travel the exchange as float64 (ints stay
    exact to 2^53) — the nullable union carrier; cast back downstream
    if an exact integer dtype is required."""
    lsch = left.schema()
    lcols = list(lsch.names)
    ltypes = dict(zip(lsch.names, lsch.types))
    rcols = [by, on] + [c for c in right_cols if c not in (by, on)]
    out_rcols = [c for c in rcols if c not in (by, on)]

    # tagged union: both sides mapped onto one common schema
    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {c: (batch.column(c).cast(pa.timestamp("us")) if c == on
                    else batch.column(c)) for c in lcols}
        for c in out_rcols:
            cols[f"__r_{c}"] = pa.nulls(len(batch), pa.float64())
        cols["__rts"] = pa.nulls(len(batch), pa.int64())
        cols["__side"] = pa.array(np.zeros(len(batch), np.int8))
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {}
        for c in lcols:
            if c == by:
                cols[c] = batch.column(by)
            elif c == on:
                cols[c] = batch.column(on).cast(pa.timestamp("us"))
            else:
                cols[c] = pa.nulls(n, ltypes[c])
        for c in out_rcols:
            cols[f"__r_{c}"] = batch.column(c).cast(pa.float64())
        cols["__rts"] = pa.array(_ts_us(batch.column(on)), pa.int64())
        cols["__side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(
        lambda b: tag_right(b.select(rcols)), batch_format="pyarrow",
        batch_size=None)
    both = lt.union(rt)

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        is_r = df["__side"].to_numpy() == 1
        ldf = df[~is_r]
        if not len(ldf):
            # right-only key: emit zero rows with the SAME schema as
            # matched groups (left cols + matched right cols)
            out = ldf.drop(columns=["__side", "__rts"]
                           + [f"__r_{c}" for c in out_rcols]).iloc[:0]
            for c in out_rcols:
                out[c] = np.empty(0, np.float64)
            return out
        rdf = df[is_r]
        rts = np.sort(rdf["__rts"].to_numpy(dtype=np.int64)) if len(rdf) \
            else np.empty(0, np.int64)
        rorder = np.argsort(rdf["__rts"].to_numpy(dtype=np.int64),
                            kind="stable") if len(rdf) else np.empty(0, np.int64)
        lts = ldf[on].to_numpy(dtype="datetime64[us]").astype(np.int64)
        m = _match_segment(lts, rts, direction, tolerance_us)
        out = ldf.drop(columns=["__side", "__rts"]).copy()
        for c in out_rcols:
            rv = rdf[f"__r_{c}"].to_numpy()[rorder] if len(rdf) else \
                np.empty(0, np.float64)
            vals = np.where(m >= 0, rv[np.maximum(m, 0)], np.nan) if rv.size \
                else np.full(len(ldf), np.nan)
            out[c] = vals
        return out.drop(columns=[f"__r_{c}" for c in out_rcols])

    return (both.groupby(by, num_partitions=num_partitions or shuffle_partitions())
            .map_groups(per_key, batch_format="pandas"))
