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

__all__ = ["asof_join", "asof_join_broadcast", "pit_window_join"]

_MAX_BROADCAST_ROWS = 5_000_000


def _pa_type(t) -> pa.DataType:
    """Ray ``Schema.types`` holds pyarrow types for arrow blocks but
    numpy dtypes / python classes for pandas blocks; normalize to a
    pyarrow type. Unmappable dtypes raise instead of silently assuming
    string, so a schema mismatch surfaces at the call site."""
    if isinstance(t, pa.DataType):
        return t
    return pa.from_numpy_dtype(np.dtype(t))


def _schema_types(ds_or_schema) -> dict[str, pa.DataType]:
    """Best-effort name->pyarrow-type map for the cast-back stage; a
    dtype with no pyarrow mapping (pandas ``object``) is simply left
    out, meaning that column passes through uncast."""
    sch = ds_or_schema.schema() if hasattr(ds_or_schema, "schema") \
        else ds_or_schema
    out = {}
    for n, t in zip(sch.names, sch.types):
        try:
            out[n] = _pa_type(t)
        except (pa.ArrowNotImplementedError, TypeError, ValueError):
            pass
    return out


def _cast_back(types: dict[str, pa.DataType]):
    """Stateless map_batches fn restoring recorded column dtypes after a
    pandas bucket stage. pandas upcasts int64-with-null to float64 (the
    tagged union puts nulls in every left column of a right row), so
    without this the OUTPUT schema drifts from the input schema. NaN is
    pandas' null carrier — converted to a real null before any
    integer/bool cast (which would otherwise raise on NaN)."""
    def fn(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in batch.column_names:
            col = batch.column(name)
            tgt = types.get(name)
            if tgt is not None and col.type != tgt:
                if pa.types.is_floating(col.type) and \
                        not pa.types.is_floating(tgt):
                    col = pc.if_else(
                        pc.fill_null(pc.is_nan(col), False),
                        pa.nulls(len(batch), col.type), col)
                col = col.cast(tgt)
            cols[name] = col
        return pa.table(cols)
    return fn


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
    if rt.num_rows == 0:        # no matchable right rows at all
        for c in right_cols:
            batch = batch.append_column(
                c, pa.nulls(len(batch), rt.schema.field(c).type))
        return batch
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
        # empty right side: build a typed empty table; a dtype with no
        # pyarrow mapping (pandas object blocks) becomes pa.null() so a
        # schema mismatch surfaces at the append_column site instead of
        # being silently assumed string
        types = _schema_types(sch)
        rt = pa.concat_tables(blocks) if blocks else pa.table(
            {n: pa.array([], types.get(n, pa.null()))
             for n in sch.names})
    elif isinstance(right, pa.Table):
        rt = right.select(cols)
    else:
        rt = pa.Table.from_pandas(right[cols], preserve_index=False)
    if rt.num_rows > _MAX_BROADCAST_ROWS:
        raise ValueError(
            f"asof_join_broadcast right side has {rt.num_rows} rows — use "
            f"the co-group asof_join instead")
    rt = rt.replace_schema_metadata(None)
    # a right row with a null key or null ts can never be an as-of
    # match (SQL ASOF/merge_asof semantics) and would corrupt the
    # sorted segments
    rt = rt.filter(pc.and_(pc.is_valid(rt.column(by)),
                           pc.is_valid(rt.column(on))))
    order = pc.sort_indices(rt, sort_keys=[(by, "ascending"), (on, "ascending")])
    rt = rt.take(order).combine_chunks()
    # per-key segment bounds over the sorted right side
    rkeys = rt.column(by).to_numpy(zero_copy_only=False)
    if rkeys.size:
        seg_starts = np.flatnonzero(
            np.concatenate([[True], rkeys[1:] != rkeys[:-1]]))
        seg_bounds = {rkeys[s]: (int(s), int(e)) for s, e in
                      zip(seg_starts,
                          np.concatenate([seg_starts[1:], [rkeys.size]]))}
    else:
        seg_bounds = {}
    rts_all = _ts_us(rt.column(on))
    ref = ray.put((rt, seg_bounds, rts_all))

    def fn(batch: pa.Table) -> pa.Table:
        rt, seg_bounds, rts_all = ray.get(ref)
        lkeys = batch.column(by).to_numpy(zero_copy_only=False)
        lts = _ts_us(batch.column(on))
        # a null left ts matches nothing (its int64 cast is garbage)
        lvalid = pc.is_valid(batch.column(on)) \
            .to_numpy(zero_copy_only=False)
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
        match[~lvalid] = -1
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
    exact to 2^53) — the nullable union carrier — and are cast back to
    their source dtypes in a final stateless stage, as are the left
    columns pandas upcast through the bucket stage."""
    lsch = left.schema()
    lcols = list(lsch.names)
    ltypes = dict(zip(lsch.names, lsch.types))
    rcols = [by, on] + [c for c in right_cols if c not in (by, on)]
    out_rcols = [c for c in rcols if c not in (by, on)]
    # recorded output dtypes: every left column keeps its source type
    # (on is normalized to timestamp[us] by the tagged union), matched
    # right columns return to THEIR source types off the float64 carrier
    out_types = _schema_types(lsch)
    out_types[on] = pa.timestamp("us")
    out_types.update({c: t for c, t in _schema_types(right).items()
                      if c in out_rcols})

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
        # null-key / null-ts right rows can never be an as-of match and
        # the null ts would poison the int64 __rts carrier
        batch = batch.filter(pc.and_(pc.is_valid(batch.column(by)),
                                     pc.is_valid(batch.column(on))))
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

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # one bucket holds MANY keys (bucketed_by_key): split the tagged
        # union once, then a light per-key-SEGMENT loop — numpy slices +
        # one _match_segment call per distinct key, thousands of times
        # cheaper than one map_groups invocation per key
        is_r = df["__side"].to_numpy() == 1
        ldf = df[~is_r]
        out = ldf.drop(columns=["__side", "__rts"]
                       + [f"__r_{c}" for c in out_rcols]).copy()
        if not len(ldf):
            for c in out_rcols:
                out[c] = np.empty(0, np.float64)
            return out
        rdf = df[is_r]
        lkeys = ldf[by].to_numpy()
        lts = ldf[on].to_numpy(dtype="datetime64[us]").astype(np.int64)
        match = np.full(len(ldf), -1, np.int64)
        # null key or null ts on the left matches nothing (NaT casts to
        # INT64_MIN, which forward/nearest would otherwise "match")
        key_ok = ~pd.isna(lkeys) & ~pd.isna(ldf[on]).to_numpy()
        rdf = rdf[~pd.isna(rdf[by]).to_numpy()]  # null keys match nothing
        if len(rdf) and key_ok.any():
            rkeys = rdf[by].to_numpy()
            rts = rdf["__rts"].to_numpy(dtype=np.int64)
            rorder = np.lexsort((rts, rkeys))
            rkeys_s, rts_s = rkeys[rorder], rts[rorder]
            rstarts = np.flatnonzero(np.concatenate(
                [[True], rkeys_s[1:] != rkeys_s[:-1]]))
            rends = np.append(rstarts[1:], rkeys_s.size)
            runiq = rkeys_s[rstarts]
            lidx = np.flatnonzero(key_ok)
            lorder = lidx[np.argsort(lkeys[lidx], kind="stable")]
            ks = lkeys[lorder]
            starts = np.flatnonzero(np.concatenate(
                [[True], ks[1:] != ks[:-1]])) if ks.size else \
                np.empty(0, np.int64)
            ends = np.append(starts[1:], ks.size)
            for s, e in zip(starts, ends):
                i = int(np.searchsorted(runiq, ks[s]))
                if i >= runiq.size or runiq[i] != ks[s]:
                    continue
                rows = lorder[s:e]
                m = _match_segment(lts[rows], rts_s[rstarts[i]:rends[i]],
                                   direction, tolerance_us)
                match[rows] = np.where(m >= 0, m + rstarts[i], -1)
        for c in out_rcols:
            if len(rdf):
                rv = rdf[f"__r_{c}"].to_numpy()[rorder]
                out[c] = np.where(match >= 0,
                                  rv[np.maximum(match, 0)], np.nan)
            else:
                out[c] = np.full(len(ldf), np.nan)
        return out

    from .events import bucketed_by_key
    joined = bucketed_by_key(both, by, per_bucket,
                             n_buckets=num_partitions)
    return joined.map_batches(_cast_back(out_types),
                              batch_format="pyarrow", batch_size=None)


def pit_window_join(left, right, *, on: str, by: str, value_col: str,
                    window_us: int, out_prefix: str = "pit_",
                    num_partitions: int | None = None):
    """Point-in-time windowed-aggregate join — the leakage-free
    feature-backfill primitive behind every feature store: for each
    left row, the COUNT and SUM of right rows of the SAME key whose
    timestamp falls in ``[left.on - window_us, left.on]`` (inclusive
    both ends, so information available *at* prediction time and
    nothing later). SQL parity: LEFT JOIN on key + interval range,
    GROUP BY left row — count(matched) / sum(value), sum NULL when no
    non-null value matched.

    Scale shape: same tagged-union co-group as ``asof_join`` — ONE
    hash shuffle of both sides on ``by``; each key group sorts the
    right timestamps once and answers every left row with two
    searchsorteds over cumulative sums (no per-left-row scan, no
    row-pair blowup: the window aggregate is computed from prefix
    sums). Left rows with a NULL key or NULL timestamp match nothing
    (SQL join semantics). Returns left columns +
    ``{out_prefix}n`` (int64) and ``{out_prefix}sum`` (float64).
    """
    lsch = left.schema()
    lcols = list(lsch.names)
    ltypes = dict(zip(lsch.names, lsch.types))
    n_col, s_col = f"{out_prefix}n", f"{out_prefix}sum"
    out_types = _schema_types(lsch)
    out_types[n_col] = pa.int64()
    out_types[s_col] = pa.float64()

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c) for c in lcols}
        n = len(batch)
        cols["__v"] = pa.nulls(n, pa.float64())
        cols["__rts"] = pa.nulls(n, pa.int64())
        cols["__side"] = pa.array(np.zeros(n, np.int8))
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        ts = batch.column(on).cast(pa.timestamp("us"))
        keep = pc.and_kleene(pc.is_valid(ts), pc.is_valid(batch.column(by)))
        t = pa.table({by: batch.column(by), "__ts": ts,
                      "__v0": batch.column(value_col).cast(pa.float64())}) \
            .filter(pc.fill_null(keep, False))
        n = t.num_rows
        cols = {}
        for c in lcols:
            cols[c] = t.column(by) if c == by else pa.nulls(n, ltypes[c])
        cols["__v"] = t.column("__v0")
        cols["__rts"] = t.column("__ts").cast(pa.int64())
        cols["__side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(tag_right, batch_format="pyarrow", batch_size=None)
    both = lt.union(rt)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # many keys per bucket (bucketed_by_key): per-key-SEGMENT loop,
        # prefix sums + two searchsorteds per key — no per-key map_groups
        is_r = df["__side"].to_numpy() == 1
        ldf = df[~is_r]
        out = ldf.drop(columns=["__side", "__rts", "__v"]).copy()
        nl = len(ldf)
        cnt = np.zeros(nl, np.int64)
        ssum = np.full(nl, np.nan)
        if nl:
            rdf = df[is_r]
            lkeys = ldf[by].to_numpy()
            lts64 = ldf[on].to_numpy(dtype="datetime64[us]")
            valid = ~np.isnat(lts64)
            lts = lts64.astype(np.int64)
            key_ok = ~pd.isna(lkeys)
            if len(rdf) and key_ok.any():
                rkeys = rdf[by].to_numpy()
                rts_raw = rdf["__rts"].to_numpy(dtype=np.int64)
                rv_raw = rdf["__v"].to_numpy(dtype=np.float64)
                rorder = np.lexsort((rts_raw, rkeys))
                rkeys_s = rkeys[rorder]
                rts = rts_raw[rorder]
                rv = rv_raw[rorder]
                nn = ~np.isnan(rv)
                csum = np.concatenate(
                    [[0.0], np.cumsum(np.where(nn, rv, 0.0))])
                cnn = np.concatenate([[0], np.cumsum(nn.astype(np.int64))])
                rstarts = np.flatnonzero(np.concatenate(
                    [[True], rkeys_s[1:] != rkeys_s[:-1]]))
                rends = np.append(rstarts[1:], rkeys_s.size)
                runiq = rkeys_s[rstarts]
                lidx = np.flatnonzero(key_ok & valid)
                lorder = lidx[np.argsort(lkeys[lidx], kind="stable")]
                ks = lkeys[lorder]
                starts = np.flatnonzero(np.concatenate(
                    [[True], ks[1:] != ks[:-1]])) if ks.size else \
                    np.empty(0, np.int64)
                ends = np.append(starts[1:], ks.size)
                for s, e in zip(starts, ends):
                    i = int(np.searchsorted(runiq, ks[s]))
                    if i >= runiq.size or runiq[i] != ks[s]:
                        continue
                    rs, re = int(rstarts[i]), int(rends[i])
                    rows = lorder[s:e]
                    lo = rs + np.searchsorted(rts[rs:re],
                                              lts[rows] - window_us,
                                              side="left")
                    hi = rs + np.searchsorted(rts[rs:re], lts[rows],
                                              side="right")
                    cnt[rows] = hi - lo
                    nnw = cnn[hi] - cnn[lo]
                    ssum[rows] = np.where(nnw > 0, csum[hi] - csum[lo],
                                          np.nan)
        out[n_col] = cnt
        out[s_col] = ssum
        return out

    from .events import bucketed_by_key
    joined = bucketed_by_key(both, by, per_bucket,
                             n_buckets=num_partitions)
    return joined.map_batches(_cast_back(out_types),
                              batch_format="pyarrow", batch_size=None)
