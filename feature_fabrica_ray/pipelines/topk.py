"""Top-k per group without a global sort.

Each block computes its own per-group top-k (vectorized lexsort slice);
the tiny partials merge on the driver. At 100 TB this is the standard
combiner shape: the exchange carries at most ``k x groups-per-block``
rows instead of the full table. Deterministic under ties via explicit
tie-break columns (ascending) — required for cross-engine comparison.
"""

from __future__ import annotations

import pandas as pd
import numpy as np
import pyarrow as pa

__all__ = ["topk_per_group", "topk_grouped_sum", "approx_heavy_hitters",
           "heavy_hitters_per_group", "skyline_2d"]


def topk_grouped_sum(ds, key_cols: list[str], value_col: str, k: int,
                     *, descending: bool = True,
                     num_partitions: int | None = None) -> pd.DataFrame:
    """Global top-``k`` groups by SUM(``value_col``) over a
    HIGH-CARDINALITY group key (top orders by revenue, top customers by
    spend) — the aggregate-then-rank report shape.

    Scale shape: (1) per-block vectorized group_by partials (each key
    appears once per block); (2) partials hash-bucket on the key —
    uniform buckets, so Zipf-skewed keys still spread — and each bucket
    finalizes its sums and local top-k with ONE vectorized map_groups
    call per BUCKET (never per key: a per-key map_groups is a Python
    call per group, ~100x slower at web-scale cardinality and the
    driver never holds more than k x n_buckets rows); (3) k-sized bucket
    partials merge on the driver. Deterministic under sum ties via the
    key columns ascending. Returns key_cols + ``sum_v``."""
    from ..state import combine_hashes, hash64
    from ..tuning import shuffle_partitions

    n_shuffle = num_partitions or shuffle_partitions()

    def _finalize(t: pa.Table, kk: int) -> pa.Table:
        g = t.group_by(key_cols).aggregate([("s", "sum")])
        g = g.rename_columns([*key_cols, "sum_v"])
        df = g.to_pandas().sort_values(
            ["sum_v", *key_cols],
            ascending=[not descending] + [True] * len(key_cols),
            kind="mergesort").head(kk)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({**{c: batch.column(c) for c in key_cols},
                      "s": batch.column(value_col)})
        g = t.group_by(key_cols).aggregate([("s", "sum")])
        g = g.rename_columns([*key_cols, "s"])
        h = combine_hashes(*[hash64(g.column(c)) for c in key_cols])
        return g.append_column("__bkt", pa.array(
            (h % np.uint64(n_shuffle)).astype(np.int32), pa.int32()))

    def bucket_topk(t: pa.Table) -> pa.Table:
        return _finalize(t.drop_columns(["__bkt"]), k)

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
             .groupby("__bkt", num_partitions=n_shuffle)
             .map_groups(bucket_topk, batch_format="pyarrow")
             .to_pandas())
    if parts.empty:
        return pd.DataFrame(columns=[*key_cols, "sum_v"])
    out = parts.sort_values(["sum_v", *key_cols],
                            ascending=[not descending]
                            + [True] * len(key_cols),
                            kind="mergesort").head(k)
    return out.reset_index(drop=True)


def topk_per_group(ds, group_cols: list[str], value_col: str, k: int,
                   tiebreak_cols: list[str] | None = None,
                   descending: bool = True) -> pd.DataFrame:
    """Global top-k rows per group by ``value_col``. Returns a pandas
    DataFrame with a ``rank`` column (1-based)."""
    tiebreak_cols = tiebreak_cols or []
    cols = list(dict.fromkeys([*group_cols, value_col, *tiebreak_cols]))

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([c for c in cols if c in batch.column_names]).to_pandas()
        df = df.sort_values([*group_cols, value_col, *tiebreak_cols],
                            ascending=[True] * len(group_cols)
                            + [not descending] + [True] * len(tiebreak_cols),
                            kind="mergesort")
        top = df.groupby(group_cols, as_index=False).head(k)
        return pa.Table.from_pandas(top, preserve_index=False) \
            .replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    merged = parts.sort_values([*group_cols, value_col, *tiebreak_cols],
                               ascending=[True] * len(group_cols)
                               + [not descending] + [True] * len(tiebreak_cols),
                               kind="mergesort")
    out = merged.groupby(group_cols, as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby(group_cols).cumcount() + 1
    return out


def approx_heavy_hitters(ds, col: str, k: int = 256,
                         top: int = 10) -> pd.DataFrame:
    """Approximate top-``top`` most frequent values of ``col`` via
    mergeable SpaceSaving sketches (``state/spacesaving.py``) — the
    UNBOUNDED-cardinality path for frequency ranking: each block folds
    its exact value counts into a k-counter sketch, only those k-sized
    sketches leave the block (one ~KB row each, like the Bloom/HLL
    partials), and the driver merges them. Exact when ``k`` exceeds the
    true distinct count; otherwise est overcounts by at most ``err``
    and any value with frequency > n/k is guaranteed present. Nulls are
    ignored. Returns (v, est, err) as a DataFrame, est-desc order with
    a deterministic string tiebreak."""
    from ..state import SpaceSaving

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([col]).filter(
            pa.compute.is_valid(batch.column(col)))
        g = t.group_by([col]).aggregate([([], "count_all")])
        sk = SpaceSaving(k).add_counts(g.column(col).to_pylist(),
                                       g.column("count_all").to_pylist())
        return pa.table({"sk": pa.array([sk.to_bytes()], pa.binary())})

    def merge_block(batch: pa.Table) -> pa.Table:
        sk = SpaceSaving(k)
        for b in batch.column("sk"):
            sk.merge(SpaceSaving.from_bytes(bytes(b.as_py())))
        return pa.table({"sk": pa.array([sk.to_bytes()], pa.binary())})

    parts_ds = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None).materialize()
    # pre-merge DISTRIBUTEDLY so the driver sees at most ~32 sketches,
    # not one per block (at web scale blocks x KB is still gigabytes)
    if parts_ds.num_blocks() > 32:
        parts_ds = parts_ds.repartition(32) \
            .map_batches(merge_block, batch_format="pyarrow",
                         batch_size=None)
    parts = parts_ds.take_all()
    merged = SpaceSaving(k)
    for r in parts:
        merged.merge(SpaceSaving.from_bytes(r["sk"]))
    rows = merged.top(top)
    return pd.DataFrame({
        "v": [r[0] for r in rows],
        "est": pd.array([r[1] for r in rows], dtype="int64"),
        "err": pd.array([r[2] for r in rows], dtype="int64")})


def skyline_2d(ds, id_col: str, min_col: str, max_col: str,
               max_skyline: int = 1_000_000) -> pd.DataFrame:
    """2-D Pareto frontier (skyline): the rows for which no other row
    is at least as good on BOTH objectives (``min_col`` lower-is-better,
    ``max_col`` higher-is-better) and strictly better on one — the
    multi-objective generalization of top-k ("cheapest-per-size parts",
    "best quality-per-token documents"). Exact ties on both columns all
    survive (neither dominates); rows with a NULL objective are
    excluded.

    Scale shape: dominance is union-stable — ``skyline(A ∪ B) ⊆
    skyline(A) ∪ skyline(B)`` — so each block reduces to its LOCAL
    skyline with one vectorized sweep (lexsort by (min asc, max desc),
    cummax dominance test; no pairwise compare), and the driver runs
    the same sweep once over the union of local skylines. For random
    data the skyline is tiny (O(log n) expected); ``max_skyline``
    fails loud on adversarial anti-correlated inputs instead of
    silently flooding the driver. Returns (id, min_col, max_col)
    sorted by id."""
    import numpy as np
    import pyarrow.compute as pc

    def _sweep(ids, p, s):
        order = np.lexsort((-s, p))
        ps, ss = p[order], s[order]
        new_grp = np.concatenate(([True], ps[1:] != ps[:-1]))
        grp_id = np.cumsum(new_grp) - 1
        grp_max = ss[np.flatnonzero(new_grp)]      # s desc within group
        run_best = np.maximum.accumulate(grp_max)
        best_before = np.concatenate(([-np.inf], run_best[:-1]))[grp_id]
        keep = (ss > best_before) & (ss >= grp_max[grp_id])
        sel = order[keep]
        return ids[sel], p[sel], s[sel]

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([id_col, min_col, max_col]).filter(
            pc.and_(pc.is_valid(batch.column(min_col)),
                    pc.is_valid(batch.column(max_col))))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        p = t.column(min_col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        s = t.column(max_col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        ids, p, s = _sweep(ids, p, s)
        return pa.table({id_col: pa.array(ids),
                         min_col: pa.array(p), max_col: pa.array(s)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             min_col: pd.Series([], dtype="float64"),
                             max_col: pd.Series([], dtype="float64")})
    if len(parts) > max_skyline:
        raise ValueError(
            f"skyline_2d: {len(parts)} local-skyline rows exceed "
            f"max_skyline={max_skyline} — anti-correlated objectives; "
            f"bucket one objective first")
    import numpy as _np
    ids, p, s = _sweep(parts[id_col].to_numpy(),
                       parts[min_col].to_numpy(_np.float64),
                       parts[max_col].to_numpy(_np.float64))
    out = pd.DataFrame({id_col: ids, min_col: p, max_col: s})
    return out.sort_values(id_col, kind="mergesort").reset_index(drop=True)


def hill_tail_index(ds, col: str, k: int = 100) -> "pd.DataFrame":
    """Hill estimator of the power-law tail index over the top-``k``
    order statistics:

        alpha = k / Σ_{i=1..k} ln(x_(i) / x_(k+1))

    — the standard heavy-tail diagnostic (alpha < 2: infinite
    variance — means/stddevs of this column are unstable and the
    pipeline should switch to medians/quantiles; Zipfian text/degree
    data typically sits near 1-2).

    Scale shape: per-block top-(k+1) partials (the bottomk/topk
    combiner — k+1 floats per block is the whole exchange), driver
    merge + closed form. Positive values only; NULL alpha when fewer
    than k+1 positive values exist. Returns one row
    (alpha, x_k, k, n_pos)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        x = x[np.isfinite(x) & (x > 0)]
        top = np.sort(x)[-(k + 1):] if x.size else x
        # the block's positive-count rides on the FIRST partial row
        # only, so the driver can sum counts without double counting
        n_col = np.zeros(max(top.size, 1), np.int64)
        n_col[0] = x.size
        v = top if top.size else np.array([-np.inf])
        return pa.table({"v": pa.array(v, pa.float64()),
                         "n": pa.array(n_col)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({"alpha": [np.nan], "x_k": [np.nan],
                             "k": np.array([k], np.int64),
                             "n_pos": np.array([0], np.int64)})
    n_pos = int(parts["n"].sum())
    vals = parts["v"].to_numpy()
    top = np.sort(vals[np.isfinite(vals)])[-(k + 1):]
    if top.size < k + 1:
        return pd.DataFrame({"alpha": [np.nan], "x_k": [np.nan],
                             "k": np.array([k], np.int64),
                             "n_pos": np.array([n_pos], np.int64)})
    xk = top[0]
    alpha = k / float(np.log(top[1:] / xk).sum())
    return pd.DataFrame({"alpha": [round(alpha, 6)],
                         "x_k": [xk],
                         "k": np.array([k], np.int64),
                         "n_pos": np.array([n_pos], np.int64)})


def heavy_hitters_per_group(ds, group_col: str, col: str, k: int = 256,
                            top: int = 5) -> pd.DataFrame:
    """Per-GROUP approximate top-``top`` most frequent values — the
    grouped form of ``approx_heavy_hitters``, merged on the bucketed
    engine: each block folds its exact per-(group, value) counts into
    one k-counter SpaceSaving sketch PER GROUP it contains, only those
    KB-sized sketch rows enter the ONE keyed shuffle
    (``grouped._bucketed_merge`` — hash(group) % B buckets, per-BUCKET
    Python, never a Ray call per group), and each bucket OR-merges its
    groups\' sketches and emits ranked rows. Exact (err = 0) whenever
    ``k`` exceeds a group\'s true distinct count; otherwise any value
    with in-group frequency > n_g/k is guaranteed present with
    overcount <= err. Null groups and null values are excluded.
    Returns (group, v, est, err, rank) sorted by (group, rank), ranks
    1..top by (est desc, str(v) asc)."""
    import pyarrow.compute as pc

    from ..state import SpaceSaving
    from .grouped import _bucketed_merge, _with_shuffle_key

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, col]).filter(
            pc.and_(pc.is_valid(batch.column(group_col)),
                    pc.is_valid(batch.column(col))))
        g = t.group_by([group_col, col]).aggregate([([], "count_all")])
        df = g.to_pandas()
        keys, sks = [], []
        for key, sub in df.groupby(group_col, sort=False):
            sk = SpaceSaving(k).add_counts(sub[col].tolist(),
                                           sub["count_all"].tolist())
            keys.append(key)
            sks.append(sk.to_bytes())
        out = pa.table({
            group_col: pa.array(keys, t.schema.field(group_col).type),
            "sk": pa.array(sks, pa.binary())})
        return _with_shuffle_key(out, group_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = {group_col: [], "v": [], "est": [], "err": [], "rank": []}
        # ONE Ray call per bucket; the inner fold is per GROUP on
        # KB-sized sketch state (the approx_group_quantiles shape)
        for key, sub in df.groupby(group_col, sort=False):
            sk = SpaceSaving(k)
            for b in sub["sk"]:
                sk.merge(SpaceSaving.from_bytes(bytes(b)))
            for r, (v, est, err) in enumerate(sk.top(top), 1):
                rows[group_col].append(key)
                rows["v"].append(v)
                rows["est"].append(est)
                rows["err"].append(err)
                rows["rank"].append(r)
        out = pd.DataFrame(rows)
        for c in ("est", "err", "rank"):
            out[c] = out[c].astype(np.int64)
        return out

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    return out.sort_values([group_col, "rank"], kind="mergesort") \
        .reset_index(drop=True)
