"""Exact per-group quantiles via value-histogram combiners.

For a metric whose VALUE DOMAIN is bounded (lengths, counts, scores —
the usual per-column validation metrics), exact quantiles need no sort
and no raw-row shuffle: each block counts (group, value) pairs, one
keyed groupby sums the partials, and the final (group, value, count)
histogram — rows = distinct pairs, independent of table size — yields
the exact interpolated quantile. This complements the t-digest sketch
(``state/tdigest.py``), which is the path for unbounded/continuous
domains where the histogram itself would blow up; here the result is
EXACT, so it can be oracle-checked against ``quantile_cont``.

Interpolation matches SQL ``quantile_cont`` / numpy ``linear``:
position ``q * (N - 1)`` over the expanded sorted multiset, linear
between the two bracketing order statistics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["group_quantiles", "rank_normalize", "equidepth_buckets",
           "group_mad", "group_trimmed_mean", "lorenz_deciles",
           "spearman_corr", "spearman_corr_approx", "kendall_tau",
           "kendall_tau_approx", "mann_kendall", "mad_outliers",
           "cusum_changepoint", "volume_peaks", "theil_sen_slope",
           "robust_scale", "winsorize"]


def _weighted_quantile(values: np.ndarray, counts: np.ndarray,
                       qs: tuple[float, ...],
                       disc: bool = False) -> list[float]:
    """quantile_cont (or, with ``disc``, quantile_disc) over the
    multiset {values[i] x counts[i]} without expansion: order statistic
    k = first v whose cumulative count > k. disc = SQL percentile_disc:
    the smallest ELEMENT whose cumulative fraction >= q (no
    interpolation, always a value that occurs)."""
    order = np.argsort(values, kind="mergesort")
    v, c = values[order].astype(np.float64), counts[order]
    cum = np.cumsum(c)                       # cum[j] = # elements <= v[j]
    n = int(cum[-1])
    out = []
    for q in qs:
        if disc:
            k = max(int(np.ceil(q * n)) - 1, 0)
            out.append(float(v[np.searchsorted(cum, k + 1)]))
            continue
        pos = q * (n - 1)
        i0, i1 = int(np.floor(pos)), int(np.ceil(pos))
        frac = pos - i0
        lo = v[np.searchsorted(cum, i0 + 1)]  # 0-based order stat i0
        hi = v[np.searchsorted(cum, i1 + 1)]
        out.append(lo * (1.0 - frac) + hi * frac)
    return out


def group_quantiles(ds, group_col: str, value_col: str,
                    qs: tuple[float, ...] = (0.5, 0.9),
                    disc: bool = False) -> pd.DataFrame:
    """Exact interpolated quantiles of ``value_col`` per ``group_col``
    (``disc=True`` switches to SQL percentile_disc semantics — the
    smallest occurring element at or above the quantile position).

    Returns a pandas DataFrame (group, q_<pct>..., n) with quantiles
    rounded to 6 dp (half-away, matching SQL ROUND). The exchange
    carries only distinct (group, value) rows per block; the collected
    final histogram is bounded by the value domain, not the row count.
    """
    from ray.data.aggregate import Sum

    from ..tuning import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = batch.select([group_col, value_col]) \
            .filter(pc.is_valid(batch.column(value_col)))  # nulls excluded,
        g = t.group_by([group_col, value_col]) \
            .aggregate([(value_col, "count",
                         pc.CountOptions(mode="all"))])    # like quantile_cont
        cnt = g.column(f"{value_col}_count").cast(pa.int64())
        return pa.table({group_col: g.column(group_col),
                         value_col: g.column(value_col),
                         "c": cnt})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    hist = parts.groupby([group_col, value_col],
                         num_partitions=shuffle_partitions()) \
        .aggregate(Sum("c")).to_pandas()
    hist = hist.rename(columns={"sum(c)": "c"})

    rows = []
    for key, sub in hist.groupby(group_col, dropna=False, sort=True):
        vals = sub[value_col].to_numpy()
        cnts = sub["c"].to_numpy(dtype=np.int64)
        quants = _weighted_quantile(vals, cnts, qs, disc=disc)
        rec = {group_col: key, "n": int(cnts.sum())}
        for q, x in zip(qs, quants):
            rec[f"q_{int(round(q * 100))}"] = np.floor(x * 1e6 + 0.5) / 1e6
        rows.append(rec)
    cols = [group_col, *(f"q_{int(round(q * 100))}" for q in qs), "n"]
    return pd.DataFrame(rows)[cols]


def rank_normalize(ds, col: str, out_col: str = "rank_norm",
                   max_distinct_broadcast: int = 5_000_000):
    """Global rank (quantile) normalization: each value maps to its
    empirical CDF position ``cume_dist() = (# values <= x) / N`` over
    the whole table — the standard rank-gauss/uniformization front end
    for tree-free models, and a monotone transform that kills outliers
    without clipping. Nulls pass through as null; N counts non-nulls.

    Scale shape: the value-histogram combiner again — the fit pass
    reduces to (value, count) rows (distinct values, not row count),
    one keyed merge, and the sorted value -> cume table broadcasts once
    via ``ray.put``; the transform is a stateless vectorized
    ``searchsorted`` per batch. Distinct counts beyond
    ``max_distinct_broadcast`` raise — use the t-digest sketch path for
    genuinely continuous domains. Appends ``out_col`` rounded to 6
    (SQL ROUND semantics, oracle-comparable to cume_dist())."""
    import ray
    import pyarrow.compute as pc

    vals, cume = _fit_cume(ds, col, max_distinct_broadcast)
    ref = ray.put((vals, cume))

    def transform(batch: pa.Table) -> pa.Table:
        vals, cume = ray.get(ref)
        x = batch.column(col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(x)
        r = np.full(x.size, np.nan)
        if vals.size:
            idx = np.searchsorted(vals, x[ok], side="right") - 1
            r[ok] = cume[np.maximum(idx, 0)]
        r = np.floor(r * 1e6 + 0.5) / 1e6
        return batch.append_column(out_col, pa.array(r, pa.float64()))

    return ds.map_batches(transform, batch_format="pyarrow",
                          batch_size=None)


def _fit_cume(ds, col: str, max_distinct: int):
    """Global (sorted distinct values, empirical CDF) of a column via
    the value-histogram combiner — the shared fit behind
    ``rank_normalize`` and ``equidepth_buckets``."""
    import pyarrow.compute as pc

    from ..tuning import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).cast(pa.float64())
        t = pa.table({"v": v}).filter(pc.is_valid(v))
        g = t.group_by(["v"]).aggregate([([], "count_all")])
        return pa.table({"v": g.column("v"),
                         "cnt": g.column("count_all").cast(pa.int64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
              .groupby("v", num_partitions=shuffle_partitions()).sum("cnt")
              .to_pandas())
    if len(merged) > max_distinct:
        raise ValueError(
            f"{len(merged)} distinct values — too many to broadcast; "
            f"use the t-digest sketch path for continuous domains")
    if merged.empty:   # all-null/empty input: Ray drops the columns
        return np.zeros(0, np.float64), np.zeros(0, np.float64)
    merged = merged.sort_values("v")
    vals = merged["v"].to_numpy(np.float64)
    cnts = merged["sum(cnt)"].to_numpy(np.float64)
    return vals, np.cumsum(cnts) / max(cnts.sum(), 1.0)


def equidepth_buckets(ds, col: str, k: int = 8,
                      out_col: str = "bucket_id",
                      max_distinct_broadcast: int = 5_000_000):
    """Equi-depth range bucketing: stamp each row with
    ``ceil(cume_dist * k)`` — k buckets of (near-)equal row count, ties
    always landing in one bucket. This is the split-point stamp behind
    balanced range-partitioned writes and skew-free range joins: fit
    once, then any number of datasets can be bucketed consistently.
    Nulls get bucket NULL.

    Scale shape: same (value, count) histogram combiner fit as
    ``rank_normalize`` (distinct-value-sized exchange), broadcast once,
    stateless searchsorted stamp — the full table is never sorted."""
    import ray
    import pyarrow.compute as pc  # noqa: F401 (parity with sibling)

    if k < 1:
        raise ValueError("k must be >= 1")
    vals, cume = _fit_cume(ds, col, max_distinct_broadcast)
    ref = ray.put((vals, cume))

    def stamp(batch: pa.Table) -> pa.Table:
        vals, cume = ray.get(ref)
        x = batch.column(col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(x)
        b = np.full(x.size, np.nan)
        if vals.size:
            idx = np.searchsorted(vals, x[ok], side="right") - 1
            b[ok] = np.minimum(np.ceil(cume[np.maximum(idx, 0)] * k),
                               float(k))
        arr = pa.array(np.where(ok, b, 0).astype(np.int64),
                       pa.int64(), mask=~ok)
        return batch.append_column(out_col, arr)

    return ds.map_batches(stamp, batch_format="pyarrow", batch_size=None)


class _DomainTooLarge(ValueError):
    """Value domain exceeds the broadcast guard (internal dispatch)."""


def spearman_corr(ds, x_col: str, y_col: str,
                  max_distinct_broadcast: int = 5_000_000,
                  exact: bool = False,
                  delta: float = 500.0) -> pd.DataFrame:
    """Exact Spearman rank correlation between two columns — Pearson
    over the AVERAGE ranks (standard tie handling), the monotone-
    association profiler that Pearson's linearity assumption breaks
    on. Rows where either side is null are excluded (pairwise-complete
    ranks, matching SQL rank windows over the filtered pairs).

    Scale shape: two value-histogram combiner fits over the null-free
    pair set (rows = DISTINCT values per column, independent of table
    size), average-rank tables broadcast once via ``ray.put``, then
    one streaming six-moment partial per block folds to the driver —
    no sort, no raw-row shuffle. The broadcast bound is the value
    domain: bounded-domain metrics (lengths, counts, scores, grades)
    fit by construction; genuinely continuous columns past
    ``max_distinct_broadcast`` DEGRADE to the t-digest sketch path
    (``spearman_corr_approx`` — approximate fractional ranks from a
    merged sketch of ~``delta`` centroids per column, loudly via
    ``warnings.warn`` so exactness loss is observable), or raise when
    ``exact=True``. The guard itself is decided from materialized
    block metadata — the distinct-value table is never collected past
    the bound. Returns one row (n, spearman_rho), rho unrounded."""
    import warnings

    import ray

    from ..tuning import shuffle_partitions

    # null/NaN-free pair set: Arrow treats float NaN as VALID, but NaN
    # keys need not merge across the rank-histogram shuffle (NaN !=
    # NaN) — _clean_pairs excludes them like nulls (pairwise-complete
    # semantics either way; the SAME filter feeds the approx path)
    pairs = _clean_pairs(ds, x_col, y_col).materialize()

    def avg_rank_fit(col: str):
        def partial(batch: pa.Table) -> pa.Table:
            g = batch.group_by([col]).aggregate([([], "count_all")])
            return pa.table({"v": g.column(col),
                             "cnt": g.column("count_all").cast(pa.int64())})

        merged_ds = (pairs.map_batches(partial, batch_format="pyarrow",
                                       batch_size=None)
                     .groupby("v", num_partitions=shuffle_partitions())
                     .sum("cnt").materialize())
        n_distinct = merged_ds.count()   # metadata — nothing collected
        if n_distinct > max_distinct_broadcast:
            raise _DomainTooLarge(
                f"{n_distinct} distinct {col} values — too many to "
                f"broadcast; rank continuous domains via the t-digest "
                f"sketch path")
        merged = merged_ds.to_pandas()
        if merged.empty:
            return np.zeros(0), np.zeros(0)
        merged = merged.sort_values("v")
        vals = merged["v"].to_numpy(np.float64)
        cnts = merged["sum(cnt)"].to_numpy(np.float64)
        below = np.concatenate([[0.0], np.cumsum(cnts)[:-1]])
        return vals, below + (cnts + 1.0) / 2.0

    try:
        xv, xr = avg_rank_fit("x")
        yv, yr = avg_rank_fit("y")
    except _DomainTooLarge as ex:
        if exact:
            raise        # _DomainTooLarge is-a ValueError; keep frames
        warnings.warn(
            f"spearman_corr: {ex}; degrading to the approximate "
            f"t-digest rank path (pass exact=True to forbid)",
            RuntimeWarning, stacklevel=2)
        return _spearman_tdigest(pairs, delta)
    if xv.size == 0 or yv.size == 0:
        return pd.DataFrame({"n": np.array([0], np.int64),
                             "spearman_rho": [np.nan]})
    ref = ray.put((xv, xr, yv, yr))

    def moments(batch: pa.Table) -> pa.Table:
        xv, xr, yv, yr = ray.get(ref)
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        rx = xr[np.searchsorted(xv, x)]
        ry = yr[np.searchsorted(yv, y)]
        return pa.table({
            "n": pa.array([len(rx)], pa.int64()),
            "sx": pa.array([float(rx.sum())]),
            "sy": pa.array([float(ry.sum())]),
            "sxx": pa.array([float((rx * rx).sum())]),
            "syy": pa.array([float((ry * ry).sum())]),
            "sxy": pa.array([float((rx * ry).sum())])})

    m = pairs.map_batches(moments, batch_format="pyarrow",
                          batch_size=None).to_pandas().sum()
    n = int(m["n"])
    cov = m["sxy"] - m["sx"] * m["sy"] / n
    vx = m["sxx"] - m["sx"] ** 2 / n
    vy = m["syy"] - m["sy"] ** 2 / n
    rho = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else np.nan
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "spearman_rho": [float(rho)]})


def _clean_pairs(ds, x_col: str, y_col: str):
    """Null/NaN-free (x, y) float64 pair Dataset (pairwise-complete)."""
    import pyarrow.compute as pc

    def pairs_only(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).cast(pa.float64())
        y = batch.column(y_col).cast(pa.float64())
        t = pa.table({"x": x, "y": y})
        ok = pc.and_(
            pc.and_(pc.is_valid(x), pc.is_valid(y)),
            pc.invert(pc.or_(pc.is_nan(pc.fill_null(x, 0.0)),
                             pc.is_nan(pc.fill_null(y, 0.0)))))
        return t.filter(ok)

    return ds.map_batches(pairs_only, batch_format="pyarrow",
                          batch_size=None)


def _fit_pair_digests(pairs, delta: float):
    """Merged per-column t-digests over a clean (x, y) pair Dataset:
    one per-block sketch partial (two ~delta-centroid blobs per block,
    KBs), driver merge of the blobs — raw values never leave the
    blocks."""
    from ..state import TDigest

    def digest_partial(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        return pa.table({
            "dx": pa.array([TDigest.from_array(x, delta).to_bytes()],
                           pa.binary()),
            "dy": pa.array([TDigest.from_array(y, delta).to_bytes()],
                           pa.binary())})

    sk = pairs.map_batches(digest_partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if sk.empty or "dx" not in sk.columns:   # zero input blocks
        return TDigest(delta), TDigest(delta)
    return (TDigest.merge_bytes(list(sk["dx"])),
            TDigest.merge_bytes(list(sk["dy"])))


def _spearman_tdigest(pairs, delta: float) -> pd.DataFrame:
    """Approximate Spearman over t-digest fractional ranks: rank(x) is
    replaced by the merged sketch's CDF estimate (monotone up to sketch
    resolution), then the same streaming six-moment Pearson fold as the
    exact path. Error is bounded by the digest's quantile resolution
    (~1/delta at the median, tighter at the tails) — the scale escape
    for continuous domains whose distinct-value table cannot broadcast.
    ``pairs`` must already be null/NaN-free float64 (x, y)."""
    import ray

    from ..state import TDigest

    dx, dy = _fit_pair_digests(pairs, delta)
    if dx.count == 0 or dy.count == 0:
        return pd.DataFrame({"n": np.array([0], np.int64),
                             "spearman_rho": [np.nan]})
    ref = ray.put((dx.to_bytes(), dy.to_bytes()))

    def moments(batch: pa.Table) -> pa.Table:
        bx, by = ray.get(ref)
        dgx, dgy = TDigest.from_bytes(bx), TDigest.from_bytes(by)
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        rx = dgx.cdf(x)
        ry = dgy.cdf(y)
        return pa.table({
            "n": pa.array([len(rx)], pa.int64()),
            "sx": pa.array([float(rx.sum())]),
            "sy": pa.array([float(ry.sum())]),
            "sxx": pa.array([float((rx * rx).sum())]),
            "syy": pa.array([float((ry * ry).sum())]),
            "sxy": pa.array([float((rx * ry).sum())])})

    m = pairs.map_batches(moments, batch_format="pyarrow",
                          batch_size=None).to_pandas().sum()
    n = int(m["n"])
    if n == 0:
        return pd.DataFrame({"n": np.array([0], np.int64),
                             "spearman_rho": [np.nan]})
    cov = m["sxy"] - m["sx"] * m["sy"] / n
    vx = m["sxx"] - m["sx"] ** 2 / n
    vy = m["syy"] - m["sy"] ** 2 / n
    rho = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else np.nan
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "spearman_rho": [float(rho)]})


def spearman_corr_approx(ds, x_col: str, y_col: str,
                         delta: float = 500.0) -> pd.DataFrame:
    """Approximate Spearman for CONTINUOUS high-cardinality domains —
    the documented t-digest scale path ``spearman_corr`` degrades to
    past its broadcast guard, callable directly when the domain is
    known to be continuous (skips the distinct-value fit entirely).

    Scale shape: one per-block sketch partial (two ~``delta``-centroid
    blobs per block), a KB-sized driver merge, the merged digests
    broadcast once, then the same streaming six-moment fold as the
    exact path — no sort, no shuffle, no distinct-value table at any
    cardinality. Returns one row (n, spearman_rho)."""
    return _spearman_tdigest(_clean_pairs(ds, x_col, y_col).materialize(),
                             delta)


def kendall_tau_approx(ds, x_col: str, y_col: str, bins: int = 512,
                       delta: float = 500.0) -> pd.DataFrame:
    """Approximate Kendall tau-b for CONTINUOUS domains: quantize each
    side to its t-digest quantile bin (an equidepth, monotone mapping —
    concordance is preserved except for pairs collapsed into the same
    bin, which the tau-b tie correction absorbs), then run the exact
    joint-histogram tau over the bounded ``bins`` x ``bins`` domain.
    The scale escape for domains past ``kendall_tau``'s joint-cell
    guard: the quantized joint histogram has at most ``bins``² cells
    regardless of input cardinality."""
    import ray

    from ..state import TDigest

    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    pairs = _clean_pairs(ds, x_col, y_col).materialize()
    dx, dy = _fit_pair_digests(pairs, delta)
    if dx.count == 0 or dy.count == 0:
        return pd.DataFrame({"n": np.array([0], np.int64),
                             "kendall_tau": [np.nan]})
    ref = ray.put((dx.to_bytes(), dy.to_bytes()))

    def quantize(batch: pa.Table) -> pa.Table:
        bx, by = ray.get(ref)
        dgx, dgy = TDigest.from_bytes(bx), TDigest.from_bytes(by)
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        qx = np.minimum((dgx.cdf(x) * bins).astype(np.int64), bins - 1)
        qy = np.minimum((dgy.cdf(y) * bins).astype(np.int64), bins - 1)
        return pa.table({"x": pa.array(qx.astype(np.float64)),
                         "y": pa.array(qy.astype(np.float64))})

    binned = pairs.map_batches(quantize, batch_format="pyarrow",
                               batch_size=None)
    return kendall_tau(binned, "x", "y")


def kendall_tau(ds, x_col: str, y_col: str,
                max_cells_broadcast: int = 5_000_000) -> pd.DataFrame:
    """Exact Kendall tau-b between two bounded-domain columns via the
    JOINT value histogram — the pair-counting rank statistic usually
    written off as O(n²): over a contingency table it is a closed
    form (concordant/discordant cell-pair products, tie-corrected),
    so a 10^12-row table with a (50 x 11) value domain needs ONE
    distinct-pair combiner shuffle and a driver-side suffix-cumsum on
    the tiny matrix. Null-bearing pairs are excluded. Domains whose
    joint histogram exceeds ``max_cells_broadcast`` raise (continuous
    columns: quantize or use Spearman's t-digest path). Returns one
    row (n, kendall_tau), tau unrounded."""
    import pyarrow.compute as pc

    from ..tuning import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).cast(pa.float64())
        y = batch.column(y_col).cast(pa.float64())
        # NaN is Arrow-valid but does not merge as a groupby key across
        # the shuffle (NaN != NaN) — exclude alongside nulls
        ok = pc.and_(
            pc.and_(pc.is_valid(x), pc.is_valid(y)),
            pc.invert(pc.or_(pc.is_nan(pc.fill_null(x, 0.0)),
                             pc.is_nan(pc.fill_null(y, 0.0)))))
        t = pa.table({"x": x, "y": y}).filter(ok)
        g = t.group_by(["x", "y"]).aggregate([([], "count_all")])
        return pa.table({"x": g.column("x"), "y": g.column("y"),
                         "cnt": g.column("count_all").cast(pa.int64())})

    cells_ds = (ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
                .groupby(["x", "y"], num_partitions=shuffle_partitions())
                .sum("cnt").materialize())
    n_cells = cells_ds.count()    # materialized metadata — the guard is
    if n_cells > max_cells_broadcast:   # decided before any collect
        raise ValueError(
            f"{n_cells} joint histogram cells — domain too large; "
            f"use kendall_tau_approx (t-digest quantile bins) or "
            f"spearman_corr's rank path")
    cells = cells_ds.to_pandas()
    if cells.empty:
        return pd.DataFrame({"n": np.array([0], np.int64),
                             "kendall_tau": [np.nan]})
    xs = np.sort(cells["x"].unique())
    ys = np.sort(cells["y"].unique())
    nx, ny = len(xs), len(ys)
    xi = np.searchsorted(xs, cells["x"].to_numpy(np.float64))
    yi = np.searchsorted(ys, cells["y"].to_numpy(np.float64))
    cnt = cells["sum(cnt)"].to_numpy(np.float64)
    if nx * ny <= max_cells_broadcast:
        # dense fast path — bound the GRID, not the occupancy: a sparse
        # but wide joint domain (200k x 200k with 200k occupied cells)
        # must not allocate an nx*ny matrix
        M = np.zeros((nx, ny))
        M[xi, yi] = cnt
        # suffix sums: S_se[i, j] = total count strictly south-east of
        # (i, j) — cells with larger x AND larger y; S_sw the south-west
        cum = np.cumsum(np.cumsum(M, axis=0), axis=1)
        pad = np.zeros((nx + 1, ny + 1))
        pad[1:, 1:] = cum

        def rect(i0, i1, j0, j1):
            """Sum of M over rows [i0, i1) x cols [j0, j1) via the
            padded 2D prefix table (inclusive-exclusive)."""
            return pad[i1, j1] - pad[i0, j1] - pad[i1, j0] + pad[i0, j0]

        conc = disc = 0.0
        for i in range(nx):        # domain-sized loop, not row-sized
            for j in range(ny):
                if M[i, j] == 0:
                    continue
                conc += M[i, j] * rect(i + 1, nx, j + 1, ny)
                disc += M[i, j] * rect(i + 1, nx, 0, j)
    else:
        # sparse path: sweep x-groups in DECREASING order keeping a
        # Fenwick tree over y-index of counts from strictly-larger x;
        # conc/disc read suffix/prefix sums per occupied cell —
        # O(C log C) memory-safe in occupancy C, never nx*ny
        order = np.lexsort((yi, -xi))
        sx, sy, sc = xi[order], yi[order], cnt[order]
        tree = np.zeros(ny + 1)

        def bit_add(pos: int, v: float) -> None:
            i = pos + 1
            while i <= ny:
                tree[i] += v
                i += i & (-i)

        def bit_prefix(pos: int) -> float:
            """Sum of counts at y-index <= pos."""
            s, i = 0.0, pos + 1
            while i > 0:
                s += tree[i]
                i -= i & (-i)
            return s

        conc = disc = 0.0
        acc = 0.0                   # total count inserted so far
        i0 = 0
        C = len(sx)
        while i0 < C:
            i1 = i0
            while i1 < C and sx[i1] == sx[i0]:
                i1 += 1
            for k in range(i0, i1):     # query this x-group first
                le = bit_prefix(int(sy[k]))
                lt = bit_prefix(int(sy[k]) - 1) if sy[k] > 0 else 0.0
                conc += sc[k] * (acc - le)     # larger x AND larger y
                disc += sc[k] * lt             # larger x AND smaller y
            for k in range(i0, i1):     # then insert it
                bit_add(int(sy[k]), sc[k])
                acc += sc[k]
            i0 = i1
    n = float(cnt.sum())
    n2 = n * (n - 1) / 2.0
    cx = pd.Series(cnt).groupby(xi).sum().to_numpy()
    cy = pd.Series(cnt).groupby(yi).sum().to_numpy()
    tx = float((cx * (cx - 1) / 2.0).sum())
    ty = float((cy * (cy - 1) / 2.0).sum())
    denom = np.sqrt((n2 - tx) * (n2 - ty))
    tau = (conc - disc) / denom if denom > 0 else np.nan
    return pd.DataFrame({"n": np.array([int(n)], np.int64),
                         "kendall_tau": [float(tau)]})


def _group_value_hist(ds, group_col: str, value_col: str) -> pd.DataFrame:
    """Distinct (group, value) -> count histogram: per-block combiner +
    one keyed shuffle — the shared exchange under every exact
    order-statistic aggregate here (bounded by the value domain, not
    the row count)."""
    from ray.data.aggregate import Sum

    from ..tuning import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = batch.select([group_col, value_col]) \
            .filter(pc.is_valid(batch.column(value_col)))
        g = t.group_by([group_col, value_col]) \
            .aggregate([(value_col, "count",
                         pc.CountOptions(mode="all"))])
        return pa.table({group_col: g.column(group_col),
                         value_col: g.column(value_col),
                         "c": g.column(f"{value_col}_count")
                              .cast(pa.int64())})

    hist = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None) \
        .groupby([group_col, value_col],
                 num_partitions=shuffle_partitions()) \
        .aggregate(Sum("c")).to_pandas()
    return hist.rename(columns={"sum(c)": "c"})


def group_mad(ds, group_col: str, value_col: str) -> pd.DataFrame:
    """Median absolute deviation per group —
    ``median(|x − median(x)|)`` with interpolated (quantile_cont)
    medians, SQL ``mad()`` parity — the robust dispersion measure that
    outliers cannot inflate (unlike stddev), the standard spread check
    for drift/outlier thresholds on heavy-tailed metrics.

    Scale shape: the SAME single distinct-(group, value) histogram
    exchange as ``group_quantiles`` — both medians evaluate on the
    collected per-group runs without expanding the multiset (the |d|
    quantile reuses the counts, no second pass over the data). Returns
    (group, med, mad, n) sorted by group."""
    hist = _group_value_hist(ds, group_col, value_col)
    rows = []
    for key, sub in hist.groupby(group_col, dropna=False, sort=True):
        vals = sub[value_col].to_numpy(dtype=np.float64)
        cnts = sub["c"].to_numpy(dtype=np.int64)
        med = _weighted_quantile(vals, cnts, (0.5,))[0]
        mad = _weighted_quantile(np.abs(vals - med), cnts, (0.5,))[0]
        rows.append({group_col: key,
                     "med": np.floor(med * 1e6 + 0.5) / 1e6,
                     "mad": np.floor(mad * 1e6 + 0.5) / 1e6,
                     "n": int(cnts.sum())})
    out = pd.DataFrame(rows, columns=[group_col, "med", "mad", "n"])
    out["n"] = out["n"].astype("int64") if len(out) else \
        pd.Series([], dtype="int64")
    return out


def group_trimmed_mean(ds, group_col: str, value_col: str,
                       trim: float = 0.1) -> pd.DataFrame:
    """Trimmed mean per group: drop the ``floor(n·trim)`` smallest and
    largest observations, average the interior — the robust center that
    keeps more efficiency than the median while shrugging off tail
    outliers (ranking-metric and latency-summary staple). Tie-safe:
    interior membership is by rank, and equal values contribute equal
    terms under any tie permutation.

    Scale shape: the shared distinct-(group, value) histogram exchange;
    the interior sum evaluates per group on runs in closed form
    (clipped cumulative-count overlap — no multiset expansion). Returns
    (group, tmean, n, n_used) sorted by group; tmean is NULL when the
    trim empties the interior."""
    if not 0.0 <= trim < 0.5:
        raise ValueError(f"trim must be in [0, 0.5), got {trim}")
    hist = _group_value_hist(ds, group_col, value_col)
    rows = []
    for key, sub in hist.groupby(group_col, dropna=False, sort=True):
        order = np.argsort(sub[value_col].to_numpy(), kind="mergesort")
        vals = sub[value_col].to_numpy(dtype=np.float64)[order]
        cnts = sub["c"].to_numpy(dtype=np.int64)[order]
        n = int(cnts.sum())
        k = int(np.floor(n * trim))
        cum_after = np.cumsum(cnts)
        cum_before = cum_after - cnts
        take = (np.clip(cum_after, k, n - k)
                - np.clip(cum_before, k, n - k))
        n_used = n - 2 * k
        tmean = (float((vals * take).sum()) / n_used if n_used > 0
                 else np.nan)
        rows.append({group_col: key,
                     "tmean": (np.sign(tmean)
                               * np.floor(abs(tmean) * 1e6 + 0.5) / 1e6
                               if not np.isnan(tmean) else np.nan),
                     "n": n, "n_used": n_used})
    out = pd.DataFrame(rows, columns=[group_col, "tmean", "n", "n_used"])
    for c in ("n", "n_used"):
        out[c] = out[c].astype("int64") if len(out) else \
            pd.Series([], dtype="int64")
    return out


def lorenz_deciles(ds, col: str) -> pd.DataFrame:
    """Lorenz curve at population deciles: for each d in 1..10, the
    share of the total carried by the bottom ``floor(n·d/10)``
    observations (values ascending) — the concentration PROFILE behind
    a Gini number ("the bottom half of documents carries 9% of the
    tokens"). Tie-safe: the bottom-k sum is permutation-invariant
    because equal values contribute equal terms whichever side of the
    boundary they land on. NULLs are excluded.

    Scale shape: the distinct-value histogram combiner (one keyed
    exchange bounded by the value domain); every decile evaluates on
    the collected runs with clipped cumulative-count arithmetic — no
    multiset expansion, no global sort. Returns
    (decile, k, cum_share) for d = 1..10."""
    from ray.data.aggregate import Sum

    from ..tuning import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = batch.select([col]).filter(pc.is_valid(batch.column(col)))
        g = t.group_by([col]).aggregate(
            [(col, "count", pc.CountOptions(mode="all"))])
        return pa.table({col: g.column(col),
                         "c": g.column(f"{col}_count").cast(pa.int64())})

    hist = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None) \
        .groupby(col, num_partitions=shuffle_partitions()) \
        .aggregate(Sum("c")).to_pandas().rename(columns={"sum(c)": "c"})
    deciles = np.arange(1, 11, dtype=np.int64)
    if hist.empty:
        return pd.DataFrame({"decile": deciles,
                             "k": np.zeros(10, np.int64),
                             "cum_share": np.full(10, np.nan)})
    order = np.argsort(hist[col].to_numpy(), kind="mergesort")
    vals = hist[col].to_numpy(dtype=np.float64)[order]
    cnts = hist["c"].to_numpy(dtype=np.int64)[order]
    n = int(cnts.sum())
    total = float((vals * cnts).sum())
    cum_after = np.cumsum(cnts)
    cum_before = cum_after - cnts
    ks, shares = [], []
    for d in deciles:
        k = int(np.floor(n * d / 10.0))
        take = (np.clip(cum_after, 0, k) - np.clip(cum_before, 0, k))
        ks.append(k)
        shares.append(float((vals * take).sum()) / total
                      if total != 0 else np.nan)
    return pd.DataFrame({"decile": deciles,
                         "k": np.array(ks, np.int64),
                         "cum_share": shares})


def boxcox_lambda_fit(ds, col: str, grid=None) -> dict:
    """Grid-search Box-Cox λ by maximum log-likelihood — the fitted
    variance-stabilizing power transform (sklearn PowerTransformer's
    method='box-cox'): for each candidate λ the profile log-likelihood
    is  -n/2 · ln(var(y_λ)) + (λ-1)·Σ ln x  with
    y_λ = (x^λ - 1)/λ (λ≠0) or ln x (λ=0); positive values only.

    ONE streaming pass computes, per block, (n, Σy, Σy²) for EVERY
    grid λ plus Σ ln x — a (|grid|+1)-row combiner per block, merged
    exactly on the driver (the z_score two-phase-fit shape, widened to
    a grid). Returns {"lam": float, "loglik": float, "n": int}."""
    import pandas as pd

    grid = [round(g, 2) for g in (grid if grid is not None
                                  else np.linspace(-2, 2, 21))]

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        x = x[np.isfinite(x) & (x > 0)]
        lams, s1, s2 = [], [], []
        lnx = float(np.log(x).sum()) if x.size else 0.0
        for lam in grid:
            y = np.log(x) if lam == 0 else (x ** lam - 1.0) / lam
            lams.append(lam)
            s1.append(float(y.sum()))
            s2.append(float((y * y).sum()))
        return pa.table({"lam": pa.array(lams, pa.float64()),
                         "n": pa.array([x.size] * len(grid), pa.int64()),
                         "s1": pa.array(s1), "s2": pa.array(s2),
                         "slnx": pa.array([lnx] * len(grid))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    g = parts.groupby("lam").sum()
    best_lam, best_ll, n_tot = None, -np.inf, 0
    for lam, row in g.iterrows():
        n = int(row["n"])
        if n < 2:
            continue
        mean = row["s1"] / n
        var = row["s2"] / n - mean * mean
        if var <= 0:
            continue
        ll = -0.5 * n * np.log(var) + (lam - 1.0) * row["slnx"]
        n_tot = n
        if ll > best_ll:
            best_lam, best_ll = float(lam), float(ll)
    return {"lam": best_lam, "loglik": best_ll, "n": n_tot}


def boxcox_transform(ds, col: str, lam: float | None = None,
                     out_col: str | None = None):
    """Apply Box-Cox with a given λ (or fit it first via
    ``boxcox_lambda_fit``) — stateless vectorized map; non-positive /
    null inputs yield NULL."""
    if lam is None:
        lam = boxcox_lambda_fit(ds, col)["lam"]
    out_col = out_col or f"{col}_bc"
    lam_f = float(lam)

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        x = batch.column(col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        ok = np.isfinite(x) & (x > 0)
        y = np.full(x.size, np.nan)
        if lam_f == 0.0:
            y[ok] = np.log(x[ok])
        else:
            y[ok] = (x[ok] ** lam_f - 1.0) / lam_f
        arr = pa.array(y, pa.float64())
        arr = pc.if_else(pa.array(ok), arr, pa.nulls(x.size, pa.float64()))
        return batch.append_column(out_col, arr)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def yeojohnson_lambda_fit(ds, col: str, grid=None) -> dict:
    """Grid-search Yeo-Johnson λ by maximum log-likelihood — Box-Cox's
    sibling that handles ZERO and NEGATIVE values (sklearn
    PowerTransformer's default):

        y = ((x+1)^λ - 1)/λ                  x >= 0, λ != 0
            ln(x+1)                           x >= 0, λ == 0
            -((1-x)^(2-λ) - 1)/(2-λ)          x < 0,  λ != 2
            -ln(1-x)                          x < 0,  λ == 2

    with profile log-likelihood -n/2·ln(var(y)) +
    (λ-1)·Σ sign(x)·ln(|x|+1). Same one-streaming-pass grid combiner
    as ``boxcox_lambda_fit``; all finite values participate. Returns
    {"lam", "loglik", "n"}."""
    import pandas as pd

    grid = [round(g, 2) for g in (grid if grid is not None
                                  else np.linspace(-2, 2, 21))]

    def _yj(x: np.ndarray, lam: float) -> np.ndarray:
        y = np.empty_like(x)
        pos = x >= 0
        if lam == 0:
            y[pos] = np.log1p(x[pos])
        else:
            y[pos] = ((x[pos] + 1.0) ** lam - 1.0) / lam
        if lam == 2:
            y[~pos] = -np.log1p(-x[~pos])
        else:
            y[~pos] = -(((1.0 - x[~pos]) ** (2.0 - lam)) - 1.0) / (2.0 - lam)
        return y

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        x = x[np.isfinite(x)]
        slx = float((np.sign(x) * np.log1p(np.abs(x))).sum()) if x.size \
            else 0.0
        lams, s1, s2 = [], [], []
        for lam in grid:
            y = _yj(x, lam)
            lams.append(lam)
            s1.append(float(y.sum()))
            s2.append(float((y * y).sum()))
        return pa.table({"lam": pa.array(lams, pa.float64()),
                         "n": pa.array([x.size] * len(grid), pa.int64()),
                         "s1": pa.array(s1), "s2": pa.array(s2),
                         "slnx": pa.array([slx] * len(grid))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    g = parts.groupby("lam").sum()
    best_lam, best_ll, n_tot = None, -np.inf, 0
    for lam, row in g.iterrows():
        n = int(row["n"])
        if n < 2:
            continue
        mean = row["s1"] / n
        var = row["s2"] / n - mean * mean
        if var <= 0:
            continue
        ll = -0.5 * n * np.log(var) + (lam - 1.0) * row["slnx"]
        n_tot = n
        if ll > best_ll:
            best_lam, best_ll = float(lam), float(ll)
    return {"lam": best_lam, "loglik": best_ll, "n": n_tot}


def yeojohnson_transform(ds, col: str, lam: float | None = None,
                         out_col: str | None = None):
    """Apply Yeo-Johnson with a given λ (or fit first) — stateless
    vectorized map; null/non-finite inputs yield NULL."""
    if lam is None:
        lam = yeojohnson_lambda_fit(ds, col)["lam"]
    out_col = out_col or f"{col}_yj"
    lam_f = float(lam)

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        x = batch.column(col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        ok = np.isfinite(x)
        y = np.full(x.size, np.nan)
        xs = x[ok]
        out = np.empty_like(xs)
        pos = xs >= 0
        if lam_f == 0.0:
            out[pos] = np.log1p(xs[pos])
        else:
            out[pos] = ((xs[pos] + 1.0) ** lam_f - 1.0) / lam_f
        if lam_f == 2.0:
            out[~pos] = -np.log1p(-xs[~pos])
        else:
            out[~pos] = -(((1.0 - xs[~pos]) ** (2.0 - lam_f)) - 1.0) \
                / (2.0 - lam_f)
        y[ok] = out
        arr = pc.if_else(pa.array(ok), pa.array(y, pa.float64()),
                         pa.nulls(x.size, pa.float64()))
        return batch.append_column(out_col, arr)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def mann_kendall(ds, ts_col: str, *, freq: str = "day",
                 max_points: int = 5_000) -> pd.DataFrame:
    """Mann-Kendall trend test on the event-VOLUME series: bucket
    timestamps to ``freq``, count rows per bucket (exact integer
    combiner — no float summation-order noise in the compared
    series), then the nonparametric monotone-trend statistic on the
    (time, count) sequence: S = Σ_{i<j} sign(x_j − x_i), the
    tie-corrected variance  var_S = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]
    / 18, and the continuity-corrected Z — the standard "is volume
    drifting" monitor for pipelines where seasonality rules out a
    linear fit.

    Scale shape: one per-block (bucket, count) combiner + a tiny keyed
    merge; only the |buckets|-row series (guarded at ``max_points``)
    reaches the driver, where S folds over one vectorized n x n sign
    matrix. Returns one row (n, s, var_s, z, trend) with trend at the
    two-sided 5% level."""
    import pyarrow.compute as pc

    from ..tuning import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        day = pc.floor_temporal(ts, unit=freq)
        g = pa.table({"b": day}).group_by(["b"])             .aggregate([([], "count_all")])
        return pa.table({"b": g.column("b"),
                         "c": g.column("count_all").cast(pa.int64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
              .groupby("b", num_partitions=shuffle_partitions())
              .sum("c").to_pandas())
    if len(merged) > max_points:
        # the guard bounds the DENSE n x n sign matrix below (5k
        # points = 200 MB); coarsen freq, or swap in an O(n log n)
        # inversion count if sub-daily buckets over years are needed
        raise ValueError(
            f"mann_kendall: {len(merged)} {freq} buckets > max_points="
            f"{max_points}; coarsen freq")
    merged = merged.sort_values("b")
    x = merged["sum(c)"].to_numpy(np.int64)
    n = len(x)
    if n < 2:
        return pd.DataFrame({"n": np.array([n], np.int64),
                             "s": np.array([0], np.int64),
                             "var_s": [np.nan], "z": [np.nan],
                             "trend": ["none"]})
    sg = np.sign(x[None, :] - x[:, None])
    s_stat = int(np.triu(sg, 1).sum())
    _, tie_counts = np.unique(x, return_counts=True)
    t = tie_counts[tie_counts > 1].astype(np.float64)
    var_s = (n * (n - 1.0) * (2.0 * n + 5.0)
             - (t * (t - 1.0) * (2.0 * t + 5.0)).sum()) / 18.0
    if var_s > 0 and s_stat > 0:
        z = (s_stat - 1.0) / np.sqrt(var_s)
    elif var_s > 0 and s_stat < 0:
        z = (s_stat + 1.0) / np.sqrt(var_s)
    else:
        z = 0.0
    trend = "none" if abs(z) <= 1.959963985 else (
        "increasing" if z > 0 else "decreasing")
    r6 = lambda v: float(np.floor(abs(v) * 1e6 + 0.5) / 1e6
                         * (1.0 if v >= 0 else -1.0))
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "s": np.array([s_stat], np.int64),
                         "var_s": [r6(var_s)], "z": [r6(z)],
                         "trend": [trend]})


def _column_digest(ds, col: str, delta: float = 500.0,
                   center: float | None = None):
    """Merged t-digest over one numeric column (nulls/NaN dropped); with
    ``center`` set, sketches |x − center| instead (the MAD second
    pass). One per-block sketch partial (a ~delta-centroid blob per
    block, KBs), driver merge — raw values never leave the blocks."""
    import pyarrow.compute as pc

    from ..state import TDigest

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).cast(pa.float64())
        x = pa.table({"v": v}).filter(pc.is_valid(v)) \
            .column("v").to_numpy(zero_copy_only=False)
        if center is not None:
            x = np.abs(x - center)
        return pa.table({"d": pa.array(
            [TDigest.from_array(x, delta).to_bytes()], pa.binary())})

    sk = ds.map_batches(partial, batch_format="pyarrow",
                        batch_size=None).to_pandas()
    if sk.empty or "d" not in sk.columns:
        return TDigest(delta)
    return TDigest.merge_bytes(list(sk["d"]))


def _global_value_fit(ds, col: str, max_distinct: int, exact: bool,
                      delta: float, caller: str, degrade_msg: str,
                      raise_msg: str):
    """Shared global single-column fit for the fitted transforms
    (mad_outliers / robust_scale / winsorize): the distinct-value
    histogram when it fits the guard (decided from materialized block
    metadata — nothing collected past the bound), else a LOUD t-digest
    degrade (``exact=True`` preserves the raise).

    Returns ``("exact", values, counts)`` with float64/int64 arrays,
    ``("approx", digest)``, or ``("empty",)`` for an all-null column."""
    import warnings

    import pyarrow.compute as pc

    from ..tuning import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).cast(pa.float64())
        t = pa.table({"v": v}).filter(pc.is_valid(v))
        g = t.group_by(["v"]).aggregate([([], "count_all")])
        return pa.table({"v": g.column("v"),
                         "c": g.column("count_all").cast(pa.int64())})

    hist_ds = (ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
               .groupby("v", num_partitions=shuffle_partitions())
               .sum("c").materialize())
    n_distinct = hist_ds.count()
    if n_distinct > max_distinct:
        if exact:
            raise ValueError(
                f"{caller}: {n_distinct} distinct values — {raise_msg}")
        warnings.warn(
            f"{caller}: {n_distinct} distinct values exceed the "
            f"exact-histogram guard; {degrade_msg} (pass exact=True "
            f"to forbid)", RuntimeWarning, stacklevel=3)
        return ("approx", _column_digest(ds, col, delta))
    hist = hist_ds.to_pandas()
    if hist.empty:
        return ("empty",)
    return ("exact", hist["v"].to_numpy(np.float64),
            hist["sum(c)"].to_numpy(np.int64))


def mad_outliers(ds, col: str, id_cols: list[str], k: float = 3.5,
                 max_distinct: int = 5_000_000, exact: bool = False,
                 delta: float = 500.0):
    """Robust global outlier ROWS via the modified z-score
    (Iglewicz-Hoaglin): |0.6745·(x − median) / MAD| > ``k`` — the
    MAD-based dual of the mean/std and IQR fences whose cutoff
    outliers themselves cannot inflate. NULL values are never
    outliers; degenerate MAD = 0 (whenever >= 50% of values tie on the
    median) flags nothing — the modified z-score is undefined (±inf)
    there, so no row can clear a finite fence.

    Two streaming phases, no raw-row shuffle: the value-histogram
    combiner fits the exact interpolated median and MAD (distinct
    (value, count) rows only — bounded by the value domain, guarded
    at ``max_distinct``; the guard is decided from materialized block
    metadata, nothing is collected past it), the two scalars
    broadcast, and a stateless vectorized filter emits only the
    violating rows + their ``mz`` (rounded to 6). Continuous domains
    past the guard DEGRADE loudly to two t-digest sketch passes
    (median, then median absolute deviation) — approximate fences,
    same output contract — or raise when ``exact=True``. Returns a
    Dataset of (id_cols..., col, mz)."""
    import ray

    fit = _global_value_fit(
        ds, col, max_distinct, exact, delta, "mad_outliers",
        "degrading to approximate t-digest median/MAD fences",
        "quantize first at this cardinality")
    if fit[0] == "approx":
        d1 = fit[1]
        med = d1.quantile(0.5) if d1.count else np.nan
        d2 = _column_digest(ds, col, delta, center=med)
        mad = d2.quantile(0.5) if d2.count else np.nan
    elif fit[0] == "empty":
        med = mad = np.nan
    else:
        _, vals, cnts = fit
        med = _weighted_quantile(vals, cnts, (0.5,))[0]
        mad = _weighted_quantile(np.abs(vals - med), cnts, (0.5,))[0]
    ref = ray.put((med, mad))

    def flag(batch: pa.Table) -> pa.Table:
        med, mad = ray.get(ref)
        x = batch.column(col).cast(pa.float64())             .to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            mz = 0.6745 * (x - med) / mad
        keep = np.abs(mz) > k
        keep &= ~np.isnan(mz)
        # degenerate MAD == 0 makes mz = ±inf for any x != median (when
        # >=50% of values tie on the median); the documented contract is
        # that a zero-MAD column flags NOTHING. Condition on mad itself
        # so a genuine +/-inf VALUE (mz = inf with mad > 0 — the most
        # extreme outlier possible) still flags
        if mad == 0:
            keep &= False
        mz = np.floor(np.abs(mz) * 1e6 + 0.5) / 1e6 * np.sign(mz)
        out = batch.select(id_cols + [col])             .append_column("mz", pa.array(mz, pa.float64()))
        return out.filter(pa.array(keep.astype(bool)))

    return ds.map_batches(flag, batch_format="pyarrow", batch_size=None)


def cusum_changepoint(ds, ts_col: str, *, freq: str = "day",
                      max_points: int = 100_000) -> pd.DataFrame:
    """Single-changepoint detection on the event-volume series via the
    CUSUM statistic (the binary-segmentation primitive): bucket
    timestamps to ``freq``, count rows per bucket (exact integers —
    same no-float-noise contract as ``mann_kendall``), then the split
    k* maximizing |S_k| with S_k = Σ_{i<=k}(x_i − x̄) — the point where
    the level most plausibly shifted; ties take the EARLIEST bucket.

    Scale shape: one per-block (bucket, count) combiner + a tiny keyed
    merge; only the |buckets|-row series (guarded) reaches the driver
    for the closed-form scan. Returns one row (split_day, stat,
    mean_before, mean_after, n) — stat/means rounded to 6."""
    import pyarrow.compute as pc

    from ..tuning import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column(ts_col), unit=freq)
        g = pa.table({"b": day}).group_by(["b"])             .aggregate([([], "count_all")])
        return pa.table({"b": g.column("b"),
                         "c": g.column("count_all").cast(pa.int64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
              .groupby("b", num_partitions=shuffle_partitions())
              .sum("c").to_pandas())
    if len(merged) > max_points:
        raise ValueError(
            f"cusum_changepoint: {len(merged)} {freq} buckets > "
            f"max_points={max_points}; coarsen freq")
    merged = merged.sort_values("b").reset_index(drop=True)
    x = merged["sum(c)"].to_numpy(np.int64).astype(np.float64)
    n = len(x)
    r6 = lambda v: float(np.floor(abs(v) * 1e6 + 0.5) / 1e6
                         * (1.0 if v >= 0 else -1.0))
    if n < 2:
        return pd.DataFrame({"split_day": [pd.NaT], "stat": [np.nan],
                             "mean_before": [np.nan],
                             "mean_after": [np.nan],
                             "n": np.array([n], np.int64)})
    s = np.cumsum(x - x.mean())[:-1]          # S_1 .. S_{n-1}
    k = int(np.argmax(np.abs(s)))             # first max -> earliest
    return pd.DataFrame({
        "split_day": [merged["b"].iloc[k]],
        "stat": [r6(abs(s[k]))],
        "mean_before": [r6(x[:k + 1].mean())],
        "mean_after": [r6(x[k + 1:].mean())],
        "n": np.array([n], np.int64)})


def volume_peaks(ds, ts_col: str, *, freq: str = "day",
                 max_points: int = 100_000) -> pd.DataFrame:
    """Strict local maxima of the event-volume series: buckets whose
    exact count exceeds BOTH neighbors (endpoints never peak) — the
    burst-day detector that pairs with ``cusum_changepoint`` (level
    shifts) and ``mann_kendall`` (monotone drift) on the same
    integer-count series. Same combiner shape: per-block (bucket,
    count) partials, tiny keyed merge, closed-form driver scan.
    Returns (day, n, prev_n, next_n) sorted by day."""
    import pyarrow.compute as pc

    from ..tuning import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column(ts_col), unit=freq)
        g = pa.table({"b": day}).group_by(["b"])             .aggregate([([], "count_all")])
        return pa.table({"b": g.column("b"),
                         "c": g.column("count_all").cast(pa.int64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
              .groupby("b", num_partitions=shuffle_partitions())
              .sum("c").to_pandas())
    if len(merged) > max_points:
        raise ValueError(
            f"volume_peaks: {len(merged)} {freq} buckets > "
            f"max_points={max_points}; coarsen freq")
    merged = merged.sort_values("b").reset_index(drop=True)
    x = merged["sum(c)"].to_numpy(np.int64)
    if len(x) < 3:
        return pd.DataFrame({"day": pd.Series([], dtype="datetime64[us]"),
                             "n": pd.Series([], dtype="int64"),
                             "prev_n": pd.Series([], dtype="int64"),
                             "next_n": pd.Series([], dtype="int64")})
    mid = np.arange(1, len(x) - 1)
    pk = mid[(x[mid] > x[mid - 1]) & (x[mid] > x[mid + 1])]
    return pd.DataFrame({
        "day": pd.to_datetime(merged["b"].iloc[pk].to_numpy()),
        "n": x[pk], "prev_n": x[pk - 1],
        "next_n": x[pk + 1]}).reset_index(drop=True)


def theil_sen_slope(ds, ts_col: str, *, freq: str = "day",
                    max_points: int = 2_000) -> pd.DataFrame:
    """Theil-Sen estimator on the event-volume series: the MEDIAN of
    all pairwise slopes (Δcount / Δ``freq``-buckets, i.e. slope is per
    BUCKET of the chosen ``freq``) over exact per-bucket counts
    — the robust trend magnitude that a few burst days cannot drag
    (pairs with ``mann_kendall`` for direction, ``cusum_changepoint``
    for level shifts on the same integer series). Only fixed-duration
    ``freq`` values are accepted (microsecond..week) — calendar units
    (month/quarter/year) have no constant Δt and raise.

    Same combiner shape: per-block (bucket, count) partials, tiny
    keyed merge; the pairwise slope matrix is driver-side on the
    ``max_points``-guarded series (2000 points = 32 MB of pairs).
    Returns one row (n, slope, n_pairs), slope rounded to 6
    (interpolated median — SQL median() parity)."""
    import pyarrow.compute as pc

    from ..tuning import shuffle_partitions

    # time axis in BUCKET units, not hard-coded days: sub-daily freqs
    # truncated to datetime64[D] would give Δt = 0 for same-day pairs
    # (inf/NaN slopes corrupting the median). Validated BEFORE the
    # distributed pass so a calendar freq fails fast, not after a scan
    freq_us = {"microsecond": 1, "millisecond": 1_000,
               "second": 1_000_000, "minute": 60_000_000,
               "hour": 3_600_000_000, "day": 86_400_000_000,
               "week": 7 * 86_400_000_000}.get(freq)
    if freq_us is None:
        raise ValueError(
            f"theil_sen_slope: freq {freq!r} has no fixed duration — "
            f"use microsecond/millisecond/second/minute/hour/day/week")

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column(ts_col), unit=freq)
        g = pa.table({"b": day}).group_by(["b"])             .aggregate([([], "count_all")])
        return pa.table({"b": g.column("b"),
                         "c": g.column("count_all").cast(pa.int64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
              .groupby("b", num_partitions=shuffle_partitions())
              .sum("c").to_pandas())
    if len(merged) > max_points:
        raise ValueError(
            f"theil_sen_slope: {len(merged)} {freq} buckets > "
            f"max_points={max_points}; coarsen freq")
    merged = merged.sort_values("b").reset_index(drop=True)
    n = len(merged)
    if n < 2:
        return pd.DataFrame({"n": np.array([n], np.int64),
                             "slope": [np.nan],
                             "n_pairs": np.array([0], np.int64)})
    x = merged["sum(c)"].to_numpy(np.int64).astype(np.float64)
    us = merged["b"].to_numpy().astype("datetime64[us]").astype(np.int64)
    days = ((us - us[0]) // freq_us).astype(np.float64)
    dx = x[None, :] - x[:, None]
    dd = days[None, :] - days[:, None]
    iu = np.triu_indices(n, 1)
    slopes = dx[iu] / dd[iu]
    med = float(np.median(slopes))
    r6 = float(np.floor(abs(med) * 1e6 + 0.5) / 1e6
               * (1.0 if med >= 0 else -1.0))
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "slope": [r6],
                         "n_pairs": np.array([slopes.size], np.int64)})


def robust_scale(ds, col: str, out_col: str = "robust",
                 max_distinct: int = 5_000_000, exact: bool = False,
                 delta: float = 500.0):
    """Robust scaling ``(x − median) / IQR`` — sklearn RobustScaler
    semantics: the center/spread fit that outliers cannot drag (the
    fitted-transform sibling of z_score/min_max, which the reference
    computes per batch and this engine fits GLOBALLY). Nulls pass
    through as null; a zero IQR yields null (undefined scale).

    Same two-phase shape as ``mad_outliers``: the value-histogram
    combiner fits the exact interpolated median/q25/q75 (distinct
    (value, count) rows only, guarded from materialized metadata —
    nothing is collected past the bound), the three scalars broadcast,
    and the transform is one stateless vectorized stamp. Continuous
    domains past the guard DEGRADE loudly to one t-digest sketch pass
    (approximate q25/median/q75, same output contract), or raise when
    ``exact=True``. Appends ``out_col`` rounded to 6."""
    import ray

    fit = _global_value_fit(
        ds, col, max_distinct, exact, delta, "robust_scale",
        "degrading to the approximate t-digest quantile fit",
        "use the t-digest sketch path for continuous domains")
    if fit[0] == "approx":
        d = fit[1]
        if d.count:
            q25, med, q75 = d.quantiles((0.25, 0.5, 0.75))
            iqr = q75 - q25
        else:
            med, iqr = np.nan, np.nan
    elif fit[0] == "empty":
        med, iqr = np.nan, np.nan
    else:
        _, vals, cnts = fit
        q25, med, q75 = _weighted_quantile(vals, cnts,
                                           (0.25, 0.5, 0.75))
        iqr = q75 - q25
    ref = ray.put((med, iqr))

    def stamp(batch: pa.Table) -> pa.Table:
        med, iqr = ray.get(ref)
        x = batch.column(col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = (x - med) / iqr if iqr and iqr > 0 \
                else np.full(x.size, np.nan)
        r = np.floor(np.abs(r) * 1e6 + 0.5) / 1e6 * np.sign(r)
        return batch.append_column(out_col, pa.array(r, pa.float64()))

    return ds.map_batches(stamp, batch_format="pyarrow",
                          batch_size=None)


def winsorize(ds, col: str, p_lo: float = 0.01, p_hi: float = 0.99,
              out_col: str = "winsor", max_distinct: int = 5_000_000,
              exact: bool = False, delta: float = 500.0):
    """Winsorization: clip ``col`` to its GLOBAL [p_lo, p_hi]
    interpolated quantiles — the outlier-robust transform that keeps
    every row (unlike a fence filter) while bounding leverage; the
    clip-at-percentile sibling of ``robust_scale``. Nulls pass through
    as null.

    Same two-phase shape as ``robust_scale``: the value-histogram
    combiner fits the exact quantile_cont cut points (distinct
    (value, count) rows, guarded from materialized metadata), the two
    scalars broadcast, one stateless vectorized clamp. Continuous
    domains past the guard DEGRADE loudly to the t-digest quantile fit
    (``exact=True`` preserves the raise). Appends ``out_col``
    (float64, unrounded — clipping is exact arithmetic)."""
    import ray

    if not 0.0 <= p_lo <= p_hi <= 1.0:
        raise ValueError(
            f"need 0 <= p_lo <= p_hi <= 1, got ({p_lo}, {p_hi})")

    fit = _global_value_fit(
        ds, col, max_distinct, exact, delta, "winsorize",
        "degrading to the approximate t-digest quantile fit",
        "use the t-digest sketch path for continuous domains")
    if fit[0] == "approx":
        d = fit[1]
        lo, hi = (d.quantiles((p_lo, p_hi)) if d.count
                  else (np.nan, np.nan))
    elif fit[0] == "empty":
        lo = hi = np.nan
    else:
        _, vals, cnts = fit
        lo, hi = _weighted_quantile(vals, cnts, (p_lo, p_hi))
    ref = ray.put((lo, hi))

    def clamp(batch: pa.Table) -> pa.Table:
        lo, hi = ray.get(ref)
        x = batch.column(col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        if np.isnan(lo):
            w = np.full(x.size, np.nan)
        else:
            w = np.clip(x, lo, hi)
        mask = np.isnan(x)
        return batch.append_column(
            out_col, pa.array(np.where(mask, 0.0, w), pa.float64(),
                              mask=mask))

    return ds.map_batches(clamp, batch_format="pyarrow",
                          batch_size=None)
