"""Grouped exact aggregates built from per-block combiners.

``COUNT(DISTINCT v)`` per key is the canonical combine-then-exchange
aggregate: each block first collapses to its distinct (key, value)
pairs — with per-pair row counts riding along so ``COUNT(*)`` needs no
second pass over the input — and only those block-local distinct pairs
enter the shuffle. At web scale that is orders of magnitude fewer rows
than the input whenever values repeat within blocks. The deduped pairs
hash-partition by key and each reduce partition emits exactly one row
per key; the raw table never moves and only the |keys|-row result
reaches the driver.

Reference parity: feature-fabrica exposes distinct-style grouped
reductions only through GroupByReduce (transform/aggregate.py:67-111);
this module is the dedicated count-distinct form the validation engine
uses for per-group cardinality checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..tuning import shuffle_partitions


def _with_shuffle_key(t: pa.Table, key_col: str) -> pa.Table:
    """Append a null-safe string shuffle key: Ray's sort-based groupby
    cannot compare None with real values, so nulls map to the engine's
    "\\0null" sentinel (own group, SQL GROUP BY semantics) and the
    original column rides along for output."""
    k = pc.fill_null(pc.cast(t.column(key_col), pa.string()), "\0null")
    return t.append_column("__gkey", k)


def _with_shuffle_key_multi(t: pa.Table, cols) -> pa.Table:
    """Multi-column form of ``_with_shuffle_key``: one null-safe string
    key joining every group column with an unprintable separator."""
    k = pc.fill_null(pc.cast(t.column(cols[0]), pa.string()), "\0null")
    for c in cols[1:]:
        k = pc.binary_join_element_wise(
            k, pc.fill_null(pc.cast(t.column(c), pa.string()), "\0null"),
            "\x1f")
    return t.append_column("__gkey", k)


def _restore_null_keys(out: pd.DataFrame, key_cols) -> pd.DataFrame:
    """pandas groupby(dropna=False) surfaces null group keys as NaN;
    object key columns must carry None (the Arrow/driver-hash
    canonical null), never NaN."""
    for c in key_cols:
        if c in out.columns and out[c].dtype == object:
            out[c] = out[c].where(out[c].notna(), None)
    return out


def _bucketed_merge(parts, merge_bucket, n_buckets: int | None = None,
                    gkey: str = "__gkey") -> pd.DataFrame:
    """Merge per-block combiner partials with per-BUCKET (never
    per-key) Python: partials shuffle on ``hash(key) % B`` and each of
    the B reduce calls merges ALL of its bucket's keys in one
    vectorized pandas/numpy pass — the ``events.bucketed_by_key``
    shape (49x A/B at BASELINE.md:100) applied to the merge side. The
    exchange is IDENTICAL to the old ``groupby(__gkey)`` form (same
    partial rows, one keyed shuffle); only the Python-call count
    changes from |keys| to B, which is what keeps 10^9-key grouped
    stats off the interpreter. Buckets are uniform in key hash, so a
    Zipf-hot KEY costs one hot bucket at most (same bound as before).

    ``merge_bucket(df)`` sees the partial rows of every key in the
    bucket (original key column included, ``gkey`` dropped) and must
    group with ``dropna=False`` — null keys are their own group (SQL
    semantics), restored to None via ``_restore_null_keys``."""
    return _bucketed_merge_ds(parts, merge_bucket, n_buckets,
                              gkey).to_pandas()


def _bucketed_merge_ds(parts, merge_bucket, n_buckets: int | None = None,
                       gkey: str = "__gkey"):
    """Dataset-returning core of ``_bucketed_merge`` — for merges that
    feed further pipeline stages instead of the driver."""
    from ..state import hash64

    n = n_buckets or shuffle_partitions()

    def bucketize(t: pa.Table) -> pa.Table:
        h = hash64(t.column(gkey))
        t = t.drop_columns([gkey])
        return t.append_column("__bkt", pa.array(
            (h % np.uint64(n)).astype(np.int32), pa.int32()))

    def run(t: pa.Table):
        in_schema = t.schema
        out = merge_bucket(t.drop_columns(["__bkt"]).to_pandas())
        # metadata-free Arrow: pandas conversion embeds schema metadata
        # that defeats Ray's block-schema dedup (see bucketed_by_key)
        res = pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)
        # a bucket whose only key is the NULL group loses the key
        # column's type on the pandas round-trip (object None -> a
        # float64-NaN index -> Arrow `double`, or the typeless `null`
        # type), which cannot unify with the string/int buckets — give
        # all-null pass-through columns their partial-side type back
        for i, f in enumerate(res.schema):
            if f.name in in_schema.names:
                want = in_schema.field(f.name).type
                col = res.column(i)
                if f.type != want and (pa.types.is_null(f.type)
                                       or col.null_count == len(col)):
                    res = res.set_column(i, f.name,
                                         pa.nulls(len(col), want))
        return res

    return (parts.map_batches(bucketize, batch_format="pyarrow",
                              batch_size=None)
            .groupby("__bkt", num_partitions=n)
            .map_groups(run, batch_format="pyarrow"))


def _moments_merge_bucket(df: pd.DataFrame, key_col: str) -> pd.DataFrame:
    """Vectorized k-way merge of per-block central-moment partials
    (n, mean, m2, m3, m4) for ALL keys of a bucket at once: central
    moments about each key's GRAND mean decompose additively —
    with d_i = mean_i − μ,  M2 = Σ(m2_i + n_i d_i²),
    M3 = Σ(m3_i + 3 d_i m2_i + n_i d_i³),
    M4 = Σ(m4_i + 4 d_i m3_i + 6 d_i² m2_i + n_i d_i⁴) — the k-way
    closed form of the Pébay pairwise rules (``state.HigherMoments``),
    exact and at least as stable (one centering step, no fold order).
    Returns one row per key: (key, n, mean, m2, m3, m4)."""
    w = df["n"].to_numpy(np.float64)
    mean = df["mean"].to_numpy(np.float64)
    df = df.assign(__wm=w * mean)
    g = df.groupby(key_col, dropna=False, sort=False)
    mu = (g["__wm"].transform("sum") / g["n"].transform("sum")) \
        .to_numpy(np.float64)
    d = mean - mu
    m2 = df["m2"].to_numpy(np.float64)
    m3 = df["m3"].to_numpy(np.float64)
    m4 = df["m4"].to_numpy(np.float64)
    d2 = d * d
    agg = df.assign(
        __M2=m2 + w * d2,
        __M3=m3 + 3.0 * d * m2 + w * d2 * d,
        __M4=m4 + 4.0 * d * m3 + 6.0 * d2 * m2 + w * d2 * d2) \
        .groupby(key_col, dropna=False, sort=False, as_index=False) \
        .agg(n=("n", "sum"), __wm=("__wm", "sum"), m2=("__M2", "sum"),
             m3=("__M3", "sum"), m4=("__M4", "sum"))
    n = agg["n"].to_numpy(np.float64)
    agg["mean"] = agg["__wm"].to_numpy(np.float64) / n
    return agg.drop(columns="__wm")

__all__ = ["anova_f", "target_encode_loo", "mutual_information",
           "fd_violations",
           "distinct_count_per_group", "rollup_agg", "histogram_fixed",
           "grouped_stats", "freshness_check", "grouped_outliers",
           "grouped_correlation", "approx_distinct_per_group", "cube_agg",
           "approx_group_quantiles",
           "pivot_agg", "mode_per_group", "grouping_sets_agg",
           "string_agg_per_group", "grouped_shape", "entropy_per_group",
           "monotonic_violations", "grouped_regression",
           "grouped_outliers_iqr", "weighted_avg_per_group",
           "chi_square_independence", "gini_coefficient",
           "weighted_median_per_group", "grouped_log_means",
           "theil_index_per_group", "corr_matrix", "partial_corr", "ks_two_sample",
           "hll_set_ops", "histogram2d_fixed"]


def grouped_shape(ds, key_col: str, val_col: str) -> pd.DataFrame:
    """Exact per-group skewness + excess kurtosis (SQL/pandas ADJUSTED
    sample definitions — DuckDB skewness()/kurtosis()) via mergeable
    higher-moment sketches (``state/welford.py::HigherMoments``, Pébay
    pairwise M3/M4): each block reduces to one 5-scalar state per key
    (fully vectorized — per-key means via groupby transform, centered
    power sums via one groupby), only those states enter the keyed
    shuffle, and each reduce partition merges its key's states.
    Returns (key, skew, kurt, n) sorted by key."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, val_col]).to_pandas()
        df = df[df[val_col].notna()]
        if not len(df):
            return _with_shuffle_key(pa.table({
                key_col: pa.array([], batch.schema.field(key_col).type),
                "n": pa.array([], pa.int64()),
                "mean": pa.array([], pa.float64()),
                "m2": pa.array([], pa.float64()),
                "m3": pa.array([], pa.float64()),
                "m4": pa.array([], pa.float64())}), key_col)
        v = df[val_col].astype(np.float64)
        g = df.groupby(key_col, dropna=False, sort=False)
        d = v - g[val_col].transform("mean").astype(np.float64)
        d2 = d * d
        cen = pd.DataFrame({key_col: df[key_col], "n": 1, "s": v,
                            "m2": d2, "m3": d2 * d, "m4": d2 * d2}) \
            .groupby(key_col, dropna=False, sort=False).sum()
        out = pa.table({
            key_col: pa.array(cen.index.to_numpy(),
                              batch.schema.field(key_col).type),
            "n": pa.array(cen["n"].to_numpy(np.int64)),
            "mean": pa.array((cen["s"] / cen["n"]).to_numpy(np.float64)),
            "m2": pa.array(cen["m2"].to_numpy(np.float64)),
            "m3": pa.array(cen["m3"].to_numpy(np.float64)),
            "m4": pa.array(cen["m4"].to_numpy(np.float64))})
        return _with_shuffle_key(out, key_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        agg = _moments_merge_bucket(df, key_col)
        n = agg["n"].to_numpy(np.float64)
        M2 = agg["m2"].to_numpy(np.float64)
        M3 = agg["m3"].to_numpy(np.float64)
        M4 = agg["m4"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            g1 = (M3 / n) / (M2 / n) ** 1.5
            skew = np.where((n >= 3) & (M2 > 0),
                            g1 * np.sqrt(n * (n - 1.0)) / (n - 2.0), np.nan)
            g2 = n * M4 / (M2 * M2) - 3.0
            kurt = np.where((n >= 4) & (M2 > 0),
                            ((n + 1.0) * g2 + 6.0) * (n - 1.0)
                            / ((n - 2.0) * (n - 3.0)), np.nan)
        return _restore_null_keys(pd.DataFrame({
            key_col: agg[key_col], "skew": skew, "kurt": kurt,
            "n": agg["n"].to_numpy(np.int64)}), [key_col])

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    key = out[key_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


def string_agg_per_group(ds, key_col: str, val_col: str, order_col: str,
                         sep: str = ",") -> pd.DataFrame:
    """SQL ``string_agg(val, sep ORDER BY order_col)`` per key: nulls
    are skipped, an all-null group aggregates to NULL (SQL parity).
    Returns (key, agg_s) sorted by key.

    Holistic by nature — every (key, val, order) triple must reach its
    key's reduce partition, so this is ONE null-safe keyed shuffle of
    the three projected columns and a vectorized sort + join per group.
    Unlike the combiner-shaped aggregates in this module there is no
    partial-aggregation escape; the projection (never the full table)
    is the exchange, and per-key output size is inherently the
    concatenation length."""

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # one mergesort across the whole bucket, then pandas' C groupby
        # drives the per-key joins (join itself is a C string op; the
        # only Python left is one agg lambda frame per key, not a Ray
        # map_groups round-trip per key)
        df = df.sort_values(order_col, kind="mergesort")
        ok = df[df[val_col].notna()]
        joined = ok.groupby(key_col, dropna=False, sort=False)[val_col] \
            .agg(lambda s: sep.join(s.astype(str)))
        keys = df.drop_duplicates(key_col)[[key_col]]
        out = keys.assign(agg_s=joined.reindex(
            pd.Index(keys[key_col])).to_numpy())
        # all-null groups aggregate to NULL (None, not NaN)
        out["agg_s"] = out["agg_s"].astype(object) \
            .where(out["agg_s"].notna(), None)
        return _restore_null_keys(out.reset_index(drop=True), [key_col])

    def project(batch: pa.Table) -> pa.Table:
        return _with_shuffle_key(
            batch.select([key_col, val_col, order_col]), key_col)

    out = _bucketed_merge(
        ds.map_batches(project, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    key = out[key_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


def mode_per_group(ds, key_col: str, val_col: str) -> pd.DataFrame:
    """Exact per-group mode: the most frequent non-null ``val`` per key,
    ties broken toward the smallest value (deterministic, unlike bare
    SQL ``mode()``). Returns (key, mode_v, mode_n) sorted by key.

    Same physical shape as ``distinct_count_per_group``: each block
    collapses to its distinct (key, value) pairs with counts, only those
    partials enter the ONE keyed shuffle, and each reduce partition
    emits one row per key — the raw table never moves and value
    cardinality per block (not row count) bounds the exchange.

    Reference parity: feature-fabrica's GroupByReduce supports
    ``how="mode"`` per group (transform/aggregate.py:92, pandas
    ``.mode().iloc[0]``); this is the distributed combiner form.
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, val_col]).filter(
            pc.is_valid(batch.column(val_col)))
        g = t.group_by([key_col, val_col]).aggregate([([], "count_all")])
        return _with_shuffle_key(
            pa.table({key_col: g.column(key_col),
                      val_col: g.column(val_col),
                      "cnt": g.column("count_all").cast(pa.int64())}),
            key_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # all keys of the bucket in three vectorized passes: sum counts
        # per (key, value), stable-sort so each key's first row is its
        # (max count, min value) winner, take firsts
        m = df.groupby([key_col, val_col], dropna=False, sort=False,
                       as_index=False)["cnt"].sum()
        m = m.sort_values(val_col, kind="mergesort") \
            .sort_values("cnt", kind="mergesort", ascending=False)
        win = m.drop_duplicates(key_col, keep="first")
        out = pd.DataFrame({key_col: win[key_col],
                            "mode_v": win[val_col],
                            "mode_n": win["cnt"].to_numpy(np.int64)})
        return _restore_null_keys(out.reset_index(drop=True), [key_col])

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    key = out[key_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


def entropy_per_group(ds, key_col: str, val_col: str) -> pd.DataFrame:
    """Exact Shannon entropy (log2, DuckDB ``entropy()`` parity) of the
    non-null value distribution per key. Same physical shape as
    ``mode_per_group``: blocks collapse to distinct (key, value) counts,
    only those partials enter ONE keyed shuffle, each reduce partition
    sums per-value counts and evaluates -sum p log2 p vectorized.
    Returns (key, entropy, n) sorted by key."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, val_col]).filter(
            pc.is_valid(batch.column(val_col)))
        g = t.group_by([key_col, val_col]).aggregate([([], "count_all")])
        return _with_shuffle_key(
            pa.table({key_col: g.column(key_col),
                      val_col: g.column(val_col),
                      "cnt": g.column("count_all").cast(pa.int64())}),
            key_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby([key_col, val_col], dropna=False, sort=False,
                       as_index=False)["cnt"].sum()
        g = m.groupby(key_col, dropna=False, sort=False)
        n_row = g["cnt"].transform("sum").to_numpy(np.float64)
        p = m["cnt"].to_numpy(np.float64) / n_row
        term = pd.DataFrame({key_col: m[key_col], "__t": -p * np.log2(p),
                             "cnt": m["cnt"]})
        agg = term.groupby(key_col, dropna=False, sort=False,
                           as_index=False).agg(entropy=("__t", "sum"),
                                               n=("cnt", "sum"))
        out = pd.DataFrame({key_col: agg[key_col],
                            "entropy": agg["entropy"].to_numpy(np.float64),
                            "n": agg["n"].to_numpy(np.int64)})
        return _restore_null_keys(out, [key_col])

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    key = out[key_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


def distinct_count_per_group(ds, key_col: str, val_col: str) -> pd.DataFrame:
    """Exact ``COUNT(DISTINCT val)`` + ``COUNT(*)`` per key.

    Null values count toward ``n_rows`` but not ``n_distinct`` (SQL
    semantics); null keys form their own group. Returns a pandas
    DataFrame (key, n_distinct, n_rows) sorted by key — the result is
    one row per key, small by construction.
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key_col, val_col]) \
            .group_by([key_col, val_col]).aggregate([([], "count_all")])
        return _with_shuffle_key(
            pa.table({key_col: g.column(key_col),
                      val_col: g.column(val_col),
                      "cnt": g.column("count_all").cast(pa.int64())}),
            key_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = df.groupby(key_col, dropna=False, sort=False,
                          as_index=False)["cnt"].sum()
        nd = df[df[val_col].notna()].drop_duplicates([key_col, val_col]) \
            .groupby(key_col, dropna=False, sort=False).size()
        out = pd.DataFrame({
            key_col: rows[key_col],
            "n_distinct": nd.reindex(pd.Index(rows[key_col]))
            .fillna(0).to_numpy(np.int64),
            "n_rows": rows["cnt"].to_numpy(np.int64)})
        return _restore_null_keys(out, [key_col])

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    key = out[key_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


def rollup_agg(ds, group_cols: list[str], value_col: str,
               with_gid: bool = False) -> pd.DataFrame:
    """``GROUP BY ROLLUP(group_cols)``: sum(value) + count(*) at every
    prefix granularity (finest, each prefix, grand total), rolled-up
    columns emitted as NULL.

    Physical shape: per-block finest-level Arrow combiner, then ONE
    keyed shuffle merges the partials distributedly — the driver only
    ever receives the merged finest table, whose size is the distinct
    finest-combo count (i.e. the unavoidable size of the ROLLUP result
    itself). Every coarser level is derived from that merged table
    without touching the input again, so an L-level rollup costs one
    pass + one shuffle, not L of either.

    Note: as in SQL ROLLUP, a genuine NULL group value is
    indistinguishable from a rolled-up cell in the output; use
    sentinel-filled keys upstream if the domain contains nulls.
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([*group_cols, value_col]) \
            .group_by(group_cols).aggregate([(value_col, "sum"),
                                             ([], "count_all")])
        cols = {c: g.column(c) for c in group_cols}
        cols["sum_v"] = g.column(f"{value_col}_sum").cast(pa.float64())
        cols["n_rows"] = g.column("count_all").cast(pa.int64())
        return _with_shuffle_key_multi(pa.table(cols), group_cols)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(group_cols, as_index=False, dropna=False).agg(
            sum_v=("sum_v", "sum"), n_rows=("n_rows", "sum"))

    finest = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge)

    levels = [finest.assign(gid=0)] if with_gid else [finest]
    for lvl in range(len(group_cols) - 1, -1, -1):
        keep = group_cols[:lvl]
        if keep:
            g = finest.groupby(keep, as_index=False, dropna=False).agg(
                sum_v=("sum_v", "sum"), n_rows=("n_rows", "sum"))
        else:
            g = pd.DataFrame({"sum_v": [finest["sum_v"].sum()],
                              "n_rows": [finest["n_rows"].sum()]})
        for c in group_cols[lvl:]:
            g[c] = None
        if with_gid:
            # SQL GROUPING_ID bitmask: bit i set when group_cols[i] is
            # rolled up (last column = least-significant bit) — this is
            # what disambiguates a genuine NULL group value from a
            # rolled-up cell (the documented ROLLUP caveat)
            g["gid"] = (1 << (len(group_cols) - lvl)) - 1
        cols = [*group_cols, "sum_v", "n_rows"] + (
            ["gid"] if with_gid else [])
        levels.append(g[cols])

    out = pd.concat(levels, ignore_index=True)
    out["n_rows"] = out["n_rows"].astype("int64")
    if with_gid:
        out["gid"] = out["gid"].astype("int64")
    for c in group_cols:  # rolled-up cells must be None, never NaN
        out[c] = out[c].astype(object).where(out[c].notna(), None)
    return out.reset_index(drop=True)


def histogram_fixed(ds, col: str, lo: int, width: int,
                    nbins: int) -> pd.DataFrame:
    """Fixed-width histogram of an integer column: bin = clip(floor(
    (x - lo) / width), 0, nbins-1), exact integer arithmetic. Per-block
    ``np.bincount`` combiner — each block contributes an nbins-long
    count vector and only those vectors move; empty bins are dropped
    from the result (SQL GROUP BY parity). Returns (bin, n)."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.clip((x - lo) // width, 0, nbins - 1)
        counts = np.bincount(idx, minlength=nbins)
        return pa.table({"bin": pa.array(np.arange(nbins, dtype=np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    out = parts.groupby("bin", as_index=False).agg(n=("n", "sum"))
    out = out[out["n"] > 0]
    out["n"] = out["n"].astype("int64")
    return out.sort_values("bin").reset_index(drop=True)


def pivot_agg(ds, key_col: str, pivot_col: str, value_col: str | None,
              values: list, agg: str = "sum") -> pd.DataFrame:
    """Pivot (long -> wide conditional aggregation): one output row per
    ``key_col`` value, one ``<v>_<agg>`` column per entry of ``values``
    holding ``agg(value_col)`` over the rows where ``pivot_col == v`` —
    SQL's ``SUM(CASE WHEN pivot = v THEN value END) ... GROUP BY key``.

    ``values`` is the spec-time column set (dimension-sized, like
    sampling strata or one-hot vocabularies — pivot columns must be
    known to build a stable schema); rows with unlisted pivot values
    are ignored. ``agg``: 'sum' | 'count'. Cells with no matching rows
    are 0 (COALESCE semantics).

    Algebraic combiner shape: each block collapses to one row per key
    holding conditional partials (vectorized ``if_else`` + one Arrow
    ``group_by`` per block — no per-value scan of the batch), then one
    keyed shuffle of those |keys x blocks| partial rows and an exact
    per-key merge. Null keys form their own group.
    """
    if agg not in ("sum", "count"):
        raise ValueError(f"agg must be 'sum' or 'count', got {agg!r}")
    if agg == "sum" and value_col is None:
        raise ValueError("agg='sum' needs a value_col (count does not)")
    names = [f"{v}_{agg}" for v in values]

    def partial(batch: pa.Table) -> pa.Table:
        pv = batch.column(pivot_col)
        val = batch.column(value_col) if value_col is not None else None
        cols = {key_col: batch.column(key_col)}
        for v, name in zip(values, names):
            mask = pc.equal(pv, v)
            if agg == "count":
                cols[name] = pc.cast(pc.fill_null(mask, False), pa.int64())
            else:
                cols[name] = pc.if_else(pc.fill_null(mask, False), val,
                                        pa.scalar(0.0, pa.float64()))
        g = pa.table(cols).group_by([key_col]).aggregate(
            [(n, "sum") for n in names])
        out = {key_col: g.column(key_col)}
        for n in names:
            out[n] = g.column(f"{n}_sum")
        return _with_shuffle_key(pa.table(out), key_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key_col, dropna=False, sort=False,
                         as_index=False)[names].sum()
        for n in names:
            out[n] = out[n].astype(np.int64 if agg == "count"
                                   else np.float64)
        return _restore_null_keys(out, [key_col])

    return _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)


def grouped_stats(ds, group_col: str, col: str,
                  max_null_rate: float | None = None) -> pd.DataFrame:
    """Per-SEGMENT column stats: count / nulls / min / max / sum / mean
    of ``col`` within each value of ``group_col`` — the validation
    engine's answer to "WHICH segment is broken" (global stats are the
    fused-pass stats checks in ``pipelines/validate.py``).

    Algebraic combiner shape: per-block Arrow ``group_by`` partials
    (count, count_all, min, max, sum — one row per group per block),
    one keyed shuffle of those partials, exact merge per key. Null
    group values form their own segment. min/max/sum are emitted as
    float64 so all-null segments are representable (NaN), matching SQL
    aggregate-over-empty semantics.

    With ``max_null_rate`` set, a boolean ``passed`` column applies the
    per-segment null-rate threshold (violation form of the check).

    Non-numeric columns get the counts-only form (min/max/sum emitted
    as NaN) — the declarative ``group_stats`` suite check only needs
    (rows, nulls), so e.g. a per-lang null-rate check on a string
    column works.
    """
    numeric = True

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(col).type
        if pa.types.is_integer(t) or pa.types.is_floating(t) \
                or pa.types.is_boolean(t) or pa.types.is_decimal(t):
            g = batch.select([group_col, col]).group_by([group_col]) \
                .aggregate([(col, "count"), ([], "count_all"),
                            (col, "min"), (col, "max"), (col, "sum")])
            nmin = g.column(f"{col}_min").cast(pa.float64())
            nmax = g.column(f"{col}_max").cast(pa.float64())
            nsum = g.column(f"{col}_sum").cast(pa.float64())
        else:                     # counts-only for non-numeric columns
            g = batch.select([group_col, col]).group_by([group_col]) \
                .aggregate([(col, "count"), ([], "count_all")])
            nan = pa.array(np.full(g.num_rows, np.nan), pa.float64())
            nmin = nmax = nsum = nan
        return _with_shuffle_key(pa.table({
            group_col: g.column(group_col),
            "cnt": g.column(f"{col}_count").cast(pa.int64()),
            "n_rows": g.column("count_all").cast(pa.int64()),
            "nmin": nmin, "nmax": nmax, "nsum": nsum}), group_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, dropna=False, sort=False)
        agg = pd.DataFrame({
            "cnt": g["cnt"].sum().astype(np.int64),
            "n_rows": g["n_rows"].sum().astype(np.int64),
            "nmin": g["nmin"].min(), "nmax": g["nmax"].max(),
            "nsum": g["nsum"].sum(min_count=1)}).reset_index()
        out = pd.DataFrame({
            group_col: agg[group_col],
            "cnt": agg["cnt"],
            "nulls": (agg["n_rows"] - agg["cnt"]).astype(np.int64),
            "nmin": agg["nmin"].to_numpy(np.float64),
            "nmax": agg["nmax"].to_numpy(np.float64),
            "nsum": np.where(agg["cnt"].to_numpy() > 0,
                             agg["nsum"].to_numpy(np.float64), np.nan)})
        return _restore_null_keys(out, [group_col])

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    with np.errstate(invalid="ignore"):
        out["mean"] = out["nsum"] / out["cnt"].where(out["cnt"] > 0)
    if max_null_rate is not None:
        rate = out["nulls"] / (out["cnt"] + out["nulls"])
        out["passed"] = rate <= max_null_rate
    key = out[group_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


def freshness_check(ds, ts_col: str, group_col: str, as_of,
                    max_lag_s: float) -> pd.DataFrame:
    """Per-SEGMENT data freshness: max(``ts_col``) within each value of
    ``group_col``, its lag in seconds behind the explicit ``as_of``
    reference instant, and a ``fresh`` verdict (lag <= ``max_lag_s``).
    ``as_of`` is a parameter, not wall clock, so runs are deterministic
    and resumable.

    Same algebraic-combiner shape as ``grouped_stats``: per-block max
    partials (one row per group per block), one keyed shuffle, exact
    merge — the event stream itself never moves."""
    as_of64 = np.datetime64(pd.Timestamp(as_of), "us")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col, ts_col]).group_by([group_col]) \
            .aggregate([(ts_col, "max")])
        return _with_shuffle_key(pa.table({
            group_col: g.column(group_col),
            "mx": g.column(f"{ts_col}_max").cast(pa.timestamp("us"))}),
            group_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(group_col, dropna=False, sort=False,
                         as_index=False)["mx"].max() \
            .rename(columns={"mx": "max_ts"})
        return _restore_null_keys(out, [group_col])

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    lag_us = (as_of64 - out["max_ts"].to_numpy().astype("datetime64[us]")) \
        .astype("timedelta64[us]").astype(np.int64)
    out["lag_s"] = lag_us // 1_000_000   # floor, exact integer microseconds
    out["fresh"] = out["lag_s"] <= max_lag_s
    key = out[group_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


def grouped_outliers(ds, group_col: str, val_col: str, k: float = 3.0,
                     id_cols: list[str] | None = None):
    """Per-segment outlier ROWS: |value - mean_g| > k * stddev_pop_g
    within each ``group_col`` segment.

    Two phases, both streaming: (1) per-block (count, sum, sum-of-
    squares) partials per group -> keyed shuffle -> exact global
    mean/std per group (a |groups|-row table); (2) the per-group
    (mean, k*std) table broadcasts into a stateless filter
    ``map_batches`` — the input streams through twice but never
    shuffles, and only outlier rows come out. Segments are assumed
    dimension-sized (event types, langs); for unbounded group keys use
    a quantile-based rule instead."""
    id_cols = id_cols or []

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(val_col).cast(pa.float64())
        b2 = pa.table({group_col: batch.column(group_col), "v": v,
                       "v2": pc.multiply(v, v)})
        g = b2.group_by([group_col]).aggregate(
            [("v", "count"), ("v", "sum"), ("v2", "sum")])
        return _with_shuffle_key(pa.table({
            group_col: g.column(group_col),
            "cnt": g.column("v_count").cast(pa.int64()),
            "s1": g.column("v_sum").cast(pa.float64()),
            "s2": g.column("v2_sum").cast(pa.float64())}), group_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(group_col, dropna=False, sort=False,
                         as_index=False).agg(cnt=("cnt", "sum"),
                                             s1=("s1", "sum"),
                                             s2=("s2", "sum"))
        n = agg["cnt"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            m = np.where(n > 0, agg["s1"].to_numpy(np.float64) / n, np.nan)
            var = np.maximum(agg["s2"].to_numpy(np.float64) / n - m * m,
                             0.0)
        out = pd.DataFrame({group_col: agg[group_col], "mean": m,
                            "std": np.sqrt(var)})
        return _restore_null_keys(out, [group_col])

    stats = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    bounds = {r[group_col]: (r["mean"], k * r["std"])
              for _, r in stats.iterrows()}

    def flag(batch: pa.Table) -> pa.Table:
        # dict lookups per DISTINCT segment in the batch (factorize),
        # not per row — this stage streams the full input a second time
        codes, uniques = pd.factorize(batch.column(group_col).to_pandas())
        lut = (np.array([bounds.get(u, (np.nan, np.nan)) for u in uniques],
                        np.float64).reshape(-1, 2)
               if len(uniques) else np.zeros((0, 2)))
        safe = np.maximum(codes, 0)
        m = np.where(codes >= 0, lut[safe, 0], np.nan) if len(uniques) \
            else np.full(len(codes), np.nan)
        t = np.where(codes >= 0, lut[safe, 1], np.nan) if len(uniques) \
            else np.full(len(codes), np.nan)
        v = batch.column(val_col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            keep = np.abs(v - m) > t
        keep &= ~np.isnan(v)
        return batch.select(id_cols + [group_col, val_col]) \
            .filter(pa.array(keep.astype(bool)))

    return ds.map_batches(flag, batch_format="pyarrow", batch_size=None)


def grouped_correlation(ds, group_col: str, col_x: str,
                        col_y: str) -> pd.DataFrame:
    """Exact Pearson correlation of two columns within each segment.

    Per-block (n, Σx, Σy, Σx², Σy², Σxy) partials per group — six
    float64s per (block, segment) — one keyed shuffle, exact merge:
    corr = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²)(nΣy² − (Σy)²)),
    identical for sample and population conventions. Rows where either
    side is null are excluded (SQL corr semantics). Degenerate segments
    (n < 2 or zero variance) yield NaN."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col_x).cast(pa.float64())
        y = batch.column(col_y).cast(pa.float64())
        both = pc.and_(pc.is_valid(x), pc.is_valid(y))
        t = pa.table({group_col: batch.column(group_col), "x": x, "y": y}) \
            .filter(both)
        xv = t.column("x")
        yv = t.column("y")
        b2 = pa.table({group_col: t.column(group_col), "x": xv, "y": yv,
                       "xx": pc.multiply(xv, xv), "yy": pc.multiply(yv, yv),
                       "xy": pc.multiply(xv, yv)})
        g = b2.group_by([group_col]).aggregate(
            [("x", "count"), ("x", "sum"), ("y", "sum"),
             ("xx", "sum"), ("yy", "sum"), ("xy", "sum")])
        return _with_shuffle_key(pa.table({
            group_col: g.column(group_col),
            "n": g.column("x_count").cast(pa.int64()),
            "sx": g.column("x_sum"), "sy": g.column("y_sum"),
            "sxx": g.column("xx_sum"), "syy": g.column("yy_sum"),
            "sxy": g.column("xy_sum")}), group_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(group_col, dropna=False, sort=False,
                         as_index=False).agg(
            n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
            sxx=("sxx", "sum"), syy=("syy", "sum"), sxy=("sxy", "sum"))
        n = agg["n"].to_numpy(np.float64)
        sx, sy = agg["sx"].to_numpy(np.float64), agg["sy"].to_numpy(np.float64)
        num = n * agg["sxy"].to_numpy(np.float64) - sx * sy
        den2 = ((n * agg["sxx"].to_numpy(np.float64) - sx * sx)
                * (n * agg["syy"].to_numpy(np.float64) - sy * sy))
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = np.where((n >= 2) & (den2 > 0),
                            num / np.sqrt(np.maximum(den2, 0.0)), np.nan)
        out = pd.DataFrame({group_col: agg[group_col],
                            "n": agg["n"].astype(np.int64), "corr": corr})
        return _restore_null_keys(out, [group_col])

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    key = out[group_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


def approx_distinct_per_group(ds, key_col: str, val_col: str) -> pd.DataFrame:
    """Approximate ``COUNT(DISTINCT val)`` per key via per-group HLL
    sketches — the SCALE path for ``distinct_count_per_group``.

    The exact form shuffles every block-local distinct (key, value)
    pair; with high-cardinality values (user ids, content hashes) that
    exchange approaches input size. Here each block emits ONE ~16 KB
    HLL (p=14, ~0.8% rel. error) per group it contains, the keyed
    shuffle carries |groups| x blocks sketch rows regardless of value
    cardinality, and sketches OR-merge per key. ``n_rows`` stays
    exact. Returns (key, n_distinct_est float, n_rows) sorted by key."""
    from ..state import HLL

    def partial(batch: pa.Table) -> pa.Table:
        keys = pc.fill_null(pc.cast(batch.column(key_col), pa.string()),
                            "\0null").to_pandas()
        out_k, out_h, out_n = [], [], []
        for u in pd.unique(keys):
            mask = pa.array((keys == u).to_numpy())
            vals = batch.filter(mask).column(val_col).drop_null()
            out_k.append(u)
            out_h.append(HLL().add_column(vals).to_bytes())
            out_n.append(int(mask.true_count))
        t = pa.table({key_col: pa.array(out_k, pa.string()),
                      "hll": pa.array(out_h, pa.binary()),
                      "cnt": pa.array(out_n, pa.int64())})
        return t.append_column("__gkey", t.column(key_col))

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # all keys of the bucket at once: stack the 2^p-byte register
        # blobs into one (rows, m) uint8 matrix, key-sort, and OR-merge
        # each key's run with ONE np.maximum.reduceat — no per-key
        # Python beyond the final estimate arithmetic, which is itself
        # vectorized over the |keys|-row register matrix
        df = df.sort_values(key_col, kind="mergesort")
        R = np.frombuffer(b"".join(df["hll"]), dtype=np.uint8) \
            .reshape(len(df), -1)
        starts = np.flatnonzero(np.r_[True, df[key_col].to_numpy()[1:]
                                      != df[key_col].to_numpy()[:-1]])
        merged = np.maximum.reduceat(R, starts, axis=0)
        m = float(merged.shape[1])
        alpha = 0.7213 / (1.0 + 1.079 / m)
        regs = merged.astype(np.float64)
        e = alpha * m * m / np.exp2(-regs).sum(axis=1)
        zeros = (merged == 0).sum(axis=1).astype(np.float64)
        with np.errstate(divide="ignore"):
            lc = m * np.log(np.where(zeros > 0, m / zeros, 1.0))
        est = np.where((e <= 2.5 * m) & (zeros > 0), lc, e)
        n_rows = df.groupby(key_col, sort=False)["cnt"].sum() \
            .to_numpy(np.int64)
        return pd.DataFrame({
            key_col: df[key_col].to_numpy()[starts],
            "n_distinct_est": est, "n_rows": n_rows})

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    out[key_col] = out[key_col].where(out[key_col] != "\0null", None)
    key = out[key_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


def approx_group_quantiles(ds, key_col: str, val_col: str,
                           qs: tuple = (0.5, 0.9)) -> pd.DataFrame:
    """Approximate per-group quantiles via per-group t-digest sketches —
    the SCALE path for ``quantiles.group_quantiles``.

    The exact form's exchange carries distinct (group, value) pairs;
    with continuous values (latencies, sizes, scores) that approaches
    input size. Here each block emits ONE KB-sized t-digest per group
    it contains, the keyed shuffle carries |groups| x blocks sketch
    rows regardless of value cardinality, and digests merge per key
    (rank error ~1%, invariant to value cardinality). ``n_rows`` stays
    exact. Returns (key, q_<pct>..., n_rows) sorted by key; null keys
    form their own group, all-null groups get NaN quantiles."""
    from ..state import TDigest

    names = [f"q_{int(q * 100)}" for q in qs]

    def partial(batch: pa.Table) -> pa.Table:
        keys = pc.fill_null(pc.cast(batch.column(key_col), pa.string()),
                            "\0null").to_pandas()
        out_k, out_t, out_n = [], [], []
        for u in pd.unique(keys):
            mask = pa.array((keys == u).to_numpy())
            vals = batch.filter(mask).column(val_col).drop_null() \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            out_k.append(u)
            out_t.append(TDigest.from_array(vals).to_bytes())
            out_n.append(int(mask.true_count))
        t = pa.table({key_col: pa.array(out_k, pa.string()),
                      "td": pa.array(out_t, pa.binary()),
                      "cnt": pa.array(out_n, pa.int64())})
        return t.append_column("__gkey", t.column(key_col))

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # ONE Ray call per bucket; the t-digest fold is inherently
        # per-digest (KB-state centroid compression), so the inner
        # loop is per KEY (cheap driver-side-style arithmetic), never
        # a per-key map_groups round-trip
        df = df.sort_values(key_col, kind="mergesort")
        rows = {key_col: [], "n_rows": []}
        for name in names:
            rows[name] = []
        for key, sub in df.groupby(key_col, sort=False):
            td = TDigest.merge_bytes([bytes(b) for b in sub["td"]])
            rows[key_col].append(key)
            for q, name in zip(qs, names):
                rows[name].append(float(td.quantile(q)))
            rows["n_rows"].append(int(sub["cnt"].sum()))
        out = pd.DataFrame(rows)
        out["n_rows"] = out["n_rows"].astype(np.int64)
        return out

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    out[key_col] = out[key_col].where(out[key_col] != "\0null", None)
    key = out[key_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


def cube_agg(ds, group_cols: list[str], value_col: str) -> pd.DataFrame:
    """``GROUP BY CUBE(group_cols)``: sum(value) + count(*) at every
    SUBSET granularity (2^L levels), absent columns emitted as NULL.

    Same physical shape as ``rollup_agg``: one finest-level per-block
    combiner + ONE keyed shuffle produce the merged finest table; all
    2^L - 1 coarser subsets derive from it driver-side without touching
    the input again. Shares ROLLUP's NULL caveat for group values."""
    from itertools import combinations

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([*group_cols, value_col]) \
            .group_by(group_cols).aggregate([(value_col, "sum"),
                                             ([], "count_all")])
        cols = {c: g.column(c) for c in group_cols}
        cols["sum_v"] = g.column(f"{value_col}_sum").cast(pa.float64())
        cols["n_rows"] = g.column("count_all").cast(pa.int64())
        return _with_shuffle_key_multi(pa.table(cols), group_cols)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(group_cols, as_index=False, dropna=False).agg(
            sum_v=("sum_v", "sum"), n_rows=("n_rows", "sum"))

    finest = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge)

    levels = []
    for r in range(len(group_cols), -1, -1):
        for keep in combinations(group_cols, r):
            if r == len(group_cols):
                g = finest.copy()
            elif keep:
                g = finest.groupby(list(keep), as_index=False,
                                   dropna=False).agg(
                    sum_v=("sum_v", "sum"), n_rows=("n_rows", "sum"))
            else:
                g = pd.DataFrame({"sum_v": [finest["sum_v"].sum()],
                                  "n_rows": [finest["n_rows"].sum()]})
            for c in group_cols:
                if c not in keep:
                    g[c] = None
            levels.append(g[[*group_cols, "sum_v", "n_rows"]])

    out = pd.concat(levels, ignore_index=True)
    out["n_rows"] = out["n_rows"].astype("int64")
    for c in group_cols:  # absent cells must be None, never NaN
        out[c] = out[c].astype(object).where(out[c].notna(), None)
    return out.reset_index(drop=True)


def grouping_sets_agg(ds, group_cols: list[str], value_col: str,
                      sets: list[list[str]]) -> pd.DataFrame:
    """``GROUP BY GROUPING SETS(sets)``: sum(value) + count(*) at each
    explicitly requested subset of ``group_cols`` (the general form
    ROLLUP and CUBE are sugar for), absent columns emitted as NULL.

    Same physical shape as ``rollup_agg``/``cube_agg``: one finest-level
    per-block combiner + ONE keyed shuffle produce the merged finest
    table; every requested set derives from it driver-side without
    touching the input again — so the cost is one pass + one shuffle
    regardless of how many sets are asked for. A duplicated set emits
    its rows twice (SQL parity). Shares ROLLUP's NULL caveat for group
    values."""
    known = set(group_cols)
    for s in sets:
        bad = [c for c in s if c not in known]
        if bad:
            raise ValueError(f"grouping set columns {bad} not in "
                             f"group_cols {group_cols}")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([*group_cols, value_col]) \
            .group_by(group_cols).aggregate([(value_col, "sum"),
                                             ([], "count_all")])
        cols = {c: g.column(c) for c in group_cols}
        cols["sum_v"] = g.column(f"{value_col}_sum").cast(pa.float64())
        cols["n_rows"] = g.column("count_all").cast(pa.int64())
        return _with_shuffle_key_multi(pa.table(cols), group_cols)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(group_cols, as_index=False, dropna=False).agg(
            sum_v=("sum_v", "sum"), n_rows=("n_rows", "sum"))

    finest = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge)

    levels = []
    for s in sets:
        keep = [c for c in group_cols if c in s]   # canonical order
        if keep == list(group_cols):
            g = finest.copy()
        elif keep:
            g = finest.groupby(keep, as_index=False, dropna=False).agg(
                sum_v=("sum_v", "sum"), n_rows=("n_rows", "sum"))
        else:
            g = pd.DataFrame({"sum_v": [finest["sum_v"].sum()],
                              "n_rows": [finest["n_rows"].sum()]})
        for c in group_cols:
            if c not in keep:
                g[c] = None
        levels.append(g[[*group_cols, "sum_v", "n_rows"]])

    out = pd.concat(levels, ignore_index=True)
    out["n_rows"] = out["n_rows"].astype("int64")
    for c in group_cols:  # absent cells must be None, never NaN
        out[c] = out[c].astype(object).where(out[c].notna(), None)
    return out.reset_index(drop=True)


def monotonic_violations(ds, key_col: str, order_col: str, val_col: str,
                         direction: str = "non_decreasing") -> pd.DataFrame:
    """Ordered-within-key expectation (GE's
    expect_column_values_to_be_increasing, per segment): within each
    key, ``val_col`` ordered by ``order_col`` must move in
    ``direction`` ('non_decreasing' | 'non_increasing' | 'increasing' |
    'decreasing'). Returns one row per key: (key, n_rows, n_violations,
    passed) where a violation is a consecutive pair breaking the rule
    (SQL ``lag()`` comparison semantics: a NULL value or NULL
    predecessor never counts as a violation; NULL order keys sort
    LAST, DuckDB window default).

    Ordering crosses block boundaries, so no per-block combiner exists:
    this is the honest keyed shuffle of a THREE-column projection (the
    table itself never moves), then one vectorized sort + diff per key
    — the lag_lead shape with a check verdict on top."""
    cmp = {"non_decreasing": np.less, "increasing": np.less_equal,
           "non_increasing": np.greater, "decreasing": np.greater_equal}
    if direction not in cmp:
        raise ValueError(f"monotonic_violations: unknown direction "
                         f"{direction!r}; one of {sorted(cmp)}")
    bad = cmp[direction]

    def project(batch: pa.Table) -> pa.Table:
        return _with_shuffle_key(batch.select([key_col, order_col, val_col]),
                                 key_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # ONE order-sort + ONE stable key-sort makes every key's rows
        # contiguous in order; consecutive-pair checks then vectorize
        # across ALL keys at once with a same-key mask
        codes, uniq = pd.factorize(df[key_col], use_na_sentinel=False)
        df = df.assign(__kc=codes) \
            .sort_values(order_col, kind="mergesort", na_position="last") \
            .sort_values("__kc", kind="mergesort")
        v = df[val_col].to_numpy(dtype=np.float64)
        kc = df["__kc"].to_numpy()
        with np.errstate(invalid="ignore"):
            pair_bad = bad(v[1:], v[:-1]) & (kc[1:] == kc[:-1])
        viol = np.bincount(kc[1:][pair_bad], minlength=len(uniq)) \
            .astype(np.int64)
        n_rows = np.bincount(kc, minlength=len(uniq)).astype(np.int64)
        out = pd.DataFrame({key_col: pd.Series(uniq),
                            "n_rows": n_rows, "n_violations": viol,
                            "passed": viol == 0})
        return _restore_null_keys(out, [key_col])

    out = _bucketed_merge(
        ds.map_batches(project, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    return out.sort_values(key_col).reset_index(drop=True)


def grouped_regression(ds, group_col: str, x_col: str,
                       y_col: str) -> pd.DataFrame:
    """Exact simple linear regression of ``y`` on ``x`` within each
    segment — SQL ``regr_slope(y, x)`` / ``regr_intercept`` /
    ``regr_r2`` semantics. Same physical shape (and the same six
    per-(block, segment) float64 partials) as ``grouped_correlation``:
    one keyed shuffle of tiny moment rows, exact merge, so the fit is
    identical no matter how blocks split.

      slope     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
      intercept = ȳ − slope·x̄
      r2        = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²)),
                  with SQL's edge rules: var(x)=0 → all NULL;
                  var(y)=0 → r2=1.

    Rows where either side is null are excluded (SQL pair semantics);
    a segment with zero valid pairs is omitted from the output (the
    keyed partials never see it — callers wanting SQL's NULL row for
    such segments should left-join against the segment list).
    Returns (group, n, slope, intercept, r2) sorted by group."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).cast(pa.float64())
        y = batch.column(y_col).cast(pa.float64())
        both = pc.and_(pc.is_valid(x), pc.is_valid(y))
        t = pa.table({group_col: batch.column(group_col), "x": x, "y": y}) \
            .filter(both)
        xv, yv = t.column("x"), t.column("y")
        b2 = pa.table({group_col: t.column(group_col), "x": xv, "y": yv,
                       "xx": pc.multiply(xv, xv), "yy": pc.multiply(yv, yv),
                       "xy": pc.multiply(xv, yv)})
        g = b2.group_by([group_col]).aggregate(
            [("x", "count"), ("x", "sum"), ("y", "sum"),
             ("xx", "sum"), ("yy", "sum"), ("xy", "sum")])
        return _with_shuffle_key(pa.table({
            group_col: g.column(group_col),
            "n": g.column("x_count").cast(pa.int64()),
            "sx": g.column("x_sum"), "sy": g.column("y_sum"),
            "sxx": g.column("xx_sum"), "syy": g.column("yy_sum"),
            "sxy": g.column("xy_sum")}), group_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(group_col, dropna=False, sort=False,
                         as_index=False).agg(
            n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
            sxx=("sxx", "sum"), syy=("syy", "sum"), sxy=("sxy", "sum"))
        n = agg["n"].to_numpy(np.float64)
        sx, sy = agg["sx"].to_numpy(np.float64), agg["sy"].to_numpy(np.float64)
        vx = n * agg["sxx"].to_numpy(np.float64) - sx * sx
        vy = n * agg["syy"].to_numpy(np.float64) - sy * sy
        cov = n * agg["sxy"].to_numpy(np.float64) - sx * sy
        ok = (n > 0) & (vx > 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = np.where(ok, cov / vx, np.nan)
            intercept = np.where(ok, (sy - slope * sx) / n, np.nan)
            r2 = np.where(ok & (vy == 0), 1.0,
                          np.where(ok, (cov * cov) / (vx * vy), np.nan))
        out = pd.DataFrame({group_col: agg[group_col],
                            "n": agg["n"].astype(np.int64),
                            "slope": slope, "intercept": intercept,
                            "r2": r2})
        return _restore_null_keys(out, [group_col])

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    key = out[group_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


def grouped_outliers_iqr(ds, group_col: str, val_col: str,
                         k: float = 1.5):
    """Per-segment ROBUST outlier rows — Tukey's fence: flag rows where
    ``val`` falls outside [q1 - k·IQR, q3 + k·IQR] of the row's OWN
    segment (the quantile-based dual of ``grouped_outliers``' mean/std
    z-fence, immune to the outliers inflating the fence itself).

    Two phases, like every fitted filter here: an EXACT per-segment
    q1/q3 fit via the mergeable value-histogram combiner
    (``quantiles.group_quantiles`` — only distinct (segment, value)
    rows per block enter the one keyed shuffle), then the segment ->
    fence table (|segments| rows) broadcasts via ``ray.put`` and a
    stateless vectorized filter emits only the violating rows. The
    table itself never shuffles. Rows with NULL value or NULL segment
    are never outliers (SQL comparison/join semantics). Returns a
    Dataset of the outlier rows + ``lo`` / ``hi`` fence columns."""
    import ray

    from .quantiles import group_quantiles

    q = group_quantiles(ds, group_col, val_col, qs=(0.25, 0.75))
    q = q[q[group_col].notna()]   # SQL join semantics: NULL segment
    q1 = q["q_25"].to_numpy(np.float64)
    q3 = q["q_75"].to_numpy(np.float64)
    iqr = q3 - q1
    fences = pa.table({
        group_col: pa.array(q[group_col]),
        "lo": pa.array(q1 - k * iqr, pa.float64()),
        "hi": pa.array(q3 + k * iqr, pa.float64())})
    ref = ray.put(fences)

    def flag(batch: pa.Table) -> pa.Table:
        f = ray.get(ref)
        idx = pc.index_in(batch.column(group_col),
                          value_set=f.column(group_col).combine_chunks())
        lo = f.column("lo").take(idx)
        hi = f.column("hi").take(idx)
        v = batch.column(val_col).cast(pa.float64())
        out = pc.or_(pc.less(v, lo), pc.greater(v, hi))
        batch = batch.append_column("lo", lo).append_column("hi", hi)
        return batch.filter(out)   # null mask (null v/segment) drops

    return ds.map_batches(flag, batch_format="pyarrow", batch_size=None)


def weighted_avg_per_group(ds, key_col: str, val_col: str,
                           weight_col: str) -> pd.DataFrame:
    """Exact weighted mean ``Σ(w·v)/Σw`` per key — the canonical
    algebraic combiner: each block collapses to (Σwv, Σw, n) per key
    (three float64s per block x key are the WHOLE exchange), one
    null-safe keyed shuffle, exact merge. Pairs where value OR weight
    is null are excluded (SQL ``sum(w*v)`` semantics); a group whose
    every pair is null yields NULL. Returns (key, wavg, n) sorted."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(val_col).cast(pa.float64())
        w = batch.column(weight_col).cast(pa.float64())
        both = pc.and_(pc.is_valid(v), pc.is_valid(w))
        zero = pa.scalar(0.0, pa.float64())
        t = pa.table({key_col: batch.column(key_col),
                      "wv": pc.if_else(both, pc.multiply(w, v), zero),
                      "w": pc.if_else(both, w, zero),
                      "ok": both.cast(pa.int64())})
        g = t.group_by([key_col]).aggregate(
            [("wv", "sum"), ("w", "sum"), ("ok", "sum")])
        return _with_shuffle_key(pa.table({
            key_col: g.column(key_col),
            "swv": g.column("wv_sum"), "sw": g.column("w_sum"),
            "n": g.column("ok_sum").cast(pa.int64())}), key_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(key_col, dropna=False, sort=False,
                         as_index=False).agg(swv=("swv", "sum"),
                                             sw=("sw", "sum"),
                                             n=("n", "sum"))
        n = agg["n"].to_numpy(np.int64)
        sw = agg["sw"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            wavg = np.where((n > 0) & (sw != 0),
                            agg["swv"].to_numpy(np.float64) / sw, np.nan)
        out = pd.DataFrame({key_col: agg[key_col], "wavg": wavg,
                            "n": n})
        return _restore_null_keys(out, [key_col])

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    key = out[key_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


_MAX_CONTINGENCY_CELLS = 1_000_000  # |A| x |B| guard for the driver table


def chi_square_independence(ds, col_a: str, col_b: str) -> dict:
    """Pearson chi-square test of independence between two categorical
    columns — the data-profiling "are these columns related" check
    (e.g. does `lang` depend on `source`). Rows with a NULL on either
    side are excluded.

    Scale shape: the contingency table is built with the distinct-pair
    combiner (each block collapses to its (a, b) counts; only those
    partials move in ONE keyed shuffle), and only the merged |A|x|B|
    table — bounded by category-product, guarded — reaches the driver,
    where the statistic is evaluated over the FULL cross product
    (empty cells contribute their expected count, as the test
    requires). Returns {chi2, dof, n, cramers_v, n_a, n_b}."""
    from ..tuning import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([col_a, col_b])
        t = t.filter(pc.and_(pc.is_valid(t.column(col_a)),
                             pc.is_valid(t.column(col_b))))
        g = t.group_by([col_a, col_b]).aggregate([([], "count_all")])
        out = pa.table({col_a: g.column(col_a), col_b: g.column(col_b),
                        "cnt": g.column("count_all").cast(pa.int64())})
        k = pc.binary_join_element_wise(
            pc.cast(out.column(col_a), pa.string()),
            pc.cast(out.column(col_b), pa.string()), "\0")
        return out.append_column("__gkey", k)

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby([col_a, col_b], dropna=False, sort=False,
                         as_index=False)["cnt"].sum()
        out["cnt"] = out["cnt"].astype(np.int64)
        return _restore_null_keys(out, [col_a, col_b])

    cells = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        per_cell)
    mat = cells.pivot_table(index=col_a, columns=col_b, values="cnt",
                            aggfunc="sum", fill_value=0).to_numpy(np.float64)
    if mat.size > _MAX_CONTINGENCY_CELLS:
        raise ValueError(
            f"chi_square_independence: contingency has {mat.size} cells — "
            f"these columns are not low-cardinality categoricals")
    n = mat.sum()
    ra = mat.sum(axis=1, keepdims=True)
    cb = mat.sum(axis=0, keepdims=True)
    dof = (mat.shape[0] - 1) * (mat.shape[1] - 1)
    if n == 0 or dof == 0:
        return {"chi2": float("nan"), "dof": int(dof), "n": int(n),
                "cramers_v": float("nan"),
                "n_a": mat.shape[0], "n_b": mat.shape[1]}
    exp = ra @ cb / n
    chi2 = float(((mat - exp) ** 2 / exp).sum())
    v = float(np.sqrt(chi2 / (n * min(mat.shape[0] - 1,
                                      mat.shape[1] - 1))))
    return {"chi2": chi2, "dof": int(dof), "n": int(n), "cramers_v": v,
            "n_a": mat.shape[0], "n_b": mat.shape[1]}


def anova_f(ds, group_col: str, val_col: str) -> pd.DataFrame:
    """One-way ANOVA F-test of a numeric column against a categorical —
    the numeric-vs-categorical member of the profiling triad
    (chi-square = cat/cat, Pearson = num/num). Pairs with a null value
    are excluded; groups are the distinct non-null categories.

    Scale shape: the algebraic combiner — each block collapses to
    (n, Σv, Σv²) per category, one keyed shuffle over category-sized
    partials, and the F statistic assembles on the driver from k
    3-tuples. Returns one row (f_stat, df_between, df_within, k, n);
    f_stat is NULL when a degree of freedom is empty or SSW is 0."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(val_col).cast(pa.float64())
        ok = pc.and_(pc.is_valid(v), pc.is_valid(batch.column(group_col)))
        t = pa.table({group_col: batch.column(group_col),
                      "v": v}).filter(ok)
        g = t.group_by([group_col]).aggregate(
            [("v", "count"), ("v", "sum")])
        sq = pa.table({group_col: t.column(group_col),
                       "vv": pc.multiply(t.column("v"), t.column("v"))}) \
            .group_by([group_col]).aggregate([("vv", "sum")])
        j = g.join(sq, keys=[group_col])
        return pa.table({group_col: j.column(group_col),
                         "n": j.column("v_count").cast(pa.int64()),
                         "s": j.column("v_sum"),
                         "ss": j.column("vv_sum")})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:   # empty/all-null input: Ray drops the columns
        parts = pd.DataFrame({group_col: pd.Series([], dtype=object),
                              "n": pd.Series([], dtype="int64"),
                              "s": pd.Series([], dtype="float64"),
                              "ss": pd.Series([], dtype="float64")})
    g = parts.groupby(group_col, as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum"))
    k, n = len(g), int(g["n"].sum())
    out = {"f_stat": np.nan, "df_between": max(k - 1, 0),
           "df_within": max(n - k, 0), "k": k, "n": n}
    if k >= 2 and n > k:
        grand = float(g["s"].sum()) / n
        ssb = float((g["n"] * (g["s"] / g["n"] - grand) ** 2).sum())
        ssw = float((g["ss"] - g["s"] ** 2 / g["n"]).sum())
        if ssw > 0:
            f = (ssb / (k - 1)) / (ssw / (n - k))
            out["f_stat"] = np.floor(f * 1e6 + 0.5) / 1e6
    df = pd.DataFrame([out])
    for c in ("df_between", "df_within", "k", "n"):
        df[c] = df[c].astype("int64")
    return df


def target_encode_loo(ds, key_col: str, val_col: str):
    """Leave-one-out target (mean) encoding: each row's category is
    replaced by the mean of the TARGET over the other rows of its
    category — ``(Σ_g v - v) / (n_g - 1)`` — the standard leakage-free
    mean encoder for categorical features. Rows with a null target, or
    in a singleton category, encode to NULL (SQL window semantics).

    Scale shape: one keyed combiner fits the dimension-sized
    (category -> Σv, n) table, broadcast once via ``ray.put``; encoding
    is a stateless vectorized map — no shuffle of the data rows.
    Appends ``te`` (float64, rounded to 6) to the input columns."""
    import ray

    def fit_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(val_col).cast(pa.float64())
        t = pa.table({key_col: batch.column(key_col), "v": v}) \
            .filter(pc.is_valid(v))
        g = t.group_by([key_col]).aggregate([("v", "sum"), ("v", "count")])
        return pa.table({key_col: g.column(key_col),
                         "s": g.column("v_sum"),
                         "n": g.column("v_count").cast(pa.int64())})

    parts = ds.map_batches(fit_partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        parts = pd.DataFrame({key_col: pd.Series([], dtype=object),
                              "s": pd.Series([], dtype="float64"),
                              "n": pd.Series([], dtype="int64")})
    fit = parts.groupby(key_col, as_index=False).agg(
        s=("s", "sum"), n=("n", "sum"))
    if len(fit) > 5_000_000:
        raise ValueError(
            f"{len(fit)} categories — too many to broadcast; shuffle-"
            f"join rows against the (category, sum, n) table instead")
    stats = {r[0]: (r[1], r[2]) for r in
             fit.itertuples(index=False, name=None)}
    ref = ray.put(stats)

    def encode(batch: pa.Table) -> pa.Table:
        stats = ray.get(ref)
        keys = np.asarray(batch.column(key_col).to_pylist(), dtype=object)
        v = batch.column(val_col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        # one lookup per DISTINCT category, scattered back
        uniq, inv = np.unique(keys, return_inverse=True)
        s = np.array([stats.get(c, (np.nan, 0))[0] for c in uniq])[inv]
        n = np.array([stats.get(c, (np.nan, 0))[1] for c in uniq],
                     np.float64)[inv]
        with np.errstate(invalid="ignore", divide="ignore"):
            te = (s - v) / (n - 1.0)
        te = np.where((n > 1) & ~np.isnan(v), te, np.nan)
        te = np.sign(te) * np.floor(np.abs(te) * 1e6 + 0.5) / 1e6
        return batch.append_column("te", pa.array(te, pa.float64()))

    return ds.map_batches(encode, batch_format="pyarrow", batch_size=None)


def mutual_information(ds, col_a: str, col_b: str) -> pd.DataFrame:
    """Mutual information (nats) and normalized MI between two
    categorical columns — the information-theoretic sibling of
    ``chi_square_independence`` (same question, sensitive to any
    dependence structure rather than linear-in-counts deviations).
    Rows with a NULL on either side are excluded.

    Scale shape: identical to chi2 — the distinct-pair combiner builds
    the contingency partials, ONE keyed shuffle merges them, and only
    the |A|x|B| cell table (guarded) reaches the driver, where
    ``MI = Σ p_ab ln(p_ab / (p_a p_b))`` is evaluated (empty cells
    contribute 0 by the 0·ln0 convention). NMI = MI/sqrt(H(A)H(B)).
    Returns one row (mi, nmi, h_a, h_b, n), rounded to 6."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([col_a, col_b])
        t = t.filter(pc.and_(pc.is_valid(t.column(col_a)),
                             pc.is_valid(t.column(col_b))))
        g = t.group_by([col_a, col_b]).aggregate([([], "count_all")])
        out = pa.table({col_a: g.column(col_a), col_b: g.column(col_b),
                        "cnt": g.column("count_all").cast(pa.int64())})
        k = pc.binary_join_element_wise(
            pc.cast(out.column(col_a), pa.string()),
            pc.cast(out.column(col_b), pa.string()), "\0")
        return out.append_column("__gkey", k)

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby([col_a, col_b], dropna=False, sort=False,
                         as_index=False)["cnt"].sum()
        out["cnt"] = out["cnt"].astype(np.int64)
        return _restore_null_keys(out, [col_a, col_b])

    cells = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        per_cell)
    if len(cells) > _MAX_CONTINGENCY_CELLS:
        raise ValueError(
            f"mutual_information: contingency has {len(cells)} cells — "
            f"these columns are not low-cardinality categoricals")
    n = int(cells["cnt"].sum()) if not cells.empty else 0
    row = {"mi": np.nan, "nmi": np.nan, "h_a": np.nan, "h_b": np.nan,
           "n": n}
    if n > 0:
        pab = cells["cnt"].to_numpy(np.float64) / n
        pa_ = cells.groupby(col_a)["cnt"].transform("sum") \
            .to_numpy(np.float64) / n
        pb_ = cells.groupby(col_b)["cnt"].transform("sum") \
            .to_numpy(np.float64) / n
        mi = float((pab * np.log(pab / (pa_ * pb_))).sum())
        ma = cells.groupby(col_a)["cnt"].sum().to_numpy(np.float64) / n
        mb = cells.groupby(col_b)["cnt"].sum().to_numpy(np.float64) / n
        h_a = float(-(ma * np.log(ma)).sum())
        h_b = float(-(mb * np.log(mb)).sum())
        denom = np.sqrt(h_a * h_b)
        r6 = lambda x: float(np.floor(abs(x) * 1e6 + 0.5) / 1e6
                             * (1 if x >= 0 else -1))
        row.update(mi=r6(mi), h_a=r6(h_a), h_b=r6(h_b),
                   nmi=r6(mi / denom) if denom > 0 else np.nan)
    df = pd.DataFrame([row])
    df["n"] = df["n"].astype("int64")
    return df


def fd_violations(ds, det_cols: list[str], dep_col: str) -> pd.DataFrame:
    """Functional-dependency profiling: keys of ``det_cols`` that map
    to MORE than one distinct non-null ``dep_col`` value — the "A
    should determine B" data-quality check (e.g. one (repo, path)
    should have one language). Returns one row per violating key with
    its distinct-value count, sorted.

    Scale shape: the distinct-pair combiner — each block collapses to
    its distinct (det..., dep) tuples, ONE keyed shuffle over those
    partials, and each reduce partition counts distinct deps per key
    and emits only violators (usually a tiny fraction)."""

    def partial(batch: pa.Table) -> pa.Table:
        cols = det_cols + [dep_col]
        t = batch.select(cols).filter(
            pc.is_valid(batch.column(dep_col)))
        g = t.group_by(cols).aggregate([([], "count_all")])
        out = g.drop_columns(["count_all"])
        key = pc.cast(out.column(det_cols[0]), pa.string())
        for c in det_cols[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(out.column(c), pa.string()), "\x1f")
        return out.append_column("__gkey", pc.fill_null(key, "\0null"))

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # distinct (det..., dep) partials may repeat across blocks —
        # dedup, count deps per key vectorized, keep only violators
        uniq = df.drop_duplicates(det_cols + [dep_col])
        nd = uniq.groupby(det_cols, dropna=False, sort=False,
                          as_index=False).size() \
            .rename(columns={"size": "n_distinct"})
        out = nd[nd["n_distinct"] > 1].copy()
        out["n_distinct"] = out["n_distinct"].astype(np.int64)
        return _restore_null_keys(out.reset_index(drop=True), det_cols)

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    if out.empty:     # no violators: Ray drops columns on empty output
        out = pd.DataFrame({c: pd.Series([], dtype=object)
                            for c in det_cols} |
                           {"n_distinct": pd.Series([], dtype="int64")})
    return out.sort_values(det_cols).reset_index(drop=True)


def mann_whitney_auc(ds, score_col: str, label_col: str) -> pd.DataFrame:
    """ROC AUC of a numeric score against a binary label via the
    Mann-Whitney rank-sum identity with mid-rank tie handling:
    ``AUC = (Σ_pos midrank - n_pos(n_pos+1)/2) / (n_pos · n_neg)`` —
    the standard label-vs-score diagnostic for curation/quality scores
    (e.g. "does the quality score actually separate kept from dropped
    docs?"). Rows with a NULL score or label are excluded.

    Scale shape: order statistics WITHOUT a global sort — each block
    collapses to per-distinct-score (n_pos, n_total) counts (the
    value-grouped combiner, same family as ``histogram_fixed``); only
    those partials reach the driver, which sorts the distinct-score
    table and assembles mid-ranks with one cumulative pass. Driver
    state is O(distinct scores), guarded — at 100 TB you quantize the
    score first (the standard streaming-AUC move), which this shape
    makes explicit. Returns one row (auc, n_pos, n_neg, n_scores);
    auc is NULL when either class is empty."""

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(score_col).cast(pa.float64())
        y = batch.column(label_col).cast(pa.int64())
        t = pa.table({"s": s, "y": y}).filter(
            pc.and_(pc.is_valid(s), pc.is_valid(y)))
        g = t.group_by(["s"]).aggregate([("y", "sum"), ("y", "count")])
        return pa.table({"s": g.column("s"),
                         "pos": g.column("y_sum").cast(pa.int64()),
                         "n": g.column("y_count").cast(pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:   # empty/all-null input: Ray drops the columns
        parts = pd.DataFrame({"s": pd.Series([], dtype="float64"),
                              "pos": pd.Series([], dtype="int64"),
                              "n": pd.Series([], dtype="int64")})
    g = parts.groupby("s", as_index=False).agg(pos=("pos", "sum"),
                                               n=("n", "sum"))
    if len(g) > _MAX_CONTINGENCY_CELLS:
        raise ValueError(
            f"mann_whitney_auc: {len(g)} distinct scores — quantize the "
            f"score column before computing AUC at this cardinality")
    g = g.sort_values("s", kind="mergesort")
    n = g["n"].to_numpy(np.int64)
    pos = g["pos"].to_numpy(np.int64)
    n_pos = int(pos.sum())
    n_neg = int(n.sum() - n_pos)
    out = {"auc": np.nan, "n_pos": n_pos, "n_neg": n_neg,
           "n_scores": len(g)}
    if n_pos > 0 and n_neg > 0:
        cum_before = np.concatenate(([0], np.cumsum(n)[:-1]))
        midrank = cum_before + (n + 1) / 2.0
        rank_sum = float((pos * midrank).sum())
        auc = (rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
        out["auc"] = np.floor(auc * 1e6 + 0.5) / 1e6
    df = pd.DataFrame([out])
    for c in ("n_pos", "n_neg", "n_scores"):
        df[c] = df[c].astype("int64")
    return df


def benford_profile(ds, col: str) -> pd.DataFrame:
    """Leading-digit (Benford's law) profile of a positive numeric
    column — the classic fabricated-/synthetic-data smell test for
    amount-like fields. The leading digit is computed numerically
    (``floor(x / 10^floor(log10 x))``, no string formatting) over
    finite values > 0; ``exp_p`` is Benford's ``log10(1 + 1/d)``.

    Scale shape: each block collapses to a 9-bin count vector (pure
    numpy, one pass); only 9-row partials leave the blocks and the
    driver sums them — the cheapest possible combiner. Returns one row
    per OBSERVED digit (digit, n, obs_p, exp_p) plus a ``chi2`` column
    (identical in every row): Pearson goodness-of-fit over all nine
    Benford bins, with absent digits contributing their full expected
    count."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        x = x[np.isfinite(x) & (x > 0)]
        d = np.floor(x / np.power(10.0, np.floor(np.log10(x))))
        cnt = np.bincount(d.astype(np.int64), minlength=10)[1:10]
        return pa.table({"digit": np.arange(1, 10, dtype=np.int64),
                         "n": cnt.astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        parts = pd.DataFrame({"digit": pd.Series([], dtype="int64"),
                              "n": pd.Series([], dtype="int64")})
    g = parts.groupby("digit", as_index=False).agg(n=("n", "sum"))
    full = pd.DataFrame({"digit": np.arange(1, 10, dtype=np.int64)}) \
        .merge(g, on="digit", how="left").fillna({"n": 0})
    cnt = full["n"].to_numpy(np.int64)
    total = int(cnt.sum())
    exp_p = np.log10(1.0 + 1.0 / np.arange(1, 10))
    if total == 0:
        return pd.DataFrame({"digit": pd.Series([], dtype="int64"),
                             "n": pd.Series([], dtype="int64"),
                             "obs_p": pd.Series([], dtype="float64"),
                             "exp_p": pd.Series([], dtype="float64"),
                             "chi2": pd.Series([], dtype="float64")})
    obs_p = cnt / total
    chi2 = float((total * (obs_p - exp_p) ** 2 / exp_p).sum())
    out = pd.DataFrame({
        "digit": np.arange(1, 10, dtype=np.int64),
        "n": cnt,
        "obs_p": np.floor(obs_p * 1e6 + 0.5) / 1e6,
        "exp_p": np.floor(exp_p * 1e6 + 0.5) / 1e6,
        "chi2": np.floor(chi2 * 1e6 + 0.5) / 1e6,
    })
    return out[out["n"] > 0].reset_index(drop=True)


def cooccurrence_pairs(ds, group_col: str, item_col: str, top: int = 20,
                       max_items: int = 10_000) -> pd.DataFrame:
    """Market-basket co-occurrence: for every unordered pair of
    distinct items appearing in the same group (parts in an order,
    tokens in a doc, repos touched by a user), the number of groups
    containing both — the input to association-rule / "frequently
    bought together" mining. Null items are ignored.

    Scale shape: (1) per-block distinct-(group,item) combiner so the
    ONE keyed shuffle moves a deduplicated 2-column projection; (2)
    vectorized triu pair emission per group — a group with g items
    emits C(g,2) pairs, so a group exceeding ``max_items`` fails loud
    (cap/salt hot baskets upstream; silent truncation would skew
    counts); (3) pair counts fold through a second keyed shuffle of
    per-block count partials; (4) only per-block top-``top`` partials
    reach the driver (the ``topk_per_group`` merge shape). Returns
    (part_a, part_b, n_groups) ordered by count desc with
    deterministic (a, b) tiebreaks."""
    from ..tuning import shuffle_partitions

    def distinct_partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, item_col]).filter(
            pc.and_(pc.is_valid(batch.column(group_col)),
                    pc.is_valid(batch.column(item_col))))
        return _with_shuffle_key(
            t.group_by([group_col, item_col]).aggregate([]), group_col)

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # ALL of a bucket's groups at once: item-sort makes each
        # group's distinct items a sorted contiguous run; pairing row i
        # with its k-th successor (same group) sweeps k = 1..max_run —
        # the Python loop count is the LARGEST basket size, never the
        # group count, and every step is a whole-bucket array slice
        df = df.drop_duplicates([group_col, item_col]) \
            .sort_values(item_col, kind="mergesort") \
            .sort_values(group_col, kind="mergesort")
        items = df[item_col].to_numpy()
        grp = df[group_col].to_numpy()
        sizes = df.groupby(group_col, sort=False).size()
        gmax = int(sizes.max()) if len(sizes) else 0
        if gmax > max_items:
            hot = sizes.idxmax()
            raise ValueError(
                f"cooccurrence_pairs: group {hot!r} has "
                f"{gmax} distinct items (> max_items={max_items}) — "
                f"emitting C(g,2) pairs for it would explode; cap or salt "
                f"hot groups upstream")
        outs_a, outs_b = [], []
        for step in range(1, gmax):
            same = grp[:-step] == grp[step:]
            if not same.any():
                break
            outs_a.append(items[:-step][same])
            outs_b.append(items[step:][same])
        if not outs_a:
            return pd.DataFrame({"a": pd.Series([], dtype=items.dtype),
                                 "b": pd.Series([], dtype=items.dtype)})
        return pd.DataFrame({"a": np.concatenate(outs_a),
                             "b": np.concatenate(outs_b)})

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["a", "b"]).aggregate([([], "count_all")])
        out = pa.table({"a": g.column("a"), "b": g.column("b"),
                        "n": g.column("count_all").cast(pa.int64())})
        k = pc.binary_join_element_wise(
            pc.cast(out.column("a"), pa.string()),
            pc.cast(out.column("b"), pa.string()), "\x1f")
        return out.append_column("__gkey", k)

    def merge_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["a", "b"], dropna=False, sort=False,
                         as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    def top_partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["a", "b", "n"]).to_pandas()
        df = df.sort_values(["n", "a", "b"],
                            ascending=[False, True, True],
                            kind="mergesort").head(top)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    pairs = _bucketed_merge_ds(
        ds.map_batches(distinct_partial, batch_format="pyarrow",
                       batch_size=None), emit_pairs)
    counts = (_bucketed_merge_ds(
        pairs.map_batches(count_partial, batch_format="pyarrow",
                          batch_size=None), merge_counts)
        .map_batches(top_partial, batch_format="pyarrow",
                     batch_size=None)
        .to_pandas())
    if counts.empty:
        return pd.DataFrame({"a": pd.Series([], dtype=object),
                             "b": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    return counts.sort_values(["n", "a", "b"],
                              ascending=[False, True, True],
                              kind="mergesort").head(top) \
        .reset_index(drop=True)


def gini_coefficient(ds, col: str) -> pd.DataFrame:
    """Gini coefficient of a nonnegative value distribution —
    ``G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n`` over the ascending-sorted
    values — the inequality/concentration diagnostic ("do 1% of
    customers carry 80% of revenue?", "is the corpus dominated by a few
    sources?"). NULLs are excluded; tie order does not affect the
    statistic (equal values permute equal contributions).

    Scale shape: order statistics WITHOUT a global sort — the same
    value-grouped count combiner as ``mann_whitney_auc``: each block
    collapses to per-distinct-value (count, weight-sum) rows, only
    those partials reach the driver, which sorts the distinct-value
    table once and evaluates the rank sum per run in closed form
    (Σ i over a tie run of length c starting at s is c·(2s+c−1)/2).
    Driver state is O(distinct values), guarded — quantize first at
    higher cardinality. Returns one row (gini, n); NULL when n = 0 or
    Σx = 0."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col).cast(pa.float64())
        t = pa.table({"x": x}).filter(pc.is_valid(x))
        g = t.group_by(["x"]).aggregate([("x", "count")])
        return pa.table({"x": g.column("x"),
                         "n": g.column("x_count").cast(pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        parts = pd.DataFrame({"x": pd.Series([], dtype="float64"),
                              "n": pd.Series([], dtype="int64")})
    g = parts.groupby("x", as_index=False).agg(n=("n", "sum"))
    if len(g) > _MAX_CONTINGENCY_CELLS:
        raise ValueError(
            f"gini_coefficient: {len(g)} distinct values — quantize the "
            f"column before computing Gini at this cardinality")
    g = g.sort_values("x", kind="mergesort")
    cnt = g["n"].to_numpy(np.int64)
    val = g["x"].to_numpy(np.float64)
    n = int(cnt.sum())
    total = float((val * cnt).sum())
    gini = np.nan
    if n > 0 and total != 0.0:
        start = 1 + np.concatenate(([0], np.cumsum(cnt)[:-1]))
        rank_sums = cnt * (2 * start + cnt - 1) / 2.0
        s = float((val * rank_sums).sum())
        gini = 2.0 * s / (n * total) - (n + 1.0) / n
    out = pd.DataFrame({"gini": [gini], "n": np.array([n], np.int64)})
    return out


def weighted_median_per_group(ds, group_col: str, val_col: str,
                              weight_col: str) -> pd.DataFrame:
    """Lower weighted median per group: the smallest value whose
    cumulative weight (values ascending) reaches half the group's total
    weight — the robust center for weighted populations (price weighted
    by volume, score weighted by tokens). Rows with a NULL value or
    NULL weight are excluded.

    Scale shape: per-block (group, value) weight-sum combiner — the
    exchange carries each block's DISTINCT (group, value) pairs, never
    raw rows — then ONE keyed shuffle; each group sorts its distinct
    values once and takes a single cumulative pass. Per-group state is
    O(distinct values within the group). Returns
    (group, wmedian, total_w, n) sorted by group; wmedian is NULL when
    the total weight is not positive."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(val_col).cast(pa.float64())
        w = batch.column(weight_col).cast(pa.float64())
        t = pa.table({group_col: batch.column(group_col), "v": v, "w": w}) \
            .filter(pc.and_(pc.is_valid(v), pc.is_valid(w)))
        g = t.group_by([group_col, "v"]).aggregate(
            [("w", "sum"), ("w", "count")])
        return _with_shuffle_key(pa.table({
            group_col: g.column(group_col), "v": g.column("v"),
            "w": g.column("w_sum"),
            "n": g.column("w_count").cast(pa.int64())}), group_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # merge duplicate (group, value) partials, value-sort the whole
        # bucket with groups contiguous (factorize codes — dtype-safe),
        # then ONE within-group cumulative pass: the first row whose
        # running weight reaches half the group total is the lower
        # weighted median — all array ops, no per-key Python
        m = df.groupby([group_col, "v"], dropna=False, sort=False,
                       as_index=False).agg(w=("w", "sum"), n=("n", "sum"))
        codes, _u = pd.factorize(m[group_col], use_na_sentinel=False)
        m = m.assign(__kc=codes).sort_values("v", kind="mergesort") \
            .sort_values("__kc", kind="mergesort")
        kc = m["__kc"].to_numpy()
        first = np.r_[True, kc[1:] != kc[:-1]] if len(m) \
            else np.zeros(0, bool)
        run = np.cumsum(first) - 1            # dense group ordinal
        g = m.groupby("__kc", sort=False)
        cw = g["w"].cumsum().to_numpy(np.float64)
        tot_row = g["w"].transform("sum").to_numpy(np.float64)
        half = cw >= tot_row / 2.0
        G = int(run[-1]) + 1 if len(m) else 0
        med = np.full(G, np.nan)
        if G:
            pos = pd.Series(np.arange(len(m))[half]) \
                .groupby(run[half]).min()
            med[pos.index.to_numpy()] = \
                m["v"].to_numpy(np.float64)[pos.to_numpy()]
        tot_g = tot_row[first]
        med = np.where(tot_g > 0, med, np.nan)
        n_g = np.bincount(run, weights=m["n"].to_numpy(np.float64),
                          minlength=G).astype(np.int64)
        out = pd.DataFrame({group_col: m[group_col].to_numpy()[first],
                            "wmedian": med, "total_w": tot_g, "n": n_g})
        return _restore_null_keys(out, [group_col])

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    if out.empty:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "wmedian": pd.Series([], dtype="float64"),
                             "total_w": pd.Series([], dtype="float64"),
                             "n": pd.Series([], dtype="int64")})
    key = out[group_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


def grouped_log_means(ds, group_col: str, val_col: str) -> pd.DataFrame:
    """Geometric and harmonic means per group — the multiplicative and
    rate-averaging centers (growth factors, per-token rates) that the
    arithmetic mean gets wrong: ``geo = exp(Σln x / n)``,
    ``harm = n / Σ(1/x)``. Only strictly positive values participate
    (ln/reciprocal domain — SQL ``WHERE x > 0`` parity); groups with no
    positive values never surface.

    Scale shape: a pure algebraic combiner — each block folds to
    (n, Σln x, Σ1/x) per group, ONE keyed shuffle of KB-sized partials,
    closed-form merge. Returns (group, n, geomean, harmmean) sorted by
    group."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(val_col).cast(pa.float64())
        t = pa.table({group_col: batch.column(group_col), "x": x}) \
            .filter(pc.and_(pc.is_valid(x), pc.greater(x, 0.0)))
        b2 = pa.table({group_col: t.column(group_col),
                       "lnx": pc.ln(t.column("x")),
                       "rx": pc.divide(1.0, t.column("x"))})
        g = b2.group_by([group_col]).aggregate(
            [("lnx", "count"), ("lnx", "sum"), ("rx", "sum")])
        return _with_shuffle_key(pa.table({
            group_col: g.column(group_col),
            "n": g.column("lnx_count").cast(pa.int64()),
            "sln": g.column("lnx_sum"), "srx": g.column("rx_sum")}),
            group_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(group_col, dropna=False, sort=False,
                         as_index=False).agg(n=("n", "sum"),
                                             sln=("sln", "sum"),
                                             srx=("srx", "sum"))
        n = agg["n"].to_numpy(np.float64)
        out = pd.DataFrame({
            group_col: agg[group_col],
            "n": agg["n"].astype(np.int64),
            "geomean": np.exp(agg["sln"].to_numpy(np.float64) / n),
            "harmmean": n / agg["srx"].to_numpy(np.float64)})
        return _restore_null_keys(out, [group_col])

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    if out.empty:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64"),
                             "geomean": pd.Series([], dtype="float64"),
                             "harmmean": pd.Series([], dtype="float64")})
    key = out[group_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


def theil_index_per_group(ds, group_col: str, val_col: str) -> pd.DataFrame:
    """Theil T inequality index per group —
    ``T = Σ (x/μ)·ln(x/μ) / n = Σ x·ln x / (n·μ) − ln μ`` — the
    entropy-based concentration measure that, unlike Gini, DECOMPOSES
    additively into within-group + between-group terms, which is why
    corpus-mix audits use it. Only strictly positive values participate
    (ln domain; SQL ``WHERE x > 0`` parity). T = 0 means perfect
    equality, ln n is the maximum.

    Scale shape: a pure algebraic combiner — (n, Σx, Σ x·ln x) per
    group per block, ONE keyed shuffle of KB-sized partials, closed
    form on the merged sums (contrast with ``gini_coefficient``, which
    needs the distinct-value histogram). Returns (group, n, theil)
    sorted by group."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(val_col).cast(pa.float64())
        t = pa.table({group_col: batch.column(group_col), "x": x}) \
            .filter(pc.and_(pc.is_valid(x), pc.greater(x, 0.0)))
        b2 = pa.table({group_col: t.column(group_col),
                       "x": t.column("x"),
                       "xlnx": pc.multiply(t.column("x"),
                                           pc.ln(t.column("x")))})
        g = b2.group_by([group_col]).aggregate(
            [("x", "count"), ("x", "sum"), ("xlnx", "sum")])
        return _with_shuffle_key(pa.table({
            group_col: g.column(group_col),
            "n": g.column("x_count").cast(pa.int64()),
            "sx": g.column("x_sum"), "sxlnx": g.column("xlnx_sum")}),
            group_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(group_col, dropna=False, sort=False,
                         as_index=False).agg(n=("n", "sum"),
                                             sx=("sx", "sum"),
                                             sxlnx=("sxlnx", "sum"))
        n = agg["n"].to_numpy(np.float64)
        mu = agg["sx"].to_numpy(np.float64) / n
        out = pd.DataFrame({
            group_col: agg[group_col],
            "n": agg["n"].astype(np.int64),
            "theil": agg["sxlnx"].to_numpy(np.float64) / (n * mu)
            - np.log(mu)})
        return _restore_null_keys(out, [group_col])

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    if out.empty:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64"),
                             "theil": pd.Series([], dtype="float64")})
    key = out[group_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


def corr_matrix(ds, cols: list[str]) -> pd.DataFrame:
    """Pairwise Pearson correlation matrix over k numeric columns in
    ONE pass — the feature-redundancy screen before model training
    ("price and quantity carry the same signal"). Listwise-complete:
    rows with a NULL in ANY of the columns are excluded, so every pair
    sees the same n (SQL parity via ``WHERE all IS NOT NULL``).

    Scale shape: a single algebraic combiner carrying k sums, k sums of
    squares, and k·(k−1)/2 cross sums per block (one row of ~k² floats,
    no shuffle — the driver folds the block partials); degenerate
    columns (zero variance) yield NULL against every partner. Returns
    the upper triangle (col_a, col_b, corr, n) sorted by (col_a,
    col_b)."""
    if len(cols) < 2:
        raise ValueError(f"corr_matrix needs >= 2 columns, got {cols}")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]

    def partial(batch: pa.Table) -> pa.Table:
        arrs = {c: batch.column(c).cast(pa.float64()) for c in cols}
        ok = None
        for c in cols:
            v = pc.is_valid(arrs[c])
            ok = v if ok is None else pc.and_(ok, v)
        X = np.stack([arrs[c].filter(ok).to_numpy(zero_copy_only=False)
                      for c in cols])
        out = {"n": pa.array([X.shape[1]], pa.int64())}
        for i, c in enumerate(cols):
            out[f"s_{c}"] = pa.array([X[i].sum()])
            out[f"ss_{c}"] = pa.array([(X[i] * X[i]).sum()])
        for a, b in pairs:
            ia, ib = cols.index(a), cols.index(b)
            out[f"x_{a}__{b}"] = pa.array([(X[ia] * X[ib]).sum()])
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    n = int(parts["n"].sum())
    rows = []
    for a, b in pairs:
        corr = np.nan
        if n >= 2:
            sa, sb = float(parts[f"s_{a}"].sum()), float(parts[f"s_{b}"].sum())
            ssa = float(parts[f"ss_{a}"].sum())
            ssb = float(parts[f"ss_{b}"].sum())
            sab = float(parts[f"x_{a}__{b}"].sum())
            den2 = (n * ssa - sa * sa) * (n * ssb - sb * sb)
            if den2 > 0:
                corr = (n * sab - sa * sb) / np.sqrt(den2)
        rows.append({"col_a": a, "col_b": b, "corr": corr, "n": n})
    out = pd.DataFrame(rows).sort_values(["col_a", "col_b"],
                                         kind="mergesort")
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def partial_corr(ds, x_col: str, y_col: str, z_col: str) -> pd.DataFrame:
    """First-order partial Pearson correlation of (x, y) CONTROLLING
    for z — 'does price still track quantity once discount is held
    fixed', the confounder screen plain correlation can't answer:

        r_xy.z = (r_xy − r_xz·r_yz) / sqrt((1−r_xz²)(1−r_yz²))

    Listwise-complete over the three columns (same n for every pair —
    the precondition for the formula). Scale shape = ``corr_matrix``'s
    single algebraic combiner pass (one ~9-float partial per block, no
    shuffle); the formula itself is driver arithmetic on the 3 pair
    correlations. Degenerate inputs (any zero-variance column, or
    |r_xz| = 1 / |r_yz| = 1) yield NULL. Returns one row
    (n, r_xy, r_xy_z)."""
    cm = corr_matrix(ds, [x_col, y_col, z_col])
    look = {(r.col_a, r.col_b): r.corr for r in cm.itertuples()}

    def get(a, b):
        return look.get((a, b), look.get((b, a), np.nan))

    rxy, rxz = get(x_col, y_col), get(x_col, z_col)
    ryz = get(y_col, z_col)
    n = int(cm["n"].iloc[0]) if len(cm) else 0
    den2 = (1.0 - rxz * rxz) * (1.0 - ryz * ryz)
    p = ((rxy - rxz * ryz) / np.sqrt(den2)
         if np.isfinite(den2) and den2 > 0 else np.nan)
    return pd.DataFrame({"n": np.array([n], np.int64),
                         "r_xy": [float(rxy) if np.isfinite(rxy)
                                  else np.nan],
                         "r_xy_z": [float(p) if np.isfinite(p)
                                    else np.nan]})


def ks_two_sample(ds, group_col: str, val_col: str, a, b) -> pd.DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between segments
    ``a`` and ``b``: ``sup |CDF_a(x) − CDF_b(x)|`` over the merged
    value domain — the distribution-shift test evaluated EXACTLY, the
    ground-truth complement to the histogram-sketch KS the drift checks
    use (state/histogram.py::ks_from_counts). NULL values excluded.

    Scale shape: one two-sided value-count histogram combiner — each
    block folds to (value, count_a, count_b) rows for its distinct
    values, ONE keyed exchange bounded by the value domain, then a
    single sort + cumulative pass on the merged runs. Returns one row
    (ks, n_a, n_b); ks is NULL when either segment is empty."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = pc.cast(batch.column(group_col), pa.string())
        v = batch.column(val_col).cast(pa.float64())
        keep = pc.and_(pc.is_valid(v),
                       pc.is_in(g, value_set=pa.array([str(a), str(b)])))
        t = pa.table({"g": g, "x": v}).filter(keep)
        is_a = pc.equal(t.column("g"), str(a)).cast(pa.int64())
        b2 = pa.table({"x": t.column("x"), "ca": is_a,
                       "cb": pc.subtract(1, is_a)})
        gb = b2.group_by(["x"]).aggregate([("ca", "sum"), ("cb", "sum")])
        return pa.table({"x": gb.column("x"),
                         "ca": gb.column("ca_sum").cast(pa.int64()),
                         "cb": gb.column("cb_sum").cast(pa.int64())})

    hist = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None) \
        .groupby("x", num_partitions=shuffle_partitions()) \
        .aggregate(Sum("ca"), Sum("cb")).to_pandas() \
        .rename(columns={"sum(ca)": "ca", "sum(cb)": "cb"})
    out = {"ks": np.nan, "n_a": 0, "n_b": 0}
    if not hist.empty:
        hist = hist.sort_values("x", kind="mergesort")
        ca = hist["ca"].to_numpy(np.int64)
        cb = hist["cb"].to_numpy(np.int64)
        na, nb = int(ca.sum()), int(cb.sum())
        out["n_a"], out["n_b"] = na, nb
        if na > 0 and nb > 0:
            d = np.abs(np.cumsum(ca) / na - np.cumsum(cb) / nb)
            out["ks"] = float(d.max())
    df = pd.DataFrame([out])
    for c in ("n_a", "n_b"):
        df[c] = df[c].astype("int64")
    return df


def hll_set_ops(ds, group_col: str, val_col: str, a, b) -> pd.DataFrame:
    """Approximate set algebra between two segments' value sets via
    HyperLogLog inclusion-exclusion: |A|, |B|, |A∪B| from three merged
    sketches and |A∩B| = |A| + |B| − |A∪B| — audience-overlap / key-
    coverage estimation ("how many users both click AND view?") at
    sketch cost: no distinct-pair exchange, no join. NULL values are
    excluded.

    Scale shape: each block emits at most three ~16 KB HLL rows (side
    A, side B, and their union — the union sketch is the element-wise
    register max, exactly mergeable); the driver OR-merges per side.
    Estimates carry the standard ~1.04/√2^p relative error, and the
    intersection inherits the absolute error of all three terms — the
    pytest layer bounds both. Returns one row
    (est_a, est_b, est_union, est_intersect)."""
    from ..state import HLL

    def partial(batch: pa.Table) -> pa.Table:
        g = pc.cast(batch.column(group_col), pa.string())
        v = batch.column(val_col)
        keep = pc.is_valid(v)
        t = pa.table({"g": g, "v": v}).filter(keep)
        out_side, out_sk = [], []
        for side, name in ((str(a), "a"), (str(b), "b")):
            vals = t.filter(pc.equal(t.column("g"), side)).column("v")
            if len(vals):
                out_side.append(name)
                out_sk.append(HLL().add_column(vals).to_bytes())
        return pa.table({"side": pa.array(out_side, pa.string()),
                         "sketch": pa.array(out_sk, pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    ha, hb = HLL(), HLL()
    for _, row in parts.iterrows():
        sk = HLL.from_bytes(row["sketch"])
        if row["side"] == "a":
            ha = ha.merge(sk)
        else:
            hb = hb.merge(sk)
    hu = ha.merge(hb)
    ea, eb, eu = ha.estimate(), hb.estimate(), hu.estimate()
    return pd.DataFrame({"est_a": [ea], "est_b": [eb], "est_union": [eu],
                         "est_intersect": [max(ea + eb - eu, 0.0)]})


def histogram2d_fixed(ds, x_col: str, y_col: str,
                      x_lo: float, x_width: float, x_bins: int,
                      y_lo: float, y_width: float, y_bins: int
                      ) -> pd.DataFrame:
    """Fixed-grid 2-D histogram (density heatmap): bin = clip(floor(
    (v - lo) / width), 0, nbins-1) on each axis; rows with a NULL in
    either column are dropped. Per-block combiner: one flattened
    ``np.bincount`` over x_bins*y_bins cells — each block contributes
    ONE count vector, raw rows never move; empty cells are dropped
    (SQL GROUP BY parity). Returns (bx, by, n)."""
    ncells = x_bins * y_bins

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        y = batch.column(y_col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~(np.isnan(x) | np.isnan(y))
        bx = np.clip(np.floor((x[ok] - x_lo) / x_width), 0,
                     x_bins - 1).astype(np.int64)
        by = np.clip(np.floor((y[ok] - y_lo) / y_width), 0,
                     y_bins - 1).astype(np.int64)
        counts = np.bincount(bx * y_bins + by, minlength=ncells)
        return pa.table({"cell": pa.array(np.arange(ncells, dtype=np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    parts = ds.map_batches(
        lambda t, c=(x_col, y_col): t.select(list(c)),
        batch_format="pyarrow", batch_size=None) \
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({"bx": pd.Series([], dtype="int64"),
                             "by": pd.Series([], dtype="int64"),
                             "n": pd.Series([], dtype="int64")})
    agg = parts.groupby("cell", as_index=False)["n"].sum()
    agg = agg[agg["n"] > 0]
    out = pd.DataFrame({"bx": (agg["cell"] // y_bins).astype("int64"),
                        "by": (agg["cell"] % y_bins).astype("int64"),
                        "n": agg["n"].astype("int64")})
    return out.sort_values(["bx", "by"]).reset_index(drop=True)


def grouped_moments(ds, group_col: str, val_col: str) -> pd.DataFrame:
    """Per-group mean / stddev / SKEWNESS / excess KURTOSIS in one pass
    — the distribution-shape profile per segment ("which lang's file
    sizes grew a heavy tail") that grouped_stats' min/max/mean cannot
    see.

    Scale shape: each block computes CENTRAL moments (n, mean, M2, M3,
    M4) per group fully vectorized (factorize + weighted bincounts of
    residual powers — no per-row or per-group Python in the map side),
    so the one keyed shuffle carries 5 doubles per group per block;
    the per-key merge folds partials with the exact pairwise
    higher-moment combination rules (Pebay 2008, the parallel-Welford
    generalization), which is numerically stable where raw power sums
    about zero cancel catastrophically.

    Estimator parity: skewness is the bias-adjusted G1 = g1 *
    sqrt(n(n-1))/(n-2) (None for n < 3 or zero variance) and kurtosis
    the bias-adjusted excess G2 = ((n+1)g2 + 6)(n-1)/((n-2)(n-3))
    (None for n < 4) — exactly DuckDB's / pandas' sample estimators,
    which is what the oracle compares against. Nulls in ``val_col``
    are ignored; null group keys form their own segment."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, val_col]).filter(
            pc.is_valid(batch.column(val_col)))
        if t.num_rows == 0:
            return pa.table({
                group_col: pa.array([], batch.column(group_col).type),
                "n": pa.array([], pa.int64()),
                "mean": pa.array([], pa.float64()),
                "m2": pa.array([], pa.float64()),
                "m3": pa.array([], pa.float64()),
                "m4": pa.array([], pa.float64())})
        keys = t.column(group_col).to_pandas()
        x = t.column(val_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        codes, uniq = pd.factorize(keys, use_na_sentinel=False)
        cnt = np.bincount(codes).astype(np.float64)
        s1 = np.bincount(codes, weights=x)
        mean = s1 / cnt
        r = x - mean[codes]
        m2 = np.bincount(codes, weights=r * r)
        r3 = r * r * r
        m3 = np.bincount(codes, weights=r3)
        m4 = np.bincount(codes, weights=r3 * r)
        out = pa.table({
            group_col: pa.Array.from_pandas(pd.Series(uniq)).cast(
                t.column(group_col).type),
            "n": pa.array(cnt.astype(np.int64)),
            "mean": pa.array(mean), "m2": pa.array(m2),
            "m3": pa.array(m3), "m4": pa.array(m4)})
        return _with_shuffle_key(out, group_col)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        agg = _moments_merge_bucket(df, group_col)
        n = agg["n"].to_numpy(np.float64)
        M2 = agg["m2"].to_numpy(np.float64)
        M3 = agg["m3"].to_numpy(np.float64)
        M4 = agg["m4"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            m2n = M2 / n
            std = np.where(n > 1, np.sqrt(M2 / (n - 1.0)), np.nan)
            g1 = (M3 / n) / m2n ** 1.5
            skew = np.where((n >= 3) & (M2 > 0),
                            g1 * np.sqrt(n * (n - 1.0)) / (n - 2.0),
                            np.nan)
            g2 = (M4 / n) / (m2n * m2n) - 3.0
            kurt = np.where((n >= 4) & (M2 > 0),
                            ((n + 1.0) * g2 + 6.0) * (n - 1.0)
                            / ((n - 2.0) * (n - 3.0)), np.nan)
        out = pd.DataFrame({
            group_col: agg[group_col],
            "n": agg["n"].astype(np.int64),
            "mean": agg["mean"].to_numpy(np.float64), "std": std,
            "skewness": skew, "kurtosis": kurt})
        return _restore_null_keys(out, [group_col])

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        merge_bucket)
    if out.empty:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64"),
                             "mean": [], "std": [], "skewness": [],
                             "kurtosis": []})
    key = out[group_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")].reset_index(drop=True)


def welch_ttest(ds, group_col: str, val_col: str, a, b) -> pd.DataFrame:
    """Welch's unequal-variance t-test between two segments — "did the
    mean move between cohorts A and B" with heteroscedasticity-safe
    degrees of freedom (the default two-sample test; Student's
    equal-variance form is the special case it replaces).

    One algebraic (n, Σx, Σx²) combiner pass restricted to the two
    segments (pre-shuffle filter — other segments never leave the
    scan); the statistic and Welch–Satterthwaite df are closed-form
    driver arithmetic on six scalars. Returns one row: (n_a, n_b,
    mean_a, mean_b, t, df); t/df are NULL when either side has n < 2
    or both variances are 0."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(group_col).cast(pa.string())
        mask = pc.and_(pc.is_in(col, value_set=pa.array([str(a), str(b)])),
                       pc.is_valid(batch.column(val_col)))
        t = batch.select([group_col, val_col]).filter(mask)
        if t.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "s1": pa.array([], pa.float64()),
                             "s2": pa.array([], pa.float64())})
        x = t.column(val_col).cast(pa.float64())
        t2 = pa.table({"g": t.column(group_col).cast(pa.string()),
                       "x": x, "xx": pc.multiply(x, x)})
        g = t2.group_by("g").aggregate(
            [("x", "count"), ("x", "sum"), ("xx", "sum")])
        return pa.table({"g": g.column("g"),
                         "n": g.column("x_count").cast(pa.int64()),
                         "s1": g.column("x_sum").cast(pa.float64()),
                         "s2": g.column("xx_sum").cast(pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    stats = {}
    for gname, grp in parts.groupby("g"):
        n = float(grp["n"].sum())
        s1, s2 = float(grp["s1"].sum()), float(grp["s2"].sum())
        mean = s1 / n if n else np.nan
        var = (s2 - n * mean * mean) / (n - 1) if n > 1 else np.nan
        stats[gname] = (n, mean, max(var, 0.0) if var == var else np.nan)
    na, ma, va = stats.get(str(a), (0.0, np.nan, np.nan))
    nb, mb, vb = stats.get(str(b), (0.0, np.nan, np.nan))
    t_stat = df_w = np.nan
    if na >= 2 and nb >= 2:
        se2 = va / na + vb / nb
        if se2 > 0:
            t_stat = (ma - mb) / np.sqrt(se2)
            df_w = se2 * se2 / ((va / na) ** 2 / (na - 1)
                                + (vb / nb) ** 2 / (nb - 1))
    return pd.DataFrame({
        "n_a": np.array([int(na)], np.int64),
        "n_b": np.array([int(nb)], np.int64),
        "mean_a": [ma], "mean_b": [mb], "t": [t_stat], "df": [df_w]})


def woe_table(ds, cat_col: str, label_col: str,
              smoothing: float = 0.5) -> pd.DataFrame:
    """Weight-of-Evidence per category — the credit-scoring/risk
    encoder: WoE_c = ln( (pos_c + s)/(pos_tot + s·k) /
    ((neg_c + s)/(neg_tot + s·k)) ) with add-``s`` smoothing over k
    categories (so rare/pure categories stay finite). Positive WoE =
    the category over-indexes on the positive class.

    One algebraic (pos, neg) pair-count combiner per block, one keyed
    merge; totals and the encode table are dimension-sized. Label must
    be boolean-like (0/1); null labels/categories are ignored. Returns
    (category, n, pos, neg, woe) sorted by category. Feed the result
    into a broadcast-map encode (the target_encode_loo shape) to stamp
    rows."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([cat_col, label_col]).filter(
            pc.and_(pc.is_valid(batch.column(cat_col)),
                    pc.is_valid(batch.column(label_col))))
        if t.num_rows == 0:
            return pa.table({cat_col: pa.array([], pa.string()),
                             "pos": pa.array([], pa.int64()),
                             "neg": pa.array([], pa.int64())})
        lab = t.column(label_col).cast(pa.float64())
        t2 = pa.table({cat_col: t.column(cat_col).cast(pa.string()),
                       "pos": pc.cast(pc.greater(lab, 0.0), pa.int64()),
                       "neg": pc.cast(pc.equal(lab, 0.0), pa.int64())})
        g = t2.group_by(cat_col).aggregate([("pos", "sum"), ("neg", "sum")])
        return pa.table({cat_col: g.column(cat_col),
                         "pos": g.column("pos_sum").cast(pa.int64()),
                         "neg": g.column("neg_sum").cast(pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({cat_col: pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64"),
                             "pos": pd.Series([], dtype="int64"),
                             "neg": pd.Series([], dtype="int64"),
                             "woe": pd.Series([], dtype="float64")})
    g = parts.groupby(cat_col, as_index=False).agg(pos=("pos", "sum"),
                                                   neg=("neg", "sum"))
    k = len(g)
    pos_tot, neg_tot = float(g["pos"].sum()), float(g["neg"].sum())
    s = float(smoothing)
    woe = np.log(((g["pos"] + s) / (pos_tot + s * k))
                 / ((g["neg"] + s) / (neg_tot + s * k)))
    out = pd.DataFrame({cat_col: g[cat_col],
                        "n": (g["pos"] + g["neg"]).astype("int64"),
                        "pos": g["pos"].astype("int64"),
                        "neg": g["neg"].astype("int64"),
                        "woe": woe})
    return out.sort_values(cat_col).reset_index(drop=True)


def woe_encode(ds, cat_col: str, label_col: str, smoothing: float = 0.5,
               out_col: str = "woe"):
    """Stamp each row with its category's WoE: fit via ``woe_table``
    (dimension-sized), broadcast the mapping into a stateless
    vectorized map — no shuffle touches the data; unseen/null
    categories get NULL."""
    tbl = woe_table(ds, cat_col, label_col, smoothing)
    mapping = dict(zip(tbl[cat_col], tbl["woe"]))
    cats = pa.array(list(mapping), pa.string())
    vals = np.array([mapping[c] for c in mapping], np.float64)

    def stamp(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column(cat_col).cast(pa.string()),
                          value_set=cats)
        i = idx.to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(i)
        out = np.full(t.num_rows, np.nan)
        out[ok] = vals[i[ok].astype(np.int64)]
        return t.append_column(out_col, pa.array(out, pa.float64()))

    return ds.map_batches(stamp, batch_format="pyarrow", batch_size=None)


def calibration_bins(ds, score_col: str, label_col: str,
                     n_bins: int = 10) -> pd.DataFrame:
    """Reliability / calibration curve: scores bucketed onto a fixed
    [0, 1) grid, each bin reporting mean predicted score vs observed
    positive rate — "does 0.8 mean 80%"; the gap column is the per-bin
    calibration error (ECE's summands).

    Fixed-grid combiner (histogram_fixed shape): each block emits at
    most n_bins rows of (n, Σscore, Σlabel); merge is exact addition.
    Scores clamp to the edge bins; null score/label pairs are dropped.
    Returns (bin_id, lo, n, mean_score, pos_rate, gap) rounded to 6,
    only bins with n > 0."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([score_col, label_col]).filter(
            pc.and_(pc.is_valid(batch.column(score_col)),
                    pc.is_valid(batch.column(label_col))))
        if t.num_rows == 0:
            return pa.table({"bin_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "ss": pa.array([], pa.float64()),
                             "sl": pa.array([], pa.float64())})
        s = t.column(score_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        y = t.column(label_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        b = np.clip(np.floor(s * n_bins), 0, n_bins - 1).astype(np.int64)
        n = np.bincount(b, minlength=n_bins)
        ss = np.bincount(b, weights=s, minlength=n_bins)
        sl = np.bincount(b, weights=y, minlength=n_bins)
        keep = n > 0
        return pa.table({"bin_id": pa.array(np.arange(n_bins)[keep]),
                         "n": pa.array(n[keep].astype(np.int64)),
                         "ss": pa.array(ss[keep]),
                         "sl": pa.array(sl[keep])})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({"bin_id": pd.Series([], dtype="int64"),
                             "lo": [], "n": pd.Series([], dtype="int64"),
                             "mean_score": [], "pos_rate": [], "gap": []})
    g = parts.groupby("bin_id", as_index=False).sum()
    out = pd.DataFrame({
        "bin_id": g["bin_id"].astype("int64"),
        "lo": np.round(g["bin_id"] / n_bins, 6),
        "n": g["n"].astype("int64"),
        "mean_score": np.round(g["ss"] / g["n"], 6),
        "pos_rate": np.round(g["sl"] / g["n"], 6)})
    out["gap"] = np.round(out["pos_rate"] - out["mean_score"], 6)
    return out.sort_values("bin_id").reset_index(drop=True)


def isotonic_calibrate(ds, score_col: str, label_col: str,
                       n_bins: int = 100, out_col: str = "calibrated"):
    """Isotonic score calibration: fit a monotone non-decreasing map
    from score to observed positive rate (pool-adjacent-violators) and
    stamp every row — the standard post-hoc calibrator when Platt's
    sigmoid is too rigid.

    Scale shape: the fit runs on the ``calibration_bins`` fixed-grid
    combiner output (<= n_bins rows — PAVA is driver arithmetic on the
    dimension-sized table, weighted by bin counts); the fitted step
    function broadcasts into a stateless vectorized searchsorted stamp.
    Exactly the two-phase z_score fit shape. Returns the input Dataset
    plus ``out_col`` (rounded to 6); scores clamp to the fitted grid."""
    import ray

    bins = calibration_bins(ds, score_col, label_col, n_bins=n_bins)
    if bins.empty:
        return ds.map_batches(
            lambda t: t.append_column(out_col,
                                      pa.nulls(t.num_rows, pa.float64())),
            batch_format="pyarrow", batch_size=None)
    # PAVA: pool adjacent bins while the rate decreases
    rates = bins["pos_rate"].to_numpy(np.float64).copy()
    w = bins["n"].to_numpy(np.float64).copy()
    blocks = [[i] for i in range(rates.size)]
    vals = list(rates)
    wts = list(w)
    i = 0
    while i < len(vals) - 1:
        if vals[i] <= vals[i + 1] + 1e-15:
            i += 1
            continue
        tot = wts[i] + wts[i + 1]
        vals[i] = (vals[i] * wts[i] + vals[i + 1] * wts[i + 1]) / tot
        wts[i] = tot
        blocks[i] += blocks.pop(i + 1)
        vals.pop(i + 1)
        wts.pop(i + 1)
        if i > 0:
            i -= 1
    fitted = np.empty(rates.size)
    for v, blk in zip(vals, blocks):
        for j in blk:
            fitted[j] = v
    edges = bins["bin_id"].to_numpy(np.int64)
    ref = ray.put((edges, fitted, n_bins))

    def stamp(t: pa.Table) -> pa.Table:
        e, f, nb = ray.get(ref)
        s = t.column(score_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        b = np.clip(np.floor(s * nb), 0, nb - 1)
        ok = np.isfinite(b)
        idx = np.searchsorted(e, b, side="right") - 1
        idx = np.clip(idx, 0, e.size - 1)
        cal = np.where(ok, f[idx], np.nan)
        arr = pc.if_else(pa.array(ok),
                         pa.array(np.round(cal, 6), pa.float64()),
                         pa.nulls(t.num_rows, pa.float64()))
        return t.append_column(out_col, arr)

    return ds.map_batches(stamp, batch_format="pyarrow", batch_size=None)


def effect_sizes(ds, group_col: str, val_col: str, a, b) -> pd.DataFrame:
    """Standardized effect sizes between two segments — the magnitude
    companion to welch_ttest's significance: Cohen's d (pooled-SD
    standardized mean difference) and Cliff's delta (P(x_a > x_b) −
    P(x_a < x_b), distribution-free) — a huge-n pipeline makes any
    difference "significant"; these say whether it is big.

    One pass, two combiners sharing the scan: the six-scalar moment
    fold (d) and the per-distinct-value (n_a_at_value, n_total)
    counts (delta via the Mann-Whitney identity delta = 2·AUC − 1,
    mid-rank ties — order statistics with no global sort, driver
    state O(distinct values)). Returns one row: (n_a, n_b, cohens_d,
    cliffs_delta); NULLs on degenerate inputs."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(group_col).cast(pa.string())
        mask = pc.and_(pc.is_in(col, value_set=pa.array([str(a), str(b)])),
                       pc.is_valid(batch.column(val_col)))
        t = pa.table({"g": col, "v": batch.column(val_col)
                      .cast(pa.float64())}).filter(mask)
        if t.num_rows == 0:
            return pa.table({"v": pa.array([], pa.float64()),
                             "na": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s1a": pa.array([], pa.float64()),
                             "s2a": pa.array([], pa.float64()),
                             "s1b": pa.array([], pa.float64()),
                             "s2b": pa.array([], pa.float64())})
        is_a = pc.equal(t.column("g"), str(a))
        t2 = pa.table({"v": t.column("v"),
                       "ia": pc.cast(is_a, pa.int64())})
        g = t2.group_by("v").aggregate([("ia", "sum"), ("ia", "count")])
        va = t.filter(is_a).column("v").to_numpy(zero_copy_only=False)
        vb = t.filter(pc.invert(is_a)).column("v") \
            .to_numpy(zero_copy_only=False)
        n_rows = g.num_rows
        pad = np.zeros(n_rows, np.float64)
        s1a = pad.copy(); s1a[0] = va.sum()
        s2a = pad.copy(); s2a[0] = (va * va).sum()
        s1b = pad.copy(); s1b[0] = vb.sum()
        s2b = pad.copy(); s2b[0] = (vb * vb).sum()
        return pa.table({"v": g.column("v"),
                         "na": g.column("ia_sum").cast(pa.int64()),
                         "n": g.column("ia_count").cast(pa.int64()),
                         "s1a": pa.array(s1a), "s2a": pa.array(s2a),
                         "s1b": pa.array(s1b), "s2b": pa.array(s2b)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    out_null = pd.DataFrame({"n_a": np.array([0], np.int64),
                             "n_b": np.array([0], np.int64),
                             "cohens_d": [np.nan],
                             "cliffs_delta": [np.nan]})
    if parts.empty:
        return out_null
    g = parts.groupby("v", as_index=False).agg(na=("na", "sum"),
                                               n=("n", "sum"))
    g = g.sort_values("v").reset_index(drop=True)
    na_tot = float(g["na"].sum())
    n_tot = float(g["n"].sum())
    nb_tot = n_tot - na_tot
    if na_tot < 2 or nb_tot < 2:
        out_null.loc[0, ["n_a", "n_b"]] = [int(na_tot), int(nb_tot)]
        return out_null
    s1a, s2a = float(parts["s1a"].sum()), float(parts["s2a"].sum())
    s1b, s2b = float(parts["s1b"].sum()), float(parts["s2b"].sum())
    ma, mb = s1a / na_tot, s1b / nb_tot
    va_ = (s2a - na_tot * ma * ma) / (na_tot - 1)
    vb_ = (s2b - nb_tot * mb * mb) / (nb_tot - 1)
    sp2 = ((na_tot - 1) * va_ + (nb_tot - 1) * vb_) / (n_tot - 2)
    d = (ma - mb) / np.sqrt(sp2) if sp2 > 0 else np.nan
    # Cliff's delta via mid-ranks: AUC of "is a" against the value
    cnt = g["n"].to_numpy(np.float64)
    cum = np.cumsum(cnt)
    midrank = cum - (cnt - 1) / 2.0
    sum_ranks_a = float((midrank * g["na"].to_numpy(np.float64)).sum())
    auc = (sum_ranks_a - na_tot * (na_tot + 1) / 2.0) / (na_tot * nb_tot)
    delta = 2.0 * auc - 1.0
    return pd.DataFrame({"n_a": np.array([int(na_tot)], np.int64),
                         "n_b": np.array([int(nb_tot)], np.int64),
                         "cohens_d": [d], "cliffs_delta": [delta]})


def diff_in_diff(ds, ts_col: str, treat_col: str, val_col: str,
                 split_ts) -> pd.DataFrame:
    """Difference-in-differences: the 2x2 (treated x before/after)
    mean table and the DiD estimate

        (ȳ_t,after − ȳ_t,before) − (ȳ_c,after − ȳ_c,before)

    — the standard launch-impact readout when randomization wasn't
    possible; the control difference nets out the time trend.

    One algebraic (n, Σv) combiner over the four cells (4 rows per
    block on the exchange). ``treat_col`` is boolean-like; rows with
    null value are ignored. Returns one row: the four means, four
    counts, and ``did`` (rounded to 6)."""
    split_us = pa.scalar(split_ts).cast(pa.timestamp("us")) \
        .cast(pa.int64()).as_py()

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column(val_col)))
        if t.num_rows == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64())})
        after = pc.cast(pc.greater_equal(
            t.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()),
            pa.scalar(split_us, pa.int64())), pa.int64())
        treat = pc.cast(pc.greater(
            t.column(treat_col).cast(pa.float64()), 0.0), pa.int64())
        cell = pc.add(pc.multiply(treat, pa.scalar(2, pa.int64())), after)
        g = pa.table({"cell": cell,
                      "v": t.column(val_col).cast(pa.float64())}) \
            .group_by("cell").aggregate([("v", "count"), ("v", "sum")])
        return pa.table({"cell": g.column("cell"),
                         "n": g.column("v_count").cast(pa.int64()),
                         "s": g.column("v_sum").cast(pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    g = parts.groupby("cell").sum() if not parts.empty else None
    means, ns = {}, {}
    for cell, tag in [(0, "ctrl_before"), (1, "ctrl_after"),
                      (2, "treat_before"), (3, "treat_after")]:
        if g is not None and cell in g.index and g.loc[cell, "n"] > 0:
            ns[tag] = int(g.loc[cell, "n"])
            means[tag] = float(g.loc[cell, "s"] / g.loc[cell, "n"])
        else:
            ns[tag] = 0
            means[tag] = np.nan
    did = ((means["treat_after"] - means["treat_before"])
           - (means["ctrl_after"] - means["ctrl_before"]))
    row = {f"mean_{k}": round(v, 6) if v == v else np.nan
           for k, v in means.items()}
    row.update({f"n_{k}": np.int64(v) for k, v in ns.items()})
    row["did"] = round(did, 6) if did == did else np.nan
    return pd.DataFrame([row])


def median_of_means(ds, val_col: str, key_col: str,
                    b: int = 32) -> pd.DataFrame:
    """Median-of-means robust mean estimator: rows hash deterministically
    into ``b`` buckets (md5 of the key — layout-stable, SQL-replicable),
    the mean of each bucket folds through a (n, Σv) combiner, and the
    estimate is the MEDIAN of the b bucket means — sub-Gaussian
    concentration even under heavy tails, where the plain mean is one
    outlier away from garbage (the estimator behind most streaming
    robust-mean bounds).

    Exchange: b (n, Σv) pairs per block; the median runs on b scalars.
    Returns one row (mom, mean, b, n); both rounded to 6."""

    def partial(batch: pa.Table) -> pa.Table:
        from .sampling import md5_hex_column

        t = batch.select([key_col, val_col]).filter(
            pc.is_valid(batch.column(val_col)))
        if t.num_rows == 0:
            return pa.table({"bkt": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64())})
        hexes = md5_hex_column(t.column(key_col))
        bkt = np.array([int(h[:8], 16) % b for h in hexes.to_pylist()],
                       np.int64)
        g = pa.table({"bkt": pa.array(bkt),
                      "v": t.column(val_col).cast(pa.float64())}) \
            .group_by("bkt").aggregate([("v", "count"), ("v", "sum")])
        return pa.table({"bkt": g.column("bkt"),
                         "n": g.column("v_count").cast(pa.int64()),
                         "s": g.column("v_sum").cast(pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({"mom": [np.nan], "mean": [np.nan],
                             "b": np.array([b], np.int64),
                             "n": np.array([0], np.int64)})
    g = parts.groupby("bkt").sum()
    means = (g["s"] / g["n"]).to_numpy()
    n_tot = int(g["n"].sum())
    return pd.DataFrame({"mom": [round(float(np.median(means)), 6)],
                         "mean": [round(float(g["s"].sum() / n_tot), 6)],
                         "b": np.array([b], np.int64),
                         "n": np.array([n_tot], np.int64)})


def target_encode_smoothed(ds, key_col: str, val_col: str,
                           m: float = 20.0) -> pd.DataFrame:
    """Empirical-Bayes (James-Stein style) smoothed target encoding:

        enc(c) = (n_c · mean_c + m · global_mean) / (n_c + m)

    — rare categories shrink toward the global mean instead of
    memorizing noise (the m-estimate; target_encode_loo's
    overfitting-control companion: LOO fights self-leakage, shrinkage
    fights small-n variance).

    One algebraic (n, Σv) combiner per category; the encode table is
    dimension-sized. Returns (key, n, mean, enc) sorted, floats
    rounded to 6."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, val_col]).filter(
            pc.is_valid(batch.column(val_col)))
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64())})
        g = pa.table({key_col: t.column(key_col).cast(pa.string()),
                      "v": t.column(val_col).cast(pa.float64())}) \
            .group_by(key_col).aggregate([("v", "count"), ("v", "sum")])
        return pa.table({key_col: g.column(key_col),
                         "n": g.column("v_count").cast(pa.int64()),
                         "s": g.column("v_sum").cast(pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({key_col: pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64"),
                             "mean": [], "enc": []})
    g = parts.groupby(key_col, as_index=False).agg(n=("n", "sum"),
                                                   s=("s", "sum"))
    gm = float(g["s"].sum() / g["n"].sum())
    mean = g["s"] / g["n"]
    enc = (g["n"] * mean + m * gm) / (g["n"] + m)
    out = pd.DataFrame({key_col: g[key_col],
                        "n": g["n"].astype("int64"),
                        "mean": np.round(mean, 6),
                        "enc": np.round(enc, 6)})
    return out.sort_values(key_col).reset_index(drop=True)


def grouped_winsorize(ds, group_col: str, val_col: str,
                      p_lo: float = 0.05, p_hi: float = 0.95,
                      out_col: str = "winsor"):
    """Per-SEGMENT winsorization: clip ``val`` to its own segment's
    [p_lo, p_hi] interpolated quantiles — the keeps-every-row dual of
    ``grouped_outliers_iqr``'s fence filter (a global clip would let a
    heavy segment's tails survive inside lighter segments).

    Same two-phase fitted-transform shape: per-segment quantile_cont
    cut points via the mergeable value-histogram combiner
    (``quantiles.group_quantiles`` — distinct (segment, value) rows
    only), the |segments|-row cut-point table broadcasts via
    ``ray.put``, one stateless vectorized clamp. Rows with a NULL
    value keep a NULL ``out_col``; rows whose segment is NULL (or
    unseen) also yield NULL (SQL join semantics). Appends ``out_col``
    float64; cut points carry ``group_quantiles``' 1e-6 rounding (the
    clamp output is exact arithmetic on those rounded cut points —
    callers needing sub-1e-6 cut precision should fit their own
    quantiles)."""
    import ray

    from .quantiles import group_quantiles

    if not 0.0 <= p_lo <= p_hi <= 1.0:
        raise ValueError(
            f"need 0 <= p_lo <= p_hi <= 1, got ({p_lo}, {p_hi})")
    # null segments never receive a cut point (their clip is NULL), so
    # drop them BEFORE the fit — Ray's sort-based groupby cannot
    # compare None with real keys
    fit_ds = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b.column(group_col))),
        batch_format="pyarrow", batch_size=None)
    qs_df = group_quantiles(fit_ds, group_col, val_col, qs=(p_lo, p_hi))
    qs_df = qs_df[qs_df[group_col].notna()]
    # match group_quantiles' column naming EXACTLY (int(round(q*100)))
    # — plain int() truncates 0.29*100 == 28.999... to 28 -> KeyError
    lo_name = f"q_{int(round(p_lo * 100))}"
    hi_name = f"q_{int(round(p_hi * 100))}"
    if lo_name == hi_name and p_lo != p_hi:
        raise ValueError(
            f"p_lo={p_lo} and p_hi={p_hi} collapse to the same "
            f"whole-percent quantile column {lo_name!r} — "
            f"group_quantiles resolves at 1% granularity")
    cuts = pa.table({
        group_col: pa.array(qs_df[group_col]),
        "lo": pa.array(qs_df[lo_name].to_numpy(np.float64),
                       pa.float64()),
        "hi": pa.array(qs_df[hi_name].to_numpy(np.float64),
                       pa.float64())})
    ref = ray.put(cuts)

    def clamp(batch: pa.Table) -> pa.Table:
        f = ray.get(ref)
        idx = pc.index_in(batch.column(group_col),
                          value_set=f.column(group_col).combine_chunks())
        lo = f.column("lo").take(idx)
        hi = f.column("hi").take(idx)
        v = batch.column(val_col).cast(pa.float64())
        # skip_nulls=False so a null value OR null/unseen segment
        # propagates to a null clip (SQL join semantics) instead of
        # Arrow's default skip-null fallback to the other operand
        w = pc.min_element_wise(
            pc.max_element_wise(v, lo, skip_nulls=False), hi,
            skip_nulls=False)
        return batch.append_column(out_col, w)

    return ds.map_batches(clamp, batch_format="pyarrow",
                          batch_size=None)


def grouped_robust_scale(ds, group_col: str, val_col: str,
                         out_col: str = "robust"):
    """Per-SEGMENT robust scaling ``(x − segment_median) /
    segment_MAD`` — the modified-z transform whose center/spread a
    segment's own outliers cannot drag; the per-group sibling of
    ``quantiles.robust_scale`` and the transform dual of the
    ``vl_outliers_mad`` fence (same fit, applied as a scale instead of
    a filter).

    Two phases like every fitted transform here: the per-segment
    (median, MAD) fit rides the SAME distinct-(segment, value)
    histogram exchange as ``group_quantiles`` (``quantiles.group_mad``
    — null segments dropped before the fit, they scale to NULL by join
    semantics), the |segments|-row table broadcasts via ``ray.put``,
    one stateless vectorized stamp. NULL value, NULL/unseen segment,
    or a zero-MAD segment (undefined scale) all yield NULL. Appends
    ``out_col`` float64 rounded to 6; the fitted med/mad carry
    ``group_mad``'s 1e-6 rounding (SQL ROUND parity on both ends)."""
    import ray

    from .quantiles import group_mad

    fit_ds = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b.column(group_col))),
        batch_format="pyarrow", batch_size=None)
    fit = group_mad(fit_ds, group_col, val_col)
    fit = fit[fit[group_col].notna()]
    cuts = pa.table({
        group_col: pa.array(fit[group_col]),
        "med": pa.array(fit["med"].to_numpy(np.float64), pa.float64()),
        "mad": pa.array(fit["mad"].to_numpy(np.float64), pa.float64())})
    ref = ray.put(cuts)

    def stamp(batch: pa.Table) -> pa.Table:
        f = ray.get(ref)
        idx = pc.index_in(batch.column(group_col),
                          value_set=f.column(group_col).combine_chunks())
        med = f.column("med").take(idx).to_numpy(zero_copy_only=False)
        mad = f.column("mad").take(idx).to_numpy(zero_copy_only=False)
        v = batch.column(val_col).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = (v - med) / np.where(mad > 0, mad, np.nan)
        r = np.sign(r) * np.floor(np.abs(r) * 1e6 + 0.5) / 1e6
        mask = ~np.isfinite(r)
        return batch.append_column(
            out_col, pa.array(np.where(mask, 0.0, r), pa.float64(),
                              mask=mask))

    return ds.map_batches(stamp, batch_format="pyarrow",
                          batch_size=None)
