"""Deterministic hash-based sampling.

``ds.random_shuffle``/``random_sample`` are seed-dependent per run and
per block layout; training-data pipelines need samples that are STABLE
across reruns, resumes and parallelism levels. ``hash_sample`` keeps a
row iff ``hash64(key) mod D < fraction*D`` — a pure function of the key,
so the same rows are selected no matter how the data is partitioned, and
a row's membership never flips between runs. Stateless map, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state import combine_hashes, hash64

__all__ = ["hash_sample", "stratified_sample", "weighted_hash_sample",
           "md5_hex_column", "md5_fraction_threshold", "hash_split",
           "bootstrap_mean_ci", "neyman_allocation", "mixture_sample",
           "stratified_kfold", "ares_sample", "kcenter_sample"]

_D = np.uint64(1 << 32)


def md5_fraction_threshold(fraction: float) -> str:
    """32-char lowercase hex threshold t such that
    ``md5_hex(key) < t`` keeps a uniform ~``fraction`` of keys.
    md5 hex digests are fixed-width, so lexicographic comparison equals
    numeric comparison — the predicate is replicable in ANSI SQL as
    ``md5(CAST(key AS VARCHAR)) < '<t>'``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return format(int(fraction * float(16 ** 32)), "032x")


def md5_hex_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """md5 hex digest of each value's string form (``str(v)`` ==
    DuckDB's ``CAST(v AS VARCHAR)`` for ints/strings). Per-row hashlib
    loop — md5 mode exists for SQL-replicable sampling demos; the scale
    path is the vectorized ``hash64`` kernel."""
    import hashlib

    vals = col.to_pylist()
    return pa.array([None if v is None
                     else hashlib.md5(str(v).encode()).hexdigest()
                     for v in vals], pa.string())


def hash_sample(ds, key_columns: list[str], fraction: float, seed: int = 0,
                method: str = "hash64"):
    """Keep a deterministic ~``fraction`` of rows keyed by
    ``key_columns`` (all rows sharing a key are kept or dropped
    together — sampling by document, user, repo...).

    ``method="hash64"`` (default) is the scale path: vectorized 64-bit
    hash kernel, no per-row Python. ``method="md5"`` (single key column
    only) uses the md5 hex digest so the selection is replicable in
    ANSI SQL (``md5(CAST(key AS VARCHAR)) < threshold``) — used by the
    oracle-matched driver query; same stability guarantees."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if method == "md5":
        if len(key_columns) != 1:
            raise ValueError("md5 mode samples on exactly one key column")
        thr_hex = md5_fraction_threshold(fraction)
        key = key_columns[0]

        def fn_md5(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            hexes = md5_hex_column(batch.column(key))
            keep = pc.fill_null(pc.less(hexes, thr_hex), False)
            return batch.filter(keep)

        return ds.map_batches(fn_md5, batch_format="pyarrow", batch_size=None)
    threshold = np.uint64(int(fraction * float(_D)))

    def fn(batch: pa.Table) -> pa.Table:
        h = combine_hashes(*[hash64(batch.column(c), seed=seed)
                             for c in key_columns])
        keep = (h % _D) < threshold
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def weighted_hash_sample(ds, key_columns: list[str], weight_col: str,
                         seed: int = 0, method: str = "hash64"):
    """Importance sampling: keep each row with probability equal to its
    ``weight_col`` value (clipped to [0,1]; null weight drops the row),
    deterministically keyed on ``key_columns`` — e.g. keep long/high-
    quality documents preferentially while downsampling boilerplate.
    Same stability guarantees as ``hash_sample``: membership is a pure
    function of (key, weight), invariant to partitioning and reruns.
    Stateless map, no shuffle.

    ``method="hash64"`` is the vectorized scale path. ``method="md5"``
    (single key column) keeps a row iff
    ``int(md5_hex(key)[:8], 16) < floor(weight * 2^32)`` — replicable in
    ANSI SQL as ``('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 8))
    ::UBIGINT < floor(<weight expr> * 4294967296)`` (DuckDB), which the
    driver oracle uses."""
    _D_F = float(_D)

    def _thresholds(batch: pa.Table) -> np.ndarray:
        import pyarrow.compute as pc

        w = pc.fill_null(batch.column(weight_col), 0.0) \
            .cast(pa.float64()).to_numpy(zero_copy_only=False)
        return np.floor(np.clip(w, 0.0, 1.0) * _D_F)

    if method == "md5":
        if len(key_columns) != 1:
            raise ValueError("md5 mode samples on exactly one key column")
        key = key_columns[0]

        def fn_md5(batch: pa.Table) -> pa.Table:
            thr = _thresholds(batch)
            hexes = md5_hex_column(batch.column(key)).to_pylist()
            u = np.array([_D if h is None else int(h[:8], 16)
                          for h in hexes], np.float64)
            return batch.filter(pa.array(u < thr))

        return ds.map_batches(fn_md5, batch_format="pyarrow", batch_size=None)

    def fn(batch: pa.Table) -> pa.Table:
        thr = _thresholds(batch)
        h = combine_hashes(*[hash64(batch.column(c), seed=seed)
                             for c in key_columns])
        # (h mod 2^32) <= 2^32 and thr <= 2^32 are both exact in float64
        keep = (h % _D).astype(np.float64) < thr
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def stratified_sample(ds, strata_col: str, fractions: dict,
                      key_columns: list[str] | None = None, seed: int = 0,
                      default_fraction: float = 0.0, method: str = "hash64"):
    """Per-stratum deterministic hash sampling: rows in stratum ``s``
    are kept with probability ``fractions[s]`` (strata absent from the
    dict use ``default_fraction``). Same stability guarantees as
    ``hash_sample`` — membership is a pure function of the sampling key,
    invariant to partitioning and reruns. Stateless map, no shuffle;
    the per-stratum threshold table is baked into the closure (strata
    are assumed dimension-sized: languages, sources, quality buckets)."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0,1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0,1]")
    key_columns = key_columns or [strata_col]
    if method == "md5":
        if len(key_columns) != 1:
            raise ValueError("md5 mode samples on exactly one key column")
        hex_thr = {s: md5_fraction_threshold(f) for s, f in fractions.items()}
        default_hex = md5_fraction_threshold(default_fraction)
        key = key_columns[0]

        def fn_md5(batch: pa.Table) -> pa.Table:
            hexes = md5_hex_column(batch.column(key)).to_pylist()
            strata = batch.column(strata_col).to_pylist()
            keep = [h is not None and h < hex_thr.get(s, default_hex)
                    for h, s in zip(hexes, strata)]
            return batch.filter(pa.array(keep, pa.bool_()))

        return ds.map_batches(fn_md5, batch_format="pyarrow", batch_size=None)
    thresholds = {s: np.uint64(int(f * float(_D)))
                  for s, f in fractions.items()}
    default_thr = np.uint64(int(default_fraction * float(_D)))

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        h = combine_hashes(*[hash64(batch.column(c), seed=seed)
                             for c in key_columns])
        # vectorized per-row threshold: dict lookups only per DISTINCT
        # stratum in the batch (factorize), not per row
        codes, uniques = pd.factorize(batch.column(strata_col).to_pandas())
        lut = np.array([thresholds.get(u, default_thr) for u in uniques],
                       np.uint64) if len(uniques) else np.zeros(0, np.uint64)
        thr = np.where(codes >= 0, lut[np.maximum(codes, 0)], default_thr) \
            .astype(np.uint64)
        keep = (h % _D) < thr
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def hash_split(ds, key_columns: list[str], fractions: dict[str, float],
               out_col: str = "split", seed: int = 0,
               method: str = "hash64"):
    """Deterministic train/val/test assignment: every row gets a split
    label from ``fractions`` (e.g. ``{"train": .8, "val": .1,
    "test": .1}``, must sum to 1) chosen by where its key hash lands in
    [0, 1) partitioned into cumulative ranges — all rows sharing a key
    land in the SAME split (no leakage between train and eval for a
    duplicated document/user), membership is a pure function of the key
    (invariant to partitioning, reruns, and adding data later).
    Stateless map, no shuffle; appends ``out_col``.

    ``method="hash64"`` is the vectorized scale path; ``method="md5"``
    (single key column) makes the assignment replicable in ANSI SQL via
    CASE over ``md5(CAST(key AS VARCHAR))`` hex thresholds
    (``md5_fraction_threshold`` of each cumulative fraction), which the
    driver oracle uses."""
    names = list(fractions)
    fr = np.array([float(fractions[k]) for k in names])
    if (fr < 0).any() or abs(fr.sum() - 1.0) > 1e-9:
        raise ValueError(f"fractions must be >= 0 and sum to 1, got "
                         f"{fractions}")
    cum = np.cumsum(fr)

    if method == "md5":
        if len(key_columns) != 1:
            raise ValueError("md5 mode splits on exactly one key column")
        key = key_columns[0]
        bounds = [md5_fraction_threshold(f) for f in cum[:-1]]

        def fn_md5(batch: pa.Table) -> pa.Table:
            hexes = md5_hex_column(batch.column(key))
            lab = pa.array([names[-1]] * len(batch), pa.string())
            for name, b in zip(reversed(names[:-1]), reversed(bounds)):
                lab = pc.if_else(pc.fill_null(pc.less(hexes, b), False),
                                 pa.scalar(name), lab)
            return batch.append_column(out_col, lab)

        return ds.map_batches(fn_md5, batch_format="pyarrow",
                              batch_size=None)

    edges = np.floor(cum[:-1] * float(_D)).astype(np.uint64)

    def fn(batch: pa.Table) -> pa.Table:
        h = combine_hashes(*[hash64(batch.column(c), seed=seed)
                             for c in key_columns]) % _D
        idx = np.searchsorted(edges, h, side="right")
        lab = pa.array(np.asarray(names, object)[idx], pa.string())
        return batch.append_column(out_col, lab)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def bottomk_sample(ds, key_col: str, k: int, method: str = "hash64",
                   seed: int = 0):
    """Deterministic uniform sample of EXACTLY ``k`` rows without
    replacement: every row gets a priority that is a pure function of
    its key, and the global k lowest-priority rows are the sample —
    the fixed-size companion to ``hash_sample``'s fixed-fraction form
    (a deterministic equivalent of single-reservoir sampling, stable
    across reruns, resumes and block layouts).

    Scale shape: each block keeps only its own bottom-k slice (one
    vectorized argsort + head per block), so at most ``k × n_blocks``
    rows ever leave the blocks and the driver merges k-sized partials
    — no shuffle, no global sort. ``method="hash64"`` is the scale
    path; ``method="md5"`` makes the selection SQL-replicable
    (``ORDER BY md5(CAST(key AS VARCHAR)) LIMIT k``). Ties (absent
    under md5) break on the key's string form. Returns a pandas
    DataFrame of the sampled rows in priority order, priority column
    dropped."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def partial(batch: pa.Table) -> pa.Table:
        if method == "md5":
            prio = md5_hex_column(batch.column(key_col))
        else:
            prio = pa.array(
                hash64(batch.column(key_col), seed=seed).astype("uint64"))
        t = batch.append_column("__prio", prio)
        t = t.filter(pc.is_valid(t.column("__prio")))
        df = t.to_pandas()
        df["__tie"] = df[key_col].astype(str)
        order = ["__prio", "__tie"] + [c for c in df.columns
                                       if c not in ("__prio", "__tie")]
        df = df.sort_values(order, kind="mergesort").head(k)
        return pa.Table.from_pandas(df.drop(columns="__tie"),
                                    preserve_index=False) \
            .replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return parts
    parts["__tie"] = parts[key_col].astype(str)
    order = ["__prio", "__tie"] + [c for c in parts.columns
                                   if c not in ("__prio", "__tie")]
    out = parts.sort_values(order, kind="mergesort").head(k)
    return out.drop(columns=["__prio", "__tie"]).reset_index(drop=True)


def bootstrap_mean_ci(ds, val_col: str, id_col: str, *,
                      n_boot: int = 200, alpha: float = 0.05,
                      seed: int = 0) -> "pd.DataFrame":
    """Distributed POISSON bootstrap: a percentile confidence interval
    for the column mean without ever resampling rows globally.

    The classic bootstrap draws n rows with replacement — impossible to
    do independently per block. The Poisson bootstrap (Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", Google 2012)
    replaces each replica's multinomial weights with iid Poisson(1)
    weights per row, which FACTORIZES across blocks: every block
    computes, for each of ``n_boot`` replicas, its partial
    (sum w, sum w*x) — a 2-doubles-per-replica combiner — and the
    merge adds them. Weights are derived from ``hash64(id)`` (splitmix
    families per replica), so every replica's WEIGHTS are deterministic
    and layout-invariant — reshuffling blocks changes replica means
    only by float-addition round-off (~1e-15 relative).

    Exchange cost: n_boot rows per block, independent of block size.
    Returns one row: (mean, ci_lo, ci_hi, n, n_boot) with the
    percentile interval at level 1-alpha over the replica means."""
    import pandas as pd

    from ..state.hashing import hash64, hash64_multi

    # Poisson(1) inverse-CDF table: P(X <= k), k = 0..15 (tail ~ 1e-13)
    pmf = [np.exp(-1.0)]
    for k in range(1, 16):
        pmf.append(pmf[-1] / k)
    cdf = np.cumsum(pmf)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([id_col, val_col]).filter(
            pc.is_valid(batch.column(val_col)))
        n = t.num_rows
        if n == 0:
            return pa.table({"rep": pa.array([], pa.int64()),
                             "w": pa.array([], pa.float64()),
                             "wx": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        x = t.column(val_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        base = hash64(t.column(id_col).cast(pa.int64())
                      .to_numpy(zero_copy_only=False), seed=seed)
        H = hash64_multi(base, n_boot, seed=seed + 1)    # (n_boot, n)
        u = H.astype(np.float64) / float(2 ** 64)
        W = np.searchsorted(cdf, u).astype(np.float64)   # Poisson(1)
        # rep -1 carries the EXACT (count, sum) for the point estimate
        return pa.table({
            "rep": pa.array(np.concatenate([[-1],
                                            np.arange(n_boot)]).astype(
                np.int64)),
            "w": pa.array(np.concatenate([[float(n)], W.sum(axis=1)])),
            "wx": pa.array(np.concatenate([[float(x.sum())], W @ x])),
            "n": pa.array(np.full(n_boot + 1, n, np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({"mean": [np.nan], "ci_lo": [np.nan],
                             "ci_hi": [np.nan],
                             "n": np.array([0], np.int64),
                             "n_boot": np.array([n_boot], np.int64)})
    g = parts.groupby("rep").agg(w=("w", "sum"), wx=("wx", "sum"),
                                 n=("n", "sum"))
    exact = g.loc[-1]
    n_rows = int(exact["n"])
    mean = exact["wx"] / exact["w"] if exact["w"] else np.nan
    g = g.drop(index=-1)
    means = (g["wx"] / g["w"].where(g["w"] > 0)).dropna().to_numpy()
    lo, hi = np.quantile(means, [alpha / 2, 1 - alpha / 2])
    return pd.DataFrame({"mean": [mean], "ci_lo": [lo], "ci_hi": [hi],
                         "n": np.array([n_rows], np.int64),
                         "n_boot": np.array([n_boot], np.int64)})


def neyman_allocation(ds, stratum_col: str, val_col: str,
                      n_total: int) -> "pd.DataFrame":
    """Neyman-optimal stratified-sample allocation: given a total
    budget of ``n_total`` rows, allocate n_h ∝ N_h * σ_h (stratum size
    x stratum stddev) — the variance-minimizing design for estimating
    the population mean (Neyman 1934), vs proportional allocation
    which oversamples homogeneous strata.

    One pass: per-block (count, sum, sumsq) per stratum — an algebraic
    3-doubles combiner — merged at stratum scale; the allocation
    arithmetic runs on the dimension-sized result. Rounds half away
    from zero (SQL ``round`` convention) and caps each allocation at
    the stratum population. Feed the resulting per-stratum rates into
    ``stratified_sample`` to realize the sample deterministically.

    Returns (stratum, n_rows, std, alloc) sorted by stratum; strata
    with undefined stddev (n_rows < 2) or zero variance get alloc 0
    (they need only one probe row — sampling them adds no variance
    information)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([stratum_col, val_col]).filter(
            pc.is_valid(batch.column(val_col)))
        if t.num_rows == 0:
            return pa.table({stratum_col: pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "s1": pa.array([], pa.float64()),
                             "s2": pa.array([], pa.float64())})
        x = t.column(val_col).cast(pa.float64())
        t2 = pa.table({stratum_col: t.column(stratum_col).cast(pa.string()),
                       "x": x,
                       "xx": pc.multiply(x, x)})
        g = t2.group_by(stratum_col).aggregate(
            [("x", "count"), ("x", "sum"), ("xx", "sum")])
        return pa.table({stratum_col: g.column(stratum_col),
                         "n": g.column("x_count").cast(pa.int64()),
                         "s1": g.column("x_sum").cast(pa.float64()),
                         "s2": g.column("xx_sum").cast(pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({stratum_col: pd.Series([], dtype=object),
                             "n_rows": pd.Series([], dtype="int64"),
                             "std": [], "alloc": pd.Series([], dtype="int64")})
    g = parts.groupby(stratum_col, as_index=False).agg(
        n_rows=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum"))
    n = g["n_rows"].to_numpy(np.float64)
    mean = g["s1"] / np.maximum(n, 1)
    var = (g["s2"] - n * mean * mean) / np.maximum(n - 1, 1)
    std = np.sqrt(np.maximum(var, 0.0))
    std = np.where(n >= 2, std, np.nan)
    w = np.where(np.isnan(std), 0.0, n * std)
    tot = w.sum()
    if tot > 0:
        alloc = np.floor(np.abs(n_total * w / tot) + 0.5)  # round half away
    else:
        alloc = np.zeros(len(g))
    alloc = np.minimum(alloc, n).astype(np.int64)
    out = pd.DataFrame({stratum_col: g[stratum_col],
                        "n_rows": g["n_rows"].astype("int64"),
                        "std": std, "alloc": alloc})
    return out.sort_values(stratum_col).reset_index(drop=True)


def balance_classes(ds, label_col: str, key_columns: list[str],
                    method: str = "md5"):
    """Class-balanced downsampling: every class keeps a deterministic
    ~min_class_count/class_count fraction of its rows, so expected
    per-class counts equal the minority count — the standard
    imbalanced-training rebalance, as a FITTED sampler (one count
    combiner) + the layout-stable hash filter.

    The fit pass is a per-class count combiner (dimension-sized);
    the per-class keep-probabilities broadcast as a WEIGHT stamp into
    ``weighted_hash_sample``'s stateless predicate, so membership is a
    pure function of (key, class counts) — rerun/resume/parallelism-
    stable, and in md5 mode the exact selection is replicable in SQL
    (the first-8-hex-digits-vs-floor(w·2^32) form the sm_weighted
    oracle uses). Returns the filtered Dataset (the internal weight
    column is dropped)."""

    def count_partial(batch: pa.Table) -> pa.Table:
        col = batch.column(label_col).cast(pa.string())
        t = pa.table({"lab": pc.fill_null(col, "\0null")})
        g = t.group_by("lab").aggregate([([], "count_all")])
        return pa.table({"lab": g.column("lab"),
                         "n": g.column("count_all").cast(pa.int64())})

    parts = ds.map_batches(count_partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return ds
    g = parts.groupby("lab")["n"].sum()
    m = int(g.min())
    labs = pa.array(list(g.index), pa.string())
    ws = np.array([m / int(n) for n in g.to_numpy()], np.float64)

    def stamp(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column(label_col).cast(pa.string()),
                           "\0null")
        idx = pc.index_in(col, value_set=labs) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(idx)
        w = np.zeros(batch.num_rows)
        w[ok] = ws[idx[ok].astype(np.int64)]
        return batch.append_column("__bal_w", pa.array(w, pa.float64()))

    stamped = ds.map_batches(stamp, batch_format="pyarrow",
                             batch_size=None)
    out = weighted_hash_sample(stamped, key_columns, "__bal_w",
                               method=method)
    return out.drop_columns(["__bal_w"])


def mixture_sample(ds, proportions: dict[str, float], *,
                   source_col: str = "source", key_col: str = "doc_id",
                   seed: int = 0, method: str = "hash64"):
    """Data-mixing downsample: keep a deterministic subset whose
    per-source composition matches ``proportions`` at the maximum
    feasible output size (the binding source — smallest n_s/p_s — is
    kept whole; every other source is hash-downsampled to scale).

    The standard LLM-corpus mixing step (web/wiki/code ratios). Two
    passes over the input: one narrow per-source count (dimension-sized
    groupby), then a stateless keyed filter with the per-source keep
    rates baked into the closure — no shuffle of the data itself.
    Sources missing from ``proportions`` are dropped; sources named in
    ``proportions`` but absent from the data are ignored when choosing
    the feasible size (inner-join semantics, matching the SQL oracle).

    ``method="hash64"`` is the vectorized scale path.
    ``method="md5"`` keeps a row iff
    ``int(md5_hex(key)[:12], 16) < floor(keep_s * 16**12)`` so the
    whole selection — including the data-dependent rates — replays in
    ANSI SQL from the same counts:

        WITH props(source, p) AS (VALUES (...)),
        counts AS (SELECT source, CAST(count(*) AS DOUBLE) AS n
                   FROM t GROUP BY source),
        feas AS (SELECT min(c.n / pr.p) AS t
                 FROM counts c JOIN props pr USING (source)),
        rates AS (SELECT c.source, least(1.0, pr.p * f.t / c.n) AS keep
                  FROM counts c JOIN props pr USING (source)
                  CROSS JOIN feas f)
        SELECT ... WHERE CAST(('0x' || substring(md5(CAST(key AS
        VARCHAR)), 1, 12)) AS BIGINT) < floor(r.keep * 281474976710656.0)

    Both sides compute keep_s with the same IEEE-double operations in
    the same order, so membership matches bit-exactly."""
    for s, p in proportions.items():
        if p <= 0.0:
            raise ValueError(f"proportion for source {s!r} must be > 0")
    counts = {}
    for row in ds.groupby(source_col).count().take_all():
        counts[row[source_col]] = float(row["count()"])
    present = [s for s in proportions if s in counts]
    if not present:
        frac = {}
    else:
        t = min(counts[s] / proportions[s] for s in present)
        frac = {s: min(1.0, proportions[s] * t / counts[s])
                for s in present}
    if method == "hash64":
        return stratified_sample(ds, source_col, frac,
                                 key_columns=[key_col], seed=seed,
                                 default_fraction=0.0, method="hash64")
    if method != "md5":
        raise ValueError(f"unknown method {method!r}")
    _H12 = float(16 ** 12)
    thr = {s: int(np.floor(f * _H12)) for s, f in frac.items()}

    def fn_md5(batch: pa.Table) -> pa.Table:
        hexes = md5_hex_column(batch.column(key_col)).to_pylist()
        srcs = batch.column(source_col).to_pylist()
        keep = [h is not None and s in thr and int(h[:12], 16) < thr[s]
                for h, s in zip(hexes, srcs)]
        return batch.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(fn_md5, batch_format="pyarrow", batch_size=None)


def ares_sample(ds, key_col: str, weight_col: str, k: int,
                method: str = "hash64") -> "pd.DataFrame":
    """Fixed-size weighted sample WITHOUT replacement (Efraimidis-
    Spirakis A-Res): each row draws a deterministic uniform u from its
    key and scores u^(1/w); the global top-k by score is exactly a
    weight-proportional without-replacement draw. Deterministic and
    layout/rerun-invariant like every sampler here (the draw is a pure
    function of the key) — the fixed-BUDGET complement to
    ``weighted_hash_sample``'s Bernoulli form (that one's output size
    is binomial; training-data quotas need exactly k).

    Scale shape: stateless scoring + per-block top-k partials
    (vectorized lexsort slice), k-sized partials merged on the driver
    — no shuffle, no sort of the table. Rows with null/non-positive
    weight are excluded. ``method="hash64"`` is the vectorized scale
    path; ``method="md5"`` derives u from the first 13 md5 hex chars
    (52 bits — exact in a double), replicable in ANSI SQL via
    ``CAST('0x'||substr(md5(key),1,13) AS BIGINT)``. Ties broken by
    key ascending. Returns the selected rows' (key, weight, score)."""
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if method not in ("hash64", "md5"):
        raise ValueError(f"method must be hash64|md5, got {method!r}")

    def partial(batch: pa.Table) -> pa.Table:
        key = batch.column(key_col)
        w = batch.column(weight_col).cast(pa.float64())
        ok = pc.and_(pc.is_valid(key),
                     pc.fill_null(pc.greater(w, 0.0), False))
        t = pa.table({"k": key, "w": w}).filter(ok)
        kk = t.column("k")
        wv = t.column("w").to_numpy(zero_copy_only=False)
        if method == "md5":
            hexes = md5_hex_column(kk)
            u = np.array([int(h[:13], 16) for h in hexes.to_pylist()],
                         dtype=np.float64) / float(1 << 52)
        else:
            u = hash64(kk).astype(np.float64) / float(2 ** 64)
        with np.errstate(divide="ignore"):
            score = u ** (1.0 / wv)
        df = pd.DataFrame({key_col: kk.to_pandas(), weight_col: wv,
                           "score": score})
        df = df.sort_values(["score", key_col],
                            ascending=[False, True],
                            kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame(columns=[key_col, weight_col, "score"])
    out = parts.sort_values(["score", key_col],
                            ascending=[False, True],
                            kind="mergesort").head(k)
    return out.reset_index(drop=True)


def stratified_kfold(ds, stratum_col: str, key_col: str, k: int,
                     out_col: str = "fold"):
    """Deterministic EXACTLY-balanced stratified k-fold assignment:
    within every stratum the rows are ordered by a pure key hash
    (md5 hex, SQL-replicable) and dealt into ``k`` folds with SQL
    NTILE sizing (the first ``n % k`` folds of a stratum get one
    extra row) — so every fold holds each stratum's share to within
    one row, and the assignment is a pure function of (stratum, key):
    invariant to partitioning, reruns, and parallelism. The plain
    ``hash % k`` draw is only balanced in expectation; cross-
    validation over small or skewed strata needs the exact deal.

    Scale shape: one stratum-keyed bucket shuffle
    (``bucketed_by_key`` — uniform hash buckets, every stratum
    resolved vectorized inside its bucket, never per-stratum Python).
    Appends ``out_col`` (int64, 1-based)."""
    import pandas as pd

    from .events import bucketed_by_key

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def add_md5(batch: pa.Table) -> pa.Table:
        return batch.append_column("__md5",
                                   md5_hex_column(batch.column(key_col)))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        srt = df.sort_values([stratum_col, "__md5", key_col],
                             kind="mergesort")
        g = srt.groupby(stratum_col, sort=False, dropna=False)
        i = g.cumcount().to_numpy(np.int64)           # 0-based in-stratum
        n = g[key_col].transform("size").to_numpy(np.int64)
        big, rem = n // k + 1, n % k                  # NTILE sizing
        in_big = i < rem * big
        fold = np.where(
            in_big, i // np.maximum(big, 1),
            rem + (i - rem * big) // np.maximum(n // k, 1)) + 1
        out = srt.drop(columns="__md5")
        out[out_col] = fold.astype(np.int64)
        return out.sort_index()

    return bucketed_by_key(
        ds.map_batches(add_md5, batch_format="pyarrow", batch_size=None),
        stratum_col, per_bucket)


def leakage_safe_split(ds, fractions: dict[str, float], *,
                       text_col: str = "text", id_col: str = "doc_id",
                       out_col: str = "split", seed: int = 0,
                       threshold: float = 0.5, pairs=None, **lsh_kw):
    """Near-dup-aware train/val/test assignment — the eval-leakage
    guard: splitting on raw document ids puts one crawl of a page in
    train and its near-copy in test, silently inflating eval scores.
    Here the split key is the document's NEAR-DUP CLUSTER representative
    (MinHash-LSH pairs -> distributed connected components), so every
    member of a near-dup cluster lands on the SAME side; documents in
    no cluster key on their own id.

    Composition of existing scale paths, nothing on the driver: the
    ids-only distributed LSH band exchange
    (``dedup.minhash_lsh_pairs_distributed`` — pass precomputed
    ``pairs`` with id_a/id_b to reuse a run), label-propagation
    components (``graph.connected_components``), one size-aware join of
    the (node, comp) table back onto the corpus, then the stateless
    deterministic ``hash_split`` keyed on the component id. Returns the
    input Dataset + ``out_col`` (string) + ``__split_key`` (int64, the
    cluster representative the assignment was keyed on — keep it for
    audits, drop it downstream)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .dedup import minhash_lsh_pairs_distributed
    from .graph import connected_components
    from .join import sized_join

    if pairs is None:
        pairs = minhash_lsh_pairs_distributed(
            ds, text_col, id_col, threshold=threshold, **lsh_kw)
    labels = connected_components(pairs, a_col="id_a", b_col="id_b") \
        .materialize()

    proj = ds.materialize()
    joined = sized_join(proj, labels, on=id_col, right_on="node",
                        how="left outer",
                        left_bytes=proj.size_bytes(),
                        right_bytes=labels.size_bytes())

    def key_col(batch: pa.Table) -> pa.Table:
        comp = batch.column("comp") if "comp" in batch.column_names \
            else pa.nulls(batch.num_rows, pa.int64())
        own = batch.column(id_col).cast(pa.int64())
        keyv = pc.coalesce(comp, own)
        keep = [c for c in batch.column_names if c != "comp"]
        return batch.select(keep).append_column(
            "__split_key", keyv.cast(pa.int64()))

    keyed = joined.map_batches(key_col, batch_format="pyarrow",
                               batch_size=None)
    return hash_split(keyed, ["__split_key"], fractions,
                      out_col=out_col, seed=seed)


def kcenter_sample(ds, k: int = 8, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> pd.DataFrame:
    """Greedy k-center (farthest-point traversal, the 2-approximation
    of Gonzalez 1985) over an embedding column — DIVERSITY selection:
    each step adds the point farthest (euclidean on L2-normalized
    vectors) from everything already chosen, so the selected set
    spreads across the corpus instead of oversampling dense regions —
    the coreset/prototype picker for "show me k maximally different
    documents" and diversity-aware training subsets. Deterministic:
    the seed is the smallest id; ties in distance (rounded to 9)
    break toward the smaller id, so the result is a pure function of
    the data under any layout.

    Scale shape: k streaming passes — per step the selected matrix
    (<= k x d floats, KB-sized) broadcasts via ``ray.put``, each block
    reduces to ONE (farthest-distance, id) candidate row, and the
    driver folds |blocks| candidates. No shuffle, no driver-held
    corpus. Returns (step, id, radius) — radius is the chosen point's
    distance to the prior set (non-increasing after step 1; step 0 is
    the seed with radius NaN)."""
    import pandas as pd
    import ray

    from .similarity import _normalize, _vectors

    def seed_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.int64())
        if len(ids) == 0:
            return pa.table({"id": pa.array([], pa.int64())})
        return pa.table({"id": pa.array(
            [pc.min(ids).as_py()], pa.int64())})

    seeds = ds.map_batches(seed_partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if seeds.empty:
        return pd.DataFrame({"step": pd.Series([], dtype="int64"),
                             "id": pd.Series([], dtype="int64"),
                             "radius": pd.Series([], dtype="float64")})
    seed_id = int(seeds["id"].min())

    def fetch_vec(want: int) -> np.ndarray:
        def grab(batch: pa.Table, want=want) -> pa.Table:
            ids = batch.column(id_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            m = ids == want
            if not m.any():
                return pa.table({"v": pa.array([], pa.list_(pa.float64()))})
            V = _normalize(_vectors(batch, vec_col))[m][:1]
            return pa.table({"v": pa.array([V[0].tolist()],
                                           pa.list_(pa.float64()))})

        rows = ds.map_batches(grab, batch_format="pyarrow",
                              batch_size=None).take_all()
        return np.asarray(rows[0]["v"], np.float64)

    chosen_ids = [seed_id]
    chosen_vecs = [fetch_vec(seed_id)]
    radii = [np.nan]
    for _step in range(1, k):
        C = np.asarray(chosen_vecs)
        ref = ray.put((C, np.asarray(chosen_ids, np.int64)))

        def far_partial(batch: pa.Table) -> pa.Table:
            Cn, cid = ray.get(ref)
            V = _vectors(batch, vec_col)
            empty = pa.table({"d": pa.array([], pa.float64()),
                              "id": pa.array([], pa.int64()),
                              "v": pa.array([], pa.list_(pa.float64()))})
            if V.shape[0] == 0:
                return empty
            ids = batch.column(id_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            Vn = _normalize(V)
            # min distance to the selected set per row (unit vectors:
            # d^2 = 2 - 2 cos); exclude already-chosen ids
            sim = Vn @ Cn.T
            d = np.sqrt(np.maximum(2.0 - 2.0 * sim.max(axis=1), 0.0))
            d = np.round(d, 9)
            d[np.isin(ids, cid)] = -1.0
            # block candidate: max distance, then min id
            best = np.flatnonzero(d == d.max())
            j = best[np.argmin(ids[best])]
            if d[j] < 0:
                return empty
            return pa.table({"d": pa.array([float(d[j])], pa.float64()),
                             "id": pa.array([int(ids[j])], pa.int64()),
                             "v": pa.array([Vn[j].tolist()],
                                           pa.list_(pa.float64()))})

        cands = ds.map_batches(far_partial, batch_format="pyarrow",
                               batch_size=None).to_pandas()
        if cands.empty:
            break
        cands = cands.sort_values("id", kind="mergesort")             .sort_values("d", ascending=False, kind="mergesort")
        top = cands.iloc[0]
        chosen_ids.append(int(top["id"]))
        chosen_vecs.append(np.asarray(top["v"], np.float64))
        radii.append(float(top["d"]))

    return pd.DataFrame({
        "step": np.arange(len(chosen_ids), dtype=np.int64),
        "id": np.asarray(chosen_ids, np.int64),
        "radius": np.asarray(radii, np.float64)})
