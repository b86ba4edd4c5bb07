"""Corpus-curation operators for training-data pipelines: PII/URL
redaction, Gopher-style repetition/quality filters, benchmark
decontamination, and explicit salted hot-key aggregation.

These extend the reference's transform library (feature-fabrica has no
curation stages; cf. /root/reference/feature_fabrica/transform/string.py
for its closest string ops) with the standard large-corpus cleaning
passes (Rae et al. 2021 "Scaling Language Models" App. A quality
heuristics; n-gram decontamination as in GPT-3 App. C).

Scale shape: redaction and quality metrics are stateless vectorized
``map_batches`` stages (RE2 kernels + one lexsort per batch — no Python
row loops). Decontamination broadcasts the benchmark's n-gram hash set
(benchmark-sized by definition — a few million grams, MBs) via
``ray.put`` and flags training docs in a stateless map: zero shuffle of
the 100 TB side. Salted aggregation is the classic two-stage skew
breaker: stage 1 groups by (key, salt) so one hot key spreads over
``salts`` reduce partitions, stage 2 merges the per-salt partials
(rows <= distinct_keys x salts, tiny).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import _flat_utf8  # noqa: F401  (re-exported family)
from .textstats import _distinct_per_row, _set_col, fill_utf8, token_hashes

__all__ = ["redact_text", "normalize_text", "gopher_quality",
           "dedup_segments_global", "dedup_substring_spans",
           "token_ngram_hashes", "decontaminate", "salted_group_agg",
           "repetition_stats", "common_ngrams", "remove_frequent_lines",
           "dedup_lines_within_doc"]

# GPT-2-style pre-tokenizer, reduced to RE2 (no lookahead): letter runs,
# digit runs, and symbol runs, each with an optional leading space
BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"

_B = np.uint64(1099511628211)  # FNV prime, same base as textstats kgrams

# RE2 syntax — identical engine in pyarrow.compute and DuckDB, so the
# SQL oracles use the same pattern strings verbatim.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_text(ds, text_col: str = "text", out_col: str = "redacted"):
    """Replace emails, then URLs, then IPv4 literals with placeholder
    tokens; count matches of each type on the ORIGINAL text.

    Appends ``n_emails / n_urls / n_ips`` (int64) and ``out_col``
    (string). Replacement order is fixed (email -> url -> ip) so results
    are deterministic when patterns overlap.
    """

    def fn(batch: pa.Table) -> pa.Table:
        col = fill_utf8(batch.column(text_col))
        n_emails = pc.count_substring_regex(col, pattern=EMAIL_RE).cast(pa.int64())
        n_urls = pc.count_substring_regex(col, pattern=URL_RE).cast(pa.int64())
        n_ips = pc.count_substring_regex(col, pattern=IPV4_RE).cast(pa.int64())
        red = pc.replace_substring_regex(col, pattern=EMAIL_RE,
                                         replacement="<EMAIL>")
        red = pc.replace_substring_regex(red, pattern=URL_RE,
                                         replacement="<URL>")
        red = pc.replace_substring_regex(red, pattern=IPV4_RE,
                                         replacement="<IP>")
        batch = _set_col(batch, "n_emails", n_emails)
        batch = _set_col(batch, "n_urls", n_urls)
        batch = _set_col(batch, "n_ips", n_ips)
        return _set_col(batch, out_col, red)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _max_run_per_row(hashes: np.ndarray, row_of: np.ndarray,
                     n_rows: int) -> np.ndarray:
    """Largest repeat-count of any single value per row, from (hash, row)
    pairs — one lexsort, no per-row Python. Empty rows get 0."""
    out = np.zeros(n_rows, np.int64)
    if hashes.size == 0:
        return out
    order = np.lexsort((hashes, row_of))
    h, r = hashes[order], row_of[order]
    new = np.empty(h.size, dtype=bool)
    new[0] = True
    new[1:] = (h[1:] != h[:-1]) | (r[1:] != r[:-1])
    starts = np.flatnonzero(new)
    runs = np.diff(np.concatenate([starts, [h.size]]))
    np.maximum.at(out, r[starts], runs)
    return out


def normalize_text(ds, text_col: str = "text", out_col: str = "norm",
                   with_hash: bool = True):
    """Canonicalize text ahead of exact dedup: lowercase, collapse every
    whitespace run to one space, trim. Two near-identical crawls of the
    same page then hash equal, so the standard pre-pass before
    ``exact_dedup_rows(columns=[out_col])`` catches case/whitespace-only
    duplicates that byte-exact dedup misses.

    Appends ``out_col`` (string) and, when ``with_hash``, ``norm_hash``
    (the vectorized 64-bit content hash of the normalized form — the
    8-byte dedup key, so downstream dedup never re-reads the text).
    Stateless vectorized map (RE2 kernel, identical regex engine to
    DuckDB so the oracle uses the same pattern verbatim); no shuffle."""
    from ..state import hash64

    def fn(batch: pa.Table) -> pa.Table:
        col = fill_utf8(batch.column(text_col))
        # trim plain spaces only (all \s runs were just collapsed to
        # ' '), matching ANSI/DuckDB trim() exactly
        norm = pc.utf8_trim(
            pc.replace_substring_regex(pc.utf8_lower(col),
                                       pattern=r"\s+", replacement=" "),
            characters=" ")
        batch = _set_col(batch, out_col, norm)
        if with_hash:
            h = hash64(norm).view(np.int64)
            batch = _set_col(batch, "norm_hash", pa.array(h, pa.int64()))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def gopher_quality(ds, text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_word_len: float = 3.0,
                   max_mean_word_len: float = 10.0,
                   max_top_word_frac: float = 0.15,
                   min_alpha_word_frac: float = 0.80):
    """Gopher-style document quality metrics + pass flag (Rae et al.
    2021, App. A): word count bounds, mean word length bounds, the
    top-word repetition fraction, and the alphabetic-word fraction.

    Appends ``n_words`` (int64), ``mean_word_len`` / ``top_word_frac`` /
    ``alpha_word_frac`` (float64, rounded to 6 dp so the flag is
    reproducible across engines) and ``passes_gopher`` (bool, computed
    from the rounded metrics).
    """

    def _r6(x: np.ndarray) -> np.ndarray:
        return np.floor(x * 1e6 + 0.5) / 1e6   # half-away, matches SQL ROUND

    def fn(batch: pa.Table) -> pa.Table:
        col = fill_utf8(batch.column(text_col))
        n = batch.num_rows
        th, tr = token_hashes(col)
        n_words = np.bincount(tr, minlength=n).astype(np.int64)
        denom = np.maximum(n_words, 1).astype(np.float64)
        n_nonspace = pc.count_substring_regex(col, pattern=r"\S") \
            .cast(pa.float64()).to_numpy(zero_copy_only=False)
        mean_wl = _r6(n_nonspace / denom)
        top_frac = _r6(_max_run_per_row(th, tr, n) / denom)
        # alphabetic tokens: full-match [A-Za-z]+ over the flat token list
        toks = pc.split_pattern_regex(col, pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        alpha = pc.match_substring_regex(flat, pattern=r"^[A-Za-z]+$") \
            .to_numpy(zero_copy_only=False)
        n_alpha = np.bincount(row_of[alpha], minlength=n)
        alpha_frac = _r6(n_alpha / denom)
        passes = ((n_words >= min_words) & (n_words <= max_words)
                  & (mean_wl >= min_mean_word_len)
                  & (mean_wl <= max_mean_word_len)
                  & (top_frac <= max_top_word_frac)
                  & (alpha_frac >= min_alpha_word_frac))
        batch = _set_col(batch, "n_words", pa.array(n_words))
        batch = _set_col(batch, "mean_word_len", pa.array(mean_wl, pa.float64()))
        batch = _set_col(batch, "top_word_frac", pa.array(top_frac, pa.float64()))
        batch = _set_col(batch, "alpha_word_frac",
                         pa.array(alpha_frac, pa.float64()))
        return _set_col(batch, "passes_gopher", pa.array(passes, pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def repetition_stats(ds, text_col: str = "text"):
    """Repetition + tokenizer-granularity metrics per document:
    duplicate token bigram/trigram fractions (the Gopher repetition
    signals below the top-word level) and a BPE-ish subword token count.

    Appends ``n_bigrams`` / ``n_trigrams`` / ``n_bpe_tokens`` (int64) and
    ``dup_bigram_frac`` / ``dup_trigram_frac`` (float64, 6 dp,
    1 - distinct/total, 0 for docs too short to form a gram). One
    tokenization feeds both gram sizes; everything stays in the flat
    (hash, row) representation — no per-row Python.
    """

    def _r6(x: np.ndarray) -> np.ndarray:
        return np.floor(x * 1e6 + 0.5) / 1e6

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        n_rows = batch.num_rows
        th, tr = token_hashes(fill_utf8(col))
        out = batch
        for n, label in ((2, "bigram"), (3, "trigram")):
            h, r = _ngrams_from_hashes(th, tr, n_rows, n)
            total = np.bincount(r, minlength=n_rows).astype(np.int64)
            dist = _distinct_per_row(h, r, n_rows)
            frac = _r6(np.where(total > 0, 1.0 - dist / np.maximum(total, 1), 0.0))
            out = _set_col(out, f"n_{label}s", pa.array(total))
            out = _set_col(out, f"dup_{label}_frac",
                           pa.array(frac, pa.float64()))
        bpe = pc.count_substring_regex(fill_utf8(col),
                                       pattern=BPE_RE).cast(pa.int64())
        return _set_col(out, "n_bpe_tokens", bpe)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def token_ngram_hashes(col: pa.Array, n: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """All token ``n``-gram hashes of every row -> (hashes uint64,
    row_id int64). Rows with fewer than ``n`` tokens emit nothing.

    One whitespace tokenization + one rolling polynomial pass over the
    batch's flat token-hash array (windows crossing row boundaries
    masked out) — the token-level sibling of ``kgram_hashes``.
    """
    th, tr = token_hashes(col)
    return _ngrams_from_hashes(th, tr, len(col), n)


def _ngrams_from_hashes(th: np.ndarray, tr: np.ndarray, n_rows: int,
                        n: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling n-gram combine over precomputed (token hash, row) pairs —
    lets one tokenization feed several gram sizes."""
    h, r, _ = _ngrams_with_positions(th, tr, n_rows, n)
    return h, r


def _ngrams_with_positions(th: np.ndarray, tr: np.ndarray, n_rows: int,
                           n: int) -> tuple[np.ndarray, np.ndarray,
                                            np.ndarray]:
    """As ``_ngrams_from_hashes`` plus each window's 0-based TOKEN
    position within its row (what substring-span dedup needs)."""
    empty = (np.zeros(0, np.uint64), np.zeros(0, np.int64),
             np.zeros(0, np.int64))
    m = th.size - n + 1
    if m <= 0:
        return empty
    counts = np.bincount(tr, minlength=n_rows)
    off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    powers = np.empty(n, np.uint64)
    powers[n - 1] = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(n - 2, -1, -1):
            powers[i] = powers[i + 1] * _B
    # scalar-multiplied contiguous slices, NOT a strided broadcast —
    # numpy's uint64 broadcast multiply is ~100x slower (see
    # state/hashing.hash64_multi)
    h = np.zeros(m, np.uint64)
    with np.errstate(over="ignore"):
        for i in range(n):
            h += th[i:m + i] * powers[i]
        h = h * _B + np.uint64(0x9E3779B97F4A7C15)
    pos = np.arange(m, dtype=np.int64)
    row_of = np.searchsorted(off[1:], pos, side="right")
    row_of = np.clip(row_of, 0, n_rows - 1)
    valid = (pos >= off[row_of]) & (pos <= off[row_of + 1] - n)
    return h[valid], row_of[valid], (pos - off[row_of])[valid]


def dedup_substring_spans(ds, text_col: str = "text",
                          id_col: str = "doc_id", *, width: int = 8,
                          num_partitions: int | None = None):
    """Duplicated-substring removal spans — the fixed-width-window form
    of suffix-array substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): every ``width``-token
    window that occurs more than once in the corpus keeps only its
    globally-FIRST occurrence (smallest (doc_id, token position));
    every other occurrence marks its ``[pos, pos+width)`` token range,
    and overlapping marks merge into per-doc removal spans
    (gaps-and-islands). Returns a Dataset (doc_id, span_start,
    span_end), token coordinates, span_end exclusive.

    Scale shape: the occurrence projection is 20 B/row (window hash,
    doc, pos) — raw text never leaves the map side; ONE uniform
    hash-bucket shuffle co-locates equal windows (the uniqueness.py
    bucket pattern: one Python call per bucket, vectorized
    winner-selection inside — never one call per window), and the
    loser stream merges to spans in ONE bucketed-by-doc exchange. No
    driver-side state: a dup-heavy corpus only grows the loser STREAM.
    Window equality is 64-bit rolling-hash equality (the
    decontaminate/ngram_overlap contract; collision odds ~n²/2⁶⁵)."""
    from ..tuning import shuffle_partitions as _sp
    from .events import bucketed_by_key

    nb = num_partitions or _sp()

    def project(batch: pa.Table) -> pa.Table:
        h, row_of, posn = _ngrams_with_positions(
            *token_hashes(batch.column(text_col)), len(batch), width)
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "h": pa.array(h.view(np.int64), pa.int64()),
            "doc_id": pa.array(ids[row_of], pa.int64()),
            "pos": pa.array(posn, pa.int64()),
            "__bkt": pa.array((h % np.uint64(nb)).astype(np.int32),
                              pa.int32())})

    def losers_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64())})
        if t.num_rows == 0 or "h" not in t.column_names:
            return empty
        h = t.column("h").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        posn = t.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((posn, doc, h))
        hs = h[order]
        is_first = np.concatenate([[True], hs[1:] != hs[:-1]])
        losers = order[~is_first]
        if not losers.size:
            return empty
        return pa.table({"doc_id": pa.array(doc[losers], pa.int64()),
                         "pos": pa.array(posn[losers], pa.int64())})

    losers = ds.map_batches(project, batch_format="pyarrow",
                            batch_size=None) \
        .groupby("__bkt", num_partitions=nb) \
        .map_groups(losers_fn, batch_format="pyarrow")

    def per_bucket(df):
        import pandas as pd

        df = df.sort_values(["doc_id", "pos"], kind="mergesort")
        doc = df["doc_id"].to_numpy(dtype=np.int64)
        posn = df["pos"].to_numpy(dtype=np.int64)
        if not doc.size:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "span_start": pd.Series([], dtype="int64"),
                                 "span_end": pd.Series([], dtype="int64")})
        # fixed width => window end is monotone in pos, so one linear
        # break test merges overlapping/adjacent-overlapping marks
        brk = np.concatenate([[True], (doc[1:] != doc[:-1])
                              | (posn[1:] > posn[:-1] + width)])
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], doc.size) - 1
        return pd.DataFrame({"doc_id": doc[starts],
                             "span_start": posn[starts],
                             "span_end": posn[ends] + width})

    return bucketed_by_key(losers, "doc_id", per_bucket,
                           n_buckets=num_partitions)


def decontaminate(ds, bench, n: int = 8, text_col: str = "text",
                  id_col: str = "doc_id",
                  max_grams_broadcast: int = 50_000_000):
    """Flag training documents sharing any token ``n``-gram with a
    benchmark/eval corpus (GPT-3-style decontamination).

    Appends ``n_contaminated`` (distinct benchmark n-grams present in
    the doc, int64) and ``contaminated`` (bool).

    Scale shape: the benchmark side is benchmark-sized by definition —
    its distinct gram hashes (8 bytes each) are reduced per block, then
    driver-merged and broadcast once via ``ray.put``; the training side
    is a stateless map (sorted-array membership via searchsorted), so
    the big side never shuffles. Membership is by 64-bit hash: a
    false flag needs a hash collision between a training gram and a
    benchmark gram (P < |grams|^2 / 2^64 — negligible; documented
    rather than verified because the flag, unlike dedup, drops data
    conservatively). Benchmark gram sets beyond ``max_grams_broadcast``
    raise — co-group via a shuffle join instead.
    """
    import ray

    def bench_partial(batch: pa.Table) -> pa.Table:
        h, _ = token_ngram_hashes(batch.column(text_col), n=n)
        return pa.table({"gram": pa.array(np.unique(h).view(np.int64),
                                          pa.int64())})

    parts = [t for t in ray.get(
        bench.map_batches(bench_partial, batch_format="pyarrow",
                          batch_size=None).to_arrow_refs()) if t.num_rows]
    if parts:
        # sort in UINT64 order (the probe order) — the int64 view used
        # for Arrow transport sorts differently for hashes >= 2^63
        merged = np.unique(np.concatenate(
            [t.column("gram").to_numpy(zero_copy_only=False)
             for t in parts]).view(np.uint64))
    else:
        merged = np.zeros(0, np.uint64)
    if merged.size > max_grams_broadcast:
        raise ValueError(
            f"benchmark has {merged.size} distinct {n}-grams — too large "
            f"to broadcast; co-group grams via a shuffle join instead")
    ref = ray.put(merged)

    def flag(batch: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        nr = batch.num_rows
        h, r = token_ngram_hashes(batch.column(text_col), n=n)
        if grams.size:
            idx = np.minimum(np.searchsorted(grams, h), grams.size - 1)
            hit = grams[idx] == h
        else:
            hit = np.zeros(h.size, bool)
        n_hits = _distinct_per_row(h[hit], r[hit], nr)
        batch = _set_col(batch, "n_contaminated", pa.array(n_hits))
        return _set_col(batch, "contaminated",
                        pa.array(n_hits > 0, pa.bool_()))

    return ds.map_batches(flag, batch_format="pyarrow", batch_size=None)


def salted_group_agg(ds, key: str, value: str, salts: int | None = None):
    """Sum/count/mean of ``value`` per ``key`` via two-stage SALTED
    aggregation — the explicit skew breaker for hot keys.

    A direct ``groupby(key)`` hashes every row of one hot key into the
    same reduce partition (a 5-value key over 100 TB = 5 working
    reducers). Stage 1 here groups by ``(key, salt)`` where the salt is
    a row-position derived int in [0, salts): each hot key spreads over
    ``salts`` partitions and each reducer sees ~1/salts of it. Stage 2
    merges the per-salt partials — at most distinct_keys x salts rows,
    KB-sized. The salt deliberately does NOT depend on the key or the
    data values; any row-uniformizer works since stage 2 re-merges.

    Returns a Dataset (key, n_rows, total, mean_r) with ``mean_r``
    rounded to 6 dp.
    """
    from ray.data.aggregate import Count, Sum

    from ..tuning import shuffle_partitions

    s = salts or shuffle_partitions()

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = np.arange(batch.num_rows, dtype=np.int64) % s
        return batch.select([key, value]).append_column(
            "__salt", pa.array(salt))

    salted = ds.map_batches(add_salt, batch_format="pyarrow",
                            batch_size=None)
    stage1 = salted.groupby([key, "__salt"], num_partitions=s) \
        .aggregate(Sum(value), Count())

    # stage 2: the per-salt partials are <= distinct_keys x salts rows
    # (KB-sized) — one concat + one local Arrow group_by beats a second
    # shuffle, and always emits the canonical schema (empty included)
    def merge(b: pa.Table) -> pa.Table:
        if key not in b.column_names or b.num_rows == 0:
            return pa.table({key: pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64()),
                             "mean_r": pa.array([], pa.float64())})
        g = b.group_by(key).aggregate(
            [(f"sum({value})", "sum"), ("count()", "sum")])
        total = g.column(f"sum({value})_sum").cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        cnt = g.column("count()_sum").cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        mean = np.floor(total / np.maximum(cnt, 1.0) * 1e6 + 0.5) / 1e6
        return pa.table({key: g.column(key),
                         "n_rows": g.column("count()_sum").cast(pa.int64()),
                         "total": g.column(f"sum({value})_sum").cast(pa.int64()),
                         "mean_r": pa.array(mean, pa.float64())})

    return stage1.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None)


def common_ngrams(ds, n: int = 2, min_frac: float = 0.08,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_docs: int | None = None):
    """Corpus-frequent token n-grams — boilerplate-span mining: every
    whitespace-token ``n``-gram appearing in at least ``min_frac`` of all
    documents, with its total frequency ``tf`` and document frequency
    ``df``. (The classic "duplicated line / template text" detector,
    phrased over token windows; cf. Rae et al. 2021 App. A repeated-
    passage filters.)

    Scale shape: the combiner pattern, same as ``token_counts`` — each
    block builds n-gram strings in ONE vectorized pass (split ->
    flatten -> shifted ``binary_join_element_wise`` over the flat token
    array, windows crossing row boundaries masked out), counts distinct
    docs per n-gram LOCALLY (a doc lives in exactly one row of one
    block, so block df partials add exactly), then one keyed groupby
    over partials (rows = distinct n-grams per block, never raw
    occurrences) sums tf/df, and the >= threshold filter prunes to the
    tiny hot set before anything reaches the driver.

    Returns a Dataset (ngram, tf, df).
    """
    from ray.data.aggregate import Sum

    from ..tuning import shuffle_partitions

    if n_docs is None:
        n_docs = ds.count()
    thr = float(min_frac) * float(n_docs)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"ngram": pa.array([], pa.string()),
                          "tf": pa.array([], pa.int64()),
                          "df": pa.array([], pa.int64())})
        toks = pc.utf8_split_whitespace(
            fill_utf8(batch.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # drop empty tokens (leading/trailing whitespace artifacts) so the
        # token sequence matches regex \S+ extraction exactly
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not nonempty.all():
            flat = flat.filter(pa.array(nonempty))
            parent = parent[nonempty]
        m = len(flat) - n + 1
        if m <= 0:
            return empty
        # a window starting at flat position i is valid iff all n tokens
        # belong to the same row
        valid = parent[:m] == parent[n - 1:]
        if not valid.any():
            return empty
        shifted = [flat.slice(j, m) for j in range(n)]
        ngram = pc.binary_join_element_wise(*shifted, " ")
        doc = pc.take(batch.column(id_col), pa.array(parent[:m]))
        t = pa.table({"ngram": ngram, "doc": doc}) \
            .filter(pa.array(valid))
        per_doc = t.group_by(["ngram", "doc"]).aggregate([("doc", "count")])
        g = per_doc.group_by("ngram").aggregate(
            [("doc_count", "sum"), ("doc", "count")])
        return pa.table({"ngram": g.column("ngram"),
                         "tf": g.column("doc_count_sum").cast(pa.int64()),
                         "df": g.column("doc_count").cast(pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = parts.groupby("ngram", num_partitions=shuffle_partitions()) \
        .aggregate(Sum("tf"), Sum("df"))

    _empty = pa.table({"ngram": pa.array([], pa.string()),
                       "tf": pa.array([], pa.int64()),
                       "df": pa.array([], pa.int64())})

    def finish(b: pa.Table) -> pa.Table:
        if "ngram" not in b.column_names:
            return _empty
        out = pa.table({"ngram": b.column("ngram"),
                        "tf": b.column("sum(tf)").cast(pa.int64()),
                        "df": b.column("sum(df)").cast(pa.int64())})
        return out.filter(pc.greater_equal(
            pc.cast(out.column("df"), pa.float64()), thr))

    return merged.map_batches(finish, batch_format="pyarrow",
                              batch_size=None)


_MAX_FREQUENT_SEGMENTS = 2_000_000  # broadcast guard: hot set must be small


def remove_frequent_lines(ds, *, min_frac: float | None = None,
                          min_docs: int | None = None, delim: str = "\n",
                          text_col: str = "text", out_col: str = "cleaned",
                          n_docs: int | None = None):
    """CCNet-style duplicated-segment removal: delete every
    delim-separated segment (line / sentence / token, caller's choice)
    that appears in at least ``min_docs`` documents (or ``min_frac`` of
    the corpus), then reassemble each document from its surviving
    segments in original order. The classic boilerplate scrubber
    (headers, footers, nav text) from Wenzek et al. 2019 (CCNet) §3.1,
    phrased over an arbitrary delimiter. ``common_ngrams`` MINES the
    hot spans; this op REMOVES them.

    Scale shape, two passes, both vectorized:
      1. df-count combiner — each block collapses to its distinct
         (segment, local doc) pairs, then to per-segment doc counts
         (distinct segments per block, never raw occurrences, enter
         ONE keyed shuffle); the >= threshold filter prunes to the hot
         set BEFORE collection, and only that boilerplate set (small
         by definition — guarded) is broadcast via ``ray.put``.
      2. stateless scrub — re-split, drop hot segments with one
         vectorized ``is_in``, rebuild list offsets from a bincount,
         ``binary_join`` back. No shuffle.

    SQL parity: a document whose every segment is removed (and a NULL
    input) yields NULL, matching string_agg-over-no-rows through a
    LEFT JOIN. A document with no hot segments round-trips
    byte-identical. Returns the input Dataset + ``out_col``.
    """
    import ray
    from ray.data.aggregate import Sum

    from ..tuning import shuffle_partitions

    if (min_frac is None) == (min_docs is None):
        raise ValueError("remove_frequent_lines: give exactly one of "
                         "min_frac / min_docs")
    if min_docs is None:
        if n_docs is None:
            n_docs = ds.count()
        min_docs = float(min_frac) * float(n_docs)

    def df_partial(batch: pa.Table) -> pa.Table:
        segs = pc.split_pattern(batch.column(text_col), delim)
        if isinstance(segs, pa.ChunkedArray):
            segs = segs.combine_chunks()
        flat = pc.list_flatten(segs)          # null texts emit no segments
        parent = pc.list_parent_indices(segs)
        pairs = pa.table({"seg": flat, "p": parent}) \
            .group_by(["seg", "p"]).aggregate([([], "count_all")])
        g = pairs.group_by("seg").aggregate([([], "count_all")])
        return pa.table({"seg": g.column("seg"),
                         "df": g.column("count_all").cast(pa.int64())})

    parts = ds.map_batches(df_partial, batch_format="pyarrow",
                           batch_size=None)
    merged = parts.groupby("seg", num_partitions=shuffle_partitions()) \
        .aggregate(Sum("df"))

    def hot_only(b: pa.Table) -> pa.Table:
        if "seg" not in b.column_names:
            return pa.table({"seg": pa.array([], pa.string())})
        keep = pc.greater_equal(pc.cast(b.column("sum(df)"), pa.float64()),
                                pa.scalar(float(min_docs)))
        return pa.table({"seg": b.column("seg").filter(keep)})

    hot = merged.map_batches(hot_only, batch_format="pyarrow",
                             batch_size=None).take_all()
    if len(hot) > _MAX_FREQUENT_SEGMENTS:
        raise ValueError(
            f"remove_frequent_lines: {len(hot)} segments cross the "
            f"threshold — too many to broadcast; raise the threshold "
            f"(a 'boilerplate' set this large means the corpus is mostly "
            f"duplicated text: dedup documents first)")
    hot_ref = ray.put(pa.array([r["seg"] for r in hot], pa.string()))

    def scrub(batch: pa.Table) -> pa.Table:
        hot_set = ray.get(hot_ref)
        segs = pc.split_pattern(batch.column(text_col), delim)
        if isinstance(segs, pa.ChunkedArray):
            segs = segs.combine_chunks()
        flat = pc.list_flatten(segs)
        parent = pc.list_parent_indices(segs).to_numpy(zero_copy_only=False)
        keep = pc.invert(pc.is_in(flat, value_set=hot_set)) \
            .to_numpy(zero_copy_only=False)
        kept_flat = flat.filter(pa.array(keep))
        counts = np.bincount(parent[keep], minlength=batch.num_rows)
        offsets = np.zeros(batch.num_rows + 1, np.int32)
        np.cumsum(counts, out=offsets[1:])
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     kept_flat),
            pa.scalar(delim))
        joined = pc.if_else(pa.array(counts == 0),
                            pa.nulls(batch.num_rows, pa.string()), joined)
        return batch.append_column(out_col, joined)

    return ds.map_batches(scrub, batch_format="pyarrow", batch_size=None)


def dedup_lines_within_doc(ds, *, delim: str = "\n", text_col: str = "text",
                           out_col: str = "cleaned"):
    """Remove REPEATED delim-separated segments within each document,
    keeping the first occurrence in place — the intra-document half of
    CCNet-style line dedup (``remove_frequent_lines`` is the
    cross-corpus half). Collapses copy-pasted paragraphs, repeated
    navigation strings and template stutter inside a single page.

    Entirely STATELESS: first-occurrence detection is per row, so this
    is one vectorized pass per block (split -> dictionary-encode ->
    np.unique first-index over packed (row, code) keys -> rebuild +
    join) with NO shuffle and no broadcast state — it streams at any
    scale. NULL text stays NULL; a document without repeats round-trips
    byte-identical. Returns the input Dataset + ``out_col``."""

    def fn(batch: pa.Table) -> pa.Table:
        segs = pc.split_pattern(batch.column(text_col), delim)
        if isinstance(segs, pa.ChunkedArray):
            segs = segs.combine_chunks()
        flat = pc.list_flatten(segs)
        parent = pc.list_parent_indices(segs).to_numpy(zero_copy_only=False)
        codes = flat.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.uint64)
        comb = (parent.astype(np.uint64) << np.uint64(32)) | codes
        keep = np.zeros(len(flat), bool)
        _, first = np.unique(comb, return_index=True)
        keep[first] = True
        kept_flat = flat.filter(pa.array(keep))
        counts = np.bincount(parent[keep], minlength=batch.num_rows)
        offsets = np.zeros(batch.num_rows + 1, np.int32)
        np.cumsum(counts, out=offsets[1:])
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     kept_flat),
            pa.scalar(delim))
        joined = pc.if_else(pa.array(counts == 0),
                            pa.nulls(batch.num_rows, pa.string()), joined)
        return batch.append_column(out_col, joined)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def dedup_segments_global(ds, *, delim: str = "\n", text_col: str = "text",
                          id_col: str = "doc_id", out_col: str = "cleaned",
                          num_partitions: int | None = None):
    """Corpus-WIDE keep-first segment dedup (the Dolma/CCNet paragraph-
    level dedup step, phrased over an arbitrary delimiter): every
    delim-separated segment keeps only its FIRST occurrence in the
    whole corpus — first = smallest (doc id, position) — and each
    document is reassembled from its surviving segments in original
    order. ``remove_frequent_lines`` deletes segments that are TOO
    COMMON everywhere; this keeps one canonical copy of every segment.

    Scale shape, dup-heavy-safe (nothing ever collects to the driver):
      1. occurrence projection — one vectorized split per block emits
         (segment hash64, doc, pos), 24 B per occurrence; the text
         itself does not enter the exchange.
      2. ONE keyed shuffle on uniform hash buckets; each bucket marks
         its winners with one lexsort across ALL its hashes (first of
         each hash run) and emits only the LOSER (doc, pos) pairs.
      3. losers shuffle once more, keyed by doc bucket, and collapse
         to one (doc, positions list<int64>) row per affected doc.
      4. the loser lists join back size-aware (``sized_join`` —
         broadcast while they fit, hash exchange past the threshold)
         and a stateless scrub drops the listed positions and rejoins.

    SQL parity: a NULL text, and a document whose EVERY segment loses,
    yield NULL (string_agg over no rows through a left join). Keyed on
    the 64-bit segment hash, like ``exact_dedup_rows`` — a hash
    collision would conflate two distinct segments (~2e-10 at 1e5
    distinct segments); use the exact-verify dedup forms when that
    cannot be tolerated. Returns (id_col, out_col)."""
    import ray

    from ..state import hash64
    from ..tuning import shuffle_partitions
    from .join import sized_join

    n = num_partitions or shuffle_partitions()

    def occ(batch: pa.Table) -> pa.Table:
        # null texts emit no occurrences (SQL: string_split(NULL)
        # unnests to zero rows) — they must not contest the races
        batch = batch.filter(pc.is_valid(batch.column(text_col)))
        segs = pc.split_pattern(fill_utf8(batch.column(text_col)), delim)
        if isinstance(segs, pa.ChunkedArray):
            segs = segs.combine_chunks()
        flat = pc.list_flatten(segs)
        parent = pc.list_parent_indices(segs) \
            .to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(segs).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        pos = np.arange(len(flat), dtype=np.int64) - starts[parent]
        h = hash64(flat).view(np.int64)
        doc = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)[parent]
        bkt = (h.view(np.uint64) % np.uint64(n)).astype(np.int32)
        return pa.table({"h": pa.array(h), "doc": pa.array(doc),
                         "pos": pa.array(pos),
                         "__bkt": pa.array(bkt, pa.int32())})

    def losers_of_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "h" not in t.column_names:
            empty = pa.array([], pa.int64())
            return pa.table({"doc": empty, "pos": empty})
        h = t.column("h").to_numpy(zero_copy_only=False)
        d = t.column("doc").to_numpy(zero_copy_only=False)
        p = t.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d, h))
        hs = h[order]
        first = np.concatenate(([True], hs[1:] != hs[:-1]))
        lose = order[~first]
        return pa.table({"doc": pa.array(d[lose]),
                         "pos": pa.array(p[lose])})

    losers = (ds.map_batches(occ, batch_format="pyarrow", batch_size=None)
              .groupby("__bkt", num_partitions=n)
              .map_groups(losers_of_bucket, batch_format="pyarrow"))

    def rebucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc" not in t.column_names:
            empty = pa.array([], pa.int64())
            return pa.table({"doc": empty, "pos": empty,
                             "__dbkt": pa.array([], pa.int32())})
        d = t.column("doc").to_numpy(zero_copy_only=False)
        return t.append_column("__dbkt", pa.array(
            (d.astype(np.uint64) % np.uint64(n)).astype(np.int32),
            pa.int32()))

    def lists_of_bucket(t: pa.Table) -> pa.Table:
        # positions ride as a comma-joined string: pyarrow's hash join
        # cannot carry list-typed payload columns, a string can
        if t.num_rows == 0 or "doc" not in t.column_names:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "drop_pos": pa.array([], pa.string())})
        g = t.select(["doc", "pos"]).group_by("doc") \
            .aggregate([("pos", "list")])
        lst = g.column("pos_list")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        joined = pc.binary_join(
            pc.cast(lst, pa.list_(pa.string())), pa.scalar(","))
        return pa.table({"doc": g.column("doc"), "drop_pos": joined})

    loser_lists = (losers.map_batches(rebucket, batch_format="pyarrow",
                                      batch_size=None)
                   .groupby("__dbkt", num_partitions=n)
                   .map_groups(lists_of_bucket, batch_format="pyarrow")
                   .materialize())
    # compact away the schema-less empty shuffle partitions (Ray's hash
    # shuffle emits them with no schema at all — see graph.py) so the
    # join sees ONE schema; n_lists==0 short-circuits the join entirely
    n_lists = loser_lists.count()

    proj = ds.map_batches(
        lambda t, c=(id_col, text_col): t.select(list(c)),
        batch_format="pyarrow", batch_size=None).materialize()
    if n_lists == 0:
        empty_lists = pa.table(
            {"doc": pa.array([], pa.int64()),
             "drop_pos": pa.array([], pa.string())})
        import ray.data as _rd
        loser_lists = _rd.from_arrow(empty_lists)
    else:
        loser_lists = loser_lists.repartition(min(n, n_lists)).materialize()
    joined = sized_join(proj, loser_lists, on=id_col, right_on="doc",
                        how="left outer",
                        left_bytes=proj.size_bytes(),
                        right_bytes=loser_lists.size_bytes())

    def scrub(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        null_in = pc.is_null(txt).to_numpy(zero_copy_only=False)
        segs = pc.split_pattern(fill_utf8(txt), delim)
        if isinstance(segs, pa.ChunkedArray):
            segs = segs.combine_chunks()
        flat = pc.list_flatten(segs)
        parent = pc.list_parent_indices(segs) \
            .to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(segs).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        pos = np.arange(len(flat), dtype=np.int64) - starts[parent]
        keep = np.ones(len(flat), bool)
        dp = batch.column("drop_pos")
        if isinstance(dp, pa.ChunkedArray):
            dp = dp.combine_chunks()
        dlists = pc.split_pattern(dp, ",")       # null rows emit nothing
        dflat = pc.cast(pc.list_flatten(dlists), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        dparent = pc.list_parent_indices(dlists) \
            .to_numpy(zero_copy_only=False)
        if dflat.size:
            big = np.int64(1) << np.int64(32)
            drop_keys = dparent.astype(np.int64) * big + dflat
            occ_keys = parent.astype(np.int64) * big + pos
            keep &= ~np.isin(occ_keys, drop_keys)
        kept_flat = flat.filter(pa.array(keep))
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        counts = np.bincount(parent[keep], minlength=batch.num_rows)
        offsets = np.zeros(batch.num_rows + 1, np.int32)
        np.cumsum(counts, out=offsets[1:])
        joined_txt = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     kept_flat),
            pa.scalar(delim))
        joined_txt = pc.if_else(pa.array((counts == 0) | null_in),
                                pa.nulls(batch.num_rows, pa.string()),
                                joined_txt)
        return pa.table({id_col: batch.column(id_col),
                         out_col: joined_txt})

    return joined.map_batches(scrub, batch_format="pyarrow",
                              batch_size=None)
