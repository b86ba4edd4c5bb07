"""Text analysis over the documents/codetable text columns — the
training-data-pipeline operators (language ID, quality scoring, token
counting, document fingerprinting), all vectorized per Arrow batch.

Scale shape: every function is a stateless ``map_batches`` stage
(closure-compiled patterns / stopword profiles — no per-batch setup, no
Python loop over rows in any hot path). The only nontrivial kernel is the
flat rolling k-gram hash shared with MinHash dedup (see ``_kgram``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["text_stats", "add_quality", "add_lang_id", "add_fingerprint",
           "kgram_hashes", "token_hashes", "token_counts", "tfidf_top_terms",
           "chunk_documents", "code_line_stats", "unigram_logprob",
           "dsir_log_ratio", "zipf_fit", "hashed_vectorizer", "bm25_scores",
           "jsd_segments", "fill_utf8"]

_B = np.uint64(1099511628211)          # FNV prime as polynomial base
_TOKEN_RE = r"\S+"


def fill_utf8(col):
    """Null-safe utf8 coercion shared by every text kernel: nulls become
    "" and an arrow ``null``-typed column (a block whose text values are
    ALL null — from_pylist/JSON sources degrade the type) casts to
    string first, since ``pc.fill_null(null_col, "")`` cannot build a
    string scalar of null type. Keeps text ops batch-composition-proof."""
    if pa.types.is_null(col.type):
        col = col.cast(pa.string())
    return pc.fill_null(col, "")


# ---------------------------------------------------------------------------
# flat vectorized k-gram rolling hash (shared with MinHash / fingerprints)
# ---------------------------------------------------------------------------

def _flat_utf8(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 buffer, row offsets) of a string column, zero-copy where
    arrow allows. Nulls become empty strings."""
    col = fill_utf8(col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # ensure plain string array with flat offsets
    col = col.cast(pa.string())
    buf = np.frombuffer(col.buffers()[2] or b"", dtype=np.uint8)
    raw = np.frombuffer(col.buffers()[1], dtype=np.int32)
    off = raw[col.offset:col.offset + len(col) + 1].astype(np.int64)
    return buf, off


def kgram_hashes(col: pa.Array, k: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """All character k-gram hashes of every row, computed in ONE vectorized
    pass over the batch's flat utf8 buffer.

    Returns (hashes uint64, row_id int64) where hashes crossing row
    boundaries are already removed. Rows shorter than k contribute a single
    whole-row hash so short documents still fingerprint."""
    buf, off = _flat_utf8(col)
    n_rows = len(off) - 1
    if buf.size == 0:
        # all-empty batch: emit NO hashes, matching what empty rows get in
        # a mixed batch — fingerprints must not depend on batch layout
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    data = buf.astype(np.uint64)
    n = data.size
    if n < k:
        pad = np.zeros(k, np.uint64)
        pad[:n] = data
        data, n = pad, k
    powers = np.empty(k, np.uint64)
    powers[k - 1] = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(k - 2, -1, -1):
            powers[i] = powers[i + 1] * _B
    # accumulate k scalar-multiplied CONTIGUOUS slices instead of a
    # strided-window broadcast multiply: numpy's uint64 broadcast path is
    # ~100x slower than its scalar form (see state/hashing.hash64_multi)
    m = n - k + 1
    h = np.zeros(m, np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            h += data[i:m + i] * powers[i]
        h = h * _B + np.uint64(0x9E3779B97F4A7C15)  # final mix

    starts = off[:-1]
    lens = np.diff(off)
    # positions p in [starts[r], off[r+1]-k] belong to row r
    pos = np.arange(h.size, dtype=np.int64)
    row_of = np.searchsorted(off[1:], pos, side="right")
    row_of = np.clip(row_of, 0, n_rows - 1)
    valid = (pos <= (off[row_of + 1] - k)) & (pos >= off[row_of])
    out_h, out_r = h[valid], row_of[valid]
    # rows with len in (0, k): hash the whole (short) row once
    short = np.nonzero((lens > 0) & (lens < k))[0]
    if short.size:
        sh = np.empty(short.size, np.uint64)
        for j, r in enumerate(short):  # rare path: rows shorter than k chars
            with np.errstate(over="ignore"):
                sh[j] = (data[off[r]:off[r + 1]] * powers[:lens[r]]).sum(dtype=np.uint64) * _B
        out_h = np.concatenate([out_h, sh])
        out_r = np.concatenate([out_r, short.astype(np.int64)])
    return out_h, out_r


def token_hashes(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-token hashes of every row -> (hashes uint64, row_id).
    Tokenization + hashing stay in Arrow/polars kernels."""
    from ..state import hash64

    toks = pc.split_pattern_regex(fill_utf8(col), pattern=r"\s+")
    flat = pc.list_flatten(toks)
    nonempty = pc.not_equal(flat, "")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keep = nonempty.to_numpy(zero_copy_only=False)
    return hash64(flat.filter(nonempty)), row_of[keep]


# ---------------------------------------------------------------------------
# stats / quality
# ---------------------------------------------------------------------------


def code_line_stats(ds, text_col: str = "content",
                    comment_prefixes: tuple = ("#", "//")):
    """Per-file line metrics for source-code tables: ``n_lines``
    (SQL ``string_split(s, \\n)`` semantics — empty/null text is one
    empty line, a trailing newline adds a final empty line),
    ``max_line_len``, ``n_nonempty_lines`` (lengths in BYTES, ==
    chars for ASCII sources; DuckDB ``strlen``) and
    ``n_comment_lines`` (lines whose first non-space/tab bytes are one
    of ``comment_prefixes`` — SQL ``regexp_matches(x, '^[ \\t]*(#|//)')``).

    Fully vectorized, zero shuffle: ONE newline scan of the batch's
    flat utf8 buffer; every line of every row becomes a (start, end)
    segment by pairing the sorted line starts (row starts + newline+1
    positions) with the sorted line ends (newline positions + row
    ends) — segments of consecutive rows meet only at boundary points,
    so the i-th smallest start always pairs with the i-th smallest end.
    Per-row max/count reduce via ``reduceat`` on the row-major
    segments. No per-row Python."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        buf, off = _flat_utf8(col)
        n = len(off) - 1
        nl = np.flatnonzero(buf == 10)
        nl = nl[(nl >= off[0]) & (nl < off[-1])]
        n_nl = np.bincount(np.searchsorted(off[1:], nl, side="right"),
                           minlength=n).astype(np.int64)
        counts = n_nl + 1                    # lines per row (>= 1)
        starts = np.sort(np.concatenate([off[:-1], nl + 1]))
        ends = np.sort(np.concatenate([nl, off[1:]]))
        line_len = ends - starts
        row_first = np.cumsum(counts) - counts
        max_len = np.maximum.reduceat(line_len, row_first) if n else \
            np.zeros(0, np.int64)
        line_row = np.repeat(np.arange(n, dtype=np.int64), counts)
        nonempty = np.bincount(line_row[line_len > 0],
                               minlength=n).astype(np.int64)

        # comment lines: the first non-space/tab byte(s) of each line.
        # Vectorized skip-indent: positions of all non-[ \t] bytes, then
        # one searchsorted gives each line's first such position.
        ns = np.flatnonzero((buf != 32) & (buf != 9))
        if ns.size:
            idx = np.searchsorted(ns, starts)
            first = np.where(idx < ns.size, ns[np.minimum(idx, ns.size - 1)],
                             np.int64(buf.size))
        else:
            first = np.full(starts.size, buf.size, np.int64)
        has_body = first < ends                  # a non-indent byte in-line
        is_comment = np.zeros(starts.size, bool)
        pos = first[has_body]
        for p in comment_prefixes:
            pb = p.encode()
            ok = np.ones(pos.size, bool)
            for j, byte in enumerate(pb):
                pj = pos + j
                ok &= (pj < ends[has_body]) & (buf[np.minimum(pj, buf.size - 1)] == byte)
            is_comment[has_body] |= ok
        n_comment = np.bincount(line_row[is_comment],
                                minlength=n).astype(np.int64)

        batch = _set_col(batch, "n_lines", pa.array(counts, pa.int64()))
        batch = _set_col(batch, "max_line_len", pa.array(max_len, pa.int64()))
        batch = _set_col(batch, "n_nonempty_lines",
                         pa.array(nonempty, pa.int64()))
        batch = _set_col(batch, "n_comment_lines",
                         pa.array(n_comment, pa.int64()))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _set_col(batch: pa.Table, name: str, arr) -> pa.Table:
    """Append or overwrite a column (input tables may already carry a
    same-named column, e.g. documents.n_chars)."""
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, arr)
    return batch.append_column(name, arr)

def text_stats(ds, text_col: str = "text"):
    """Append n_chars, n_tokens, n_digits, n_punct, digit_ratio,
    punct_ratio columns (all pyarrow kernels)."""

    def fn(batch: pa.Table) -> pa.Table:
        col = fill_utf8(batch.column(text_col))
        n_chars = pc.utf8_length(col).cast(pa.int64())
        n_tokens = pc.count_substring_regex(col, pattern=_TOKEN_RE).cast(pa.int64())
        n_digits = pc.count_substring_regex(col, pattern=r"[0-9]").cast(pa.int64())
        n_punct = pc.count_substring_regex(col, pattern=r"[[:punct:]]").cast(pa.int64())
        denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
        batch = _set_col(batch, "n_chars", n_chars)
        batch = _set_col(batch, "n_tokens", n_tokens)
        batch = _set_col(batch, "n_digits", n_digits)
        batch = _set_col(batch, "n_punct", n_punct)
        batch = _set_col(batch,
            "digit_ratio", pc.divide(n_digits.cast(pa.float64()), denom.cast(pa.float64())))
        batch = _set_col(batch,
            "punct_ratio", pc.divide(n_punct.cast(pa.float64()), denom.cast(pa.float64())))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _distinct_per_row(hashes: np.ndarray, row_of: np.ndarray, n_rows: int) -> np.ndarray:
    """Distinct count per row from (hash, row) pairs — one lexsort, no
    per-row Python."""
    if hashes.size == 0:
        return np.zeros(n_rows, np.int64)
    order = np.lexsort((hashes, row_of))
    h, r = hashes[order], row_of[order]
    new = np.empty(h.size, dtype=bool)
    new[0] = True
    new[1:] = (h[1:] != h[:-1]) | (r[1:] != r[:-1])
    return np.bincount(r[new], minlength=n_rows).astype(np.int64)


def add_quality(ds, text_col: str = "text"):
    """Quality score in [0,1]: token diversity x length saturation x
    punctuation penalty — the standard cheap pre-filter for web/code
    training corpora. Exact formula (SQL-expressible, see oracle):
    (distinct_tokens/n_tokens) * min(n_tokens/100, 1) * (1 - punct_ratio)."""

    def fn(batch: pa.Table) -> pa.Table:
        col = fill_utf8(batch.column(text_col))
        n = batch.num_rows
        th, tr = token_hashes(col)
        n_tokens = np.bincount(tr, minlength=n).astype(np.float64)
        distinct = _distinct_per_row(th, tr, n).astype(np.float64)
        n_chars = pc.utf8_length(col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        n_punct = pc.count_substring_regex(col, pattern=r"[[:punct:]]") \
            .cast(pa.float64()).to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            diversity = np.where(n_tokens > 0, distinct / np.maximum(n_tokens, 1), 0.0)
            sat = np.minimum(n_tokens / 100.0, 1.0)
            punct_pen = 1.0 - n_punct / np.maximum(n_chars, 1.0)
        q = diversity * sat * punct_pen
        batch = _set_col(batch, "n_tokens", pa.array(n_tokens.astype(np.int64)))
        batch = _set_col(batch, "distinct_tokens", pa.array(distinct.astype(np.int64)))
        return _set_col(batch, "quality", pa.array(q, pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# language ID (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "on",
           "with", "as", "was", "at", "by", "an", "be", "this", "are", "or"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "los", "se", "del",
           "las", "por", "con", "una", "su", "para", "es", "al", "lo", "como"},
    "de": {"der", "die", "und", "in", "den", "von", "zu", "das", "mit",
           "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein",
           "eine", "als"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "une",
           "que", "est", "pour", "qui", "dans", "par", "plus", "pas", "au",
           "sur"},
}


def add_lang_id(ds, text_col: str = "text", min_hits: int = 2):
    """Append ``lang_id``: argmax of stopword-profile hit counts (ties and
    low-evidence rows -> 'unknown'). Profiles are hashed once at plan time
    and the per-batch score is a vectorized isin per language."""
    from ..state import hash64

    langs = sorted(_STOPWORDS)
    profiles = {lg: np.sort(hash64(sorted(_STOPWORDS[lg]))) for lg in langs}

    def fn(batch: pa.Table) -> pa.Table:
        col = pc.utf8_lower(fill_utf8(batch.column(text_col)))
        n = batch.num_rows
        th, tr = token_hashes(col)
        scores = np.zeros((len(langs), n), np.int64)
        for i, lg in enumerate(langs):
            hit = np.isin(th, profiles[lg], assume_unique=False)
            scores[i] = np.bincount(tr[hit], minlength=n)
        best = scores.argmax(axis=0)
        best_score = scores.max(axis=0)
        runner = np.sort(scores, axis=0)[-2] if len(langs) > 1 else np.zeros(n)
        decided = (best_score >= min_hits) & (best_score > runner)
        out = np.where(decided, np.array(langs, dtype=object)[best], "unknown")
        return _set_col(batch, "lang_id", pa.array(out, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# document fingerprint (rolling-hash min-sketch)
# ---------------------------------------------------------------------------

def add_fingerprint(ds, text_col: str = "text", k: int = 8):
    """Append ``fingerprint``: min k-gram rolling hash per document
    (int64) — equal documents always agree; a cheap first-stage near-dup
    blocking key (full MinHash lives in pipelines/dedup.py)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        h, r = kgram_hashes(batch.column(text_col), k=k)
        fp = np.full(n, np.uint64(0xFFFFFFFFFFFFFFFF))
        np.minimum.at(fp, r, h)
        return _set_col(batch, "fingerprint", pa.array(fp.view(np.int64), pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# vocabulary build (token tf / df)
# ---------------------------------------------------------------------------

def token_counts(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus vocabulary: one row per whitespace token with ``tf`` (total
    occurrences) and ``df`` (number of documents containing it).

    Scale shape: the combiner pattern — each block computes its own
    (token, tf, df) partial with pure Arrow kernels (split -> flatten ->
    two-level group_by), then ONE keyed groupby over the partials (rows =
    distinct tokens per block, never raw token occurrences) sums tf/df.
    ``df`` partials add exactly because a document lives in one row of
    one block. Returns a Dataset (token, tf, df)."""
    from ray.data.aggregate import Sum

    from ..tuning import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(
            fill_utf8(batch.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parent = pc.list_parent_indices(toks)
        flat = pa.table({
            "token": pc.list_flatten(toks),
            "doc": pc.take(batch.column(id_col), parent),
        }).filter(pc.not_equal(pc.list_flatten(toks), ""))
        per_doc = flat.group_by(["token", "doc"]).aggregate([("doc", "count")])
        g = per_doc.group_by("token").aggregate(
            [("doc_count", "sum"), ("doc", "count")])
        return pa.table({"token": g.column("token"),
                         "tf": g.column("doc_count_sum").cast(pa.int64()),
                         "df": g.column("doc_count").cast(pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = parts.groupby("token", num_partitions=shuffle_partitions()) \
        .aggregate(Sum("tf"), Sum("df"))

    _empty = pa.table({"token": pa.array([], pa.string()),
                       "tf": pa.array([], pa.int64()),
                       "df": pa.array([], pa.int64())})

    def rename(b: pa.Table) -> pa.Table:
        if "token" not in b.column_names:   # empty reduce partition:
            return _empty                   # Ray emits a schema-less block
        return pa.table({"token": b.column("token"),
                         "tf": b.column("sum(tf)").cast(pa.int64()),
                         "df": b.column("sum(df)").cast(pa.int64())})

    return merged.map_batches(rename, batch_format="pyarrow", batch_size=None)


def tfidf_top_terms(ds, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 5, n_docs: int | None = None,
                    max_vocab_broadcast: int = 5_000_000):
    """Top-``k`` TF-IDF terms per document (score = tf * ln(N/df),
    ranked by rounded score desc then token asc — deterministic ties).

    Scale shape: ``token_counts`` builds the (token, df) vocabulary
    distributedly; the vocabulary (one row per DISTINCT token —
    dimension-sized for natural language) broadcasts via ``ray.put``
    and a stateless map scores each document locally (a document lives
    in exactly one row of one block, so per-doc tf needs no exchange)
    and emits its top-k. Vocabularies beyond ``max_vocab_broadcast``
    raise — co-group the tokens through ``shuffle_join`` instead.
    Returns a Dataset (doc_id, token, tfidf, rank)."""
    import ray

    if n_docs is None:
        n_docs = ds.count()
    vocab = token_counts(ds, text_col, id_col).materialize()
    if vocab.count() > max_vocab_broadcast:
        raise ValueError(
            f"vocabulary has {vocab.count()} tokens — too large to "
            f"broadcast; co-group tokens with df via shuffle_join instead")
    blocks = [t for t in ray.get(vocab.to_arrow_refs()) if t.num_rows]
    vt = pa.concat_tables(blocks) if blocks else \
        pa.table({"token": pa.array([], pa.string()),
                  "df": pa.array([], pa.int64())})
    df_map = dict(zip(vt.column("token").to_pylist(),
                      vt.column("df").to_numpy(zero_copy_only=False)))
    ref = ray.put(df_map)
    ln_n = float(np.log(max(n_docs, 1)))

    def score(batch: pa.Table) -> pa.Table:
        df_map = ray.get(ref)
        toks = pc.utf8_split_whitespace(
            fill_utf8(batch.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parent = pc.list_parent_indices(toks)
        flat_tok = pc.list_flatten(toks)
        keep = pc.not_equal(flat_tok, "")
        flat = pa.table({"token": flat_tok,
                         "doc": pc.take(batch.column(id_col), parent)}) \
            .filter(keep)
        g = flat.group_by(["doc", "token"]).aggregate([("token", "count")])
        docs = g.column("doc").to_numpy(zero_copy_only=False)
        tokens = g.column("token").to_pylist()
        tf = g.column("token_count").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # df lookup once per DISTINCT token in the group table
        uniq, inv = np.unique(tokens, return_inverse=True)
        dfs = np.array([df_map.get(t, 1) for t in uniq], np.float64)[inv]
        # half-away rounding (SQL ROUND semantics); scores are >= 0
        tfidf = np.floor(tf * (ln_n - np.log(dfs)) * 1e6 + 0.5) / 1e6
        # per-doc top-k: one lexsort (doc asc, score desc, token asc)
        tok_rank = np.unique(np.asarray(tokens, dtype=object),
                             return_inverse=True)[1]
        order = np.lexsort((tok_rank, -tfidf, docs))
        d = docs[order]
        new_doc = np.concatenate([[True], d[1:] != d[:-1]])
        pos = np.arange(d.size) - \
            np.maximum.accumulate(np.where(new_doc, np.arange(d.size), 0))
        sel = order[pos < k]
        rank = (pos[pos < k] + 1).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(docs[sel], pa.int64()),
            "token": pa.array([tokens[i] for i in sel], pa.string()),
            "tfidf": pa.array(tfidf[sel], pa.float64()),
            "rank": pa.array(rank, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# document chunking (context-window splitting)
# ---------------------------------------------------------------------------

def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    max_tokens: int = 128, stride: int | None = None):
    """Split each document into token-window chunks of ``max_tokens``
    whitespace tokens, hopping by ``stride`` (default = max_tokens,
    i.e. non-overlapping; stride < max_tokens gives overlapping
    context windows). Emits (doc_id, chunk_id, chunk_text, n_tokens).

    Fully vectorized flat-map: one split per batch, then one
    list_slice + binary_join per CHUNK INDEX present in the batch (not
    per row). Empty documents produce no chunks. Stateless map — chunks
    of a document never need to see other documents, so this is the
    embarrassing-parallel stage before embedding/tokenization."""
    if stride is None:
        stride = max_tokens
    if stride <= 0 or max_tokens <= 0 or stride > max_tokens:
        raise ValueError("need 0 < stride <= max_tokens")

    def fn(batch: pa.Table) -> pa.Table:
        txt = pc.utf8_trim_whitespace(fill_utf8(batch.column(text_col)))
        toks = pc.split_pattern_regex(txt, pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = np.where(pc.equal(txt, "").to_numpy(zero_copy_only=False), 0, n)
        # chunks per doc: windows [i*stride, i*stride+max_tokens) while
        # i*stride < n
        m = np.where(n == 0, 0, (np.maximum(n - 1, 0) // stride) + 1)
        ids = batch.column(id_col)
        parts = []
        for i in range(int(m.max()) if m.size else 0):
            sel = np.flatnonzero(m > i)
            idx = pa.array(sel, pa.int64())
            sl = pc.list_slice(pc.take(toks, idx), start=i * stride,
                               stop=i * stride + max_tokens)
            parts.append(pa.table({
                id_col: pc.take(ids, idx),
                "chunk_id": pa.array(np.full(sel.size, i, np.int64)),
                "chunk_text": pc.binary_join(sl, " "),
                "n_tokens": pa.array(
                    np.minimum(max_tokens, n[sel] - i * stride), pa.int64()),
            }))
        if not parts:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "chunk_id": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64())})
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# unigram language-model document scoring (perplexity-style quality filter)
# ---------------------------------------------------------------------------

def unigram_logprob(ds, text_col: str = "text", id_col: str = "doc_id",
                    max_vocab_broadcast: int = 5_000_000):
    """Per-document average unigram log-probability under the corpus's
    own unigram model — the classic cheap perplexity proxy used to rank
    documents for training-data quality filtering (low avg logprob =
    rare-token-heavy = candidate junk).

    Scale shape: two passes. Pass 1 fits the model distributedly
    (``token_counts`` — combiner partials + one keyed groupby over
    DISTINCT tokens); the fitted (token -> tf) table is dimension-sized
    for natural language and broadcasts once via ``ray.put``. Pass 2 is
    a stateless map: flat-split each batch, look up log p per distinct
    token, segment-sum by document. Documents with zero tokens emit no
    row (no probability is defined for them). Vocabularies beyond
    ``max_vocab_broadcast`` raise — shuffle-join tokens against the
    model instead. Returns a Dataset (id, n_tokens, avg_logprob) with
    avg_logprob rounded half-away-from-zero to 6 decimals (SQL ROUND
    semantics, so results are exactly comparable to an oracle)."""
    import ray

    vocab = token_counts(ds, text_col, id_col).materialize()
    if vocab.count() > max_vocab_broadcast:
        raise ValueError(
            f"vocabulary has {vocab.count()} tokens — too large to "
            f"broadcast; shuffle-join tokens against the model instead")
    blocks = [t for t in ray.get(vocab.to_arrow_refs()) if t.num_rows]
    vt = pa.concat_tables(blocks) if blocks else \
        pa.table({"token": pa.array([], pa.string()),
                  "tf": pa.array([], pa.int64())})
    tf = vt.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
    total = float(tf.sum())
    lp_map = dict(zip(vt.column("token").to_pylist(),
                      np.log(tf / max(total, 1.0))))
    ref = ray.put(lp_map)

    def score(batch: pa.Table) -> pa.Table:
        lp_map = ray.get(ref)
        toks = pc.utf8_split_whitespace(
            fill_utf8(batch.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parent = parent[keep]
        n = batch.num_rows
        # dictionary-encode so only DISTINCT tokens cross into Python —
        # the token occurrences themselves stay in Arrow buffers
        d = pc.dictionary_encode(flat)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        inv = d.indices.to_numpy(zero_copy_only=False)[keep]
        uniq = d.dictionary.to_pylist()
        lp = np.array([lp_map.get(t, np.log(1.0 / max(total, 1.0)))
                       for t in uniq], np.float64)[inv]
        cnt = np.bincount(parent, minlength=n).astype(np.int64)
        s = np.bincount(parent, weights=lp, minlength=n)
        sel = np.flatnonzero(cnt > 0)
        avg = s[sel] / cnt[sel]
        avg = np.sign(avg) * np.floor(np.abs(avg) * 1e6 + 0.5) / 1e6
        return pa.table({
            id_col: pc.take(batch.column(id_col), pa.array(sel, pa.int64())),
            "n_tokens": pa.array(cnt[sel], pa.int64()),
            "avg_logprob": pa.array(avg, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def dsir_log_ratio(source_ds, target_ds, text_col: str = "text",
                   id_col: str = "doc_id",
                   max_vocab_broadcast: int = 5_000_000):
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): each source document scores
    ``Σ_tokens ln(p_target(tok) / p_source(tok))`` under two unigram
    bag-of-words models — positive means target-like; resample source
    docs proportionally to select a target-matched corpus.

    Both models use add-1 smoothing over the JOINT vocabulary, so
    tokens unseen in either corpus get a well-defined probability and
    the score is finite for every document.

    Scale shape: two distributed frequency fits (``token_counts``
    combiner — distinct-token-sized exchanges), ONE broadcast of the
    joint (token -> log ratio) table via ``ray.put``, and a stateless
    dictionary-encoded scoring map — the corpus itself never shuffles.
    Returns a Dataset (id, n_tokens, log_ratio) with log_ratio rounded
    half-away to 6 (SQL ROUND semantics, oracle-comparable)."""
    import ray

    def fit(ds):
        vocab = token_counts(ds, text_col, id_col).materialize()
        if vocab.count() > max_vocab_broadcast:
            raise ValueError("vocabulary too large to broadcast — "
                             "shuffle-join tokens against the models")
        blocks = [t for t in ray.get(vocab.to_arrow_refs()) if t.num_rows]
        vt = pa.concat_tables(blocks) if blocks else \
            pa.table({"token": pa.array([], pa.string()),
                      "tf": pa.array([], pa.int64())})
        return dict(zip(vt.column("token").to_pylist(),
                        vt.column("tf").to_numpy(zero_copy_only=False)
                        .astype(np.float64)))

    tf_s, tf_t = fit(source_ds), fit(target_ds)
    joint = set(tf_s) | set(tf_t)
    v = float(len(joint))
    n_s = sum(tf_s.values()) + v
    n_t = sum(tf_t.values()) + v
    lr = {tok: np.log((tf_t.get(tok, 0.0) + 1.0) / n_t) -
          np.log((tf_s.get(tok, 0.0) + 1.0) / n_s) for tok in joint}
    # tokens outside the joint vocab (can't occur when scoring the
    # corpora the models were fit on, but keep the map total anyway)
    oov = np.log(1.0 / n_t) - np.log(1.0 / n_s)
    ref = ray.put((lr, oov))

    def score(batch: pa.Table) -> pa.Table:
        lr, oov = ray.get(ref)
        toks = pc.utf8_split_whitespace(
            fill_utf8(batch.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parent = parent[keep]
        n = batch.num_rows
        d = pc.dictionary_encode(flat)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        inv = d.indices.to_numpy(zero_copy_only=False)[keep]
        uniq = d.dictionary.to_pylist()
        per_tok = np.array([lr.get(t, oov) for t in uniq], np.float64)[inv]
        cnt = np.bincount(parent, minlength=n).astype(np.int64)
        s = np.bincount(parent, weights=per_tok, minlength=n)
        sel = np.flatnonzero(cnt > 0)
        val = s[sel]
        val = np.sign(val) * np.floor(np.abs(val) * 1e6 + 0.5) / 1e6
        return pa.table({
            id_col: pc.take(batch.column(id_col), pa.array(sel, pa.int64())),
            "n_tokens": pa.array(cnt[sel], pa.int64()),
            "log_ratio": pa.array(val, pa.float64()),
        })

    return source_ds.map_batches(score, batch_format="pyarrow",
                                 batch_size=None)


def zipf_fit(ds, text_col: str = "text", id_col: str = "doc_id",
             top: int = 100) -> "pd.DataFrame":
    """Zipf's-law fit over the corpus token-frequency distribution:
    OLS of ln(frequency) on ln(rank) for the ``top`` most frequent
    tokens — the corpus-health profile (natural language sits near
    slope -1; boilerplate-heavy or synthetic corpora drift off it).

    Scale shape: reuses the ``token_counts`` vocabulary combiner (the
    exchange carries distinct-token partials, never occurrences); the
    rank/fit step touches only the vocabulary table, top-sliced with a
    deterministic (tf desc, token asc) order. Returns one row
    (slope, intercept, n_tokens); slope/intercept are NULL when fewer
    than two distinct ranked tokens exist."""
    import pandas as pd

    vocab = token_counts(ds, text_col=text_col, id_col=id_col) \
        .to_pandas()
    out = {"slope": np.nan, "intercept": np.nan, "n_tokens": 0}
    if not vocab.empty:
        t = vocab.sort_values(["tf", "token"],
                              ascending=[False, True],
                              kind="mergesort").head(top)
        n = len(t)
        out["n_tokens"] = n
        if n >= 2:
            x = np.log(np.arange(1, n + 1, dtype=np.float64))
            y = np.log(t["tf"].to_numpy(np.float64))
            xm, ym = x.mean(), y.mean()
            slope = ((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum()
            out["slope"] = (np.sign(slope)
                            * np.floor(abs(slope) * 1e6 + 0.5) / 1e6)
            inter = ym - slope * xm
            out["intercept"] = (np.sign(inter)
                                * np.floor(abs(inter) * 1e6 + 0.5) / 1e6)
    df = pd.DataFrame([out])
    df["n_tokens"] = df["n_tokens"].astype("int64")
    return df


def hashed_vectorizer(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Feature-hashing vectorizer (Weinberger et al. 2009, "hashing
    trick") in long form: each whitespace token maps to one of 16
    buckets by the first hex digit of its md5, and each document emits
    its per-bucket token counts — the fixed-width bag-of-words that
    needs NO vocabulary fit, broadcast, or second pass, which is why
    web-scale text featurization uses it. md5 keeps the bucketing
    SQL-replicable (``substr(md5(token),1,1)``); the scale path for
    non-oracle use is the vectorized ``hash64`` kernel.

    Scale shape: stateless per-block map — tokenize with the flat Arrow
    kernels, md5 only the block's DISTINCT tokens (vocab-sized, Zipf
    makes this tiny vs occurrences), scatter bucket codes back through
    the factorize indices, one block-local (doc, bucket) group-by.
    Exact with no shuffle because a document lives in one row of one
    block. Returns a Dataset (id, bucket, n); empty documents emit no
    rows (SQL parity)."""
    import hashlib

    _empty = pa.table({id_col: pa.array([], pa.int64()),
                       "bucket": pa.array([], pa.string()),
                       "n": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(
            fill_utf8(batch.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parent = pc.list_parent_indices(toks)
        flat_tok = pc.list_flatten(toks)
        keep = pc.not_equal(flat_tok, "")
        flat_tok = flat_tok.filter(keep)
        docs = pc.take(batch.column(id_col), parent).filter(keep)
        if len(flat_tok) == 0:
            return _empty
        uniq, codes = np.unique(
            flat_tok.to_numpy(zero_copy_only=False), return_inverse=True)
        buck_of = np.array([hashlib.md5(t.encode()).hexdigest()[0]
                            for t in uniq], dtype=object)
        t = pa.table({id_col: docs,
                      "bucket": pa.array(buck_of[codes], pa.string())})
        g = t.group_by([id_col, "bucket"]).aggregate([("bucket", "count")])
        return pa.table({id_col: g.column(id_col).cast(pa.int64()),
                         "bucket": g.column("bucket"),
                         "n": g.column("bucket_count").cast(pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow", batch_size=None)


def bm25_scores(ds, query_terms: list[str], text_col: str = "text",
                id_col: str = "doc_id", k1: float = 1.5, b: float = 0.75):
    """Okapi BM25 relevance of every document against a fixed query —
    the lexical-retrieval scorer paired with the embedding ANN path:

        score(d) = sum_t idf(t) * tf * (k1+1) /
                   (tf + k1 * (1 - b + b * len_d / avgdl))
        idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)   (Lucene form)

    Tokens are whitespace-split (empty strings dropped); ``len_d`` is
    the doc's total token count, ``N``/``avgdl`` are computed over
    docs with at least one token.

    Scale shape: TWO streaming scans of the pruned (id, text)
    projection — scan 1 folds each block to ONE partial stats row
    (total len, doc count, per-query-term df: a (k+2)-float combiner),
    the driver merges partials into constants; scan 2 re-tokenizes and
    scores each doc locally against the broadcast constants (a doc
    lives in one row, so tf needs no exchange) and emits only matching
    docs. No shuffle anywhere. Returns a Dataset (id, bm25)."""
    import ray

    terms = sorted(set(query_terms))
    tset = pa.array(terms, pa.string())

    def _flat(batch: pa.Table):
        toks = pc.utf8_split_whitespace(
            fill_utf8(batch.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parent = pc.list_parent_indices(toks)
        flat_tok = pc.list_flatten(toks)
        keep = pc.not_equal(flat_tok, "")
        return (flat_tok.filter(keep),
                pc.take(batch.column(id_col), parent).filter(keep))

    def stats_partial(batch: pa.Table) -> pa.Table:
        tok, doc = _flat(batch)
        t = pa.table({"tok": tok, "doc": doc})
        dl = t.group_by("doc").aggregate([([], "count_all")])
        hit = t.filter(pc.is_in(t.column("tok"), value_set=tset))
        dfs = hit.group_by("tok").aggregate(
            [("doc", "count_distinct")]).to_pydict()
        df_map = dict(zip(dfs["tok"], dfs["doc_count_distinct"]))
        return pa.table({
            "total_len": pa.array([int(len(tok))], pa.int64()),
            "n_docs": pa.array([dl.num_rows], pa.int64()),
            **{f"df_{i}": pa.array([int(df_map.get(t2, 0))], pa.int64())
               for i, t2 in enumerate(terms)}})

    proj = ds.map_batches(
        lambda t, c=(id_col, text_col): t.select(list(c)),
        batch_format="pyarrow", batch_size=None)
    parts = proj.map_batches(stats_partial, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    n_docs = int(parts["n_docs"].sum())
    if n_docs == 0:
        import ray.data
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "bm25": pa.array([], pa.float64())}))
    avgdl = float(parts["total_len"].sum()) / n_docs
    dfv = np.array([parts[f"df_{i}"].sum() for i in range(len(terms))],
                   np.float64)
    idf = np.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)
    ref = ray.put((terms, idf, avgdl))

    def score(batch: pa.Table) -> pa.Table:
        terms, idf, avgdl = ray.get(ref)
        tok, doc = _flat(batch)
        t = pa.table({"tok": tok, "doc": doc})
        dl = t.group_by("doc").aggregate([([], "count_all")])
        len_map = dict(zip(dl.column("doc").to_pylist(),
                           dl.column("count_all").to_pylist()))
        hit = t.filter(pc.is_in(t.column("tok"),
                                value_set=pa.array(terms, pa.string())))
        g = hit.group_by(["doc", "tok"]).aggregate([([], "count_all")])
        if g.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "bm25": pa.array([], pa.float64())})
        docs = g.column("doc").to_numpy(zero_copy_only=False)
        tf = g.column("count_all").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ti = {t2: i for i, t2 in enumerate(terms)}
        tidx = np.array([ti[x] for x in g.column("tok").to_pylist()],
                        np.int64)
        dlen = np.array([len_map[d] for d in docs], np.float64)
        contrib = idf[tidx] * tf * (k1 + 1.0) / \
            (tf + k1 * (1.0 - b + b * dlen / avgdl))
        res = pa.table({"doc": pa.array(docs), "c": pa.array(contrib)}) \
            .group_by("doc").aggregate([("c", "sum")])
        return pa.table({id_col: res.column("doc").cast(pa.int64()),
                         "bm25": res.column("c_sum")})

    return proj.map_batches(score, batch_format="pyarrow",
                            batch_size=None)


def pmi_bigrams(ds, text_col: str = "text", id_col: str = "doc_id",
                min_count: int = 5, top: int = 20):
    """Top collocations: adjacent whitespace-token bigrams ranked by
    pointwise mutual information

        pmi(a,b) = ln( (c_ab/N_bigrams) / ((c_a/N_tokens)(c_b/N_tokens)) )

    — the classic "new york"/"machine learning" detector over a corpus.

    Scale shape: (1) per-block bigram + unigram count partials built
    from the flat token buffer (adjacent-parent mask — no per-row
    loop); (2) one keyed shuffle each to merge counts exactly;
    (3) ``min_count`` prunes the bigram table BEFORE any join (the
    long tail is the bulk of it); (4) two narrow hash joins attach the
    endpoint unigram counts — the vocabulary table never touches the
    driver; (5) the corpus totals are distributed ``sum`` aggregates
    (two scalars), broadcast into the final map; (6) only per-block
    top-``top`` partials reach the driver. Returns a pandas DataFrame
    (a, b, n_pair, pmi) ordered by (pmi desc, a, b), pmi rounded to 6.
    """
    import pandas as pd

    from ..tuning import shuffle_partitions

    def _flat_tokens(batch: pa.Table):
        toks = pc.utf8_split_whitespace(
            fill_utf8(batch.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        return flat.filter(keep), parent.filter(keep)

    def bigram_partial(batch: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(batch)
        f = flat.to_numpy(zero_copy_only=False)
        p = parent.to_numpy(zero_copy_only=False)
        if f.size < 2:
            empty = pa.array([], pa.string())
            return pa.table({"a": empty, "b": empty,
                             "n": pa.array([], pa.int64())})
        m = p[1:] == p[:-1]                     # adjacent within one doc
        t = pa.table({"a": pa.array(f[:-1][m]), "b": pa.array(f[1:][m])})
        g = t.group_by(["a", "b"]).aggregate([([], "count_all")])
        out = pa.table({"a": g.column("a"), "b": g.column("b"),
                        "n": g.column("count_all").cast(pa.int64())})
        k = pc.binary_join_element_wise(out.column("a"), out.column("b"),
                                        "\x1f")
        return out.append_column("__bkey", k)

    def unigram_partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch)
        g = pa.table({"w": flat}).group_by("w") \
            .aggregate([([], "count_all")])
        return pa.table({"w": g.column("w"),
                         "c": g.column("count_all").cast(pa.int64())})

    def merge2(names):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or len(t.column_names) < 2:
                return pa.table({names[0]: pa.array([], pa.string()),
                                 names[1]: pa.array([], pa.int64())})
            return pa.table({names[0]: t.column(0).cast(pa.string()),
                             names[1]: t.column(1).cast(pa.int64())})
        return fn

    nparts = shuffle_partitions()
    uni = (ds.map_batches(unigram_partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("w", num_partitions=nparts).sum("c")
           .map_batches(merge2(["w", "c"]), batch_format="pyarrow",
                        batch_size=None)
           .materialize())
    n_vocab = uni.count()
    if n_vocab == 0:
        return pd.DataFrame({"a": pd.Series([], dtype=object),
                             "b": pd.Series([], dtype=object),
                             "n_pair": pd.Series([], dtype="int64"),
                             "pmi": pd.Series([], dtype="float64")})
    n_tokens = uni.sum("c")
    uni = uni.repartition(min(nparts, n_vocab)).materialize()

    # keyed merge of bigram partials, then prune the long tail BEFORE
    # the unigram joins
    big = (ds.map_batches(bigram_partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("__bkey", num_partitions=nparts)
           .map_groups(lambda df: pd.DataFrame({
               "a": [df["a"].iloc[0]], "b": [df["b"].iloc[0]],
               "n_pair": np.array([int(df["n"].sum())], np.int64)}),
               batch_format="pandas")
           .filter(expr=f"n_pair >= {int(min_count)}")
           .materialize())
    # N_bigrams must count the WHOLE bigram population, not the pruned
    # survivors — a one-scalar-per-block sum over the partials
    tot = ds.map_batches(
        lambda t: pa.table({"n": pa.array(
            [int(pc.sum(bigram_partial(t).column("n")).as_py() or 0)],
            pa.int64())}),
        batch_format="pyarrow", batch_size=None).sum("n")
    n_bigrams = int(tot or 0)
    n_cand = big.count()
    if n_cand == 0 or n_bigrams == 0:
        return pd.DataFrame({"a": pd.Series([], dtype=object),
                             "b": pd.Series([], dtype=object),
                             "n_pair": pd.Series([], dtype="int64"),
                             "pmi": pd.Series([], dtype="float64")})
    big = big.repartition(min(nparts, n_cand)).materialize()

    ua = uni.map_batches(merge2(["a", "c_a"]), batch_format="pyarrow",
                         batch_size=None).materialize()
    ub = uni.map_batches(merge2(["b", "c_b"]), batch_format="pyarrow",
                         batch_size=None).materialize()
    big = big.join(ua, join_type="inner", on=("a",),
                   num_partitions=nparts).materialize()
    big = big.repartition(min(nparts, max(big.count(), 1))).materialize()
    big = big.join(ub, join_type="inner", on=("b",),
                   num_partitions=nparts)

    nt, nb = float(n_tokens), float(n_bigrams)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            empty = pa.array([], pa.string())
            return pa.table({"a": empty, "b": empty,
                             "n_pair": pa.array([], pa.int64()),
                             "pmi": pa.array([], pa.float64())})
        c_ab = t.column("n_pair").cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        c_a = t.column("c_a").cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        c_b = t.column("c_b").cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        pmi = np.round(np.log((c_ab / nb) / ((c_a / nt) * (c_b / nt))), 6)
        out = pa.table({"a": t.column("a").cast(pa.string()),
                        "b": t.column("b").cast(pa.string()),
                        "n_pair": t.column("n_pair").cast(pa.int64()),
                        "pmi": pa.array(pmi, pa.float64())})
        df = out.to_pandas().sort_values(
            ["pmi", "a", "b"], ascending=[False, True, True],
            kind="mergesort").head(top)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    parts = big.map_batches(score, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    return parts.sort_values(["pmi", "a", "b"],
                             ascending=[False, True, True],
                             kind="mergesort").head(top) \
        .reset_index(drop=True)


def char_entropy(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document Shannon entropy of the CHARACTER distribution
    (log2) — the classic gibberish/boilerplate detector: natural text
    sits near 4.2 bits, repeated padding near 0, random base64 near 6.

    Vectorized over the flat utf8 buffer: one combined-index bincount
    per block builds every row's 256-bin byte histogram at once (the
    multimodal decode technique) — no per-row loop. Byte-level, which
    equals character-level on ASCII corpora (DuckDB ``entropy()``
    parity there); empty/null docs get entropy 0. Adds a float64
    ``char_entropy`` column rounded to 6."""

    def stamp(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = fill_utf8(col)
        n = len(col)
        buf = np.frombuffer(col.buffers()[2] or b"", dtype=np.uint8)
        raw_off = np.frombuffer(col.buffers()[1], dtype=np.int32)
        off = raw_off[col.offset:col.offset + n + 1].astype(np.int64)
        lens = np.diff(off)
        ent = np.zeros(n, np.float64)
        if buf.size:
            row_of = np.repeat(np.arange(n), lens)
            sl = buf[off[0]:off[-1]]
            counts = np.bincount(row_of * 256 + sl.astype(np.int64),
                                 minlength=n * 256).reshape(n, 256)
            p = counts / np.maximum(lens, 1)[:, None]
            plogp = np.where(p > 0, p * np.log2(np.maximum(p, 1e-300)), 0.0)
            ent = -plogp.sum(axis=1)
        return batch.append_column("char_entropy",
                                   pa.array(np.round(ent, 6), pa.float64()))

    return ds.map_batches(stamp, batch_format="pyarrow", batch_size=None)


class CompressionRatio:
    """Actor-pool quality-signal stage: per-document zlib compression
    ratio ``compressed_bytes / raw_bytes`` — the cheap universal
    redundancy detector (CCNet/RefinedWeb-style): boilerplate and
    repeated spam compress far below natural text, random noise sits
    near 1.0.

    The per-row ``zlib.compress`` call is a C-speed kernel like the
    sha256 ingest loop — compute-dense, trivially data-parallel; the
    actor form keeps the compressor level fixed per worker and the
    batch size byte-budgeted. Empty/null docs get ratio NULL. Adds
    ``zlib_ratio`` (float64, rounded to 6)."""

    def __init__(self, level: int = 6):
        import zlib

        self._z = zlib
        self.level = level

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("text" if "text" in batch.column_names
                           else batch.column_names[0])
        texts = col.to_pylist()
        out = []
        for t in texts:
            if not t:
                out.append(None)
                continue
            raw = t.encode()
            out.append(round(len(self._z.compress(raw, self.level))
                             / len(raw), 6))
        return batch.append_column("zlib_ratio",
                                   pa.array(out, pa.float64()))


def bigram_lm_scores(ds, text_col: str = "text", id_col: str = "doc_id",
                     lam: float = 0.7, min_count: int = 3,
                     max_vocab_broadcast: int = 5_000_000):
    """Per-document interpolated BIGRAM language-model score — the
    unigram perplexity proxy's stronger sibling: for each adjacent
    token pair the probability is

        p = lam * P(w2 | w1) + (1 - lam) * P(w2)

    with P(w2|w1) = c(w1,w2) / c_start(w1) taken ONLY from bigrams the
    corpus saw >= ``min_count`` times (the long tail backs off to the
    unigram term — the classic count-pruned interpolation that keeps
    the broadcast model small), and P(w2) the corpus unigram model.
    Low scores = locally incoherent token sequences (shuffled text,
    keyword stuffing) that unigram scoring cannot see.

    Scale shape: unigram fit (token_counts) + bigram count fit (the
    pmi_bigrams combiner, tail-pruned AFTER exact merge) + start
    counts restricted to kept-bigram prefixes — all broadcast once;
    scoring is a stateless dictionary-encoded map with segment means.
    Docs with < 2 tokens emit NULL. Returns a pandas DataFrame
    (id, n_pairs, avg_logprob) rounded to 6."""
    import pandas as pd
    import ray

    from ..tuning import shuffle_partitions

    # --- unigram model
    vocab = token_counts(ds, text_col, id_col).materialize()
    if vocab.count() > max_vocab_broadcast:
        raise ValueError("vocabulary too large to broadcast — "
                         "shuffle-join the tokens against the model")
    blocks = [t for t in ray.get(vocab.to_arrow_refs()) if t.num_rows]
    vt = pa.concat_tables(blocks) if blocks else \
        pa.table({"token": pa.array([], pa.string()),
                  "tf": pa.array([], pa.int64())})
    tf = vt.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
    total = float(tf.sum())
    uni = pd.Series(tf / max(total, 1.0),
                    index=vt.column("token").to_pylist())

    # --- bigram counts (exact merge, THEN prune) + start counts
    def bigram_partial(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(
            fill_utf8(batch.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).to_numpy(zero_copy_only=False)
        p = parent.filter(keep).to_numpy(zero_copy_only=False)
        if f.size < 2:
            empty = pa.array([], pa.string())
            return pa.table({"a": empty, "b": empty,
                             "n": pa.array([], pa.int64())})
        m = p[1:] == p[:-1]
        t = pa.table({"a": pa.array(f[:-1][m]), "b": pa.array(f[1:][m])})
        g = t.group_by(["a", "b"]).aggregate([([], "count_all")])
        out = pa.table({"a": g.column("a"), "b": g.column("b"),
                        "n": g.column("count_all").cast(pa.int64())})
        k = pc.binary_join_element_wise(out.column("a"), out.column("b"),
                                        "\x1f")
        return out.append_column("__bkey", k)

    nparts = shuffle_partitions()
    big = (ds.map_batches(bigram_partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("__bkey", num_partitions=nparts)
           .map_groups(lambda df: pd.DataFrame({
               "a": [df["a"].iloc[0]], "b": [df["b"].iloc[0]],
               "n": np.array([int(df["n"].sum())], np.int64)}),
               batch_format="pandas")
           .to_pandas())
    if big.empty:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "n_pairs": pd.Series([], dtype="int64"),
                             "avg_logprob": pd.Series([], dtype="float64")})
    start = big.groupby("a")["n"].sum()          # ALL bigrams count here
    kept = big[big["n"] >= min_count]
    pb = pd.Series((kept["n"] / start.loc[kept["a"]].to_numpy())
                   .to_numpy(),
                   index=kept["a"] + "\x1f" + kept["b"])
    ref = ray.put((uni, pb, float(lam)))

    def score(batch: pa.Table) -> pa.Table:
        uni_s, pb_s, lam_f = ray.get(ref)
        toks = pc.utf8_split_whitespace(
            fill_utf8(batch.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).to_numpy(zero_copy_only=False)
        p = parent.filter(keep).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if f.size < 2:
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             "n_pairs": pa.array(np.zeros(n, np.int64)),
                             "avg_logprob": pa.nulls(n, pa.float64())})
        m = p[1:] == p[:-1]
        w1, w2, rows = f[:-1][m], f[1:][m], p[:-1][m]
        pu = pd.Series(w2).map(uni_s).fillna(0.0).to_numpy(np.float64)
        keys = pd.Series(w1) + "\x1f" + pd.Series(w2)
        pbv = keys.map(pb_s).fillna(0.0).to_numpy(np.float64)
        lp = np.log(np.maximum(lam_f * pbv + (1 - lam_f) * pu, 1e-300))
        sums = np.bincount(rows, weights=lp, minlength=n)
        cnts = np.bincount(rows, minlength=n)
        avg = np.where(cnts > 0, sums / np.maximum(cnts, 1), np.nan)
        arr = pc.if_else(pa.array(cnts > 0),
                         pa.array(np.round(avg, 6), pa.float64()),
                         pa.nulls(n, pa.float64()))
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_pairs": pa.array(cnts.astype(np.int64)),
                         "avg_logprob": arr})

    out = ds.map_batches(score, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)


def vocab_overlap(ds, text_col: str, seg_col: str, a, b):
    """Vocabulary overlap between two corpus segments: distinct-token
    Jaccard + each side's coverage of the other — the cheap
    domain-shift screen before training on a new source (low overlap =
    expect OOV pain / reweighting).

    Per-block distinct-(segment, token) combiner, one keyed fold to a
    per-token side-flag (the set_op_keys shape), three scalars out.
    Returns one row (n_a, n_b, n_common, jaccard, cover_a_in_b,
    cover_b_in_a) rounded to 6."""
    import pandas as pd

    from ..tuning import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(seg_col).cast(pa.string())
        mask = pc.is_in(col, value_set=pa.array([str(a), str(b)]))
        t = batch.filter(mask)
        if t.num_rows == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "ia": pa.array([], pa.int64()),
                             "ib": pa.array([], pa.int64())})
        toks = pc.utf8_split_whitespace(
            fill_utf8(t.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        seg = t.column(seg_col).cast(pa.string()).take(
            parent.filter(keep))
        tt = pa.table({"token": flat.filter(keep),
                       "ia": pc.cast(pc.equal(seg, str(a)), pa.int64()),
                       "ib": pc.cast(pc.equal(seg, str(b)), pa.int64())})
        g = tt.group_by("token").aggregate([("ia", "max"), ("ib", "max")])
        return pa.table({"token": g.column("token"),
                         "ia": g.column("ia_max").cast(pa.int64()),
                         "ib": g.column("ib_max").cast(pa.int64())})

    nparts = shuffle_partitions()
    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
             .groupby("token", num_partitions=nparts)
             .map_groups(lambda df: pd.DataFrame(
                 {"ia": [int(df["ia"].max())],
                  "ib": [int(df["ib"].max())]}), batch_format="pandas")
             .to_pandas())
    if parts.empty:
        na = nb = nc = 0
    else:
        na = int(parts["ia"].sum())
        nb = int(parts["ib"].sum())
        nc = int(((parts["ia"] + parts["ib"]) == 2).sum())
    union = na + nb - nc
    return pd.DataFrame({
        "n_a": np.array([na], np.int64),
        "n_b": np.array([nb], np.int64),
        "n_common": np.array([nc], np.int64),
        "jaccard": [round(nc / union, 6) if union else np.nan],
        "cover_a_in_b": [round(nc / na, 6) if na else np.nan],
        "cover_b_in_a": [round(nc / nb, 6) if nb else np.nan]})


def readability_scores(ds, text_col: str = "text",
                       id_col: str = "doc_id"):
    """Flesch reading-ease per document from three vectorized counts —
    words (whitespace tokens), sentences (runs of [.!?], min 1), and a
    syllable PROXY (vowel-group runs, the standard cheap stand-in):

        flesch = 206.835 − 1.015·(words/sentences)
                         − 84.6·(syllables/words)

    — the classic complexity screen (90+ ~ grade school, < 30 ~
    academic); junk corpora show up as implausible extremes. All three
    counters are single RE2/Arrow kernels per batch; zero-word docs
    get NULL. Adds int64 n_words/n_sentences/n_syllables and float64
    flesch (rounded to 6)."""

    def stamp(batch: pa.Table) -> pa.Table:
        txt = fill_utf8(batch.column(text_col))
        words = pc.count_substring_regex(txt, r"\S+") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        sents = pc.count_substring_regex(txt, r"[.!?]+") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        syll = pc.count_substring_regex(txt, r"[aeiouAEIOU]+") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        s_eff = np.maximum(sents, 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            fl = (206.835 - 1.015 * (words / s_eff)
                  - 84.6 * (syll / np.maximum(words, 1)))
        ok = words > 0
        arr = pc.if_else(pa.array(ok),
                         pa.array(np.round(fl, 6), pa.float64()),
                         pa.nulls(len(words), pa.float64()))
        out = batch.append_column("n_words", pa.array(words))
        out = out.append_column("n_sentences", pa.array(s_eff))
        out = out.append_column("n_syllables", pa.array(syll))
        return out.append_column("flesch", arr)

    return ds.map_batches(stamp, batch_format="pyarrow", batch_size=None)


def lexical_diversity(ds, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Per-document lexical diversity: type-token ratio (distinct /
    total tokens) and hapax fraction (share of types occurring exactly
    once) — the template/spam screen (machine-generated boilerplate
    repeats a tiny vocabulary; TTR and hapax crater).

    A document lives in one row, so both statistics are block-local:
    one tokenize + one (doc, token) group_by per batch — no exchange
    at all. Empty docs get NULL ratios. Adds int64 n_tokens/n_types/
    n_hapax + float64 ttr/hapax_frac (rounded to 6)."""

    def stamp(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(
            fill_utf8(batch.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        n = batch.num_rows
        n_tokens = np.bincount(parent.to_numpy(zero_copy_only=False),
                               minlength=n).astype(np.int64)
        g = pa.table({"doc": parent, "token": flat}) \
            .group_by(["doc", "token"]).aggregate([([], "count_all")])
        docs = g.column("doc").to_numpy(zero_copy_only=False)
        cnts = g.column("count_all").to_numpy(zero_copy_only=False)
        n_types = np.bincount(docs, minlength=n).astype(np.int64)
        n_hapax = np.bincount(docs[cnts == 1], minlength=n) \
            .astype(np.int64)
        ok = n_tokens > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            ttr = n_types / np.maximum(n_tokens, 1)
            hx = n_hapax / np.maximum(n_types, 1)
        out = batch.append_column("n_tokens", pa.array(n_tokens))
        out = out.append_column("n_types", pa.array(n_types))
        out = out.append_column("n_hapax", pa.array(n_hapax))
        out = out.append_column(
            "ttr", pc.if_else(pa.array(ok),
                              pa.array(np.round(ttr, 6), pa.float64()),
                              pa.nulls(n, pa.float64())))
        return out.append_column(
            "hapax_frac", pc.if_else(
                pa.array(ok),
                pa.array(np.round(hx, 6), pa.float64()),
                pa.nulls(n, pa.float64())))

    return ds.map_batches(stamp, batch_format="pyarrow", batch_size=None)


def jsd_segments(ds, seg_col: str, text_col: str, seg_a, seg_b) -> "pd.DataFrame":
    """Jensen-Shannon divergence (nats) between two corpus slices'
    unigram distributions — the symmetric, always-finite corpus-drift
    measure ("did the en and de slices diverge", "did this month's
    crawl shift vocabulary") that KL alone can't give on
    non-overlapping vocabularies. Whitespace tokens, empty tokens
    dropped (the ``unigram_logprob`` convention, SQL-matchable).

    Scale shape — the vocabulary NEVER lands on the driver: (1)
    per-block conditional (word, c_a, c_b) count combiners, (2) ONE
    keyed word shuffle merges them into a distributed vocab table
    (materialized once), (3) token totals fold from KB-sized partials,
    broadcast as two scalars, and (4) each vocab partition emits its
    partial Σ-term — the driver only ever adds |partitions| numbers.
    JSD = 0.5·KL(p_a‖m) + 0.5·KL(p_b‖m), m the midpoint; one-sided
    words contribute their finite half-term only. Returns one row
    (jsd, n_a, n_b, vocab), jsd rounded to 6."""
    import pandas as pd

    from ..tuning import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        seg = batch.column(seg_col)
        keep = pc.or_(pc.equal(seg, seg_a), pc.equal(seg, seg_b))
        t = batch.filter(pc.fill_null(keep, False))
        if t.num_rows == 0:
            return pa.table({"w": pa.array([], pa.string()),
                             "ca": pa.array([], pa.int64()),
                             "cb": pa.array([], pa.int64())})
        toks = pc.utf8_split_whitespace(fill_utf8(t.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ok = pc.not_equal(flat, "")
        flat, parent = flat.filter(ok), parent.filter(ok)
        is_a = pc.equal(pc.take(t.column(seg_col), parent), seg_a)
        tt = pa.table({"w": flat,
                       "ca": pc.cast(pc.fill_null(is_a, False), pa.int64()),
                       "cb": pc.cast(pc.invert(pc.fill_null(is_a, True)),
                                     pa.int64())})
        g = tt.group_by(["w"]).aggregate([("ca", "sum"), ("cb", "sum")])
        return pa.table({"w": g.column("w"),
                         "ca": g.column("ca_sum").cast(pa.int64()),
                         "cb": g.column("cb_sum").cast(pa.int64())})

    from ray.data.aggregate import Sum

    vocab = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
             .groupby("w", num_partitions=shuffle_partitions())
             .aggregate(Sum("ca"), Sum("cb"))).materialize()

    def totals_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "na": pa.array([pc.sum(t.column("sum(ca)")).as_py() or 0],
                           pa.int64()),
            "nb": pa.array([pc.sum(t.column("sum(cb)")).as_py() or 0],
                           pa.int64()),
            "v": pa.array([t.num_rows], pa.int64())})

    tot = vocab.map_batches(totals_partial, batch_format="pyarrow",
                            batch_size=None).to_pandas().sum()
    na, nb, nv = int(tot["na"]), int(tot["nb"]), int(tot["v"])
    if na == 0 or nb == 0:
        return pd.DataFrame({"jsd": [np.nan],
                             "n_a": np.array([na], np.int64),
                             "n_b": np.array([nb], np.int64),
                             "vocab": np.array([nv], np.int64)})

    def term_partial(t: pa.Table, na=float(na), nb=float(nb)) -> pa.Table:
        ca = t.column("sum(ca)").to_numpy(zero_copy_only=False)             .astype(np.float64)
        cb = t.column("sum(cb)").to_numpy(zero_copy_only=False)             .astype(np.float64)
        pa_ = ca / na
        pb_ = cb / nb
        m = (pa_ + pb_) / 2.0
        with np.errstate(divide="ignore", invalid="ignore"):
            term = (np.where(pa_ > 0, pa_ * np.log(pa_ / m), 0.0)
                    + np.where(pb_ > 0, pb_ * np.log(pb_ / m), 0.0))
        return pa.table({"t": pa.array([float(term.sum())], pa.float64())})

    total = vocab.map_batches(term_partial, batch_format="pyarrow",
                              batch_size=None).to_pandas()["t"].sum()
    jsd = 0.5 * float(total)
    jsd = float(np.floor(abs(jsd) * 1e6 + 0.5) / 1e6
                * (1.0 if jsd >= 0 else -1.0))
    return pd.DataFrame({"jsd": [jsd], "n_a": np.array([na], np.int64),
                         "n_b": np.array([nb], np.int64),
                         "vocab": np.array([nv], np.int64)})
