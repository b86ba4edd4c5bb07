"""Byte-pair-encoding tokenizer training + application over a corpus.

Classic BPE (Sennrich et al. 2016; byte-level alphabet like GPT-2's
tokenizer) with the standard big-data decomposition used by
subword-nmt: merges are a function of the WORD-FREQUENCY table, not of
raw text, so the only distributed work is one exact word-count pass
(per-block (word, count) combiner partials -> ONE keyed groupby-sum ->
per-block top-``max_vocab`` prune, a superset of the global top by
count since each word appears once after the merge), and the merge
loop runs driver-side over that compact table — KB..MB regardless of
corpus size. Application ships the learned merge ranks into a
stateless ``map_batches`` closure (plan-time constant) and replays
them with vectorized numpy passes over the batch's flat byte array —
no per-row or per-word Python loops anywhere.

The reference engine has no tokenizer ops (its transform inventory is
feature_fabrica/transform/*); this module is part of the LLM-training-
data extension alongside textstats.py / curation.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import fill_utf8

__all__ = ["learn_bpe", "bpe_token_counts"]

_EOW = 256          # end-of-word marker symbol (byte ids are 0..255)
_FIRST_MERGE = 257  # first synthesized symbol id


def _word_symbols(words: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Flat (symbol, word-index) arrays for a utf8 word array: each
    word's UTF-8 bytes followed by the end-of-word marker. One numpy
    pass over Arrow's flat buffer — no per-word loop."""
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    n = len(words)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    arr = pc.cast(words, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off = np.frombuffer(arr.buffers()[1], np.int32,
                        count=n + 1, offset=arr.offset * 4).astype(np.int64)
    buf = arr.buffers()[2]
    data = (np.frombuffer(buf, np.uint8, count=int(off[-1]))
            if buf is not None and off[-1] > 0 else np.zeros(0, np.uint8))
    lens = np.diff(off)                      # bytes per word
    out_len = lens + 1                       # + end-of-word marker
    starts = np.concatenate([[0], np.cumsum(out_len)[:-1]])
    total = int(out_len.sum())
    sym = np.full(total, _EOW, np.int64)
    wid = np.repeat(np.arange(n, dtype=np.int64), out_len)
    # scatter the byte payload: target positions are each word's output
    # range minus its trailing marker slot
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, out_len)
    byte_slot = pos < np.repeat(lens, out_len)
    src = np.repeat(off[:-1], out_len) + pos
    sym[byte_slot] = data[src[byte_slot]].astype(np.int64)
    return sym, wid


def _merge_pass(sym: np.ndarray, wid: np.ndarray, a: int, b: int,
                new_id: int) -> tuple[np.ndarray, np.ndarray]:
    """Replace every non-overlapping (leftmost-greedy) adjacent (a, b)
    pair within a word by ``new_id``. Vectorized: overlap is only
    possible when a == b (runs like 'aaa'), resolved by keeping even
    positions within each run of consecutive candidates."""
    cand = np.nonzero((sym[:-1] == a) & (sym[1:] == b)
                      & (wid[:-1] == wid[1:]))[0]
    if cand.size == 0:
        return sym, wid
    if a == b and cand.size > 1:
        run_start = np.concatenate([[True], np.diff(cand) > 1])
        idx = np.arange(cand.size)
        starts = idx[run_start]
        pos_in_run = idx - starts[np.cumsum(run_start) - 1]
        cand = cand[pos_in_run % 2 == 0]
    sym = sym.copy()
    sym[cand] = new_id
    keep = np.ones(sym.size, bool)
    keep[cand + 1] = False
    return sym[keep], wid[keep]


def _word_count_table(ds, text_col: str, max_vocab: int) -> pd.DataFrame:
    """Exact corpus word counts, pruned to the ``max_vocab`` most
    frequent words. Combiner shape: per-block (word, count) partials,
    ONE keyed shuffle over distinct-words-per-block, then per-block
    top-``max_vocab`` partials whose union provably contains the
    global top (each word occupies exactly one post-merge row)."""
    from ray.data.aggregate import Sum

    from ..tuning import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(
            fill_utf8(batch.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        t = pa.table({"word": flat}).filter(pc.not_equal(flat, ""))
        g = t.group_by("word").aggregate([([], "count_all")])
        return pa.table({"word": g.column("word"),
                         "n": g.column("count_all").cast(pa.int64())})

    merged = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None) \
        .groupby("word", num_partitions=shuffle_partitions()) \
        .aggregate(Sum("n"))

    def block_top(b: pa.Table) -> pa.Table:
        if "word" not in b.column_names:   # empty reduce partition
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = pa.table({"word": b.column("word"),
                      "n": b.column("sum(n)").cast(pa.int64())})
        if t.num_rows > max_vocab:
            order = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                                  ("word", "ascending")])
            t = t.take(order[:max_vocab])
        return t

    tops = merged.map_batches(block_top, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if "word" not in tops.columns:   # corpus with zero words: empty merge
        tops = pd.DataFrame({"word": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    tops = tops.sort_values(["n", "word"], ascending=[False, True],
                            kind="mergesort").head(max_vocab)
    return tops.reset_index(drop=True)


def learn_bpe(ds, text_col: str = "text", num_merges: int = 200,
              max_vocab: int = 200_000, min_count: int = 2) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus.

    Deterministic and partition-invariant: word counts are exact, each
    round merges the highest-count symbol pair with ties broken by the
    smaller (left, right) id pair. Stops early when the best pair's
    count drops below ``min_count``.

    Returns a DataFrame (rank, left, right, merged, pair_count) where
    left/right/merged are the byte sequences decoded latin-1 (bijective
    on bytes, so the table round-trips losslessly)."""
    vocab = _word_count_table(ds, text_col, max_vocab)
    if not len(vocab):
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                             "left": pd.Series([], dtype="object"),
                             "right": pd.Series([], dtype="object"),
                             "merged": pd.Series([], dtype="object"),
                             "pair_count": pd.Series([], dtype="int64")})
    if _FIRST_MERGE + num_merges >= (1 << 21):
        raise ValueError("num_merges too large for the 21-bit pair key "
                         "packing (max ~2M symbols)")
    sym, wid = _word_symbols(pa.array(vocab["word"], pa.string()))
    wcount = vocab["n"].to_numpy(np.int64)

    piece = {i: bytes([i]) for i in range(256)}
    piece[_EOW] = b"</w>"
    rows = []
    next_id = _FIRST_MERGE
    for rank in range(num_merges):
        valid = wid[:-1] == wid[1:]
        if not valid.any():
            break
        keys = (sym[:-1][valid] << 21) | sym[1:][valid]
        w = wcount[wid[:-1][valid]]
        uk, inv = np.unique(keys, return_inverse=True)
        sums = np.bincount(inv, weights=w.astype(np.float64))
        best = int(np.argmax(sums))         # ties -> smallest key: uk sorted
        if sums[best] < min_count:
            break
        a, b = int(uk[best] >> 21), int(uk[best] & ((1 << 21) - 1))
        piece[next_id] = piece[a] + piece[b]
        rows.append({"rank": rank,
                     "left": piece[a].decode("latin-1"),
                     "right": piece[b].decode("latin-1"),
                     "merged": piece[next_id].decode("latin-1"),
                     "pair_count": int(sums[best])})
        sym, wid = _merge_pass(sym, wid, a, b, next_id)
        next_id += 1
    return pd.DataFrame(rows, columns=["rank", "left", "right", "merged",
                                       "pair_count"])


def bpe_token_counts(ds, merges: pd.DataFrame, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Per-document BPE token count under a learned merge table.

    The merge table (KB-sized) is baked into the ``map_batches``
    closure at plan time as (left_id, right_id, new_id) triples in rank
    order; each batch builds its flat (symbol, word) arrays once and
    replays every merge as one vectorized pass. End-of-word markers are
    excluded from the count, so an empty document counts 0 tokens.
    Returns a Dataset (id_col, n_bpe_tokens)."""
    # rebuild the id space from the merge table: pieces seen so far map
    # byte-string -> id; each rank consumes its left/right by content
    ids = {bytes([i]).decode("latin-1"): i for i in range(256)}
    ids["</w>"] = _EOW
    triples = []
    nid = _FIRST_MERGE
    for _, r in merges.sort_values("rank").iterrows():
        la, rb = ids.get(r["left"]), ids.get(r["right"])
        if la is None or rb is None:
            raise ValueError(f"merge rank {r['rank']} references unknown "
                             f"piece {r['left']!r}/{r['right']!r}")
        ids[r["merged"]] = nid
        triples.append((la, rb, nid))
        nid += 1

    def fn(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(
            fill_utf8(batch.column(text_col)))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        words = flat.filter(keep)
        doc_of_word = parent.filter(keep).to_numpy(zero_copy_only=False)
        sym, wid = _word_symbols(words)
        for a, b, new_id in triples:
            sym, wid = _merge_pass(sym, wid, a, b, new_id)
        n_rows = batch.num_rows
        counts = np.zeros(n_rows, np.int64)
        if sym.size:
            tok_pos = sym != _EOW
            per_word = np.bincount(wid[tok_pos],
                                   minlength=len(words)).astype(np.int64)
            np.add.at(counts, doc_of_word, per_word)
        return pa.table({id_col: batch.column(id_col),
                         "n_bpe_tokens": pa.array(counts, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
