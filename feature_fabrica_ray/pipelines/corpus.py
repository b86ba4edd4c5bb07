"""End-to-end training-corpus curation: the canonical LLM-data chain
composed as ONE lazy streaming Dataset pipeline —

    quality gate (Gopher filters)          stateless map
    -> dedup canonicalization (norm_hash)  stateless map
    -> exact keep-one dedup                one keyed shuffle (dup-heavy form)
    -> token-window chunking               stateless flat-map
    -> greedy sequence packing             id-sharded stateful recurrence

Nothing materializes on the driver between stages: the only exchange is
the dedup shuffle, every other stage is per-block, so the whole chain
streams with backpressure end-to-end and scales like its weakest stage
(the dedup shuffle — the textbook cost for dup-heavy corpora).

This is the composition proof for the operator library: each stage is
an independently oracle-/pytest-verified pipeline (curation.py,
dedup.py, textstats.py, packing.py) and composing them needs no glue
beyond column plumbing.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["curate_corpus", "mix_corpora"]


def curate_corpus(ds, text_col: str = "text", id_col: str = "doc_id",
                  min_words: int = 10, max_tokens: int = 128,
                  stride: int | None = None, context_len: int = 512,
                  n_shards: int = 16, gopher_kw: dict | None = None):
    """Quality-gate, normalize, exact-dedup, chunk and pack ``ds`` into
    training sequences. Returns a Dataset with one row per kept chunk:
    (doc_id, chunk_id, n_tokens, pack_id, pack_offset, truncated).
    Deterministic for given inputs regardless of block layout (the
    dedup representative is the min doc id; packing order is the
    deterministic id-shard order)."""
    from .curation import gopher_quality, normalize_text
    from .dedup import exact_dedup_rows_shuffle
    from .packing import pack_sequences
    from .textstats import chunk_documents

    def keep_passing(batch: pa.Table) -> pa.Table:
        # vectorized gate — ds.filter(row_udf) would walk Python rows
        return batch.filter(pc.fill_null(batch.column("passes_gopher"),
                                         False))

    gated = gopher_quality(ds, text_col=text_col, min_words=min_words,
                           **(gopher_kw or {})) \
        .map_batches(keep_passing, batch_format="pyarrow", batch_size=None)
    normed = normalize_text(gated, text_col=text_col, with_hash=True)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select([id_col, "norm", "norm_hash"])

    kept = exact_dedup_rows_shuffle(
        normed.map_batches(project, batch_format="pyarrow",
                           batch_size=None),
        ["norm_hash"], tiebreak=id_col)

    chunks = chunk_documents(kept, text_col="norm", id_col=id_col,
                             max_tokens=max_tokens, stride=stride)

    def add_uid(batch: pa.Table) -> pa.Table:
        uid = pc.add(pc.multiply(batch.column(id_col).cast(pa.int64()),
                                 pa.scalar(1_000_000, pa.int64())),
                     batch.column("chunk_id").cast(pa.int64()))
        return batch.append_column("chunk_uid", uid)

    packed = pack_sequences(
        chunks.map_batches(add_uid, batch_format="pyarrow",
                           batch_size=None),
        id_col="chunk_uid", len_col="n_tokens",
        context_len=context_len, n_shards=n_shards)

    def finish(batch: pa.Table) -> pa.Table:
        uid = batch.column("chunk_uid")
        return pa.table({
            id_col: pc.divide(uid, pa.scalar(1_000_000, pa.int64())),
            "chunk_id": pc.subtract(
                uid, pc.multiply(pc.divide(uid,
                                           pa.scalar(1_000_000, pa.int64())),
                                 pa.scalar(1_000_000, pa.int64()))),
            "n_tokens": batch.column("n_tokens"),
            "pack_id": batch.column("pack_id"),
            "pack_offset": batch.column("pack_offset"),
            "truncated": batch.column("truncated")})

    return packed.map_batches(finish, batch_format="pyarrow",
                              batch_size=None)


def mix_corpora(sources, key_columns: list[str], *, epoch_col: str = "epoch",
                seed: int = 0, method: str = "hash64"):
    """Weighted training-data mixing with repetition factors (the Pile /
    Llama-style corpus weights): each ``(dataset, weight)`` source
    contributes ``floor(weight)`` full epochs plus one partial epoch
    holding a deterministic ``frac(weight)`` key-sample — weight 1.5
    means "every document once, half of them twice". Each copy is
    stamped with a 1-based ``epoch_col`` so a downstream global shuffle
    (``global_row_number`` keyed on hash(key, epoch)) spreads the
    repeats instead of clustering them.

    Everything is lazy and shuffle-free: epoch stamping is a stateless
    map, partial epochs are ``hash_sample`` (membership a pure function
    of the key — stable across reruns / layouts / resumes), and the
    union is Ray's zero-cost block concatenation. All sources must
    share a schema (SQL UNION ALL discipline). ``method="md5"`` makes
    the partial-epoch selection replicable in ANSI SQL."""
    import numpy as np

    from .sampling import hash_sample

    def stamp(ds, epoch: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column(
                epoch_col, pa.array(np.full(b.num_rows, epoch), pa.int64()))
        return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)

    out = None
    for ds, weight in sources:
        w = float(weight)
        if w < 0:
            raise ValueError(f"mix_corpora: negative weight {w}")
        full = int(np.floor(w + 1e-12))
        frac = w - full
        pieces = [stamp(ds, e) for e in range(1, full + 1)]
        if frac > 1e-12:
            pieces.append(stamp(
                hash_sample(ds, key_columns, frac, seed=seed, method=method),
                full + 1))
        for p in pieces:
            out = p if out is None else out.union(p)
    if out is None:
        raise ValueError("mix_corpora: no sources with positive weight")
    return out
