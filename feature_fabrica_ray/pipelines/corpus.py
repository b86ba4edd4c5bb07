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

__all__ = ["curate_corpus"]


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

    gated = gopher_quality(ds, text_col=text_col, min_words=min_words,
                           **(gopher_kw or {})) \
        .filter(lambda r: r["passes_gopher"])
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
