"""Sequence packing: greedy next-fit assignment of documents into
fixed-size context windows — the standard pre-training batching step
(pack short documents together so a context window wastes no tokens).

Scale shape: packing is inherently sequential WITHIN a stream, so the
corpus is split into deterministic shards (``doc_id % n_shards`` — id-
derived, layout-independent) and each shard packs independently inside
one ``groupby().map_groups`` task, docs in ascending id order. Packs
never span shards; ``n_shards`` is the parallelism knob (at 100 TB,
thousands of shards keep every core busy while each task holds only its
shard). Output rows = input rows — this is an assignment, not a
materialization of packed token buffers.

A document longer than the context gets its own pack with
``truncated=True``; the assignment never splits a document across packs
(the common "no cross-doc attention" convention).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["pack_sequences"]

_SHARD_STRIDE = 10_000_000_000  # pack_id = shard * stride + seq-in-shard


def pack_sequences(ds, id_col: str = "doc_id", len_col: str = "n_tokens",
                   context_len: int = 2048, n_shards: int = 16):
    """Assign each document to a pack id under greedy next-fit.

    Returns a Dataset (id_col, len_col, pack_id int64, pack_offset int64,
    truncated bool): ``pack_offset`` is the document's token start within
    its pack; ``truncated`` marks single-doc packs exceeding the context.
    Deterministic for a given (ids, lengths) regardless of partitioning.
    """

    def add_shard(batch):
        import pyarrow as pa
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        shard = np.abs(ids) % n_shards
        return batch.append_column("__shard", pa.array(shard, pa.int64()))

    def pack_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        lens = df[len_col].to_numpy(dtype=np.int64)
        shard = int(df["__shard"].iloc[0])
        n = len(df)
        # next-fit = repeatedly take the maximal prefix fitting the
        # context; one searchsorted per PACK (not per doc) over the
        # cumulative lengths — the recurrence is sequential by nature,
        # but the loop runs O(packs) times, each O(log n)
        cum = np.concatenate([[0], np.cumsum(lens)])
        starts = []
        i = 0
        while i < n:
            starts.append(i)
            j = int(np.searchsorted(cum, cum[i] + context_len,
                                    side="right")) - 1
            i = max(j, i + 1)            # oversize doc -> its own pack
        starts = np.asarray(starts, np.int64)
        pack_seq = np.searchsorted(starts, np.arange(n), side="right") - 1
        offset = cum[:-1] - cum[starts[pack_seq]]
        out = pd.DataFrame({
            id_col: df[id_col],
            len_col: df[len_col],
            "pack_id": shard * _SHARD_STRIDE + pack_seq,
            "pack_offset": offset,
            "truncated": lens > context_len,
        })
        return out

    sharded = ds.map_batches(add_shard, batch_format="pyarrow",
                             batch_size=None)
    return sharded.groupby("__shard").map_groups(pack_group,
                                                 batch_format="pandas")
