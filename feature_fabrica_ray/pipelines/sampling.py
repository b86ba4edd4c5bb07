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

from ..state import combine_hashes, hash64

__all__ = ["hash_sample"]

_D = np.uint64(1 << 32)


def hash_sample(ds, key_columns: list[str], fraction: float, seed: int = 0):
    """Keep a deterministic ~``fraction`` of rows keyed by
    ``key_columns`` (all rows sharing a key are kept or dropped
    together — sampling by document, user, repo...)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    threshold = np.uint64(int(fraction * float(_D)))

    def fn(batch: pa.Table) -> pa.Table:
        h = combine_hashes(*[hash64(batch.column(c), seed=seed)
                             for c in key_columns])
        keep = (h % _D) < threshold
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
