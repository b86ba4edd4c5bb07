"""Exact uniqueness checking as a hash-shuffle pipeline.

Strategy (SURVEY.md §2.6, designed for 10^12 rows with Zipf-skewed keys):

1. PROJECT + HASH: one ``map_batches`` pass emits ONLY the 8-byte combined
   key hash (column pruning — the wide ``content`` column never enters the
   shuffle).
2. SHUFFLE: ``groupby(key_hash).count()`` — the all-to-all exchange moves
   8 bytes/row, the minimum possible for exact global dedup detection.
   Hash keys are uniformly distributed by construction, so this shuffle is
   skew-free even when ``repo`` is Zipfian (the salted-key effect for free).
3. CANDIDATES: hashes with count > 1 are collected (tiny — duplicates are
   rare) and broadcast; a second pruned pass extracts candidate rows.
4. EXACT VERIFY: candidates are re-grouped on the REAL key tuple to kill
   64-bit hash collisions; every row in a >1 group is a violation (matches
   the SQL ``COUNT(*) OVER (PARTITION BY keys) > 1`` oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state import combine_hashes, hash64

__all__ = ["uniqueness_violations"]

_SEP = "\x1f"


def _key_hash(batch: pa.Table, columns: list[str]) -> np.ndarray:
    return combine_hashes(*[hash64(batch.column(c)) for c in columns])


def uniqueness_violations(ds, columns: list[str], *, partition_col: str = "repo",
                          num_partitions: int = 64,
                          key_columns: list[str] | None = None) -> pd.DataFrame:
    """All rows whose key tuple occurs more than once. Returns a pandas
    DataFrame (duplicates are assumed rare; the heavy work stays in Ray)."""
    key_columns = key_columns or columns

    def project(batch: pa.Table) -> pa.Table:
        # int64 view of the uint64 hash: Ray's groupby sort handles int64
        h = _key_hash(batch, columns).view(np.int64)
        return pa.table({"key_hash": pa.array(h, pa.int64())})

    hashes = ds.map_batches(project, batch_format="pyarrow")
    dup_hash_rows = (hashes.groupby("key_hash").count()
                     .map_batches(lambda t: t.filter(pa.compute.greater(t.column("count()"), 1)),
                                  batch_format="pyarrow")
                     .take_all())
    if not dup_hash_rows:
        return pd.DataFrame(columns=[*dict.fromkeys([*key_columns, "pid"])])
    dup_hashes = np.array([r["key_hash"] for r in dup_hash_rows], dtype=np.int64)
    dup_set = pa.array(dup_hashes, pa.int64())

    keep_cols = list(dict.fromkeys([*columns, *key_columns, partition_col]))

    def extract(batch: pa.Table) -> pa.Table:
        h = pa.array(_key_hash(batch, columns).view(np.int64), pa.int64())
        mask = pa.compute.is_in(h, value_set=dup_set)
        sel = batch.filter(mask)
        cols = {c: sel.column(c).cast(pa.string()) for c in keep_cols
                if c in sel.column_names}
        pid = (hash64(sel.column(partition_col)) % np.uint64(num_partitions)).astype(np.int32)
        cols["pid"] = pa.array(pid, pa.int32())
        return pa.table(cols)

    cands = ds.map_batches(extract, batch_format="pyarrow").to_pandas()
    if cands.empty:
        return cands
    # exact verify on the real key tuple (collision-proof)
    key_tuple = cands[columns[0]].astype(str)
    for c in columns[1:]:
        key_tuple = key_tuple + _SEP + cands[c].astype(str)
    sizes = key_tuple.map(key_tuple.value_counts())
    return cands[sizes > 1].reset_index(drop=True)
