"""Exact uniqueness checking as a hash-shuffle pipeline.

Strategy (SURVEY.md §2.6, designed for 10^12 rows with Zipf-skewed keys):

1. PROJECT + MATERIALIZE: one ``map_batches`` pass emits the 8-byte
   combined key hash plus the (narrow) key/partition columns, and the
   projection is materialized ONCE — the wide ``content`` column never
   leaves the read, and the upstream pipeline (read + derive) is not
   re-executed for the second pass. At 100 TB the projection is ~1-2% of
   input bytes (keys only) and spills to the object store as needed.
2. SHUFFLE: group by a coarse BUCKET (``key_hash mod B``, B ~ 16x the
   reduce parallelism) and detect duplicate hashes inside each bucket
   with one vectorized ``np.unique`` — equal keys always share a bucket,
   the exchange moves 8 bytes/row, and the aggregation has B groups
   instead of one group per distinct key (8x faster than
   ``groupby(key_hash).count()`` on Ray's per-group aggregation path).
   Hash buckets are uniform by construction, so this shuffle is skew-free
   even when ``repo`` is Zipfian (the salted-key effect for free).
3. CANDIDATES: hashes with count > 1 are collected (tiny — duplicates are
   rare) and broadcast; a second pass over the materialized projection
   extracts candidate rows.
4. EXACT VERIFY: candidates are re-grouped on the REAL key tuple to kill
   64-bit hash collisions; every row in a >1 group is a violation (matches
   the SQL ``COUNT(*) OVER (PARTITION BY keys) > 1`` oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state import combine_hashes, hash64
from ..tuning import shuffle_partitions

__all__ = ["uniqueness_violations", "uniqueness_violations_ds"]

_SEP = "\x1f"


def _key_hash(batch: pa.Table, columns: list[str]) -> np.ndarray:
    return combine_hashes(*[hash64(batch.column(c)) for c in columns])


def uniqueness_violations(ds, columns: list[str], *, partition_col: str = "repo",
                          num_partitions: int = 64,
                          key_columns: list[str] | None = None) -> pd.DataFrame:
    """All rows whose key tuple occurs more than once. Returns a pandas
    DataFrame (duplicates are assumed rare; the heavy work stays in Ray)."""
    key_columns = key_columns or columns
    keep_cols = list(dict.fromkeys([*columns, *key_columns, partition_col]))

    n_shuffle = shuffle_partitions()
    n_buckets = n_shuffle * 16

    def project(batch: pa.Table) -> pa.Table:
        # int64 view of the uint64 hash: Ray's shuffle sorts int64 natively.
        # Dictionary-encoded key columns stay dictionary in the retained
        # projection — decoding happens only for the rare candidates
        hu = _key_hash(batch, columns)
        cols = {c: (batch.column(c)
                    if pa.types.is_dictionary(batch.column(c).type)
                    else batch.column(c).cast(pa.string()))
                for c in keep_cols if c in batch.column_names}
        pid = (hash64(batch.column(partition_col)) % np.uint64(num_partitions)).astype(np.int32)
        cols["pid"] = pa.array(pid, pa.int32())
        cols["key_hash"] = pa.array(hu.view(np.int64), pa.int64())
        cols["bucket"] = pa.array((hu % np.uint64(n_buckets)).astype(np.int32), pa.int32())
        return pa.table(cols)

    def bucket_dups(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("key_hash").to_numpy(), return_counts=True)
        return pa.table({"key_hash": pa.array(u[c > 1], pa.int64())})

    proj = ds.map_batches(project, batch_format="pyarrow", batch_size=None).materialize()
    # shuffle ONLY hash + bucket (16 bytes/row) — the key strings stay put
    dup_hash_rows = (proj.select_columns(["key_hash", "bucket"])
                     .groupby("bucket", num_partitions=n_shuffle)
                     .map_groups(bucket_dups, batch_format="pyarrow")
                     .take_all())
    empty_cols = [*dict.fromkeys([*key_columns, "pid"])]
    if not dup_hash_rows:
        return pd.DataFrame(columns=empty_cols)
    dup_hashes = np.array([r["key_hash"] for r in dup_hash_rows], dtype=np.int64)
    dup_set = pa.array(dup_hashes, pa.int64())

    def extract(batch: pa.Table) -> pa.Table:
        mask = pa.compute.is_in(batch.column("key_hash"), value_set=dup_set)
        return batch.filter(mask).drop_columns(["key_hash", "bucket"])

    cands = proj.map_batches(extract, batch_format="pyarrow", batch_size=None).to_pandas()
    if cands.empty:
        return pd.DataFrame(columns=empty_cols)
    # exact verify on the real key tuple (collision-proof)
    key_tuple = cands[columns[0]].astype(str)
    for c in columns[1:]:
        key_tuple = key_tuple + _SEP + cands[c].astype(str)
    sizes = key_tuple.map(key_tuple.value_counts())
    out = cands[sizes > 1].reset_index(drop=True)
    # dictionary-encoded inputs surface as pandas Categorical — decode at
    # the public boundary so callers see the same plain-string frame
    # regardless of the input's encoding
    for c in out.columns:
        if isinstance(out[c].dtype, pd.CategoricalDtype):
            out[c] = out[c].astype(object)
    return out


def uniqueness_violations_ds(ds, columns: list[str], *,
                             num_partitions: int | None = None):
    """Dup-HEAVY form: all duplicate-key rows as a DATASET — one
    full-row hash shuffle, nothing collected to the driver (the
    hash-projection form above assumes duplicates are rare enough to
    broadcast/collect; a 40%-dup web crawl breaks that). Write the
    result or aggregate it downstream; row order is not defined.

    Scale shape: rows are shuffled on a uniform key-hash BUCKET (not
    the key itself), so the reduce side makes one Python call per
    bucket, not one per distinct key — for a uniqueness check the
    expected group size is 1, so ``groupby(keys).map_groups`` would be
    one interpreter round-trip per ROW at 10^12 rows. Inside each
    bucket duplicate hashes are found with one vectorized pass
    (dictionary-encode + bincount), then candidates are re-verified on
    the real key tuple to kill 64-bit hash collisions. Equal keys
    always share a bucket, and hash buckets are uniform, so Zipf key
    skew does not skew the exchange."""
    from ..tuning import shuffle_partitions as _sp
    import pyarrow.compute as pc

    n = num_partitions or _sp()

    def project(batch: pa.Table) -> pa.Table:
        hu = _key_hash(batch, columns)
        return batch.append_column(
            "__kh", pa.array(hu.view(np.int64), pa.int64())) \
            .append_column("__bkt", pa.array(
                (hu % np.uint64(n)).astype(np.int32), pa.int32()))

    def _counts_gt1(arr: np.ndarray) -> np.ndarray:
        u, inv, c = np.unique(arr, return_inverse=True, return_counts=True)
        return c[inv] > 1

    def bucket_viol(t: pa.Table) -> pa.Table:
        kh = t.column("__kh").to_numpy(zero_copy_only=False)
        cand = t.filter(pa.array(_counts_gt1(kh)))
        if cand.num_rows:
            # exact verify on the real key tuple (collision-proof):
            # nulls keep SQL-groupby semantics (null == null for
            # PARTITION BY) via a sentinel the separator can't produce
            parts = [pc.fill_null(cand.column(c).cast(pa.string()), "\x00")
                     for c in columns]
            key = parts[0] if len(parts) == 1 else \
                pc.binary_join_element_wise(*parts, _SEP)
            if isinstance(key, pa.ChunkedArray):
                key = key.combine_chunks()
            idx = key.dictionary_encode().indices.to_numpy(
                zero_copy_only=False)
            cand = cand.filter(pa.array(np.bincount(idx)[idx] > 1))
        return cand.drop_columns(["__kh", "__bkt"])

    return ds.map_batches(project, batch_format="pyarrow",
                          batch_size=None) \
        .groupby("__bkt", num_partitions=n) \
        .map_groups(bucket_viol, batch_format="pyarrow")
