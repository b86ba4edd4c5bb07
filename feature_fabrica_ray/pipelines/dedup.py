"""Deduplication pipelines for training-data curation: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale shapes (all reuse the bucket-grouped shuffle from uniqueness.py —
shuffle keys are uniform hashes, so Zipf-skewed repos/langs never skew
the exchange):

- exact:      hash keys -> bucket groupby -> per-bucket distinct/dups.
- minhash:    per-batch vectorized shingle+signature -> emit (band,
              band_hash) rows -> bucket groupby finds colliding bands ->
              candidate pairs -> exact Jaccard verify on a second pruned
              pass over ONLY the candidate documents.
- simhash:    per-batch 64-bit signatures -> 4x16-bit band blocking
              (pigeonhole: hamming<=3 pairs share >=1 of 4 bands) ->
              verify by exact hamming distance.
- embedding:  random-hyperplane signature blocking -> within-bucket
              exact cosine (numpy matmul) -> threshold.

Two verification regimes: the default pipelines assume near-dups are
RARE (candidate pairs collect to the driver for exact verification);
the ``*_distributed`` / ``*_shuffle`` forms are for dup-heavy corpora
(web crawls) — pairs, shingles and duplicate rows stay distributed,
with a Bloom filter of candidate ids as the only driver-held state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state import combine_hashes, hash64, hash64_multi
from .textstats import fill_utf8
from ..tuning import shuffle_partitions
from .textstats import kgram_hashes

__all__ = ["exact_dedup_counts", "exact_dedup_rows_shuffle",
           "minhash_lsh_pairs",
           "minhash_lsh_pairs_distributed", "neardup_clusters",
           "neardup_dedup_rows", "simhash_pairs",
           "ngram_jaccard", "embedding_neardup_pairs", "minhash_signatures",
           "simhash_signatures", "fuzzy_join_pairs", "ngram_overlap_pairs",
           "winnowing_fingerprints", "winnowing_pairs"]

_FULL = np.uint64(0xFFFFFFFFFFFFFFFF)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_counts(ds, columns: list[str]) -> pd.DataFrame:
    """(n_rows, n_distinct, n_dup_rows) over the key columns — the exact-
    dedup survey: how many rows survive keep-one-per-key. One pruned
    bucket-grouped shuffle of 8 bytes/row."""
    n_shuffle = shuffle_partitions()
    n_buckets = n_shuffle * 16

    def project(batch: pa.Table) -> pa.Table:
        h = combine_hashes(*[hash64(batch.column(c)) for c in columns])
        return pa.table({
            "key_hash": pa.array(h.view(np.int64), pa.int64()),
            "bucket": pa.array((h % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
        })

    def bucket_stats(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("key_hash").to_numpy(), return_counts=True)
        return pa.table({"n_rows": pa.array([int(c.sum())], pa.int64()),
                         "n_distinct": pa.array([int(u.size)], pa.int64()),
                         "n_dup_rows": pa.array([int(c[c > 1].sum())], pa.int64())})

    parts = (ds.map_batches(project, batch_format="pyarrow", batch_size=None)
             .groupby("bucket", num_partitions=n_shuffle)
             .map_groups(bucket_stats, batch_format="pyarrow")
             .to_pandas())
    return pd.DataFrame([{
        "n_rows": int(parts["n_rows"].sum()),
        "n_distinct": int(parts["n_distinct"].sum()),
        "n_dup_rows": int(parts["n_dup_rows"].sum()),
    }])


def exact_dedup_rows(ds, columns: list[str], *, tiebreak: str | None = None):
    """Keep exactly one row per key tuple, WITHOUT shuffling full rows.

    Scale shape: (1) the cheap bucket pipeline finds the (rare) duplicated
    key hashes; (2) those hashes broadcast; (3) unique rows stream through
    a membership filter untouched — the big side never enters a shuffle;
    (4) only the duplicate candidates (tiny) are collected, one
    representative per key chosen deterministically (min ``tiebreak``
    column value, else lexicographic min over the key columns' row), and
    appended back as a small dataset. Returns a Dataset.
    """
    import ray.data

    n_shuffle = shuffle_partitions()
    n_buckets = n_shuffle * 16

    def project(batch: pa.Table) -> pa.Table:
        h = combine_hashes(*[hash64(batch.column(c)) for c in columns])
        return pa.table({
            "key_hash": pa.array(h.view(np.int64), pa.int64()),
            "bucket": pa.array((h % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
        })

    def bucket_dups(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("key_hash").to_numpy(), return_counts=True)
        return pa.table({"key_hash": pa.array(u[c > 1], pa.int64())})

    dup_rows = (ds.map_batches(project, batch_format="pyarrow", batch_size=None)
                .groupby("bucket", num_partitions=n_shuffle)
                .map_groups(bucket_dups, batch_format="pyarrow")
                .take_all())
    if not dup_rows:
        return ds
    dup_set = pa.array(np.array([r["key_hash"] for r in dup_rows], np.int64),
                       pa.int64())

    def keep_unique(batch: pa.Table) -> pa.Table:
        h = pa.array(combine_hashes(
            *[hash64(batch.column(c)) for c in columns]).view(np.int64), pa.int64())
        return batch.filter(pc.invert(pc.is_in(h, value_set=dup_set)))

    def dup_candidates(batch: pa.Table) -> pa.Table:
        h = pa.array(combine_hashes(
            *[hash64(batch.column(c)) for c in columns]).view(np.int64), pa.int64())
        return batch.filter(pc.is_in(h, value_set=dup_set))

    unique_part = ds.map_batches(keep_unique, batch_format="pyarrow", batch_size=None)
    cands = ds.map_batches(dup_candidates, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    sort_cols = list(columns) + ([tiebreak] if tiebreak else
                                 [c for c in cands.columns if c not in columns])
    reps = (cands.sort_values(sort_cols, kind="mergesort")
            .drop_duplicates(columns, keep="first"))
    reps_ds = ray.data.from_arrow(
        pa.Table.from_pandas(reps, preserve_index=False)
        .replace_schema_metadata(None))
    return unique_part.union(reps_ds)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _row_segments(row_of: np.ndarray, n_rows: int) -> tuple[np.ndarray, np.ndarray]:
    """(sorted order, segment starts) for reduceat over per-row groups."""
    order = np.argsort(row_of, kind="stable")
    r = row_of[order]
    starts = np.flatnonzero(np.concatenate([[True], r[1:] != r[:-1]]))
    return order, starts


def minhash_signatures(col: pa.Array, num_perm: int = 64, k: int = 5) -> np.ndarray:
    """(num_perm, n_rows) uint64 MinHash signature matrix of a string
    column. Shingle hashing is one flat vectorized pass (textstats.kgram);
    each permutation is one universal-hash remap + segmented min."""
    h, row_of = kgram_hashes(col, k=k)
    n_rows = 0 if len(col) == 0 else len(col)
    sig = np.full((num_perm, n_rows), _FULL, np.uint64)
    if h.size == 0:
        return sig
    order, starts = _row_segments(row_of, n_rows)
    hs = h[order]
    rows_present = row_of[order][starts]
    perms = hash64_multi(hs, num_perm, seed=7)          # (num_perm, n_sh)
    for p in range(num_perm):
        sig[p, rows_present] = np.minimum.reduceat(perms[p], starts)
    return sig


def _band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(bands, n) uint64: combined hash of each band's signature rows."""
    num_perm, n = sig.shape
    r = num_perm // bands
    return np.stack([combine_hashes(*sig[b * r:(b + 1) * r]) for b in range(bands)])


def _collect_colliding(pairs_ds) -> set[tuple]:
    """bucket-grouped band collisions -> unique candidate id pairs."""
    out: set[tuple] = set()
    for row in pairs_ds.take_all():
        out.add((row["id_a"], row["id_b"]))
    return out


def _bucket_pairs(t: pa.Table) -> pa.Table:
    """Within one shuffle bucket: ids sharing a band_hash -> pairs."""
    bh = t.column("band_hash").to_numpy()
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.argsort(bh, kind="stable")
    bhs, idss = bh[order], ids[order]
    starts = np.flatnonzero(np.concatenate([[True], bhs[1:] != bhs[:-1]]))
    ends = np.concatenate([starts[1:], [bhs.size]])
    a_out, b_out = [], []
    for s, e in zip(starts, ends):     # collision groups are tiny and rare
        if e - s < 2:
            continue
        grp = np.unique(idss[s:e])
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                a_out.append(grp[i])
                b_out.append(grp[j])
    return pa.table({"id_a": pa.array(a_out, pa.int64()),
                     "id_b": pa.array(b_out, pa.int64())})


def _shingle_sets(ds, text_col: str, id_col: str, ids: np.ndarray, k: int) -> dict:
    """Second pruned pass: sorted unique shingle-hash array per candidate
    id (candidates only — the full table never ships its shingles)."""
    id_set = pa.array(np.unique(ids).astype(np.int64), pa.int64())

    def extract(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(id_col).cast(pa.int64()), value_set=id_set)
        sel = batch.filter(mask)
        if sel.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "shingles": pa.array([], pa.list_(pa.int64()))})
        h, row_of = kgram_hashes(sel.column(text_col), k=k)
        out_ids, out_lists = [], []
        sel_ids = sel.column(id_col).to_numpy(zero_copy_only=False)
        for r in range(sel.num_rows):  # candidates are rare; fine per row
            out_ids.append(int(sel_ids[r]))
            out_lists.append(np.unique(h[row_of == r]).view(np.int64).tolist())
        return pa.table({id_col: pa.array(out_ids, pa.int64()),
                         "shingles": pa.array(out_lists, pa.list_(pa.int64()))})

    rows = ds.map_batches(extract, batch_format="pyarrow", batch_size=None).take_all()
    return {r[id_col]: np.asarray(r["shingles"], dtype=np.int64) for r in rows}


def ngram_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted unique hash arrays."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)


def minhash_lsh_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16, k: int = 5,
                      threshold: float = 0.5) -> pd.DataFrame:
    """Near-duplicate pairs with exact-verified n-gram Jaccard >= threshold.

    Returns (id_a, id_b, jaccard) with id_a < id_b, sorted. bands=16 of
    r=4 rows catches Jaccard ~0.5+ with high probability."""
    n_shuffle = shuffle_partitions()
    n_buckets = n_shuffle * 16

    def emit_bands(batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(batch.column(text_col), num_perm=num_perm, k=k)
        bh = _band_hashes(sig, bands)                  # (bands, n)
        n = sig.shape[1]
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        band_ids = np.repeat(np.arange(bands, dtype=np.uint64), n)
        flat = bh.reshape(-1)
        with np.errstate(over="ignore"):
            keyed = flat * np.uint64(0x9E3779B97F4A7C15) + band_ids  # band-scoped
        return pa.table({
            "doc_id": pa.array(np.tile(ids, bands), pa.int64()),
            "band_hash": pa.array(keyed.view(np.int64), pa.int64()),
            "bucket": pa.array((keyed % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
        })

    cand_ds = (ds.map_batches(emit_bands, batch_format="pyarrow", batch_size=None)
               .groupby("bucket", num_partitions=n_shuffle)
               .map_groups(_bucket_pairs, batch_format="pyarrow"))
    cands = _collect_colliding(cand_ds)
    if not cands:
        return pd.DataFrame(columns=["id_a", "id_b", "jaccard"])
    ids = np.array(sorted({i for p in cands for i in p}), dtype=np.int64)
    shingles = _shingle_sets(ds, text_col, id_col, ids, k)
    rows = []
    for a, b in sorted(cands):
        j = ngram_jaccard(shingles[a], shingles[b])
        if j >= threshold:
            rows.append((int(min(a, b)), int(max(a, b)), round(float(j), 6)))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])


def exact_dedup_rows_shuffle(ds, columns: list[str], *,
                             tiebreak: str | None = None,
                             num_partitions: int | None = None):
    """Dup-HEAVY form of ``exact_dedup_rows``: when duplicates are not
    rare (web crawls run 40-60%% exact dups) the broadcast dup-hash set
    and driver-collected candidates stop being small. This form pays
    the textbook cost instead — ONE full-row hash shuffle on the key,
    deterministic pick-first per group — and never touches the driver.
    Returns a Dataset; representative = min ``tiebreak`` (else
    lexicographic min over the non-key columns, matching
    exact_dedup_rows)."""
    import ray.data  # noqa: F401

    def first_per_key(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        tb = [tiebreak] if tiebreak else \
            [c for c in t.column_names if c not in columns]
        if not tb:          # key-only schema: rows are identical tuples
            return t.slice(0, 1)
        order = pc.sort_indices(t, sort_keys=[(c, "ascending") for c in tb])
        return t.take(order[:1])

    return ds.groupby(columns,
                      num_partitions=num_partitions or shuffle_partitions()) \
        .map_groups(first_per_key, batch_format="pyarrow")


def neardup_clusters(pairs: pd.DataFrame) -> dict[int, int]:
    """Union-find over verified near-dup pairs -> {doc_id: cluster_rep}
    (rep = min id in the connected component). Pairs are the verified
    near-dup OUTPUT — small under the rare-dup assumption — so the
    union-find runs driver-side (the standard final step after a
    distributed pair generation)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:    # path compression
            parent[x], x = root, parent[x]
        return root

    nodes: set[int] = set()
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        a, b = int(a), int(b)
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in nodes}


def neardup_dedup_rows(ds, text_col: str = "text", id_col: str = "doc_id",
                       threshold: float = 0.5, pairs: pd.DataFrame | None = None,
                       **lsh_kw):
    """Keep ONE representative (min id) per near-duplicate cluster.

    MinHash+LSH pairs -> union-find clusters -> the (small) non-
    representative id set broadcasts into a membership filter; the big
    side streams through untouched — same shape as exact_dedup_rows.
    Pass precomputed ``pairs`` to reuse an existing LSH run."""
    if pairs is None:
        pairs = minhash_lsh_pairs(ds, text_col, id_col, threshold=threshold,
                                  **lsh_kw)
    reps = neardup_clusters(pairs)
    drop = np.array(sorted(x for x, r in reps.items() if r != x), np.int64)
    if drop.size == 0:
        return ds
    drop_set = pa.array(drop, pa.int64())

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.int64())
        return batch.filter(pc.invert(pc.is_in(ids, value_set=drop_set)))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)


def minhash_lsh_pairs_distributed(ds, text_col: str = "text",
                                  id_col: str = "doc_id", num_perm: int = 64,
                                  bands: int = 16, k: int = 5,
                                  threshold: float = 0.5):
    """The dup-heavy-corpus form of ``minhash_lsh_pairs``: candidate
    pairs and shingle payloads NEVER collect to the driver.

    - band exchange (ids only) -> distinct candidate pairs via a keyed
      groupby (stays distributed);
    - a Bloom filter of candidate ids (built from per-block partial
      filters, OR-merged — MB-sized regardless of pair count) prunes the
      shingle-extraction pass;
    - shingle lists co-group with pairs in two keyed shuffles (attach
      side A, then side B), exact Jaccard verified inside map_groups.

    Returns a Dataset (id_a, id_b, jaccard). The driver only ever holds
    the Bloom filter, not pairs or shingles."""
    from ..state import BloomFilter

    n_shuffle = shuffle_partitions()
    n_buckets = n_shuffle * 16

    def emit_bands(batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(batch.column(text_col), num_perm=num_perm, k=k)
        bh = _band_hashes(sig, bands)
        n = sig.shape[1]
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        band_ids = np.repeat(np.arange(bands, dtype=np.uint64), n)
        flat = bh.reshape(-1)
        with np.errstate(over="ignore"):
            keyed = flat * np.uint64(0x9E3779B97F4A7C15) + band_ids
        return pa.table({
            "doc_id": pa.array(np.tile(ids, bands), pa.int64()),
            "band_hash": pa.array(keyed.view(np.int64), pa.int64()),
            "bucket": pa.array((keyed % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
        })

    pairs_ds = (ds.map_batches(emit_bands, batch_format="pyarrow", batch_size=None)
                .groupby("bucket", num_partitions=n_shuffle)
                .map_groups(_bucket_pairs, batch_format="pyarrow")
                .groupby(["id_a", "id_b"], num_partitions=n_shuffle)
                .count()
                .map_batches(lambda b: b.select(["id_a", "id_b"]),
                             batch_format="pyarrow", batch_size=None)
                .materialize())
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        import ray.data

        return ray.data.from_arrow(pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}))

    # candidate-id Bloom from per-block partial filters (same geometry ->
    # bitwise OR; false positives only add pruned-pass rows, never pairs)
    n_est = 2 * n_pairs + 1024

    def partial_bloom(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(n_est, 1e-4)
        bf.add(batch.column("id_a"))
        bf.add(batch.column("id_b"))
        return pa.table({"bloom": pa.array([bf.to_bytes()], pa.binary())})

    parts = pairs_ds.map_batches(partial_bloom, batch_format="pyarrow",
                                 batch_size=None).take_all()
    bits = None
    for r in parts:
        b = np.frombuffer(r["bloom"][24:], np.uint64)
        bits = b.copy() if bits is None else np.bitwise_or(bits, b)
    bloom_bytes = bytes(parts[0]["bloom"][:24]) + bits.tobytes()

    def extract_shingles(batch: pa.Table) -> pa.Table:
        bf = BloomFilter.from_bytes(bloom_bytes)
        ids = batch.column(id_col).cast(pa.int64())
        sel = batch.filter(pa.array(bf.contains(ids)))
        if sel.num_rows == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.list_(pa.int64()))})
        h, row_of = kgram_hashes(sel.column(text_col), k=k)
        sel_ids = sel.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        lists = [np.unique(h[row_of == r]).view(np.int64).tolist()
                 for r in range(sel.num_rows)]
        return pa.table({"key": pa.array(sel_ids, pa.int64()),
                         "sh": pa.array(lists, pa.list_(pa.int64()))})

    shingles = ds.map_batches(extract_shingles, batch_format="pyarrow",
                              batch_size=None)

    def attach(side_col: str, carry: list[str]):
        """One keyed co-group: pair rows pick up the shingle list of
        their ``side_col`` id."""
        def tag_pairs(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {"key": batch.column(side_col).cast(pa.int64()),
                    "id_a": batch.column("id_a"), "id_b": batch.column("id_b"),
                    "sh": pa.nulls(n, pa.list_(pa.int64())),
                    "side": pa.array(np.ones(n, np.int8))}
            for c in carry:
                cols[c] = batch.column(c)
            return pa.table(cols)

        def tag_shingles(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {"key": batch.column("key"),
                    "id_a": pa.nulls(n, pa.int64()),
                    "id_b": pa.nulls(n, pa.int64()),
                    "sh": batch.column("sh"),
                    "side": pa.array(np.zeros(n, np.int8))}
            for c in carry:
                cols[c] = pa.nulls(n, pa.list_(pa.int64()))
            return pa.table(cols)

        return tag_pairs, tag_shingles

    def join_side(pairs_in, side_col: str, out_col: str, carry: list[str]):
        # bucketed co-group (NOT one map_groups call per doc id): rows
        # shuffle on hash(key) % n_shuffle and each bucket resolves ALL
        # its keys in one Arrow call via a dict join — the same
        # per-bucket shape as events.bucketed_by_key; the only per-row
        # Python is over the candidate-PAIR rows (output scale, same as
        # the verify kernel downstream)
        from .events import stamp_bucket

        tag_pairs, tag_shingles = attach(side_col, carry)

        def bucketize(t: pa.Table) -> pa.Table:
            return stamp_bucket(t, "key", n_shuffle)

        tagged = pairs_in.map_batches(tag_pairs, batch_format="pyarrow",
                                      batch_size=None).union(
            shingles.map_batches(tag_shingles, batch_format="pyarrow",
                                 batch_size=None)) \
            .map_batches(bucketize, batch_format="pyarrow",
                         batch_size=None)

        def per_bucket(t: pa.Table) -> pa.Table:
            side = t.column("side").to_numpy(zero_copy_only=False)
            sh_rows = t.filter(pa.array(side == 0))
            pr = t.filter(pa.array(side == 1))
            if pr.num_rows == 0:
                out = {"id_a": pa.array([], pa.int64()),
                       "id_b": pa.array([], pa.int64()),
                       out_col: pa.array([], pa.list_(pa.int64()))}
                for c in carry:
                    out[c] = pa.array([], pa.list_(pa.int64()))
                return pa.table(out)
            m = dict(zip(sh_rows.column("key").to_numpy(
                zero_copy_only=False).tolist(),
                sh_rows.column("sh").to_pylist()))
            pkeys = pr.column("key").to_numpy(zero_copy_only=False)
            vals = [m.get(k, []) for k in pkeys.tolist()]
            out = {"id_a": pr.column("id_a"), "id_b": pr.column("id_b"),
                   out_col: pa.array(vals, pa.list_(pa.int64()))}
            for c in carry:
                out[c] = pr.column(c)
            return pa.table(out)

        return tagged.groupby("__bkt", num_partitions=n_shuffle) \
            .map_groups(per_bucket, batch_format="pyarrow")

    with_a = join_side(pairs_ds, "id_a", "sh_a", [])
    with_ab = join_side(with_a, "id_b", "sh_b", ["sh_a"])

    def verify(batch: pa.Table) -> pa.Table:
        a_ids = batch.column("id_a").to_numpy(zero_copy_only=False)
        b_ids = batch.column("id_b").to_numpy(zero_copy_only=False)
        sh_a = batch.column("sh_a").to_pylist()
        sh_b = batch.column("sh_b").to_pylist()
        rows = []
        for i in range(len(batch)):    # per candidate PAIR (output scale)
            j = ngram_jaccard(np.asarray(sh_a[i], np.int64),
                              np.asarray(sh_b[i], np.int64))
            if j >= threshold:
                rows.append((int(min(a_ids[i], b_ids[i])),
                             int(max(a_ids[i], b_ids[i])), round(float(j), 6)))
        rows.sort()
        return pa.table({"id_a": pa.array([r[0] for r in rows], pa.int64()),
                         "id_b": pa.array([r[1] for r in rows], pa.int64()),
                         "jaccard": pa.array([r[2] for r in rows], pa.float64())})

    return with_ab.map_batches(verify, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(col: pa.Array) -> np.ndarray:
    """64-bit SimHash per row from whitespace-token hashes: per-bit
    weighted majority, fully vectorized (unpack bits -> segmented sums)."""
    from .textstats import token_hashes

    n_rows = len(col)
    th, row_of = token_hashes(col)
    if th.size == 0:
        return np.zeros(n_rows, np.uint64)
    bits = np.unpackbits(th.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little").astype(np.int32)   # (n_tok, 64)
    contrib = bits * 2 - 1
    order, starts = _row_segments(row_of, n_rows)
    rows_present = row_of[order][starts]
    sums = np.add.reduceat(contrib[order], starts, axis=0)     # (n_present, 64)
    sig_bits = (sums > 0).astype(np.uint8)
    packed = np.packbits(sig_bits, axis=1, bitorder="little").view(np.uint64).ravel()
    out = np.zeros(n_rows, np.uint64)
    out[rows_present] = packed
    return out


def simhash_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash: 4x16-bit band blocking (any pair within
    hamming<=3 shares at least one exact 16-bit band), exact popcount
    verify. Returns (id_a, id_b, hamming)."""
    n_shuffle = shuffle_partitions()
    n_buckets = n_shuffle * 16

    def emit(batch: pa.Table) -> pa.Table:
        sig = simhash_signatures(batch.column(text_col))
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = sig.size
        parts = []
        for b in range(4):
            band = (sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            with np.errstate(over="ignore"):
                keyed = band * np.uint64(0x9E3779B97F4A7C15) + np.uint64(b)
            parts.append(pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "band_hash": pa.array(keyed.view(np.int64), pa.int64()),
                "bucket": pa.array((keyed % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
                "sig": pa.array(sig.view(np.int64), pa.int64()),
            }))
        return pa.concat_tables(parts)

    rows = (ds.map_batches(emit, batch_format="pyarrow", batch_size=None)
            .groupby("bucket", num_partitions=n_shuffle)
            .map_groups(_sig_bucket_pairs(max_hamming),
                        batch_format="pyarrow")
            .to_pandas())
    if rows.empty:
        return pd.DataFrame(columns=["id_a", "id_b", "hamming"])
    return (rows.drop_duplicates(["id_a", "id_b"])
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


def _sig_bucket_pairs(max_hamming: int):
    """Per-bucket exact popcount verify over banded 64-bit signatures:
    rows (doc_id, band_hash, sig) colliding on band_hash become
    (id_a, id_b, hamming) pairs iff hamming <= max_hamming."""
    def bucket_pairs_sig(t: pa.Table) -> pa.Table:
        bh = t.column("band_hash").to_numpy()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sigs = t.column("sig").to_numpy(zero_copy_only=False)
        order = np.argsort(bh, kind="stable")
        bhs = bh[order]
        starts = np.flatnonzero(np.concatenate([[True], bhs[1:] != bhs[:-1]]))
        ends = np.concatenate([starts[1:], [bhs.size]])
        a_o, b_o, h_o = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            grp_idx = order[s:e]
            grp = sorted({(int(ids[i]), int(sigs[i])) for i in grp_idx})
            for i in range(len(grp)):
                for j in range(i + 1, len(grp)):
                    if grp[i][0] == grp[j][0]:
                        continue
                    x = np.uint64(grp[i][1]) ^ np.uint64(grp[j][1])
                    ham = int(bin(int(x)).count("1"))
                    if ham <= max_hamming:
                        a_o.append(grp[i][0])
                        b_o.append(grp[j][0])
                        h_o.append(ham)
        return pa.table({"id_a": pa.array(a_o, pa.int64()),
                         "id_b": pa.array(b_o, pa.int64()),
                         "hamming": pa.array(h_o, pa.int64())})
    return bucket_pairs_sig


def signature_hamming_pairs(ds, sig_col: str, id_col: str,
                            max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs over a PRECOMPUTED 64-bit signature column (int64
    bit-pattern) — the generic back half of ``simhash_pairs``, reusable
    by any fingerprint producer (perceptual image hashes, audio
    chroma hashes, rolling text hashes).

    Pigeonhole guarantee: with 4 x 16-bit bands, any pair within
    hamming <= 3 agrees exactly on >= 1 band, so banding finds every
    such pair; the per-bucket exact popcount verify removes false
    candidates. The exchange carries 24 B/row/band; payloads never
    move. Returns (id_a, id_b, hamming) sorted, deduplicated."""
    if max_hamming > 3:
        raise ValueError("signature_hamming_pairs: 4x16-bit banding only "
                         "guarantees recall for max_hamming <= 3; raise the "
                         "band count for looser thresholds")
    n_shuffle = shuffle_partitions()
    n_buckets = n_shuffle * 16

    def emit(batch: pa.Table) -> pa.Table:
        sig = batch.column(sig_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        parts = []
        for b in range(4):
            band = (sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            with np.errstate(over="ignore"):
                keyed = band * np.uint64(0x9E3779B97F4A7C15) + np.uint64(b)
            parts.append(pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "band_hash": pa.array(keyed.view(np.int64), pa.int64()),
                "bucket": pa.array(
                    (keyed % np.uint64(n_buckets)).astype(np.int32),
                    pa.int32()),
                "sig": pa.array(sig.view(np.int64), pa.int64()),
            }))
        return pa.concat_tables(parts)

    rows = (ds.map_batches(emit, batch_format="pyarrow", batch_size=None)
            .groupby("bucket", num_partitions=n_shuffle)
            .map_groups(_sig_bucket_pairs(max_hamming),
                        batch_format="pyarrow")
            .to_pandas())
    if rows.empty:
        return pd.DataFrame(columns=["id_a", "id_b", "hamming"])
    return (rows.drop_duplicates(["id_a", "id_b"])
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def _vectors(batch: pa.Table, vec_col: str) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> / tensor-extension column."""
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if isinstance(col.type, pa.BaseExtensionType):  # ray tensor extension
        M = np.asarray(col.to_numpy(zero_copy_only=False).tolist(), dtype=np.float64)
        return M if n else M.reshape(0, 0)
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _candidate_vectors(ds, vec_col: str, id_col: str, ids: np.ndarray) -> dict:
    """Second pruned pass: normalized vector per CANDIDATE id — only
    collision candidates ship their payload; the full embedding table
    never re-enters the exchange (same pattern as _shingle_sets)."""
    id_set = pa.array(np.unique(ids).astype(np.int64), pa.int64())

    def extract(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(id_col).cast(pa.int64()), value_set=id_set)
        sel = batch.filter(mask)
        if sel.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float64()))})
        V = _vectors(sel, vec_col)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        sel_ids = sel.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(sel_ids, pa.int64()),
                         "vec": pa.array([r.tolist() for r in Vn],
                                         pa.list_(pa.float64()))})

    rows = ds.map_batches(extract, batch_format="pyarrow", batch_size=None).take_all()
    return {r[id_col]: np.asarray(r["vec"], dtype=np.float64) for r in rows}


def embedding_neardup_pairs(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                            threshold: float = 0.95, n_planes: int = 8,
                            n_tables: int = 4, dim: int | None = None) -> pd.DataFrame:
    """Near-duplicate pairs by cosine similarity >= threshold.

    Blocking: ``n_tables`` independent random-hyperplane signatures of
    ``n_planes`` bits; near-identical vectors collide in at least one
    table w.h.p. The band exchange ships IDS ONLY (24 B/row/table — the
    vector itself never enters the shuffle); candidate vectors are
    fetched in a second pruned pass and verified with exact dot products.
    Returns (id_a, id_b, cosine)."""
    n_shuffle = shuffle_partitions()
    n_buckets = n_shuffle * 16

    def make_planes(d):
        r = np.random.default_rng(42)
        return [r.standard_normal((d, n_planes)) for _ in range(n_tables)]

    def emit(batch: pa.Table) -> pa.Table:
        V = _vectors(batch, vec_col)
        n, d = V.shape
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        pls = make_planes(d)
        parts = []
        pow2 = (1 << np.arange(n_planes, dtype=np.int64))
        for t_i, P in enumerate(pls):
            # int64 lane: numpy's uint64 broadcast multiply is a slow
            # buffered path (see state/hashing.hash64_multi)
            bits = (Vn @ P > 0).astype(np.int64)
            code = (bits * pow2[None, :]).sum(axis=1).astype(np.uint64)
            with np.errstate(over="ignore"):
                keyed = code * np.uint64(0x9E3779B97F4A7C15) + np.uint64(t_i)
            parts.append(pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "band_hash": pa.array(keyed.view(np.int64), pa.int64()),
                "bucket": pa.array((keyed % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
            }))
        return pa.concat_tables(parts)

    cand_ds = (ds.map_batches(emit, batch_format="pyarrow", batch_size=None)
               .groupby("bucket", num_partitions=n_shuffle)
               .map_groups(_bucket_pairs, batch_format="pyarrow"))
    cands = _collect_colliding(cand_ds)
    if not cands:
        return pd.DataFrame(columns=["id_a", "id_b", "cosine"])
    ids = np.array(sorted({i for p in cands for i in p}), dtype=np.int64)
    vecs = _candidate_vectors(ds, vec_col, id_col, ids)
    rows = []
    for a, b in sorted(cands):
        c = float(vecs[a] @ vecs[b])
        if c >= threshold:
            rows.append((int(min(a, b)), int(max(a, b)), round(c, 6)))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"])


def fuzzy_join_pairs(left, right, *, text_col: str = "text",
                     id_col: str = "doc_id", right_text_col: str | None = None,
                     right_id_col: str | None = None, num_perm: int = 64,
                     bands: int = 16, k: int = 5,
                     threshold: float = 0.5) -> pd.DataFrame:
    """Similarity (record-linkage) JOIN between two tables: pairs
    (id_left, id_right, jaccard) whose k-gram Jaccard >= threshold.

    Same physical shape as ``minhash_lsh_pairs`` — both sides stream
    through one MinHash pass, the ids-only band exchange buckets them
    together, and only CROSS-side collisions survive (side is encoded
    in the id's low bit, so within-side near-dups never become
    candidates). Exact Jaccard verification fetches candidate shingle
    sets in a second pruned pass over the union. Ids must fit 63 bits.
    """
    rt = right_text_col or text_col
    ri = right_id_col or id_col

    def canon(text_c: str, id_c: str, side: int):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_c).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            return pa.table({
                "doc_id": pa.array(ids * 2 + side, pa.int64()),
                "text": batch.column(text_c).cast(pa.string()),
            })
        return fn

    import ray.data  # session owned by caller

    both = (left.map_batches(canon(text_col, id_col, 0),
                             batch_format="pyarrow", batch_size=None)
            .union(right.map_batches(canon(rt, ri, 1),
                                     batch_format="pyarrow", batch_size=None)))
    n_shuffle = shuffle_partitions()
    n_buckets = n_shuffle * 16

    def emit_bands(batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(batch.column("text"), num_perm=num_perm, k=k)
        bh = _band_hashes(sig, bands)
        n = sig.shape[1]
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        band_ids = np.repeat(np.arange(bands, dtype=np.uint64), n)
        flat = bh.reshape(-1)
        with np.errstate(over="ignore"):
            keyed = flat * np.uint64(0x9E3779B97F4A7C15) + band_ids
        return pa.table({
            "doc_id": pa.array(np.tile(ids, bands), pa.int64()),
            "band_hash": pa.array(keyed.view(np.int64), pa.int64()),
            "bucket": pa.array((keyed % np.uint64(n_buckets)).astype(np.int32),
                               pa.int32()),
        })

    cand_ds = (both.map_batches(emit_bands, batch_format="pyarrow",
                                batch_size=None)
               .groupby("bucket", num_partitions=n_shuffle)
               .map_groups(_bucket_pairs, batch_format="pyarrow"))
    # only cross-side collisions are join candidates
    cands = {(a, b) for a, b in _collect_colliding(cand_ds)
             if (a ^ b) & 1}
    if not cands:
        return pd.DataFrame(columns=["id_left", "id_right", "jaccard"])
    ids = np.array(sorted({i for p in cands for i in p}), dtype=np.int64)
    shingles = _shingle_sets(both, "text", "doc_id", ids, k)
    rows = []
    for a, b in sorted(cands):
        j = ngram_jaccard(shingles[a], shingles[b])
        if j >= threshold:
            l, r = (a, b) if a % 2 == 0 else (b, a)
            rows.append((int(l // 2), int(r // 2), round(float(j), 6)))
    out = pd.DataFrame(rows, columns=["id_left", "id_right", "jaccard"])
    return out.sort_values(["id_left", "id_right"]).reset_index(drop=True)


def neardup_dedup_rows_distributed(ds, text_col: str = "text",
                                   id_col: str = "doc_id",
                                   threshold: float = 0.5,
                                   pairs=None, **lsh_kw):
    """Dup-heavy keep-one near-dup dedup: NOTHING ever lands on the
    driver — the scale path that removes `neardup_dedup_rows`'s
    rare-dup assumption (its driver union-find + broadcast drop set).

    Pairs come from ``minhash_lsh_pairs_distributed`` (ids-only band
    exchange, Bloom-pruned verify), clusters from the distributed
    ``connected_components`` label propagation, and the drop set — every
    node whose component representative isn't itself — anti-joins the
    corpus via ONE native left-outer hash join + a stateless null-marker
    filter. Pass precomputed ``pairs`` (a Dataset with id_a/id_b) to
    reuse an existing LSH run. Returns the surviving rows as a Dataset.
    """
    from .graph import connected_components

    if pairs is None:
        pairs = minhash_lsh_pairs_distributed(
            ds, text_col, id_col, threshold=threshold, **lsh_kw)
    labels = connected_components(pairs, a_col="id_a", b_col="id_b")

    def non_reps(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch.column("node"), batch.column("comp"))
        return pa.table({"__drop_id": batch.column("node").filter(keep),
                         "__drop": pa.array(
                             np.ones(int(pc.sum(keep).as_py() or 0),
                                     np.int8))})

    # Compact the drop side to empty-block-free balanced blocks before
    # the native hash join (Ray only schema-broadcasts off the first
    # streamed block and skips empty ones — see graph.py's note), and
    # skip the join entirely when nothing is marked for dropping.
    drop = labels.map_batches(non_reps, batch_format="pyarrow",
                              batch_size=None).materialize()
    n_drop = drop.count()
    if n_drop == 0:
        return ds
    drop = drop.repartition(min(shuffle_partitions(), n_drop))
    joined = ds.join(drop, join_type="left_outer", on=(id_col,),
                     right_on=("__drop_id",),
                     num_partitions=shuffle_partitions())

    def keep_unmarked(batch: pa.Table) -> pa.Table:
        mask = pc.is_null(batch.column("__drop"))
        cols = [c for c in batch.column_names
                if c not in ("__drop", "__drop_id")]
        return batch.filter(mask).select(cols)

    return joined.map_batches(keep_unmarked, batch_format="pyarrow",
                              batch_size=None)


def ngram_overlap_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 8, max_docs_per_gram: int | None = None):
    """EXACT cross-document token n-gram overlap: pairs of documents
    sharing at least one verbatim n-token window, with the count of
    distinct shared windows — the exact-substring complement of
    MinHash (which estimates whole-doc Jaccard) and the signal behind
    Lee et al.'s "Deduplicating Training Data" substring dedup.

    Scale shape: each block folds its docs to DISTINCT (gram-hash,
    doc) rows via the flat rolling-hash kernel (a doc lives in one
    row, so distinctness is global); grams hash-shuffle ONCE and each
    gram group emits its doc pairs; one more keyed shuffle counts
    distinct shared grams per pair. Boilerplate grams shared by huge
    doc sets explode quadratically — ``max_docs_per_gram`` skips
    grams above the cap (report them via
    ``curation.common_ngrams`` / strip with ``remove_frequent_lines``
    instead). 64-bit polynomial gram hashes stand in for the window
    text (collision odds ~n_grams^2 / 2^64). Returns a Dataset
    (id_a, id_b, n_shared)."""
    from .curation import token_ngram_hashes

    def grams(batch: pa.Table) -> pa.Table:
        h, rows = token_ngram_hashes(
            batch.column(text_col).combine_chunks()
            if isinstance(batch.column(text_col), pa.ChunkedArray)
            else batch.column(text_col), n=n)
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)[rows]
        t = pa.table({"gram": pa.array(h, pa.uint64()),
                      "doc": pa.array(ids, pa.int64())})
        return t.group_by(["gram", "doc"]).aggregate([])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64")})
        docs = np.unique(df["doc"].to_numpy(dtype=np.int64))
        d = docs.size
        if d < 2 or (max_docs_per_gram is not None
                     and d > max_docs_per_gram):
            return empty
        i, j = np.triu_indices(d, k=1)
        return pd.DataFrame({"id_a": docs[i], "id_b": docs[j]})

    gram_rows = ds.map_batches(grams, batch_format="pyarrow",
                               batch_size=None)
    pair_rows = gram_rows.groupby("gram",
                                  num_partitions=shuffle_partitions()) \
        .map_groups(pairs, batch_format="pandas")

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["id_a", "id_b"]).aggregate([([], "count_all")])
        return pa.table({"id_a": g.column("id_a").cast(pa.int64()),
                         "id_b": g.column("id_b").cast(pa.int64()),
                         "n_shared": g.column("count_all").cast(pa.int64())})

    def count_merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "n_shared": pd.Series([], dtype="int64")})
        out = df.groupby(["id_a", "id_b"], as_index=False)["n_shared"].sum()
        out["n_shared"] = out["n_shared"].astype("int64")
        return out

    return pair_rows.map_batches(count_partial, batch_format="pyarrow",
                                 batch_size=None) \
        .groupby("id_a", num_partitions=shuffle_partitions()) \
        .map_groups(count_merge, batch_format="pandas")


def ngram_containment_pairs(ds, text_col: str = "text",
                            id_col: str = "doc_id", n: int = 8,
                            min_containment: float = 0.5,
                            max_docs_per_gram: int | None = None):
    """ASYMMETRIC n-gram containment: for each overlapping pair,
    containment(a in b) = shared distinct windows / a's distinct
    windows — the quote/subset detector Jaccard misses (a tweet quoted
    inside an article has tiny Jaccard but containment ~1; Broder's
    original resemblance-vs-containment distinction).

    Cost on top of ``ngram_overlap_pairs``: one more per-block
    combiner for per-doc distinct-window counts and a pair-scale
    pandas join on the (rare, by the standing assumption) overlap
    pairs. Returns pairs with max(c_ab, c_ba) >=
    ``min_containment`` as a DataFrame (id_a, id_b, n_shared, n_a,
    n_b, c_ab, c_ba) sorted."""
    from .curation import token_ngram_hashes

    pairs = ngram_overlap_pairs(ds, text_col, id_col, n=n,
                                max_docs_per_gram=max_docs_per_gram) \
        .to_pandas()
    if pairs.empty:
        return pd.DataFrame(columns=["id_a", "id_b", "n_shared",
                                     "n_a", "n_b", "c_ab", "c_ba"])

    def count_partial(batch: pa.Table) -> pa.Table:
        g, row_of = token_ngram_hashes(batch.column(text_col), n)
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if g.size == 0:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        df = pd.DataFrame({"doc": ids[row_of], "g": g})
        c = df.drop_duplicates().groupby("doc").size()
        return pa.table({"doc": pa.array(c.index.to_numpy(np.int64)),
                         "cnt": pa.array(c.to_numpy(np.int64))})

    counts = ds.map_batches(count_partial, batch_format="pyarrow",
                            batch_size=None).to_pandas() \
        .groupby("doc")["cnt"].sum()
    out = pairs.copy()
    out["n_a"] = counts.loc[out["id_a"]].to_numpy(np.int64)
    out["n_b"] = counts.loc[out["id_b"]].to_numpy(np.int64)
    raw_ab = out["n_shared"] / out["n_a"]
    raw_ba = out["n_shared"] / out["n_b"]
    out = out[np.maximum(raw_ab, raw_ba) >= min_containment].copy()
    out["c_ab"] = np.round(out["n_shared"] / out["n_a"], 6)
    out["c_ba"] = np.round(out["n_shared"] / out["n_b"], 6)
    for c in ("id_a", "id_b", "n_shared", "n_a", "n_b"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def dup_rate_by_segment(ds, key_cols: list[str],
                        seg_col: str) -> pd.DataFrame:
    """Duplicate-rate per SEGMENT — "which source/lang is shipping the
    copies": per segment, rows, distinct key tuples and the share of
    rows that are surplus duplicates (rows − distinct) / rows; the
    segment-resolved form of ``exact_dedup_counts``, pointing the
    dedup effort at the offending feed.

    One pruned bucket-grouped shuffle of (key-hash, segment) — 8 bytes
    + the segment id per row; per-bucket distinct/duplicate counting
    per segment, segment-scale partials to the driver. Keys are
    counted within segments (the same content in two segments is not a
    within-segment dup). Returns (segment, n_rows, n_distinct,
    n_dup_rows, dup_rate) sorted by segment."""
    n_shuffle = shuffle_partitions()
    n_buckets = n_shuffle * 16

    def project(batch: pa.Table) -> pa.Table:
        h = combine_hashes(*[hash64(batch.column(c)) for c in key_cols])
        # null segments ride as the engine's "\0null" sentinel (the
        # _with_shuffle_key convention) and map back to None at the end
        return pa.table({
            "key_hash": pa.array(h.view(np.int64), pa.int64()),
            "seg": pc.fill_null(batch.column(seg_col).cast(pa.string()),
                                "\0null"),
            "bucket": pa.array((h % np.uint64(n_buckets))
                               .astype(np.int32), pa.int32())})

    def bucket_stats(t: pa.Table) -> pa.Table:
        df = pa.table({"seg": t.column("seg"),
                       "k": t.column("key_hash")}).to_pandas()
        g = df.groupby("seg").agg(
            n_rows=("k", "size"), n_distinct=("k", "nunique"))
        g = g.reset_index()
        return pa.table({"seg": pa.array(g["seg"], pa.string()),
                         "n_rows": pa.array(g["n_rows"], pa.int64()),
                         "n_distinct": pa.array(g["n_distinct"],
                                                pa.int64())})

    parts = (ds.map_batches(project, batch_format="pyarrow",
                            batch_size=None)
             .groupby("bucket", num_partitions=n_shuffle)
             .map_groups(bucket_stats, batch_format="pyarrow")
             .to_pandas())
    if parts.empty:
        return pd.DataFrame({seg_col: pd.Series([], dtype=object),
                             "n_rows": pd.Series([], dtype="int64"),
                             "n_distinct": pd.Series([], dtype="int64"),
                             "n_dup_rows": pd.Series([], dtype="int64"),
                             "dup_rate": []})
    g = parts.groupby("seg", as_index=False).sum()
    g["seg"] = g["seg"].where(g["seg"] != "\0null", None)
    out = pd.DataFrame({seg_col: g["seg"],
                        "n_rows": g["n_rows"].astype("int64"),
                        "n_distinct": g["n_distinct"].astype("int64")})
    out["n_dup_rows"] = (out["n_rows"] - out["n_distinct"]) \
        .astype("int64")
    out["dup_rate"] = np.round(out["n_dup_rows"] / out["n_rows"], 6)
    key = out[seg_col].astype(str)
    return out.iloc[np.argsort(key, kind="mergesort")] \
        .reset_index(drop=True)


# ---------------------------------------------------------------------------
# edit-distance (Levenshtein) near-dup pairs — FastSS deletion blocking
# ---------------------------------------------------------------------------

_ED_B = np.uint64(0x100000001B3)          # polynomial base (FNV prime)
_ED_K1 = np.uint64(0x9E3779B97F4A7C15)    # final mixing constants
_ED_K2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _ed_byte_matrix(col) -> tuple[np.ndarray, np.ndarray]:
    """(vals, lens): per-row 0-padded (n, Lmax) uint64 matrix of
    utf8 byte values + 1 (so padding 0 never equals a real byte), from
    the flat buffer — no per-row Python loop."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.cast(arr, pa.string())
    arr = fill_utf8(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                         count=len(arr) + 1) + arr.offset
    buf = arr.buffers()[2]
    flat = (np.frombuffer(buf, dtype=np.uint8, count=buf.size)
            if buf is not None and buf.size else np.zeros(0, np.uint8))
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    n, lmax = lens.size, int(lens.max()) if lens.size else 0
    vals = np.zeros((n, max(lmax, 1)), dtype=np.uint64)
    if flat.size:
        rows = np.repeat(np.arange(n), lens)
        cols = (np.arange(offs[0], offs[-1]) -
                np.repeat(offs[:-1].astype(np.int64), lens))
        vals[rows, cols] = flat[offs[0]:offs[-1]].astype(np.uint64) + 1
    return vals, lens


def deletion_hashes(col, max_dist: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """All deletion-neighborhood hashes (0..max_dist byte deletions) per
    row, fully vectorized: polynomial prefix hashes over the padded byte
    matrix, then every k-deletion variant's hash is recomposed from
    prefix hashes and base powers with uint64 wraparound arithmetic —
    the variant STRING is never materialized.

    FastSS (Bocek et al. 2007): byte-level levenshtein(a, b) <= d implies
    the d-deletion neighborhoods of a and b intersect, so hash-equality
    over these keys is a complete (superset) candidate filter for an
    edit-distance-<=d pair search. Returns (hashes uint64, row_of int64).
    """
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    with np.errstate(over="ignore"):           # uint64 wraparound is the hash
        return _deletion_hashes_impl(col, max_dist)


def _deletion_hashes_impl(col, max_dist: int):
    vals, lens = _ed_byte_matrix(col)
    n, lmax = vals.shape
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    pows = np.empty(lmax + 2, dtype=np.uint64)
    pows[0] = 1
    for k in range(1, lmax + 2):
        pows[k] = pows[k - 1] * _ED_B
    pref = np.zeros((n, lmax + 1), dtype=np.uint64)
    for k in range(lmax):                      # lmax iterations, each O(n)
        pref[:, k + 1] = pref[:, k] * _ED_B + vals[:, k]
    rows_idx = np.arange(n)
    p_full = pref[rows_idx, lens]
    out_h = [p_full * _ED_K1 + lens.astype(np.uint64) * _ED_K2]
    out_r = [rows_idx.astype(np.int64)]

    # one deletion at i: broadcast over (row, i)
    i_idx = np.arange(lmax)
    valid1 = lens[:, None] > i_idx[None, :]
    e1 = lens[:, None] - 1 - i_idx[None, :]            # tail exponent
    e1c = np.clip(e1, 0, lmax + 1)
    h1 = (pref[:, :lmax] * pows[e1c] + p_full[:, None]
          - pref[:, 1:lmax + 1] * pows[e1c])
    k1 = h1 * _ED_K1 + (lens[:, None] - 1).astype(np.uint64) * _ED_K2
    r1, c1 = np.nonzero(valid1)
    out_h.append(k1[r1, c1])
    out_r.append(r1.astype(np.int64))

    if max_dist == 2:
        ii_all, jj_all = np.triu_indices(lmax, k=1)    # deletion pairs i<j
        # chunk the pair axis so the (rows x pairs) broadcast stays ~32MB
        step = max(1, (4 << 20) // max(n, 1))
        for s in range(0, ii_all.size, step):
            ii, jj = ii_all[s:s + step], jj_all[s:s + step]
            valid2 = lens[:, None] > jj[None, :]
            if not valid2.any():
                continue
            et = np.clip(lens[:, None] - 1 - jj[None, :], 0, lmax + 1)
            eh = np.clip(lens[:, None] - 2 - ii[None, :], 0, lmax + 1)
            em = np.clip(jj - 1 - ii, 0, lmax + 1)
            head = pref[:, ii] * pows[eh]
            mid = (pref[:, jj] - pref[:, ii + 1] * pows[em][None, :]) \
                * pows[et]
            tail = p_full[:, None] - pref[:, jj + 1] * pows[et]
            k2 = ((head + mid + tail) * _ED_K1
                  + (lens[:, None] - 2).astype(np.uint64) * _ED_K2)
            r2, c2 = np.nonzero(valid2)
            out_h.append(k2[r2, c2])
            out_r.append(r2.astype(np.int64))
    return np.concatenate(out_h), np.concatenate(out_r)


def levenshtein_many(a_strs: list[bytes], b_strs: list[bytes]) -> np.ndarray:
    """Exact byte-level Levenshtein distance for m pairs at once:
    Wagner-Fischer vectorized across the pair axis AND the column axis
    (the in-row left-neighbor dependency resolves as a running minimum:
    cur[j] = min_{k<=j}(tmp[k] + j - k) = accumulate-min(tmp - j) + j).
    Only the row axis loops. Byte-level == char-level on ASCII and
    matches DuckDB/Postgres levenshtein() semantics on all inputs."""
    m = len(a_strs)
    if m == 0:
        return np.zeros(0, np.int64)
    la = np.array([len(s) for s in a_strs], dtype=np.int64)
    lb = np.array([len(s) for s in b_strs], dtype=np.int64)
    lam, lbm = int(la.max()), int(lb.max())
    A = np.zeros((m, max(lam, 1)), dtype=np.uint8)
    B = np.zeros((m, max(lbm, 1)), dtype=np.uint8)
    for r, s in enumerate(a_strs):             # candidate pairs are rare
        A[r, :len(s)] = np.frombuffer(s, np.uint8)
    for r, s in enumerate(b_strs):
        B[r, :len(s)] = np.frombuffer(s, np.uint8)
    jj = np.arange(lbm + 1, dtype=np.int64)
    prev = np.broadcast_to(jj, (m, lbm + 1)).copy()
    res = np.empty(m, dtype=np.int64)
    done = la == 0
    res[done] = lb[done]
    for i in range(1, lam + 1):
        sub = (A[:, i - 1:i] != B).astype(np.int64)    # (m, lbm)
        tmp = np.empty((m, lbm + 1), dtype=np.int64)
        tmp[:, 0] = i
        tmp[:, 1:] = np.minimum(prev[:, :-1] + sub, prev[:, 1:] + 1)
        cur = np.minimum.accumulate(tmp - jj, axis=1) + jj
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
        prev = cur
    return res


def edit_distance_pairs(ds, *, text_col: str = "text",
                        id_col: str = "doc_id", max_dist: int = 1,
                        max_len: int = 512) -> pd.DataFrame:
    """All pairs (id_a, id_b, dist) with byte-level Levenshtein distance
    <= max_dist, id_a < id_b, exactly — the short-string entity-
    resolution dedup (dirty vocabularies, catalog names, paths).

    Scale shape (same as ``minhash_lsh_pairs``): one vectorized pass
    emits the FastSS deletion-neighborhood hashes (complete candidate
    filter — no true pair can be missed), ids + 8-byte hashes exchange
    on uniform buckets, colliding ids become candidate pairs (assumed
    rare — collected to the driver like the other near-dup verifiers),
    and a second pruned pass fetches ONLY candidate strings for the
    exact vectorized Levenshtein verify. Emission is O(L^max_dist)
    keys/row, which is why this is a short-string operator: rows longer
    than max_len raise rather than silently degrade. Nulls dedup as ''.

    The reference engine has no record-linkage operator; this extends
    its dedup story (SURVEY §2) with the exact-threshold variant that
    MinHash (set-semantics) cannot express.
    """
    pairs, strings = _ed_candidates(ds, text_col, id_col, max_dist,
                                    max_len, "edit_distance_pairs")
    if not pairs:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "dist": pd.Series([], dtype="int64")})
    a_s = [strings[a] for a, _ in pairs]
    b_s = [strings[b] for _, b in pairs]
    keep = np.abs(np.array([len(x) for x in a_s], dtype=np.int64)
                  - np.array([len(x) for x in b_s], dtype=np.int64)) \
        <= max_dist
    dists = np.full(len(pairs), max_dist + 1, dtype=np.int64)
    if keep.any():
        ki = np.flatnonzero(keep)
        dists[ki] = levenshtein_many([a_s[i] for i in ki],
                                     [b_s[i] for i in ki])
    ok = dists <= max_dist
    return pd.DataFrame({
        "id_a": pd.Series([p[0] for p, o in zip(pairs, ok) if o],
                          dtype="int64"),
        "id_b": pd.Series([p[1] for p, o in zip(pairs, ok) if o],
                          dtype="int64"),
        "dist": pd.Series(dists[ok], dtype="int64")})


def _ed_candidates(ds, text_col: str, id_col: str, block_dist: int,
                   max_len: int, opname: str):
    """Shared deletion-blocking candidate generation for the string-
    similarity family: FastSS emit -> uniform-bucket exchange ->
    colliding id pairs -> pruned fetch of ONLY candidate strings.
    Returns (sorted candidate pairs, {id: utf8 bytes})."""
    n_shuffle = shuffle_partitions()
    n_buckets = n_shuffle * 16

    def emit(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        ln = pc.max(pc.binary_length(pc.cast(txt, pa.string())))
        if ln.as_py() is not None and ln.as_py() > max_len:
            raise ValueError(
                f"{opname}: row exceeds max_len={max_len} "
                "bytes; this operator is for short strings")
        h, row_of = deletion_hashes(txt, block_dist)
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[row_of], pa.int64()),
            "band_hash": pa.array(h.view(np.int64), pa.int64()),
            "bucket": pa.array((h % np.uint64(n_buckets)).astype(np.int32),
                               pa.int32())})

    cand_ds = (ds.map_batches(emit, batch_format="pyarrow", batch_size=None)
               .groupby("bucket", num_partitions=n_shuffle)
               .map_groups(_bucket_pairs, batch_format="pyarrow"))
    cands = _collect_colliding(cand_ds)
    if not cands:
        return [], {}
    ids = np.unique(np.array(sorted({i for p in cands for i in p}),
                             dtype=np.int64))
    id_set = pa.array(ids, pa.int64())

    def fetch(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(id_col).cast(pa.int64()),
                        value_set=id_set)
        sel = batch.filter(mask)
        return pa.table({
            "doc_id": sel.column(id_col).cast(pa.int64()),
            "text": pc.fill_null(pc.cast(sel.column(text_col),
                                         pa.string()), "")})

    strings = {r["doc_id"]: r["text"].encode("utf-8")
               for r in ds.map_batches(fetch, batch_format="pyarrow",
                                       batch_size=None).take_all()}
    return sorted(cands), strings


def jaro_winkler_bytes(a: bytes, b: bytes) -> float:
    """Byte-level Jaro-Winkler similarity — standard constants (prefix
    scale 0.1, prefix cap 4, boost threshold 0.7), matching DuckDB /
    Postgres ``jaro_winkler_similarity`` semantics exactly (which are
    also byte-level on UTF-8). Runs only on the small verified candidate
    set, never in a per-row hot path."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0                 # DuckDB: jaro_winkler('','') == 0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    a_match = [False] * la
    b_match = [False] * lb
    m = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_match[j] and a[i] == b[j]:
                a_match[i] = b_match[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if a_match[i]:
            while not b_match[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    jaro = (m / la + m / lb + (m - t // 2) / m) / 3.0
    if jaro <= 0.7:
        return jaro
    ell = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        ell += 1
    return jaro + ell * 0.1 * (1.0 - jaro)


def damerau_levenshtein_bytes(a: bytes, b: bytes) -> int:
    """Byte-level UNRESTRICTED Damerau-Levenshtein (transposition cost 1,
    edits allowed inside transposed blocks — the variant DuckDB's
    ``damerau_levenshtein`` implements: d('ca','abc') == 2, not OSA's 3).
    Runs only on the small verified candidate set."""
    la, lb = len(a), len(b)
    maxd = la + lb
    da = {}
    D = [[maxd] * (lb + 2) for _ in range(la + 2)]
    D[1][1] = 0
    for i in range(1, la + 1):
        D[i + 1][1] = i
    for j in range(1, lb + 1):
        D[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            ell = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            D[i + 1][j + 1] = min(
                D[i][j] + cost,                       # substitution
                D[i + 1][j] + 1,                      # insertion
                D[i][j + 1] + 1,                      # deletion
                D[k][ell] + (i - k - 1) + 1 + (j - ell - 1))  # transposition
        da[a[i - 1]] = i
    return D[la + 1][lb + 1]


def string_similarity_pairs(ds, *, metric: str = "jaro_winkler",
                            text_col: str = "text", id_col: str = "doc_id",
                            block_dist: int = 2, min_sim: float = 0.8,
                            max_dist: int | None = None,
                            max_len: int = 512) -> pd.DataFrame:
    """Blocked string-similarity self-join over short strings.

    Candidates come from the same FastSS deletion blocking as
    ``edit_distance_pairs`` — COMPLETE for any pair within byte edit
    distance <= block_dist (and therefore for Damerau distance <=
    block_dist too: every Damerau op, transposition included, is
    resolvable with one deletion per side). Scoring then runs per metric
    on only the collected candidates:

    - ``metric="jaro_winkler"``: returns (id_a, id_b, sim) with sim >=
      min_sim, sim rounded to 6 dp. NOTE this is a *blocked* scorer —
      pairs farther than block_dist edits apart are out of scope by
      contract (a complete JW-threshold join has no pigeonhole filter).
    - ``metric="damerau"``: returns (id_a, id_b, dist) with unrestricted
      Damerau-Levenshtein dist <= max_dist (default block_dist) — this
      one IS exact/complete, like edit_distance_pairs.
    """
    if metric not in ("jaro_winkler", "damerau"):
        raise ValueError(f"unknown metric {metric!r}")
    pairs, strings = _ed_candidates(ds, text_col, id_col, block_dist,
                                    max_len, "string_similarity_pairs")
    if metric == "damerau":
        lim = block_dist if max_dist is None else min(max_dist, block_dist)
        rows = [(a, b, damerau_levenshtein_bytes(strings[a], strings[b]))
                for a, b in pairs]
        rows = [(a, b, d) for a, b, d in rows if d <= lim]
        return pd.DataFrame({
            "id_a": pd.Series([r[0] for r in rows], dtype="int64"),
            "id_b": pd.Series([r[1] for r in rows], dtype="int64"),
            "dist": pd.Series([r[2] for r in rows], dtype="int64")})
    # Deletion-hash collisions are a SUPERSET of the <=block_dist window;
    # verify the window exactly (like edit_distance_pairs) so the output
    # is precisely {pairs : lev <= block_dist and JW >= min_sim}.
    if pairs:
        a_s = [strings[a] for a, _ in pairs]
        b_s = [strings[b] for _, b in pairs]
        lev = levenshtein_many(a_s, b_s)
        pairs = [p for p, d in zip(pairs, lev) if d <= block_dist]
    rows = [(a, b, jaro_winkler_bytes(strings[a], strings[b]))
            for a, b in pairs]
    # threshold on the UNROUNDED value (oracle parity), round for output
    rows = [(a, b, round(s, 6)) for a, b, s in rows if s >= min_sim]
    return pd.DataFrame({
        "id_a": pd.Series([r[0] for r in rows], dtype="int64"),
        "id_b": pd.Series([r[1] for r in rows], dtype="int64"),
        "sim": pd.Series([r[2] for r in rows], dtype="float64")})


def winnowing_fingerprints(ds, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 8,
                           w: int = 4):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken
    2003, the MOSS algorithm): from every document's character-k-gram
    rolling-hash sequence, select the MINIMUM hash of each length-``w``
    window (rightmost on ties) — guaranteeing every shared substring
    of length >= k+w-1 shares a fingerprint, with ~2/(w+1) selection
    density. The copy-detection fingerprint robust to edits that
    full-shingle MinHash averages away.

    Scale shape: per block, ONE vectorized pass — the flat k-gram hash
    array (``kgram_hashes``), w shifted-slice ``minimum`` folds for
    window minima, a rightmost-min argmax trick, doc-boundary masking,
    then per-(doc, hash) dedup; only distinct (id, fingerprint) rows
    leave the block. Returns a Dataset (id, fp uint64->int64)."""
    from .textstats import kgram_hashes

    def partial(batch: pa.Table) -> pa.Table:
        h, row = kgram_hashes(batch.column(text_col).combine_chunks()
                              if isinstance(batch.column(text_col),
                                            pa.ChunkedArray)
                              else batch.column(text_col), k=k)
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if h.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "fp": pa.array([], pa.int64())})
        n = h.size
        if n < w:
            # short-block tail: one fingerprint PER DOC (rightmost min
            # per distinct row) — a block whose combined k-gram count
            # is < w can still hold several short docs, and each needs
            # its own fingerprint (same per-doc rule as the short tail
            # of the n >= w branch)
            sel_list = []
            for r in np.unique(row):               # short tail only
                idx = np.flatnonzero(row == r)
                sub = h[idx]
                sel_list.append(
                    idx[len(sub) - 1 - int(np.argmin(sub[::-1]))])
            sel_pos = np.asarray(sel_list, np.int64)
            sel_row = row[sel_pos]
        else:
            # window minima over w shifted slices (vectorized in w)
            m = h[: n - w + 1].copy()
            for j in range(1, w):
                np.minimum(m, h[j: n - w + 1 + j], out=m)
            # rightmost position attaining the window min
            pos = np.zeros(n - w + 1, np.int64)
            for j in range(w):                     # loop over w, not rows
                cand = h[j: n - w + 1 + j] == m
                pos = np.where(cand, j, pos)       # later j overwrites
            sel_pos = np.arange(n - w + 1) + pos
            # windows crossing doc boundaries are invalid
            ok = row[: n - w + 1] == row[w - 1:]
            sel_pos, m = sel_pos[ok], m[ok]
            sel_row = row[sel_pos]
            # docs shorter than w windows still need one fingerprint
            short = np.setdiff1d(np.unique(row), np.unique(sel_row))
            if short.size:
                extra_pos, extra_row = [], []
                for r in short:                    # rare tail only
                    idx = np.flatnonzero(row == r)
                    sub = h[idx]
                    p = idx[len(sub) - 1 - int(np.argmin(sub[::-1]))]
                    extra_pos.append(p)
                    extra_row.append(r)
                sel_pos = np.concatenate([sel_pos, extra_pos])
                sel_row = np.concatenate([sel_row, extra_row])
        fp = h[sel_pos]
        df = pd.DataFrame({id_col: ids[sel_row],
                           "fp": fp.astype(np.int64)}) \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    return ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)


def winnowing_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 8, w: int = 4, min_shared: int = 2,
                    max_docs_per_fp: int = 1000) -> pd.DataFrame:
    """Copy-candidate pairs via shared winnowing fingerprints: docs
    sharing >= ``min_shared`` selected fingerprints — the MOSS match
    report. One keyed shuffle co-locates each fingerprint's doc list
    (capped loud at ``max_docs_per_fp`` — a boilerplate fingerprint
    shared by everything would emit C(n,2) pairs), pairs fold through
    a count merge. Returns (a, b, n_shared) sorted, a < b."""
    import pandas as pd

    from ..tuning import shuffle_partitions

    fps = winnowing_fingerprints(ds, text_col, id_col, k=k, w=w)

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column("__gkey",
                               pc.cast(t.column("fp"), pa.string()))

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs_a, outs_b = [], []
        for fp, sub in df.groupby("fp", sort=False):
            ids = np.sort(sub[id_col].unique())
            if ids.size > max_docs_per_fp:
                raise ValueError(
                    f"winnowing_pairs: fingerprint {fp} appears in "
                    f"{ids.size} docs (> {max_docs_per_fp}) — strip "
                    f"boilerplate upstream")
            if ids.size < 2:
                continue
            ia, ib = np.triu_indices(ids.size, 1)
            outs_a.append(ids[ia])
            outs_b.append(ids[ib])
        if not outs_a:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"a": np.concatenate(outs_a),
                             "b": np.concatenate(outs_b)})

    from .grouped import _bucketed_merge, _bucketed_merge_ds

    pairs = _bucketed_merge_ds(
        fps.map_batches(add_key, batch_format="pyarrow",
                        batch_size=None), emit_pairs)

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["a", "b"]).aggregate([([], "count_all")])
        out = pa.table({"a": g.column("a"), "b": g.column("b"),
                        "n": g.column("count_all").cast(pa.int64())})
        key = pc.binary_join_element_wise(
            pc.cast(out.column("a"), pa.string()),
            pc.cast(out.column("b"), pa.string()), "\x1f")
        return out.append_column("__gkey", key)

    def merge_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["a", "b"], as_index=False)["n"].sum()
        return out[out["n"] >= min_shared]

    out = _bucketed_merge(
        pairs.map_batches(count_partial, batch_format="pyarrow",
                          batch_size=None), merge_counts)
    if out.empty:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64),
                             "n_shared": pd.Series([], dtype=np.int64)})
    out = out.rename(columns={"n": "n_shared"})
    out["n_shared"] = out["n_shared"].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)
