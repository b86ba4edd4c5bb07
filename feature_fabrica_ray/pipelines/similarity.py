"""Approximate-nearest-neighbor search over an embedding column.

- ``cosine_topk``: brute-force baseline — the query matrix is normalized
  once, broadcast via ``ray.put``, and every block computes a numpy
  matmul + per-block top-k; the driver merges tiny per-block partials.
  Exact, embarrassingly parallel, zero shuffle.
- ``ivf_topk``: the scale path — k-means centroids fit once on a sample
  (driver-side, deterministic), every vector assigned to its nearest
  centroid in one map pass; queries probe only the ``nprobe`` closest
  centroid lists, so each block does a masked matmul over the probed
  subset. Recall<1 by construction; pytest asserts recall against the
  brute-force baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["cosine_topk", "ivf_topk", "lsh_topk", "fit_centroids",
           "fit_sample", "knn_graph", "knn_graph_sharded",
           "radius_search",
           "label_centroids", "silhouette_simplified", "davies_bouldin",
           "random_projection",
           "quantize_embeddings", "semantic_dedup_ids", "product_quantize", "mmr_topk", "ivfpq_topk",
           "normalize_embeddings", "fit_pca", "pca_project",
           "kmeans", "kmeans_assign"]


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


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def fit_sample(ds, n: int, vec_col: str, id_col: str | None = None,
               seed: int = 0) -> pd.DataFrame:
    """Deterministic, LAYOUT-INDEPENDENT ~n-row fit sample.

    ``limit(n)`` returns the FIRST n rows — on a table sorted by the
    cluster key (repo, lang, label) that is a biased sample and a
    centroid/PCA fit silently misses whole regions of the corpus. Here
    every row gets a deterministic content hash (of ``id_col`` when
    given, else of the raw vector bytes), rows under a hash threshold
    survive ONE streaming filter pass, and the driver trims to exactly
    ``n`` in hash order — unbiased under any sort order, identical
    across layouts and runs. Cost: one count + one filtered scan
    (~2n rows reach the driver); the threshold doubles and rescans in
    the astronomically-unlikely binomial under-fill case."""
    from ..state import combine_hashes, hash64

    cnt = ds.count()
    if cnt is None or cnt <= n:
        out = ds.to_pandas()
        return out.assign(__h=_row_hashes(out, vec_col, id_col, seed)) \
            .sort_values("__h", kind="mergesort") \
            .drop(columns="__h").reset_index(drop=True)

    def row_hash_batch(batch: pa.Table) -> np.ndarray:
        if id_col is not None:
            return hash64(batch.column(id_col), seed=seed)
        V = np.ascontiguousarray(_vectors(batch, vec_col))
        if V.size == 0:
            return np.zeros(len(batch), np.uint64)
        u = V.view(np.uint64)
        return combine_hashes(*(u[:, j] for j in range(u.shape[1])))

    D = np.uint64(0xFFFFFFFFFFFFFFFF)
    frac = min(1.0, 2.0 * n / cnt)
    while True:
        thr = np.uint64(int(frac * float(D)))

        def keep(batch: pa.Table, t=thr) -> pa.Table:
            h = row_hash_batch(batch)
            return batch.filter(pa.array(h < t))

        samp = ds.map_batches(keep, batch_format="pyarrow",
                              batch_size=None).to_pandas()
        if len(samp) >= n or frac >= 1.0:
            break
        frac = min(1.0, frac * 2)
    samp = samp.assign(__h=_row_hashes(samp, vec_col, id_col, seed)) \
        .sort_values("__h", kind="mergesort").head(n) \
        .drop(columns="__h").reset_index(drop=True)
    return samp


def _row_hashes(df: pd.DataFrame, vec_col: str, id_col: str | None,
                seed: int) -> np.ndarray:
    from ..state import combine_hashes, hash64

    if id_col is not None:
        return hash64(df[id_col].to_numpy(), seed=seed)
    if not len(df):
        return np.zeros(0, np.uint64)
    V = np.ascontiguousarray(
        np.asarray([np.asarray(v, np.float64) for v in df[vec_col]]))
    u = V.view(np.uint64)
    return combine_hashes(*(u[:, j] for j in range(u.shape[1])))


def _merge_topk(parts: pd.DataFrame, k: int) -> pd.DataFrame:
    """Merge per-block partial top-k lists into the global top-k per query.
    Deterministic tie-break: higher score first, then lower vec_id."""
    parts = parts.sort_values(["query_id", "score", "vec_id"],
                              ascending=[True, False, True], kind="mergesort")
    out = parts.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "vec_id", "score", "rank"]]


def cosine_topk(ds, queries: np.ndarray, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> pd.DataFrame:
    """Exact cosine top-k of each query row against the dataset.

    Returns (query_id, vec_id, score, rank) — scores rounded to 6 for
    cross-engine comparison stability."""
    import ray

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(Q)  # broadcast once, read per task — never re-shipped per batch

    def block_topk(batch: pa.Table) -> pa.Table:
        Qn = ray.get(q_ref)
        V = _vectors(batch, vec_col)
        if V.shape[0] == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        S = Qn @ _normalize(V).T                     # (q, n_block)
        kk = min(k, S.shape[1])
        top = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
        qid = np.repeat(np.arange(S.shape[0], dtype=np.int64), kk)
        vid = ids[top.ravel()]
        sc = np.take_along_axis(S, top, axis=1).ravel()
        return pa.table({"query_id": pa.array(qid, pa.int64()),
                         "vec_id": pa.array(vid, pa.int64()),
                         "score": pa.array(np.round(sc, 6), pa.float64())})

    parts = ds.map_batches(block_topk, batch_format="pyarrow", batch_size=None).to_pandas()
    return _merge_topk(parts, k)


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------

def fit_centroids(ds, nlist: int = 16, vec_col: str = "embedding",
                  sample_rows: int = 4096, iters: int = 10) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (kmeans++-lite
    seeding by striding the sample). Centroids are KB-sized — broadcast
    state, never a shuffle. The sample is the layout-independent
    ``fit_sample`` hash draw, not ``limit()`` — first-N rows of a table
    sorted by the cluster key would be a biased fit input."""
    sample = fit_sample(ds, sample_rows, vec_col)
    X = _normalize(np.asarray([np.asarray(v, dtype=np.float64) for v in sample[vec_col]]))
    idx = np.linspace(0, len(X) - 1, nlist).astype(np.int64)
    C = X[idx].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(nlist):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
        C = _normalize(C)
    return C


def ivf_topk(ds, queries: np.ndarray, k: int = 10, nlist: int = 16,
             nprobe: int = 6, vec_col: str = "embedding",
             id_col: str = "vec_id", centroids: np.ndarray | None = None) -> pd.DataFrame:
    """IVF-style ANN: probe only the ``nprobe`` nearest centroid lists per
    query. Same output schema as cosine_topk."""
    import ray

    C = fit_centroids(ds, nlist=nlist, vec_col=vec_col) if centroids is None else centroids
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]          # (q, nprobe)
    # mask[q, c] = query q probes centroid c
    mask = np.zeros((Q.shape[0], C.shape[0]), dtype=bool)
    np.put_along_axis(mask, probe, True, axis=1)
    state = ray.put((Q, C, mask))

    def block_topk(batch: pa.Table) -> pa.Table:
        Qn, Cn, probe_mask = ray.get(state)
        V = _vectors(batch, vec_col)
        if V.shape[0] == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        Vn = _normalize(V)
        cid = (Vn @ Cn.T).argmax(axis=1)                        # assignment pass
        S = Qn @ Vn.T                                           # (q, n)
        allowed = probe_mask[:, cid]                            # (q, n)
        S = np.where(allowed, S, -np.inf)
        kk = min(k, S.shape[1])
        top = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
        sc = np.take_along_axis(S, top, axis=1)
        qid = np.repeat(np.arange(S.shape[0], dtype=np.int64), kk)
        vid = ids[top.ravel()]
        flat_sc = sc.ravel()
        keep = np.isfinite(flat_sc)
        return pa.table({"query_id": pa.array(qid[keep], pa.int64()),
                         "vec_id": pa.array(vid[keep], pa.int64()),
                         "score": pa.array(np.round(flat_sc[keep], 6), pa.float64())})

    parts = ds.map_batches(block_topk, batch_format="pyarrow", batch_size=None).to_pandas()
    return _merge_topk(parts, k)


def normalize_embeddings(ds, vec_col: str = "embedding",
                         out_col: str | None = None):
    """L2-normalize an embedding column (stateless map; unit-norm
    vectors make cosine = dot product downstream)."""
    out_col = out_col or vec_col

    def fn(batch: pa.Table) -> pa.Table:
        V = _normalize(_vectors(batch, vec_col))
        arr = pa.array(list(map(list, V)), pa.list_(pa.float64()))
        if out_col in batch.column_names:
            return batch.set_column(batch.column_names.index(out_col),
                                    out_col, arr)
        return batch.append_column(out_col, arr)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def fit_pca(ds, n_components: int, vec_col: str = "embedding",
            sample_size: int = 4096) -> dict:
    """Fit a PCA basis on a deterministic layout-independent sample
    (driver-side numpy SVD — the components are KB-sized broadcast
    state, same pattern as fit_centroids). Returns {"mean": (d,),
    "components": (k, d)}."""
    sample = fit_sample(ds, sample_size, vec_col)
    M = np.asarray([np.asarray(v, np.float64) for v in sample[vec_col]])
    mean = M.mean(axis=0)
    _, _, vt = np.linalg.svd(M - mean, full_matrices=False)
    # deterministic sign: largest-|.| coordinate of each component >= 0
    comp = vt[:n_components]
    signs = np.sign(comp[np.arange(len(comp)),
                         np.abs(comp).argmax(axis=1)])
    return {"mean": mean, "components": comp * signs[:, None]}


def pca_project(ds, basis: dict, vec_col: str = "embedding",
                out_col: str = "embedding_pca"):
    """Project embeddings onto a fitted PCA basis — broadcast the
    KB-sized basis via ``ray.put``, one matmul per block (the standard
    dimensionality-reduction stage before ANN at scale)."""
    import ray

    ref = ray.put((np.asarray(basis["mean"], np.float64),
                   np.asarray(basis["components"], np.float64)))

    def fn(batch: pa.Table) -> pa.Table:
        mean, comp = ray.get(ref)
        V = _vectors(batch, vec_col)
        P = (V - mean) @ comp.T
        arr = pa.array(list(map(list, P)), pa.list_(pa.float64()))
        return batch.append_column(out_col, arr)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# distributed k-means (full-corpus Lloyd's)
# ---------------------------------------------------------------------------

def kmeans(ds, k: int = 8, iters: int = 10, vec_col: str = "embedding",
           init: np.ndarray | None = None, tol: float = 1e-6):
    """Full-dataset Lloyd's k-means (Euclidean), the distributed form:
    per iteration the centroid matrix (k x d, KB-sized) is broadcast via
    ``ray.put``; each block assigns its vectors with one matmul and emits
    ONLY per-centroid partial (count, sum-vector, inertia) rows — k rows
    per block, never raw vectors — and the driver merge + update is a
    k x d reduction. Unlike ``fit_centroids`` (sample-based seeding for
    IVF), every row of the corpus contributes to every iteration.

    Returns (centroids (k, d) float64, sizes (k,) int64, inertia float).
    Deterministic: init defaults to evenly-strided rows of the first
    block, ties in assignment go to the lower centroid id (argmin).
    """
    import ray

    # materialize the vector projection ONCE: every iteration streams
    # over it, and a lazy input would re-execute the whole upstream
    # pipeline (parquet read included) per iteration — same pattern as
    # graph.pagerank's edge projection; lives in the object store
    ds = ds.map_batches(lambda t, c=vec_col: t.select([c]),
                        batch_format="pyarrow", batch_size=None) \
        .materialize()

    if init is None:
        # layout-independent seed sample (the materialized projection
        # makes the count free), then deterministic farthest-point
        # seeding (Gonzalez k-center): maximally-spread seeds avoid the
        # two-seeds-in-one-blob local minimum a strided pick risks
        head = fit_sample(ds, max(k * 4, k), vec_col)
        X0 = np.asarray([np.asarray(v, np.float64) for v in head[vec_col]])
        picks = [0]
        dist = np.linalg.norm(X0 - X0[0], axis=1)
        for _ in range(1, min(k, len(X0))):
            j = int(dist.argmax())
            picks.append(j)
            dist = np.minimum(dist, np.linalg.norm(X0 - X0[j], axis=1))
        C = X0[picks].copy()
        if len(C) < k:          # fewer sample rows than k: pad by repeat
            C = np.vstack([C, C[np.arange(k - len(C)) % len(C)]])
    else:
        C = np.asarray(init, np.float64).copy()
    d = C.shape[1]
    sizes = np.zeros(k, np.int64)
    inertia = float("inf")

    for _ in range(iters):
        ref = ray.put(C)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            Cc = ray.get(_ref)
            X = _vectors(batch, vec_col)
            if X.size == 0:
                return pa.table({"cid": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64()),
                                 "inert": pa.array([], pa.float64()),
                                 "vsum": pa.array([], pa.list_(pa.float64()))})
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
            dots = X @ Cc.T
            dist = (X * X).sum(1, keepdims=True) - 2.0 * dots \
                + (Cc * Cc).sum(1)
            a = dist.argmin(axis=1)
            cnt = np.bincount(a, minlength=len(Cc)).astype(np.int64)
            inert = np.bincount(a, weights=dist[np.arange(len(a)), a],
                                minlength=len(Cc))
            sums = np.zeros_like(Cc)
            np.add.at(sums, a, X)
            return pa.table({
                "cid": pa.array(np.arange(len(Cc), dtype=np.int64)),
                "cnt": pa.array(cnt),
                "inert": pa.array(np.maximum(inert, 0.0), pa.float64()),
                "vsum": pa.array([r.tolist() for r in sums],
                                 pa.list_(pa.float64())),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=None).to_pandas()
        cnt = np.zeros(k, np.int64)
        s = np.zeros((k, d), np.float64)
        np.add.at(cnt, parts["cid"].to_numpy(), parts["cnt"].to_numpy())
        np.add.at(s, parts["cid"].to_numpy(),
                  np.asarray([np.asarray(v) for v in parts["vsum"]]))
        new_inertia = float(parts["inert"].sum())
        nonempty = cnt > 0
        C_new = C.copy()
        C_new[nonempty] = s[nonempty] / cnt[nonempty, None]
        sizes = cnt
        moved = float(np.abs(C_new - C).max())
        C = C_new
        if inertia - new_inertia < tol and moved < tol:
            inertia = new_inertia
            break
        inertia = new_inertia

    return C, sizes, inertia


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding",
                  out_col: str = "cluster"):
    """Label every row with its nearest (Euclidean) centroid id — a
    stateless broadcast map; centroids ship once via ``ray.put``."""
    import ray

    ref = ray.put(np.asarray(centroids, np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        Cc = ray.get(ref)
        X = _vectors(batch, vec_col)
        if X.size == 0:
            a = np.zeros(batch.num_rows, np.int64)
        else:
            dist = (X * X).sum(1, keepdims=True) - 2.0 * (X @ Cc.T) \
                + (Cc * Cc).sum(1)
            a = dist.argmin(axis=1).astype(np.int64)
        return batch.append_column(out_col, pa.array(a, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def quantize_embeddings(ds, vec_col: str = "embedding",
                        id_col: str = "vec_id", bits: int = 8):
    """Per-dimension min-max int quantization of an embedding column —
    the standard vector-store compression step (float32 -> uint8 cuts
    index storage 4x before ANN indexing).

    Scale shape: two passes. Pass 1 fits the per-dimension (lo, hi)
    range with the combiner pattern — each block reduces to ONE
    (2, d) partial, the driver folds the tiny per-block partials (d
    floats each, independent of row count). Pass 2 is a stateless map
    emitting long-form (id, dim, q) rows with
    ``q = round((x - lo) / (hi - lo) * (2**bits - 1))`` clamped to the
    code range; constant dimensions (hi == lo) quantize to 0.
    Arithmetic is float64 on both engines so results are
    bit-reproducible against a SQL oracle."""
    import ray

    levels = float(2 ** bits - 1)

    def rng_partial(batch: pa.Table) -> pa.Table:
        M = _vectors(batch, vec_col)
        if M.size == 0:
            return pa.table({"lo": pa.array([], pa.list_(pa.float64())),
                             "hi": pa.array([], pa.list_(pa.float64()))})
        return pa.table({"lo": pa.array([M.min(axis=0).tolist()]),
                         "hi": pa.array([M.max(axis=0).tolist()])})

    parts = ds.map_batches(rng_partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if not len(parts):
        return ds.map_batches(
            lambda b: pa.table({id_col: pa.array([], pa.int64()),
                                "dim": pa.array([], pa.int64()),
                                "q": pa.array([], pa.int64())}),
            batch_format="pyarrow", batch_size=None)
    lo = np.min(np.stack(parts["lo"].to_numpy()), axis=0)
    hi = np.max(np.stack(parts["hi"].to_numpy()), axis=0)
    scale = np.where(hi > lo, hi - lo, 1.0)
    const = hi == lo
    ref = ray.put((lo, scale, const))

    def quant(batch: pa.Table) -> pa.Table:
        lo, scale, const = ray.get(ref)
        M = _vectors(batch, vec_col)
        n, d = M.shape if M.size else (0, lo.size)
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64())})
        q = np.floor((M - lo) / scale * levels + 0.5)
        q = np.clip(q, 0.0, levels)
        q[:, const] = 0.0
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(np.repeat(ids, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            "q": pa.array(q.reshape(-1).astype(np.int64), pa.int64()),
        })

    return ds.map_batches(quant, batch_format="pyarrow", batch_size=None)


def lsh_topk(ds, queries: np.ndarray, k: int = 10, n_planes: int = 4,
             n_tables: int = 16, seed: int = 7,
             vec_col: str = "embedding",
             id_col: str = "vec_id") -> pd.DataFrame:
    """LSH-bucketed approximate cosine top-k — the third ANN path
    beside the brute-force baseline (``cosine_topk``) and IVF: random-
    hyperplane signatures bucket the vectors, each query scores ONLY
    the vectors sharing its bucket in at least one of ``n_tables``
    hash tables, then exact-reranks the candidates.

    Scale shape: identical to the baseline — query matrix, plane
    tensor and query bucket codes broadcast once via ``ray.put``; each
    block computes its vectors' codes (one matmul per table), masks
    candidates per query, exact-scores the survivors, and emits a
    k-sized partial; the driver merges partials. Zero shuffle, and the
    expensive full matmul shrinks to the candidate fraction. Recall<1
    by construction (pytest asserts recall vs the exact baseline);
    more planes = fewer candidates but lower recall, more tables =
    higher recall at one extra matmul each (defaults measure ~0.9
    recall@10 on the synthetic embeddings)."""
    import ray

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    d = Q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, n_planes, d))
    pow2 = (1 << np.arange(n_planes)).astype(np.uint64)
    qcodes = np.stack([((Q @ planes[t].T) > 0) @ pow2
                       for t in range(n_tables)])        # (tables, n_q)
    ref = ray.put((Q, planes, qcodes))

    def block_topk(batch: pa.Table) -> pa.Table:
        Qn, planes, qcodes = ray.get(ref)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        V = _vectors(batch, vec_col)
        if V.shape[0] == 0:
            return empty
        Vn = _normalize(V)
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        # (tables, n_block) bucket codes: one matmul per table
        vcodes = np.stack([((Vn @ planes[t].T) > 0) @ pow2
                           for t in range(planes.shape[0])])
        # candidate mask (n_q, n_block): same bucket in ANY table
        cand = (qcodes[:, :, None] == vcodes[:, None, :]).any(axis=0)
        out_q, out_v, out_s = [], [], []
        for qi in np.flatnonzero(cand.any(axis=1)):
            sel = np.flatnonzero(cand[qi])
            s = Vn[sel] @ Qn[qi]
            kk = min(k, s.size)
            top = np.argpartition(-s, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, np.int64))
            out_v.append(ids[sel[top]])
            out_s.append(np.round(s[top], 6))
        if not out_q:
            return empty
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "score": pa.array(np.concatenate(out_s), pa.float64())})

    parts = ds.map_batches(block_topk, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    return _merge_topk(parts, k)


def semantic_dedup_ids(ds, vec_col: str = "embedding",
                       id_col: str = "vec_id", k: int = 16,
                       threshold: float = 0.95,
                       iters: int = 10) -> pd.DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster the embeddings with k-means, then WITHIN each cluster drop
    every vector whose cosine similarity to an already-kept vector
    (smaller id wins — deterministic) reaches ``threshold``. Catches
    paraphrase-level duplicates that exact/MinHash text dedup misses,
    at a fraction of all-pairs cost: only same-cluster pairs are ever
    scored. Near-dups land in the same cluster w.h.p. because they are
    near-identical points. Returns (id, keep) for every row.

    Scale shape: the k-means fit is sample-based with KB-sized
    broadcast centroids; assignment is a stateless broadcast map; the
    per-cluster greedy pass is ONE keyed shuffle of (id, vector) and
    O(c²) similarity work bounded by cluster size — size k to the
    corpus (n/k docs per cluster) and split oversized clusters by
    re-clustering if a modality collapses into one cluster."""
    C = fit_centroids(ds, nlist=k, vec_col=vec_col, iters=iters)
    labeled = kmeans_assign(ds, C, vec_col=vec_col, out_col="__cl")

    def per_cluster(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort")
        M = np.asarray([np.asarray(v, dtype=np.float64)
                        for v in df[vec_col]])
        if M.ndim != 2 or not len(df):
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "keep": pd.Series([], dtype=bool)})
        Mn = _normalize(M)
        S = Mn @ Mn.T
        n = len(df)
        keep = np.ones(n, bool)
        for i in range(n):          # greedy over ids ascending
            if not keep[i]:
                continue
            keep[(S[i] >= threshold) & (np.arange(n) > i)] = False
        return pd.DataFrame({id_col: df[id_col].to_numpy(np.int64),
                             "keep": keep})

    out = (labeled.groupby("__cl", num_partitions=min(k, 64))
           .map_groups(per_cluster, batch_format="pandas")
           .to_pandas())
    if out.empty:
        out = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                            "keep": pd.Series([], dtype=bool)})
    return out.sort_values(id_col).reset_index(drop=True)


def random_projection(ds, out_dim: int, vec_col: str = "embedding",
                      seed: int = 7, out_col: str = "proj"):
    """Johnson-Lindenstrauss random projection: multiply every vector
    by one shared Gaussian matrix ``R / sqrt(out_dim)`` — the cheap
    dimensionality reduction that preserves pairwise distances within
    ``(1 ± eps)`` w.h.p. (the JL lemma), used to shrink embeddings
    before LSH/clustering when PCA's extra pass is not worth it.

    Scale shape: the projection matrix is seeded and rebuilt inside
    each task from plan-time constants (d x out_dim floats — KBs; no
    per-batch reshipping of data, deterministic across layouts), and
    each block is ONE matmul — stateless map, no shuffle, streams at
    any scale. Appends ``out_col`` as list<float64>."""
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")

    def fn(batch: pa.Table) -> pa.Table:
        M = _vectors(batch, vec_col)
        rng = np.random.default_rng(seed)
        R = rng.standard_normal((M.shape[1], out_dim)) / np.sqrt(out_dim)
        proj = M.astype(np.float64) @ R
        lst = pa.FixedSizeListArray.from_arrays(
            pa.array(proj.reshape(-1)), out_dim).cast(
                pa.list_(pa.float64()))
        return batch.append_column(out_col, lst)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def radius_search(ds, queries: np.ndarray, query_ids: np.ndarray | list,
                  threshold: float, vec_col: str = "embedding",
                  id_col: str = "vec_id", round_to: int = 6):
    """Cosine RADIUS search (range query): every (query, corpus row)
    pair with cosine similarity >= ``threshold`` — the fixed-radius
    companion to ``cosine_topk``'s fixed-k, used for near-duplicate
    candidate pull and semantic retrieval with a quality floor instead
    of a count cap.

    Scale shape: the normalized query matrix is broadcast ONCE via
    ``ray.put`` and every block is one matmul + one boolean mask —
    stateless map, zero shuffle, and (unlike top-k) nothing merges on
    the driver: the result STAYS a Dataset, so a fat radius at corpus
    scale streams straight to the sink. The threshold is applied to the
    score rounded to ``round_to`` decimals so the kept set is stable
    across engines whose raw float64 cosines differ in the last ulps
    (same rounding contract as ``cosine_topk``).

    Returns a Dataset of (query_id, vec_id, score)."""
    import ray

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    if Q.shape[0] != qids.shape[0]:
        raise ValueError("radius_search: queries and query_ids must "
                         f"align, got {Q.shape[0]} vs {qids.shape[0]}")
    q_ref = ray.put((Q, qids))   # broadcast once, read per task

    def block_radius(batch: pa.Table) -> pa.Table:
        Qn, ids_q = ray.get(q_ref)
        V = _vectors(batch, vec_col)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if V.shape[0] == 0 or Qn.shape[0] == 0:
            return empty
        ids_v = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        S = np.round(Qn @ _normalize(V).T, round_to)   # (q, n_block)
        qi, vi = np.nonzero(S >= threshold)
        if qi.size == 0:
            return empty
        return pa.table({"query_id": pa.array(ids_q[qi], pa.int64()),
                         "vec_id": pa.array(ids_v[vi], pa.int64()),
                         "score": pa.array(S[qi, vi], pa.float64())})

    return ds.map_batches(block_radius, batch_format="pyarrow",
                          batch_size=None)


def knn_graph(ds, k: int = 10, vec_col: str = "embedding",
              id_col: str = "vec_id", *,
              max_broadcast_rows: int = 2_000_000):
    """Exact cosine k-NN GRAPH: top-k neighbors for EVERY row (the
    all-rows generalization of ``cosine_topk``'s fixed query set) —
    the input to graph-based semantic dedup, kNN classifiers and
    diversity-aware sampling.

    Scale shape: the normalized corpus matrix + ids are broadcast ONCE
    via ``ray.put`` (read per task from the object store, never
    re-shipped per batch); each block then does one matmul against the
    broadcast and keeps only its k-sized partials — zero shuffle, and
    the O(n^2) similarity matrix never materializes (only n*k rows
    total leave the tasks). The broadcast side is the whole corpus, so
    this is the exact path for corpora that fit a worker heap
    (``max_broadcast_rows`` guard, default 2M x d); beyond that the
    call AUTO-DISPATCHES to ``knn_graph_sharded`` — the IVF
    composition (``fit_centroids`` + per-bucket exact knn), same
    output contract with approximate recall (the ``pagerank`` →
    ``pagerank_sharded`` pattern, graph.py:398).

    Returns (src_id, nbr_id, score, rank) with scores rounded to 6 and
    rank 1..k per src ordered by (score desc, nbr_id)."""
    import ray

    # count BEFORE collecting: the size dispatch must not pull an
    # over-guard corpus onto the driver just to discover it is too big
    # (parquet sources answer count() from metadata)
    n_total = ds.count()
    if n_total is not None and n_total > max_broadcast_rows:
        import warnings
        warnings.warn(
            f"knn_graph: corpus has {n_total} rows > max_broadcast_rows"
            f"={max_broadcast_rows}; dispatching to the APPROXIMATE "
            f"IVF-sharded path (knn_graph_sharded) — recall is no "
            f"longer exact. Raise max_broadcast_rows to keep the exact "
            f"contract, or call knn_graph_sharded directly to silence.",
            RuntimeWarning, stacklevel=2)
        return knn_graph_sharded(ds, k=k, vec_col=vec_col,
                                 id_col=id_col).to_pandas() \
            .sort_values(["src_id", "rank"], kind="mergesort") \
            .reset_index(drop=True)

    def extract(batch: pa.Table) -> pa.Table:
        V = _vectors(batch, vec_col)
        ids = batch.column(id_col).cast(pa.int64())
        return pa.table({id_col: ids,
                         "vec": pa.array([r.tolist() for r in _normalize(V)]
                                         if V.size else [],
                                         pa.list_(pa.float64()))})

    corpus = ds.map_batches(extract, batch_format="pyarrow",
                            batch_size=None).take_all()
    n = len(corpus)
    if n == 0:
        return pd.DataFrame({"src_id": pd.Series([], dtype="int64"),
                             "nbr_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64"),
                             "rank": pd.Series([], dtype="int64")})
    ids = np.asarray([r[id_col] for r in corpus], dtype=np.int64)
    C = np.asarray([r["vec"] for r in corpus], dtype=np.float64)
    order = np.argsort(ids, kind="stable")   # id-ascending columns make the
    ids, C = ids[order], C[order]            # stable argsort tie-break = id
    ref = ray.put((ids, C))

    def block_knn(batch: pa.Table) -> pa.Table:
        cids, Cn = ray.get(ref)
        V = _vectors(batch, vec_col)
        if V.shape[0] == 0:
            return pa.table({"src_id": pa.array([], pa.int64()),
                             "nbr_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        bids = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        S = np.round(_normalize(V) @ Cn.T, 6)         # (n_block, n)
        S[bids[:, None] == cids[None, :]] = -np.inf   # mask self-match
        kk = min(k, S.shape[1] - 1)
        if kk <= 0:
            return pa.table({"src_id": pa.array([], pa.int64()),
                             "nbr_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        # stable argsort on the ROUNDED scores + id-ascending columns =
        # exact deterministic (score desc, nbr_id) selection even when
        # duplicates tie at the k boundary (argpartition would pick
        # arbitrarily); swap in argpartition-with-margin if the full
        # per-row sort ever dominates the matmul at huge corpus sizes
        top = np.argsort(-S, axis=1, kind="stable")[:, :kk]
        src = np.repeat(bids, kk)
        nbr = cids[top.ravel()]
        sc = np.take_along_axis(S, top, axis=1).ravel()
        return pa.table({"src_id": pa.array(src, pa.int64()),
                         "nbr_id": pa.array(nbr, pa.int64()),
                         "score": pa.array(sc, pa.float64())})

    parts = ds.map_batches(block_knn, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    parts = parts.sort_values(["src_id", "score", "nbr_id"],
                              ascending=[True, False, True],
                              kind="mergesort")
    out = parts.groupby("src_id", as_index=False).head(k) \
        .reset_index(drop=True)
    out["rank"] = (out.groupby("src_id").cumcount() + 1).astype("int64")
    return out[["src_id", "nbr_id", "score", "rank"]]


def knn_graph_sharded(ds, k: int = 10, vec_col: str = "embedding",
                      id_col: str = "vec_id", *, nlist: int = 32,
                      nprobe: int = 4,
                      centroids: np.ndarray | None = None):
    """IVF-bucketed cosine k-NN graph — the past-the-broadcast-guard
    path ``knn_graph`` auto-dispatches to (the ``pagerank_sharded``
    pattern): no per-node state ever lives on the driver and the
    O(n²) similarity matrix never forms.

    Composition: (1) ``fit_centroids`` on a layout-independent sample
    (KB-sized, broadcast via ``ray.put``); (2) one streaming pass
    emits each vector ONCE per role — as a MEMBER of its primary
    centroid bucket and as a QUERY into its ``nprobe`` nearest
    buckets — so the exchange is (1+nprobe)·n rows, linear, never
    all-pairs; (3) a per-bucket ``map_groups`` (``nlist`` Python
    calls, never per row) runs the exact query×member matmul with
    self-match masking and keeps k-sized partials; (4) partials merge
    to the global per-src top-k in a second keyed-bucket stage with
    vectorized pandas rank kernels.

    Partitioning assumption: bucket sizes follow the centroid fit —
    a pathological single-cluster corpus concentrates in one bucket
    (raise ``nlist`` or pre-shard on a metadata key). Recall < 1 by
    construction (a true neighbor outside the probed buckets is
    missed); pytest bounds recall against the exact path.

    Returns a ray Dataset (src_id, nbr_id, score, rank) — scores
    rounded to 6, rank 1..k per src by (score desc, nbr_id), the
    ``knn_graph`` contract — left distributed so web-scale outputs
    can stream to parquet instead of collecting n·k rows."""
    import ray

    from .events import bucketed_by_key

    C = _normalize(np.asarray(
        fit_centroids(ds, nlist=nlist, vec_col=vec_col)
        if centroids is None else centroids, np.float64))
    c_ref = ray.put(C)
    np_probe = min(nprobe, C.shape[0])

    def emit(batch: pa.Table) -> pa.Table:
        Cn = ray.get(c_ref)
        V = _vectors(batch, vec_col)
        if V.shape[0] == 0:
            return pa.table({
                "__bkt": pa.array([], pa.int32()),
                "id": pa.array([], pa.int64()),
                "is_q": pa.array([], pa.int8()),
                "vec": pa.array([], pa.list_(pa.float64()))})
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        Vn = _normalize(V)
        A = Vn @ Cn.T                              # (n, nlist)
        probe = np.argsort(-A, axis=1, kind="stable")[:, :np_probe]
        n, d = Vn.shape
        rep = np.repeat(np.arange(n), np_probe)
        # member rows once (primary bucket = probe[:, 0]), query rows
        # nprobe times — all replication is numpy fancy-indexing, the
        # vec payload stays one flat float64 buffer end to end
        bkt = np.concatenate([probe[:, 0], probe.ravel()]).astype(np.int32)
        rid = np.concatenate([ids, ids[rep]])
        isq = np.concatenate([np.zeros(n, np.int8),
                              np.ones(n * np_probe, np.int8)])
        flat = np.concatenate([Vn, Vn[rep]]).ravel()
        vec = pa.ListArray.from_arrays(
            np.arange(len(rid) + 1, dtype=np.int32) * d,
            pa.array(flat, pa.float64()))
        return pa.table({"__bkt": pa.array(bkt, pa.int32()),
                         "id": pa.array(rid, pa.int64()),
                         "is_q": pa.array(isq, pa.int8()),
                         "vec": vec})

    def per_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({"src_id": pa.array([], pa.int64()),
                          "nbr_id": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        isq = t.column("is_q").to_numpy(zero_copy_only=False)
        M_all = _vectors(t, "vec")
        ids_all = t.column("id").to_numpy(zero_copy_only=False)
        qm, mm = isq == 1, isq == 0
        if not qm.any() or not mm.any():
            return empty
        Q, qid = M_all[qm], ids_all[qm]
        M, mid = M_all[mm], ids_all[mm]
        S = np.round(Q @ M.T, 6)
        S[qid[:, None] == mid[None, :]] = -np.inf   # mask self-match
        kk = min(k, S.shape[1])
        order = np.argsort(mid, kind="stable")      # id-asc tie-break
        S, mid = S[:, order], mid[order]
        top = np.argsort(-S, axis=1, kind="stable")[:, :kk]
        sc = np.take_along_axis(S, top, axis=1).ravel()
        keep = np.isfinite(sc)
        return pa.table({
            "src_id": pa.array(np.repeat(qid, kk)[keep], pa.int64()),
            "nbr_id": pa.array(mid[top.ravel()][keep], pa.int64()),
            "score": pa.array(sc[keep], pa.float64())})

    from ..tuning import shuffle_partitions

    parts = (ds.map_batches(emit, batch_format="pyarrow",
                            batch_size=None)
             .groupby("__bkt", num_partitions=min(shuffle_partitions(),
                                                  int(C.shape[0])))
             .map_groups(per_bucket, batch_format="pyarrow"))

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        # a src's partials arrive from nprobe buckets; duplicates of
        # the same (src, nbr) pair are possible when the nbr is probed
        # via several buckets — keep one, then vectorized global top-k
        df = df.drop_duplicates(["src_id", "nbr_id"]) \
            .sort_values(["src_id", "score", "nbr_id"],
                         ascending=[True, False, True], kind="mergesort")
        out = df.groupby("src_id", sort=False).head(k).copy()
        out["rank"] = (out.groupby("src_id", sort=False).cumcount() + 1) \
            .astype(np.int64)
        return out

    return bucketed_by_key(parts, "src_id", merge_topk)


def product_quantize(ds, vec_col: str = "embedding",
                     id_col: str = "vec_id", m: int = 4, k: int = 16,
                     sample_n: int = 4096, iters: int = 8,
                     seed: int = 0):
    """Product quantization (Jégou et al. 2011): split each vector into
    ``m`` subspaces and k-means-code each independently — m log2(k)
    bits per vector (vs 32 bits/dim), the workhorse compression behind
    billion-scale ANN indexes; finer-grained than the per-dimension
    int8 path (``quantize_embeddings``) at the same budget.

    Fit: one deterministic layout-independent ``fit_sample`` draw fits
    m seeded Lloyd codebooks driver-side (KB-sized state, the
    fit_centroids pattern). Encode: codebooks broadcast once via ``ray.put``; each
    block computes m small distance matmuls and argmins — stateless,
    zero shuffle. Returns (codes_df, codebooks) where codes_df has
    (id, code_0..code_{m-1}, err) with err = per-row reconstruction
    MSE, and codebooks is the (m, k, d/m) float array."""
    import ray

    samp = fit_sample(ds, sample_n, vec_col, id_col=id_col) \
        .sort_values(id_col).reset_index(drop=True)
    if samp.empty:
        return (pd.DataFrame({id_col: pd.Series([], dtype="int64")}),
                np.zeros((m, k, 0)))
    S = np.asarray([np.asarray(v, np.float64) for v in samp[vec_col]])
    d = S.shape[1]
    if d % m:
        raise ValueError(f"product_quantize: dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, sub))
    for j in range(m):
        X = S[:, j * sub:(j + 1) * sub]
        idx = rng.choice(X.shape[0], size=min(k, X.shape[0]),
                         replace=False)
        C = X[idx].copy()
        if C.shape[0] < k:                      # tiny sample: pad
            C = np.vstack([C, C[rng.integers(0, C.shape[0],
                                             k - C.shape[0])]])
        for _ in range(iters):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(k):
                pts = X[a == c]
                if len(pts):
                    C[c] = pts.mean(axis=0)
        books[j] = C
    ref = ray.put(books)

    def encode(batch: pa.Table) -> pa.Table:
        B = ray.get(ref)
        V = _vectors(batch, vec_col)
        n = V.shape[0]
        cols = {id_col: batch.column(id_col).cast(pa.int64())}
        if n == 0:
            for j in range(m):
                cols[f"code_{j}"] = pa.array([], pa.int32())
            cols["err"] = pa.array([], pa.float64())
            return pa.table(cols)
        err = np.zeros(n)
        for j in range(m):
            X = V[:, j * sub:(j + 1) * sub]
            C = B[j]
            d2 = ((X ** 2).sum(axis=1, keepdims=True)
                  - 2 * X @ C.T + (C ** 2).sum(axis=1)[None, :])
            a = d2.argmin(axis=1)
            err += np.maximum(np.take_along_axis(
                d2, a[:, None], axis=1).ravel(), 0.0)
            cols[f"code_{j}"] = pa.array(a.astype(np.int32))
        cols["err"] = pa.array(np.round(err / V.shape[1], 6))
        return pa.table(cols)

    codes = ds.map_batches(encode, batch_format="pyarrow",
                           batch_size=None).to_pandas() \
        .sort_values(id_col).reset_index(drop=True)
    return codes, books


def mmr_topk(ds, query: np.ndarray, k: int = 10, lam: float = 0.5,
             candidates: int = 100, vec_col: str = "embedding",
             id_col: str = "vec_id") -> pd.DataFrame:
    """Diversity-aware retrieval: Maximal Marginal Relevance (Carbonell
    & Goldstein 1998) — greedily pick items maximizing
    λ·sim(query, d) − (1−λ)·max_{s∈selected} sim(d, s), so near-
    duplicate hits don't crowd the top-k (the dedup-at-retrieval-time
    complement of the near-dup pipelines; λ=1 is plain top-k).

    Scale shape: stage 1 is the exact broadcast ``cosine_topk`` fan-out
    (zero shuffle) for the top-``candidates`` pool; stage 2 fetches
    ONLY those candidates' vectors in a pruned second pass (the
    _shingle_sets pattern); the greedy loop runs driver-side on the
    (candidates x d) matrix — k·candidates dot products on a bounded
    table, never the corpus. Returns (rank, vec_id, relevance,
    mmr_score) with scores rounded to 6; deterministic id tiebreaks."""
    import ray

    q = np.asarray(query, np.float64).reshape(1, -1)
    pool = cosine_topk(ds, q, k=candidates, vec_col=vec_col,
                       id_col=id_col)
    if pool.empty:
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "relevance": [], "mmr_score": []})
    ids = pool["vec_id"].to_numpy(np.int64)
    rel = pool["score"].to_numpy(np.float64)

    id_set = pa.array(np.unique(ids), pa.int64())

    def fetch(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(id_col).cast(pa.int64()),
                        value_set=id_set)
        sel = batch.filter(mask)
        V = _normalize(_vectors(sel, vec_col)) if sel.num_rows else \
            np.zeros((0, q.shape[1]))
        return pa.table({id_col: sel.column(id_col).cast(pa.int64()),
                         "vec": pa.array([r.tolist() for r in V],
                                         pa.list_(pa.float64()))})

    rows = ds.map_batches(fetch, batch_format="pyarrow",
                          batch_size=None).take_all()
    vec_of = {r[id_col]: np.asarray(r["vec"], np.float64) for r in rows}
    V = np.stack([vec_of[i] for i in ids])
    S = V @ V.T                                   # candidate x candidate

    picked: list[int] = []
    out_rows = []
    avail = np.ones(ids.size, bool)
    for rank in range(1, min(k, ids.size) + 1):
        if picked:
            div = S[:, picked].max(axis=1)
        else:
            div = np.zeros(ids.size)
        score = lam * rel - (1.0 - lam) * div
        score = np.where(avail, score, -np.inf)
        order = np.lexsort((ids, -np.round(score, 12)))
        j = order[0]
        picked.append(j)
        avail[j] = False
        out_rows.append((rank, int(ids[j]), round(float(rel[j]), 6),
                         round(float(score[j]), 6)))
    return pd.DataFrame(out_rows, columns=["rank", "vec_id",
                                           "relevance", "mmr_score"])


def ivfpq_topk(ds, queries: np.ndarray, k: int = 10, nlist: int = 16,
               nprobe: int = 6, m: int = 4, kcode: int = 16,
               vec_col: str = "embedding", id_col: str = "vec_id",
               sample_n: int = 4096) -> pd.DataFrame:
    """IVF-PQ approximate search — the billion-scale index shape
    (Jégou et al.): an IVF coarse quantizer prunes the corpus to the
    ``nprobe`` nearest lists per query, and similarities come from
    PQ codes via ADC lookup tables (for each query and subspace,
    LUT_j = q_j · codebook_j^T once; a vector's score is m table
    lookups, never a d-dim dot product).

    Scale shape: both quantizers fit on one deterministic sample
    (KB-sized state, broadcast once); ONE stateless pass per block
    assigns the coarse cell, PQ-encodes, and ADC-scores the probed
    rows — only k-sized partials leave; the driver merges them
    (the cosine_topk merge). Approximate by construction (coarse
    pruning + 8-bit codes); pytest bounds recall vs the exact
    baseline. Returns (query_id, vec_id, score, rank) with ADC scores
    rounded to 6."""
    import ray

    # layout-independent hash draw, then id-sorted: neither quantizer
    # may depend on block layout — both fit from this one sorted sample
    # (coarse centroids seeded by striding it, the fit_centroids recipe)
    samp = fit_sample(ds, sample_n, vec_col, id_col=id_col) \
        .sort_values(id_col)
    S = _normalize(np.asarray([np.asarray(v, np.float64)
                               for v in samp[vec_col]]))
    idx = np.linspace(0, len(S) - 1, nlist).astype(np.int64)
    C = S[idx].copy()
    for _ in range(10):
        assign = (S @ C.T).argmax(axis=1)
        for j in range(nlist):
            sel = assign == j
            if sel.any():
                C[j] = S[sel].mean(axis=0)
        C = _normalize(C)
    d = S.shape[1]
    if d % m:
        raise ValueError(f"ivfpq_topk: dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.default_rng(0)
    books = np.empty((m, kcode, sub))
    for j in range(m):
        X = S[:, j * sub:(j + 1) * sub]
        idx = rng.choice(X.shape[0], size=min(kcode, X.shape[0]),
                         replace=False)
        Cb = X[idx].copy()
        if Cb.shape[0] < kcode:
            Cb = np.vstack([Cb, Cb[rng.integers(0, Cb.shape[0],
                                                kcode - Cb.shape[0])]])
        for _ in range(8):
            d2 = ((X[:, None, :] - Cb[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(kcode):
                pts = X[a == c]
                if len(pts):
                    Cb[c] = pts.mean(axis=0)
        books[j] = Cb

    Q = _normalize(np.asarray(queries, np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    mask = np.zeros((Q.shape[0], C.shape[0]), dtype=bool)
    np.put_along_axis(mask, probe, True, axis=1)
    # ADC lookup tables: (n_queries, m, kcode)
    LUT = np.einsum("qms,mks->qmk", Q.reshape(Q.shape[0], m, sub), books)
    state = ray.put((C, books, mask, LUT))

    def block_topk(batch: pa.Table) -> pa.Table:
        Cn, B, probe_mask, lut = ray.get(state)
        V = _vectors(batch, vec_col)
        if V.shape[0] == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        Vn = _normalize(V)
        cid = (Vn @ Cn.T).argmax(axis=1)
        codes = np.empty((Vn.shape[0], m), np.int64)
        for j in range(m):
            X = Vn[:, j * sub:(j + 1) * sub]
            Cb = B[j]
            d2 = ((X ** 2).sum(axis=1, keepdims=True) - 2 * X @ Cb.T
                  + (Cb ** 2).sum(axis=1)[None, :])
            codes[:, j] = d2.argmin(axis=1)
        # ADC: score[q, i] = sum_j lut[q, j, codes[i, j]]
        S = np.zeros((lut.shape[0], Vn.shape[0]))
        for j in range(m):
            S += lut[:, j, codes[:, j]]
        allowed = probe_mask[:, cid]
        S = np.where(allowed, np.round(S, 6), -np.inf)
        kk = min(k, S.shape[1])
        # ADC scores tie often (8-bit codes) — deterministic
        # (score desc, id asc) selection per query keeps the block
        # partials layout-invariant (argpartition would pick
        # arbitrarily among ties); queries are few by design
        qids, vids, scs = [], [], []
        for qi in range(S.shape[0]):
            order = np.lexsort((ids, -S[qi]))[:kk]
            sc = S[qi][order]
            keep = np.isfinite(sc)
            qids.append(np.full(int(keep.sum()), qi, np.int64))
            vids.append(ids[order][keep])
            scs.append(sc[keep])
        return pa.table({"query_id": pa.array(np.concatenate(qids)),
                         "vec_id": pa.array(np.concatenate(vids)),
                         "score": pa.array(np.concatenate(scs),
                                           pa.float64())})

    parts = ds.map_batches(block_topk, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    return _merge_topk(parts, k)


def label_centroids(ds, *, label_col: str = "label",
                    vec_col: str = "embedding") -> pd.DataFrame:
    """Per-label embedding centroid (exact vector mean) — the
    class-prototype builder behind centroid-based curation (prune points
    far from their class center), semantic balance checks, and nearest-
    class-mean classification.

    Combiner shape: each block reduces to an (n_labels x dim) partial
    sum + counts via one np.add.at scatter (no per-row loop); the driver
    merges only those KB-sized partials — never the vectors. One pass,
    zero shuffle, Zipf-immune (a hot label just adds into one row of the
    partial).

    Returns LONG format (label, pos, mean_v, n) with pos 1-based, so the
    result is directly comparable to SQL ``unnest + generate_subscripts``
    on the same table.
    """
    def partial(batch: pa.Table) -> pa.Table:
        M = _vectors(batch, vec_col)
        labels = batch.column(label_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), M.shape[1] if M.size else 0))
        np.add.at(sums, inv, M)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        d = sums.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(uniq, d), pa.int64()),
            "pos": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    len(uniq)), pa.int64()),
            "s": pa.array(sums.ravel(), pa.float64()),
            "n": pa.array(np.repeat(cnt, d), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    out = parts.groupby(["label", "pos"], as_index=False).agg(
        s=("s", "sum"), n=("n", "sum"))
    out["mean_v"] = out["s"] / out["n"]
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["label", "pos"])[
        ["label", "pos", "mean_v", "n"]].reset_index(drop=True)


def davies_bouldin(ds, *, label_col: str = "label",
                   vec_col: str = "embedding") -> pd.DataFrame:
    """Davies-Bouldin clustering-quality profile per label: scatter
    s_i = mean distance of label-i points to their centroid, and
    r_i = max over other labels of (s_i + s_j) / ||c_i − c_j|| — the
    worst-case overlap ratio with a neighbor (lower is better; the DB
    index is the mean of r_i). The triage complement to the
    silhouette: r_i names HOW BAD the worst neighbor confusion is,
    and argmax_j is the label to inspect.

    Same two-pass zero-shuffle shape as ``silhouette_simplified``:
    exact-centroid combiner fit, k × dim broadcast, one streaming
    per-label (sum_dist, n) partial pass; the k × k centroid-distance
    matrix and the max-ratio are driver arithmetic. A single label
    yields r_i = NULL. Returns (label, n, scatter, r)."""
    import ray

    cent = label_centroids(ds, label_col=label_col, vec_col=vec_col)
    if cent.empty:
        return pd.DataFrame({"label": pd.Series([], dtype="int64"),
                             "n": pd.Series([], dtype="int64"),
                             "scatter": pd.Series([], dtype="float64"),
                             "r": pd.Series([], dtype="float64")})
    labels = np.sort(cent["label"].unique())
    dim = int(cent["pos"].max())
    C = np.zeros((len(labels), dim))
    li = np.searchsorted(labels, cent["label"].to_numpy())
    C[li, cent["pos"].to_numpy() - 1] = cent["mean_v"].to_numpy()
    ref = ray.put((labels, C))

    def partial(batch: pa.Table) -> pa.Table:
        labels, C = ray.get(ref)
        M = _vectors(batch, vec_col)
        lab = batch.column(label_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if M.size == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        own = np.searchsorted(labels, lab)
        d = np.linalg.norm(M - C[own], axis=1)
        g = pa.table({"label": pa.array(lab, pa.int64()),
                      "s": pa.array(d, pa.float64())}) \
            .group_by("label").aggregate([("s", "sum"),
                                          ([], "count_all")])
        return pa.table({"label": g.column("label"),
                         "s": g.column("s_sum"),
                         "n": g.column("count_all").cast(pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    agg = parts.groupby("label", as_index=False).agg(
        s=("s", "sum"), n=("n", "sum"))
    agg = agg.set_index("label").reindex(labels)
    scat = (agg["s"] / agg["n"]).to_numpy()
    k = len(labels)
    if k == 1:
        r = np.array([np.nan])
    else:
        Md = np.linalg.norm(C[:, None, :] - C[None, :, :], axis=2)
        with np.errstate(divide="ignore", invalid="ignore"):
            R = (scat[:, None] + scat[None, :]) / Md
        np.fill_diagonal(R, -np.inf)
        r = R.max(axis=1)
    return pd.DataFrame({"label": labels.astype(np.int64),
                         "n": agg["n"].to_numpy(np.int64),
                         "scatter": scat, "r": r})


def silhouette_simplified(ds, *, label_col: str = "label",
                          vec_col: str = "embedding") -> pd.DataFrame:
    """Simplified (centroid-based) silhouette score per label — the
    clustering-quality validation: for each point, a = distance to its
    OWN label centroid, b = distance to the nearest OTHER centroid,
    s = (b − a)/max(a, b) ∈ [−1, 1]; a label whose mean s approaches 0
    or goes negative overlaps its neighbors (mislabeled or drifting
    cluster). This is the O(n·k) variant of the O(n²) full silhouette
    — the only form that scales.

    Two passes, zero shuffle: the ``label_centroids`` combiner fit
    (exact means), centroid matrix broadcast once via ``ray.put``
    (k × dim — the same small-state budget as the kmeans/IVF fits),
    then one streaming pass emitting per-label (sum_s, n) partials.
    Degenerate cases follow sklearn: a single label scores 0, as does
    a point equidistant at 0 from two centroids. Returns
    (label, n, mean_sil)."""
    import ray

    cent = label_centroids(ds, label_col=label_col, vec_col=vec_col)
    if cent.empty:
        return pd.DataFrame({"label": pd.Series([], dtype="int64"),
                             "n": pd.Series([], dtype="int64"),
                             "mean_sil": pd.Series([], dtype="float64")})
    labels = np.sort(cent["label"].unique())
    dim = int(cent["pos"].max())
    C = np.zeros((len(labels), dim))
    li = np.searchsorted(labels, cent["label"].to_numpy())
    C[li, cent["pos"].to_numpy() - 1] = cent["mean_v"].to_numpy()
    ref = ray.put((labels, C))

    def partial(batch: pa.Table) -> pa.Table:
        labels, C = ray.get(ref)
        M = _vectors(batch, vec_col)
        lab = batch.column(label_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if M.size == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        # squared distances to every centroid in one matmul
        d2 = (M * M).sum(axis=1)[:, None] - 2.0 * (M @ C.T) \
            + (C * C).sum(axis=1)[None, :]
        d = np.sqrt(np.maximum(d2, 0.0))
        own = np.searchsorted(labels, lab)
        rows = np.arange(len(lab))
        a = d[rows, own]
        dm = d.copy()
        dm[rows, own] = np.inf
        b = dm.min(axis=1)
        denom = np.maximum(a, b)
        with np.errstate(invalid="ignore"):
            s = np.where(np.isfinite(b) & (denom > 0),
                         (b - a) / np.where(denom > 0, denom, 1.0), 0.0)
        g = pa.table({"label": pa.array(lab, pa.int64()),
                      "s": pa.array(s, pa.float64())}) \
            .group_by("label").aggregate([("s", "sum"),
                                          ([], "count_all")])
        return pa.table({"label": g.column("label"),
                         "s": g.column("s_sum"),
                         "n": g.column("count_all").cast(pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    out = parts.groupby("label", as_index=False).agg(
        s=("s", "sum"), n=("n", "sum"))
    out["mean_sil"] = out["s"] / out["n"]
    out["label"] = out["label"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("label")[["label", "n", "mean_sil"]] \
        .reset_index(drop=True)
