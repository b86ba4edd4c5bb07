"""Deterministic synthetic source-code table — the engine's primary input.

The north rule's input is a Parquet table of source-code repositories with
columns ``(repo, path, commit, lang, content)`` (BASELINE.json input_hint).
The sandbox testdata has no such table, so we DERIVE one deterministically
from the driver's ``documents`` table with formulas that are expressible
identically in DuckDB SQL — which lets every validation check carry a real
SQL oracle (the driver compares Ray output vs DuckDB on the same parquet).

Planted defects (deterministic, so golden verdicts are computable — mirrors
FIXTURES.md F1):
- ``lang IS NULL``        when doc_id % 200 == 0      (null-rate check)
- ``content = ''``        when doc_id % 500 == 3      (row check)
- duplicated rows         when doc_id % 101 == 1      (uniqueness check)
- parent table ``repos``  omits repo_id == 7          (referential check)

``repo`` is skewed (cube-law over a uniform residue) to exercise salted-key
handling, mirroring real repo/file distributions.

Scale-up for benchmarks: ``read_codetable(sf_dir, replicate=K)`` emits K
commit-variants per document (distinct ``commit`` values), multiplying rows
without changing the per-row distributions. K=1 is the oracle-checked shape.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

__all__ = ["codetable_cte", "read_codetable", "read_repos", "attach_codetable_views",
           "CODETABLE_SCHEMA", "add_content_sha256"]

CODETABLE_SCHEMA = pa.schema([
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("lang", pa.string()),
    ("content", pa.string()),
])

_EXT = {"en": ".py", "zh": ".c", "es": ".js", "de": ".go", "fr": ".rs"}
_N_REPOS = 40  # repo_id in [0, 40); cube-law skew toward 0
_ORPHAN_REPO_ID = 7  # repos table omits this id -> RI violations


def _repo_ids(doc_id: np.ndarray) -> np.ndarray:
    x = (doc_id % 97) / 97.0
    return np.floor(x * x * x * _N_REPOS).astype(np.int64)


def _md5_hex(strings: list[str]) -> np.ndarray:
    return np.array([hashlib.md5(s.encode()).hexdigest() for s in strings], dtype=object)


_REPO_LOOKUP = pa.array([f"org{r % 7}/repo{r}" for r in range(_N_REPOS)], pa.string())
_LANGS = pa.array(list(_EXT), pa.string())
_EXTS = np.array([_EXT[k] for k in _EXT] + [".rs"], dtype=object)  # last = unknown/null


def _hex32(doc_id: np.ndarray, seed_a: int, seed_b: int) -> pa.Array:
    """Vectorized 32-hex-char ids for replicate variants: two 64-bit
    hashes hexlified in one buffer pass (no per-row Python)."""
    import binascii

    from ..state.hashing import hash64_multi

    h = hash64_multi(doc_id.astype(np.uint64), 2, seed=seed_a * 1_000_003 + seed_b)
    buf = np.ascontiguousarray(h.T).astype(">u8").tobytes()
    return pa.array(np.frombuffer(binascii.hexlify(buf), dtype="S32").astype("U32"))


def _derive_batch(batch: pa.Table, replicate: int = 1,
                  dict_encode: bool = False) -> pa.Table:
    """documents batch -> codetable batch. Fully vectorized (Arrow/numpy)
    except the base-variant md5 loop, which must match the DuckDB oracle's
    ``md5()`` byte-for-byte (only replicate=1 is oracle-checked; the k>=1
    bench-scale variants use a vectorized hex id instead).

    ``dict_encode=True`` emits the genuinely-low-cardinality ``repo``
    and ``lang`` columns as Arrow DICTIONARY arrays (indices built
    directly — the string values are never materialized per row), the
    layout a Parquet reader produces for dictionary-encoded columns at
    scale. Row values are identical; downstream hashing/checks take the
    dictionary fast path."""
    doc_id = batch.column("doc_id").to_numpy()
    lang = batch.column("lang")
    text = batch.column("text")

    rid = _repo_ids(doc_id)
    lang_idx = pc.index_in(lang, value_set=_LANGS)
    ext_np = lang_idx.to_numpy(zero_copy_only=False)
    ext_idx = np.where(np.isnan(ext_np.astype(np.float64)), len(_EXTS) - 1,
                       ext_np).astype(np.int64)
    null_lang = pa.array(doc_id % 200 == 0)
    if dict_encode:
        repo = pa.DictionaryArray.from_arrays(
            pa.array(rid.astype(np.int32), pa.int32()), _REPO_LOOKUP)
        lang_out = pa.DictionaryArray.from_arrays(
            pc.if_else(null_lang, pa.nulls(len(doc_id), pa.int32()),
                       lang_idx.cast(pa.int32())), _LANGS)
    else:
        repo = _REPO_LOOKUP.take(pa.array(rid, pa.int64()))
        lang_out = pc.if_else(null_lang, pa.nulls(len(doc_id), pa.string()),
                              lang)
    path = pc.binary_join_element_wise(
        pa.array(np.char.mod("src/m%d/f", doc_id % 13)),
        pa.array((doc_id).astype("U")),
        pa.array(_EXTS[ext_idx].astype("U")), "")
    content = pc.if_else(pa.array(doc_id % 500 == 3), pa.scalar(""), text)

    n = len(doc_id)
    dup_np = (doc_id % 101) == 1
    dup_mask = pa.array(dup_np)
    has_dups = bool(dup_np.any())

    # base variant: md5 commits, byte-identical to the DuckDB oracle
    repo_py = repo.to_pylist()
    commit0 = pa.array(_md5_hex([f"{r}:{d}" for r, d in zip(repo_py, doc_id)]),
                       pa.string())
    t0 = pa.table({"repo": repo, "path": path, "commit": commit0,
                   "lang": lang_out, "content": content})
    if has_dups:  # planted duplicates: rows with doc_id % 101 == 1 appear twice
        t0 = pa.concat_tables([t0, t0.filter(dup_mask)])
    if replicate == 1:
        return t0

    # k>=1 bench-scale variants: ONE vectorized take + one hexlify for all
    # replicas (a per-k Python loop costs blocks x replicate constant
    # overhead and dominates at high replication)
    import binascii

    from ..state.hashing import hash64_multi

    m = replicate - 1
    idx = pa.array(np.tile(np.arange(n, dtype=np.int64), m))
    h = hash64_multi(doc_id.astype(np.uint64), 2 * m, seed=1_000_003)  # (2m, n)
    pairs = h.reshape(m, 2, n).transpose(0, 2, 1).reshape(-1, 2)       # k-major
    buf = np.ascontiguousarray(pairs).astype(">u8").tobytes()
    commits = pa.array(np.frombuffer(binascii.hexlify(buf), dtype="S32").astype("U32"))
    rep_t = pa.table({
        "repo": repo.take(idx), "path": path.take(idx), "commit": commits,
        "lang": lang_out.take(idx), "content": content.take(idx)})
    if has_dups:
        rep_t = pa.concat_tables([rep_t, rep_t.filter(pa.array(np.tile(dup_np, m)))])
    return pa.concat_tables([t0, rep_t])


def read_codetable(sf_dir: str, replicate: int = 1, with_sha256: bool = True,
                   dict_encode: bool = False) -> "ray.data.Dataset":
    """The source-code table as a streaming Ray Dataset.

    Reads only the needed columns of documents.parquet (prune-at-read) and
    derives codetable rows per batch; sha256 of content is stamped at ingest
    (the end-to-end per-row invariant). ``dict_encode=True`` emits
    repo/lang dictionary-encoded (see ``_derive_batch``) — same values,
    a fraction of the memory-bus bytes per downstream scan."""
    if replicate < 1:
        raise ValueError(f"replicate must be >= 1, got {replicate}")
    from ..tuning import read_blocks

    from .reader import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang", "text"],
                            override_num_blocks=read_blocks())
    ds = ds.map_batches(
        lambda b: _derive_batch(b, replicate, dict_encode=dict_encode),
        batch_format="pyarrow", batch_size=None)
    if with_sha256:
        ds = ds.map_batches(add_content_sha256, batch_format="pyarrow", batch_size=None)
    return ds


def add_content_sha256(batch: pa.Table) -> pa.Table:
    """Stamp ``content_sha256`` (hex) — preserved byte-for-byte by every
    downstream stage; the engine's per-row invariant."""
    if "content_sha256" in batch.column_names:
        return batch
    sha = [hashlib.sha256(s.encode()).hexdigest() if s is not None else None
           for s in batch.column("content").to_pylist()]
    return batch.append_column("content_sha256", pa.array(sha, pa.string()))


def read_repos(sf_dir: str) -> "ray.data.Dataset":
    """Parent dimension table repos(repo, stars) — small; broadcast side of
    the referential-integrity check. Per-block distincts are tiny (<=40
    rows) so the global dedup happens driver-side — no shuffle for a
    dimension table that will be broadcast anyway. The collected table is
    memoized per sf_dir (dimension tables are read once per run)."""
    cached = _REPOS_CACHE.get(sf_dir)
    if cached is not None:
        return ray.data.from_arrow(cached)
    from .reader import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def derive(batch: pa.Table) -> pa.Table:
        rid = np.unique(_repo_ids(batch.column("doc_id").to_numpy()))
        rid = rid[rid != _ORPHAN_REPO_ID]
        repo = [f"org{r % 7}/repo{r}" for r in rid]
        return pa.table({"repo": pa.array(repo, pa.string()),
                         "stars": pa.array(rid * 100 + 1, pa.int64())})

    parts = ds.map_batches(derive, batch_format="pyarrow", batch_size=None).take_all()
    dedup = {r["repo"]: r["stars"] for r in parts}
    table = pa.table({
        "repo": pa.array(sorted(dedup), pa.string()),
        "stars": pa.array([dedup[k] for k in sorted(dedup)], pa.int64())})
    _REPOS_CACHE[sf_dir] = table
    return ray.data.from_arrow(table)


_REPOS_CACHE: dict = {}


# ---------------------------------------------------------------------------
# DuckDB oracle side — MUST mirror _derive_batch exactly.
# ---------------------------------------------------------------------------

def codetable_cte() -> str:
    """SQL CTE prefix defining `codetable` and `repos` views over the
    pre-registered `documents` view, row-for-row identical to
    read_codetable(sf_dir, replicate=1)."""
    return f"""
WITH __base AS (
  SELECT doc_id,
         CAST(floor(pow((doc_id % 97) / 97.0, 3.0) * {_N_REPOS}) AS BIGINT) AS repo_id,
         lang AS orig_lang, text
  FROM documents
), __ct0 AS (
  SELECT doc_id, repo_id,
    'org' || CAST(repo_id % 7 AS VARCHAR) || '/repo' || CAST(repo_id AS VARCHAR) AS repo,
    'src/m' || CAST(doc_id % 13 AS VARCHAR) || '/f' || CAST(doc_id AS VARCHAR) ||
      CASE orig_lang WHEN 'en' THEN '.py' WHEN 'zh' THEN '.c' WHEN 'es' THEN '.js'
                     WHEN 'de' THEN '.go' ELSE '.rs' END AS path,
    md5('org' || CAST(repo_id % 7 AS VARCHAR) || '/repo' || CAST(repo_id AS VARCHAR)
        || ':' || CAST(doc_id AS VARCHAR)) AS "commit",
    CASE WHEN doc_id % 200 = 0 THEN NULL ELSE orig_lang END AS lang,
    CASE WHEN doc_id % 500 = 3 THEN '' ELSE text END AS content
  FROM __base
), codetable AS (
  SELECT repo, path, "commit", lang, content FROM __ct0
  UNION ALL
  SELECT repo, path, "commit", lang, content FROM __ct0 WHERE doc_id % 101 = 1
), repos AS (
  SELECT DISTINCT repo, repo_id * 100 + 1 AS stars FROM __ct0 WHERE repo_id <> {_ORPHAN_REPO_ID}
)
"""


def attach_codetable_views(con) -> None:
    """Register codetable/repos as DuckDB views (for local testing; the
    driver oracle embeds codetable_cte() inline instead)."""
    con.execute("CREATE OR REPLACE VIEW codetable AS "
                + codetable_cte() + " SELECT * FROM codetable")
