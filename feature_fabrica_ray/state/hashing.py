"""Deterministic, vectorized 64-bit hashing for distributed sketches.

Every sketch (HLL, MinHash, SimHash) and every salted/hash-partitioned
shuffle key in this engine needs a hash that is (a) vectorized — no Python
loop per row — and (b) stable across worker processes (Python's builtin
``hash`` is salted per process and would break sketch merges).

We use polars' xxhash-based ``Series.hash`` (stable within a polars
version, seedable) as the vectorized kernel, falling back to a numpy
FNV-1a implementation when polars is unavailable.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

# Parallelism belongs to Ray (one task per core), not to rayon inside every
# worker: an unpinned polars pool spawns machine-width threads PER WORKER,
# oversubscribing the node and silently breaking CPU-scaling measurements.
os.environ.setdefault("POLARS_MAX_THREADS", "1")

def _polars_healthy(_pl) -> bool:
    """Exercise the exact call chain hash64 uses so every lazily-loaded
    polars submodule is fully imported before any task-time call — and
    so a torn module graph is detected here rather than mid-shuffle."""
    try:
        _pl.from_arrow(pa.array(["warmup"])).hash(seed=np.uint64(0))
        return True
    except Exception:
        return False


def _reimport_polars():
    """Repair a torn polars module graph by re-importing from scratch.

    A worker can find `polars._reexport` (plain top-level imports, no
    lazy __getattr__) registered in sys.modules but only PARTIALLY
    executed — its attributes missing at call time (`module
    'polars._reexport' has no attribute 'Series'`, seen in fresh
    workers when two Datasets execute concurrently).
    ``importlib.reload`` of the top package does NOT re-execute
    already-registered submodules, so the only reliable repair is
    deleting every ``polars*`` entry from sys.modules and importing
    fresh — single-threaded at this point, so the new import graph is
    complete by construction."""
    import importlib
    import sys

    for k in [k for k in list(sys.modules)
              if k == "polars" or k.startswith("polars.")]:
        sys.modules.pop(k, None)
    return importlib.import_module("polars")


try:
    import polars as pl

    if not _polars_healthy(pl):  # pragma: no cover - torn-import repair
        pl = _reimport_polars()
    _HAS_POLARS = True
except ImportError:  # pragma: no cover
    _HAS_POLARS = False

__all__ = ["hash64", "hash64_multi", "combine_hashes"]

# Odd multipliers for universal-hash derivation of k hash families from one
# base hash: h_i(x) = (a_i * h(x) + b_i) mod 2^64 (Carter-Wegman style).
_A0 = np.uint64(0x9E3779B97F4A7C15)
_B0 = np.uint64(0xC2B2AE3D27D4EB4F)


def _to_series(values) -> "pl.Series":
    if isinstance(values, pl.Series):
        return values
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        return pl.from_arrow(values)
    return pl.Series(values)


def _fnv1a_fallback(values, seed: int) -> np.ndarray:  # pragma: no cover
    import hashlib

    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        h = hashlib.blake2b(repr(v).encode(), digest_size=8, salt=seed.to_bytes(8, "little"))
        out[i] = np.frombuffer(h.digest(), dtype=np.uint64)[0]
    return out


def hash64(values, seed: int = 0) -> np.ndarray:
    """Vectorized deterministic 64-bit hash of a string/numeric column.

    Accepts a pyarrow Array/ChunkedArray, polars Series, numpy array or
    list; returns ``np.uint64`` array of the same length. Nulls hash to a
    fixed value (polars semantics), so they never collide randomly.

    Dictionary-encoded columns take a FAST PATH: the (tiny) dictionary
    is hashed once and gathered by index — per-row results are
    IDENTICAL to hashing the decoded values, at a fraction of the
    memory-bus bytes (8 B index vs the string payload). This is what
    makes low-cardinality string columns (repo, lang) cheap to
    partition/sketch on at 10^12 rows.
    """
    if isinstance(values, pa.ChunkedArray) and \
            pa.types.is_dictionary(values.type):
        values = values.combine_chunks()
    if isinstance(values, pa.Array) and pa.types.is_dictionary(values.type):
        dict_h = hash64(values.dictionary, seed=seed)
        idx = values.indices
        valid = ~np.asarray(idx.is_null())
        iv = idx.to_numpy(zero_copy_only=False)
        ii = np.where(valid, np.nan_to_num(iv), 0).astype(np.int64)
        out = dict_h[ii] if len(dict_h) else np.zeros(len(values), np.uint64)
        if not valid.all():
            null_h = hash64(pa.array([None], values.type.value_type),
                            seed=seed)[0]
            out = out.copy()
            out[~valid] = null_h
        return out
    if _HAS_POLARS:
        global pl
        last = None
        for _ in range(16):
            try:
                s = _to_series(values)
                return s.hash(seed=np.uint64(seed)
                              & np.uint64(0xFFFFFFFFFFFFFFFF)) \
                    .to_numpy().astype(np.uint64)
            except AttributeError as e:
                # torn polars module graph (see _reimport_polars).
                # Purge-and-reimport, then retry. If it stays torn we
                # RAISE — never silently fall back to a different hash
                # function mid-run, which would corrupt shuffles and
                # sketches.
                last = e
                import time as _time

                try:
                    pl = _reimport_polars()
                except Exception:
                    pass
                _time.sleep(0.05)
        raise last
    return _fnv1a_fallback(list(values), seed)


def hash64_multi(base: np.ndarray, k: int, seed: int = 1) -> np.ndarray:
    """Derive ``k`` independent-ish hash families from one base hash array.

    Returns shape ``(k, n)`` uint64. Used by MinHash (k permutations) so the
    expensive string hash runs once per value, not k times.
    """
    base = base.astype(np.uint64, copy=False)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=k, dtype=np.uint64) * np.uint64(2) + np.uint64(1)  # odd
    b = rng.integers(0, 2**63, size=k, dtype=np.uint64)
    # scalar-multiply per family, NOT `a[:,None] * base[None,:]`: numpy's
    # uint64 BROADCAST multiply takes a non-SIMD buffered path ~100x
    # slower than the scalar form (measured 10.7s vs 0.08s on 8M elems,
    # numpy 1.26) — same math, contiguous fast loops
    out = np.empty((k, base.size), np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            np.multiply(base, a[i], out=out[i])
            out[i] += b[i]
    return out


def combine_hashes(*cols: np.ndarray) -> np.ndarray:
    """Order-dependent combine of several uint64 hash columns into one.

    Used for composite keys (repo, path, commit) -> one shuffle/sketch key.
    """
    acc = cols[0].astype(np.uint64, copy=True)
    for c in cols[1:]:
        with np.errstate(over="ignore"):
            acc = (acc ^ c.astype(np.uint64)) * _A0 + _B0
    return acc
