"""Exact mergeable value-count histogram for BOUNDED value domains.

The global-fit dual of ``pipelines/quantiles.group_quantiles``: each block
contributes its distinct (value, count) pairs, merges are exact integer
adds, and quantiles over the expanded multiset are therefore EXACT and
bit-identical at every parallelism level — unlike a t-digest, they can be
oracle-checked against SQL ``quantile_cont``. The partial's size is the
block's distinct-value count (independent of row count), so the exchange
stays KB-sized for the bounded domains of typical validation metrics
(lengths, counts, scores, 2-dp prices). A hard cap guards the unbounded
case; callers hit it should switch to the t-digest path
(``state/tdigest.py``), which every consumer exposes as ``exact=False``.

Interpolation matches DuckDB ``quantile_cont``: position ``q * (N - 1)``
over the sorted multiset, ``lo + (hi - lo) * frac`` between the two
bracketing order statistics.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["ValueHist"]

# merged distinct-value budget; ~3 MB of state at the cap
DEFAULT_CAP = 200_000


class ValueHist:
    __slots__ = ("values", "counts", "cap")

    def __init__(self, values=None, counts=None, cap: int = DEFAULT_CAP):
        self.values = np.asarray(values if values is not None else [],
                                 dtype=np.float64)
        self.counts = np.asarray(counts if counts is not None else [],
                                 dtype=np.int64)
        self.cap = int(cap)
        self._check(self.values.size)

    def _check(self, n_distinct: int) -> None:
        if n_distinct > self.cap:
            raise ValueError(
                f"ValueHist: {n_distinct} distinct values exceeds the "
                f"{self.cap} cap — the value domain is unbounded for an "
                "exact histogram; use the t-digest path (exact=False)")

    @classmethod
    def from_array(cls, arr: np.ndarray, cap: int = DEFAULT_CAP) -> "ValueHist":
        arr = np.asarray(arr, dtype=np.float64)
        arr = arr[~np.isnan(arr)]
        v, c = np.unique(arr, return_counts=True)
        return cls(v, c.astype(np.int64), cap=cap)

    @property
    def total(self) -> int:
        return int(self.counts.sum())

    def merge(self, other: "ValueHist") -> "ValueHist":
        if other.values.size == 0:
            return self
        if self.values.size == 0:
            return other
        v = np.concatenate([self.values, other.values])
        c = np.concatenate([self.counts, other.counts])
        uv, inv = np.unique(v, return_inverse=True)
        uc = np.zeros(uv.size, dtype=np.int64)
        np.add.at(uc, inv, c)
        return ValueHist(uv, uc, cap=self.cap)

    def quantile(self, q: float) -> float:
        """quantile_cont over the multiset {values[i] x counts[i]} without
        expansion: order statistic k = first value whose cumulative count
        exceeds k (values are already sorted by np.unique)."""
        if self.values.size == 0:
            raise ValueError("ValueHist.quantile on empty histogram")
        q = float(q)
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile q must be in [0, 1], got {q}")
        cum = np.cumsum(self.counts)
        n = int(cum[-1])
        pos = q * (n - 1)
        i0 = int(np.floor(pos))
        frac = pos - i0
        lo = float(self.values[np.searchsorted(cum, i0 + 1)])
        if frac == 0.0:
            return lo
        hi = float(self.values[np.searchsorted(cum, i0 + 2)])
        return lo + (hi - lo) * frac

    def percent_rank_of(self, xs: np.ndarray) -> np.ndarray:
        """SQL ``percent_rank()`` over the fitted multiset, vectorized:
        count(values < x) / (N - 1) — ties share the first rank of their
        group, exactly as the window function assigns them."""
        if self.values.size == 0:
            raise ValueError("ValueHist.percent_rank_of on empty histogram")
        cum = np.cumsum(self.counts)
        n = int(cum[-1])
        idx = np.searchsorted(self.values, xs, side="left")
        below = np.where(idx > 0, cum[np.maximum(idx - 1, 0)], 0)
        return below / max(n - 1, 1)

    # -- fit-pass exchange format (length-prefixed packed arrays) -------
    def to_bytes(self) -> bytes:
        return (struct.pack("<Q", self.values.size)
                + self.values.tobytes() + self.counts.tobytes())

    @classmethod
    def from_bytes(cls, b: bytes, cap: int = DEFAULT_CAP) -> "ValueHist":
        n = struct.unpack_from("<Q", b)[0]
        v = np.frombuffer(b, np.float64, n, 8)
        c = np.frombuffer(b, np.int64, n, 8 + 8 * n)
        return cls(v, c, cap=cap)

    @classmethod
    def merge_bytes(cls, blobs, cap: int = DEFAULT_CAP) -> "ValueHist":
        out = cls(cap=cap)
        for b in blobs:
            out = out.merge(cls.from_bytes(b, cap=cap))
        return out
