"""Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
Quantiles Using t-Digests") for distributed quantile estimation.

Per-block partial: build a digest from the block's values (vectorized sort +
k-scale bucketing). Merge: concatenate centroid lists and re-compress.
Centroid arrays are ~2*delta floats (KB-sized) so shipping them through a
groupby/driver merge is free. Rank error near the median is ~O(1/delta);
delta=250 comfortably meets the FIXTURES.md target (p50/p95/p99 within 1%
rank error).

Everything is numpy; compression is deterministic for a given input order,
and we sort centroids before compressing so the result depends only on the
multiset of (mean, weight) pairs — merges are order-insensitive up to the
usual t-digest approximation.
"""

from __future__ import annotations

import numpy as np

__all__ = ["TDigest"]


def _k_scale(q: np.ndarray, delta: float) -> np.ndarray:
    # k1 scale function: delta/(2*pi) * asin(2q - 1); accurate tails.
    return delta / (2.0 * np.pi) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


class TDigest:
    __slots__ = ("delta", "means", "weights", "_min", "_max")

    def __init__(self, delta: float = 250.0, means: np.ndarray | None = None,
                 weights: np.ndarray | None = None,
                 vmin: float = np.inf, vmax: float = -np.inf):
        self.delta = delta
        self.means = means if means is not None else np.empty(0, dtype=np.float64)
        self.weights = weights if weights is not None else np.empty(0, dtype=np.float64)
        self._min = vmin
        self._max = vmax

    # -- build ------------------------------------------------------------
    @classmethod
    def from_array(cls, arr: np.ndarray, delta: float = 250.0) -> "TDigest":
        arr = np.asarray(arr, dtype=np.float64)
        arr = arr[~np.isnan(arr)]
        if arr.size == 0:
            return cls(delta)
        arr = np.sort(arr)
        d = cls(delta, arr.copy(), np.ones(arr.size), float(arr[0]), float(arr[-1]))
        return d._compress()

    def _compress(self) -> "TDigest":
        if self.means.size == 0:
            return self
        order = np.argsort(self.means, kind="stable")
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        # Vectorized MergingDigest clustering: assign each centroid to the
        # integer bucket of its mid-quantile under the k1 scale function.
        # Buckets span k-width 1, preserving the t-digest size invariant,
        # and the whole compress is O(n log n) numpy (no Python loop).
        cum = np.cumsum(weights)
        q_mid = (cum - weights / 2.0) / total
        bucket = np.floor(_k_scale(q_mid, self.delta)).astype(np.int64)
        _, group = np.unique(bucket, return_inverse=True)
        ngroups = int(group[-1]) + 1
        w_out = np.bincount(group, weights=weights, minlength=ngroups)
        m_out = np.bincount(group, weights=weights * means, minlength=ngroups) / w_out
        return TDigest(self.delta, m_out, w_out, self._min, self._max)

    # -- merge ------------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        if other.means.size == 0:
            return self
        if self.means.size == 0:
            return other
        d = TDigest(
            self.delta,
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
            min(self._min, other._min),
            max(self._max, other._max),
        )
        return d._compress()

    # -- query ------------------------------------------------------------
    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        cum = np.cumsum(self.weights) - self.weights / 2.0  # centroid mid-ranks
        if target <= cum[0]:
            return float(self._min) if np.isfinite(self._min) else float(self.means[0])
        if target >= cum[-1]:
            return float(self._max) if np.isfinite(self._max) else float(self.means[-1])
        return float(np.interp(target, cum, self.means))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def cdf(self, xs) -> np.ndarray:
        """Approximate CDF at each x (the inverse of ``quantile``'s
        interpolation over centroid mid-ranks), vectorized."""
        xs = np.asarray(xs, dtype=np.float64)
        if self.means.size == 0:
            return np.full(xs.shape, np.nan)
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        out = np.interp(xs, self.means, cum) / total
        if np.isfinite(self._min):
            out = np.where(xs <= self._min, 0.0, out)
        if np.isfinite(self._max):
            out = np.where(xs >= self._max, 1.0, out)
        return np.clip(out, 0.0, 1.0)

    @property
    def count(self) -> float:
        return float(self.weights.sum())

    # -- serialization ----------------------------------------------------
    def to_bytes(self) -> bytes:
        header = np.array([self.delta, self._min, self._max, float(self.means.size)])
        return np.concatenate([header, self.means, self.weights]).tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        a = np.frombuffer(b, dtype=np.float64)
        delta, vmin, vmax, n = a[0], a[1], a[2], int(a[3])
        return cls(delta, a[4:4 + n].copy(), a[4 + n:4 + 2 * n].copy(), vmin, vmax)

    @classmethod
    def merge_bytes(cls, blobs) -> "TDigest":
        out = None
        for b in blobs:
            d = cls.from_bytes(b)
            out = d if out is None else out.merge(d)
        return out if out is not None else cls()
