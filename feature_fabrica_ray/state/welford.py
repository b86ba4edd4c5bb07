"""Welford/Chan parallel moments accumulator.

The reference's self-fitting ``z_score``/``min_max`` compute mean/std over
whatever array they see (reference: feature_fabrica/transform/math.py:158-167,
194-207), which silently becomes per-batch under its own batched benchmark.
Here moments are a *mergeable partial state* computed per Arrow block and
combined associatively (Chan et al. parallel variance), so global stats are
exact and invariant to partitioning — the shape required for 100 TB streams.

State is a tiny dict (8 scalars), serialized per block and merged either in
a ``groupby`` aggregate or driver-side (KB-sized, never a bottleneck).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

__all__ = ["Moments", "HigherMoments"]


@dataclass
class Moments:
    count: int = 0          # non-null values
    null_count: int = 0
    mean: float = 0.0
    m2: float = 0.0         # sum of squared deviations
    min: float = field(default=math.inf)
    max: float = field(default=-math.inf)
    sum: float = 0.0

    @classmethod
    def from_array(cls, arr: np.ndarray, null_mask: np.ndarray | None = None) -> "Moments":
        """Vectorized single-pass moments of one batch column."""
        if null_mask is not None and null_mask.any():
            nulls = int(null_mask.sum())
            arr = arr[~null_mask]
        else:
            nulls = 0
        arr = np.asarray(arr, dtype=np.float64)
        finite = arr[np.isfinite(arr)] if arr.size and not np.isfinite(arr).all() else arr
        n = int(arr.size)
        if n == 0:
            return cls(null_count=nulls)
        mean = float(arr.mean())
        m2 = float(((arr - mean) ** 2).sum())
        mn = float(finite.min()) if finite.size else math.inf
        mx = float(finite.max()) if finite.size else -math.inf
        return cls(count=n, null_count=nulls, mean=mean, m2=m2, min=mn, max=mx, sum=float(arr.sum()))

    def merge(self, other: "Moments") -> "Moments":
        """Associative combine (Chan's parallel update)."""
        if other.count == 0:
            return Moments(self.count, self.null_count + other.null_count, self.mean,
                           self.m2, self.min, self.max, self.sum)
        if self.count == 0:
            return Moments(other.count, self.null_count + other.null_count, other.mean,
                           other.m2, other.min, other.max, other.sum)
        n = self.count + other.count
        delta = other.mean - self.mean
        mean = self.mean + delta * other.count / n
        m2 = self.m2 + other.m2 + delta * delta * self.count * other.count / n
        return Moments(
            count=n,
            null_count=self.null_count + other.null_count,
            mean=mean,
            m2=m2,
            min=min(self.min, other.min),
            max=max(self.max, other.max),
            sum=self.sum + other.sum,
        )

    @property
    def variance(self) -> float:
        """Population variance (matches SQL ``stddev_pop``/numpy ``std`` default)."""
        return self.m2 / self.count if self.count else float("nan")

    @property
    def std(self) -> float:
        return math.sqrt(self.variance) if self.count else float("nan")

    @property
    def null_rate(self) -> float:
        total = self.count + self.null_count
        return self.null_count / total if total else 0.0

    def to_dict(self) -> dict:
        return {
            "count": self.count, "null_count": self.null_count, "mean": self.mean,
            "m2": self.m2, "min": self.min, "max": self.max, "sum": self.sum,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Moments":
        return cls(**{k: d[k] for k in ("count", "null_count", "mean", "m2", "min", "max", "sum")})


@dataclass
class HigherMoments:
    """Third/fourth central moments in mergeable form (Pébay 2008
    pairwise-update formulas — the M3/M4 extension of Chan's parallel
    variance above). Exposes SQL/pandas ADJUSTED sample skewness (G1)
    and excess kurtosis (G2), which DuckDB's skewness()/kurtosis() and
    pandas .skew()/.kurt() both implement."""

    count: int = 0
    mean: float = 0.0
    m2: float = 0.0
    m3: float = 0.0
    m4: float = 0.0

    @classmethod
    def from_array(cls, arr: np.ndarray) -> "HigherMoments":
        arr = np.asarray(arr, dtype=np.float64)
        arr = arr[np.isfinite(arr)]
        n = int(arr.size)
        if n == 0:
            return cls()
        mean = float(arr.mean())
        d = arr - mean
        d2 = d * d
        return cls(count=n, mean=mean, m2=float(d2.sum()),
                   m3=float((d2 * d).sum()), m4=float((d2 * d2).sum()))

    def merge(self, other: "HigherMoments") -> "HigherMoments":
        na, nb = self.count, other.count
        if nb == 0:
            return HigherMoments(na, self.mean, self.m2, self.m3, self.m4)
        if na == 0:
            return HigherMoments(nb, other.mean, other.m2, other.m3,
                                 other.m4)
        n = na + nb
        d = other.mean - self.mean
        d2, d3, d4 = d * d, d ** 3, d ** 4
        mean = self.mean + d * nb / n
        m2 = self.m2 + other.m2 + d2 * na * nb / n
        m3 = (self.m3 + other.m3
              + d3 * na * nb * (na - nb) / (n * n)
              + 3.0 * d * (na * other.m2 - nb * self.m2) / n)
        m4 = (self.m4 + other.m4
              + d4 * na * nb * (na * na - na * nb + nb * nb) / (n ** 3)
              + 6.0 * d2 * (na * na * other.m2 + nb * nb * self.m2) / (n * n)
              + 4.0 * d * (na * other.m3 - nb * self.m3) / n)
        return HigherMoments(n, mean, m2, m3, m4)

    @property
    def skewness(self) -> float:
        """Adjusted sample skewness G1 (DuckDB skewness / pandas skew)."""
        n = self.count
        if n < 3 or self.m2 <= 0:
            return float("nan")
        g1 = (self.m3 / n) / (self.m2 / n) ** 1.5
        return g1 * math.sqrt(n * (n - 1.0)) / (n - 2.0)

    @property
    def kurtosis(self) -> float:
        """Adjusted sample excess kurtosis G2 (DuckDB kurtosis /
        pandas kurt)."""
        n = self.count
        if n < 4 or self.m2 <= 0:
            return float("nan")
        g2 = n * self.m4 / (self.m2 * self.m2) - 3.0
        return ((n + 1.0) * g2 + 6.0) * (n - 1.0) / ((n - 2.0) * (n - 3.0))

    def to_dict(self) -> dict:
        return {"count": self.count, "mean": self.mean, "m2": self.m2,
                "m3": self.m3, "m4": self.m4}

    @classmethod
    def from_dict(cls, d: dict) -> "HigherMoments":
        return cls(**{k: d[k] for k in ("count", "mean", "m2", "m3", "m4")})
