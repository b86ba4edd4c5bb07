"""Mergeable fixed-edge histograms + drift statistics (PSI, KS).

Baseline-vs-current distribution drift (the north rule's drift check) is
computed from histograms because histograms are the mergeable partial:
each block contributes counts over FIXED bin edges (decided once, from the
baseline), merges are exact integer adds, and the final PSI/KS numbers are
therefore bit-identical at every parallelism level — unlike sample-based KS.

Categorical drift uses frequency dicts (merge = counter add) with PSI over
category probabilities.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

__all__ = ["NumericHistogram", "CategoricalFreq", "psi_from_counts", "ks_from_counts"]

_EPS = 1e-6


class NumericHistogram:
    __slots__ = ("edges", "counts", "n_below", "n_above")

    def __init__(self, edges: np.ndarray, counts: np.ndarray | None = None,
                 n_below: int = 0, n_above: int = 0):
        self.edges = np.asarray(edges, dtype=np.float64)
        self.counts = (counts if counts is not None
                       else np.zeros(len(self.edges) - 1, dtype=np.int64))
        self.n_below = n_below
        self.n_above = n_above

    @classmethod
    def equal_width(cls, lo: float, hi: float, bins: int) -> "NumericHistogram":
        if hi <= lo:
            hi = lo + 1.0
        return cls(np.linspace(lo, hi, bins + 1))

    def add(self, arr: np.ndarray) -> "NumericHistogram":
        arr = np.asarray(arr, dtype=np.float64)
        arr = arr[~np.isnan(arr)]
        if arr.size == 0:
            return self
        self.n_below += int((arr < self.edges[0]).sum())
        self.n_above += int((arr > self.edges[-1]).sum())
        inside = arr[(arr >= self.edges[0]) & (arr <= self.edges[-1])]
        c, _ = np.histogram(inside, bins=self.edges)
        self.counts += c
        return self

    def merge(self, other: "NumericHistogram") -> "NumericHistogram":
        return NumericHistogram(self.edges, self.counts + other.counts,
                                self.n_below + other.n_below, self.n_above + other.n_above)

    @property
    def total(self) -> int:
        return int(self.counts.sum() + self.n_below + self.n_above)

    def full_counts(self) -> np.ndarray:
        """Counts including under/overflow buckets (for PSI/KS)."""
        return np.concatenate([[self.n_below], self.counts, [self.n_above]]).astype(np.float64)

    def to_dict(self) -> dict:
        return {"edges": self.edges.tolist(), "counts": self.counts.tolist(),
                "n_below": self.n_below, "n_above": self.n_above}

    @classmethod
    def from_dict(cls, d: dict) -> "NumericHistogram":
        return cls(np.array(d["edges"]), np.array(d["counts"], dtype=np.int64),
                   d["n_below"], d["n_above"])


class CategoricalFreq:
    __slots__ = ("counts",)

    def __init__(self, counts: Counter | None = None):
        self.counts = counts if counts is not None else Counter()

    def add(self, values, value_counts: dict | None = None) -> "CategoricalFreq":
        if value_counts is not None:
            self.counts.update(value_counts)
        else:
            import pandas as pd

            vc = pd.Series(values).value_counts(dropna=False)
            self.counts.update({("\0null" if isinstance(k, float) and np.isnan(k) else k): int(v)
                                for k, v in vc.items()})
        return self

    def merge(self, other: "CategoricalFreq") -> "CategoricalFreq":
        c = Counter(self.counts)
        c.update(other.counts)
        return CategoricalFreq(c)

    def to_dict(self) -> dict:
        return dict(self.counts)

    @classmethod
    def from_dict(cls, d: dict) -> "CategoricalFreq":
        return cls(Counter(d))


def psi_from_counts(expected: np.ndarray, actual: np.ndarray) -> float:
    """Population Stability Index over aligned count vectors.

    Zero-probability buckets are floored at _EPS (standard practice) so the
    statistic is finite; PSI < 0.1 ~ stable, > 0.25 ~ drifted.
    """
    e = np.asarray(expected, dtype=np.float64)
    a = np.asarray(actual, dtype=np.float64)
    ep = np.maximum(e / max(e.sum(), 1.0), _EPS)
    ap = np.maximum(a / max(a.sum(), 1.0), _EPS)
    return float(np.sum((ap - ep) * np.log(ap / ep)))


def ks_from_counts(expected: np.ndarray, actual: np.ndarray) -> float:
    """Two-sample KS statistic approximated on the shared histogram grid:
    max |ECDF_e - ECDF_a| evaluated at bin boundaries. Exact as bins -> inf;
    deterministic for fixed edges."""
    e = np.asarray(expected, dtype=np.float64)
    a = np.asarray(actual, dtype=np.float64)
    ce = np.cumsum(e) / max(e.sum(), 1.0)
    ca = np.cumsum(a) / max(a.sum(), 1.0)
    return float(np.max(np.abs(ce - ca))) if ce.size else 0.0


def psi_categorical(expected: dict, actual: dict) -> float:
    keys = sorted(set(expected) | set(actual), key=repr)
    e = np.array([expected.get(k, 0) for k in keys], dtype=np.float64)
    a = np.array([actual.get(k, 0) for k in keys], dtype=np.float64)
    return psi_from_counts(e, a)


__all__.append("psi_categorical")
