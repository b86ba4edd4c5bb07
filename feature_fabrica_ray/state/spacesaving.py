"""SpaceSaving heavy-hitters sketch (Metwally et al. 2005) in its
mergeable parallel form (Cafaro et al. 2016): each block summarizes its
EXACT value counts into a k-counter sketch, sketches merge
associatively, and the merged sketch answers "which values occur most,
and how often" with a per-value overestimation bound.

Guarantees (standard SpaceSaving):
- ``est >= true count`` always (never undercounts);
- ``est - err <= true count`` — ``err`` is the per-value upper bound on
  the overcount, accumulated from the evicted-counter minimums of every
  merge the value was absent from;
- any value with true count > n/k is guaranteed to be IN the sketch.

When ``k`` exceeds the true distinct count nothing is ever evicted and
the sketch is EXACT (err == 0 for every value) — the property the
DuckDB oracle checks; the approximate regime is pytest-bounded.

Merge rule: absent values contribute the other sketch's minimum counter
(its maximum possible unseen count) to both est and err, then the union
is pruned back to the top-k counters. Commutative and associative up to
the guarantee bound, so block order and tree-vs-sequential merging both
stay within ``err``.
"""

from __future__ import annotations

import pickle

__all__ = ["SpaceSaving"]


class SpaceSaving:
    __slots__ = ("k", "counts", "errs")

    def __init__(self, k: int = 256):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.k = k
        self.counts: dict = {}
        self.errs: dict = {}

    @property
    def _min(self) -> int:
        """Max possible count of a value NOT in this sketch: the smallest
        retained counter once the sketch has been full (pruned), else 0."""
        if len(self.counts) < self.k:
            return 0
        return min(self.counts.values())

    def add_counts(self, values, counts) -> "SpaceSaving":
        """Fold a batch's EXACT (value, count) pairs in — an exact batch
        is a sketch with err 0 and min 0, so this is merge()."""
        other = SpaceSaving(self.k)
        other.counts = {v: int(c) for v, c in zip(values, counts)}
        other.errs = {v: 0 for v in other.counts}
        # an exact summary is never "full": its absent-value bound is 0
        if len(other.counts) >= self.k:
            other.k = len(other.counts) + 1
        self.merge(other)
        return self

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        ms, mo = self._min, other._min
        union = self.counts.keys() | other.counts.keys()
        counts, errs = {}, {}
        for v in union:
            counts[v] = self.counts.get(v, ms) + other.counts.get(v, mo)
            errs[v] = self.errs.get(v, ms) + other.errs.get(v, mo)
        if len(counts) > self.k:
            keep = sorted(union, key=lambda v: counts[v],
                          reverse=True)[:self.k]
            counts = {v: counts[v] for v in keep}
            errs = {v: errs[v] for v in keep}
        self.counts, self.errs = counts, errs
        return self

    def top(self, n: int = 10) -> list[tuple]:
        """(value, est_count, err) for the n largest estimates,
        deterministic tiebreak on the stringified value."""
        order = sorted(self.counts,
                       key=lambda v: (-self.counts[v], str(v)))[:n]
        return [(v, self.counts[v], self.errs[v]) for v in order]

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.k, self.counts, self.errs), protocol=4)

    @classmethod
    def from_bytes(cls, b: bytes) -> "SpaceSaving":
        k, counts, errs = pickle.loads(b)
        out = cls(k)
        out.counts, out.errs = counts, errs
        return out
