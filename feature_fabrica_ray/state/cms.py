"""Count-Min sketch (Cormode & Muthukrishnan 2005): a fixed-size
(depth x width) counter matrix answering point frequency queries with a
one-sided error bound. The mergeable frequency companion to the
SpaceSaving top-k sketch: SpaceSaving keeps the *identities* of the
heaviest values, a CMS answers "how often did THIS value occur" for
ANY value — without storing values at all.

Guarantees (standard CMS, depth d rows, width w columns):
- ``estimate(v) >= true count`` always (never undercounts);
- ``estimate(v) <= true count + eps * N`` with probability
  ``1 - (1/2)^d`` where ``eps = e / w`` (e ~ 2.718) and N is the total
  count folded in;
- merging is exact element-wise matrix addition: commutative,
  associative, and lossless w.r.t. the bound — the property that makes
  it a per-block combiner state (KB-sized rows leave each block, like
  the HLL/Bloom partials).

Vectorized: ``add_counts`` folds an entire (values, counts) partial in
d bucketed ``np.add.at`` scatters over xxhash-style row-seeded 64-bit
hashes — no per-row Python in the hot path.
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

from .hashing import hash64

__all__ = ["CountMin"]


class CountMin:
    __slots__ = ("depth", "width", "table", "n")

    def __init__(self, depth: int = 4, width: int = 2048):
        if depth < 1 or width < 1:
            raise ValueError(f"depth/width must be >= 1, got "
                             f"{depth}x{width}")
        self.depth = depth
        self.width = width
        self.table = np.zeros((depth, width), np.int64)
        self.n = 0

    def _rows(self, values) -> np.ndarray:
        """(depth, n) bucket indices: one row-seeded hash per depth."""
        if not isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = pa.array(values)
        return np.stack([
            (hash64(values, seed=row) % np.uint64(self.width))
            .astype(np.int64)
            for row in range(self.depth)])

    def add_counts(self, values, counts) -> "CountMin":
        """Fold (value, count) pairs — e.g. a block's exact group-by
        partial — into the sketch. Null values are ignored."""
        counts = np.asarray(counts, np.int64)
        if not isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = pa.array(values)
        valid = ~np.asarray(values.is_null())
        if not valid.all():
            values = values.filter(pa.array(valid))
            counts = counts[valid]
        if len(values) == 0:
            return self
        idx = self._rows(values)
        for row in range(self.depth):
            np.add.at(self.table[row], idx[row], counts)
        self.n += int(counts.sum())
        return self

    def estimate(self, value) -> int:
        """Point frequency estimate: min over the depth rows —
        >= true count, <= true count + (e/width)*n w.h.p."""
        idx = self._rows([value])[:, 0]
        return int(self.table[np.arange(self.depth), idx].min())

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("CountMin shape mismatch: "
                             f"{self.depth}x{self.width} vs "
                             f"{other.depth}x{other.width}")
        self.table += other.table
        self.n += other.n
        return self

    def error_bound(self) -> float:
        """eps * N: the additive overcount bound (per query, w.h.p.)."""
        return float(np.e / self.width * self.n)

    def to_bytes(self) -> bytes:
        return pickle.dumps({"depth": self.depth, "width": self.width,
                             "table": self.table, "n": self.n})

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMin":
        d = pickle.loads(b)
        s = cls(d["depth"], d["width"])
        s.table = d["table"]
        s.n = d["n"]
        return s
