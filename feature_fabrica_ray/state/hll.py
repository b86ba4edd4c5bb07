"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, + small-range
linear counting per the HLL++ recommendation).

Per-block partial: a 2^p byte register array computed fully vectorized from
the 64-bit column hash (see state/hashing.py). Merge = elementwise max —
associative and commutative, so the estimate is invariant to block
partitioning and merge order (required for deterministic verdicts across
parallelism levels). At p=14 the register array is 16 KiB and standard
error ~0.8%; the FIXTURES.md target (rel-err <= 2% on distinct repos) holds
with margin.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash64

__all__ = ["HLL"]


class HLL:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = registers if registers is not None else np.zeros(self.m, dtype=np.uint8)

    # -- build ------------------------------------------------------------
    def add_hashes(self, h: np.ndarray) -> "HLL":
        """Vectorized register update from a uint64 hash array."""
        if h.size == 0:
            return self
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1)  # sentinel bit caps rho at 64-p
        # rho = leading zeros of `rest` + 1, vectorized via float64 exponent
        # trick is unsafe for full 64-bit; use a loop-free bit scan instead:
        rho = np.zeros(h.size, dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        lead = np.zeros(h.size, dtype=np.uint8)
        # binary-search style count of leading zeros (6 vectorized steps)
        for shift in (32, 16, 8, 4, 2, 1):
            s = np.uint64(shift)
            zero_top = (cur >> np.uint64(64 - shift)) == 0
            lead[zero_top] += np.uint8(shift)
            cur[zero_top] = cur[zero_top] << s
        rho = lead + np.uint8(1)
        np.maximum.at(self.registers, idx, rho)
        _ = mask
        return self

    def add_column(self, values, seed: int = 0) -> "HLL":
        return self.add_hashes(hash64(values, seed=seed))

    # -- merge / estimate -------------------------------------------------
    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        return HLL(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        regs = self.registers.astype(np.float64)
        # alpha_m for m >= 128
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / np.sum(np.exp2(-regs))
        zeros = int(np.count_nonzero(self.registers == 0))
        if e <= 2.5 * m and zeros > 0:
            return m * np.log(m / zeros)  # linear counting for small cardinalities
        return float(e)

    # -- serialization (for shipping through Arrow batches) ---------------
    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 14) -> "HLL":
        return cls(p, np.frombuffer(b, dtype=np.uint8).copy())

    @classmethod
    def merge_bytes(cls, blobs, p: int = 14) -> "HLL":
        out = cls(p)
        for b in blobs:
            out.registers = np.maximum(out.registers, np.frombuffer(b, dtype=np.uint8))
        return out
