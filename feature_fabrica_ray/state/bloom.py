"""Vectorized Bloom filter — the broadcast structure for referential
checks whose parent key set no longer fits as a plain broadcast set
(SURVEY.md §2.4 scale path).

Size: m bits for n keys at false-positive rate p: m = -n ln p / (ln 2)^2;
k = (m/n) ln 2 hash functions derived from one base hash via
Carter-Wegman remapping (state/hashing.hash64_multi) — build and probe
are both pure numpy over the whole column, no Python loop per row.

A false positive makes an orphan row pass the membership test (a missed
violation) with probability p; choose p against the expected violation
rate. False negatives are impossible — rows flagged as orphans truly are.
"""

from __future__ import annotations

import math

import numpy as np

from .hashing import hash64, hash64_multi

__all__ = ["BloomFilter"]


class BloomFilter:
    __slots__ = ("m", "k", "bits", "seed")

    def __init__(self, n_keys: int, fp_rate: float = 1e-4, seed: int = 11,
                 bits: np.ndarray | None = None, m: int | None = None,
                 k: int | None = None):
        if m is None:
            m = max(64, int(-n_keys * math.log(fp_rate) / (math.log(2) ** 2)))
            m = (m + 63) // 64 * 64
        if k is None:
            k = max(1, round(m / max(n_keys, 1) * math.log(2)))
        self.m = m
        self.k = k
        self.seed = seed
        self.bits = bits if bits is not None else np.zeros(m // 64, np.uint64)

    def _positions(self, values) -> np.ndarray:
        base = hash64(values, seed=self.seed)
        return (hash64_multi(base, self.k, seed=self.seed + 1)
                % np.uint64(self.m))                       # (k, n)

    def add(self, values) -> "BloomFilter":
        pos = self._positions(values).ravel()
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        np.bitwise_or.at(self.bits, word.astype(np.int64),
                         np.uint64(1) << bit)
        return self

    def contains(self, values) -> np.ndarray:
        """Boolean mask: True = probably present; False = definitely not."""
        pos = self._positions(values)                       # (k, n)
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        hits = (self.bits[word.astype(np.int64)]
                >> bit) & np.uint64(1)
        return hits.all(axis=0)

    # -- serialization (broadcast via ray.put / closures) -------------------
    def to_bytes(self) -> bytes:
        head = np.array([self.m, self.k, self.seed], np.int64)
        return head.tobytes() + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomFilter":
        m, k, seed = np.frombuffer(b[:24], np.int64)
        bits = np.frombuffer(b[24:], np.uint64).copy()
        return cls(0, seed=int(seed), bits=bits, m=int(m), k=int(k))
