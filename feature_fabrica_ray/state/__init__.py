"""Mergeable partial-aggregate state (sketches) for distributed two-phase
aggregation: compute a small state per Arrow block inside ``map_batches``,
merge associatively (groupby-aggregate or driver-side — states are KB-sized),
then broadcast the result into downstream stages."""

from .bloom import BloomFilter
from .hashing import combine_hashes, hash64, hash64_multi
from .histogram import (CategoricalFreq, NumericHistogram, ks_from_counts,
                        psi_categorical, psi_from_counts)
from .hll import HLL
from .cms import CountMin
from .spacesaving import SpaceSaving
from .tdigest import TDigest
from .vhist import ValueHist
from .welford import HigherMoments, Moments

__all__ = [
    "hash64", "hash64_multi", "combine_hashes", "BloomFilter",
    "Moments", "HigherMoments", "HLL", "TDigest", "ValueHist", "SpaceSaving",
    "CountMin",
    "NumericHistogram", "CategoricalFreq",
    "psi_from_counts", "ks_from_counts", "psi_categorical",
]
