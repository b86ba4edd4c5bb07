"""Cluster-aware sizing for shuffle stages.

Ray Data's default shuffle parallelism (200 reduce partitions) is sized
for multi-node clusters; on a small cluster it turns every groupby into
hundreds of sub-millisecond reduce tasks whose scheduling overhead
dominates. Every keyed shuffle in this engine asks for
``shuffle_partitions()`` instead: ~2 partitions per CPU, bounded, and
overridable with $FFR_SHUFFLE_PARTITIONS (at true 100 TB scale, set it to
O(total_bytes / 512 MiB) so each reduce partition stays block-sized).
"""

from __future__ import annotations

import os

__all__ = ["shuffle_partitions", "read_blocks"]


def read_blocks() -> int:
    """Target block count for small-file reads whose downstream stages
    EXPAND rows (e.g. the replicated synthetic derive): without an
    explicit override a 3 KB parquet file reads as a handful of blocks
    and caps the whole pipeline's parallelism at that block count, no
    matter how many CPUs the cluster has. ~4 blocks per CPU keeps every
    core fed while staying coarse enough to amortize per-task overhead."""
    env = os.environ.get("FFR_READ_BLOCKS")
    if env:
        return int(env)
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover
        cpus = 8
    return max(16, min(4 * cpus, 512))


def shuffle_partitions() -> int:
    env = os.environ.get("FFR_SHUFFLE_PARTITIONS")
    if env:
        return int(env)
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover
        cpus = 8
    return max(8, min(2 * cpus, 256))
