"""Partitioned, resumable validated-row output.

``write_validated`` splits the stream into pass rows and violation rows
(per the suite's row checks), stamps the content-derived partition id,
and writes hive-partitioned parquet — one directory per pid, never one
giant file — so a re-run can skip finished partitions and downstream
consumers can prune by pid. The wide ``content`` column travels exactly
once (map -> write); nothing is collected to the driver."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..checks.suite import CheckSuite
from ..state import hash64

__all__ = ["write_validated"]


def write_validated(ds, suite: CheckSuite, out_dir: str, *,
                    partition_col: str = "repo", num_partitions: int = 64,
                    drop_violations: bool = True):
    """Write rows that pass every row check to ``{out_dir}/pass/pid=*/``
    and (optionally) failing rows to ``{out_dir}/violations/pid=*/``.
    Returns (n_pass, n_violations)."""
    checks = list(suite.row_checks)

    def stamp(batch: pa.Table) -> pa.Table:
        pid = (hash64(batch.column(partition_col)) % np.uint64(num_partitions)) \
            .astype(np.int32)
        bad = np.zeros(batch.num_rows, dtype=bool)
        for chk in checks:
            bad |= np.asarray(chk.mask(batch).to_numpy(zero_copy_only=False),
                              dtype=bool)
        batch = batch.append_column("pid", pa.array(pid, pa.int32()))
        return batch.append_column("__viol__", pa.array(bad))

    stamped = ds.map_batches(stamp, batch_format="pyarrow", batch_size=None)

    def split(keep_violations: bool):
        def fn(b: pa.Table) -> pa.Table:
            m = b.column("__viol__")
            if not keep_violations:
                m = pc.invert(m)
            return b.filter(m).drop_columns(["__viol__"])
        return fn

    passing = stamped.map_batches(split(False), batch_format="pyarrow",
                                  batch_size=None)
    passing.write_parquet(f"{out_dir}/pass", partition_cols=["pid"])
    n_viol = 0
    if not drop_violations:
        viol = stamped.map_batches(split(True), batch_format="pyarrow",
                                   batch_size=None)
        viol.write_parquet(f"{out_dir}/violations", partition_cols=["pid"])
        import ray.data

        n_viol = ray.data.read_parquet(f"{out_dir}/violations").count()
    import ray.data

    n_pass = ray.data.read_parquet(f"{out_dir}/pass").count()
    return n_pass, n_viol
