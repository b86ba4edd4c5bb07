"""Partitioned, resumable validated-row output.

``write_validated`` splits the stream into pass rows and violation rows
(per the suite's row checks), stamps the content-derived partition id,
and writes hive-partitioned parquet — one directory per pid, never one
giant file — so a re-run can skip finished partitions and downstream
consumers can prune by pid. The wide ``content`` column travels exactly
once (map -> write); nothing is collected to the driver."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..checks.suite import CheckSuite
from ..state import hash64

__all__ = ["write_validated", "write_jsonl_sharded",
           "write_range_partitioned", "compact_parquet"]


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


def write_jsonl_sharded(ds, out_dir: str, *, shard_col: str | None = None,
                        num_shards: int = 64) -> int:
    """JSONL export for training-loader interchange: sharded
    ``{out_dir}/shard-N/part-*.jsonl`` directories (never one giant
    file), sharded on ``hash64(shard_col) % num_shards`` when a column
    is given — content-derived, so a re-run lands every row in the same
    shard dir — or on Ray's block layout otherwise. Each block task
    appends its rows to its shards directly (streaming write, zero
    shuffle, nothing collects to the driver); the ``shard`` value is
    also a column in each row. Returns the row count written.
    Parquet is the scan-path format (``write_validated``); JSONL exists
    because tokenizer/loader toolchains commonly want it."""
    import os
    import uuid

    def write_block(batch: pa.Table) -> pa.Table:
        if shard_col is None:
            shard = np.zeros(batch.num_rows, np.int32)
        else:
            shard = (hash64(batch.column(shard_col))
                     % np.uint64(num_shards)).astype(np.int32)
        batch = batch.append_column("shard", pa.array(shard, pa.int32()))
        for s in np.unique(shard):
            sub = batch.filter(pa.array(shard == s))
            d = os.path.join(out_dir, f"shard-{int(s)}")
            os.makedirs(d, exist_ok=True)
            sub.to_pandas().to_json(
                os.path.join(d, f"part-{uuid.uuid4().hex}.jsonl"),
                orient="records", lines=True)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    counts = ds.map_batches(write_block, batch_format="pyarrow",
                            batch_size=None).take_all()
    return int(sum(r["n"] for r in counts))


def write_range_partitioned(ds, out_dir: str, *, col: str, k: int = 16,
                            bucket_col: str = "bucket_id"):
    """Range-partitioned parquet write: stamp every row with its
    equi-depth bucket over ``col`` (``quantiles.equidepth_buckets`` —
    histogram-combiner fit, never a global sort) and hive-partition the
    output by bucket. The result is k balanced directories with
    DISJOINT value ranges, so a failed run resumes per bucket and
    downstream range scans prune whole directories. Null values land
    in their own ``bucket_id=-1`` partition. Returns the bucket count
    written."""
    from .quantiles import equidepth_buckets

    stamped = equidepth_buckets(ds, col, k=k, out_col=bucket_col)

    def null_bucket(batch: pa.Table) -> pa.Table:
        b = pc.fill_null(batch.column(bucket_col), -1)
        return batch.set_column(batch.schema.get_field_index(bucket_col),
                                bucket_col, b)

    out = stamped.map_batches(null_bucket, batch_format="pyarrow",
                              batch_size=None).materialize()
    out.write_parquet(out_dir, partition_cols=[bucket_col])

    # _manifest.json: bucket -> (rows, value min/max) so resume tooling
    # can skip finished buckets and range scans can prune without
    # touching parquet footers. The manifest rows come from a combiner
    # over the already-materialized stamped data (k-sized result).
    def mpartial(batch: pa.Table) -> pa.Table:
        t = pa.table({bucket_col: batch.column(bucket_col),
                      "v": batch.column(col).cast(pa.float64())})
        g = t.group_by([bucket_col]).aggregate(
            [([], "count_all"), ("v", "min"), ("v", "max")])
        return pa.table({bucket_col: g.column(bucket_col),
                         "rows": g.column("count_all").cast(pa.int64()),
                         "lo": g.column("v_min"), "hi": g.column("v_max")})

    m = out.map_batches(mpartial, batch_format="pyarrow",
                        batch_size=None).to_pandas()
    if bucket_col not in m.columns:    # empty input: no partials at all
        manifest = {}
    else:
        agg = m.groupby(bucket_col).agg(rows=("rows", "sum"),
                                        lo=("lo", "min"),
                                        hi=("hi", "max")).sort_index()
        manifest = {str(int(b)): {"rows": int(r.rows),
                                  "lo": None if pd.isna(r.lo) else float(r.lo),
                                  "hi": None if pd.isna(r.hi) else float(r.hi)}
                    for b, r in agg.iterrows()}
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)   # an empty write creates no dir
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump({"col": col, "k": k, "buckets": manifest}, f, indent=1)
    return k


def compact_parquet(in_dir: str, out_dir: str, *,
                    target_rows_per_file: int = 1_000_000) -> int:
    """Small-file compaction: re-write a parquet directory (e.g. the
    output of a many-task run) into files of ~``target_rows_per_file``
    rows — the maintenance pass that keeps downstream scan task counts
    sane after a wide job emits thousands of KB-sized files. Streaming
    read -> repartition(target_num_rows_per_block) -> write; the data
    never collects on the driver. Returns the row count written."""
    import math

    import ray.data

    n = ray.data.read_parquet(in_dir).count()
    if n == 0:
        return 0
    # explicit block count: repartition(target_num_rows_per_block=...)
    # only SPLITS oversized blocks, it does not coalesce small ones
    ds = ray.data.read_parquet(in_dir).repartition(
        max(1, math.ceil(n / target_rows_per_file)))
    ds.write_parquet(out_dir)
    return n
