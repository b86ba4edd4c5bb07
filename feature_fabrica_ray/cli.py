"""CLI entry point — the ``ray job submit`` surface.

    ray job submit -- python -m feature_fabrica_ray.cli validate \
        --input /data/codetable --suite checks.yaml --out /data/validated \
        --shards 64

Subcommands:
    validate   run a check suite over a parquet table; write verdicts,
               violations and (with --write-rows) partitioned pass rows;
               with --shards N the run is checkpointed + resumable.
    transform  run a feature spec over a parquet table; write the result
               as partitioned parquet.

This is the ONLY module in the package that may own a Ray session, and
only when none exists (``ray job submit`` usually provides one)."""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if "--address-auto" in sys.argv else "local",
                 ignore_reinit_error=True)


def cmd_validate(args) -> int:
    import ray.data

    from .checks import CheckSuite
    from .pipelines import run_suite, validate_resumable, write_validated
    from .sources import add_content_sha256, read_parquet_clean

    _ensure_ray()
    with open(args.suite) as f:
        suite = CheckSuite(f.read())

    # --parent repos=/path/repos.parquet, repeatable: the referential
    # checks' parent tables (read pruned at run time)
    parents = {}
    for spec in args.parent or []:
        name, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--parent expects name=path.parquet, got {spec!r}")
        parents[name] = read_parquet_clean(path)

    def build():
        ds = read_parquet_clean(args.input)
        return ds.map_batches(add_content_sha256, batch_format="pyarrow",
                              batch_size=None) if args.sha256 else ds

    if args.shards > 1:
        from .state import hash64

        import numpy as np
        import pyarrow as pa

        def shard_builder(k):
            def b():
                def flt(batch: pa.Table) -> pa.Table:
                    h = hash64(batch.column(args.shard_col)) % np.uint64(args.shards)
                    return batch.filter(pa.array(h == np.uint64(k)))
                return build().map_batches(flt, batch_format="pyarrow",
                                           batch_size=None)
            return b

        shards = {f"{k:04d}": shard_builder(k) for k in range(args.shards)}
        out = validate_resumable(shards, suite, args.out,
                                 parents=parents,
                                 num_partitions=args.partitions,
                                 max_parallel_shards=args.parallel_shards)
        res = out["result"]
        print(json.dumps({"completed": out["completed"],
                          "skipped": out["skipped"],
                          "n_rows": res.n_rows,
                          "passed": res.passed}))  # severity-aware
    else:
        import os

        os.makedirs(args.out, exist_ok=True)
        res = run_suite(build(), suite, parents=parents,
                        num_partitions=args.partitions)
        res.verdicts.to_parquet(f"{args.out}/verdicts.parquet")
        res.violations.to_parquet(f"{args.out}/violations.parquet")
        nv = int(res.verdicts.loc[res.verdicts["pid"] == -1,
                                  "n_violations"].sum())  # global rows only
        print(json.dumps({"n_rows": res.n_rows, "passed": res.passed,
                          "n_violations": nv,
                          "partition_skew": res.partition_skew()}))
    if args.write_rows:
        n_pass, n_viol = write_validated(build(), suite, f"{args.out}/rows",
                                         partition_col=args.shard_col,
                                         num_partitions=args.partitions,
                                         drop_violations=False)
        print(json.dumps({"rows_written": n_pass, "violation_rows": n_viol}))
    return 0


def cmd_transform(args) -> int:
    import ray.data

    from .sources import read_parquet_clean
    from .stages import FeatureEngine

    _ensure_ray()
    with open(args.spec) as f:
        eng = FeatureEngine(f.read())
    ds = read_parquet_clean(args.input)
    if args.lineage:
        # reference log_transformation_chain analogue: per-stage wall
        # time + row count + xor output digest, written as a sidecar
        out, lineage = eng.transform_with_lineage(
            ds, select_groups=args.groups or None)
        lineage.to_json(args.lineage, orient="records")
    else:
        out = eng.transform(ds, select_groups=args.groups or None)
    out.write_parquet(args.out)
    print(json.dumps({"features": eng.feature_names()}))
    return 0


def cmd_curate(args) -> int:
    from .pipelines import curate_corpus
    from .sources import read_parquet_clean

    _ensure_ray()
    ds = read_parquet_clean(args.input,
                            columns=[args.id_col, args.text_col])
    out = curate_corpus(ds, text_col=args.text_col, id_col=args.id_col,
                        min_words=args.min_words,
                        max_tokens=args.max_tokens,
                        context_len=args.context_len,
                        n_shards=args.shards)
    out.write_parquet(args.out)
    import ray.data

    try:
        n = ray.data.read_parquet(args.out).count()
    except FileNotFoundError:     # everything gated out: no files written
        n = 0
    print(json.dumps({"chunks_written": n}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="feature_fabrica_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate")
    v.add_argument("--input", required=True)
    v.add_argument("--suite", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--shards", type=int, default=1)
    v.add_argument("--shard-col", default="path")
    v.add_argument("--partitions", type=int, default=64)
    v.add_argument("--parallel-shards", type=int, default=1)
    v.add_argument("--sha256", action="store_true", default=True)
    v.add_argument("--write-rows", action="store_true")
    v.add_argument("--parent", action="append", metavar="NAME=PATH",
                   help="parent table for referential checks, repeatable")
    v.set_defaults(fn=cmd_validate)

    t = sub.add_parser("transform")
    t.add_argument("--input", required=True)
    t.add_argument("--spec", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--groups", nargs="*")
    t.add_argument("--lineage", help="write per-stage lineage JSON here")
    t.set_defaults(fn=cmd_transform)

    c = sub.add_parser("curate", help="quality-gate, dedup, chunk and "
                       "pack a document corpus into training sequences")
    c.add_argument("--input", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--text-col", default="text")
    c.add_argument("--id-col", default="doc_id")
    c.add_argument("--min-words", type=int, default=10)
    c.add_argument("--max-tokens", type=int, default=128)
    c.add_argument("--context-len", type=int, default=512)
    c.add_argument("--shards", type=int, default=16)
    c.set_defaults(fn=cmd_curate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
