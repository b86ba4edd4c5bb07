"""End-to-end validation-engine example over the synthetic source-code
table: declarative suite (row checks incl. a scoped + a warn-severity
compare check, uniqueness, referential, stats) -> checkpointed sharded
run with resume -> per-segment triage (stats, outliers, drift) on the
failing segments.

Run: python examples/validation_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

from feature_fabrica_ray.checks import CheckSuite
from feature_fabrica_ray.pipelines import (grouped_stats, run_suite,
                                           segment_drift, validate_resumable)
from feature_fabrica_ray.pipelines.checkpoint import codetable_shards
from feature_fabrica_ray.sources import read_codetable, read_repos

SUITE = """
checks:
  - {type: schema, columns: {repo: string, path: string, commit: string,
                             lang: string, content: string}}
  - {type: not_null, column: lang}
  - {type: min_length, column: content, min_length: 1}
  - {type: regex, column: commit, pattern: "[0-9a-f]{32}"}
  - {type: min_length, column: content, min_length: 8, name: en_content_min,
     where: {column: lang, op: ==, value: en}, max_violation_rate: 0.01}
  - {type: unique, columns: [repo, path, commit]}
  - {type: referential, column: repo, parent: repos, parent_column: repo}
  - {type: stats, column: repo, numeric: false, distinct: true}
"""


def main(sf_dir: str, out_dir: str) -> None:
    suite = CheckSuite(SUITE)

    # 1. one-shot run: fused single pass + concurrent uniqueness shuffle
    res = run_suite(read_codetable(sf_dir), suite,
                    parents={"repos": read_repos(sf_dir)}, num_partitions=8)
    print("== global verdicts ==")
    print(res.global_verdicts().to_string(index=False))
    print("partition skew:", res.partition_skew())

    # 2. the same suite, sharded + checkpointed: rerunning skips every
    # shard whose _SUCCESS exists; verdicts merge exactly
    shards = codetable_shards(sf_dir, n_shards=4)
    out = validate_resumable(shards, CheckSuite(SUITE),
                             os.path.join(out_dir, "ckpt"),
                             parents={"repos": read_repos(sf_dir)},
                             num_partitions=8)
    print(f"sharded: completed={out['completed']} skipped={out['skipped']}")

    # 3. triage: WHICH segment is broken — per-lang null/size stats and
    # drift of content length vs the full-table baseline
    import pyarrow as pa
    import pyarrow.compute as pc

    with_size = read_codetable(sf_dir).map_batches(
        lambda b: b.append_column(
            "size_bytes", pc.utf8_length(b.column("content")).cast(pa.int64())),
        batch_format="pyarrow", batch_size=None)
    print("== per-lang stats ==")
    print(grouped_stats(with_size, "lang", "size_bytes").to_string(index=False))
    en_only = with_size.filter(expr="lang == 'en'")
    print("== drift of en-only vs all (per-lang) ==")
    print(segment_drift(en_only, "lang", "size_bytes", with_size,
                        threshold=0.1).to_string(index=False))


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fabrica_validation"
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        main(sf, out)
    finally:
        ray.shutdown()
