"""Checkpoint/resume semantics (north rule): sharded == unsharded,
resume skips committed shards, digests xor-merge exactly."""

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from feature_fabrica_ray.checks import CheckSuite
from feature_fabrica_ray.pipelines import (codetable_shards, merge_results,
                                           run_suite, validate_resumable)
from feature_fabrica_ray.sources import read_codetable

SF = "/root/testdata/sf0.001"

SUITE = CheckSuite("""
checks:
  - {type: not_null, column: lang}
  - {type: min_length, column: content, min_length: 1}
  - {type: unique, columns: [repo, path, commit]}
""")


def _unsharded(ray_session):
    ds = read_codetable(SF).map_batches(
        lambda b: b.append_column(
            "size_bytes", pc.utf8_length(b.column("content")).cast(pa.int64())),
        batch_format="pyarrow", batch_size=None)
    return run_suite(ds, SUITE, num_partitions=8)


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "ckpt")


def _g(res, check):
    g = res.verdicts[res.verdicts["pid"] == -1].set_index("check")
    return int(g.loc[check, "n_violations"])


def test_sharded_equals_unsharded(ray_session, out_dir):
    full = _unsharded(ray_session)
    shards = codetable_shards(SF, n_shards=3)
    out = validate_resumable(shards, SUITE, out_dir, num_partitions=8)
    assert out["skipped"] == []
    merged = out["result"]
    assert merged.n_rows == full.n_rows
    for chk in ["not_null:lang", "min_length:content", "unique:repo+path+commit"]:
        assert _g(merged, chk) == _g(full, chk)
    # per-pid xor digests merge to the same values as the single pass
    assert merged.digests == full.digests
    assert len(merged.violations) == len(full.violations)


def test_resume_skips_completed(ray_session, out_dir):
    shards = codetable_shards(SF, n_shards=3)
    first = validate_resumable(shards, SUITE, out_dir, num_partitions=8)
    assert sorted(first["completed"]) == ["0000", "0001", "0002"]
    # simulate a crash on shard 0001: wipe its commit marker
    os.remove(os.path.join(out_dir, "shard=0001", "_SUCCESS"))
    second = validate_resumable(shards, SUITE, out_dir, num_partitions=8)
    assert second["completed"] == ["0001"]
    assert sorted(second["skipped"]) == ["0000", "0002"]
    assert second["result"].n_rows == first["result"].n_rows
    assert second["result"].digests == first["result"].digests


def test_merge_ignores_uncommitted_shards(ray_session, out_dir):
    shards = codetable_shards(SF, n_shards=2)
    validate_resumable(shards, SUITE, out_dir, num_partitions=8)
    # a half-written shard dir without _SUCCESS must not poison the merge
    bad = os.path.join(out_dir, "shard=9999")
    os.makedirs(bad)
    pd.DataFrame({"x": [1]}).to_parquet(os.path.join(bad, "verdicts.parquet"))
    merged = merge_results(out_dir)
    assert merged.n_rows == 505


def test_lineage_records_written(ray_session, out_dir):
    import json

    shards = codetable_shards(SF, n_shards=2)
    validate_resumable(shards, SUITE, out_dir, num_partitions=8)
    with open(os.path.join(out_dir, "shard=0000", "lineage.json")) as f:
        lin = json.load(f)
    assert lin["shard"] == "0000"
    assert lin["n_rows"] > 0
    assert lin["wall_s"] > 0
    assert lin["digests"]          # per-pid xor digests present
    assert "unique:repo+path+commit" in lin["checks"]


def test_write_validated_partitioned(ray_session, tmp_path):
    import pyarrow.parquet  # noqa: F401
    from feature_fabrica_ray.pipelines import write_validated

    suite2 = CheckSuite("""
checks:
  - {type: not_null, column: lang}
  - {type: min_length, column: content, min_length: 1}
""")
    out = str(tmp_path / "out")
    n_pass, n_viol = write_validated(read_codetable(SF), suite2, out,
                                     num_partitions=4, drop_violations=False)
    assert n_pass + n_viol == 505
    assert n_viol == 4          # 3 null-lang + 1 empty-content at sf0.001
    # hive-partitioned layout: one directory per pid
    pids = sorted(p.name for p in (tmp_path / "out" / "pass").iterdir())
    assert all(p.startswith("pid=") for p in pids) and len(pids) >= 2
    # per-row sha256 invariant survives the write
    import duckdb
    con = duckdb.connect()
    got = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/pass/*/*.parquet') "
        f"WHERE sha256(content) <> content_sha256").fetchone()[0]
    assert got == 0


def test_custom_row_check_registration(ray_session):
    import pyarrow.compute as pc
    from feature_fabrica_ray.checks.row_checks import RowCheck

    class EvenLengthCheck(RowCheck):
        _type_ = "even_length"

        def mask(self, batch):
            return pc.equal(pc.bit_wise_and(
                pc.utf8_length(self._col(batch)), 1), 1)

    suite3 = CheckSuite("checks:\n  - {type: even_length, column: lang}\n")
    res = run_suite(read_codetable(SF, with_sha256=False), suite3,
                    num_partitions=4, key_columns=["repo", "path", "commit"])
    g = res.global_verdicts().set_index("check")
    # lang codes are 2 chars (even) except nulls; null -> mask null -> ?
    assert "even_length:lang" in g.index


def test_sharded_stats_merge_exact(ray_session, out_dir):
    """Global stats rebuilt from per-shard sketch state match a single
    unsharded pass: moments exactly, HLL registers exactly (max-merge is
    associative), t-digest quantiles within rank tolerance."""
    suite_s = CheckSuite("""
checks:
  - {type: stats, column: size_bytes, quantiles: [0.5, 0.95], distinct: true}
  - {type: stats, column: repo, numeric: false, distinct: true}
""")
    full = run_suite(_input_wsize(), suite_s, num_partitions=8)
    shards = codetable_shards(SF, n_shards=3)
    out = validate_resumable(shards, suite_s, out_dir, num_partitions=8)
    ms = out["result"].stats.set_index("column")
    fs = full.stats.set_index("column")
    for col in ("size_bytes", "repo"):
        assert ms.loc[col, "count"] == fs.loc[col, "count"]
        assert ms.loc[col, "distinct_est"] == pytest.approx(
            fs.loc[col, "distinct_est"])      # HLL merge: exact registers
    assert ms.loc["size_bytes", "mean"] == pytest.approx(
        fs.loc["size_bytes", "mean"], rel=1e-12)
    assert ms.loc["size_bytes", "sum"] == fs.loc["size_bytes", "sum"]
    assert ms.loc["size_bytes", "q0.5"] == pytest.approx(
        fs.loc["size_bytes", "q0.5"], rel=0.05)


def _input_wsize():
    ds = read_codetable(SF)
    return ds.map_batches(
        lambda b: b.append_column(
            "size_bytes", pc.utf8_length(b.column("content")).cast(pa.int64())),
        batch_format="pyarrow", batch_size=None)


def test_merge_drift_and_threshold_verdicts(ray_session, out_dir):
    """merge_results must (a) recompute the drift metric GLOBALLY from
    merged sketches and fail a drift check that drifted (a drift failure
    carries n_violations=0, invisible to a count rule), and (b) apply each
    check's max_violation_rate to the merged rate, not zero tolerance."""
    from feature_fabrica_ray.pipelines import bind_baselines, compute_baseline
    from feature_fabrica_ray.state import hash64

    def base_input():
        return read_codetable(SF).map_batches(
            lambda b: b.append_column(
                "size_bytes", pc.utf8_length(b.column("content")).cast(pa.int64())),
            batch_format="pyarrow", batch_size=None)

    def shifted_input():
        return base_input().map_batches(
            lambda b: b.set_column(
                b.column_names.index("size_bytes"), "size_bytes",
                pc.multiply(b.column("size_bytes"), 3)),
            batch_format="pyarrow", batch_size=None)

    suite = CheckSuite("""
checks:
  - {type: drift, column: size_bytes, method: psi, threshold: 0.1}
  - {type: min_length, column: content, min_length: 1, max_violation_rate: 0.5}
""")
    baselines = compute_baseline(base_input(), suite.drift_checks)
    bind_baselines(suite, baselines)

    def make_shard(k, n=2):
        def build():
            def f(b):
                import numpy as np
                h = hash64(b.column("path")) % np.uint64(n)
                return b.filter(pa.array(h == np.uint64(k)))
            return shifted_input().map_batches(f, batch_format="pyarrow",
                                               batch_size=None)
        return build

    shards = {f"{k}": make_shard(k) for k in range(2)}
    merged = validate_resumable(shards, suite, out_dir, num_partitions=8)["result"]
    g = merged[merged["pid"] == -1].set_index("check") \
        if isinstance(merged, pd.DataFrame) else \
        merged.verdicts[merged.verdicts["pid"] == -1].set_index("check")

    # drift failed in every shard -> merged must be FAILED with the metric
    # recomputed globally (== the unsharded metric, exactly: same edges)
    full = run_suite(shifted_input(), suite, num_partitions=8)
    gf = full.global_verdicts().set_index("check")
    assert not bool(g.loc["drift:size_bytes", "passed"])
    assert g.loc["drift:size_bytes", "metric"] == pytest.approx(
        gf.loc["drift:size_bytes", "metric"], rel=1e-12)

    # min_length HAS violations but the 0.5 threshold holds on the merged
    # rate -> merged verdict is PASSED (not zero-tolerance)
    assert int(g.loc["min_length:content", "n_violations"]) > 0
    assert bool(g.loc["min_length:content", "passed"])


def test_parallel_shards_equal_sequential(ray_session, out_dir):
    """max_parallel_shards=3 produces exactly the sequential result
    (independent shard dirs + atomic commits make order irrelevant)."""
    shards = codetable_shards(SF, n_shards=3)
    seq = validate_resumable(shards, SUITE, out_dir, num_partitions=8)["result"]
    par_dir = out_dir + "_par"
    par = validate_resumable(codetable_shards(SF, n_shards=3), SUITE, par_dir,
                             num_partitions=8,
                             max_parallel_shards=3)["result"]
    assert par.n_rows == seq.n_rows
    assert par.digests == seq.digests
    a = seq.verdicts.sort_values(["check", "pid"]).reset_index(drop=True)
    b = par.verdicts.sort_values(["check", "pid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_merge_quantile_bound_from_merged_digest(ray_session, out_dir):
    """Sharded quantile_bound verdicts must come from the MERGED t-digest:
    shard 1 holds the small half and shard 2 the large half of the data,
    so each shard's own p90 is far from the global p90 — the merged
    verdict must match the unsharded run's metric and pass/fail."""
    from feature_fabrica_ray.state import hash64

    suite_yaml = """
checks:
  - {type: quantile_bound, column: size_bytes, q: 0.9, min: 1, name: p90_floor}
  - {type: quantile_bound, column: size_bytes, q: 0.9, max: 2, name: p90_cap}
"""

    def make_shard(k):
        def build():
            def f(b):
                import numpy as np
                sz = pc.utf8_length(b.column("content")).cast(pa.int64())
                b = b.append_column("size_bytes", sz)
                med = 40  # split around a mid value, not row hash
                keep = pc.less(sz, med) if k == 0 else pc.greater_equal(sz, med)
                return b.filter(keep)
            return read_codetable(SF).map_batches(f, batch_format="pyarrow",
                                                  batch_size=None)
        return build

    shards = {f"{k}": make_shard(k) for k in range(2)}
    merged = validate_resumable(shards, CheckSuite(suite_yaml), out_dir,
                                num_partitions=8)["result"]
    full_ds = read_codetable(SF).map_batches(
        lambda b: b.append_column(
            "size_bytes", pc.utf8_length(b.column("content")).cast(pa.int64())),
        batch_format="pyarrow", batch_size=None)
    full = run_suite(full_ds, CheckSuite(suite_yaml), num_partitions=8)
    g = merged.verdicts[merged.verdicts["pid"] == -1].set_index("check")
    gf = full.global_verdicts().set_index("check")
    for name in ("p90_floor", "p90_cap"):
        assert g.loc[name, "metric"] == pytest.approx(
            gf.loc[name, "metric"], rel=0.05)
        assert bool(g.loc[name, "passed"]) == bool(gf.loc[name, "passed"])
    # the global p90 is way above 2 -> cap must FAIL even though neither
    # per-shard estimate is authoritative
    assert not bool(g.loc["p90_cap", "passed"])
    assert bool(g.loc["p90_floor", "passed"])


def test_merge_distinct_bound_not_additive(ray_session, out_dir):
    """Distinct counts do NOT add across shards (the same values recur
    in every shard): the merged distinct_bound verdict must equal the
    unsharded one, not the per-shard sum. The codetable's ~38 repos all
    appear in both path-hash shards, so summing per-shard estimates
    (~76) would break the max bound that the true merged count (~38)
    satisfies."""
    suite_yaml = """
checks:
  - {type: distinct_bound, column: repo, min: 10, max: 60, name: repo_card}
"""
    shards = codetable_shards(SF, n_shards=2)
    merged = validate_resumable(shards, CheckSuite(suite_yaml), out_dir,
                                num_partitions=8)["result"]
    full = run_suite(read_codetable(SF), CheckSuite(suite_yaml),
                     num_partitions=8)
    g = merged.verdicts[merged.verdicts["pid"] == -1].set_index("check")
    gf = full.global_verdicts().set_index("check")
    assert g.loc["repo_card", "metric"] == pytest.approx(
        gf.loc["repo_card", "metric"], rel=1e-9)
    assert bool(g.loc["repo_card", "passed"])
    # and the estimate is the true cardinality, not the per-shard sum
    assert g.loc["repo_card", "metric"] < 60

def test_merge_shape_bound_from_merged_moments(ray_session, out_dir):
    """Sharded shape_bound verdicts must come from the MERGED Pébay
    moments: shard 1 holds the small half and shard 2 the large half,
    so each shard's own skewness is near zero while the global
    distribution is strongly skewed — the merged verdict must equal the
    unsharded run's statistic EXACTLY (the merge is algebraic, not an
    estimate) and reproduce its pass/fail."""
    suite_yaml = """
checks:
  - {type: shape_bound, column: size_bytes, stat: skewness, max: 0.2, name: skew_cap}
  - {type: shape_bound, column: size_bytes, stat: kurtosis, min: -10, name: kurt_floor}
"""

    def make_shard(k):
        def build():
            def f(b):
                sz = pc.utf8_length(b.column("content")).cast(pa.int64())
                b = b.append_column("size_bytes", sz)
                med = 40
                keep = pc.less(sz, med) if k == 0 else pc.greater_equal(sz, med)
                return b.filter(keep)
            return read_codetable(SF).map_batches(f, batch_format="pyarrow",
                                                  batch_size=None)
        return build

    shards = {f"{k}": make_shard(k) for k in range(2)}
    merged = validate_resumable(shards, CheckSuite(suite_yaml), out_dir,
                                num_partitions=8)["result"]
    full_ds = read_codetable(SF).map_batches(
        lambda b: b.append_column(
            "size_bytes", pc.utf8_length(b.column("content")).cast(pa.int64())),
        batch_format="pyarrow", batch_size=None)
    full = run_suite(full_ds, CheckSuite(suite_yaml), num_partitions=8)
    g = merged.verdicts[merged.verdicts["pid"] == -1].set_index("check")
    gf = full.global_verdicts().set_index("check")
    for name in ("skew_cap", "kurt_floor"):
        assert g.loc[name, "metric"] == pytest.approx(
            gf.loc[name, "metric"], rel=1e-9, abs=1e-9)
        assert bool(g.loc[name, "passed"]) == bool(gf.loc[name, "passed"])

def test_merge_top_share_from_merged_sketch(ray_session, out_dir):
    """Sharded top_share_bound verdicts must come from the MERGED
    SpaceSaving sketch + merged counts: each shard is dominated by a
    different lang (share 1.0 locally), while the union is balanced —
    the merged verdict must equal the unsharded run's share exactly
    (k > distinct -> exact sketch)."""
    suite_yaml = """
checks:
  - {type: top_share_bound, column: lang, max_share: 0.8, name: lang_dom}
"""

    def make_shard(k):
        def build():
            def f(b):
                keep = pc.equal(b.column("lang"), "en") if k == 0 \
                    else pc.invert(pc.equal(b.column("lang"), "en"))
                return b.filter(pc.fill_null(keep, k != 0))
            return read_codetable(SF).map_batches(f, batch_format="pyarrow",
                                                  batch_size=None)
        return build

    shards = {f"{k}": make_shard(k) for k in range(2)}
    merged = validate_resumable(shards, CheckSuite(suite_yaml), out_dir,
                                num_partitions=8)["result"]
    full = run_suite(read_codetable(SF), CheckSuite(suite_yaml),
                     num_partitions=8)
    g = merged.verdicts[merged.verdicts["pid"] == -1].set_index("check")
    gf = full.global_verdicts().set_index("check")
    assert g.loc["lang_dom", "metric"] == pytest.approx(
        gf.loc["lang_dom", "metric"], abs=1e-12)
    assert bool(g.loc["lang_dom", "passed"]) == \
        bool(gf.loc["lang_dom", "passed"])


def test_write_jsonl_sharded(ray_session, tmp_path):
    """JSONL sink: shard dirs are content-derived (same rows -> same
    shard across reruns), every row round-trips through read_json."""
    import ray.data

    from feature_fabrica_ray.pipelines import write_jsonl_sharded

    df = pd.DataFrame({"k": [f"r{i}" for i in range(100)],
                       "v": list(range(100))})
    out = str(tmp_path / "jsonl")
    n = write_jsonl_sharded(ray.data.from_pandas(df).repartition(4), out,
                            shard_col="k", num_shards=8)
    assert n == 100
    back = ray.data.read_json(out).to_pandas()
    assert len(back) == 100
    assert sorted(back["v"]) == list(range(100))
    assert back.groupby("k")["shard"].nunique().max() == 1
    import glob
    assert len(glob.glob(f"{out}/shard-*")) > 1


def test_write_range_partitioned_empty_input(ray_session, tmp_path):
    """An empty dataset writes an empty manifest instead of crashing
    on the missing bucket column / missing output directory."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from feature_fabrica_ray.pipelines.writer import write_range_partitioned

    e = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    out = str(tmp_path / "range_empty")
    assert write_range_partitioned(e, out, col="k") == 16
    m = json.load(open(out + "/_manifest.json"))
    assert m["buckets"] == {}
