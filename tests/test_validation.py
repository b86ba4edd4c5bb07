"""Validation-suite e2e over the codetable with DuckDB golden counts —
the north rule's verdict/violation semantics (FIXTURES.md F7): planted
defects are found exactly, verdicts are per-partition + global, stats
match SQL, drift triggers on a shifted distribution, and everything is
invariant to input partitioning."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from feature_fabrica_ray.checks import CheckSuite
from feature_fabrica_ray.pipelines import (bind_baselines, compute_baseline,
                                           run_suite)
from feature_fabrica_ray.sources import codetable_cte, read_codetable, read_repos

SF = "/root/testdata/sf0.01"

SUITE_YAML = """
checks:
  - {type: schema, columns: {repo: string, path: string, commit: string,
                             lang: string, content: string}}
  - {type: not_null, column: lang}
  - {type: min_length, column: content, min_length: 1}
  - {type: regex, column: commit, pattern: "[0-9a-f]{32}"}
  - {type: accepted_values, column: lang, values: [en, zh, es, de, fr]}
  - {type: range, column: size_bytes, min: 0, max: 100000}
  - {type: unique, columns: [repo, path, commit]}
  - {type: referential, column: repo, parent: repos, parent_column: repo}
  - {type: stats, column: size_bytes, quantiles: [0.5, 0.95], distinct: false}
  - {type: stats, column: repo, numeric: false, distinct: true}
"""


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return con


def _input_ds():
    return read_codetable(SF).map_batches(
        lambda b: b.append_column(
            "size_bytes", pc.utf8_length(b.column("content")).cast(pa.int64())),
        batch_format="pyarrow")


@pytest.fixture(scope="module")
def result(ray_session):
    suite = CheckSuite(SUITE_YAML)
    return run_suite(_input_ds(), suite, parents={"repos": read_repos(SF)},
                     num_partitions=8)


def _golden(duck, sql):
    return duck.execute(codetable_cte() + sql).fetchone()[0]


def test_null_lang_count(result, duck):
    g = result.global_verdicts().set_index("check")
    exp = _golden(duck, "SELECT count(*) FROM codetable WHERE lang IS NULL")
    assert g.loc["not_null:lang", "n_violations"] == exp
    assert bool(g.loc["not_null:lang", "passed"]) == (exp == 0)


def test_empty_content_count(result, duck):
    g = result.global_verdicts().set_index("check")
    exp = _golden(duck, "SELECT count(*) FROM codetable WHERE length(content) < 1")
    assert g.loc["min_length:content", "n_violations"] == exp


def test_commit_regex_all_pass(result):
    g = result.global_verdicts().set_index("check")
    assert g.loc["regex:commit", "n_violations"] == 0
    assert bool(g.loc["regex:commit", "passed"])


def test_accepted_values(result, duck):
    g = result.global_verdicts().set_index("check")
    exp = _golden(duck, "SELECT count(*) FROM codetable WHERE lang IS NOT NULL "
                        "AND lang NOT IN ('en','zh','es','de','fr')")
    assert g.loc["accepted_values:lang", "n_violations"] == exp


def test_unique_violations_match_sql(result, duck):
    exp = _golden(duck, """
        SELECT count(*) FROM (
          SELECT repo, path, "commit", count(*) AS c FROM codetable
          GROUP BY 1,2,3 HAVING count(*) > 1) d
        JOIN codetable c USING (repo, path, "commit")""")
    # SQL join above counts each dup row once per matching key
    g = result.global_verdicts().set_index("check")
    assert g.loc["unique:repo+path+commit", "n_violations"] == exp
    assert exp > 0  # planted duplicates exist


def test_referential_orphans_match_sql(result, duck):
    exp = _golden(duck, """
        SELECT count(*) FROM codetable c WHERE NOT EXISTS
          (SELECT 1 FROM repos r WHERE r.repo = c.repo)""")
    g = result.global_verdicts().set_index("check")
    assert g.loc["referential:repo", "n_violations"] == exp
    assert exp > 0  # planted orphans exist


def test_stats_match_sql(result, duck):
    row = result.stats.set_index("column").loc["size_bytes"]
    exp = duck.execute(codetable_cte() + """
        SELECT count(size_bytes), avg(size_bytes), stddev_pop(size_bytes),
               min(size_bytes), max(size_bytes)
        FROM (SELECT length(content) AS size_bytes FROM codetable)""").fetchone()
    assert row["count"] == exp[0]
    assert row["mean"] == pytest.approx(exp[1], rel=1e-12)
    assert row["std"] == pytest.approx(exp[2], rel=1e-9)
    assert row["min"] == exp[3] and row["max"] == exp[4]


def test_distinct_repo_estimate(result, duck):
    exp = _golden(duck, "SELECT count(DISTINCT repo) FROM codetable")
    est = result.stats.set_index("column").loc["repo", "distinct_est"]
    assert est == pytest.approx(exp, rel=0.05)


def test_quantiles_rank_error(result, duck):
    df = duck.execute(codetable_cte() +
                      "SELECT length(content) AS sb FROM codetable").df()
    sb = df["sb"].to_numpy(dtype=float)
    row = result.stats.set_index("column").loc["size_bytes"]
    for q in (0.5, 0.95):
        est = row[f"q{q}"]
        rank_err = abs((sb <= est).mean() - q)
        assert rank_err < 0.02, (q, est, rank_err)


def test_per_partition_verdicts_cover_all_rows(result):
    v = result.verdicts
    per_pid = v[(v["check"] == "not_null:lang") & (v["pid"] >= 0)]
    assert per_pid["n_rows"].sum() == result.n_rows
    assert result.n_rows == 505  # codetable rows at sf0.01


def test_partition_invariance(ray_session):
    """Verdicts and violations are identical when the input arrives in a
    different block layout (the N vs 4N determinism requirement)."""
    suite1 = CheckSuite(SUITE_YAML)
    suite2 = CheckSuite(SUITE_YAML)
    r1 = run_suite(_input_ds(), suite1, parents={"repos": read_repos(SF)},
                   num_partitions=8)
    r2 = run_suite(_input_ds().repartition(13), suite2,
                   parents={"repos": read_repos(SF)}, num_partitions=8)
    v1 = r1.verdicts.sort_values(["check", "pid"]).reset_index(drop=True)
    v2 = r2.verdicts.sort_values(["check", "pid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(v1, v2)
    key = ["check", "repo", "path", "commit"]
    a = r1.violations.sort_values(key).reset_index(drop=True)
    b = r2.violations.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[key], b[key])


def test_drift_self_zero_and_shift_fails(ray_session):
    ds = _input_ds()
    suite = CheckSuite("""
checks:
  - {type: drift, column: size_bytes, method: psi, threshold: 0.1}
  - {type: drift, column: lang, method: psi, threshold: 0.1, categorical: true}
""")
    baselines = compute_baseline(ds, suite.drift_checks)
    bind_baselines(suite, baselines)
    r = run_suite(ds, suite, num_partitions=8)
    g = r.global_verdicts().set_index("check")
    assert g.loc["drift:size_bytes", "metric"] == pytest.approx(0.0, abs=1e-12)
    assert bool(g.loc["drift:size_bytes", "passed"])
    assert bool(g.loc["drift:lang", "passed"])

    # shifted data: double the size of python files -> numeric drift fails
    shifted = ds.map_batches(
        lambda b: b.set_column(
            b.column_names.index("size_bytes"), "size_bytes",
            pc.multiply(b.column("size_bytes"), 3)),
        batch_format="pyarrow")
    suite2 = CheckSuite("""
checks:
  - {type: drift, column: size_bytes, method: psi, threshold: 0.1}
""")
    bind_baselines(suite2, baselines)
    r2 = run_suite(shifted, suite2, num_partitions=8)
    g2 = r2.global_verdicts().set_index("check")
    assert g2.loc["drift:size_bytes", "metric"] > 0.5
    assert not bool(g2.loc["drift:size_bytes", "passed"])


def test_schema_check_detects_missing(ray_session):
    suite = CheckSuite("""
checks:
  - {type: schema, columns: {repo: string, nope: string}}
""")
    r = run_suite(_input_ds(), suite, num_partitions=4)
    g = r.global_verdicts().set_index("check")
    assert not bool(g.loc["schema", "passed"])


def test_scoped_check_where_predicate(ray_session, duck):
    """A check with a `where:` scope only applies to in-scope rows: the
    violation-rate denominator is the in-scope count (per pid and
    globally), out-of-scope rows never violate, and the same check
    unscoped sees strictly more rows. Golden via DuckDB."""
    suite = CheckSuite("""
checks:
  - {type: min_length, column: content, min_length: 1, name: en_nonempty,
     where: {column: lang, op: ==, value: en}}
  - {type: min_length, column: content, min_length: 1, name: all_nonempty}
""")
    r = run_suite(_input_ds(), suite, num_partitions=8)
    g = r.global_verdicts().set_index("check")
    n_en = _golden(duck, "SELECT count(*) FROM codetable WHERE lang = 'en'")
    nv_en = _golden(duck, "SELECT count(*) FROM codetable WHERE lang = 'en' "
                          "AND (content IS NULL OR length(content) = 0)")
    n_all = _golden(duck, "SELECT count(*) FROM codetable")
    nv_all = _golden(duck, "SELECT count(*) FROM codetable "
                           "WHERE content IS NULL OR length(content) = 0")
    assert int(g.loc["en_nonempty", "n_rows"]) == n_en
    assert int(g.loc["en_nonempty", "n_violations"]) == nv_en
    assert int(g.loc["all_nonempty", "n_rows"]) == n_all
    assert int(g.loc["all_nonempty", "n_violations"]) == nv_all
    assert n_en < n_all
    # per-pid rows for the scoped check sum to the scoped denominator
    per_pid = r.verdicts[(r.verdicts["check"] == "en_nonempty")
                         & (r.verdicts["pid"] >= 0)]
    assert int(per_pid["n_rows"].sum()) == n_en
    # violation rows only come from in-scope rows
    v = r.violations[r.violations["check"] == "en_nonempty"]
    assert len(v) == nv_en
    # scope ops validate eagerly
    with pytest.raises(Exception):
        CheckSuite("""
checks:
  - {type: not_null, column: lang, where: {column: lang, op: "~="}}
""")


def test_scoped_check_checkpoint_merge(ray_session, tmp_path):
    """Sharded resume: scoped-check denominators merge as the SUM of
    per-shard in-scope counts, not the global row count."""
    from feature_fabrica_ray.pipelines.checkpoint import (codetable_shards,
                                                          validate_resumable)

    suite_yaml = """
checks:
  - {type: min_length, column: content, min_length: 1, name: en_nonempty,
     where: {column: lang, op: ==, value: en}}
"""
    out_dir = str(tmp_path / "ckpt")
    shards = codetable_shards(SF, n_shards=3)
    merged = validate_resumable(shards, CheckSuite(suite_yaml), out_dir,
                                num_partitions=8)["result"]
    g = merged.verdicts[merged.verdicts["pid"] == -1].set_index("check")
    one = run_suite(read_codetable(SF), CheckSuite(suite_yaml),
                    num_partitions=8)
    go = one.global_verdicts().set_index("check")
    assert int(g.loc["en_nonempty", "n_rows"]) == int(go.loc["en_nonempty", "n_rows"])
    assert int(g.loc["en_nonempty", "n_violations"]) == \
        int(go.loc["en_nonempty", "n_violations"])


def test_compare_check_cross_column(ray_session, duck):
    """compare: violation when NOT (column <op> other) row-wise; nulls on
    either side pass. Golden via DuckDB on a derived pair of columns."""
    ds = _input_ds().map_batches(
        lambda b: b.append_column(
            "half_size", pc.cast(pc.divide(b.column("size_bytes"), 2), pa.int64())),
        batch_format="pyarrow")
    suite = CheckSuite("""
checks:
  - {type: compare, column: half_size, other: size_bytes, op: "<=", name: half_le}
  - {type: compare, column: size_bytes, other: half_size, op: "<", name: lt_half}
""")
    r = run_suite(ds, suite, num_partitions=8)
    g = r.global_verdicts().set_index("check")
    # half <= full always holds (non-negative sizes)
    assert int(g.loc["half_le", "n_violations"]) == 0
    nv = _golden(duck, "SELECT count(*) FROM codetable "
                       "WHERE NOT (length(content) < length(content) // 2)")
    assert int(g.loc["lt_half", "n_violations"]) == nv
    assert nv > 0
    # bad op rejected eagerly
    with pytest.raises(Exception):
        CheckSuite("""
checks:
  - {type: compare, column: a, other: b, op: "~"}
""")


def test_severity_warn_does_not_gate(ray_session):
    """A warn-severity check reports its failure (verdict passed=False,
    violations collected) but ValidationResult.passed() stays True;
    the same check at error severity gates."""
    warn_suite = CheckSuite("""
checks:
  - {type: not_null, column: lang, severity: warn}
""")
    r = run_suite(_input_ds(), warn_suite, num_partitions=8)
    g = r.global_verdicts().set_index("check")
    assert int(g.loc["not_null:lang", "n_violations"]) > 0
    assert not bool(g.loc["not_null:lang", "passed"])
    assert g.loc["not_null:lang", "severity"] == "warn"
    assert r.passed                         # warn never gates
    err_suite = CheckSuite("""
checks:
  - {type: not_null, column: lang}
""")
    r2 = run_suite(_input_ds(), err_suite, num_partitions=8)
    assert not r2.passed
    # invalid severity rejected eagerly
    with pytest.raises(Exception):
        CheckSuite("""
checks:
  - {type: not_null, column: lang, severity: loud}
""")


def test_severity_survives_checkpoint_merge(ray_session, tmp_path):
    from feature_fabrica_ray.pipelines.checkpoint import (codetable_shards,
                                                          validate_resumable)

    suite = CheckSuite("""
checks:
  - {type: not_null, column: lang, severity: warn}
""")
    merged = validate_resumable(codetable_shards(SF, n_shards=2), suite,
                                str(tmp_path / "ckpt"),
                                num_partitions=8)["result"]
    g = merged.verdicts[merged.verdicts["pid"] == -1].set_index("check")
    assert g.loc["not_null:lang", "severity"] == "warn"
    assert not bool(g.loc["not_null:lang", "passed"])
    assert merged.passed


def test_freshness_check(ray_session):
    """Exact integer-second lags vs a fixed as_of; fresh flag per
    segment; invariant to block layout."""
    import ray.data

    from feature_fabrica_ray.pipelines import freshness_check

    df = pd.DataFrame({
        "g": ["a", "a", "b", "b", "c"],
        "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 11:59:30",
                              "2024-01-01 10:00:00", "2024-01-01 09:00:00",
                              "2024-01-01 11:59:59.400000"],
                             format="mixed")})
    out = freshness_check(ray.data.from_pandas(df).repartition(3), "ts", "g",
                          as_of="2024-01-01 12:00:00", max_lag_s=60)
    got = out.set_index("g")
    assert got.loc["a", "lag_s"] == 30 and bool(got.loc["a", "fresh"])
    assert got.loc["b", "lag_s"] == 7200 and not bool(got.loc["b", "fresh"])
    assert got.loc["c", "lag_s"] == 0 and bool(got.loc["c", "fresh"])  # floor
    out1 = freshness_check(ray.data.from_pandas(df), "ts", "g",
                           as_of="2024-01-01 12:00:00", max_lag_s=60)
    pd.testing.assert_frame_equal(out, out1)


def test_grouped_outliers(ray_session):
    """Planted per-segment outliers are flagged exactly (|v-m| > k*std
    with exact pooled moments); nulls never flag; layout-invariant."""
    import ray.data

    from feature_fabrica_ray.pipelines import grouped_outliers

    rng = np.random.default_rng(3)
    n = 500
    base = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                         "g": np.where(np.arange(n) % 2 == 0, "x", "y"),
                         "v": rng.standard_normal(n)})
    base.loc[7, "v"] = 40.0      # planted, group y
    base.loc[10, "v"] = -35.0    # planted, group x
    base.loc[11, "v"] = np.nan
    out = grouped_outliers(ray.data.from_pandas(base).repartition(4),
                           "g", "v", k=3.0, id_cols=["id"]).to_pandas()
    ids = set(out["id"])
    assert {7, 10} <= ids and 11 not in ids
    # exact agreement with a numpy oracle
    exp = set()
    for g in ("x", "y"):
        sel = base[(base["g"] == g) & base["v"].notna()]
        m, s = sel["v"].mean(), sel["v"].std(ddof=0)
        exp |= set(sel[np.abs(sel["v"] - m) > 3.0 * s]["id"])
    assert ids == exp
    out1 = grouped_outliers(ray.data.from_pandas(base), "g", "v", k=3.0,
                            id_cols=["id"]).to_pandas()
    assert set(out1["id"]) == ids


def test_freshness_suite_check(ray_session):
    """Declarative freshness in the suite YAML: one global verdict row
    (n_rows = segments, n_violations = stale segments, metric = max
    lag), stale segments as violation rows, severity respected."""
    import ray.data

    df = pd.DataFrame({
        "g": ["a", "a", "b"],
        "ts": pd.to_datetime(["2024-01-01 11:59:50", "2024-01-01 06:00:00",
                              "2024-01-01 11:00:00"])})
    suite = CheckSuite("""
checks:
  - {type: freshness, column: ts, group: g, as_of: "2024-01-01 12:00:00",
     max_lag_s: 60, name: fresh_g, severity: warn}
""")
    r = run_suite(ray.data.from_pandas(df), suite, partition_col="g",
                  num_partitions=4, key_columns=["g"])
    g = r.global_verdicts().set_index("check")
    assert int(g.loc["fresh_g", "n_rows"]) == 2          # segments
    assert int(g.loc["fresh_g", "n_violations"]) == 1    # b stale
    assert g.loc["fresh_g", "metric"] == 3600.0          # max lag
    assert not bool(g.loc["fresh_g", "passed"])
    assert r.passed                                      # warn severity
    v = r.violations[r.violations["check"] == "fresh_g"]
    assert list(v["detail"]) == ["b: lag_s=3600"]


def test_freshness_checkpoint_merge_recomputes(ray_session, tmp_path):
    """A segment stale within one shard but fresh in the union must
    merge to FRESH: verdicts recompute from merged per-segment maxima,
    not from per-shard verdicts."""
    import ray.data

    from feature_fabrica_ray.pipelines.checkpoint import (merge_results,
                                                          validate_resumable)

    # shard 1 has only old 'a' events (stale in isolation); shard 2 has
    # a recent 'a' event -> merged 'a' is fresh. 'b' stale everywhere.
    s1 = pd.DataFrame({"g": ["a", "b"],
                       "ts": pd.to_datetime(["2024-01-01 00:00:00",
                                             "2024-01-01 00:00:00"])})
    s2 = pd.DataFrame({"g": ["a"],
                       "ts": pd.to_datetime(["2024-01-01 11:59:59"])})
    yaml = """
checks:
  - {type: freshness, column: ts, group: g, as_of: "2024-01-01 12:00:00",
     max_lag_s: 60, name: fresh_g}
"""
    shards = {"s1": lambda: ray.data.from_pandas(s1),
              "s2": lambda: ray.data.from_pandas(s2)}
    out = validate_resumable(shards, CheckSuite(yaml),
                             str(tmp_path / "ck"), num_partitions=4,
                             key_columns=["g"], partition_col="g")
    merged = out["result"]
    g = merged.verdicts[merged.verdicts["pid"] == -1].set_index("check")
    assert int(g.loc["fresh_g", "n_rows"]) == 2
    assert int(g.loc["fresh_g", "n_violations"]) == 1    # only b
    assert not bool(g.loc["fresh_g", "passed"])
    v = merged.violations[merged.violations["check"] == "fresh_g"]
    assert list(v["detail"]) == ["b: lag_s=43200"]
    # equality with the one-shot run over the union
    both = pd.concat([s1, s2], ignore_index=True)
    one = run_suite(ray.data.from_pandas(both), CheckSuite(yaml),
                    partition_col="g", num_partitions=4, key_columns=["g"])
    go = one.global_verdicts().set_index("check")
    for col in ("n_rows", "n_violations", "metric"):
        assert g.loc["fresh_g", col] == go.loc["fresh_g", col]


def test_partition_skew_diagnostics(result):
    """partition_skew reports per-pid balance: counts cover all rows,
    and a content-derived hash partitioning of ~38 repos over 8 pids is
    within a sane straggler bound."""
    sk = result.partition_skew()
    assert sk["rows"] == result.n_rows
    assert sk["partitions"] <= 8
    assert 1.0 <= sk["max_over_mean"] < 4.0
    assert sk["cv"] >= 0.0


def test_approx_distinct_per_group(ray_session):
    """HLL per-group distinct estimate within 2% of exact on thousands
    of distinct values; n_rows exact; layout-invariant (HLL merge is
    associative + commutative); null keys form their own group."""
    import ray.data

    from feature_fabrica_ray.pipelines import (approx_distinct_per_group,
                                               distinct_count_per_group)

    rng = np.random.default_rng(9)
    n = 20000
    df = pd.DataFrame({"g": np.where(np.arange(n) % 2 == 0, "a", "b"),
                       "v": rng.integers(0, 5000, n)})
    df.loc[:99, "g"] = None
    approx = approx_distinct_per_group(
        ray.data.from_pandas(df).repartition(4), "g", "v")
    exact = distinct_count_per_group(ray.data.from_pandas(df), "g", "v")
    a = approx.set_index(approx["g"].astype(str))
    e = exact.set_index(exact["g"].astype(str))
    for k in ("a", "b", "None"):
        rel = abs(a.loc[k, "n_distinct_est"] / e.loc[k, "n_distinct"] - 1)
        assert rel < 0.02, (k, rel)
        assert int(a.loc[k, "n_rows"]) == int(e.loc[k, "n_rows"])
    approx1 = approx_distinct_per_group(ray.data.from_pandas(df), "g", "v")
    pd.testing.assert_frame_equal(approx.reset_index(drop=True),
                                  approx1.reset_index(drop=True))


def test_grouped_correlation(ray_session):
    """Exact per-segment Pearson correlation vs numpy corrcoef; rows
    with a null on either side are excluded; degenerate segments
    (constant column) yield NaN; layout-invariant."""
    import ray.data

    from feature_fabrica_ray.pipelines import grouped_correlation

    rng = np.random.default_rng(5)
    n = 1000
    x = rng.standard_normal(n)
    df = pd.DataFrame({"g": np.where(np.arange(n) % 2 == 0, "a", "b"),
                       "x": x, "y": 2 * x + rng.standard_normal(n) * 0.5})
    df.loc[3, "y"] = np.nan          # excluded pair
    df.loc[df["g"] == "b", "y"] = 7.0  # constant -> NaN corr
    out = grouped_correlation(ray.data.from_pandas(df).repartition(4),
                              "g", "x", "y").set_index("g")
    sel = df[(df["g"] == "a") & df["y"].notna()]
    exp = np.corrcoef(sel["x"], sel["y"])[0, 1]
    assert out.loc["a", "corr"] == pytest.approx(exp, abs=1e-9)
    assert int(out.loc["a", "n"]) == len(sel)
    assert np.isnan(out.loc["b", "corr"])
    out1 = grouped_correlation(ray.data.from_pandas(df), "g", "x", "y") \
        .set_index("g")
    assert out1.loc["a", "corr"] == pytest.approx(out.loc["a", "corr"],
                                                  abs=1e-12)


def test_group_stats_suite_check(ray_session, tmp_path):
    """Declarative per-segment null-rate check: only segments over the
    threshold fail; sharded merge recomputes from merged counts (a
    segment over threshold within one shard but under it in the union
    merges to passing)."""
    import ray.data

    from feature_fabrica_ray.pipelines.checkpoint import validate_resumable

    yaml = """
checks:
  - {type: group_stats, column: v, group: g, max_null_rate: 0.4,
     name: null_by_g}
"""
    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 4,
                       "v": [1.0, None, None, None, 1.0, 1.0, 1.0, None]})
    r = run_suite(ray.data.from_pandas(df), CheckSuite(yaml),
                  partition_col="g", num_partitions=4, key_columns=["g"])
    g = r.global_verdicts().set_index("check")
    assert int(g.loc["null_by_g", "n_rows"]) == 2        # segments
    assert int(g.loc["null_by_g", "n_violations"]) == 1  # only a (75%)
    assert g.loc["null_by_g", "metric"] == pytest.approx(0.75)
    assert not bool(g.loc["null_by_g", "passed"])
    v = r.violations[r.violations["check"] == "null_by_g"]
    assert list(v["detail"]) == ["a: null_rate=0.750000"]
    # sharded: shard1 has b at 100% nulls, shard2 has b all non-null ->
    # union b = 1/4 nulls, UNDER the threshold; a stays over
    s1 = pd.DataFrame({"g": ["a", "a", "b"], "v": [None, None, None]})
    s2 = pd.DataFrame({"g": ["a", "b", "b", "b"],
                       "v": [1.0, 1.0, 1.0, 1.0]})
    shards = {"s1": lambda: ray.data.from_pandas(s1),
              "s2": lambda: ray.data.from_pandas(s2)}
    merged = validate_resumable(shards, CheckSuite(yaml),
                                str(tmp_path / "gs"), num_partitions=4,
                                key_columns=["g"], partition_col="g")["result"]
    gm = merged.verdicts[merged.verdicts["pid"] == -1].set_index("check")
    assert int(gm.loc["null_by_g", "n_violations"]) == 1   # only a
    vm = merged.violations[merged.violations["check"] == "null_by_g"]
    assert list(vm["detail"]) == ["a: null_rate=0.666667"]


def test_segment_drift_triage(ray_session):
    """Per-segment drift: identical segments measure 0; a shift applied
    to ONE segment fails only that segment; a segment present on only
    one side reports large drift; null segments form their own row."""
    import ray.data

    from feature_fabrica_ray.pipelines import segment_drift

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame({"g": np.where(np.arange(n) % 3 == 0, "a",
                                     np.where(np.arange(n) % 3 == 1, "b", "c")),
                       "v": rng.standard_normal(n)})
    cur = df.copy()
    cur.loc[cur["g"] == "b", "v"] *= 5.0     # only segment b drifts
    out = segment_drift(ray.data.from_pandas(cur).repartition(4), "g", "v",
                        ray.data.from_pandas(df).repartition(3),
                        method="psi", threshold=0.1)
    got = out.set_index("g")
    assert got.loc["a", "metric"] == pytest.approx(0.0, abs=1e-12)
    assert bool(got.loc["a", "passed"]) and bool(got.loc["c", "passed"])
    assert got.loc["b", "metric"] > 0.5 and not bool(got.loc["b", "passed"])
    # ks method agrees on the verdict pattern
    out_ks = segment_drift(ray.data.from_pandas(cur), "g", "v",
                           ray.data.from_pandas(df), method="ks",
                           threshold=0.1)
    gks = out_ks.set_index("g")
    assert not bool(gks.loc["b", "passed"]) and bool(gks.loc["a", "passed"])
    # one-sided segment: present only in current
    cur2 = pd.concat([df, pd.DataFrame({"g": ["new"] * 50,
                                        "v": rng.standard_normal(50)})],
                     ignore_index=True)
    out2 = segment_drift(ray.data.from_pandas(cur2), "g", "v",
                         ray.data.from_pandas(df), threshold=0.1)
    g2 = out2.set_index("g")
    assert int(g2.loc["new", "n_base"]) == 0
    assert not bool(g2.loc["new", "passed"])
    # null segment handled
    cur3 = df.copy()
    cur3.loc[:10, "g"] = None
    out3 = segment_drift(ray.data.from_pandas(cur3), "g", "v",
                         ray.data.from_pandas(df), threshold=0.1)
    assert out3["g"].isna().any()


def test_drift_actor_pool_matches_fused(ray_session):
    """Actor-pool drift stage (baselines in actor state) produces the same
    metrics as the fused single-pass path."""
    from feature_fabrica_ray.checks.suite import DriftCheck
    from feature_fabrica_ray.pipelines import (bind_baselines, compute_baseline,
                                               drift_report, run_suite)

    checks = [DriftCheck(name="drift:size_bytes", column="size_bytes",
                         method="psi", threshold=0.1),
              DriftCheck(name="drift:lang", column="lang", categorical=True,
                         method="psi", threshold=0.1)]
    ds = _input_ds()
    baselines = compute_baseline(ds, checks)
    for dc in checks:
        dc.baseline = baselines[dc.name]
    actor_out = drift_report(ds, checks, concurrency=2).set_index("check")

    from feature_fabrica_ray.checks import CheckSuite
    suite = CheckSuite([])
    suite.drift_checks = checks
    fused = run_suite(ds, suite, num_partitions=8).global_verdicts() \
        .set_index("check")
    for name in ("drift:size_bytes", "drift:lang"):
        assert actor_out.loc[name, "metric"] == pytest.approx(
            float(fused.loc[name, "metric"]), abs=1e-12)
        assert bool(actor_out.loc[name, "passed"])


def test_referential_bloom_path_equals_exact(ray_session):
    """Forcing the Bloom scale path (threshold 0) finds the same orphan
    rows as the exact broadcast set on the planted-orphan fixture."""
    suite_r = CheckSuite("""
checks:
  - {type: referential, column: repo, parent: repos, parent_column: repo}
""")
    exact = run_suite(read_codetable(SF, with_sha256=False), suite_r,
                      parents={"repos": read_repos(SF)}, num_partitions=8)
    bloom = run_suite(read_codetable(SF, with_sha256=False), suite_r,
                      parents={"repos": read_repos(SF)}, num_partitions=8,
                      bloom_threshold=0)
    ge = exact.global_verdicts().set_index("check")
    gb = bloom.global_verdicts().set_index("check")
    assert int(gb.loc["referential:repo", "n_violations"]) == \
        int(ge.loc["referential:repo", "n_violations"]) > 0


def test_uniqueness_invariant_to_partition_count(ray_session):
    from feature_fabrica_ray.pipelines import uniqueness_violations

    a = uniqueness_violations(read_codetable(SF, with_sha256=False),
                              ["repo", "path", "commit"], num_partitions=4)
    b = uniqueness_violations(read_codetable(SF, with_sha256=False),
                              ["repo", "path", "commit"], num_partitions=64)
    key = lambda df: sorted(map(tuple, df[["repo", "path", "commit"]].values.tolist()))
    assert key(a) == key(b) and len(a) == 10


def test_profile_table(ray_session):
    from feature_fabrica_ray.pipelines import profile_table

    prof = profile_table(_input_ds(), quantiles=[0.5], num_partitions=4) \
        .set_index("column")
    assert prof.loc["size_bytes", "count"] > 0
    assert prof.loc["repo", "distinct_est"] == pytest.approx(38, abs=2)
    assert prof.loc["size_bytes", "q0.5"] > 0
    assert np.isnan(prof.loc["lang", "mean"])   # non-numeric -> moments NaN


def test_referential_null_parent_key_is_absent(ray_session):
    """A null key in the parent table must be treated as absent (not crash
    sorted() while building the broadcast membership set)."""
    import ray.data
    parent = ray.data.from_pandas(pd.DataFrame({"repo": ["r1", None]}))
    child = ray.data.from_pandas(pd.DataFrame(
        {"repo": ["r1", "r1", "rX"], "path": ["a", "b", "c"],
         "commit": ["0" * 32] * 3}))
    suite = CheckSuite("""
checks:
  - {type: referential, column: repo, parent: repos, parent_column: repo}
""")
    r = run_suite(child, suite, parents={"repos": parent}, num_partitions=4,
                  key_columns=["repo", "path"])
    g = r.global_verdicts().set_index("check")
    assert int(g.loc["referential:repo", "n_violations"]) == 1


def test_referential_bloom_distributed_multiblock(ray_session):
    """The Bloom scale path builds per-block partial filters merged by
    bitwise OR — a multi-block parent must flag exactly the same orphans
    as the exact broadcast set (no driver-side key materialization)."""
    suite_r = CheckSuite("""
checks:
  - {type: referential, column: repo, parent: repos, parent_column: repo}
""")
    parent = read_repos(SF).repartition(8)   # force many partial Blooms
    exact = run_suite(read_codetable(SF, with_sha256=False), suite_r,
                      parents={"repos": parent}, num_partitions=8)
    bloom = run_suite(read_codetable(SF, with_sha256=False), suite_r,
                      parents={"repos": parent}, num_partitions=8,
                      bloom_threshold=0)
    ge = exact.global_verdicts().set_index("check")
    gb = bloom.global_verdicts().set_index("check")
    assert int(gb.loc["referential:repo", "n_violations"]) == \
        int(ge.loc["referential:repo", "n_violations"]) > 0
    ke = sorted(exact.violations["repo"])
    kb = sorted(bloom.violations["repo"])
    assert ke == kb


def test_suite_dict_encoded_equals_flat(ray_session):
    """The dictionary-encoded codetable (repo/lang as Arrow dictionary
    columns — the scale layout, hash/check fast paths) produces
    IDENTICAL suite results to the flat-string layout: same verdicts
    (per-pid and global), same violation rows, same distinct estimate,
    same lineage digests, same uniqueness rows."""
    suite = CheckSuite(SUITE_YAML)

    def inp(dict_encode):
        return read_codetable(SF, dict_encode=dict_encode).map_batches(
            lambda b: b.append_column(
                "size_bytes",
                pc.utf8_length(b.column("content")).cast(pa.int64())),
            batch_format="pyarrow")

    flat = run_suite(inp(False), suite, parents={"repos": read_repos(SF)},
                     num_partitions=8)
    dic = run_suite(inp(True), suite, parents={"repos": read_repos(SF)},
                    num_partitions=8)
    vf = flat.verdicts.sort_values(["check", "pid"]).reset_index(drop=True)
    vd = dic.verdicts.sort_values(["check", "pid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(vf, vd)
    cols = ["check", "repo", "path", "commit"]
    ff = flat.violations[cols].astype(str).sort_values(cols) \
        .reset_index(drop=True)
    dd = dic.violations[cols].astype(str).sort_values(cols) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(ff, dd)
    sf_ = flat.stats.sort_values("column").reset_index(drop=True)
    sd_ = dic.stats.sort_values("column").reset_index(drop=True)
    # t-digest quantile ESTIMATES are merge-order-sensitive (Ray block
    # arrival order is nondeterministic — flat-vs-flat differs too), so
    # they get a tolerance; everything else (Welford moments, HLL
    # distinct, counts) merges exactly and must be equal
    qcols = [c for c in sf_.columns if c.startswith("q0")]
    pd.testing.assert_frame_equal(sf_.drop(columns=qcols),
                                  sd_.drop(columns=qcols))
    for c in qcols:
        pd.testing.assert_series_equal(sf_[c], sd_[c], rtol=0.02)
    # the per-pid lineage digests hinge on hash64 equality across
    # encodings (pid comes from hash64(repo))
    assert flat.digests == dic.digests and flat.digests

    from feature_fabrica_ray.pipelines import uniqueness_violations
    uf = uniqueness_violations(
        read_codetable(SF, with_sha256=False, dict_encode=False),
        ["repo", "path", "commit"])
    ud = uniqueness_violations(
        read_codetable(SF, with_sha256=False, dict_encode=True),
        ["repo", "path", "commit"])
    key = ["repo", "path", "commit"]
    pd.testing.assert_frame_equal(
        uf[key].astype(str).sort_values(key).reset_index(drop=True),
        ud[key].astype(str).sort_values(key).reset_index(drop=True))
    assert list(ud.dtypes[key].astype(str)) == ["object"] * 3


def test_suite_on_empty_input(ray_session):
    """Zero-row input: verdicts exist for every check (all passing,
    n_rows 0), no crash in stats/drift/uniqueness assembly."""
    import ray.data
    empty = ray.data.from_arrow(pa.table({
        "repo": pa.array([], pa.string()), "path": pa.array([], pa.string()),
        "commit": pa.array([], pa.string()), "lang": pa.array([], pa.string()),
        "content": pa.array([], pa.string()),
        "size_bytes": pa.array([], pa.int64())}))
    suite = CheckSuite("""
checks:
  - {type: not_null, column: lang}
  - {type: unique, columns: [repo, path, commit]}
  - {type: stats, column: size_bytes}
""")
    r = run_suite(empty, suite, num_partitions=4,
                  key_columns=["repo", "path", "commit"])
    assert r.n_rows == 0
    g = r.global_verdicts().set_index("check")
    assert bool(g.loc["not_null:lang", "passed"])
    assert bool(g.loc["unique:repo+path+commit", "passed"])
    assert len(r.violations) == 0


def test_uniqueness_ds_form_equals_collected(ray_session):
    """The dup-heavy Dataset form returns exactly the rows the
    hash-projection form collects."""
    from feature_fabrica_ray.pipelines import (uniqueness_violations,
                                               uniqueness_violations_ds)

    ds = read_codetable(SF, with_sha256=False)
    a = uniqueness_violations(ds, ["repo", "path", "commit"],
                              key_columns=["repo", "path", "commit"])
    b = uniqueness_violations_ds(read_codetable(SF, with_sha256=False),
                                 ["repo", "path", "commit"]).to_pandas()
    key = ["repo", "path", "commit"]
    assert sorted(map(tuple, a[key].values.tolist())) == \
        sorted(map(tuple, b[key].values.tolist()))


def test_quantile_bound_check(ray_session):
    """Declarative distribution-shape bound: p95/p50 of a known uniform
    distribution judged against [min, max] from the suite's merged
    t-digest; warn severity reports but never gates; a spec without
    bounds is rejected."""
    import ray

    from feature_fabrica_ray.checks import CheckSpecError

    df = pd.DataFrame({"v": np.arange(1.0, 1001.0),
                       "k": ["a", "b"] * 500})
    ds = ray.data.from_pandas(df).repartition(4)
    suite = CheckSuite("""
checks:
  - {type: quantile_bound, column: v, q: 0.95, max: 990, name: p95_ok}
  - {type: quantile_bound, column: v, q: 0.95, max: 100, name: p95_bad, severity: warn}
  - {type: quantile_bound, column: v, q: 0.5, min: 400, max: 600, name: p50_band}
""")
    res = run_suite(ds, suite, partition_col="k", num_partitions=4)
    g = res.global_verdicts().set_index("check")
    assert bool(g.loc["p95_ok", "passed"])
    assert abs(g.loc["p95_ok", "metric"] - 950.0) < 25     # estimate ~p95
    assert not bool(g.loc["p95_bad", "passed"])
    assert bool(g.loc["p50_band", "passed"])
    assert res.passed                                      # warn doesn't gate
    # error severity on a failing bound gates the suite
    bad = CheckSuite(
        "checks:\n  - {type: quantile_bound, column: v, q: 0.95, max: 100}")
    assert not run_suite(ds, bad, partition_col="k", num_partitions=4).passed
    with pytest.raises(CheckSpecError):
        CheckSuite("checks:\n  - {type: quantile_bound, column: v, q: 0.5}")
    with pytest.raises(CheckSpecError):
        CheckSuite("checks:\n  - {type: quantile_bound, column: v, q: 1.5, max: 1}")
    # all-null column: passes with NaN metric (no evidence of violation)
    dfn = pd.DataFrame({"v": pd.array([None] * 50, dtype="float64"),
                        "k": ["a"] * 50})
    rn = run_suite(ray.data.from_pandas(dfn),
                   CheckSuite("checks:\n"
                              "  - {type: quantile_bound, column: v, q: 0.9, max: 10, name: qn}"),
                   partition_col="k", num_partitions=2)
    gn = rn.global_verdicts().set_index("check")
    assert bool(gn.loc["qn", "passed"]) and np.isnan(gn.loc["qn", "metric"])


def test_pivot_agg(ray_session):
    """Pivot matches pandas pivot_table exactly on integer-valued data:
    sum and count aggs, null keys form their own group, unlisted pivot
    values are ignored, empty cells are 0, layout-invariant."""
    import ray

    from feature_fabrica_ray.pipelines import pivot_agg

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", None], 400),
        "p": rng.choice(["x", "y", "z", "other"], 400),
        "v": rng.randint(0, 50, 400).astype("float64")})
    ds = ray.data.from_pandas(df).repartition(5)
    out = pivot_agg(ds, "k", "p", "v", values=["x", "y", "z"], agg="sum") \
        .sort_values("k", na_position="last").reset_index(drop=True)
    exp = (df.groupby("k", dropna=False)
             .apply(lambda g: pd.Series(
                 {f"{v}_sum": g.loc[g["p"] == v, "v"].sum()
                  for v in ["x", "y", "z"]}), include_groups=False)
             .reset_index().sort_values("k", na_position="last")
             .reset_index(drop=True))
    for v in ["x", "y", "z"]:
        assert out[f"{v}_sum"].tolist() == exp[f"{v}_sum"].tolist()
    cnt = pivot_agg(ds, "k", "p", None, values=["x", "y"], agg="count")
    exp_c = df.groupby("k", dropna=False).apply(
        lambda g: int((g["p"] == "x").sum()), include_groups=False)
    got_c = {("\0null" if pd.isna(r["k"]) else r["k"]): r["x_count"]
             for _, r in cnt.iterrows()}
    for k, v in exp_c.items():
        kk = "\0null" if pd.isna(k) else k
        assert got_c[kk] == v
    b = pivot_agg(ray.data.from_pandas(df).repartition(11), "k", "p", "v",
                  values=["x", "y", "z"], agg="sum")
    assert sorted(map(tuple, b.fillna("~").to_numpy().tolist())) == \
           sorted(map(tuple, out.fillna("~").to_numpy().tolist()))
    with pytest.raises(ValueError):
        pivot_agg(ds, "k", "p", None, values=["x"], agg="sum")


def test_distinct_bound_check(ray_session):
    """Cardinality expectation: distinct(column) judged against
    [min, max] from the suite's merged HLL; exact at small
    cardinalities; warn severity reports but never gates; specs
    without bounds are rejected."""
    import ray

    from feature_fabrica_ray.checks import CheckSpecError

    df = pd.DataFrame({"v": [f"val{i % 7}" for i in range(500)],
                       "k": ["a", "b"] * 250})
    ds = ray.data.from_pandas(df).repartition(4)
    suite = CheckSuite("""
checks:
  - {type: distinct_bound, column: v, min: 5, max: 10, name: card_ok}
  - {type: distinct_bound, column: v, max: 3, name: card_bad, severity: warn}
  - {type: distinct_bound, column: k, min: 2, max: 2, name: card_exact}
""")
    res = run_suite(ds, suite, partition_col="k", num_partitions=4)
    g = res.global_verdicts().set_index("check")
    assert bool(g.loc["card_ok", "passed"])
    assert g.loc["card_ok", "metric"] == pytest.approx(7, abs=0.5)
    assert not bool(g.loc["card_bad", "passed"])
    assert bool(g.loc["card_exact", "passed"])
    assert res.passed                                     # warn doesn't gate
    with pytest.raises(CheckSpecError):
        CheckSuite("checks:\n  - {type: distinct_bound, column: v}")


def test_quantile_bound_rejects_non_numeric(ray_session):
    import ray

    df = pd.DataFrame({"s": ["a", "b"], "k": ["x", "y"]})
    suite = CheckSuite(
        "checks:\n  - {type: quantile_bound, column: s, q: 0.5, max: 1}")
    with pytest.raises(ValueError, match="non-numeric"):
        run_suite(ray.data.from_pandas(df), suite, partition_col="k")


def test_approx_group_quantiles(ray_session):
    """t-digest scale path tracks the exact per-group quantiles within
    rank tolerance; n_rows exact; null keys form their own group;
    all-null value groups give NaN; layout-invariant estimates."""
    import ray

    from feature_fabrica_ray.pipelines import approx_group_quantiles

    rng = np.random.RandomState(3)
    n = 6000
    df = pd.DataFrame({"k": rng.choice(["a", "b", None], n),
                       "v": rng.gamma(2.0, 10.0, n)})
    df.loc[df["k"].isna(), "v"] = np.nan     # the null-key group: all-null
    ds = ray.data.from_pandas(df).repartition(6)
    out = approx_group_quantiles(ds, "k", "v", qs=(0.5, 0.9))
    got = {r["k"]: r for _, r in out.iterrows()}
    for k in ("a", "b"):
        sel = df[df["k"] == k]["v"]
        assert got[k]["n_rows"] == len(sel)
        for q, name in ((0.5, "q_50"), (0.9, "q_90")):
            exact = sel.quantile(q)
            # rank tolerance: estimate lies between nearby exact ranks
            lo, hi = sel.quantile(max(0.0, q - 0.03)), sel.quantile(min(1.0, q + 0.03))
            assert lo <= got[k][name] <= hi, (k, name, got[k][name], exact)
    assert np.isnan(got[None]["q_50"])       # all-null group
    out2 = approx_group_quantiles(ray.data.from_pandas(df).repartition(11),
                                  "k", "v", qs=(0.5, 0.9))
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), out2.reset_index(drop=True),
        check_exact=False, rtol=0.02)


def test_infer_checks_cross_scale(ray_session):
    """The profiler-generated suite passes on a LARGER sample of the
    same distribution (the baseline-then-validate workflow) incl. the
    numeric range/quantile bands, and a planted distribution shift
    fails exactly the expectations it violates."""
    from feature_fabrica_ray.pipelines import infer_checks, run_suite

    def with_size(sf):
        return read_codetable(sf, with_sha256=False).map_batches(
            lambda b: b.append_column(
                "size_bytes",
                pc.utf8_length(b.column("content")).cast(pa.int64())),
            batch_format="pyarrow", batch_size=None)

    spec = infer_checks(with_size("/root/testdata/sf0.001"),
                        partition_col="repo")
    kinds = {d["type"] for d in spec}
    assert {"schema", "not_null", "distinct_bound", "range",
            "quantile_bound"} <= kinds

    res = run_suite(with_size("/root/testdata/sf0.01"), CheckSuite(spec),
                    partition_col="repo")
    g = res.global_verdicts()
    assert g["passed"].all(), g[~g["passed"]]["check"].tolist()

    # planted shift: inflate size_bytes 100x -> range + quantile bands
    # on size_bytes must fail, everything else still passes
    def inflate(b):
        return b.set_column(
            b.column_names.index("size_bytes"), "size_bytes",
            pc.multiply(b.column("size_bytes"), pa.scalar(100, pa.int64())))
    shifted = with_size("/root/testdata/sf0.01").map_batches(
        inflate, batch_format="pyarrow", batch_size=None)
    g2 = run_suite(shifted, CheckSuite(spec), partition_col="repo") \
        .global_verdicts().set_index("check")
    assert not bool(g2.loc["inferred:range:size_bytes", "passed"])
    assert not bool(g2.loc["inferred:q0.95:size_bytes", "passed"])
    assert bool(g2.loc["inferred:distinct:repo", "passed"])


def test_group_stats_on_string_column(ray_session):
    """The declarative group_stats check only needs (rows, nulls), so it
    must work on non-numeric columns (counts-only combiner; min/max/sum
    come back NaN). Regression: Arrow's group_by cannot SUM strings."""
    import ray.data

    from feature_fabrica_ray.pipelines import grouped_stats, run_suite

    df = pd.DataFrame({"g": ["a", "a", "b", "b", "b"],
                       "s": ["x", None, "y", "z", None]})
    out = grouped_stats(ray.data.from_pandas(df).repartition(2),
                        "g", "s").set_index("g")
    assert out.loc["a", "cnt"] == 1 and out.loc["a", "nulls"] == 1
    assert out.loc["b", "cnt"] == 2 and out.loc["b", "nulls"] == 1
    assert np.isnan(out.loc["a", "nmin"]) and np.isnan(out.loc["a", "nsum"])

    suite = CheckSuite("""
checks:
  - {type: group_stats, column: s, group: g, max_null_rate: 0.4,
     name: s_nulls_by_g}
""")
    g = run_suite(ray.data.from_pandas(df).repartition(2), suite,
                  partition_col="g").global_verdicts().set_index("check")
    assert not bool(g.loc["s_nulls_by_g", "passed"])   # a: 50% > 40%


def test_example_suite_runs_end_to_end(ray_session):
    """examples/code_validation_suite.yaml (all 12 declarative check
    kinds incl. shape_bound / top_share_bound / string-column
    group_stats) parses and runs over the sf0.001 codetable."""
    from feature_fabrica_ray.pipelines import run_suite
    from feature_fabrica_ray.sources import read_repos

    with open("/root/repo/examples/code_validation_suite.yaml") as f:
        suite = CheckSuite(f.read())

    def derive(b):
        sz = pc.utf8_length(b.column("content")).cast(pa.int64())
        return b.append_column("size_bytes", sz) \
                .append_column("content_len", sz)

    ds = read_codetable("/root/testdata/sf0.001").map_batches(
        derive, batch_format="pyarrow", batch_size=None)
    res = run_suite(ds, suite,
                    parents={"repos": read_repos("/root/testdata/sf0.001")},
                    num_partitions=8)
    g = res.global_verdicts().set_index("check")
    # stats checks report rows, not verdicts
    assert len(g) == len(suite.all_names()) - len(suite.stats_checks)
    assert bool(g.loc["size_skew_band", "passed"])
    assert bool(g.loc["lang_dominance", "passed"])
    assert bool(g.loc["content_nulls_by_lang", "passed"])


def test_monotonic_violations(ray_session):
    """Consecutive-pair rule per key: non_decreasing counts drops only,
    strict 'increasing' also counts ties, NULL values/predecessors never
    violate, NULL order keys sort last; layout invariant."""
    import ray.data

    from feature_fabrica_ray.pipelines.grouped import monotonic_violations

    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 3 + ["c"] * 2,
        "o": [1, 2, 3, 4, 1, 2, 3, 1, 2],
        "v": [1.0, 1.0, 0.5, 2.0,    # a: one drop (1.0 -> 0.5)
              3.0, None, 2.0,        # b: NULL gaps never violate
              5.0, 6.0],             # c: clean
    })
    for blocks in (1, 4):
        ds = ray.data.from_pandas(df).repartition(blocks)
        out = monotonic_violations(ds, "k", "o", "v")
        assert out["k"].tolist() == ["a", "b", "c"]
        assert out["n_violations"].tolist() == [1, 0, 0]
        assert out["passed"].tolist() == [False, True, True]
    strict = monotonic_violations(ray.data.from_pandas(df), "k", "o", "v",
                                  direction="increasing")
    assert strict["n_violations"].tolist() == [2, 0, 0]  # tie counts too
    dec = monotonic_violations(ray.data.from_pandas(df), "k", "o", "v",
                               direction="non_increasing")
    assert dec["n_violations"].tolist() == [1, 0, 1]
    with pytest.raises(ValueError):
        monotonic_violations(ray.data.from_pandas(df), "k", "o", "v",
                             direction="sideways")


def test_grouped_regression(ray_session):
    """Slope/intercept/r2 match a direct numpy least-squares fit per
    group regardless of block layout; null pairs excluded; zero-variance
    x gives NULLs, constant y gives r2=1."""
    import numpy as np
    import ray.data

    from feature_fabrica_ray.pipelines import grouped_regression

    rng = np.random.default_rng(5)
    x = rng.normal(size=60)
    df = pd.DataFrame({
        "k": ["a"] * 30 + ["b"] * 30,
        "x": x,
        "y": np.where(np.arange(60) < 30, 2.0 * x + 1.0 + rng.normal(
            scale=.1, size=60), -x + 5),
    })
    df.loc[3, "y"] = None  # excluded pair
    for blocks in (1, 4):
        out = grouped_regression(
            ray.data.from_pandas(df).repartition(blocks), "k", "x", "y")
        a = df.dropna()
        for key, row in zip(("a", "b"), out.itertuples()):
            g = a[a["k"] == key]
            sl, ic = np.polyfit(g["x"], g["y"], 1)
            assert abs(row.slope - sl) < 1e-9
            assert abs(row.intercept - ic) < 1e-9
            r = np.corrcoef(g["x"], g["y"])[0, 1]
            assert abs(row.r2 - r * r) < 1e-9
    deg = pd.DataFrame({"k": ["c"] * 3 + ["d"] * 3,
                        "x": [1.0, 1.0, 1.0, 1, 2, 3],
                        "y": [1.0, 2.0, 3.0, 7, 7, 7]})
    out = grouped_regression(ray.data.from_pandas(deg), "k", "x", "y")
    assert np.isnan(out.loc[0, "slope"])      # var(x)=0
    assert out.loc[1, "r2"] == 1.0            # var(y)=0


def test_hash_split(ray_session):
    """Split labels are a pure function of the key (layout/rerun
    invariant), fractions land near targets, labels partition the rows,
    and duplicate keys always co-locate; bad fractions rejected."""
    import ray.data

    from feature_fabrica_ray.pipelines import hash_split

    df = pd.DataFrame({"k": np.arange(2000) % 1000})  # every key twice
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    outs = []
    for blocks in (1, 5):
        out = hash_split(ray.data.from_pandas(df).repartition(blocks),
                         ["k"], fr).to_pandas()
        outs.append(out.sort_values(["k", "split"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    assert set(out["split"]) == {"train", "val", "test"}
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.06
    # same key -> same split, always
    assert (out.groupby("k")["split"].nunique() == 1).all()
    with pytest.raises(ValueError):
        hash_split(ray.data.from_pandas(df), ["k"], {"a": 0.5, "b": 0.4})


def test_grouped_outliers_iqr(ray_session):
    """Tukey fence per segment: a planted far point is flagged with its
    segment's own fence; NULL value and NULL segment rows never flag;
    quiet segments emit nothing; layout invariant."""
    import numpy as np
    import ray.data

    from feature_fabrica_ray.pipelines import grouped_outliers_iqr

    base = np.linspace(10.0, 20.0, 41)
    df = pd.DataFrame({
        "k": ["a"] * 42 + ["b"] * 41 + [None],
        "v": np.concatenate([base, [1000.0], base + 100, [np.nan]]),
    })
    for blocks in (1, 4):
        out = grouped_outliers_iqr(
            ray.data.from_pandas(df).repartition(blocks), "k", "v") \
            .to_pandas()
        assert out["v"].tolist() == [1000.0]
        assert out["k"].tolist() == ["a"]
        assert out["lo"].iloc[0] < 10 and out["hi"].iloc[0] < 1000


def test_mix_corpora(ray_session):
    """Repetition-factor mixing: weight 2.25 gives two full epochs plus
    a deterministic quarter epoch; partial-epoch membership is a pure
    function of the key (layout invariant); epoch stamps are 1-based;
    bad weights rejected."""
    import ray.data

    from feature_fabrica_ray.pipelines import mix_corpora

    df = pd.DataFrame({"k": np.arange(1000)})
    src = ray.data.from_pandas(df)
    outs = []
    for blocks in (1, 4):
        out = mix_corpora([(ray.data.from_pandas(df).repartition(blocks),
                            2.25)], ["k"]).to_pandas()
        outs.append(out.sort_values(["k", "epoch"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    counts = out["epoch"].value_counts()
    assert counts[1] == 1000 and counts[2] == 1000
    assert abs(counts[3] - 250) < 60
    # every epoch-3 key also exists in epochs 1 and 2
    assert (out.groupby("k")["epoch"].max() >= 2).all()
    with pytest.raises(ValueError):
        mix_corpora([(src, -1.0)], ["k"])
    with pytest.raises(ValueError):
        mix_corpora([(src, 0.0)], ["k"])


def test_weighted_avg_per_group(ray_session):
    """wavg == sum(w*v)/sum(w) per key with null pairs excluded; an
    all-null group yields NULL; layout invariant."""
    import numpy as np
    import ray.data

    from feature_fabrica_ray.pipelines import weighted_avg_per_group

    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", "c"],
        "v": [10.0, 20.0, None, 4.0, 8.0, None],
        "w": [1.0, 3.0, 5.0, 1.0, None, 2.0],
    })
    for blocks in (1, 3):
        out = weighted_avg_per_group(
            ray.data.from_pandas(df).repartition(blocks), "k", "v", "w")
        assert out["k"].tolist() == ["a", "b", "c"]
        assert abs(out["wavg"][0] - (10 + 60) / 4.0) < 1e-12
        assert out["wavg"][1] == 4.0
        assert np.isnan(out["wavg"][2])
        assert out["n"].tolist() == [2, 1, 0]


def test_chi_square_independence(ray_session):
    """Statistic matches the textbook formula computed by hand on the
    full contingency (incl. empty cells); perfectly dependent columns
    give cramers_v ~ 1, independent ~ 0; null rows excluded; layout
    invariant."""
    import numpy as np
    import ray.data

    from feature_fabrica_ray.pipelines import chi_square_independence

    # perfectly dependent: b == a
    dep = pd.DataFrame({"a": ["x", "y"] * 50, "b": ["x", "y"] * 50})
    r = chi_square_independence(ray.data.from_pandas(dep), "a", "b")
    assert abs(r["cramers_v"] - 1.0) < 1e-12 and r["dof"] == 1
    # independent-by-construction uniform grid
    ind = pd.DataFrame({"a": ["x", "x", "y", "y"] * 25,
                        "b": ["u", "v", "u", "v"] * 25})
    r = chi_square_independence(ray.data.from_pandas(ind), "a", "b")
    assert abs(r["chi2"]) < 1e-12
    # hand-checked 2x2 with an empty cell and a null row, layout invariant
    df = pd.DataFrame({"a": ["x", "x", "x", "y", "y", None],
                       "b": ["u", "u", "v", "u", "u", "u"]})
    vals = []
    for blocks in (1, 3):
        r = chi_square_independence(
            ray.data.from_pandas(df).repartition(blocks), "a", "b")
        vals.append(r["chi2"])
        assert r["n"] == 5
    assert vals[0] == vals[1]
    o = np.array([[2.0, 1.0], [2.0, 0.0]])
    e = o.sum(1, keepdims=True) @ o.sum(0, keepdims=True) / o.sum()
    assert abs(vals[0] - (((o - e) ** 2) / e).sum()) < 1e-12


def test_reconcile_sums(ray_session):
    """Detail-to-header SUM reconciliation: exact per-key child sums vs
    the parent value, parent keys with no detail reconcile against 0,
    violations ranked by |diff| with deterministic ties, summary counts
    exact — across block layouts."""
    import numpy as np
    import pandas as pd
    import ray.data

    from feature_fabrica_ray.pipelines import reconcile_sums

    rng = np.random.default_rng(41)
    child_rows = []
    parent_rows = []
    for k in range(40):
        n = int(rng.integers(1, 6))
        vals = np.round(rng.uniform(1, 100, n), 2)
        child_rows += [(k, float(v)) for v in vals]
        total = float(np.round(vals.sum(), 6))
        if k % 7 == 0:
            total += 5.0           # planted violation
        parent_rows.append((k, total))
    parent_rows.append((999, 42.0))   # header with no detail rows
    child = pd.DataFrame(child_rows, columns=["k", "v"])
    parent = pd.DataFrame(parent_rows, columns=["k", "total"])

    for blocks in (1, 4):
        cds = ray.data.from_pandas(child).repartition(blocks)
        pds = ray.data.from_pandas(parent).repartition(max(1, blocks - 1))
        summary, viol = reconcile_sums(
            cds, pds, key="k", child_val="v", parent_val="total",
            tol=1e-6, top=10)
        planted = {k for k in range(40) if k % 7 == 0} | {999}
        assert int(summary["n_keys"].iloc[0]) == 41
        assert int(summary["n_viol"].iloc[0]) == len(planted)
        got = set(viol["k"].astype(int))
        assert got <= planted and len(viol) == min(10, len(planted))
        # the no-detail header reconciles against 0 -> diff = -42
        row999 = viol[viol["k"] == 999]
        assert len(row999) == 1
        assert row999["child_sum"].iloc[0] == 0.0
        assert row999["diff"].iloc[0] == pytest.approx(-42.0)
        # ordering: |diff| descending
        d = viol["diff"].abs().to_numpy()
        assert (d[:-1] >= d[1:] - 1e-12).all()


def test_grid_completeness(ray_session):
    """Per-key distinct-day coverage vs the global span: a key missing
    interior days is flagged with the exact missing count; complete
    keys pass; layout-invariant."""
    import numpy as np
    import pandas as pd

    from feature_fabrica_ray.pipelines import grid_completeness

    base = pd.Timestamp("2024-03-01")
    rows = []
    for d in range(10):                      # key 1: all 10 days
        rows.append((1, base + pd.Timedelta(days=d, hours=3)))
    for d in [0, 1, 5, 9]:                   # key 2: 4 of 10
        rows.append((2, base + pd.Timedelta(days=d)))
        rows.append((2, base + pd.Timedelta(days=d, hours=8)))  # dups
    df = pd.DataFrame(rows, columns=["k", "ts"])

    import ray.data
    for blocks in (1, 3):
        ds = ray.data.from_pandas(df).repartition(blocks)
        out = grid_completeness(ds, "k", "ts").set_index("k")
        assert int(out.loc[1, "n_days"]) == 10
        assert bool(out.loc[1, "complete"])
        assert int(out.loc[2, "n_days"]) == 4
        assert int(out.loc[2, "expected_days"]) == 10
        assert int(out.loc[2, "n_missing"]) == 6
        assert not bool(out.loc[2, "complete"])


def test_volume_anomalies(ray_session):
    """A planted outage day (tenth volume) and a spike day (8x) both
    flag; normal days don't; dev matches the scaled-MAD closed form."""
    import numpy as np
    import pandas as pd
    import ray.data

    from feature_fabrica_ray.pipelines import volume_anomalies

    rng = np.random.default_rng(151)
    base = pd.Timestamp("2024-02-01")
    rows = []
    for d in range(14):
        cnt = 1000 + int(rng.integers(-30, 30))
        if d == 5:
            cnt = 100            # outage
        if d == 9:
            cnt = 8000           # spike
        for _ in range(cnt):
            rows.append(base + pd.Timedelta(
                days=d, seconds=int(rng.integers(0, 86400))))
    df = pd.DataFrame({"ts": rows})

    for blocks in (1, 4):
        ds = ray.data.from_pandas(df).repartition(blocks)
        out = volume_anomalies(ds, "ts", k=5.0)
        assert len(out) == 14
        flagged = set(out[out["anomaly"]].index)
        assert flagged == {5, 9}, out
        n = out["n"].to_numpy(float)
        med = np.median(n)
        mad = np.median(np.abs(n - med))
        want = np.abs(n - med) / (1.4826 * mad)
        np.testing.assert_allclose(out["dev"], np.round(want, 6),
                                   atol=2e-6)


def test_sortedness(ray_session):
    """Sorted data scores 1.0, reversed ~0, shuffled ~0.5; counts match
    the exact adjacent-pair reference across block boundaries."""
    import numpy as np
    import pandas as pd
    import ray.data

    from feature_fabrica_ray.pipelines import sortedness

    rng = np.random.default_rng(163)
    n = 2000
    base = pd.DataFrame({"o": np.arange(n, dtype=np.int64)})
    for vals, lo, hi in [
        (np.arange(n, dtype=float), 1.0, 1.0),
        (np.arange(n, dtype=float)[::-1].copy(), 0.0, 0.01),
        (rng.permutation(n).astype(float), 0.4, 0.6),
    ]:
        df = base.assign(v=vals)
        ds = ray.data.from_pandas(df).repartition(4)
        out = sortedness(ds, "o", "v").iloc[0]
        assert int(out["n_pairs"]) == n - 1
        want = int((np.diff(vals) >= 0).sum())
        assert int(out["n_sorted"]) == want
        assert lo <= out["frac_sorted"] <= hi, out


def test_categorical_profile(ray_session):
    """Per-column distinct/entropy/top-share/nulls equal Counter math
    across two columns with planted nulls; layout-invariant."""
    import numpy as np
    import pandas as pd
    import ray.data

    from feature_fabrica_ray.pipelines import categorical_profile

    rng = np.random.default_rng(179)
    n = 2000
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n, p=[0.7, 0.2, 0.1]),
        "b": [f"v{i % 50}" for i in range(n)]})
    df.loc[rng.choice(n, 100, replace=False), "a"] = None

    for blocks in (1, 4):
        ds = ray.data.from_pandas(df).repartition(blocks)
        out = categorical_profile(ds, ["a", "b"]).set_index("column")
        va = df["a"].dropna()
        p = va.value_counts(normalize=True).to_numpy()
        assert int(out.loc["a", "nulls"]) == 100
        assert int(out.loc["a", "n_distinct"]) == 3
        assert out.loc["a", "entropy"] == pytest.approx(
            round(float(-(p * np.log2(p)).sum()), 6), abs=2e-6)
        assert out.loc["a", "top_share"] == pytest.approx(
            round(float(p.max()), 6), abs=2e-6)
        assert int(out.loc["b", "n_distinct"]) == 50
        assert int(out.loc["b", "nulls"]) == 0


def test_suite_missing_column_fails_at_plan_time(ray_session):
    """A check naming a nonexistent column must raise a plain
    ValueError naming it BEFORE any Ray task launches (regression:
    used to surface as a wrapped CheckSpecError mid-pass)."""
    import pyarrow as pa
    import ray.data as rd

    from feature_fabrica_ray.checks.suite import CheckSuite
    from feature_fabrica_ray.pipelines.validate import run_suite

    t = pa.table({"repo": ["a", "b"], "lang": ["py", None]})
    suite = CheckSuite([{"type": "not_null", "name": "bad",
                         "column": "nonexistent"}])
    with pytest.raises(ValueError, match="nonexistent"):
        run_suite(rd.from_arrow(t), suite, partition_col="repo")


def test_pk_candidate_profile(ray_session):
    """pk_candidate_profile: a true key passes, a null-bearing column
    fails on n_valid, a duplicated combo fails on n_distinct, and the
    counts are exact and layout-invariant."""
    import ray
    from feature_fabrica_ray.pipelines import pk_candidate_profile

    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5, 6],               # true key
        "grp": ["a", "a", "b", "b", "c", "c"],   # duplicates
        "maybe": [1.0, 2.0, None, 4.0, 5.0, 6.0],  # null-bearing unique
        "sub": [1, 2, 1, 2, 1, 2]})
    ds = ray.data.from_pandas(df).repartition(3)
    out = pk_candidate_profile(
        ds, [["id"], ["grp"], ["maybe"], ["grp", "sub"]])
    r = {row.combo: row for row in out.itertuples()}
    assert r["id"].is_key == 1 and r["id"].n_distinct == 6
    assert r["grp"].is_key == 0 and r["grp"].n_distinct == 3 \
        and r["grp"].n_valid == 6
    assert r["maybe"].is_key == 0 and r["maybe"].n_valid == 5 \
        and r["maybe"].n_distinct == 5
    assert r["grp,sub"].is_key == 1 and r["grp,sub"].n_distinct == 6
    assert (out["n_rows"] == 6).all()

    one = pk_candidate_profile(
        ray.data.from_pandas(df), [["id"], ["grp"], ["maybe"],
                                   ["grp", "sub"]])
    pd.testing.assert_frame_equal(one, out)


def test_drift_timeline(ray_session):
    """drift_timeline pairs adjacent observed periods on one shared
    grid: a planted level shift fails exactly at its first period,
    identical periods measure PSI 0, empty calendar periods are
    skipped (adjacent-observed pairing), and the result is
    layout-invariant."""
    import ray
    from feature_fabrica_ray.pipelines import drift_timeline

    rng = np.random.default_rng(31)
    # three observed months: Jan, Feb (same dist), April (shifted;
    # March empty) — April pairs with FEBRUARY, not an all-zero March
    ts = (["2024-01-%02dT00:00:00" % (i % 28 + 1) for i in range(300)]
          + ["2024-02-%02dT00:00:00" % (i % 28 + 1) for i in range(300)]
          + ["2024-04-%02dT00:00:00" % (i % 28 + 1) for i in range(300)])
    base = rng.normal(10, 1, 300)
    df = pd.DataFrame({"ts": pd.to_datetime(ts),
                       "v": np.concatenate([base, base, base * 5])})
    out = drift_timeline(ray.data.from_pandas(df).repartition(4),
                         "ts", "v", threshold=0.1)
    assert list(out["period"]) == [202402, 202404]
    assert list(out["prev_period"]) == [202401, 202402]
    feb, apr = out.iloc[0], out.iloc[1]
    assert feb["metric"] == pytest.approx(0.0, abs=1e-12) and feb["passed"]
    assert apr["metric"] > 0.1 and not apr["passed"]
    assert (out["n_prev"] == 300).all() and (out["n_cur"] == 300).all()

    one = drift_timeline(ray.data.from_pandas(df), "ts", "v",
                         threshold=0.1)
    pd.testing.assert_frame_equal(one, out)

    with pytest.raises(ValueError, match="freq"):
        drift_timeline(ray.data.from_pandas(df), "ts", "v", freq="week")
