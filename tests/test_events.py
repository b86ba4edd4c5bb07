"""Event-stream operator tests: tumbling windows, sessionization, JSON
extraction — goldens on tiny frames + partitioning invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from feature_fabrica_ray.pipelines import (extract_json_int, sessionize,
                                           tumbling_window_agg)


def _ds(df, blocks=1):
    ds = ray.data.from_pandas(df)
    return ds.repartition(blocks) if blocks > 1 else ds


def _events():
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        (1, base, 7, 1.0),
        (2, base + pd.Timedelta(minutes=10), 7, 2.0),   # same session
        (3, base + pd.Timedelta(minutes=50), 7, 4.0),   # gap 40m -> new
        (4, base + pd.Timedelta(hours=3), 7, 8.0),      # new session
        (5, base + pd.Timedelta(minutes=5), 9, 16.0),   # other user
    ]
    return pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])


def test_sessionize_golden(ray_session):
    out = sessionize(_ds(_events(), blocks=2), "ts", "user_id", "value",
                     "event_id", gap_s=1800) \
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)
    got = out[["user_id", "session_id", "n_events", "sum_v"]].values.tolist()
    assert got == [[7, 0, 2, 3.0], [7, 1, 1, 4.0], [7, 2, 1, 8.0],
                   [9, 0, 1, 16.0]]
    assert out["duration_us"].tolist() == [600_000_000, 0, 0, 0]


def test_sessionize_gap_boundary(ray_session):
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts": [base, base + pd.Timedelta(seconds=1800),          # == gap: same
               base + pd.Timedelta(seconds=3600, microseconds=1)],  # > gap: new
        "user_id": [1, 1, 1], "value": [1.0, 1.0, 1.0]})
    out = sessionize(_ds(df), "ts", "user_id", "value", "event_id", gap_s=1800)
    assert sorted(out["session_id"].tolist()) == [0, 1]


def test_tumbling_window_golden(ray_session):
    out = tumbling_window_agg(_ds(_events(), blocks=3), "ts", "user_id",
                              "value", width_s=3600) \
        .sort_values(["user_id", "window_start"]).reset_index(drop=True)
    assert out["n"].tolist() == [3, 1, 1]
    assert out["sum_v"].tolist() == [7.0, 8.0, 16.0]
    assert out["window_start"].iloc[1] == pd.Timestamp("2024-01-01 03:00:00")


def test_tumbling_window_block_invariant(ray_session):
    a = tumbling_window_agg(_ds(_events(), blocks=1), "ts", "user_id", "value") \
        .sort_values(["user_id", "window_start"]).values.tolist()
    b = tumbling_window_agg(_ds(_events(), blocks=4), "ts", "user_id", "value") \
        .sort_values(["user_id", "window_start"]).values.tolist()
    assert a == b


def test_extract_json_int(ray_session):
    df = pd.DataFrame({"id": [1, 2, 3, 4],
                       "props": ['{"k": 69}', '{"a":1, "k": -3}', '{}', None]})
    out = extract_json_int(_ds(df), "props", "k", "prop_k").to_pandas() \
        .sort_values("id")
    vals = out["prop_k"].tolist()
    assert vals[0] == 69 and vals[1] == -3
    assert pd.isna(vals[2]) and pd.isna(vals[3])


def test_sliding_window_golden(ray_session):
    """width=2h, hop=1h: each event lands in exactly 2 windows; counts
    per (key, window) match a hand-computed golden and are
    block-layout invariant."""
    from feature_fabrica_ray.pipelines import sliding_window_agg

    df = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:50",
                              "2024-01-01 01:10"]),
        "user_id": [1, 1, 1],
        "value": [1.0, 2.0, 4.0],
    })
    out = sliding_window_agg(_ds(df), "ts", "user_id", "value",
                             width_s=7200, hop_s=3600) \
        .sort_values("window_us").reset_index(drop=True)
    h = 3_600_000_000
    base = int(pd.Timestamp("2024-01-01").value // 1000)
    got = {(int(r.window_us) - base) // h: (int(r.n), float(r.sum_v))
           for r in out.itertuples()}
    # window starting at -1h covers [−1h,1h): events at 0:10, 0:50
    assert got[-1] == (2, 3.0)
    # window at 0h covers [0,2h): all three events
    assert got[0] == (3, 7.0)
    # window at 1h covers [1h,3h): event at 1:10 only
    assert got[1] == (1, 4.0)
    out4 = sliding_window_agg(_ds(df, blocks=3), "ts", "user_id", "value",
                              width_s=7200, hop_s=3600) \
        .sort_values("window_us").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out4)

    with pytest.raises(ValueError):
        sliding_window_agg(_ds(df), "ts", "user_id", "value",
                           width_s=7200, hop_s=3500)


def test_shuffle_join_equals_broadcast(ray_session):
    """Native hash join (large x large path) returns the same joined
    rows as the broadcast map-side join."""
    from feature_fabrica_ray.pipelines import broadcast_join, shuffle_join

    left = pd.DataFrame({"k": [1, 2, 2, 3, 4], "v": [10, 20, 21, 30, 40]})
    right = pd.DataFrame({"k": [1, 2, 3], "name": ["a", "b", "c"]})
    lds, rds = _ds(left, blocks=2), _ds(right)
    b = broadcast_join(lds, rds, left_on="k").to_pandas() \
        .sort_values(["k", "v"]).reset_index(drop=True)
    s = shuffle_join(lds, rds, on="k", num_partitions=4).to_pandas() \
        .sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(b[["k", "v", "name"]], s[["k", "v", "name"]])


def test_cumulative_agg_golden(ray_session):
    """Running sum + row number per key in (ts, order) order, block-
    layout invariant."""
    from feature_fabrica_ray.pipelines import cumulative_agg

    df = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00",
                              "2024-01-01 02:00", "2024-01-01 00:30"]),
        "user_id": [1, 1, 1, 2],
        "event_id": [10, 11, 12, 13],
        "value": [1.0, 2.0, 4.0, 9.0],
    })
    out = cumulative_agg(_ds(df, blocks=3), "ts", "user_id", "value",
                         "event_id").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert out["cum_v"].tolist() == [1.0, 3.0, 7.0, 9.0]
    assert out["rn"].tolist() == [1, 2, 3, 1]


def test_rolling_agg_golden(ray_session):
    """window=3 rolling sum/avg per key vs a hand-computed golden,
    including the short head windows; block-layout invariant."""
    from feature_fabrica_ray.pipelines import rolling_agg

    df = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00",
                              "2024-01-01 02:00", "2024-01-01 03:00",
                              "2024-01-01 00:30"]),
        "user_id": [1, 1, 1, 1, 2],
        "event_id": [10, 11, 12, 13, 14],
        "value": [1.0, 2.0, 4.0, 8.0, 9.0],
    })
    for blocks in (1, 3):
        out = rolling_agg(_ds(df, blocks=blocks), "ts", "user_id", "value",
                          "event_id", window=3).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert out["roll_sum"].tolist() == [1.0, 3.0, 7.0, 14.0, 9.0]
        assert out["roll_avg"].tolist() == [1.0, 1.5, 7.0 / 3, 14.0 / 3, 9.0]
        assert out["roll_min"].tolist() == [1.0, 1.0, 1.0, 2.0, 9.0]
        assert out["roll_max"].tolist() == [1.0, 2.0, 4.0, 8.0, 9.0]


def test_rolling_agg_matches_pandas(ray_session):
    """Randomized agreement with pandas groupby().rolling() across a
    window larger than some groups."""
    from feature_fabrica_ray.pipelines import rolling_agg

    rng = np.random.default_rng(7)
    n = 200
    df = pd.DataFrame({
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
        "user_id": rng.integers(0, 9, n),
        "event_id": np.arange(n),
        "value": rng.normal(100.0, 30.0, n).round(3),
    })
    out = rolling_agg(_ds(df, blocks=4), "ts", "user_id", "value",
                      "event_id", window=5).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    exp = df.sort_values(["user_id", "ts", "event_id"]).copy()
    r = exp.groupby("user_id")["value"].rolling(5, min_periods=1)
    exp["roll_sum"] = r.sum().to_numpy()
    exp["roll_avg"] = r.mean().to_numpy()
    exp["roll_min"] = r.min().to_numpy()
    exp["roll_max"] = r.max().to_numpy()
    exp = exp.sort_values("event_id").reset_index(drop=True)
    np.testing.assert_allclose(out["roll_sum"], exp["roll_sum"], atol=1e-9)
    np.testing.assert_allclose(out["roll_avg"], exp["roll_avg"], atol=1e-9)
    np.testing.assert_allclose(out["roll_min"], exp["roll_min"], atol=0)
    np.testing.assert_allclose(out["roll_max"], exp["roll_max"], atol=0)


def test_rolling_agg_window_validation(ray_session):
    from feature_fabrica_ray.pipelines import rolling_agg

    with pytest.raises(ValueError):
        rolling_agg(_ds(_events()), "ts", "user_id", "value", "event_id",
                    window=0)


def test_distinct_count_per_group(ray_session):
    """Exact per-key COUNT(DISTINCT v)/COUNT(*): nulls count as rows but
    not as distinct values; block-layout invariant."""
    from feature_fabrica_ray.pipelines import distinct_count_per_group

    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", "c"],
        "v": ["x", "x", "y", "z", None, None],
    })
    for blocks in (1, 4):
        out = distinct_count_per_group(_ds(df, blocks=blocks), "k", "v")
        assert out["k"].tolist() == ["a", "b", "c"]
        assert out["n_distinct"].tolist() == [2, 1, 0]
        assert out["n_rows"].tolist() == [3, 2, 1]


def test_rollup_agg_golden(ray_session):
    """Two-level ROLLUP sums/counts vs hand-computed golden; rolled-up
    cells are None; block-layout invariant."""
    from feature_fabrica_ray.pipelines import rollup_agg

    df = pd.DataFrame({
        "a": ["x", "x", "x", "y"],
        "b": ["p", "p", "q", "p"],
        "v": [1, 2, 4, 8],
    })
    for blocks in (1, 3):
        out = rollup_agg(_ds(df, blocks=blocks), ["a", "b"], "v")
        got = {(r.a, r.b): (r.sum_v, r.n_rows) for r in out.itertuples()}
        assert got == {("x", "p"): (3.0, 2), ("x", "q"): (4.0, 1),
                       ("y", "p"): (8.0, 1), ("x", None): (7.0, 3),
                       ("y", None): (8.0, 1), (None, None): (15.0, 4)}
        assert len(out) == 6


def test_cube_agg_golden(ray_session):
    """Two-level CUBE: all 4 subset levels vs hand-computed golden —
    ROLLUP's levels plus the (None, b) slice; block-layout invariant."""
    from feature_fabrica_ray.pipelines import cube_agg

    df = pd.DataFrame({
        "a": ["x", "x", "x", "y"],
        "b": ["p", "p", "q", "p"],
        "v": [1, 2, 4, 8],
    })
    for blocks in (1, 3):
        out = cube_agg(_ds(df, blocks=blocks), ["a", "b"], "v")
        got = {(r.a, r.b): (r.sum_v, r.n_rows) for r in out.itertuples()}
        assert got == {("x", "p"): (3.0, 2), ("x", "q"): (4.0, 1),
                       ("y", "p"): (8.0, 1), ("x", None): (7.0, 3),
                       ("y", None): (8.0, 1), (None, "p"): (11.0, 3),
                       (None, "q"): (4.0, 1), (None, None): (15.0, 4)}
        assert len(out) == 8


def test_grouping_sets_agg(ray_session):
    """Explicit GROUPING SETS: only the requested levels appear, a
    duplicated set duplicates its rows (SQL parity), unknown columns
    raise; block-layout invariant."""
    from feature_fabrica_ray.pipelines import grouping_sets_agg

    df = pd.DataFrame({
        "a": ["x", "x", "x", "y"],
        "b": ["p", "p", "q", "p"],
        "v": [1, 2, 4, 8],
    })
    for blocks in (1, 3):
        out = grouping_sets_agg(_ds(df, blocks=blocks), ["a", "b"], "v",
                                sets=[["b"], []])
        got = {(r.a, r.b): (r.sum_v, r.n_rows) for r in out.itertuples()}
        assert got == {(None, "p"): (11.0, 3), (None, "q"): (4.0, 1),
                       (None, None): (15.0, 4)}
        assert len(out) == 3

    dup = grouping_sets_agg(_ds(df), ["a", "b"], "v", sets=[[], []])
    assert len(dup) == 2 and dup["sum_v"].tolist() == [15.0, 15.0]

    with pytest.raises(ValueError):
        grouping_sets_agg(_ds(df), ["a", "b"], "v", sets=[["nope"]])


def test_histogram_fixed(ray_session):
    """Exact integer binning with clamping at both ends; empty bins are
    dropped; block-layout invariant."""
    from feature_fabrica_ray.pipelines import histogram_fixed

    df = pd.DataFrame({"x": [0, 5, 10, 19, 20, 99, 100, 100, 250]})
    for blocks in (1, 4):
        out = histogram_fixed(_ds(df, blocks=blocks), "x",
                              lo=0, width=10, nbins=11)
        got = dict(zip(out["bin"], out["n"]))
        # 250 clamps into the last bin (10); bin 9 (90..99) holds 99
        assert got == {0: 2, 1: 2, 2: 1, 9: 1, 10: 3}


def test_grouped_stats(ray_session):
    """Per-segment count/nulls/min/max/sum/mean with a NULL segment key,
    an all-null segment, and the null-rate threshold form."""
    from feature_fabrica_ray.pipelines import grouped_stats

    df = pd.DataFrame({
        "g": ["a", "a", "a", "b", None, None, "c"],
        "x": [1.0, 3.0, None, 5.0, 7.0, 9.0, None],
    })
    for blocks in (1, 3):
        out = grouped_stats(_ds(df, blocks=blocks), "g", "x",
                            max_null_rate=0.4)
        by = {r.g: r for r in out.itertuples()}
        a = by["a"]
        assert (a.cnt, a.nulls, a.nmin, a.nmax, a.nsum, a.mean) == \
            (2, 1, 1.0, 3.0, 4.0, 2.0)
        assert bool(a.passed)        # null rate 1/3 <= 0.4
        c = by["c"]
        assert (c.cnt, c.nulls) == (0, 1)
        assert np.isnan(c.nmin) and np.isnan(c.nsum) and np.isnan(c.mean)
        none_key = by[None]
        assert (none_key.cnt, none_key.nulls, none_key.nsum) == (2, 0, 16.0)
        assert bool(by["b"].passed) and bool(none_key.passed)
        assert not bool(c.passed)


def test_lag_lead_golden(ray_session):
    """LAG/LEAD with offset 2: nulls at both partition edges, delta only
    where lag exists; block-layout invariant."""
    from feature_fabrica_ray.pipelines import lag_lead

    df = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00",
                              "2024-01-01 02:00", "2024-01-01 03:00",
                              "2024-01-01 00:30"]),
        "user_id": [1, 1, 1, 1, 2],
        "event_id": [10, 11, 12, 13, 14],
        "value": [1.0, 2.0, 4.0, 8.0, 9.0],
    })
    for blocks in (1, 3):
        out = lag_lead(_ds(df, blocks=blocks), "ts", "user_id", "value",
                       "event_id", offset=2).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        lag = out["lag_v"].tolist()
        lead = out["lead_v"].tolist()
        assert np.isnan(lag[0]) and np.isnan(lag[1]) and np.isnan(lag[4])
        assert lag[2:4] == [1.0, 2.0]
        assert lead[0:2] == [4.0, 8.0]
        assert np.isnan(lead[2]) and np.isnan(lead[3]) and np.isnan(lead[4])
        assert out["delta_prev"][2:4].tolist() == [3.0, 6.0]

    with pytest.raises(ValueError):
        lag_lead(_ds(df), "ts", "user_id", "value", "event_id", offset=0)


def test_time_rolling_agg(ray_session):
    """RANGE-window semantics vs a brute-force reference: trailing-span
    sums/counts with inclusive boundaries and the peer rule (ts ties all
    see the full peer group). Block-layout invariant."""
    from feature_fabrica_ray.pipelines import time_rolling_agg

    rng = np.random.default_rng(11)
    n = 120
    base = np.datetime64("2024-01-01T00:00:00", "us")
    secs = np.sort(rng.integers(0, 400, n))
    secs[10] = secs[11] = secs[12]          # planted peer group
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 4, n),
        "ts": base + secs.astype("timedelta64[s]"),
        "value": rng.uniform(0, 10, n).round(2),
    })
    span = 60

    def brute(g):
        t = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        v = g["value"].to_numpy()
        lo_t = t - span * 1_000_000
        return pd.DataFrame({
            "event_id": g["event_id"],
            "bsum": [v[(t >= lo) & (t <= cur)].sum()
                     for lo, cur in zip(lo_t, t)],
            "bcnt": [int(((t >= lo) & (t <= cur)).sum())
                     for lo, cur in zip(lo_t, t)]})

    want = pd.concat([brute(g) for _, g in df.groupby("user_id")]) \
        .sort_values("event_id").reset_index(drop=True)
    for blocks in (1, 4):
        out = time_rolling_agg(_ds(df, blocks=blocks), "ts", "user_id",
                               "value", span_s=span).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert np.allclose(out["tsum"], want["bsum"])
        assert out["tcnt"].tolist() == want["bcnt"].tolist()

    with pytest.raises(ValueError):
        time_rolling_agg(_ds(df), "ts", "user_id", "value", span_s=-1)


def test_rank_ntile_golden(ray_session):
    """RANK leaves gaps on ties, DENSE_RANK doesn't; NTILE(4) fills the
    first n%4 buckets with one extra row; a 2-row key gets one row per
    bucket. Block-layout invariant."""
    from feature_fabrica_ray.pipelines import rank_ntile

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 1, 1, 1, 2, 2],
        "event_id": [1, 2, 3, 4, 5, 6, 7, 8, 9],
        "value": [5.0, 5.0, 3.0, 3.0, 3.0, 1.0, 9.0, 2.0, 2.0],
    })
    for blocks in (1, 3):
        out = rank_ntile(_ds(df, blocks=blocks), "user_id", "value",
                         "event_id", tiles=4).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert out["rnk"].tolist() == [2, 2, 4, 4, 4, 7, 1, 1, 1]
        assert out["drnk"].tolist() == [2, 2, 3, 3, 3, 4, 1, 1, 1]
        assert out["ntl"].tolist() == [1, 2, 2, 3, 3, 4, 1, 1, 2]

    with pytest.raises(ValueError):
        rank_ntile(_ds(df), "user_id", "value", "event_id", tiles=0)


def test_rank_ntile_random_vs_pandas(ray_session):
    """Randomized RANK/DENSE_RANK equality with pandas groupby.rank
    (method='min'/'dense', descending), plus NTILE bucket-size law:
    sizes differ by at most 1 and are non-increasing."""
    from feature_fabrica_ray.pipelines import rank_ntile

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 5, 200),
        "event_id": np.arange(200),
        "value": rng.integers(0, 8, 200).astype(np.float64),
    })
    out = rank_ntile(_ds(df, blocks=4), "user_id", "value", "event_id",
                     tiles=3).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    g = df.groupby("user_id")["value"]
    assert out["rnk"].tolist() == \
        g.rank(method="min", ascending=False).astype(int).tolist()
    assert out["drnk"].tolist() == \
        g.rank(method="dense", ascending=False).astype(int).tolist()
    for _, part in out.groupby("user_id"):
        sizes = part["ntl"].value_counts().sort_index()
        assert sizes.max() - sizes.min() <= 1
        assert (sizes.diff().dropna() <= 0).all()
        assert sizes.sum() == len(part)


def test_mode_per_group(ray_session):
    """Exact per-group mode: ties break toward the smallest value, null
    values never win, an all-null key emits no row. Block-layout
    invariant."""
    from feature_fabrica_ray.pipelines import mode_per_group

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 4 + ["c"] * 2,
        "v": [2.0, 2.0, 1.0, 1.0, 3.0,     # a: tie 2x2 vs 1x2 -> 1.0
              7.0, None, 7.0, 5.0,         # b: 7.0 x2 (null ignored)
              None, None],                 # c: all null -> no row
    })
    for blocks in (1, 3):
        out = mode_per_group(_ds(df, blocks=blocks), "k", "v")
        assert out["k"].tolist() == ["a", "b"]
        assert out["mode_v"].tolist() == [1.0, 7.0]
        assert out["mode_n"].tolist() == [2, 2]


def test_set_op_keys(ray_session):
    """SQL DISTINCT set semantics incl. null keys comparing equal:
    union/intersect/except over int keys with duplicates and nulls."""
    from feature_fabrica_ray.pipelines import set_op_keys

    a = _ds(pd.DataFrame({"x": pd.array([1, 2, 2, 3, None],
                                        dtype="Int64")}), blocks=2)
    b = _ds(pd.DataFrame({"y": pd.array([2, 4, None], dtype="Int64")}))

    def keys(op):
        out = set_op_keys(a, b, "x", "y", op).to_pandas()["k"]
        return sorted([None if pd.isna(v) else int(v) for v in out],
                      key=lambda v: (v is None, v))

    assert keys("union") == [1, 2, 3, 4, None]
    assert keys("intersect") == [2, None]
    assert keys("except") == [1, 3]

    with pytest.raises(ValueError):
        set_op_keys(a, b, "x", "y", "xor")


def test_explode_list(ray_session):
    """SQL UNNEST parity: one row per element with 1-based position,
    NULL and empty lists emit no rows, other columns repeat; stateless
    per-block (layout invariant by construction)."""
    import pyarrow as pa

    from feature_fabrica_ray.pipelines import explode_list

    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "tag": ["a", "b", "c", "d"],
        "xs": pa.array([[10, 20], [], None, [30]],
                       pa.list_(pa.int64())),
    })
    import ray.data
    for blocks in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        out = explode_list(ds, "xs", pos_col="p", val_col="v") \
            .to_pandas().sort_values(["id", "p"]).reset_index(drop=True)
        assert out["id"].tolist() == [1, 1, 4]
        assert out["tag"].tolist() == ["a", "a", "d"]
        assert out["p"].tolist() == [1, 2, 1]
        assert out["v"].tolist() == [10, 20, 30]


def test_string_agg_per_group(ray_session):
    """string_agg with ORDER BY and SQL null rules: nulls skipped,
    all-null group -> NULL, null group key gets its own row; layout
    invariant."""
    from feature_fabrica_ray.pipelines import string_agg_per_group

    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", None],
        "v": ["z", None, "x", None, None, "q"],
        "o": [3, 2, 1, 1, 2, 1],
    })
    for blocks in (1, 3):
        out = string_agg_per_group(_ds(df, blocks=blocks), "k", "v", "o",
                                   sep="|")
        got = dict(zip(out["k"], out["agg_s"]))
        assert got["a"] == "x|z"            # ordered by o, null skipped
        assert got["b"] is None             # all-null -> NULL
        assert got[None] == "q"


def test_first_last_value(ray_session):
    """FIRST_VALUE/LAST_VALUE over the whole partition in (ts, order)
    order incl. the ts-tie broken by order_col; layout invariant."""
    from feature_fabrica_ray.pipelines import first_last_value

    base = np.datetime64("2024-01-01", "us")
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [7, 7, 7, 9, 9],
        "ts": base + np.array([5, 0, 0, 2, 1]).astype("timedelta64[s]"),
        "value": [50.0, 20.0, 30.0, 1.0, 2.0],
    })
    for blocks in (1, 2):
        out = first_last_value(_ds(df, blocks=blocks), "ts", "user_id",
                               "value", "event_id").to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert out["fv"].tolist() == [20.0, 20.0, 20.0, 2.0, 2.0]
        assert out["lv"].tolist() == [50.0, 50.0, 50.0, 1.0, 1.0]


def test_bloom_filtered_join_equals_shuffle(ray_session):
    """Bloom pre-filter never changes the inner-join result (false
    positives are re-checked by the exact join, false negatives are
    impossible); outer joins are rejected."""
    from feature_fabrica_ray.pipelines import (bloom_filtered_join,
                                               shuffle_join)

    rng = np.random.default_rng(13)
    left = pd.DataFrame({"k": rng.integers(0, 1000, 500),
                         "v": np.arange(500)})
    right = pd.DataFrame({"k2": np.arange(0, 1000, 37),   # selective
                          "w": np.arange(0, 1000, 37) * 2})
    lds, rds = _ds(left, blocks=4), _ds(right, blocks=2)
    b = bloom_filtered_join(lds, rds, on="k", right_on="k2") \
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    s = shuffle_join(lds, rds, on="k", right_on="k2", num_partitions=8) \
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(b[["k", "v", "w"]], s[["k", "v", "w"]])
    assert (b["k"].to_numpy() % 37 == 0).all()     # join is selective

    with pytest.raises(ValueError):
        bloom_filtered_join(lds, rds, on="k", right_on="k2",
                            how="left outer")

    # over-cap filter -> graceful fallback to the plain hash join
    fb = bloom_filtered_join(lds, rds, on="k", right_on="k2",
                             max_bloom_bytes=1) \
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(fb[["k", "v", "w"]], s[["k", "v", "w"]])


def test_grouped_shape_and_entropy(ray_session):
    """Per-group skewness/kurtosis equal pandas skew()/kurt() and
    entropy equals -sum p log2 p, incl. a null-value row being skipped;
    block-layout invariant."""
    from feature_fabrica_ray.pipelines import entropy_per_group, grouped_shape

    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], 300),
        "v": rng.gamma(2.0, 3.0, 300),
        "c": rng.choice(["x", "y", "z"], 300),
    })
    df.loc[5, "v"] = None
    df.loc[7, "c"] = None
    for blocks in (1, 4):
        shape = grouped_shape(_ds(df, blocks=blocks), "k", "v").set_index("k")
        ent = entropy_per_group(_ds(df, blocks=blocks), "k", "c").set_index("k")
        for g, sub in df.groupby("k"):
            vv = sub["v"].dropna()
            assert abs(shape.loc[g, "skew"] - vv.skew()) < 1e-9
            assert abs(shape.loc[g, "kurt"] - vv.kurt()) < 1e-9
            assert shape.loc[g, "n"] == len(vv)
            cnt = sub["c"].dropna().value_counts().to_numpy(np.float64)
            p = cnt / cnt.sum()
            assert abs(ent.loc[g, "entropy"] - float(-(p * np.log2(p)).sum())) < 1e-12


def test_percent_rank_window_and_json_str(ray_session):
    """percent_rank/cume_dist tie semantics vs pandas (min-rank ties,
    peers-inclusive cume_dist), single-row key -> 0.0; string JSON
    extraction returns null for missing keys and null input."""
    from feature_fabrica_ray.pipelines import (extract_json_str,
                                               percent_rank_window)

    df = pd.DataFrame({
        "event_id": range(6),
        "user_id": [1, 1, 1, 1, 1, 2],
        "value": [3.0, 1.0, 3.0, 2.0, 5.0, 9.0],
    })
    out = percent_rank_window(_ds(df, blocks=2), "user_id", "value") \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    g = df[df.user_id == 1]["value"]
    want_pr = ((g.rank(method="min") - 1) / (len(g) - 1)).tolist()
    want_cd = (g.rank(method="max") / len(g)).tolist()
    assert out["prnk"].tolist()[:5] == pytest.approx(want_pr)
    assert out["cd"].tolist()[:5] == pytest.approx(want_cd)
    assert out["prnk"].iloc[5] == 0.0 and out["cd"].iloc[5] == 1.0

    js = pd.DataFrame({"id": [1, 2, 3],
                       "props": ['{"a": "x", "b": "y"}', '{"a": "z"}',
                                 None]})
    got = extract_json_str(_ds(js), "props", "b", "b_val").to_pandas() \
        .sort_values("id")
    assert got["b_val"].tolist()[0] == "y"
    assert pd.isna(got["b_val"].tolist()[1])
    assert pd.isna(got["b_val"].tolist()[2])


def test_unpivot(ray_session):
    """SQL UNPIVOT parity: one (name, value) row per non-null measure
    cell, other columns repeat, numeric measures unify to float64;
    drop_null=False keeps NULL cells; stateless per-block (layout
    invariant by construction)."""
    import pyarrow as pa
    import ray.data

    from feature_fabrica_ray.pipelines import unpivot

    tbl = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "a": pa.array([10, None], pa.int64()),
        "b": pa.array([1.5, 2.5], pa.float64()),
    })
    for blocks in (1, 2):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        out = unpivot(ds, ["a", "b"]) \
            .to_pandas().sort_values(["id", "name"]).reset_index(drop=True)
        assert out["id"].tolist() == [1, 1, 2]
        assert out["name"].tolist() == ["a", "b", "b"]
        assert out["value"].tolist() == [10.0, 1.5, 2.5]
    kept = unpivot(ray.data.from_arrow(tbl), ["a", "b"], drop_null=False) \
        .to_pandas()
    assert len(kept) == 4 and kept["value"].isna().sum() == 1
    # string measures unify to utf8
    st = pa.table({"id": [1], "x": ["u"], "y": [None]})
    out = unpivot(ray.data.from_arrow(st), ["x", "y"]).to_pandas()
    assert out["name"].tolist() == ["x"] and out["value"].tolist() == ["u"]


def test_global_row_number(ray_session):
    """row_number() OVER (ORDER BY k): positions are the exact sort
    ranks regardless of input block layout; descending and base=0
    variants; each row numbered exactly once."""
    import numpy as np
    import ray.data

    from feature_fabrica_ray.pipelines import global_row_number

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": rng.permutation(300), "v": np.arange(300)})
    for blocks in (1, 5):
        ds = ray.data.from_pandas(df).repartition(blocks)
        out = global_row_number(ds, "k").to_pandas()
        assert sorted(out["row_num"]) == list(range(1, 301))
        assert (out.sort_values("k")["row_num"].values
                == np.arange(1, 301)).all()
    desc = global_row_number(ray.data.from_pandas(df), "k",
                             descending=True, base=0).to_pandas()
    assert (desc.sort_values("k", ascending=False)["row_num"].values
            == np.arange(300)).all()


def test_fill_time_gaps():
    """Missing buckets appear with fill values between each key's first
    and last window; observed rows keep their values; per-key spans are
    independent; NULL keys pass through untouched."""
    from feature_fabrica_ray.pipelines import fill_time_gaps

    win = pd.DataFrame({
        "k": ["a", "a", "b", None],
        "window_start": pd.to_datetime(
            ["2024-01-01 00:00", "2024-01-01 03:00",
             "2024-01-01 01:00", "2024-01-01 02:00"]),
        "n": [2, 1, 5, 7],
        "sum_v": [4.0, 2.0, 9.0, 1.0],
    })
    out = fill_time_gaps(win, "k", "window_start", 3600,
                         fill={"n": 0, "sum_v": 0.0})
    a = out[out["k"] == "a"]
    assert len(a) == 4                      # 00,01,02,03
    assert a["n"].tolist() == [2, 0, 0, 1]
    assert a["sum_v"].tolist() == [4.0, 0.0, 0.0, 2.0]
    assert len(out[out["k"] == "b"]) == 1   # single bucket, no expansion
    assert out["k"].isna().sum() == 1       # null key passthrough


def test_ewma_per_key(ray_session):
    """Exact pandas ewm(adjust=False) parity per key in (ts, order)
    sequence; keys independent; layout-invariant."""
    import numpy as np
    import pandas as pd
    import ray

    from feature_fabrica_ray.pipelines import ewma_per_key

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2],
        "ts": [t0 + pd.Timedelta(seconds=k) for k in (0, 1, 2, 0, 1)],
        "v": [10.0, 20.0, 30.0, 100.0, 0.0],
        "eid": [1, 2, 3, 4, 5],
    })
    ds = ray.data.from_pandas(df).repartition(3)
    out = ewma_per_key(ds, "ts", "u", "v", "eid", alpha=0.5) \
        .set_index("eid")["ewma"]
    want = {1: 10.0, 2: 15.0, 3: 22.5, 4: 100.0, 5: 50.0}
    for k, v in want.items():
        assert out[k] == v


def test_interarrival_stats(ray_session):
    """Gap stats per key in (ts, order) sequence; single-event keys
    emit no row."""
    import pandas as pd
    import ray

    from feature_fabrica_ray.pipelines import interarrival_stats

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "u": [1, 1, 1, 1, 2],
        "ts": [t0 + pd.Timedelta(seconds=k) for k in (0, 10, 30, 100, 5)],
        "eid": [1, 2, 3, 4, 5],
    })
    ds = ray.data.from_pandas(df).repartition(3)
    out = interarrival_stats(ds, "ts", "u", "eid").set_index("u")
    assert list(out.index) == [1]          # u2 has one event
    r = out.loc[1]
    assert r["n_gaps"] == 3
    assert r["mean_gap_s"] == round((10 + 20 + 70) / 3, 6)
    assert r["p50_gap_s"] == 20.0
    assert r["max_gap_us"] == 70_000_000


def test_rate_anomalies(ray_session):
    """A burst window is flagged against the trailing EWMA baseline;
    the first window and steady traffic are not."""
    import numpy as np
    import pandas as pd
    import ray

    from feature_fabrica_ray.pipelines import rate_anomalies

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: 2 events/hour for 4 hours, then a 30-event burst in hour 5
    for h in range(4):
        rows += [(1, t0 + pd.Timedelta(hours=h, minutes=m)) for m in (5, 35)]
    rows += [(1, t0 + pd.Timedelta(hours=4, minutes=m)) for m in range(30)]
    # user 2: steady 3/hour, never flagged
    for h in range(5):
        rows += [(2, t0 + pd.Timedelta(hours=h, minutes=m))
                 for m in (1, 21, 41)]
    df = pd.DataFrame(rows, columns=["u", "ts"])
    ds = ray.data.from_pandas(df).repartition(3)
    out = rate_anomalies(ds, "ts", "u", width_s=3600, alpha=0.5,
                         factor=3.0, min_count=5)
    assert set(out["u"]) == {1}
    assert len(out) == 1
    r = out.iloc[0]
    burst_win = int((t0 + pd.Timedelta(hours=4)).value // 1000)
    assert r["window_us"] == burst_win and r["n"] == 30
    assert r["baseline"] == 2.0       # EWMA of constant 2/hour


def test_windowed_distinct(ray_session):
    """Distinct-user counts per tumbling window match the hand
    enumeration; duplicate (window, key, user) rows collapse across
    blocks; NULL user excluded from distinct but kept in n_events."""
    from feature_fabrica_ray.pipelines import windowed_distinct

    t0 = pd.Timestamp("2026-01-01 10:00:00")
    df = pd.DataFrame({
        "ts": [t0, t0 + pd.Timedelta("10min"), t0 + pd.Timedelta("20min"),
               t0 + pd.Timedelta("70min"), t0 + pd.Timedelta("80min"),
               t0 + pd.Timedelta("5min"), None],
        "k": ["a", "a", "a", "a", "b", "a", "a"],
        "u": [1, 1, 2, 1, 1, None, 3],
    })
    out = windowed_distinct(_ds(df, blocks=3), "ts", "k", "u", hours=1)
    rows = {(str(r.window), r.k): (r.n_distinct, r.n_events)
            for r in out.itertuples()}
    assert rows == {
        # 10:00 window, k=a: users {1,2} + a NULL-user event
        ("2026-01-01 10:00:00", "a"): (2, 4),
        ("2026-01-01 11:00:00", "a"): (1, 1),
        ("2026-01-01 11:00:00", "b"): (1, 1),
    }
    # layout invariance
    a = windowed_distinct(_ds(df, blocks=1), "ts", "k", "u")
    pd.testing.assert_frame_equal(a, out)


def test_cumulative_distinct(ray_session):
    """Running distinct-type count per key matches the hand fold:
    repeats don't bump the counter, NULL types never count, ties on
    ts break by order col, and block layout doesn't matter."""
    from feature_fabrica_ray.pipelines import cumulative_distinct

    t0 = pd.Timestamp("2026-01-01")
    df = pd.DataFrame({
        "ts": [t0, t0 + pd.Timedelta("1min"), t0 + pd.Timedelta("2min"),
               t0 + pd.Timedelta("3min"), t0 + pd.Timedelta("3min"),
               t0, t0 + pd.Timedelta("1min")],
        "k": [1, 1, 1, 1, 1, 2, 2],
        "t": ["x", "y", "x", None, "z", "q", "q"],
        "oid": [10, 11, 12, 13, 14, 20, 21],
    })
    out = cumulative_distinct(_ds(df, blocks=3), "ts", "k", "t", "oid") \
        .to_pandas().sort_values("oid").reset_index(drop=True)
    assert out["cum_types"].tolist() == [1, 2, 2, 2, 3, 1, 1]
    assert list(out.columns) == ["k", "oid", "cum_types"]
    one = cumulative_distinct(_ds(df, blocks=1), "ts", "k", "t", "oid") \
        .to_pandas().sort_values("oid").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, out)


def test_cusum_per_key(ray_session):
    """CUSUM excursion range matches the hand fold: a level shift blows
    the range up, a constant series folds to ~0, NULL values drop out,
    and block layout doesn't matter."""
    from feature_fabrica_ray.pipelines import cusum_per_key

    t0 = pd.Timestamp("2026-01-01")
    # key "shift": 0,0,0,10,10,10 -> mean 5, S = [-5,-10,-15,-10,-5,0]
    # range = 0 - (-15) = 15. key "flat": constant -> range 0.
    df = pd.DataFrame({
        "ts": list(pd.date_range(t0, periods=6, freq="1min")) * 2,
        "k": ["shift"] * 6 + ["flat"] * 6,
        "v": [0.0, 0, 0, 10, 10, 10, 3, 3, None, 3, 3, 3],
        "oid": list(range(12)),
    })
    out = cusum_per_key(_ds(df, blocks=3), "ts", "k", "v", "oid")
    rows = {r.k: (r.cusum_range, r.n) for r in out.itertuples()}
    assert rows["shift"] == (15.0, 6)
    assert rows["flat"] == (0.0, 5)          # NULL excluded from n
    one = cusum_per_key(_ds(df, blocks=1), "ts", "k", "v", "oid")
    pd.testing.assert_frame_equal(one, out)


def test_rolling_quantile(ray_session):
    """Rolling median/quantile per key matches pandas' reference fold:
    growing head windows, NULL skipped inside a frame, all-NULL frame
    NULL, and block layout doesn't matter."""
    from feature_fabrica_ray.pipelines import rolling_quantile

    t0 = pd.Timestamp("2026-01-01")
    df = pd.DataFrame({
        "ts": list(pd.date_range(t0, periods=6, freq="1min")) * 2,
        "k": ["a"] * 6 + ["b"] * 6,
        "v": [1.0, 9, 5, 3, 7, 11, None, None, 4.0, None, 2.0, 8.0],
        "oid": list(range(12)),
    })
    out = rolling_quantile(_ds(df, blocks=3), "ts", "k", "v", "oid",
                           window=3, qs=(0.5, 1.0),
                           out_cols=("roll_med", "roll_max")) \
        .to_pandas().sort_values("oid").reset_index(drop=True)
    # key a, window 3 medians: [1], [1,9], [1,9,5], [9,5,3], [5,3,7], [3,7,11]
    assert out.loc[:5, "roll_med"].tolist() == [1, 5, 5, 5, 5, 7]
    assert out.loc[:5, "roll_max"].tolist() == [1, 9, 9, 9, 7, 11]
    # key b: [N],[N,N],[N,N,4],[N,4,N],[4,N,2],[N,2,8]
    b = out.loc[6:, "roll_med"].tolist()
    assert np.isnan(b[0]) and np.isnan(b[1])
    assert b[2:] == [4.0, 4.0, 3.0, 5.0]
    one = rolling_quantile(_ds(df, blocks=1), "ts", "k", "v", "oid",
                           window=3, qs=(0.5, 1.0),
                           out_cols=("roll_med", "roll_max")) \
        .to_pandas().sort_values("oid").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, out)


def test_scd2_intervals_vs_pandas(ray_session):
    import ray.data
    from feature_fabrica_ray.pipelines import scd2_intervals

    rng = np.random.default_rng(21)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 20, size=n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10**6, size=n), unit="s"),
    })
    got = scd2_intervals(ray.data.from_pandas(df).repartition(4),
                         "user_id", "ts", "event_id").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = df.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").copy()
    want["valid_from"] = want["ts"]
    want["valid_to"] = want.groupby("user_id")["ts"].shift(-1)
    want["is_current"] = want["valid_to"].isna()
    want = want.sort_values("event_id").reset_index(drop=True)
    assert (got["valid_from"].to_numpy()
            == want["valid_from"].to_numpy()).all()
    vt_g, vt_w = got["valid_to"], want["valid_to"]
    assert (vt_g.isna() == vt_w.isna()).all()
    assert (vt_g.dropna().to_numpy() == vt_w.dropna().to_numpy()).all()
    assert (got["is_current"].to_numpy()
            == want["is_current"].to_numpy()).all()
    # exactly one current row per key
    assert got.groupby("user_id")["is_current"].sum().eq(1).all()
    # bucket-count invariance
    g2 = scd2_intervals(ray.data.from_pandas(df).repartition(4),
                        "user_id", "ts", "event_id", n_buckets=3) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    assert (g2["is_current"].to_numpy()
            == got["is_current"].to_numpy()).all()


def test_interval_coverage_vs_bruteforce(ray_session):
    import ray.data
    from feature_fabrica_ray.pipelines import interval_coverage

    rng = np.random.default_rng(31)
    n = 400
    s = rng.integers(0, 1000, size=n)
    df = pd.DataFrame({"k": rng.integers(0, 12, size=n),
                       "s": s, "e": s + rng.integers(1, 60, size=n)})
    # planted edges: zero/negative-length dropped, nulls dropped
    extra = pd.DataFrame({"k": [0, 0, 1], "s": [5, 7, None],
                          "e": [5, 3, 10]})
    full = pd.concat([df, extra], ignore_index=True)
    got = interval_coverage(ray.data.from_pandas(full).repartition(4),
                            "k", "s", "e")
    # brute force: per key, boolean timeline union
    for k in sorted(df["k"].unique()):
        sub = df[df["k"] == k]
        line = np.zeros(2000, bool)
        for a, b in zip(sub["s"], sub["e"]):
            line[int(a):int(b)] = True
        row = got[got["k"] == k].iloc[0]
        assert row["covered_us"] == int(line.sum()), k
        assert row["n_intervals"] == len(sub), k
        # islands merge on STRICT overlap (documented: touching
        # intervals are separate islands but contiguous coverage)
        ivs = sorted(zip(sub["s"], sub["e"]))
        isl, pm = 0, None
        for a, b in ivs:
            if pm is None or a >= pm:
                isl += 1
            pm = b if pm is None else max(pm, b)
        assert row["n_islands"] == isl, k


def test_window_null_ts_and_null_key(ray_session):
    """Null-ts events belong to no window (dropped); a NULL key is a
    real group (SQL GROUP BY); an all-null value group sums to NULL."""
    import ray.data as rd
    from feature_fabrica_ray.pipelines.events import (sliding_window_agg,
                                                      tumbling_window_agg)

    ev = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00:00", None,
                              "2024-01-01 00:10:00",
                              "2024-01-01 00:20:00"]),
        "user": ["u1", "u2", None, "u1"],
        "v": [1.0, 2.0, None, 3.0]})
    ds = rd.from_pandas(ev).repartition(2)
    w = tumbling_window_agg(ds, "ts", "user", "v", width_s=600)
    # the null-ts u2 row is gone; the null-key row is a group with NULL sum
    assert len(w) == 3
    nullrow = w[w["user"].isna()]
    assert len(nullrow) == 1
    assert nullrow["n"].iloc[0] == 1
    assert nullrow["sum_v"].isna().all()
    u1 = w[w["user"] == "u1"].sort_values("window_start")
    assert u1["sum_v"].tolist() == [1.0, 3.0]

    sw = sliding_window_agg(rd.from_pandas(ev).repartition(2),
                            "ts", "user", "v", width_s=1200, hop_s=600)
    assert sw[sw["user"].isna()]["n"].sum() == 2  # null-key row in 2 windows
    assert not sw["user"].isna().all()


def test_sax_words_reference(ray_session):
    """SAX words match a hand-computed reference: z-normalize, 4-seg
    PAA, breakpoint letters; constant series map to all-'c' (z=0);
    short series emit short words; layout invariance."""
    import numpy as np
    import pandas as pd
    import ray.data
    from feature_fabrica_ray.pipelines import sax_words

    # key 1: a clean V shape; key 2: constant; key 3: two rows
    df = pd.DataFrame({
        "user_id": [1] * 8 + [2] * 4 + [3] * 2,
        "ts": pd.to_datetime(np.arange(14), unit="s"),
        "event_id": np.arange(14, dtype=np.int64),
        "value": [4.0, 3.0, 1.0, 0.0, 0.0, 1.0, 3.0, 4.0,
                  7.0, 7.0, 7.0, 7.0, 5.0, 9.0]})

    def _ds(d, blocks=1):
        out = ray.data.from_pandas(d)
        return out.repartition(blocks) if blocks > 1 else out

    out = sax_words(_ds(df, blocks=3), "user_id", "ts", "value",
                    "event_id", w=4)
    m = dict(zip(out["user_id"], out["sax"]))
    v = np.array([4, 3, 1, 0, 0, 1, 3, 4.0])
    z = (v - v.mean()) / v.std()
    seg = [z[0:2].mean(), z[2:4].mean(), z[4:6].mean(), z[6:8].mean()]
    exp = "".join("a" if s < -0.6745 else "b" if s < 0
                  else "c" if s < 0.6745 else "d" for s in seg)
    assert m[1] == exp
    assert m[2] == "cccc"          # constant -> z=0 -> 'c'
    assert len(m[3]) == 2          # n < w -> shorter word
    one = sax_words(_ds(df), "user_id", "ts", "value", "event_id", w=4)
    pd.testing.assert_frame_equal(one, out)


def test_mann_kendall_trend(ray_session):
    """MK statistic matches the closed form on planted series: strictly
    rising daily counts give S = n(n-1)/2 and 'increasing'; a flat
    series gives S = 0 / 'none'."""
    import numpy as np
    import pandas as pd
    import ray.data
    from feature_fabrica_ray.pipelines import mann_kendall

    # day k has k+1 events -> strictly increasing daily counts
    days = np.repeat(np.arange(10), np.arange(1, 11))
    df = pd.DataFrame({"ts": pd.to_datetime(days, unit="D")})
    out = mann_kendall(ray.data.from_pandas(df).repartition(3), "ts")
    n = 10
    assert out["n"].iloc[0] == n
    assert out["s"].iloc[0] == n * (n - 1) // 2
    assert out["trend"].iloc[0] == "increasing"
    var_exp = n * (n - 1) * (2 * n + 5) / 18.0
    assert out["var_s"].iloc[0] == var_exp
    # flat: 5 days x 3 events
    flat = pd.DataFrame({"ts": pd.to_datetime(np.repeat(np.arange(5), 3),
                                              unit="D")})
    r = mann_kendall(ray.data.from_pandas(flat), "ts")
    assert r["s"].iloc[0] == 0 and r["trend"].iloc[0] == "none"


def test_watermark_late_events_planted(ray_session):
    """Watermark replay: an event arriving after the watermark passed
    its timestamp is late; the first arrival never is; on-time sums
    exclude late values; carry-in across arrival buckets is exact
    (many buckets over few rows forces cross-bucket seeding)."""
    import numpy as np
    import pandas as pd
    import ray.data
    from feature_fabrica_ray.pipelines import watermark_late_events

    base = pd.Timestamp("2024-01-01")
    rows = [
        # arrival order: ts advances, then one stale event 3h behind
        (0, base + pd.Timedelta(hours=0), 1, 1.0),
        (1, base + pd.Timedelta(hours=1), 1, 2.0),
        (2, base + pd.Timedelta(hours=4), 2, 4.0),
        (3, base + pd.Timedelta(hours=1), 1, 8.0),   # wm=4h-1h=3h > 1h -> late
        (4, base + pd.Timedelta(hours=3, minutes=30), 2, 16.0),  # 3.5h >= 3h -> on time
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "value"])
    out = watermark_late_events(
        ray.data.from_pandas(df).repartition(3), "ts", "user_id",
        "value", "event_id", window_s=3600, allowed_lateness_s=3600,
        n_buckets=4).to_pandas() \
        .sort_values(["user_id", "win_start"]).reset_index(drop=True)
    assert out["n_total"].sum() == 5
    assert out["n_late"].sum() == 1
    late_row = out[(out["user_id"] == 1)
                   & (out["win_start"] == base + pd.Timedelta(hours=1))]
    assert late_row["n_late"].iloc[0] == 1
    assert late_row["sum_on_time"].iloc[0] == 2.0   # 8.0 dropped
    one = watermark_late_events(ray.data.from_pandas(df), "ts",
                                "user_id", "value", "event_id",
                                window_s=3600, allowed_lateness_s=3600,
                                n_buckets=1).to_pandas() \
        .sort_values(["user_id", "win_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(one, out)


def test_time_rolling_agg_bucketed_shape(ray_session, monkeypatch):
    """time_rolling_agg runs through bucketed_by_key (one Python call
    per hash BUCKET, never one Ray round-trip per key): the spy proves
    the route, and the captured per_bucket callable resolves a
    500-key frame — every key's full window math — in ONE invocation,
    matching the brute-force reference."""
    from feature_fabrica_ray.pipelines import events

    captured = {}
    real = events.bucketed_by_key

    def spy(ds, key_col, per_bucket, n_buckets=None):
        captured["key_col"] = key_col
        captured["per_bucket"] = per_bucket
        return real(ds, key_col, per_bucket, n_buckets)

    monkeypatch.setattr(events, "bucketed_by_key", spy)

    rng = np.random.default_rng(23)
    n = 2000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 500, n),     # ~500 distinct keys
        "ts": base + rng.integers(0, 3600, n).astype("timedelta64[s]"),
        "value": rng.uniform(0, 10, n).round(2)})
    span = 120

    out = events.time_rolling_agg(_ds(df, blocks=4), "ts", "user_id",
                                  "value", span_s=span).to_pandas()
    assert captured["key_col"] == "user_id"
    assert len(out) == n

    # ONE local invocation handles ALL keys of its bucket at once
    local = captured["per_bucket"](df).sort_values("event_id") \
        .reset_index(drop=True)
    assert len(local) == n

    def brute(g):
        t = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        v = g["value"].to_numpy()
        lo_t = t - span * 1_000_000
        return pd.DataFrame({
            "event_id": g["event_id"],
            "bsum": [v[(t >= lo) & (t <= cur)].sum()
                     for lo, cur in zip(lo_t, t)],
            "bcnt": [int(((t >= lo) & (t <= cur)).sum())
                     for lo, cur in zip(lo_t, t)]})

    want = pd.concat([brute(g) for _, g in df.groupby("user_id")]) \
        .sort_values("event_id").reset_index(drop=True)
    for frame in (out.sort_values("event_id").reset_index(drop=True),
                  local):
        assert np.allclose(frame["tsum"], want["bsum"])
        assert frame["tcnt"].tolist() == want["bcnt"].tolist()


def test_last_touch_attribution(ray_session):
    """Hand-planted attribution scenarios: most-recent preceding
    non-conversion wins, the window cutoff nulls stale touches,
    conversions with no touch attribute to NULL, a conversion never
    attributes to another conversion, same-ts ties break by id
    (smaller id counts as preceding), users are isolated, and the
    result is layout invariant."""
    from feature_fabrica_ray.pipelines import last_touch_attribution

    base = np.datetime64("2024-01-01T00:00:00", "us")

    def ev(eid, uid, secs, typ):
        return {"event_id": eid, "user_id": uid,
                "ts": base + np.timedelta64(int(secs * 1_000_000), "us"),
                "event_type": typ}

    rows = [
        ev(1, 1, 0, "view"), ev(2, 1, 10, "click"),
        ev(3, 1, 20, "purchase"),            # -> click, lag 10
        ev(4, 1, 25, "purchase"),            # -> click (not purchase 3)
        ev(5, 2, 0, "purchase"),             # no touch -> NULL
        ev(6, 3, 0, "view"),
        ev(7, 3, 4000, "purchase"),          # window 3600 -> NULL
        ev(8, 4, 50, "click"),
        ev(9, 4, 50, "purchase"),            # same ts, id 8 < 9 -> click
        ev(10, 5, 0, "click"),               # other user: isolated
    ]
    df = pd.DataFrame(rows)
    for blocks in (1, 3):
        out = last_touch_attribution(
            _ds(df, blocks=blocks), "user_id", "ts", "event_type",
            "event_id", conv_type="purchase", window_s=3600) \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        assert out["event_id"].tolist() == [3, 4, 5, 7, 9]
        assert out["channel"].tolist()[0] == "click"
        assert out["lag_s"].iloc[0] == 10.0
        assert out["channel"].iloc[1] == "click"   # skips purchase 3
        assert out["lag_s"].iloc[1] == 15.0
        assert pd.isna(out["channel"].iloc[2])     # no touch
        assert pd.isna(out["channel"].iloc[3])     # outside window
        assert out["channel"].iloc[4] == "click"   # tie by id
        assert out["lag_s"].iloc[4] == 0.0

    with pytest.raises(ValueError):
        last_touch_attribution(_ds(df), "user_id", "ts", "event_type",
                               "event_id", conv_type="purchase",
                               window_s=-1)


def test_last_touch_attribution_nulls(ray_session):
    """Null semantics match the SQL form: null-user or null-ts rows are
    excluded entirely (a NaT touch must never attribute with a wrapped
    negative lag), and a null event_type is neither a touch nor a
    conversion; an all-unattributed layout still yields a STRING
    channel column (typed empty, not inferred null)."""
    from feature_fabrica_ray.pipelines import last_touch_attribution

    base = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame([
        # user 1: only touch has NULL ts -> purchase must be NULL-attr
        {"event_id": 1, "user_id": 1, "ts": pd.NaT, "event_type": "click"},
        {"event_id": 2, "user_id": 1, "ts": base, "event_type": "purchase"},
        # user 2: null-TYPE event is not a touch
        {"event_id": 3, "user_id": 2, "ts": base, "event_type": None},
        {"event_id": 4, "user_id": 2,
         "ts": base + np.timedelta64(5, "s"), "event_type": "purchase"},
        # null user: excluded entirely (its purchase emits no row)
        {"event_id": 5, "user_id": None, "ts": base,
         "event_type": "purchase"},
        # user 3: a real touch still works
        {"event_id": 6, "user_id": 3, "ts": base, "event_type": "view"},
        {"event_id": 7, "user_id": 3,
         "ts": base + np.timedelta64(2, "s"), "event_type": "purchase"},
    ])
    for blocks in (1, 3):
        out = last_touch_attribution(
            _ds(df, blocks=blocks), "user_id", "ts", "event_type",
            "event_id", conv_type="purchase", window_s=3600) \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        assert out["event_id"].tolist() == [2, 4, 7]
        assert pd.isna(out["channel"].iloc[0])      # NaT touch ignored
        assert pd.isna(out["lag_s"].iloc[0])
        assert pd.isna(out["channel"].iloc[1])      # null type not a touch
        assert out["channel"].iloc[2] == "view"
        assert out["lag_s"].iloc[2] == 2.0

    # all-unattributed input: channel column still string-typed
    solo = pd.DataFrame([{"event_id": 1, "user_id": 1, "ts": base,
                          "event_type": "purchase"},
                         {"event_id": 2, "user_id": 2, "ts": base,
                          "event_type": "purchase"}])
    ds_out = last_touch_attribution(_ds(solo, blocks=2), "user_id",
                                    "ts", "event_type", "event_id",
                                    conv_type="purchase")
    import pyarrow as pa_
    assert ds_out.schema().base_schema.field("channel").type == \
        pa_.string()
    got = ds_out.to_pandas()
    assert len(got) == 2 and got["channel"].isna().all()
