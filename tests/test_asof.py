"""As-of join: both physical forms (broadcast map-side, co-group
shuffle) must agree with pandas merge_asof exactly, including forward
direction and tolerance."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from feature_fabrica_ray.pipelines import asof_join, asof_join_broadcast


def _fixture(seed=3, n_l=400, n_r=150, keys=12):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "lid": np.arange(n_l),
        "k": rng.integers(0, keys, n_l),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10 ** 6, n_l), unit="s"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, keys, n_r),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10 ** 6, n_r), unit="s"),
        "rv": rng.random(n_r).round(3),
    })
    return left, right


def _expected(left, right, direction="backward", tolerance=None):
    kw = {"tolerance": pd.Timedelta(microseconds=tolerance)} if tolerance else {}
    return pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"),
                         on="ts", by="k", direction=direction, **kw) \
        .sort_values("lid")["rv"].to_numpy()


def _nan_eq(a, b):
    return bool(((np.isnan(a) & np.isnan(b)) | (a == b)).all())


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_both_forms_match_pandas(ray_session, direction):
    left, right = _fixture()
    lds = ray.data.from_pandas(left).repartition(5)
    rds = ray.data.from_pandas(right).repartition(3)
    exp = _expected(left, right, direction)
    bc = asof_join_broadcast(lds, rds, on="ts", by="k", right_cols=["rv"],
                             direction=direction) \
        .to_pandas().sort_values("lid")["rv"].to_numpy()
    cg = asof_join(lds, rds, on="ts", by="k", right_cols=["rv"],
                   direction=direction) \
        .to_pandas().sort_values("lid")["rv"].to_numpy()
    assert _nan_eq(exp, bc)
    assert _nan_eq(exp, cg)


def test_asof_tolerance(ray_session):
    left, right = _fixture(seed=9)
    tol = 50_000 * 1_000_000  # 50k seconds, in us
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right)
    exp = _expected(left, right, "backward", tolerance=tol)
    bc = asof_join_broadcast(lds, rds, on="ts", by="k", right_cols=["rv"],
                             tolerance_us=tol) \
        .to_pandas().sort_values("lid")["rv"].to_numpy()
    assert np.isnan(exp).any()          # tolerance actually drops matches
    assert _nan_eq(exp, bc)


def test_asof_unmatched_key_and_empty_right_group(ray_session):
    left = pd.DataFrame({"lid": [0, 1], "k": [99, 1],
                         "ts": pd.to_datetime(["2024-01-02", "2024-01-02"])})
    right = pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-01"]),
                          "rv": [7.0]})
    out = asof_join_broadcast(ray.data.from_pandas(left),
                              ray.data.from_pandas(right),
                              on="ts", by="k", right_cols=["rv"]) \
        .to_pandas().set_index("lid")
    assert np.isnan(out.loc[0, "rv"])
    assert out.loc[1, "rv"] == 7.0


@pytest.mark.parametrize("seed", [0, 1, 7, 42])
def test_asof_randomized_vs_pandas(ray_session, seed):
    """Randomized agreement with pandas merge_asof across seeds,
    duplicate timestamps included."""
    rng = np.random.default_rng(seed)
    n_l, n_r = 300, 120
    # coarse timestamps force duplicate (key, ts) collisions
    left = pd.DataFrame({
        "lid": np.arange(n_l),
        "k": rng.integers(0, 6, n_l),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 50, n_l), unit="h"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 6, n_r),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 50, n_r), unit="h"),
        "rv": np.arange(n_r, dtype=np.float64),  # distinct values
    })
    # dedupe (k, ts) on the right: with ties pandas keeps the LAST row
    # in sort order and so do we — dedupe to make the expectation unique
    right = right.drop_duplicates(["k", "ts"], keep="last")
    exp = _expected(left, right)
    got = asof_join_broadcast(ray.data.from_pandas(left).repartition(4),
                              ray.data.from_pandas(right),
                              on="ts", by="k", right_cols=["rv"]) \
        .to_pandas().sort_values("lid")["rv"].to_numpy()
    assert _nan_eq(exp, got)
    cg = asof_join(ray.data.from_pandas(left).repartition(4),
                   ray.data.from_pandas(right).repartition(3),
                   on="ts", by="k", right_cols=["rv"]) \
        .to_pandas().sort_values("lid")["rv"].to_numpy()
    assert _nan_eq(exp, cg)


def test_asof_right_only_key(ray_session):
    """A key present only on the right side must not break the co-group
    schema (its group has zero left rows)."""
    left = pd.DataFrame({"lid": [0], "k": [1],
                         "ts": pd.to_datetime(["2024-01-02"])})
    right = pd.DataFrame({"k": [1, 99], "ts": pd.to_datetime(
        ["2024-01-01", "2024-01-01"]), "rv": [7.0, 8.0]})
    out = asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    on="ts", by="k", right_cols=["rv"]).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["rv"] == 7.0


def test_pit_window_join(ray_session):
    """PIT windowed-aggregate join matches the hand enumeration:
    window is [lts - w, lts] inclusive, future rows never leak, null
    key/ts left rows match nothing, all-null-value windows sum NULL,
    and block layout doesn't matter."""
    import numpy as np
    from feature_fabrica_ray.pipelines import pit_window_join

    t0 = pd.Timestamp("2026-01-01 12:00:00")
    left = pd.DataFrame({
        "k": [1, 1, 2, 2, None, 1],
        "ts": [t0, t0 + pd.Timedelta("2h"), t0, t0 + pd.Timedelta("1h"),
               t0, None],
        "lid": [0, 1, 2, 3, 4, 5],
    })
    right = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, 2, None],
        "ts": [t0 - pd.Timedelta("30min"), t0,             # in win of lid0
               t0 + pd.Timedelta("90min"),                 # in win of lid1
               t0 + pd.Timedelta("3h"),                    # future: nobody
               t0 - pd.Timedelta("2h"),                    # too old for lid2@1h... wait w=1h
               t0 + pd.Timedelta("30min"),                 # in win of lid3
               t0],
        "v": [10.0, 20.0, None, 99.0, 5.0, 7.0, 1.0],
    })
    import ray.data
    lds = ray.data.from_pandas(left).repartition(3)
    rds = ray.data.from_pandas(right).repartition(2)
    out = pit_window_join(lds, rds, on="ts", by="k", value_col="v",
                          window_us=3_600_000_000).to_pandas() \
        .sort_values("lid").reset_index(drop=True)
    # lid0 (k=1 @12:00, win [11:00,12:00]): rows at 11:30(10) and 12:00(20)
    # lid1 (k=1 @14:00, win [13:00,14:00]): row at 13:30 (v NULL) -> n=1 sum NULL
    # lid2 (k=2 @12:00): right k=2 rows at 10:00 (old) -> n=0
    # lid3 (k=2 @13:00): row at 12:30 (7) -> n=1 sum 7
    # lid4 null key, lid5 null ts -> n=0 sum NULL
    assert out["pit_n"].tolist() == [2, 1, 0, 1, 0, 0]
    sums = out["pit_sum"].tolist()
    assert sums[0] == 30.0 and sums[3] == 7.0
    assert all(np.isnan(s) for i, s in enumerate(sums) if i in (1, 2, 4, 5))
    one = pit_window_join(ray.data.from_pandas(left),
                          ray.data.from_pandas(right), on="ts", by="k",
                          value_col="v", window_us=3_600_000_000) \
        .to_pandas().sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, out)


# ---------------------------------------------------------------------------
# null / empty edges (regression: a NaT left ts cast to INT64_MIN and
# could "match" under forward/nearest; a null right ts crashed the
# int64 carrier; an empty right side crashed segment construction)
# ---------------------------------------------------------------------------

def test_asof_null_ts_and_empty_right(ray_session):
    L = ray.data.from_pandas(pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-02", None]),
         "sym": ["A", "A"], "px": [1.0, 2.0]}))
    R = ray.data.from_pandas(pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01", None]),
         "sym": ["A", "A"], "bid": [9.0, 8.0]}))

    b = asof_join_broadcast(L, R, on="ts", by="sym",
                            right_cols=["bid"]).to_pandas() \
        .sort_values("px")
    assert b["bid"].tolist()[0] == 9.0         # real row matches backward
    assert np.isnan(b["bid"].tolist()[1])      # NaT left ts matches nothing

    for direction in ("backward", "forward", "nearest"):
        c = asof_join(L, R, on="ts", by="sym", right_cols=["bid"],
                      direction=direction).to_pandas().sort_values("px")
        assert np.isnan(c["bid"].tolist()[1]), direction
        if direction in ("backward", "nearest"):
            assert c["bid"].tolist()[0] == 9.0, direction

    # empty right side: every left row keeps NULL right columns
    E = ray.data.from_pandas(pd.DataFrame(
        {"ts": pd.Series([], dtype="datetime64[us]"),
         "sym": pd.Series([], dtype="object"),
         "bid": pd.Series([], dtype="float64")}))
    a = asof_join_broadcast(L, E, on="ts", by="sym",
                            right_cols=["bid"]).to_pandas()
    assert len(a) == 2 and a["bid"].isna().all()
