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
