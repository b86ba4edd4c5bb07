"""End-to-end FeatureEngine tests over Ray Datasets with YAML specs —
mirrors the reference's e2e layer (tests/test_core.py goldens, FIXTURES.md
F2/F3): derived values, nested expressions, intermediate-stage imports,
group selection, window aggregates, global-fit ops, cyclic detection."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from feature_fabrica_ray.spec import CyclicDependencyError
from feature_fabrica_ray.stages import FeatureEngine

BASIC_SPEC = """
feature_a:
  description: raw numeric input a
  data_type: int32
feature_b:
  description: raw numeric input b
  data_type: int32
feature_c:
  description: half of a plus two b
  data_type: float32
  dependencies: [feature_a, feature_b]
  transformation: "(feature_a + 2 * feature_b) / 2"
feature_d:
  description: a times six over two
  data_type: float32
  dependencies: [feature_a]
  transformation: "(feature_a * 6) / 2"
"""


def _ds(d):
    return ray.data.from_pandas(pd.DataFrame(d))


def test_basic_dag_golden(ray_session):
    # reference golden: a=10,b=20 -> c = (10+2*20)/2 = 25.0 (test_core.py:28)
    eng = FeatureEngine(BASIC_SPEC)
    out = eng.transform(_ds({"feature_a": [10, 30], "feature_b": [20, 40]})).to_pandas()
    assert out["feature_c"].tolist() == [25.0, 55.0]
    assert out["feature_d"].tolist() == [30.0, 90.0]
    assert out["feature_c"].dtype == np.float32


def test_nested_expression_identities(ray_session):
    # reference: (a+b)/(a+b)=1, ((a+b)*2)/(a+b)=2 (test_core.py:96-116)
    spec = """
a: {description: raw input a, data_type: float64}
b: {description: raw input b, data_type: float64}
one:
  description: ratio of sum to itself
  data_type: float64
  dependencies: [a, b]
  transformation: "(a + b) / (a + b)"
two:
  description: doubled ratio identity
  data_type: float64
  dependencies: [a, b]
  transformation: "((a + b) * 2) / (a + b)"
"""
    out = FeatureEngine(spec).transform(
        _ds({"a": [3.0, 7.0], "b": [4.0, 9.0]})).to_pandas()
    assert out["one"].tolist() == [1.0, 1.0]
    assert out["two"].tolist() == [2.0, 2.0]


def test_chain_and_intermediate_stage_import(ray_session):
    # reference: feature_e:upper imported into concat ->
    # ["ORANGEorange", "APPLEapple"] (test_core.py:71-89)
    spec = """
feature_e:
  description: fruit string chain
  data_type: str
  transformation: "().upper().lower()"
feature_g:
  description: concat of upper and lower stages
  data_type: str
  dependencies: [feature_e]
  transformation: "(feature_e:upper, feature_e:lower).concat()"
"""
    out = FeatureEngine(spec).transform(
        _ds({"feature_e": ["Orange", "Apple"]})).to_pandas()
    assert out["feature_e"].tolist() == ["orange", "apple"]
    assert out["feature_g"].tolist() == ["ORANGEorange", "APPLEapple"]


def test_strip_and_one_hot(ray_session):
    spec = """
feature_f:
  description: stripped fruit string
  data_type: str
  transformation: "().strip()"
fruit_onehot:
  description: one hot of fruit
  data_type: int32
  dependencies: [feature_f]
  transformation: "(feature_f).one_hot(categories=['apple','orange'])"
"""
    out = FeatureEngine(spec).transform(_ds({"feature_f": ["orange ", " apple"]})).to_pandas()
    assert out["feature_f"].tolist() == ["orange", "apple"]
    assert [list(v) for v in out["fruit_onehot"]] == [[0, 1], [1, 0]]


def test_group_reduce_window_golden(ray_session):
    # reference golden: mean per key broadcast back -> [3.5,3.5,4,4,5.5,5.5]
    # (test_core.py:118-128); order lost in shuffle -> compare by key
    spec = """
key: {description: group key column, data_type: int64}
val: {description: value column for aggregation, data_type: float64}
group_mean:
  description: per key mean broadcast to rows
  data_type: float64
  dependencies: [key, val]
  transformation: "(val).group_reduce(key_feature=key, agg=mean)"
"""
    out = FeatureEngine(spec).transform(
        _ds({"key": [1, 1, 2, 2, 3, 3], "val": [2.0, 5.0, 2.0, 6.0, 2.0, 9.0]})
    ).to_pandas().sort_values(["key", "val"]).reset_index(drop=True)
    assert out["group_mean"].tolist() == [3.5, 3.5, 4.0, 4.0, 5.5, 5.5]
    assert len(out) == 6  # row count preserved (window semantics)


def test_group_reduce_uneven_and_string_key(ray_session):
    # reference: uneven groups sum -> [5,5,9,9,6]; string concat per key
    # (test_aggregate_transform.py:19-28,80-106)
    spec = """
k: {description: string group key, data_type: str}
v: {description: int value column, data_type: int64}
group_sum:
  description: per key sum broadcast to rows
  data_type: int64
  dependencies: [k, v]
  transformation: "(v).group_reduce(key_feature=k, agg=sum)"
"""
    out = FeatureEngine(spec).transform(
        _ds({"k": ["a", "a", "b", "b", "c"], "v": [2, 3, 4, 5, 6]})
    ).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    assert out["group_sum"].tolist() == [5, 5, 9, 9, 6]


def test_global_fit_zscore_and_minmax(ray_session):
    # self-fitting ops must use GLOBAL stats regardless of block splits
    vals = np.arange(100, dtype=np.float64)
    spec = """
x: {description: raw numeric column, data_type: float64}
z:
  description: global z score of x
  data_type: float64
  dependencies: [x]
  transformation: "(x).z_score()"
mm:
  description: global min max of x
  data_type: float64
  dependencies: [x]
  transformation: "(x).min_max()"
"""
    ds = _ds({"x": vals}).repartition(7)  # force multiple blocks
    out = FeatureEngine(spec).transform(ds).to_pandas().sort_values("x")
    np.testing.assert_allclose(out["z"].to_numpy(),
                               (vals - vals.mean()) / vals.std(), rtol=1e-12)
    np.testing.assert_allclose(out["mm"].to_numpy(), vals / 99.0, rtol=1e-12)


def test_global_fit_label_encode(ray_session):
    # self-fitting encoder == given-categories encoder with global sorted
    # distincts, regardless of partitioning (F4 two-pass correctness)
    spec = """
fruit: {description: fruit string column, data_type: str}
code:
  description: label code of fruit
  data_type: int32
  dependencies: [fruit]
  transformation: "(fruit).label_encode()"
"""
    ds = _ds({"fruit": ["cherry", "apple", "banana", "apple", "cherry"]}).repartition(3)
    out = FeatureEngine(spec).transform(ds).to_pandas().sort_values("fruit")
    got = dict(zip(out["fruit"], out["code"]))
    assert got == {"apple": 0, "banana": 1, "cherry": 2}


def test_select_groups(ray_session):
    spec = """
a: {description: raw input a, data_type: float64}
doubled:
  description: two times a
  data_type: float64
  group: out
  dependencies: [a]
  transformation: "(a) * 2"
tripled:
  description: three times a
  data_type: float64
  group: other
  dependencies: [a]
  transformation: "(a) * 3"
"""
    out = FeatureEngine(spec).transform(
        _ds({"a": [1.0]}), select_groups=["out"]).to_pandas()
    assert "doubled" in out.columns and "tripled" not in out.columns


def test_cyclic_dependency_raises():
    spec = """
p:
  description: cyclic feature p
  data_type: float64
  dependencies: [q]
  transformation: "(q) * 2"
q:
  description: cyclic feature q
  data_type: float64
  dependencies: [p]
  transformation: "(p) * 2"
"""
    with pytest.raises(CyclicDependencyError):
        FeatureEngine(spec)


def test_invalid_specs_rejected():
    import pydantic

    with pytest.raises(pydantic.ValidationError):
        FeatureEngine({"f": {"description": "ok", "data_type": "float64"}})  # desc <5
    with pytest.raises(Exception):
        FeatureEngine({"f": {"description": "long enough", "data_type": "notatype"}})


def test_global_fit_on_derived_feature(ray_session):
    """Self-fitting op whose input is itself a computed feature (level-2
    fit): the fit pass must see the upstream feature's values."""
    spec = """
a: {description: raw input column a, data_type: float64}
b: {description: raw input column b, data_type: float64}
ab_sum:
  description: sum of a and b
  data_type: float64
  dependencies: [a, b]
  transformation: "(a + b)"
ab_z:
  description: z score of the derived sum
  data_type: float64
  dependencies: [ab_sum]
  transformation: "(ab_sum).z_score()"
"""
    import numpy as np

    vals_a = [1.0, 2.0, 3.0, 4.0]
    vals_b = [10.0, 20.0, 30.0, 40.0]
    out = FeatureEngine(spec).transform(
        _ds({"a": vals_a, "b": vals_b})).to_pandas().sort_values("a")
    s = np.array(vals_a) + np.array(vals_b)
    expect = (s - s.mean()) / s.std()
    assert out["ab_z"].to_numpy() == pytest.approx(expect)


def test_example_spec_file(ray_session):
    """examples/basic_features.yaml runs end-to-end (reference parity:
    examples/basic_features.yaml + test_core.py goldens)."""
    with open("/root/repo/examples/basic_features.yaml") as f:
        eng = FeatureEngine(f.read())
    out = eng.transform(_ds({
        "feature_a": [10, 20], "feature_b": [20, 40],
        "feature_e": ["Orange", "Apple"]})).to_pandas().sort_values("feature_a")
    assert out["feature_c"].tolist() == [25.0, 50.0]
    assert out["feature_g"].tolist() == ["ORANGEorange", "APPLEapple"]
    assert out["feature_scaled"].tolist()[0] == pytest.approx(-1.0)


def test_group_reduce_string_concat(ray_session):
    # reference: string-concat reduction per key -> ['23','23','45','45','67','67']
    # (test_aggregate_transform.py:80-106); holistic agg -> map_groups path
    spec = """
k: {description: int group key column, data_type: int64}
s: {description: string value column, data_type: str}
group_cat:
  description: per key concatenated strings
  data_type: str
  dependencies: [k, s]
  transformation: "(s).group_reduce(key_feature=k, agg=concat)"
"""
    out = FeatureEngine(spec).transform(
        _ds({"k": [1, 1, 2, 2, 3, 3], "s": ["2", "3", "4", "5", "6", "7"]})
    ).to_pandas().sort_values(["k", "s"]).reset_index(drop=True)
    assert out["group_cat"].tolist() == ["23", "23", "45", "45", "67", "67"]


def test_group_reduce_mode_engine(ray_session):
    spec = """
k: {description: int group key column, data_type: int64}
v: {description: value column for mode, data_type: float64}
group_mode:
  description: per key smallest most frequent value
  data_type: float64
  dependencies: [k, v]
  transformation: "(v).group_reduce(key_feature=k, agg=mode)"
"""
    out = FeatureEngine(spec).transform(
        _ds({"k": [1, 1, 1, 2, 2], "v": [5.0, 5.0, 1.0, 7.0, 3.0]})
    ).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    assert out["group_mode"].tolist() == [5.0, 5.0, 5.0, 3.0, 3.0]


def test_constant_expression_broadcasts(ray_session):
    """A fully-constant expression broadcasts to every row (pa.Scalar
    results are unwrapped — found by the expression property test)."""
    spec = """
a: {description: raw input column a, data_type: float64}
four:
  description: constant two plus two
  data_type: float64
  dependencies: [a]
  transformation: "(2 + 2) + (a - a)"
"""
    out = FeatureEngine(spec).transform(_ds({"a": [1.0, 2.0, 3.0]})).to_pandas()
    assert out["four"].tolist() == [4.0, 4.0, 4.0]


def test_engine_reusable_across_transforms(ray_session):
    """'Compile once, run on any Dataset': transform() must not rewrite the
    compiled trees (group_reduce lowering) or leak fitted state (z_score)
    into the engine — a second call runs, and fits on ITS OWN data."""
    spec = """
key: {description: group key, data_type: int64}
x: {description: numeric input, data_type: float64}
gm:
  description: per key mean broadcast to rows
  data_type: float64
  dependencies: [key, x]
  transformation: "(x).group_reduce(key_feature=key, agg=mean)"
z:
  description: globally fitted z score
  data_type: float64
  dependencies: [x]
  transformation: "(x).z_score()"
"""
    eng = FeatureEngine(spec)
    d1 = {"key": [1, 1, 2, 2], "x": [1.0, 3.0, 5.0, 7.0]}
    out1 = eng.transform(_ds(d1)).to_pandas().sort_values("x").reset_index(drop=True)
    out1b = eng.transform(_ds(d1)).to_pandas().sort_values("x").reset_index(drop=True)
    pd.testing.assert_frame_equal(out1, out1b)

    # different data: group means and the z fit must come from d2, not d1
    d2 = {"key": [1, 1, 2, 2], "x": [10.0, 20.0, 30.0, 40.0]}
    out2 = eng.transform(_ds(d2)).to_pandas().sort_values("x").reset_index(drop=True)
    assert out2["gm"].tolist() == [15.0, 15.0, 35.0, 35.0]
    v = np.array(d2["x"])
    np.testing.assert_allclose(out2["z"].to_numpy(), (v - v.mean()) / v.std(),
                               rtol=1e-12)


def test_transform_with_lineage(ray_session):
    """Per-stage lineage (reference TNode parity): one row per
    (level, feature) with wall time, shape, and an order-independent
    output digest that is invariant to input partitioning."""
    spec = """
a: {description: input a, data_type: float64}
b:
  description: a scaled
  data_type: float64
  dependencies: [a]
  transformation: "(a).scale(factor=2)"
c:
  description: b plus one
  data_type: float64
  dependencies: [b]
  transformation: "(b) + 1"
"""
    eng = FeatureEngine(spec)
    d = {"a": [1.0, 2.0, 3.0, 4.0]}
    out, lin = eng.transform_with_lineage(_ds(d))
    df = out.to_pandas().sort_values("a").reset_index(drop=True)
    assert df["c"].tolist() == [3.0, 5.0, 7.0, 9.0]
    # one lineage row per feature, shaped and timed
    assert set(lin["feature"]) == {"a", "b", "c"}
    assert (lin["n_rows"] == 4).all()
    assert (lin["wall_s"] >= 0).all()
    assert lin["digest"].notna().all()
    # digests are partition-invariant (xor of row hashes)
    _, lin2 = eng.transform_with_lineage(_ds(d).repartition(3))
    m1 = lin.set_index("feature")["digest"]
    m2 = lin2.set_index("feature")["digest"]
    for f in ["a", "b", "c"]:
        assert m1[f] == m2[f]
    # plain transform unchanged by the refactor
    out2 = eng.transform(_ds(d)).to_pandas().sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(df, out2)


def test_group_reduce_null_keys_form_a_group(ray_session):
    """SQL PARTITION BY semantics on BOTH physical paths: null keys are
    a group of their own (broadcast/algebraic and shuffle/holistic agree)."""
    base = """
key: {description: group key column, data_type: str}
val: {description: value column here, data_type: float64}
gm:
  description: aggregated value per key
  data_type: float64
  dependencies: [key, val]
  transformation: "(val).group_reduce(key_feature=key, agg=AGG)"
"""
    df = pd.DataFrame({"key": ["a", "a", None, None],
                       "val": [1.0, 3.0, 10.0, 20.0]})
    mean_out = FeatureEngine(base.replace("AGG", "mean")).transform(
        _ds(df)).to_pandas().sort_values("val")["gm"].tolist()
    assert mean_out == [2.0, 2.0, 15.0, 15.0]          # broadcast path
    med_out = FeatureEngine(base.replace("AGG", "median")).transform(
        _ds(df)).to_pandas().sort_values("val")["gm"].tolist()
    assert med_out == [2.0, 2.0, 15.0, 15.0]           # shuffle path


def test_lineage_with_group_reduce(ray_session):
    """Lineage mode works through shuffle-lowered levels (group_reduce)
    and digests stay partition-invariant."""
    spec = """
key: {description: group key column, data_type: int64}
x: {description: numeric input col, data_type: float64}
gsum:
  description: per key sum broadcast
  data_type: float64
  dependencies: [key, x]
  transformation: "(x).group_reduce(key_feature=key, agg=sum)"
"""
    eng = FeatureEngine(spec)
    d = {"key": [1, 1, 2], "x": [1.0, 2.0, 5.0]}
    out, lin = eng.transform_with_lineage(_ds(d))
    assert out.to_pandas().sort_values("x")["gsum"].tolist() == [3.0, 3.0, 5.0]
    assert "gsum" in set(lin["feature"])
    _, lin2 = eng.transform_with_lineage(_ds(d).repartition(2))
    m1 = lin.set_index("feature")["digest"]
    m2 = lin2.set_index("feature")["digest"]
    assert m1["gsum"] == m2["gsum"]


def test_impute_strategies(ray_session):
    """impute: constant fill is stateless; mean/median are global
    two-phase fits over the non-null values (median via the t-digest
    fit pass — exact on small data); nulls-only change, non-null rows
    untouched; bad strategy / missing constant rejected at parse."""
    import pandas as pd

    from feature_fabrica_ray.functions import TransformationError
    from feature_fabrica_ray.functions.math import ImputeTransform

    spec = """
x: {description: values with nulls, data_type: float64}
x_mean:
  description: mean filled
  data_type: float64
  dependencies: [x]
  transformation: "(x).impute()"
x_med:
  description: median filled (exact value-histogram fit)
  data_type: float64
  dependencies: [x]
  transformation: "(x).impute(strategy='median')"
x_medt:
  description: median filled via the t-digest scale path
  data_type: float64
  dependencies: [x]
  transformation: "(x).impute(strategy='median', exact=False)"
x_c:
  description: constant filled
  data_type: float64
  dependencies: [x]
  transformation: "(x).impute(strategy='constant', value=9.5)"
"""
    vals = [1.0, None, 2.0, 6.0, None]     # mean 3.0, median 2.0
    out = FeatureEngine(spec).transform(_ds({"x": vals})).to_pandas()
    assert out["x_mean"].tolist() == [1.0, 3.0, 2.0, 6.0, 3.0]
    assert out["x_med"].tolist() == [1.0, 2.0, 2.0, 6.0, 2.0]
    assert out["x_medt"].tolist() == [1.0, 2.0, 2.0, 6.0, 2.0]
    assert out["x_c"].tolist() == [1.0, 9.5, 2.0, 6.0, 9.5]
    with pytest.raises(TransformationError):
        ImputeTransform(strategy="mode")
    with pytest.raises(TransformationError):
        ImputeTransform(strategy="constant")


def test_winsorize_and_robust_scale(ray_session):
    """winsorize / robust_scale: exact value-histogram two-phase fit
    (quantiles_exact kind) matches numpy linear (= SQL quantile_cont)
    bounds at any partitioning; explicit bounds are stateless; nulls
    stay null; bad quantile order rejected at parse."""
    import numpy as np

    from feature_fabrica_ray.functions import TransformationError
    from feature_fabrica_ray.functions.math import WinsorizeTransform

    spec = """
x: {description: skewed values with a null, data_type: float64}
xw:
  description: winsorized into the fitted [p10, p90]
  data_type: float64
  dependencies: [x]
  transformation: "(x).winsorize(lower=0.1, upper=0.9)"
xr:
  description: robust scaled (median / IQR)
  data_type: float64
  dependencies: [x]
  transformation: "(x).robust_scale()"
xs:
  description: stateless explicit-bounds form
  data_type: float64
  dependencies: [x]
  transformation: "(x).winsorize(lo=2.0, hi=4.0)"
"""
    vals = [float(v) for v in range(1, 12)] + [1000.0, None]
    arr = np.array(vals[:-1])
    lo, hi = np.quantile(arr, 0.1), np.quantile(arr, 0.9)
    med = np.quantile(arr, 0.5)
    iqr = np.quantile(arr, 0.75) - np.quantile(arr, 0.25)
    for parts in (1, 3):
        out = FeatureEngine(spec).transform(
            _ds({"x": vals}).repartition(parts)).to_pandas()
        got = out.sort_values("x", na_position="last")
        want_w = np.clip(arr, lo, hi)
        np.testing.assert_allclose(
            got["xw"].to_numpy()[:-1], np.sort(want_w), rtol=1e-12)
        np.testing.assert_allclose(
            got["xr"].to_numpy()[:-1], np.sort((arr - med) / iqr), rtol=1e-12)
        np.testing.assert_allclose(
            got["xs"].to_numpy()[:-1], np.sort(np.clip(arr, 2.0, 4.0)),
            rtol=1e-12)
        assert got[["xw", "xr", "xs"]].iloc[-1].isna().all()  # null stays null
    with pytest.raises(TransformationError):
        WinsorizeTransform(lower=0.9, upper=0.1)


def test_winsorize_tdigest_scale_path(ray_session):
    """exact=False takes the t-digest fit (unbounded-domain scale path):
    approximate bounds, but the outlier is still clipped and the body
    preserved."""
    spec = """
x: {description: values, data_type: float64}
xw:
  description: t-digest winsorize
  data_type: float64
  dependencies: [x]
  transformation: "(x).winsorize(lower=0.05, upper=0.95, exact=False)"
"""
    vals = [float(v) for v in range(100)] + [10_000.0]
    out = FeatureEngine(spec).transform(_ds({"x": vals})).to_pandas()
    assert out["xw"].max() < 10_000.0          # outlier clipped
    body = out.sort_values("x")["xw"].to_numpy()[10:90]
    assert (body == np.arange(10, 90, dtype=float)).all()  # body untouched


def test_percent_rank(ray_session):
    """percent_rank: exact empirical-CDF fit — SQL percent_rank()
    semantics (count(v < x)/(N-1), ties share first rank), partition
    invariant, nulls stay null; exact=False rides the t-digest CDF."""
    import numpy as np

    spec = """
x: {description: values with ties and a null, data_type: float64}
pr:
  description: exact percent rank
  data_type: float64
  dependencies: [x]
  transformation: "(x).percent_rank()"
prt:
  description: t-digest approximate percent rank
  data_type: float64
  dependencies: [x]
  transformation: "(x).percent_rank(exact=False)"
"""
    vals = [3.0, 1.0, 3.0, 7.0, 1.0, 5.0, None]
    arr = np.array([v for v in vals if v is not None])
    n = arr.size
    want = {v: np.sum(arr < v) / (n - 1) for v in set(arr)}
    for parts in (1, 3):
        out = FeatureEngine(spec).transform(
            _ds({"x": vals}).repartition(parts)).to_pandas()
        for _, r in out.iterrows():
            if r["x"] != r["x"] or r["x"] is None:
                assert r[["pr", "prt"]].isna().all()
            else:
                assert r["pr"] == want[r["x"]]
                assert 0.0 <= r["prt"] <= 1.0
        # approximate CDF must agree on the extremes and stay monotone
        srt = out.dropna().sort_values("x")
        assert srt["prt"].iloc[0] == 0.0 and srt["prt"].iloc[-1] == 1.0
        assert (np.diff(srt["prt"].to_numpy()) >= 0).all()


def test_group_reduce_holistic_bucketed_shape(ray_session, monkeypatch):
    """The holistic (median/mode/concat) group_reduce fallback runs
    through events.bucketed_by_key — one Python call per hash bucket,
    never one Ray map_groups call per key: the spy proves the route
    and the captured per_bucket resolves a many-key frame in ONE
    invocation with the right window medians."""
    import numpy as np

    from feature_fabrica_ray.pipelines import events

    captured = {}
    real = events.bucketed_by_key

    def spy(ds, key_col, per_bucket, n_buckets=None):
        captured["key_col"] = key_col
        captured["per_bucket"] = per_bucket
        return real(ds, key_col, per_bucket, n_buckets)

    monkeypatch.setattr(events, "bucketed_by_key", spy)

    spec = """
k: {description: int group key column, data_type: int64}
v: {description: value column, data_type: float64}
group_med:
  description: per key median broadcast back
  data_type: float64
  dependencies: [k, v]
  transformation: "(v).group_reduce(key_feature=k, agg=median)"
"""
    rng = np.random.default_rng(7)
    n = 3000
    df = {"k": rng.integers(0, 400, n).astype("int64"),
          "v": rng.uniform(0, 100, n).round(3)}
    out = FeatureEngine(spec).transform(_ds(df)).to_pandas()
    assert captured["key_col"] == "k"
    assert len(out) == n

    import pandas as pd
    pdf = pd.DataFrame(df)
    want = pdf.groupby("k")["v"].transform("median")
    got = out.sort_values(["k", "v"]).reset_index(drop=True)
    exp = pdf.assign(group_med=want).sort_values(["k", "v"]) \
        .reset_index(drop=True)
    assert np.allclose(got["group_med"], exp["group_med"])
