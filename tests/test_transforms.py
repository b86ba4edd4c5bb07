"""Per-operator unit tests on tiny literal arrays with exact goldens —
mirrors the reference's test strategy (SURVEY.md §5; fixtures F2/F4/F5/F6
in FIXTURES.md). No Ray session needed: operators are pure Arrow kernels."""

import numpy as np
import pyarrow as pa
import pytest

from feature_fabrica_ray.functions import (ABSTransform, AsType, BinaryEncode,
                                           ClipTransform, ConcatenateReduce,
                                           DateTimeAdd, DateTimeDifference,
                                           DateTimeExtract, DateTimeSubtract,
                                           DivideTransform, ExpTransform,
                                           ExtractDayofWeek, FeatureImporter,
                                           KBinsDiscretize, LabelEncode,
                                           LogTransform, MinMaxTransform,
                                           OneHotEncode, OrdinalEncode,
                                           PowerTransform, ScaleFeature, Split,
                                           SqrtTransform, Strip, SumReduce,
                                           ToLower, ToUpper,
                                           TransformationError, ZScoreTransform,
                                           BatchCtx)
from feature_fabrica_ray.state import Moments, TDigest


def run(t, data=None, ctx_cols=None):
    ctx = BatchCtx(pa.table(ctx_cols or {"__dummy": [0]}))
    return t(data, ctx)


def lst(a):
    return a.to_pylist()


# -- math (reference: tests/test_math_transform.py) -------------------------

def test_scale():
    assert lst(run(ScaleFeature(2.5), pa.array([1, 2, 4]))) == [2.5, 5.0, 10.0]


def test_scale_by_feature():
    t = ScaleFeature("f")
    t.compile({"f"})
    out = run(t, pa.array([1.0, 2.0]), {"f": [10.0, 20.0]})
    assert lst(out) == [10.0, 40.0]


def test_log_exp_sqrt_pow_abs():
    assert lst(run(LogTransform(), pa.array([1.0, np.e]))) == pytest.approx([0.0, 1.0])
    assert lst(run(ExpTransform(), pa.array([0.0, 1.0]))) == pytest.approx([1.0, np.e])
    assert lst(run(SqrtTransform(), pa.array([4, 9]))) == [2.0, 3.0]
    assert lst(run(PowerTransform(3), pa.array([2.0]))) == [8.0]
    assert lst(run(ABSTransform(), pa.array([-1, 2, -3]))) == [1, 2, 3]


def test_clip():
    assert lst(run(ClipTransform(min=0, max=5), pa.array([-2, 3, 9]))) == [0.0, 3.0, 5.0]


def test_divide_both_sides():
    assert lst(run(DivideTransform(denominator=2), pa.array([4.0, 6.0]))) == [2.0, 3.0]
    assert lst(run(DivideTransform(numerator=12), pa.array([4.0, 6.0]))) == [3.0, 2.0]
    with pytest.raises(TransformationError):
        DivideTransform()
    with pytest.raises(TransformationError):
        DivideTransform(numerator=1, denominator=2)


def test_zscore_given_params():
    # reference golden: mean=5 std=2 on [3,5,7] -> [-1,0,1]
    assert lst(run(ZScoreTransform(mean=5, std_dev=2), pa.array([3.0, 5.0, 7.0]))) == [-1.0, 0.0, 1.0]


def test_zscore_global_fit_equals_whole_dataset():
    x = np.array([1.0, 4.0, 10.0, 15.0, 21.0, 25.0])
    t = ZScoreTransform()
    assert t.fit_request() == "moments"
    t.set_fitted(Moments.from_array(x))
    out = np.array(lst(run(t, pa.array(x))))
    np.testing.assert_allclose(out, (x - x.mean()) / x.std(), rtol=1e-12)


def test_minmax_global_fit():
    x = np.array([0.0, 5.0, 10.0])
    t = MinMaxTransform()
    t.set_fitted(Moments.from_array(x))
    assert lst(run(t, pa.array(x))) == [0.0, 0.5, 1.0]


def test_kbins_uniform_golden():
    # reference golden: [1,4,10,15,21,25], 3 uniform bins -> [0,0,1,1,2,2]
    x = np.array([1.0, 4.0, 10.0, 15.0, 21.0, 25.0])
    t = KBinsDiscretize(n_bins=3, strategy="uniform")
    t.set_fitted(Moments.from_array(x))
    assert lst(run(t, pa.array(x))) == [0, 0, 1, 1, 2, 2]


def test_kbins_quantile():
    x = np.linspace(0, 100, 101)
    t = KBinsDiscretize(n_bins=4, strategy="quantile")
    assert t.fit_request() == "quantiles_exact"   # exact fit is the default
    assert KBinsDiscretize(n_bins=4, strategy="quantile",
                           exact=False).fit_request() == "quantiles"
    t.set_fitted(TDigest.from_array(x))           # set_fitted is state-agnostic
    out = np.array(lst(run(t, pa.array(x))))
    assert out.min() == 0 and out.max() == 3
    assert np.all(np.diff(out) >= 0)


def test_sum_reduce_columns_and_scalars():
    t = SumReduce(["a", "b", 1])
    t.compile({"a", "b"})
    out = run(t, None, {"a": [1.0, 2.0], "b": [10.0, 20.0]})
    assert lst(out) == [12.0, 23.0]


# -- strings / encoders (reference: tests/test_string_transform.py) ---------

def test_case_strip_split():
    assert lst(run(ToLower(), pa.array(["AbC"]))) == ["abc"]
    assert lst(run(ToUpper(), pa.array(["aBc"]))) == ["ABC"]
    assert lst(run(Strip(), pa.array(["  orange  "]))) == ["orange"]
    assert lst(run(Strip(chars="x"), pa.array(["xxaxx"]))) == ["a"]
    assert lst(run(Split(delimiter="/"), pa.array(["a/b/c"]))) == [["a", "b", "c"]]


def test_concat_elementwise():
    t = ConcatenateReduce(iterable=["a", "b"])
    t.compile({"a", "b"})
    out = run(t, None, {"a": ["ORANGE", "APPLE"], "b": ["orange", "apple"]})
    assert lst(out) == ["ORANGEorange", "APPLEapple"]


def test_one_hot_golden():
    # reference golden: categories [apple, banana, orange]; [apple, orange]
    t = OneHotEncode(categories=["banana", "apple", "orange"])
    out = run(t, pa.array(["apple", "orange"]))
    assert lst(out) == [[1, 0, 0], [0, 0, 1]]


def test_one_hot_unknown_ignore_and_error():
    t = OneHotEncode(categories=["apple", "orange"], handle_unknown="ignore")
    assert lst(run(t, pa.array(["kiwi"]))) == [[0, 0]]
    t2 = OneHotEncode(categories=["apple", "orange"])
    with pytest.raises(TransformationError, match="kiwi"):
        run(t2, pa.array(["kiwi"]))


def test_label_ordinal_codes():
    t = LabelEncode(categories=["apple", "banana", "orange"])
    assert lst(run(t, pa.array(["apple", "orange"]))) == [0, 2]
    t2 = OrdinalEncode(categories=["apple", "banana", "orange"],
                       handle_unknown="use_encoded_value")
    assert lst(run(t2, pa.array(["orange", "kiwi"]))) == [2, -1]


def test_binary_encode_golden():
    # 4 categories -> 2 bits; codes blue=0 green=1 red=2 yellow=3
    t = BinaryEncode(categories=["red", "blue", "green", "yellow"])
    out = run(t, pa.array(["blue", "green", "red", "yellow"]))
    assert lst(out) == [[0, 0], [0, 1], [1, 0], [1, 1]]


def test_encoder_self_fit_equals_given_categories():
    # F4: self-fitting must equal given-categories when categories ==
    # globally sorted distincts (two-pass correctness)
    vals = pa.array(["b", "a", "c", "a"])
    t = LabelEncode()
    assert t.fit_request() == "distinct"
    t.set_fitted({"c", "a", "b"})
    t2 = LabelEncode(categories=["a", "b", "c"])
    assert lst(run(t, vals)) == lst(run(t2, vals))


# -- datetime (reference: tests/test_datetime_transform.py) -----------------

def test_datetime_diff_days_and_seconds():
    ts = pa.array(["2023-01-05", "2023-01-10"]).cast(pa.timestamp("us"))
    out = run(DateTimeDifference(initial_date="2023-01-01", compute_unit="D"), ts)
    assert lst(out) == [4, 9]
    out2 = run(DateTimeDifference(initial_date="2023-01-01", compute_unit="s"), ts)
    assert lst(out2) == [345600, 777600]


def test_datetime_add_sub():
    ts = pa.array(["2024-09-11"]).cast(pa.timestamp("us"))
    out = run(DateTimeAdd(n=2, compute_unit="D"), ts)
    assert str(out[0]) == "2024-09-13 00:00:00"
    out2 = run(DateTimeSubtract(n=5, compute_unit="h"), ts)
    assert str(out2[0]) == "2024-09-10 19:00:00"


def test_datetime_extract():
    ts = pa.array(["2024-09-10 12:30:45"]).cast(pa.timestamp("us"))
    got = {c: lst(run(DateTimeExtract(component=c), ts))[0]
           for c in ("Y", "M", "D", "h", "m", "s")}
    assert got == {"Y": 2024, "M": 9, "D": 10, "h": 12, "m": 30, "s": 45}


def test_day_of_week_golden():
    # reference golden: 2024-09-11/12/13 -> [2,3,4] wed/thu/fri (Monday=0)
    ts = pa.array(["2024-09-11", "2024-09-12", "2024-09-13"]).cast(pa.timestamp("us"))
    assert lst(run(ExtractDayofWeek(), ts)) == [2, 3, 4]
    assert lst(run(ExtractDayofWeek(as_name=True), ts)) == ["wednesday", "thursday", "friday"]


# -- generic ----------------------------------------------------------------

def test_astype():
    out = run(AsType("float32"), pa.array([1, 2]))
    assert out.type == pa.float32()
    with pytest.raises(TransformationError):
        AsType("not_a_dtype")


def test_importer_single_and_multi():
    t = FeatureImporter(feature="a")
    t.compile({"a"})
    assert lst(run(t, None, {"a": [1, 2]})) == [1, 2]
    t2 = FeatureImporter(features=["a", "b"])
    t2.compile({"a", "b"})
    vals = run(t2, None, {"a": [1], "b": [2]})
    assert [lst(v) for v in vals] == [[1], [2]]


def test_importer_stage_ref():
    t = FeatureImporter(feature="f", stage="upper")
    t.compile({"f"})
    assert lst(run(t, None, {"f:upper": ["X"], "f": ["x"]})) == ["X"]


def test_registry_lookup():
    from feature_fabrica_ray.functions import registry

    assert registry.get("scale") is ScaleFeature
    assert registry.get("feature_fabrica_ray.functions.math.ScaleFeature") is ScaleFeature
    with pytest.raises(KeyError):
        registry.get("nope")


def test_group_reductions_median_mode_count_concat():
    import pandas as pd

    from feature_fabrica_ray.functions.aggregate import GROUP_REDUCTIONS

    s = pd.Series([3.0, 1.0, 1.0, 2.0])
    assert GROUP_REDUCTIONS["median"](s) == 1.5
    assert GROUP_REDUCTIONS["mode"](s) == 1.0          # smallest most-frequent
    assert GROUP_REDUCTIONS["mode"](pd.Series([2, 2, 1, 1])) == 1
    assert GROUP_REDUCTIONS["count"](s) == 4
    assert GROUP_REDUCTIONS["concat"](pd.Series(["a", "b"])) == "ab"


def test_datetime_diff_month_year_units():
    import pyarrow as pa

    from feature_fabrica_ray.functions import DateTimeDifference

    ts = pa.array(["2001-03-15", "1999-11-02"]).cast(pa.timestamp("us"))
    months = DateTimeDifference(initial_date="2000-01-01", compute_unit="M").execute(ts)
    # calendar-component arithmetic (numpy M8[M] semantics): Y*12 + dM
    assert months.to_pylist() == [14, -2]
    years = DateTimeDifference(initial_date="2000-01-01", compute_unit="Y").execute(ts)
    assert years.to_pylist() == [1, -1]


def test_datetime_diff_subsecond_units():
    """Reference accepts the full numpy unit range as..Y
    (reference transform/datetime.py:46-47): sub-second diffs must match
    numpy's timedelta64 astype semantics on us-resolution timestamps."""
    import numpy as np
    ts = pa.array(["2023-01-01T00:00:01.234567",
                   "2023-01-01T00:00:00.000001"]).cast(pa.timestamp("us"))
    base = np.datetime64("2023-01-01T00:00:00", "us")
    np_ts = np.array(["2023-01-01T00:00:01.234567",
                      "2023-01-01T00:00:00.000001"], dtype="datetime64[us]")
    for unit in ["ms", "us", "ns"]:
        out = run(DateTimeDifference(initial_date="2023-01-01T00:00:00",
                                     compute_unit=unit), ts)
        expect = (np_ts - base).astype(f"timedelta64[{unit}]").astype(np.int64)
        assert lst(out) == expect.tolist(), unit


def test_max_abs_scaler():
    from feature_fabrica_ray.functions import MaxAbsTransform, TransformationError
    x = np.array([-8.0, 2.0, 4.0])
    t = MaxAbsTransform()
    assert t.fit_request() == "moments"
    t.set_fitted(Moments.from_array(x))
    assert lst(run(t, pa.array(x))) == [-1.0, 0.25, 0.5]
    assert MaxAbsTransform(max_abs=2.0).fit_request() is None  # stateless form
    z = MaxAbsTransform()
    z.set_fitted(Moments.from_array(np.zeros(3)))
    with pytest.raises(TransformationError):
        run(z, pa.array(np.zeros(3)))


def test_regex_family():
    """RE2 string kernels vs hand goldens: extract (group 0, numbered
    group via the unnamed->named rewrite, no-match -> '', NULL -> NULL),
    replace (first vs all), match, substr (1-based), literal replace,
    lpad/rpad incl. SQL truncate-to-width, str_len, predicates."""
    from feature_fabrica_ray.functions import (Contains, EndsWith, PadLeft,
                                               PadRight, RegexExtract,
                                               RegexMatch, RegexReplace,
                                               Replace, StartsWith, StrLen,
                                               Substring)
    arr = pa.array(["src10", "abc", None, ""])
    assert lst(run(RegexExtract("[a-z]+"), arr)) == ["src", "abc", None, ""]
    assert lst(run(RegexExtract("([a-z]+)([0-9]+)", group=2), arr)) == \
        ["10", "", None, ""]
    assert lst(run(RegexExtract("(?P<tag>[a-z]+)", group="tag"), arr)) == \
        ["src", "abc", None, ""]
    # group rewrite skips escaped parens and char classes
    assert lst(run(RegexExtract(r"\(([a-z]+)[)(]", group=1),
                   pa.array(["(ab)", "(cd("]))) == ["ab", "cd"]
    assert lst(run(RegexReplace("[aeiou]", "*"), pa.array(["banana"]))) == \
        ["b*n*n*"]
    assert lst(run(RegexReplace("[aeiou]", "*", all=False),
                   pa.array(["banana"]))) == ["b*nana"]
    assert lst(run(RegexMatch("[0-9]"), arr)) == [True, False, None, False]
    assert lst(run(Substring(3, 2), pa.array(["abcdef", "ab"]))) == ["cd", ""]
    assert lst(run(Substring(2), pa.array(["abcdef"]))) == ["bcdef"]
    assert lst(run(Replace("src", "s@"), arr)) == ["s@10", "abc", None, ""]
    assert lst(run(PadLeft(4, "0"), pa.array(["ab", "abcdef"]))) == \
        ["00ab", "abcd"]
    assert lst(run(PadRight(4, "x"), pa.array(["ab", "abcdef"]))) == \
        ["abxx", "abcd"]
    assert lst(run(StrLen(), arr)) == [5, 3, None, 0]
    assert lst(run(Contains("rc"), arr)) == [True, False, None, False]
    assert lst(run(StartsWith("sr"), arr)) == [True, False, None, False]
    assert lst(run(EndsWith("0"), arr)) == [True, False, None, False]
    with pytest.raises(TransformationError):
        Substring(0)
    with pytest.raises(TransformationError):
        PadLeft(3, "xy")
    with pytest.raises(TransformationError):
        Replace("")
    with pytest.raises(TransformationError):
        run(RegexExtract("([a-z]+)", group=3), arr)


def test_datetime_trunc_and_nary_sql_fns():
    """date_trunc boundaries (Monday weeks, calendar quarters) and the
    coalesce/least/greatest null rules (skip nulls, all-null -> null),
    both operand forms."""
    from feature_fabrica_ray.functions import (CoalesceReduce,
                                               DateTimeTrunc,
                                               GreatestReduce, LeastReduce)
    ts = pa.array(["2024-03-15T13:45:11.123456",
                   "2023-12-31T23:59:59"]).cast(pa.timestamp("us"))
    import datetime as dt
    assert lst(run(DateTimeTrunc("week"), ts)) == \
        [dt.datetime(2024, 3, 11), dt.datetime(2023, 12, 25)]
    assert lst(run(DateTimeTrunc("quarter"), ts)) == \
        [dt.datetime(2024, 1, 1), dt.datetime(2023, 10, 1)]
    assert lst(run(DateTimeTrunc("hour"), ts)) == \
        [dt.datetime(2024, 3, 15, 13), dt.datetime(2023, 12, 31, 23)]
    with pytest.raises(TransformationError):
        DateTimeTrunc("fortnight")

    a = pa.array([1.0, None, None])
    b = pa.array([5.0, 7.0, None])
    assert lst(run(CoalesceReduce(), (a, b))) == [1.0, 7.0, None]
    assert lst(run(LeastReduce(), (a, b))) == [1.0, 7.0, None]
    assert lst(run(GreatestReduce(), (a, b))) == [5.0, 7.0, None]
    with pytest.raises(TransformationError):
        run(GreatestReduce(), (a,))
    with pytest.raises(TransformationError):
        run(GreatestReduce(), None)


def test_split_part_reverse_repeat():
    """SQL split_part (1-based, out-of-range -> ''), reverse, repeat —
    DuckDB-parity goldens incl. null propagation and arg validation."""
    from feature_fabrica_ray.functions import Repeat, Reverse, SplitPart
    arr = pa.array(["a,b,c", "x", None, ""])
    assert lst(run(SplitPart(",", 2), arr)) == ["b", "", None, ""]
    assert lst(run(SplitPart(",", 1), arr)) == ["a", "x", None, ""]
    assert lst(run(Reverse(), pa.array(["abc", None]))) == ["cba", None]
    assert lst(run(Repeat(3), pa.array(["ab", None]))) == ["ababab", None]
    assert lst(run(Repeat(0), pa.array(["ab"]))) == [""]
    with pytest.raises(TransformationError):
        SplitPart("", 1)
    with pytest.raises(TransformationError):
        SplitPart(",", 0)
    with pytest.raises(TransformationError):
        Repeat(-1)


def test_rounding_family():
    """SQL rounding semantics: round is HALF AWAY FROM ZERO (2.5 -> 3,
    -2.5 -> -3, never banker's 2), trunc goes toward zero while floor
    goes toward -inf on negatives, sign is -1/0/1."""
    from feature_fabrica_ray.functions import (CeilTransform, FloorTransform,
                                               RoundTransform, SignTransform,
                                               TruncTransform)
    x = pa.array([2.5, -2.5, 1.4, -1.4, 0.0])
    assert lst(run(RoundTransform(), x)) == [3.0, -3.0, 1.0, -1.0, 0.0]
    assert lst(run(RoundTransform(ndigits=1), pa.array([0.25, -0.25]))) == \
        [0.3, -0.3]
    assert lst(run(FloorTransform(), x)) == [2.0, -3.0, 1.0, -2.0, 0.0]
    assert lst(run(CeilTransform(), x)) == [3.0, -2.0, 2.0, -1.0, 0.0]
    assert lst(run(TruncTransform(), x)) == [2.0, -2.0, 1.0, -1.0, 0.0]
    assert lst(run(SignTransform(), x)) == [1.0, -1.0, 1.0, -1.0, 0.0]
    # nulls propagate; integers promote to float64
    out = run(RoundTransform(), pa.array([None, 7], pa.int64()))
    assert lst(out) == [None, 7.0]


def test_hash_bucket():
    """Fit-free hashing-trick encoder: buckets in [0, n), NULL -> NULL,
    deterministic across calls, md5 mode matches the SQL formula,
    invalid args rejected."""
    import hashlib

    from feature_fabrica_ray.functions import HashBucket, TransformationError
    vals = pa.array(["en", "fr", None, "zh", "en"])
    out = run(HashBucket(8), vals)
    out2 = run(HashBucket(8), vals)
    assert lst(out) == lst(out2)
    assert all(v is None or 0 <= v < 8 for v in lst(out))
    assert lst(out)[2] is None and lst(out)[0] == lst(out)[4]
    md5 = lst(run(HashBucket(8, method="md5"), vals))
    exp = [None if v is None else
           int(hashlib.md5(v.encode()).hexdigest()[:8], 16) % 8
           for v in vals.to_pylist()]
    assert md5 == exp
    with pytest.raises(TransformationError):
        HashBucket(0)
    with pytest.raises(TransformationError):
        HashBucket(4, method="sha1")


def test_trig_family():
    """sin/cos/tan are plain radian kernels; atan2 recovers the phase
    from a (sin, cos) cyclical pair including quadrant; y=/x= may bind
    scalars or the chained input."""
    import numpy as np
    import pyarrow as pa

    from feature_fabrica_ray.functions.math import (Atan2Transform,
                                                    CosTransform,
                                                    SinTransform,
                                                    TanTransform)

    ang = np.array([0.0, np.pi / 2, np.pi, -np.pi / 2, 2.3])
    x = pa.array(ang)
    s = SinTransform().execute(x).to_numpy(zero_copy_only=False)
    c = CosTransform().execute(x).to_numpy(zero_copy_only=False)
    t = TanTransform().execute(pa.array([0.0, 0.3])).to_numpy(
        zero_copy_only=False)
    np.testing.assert_allclose(s, np.sin(ang), atol=1e-15)
    np.testing.assert_allclose(c, np.cos(ang), atol=1e-15)
    np.testing.assert_allclose(t, np.tan([0.0, 0.3]), atol=1e-15)

    # chained-input y, column x: phase recovery incl. quadrant
    ph = Atan2Transform(x=pa.array(c)).execute(pa.array(s)) \
        .to_numpy(zero_copy_only=False)
    want = np.arctan2(np.sin(ang), np.cos(ang))
    np.testing.assert_allclose(ph, want, atol=1e-15)
    # scalar x
    ph2 = Atan2Transform(x=1.0).execute(pa.array([1.0])) \
        .to_numpy(zero_copy_only=False)
    np.testing.assert_allclose(ph2, [np.pi / 4], atol=1e-15)
    import pytest as _pt

    from feature_fabrica_ray.functions.base import TransformationError
    with _pt.raises(TransformationError):
        Atan2Transform()
