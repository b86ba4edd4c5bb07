"""Sketch-merge correctness: results must be exact (Welford) or within
error bounds (HLL, t-digest) and invariant to partitioning — the property
that makes global two-phase aggregation correct at any parallelism level
(SURVEY.md §2.3 key semantic decision)."""

import numpy as np
import pytest

from feature_fabrica_ray.state import (HLL, CategoricalFreq, Moments,
                                       NumericHistogram, TDigest, hash64,
                                       ks_from_counts, psi_from_counts)


@pytest.fixture(scope="module")
def data():
    return np.random.default_rng(7).lognormal(6, 1.2, 50_000)


@pytest.mark.parametrize("nsplits", [1, 3, 8, 17])
def test_welford_partition_invariance(data, nsplits):
    whole = Moments.from_array(data)
    merged = Moments()
    for part in np.array_split(data, nsplits):
        merged = merged.merge(Moments.from_array(part))
    assert merged.count == whole.count == data.size
    assert merged.mean == pytest.approx(whole.mean, rel=1e-12)
    assert merged.std == pytest.approx(whole.std, rel=1e-9)
    assert merged.min == whole.min and merged.max == whole.max


def test_welford_nulls():
    arr = np.array([1.0, 2.0, 3.0, 4.0])
    mask = np.array([False, True, False, True])
    m = Moments.from_array(arr, mask)
    assert m.count == 2 and m.null_count == 2
    assert m.mean == 2.0 and m.null_rate == 0.5


def test_welford_matches_numpy(data):
    m = Moments.from_array(data)
    assert m.mean == pytest.approx(data.mean(), rel=1e-12)
    assert m.std == pytest.approx(data.std(), rel=1e-9)  # population std


@pytest.mark.parametrize("true_card", [50, 5_000, 200_000])
def test_hll_accuracy_and_merge_order(true_card):
    vals = np.array([f"key-{i % true_card}" for i in range(true_card * 2)])
    splits = np.array_split(vals, 9)
    h_fwd = HLL()
    for s in splits:
        h_fwd = h_fwd.merge(HLL().add_column(list(s)))
    h_rev = HLL()
    for s in reversed(splits):
        h_rev = h_rev.merge(HLL().add_column(list(s)))
    # merge-order invariance (register max is commutative)
    assert np.array_equal(h_fwd.registers, h_rev.registers)
    assert h_fwd.estimate() == pytest.approx(true_card, rel=0.02)


def test_hll_serialization_roundtrip():
    h = HLL().add_column(["a", "b", "c"])
    h2 = HLL.from_bytes(h.to_bytes())
    assert np.array_equal(h.registers, h2.registers)


def test_tdigest_rank_error(data):
    parts = np.array_split(data, 13)
    td = TDigest()
    for p in parts:
        td = td.merge(TDigest.from_array(p))
    for q in (0.01, 0.25, 0.5, 0.75, 0.95, 0.99):
        est = td.quantile(q)
        rank_err = abs((data <= est).mean() - q)
        assert rank_err < 0.01, (q, rank_err)
    assert td.count == data.size


def test_tdigest_extremes(data):
    td = TDigest.from_array(data)
    assert td.quantile(0.0) == data.min()
    assert td.quantile(1.0) == data.max()


def test_tdigest_serialization(data):
    td = TDigest.from_array(data[:1000])
    td2 = TDigest.from_bytes(td.to_bytes())
    assert td2.quantile(0.5) == td.quantile(0.5)


def test_histogram_merge_and_drift(data):
    edges_lo, edges_hi = float(data.min()), float(data.max())
    h_all = NumericHistogram.equal_width(edges_lo, edges_hi, 64).add(data)
    h_merged = NumericHistogram.equal_width(edges_lo, edges_hi, 64)
    for p in np.array_split(data, 5):
        h_merged = h_merged.merge(
            NumericHistogram.equal_width(edges_lo, edges_hi, 64).add(p))
    assert np.array_equal(h_all.counts, h_merged.counts)
    # self-drift is exactly zero; shifted drift triggers
    assert psi_from_counts(h_all.full_counts(), h_merged.full_counts()) == 0.0
    h_shift = NumericHistogram.equal_width(edges_lo, edges_hi, 64).add(data * 2.0)
    assert psi_from_counts(h_all.full_counts(), h_shift.full_counts()) > 0.2
    assert ks_from_counts(h_all.full_counts(), h_shift.full_counts()) > 0.1


def test_categorical_freq_merge():
    a = CategoricalFreq().add(None, {"py": 10, "go": 5})
    b = CategoricalFreq().add(None, {"py": 1, "rs": 2})
    m = a.merge(b)
    assert m.counts == {"py": 11, "go": 5, "rs": 2}


def test_hash64_deterministic_across_reprs():
    import pyarrow as pa

    a = hash64(["x", "y", "x"])
    b = hash64(pa.array(["x", "y", "x"]))
    assert np.array_equal(a, b)
    assert a[0] == a[2] and a[0] != a[1]


# ---------------------------------------------------------------------------
# Bloom filter (referential scale path)
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_fp_bound():
    from feature_fabrica_ray.state import BloomFilter

    keys = [f"org{i}/repo{i}" for i in range(20_000)]
    bf = BloomFilter(len(keys), fp_rate=1e-3).add(keys)
    assert bf.contains(keys).all()                      # never a false negative
    probes = [f"missing{i}" for i in range(50_000)]
    fp = bf.contains(probes).mean()
    assert fp < 5e-3                                    # ~p with slack


def test_bloom_serialization_roundtrip():
    from feature_fabrica_ray.state import BloomFilter

    bf = BloomFilter(100).add(["a", "b", "c"])
    rt = BloomFilter.from_bytes(bf.to_bytes())
    assert rt.contains(["a", "b", "c"]).all()
    assert not rt.contains(["zz"]).any()


# ---------------------------------------------------------------------------

def test_valuehist_exact_quantiles_merge_invariant():
    """ValueHist (the quantiles_exact fit state): quantiles over merged
    per-block partials equal single-pass quantiles AND numpy's linear
    (= SQL quantile_cont) interpolation, for any block layout."""
    from feature_fabrica_ray.state import ValueHist

    rng = np.random.default_rng(11)
    arr = np.round(rng.gamma(2.0, 40.0, 5000), 2)
    whole = ValueHist.from_array(arr)
    for seed in (0, 1):
        cuts = np.sort(rng.integers(1, arr.size - 1, size=6))
        blobs = [ValueHist.from_array(b).to_bytes()
                 for b in np.array_split(arr, cuts)]
        merged = ValueHist.merge_bytes(blobs)
        for q in (0.0, 0.01, 0.25, 0.5, 0.9, 1.0):
            assert merged.quantile(q) == whole.quantile(q)
            assert merged.quantile(q) == pytest.approx(
                np.quantile(arr, q), abs=1e-9)


def test_valuehist_cap_and_edge_cases():
    from feature_fabrica_ray.state import ValueHist

    with pytest.raises(ValueError, match="cap"):
        ValueHist.from_array(np.arange(50.0), cap=10)
    empty = ValueHist.from_array(np.array([np.nan]))    # NaNs dropped
    assert empty.total == 0
    with pytest.raises(ValueError, match="empty"):
        empty.quantile(0.5)
    one = ValueHist.from_array(np.array([7.0, 7.0]))
    assert one.quantile(0.0) == one.quantile(1.0) == 7.0


def test_valuehist_property_matches_numpy():
    """Property: for ANY multiset and ANY q, merged-from-random-splits
    ValueHist quantiles equal numpy's linear interpolation (= SQL
    quantile_cont), and percent_rank_of equals the count(v<x)/(N-1)
    definition."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from feature_fabrica_ray.state import ValueHist

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.integers(min_value=-50, max_value=50),
                    min_size=2, max_size=200),
           st.floats(min_value=0.0, max_value=1.0,
                     allow_nan=False, allow_infinity=False),
           st.integers(min_value=0, max_value=2**32 - 1))
    def prop(xs, q, seed):
        arr = np.asarray(xs, dtype=np.float64)
        rng = np.random.default_rng(seed)
        ncuts = int(rng.integers(0, min(4, arr.size - 1) + 1))
        cuts = np.sort(rng.integers(1, arr.size, size=ncuts)) if ncuts else []
        vh = ValueHist.merge_bytes(
            [ValueHist.from_array(b).to_bytes()
             for b in np.array_split(arr, cuts)])
        assert vh.quantile(q) == pytest.approx(np.quantile(arr, q), abs=1e-9)
        n = arr.size
        for x in arr[:5]:
            want = np.sum(arr < x) / (n - 1)
            assert vh.percent_rank_of(np.array([x]))[0] == pytest.approx(want)

    prop()


def test_spacesaving_exact_when_k_large():
    """With k above the true distinct count nothing is evicted: the
    sketch is exact with err 0, regardless of how the stream is split
    into batches."""
    from feature_fabrica_ray.state import SpaceSaving

    vals = ["a"] * 50 + ["b"] * 30 + ["c"] * 19 + ["d"]
    rng = np.random.default_rng(3)
    rng.shuffle(vals)
    for nsplits in (1, 4, 7):
        sk = SpaceSaving(16)
        for chunk in np.array_split(np.array(vals, object), nsplits):
            u, c = np.unique(chunk, return_counts=True)
            sk.add_counts(u.tolist(), c.tolist())
        assert sk.top(4) == [("a", 50, 0), ("b", 30, 0),
                             ("c", 19, 0), ("d", 1, 0)]


def test_spacesaving_bounds_on_zipf():
    """Approximate regime (k << distinct): est never undercounts,
    est - err never overcounts, and every value with true count > n/k
    is present in the sketch — on a Zipf stream, across block splits
    AND merge orders (sequential vs pairwise tree)."""
    from feature_fabrica_ray.state import SpaceSaving

    rng = np.random.default_rng(11)
    vals = rng.zipf(1.5, 8000)
    vals = vals[vals < 10_000]
    true = {v: int(c) for v, c in
            zip(*np.unique(vals, return_counts=True))}
    k = 32

    def sketch_of(chunk):
        u, c = np.unique(chunk, return_counts=True)
        return SpaceSaving(k).add_counts(u.tolist(), c.tolist())

    chunks = np.array_split(vals, 16)
    seq = SpaceSaving(k)
    for ch in chunks:
        seq.merge(sketch_of(ch))
    parts = [sketch_of(ch) for ch in chunks]
    while len(parts) > 1:          # pairwise tree merge
        parts = [parts[i].merge(parts[i + 1]) if i + 1 < len(parts)
                 else parts[i] for i in range(0, len(parts), 2)]
    for sk in (seq, parts[0]):
        assert len(sk.counts) <= k
        for v, est in sk.counts.items():
            assert est >= true[v]                      # never undercounts
            assert est - sk.errs[v] <= true[v]         # bounded overcount
        thresh = vals.size / k
        for v, c in true.items():
            if c > thresh:
                assert v in sk.counts, (v, c, thresh)


def test_higher_moments_merge_matches_pandas():
    """Pébay M3/M4 pairwise merge: adjusted skewness/kurtosis from
    merged chunk sketches equal pandas .skew()/.kurt() (the DuckDB
    definitions) regardless of split count or merge order."""
    from feature_fabrica_ray.state import HigherMoments

    rng = np.random.default_rng(5)
    x = rng.gamma(2.0, 3.0, 1000)
    import pandas as pd
    want_s, want_k = pd.Series(x).skew(), pd.Series(x).kurt()
    for nsplits in (1, 7, 16):
        m = HigherMoments()
        for chunk in np.array_split(x, nsplits):
            m = m.merge(HigherMoments.from_array(chunk))
        assert abs(m.skewness - want_s) < 1e-9
        assert abs(m.kurtosis - want_k) < 1e-9
    # degenerate guards
    assert np.isnan(HigherMoments.from_array(np.array([1.0, 2.0])).skewness)
    assert np.isnan(HigherMoments.from_array(np.ones(10)).kurtosis)


def test_hash64_repairs_torn_polars_module():
    """A worker can find polars._reexport registered in sys.modules but
    partially executed (attributes missing at call time). hash64 must
    repair by purging and re-importing the polars graph — NOT fall back
    to a different hash function, which would corrupt shuffles."""
    import sys

    import pyarrow as pa

    from feature_fabrica_ray.state import hashing

    if not hashing._HAS_POLARS:
        import pytest
        pytest.skip("polars not installed")

    vals = pa.array(["alpha", "beta", "gamma"])
    want = hashing.hash64(vals, seed=7)

    # tear the module graph the way a mid-import snapshot would
    rx = sys.modules["polars._reexport"]
    del rx.Series
    got = hashing.hash64(vals, seed=7)
    assert (got == want).all()
    # the repair must have rebuilt the graph (fresh module object),
    # not silently skipped the torn path
    assert sys.modules["polars._reexport"] is not rx
    assert hashing._polars_healthy(hashing.pl)


def test_countmin_guarantees_and_merge():
    """est >= true always; est <= true + eps*N; merge is exact matrix
    addition (tree == sequential == single-shot); bytes roundtrip."""
    import pyarrow as pa

    from feature_fabrica_ray.state import CountMin

    rng = np.random.default_rng(11)
    vals = [f"v{i}" for i in rng.zipf(1.5, size=5000) if i < 500]
    true = {}
    for v in vals:
        true[v] = true.get(v, 0) + 1

    # single-shot
    one = CountMin(depth=4, width=2048)
    uv, cnts = np.unique(vals, return_counts=True)
    one.add_counts(pa.array(uv), cnts)
    bound = one.error_bound()
    for v, t in true.items():
        est = one.estimate(v)
        assert est >= t                        # never undercounts
        assert est <= t + bound + 1e-9         # CMS additive bound
    assert one.estimate("never-seen") <= bound + 1e-9

    # merge invariance: 7 chunked partials, sequential and tree merges
    chunks = np.array_split(np.arange(len(vals)), 7)
    parts = []
    for ch in chunks:
        c = CountMin(depth=4, width=2048)
        sub = [vals[i] for i in ch]
        u, n = np.unique(sub, return_counts=True)
        c.add_counts(pa.array(u), n)
        parts.append(c)
    seq = CountMin(depth=4, width=2048)
    for p in parts:
        seq.merge(CountMin.from_bytes(p.to_bytes()))
    while len(parts) > 1:                      # tree merge
        parts = [parts[i].merge(parts[i + 1])
                 if i + 1 < len(parts) else parts[i]
                 for i in range(0, len(parts), 2)]
    assert np.array_equal(seq.table, parts[0].table)
    assert seq.n == parts[0].n == len(vals)
    assert np.array_equal(seq.table, one.table)   # == single-shot

    # nulls ignored; shape mismatch fails loud
    withnull = CountMin(4, 2048).add_counts(pa.array(["a", None]), [2, 9])
    assert withnull.n == 2
    with pytest.raises(ValueError, match="shape mismatch"):
        CountMin(4, 1024).merge(CountMin(4, 2048))


def test_hll_set_ops_bounds(ray_session):
    """HLL inclusion-exclusion overlap: estimates of |A|, |B|, |A∪B|
    within 3% of exact; the intersection (difference of three ~0.8%
    sketches) within a looser absolute bound; NULLs excluded."""
    import pandas as pd
    import ray.data
    from feature_fabrica_ray.pipelines import hll_set_ops

    rng = np.random.default_rng(7)
    a_users = rng.choice(50_000, size=30_000, replace=False)
    b_users = rng.choice(50_000, size=30_000, replace=False)
    exact_a, exact_b = len(set(a_users)), len(set(b_users))
    exact_u = len(set(a_users) | set(b_users))
    df = pd.concat([
        pd.DataFrame({"g": "click", "u": a_users}),
        pd.DataFrame({"g": "view", "u": b_users}),
        pd.DataFrame({"g": "click", "u": [None] * 50}),
        pd.DataFrame({"g": "other", "u": [1, 2, 3]}),
    ], ignore_index=True)
    ds = ray.data.from_pandas(df).repartition(4)
    out = hll_set_ops(ds, "g", "u", "click", "view")
    r = out.iloc[0]
    assert abs(r.est_a - exact_a) / exact_a < 0.03
    assert abs(r.est_b - exact_b) / exact_b < 0.03
    assert abs(r.est_union - exact_u) / exact_u < 0.03
    exact_i = exact_a + exact_b - exact_u
    assert abs(r.est_intersect - exact_i) < 0.09 * exact_u
    assert r.est_intersect >= 0


def test_hash64_dictionary_fast_path_bit_identical():
    """hash64 on a dictionary-encoded column must equal hash64 on the
    decoded values bit-for-bit (pid assignment, HLL registers and
    shuffle keys all hinge on it), across seeds, chunking, nulls,
    empty dictionaries and all-null columns."""
    import numpy as np
    import pyarrow as pa

    from feature_fabrica_ray.state.hashing import hash64

    vals = ["repo/a", "repo/b", None, "repo/a", "repo/c", None, "repo/b",
            "", "repo/a"]
    flat = pa.array(vals, pa.string())
    d = flat.dictionary_encode()
    for seed in (0, 7, 12345):
        assert (hash64(flat, seed=seed) == hash64(d, seed=seed)).all()
    chunked = pa.chunked_array([d.slice(0, 4), d.slice(4)])
    assert (hash64(chunked) == hash64(flat)).all()
    empty = pa.array([], pa.string()).dictionary_encode()
    assert hash64(empty).size == 0
    allnull = pa.array([None, None], pa.string()).dictionary_encode()
    assert (hash64(allnull)
            == hash64(pa.array([None, None], pa.string()))).all()
    # int dictionaries too (combine_hashes consumers)
    ints = pa.array([5, 5, 2, None, 9], pa.int64())
    assert (hash64(ints.dictionary_encode()) == hash64(ints)).all()
