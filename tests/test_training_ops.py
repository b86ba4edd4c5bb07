"""Training-data pipeline tests: text analysis, dedup (exact / MinHash /
SimHash / embedding), similarity search, multimodal decode — golden
values on tiny tables + planted-defect recovery + partitioning
invariance (the properties the SQL oracle can't express)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from feature_fabrica_ray.pipelines import (add_fingerprint, add_lang_id,
                                           add_quality, cosine_topk,
                                           decode_pipeline,
                                           embedding_neardup_pairs,
                                           exact_dedup_counts, ivf_topk,
                                           minhash_lsh_pairs, ngram_jaccard,
                                           simhash_pairs, text_stats)
from feature_fabrica_ray.pipelines.dedup import (minhash_signatures,
                                                 simhash_signatures)
from feature_fabrica_ray.pipelines.textstats import kgram_hashes

SF = "/root/testdata/sf0.001"


def _ds(df, blocks=1):
    ds = ray.data.from_pandas(df)
    return ds.repartition(blocks) if blocks > 1 else ds


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def test_text_stats_golden(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["Hi! 42 x9.", "a b  a", ""]})
    out = text_stats(_ds(df)).to_pandas().sort_values("doc_id")
    assert out["n_chars"].tolist() == [10, 6, 0]
    assert out["n_tokens"].tolist() == [3, 3, 0]
    assert out["n_digits"].tolist() == [3, 0, 0]
    assert out["n_punct"].tolist() == [2, 0, 0]
    assert out["punct_ratio"].tolist()[0] == pytest.approx(0.2)


def test_quality_formula(ray_session):
    df = pd.DataFrame({"doc_id": [0], "text": ["a b a c"]})
    out = add_quality(_ds(df)).to_pandas()
    # 4 tokens, 3 distinct, 0 punct -> (3/4) * min(4/100,1) * 1
    assert out["n_tokens"][0] == 4
    assert out["distinct_tokens"][0] == 3
    assert out["quality"][0] == pytest.approx(0.75 * 0.04)


def test_lang_id_detects(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": [
        "the cat sat on the mat and it was happy with this",
        "el perro corre por la calle y se va para su casa",
        "der Hund läuft auf der Straße und die Katze ist im Haus",
        "zz qq ww",  # no stopword evidence
    ]})
    out = add_lang_id(_ds(df)).to_pandas().sort_values("doc_id")
    assert out["lang_id"].tolist() == ["en", "es", "de", "unknown"]


def test_fingerprint_equal_docs_agree(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["the same document text here",
                                "the same document text here",
                                "completely different content!"]})
    out = add_fingerprint(_ds(df)).to_pandas().sort_values("doc_id")
    assert out["fingerprint"][0] == out["fingerprint"][1]


def test_kgram_partition_invariance():
    import pyarrow as pa

    texts = ["alpha beta gamma delta", "second document body", "x"]
    whole = pa.array(texts)
    h_all = {}
    for i in range(3):
        h, r = kgram_hashes(pa.array([texts[i]]), k=5)
        h_all[i] = sorted(h.tolist())
    h2, r2 = kgram_hashes(whole, k=5)
    for i in range(3):
        assert sorted(h2[r2 == i].tolist()) == h_all[i]


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def test_exact_dedup_counts_codetable(ray_session):
    from feature_fabrica_ray.sources import read_codetable

    out = exact_dedup_counts(read_codetable(SF, with_sha256=False),
                             ["repo", "path", "commit"])
    assert out["n_rows"][0] == 505
    assert out["n_distinct"][0] == 500
    assert out["n_dup_rows"][0] == 10


def _neardup_df():
    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta",
             "iota", "kappa", "lod", "mu", "nu", "xi", "omicron", "pi"]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(30)]
    near = [t + " tailword" for t in texts[:5]]          # jaccard ~ .9
    return pd.DataFrame({"doc_id": list(range(30)) + list(range(100, 105)),
                         "text": texts + near})


def test_minhash_finds_planted_pairs(ray_session):
    pairs = minhash_lsh_pairs(_ds(_neardup_df()), threshold=0.5)
    found = set(map(tuple, pairs[["id_a", "id_b"]].values.tolist()))
    for i in range(5):
        assert (i, 100 + i) in found
    assert (pairs["jaccard"] >= 0.5).all()


def test_minhash_partition_invariant(ray_session):
    p1 = minhash_lsh_pairs(_ds(_neardup_df(), blocks=1), threshold=0.5)
    p4 = minhash_lsh_pairs(_ds(_neardup_df(), blocks=4), threshold=0.5)
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b", "jaccard"]].values.tolist()))
    assert key(p1) == key(p4)


def test_minhash_identical_docs_jaccard_one(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["identical body of text here"] * 2})
    pairs = minhash_lsh_pairs(_ds(df), threshold=0.9)
    assert pairs[["id_a", "id_b"]].values.tolist() == [[1, 2]]
    assert pairs["jaccard"][0] == 1.0


def test_simhash_identical_zero_hamming(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["same tokens in this doc", "same tokens in this doc",
                                "utterly unrelated words entirely"]})
    pairs = simhash_pairs(_ds(df))
    assert [1, 2] in pairs[["id_a", "id_b"]].values.tolist()
    row = pairs[(pairs.id_a == 1) & (pairs.id_b == 2)]
    assert row["hamming"].iloc[0] == 0


def test_simhash_signature_deterministic():
    import pyarrow as pa

    s1 = simhash_signatures(pa.array(["a b c", "x y"]))
    s2 = simhash_signatures(pa.array(["a b c", "x y"]))
    assert (s1 == s2).all()


def test_ngram_jaccard_exact():
    a = np.array([1, 2, 3, 4], dtype=np.int64)
    b = np.array([3, 4, 5, 6], dtype=np.int64)
    assert ngram_jaccard(a, b) == pytest.approx(2 / 6)


def test_minhash_estimates_jaccard():
    import pyarrow as pa

    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "the quick brown fox jumps over the lazy cat again and again"
    sig = minhash_signatures(pa.array([t1, t2]), num_perm=256, k=5)
    est = (sig[:, 0] == sig[:, 1]).mean()
    h1, r1 = kgram_hashes(pa.array([t1]), k=5)
    h2, _ = kgram_hashes(pa.array([t2]), k=5)
    true_j = ngram_jaccard(np.unique(h1), np.unique(h2))
    assert abs(est - true_j) < 0.12


def test_embedding_neardup_planted(ray_session):
    rng = np.random.default_rng(0)
    V = rng.standard_normal((40, 16))
    V[35] = V[0] + 0.001 * rng.standard_normal(16)       # planted near-dup
    df = pd.DataFrame({"vec_id": range(40),
                       "embedding": [v.astype(np.float32).tolist() for v in V]})
    pairs = embedding_neardup_pairs(_ds(df), threshold=0.99)
    assert [0, 35] in pairs[["id_a", "id_b"]].values.tolist()
    assert (pairs["cosine"] >= 0.99).all()


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def emb_ds(ray_session):
    return ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def test_cosine_topk_matches_numpy(emb_ds):
    df = emb_ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    M = np.asarray([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Q = Mn[:2]
    out = cosine_topk(emb_ds, M[:2], k=5)
    S = Q @ Mn.T
    for qi in range(2):
        expect = np.argsort(-np.round(S[qi], 6), kind="stable")[:5]
        got = out[out.query_id == qi].sort_values("rank")["vec_id"].tolist()
        assert got[0] == qi                       # self is nearest
        assert set(got) == set(df["vec_id"].iloc[expect])


def test_cosine_topk_block_invariant(emb_ds, ray_session):
    df = emb_ds.to_pandas()
    M = np.asarray([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    r1 = cosine_topk(_ds(df, blocks=1), M[:2], k=5)
    r8 = cosine_topk(_ds(df, blocks=8), M[:2], k=5)
    assert r1.values.tolist() == r8.values.tolist()


def test_radius_search_matches_numpy(emb_ds):
    from feature_fabrica_ray.pipelines import radius_search

    df = emb_ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    M = np.asarray([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = np.round(Mn[:4] @ Mn.T, 6)
    tau = 0.2
    expect = {(int(df["vec_id"].iloc[qi]), int(df["vec_id"].iloc[vi]))
              for qi, vi in zip(*np.nonzero(S >= tau))}
    out = radius_search(emb_ds, M[:4], df["vec_id"].iloc[:4].to_numpy(),
                        threshold=tau).to_pandas()
    got = set(map(tuple, out[["query_id", "vec_id"]].values.tolist()))
    assert got == expect
    assert (out["score"] >= tau).all()
    # self-pairs always survive any threshold <= 1
    assert all((q, q) in got for q in range(4))


def test_radius_search_block_invariant(emb_ds, ray_session):
    from feature_fabrica_ray.pipelines import radius_search

    df = emb_ds.to_pandas()
    M = np.asarray([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    ids = df["vec_id"].iloc[:3].to_numpy()
    key = ["query_id", "vec_id"]
    r1 = radius_search(_ds(df, blocks=1), M[:3], ids, threshold=0.15) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    r8 = radius_search(_ds(df, blocks=8), M[:3], ids, threshold=0.15) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    assert r1.values.tolist() == r8.values.tolist()


def test_ivf_recall(emb_ds):
    df = emb_ds.to_pandas()
    M = np.asarray([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    Q = M[:5]
    exact = cosine_topk(emb_ds, Q, k=10)
    approx = ivf_topk(emb_ds, Q, k=10)
    e = set(map(tuple, exact[["query_id", "vec_id"]].values.tolist()))
    a = set(map(tuple, approx[["query_id", "vec_id"]].values.tolist()))
    assert len(e & a) / len(e) >= 0.7


def test_lsh_recall(emb_ds):
    from feature_fabrica_ray.pipelines import lsh_topk

    df = emb_ds.to_pandas()
    M = np.asarray([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    Q = M[:5]
    exact = cosine_topk(emb_ds, Q, k=10)
    approx = lsh_topk(emb_ds, Q, k=10)
    e = set(map(tuple, exact[["query_id", "vec_id"]].values.tolist()))
    a = set(map(tuple, approx[["query_id", "vec_id"]].values.tolist()))
    # the query vector itself always shares every bucket with itself
    got = dict(approx.groupby("query_id").first()["vec_id"])
    assert all(got[q] == df["vec_id"].iloc[q] for q in range(5))
    assert len(e & a) / len(e) >= 0.7


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

def test_decode_stub_golden(ray_session):
    out = decode_pipeline(SF, concurrency=2).to_pandas().sort_values("media_id")
    row = out.iloc[0]                                   # doc_id 0
    assert row["width"] == 16 and row["height"] == 16
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]) \
        .to_pandas().sort_values("doc_id")
    body = docs["text"].iloc[0].encode()
    assert row["n_bytes"] == 8 + len(body)
    b = np.frombuffer(body, dtype=np.uint8)
    assert row["mean_byte"] == pytest.approx(b.mean(), abs=1e-5)
    counts = np.bincount(b, minlength=256)
    p = counts[counts > 0] / b.size
    assert row["byte_entropy"] == pytest.approx(-(p * np.log2(p)).sum(), abs=1e-5)


def test_frame_sampler(ray_session):
    from feature_fabrica_ray.pipelines import FrameSampler
    from feature_fabrica_ray.pipelines.multimodal import synth_media_table

    ds = synth_media_table(SF, media_type="video")
    frames = ds.limit(10).map_batches(FrameSampler, concurrency=1,
                                      batch_format="pyarrow").to_pandas()
    assert {"media_id", "frame_idx", "frame"} <= set(frames.columns)
    # every sampled frame is a full frame_bytes slice except possibly none
    assert (frames["frame_idx"] % 4 == 0).all()


# ---------------------------------------------------------------------------
# broadcast join
# ---------------------------------------------------------------------------

def test_broadcast_join_inner_and_anti(ray_session):
    from feature_fabrica_ray.pipelines import broadcast_join

    left = _ds(pd.DataFrame({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]}))
    right = pd.DataFrame({"k": [1, 2, 2, 5], "w": [10, 20, 21, 50]})
    inner = broadcast_join(left, right, left_on="k").to_pandas() \
        .sort_values(["k", "w"]).reset_index(drop=True)
    assert inner[["k", "w"]].values.tolist() == [[1, 10], [2, 20], [2, 21]]
    anti = broadcast_join(left, right, left_on="k", how="left anti").to_pandas()
    assert sorted(anti["k"].tolist()) == [3, 4]


def test_broadcast_join_guards_large_side(ray_session):
    from feature_fabrica_ray.pipelines.join import _MAX_BROADCAST_ROWS, broadcast_join
    import feature_fabrica_ray.pipelines.join as jn

    left = _ds(pd.DataFrame({"k": [1]}))
    old = jn._MAX_BROADCAST_ROWS
    jn._MAX_BROADCAST_ROWS = 2
    try:
        with pytest.raises(ValueError, match="too large to"):
            broadcast_join(left, pd.DataFrame({"k": [1, 2, 3]}), left_on="k")
    finally:
        jn._MAX_BROADCAST_ROWS = old


def test_decode_audio_stub(ray_session):
    from feature_fabrica_ray.pipelines.multimodal import (DecodeAudioFeatures,
                                                          synth_media_table)

    ds = synth_media_table(SF, media_type="audio")
    # filter, not limit(5): limit takes scheduling-dependent rows and
    # the assertion below needs the globally-first doc present
    import pyarrow.compute as _pc

    ds = ds.map_batches(
        lambda b: b.filter(_pc.less(b.column("media_id"), 5)),
        batch_format="pyarrow", batch_size=None)
    out = ds.map_batches(DecodeAudioFeatures, concurrency=1,
                         batch_format="pyarrow").to_pandas() \
        .sort_values("media_id")
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]) \
        .to_pandas().sort_values("doc_id")
    body = docs["text"].iloc[0].encode()
    pcm = np.frombuffer(body, dtype=np.int8).astype(np.float64)
    row = out.iloc[0]
    assert row["n_samples"] == len(body)
    assert row["rms"] == pytest.approx(np.sqrt((pcm ** 2).mean()), abs=1e-5)


def test_exact_dedup_rows_keeps_one_per_key(ray_session):
    from feature_fabrica_ray.pipelines import exact_dedup_rows
    from feature_fabrica_ray.sources import read_codetable

    ds = read_codetable(SF, with_sha256=False)
    deduped = exact_dedup_rows(ds, ["repo", "path", "commit"]).to_pandas()
    assert len(deduped) == 500                      # 505 rows, 5 dup keys
    assert not deduped.duplicated(["repo", "path", "commit"]).any()


def test_exact_dedup_rows_no_dups_passthrough(ray_session):
    from feature_fabrica_ray.pipelines import exact_dedup_rows

    df = pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    out = exact_dedup_rows(_ds(df), ["k"]).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2, 3]


def test_topk_per_group_golden(ray_session):
    from feature_fabrica_ray.pipelines import topk_per_group

    df = pd.DataFrame({"g": ["a", "a", "a", "b", "b"],
                       "v": [3.0, 1.0, 2.0, 9.0, 9.0],
                       "id": [1, 2, 3, 4, 5]})
    out = topk_per_group(_ds(df, blocks=3), ["g"], "v", k=2,
                         tiebreak_cols=["id"])
    got = out[["g", "v", "id", "rank"]].values.tolist()
    assert got == [["a", 3.0, 1, 1], ["a", 2.0, 3, 2],
                   ["b", 9.0, 4, 1], ["b", 9.0, 5, 2]]


def test_hash_sample_deterministic_and_partition_invariant(ray_session):
    from feature_fabrica_ray.pipelines import hash_sample

    df = pd.DataFrame({"k": [f"key{i}" for i in range(2000)],
                       "v": range(2000)})
    s1 = hash_sample(_ds(df, blocks=1), ["k"], 0.25).to_pandas()
    s8 = hash_sample(_ds(df, blocks=8), ["k"], 0.25).to_pandas()
    assert sorted(s1["k"]) == sorted(s8["k"])          # layout-invariant
    assert 0.18 < len(s1) / 2000 < 0.32                # ~fraction
    s1b = hash_sample(_ds(df), ["k"], 0.25).to_pandas()
    assert sorted(s1["k"]) == sorted(s1b["k"])         # rerun-stable
    # nested property: a 10% sample is a subset of the 25% sample
    s_small = hash_sample(_ds(df), ["k"], 0.10).to_pandas()
    assert set(s_small["k"]) <= set(s1["k"])


def test_fuzzy_join_pairs(ray_session):
    """Cross-table similarity join: edited copies link to their source
    row; unrelated rows don't; WITHIN-side near-dups never surface
    (side parity filter); layout-invariant."""
    from feature_fabrica_ray.pipelines import fuzzy_join_pairs

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest tonight")
    texts = [f"{base} variant number {i} with unique trailing marker "
             f"{'x' * (i + 3)}" for i in range(6)]
    left = pd.DataFrame({"doc_id": range(6), "text": texts})
    # a within-left exact dup pair: must NOT appear in the join output
    left = pd.concat([left, pd.DataFrame({"doc_id": [100],
                                          "text": [texts[0]]})],
                     ignore_index=True)
    # right: light edits of rows 0-2 + one unrelated row
    right = pd.DataFrame({
        "doc_id": [50, 51, 52, 53],
        "text": [texts[0].replace("quick", "quickest"),
                 texts[1] + " appended tail words",
                 texts[2].replace("tonight", "at dawn"),
                 "completely different content about cooking pasta "
                 "with tomato sauce and fresh basil leaves"]})
    out = fuzzy_join_pairs(_ds(left, blocks=3), _ds(right, blocks=2),
                           threshold=0.4)
    got = {(r.id_left, r.id_right) for r in out.itertuples()}
    assert {(0, 50), (1, 51), (2, 52)} <= got
    assert all(r != 53 for _, r in got)          # unrelated never joins
    # the within-left dup (0, 100) is not a cross pair
    assert all(l != 100 and r != 100 for l, r in got) or True
    assert not any({l, r} == {0, 100} for l, r in got)
    out1 = fuzzy_join_pairs(_ds(left), _ds(right), threshold=0.4)
    assert {(r.id_left, r.id_right) for r in out1.itertuples()} == got


def test_hash_sample_md5_mode_matches_sql_predicate(ray_session):
    """md5 mode keeps exactly the rows whose md5 hex digest of str(key)
    is below the fraction threshold — the SQL-replicable contract the
    sm_hash_sample / sm_stratified oracles rely on."""
    import hashlib

    from feature_fabrica_ray.pipelines import (hash_sample,
                                               md5_fraction_threshold,
                                               stratified_sample)

    assert md5_fraction_threshold(0.25) == "4" + "0" * 31
    df = pd.DataFrame({"k": np.arange(1000, dtype=np.int64),
                       "lang": np.where(np.arange(1000) % 2 == 0, "en", "zh")})
    out = hash_sample(_ds(df, blocks=4), ["k"], 0.25, method="md5").to_pandas()
    expect = {i for i in range(1000)
              if hashlib.md5(str(i).encode()).hexdigest() < "4" + "0" * 31}
    assert set(out["k"]) == expect
    # stratified md5 mode: per-stratum thresholds, same predicate
    fr = {"en": 0.5}
    s = stratified_sample(_ds(df, blocks=4), "lang", fr, key_columns=["k"],
                          default_fraction=0.125, method="md5").to_pandas()
    exp2 = {i for i in range(1000)
            if hashlib.md5(str(i).encode()).hexdigest() <
            ("8" + "0" * 31 if i % 2 == 0 else "2" + "0" * 31)}
    assert set(s["k"]) == exp2
    with pytest.raises(ValueError):
        hash_sample(_ds(df), ["k", "lang"], 0.25, method="md5")


def test_fingerprint_empty_doc_batch_invariance(ray_session):
    """An empty document's fingerprint must not depend on whether its batch
    contained other (non-empty) rows: all-empty batches emit no k-gram
    hashes, same as empty rows inside a mixed batch."""
    mixed = add_fingerprint(_ds(pd.DataFrame(
        {"doc_id": [0, 1], "text": ["", "hello world"]}))).to_pandas()
    alone = add_fingerprint(_ds(pd.DataFrame(
        {"doc_id": [0], "text": [""]}))).to_pandas()
    fp_mixed = mixed.set_index("doc_id").loc[0, "fingerprint"]
    fp_alone = alone.set_index("doc_id").loc[0, "fingerprint"]
    assert fp_mixed == fp_alone
    import pyarrow as pa
    h, r = kgram_hashes(pa.array(["", ""]))
    assert len(h) == 0 and len(r) == 0


def test_minhash_distributed_equals_driver(ray_session):
    """The dup-heavy scale path (pairs/shingles never collect to the
    driver) must produce exactly the driver version's verified pairs,
    and be partition-invariant."""
    from feature_fabrica_ray.pipelines import minhash_lsh_pairs_distributed

    drv = minhash_lsh_pairs(_ds(_neardup_df()), threshold=0.5)
    dst = minhash_lsh_pairs_distributed(_ds(_neardup_df(), blocks=4),
                                        threshold=0.5).to_pandas()
    key = lambda df: sorted(map(tuple,
                                df[["id_a", "id_b", "jaccard"]].values.tolist()))
    assert key(drv) == key(dst)
    dst1 = minhash_lsh_pairs_distributed(_ds(_neardup_df(), blocks=1),
                                         threshold=0.5).to_pandas()
    assert key(dst1) == key(dst)


def test_minhash_distributed_no_pairs(ray_session):
    from feature_fabrica_ray.pipelines import minhash_lsh_pairs_distributed

    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["first completely different words here",
                                "zebra quagga okapi gnu eland bongo kudu"]})
    out = minhash_lsh_pairs_distributed(_ds(df), threshold=0.5).to_pandas()
    assert len(out) == 0


def test_neardup_dedup_rows_keeps_cluster_representative(ray_session):
    """Union-find clustering: each near-dup cluster keeps only its min
    id; unique docs are untouched."""
    from feature_fabrica_ray.pipelines import (neardup_clusters,
                                               neardup_dedup_rows)

    df = _neardup_df()
    out = neardup_dedup_rows(_ds(df, blocks=3), threshold=0.5).to_pandas()
    ids = set(out["doc_id"])
    for i in range(5):
        assert i in ids            # representative (min id) survives
        assert 100 + i not in ids  # its near-dup is dropped
    assert set(range(5, 30)) <= ids
    # transitive clusters: a-b and b-c merge into one component
    pairs = pd.DataFrame({"id_a": [1, 2], "id_b": [2, 3]})
    reps = neardup_clusters(pairs)
    assert reps[1] == reps[2] == reps[3] == 1


def test_broadcast_range_join(ray_session):
    from feature_fabrica_ray.pipelines import broadcast_range_join
    import pyarrow as pa

    bands = pa.table({"band": ["a", "b"], "lo": [0.0, 10.0],
                      "hi": [10.0, 20.0]})
    df = pd.DataFrame({"v": [0.0, 9.999, 10.0, 19.0, 25.0, np.nan]})
    out = broadcast_range_join(_ds(df, blocks=2), bands, value_col="v") \
        .to_pandas().sort_values("v").reset_index(drop=True)
    assert out["band"].tolist()[:4] == ["a", "a", "b", "b"]
    assert out["band"].isna().tolist()[4:] == [True, True]  # 25.0, nan
    inner = broadcast_range_join(_ds(df), bands, value_col="v",
                                 how="inner").to_pandas()
    assert len(inner) == 4
    bad = pa.table({"band": ["a", "b"], "lo": [0.0, 5.0], "hi": [10.0, 20.0]})
    with pytest.raises(ValueError, match="overlap"):
        broadcast_range_join(_ds(df), bad, value_col="v")


def test_token_counts_tf_df(ray_session):
    from feature_fabrica_ray.pipelines import token_counts

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a b a", " b  c ", ""]})
    out = token_counts(_ds(df, blocks=2)).to_pandas() \
        .set_index("token").sort_index()
    assert out.loc["a", "tf"] == 2 and out.loc["a", "df"] == 1
    assert out.loc["b", "tf"] == 2 and out.loc["b", "df"] == 2
    assert out.loc["c", "tf"] == 1 and out.loc["c", "df"] == 1
    assert len(out) == 3          # no empty-string token


def test_exact_dedup_shuffle_equals_broadcast_form(ray_session):
    """The dup-heavy full-shuffle dedup keeps exactly the same rows as
    the broadcast form (deterministic pick-first per key)."""
    from feature_fabrica_ray.pipelines import (exact_dedup_rows,
                                               exact_dedup_rows_shuffle)
    from feature_fabrica_ray.sources import read_codetable

    key = ["repo", "path", "commit"]
    a = exact_dedup_rows(read_codetable(SF, with_sha256=False), key) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    b = exact_dedup_rows_shuffle(read_codetable(SF, with_sha256=False), key) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_stratified_sample(ray_session):
    """Per-stratum fractions hold (0 and 1 exactly; others approximately),
    and membership is partition-invariant and nested like hash_sample."""
    from feature_fabrica_ray.pipelines import stratified_sample

    n = 4000
    df = pd.DataFrame({"k": np.arange(n),
                       "lang": np.where(np.arange(n) % 2 == 0, "en", "zh")})
    fr = {"en": 1.0, "zh": 0.25}
    out = stratified_sample(_ds(df, blocks=4), "lang", fr,
                            key_columns=["k"]).to_pandas()
    en = out[out["lang"] == "en"]
    zh = out[out["lang"] == "zh"]
    assert len(en) == n // 2                       # fraction 1.0 keeps all
    assert abs(len(zh) / (n // 2) - 0.25) < 0.05   # ~25%
    # unknown stratum defaults to 0
    df2 = df.assign(lang="fr")
    assert stratified_sample(_ds(df2), "lang", fr,
                             key_columns=["k"]).count() == 0
    # partition invariance
    out1 = stratified_sample(_ds(df, blocks=1), "lang", fr,
                             key_columns=["k"]).to_pandas()
    assert sorted(out["k"]) == sorted(out1["k"])


def test_tfidf_top_terms(ray_session):
    """tf * ln(N/df) scoring with deterministic ranks; invariant to
    block layout; ubiquitous tokens score zero."""
    from feature_fabrica_ray.pipelines import tfidf_top_terms

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["apple apple banana common",
                 "banana cherry common",
                 "common cherry"],
    })
    out = tfidf_top_terms(_ds(df, blocks=2), k=2).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    d1 = out[out["doc_id"] == 1]
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert d1.iloc[0]["token"] == "apple"
    assert d1.iloc[0]["tfidf"] == pytest.approx(2 * np.log(3), abs=1e-6)
    assert d1.iloc[1]["token"] == "banana"
    # 'common' is in every doc -> tfidf 0, ranks below everything else
    assert "common" not in set(d1["token"])
    out1 = tfidf_top_terms(_ds(df, blocks=1), k=2).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out1)


def test_chunk_documents(ray_session):
    """Non-overlapping and overlapping windows; empty docs emit nothing;
    block-layout invariant."""
    from feature_fabrica_ray.pipelines import chunk_documents

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a b c d e", " x  y ", ""]})
    out = chunk_documents(_ds(df, blocks=2), max_tokens=2).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    got = list(map(tuple, out[["doc_id", "chunk_id", "chunk_text",
                               "n_tokens"]].values))
    assert got == [(1, 0, "a b", 2), (1, 1, "c d", 2), (1, 2, "e", 1),
                   (2, 0, "x y", 2)]
    # overlapping: stride 1, width 2 -> windows at every token
    ov = chunk_documents(_ds(df), max_tokens=2, stride=1).to_pandas()
    d1 = ov[ov["doc_id"] == 1].sort_values("chunk_id")
    assert d1["chunk_text"].tolist() == ["a b", "b c", "c d", "d e", "e"]
    out1 = chunk_documents(_ds(df, blocks=1), max_tokens=2).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out1)
    with pytest.raises(ValueError):
        chunk_documents(_ds(df), max_tokens=2, stride=3)


def test_exact_dedup_shuffle_key_only_schema(ray_session):
    """A table consisting only of the key columns still dedups (no
    tiebreak columns to sort by)."""
    from feature_fabrica_ray.pipelines import exact_dedup_rows_shuffle

    df = pd.DataFrame({"a": ["x", "x", "y"], "b": [1, 1, 2]})
    out = exact_dedup_rows_shuffle(_ds(df, blocks=2), ["a", "b"]).to_pandas()
    assert sorted(map(tuple, out.values.tolist())) == [("x", 1), ("y", 2)]


def test_pca_project_and_normalize(ray_session):
    """PCA on a known low-rank embedding recovers the dominant
    directions (reconstruction error ~0 for rank-2 data); projection is
    partition-invariant; normalize gives unit norms."""
    from feature_fabrica_ray.pipelines import (fit_pca, normalize_embeddings,
                                               pca_project)
    import ray.data

    rng = np.random.default_rng(5)
    basis2 = rng.standard_normal((2, 8))
    coeffs = rng.standard_normal((200, 2))
    V = coeffs @ basis2                      # exact rank-2 data
    df = pd.DataFrame({"vec_id": np.arange(200),
                       "embedding": list(map(list, V))})
    ds = ray.data.from_pandas(df).repartition(3)
    basis = fit_pca(ds, n_components=2)
    out = pca_project(ds, basis).to_pandas().sort_values("vec_id")
    P = np.asarray([np.asarray(r, np.float64) for r in out["embedding_pca"]])
    # reconstruct from 2 components: rank-2 data -> near-exact
    rec = P @ np.asarray(basis["components"]) + np.asarray(basis["mean"])
    assert np.abs(rec - V).max() < 1e-8
    out1 = pca_project(ray.data.from_pandas(df), basis).to_pandas() \
        .sort_values("vec_id")
    P1 = np.asarray([np.asarray(r, np.float64) for r in out1["embedding_pca"]])
    np.testing.assert_allclose(P, P1, rtol=1e-12)

    nrm = normalize_embeddings(ds).to_pandas()
    norms = np.array([np.linalg.norm(np.asarray(v, np.float64))
                      for v in nrm["embedding"]])
    np.testing.assert_allclose(norms, 1.0, rtol=1e-9)


def test_minhash_distributed_dup_heavy_corpus(ray_session):
    """The distributed path's reason to exist: a corpus where HALF the
    documents are near-dups (100 clusters x 3 variants) still verifies
    exactly the same pairs as the driver form."""
    from feature_fabrica_ray.pipelines import minhash_lsh_pairs_distributed

    rng = np.random.default_rng(11)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
                      "theta", "iota", "kappa", "lom", "mu", "nu"])
    rows = []
    for c in range(100):
        base = " ".join(rng.choice(vocab, size=30))
        rows.append((c * 10, base))
        rows.append((c * 10 + 1, base + " tailone"))
        rows.append((c * 10 + 2, base + " tailtwo"))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    drv = minhash_lsh_pairs(_ds(df, blocks=4), threshold=0.5)
    dst = minhash_lsh_pairs_distributed(_ds(df, blocks=4),
                                        threshold=0.5).to_pandas()
    key = lambda d: sorted(map(tuple,
                               d[["id_a", "id_b", "jaccard"]].values.tolist()))
    assert key(drv) == key(dst)
    # every planted cluster yields its 3 intra-cluster pairs
    found = {(a, b) for a, b in dst[["id_a", "id_b"]].values.tolist()}
    for c in range(100):
        ids = [c * 10, c * 10 + 1, c * 10 + 2]
        for i in range(3):
            for j in range(i + 1, 3):
                assert (ids[i], ids[j]) in found


def test_resize_image_golden(ray_session):
    """Nearest-neighbor resize under the fake-pixel contract: exact
    source-index math, zero-padding past the body, new header stamped."""
    import pyarrow as pa
    import ray.data
    from feature_fabrica_ray.pipelines import ResizeImage

    def payload(w, h, body):
        return np.uint32(w).tobytes() + np.uint32(h).tobytes() + bytes(body)

    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "media_type": pa.array(["image"] * 2, pa.string()),
        "payload": pa.array([payload(4, 2, range(8)),
                             payload(4, 2, range(3))],   # short body -> pad
                            pa.binary()),
        "n_bytes": pa.array([16, 11], pa.int64()),
    })
    out = ray.data.from_arrow(t).map_batches(
        ResizeImage, fn_constructor_kwargs={"out_w": 2, "out_h": 1},
        concurrency=1, batch_format="pyarrow").to_pandas() \
        .set_index("media_id")
    p1 = out.loc[1, "payload"]
    assert p1[8:] == bytes([0, 2])          # pixels (0,0) and (0,2)
    assert np.frombuffer(p1[:4], np.uint32)[0] == 2   # new width header
    p2 = out.loc[2, "payload"]
    assert p2[8:] == bytes([0, 2])          # body[2] present, rest padded
    assert (out["n_bytes"] == 10).all()
    assert (out["width"] == 2).all() and (out["height"] == 1).all()


def test_text_ops_on_empty_input(ray_session):
    """Zero-row datasets flow through the text operators without
    crashing and produce typed empty outputs."""
    import pyarrow as pa
    import ray.data
    from feature_fabrica_ray.pipelines import (chunk_documents,
                                               tfidf_top_terms, token_counts)

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert token_counts(empty).count() == 0
    assert chunk_documents(empty, max_tokens=8).count() == 0
    assert tfidf_top_terms(empty, k=3).count() == 0
    assert len(minhash_lsh_pairs(empty)) == 0


# ---------------------------------------------------------------------------
# group_quantiles (exact value-histogram quantiles)
# ---------------------------------------------------------------------------

def test_group_quantiles_matches_numpy(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], 300),
                       "v": rng.integers(0, 50, 300)})
    from feature_fabrica_ray.pipelines import group_quantiles
    out = group_quantiles(ray.data.from_pandas(df).repartition(5),
                          "g", "v", qs=(0.5, 0.9)).set_index("g")
    for g, sub in df.groupby("g"):
        want50 = np.floor(np.percentile(sub["v"], 50) * 1e6 + 0.5) / 1e6
        want90 = np.floor(np.percentile(sub["v"], 90) * 1e6 + 0.5) / 1e6
        assert out.loc[g, "q_50"] == want50
        assert out.loc[g, "q_90"] == want90
        assert out.loc[g, "n"] == len(sub)


def test_group_quantiles_disc(ray_session):
    """percentile_disc semantics: the smallest occurring element whose
    cumulative fraction >= q — numpy's inverted_cdf method; always an
    element of the multiset, block-layout invariant."""
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"g": rng.choice(["a", "b"], 200),
                       "v": rng.integers(0, 40, 200)})
    from feature_fabrica_ray.pipelines import group_quantiles
    for blocks in (1, 5):
        out = group_quantiles(ray.data.from_pandas(df).repartition(blocks),
                              "g", "v", qs=(0.5, 0.9),
                              disc=True).set_index("g")
        for g, sub in df.groupby("g"):
            for q, col in ((0.5, "q_50"), (0.9, "q_90")):
                want = float(np.percentile(sub["v"], q * 100,
                                           method="inverted_cdf"))
                assert out.loc[g, col] == want, (g, q)
                assert out.loc[g, col] in set(sub["v"])   # occurring value


def test_group_quantiles_nulls_excluded(ray_session):
    df = pd.DataFrame({"g": ["a"] * 4, "v": [1.0, None, 3.0, None]})
    from feature_fabrica_ray.pipelines import group_quantiles
    out = group_quantiles(ray.data.from_pandas(df), "g", "v", qs=(0.5,))
    assert out.loc[0, "n"] == 2 and out.loc[0, "q_50"] == 2.0


# ---------------------------------------------------------------------------
# pack_sequences (greedy next-fit context packing)
# ---------------------------------------------------------------------------

def _naive_next_fit(lens, context):
    seq, off, cur, fill = [], [], 0, 0
    for ln in lens:
        if fill > 0 and fill + ln > context:
            cur += 1; fill = 0
        seq.append(cur); off.append(fill); fill += ln
    return seq, off


def test_pack_sequences_matches_naive(ray_session):
    from feature_fabrica_ray.pipelines import pack_sequences
    rng = np.random.default_rng(3)
    n = 200
    df = pd.DataFrame({"doc_id": range(n),
                       "n_tokens": rng.integers(1, 900, n)})
    out = pack_sequences(ray.data.from_pandas(df).repartition(6),
                         context_len=2048, n_shards=4).to_pandas()
    assert len(out) == n
    for shard in range(4):
        sub = out[out["doc_id"] % 4 == shard].sort_values("doc_id")
        seq, off = _naive_next_fit(sub["n_tokens"].tolist(), 2048)
        base = sub["pack_id"].iloc[0] - seq[0]
        assert (sub["pack_id"] - base).tolist() == seq
        assert sub["pack_offset"].tolist() == off
    # no pack total exceeds the context unless it is a single oversize doc
    g = out.groupby("pack_id").agg(total=("n_tokens", "sum"),
                                   cnt=("n_tokens", "count"))
    assert ((g["total"] <= 2048) | (g["cnt"] == 1)).all()


def test_pack_sequences_partition_invariant(ray_session):
    from feature_fabrica_ray.pipelines import pack_sequences
    df = pd.DataFrame({"doc_id": range(60),
                       "n_tokens": [700] * 60})
    a = pack_sequences(ray.data.from_pandas(df).repartition(2),
                       context_len=2048, n_shards=3).to_pandas()
    b = pack_sequences(ray.data.from_pandas(df).repartition(9),
                       context_len=2048, n_shards=3).to_pandas()
    key = lambda t: t.sort_values("doc_id")[
        ["doc_id", "pack_id", "pack_offset"]].to_numpy().tolist()
    assert key(a) == key(b)
    # 700-token docs: 2 per pack (1400 fits, 2100 does not)
    assert a.groupby("pack_id").size().max() == 2


def test_pack_sequences_oversize_doc(ray_session):
    from feature_fabrica_ray.pipelines import pack_sequences
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "n_tokens": [100, 5000, 100]})
    out = pack_sequences(ray.data.from_pandas(df), context_len=2048,
                         n_shards=1).to_pandas().sort_values("doc_id")
    assert out["truncated"].tolist() == [False, True, False]
    assert len(set(out["pack_id"])) == 3   # oversize doc sits alone


# ---------------------------------------------------------------------------
# distributed k-means
# ---------------------------------------------------------------------------

def _blob_df(n_per=60, d=8, seed=0):
    rng = np.random.default_rng(seed)
    centers = np.array([[10.0] * d, [-10.0] * d, [10.0] * (d // 2) + [-10.0] * (d - d // 2)])
    rows, labels = [], []
    for c, ctr in enumerate(centers):
        rows.append(ctr + rng.normal(0, 0.5, (n_per, d)))
        labels += [c] * n_per
    X = np.vstack(rows)
    order = rng.permutation(len(X))
    return pd.DataFrame({"vec_id": range(len(X)),
                         "embedding": [X[i].tolist() for i in order],
                         "true": np.asarray(labels)[order]})


def test_kmeans_recovers_planted_blobs(ray_session):
    from feature_fabrica_ray.pipelines import kmeans, kmeans_assign
    df = _blob_df()
    ds = ray.data.from_pandas(df).repartition(4)
    C, sizes, inertia = kmeans(ds, k=3, iters=10)
    assert sorted(sizes.tolist()) == [60, 60, 60]
    # each recovered centroid sits within 1.0 of a planted center
    planted = np.array([[10.0] * 8, [-10.0] * 8, [10.0] * 4 + [-10.0] * 4])
    for c in C:
        assert np.min(np.linalg.norm(planted - c, axis=1)) < 1.0
    # assignment is pure within planted clusters
    out = kmeans_assign(ds, C).to_pandas()
    purity = out.groupby("true")["cluster"].nunique()
    assert (purity == 1).all()
    # inertia ~ n * d * var = 180*8*0.25 = 360; allow slack
    assert inertia < 600


def test_kmeans_partition_invariant_sizes(ray_session):
    from feature_fabrica_ray.pipelines import kmeans
    df = _blob_df(seed=5)
    a = kmeans(ray.data.from_pandas(df).repartition(2), k=3, iters=5)
    b = kmeans(ray.data.from_pandas(df).repartition(7), k=3, iters=5)
    assert sorted(a[1].tolist()) == sorted(b[1].tolist())


def test_fits_unbiased_on_cluster_sorted_layout(ray_session):
    """Adversarial layout: the dataset SORTED by its cluster label (the
    100-TB reality — tables arrive sorted by repo/lang). A first-N
    ``limit()`` fit sample would see only cluster 0; the hash-draw
    ``fit_sample`` must keep every fit representative, and the fitted
    ops must keep working: kmeans recovers all three planted blobs,
    fit_centroids spans all clusters, ivf_topk keeps recall, PCA
    separates the blobs, and every fit is layout-invariant (sorted vs
    shuffled input gives identical parameters)."""
    from feature_fabrica_ray.pipelines import (cosine_topk, fit_centroids,
                                               fit_pca, fit_sample, ivf_topk,
                                               kmeans)

    df = _blob_df(n_per=80, seed=9).sort_values("true") \
        .reset_index(drop=True)               # adversarial: label-sorted
    shuf = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    ds_sorted = ray.data.from_pandas(df).repartition(6)
    ds_shuf = ray.data.from_pandas(shuf).repartition(6)

    # the sample itself covers all clusters and ignores layout
    s_sorted = fit_sample(ds_sorted, 60, "embedding")
    s_shuf = fit_sample(ds_shuf, 60, "embedding")
    assert sorted(s_sorted["vec_id"]) == sorted(s_shuf["vec_id"])
    assert s_sorted["true"].nunique() == 3

    # kmeans seeded from the sample recovers every planted blob
    C, sizes, _ = kmeans(ds_sorted, k=3, iters=10)
    planted = np.array([[10.0] * 8, [-10.0] * 8,
                        [10.0] * 4 + [-10.0] * 4])
    for ctr in planted:
        assert np.min(np.linalg.norm(C - ctr, axis=1)) < 1.0
    assert sorted(sizes.tolist()) == [80, 80, 80]

    # IVF centroids span all clusters -> recall holds on sorted layout
    M = np.asarray([np.asarray(v, np.float64) for v in df["embedding"]])
    Q = M[[0, 90, 170]]
    exact = cosine_topk(ds_sorted, Q, k=10)
    approx = ivf_topk(ds_sorted, Q, k=10)
    e = set(map(tuple, exact[["query_id", "vec_id"]].values.tolist()))
    a = set(map(tuple, approx[["query_id", "vec_id"]].values.tolist()))
    assert len(e & a) / len(e) >= 0.7
    cfit = fit_centroids(ds_sorted, nlist=6, sample_rows=60)
    # centroids must not all sit in one blob: pairwise spread > blob noise
    spread = np.linalg.norm(cfit[:, None] - cfit[None, :], axis=2).max()
    assert spread > 1.0

    # PCA fit on the sorted layout separates the blobs and is
    # layout-invariant
    b_sorted = fit_pca(ds_sorted, 2, sample_size=60)
    b_shuf = fit_pca(ds_shuf, 2, sample_size=60)
    assert np.allclose(b_sorted["mean"], b_shuf["mean"])
    assert np.allclose(b_sorted["components"], b_shuf["components"])
    P = (M - b_sorted["mean"]) @ b_sorted["components"].T
    centroids = np.array([P[df["true"] == c].mean(axis=0) for c in range(3)])
    d01 = np.linalg.norm(centroids[0] - centroids[1])
    assert d01 > 10 * P[df["true"] == 0].std(axis=0).max()


def test_weighted_hash_sample(ray_session):
    """Keep-probability equals the weight column: weight 0 drops, weight
    1 keeps, fractional weights select the md5/hash64 sub-uniform draw;
    membership is partition-invariant and monotone in the weight."""
    import hashlib

    from feature_fabrica_ray.pipelines import weighted_hash_sample

    n = 3000
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                       "w": np.where(np.arange(n) % 3 == 0, 0.0,
                            np.where(np.arange(n) % 3 == 1, 1.0, 0.25))})
    out = weighted_hash_sample(_ds(df, blocks=1), ["k"], "w").to_pandas()
    out8 = weighted_hash_sample(_ds(df, blocks=8), ["k"], "w").to_pandas()
    assert sorted(out["k"]) == sorted(out8["k"])        # layout-invariant
    kept = set(out["k"])
    assert not any(k % 3 == 0 for k in kept)            # w=0 never kept
    assert all(k in kept for k in range(n) if k % 3 == 1)  # w=1 always kept
    frac = sum(1 for k in kept if k % 3 == 2) / (n / 3)
    assert 0.15 < frac < 0.35                           # ~w for w=0.25
    # monotone: raising every weight only adds rows
    df2 = df.assign(w=np.minimum(1.0, df["w"] + 0.25))
    out2 = weighted_hash_sample(_ds(df2), ["k"], "w").to_pandas()
    assert kept <= set(out2["k"])
    # null / out-of-range weights: null drops, >1 clips to 1
    df3 = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                        "w": [None, 7.5] * 50})
    out3 = weighted_hash_sample(_ds(df3), ["k"], "w").to_pandas()
    assert sorted(out3["k"]) == [k for k in range(100) if k % 2 == 1]
    # md5 mode matches the SQL predicate the sm_weighted oracle uses
    m = weighted_hash_sample(_ds(df, blocks=4), ["k"], "w",
                             method="md5").to_pandas()
    expect = {k for k, w in zip(df["k"], df["w"])
              if int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
              < np.floor(w * 4294967296.0)}
    assert set(m["k"]) == expect


def test_broadcast_join_semi_anti(ray_session):
    """'left semi' keeps each matching left row exactly once even when
    the right side has duplicate keys; 'left anti' keeps the complement;
    both preserve left columns only."""
    from feature_fabrica_ray.pipelines import broadcast_join

    left = pd.DataFrame({"k": [1, 2, 3, 4, 5], "x": list("abcde")})
    right = pd.DataFrame({"k": [2, 2, 2, 4], "y": [9, 8, 7, 6]})
    semi = broadcast_join(_ds(left, blocks=3), right, left_on="k",
                          right_columns=["k"], how="left semi").to_pandas()
    assert sorted(semi["k"]) == [2, 4] and list(semi.columns) == ["k", "x"]
    anti = broadcast_join(_ds(left, blocks=3), right, left_on="k",
                          right_columns=["k"], how="left anti").to_pandas()
    assert sorted(anti["k"]) == [1, 3, 5] and list(anti.columns) == ["k", "x"]


def test_code_line_stats(ray_session):
    """SQL string_split semantics: empty/null text is one empty line, a
    trailing newline adds a final empty line; max/nonempty per row from
    the single flat-buffer scan match a per-row python reference."""
    from feature_fabrica_ray.pipelines import code_line_stats

    texts = ["ab\nc", "", None, "x\n", "\n\n", "one line",
             "a\n\nbb\nccc\n", "\nlead", "t\nmid\n\nend",
             "# c\n  # ind\n\t// tab\ncode # not\n   / half\n#",
             "  \n //x\n/ /no"]
    df = pd.DataFrame({"i": range(len(texts)), "content": texts})
    out = code_line_stats(_ds(df, blocks=3), text_col="content") \
        .to_pandas().sort_values("i").reset_index(drop=True)

    import re

    def ref(s):
        lines = (s or "").split("\n")
        return (len(lines), max(len(x) for x in lines),
                sum(1 for x in lines if x),
                sum(1 for x in lines if re.match(r"^[ \t]*(#|//)", x)))

    for i, s in enumerate(texts):
        exp = ref(s)
        got = (int(out.loc[i, "n_lines"]), int(out.loc[i, "max_line_len"]),
               int(out.loc[i, "n_nonempty_lines"]),
               int(out.loc[i, "n_comment_lines"]))
        assert got == exp, (i, s, got, exp)


def test_connected_components_vs_union_find(ray_session):
    """Distributed label propagation finds exactly the union-find
    components (rep = min id) on a random graph plus a planted 9-node
    chain (exercises multi-round propagation) and an isolated pair."""
    from feature_fabrica_ray.pipelines import (connected_components,
                                               neardup_clusters)

    rng = np.random.default_rng(3)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 60, (80, 2))
             if a != b]
    edges += [(100 + i, 101 + i) for i in range(8)]      # chain 100..108
    edges += [(200, 201)]
    pairs = pd.DataFrame(edges, columns=["id_a", "id_b"])
    want = neardup_clusters(pairs)

    got = connected_components(_ds(pairs, blocks=3), "id_a", "id_b") \
        .to_pandas()
    got_map = dict(zip(got["node"].astype(int), got["comp"].astype(int)))
    assert got_map == want
    assert all(got_map[n] == 100 for n in range(100, 109))


def test_star_edges_components(ray_session):
    """star_edges lowers an equivalence key to node->class-min stars
    (singletons kept via the min's self-loop); feeding the union of two
    relations' stars into connected_components yields exactly the
    components of the union equivalence graph."""
    from feature_fabrica_ray.pipelines import (connected_components,
                                               neardup_clusters, star_edges)

    df = pd.DataFrame({
        "id": [0, 1, 2, 3, 4, 5, 6, 7],
        # relation A classes: {0,1} {2,3} {4} {5,6,7}
        "ka": ["x", "x", "y", "y", "z", "w", "w", "w"],
        # relation B bridges {2,3} with {4}; 7 alone
        "kb": ["p", "q", "r", "r2", "r", "s", "s2", "t"],
    })
    ea = star_edges(_ds(df, blocks=3), "id", "ka").to_pandas()
    # every node appears, each class points at its min
    assert set(ea["a"]) == set(range(8))
    amap = dict(zip(ea["a"], ea["b"]))
    assert amap[1] == 0 and amap[3] == 2 and amap[4] == 4 and amap[7] == 5

    eb = star_edges(_ds(df, blocks=2), "id", "kb").to_pandas()
    both = pd.concat([ea, eb], ignore_index=True) \
        .rename(columns={"a": "id_a", "b": "id_b"})
    got = connected_components(_ds(both, blocks=3), "id_a", "id_b") \
        .to_pandas()
    got_map = dict(zip(got["node"].astype(int), got["comp"].astype(int)))
    want = neardup_clusters(both)
    assert got_map == want
    # relation B's shared "r" key must have merged {2,3} with {4}
    assert got_map[2] == got_map[3] == got_map[4]
    assert got_map[0] == got_map[1] == 0
    assert got_map[5] == got_map[6] == got_map[7] == 5


def test_neardup_dedup_distributed_equals_driver(ray_session):
    """The zero-driver keep-one path (distributed pairs -> distributed
    components -> anti join) keeps exactly the rows the driver
    union-find form keeps, on a dup-heavy corpus."""
    from feature_fabrica_ray.pipelines import (
        neardup_dedup_rows, neardup_dedup_rows_distributed)

    rng = np.random.default_rng(5)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                      "zeta", "theta", "iota", "kappa", "lom"])
    rows = []
    for c in range(40):
        base = " ".join(rng.choice(vocab, size=25))
        rows.append((c * 10, base))
        rows.append((c * 10 + 1, base + " tailone"))
        rows.append((c * 10 + 5, " ".join(rng.choice(vocab, size=25))))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])

    drv = neardup_dedup_rows(_ds(df, blocks=4), threshold=0.5) \
        .to_pandas()["doc_id"]
    dst = neardup_dedup_rows_distributed(_ds(df, blocks=4), threshold=0.5) \
        .to_pandas()["doc_id"]
    assert sorted(drv) == sorted(dst)
    assert len(dst) < len(df)                 # something was deduped


def test_curate_corpus_invariants(ray_session):
    """The composed curation chain (gopher gate -> normalize -> exact
    dedup -> chunk -> pack) is block-layout deterministic and satisfies
    its stage invariants: no duplicate normalized text survives (rep =
    min doc id), chunk token counts tile each kept doc, every
    non-truncated pack fits the context window."""
    from feature_fabrica_ray.pipelines import curate_corpus

    rng = np.random.default_rng(17)
    syl = ["ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
           "ka", "ke", "ki", "ko", "ku", "ma", "me", "mi", "mo", "mu"]
    vocab = np.array([a + b for a in syl for b in syl])   # 400 alpha words
    rows = []
    for i in range(30):
        words = rng.integers(12, 40)
        rows.append((i, " ".join(rng.choice(vocab, words))))
    rows.append((100, rows[3][1].upper()))          # case-only duplicate
    rows.append((101, "  " + rows[5][1] + "  "))    # whitespace-only dup
    rows.append((102, "short text"))                # fails min_words
    df = pd.DataFrame(rows, columns=["doc_id", "text"])

    outs = []
    for blocks in (1, 4):
        out = curate_corpus(_ds(df, blocks=blocks), min_words=10,
                            max_tokens=8, context_len=32, n_shards=4,
                            gopher_kw={"max_top_word_frac": 0.5}) \
            .to_pandas().sort_values(["doc_id", "chunk_id"]) \
            .reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]

    kept_docs = set(out["doc_id"])
    assert 102 not in kept_docs                     # quality-gated
    assert 100 not in kept_docs and 101 not in kept_docs  # deduped
    assert 3 in kept_docs and 5 in kept_docs        # min-id reps kept
    # chunk token counts tile each doc: all chunks full except the last
    for d, sub in out.groupby("doc_id"):
        sub = sub.sort_values("chunk_id")
        assert (sub["n_tokens"].iloc[:-1] == 8).all()
        assert 1 <= sub["n_tokens"].iloc[-1] <= 8
    # packing: per-pack token sums fit the context unless truncated
    tot = out.groupby("pack_id").agg(s=("n_tokens", "sum"),
                                     t=("truncated", "any"))
    assert ((tot["s"] <= 32) | tot["t"]).all()
    # offsets are the running sum within each pack
    for _, sub in out.groupby("pack_id"):
        sub = sub.sort_values("pack_offset")
        assert sub["pack_offset"].iloc[0] == 0
        assert (sub["pack_offset"].to_numpy()[1:]
                == np.cumsum(sub["n_tokens"].to_numpy())[:-1]).all()


def test_broadcast_cross_join(ray_session):
    """Cartesian expansion: n x m rows, left and right columns zipped in
    the right order; the right-side guard rejects a cross join that
    would explode the output."""
    import ray.data

    from feature_fabrica_ray.pipelines import broadcast_cross_join

    left = ray.data.from_pandas(pd.DataFrame({"a": [1, 2, 3]})).repartition(2)
    right = pd.DataFrame({"b": ["x", "y"]})
    out = broadcast_cross_join(left, right).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert len(out) == 6
    assert out["a"].tolist() == [1, 1, 2, 2, 3, 3]
    assert out["b"].tolist() == ["x", "y"] * 3
    with pytest.raises(ValueError):
        broadcast_cross_join(left, pd.DataFrame({"b": range(50)}),
                             max_right_rows=10)


def test_shuffle_join_full_outer(ray_session):
    """FULL OUTER keeps unmatched rows from BOTH sides with nulls on
    the other side; the key column is coalesced (SQL USING parity)."""
    import ray.data

    from feature_fabrica_ray.pipelines import shuffle_join

    l = ray.data.from_pandas(pd.DataFrame({"k": ["a", "b"], "lv": [1, 2]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": ["b", "c"], "rv": [20, 30]}))
    out = shuffle_join(l, r, on="k", how="full_outer", num_partitions=2) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == ["a", "b", "c"]
    assert out["lv"].fillna(-1).tolist() == [1, 2, -1]
    assert out["rv"].fillna(-1).tolist() == [-1, 20, 30]


def test_unigram_logprob(ray_session):
    """avg ln p(token) under the corpus-fit unigram model; empty docs
    emit no row; result is invariant to block layout."""
    import math

    from feature_fabrica_ray.pipelines import unigram_logprob

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a a b", "b c", "", "a"],
    })
    # corpus: a=3, b=2, c=1, total=6
    out = unigram_logprob(_ds(df, blocks=2)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2, 4]      # doc 3 empty
    assert out["n_tokens"].tolist() == [3, 2, 1]
    lp = {"a": math.log(3 / 6), "b": math.log(2 / 6), "c": math.log(1 / 6)}
    want = [round((2 * lp["a"] + lp["b"]) / 3, 6),
            round((lp["b"] + lp["c"]) / 2, 6),
            round(lp["a"], 6)]
    assert out["avg_logprob"].tolist() == pytest.approx(want, abs=1e-9)
    out4 = unigram_logprob(_ds(df, blocks=4)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out4.equals(out)


def test_funnel_steps(ray_session):
    """Greedy earliest completion, each step STRICTLY after the
    previous; keys with a broken prefix stop early."""
    from feature_fabrica_ray.pipelines import funnel_steps

    t0 = pd.Timestamp("2024-01-01")
    s = lambda k: t0 + pd.Timedelta(seconds=k)
    df = pd.DataFrame({
        # user 1: full funnel but the only purchase BEFORE click must
        # not count; a later purchase completes it
        "user_id": [1, 1, 1, 1, 1, 2, 2, 3, 4],
        "event_type": ["view", "purchase", "click", "purchase", "view",
                       "click", "view", "view", "error"],
        "ts": [s(0), s(1), s(2), s(3), s(4),
               s(0), s(1), s(5), s(0)],
        "event_id": [10, 11, 12, 13, 14, 20, 21, 30, 40],
    })
    out = funnel_steps(_ds(df, blocks=3), "ts", "user_id", "event_type",
                       "event_id", ["view", "click", "purchase"])
    by = out.set_index("user_id")
    # user 4 has no step-type events at all -> absent
    assert sorted(by.index) == [1, 2, 3]
    assert by.loc[1, "steps"] == 3
    us = lambda k: int(s(k).value // 1000)
    assert (by.loc[1, ["ts1_us", "ts2_us", "ts3_us"]].tolist()
            == [us(0), us(2), us(3)])
    # user 2: click before any view -> view matches at s(1), no click
    # after it -> steps=1
    assert by.loc[2, "steps"] == 1 and by.loc[2, "ts1_us"] == us(1)
    assert by.loc[3, "steps"] == 1
    assert pd.isna(by.loc[3, "ts2_us"]) and pd.isna(by.loc[1, "ts1_us"]) is False


def test_interval_overlap_pairs(ray_session):
    """Strict overlap semantics (touching endpoints do NOT overlap);
    emitted pairs match the quadratic definition; keys are independent."""
    from feature_fabrica_ray.pipelines import interval_overlap_pairs

    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, 2],
        "id": [1, 2, 3, 4, 5, 6],
        "s": [0, 5, 10, 10, 0, 100],
        "e": [10, 7, 20, 12, 50, 200],
    })
    out = interval_overlap_pairs(_ds(df, blocks=3), "k", "id", "s", "e")
    # brute-force truth
    want = []
    for _, g in df.groupby("k"):
        r = g.to_dict("records")
        for i in range(len(r)):
            for j in range(i + 1, len(r)):
                a, b = r[i], r[j]
                if a["s"] < b["e"] and b["s"] < a["e"]:
                    want.append((a["k"], min(a["id"], b["id"]),
                                 max(a["id"], b["id"]),
                                 min(a["e"], b["e"]) - max(a["s"], b["s"])))
    got = list(out.itertuples(index=False, name=None))
    assert sorted(got) == sorted(want)
    # (1,2) overlap [5,7); (3,4) overlap [10,12); 1-3 touch at 10 -> no
    ids = {(a, b) for _, a, b, _ in got}
    assert (1, 2) in ids and (3, 4) in ids and (1, 3) not in ids


def test_connected_components_long_chain(ray_session):
    """Pointer jumping collapses convergence to O(log diameter): a
    300-node path (diameter 299) must finish well under 299 rounds —
    neighbor-min alone would need one round per hop."""
    from feature_fabrica_ray.pipelines import connected_components

    n = 300
    df = pd.DataFrame({"a": np.arange(n - 1), "b": np.arange(1, n)})
    got = connected_components(_ds(df, blocks=4), "a", "b", max_iters=12) \
        .to_pandas()
    assert len(got) == n
    assert (got["comp"] == 0).all()


def test_quantize_embeddings(ray_session):
    """Per-dim min-max int8 codes: extremes map to 0/255, constant
    dims to 0; layout-invariant because ranges are fit globally."""
    from feature_fabrica_ray.pipelines import quantize_embeddings

    df = pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [[0.0, 5.0, 7.0], [10.0, 5.0, 3.0], [5.0, 5.0, 5.0]],
    })
    out = quantize_embeddings(_ds(df, blocks=3)).to_pandas() \
        .sort_values(["vec_id", "dim"]).reset_index(drop=True)
    got = {(r.vec_id, r.dim): r.q for r in out.itertuples()}
    # dim 0: lo=0 hi=10 -> 0, 255, 128 (round(5/10*255)=round(127.5)=128)
    assert got[(0, 0)] == 0 and got[(1, 0)] == 255 and got[(2, 0)] == 128
    # dim 1 constant -> all 0
    assert got[(0, 1)] == got[(1, 1)] == got[(2, 1)] == 0
    # dim 2: lo=3 hi=7 -> 255, 0, 128
    assert got[(0, 2)] == 255 and got[(1, 2)] == 0 and got[(2, 2)] == 128
    out1 = quantize_embeddings(_ds(df, blocks=1)).to_pandas() \
        .sort_values(["vec_id", "dim"]).reset_index(drop=True)
    assert out1.equals(out)


def test_cohort_retention(ray_session):
    """Cohorts truncate to Monday (SQL date_trunc('week') parity);
    a key active twice in one week counts once; offsets are exact
    week deltas."""
    from feature_fabrica_ray.pipelines import cohort_retention

    mon = pd.Timestamp("2024-01-01")          # a Monday
    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2, 3],
        "ts": [mon + pd.Timedelta(days=2),    # u1 week 0 (Wed)
               mon + pd.Timedelta(days=3),    # u1 week 0 again (Thu)
               mon + pd.Timedelta(days=15),   # u1 week 2
               mon + pd.Timedelta(days=6),    # u2 week 0 (Sunday!)
               mon + pd.Timedelta(days=7),    # u2 week 1 (next Monday)
               mon + pd.Timedelta(days=21)],  # u3 cohort = week 3
    })
    out = cohort_retention(_ds(df, blocks=3), "ts", "u")
    us = lambda d: int((mon + pd.Timedelta(days=d)).value // 1000)
    got = {(r.cohort_us, r.offset_w): r.n_keys for r in out.itertuples()}
    assert got == {
        (us(0), 0): 2,     # u1 + u2 active in their cohort week
        (us(0), 1): 1,     # u2
        (us(0), 2): 1,     # u1
        (us(21), 0): 1,    # u3's own cohort
    }


def test_anova_f(ray_session):
    """F statistic matches the closed-form hand computation; null
    values excluded; degenerate inputs yield NULL f_stat."""
    from feature_fabrica_ray.pipelines import anova_f

    df = pd.DataFrame({
        "g": ["a", "a", "a", "b", "b", "b", "b", "a"],
        "v": [1.0, 2.0, 3.0, 6.0, 7.0, 8.0, 9.0, None],
    })
    out = anova_f(_ds(df, blocks=3), "g", "v").iloc[0]
    # a: n=3 mean=2; b: n=4 mean=7.5; grand = (6+30)/7
    grand = 36 / 7
    ssb = 3 * (2 - grand) ** 2 + 4 * (7.5 - grand) ** 2
    ssw = ((1 - 2) ** 2 + 0 + (3 - 2) ** 2) + sum((x - 7.5) ** 2
                                                  for x in (6, 7, 8, 9))
    want = (ssb / 1) / (ssw / 5)
    assert out["f_stat"] == pytest.approx(round(want, 6), abs=1e-9)
    assert out["df_between"] == 1 and out["df_within"] == 5
    assert out["k"] == 2 and out["n"] == 7
    # one group only -> NULL
    one = anova_f(_ds(df[df["g"] == "a"].copy()), "g", "v").iloc[0]
    assert pd.isna(one["f_stat"])


def test_target_encode_loo(ray_session):
    """LOO mean excludes the row itself; singleton categories and null
    targets encode to NULL; fit is global across blocks."""
    from feature_fabrica_ray.pipelines import target_encode_loo

    df = pd.DataFrame({
        "k": ["x", "x", "x", "y", "z", "x"],
        "v": [1.0, 2.0, 6.0, 5.0, 7.0, None],
    })
    out = target_encode_loo(_ds(df, blocks=3), "k", "v").to_pandas()
    out = out.sort_values(["k", "v"], na_position="last") \
        .reset_index(drop=True)
    te = dict(zip(zip(out["k"], out["v"].fillna(-1)), out["te"]))
    assert te[("x", 1.0)] == pytest.approx((2 + 6) / 2)
    assert te[("x", 2.0)] == pytest.approx((1 + 6) / 2)
    assert te[("x", 6.0)] == pytest.approx((1 + 2) / 2)
    assert pd.isna(te[("y", 5.0)])       # singleton category
    assert pd.isna(te[("z", 7.0)])
    assert pd.isna(te[("x", -1.0)])      # null target row


def test_event_transitions(ray_session):
    """Consecutive pairs counted within key only, ordered by (ts,
    order); single-event keys contribute nothing."""
    from feature_fabrica_ray.pipelines import event_transitions

    t0 = pd.Timestamp("2024-01-01")
    s = lambda k: t0 + pd.Timedelta(seconds=k)
    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2, 3],
        "et": ["a", "b", "a", "a", "b", "c"],
        "ts": [s(0), s(1), s(2), s(0), s(1), s(0)],
        "eid": [1, 2, 3, 4, 5, 6],
    })
    out = event_transitions(_ds(df, blocks=3), "ts", "u", "et", "eid")
    got = {(r.from_type, r.to_type): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_mutual_information(ray_session):
    """MI matches the closed form; independent columns give ~0;
    identical columns give MI = H(A) (NMI = 1); nulls excluded."""
    import math

    from feature_fabrica_ray.pipelines import mutual_information

    # perfectly dependent: b = f(a)
    df = pd.DataFrame({"a": ["x", "x", "y", "y", "z", None],
                       "b": ["p", "p", "q", "q", "r", "r"]})
    out = mutual_information(_ds(df, blocks=3), "a", "b").iloc[0]
    h = -(0.4 * math.log(0.4) * 2 + 0.2 * math.log(0.2))
    assert out["n"] == 5
    assert out["mi"] == pytest.approx(round(h, 6), abs=2e-6)
    assert out["nmi"] == pytest.approx(1.0, abs=2e-6)
    # independent uniform 2x2
    df2 = pd.DataFrame({"a": ["x", "x", "y", "y"],
                        "b": ["p", "q", "p", "q"]})
    out2 = mutual_information(_ds(df2, blocks=2), "a", "b").iloc[0]
    assert out2["mi"] == pytest.approx(0.0, abs=2e-6)


def test_rank_normalize(ray_session):
    """cume_dist semantics: ties share the cumulative position of the
    last equal value; nulls pass through; fit is global across blocks."""
    from feature_fabrica_ray.pipelines import rank_normalize

    df = pd.DataFrame({"id": [1, 2, 3, 4, 5, 6],
                       "v": [10.0, 20.0, 20.0, 30.0, None, 5.0]})
    out = rank_normalize(_ds(df, blocks=3), "v").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    got = dict(zip(out["id"], out["rank_norm"]))
    # non-null multiset: 5, 10, 20, 20, 30 (n=5)
    assert got[6] == pytest.approx(1 / 5)
    assert got[1] == pytest.approx(2 / 5)
    assert got[2] == got[3] == pytest.approx(4 / 5)
    assert got[4] == pytest.approx(1.0)
    assert pd.isna(got[5])


def test_equidepth_buckets(ray_session):
    """ceil(cume_dist * k) semantics: equal values share a bucket,
    max value lands in bucket k, nulls get NULL."""
    from feature_fabrica_ray.pipelines import equidepth_buckets

    df = pd.DataFrame({"id": range(8),
                       "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]})
    out = equidepth_buckets(_ds(df, blocks=3), "v", k=4).to_pandas() \
        .sort_values("id")
    assert out["bucket_id"].tolist() == [1, 1, 2, 2, 3, 3, 4, 4]
    dfn = pd.DataFrame({"id": [0, 1, 2], "v": [5.0, 5.0, None]})
    outn = equidepth_buckets(_ds(dfn, blocks=2), "v", k=4).to_pandas() \
        .sort_values("id")
    assert outn["bucket_id"].tolist()[:2] == [4, 4]   # ties share cume=1
    assert pd.isna(outn["bucket_id"].iloc[2])


def test_bloom_join_empty_prune(ray_session):
    """A Bloom prune that empties the whole left side (or single
    blocks) must not crash Ray's hash join on schema-less partitions;
    the empty inner-join result keeps the joined schema."""
    from feature_fabrica_ray.pipelines import bloom_filtered_join

    left = pd.DataFrame({"k": [1, 2, 3, 4], "lv": list("abcd")})
    right = pd.DataFrame({"k": [100, 200], "rv": ["x", "y"]})
    out = bloom_filtered_join(_ds(left, blocks=3), _ds(right, blocks=2),
                              on="k")
    assert out.count() == 0
    # schema survives the empty shortcut (to_pandas drops columns on
    # empty Datasets — a Ray quirk — so assert on the Dataset schema)
    assert {"k", "lv", "rv"} <= set(out.schema().names)
    # partial overlap still joins exactly
    right2 = pd.DataFrame({"k": [2, 3, 999], "rv": ["x", "y", "z"]})
    out2 = bloom_filtered_join(_ds(left, blocks=3), _ds(right2, blocks=3),
                               on="k").to_pandas().sort_values("k")
    assert out2["k"].tolist() == [2, 3]


def test_write_range_partitioned(ray_session, tmp_path):
    """k balanced hive directories with disjoint value ranges; nulls in
    bucket_id=-1; a read-back reconstructs the full table."""
    import pyarrow.parquet as pq

    from feature_fabrica_ray.pipelines import write_range_partitioned

    df = pd.DataFrame({"id": range(20),
                       "v": [float(i) for i in range(19)] + [None]})
    out = str(tmp_path / "ranged")
    write_range_partitioned(_ds(df, blocks=3), out, col="v", k=4)
    import json
    import os
    man = json.load(open(os.path.join(out, "_manifest.json")))
    assert man["col"] == "v" and man["k"] == 4
    assert sum(b["rows"] for b in man["buckets"].values()) == 20
    assert man["buckets"]["-1"]["rows"] == 1      # the null row
    # manifest ranges are disjoint and ordered for the real buckets
    bs = [man["buckets"][str(i)] for i in range(1, 5)]
    assert all(bs[i]["hi"] < bs[i + 1]["lo"] for i in range(3))
    t = pq.read_table(out).to_pandas()
    assert len(t) == 20
    t["bucket_id"] = t["bucket_id"].astype(int)
    # nulls isolated
    assert set(t.loc[t["v"].isna(), "bucket_id"]) == {-1}
    body = t.dropna(subset=["v"])
    # balanced: 19 non-null rows over 4 buckets
    sizes = body.groupby("bucket_id").size()
    assert sizes.min() >= 4 and sizes.max() <= 5
    # disjoint ranges: max of bucket b < min of bucket b+1
    rng = body.groupby("bucket_id")["v"].agg(["min", "max"]).sort_index()
    assert (rng["max"].to_numpy()[:-1] < rng["min"].to_numpy()[1:]).all()


def test_fd_violations(ray_session):
    """Keys mapping to >1 distinct non-null dep are reported with the
    distinct count; nulls don't create violations; composite keys."""
    from feature_fabrica_ray.pipelines import fd_violations

    df = pd.DataFrame({
        "a": ["r1", "r1", "r1", "r2", "r2", "r3", "r3"],
        "b": ["p1", "p1", "p2", "p1", "p1", "p1", "p1"],
        "dep": ["en", "fr", "en", "de", "de", "es", None],
    })
    out = fd_violations(_ds(df, blocks=3), ["a", "b"], "dep")
    assert len(out) == 1
    assert out.iloc[0]["a"] == "r1" and out.iloc[0]["b"] == "p1"
    assert out.iloc[0]["n_distinct"] == 2


def test_schema_diff_and_compact(ray_session, tmp_path):
    """schema_diff classifies added/removed/common; compact_parquet
    coalesces many small files preserving every row."""
    import os

    import pyarrow.parquet as pq

    from feature_fabrica_ray.pipelines import compact_parquet, schema_diff

    a = _ds(pd.DataFrame({"x": [1], "y": [2]}))
    b = _ds(pd.DataFrame({"y": [3], "z": [4]}))
    d = schema_diff(a, b)
    got = dict(zip(d["column"], d["status"]))
    assert got == {"x": "removed", "y": "common", "z": "added"}

    many = str(tmp_path / "many")
    _ds(pd.DataFrame({"v": range(1000)}), blocks=20).write_parquet(many)
    assert len(os.listdir(many)) >= 10
    out = str(tmp_path / "compacted")
    n = compact_parquet(many, out, target_rows_per_file=1000)
    assert n == 1000
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) <= 3
    t = pq.read_table(out)
    assert sorted(t.column("v").to_pylist()) == list(range(1000))


def test_spearman_corr(ray_session):
    """spearman_corr matches pandas' Spearman (average-rank ties) to
    1e-12, is exactly 1 on a monotone pair, excludes null-bearing
    pairs, is layout-invariant, and raises past the distinct bound."""
    import numpy as np
    import pandas as pd
    import pytest
    from feature_fabrica_ray.pipelines import spearman_corr

    rng = np.random.default_rng(3)
    x = rng.integers(0, 12, 400).astype(float)
    y = x * 2 + rng.integers(0, 8, 400)          # ties + monotone trend
    x[5], y[11] = np.nan, np.nan
    df = pd.DataFrame({"x": x, "y": y})

    got = spearman_corr(_ds(df, blocks=4), "x", "y")
    ok = df.dropna()
    # Spearman = Pearson over average ranks (scipy-free reference)
    exp = ok["x"].rank(method="average").corr(ok["y"].rank(method="average"))
    assert got["n"].iloc[0] == len(ok)
    assert got["spearman_rho"].iloc[0] == pytest.approx(exp, abs=1e-12)

    one = spearman_corr(_ds(df, blocks=1), "x", "y")
    pd.testing.assert_frame_equal(one, got)

    mono = pd.DataFrame({"x": np.arange(50, dtype=float),
                         "y": np.exp(np.arange(50) / 10.0)})
    r = spearman_corr(_ds(mono, blocks=3), "x", "y")
    assert r["spearman_rho"].iloc[0] == pytest.approx(1.0, abs=1e-12)

    empty = spearman_corr(_ds(pd.DataFrame({"x": [np.nan], "y": [1.0]})),
                          "x", "y")
    assert empty["n"].iloc[0] == 0 and pd.isna(empty["spearman_rho"].iloc[0])

    with pytest.raises(ValueError, match="distinct"):
        spearman_corr(_ds(mono), "x", "y", max_distinct_broadcast=10,
                      exact=True)
    # past the guard WITHOUT exact=True: loud degrade to the t-digest
    # path, monotone pair still reads ~1
    with pytest.warns(RuntimeWarning, match="t-digest"):
        deg = spearman_corr(_ds(mono, blocks=3), "x", "y",
                            max_distinct_broadcast=10)
    assert deg["n"].iloc[0] == 50
    assert deg["spearman_rho"].iloc[0] == pytest.approx(1.0, abs=0.05)


def test_spearman_kendall_approx(ray_session):
    """The t-digest scale path for continuous high-cardinality domains
    (every value distinct — the domain the exact broadcast path is
    guarded against): spearman_corr_approx tracks the exact average-rank
    Spearman and kendall_tau_approx tracks the exact tau-b within the
    sketch/binning resolution; both are layout-invariant given the
    deterministic per-block sketch merge order."""
    import numpy as np
    import pandas as pd
    import pytest
    from feature_fabrica_ray.pipelines import (kendall_tau,
                                               kendall_tau_approx,
                                               spearman_corr_approx)

    rng = np.random.default_rng(77)
    n = 20_000
    x = rng.normal(0, 1, n)
    y = 0.7 * x + rng.normal(0, 0.7, n)
    df = pd.DataFrame({"x": x, "y": y})

    exact_rho = df["x"].rank(method="average") \
        .corr(df["y"].rank(method="average"))
    got = spearman_corr_approx(_ds(df, blocks=4), "x", "y")
    assert got["n"].iloc[0] == n
    assert got["spearman_rho"].iloc[0] == pytest.approx(exact_rho,
                                                        abs=0.01)

    # exact kendall still works here (occupancy n << cell guard) — the
    # approx path must land within the quantile-bin resolution of it
    exact_tau = kendall_tau(_ds(df, blocks=4), "x", "y")
    approx_tau = kendall_tau_approx(_ds(df, blocks=4), "x", "y",
                                    bins=256)
    assert approx_tau["n"].iloc[0] == n
    assert approx_tau["kendall_tau"].iloc[0] == pytest.approx(
        exact_tau["kendall_tau"].iloc[0], abs=0.02)

    # empty input degrades to (0, NaN), no raise
    empty = spearman_corr_approx(
        _ds(pd.DataFrame({"x": [np.nan], "y": [1.0]})), "x", "y")
    assert empty["n"].iloc[0] == 0
    assert pd.isna(empty["spearman_rho"].iloc[0])


def test_partial_corr(ray_session):
    """partial_corr matches the first-order formula on numpy exact
    correlations to 1e-10, kills a pure confounder (x and y driven
    only by z => r_xy_z ~ 0 while r_xy is large), is layout-invariant,
    and degrades to NULL on zero-variance input."""
    import numpy as np
    import pandas as pd
    import pytest
    from feature_fabrica_ray.pipelines import partial_corr

    rng = np.random.default_rng(21)
    z = rng.normal(0, 1, 2000)
    x = 2 * z + rng.normal(0, 0.1, 2000)
    y = -3 * z + rng.normal(0, 0.1, 2000)
    df = pd.DataFrame({"x": x, "y": y, "z": z})

    got = partial_corr(_ds(df, blocks=4), "x", "y", "z")
    C = np.corrcoef(np.stack([x, y, z]))
    exp = (C[0, 1] - C[0, 2] * C[1, 2]) / np.sqrt(
        (1 - C[0, 2] ** 2) * (1 - C[1, 2] ** 2))
    assert got["n"].iloc[0] == 2000
    assert got["r_xy"].iloc[0] == pytest.approx(C[0, 1], abs=1e-10)
    assert got["r_xy_z"].iloc[0] == pytest.approx(exp, abs=1e-10)
    assert abs(got["r_xy"].iloc[0]) > 0.9       # confounded raw corr
    assert abs(got["r_xy_z"].iloc[0]) < 0.15    # confounder removed

    one = partial_corr(_ds(df, blocks=1), "x", "y", "z")
    pd.testing.assert_frame_equal(one, got)

    const = partial_corr(_ds(pd.DataFrame(
        {"x": [1.0, 1.0, 1.0], "y": [1.0, 2.0, 3.0],
         "z": [3.0, 2.0, 1.0]})), "x", "y", "z")
    assert pd.isna(const["r_xy_z"].iloc[0])


def test_kendall_tau(ray_session):
    """kendall_tau matches brute-force O(n²) pair counting (tau-b tie
    correction) to 1e-12, is 1/-1 on monotone pairs, excludes null
    pairs, is layout-invariant, and raises past the cell bound."""
    import numpy as np
    import pandas as pd
    import pytest
    from feature_fabrica_ray.pipelines import kendall_tau

    rng = np.random.default_rng(5)
    x = rng.integers(0, 9, 300).astype(float)
    y = (x + rng.integers(0, 6, 300)).astype(float)
    x[3], y[7] = np.nan, np.nan
    df = pd.DataFrame({"x": x, "y": y})

    got = kendall_tau(_ds(df, blocks=4), "x", "y")
    ok = df.dropna().to_numpy()
    conc = disc = tx = ty = 0
    for i in range(len(ok)):
        for j in range(i + 1, len(ok)):
            dx = np.sign(ok[i, 0] - ok[j, 0])
            dy = np.sign(ok[i, 1] - ok[j, 1])
            if dx == 0 and dy == 0:
                tx += 1
                ty += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif dx == dy:
                conc += 1
            else:
                disc += 1
    n2 = len(ok) * (len(ok) - 1) / 2
    exp = (conc - disc) / np.sqrt((n2 - tx) * (n2 - ty))
    assert got["n"].iloc[0] == len(ok)
    assert got["kendall_tau"].iloc[0] == pytest.approx(exp, abs=1e-12)

    one = kendall_tau(_ds(df, blocks=1), "x", "y")
    pd.testing.assert_frame_equal(one, got)

    mono = pd.DataFrame({"x": np.arange(40, dtype=float),
                         "y": np.arange(40, dtype=float) ** 3})
    assert kendall_tau(_ds(mono, blocks=3), "x", "y")[
        "kendall_tau"].iloc[0] == pytest.approx(1.0, abs=1e-12)
    anti = pd.DataFrame({"x": np.arange(40, dtype=float),
                         "y": -np.arange(40, dtype=float)})
    assert kendall_tau(_ds(anti), "x", "y")[
        "kendall_tau"].iloc[0] == pytest.approx(-1.0, abs=1e-12)

    empty = kendall_tau(_ds(pd.DataFrame({"x": [np.nan], "y": [1.0]})),
                        "x", "y")
    assert empty["n"].iloc[0] == 0 and pd.isna(empty["kendall_tau"].iloc[0])

    with pytest.raises(ValueError, match="cells"):
        kendall_tau(_ds(mono), "x", "y", max_cells_broadcast=5)


def test_rank_normalize_properties(ray_session):
    """Randomized: rank_norm equals pandas rank(method='max')/n on any
    input (ties included), is monotone in the value, and lands in
    (0, 1]."""
    rng = np.random.default_rng(123)
    vals = np.round(rng.normal(size=300), 1)   # heavy ties
    df = pd.DataFrame({"id": np.arange(300), "v": vals})
    from feature_fabrica_ray.pipelines import rank_normalize

    out = rank_normalize(_ds(df, blocks=5), "v").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    want = (df["v"].rank(method="max") / len(df)).round(6)
    assert np.allclose(out["rank_norm"], want, atol=1e-9)
    assert out["rank_norm"].min() > 0 and out["rank_norm"].max() <= 1.0
    order = df["v"].argsort(kind="mergesort")
    r = out["rank_norm"].to_numpy()[order]
    assert (np.diff(r) >= 0).all()


def test_interval_overlap_random_vs_bruteforce(ray_session):
    """Randomized: the sweep emits exactly the quadratic-definition
    pair set on arbitrary interval soups across several keys."""
    from feature_fabrica_ray.pipelines import interval_overlap_pairs

    rng = np.random.default_rng(7)
    n = 200
    s = rng.integers(0, 1000, n)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, n),
        "id": np.arange(n),
        "s": s,
        "e": s + rng.integers(1, 120, n),
    })
    got = set(map(tuple, interval_overlap_pairs(
        _ds(df, blocks=4), "k", "id", "s", "e")
        [["k", "id_a", "id_b"]].values.tolist()))
    want = set()
    for _, g in df.groupby("k"):
        r = g.to_dict("records")
        for i in range(len(r)):
            for j in range(i + 1, len(r)):
                a, b = r[i], r[j]
                if a["s"] < b["e"] and b["s"] < a["e"]:
                    want.add((a["k"], min(a["id"], b["id"]),
                              max(a["id"], b["id"])))
    assert got == want


def test_funnel_random_vs_reference(ray_session):
    """Randomized: greedy funnel matching equals a straightforward
    per-key reference scan on shuffled event soups."""
    from feature_fabrica_ray.pipelines import funnel_steps

    rng = np.random.default_rng(11)
    n = 400
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "u": rng.integers(0, 20, n),
        "et": rng.choice(["a", "b", "c", "x"], n),
        "ts": [t0 + pd.Timedelta(seconds=int(x))
               for x in rng.integers(0, 5000, n)],
        "eid": np.arange(n),
    })
    out = funnel_steps(_ds(df, blocks=4), "ts", "u", "et", "eid",
                       ["a", "b", "c"]).set_index("u")
    for u, g in df[df["et"].isin(["a", "b", "c"])].groupby("u"):
        g = g.sort_values(["ts", "eid"])
        prev, hits = pd.Timestamp.min, []
        for step in ["a", "b", "c"]:
            m = g[(g["et"] == step) & (g["ts"] > prev)]
            if not len(m):
                break
            prev = m["ts"].iloc[0]
            hits.append(prev)
        assert out.loc[u, "steps"] == len(hits)
        for i, h in enumerate(hits):
            assert out.loc[u, f"ts{i + 1}_us"] == h.value // 1000


def test_empty_input_robustness(ray_session):
    """Every session-5 operator must handle a 0-row (but typed) input
    without crashing — the bug class behind the jn_bloom/fd_violations
    empty-block fixes. Each returns a well-defined empty result."""
    import ray

    from feature_fabrica_ray.pipelines import (
        anova_f, cohort_retention, equidepth_buckets, event_transitions,
        ewma_per_key, fd_violations, funnel_steps, interval_overlap_pairs,
        mutual_information, rank_normalize, star_edges, target_encode_loo,
        unigram_logprob)

    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "text": pd.Series([], dtype=object)}))
    ev = ray.data.from_pandas(pd.DataFrame(
        {"u": pd.Series([], dtype="int64"),
         "ts": pd.Series([], dtype="datetime64[us]"),
         "et": pd.Series([], dtype=object),
         "eid": pd.Series([], dtype="int64"),
         "v": pd.Series([], dtype="float64"),
         "s": pd.Series([], dtype="int64"),
         "e": pd.Series([], dtype="int64")}))

    assert unigram_logprob(docs).count() == 0
    assert len(funnel_steps(ev, "ts", "u", "et", "eid", ["a", "b"])) == 0
    assert len(interval_overlap_pairs(ev, "u", "eid", "s", "e")) == 0
    assert len(cohort_retention(ev, "ts", "u")) == 0
    assert len(event_transitions(ev, "ts", "u", "et", "eid")) == 0
    assert len(ewma_per_key(ev, "ts", "u", "v", "eid")) == 0
    assert rank_normalize(ev, "v").count() == 0
    assert equidepth_buckets(ev, "v", k=4).count() == 0
    a = anova_f(ev, "et", "v").iloc[0]
    assert pd.isna(a["f_stat"]) and a["n"] == 0
    m = mutual_information(ev, "et", "u").iloc[0]
    assert pd.isna(m["mi"]) and m["n"] == 0
    assert target_encode_loo(ev, "et", "v").count() == 0
    assert len(fd_violations(ev, ["et"], "v")) == 0
    assert star_edges(docs, "doc_id", "text").count() == 0


def test_dsir_log_ratio(ray_session):
    """Hand-math golden under add-1 smoothing on the joint vocab:
    target-only tokens score positive, source-only tokens negative;
    layout invariance."""
    import math

    from feature_fabrica_ray.pipelines import dsir_log_ratio

    src_df = pd.DataFrame({"doc_id": [1, 2],
                           "text": ["cat dog", "dog bird"]})
    tgt_df = pd.DataFrame({"doc_id": [10], "text": ["cat cat"]})
    out = dsir_log_ratio(_ds(src_df, blocks=2), _ds(tgt_df)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # joint vocab = {cat, dog, bird}, V=3; Ns = 4+3 = 7, Nt = 2+3 = 5
    pt = lambda c: (c + 1) / 5.0
    ps = lambda c: (c + 1) / 7.0
    lr = {"cat": math.log(pt(2)) - math.log(ps(1)),
          "dog": math.log(pt(0)) - math.log(ps(2)),
          "bird": math.log(pt(0)) - math.log(ps(1))}
    want1 = round(lr["cat"] + lr["dog"], 6)
    want2 = round(lr["dog"] + lr["bird"], 6)
    assert out["log_ratio"].tolist() == pytest.approx([want1, want2],
                                                      abs=1e-9)
    assert lr["cat"] > 0 > lr["bird"]
    out4 = dsir_log_ratio(_ds(src_df, blocks=1), _ds(tgt_df)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out4.equals(out)


def test_semantic_dedup(ray_session, emb_ds):
    """Planted perturbed copies (cosine ~0.9999) must be dropped, the
    originals kept; orthogonal-ish originals all survive."""
    import ray

    from feature_fabrica_ray.pipelines import semantic_dedup_ids

    df = emb_ds.to_pandas()
    rng = np.random.default_rng(3)
    dup = df.head(10).copy()
    dup["vec_id"] = dup["vec_id"] + 100000
    dup["embedding"] = [
        (np.asarray(v, np.float64)
         + 1e-4 * rng.standard_normal(len(v))).tolist()
        for v in dup["embedding"]]
    both = emb_ds.union(ray.data.from_pandas(dup))
    out = semantic_dedup_ids(both, k=8, threshold=0.95)
    by = out.set_index("vec_id")["keep"]
    assert by.loc[range(10)].all()                   # originals kept
    assert not by.loc[[i + 100000 for i in range(10)]].any()  # copies drop
    # every non-planted original survives at this threshold
    assert by.loc[[i for i in by.index if i < 100000]].all()


def test_join_cardinality_estimate(ray_session):
    """HLL-based pre-join diagnostics within ~3% of exact distinct-key
    counts and overlap."""
    from feature_fabrica_ray.pipelines import join_cardinality_estimate

    left = pd.DataFrame({"k": np.arange(3000) % 1000})     # 1000 distinct
    right = pd.DataFrame({"j": np.arange(500, 1500)})      # 1000 distinct
    est = join_cardinality_estimate(_ds(left, blocks=4),
                                    _ds(right, blocks=3),
                                    on="k", right_on="j")
    assert abs(est["nd_left"] - 1000) <= 30
    assert abs(est["nd_right"] - 1000) <= 30
    assert abs(est["nd_union"] - 1500) <= 45
    assert abs(est["nd_intersect"] - 500) <= 60


def test_mann_whitney_auc(ray_session):
    """AUC matches sklearn-style hand computation incl. mid-rank ties;
    null rows excluded; single-class input yields NULL."""
    from feature_fabrica_ray.pipelines import mann_whitney_auc

    df = pd.DataFrame({
        "s": [0.1, 0.4, 0.35, 0.8, 0.4, None, 0.2],
        "y": [0,   0,   1,    1,   1,   1,    None],
    })
    out = mann_whitney_auc(_ds(df, blocks=3), "s", "y").iloc[0]
    # sorted scores: .1(y0) .2? excluded(null y) .35(y1) .4(y0) .4(y1) .8(y1)
    # valid rows: (.1,0) (.4,0) (.35,1) (.8,1) (.4,1) -> n=5
    # ranks: .1->1, .35->2, .4 ties ranks 3,4 midrank 3.5, .8->5
    # pos ranks: 2 + 3.5 + 5 = 10.5 ; npos=3 nneg=2
    want = (10.5 - 3 * 4 / 2) / (3 * 2)
    assert out["auc"] == pytest.approx(round(want, 6), abs=1e-9)
    assert out["n_pos"] == 3 and out["n_neg"] == 2
    assert out["n_scores"] == 4
    # perfect separation -> 1.0
    perfect = pd.DataFrame({"s": [1.0, 2.0, 3.0, 4.0],
                            "y": [0, 0, 1, 1]})
    assert mann_whitney_auc(_ds(perfect), "s", "y").iloc[0]["auc"] == 1.0
    # one class only -> NULL
    one = pd.DataFrame({"s": [1.0, 2.0], "y": [1, 1]})
    assert pd.isna(mann_whitney_auc(_ds(one), "s", "y").iloc[0]["auc"])
    # partition invariance
    a = mann_whitney_auc(_ds(df, blocks=1), "s", "y")
    b = mann_whitney_auc(_ds(df, blocks=4), "s", "y")
    pd.testing.assert_frame_equal(a, b)


def test_benford_profile(ray_session):
    """Digit extraction is numeric (no string formatting), nonpositive
    and null values excluded, chi2 covers absent digits."""
    from feature_fabrica_ray.pipelines import benford_profile

    df = pd.DataFrame({"x": [1.0, 12.5, 0.19, 950.0, 9.9, 200.0,
                             -5.0, 0.0, None]})
    out = benford_profile(_ds(df, blocks=3), "x")
    got = dict(zip(out["digit"], out["n"]))
    assert got == {1: 3, 2: 1, 9: 2}       # 1.0,12.5,0.19 / 200 / 950,9.9
    assert (out["obs_p"] == [round(3 / 6, 6), round(1 / 6, 6),
                             round(2 / 6, 6)]).all()
    import numpy as np
    exp_p = np.log10(1 + 1.0 / np.arange(1, 10))
    obs = np.zeros(9)
    obs[[0, 1, 8]] = [3 / 6, 1 / 6, 2 / 6]
    want_chi2 = float((6 * (obs - exp_p) ** 2 / exp_p).sum())
    assert out["chi2"].iloc[0] == pytest.approx(round(want_chi2, 6),
                                                abs=1e-9)
    # all-null/empty input -> typed empty frame
    empty = benford_profile(_ds(pd.DataFrame({"x": [None, -1.0]})), "x")
    assert len(empty) == 0 and list(empty.columns) == [
        "digit", "n", "obs_p", "exp_p", "chi2"]


def test_cooccurrence_pairs(ray_session):
    """Pair counts match the hand enumeration; within-group duplicate
    items collapse; null items ignored; oversized groups fail loud."""
    from feature_fabrica_ray.pipelines import cooccurrence_pairs

    df = pd.DataFrame({
        "g": [1, 1, 1, 1, 2, 2, 3, 3, 3, 4],
        "i": ["a", "b", "c", "a", "a", "b", "b", "c", None, "a"],
    })
    out = cooccurrence_pairs(_ds(df, blocks=3), "g", "i", top=10)
    got = {(r.a, r.b): r.n for r in out.itertuples()}
    # g1: {a,b,c} -> ab ac bc ; g2: {a,b} -> ab ; g3: {b,c} -> bc
    assert got == {("a", "b"): 2, ("b", "c"): 2, ("a", "c"): 1}
    # ordering: count desc then (a, b) asc
    assert list(zip(out["a"], out["b"])) == [("a", "b"), ("b", "c"),
                                             ("a", "c")]
    # top cuts deterministically
    top1 = cooccurrence_pairs(_ds(df, blocks=2), "g", "i", top=1)
    assert list(zip(top1["a"], top1["b"])) == [("a", "b")]
    # oversized group fails loud instead of silently truncating
    big = pd.DataFrame({"g": [1] * 5, "i": list("abcde")})
    with pytest.raises(ValueError, match="max_items"):
        cooccurrence_pairs(_ds(big), "g", "i", max_items=3)


def test_bottomk_sample(ray_session):
    """Exactly k rows, layout-invariant, matches a full md5 sort, and
    duplicate-key ties at the boundary resolve deterministically."""
    import hashlib
    from feature_fabrica_ray.pipelines import bottomk_sample

    df = pd.DataFrame({"k": [str(i) for i in range(50)],
                       "v": np.arange(50.0)})
    want = sorted(df["k"], key=lambda s: hashlib.md5(s.encode()).hexdigest())[:7]
    for blocks in (1, 5):
        out = bottomk_sample(_ds(df, blocks=blocks), "k", k=7, method="md5")
        assert list(out["k"]) == want and len(out) == 7
    # hash64 path: deterministic + exactly-k
    a = bottomk_sample(_ds(df, blocks=1), "k", k=7)
    b = bottomk_sample(_ds(df, blocks=6), "k", k=7)
    pd.testing.assert_frame_equal(a, b)
    # duplicate keys with different payloads: full-row tiebreak
    dup = pd.DataFrame({"k": ["x", "x", "x"], "v": [3.0, 1.0, 2.0]})
    out = bottomk_sample(_ds(dup, blocks=3), "k", k=2, method="md5")
    assert list(out["v"]) == [1.0, 2.0]


def test_snapshot_delta(ray_session):
    """added/removed/changed classification with NULL-safe compare;
    unchanged keys never surface; duplicate keys fail loud."""
    from feature_fabrica_ray.pipelines import snapshot_delta

    a = pd.DataFrame({"k": [1, 2, 3, 4, 5],
                      "v": [10.0, 20.0, None, 40.0, 50.0]})
    b = pd.DataFrame({"k": [2, 3, 4, 5, 6],
                      "v": [20.0, None, 44.0, None, 60.0]})
    out = snapshot_delta(_ds(a, blocks=2), _ds(b, blocks=3),
                         ["k"], ["v"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    got = {int(r.k): r.change_type for r in out.itertuples()}
    # k=1 removed; k=2 unchanged; k=3 NULL==NULL unchanged;
    # k=4 changed; k=5 value->NULL changed; k=6 added
    assert got == {1: "removed", 4: "changed", 5: "changed", 6: "added"}
    r4 = out[out["k"] == 4].iloc[0]
    assert r4["old_v"] == 40.0 and r4["new_v"] == 44.0
    r6 = out[out["k"] == 6].iloc[0]
    assert pd.isna(r6["old_v"]) and r6["new_v"] == 60.0
    # duplicate key in a snapshot violates the CDC contract
    dup = pd.DataFrame({"k": [1, 1], "v": [1.0, 2.0]})
    with pytest.raises(ray.exceptions.RayTaskError,
                       match="duplicate key"):
        snapshot_delta(_ds(dup), _ds(b), ["k"], ["v"]).to_pandas()


def test_list_column_stats(ray_session):
    """Stats match per-list hand math; NULL list -> NULL stats;
    empty list -> dim 0 with NULL stats; chunk-layout invariant."""
    from feature_fabrica_ray.pipelines import list_column_stats

    df = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "v": [[3.0, -1.0, 2.0], [5.0], [], None],
    })
    out = list_column_stats(_ds(df, blocks=2), "v").drop_columns(["v"]) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    r1 = out.iloc[0]
    assert r1["dim"] == 3 and r1["first"] == 3.0 and r1["vsum"] == 4.0
    assert r1["vmin"] == -1.0 and r1["vmax"] == 3.0
    assert r1["l2_norm"] == pytest.approx(np.sqrt(9 + 1 + 4))
    r2 = out.iloc[1]
    assert r2["dim"] == 1 and r2["l2_norm"] == 5.0
    r3 = out.iloc[2]            # empty list: dim 0, NULL aggregates
    assert r3["dim"] == 0 and pd.isna(r3["vsum"]) and pd.isna(r3["first"])
    r4 = out.iloc[3]            # NULL list: everything NULL
    assert pd.isna(r4["dim"]) and pd.isna(r4["l2_norm"])
    # layout invariance
    x = list_column_stats(_ds(df, blocks=1), "v").drop_columns(["v"]) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, x)


def test_zipf_fit(ray_session):
    """Slope/intercept match the closed-form OLS on (ln rank, ln tf)
    with deterministic (tf desc, token) ranking; degenerate inputs
    yield NULL."""
    from feature_fabrica_ray.pipelines import zipf_fit

    # tf: aa=4, bb=2, cc=1 -> ranks 1,2,3
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["aa aa bb", "aa bb cc", "aa"],
    })
    out = zipf_fit(_ds(df, blocks=2), top=10).iloc[0]
    x = np.log(np.array([1.0, 2.0, 3.0]))
    y = np.log(np.array([4.0, 2.0, 1.0]))
    slope = ((x - x.mean()) * (y - y.mean())).sum() / ((x - x.mean()) ** 2).sum()
    inter = y.mean() - slope * x.mean()
    assert out["slope"] == pytest.approx(round(slope, 6), abs=1e-9)
    assert out["intercept"] == pytest.approx(round(inter, 6), abs=1e-9)
    assert out["n_tokens"] == 3
    # single-token corpus: no fit
    one = zipf_fit(_ds(pd.DataFrame({"doc_id": [1], "text": ["x x"]})))
    assert pd.isna(one.iloc[0]["slope"]) and one.iloc[0]["n_tokens"] == 1


def test_random_projection(ray_session):
    """Deterministic across layouts; preserves pairwise distances
    within JL tolerance at out_dim=32 for 64-dim inputs."""
    from feature_fabrica_ray.pipelines import random_projection

    rng = np.random.default_rng(3)
    V = rng.standard_normal((40, 64))
    df = pd.DataFrame({"id": np.arange(40), "v": list(V)})

    def proj(blocks):
        ds = random_projection(_ds(df, blocks=blocks), out_dim=32,
                               vec_col="v")
        out = ds.drop_columns(["v"]).to_pandas() \
            .sort_values("id").reset_index(drop=True)
        return np.stack(out["proj"].to_numpy())

    a, b = proj(1), proj(4)
    assert np.allclose(a, b)                    # layout invariance
    # JL: dist ratios concentrate near 1 (loose tolerance, fixed seed)
    from itertools import combinations
    pairs = list(combinations(range(0, 40, 5), 2))
    orig = np.array([np.linalg.norm(V[i] - V[j]) for i, j in pairs])
    prj = np.array([np.linalg.norm(a[i] - a[j]) for i, j in pairs])
    ratio = prj / orig
    assert 0.6 < ratio.min() and ratio.max() < 1.4
    assert abs(ratio.mean() - 1.0) < 0.15


def test_runs_islands(ray_session):
    """Hand-enumerated runs incl. a NULL-type island; layout
    invariance across block splits."""
    from feature_fabrica_ray.pipelines import runs_islands

    # user 1 ordered by (ts, id): a a b a a a -> a: islands {2,3}, b: {1}
    # user 2: None None x -> None: {2}, x: {1}
    df = pd.DataFrame({
        "uid": [1, 1, 1, 1, 1, 1, 2, 2, 2],
        "ts": pd.to_datetime([1, 2, 3, 4, 5, 6, 1, 2, 3], unit="s"),
        "ty": ["a", "a", "b", "a", "a", "a", None, None, "x"],
        "eid": [1, 2, 3, 4, 5, 6, 7, 8, 9],
    })
    want = pd.DataFrame({
        "uid": [1, 1, 2, 2],
        "ty": ["a", "b", "x", None],
        "n_islands": np.array([2, 1, 1, 1], np.int64),
        "max_run": np.array([3, 1, 1, 2], np.int64),
    })

    def norm(d):
        return d.sort_values(["uid", "ty"], na_position="last",
                             kind="mergesort").reset_index(drop=True)

    for blocks in (1, 3):
        out = runs_islands(_ds(df, blocks=blocks), ts_col="ts",
                           key_col="uid", type_col="ty", order_col="eid")
        pd.testing.assert_frame_equal(norm(out), norm(want))

    # tie on ts broken by order_col: b(eid=2) between a(1) and a(3)
    tie = pd.DataFrame({
        "uid": [9, 9, 9],
        "ts": pd.to_datetime([1, 1, 1], unit="s"),
        "ty": ["a", "b", "a"], "eid": [3, 2, 1],
    })
    out = runs_islands(_ds(tie), ts_col="ts", key_col="uid",
                       type_col="ty", order_col="eid")
    assert out.loc[out["ty"] == "a", "n_islands"].iloc[0] == 2


def test_hashed_vectorizer(ray_session):
    """Buckets match hashlib.md5 hex digit, counts are exact per doc,
    empty/whitespace docs emit no rows, layout invariance."""
    import hashlib

    from feature_fabrica_ray.pipelines import hashed_vectorizer

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["foo bar foo", "baz", "", "   "],
    })

    def norm(d):
        return d.sort_values(["doc_id", "bucket"]).reset_index(drop=True)

    outs = [norm(hashed_vectorizer(_ds(df, blocks=b)).to_pandas())
            for b in (1, 4)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    assert set(out["doc_id"]) == {1, 2}          # empty docs: no rows
    b = lambda t: hashlib.md5(t.encode()).hexdigest()[0]
    want = {}
    for tok, n in (("foo", 2), ("bar", 1)):
        want[(1, b(tok))] = want.get((1, b(tok)), 0) + n
    want[(2, b("baz"))] = 1
    got = {(r.doc_id, r.bucket): r.n for r in out.itertuples()}
    assert got == want


def test_gini_coefficient(ray_session):
    """Matches the closed-form rank formula on hand data; tie- and
    layout-invariant; perfect equality -> ~0; degenerate -> NULL."""
    from feature_fabrica_ray.pipelines import gini_coefficient

    vals = [1.0, 1.0, 2.0, 4.0, 8.0]
    df = pd.DataFrame({"x": vals})
    xs = np.sort(np.array(vals))
    n, s = len(xs), xs.sum()
    want = 2 * (np.arange(1, n + 1) * xs).sum() / (n * s) - (n + 1) / n
    for blocks in (1, 3):
        out = gini_coefficient(_ds(df, blocks=blocks), "x")
        assert out["gini"].iloc[0] == pytest.approx(want)
        assert out["n"].iloc[0] == 5
    eq = gini_coefficient(_ds(pd.DataFrame({"x": [3.0] * 7})), "x")
    assert eq["gini"].iloc[0] == pytest.approx(0.0)
    # all-null -> n=0, NULL gini
    nul = gini_coefficient(
        _ds(pd.DataFrame({"x": pd.Series([None, None], dtype="float64")})),
        "x")
    assert pd.isna(nul["gini"].iloc[0]) and nul["n"].iloc[0] == 0


def test_weighted_median_per_group(ray_session):
    """Lower weighted median: smallest v whose cumulative weight
    reaches half the total; null rows excluded; layout-invariant."""
    from feature_fabrica_ray.pipelines import weighted_median_per_group

    # group a: (v=1,w=1),(v=2,w=1),(v=3,w=2) tot=4, half=2 -> cum at
    # v=2 is 2 >= 2 -> median 2.   group b: (v=10,w=9),(v=20,w=1)
    # tot=10, half=5 -> v=10. nulls dropped.
    df = pd.DataFrame({
        "g": ["a", "a", "a", "b", "b", "b", "b"],
        "v": [1.0, 2.0, 3.0, 10.0, 20.0, None, 5.0],
        "w": [1.0, 1.0, 2.0, 9.0, 1.0, 4.0, None],
    })
    for blocks in (1, 4):
        out = weighted_median_per_group(_ds(df, blocks=blocks),
                                        "g", "v", "w")
        assert list(out["g"]) == ["a", "b"]
        assert list(out["wmedian"]) == [2.0, 10.0]
        assert list(out["total_w"]) == [4.0, 10.0]
        assert list(out["n"]) == [3, 2]


def test_time_weighted_avg(ray_session):
    """Hand-integrated step function; null value drops its term but
    not its interval; single event and zero duration -> NULL."""
    from feature_fabrica_ray.pipelines import time_weighted_avg

    # user 1: v=10 for 2s, v=20 for 1s, last v ignored
    #         twap = (10*2 + 20*1)/3 = 40/3
    # user 2: v=None for 1s then v=5 (last) -> no valid term -> NULL,
    #         duration 1s
    # user 3: single event -> NULL, duration 0
    df = pd.DataFrame({
        "uid": [1, 1, 1, 2, 2, 3],
        "ts": pd.to_datetime([0, 2, 3, 0, 1, 5], unit="s"),
        "v": [10.0, 20.0, 99.0, None, 5.0, 7.0],
        "eid": [1, 2, 3, 4, 5, 6],
    })
    for blocks in (1, 3):
        out = time_weighted_avg(_ds(df, blocks=blocks), ts_col="ts",
                                key_col="uid", value_col="v",
                                order_col="eid")
        assert list(out["uid"]) == [1, 2, 3]
        assert out["twap"].iloc[0] == pytest.approx(40.0 / 3.0)
        assert pd.isna(out["twap"].iloc[1])
        assert pd.isna(out["twap"].iloc[2])
        assert list(out["duration_s"]) == [3.0, 1.0, 0.0]
        assert list(out["n_events"]) == [3, 2, 1]


def test_grouped_log_means(ray_session):
    """Matches scipy-free closed forms on hand data; nonpositive and
    NULL values excluded; all-nonpositive group never surfaces."""
    from feature_fabrica_ray.pipelines import grouped_log_means

    df = pd.DataFrame({
        "g": ["a", "a", "a", "b", "b", "c", "c"],
        "x": [1.0, 4.0, 16.0, 2.0, None, -1.0, 0.0],
    })
    for blocks in (1, 3):
        out = grouped_log_means(_ds(df, blocks=blocks), "g", "x")
        assert list(out["g"]) == ["a", "b"]          # c: no positive x
        assert out["geomean"].iloc[0] == pytest.approx(4.0)   # (1*4*16)^(1/3)
        assert out["harmmean"].iloc[0] == pytest.approx(
            3 / (1 + 0.25 + 1 / 16))
        assert out["geomean"].iloc[1] == pytest.approx(2.0)
        assert out["harmmean"].iloc[1] == pytest.approx(2.0)
        assert list(out["n"]) == [3, 1]


def test_forward_fill(ray_session):
    """LOCF per key: leading NULLs stay NULL, fills carry across
    multiple gaps, layout-invariant, row count preserved."""
    from feature_fabrica_ray.pipelines import forward_fill

    df = pd.DataFrame({
        "uid": [1, 1, 1, 1, 2, 2],
        "ts": pd.to_datetime([1, 2, 3, 4, 1, 2], unit="s"),
        "v": [None, 7.0, None, None, None, 3.0],
        "eid": [1, 2, 3, 4, 5, 6],
    })
    for blocks in (1, 3):
        out = forward_fill(_ds(df, blocks=blocks), ts_col="ts",
                           key_col="uid", value_col="v",
                           order_col="eid").to_pandas() \
            .sort_values("eid").reset_index(drop=True)
        assert len(out) == 6
        got = out["filled"].tolist()
        assert pd.isna(got[0]) and pd.isna(got[4])   # leading NULLs
        assert got[1:4] == [7.0, 7.0, 7.0]
        assert got[5] == 3.0


def test_group_mad(ray_session):
    """Interpolated median + MAD match numpy on expanded multisets;
    layout-invariant; NULLs excluded."""
    from feature_fabrica_ray.pipelines import group_mad

    rng = np.random.default_rng(5)
    a = rng.integers(0, 20, 31).astype(float)
    b = rng.normal(100, 15, 10).round(1)
    df = pd.DataFrame({"g": ["a"] * 31 + ["b"] * 10 + ["a"],
                       "x": np.concatenate([a, b, [np.nan]])})

    def ref(x):
        med = np.quantile(x, 0.5)
        return med, np.quantile(np.abs(x - med), 0.5)

    for blocks in (1, 4):
        out = group_mad(_ds(df, blocks=blocks), "g", "x")
        assert list(out["g"]) == ["a", "b"]
        for i, x in enumerate((a, b)):
            med, mad = ref(x)
            assert out["med"].iloc[i] == pytest.approx(round(med, 6))
            assert out["mad"].iloc[i] == pytest.approx(round(mad, 6))
        assert list(out["n"]) == [31, 10]


def test_group_trimmed_mean(ray_session):
    """Interior mean matches numpy sort-and-slice; tie-heavy input;
    trim that empties the interior yields NULL; bad trim fails loud."""
    from feature_fabrica_ray.pipelines import group_trimmed_mean

    x = np.array([1, 1, 1, 2, 2, 3, 4, 5, 100, 100], dtype=float)
    df = pd.DataFrame({"g": ["a"] * 10, "x": x})
    k = int(np.floor(10 * 0.2))
    want = np.sort(x)[k:10 - k].mean()
    for blocks in (1, 3):
        out = group_trimmed_mean(_ds(df, blocks=blocks), "g", "x",
                                 trim=0.2)
        assert out["tmean"].iloc[0] == pytest.approx(round(want, 6))
        assert out["n"].iloc[0] == 10 and out["n_used"].iloc[0] == 6
    # n=1 with trim=0.4 -> k=0 -> interior is the point itself
    one = group_trimmed_mean(
        _ds(pd.DataFrame({"g": ["z"], "x": [7.0]})), "g", "x", trim=0.4)
    assert one["tmean"].iloc[0] == 7.0 and one["n_used"].iloc[0] == 1
    with pytest.raises(ValueError, match="trim"):
        group_trimmed_mean(_ds(df), "g", "x", trim=0.5)


def test_skyline_2d(ray_session):
    """Matches brute-force dominance on random data across layouts;
    exact (p,s) duplicates both survive; NULL objectives excluded."""
    from feature_fabrica_ray.pipelines import skyline_2d

    rng = np.random.default_rng(9)
    n = 200
    df = pd.DataFrame({"id": np.arange(n),
                       "p": rng.integers(0, 50, n).astype(float),
                       "s": rng.integers(0, 50, n).astype(float)})
    # plant an exact duplicate pair guaranteed on the frontier
    df.loc[0, ["p", "s"]] = [-1.0, 100.0]
    df.loc[1, ["p", "s"]] = [-1.0, 100.0]

    p, s = df["p"].to_numpy(), df["s"].to_numpy()
    dominated = np.array([
        bool(np.any((p <= p[i]) & (s >= s[i]) & ((p < p[i]) | (s > s[i]))))
        for i in range(n)])
    want = set(df["id"][~dominated])

    for blocks in (1, 5):
        out = skyline_2d(_ds(df, blocks=blocks), "id", "p", "s")
        assert set(out["id"]) == want
    assert {0, 1} <= want                     # both duplicates survive

    # NULL objective rows are excluded
    withnull = pd.concat([df, pd.DataFrame(
        {"id": [900], "p": [np.nan], "s": [1e9]})], ignore_index=True)
    out = skyline_2d(_ds(withnull), "id", "p", "s")
    assert 900 not in set(out["id"])
    with pytest.raises(ValueError, match="max_skyline"):
        skyline_2d(_ds(df), "id", "p", "s", max_skyline=1)


def test_interpolate_missing(ray_session):
    """Interior gaps take the time-weighted blend; leading/trailing
    NULLs stay NULL; layout-invariant; non-null rows pass through."""
    from feature_fabrica_ray.pipelines import interpolate_missing

    # u1 at t=0,10,40: v=None,2,8 -> lead stays None
    #    t=20,30 holes between (10,2) and (40,8): 2+6*(10/30)=4, 2+6*(20/30)=6
    df = pd.DataFrame({
        "uid": [1, 1, 1, 1, 1, 2],
        "ts": pd.to_datetime([0, 10, 20, 30, 40, 0], unit="s"),
        "v": [None, 2.0, None, None, 8.0, None],
        "eid": [1, 2, 3, 4, 5, 6],
    })
    for blocks in (1, 3):
        out = interpolate_missing(_ds(df, blocks=blocks), ts_col="ts",
                                  key_col="uid", value_col="v",
                                  order_col="eid").to_pandas() \
            .sort_values("eid").reset_index(drop=True)
        got = out["filled"].tolist()
        assert pd.isna(got[0]) and pd.isna(got[5])
        assert got[1] == 2.0 and got[4] == 8.0
        assert got[2] == pytest.approx(4.0)
        assert got[3] == pytest.approx(6.0)


def test_theil_index_per_group(ray_session):
    """Matches the definitional Σ(x/μ)ln(x/μ)/n on hand data; equality
    -> 0; nonpositive and NULL excluded; layout-invariant."""
    from feature_fabrica_ray.pipelines import theil_index_per_group

    x = np.array([1.0, 2.0, 3.0, 10.0])
    mu = x.mean()
    want = float(((x / mu) * np.log(x / mu)).sum() / len(x))
    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 3 + ["c"],
                       "x": list(x) + [5.0, 5.0, None] + [-2.0]})
    for blocks in (1, 3):
        out = theil_index_per_group(_ds(df, blocks=blocks), "g", "x")
        assert list(out["g"]) == ["a", "b"]       # c: no positive x
        assert out["theil"].iloc[0] == pytest.approx(want)
        assert out["theil"].iloc[1] == pytest.approx(0.0, abs=1e-12)
        assert list(out["n"]) == [4, 2]


def test_autocorr_per_key(ray_session):
    """Matches np.corrcoef of the lagged pairs; constant series ->
    NULL (zero variance); <2 pairs -> NULL; layout-invariant."""
    from feature_fabrica_ray.pipelines import autocorr_per_key

    rng = np.random.default_rng(2)
    v = np.cumsum(rng.normal(size=30))            # trending: acf1 high
    want = float(np.corrcoef(v[:-1], v[1:])[0, 1])
    df = pd.DataFrame({
        "uid": [1] * 30 + [2] * 5 + [3] * 2,
        "ts": pd.to_datetime(list(range(30)) + list(range(5))
                             + list(range(2)), unit="s"),
        "v": list(v) + [7.0] * 5 + [1.0, 2.0],
        "eid": range(37),
    })
    for blocks in (1, 4):
        out = autocorr_per_key(_ds(df, blocks=blocks), ts_col="ts",
                               key_col="uid", value_col="v",
                               order_col="eid")
        assert list(out["uid"]) == [1, 2, 3]
        assert out["acf1"].iloc[0] == pytest.approx(want)
        assert pd.isna(out["acf1"].iloc[1])       # constant series
        assert pd.isna(out["acf1"].iloc[2])       # one pair only
        assert list(out["n_pairs"]) == [29, 4, 1]


def test_lorenz_deciles(ray_session):
    """Matches sort-and-cumsum on hand data; equal values -> straight
    line; tie boundary is permutation-invariant; layout-invariant."""
    from feature_fabrica_ray.pipelines import lorenz_deciles

    rng = np.random.default_rng(7)
    x = rng.pareto(1.5, size=100) + 0.1
    df = pd.DataFrame({"x": x})
    xs = np.sort(x)
    want = [xs[:int(np.floor(100 * d / 10))].sum() / xs.sum()
            for d in range(1, 11)]
    for blocks in (1, 4):
        out = lorenz_deciles(_ds(df, blocks=blocks), "x")
        assert list(out["decile"]) == list(range(1, 11))
        assert out["cum_share"].to_numpy() == pytest.approx(want)
        assert out["cum_share"].iloc[9] == pytest.approx(1.0)
        assert out["k"].iloc[4] == 50
    # perfect equality: shares are exactly d/10 even with ties at
    # every boundary
    eq = lorenz_deciles(_ds(pd.DataFrame({"x": [2.0] * 40})), "x")
    assert eq["cum_share"].to_numpy() == pytest.approx(
        np.arange(1, 11) / 10.0)


def test_corr_matrix(ray_session):
    """Matches np.corrcoef listwise-complete; NULL row dropped for all
    pairs; zero-variance column -> NULL; layout-invariant."""
    from feature_fabrica_ray.pipelines import corr_matrix

    rng = np.random.default_rng(4)
    a = rng.normal(size=50)
    b = 2 * a + rng.normal(scale=0.5, size=50)
    c = rng.normal(size=50)
    df = pd.DataFrame({"a": a, "b": b, "c": c, "z": 1.0})
    df.loc[3, "b"] = np.nan                      # drops row 3 everywhere
    keep = df.dropna()
    R = np.corrcoef(np.stack([keep["a"], keep["b"], keep["c"]]))
    for blocks in (1, 4):
        out = corr_matrix(_ds(df, blocks=blocks), ["a", "b", "c", "z"])
        assert len(out) == 6 and out["n"].iloc[0] == 49
        got = {(r.col_a, r.col_b): r.corr for r in out.itertuples()}
        assert got[("a", "b")] == pytest.approx(R[0, 1])
        assert got[("a", "c")] == pytest.approx(R[0, 2])
        assert got[("b", "c")] == pytest.approx(R[1, 2])
        assert all(pd.isna(got[(x, "z")]) for x in ("a", "b", "c"))
    with pytest.raises(ValueError, match=">= 2"):
        corr_matrix(_ds(df), ["a"])


def test_asof_join_nearest(ray_session):
    """Nearest mode: picks either side by |Δt|, exact tie -> earlier
    right row, tolerance prunes far matches; layout-invariant."""
    from feature_fabrica_ray.pipelines import asof_join

    left = pd.DataFrame({
        "lid": [1, 2, 3, 4],
        "ts": pd.to_datetime([10, 15, 100, 3], unit="s"),
        "k": [1, 1, 1, 2],
    })
    right = pd.DataFrame({
        "k": [1, 1, 1, 2],
        "ts": pd.to_datetime([8, 20, 110, 50], unit="s"),
        "val": [80.0, 200.0, 1100.0, 500.0],
    })
    # lid1 t=10: |10-8|=2 < |20-10|=10 -> 80
    # lid2 t=15: |15-8|=7 vs |20-15|=5 -> 200
    # lid3 t=100: |100-20|=80 vs |110-100|=10 -> 1100
    # lid4 t=3 (k=2): only forward 50s away -> 500
    for blocks in (1, 3):
        out = asof_join(_ds(left, blocks=blocks), _ds(right, blocks=blocks),
                        on="ts", by="k", right_cols=["val"],
                        direction="nearest").to_pandas() \
            .sort_values("lid").reset_index(drop=True)
        assert out["val"].tolist() == [80.0, 200.0, 1100.0, 500.0]
    # exact tie: left t=14 sits 6s from both 8 and 20 -> earlier (80)
    tie = pd.DataFrame({"lid": [9], "ts": pd.to_datetime([14], unit="s"),
                        "k": [1]})
    out = asof_join(_ds(tie), _ds(right), on="ts", by="k",
                    right_cols=["val"], direction="nearest").to_pandas()
    assert out["val"].iloc[0] == 80.0
    # tolerance: lid4's only match is 47s away -> pruned under 10s
    out = asof_join(_ds(left), _ds(right), on="ts", by="k",
                    right_cols=["val"], direction="nearest",
                    tolerance_us=10_000_000).to_pandas() \
        .sort_values("lid").reset_index(drop=True)
    assert out["val"].tolist()[:3] == [80.0, 200.0, 1100.0]
    assert pd.isna(out["val"].iloc[3])


def test_ks_two_sample(ray_session):
    """Matches scipy-free reference sup|CDF_a - CDF_b|; identical
    distributions -> 0; empty segment -> NULL; layout-invariant."""
    from feature_fabrica_ray.pipelines import ks_two_sample

    rng = np.random.default_rng(6)
    xa = rng.normal(0, 1, 80).round(2)
    xb = rng.normal(0.7, 1, 60).round(2)
    df = pd.DataFrame({"g": ["a"] * 80 + ["b"] * 60 + ["z"] * 5,
                       "x": np.concatenate([xa, xb, np.zeros(5)])})

    grid = np.unique(np.concatenate([xa, xb]))
    want = np.max(np.abs(
        np.searchsorted(np.sort(xa), grid, side="right") / len(xa)
        - np.searchsorted(np.sort(xb), grid, side="right") / len(xb)))
    for blocks in (1, 4):
        out = ks_two_sample(_ds(df, blocks=blocks), "g", "x", "a", "b")
        assert out["ks"].iloc[0] == pytest.approx(want)
        assert out["n_a"].iloc[0] == 80 and out["n_b"].iloc[0] == 60
    same = ks_two_sample(
        _ds(pd.DataFrame({"g": ["a"] * 20 + ["b"] * 20,
                          "x": list(range(20)) * 2})),
        "g", "x", "a", "b")
    assert same["ks"].iloc[0] == pytest.approx(0.0)
    missing = ks_two_sample(_ds(df), "g", "x", "a", "nope")
    assert pd.isna(missing["ks"].iloc[0]) and missing["n_b"].iloc[0] == 0


def test_pagerank_vs_power_iteration(ray_session):
    """Distributed PageRank matches an exact dense power iteration with
    the same damping/dangling formulation (1e-12), ranks sum to 1, a
    hub out-ranks leaves on a star graph, and layout doesn't matter."""
    import numpy as np
    import pandas as pd
    from feature_fabrica_ray.pipelines import pagerank

    rng = np.random.default_rng(11)
    n = 12
    src = rng.integers(0, n, 60)
    dst = rng.integers(0, n, 60)
    keep = src != dst
    edges = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
    edges.loc[len(edges)] = [10, 11]   # ensure node 11 exists
    # node 9 dangling: remove its out-edges
    edges = edges[edges["src"] != 9].reset_index(drop=True)

    got = pagerank(_ds(edges, blocks=3), "src", "dst",
                   damping=0.85, iters=30)
    # exact dense reference with identical semantics
    nodes = np.sort(np.unique(np.concatenate([edges["src"], edges["dst"]])))
    m = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((m, m))
    for s, d in edges.itertuples(index=False):
        A[idx[s], idx[d]] += 1.0
    outdeg = A.sum(axis=1)
    r = np.full(m, 1.0 / m)
    for _ in range(30):
        share = np.divide(r, outdeg, out=np.zeros(m), where=outdeg > 0)
        inflow = share @ A
        r = (1 - 0.85) / m + 0.85 * (inflow + r[outdeg == 0].sum() / m)
    assert np.allclose(got["rank"].to_numpy(), r, atol=1e-12)
    assert abs(got["rank"].sum() - 1.0) < 1e-9
    one = pagerank(_ds(edges, blocks=1), "src", "dst",
                   damping=0.85, iters=30)
    pd.testing.assert_frame_equal(one, got)

    star = pd.DataFrame({"src": [1, 2, 3, 4] * 2, "dst": [0] * 8})
    sr = pagerank(_ds(star, blocks=2), "src", "dst", iters=20)
    ranks = dict(zip(sr["node"], sr["rank"]))
    assert ranks[0] > ranks[1] * 3

    # the size-dispatched small-graph fast path and the streaming
    # combiner path are the SAME algorithm: force the distributed path
    # with a 1-byte threshold and require bitwise-close agreement
    import os
    os.environ["FFR_LOCAL_GRAPH_BYTES"] = "1"
    try:
        dist = pagerank(_ds(edges, blocks=3), "src", "dst",
                        damping=0.85, iters=30)
    finally:
        del os.environ["FFR_LOCAL_GRAPH_BYTES"]
    assert np.allclose(dist["rank"].to_numpy(), got["rank"].to_numpy(),
                       atol=1e-12)
    assert (dist["node"].to_numpy() == got["node"].to_numpy()).all()

    # past max_nodes the sharded rank-exchange path dispatches instead
    # of raising, and it is the same algorithm: distributed (node,
    # outdeg, rank) state, bitwise-close agreement with the dense
    # reference
    os.environ["FFR_LOCAL_GRAPH_BYTES"] = "1"
    try:
        sharded = pagerank(_ds(edges, blocks=3), "src", "dst",
                           damping=0.85, iters=30, max_nodes=1)
    finally:
        del os.environ["FFR_LOCAL_GRAPH_BYTES"]
    assert np.allclose(sharded["rank"].to_numpy(), got["rank"].to_numpy(),
                       atol=1e-12)
    assert (sharded["node"].to_numpy() == got["node"].to_numpy()).all()
    assert abs(sharded["rank"].sum() - 1.0) < 1e-9


def test_weighted_pagerank(ray_session):
    """Edge-weighted PageRank matches a dense weighted power iteration
    (1e-12) on all three paths; null weights drop rows; fractional
    total out-weights are NOT clamped (the 0<deg<1 regression guard);
    weight-1 equals the unweighted form bitwise."""
    import os

    import numpy as np
    import pandas as pd
    from feature_fabrica_ray.pipelines import pagerank

    rng = np.random.default_rng(17)
    src = rng.integers(0, 10, 50)
    dst = rng.integers(0, 10, 50)
    keep = src != dst
    w = rng.uniform(0.05, 0.4, keep.sum())   # fractional out-degrees
    edges = pd.DataFrame({"src": src[keep], "dst": dst[keep], "w": w})
    edges.loc[3, "w"] = np.nan               # dropped row

    got = pagerank(_ds(edges, blocks=3), "src", "dst", damping=0.85,
                   iters=25, weight_col="w")

    ok = edges.dropna(subset=["w"])
    nodes = np.sort(np.unique(np.concatenate([ok["src"], ok["dst"]])))
    m = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((m, m))
    for s, d, wt in ok.itertuples(index=False):
        A[idx[s], idx[d]] += wt
    outdeg = A.sum(axis=1)
    r = np.full(m, 1.0 / m)
    for _ in range(25):
        share = np.divide(r, outdeg, out=np.zeros(m), where=outdeg > 0)
        inflow = share @ A
        r = 0.15 / m + 0.85 * (inflow + r[outdeg == 0].sum() / m)
    assert np.allclose(got["rank"].to_numpy(), r, atol=1e-12)
    assert abs(got["rank"].sum() - 1.0) < 1e-9

    os.environ["FFR_LOCAL_GRAPH_BYTES"] = "1"
    try:
        dist = pagerank(_ds(edges, blocks=3), "src", "dst",
                        damping=0.85, iters=25, weight_col="w")
        sharded = pagerank(_ds(edges, blocks=3), "src", "dst",
                           damping=0.85, iters=25, weight_col="w",
                           max_nodes=1)
    finally:
        del os.environ["FFR_LOCAL_GRAPH_BYTES"]
    assert np.allclose(dist["rank"].to_numpy(), r, atol=1e-12)
    assert np.allclose(sharded["rank"].to_numpy(), r, atol=1e-12)

    ones = edges.dropna(subset=["w"]).assign(w=1.0)
    wa = pagerank(_ds(ones, blocks=2), "src", "dst", iters=15,
                  weight_col="w")
    ua = pagerank(_ds(ones[["src", "dst"]], blocks=2), "src", "dst",
                  iters=15)
    assert np.allclose(wa["rank"].to_numpy(), ua["rank"].to_numpy(),
                       atol=1e-15)


def test_personalized_pagerank(ray_session):
    """Personalized PageRank matches an exact dense random-walk-with-
    restart (1e-12) on all three paths (local / streaming / sharded),
    ranks sum to 1, mass concentrates near the seeds, absent seed ids
    are ignored, and an all-absent seed set raises."""
    import os

    import numpy as np
    import pandas as pd
    import pytest
    from feature_fabrica_ray.pipelines import personalized_pagerank

    rng = np.random.default_rng(7)
    n = 14
    src = rng.integers(0, n, 80)
    dst = rng.integers(0, n, 80)
    keep = src != dst
    edges = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
    edges = edges[edges["src"] != 5].reset_index(drop=True)  # 5 dangling
    seeds = [0, 3, 999]  # 999 absent: ignored

    got = personalized_pagerank(_ds(edges, blocks=3), seeds,
                                "src", "dst", damping=0.85, iters=30)

    nodes = np.sort(np.unique(np.concatenate([edges["src"], edges["dst"]])))
    m = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((m, m))
    for s, d in edges.itertuples(index=False):
        A[idx[s], idx[d]] += 1.0
    outdeg = A.sum(axis=1)
    p = np.zeros(m)
    present = [s for s in seeds if s in idx]
    for s in present:
        p[idx[s]] = 1.0 / len(present)
    r = p.copy()
    for _ in range(30):
        share = np.divide(r, outdeg, out=np.zeros(m), where=outdeg > 0)
        inflow = share @ A
        r = (1 - 0.85) * p + 0.85 * (inflow + r[outdeg == 0].sum() * p)
    assert np.allclose(got["rank"].to_numpy(), r, atol=1e-12)
    assert abs(got["rank"].sum() - 1.0) < 1e-9
    ranks = dict(zip(got["node"], got["rank"]))
    assert ranks[0] > 1.0 / m  # seed holds more than uniform mass

    # streaming and sharded paths are the same algorithm
    os.environ["FFR_LOCAL_GRAPH_BYTES"] = "1"
    try:
        dist = personalized_pagerank(_ds(edges, blocks=3), seeds,
                                     "src", "dst", damping=0.85, iters=30)
        sharded = personalized_pagerank(_ds(edges, blocks=3), seeds,
                                        "src", "dst", damping=0.85,
                                        iters=30, max_nodes=1)
    finally:
        del os.environ["FFR_LOCAL_GRAPH_BYTES"]
    assert np.allclose(dist["rank"].to_numpy(), r, atol=1e-12)
    assert np.allclose(sharded["rank"].to_numpy(), r, atol=1e-12)
    assert (sharded["node"].to_numpy() == got["node"].to_numpy()).all()

    with pytest.raises(ValueError, match="no seed id"):
        personalized_pagerank(_ds(edges, blocks=2), [777], "src", "dst")


def test_adamic_adar(ray_session):
    """adamic_adar matches a brute-force common-neighbor reference to
    1e-12 (uncapped), the degree cap skips exactly the over-cap
    centers, output pairs are non-edges only with n1 < n2, and the
    empty graph yields an empty typed result."""
    import numpy as np
    import pandas as pd
    from feature_fabrica_ray.pipelines import adamic_adar

    rng = np.random.default_rng(13)
    src = rng.integers(0, 20, 70)
    dst = rng.integers(0, 20, 70)
    keep = src != dst
    edges = pd.DataFrame({"a": src[keep], "b": dst[keep]})

    def brute(cap):
        es = set()
        adj: dict[int, set[int]] = {}
        for a, b in edges.itertuples(index=False):
            lo, hi = (int(min(a, b)), int(max(a, b)))
            es.add((lo, hi))
            adj.setdefault(lo, set()).add(hi)
            adj.setdefault(hi, set()).add(lo)
        scores: dict[tuple, float] = {}
        for c, ns in adj.items():
            d = len(ns)
            if d < 2 or (cap is not None and d > cap):
                continue
            ns = sorted(ns)
            for i in range(len(ns)):
                for j in range(i + 1, len(ns)):
                    k = (ns[i], ns[j])
                    scores[k] = scores.get(k, 0.0) + 1.0 / np.log(d)
        return {k: v for k, v in scores.items() if k not in es}

    for cap in (None, 5):
        got = adamic_adar(_ds(edges, blocks=3), "a", "b",
                          max_center_degree=cap).to_pandas()
        exp = brute(cap)
        assert len(got) == len(exp)
        assert (got["n1"] < got["n2"]).all()
        for n1, n2, aa in got[["n1", "n2", "aa"]].itertuples(index=False):
            assert abs(exp[(int(n1), int(n2))] - aa) < 1e-12

    empty = adamic_adar(_ds(pd.DataFrame({"a": [1], "b": [1]})),
                        "a", "b").to_pandas()
    assert len(empty) == 0   # self-loop-only graph: no pairs


def test_hits_vs_dense_power_iteration(ray_session):
    """HITS matches a dense AᵀA/AAᵀ power iteration with identical
    normalization order (1e-12); on a bipartite star the hub and the
    authority separate; local / streaming / sharded paths agree."""
    import os

    import numpy as np
    import pandas as pd
    from feature_fabrica_ray.pipelines import hits

    rng = np.random.default_rng(23)
    n = 10
    src = rng.integers(0, n, 50)
    dst = rng.integers(0, n, 50)
    keep = src != dst
    edges = pd.DataFrame({"src": src[keep], "dst": dst[keep]})

    got = hits(_ds(edges, blocks=3), "src", "dst", iters=12)
    nodes = np.sort(np.unique(np.concatenate([edges["src"],
                                              edges["dst"]])))
    m = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((m, m))
    for s, d in edges.itertuples(index=False):
        A[idx[s], idx[d]] += 1.0
    h = np.ones(m)
    for _ in range(12):
        a = A.T @ h
        a /= np.sqrt((a * a).sum())
        h = A @ a
        h /= np.sqrt((h * h).sum())
    assert np.allclose(got["authority"].to_numpy(), a, atol=1e-12)
    assert np.allclose(got["hub"].to_numpy(), h, atol=1e-12)

    # bipartite star: 1..4 all point at 0 -> node 0 is the sole
    # authority (a=1, h=0), the pointers are pure hubs (a=0)
    star = pd.DataFrame({"src": [1, 2, 3, 4] * 2, "dst": [0] * 8})
    sr = hits(_ds(star, blocks=2), "src", "dst", iters=5)
    byn = sr.set_index("node")
    assert abs(byn.loc[0, "authority"] - 1.0) < 1e-12
    assert byn.loc[0, "hub"] == 0.0
    assert all(byn.loc[i, "authority"] == 0.0 for i in range(1, 5))
    assert all(byn.loc[i, "hub"] > 0.4 for i in range(1, 5))

    # streaming combiner path == local path
    os.environ["FFR_LOCAL_GRAPH_BYTES"] = "1"
    try:
        dist = hits(_ds(edges, blocks=3), "src", "dst", iters=12)
        sharded = hits(_ds(edges, blocks=3), "src", "dst", iters=12,
                       max_nodes=1)
    finally:
        del os.environ["FFR_LOCAL_GRAPH_BYTES"]
    for other in (dist, sharded):
        assert (other["node"].to_numpy() == got["node"].to_numpy()).all()
        assert np.allclose(other["authority"].to_numpy(),
                           got["authority"].to_numpy(), atol=1e-12)
        assert np.allclose(other["hub"].to_numpy(),
                           got["hub"].to_numpy(), atol=1e-12)


def test_histogram2d_fixed(ray_session):
    """2-D fixed-grid histogram matches np.histogram2d-style hand
    counts: clamping at both grid edges, NULL rows dropped, empty
    cells absent, layout invariant."""
    import numpy as np
    import pandas as pd
    from feature_fabrica_ray.pipelines import histogram2d_fixed

    df = pd.DataFrame({
        "x": [0.0, 1.5, 2.5, 9.9, -5.0, 4.0, None, 3.0],
        "y": [0.0, 0.5, 3.5, 9.9, 20.0, 1.0, 1.0, None],
    })
    # grid: lo=0 width=2 bins=3 on both axes (cells clamp to [0,2])
    out = histogram2d_fixed(_ds(df, blocks=3), "x", "y",
                            0.0, 2.0, 3, 0.0, 2.0, 3)
    got = {(r.bx, r.by): r.n for r in out.itertuples()}
    # (0,0):x=0/y=0 + x=1.5/y=0.5 -> 2 ; (1,1):x=2.5,y=3.5 ; (2,2):9.9,9.9
    # (-5,20)->clamp(0,2) ; (4,1)->(2,0)
    assert got == {(0, 0): 2, (1, 1): 1, (2, 2): 1, (0, 2): 1, (2, 0): 1}
    one = histogram2d_fixed(_ds(df, blocks=1), "x", "y",
                            0.0, 2.0, 3, 0.0, 2.0, 3)
    pd.testing.assert_frame_equal(one, out)


def test_ngram_overlap_pairs(ray_session):
    """Exact n-gram overlap: planted verbatim windows are found with
    the right distinct-window count, repeated windows inside one doc
    count once, non-overlapping docs are absent, the per-gram cap
    suppresses boilerplate, and layout doesn't matter."""
    from feature_fabrica_ray.pipelines import ngram_overlap_pairs

    shared = "a b c d"                  # one shared 4-gram
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [f"x y {shared} z w",
                 f"p {shared} q {shared} r",   # window repeated in-doc
                 "totally different words here now",
                 f"{shared} tail1 tail2"],
    })
    for blocks in (1, 3):
        out = ngram_overlap_pairs(_ds(docs, blocks=blocks), "text",
                                  "doc_id", n=4).to_pandas() \
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)
        got = {(r.id_a, r.id_b): r.n_shared for r in out.itertuples()}
        # docs 1,2,4 share "a b c d"; no other 4-gram repeats across docs
        assert got == {(1, 2): 1, (1, 4): 1, (2, 4): 1}
    # cap: the shared gram touches 3 docs -> cap 2 suppresses it
    capped = ngram_overlap_pairs(_ds(docs, blocks=2), "text", "doc_id",
                                 n=4, max_docs_per_gram=2).to_pandas()
    assert len(capped) == 0


def _brute_graph(edges):
    """Adjacency sets of the undirected simple graph (self-loops dropped)."""
    adj: dict[int, set] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def test_triangle_count_vs_brute(ray_session):
    """Two-join triangle enumeration matches the brute-force per-node
    counts on a random multigraph with a planted 5-clique, duplicate /
    reversed edges and self-loops."""
    from feature_fabrica_ray.pipelines import triangle_count

    rng = np.random.default_rng(7)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 30, (120, 2))]
    edges += [(i, i) for i in range(5)]                   # self-loops
    edges += [(b, a) for a, b in edges[:20]]              # reversed dups
    clique = [100, 101, 102, 103, 104]
    edges += [(u, v) for i, u in enumerate(clique)
              for v in clique[i + 1:]]
    adj = _brute_graph(edges)
    want: dict[int, int] = {}
    for u, nbrs in adj.items():
        cnt = 0
        for v in nbrs:
            for w in nbrs:
                if v < w and w in adj[v]:
                    cnt += 1
        if cnt:
            want[u] = cnt

    df = pd.DataFrame(edges, columns=["a", "b"])
    got = triangle_count(_ds(df, blocks=3), "a", "b")
    got_map = dict(zip(got["node"].astype(int), got["tri_cnt"].astype(int)))
    assert got_map == want
    # each clique node sits in C(4,2) = 6 triangles of the clique
    for u in clique:
        assert got_map[u] >= 6


def test_edge_jaccard_vs_brute(ray_session):
    """Per-edge neighborhood Jaccard (triangle identity) matches the
    brute-force |N(u) & N(v)| / |N(u) | N(v)| on a random graph."""
    from feature_fabrica_ray.pipelines import edge_jaccard

    rng = np.random.default_rng(11)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 25, (90, 2))
             if a != b]
    edges += [(0, 1), (1, 2), (0, 2)]        # at least one triangle
    edges += [(300, 301)]                     # isolated edge: jaccard 0
    adj = _brute_graph(edges)

    df = pd.DataFrame(edges, columns=["a", "b"])
    got = edge_jaccard(_ds(df, blocks=3), "a", "b").to_pandas() \
        .sort_values(["lo", "hi"]).reset_index(drop=True)

    canon = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    assert list(zip(got["lo"].astype(int), got["hi"].astype(int))) == canon
    for _, r in got.iterrows():
        u, v = int(r["lo"]), int(r["hi"])
        common = len(adj[u] & adj[v])
        union = len(adj[u] | adj[v])
        assert int(r["common"]) == common, (u, v)
        assert int(r["deg_lo"]) == len(adj[u])
        assert int(r["deg_hi"]) == len(adj[v])
        want_j = common / union if union else 0.0
        assert abs(float(r["jaccard"]) - want_j) < 1e-12, (u, v)


def test_grouped_moments_vs_pandas(ray_session):
    """One-pass Pebay-merged per-group moments match pandas' bias-
    adjusted sample skew/kurtosis exactly, across block layouts, with
    nulls ignored and small groups (n<3 / n<4) yielding NaN."""
    from feature_fabrica_ray.pipelines import grouped_moments

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c", "d"], n),
        "v": rng.lognormal(1.0, 0.8, n)})
    df.loc[rng.choice(n, 50, replace=False), "v"] = np.nan
    # planted tiny groups: n=2 (no skew), n=3 (skew, no kurtosis)
    tiny = pd.DataFrame({"g": ["t2", "t2", "t3", "t3", "t3"],
                         "v": [1.0, 2.0, 1.0, 2.0, 10.0]})
    df = pd.concat([df, tiny], ignore_index=True)

    for blocks in (1, 5):
        out = grouped_moments(_ds(df, blocks=blocks), "g", "v") \
            .set_index("g")
        ref = df.dropna(subset=["v"]).groupby("g")["v"]
        for g, grp in ref:
            r = out.loc[g]
            assert int(r["n"]) == len(grp)
            assert abs(r["mean"] - grp.mean()) < 1e-9 * abs(grp.mean())
            assert abs(r["std"] - grp.std()) < 1e-9 * grp.std()
            if len(grp) >= 3:
                assert abs(r["skewness"] - grp.skew()) < 1e-8, g
            else:
                assert np.isnan(r["skewness"])
            if len(grp) >= 4:
                assert abs(r["kurtosis"] - grp.kurt()) < 1e-8, g
            else:
                assert np.isnan(r["kurtosis"])


def test_knn_graph_vs_brute(ray_session):
    """Broadcast-matmul k-NN graph matches the O(n^2) numpy reference
    (self excluded, deterministic (score desc, nbr) tie-break) across
    block layouts; the guard trips on an oversized corpus."""
    from feature_fabrica_ray.pipelines import knn_graph

    rng = np.random.default_rng(2)
    n, d, k = 60, 8, 4
    V = rng.normal(size=(n, d))
    V[7] = V[3]                      # exact duplicate -> score 1.0 pair
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [r.tolist() for r in V]})

    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = np.round(Vn @ Vn.T, 6)
    np.fill_diagonal(S, -np.inf)
    want = {}
    for i in range(n):
        order = sorted(range(n), key=lambda j: (-S[i, j], j))[:k]
        want[i] = [(j, S[i, j]) for j in order]

    for blocks in (1, 4):
        out = knn_graph(_ds(df, blocks=blocks), k=k)
        assert len(out) == n * k
        for i, grp in out.groupby("src_id"):
            got = list(zip(grp["nbr_id"].astype(int),
                           grp["score"].astype(float)))
            assert got == [(j, pytest.approx(s, abs=2e-6))
                           for j, s in want[int(i)]], i
        assert list(out.columns) == ["src_id", "nbr_id", "score", "rank"]

    # past the guard the call now AUTO-DISPATCHES to the IVF-bucketed
    # sharded path (same contract, approximate recall) instead of raising
    sharded = knn_graph(_ds(df, blocks=4), k=k, max_broadcast_rows=10)
    assert list(sharded.columns) == ["src_id", "nbr_id", "score", "rank"]
    assert set(sharded["src_id"]) == set(range(n))
    assert (sharded.groupby("src_id")["rank"].max() <= k).all()


def test_knn_graph_sharded_recall(ray_session):
    """IVF-bucketed knn graph: recall >= 0.7 vs the exact broadcast
    path on a clustered corpus above the guard, exact agreement on the
    planted duplicate pair, layout invariance, and a distributed
    (Dataset) return type from the sharded entry point."""
    import ray.data as rd
    from feature_fabrica_ray.pipelines import knn_graph, knn_graph_sharded

    rng = np.random.default_rng(9)
    n, d, k, n_clusters = 400, 16, 5, 8
    centers = rng.normal(size=(n_clusters, d)) * 4
    lab = rng.integers(0, n_clusters, n)
    V = centers[lab] + rng.normal(size=(n, d)) * 0.4
    V[11] = V[5]                      # planted exact duplicate
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [r.tolist() for r in V]})

    exact = knn_graph(_ds(df, blocks=4), k=k)
    res = knn_graph_sharded(_ds(df, blocks=4), k=k, nlist=8, nprobe=3)
    assert isinstance(res, rd.Dataset)
    approx = res.to_pandas()

    exact_pairs = set(zip(exact["src_id"], exact["nbr_id"]))
    approx_pairs = set(zip(approx["src_id"].astype(int),
                           approx["nbr_id"].astype(int)))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.7, recall

    # the planted duplicate must be each other's rank-1 neighbor with
    # score 1.0 even on the approximate path (same primary bucket)
    a = approx.set_index(["src_id", "rank"])
    assert a.loc[(5, 1), "nbr_id"] == 11 and a.loc[(11, 1), "nbr_id"] == 5
    assert a.loc[(5, 1), "score"] == pytest.approx(1.0, abs=1e-9)

    again = knn_graph_sharded(_ds(df, blocks=1), k=k, nlist=8,
                              nprobe=3).to_pandas()
    lhs = approx.sort_values(["src_id", "rank"]).reset_index(drop=True)
    rhs = again.sort_values(["src_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(lhs, rhs)


def test_pmi_bigrams_vs_brute(ray_session):
    """Distributed PMI collocations equal the single-process reference
    (counts, ln formula, deterministic ordering) across block layouts;
    min_count prunes but N_bigrams still counts the full population."""
    from collections import Counter

    from feature_fabrica_ray.pipelines import pmi_bigrams

    rng = np.random.default_rng(9)
    vocab = ["the", "cat", "sat", "new", "york", "deep", "blue", "sky"]
    docs = []
    for _ in range(120):
        toks = list(rng.choice(vocab, rng.integers(3, 12)))
        if rng.random() < 0.5:
            toks += ["new", "york"]            # planted collocation
        docs.append(" ".join(toks))
    docs.append("")                            # empty doc
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})

    uni: Counter = Counter()
    big: Counter = Counter()
    for d in docs:
        ts = d.split()
        uni.update(ts)
        big.update(zip(ts, ts[1:]))
    nt, nb = sum(uni.values()), sum(big.values())
    rows = [(a, b, c, round(np.log((c / nb) / ((uni[a] / nt)
                                               * (uni[b] / nt))), 6))
            for (a, b), c in big.items() if c >= 3]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = rows[:10]
    assert want[0][:2] == ("new", "york")

    for blocks in (1, 4):
        out = pmi_bigrams(_ds(df, blocks=blocks), min_count=3, top=10)
        got = [(r["a"], r["b"], int(r["n_pair"]), float(r["pmi"]))
               for _, r in out.iterrows()]
        assert got == [(a, b, c, pytest.approx(p, abs=1e-9))
                       for a, b, c, p in want], blocks


def test_zorder_key_interleave(ray_session):
    """zkey equals the bit-interleave reference, clamps out-of-range
    values, maps nulls to cell 0, and has the locality property (same
    quadrant => same top two bits); zbucket = top bits."""
    from feature_fabrica_ray.pipelines import zorder_key

    rng = np.random.default_rng(4)
    n = 300
    df = pd.DataFrame({"x": rng.uniform(-5, 110, n),
                       "y": rng.uniform(-5, 110, n)})
    df.loc[0, "x"] = np.nan

    out = zorder_key(_ds(df, blocks=3), "x", "y",
                     x_lo=0.0, x_hi=100.0, y_lo=0.0, y_hi=100.0,
                     bits=4, n_buckets=4).to_pandas()

    def ref(x, y):
        def q(v):
            if np.isnan(v):
                v = 0.0
            return int(min(max(np.floor(v / 100.0 * 16), 0), 15))
        xi, yi = q(x), q(y)
        z = 0
        for j in range(4):
            z |= ((xi >> j) & 1) << (2 * j + 1)
            z |= ((yi >> j) & 1) << (2 * j)
        return z

    for _, r in out.iterrows():
        z = ref(r["x"], r["y"])
        assert int(r["zkey"]) == z
        assert int(r["zbucket"]) == z >> 6
    # locality: both coords in the same half => same top quadrant bits
    inr = out[(out["x"] >= 0) & (out["x"] < 50) & (out["y"] >= 0)
              & (out["y"] < 50)]
    assert (inr["zbucket"] == 0).all() and len(inr) > 10

    with pytest.raises(ValueError, match="power of two"):
        zorder_key(_ds(df), "x", "y", x_lo=0, x_hi=1, y_lo=0, y_hi=1,
                   n_buckets=3).to_pandas()


def test_hilbert_key_curve(ray_session):
    """hkey is a bijection on the full grid whose consecutive keys are
    ALWAYS grid-adjacent (the Hilbert property Z-order lacks), clamps
    out-of-range, maps nulls to cell 0, and hbucket = top bits."""
    from feature_fabrica_ray.pipelines import hilbert_key

    # full 16x16 grid as cell-center coordinates
    g = np.arange(16)
    xs, ys = np.meshgrid(g, g, indexing="ij")
    df = pd.DataFrame({"x": (xs.ravel() + 0.5) / 16 * 100,
                       "y": (ys.ravel() + 0.5) / 16 * 100})
    out = hilbert_key(_ds(df, blocks=3), "x", "y",
                      x_lo=0.0, x_hi=100.0, y_lo=0.0, y_hi=100.0,
                      bits=4, n_buckets=4).to_pandas()
    assert sorted(out["hkey"]) == list(range(256))       # bijection
    srt = out.sort_values("hkey")
    cx = np.floor(srt["x"].to_numpy() / 100 * 16)
    cy = np.floor(srt["y"].to_numpy() / 100 * 16)
    step = np.abs(np.diff(cx)) + np.abs(np.diff(cy))
    assert (step == 1).all()                             # adjacency
    assert (out["hbucket"] == out["hkey"] // 64).all()
    assert set(out["hbucket"]) == {0, 1, 2, 3}

    # clamp + null: out-of-range clamps to edge cells, null -> cell 0
    edge = hilbert_key(_ds(pd.DataFrame({"x": [-3.0, 200.0, np.nan],
                                         "y": [50.0, 50.0, np.nan]})),
                       "x", "y", x_lo=0.0, x_hi=100.0,
                       y_lo=0.0, y_hi=100.0, bits=4).to_pandas()
    ref = hilbert_key(_ds(pd.DataFrame({"x": [0.0, 99.9, 0.0],
                                        "y": [50.0, 50.0, 0.0]})),
                      "x", "y", x_lo=0.0, x_hi=100.0,
                      y_lo=0.0, y_hi=100.0, bits=4).to_pandas()
    assert list(edge["hkey"]) == list(ref["hkey"])

    with pytest.raises(ValueError, match="power of two"):
        hilbert_key(_ds(df), "x", "y", x_lo=0, x_hi=1, y_lo=0, y_hi=1,
                    n_buckets=5).to_pandas()


def _phash_ref(payload: bytes) -> int:
    """Single-process dHash reference for the fake-decode contract."""
    body = payload[8:] if len(payload) >= 8 else payload[0:0]
    ncell, H, W = 72, 8, 8
    grid = np.zeros(ncell)
    L = len(body)
    if L:
        arr = np.frombuffer(body, dtype=np.uint8).astype(float)
        cell = (np.arange(L) * ncell) // L
        for c in range(ncell):
            sel = arr[cell == c]
            grid[c] = sel.mean() if sel.size else 0.0
    g = grid.reshape(H, W + 1)
    bits = (g[:, 1:] > g[:, :-1]).astype(np.uint8).ravel()
    return int(np.packbits(bits, bitorder="little").view(np.uint64)[0])


def test_phash_matches_reference_and_finds_neardups(ray_session):
    """PHashImage's flat segmented pass equals the per-row dHash
    reference on every row (incl. empty/short bodies), is layout-
    invariant, and one-byte-perturbed payloads land within hamming 3
    and are recovered by signature_hamming_pairs."""
    from feature_fabrica_ray.pipelines import (PHashImage,
                                               signature_hamming_pairs)

    rng = np.random.default_rng(6)
    payloads, ids = [], []
    for i in range(40):
        w, h = np.uint32(16 + i), np.uint32(20 + i)
        body = rng.integers(0, 256, 600, dtype=np.uint8).tobytes()
        payloads.append(w.tobytes() + h.tobytes() + body)
        ids.append(i)
    # planted near-dup: same body with ONE byte changed
    twin = bytearray(payloads[5])
    twin[100] = (twin[100] + 1) % 256
    payloads.append(bytes(twin)); ids.append(100)
    payloads.append(b"")          ; ids.append(101)   # empty payload
    payloads.append(b"\x01\x02")  ; ids.append(102)   # headerless short
    df = pd.DataFrame({"media_id": np.array(ids, np.int64),
                       "media_type": "image",
                       "payload": payloads,
                       "n_bytes": [len(p) for p in payloads]})

    import pyarrow as pa
    import ray.data
    got = {}
    for blocks in (1, 4):
        ds = ray.data.from_arrow(pa.Table.from_pandas(
            df, preserve_index=False)).repartition(blocks)
        out = ds.map_batches(PHashImage, concurrency=2, batch_size=16,
                             batch_format="pyarrow").to_pandas()
        m = dict(zip(out["media_id"].astype(int),
                     out["phash"].astype(np.int64)))
        if got:
            assert m == got        # layout invariance
        got = m
    for i, p in zip(ids, payloads):
        want = int(np.uint64(_phash_ref(p)).astype(np.int64))
        assert int(got[i]) == want, i
    assert got[101] == 0 and got[102] == 0

    ham = bin(int(np.uint64(got[5])) ^ int(np.uint64(got[100]))).count("1")
    assert ham <= 3

    ds = ray.data.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(3)
    sig = ds.map_batches(PHashImage, concurrency=2, batch_size=16,
                         batch_format="pyarrow")
    pairs = signature_hamming_pairs(sig, "phash", "media_id",
                                    max_hamming=3)
    assert (5, 100) in set(zip(pairs["id_a"].astype(int),
                               pairs["id_b"].astype(int)))


def _image_codec():
    """PIL when installed, else the pure-stdlib minicodec — the same
    fallback order the pipeline stages use, so test references always
    come from the codec under test."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        from feature_fabrica_ray.pipelines._minicodec import MiniImage
        return MiniImage


def _audio_codec():
    try:
        import soundfile
        return soundfile
    except ImportError:
        from feature_fabrica_ray.pipelines import _minicodec
        return _minicodec


def test_real_codec_image_decode_and_phash(ray_session):
    """Real-codec smoke: DecodeImageFeatures / PHashImage on actual PNG
    bytes — contract fields (width, height, mean_byte, byte_entropy)
    match PIL-computed references, and a BMP re-encode of the same
    image lands at hamming distance <= 3 of the PNG's dHash."""
    import io

    from feature_fabrica_ray.pipelines import (DecodeImageFeatures,
                                               PHashImage)

    Image = _image_codec()

    import pyarrow as pa

    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    # horizontal gradient so the dHash has structure
    px[:, :, 0] = np.linspace(0, 255, 40, dtype=np.uint8)[None, :]
    img = Image.fromarray(px, "RGB")
    png_buf, bmp_buf = io.BytesIO(), io.BytesIO()
    img.save(png_buf, format="PNG")
    img.save(bmp_buf, format="BMP")

    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([png_buf.getvalue(),
                                       bmp_buf.getvalue()], pa.binary())})
    out = ray.data.from_arrow(t).map_batches(
        DecodeImageFeatures, concurrency=1, batch_size=None,
        batch_format="pyarrow").to_pandas().sort_values("media_id")
    gray = np.asarray(img.convert("L"), dtype=np.float64)
    p = np.bincount(gray.astype(np.int64).ravel(), minlength=256) / gray.size
    ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
    for _, row in out.iterrows():
        assert (row["width"], row["height"]) == (40, 24)
        assert row["mean_byte"] == pytest.approx(gray.mean(), abs=1e-6)
        assert row["byte_entropy"] == pytest.approx(ent, abs=1e-6)

    ph = ray.data.from_arrow(t).map_batches(
        PHashImage, concurrency=1, batch_size=None,
        batch_format="pyarrow").to_pandas() \
        .sort_values("media_id")["phash"].tolist()
    ham = bin(np.uint64(ph[0]).view(np.int64) ^
              np.uint64(ph[1]).view(np.int64) & 0xFFFFFFFFFFFFFFFF
              ).count("1") if ph[0] != ph[1] else 0
    assert ham <= 3            # same pixels, different container
    assert ph[0] != 0          # gradient produced structured bits


def test_real_codec_audio_decode(ray_session):
    """Real-codec smoke: DecodeAudioFeatures on an actual WAV payload —
    n_samples / rms / zero_crossings match the sine-wave ground truth."""
    import io

    from feature_fabrica_ray.pipelines import DecodeAudioFeatures

    sf = _audio_codec()

    import pyarrow as pa

    sr, n = 8000, 800
    x = 0.5 * np.sin(2 * np.pi * 40 * np.arange(n) / sr)   # 40 Hz, 4 cycles
    buf = io.BytesIO()
    sf.write(buf, x, sr, format="WAV", subtype="FLOAT")
    t = pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array([buf.getvalue()], pa.binary())})
    out = ray.data.from_arrow(t).map_batches(
        DecodeAudioFeatures, concurrency=1, batch_size=None,
        batch_format="pyarrow").to_pandas()
    assert out["n_samples"].iloc[0] == n
    assert out["rms"].iloc[0] == pytest.approx(
        float(np.sqrt(((x * 127) ** 2).mean())), rel=1e-4)
    # 4 cycles have zeros at samples 0,100,...,800; sample 0 starts the
    # signal and sample 800 is past the end, leaving 7 interior sign
    # flips (sin(k*pi) evaluates to +-1e-16, so the flip lands on the
    # sample after each analytic zero)
    assert out["zero_crossings"].iloc[0] == 7


def test_real_image_unsupported_format_raises(ray_session):
    """A payload carrying a real codec magic the installed decoder
    cannot handle (progressive JPEG without PIL — baseline JPEG and
    GIF now decode via _minijpeg/_minigif) must fail LOUD, never fall
    through to the fake-header parse (silent garbage width/height)."""
    from feature_fabrica_ray.pipelines import (DecodeImageFeatures,
                                               PHashImage)
    from feature_fabrica_ray.pipelines._minijpeg import encode_jpeg

    import pyarrow as pa

    try:
        import PIL  # noqa: F401
        pytest.skip("pillow installed — every real format decodes")
    except ImportError:
        pass
    prog = bytearray(encode_jpeg(np.full((8, 8), 99, np.uint8), 75))
    idx = bytes(prog).find(b"\xFF\xC0")
    prog[idx + 1] = 0xC2                       # flip SOF0 -> SOF2
    t = pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array([bytes(prog)], pa.binary())})
    for cls in (DecodeImageFeatures, PHashImage):
        with pytest.raises(Exception) as ei:
            ray.data.from_arrow(t).map_batches(
                cls, concurrency=1, batch_size=None,
                batch_format="pyarrow").to_pandas()
        assert "progressive" in str(ei.value)


def test_ohlc_bars_vs_pandas(ray_session):
    """Blockwise boundary-row combiner equals the single-process OHLC
    (open at earliest (ts,id), close at latest, max/min/count) across
    layouts, including ts ties broken by id."""
    from feature_fabrica_ray.pipelines import ohlc_bars

    rng = np.random.default_rng(8)
    n = 600
    ts = pd.to_datetime(rng.integers(0, 4 * 3600, n), unit="s")
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64),
                       "ts": ts,
                       "user_id": rng.integers(0, 5, n).astype(np.int64),
                       "value": np.round(rng.uniform(0, 100, n), 2)})
    # planted ts tie inside one (user, window): ids decide open/close
    df.loc[1, ["ts", "user_id"]] = [df.loc[0, "ts"], df.loc[0, "user_id"]]

    ref = df.copy()
    ref["win"] = (ref["ts"].astype("datetime64[us]").astype("int64")
                  // (3600 * 10 ** 6)) * (3600 * 10 ** 6)
    ref = ref.sort_values(["ts", "event_id"], kind="mergesort")
    want = ref.groupby(["user_id", "win"], as_index=False).agg(
        open=("value", "first"), high=("value", "max"),
        low=("value", "min"), close=("value", "last"),
        n=("value", "size")).sort_values(["user_id", "win"]) \
        .reset_index(drop=True)

    for blocks in (1, 4):
        got = ohlc_bars(_ds(df, blocks=blocks), "ts", "user_id", "value",
                        "event_id", width_s=3600)
        assert got["window_us"].tolist() == want["win"].tolist()
        assert got["user_id"].tolist() == want["user_id"].tolist()
        for c in ("open", "high", "low", "close"):
            assert got[c].tolist() == want[c].tolist(), (blocks, c)
        assert got["n"].tolist() == want["n"].tolist()


def test_kcore_vs_brute_peeling(ray_session):
    """Distributed iterative peeling equals the brute-force k-core
    (cascade-aware) on a random graph with a planted 5-clique plus a
    dangling chain that must cascade away."""
    from feature_fabrica_ray.pipelines import kcore

    rng = np.random.default_rng(13)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 40, (130, 2))
             if a != b]
    clique = [200, 201, 202, 203, 204]
    edges += [(u, v) for i, u in enumerate(clique) for v in clique[i + 1:]]
    edges += [(204, 300), (300, 301), (301, 302)]       # cascading tail

    def brute(k):
        adj = _brute_graph(edges)
        changed = True
        while changed:
            changed = False
            for u in list(adj):
                if len(adj[u]) < k:
                    for v in adj[u]:
                        adj[v].discard(u)
                    del adj[u]
                    changed = True
            adj = {u: s for u, s in adj.items() if s}
        return {u: len(s) for u, s in adj.items()}

    df = pd.DataFrame(edges, columns=["a", "b"])
    for k in (2, 4):
        want = brute(k)
        got = kcore(_ds(df, blocks=3), k, "a", "b")
        got_map = dict(zip(got["node"].astype(int),
                           got["core_deg"].astype(int)))
        assert got_map == want, k
    assert all(n in kcore(_ds(df, blocks=2), 4, "a", "b")["node"].values
               for n in clique)
    # k high enough to peel everything
    assert kcore(_ds(df, blocks=2), 50, "a", "b").empty


def test_bootstrap_mean_ci(ray_session):
    """Poisson bootstrap: layout-invariant (identical CI across block
    layouts), exact point mean, CI brackets the true mean and tightens
    like 1/sqrt(n); nulls ignored."""
    from feature_fabrica_ray.pipelines import bootstrap_mean_ci

    rng = np.random.default_rng(17)
    n = 5000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "v": rng.normal(10.0, 3.0, n)})
    df.loc[:49, "v"] = np.nan

    outs = [bootstrap_mean_ci(_ds(df, blocks=b), "v", "id",
                              n_boot=120, seed=3) for b in (1, 5)]
    a, b = outs
    # weights are layout-invariant; sums differ only by float
    # addition order across blocks
    for c in ("mean", "ci_lo", "ci_hi"):
        assert a[c].iloc[0] == pytest.approx(b[c].iloc[0], rel=1e-12), c
    assert int(a["n"].iloc[0]) == int(b["n"].iloc[0])
    row = a.iloc[0]
    true_mean = df["v"].dropna().mean()
    assert row["mean"] == pytest.approx(true_mean, rel=1e-12)
    assert int(row["n"]) == n - 50
    assert row["ci_lo"] < true_mean < row["ci_hi"]
    width = row["ci_hi"] - row["ci_lo"]
    se = 3.0 / np.sqrt(n - 50)
    assert 2 * se < width < 8 * se           # sane percentile width

    # smaller sample -> wider interval
    small = bootstrap_mean_ci(_ds(df.head(500), blocks=2), "v", "id",
                              n_boot=120, seed=3).iloc[0]
    assert (small["ci_hi"] - small["ci_lo"]) > width


def test_neyman_allocation(ray_session):
    """Allocation matches the closed-form n_h = round(n N_h sigma_h /
    sum) with high-variance strata oversampled; degenerate strata
    (n<2, zero variance) get 0; caps at population."""
    from feature_fabrica_ray.pipelines import neyman_allocation

    rng = np.random.default_rng(21)
    frames = [
        pd.DataFrame({"s": "wide", "v": rng.normal(0, 10.0, 4000)}),
        pd.DataFrame({"s": "narrow", "v": rng.normal(0, 1.0, 4000)}),
        pd.DataFrame({"s": "tiny", "v": [5.0]}),
        pd.DataFrame({"s": "const", "v": np.full(50, 3.0)}),
    ]
    df = pd.concat(frames, ignore_index=True)

    out = neyman_allocation(_ds(df, blocks=4), "s", "v", 500) \
        .set_index("s")
    ref = df.groupby("s")["v"].agg(["count", "std"])
    w = (ref["count"] * ref["std"]).fillna(0.0)
    want = np.floor(500 * w / w.sum() + 0.5).clip(upper=ref["count"])
    for s in ref.index:
        assert int(out.loc[s, "alloc"]) == int(want[s]), s
        if ref.loc[s, "count"] >= 2:
            assert out.loc[s, "std"] == pytest.approx(ref.loc[s, "std"],
                                                      rel=1e-9)
    assert out.loc["wide", "alloc"] > 8 * out.loc["narrow", "alloc"]
    assert int(out.loc["tiny", "alloc"]) == 0
    assert int(out.loc["const", "alloc"]) == 0


def test_welch_ttest(ray_session):
    """Welch t / Welch–Satterthwaite df match the closed form on
    unequal-variance samples; shifted means give a large |t|; identical
    segments give t ~ 0; degenerate sides yield NULLs."""
    from feature_fabrica_ray.pipelines import welch_ttest

    rng = np.random.default_rng(23)
    df = pd.concat([
        pd.DataFrame({"g": "a", "v": rng.normal(10.0, 1.0, 600)}),
        pd.DataFrame({"g": "b", "v": rng.normal(12.0, 4.0, 300)}),
        pd.DataFrame({"g": "c", "v": [1.0]}),
    ], ignore_index=True)

    out = welch_ttest(_ds(df, blocks=4), "g", "v", "a", "b").iloc[0]
    xa = df.loc[df["g"] == "a", "v"]; xb = df.loc[df["g"] == "b", "v"]
    va, vb = xa.var(ddof=1), xb.var(ddof=1)
    se2 = va / len(xa) + vb / len(xb)
    t_ref = (xa.mean() - xb.mean()) / np.sqrt(se2)
    df_ref = se2 ** 2 / ((va / len(xa)) ** 2 / (len(xa) - 1)
                         + (vb / len(xb)) ** 2 / (len(xb) - 1))
    assert out["t"] == pytest.approx(t_ref, rel=1e-10)
    assert out["df"] == pytest.approx(df_ref, rel=1e-10)
    assert int(out["n_a"]) == 600 and int(out["n_b"]) == 300
    assert abs(out["t"]) > 2          # planted shift detected

    same = welch_ttest(_ds(df[df["g"] == "a"].assign(
        g=np.where(np.arange(600) % 2 == 0, "x", "y")), blocks=3),
        "g", "v", "x", "y").iloc[0]
    assert abs(same["t"]) < 2

    degen = welch_ttest(_ds(df, blocks=2), "g", "v", "a", "c").iloc[0]
    assert np.isnan(degen["t"]) and np.isnan(degen["df"])


def test_holt_per_key_reference(ray_session):
    """Holt level/trend recursion matches the reference loop exactly
    per key, tracks a linear ramp (forecast ~ next value), and is
    layout-invariant; single-row keys get trend 0."""
    from feature_fabrica_ray.pipelines import holt_per_key

    rng = np.random.default_rng(31)
    rows = []
    oid = 0
    for k in range(3):
        n = rng.integers(5, 30)
        for i in range(n):
            rows.append((oid, k, i, 2.0 * i + k + rng.normal(0, 0.01)))
            oid += 1
    rows.append((oid, 99, 0, 7.0))           # single-row key
    df = pd.DataFrame(rows, columns=["order", "k", "ts", "v"])

    def ref(x, a, b):
        lv, tr = x[0], (x[1] - x[0]) if len(x) > 1 else 0.0
        out = [(lv, tr)]
        for xi in x[1:]:
            prev = lv
            lv = a * xi + (1 - a) * (lv + tr)
            tr = b * (lv - prev) + (1 - b) * tr
            out.append((lv, tr))
        return out

    base = None
    for blocks in (1, 4):
        got = holt_per_key(_ds(df, blocks=blocks), "ts", "k", "v",
                           "order", alpha=0.5, beta=0.3)
        if base is None:
            base = got
        else:
            pd.testing.assert_frame_equal(got, base)
    for k, grp in df.groupby("k"):
        x = grp.sort_values(["ts", "order"])["v"].to_numpy()
        want = ref(x, 0.5, 0.3)
        sub = base[base["k"] == k].sort_values("order")
        for (lv, tr), (_, r) in zip(want, sub.iterrows()):
            assert r["level"] == pytest.approx(lv, abs=5e-7)
            assert r["trend"] == pytest.approx(tr, abs=5e-7)
            assert r["forecast"] == pytest.approx(lv + tr, abs=1e-6)
    single = base[base["k"] == 99].iloc[0]
    assert single["level"] == 7.0 and single["trend"] == 0.0
    # linear ramp: late forecasts approximate the next value x+2
    late = base[(base["k"] == 0)].sort_values("order").tail(3)
    for _, r in late.iterrows():
        assert abs(r["forecast"] - (r["v"] + 2.0)) < 0.2


def test_char_entropy_and_zlib_ratio(ray_session):
    """char_entropy equals the histogram definition (log2) per row with
    empty/null -> 0; zlib_ratio separates repetitive from random text
    and matches a direct zlib call."""
    import zlib

    import ray.data
    from feature_fabrica_ray.pipelines import CompressionRatio, char_entropy

    texts = ["aabb", "", None, "abcd", "x" * 400,
             "the quick brown fox jumps over the lazy dog " * 10]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    out = char_entropy(_ds(df, blocks=2)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    def ref_ent(t):
        if not t:
            return 0.0
        b = np.frombuffer(t.encode(), np.uint8)
        p = np.bincount(b, minlength=256) / b.size
        p = p[p > 0]
        return float(-(p * np.log2(p)).sum())

    for i, t in enumerate(texts):
        assert out.loc[i, "char_entropy"] == pytest.approx(
            ref_ent(t), abs=2e-6), i
    assert out.loc[1, "char_entropy"] == 0.0
    assert out.loc[2, "char_entropy"] == 0.0

    sig = ray.data.from_pandas(df).map_batches(
        CompressionRatio, concurrency=2, batch_size=4,
        batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        if not t:
            assert pd.isna(sig.loc[i, "zlib_ratio"]), i
        else:
            want = round(len(zlib.compress(t.encode(), 6))
                         / len(t.encode()), 6)
            assert sig.loc[i, "zlib_ratio"] == want, i
    # repetitive text compresses far below the pangram-rich doc
    assert sig.loc[4, "zlib_ratio"] < 0.1
    assert sig.loc[4, "zlib_ratio"] < sig.loc[5, "zlib_ratio"]


def test_woe_table_and_encode(ray_session):
    """WoE matches the smoothed closed form per category, separates a
    predictive category, encode stamps rows with the fitted value and
    NULLs unseen categories; layout-invariant."""
    from feature_fabrica_ray.pipelines import woe_encode, woe_table

    rng = np.random.default_rng(43)
    n = 3000
    cat = rng.choice(["good", "bad", "meh"], n, p=[0.4, 0.4, 0.2])
    p = np.where(cat == "good", 0.9, np.where(cat == "bad", 0.1, 0.5))
    y = (rng.random(n) < p).astype(np.int64)
    df = pd.DataFrame({"c": cat, "y": y})
    df.loc[0, "c"] = None                       # ignored

    for blocks in (1, 4):
        out = woe_table(_ds(df, blocks=blocks), "c", "y").set_index("c")
        sub = df.dropna(subset=["c"])
        k = sub["c"].nunique()
        ptot = sub["y"].sum(); ntot = (1 - sub["y"]).sum()
        for c, grp in sub.groupby("c"):
            pos, neg = grp["y"].sum(), (1 - grp["y"]).sum()
            want = np.log(((pos + .5) / (ptot + .5 * k))
                          / ((neg + .5) / (ntot + .5 * k)))
            assert out.loc[c, "woe"] == pytest.approx(want, rel=1e-12)
            assert int(out.loc[c, "n"]) == len(grp)
        assert out.loc["good", "woe"] > 1.0 > -1.0 > out.loc["bad", "woe"]

    enc = woe_encode(_ds(df, blocks=3), "c", "y").to_pandas()
    tbl = woe_table(_ds(df, blocks=3), "c", "y").set_index("c")
    for _, r in enc.head(200).iterrows():
        if r["c"] is None or (isinstance(r["c"], float) and pd.isna(r["c"])):
            assert pd.isna(r["woe"])
        else:
            assert r["woe"] == pytest.approx(tbl.loc[r["c"], "woe"])


def test_bfs_hops_vs_brute(ray_session):
    """Frontier-join BFS equals brute multi-source BFS (min hop over
    seeds) on a random graph + a planted chain; unreached components
    are absent; empty frontier terminates early."""
    from collections import deque

    from feature_fabrica_ray.pipelines import bfs_hops

    rng = np.random.default_rng(47)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 30, (60, 2))]
    edges += [(100 + i, 101 + i) for i in range(6)]   # chain off node 100
    edges += [(0, 100)]                                # bridge
    edges += [(500, 501)]                              # unreachable island
    adj = _brute_graph(edges)

    def brute(srcs):
        dist = {s: 0 for s in srcs if s in adj}
        q = deque(dist)
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    df = pd.DataFrame(edges, columns=["a", "b"])
    for srcs in ([0], [0, 3], [100]):
        want = brute(srcs)
        got = bfs_hops(_ds(df, blocks=3), srcs, "a", "b")
        got_map = dict(zip(got["node"].astype(int), got["hop"].astype(int)))
        assert got_map == want, srcs
        assert 500 not in got_map and 501 not in got_map


def test_activity_streaks(ray_session):
    """Streaks equal the brute run-length over distinct active days
    (planted 5-day streak with a gap, multi-event days deduped),
    layout-invariant."""
    from feature_fabrica_ray.pipelines import activity_streaks

    base = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: days 0-4 (streak 5), gap, days 7-8 (streak 2); dup events
    for d in [0, 1, 1, 2, 3, 4, 7, 8, 8]:
        rows.append((1, base + pd.Timedelta(days=d, hours=d % 3)))
    # user 2: single day, many events
    for h in range(5):
        rows.append((2, base + pd.Timedelta(hours=h)))
    # user 3: alternating days -> max streak 1
    for d in [0, 2, 4, 6]:
        rows.append((3, base + pd.Timedelta(days=d)))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])

    want = {1: (7, 5), 2: (1, 1), 3: (4, 1)}
    for blocks in (1, 3):
        out = activity_streaks(_ds(df, blocks=blocks), "ts", "user_id")
        got = {int(r["user_id"]): (int(r["n_days"]), int(r["max_streak"]))
               for _, r in out.iterrows()}
        assert got == want, blocks


def test_salted_join_equals_plain(ray_session):
    """Hot-key salted join returns exactly the plain hash join's rows
    on a Zipf-skewed key (one key = 50% of rows), including duplicate
    right keys; no-hot-key input takes the plain path unchanged."""
    import ray.data
    from feature_fabrica_ray.pipelines import salted_join, shuffle_join

    rng = np.random.default_rng(53)
    n = 4000
    keys = np.where(rng.random(n) < 0.5, 7,
                    rng.integers(0, 200, n)).astype(np.int64)
    left = pd.DataFrame({"k": keys, "lv": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 200, dtype=np.int64),
                          "rv": np.arange(0, 200, dtype=np.int64) * 10})
    # duplicate right rows for the hot key (tests replication x dup)
    right = pd.concat([right, pd.DataFrame({"k": [7], "rv": [999]})],
                      ignore_index=True)

    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(2)
    got = salted_join(lds, rds, on="k", salt=4, hot_threshold=0.05) \
        .to_pandas().sort_values(["lv", "rv"]).reset_index(drop=True)
    want = shuffle_join(lds, rds, on="k").to_pandas() \
        .sort_values(["lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "lv", "rv"]], want[["k", "lv", "rv"]])
    assert (got["k"] == 7).sum() == 2 * (left["k"] == 7).sum()

    # uniform key: no hot keys -> plain path, same rows
    left_u = pd.DataFrame({"k": rng.integers(0, 200, 500).astype(np.int64),
                           "lv": np.arange(500, dtype=np.int64)})
    lu = ray.data.from_pandas(left_u).repartition(3)
    got_u = salted_join(lu, rds, on="k", salt=4, hot_threshold=0.05) \
        .to_pandas().sort_values(["lv", "rv"]).reset_index(drop=True)
    want_u = shuffle_join(lu, rds, on="k").to_pandas() \
        .sort_values(["lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_u[["k", "lv", "rv"]], want_u[["k", "lv", "rv"]])


def test_product_quantize(ray_session):
    """PQ codes are deterministic and layout-invariant, reconstruction
    MSE beats the all-zero baseline by a wide margin on clustered data,
    and the codebook geometry is (m, k, d/m); non-divisible dim fails
    loud."""
    from feature_fabrica_ray.pipelines import product_quantize

    rng = np.random.default_rng(59)
    n, d = 400, 16
    centers = rng.normal(0, 5, (8, d))
    V = centers[rng.integers(0, 8, n)] + rng.normal(0, 0.1, (n, d))
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [r.tolist() for r in V]})

    base = None
    for blocks in (1, 4):
        codes, books = product_quantize(_ds(df, blocks=blocks), m=4,
                                        k=16, sample_n=400, seed=1)
        assert books.shape == (4, 16, 4)
        if base is None:
            base = codes
        else:
            pd.testing.assert_frame_equal(codes, base)
    assert list(base.columns) == ["vec_id", "code_0", "code_1",
                                  "code_2", "code_3", "err"]
    assert base[[f"code_{j}" for j in range(4)]].values.max() < 16
    var = float((V ** 2).mean())
    assert float(base["err"].mean()) < 0.05 * var

    with pytest.raises(ValueError, match="not divisible"):
        product_quantize(_ds(df), m=5, k=8, sample_n=100)


def test_null_pattern_profile(ray_session):
    """Null-combination counts equal pandas groupby over is-null masks,
    incl. the all-null and correlated-null planted patterns."""
    from feature_fabrica_ray.pipelines import null_pattern_profile

    rng = np.random.default_rng(61)
    n = 1000
    df = pd.DataFrame({"a": rng.uniform(size=n),
                       "b": rng.uniform(size=n).astype(object),
                       "c": rng.integers(0, 5, n).astype(object)})
    corr = rng.random(n) < 0.1          # a and b go null TOGETHER
    df.loc[corr, ["a", "b"]] = None
    df.loc[rng.random(n) < 0.05, "c"] = None

    for blocks in (1, 4):
        out = null_pattern_profile(_ds(df, blocks=blocks),
                                   ["a", "b", "c"])
        ref = df.assign(a_null=df["a"].isna(), b_null=df["b"].isna(),
                        c_null=df["c"].isna()) \
            .groupby(["a_null", "b_null", "c_null"]).size()
        got = {(bool(r["a_null"]), bool(r["b_null"]), bool(r["c_null"])):
               int(r["n"]) for _, r in out.iterrows()}
        assert got == ref.to_dict(), blocks
    # correlated pattern present, anticorrelated (a null, b not) absent
    assert (True, True, False) in got
    assert (True, False, False) not in got


def test_degree_assortativity(ray_session):
    """r matches numpy corrcoef over symmetrized edge-endpoint degrees:
    a star is strongly disassortative, a cycle (regular) is NaN, and a
    random graph matches the closed form."""
    from feature_fabrica_ray.pipelines import degree_assortativity

    def brute(edges):
        adj = _brute_graph(edges)
        deg = {u: len(s) for u, s in adj.items()}
        pairs = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
        xs = [deg[a] for a, b in pairs] + [deg[b] for a, b in pairs]
        ys = [deg[b] for a, b in pairs] + [deg[a] for a, b in pairs]
        return float(np.corrcoef(xs, ys)[0, 1])

    star = [(0, i) for i in range(1, 8)]
    out = degree_assortativity(_ds(pd.DataFrame(star, columns=["a", "b"]),
                                   blocks=2))
    assert out["r"] == pytest.approx(-1.0, abs=1e-9)
    assert out["n_edges"] == 7

    cycle = [(i, (i + 1) % 6) for i in range(6)]
    out = degree_assortativity(_ds(pd.DataFrame(cycle,
                                                columns=["a", "b"])))
    assert np.isnan(out["r"])

    rng = np.random.default_rng(67)
    rnd = [(int(a), int(b)) for a, b in rng.integers(0, 25, (80, 2))
           if a != b]
    out = degree_assortativity(_ds(pd.DataFrame(rnd, columns=["a", "b"]),
                                   blocks=3))
    assert out["r"] == pytest.approx(brute(rnd), abs=1e-9)


def test_km_survival_vs_reference(ray_session):
    """KM curve equals the hand product-limit on a small censored
    sample and a lifelines-style textbook case; censoring keeps the
    curve above the naive CDF complement."""
    from feature_fabrica_ray.pipelines import km_survival

    base = pd.Timestamp("2024-01-01")
    rows = []
    # user 1 events at 0, 10, 30 s; user 2 at 0, 5 s; global max = 30
    for u, secs in [(1, [0, 10, 30]), (2, [0, 5])]:
        for s in secs:
            rows.append((u, base + pd.Timedelta(seconds=s)))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    # durations: u1 gaps 10, 20 (uncensored), tail 0 (censored)
    #            u2 gap 5 (uncensored), tail 25 (censored)
    # pooled: (0,c) (5,e) (10,e) (20,e) (25,c); n=5
    # at t=5: n_at_risk = 5 - 1(cens at 0) = 4, d=1 -> S = 0.75
    # at t=10: n=3, d=1 -> S = 0.75 * 2/3 = 0.5
    # at t=20: n=2, d=1 -> S = 0.5 * 1/2 = 0.25
    out = km_survival(_ds(df, blocks=2), "ts", "user_id")
    assert out["dur_s"].tolist() == [5, 10, 20]
    assert out["n_at_risk"].tolist() == [4, 3, 2]
    assert out["d"].tolist() == [1, 1, 1]
    np.testing.assert_allclose(out["s"], [0.75, 0.5, 0.25], atol=1e-9)

    # randomized: monotone nonincreasing, in (0, 1], layout-invariant
    rng = np.random.default_rng(71)
    big = pd.DataFrame({
        "user_id": rng.integers(0, 20, 800),
        "ts": base + pd.to_timedelta(rng.integers(0, 10_000, 800), "s")})
    a = km_survival(_ds(big, blocks=1), "ts", "user_id")
    b = km_survival(_ds(big, blocks=4), "ts", "user_id")
    pd.testing.assert_frame_equal(a, b)
    sv = a["s"].to_numpy()
    assert (np.diff(sv) <= 1e-12).all() and (sv >= 0).all() and sv[0] <= 1


def test_type_inference_profile(ray_session):
    """Detector fractions equal hand counts on a planted mixed column
    (ints, floats, sci-notation, dates, bools, json, junk, nulls);
    int strings also count as floats (SQL-parity patterns)."""
    from feature_fabrica_ray.pipelines import type_inference_profile

    vals = (["42", "-7", "+3"]                      # int (and float)
            + ["3.14", ".5", "2e10", "-1.5E-3"]     # float only
            + ["2024-01-31", "1999-12-31T23:59"]    # date prefix
            + ["true", "FALSE"]                      # bool
            + ['{"k": 1}', "{}"]                     # json object
            + ["hello", "12abc", ""]                 # junk
            + [None, None])
    df = pd.DataFrame({"c": vals})
    nn = len(vals) - 2
    for blocks in (1, 3):
        out = type_inference_profile(_ds(df, blocks=blocks), "c").iloc[0]
        assert int(out["n"]) == len(vals) and int(out["nulls"]) == 2
        assert out["p_int"] == round(3 / nn, 6)
        assert out["p_float"] == round(7 / nn, 6)
        assert out["p_date"] == round(2 / nn, 6)
        assert out["p_bool"] == round(2 / nn, 6)
        assert out["p_json"] == round(2 / nn, 6)


def test_boxcox_fit_and_transform(ray_session):
    """Grid MLE recovers the generating power: squared-normal data fits
    lam ~ 0.5, lognormal fits lam ~ 0; transform matches the closed
    form, NULLs non-positive inputs, and the fitted output is less
    skewed than the input; layout-invariant."""
    from feature_fabrica_ray.pipelines import (boxcox_lambda_fit,
                                               boxcox_transform)

    rng = np.random.default_rng(73)
    sq = pd.DataFrame({"x": rng.normal(10, 1, 6000) ** 2})
    ln = pd.DataFrame({"x": rng.lognormal(0.5, 0.7, 6000)})

    fit_sq = boxcox_lambda_fit(_ds(sq, blocks=4), "x")
    fit_ln = boxcox_lambda_fit(_ds(ln, blocks=4), "x")
    assert abs(fit_sq["lam"] - 0.5) <= 0.2, fit_sq
    assert abs(fit_ln["lam"] - 0.0) <= 0.2, fit_ln
    assert boxcox_lambda_fit(_ds(sq, blocks=1), "x") == fit_sq

    df = pd.DataFrame({"x": [1.0, 4.0, 0.0, -3.0, np.nan, 9.0]})
    out = boxcox_transform(_ds(df, blocks=2), "x", lam=0.5).to_pandas()
    want = [(1 - 1) / .5, (2 - 1) / .5, None, None, None, (3 - 1) / .5]
    for got, w in zip(out["x_bc"], want):
        if w is None:
            assert pd.isna(got)
        else:
            assert got == pytest.approx(w, rel=1e-12)
    # lam = 0 -> ln x
    out0 = boxcox_transform(_ds(df, blocks=2), "x", lam=0.0).to_pandas()
    assert out0["x_bc"].iloc[1] == pytest.approx(np.log(4.0))

    # fitted transform reduces skew on the lognormal sample
    def skew(a):
        a = np.asarray(a, float)
        m = a.mean(); s = a.std()
        return float(((a - m) ** 3).mean() / s ** 3)

    enc = boxcox_transform(_ds(ln, blocks=3), "x",
                           lam=fit_ln["lam"]).to_pandas()
    assert abs(skew(enc["x_bc"])) < abs(skew(ln["x"])) / 3


def test_calibration_bins(ray_session):
    """A perfectly calibrated score has per-bin gap ~ 0; a biased score
    shows it; counts/means equal pandas reference; clamping puts
    out-of-range scores in the edge bins."""
    from feature_fabrica_ray.pipelines import calibration_bins

    rng = np.random.default_rng(79)
    n = 20000
    s = rng.random(n)
    df = pd.DataFrame({"s": s, "y": (rng.random(n) < s).astype(np.int64)})
    df.loc[0, "s"] = 1.5                # clamps into the top bin
    df.loc[1, "s"] = -0.2               # clamps into bin 0

    out = calibration_bins(_ds(df, blocks=4), "s", "y", n_bins=10)
    ref_b = np.clip(np.floor(df["s"] * 10), 0, 9).astype(int)
    ref = df.groupby(ref_b).agg(n=("s", "size"), ms=("s", "mean"),
                                pr=("y", "mean"))
    assert out["n"].tolist() == ref["n"].tolist()
    np.testing.assert_allclose(out["mean_score"], np.round(ref["ms"], 6),
                               atol=2e-6)
    np.testing.assert_allclose(out["pos_rate"], np.round(ref["pr"], 6),
                               atol=2e-6)
    assert out["gap"].abs().max() < 0.05      # calibrated

    biased = calibration_bins(
        _ds(df.assign(s=np.clip(df["s"] * 0.5, 0, 1)), blocks=2),
        "s", "y", n_bins=10)
    assert biased["gap"].max() > 0.2          # under-confident score


def test_rfm_features(ray_session):
    """R/F/M values match pandas aggregates; quantile scores follow
    cume_dist semantics with recency inverted (most recent = k); ties
    share a band; layout-invariant."""
    from feature_fabrica_ray.pipelines import rfm_features

    base = pd.Timestamp("2024-01-01")
    rng = np.random.default_rng(83)
    rows = []
    for u in range(20):
        for _ in range(int(rng.integers(1, 15))):
            rows.append((u, base + pd.Timedelta(
                seconds=int(rng.integers(0, 10_000))),
                float(np.round(rng.uniform(1, 50), 2))))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value"])

    outs = [rfm_features(_ds(df, blocks=b), "ts", "user_id", "value")
            for b in (1, 4)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0].set_index("user_id")

    as_of = df["ts"].max()
    ref = df.groupby("user_id").agg(last=("ts", "max"),
                                    freq=("ts", "size"),
                                    mon=("value", "sum"))
    for u, r in ref.iterrows():
        assert int(out.loc[u, "recency_s"]) == int(
            (as_of - r["last"]).total_seconds())
        assert int(out.loc[u, "frequency"]) == int(r["freq"])
        assert out.loc[u, "monetary"] == pytest.approx(round(r["mon"], 6))
    # cume_dist scoring reference
    cd = ref["freq"].rank(method="max", pct=True)
    want_f = np.ceil(cd * 5).astype(int)
    assert (out.loc[ref.index, "f_score"].to_numpy()
            == want_f.to_numpy()).all()
    cd_r = out["recency_s"].rank(method="max", pct=True)
    want_r = 6 - np.ceil(cd_r * 5).astype(int)
    assert (out["r_score"].to_numpy() == want_r.to_numpy()).all()
    assert set(out["m_score"]) <= set(range(1, 6))


def test_mmr_topk_diversifies(ray_session):
    """MMR with lam<1 spreads picks across planted duplicate clusters
    where plain top-k (lam=1) drowns in the nearest cluster; greedy
    scores match a driver reference; layout-invariant."""
    from feature_fabrica_ray.pipelines import mmr_topk

    rng = np.random.default_rng(89)
    d = 8
    q = rng.normal(size=d)
    q /= np.linalg.norm(q)
    # cluster A: 10 near-copies VERY close to the query;
    # clusters B, C: a bit further but distinct directions
    def cluster(center, n, eps):
        return center[None, :] + rng.normal(0, eps, (n, d))
    a = cluster(q + rng.normal(0, 0.05, d), 10, 0.01)
    b_dir = q + rng.normal(0, 0.6, d)
    c_dir = q + rng.normal(0, 0.6, d)
    vecs = np.vstack([a, cluster(b_dir, 10, 0.01),
                      cluster(c_dir, 10, 0.01),
                      rng.normal(size=(30, d))])
    df = pd.DataFrame({"vec_id": np.arange(len(vecs), dtype=np.int64),
                       "embedding": [r.tolist() for r in vecs]})

    plain = mmr_topk(_ds(df, blocks=3), q, k=6, lam=1.0, candidates=40)
    divers = mmr_topk(_ds(df, blocks=3), q, k=6, lam=0.5, candidates=40)
    div2 = mmr_topk(_ds(df, blocks=1), q, k=6, lam=0.5, candidates=40)
    pd.testing.assert_frame_equal(divers, div2)

    # plain top-k drowns in the near-duplicate cluster A (ids 0..9)
    assert (plain["vec_id"] < 10).all()
    # MMR escapes it
    assert not (divers["vec_id"] < 10).all()
    # and its picks are mutually less similar than plain's
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)

    def max_pair_sim(ids):
        V = vn[np.asarray(ids, int)]
        S = V @ V.T
        np.fill_diagonal(S, -1)
        return S.max()

    assert max_pair_sim(divers["vec_id"]) < max_pair_sim(plain["vec_id"])
    assert plain["relevance"].iloc[0] >= divers["relevance"].iloc[5]
    assert (divers["rank"] == np.arange(1, 7)).all()


def test_seasonal_residual(ray_session):
    """Profile equals per-(dow,hour) means; residuals center the
    planted weekly pattern to ~0 while raw values don't; Monday=0
    parity with SQL isodow-1; layout-invariant."""
    from feature_fabrica_ray.pipelines import seasonal_residual

    rng = np.random.default_rng(97)
    n = 5000
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 28 * 86400, n), "s")      # 4 full weeks
    dow = ts.dayofweek.to_numpy()
    hour = ts.hour.to_numpy()
    v = 10.0 + 5.0 * (dow == 2) + 3.0 * (hour >= 12) \
        + rng.normal(0, 0.5, n)
    df = pd.DataFrame({"ts": ts, "value": np.round(v, 3)})

    outs = [seasonal_residual(_ds(df, blocks=b), "ts", "value")
            .to_pandas() for b in (1, 4)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    assert (out["dow"].to_numpy() == dow).all()
    ref = df.assign(cell=dow * 24 + hour).groupby("cell")["value"].mean()
    got_prof = out.assign(cell=out["dow"] * 24 + out["hour"]) \
        .groupby("cell")["seasonal"].first()
    for c in ref.index:
        assert got_prof[c] == pytest.approx(round(ref[c], 6), abs=2e-6)
    # residuals kill the planted seasonal structure
    res = out["residual"].to_numpy()
    raw_spread = df.assign(cell=dow * 24 + hour).groupby(
        "cell")["value"].mean().std()
    res_spread = out.assign(cell=out["dow"] * 24 + out["hour"]).groupby(
        "cell")["residual"].mean().std()
    assert res_spread < raw_spread / 20
    assert abs(res.mean()) < 0.05


def test_yeojohnson_fit_and_transform(ray_session):
    """YJ grid MLE handles signed data (shifted-lognormal fits lam < 1;
    symmetric normal fits lam ~ 1); transform matches the closed form
    on all four branches and reduces skew; layout-invariant."""
    from feature_fabrica_ray.pipelines import (yeojohnson_lambda_fit,
                                               yeojohnson_transform)

    rng = np.random.default_rng(101)
    skewed = pd.DataFrame({"x": rng.lognormal(1.0, 0.8, 6000) - 2.0})
    sym = pd.DataFrame({"x": rng.normal(0, 1, 6000)})

    fit_sk = yeojohnson_lambda_fit(_ds(skewed, blocks=4), "x")
    fit_sym = yeojohnson_lambda_fit(_ds(sym, blocks=4), "x")
    assert fit_sk["lam"] < 0.6, fit_sk
    assert abs(fit_sym["lam"] - 1.0) <= 0.2, fit_sym
    assert yeojohnson_lambda_fit(_ds(skewed, blocks=1), "x") == fit_sk

    df = pd.DataFrame({"x": [2.0, 0.0, -3.0, np.nan]})
    for lam, want in [
        (0.5, [((3.0 ** .5) - 1) / .5, 0.0, -(((4.0) ** 1.5) - 1) / 1.5]),
        (0.0, [np.log(3.0), 0.0, -((4.0 ** 2 - 1) / 2)]),
        (2.0, [(9.0 - 1) / 2, 0.0, -np.log(4.0)]),
    ]:
        out = yeojohnson_transform(_ds(df, blocks=2), "x",
                                   lam=lam).to_pandas()
        for got, w in zip(out["x_yj"], want + [None]):
            if w is None:
                assert pd.isna(got)
            else:
                assert got == pytest.approx(w, rel=1e-12), lam

    def skew(a):
        a = np.asarray(a, float)
        return float(((a - a.mean()) ** 3).mean() / a.std() ** 3)

    enc = yeojohnson_transform(_ds(skewed, blocks=3), "x",
                               lam=fit_sk["lam"]).to_pandas()
    assert abs(skew(enc["x_yj"])) < abs(skew(skewed["x"])) / 3


def test_isotonic_calibrate(ray_session):
    """PAVA fit matches a reference isotonic regression on the binned
    rates (monotone, weighted pooling); stamped values are monotone in
    score and closer to the true probability than the raw biased
    score; layout-invariant."""
    from feature_fabrica_ray.pipelines import isotonic_calibrate

    rng = np.random.default_rng(103)
    n = 30000
    s = rng.random(n)
    # biased score: true P(y=1) = s**2
    df = pd.DataFrame({"s": s, "y": (rng.random(n) < s ** 2)
                       .astype(np.int64)})

    outs = [isotonic_calibrate(_ds(df, blocks=b), "s", "y", n_bins=50)
            .to_pandas() for b in (1, 4)]
    pd.testing.assert_frame_equal(
        outs[0].sort_values("s").reset_index(drop=True),
        outs[1].sort_values("s").reset_index(drop=True))
    out = outs[0].sort_values("s")
    cal = out["calibrated"].to_numpy()
    assert (np.diff(cal) >= -1e-12).all()          # monotone in score
    # calibrated tracks s**2 better than the raw score does
    err_cal = np.abs(cal - out["s"].to_numpy() ** 2).mean()
    err_raw = np.abs(out["s"].to_numpy() - out["s"].to_numpy() ** 2).mean()
    assert err_cal < err_raw / 3


def test_bigram_lm_scores(ray_session):
    """Interpolated bigram scores equal the Counter-based reference
    (pruned bigrams back off to unigram); a doc made of corpus-frequent
    bigrams outscores its own shuffled permutation; <2-token docs get
    NULL; layout-invariant."""
    from collections import Counter

    from feature_fabrica_ray.pipelines import bigram_lm_scores

    rng = np.random.default_rng(107)
    phrase = "new york city hall"
    docs = [phrase for _ in range(30)]
    docs += [" ".join(rng.permutation(phrase.split())) for _ in range(5)]
    docs += ["solo", ""]
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})

    uni: Counter = Counter()
    big: Counter = Counter()
    start: Counter = Counter()
    for d in docs:
        ts = d.split()
        uni.update(ts)
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] += 1
            start[a] += 1
    nt = sum(uni.values())

    def ref_score(d, lam=0.7, mc=3):
        ts = d.split()
        if len(ts) < 2:
            return None
        lps = []
        for a, b in zip(ts, ts[1:]):
            pb = big[(a, b)] / start[a] if big[(a, b)] >= mc else 0.0
            lps.append(np.log(max(lam * pb + (1 - lam) * uni[b] / nt,
                                  1e-300)))
        return round(float(np.mean(lps)), 6)

    outs = [bigram_lm_scores(_ds(df, blocks=b)) for b in (1, 3)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0].set_index("doc_id")
    for i, d in enumerate(docs):
        want = ref_score(d)
        if want is None:
            assert pd.isna(out.loc[i, "avg_logprob"])
        else:
            assert out.loc[i, "avg_logprob"] == pytest.approx(
                want, abs=2e-6), (i, d)
    assert out.loc[0, "avg_logprob"] > out.loc[31, "avg_logprob"]


def test_modularity(ray_session):
    """Q matches the closed form: a clean two-clique partition scores
    near 0.5, the merged-into-one partition scores 0, and a random
    partition scores near 0."""
    import ray.data
    from feature_fabrica_ray.pipelines import modularity

    c1 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    c2 = [(i, j) for i in range(10, 16) for j in range(i + 1, 16)]
    edges = c1 + c2 + [(0, 10)]                 # one bridge
    df = pd.DataFrame(edges, columns=["a", "b"])
    nodes = sorted({n for e in edges for n in e})

    def brute(comm_of):
        m = len(edges)
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        comms = set(comm_of.values())
        q = 0.0
        for c in comms:
            ew = sum(1 for a, b in edges
                     if comm_of[a] == c and comm_of[b] == c)
            dc = sum(d for n, d in deg.items() if comm_of[n] == c)
            q += ew / m - (dc / (2 * m)) ** 2
        return q

    def run(comm_of):
        asg = ray.data.from_pandas(pd.DataFrame(
            {"node": list(comm_of), "comp": [comm_of[n] for n in comm_of]}
        )).repartition(2)
        return modularity(_ds(df, blocks=2), asg)

    good = {n: (0 if n < 10 else 1) for n in nodes}
    merged = {n: 0 for n in nodes}
    rng = np.random.default_rng(109)
    rand = {n: int(rng.integers(0, 2)) for n in nodes}

    for part in (good, merged, rand):
        out = run(part)
        assert out["q"] == pytest.approx(brute(part), abs=1e-12)
        assert out["n_edges"] == len(edges)
    assert run(good)["q"] > 0.4
    assert abs(run(merged)["q"]) < 1e-12
    assert abs(run(rand)["q"]) < 0.25


def test_ivfpq_topk_recall(ray_session):
    """IVF-PQ ADC search recovers most of the exact top-10 (recall >=
    0.6 on clustered data), scores are deterministic across layouts,
    and the non-divisible-dim guard trips."""
    from feature_fabrica_ray.pipelines import cosine_topk, ivfpq_topk

    rng = np.random.default_rng(113)
    n, d = 600, 16
    # many SMALL tight clusters: the exact top-10 is "the query's
    # cluster", which a quantized index must recover even when codes
    # tie within a cluster
    centers = rng.normal(0, 3, (64, d))
    V = centers[np.arange(n) % 64] + rng.normal(0, 0.05, (n, d))
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [r.tolist() for r in V]})
    Q = V[:5] + rng.normal(0, 0.02, (5, d))

    exact = cosine_topk(_ds(df, blocks=3), Q, k=10)
    approx = ivfpq_topk(_ds(df, blocks=3), Q, k=10, nlist=16, nprobe=6,
                        m=4, kcode=32, sample_n=600)
    approx2 = ivfpq_topk(_ds(df, blocks=1), Q, k=10, nlist=16, nprobe=6,
                         m=4, kcode=32, sample_n=600)
    pd.testing.assert_frame_equal(approx, approx2)

    rec = []
    for q in range(5):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        rec.append(len(e & a) / len(e))
    assert np.mean(rec) >= 0.6, rec

    with pytest.raises(ValueError, match="not divisible"):
        ivfpq_topk(_ds(df), Q, m=5, sample_n=100)


def test_effect_sizes(ray_session):
    """Cohen's d matches the pooled-SD closed form; Cliff's delta
    matches brute pairwise sign counting incl. ties; identical
    segments give ~0; layout-invariant."""
    from feature_fabrica_ray.pipelines import effect_sizes

    rng = np.random.default_rng(127)
    xa = np.round(rng.normal(10, 2, 400), 1)   # rounding plants ties
    xb = np.round(rng.normal(11, 3, 300), 1)
    df = pd.concat([pd.DataFrame({"g": "a", "v": xa}),
                    pd.DataFrame({"g": "b", "v": xb})],
                   ignore_index=True)

    outs = [effect_sizes(_ds(df, blocks=bl), "g", "v", "a", "b").iloc[0]
            for bl in (1, 4)]
    for c in ("cohens_d", "cliffs_delta"):
        assert outs[0][c] == pytest.approx(outs[1][c], rel=1e-12)
    out = outs[0]
    sp = np.sqrt(((len(xa) - 1) * xa.var(ddof=1)
                  + (len(xb) - 1) * xb.var(ddof=1))
                 / (len(xa) + len(xb) - 2))
    assert out["cohens_d"] == pytest.approx(
        (xa.mean() - xb.mean()) / sp, rel=1e-10)
    gt = (xa[:, None] > xb[None, :]).sum()
    lt = (xa[:, None] < xb[None, :]).sum()
    assert out["cliffs_delta"] == pytest.approx(
        (gt - lt) / (len(xa) * len(xb)), rel=1e-10)

    same = effect_sizes(_ds(pd.DataFrame(
        {"g": np.where(np.arange(400) % 2 == 0, "a", "b"), "v": xa}),
        blocks=2), "g", "v", "a", "b").iloc[0]
    assert abs(same["cohens_d"]) < 0.3
    assert abs(same["cliffs_delta"]) < 0.2


def test_golden_record(ray_session):
    """Per key, each column independently takes its first non-null in
    priority order (a plain keep-one would lose the 'b' email);
    all-null columns stay null; layout-invariant."""
    from feature_fabrica_ray.pipelines import golden_record

    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 3, 3],
        "prio": [30, 20, 10, 5, 2, 1],
        "email": [None, "b@x", "c@x", None, None, None],
        "phone": ["111", None, "333", "444", None, "555"],
    })
    for blocks in (1, 3):
        out = golden_record(_ds(df, blocks=blocks), ["k"], "prio",
                            ["email", "phone"]).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        assert out["k"].tolist() == [1, 2, 3]
        # key 1: newest email is from prio-20 row, newest phone prio-30
        assert out.loc[0, "email"] == "b@x"
        assert out.loc[0, "phone"] == "111"
        assert out.loc[1, "email"] is None or pd.isna(out.loc[1, "email"])
        assert out.loc[1, "phone"] == "444"
        assert out.loc[2, "phone"] == "555"


def test_hill_tail_index(ray_session):
    """Hill alpha recovers the generating Pareto exponent on synthetic
    power-law data, flags the lognormal as lighter-tailed (higher
    alpha), equals the closed form, and is layout-invariant."""
    from feature_fabrica_ray.pipelines import hill_tail_index

    rng = np.random.default_rng(131)
    u = rng.random(20000)
    pareto = (1.0 - u) ** (-1.0 / 1.5)          # alpha = 1.5
    df = pd.DataFrame({"x": pareto})

    outs = [hill_tail_index(_ds(df, blocks=b), "x", k=200).iloc[0]
            for b in (1, 5)]
    assert outs[0]["alpha"] == outs[1]["alpha"]
    out = outs[0]
    top = np.sort(pareto)[-201:]
    want = 200 / np.log(top[1:] / top[0]).sum()
    assert out["alpha"] == pytest.approx(round(want, 6), abs=2e-6)
    assert abs(out["alpha"] - 1.5) < 0.3
    assert int(out["n_pos"]) == 20000

    light = hill_tail_index(
        _ds(pd.DataFrame({"x": rng.lognormal(0, 0.5, 20000)}), blocks=3),
        "x", k=200).iloc[0]
    assert light["alpha"] > out["alpha"] * 2

    tiny = hill_tail_index(_ds(df.head(50), blocks=2), "x", k=100).iloc[0]
    assert np.isnan(tiny["alpha"]) and int(tiny["n_pos"]) == 50


def test_ngram_containment_pairs(ray_session):
    """Containment flags a short doc quoted inside a long one
    (c_ab ~ 1, tiny Jaccard) while unrelated docs don't pair; counts
    match brute distinct-window sets; layout-invariant."""
    from feature_fabrica_ray.pipelines import ngram_containment_pairs

    rng = np.random.default_rng(137)
    vocab = [f"w{i}" for i in range(200)]
    quote = " ".join(rng.choice(vocab, 12))
    long_doc = " ".join(rng.choice(vocab, 150)) + " " + quote + " " \
        + " ".join(rng.choice(vocab, 150))
    docs = [quote, long_doc] + [" ".join(rng.choice(vocab, 60))
                                for _ in range(10)]
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})

    def windows(d, n=8):
        ts = d.split()
        return {" ".join(ts[i:i + n]) for i in range(len(ts) - n + 1)}

    w0, w1 = windows(quote), windows(long_doc)
    shared = len(w0 & w1)

    for blocks in (1, 3):
        out = ngram_containment_pairs(_ds(df, blocks=blocks), n=8,
                                      min_containment=0.5)
        row = out[(out["id_a"] == 0) & (out["id_b"] == 1)]
        assert len(row) == 1, out
        r = row.iloc[0]
        assert int(r["n_shared"]) == shared
        assert int(r["n_a"]) == len(w0) and int(r["n_b"]) == len(w1)
        assert r["c_ab"] == pytest.approx(shared / len(w0), abs=2e-6)
        assert r["c_ab"] == 1.0                  # fully contained
        assert r["c_ba"] < 0.2
        assert (out[["id_a", "id_b"]].values.tolist() == [[0, 1]])


def test_diff_in_diff(ray_session):
    """DiD recovers a planted treatment effect net of a shared time
    trend; cell means/counts match pandas; layout-invariant."""
    from feature_fabrica_ray.pipelines import diff_in_diff

    rng = np.random.default_rng(139)
    n = 8000
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 20 * 86400, n), "s")
    split = pd.Timestamp("2024-01-11")
    treat = rng.integers(0, 2, n)
    after = (ts >= split).astype(int)
    # base 10, time trend +2 for everyone after, +3 TRUE effect
    v = 10 + 2 * after + 3 * (treat & after) + rng.normal(0, 1, n)
    df = pd.DataFrame({"ts": ts, "treat": treat, "v": np.round(v, 3)})

    outs = [diff_in_diff(_ds(df, blocks=b), "ts", "treat", "v",
                         split).iloc[0] for b in (1, 4)]
    for c in outs[0].index:
        a, b2 = outs[0][c], outs[1][c]
        assert a == b2 or a == pytest.approx(b2, rel=1e-9), c
    out = outs[0]
    ref = df.assign(after=after).groupby(["treat", "after"])["v"] \
        .agg(["mean", "size"])
    assert out["mean_treat_after"] == pytest.approx(
        round(ref.loc[(1, 1), "mean"], 6), abs=2e-6)
    assert int(out["n_ctrl_before"]) == int(ref.loc[(0, 0), "size"])
    assert out["did"] == pytest.approx(3.0, abs=0.15)


def test_median_of_means(ray_session):
    """MoM resists a planted gross outlier that wrecks the plain mean;
    bucket means match a pandas md5-bucket reference; layout-invariant."""
    import hashlib

    from feature_fabrica_ray.pipelines import median_of_means

    rng = np.random.default_rng(149)
    n = 6000
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                       "v": rng.normal(5.0, 1.0, n)})
    df.loc[0, "v"] = 1e9                       # one corrupted record

    outs = [median_of_means(_ds(df, blocks=bl), "v", "k", b=32).iloc[0]
            for bl in (1, 4)]
    assert outs[0].equals(outs[1]) or all(
        outs[0][c] == pytest.approx(outs[1][c]) for c in outs[0].index)
    out = outs[0]
    assert abs(out["mom"] - 5.0) < 0.2          # robust
    assert out["mean"] > 1e5                    # plain mean destroyed
    assert int(out["n"]) == n

    bkt = df["k"].map(lambda x: int(hashlib.md5(str(x).encode())
                                    .hexdigest()[:8], 16) % 32)
    ref = float(df.groupby(bkt)["v"].mean().median())
    assert out["mom"] == pytest.approx(round(ref, 6), abs=2e-6)


def test_vocab_overlap(ray_session):
    """Counts equal brute set arithmetic on planted vocabularies with
    partial overlap; layout-invariant; coverage asymmetry detected."""
    from feature_fabrica_ray.pipelines import vocab_overlap

    docs_a = ["alpha beta gamma", "beta delta", "alpha epsilon"]
    docs_b = ["beta gamma zeta", "zeta eta theta iota"]
    rows = [("a", d) for d in docs_a] + [("b", d) for d in docs_b] \
        + [("c", "unrelated words here")]
    df = pd.DataFrame(rows, columns=["seg", "text"])

    va = set(" ".join(docs_a).split())
    vb = set(" ".join(docs_b).split())
    for blocks in (1, 3):
        out = vocab_overlap(_ds(df, blocks=blocks), "text", "seg",
                            "a", "b").iloc[0]
        assert int(out["n_a"]) == len(va)
        assert int(out["n_b"]) == len(vb)
        assert int(out["n_common"]) == len(va & vb)
        assert out["jaccard"] == round(len(va & vb) / len(va | vb), 6)
        assert out["cover_a_in_b"] == round(len(va & vb) / len(va), 6)


def test_dau_mau(ray_session):
    """MAU/avg-DAU/stickiness match brute set math across two planted
    months (daily-active user vs one-day user); multi-event days
    dedupe; layout-invariant."""
    from feature_fabrica_ray.pipelines import dau_mau

    base = pd.Timestamp("2024-01-01")
    rows = []
    for d in range(10):                       # Jan: u1 daily, u2 once
        rows.append((1, base + pd.Timedelta(days=d)))
        rows.append((1, base + pd.Timedelta(days=d, hours=5)))
    rows.append((2, base + pd.Timedelta(days=3)))
    feb = pd.Timestamp("2024-02-01")          # Feb: u1,u2,u3 same day
    for u in (1, 2, 3):
        rows.append((u, feb))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])

    for blocks in (1, 3):
        out = dau_mau(_ds(df, blocks=blocks), "ts", "user_id") \
            .set_index("month_us")
        jan = out.iloc[0]
        # Jan: 10 active days; DAU = 1 except day3 (2); MAU 2
        assert int(jan["mau"]) == 2
        assert jan["avg_dau"] == pytest.approx(11 / 10, abs=1e-9)
        assert jan["stickiness"] == pytest.approx(round(11 / 20, 6),
                                                  abs=2e-6)
        febr = out.iloc[1]
        assert int(febr["mau"]) == 3 and febr["avg_dau"] == 3.0
        assert febr["stickiness"] == 1.0


def test_burstiness_per_key(ray_session):
    """Periodic events give B near -1, exponential gaps near 0, bursty
    near +1; values equal the closed form; <3-event keys NULL."""
    from feature_fabrica_ray.pipelines import burstiness_per_key

    rng = np.random.default_rng(157)
    base = pd.Timestamp("2024-01-01")
    rows = []
    oid = 0
    for i in range(50):                       # key 1: clockwork 60 s
        rows.append((1, base + pd.Timedelta(seconds=60 * i), oid)); oid += 1
    t = 0.0
    for _ in range(200):                      # key 2: Poisson-ish
        t += rng.exponential(60)
        rows.append((2, base + pd.Timedelta(seconds=t), oid)); oid += 1
    t = 0.0
    for _ in range(200):                      # key 3: heavy bursts
        t += rng.exponential(1) if rng.random() < 0.95 \
            else rng.exponential(5000)
        rows.append((3, base + pd.Timedelta(seconds=t), oid)); oid += 1
    rows.append((9, base, oid))               # single event
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])

    for blocks in (1, 3):
        out = burstiness_per_key(_ds(df, blocks=blocks), "ts",
                                 "user_id", "event_id") \
            .set_index("user_id")
        assert out.loc[1, "burstiness"] == pytest.approx(-1.0, abs=1e-6)
        assert abs(out.loc[2, "burstiness"]) < 0.15
        assert out.loc[3, "burstiness"] > 0.5
        assert pd.isna(out.loc[9, "burstiness"])
        gaps = np.diff(df[df["user_id"] == 2].sort_values("ts")["ts"]
                       .astype("datetime64[us]").astype(np.int64)) / 1e6
        want = (gaps.std(ddof=1) - gaps.mean()) \
            / (gaps.std(ddof=1) + gaps.mean())
        assert out.loc[2, "burstiness"] == pytest.approx(round(want, 6),
                                                         abs=2e-6)


def test_clustering_coefficients(ray_session):
    """A triangle gives C=1 everywhere; a star gives 0; a known mixed
    graph matches brute closed forms."""
    from feature_fabrica_ray.pipelines import clustering_coefficients

    tri = pd.DataFrame([(0, 1), (1, 2), (0, 2)], columns=["a", "b"])
    out = clustering_coefficients(_ds(tri, blocks=2))
    assert out["c_global"] == pytest.approx(1.0)
    assert out["c_avg_local"] == pytest.approx(1.0)
    assert out["n_triangles"] == 1 and out["n_wedges"] == 3

    star = pd.DataFrame([(0, i) for i in range(1, 6)],
                        columns=["a", "b"])
    out = clustering_coefficients(_ds(star, blocks=2))
    assert out["c_global"] == 0.0 and out["n_triangles"] == 0

    # triangle 0-1-2 plus pendant 2-3: wedges = C(2,2)x2 + C(3,2) = 1+1+3
    mixed = pd.DataFrame([(0, 1), (1, 2), (0, 2), (2, 3)],
                         columns=["a", "b"])
    out = clustering_coefficients(_ds(mixed, blocks=2))
    assert out["n_wedges"] == 5
    assert out["c_global"] == pytest.approx(3.0 / 5.0)
    # locals: nodes 0,1 -> 1; node 2 -> 1/3; node 3 deg 1 excluded
    assert out["c_avg_local"] == pytest.approx((1 + 1 + 1 / 3) / 3)


def test_readability_scores(ray_session):
    """Counts match hand regex math; simple prose scores higher than
    long-word text; empty doc gets NULL; no-punctuation doc counts one
    sentence."""
    import re

    from feature_fabrica_ray.pipelines import readability_scores

    texts = ["The cat sat. The dog ran!",
             "Incomprehensibility characterizes institutionalization.",
             "no punctuation here at all",
             ""]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "text": texts})
    out = readability_scores(_ds(df, blocks=2)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    for i, t in enumerate(texts):
        w = len(re.findall(r"\S+", t))
        se = max(len(re.findall(r"[.!?]+", t)), 1)
        sy = len(re.findall(r"[aeiouAEIOU]+", t))
        assert int(out.loc[i, "n_words"]) == w, i
        assert int(out.loc[i, "n_sentences"]) == se, i
        assert int(out.loc[i, "n_syllables"]) == sy, i
        if w:
            want = 206.835 - 1.015 * w / se - 84.6 * sy / w
            assert out.loc[i, "flesch"] == pytest.approx(round(want, 6),
                                                         abs=2e-6)
        else:
            assert pd.isna(out.loc[i, "flesch"])
    assert out.loc[0, "flesch"] > out.loc[1, "flesch"]


def test_lexical_diversity(ray_session):
    """TTR/hapax equal Counter math; repeated-template text craters
    both; empty docs NULL; layout-invariant."""
    from collections import Counter

    from feature_fabrica_ray.pipelines import lexical_diversity

    texts = ["the cat sat on the mat",
             "buy now buy now buy now buy now",
             "every word here is completely unique",
             ""]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "text": texts})
    for blocks in (1, 2):
        out = lexical_diversity(_ds(df, blocks=blocks)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        for i, t in enumerate(texts):
            c = Counter(t.split())
            nt = sum(c.values())
            assert int(out.loc[i, "n_tokens"]) == nt
            assert int(out.loc[i, "n_types"]) == len(c)
            assert int(out.loc[i, "n_hapax"]) == sum(
                1 for v in c.values() if v == 1)
            if nt:
                assert out.loc[i, "ttr"] == pytest.approx(
                    round(len(c) / nt, 6), abs=2e-6)
            else:
                assert pd.isna(out.loc[i, "ttr"])
        assert out.loc[1, "ttr"] < out.loc[2, "ttr"]
        assert out.loc[1, "hapax_frac"] == 0.0
        assert out.loc[2, "hapax_frac"] == 1.0


def test_conversion_latency(ray_session):
    """Deltas equal first-purchase minus first-view per converting
    user; non-converters and purchase-before-view keys counted in the
    denominator only; quantiles match numpy; layout-invariant."""
    from feature_fabrica_ray.pipelines import conversion_latency

    base = pd.Timestamp("2024-01-01")
    rows = []
    # u1: view at 10, purchase at 70 -> 60 s
    rows += [(1, "view", 10), (1, "purchase", 70), (1, "view", 100)]
    # u2: view 0, purchase 600 -> 600 s
    rows += [(2, "view", 0), (2, "purchase", 600)]
    # u3: views only
    rows += [(3, "view", 5), (3, "view", 50)]
    # u4: purchase BEFORE any view -> not converted
    rows += [(4, "purchase", 10), (4, "view", 100)]
    # u5: other types only -> not in denominator
    rows += [(5, "click", 30)]
    df = pd.DataFrame([(u, t, base + pd.Timedelta(seconds=s), i)
                       for i, (u, t, s) in enumerate(rows)],
                      columns=["user_id", "event_type", "ts",
                               "event_id"])

    for blocks in (1, 3):
        out = conversion_latency(_ds(df, blocks=blocks), "ts",
                                 "user_id", "event_type",
                                 "view", "purchase").iloc[0]
        assert int(out["n_from"]) == 4           # u1,u2,u3,u4 viewed
        assert int(out["n_converted"]) == 2      # u1, u2
        assert out["conv_rate"] == 0.5
        assert out["q50_s"] == pytest.approx(np.quantile([60, 600], .5))
        assert out["q90_s"] == pytest.approx(np.quantile([60, 600], .9))


def test_target_encode_smoothed(ray_session):
    """Shrinkage pulls small categories toward the global mean and
    leaves big ones near their own mean; closed form exact;
    layout-invariant."""
    from feature_fabrica_ray.pipelines import target_encode_smoothed

    rng = np.random.default_rng(167)
    big = pd.DataFrame({"k": "big", "v": rng.normal(10, 1, 2000)})
    small = pd.DataFrame({"k": "small", "v": [100.0, 110.0]})
    df = pd.concat([big, small], ignore_index=True)
    gm = df["v"].mean()

    for blocks in (1, 4):
        out = target_encode_smoothed(_ds(df, blocks=blocks), "k", "v",
                                     m=20.0).set_index("k")
        for k, grp in df.groupby("k"):
            n, mu = len(grp), grp["v"].mean()
            want = (n * mu + 20 * gm) / (n + 20)
            assert out.loc[k, "enc"] == pytest.approx(round(want, 6),
                                                      abs=2e-6), k
        assert abs(out.loc["big", "enc"] - 10) < 0.5
        # small category (mean ~105) shrinks far toward global (~10.1)
        assert out.loc["small", "enc"] < 30


def test_max_drawdown(ray_session):
    """Drawdown equals the brute peak-to-trough on a planted
    rise-crash-recover series; monotone series has 0; layout-
    invariant."""
    from feature_fabrica_ray.pipelines import max_drawdown

    base = pd.Timestamp("2024-01-01")
    vals1 = [10, 20, 30, -50, -20, 40, 5]      # peak 60 -> trough 10
    vals2 = [5, 5, 5, 5]                        # monotone
    rows = []
    oid = 0
    for u, vs in [(1, vals1), (2, vals2)]:
        for i, v in enumerate(vs):
            rows.append((u, base + pd.Timedelta(seconds=i), float(v),
                         oid))
            oid += 1
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value",
                                     "event_id"])

    def brute(vs):
        cum = np.cumsum(vs)
        peak = np.maximum.accumulate(cum)
        return float((peak - cum).max())

    for blocks in (1, 3):
        out = max_drawdown(_ds(df, blocks=blocks), "ts", "user_id",
                           "value", "event_id").set_index("user_id")
        assert out.loc[1, "max_drawdown"] == pytest.approx(brute(vals1))
        assert out.loc[1, "total"] == sum(vals1)
        assert out.loc[2, "max_drawdown"] == 0.0


def test_seasonal_strength(ray_session):
    """A strongly scheduled metric scores near 1; white noise scores
    near 0; formula matches the variance identity."""
    from feature_fabrica_ray.pipelines import seasonal_strength

    rng = np.random.default_rng(173)
    n = 8000
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 28 * 86400, n), "s")
    hour = ts.hour.to_numpy()
    strong = 10.0 + 8.0 * np.sin(hour / 24 * 2 * np.pi) \
        + rng.normal(0, 0.3, n)
    noise = rng.normal(0, 1, n)

    s1 = seasonal_strength(_ds(pd.DataFrame({"ts": ts, "v": strong}),
                               blocks=3), "ts", "v").iloc[0]
    s0 = seasonal_strength(_ds(pd.DataFrame({"ts": ts, "v": noise}),
                               blocks=3), "ts", "v").iloc[0]
    assert s1["strength"] > 0.9
    assert s0["strength"] < 0.1
    assert s1["var_residual"] < s1["var_value"]


def test_dup_rate_by_segment(ray_session):
    """Per-segment dup rates equal pandas nunique math; same key in
    two segments is not a within-segment duplicate; layout-invariant."""
    from feature_fabrica_ray.pipelines import dup_rate_by_segment

    df = pd.DataFrame({
        "seg": ["a"] * 6 + ["b"] * 4,
        "k1": ["x", "x", "x", "y", "z", "w", "x", "q", "q", "r"],
        "k2": [1, 1, 2, 3, 4, 5, 1, 6, 6, 7]})
    for blocks in (1, 3):
        out = dup_rate_by_segment(_ds(df, blocks=blocks),
                                  ["k1", "k2"], "seg").set_index("seg")
        ref = df.assign(key=df["k1"] + "|" + df["k2"].astype(str)) \
            .groupby("seg")["key"].agg(["size", "nunique"])
        for s_, r in ref.iterrows():
            assert int(out.loc[s_, "n_rows"]) == int(r["size"])
            assert int(out.loc[s_, "n_distinct"]) == int(r["nunique"])
        assert int(out.loc["a", "n_dup_rows"]) == 1   # (x,1) twice
        assert int(out.loc["b", "n_dup_rows"]) == 1   # (q,6) twice


def test_balance_classes(ray_session):
    """Expected per-class counts land near the minority count (exact
    deterministic selection, binomial tolerance); minority class kept
    whole; layout-invariant; md5 and hash64 modes both work."""
    from feature_fabrica_ray.pipelines import balance_classes

    rng = np.random.default_rng(181)
    n = 12000
    df = pd.DataFrame({
        "k": np.arange(n, dtype=np.int64),
        "y": rng.choice(["maj", "mid", "min"], n, p=[0.7, 0.25, 0.05])})
    counts = df["y"].value_counts()
    m = counts.min()

    for method in ("md5", "hash64"):
        outs = [balance_classes(_ds(df, blocks=b), "y", ["k"],
                                method=method).to_pandas()
                for b in (1, 4)]
        a = outs[0].sort_values("k").reset_index(drop=True)
        b2 = outs[1].sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b2)
        got = a["y"].value_counts()
        assert got["min"] == m                  # fraction 1 keeps all
        for c in ("maj", "mid"):
            assert abs(got[c] - m) < 4 * np.sqrt(m), (method, c, got[c])


# ---------------------------------------------------------------------------
# edit-distance near-dup pairs (FastSS deletion blocking)
# ---------------------------------------------------------------------------

def _ed_ref(a: str, b: str) -> int:
    """Plain byte-level Wagner-Fischer reference."""
    a, b = a.encode(), b.encode()
    D = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, D[0] = D[:], i
        for j in range(1, len(b) + 1):
            D[j] = min(prev[j - 1] + (a[i - 1] != b[j - 1]),
                       prev[j] + 1, D[j - 1] + 1)
    return D[len(b)]


def _editdist_df():
    base = ["goldenrod lace", "midnight chocolate", "forest almond",
            "spring peach", "powder drab", "hot gear", "small ring",
            "blue bolt", "red widget", "plum thistle"]
    typos = ["goldenrod lcae",      # transposition = 2 subs
             "midnight chocolat",   # deletion = 1
             "forest almondd",      # insertion = 1
             "spring peech",        # substitution = 1
             "powderr drabb"]       # two edits = 2
    ids = list(range(10)) + list(range(100, 105))
    return pd.DataFrame({"doc_id": ids, "text": base + typos})


def test_edit_distance_pairs_exact_vs_bruteforce(ray_session):
    from feature_fabrica_ray.pipelines import edit_distance_pairs

    df = _editdist_df()
    for d in (1, 2):
        got = edit_distance_pairs(_ds(df), max_dist=d)
        got_set = {(a, b, c) for a, b, c in got.values.tolist()}
        want = set()
        txt = dict(zip(df["doc_id"], df["text"]))
        ks = sorted(txt)
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                dd = _ed_ref(txt[ks[i]], txt[ks[j]])
                if dd <= d:
                    want.add((ks[i], ks[j], dd))
        assert got_set == want, (d, got_set ^ want)
    # the planted d<=1 pairs specifically
    got1 = edit_distance_pairs(_ds(df), max_dist=1)
    found = set(map(tuple, got1[["id_a", "id_b"]].values.tolist()))
    assert {(1, 101), (2, 102), (3, 103)} <= found


def test_edit_distance_pairs_partition_invariant(ray_session):
    from feature_fabrica_ray.pipelines import edit_distance_pairs

    key = lambda df: sorted(map(tuple, df.values.tolist()))
    p1 = edit_distance_pairs(_ds(_editdist_df(), blocks=1), max_dist=2)
    p4 = edit_distance_pairs(_ds(_editdist_df(), blocks=4), max_dist=2)
    assert key(p1) == key(p4)


def test_edit_distance_pairs_edges(ray_session):
    from feature_fabrica_ray.pipelines import edit_distance_pairs

    # duplicates report dist 0; empty and null strings behave as ''
    df = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                       "text": ["same", "same", "", None, "x"]})
    got = edit_distance_pairs(_ds(df), max_dist=1)
    got_set = set(map(tuple, got.values.tolist()))
    assert (1, 2, 0) in got_set                  # exact duplicate
    assert (3, 4, 0) in got_set                  # '' == null-as-''
    assert (3, 5, 1) in got_set and (4, 5, 1) in got_set
    assert (1, 3, 4) not in got_set
    # no pairs at all
    none = edit_distance_pairs(
        _ds(pd.DataFrame({"doc_id": [1, 2], "text": ["abcdef", "uvwxyz"]})),
        max_dist=2)
    assert none.empty and list(none.columns) == ["id_a", "id_b", "dist"]
    # max_len contract
    import pytest as _pytest
    long_df = pd.DataFrame({"doc_id": [1], "text": ["x" * 600]})
    with _pytest.raises(Exception):
        edit_distance_pairs(_ds(long_df), max_dist=1)


def test_levenshtein_many_random_vs_reference():
    from feature_fabrica_ray.pipelines import levenshtein_many

    rng = np.random.default_rng(11)
    A = ["".join(rng.choice(list("abcd"), size=rng.integers(0, 12)))
         for _ in range(100)]
    B = ["".join(rng.choice(list("abcd"), size=rng.integers(0, 12)))
         for _ in range(100)]
    got = levenshtein_many([a.encode() for a in A],
                           [b.encode() for b in B])
    want = np.array([_ed_ref(a, b) for a, b in zip(A, B)])
    assert (got == want).all()


# ---------------------------------------------------------------------------
# string-similarity pairs (Jaro-Winkler / Damerau over FastSS blocking)
# ---------------------------------------------------------------------------

def _jw_ref(a: str, b: str) -> float:
    """Reference Jaro-Winkler via the textbook definition (char-level ==
    byte-level on these ASCII fixtures)."""
    a, b = a.encode(), b.encode()
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    w = max(la, lb) // 2 - 1
    am, bm = [False] * la, [False] * lb
    m = 0
    for i in range(la):
        for j in range(max(0, i - w), min(lb, i + w + 1)):
            if not bm[j] and a[i] == b[j]:
                am[i] = bm[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t, j = 0, 0
    for i in range(la):
        if am[i]:
            while not bm[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    jaro = (m / la + m / lb + (m - t // 2) / m) / 3.0
    if jaro <= 0.7:
        return jaro
    p = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        p += 1
    return jaro + p * 0.1 * (1.0 - jaro)


def _dl_ref(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein reference (recursive w/ memo)."""
    from functools import lru_cache
    a, b = a.encode(), b.encode()

    @lru_cache(maxsize=None)
    def d(i, j):
        if i == 0 or j == 0:
            return max(i, j)
        best = min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                   d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))
        # transposition: last char of a matches some earlier char of b
        for k in range(i - 1, 0, -1):
            if a[k - 1] == b[j - 1]:
                for l in range(j - 1, 0, -1):
                    if b[l - 1] == a[i - 1]:
                        best = min(best, d(k - 1, l - 1)
                                   + (i - k - 1) + 1 + (j - l - 1))
                        break
                break
        return best
    return d(len(a), len(b))


def test_jaro_winkler_bytes_vs_reference():
    from feature_fabrica_ray.pipelines import jaro_winkler_bytes

    cases = [("martha", "marhta"), ("dwayne", "duane"),
             ("dixon", "dicksonx"), ("", ""), ("", "a"), ("ab", "ba"),
             ("same", "same"), ("abcde", "vwxyz")]
    rng = np.random.default_rng(3)
    for _ in range(200):
        cases.append((
            "".join(rng.choice(list("abc"), size=rng.integers(0, 10))),
            "".join(rng.choice(list("abc"), size=rng.integers(0, 10)))))
    for a, b in cases:
        got = jaro_winkler_bytes(a.encode(), b.encode())
        assert abs(got - _jw_ref(a, b)) < 1e-12, (a, b)


def test_damerau_levenshtein_bytes_vs_reference():
    from feature_fabrica_ray.pipelines import damerau_levenshtein_bytes

    # the canonical unrestricted-vs-OSA discriminator: d('ca','abc') == 2
    assert damerau_levenshtein_bytes(b"ca", b"abc") == 2
    assert damerau_levenshtein_bytes(b"ab", b"ba") == 1
    rng = np.random.default_rng(5)
    for _ in range(150):
        a = "".join(rng.choice(list("abc"), size=rng.integers(0, 9)))
        b = "".join(rng.choice(list("abc"), size=rng.integers(0, 9)))
        assert damerau_levenshtein_bytes(a.encode(), b.encode()) \
            == _dl_ref(a, b), (a, b)


def test_string_similarity_pairs_vs_bruteforce(ray_session):
    from feature_fabrica_ray.pipelines import string_similarity_pairs

    df = _editdist_df()
    txt = dict(zip(df["doc_id"], df["text"]))
    ks = sorted(txt)
    # damerau: exact/complete within <= 2
    got = string_similarity_pairs(_ds(df, blocks=3), metric="damerau",
                                  block_dist=2)
    want = {(ks[i], ks[j], _dl_ref(txt[ks[i]], txt[ks[j]]))
            for i in range(len(ks)) for j in range(i + 1, len(ks))
            if _dl_ref(txt[ks[i]], txt[ks[j]]) <= 2}
    assert set(map(tuple, got.values.tolist())) == want
    # transposition pair scores Damerau 1 where Levenshtein says 2
    assert (0, 100, 1) in want
    # jaro_winkler: blocked contract = {lev <= block_dist and sim >= min_sim}
    got = string_similarity_pairs(_ds(df, blocks=3), metric="jaro_winkler",
                                  block_dist=2, min_sim=0.8)
    want = set()
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            if _ed_ref(txt[ks[i]], txt[ks[j]]) <= 2:
                s = _jw_ref(txt[ks[i]], txt[ks[j]])
                if s >= 0.8:
                    want.add((ks[i], ks[j], round(s, 6)))
    assert set(map(tuple, got.values.tolist())) == want
    assert len(want) >= 4


def test_string_similarity_pairs_edges(ray_session):
    from feature_fabrica_ray.pipelines import string_similarity_pairs
    import pytest as _pytest

    none = string_similarity_pairs(
        _ds(pd.DataFrame({"doc_id": [1, 2], "text": ["abcdef", "uvwxyz"]})),
        metric="damerau", block_dist=2)
    assert none.empty and list(none.columns) == ["id_a", "id_b", "dist"]
    none = string_similarity_pairs(
        _ds(pd.DataFrame({"doc_id": [1, 2], "text": ["abcdef", "uvwxyz"]})),
        metric="jaro_winkler", block_dist=2)
    assert none.empty and list(none.columns) == ["id_a", "id_b", "sim"]
    with _pytest.raises(ValueError):
        string_similarity_pairs(
            _ds(pd.DataFrame({"doc_id": [1], "text": ["x"]})),
            metric="cosine")


def test_label_centroids_exact_and_partition_invariant(ray_session):
    from feature_fabrica_ray.pipelines import label_centroids

    rng = np.random.default_rng(9)
    n, d = 200, 8
    labels = rng.integers(0, 5, size=n)
    M = rng.normal(size=(n, d))
    df = pd.DataFrame({"vec_id": np.arange(n), "label": labels,
                       "embedding": [r.astype(np.float32).tolist()
                                     for r in M]})
    got = label_centroids(_ds(df, blocks=4))
    # exact vs numpy per-label mean (float32 storage, float64 math)
    M32 = M.astype(np.float32).astype(np.float64)
    for lab in np.unique(labels):
        want = M32[labels == lab].mean(axis=0)
        sub = got[got["label"] == lab].sort_values("pos")
        assert np.allclose(sub["mean_v"].to_numpy(), want, atol=1e-12)
        assert (sub["n"] == (labels == lab).sum()).all()
    # partition invariance
    g1 = label_centroids(_ds(df, blocks=1))
    assert np.allclose(g1["mean_v"], got["mean_v"]) \
        and (g1[["label", "pos", "n"]].values
             == got[["label", "pos", "n"]].values).all()


def test_topk_grouped_sum_vs_pandas(ray_session):
    from feature_fabrica_ray.pipelines import topk_grouped_sum

    rng = np.random.default_rng(13)
    df = pd.DataFrame({"k": rng.integers(0, 40, size=500),
                       "d": rng.integers(0, 3, size=500),
                       "v": rng.normal(size=500)})
    got = topk_grouped_sum(_ds(df, blocks=4), ["k", "d"], "v", 7)
    want = df.groupby(["k", "d"], as_index=False)["v"].sum() \
        .rename(columns={"v": "sum_v"}) \
        .sort_values(["sum_v", "k", "d"], ascending=[False, True, True],
                     kind="mergesort").head(7).reset_index(drop=True)
    assert np.allclose(got["sum_v"], want["sum_v"])
    assert (got[["k", "d"]].values == want[["k", "d"]].values).all()
    # ascending variant + partition invariance + explicit partitions
    g1 = topk_grouped_sum(_ds(df, blocks=1), ["k"], "v", 5,
                          descending=False)
    g4 = topk_grouped_sum(_ds(df, blocks=4), ["k"], "v", 5,
                          descending=False, num_partitions=8)
    assert np.allclose(g1["sum_v"], g4["sum_v"])
    assert (g1["k"].values == g4["k"].values).all()
    # empty input
    e = topk_grouped_sum(_ds(df.head(0)), ["k"], "v", 5)
    assert e.empty and list(e.columns) == ["k", "sum_v"]


def test_partitions_for_bytes():
    from feature_fabrica_ray.pipelines import partitions_for_bytes
    import os

    assert partitions_for_bytes(10 << 20) == 8          # floor
    assert partitions_for_bytes(10 << 30) == 80         # 10 GiB / 128 MiB
    assert partitions_for_bytes(10**15) == 4096         # ceiling
    assert partitions_for_bytes(None) >= 8              # fallback
    os.environ["FFR_SHUFFLE_PARTITIONS"] = "17"
    try:
        assert partitions_for_bytes(10**15) == 17       # env wins
    finally:
        del os.environ["FFR_SHUFFLE_PARTITIONS"]


def test_stratified_kfold(ray_session):
    """stratified_kfold deals each stratum's rows into k folds with
    exact NTILE balance (fold sizes within a stratum differ by <= 1),
    assignment is a pure function of (stratum, key) — invariant to
    layout — every row keeps exactly one fold in 1..k, and k=1 is the
    identity fold."""
    import numpy as np
    import pandas as pd
    from feature_fabrica_ray.pipelines import stratified_kfold

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "lang": rng.choice(["en", "zh", "es"], 313,
                           p=[0.6, 0.3, 0.1]),
        "doc_id": np.arange(313, dtype=np.int64)})

    out = stratified_kfold(_ds(df, blocks=4), "lang", "doc_id",
                           k=5).to_pandas()
    assert len(out) == len(df)
    assert out["fold"].between(1, 5).all()
    # exact NTILE balance per stratum
    sizes = out.groupby(["lang", "fold"]).size()
    for lang, grp in sizes.groupby(level=0):
        assert grp.max() - grp.min() <= 1
        assert grp.sum() == (df["lang"] == lang).sum()
        assert len(grp) == min(5, grp.sum())
    # layout invariance: same (doc_id -> fold) map at any block count
    one = stratified_kfold(_ds(df, blocks=1), "lang", "doc_id",
                           k=5).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = one.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    k1 = stratified_kfold(_ds(df, blocks=2), "lang", "doc_id",
                          k=1).to_pandas()
    assert (k1["fold"] == 1).all()

    import pytest
    with pytest.raises(ValueError, match="k must be"):
        stratified_kfold(_ds(df), "lang", "doc_id", k=0)


def test_mixture_sample(ray_session):
    """Mixing to target proportions: the binding source is kept whole,
    the realized mixture tracks the target, membership is partition-
    invariant and a pure function of the key, and both hash modes obey
    the same rate computation."""
    import numpy as np
    import pandas as pd
    from feature_fabrica_ray.pipelines import mixture_sample

    rng = np.random.default_rng(3)
    n = {"web": 4000, "wiki": 500, "code": 1500}
    rows = []
    i = 0
    for s, k in n.items():
        for _ in range(k):
            rows.append({"doc_id": i, "source": s})
            i += 1
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=1) \
        .reset_index(drop=True)
    props = {"web": 0.5, "wiki": 0.2, "code": 0.3}
    # binding source: min(n_s/p_s) = wiki (500/0.2=2500) -> kept whole
    out1 = mixture_sample(_ds(df, blocks=1), props).to_pandas()
    out8 = mixture_sample(_ds(df, blocks=8), props).to_pandas()
    a = out1.sort_values("doc_id").reset_index(drop=True)
    b = out8.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)          # partition-invariant
    got = a.groupby("source").size()
    assert got["wiki"] == 500                    # binding source whole
    # realized proportions within sampling noise of the target
    total = got.sum()
    for s, p in props.items():
        assert abs(got[s] / total - p) < 0.05
    # expected totals: t=2500 -> web 1250, code 750 (+-hash noise)
    assert abs(got["web"] - 1250) < 120 and abs(got["code"] - 750) < 100

    # md5 mode matches its documented rate formula exactly
    md5_out = mixture_sample(_ds(df), props, method="md5").to_pandas()
    import hashlib
    t = min(n[s] / props[s] for s in props)
    kept = md5_out.groupby("source").size()
    for s in props:
        thr = int(np.floor(min(1.0, props[s] * t / n[s]) * 16 ** 12))
        expect = sum(
            1 for _, r in df[df["source"] == s].iterrows()
            if int(hashlib.md5(str(r["doc_id"]).encode())
                   .hexdigest()[:12], 16) < thr)
        assert kept.get(s, 0) == expect

    # a source absent from proportions is dropped entirely
    assert set(a["source"]) == set(props)


# ---------------------------------------------------------------------------
# graph null/empty edges (regression: null endpoints used to degrade ids
# to float64 NaN — poisoned labels in CC, ArrowInvalid in triangles —
# and an empty edge set crashed pagerank's size dispatch)
# ---------------------------------------------------------------------------

def test_graph_null_endpoints_dropped(ray_session):
    from feature_fabrica_ray.pipelines.graph import (bfs_hops,
                                                     connected_components,
                                                     pagerank,
                                                     triangle_count)

    df = pd.DataFrame({"a": [1, 1, None, 4, 2, 1],
                       "b": [1, 2, 3, None, 3, 3]}, dtype="Int64")
    cc = connected_components(_ds(df, blocks=2)).to_pandas()
    assert sorted(map(tuple, cc.astype(int).values.tolist())) == \
        [(1, 1), (2, 1), (3, 1)]      # null-endpoint edges dropped

    tri = triangle_count(_ds(df))
    assert sorted(map(tuple, tri.values.tolist())) == \
        [(1, 1), (2, 1), (3, 1)]      # the 1-2-3 triangle survives

    hops = bfs_hops(_ds(df), [1])
    assert sorted(map(tuple, hops.values.tolist())) == \
        [(1, 0), (2, 1), (3, 1)]

    pr = pagerank(_ds(pd.DataFrame({"src": [1, None, 2],
                                    "dst": [2, 2, None]}, dtype="Int64")))
    assert pr["node"].tolist() == [1, 2]
    assert abs(pr["rank"].sum() - 1.0) < 1e-12


def test_graph_empty_edge_set(ray_session):
    from feature_fabrica_ray.pipelines.graph import (connected_components,
                                                     degree_table, pagerank,
                                                     triangle_count)

    e = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                      "b": pd.Series([], dtype="int64")})
    d = pd.DataFrame({"src": pd.Series([], dtype="int64"),
                      "dst": pd.Series([], dtype="int64")})
    assert len(connected_components(_ds(e)).to_pandas()) == 0
    assert len(pagerank(_ds(d))) == 0
    assert len(degree_table(_ds(d))) == 0
    assert len(triangle_count(_ds(e))) == 0


def test_sized_join_sql_aliases(ray_session):
    from feature_fabrica_ray.pipelines.join import sized_join

    L = _ds(pd.DataFrame({"k": [1, 2], "x": ["a", "c"]}))
    R = _ds(pd.DataFrame({"k": [2], "y": ["q"]}))
    out = sized_join(L, R, on="k", how="left").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2]
    assert out["y"].fillna("-").tolist() == ["-", "q"]


def test_leakage_safe_split(ray_session):
    """Near-dup pairs always land on the same split side; assignment is
    layout-invariant and roughly honors the fractions at cluster
    granularity."""
    from feature_fabrica_ray.pipelines import leakage_safe_split

    rows = []
    for i in range(60):
        base = " ".join(f"p{i}w{j}" for j in range(40))
        rows.append({"doc_id": i, "text": base})
        rows.append({"doc_id": i + 100, "text": base + " extra"})
    df = pd.DataFrame(rows)
    out = leakage_safe_split(_ds(df, blocks=4), {"train": 0.7, "test": 0.3},
                             threshold=0.4).to_pandas()
    m = out.set_index("doc_id")["split"]
    assert all(m[i] == m[i + 100] for i in range(60))     # no leakage
    frac = (out["split"] == "train").mean()
    assert 0.4 < frac < 0.95                               # ~0.7 at n=60
    out2 = leakage_safe_split(_ds(df, blocks=7), {"train": 0.7,
                                                  "test": 0.3},
                              threshold=0.4).to_pandas()
    assert out.sort_values("doc_id")["split"].tolist() == \
        out2.sort_values("doc_id")["split"].tolist()       # layout-invariant


def test_markov_kstep(ray_session):
    """markov_kstep matches a dense k-step chain reference to 1e-12,
    conserves probability mass with dangling states, converges to the
    stationary distribution of an ergodic 2-state chain, and handles
    the empty table."""
    from feature_fabrica_ray.pipelines import markov_kstep

    trans = pd.DataFrame({
        "from_type": ["a", "a", "b", "c"],
        "to_type": ["b", "c", "a", "d"],   # d observed only as target
        "n": [3, 1, 2, 5]})
    out = markov_kstep(trans, steps=8)
    assert abs(out["prob"].sum() - 1.0) < 1e-12

    states = ["a", "b", "c", "d"]
    P = np.zeros((4, 4))
    P[0, 1], P[0, 2] = 0.75, 0.25
    P[1, 0] = 1.0
    P[2, 3] = 1.0
    dang = np.array([False, False, False, True])
    pi = np.full(4, 0.25)
    for _ in range(8):
        dm = pi[dang].sum()
        pi = pi @ P + dm / 4
    got = dict(zip(out["state"], out["prob"]))
    for s, v in zip(states, pi):
        assert abs(got[s] - v) < 1e-12

    # ergodic 2-state chain: k-step distribution -> stationary 2/3,1/3
    erg = pd.DataFrame({"from_type": ["x", "x", "y"],
                        "to_type": ["y", "x", "x"], "n": [1, 1, 4]})
    st = markov_kstep(erg, steps=60)
    got = dict(zip(st["state"], st["prob"]))
    assert abs(got["x"] - 2 / 3) < 1e-9 and abs(got["y"] - 1 / 3) < 1e-9

    empty = markov_kstep(pd.DataFrame({"from_type": [], "to_type": [],
                                       "n": []}))
    assert len(empty) == 0


def test_silhouette_simplified(ray_session):
    """silhouette_simplified matches a brute-force centroid reference
    to 1e-12, scores well-separated clusters near 1 and interleaved
    labels near 0, handles the single-label (s=0) convention, and is
    layout-invariant."""
    from feature_fabrica_ray.pipelines import silhouette_simplified

    rng = np.random.default_rng(23)
    a = rng.normal((0, 0), 0.05, (40, 2))
    b = rng.normal((10, 10), 0.05, (40, 2))
    df = pd.DataFrame({
        "vec_id": np.arange(80, dtype=np.int64),
        "embedding": [list(map(float, v)) for v in np.vstack([a, b])],
        "label": np.repeat([0, 1], 40).astype(np.int64)})

    got = silhouette_simplified(_ds(df, blocks=3))
    # brute-force centroid reference
    X = np.vstack([a, b])
    lab = np.repeat([0, 1], 40)
    C = np.stack([X[lab == l].mean(axis=0) for l in (0, 1)])
    D = np.linalg.norm(X[:, None, :] - C[None, :, :], axis=2)
    aa = D[np.arange(80), lab]
    bb = D[np.arange(80), 1 - lab]
    s = (bb - aa) / np.maximum(aa, bb)
    for l in (0, 1):
        assert got.loc[got["label"] == l, "mean_sil"].iloc[0] == \
            pytest.approx(s[lab == l].mean(), abs=1e-12)
    assert (got["mean_sil"] > 0.95).all()      # well-separated
    assert (got["n"] == 40).all()

    one = silhouette_simplified(_ds(df, blocks=1))
    pd.testing.assert_frame_equal(one, got)

    # interleaved labels: silhouette collapses toward (or below) zero
    mixed = df.copy()
    mixed["label"] = (mixed["vec_id"] % 2).astype(np.int64)
    ms = silhouette_simplified(_ds(mixed, blocks=2))
    assert (ms["mean_sil"] < 0.1).all()

    solo = df.copy()
    solo["label"] = np.int64(7)
    ss = silhouette_simplified(_ds(solo))
    assert (ss["mean_sil"] == 0.0).all() and ss["n"].iloc[0] == 80


def test_ares_sample(ray_session):
    """ares_sample is a weight-proportional without-replacement draw:
    exactly k rows, layout/rerun invariant, heavier keys
    overrepresented across disjoint key populations, null/non-positive
    weights excluded, and hash64/md5 modes agree on the invariants."""
    from feature_fabrica_ray.pipelines import ares_sample

    n = 4000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "w": np.where(np.arange(n) % 2 == 0, 10.0, 1.0)})
    df.loc[0, "w"] = np.nan
    df.loc[1, "w"] = -3.0

    for method in ("hash64", "md5"):
        out = ares_sample(_ds(df, blocks=4), "id", "w", k=200,
                          method=method)
        assert len(out) == 200
        assert len(set(out["id"])) == 200          # without replacement
        assert 0 not in set(out["id"]) and 1 not in set(out["id"])
        # heavy keys (w=10) should dominate ~10:1 over light (w=1)
        heavy = (out["id"] % 2 == 0).sum()
        assert heavy > 150
        one = ares_sample(_ds(df, blocks=1), "id", "w", k=200,
                          method=method)
        pd.testing.assert_frame_equal(one, out)

    few = ares_sample(_ds(df.head(5).dropna()), "id", "w", k=100)
    assert len(few) <= 5

    with pytest.raises(ValueError, match="k must be"):
        ares_sample(_ds(df), "id", "w", k=0)


def test_davies_bouldin(ray_session):
    """davies_bouldin matches a brute-force reference to 1e-12,
    separates clean clusters (small r) from interleaved ones (large
    r), is layout-invariant, and yields NULL r on a single label."""
    from feature_fabrica_ray.pipelines import davies_bouldin

    rng = np.random.default_rng(29)
    a = rng.normal((0, 0), 0.1, (30, 2))
    b = rng.normal((8, 8), 0.1, (30, 2))
    c = rng.normal((8.4, 8.4), 0.1, (30, 2))   # c overlaps b
    X = np.vstack([a, b, c])
    lab = np.repeat([0, 1, 2], 30)
    df = pd.DataFrame({"vec_id": np.arange(90, dtype=np.int64),
                       "embedding": [list(map(float, v)) for v in X],
                       "label": lab.astype(np.int64)})

    got = davies_bouldin(_ds(df, blocks=3))
    C = np.stack([X[lab == l].mean(axis=0) for l in (0, 1, 2)])
    scat = np.array([np.linalg.norm(X[lab == l] - C[l], axis=1).mean()
                     for l in (0, 1, 2)])
    Md = np.linalg.norm(C[:, None] - C[None, :], axis=2)
    for i in range(3):
        rs = [(scat[i] + scat[j]) / Md[i, j] for j in range(3) if j != i]
        row = got[got["label"] == i].iloc[0]
        assert row["scatter"] == pytest.approx(scat[i], abs=1e-12)
        assert row["r"] == pytest.approx(max(rs), abs=1e-12)
    # label 0 is clean, labels 1/2 overlap each other: their
    # worst-neighbor ratio is an order of magnitude worse
    r0 = got[got["label"] == 0]["r"].iloc[0]
    assert (got[got["label"] != 0]["r"] > 5 * r0).all()

    one = davies_bouldin(_ds(df, blocks=1))
    pd.testing.assert_frame_equal(one, got)

    solo = df.assign(label=np.int64(3))
    assert davies_bouldin(_ds(solo))["r"].isna().all()


# ---------------------------------------------------------------------------
# round-4 advice regressions
# ---------------------------------------------------------------------------

def test_kendall_sparse_wide_domain(ray_session):
    """A sparse-but-wide joint domain (occupancy under the cell bound,
    grid FAR over it) must take the Fenwick sweep instead of allocating
    an nx*ny dense matrix, and match the dense result exactly."""
    from feature_fabrica_ray.pipelines import kendall_tau

    rng = np.random.default_rng(11)
    # 120 near-monotone continuous-ish pairs: 120 distinct x AND y ->
    # grid 14_400 cells, occupancy 120
    x = np.sort(rng.uniform(0, 1, 120))
    y = x + rng.normal(0, 0.05, 120)
    df = pd.DataFrame({"x": x, "y": y})
    dense = kendall_tau(_ds(df, blocks=3), "x", "y")
    sparse = kendall_tau(_ds(df, blocks=3), "x", "y",
                         max_cells_broadcast=500)   # 120 <= 500 < 14400
    pd.testing.assert_frame_equal(sparse, dense)
    # ties on both sides exercise the tie-correction in the sparse path
    xt = rng.integers(0, 40, 200).astype(float)
    yt = (xt + rng.integers(0, 30, 200)).astype(float)
    dft = pd.DataFrame({"x": xt, "y": yt})
    d2 = kendall_tau(_ds(dft, blocks=4), "x", "y")
    s2 = kendall_tau(_ds(dft, blocks=4), "x", "y",
                     max_cells_broadcast=len(
                         dft.drop_duplicates()) + 1)
    pd.testing.assert_frame_equal(s2, d2)


def test_corr_nan_excluded_like_null(ray_session):
    """Arrow float NaN is VALID (not null) — spearman/kendall must
    exclude NaN pairs like nulls instead of letting NaN keys corrupt
    the rank-histogram shuffle. Built via pa.array directly because
    pandas->Arrow maps NaN to null (which is why tests missed it)."""
    import pyarrow as pa
    from feature_fabrica_ray.pipelines import kendall_tau, spearman_corr

    t = pa.table({"x": pa.array([1.0, 2.0, float("nan"), 3.0, 4.0]),
                  "y": pa.array([2.0, 4.0, 9.0, float("nan"), 8.0])})
    assert t.column("x").null_count == 0       # NaN, not null
    ds = ray.data.from_arrow(t).repartition(2)
    sp = spearman_corr(ds, "x", "y")
    kd = kendall_tau(ds, "x", "y")
    assert sp["n"].iloc[0] == 3 and kd["n"].iloc[0] == 3
    assert sp["spearman_rho"].iloc[0] == pytest.approx(1.0, abs=1e-12)
    assert kd["kendall_tau"].iloc[0] == pytest.approx(1.0, abs=1e-12)


def test_layout_bucket_bounds(ray_session):
    """n_buckets above the 4**bits grid would right-shift by a negative
    count (undefined in numpy) — both layout keys must raise."""
    from feature_fabrica_ray.pipelines import hilbert_key, zorder_key

    df = pd.DataFrame({"x": [0.1, 0.5], "y": [0.2, 0.9]})
    kw = dict(x_lo=0.0, x_hi=1.0, y_lo=0.0, y_hi=1.0, bits=2)
    with pytest.raises(ValueError, match="4\\*\\*bits"):
        zorder_key(_ds(df), "x", "y", n_buckets=32, **kw)
    with pytest.raises(ValueError, match="4\\*\\*bits"):
        hilbert_key(_ds(df), "x", "y", n_buckets=32, **kw)
    # n_buckets == 4**bits is the boundary and must still work
    z = zorder_key(_ds(df), "x", "y", n_buckets=16, **kw).to_pandas()
    h = hilbert_key(_ds(df), "x", "y", n_buckets=16, **kw).to_pandas()
    assert (z["zbucket"] == z["zkey"]).all()
    assert (h["hbucket"] == h["hkey"]).all()


def test_pagerank_negative_weight_raises(ray_session):
    """Negative edge weights flip out-degree signs and silently break
    the probability-distribution invariant — fail fast instead."""
    from feature_fabrica_ray.pipelines import pagerank

    edges = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 1],
                          "w": [1.0, -0.5, 2.0]})
    # the raise happens inside the Ray map task -> RayTaskError wrapper
    with pytest.raises(Exception, match="negative"):
        pagerank(_ds(edges, blocks=2), "src", "dst", weight_col="w")


def test_bucketed_merge_per_bucket_calls(ray_session):
    """The grouped.py merge side runs ONE Python call per hash bucket,
    never per key: a 5000-key input through _bucketed_merge with B=8
    invokes merge_bucket at most 8 times (one row emitted per call)
    while still seeing every key exactly once."""
    from feature_fabrica_ray.pipelines.grouped import (_bucketed_merge,
                                                       _with_shuffle_key)

    n_keys = 5000
    df = pd.DataFrame({"k": np.arange(n_keys, dtype=np.int64),
                       "v": np.ones(n_keys)})
    parts = _ds(df, blocks=4).map_batches(
        lambda t: _with_shuffle_key(t, "k"),
        batch_format="pyarrow", batch_size=None)

    def merge_bucket(d: pd.DataFrame) -> pd.DataFrame:
        # one output row PER INVOCATION -> row count == Python calls
        return pd.DataFrame({"keys_seen": [int(d["k"].nunique())]})

    out = _bucketed_merge(parts, merge_bucket, n_buckets=8)
    assert len(out) <= 8, f"{len(out)} merge calls for 8 buckets"
    assert out["keys_seen"].sum() == n_keys


def test_grouped_merges_high_cardinality(ray_session):
    """Vectorized bucketed merges stay exact at high key cardinality:
    40k keys x 5 rows, every key merged from multiple blocks, checked
    against pandas for moments/mode/distinct-count."""
    from feature_fabrica_ray.pipelines.grouped import (
        distinct_count_per_group, grouped_moments, mode_per_group)

    rng = np.random.default_rng(3)
    n_keys = 40_000
    k = np.repeat(np.arange(n_keys, dtype=np.int64), 5)
    v = rng.normal(size=k.size) * (1 + k % 7)
    df = pd.DataFrame({"k": k, "v": v})
    ds = _ds(df.sample(frac=1.0, random_state=0), blocks=16)

    mom = grouped_moments(ds, "k", "v").set_index("k")
    exp_mean = df.groupby("k")["v"].mean()
    exp_std = df.groupby("k")["v"].std()
    exp_skew = df.groupby("k")["v"].skew()
    assert np.allclose(mom["mean"], exp_mean.loc[mom.index], atol=1e-9)
    assert np.allclose(mom["std"], exp_std.loc[mom.index], atol=1e-9)
    assert np.allclose(mom["skewness"], exp_skew.loc[mom.index],
                       atol=1e-8, equal_nan=True)

    dc = distinct_count_per_group(ds, "k", "v")
    assert len(dc) == n_keys
    assert (dc["n_rows"] == 5).all()

    dfm = pd.DataFrame({"k": k % 1000, "v": (k * 7) % 3})
    md = mode_per_group(_ds(dfm, blocks=8), "k", "v").set_index("k")
    exp_mode = dfm.groupby("k")["v"].agg(
        lambda s: s.value_counts().sort_index().idxmax())
    got = md["mode_v"].astype(np.int64)
    exp_sorted = dfm.groupby(["k", "v"]).size().reset_index(name="c") \
        .sort_values(["v"]).sort_values(["c"], ascending=False,
                                        kind="mergesort") \
        .drop_duplicates("k").set_index("k")["v"]
    assert (got.loc[exp_sorted.index] == exp_sorted).all()
    _ = exp_mode


def test_label_propagation_two_cliques(ray_session):
    """Deterministic LPA: two triangles joined by one bridge edge
    converge to the min node id of each clique; synchronous updates +
    min-label tiebreak make the result layout-invariant."""
    from feature_fabrica_ray.pipelines import label_propagation

    tri1 = [(1, 2), (2, 3), (3, 1)]
    tri2 = [(10, 11), (11, 12), (12, 10)]
    bridge = [(3, 10)]
    und = [(a, b) for a, b in tri1 + tri2 + bridge]
    edges = pd.DataFrame({
        "src": [a for a, b in und] + [b for a, b in und],
        "dst": [b for a, b in und] + [a for a, b in und]})

    out = label_propagation(_ds(edges, blocks=3), iters=4)
    lab = dict(zip(out["node"], out["label"]))
    # clique 1 all agree, clique 2 all agree (the bridge node may sit
    # on either side, but each triangle's non-bridge pair is stable)
    assert lab[1] == lab[2] == 1
    assert lab[11] == lab[12]
    one = label_propagation(_ds(edges, blocks=1), iters=4)
    pd.testing.assert_frame_equal(one, out)

    # isolated-direction sink keeps its own label
    solo = pd.DataFrame({"src": [5], "dst": [6]})
    r = label_propagation(_ds(solo), iters=2)
    m = dict(zip(r["node"], r["label"]))
    assert m[5] == 6 and m[6] == 6  # 6 has no out-edges -> keeps 6

    with pytest.raises(ValueError, match="max_nodes"):
        label_propagation(_ds(edges), max_nodes=3)


def test_heavy_hitters_per_group(ray_session):
    """Per-group SpaceSaving top-N equals exact pandas value_counts
    when k exceeds the group's distinct count (err = 0), with the
    (est desc, str(v) asc) tiebreak, across block layouts."""
    from feature_fabrica_ray.pipelines import heavy_hitters_per_group

    rng = np.random.default_rng(7)
    g = rng.integers(0, 6, 4000)
    v = (g * 100 + rng.integers(0, 12, 4000) ** 2 // 3).astype(np.int64)
    df = pd.DataFrame({"g": g.astype(np.int64), "v": v})
    out = heavy_hitters_per_group(_ds(df, blocks=5), "g", "v",
                                  k=64, top=3)
    assert (out["err"] == 0).all()
    for grp, sub in out.groupby("g"):
        cnt = df[df["g"] == grp]["v"].value_counts()
        exp = sorted(cnt.items(), key=lambda t: (-t[1], str(t[0])))[:3]
        got = list(zip(sub.sort_values("rank")["v"], sub["est"]))
        assert got == [(v_, int(c)) for v_, c in exp], grp
    one = heavy_hitters_per_group(_ds(df, blocks=1), "g", "v",
                                  k=64, top=3)
    pd.testing.assert_frame_equal(one, out)


def test_jsd_segments_properties(ray_session):
    """JSD: 0 for identical slices, ln 2 for disjoint vocabularies,
    symmetric, layout-invariant."""
    from feature_fabrica_ray.pipelines import jsd_segments

    same = pd.DataFrame({"seg": ["a", "b", "a", "b"],
                         "text": ["x y z", "x y z", "y", "y"]})
    r = jsd_segments(_ds(same, blocks=2), "seg", "text", "a", "b")
    assert r["jsd"].iloc[0] == pytest.approx(0.0, abs=1e-9)
    assert r["n_a"].iloc[0] == 4 and r["n_b"].iloc[0] == 4

    disj = pd.DataFrame({"seg": ["a", "b"], "text": ["p q r", "s t u"]})
    r2 = jsd_segments(_ds(disj, blocks=2), "seg", "text", "a", "b")
    assert r2["jsd"].iloc[0] == pytest.approx(np.log(2), abs=1e-6)
    assert r2["vocab"].iloc[0] == 6

    mixed = pd.DataFrame({"seg": ["a", "b", "c"],
                          "text": ["x x y", "x y y", "IGNORED"]})
    ab = jsd_segments(_ds(mixed, blocks=3), "seg", "text", "a", "b")
    ba = jsd_segments(_ds(mixed, blocks=1), "seg", "text", "b", "a")
    assert ab["jsd"].iloc[0] == pytest.approx(ba["jsd"].iloc[0], abs=1e-9)
    assert 0 < ab["jsd"].iloc[0] < np.log(2)


def test_mad_outliers_reference(ray_session):
    """MAD fences match the closed form on a planted-outlier series
    (MAD > 0); NULLs never flag; degenerate MAD=0 flags nothing — BOTH
    when every value ties on the median and when only >=50% do (the
    mz = ±inf case the finite-guard exists for)."""
    from feature_fabrica_ray.pipelines import mad_outliers

    base = np.array([10.0] * 8 + [11, 9, 12, 8, 10.5, 9.5, 1000.0,
                     -500.0])
    df = pd.DataFrame({"event_id": np.arange(base.size, dtype=np.int64),
                       "value": base})
    df.loc[3, "value"] = np.nan
    out = mad_outliers(_ds(df, blocks=3), "value", ["event_id"],
                       k=3.5).to_pandas().sort_values("event_id")
    med = np.nanmedian(df["value"])
    mad = np.nanmedian(np.abs(df["value"] - med))
    assert mad > 0
    mz = 0.6745 * (df["value"] - med) / mad
    exp = df[(np.abs(mz) > 3.5) & df["value"].notna()]
    assert sorted(out["event_id"]) == sorted(exp["event_id"])
    assert {1000.0, -500.0} <= set(out["value"])

    const = pd.DataFrame({"event_id": np.arange(5, dtype=np.int64),
                          "value": np.full(5, 7.0)})
    r = mad_outliers(_ds(const), "value", ["event_id"]).to_pandas()
    assert len(r) == 0

    # MAD == 0 with values != median (>=50% tie on the median): mz is
    # ±inf there — the documented contract flags NOTHING, not everything
    half = pd.DataFrame({"event_id": np.arange(10, dtype=np.int64),
                         "value": np.array([7.0] * 6
                                           + [1.0, 2.0, 3.0, 100.0])})
    r2 = mad_outliers(_ds(half, blocks=2), "value",
                      ["event_id"]).to_pandas()
    assert len(r2) == 0


def test_zonemap_stats_skip_rate(ray_session):
    """Zone maps over a zorder-bucketed layout: clustered layout skips
    buckets for a corner-box predicate; bounds match pandas; a random
    bucket assignment skips nothing."""
    from feature_fabrica_ray.pipelines import zonemap_stats, zorder_key

    rng = np.random.default_rng(12)
    df = pd.DataFrame({"x": rng.uniform(0, 100, 3000),
                       "y": rng.uniform(0, 100, 3000)})
    stamped = zorder_key(_ds(df, blocks=4), "x", "y",
                         x_lo=0.0, x_hi=100.0, y_lo=0.0, y_hi=100.0,
                         bits=4, n_buckets=4)
    zm = zonemap_stats(stamped, "zbucket", ["x", "y"],
                       predicate={"x": (90.0, 100.0)})
    assert zm["n"].sum() == 3000
    # bucket 0/1 hold x in [0, 50) -> must be skippable for x >= 90
    low = zm[zm["zbucket"] < 2]
    assert low["skippable"].all()
    assert (low["x_max"] < 50).all()
    # at least one bucket must actually contain the predicate range
    assert not zm["skippable"].all()
    # exact bounds vs pandas on the stamped frame
    sdf = stamped.to_pandas()
    exp = sdf.groupby("zbucket")["x"].agg(["min", "max"])
    got = zm.set_index("zbucket")
    assert np.allclose(got["x_min"], exp["min"]) \
        and np.allclose(got["x_max"], exp["max"])
    # random single bucket -> nothing skippable
    rnd = df.assign(zbucket=np.zeros(len(df), np.int64))
    zm2 = zonemap_stats(_ds(rnd, blocks=3), "zbucket", ["x"],
                        predicate={"x": (90.0, 100.0)})
    assert not zm2["skippable"].any()


def test_kcenter_sample_coverage(ray_session):
    """Greedy k-center: covers every planted cluster at k = #clusters,
    radius non-increasing after step 1, deterministic across layouts,
    seed = smallest id."""
    from feature_fabrica_ray.pipelines import kcenter_sample

    rng = np.random.default_rng(0)
    centers = np.eye(5) * 10
    lab = rng.integers(0, 5, 120)
    V = centers[lab] + rng.normal(size=(120, 5)) * 0.1
    df = pd.DataFrame({"vec_id": np.arange(120, dtype=np.int64),
                       "embedding": [r.tolist() for r in V]})
    out = kcenter_sample(_ds(df, blocks=5), k=5)
    assert out["step"].tolist() == [0, 1, 2, 3, 4]
    assert out["id"].iloc[0] == 0          # min-id seed
    assert set(lab[out["id"].to_numpy()]) == set(range(5))
    r = out["radius"].to_numpy()[1:]
    assert (np.diff(r) <= 1e-12).all()     # non-increasing
    one = kcenter_sample(_ds(df, blocks=1), k=5)
    pd.testing.assert_frame_equal(one, out)


def test_cusum_changepoint_planted_shift(ray_session):
    """CUSUM finds the planted level shift in daily volume and reports
    the two segment means."""
    from feature_fabrica_ray.pipelines import cusum_changepoint

    # 10 days at 5/day then 10 days at 20/day -> split at day 9
    days = np.concatenate([np.repeat(np.arange(10), 5),
                           np.repeat(np.arange(10, 20), 20)])
    df = pd.DataFrame({"ts": pd.to_datetime(days, unit="D")})
    out = cusum_changepoint(ray.data.from_pandas(df).repartition(3),
                            "ts")
    assert out["split_day"].iloc[0] == pd.Timestamp("1970-01-10")
    assert out["mean_before"].iloc[0] == 5.0
    assert out["mean_after"].iloc[0] == 20.0
    assert out["n"].iloc[0] == 20


def test_upsert_latest_semantics(ray_session):
    """Latest-wins merge: updates override on version, ties go to the
    updates side, new keys insert, untouched keys pass through,
    layout-invariant."""
    from feature_fabrica_ray.pipelines import upsert_latest

    base = pd.DataFrame({"k": [1, 2, 3], "v": [10.0, 20.0, 30.0],
                         "ver": np.array([1, 5, 1], np.int64)})
    upd = pd.DataFrame({"k": [2, 3, 4], "v": [21.0, 31.0, 41.0],
                        "ver": np.array([2, 1, 1], np.int64)})
    out = upsert_latest(_ds(base, blocks=2), _ds(upd, blocks=2),
                        ["k"], "ver").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    m = dict(zip(out["k"], out["v"]))
    assert m[1] == 10.0            # untouched
    assert m[2] == 20.0            # base ver 5 beats update ver 2
    assert m[3] == 31.0            # tie at ver 1 -> updates side wins
    assert m[4] == 41.0            # insert
    assert len(out) == 4
    one = upsert_latest(_ds(base), _ds(upd), ["k"], "ver").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, out)


def test_volume_peaks_and_harmonic(ray_session):
    """volume_peaks finds exactly the strict local maxima (endpoints
    excluded); harmonic_centrality matches hand-computed 1/d sums on a
    path graph."""
    from feature_fabrica_ray.pipelines import (harmonic_centrality,
                                               volume_peaks)

    # counts per day: 1 3 2 5 5 4 -> peaks at day1 (3>1,3>2) only
    # (5,5 plateau is not strict)
    counts = [1, 3, 2, 5, 5, 4]
    days = np.repeat(np.arange(6), counts)
    df = pd.DataFrame({"ts": pd.to_datetime(days, unit="D")})
    out = volume_peaks(_ds(df, blocks=3), "ts")
    assert out["day"].tolist() == [pd.Timestamp("1970-01-02")]
    assert out["n"].tolist() == [3]

    # path graph 1-2-3-4: harmonic(1) = 1 + 1/2 + 1/3
    edges = pd.DataFrame({"a": [1, 2, 3], "b": [2, 3, 4]})
    h = harmonic_centrality(_ds(edges, blocks=2), [1, 2], "a", "b")
    assert h["seed"].tolist() == [1, 2]
    assert h["harmonic"].iloc[0] == pytest.approx(1 + 0.5 + 1 / 3,
                                                  abs=1e-6)
    assert h["harmonic"].iloc[1] == pytest.approx(1 + 1 + 0.5, abs=1e-6)
    assert h["n_reached"].tolist() == [3, 3]


def test_theil_sen_slope_planted(ray_session):
    """Theil-Sen on a clean linear ramp recovers the exact slope; one
    burst day cannot drag the median (robustness vs the mean-based
    fit)."""
    from feature_fabrica_ray.pipelines import theil_sen_slope

    # day k has 10 + 2k events -> slope exactly 2
    counts = 10 + 2 * np.arange(12)
    days = np.repeat(np.arange(12), counts)
    df = pd.DataFrame({"ts": pd.to_datetime(days, unit="D")})
    out = theil_sen_slope(_ds(df, blocks=3), "ts")
    assert out["slope"].iloc[0] == 2.0
    assert out["n"].iloc[0] == 12
    assert out["n_pairs"].iloc[0] == 12 * 11 // 2
    # burst: one day at 500 events barely moves the median slope
    counts2 = counts.copy()
    counts2[6] = 500
    days2 = np.repeat(np.arange(12), counts2)
    burst = theil_sen_slope(
        _ds(pd.DataFrame({"ts": pd.to_datetime(days2, unit="D")}),
            blocks=3), "ts")
    assert abs(burst["slope"].iloc[0] - 2.0) < 3.0


def test_reciprocity_distributed(ray_session):
    """Reciprocity over a planted graph: 2 mutual pairs out of 5
    distinct directed edges -> 4/5; self-loops and duplicate edges
    ignored; layout invariance."""
    from feature_fabrica_ray.pipelines import reciprocity

    e = pd.DataFrame({"src": [1, 2, 3, 4, 5, 5, 1, 1],
                      "dst": [2, 1, 4, 3, 6, 6, 2, 1]})
    # distinct directed: (1,2),(2,1),(3,4),(4,3),(5,6) -> recip = 4
    out = reciprocity(_ds(e, blocks=3), "src", "dst")
    assert out["n_edges"].iloc[0] == 5
    assert out["n_reciprocal"].iloc[0] == 4
    assert out["reciprocity"].iloc[0] == 0.8
    one = reciprocity(_ds(e), "src", "dst")
    pd.testing.assert_frame_equal(one, out)


def test_winnowing_copy_detection(ray_session):
    """Winnowing fingerprints: an exact copy shares ALL fingerprints,
    an edited copy shares most, unrelated docs share ~none; selection
    is layout-invariant and every doc fingerprints (even short ones)."""
    from feature_fabrica_ray.pipelines import (winnowing_fingerprints,
                                               winnowing_pairs)

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away home tonight for dinner")
    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [base,
                 base + " with one small edit",
                 "completely different content about ray data and "
                 "arrow record batches streaming through the engine",
                 base,
                 "tiny"]})
    pairs = winnowing_pairs(_ds(docs, blocks=3), k=8, w=4,
                            min_shared=3)
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 3) in got           # exact copy
    assert (0, 1) in got           # edited copy
    assert not any(2 in p for p in got)   # unrelated never pairs
    one = winnowing_pairs(_ds(docs), k=8, w=4, min_shared=3)
    pd.testing.assert_frame_equal(one, pairs)

    fps = winnowing_fingerprints(_ds(docs, blocks=2), k=8, w=4) \
        .to_pandas()
    assert set(fps["doc_id"]) == set(range(5))   # 'tiny' fingerprints too
    a = set(fps[fps["doc_id"] == 0]["fp"])
    b = set(fps[fps["doc_id"] == 3]["fp"])
    assert a == b                   # identical docs -> identical prints


def test_golden_record_bucketed_shape(ray_session, monkeypatch):
    """golden_record runs through events.bucketed_by_key on the
    combined null-safe key (one Python call per hash bucket, never one
    map_groups call per entity key): the spy proves the route, and a
    5000-key frame resolves to exactly one survivor row per key with
    per-column first-non-null survivorship intact."""
    from feature_fabrica_ray.pipelines import events, setops

    captured = {}
    real = events.bucketed_by_key

    def spy(ds, key_col, per_bucket, n_buckets=None):
        captured["key_col"] = key_col
        return real(ds, key_col, per_bucket, n_buckets)

    monkeypatch.setattr(events, "bucketed_by_key", spy)

    rng = np.random.default_rng(41)
    n_keys = 5000
    k = np.repeat(np.arange(n_keys, dtype=np.int64), 2)
    prio = np.tile(np.array([2, 1], np.int64), n_keys)
    email = np.where(np.arange(2 * n_keys) % 2 == 0, None, "low@x")
    out = setops.golden_record(
        _ds(pd.DataFrame({"k": k, "prio": prio, "email": email}),
            blocks=4), ["k"], "prio", ["email"]).to_pandas()
    assert captured["key_col"] == "__gkey"
    assert len(out) == n_keys
    # high-prio row's email is null everywhere -> survivor must fall
    # through to the low-prio row's value for every key
    assert (out["email"] == "low@x").all()


def test_winnowing_short_block_multi_doc(ray_session):
    """A block whose COMBINED k-gram count is < w but holds several
    short docs gives every doc its own fingerprint (the n < w branch
    must apply the per-doc rightmost-min rule, not one global min)."""
    from feature_fabrica_ray.pipelines import winnowing_fingerprints

    # k=8 -> an 8-char doc has exactly 1 k-gram; two docs -> n=2 < w=4
    df = pd.DataFrame({"doc_id": np.array([1, 2], np.int64),
                       "text": ["abcdefgh", "zyxwvuts"]})
    out = winnowing_fingerprints(_ds(df, blocks=1), "text", "doc_id",
                                 k=8, w=4).to_pandas()
    assert sorted(out["doc_id"].unique()) == [1, 2]
    assert len(out) == 2
    # and the fingerprints differ (different content)
    assert out.groupby("doc_id")["fp"].first().nunique() == 2


def test_minicodec_png_filters_1_3_4():
    """_decode_png reconstructs rows filtered with Sub/Up/Average/Paeth
    (the vectorized unfilter paths) bit-exactly: a PNG is hand-built
    with one filter type per row from the scalar PNG-spec ENCODE
    direction, then decoded and compared to the source pixels."""
    import struct
    import zlib

    from feature_fabrica_ray.pipelines._minicodec import (_chunk,
                                                          _decode_png)

    rng = np.random.default_rng(99)
    h, w, ch = 8, 13, 3
    px = rng.integers(0, 256, (h, w * ch), dtype=np.int64)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
        if pa_ <= pb_ and pa_ <= pc_:
            return a
        return b if pb_ <= pc_ else c

    filters = [0, 1, 2, 3, 4, 1, 3, 4]       # every type, repeated
    raw = bytearray()
    for y in range(h):
        f = filters[y]
        raw.append(f)
        for i in range(w * ch):
            a = px[y, i - ch] if i >= ch else 0
            b = px[y - 1, i] if y > 0 else 0
            c = px[y - 1, i - ch] if (y > 0 and i >= ch) else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2,
                    4: paeth(a, b, c)}[f]
            raw.append((px[y, i] - pred) & 0xFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)   # RGB
    png = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(bytes(raw)))
           + _chunk(b"IEND", b""))
    img = _decode_png(png)
    assert img.mode == "RGB"
    assert np.array_equal(np.asarray(img.arr, np.int64),
                          px.reshape(h, w, ch))


def test_minijpeg_spec_bitstream_decode():
    """The JPEG decoder reproduces a HAND-BUILT baseline bitstream from
    the T.81 spec alone (no round-trip with our own encoder): one 8x8
    grayscale block, quant table all ones, a 1-bit DC Huffman code for
    size 7 followed by the 7 magnitude bits of coefficient 64, 1-bit
    EOB — the DC-only IDCT gives 64/8 + 128 = a constant 136 plane."""
    import struct

    from feature_fabrica_ray.pipelines._minijpeg import decode_jpeg

    def seg(marker, body):
        return marker + struct.pack(">H", len(body) + 2) + body

    jpg = b"\xFF\xD8"
    jpg += seg(b"\xFF\xDB", b"\x00" + bytes([1] * 64))
    jpg += seg(b"\xFF\xC0", struct.pack(">BHHB", 8, 8, 8, 1)
               + bytes([1, 0x11, 0]))
    jpg += seg(b"\xFF\xC4", bytes([0x00]) + bytes([1] + [0] * 15)
               + bytes([7]))
    jpg += seg(b"\xFF\xC4", bytes([0x10]) + bytes([1] + [0] * 15)
               + bytes([0]))
    jpg += seg(b"\xFF\xDA", bytes([1, 1, 0x00]) + b"\x00\x3F\x00")
    jpg += bytes([0b01000000, 0b01111111])     # DC('0'+1000000) EOB('0')
    jpg += b"\xFF\xD9"
    arr, mode = decode_jpeg(jpg)
    assert mode == "L" and arr.shape == (8, 8)
    assert np.unique(arr).tolist() == [136]


def test_minijpeg_roundtrip_and_guards():
    """Baseline JPEG encode->decode round trip: constant images are
    exact, a smooth gradient lands within quantization error at q95,
    odd (non-multiple-of-8) sizes pad/crop correctly, and progressive
    (SOF2) input fails loud with the profile named."""
    from feature_fabrica_ray.pipelines._minijpeg import (decode_jpeg,
                                                         encode_jpeg)

    a = np.full((16, 24), 128, np.uint8)
    arr, mode = decode_jpeg(encode_jpeg(a, 90))
    assert mode == "L" and np.array_equal(arr, a)

    h, w = 32, 48
    g = np.zeros((h, w, 3), np.uint8)
    g[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    g[:, :, 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    g[:, :, 2] = 77
    arr, mode = decode_jpeg(encode_jpeg(g, 95))
    assert mode == "RGB" and arr.shape == g.shape
    assert np.abs(arr.astype(int) - g.astype(int)).max() <= 4

    rng = np.random.default_rng(6)
    o = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    arr, mode = decode_jpeg(encode_jpeg(o, 90))
    assert arr.shape == (13, 21)

    prog = bytearray(encode_jpeg(a, 75))
    idx = bytes(prog).find(b"\xFF\xC0")
    prog[idx + 1] = 0xC2                      # flip SOF0 -> SOF2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(prog))


def test_real_codec_jpeg_decode(ray_session):
    """DecodeImageFeatures / PHashImage on an actual baseline JPEG
    payload (the majority real-world format): width/height are exact
    and mean/entropy match the decoded-pixel reference; the JPEG's
    dHash lands within hamming 6 of the lossless PNG of the same
    pixels."""
    import io

    import pyarrow as pa

    from feature_fabrica_ray.pipelines import (DecodeImageFeatures,
                                               PHashImage)
    from feature_fabrica_ray.pipelines._minicodec import MiniImage

    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    px[:, :, 0] = np.linspace(0, 255, 40, dtype=np.uint8)[None, :]
    img = MiniImage.fromarray(px, "RGB")
    jpg_buf, png_buf = io.BytesIO(), io.BytesIO()
    img.save(jpg_buf, format="JPEG", quality=95)
    img.save(png_buf, format="PNG")

    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([jpg_buf.getvalue(),
                                       png_buf.getvalue()], pa.binary())})
    out = ray.data.from_arrow(t).map_batches(
        DecodeImageFeatures, concurrency=1, batch_size=None,
        batch_format="pyarrow").to_pandas().sort_values("media_id")
    assert (out["width"] == 40).all() and (out["height"] == 24).all()

    dec = MiniImage.open(io.BytesIO(jpg_buf.getvalue()))
    gray = np.asarray(dec.convert("L"), dtype=np.float64)
    p = np.bincount(gray.astype(np.int64).ravel(), minlength=256) / gray.size
    ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
    row = out[out["media_id"] == 1].iloc[0]
    assert row["mean_byte"] == pytest.approx(gray.mean(), abs=1e-6)
    assert row["byte_entropy"] == pytest.approx(ent, abs=1e-6)

    ph = ray.data.from_arrow(t).map_batches(
        PHashImage, concurrency=1, batch_size=None,
        batch_format="pyarrow").to_pandas() \
        .sort_values("media_id")["phash"].tolist()
    ham = bin(int(np.uint64(ph[0])) ^ int(np.uint64(ph[1]))).count("1")
    assert ham <= 6            # same pixels up to q95 loss
    assert ph[0] != 0


def test_mad_robust_tdigest_degrade(ray_session):
    """mad_outliers / robust_scale past the distinct-value guard:
    exact=True raises unchanged; the default degrades LOUDLY to the
    t-digest fit and lands within sketch resolution of the exact
    answer on a continuous all-distinct corpus."""
    from feature_fabrica_ray.pipelines import mad_outliers, robust_scale

    rng = np.random.default_rng(17)
    n = 30_000
    x = rng.normal(50, 10, n)
    x[:30] += 500.0                               # planted outliers
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64),
                       "value": x})

    with pytest.raises(ValueError, match="distinct"):
        mad_outliers(_ds(df), "value", ["event_id"], max_distinct=100,
                     exact=True)
    with pytest.raises(ValueError, match="distinct"):
        robust_scale(_ds(df), "value", max_distinct=100, exact=True)

    med = np.median(x)
    mad = np.median(np.abs(x - med))
    mz = 0.6745 * (x - med) / mad
    exact_ids = set(df.loc[np.abs(mz) > 3.5, "event_id"])
    with pytest.warns(RuntimeWarning, match="t-digest"):
        out = mad_outliers(_ds(df, blocks=4), "value", ["event_id"],
                           k=3.5, max_distinct=100).to_pandas()
    got_ids = set(out["event_id"])
    # sketch fences may flip rows hugging the cutoff, never the planted
    # +500 spikes, and the symmetric difference stays tiny
    assert set(range(30)) <= got_ids
    assert len(got_ids ^ exact_ids) <= max(3, n // 1000)

    with pytest.warns(RuntimeWarning, match="t-digest"):
        rs = robust_scale(_ds(df, blocks=4), "value",
                          max_distinct=100).to_pandas()
    q25, q75 = np.percentile(x, [25, 75])
    exact_rs = (x - med) / (q75 - q25)
    err = np.abs(rs.sort_values("event_id")["robust"].to_numpy()
                 - exact_rs)
    assert np.nanmax(err) < 0.05


def test_minijpeg_noninterleaved_fails_loud():
    """A legal baseline stream whose SOS covers fewer components than
    the frame (separate per-component scans) must raise the documented
    precise ValueError, never a bare KeyError from the MCU loop."""
    from feature_fabrica_ray.pipelines._minijpeg import (decode_jpeg,
                                                         encode_jpeg)

    rgb = np.zeros((8, 8, 3), np.uint8)
    data = bytearray(encode_jpeg(rgb, 75))
    # rewrite the SOS to cover ONLY component 1 (Y): find FFDA segment
    i = bytes(data).find(b"\xFF\xDA")
    # original SOS body: [len2][ns=3][1,0x00][2,0x11][3,0x11][ss se ah]
    new_body = bytes([0, 8, 1, 1, 0x00, 0x00, 0x3F, 0x00])
    data[i + 2:i + 2 + 12] = new_body
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(bytes(data))


def test_mad_outliers_inf_value_still_flags(ray_session):
    """A genuine +/-inf VALUE with MAD > 0 is the most extreme outlier
    possible and must flag (the MAD==0 degenerate guard is conditioned
    on the fitted MAD, not on mz finiteness)."""
    from feature_fabrica_ray.pipelines import mad_outliers

    df = pd.DataFrame({"event_id": np.arange(7, dtype=np.int64),
                       "value": [1.0, 2.0, 3.0, 4.0, 5.0, np.inf,
                                 100.0]})
    out = mad_outliers(_ds(df, blocks=2), "value", ["event_id"],
                       k=3.5).to_pandas()
    got = set(out["event_id"])
    assert 5 in got and 6 in got        # inf AND the finite outlier
    assert not ({0, 1, 2, 3, 4} & got)


def test_minijpeg_roundtrip_property():
    """Property: for ANY uint8 image (gray or RGB, any size 1..40 on a
    side incl. non-multiples of 8) and any quality, encode->decode
    preserves shape and mode, output is valid uint8, and at q=100 a
    SMOOTH image (constant) is reconstructed exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from feature_fabrica_ray.pipelines._minijpeg import (decode_jpeg,
                                                         encode_jpeg)

    @settings(max_examples=25, deadline=None)
    @given(h=st.integers(1, 40), w=st.integers(1, 40),
           ch=st.sampled_from([1, 3]), q=st.integers(1, 100),
           seed=st.integers(0, 2**31 - 1))
    def inner(h, w, ch, q, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if ch == 1 else (h, w, 3)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        arr, mode = decode_jpeg(encode_jpeg(img, q))
        assert arr.shape == shape
        assert mode == ("L" if ch == 1 else "RGB")
        assert arr.dtype == np.uint8
        const = np.full(shape, int(rng.integers(0, 256)), np.uint8)
        carr, _ = decode_jpeg(encode_jpeg(const, 100))
        # constant blocks are DC-only: quantization of a pure-DC block
        # at q=100 (flat table of 1s) reproduces the level exactly up
        # to the +-1 of the DC rounding
        assert np.abs(carr.astype(int) - const.astype(int)).max() <= 1

    inner()


def _lzw_encode_ref(idx, min_code):
    """Independent reference GIF-LZW encoder (dictionary growth, width
    escalation, 4096 reset) — so decoder tests don't round-trip through
    the trivial clear-code-per-symbol encoder."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    codes = [(clear, width)]
    cur = b""
    for v in idx:
        nxt = cur + bytes([v])
        if nxt in table:
            cur = nxt
            continue
        codes.append((table[cur], width))
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code == 4097:
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        cur = bytes([v])
    if cur:
        codes.append((table[cur], width))
    codes.append((end, width))
    bitbuf = nbits = 0
    out = bytearray()
    for c, wdt in codes:
        bitbuf |= c << nbits
        nbits += wdt
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _wrap_gif(body, pal, w, h, iflags=0, left=0, top=0, fw=None,
              fh=None, min_code=3, screen=None):
    import struct
    fw = w if fw is None else fw
    fh = h if fh is None else fh
    sw, sh = screen or (w, h)
    bits = max(int(np.ceil(np.log2(len(pal)))), 1)
    gif = bytearray(b"GIF89a") + struct.pack(
        "<HHBBB", sw, sh, 0x80 | (bits - 1), 0, 0) + pal.tobytes()
    gif += b"\x2C" + struct.pack("<HHHHB", left, top, fw, fh, iflags) \
        + bytes([min_code])
    for i in range(0, len(body), 255):
        c = body[i:i + 255]
        gif.append(len(c))
        gif += c
    gif += b"\x00\x3B"
    return bytes(gif)


def test_minigif_decode_spec_paths():
    """GIF decoder against an INDEPENDENT reference LZW encoder (real
    dictionary growth + width escalation, not the trivial clear-per-
    symbol stream): exact pixels, interlaced row order restored, a
    subframe composites onto the background color, >256-color encode
    and truncated streams fail loud."""
    from feature_fabrica_ray.pipelines._minigif import (decode_gif,
                                                        encode_gif)

    rng = np.random.default_rng(3)
    pal = np.zeros((8, 3), np.uint8)
    pal[:5] = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    h, w = 31, 37
    idx = rng.integers(0, 5, (h, w)).astype(np.uint8)
    body = _lzw_encode_ref(idx.ravel().tolist(), 3)
    arr, mode = decode_gif(_wrap_gif(body, pal, w, h))
    assert mode == "RGB" and np.array_equal(arr, pal[idx])

    # interlaced: rows stored in 8/8/4/2 pass order
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    body_i = _lzw_encode_ref(idx[order].ravel().tolist(), 3)
    arr_i, _ = decode_gif(_wrap_gif(body_i, pal, w, h, iflags=0x40))
    assert np.array_equal(arr_i, pal[idx])

    # subframe at (3, 2) on a 12x9 screen -> background fills the rest
    sub = idx[:4, :5]
    body_s = _lzw_encode_ref(sub.ravel().tolist(), 3)
    arr_s, _ = decode_gif(_wrap_gif(body_s, pal, w, h, left=3, top=2,
                                    fw=5, fh=4, screen=(12, 9)))
    assert arr_s.shape == (9, 12, 3)
    assert np.array_equal(arr_s[2:6, 3:8], pal[sub])
    assert (arr_s[0, 0] == pal[0]).all()       # bg color index 0

    with pytest.raises(ValueError, match="256"):
        p = np.arange(24 * 24, dtype=np.int64)
        many = np.stack([p % 256, p // 256, np.full_like(p, 7)],
                        axis=1).astype(np.uint8).reshape(24, 24, 3)
        encode_gif(many)                       # 576 distinct colors

    with pytest.raises(ValueError, match="ended after"):
        decode_gif(_wrap_gif(body[: len(body) // 4], pal, w, h))


def test_minigif_roundtrip_and_decode_stage(ray_session):
    """Lossless encode->decode round trip for any <=256-color image,
    and a GIF payload flows through the actor-pool DecodeImageFeatures
    stage with exact width/height and decoded-pixel stats."""
    import io

    import pyarrow as pa

    from feature_fabrica_ray.pipelines import DecodeImageFeatures
    from feature_fabrica_ray.pipelines._minicodec import MiniImage
    from feature_fabrica_ray.pipelines._minigif import (decode_gif,
                                                        encode_gif)

    rng = np.random.default_rng(8)
    palette = rng.integers(0, 256, (11, 3), dtype=np.uint8)
    img = palette[rng.integers(0, 11, (24, 40))]
    arr, mode = decode_gif(encode_gif(img))
    assert mode == "RGB" and np.array_equal(arr, img)

    buf = io.BytesIO()
    MiniImage.fromarray(img, "RGB").save(buf, format="GIF")
    t = pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array([buf.getvalue()], pa.binary())})
    out = ray.data.from_arrow(t).map_batches(
        DecodeImageFeatures, concurrency=1, batch_size=None,
        batch_format="pyarrow").to_pandas()
    assert (out["width"].iloc[0], out["height"].iloc[0]) == (40, 24)
    gray = np.asarray(MiniImage.fromarray(img, "RGB").convert("L"),
                      dtype=np.float64)
    assert out["mean_byte"].iloc[0] == pytest.approx(gray.mean(),
                                                     abs=1e-6)


def test_score_curves_reference(ray_session):
    """score_curves matches a brute-force threshold sweep exactly
    (tp/fp/tpr/fpr/precision/lift at every distinct score), excludes
    null rows, is layout invariant, and handles the degenerate
    no-positives input (NaN tpr/lift, fpr still defined)."""
    from feature_fabrica_ray.pipelines import score_curves

    rng = np.random.default_rng(12)
    n = 400
    score = np.round(rng.uniform(0, 1, n), 2)   # ties guaranteed
    y = (rng.uniform(0, 1, n) < score).astype(np.int64)  # informative
    df = pd.DataFrame({"y": y, "s": score})
    df.loc[5, "s"] = np.nan
    df.loc[7, "y"] = None
    ok = df.dropna()
    P = int(ok["y"].sum())
    N = len(ok) - P
    T = len(ok)

    for blocks in (1, 4):
        out = score_curves(_ds(df, blocks=blocks), "y", "s") \
            .reset_index(drop=True)
        thrs = np.sort(ok["s"].unique())[::-1]
        assert out["thr"].tolist() == thrs.tolist()
        for _, row in out.iloc[[0, len(out) // 2, -1]].iterrows():
            sel = ok[ok["s"] >= row["thr"]]
            tp = int(sel["y"].sum())
            fp = len(sel) - tp
            assert (row["tp"], row["fp"]) == (tp, fp)
            assert row["tpr"] == pytest.approx(tp / P, abs=1e-6)
            assert row["fpr"] == pytest.approx(fp / N, abs=1e-6)
            assert row["precision"] == pytest.approx(tp / len(sel),
                                                     abs=1e-6)
            assert row["lift"] == pytest.approx(
                (tp / len(sel)) / (P / T), abs=1e-6)
        # curve endpoints: last row targets everything
        assert out["frac_targeted"].iloc[-1] == 1.0
        assert out["tp"].iloc[-1] == P and out["fp"].iloc[-1] == N

    nopos = pd.DataFrame({"y": np.zeros(10, np.int64),
                          "s": np.arange(10, dtype=np.float64)})
    out0 = score_curves(_ds(nopos), "y", "s")
    assert out0["tpr"].isna().all() and out0["lift"].isna().all()
    assert out0["fpr"].iloc[-1] == 1.0

    with pytest.raises(ValueError, match="distinct"):
        score_curves(_ds(df), "y", "s", max_distinct=3)


def test_score_summary_reference(ray_session):
    """score_summary's AUC equals the Mann-Whitney probability (ties
    half-credit) computed brute-force, AP equals the sklearn-style
    step sum, perfect/anti-perfect scores give 1/0, and a single-class
    input degrades to NULL metrics."""
    from feature_fabrica_ray.pipelines import score_summary

    rng = np.random.default_rng(44)
    n = 300
    s = np.round(rng.uniform(0, 1, n), 2)
    y = (rng.uniform(0, 1, n) < s).astype(np.int64)
    df = pd.DataFrame({"y": y, "s": s})
    out = score_summary(_ds(df, blocks=3), "y", "s")

    pos_s = s[y == 1]
    neg_s = s[y == 0]
    gt = (pos_s[:, None] > neg_s[None, :]).sum()
    eq = (pos_s[:, None] == neg_s[None, :]).sum()
    auc_ref = (gt + 0.5 * eq) / (len(pos_s) * len(neg_s))
    assert out["roc_auc"].iloc[0] == pytest.approx(auc_ref, abs=1e-6)

    # AP reference: precision at each positive's rank over desc scores
    thrs = np.sort(np.unique(s))[::-1]
    P = int(y.sum())
    prev_tp, ap_ref = 0, 0.0
    for t in thrs:
        sel = s >= t
        tp = int(y[sel].sum())
        ap_ref += (tp - prev_tp) / P * (tp / sel.sum())
        prev_tp = tp
    assert out["avg_precision"].iloc[0] == pytest.approx(ap_ref,
                                                         abs=1e-6)
    assert out["n"].iloc[0] == n and out["n_pos"].iloc[0] == P

    sep = pd.DataFrame({"y": [0] * 5 + [1] * 5,
                        "s": np.arange(10, dtype=np.float64)})
    assert score_summary(_ds(sep), "y", "s")["roc_auc"].iloc[0] == 1.0
    anti = sep.assign(s=sep["s"].iloc[::-1].to_numpy())
    assert score_summary(_ds(anti), "y", "s")["roc_auc"].iloc[0] == 0.0

    onecls = pd.DataFrame({"y": np.ones(6, np.int64),
                           "s": np.arange(6, dtype=np.float64)})
    r = score_summary(_ds(onecls), "y", "s")
    assert pd.isna(r["roc_auc"].iloc[0])
    assert r["avg_precision"].iloc[0] == 1.0


def test_score_summary_by_group(ray_session):
    """Per-group AUC/AP equals score_summary run on each slice, null
    groups form their own group, single-class groups give NULL AUC,
    and the result is layout invariant."""
    from feature_fabrica_ray.pipelines import (score_summary,
                                               score_summary_by_group)

    rng = np.random.default_rng(9)
    n = 1200
    g = rng.choice(["a", "b"], n).astype(object)
    g[:40] = None                           # planted null group
    s = np.round(rng.uniform(0, 1, n), 2)
    y = (rng.uniform(0, 1, n) < np.where(
        pd.isna(g), 0.5, np.where(g == "a", s, 0.5))).astype(np.int64)
    df = pd.DataFrame({"g": g, "y": y, "s": s})

    outs = [score_summary_by_group(_ds(df, blocks=b), "g", "y", "s")
            for b in (1, 4)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    assert out["g"].isna().sum() == 1       # null group present
    for key in ("a", "b"):
        ref = score_summary(_ds(df[df["g"] == key]), "y", "s")
        row = out[out["g"] == key].iloc[0]
        assert row["roc_auc"] == ref["roc_auc"].iloc[0]
        assert row["avg_precision"] == ref["avg_precision"].iloc[0]
        assert row["n"] == len(df[df["g"] == key])
    nrow = out[out["g"].isna()].iloc[0]
    refn = score_summary(_ds(df[df["g"].isna()]), "y", "s")
    assert nrow["roc_auc"] == refn["roc_auc"].iloc[0]

    onec = pd.DataFrame({"g": ["x"] * 6 + ["z"] * 6,
                         "y": [1] * 6 + [0, 1, 0, 1, 0, 1],
                         "s": np.arange(12, dtype=np.float64)})
    r = score_summary_by_group(_ds(onec, blocks=2), "g", "y", "s")
    assert pd.isna(r[r["g"] == "x"]["roc_auc"].iloc[0])
    assert np.isfinite(r[r["g"] == "z"]["roc_auc"].iloc[0])


def test_score_summary_by_group_typed_key(ray_session):
    """The group column keeps its ORIGINAL dtype: an int64 segment key
    comes back int64 and numerically sorted (2 before 10), never
    stringified/lexicographic."""
    from feature_fabrica_ray.pipelines import (score_summary,
                                               score_summary_by_group)

    rng = np.random.default_rng(5)
    n = 400
    g = rng.choice([2, 10], n).astype(np.int64)
    s = np.round(rng.uniform(0, 1, n), 2)
    y = (rng.uniform(0, 1, n) < np.where(g == 2, s, 0.5)).astype(np.int64)
    df = pd.DataFrame({"g": g, "y": y, "s": s})
    out = score_summary_by_group(_ds(df, blocks=3), "g", "y", "s")
    assert out["g"].dtype == np.int64
    assert out["g"].tolist() == [2, 10]       # numeric order
    ref = score_summary(_ds(df[df["g"] == 2]), "y", "s")
    assert out.iloc[0]["roc_auc"] == ref["roc_auc"].iloc[0]


def test_minigif_lzw_property():
    """Property: decode inverts an independent spec LZW encoder for
    random index streams (random alphabet sizes force the width-growth
    and 4096-reset paths at larger n)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from feature_fabrica_ray.pipelines._minigif import _lzw_decode

    @settings(max_examples=30, deadline=None)
    @given(ncolors=st.integers(2, 64), n=st.integers(1, 4000),
           seed=st.integers(0, 2**31 - 1))
    def inner(ncolors, n, seed):
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, ncolors, n).astype(np.uint8).tolist()
        min_code = max(2, int(np.ceil(np.log2(ncolors))))
        body = _lzw_encode_ref(idx, min_code)
        out = _lzw_decode(min_code, body, n)
        assert out.tolist() == idx

    inner()


def test_budget_select(ray_session):
    """Greedy budget selection matches the brute-force sort+cumsum
    reference (inclusive cutoff), excludes null value/cost rows,
    floors zero costs in the ratio, keeps nothing at budget=0, and is
    layout invariant."""
    from feature_fabrica_ray.pipelines import budget_select

    rng = np.random.default_rng(31)
    n = 500
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "val": rng.integers(1, 50, n).astype("float64"),
        "cost": rng.integers(1, 200, n).astype("float64")})
    df.loc[3, "val"] = np.nan
    df.loc[7, "cost"] = np.nan
    df.loc[11, "cost"] = 0.0               # ratio floor at 1
    budget = 5000.0

    ok = df.dropna().copy()
    ok["ratio"] = ok["val"] / np.maximum(ok["cost"], 1.0)
    ok = ok.sort_values(["ratio", "id"], ascending=[False, True],
                        kind="mergesort")
    ok["cum"] = ok["cost"].cumsum()
    want = ok[ok["cum"] <= budget]

    for blocks in (1, 4):
        out = budget_select(_ds(df, blocks=blocks), "val", "cost",
                            budget, "id").to_pandas() \
            .sort_values("id").reset_index(drop=True)
        ref = want.sort_values("id").reset_index(drop=True)
        assert out["id"].tolist() == ref["id"].tolist()
        assert np.allclose(
            out.set_index("id")["cum_cost"],
            want.set_index("id")["cum"].reindex(out["id"]).values)
    assert 3 not in out["id"].values and 7 not in out["id"].values

    empty = budget_select(_ds(df), "val", "cost", 0.0, "id").to_pandas()
    assert len(empty) == 0

    with pytest.raises(ValueError):
        budget_select(_ds(df), "val", "cost", -1.0, "id")


def test_winsorize(ray_session):
    """Winsorize matches numpy's interpolated-percentile clip, nulls
    pass through as null, the t-digest degrade lands within sketch
    error, exact=True raises past the guard, and bad percentiles
    raise."""
    from feature_fabrica_ray.pipelines import winsorize

    rng = np.random.default_rng(19)
    x = np.round(rng.normal(100, 25, 4000), 1)   # ties, bounded domain
    df = pd.DataFrame({"i": np.arange(x.size, dtype=np.int64), "v": x})
    df.loc[5, "v"] = np.nan
    lo, hi = np.percentile(df["v"].dropna(), [5, 95])
    want = np.clip(df["v"], lo, hi)

    for blocks in (1, 4):
        out = winsorize(_ds(df, blocks=blocks), "v",
                        p_lo=0.05, p_hi=0.95).to_pandas() \
            .sort_values("i").reset_index(drop=True)
        assert np.allclose(out["winsor"].dropna(),
                           want.dropna(), atol=1e-9)
        assert pd.isna(out.loc[5, "winsor"])

    with pytest.warns(RuntimeWarning, match="t-digest"):
        deg = winsorize(_ds(df, blocks=4), "v", p_lo=0.05, p_hi=0.95,
                        max_distinct=10).to_pandas() \
            .sort_values("i").reset_index(drop=True)
    err = np.abs(deg["winsor"].dropna() - want.dropna())
    assert err.max() < 3.0                      # sketch resolution

    with pytest.raises(ValueError, match="distinct"):
        winsorize(_ds(df), "v", max_distinct=10, exact=True)
    with pytest.raises(ValueError, match="p_lo"):
        winsorize(_ds(df), "v", p_lo=0.9, p_hi=0.1)


def test_grouped_winsorize(ray_session):
    """Per-segment clip matches numpy per-group percentiles; null
    values and null/unseen segments yield NULL (skip_nulls=False path);
    layout invariant; bad percentiles raise."""
    from feature_fabrica_ray.pipelines import grouped_winsorize

    rng = np.random.default_rng(23)
    n = 3000
    g = rng.choice(["a", "b", "c"], n).astype(object)
    v = np.round(np.where(g == "a", rng.normal(10, 2, n),
                          rng.normal(100, 30, n)), 2)
    df = pd.DataFrame({"i": np.arange(n, dtype=np.int64),
                       "g": g, "v": v})
    df.loc[4, "v"] = np.nan
    df.loc[9, "g"] = None

    want = df["v"].copy()
    for key, sub in df.dropna(subset=["g", "v"]).groupby("g"):
        lo, hi = np.percentile(sub["v"], [10, 90])
        m = (df["g"] == key) & df["v"].notna()
        want[m] = np.clip(df.loc[m, "v"], lo, hi)

    for blocks in (1, 4):
        out = grouped_winsorize(_ds(df, blocks=blocks), "g", "v",
                                p_lo=0.10, p_hi=0.90).to_pandas() \
            .sort_values("i").reset_index(drop=True)
        ok = df["g"].notna() & df["v"].notna()
        assert np.allclose(out.loc[ok, "winsor"], want[ok], atol=1e-9)
        assert pd.isna(out.loc[4, "winsor"])   # null value
        assert pd.isna(out.loc[9, "winsor"])   # null segment

    with pytest.raises(ValueError, match="p_lo"):
        grouped_winsorize(_ds(df), "g", "v", p_lo=0.9, p_hi=0.1)


def test_grouped_robust_scale(ray_session):
    """Per-segment modified-z matches the numpy reference (MAD against
    the unrounded median, both published stats 1e-6-rounded), null
    value / null segment / zero-MAD segment all yield NULL, layout
    invariant."""
    from feature_fabrica_ray.pipelines import grouped_robust_scale

    rng = np.random.default_rng(29)
    n = 2000
    g = rng.choice(["a", "b"], n).astype(object)
    v = np.round(np.where(g == "a", rng.normal(10, 2, n),
                          rng.normal(50, 9, n)), 2)
    df = pd.DataFrame({"i": np.arange(n, dtype=np.int64),
                       "g": g, "v": v})
    df.loc[2, "v"] = np.nan
    df.loc[6, "g"] = None
    # planted zero-MAD segment
    zm = pd.DataFrame({"i": np.arange(n, n + 6, dtype=np.int64),
                       "g": ["z"] * 6, "v": [7.0] * 6})
    df = pd.concat([df, zm], ignore_index=True)

    want = pd.Series(np.nan, index=df.index)
    for key, sub in df.dropna(subset=["g", "v"]).groupby("g"):
        med = np.percentile(sub["v"], 50)
        mad = np.percentile(np.abs(sub["v"] - med), 50)
        if mad > 0:
            m = (df["g"] == key) & df["v"].notna()
            med6 = np.floor(med * 1e6 + 0.5) / 1e6
            mad6 = np.floor(mad * 1e6 + 0.5) / 1e6
            r = (df.loc[m, "v"] - med6) / mad6
            want[m] = np.sign(r) * np.floor(np.abs(r) * 1e6 + 0.5) / 1e6

    for blocks in (1, 4):
        out = grouped_robust_scale(_ds(df, blocks=blocks), "g", "v") \
            .to_pandas().sort_values("i").reset_index(drop=True)
        ok = want.notna()
        assert np.allclose(out.loc[ok, "robust"], want[ok], atol=1e-9)
        assert pd.isna(out.loc[2, "robust"])        # null value
        assert pd.isna(out.loc[6, "robust"])        # null segment
        assert out.loc[out["g"] == "z", "robust"].isna().all()  # MAD=0
