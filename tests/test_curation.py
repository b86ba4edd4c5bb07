"""Curation-operator tests: redaction goldens, Gopher metric formulas,
n-gram decontamination (planted contamination + layout invariance),
salted aggregation vs a plain pandas groupby."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from feature_fabrica_ray.pipelines import (common_ngrams, decontaminate,
                                           gopher_quality, redact_text,
                                           salted_group_agg,
                                           token_ngram_hashes)


def _ds(df, blocks=1):
    ds = ray.data.from_pandas(df)
    return ds.repartition(blocks) if blocks > 1 else ds


# ---------------------------------------------------------------------------
# redaction
# ---------------------------------------------------------------------------

def test_redact_golden(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": [
        "mail bob.smith+x@corp.example.org now",
        "see https://a.example.com/p?q=1 and http://b.io",
        "host 192.168.0.1 up, 999.1.2.3 is not clipped by \\b",
        "clean text only",
    ]})
    out = redact_text(_ds(df)).to_pandas().sort_values("doc_id")
    assert out["n_emails"].tolist() == [1, 0, 0, 0]
    assert out["n_urls"].tolist() == [0, 2, 0, 0]
    # 999.1.2.3: \d{1,3} matches '999' and \b holds at digit/space edges,
    # so BOTH literals count — documents the regex's (standard) laxity
    assert out["n_ips"].tolist() == [0, 0, 2, 0]
    assert out["redacted"].tolist() == [
        "mail <EMAIL> now",
        "see <URL> and <URL>",
        "host <IP> up, <IP> is not clipped by \\b",
        "clean text only",
    ]


def test_redact_nulls(ray_session):
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([None], pa.string())})
    out = redact_text(ray.data.from_arrow(t)).to_pandas()
    assert out["redacted"].tolist() == [""]
    assert out["n_emails"].tolist() == [0]


# ---------------------------------------------------------------------------
# gopher quality
# ---------------------------------------------------------------------------

def test_gopher_formulas(ray_session):
    # 4 words: "aa aa bb3 cc" -> mean_wl = 9/4, top_frac = 2/4,
    # alpha_frac = 3/4 (bb3 is not purely alphabetic)
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["aa aa bb3 cc", ""]})
    out = gopher_quality(_ds(df)).to_pandas().sort_values("doc_id")
    assert out["n_words"].tolist() == [4, 0]
    assert out["mean_word_len"][0] == pytest.approx(2.25)
    assert out["top_word_frac"][0] == pytest.approx(0.5)
    assert out["alpha_word_frac"][0] == pytest.approx(0.75)
    assert out["passes_gopher"].tolist() == [False, False]


def test_gopher_pass_flag(ray_session):
    good = " ".join(f"word{i%37}also" for i in range(80))
    df = pd.DataFrame({"doc_id": [0], "text": [good]})
    out = gopher_quality(_ds(df)).to_pandas()
    # 80 words, low repetition — but tokens contain digits, so alpha
    # fraction fails; loosening the threshold flips the flag
    assert not out["passes_gopher"][0]
    out2 = gopher_quality(_ds(df), min_alpha_word_frac=0.0).to_pandas()
    assert out2["passes_gopher"][0]


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def test_token_ngram_short_rows_empty():
    h, r = token_ngram_hashes(pa.array(["a b c", "", "x"]), n=8)
    assert h.size == 0 and r.size == 0


def test_decontaminate_planted(ray_session):
    secret = "alpha bravo charlie delta echo foxtrot golf hotel"
    bench = pd.DataFrame({"doc_id": [100], "text": [f"prefix {secret} suffix"]})
    train = pd.DataFrame({"doc_id": [0, 1, 2], "text": [
        f"noise {secret} more noise",          # contains the 8-gram
        "alpha bravo charlie delta echo foxtrot golf",  # only 7 of 8
        "totally unrelated words here again and again today",
    ]})
    out = decontaminate(_ds(train, blocks=3), _ds(bench), n=8) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["contaminated"].tolist() == [True, False, False]
    assert out["n_contaminated"].iloc[0] >= 1


def test_decontaminate_layout_invariant(ray_session):
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(30)]
    docs = [" ".join(rng.choice(words, 40)) for _ in range(60)]
    train = pd.DataFrame({"doc_id": range(60), "text": docs})
    bench = pd.DataFrame({"doc_id": [999], "text": [docs[13]]})
    a = decontaminate(_ds(train, blocks=1), _ds(bench), n=8) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = decontaminate(_ds(train, blocks=7), _ds(bench), n=8) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert bool(a["contaminated"][13])


def test_decontaminate_empty_bench(ray_session):
    train = pd.DataFrame({"doc_id": [0], "text": ["some words " * 10]})
    bench = pd.DataFrame({"doc_id": [], "text": []}).astype(
        {"doc_id": "int64", "text": "object"})
    out = decontaminate(_ds(train), _ds(bench), n=8).to_pandas()
    assert out["contaminated"].tolist() == [False]


# ---------------------------------------------------------------------------
# salted aggregation
# ---------------------------------------------------------------------------

def test_salted_agg_matches_pandas(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        # one maximally hot key + a long tail
        "k": np.where(rng.random(5000) < 0.8, "hot",
                      rng.integers(0, 20, 5000).astype(str)),
        "v": rng.integers(0, 1000, 5000),
    })
    out = salted_group_agg(_ds(df, blocks=8), "k", "v", salts=16) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = df.groupby("k")["v"].agg(["count", "sum", "mean"]).reset_index() \
        .sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == exp["k"].tolist()
    assert out["n_rows"].tolist() == exp["count"].tolist()
    assert out["total"].tolist() == exp["sum"].tolist()
    np.testing.assert_allclose(out["mean_r"], exp["mean"].round(6),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# repetition stats
# ---------------------------------------------------------------------------

def test_repetition_formulas(ray_session):
    from feature_fabrica_ray.pipelines import repetition_stats
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": [
        "a b a b a",   # bigrams: ab ba ab ba -> 4 total 2 distinct
        "x y z",       # bigrams: xy yz -> no dups; trigram: xyz -> 1
        "solo",        # too short for any gram
    ]})
    out = repetition_stats(_ds(df, blocks=2)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_bigrams"].tolist() == [4, 2, 0]
    assert out["dup_bigram_frac"].tolist() == [0.5, 0.0, 0.0]
    assert out["n_trigrams"].tolist() == [3, 1, 0]
    # trigrams of doc 0: aba bab aba -> 3 total, 2 distinct
    assert out["dup_trigram_frac"].iloc[0] == pytest.approx(1 / 3, abs=1e-6)
    assert out["n_bpe_tokens"].tolist() == [5, 3, 1]


def test_bpe_token_count_mixed(ray_session):
    from feature_fabrica_ray.pipelines import repetition_stats
    # "ab12,cd" -> runs: "ab" "12" "," "cd"; " x!" -> " x" "!"
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["ab12,cd", "q x!"]})
    out = repetition_stats(_ds(df)).to_pandas().sort_values("doc_id")
    assert out["n_bpe_tokens"].tolist() == [4, 3]


# ---------------------------------------------------------------------------
# property tests (kernel vs naive python reference, no Ray needed)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcxyz", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8), st.integers(2, 4))
def test_token_ngrams_match_naive(docs, n):
    h, r = token_ngram_hashes(pa.array(docs, pa.string()), n=n)
    # counts per row match the naive sliding-window count
    got = np.bincount(r, minlength=len(docs)).tolist()
    want = [max(len(d.split()) - n + 1, 0) for d in docs]
    assert got == want
    # equal token windows hash equally; distinct-per-row matches naive
    dist = np.zeros(len(docs), np.int64)
    if h.size:
        from feature_fabrica_ray.pipelines.textstats import _distinct_per_row
        dist = _distinct_per_row(h, r, len(docs))
    naive = []
    for d in docs:
        t = d.split()
        naive.append(len({tuple(t[i:i + n]) for i in range(len(t) - n + 1)}))
    assert dist.tolist() == naive


# ---------------------------------------------------------------------------
# common_ngrams (boilerplate-span mining)
# ---------------------------------------------------------------------------

def test_common_ngrams_counts(ray_session):
    docs = ["the quick fox", "the quick dog", "slow quick fox", ""]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    out = common_ngrams(_ds(df), n=2, min_frac=0.5).to_pandas() \
        .sort_values("ngram").reset_index(drop=True)
    # "the quick" in docs 0,1 (df=2); "quick fox" in docs 0,2 (df=2);
    # threshold 0.5*4 = 2 -> exactly those two
    assert out["ngram"].tolist() == ["quick fox", "the quick"]
    assert out["tf"].tolist() == [2, 2]
    assert out["df"].tolist() == [2, 2]


def test_common_ngrams_partition_invariant(ray_session):
    docs = [f"a b c d{i % 3}" for i in range(40)]
    df = pd.DataFrame({"doc_id": range(40), "text": docs})
    a = common_ngrams(_ds(df), n=2, min_frac=0.2, n_docs=40).to_pandas()
    b = common_ngrams(ray.data.from_pandas(df).repartition(7), n=2,
                      min_frac=0.2, n_docs=40).to_pandas()
    key = lambda t: sorted(map(tuple, t[["ngram", "tf", "df"]].to_numpy()))
    assert key(a) == key(b)


def test_common_ngrams_dup_tokens_within_doc(ray_session):
    # same bigram repeated within ONE doc: tf counts occurrences, df docs
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["x y x y", "x y"]})
    out = common_ngrams(_ds(df), n=2, min_frac=0.9).to_pandas()
    row = out[out["ngram"] == "x y"].iloc[0]
    assert (row["tf"], row["df"]) == (3, 2)


def test_normalize_text(ray_session):
    """Case/whitespace variants of the same text normalize to the same
    string and the same 8-byte norm_hash dedup key; distinct texts keep
    distinct keys; nulls normalize to the empty string."""
    from feature_fabrica_ray.pipelines import normalize_text

    df = pd.DataFrame({"doc_id": range(5),
                       "text": ["Hello   World", "  hello\tworld\n",
                                "HELLO WORLD", "other text", None]})
    out = normalize_text(_ds(df, blocks=2)).to_pandas().sort_values("doc_id")
    assert list(out["norm"]) == ["hello world"] * 3 + ["other text", ""]
    h = list(out["norm_hash"])
    assert h[0] == h[1] == h[2] and h[3] != h[0]
    # ready-made dedup key: exact dedup on norm_hash collapses the trio
    from feature_fabrica_ray.pipelines import exact_dedup_rows
    dd = exact_dedup_rows(normalize_text(_ds(df, blocks=2)),
                          ["norm_hash"], tiebreak="doc_id").to_pandas()
    assert len(dd) == 3 and set(dd["doc_id"]) == {0, 3, 4}


def test_remove_frequent_lines(ray_session):
    """Planted boilerplate: the header line in 3/4 docs is removed at
    min_docs=3, unique lines survive in order, a NULL text and a doc
    that was ALL boilerplate both yield NULL (SQL string_agg-over-
    no-rows parity); clean docs round-trip byte-identical; layout
    invariant."""
    import ray.data

    from feature_fabrica_ray.pipelines import remove_frequent_lines

    hdr = "COPYRIGHT HEADER"
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [f"{hdr}\nalpha\nbeta", f"{hdr}\ngamma", hdr,
                 "delta\nepsilon", None],
    })
    for blocks in (1, 3):
        ds = ray.data.from_pandas(df).repartition(blocks)
        out = remove_frequent_lines(ds, min_docs=3).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out["cleaned"].tolist() == [
            "alpha\nbeta", "gamma", None, "delta\nepsilon", None]
    # fraction form: hdr is in 3/5 docs -> min_frac 0.5 removes it
    out = remove_frequent_lines(ray.data.from_pandas(df),
                                min_frac=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["cleaned"][0] == "alpha\nbeta"
    with pytest.raises(ValueError):
        remove_frequent_lines(ray.data.from_pandas(df))
    with pytest.raises(ValueError):
        remove_frequent_lines(ray.data.from_pandas(df), min_docs=2,
                              min_frac=0.5)


def test_dedup_lines_within_doc(ray_session):
    """First occurrence of each segment survives in place, later repeats
    vanish; docs without repeats round-trip byte-identical; NULL stays
    NULL; empty string survives as its own (single) segment; layout
    invariant (stateless per block)."""
    import ray.data

    from feature_fabrica_ray.pipelines import dedup_lines_within_doc

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a\nb\na\nc\nb", "x\ny", None, ""],
    })
    for blocks in (1, 2):
        ds = ray.data.from_pandas(df).repartition(blocks)
        out = dedup_lines_within_doc(ds).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out["cleaned"].tolist() == ["a\nb\nc", "x\ny", None, ""]


def test_bm25_scores(ray_session):
    """BM25 matches a hand-rolled reference (Lucene idf, k1=1.5
    b=0.75) on a tiny corpus, docs without query terms are absent,
    and block layout doesn't matter."""
    import math
    import numpy as np
    import pandas as pd
    import ray.data
    from feature_fabrica_ray.pipelines import bm25_scores

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["the cat sat on the mat",
                 "dog and cat play",
                 "quantum flux capacitor",
                 "  "],          # whitespace-only: zero tokens
    })
    q = ["cat", "dog"]

    def ref():
        toks = {r.doc_id: r.text.split() for r in docs.itertuples()}
        lens = {d: len(t) for d, t in toks.items() if t}
        n = len(lens)
        avgdl = sum(lens.values()) / n
        out = {}
        for term in q:
            df = sum(1 for t in toks.values() if term in t)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
            for d, t in toks.items():
                tf = t.count(term)
                if tf:
                    s = idf * tf * 2.5 / (tf + 1.5 * (0.25 + 0.75 * lens[d] / avgdl))
                    out[d] = out.get(d, 0.0) + s
        return out

    expect = ref()
    for blocks in (1, 3):
        ds = ray.data.from_pandas(docs).repartition(blocks)
        got = bm25_scores(ds, q).to_pandas().set_index("doc_id")["bm25"]
        assert set(got.index) == set(expect)
        for d, s in expect.items():
            assert abs(got[d] - s) < 1e-12


def test_bpe_learn_golden(ray_session):
    """Hand-checkable corpus: merge order and weighted pair counts
    follow the classic BPE recipe (count-desc, smaller-pair tiebreak),
    and token counts reflect the learned merges."""
    from feature_fabrica_ray.pipelines import bpe_token_counts, learn_bpe

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["aaab aaab", "ab", ""]})
    m = learn_bpe(_ds(df), num_merges=4, min_count=1)
    assert list(m["merged"]) == ["aa", "ab", "ab</w>", "aaab</w>"]
    assert list(m["pair_count"]) == [4, 3, 3, 2]
    tc = bpe_token_counts(_ds(df), m).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(tc["n_bpe_tokens"]) == [2, 1, 0]


def test_bpe_partition_invariance(ray_session):
    """Learned merges are a function of exact global word counts, so
    block layout must not change them; token counts follow."""
    from feature_fabrica_ray.pipelines import bpe_token_counts, learn_bpe

    rng = np.random.default_rng(7)
    words = ["low", "lower", "lowest", "newer", "wider", "new"]
    texts = [" ".join(rng.choice(words, rng.integers(3, 12)))
             for _ in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(40), "text": texts})
    m1 = learn_bpe(_ds(df, blocks=1), num_merges=12)
    m8 = learn_bpe(_ds(df, blocks=8), num_merges=12)
    pd.testing.assert_frame_equal(m1, m8)
    t1 = bpe_token_counts(_ds(df, blocks=1), m1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    t8 = bpe_token_counts(_ds(df, blocks=8), m8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(t1, t8)


def test_bpe_token_count_semantics(ray_session):
    """Zero merges counts raw bytes per word (markers excluded); more
    merges never increase any document's token count; min_count stops
    the merge loop early."""
    from feature_fabrica_ray.pipelines import bpe_token_counts, learn_bpe

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["abc de", "aa aa aa"]})
    zero = bpe_token_counts(_ds(df), learn_bpe(_ds(df), num_merges=0)) \
        .to_pandas().sort_values("doc_id")
    assert list(zero["n_bpe_tokens"]) == [5, 6]   # raw bytes of words
    prev = zero["n_bpe_tokens"].to_numpy()
    for k in (1, 3, 8):
        m = learn_bpe(_ds(df), num_merges=k, min_count=1)
        cur = bpe_token_counts(_ds(df), m).to_pandas() \
            .sort_values("doc_id")["n_bpe_tokens"].to_numpy()
        assert (cur <= prev).all()
        prev = cur
    # min_count guard: every pair in "x y z" is unique (count 1)
    solo = learn_bpe(_ds(pd.DataFrame({"doc_id": [0], "text": ["x y z"]})),
                     num_merges=10, min_count=2)
    assert len(solo) == 0


def test_nb_classifier(ray_session):
    """NB training counts match hand-computed Laplace smoothing, the
    classifier separates an obviously separable corpus, ties break to
    the smaller class, and results are partition-invariant."""
    from feature_fabrica_ray.pipelines import nb_score, nb_train

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "lang": ["en", "en", "fr", "fr", "en", "fr"],
        "text": ["the cat sat", "the dog sat", "le chat", "le chien",
                 "a cat and dog", "le le chat"],
    })
    m = nb_train(_ds(df, blocks=3))
    # hand check one entry: P('le'|fr) with alpha=1:
    # fr tokens: le chat le chien le le chat -> 7 total, 'le' count 4
    # vocab = distinct tokens over corpus
    V = len(m["vocab"])
    li = list(m["vocab"]).index("le")
    fi = m["classes"].index("fr")
    assert m["loglik"][li, fi] == np.log((4 + 1) / (7 + V))
    # priors: 3 en / 3 fr of 6
    assert np.allclose(m["log_prior"], np.log([0.5, 0.5]))

    out = nb_score(_ds(df, blocks=2), m).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["pred"]) == ["en", "en", "fr", "fr", "en", "fr"]

    # partition invariance: same model + predictions at any layout
    m1 = nb_train(_ds(df, blocks=1))
    assert np.allclose(m1["loglik"], m["loglik"])
    assert list(m1["vocab"]) == list(m["vocab"])
    out1 = nb_score(_ds(df, blocks=1), m1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out1, out)

    # empty doc scores priors only -> prior argmax (here b: 2/3 vs 1/3)
    df2 = pd.DataFrame({"doc_id": [0, 1, 2], "lang": ["b", "a", "b"],
                        "text": ["x y", "z w", ""]})
    m2 = nb_train(_ds(df2))
    s2 = nb_score(_ds(df2), m2).to_pandas().set_index("doc_id")
    assert s2.loc[2, "pred"] == "b"
    assert s2.loc[2, "logprob"] == pytest.approx(np.log(2 / 3))

    # EQUAL priors on an empty doc is an exact tie -> smaller class
    df4 = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                        "lang": ["b", "a", "a", "b"],
                        "text": ["x y", "z w", "", ""]})
    m4 = nb_train(_ds(df4))
    s4 = nb_score(_ds(df4), m4).to_pandas().set_index("doc_id")
    assert s4.loc[2, "pred"] == "a" and s4.loc[3, "pred"] == "a"


def test_logreg_quality_classifier(ray_session):
    """Full-batch GD on hashed bag-of-tokens separates an obviously
    separable corpus, is partition-invariant (deterministic up to float
    summation order), ignores null labels, and scores monotonically in
    the count of discriminative tokens."""
    from feature_fabrica_ray.pipelines import logreg_score, logreg_train

    rng = np.random.default_rng(5)
    good = ["great clear helpful text", "clear helpful prose",
            "great helpful writing", "clear great document"]
    bad = ["spam junk garbage click", "junk click bait",
           "garbage spam click", "junk garbage bait"]
    rows = []
    for i in range(120):
        base = good[i % 4] if i % 2 == 0 else bad[i % 4]
        words = base.split()
        rng.shuffle(words)
        rows.append({"doc_id": i, "text": " ".join(words),
                     "label": 1 if i % 2 == 0 else 0})
    df = pd.DataFrame(rows)
    m = logreg_train(_ds(df, blocks=4), label_col="label",
                     dim=1 << 12, iters=40, lr=1.0)
    scored = logreg_score(_ds(df, blocks=4), m).to_pandas() \
        .merge(df[["doc_id", "label"]], on="doc_id")
    acc = ((scored["prob"] > 0.5).astype(int) == scored["label"]).mean()
    assert acc == 1.0

    # partition invariance: same model within float-sum tolerance
    m1 = logreg_train(_ds(df, blocks=1), label_col="label",
                      dim=1 << 12, iters=40, lr=1.0)
    assert np.allclose(m1["w"], m["w"], atol=1e-9)
    assert abs(m1["b"] - m["b"]) < 1e-9

    # more discriminative tokens -> more extreme probability
    probe = pd.DataFrame({"doc_id": [0, 1],
                          "text": ["great", "great great great"]})
    p = logreg_score(_ds(probe), m).to_pandas().set_index("doc_id")["prob"]
    assert p[1] > p[0] > 0.5

    # null labels contribute nothing: adding unlabeled rows leaves the
    # fitted model unchanged
    df_null = pd.concat([df, pd.DataFrame(
        {"doc_id": [900, 901], "text": ["spam spam spam", "great"],
         "label": pd.array([None, None], dtype="Int64")})],
        ignore_index=True)
    m2 = logreg_train(_ds(df_null, blocks=3), label_col="label",
                      dim=1 << 12, iters=40, lr=1.0)
    assert np.allclose(m2["w"], m["w"], atol=1e-9)


# ---------------------------------------------------------------------------
# degenerate-input edges: null-typed text columns, zero-token corpora
# ---------------------------------------------------------------------------

def test_text_ops_all_null_text_column(ray_session):
    """A block whose text values are ALL null degrades to an arrow
    `null`-typed column (from_pandas/from_pylist); every text kernel
    must treat it as empty strings, not crash in fill_null."""
    from feature_fabrica_ray.pipelines import (bpe_token_counts, learn_bpe,
                                               nb_score, nb_train)
    from feature_fabrica_ray.pipelines.textstats import text_stats

    df = pd.DataFrame({"doc_id": [1, 2], "text": [None, None],
                       "lang": ["en", "fr"]})
    m = nb_train(_ds(df))
    assert m["classes"] == ["en", "fr"]
    assert len(m["vocab"]) == 0
    scored = nb_score(_ds(df), m).to_pandas().sort_values("doc_id")
    # zero tokens everywhere: prediction falls back to the prior (tie ->
    # lexicographically smallest class) and logprob is finite
    assert scored["pred"].tolist() == ["en", "en"]
    assert np.isfinite(scored["logprob"]).all()

    ts = text_stats(_ds(df)).to_pandas()
    assert ts["n_chars"].tolist() == [0, 0]

    merges = learn_bpe(_ds(df))
    assert len(merges) == 0
    counts = bpe_token_counts(_ds(df), merges).to_pandas()
    assert counts["n_bpe_tokens"].tolist() == [0, 0]


def test_bpe_zero_word_corpus(ray_session):
    """Empty/whitespace-only corpus: learn_bpe returns an empty merge
    table (typed), and applying it counts zero tokens."""
    from feature_fabrica_ray.pipelines import bpe_token_counts, learn_bpe

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["", "   "]})
    merges = learn_bpe(_ds(df, blocks=2))
    assert list(merges.columns) == ["rank", "left", "right", "merged",
                                    "pair_count"]
    assert len(merges) == 0
    counts = bpe_token_counts(_ds(df), merges).to_pandas()
    assert counts["n_bpe_tokens"].tolist() == [0, 0]


def test_bpe_null_mixed_corpus(ray_session):
    """Null text rows coexist with real ones; merges still learn from
    the non-null rows and null docs count zero tokens."""
    from feature_fabrica_ray.pipelines import bpe_token_counts, learn_bpe

    df = pd.DataFrame({"doc_id": [1, 2], "text": [None, "ab ab ab"]})
    merges = learn_bpe(_ds(df, blocks=2), num_merges=5, min_count=1)
    assert len(merges) == 2            # a+b, ab+</w>
    out = bpe_token_counts(_ds(df), merges).to_pandas() \
        .set_index("doc_id")["n_bpe_tokens"]
    assert out[1] == 0 and out[2] == 3


# ---------------------------------------------------------------------------
# corpus-wide keep-first segment dedup
# ---------------------------------------------------------------------------

def test_dedup_segments_global_goldens(ray_session):
    from feature_fabrica_ray.pipelines import dedup_segments_global

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                       "text": ["a b c", "b d", None, "", "a b"]})
    out = dedup_segments_global(_ds(df, blocks=3), delim=" ") \
        .to_pandas().sort_values("doc_id")
    # doc 1 is first everywhere; doc 2 loses "b"; null stays null;
    # "" keeps its (first) empty segment; doc 5 loses everything -> NULL
    assert out["cleaned"].tolist() == ["a b c", "d", None, "", None]


def test_dedup_segments_global_partition_invariance(ray_session):
    from feature_fabrica_ray.pipelines import dedup_segments_global

    rows = [{"doc_id": i,
             "text": " ".join(f"w{(i * 7 + j) % 23}" for j in range(1 + i % 9))}
            for i in range(60)]
    df = pd.DataFrame(rows)
    a = dedup_segments_global(_ds(df, blocks=1), delim=" ") \
        .to_pandas().sort_values("doc_id")["cleaned"].fillna("\0").tolist()
    b = dedup_segments_global(_ds(df, blocks=7), delim=" ") \
        .to_pandas().sort_values("doc_id")["cleaned"].fillna("\0").tolist()
    assert a == b
    # keep-first: the union of surviving segments has no duplicates and
    # equals the distinct segment set of the corpus
    segs = [s for t in a if t != "\0" and t != "" for s in t.split(" ")]
    assert len(segs) == len(set(segs))
    allsegs = {s for r in rows for s in r["text"].split(" ")}
    assert set(segs) == allsegs


# ---------------------------------------------------------------------------
# duplicated-substring span removal (Lee et al. window form)
# ---------------------------------------------------------------------------

def _spans_reference(docs: dict[int, str], width: int) -> list[tuple]:
    """Brute-force single-process reference: global keep-first window
    dedup + interval merge, in plain Python."""
    seen = {}
    losers = []
    for did in sorted(docs):
        toks = [t for t in docs[did].split() if t]
        for p in range(len(toks) - width + 1):
            w = " ".join(toks[p:p + width])
            if w in seen:
                losers.append((did, p))
            else:
                seen[w] = (did, p)
    out = []
    cur = None
    for did, p in sorted(losers):
        if cur and cur[0] == did and p <= cur[2]:
            cur = (did, cur[1], max(cur[2], p + width))
        else:
            if cur:
                out.append(cur)
            cur = (did, p, p + width)
    if cur:
        out.append(cur)
    return out


def test_dedup_substring_spans_vs_reference(ray_session):
    """Distributed window-span dedup equals the brute-force keep-first
    reference on planted duplicate runs (cross-doc, intra-doc,
    overlapping windows that must merge into one span), is layout
    invariant, and leaves unique docs unmarked."""
    from feature_fabrica_ray.pipelines import dedup_substring_spans

    base = "alpha beta gamma delta epsilon zeta eta theta"   # 8 tokens
    docs = {
        0: base + " one two three",                 # the original
        1: "x y " + base + " tail",                 # cross-doc dup, offset 2
        2: base + " mid " + base,                   # intra-doc repeat
        3: "totally unique words nothing repeated here at all ok",
        4: "p q r s t u v w",                       # unique 8 tokens
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    ref = _spans_reference(docs, 8)

    for blocks in (1, 4):
        got = dedup_substring_spans(_ds(df, blocks), "text", "doc_id",
                                    width=8).to_pandas()
        got = got.sort_values(["doc_id", "span_start"]).reset_index(drop=True)
        tuples = list(got.itertuples(index=False, name=None))
        assert tuples == ref, (blocks, tuples, ref)
    # doc 0 is the global first occurrence -> never marked
    assert 0 not in {t[0] for t in ref}
    assert {t[0] for t in ref} == {1, 2}

    # short docs (< width tokens) and empty text emit nothing and crash
    # nothing
    small = pd.DataFrame({"doc_id": [9, 10], "text": ["a b c", ""]})
    out = dedup_substring_spans(_ds(small), "text", "doc_id",
                                width=8).to_pandas()
    assert len(out) == 0
