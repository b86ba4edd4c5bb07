"""Model-based text classification: Multinomial Naive Bayes over
whitespace tokens, trained and applied as Ray Data passes.

The quality/language classifiers real curation pipelines train
(CCNet, GPT-3 App. A) reduce at their core to exactly this shape:
TRAINING is pure counting — per-(class, token) occurrence counts and
per-class document counts, both combiner-friendly (per-block Arrow
group_by partials, ONE keyed shuffle over distinct (class, token)
pairs) — and SCORING is a stateless map with the dimension-sized model
broadcast into the closure. Laplace-smoothed multinomial NB is chosen
deliberately: every number in the model is a ratio of counts, so the
entire train+score path has an exact ANSI-SQL oracle (the driver
verifies predictions bit-for-bit), unlike gradient-trained models.

The reference engine has no classifiers (its operator inventory is
feature_fabrica/transform/*); this module extends the LLM-data suite
alongside textstats.py / curation.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import fill_utf8

__all__ = ["nb_train", "nb_score", "logreg_train", "logreg_score",
           "score_curves", "score_summary", "score_summary_by_group"]

_MAX_MODEL_ROWS = 5_000_000  # (class, token) rows the driver may hold


def _round6(x):
    """Round half AWAY from zero at 6 decimals (SQL ROUND parity —
    np.round is banker's). One definition for every classify metric."""
    x = np.asarray(x, np.float64)
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def _flat_tokens(batch: pa.Table, text_col: str):
    """(token, row-index) arrays for a batch: whitespace split, empties
    dropped. Pure Arrow kernels."""
    toks = pc.utf8_split_whitespace(fill_utf8(batch.column(text_col)))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    return flat.filter(keep), parent.filter(keep)


def nb_train(ds, text_col: str = "text", label_col: str = "lang",
             alpha: float = 1.0) -> dict:
    """Fit Laplace-smoothed multinomial NB.

    Two combiner passes: per-(class, token) occurrence counts (one
    keyed shuffle over distinct pairs per block — never raw tokens) and
    per-class document counts. The returned model dict holds the
    dimension-sized tables (guarded at ``_MAX_MODEL_ROWS``):

      classes:   sorted class labels
      log_prior: ln(ndocs_c / ndocs)
      vocab:     sorted distinct tokens (all classes pooled)
      loglik:    (V, C) ln((cnt + alpha) / (tot_c + alpha * V))
      default:   (C,) the cnt=0 row, for tokens unseen in a class
                 (tokens outside the vocab entirely score ``default``
                 too — consistent smoothing for out-of-corpus input)
    """
    from ray.data.aggregate import Sum

    from ..tuning import shuffle_partitions

    def pair_partial(batch: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(batch, text_col)
        cls = pc.take(batch.column(label_col), parent)
        t = pa.table({"cls": cls, "token": flat})
        g = t.group_by(["cls", "token"]).aggregate([([], "count_all")])
        return pa.table({"cls": g.column("cls"), "token": g.column("token"),
                         "cnt": g.column("count_all").cast(pa.int64())})

    pairs = ds.map_batches(pair_partial, batch_format="pyarrow",
                           batch_size=None) \
        .groupby(["cls", "token"], num_partitions=shuffle_partitions()) \
        .aggregate(Sum("cnt")).materialize()
    if pairs.count() > _MAX_MODEL_ROWS:
        raise ValueError(
            f"NB model has {pairs.count()} (class, token) rows > "
            f"{_MAX_MODEL_ROWS}; prune the vocabulary (frequency floor) "
            "before training")
    pdf = pairs.to_pandas()
    if "sum(cnt)" in pdf.columns:
        pdf = pdf.rename(columns={"sum(cnt)": "cnt"})
    if "cls" not in pdf.columns:   # zero (class, token) pairs in the corpus
        pdf = pd.DataFrame({"cls": pd.Series([], dtype="object"),
                            "token": pd.Series([], dtype="object"),
                            "cnt": pd.Series([], dtype="int64")})
    pdf = pdf.dropna(subset=["cls"])

    def doc_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(label_col).aggregate([([], "count_all")])
        return pa.table({"cls": g.column(label_col),
                         "ndocs": g.column("count_all").cast(pa.int64())})

    docs = ds.map_batches(doc_partial, batch_format="pyarrow",
                          batch_size=None).to_pandas() \
        .groupby("cls", as_index=False)["ndocs"].sum()
    docs = docs.dropna(subset=["cls"]).sort_values("cls")

    classes = docs["cls"].tolist()
    n_all = float(docs["ndocs"].sum())
    log_prior = np.log(docs["ndocs"].to_numpy(np.float64) / n_all)
    vocab = pd.Index(sorted(pdf["token"].unique()))
    V = len(vocab)
    C = len(classes)
    cnt = np.zeros((V, C), np.float64)
    ci = {c: i for i, c in enumerate(classes)}
    if len(pdf):
        rows = vocab.get_indexer(pdf["token"])
        cols = pdf["cls"].map(ci).to_numpy()
        cnt[rows, cols] = pdf["cnt"].to_numpy(np.float64)
    tot = cnt.sum(axis=0)
    if V == 0:          # corpus with zero tokens: likelihoods contribute 0
        loglik = np.zeros((0, C), np.float64)
        default = np.zeros(C, np.float64)
        return {"classes": classes, "log_prior": log_prior,
                "vocab": vocab, "loglik": loglik, "default": default}
    denom = tot + alpha * V
    loglik = np.log((cnt + alpha) / denom)
    default = np.log(alpha / denom)
    return {"classes": classes, "log_prior": log_prior,
            "vocab": vocab, "loglik": loglik, "default": default}


def nb_score(ds, model: dict, text_col: str = "text",
             id_col: str = "doc_id"):
    """Predict per document under a trained NB model: stateless
    ``map_batches`` with the model in the closure (broadcast once at
    plan time); each batch flattens its tokens, looks the whole flat
    array up in the vocab in one vectorized ``get_indexer``, and
    scatter-adds log-likelihood rows per (doc, class). Ties break to
    the lexicographically smallest class, matching the SQL oracle's
    ``ORDER BY lp DESC, cls ASC``. Returns (id_col, pred, logprob)."""
    classes = list(model["classes"])
    vocab, loglik = model["vocab"], model["loglik"]
    default, log_prior = model["default"], model["log_prior"]
    C = len(classes)

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0 or C == 0:
            return pa.table({id_col: batch.column(id_col),
                             "pred": pa.array([None] * n, pa.string()),
                             "logprob": pa.array([None] * n, pa.float64())})
        flat, parent = _flat_tokens(batch, text_col)
        scores = np.tile(log_prior, (n, 1))
        if len(flat):
            idx = vocab.get_indexer(flat.to_pandas())
            rows = np.where(idx >= 0, idx, 0)
            ll = np.where((idx >= 0)[:, None], loglik[rows], default)
            np.add.at(scores, parent.to_numpy(zero_copy_only=False), ll)
        best = np.argmax(scores, axis=1)       # first max = smallest class
        pred = np.asarray(classes, object)[best]
        lp = scores[np.arange(n), best]
        return pa.table({id_col: batch.column(id_col),
                         "pred": pa.array(pred, pa.string()),
                         "logprob": pa.array(lp, pa.float64())})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _hashed_counts(batch: pa.Table, text_col: str, dim: int):
    """Per-row hashed bag-of-tokens: (flat feature index, row id)."""
    from .textstats import token_hashes

    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h, row_of = token_hashes(col)
    return (h % np.uint64(dim)).astype(np.int64), row_of


def logreg_train(ds, text_col: str = "text", label_col: str = "label",
                 dim: int = 1 << 16, iters: int = 50, lr: float = 0.5,
                 l2: float = 0.0) -> dict:
    """Train a binary logistic-regression text classifier on hashed
    bag-of-token features (the fastText/CCNet-style quality-filter
    shape) with FULL-BATCH gradient descent.

    Scale shape: tokenization + hashing run ONCE — the per-row feature
    index lists materialize into a narrow (fidx list<int64>, y) dataset
    in the object store (spillable) and every iteration streams over
    THAT, so 50 iterations cost one tokenize pass + 50 cheap numeric
    passes instead of 50 tokenize passes. The weight vector (``dim`` +
    bias, ~0.5 MB at the default 2^16) is ``ray.put`` once per
    iteration and each pass emits a per-block gradient partial (a
    single (dim+1)-float row — the exchange carries model-sized
    vectors, never rows); the driver sums partials and steps.
    Full-batch GD with zero init is deterministic and partition-
    invariant up to float summation order (~1e-15), unlike SGD.
    At 100 TB pair this with ``hash_sample`` to train on a fixed-size
    sample, which is what production quality filters do. No SQL oracle
    (iterative).

    Labels: ``label_col`` must be 0/1 (ints or booleans; nulls drop
    the row). Returns {"w": (dim,), "b": float, "dim": int}."""
    import ray

    w = np.zeros(dim, np.float64)
    b = 0.0

    def featurize(batch: pa.Table) -> pa.Table:
        idx, row_of = _hashed_counts(batch, text_col, dim)
        n = batch.num_rows
        lens = np.bincount(row_of, minlength=n)
        offsets = np.concatenate(([0], np.cumsum(lens, dtype=np.int64)))
        # int32 list offsets wrap past 2^31 total tokens per block —
        # LargeListArray keeps them int64 so overflow cannot corrupt
        fidx = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                             pa.array(idx, pa.int64()))
        return pa.table({"fidx": fidx,
                         "y": batch.column(label_col).cast(pa.float64())})

    feats = ds.map_batches(featurize, batch_format="pyarrow",
                           batch_size=None).materialize()

    def grad_pass(ref):
        def fn(batch: pa.Table) -> pa.Table:
            wv, bv = ray.get(ref)
            y_arr = batch.column("y")
            valid = pc.is_valid(y_arr).to_numpy(zero_copy_only=False)
            y = pc.fill_null(y_arr, 0.0).to_numpy(zero_copy_only=False)
            col = batch.column("fidx")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            idx = pc.list_flatten(col).to_numpy(zero_copy_only=False)
            row_of = pc.list_parent_indices(col) \
                .to_numpy(zero_copy_only=False)
            n = batch.num_rows
            z = np.full(n, bv, np.float64)
            np.add.at(z, row_of, wv[idx])
            p = 1.0 / (1.0 + np.exp(-np.clip(z, -35, 35)))
            resid = np.where(valid, p - y, 0.0)
            g = np.zeros(dim + 2, np.float64)   # [grad_w..., grad_b, n]
            np.add.at(g, idx, resid[row_of])
            g[dim] = resid.sum()
            g[dim + 1] = float(valid.sum())
            return pa.table({"g": pa.array([g.tobytes()], pa.binary())})

        return fn

    for _ in range(iters):
        ref = ray.put((w, b))
        rows = feats.map_batches(grad_pass(ref), batch_format="pyarrow",
                                 batch_size=None).take_all()
        g = np.zeros(dim + 2, np.float64)
        for r in rows:
            g += np.frombuffer(r["g"], np.float64)
        n = max(g[dim + 1], 1.0)
        w -= lr * (g[:dim] / n + l2 * w)
        b -= lr * (g[dim] / n)
    return {"w": w, "b": float(b), "dim": dim}


def logreg_score(ds, model: dict, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Probability per document under a trained hashed-logreg model:
    stateless map, model in the closure. Returns (id_col, prob)."""
    w, b, dim = model["w"], model["b"], model["dim"]

    def fn(batch: pa.Table) -> pa.Table:
        idx, row_of = _hashed_counts(batch, text_col, dim)
        z = np.full(batch.num_rows, b, np.float64)
        np.add.at(z, row_of, w[idx])
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -35, 35)))
        return pa.table({id_col: batch.column(id_col),
                         "prob": pa.array(p, pa.float64())})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _score_hist(ds, label_col: str, score_col: str,
                max_distinct: int, caller: str):
    """Merged (score, n_pos, n_total) distinct-score histogram sorted
    score-DESC — the shared combiner for score_curves/score_summary.
    Null/NaN rows excluded; guarded from materialized metadata."""
    import pyarrow.compute as pc

    from ..tuning import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(score_col).cast(pa.float64())
        lab = batch.column(label_col).cast(pa.int64())
        ok = pc.and_(
            pc.and_(pc.is_valid(s), pc.is_valid(lab)),
            pc.invert(pc.is_nan(pc.fill_null(s, 0.0))))
        t = pa.table({"s": s, "lab": lab}).filter(ok)
        g = t.group_by(["s"]).aggregate([("lab", "sum"),
                                         ([], "count_all")])
        return pa.table({"s": g.column("s"),
                         "pos": g.column("lab_sum").cast(pa.int64()),
                         "tot": g.column("count_all").cast(pa.int64())})

    hist_ds = (ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
               .groupby("s", num_partitions=shuffle_partitions())
               .sum(["pos", "tot"]).materialize())
    if hist_ds.count() > max_distinct:
        raise ValueError(
            f"{caller}: {hist_ds.count()} distinct scores — quantize "
            f"the score column first (equidepth_buckets)")
    hist = hist_ds.to_pandas()
    if hist.empty:
        return hist
    return hist.sort_values("s", ascending=False).reset_index(drop=True)


def score_curves(ds, label_col: str, score_col: str,
                 max_distinct: int = 5_000_000) -> "pd.DataFrame":
    """Model-evaluation curves at EVERY distinct score threshold: for
    the rule "predict positive when score >= thr", one row per distinct
    score with (tp, fp, tpr, fpr, precision, lift, frac_targeted) —
    the ROC, precision-recall and cumulative-gains/lift views of a
    scored binary outcome in one pass, exact and oracle-checkable
    (no quantile binning, no id tie-breaking: thresholds ARE the
    observed score values, so the result is layout/rerun invariant).

    Scale shape: one per-block (score, label) count combiner (distinct
    pairs per block — bounded by the score domain, guarded at
    ``max_distinct`` from materialized metadata), one keyed merge, and
    a driver-side cumulative sum over the distinct-score table. Rows
    where score or label is null are excluded. ``label_col`` may be
    boolean or numeric 0/1. Continuous all-distinct score domains are
    the guard's business: quantize scores first (e.g.
    ``equidepth_buckets``) — the curve at millions of thresholds is
    not a useful artifact. Returns a pandas DataFrame sorted by
    threshold DESC; ratios rounded to 6 (half-away, SQL ROUND
    parity); lift is NULL when no rows are targeted and when there
    are no positives."""
    import pandas as pd

    hist = _score_hist(ds, label_col, score_col, max_distinct,
                       "score_curves")
    cols = ["thr", "tp", "fp", "tpr", "fpr", "precision", "lift",
            "frac_targeted"]
    if hist.empty:
        return pd.DataFrame({c: pd.Series(
            [], dtype="int64" if c in ("tp", "fp") else "float64")
            for c in cols})
    pos = hist["sum(pos)"].to_numpy(np.int64)
    tot = hist["sum(tot)"].to_numpy(np.int64)
    ctp = np.cumsum(pos)
    call = np.cumsum(tot)
    cfp = call - ctp
    P = int(ctp[-1])
    N = int(call[-1] - P)
    T = int(call[-1])

    r6 = _round6

    with np.errstate(invalid="ignore", divide="ignore"):
        tpr = ctp / P if P else np.full(len(hist), np.nan)
        fpr = cfp / N if N else np.full(len(hist), np.nan)
        prec = ctp / call
        lift = (prec / (P / T)) if P else np.full(len(hist), np.nan)
    return pd.DataFrame({
        "thr": hist["s"].to_numpy(np.float64),
        "tp": ctp.astype(np.int64),
        "fp": cfp.astype(np.int64),
        "tpr": r6(tpr), "fpr": r6(fpr),
        "precision": r6(prec), "lift": r6(lift),
        "frac_targeted": r6(call / T)})


def score_summary(ds, label_col: str, score_col: str,
                  max_distinct: int = 5_000_000) -> "pd.DataFrame":
    """One-row scalar summary of a scored binary outcome: ``roc_auc``
    (trapezoid over the distinct-threshold ROC — Mann-Whitney with
    half-credit ties) and ``avg_precision`` (step-interpolated AP,
    Σ Δrecall·precision over thresholds) plus (n, n_pos) — the
    headline numbers of ``score_curves`` without materializing the
    per-threshold table anywhere downstream.

    Same single histogram-combiner pass and distinct-score guard as
    ``score_curves``. Returns one row; ratios rounded to 6; AUC/AP are
    NULL when either class is absent."""
    import pandas as pd

    hist = _score_hist(ds, label_col, score_col, max_distinct,
                       "score_summary")
    if hist.empty:
        return pd.DataFrame({"n": np.array([0], np.int64),
                             "n_pos": np.array([0], np.int64),
                             "roc_auc": [np.nan],
                             "avg_precision": [np.nan]})
    pos = hist["sum(pos)"].to_numpy(np.int64)
    tot = hist["sum(tot)"].to_numpy(np.int64)
    ctp = np.cumsum(pos).astype(np.float64)
    call = np.cumsum(tot).astype(np.float64)
    cfp = call - ctp
    P = float(ctp[-1])
    N = float(cfp[-1])
    T = int(call[-1])
    ptp = np.concatenate([[0.0], ctp[:-1]])
    pfp = np.concatenate([[0.0], cfp[:-1]])
    if P > 0 and N > 0:
        auc = float(((cfp - pfp) * (ctp + ptp) / 2.0).sum() / (P * N))
    else:
        auc = np.nan
    if P > 0:
        ap = float(((ctp - ptp) / P * (ctp / call)).sum())
    else:
        ap = np.nan

    def r6(v):
        return float(_round6(v)) if np.isfinite(v) else v

    return pd.DataFrame({"n": np.array([T], np.int64),
                         "n_pos": np.array([int(P)], np.int64),
                         "roc_auc": [r6(auc)],
                         "avg_precision": [r6(ap)]})


def score_summary_by_group(ds, group_col: str, label_col: str,
                           score_col: str) -> "pd.DataFrame":
    """Per-GROUP model-evaluation summary: ``roc_auc`` and
    ``avg_precision`` of a scored binary outcome within every segment
    (which language/source/slice does the quality model actually
    discriminate on — the fairness/debug view of ``score_summary``).

    Scale shape: one per-block (group, score) count combiner, the
    engine's bucketed merge (``grouped._bucketed_merge``: rows shuffle
    on hash(group) % B, ONE vectorized pandas call per bucket — the
    per-group cumulative sums, trapezoid AUC and step AP are Cython
    groupby kernels across ALL of a bucket's groups at once, never one
    Python call per group). The group column keeps its ORIGINAL dtype
    (the null-safe string sentinel is only the shuffle key; the typed
    column rides along, the ``_with_shuffle_key`` convention). Null
    groups form a group (SQL GROUP BY); null/NaN scores and null
    labels are excluded per group. Returns one row per group (group,
    n, n_pos, roc_auc, avg_precision) sorted by group value (nulls
    last); AUC is NULL for single-class groups; ratios rounded to
    6."""
    import pandas as pd
    import pyarrow.compute as pc

    from .grouped import _bucketed_merge, _restore_null_keys

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(score_col).cast(pa.float64())
        lab = batch.column(label_col).cast(pa.int64())
        ok = pc.and_(
            pc.and_(pc.is_valid(s), pc.is_valid(lab)),
            pc.invert(pc.is_nan(pc.fill_null(s, 0.0))))
        # Arrow group_by treats nulls as a key, so the TYPED group
        # column survives; the string sentinel is only the shuffle key
        t = pa.table({"grp": batch.column(group_col), "s": s,
                      "lab": lab}).filter(ok)
        g = t.group_by(["grp", "s"]).aggregate(
            [("lab", "sum"), ([], "count_all")])
        out_t = pa.table({"grp": g.column("grp"),
                          "s": g.column("s"),
                          "pos": g.column("lab_sum").cast(pa.int64()),
                          "tot": g.column("count_all").cast(pa.int64())})
        gk = pc.fill_null(pc.cast(out_t.column("grp"), pa.string()),
                          "\0null")
        return out_t.append_column("__gkey", gk)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["grp", "s"], sort=False,
                         dropna=False)[["pos", "tot"]] \
            .sum().reset_index()
        agg = agg.sort_values(["grp", "s"], ascending=[True, False],
                              kind="mergesort").reset_index(drop=True)
        g = agg.groupby("grp", sort=False, dropna=False)
        pos = agg["pos"].to_numpy(np.float64)
        tot = agg["tot"].to_numpy(np.float64)
        ctp = g["pos"].cumsum().to_numpy(np.float64)
        call = g["tot"].cumsum().to_numpy(np.float64)
        cfp = call - ctp
        ptp = ctp - pos
        pfp = cfp - (tot - pos)
        P = g["pos"].transform("sum").to_numpy(np.float64)
        T = g["tot"].transform("sum").to_numpy(np.float64)
        N = T - P
        with np.errstate(invalid="ignore", divide="ignore"):
            auc_t = (cfp - pfp) * (ctp + ptp) / 2.0 / (P * N)
            ap_t = pos / P * (ctp / call)
        out = pd.DataFrame({
            "grp": agg["grp"], "auc_t": auc_t, "ap_t": ap_t,
            "pos": agg["pos"], "tot": agg["tot"]})
        per = out.groupby("grp", sort=False, dropna=False).agg(
            n=("tot", "sum"), n_pos=("pos", "sum"),
            roc_auc=("auc_t", "sum"),
            avg_precision=("ap_t", "sum")).reset_index()
        # single-class groups: the per-row terms are 0/0 = NaN and
        # pandas' sum SKIPS NaN (all-NaN sums to 0.0), so the NULL
        # contract is set explicitly from the class counts — AUC is
        # undefined without both classes, AP without positives
        single = (per["n_pos"] == 0) | (per["n_pos"] == per["n"])
        per.loc[single, "roc_auc"] = np.nan
        per.loc[per["n_pos"] == 0, "avg_precision"] = np.nan
        per.loc[~np.isfinite(per["roc_auc"]), "roc_auc"] = np.nan
        per.loc[~np.isfinite(per["avg_precision"]),
                "avg_precision"] = np.nan
        return per

    out = _bucketed_merge(
        ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=None), merge_bucket)
    for c in ("roc_auc", "avg_precision"):
        out[c] = _round6(out[c].to_numpy(np.float64))
    out["n"] = out["n"].astype(np.int64)
    out["n_pos"] = out["n_pos"].astype(np.int64)
    out = out.rename(columns={"grp": group_col})
    out = _restore_null_keys(out, [group_col])
    return out.sort_values(group_col, na_position="last") \
        .reset_index(drop=True)
