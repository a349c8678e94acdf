"""Trainable text-quality classifier (operators/textclf.py, the
fastText/Joulin 2016 linear tier): featurization property pins, a
pure-numpy gradient-descent reference differential (label decisions
pinned exactly, weights to float tolerance — the d01 'zr'
decision-gate pattern), the planted two-class separation the d07 'clf'
sub-gate mirrors, the L2-excludes-bias regression, and the
prepare_corpus(classifier=) hook."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_governance_spark.operators.textclf import (
    TextClassifier,
    fit_text_classifier,
    hashed_features,
    predict_text,
)

DIM = 1 << 13


# planted two-class corpus: disjoint vocabularies, slight per-class
# length variation — margin-separated by construction (the same shape
# the d07 'clf' gate plants over the documents table)
def _planted(spark, n=60):
    rows = []
    for i in range(n):
        # the trailing doc-unique token keeps every text distinct (so
        # exact dedup collapses nothing) without moving the margin —
        # unseen unique tokens carry zero weight at predict time
        if i % 2 == 0:
            rows.append(
                (i, "alpha bravo charlie delta " * (3 + i % 4) + f"u{i}", 0)
            )
        else:
            rows.append(
                (i, "omega sigma lambda kappa " * (3 + i % 4) + f"u{i}", 1)
            )
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


# ------------------------------------------------------------------ #
# featurization
# ------------------------------------------------------------------ #
def test_hashed_features_properties(spark):
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, ""), (3, None), (4, "x")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in hashed_features(docs, dim=DIM, bigrams=True).collect()
    }
    assert set(rows) == {1, 2, 3, 4}
    for r in rows.values():
        ix, v = list(r["idxs"]), list(r["vals"])
        assert len(ix) == len(v)
        assert ix == sorted(ix)
        assert ix[-1] == DIM  # bias lane is always last
        assert v[-1] == 1.0
        # L1-normalized counts + the bias: sums to 2 for non-empty docs
        if len(ix) > 1:
            assert abs(sum(v) - 2.0) < 1e-9
    # NULL/empty text: just the bias lane
    assert list(rows[2]["idxs"]) == [DIM]
    assert list(rows[3]["idxs"]) == [DIM]
    # 'a b a c': 3 distinct unigrams + 3 distinct bigrams = up to 6
    # hashed indices (fewer only under hash collision) + bias
    assert 2 <= len(rows[1]["idxs"]) <= 7


def test_hashed_features_unigram_only(spark):
    docs = spark.createDataFrame([(1, "p q r")], "doc_id long, text string")
    uni = hashed_features(docs, dim=DIM, bigrams=False).collect()[0]
    bi = hashed_features(docs, dim=DIM, bigrams=True).collect()[0]
    assert len(uni["idxs"]) < len(bi["idxs"])


# ------------------------------------------------------------------ #
# pure-numpy reference differential
# ------------------------------------------------------------------ #
def _ref_fit(feat_rows, dim, iters, lr, l2):
    """Independent dense restatement of full-batch logistic GD with an
    unregularized intercept (the textbook update)."""
    n = len(feat_rows)
    X = np.zeros((n, dim + 1))
    y = np.zeros(n)
    for i, (ix, v, yi) in enumerate(feat_rows):
        X[i, np.asarray(ix)] = np.asarray(v)
        y[i] = yi
    w = np.zeros(dim + 1)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-X @ w))
        grad = X.T @ (p - y) / n
        penalty = l2 * w
        penalty[-1] = 0.0
        w = w - lr * (grad + penalty)
    return w


@pytest.mark.parametrize("l2", [0.0, 0.01])
def test_reference_differential(spark, l2):
    docs = _planted(spark, n=40)
    dim = 1 << 10
    feats = hashed_features(docs, dim=dim, bigrams=True)
    model = fit_text_classifier(
        docs, "y", dim=dim, bigrams=True, iters=6, lr=1.5, l2=l2,
        features=feats,
    )
    rows = feats.join(docs.select("doc_id", "y"), "doc_id").collect()
    w_ref = _ref_fit(
        [(r["idxs"], r["vals"], r["y"]) for r in rows],
        dim, iters=6, lr=1.5, l2=l2,
    )
    # weights to float tolerance (gradient sums are partition-order
    # dependent at the last ulp), LABEL decisions exactly
    assert np.allclose(model.weights, w_ref, rtol=1e-6, atol=1e-9)
    got = {
        r["doc_id"]: r["quality_label"]
        for r in predict_text(docs, model, features=feats).collect()
    }
    scores_ref = {}
    for r in rows:
        m = float(np.dot(w_ref[np.asarray(r["idxs"])], np.asarray(r["vals"])))
        scores_ref[r["doc_id"]] = int(1.0 / (1.0 + np.exp(-m)) >= 0.5)
    assert got == scores_ref


# ------------------------------------------------------------------ #
# planted separation (the gate's shape) + generalization
# ------------------------------------------------------------------ #
def test_fit_separates_planted_classes(spark):
    docs = _planted(spark)
    train = docs.filter(F.col("doc_id") % 3 == 0)  # both classes present
    model = fit_text_classifier(train, "y", dim=DIM, iters=5, lr=2.0)
    out = predict_text(docs, model).collect()
    assert all(r["quality_label"] == r["y"] for r in out)
    # scores are genuinely margin-separated, not borderline
    assert all(abs(r["quality_score"] - 0.5) > 0.05 for r in out)


def test_l2_excludes_bias(spark):
    """All-positive corpus with bias-only features: the intercept must
    not be shrunk by l2 (ADVICE r8: penalizing the bias lane pins
    scores near 0.5 on imbalanced data — here the fixed point of the
    buggy update is sigmoid(b)=1-b, b~0.66)."""
    docs = spark.createDataFrame(
        [(i, "", 1) for i in range(8)], "doc_id long, text string, y int"
    )
    model = fit_text_classifier(docs, "y", dim=64, iters=15, lr=2.0, l2=1.0)
    score = predict_text(docs, model).collect()[0]["quality_score"]
    assert score > 0.9


def test_features_reuse_hook(spark):
    docs = _planted(spark, n=24)
    feats = hashed_features(docs, dim=DIM, bigrams=True)
    m1 = fit_text_classifier(docs, "y", dim=DIM, iters=3, features=feats)
    m2 = fit_text_classifier(docs, "y", dim=DIM, iters=3)
    assert np.allclose(m1.weights, m2.weights, rtol=1e-9, atol=1e-12)


# ------------------------------------------------------------------ #
# validation + corpus hook
# ------------------------------------------------------------------ #
def test_validation(spark):
    docs = _planted(spark, n=4)
    with pytest.raises(ValueError, match="dim"):
        hashed_features(docs, dim=1)
    with pytest.raises(ValueError, match="iters"):
        fit_text_classifier(docs, "y", iters=0)
    with pytest.raises(ValueError, match="lr"):
        fit_text_classifier(docs, "y", lr=0.0)
    with pytest.raises(ValueError, match="weights"):
        TextClassifier(weights=np.zeros(5), dim=8, bigrams=True)
    with pytest.raises(ValueError, match="no labeled"):
        fit_text_classifier(docs.filter(F.lit(False)), "y")


def test_missing_bias_lane_rejected(spark):
    """Caller-supplied feature rows without the bias lane must fail
    loudly (reduceat segment arithmetic needs >= 1 entry per row)."""
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    bad = spark.createDataFrame(
        [(1, [], [])], "doc_id long, idxs array<int>, vals array<double>"
    )
    model = TextClassifier(weights=np.zeros(DIM + 1), dim=DIM, bigrams=True)
    with pytest.raises(Exception, match="bias lane"):
        predict_text(docs, model, features=bad).collect()


def test_prepare_corpus_classifier_hook(spark):
    from data_governance_spark.corpus import prepare_corpus

    docs = _planted(spark)
    train = docs.filter(F.col("doc_id") % 3 == 0)
    model = fit_text_classifier(train, "y", dim=DIM, iters=5, lr=2.0)
    res = prepare_corpus(
        docs.drop("y"),
        classifier=model,
        quality_rules={},  # isolate the classifier cut
        pii=False,
        minhash_threshold=1.01,
    )
    kept = {r["doc_id"] for r in res.kept.collect()}
    res.release()
    assert kept == {i for i in range(60) if i % 2 == 1}
    # scratch columns must not leak into the result
    assert "_clf_score" not in res.kept.columns
