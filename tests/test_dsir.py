"""DSIR importance resampling (operators/dsir.py) vs a pure-Python
recomputation of the whole chain (hashing, smoothing, fold, top-k)."""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from data_governance_spark.operators.dsir import (
    fit_log_ratios,
    gumbel_top_k,
    importance_scores,
    select_top_k,
)

B = 64
ALPHA = 1.0


def _py_grams(text):
    t = [w for w in text.split() if w]
    return t + [" ".join(t[i : i + 2]) for i in range(len(t) - 1)]


def _py_bucket(gram):
    return int(hashlib.md5(gram.encode()).hexdigest()[:6], 16) % B


def _py_fit(target_texts, raw_texts):
    t, r = {}, {}
    for texts, acc in ((target_texts, t), (raw_texts, r)):
        for x in texts:
            for g in _py_grams(x):
                b = _py_bucket(g)
                acc[b] = acc.get(b, 0) + 1
    T, R = sum(t.values()), sum(r.values())
    return [
        round(
            math.log((t.get(b, 0) + ALPHA) / (T + ALPHA * B))
            - math.log((r.get(b, 0) + ALPHA) / (R + ALPHA * B)),
            6,
        )
        for b in range(B)
    ]


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(42)
    target_vocab = ["science", "theory", "proof", "method", "result"]
    junk_vocab = ["click", "buy", "cheap", "win", "free"]
    rows = []
    for i in range(60):
        vocab = target_vocab if i % 3 == 0 else junk_vocab
        rows.append(
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 20))))
        )
    rows.append((98, ""))  # featureless -> score 0.0
    rows.append((99, "   "))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fit_matches_python(spark, corpus):
    import pyspark.sql.functions as F

    target = corpus.filter(F.col("doc_id") % 3 == 0)
    got = fit_log_ratios(target, corpus, n_buckets=B, alpha=ALPHA)
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    want = _py_fit(
        [t for i, t in texts.items() if i % 3 == 0], list(texts.values())
    )
    assert got == want


def test_scores_match_python_fold(spark, corpus):
    import pyspark.sql.functions as F

    target = corpus.filter(F.col("doc_id") % 3 == 0)
    lr = fit_log_ratios(target, corpus, n_buckets=B, alpha=ALPHA)
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in importance_scores(corpus, lr).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    micro = [int(round(x * 1e6)) for x in lr]
    for i, t in texts.items():
        # integer micro-unit sum, exactly like the operator's fold
        want = sum(micro[_py_bucket(g)] for g in _py_grams(t)) / 1e6
        assert got[i] == want, i  # bit-identical, not approx
    # featureless docs score exactly 0.0
    assert got[98] == 0.0 and got[99] == 0.0
    # sanity: target-looking docs outscore junk on average
    t_scores = [v for i, v in got.items() if i % 3 == 0 and i < 90]
    j_scores = [v for i, v in got.items() if i % 3 != 0 and i < 90]
    assert sum(t_scores) / len(t_scores) > sum(j_scores) / len(j_scores)


def test_top_k_deterministic_and_scalable_plan(spark, corpus):
    import pyspark.sql.functions as F

    target = corpus.filter(F.col("doc_id") % 3 == 0)
    lr = fit_log_ratios(target, corpus, n_buckets=B, alpha=ALPHA)
    scored = importance_scores(corpus, lr)
    top = select_top_k(scored, 10)
    ids = [r["doc_id"] for r in top.collect()]
    assert len(ids) == 10
    assert ids == [r["doc_id"] for r in select_top_k(scored, 10).collect()]
    # top-k compiles to TakeOrdered, not a global Sort+Exchange
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # python cross-check of membership
    got_scores = {
        r["doc_id"]: r["dsir_score"] for r in scored.collect()
    }
    want = [
        i
        for i, _ in sorted(
            got_scores.items(), key=lambda kv: (-kv[1], kv[0])
        )[:10]
    ]
    assert ids == want


def test_gumbel_top_k_matches_python(spark, corpus):
    import pyspark.sql.functions as F

    target = corpus.filter(F.col("doc_id") % 3 == 0)
    lr = fit_log_ratios(target, corpus, n_buckets=B, alpha=ALPHA)
    scored = importance_scores(corpus, lr)
    ids = [r["doc_id"] for r in gumbel_top_k(scored, 8, seed="s1").collect()]
    assert len(ids) == set(ids).__len__() == 8
    # deterministic given the seed
    assert ids == [
        r["doc_id"] for r in gumbel_top_k(scored, 8, seed="s1").collect()
    ]
    # python recomputation of the perturbed key ordering
    got_scores = {r["doc_id"]: r["dsir_score"] for r in scored.collect()}

    def key(i):
        u = (
            int(
                hashlib.md5(f"s1:{i}".encode()).hexdigest()[:13], 16
            )
            + 1.0
        ) / float(16**13 + 1)
        return got_scores[i] + -math.log(-math.log(u))

    want = sorted(got_scores, key=lambda i: (-key(i), i))[:8]
    assert ids == want
    # a different seed gives a different sample (overwhelmingly)
    other = [r["doc_id"] for r in gumbel_top_k(scored, 8, seed="s2").collect()]
    assert other != ids


def test_fit_split_matches_two_frame_fit(spark, corpus):
    """The one-scan predicate fit must equal the two-DataFrame fit."""
    import pyspark.sql.functions as F

    from data_governance_spark.operators.dsir import fit_log_ratios_split

    pred = F.col("doc_id") % 3 == 0
    want = fit_log_ratios(corpus.filter(pred), corpus, n_buckets=B)
    got = fit_log_ratios_split(corpus, pred, n_buckets=B)
    assert got == want


def test_validation_errors(spark, corpus):
    with pytest.raises(ValueError):
        fit_log_ratios(corpus, corpus, n_buckets=0)
    with pytest.raises(ValueError):
        fit_log_ratios(corpus, corpus, alpha=0.0)
    with pytest.raises(ValueError):
        importance_scores(corpus, [])
    with pytest.raises(ValueError):
        select_top_k(corpus, 0)
