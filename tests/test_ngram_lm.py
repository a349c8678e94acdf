"""Kneser-Ney n-gram LM perplexity (operators/ngram_lm.py, the
CCNet/Wenzek 2020 KenLM tier): a pure-Python reference differential
(independent counting + the same published recursion, compared to
float tolerance), the analytic fluency ordering the d07 'ppl' gate
mirrors, OOV finiteness, cap determinism, and the corpus hook."""

from __future__ import annotations

import math
import random
import re
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_governance_spark.operators.ngram_lm import (
    NGramLM,
    perplexity,
    train_ngram_lm,
)


# ------------------------------------------------------------------ #
# pure-Python reference (independent restatement)
# ------------------------------------------------------------------ #
def ref_lm(texts, order, D=0.75):
    toks = [re.findall(r"\S+", t, re.ASCII) for t in texts]
    raw = [Counter() for _ in range(order)]
    for ts in toks:
        for k in range(1, order + 1):
            for i in range(len(ts) - k + 1):
                raw[k - 1][" ".join(ts[i : i + k])] += 1
    num = []
    for k in range(1, order + 1):
        if k == order:
            num.append(dict(raw[k - 1]))
        else:
            cont: Counter = Counter()
            for g in raw[k]:  # each key is a distinct (k+1)-gram
                cont[g.split(" ", 1)[1]] += 1
            num.append(dict(cont))
    ctx = []
    for k in range(2, order + 1):
        dn: dict = {}
        for g, c in num[k - 1].items():
            h = g.rsplit(" ", 1)[0]
            d0, t0 = dn.get(h, (0, 0))
            dn[h] = (d0 + c, t0 + 1)
        ctx.append(dn)
    vocab = len(raw[0])
    denom1 = sum(num[0].values())
    types1 = len(num[0])

    def p(w, h):
        if not h:
            return max(num[0].get(w, 0) - D, 0.0) / denom1 + (
                D * types1 / denom1
            ) * (1.0 / (vocab + 1))
        k = len(h) + 1
        c = ctx[k - 2].get(" ".join(h))
        if c is None:
            return p(w, h[1:])
        denom, ntypes = c
        a = num[k - 1].get(" ".join(h) + " " + w, 0)
        return max(a - D, 0.0) / denom + (D * ntypes / denom) * p(w, h[1:])

    def ppl(text):
        ts = re.findall(r"\S+", text, re.ASCII)
        if not ts:
            return None
        tot = 0.0
        for i, w in enumerate(ts):
            tot += math.log(p(w, tuple(ts[max(0, i - order + 1) : i])))
        return math.exp(-tot / len(ts))

    return ppl


VOCAB = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far"]


def _random_corpus(n, seed):
    rng = random.Random(seed)
    return [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 20)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("order", [1, 2, 3])
def test_reference_differential(spark, order):
    ref_texts = _random_corpus(40, seed=7)
    score_texts = _random_corpus(15, seed=11) + [
        "completely unseen gibberish tokens here",
        "the cat sat",
    ]
    ref = spark.createDataFrame([(t,) for t in ref_texts], "text string")
    lm = train_ngram_lm(ref, order=order)
    got = {
        r["doc_id"]: r["perplexity"]
        for r in perplexity(
            spark.createDataFrame(
                list(enumerate(score_texts)), "doc_id long, text string"
            ),
            lm,
        ).collect()
    }
    ppl = ref_lm(ref_texts, order)
    for i, t in enumerate(score_texts):
        assert np.isclose(got[i], ppl(t), rtol=1e-9), (i, t)


def test_fluency_ordering(spark):
    """The gate's shape: in-distribution text scores lower perplexity
    than partially-fluent text, which scores lower than all-OOV
    gibberish."""
    ref = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)] * 10
        + [("the quick brown fox sleeps under the old tree",)] * 5,
        "text string",
    )
    lm = train_ngram_lm(ref, order=3)
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown dog jumps over the lazy fox"),
            (3, "zxqv wmpt kjhg bnml qwer asdf"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["perplexity"] for r in perplexity(docs, lm).collect()
    }
    assert got[1] < got[2] < got[3]
    assert all(math.isfinite(v) for v in got.values())


def test_null_and_empty_text(spark):
    ref = spark.createDataFrame([("a b c",)], "text string")
    lm = train_ngram_lm(ref, order=2)
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["perplexity"] for r in perplexity(docs, lm).collect()
    }
    assert got == {1: None, 2: None, 3: None}


def test_cap_is_deterministic_and_scores_stay_finite(spark):
    ref = spark.createDataFrame(
        [(t,) for t in _random_corpus(30, seed=3)], "text string"
    )
    lm1 = train_ngram_lm(ref, order=2, max_ngrams=5)
    lm2 = train_ngram_lm(ref, order=2, max_ngrams=5)
    assert lm1.num == lm2.num and lm1.ctx == lm2.ctx
    docs = spark.createDataFrame([(1, "the cat sat")], "doc_id long, text string")
    v = perplexity(docs, lm1).collect()[0]["perplexity"]
    assert math.isfinite(v) and v > 0


def test_validation(spark):
    ref = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError, match="order"):
        train_ngram_lm(ref, order=0)
    with pytest.raises(ValueError, match="discount"):
        train_ngram_lm(ref, discount=1.0)
    with pytest.raises(ValueError, match="max_ngrams"):
        train_ngram_lm(ref, max_ngrams=0)
    with pytest.raises(ValueError, match="empty reference"):
        train_ngram_lm(ref.filter(F.lit(False)))
    # order>=2 with a single-token-only reference: the unigram level
    # is the CONTINUATION table derived from bigram counts, so it is
    # empty — must fail at TRAIN time with an actionable message, not
    # ZeroDivisionError inside the scoring executor UDF
    singles = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",)], "text string"
    )
    with pytest.raises(ValueError, match="order-2 grams"):
        train_ngram_lm(singles, order=2)
    # the same corpus is VALID at order=1 (raw unigram level)
    lm1 = train_ngram_lm(singles, order=1)
    assert lm1.denom1 == 3


def test_bucket_by_perplexity_differential(spark):
    """Exact-regime (accuracy >= n) cutoffs must be the order
    statistics at rank ceil(q*n), and value-based tier assignment must
    match an independent pure-Python reference over a corpus with
    genuinely varying perplexities."""
    from data_governance_spark.operators.ngram_lm import (
        bucket_by_perplexity,
    )

    ref = spark.createDataFrame(
        [
            ("the cat sat on the mat",),
            ("a dog ran in the park",),
            ("the dog sat in a park",),
        ],
        "text string",
    )
    lm = train_ngram_lm(ref, order=2)
    words = "the cat sat on a dog ran in park mat".split()
    rnd = random.Random(7)
    rows = []
    for i in range(40):
        toks = [rnd.choice(words) for _ in range(rnd.randint(1, 6))] + [
            f"zz{i}x{j}" for j in range(rnd.randint(0, 4))
        ]
        rnd.shuffle(toks)
        rows.append((i, " ".join(toks)))
    rows += [(98, ""), (99, None)]  # NULL/empty text -> NULL tier
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qs, labs = (0.25, 0.5, 0.75), ("a", "b", "c", "d")
    got = {
        r["doc_id"]: (r["perplexity"], r["ppl_tier"])
        for r in bucket_by_perplexity(
            docs, lm, quantiles=qs, labels=labs, accuracy=100_000
        ).collect()
    }
    assert got[98] == (None, None) and got[99] == (None, None)
    vals = sorted(p for p, _ in got.values() if p is not None)
    cuts = [vals[math.ceil(q * len(vals)) - 1] for q in qs]
    for d, (p, t) in got.items():
        if p is None:
            assert t is None
            continue
        want = labs[-1]
        for c, lab in zip(cuts, labs[:-1]):
            if p <= c:
                want = lab
                break
        assert t == want, (d, p, cuts, t, want)


def test_bucket_by_perplexity_prescored_and_validation(spark):
    from data_governance_spark.operators.ngram_lm import (
        bucket_by_perplexity,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, None)],
        "doc_id long, perplexity double",
    )
    # pre-scored reuse hook: no lm needed; n=3 non-null, q=0.5 cutoff
    # is the order statistic at rank ceil(1.5)=2 -> 2.0
    out = {
        r["doc_id"]: r["ppl_tier"]
        for r in bucket_by_perplexity(
            df, quantiles=(0.5,), labels=("head", "tail"), accuracy=100
        ).collect()
    }
    assert out == {1: "head", 2: "head", 3: "tail", 4: None}
    with pytest.raises(ValueError, match="labels"):
        bucket_by_perplexity(df, quantiles=(0.5,), labels=("x", "y", "z"))
    with pytest.raises(ValueError, match="quantiles"):
        bucket_by_perplexity(df, quantiles=(0.7, 0.2), labels=("x", "y", "z"))
    with pytest.raises(ValueError, match="quantiles"):
        bucket_by_perplexity(df, quantiles=(), labels=("x",))
    with pytest.raises(ValueError, match="distinct"):
        bucket_by_perplexity(df, quantiles=(0.5,), labels=("x", "x"))
    with pytest.raises(ValueError, match="accuracy"):
        bucket_by_perplexity(
            df, quantiles=(0.5,), labels=("h", "t"), accuracy=0
        )
    with pytest.raises(ValueError, match="lm"):
        bucket_by_perplexity(
            df.select("doc_id", F.lit("a").alias("text")), None
        )
    # all-NULL scores: every tier NULL (no cutoffs exist)
    allnull = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, perplexity double"
    )
    assert [
        r["ppl_tier"] for r in bucket_by_perplexity(allnull).collect()
    ] == [None, None]


def test_prepare_corpus_perplexity_buckets(spark):
    from data_governance_spark.corpus import prepare_corpus

    fluent = "the quick brown fox jumps over the lazy dog"
    ref = spark.createDataFrame([(fluent,)] * 8, "text string")
    lm = train_ngram_lm(ref, order=2)
    docs = spark.createDataFrame(
        [
            (i, fluent + f" u{i}")
            if i % 2 == 0
            else (i, f"zxqv{i} wmpt kjhg bnml qwer asdf")
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    # both classes have CONSTANT ppl (same token-probability profile
    # within each class), so the tercile cutoffs land rank ceil(20/3)=7
    # inside the 10-doc fluent run and rank ceil(40/3)=14 inside the
    # gibberish run: head == fluent evens, middle == gibberish odds
    res = prepare_corpus(
        docs,
        perplexity_lm=lm,
        perplexity_buckets=(1.0 / 3.0, 2.0 / 3.0),
        perplexity_keep=("head",),
        quality_rules={},
        pii=False,
        minhash_threshold=1.01,
    )
    kept = {r["doc_id"] for r in res.kept.collect()}
    res.release()
    assert kept == {i for i in range(20) if i % 2 == 0}
    with pytest.raises(ValueError, match="not both"):
        prepare_corpus(
            docs,
            perplexity_lm=lm,
            perplexity_bounds=(0.0, 5.0),
            perplexity_buckets=(1.0 / 3.0, 2.0 / 3.0),
        )
    with pytest.raises(ValueError, match="perplexity_keep"):
        prepare_corpus(
            docs,
            perplexity_lm=lm,
            perplexity_buckets=(1.0 / 3.0, 2.0 / 3.0),
            perplexity_keep=("bogus",),
        )
    # validated at THIS boundary, in this function's own vocabulary —
    # not deep inside bucket_by_perplexity about a labels= parameter
    # prepare_corpus doesn't expose
    with pytest.raises(ValueError, match="exactly two quantiles"):
        prepare_corpus(docs, perplexity_lm=lm, perplexity_buckets=(0.5,))


def test_prepare_corpus_perplexity_hook(spark):
    from data_governance_spark.corpus import prepare_corpus

    fluent = "the quick brown fox jumps over the lazy dog"
    ref = spark.createDataFrame([(fluent,)] * 8, "text string")
    lm = train_ngram_lm(ref, order=2)
    docs = spark.createDataFrame(
        [
            (i, fluent + f" u{i}")
            if i % 2 == 0
            else (i, f"zxqv{i} wmpt kjhg bnml qwer asdf")
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    # with this 8-word reference vocab the OOV unigram floor is
    # lam1/(V+1) = 0.75/9, so all-OOV gibberish lands at ppl = 12 and
    # the fluent docs (one OOV u-token in ten) near 2.4 — cut between
    res = prepare_corpus(
        docs,
        perplexity_lm=lm,
        perplexity_bounds=(0.0, 5.0),
        quality_rules={},
        pii=False,
        minhash_threshold=1.01,
    )
    kept = {r["doc_id"] for r in res.kept.collect()}
    res.release()
    assert kept == {i for i in range(20) if i % 2 == 0}
    with pytest.raises(ValueError, match="perplexity_bounds"):
        prepare_corpus(docs, perplexity_lm=lm)
