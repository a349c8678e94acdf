"""Quality filter composition (operators/quality.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_governance_spark.operators.quality import (
    DEFAULT_RULES,
    corpus_signals,
    filter_corpus,
)


@pytest.fixture(scope="module")
def docs(spark):
    words = [f"tok{i}" for i in range(80)]
    good = "the of " + " ".join(words)  # 82 tokens, varied, has stopwords
    return spark.createDataFrame(
        [
            (1, good),  # passes defaults
            (2, "short text"),  # too few tokens
            (3, " ".join(["spam"] * 200)),  # no stopwords + pure repetition
            (4, ""),  # empty -> NULL signals -> dropped
        ],
        "doc_id long, text string",
    )


class TestCorpusSignals:
    def test_signal_values(self, spark, docs):
        r = {x["doc_id"]: x for x in corpus_signals(docs).collect()}
        assert r[1]["n_tokens"] == 82
        assert r[2]["n_tokens"] == 2
        assert r[3]["top_bigram_frac"] == pytest.approx(2 * 199 / 200)
        assert r[3]["dup_5gram_frac"] == 1.0
        assert r[4]["n_tokens"] == 0
        assert r[4]["mean_token_len"] is None
        # varied doc: every bigram unique
        assert r[1]["dup_5gram_frac"] == 0.0

    def test_no_shuffle_in_plan(self, spark, docs):
        plan = (
            corpus_signals(docs)
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        assert "Exchange" not in plan


class TestFilterCorpus:
    def test_default_rules_keep_only_clean_doc(self, spark, docs):
        kept = filter_corpus(docs).collect()
        assert [r["doc_id"] for r in kept] == [1]
        assert [c for c in filter_corpus(docs).columns] == ["doc_id", "text"]

    def test_keep_signals_appends_columns(self, spark, docs):
        out = filter_corpus(docs, keep_signals=True)
        assert "n_tokens" in out.columns and "dup_line_frac" in out.columns
        assert out.first()["n_tokens"] == 82

    def test_custom_rules(self, spark, docs):
        kept = filter_corpus(docs, {"n_tokens": (100, None)}).collect()
        assert [r["doc_id"] for r in kept] == [3]

    def test_unknown_rule_raises(self, spark, docs):
        with pytest.raises(ValueError, match="unknown quality signals"):
            filter_corpus(docs, {"n_tokenz": (1, None)})

    def test_default_rules_are_well_formed(self):
        for name, (lo, hi) in DEFAULT_RULES.items():
            assert lo is not None or hi is not None, name


class TestFencePlan:
    def test_filter_plan_tokenizes_once(self, spark, docs):
        """The Sample fence must keep the token materialization alive:
        without it the optimizer collapses the signal projections into
        the filter predicate and re-inlines split(text) into every
        fold (72 copies, measured 47x slower)."""
        plan = (
            filter_corpus(docs)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        # exactly two splits: tokens (\s+) and lines (\n), each
        # evaluated once in the materializing projection
        assert plan.count("split(text") == 2, plan[:2000]
        assert "Sample" in plan
        # the filter must test materialized _q_ attributes, not
        # substituted expressions
        assert "_q_n_tokens#" in plan.split("Sample")[0]


class TestMojibake:
    def test_replacement_char_fraction(self, spark):
        rows = [
            (1, "clean text here"),
            (2, "brok�en te�xt"),   # 2 of 13 chars
            (3, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["replacement_char_frac"]
               for r in corpus_signals(df).collect()}
        assert got[1] == 0.0
        assert got[2] == pytest.approx(2 / 13)
        assert got[3] is None

    def test_mojibake_docs_filtered_by_default(self, spark):
        words = ["the", "of"] + [f"w{j}" for j in range(58)]
        good = " ".join(words)
        bad = good + " " + "�" * len(good)  # ~50% replacement
        df = spark.createDataFrame(
            [(1, good), (2, bad)], "doc_id long, text string"
        )
        kept = [r["doc_id"] for r in filter_corpus(df).collect()]
        assert kept == [1]


def test_signal_summary_quantiles(spark):
    from data_governance_spark.operators.quality import signal_summary

    docs = spark.createDataFrame(
        [
            (i, " ".join(["the"] * 5 + [f"w{i}x{j}" for j in range(5 + i)]))
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    row = signal_summary(docs).first()
    nt = row["n_tokens"]
    assert len(nt) == 5
    # quantiles are monotone and bracket the real range [10, 29]
    assert nt == sorted(nt)
    assert 10 <= nt[0] and nt[-1] <= 29
    sr = row["stopword_ratio"]
    assert all(0.0 <= x <= 1.0 for x in sr)


def test_signal_summary_exact_regime_is_rank_statistic(spark):
    """accuracy >= n retains every value, so the returned quantile is
    the exact order statistic at rank ceil(p*n) — the contract the d05
    'ssum' driver sub-gate's oracle restates in SQL."""
    import math

    from data_governance_spark.operators.quality import signal_summary

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(i + 1))) for i in range(37)],
        "doc_id long, text string",
    )
    probs = (0.01, 0.25, 0.5, 0.75, 0.99)
    row = signal_summary(
        docs, probs=probs, signals=("n_tokens",), accuracy=1_000_000
    ).first()
    values = sorted(range(1, 38))  # n_tokens = doc_id + 1
    expect = [values[max(math.ceil(p * 37), 1) - 1] for p in probs]
    assert row["n_tokens"] == expect


def test_signal_summary_subset_and_unknown(spark, docs):
    from data_governance_spark.operators.quality import signal_summary

    row = signal_summary(docs, signals=("n_tokens", "stopword_ratio")).first()
    assert set(row.asDict()) == {"n_tokens", "stopword_ratio"}
    with pytest.raises(ValueError):
        signal_summary(docs, signals=("nope",))


def test_filter_corpus_pretokenized_matches_text_path(spark, docs):
    """tokens_col over a textless (id, tokens) relation must reproduce
    the text-path decision for token-only rules — the d01 'qf' gate
    feeds its persisted tokenized relation through this path."""
    from data_governance_spark.functions.text import tokens

    rules = {
        "n_tokens": (3, None),
        "stopword_ratio": (0.01, None),
        "top_bigram_frac": (None, 0.5),
    }
    baseline = sorted(r["doc_id"] for r in filter_corpus(docs, rules).collect())
    toked = docs.select("doc_id", tokens("text").alias("_toks"))
    via_tokens = sorted(
        r["doc_id"]
        for r in filter_corpus(toked, rules, tokens_col="_toks").collect()
    )
    assert via_tokens == baseline
    # a rule needing text still works when text exists alongside tokens
    with_text = docs.select("doc_id", "text", tokens("text").alias("_toks"))
    rules2 = dict(rules, replacement_char_frac=(None, 0.05))
    both = sorted(
        r["doc_id"]
        for r in filter_corpus(with_text, rules2, tokens_col="_toks").collect()
    )
    assert both == baseline


def test_compression_ratio_signal(spark):
    from data_governance_spark.operators.quality import compression_ratio

    import zlib

    rows = [
        (1, "the quick brown fox " * 25),     # repetitive -> low
        (2, "k9f2 q8zl m3vx j7pw b4nc " * 1 + "x1y2z3w4 v5u6t7s8"),
        (3, ""),                               # empty -> NULL
        (4, None),                             # NULL -> NULL
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratio(df).collect()
    }
    # exact parity with local zlib (same level, same bytes)
    for i, t in rows:
        if t:
            raw = t.encode()
            assert got[i] == len(zlib.compress(raw, 6)) / len(raw), i
    assert got[1] < 0.2 < got[2]
    assert got[3] is None and got[4] is None
    # map-only: no shuffle in the plan
    plan = (
        compression_ratio(df)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Repartition" not in plan
