"""Hand-computed fixtures for the C4/Gopher repetition operators
(operators/repetition.py): duplicate-line char fraction and top-n-gram
token coverage. The d01 oracle gate proves Spark==DuckDB on the corpus;
these pin the arithmetic itself against values computed by hand.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_governance_spark.operators.repetition import (
    doc_lines,
    dup_line_stats,
    dup_ngram_stats,
    top_ngram_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDocLines:
    def test_drops_whitespace_only_lines(self, spark):
        df = spark.createDataFrame(
            [("a\n   \n\nb \n",)], "text string"
        ).select(doc_lines("text").alias("lines"))
        assert df.first()["lines"] == ["a", "b "]

    def test_no_newline_is_one_line(self, spark):
        df = spark.createDataFrame([("hello world",)], "text string")
        assert df.select(doc_lines("text").alias("l")).first()["l"] == [
            "hello world"
        ]


class TestDupLineStats:
    def test_hand_computed_fraction(self, spark):
        # doc 1: "ab" x3 + "cdef" x1 -> dup chars 2*2=4, total 3*2+4=10
        # doc 2: all lines distinct -> 0.0
        docs = _docs(
            spark,
            [
                (1, "ab\nab\ncdef\nab"),
                (2, "x\ny\nz"),
            ],
        )
        got = {
            r["doc_id"]: r["dl"] for r in dup_line_stats(docs).collect()
        }
        assert got == {1: 0.4, 2: 0.0}

    def test_doc_without_lines_emits_no_row(self, spark):
        docs = _docs(spark, [(1, "  \n \n"), (2, "a\na")])
        got = dup_line_stats(docs).collect()
        assert {r["doc_id"] for r in got} == {2}
        assert got[0]["dl"] == 1.0 or got[0]["dl"] == pytest.approx(0.5)
        # "a\na": dup chars 1, total 2 -> 0.5
        assert got[0]["dl"] == 0.5


class TestTopNgramStats:
    def test_hand_computed_bigram_coverage(self, spark):
        # doc 1: tokens [a b a b c] -> bigrams "a b"x2 "b a"x1 "b c"x1
        #        tg = 2*2/5 = 0.8
        # doc 2: [x y z] -> all bigrams unique, tg = 2*1/3 = 0.6667
        docs = _docs(spark, [(1, "a b a b c"), (2, "x y z")])
        got = {
            r["doc_id"]: r["tg"]
            for r in top_ngram_stats(docs, n=2).collect()
        }
        assert got == {1: 0.8, 2: 0.6667}

    def test_degenerate_doc_can_exceed_one(self, spark):
        # "a a a a": bigram "a a" occurs 3x (overlapping), tg = 6/4
        docs = _docs(spark, [(1, "a a a a")])
        assert top_ngram_stats(docs, n=2).first()["tg"] == 1.5

    def test_short_docs_emit_no_row(self, spark):
        docs = _docs(spark, [(1, "only"), (2, ""), (3, "a b")])
        got = {r["doc_id"] for r in top_ngram_stats(docs, n=2).collect()}
        assert got == {3}

    def test_trigram_generalization(self, spark):
        # [a b c a b c a b c]: trigram "a b c" occurs 3x of 7 trigrams
        # tg = 3*3/9 = 1.0
        docs = _docs(spark, [(1, "a b c a b c a b c")])
        assert top_ngram_stats(docs, n=3).first()["tg"] == 1.0


# --------------------------------------------------------------------------
# Randomized differential: the map-only fold implementations vs direct
# Python transcriptions of the published definitions (Counter-based).
import random
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal


def _r4(x):
    # Spark's F.round is HALF_UP on the exact binary double; Python's
    # built-in round is banker's (0.15625 -> 0.1562 vs Spark 0.1563)
    return float(Decimal(x).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def _py_dl(text):
    lines = [l for l in text.split("\n") if l.strip() != ""]
    if not lines:
        return None
    c = Counter(lines)
    tot = sum(len(l) * k for l, k in c.items())
    dup = sum(len(l) * (k - 1) for l, k in c.items())
    return _r4(dup / tot)


def _grams(toks, n):
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _py_tg(text, n):
    toks = [t for t in text.split() if t]
    if len(toks) < n:
        return None
    c = Counter(_grams(toks, n))
    return _r4(n * max(c.values()) / len(toks))


def _py_dg(text, n):
    toks = [t for t in text.split() if t]
    if len(toks) < n:
        return None
    c = Counter(_grams(toks, n))
    tot = sum(len(g) * k for g, k in c.items())
    dup = sum(len(g) * k for g, k in c.items() if k > 1)
    return _r4(dup / tot)


def test_randomized_differential_vs_python(spark):
    rng = random.Random(20260814)
    vocab = ["a", "bb", "ccc", "data", "x1", "yz", "longword", "q"]
    rows = []
    for i in range(300):
        n_lines = rng.randint(0, 6)
        lines = []
        for _ in range(n_lines):
            n_tok = rng.randint(0, 12)
            lines.append(" ".join(rng.choice(vocab) for _ in range(n_tok)))
        # force duplicate lines/grams in about half the docs
        if lines and rng.random() < 0.5:
            lines += [rng.choice(lines)] * rng.randint(1, 3)
        rows.append((i, "\n".join(lines)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got_dl = {r["doc_id"]: r["dl"] for r in dup_line_stats(docs).collect()}
    got_tg = {
        r["doc_id"]: r["tg"] for r in top_ngram_stats(docs, n=2).collect()
    }
    got_dg = {
        r["doc_id"]: r["dg"] for r in dup_ngram_stats(docs, n=3).collect()
    }
    for i, text in rows:
        assert got_dl.get(i) == _py_dl(text), (i, "dl", text)
        assert got_tg.get(i) == _py_tg(text, 2), (i, "tg", text)
        assert got_dg.get(i) == _py_dg(text, 3), (i, "dg", text)
