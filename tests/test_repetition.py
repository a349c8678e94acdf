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
