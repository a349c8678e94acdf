"""The r14-optimization Column-tree memo (cache.column_memo) and the
tables scan-plan memo: reuse must be real (same objects back) and
semantically invisible (identical results across repeated operator
calls, which now take the memo-hit path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_governance_spark.cache import column_memo
from data_governance_spark.operators.dedup import (
    minhash_signatures,
    simhash_signatures,
)
from data_governance_spark.operators.quality import _signal_cols
from data_governance_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_memo_identity_and_isolation(spark):
    built = []

    def make(tag):
        def _b():
            built.append(tag)
            return F.lit(tag)

        return _b

    a1 = column_memo(("t_cm", "a"), make("a"))
    a2 = column_memo(("t_cm", "a"), make("a"))
    b = column_memo(("t_cm", "b"), make("b"))
    assert a1 is a2  # second call is a hit, not a rebuild
    assert built == ["a", "b"]  # each key built exactly once
    assert b is not a1


def test_signal_cols_memoized(spark):
    assert _signal_cols() is _signal_cols()


def test_table_scan_memoized_per_dir(spark):
    t1 = table(spark, SF, "nation")
    t2 = table(spark, SF, "nation")
    assert t1 is t2  # plan reuse within one (session, dir, name)
    other = table(spark, "/root/testdata/sf0.01", "nation")
    assert other is not t1  # a different dir is a different scan


def test_sketch_signatures_identical_across_memoized_calls(spark):
    # two calls: the first builds the 64-wide trees, the second takes
    # the memo-hit path — results must be byte-identical
    docs = table(spark, SF, "documents").select(
        "doc_id", F.split("text", r"\s+").alias("toks")
    )
    mh1 = sorted(
        minhash_signatures(docs, F.col("toks")).collect(),
        key=lambda r: r.doc_id,
    )
    mh2 = sorted(
        minhash_signatures(docs, F.col("toks")).collect(),
        key=lambda r: r.doc_id,
    )
    assert mh1 == mh2 and len(mh1) > 0
    sh1 = sorted(
        simhash_signatures(docs, F.col("toks")).collect(),
        key=lambda r: r.doc_id,
    )
    sh2 = sorted(
        simhash_signatures(docs, F.col("toks")).collect(),
        key=lambda r: r.doc_id,
    )
    assert sh1 == sh2 and len(sh1) > 0
