"""Bloom membership tier (operators/bloom.py): sizing math, no-false-
negatives property (fuzzed), empirical FPR bound, exactness of the
semi/anti compositions vs plain joins, build determinism across
partitionings, serde, filter reuse, NULL semantics, and the map-only
plan shape of the probe."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.bloom import (
    BloomFilter,
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)


def _df(spark, keys, extra=False):
    rows = [(k, i) for i, k in enumerate(keys)]
    return spark.createDataFrame(rows, "key string, v long")


class TestBuildProbe:
    def test_no_false_negatives_and_fpr(self, spark):
        ref = spark.range(2000).selectExpr("CAST(id * 3 AS STRING) AS key")
        bf = bloom_build(ref, "key", fpr=0.01)
        assert bf.n_added == 2000
        corpus = spark.range(30000).selectExpr("CAST(id AS STRING) AS key")
        probed = bloom_might_contain(corpus, "key", bf)
        rows = {r["key"]: r["might"] for r in probed.collect()}
        members = {str(i * 3) for i in range(2000) if i * 3 < 30000}
        assert all(rows[m] for m in members), "FALSE NEGATIVE"
        fps = sum(1 for k, v in rows.items() if v and k not in members)
        n_non = len(rows) - len(members)
        assert fps / n_non < 0.03, f"fpr {fps / n_non} >> target 0.01"

    def test_build_deterministic_across_partitioning(self, spark):
        ref = spark.range(500).selectExpr("CAST(id AS STRING) AS key")
        a = bloom_build(ref.repartition(1), "key", fpr=0.01)
        b = bloom_build(ref.repartition(16), "key", fpr=0.01)
        assert a.m == b.m and a.k == b.k
        assert (a.bits == b.bits).all()

    def test_null_keys_excluded_and_never_match(self, spark):
        ref = spark.createDataFrame(
            [("a",), (None,), ("b",)], "key string"
        )
        bf = bloom_build(ref, "key", fpr=0.01)
        corpus = spark.createDataFrame(
            [("a",), (None,), ("zzz",)], "key string"
        )
        got = {r["key"]: r["might"]
               for r in bloom_might_contain(corpus, "key", bf).collect()}
        assert got["a"] is True
        assert got[None] is False

    def test_empty_reference(self, spark):
        ref = spark.createDataFrame([], "key string")
        bf = bloom_build(ref, "key", fpr=0.01)
        corpus = spark.range(50).selectExpr("CAST(id AS STRING) AS key")
        assert bloom_might_contain(corpus, "key", bf).filter(
            "might"
        ).count() == 0

    def test_probe_plan_is_map_only(self, spark):
        ref = spark.range(100).selectExpr("CAST(id AS STRING) AS key")
        bf = bloom_build(ref, "key", fpr=0.01)
        corpus = spark.range(1000).selectExpr("CAST(id AS STRING) AS key")
        plan = bloom_might_contain(corpus, "key", bf)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Exchange" not in plan  # the corpus never shuffles

    def test_invalid_fpr(self, spark):
        ref = spark.range(10).selectExpr("CAST(id AS STRING) AS key")
        with pytest.raises(ValueError, match="fpr"):
            bloom_build(ref, "key", fpr=0.0)


class TestJoins:
    def test_semi_anti_exactness(self, spark):
        ref = spark.range(300).selectExpr(
            "CAST(id * 7 AS STRING) AS key"
        )
        corpus = spark.range(5000).selectExpr(
            "CAST(id AS STRING) AS key", "id AS v"
        )
        want_semi = {
            r["key"]
            for r in corpus.join(ref, "key", "left_semi").collect()
        }
        want_anti = {
            r["key"]
            for r in corpus.join(ref, "key", "left_anti").collect()
        }
        got_semi = {
            r["key"] for r in bloom_semi_join(corpus, ref, "key").collect()
        }
        got_anti = {
            r["key"]
            for r in bloom_semi_join(corpus, ref, "key",
                                     how="anti").collect()
        }
        assert got_semi == want_semi
        assert got_anti == want_anti
        assert got_semi | got_anti == {str(i) for i in range(5000)}

    def test_filter_reuse_and_superset_staleness(self, spark):
        # daily-increment shape: the filter was built over a SUPERSET
        # (yesterday's reference plus removed rows) — composition must
        # still be exact because the exact join settles membership
        old_ref = spark.range(100).selectExpr("CAST(id AS STRING) AS key")
        bf = bloom_build(old_ref, "key", fpr=0.01)
        new_ref = spark.range(50).selectExpr("CAST(id AS STRING) AS key")
        corpus = spark.range(200).selectExpr("CAST(id AS STRING) AS key")
        got = {
            r["key"]
            for r in bloom_semi_join(corpus, new_ref, "key",
                                     bf=bf).collect()
        }
        assert got == {str(i) for i in range(50)}

    def test_bad_how(self, spark):
        ref = spark.range(5).selectExpr("CAST(id AS STRING) AS key")
        with pytest.raises(ValueError, match="how"):
            bloom_semi_join(ref, ref, "key", how="inner")


class TestSerde:
    def test_round_trip(self, spark):
        ref = spark.range(100).selectExpr("CAST(id AS STRING) AS key")
        bf = bloom_build(ref, "key", fpr=0.01)
        bf2 = BloomFilter.from_bytes(bf.to_bytes())
        assert (bf2.bits == bf.bits).all()
        assert (bf2.m, bf2.k, bf2.n_added) == (bf.m, bf.k, bf.n_added)

    def test_bad_payloads(self):
        with pytest.raises(ValueError, match="not a serialized"):
            BloomFilter.from_bytes(b"JUNK 1 2 3\nxxxx")
        with pytest.raises(ValueError, match="mismatch"):
            BloomFilter.from_bytes(b"BLM1 1024 3 10\nshort")


class TestMath:
    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.text(min_size=0, max_size=8), min_size=1,
                 max_size=60, unique=True),
        st.integers(1, 8),
    )
    def test_no_false_negative_property(self, keys, k):
        # pure-numpy restatement of the double-hash bit math: every
        # added (h1, h2) must probe True under any k/m
        m = 512
        bits = np.zeros(m // 8, dtype=np.uint8)
        rng = np.random.default_rng(42)
        h1 = rng.integers(-(2**63), 2**63 - 1, len(keys), dtype=np.int64)
        h2 = rng.integers(-(2**63), 2**63 - 1, len(keys), dtype=np.int64)
        bf = BloomFilter(bits, m, k, len(keys))
        idx = bf.indexes(h1, h2)
        np.bitwise_or.at(
            bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8)
        )
        assert bf.contains(h1, h2).all()

    def test_sizing_formulas(self):
        from data_governance_spark.operators.bloom import _size

        m, k = _size(1_000_000, 0.001)
        assert 14_000_000 < m < 14_500_000  # ~14.38 bits/key at 0.1%
        assert k in (9, 10, 11)
        m, k = _size(1, 0.5)
        assert m >= 64 and k >= 1
        m, _ = _size(10**12, 0.001)
        assert m == 1 << 31  # capped


class TestPersistence:
    def test_save_load_round_trip(self, spark, tmp_path):
        from data_governance_spark.operators.bloom import (
            load_bloom,
            save_bloom,
        )

        ref = spark.range(500).selectExpr("CAST(id * 3 AS STRING) AS key")
        bf = bloom_build(ref, "key", fpr=0.01)
        p = str(tmp_path / "bloom_state")
        save_bloom(spark, bf, p)
        bf2 = load_bloom(spark, p)
        assert (bf2.bits == bf.bits).all()
        assert (bf2.m, bf2.k, bf2.n_added) == (bf.m, bf.k, bf.n_added)
        # the loaded filter drives the same exact composition
        corpus = spark.range(100).selectExpr("CAST(id AS STRING) AS key")
        a = {r["key"] for r in bloom_semi_join(
            corpus, ref, "key", bf=bf).collect()}
        b = {r["key"] for r in bloom_semi_join(
            corpus, ref, "key", bf=bf2).collect()}
        assert a == b
