"""Deterministic hash split/sample (operators/sampling.py): stability,
disjointness, proportion accuracy, and the Spark==SQL threshold parity
that the d05 oracle gate then proves end-to-end on the corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_governance_spark.operators.sampling import (
    hash_sample,
    hash_split,
    sample_pred_sql,
    split_case_sql,
    threshold_hex,
)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).withColumnRenamed("id", "k")


class TestThresholdHex:
    def test_width_and_order(self):
        assert threshold_hex(0.0) == "00000000"
        assert threshold_hex(0.5) == "80000000"
        assert len(threshold_hex(0.9999)) == 8

    def test_full_fraction_includes_everything(self):
        # 'g' sorts after every hex string; "100000000" would not
        assert "ffffffff" < threshold_hex(1.0)

    def test_out_of_range_rejected(self):
        with pytest.raises(ValueError):
            threshold_hex(1.5)


class TestHashSplit:
    def test_exhaustive_and_disjoint(self, ids):
        out = hash_split(ids, WEIGHTS, "k")
        assert out.count() == 5000
        assert out.filter(F.col("split").isNull()).count() == 0
        assert set(
            r["split"] for r in out.select("split").distinct().collect()
        ) == {"train", "val", "test"}

    def test_proportions_near_weights(self, ids):
        counts = {
            r["split"]: r["n"]
            for r in hash_split(ids, WEIGHTS, "k")
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert counts["train"] / 5000 == pytest.approx(0.8, abs=0.03)
        assert counts["val"] / 5000 == pytest.approx(0.1, abs=0.02)
        assert counts["test"] / 5000 == pytest.approx(0.1, abs=0.02)

    def test_stable_under_repartition(self, ids):
        a = {
            r["k"]: r["split"]
            for r in hash_split(ids, WEIGHTS, "k").collect()
        }
        b = {
            r["k"]: r["split"]
            for r in hash_split(ids.repartition(13), WEIGHTS, "k").collect()
        }
        assert a == b

    def test_growing_corpus_keeps_assignments(self, ids, spark):
        small = {
            r["k"]: r["split"]
            for r in hash_split(ids.limit(100), WEIGHTS, "k").collect()
        }
        big = {
            r["k"]: r["split"]
            for r in hash_split(ids, WEIGHTS, "k").collect()
        }
        assert all(big[k] == v for k, v in small.items())

    def test_bad_weights_rejected(self, ids):
        with pytest.raises(ValueError):
            hash_split(ids, {"a": 0.5, "b": 0.4}, "k")


class TestHashSample:
    def test_deterministic_filter(self, ids):
        a = sorted(r["k"] for r in hash_sample(ids, 0.25, "k").collect())
        b = sorted(
            r["k"]
            for r in hash_sample(ids.repartition(7), 0.25, "k").collect()
        )
        assert a == b
        assert len(a) / 5000 == pytest.approx(0.25, abs=0.03)

    def test_frac_edges(self, ids):
        assert hash_sample(ids, 0.0, "k").count() == 0
        assert hash_sample(ids, 1.0, "k").count() == 5000

    def test_seed_decorrelates(self, ids):
        a = set(r["k"] for r in hash_sample(ids, 0.5, "k", seed="s1").collect())
        b = set(r["k"] for r in hash_sample(ids, 0.5, "k", seed="s2").collect())
        jac = len(a & b) / len(a | b)
        assert 0.2 < jac < 0.45  # independent halves overlap ~1/3


class TestSqlMirrors:
    def test_split_case_matches_spark(self, ids, spark):
        """The SQL mirror evaluated BY SPARK must agree row-for-row
        with the column-expression implementation (DuckDB agreement is
        the d05 oracle gate's job)."""
        case = split_case_sql(WEIGHTS, "k")
        both = hash_split(ids, WEIGHTS, "k").withColumn(
            "split_sql", F.expr(case)
        )
        assert both.filter(F.col("split") != F.col("split_sql")).count() == 0

    def test_sample_pred_matches_spark(self, ids):
        pred = sample_pred_sql(0.25, "k")
        via_sql = set(r["k"] for r in ids.filter(F.expr(pred)).collect())
        via_col = set(r["k"] for r in hash_sample(ids, 0.25, "k").collect())
        assert via_sql == via_col


# --------------------------------------------------------------------------
# Cross-implementation differential: assignment recomputed with
# hashlib md5 must match Spark's md5 expression exactly.
def test_randomized_split_differential_vs_python(spark):
    import hashlib
    import random

    def py_split(key, weights, seed="split"):
        h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:8]
        cum = 0.0
        names = list(weights)
        for name in names[:-1]:
            cum += weights[name]
            if h < threshold_hex(cum):
                return name
        return names[-1]

    rng = random.Random(7)
    keys = [rng.randint(0, 10**12) for _ in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["split"] for r in hash_split(df, WEIGHTS, "k").collect()
    }
    for k in keys:
        assert got[k] == py_split(k, WEIGHTS), k


class TestStratified:
    def _df(self, spark):
        rows = [
            (i, ["web", "books", "code", None][i % 4]) for i in range(400)
        ]
        return spark.createDataFrame(rows, "doc_id long, domain string")

    def test_per_stratum_rates_and_default_drop(self, spark):
        from data_governance_spark.operators.sampling import (
            hash_sample_stratified,
        )

        df = self._df(spark)
        out = hash_sample_stratified(
            df, {"web": 0.25, "books": 1.0}, "domain", "doc_id"
        )
        got = {
            r["domain"]: r["n"]
            for r in out.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got.get("books") == 100  # frac 1.0 keeps every row
        assert 10 <= got.get("web", 0) <= 40  # ~25 of 100
        assert "code" not in got and None not in got  # default 0.0

    def test_monotone_in_fraction_and_stable(self, spark):
        """Raising a stratum's fraction only ADDS rows (same hash
        coordinate), and the decision is key-content-determined."""
        from data_governance_spark.operators.sampling import (
            hash_sample_stratified,
        )

        df = self._df(spark)
        lo = {
            r["doc_id"]
            for r in hash_sample_stratified(
                df, {"web": 0.2}, "domain", "doc_id"
            ).collect()
        }
        hi = {
            r["doc_id"]
            for r in hash_sample_stratified(
                df, {"web": 0.6}, "domain", "doc_id"
            ).collect()
        }
        assert lo <= hi
        again = {
            r["doc_id"]
            for r in hash_sample_stratified(
                df.repartition(7), {"web": 0.2}, "domain", "doc_id"
            ).collect()
        }
        assert again == lo

    def test_matches_sql_mirror(self, spark):
        import duckdb

        from data_governance_spark.operators.sampling import (
            hash_sample_stratified,
            stratified_pred_sql,
        )

        df = self._df(spark)
        fr = {"web": 0.3, "books": 0.7}
        got = sorted(
            r["doc_id"]
            for r in hash_sample_stratified(
                df, fr, "domain", "doc_id", default_frac=0.1
            ).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE t(doc_id BIGINT, domain VARCHAR)")
        con.executemany(
            "INSERT INTO t VALUES (?, ?)",
            [(i, ["web", "books", "code", None][i % 4]) for i in range(400)],
        )
        pred = stratified_pred_sql(fr, "domain", "doc_id", default_frac=0.1)
        want = [
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM t WHERE {pred} ORDER BY doc_id"
            ).fetchall()
        ]
        assert got == want

    def test_validation(self, spark):
        from data_governance_spark.operators.sampling import (
            hash_sample_stratified,
        )

        with pytest.raises(ValueError):
            hash_sample_stratified(
                self._df(spark), {"web": 1.5}, "domain", "doc_id"
            )
        with pytest.raises(ValueError):
            hash_sample_stratified(
                self._df(spark), {"web": 0.5}, "domain", "doc_id",
                default_frac=-0.1,
            )
