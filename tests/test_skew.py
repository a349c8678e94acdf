from __future__ import annotations

from pyspark.sql import functions as F

from data_governance_spark.operators.skew import salted_count, salted_sum


def test_salted_count_matches_plain(spark):
    df = spark.range(0, 10000).select(
        (F.when(F.col("id") % 100 == 0, F.lit("cold")).otherwise(F.lit("hot"))).alias("k")
    )
    salted = {r["k"]: r["count"] for r in salted_count(df, ["k"]).collect()}
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    assert salted == plain


def test_salted_sum_matches_plain(spark):
    df = spark.range(0, 5000).select(
        F.lit("only_key").alias("k"), (F.col("id") % 7).alias("v")
    )
    salted = salted_sum(df, ["k"], "v").collect()[0]["sum"]
    plain = df.agg(F.sum("v")).collect()[0][0]
    assert salted == plain
