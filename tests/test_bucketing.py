"""Bucketed co-located join: the shuffle really disappears.

Writes orders + lineitem bucketed by orderkey into a temp-location
database and asserts the join plan has NO Exchange on either side —
the plan property that makes repeated large-large joins viable at
100 TB (every shuffle of a 100 TB fact table is the bottleneck)."""

from __future__ import annotations

import pytest

from data_governance_spark.operators.bucketing import bucketed_join, write_bucketed
from data_governance_spark.tables import table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketed_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{loc}'")
    yield "bdemo"
    spark.sql("DROP DATABASE IF EXISTS bdemo CASCADE")


def test_bucketed_join_is_shuffle_free(spark, bucketed_db):
    orders = table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    lineitem = table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "bdemo.orders_b", ["o_orderkey"], buckets=4)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bdemo.lineitem_b",
        ["o_orderkey"],
        buckets=4,
    )
    # force the sort-merge path (a broadcast would hide the point)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bdemo.orders_b", "bdemo.lineitem_b", ["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        # and it computes the right thing
        expected = (
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
            .join(orders, "o_orderkey")
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
