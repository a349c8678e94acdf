"""Driver-facing queries exercising the metric runner + top-k layer
over the generic testdata tables (the TMGL-shaped fixtures live in
tests; this wires the same code paths into the correctness gate)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_governance_spark.metrics.runner import (
    MetricSpec,
    run_metric,
    run_metric_sliced,
    run_metrics_single_scan,
    top_k,
)
from data_governance_spark.queries.base import QueryDef, qdef
from data_governance_spark.tables import table

QUERIES: dict[str, QueryDef] = {}


# --------------------------------------------------------------------------
# q17: the BASE_PIPELINE metric runner (A1-A14 engine) applied to events:
# entity = event_type, year from a free-text date derived off ts.
@qdef(
    QUERIES,
    "q17_metric_runner_events",
    oracle="""
    SELECT 'event' AS type, NULL AS region, event_type AS name,
           CAST(strftime(ts, '%Y') AS INT) AS year, count(*) AS count
    FROM events
    GROUP BY 3, 4
    """,
    doc="parameterized metric runner (ref BASE_PIPELINE A1-A14) over events",
)
def q17_metric_runner_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn(
        "dp", F.date_format("ts", "'recorded in' yyyy")
    )
    spec = MetricSpec(name="event", entity_col="event_type", min_year=1500)
    return run_metric(ev, spec)


# --------------------------------------------------------------------------
# q18: the top-k served layer (A19/O2) over runner output.
@qdef(
    QUERIES,
    "q18_topk_event_metrics",
    oracle="""
    SELECT type, region, name, total, rk FROM (
      SELECT 'event' AS type, NULL AS region, name, total,
             row_number() OVER (ORDER BY total DESC, name ASC) AS rk
      FROM (
        SELECT event_type AS name, count(*) AS total
        FROM events
        WHERE CAST(strftime(ts, '%Y') AS INT) BETWEEN 2024 AND 2025
        GROUP BY 1
      )
    ) WHERE rk <= 3
    """,
    doc="top-k window over metric-runner output (ref A19 dashboard top-k)",
)
def q18_topk_event_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn(
        "dp", F.date_format("ts", "yyyy")
    )
    m = run_metric(ev, MetricSpec(name="event", entity_col="event_type"))
    return top_k(m, k=3, year_min=2024, year_max=2025).select(
        "type", "region", "name", "total", "rk"
    )


# --------------------------------------------------------------------------
# q21: ALL metric families in one scan (SURVEY §3.2 "one multi-metric
# job via unpivot") — three families over events: raw event_type, a
# regex-derived bucket, and a value band. The reference runs one Mongo
# aggregation per family; run_metrics one Spark job per family; this
# runs ONE job, one scan (asserted in tests/test_plans.py).
@qdef(
    QUERIES,
    "q21_multimetric_single_scan",
    oracle="""
    SELECT 'event' AS type, NULL AS region, event_type AS name,
           CAST(strftime(ts, '%Y') AS INT) AS year, count(*) AS count
    FROM events GROUP BY 3, 4
    UNION ALL
    SELECT 'kmod', NULL,
           CAST(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) % 10
                AS VARCHAR),
           CAST(strftime(ts, '%Y') AS INT), count(*)
    FROM events GROUP BY 3, 4
    UNION ALL
    SELECT 'band', NULL,
           CASE WHEN value < 50 THEN 'low'
                WHEN value < 150 THEN 'mid' ELSE 'high' END,
           CAST(strftime(ts, '%Y') AS INT), count(*)
    FROM events GROUP BY 3, 4
    """,
    doc="3 metric families unpivoted from ONE fact scan (stack + explode + "
    "one hash aggregate)",
)
def q21_multimetric_single_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn(
        "dp", F.date_format("ts", "yyyy")
    )
    specs = [
        MetricSpec(name="event", entity_col="event_type"),
        MetricSpec(
            name="kmod",
            entity_col="props",
            entity_expr=lambda c: (
                F.regexp_extract(c, r'"k":\s*(\d+)', 1).cast("int") % 10
            ).cast("string"),
        ),
        MetricSpec(
            name="band",
            entity_col="value",
            entity_expr=lambda c: F.when(c < 50, "low")
            .when(c < 150, "mid")
            .otherwise("high"),
        ),
    ]
    return run_metrics_single_scan(ev, specs)


# --------------------------------------------------------------------------
# q34: the sliced runner (A13/A14 + J10) under the oracle gate —
# run_metric_sliced fans events out to WHO-region-style slices via
# attach_slice's inline country->regions map and unions the global
# (region=NULL) pass. The synthesized countries column exercises:
# case/whitespace key normalization (' C3 ' vs dim 'c3'), a country in
# TWO regions (nk%8==0 also maps to 'rx'), two same-region countries on
# one fact counted ONCE (u%6==0 adds the +5 country, same region mod
# 5), an unmatched country ('cX'), and empty country lists (u%9==0)
# that appear only in the global rows. Replaces the reference's
# N+1 per-region server loop (tmgl_regions/dag_02_languages.py:93-142).
@qdef(
    QUERIES,
    "q34_sliced_metric_runner",
    oracle="""
    WITH ev AS (
      SELECT event_id, event_type, CAST(strftime(ts, '%Y') AS INT) AS year,
             user_id AS u
      FROM events
    ),
    cn AS (
      SELECT event_id, c FROM ev, UNNEST(
        CASE WHEN u % 9 = 0 THEN [] ELSE
          ['c' || CAST(u % 25 AS VARCHAR)]
          || CASE WHEN u % 4 = 0
                  THEN ['c' || CAST((u + 1) % 25 AS VARCHAR)] ELSE [] END
          || CASE WHEN u % 6 = 0
                  THEN ['c' || CAST((u % 25 + 5) % 25 AS VARCHAR)] ELSE [] END
          || CASE WHEN u % 7 = 0 THEN ['cx'] ELSE [] END
        END) AS t(c)
    ),
    dim AS (
      SELECT 'c' || CAST(n_nationkey AS VARCHAR) AS c,
             'r' || CAST(n_nationkey % 5 AS VARCHAR) AS r FROM nation
      UNION ALL
      SELECT 'c' || CAST(n_nationkey AS VARCHAR), 'rx'
      FROM nation WHERE n_nationkey % 8 = 0
    ),
    er AS (SELECT DISTINCT cn.event_id, dim.r FROM cn JOIN dim USING (c)),
    sliced AS (
      SELECT 'event' AS type, er.r AS region, ev.event_type AS name,
             ev.year, count(*) AS count
      FROM ev JOIN er USING (event_id)
      GROUP BY 2, 3, 4
    ),
    unsliced AS (
      SELECT 'event' AS type, NULL AS region, event_type AS name,
             year, count(*) AS count
      FROM ev GROUP BY 3, 4
    )
    SELECT * FROM sliced UNION ALL SELECT * FROM unsliced
    """,
    doc="sliced metric runner: inline-map region fan-out + global pass "
    "(ref per-region/per-country N+1 loop collapsed to 2 scans)",
)
def q34_sliced_metric_runner(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn(
        "dp", F.date_format("ts", "yyyy")
    )
    u = F.col("user_id")
    s = lambda c: c.cast("string")  # noqa: E731
    empty = F.array().cast("array<string>")
    countries = F.when(u % 9 == 0, empty).otherwise(
        F.concat(
            F.array(F.concat(F.lit(" C"), s(u % 25), F.lit(" "))),
            F.when(
                u % 4 == 0, F.array(F.concat(F.lit("C"), s((u + 1) % 25)))
            ).otherwise(empty),
            F.when(
                u % 6 == 0, F.array(F.concat(F.lit("c"), s((u % 25 + 5) % 25)))
            ).otherwise(empty),
            F.when(u % 7 == 0, F.array(F.lit("cX"))).otherwise(empty),
        )
    )
    ev = ev.withColumn("countries", countries)
    nation = table(spark, sf_dir, "nation")
    nk = F.col("n_nationkey")
    dim = nation.select(
        F.concat(F.lit("c"), s(nk)).alias("country_key"),
        F.concat(F.lit("r"), s(nk % 5)).alias("who_region"),
    ).unionByName(
        nation.filter(nk % 8 == 0).select(
            F.concat(F.lit("c"), s(nk)).alias("country_key"),
            F.lit("rx").alias("who_region"),
        )
    )
    return run_metric_sliced(
        ev, MetricSpec(name="event", entity_col="event_type"), "countries", dim
    )


# --------------------------------------------------------------------------
# q46: the two-phase salted aggregation (skew.py) under the oracle
# gate — results must be EXACTLY a plain groupBy (the salt only changes
# the physical distribution). Sums go through DECIMAL so the two-phase
# summation order cannot diverge from the oracle's single-phase one.
@qdef(
    QUERIES,
    "q46_salted_aggregation",
    oracle="""
    SELECT event_type, count(*) AS count,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
    doc="skew-safe two-phase salted count/sum == plain groupBy results",
)
def q46_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.operators.skew import salted_count, salted_sum

    ev = table(spark, sf_dir, "events")
    counts = salted_count(ev, ["event_type"], buckets=8)
    sums = salted_sum(
        ev,
        ["event_type"],
        F.col("value").cast("decimal(18,2)"),
        buckets=8,
        sum_alias="sum_value",
    )
    return counts.join(sums, "event_type").select(
        "event_type", "count", F.col("sum_value").cast("double").alias("sum_value")
    )
