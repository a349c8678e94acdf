"""Relational operator suite over the TPC-H-ish testdata tables.

Each query re-expresses an operator family from SURVEY.md §2 (the
reference's MongoDB-pipeline / Python operators) as an idiomatic
Catalyst plan, and carries a DuckDB oracle. Money aggregates are cast
to DECIMAL per-row before summing so Spark and the oracle agree
bit-for-bit regardless of summation order (doubles summed in different
orders diverge in the last ulps; decimals don't).

Scale notes (100 TB posture):
- dimension joins (nation/region/part/supplier/customer) are
  broadcast() — no shuffle of the fact side on the build key;
- aggregations are partial-agg friendly (plain hash aggregates);
- top-k uses window rank per group (scales) or orderBy+limit for
  global k (driver receives k rows only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from data_governance_spark.queries.base import melt_metrics, QueryDef, qdef
from data_governance_spark.tables import table

QUERIES: dict[str, QueryDef] = {}

MONEY = "decimal(18,2)"
MONEY4 = "decimal(18,4)"


def _dec(col: F.Column, typ: str = MONEY) -> F.Column:
    return col.cast(typ)


# --------------------------------------------------------------------------
# q1: grouped aggregation with multiple measures (SURVEY A1-A11 family:
# the reference's universal $group shape; conditional measures like A11).
@qdef(
    QUERIES,
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_disc_price,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Pricing summary: hash aggregate w/ partial agg (ref A1-A11 $group shape)",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(_dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), MONEY4))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q2: multi-way join + global top-k (ref J1-J5 lookup joins + A19/O2
# client-side top-k promoted into the engine).
@qdef(
    QUERIES,
    "q02_top_revenue_orders",
    oracle="""
    SELECT o_orderkey, c_name, CAST(revenue AS DOUBLE) AS revenue FROM (
      SELECT o.o_orderkey, c.c_name,
             sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS revenue
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY o.o_orderkey, c.c_name
      ORDER BY revenue DESC, o_orderkey ASC
      LIMIT 10
    )
    """,
    doc="3-way join + deterministic global top-k (revenue desc, key asc)",
)
def q02_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "c_name")
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), MONEY4)
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        # final projection only: ranking happened on the exact decimal
        .withColumn("revenue", F.col("revenue").cast("double"))
    )


# --------------------------------------------------------------------------
# q3: broadcast dim-chain join + ROLLUP (ref A13/A14: the per-region /
# per-country query-loop fan-out collapsed into one grouped scan;
# SURVEY §4 calls this the one real optimizer-adjacent redesign).
@qdef(
    QUERIES,
    "q03_region_nation_rollup",
    oracle="""
    SELECT r.r_name, n.n_name,
           count(*)                                                 AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)  AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    doc="Broadcast dim joins + ROLLUP(region, nation): global+sliced rows in one scan",
)
def q03_region_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("sum_acctbal"),
    )


# --------------------------------------------------------------------------
# q4: semi-join / EXISTS (ref J14 export-eligibility semi-join; S4
# IN-list pushdown family).
@qdef(
    QUERIES,
    "q04_priority_with_late_lines",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
    doc="left-semi join (EXISTS) then grouped count",
)
def q04_priority_with_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate)
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# q5: conditional counts per day (ref A11 timeline: total + with_fulltext
# conditional sum; F17 date slicing).
@qdef(
    QUERIES,
    "q05_event_rollups",
    oracle="""
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(count(*) AS DOUBLE) AS ne,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS np,
             CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(value AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS pv
      FROM events GROUP BY 1
    )
    SELECT 'daily' AS gate, day || ':ne' AS k,
           CAST(NULL AS VARCHAR) AS v_s, ne AS v_d FROM daily
    UNION ALL
    SELECT 'daily', day || ':np', CAST(NULL AS VARCHAR), np FROM daily
    UNION ALL
    SELECT 'daily', day || ':pv', CAST(NULL AS VARCHAR), pv FROM daily
    UNION ALL
    SELECT 'recode',
           CASE WHEN event_type = 'purchase' THEN 'Conversion'
                WHEN event_type = 'signup'   THEN 'Acquisition'
                WHEN event_type IN ('click', 'view') THEN 'Engagement'
                WHEN event_type = 'error'    THEN 'Failure'
                ELSE 'Other' END,
           CAST(NULL AS VARCHAR), CAST(count(*) AS DOUBLE)
    FROM events GROUP BY 2
    """,
    doc="merged gate (r5 driver-budget): date-derived key + conditional "
    "count/sum (ref A11/A12 timeline+map, ex-q05) UNION when-chain "
    "recode + grouped count (ref A3/A4 $switch recodes, ex-q06)",
)
def q05_event_rollups(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    daily = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("ne"),
        F.sum(F.when(is_purchase, 1).otherwise(0)).cast("double").alias("np"),
        F.sum(F.when(is_purchase, _dec(F.col("value"))).otherwise(_dec(F.lit(0))))
        .cast("double")
        .alias("pv"),
    )
    daily_u = melt_metrics(daily, F.col("day"), ("ne", "np", "pv"), "daily")
    et = F.col("event_type")
    recoded = (
        F.when(et == "purchase", "Conversion")
        .when(et == "signup", "Acquisition")
        .when(et.isin("click", "view"), "Engagement")
        .when(et == "error", "Failure")
        .otherwise("Other")
    )
    recode_u = (
        ev.groupBy(recoded.alias("k"))
        .agg(F.count(F.lit(1)).cast("double").alias("v_d"))
        .select(
            F.lit("recode").alias("gate"),
            "k",
            F.lit(None).cast("string").alias("v_s"),
            "v_d",
        )
    )
    return daily_u.unionByName(recode_u)


# --------------------------------------------------------------------------
# q7: per-group top-k via window rank (ref A19/O2: client-side JS
# sort+slice promoted to a scalable window; deterministic tie-break
# count desc, key asc per SURVEY §7.4 item 8).
@qdef(
    QUERIES,
    "q07_top_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, CAST(revenue AS DOUBLE) AS revenue, rk FROM (
      SELECT p.p_brand, p.p_partkey,
             sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS revenue,
             row_number() OVER (
               PARTITION BY p.p_brand
               ORDER BY sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) DESC,
                        p.p_partkey ASC
             ) AS rk
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, p.p_partkey
    ) WHERE rk <= 3
    """,
    doc="windowed top-k per group w/ deterministic tie-break (ref A19 top-k)",
)
def q07_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), MONEY4)
            ).alias("revenue")
        )
    )
    w = W.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .withColumn("revenue", F.col("revenue").cast("double"))
    )


# --------------------------------------------------------------------------
# q8: UNION ALL with provenance column (ref U1: $unionWith of
# TEMAS_BVS2 collections + $addFields _source).
@qdef(
    QUERIES,
    "q08_union_provenance",
    oracle="""
    SELECT 'customer' AS _source, c_name AS name,
           CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer
    UNION ALL
    SELECT 'supplier' AS _source, s_name AS name,
           CAST(s_acctbal AS DOUBLE) AS acctbal
    FROM supplier
    """,
    doc="unionByName with provenance _source column (ref U1 union view)",
)
def q08_union_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("_source"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").cast("double").alias("acctbal"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("_source"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").cast("double").alias("acctbal"),
    )
    return cust.unionByName(supp)


# --------------------------------------------------------------------------
# q9 (merged gate, r5 driver-budget): distinct (ref A15, ex-q09) +
# global min/max incl. derived year (ref O5, ex-q10) + map-literal
# status decode (ref F16, ex-q11) in one quad-schema union.
@qdef(
    QUERIES,
    "q09_scalar_stats",
    oracle="""
    SELECT 'seg' AS gate, c_mktsegment AS k,
           CAST(NULL AS VARCHAR) AS v_s, CAST(NULL AS DOUBLE) AS v_d
    FROM (SELECT DISTINCT c_mktsegment FROM customer)
    UNION ALL
    SELECT 'range', 'min_day', strftime(min(o_orderdate), '%Y-%m-%d'),
           CAST(NULL AS DOUBLE) FROM orders
    UNION ALL
    SELECT 'range', 'max_day', strftime(max(o_orderdate), '%Y-%m-%d'),
           CAST(NULL AS DOUBLE) FROM orders
    UNION ALL
    SELECT 'range', 'min_year', CAST(NULL AS VARCHAR),
           CAST(min(CAST(strftime(o_orderdate, '%Y') AS INT)) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'range', 'max_year', CAST(NULL AS VARCHAR),
           CAST(max(CAST(strftime(o_orderdate, '%Y') AS INT)) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'status',
           CASE o_orderstatus
             WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Finished' WHEN 'P' THEN 'Pending'
             ELSE 'Unknown' END,
           CAST(NULL AS VARCHAR), CAST(count(*) AS DOUBLE)
    FROM orders
    GROUP BY 2
    """,
    doc="merged gate (r5 driver-budget): distinct over a low-cardinality "
    "column (ref A15, ex-q09) + global min/max incl. derived year "
    "(ref O5, ex-q10) + map-literal status decode (ref F16, ex-q11)",
)
def q09_scalar_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    nul_s = F.lit(None).cast("string")
    nul_d = F.lit(None).cast("double")
    seg = (
        table(spark, sf_dir, "customer")
        .select("c_mktsegment")
        .distinct()
        .select(
            F.lit("seg").alias("gate"),
            F.col("c_mktsegment").alias("k"),
            nul_s.alias("v_s"),
            nul_d.alias("v_d"),
        )
    )
    orders = table(spark, sf_dir, "orders")
    rng = orders.agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("min_day"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("max_day"),
        F.min(F.year("o_orderdate")).cast("double").alias("min_year"),
        F.max(F.year("o_orderdate")).cast("double").alias("max_year"),
    )
    rng_u = rng.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("min_day").alias("k"),
                    F.col("min_day").alias("v_s"),
                    nul_d.alias("v_d"),
                ),
                F.struct(
                    F.lit("max_day").alias("k"),
                    F.col("max_day").alias("v_s"),
                    nul_d.alias("v_d"),
                ),
                F.struct(
                    F.lit("min_year").alias("k"),
                    nul_s.alias("v_s"),
                    F.col("min_year").alias("v_d"),
                ),
                F.struct(
                    F.lit("max_year").alias("k"),
                    nul_s.alias("v_s"),
                    F.col("max_year").alias("v_d"),
                ),
            )
        ).alias("e")
    ).select(
        F.lit("range").alias("gate"),
        F.col("e.k").alias("k"),
        F.col("e.v_s").alias("v_s"),
        F.col("e.v_d").alias("v_d"),
    )
    decode = F.create_map(
        F.lit("O"), F.lit("Open"), F.lit("F"), F.lit("Finished"), F.lit("P"), F.lit("Pending")
    )
    label = F.coalesce(
        F.element_at(decode, F.col("o_orderstatus")), F.lit("Unknown")
    )
    status = orders.groupBy(label.alias("k")).agg(
        F.count(F.lit(1)).cast("double").alias("v_d")
    ).select(
        F.lit("status").alias("gate"), "k", nul_s.alias("v_s"), "v_d"
    )
    return seg.unionByName(rng_u).unionByName(status)


# --------------------------------------------------------------------------
# q12: regex capture extraction + cast + group (ref F1/F2: year / id
# extraction from free text via regexFind).
@qdef(
    QUERIES,
    "q12_regex_extract_props",
    oracle="""
    SELECT CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) % 10 AS k_bucket,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
    doc="regex capture-group extract from a JSON-ish string (ref F1/F2)",
)
def q12_regex_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("int")
    return ev.groupBy((k % 10).alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("value"))).cast("double").alias("sum_value"),
    )


# --------------------------------------------------------------------------
# q13: anti-join (NOT EXISTS) — complement of the semi-join family.
@qdef(
    QUERIES,
    "q13_customers_without_orders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
    doc="left-anti join then grouped count",
)
def q13_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --------------------------------------------------------------------------
# q14: multi-aggregate outer combine + coalesce-to-zero (ref J4/J5
# two-key coalescing lookups; per-nation fan-out collapsed).
@qdef(
    QUERIES,
    "q14_nation_customer_supplier_counts",
    oracle="""
    SELECT n.n_name,
           coalesce(c.n_customers, 0) AS n_customers,
           coalesce(s.n_suppliers, 0) AS n_suppliers
    FROM nation n
    LEFT JOIN (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY 1) c
      ON n.n_nationkey = c.c_nationkey
    LEFT JOIN (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1) s
      ON n.n_nationkey = s.s_nationkey
    """,
    doc="two grouped counts left-joined to a dim + coalesce fallback (ref J4/J5)",
)
def q14_nation_customer_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    cust_counts = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp_counts = (
        table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        nation.join(cust_counts, nation.n_nationkey == cust_counts.c_nationkey, "left")
        .join(supp_counts, nation.n_nationkey == supp_counts.s_nationkey, "left")
        .select(
            "n_name",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


# --------------------------------------------------------------------------
# q15: time-window aggregation (batch shape of the Structured Streaming
# job in streaming/events.py; ref has no true streams — SURVEY §2.8 —
# this is the additive streaming-capable operator).
@qdef(
    QUERIES,
    "q15_hourly_event_windows",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="tumbling 1h window x event_type (batch twin of the streaming agg)",
)
def q15_hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec(F.col("value"))).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# q16: pivot (ref F7 language-keyed pivot of titles/abstracts; metrics
# export long->wide pivot S14).
@qdef(
    QUERIES,
    "q16_status_by_priority_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_O,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_F,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_P
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="long->wide pivot with fixed value list (ref F7/S14 pivots)",
)
def q16_status_by_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
    )


# --------------------------------------------------------------------------
# q19: gap-based sessionization via lag + running sum — the stateful
# per-key sequence operator (streaming's session-window twin, batch
# form; no reference equivalent — training-pipeline addition).
@qdef(
    QUERIES,
    "q19_user_sessions",
    oracle="""
    SELECT user_id, session_id, count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM (
      SELECT user_id, ts,
             CAST(sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
      )
    )
    GROUP BY user_id, session_id
    """,
    doc="gap-based sessionization (lag + running sum), 30-min timeout",
)
def q19_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        # unix_micros: exact microsecond gap, matching the oracle's
        # INTERVAL comparison (cast-to-long truncates to seconds and
        # can merge sessions 1800.x s apart when the fractions align)
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 30 * 60 * 1_000_000),
        1,
    ).otherwise(0)
    sessions = ev.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


# --------------------------------------------------------------------------
# q20: exact distinct-count aggregates (A15 distinct generalized).
@qdef(
    QUERIES,
    "q20_event_type_user_stats",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events,
           round(count(*) / count(DISTINCT user_id), 4) AS events_per_user
    FROM events
    GROUP BY event_type
    """,
    doc="count distinct + ratio per group",
)
def q20_event_type_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.count(F.lit(1)) / F.countDistinct("user_id"), 4
        ).alias("events_per_user"),
    )


# --------------------------------------------------------------------------
# q22: the reference-parity standardize scalar builders (F13 id
# synthesis, F16 status decode, F17 date slicing, A18 weight) driven
# through the oracle gate. The testdata has no bibliographic landing
# zone, so one is synthesized DETERMINISTICALLY from orders — the
# builders under test are the real ones from standardize/fields.py
# (cited there into /root/reference), not reimplementations.
@qdef(
    QUERIES,
    "q22_standardize_scalars",
    oracle="""
    WITH landing AS (
      SELECT o_orderkey AS id,
             CASE WHEN o_orderkey % 3 = 0
                  THEN CAST(o_orderkey * 7 AS VARCHAR) END AS lilacs_id,
             CAST(o_orderkey % 7 - 3 AS INT) AS status,
             strftime(o_orderdate, '%Y%m%d') AS pdn,
             strftime(o_orderdate, '%Y-%m-%d') || 'T10:00:00' AS created_time,
             strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS updated_time,
             CASE o_orderkey % 5 WHEN 0 THEN 'S' WHEN 1 THEN 'T'
                  WHEN 2 THEN 'M' WHEN 3 THEN 'N' ELSE 'X' END AS lit_type,
             o_orderkey % 2 = 0 AS has_abstract,
             o_orderkey % 4 = 0 AS has_ea
      FROM orders
    )
    SELECT id,
           CASE WHEN lilacs_id IS NOT NULL AND lilacs_id <> ''
                THEN 'lil-' || lilacs_id ELSE 'biblio-' || CAST(id AS VARCHAR)
           END AS doc_id,
           CASE status WHEN -3 THEN 'Migrado' WHEN -2 THEN 'Coletado'
                WHEN -1 THEN 'Rascunho' WHEN 0 THEN 'LILACS-Express'
                WHEN 1 THEN 'Publicado' WHEN 2 THEN 'Recusado'
                WHEN 3 THEN 'Apagado' END AS status_label,
           substr(pdn, 1, 6) AS da,
           replace(substr(created_time, 1, 10), '-', '') AS entry_date,
           replace(substr(updated_time, 1, 10), '-', '') AS update_date,
           greatest(
             CASE WHEN lower(lit_type) LIKE 's%' THEN 15
                  WHEN lower(lit_type) LIKE 't%' THEN 10
                  WHEN lower(lit_type) LIKE 'm%' THEN 5
                  WHEN lower(lit_type) LIKE 'n%' THEN 2 ELSE 0 END
             + (20 - (2026 - CAST(substr(pdn, 1, 4) AS INT)))
             + CASE WHEN has_abstract THEN 5 ELSE 0 END
             + CASE WHEN has_ea THEN 5 ELSE 0 END, 0) AS weight
    FROM landing
    """,
    doc="standardize scalar builders (F13/F16/F17/A18) over a synthetic "
    "landing derived from orders; real fields.py code under the gate",
)
def q22_standardize_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.standardize import fields as sf

    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    landing = o.select(
        k.alias("id"),
        F.when(k % 3 == 0, (k * 7).cast("string")).alias("lilacs_id"),
        (k % 7 - 3).cast("int").alias("status"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("pdn"),
        F.concat(
            F.date_format("o_orderdate", "yyyy-MM-dd"), F.lit("T10:00:00")
        ).alias("created_time"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("updated_time"),
        F.element_at(
            F.array(F.lit("S"), F.lit("T"), F.lit("M"), F.lit("N"), F.lit("X")),
            (k % 5 + 1).cast("int"),
        ).alias("lit_type"),
        F.when(k % 2 == 0, F.array(F.lit("abs"))).otherwise(
            F.array().cast("array<string>")
        ).alias("abstract"),
        F.when(k % 4 == 0, F.array(F.lit("http://x"))).otherwise(
            F.array().cast("array<string>")
        ).alias("ea"),
    )
    return landing.select(
        "id",
        sf.doc_id(F.col("id"), F.col("lilacs_id")).alias("doc_id"),
        sf.status_label(F.col("status")).alias("status_label"),
        sf.da(F.col("pdn")).alias("da"),
        sf.entry_date(F.col("created_time"), F.lit(None)).alias("entry_date"),
        sf.update_date(F.col("updated_time")).alias("update_date"),
        sf.weight(
            F.col("lit_type"),
            F.col("pdn"),
            F.col("abstract"),
            F.col("ea"),
            current_year=2026,
        ).alias("weight"),
    )


# --------------------------------------------------------------------------
# q23: the F11 citation builder (all four treatment_level formats) under
# the oracle gate. Spark runs the REAL citation.fo expression tree over
# struct arrays synthesized from o_orderkey arithmetic; the oracle
# computes the expected strings from the same arithmetic — so the
# punctuation-exact format logic (SURVEY F11, reference
# 02_create_iahx_xml_collection.py:273-459) is value-checked row by row.
@qdef(
    QUERIES,
    "q23_citation_formats",
    oracle="""
    WITH synth AS (
      SELECT o_orderkey AS id, o_orderkey AS k,
        ['as','am','m','c','zz'][CAST(o_orderkey % 5 AS INT) + 1] AS tl,
        CASE WHEN o_orderkey % 3 > 0 THEN 'J' || CAST(o_orderkey % 7 AS VARCHAR) ELSE '' END AS ts,
        CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_orderkey % 9 AS VARCHAR) ELSE '' END AS vol,
        CASE WHEN o_orderkey % 4 = 0 THEN CAST(o_orderkey % 5 AS VARCHAR) ELSE '' END AS iss,
        strftime(o_orderdate, '%Y') AS pd,
        CASE WHEN o_orderkey % 3 = 0 THEN 'City' || CAST(o_orderkey % 4 AS VARCHAR) ELSE '' END AS city,
        CASE WHEN o_orderkey % 2 = 0 THEN 'Pub' || CAST(o_orderkey % 3 AS VARCHAR) ELSE '' END AS publisher,
        CASE WHEN o_orderkey % 6 = 0 THEN 'ed.' || CAST(o_orderkey % 2 AS VARCHAR) ELSE '' END AS edition,
        CASE WHEN o_orderkey % 7 < 3 THEN CAST(100 + o_orderkey % 40 AS VARCHAR)
             WHEN o_orderkey % 7 = 3 THEN CAST(o_orderkey % 40 AS VARCHAR) || ' pgs'
             ELSE '' END AS pm,
        CASE WHEN o_orderkey % 8 = 0 THEN 'SYM' || CAST(o_orderkey % 3 AS VARCHAR) ELSE '' END AS sym,
        CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_orderkey % 50 + 1 AS VARCHAR) END AS pf,
        CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_orderkey % 50 + 9 AS VARCHAR) END AS pl,
        CASE WHEN o_orderkey % 4 = 1 THEN 'p. ' || CAST(o_orderkey % 20 AS VARCHAR) END AS ptx,
        CASE WHEN o_orderkey % 6 = 0 THEN 'D' || CAST(o_orderkey % 3 AS VARCHAR) END AS dsc,
        o_orderkey % 5 = 1 AND o_orderkey % 3 > 0 AS has_ind,
        o_orderkey % 5 = 1 AND o_orderkey % 3 = 0 AS has_corp,
        CASE WHEN o_orderkey % 5 = 1 THEN 'Title M' END AS titles
      FROM orders
    ), fmt AS (
      SELECT id, tl,
        CASE WHEN has_ind THEN 'Auth A; Auth B' WHEN has_corp THEN 'Corp X' END AS authors,
        CASE WHEN pm <> '' THEN (CASE WHEN instr(pm, 'p') > 0 THEN pm || ' ' ELSE pm || ' p. ' END) ELSE '' END AS pagesm,
        concat(CASE WHEN ts <> '' THEN '(' || ts ELSE '' END,
               CASE WHEN vol <> '' THEN ', ' || vol ELSE '' END,
               CASE WHEN iss <> '' THEN ', ' || iss ELSE '' END,
               CASE WHEN ts <> '' THEN ').' ELSE '' END,
               CASE WHEN sym <> '' THEN ' (' || sym || ').' ELSE '' END) AS paren,
        * EXCLUDE (id, tl)
      FROM synth
    ), built AS (
      SELECT id, tl,
        trim(concat(ts,
          CASE WHEN vol <> '' THEN ';' || vol ELSE '' END,
          CASE WHEN iss <> '' THEN '(' || iss || ')' ELSE '' END,
          CASE WHEN pf IS NOT NULL THEN ': ' || pf ELSE '' END,
          CASE WHEN pl IS NOT NULL THEN '-' || pl ELSE '' END,
          coalesce(ptx, ''),
          CASE WHEN pd <> '' THEN ', ' || pd || '.' ELSE '' END,
          CASE WHEN dsc IS NOT NULL THEN ' ' || dsc ELSE '' END)) AS fo_as,
        trim(concat(
          CASE WHEN has_ind OR has_corp THEN 'In. ' ELSE '' END,
          CASE WHEN (has_ind OR has_corp) AND authors IS NOT NULL THEN authors || '. ' ELSE '' END,
          CASE WHEN titles IS NOT NULL THEN titles || '.' ELSE '' END,
          CASE WHEN city <> '' THEN ' ' || city || ', ' ELSE '' END,
          CASE WHEN publisher <> '' THEN publisher || ', ' ELSE '' END,
          CASE WHEN edition <> '' THEN edition || ', ' ELSE '' END,
          CASE WHEN pd <> '' THEN pd || '.' ELSE '' END,
          CASE WHEN pf IS NOT NULL AND pl IS NOT NULL THEN ' p. ' || pf || '-' || pl ELSE '' END,
          CASE WHEN ptx IS NOT NULL THEN ' p. ' || ptx ELSE '' END,
          CASE WHEN dsc IS NOT NULL THEN ', ' || dsc || '. ' ELSE '' END,
          paren)) AS fo_am,
        trim(CASE WHEN city <> '' OR edition <> '' OR publisher <> ''
          THEN concat(
            CASE WHEN city <> '' THEN city || '; ' ELSE '' END,
            CASE WHEN publisher <> '' THEN publisher || '; ' ELSE '' END,
            CASE WHEN edition <> '' THEN edition || '; ' ELSE '' END,
            CASE WHEN pd <> '' THEN pd || '. ' ELSE '' END,
            pagesm,
            CASE WHEN dsc IS NOT NULL THEN dsc || '.' ELSE '' END,
            paren)
          ELSE paren END) AS fo_m,
        trim(CASE WHEN city <> '' THEN city || '; ' || concat(
            CASE WHEN publisher <> '' THEN publisher || '; ' ELSE '' END,
            CASE WHEN edition <> '' THEN edition || '; ' ELSE '' END,
            CASE WHEN pd <> '' THEN pd || '. ' ELSE '' END,
            pagesm,
            CASE WHEN dsc IS NOT NULL THEN dsc || '.' ELSE '' END)
          ELSE '' END) AS fo_c
      FROM fmt
    )
    SELECT id, CASE WHEN fo_raw <> '' THEN fo_raw END AS fo FROM (
      SELECT id, CASE tl WHEN 'as' THEN fo_as WHEN 'am' THEN fo_am
                         WHEN 'm' THEN fo_m WHEN 'c' THEN fo_c END AS fo_raw
      FROM built
    )
    """,
    doc="F11 citation builder, all 4 treatment_level formats, "
    "punctuation-exact vs an arithmetic oracle",
)
def q23_citation_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.standardize.citation import fo_standard

    # single-row-group input + the fo citation tree per row: fan out
    # (map-only gate, partitioning-invariant; see the q36 rationale)
    o = table(spark, sf_dir, "orders").repartition(
        spark.sparkContext.defaultParallelism
    )
    k = F.col("o_orderkey")

    def s(c):
        return c.cast("string")

    page_t = "array<struct<_f:string,_l:string,text:string,f:string,_e:string>>"
    di_t = "array<struct<_b:string>>"
    au_t = "array<struct<text:string>>"
    nul = F.lit(None).cast("string")

    def pg_struct(f, l, t):
        return F.struct(
            f.alias("_f"), l.alias("_l"), t.alias("text"),
            nul.alias("f"), nul.alias("_e"),
        )

    landing = o.select(
        k.alias("id"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("as", "am", "m", "c", "zz")]),
            (k % 5 + 1).cast("int"),
        ).alias("treatment_level"),
        F.when(k % 3 > 0, F.concat(F.lit("J"), s(k % 7))).otherwise("").alias(
            "title_serial"
        ),
        F.when(k % 2 == 0, s(k % 9)).otherwise("").alias("volume_serial"),
        F.when(k % 4 == 0, s(k % 5)).otherwise("").alias("issue_number"),
        F.date_format("o_orderdate", "yyyy").alias("publication_date"),
        F.when(k % 3 == 0, F.concat(F.lit("City"), s(k % 4))).otherwise("").alias(
            "publication_city"
        ),
        F.when(k % 2 == 0, F.concat(F.lit("Pub"), s(k % 3))).otherwise("").alias(
            "publisher"
        ),
        F.when(k % 6 == 0, F.concat(F.lit("ed."), s(k % 2))).otherwise("").alias(
            "edition"
        ),
        F.when(k % 7 < 3, s(k % 40 + 100))
        .when(k % 7 == 3, F.concat(s(k % 40), F.lit(" pgs")))
        .otherwise("")
        .alias("pages_monographic"),
        F.when(k % 8 == 0, F.concat(F.lit("SYM"), s(k % 3))).otherwise("").alias(
            "symbol"
        ),
        # pages: even keys get two entries (last non-empty subfield wins:
        # entry 2's _f/_l); k%4==1 gets a text-only entry; k%4==3 empty
        F.when(
            k % 2 == 0,
            F.array(
                pg_struct(s(k % 50), nul, nul),
                pg_struct(s(k % 50 + 1), s(k % 50 + 9), nul),
            ),
        )
        .when(
            k % 4 == 1,
            F.array(pg_struct(nul, nul, F.concat(F.lit("p. "), s(k % 20)))),
        )
        .otherwise(F.lit(None).cast(page_t))
        .alias("pages"),
        F.when(
            k % 6 == 0,
            F.array(
                F.struct(F.concat(F.lit("D"), s(k % 3)).alias("_b")),
                F.struct(F.lit("").alias("_b")),
            ),
        )
        .otherwise(F.lit(None).cast(di_t))
        .alias("descriptive_information"),
        F.when(
            (k % 5 == 1) & (k % 3 > 0),
            F.array(
                F.struct(F.lit("Auth A").alias("text")),
                F.struct(F.lit("Auth B").alias("text")),
            ),
        )
        .otherwise(F.lit(None).cast(au_t))
        .alias("individual_author_monographic"),
        F.when(
            (k % 5 == 1) & (k % 3 == 0),
            F.array(F.struct(F.lit("Corp X").alias("text"))),
        )
        .otherwise(F.lit(None).cast(au_t))
        .alias("corporate_author_monographic"),
        F.when(k % 5 == 1, F.array(F.struct(F.lit("Title M").alias("text"))))
        .otherwise(F.lit(None).cast(au_t))
        .alias("title_monographic"),
    )
    return landing.select("id", fo_standard().alias("fo"))


# --------------------------------------------------------------------------
# q24: the array-shaped standardize builders (F9 pages, F10 URL
# classification, F15 doc-type derivation, F18 ta_fascic) under the
# oracle gate, same synthesis-from-arithmetic approach as q22/q23.
# Array outputs are '|'-joined so both engines hash plain strings.
@qdef(
    QUERIES,
    "q24_standardize_arrays",
    oracle="""
    WITH synth AS (
      SELECT o_orderkey AS id, o_orderkey AS k,
        CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_orderkey % 9 AS VARCHAR) ELSE '' END AS vol,
        CASE WHEN o_orderkey % 4 = 0 THEN CAST(o_orderkey % 5 AS VARCHAR) ELSE '' END AS iss,
        strftime(o_orderdate, '%Y') AS yr,
        ['s','msc','n','t','mcp',''][CAST(o_orderkey % 6 AS INT) + 1] AS lt,
        CASE o_orderkey % 3 WHEN 0 THEN 'http://ex0' WHEN 1 THEN 'www.ex1' ELSE 'gopher://ex2' END AS u1,
        CASE o_orderkey % 4 WHEN 0 THEN 'MULTIMEDIA' WHEN 1 THEN 'multimedia'
             WHEN 2 THEN chr(193) || 'UDIO' ELSE '' END AS y1,
        CASE WHEN o_orderkey % 7 = 0 THEN 'Video' ELSE '' END AS z1,
        CASE WHEN o_orderkey % 5 = 0 THEN 'meta' ELSE '' END AS x1,
        CASE WHEN o_orderkey % 9 = 0 THEN 'x.wav' ELSE '' END AS q1,
        o_orderkey % 2 = 0 AS has_e2,
        CASE WHEN o_orderkey % 3 = 0 THEN 'file' || CAST(o_orderkey % 9 AS VARCHAR) || '.mp3'
             ELSE 'ftp://f' || CAST(o_orderkey % 7 AS VARCHAR) END AS u2
      FROM orders
    )
    SELECT id,
      CASE CAST(k % 5 AS INT)
        WHEN 0 THEN '1-9' WHEN 1 THEN 'p. 5' WHEN 2 THEN '33'
        WHEN 3 THEN 'e77' ELSE '' END AS pages_s,
      u1 || CASE WHEN has_e2 THEN '|' || u2 ELSE '' END AS ur_s,
      CASE WHEN y1 LIKE '%MULTIM%' THEN u1 ELSE '' END AS ur_mm_s,
      CASE WHEN y1 LIKE '%UDIO%' THEN u1 ELSE '' END AS ur_audio_s,
      CASE WHEN x1 <> '' THEN u1 ELSE '' END AS ur_meta_s,
      CASE WHEN k % 3 IN (0, 1) THEN 1 END AS fulltext,
      coalesce(array_to_string(list_sort(list_filter([
        CASE WHEN contains(lt, 's') THEN 'article' END,
        CASE WHEN contains(lt, 'm') THEN 'monography' END,
        CASE WHEN contains(lt, 'n') THEN 'non-conventional' END,
        CASE WHEN contains(lt, 't') THEN 'thesis' END,
        CASE WHEN lt IN ('mc','mcp','msc','nc','sc','scp') THEN 'congress and conference' END,
        CASE WHEN lt IN ('mcp','mp','msp','np','scp','sp') THEN 'project document' END,
        CASE WHEN contains(lower(y1), 'multim') OR contains(lower(z1), 'deo') THEN 'video' END,
        CASE WHEN contains(lower(q1), '.wav')
                  OR (has_e2 AND (contains(lower(u2), '.mp3') OR contains(lower(u2), '.mp4')
                                  OR contains(lower(u2), '.wma') OR contains(lower(u2), '.wav')))
             THEN 'podcast' END
      ], x -> x IS NOT NULL)), '|'), '') AS doctype_s,
      CASE WHEN k % 3 = 0 THEN
        array_to_string([ta1, 'TB', ta1 || sfx, 'TB' || sfx], ',')
      ELSE '' END AS ta_fascic_s
    FROM (
      SELECT *,
        'TA' || CAST(k % 5 AS VARCHAR) AS ta1,
        '; ' || concat_ws(' ',
          CASE WHEN vol <> '' THEN vol END,
          CASE WHEN iss <> '' THEN '(' || iss || ')' END) || ', ' || yr AS sfx
      FROM synth
    )
    """,
    doc="F9/F10/F15/F18 array builders (pages, URL classes, doc types, "
    "fascicle labels) vs an arithmetic oracle",
)
def q24_standardize_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.standardize import fields as sf

    # single-row-group input + heavy per-row builders: fan out (map-only
    # gate, partitioning-invariant; see the q36 rationale)
    o = table(spark, sf_dir, "orders").repartition(
        spark.sparkContext.defaultParallelism
    )
    k = F.col("o_orderkey")

    def s(c):
        return c.cast("string")

    nul = F.lit(None).cast("string")

    def pg_struct(f=None, l=None, t=None, fb=None, e=None):
        return F.struct(
            (f if f is not None else nul).alias("_f"),
            (l if l is not None else nul).alias("_l"),
            (t if t is not None else nul).alias("text"),
            (fb if fb is not None else nul).alias("f"),
            (e if e is not None else nul).alias("_e"),
        )

    def ea_struct(u, y=None, z=None, x=None, q=None):
        return F.struct(
            u.alias("_u"),
            (y if y is not None else F.lit("")).alias("_y"),
            (z if z is not None else F.lit("")).alias("_z"),
            (x if x is not None else F.lit("")).alias("_x"),
            (q if q is not None else F.lit("")).alias("_q"),
        )

    u1 = (
        F.when(k % 3 == 0, F.lit("http://ex0"))
        .when(k % 3 == 1, F.lit("www.ex1"))
        .otherwise(F.lit("gopher://ex2"))
    )
    y1 = (
        F.when(k % 4 == 0, F.lit("MULTIMEDIA"))
        .when(k % 4 == 1, F.lit("multimedia"))
        .when(k % 4 == 2, F.lit("ÁUDIO"))
        .otherwise(F.lit(""))
    )
    z1 = F.when(k % 7 == 0, F.lit("Video")).otherwise(F.lit(""))
    x1 = F.when(k % 5 == 0, F.lit("meta")).otherwise(F.lit(""))
    q1 = F.when(k % 9 == 0, F.lit("x.wav")).otherwise(F.lit(""))
    u2 = F.when(
        k % 3 == 0, F.concat(F.lit("file"), s(k % 9), F.lit(".mp3"))
    ).otherwise(F.concat(F.lit("ftp://f"), s(k % 7)))

    e1 = ea_struct(u1, y1, z1, x1, q1)
    e2 = ea_struct(u2)
    e3 = ea_struct(F.lit(""))  # invalid: empty _u, always filtered

    landing = o.select(
        k.alias("id"),
        F.when(k % 5 == 0, F.array(pg_struct(f=F.lit("1"), l=F.lit("9"))))
        .when(k % 5 == 1, F.array(pg_struct(t=F.lit("p. 5"))))
        .when(k % 5 == 2, F.array(pg_struct(fb=F.lit("33"))))
        .when(k % 5 == 3, F.array(pg_struct(e=F.lit("e77"))))
        .otherwise(F.array(pg_struct()))
        .alias("pages"),
        F.when(k % 2 == 0, F.array(e1, e2, e3))
        .otherwise(F.array(e1, e3))
        .alias("ea"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("s", "msc", "n", "t", "mcp", "")]),
            (k % 6 + 1).cast("int"),
        ).alias("lt"),
        F.when(
            k % 3 == 0,
            F.array(F.concat(F.lit("TA"), s(k % 5)), F.lit("TB")),
        )
        .when(k % 3 == 1, F.array().cast("array<string>"))
        .otherwise(F.lit(None).cast("array<string>"))
        .alias("ta_var"),
        F.when(k % 2 == 0, s(k % 9)).otherwise("").alias("vol"),
        F.when(k % 4 == 0, s(k % 5)).otherwise("").alias("iss"),
        F.date_format("o_orderdate", "yyyy").alias("yr"),
    )
    return landing.select(
        "id",
        F.array_join(sf.pages(F.col("pages")), "|").alias("pages_s"),
        F.array_join(sf.ur(F.col("ea")), "|").alias("ur_s"),
        F.array_join(sf.ur_multimedia(F.col("ea")), "|").alias("ur_mm_s"),
        F.array_join(sf.ur_audio(F.col("ea")), "|").alias("ur_audio_s"),
        F.array_join(sf.ur_meta(F.col("ea")), "|").alias("ur_meta_s"),
        sf.fulltext_flag(F.col("ea")).alias("fulltext"),
        F.array_join(
            sf.document_type(F.col("lt"), F.col("ea")), "|"
        ).alias("doctype_s"),
        F.array_join(
            sf.ta_fascic(
                F.col("ta_var"), F.col("vol"), F.col("iss"), F.col("yr")
            ),
            ",",
        ).alias("ta_fascic_s"),
    )


# --------------------------------------------------------------------------
# q25: the J1 country-normalization join under the oracle gate. The
# tabpais dimension is synthesized from nation (multilingual variants +
# synonyms, unique 2-char codes to avoid key collisions), facts from
# customer with exact / case+whitespace-variant / unmatchable country
# strings; Spark runs the REAL joins.add_country_fields (synonym-
# exploded broadcast dim, '^i^e^p^f' encoding with literal 'None' for
# missing langs — reference 02_create_iahx_xml_collection.py:543,589).
@qdef(
    QUERIES,
    "q25_country_normalization_join",
    oracle="""
    WITH dim AS (
      SELECT n_nationkey AS nk,
             'P' || n_name AS pt, n_name AS en, 'E' || n_name AS es,
             CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE 'F' || n_name END AS fr,
             'Z' || CAST(n_nationkey AS VARCHAR) AS p2,
             CASE WHEN n_nationkey % 2 = 0
                  THEN ['SYN' || CAST(n_nationkey AS VARCHAR)] ELSE [] END AS syn
      FROM nation
    )
    SELECT c.c_custkey AS id,
      CASE WHEN c.c_custkey % 3 IN (0, 1) THEN
        array_to_string(list_sort(list_distinct(list_filter(
          [d.pt, d.en, d.es, d.fr, d.p2] || d.syn,
          x -> x IS NOT NULL AND x <> ''))), '|')
      END AS cp_s,
      CASE WHEN c.c_custkey % 3 IN (0, 1) THEN
        '^i' || d.en || '^e' || d.es || '^p' || d.pt || '^f' || coalesce(d.fr, 'None')
      END AS pais_publicacao
    FROM customer c JOIN dim d ON c.c_nationkey = d.nk
    """,
    doc="J1 country normalization: synonym-exploded broadcast dim join, "
    "multilingual encode, case/whitespace-insensitive keys",
)
def q25_country_normalization_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.standardize.joins import add_country_fields

    nation = table(spark, sf_dir, "nation")
    nk = F.col("n_nationkey")
    tabpais = nation.select(
        F.concat(F.lit("P"), F.col("n_name")).alias("pt"),
        F.col("n_name").alias("en"),
        F.concat(F.lit("E"), F.col("n_name")).alias("es"),
        F.when(nk % 3 != 0, F.concat(F.lit("F"), F.col("n_name"))).alias("fr"),
        F.concat(F.lit("Z"), nk.cast("string")).alias("pais_2"),
        F.when(nk % 2 == 0, F.array(F.concat(F.lit("SYN"), nk.cast("string"))))
        .otherwise(F.array().cast("array<string>"))
        .alias("sinonimo"),
    )
    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    facts = cust.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        cust.c_nationkey == F.col("n_nationkey"),
    ).select(
        k.alias("id"),
        F.when(k % 3 == 0, F.col("n_name"))
        .when(
            k % 3 == 1,
            F.concat(F.lit("  "), F.lower(F.col("n_name")), F.lit(" ")),
        )
        .otherwise(F.lit("Atlantis"))
        .alias("publication_country"),
    )
    out = add_country_fields(facts, tabpais)
    return out.select(
        "id",
        F.array_join(F.col("cp"), "|").alias("cp_s"),
        "pais_publicacao",
    )


# --------------------------------------------------------------------------
# q26: the J3 DECS thesaurus join under the oracle gate — the real
# decs_lookup/decs_code_array path: diacritics-stripped lowered keys
# (the engine's one scalar Python UDF), '/'-split qualifier second
# join, digit-leading passthrough, qualifier-miss entry drop, ordered
# reassembly. Dim synthesized from nation (accented pt variants,
# '/'-prefixed qualifier terms), keyword arrays from customer keys.
@qdef(
    QUERIES,
    "q26_decs_thesaurus_join",
    oracle="""
    SELECT c_custkey AS id,
      array_to_string(list_filter([
        '^d' || CAST(c_custkey % 25 + 1 AS VARCHAR),
        CASE WHEN c_custkey % 2 = 0 THEN '^d' || CAST(c_custkey % 25 + 1 AS VARCHAR) END,
        CASE WHEN c_custkey % 3 = 0 THEN
          '^d' || CAST(c_custkey % 25 + 1 AS VARCHAR) ||
          '^s' || CAST(c_custkey % 25 + 1 AS VARCHAR) END,
        NULL,
        '^d9x' || CAST(c_custkey AS VARCHAR),
        NULL
      ], x -> x IS NOT NULL), '|') AS codes_s
    FROM customer
    """,
    doc="J3 DECS join: diacritics-stripped keys, qualifier second join, "
    "digit passthrough, miss-drop semantics",
)
def q26_decs_thesaurus_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.standardize.joins import (
        decs_code_array,
        decs_lookup,
    )

    nation = table(spark, sf_dir, "nation")
    nk = F.col("n_nationkey")
    nul_s = F.lit(None).cast("string")
    nul_a = F.lit(None).cast("array<string>")
    decs = nation.select(
        F.lpad((nk + 1).cast("string"), 5, "0").alias("mfn"),
        F.concat(F.lit("Term"), nk.cast("string")).alias("descritor_ingles"),
        F.concat(F.lit("Café"), nk.cast("string")).alias("descritor_portugues"),
        nul_s.alias("descritor_espanhol"),
        nul_s.alias("descritor_frances"),
        nul_s.alias("descritor_espanhol_espanha"),
        F.concat(F.lit("/qual"), nk.cast("string")).alias(
            "versao_alternativa_ingles"
        ),
        nul_s.alias("versao_alternativa_espanhol"),
        nul_s.alias("versao_alternativa_portugues"),
        nul_a.alias("sinonimos_ingles"),
        nul_a.alias("sinonimos_espanhol"),
        nul_a.alias("sinonimos_portugues"),
        nul_a.alias("sinonimos_espanha"),
        nul_a.alias("sinonimos_frances"),
    )
    lk = decs_lookup(decs)
    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    m = (k % 25).cast("string")
    facts = cust.select(
        k.alias("id"),
        F.array(
            F.concat(F.lit("Term"), m),
            F.when(k % 2 == 0, F.concat(F.lit("CAFÉ"), m)),
            F.when(k % 3 == 0, F.concat(F.lit("Term"), m, F.lit("/QUAL"), m)),
            F.when(k % 5 == 0, F.concat(F.lit("Term"), m, F.lit("/nope"))),
            F.concat(F.lit("9x"), k.cast("string")),
            F.lit("Absent"),
        ).alias("kw"),
    )
    out = decs_code_array(facts, lk, F.col("kw"), "codes", id_col="id")
    return out.select(
        "id", F.array_join(F.col("codes"), "|").alias("codes_s")
    )


# --------------------------------------------------------------------------
# q27: the J6 enrichment join + U2 idempotent set-union merge under the
# oracle gate — the real enrich_instance_ecollection path: explode(db)
# ⋈ broadcast dim, collect instances, group collection_instance ->
# matching dbs into the dyn map, and $setUnion-style merge into the
# existing instance array / dyn map. The dyn map serializes as sorted
# 'key:v1,v2|key2:...' so both engines hash plain strings.
@qdef(
    QUERIES,
    "q27_enrichment_set_union",
    oracle="""
    WITH f AS (
      SELECT c_custkey AS id, c_custkey AS ck, CAST(c_custkey % 10 AS INT) AS m1
      FROM customer
    )
    SELECT id,
      array_to_string(list_sort(list_distinct(
        ['pre' || CAST(ck % 2 AS VARCHAR), 'inst' || CAST(m1 % 3 AS VARCHAR)]
        || CASE WHEN ck % 2 = 0
             THEN ['inst' || CAST((m1 + 1) % 3 AS VARCHAR)] ELSE [] END
      )), '|') AS instance_s,
      CASE
        WHEN ck % 3 = 0 AND m1 % 2 = 0 THEN
          'col0:' || array_to_string(list_sort(list_distinct(['seed'] || dbs)), ',')
        WHEN ck % 3 = 0 THEN
          'col0:seed|col1:' || array_to_string(dbs, ',')
        ELSE 'col' || CAST(m1 % 2 AS VARCHAR) || ':' || array_to_string(dbs, ',')
      END AS dyn_s
    FROM (
      SELECT *,
        CASE WHEN ck % 2 = 0
             THEN list_sort(['db' || CAST(m1 AS VARCHAR), 'db' || CAST(m1 + 10 AS VARCHAR)])
             ELSE ['db' || CAST(m1 AS VARCHAR)] END AS dbs
      FROM f
    )
    """,
    doc="J6 enrichment join + U2 set-union merge: instance accumulation "
    "and dynamic-field map, idempotent-merge semantics",
)
def q27_enrichment_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.enrich.enrich import enrich_instance_ecollection

    nation = table(spark, sf_dir, "nation")
    nk = F.col("n_nationkey")
    dim = nation.select(
        F.concat(F.lit("db"), nk.cast("string")).alias("db"),
        F.array(F.concat(F.lit("inst"), (nk % 3).cast("string"))).alias(
            "instance"
        ),
        # '' exercises the nz filter on collection_instance values
        F.array(
            F.concat(F.lit("col"), (nk % 2).cast("string")), F.lit("")
        ).alias("collection_instance"),
    )
    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    m1 = (k % 10).cast("string")
    facts = cust.select(
        k.alias("id"),
        F.array(
            F.concat(F.lit("db"), m1),
            F.when(k % 2 == 0, F.concat(F.lit("db"), ((k % 10) + 10).cast("string"))),
            F.concat(F.lit("nodb"), k.cast("string")),
        ).alias("db"),
        F.array(F.concat(F.lit("pre"), (k % 2).cast("string"))).alias(
            "instance"
        ),
        F.when(
            k % 3 == 0,
            F.create_map(F.lit("col0"), F.array(F.lit("seed"))),
        )
        .otherwise(F.create_map().cast("map<string,array<string>>"))
        .alias("dyn"),
    )
    out = enrich_instance_ecollection(facts, dim, id_col="id")
    dyn = F.col("dyn")
    dyn_s = F.array_join(
        F.transform(
            F.array_sort(F.map_keys(dyn)),
            lambda key: F.concat(
                key, F.lit(":"), F.array_join(F.element_at(dyn, key), ",")
            ),
        ),
        "|",
    )
    return out.select(
        "id",
        F.array_join(F.col("instance"), "|").alias("instance_s"),
        dyn_s.alias("dyn_s"),
    )


# --------------------------------------------------------------------------
# q28: the S6 upsert sink semantics (merge-by-key, newest version wins)
# under the oracle gate: duplicate versions synthesized by unioning
# orders with a modified copy, merged by window dedup.
@qdef(
    QUERIES,
    "q28_upsert_latest",
    oracle="""
    SELECT o_orderkey, v, o_totalprice FROM (
      SELECT o_orderkey, v, o_totalprice,
             row_number() OVER (PARTITION BY o_orderkey ORDER BY v DESC) AS rn
      FROM (
        SELECT o_orderkey, 1 AS v, CAST(o_totalprice AS DOUBLE) AS o_totalprice FROM orders
        UNION ALL
        SELECT o_orderkey, 2 AS v, CAST(0 AS DOUBLE) FROM orders WHERE o_orderkey % 3 = 0
      )
    ) WHERE rn = 1
    """,
    doc="S6 merge-by-key upsert: newest version per key via window dedup",
)
def q28_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.sources.rest_source import upsert_latest

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.lit(1).alias("v"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    updates = (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("v", F.lit(2))
        .withColumn("o_totalprice", F.lit(0).cast("double"))
    )
    return upsert_latest(o.unionByName(updates), key="o_orderkey", version_col="v")


# --------------------------------------------------------------------------
# q29: the J2 author-field derivation under the oracle gate — the real
# add_author_fields path: posexplode the author struct list, broadcast
# country join on the _p subfield, ordered reassembly into au /
# afiliacao_autor / af (fold with first-occurrence dedup and the
# unconditional 's.af' quirk) / instituicao_pais_afiliacao /
# pais_afiliacao / auid (_k fallback _w) / email. Two synthesized
# authors per record: a named one with arithmetic-gated subfields and,
# on even keys, an unnamed one with a duplicate institution and an
# unmatchable country.
@qdef(
    QUERIES,
    "q29_author_fields_join",
    oracle="""
    WITH f AS (
      SELECT c.c_custkey AS id, c.c_custkey AS ck, n.n_name AS nm,
             CASE WHEN CAST(c.c_custkey % 25 AS INT) % 3 = 0 THEN NULL
                  ELSE 'F' || n.n_name END AS fr
      FROM customer c JOIN nation n ON CAST(c.c_custkey % 25 AS INT) = n.n_nationkey
    )
    SELECT id,
      'A' || CAST(ck AS VARCHAR) AS au_s,
      CASE WHEN ck % 2 = 0 THEN
        'A' || CAST(ck AS VARCHAR) || '; Inst' || CAST(ck % 3 AS VARCHAR)
        || CASE WHEN ck % 4 = 0 THEN '. CityX' ELSE '' END
        || CASE WHEN ck % 3 > 0 THEN '. ' || nm ELSE '' END
      ELSE 's.af' END AS afiliacao_s,
      CASE WHEN ck % 2 = 0 THEN
        'Inst' || CAST(ck % 3 AS VARCHAR)
        || CASE WHEN ck % 4 = 0 THEN '|CityX' ELSE '' END
      ELSE 's.af' END AS af_s,
      CASE WHEN ck % 2 = 0 THEN
        CASE WHEN ck % 3 > 0
             THEN 'Inst' || CAST(ck % 3 AS VARCHAR) || '+' || nm || '|'
             ELSE '' END
        || 'Inst' || CAST(ck % 3 AS VARCHAR) || '+Atlantis'
      ELSE '' END AS inst_pais_s,
      CASE WHEN ck % 3 > 0 THEN
        '^i' || nm || '^eE' || nm || '^pP' || nm || '^f' || coalesce(fr, 'None')
      ELSE '' END AS pais_af_s,
      CASE WHEN ck % 5 = 0 THEN 'K' || CAST(ck AS VARCHAR)
           ELSE 'W' || CAST(ck AS VARCHAR) END
      || CASE WHEN ck % 2 = 0 THEN '|W2' || CAST(ck AS VARCHAR) ELSE '' END AS auid_s,
      CASE WHEN ck % 2 = 0 THEN 'e' || CAST(ck AS VARCHAR) || '@x' ELSE '' END AS email_s
    FROM f
    """,
    doc="J2 author explode + broadcast country join + ordered "
    "reassembly of the seven derived author fields",
)
def q29_author_fields_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.standardize.joins import add_author_fields

    nation = table(spark, sf_dir, "nation")
    nk = F.col("n_nationkey")
    tabpais = nation.select(
        F.concat(F.lit("P"), F.col("n_name")).alias("pt"),
        F.col("n_name").alias("en"),
        F.concat(F.lit("E"), F.col("n_name")).alias("es"),
        F.when(nk % 3 != 0, F.concat(F.lit("F"), F.col("n_name"))).alias("fr"),
        F.concat(F.lit("Z"), nk.cast("string")).alias("pais_2"),
        F.array().cast("array<string>").alias("sinonimo"),
    )
    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    nm = F.col("n_name")
    empty = F.lit("")
    nul = F.lit(None).cast("string")

    def author(text, _1, _c, _p, _k, _w, _e):
        return F.struct(
            text.alias("text"), _1.alias("_1"), empty.alias("_2"),
            empty.alias("_3"), _c.alias("_c"), _p.alias("_p"),
            _k.alias("_k"), _w.alias("_w"), _e.alias("_e"),
        )

    a1 = author(
        F.concat(F.lit("A"), k.cast("string")),
        F.when(k % 2 == 0, F.concat(F.lit("Inst"), (k % 3).cast("string"))).otherwise(empty),
        F.when(k % 4 == 0, F.lit("CityX")).otherwise(empty),
        F.when(k % 3 > 0, nm).otherwise(empty),
        F.when(k % 5 == 0, F.concat(F.lit("K"), k.cast("string"))).otherwise(nul),
        F.concat(F.lit("W"), k.cast("string")),
        F.when(k % 2 == 0, F.concat(F.lit("e"), k.cast("string"), F.lit("@x"))).otherwise(empty),
    )
    a2 = author(
        empty,
        F.concat(F.lit("Inst"), (k % 3).cast("string")),
        empty,
        F.lit("Atlantis"),
        nul,
        F.concat(F.lit("W2"), k.cast("string")),
        empty,
    )
    facts = cust.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        (k % 25).cast("int") == F.col("n_nationkey"),
    ).select(
        k.alias("id"),
        F.when(k % 2 == 0, F.array(a1, a2)).otherwise(F.array(a1)).alias(
            "individual_author"
        ),
    )
    out = add_author_fields(facts, tabpais, id_col="id")
    j = lambda c: F.array_join(F.col(c), "|")  # noqa: E731
    return out.select(
        "id",
        j("au").alias("au_s"),
        j("afiliacao_autor").alias("afiliacao_s"),
        j("af").alias("af_s"),
        j("instituicao_pais_afiliacao").alias("inst_pais_s"),
        j("pais_afiliacao").alias("pais_af_s"),
        j("auid").alias("auid_s"),
        j("email").alias("email_s"),
    )
