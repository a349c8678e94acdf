"""Oracle gates q41-q44 for the engine's source/sink boundaries: the
Solr-XML source (S8-S11, F21), the XML document sink serialization
(S12/P8/F6-extended), the paginated REST harvester (S1-S5 with error
capture, composed with the S6 upsert), and the chart-JSON pivot
(S14/S15 served layer, O1 year sort).

q41 materializes real XML files (content derived from `customer`) and
reads them back through the real source; q42 gates the `doc_xml`
serialization column directly; q43 drives harvest_pages with a
deterministic injected fetch; q44 pivots real event metrics — all with
analytically-stated DuckDB oracles, like q25-q40.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_governance_spark.queries.base import QueryDef, qdef
from data_governance_spark.tables import table

QUERIES: dict[str, QueryDef] = {}


def _s(c: Column) -> Column:
    return c.cast("string")


# --------------------------------------------------------------------------
# q41: the Solr-XML source round-trip. Two files are generated from the
# first 200 customers (a.xml: ck<=100, b.xml: the rest): repeated
# <field name="la"> values become a list (F21/S8), docs with
# instance='other' (ck%3==0) are dropped by the S9 filter, and each
# file re-emits every ck%10==0 doc with a poisoned note — S10's
# first-in-file-wins dedup must keep the original. The files are read
# back via the glob path (S11).
# Reference: dags/tmgl_metrics/dag_01_full_update.py:83-211.
@qdef(
    QUERIES,
    "q41_solr_xml_roundtrip",
    oracle="""
    SELECT 'd' || CAST(c_custkey AS VARCHAR) AS id,
           CASE WHEN c_custkey <= 100 THEN 'a.xml' ELSE 'b.xml' END AS file,
           'en|pt' AS la_s,
           'N' || CAST(c_custkey AS VARCHAR) AS note
    FROM customer
    WHERE c_custkey <= 200 AND c_custkey % 3 <> 0
    """,
    doc="S8-S11 Solr-XML source: streaming parse, repeated-field lists, "
    "instance filter, first-in-file dedup, glob listing",
)
def q41_solr_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from data_governance_spark.sources.solr_xml import read_solr_xml

    rows = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select("c_custkey")
        .orderBy("c_custkey")
        .collect()
    )

    def doc(ck: int, note: str) -> str:
        inst = "tmgl" if ck % 3 != 0 else "other"
        return (
            f'<doc><field name="id">d{ck}</field>'
            f'<field name="instance">{inst}</field>'
            f'<field name="la">en</field><field name="la">pt</field>'
            f'<field name="note">{note}</field></doc>'
        )

    out_dir = tempfile.mkdtemp(prefix="dg_q41_")
    for fname, lo, hi in (("a.xml", 1, 100), ("b.xml", 101, 10**9)):
        cks = [r["c_custkey"] for r in rows if lo <= r["c_custkey"] <= hi]
        body = [doc(ck, f"N{ck}") for ck in cks]
        # dup docs after the originals: S10 keeps the first occurrence
        body += [doc(ck, "DUP") for ck in cks if ck % 10 == 0]
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write("<add>" + "".join(body) + "</add>")

    parsed = read_solr_xml(spark, os.path.join(out_dir, "*.xml"), instance_filter="tmgl")
    return parsed.select(
        "id",
        F.col("_file").alias("file"),
        F.array_join(F.col("fields")["la"], "|").alias("la_s"),
        F.get(F.col("fields")["note"], 0).alias("note"),
    )


# --------------------------------------------------------------------------
# q42: the XML sink's per-document serialization (S12). Exercises:
# sorted field order; array fields repeated with ''/NULL values pruned
# (P8); &<> escaped in text and " additionally in data-derived dyn-map
# attribute names; NULL/'' scalars pruned; ti-style prefixed map keys
# ('' -> bare name); the dyn map appended after the named fields; the
# F6-extended invalid-char strip (\\x01 removed); and the boost
# attribute from weight.
# Reference: 04_export_xml.py:82-128 (sink), :39-57 (sanitizer).
@qdef(
    QUERIES,
    "q42_xml_sink_serialization",
    oracle="""
    WITH f AS (SELECT c_custkey AS ck, CAST(c_custkey AS VARCHAR) AS cs
               FROM customer)
    SELECT 'D' || cs AS id,
      '<doc boost="' || CAST(ck % 7 AS VARCHAR) || '">' || chr(10)
      || '  <field name="aa_arr">v1-' || cs || '</field>' || chr(10)
      || '  <field name="aa_arr">v&lt;2&gt;&amp;' || cs || '</field>' || chr(10)
      || '  <field name="id">D' || cs || '</field>' || chr(10)
      || '  <field name="mm">base' || cs || '</field>' || chr(10)
      || '  <field name="mm_en">e1</field>' || chr(10)
      || CASE WHEN ck % 2 = 0
              THEN '  <field name="mm_en">e2</field>' || chr(10) ELSE '' END
      || CASE WHEN ck % 5 <> 0
              THEN '  <field name="sc">S"x"' || cs || '</field>' || chr(10)
              ELSE '' END
      || '  <field name="k&quot;' || CAST(ck % 2 AS VARCHAR) || '">dv' || cs
      || '</field>' || chr(10)
      || '  <field name="kc">cv' || cs || '</field>' || chr(10)
      || '</doc>' AS xml
    FROM f
    """,
    doc="S12 XML sink serialization: sorted fields, P8 pruning, text/"
    "attr escaping, prefixed + dynamic maps, invalid-char strip, boost",
)
def q42_xml_sink_serialization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.sinks.xml_sink import doc_xml

    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    cs = _s(k)
    facts = cust.select(
        F.concat(F.lit("D"), cs).alias("id"),
        F.array(
            F.concat(F.lit("v1-"), cs),
            F.lit(""),  # pruned
            F.lit(None).cast("string"),  # pruned
            F.concat(F.lit("v<2>&"), cs),  # text-escaped
        ).alias("aa_arr"),
        F.create_map(
            F.lit(""), F.array(F.concat(F.lit("base"), cs)),  # bare 'mm'
            F.lit("en"),
            F.when(k % 2 == 0, F.array(F.lit("e1"), F.lit("e2"))).otherwise(
                F.array(F.lit("e1"))
            ),
        ).alias("mm"),
        F.when(k % 5 != 0, F.concat(F.lit('S"x"'), cs)).alias("sc"),  # NULL pruned
        F.lit("").alias("zz"),  # always pruned
        (k % 7).cast("int").alias("weight"),
        F.create_map(
            F.concat(F.lit('k"'), _s(k % 2)),  # quote in attr name
            F.array(F.concat(F.lit("dv"), cs), F.lit("")),  # '' pruned
            F.lit("kc"),
            F.array(F.concat(F.lit("c\x01v"), cs)),  # \x01 stripped
        ).alias("dyn"),
    )
    return doc_xml(facts).select("id", "xml")


# --------------------------------------------------------------------------
# q43: the REST harvester (S1 page fan-out, S2 watermark params, S5
# partitioned fetch, page-level error capture) composed with S6's
# upsert merge. The injected fetch is deterministic: every third page
# (offset//50 % 3 == 1) raises (those records must be ABSENT, not fail
# the job); records carry the watermark param to prove params plumb
# through; ids divisible by 4 arrive in two versions and the upsert
# must keep the newer. total_count derives from `customer` so the gate
# scales with sf. Reference: tasks_for_01.py:96-191.
@qdef(
    QUERIES,
    "q43_rest_harvest_upsert",
    oracle="""
    WITH t AS (SELECT CAST(LEAST(count(*), 500) AS BIGINT) AS n FROM customer),
    ids AS (SELECT unnest(range(0, (SELECT n FROM t))) AS id)
    SELECT id,
           CASE WHEN id % 4 = 0 THEN '2025-02-02' ELSE '2025-01-01' END
             AS updated_time,
           '2025-07-22' AS v
    FROM ids WHERE (id // 50) % 3 <> 1
    """,
    doc="S1-S5 paginated REST harvest (error pages captured, watermark "
    "params) + S6 upsert merge by newest version",
)
def q43_rest_harvest_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import date

    from pyspark.sql import types as T

    from data_governance_spark.sources.rest_source import (
        harvest_pages,
        incremental_params,
        records_df,
        upsert_latest,
    )

    total = min(table(spark, sf_dir, "customer").count(), 500)

    def fetch(offset: int, limit: int, params: dict) -> list[dict]:
        if (offset // 50) % 3 == 1:
            raise RuntimeError(f"boom at {offset}")
        wm = params["updated_time__gte"]
        out = []
        for i in range(offset, min(offset + limit, total)):
            out.append({"id": i, "updated_time": "2025-01-01", "v": wm})
            if i % 4 == 0:  # a newer version the upsert must prefer
                out.append({"id": i, "updated_time": "2025-02-02", "v": wm})
        return out

    pages = harvest_pages(
        spark,
        fetch,
        total_count=total,
        limit=50,
        params=incremental_params(date(2025, 8, 1)),
    )
    recs = records_df(
        pages,
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("updated_time", T.StringType()),
                T.StructField("v", T.StringType()),
            ]
        ),
    )
    return upsert_latest(recs)


# --------------------------------------------------------------------------
# q44: the served-layer chart pivot (S14 JSON artifact body, also the
# engine side of the S15 HTML report): long metrics (type, region,
# name, year, count) -> wide per-year rows with one column per entity,
# sorted by year (O1). Absent (year, entity) pairs stay NULL (the
# reference emits only present entities per year).
# Reference: tmgl_regions/tasks_for_export/journal.py:148-190.
@qdef(
    QUERIES,
    "q44_chart_pivot",
    oracle="""
    SELECT CAST(strftime(ts, '%Y') AS INT) AS ano,
      CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
      CAST(sum(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
      CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
      CAST(sum(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
      CAST(sum(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
    FROM events GROUP BY 1
    """,
    doc="S14/S15 served-layer pivot: long metrics -> wide year rows, "
    "NULL for absent entities, year-sorted (O1)",
)
def q44_chart_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.metrics.runner import MetricSpec, run_metric
    from data_governance_spark.sinks.json_sink import pivot_metric

    ev = table(spark, sf_dir, "events").withColumn(
        "dp", F.date_format("ts", "yyyy")
    )
    metrics = run_metric(ev, MetricSpec(name="event", entity_col="event_type"))
    return pivot_metric(metrics, "event")
