"""Oracle gate q37 (merged, r5 driver-budget) for the remaining dim
joins and predicates: J4/J5 journal lookups (ex-q37), P4 regex country
predicate + A12 map metric (ex-q38), J11/J12 post-aggregation label
decode (ex-q39), J13 ISO lookup (ex-q40), and the S15 report
eligibility + filename key (new in r5) — unioned into one quad-schema
gate so each sub-check keeps its oracle while costing one driver row.

The per-sub builders stay module-level plain functions (not registered)
so plan tests can pin their individual physical shapes.

Same synthesis pattern as q25-q36 (see those modules): arithmetic
dims/facts from nation/customer/events through the REAL operators,
expected output stated analytically in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_governance_spark.queries.base import melt_metrics, QueryDef, qdef
from data_governance_spark.tables import table

QUERIES: dict[str, QueryDef] = {}


def _s(c: Column) -> Column:
    return c.cast("string")


# --------------------------------------------------------------------------
# q37: J4 (ta_var: ISSN lookup with shortened-title fallback) + J5
# (journal-country fallback inside add_country_fields) — the two
# title_current joins, composed. Facts hit the ISSN path (ck%3==0), the
# title-fallback path (ck%3==1, with case/whitespace key noise), and
# no-match (ck%3==2); the country source is publication_country
# (ck%5==0), the J5 title_serial fallback (ck even), or nothing.
# Reference: misc.py:38-65 builds, 02_create_iahx_xml_collection.py:
# 594-605 (J4) and :826-838 (J5) probe.
def q37_journal_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.standardize.joins import (
        add_country_fields,
        add_ta_var,
    )

    nation = table(spark, sf_dir, "nation")
    nk = F.col("n_nationkey")
    ns = _s(nk)
    title_current = nation.select(
        F.concat(F.lit("is"), ns).alias("issn"),
        F.concat(F.lit("rev"), ns).alias("shortened_title"),
        F.concat(F.lit("T"), ns, F.lit("^sub")).alias("title"),  # ^-stripped
        F.when(nk % 2 == 0, F.concat(F.lit("MD"), ns)).alias(
            "medline_shortened_title"
        ),
        F.array(F.concat(F.lit("P1-"), ns, F.lit("^x"))).alias("parallel_titles"),
        F.array().cast("array<string>").alias("shortened_parallel_titles"),
        F.when(nk % 3 == 0, F.array(F.concat(F.lit("O"), ns)))
        .otherwise(F.array().cast("array<string>"))
        .alias("other_titles"),
        F.array(F.concat(F.lit("LAND"), ns)).alias("country"),
    )
    tabpais = nation.select(
        F.concat(F.lit("terra de "), ns).alias("pt"),
        F.concat(F.lit("land"), ns).alias("en"),
        F.concat(F.lit("es land"), ns).alias("es"),
        F.when(nk % 3 != 0, F.concat(F.lit("fr land"), ns)).alias("fr"),
        F.concat(F.lit("Z"), ns).alias("pais_2"),
        F.array().cast("array<string>").alias("sinonimo"),
    )
    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    ms = _s(k % 25)
    facts = cust.select(
        k.alias("id_pk"),
        F.when(k % 3 == 0, F.concat(F.lit("IS"), ms)).alias("issn"),
        F.when(k % 3 == 1, F.concat(F.lit(" ReV"), ms, F.lit(" ")))
        .otherwise(F.concat(F.lit("nope"), _s(k)))
        .alias("shortened_title"),
        F.when(k % 2 == 0, F.concat(F.lit("REV"), ms)).alias("title_serial"),
        F.when(k % 5 == 0, F.concat(F.lit("LAND"), ms)).alias(
            "publication_country"
        ),
    )
    out = add_ta_var(facts, title_current)
    out = add_country_fields(out, tabpais, title_current=title_current)
    return out.select(
        F.col("id_pk").alias("id"),
        F.array_join(F.col("ta_var"), "|").alias("ta_var_s"),
        F.array_join(F.col("cp"), "|").alias("cp_s"),
        F.col("pais_publicacao").alias("pp_s"),
    )


# --------------------------------------------------------------------------
# q38: P4 (the reference's regex country-match predicate, exactly: ^i
# prefix on pais_afiliacao, SUBSTRING looseness on cp, case-insensitive)
# driving attach_slice_p4's one-scan fan-out, then A12's map metric
# (country x year -> total + conditional fulltext count). The per-
# country slice dict mirrors tmgl_countries' per-country loop.
# Reference: tmgl_metrics/misc.py:4-40 (P4), dag_02_map.py:12-104 (A12).
def q38_p4_map_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.metrics.p4 import attach_slice_p4
    from data_governance_spark.metrics.tmgl_specs import map_metric

    ev = table(spark, sf_dir, "events")
    u = F.col("user_id")
    empty = F.array().cast("array<string>")
    two = lambda c: F.lpad(_s(c), 2, "0")  # noqa: E731
    facts = ev.select(
        F.date_format("ts", "yyyy").alias("dp"),
        F.when(u % 4 == 0, F.lit("1")).otherwise(F.lit("0")).alias("fulltext"),
        # mixed case exercises (?iu); the ^i prefix is the P4 contract
        F.when(u % 2 == 0, F.array(F.concat(F.lit("^iCtY"), two(u % 25))))
        .otherwise(empty)
        .alias("pais_afiliacao"),
        # strictly-contains padding exercises the substring looseness
        F.when(
            u % 3 == 0,
            F.array(F.concat(F.lit("xx cty"), two((u + 1) % 25), F.lit(" yy"))),
        )
        .otherwise(empty)
        .alias("cp"),
    )
    slices = {f"cty{i:02d}": [f"cty{i:02d}"] for i in range(25)}
    fanned = attach_slice_p4(facts, slices, slice_col="country")
    return map_metric(fanned).select(
        "country", "year", "total", F.col("with_fulltext").cast("long").alias("with_fulltext")
    )


# --------------------------------------------------------------------------
# q39: J12 (zero-stripped DECS MFN -> English descriptor) as the
# post-aggregation label decode (J11's label_join is the same operator
# with a different dim). Labels exist for even codes — except 0, whose
# all-zero MFN '000' strips to '' and drops from the dim (the
# reference's lstrip('0') does the same); odd codes pass through raw
# (the reference's dict .get(code, code)); whitespace-only descriptors
# are dropped from the dim.
# Reference: dag_02_subjects.py:68-76 build, :96,157 probe.
def q39_decs_label_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.metrics.runner import MetricSpec, run_metric
    from data_governance_spark.metrics.tmgl_specs import decs_label_dim

    ev = table(spark, sf_dir, "events").withColumn(
        "dp", F.date_format("ts", "yyyy")
    )
    metrics = run_metric(
        ev,
        MetricSpec(
            name="subject",
            entity_col="user_id",
            entity_expr=lambda c: (c % 25).cast("string"),
        ),
    )
    nation = table(spark, sf_dir, "nation")
    nk = F.col("n_nationkey")
    ns = _s(nk)
    decs = nation.filter(nk % 2 == 0).select(
        F.concat(F.lit("00"), ns).alias("mfn"),  # zero-strip -> nk
        F.concat(F.lit(" Lab"), ns, F.lit(" ")).alias("descritor_ingles"),
    ).unionByName(
        nation.select(  # whitespace-only labels: dropped from the dim
            F.concat(F.lit("9"), ns).alias("mfn"),
            F.lit("   ").alias("descritor_ingles"),
        )
    )
    from data_governance_spark.metrics.runner import label_join

    return label_join(metrics, decs_label_dim(decs))


# --------------------------------------------------------------------------
# q40: J13 — the ISO-code lookup expression (first 2-char synonym of
# the country row; countries without one yield NULL) over a
# nation-synthesized who_region dim, plus the pais_tmgl/pais_en
# coalesce key the per-country report files are named by.
# Reference: dag_02_map.py:30; tmgl_countries/dag_03_export_html.py:274.
def q40_iso_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.sinks.html_sink import iso_col

    nation = table(spark, sf_dir, "nation")
    nk = F.col("n_nationkey")
    ns = _s(nk)
    letter = F.substring(
        F.lit("abcdefghijklmnopqrstuvwxy"), (nk + 1).cast("int"), F.lit(1)
    )
    dim = nation.select(
        F.concat(F.lit("CtY"), ns).alias("pais_en"),
        F.when(nk % 3 == 0, F.concat(F.lit("Tmgl"), ns)).alias("pais_tmgl"),
        F.concat(
            F.array(F.lit("zzz9")),
            F.when(nk % 2 == 0, F.array(F.concat(letter, F.lit("x")))).otherwise(
                F.array().cast("array<string>")
            ),
        ).alias("pais_sinonimo"),
    )
    return dim.select(
        F.lower(F.coalesce(F.col("pais_tmgl"), F.col("pais_en"))).alias("country"),
        iso_col(F.col("pais_sinonimo")).alias("iso"),
    )


# --------------------------------------------------------------------------
# S15 (new in r5): per-country report eligibility + filename key. The
# J14 semi-join (countries present in the metrics) decides WHICH report
# files exist, and the filename is the lowercased J13 ISO code with the
# reference's space->underscore country fallback — the engine side of
# write_country_reports (sinks/html_sink.py), via the same iso_col /
# report_filename_col expressions.
# Reference: tmgl_countries/dag_03_export_html.py:268-276.
def s15_report_eligibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.sinks.html_sink import iso_col, report_filename_col

    nation = table(spark, sf_dir, "nation")
    nk = F.col("n_nationkey")
    ns = _s(nk)
    letter = F.substring(
        F.lit("abcdefghijklmnopqrstuvwxy"), (nk + 1).cast("int"), F.lit(1)
    )
    dim = nation.select(
        F.concat(F.lit("CtY "), ns).alias("pais_en"),  # space: fallback path
        F.when(nk % 3 == 0, F.concat(F.lit("Tmgl"), ns)).alias("pais_tmgl"),
        F.concat(
            F.array(F.lit("zzz9")),
            F.when(nk % 4 == 0, F.array(F.concat(letter, F.lit("x")))).otherwise(
                F.array().cast("array<string>")
            ),
        ).alias("pais_sinonimo"),
    ).withColumn("country", F.lower(F.coalesce("pais_tmgl", "pais_en")))
    # countries that actually have metric rows (J14 semi-join eligibility)
    present = nation.filter(nk % 2 == 0).select(
        F.lower(
            F.coalesce(
                F.when(nk % 3 == 0, F.concat(F.lit("Tmgl"), ns)),
                F.concat(F.lit("CtY "), ns),
            )
        ).alias("country")
    )
    elig = dim.join(present, "country", "left_semi")
    return elig.select(
        "country",
        report_filename_col(iso_col(F.col("pais_sinonimo")), F.col("country")).alias(
            "fname"
        ),
    )


# --------------------------------------------------------------------------
@qdef(
    QUERIES,
    "q37_dim_lookup_bundle",
    oracle="""
    WITH f AS (SELECT c_custkey AS ck, c_custkey % 25 AS m,
                      CAST(c_custkey % 25 AS VARCHAR) AS ms
               FROM customer),
    j AS (
      SELECT ck AS id,
        CASE WHEN ck % 3 = 2 THEN NULL ELSE
          'T' || ms || '|rev' || ms
          || CASE WHEN m % 2 = 0 THEN '|MD' || ms ELSE '' END
          || '|P1-' || ms
          || CASE WHEN m % 3 = 0 THEN '|O' || ms ELSE '' END
        END AS ta_var_s,
        CASE WHEN ck % 5 = 0 OR ck % 2 = 0 THEN
          'Z' || ms || '|es land' || ms
          || CASE WHEN m % 3 <> 0 THEN '|fr land' || ms ELSE '' END
          || '|land' || ms || '|terra de ' || ms
        END AS cp_s,
        CASE WHEN ck % 5 = 0 OR ck % 2 = 0 THEN
          '^iland' || ms || '^ees land' || ms || '^pterra de ' || ms || '^f'
          || CASE WHEN m % 3 <> 0 THEN 'fr land' || ms ELSE 'None' END
        END AS pp_s
      FROM f
    ),
    ev AS (
      SELECT user_id AS u, user_id % 25 AS m,
             CAST(strftime(ts, '%Y') AS INT) AS year,
             CASE WHEN user_id % 4 = 0 THEN 1 ELSE 0 END AS ft
      FROM events
    ),
    cn AS (
      SELECT 'cty' || lpad(CAST(m AS VARCHAR), 2, '0') AS country, year, ft
      FROM ev WHERE u % 2 = 0
      UNION ALL
      SELECT 'cty' || lpad(CAST((u + 1) % 25 AS VARCHAR), 2, '0'), year, ft
      FROM ev WHERE u % 3 = 0
    ),
    mp AS (
      SELECT country, year, CAST(count(*) AS DOUBLE) AS total,
             CAST(sum(ft) AS DOUBLE) AS with_fulltext
      FROM cn GROUP BY country, year
    ),
    dc AS (
      SELECT CASE WHEN user_id % 25 % 2 = 0 AND user_id % 25 <> 0
                  THEN 'Lab' || CAST(user_id % 25 AS VARCHAR)
                  ELSE CAST(user_id % 25 AS VARCHAR) END AS name,
             CAST(strftime(ts, '%Y') AS INT) AS year,
             CAST(count(*) AS DOUBLE) AS n
      FROM events
      GROUP BY user_id % 25, year
    ),
    iso AS (
      SELECT
        CASE WHEN n_nationkey % 3 = 0
             THEN 'tmgl' || CAST(n_nationkey AS VARCHAR)
             ELSE 'cty' || CAST(n_nationkey AS VARCHAR) END AS country,
        CASE WHEN n_nationkey % 2 = 0
             THEN substring('abcdefghijklmnopqrstuvwxy', n_nationkey + 1, 1) || 'x'
        END AS iso
      FROM nation
    )
    SELECT 'journal' AS gate, CAST(id AS VARCHAR) AS k,
           COALESCE(ta_var_s, 'None') || '~' || COALESCE(cp_s, 'None')
             || '~' || COALESCE(pp_s, 'None') AS v_s,
           CAST(NULL AS DOUBLE) AS v_d
    FROM j
    UNION ALL
    SELECT 'map', country || ':' || CAST(year AS VARCHAR) || ':t',
           CAST(NULL AS VARCHAR), total FROM mp
    UNION ALL
    SELECT 'map', country || ':' || CAST(year AS VARCHAR) || ':f',
           CAST(NULL AS VARCHAR), with_fulltext FROM mp
    UNION ALL
    SELECT 'decs', name || ':' || CAST(year AS VARCHAR),
           CAST(NULL AS VARCHAR), n FROM dc
    UNION ALL
    SELECT 'iso', country, COALESCE(iso, 'None'), CAST(NULL AS DOUBLE) FROM iso
    UNION ALL
    SELECT 'report',
           CASE WHEN n_nationkey % 3 = 0
                THEN 'tmgl' || CAST(n_nationkey AS VARCHAR)
                ELSE 'cty ' || CAST(n_nationkey AS VARCHAR) END,
           CASE WHEN n_nationkey % 4 = 0
                THEN substring('abcdefghijklmnopqrstuvwxy', n_nationkey + 1, 1) || 'x'
                WHEN n_nationkey % 3 = 0
                THEN 'tmgl' || CAST(n_nationkey AS VARCHAR)
                ELSE 'cty_' || CAST(n_nationkey AS VARCHAR) END,
           CAST(NULL AS DOUBLE)
    FROM nation WHERE n_nationkey % 2 = 0
    """,
    doc="merged gate (r5 driver-budget): J4 ISSN+title-fallback journal "
    "join + J5 journal-country fallback (ex-q37) + P4 regex country "
    "predicate one-scan fan-out + A12 map metric (ex-q38) + J11/J12 "
    "post-aggregation label decode (ex-q39) + J13 ISO lookup (ex-q40) "
    "+ S15 report eligibility/filename key (new)",
)
def q37_dim_lookup_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from concurrent.futures import ThreadPoolExecutor

    nul_s = F.lit(None).cast("string")
    nul_d = F.lit(None).cast("double")

    # The five sub-builders are independent plan constructions (driver-
    # side py4j/Catalyst work, ~2.6 s serial warm — measured r14). py4j
    # gives each Python thread its own JVM connection, so building them
    # from a small pool overlaps the chatter the same way the e05/q43
    # builder pools overlap eager jobs (guide §2.6). Results unchanged:
    # the plans are combined by the same unionByName.
    def _j() -> DataFrame:
        return q37_journal_joins(spark, sf_dir).select(
            F.lit("journal").alias("gate"),
            F.col("id").cast("string").alias("k"),
            F.concat(
                F.coalesce(F.col("ta_var_s"), F.lit("None")), F.lit("~"),
                F.coalesce(F.col("cp_s"), F.lit("None")), F.lit("~"),
                F.coalesce(F.col("pp_s"), F.lit("None")),
            ).alias("v_s"),
            nul_d.alias("v_d"),
        )

    def _mp_rows() -> DataFrame:
        mp = q38_p4_map_metric(spark, sf_dir).select(
            F.concat(
                "country", F.lit(":"), F.col("year").cast("string")
            ).alias("ky"),
            F.col("total").cast("double").alias("t"),
            F.col("with_fulltext").cast("double").alias("f"),
        )
        return melt_metrics(mp, F.col("ky"), ("t", "f"), "map")

    def _dc() -> DataFrame:
        return q39_decs_label_decode(spark, sf_dir).select(
            F.lit("decs").alias("gate"),
            F.concat("name", F.lit(":"), F.col("year").cast("string")).alias("k"),
            nul_s.alias("v_s"),
            F.col("count").cast("double").alias("v_d"),
        )

    def _iso() -> DataFrame:
        return q40_iso_lookup(spark, sf_dir).select(
            F.lit("iso").alias("gate"),
            F.col("country").alias("k"),
            F.coalesce(F.col("iso"), F.lit("None")).alias("v_s"),
            nul_d.alias("v_d"),
        )

    def _rp() -> DataFrame:
        return s15_report_eligibility(spark, sf_dir).select(
            F.lit("report").alias("gate"),
            F.col("country").alias("k"),
            F.col("fname").alias("v_s"),
            nul_d.alias("v_d"),
        )

    with ThreadPoolExecutor(max_workers=5) as pool:
        futs = [pool.submit(f) for f in (_j, _mp_rows, _dc, _iso, _rp)]
        j, mp_rows, dc, iso, rp = (f.result() for f in futs)
    return j.unionByName(mp_rows).unionByName(dc).unionByName(iso).unionByName(rp)
