"""Oracle gates q30-q32 for the intricate enrichment joins (J7/J8/J9).

Each query synthesizes dims/facts arithmetically from nation/customer
(the q25-q29 pattern) and pushes them through the REAL operator, so the
DuckDB oracle can state the expected output analytically:

- q30: enrich_db_instance_ecollection (J7 — diacritics-stripped db key
  join, k:v collection_instance split into dynamic fields;
  03_xml_enriched.py:283-382 + misc.py:189-209).
- q31: enrich_temas (J8 — TEMAS union-view join, pairwise tag/contexto
  parse incl. the odd-length NULL pad, first-source db rule;
  03_xml_enriched.py:385-500).
- q32: rename_ai (J9 — brisa ai1->ai2 corporate-author rename with
  trimmed keys, empty-ai2 skip, order-preserving reassembly;
  02_x01_create_iahx_xml_collection.py:122-221).

Array/map outputs serialize to sorted 'k:v1,v2|...' strings (NULL
values as 'None', matching the reference's Python str(None) payloads)
so both engines hash plain VARCHARs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_governance_spark.queries.base import QueryDef, qdef
from data_governance_spark.tables import table

QUERIES: dict[str, QueryDef] = {}

EMPTY = "array<string>"


def _s(c: Column) -> Column:
    return c.cast("string")


def _dyn_s(dyn: Column) -> Column:
    """map<string,array<string>> -> 'k:v1,v2|k2:...' with keys sorted
    and NULL values rendered 'None'."""
    return F.array_join(
        F.transform(
            F.array_sort(F.map_keys(dyn)),
            lambda key: F.concat(
                key,
                F.lit(":"),
                F.array_join(
                    F.transform(
                        F.element_at(dyn, key), lambda v: F.coalesce(v, F.lit("None"))
                    ),
                    ",",
                ),
            ),
        ),
        "|",
    )


# --------------------------------------------------------------------------
# q30: J7 under the oracle gate. Dim rows keyed 'base<nk>' carry one or
# two db values, an instance, and collection_instance entries including
# a colon-less 'noval' and '' (both must be ignored). Fact database
# entries exercise: the NFKD-diacritics + lower + trim key path
# (' Basé<m> '), a second conditional match, a never-matching entry, and
# a no-match-at-all subset (ck%11==0 odd) that must pass through
# untouched.
@qdef(
    QUERIES,
    "q30_db_enrichment_join",
    oracle="""
    WITH f AS (SELECT c_custkey AS ck FROM customer),
    fdb AS (
      SELECT ck, strip_accents(lower(trim(e))) AS key
      FROM f, UNNEST(
        (CASE WHEN ck % 11 <> 0
              THEN [' Basé' || CAST(ck % 25 AS VARCHAR) || ' '] ELSE [] END)
        || (CASE WHEN ck % 2 = 0
                 THEN ['base' || CAST((ck + 1) % 25 AS VARCHAR)] ELSE [] END)
        || ['missing' || CAST(ck AS VARCHAR)]
      ) AS t(e)
    ),
    j AS (
      SELECT fdb.ck, n.n_nationkey AS nk
      FROM fdb JOIN nation n
        ON fdb.key = 'base' || CAST(n.n_nationkey AS VARCHAR)
    ),
    m AS (
      SELECT ck,
        list_sort(list_distinct(flatten(list(
          ['d' || CAST(nk AS VARCHAR)]
          || CASE WHEN nk % 2 = 0
                  THEN ['d' || CAST(nk + 100 AS VARCHAR)] ELSE [] END
        )))) AS dl,
        list_sort(list_distinct(list('i' || CAST(nk % 4 AS VARCHAR)))) AS il
      FROM j GROUP BY ck
    ),
    dyn_kv AS (
      SELECT ck, 'k' || CAST(nk % 3 AS VARCHAR) AS k,
             'v' || CAST(nk AS VARCHAR) AS v FROM j
      UNION ALL
      SELECT ck, 'k0', 'seed' FROM f WHERE ck % 3 = 0
    ),
    dyn_agg AS (
      SELECT ck, k,
             array_to_string(list_sort(list_distinct(list(v))), ',') AS vs
      FROM dyn_kv GROUP BY ck, k
    ),
    dyn AS (
      SELECT ck, string_agg(k || ':' || vs, '|' ORDER BY k) AS dyn_s
      FROM dyn_agg GROUP BY ck
    )
    SELECT f.ck AS id,
      array_to_string(list_sort(list_distinct(
        ['e' || CAST(f.ck % 7 AS VARCHAR)] || COALESCE(m.dl, []))), '|') AS db_s,
      array_to_string(list_sort(list_distinct(
        ['p' || CAST(f.ck % 2 AS VARCHAR)] || COALESCE(m.il, []))), '|') AS instance_s,
      COALESCE(dyn.dyn_s, '') AS dyn_s
    FROM f
    LEFT JOIN m ON f.ck = m.ck
    LEFT JOIN dyn ON f.ck = dyn.ck
    """,
    doc="J7 DBinstanceEcollection enrichment: diacritics-key join, db/"
    "instance set-union merge, k:v dynamic-field split",
)
def q30_db_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.enrich.enrich import enrich_db_instance_ecollection

    nation = table(spark, sf_dir, "nation")
    nk = F.col("n_nationkey")
    dim = nation.select(
        F.concat(F.lit("base"), _s(nk)).alias("database_campo4"),
        F.when(
            nk % 2 == 0,
            F.array(F.concat(F.lit("d"), _s(nk)), F.concat(F.lit("d"), _s(nk + 100))),
        )
        .otherwise(F.array(F.concat(F.lit("d"), _s(nk))))
        .alias("db"),
        F.array(F.concat(F.lit("i"), _s(nk % 4))).alias("instance"),
        # 'noval' (no colon) and '' exercise the k:v filters
        F.array(
            F.concat(F.lit("k"), _s(nk % 3), F.lit(":v"), _s(nk)),
            F.lit("noval"),
            F.lit(""),
        ).alias("collection_instance"),
    )
    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    empty = F.array().cast(EMPTY)
    facts = cust.select(
        k.alias("id"),
        F.concat(
            F.when(
                k % 11 != 0,
                F.array(F.concat(F.lit(" Basé"), _s(k % 25), F.lit(" "))),
            ).otherwise(empty),
            F.when(
                k % 2 == 0, F.array(F.concat(F.lit("base"), _s((k + 1) % 25)))
            ).otherwise(empty),
            F.array(F.concat(F.lit("missing"), _s(k))),
        ).alias("database"),
        F.array(F.concat(F.lit("e"), _s(k % 7))).alias("db"),
        F.array(F.concat(F.lit("p"), _s(k % 2))).alias("instance"),
        F.when(k % 3 == 0, F.create_map(F.lit("k0"), F.array(F.lit("seed"))))
        .otherwise(F.create_map().cast("map<string,array<string>>"))
        .alias("dyn"),
    )
    out = enrich_db_instance_ecollection(facts, dim, id_col="id")
    return out.select(
        "id",
        F.array_join(F.col("db"), "|").alias("db_s"),
        F.array_join(F.col("instance"), "|").alias("instance_s"),
        _dyn_s(F.col("dyn")).alias("dyn_s"),
    )


# --------------------------------------------------------------------------
# q31: J8 under the oracle gate. Two source collections (t1: even keys,
# t2: multiples of 3) unioned with provenance; exercises instance
# accumulation across sources, the first-SOURCE db rule (t1 outranks t2
# for ck%6==0), collection->first_db dyn entries, pairwise tag parsing
# with the odd-length NULL pad shifting the concatenated tema list
# ((todd,m1),(mv0,NULL) for ck%6==0), a contexto key colliding with a
# collection key ('cA'), and the seed-dyn merge.
@qdef(
    QUERIES,
    "q31_temas_enrichment_join",
    oracle="""
    WITH f AS (SELECT c_custkey AS ck FROM customer),
    ent AS (
      SELECT ck, 'cA' AS k, 'dbA0' AS v FROM f WHERE ck % 2 = 0
      UNION ALL
      SELECT ck, 'cB', CASE WHEN ck % 2 = 0 THEN 'dbA0' ELSE 'dbB' END
      FROM f WHERE ck % 4 = 0 OR ck % 3 = 0
      UNION ALL
      SELECT ck, 't1', 'tv' || CAST(ck % 5 AS VARCHAR) FROM f WHERE ck % 2 = 0
      UNION ALL
      SELECT ck, 'cA', 'pv' || CAST(ck % 3 AS VARCHAR) FROM f WHERE ck % 2 = 0
      UNION ALL
      SELECT ck, 'todd', 'm1' FROM f WHERE ck % 6 = 0
      UNION ALL
      SELECT ck, 'mv0', 'None' FROM f WHERE ck % 6 = 0
      UNION ALL
      SELECT ck, 'm1', 'mv0' FROM f WHERE ck % 2 = 0 AND ck % 3 <> 0
      UNION ALL
      SELECT ck, 'm1', 'x2' FROM f WHERE ck % 3 = 0
      UNION ALL
      SELECT ck, 'cA', 'seed' FROM f WHERE ck % 3 = 0
    ),
    ent_agg AS (
      SELECT ck, k,
             array_to_string(list_sort(list_distinct(list(v))), ',') AS vs
      FROM ent GROUP BY ck, k
    ),
    dyn AS (
      SELECT ck, string_agg(k || ':' || vs, '|' ORDER BY k) AS dyn_s
      FROM ent_agg GROUP BY ck
    )
    SELECT f.ck AS id,
      array_to_string(list_sort(list_distinct(
        ['pre' || CAST(f.ck % 2 AS VARCHAR)]
        || CASE WHEN f.ck % 2 = 0
                THEN ['i1' || CAST(f.ck % 3 AS VARCHAR)] ELSE [] END
        || CASE WHEN f.ck % 3 = 0
                THEN ['i2' || CAST(f.ck % 2 AS VARCHAR)] ELSE [] END
      )), '|') AS instance_s,
      COALESCE(dyn.dyn_s, '') AS dyn_s
    FROM f LEFT JOIN dyn ON f.ck = dyn.ck
    """,
    doc="J8 TEMAS enrichment: union-view provenance, first-source db "
    "rule, pairwise tag/contexto parse with odd-length NULL pad",
)
def q31_temas_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.enrich.enrich import enrich_temas, union_with_provenance

    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    t1 = cust.filter(k % 2 == 0).select(
        k.alias("id_iahx"),
        F.array(F.concat(F.lit("i1"), _s(k % 3))).alias("instance_iahx"),
        F.when(k % 4 == 0, F.array(F.lit("cA"), F.lit("cB")))
        .otherwise(F.array(F.lit("cA")))
        .alias("collection_iahx"),
        # odd length on ck%3==0: 'todd' pads and shifts the concat with
        # tema, reproducing the reference's combined pairwise walk
        F.when(
            k % 3 == 0,
            F.array(F.lit("t1"), F.concat(F.lit("tv"), _s(k % 5)), F.lit("todd")),
        )
        .otherwise(F.array(F.lit("t1"), F.concat(F.lit("tv"), _s(k % 5))))
        .alias("tema_subtema"),
        F.array(F.lit("m1"), F.lit("mv0")).alias("tema"),
        F.array(F.lit("cA"), F.concat(F.lit("pv"), _s(k % 3))).alias("projeto"),
        F.lit("dbA0").alias("db"),
    )
    t2 = cust.filter(k % 3 == 0).select(
        k.alias("id_iahx"),
        F.array(F.concat(F.lit("i2"), _s(k % 2))).alias("instance_iahx"),
        F.array(F.lit("cB")).alias("collection_iahx"),
        F.array().cast(EMPTY).alias("tema_subtema"),
        F.array(F.lit("m1"), F.lit("x2")).alias("tema"),
        F.array().cast(EMPTY).alias("projeto"),
        F.lit("dbB").alias("db"),
    )
    temas = union_with_provenance({"t1": t1, "t2": t2})
    facts = cust.select(
        k.alias("id"),
        F.array(F.concat(F.lit("pre"), _s(k % 2))).alias("instance"),
        F.when(k % 3 == 0, F.create_map(F.lit("cA"), F.array(F.lit("seed"))))
        .otherwise(F.create_map().cast("map<string,array<string>>"))
        .alias("dyn"),
    )
    out = enrich_temas(facts, temas, id_col="id")
    return out.select(
        "id",
        F.array_join(F.col("instance"), "|").alias("instance_s"),
        _dyn_s(F.col("dyn")).alias("dyn_s"),
    )


# --------------------------------------------------------------------------
# q32: J9 under the oracle gate. Brisa rows map ' N<nk> '/'ALT<nk>' ->
# 'R<nk>' (trimmed keys, multi-key ai1 lists); a second row set with
# empty ai2 ('SKIP<nk>') must be ignored. Fact ai arrays exercise:
# matching trimmed values, untouched non-matches, NULL elements kept in
# place, NULL ai passthrough, and empty-array preservation.
@qdef(
    QUERIES,
    "q32_rename_ai_join",
    oracle="""
    SELECT c_custkey AS id,
      CASE WHEN c_custkey % 9 = 0 THEN NULL
           WHEN c_custkey % 13 = 0 THEN ''
           ELSE 'R' || CAST(c_custkey % 25 AS VARCHAR)
             || '|R' || CAST(c_custkey % 7 AS VARCHAR)
             || '|' || CASE WHEN c_custkey % 4 = 0
                            THEN 'None'
                            ELSE 'mid' || CAST(c_custkey AS VARCHAR) END
             || '|keep' || CAST(c_custkey AS VARCHAR)
             || '|SKIP' || CAST(c_custkey % 25 AS VARCHAR)
      END AS ai_s
    FROM customer
    """,
    doc="J9 corporate-author rename: trimmed-key map, empty-ai2 skip, "
    "order/NULL/empty-array preservation",
)
def q32_rename_ai_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.standardize.x01 import rename_ai

    nation = table(spark, sf_dir, "nation")
    nk = F.col("n_nationkey")
    mapped = nation.select(
        F.array(
            F.concat(F.lit(" N"), _s(nk), F.lit(" ")), F.concat(F.lit("ALT"), _s(nk))
        ).alias("ai1"),
        F.concat(F.lit("R"), _s(nk)).alias("ai2"),
    )
    skipped = nation.select(
        F.array(F.concat(F.lit("SKIP"), _s(nk))).alias("ai1"),
        F.lit("").alias("ai2"),  # empty ai2 -> whole row ignored
    )
    brisa = mapped.unionByName(skipped)
    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    ai_arr = F.array(
        F.concat(F.lit("N"), _s(k % 25)),
        F.concat(F.lit(" ALT"), _s(k % 7), F.lit(" ")),
        F.when(k % 4 != 0, F.concat(F.lit("mid"), _s(k))),  # NULL on %4==0
        F.concat(F.lit("keep"), _s(k)),
        F.concat(F.lit("SKIP"), _s(k % 25)),
    )
    facts = cust.select(
        k.alias("id"),
        F.when(k % 9 == 0, F.lit(None).cast(EMPTY))
        .when(k % 13 == 0, F.array().cast(EMPTY))
        .otherwise(ai_arr)
        .alias("ai"),
    )
    out = rename_ai(facts, brisa, id_col="id")
    return out.select("id", F.array_join(F.col("ai"), "|", "None").alias("ai_s"))
