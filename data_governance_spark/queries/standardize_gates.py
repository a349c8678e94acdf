"""Oracle gate q33 (merged, r5 driver-budget) for the standardize field
builders that had no relational-suite coverage: the language-keyed
title/abstract pivots (F7/F8, ex-q33) and the `lo` location builder +
SUS-digital theme extraction (F12/F14, ex-q35) — one row per customer,
all six serialized columns in a single pass.

Same synthesis pattern as q25-q32: arithmetic dims/facts from
customer/nation through the REAL operators, expected output stated
analytically in the DuckDB oracle. Map outputs serialize with the
reference's external field naming ('ti'/'ti_<lang>', 'ab'/'ab_<lang>')
so the gate also pins the flattening contract.

Reference: 02_create_iahx_xml_collection.py:84-164 (F7/F8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_governance_spark.queries.base import QueryDef, qdef
from data_governance_spark.tables import table

QUERIES: dict[str, QueryDef] = {}


def _s(c: Column) -> Column:
    return c.cast("string")


def _named_keys(m: Column, prefix: str) -> Column:
    """Sorted raw keys rendered as the reference's field names:
    '' -> prefix, lang -> prefix_lang. Raw-key sort order == rendered
    order ('' sorts first; 'prefix_' preserves lang order)."""
    return F.array_sort(F.map_keys(m))


def _pivot_arr_s(m: Column, prefix: str) -> Column:
    """map<lang, array<text>> -> 'ti:a,b|ti_en:c' with keys sorted."""
    return F.array_join(
        F.transform(
            _named_keys(m, prefix),
            lambda key: F.concat(
                F.when(key == "", F.lit(prefix)).otherwise(
                    F.concat(F.lit(prefix + "_"), key)
                ),
                F.lit(":"),
                F.array_join(F.element_at(m, key), ","),
            ),
        ),
        "|",
    )


def _pivot_str_s(m: Column, prefix: str) -> Column:
    """map<lang, text> -> 'ab:x|ab_pt:y' with keys sorted."""
    return F.array_join(
        F.transform(
            _named_keys(m, prefix),
            lambda key: F.concat(
                F.when(key == "", F.lit(prefix)).otherwise(
                    F.concat(F.lit(prefix + "_"), key)
                ),
                F.lit(":"),
                F.element_at(m, key),
            ),
        ),
        "|",
    )


# --------------------------------------------------------------------------
# Sub-gate a (ex-q33): F7/F8 under the oracle gate.
#
# Title entries exercise: uppercase lang codes ('EN' -> 'en'), NULL
# text dropped, NULL _i behaving as the bare field, same-lang values
# kept in array order. The multilingual dispatch walks every branch via
# ck%6 (a/as/mc/m/c/none), including the mc+literature_type collection
# concat, the en-fallback only-when-no-en rule, and a NULL fallback
# (ck%11==0) that must not fire. Abstracts exercise the F6 scrub
# (\r\n and control chars -> ' ') and same-lang ' '-concat order.
#
# Sub-gate b (ex-q35): F12 `lo` + F14 susdigital.
#
# The lo entries exercise: the 'text;' prefix and its dangling-';'
# removal (entry2 is text-only), the _a/_b/_c separator state machine
# (b with NO separator when a is absent), ', '/'. ' subfield
# separators including the no-space ',' of _i, the _6 placement rule
# (' ' after text, '. ' without), NULL vs '' subfields, an
# all-empty entry dropped from the ' / ' join, and NULL call_number ->
# NULL lo. susdigital exercises: marker filtering, first-pt-occurrence
# selection (skipping non-pt occurrences), segment-after-last-'/',
# trim, a no-slash occurrence, and pt-less items dropped.
@qdef(
    QUERIES,
    "q33_standardize_text_builders",
    oracle=r"""
    WITH f AS (SELECT c_custkey AS ck, CAST(c_custkey AS VARCHAR) AS cs
               FROM customer)
    SELECT ck AS id,
      array_to_string(list_filter([
        CASE WHEN ck % 7 = 0 OR ck % 2 = 1 THEN 'ti:T3-' || cs END,
        CASE WHEN ck % 3 = 0 THEN 'ti_en:T1-' || cs END,
        CASE WHEN ck % 5 <> 0 THEN 'ti_es:T2-' || cs END,
        CASE WHEN ck % 3 <> 0 OR (ck % 2 = 0 AND ck % 7 <> 0)
             THEN 'ti_pt:' ||
               CASE WHEN ck % 3 <> 0
                    THEN 'T1-' || cs ||
                      CASE WHEN ck % 2 = 0 AND ck % 7 <> 0
                           THEN ',T3-' || cs ELSE '' END
                    ELSE 'T3-' || cs END
        END
      ], x -> x IS NOT NULL), '|') AS ti_s,
      CASE ck % 6
        WHEN 0 THEN  -- tl 'a', ck%3=0 so title list HAS en: no fallback
          array_to_string(list_filter([
            CASE WHEN ck % 7 = 0 THEN 'ti:T3-' || cs END,
            'ti_en:T1-' || cs,
            CASE WHEN ck % 5 <> 0 THEN 'ti_es:T2-' || cs END,
            CASE WHEN ck % 7 <> 0 THEN 'ti_pt:T3-' || cs END
          ], x -> x IS NOT NULL), '|')
        WHEN 1 THEN  -- tl 'as', odd, ck%3=1: fallback unless ett NULL
          array_to_string(list_filter([
            'ti:T3-' || cs,
            CASE WHEN ck % 11 <> 0 THEN 'ti_en:ET-' || cs END,
            CASE WHEN ck % 5 <> 0 THEN 'ti_es:T2-' || cs END,
            'ti_pt:T1-' || cs
          ], x -> x IS NOT NULL), '|')
        WHEN 2 THEN  -- tl 'mc', even so lit='mc': + collection, C1 bare
          array_to_string(list_filter([
            'ti:C1-' || cs,
            'ti_en:' || CASE WHEN ck % 5 = 1 THEN 'M2-' ELSE 'EM-' END || cs,
            CASE WHEN ck % 5 <> 1 THEN 'ti_es:M2-' || cs END,
            'ti_pt:M1-' || cs
          ], x -> x IS NOT NULL), '|')
        WHEN 3 THEN  -- tl 'm', monographic only
          array_to_string(list_filter([
            'ti_en:' || CASE WHEN ck % 5 = 1 THEN 'M2-' ELSE 'EM-' END || cs,
            CASE WHEN ck % 5 <> 1 THEN 'ti_es:M2-' || cs END,
            'ti_pt:M1-' || cs
          ], x -> x IS NOT NULL), '|')
        WHEN 4 THEN  -- tl 'c', even so C1 bare: collection + EC fallback
          'ti:C1-' || cs || '|ti_en:EC-' || cs
        ELSE ''      -- unknown treatment level -> empty
      END AS mt_s,
      'ab:t' || cs || CASE WHEN ck % 3 = 0 THEN '|ab_es:u' ELSE '' END
        || '|ab_pt:p' || cs || ' q r s' AS ab_s,
      CASE WHEN ck % 10 = 0 THEN NULL ELSE
        CASE WHEN ck % 2 = 0 THEN 'LOC' || cs || ';' ELSE '' END
        || CASE WHEN ck % 3 = 0
                THEN (CASE WHEN ck % 2 = 0 THEN ' ' ELSE '' END) || 'Aa' || cs
                ELSE '' END
        || CASE WHEN ck % 3 = 0 THEN ', ' ELSE '' END || 'Bb' || cs
        || CASE WHEN ck % 4 = 0 THEN ', Cc' || cs ELSE '' END
        || CASE WHEN ck % 5 = 0 THEN ', Dd' || cs ELSE '' END
        || '. Hh' || cs
        || CASE WHEN ck % 7 = 0 THEN ',Ii' || cs ELSE '' END
        || CASE WHEN ck % 3 = 0
                THEN (CASE WHEN ck % 2 = 0 THEN ' ' ELSE '. ' END) || 'Ss' || cs
                ELSE '' END
        || '. Tt' || cs
        || CASE WHEN ck % 8 <> 0 THEN ' / X' || cs ELSE '' END
      END AS lo_s,
      COALESCE(array_to_string(list_filter([
        CASE WHEN ck % 2 = 0 THEN 'PT' || cs END,
        CASE WHEN ck % 5 = 0 THEN 'MX' || cs END,
        CASE WHEN ck % 7 = 0 THEN 'ptnoslash' || cs END
      ], x -> x IS NOT NULL), '|'), '') AS prog_s,
      'AT' || cs AS alvo_s
    FROM f
    """,
    doc="merged gate (r5 driver-budget): F7/F8 language pivots "
    "(title/abstract lang maps, multilingual title dispatch with "
    "en-fallback, F6 control-char scrub; ex-q33) + F12 lo location "
    "builder (26-subfield separator state machine) + F14 SUS-digital "
    "theme extraction (ex-q35)",
)
def q33_standardize_text_builders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.standardize.citation import lo_standard
    from data_governance_spark.standardize.fields import (
        abstract_lang_map,
        multilingual_title,
        susdigital_themes,
        title_lang_map,
    )

    # single-row-group input + heavy per-row builder expressions: fan
    # out across cores (map-only gate, partitioning-invariant; see the
    # q36 rationale in pipeline_gate.py)
    cust = table(spark, sf_dir, "customer").repartition(
        spark.sparkContext.defaultParallelism
    )
    k = F.col("c_custkey")
    cs = _s(k)

    def ent(text: Column, lang: Column) -> Column:
        return F.struct(text.alias("text"), lang.alias("_i"))

    nul = F.lit(None).cast("string")
    titles = F.array(
        ent(
            F.concat(F.lit("T1-"), cs),
            F.when(k % 3 == 0, F.lit("EN")).otherwise(F.lit("pt")),
        ),
        ent(F.when(k % 5 != 0, F.concat(F.lit("T2-"), cs)), F.lit("es")),
        ent(
            F.concat(F.lit("T3-"), cs),
            F.when(k % 7 == 0, nul)
            .when(k % 2 == 0, F.lit("pt"))
            .otherwise(F.lit("")),
        ),
    )
    monographic = F.array(
        ent(F.concat(F.lit("M1-"), cs), F.lit("pt")),
        ent(
            F.concat(F.lit("M2-"), cs),
            F.when(k % 5 == 1, F.lit("en")).otherwise(F.lit("es")),
        ),
    )
    collection = F.array(
        ent(
            F.concat(F.lit("C1-"), cs),
            F.when(k % 2 == 0, F.lit("")).otherwise(F.lit("en")),
        )
    )
    abstracts = F.array(
        ent(F.concat(F.lit("p"), cs, F.lit("\r\nq")), F.lit("PT")),
        ent(F.lit("r\x07s"), F.lit("pt")),
        ent(nul, F.lit("en")),  # NULL text: dropped, no 'en' key
        ent(F.concat(F.lit("t"), cs), nul),  # NULL _i -> bare 'ab'
        ent(F.when(k % 3 == 0, F.lit("u")), F.lit("ES")),
    )
    tl = (
        F.when(k % 6 == 0, F.lit("a"))
        .when(k % 6 == 1, F.lit("as"))
        .when(k % 6 == 2, F.lit("mc"))
        .when(k % 6 == 3, F.lit("m"))
        .when(k % 6 == 4, F.lit("c"))
        .otherwise(F.lit("zz"))
    )
    lit_type = F.when(k % 2 == 0, F.lit("mc")).otherwise(F.lit("x"))
    ett = F.when(k % 11 != 0, F.concat(F.lit("ET-"), cs))

    lo_fields = ["text"] + [f"_{c}" for c in "abcdefghijklmnopqrstuvwxyz0123456789"]

    def entry(**vals: Column) -> Column:
        return F.struct(*[vals.get(f, nul).alias(f) for f in lo_fields])

    e1 = entry(
        text=F.when(k % 2 == 0, F.concat(F.lit("LOC"), cs)).otherwise(F.lit("")),
        _a=F.when(k % 3 == 0, F.concat(F.lit("Aa"), cs)).otherwise(F.lit("")),
        _b=F.concat(F.lit("Bb"), cs),
        _c=F.when(k % 4 == 0, F.concat(F.lit("Cc"), cs)).otherwise(F.lit("")),
        _d=F.when(k % 5 == 0, F.concat(F.lit("Dd"), cs)),  # NULL else
        _h=F.concat(F.lit("Hh"), cs),
        _i=F.when(k % 7 == 0, F.concat(F.lit("Ii"), cs)).otherwise(F.lit("")),
        _6=F.when(k % 3 == 0, F.concat(F.lit("Ss"), cs)).otherwise(F.lit("")),
        _7=F.concat(F.lit("Tt"), cs),
    )
    e2 = entry(
        text=F.when(k % 8 != 0, F.concat(F.lit("X"), cs)).otherwise(F.lit(""))
    )
    call_number = F.when(k % 10 != 0, F.array(e1, e2))
    paths = F.concat(
        F.array(F.concat(F.lit("Alvo x|pt-br /q/AT"), cs)),
        F.when(
            k % 2 == 0, F.array(F.concat(F.lit("Programas|en /x/TEN|pt /a/PT"), cs))
        ).otherwise(F.array().cast("array<string>")),
        F.when(k % 3 == 0, F.array(F.lit("Programas|nothing here"))).otherwise(
            F.array().cast("array<string>")
        ),
        F.when(
            k % 5 == 0, F.array(F.concat(F.lit("Programas| pt-br /m/n/MX"), cs))
        ).otherwise(F.array().cast("array<string>")),
        F.when(
            k % 7 == 0, F.array(F.concat(F.lit("Programas|ptnoslash"), cs))
        ).otherwise(F.array().cast("array<string>")),
    )
    # call_number is materialized as a real column so the lo tree is
    # the memoized lo_standard() (shared with q36's wide select — the
    # 26-subfield state machine is the most expensive Column build in
    # the standardize family; building it per gate cost ~0.45 s)
    pre = cust.select(
        k.alias("id"),
        title_lang_map(titles).alias("ti_map"),
        multilingual_title(
            tl,
            lit_type,
            titles,
            monographic,
            collection,
            ett,
            F.concat(F.lit("EM-"), cs),
            F.concat(F.lit("EC-"), cs),
        ).alias("mt_map"),
        abstract_lang_map(abstracts).alias("ab_map"),
        call_number.alias("call_number"),
        paths.alias("_paths"),
    )
    p = F.col("_paths")
    facts = pre.select(
        "id",
        "ti_map",
        "mt_map",
        "ab_map",
        lo_standard().alias("lo_s"),
        F.array_join(susdigital_themes(p, "Programas"), "|").alias("prog_s"),
        F.array_join(susdigital_themes(p, "Alvo"), "|").alias("alvo_s"),
    )
    return facts.select(
        "id",
        _pivot_arr_s(F.col("ti_map"), "ti").alias("ti_s"),
        _pivot_arr_s(F.col("mt_map"), "ti").alias("mt_s"),
        _pivot_str_s(F.col("ab_map"), "ab").alias("ab_s"),
        "lo_s",
        "prog_s",
        "alvo_s",
    )
