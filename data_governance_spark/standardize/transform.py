"""The standardize stage end-to-end: landing zone -> 02-style wide
table (transform_and_migrate, 02_create_iahx_xml_collection.py:756-1012)
as ONE Catalyst plan: P1 filter -> broadcast dim joins -> wide select.

Differences from the reference by design (SURVEY §7.1):
- dynamically-named fields (ti_<lang>/ab_<lang>) are MapType columns
  ``ti``/``ab``; sinks flatten them;
- null/''/[] pruning (P8) happens at the sinks, not in the model —
  the stage output has a fixed schema with nulls;
- ``current_year`` is injected (A18 determinism);
- fo (F11) / lo (F12) are column expression trees (citation.py).

Scale: the only shuffles are the groupBys inside the author/DECS
reassembly (keyed by primary key); every dim join is broadcast. At
100 TB the landing table streams through in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_governance_spark.standardize import fields as X
from data_governance_spark.standardize import joins as J
from data_governance_spark.standardize.citation import (
    fo_standard,
    lo_standard,
    per_context_cache,
)

AUTHOR_PRIORITY = (
    "individual_author",
    "corporate_author",
    "individual_author_monographic",
    "corporate_author_monographic",
    "individual_author_collection",
    "corporate_author_collection",
)


def stage_filter(df: DataFrame) -> DataFrame:
    """P1 (:776-779): status in {0,1,-2,-3} and treatment_level
    present/non-empty."""
    return df.filter(
        F.col("status").isin(0, 1, -2, -3)
        & F.col("treatment_level").isNotNull()
        & (F.col("treatment_level") != "")
    )


def standardize(
    landing: DataFrame,
    tabpais: DataFrame,
    title_current: DataFrame,
    decs: DataFrame,
    current_year: int,
) -> DataFrame:
    """Landing zone -> standardized wide table."""
    df = stage_filter(landing)

    # author priority dispatch (:801-814): first PRESENT field wins
    dispatched = F.coalesce(*[F.col(c) for c in AUTHOR_PRIORITY])
    df = df.withColumn("_authors", dispatched)

    df = J.add_country_fields(df, tabpais, title_current=title_current)
    df = J.add_author_fields(df, tabpais, authors_col="_authors", id_col="id")
    df = J.add_ta_var(df, title_current, id_col="id")

    decs_lk = J.decs_lookup(decs)
    text_of = lambda c: F.transform(  # noqa: E731
        F.coalesce(F.col(c), F.array().cast("array<struct<text:string>>")),
        lambda x: F.regexp_replace(x["text"], r"\^d", ""),
    )
    # one batched pass for all four DECS fields: 1 shuffle + 2 broadcast
    # builds instead of 4 + 8 (see decs_code_arrays)
    df = J.decs_code_arrays(
        df,
        decs_lk,
        [
            (F.col("check_tags"), "ct"),
            (F.col("publication_type"), "pt"),
            (text_of("descriptors_primary"), "mj"),
            (text_of("descriptors_secondary"), "mh"),
        ],
        id_col="id",
    )

    return df.select(*_wide_select_cols(current_year))


# The ~60-field wide select is a pure function of column NAMES plus
# current_year — every reference is an unresolved F.col. Building it
# costs ~4 s of py4j round-trips (fo alone 2.5 s), paid per
# standardize() call without this cache (VERDICT r5 #4: the q36 gate's
# dominant cost). Stored in citation.per_context_cache() — scoped to
# the live SparkContext object, so stale trees can't outlive it.


def _wide_select_cols(current_year: int) -> list:
    store = per_context_cache()
    key = ("wide_select", current_year)
    if key in store:
        return store[key]

    id_value = X.doc_id(F.col("id"), F.col("LILACS_original_id"))
    descritores = X.descritores_locais(F.col("local_descriptors"))
    year4 = F.substring(F.coalesce(F.col("publication_date_normalized"), F.lit("")), 1, 4)

    cols = [
        id_value.alias("id"),
        F.col("id").alias("id_pk"),
        X.ai_corporate(
            F.col("corporate_author"), F.col("corporate_author_monographic")
        ).alias("ai"),
        F.col("doi_number").alias("aid"),
        X.alternate_id(
            F.coalesce(F.col("alternate_ids"), F.array().cast("array<string>")),
            id_value,
        ).alias("alternate_id"),
        X.book_title(
            F.col("title_monographic"), F.col("literature_type"), F.col("treatment_level")
        ).alias("book_title"),
        F.col("cooperative_center_code").alias("cc"),
        F.col("conference_country").alias("cn_co"),
        F.col("conference_city").alias("cn_cy"),
        F.col("conference_normalized_date").alias("cn_da"),
        F.col("conference_date").alias("cn_dt"),
        F.col("conference_sponsoring_institution").alias("cn_in"),
        F.col("conference_name").alias("cn_na"),
        F.col("ct"),
        F.col("publication_city").alias("cy"),
        X.da(F.col("publication_date_normalized")).alias("da"),
        F.col("database"),
        F.col("indexed_database").alias("db"),
        descritores.alias("descritores_locais"),
        F.col("publication_date").alias("dp"),
        X.ec_flag(F.col("clinical_trial_registry_name")).alias("ec"),
        F.col("edition").alias("ed"),
        X.entry_date(
            F.col("created_time"), F.col("transfer_date_to_database")
        ).alias("entry_date"),
        F.col("issue_number").alias("ip"),
        F.col("issn").alias("is"),
        F.col("isbn"),
        F.col("text_language").alias("la"),
        F.col("license"),
        F.col("mh"),
        F.col("mj"),
        F.col("treatment_level").alias("nivel_tratamento"),
        X.no_indexing(
            F.col("descriptors_primary"), F.col("descriptors_secondary")
        ).alias("no_indexing"),
        F.col("non_decs_region"),
        F.col("total_number_of_volumes").alias("ntv"),
        descritores.alias("ot"),
        X.pg(F.col("pages"), F.col("pages_monographic")).alias("pg"),
        F.col("project_sponsoring_institution").alias("pr_in"),
        F.col("project_name").alias("pr_na"),
        F.col("project_number").alias("pr_nu"),
        F.col("pt"),
        F.col("publisher").alias("pu"),
        F.col("related_research"),
        F.col("related_resource"),
        X.status_label(F.col("status")).alias("status_fiadmin"),
        F.col("title_serial").alias("ta"),
        X.ta_fascic(
            F.col("ta_var"), F.col("volume_serial"), F.col("issue_number"), year4
        ).alias("ta_fascic"),
        F.col("ta_var"),
        F.col("community").alias("tag_comunidade"),
        F.col("community_collection_path").alias("tag_colecao"),
        F.col("thesis_dissertation_institution").alias("th_in"),
        X.th_le(F.col("thesis_dissertation_leader")).alias("th_le"),
        F.col("thesis_dissertation_academic_title").alias("th_ti"),
        F.col("inventory_number").alias("tombo"),
        X.document_type(F.col("literature_type"), F.col("electronic_address")).alias(
            "type"
        ),
        X.update_date(F.col("updated_time")).alias("update_date"),
        X.vi(F.col("volume_monographic"), F.col("volume_serial")).alias("vi"),
        X.weight(
            F.col("literature_type"),
            F.col("publication_date_normalized"),
            F.col("abstract"),
            F.col("electronic_address"),
            current_year,
        ).alias("weight"),
        X.multilingual_title(
            F.col("treatment_level"), F.col("literature_type"), F.col("title"),
            F.col("title_monographic"), F.col("title_collection"),
            F.col("english_translated_title"), F.col("english_title_monographic"),
            F.col("english_title_collection"),
        ).alias("ti"),
        X.abstract_lang_map(
            F.coalesce(
                F.col("abstract"), F.array().cast("array<struct<text:string,_i:string>>")
            )
        ).alias("ab"),
        X.ur(F.col("electronic_address")).alias("ur"),
        X.ur_multimedia(F.col("electronic_address")).alias("ur_MULTIMEDIA"),
        X.ur_audio(F.col("electronic_address")).alias("ur_AUDIO"),
        X.ur_meta(F.col("electronic_address")).alias("ur_meta"),
        X.fulltext_flag(F.col("electronic_address")).alias("fulltext"),
        F.transform(
            F.coalesce(
                F.col("author_keyword"), F.array().cast("array<struct<text:string>>")
            ),
            lambda x: x["text"],
        ).alias("kw"),
        F.col("au"),
        F.col("afiliacao_autor"),
        F.col("af"),
        F.col("instituicao_pais_afiliacao"),
        F.col("pais_afiliacao"),
        F.col("auid"),
        F.col("email"),
        F.col("cp"),
        F.col("pais_publicacao"),
        X.susdigital_themes(F.col("community_collection_path"), "Programas").alias(
            "tema_susdigital_programas"
        ),
        X.susdigital_themes(F.col("community_collection_path"), "Alvo").alias(
            "tema_susdigital_publico_alvo"
        ),
        fo_standard().alias("fo"),
        lo_standard().alias("lo"),
    ]
    store[key] = cols
    return cols
