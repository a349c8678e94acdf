"""Deterministic reference-shaped fixtures (FIXTURES.md).

Synthetic rows for the document-shaped surface the TPC-H-ish testdata
does not cover: the TMGL landing zone (XML-sourced, all strings /
string arrays) and its dimension tables. Seeded & pure-Python so tests
and goldens are stable.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TMGL_LANDING_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("instance", T.ArrayType(T.StringType())),
        T.StructField("dp", T.StringType()),
        T.StructField("la", T.ArrayType(T.StringType())),
        T.StructField("ta", T.ArrayType(T.StringType())),
        T.StructField("type", T.ArrayType(T.StringType())),
        T.StructField("type_of_study", T.ArrayType(T.StringType())),
        T.StructField("mj", T.ArrayType(T.StringType())),
        T.StructField("tag_dimentions", T.ArrayType(T.StringType())),
        T.StructField("tag_mtc_tema2", T.ArrayType(T.StringType())),
        T.StructField("tag_mtc_tema3", T.ArrayType(T.StringType())),
        T.StructField("traditional_medicines_cluster", T.ArrayType(T.StringType())),
        T.StructField("who_regions", T.ArrayType(T.StringType())),
        T.StructField("fulltext", T.StringType()),
        T.StructField("cp", T.ArrayType(T.StringType())),
        T.StructField("pais_afiliacao", T.ArrayType(T.StringType())),
    ]
)

_LANGS = ["En", "PT", "es", "fr", "EN", "pt"]
_JOURNALS = ["J Trad Med", "Acta Medica", "Rev Saude", "Phytotherapy"]
_TYPES = ["article", "monography", "thesis", "video", "audio", "podcast", "database"]
_STUDY = [
    "systematic_reviews", "literature_review", "guideline", "clinical_trials",
    "overview", "diagnostic_studies", "case_report",  # case_report: passthrough
]
_DATES = ["2021", "Jan-Mar 2019", "s.d.", "1499", "2020-2021", "c1987", ""]
_COUNTRIES = ["Brazil", "India", "China", "France", "Nigeria", "Atlantis"]
_REGIONS = {
    "brazil": "amro", "india": "searo", "china": "wpro",
    "france": "euro", "nigeria": "afro",
}
_DIMS = ["dim/one", "dim/two", "nomatch", "Mental Health/Stress"]
_MJ = ["^d12345^s6789", "^d00042", "no_digits", "^d777"]


def tmgl_landing_rows(n: int = 240, seed: int = 7) -> list[tuple]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        n_countries = rng.randint(0, 3)
        countries = rng.sample(_COUNTRIES, n_countries)
        rows.append(
            (
                str(i),
                ["tmgl"],
                rng.choice(_DATES),
                rng.sample(_LANGS, rng.randint(1, 2)),
                rng.sample(_JOURNALS, rng.randint(0, 2)),
                rng.sample(_TYPES, rng.randint(1, 2)),
                rng.sample(_STUDY, rng.randint(0, 2)),
                rng.sample(_MJ, rng.randint(0, 2)),
                rng.sample(_DIMS, rng.randint(0, 2)),
                rng.sample(["comp_a", "comp_b"], rng.randint(0, 1)),
                rng.sample(_DIMS, rng.randint(0, 1)),
                rng.sample(["cluster_x", "cluster_y"], rng.randint(0, 1)),
                rng.sample(["amro/Brazil", "searo/India", "euro/France"], rng.randint(0, 2)),
                rng.choice(["1", None]),
                countries,
                [f"^i{c}^e{c}^p{c}" for c in countries],
            )
        )
    return rows


def tmgl_landing(spark: SparkSession, n: int = 240, seed: int = 7) -> DataFrame:
    return spark.createDataFrame(tmgl_landing_rows(n, seed), TMGL_LANDING_SCHEMA)


def _arr_struct(*fields: str) -> T.ArrayType:
    return T.ArrayType(
        T.StructType([T.StructField(f, T.StringType()) for f in fields])
    )


AUTHOR_STRUCT = _arr_struct("text", "_1", "_2", "_3", "_p", "_c", "_k", "_w", "_e")

FIADMIN_LANDING_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("treatment_level", T.StringType()),
        T.StructField("literature_type", T.StringType()),
        T.StructField("title", _arr_struct("text", "_i")),
        T.StructField("english_translated_title", T.StringType()),
        T.StructField("title_monographic", _arr_struct("text", "_i")),
        T.StructField("title_collection", _arr_struct("text", "_i")),
        T.StructField("english_title_monographic", T.StringType()),
        T.StructField("english_title_collection", T.StringType()),
        T.StructField("abstract", _arr_struct("text", "_i")),
        T.StructField("pages", _arr_struct("_f", "_l", "text", "f", "_e")),
        T.StructField("pages_monographic", T.StringType()),
        T.StructField("electronic_address", _arr_struct("_u", "_y", "_z", "_x", "_q")),
        T.StructField("individual_author", AUTHOR_STRUCT),
        T.StructField("corporate_author", AUTHOR_STRUCT),
        T.StructField("individual_author_monographic", AUTHOR_STRUCT),
        T.StructField("corporate_author_monographic", AUTHOR_STRUCT),
        T.StructField("individual_author_collection", AUTHOR_STRUCT),
        T.StructField("corporate_author_collection", AUTHOR_STRUCT),
        T.StructField("author_keyword", _arr_struct("text")),
        T.StructField("title_serial", T.StringType()),
        T.StructField("volume_serial", T.StringType()),
        T.StructField("volume_monographic", T.StringType()),
        T.StructField("issue_number", T.StringType()),
        T.StructField("publication_date", T.StringType()),
        T.StructField("publication_date_normalized", T.StringType()),
        T.StructField("publication_country", T.StringType()),
        T.StructField("publication_city", T.StringType()),
        T.StructField("publisher", T.StringType()),
        T.StructField("edition", T.StringType()),
        T.StructField("descriptive_information", _arr_struct("_b")),
        T.StructField("symbol", T.StringType()),
        T.StructField(
            "call_number",
            _arr_struct(
                "text", *[f"_{c}" for c in "abcdefghijklmnopqrstuvwxyz"],
                *[f"_{d}" for d in "0123456789"],
            ),
        ),
        T.StructField("check_tags", T.ArrayType(T.StringType())),
        T.StructField("publication_type", T.ArrayType(T.StringType())),
        T.StructField("descriptors_primary", _arr_struct("text")),
        T.StructField("descriptors_secondary", _arr_struct("text")),
        T.StructField("local_descriptors", T.StringType()),
        T.StructField("issn", T.StringType()),
        T.StructField("shortened_title", T.StringType()),
        T.StructField("LILACS_original_id", T.StringType()),
        T.StructField("alternate_ids", T.ArrayType(T.StringType())),
        T.StructField("doi_number", T.StringType()),
        T.StructField("isbn", T.StringType()),
        T.StructField("license", T.StringType()),
        T.StructField("text_language", T.ArrayType(T.StringType())),
        T.StructField("indexed_database", T.ArrayType(T.StringType())),
        T.StructField("database", T.ArrayType(T.StringType())),
        T.StructField("cooperative_center_code", T.StringType()),
        T.StructField("conference_country", T.StringType()),
        T.StructField("conference_city", T.StringType()),
        T.StructField("conference_normalized_date", T.StringType()),
        T.StructField("conference_date", T.StringType()),
        T.StructField("conference_sponsoring_institution", T.StringType()),
        T.StructField("conference_name", T.StringType()),
        T.StructField("project_sponsoring_institution", T.StringType()),
        T.StructField("project_name", T.StringType()),
        T.StructField("project_number", T.StringType()),
        T.StructField("thesis_dissertation_institution", T.StringType()),
        T.StructField("thesis_dissertation_leader", _arr_struct("text")),
        T.StructField("thesis_dissertation_academic_title", T.StringType()),
        T.StructField("inventory_number", T.StringType()),
        T.StructField("total_number_of_volumes", T.StringType()),
        T.StructField("non_decs_region", T.ArrayType(T.StringType())),
        T.StructField("clinical_trial_registry_name", T.StringType()),
        T.StructField("community", T.StringType()),
        T.StructField("community_collection_path", T.ArrayType(T.StringType())),
        T.StructField("related_research", T.ArrayType(T.StringType())),
        T.StructField("related_resource", T.ArrayType(T.StringType())),
        T.StructField("created_time", T.StringType()),
        T.StructField("transfer_date_to_database", T.StringType()),
        T.StructField("updated_time", T.StringType()),
    ]
)


def fiadmin_landing(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Build a landing-zone DataFrame from sparse dicts (missing keys
    become nulls — the schema-on-read document model, SURVEY §1.3)."""
    full = [{f.name: row.get(f.name) for f in FIADMIN_LANDING_SCHEMA} for row in rows]
    return spark.createDataFrame(
        [tuple(r[f.name] for f in FIADMIN_LANDING_SCHEMA) for r in full],
        FIADMIN_LANDING_SCHEMA,
    )


WHO_REGION_SCHEMA = T.StructType(
    [
        T.StructField("who_region", T.StringType()),
        T.StructField("pais_en", T.StringType()),
        T.StructField("pais_tmgl", T.StringType()),
        T.StructField("pais_sinonimo", T.ArrayType(T.StringType())),
    ]
)


def who_region_dim(spark: SparkSession) -> DataFrame:
    rows = [
        (region, country.capitalize(), country.capitalize(), [country[:2].upper()])
        for country, region in _REGIONS.items()
    ]
    return spark.createDataFrame(rows, WHO_REGION_SCHEMA)


def tmgl_areas_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [("dim/one", "Dimension One"), ("dim/two", "Dimension Two")],
        T.StructType(
            [
                T.StructField("code_xml", T.StringType()),
                T.StructField("label_en", T.StringType()),
            ]
        ),
    )
