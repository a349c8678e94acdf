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
