"""x01 pass tests: country title-casing application + ai rename (J9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_governance_spark.standardize.x01 import (
    brisa_ai_map,
    normalize_country_fields,
    rename_ai,
)


def test_normalize_country_fields(spark):
    df = spark.createDataFrame(
        [("1", ["^iBRAZIL^pBRASIL"], "^iREPUBLICA DE COREA")],
        "id string, pais_afiliacao array<string>, pais_publicacao string",
    )
    r = normalize_country_fields(df).collect()[0]
    assert r["pais_afiliacao"] == ["^iBrazil^pBrasil"]
    assert r["pais_publicacao"] == "^iRepublica de Corea"


def test_brisa_map_last_wins_and_skips_empty(spark):
    brisa = spark.createDataFrame(
        [(["Old Name"], "New 1"), (["Old Name"], "New 2"), (["Drop"], "  ")],
        "ai1 array<string>, ai2 string",
    )
    m = {r["key"]: r["replacement"] for r in brisa_ai_map(brisa).collect()}
    assert m == {"Old Name": "New 2"}


def test_rename_ai_preserves_order_and_unmatched(spark):
    df = spark.createDataFrame(
        [
            ("1", ["Keep A", " Old Name ", "Keep B"]),
            ("2", None),
            ("3", []),
            ("4", ["Keep C", None, "Old Name"]),
        ],
        "id string, ai array<string>",
    )
    brisa = spark.createDataFrame(
        [(["Old Name"], "Fresh")], "ai1 array<string>, ai2 string"
    )
    out = {r["id"]: r["ai"] for r in rename_ai(df, brisa).collect()}
    assert out["1"] == ["Keep A", "Fresh", "Keep B"]  # trim-keyed match
    assert out["2"] is None
    assert out["3"] == []  # empty array preserved, not [NULL]
    assert out["4"] == ["Keep C", None, "Fresh"]  # NULL element kept in place
