"""P4 country-match parity tests: the regex semantics the reference
uses, incl. its substring looseness."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_governance_spark.metrics.p4 import attach_slice_p4, country_match

SCHEMA = (
    "id string, pais_afiliacao array<string>, cp array<string>,"
    " who_regions array<string>"
)


def _df(spark):
    return spark.createDataFrame(
        [
            ("af", ["^iNew Zealand^eNZ"], None, None),
            ("cp_sub", None, ["old zealand province"], None),  # substring hit!
            ("wr", None, None, ["wpro/New_Zealand"]),
            ("wr_mid", None, None, ["wpro/New_Zealand/extra"]),  # not suffix
            ("none", ["^iBrazil"], ["Brazil"], ["amro/Brazil"]),
        ],
        SCHEMA,
    )


def test_country_match_three_clauses(spark):
    df = _df(spark)
    m = country_match(
        "New Zealand", F.col("pais_afiliacao"), F.col("cp"), F.col("who_regions")
    )
    got = {r["id"] for r in df.filter(m).collect()}
    # cp is a substring regex: 'old zealand province' does NOT contain
    # 'new zealand' -> no; but 'Zealand' alone would match it
    assert got == {"af", "wr"}
    loose = country_match(
        "Zealand", F.col("pais_afiliacao"), F.col("cp"), F.col("who_regions")
    )
    # cp substring-matches 'zealand'; pais_afiliacao does NOT (the
    # pattern anchors right after the ^i marker: no '^iZealand' here)
    assert {r["id"] for r in df.filter(loose).collect()} == {"cp_sub"}


def test_region_form_omits_who_regions(spark):
    df = _df(spark)
    fanned = attach_slice_p4(
        df, {"wpro": ["New Zealand"], "amro": ["Brazil"]}
    )
    got = {(r["id"], r["region"]) for r in fanned.collect()}
    # 'wr' only matches via who_regions, which the region form omits
    assert ("wr", "wpro") not in got
    assert ("af", "wpro") in got
    assert ("none", "amro") in got
    # unmatched rows keep a NULL slice
    assert ("cp_sub", None) in got


def test_multi_region_doc_counted_per_region(spark):
    df = spark.createDataFrame(
        [("x", ["^iBrazil", "^iIndia"], None, None)], SCHEMA
    )
    fanned = attach_slice_p4(df, {"amro": ["Brazil"], "searo": ["India"]})
    got = sorted(r["region"] for r in fanned.collect())
    assert got == ["amro", "searo"]
