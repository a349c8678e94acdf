"""Enrichment-stage tests (J6-J8, U1/U2) incl. the idempotency property
(SURVEY §5.4: run twice ≡ run once — the reference's $setUnion
convergence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_governance_spark.enrich import (
    enrich_db_instance_ecollection,
    enrich_instance_ecollection,
    enrich_temas,
    union_with_provenance,
)

FACT_SCHEMA = (
    "id string, db array<string>, database array<string>, instance array<string>"
)
IEC_SCHEMA = (
    "db string, instance array<string>, collection string,"
    " collection_instance array<string>"
)
DBIEC_SCHEMA = (
    "database_campo4 string, db array<string>, instance array<string>,"
    " collection_instance array<string>"
)
TEMAS_SCHEMA = (
    "id_iahx string, db string, instance_iahx array<string>,"
    " collection_iahx array<string>, tema_subtema array<string>,"
    " tema array<string>, projeto array<string>"
)


@pytest.fixture(scope="module")
def fact(spark):
    return spark.createDataFrame(
        [
            ("1", ["LILACS", "MOSAICO"], ["Saúde Pública"], ["pre-existing"]),
            ("2", ["UNKNOWN"], None, None),
            ("3", None, None, None),
        ],
        FACT_SCHEMA,
    )


def test_union_with_provenance(spark):
    a = spark.createDataFrame([("x", 1)], "id string, a int")
    b = spark.createDataFrame([("y",)], "id string")
    u = union_with_provenance({"coll_a": a, "coll_b": b})
    rows = {r["id"]: (r["_source"], r["a"]) for r in u.collect()}
    assert rows == {"x": ("coll_a", 1), "y": ("coll_b", None)}


def test_enrich_instance_ecollection(spark, fact):
    dim = spark.createDataFrame(
        [
            ("LILACS", ["regional"], "c1", ["collection_lilacs"]),
            ("MOSAICO", ["mtci"], None, ["collection_lilacs", "collection_mtci"]),
        ],
        IEC_SCHEMA,
    )
    out = {r["id"]: r for r in enrich_instance_ecollection(fact, dim).collect()}
    r1 = out["1"]
    assert r1["instance"] == sorted(["pre-existing", "regional", "mtci"])
    assert r1["dyn"]["collection_lilacs"] == ["LILACS", "MOSAICO"]
    assert r1["dyn"]["collection_mtci"] == ["MOSAICO"]
    assert out["2"]["instance"] is None and out["2"]["dyn"] == {}
    assert out["3"]["dyn"] == {}


def test_enrich_db_instance_ecollection(spark, fact):
    dim = spark.createDataFrame(
        [("saude publica", ["SP-DB"], ["inst-sp"], ["area:saude", "tipo:tecnico"])],
        DBIEC_SCHEMA,
    )
    out = {r["id"]: r for r in enrich_db_instance_ecollection(fact, dim).collect()}
    r1 = out["1"]
    # diacritics-stripped lowered key matched 'Saúde Pública'
    assert r1["db"] == sorted(["LILACS", "MOSAICO", "SP-DB"])
    assert r1["instance"] == sorted(["pre-existing", "inst-sp"])
    assert r1["dyn"] == {"area": ["saude"], "tipo": ["tecnico"]}
    assert out["2"]["db"] == ["UNKNOWN"]


def test_enrich_temas_pairwise_and_first_db(spark, fact):
    temas = spark.createDataFrame(
        [
            ("1", "db_a", ["i1"], ["collection_hans"], ["tag_x", "v1", "tag_x", "v2"],
             ["tag_y", "v3", "odd_key"], ["ctx", "p1"]),
            ("1", "db_b", ["i2"], ["collection_hans", "collection_two"], None, None, None),
        ],
        TEMAS_SCHEMA,
    )
    out = {r["id"]: r for r in enrich_temas(fact, temas).collect()}
    r1 = out["1"]
    assert r1["instance"] == sorted(["pre-existing", "i1", "i2"])
    # first (min) db payload backs every collection_* field
    assert r1["dyn"]["collection_hans"] == ["db_a"]
    assert r1["dyn"]["collection_two"] == ["db_a"]
    assert r1["dyn"]["tag_x"] == ["v1", "v2"]
    assert r1["dyn"]["tag_y"] == ["v3"]
    # odd-length padding keeps a NULL value (reference :436)
    assert r1["dyn"]["odd_key"] == [None]
    assert r1["dyn"]["ctx"] == ["p1"]


def test_enrich_temas_first_db_respects_source_position(spark, fact):
    """A doc in two source collections: the FIRST union-view collection's
    db must win even when a later-positioned source has a lexicographically
    smaller db (ADVICE r2 high: min_by on (_source_pos, db), not min(db))."""
    base = "id_iahx string, db string, instance_iahx array<string>," \
        " collection_iahx array<string>, tema_subtema array<string>," \
        " tema array<string>, projeto array<string>"
    src_late = spark.createDataFrame(
        [("1", "aaa_small_db", ["iL"], ["collection_hans"], None, None, None)], base
    )
    src_first = spark.createDataFrame(
        [("1", "zzz_big_db", ["iF"], ["collection_hans"], None, None, None)], base
    )
    temas = union_with_provenance({"first_view": src_first, "later_view": src_late})
    out = {r["id"]: r for r in enrich_temas(fact, temas).collect()}
    assert out["1"]["dyn"]["collection_hans"] == ["zzz_big_db"]


def test_enrichment_idempotent(spark, fact):
    """Running an enrichment twice must equal running it once."""
    dim = spark.createDataFrame(
        [("LILACS", ["regional"], "c1", ["collection_lilacs"])], IEC_SCHEMA
    )
    once = enrich_instance_ecollection(fact, dim)
    twice = enrich_instance_ecollection(once, dim)
    a = sorted(map(str, once.select("id", "instance", "dyn").collect()))
    b = sorted(map(str, twice.select("id", "instance", "dyn").collect()))
    assert a == b
