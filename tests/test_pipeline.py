"""Full-chain integration: landing -> standardize -> x01 -> enrich ->
XML export (SURVEY §3.1), on reference-shaped fixtures."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_governance_spark.fixtures import fiadmin_landing
from data_governance_spark.pipeline import Dims, export_xml, run_pipeline
from tests.test_transform_e2e import DECS_SCHEMA, TABPAIS_SCHEMA, TITLE_SCHEMA


@pytest.fixture(scope="module")
def dims(spark):
    return Dims(
        tabpais=spark.createDataFrame(
            [("Brasil", "Brazil", "Brasil", "Brésil", "BR", ["bra"])], TABPAIS_SCHEMA
        ),
        title_current=spark.createDataFrame(
            [("1111-2222", "Rev A", "Revista A", None, None, None, None, ["Brazil"])],
            TITLE_SCHEMA,
        ),
        decs=spark.createDataFrame(
            [("000123", "Acupuncture", None, None, None, None, None, None, None,
              None, None, None, None, None)],
            DECS_SCHEMA,
        ),
        instance_ecollection=spark.createDataFrame(
            [("LILACS", ["regional"], "c", ["collection_lilacs"])],
            "db string, instance array<string>, collection string,"
            " collection_instance array<string>",
        ),
        temas={
            "hans": spark.createDataFrame(
                [("lil-55", "dbh", ["inst_h"], ["collection_hans"], ["tag_d", "v9"], None, None)],
                "id_iahx string, db string, instance_iahx array<string>,"
                " collection_iahx array<string>, tema_subtema array<string>,"
                " tema array<string>, projeto array<string>",
            )
        },
        brisa_ai=spark.createDataFrame(
            [(["Corp Velho"], "Corp Novo")], "ai1 array<string>, ai2 string"
        ),
    )


def test_pipeline_end_to_end(spark, dims, tmp_path):
    landing = fiadmin_landing(
        spark,
        [
            {
                "id": 55,
                "status": 1,
                "treatment_level": "as",
                "literature_type": "S",
                "LILACS_original_id": "55",
                "title": [Row(text="Estudo", _i="pt")],
                "individual_author": [
                    Row(text="Silva, A", _1="USP", _2=None, _3=None, _p="BRASIL",
                        _c=None, _k=None, _w=None, _e=None)
                ],
                "corporate_author": [
                    Row(text="Corp Velho", _1=None, _2=None, _3=None, _p=None,
                        _c=None, _k=None, _w=None, _e=None)
                ],
                "indexed_database": ["LILACS"],
                "publication_country": "Brasil",
                "publication_date_normalized": "20200101",
                "issn": "1111-2222",
            }
        ],
    )
    out = run_pipeline(landing, dims, current_year=2025, checkpoint_dir=str(tmp_path / "ck"))
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["id"] == "lil-55"
    assert r["ai"] == ["Corp Novo"]  # J9 rename applied
    # x01 title-casing on the encoded country field
    assert r["pais_afiliacao"] == ["^iBrazil^eBrasil^pBrasil^fBrésil"]
    # J6 + J8 merges
    assert r["instance"] == ["inst_h", "regional"]
    assert r["dyn"]["collection_lilacs"] == ["LILACS"]
    assert r["dyn"]["collection_hans"] == ["dbh"]
    assert r["dyn"]["tag_d"] == ["v9"]
    # stage parquet materialized
    assert os.path.isdir(str(tmp_path / "ck" / "02_iahx_xml"))

    xml_dir = str(tmp_path / "xml")
    export_xml(out, xml_dir, single_file=True)
    text = "".join(
        open(f).read() for f in sorted(glob.glob(os.path.join(xml_dir, "part-*")))
    )
    assert '<field name="id">lil-55</field>' in text
    assert '<field name="collection_hans">dbh</field>' in text
    assert '<field name="ai">Corp Novo</field>' in text
    assert text.startswith('<?xml version="1.0"')


def test_pipeline_idempotent_rerun(spark, dims, tmp_path):
    landing = fiadmin_landing(
        spark,
        [{"id": 1, "status": 0, "treatment_level": "m", "indexed_database": ["LILACS"]}],
    )
    once = run_pipeline(landing, dims, current_year=2025)
    twice = run_pipeline(landing, dims, current_year=2025)
    assert sorted(map(str, once.collect())) == sorted(map(str, twice.collect()))


def test_pipeline_truncate_stages_matches_checkpoint(spark, dims, tmp_path):
    """r14: the localCheckpoint lineage cut (truncate_stages) must be an
    identity — same rows as the durable parquet checkpoint and as the
    uncut lazy lineage."""
    landing = fiadmin_landing(
        spark,
        [
            {
                "id": 55,
                "status": 1,
                "treatment_level": "as",
                "literature_type": "S",
                "title": [Row(text="Estudo", _i="pt")],
                "indexed_database": ["LILACS"],
                "publication_country": "Brasil",
                "publication_date_normalized": "20200101",
            },
            {"id": 7, "status": 0, "treatment_level": "m",
             "indexed_database": ["LILACS"]},
        ],
    )
    durable = run_pipeline(
        landing, dims, current_year=2025,
        checkpoint_dir=str(tmp_path / "ck"), checkpoint_stages=("02_iahx_xml",),
    )
    truncated = run_pipeline(
        landing, dims, current_year=2025, truncate_stages=("02_iahx_xml",)
    )
    lazy = run_pipeline(landing, dims, current_year=2025)
    d, t, l = (sorted(map(str, df.collect())) for df in (durable, truncated, lazy))
    assert d == t == l

    # r14: the pruned cut (truncate_keep) must be an identity on every
    # column it keeps plus the columns created after the cut — the
    # projection only drops columns nothing downstream reads, so the
    # kept slice of the output matches the uncut chain exactly (this is
    # the q36 gate's mode; its oracle checks the same identity at the
    # driver's SFs).
    keep = (
        "id", "status_fiadmin", "type", "weight", "da", "entry_date",
        "update_date", "ai", "au", "auid", "pais_afiliacao",
        "pais_publicacao", "cp", "db", "database",
    )
    pruned = run_pipeline(
        landing, dims, current_year=2025,
        truncate_stages=("02_iahx_xml",), truncate_keep={"02_iahx_xml": keep},
    )
    post_cut = ("instance", "dyn")  # created by enrich after the cut
    cols = list(keep + post_cut)
    p, lz = (
        sorted(map(str, df.select(*cols).collect())) for df in (pruned, lazy)
    )
    assert p == lz
    assert set(pruned.columns) == set(cols)
