"""End-to-end standardize stage: landing fixture -> wide 02-style
table, with per-field golden asserts (SURVEY §5.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from data_governance_spark.fixtures import fiadmin_landing
from data_governance_spark.standardize.transform import standardize

TABPAIS_SCHEMA = (
    "pt string, en string, es string, fr string, pais_2 string, sinonimo array<string>"
)
TITLE_SCHEMA = (
    "issn string, shortened_title string, title string, medline_shortened_title string,"
    "parallel_titles array<string>, shortened_parallel_titles array<string>,"
    "other_titles array<string>, country array<string>"
)
DECS_SCHEMA = (
    "mfn string, descritor_ingles string, descritor_portugues string,"
    "descritor_espanhol string, descritor_frances string,"
    "descritor_espanhol_espanha string, versao_alternativa_ingles string,"
    "versao_alternativa_espanhol string, versao_alternativa_portugues string,"
    "sinonimos_ingles array<string>, sinonimos_espanhol array<string>,"
    "sinonimos_portugues array<string>, sinonimos_espanha array<string>,"
    "sinonimos_frances array<string>"
)


@pytest.fixture(scope="module")
def dims(spark):
    tabpais = spark.createDataFrame(
        [("Brasil", "Brazil", "Brasil", "Brésil", "BR", ["bra"])], TABPAIS_SCHEMA
    )
    title = spark.createDataFrame(
        [("1111-2222", "Rev A", "Revista A^s", None, None, None, None, ["Brazil"])],
        TITLE_SCHEMA,
    )
    decs = spark.createDataFrame(
        [
            ("000123", "Acupuncture", None, None, None, None, None, None, None,
             None, None, None, None, None),
        ],
        DECS_SCHEMA,
    )
    return tabpais, title, decs


@pytest.fixture(scope="module")
def output(spark, dims):
    rows = [
        {
            "id": 10,
            "status": 1,
            "treatment_level": "as",
            "literature_type": "S",
            "title": [Row(text="Um titulo", _i="pt")],
            "english_translated_title": "A title",
            "abstract": [Row(text="Resumo\r\num", _i="pt")],
            "pages": [Row(_f="1", _l="9", text=None, f=None, _e=None)],
            "electronic_address": [
                Row(_u="http://x.org", _y=None, _z=None, _x=None, _q=None)
            ],
            "individual_author": [
                Row(text="Silva, A", _1="USP", _2=None, _3=None, _p="Brasil",
                    _c=None, _k=None, _w=None, _e=None)
            ],
            "title_serial": "Rev A",
            "volume_serial": "5",
            "issue_number": "2",
            "publication_date": "Jan 2021",
            "publication_date_normalized": "20210301",
            "publication_country": "bra",
            "check_tags": ["Acupuncture"],
            "descriptors_primary": [Row(text="^dAcupuncture")],
            "local_descriptors": "termo um\ntermo dois",
            "issn": "1111-2222",
            "LILACS_original_id": "55",
            "alternate_ids": ["lil-55", "other-1"],
            "created_time": "2024-01-15T10:00:00",
            "updated_time": "2025-02-03T01:02:03",
            "community_collection_path": ["a/Programas/pt/Tema X"],
        },
        {"id": 11, "status": 2, "treatment_level": "as"},  # filtered (status)
        {"id": 12, "status": 0, "treatment_level": None},  # filtered (tl)
        {
            "id": 13,
            "status": 0,
            "treatment_level": "m",
            "literature_type": "M",
            "title_monographic": [Row(text="Livro", _i="pt")],
            "english_title_monographic": "Book",
            "publication_date_normalized": "19990101",
        },
    ]
    tabpais, title, decs = dims
    landing = fiadmin_landing(spark, rows)
    out = standardize(landing, tabpais, title, decs, current_year=2025)
    return {r["id_pk"]: r for r in out.collect()}


def test_stage_filter(output):
    assert set(output) == {10, 13}


def test_full_article_row(output):
    r = output[10]
    assert r["id"] == "lil-55"
    assert r["alternate_id"] == ["other-1"]
    assert r["ti"] == {"pt": ["Um titulo"], "en": ["A title"]}
    assert r["ab"] == {"pt": "Resumo um"}
    assert r["pg"] == ["1-9"]
    assert r["ur"] == ["http://x.org"]
    assert r["fulltext"] == 1
    assert r["au"] == ["Silva, A"]
    assert r["af"] == ["USP"]
    assert r["pais_afiliacao"] == ["^iBrazil^eBrasil^pBrasil^fBrésil"]
    assert r["cp"] == sorted(["Brasil", "Brazil", "Brésil", "BR", "bra"])
    assert r["pais_publicacao"] == "^iBrazil^eBrasil^pBrasil^fBrésil"
    assert r["ct"] == ["^d123"]
    assert r["mj"] == ["^d123"]
    assert r["ta_var"] == ["Revista A", "Rev A"]
    assert r["ta_fascic"] == [
        "Revista A", "Rev A",
        "Revista A; 5 (2), 2021", "Rev A; 5 (2), 2021",
    ]
    assert r["descritores_locais"] == ["termo um", "termo dois"]
    assert r["da"] == "202103"
    assert r["entry_date"] == "20240115"
    assert r["update_date"] == "20250203"
    assert r["type"] == ["article"]
    # weight: s=15, recency 20-(2025-2021)=16, abstract 5, url 5
    assert r["weight"] == 41
    assert r["status_fiadmin"] == "Publicado"
    assert r["tema_susdigital_programas"] == ["Tema X"]
    assert r["no_indexing"] is None


def test_monograph_row(output):
    r = output[13]
    assert r["id"] == "biblio-13"
    assert r["ti"] == {"pt": ["Livro"], "en": ["Book"]}
    assert r["book_title"] == "Livro"
    assert r["type"] == ["monography"]
    # weight: m=5, recency 20-26=-6 -> 5-6=-1 clamps 0? base+recency = -1,
    # no abstract/url -> max(-1,0)=0
    assert r["weight"] == 0
    assert r["status_fiadmin"] == "LILACS-Express"
    assert r["no_indexing"] == 1
