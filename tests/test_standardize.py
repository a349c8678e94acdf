"""Unit tests for the standardize stage builders (SURVEY §5.1): each
scalar/standardize function against hand-written expected values lifted
from the reference's logic, including the quirk cases of SURVEY §7.4."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_governance_spark.standardize import fields as X
from data_governance_spark.standardize import joins as J
from data_governance_spark.standardize.udfs import (
    normalize_afiliacao_string,
    normalize_country_name,
    strip_diacritics,
)

PAGES_SCHEMA = "pages array<struct<_f:string,_l:string,text:string,f:string,_e:string>>"


def one(df, col):
    return df.select(col).collect()[0][0]


def test_pages_priority_chain(spark):
    df = spark.createDataFrame(
        [
            (
                [
                    Row(_f="10", _l="20", text=None, f=None, _e=None),
                    Row(_f="10", _l=None, text="t5", f=None, _e=None),
                    Row(_f=None, _l=None, text=None, f="7", _e=None),
                    Row(_f=None, _l=None, text=None, f=None, _e="e9"),
                    Row(_f="", _l="", text="", f="", _e=""),
                ],
            )
        ],
        PAGES_SCHEMA,
    )
    assert one(df, X.pages(F.col("pages"))) == ["10-20", "t5", "7", "e9"]


def test_pg_monographic_fallback(spark):
    df = spark.createDataFrame([(None, "230 p.")], f"{PAGES_SCHEMA}, pm string")
    assert one(df, X.pg(F.col("pages"), F.col("pm"))) == ["230 p."]


TITLES = "t array<struct<text:string,_i:string>>"


def test_title_lang_map_bare_and_keyed(spark):
    df = spark.createDataFrame(
        [([Row(text="Hello", _i="EN"), Row(text="Oi", _i=None), Row(text="Hi2", _i="en")],)],
        TITLES,
    )
    m = one(df, X.title_lang_map(F.col("t")))
    assert m == {"en": ["Hello", "Hi2"], "": ["Oi"]}


def test_abstract_concat_and_scrub(spark):
    df = spark.createDataFrame(
        [([Row(text="A\r\nB", _i="en"), Row(text="C\x01D", _i="en"), Row(text="X", _i="")],)],
        TITLES,
    )
    m = one(df, X.abstract_lang_map(F.col("t")))
    assert m == {"en": "A B C D", "": "X"}


MLT_SCHEMA = (
    "treatment_level string, literature_type string, "
    "title array<struct<text:string,_i:string>>, "
    "title_monographic array<struct<text:string,_i:string>>, "
    "title_collection array<struct<text:string,_i:string>>, "
    "ett string, etm string, etc string"
)


def _mlt(df):
    return X.multilingual_title(
        F.col("treatment_level"), F.col("literature_type"), F.col("title"),
        F.col("title_monographic"), F.col("title_collection"),
        F.col("ett"), F.col("etm"), F.col("etc"),
    )


def test_multilingual_title_analytic_with_fallback(spark):
    df = spark.createDataFrame(
        [("as", "S", [Row(text="Titulo", _i="pt")], None, None, "Eng T", None, None)],
        MLT_SCHEMA,
    )
    assert _mlt(df) is not None
    m = one(df, _mlt(df))
    assert m == {"pt": ["Titulo"], "en": ["Eng T"]}


def test_multilingual_title_en_present_no_fallback(spark):
    df = spark.createDataFrame(
        [("as", "S", [Row(text="T", _i="en")], None, None, "Eng T", None, None)],
        MLT_SCHEMA,
    )
    assert one(df, _mlt(df)) == {"en": ["T"]}


def test_multilingual_title_mc_concat(spark):
    df = spark.createDataFrame(
        [
            (
                "mc", "m",
                None,
                [Row(text="Mono", _i="pt")],
                [Row(text="Coll", _i="es")],
                None, "EngM", None,
            )
        ],
        MLT_SCHEMA,
    )
    assert one(df, _mlt(df)) == {"pt": ["Mono"], "es": ["Coll"], "en": ["EngM"]}


EA_SCHEMA = "ea array<struct<_u:string,_y:string,_z:string,_x:string,_q:string>>"


def test_electronic_address_classification(spark):
    df = spark.createDataFrame(
        [
            (
                [
                    Row(_u="http://x.org/v", _y="MULTIMEDIA", _z=None, _x=None, _q=None),
                    Row(_u="ftp://y", _y="AUDIO", _z=None, _x="meta", _q=None),
                    Row(_u=None, _y="MULTIMEDIA", _z=None, _x=None, _q=None),
                ],
            )
        ],
        EA_SCHEMA,
    )
    assert one(df, X.ur(F.col("ea"))) == ["http://x.org/v", "ftp://y"]
    assert one(df, X.ur_multimedia(F.col("ea"))) == ["http://x.org/v"]
    # 'UDIO' matches raw 'AUDIO' (:185-186)
    assert one(df, X.ur_audio(F.col("ea"))) == ["ftp://y"]
    assert one(df, X.ur_meta(F.col("ea"))) == ["ftp://y"]
    assert one(df, X.fulltext_flag(F.col("ea"))) == 1


def test_fulltext_requires_url_marker(spark):
    df = spark.createDataFrame(
        [([Row(_u="ftp://no-web", _y=None, _z=None, _x=None, _q=None)],)], EA_SCHEMA
    )
    assert one(df, X.fulltext_flag(F.col("ea"))) is None


def test_doc_id_and_alternates(spark):
    df = spark.createDataFrame(
        [(77, "123", ["lil-123", "x", "", None]), (88, None, None)],
        "id_pk long, lil string, alt array<string>",
    )
    rows = df.select(
        X.doc_id(F.col("id_pk"), F.col("lil")).alias("id"),
        X.alternate_id(F.col("alt"), X.doc_id(F.col("id_pk"), F.col("lil"))).alias("a"),
    ).collect()
    assert rows[0]["id"] == "lil-123" and rows[0]["a"] == ["x"]
    assert rows[1]["id"] == "biblio-88" and rows[1]["a"] is None


def test_ta_fascic_degenerate_suffix(spark):
    """SURVEY §7.4.3: no volume & no issue -> '; , year' suffix."""
    df = spark.createDataFrame(
        [(["J1", "J2"], None, None, "2021")],
        "ta_var array<string>, vol string, iss string, yr string",
    )
    out = one(df, X.ta_fascic(F.col("ta_var"), F.col("vol"), F.col("iss"), F.col("yr")))
    assert out == ["J1", "J2", "J1; , 2021", "J2; , 2021"]


def test_ta_fascic_full_suffix(spark):
    df = spark.createDataFrame(
        [(["J"], "12", "3", "2020")],
        "ta_var array<string>, vol string, iss string, yr string",
    )
    assert one(
        df, X.ta_fascic(F.col("ta_var"), F.col("vol"), F.col("iss"), F.col("yr"))
    ) == ["J", "J; 12 (3), 2020"]


def test_document_type_char_containment_and_media(spark):
    df = spark.createDataFrame(
        [
            ("Msc", [Row(_u="a.mp4", _y=None, _z=None, _x=None, _q=None)]),
            ("S", [Row(_u=None, _y="AUDIO", _z=None, _x=None, _q=None)]),
            ("T", None),
        ],
        f"lt string, {EA_SCHEMA}",
    )
    out = [r[0] for r in df.select(X.document_type(F.col("lt"), F.col("ea"))).collect()]
    # 'msc': chars m,s -> monography+article; code in congress set;
    # .mp4 is both a video and an audio extension -> video + podcast
    assert out[0] == sorted(
        ["article", "monography", "congress and conference", "video", "podcast"]
    )
    # lowered _y 'audio' never matches 'UDIO' (dead branch :671) -> no podcast
    assert out[1] == ["article"]
    assert out[2] == ["thesis"]


def test_weight_components_and_clamp(spark):
    df = spark.createDataFrame(
        [
            ("S", "20240101", [Row(text="a", _i="en")], [Row(_u="u", _y=None, _z=None, _x=None, _q=None)]),
            ("N", "19000101", None, None),
            (None, None, None, None),
        ],
        f"lt string, pdn string, ab array<struct<text:string,_i:string>>, {EA_SCHEMA}",
    )
    out = [
        r[0]
        for r in df.select(
            X.weight(F.col("lt"), F.col("pdn"), F.col("ab"), F.col("ea"), 2025)
        ).collect()
    ]
    assert out[0] == 15 + (20 - 1) + 5 + 5
    assert out[1] == 0  # 2 + (20-125) clamps at 0
    assert out[2] == 0


def test_status_labels(spark):
    df = spark.createDataFrame([(-3,), (1,), (99,)], "s int")
    out = [r[0] for r in df.select(X.status_label(F.col("s"))).collect()]
    assert out == ["Migrado", "Publicado", None]


def test_date_slicing(spark):
    df = spark.createDataFrame(
        [("20240115", "2024-01-15T10:00:00", None, "2025-02-03T01:02:03")],
        "pdn string, created string, transfer string, updated string",
    )
    r = df.select(
        X.da(F.col("pdn")).alias("da"),
        X.entry_date(F.col("created"), F.col("transfer")).alias("ed"),
        X.update_date(F.col("updated")).alias("ud"),
    ).collect()[0]
    assert r["da"] == "202401"
    assert r["ed"] == "20240115"
    assert r["ud"] == "20250203"


def test_susdigital_theme_extraction(spark):
    df = spark.createDataFrame(
        [
            (
                [
                    "root/Programas/pt-br/Tema X|root/Programas/en/Theme X",
                    "root/Alvo/pt/Grupo Y",
                    "root/Outros/pt/Ignorado",
                ],
            )
        ],
        "paths array<string>",
    )
    r = df.select(
        X.susdigital_themes(F.col("paths"), "Programas").alias("prog"),
        X.susdigital_themes(F.col("paths"), "Alvo").alias("alvo"),
    ).collect()[0]
    assert r["prog"] == ["Tema X"]
    assert r["alvo"] == ["Grupo Y"]


def test_misc_flags(spark):
    df = spark.createDataFrame(
        [("reg1", None, None, "v1", "v2")],
        "ctr string, dp array<struct<text:string>>, ds array<struct<text:string>>, vm string, vs string",
    )
    r = df.select(
        X.ec_flag(F.col("ctr")).alias("ec"),
        X.no_indexing(F.col("dp"), F.col("ds")).alias("ni"),
        X.vi(F.col("vm"), F.col("vs")).alias("vi"),
    ).collect()[0]
    assert r["ec"] == 1 and r["ni"] == 1 and r["vi"] == ["v1", "v2"]


# ---------------------------------------------------------------- UDFs
def test_strip_diacritics():
    assert strip_diacritics("Saúde Pública") == "Saude Publica"
    assert strip_diacritics(None) is None


def test_normalize_country_name_prepositions():
    assert normalize_country_name("republica DE corea") == "Republica de Corea"
    assert normalize_country_name("GUINEA-BISSAU") == "Guinea-Bissau"
    assert normalize_country_name("iran (islamic republic OF)") == "Iran (Islamic Republic Of)"


def test_normalize_afiliacao_string_subfields():
    assert (
        normalize_afiliacao_string("^iBRAZIL^pBRASIL")
        == "^iBrazil^pBrasil"
    )


# ---------------------------------------------------------------- joins
TABPAIS = [
    ("Brasil", "Brazil", "Brasil", "Brésil", "BR", ["Brasile", "bra"]),
    ("França", "France", "Francia", "France", "FR", []),
]
TABPAIS_SCHEMA = (
    "pt string, en string, es string, fr string, pais_2 string, sinonimo array<string>"
)


def test_country_fields_via_synonym(spark):
    tab = spark.createDataFrame(TABPAIS, TABPAIS_SCHEMA)
    df = spark.createDataFrame(
        [("bRA ", "X"), ("nowhere", "Y"), (None, "Z")],
        "publication_country string, id string",
    )
    out = {
        r["id"]: (r["cp"], r["pais_publicacao"])
        for r in J.add_country_fields(df, tab).collect()
    }
    assert out["X"][0] == sorted({"Brasil", "Brazil", "Brésil", "BR", "Brasile", "bra"})
    assert out["X"][1] == "^iBrazil^eBrasil^pBrasil^fBrésil"
    assert out["Y"] == (None, None)
    assert out["Z"] == (None, None)


def test_country_fallback_from_title_serial(spark):
    tab = spark.createDataFrame(TABPAIS, TABPAIS_SCHEMA)
    title = spark.createDataFrame(
        [("0001-1111", "Rev X", None, None, None, None, ["France"])],
        "issn string, shortened_title string, title string, medline_shortened_title string,"
        "parallel_titles array<string>, shortened_parallel_titles array<string>, country array<string>",
    )
    df = spark.createDataFrame(
        [(None, "rev x", "A"), (None, "unknown", "B")],
        "publication_country string, title_serial string, id string",
    )
    out = {
        r["id"]: r["pais_publicacao"]
        for r in J.add_country_fields(df, tab, title_current=title).collect()
    }
    assert out["A"] == "^iFrance^eFrancia^pFrança^fFrance"
    assert out["B"] is None  # no stale carry-over (SURVEY §7.4.1, fixed)


AUTHORS_SCHEMA = (
    "id_pk long, individual_author array<struct<text:string,_1:string,_2:string,"
    "_3:string,_p:string,_c:string,_k:string,_w:string,_e:string>>"
)


def test_author_fields_full(spark):
    tab = spark.createDataFrame(TABPAIS, TABPAIS_SCHEMA)
    authors = [
        Row(text="Silva, A", _1="USP", _2="Dept", _3=None, _p="Brasil",
            _c="SP", _k="0000-1", _w=None, _e="a@x.org"),
        Row(text="Doe, J", _1=None, _2=None, _3=None, _p=None,
            _c=None, _k=None, _w="W2", _e=None),
        Row(text="Lee, K", _1="USP", _2=None, _3=None, _p="Brasil",
            _c=None, _k=None, _w=None, _e=None),
    ]
    df = spark.createDataFrame([(1, authors)], AUTHORS_SCHEMA)
    r = J.add_author_fields(df, tab).collect()[0]
    assert r["au"] == ["Silva, A", "Doe, J", "Lee, K"]
    assert r["afiliacao_autor"] == [
        "Silva, A; USP. Dept. SP. Brasil",
        "s.af",
        "Lee, K; USP. Brasil",
    ]
    # af: USP (dedup), Dept, SP from author1; unconditional s.af from author2;
    # USP deduped away for author3
    assert r["af"] == ["USP", "Dept", "SP", "s.af"]
    assert r["instituicao_pais_afiliacao"] == ["USP+Brasil"]
    assert r["pais_afiliacao"] == ["^iBrazil^eBrasil^pBrasil^fBrésil"]
    assert r["auid"] == ["0000-1", "W2"]
    assert r["email"] == ["a@x.org"]


def test_author_fields_empty_and_null_lists(spark):
    """Docs with no authors must get af=[] (not ['s.af']): the reference
    iterates the author list, so empty/null contributes nothing
    (02_create_iahx_xml_collection.py:517-531)."""
    tab = spark.createDataFrame(TABPAIS, TABPAIS_SCHEMA)
    df = spark.createDataFrame([(1, []), (2, None)], AUTHORS_SCHEMA)
    out = {r["id_pk"]: r for r in J.add_author_fields(df, tab).collect()}
    for k in (1, 2):
        assert out[k]["au"] == []
        assert out[k]["af"] == []
        assert out[k]["afiliacao_autor"] == []
        assert out[k]["auid"] == []


DECS_SCHEMA = (
    "mfn string, descritor_ingles string, descritor_portugues string,"
    "descritor_espanhol string, descritor_frances string,"
    "descritor_espanhol_espanha string, versao_alternativa_ingles string,"
    "versao_alternativa_espanhol string, versao_alternativa_portugues string,"
    "sinonimos_ingles array<string>, sinonimos_espanhol array<string>,"
    "sinonimos_portugues array<string>, sinonimos_espanha array<string>,"
    "sinonimos_frances array<string>"
)


def _decs(spark):
    rows = [
        ("000123", "Acupuncture", "Acupuntura", None, None, None, None, None, None,
         ["Needling"], None, None, None, None),
        ("000456", "/therapy", None, None, None, None, None, None, None,
         None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, DECS_SCHEMA)


def test_decs_code_array_semantics(spark):
    decs_lk = J.decs_lookup(_decs(spark))
    df = spark.createDataFrame(
        [(1, ["Acupunturá", "acupuncture/therapy", "42 foo", "unknown", "acupuncture/missing"])],
        "id_pk long, check_tags array<string>",
    )
    out = J.decs_code_array(df, decs_lk, F.col("check_tags"), "ct").collect()[0]["ct"]
    # diacritics-stripped match; qualifier join; digit-lead passthrough;
    # miss dropped; qualifier-miss nulls the entry
    assert out == ["^d123", "^d123^s456", "^d42 foo"]


def test_ta_var_issn_then_title_fallback(spark):
    title = spark.createDataFrame(
        [
            ("1111-2222", "Rev A", "Revista A^sub", None, ["Par^x"], None),
            (None, "Rev B", "Revista B", None, None, None),
        ],
        "issn string, shortened_title string, title string,"
        "medline_shortened_title string, parallel_titles array<string>,"
        "shortened_parallel_titles array<string>",
    ).withColumn("other_titles", F.lit(None).cast("array<string>"))
    df = spark.createDataFrame(
        [("1111-2222", None, 1), (None, "rev b", 2), (None, "zzz", 3)],
        "issn string, shortened_title string, id_pk long",
    )
    out = {r["id_pk"]: r["ta_var"] for r in J.add_ta_var(df, title).collect()}
    assert out[1] == ["Revista A", "Rev A", "Par"]
    assert out[2] == ["Revista B", "Rev B"]
    assert out[3] is None


def test_author_fields_randomized_differential(spark):
    """Differential sweep of add_author_fields (J2): 250 randomized
    author lists vs a direct Python transcription of the reference
    (02_create_iahx_xml_collection.py:469-553) over a synthesized
    country map. Exercises: the name-gated afiliacao with its
    lstrip('; ') quirk, the unconditional repeatable 's.af' in af,
    _k-''-means-no-fallback auid semantics, ordered dedup of the
    pais/instituicao pairs, and None/''/value noise in every subfield.
    (Countries are synthesized without outer whitespace: the reference
    probes country.lower() untrimmed while the engine trims — a
    documented more-forgiving divergence.)"""
    import random

    from pyspark.sql import types as T

    from data_governance_spark.standardize.joins import add_author_fields

    langs = ["en", "es", "pt", "fr"]
    dim_rows = []
    for n in range(8):
        dim_rows.append(
            {
                "pt": f"pt c{n}",
                "en": f"c{n}",
                "es": f"es c{n}",
                "fr": f"fr c{n}" if n % 3 else None,
                "pais_2": f"Z{n}",
                "sinonimo": [f"sy{n}"] if n % 2 else [],
            }
        )
    country_map = {}
    for row in dim_rows:
        for key in [row["pt"], row["en"], row["es"], row["fr"], row["pais_2"]] + row[
            "sinonimo"
        ]:
            if key:
                country_map[key.lower()] = row

    def expected(authors):
        # transcription of standardize_individual_authors
        res = {k: [] for k in (
            "au", "afiliacao_autor", "af", "instituicao_pais_afiliacao",
            "pais_afiliacao", "auid", "email",
        )}
        if not isinstance(authors, list):
            return res
        for a in authors:
            def g(k):
                return a.get(k) or ""

            name, inst, i2, i3 = g("text"), g("_1"), g("_2"), g("_3")
            country, city, email = g("_p"), g("_c"), g("_e")
            auid = a.get("_k") if a.get("_k") is not None else a.get("_w", "")
            auid = auid or ""
            if name:
                res["au"].append(name)
                parts = [name]
                if inst:
                    parts.append(f"; {inst}")
                if i2:
                    parts.append(f". {i2}")
                if i3:
                    parts.append(f". {i3}")
                if city:
                    parts.append(f". {city}")
                if country:
                    parts.append(f". {country}")
                if inst and parts:
                    res["afiliacao_autor"].append("".join(parts).lstrip("; "))
                else:
                    res["afiliacao_autor"].append("s.af")
            if inst:
                if inst not in res["af"]:
                    res["af"].append(inst)
            else:
                res["af"].append("s.af")
            for extra in (i2, i3, city):
                if extra and extra not in res["af"]:
                    res["af"].append(extra)
            if auid:
                res["auid"].append(auid)
            if email:
                res["email"].append(email)
            if country:
                m = country_map.get(country.lower())
                if m:
                    pa = f'^i{m.get("en")}^e{m.get("es")}^p{m.get("pt")}^f{m.get("fr")}'
                    if pa not in res["pais_afiliacao"]:
                        res["pais_afiliacao"].append(pa)
            if inst and country:
                ip = f"{inst}+{country}"
                if ip not in res["instituicao_pais_afiliacao"]:
                    res["instituicao_pais_afiliacao"].append(ip)
        return res

    rng = random.Random(20250815)

    def subfield(vals, p_none=0.4, p_empty=0.15):
        r = rng.random()
        if r < p_none:
            return None
        if r < p_none + p_empty:
            return ""
        return rng.choice(vals)

    cases = []
    for i in range(250):
        n_auth = rng.randint(0, 3)
        authors = None if rng.random() < 0.1 else [
            {
                "text": subfield([f"Au{i}-{j}", f" ;Au{i}-{j}", f"  Au{i}-{j}"]),
                "_1": subfield([f"In{j}", f"In{j % 2}"]),
                "_2": subfield([f"I2{j}", f"In{j % 2}"]),  # af-dedup collisions
                "_3": subfield([f"I3{j}"]),
                "_p": subfield(
                    [f"C{rng.randrange(8)}", f"pt c{rng.randrange(8)}",
                     f"sy{rng.randrange(8)}", "nomatch"]
                ),
                "_c": subfield([f"Cy{j}"]),
                "_k": subfield([f"K{j}"]),
                "_w": subfield([f"W{j}"]),
                "_e": subfield([f"e{j}@x"]),
            }
            for j in range(n_auth)
        ]
        cases.append(authors)

    fields = ("text", "_1", "_2", "_3", "_p", "_c", "_k", "_w", "_e")
    schema = T.StructType(
        [
            T.StructField("id_pk", T.LongType()),
            T.StructField(
                "individual_author",
                T.ArrayType(
                    T.StructType([T.StructField(f, T.StringType()) for f in fields])
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [
            (i, None if a is None else [tuple(e[f] for f in fields) for e in a])
            for i, a in enumerate(cases)
        ],
        schema,
    )
    tabpais = spark.createDataFrame(
        [
            (r["pt"], r["en"], r["es"], r["fr"], r["pais_2"], r["sinonimo"])
            for r in dim_rows
        ],
        "pt string, en string, es string, fr string, pais_2 string,"
        " sinonimo array<string>",
    )
    out = {r["id_pk"]: r for r in add_author_fields(df, tabpais).collect()}
    for i, authors in enumerate(cases):
        want = expected(authors)
        for field in want:
            got = out[i][field] or []
            assert list(got) == want[field], (
                f"case {i} field {field}:\n authors={authors!r}\n"
                f" got={list(got)!r}\nwant={want[field]!r}"
            )


def test_decs_code_randomized_differential(spark):
    """Differential sweep of the J3 DECS thesaurus join: 300 randomized
    keyword arrays vs a direct Python transcription of the reference
    (misc.py:87-158). Exercises: raw-first-char digit passthrough
    (' 12x' is NOT a passthrough), diacritics-stripped lowered terms,
    synonym keys, qualifier hit/miss (a qualifier miss nulls the WHOLE
    entry), all-zero MFNs mapping to None (term hit, code miss),
    multi-slash keywords using only the second segment, and dropped
    NULL entries with preserved order."""
    import random
    import unicodedata

    from pyspark.sql import types as T

    from data_governance_spark.standardize.joins import decs_code_array, decs_lookup

    def rmdia(s):
        nfkd = unicodedata.normalize("NFKD", s)
        return "".join(c for c in nfkd if not unicodedata.combining(c))

    decs_rows = [
        # (mfn, descritor_ingles, descritor_portugues, sinonimos_ingles)
        ("000123", "Acupunctúre", "Acupuntura", ["needle therapy"]),
        ("0442", "Phytotherapy", None, []),
        ("007", "/therapy", None, []),  # qualifier term (stored WITH '/')
        ("000", "Zeroed Term", None, ["zt"]),  # all-zero MFN -> None code
        ("21", "Água", None, ["H2O", "/agua-q"]),
    ]
    decs_map = {}
    for mfn, en, pt, syn in decs_rows:
        code = mfn.lstrip("0") or None
        for term in [en, pt] + syn:
            if term:
                decs_map[rmdia(term.strip().lower())] = code

    def expected_one(kw):
        # transcription of get_decs_mfn
        if not kw:
            return None
        if kw and kw[0].isdigit():
            return f"^d{kw}"
        clean = rmdia(kw.strip().lower())
        parts = clean.split("/")
        main = parts[0]
        qual = "/" + parts[1] if len(parts) > 1 else None
        main_mfn = decs_map.get(main)
        if not main_mfn:
            return None
        if qual:
            qual_mfn = decs_map.get(qual)
            return f"^d{main_mfn}^s{qual_mfn}" if qual_mfn else None
        return f"^d{main_mfn}"

    pool = [
        "Acupuncture", "ACUPUNCTURE", "acupunctúre", "Acupuntura",
        "needle therapy", "Phytotherapy", "phytotherapy/therapy",
        "Acupuncture/therapy", "Acupuncture/missing", "agua", "Água/agua-q",
        "agua/agua-q/extra", "Zeroed Term", "zt", "zt/therapy", "nomatch",
        "12345", "9 lives", " 12x", "1/2", "", "x/", "/therapy",
    ]
    rng = random.Random(20250816)
    cases = []
    for i in range(300):
        n = rng.randint(0, 4)
        arr = None if rng.random() < 0.1 else [
            rng.choice(pool + [None]) for _ in range(n)
        ]
        cases.append(arr)

    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(cases)],
        T.StructType(
            [
                T.StructField("id_pk", T.LongType()),
                T.StructField("kws", T.ArrayType(T.StringType())),
            ]
        ),
    )
    decs = spark.createDataFrame(
        [
            (mfn, en, pt, None, None, None, None, None, None, syn, None, None, None, None)
            for mfn, en, pt, syn in decs_rows
        ],
        "mfn string, descritor_ingles string, descritor_portugues string,"
        "descritor_espanhol string, descritor_frances string,"
        "descritor_espanhol_espanha string, versao_alternativa_ingles string,"
        "versao_alternativa_espanhol string, versao_alternativa_portugues string,"
        "sinonimos_ingles array<string>, sinonimos_espanhol array<string>,"
        "sinonimos_portugues array<string>, sinonimos_espanha array<string>,"
        "sinonimos_frances array<string>",
    )
    out = decs_code_array(df, decs_lookup(decs), F.col("kws"), "codes")
    got = {r["id_pk"]: r["codes"] for r in out.collect()}
    for i, arr in enumerate(cases):
        if arr is None:
            want = None
        else:
            want = [c for c in (expected_one(k) for k in arr) if c is not None]
        got_i = got[i]
        assert (got_i if got_i is None else list(got_i)) == want or (
            arr is None and not got_i
        ), f"case {i}: kws={arr!r}\n got={got_i!r}\nwant={want!r}"


def test_doctype_ur_randomized_differential(spark):
    """Differential sweep of F15 (document_type) + F10 (ur family +
    fulltext): 300 randomized (literature_type, electronic_address)
    pairs vs a transcription of the reference (:630-678 and :167-191).
    Exercises: char-containment base types, exact congress/project
    codes, substring (not suffix) media extensions with .mp4 in BOTH
    sets, the dead lowered-'UDIO' podcast branch, RAW-case 'MULTIM'/
    'UDIO' matching in ur_*, the www/internet/http fulltext flag, and
    invalid (_u-less) entries skipped everywhere."""
    import random

    from pyspark.sql import types as T

    from data_governance_spark.standardize.fields import (
        document_type,
        fulltext_flag,
        ur,
        ur_audio,
        ur_meta,
        ur_multimedia,
    )

    VEX = {".mp4", ".avi", ".wmv", ".mpeg", ".mpe", ".mpg"}
    AEX = {".wma", ".mp3", ".mp4", ".wav"}

    def expected(lt, ea):
        lt_l = (lt or "").lower()
        types = set()
        for b, t in {
            "s": "article", "m": "monography",
            "n": "non-conventional", "t": "thesis",
        }.items():
            if b in lt_l:
                types.add(t)
        if lt_l in {"mc", "mcp", "msc", "nc", "sc", "scp"}:
            types.add("congress and conference")
        if lt_l in {"mcp", "mp", "msp", "np", "scp", "sp"}:
            types.add("project document")
        for e in ea or []:
            y = (e.get("_y") or "").lower()
            z = (e.get("_z") or "").lower()
            u = (e.get("_u") or "").lower()
            q = (e.get("_q") or "").lower()
            if "multim" in y or "deo" in z or any(x in u for x in VEX):
                types.add("video")
            # 'UDIO' in lowered y is the reference's dead branch
            if any(x in q for x in AEX) or any(x in u for x in AEX):
                types.add("podcast")
        urs, urm, ura, urx, ft = [], [], [], [], None
        for e in ea or []:
            u = e.get("_u")
            if u:
                if any(p in u.lower() for p in ("www", "internet", "http")):
                    ft = 1
                urs.append(u)
                if e.get("_y") and "MULTIM" in e["_y"]:
                    urm.append(u)
                if e.get("_y") and "UDIO" in e["_y"]:
                    ura.append(u)
                if e.get("_x"):
                    urx.append(u)
        return sorted(types), urs, urm, ura, urx, ft

    u_pool = [None, "", "http://x.mp4", "WWW.site", "ftp://a.wav", "plain",
              "x.mpg", "INTERNETz", "a.mp3.txt", "doc.pdf"]
    y_pool = [None, "", "MULTIMEDIA", "multimedia", "AUDIO", "audio", "xUDIOx", "ÁUDIO"]
    z_pool = [None, "", "video", "VIDEO", "x deo y", "zz"]
    x_pool = [None, "", "1", "meta"]
    q_pool = [None, "", "a.wav", "A.WAV", "s.mp3", "none"]
    lt_pool = [None, "", "s", "S", "m", "t", "n", "mc", "mcp", "msc", "nc",
               "sc", "scp", "mp", "msp", "np", "sp", "ms", "xyz", "as"]

    rng = random.Random(20250817)
    cases = []
    for i in range(300):
        ea = None if rng.random() < 0.1 else [
            {
                "_u": rng.choice(u_pool), "_y": rng.choice(y_pool),
                "_z": rng.choice(z_pool), "_x": rng.choice(x_pool),
                "_q": rng.choice(q_pool),
            }
            for _ in range(rng.randint(0, 3))
        ]
        cases.append((rng.choice(lt_pool), ea))

    ea_t = T.ArrayType(
        T.StructType(
            [T.StructField(f, T.StringType()) for f in ("_u", "_y", "_z", "_x", "_q")]
        )
    )
    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("lt", T.StringType()),
            T.StructField("ea", ea_t),
        ]
    )
    df = spark.createDataFrame(
        [
            (
                i, lt,
                None if ea is None else [
                    tuple(e[f] for f in ("_u", "_y", "_z", "_x", "_q")) for e in ea
                ],
            )
            for i, (lt, ea) in enumerate(cases)
        ],
        schema,
    )
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            document_type(F.col("lt"), F.col("ea")).alias("types"),
            ur(F.col("ea")).alias("ur"),
            ur_multimedia(F.col("ea")).alias("urm"),
            ur_audio(F.col("ea")).alias("ura"),
            ur_meta(F.col("ea")).alias("urx"),
            fulltext_flag(F.col("ea")).alias("ft"),
        ).collect()
    }
    for i, (lt, ea) in enumerate(cases):
        types, urs, urm, ura, urx, ft = expected(lt, ea)
        r = out[i]
        assert list(r["types"]) == types, f"case {i} types: {lt!r} {ea!r}: {r['types']} != {types}"
        for field, want in (("ur", urs), ("urm", urm), ("ura", ura), ("urx", urx)):
            got = r[field]
            got = [] if got is None else list(got)
            if ea is None:
                assert got == []
            else:
                assert got == want, f"case {i} {field}: {ea!r}\n got={got}\nwant={want}"
        assert r["ft"] == ft, f"case {i} ft: {ea!r}: {r['ft']} != {ft}"


def test_title_abstract_pivots_randomized_differential(spark):
    """Differential sweep of F7/F8: 300 randomized docs vs a
    transcription of the reference (:84-164): lang-keyed title pivot
    (bare key for missing _i), multilingual dispatch across a*/m*/c
    with the mc+literature_type collection concat and the
    en-fallback-only-when-no-en rule, and the abstract pivot's F6
    scrub + same-key ' '-concat. Struct mapping: text=None entries are
    skipped (the reference's dict rows would carry literal Nones)."""
    import random
    import re as _re

    from pyspark.sql import types as T

    from data_governance_spark.standardize.fields import (
        abstract_lang_map,
        multilingual_title,
        title_lang_map,
    )

    def ref_title_map(entries):
        fields = {}
        for e in entries or []:
            if e.get("text") is None:
                continue
            lang = (e.get("_i") or "").lower()
            fields.setdefault(lang, []).append(e["text"])
        return fields

    def ref_has_en(entries):
        return any(
            (e.get("_i") or "").lower() == "en" for e in (entries or [])
        )

    def ref_multilingual(doc):
        tl = (doc.get("tl") or "").lower()
        lit = (doc.get("lit") or "").lower()
        if tl.startswith("a"):
            lst, fb = doc.get("title"), doc.get("ett")
        elif tl.startswith("m"):
            lst = list(doc.get("mono") or [])
            if tl == "mc" and lit in ("mc", "m"):
                lst = lst + list(doc.get("coll") or [])
            fb = doc.get("etm")
        elif tl == "c":
            lst, fb = doc.get("coll"), doc.get("etc")
        else:
            return {}
        fields = ref_title_map(lst)
        if not ref_has_en(lst) and fb:
            fields.setdefault("en", []).append(fb)
        return fields

    def ref_abstract_map(entries):
        fields = {}
        for e in entries or []:
            if e.get("text") is None:
                continue
            lang = (e.get("_i") or "").lower()
            text = e["text"].replace("\r\n", " ")
            text = _re.sub(r"[\x00-\x08\x0B-\x0C\x0E-\x1F]", " ", text)
            if lang in fields:
                fields[lang] += f" {text}"
            else:
                fields[lang] = text
        return fields

    rng = random.Random(20250818)
    langs = [None, "", "pt", "PT", "en", "EN", "es"]

    def entries(tag, i, with_ctrl=False):
        if rng.random() < 0.2:
            return None
        out = []
        for j in range(rng.randint(0, 3)):
            text = rng.choice(
                [None, f"{tag}{i}-{j}"]
                + ([f"{tag}{i}\r\nx{j}", f"{tag}{i}\x02y{j}"] if with_ctrl else [])
            )
            out.append({"text": text, "_i": rng.choice(langs)})
        return out

    cases = []
    for i in range(300):
        cases.append(
            {
                "tl": rng.choice([None, "", "a", "as", "A", "m", "M", "mc", "MC", "c", "C", "x"]),
                "lit": rng.choice([None, "", "mc", "m", "M", "x"]),
                "title": entries("T", i),
                "mono": entries("M", i),
                "coll": entries("C", i),
                "abstract": entries("A", i, with_ctrl=True),
                "ett": rng.choice([None, "", f"ET{i}"]),
                "etm": rng.choice([None, "", f"EM{i}"]),
                "etc": rng.choice([None, "", f"EC{i}"]),
            }
        )

    ent_t = T.ArrayType(
        T.StructType(
            [T.StructField("text", T.StringType()), T.StructField("_i", T.StringType())]
        )
    )
    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("tl", T.StringType()),
            T.StructField("lit", T.StringType()),
            T.StructField("title", ent_t),
            T.StructField("mono", ent_t),
            T.StructField("coll", ent_t),
            T.StructField("abstract", ent_t),
            T.StructField("ett", T.StringType()),
            T.StructField("etm", T.StringType()),
            T.StructField("etc", T.StringType()),
        ]
    )

    def tup(d, i):
        def st(lst):
            return None if lst is None else [(e["text"], e["_i"]) for e in lst]

        return (
            i, d["tl"], d["lit"], st(d["title"]), st(d["mono"]), st(d["coll"]),
            st(d["abstract"]), d["ett"], d["etm"], d["etc"],
        )

    df = spark.createDataFrame([tup(d, i) for i, d in enumerate(cases)], schema)
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            title_lang_map(F.coalesce(F.col("title"), F.array().cast(ent_t))).alias("ti"),
            multilingual_title(
                F.col("tl"), F.col("lit"), F.col("title"), F.col("mono"),
                F.col("coll"), F.col("ett"), F.col("etm"), F.col("etc"),
            ).alias("mt"),
            abstract_lang_map(
                F.coalesce(F.col("abstract"), F.array().cast(ent_t))
            ).alias("ab"),
        ).collect()
    }
    for i, d in enumerate(cases):
        r = out[i]
        want_ti = ref_title_map(d["title"])
        got_ti = {k: list(v) for k, v in (r["ti"] or {}).items()}
        assert got_ti == want_ti, f"case {i} ti: {d!r}\n got={got_ti}\nwant={want_ti}"
        want_mt = ref_multilingual(d)
        got_mt = {k: list(v) for k, v in (r["mt"] or {}).items()}
        assert got_mt == want_mt, f"case {i} mt: {d!r}\n got={got_mt}\nwant={want_mt}"
        want_ab = ref_abstract_map(d["abstract"])
        got_ab = dict(r["ab"] or {})
        assert got_ab == want_ab, f"case {i} ab: {d!r}\n got={got_ab}\nwant={want_ab}"


def test_pages_tafascic_booktitle_randomized_differential(spark):
    """Differential sweep of F9 (pages/pg), F18 (ta_fascic incl. the
    degenerate '; , year' suffix), and book_title's T/N-blocking rule
    vs transcriptions of the reference (:69-82, :608-620, :925-939).
    Notable quirks pinned: the _f-AND-_l pair beats text/f/_e in the
    elif chain; book_title takes the FIRST monographic entry's text
    even when that text is None."""
    import random

    from pyspark.sql import types as T

    from data_governance_spark.standardize.fields import book_title, pg, ta_fascic

    def ref_pages(value):
        out = []
        for p in value or []:
            if p.get("_f") and p.get("_l"):
                out.append(f"{p['_f']}-{p['_l']}")
            elif p.get("text"):
                out.append(p["text"])
            elif p.get("f"):
                out.append(p["f"])
            elif p.get("_e"):
                out.append(p["_e"])
        return out

    def ref_pg(pages, pm):
        if pages is not None:
            return ref_pages(pages)
        if pm:  # struct-world: '' prunes at the sink either way
            return [pm]
        return None

    def ref_ta_fascic(ta_var, vol, iss, year):
        if not ta_var:
            return []
        parts = []
        if vol:
            parts.append(vol)
        if iss:
            parts.append(f"({iss})")
        suffix = "; " + " ".join(parts) + ", " + year
        return list(ta_var) + [t + suffix for t in ta_var]

    def ref_book_title(tm, lit, tl):
        if tm and not (
            (lit or "").upper() in ["T", "N"]
            and not (tl or "").lower().startswith("a")
        ):
            return tm[0].get("text")
        return None

    rng = random.Random(20250819)
    cases = []
    for i in range(300):
        pages = None if rng.random() < 0.3 else [
            {
                "_f": rng.choice([None, "", f"f{j}"]),
                "_l": rng.choice([None, "", f"l{j}"]),
                "text": rng.choice([None, "", f"t{j}"]),
                "f": rng.choice([None, "", f"F{j}"]),
                "_e": rng.choice([None, "", f"e{j}"]),
            }
            for j in range(rng.randint(0, 3))
        ]
        tm = None if rng.random() < 0.3 else [
            {"text": rng.choice([None, f"TM{i}-{j}"])}
            for j in range(rng.randint(0, 2))
        ]
        cases.append(
            {
                "pages": pages,
                "pm": rng.choice([None, "", f"{i} p."]),
                "ta_var": rng.choice([None, [], [f"TA{i}"], [f"TA{i}", f"TB{i}"]]),
                "vol": rng.choice([None, "", f"V{i}"]),
                "iss": rng.choice([None, "", f"N{i}"]),
                "year": str(1990 + i % 30),
                "tm": tm,
                "lit": rng.choice([None, "", "T", "t", "N", "S", "m"]),
                "tl": rng.choice([None, "", "a", "as", "M", "c"]),
            }
        )

    pages_t = T.ArrayType(
        T.StructType(
            [T.StructField(f, T.StringType()) for f in ("_f", "_l", "text", "f", "_e")]
        )
    )
    tm_t = T.ArrayType(T.StructType([T.StructField("text", T.StringType())]))
    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("pages", pages_t),
            T.StructField("pm", T.StringType()),
            T.StructField("ta_var", T.ArrayType(T.StringType())),
            T.StructField("vol", T.StringType()),
            T.StructField("iss", T.StringType()),
            T.StructField("year", T.StringType()),
            T.StructField("tm", tm_t),
            T.StructField("lit", T.StringType()),
            T.StructField("tl", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [
            (
                i,
                None if c["pages"] is None else [
                    tuple(p[f] for f in ("_f", "_l", "text", "f", "_e"))
                    for p in c["pages"]
                ],
                c["pm"], c["ta_var"], c["vol"], c["iss"], c["year"],
                None if c["tm"] is None else [(e["text"],) for e in c["tm"]],
                c["lit"], c["tl"],
            )
            for i, c in enumerate(cases)
        ],
        schema,
    )
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            pg(F.col("pages"), F.col("pm")).alias("pg"),
            ta_fascic(F.col("ta_var"), F.col("vol"), F.col("iss"), F.col("year")).alias(
                "taf"
            ),
            book_title(F.col("tm"), F.col("lit"), F.col("tl")).alias("bt"),
        ).collect()
    }
    for i, c in enumerate(cases):
        r = out[i]
        want_pg = ref_pg(c["pages"], c["pm"])
        got_pg = r["pg"] if r["pg"] is None else list(r["pg"])
        assert got_pg == want_pg, f"case {i} pg: {c!r}\n got={got_pg}\nwant={want_pg}"
        want_taf = ref_ta_fascic(c["ta_var"], c["vol"], c["iss"], c["year"])
        assert list(r["taf"] or []) == want_taf, (
            f"case {i} taf: {c!r}\n got={r['taf']}\nwant={want_taf}"
        )
        want_bt = ref_book_title(c["tm"], c["lit"], c["tl"])
        assert r["bt"] == want_bt, f"case {i} bt: {c!r}\n got={r['bt']}\nwant={want_bt}"


def test_decs_batched_equals_per_field_calls(spark):
    """The r5 batched decs_code_arrays must be row-for-row identical to
    four independent decs_code_array calls on randomized multi-field
    inputs — including the field-routing axis the single-field
    differential can't see (empty/NULL arrays per field, the same
    keyword appearing in several fields, digit-leads, qualifier
    hits/misses)."""
    import random

    decs_lk = J.decs_lookup(_decs(spark))
    rng = random.Random(1234)
    pool = [
        "Acupuntura", "acupuncture/therapy", "42 foo", "unknown",
        "acupuncture/missing", "ACUPUNCTURE", " 12x", "needling", "",
        None, "7 lead", "Acupunturá",
    ]

    def arr():
        r = rng.random()
        if r < 0.15:
            return None
        if r < 0.3:
            return []
        return [rng.choice(pool) for _ in range(rng.randrange(1, 5))]

    rows = [(i, arr(), arr(), arr(), arr()) for i in range(60)]
    schema = (
        "id_pk long, f1 array<string>, f2 array<string>, "
        "f3 array<string>, f4 array<string>"
    )
    df = spark.createDataFrame(rows, schema)
    batched = J.decs_code_arrays(
        df, decs_lk,
        [(F.col(c), f"o{c}") for c in ("f1", "f2", "f3", "f4")],
    )
    single = df
    for c in ("f1", "f2", "f3", "f4"):
        single = J.decs_code_array(single, decs_lk, F.col(c), f"o{c}")
    got = {r["id_pk"]: r for r in batched.collect()}
    want = {r["id_pk"]: r for r in single.collect()}
    assert got.keys() == want.keys()
    for i in got:
        for c in ("of1", "of2", "of3", "of4"):
            assert list(got[i][c] or []) == list(want[i][c] or []), (i, c)
