"""F11 (fo) / F12 (lo) builder tests: punctuation-exact goldens derived
by hand-tracing the reference logic (02_create_iahx_xml_collection.py
:273-459, :194-270)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_governance_spark.fixtures import fiadmin_landing
from data_governance_spark.standardize.citation import FO_FIELDS, fo, lo


def _fo_of(spark, row: dict) -> str | None:
    df = fiadmin_landing(spark, [dict(row, id=1, status=1)])
    return df.select(fo({n: F.col(n) for n in FO_FIELDS}).alias("fo")).collect()[0]["fo"]


def test_fo_as_full(spark):
    got = _fo_of(
        spark,
        {
            "treatment_level": "as",
            "title_serial": "Rev. Saude",
            "volume_serial": "12",
            "issue_number": "3",
            "pages": [Row(_f="10", _l="25", text=None, f=None, _e=None)],
            "publication_date": "Jan 2021",
            "descriptive_information": [Row(_b="ilus"), Row(_b="tab")],
        },
    )
    assert got == "Rev. Saude;12(3): 10-25, Jan 2021. ilus, tab"


def test_fo_as_pages_last_wins(spark):
    got = _fo_of(
        spark,
        {
            "treatment_level": "as",
            "title_serial": "J",
            "pages": [
                Row(_f="1", _l="2", text=None, f=None, _e=None),
                Row(_f="7", _l=None, text="xv", f=None, _e=None),
            ],
        },
    )
    assert got == "J: 7-2xv"  # last _f=7, last _l=2 (from first entry), text xv


def test_fo_am_in_authors_and_paren(spark):
    got = _fo_of(
        spark,
        {
            "treatment_level": "am",
            "individual_author_monographic": [
                Row(text="Silva, A", _1=None, _2=None, _3=None, _p=None,
                    _c=None, _k=None, _w=None, _e=None),
                Row(text="Prado, B", _1=None, _2=None, _3=None, _p=None,
                    _c=None, _k=None, _w=None, _e=None),
            ],
            "title_monographic": [Row(text="Tratado", _i=None)],
            "publication_city": "Rio",
            "publisher": "Editora X",
            "publication_date": "2019",
            "pages": [Row(_f="5", _l="9", text=None, f=None, _e=None)],
            "title_serial": "Serie Y",
            "volume_serial": "2",
            "symbol": "WHO/123",
        },
    )
    assert got == (
        "In. Silva, A; Prado, B. Tratado. Rio, Editora X, 2019."
        " p. 5-9(Serie Y, 2). (WHO/123)."
    )


def test_fo_m_imprint_and_pages_p(spark):
    got = _fo_of(
        spark,
        {
            "treatment_level": "m",
            "publication_city": "SP",
            "publisher": "Ed A\nEd B",
            "publication_date": "2020",
            "pages_monographic": "230",
            "title_serial": "Col Z",
        },
    )
    assert got == "SP; Ed A; Ed B; 2020. 230 p. (Col Z)."


def test_fo_m_no_imprint_paren_only(spark):
    got = _fo_of(
        spark,
        {"treatment_level": "mc", "title_serial": "Col", "volume_serial": "4"},
    )
    assert got == "(Col, 4)."


def test_fo_c_requires_city(spark):
    assert _fo_of(spark, {"treatment_level": "c", "publisher": "X"}) is None
    got = _fo_of(
        spark,
        {"treatment_level": "c", "publication_city": "BH", "publisher": "Y",
         "publication_date": "1999"},
    )
    assert got == "BH; Y; 1999."


def test_fo_other_levels_null(spark):
    assert _fo_of(spark, {"treatment_level": "t"}) is None


def _lo_of(spark, entries) -> str | None:
    df = fiadmin_landing(spark, [{"id": 1, "status": 1, "call_number": entries}])
    return df.select(lo(F.col("call_number")).alias("lo")).collect()[0]["lo"]


def _cn(**kw):
    fields = ["text"] + [f"_{c}" for c in "abcdefghijklmnopqrstuvwxyz"] + [
        f"_{d}" for d in "0123456789"
    ]
    return Row(**{f: kw.get(f) for f in fields})


def test_lo_text_abc_and_subfields(spark):
    got = _lo_of(
        spark,
        [_cn(text="BR1.1", _a="Lib A", _b="Sec B", _d="Room 4", _h="Shelf")],
    )
    assert got == "BR1.1; Lib A, Sec B, Room 4. Shelf"


def test_lo_six_without_text(spark):
    got = _lo_of(spark, [_cn(_a="A", _6="S6")])
    assert got == "A. S6"


def test_lo_trailing_semicolon_stripped(spark):
    got = _lo_of(spark, [_cn(text="Only")])
    assert got == "Only"


def test_lo_multi_entries_joined(spark):
    got = _lo_of(spark, [_cn(text="X", _a="A"), _cn(_b="B")])
    assert got == "X; A / B"


def test_lo_randomized_differential(spark):
    """Differential sweep of the lo separator state machine: 400
    randomized entries (deterministic seed) vs a direct Python
    transcription of the reference algorithm
    (04/02_create_iahx_xml_collection.py:194-270). Covers the
    subfield-combination space q35's fixed arithmetic synthesis
    cannot."""
    import random

    from pyspark.sql import types as T

    fields = ["text"] + [f"_{c}" for c in "abcdefghijklmnopqrstuvwxyz0123456789"]
    SUBFIELDS = [
        ("_d", ", "), ("_e", ", "), ("_f", ", "), ("_g", ", "),
        ("_h", ". "), ("_i", ","), ("_j", ". "), ("_k", ". "),
        ("_l", ". "), ("_m", ". "), ("_n", ". "), ("_o", ". "),
        ("_p", ". "), ("_q", ". "), ("_r", ". "), ("_s", ". "),
        ("_t", ". "), ("_u", ". "), ("_v", ". "), ("_w", ". "),
        ("_x", ". "), ("_y", ". "), ("_z", ". "), ("_0", ". "),
        ("_1", ". "), ("_2", ". "), ("_3", ". "), ("_4", ". "),
        ("_5", ". "),
    ]
    LAST = [("_7", ". "), ("_8", ". "), ("_9", ". ")]

    def expected_entry(e: dict) -> str:
        # transcription of the reference's process_entry
        def get(k):
            return (e.get(k) or "").strip()

        result = ""
        text = get("text")
        if text:
            result = text + ";"
        a, b, c = get("_a"), get("_b"), get("_c")
        used_a = used_b = False
        if a:
            result += (" " if text else "") + a
            used_a = True
        if b:
            result += (", " if used_a else "") + b
            used_b = True
        if c:
            result += (", " if used_a or used_b else "") + c
        for key, sep in SUBFIELDS:
            v = get(key)
            if v:
                result += sep + v
        six = get("_6")
        if six:
            result += (" " if text else ". ") + six
        for key, sep in LAST:
            v = get(key)
            if v:
                result += sep + v
        if result.strip().endswith(";"):
            result = result.strip()[:-1].rstrip()
        return result.strip()

    rng = random.Random(20250813)
    cases = []
    for i in range(400):
        entry = {}
        for f in fields:
            r = rng.random()
            if r < 0.55:
                entry[f] = None
            elif r < 0.65:
                entry[f] = rng.choice(["", "  "])  # empty/whitespace
            else:
                entry[f] = rng.choice(["", " "]) + f"v{f}{i}" + rng.choice(["", " "])
        cases.append(entry)

    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField(
                "call_number",
                T.ArrayType(
                    T.StructType(
                        [T.StructField(f, T.StringType()) for f in fields]
                    )
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [(i, [tuple(e[f] for f in fields)]) for i, e in enumerate(cases)], schema
    )
    got = {
        r["i"]: r["lo"]
        for r in df.select("i", lo(F.col("call_number")).alias("lo")).collect()
    }
    for i, e in enumerate(cases):
        want = expected_entry(e) or None  # empty phrase -> no entries -> NULL
        assert got[i] == want, f"case {i}: {e!r}\n got={got[i]!r}\nwant={want!r}"
