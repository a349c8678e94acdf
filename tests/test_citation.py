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


def test_fo_randomized_differential(spark):
    """Differential sweep of the fo citation builder: 400 randomized
    docs (deterministic seed) across all four treatment-level formats
    vs a direct Python transcription of the reference
    (02_create_iahx_xml_collection.py:273-459), with the engine's
    string-normalized inputs (publisher/edition multiline strings)."""
    import random

    from pyspark.sql import types as T

    from data_governance_spark.standardize.citation import fo_from

    def join_texts(lst, sep):
        if not lst:
            return None
        vals = [a["text"] for a in lst if a.get("text") is not None]
        return vals

    def last_pages(pages):
        pf = pl = ptx = None
        for p in pages or []:
            if p.get("_f"):
                pf = p["_f"]
            if p.get("_l"):
                pl = p["_l"]
            if p.get("text"):
                ptx = p["text"]
        return pf, pl, ptx

    def desc_b_of(di):
        return [e["_b"] for e in di or [] if e.get("_b")]

    def lines_join(s):
        return "; ".join(s.splitlines())

    def expected(doc):
        # transcription of the reference's standardize_fo
        tl = (doc.get("treatment_level") or "").lower()
        ts = doc.get("title_serial")
        symbol = doc.get("symbol")

        def fo_as():
            parts = []
            if ts:
                parts.append(ts)
            if doc.get("volume_serial"):
                parts.append(";" + doc["volume_serial"])
            if doc.get("issue_number"):
                parts.append("(" + doc["issue_number"] + ")")
            pf, pl, ptx = last_pages(doc.get("pages"))
            if pf:
                parts.append(": " + pf)
            if pl:
                parts.append("-" + pl)
            if ptx:
                parts.append(ptx)
            if doc.get("publication_date"):
                parts.append(", " + doc["publication_date"] + ".")
            db = desc_b_of(doc.get("descriptive_information"))
            if db:
                parts.append(" " + ", ".join(db))
            return "".join(parts).strip()

        def paren_block():
            parts = []
            if ts:
                parts.append("(" + ts)
            if doc.get("volume_serial"):
                parts.append(", " + doc["volume_serial"])
            if doc.get("issue_number"):
                parts.append(", " + doc["issue_number"])
            if ts:
                parts.append(").")
            if symbol:
                parts.append(" (" + symbol + ").")
            return parts

        def fo_am():
            parts = []
            ind = doc.get("individual_author_monographic")
            corp = doc.get("corporate_author_monographic")
            if ind or corp:
                parts.append("In. ")
                authors = join_texts(ind if ind else corp, "; ")
                if authors:
                    parts.append("; ".join(authors) + ". ")
            titles = join_texts(doc.get("title_monographic"), " / ")
            if titles:
                parts.append(" / ".join(titles) + ".")
            if doc.get("publication_city"):
                parts.append(" " + doc["publication_city"] + ", ")
            if doc.get("publisher"):
                parts.append(lines_join(doc["publisher"]) + ", ")
            if doc.get("edition"):
                parts.append(lines_join(doc["edition"]) + ", ")
            if doc.get("publication_date"):
                parts.append(doc["publication_date"] + ".")
            pf, pl, ptx = last_pages(doc.get("pages"))
            if pf and pl:
                parts.append(f" p. {pf}-{pl}")
            if ptx:
                parts.append(f" p. {ptx}")
            db = desc_b_of(doc.get("descriptive_information"))
            if db:
                parts.append(", " + ", ".join(db) + ". ")
            parts += paren_block()
            return "".join(parts).strip()

        def imprint_parts():
            parts = []
            if doc.get("publication_city"):
                parts.append(doc["publication_city"] + "; ")
            if doc.get("publisher"):
                parts.append(lines_join(doc["publisher"]) + "; ")
            if doc.get("edition"):
                parts.append(lines_join(doc["edition"]) + "; ")
            if doc.get("publication_date"):
                parts.append(doc["publication_date"] + ". ")
            if doc.get("pages_monographic"):
                pm = doc["pages_monographic"]
                parts.append(pm + " " if "p" in pm else pm + " p. ")
            db = desc_b_of(doc.get("descriptive_information"))
            if db:
                parts.append(", ".join(db) + ".")
            return parts

        def fo_m():
            if doc.get("publication_city") or doc.get("edition") or doc.get("publisher"):
                return "".join(imprint_parts() + paren_block()).strip()
            return "".join(paren_block()).strip()

        def fo_c():
            parts = []
            if doc.get("publication_city"):
                parts.append(doc["publication_city"] + "; ")
                if doc.get("publisher"):
                    parts.append(lines_join(doc["publisher"]) + "; ")
                if doc.get("edition"):
                    parts.append(lines_join(doc["edition"]) + "; ")
                if doc.get("publication_date"):
                    parts.append(doc["publication_date"] + ". ")
                if doc.get("pages_monographic"):
                    pm = doc["pages_monographic"]
                    parts.append(pm + " " if "p" in pm else pm + " p. ")
                db = desc_b_of(doc.get("descriptive_information"))
                if db:
                    parts.append(", ".join(db) + ".")
            return "".join(parts).strip()

        if tl == "as":
            out = fo_as()
        elif tl.startswith("am"):
            out = fo_am()
        elif tl.startswith("m"):
            out = fo_m()
        elif tl == "c":
            out = fo_c()
        else:
            return None
        return out or None  # P8: empty results prune to NULL

    rng = random.Random(20250814)

    def maybe(p, fn):
        return fn() if rng.random() < p else None

    def word(tag, i):
        return f"{tag}{i}"

    cases = []
    for i in range(400):
        doc = {
            "treatment_level": rng.choice(
                ["as", "am", "amx", "m", "mc", "c", "zz", "", None]
            ),
            "title_serial": rng.choice([None, "", word("TS", i)]),
            "volume_serial": rng.choice([None, "", word("V", i)]),
            "issue_number": rng.choice([None, "", word("N", i)]),
            "publication_date": rng.choice([None, "", word("DT", i)]),
            "publication_city": rng.choice([None, "", word("CY", i)]),
            "publisher": rng.choice([None, "", word("PB", i), f"PB{i}\nPC{i}"]),
            "edition": rng.choice([None, "", word("ED", i), f"ED{i}\nEE{i}"]),
            "pages_monographic": rng.choice([None, "", f"{i} p", f"{i}"]),
            "symbol": rng.choice([None, "", word("SY", i)]),
            "pages": maybe(
                0.7,
                lambda: [
                    {
                        "_f": rng.choice([None, "", f"f{j}"]),
                        "_l": rng.choice([None, "", f"l{j}"]),
                        "text": rng.choice([None, "", f"t{j}"]),
                        "f": None,
                        "_e": None,
                    }
                    for j in range(rng.randint(0, 3))
                ],
            ),
            "descriptive_information": maybe(
                0.6,
                lambda: [
                    {"_b": rng.choice([None, "", f"b{j}"])}
                    for j in range(rng.randint(0, 3))
                ],
            ),
            "individual_author_monographic": maybe(
                0.5,
                lambda: [
                    {"text": rng.choice([None, f"IA{j}"])}
                    for j in range(rng.randint(0, 2))
                ],
            ),
            "corporate_author_monographic": maybe(
                0.5,
                lambda: [
                    {"text": rng.choice([None, f"CA{j}"])}
                    for j in range(rng.randint(0, 2))
                ],
            ),
            "title_monographic": maybe(
                0.6,
                lambda: [
                    {"text": rng.choice([None, f"TM{j}"])}
                    for j in range(rng.randint(0, 2))
                ],
            ),
        }
        cases.append(doc)

    pages_t = T.ArrayType(
        T.StructType([T.StructField(f, T.StringType()) for f in ("_f", "_l", "text", "f", "_e")])
    )
    texts_t = T.ArrayType(T.StructType([T.StructField("text", T.StringType())]))
    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("treatment_level", T.StringType()),
            T.StructField("title_serial", T.StringType()),
            T.StructField("volume_serial", T.StringType()),
            T.StructField("issue_number", T.StringType()),
            T.StructField("publication_date", T.StringType()),
            T.StructField("publication_city", T.StringType()),
            T.StructField("publisher", T.StringType()),
            T.StructField("edition", T.StringType()),
            T.StructField("pages_monographic", T.StringType()),
            T.StructField("symbol", T.StringType()),
            T.StructField("pages", pages_t),
            T.StructField(
                "descriptive_information",
                T.ArrayType(T.StructType([T.StructField("_b", T.StringType())])),
            ),
            T.StructField("individual_author_monographic", texts_t),
            T.StructField("corporate_author_monographic", texts_t),
            T.StructField("title_monographic", texts_t),
        ]
    )

    def tup(doc, i):
        def st(lst, fields):
            if lst is None:
                return None
            return [tuple(e.get(f) for f in fields) for e in lst]

        return (
            i, doc["treatment_level"], doc["title_serial"], doc["volume_serial"],
            doc["issue_number"], doc["publication_date"], doc["publication_city"],
            doc["publisher"], doc["edition"], doc["pages_monographic"], doc["symbol"],
            st(doc["pages"], ("_f", "_l", "text", "f", "_e")),
            st(doc["descriptive_information"], ("_b",)),
            st(doc["individual_author_monographic"], ("text",)),
            st(doc["corporate_author_monographic"], ("text",)),
            st(doc["title_monographic"], ("text",)),
        )

    df = spark.createDataFrame([tup(d, i) for i, d in enumerate(cases)], schema)
    got = {r["i"]: r["fo"] for r in df.select("i", fo_from(df).alias("fo")).collect()}
    for i, doc in enumerate(cases):
        want = expected(doc)
        assert got[i] == want, f"case {i}: {doc!r}\n got={got[i]!r}\nwant={want!r}"
