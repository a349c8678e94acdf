"""CSV source with quarantine (sources/csvq.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from data_governance_spark.sources.csvq import csv_documents, write_csv

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write(tmp_path, lines, name="data.csv"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_clean_and_quarantine_split(spark, tmp_path):
    lines = [
        "doc_id,lang,text",
        "1,en,hello world",
        "2,de,hallo welt",
        "x9,en,bad id",          # un-castable long -> quarantine
        "3,en",                  # missing column -> quarantine
        "4,en,extra,field",      # extra column -> quarantine
        "",                      # blank -> skipped entirely
        '5,fr,"quoted, with comma"',
    ]
    path = _write(tmp_path, lines)
    c = csv_documents(spark, path, SCHEMA)
    docs = {r["doc_id"]: r for r in c.docs.collect()}
    assert sorted(docs) == [1, 2, 5]
    assert docs[5]["text"] == "quoted, with comma"
    bad = sorted(r["_corrupt_record"] for r in c.bad.collect())
    assert bad == ["3,en", "4,en,extra,field", "x9,en,bad id"]


def test_headerless_mode(spark, tmp_path):
    path = _write(tmp_path, ["1,en,a", "2,de,b"])
    c = csv_documents(spark, path, SCHEMA, header=False)
    assert c.docs.count() == 2 and c.bad.count() == 0


def test_roundtrip_write_read(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "en", "alpha"), (2, "de", "beta, with comma")],
        SCHEMA,
    )
    out = str(tmp_path / "out")
    write_csv(df, out, num_files=1)
    back = csv_documents(spark, out + "/*.csv", SCHEMA)
    assert back.bad.count() == 0
    got = sorted(
        (r["doc_id"], r["lang"], r["text"]) for r in back.docs.collect()
    )
    assert got == [(1, "en", "alpha"), (2, "de", "beta, with comma")]


def test_counting_bad_side_only_does_not_raise(spark, tmp_path):
    # the QUERY_ONLY_CORRUPT_RECORD_COLUMN trap the text+from_csv
    # construction exists to dodge
    path = _write(tmp_path, ["doc_id,lang,text", "nope,en,x"])
    c = csv_documents(spark, path, SCHEMA)
    assert c.bad.count() == 1


def test_fuzz_vs_python_reference(spark, tmp_path):
    """Randomized rows vs a Python recomputation of the quarantine
    decision (positional CSV, no quoting in the generated rows)."""
    import random

    rng = random.Random(3)
    cells = ["1", "22", "x", "en", "de", "word", "two words", ""]
    lines = []
    for i in range(150):
        n = rng.randrange(1, 5)
        row = [rng.choice(cells) for _ in range(n)]
        row[0] = rng.choice([str(i), "bad"])
        lines.append(",".join(row))
    lines = [ln for ln in lines if ln.strip()]
    path = _write(tmp_path, ["doc_id,lang,text"] + lines)

    def py_ok(ln):
        parts = ln.split(",")
        if len(parts) != 3:
            return False
        try:
            int(parts[0])
        except ValueError:
            return False
        return True

    c = csv_documents(spark, path, SCHEMA)
    want_ok = sum(1 for ln in lines if py_ok(ln))
    assert c.docs.count() == want_ok
    assert c.bad.count() == len(lines) - want_ok


def test_schema_required(spark, tmp_path):
    with pytest.raises(TypeError):
        csv_documents(spark, str(tmp_path / "x.csv"))  # no schema arg


def test_multiline_quoted_record_quarantines_not_truncates(spark, tmp_path):
    """A quoted field containing a newline spans physical lines; the
    line-based reader must QUARANTINE the fragments (odd quote
    parity), never emit a silently-truncated clean row — the failure
    Spark's own default multiLine=false CSV reader commits."""
    lines = [
        "doc_id,lang,text",
        '1,en,"line one',
        'line two"',
        "2,de,intact row",
    ]
    path = _write(tmp_path, lines)
    c = csv_documents(spark, path, SCHEMA)
    docs = {r["doc_id"]: r["text"] for r in c.docs.collect()}
    assert docs == {2: "intact row"}  # nothing truncated into docs
    bad = sorted(r["_corrupt_record"] for r in c.bad.collect())
    assert bad == ['1,en,"line one', 'line two"']


def test_embedded_doubled_quotes_stay_clean(spark, tmp_path):
    # RFC-4180 doubled quotes keep parity even -> well-formed rows pass
    lines = ["doc_id,lang,text", '3,en,"say ""hi"" now"']
    c = csv_documents(spark, _write(tmp_path, lines), SCHEMA)
    assert [r["text"] for r in c.docs.collect()] == ['say "hi" now']
    assert c.bad.count() == 0


def test_stratified_pred_sql_empty_fractions_parses(spark):
    import duckdb

    from data_governance_spark.operators.sampling import (
        hash_sample_stratified,
        stratified_pred_sql,
    )

    df = spark.createDataFrame(
        [(i, "web") for i in range(50)], "doc_id long, domain string"
    )
    got = sorted(
        r["doc_id"]
        for r in hash_sample_stratified(
            df, {}, "domain", "doc_id", default_frac=0.3
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(range(0, 50)) AS doc_id, 'web' AS domain")
    pred = stratified_pred_sql({}, "domain", "doc_id", default_frac=0.3)
    want = [r[0] for r in con.execute(
        f"SELECT doc_id FROM t WHERE {pred} ORDER BY doc_id"
    ).fetchall()]
    assert got == want
