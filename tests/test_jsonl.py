"""JSONL source/sink (sources/jsonl.py)."""

from __future__ import annotations

import glob
import gzip
import json

from pyspark.sql import functions as F

from data_governance_spark.sources.jsonl import (
    jsonl_documents,
    read_jsonl,
    write_jsonl,
)

LINES = [
    {"doc_id": 1, "url": "http://a", "lang": "en", "source": "s1",
     "text": "hello world"},
    {"doc_id": 2, "url": None, "lang": "de", "source": "s1",
     "text": "hallo welt"},
]
CORRUPT = '{"doc_id": 3, "text": "truncated...'


def _write(tmp_path, name="corpus.jsonl", gz=False):
    body = "\n".join([json.dumps(x) for x in LINES] + [CORRUPT]) + "\n"
    p = tmp_path / name
    if gz:
        p.write_bytes(gzip.compress(body.encode()))
    else:
        p.write_text(body)
    return str(p)


def test_docs_and_quarantine(spark, tmp_path):
    c = jsonl_documents(spark, _write(tmp_path))
    docs = {r["doc_id"]: r for r in c.docs.collect()}
    assert set(docs) == {1, 2}
    assert docs[1]["text"] == "hello world" and docs[2]["url"] is None
    bad = c.bad.collect()
    assert len(bad) == 1 and bad[0]["_corrupt_record"].startswith('{"doc_id": 3')


def test_gzip_read(spark, tmp_path):
    c = jsonl_documents(spark, _write(tmp_path, "corpus.jsonl.gz", gz=True))
    assert c.docs.count() == 2 and c.bad.count() == 1


def test_type_mismatch_quarantines_row(spark, tmp_path):
    # a type-mismatched field is a producer bug: the whole line lands
    # in the quarantine with its raw text (absent fields are just NULL)
    p = tmp_path / "t.jsonl"
    p.write_text(
        '{"doc_id": "not-a-number", "text": "bad types"}\n'
        '{"doc_id": 9}\n'
    )
    c = jsonl_documents(spark, str(p))
    rows = c.docs.collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 9 and rows[0]["text"] is None
    bad = c.bad.collect()
    assert len(bad) == 1 and "not-a-number" in bad[0]["_corrupt_record"]


def test_roundtrip_with_split_layout(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"text {i}", "train" if i % 2 else "test") for i in range(10)],
        "doc_id long, text string, split string",
    )
    out = str(tmp_path / "out")
    write_jsonl(docs, out, partition_cols=["split"], num_files=2)
    assert glob.glob(out + "/split=train/part-*")
    back = spark.read.json(out)
    assert back.count() == 10
    # split dir layout restored as a column on read
    assert set(
        r["split"] for r in back.select("split").distinct().collect()
    ) == {"train", "test"}


def test_no_python_in_plan(spark, tmp_path):
    c = jsonl_documents(spark, _write(tmp_path))
    plan = (
        c.docs.filter(F.col("lang") == "en")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_jsonl_quarantine_fuzz_vs_json_loads(spark, tmp_path):
    """Fuzz the JSONL source's quarantine split against Python's
    json.loads: a line lands in the clean relation iff it parses AND
    type-checks against the schema; everything else quarantines."""
    import json

    from data_governance_spark.sources.jsonl import jsonl_documents

    frags = [
        '{"doc_id": %d, "text": "ok"}', '{"doc_id": %d}',
        '{"doc_id": "s%d", "text": "x"}',  # type mismatch -> quarantine
        '{"doc_id": %d, "text": 5}',  # number->string COERCES (Jackson)
        '{broken %d', '[1, 2, %d]', '%d', 'null', '',
        '{"text": "only"}',
    ]
    lines = [frags[i % len(frags)].replace("%d", str(i)) for i in range(120)]
    p = tmp_path / "fuzz.jsonl"
    p.write_text("\n".join(lines) + "\n")

    def py_ok(ln):
        if not ln.strip():
            return False  # blank lines are framing, skipped entirely
        try:
            d = json.loads(ln)
        except Exception:
            return False
        if not isinstance(d, dict):
            return False
        did, txt = d.get("doc_id"), d.get("text")
        if did is not None and (isinstance(did, bool) or not isinstance(did, int)):
            return False
        # strings stay; JSON numbers coerce to string (Jackson
        # leniency, pinned above); other types quarantine
        if txt is not None and not isinstance(txt, (str, int, float)):
            return False
        return True

    c = jsonl_documents(spark, str(p))
    n_clean = c.docs.count()
    n_quar = c.bad.count()
    want_clean = sum(1 for ln in lines if py_ok(ln))
    blank = sum(1 for ln in lines if not ln.strip())
    assert n_clean == want_clean
    assert n_quar == len(lines) - want_clean - blank
