"""WARC source (sources/warc.py): record splitting, header parsing,
HTTP envelope stripping, documents mapping."""

from __future__ import annotations

import gzip

import pytest

from data_governance_spark.sources.warc import (
    http_body,
    read_warc,
    warc_documents,
)


def _rec(wtype, uri, rid, body, extra=""):
    headers = (
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Date: 2025-01-01T00:00:00Z\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + extra
        + f"Content-Length: {len(body.encode())}\r\n"
    )
    return f"WARC/1.0\r\n{headers}\r\n{body}\r\n\r\n"


WARC_TEXT = (
    _rec("warcinfo", None, "aaa", "software: test-writer 1.0")
    + _rec("conversion", "http://x.org/a", "bbb", "extracted plain text a")
    + _rec(
        "response",
        "http://x.org/b",
        "ccc",
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>B</html>",
    )
)


@pytest.fixture(scope="module")
def warc_path(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    p = d / "test.warc"
    p.write_bytes(WARC_TEXT.encode())
    # a gzipped sibling: whole-file gzip, Spark decompresses transparently
    (d / "test2.warc.gz").write_bytes(gzip.compress(WARC_TEXT.encode()))
    return d


class TestReadWarc:
    def test_record_split_and_headers(self, spark, warc_path):
        rows = {
            r["record_id"]: r
            for r in read_warc(spark, str(warc_path / "test.warc")).collect()
        }
        assert set(rows) == {
            "<urn:uuid:aaa>", "<urn:uuid:bbb>", "<urn:uuid:ccc>"
        }
        b = rows["<urn:uuid:bbb>"]
        assert b["warc_type"] == "conversion"
        assert b["target_uri"] == "http://x.org/a"
        assert b["payload"] == "extracted plain text a"
        assert b["content_length"] == len(b"extracted plain text a")
        assert b["date"] == "2025-01-01T00:00:00Z"
        # warcinfo has no URI -> empty extract
        assert rows["<urn:uuid:aaa>"]["target_uri"] == ""

    def test_gzip_whole_file(self, spark, warc_path):
        got = read_warc(spark, str(warc_path / "test2.warc.gz")).count()
        assert got == 3

    def test_http_envelope_stripped(self, spark, warc_path):
        rows = {
            r["record_id"]: r
            for r in read_warc(spark, str(warc_path / "test.warc"))
            .withColumn("body", http_body("payload"))
            .collect()
        }
        assert rows["<urn:uuid:ccc>"]["body"] == "<html>B</html>"
        # non-HTTP payloads untouched
        assert rows["<urn:uuid:bbb>"]["body"] == "extracted plain text a"


class TestWarcDocuments:
    def test_documents_shape(self, spark, warc_path):
        docs = warc_documents(spark, str(warc_path / "test.warc"))
        assert docs.columns == ["doc_id", "url", "text"]
        rows = {r["url"]: r for r in docs.collect()}
        # warcinfo filtered out; conversion + response kept
        assert set(rows) == {"http://x.org/a", "http://x.org/b"}
        assert rows["http://x.org/b"]["text"] == "<html>B</html>"
        ids = [r["doc_id"] for r in rows.values()]
        assert len(set(ids)) == 2 and all(i is not None for i in ids)

    def test_no_python_in_plan(self, spark, warc_path):
        plan = (
            warc_documents(spark, str(warc_path / "test.warc"))
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan  # pure scan + projection


class TestReviewRegressions:
    def test_warc_1_1_records_parse(self, spark, tmp_path):
        rec = WARC_TEXT.replace("WARC/1.0", "WARC/1.1")
        p = tmp_path / "v11.warc"
        p.write_bytes(rec.encode())
        assert read_warc(spark, str(p)).count() == 3

    def test_empty_body_response_yields_empty_text(self, spark, tmp_path):
        body = "HTTP/1.1 204 No Content\r\nServer: x"
        rec = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            "WARC-Record-ID: <urn:uuid:e>\r\n"
            "WARC-Target-URI: http://x/e\r\n"
            f"Content-Length: {len(body)}\r\n"
            f"\r\n{body}\r\n\r\n"
        )
        p = tmp_path / "empty.warc"
        p.write_bytes(rec.encode())
        rows = warc_documents(spark, str(p)).collect()
        assert len(rows) == 1
        # no garbled header substring — empty body stays empty
        assert rows[0]["text"] == ""

    def test_missing_record_id_gets_distinct_doc_ids(self, spark, tmp_path):
        def rec(uri, body):
            return (
                "WARC/1.0\r\n"
                "WARC-Type: conversion\r\n"
                f"WARC-Target-URI: {uri}\r\n"
                f"Content-Length: {len(body)}\r\n"
                f"\r\n{body}\r\n\r\n"
            )

        p = tmp_path / "noid.warc"
        p.write_bytes((rec("http://a", "text a") + rec("http://b", "text b")).encode())
        ids = [r["doc_id"] for r in warc_documents(spark, str(p)).collect()]
        assert len(ids) == 2 and len(set(ids)) == 2


class TestFalseSplitResilience:
    """The documented lineSep limitation (warc.py:41-44): a payload
    containing the literal record marker false-splits that record.
    Pin the failure MODE — truncation of the poisoned record, zero
    collateral damage, no bogus typed records — so the docstring's
    claim stays true under change."""

    def test_marker_in_payload_truncates_only_that_record(
        self, spark, tmp_path
    ):
        txt = (
            _rec("conversion", "http://x.org/ok", "k1", "clean text one")
            + _rec(
                "conversion", "http://x.org/poison", "k2",
                "discusses the WARC/1.0\r\nformat spec at length",
            )
            + _rec("conversion", "http://x.org/ok2", "k3", "clean text two")
        )
        p = tmp_path / "poison.warc"
        p.write_bytes(txt.encode())
        rows = {
            r["record_id"]: r for r in read_warc(spark, str(p)).collect()
        }
        # neighbors intact, byte for byte
        assert rows["<urn:uuid:k1>"]["payload"] == "clean text one"
        assert rows["<urn:uuid:k3>"]["payload"] == "clean text two"
        # the poisoned record survives truncated at the marker
        assert rows["<urn:uuid:k2>"]["payload"].startswith("discusses the")
        assert "format spec" not in rows["<urn:uuid:k2>"]["payload"]
        # the split-off fragment has no WARC headers -> dropped, so no
        # bogus extra document appears
        assert warc_documents(spark, str(p)).count() == 3

    def test_random_clean_payloads_roundtrip_exactly(self, spark, tmp_path):
        # seeded fuzz: payloads over a nasty alphabet (CR/LF, colons,
        # angle brackets, partial markers like 'WARC/' and 'HTTP/x')
        # that do NOT contain the full marker must round-trip exactly
        import random

        rng = random.Random(20260814)
        frags = [
            "WARC", "WARC/", "ARC/1.0", "HTTP/9 ", "a: b", "<doc>",
            "text ", "\r\n", ": ", "x",
        ]
        payloads = []
        for i in range(25):
            s = "".join(rng.choice(frags) for _ in range(rng.randrange(1, 12)))
            s = s.replace("WARC/1.", "WARC_1.")  # keep marker-free
            # trailing CR/LF is framing-ambiguous by design (read_warc
            # strips it); leading header-shaped lines before \r\n\r\n
            # would legitimately parse as headers — normalize both away
            s = s.strip("\r\n")
            payloads.append(s if s else f"p{i}")
        txt = "".join(
            _rec("conversion", f"http://x.org/{i}", f"f{i}", s)
            for i, s in enumerate(payloads)
        )
        p = tmp_path / "fuzz.warc"
        p.write_bytes(txt.encode())
        got = {
            r["record_id"]: r["payload"]
            for r in read_warc(spark, str(p)).collect()
        }
        for i, s in enumerate(payloads):
            assert got[f"<urn:uuid:f{i}>"] == s, (i, s)
