"""PII detection/redaction (operators/pii.py)."""

from __future__ import annotations

import pytest

from data_governance_spark.operators.pii import pii_counts, redact_pii


SAMPLES = [
    (1, "contact alice.smith+x@example.co.uk or visit https://a.b/c?d=1"),
    (2, "server at 192.168.0.1 went down, call 555-123-4567 now"),
    (3, "plain prose with no identifiers at all, just words"),
    (4, "www.example.org and bob@x.io and 10.0.0.255 and +1 415-555-0199"),
    (5, "version 1.2.3.4.5 is not an IP; 999.1.1.1 is not either"),
    (6, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(SAMPLES, "doc_id long, text string")


class TestPiiCounts:
    def test_counts(self, spark, docs):
        r = {x["doc_id"]: x for x in pii_counts(docs).collect()}
        assert (r[1]["n_email"], r[1]["n_url"]) == (1, 1)
        assert (r[2]["n_ipv4"], r[2]["n_phone"]) == (1, 1)
        assert all(
            r[3][f"n_{k}"] == 0 for k in ("email", "url", "ipv4", "phone")
        )
        assert (r[4]["n_url"], r[4]["n_email"], r[4]["n_ipv4"]) == (1, 1, 1)
        assert r[6]["n_email"] == 0

    def test_precision_guards(self, spark, docs):
        r = {x["doc_id"]: x for x in pii_counts(docs).collect()}
        # dotted version strings and out-of-range octets are NOT IPs
        assert r[5]["n_ipv4"] == 0


class TestRedactPii:
    def test_redaction_replaces_with_placeholders(self, spark, docs):
        r = {x["doc_id"]: x["text"] for x in redact_pii(docs).collect()}
        assert r[1] == "contact <EMAIL> or visit <URL>"
        assert "<IPV4>" in r[2] and "<PHONE>" in r[2]
        assert r[3] == SAMPLES[2][1]  # untouched
        assert "bob@x.io" not in r[4] and "<EMAIL>" in r[4]

    def test_url_redacted_before_email(self, spark):
        docs = spark.createDataFrame(
            [(1, "see https://u:pw@host.com/p")], "doc_id long, text string"
        )
        out = redact_pii(docs).first()["text"]
        # the in-URL @ must not leave an <EMAIL> fragment
        assert out == "see <URL>"

    def test_out_col_preserves_original(self, spark, docs):
        out = redact_pii(docs, out_col="clean").first()
        assert "clean" in redact_pii(docs, out_col="clean").columns
        assert out["text"] != out["clean"] or "@" not in out["text"]

    def test_unknown_kind_raises(self, spark, docs):
        with pytest.raises(ValueError, match="unknown PII kinds"):
            redact_pii(docs, kinds=("ssn",))

    def test_no_shuffle(self, spark, docs):
        plan = (
            redact_pii(docs)
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        assert "Exchange" not in plan


class TestReviewRegressions:
    def test_year_pairs_are_not_phones(self, spark):
        docs = spark.createDataFrame(
            [(1, "from 2024 2025 onward, pages 123 4567 of the report")],
            "doc_id long, text string",
        )
        # the old pattern backtracked into '024 2025'; boundary guards
        # forbid matches whose first digit follows another digit
        out = redact_pii(docs).first()["text"]
        assert "2024 2025" in out
        # 'pages 123 4567' DOES look like a guarded phone (3+4 digits
        # with clean boundaries) — precision-first means shapes
        # indistinguishable from phones still redact
        assert "<PHONE>" in out

    def test_redaction_preserves_guard_chars(self, spark):
        docs = spark.createDataFrame(
            [(1, "call (415) 555-0199, then stop")],
            "doc_id long, text string",
        )
        out = redact_pii(docs).first()["text"]
        assert out == "call <PHONE>, then stop"


def test_redaction_passes_catches_adjacent_items(spark):
    """ADVICE r5: the boundary guards consume a character, so adjacent
    PII items hide the second one from a single pass; passes=2 (the
    prepare_corpus default) catches it."""
    docs = spark.createDataFrame(
        [(1, "ips 1.2.3.4,5.6.7.8 done"), (2, "tel 555-0100,555-0199 end")],
        "doc_id long, text string",
    )
    one = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    two = {
        r["doc_id"]: r["text"] for r in redact_pii(docs, passes=2).collect()
    }
    assert one[1] == "ips <IPV4>,5.6.7.8 done"  # the stated 1-pass gap
    assert two[1] == "ips <IPV4>,<IPV4> done"
    assert two[2] == "tel <PHONE>,<PHONE> end"


def test_redaction_idempotent(spark, docs):
    """Scrubbing a scrubbed corpus is a no-op: placeholders contain
    no digits/@/scheme, so a second pass can't re-match (re-running
    the scrub on already-clean data must be safe)."""
    once = redact_pii(docs)
    twice = redact_pii(once)
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == b
