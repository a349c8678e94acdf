"""The full training-corpus preparation pipeline, composed end-to-end:

    WARC ingest -> quality filter -> PII redaction -> exact precluster
    -> MinHash near-dup -> component closure -> canonical selection
    -> holdout split -> sequence packing

Every stage is the real operator; the assertions pin the whole-pipeline
invariants a corpus build must satisfy (survivor counts, PII absence,
split disjointness, pack tiling). This is the LLM-data twin of
test_components.test_full_dedup_pipeline_composition.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_governance_spark.sources.warc import warc_documents


def _warc_record(rid, uri, body):
    h = (
        f"WARC-Type: conversion\r\n"
        f"WARC-Date: 2025-01-01T00:00:00Z\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(body.encode())}\r\n"
    )
    return f"WARC/1.0\r\n{h}\r\n{body}\r\n\r\n"


N_BASE = 30


@pytest.fixture(scope="module")
def warc_file(tmp_path_factory):
    """30 good base docs (disjoint vocab, stopwords present, one with
    an email), each with 1 exact copy and 1 near-dup; plus 5 junk docs
    the quality filter must drop (too short / pure repetition)."""
    recs = []
    for i in range(N_BASE):
        words = ["the", "of", "a"] + [f"w{i}x{j}" for j in range(57)]
        body = " ".join(words)
        if i == 0:
            body += " mail me at someone@example.com please"
        recs.append(_warc_record(f"base{i}", f"http://s/{i}", body))
        recs.append(_warc_record(f"copy{i}", f"http://c/{i}", body))
        near = body.replace(f"w{i}x30", f"q{i}z", 1)
        recs.append(_warc_record(f"near{i}", f"http://n/{i}", near))
    for i in range(5):
        recs.append(_warc_record(f"junk{i}", f"http://j/{i}", "tiny doc"))
        recs.append(
            _warc_record(f"spam{i}", f"http://sp/{i}", " ".join(["buy"] * 120))
        )
    p = tmp_path_factory.mktemp("corpus") / "crawl.warc"
    p.write_bytes("".join(recs).encode())
    return str(p)


@pytest.fixture(scope="module")
def pipeline_out(spark, warc_file):
    """Drives the PUBLIC composition API (corpus.prepare_corpus); the
    operator-level steps it wires are covered by their own suites."""
    from data_governance_spark.corpus import prepare_corpus

    docs = warc_documents(spark, warc_file)
    r = prepare_corpus(docs, html=True, max_tokens=64, num_buckets=4)
    return {
        "docs": docs,
        "clean": r.clean,
        "kept": r.kept,
        "split": r.split,
        "packed": r.packed,
    }


class TestCorpusPipeline:
    def test_ingest_count(self, pipeline_out):
        assert pipeline_out["docs"].count() == N_BASE * 3 + 10

    def test_quality_filter_drops_junk(self, pipeline_out):
        clean = pipeline_out["clean"]
        assert clean.count() == N_BASE * 3
        assert clean.filter(F.col("url").like("http://j/%")).count() == 0
        assert clean.filter(F.col("url").like("http://sp/%")).count() == 0

    def test_pii_gone_before_dedup(self, pipeline_out):
        clean = pipeline_out["clean"]
        assert clean.filter(F.col("text").contains("@example.com")).count() == 0
        # base0 + its exact copy + its near-dup all carried the email
        assert clean.filter(F.col("text").contains("<EMAIL>")).count() == 3

    def test_one_survivor_per_true_cluster(self, pipeline_out):
        # copyN collapses exactly; nearN merges via MinHash: 30 survive
        assert pipeline_out["kept"].count() == N_BASE

    def test_split_exhaustive_disjoint(self, pipeline_out):
        split = pipeline_out["split"]
        assert split.filter(F.col("split").isNull()).count() == 0
        assert split.count() == N_BASE

    def test_packs_tile_and_never_mix_splits(self, pipeline_out):
        rows = pipeline_out["packed"].collect()
        assert len(rows) == N_BASE
        per_pack = {}
        for r in rows:
            per_pack.setdefault(
                (r["split"], r["pack_bucket"], r["pack_id"]), []
            ).append((r["pack_offset"], r["n_tokens"], r["split"]))
        for key, docs in per_pack.items():
            docs.sort()
            for (o1, n1, _), (o2, _, _) in zip(docs, docs[1:]):
                assert o2 == o1 + n1, (key, docs)
        # a (bucket, pack) pair carries exactly one split by construction
        seen = {}
        for split, bucket, pack in per_pack:
            assert seen.setdefault((split, bucket, pack), split) == split


class TestPrepareCorpusOptions:
    def test_custom_id_col_works(self, spark):
        """Regression: minhash_dedup_pairs previously hard-defaulted
        doc_id and crashed on any other id column."""
        from data_governance_spark.corpus import prepare_corpus

        def text(i):
            return " ".join(["the", "of"] + [f"v{i}x{j}" for j in range(58)])

        docs = spark.createDataFrame(
            [(i, text(i)) for i in range(8)]
            + [(100, text(0).replace("v0x30", "qz"))],  # near-dup of 0
            "page_id long, text string",
        )
        r = prepare_corpus(
            docs, id_col="page_id", max_tokens=64, num_buckets=2,
            persist_clean=False,
        )
        kept = r.kept.count()
        assert kept == 8  # 100 collapsed into 0's cluster
        assert "page_id" in r.packed.columns

    def test_pii_and_html_toggles(self, spark):
        from data_governance_spark.corpus import prepare_corpus

        words = ["the", "of"] + [f"u{j}" for j in range(58)]
        docs = spark.createDataFrame(
            [(1, "<p>" + " ".join(words) + " mail x@y.io</p>")],
            "doc_id long, text string",
        )
        with_pii = prepare_corpus(
            docs, html=True, pii=False, persist_clean=False
        ).clean.first()["text"]
        assert "x@y.io" in with_pii and "<p>" not in with_pii
        no_pii = prepare_corpus(
            docs, html=True, pii=True, persist_clean=False
        ).clean.first()["text"]
        assert "<EMAIL>" in no_pii

    def test_benchmark_decontamination(self, spark):
        from data_governance_spark.corpus import prepare_corpus

        def text(i, tail=""):
            return " ".join(
                ["the", "of"] + [f"w{i}x{j}" for j in range(58)]
            ) + tail

        docs = spark.createDataFrame(
            [(i, text(i)) for i in range(6)], "doc_id long, text string"
        )
        # benchmark = a 13-token slice of doc 2's text
        bench = spark.createDataFrame(
            [(" ".join(text(2).split()[10:23]),)], "text string"
        )
        r = prepare_corpus(
            docs, benchmark=bench, pii=False, persist_clean=False
        )
        kept = sorted(row["doc_id"] for row in r.kept.collect())
        assert kept == [0, 1, 3, 4, 5]  # doc 2 decontaminated away

    def test_dedup_substr_tier(self, spark):
        from data_governance_spark.corpus import prepare_corpus

        boiler = " ".join(f"b{j}" for j in range(12))  # shared 12-gram

        def text(i):
            return boiler + " " + " ".join(
                ["the", "of"] + [f"s{i}x{j}" for j in range(58)]
            )

        docs = spark.createDataFrame(
            [(i, text(i)) for i in range(4)], "doc_id long, text string"
        )
        r = prepare_corpus(
            docs,
            dedup_substr_width=10,
            quality_rules={},
            pii=False,
            persist_clean=False,
        )
        out = {row["doc_id"]: row["text"] for row in r.kept.collect()}
        assert out[0] == text(0)  # canonical keeps the boilerplate
        for i in (1, 2, 3):
            # shared windows are those ending at or before the last
            # common token ("of", pos 13): starts 0..4, whose coverage
            # is the boilerplate plus the common "the of" lead-in
            assert out[i] == " ".join(text(i).split()[14:])

    def test_url_tier(self, spark):
        from data_governance_spark.corpus import prepare_corpus

        def text(i):
            return " ".join(["the", "of"] + [f"q{i}x{j}" for j in range(58)])

        docs = spark.createDataFrame(
            [
                (1, "http://ok.org/a", text(1)),
                (2, "http://a.spam.com/b", text(2)),  # domain-blocked
                (3, "http://ok.org/c.zip", text(3)),  # pattern-blocked
            ],
            "doc_id long, url string, text string",
        )
        r = prepare_corpus(
            docs,
            url_blocklist=["spam.com"],
            url_patterns=[r"\.zip$"],
            pii=False,
            persist_clean=False,
        )
        assert [row["doc_id"] for row in r.kept.collect()] == [1]

    def test_compression_bounds_tier(self, spark):
        from data_governance_spark.corpus import prepare_corpus

        good = " ".join(
            ["the", "of"] + [f"real{i}word{i % 9}" for i in range(60)]
        )
        spam = "the of " + "buy now " * 40  # compresses to almost nothing
        docs = spark.createDataFrame(
            [(1, good), (2, spam)], "doc_id long, text string"
        )
        rules = {"n_tokens": (3, None)}
        base = prepare_corpus(
            docs, quality_rules=rules, pii=False, persist_clean=False
        )
        assert sorted(r["doc_id"] for r in base.kept.collect()) == [1, 2]
        cut = prepare_corpus(
            docs,
            quality_rules=rules,
            compression_bounds=(0.2, 0.95),
            pii=False,
            persist_clean=False,
        )
        assert [r["doc_id"] for r in cut.kept.collect()] == [1]

    def test_url_tier_without_url_column_raises(self, spark):
        import pytest

        from data_governance_spark.corpus import prepare_corpus

        docs = spark.createDataFrame(
            [(1, "some text")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="url_blocklist"):
            prepare_corpus(docs, url_blocklist=["spam.com"])
        with pytest.raises(ValueError, match="url_patterns"):
            prepare_corpus(docs, url_patterns=[r"\.zip$"])

    def test_c4_line_tier(self, spark):
        from data_governance_spark.corpus import prepare_corpus

        body = " ".join(
            f"w{j}" for j in range(12)
        )  # 12 words, needs terminal punct
        good_lines = "\n".join(f"{body} line{i}." for i in range(5))
        noisy = "Home | About\n" + good_lines + "\nMenu."
        docs = spark.createDataFrame(
            [(1, noisy)], "doc_id long, text string"
        )
        r = prepare_corpus(
            docs,
            c4_lines=True,
            quality_rules={"n_tokens": (10, 100000)},
            pii=False,
            persist_clean=False,
        )
        out = r.clean.collect()
        assert len(out) == 1
        assert "Home" not in out[0]["text"] and "Menu." not in out[0]["text"]
        assert len(out[0]["text"].split("\n")) == 5

    def test_report_data_card(self, spark):
        from data_governance_spark.corpus import prepare_corpus

        def text(i):
            return " ".join(["the", "of"] + [f"r{i}x{j}" for j in range(58)])

        docs = spark.createDataFrame(
            [(i, text(i)) for i in range(10)]
            + [(100, text(0))],  # exact dup of 0 -> collapsed
            "doc_id long, text string",
        )
        r = prepare_corpus(
            docs, pii=False, max_tokens=64, num_buckets=2,
            persist_clean=False,
        )
        card = r.report()
        assert card["clean_docs"] == 11
        assert card["kept_docs"] == 10
        assert card["dup_pairs"] >= 1  # at least the exact pair
        tot_docs = sum(s["docs"] for s in card["splits"].values())
        assert tot_docs == 10
        for s in card["splits"].values():
            assert s["tokens"] == s["docs"] * 60  # 60 tokens per doc
            assert s["packs"] >= 1

    def test_dedup_lines_tier(self, spark):
        from data_governance_spark.corpus import prepare_corpus

        banner = "the of " + " ".join(f"b{j}" for j in range(20))
        docs = spark.createDataFrame(
            [
                (
                    i,
                    banner
                    + "\nthe of "
                    + " ".join(f"v{i}x{j}" for j in range(40)),
                )
                for i in range(4)
            ],
            "doc_id long, text string",
        )
        r = prepare_corpus(
            docs,
            dedup_lines=True,
            quality_rules={"n_tokens": (10, 100000)},
            pii=False,
            persist_clean=False,
        )
        texts = {row["doc_id"]: row["text"] for row in r.clean.collect()}
        assert len(texts) == 4
        # banner survives only in its first occurrence (doc 0)
        assert sum(banner in t for t in texts.values()) == 1
        assert banner in texts[0]


class TestSketchDisabledClosureShortCircuit:
    def test_threshold_gt_one_kept_equals_generic_closure(self, spark):
        """threshold > 1 disables the sketch stage, so dup_pairs is
        exactly the exact-precluster star forest and prepare_corpus
        substitutes the precluster mapping for the iterative closure
        (keeping the call fully lazy). Differential: the kept set must
        equal running the REAL connected_components over the same
        dup_pairs — including exact-dup clusters and singletons."""
        from data_governance_spark.corpus import prepare_corpus
        from data_governance_spark.operators.components import (
            connected_components,
            keep_canonical,
        )

        def text(i):
            return " ".join(["the", "of"] + [f"w{i}x{j}" for j in range(58)])

        # 0..7 distinct; 100/101 exact copies of 0 (one 3-doc exact
        # cluster); 102 exact copy of 5 (a 2-doc cluster)
        docs = spark.createDataFrame(
            [(i, text(i)) for i in range(8)]
            + [(100, text(0)), (101, text(0)), (102, text(5))],
            "doc_id long, text string",
        )
        r = prepare_corpus(
            docs, minhash_threshold=1.01, persist_clean=False,
            quality_rules={"n_tokens": (10, 100000)},
        )
        kept_fast = sorted(row["doc_id"] for row in r.kept.collect())
        comp = connected_components(
            r.dup_pairs, "doc_a", "doc_b",
            nodes=r.clean.select("doc_id"), node_col="doc_id",
        )
        kept_generic = sorted(
            row["doc_id"]
            for row in keep_canonical(r.clean, comp).collect()
        )
        assert kept_fast == kept_generic == list(range(8))
