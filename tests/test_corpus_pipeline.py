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

from data_governance_spark.functions.text import tokens, word_shingles
from data_governance_spark.operators.components import (
    connected_components,
    keep_canonical,
)
from data_governance_spark.operators.dedup import (
    exact_precluster,
    minhash_dedup_pairs,
)
from data_governance_spark.operators.packing import pack_sequences
from data_governance_spark.operators.pii import redact_pii
from data_governance_spark.operators.quality import filter_corpus
from data_governance_spark.operators.sampling import hash_split
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
    from data_governance_spark.functions.html import html_to_text

    docs = warc_documents(spark, warc_file).withColumn(
        "text", html_to_text("text")
    )

    clean = filter_corpus(docs, text_col="text")
    clean = redact_pii(clean, text_col="text")

    canonical, mapping = exact_precluster(clean, F.md5("text"))
    toked = canonical.select(
        "doc_id", "url", "text", tokens("text").alias("toks")
    )
    shingled = toked.select(
        "doc_id", F.array_distinct(word_shingles(F.col("toks"), 3)).alias("sh")
    )
    near = minhash_dedup_pairs(shingled, F.col("sh"), threshold=0.5)
    exact_pairs = mapping.filter("doc_id != canon_id").selectExpr(
        "doc_id AS doc_a", "canon_id AS doc_b"
    )
    comp = connected_components(
        near.select("doc_a", "doc_b").unionByName(exact_pairs),
        "doc_a",
        "doc_b",
        nodes=clean.select("doc_id"),
        node_col="doc_id",
    )
    kept = keep_canonical(clean, comp)
    split = hash_split(kept, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id")
    # partition_cols=["split"]: packs must never mix holdout splits
    packed = pack_sequences(
        split, max_tokens=64, num_buckets=4, partition_cols=["split"]
    )
    return {
        "docs": docs,
        "clean": clean,
        "kept": kept,
        "split": split,
        "packed": packed,
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
