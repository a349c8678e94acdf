"""MinHash / SimHash sketch quality on crafted near-duplicates (the
no-oracle queries' correctness evidence), plus winnowing fingerprint
properties."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_governance_spark.functions.text import (
    shingle_hashes,
    tokens,
    winnow_fingerprints,
    word_shingles,
)
from data_governance_spark.operators.dedup import (
    exact_precluster,
    minhash_dedup_pairs,
    minhash_signatures,
    simhash_dedup_pairs,
)
from data_governance_spark.functions.text import fingerprint

BASE = "the quick brown fox jumps over the lazy dog and runs far away today " * 4
NEAR = BASE + "sleepy"  # one appended token out of ~56
OTHER = "completely different content about spark queries and shuffles " * 5


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER), (4, BASE)],  # 4 = exact dup of 1
        "doc_id long, text string",
    ).select("doc_id", tokens("text").alias("toks"))


def _exact_jaccard(spark, docs, a, b):
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(word_shingles(F.col("toks"), 3))).alias("s")
    )
    sa = {r["s"] for r in sh.filter(F.col("doc_id") == a).collect()}
    sb = {r["s"] for r in sh.filter(F.col("doc_id") == b).collect()}
    return len(sa & sb) / len(sa | sb)


def test_minhash_finds_near_and_exact_dups(spark, docs):
    pairs = minhash_dedup_pairs(
        docs, F.array_distinct(word_shingles(F.col("toks"), 3)), threshold=0.3
    )
    got = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in pairs.collect()}
    assert (1, 4) in got and got[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in got and (2, 4) in got  # near dups
    assert not any(3 in p for p in got)  # unrelated doc never paired
    # estimate tracks exact jaccard within sketch tolerance (64 hashes)
    exact = _exact_jaccard(spark, docs, 1, 2)
    assert abs(got[(1, 2)] - exact) < 0.2


def test_minhash_threshold_above_one_short_circuits(spark, docs):
    """threshold > 1 provably yields zero pairs (est <= 1.0), so the
    operator must return an empty frame with the REAL output schema
    without computing signatures — the d03 'pipe' gate relies on this
    to disable the sketch stage while exercising the pipeline shape."""
    sh = F.array_distinct(word_shingles(F.col("toks"), 3))
    real = minhash_dedup_pairs(docs, sh, threshold=0.3)
    empty = minhash_dedup_pairs(docs, sh, threshold=1.01)
    assert empty.schema == real.schema
    assert empty.count() == 0
    # the short-circuit plan must not carry the signature aggregation:
    # OptimizeLimitZero folds it to an empty relation (no scan, no agg)
    plan = empty._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan and "Aggregate" not in plan
    # invalid band config still raises even in the short-circuit regime
    with pytest.raises(ValueError):
        minhash_dedup_pairs(docs, sh, threshold=1.01, bands=7)


def test_minhash_signature_shape(spark, docs):
    sigs = minhash_signatures(docs, F.array_distinct(word_shingles(F.col("toks"), 3)))
    rows = sigs.collect()
    assert len(rows) == 4
    assert all(len(r["sig"]) == 64 for r in rows)


def _winnow_df(spark, rows, k=4, w=4):
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", tokens("text").alias("toks")
    )
    hs = df.select(
        "doc_id", shingle_hashes(word_shingles(F.col("toks"), k)).alias("hs")
    )
    return hs.select(
        "doc_id", winnow_fingerprints(F.col("hs"), w).alias("fps")
    )


def test_winnow_matches_python_reference(spark):
    k, w = 4, 4
    toks = BASE.split()
    shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [hashlib.md5(s.encode()).hexdigest() for s in shingles]
    expected = sorted({min(hs[j : j + w]) for j in range(len(hs) - w + 1)})
    got = _winnow_df(spark, [(1, BASE)], k, w).collect()[0]["fps"]
    assert sorted(got) == expected
    # winnowing guarantee: every window of w consecutive hashes
    # contains at least one selected fingerprint
    sel = set(got)
    assert all(any(h in sel for h in hs[j : j + w]) for j in range(len(hs) - w + 1))


def test_winnow_shared_run_yields_shared_fingerprint(spark):
    rows = [(1, BASE), (2, "unrelated preamble text here " + BASE), (3, OTHER)]
    out = {r["doc_id"]: set(r["fps"]) for r in _winnow_df(spark, rows).collect()}
    assert out[1] & out[2]  # long shared token run -> shared fingerprint
    assert not (out[1] & out[3])  # disjoint text -> disjoint fingerprints


def test_bucket_cap_suppresses_duplication_blowup(spark):
    # 20 exact copies -> 190 pairs uncapped; capped buckets drop the
    # mass-dup cluster while unrelated near-dups survive
    rows = [(i, BASE) for i in range(20)] + [(100, NEAR), (101, NEAR + " x")]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", tokens("text").alias("toks")
    )
    sh = F.array_distinct(word_shingles(F.col("toks"), 3))
    uncapped = minhash_dedup_pairs(docs, sh, threshold=0.3).count()
    capped = minhash_dedup_pairs(docs, sh, threshold=0.3, max_bucket_size=5)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert uncapped >= 190
    assert (100, 101) in got  # small buckets unaffected
    assert not any(a < 20 and b < 20 for a, b in got)  # mass-dup cluster dropped


def test_exact_precluster_collapses_copies(spark):
    rows = [(1, BASE), (2, BASE), (3, "  " + BASE + " "), (4, OTHER)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    canonical, mapping = exact_precluster(docs, fingerprint("text"))
    assert sorted(r["doc_id"] for r in canonical.collect()) == [1, 4]
    m = {r["doc_id"]: r["canon_id"] for r in mapping.collect()}
    # normalized fingerprint: whitespace-variant copy maps to the same canon
    assert m == {1: 1, 2: 1, 3: 1, 4: 4}


def test_exact_precluster_null_text_passes_through(spark):
    rows = [(1, BASE), (2, BASE), (3, None), (4, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    canonical, mapping = exact_precluster(docs, fingerprint("text"))
    m = {r["doc_id"]: r["canon_id"] for r in mapping.collect()}
    # NULL-text docs must not vanish: each is its own canonical
    assert m == {1: 1, 2: 1, 3: 3, 4: 4}
    assert sorted(r["doc_id"] for r in canonical.collect()) == [1, 3, 4]


def test_regex_tokens_splits_symbols(spark):
    from data_governance_spark.functions.text import regex_tokens, tokens

    df = spark.createDataFrame([("Price: $12.50, ok?!",)], "text string")
    row = df.select(
        regex_tokens("text").alias("bpe"), tokens("text").alias("ws")
    ).collect()[0]
    # word runs + each symbol as its own token (BPE-ish granularity)
    assert row["bpe"] == [
        "Price", ":", "$", "12", ".", "50", ",", "ok", "?", "!",
    ]
    # whitespace tokenizer keeps punctuation glued
    assert row["ws"] == ["Price:", "$12.50,", "ok?!"]


def test_winnow_short_doc_single_fingerprint(spark):
    out = _winnow_df(spark, [(1, "just three tokens")]).collect()[0]["fps"]
    assert len(out) == 1
    assert out[0] == hashlib.md5(b"just three tokens").hexdigest()


def test_simhash_blocks_near_dups(spark, docs):
    # n_chunks=16 guarantees recall for hamming <= 15 (4-bit keys —
    # test-scale only; production keeps wider keys)
    pairs = simhash_dedup_pairs(docs, F.col("toks"), max_hamming=10, n_chunks=16)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(1, 4)] == 0  # identical text -> identical signature
    assert (1, 2) in got and got[(1, 2)] <= 10
    assert not any(3 in p for p in got)
