#!/usr/bin/env python
"""Measured end-to-end corpus-preparation run over the sf documents
table: quality filter -> PII redaction -> exact precluster -> MinHash
near-dup -> component closure -> canonical selection -> hash split ->
sequence packing. Prints per-stage wall time + row counts; the DEPLOY.md
corpus-pipeline numbers come from here.

Usage: python scripts/corpus_bench.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.functions.text import tokens, word_shingles  # noqa: E402
from data_governance_spark.operators.components import (  # noqa: E402
    connected_components,
    keep_canonical,
)
from data_governance_spark.operators.dedup import (  # noqa: E402
    exact_precluster,
    minhash_dedup_pairs,
)
from data_governance_spark.operators.packing import pack_sequences  # noqa: E402
from data_governance_spark.operators.pii import redact_pii  # noqa: E402
from data_governance_spark.operators.quality import filter_corpus  # noqa: E402
from data_governance_spark.operators.sampling import hash_split  # noqa: E402
from data_governance_spark.session import get_spark  # noqa: E402
from data_governance_spark.tables import table  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("corpus_bench")
    spark.sparkContext.setLogLevel("ERROR")
    t_all = time.perf_counter()

    def stage(label, df):
        t0 = time.perf_counter()
        n = df.count()
        print(f"{label:>12}: {n:>8} rows  {time.perf_counter()-t0:6.2f}s", flush=True)
        return df

    docs = table(spark, sf, "documents").select("doc_id", "text")
    stage("ingest", docs)
    # the synthetic corpus averages ~150 tokens/doc — loosen the
    # length band and the two frac caps (short vocab-soup docs repeat
    # n-grams more than prose); every other Gopher default applies
    # as-is via the merge (filter_corpus REPLACES, never merges)
    from data_governance_spark.operators.quality import DEFAULT_RULES

    rules = {**DEFAULT_RULES,
             "n_tokens": (20, 100_000),
             "top_bigram_frac": (None, 0.5),
             "dup_5gram_frac": (None, 0.5)}
    clean = redact_pii(filter_corpus(docs, rules)).persist()
    stage("clean", clean)
    canonical, mapping = exact_precluster(clean, F.md5("text"))
    canonical = canonical.persist()
    stage("canonical", canonical)
    # word_shingles needs a materialized token column (HOFs re-evaluate
    # inline argument expressions per element)
    shingled = canonical.select(
        "doc_id", tokens("text").alias("t")
    ).select("doc_id", F.array_distinct(word_shingles(F.col("t"), 3)).alias("sh"))
    near = minhash_dedup_pairs(shingled, F.col("sh"), threshold=0.5)
    exact_pairs = mapping.filter("doc_id != canon_id").selectExpr(
        "doc_id AS doc_a", "canon_id AS doc_b"
    )
    # connected_components is iterative and runs its jobs AT CALL TIME
    # (per-round localCheckpoint + convergence count) — time it as its
    # own stage or its cost would hide between stage prints
    t0 = time.perf_counter()
    comp = connected_components(
        near.select("doc_a", "doc_b").unionByName(exact_pairs),
        "doc_a",
        "doc_b",
        nodes=clean.select("doc_id"),
        node_col="doc_id",
    )
    print(f"{'closure':>12}: {'-':>8} rows  {time.perf_counter()-t0:6.2f}s",
          flush=True)
    kept = keep_canonical(clean, comp).persist()
    stage("kept", kept)
    split = hash_split(kept, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id")
    packed = pack_sequences(split, max_tokens=4096, num_buckets=64,
                            partition_cols=["split"])
    stage("packed", packed)
    n_packs = packed.select("split", "pack_bucket", "pack_id").distinct().count()
    print(f"{'packs':>12}: {n_packs:>8}")
    print(f"{'TOTAL':>12}: {time.perf_counter()-t_all:15.2f}s", flush=True)


if __name__ == "__main__":
    main()
