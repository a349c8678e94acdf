#!/usr/bin/env python
"""Measured scale-up check for the dedup pipeline (DEPLOY.md evidence).

Runs the RECOMMENDED 100 TB recipe — exact_precluster -> MinHash+LSH on
canonicals -> connected_components over exact+near edges — on the sf0.1
documents corpus at 1x and Nx duplication-inflation (every inflated copy
is an exact duplicate: the worst case for LSH bucket blow-up, and
exactly what exact_precluster exists to absorb). Prints wall seconds per
stage and the scaling ratio; near-linear (<= ~Nx wall for Nx rows) means
no quadratic term survived.

Usage: python scripts/stress_scale.py [mult]   (default 8)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.cache import release_caches  # noqa: E402
from data_governance_spark.functions.text import tokens, word_shingles  # noqa: E402
from data_governance_spark.operators.components import (  # noqa: E402
    connected_components,
    keep_canonical,
)
from data_governance_spark.operators.dedup import (  # noqa: E402
    exact_precluster,
    minhash_dedup_pairs,
)
from data_governance_spark.session import get_spark  # noqa: E402
from data_governance_spark.tables import table  # noqa: E402


def run_pipeline_once(spark, docs):
    t = {}
    t0 = time.perf_counter()
    canonical, mapping = exact_precluster(docs, F.md5("text"))
    canonical = canonical.persist()
    n_canon = canonical.count()
    t["precluster"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    toks = canonical.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= 1
    )
    near = minhash_dedup_pairs(
        toks, F.array_distinct(word_shingles(F.col("toks"), 3)), threshold=0.5
    ).select("doc_a", "doc_b")
    n_near = near.count()
    t["sketch_pairs"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    exact = mapping.filter(F.col("doc_id") != F.col("canon_id")).select(
        F.col("doc_id").alias("doc_a"), F.col("canon_id").alias("doc_b")
    )
    comp = connected_components(
        near.unionByName(exact), "doc_a", "doc_b", nodes=docs, node_col="doc_id"
    )
    survivors = keep_canonical(docs.select("doc_id"), comp)
    n_out = survivors.count()
    t["closure_select"] = time.perf_counter() - t0
    canonical.unpersist()
    return t, n_canon, n_near, n_out


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    if mult < 2:
        sys.exit("mult must be >= 2 (x1 vs x1 is not a scaling measurement)")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dg_stress_scale")
    spark.range(1000).selectExpr("sum(id)").collect()
    base = table(spark, sf, "documents").select("doc_id", "text")

    results = {}
    for m in (1, mult):
        corpus = base
        for i in range(1, m):
            corpus = corpus.unionByName(
                base.select(
                    (F.col("doc_id") + i * 10_000_000).alias("doc_id"), "text"
                )
            )
        corpus = corpus.persist()
        n_rows = corpus.count()
        timings, n_canon, n_near, n_out = run_pipeline_once(spark, corpus)
        corpus.unpersist()
        release_caches()
        total = sum(timings.values())
        results[m] = total
        print(
            f"x{m}: rows={n_rows} canonicals={n_canon} near_pairs={n_near} "
            f"survivors={n_out} wall={total:.1f}s "
            + " ".join(f"{k}={v:.1f}s" for k, v in timings.items())
        )
    ratio = results[mult] / results[1]
    print(f"scaling: x{mult} rows -> x{ratio:.1f} wall "
          f"({'NEAR-LINEAR' if ratio <= mult * 1.3 else 'SUPER-LINEAR: investigate'})")


if __name__ == "__main__":
    main()
