#!/usr/bin/env python
"""Duplication-scaling stress for the WHOLE prepare_corpus pipeline
(DEPLOY.md evidence, VERDICT r5 #6).

scripts/stress_scale.py measures the dedup core; this runs the one-call
public pipeline — quality filter -> PII redaction (2 passes) -> exact
precluster -> MinHash -> component closure -> canonical -> hash split ->
sequence packing — at 1x and Nx exact-duplication inflation (LSH's worst
case) and reports the wall-clock scaling ratio. Near-linear means no
stage re-introduced a quadratic term on mass-duplicated input.

Measured r6 (sf0.1, local[32]):
    x1  (5 000 rows):   14.6 s  packed=2573
    x32 (160 000 rows): 29.0 s  packed=2573
2.0x wall for 32x rows, survivor set and pack layout bit-identical at
both scales (supersedes the r5 scripts/corpus_scale.py one-off, whose
1/8/32 curve showed the same 2x-at-32x shape). DEPLOY.md cites these.

Usage: python scripts/stress_corpus.py [mult]   (default 32)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.corpus import prepare_corpus  # noqa: E402
from data_governance_spark.session import get_spark  # noqa: E402
from data_governance_spark.tables import table  # noqa: E402


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    if mult < 2:
        sys.exit("mult must be >= 2")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dg_stress_corpus")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up
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
        t0 = time.perf_counter()
        res = prepare_corpus(corpus)  # defaults: Gopher rules, pii passes=2
        n_packed = res.packed.count()
        wall = time.perf_counter() - t0
        res.release()
        corpus.unpersist()
        results[m] = wall
        print(
            f"x{m}: rows={n_rows} packed={n_packed} wall={wall:.1f}s",
            flush=True,
        )
    ratio = results[mult] / results[1]
    verdict = "NEAR-LINEAR" if ratio <= mult * 1.3 else "SUPER-LINEAR: investigate"
    print(f"scaling: x{mult} rows -> x{ratio:.1f} wall ({verdict})")


if __name__ == "__main__":
    main()
