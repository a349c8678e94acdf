#!/usr/bin/env python
"""Duplication-scaling stress for DSIR importance scoring + selection
(DEPLOY.md evidence, r7).

Inflates the corpus with id-shifted exact copies and measures the full
chain — one-scan fit (fit_log_ratios_split), map-only integer-fold
scoring, TakeOrdered selection — at 1x and Nx. Duplication scales
every bucket count by N, which cancels in the probability ratio up to
the fixed Laplace alpha, so ratios/scores agree to ~1e-6 (reported as
measured drift) and the selection overlap should be ~complete; the
wall should scale sub-linearly (the fit's shuffle carries only
per-bucket partial counts; the scoring is pure scan work).

Usage: python scripts/stress_dsir.py [mult]   (default 32)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.operators.dsir import (  # noqa: E402
    fit_log_ratios_split,
    importance_scores,
    select_top_k,
)
from data_governance_spark.session import get_spark  # noqa: E402
from data_governance_spark.tables import table  # noqa: E402


def run(docs, n_buckets=256):
    t0 = time.time()
    lr = fit_log_ratios_split(
        docs, F.col("lang") == "en", n_buckets=n_buckets
    )
    t_fit = time.time() - t0
    t0 = time.time()
    scored = importance_scores(docs, lr)
    # force full evaluation without driver materialization
    agg = scored.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dsir_score").alias("s")
    ).first()
    t_score = time.time() - t0
    t0 = time.time()
    top = select_top_k(scored, 100)
    top_rows = top.select("doc_id", "dsir_score").collect()
    t_top = time.time() - t0
    return lr, agg, top_rows, (t_fit, t_score, t_top)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dg_stress_dsir")
    spark.range(1000).selectExpr("sum(id)").collect()

    base = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).repartition(32)
    n0 = base.count()
    shift = 10 ** len(str(n0 * mult))
    lr1, agg1, top1, t1 = run(base)
    print(
        f"x1  ({agg1['n']} rows): fit {t1[0]:.1f}s score {t1[1]:.1f}s "
        f"top {t1[2]:.1f}s  sum={agg1['s']:.3f}"
    )

    big = base
    for i in range(1, mult):
        big = big.unionByName(
            base.select(
                (F.col("doc_id") + i * shift).alias("doc_id"),
                "lang",
                "text",
            )
        )
    big = big.repartition(64).persist()
    big.count()
    lrN, aggN, topN, tN = run(big)
    print(
        f"x{mult} ({aggN['n']} rows): fit {tN[0]:.1f}s score {tN[1]:.1f}s "
        f"top {tN[2]:.1f}s  sum={aggN['s']:.3f}"
    )

    # copies scale every bucket count by mult, which cancels in the
    # probability RATIO up to the fixed Laplace alpha — so ratios (and
    # scores) agree to ~alpha/total ≈ 1e-6, not bit-for-bit; report
    # the actual drift
    lr_drift = max(abs(a - b) for a, b in zip(lr1, lrN))
    score1 = {r["doc_id"]: r["dsir_score"] for r in top1}
    scoreN = {r["doc_id"] % shift: r["dsir_score"] for r in topN}
    s_drift = max(
        (abs(score1[d] - s) for d, s in scoreN.items() if d in score1),
        default=float("nan"),
    )
    # the xN top-100 is (by construction) mult copies of the x1 top
    # few — the meaningful check is that its DISTINCT originals are a
    # prefix of the x1 ranking (up to smoothing drift at ties)
    import math

    want = math.ceil(100 / mult)
    top1_ranked = [r["doc_id"] for r in top1]
    distinct_n = sorted(
        set(scoreN), key=lambda d: (-scoreN[d], d)
    )
    prefix_ok = set(distinct_n) <= set(top1_ranked[: want + 2])
    print(
        f"max lr drift {lr_drift:.2e} (Laplace alpha, expected ~1/t_min); "
        f"xN top-100 = {len(distinct_n)} distinct originals "
        f"(expect ~{want}), prefix-of-x1-ranking: {prefix_ok}; "
        f"max score drift {s_drift:.2e}; wall ratio "
        f"{sum(tN) / max(sum(t1), 1e-9):.2f}x for {mult}x rows"
    )
    big.unpersist()


if __name__ == "__main__":
    main()
