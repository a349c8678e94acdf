#!/usr/bin/env python
"""Kneser-Ney scoring throughput (DEPLOY.md evidence, r10; the r9
verdict's watch item): the per-token KN recursion runs in Python
inside the Arrow batch — map-only and shuffle-free, so it parallelizes
linearly, but it is the slowest per-token path in the repo and owed a
NUMBER before any vectorization is considered.

Trains a realistic LM (order 3 and 5, capped tables) on the sf
documents table itself, then scores the corpus duplicated x``FACTOR``
(scoring is per-doc independent — duplication only scales volume) and
reports tokens/second plus the x1 -> xFACTOR wall ratio (linear
scaling evidence) and the train wall per order.

Usage: python scripts/stress_ngram_lm.py [factor]   (default 32)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_LM_MAX_NGRAMS (default 200000)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.functions.text import tokens  # noqa: E402
from data_governance_spark.operators.ngram_lm import (  # noqa: E402
    perplexity,
    train_ngram_lm,
)
from data_governance_spark.session import get_spark  # noqa: E402
from data_governance_spark.tables import table  # noqa: E402


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    max_ngrams = int(os.environ.get("SPARK_GRAFT_LM_MAX_NGRAMS", "200000"))
    spark = get_spark("stress_ngram_lm")

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    n_tokens = docs.select(F.sum(F.size(tokens("text")))).collect()[0][0]
    print(f"reference: {n_docs} docs, {n_tokens} tokens")

    for order in (3, 5):
        t0 = time.time()
        lm = train_ngram_lm(
            docs, order=order, max_ngrams=max_ngrams
        )
        t_train = time.time() - t0
        sizes = [len(t) for t in lm.num]
        print(
            f"order {order}: train {t_train:.1f}s; num tables {sizes}, "
            f"vocab {lm.vocab}"
        )
        spark.catalog.clearCache()  # the per-order gram persists

        walls = {}
        for fac in (1, factor):
            copies = spark.range(fac).select(F.col("id").alias("c"))
            # repartition: the local one-split parquet crossJoin would
            # score the whole corpus in ONE Arrow task (clusters get
            # the spread from their input splits)
            corpus = docs.crossJoin(copies).select(
                (F.col("doc_id") + F.col("c") * n_docs * 10).alias(
                    "doc_id"
                ),
                "text",
            ).repartition(32)
            t0 = time.time()
            row = (
                perplexity(corpus, lm)
                .select(
                    F.count("perplexity").alias("n"),
                    F.avg("perplexity").alias("avg"),
                )
                .collect()[0]
            )
            wall = time.time() - t0
            walls[fac] = wall
            toks = n_tokens * fac
            print(
                f"order {order} x{fac}: scored {row['n']} docs "
                f"(avg ppl {row['avg']:.1f}) in {wall:.1f}s = "
                f"{toks / wall / 1e3:.0f}k tokens/s"
            )
        print(
            f"order {order}: x{factor} wall ratio "
            f"{walls[factor] / walls[1]:.2f}x over {factor}x data"
        )


if __name__ == "__main__":
    main()
