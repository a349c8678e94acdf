#!/usr/bin/env python
"""dedup_media_near under a pathological single-block corpus
(DEPLOY.md evidence, r8).

Every payload byte-identical -> every feature vector identical -> ALL
rows land in ONE hyperplane-LSH block, the worst case for within-block
cosine: n(n-1)/2 pairs. This script shows the ``max_block_size`` guard
is the difference between bounded work and the quadratic cliff:

1. capped run (max_block_size=64): the oversized block is DROPPED
   (explicit accuracy/cost opt-in per the operator contract) — zero
   pairs, linear wall;
2. uncapped run at the same n: the honest quadratic cost, measured;
3. a mixed corpus (identical class + unique rows) capped: unique
   rows' small blocks still dedup while the mega-block is excluded.

Usage: python scripts/stress_media_neardup.py [n]   (default 3000)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.operators.multimodal import (  # noqa: E402
    dedup_media_near,
)
from data_governance_spark.session import get_spark  # noqa: E402


def media_df(spark, n, identical=True):
    ids = spark.range(n).select(F.col("id").alias("media_id"))
    content = (
        F.encode(F.lit("same-bytes-everywhere"), "UTF-8")
        if identical
        else F.encode(F.concat(F.lit("u"), F.col("media_id")), "UTF-8")
    )
    return ids.select(
        "media_id",
        F.lit("image").alias("kind"),
        content.alias("content"),
    )


def timed(label, df):
    t0 = time.time()
    n = df.count()
    print(f"{label}: {n} pairs in {time.time() - t0:.1f}s")
    return n


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    spark = get_spark("stress_media_neardup")

    mono = media_df(spark, n, identical=True).cache()
    mono.count()
    capped = timed(
        f"capped (n={n}, max_block_size=64)",
        dedup_media_near(mono, max_block_size=64),
    )
    assert capped == 0, "oversized block must be dropped, not enumerated"
    uncapped = timed(
        f"uncapped (n={n})", dedup_media_near(mono)
    )
    assert uncapped == n * (n - 1) // 2, "uncapped must be exact all-pairs"

    # mixed corpus: the guard must be surgical — only the mega-block
    # drops; a duplicated SMALL class in a DIFFERENT block still pairs
    # up. Block separation is forced through the features= reuse hook:
    # the fake decoder's byte-histogram features are all-positive (any
    # two text payloads share most hyperplane signs — measured: both
    # classes landed in one block), so the small class gets an
    # all-NEGATIVE vector, which flips every sign bit.
    v_pos = [1.0, 0.5, 0.25, 0.5, 1.0, 0.25, 0.5, 1.0]
    v_neg = [-x for x in v_pos]
    feats = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.array(*[F.lit(x) for x in v_pos]).alias("feature"),
    ).unionByName(
        spark.range(10).select(
            (F.col("id") + 1_000_000).alias("media_id"),
            F.array(*[F.lit(x) for x in v_neg]).alias("feature"),
        )
    )
    got = timed(
        f"mixed capped (n={n}+10, max_block_size=64)",
        dedup_media_near(mono, max_block_size=64, features=feats),
    )
    assert got == 10 * 9 // 2, f"small class should yield 45 pairs, got {got}"
    print("PASS: max_block_size bounds the quadratic block surgically")


if __name__ == "__main__":
    main()
