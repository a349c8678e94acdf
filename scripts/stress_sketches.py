#!/usr/bin/env python
"""Measured evidence for the mergeable-sketch tier
(operators/sketches.py):

1. accuracy vs state size on 1M distinct keys — HLL relative error at
   p=10/12/14, KMV at k=1024/4096, KLL max rank error at k=200, MG
   undercount + survival over a zipf stream,
2. the 100 TB money row: sketch distinct-count over a wide corpus on
   local[32] vs exact countDistinct on the same data — wall clock and
   what each one SHUFFLES (KB of sketch states vs a full exchange of
   the keys),
3. grouped KLL median vs an exact sort-based per-group median.

Usage: python scripts/stress_sketches.py [factor]  (default 4)
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.operators.sketches import (  # noqa: E402
    HllSketch,
    KllSketch,
    KmvSketch,
    MgSketch,
    hll_build,
    kll_grouped_quantile,
    kmv_build,
)
from data_governance_spark.session import get_spark  # noqa: E402


def phase1_accuracy() -> None:
    print("phase 1: accuracy vs state bytes (1M distinct / 1M values)")
    rng = np.random.default_rng(7)
    # full-range uniform 64-bit "hashes" (int64 bit-reinterpreted) —
    # the sketches' accuracy contract assumes the input is a uniform
    # hash; a half-range draw here would empty half the HLL buckets
    # and double the KMV threshold (caught by this script's first run)
    h = np.unique(
        rng.integers(
            -(1 << 63), 1 << 63, size=1_000_000, dtype=np.int64
        ).astype(np.uint64)
    )
    n = len(h)
    for p in (10, 12, 14):
        errs = []
        t0 = time.time()
        for seed in range(4):
            hs = np.unique(
                np.random.default_rng(seed)
                .integers(-(1 << 63), 1 << 63, size=n, dtype=np.int64)
                .astype(np.uint64)
            )
            sk = HllSketch(p).add_hashes(hs)
            errs.append(abs(sk.estimate() - len(hs)) / len(hs))
        w = time.time() - t0
        print(
            f"  hll p={p}: {len(sk.to_bytes())} B, rel err over 4 seeds "
            f"mean {np.mean(errs) * 100:.2f}% max {max(errs) * 100:.2f}% "
            f"(1-sigma {104 / math.sqrt(1 << p):.2f}%), "
            f"{4 * n / w / 1e6:.1f}M keys/s/core incl. keygen"
        )
    for k in (1024, 4096):
        sk = KmvSketch(k).add_hashes(h)
        est = sk.estimate()
        print(
            f"  kmv k={k}: {len(sk.to_bytes())} B, "
            f"rel err {abs(est - n) / n * 100:.2f}%"
        )
    vals = rng.normal(size=1_000_000)
    t0 = time.time()
    kll = KllSketch(200).update_many(vals)
    build_s = time.time() - t0
    sv = np.sort(vals)
    worst = max(
        abs(np.searchsorted(sv, kll.quantile(float(q)), side="right") / 1e6 - q)
        for q in np.linspace(0.01, 0.99, 25)
    )
    print(
        f"  kll k=200: {len(kll.to_bytes())} B, max rank err "
        f"{worst * 100:.2f}% over 25 quantiles, "
        f"{1.0 / build_s:.1f}M vals/s/core"
    )
    zipf = rng.zipf(1.2, size=1_000_000)
    zipf = zipf[zipf < 100_000].astype(str)
    true: dict = {}
    for s in zipf:
        true[s] = true.get(s, 0) + 1
    mg = MgSketch(64)
    for chunk in np.array_split(zipf, 16):
        c: dict = {}
        for s in chunk:
            c[s] = c.get(s, 0) + 1
        mg = mg.merge(MgSketch(64).add_counts(c))
    bound = mg.error_bound()
    viol = sum(
        1
        for key, est in mg.counters.items()
        if not est <= true[key] <= est + bound
    )
    missed = sum(
        1 for key, cnt in true.items() if cnt > bound and key not in mg.counters
    )
    print(
        f"  mg k=64 over {len(zipf)} zipf draws: bound {bound:.0f}, "
        f"bound violations {viol}, survivors missed {missed} "
        f"(both must be 0)"
    )


def phase2_distributed(spark, factor: int) -> None:
    n = 2_000_000 * factor
    print(f"phase 2: distinct-count at n={n / 1e6:.0f}M on local[32]")
    # ~50% duplicate rate over URL-shaped 60+-char keys: the exact
    # plan's partial-distinct must hold and exchange the WIDE keys,
    # the sketch pass exchanges nothing and collects ~16 KB states
    df = spark.range(n).select(
        F.concat(
            F.lit("https://example.com/site/"),
            F.md5((F.col("id") % (n // 2)).cast("string")),
            F.lit("/index.html"),
        ).alias("k")
    ).persist()
    df.count()
    t0 = time.time()
    sk = hll_build(df, "k", p=14)
    hll_s = time.time() - t0
    t0 = time.time()
    kmv = kmv_build(df, "k", k=4096)
    kmv_s = time.time() - t0
    t0 = time.time()
    exact = df.select(F.countDistinct("k")).collect()[0][0]
    exact_s = time.time() - t0
    print(
        f"  exact countDistinct: {exact_s:.1f}s (exchanges the "
        f"{n // 2:,} distinct ~62-char keys)"
    )
    print(
        f"  hll p=14 ({len(sk.to_bytes())} B/partition state): {hll_s:.1f}s, "
        f"est {sk.estimate():,.0f} vs {exact:,} "
        f"({abs(sk.estimate() - exact) / exact * 100:.2f}% err)"
    )
    print(
        f"  kmv k=4096: {kmv_s:.1f}s, est {kmv.estimate():,.0f} "
        f"({abs(kmv.estimate() - exact) / exact * 100:.2f}% err)"
    )
    df.unpersist()


def phase3_grouped(spark, factor: int) -> None:
    n = 1_000_000 * factor
    print(f"phase 3: grouped median at n={n / 1e6:.0f}M, 40 groups")
    df = spark.range(n).select(
        (F.col("id") % 40).cast("string").alias("g"),
        F.pmod(F.xxhash64("id"), F.lit(100000)).cast("double").alias("v"),
    ).persist()
    df.count()
    t0 = time.time()
    got = kll_grouped_quantile(df, "g", "v", 0.5, k=1000)
    got_rows = got.collect()
    sk_s = time.time() - t0
    # honest framing: percentile_approx ALSO merges partial state
    # map-side (it never shuffles rows); the KLL advantage is the
    # REUSABLE mergeable artifact (persist, merge across days, query
    # any quantile later), so compare at matched accuracy parameter.
    # The shuffles-rows baseline is exact percentile() (full sort).
    t0 = time.time()
    pa_rows = (
        df.groupBy("g")
        .agg(F.expr("percentile_approx(v, 0.5, 1000)").alias("q"))
        .collect()
    )
    pa_s = time.time() - t0
    t0 = time.time()
    df.groupBy("g").agg(F.expr("percentile(v, 0.5)").alias("q")).collect()
    ex_s = time.time() - t0

    def worst_rank_err(rows) -> float:
        # true rank of each returned value, via one broadcast join:
        # |P(v <= q) - 0.5| per group
        qdf = spark.createDataFrame(
            [(r[0], float(r[1])) for r in rows], "g string, q double"
        )
        r = (
            df.join(F.broadcast(qdf), "g")
            .groupBy("g")
            .agg(F.avg((F.col("v") <= F.col("q")).cast("double")).alias("r"))
            .collect()
        )
        return max(abs(x["r"] - 0.5) for x in r)

    print(
        f"  kll_grouped k=1000 (persistable artifact): {sk_s:.1f}s, "
        f"max true rank err {worst_rank_err(got_rows) * 100:.3f}%; "
        f"percentile_approx acc=1000 (one-shot agg): {pa_s:.1f}s, "
        f"max true rank err {worst_rank_err(pa_rows) * 100:.3f}%; "
        f"exact percentile (full sort per group): {ex_s:.1f}s"
    )
    df.unpersist()


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    phase1_accuracy()
    spark = get_spark("stress_sketches", shuffle_partitions=32)
    t0 = time.time()
    phase2_distributed(spark, factor)
    phase3_grouped(spark, factor)
    print(f"total spark wall: {time.time() - t0:.1f}s (factor {factor})")


if __name__ == "__main__":
    main()
