#!/usr/bin/env python
"""PageRank scale evidence (DEPLOY.md, r12): per-iteration wall on a
million-node synthetic link graph, mass conservation, and the
convergence profile — the numbers behind the d10 'pr' gate's 15k-node
toy.

Usage: python scripts/stress_pagerank.py [nodes] [edges_per_node]
       (default 1,000,000 nodes x 3)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.operators.pagerank import pagerank  # noqa: E402
from data_governance_spark.session import get_spark  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    epn = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("stress_pagerank")
    # xxhash-scrambled destinations: a heavy-tailed-ish random graph;
    # every 13th node emits nothing (dangling)
    src = spark.range(n).filter(F.col("id") % 13 != 0)
    edges = None
    for i in range(epn):
        e = src.select(
            F.col("id").alias("src"),
            F.pmod(F.xxhash64("id", F.lit(i)), F.lit(n)).alias("dst"),
        )
        edges = e if edges is None else edges.unionByName(e)
    nodes = spark.range(n).select(F.col("id"))

    t0 = time.time()
    ranks = pagerank(edges, iterations=5, nodes=nodes, checkpoint_every=4)
    wall = time.time() - t0
    stats = ranks.agg(
        F.sum("rank").alias("mass"),
        F.max("rank").alias("mx"),
        F.count("*").alias("n"),
    ).collect()[0]
    print(
        f"pagerank: {n:,} nodes x {epn} edges/node, 5 iterations in "
        f"{wall:.1f}s = {wall / 5:.1f}s/iter; mass={stats['mass']:.9f} "
        f"(must be 1.0), max rank={stats['mx']:.2e}, rows={stats['n']:,}"
    )

    # convergence profile: max delta between 5 and 10 iterations
    t0 = time.time()
    r10 = pagerank(edges, iterations=10, nodes=nodes, checkpoint_every=4)
    wall10 = time.time() - t0
    delta = (
        ranks.alias("a")
        .join(r10.alias("b"), "id")
        .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))))
        .collect()[0][0]
    )
    print(
        f"iter 5 vs 10: max per-node delta {delta:.2e} "
        f"(10 iters in {wall10:.1f}s vs 5 in {wall:.1f}s — per-iter "
        f"cost grows BETWEEN checkpoints as lineage deepens; lower "
        f"checkpoint_every if the later iterations dominate)"
    )
    ranks.unpersist()
    r10.unpersist()

    # tol mode (r12 judge ask): the measured early-stop payoff —
    # tol=1e-6 with a generous iteration budget, recording where it
    # actually stops and what that costs vs the fixed budgets above.
    # The per-iteration delta check adds one join + 1-row agg, so a
    # tol iteration costs MORE than a fixed one; the win is stopping
    # iterations early on real (fast-converging) graphs.
    t0 = time.time()
    tinfo: dict = {}
    rt = pagerank(edges, iterations=30, tol=1e-6, nodes=nodes,
                  checkpoint_every=4, info=tinfo)
    wall_t = time.time() - t0
    dt = (
        rt.alias("a")
        .join(r10.alias("b"), "id")
        .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))))
        .collect()[0][0]
    )
    print(
        f"tol=1e-6 (30-iter budget): stopped at iteration "
        f"{tinfo['iterations']} (final delta {tinfo['final_delta']:.2e})"
        f" in {wall_t:.1f}s vs fixed-10 {wall10:.1f}s; max delta vs "
        f"fixed-10 ranks {dt:.2e} — tol converts the convergence "
        f"profile above into an automatic stop instead of a guessed "
        f"budget"
    )
    rt.unpersist()


if __name__ == "__main__":
    main()