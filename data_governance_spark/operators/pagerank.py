"""PageRank over a link graph — the classic link-quality signal for
web-corpus curation (domain/page rank as a training-data quality
weight, the signal the Common Crawl ranking releases publish).

Spark-first shape: the graph stays a DataFrame of edges; each
iteration is ONE join (ranks onto pre-weighted edges) + ONE hash
aggregate (contributions by destination) + one broadcast-joined
rebuild — the same plan GraphX's Pregel lowers to, with Catalyst/AQE
picking the physical strategy.  Nothing driver-side except the
dangling-mass scalar (one 1-row aggregate per iteration — the
standard redistribution needs a global number, and one tiny action
per iteration is the honest cost; Google's formulation, Brin & Page
1998).

Semantics (all stated, all mirrored analytically by the d10 'pr'
oracle's unrolled-CTE restatement):

- ranks start uniform 1/N over the node set (``nodes`` ∪ edge
  endpoints);
- parallel edges collapse (contributions are per DISTINCT edge,
  out-degree counts distinct destinations);
- dangling nodes (no out-edges) redistribute their mass uniformly, so
  total rank stays exactly 1.0 every iteration (asserted in tests);
- fixed ``iterations``, or early-stop when the max per-node delta
  falls under ``tol``.

Scale posture: per-iteration lineage is cut with ``localCheckpoint``
every ``checkpoint_every`` iterations (iterative plans otherwise grow
unboundedly and re-optimize from scratch); the contribution aggregate
shuffles on ``dst`` — for a fixed graph iterated many times,
pre-partition the edge relation on ``dst`` once so every iteration's
Exchange reuses the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 20,
    tol: float | None = None,
    nodes: DataFrame | None = None,
    node_col: str = "id",
    checkpoint_every: int = 8,
    info: dict | None = None,
) -> DataFrame:
    """``(id, rank)`` for every node; ranks sum to 1.

    The returned DataFrame is persisted (StorageLevel MEMORY_AND_DISK
    via ``persist``/``localCheckpoint``) — iterating without caching
    the final state would replay the whole chain on first use.  THE
    CALLER OWNS ``result.unpersist()`` once done with it; long-lived
    sessions that drop the reference without unpersisting leak
    executor cache (r12 ADVICE).

    ``info``: optional caller-supplied dict, filled with
    ``iterations`` (actually run) and ``final_delta`` (last measured
    max per-node change; None unless ``tol`` is set) — the numbers a
    tol-mode caller wants for logging without re-deriving them."""
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    node_ids = e.select(F.col("src").alias("id")).unionByName(
        e.select(F.col("dst").alias("id"))
    )
    if nodes is not None:
        node_ids = node_ids.unionByName(
            nodes.select(F.col(node_col).alias("id"))
        )
    node_ids = node_ids.distinct().persist()
    n = node_ids.count()
    if n == 0:
        empty = node_ids.withColumn("rank", F.lit(0.0)).localCheckpoint()
        node_ids.unpersist()  # zero rows: nothing worth caching
        return empty
    # pre-weight edges once: contribution share = 1/outdeg(src)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    weighted = (
        e.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("_deg")).alias("w"))
        .persist()
    )
    base = (1.0 - damping) / n
    done = 0
    last_delta: float | None = None
    ranks = node_ids.withColumn("rank", F.lit(1.0 / n)).persist()
    # persisted: the dangling-mass left-anti join probes this EVERY
    # iteration — unpersisted it would recompute edges.distinct() +
    # the degree aggregate each time (r12 ADVICE)
    srcs = deg.select(F.col("src").alias("id")).persist()

    def _dangling(r: DataFrame) -> float:
        # ONE job doing double duty (r14, guide §2.6): the left-anti
        # probe scans every partition of the freshly-persisted rank
        # state — materializing its cache — while computing the
        # dangling mass the NEXT rebuild needs. Before r14 these were
        # two jobs per iteration (a materializing count, then this
        # collect at the top of the next loop body).
        return (
            r.join(srcs, "id", "left_anti").agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )

    dangling = _dangling(ranks)
    for it in range(iterations):
        contribs = (
            weighted.join(ranks, weighted["src"] == ranks["id"])
            .select(F.col("dst").alias("id"),
                    (F.col("rank") * F.col("w")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("_in"))
        )
        new_ranks = (
            node_ids.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0))
                       + F.lit(dangling / n))
                ).alias("rank"),
            )
            .persist()
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            pre = new_ranks
            new_ranks = pre.localCheckpoint(eager=True)
            pre.unpersist()  # the checkpoint holds the data now
        # materialize BEFORE the parent's cache drops — otherwise every
        # iteration would replay the whole chain back to the last
        # checkpoint (O(iterations^2) work, review-caught). The
        # materializing action IS the next iteration's dangling-mass
        # aggregate (see _dangling).
        dangling = _dangling(new_ranks)
        done = it + 1
        if tol is not None:
            delta = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "id")
                .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))))
                .collect()[0][0]
            )
            last_delta = delta
            ranks.unpersist()
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks.unpersist()
            ranks = new_ranks
    if info is not None:
        info["iterations"] = done
        info["final_delta"] = last_delta
    weighted.unpersist()
    srcs.unpersist()
    node_ids.unpersist()
    return ranks
