"""Distributed connected components over a pair/edge DataFrame.

The missing link in a dedup pipeline between *pair generation* (exact
fingerprints d03/d04, n-gram Jaccard d06, MinHash/SimHash e03/e04,
embedding-cosine e07) and *canonical-document selection*: near-dup
pairs form a graph, and the keep-one-per-cluster decision needs the
transitive closure of that graph, not the raw pairs.  ``d09`` handles
the exact-fingerprint special case (closure == groupBy fingerprint);
this operator handles the general near-dup graph, where A~B and B~C do
NOT share a key.

Algorithm: min-label propagation.  Every node starts labeled with its
own id; each round every node takes the min label over itself and its
neighbors; fixed point == every node carries the min id of its
component.  Each round is one shuffle join (labels x edges) plus one
shuffle agg (min per node) — all DataFrame ops, no driver-side graph.

Scale posture (100 TB):
- Rounds needed = graph diameter.  Near-dup graphs are clique-ish
  (duplicate clusters pairwise-similar), so diameter is typically 1-3
  and the loop exits after diameter+1 rounds.  For adversarial
  long-chain graphs the alternating large-star/small-star algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14) converges in O(log n) rounds with the same join+agg round
  primitive; the round body below is where it would slot in.
- The symmetrized edge list is persisted once and reused every round.
- Per-round lineage is truncated with ``localCheckpoint`` — without it
  the plan doubles every iteration and Catalyst analysis, not the
  data, becomes the bottleneck.  On a production cluster with flaky
  executors, swap for reliable ``checkpoint`` against the cluster FS.
- Convergence is detected with a count of improved labels (one extra
  action per round on the already-computed round result; the join is
  not recomputed because the round result is persisted before both
  consumers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str | Column,
    dst: str | Column,
    nodes: DataFrame | None = None,
    node_col: str | Column | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Return ``(id, component)``: each node labeled with the minimum
    node id reachable from it (undirected).  ``edges`` rows with a NULL
    endpoint are ignored.

    ``nodes``/``node_col`` optionally supply the full node universe so
    isolated nodes (no edges) appear as their own singleton component;
    without it the output covers only nodes present in ``edges``.

    Node ids may be any orderable type (numeric, string); "min" is the
    natural Spark ordering, which matches DuckDB's for integers and
    plain ASCII strings (the oracle-comparison contract).
    """
    e = edges.select(
        F.col(src).alias("s") if isinstance(src, str) else src.alias("s"),
        F.col(dst).alias("d") if isinstance(dst, str) else dst.alias("d"),
    ).filter(F.col("s").isNotNull() & F.col("d").isNotNull())
    # symmetrize + dedup once; reused every round
    e = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    e = e.persist()

    universe = e.select(F.col("s").alias("id"))
    if nodes is not None:
        nc = node_col if node_col is not None else nodes.columns[0]
        universe = universe.union(
            nodes.select(
                (F.col(nc) if isinstance(nc, str) else nc).alias("id")
            ).filter(F.col("id").isNotNull())
        )
    labels = universe.distinct().withColumn("comp", F.col("id"))

    # try/finally: a failed round (executor loss, task failure past
    # retries) must not leak the cached edge list — this persist is
    # module-local, so the registry's release_caches can't reclaim it
    try:
        labels = labels.localCheckpoint()
        for _ in range(max_iter):
            # min label over each node's neighborhood this round
            upd = (
                labels.join(e, labels["id"] == e["s"])
                .groupBy(F.col("d").alias("id"))
                .agg(F.min("comp").alias("ncomp"))
            )
            joined = labels.join(upd, "id", "left").select(
                "id",
                "comp",
                F.least(F.col("comp"), F.col("ncomp")).alias("new_comp"),
            )
            # localCheckpoint is eager: one computation serves both the
            # convergence count and next round's labels
            joined = joined.localCheckpoint()
            changed = joined.filter(F.col("new_comp") != F.col("comp")).count()
            labels = joined.select("id", F.col("new_comp").alias("comp"))
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds; "
                "for high-diameter graphs use large-star/small-star"
            )
    finally:
        e.unpersist()
    return labels


def keep_canonical(
    docs: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    order_by: list[Column] | None = None,
) -> DataFrame:
    """The last step of the dedup pipeline: one representative row per
    component. ``labels`` is ``connected_components`` output
    (id, comp); ``order_by`` ranks candidates within a component (e.g.
    ``[F.desc("quality"), F.col("doc_id")]`` = keep the highest-quality
    doc, ties to the smallest id) — default: smallest id wins, which
    makes the representative the component label itself.

    One shuffle on the component key (window rank); docs without a
    label row pass through as their own singleton representative, so
    composing with a pair generator that only labels paired docs is
    safe."""
    from pyspark.sql import Window

    # internal names: docs is arbitrary caller data and may itself carry
    # a 'comp' column (e.g. a prior closure's output) — joining labels'
    # raw 'comp' in would be an ambiguous reference or clobber it
    joined = docs.join(
        labels.select(F.col("id").alias(id_col), F.col("comp").alias("_cc_comp")),
        id_col,
        "left",
    ).withColumn("_cc_key", F.coalesce(F.col("_cc_comp"), F.col(id_col)))
    order = order_by if order_by is not None else [F.col(id_col)]
    w = Window.partitionBy("_cc_key").orderBy(*order)
    return (
        joined.withColumn("_cc_rn", F.row_number().over(w))
        .filter(F.col("_cc_rn") == 1)
        .drop("_cc_rn", "_cc_key", "_cc_comp")
    )
