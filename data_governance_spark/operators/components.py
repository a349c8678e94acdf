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
  SoCC'14) converges in O(log^2 n) rounds (O(log n) in practice) with
  the same join+agg round primitive — implemented in
  ``_star_components`` and entered automatically when min-label hits
  ``max_iter`` without converging (``algorithm="auto"``), so
  high-diameter graphs degrade to the logarithmic path instead of
  raising.
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


def _star_components(pairs: DataFrame, max_rounds: int = 100) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
    public algorithm, original implementation): the O(log^2 n)-round
    fallback for graphs whose diameter exceeds what min-label
    propagation can walk.

    ``pairs`` must be a CANONICAL undirected edge list: distinct rows
    ``(s, d)`` with ``s < d``, no nulls, no self-loops.  Each round is
    two (groupBy-min + equi-join) passes:

    - large-star: for every node u with neighborhood N(u), connect each
      strictly-larger neighbor v > u to m(u) = min(N(u) ∪ {u}).
      Emitted edges (m, v) keep m < v, so the output is canonical by
      construction.
    - small-star: for every node u, connect each smaller neighbor and u
      itself to m⁻(u) = min over the smaller neighbors.  On canonical
      pairs the smaller-neighborhood of ``d`` is exactly its ``s``
      values, so this is one groupBy(d).min(s) + join.

    Both steps preserve connectivity and never raise a node's minimum
    reachable id; the fixpoint is a star forest — every component's
    nodes all directly linked to the component's min node — from which
    labels read off without iteration.  Returns ``(id, comp)`` for
    every node appearing in ``pairs``.
    """
    pairs = pairs.localCheckpoint()
    n_prev = pairs.count()
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    for _ in range(max_rounds):
        # ---- large-star: m(u) over the full (symmetric) neighborhood
        sym = pairs.union(
            pairs.select(F.col("d").alias("s"), F.col("s").alias("d"))
        )
        m = (
            sym.groupBy("s")
            .agg(F.min("d").alias("_mn"))
            .select("s", F.least(F.col("_mn"), F.col("s")).alias("m"))
        )
        large = (
            sym.filter(F.col("d") > F.col("s"))
            .join(m, "s")
            .select(F.col("m").alias("s"), F.col("d").alias("d"))
            .distinct()
        )  # m <= s < d, so s < d holds and no self-loops arise
        # ---- small-star: m⁻(u) over the smaller neighborhood (= the
        # s side of canonical pairs grouped by d)
        mn = large.groupBy("d").agg(F.min("s").alias("m"))
        new_pairs = (
            large.join(mn, "d")
            .select(F.col("m").alias("s"), F.col("s").alias("d"))
            .filter(F.col("s") != F.col("d"))
            .union(mn.select(F.col("m").alias("s"), F.col("d").alias("d")))
            .distinct()
            .localCheckpoint()  # eager: truncates lineage per round
        )
        n_new = new_pairs.count()
        changed = (
            n_new != n_prev
            or new_pairs.exceptAll(pairs).limit(1).count() > 0
        )
        pairs, n_prev = new_pairs, n_new
        if not changed:
            break
    else:
        raise RuntimeError(
            f"star algorithm did not converge in {max_rounds} rounds. "
            "Observed behavior is ~2 log2(n) rounds (the proven worst "
            "case is O(log^2 n), which can exceed this default on "
            "enormous adversarial graphs) — raise star_max_rounds on "
            "connected_components, or check whether the edge input is "
            "nondeterministic across re-evaluations"
        )
    # star forest: every hi node has exactly one lo neighbor = its root
    return pairs.select(
        F.col("d").alias("id"), F.col("s").alias("comp")
    ).union(
        pairs.select(F.col("s").alias("id"), F.col("s").alias("comp"))
    ).distinct()


def connected_components(
    edges: DataFrame,
    src: str | Column,
    dst: str | Column,
    nodes: DataFrame | None = None,
    node_col: str | Column | None = None,
    max_iter: int = 25,
    algorithm: str = "auto",
    star_max_rounds: int = 100,
    small_graph_threshold: int = 100_000,
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

    ``algorithm``: ``"auto"`` (default) runs min-label propagation —
    one cheap round per diameter step, ideal for the clique-ish graphs
    dedup produces — and switches to the O(log^2 n) alternating
    large-star/small-star algorithm if ``max_iter`` rounds don't
    converge (a high-diameter graph); ``"star"`` goes straight to the
    star algorithm; ``"label"`` restores the raise-on-non-convergence
    behavior for callers that would rather fail than pay the fallback.
    ``star_max_rounds`` bounds the star loop (default 100 ≈ far beyond
    the ~2 log2(n) rounds observed in practice; raise it for enormous
    adversarial graphs where the O(log^2 n) worst case could bite).

    ``small_graph_threshold``: when the (symmetrized, deduped) edge
    count — known exactly from the eager cache materialization this
    operator performs anyway — is at or below this, the closure runs
    as driver-side union-find over the collected edge list instead of
    iterative Spark rounds.  Rationale: each distributed round is
    2 jobs (eager checkpoint + convergence count) whose scheduling
    overhead dwarfs the work for chart-sized graphs (measured: ~8 s
    for a 1 449-edge closure at sf0.1); a 100k-edge collect is a few
    MB — the same chart-sized-materialization budget as the B-row
    DSIR fit.  The NODE universe never leaves the cluster: singleton
    labeling broadcasts the small component map against it.  Identical
    output (min-reachable-id labels; differentially tested both
    paths).  Set 0 to force the distributed path at any size.
    """
    if algorithm not in ("auto", "label", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    e = edges.select(
        F.col(src).alias("s") if isinstance(src, str) else src.alias("s"),
        F.col(dst).alias("d") if isinstance(dst, str) else dst.alias("d"),
    ).filter(F.col("s").isNotNull() & F.col("d").isNotNull())
    # symmetrize + dedup once; reused every round
    e = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    e = e.persist()
    # materialize the cache NOW: the edge lineage is typically the
    # expensive part (a sketch band-join feeding the pairs), and the
    # universe below reads e — without this eager count the first
    # consumer computes the full lineage BYPASSING the still-cold cache
    # and the first round pays it again (measured: ~2x the sketch cost
    # inside the d03 'pipe' gate). The count doubles as the
    # small-graph fast-path decision input.
    n_edges = e.count()

    universe = e.select(F.col("s").alias("id"))
    if nodes is not None:
        nc = node_col if node_col is not None else nodes.columns[0]
        universe = universe.union(
            nodes.select(
                (F.col(nc) if isinstance(nc, str) else nc).alias("id")
            ).filter(F.col("id").isNotNull())
        )
    seed = universe.distinct().withColumn("comp", F.col("id"))

    def star_labels() -> DataFrame:
        """Star-forest labels over e's canonical pairs, extended with
        self-labels for the isolated universe nodes."""
        star = _star_components(
            e.filter(F.col("s") < F.col("d")), max_rounds=star_max_rounds
        ).withColumnRenamed("comp", "_star_comp")
        return seed.select("id").join(star, "id", "left").select(
            "id", F.coalesce(F.col("_star_comp"), F.col("id")).alias("comp")
        )

    # try/finally: a failed round (executor loss, task failure past
    # retries) must not leak the cached edge list — this persist is
    # module-local, so the registry's release_caches can't reclaim it
    try:
        if 0 < n_edges <= small_graph_threshold:
            # driver-side union-find fast path (see docstring)
            parent: dict = {}

            def find(x):
                root = x
                while parent.get(root, root) != root:
                    root = parent[root]
                while parent.get(x, x) != x:  # path compression
                    parent[x], x = root, parent[x]
                return root

            for row in e.filter(F.col("s") < F.col("d")).collect():
                ra, rb = find(row["s"]), find(row["d"])
                if ra != rb:
                    # union by MIN so every root is its set's min id
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            lab_rows = [(x, find(x)) for x in list(parent)]
            id_type = e.schema["s"].dataType
            from pyspark.sql import types as T

            lab = edges.sparkSession.createDataFrame(
                lab_rows,
                T.StructType(
                    [
                        T.StructField("id", id_type),
                        T.StructField("_uf_comp", id_type),
                    ]
                ),
            )
            return (
                seed.select("id")
                .join(F.broadcast(lab), "id", "left")
                .select(
                    "id",
                    F.coalesce(F.col("_uf_comp"), F.col("id")).alias(
                        "comp"
                    ),
                )
                .localCheckpoint()
            )
        if algorithm == "star":
            return star_labels().localCheckpoint()
        labels = seed.localCheckpoint()
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
            if algorithm == "label":
                raise RuntimeError(
                    f"connected_components did not converge in {max_iter} "
                    "rounds (graph diameter exceeds the label-propagation "
                    "budget); use algorithm='auto' or 'star'"
                )
            # auto: diameter > max_iter — restart on the logarithmic
            # path (partial labels are discarded; the star algorithm
            # works on the original edge set)
            labels = star_labels().localCheckpoint()
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
