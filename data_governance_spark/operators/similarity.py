"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (O(Q*N) — fine when the
query set is small or as a rerank stage); random-hyperplane LSH is the
scale path: it buckets vectors so candidate generation is a co-grouped
join on bucket id instead of a cross join, then the exact cosine
reranks within buckets. Everything is JVM-side column expressions
(zip_with/aggregate) — no Python in the hot loop.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from data_governance_spark.cache import tracked_persist


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def with_norm(df: DataFrame, vec: str = "emb", out: str = "nrm") -> DataFrame:
    return df.withColumn(out, norm(F.col(vec)))


def local_topk_idx(row, cids, n: int):
    """Indices of the top-``n`` candidates of one score row under the
    engine-wide deterministic order (score desc, neighbor id asc) —
    ties INCLUDED in the selection, not just the final ordering: a bare
    argpartition keeps an arbitrary subset of boundary ties, making
    results batch-layout-dependent (PQ code collisions and duplicated
    corpora tie routinely). Tie-safety without a full-row sort: an
    argpartition cut at ``n`` is widened to include every row tying the
    boundary score, and only that slice is lexsorted — O(c + t log t)
    for t = n + ties, vs O(c log c) for the previous full lexsort
    (measurable on 10k+-row Arrow batches in pq_knn's score loop)."""
    import numpy as np

    c = len(row)
    if n >= c:
        order = np.lexsort((cids, -row))
        return order[: min(n, c)]
    part = np.argpartition(-row, n - 1)
    boundary = row[part[n - 1]]
    if np.isnan(boundary):
        # fewer than n finite scores: `row >= NaN` would select NOTHING
        # and silently drop the real candidates — take the full-sort
        # path (NaN sorts last there, matching the n >= c branch)
        order = np.lexsort((cids, -row))
        return order[:n]
    # every index scoring >= the boundary participates in the ordered cut
    cand = np.flatnonzero(row >= boundary)
    sub = np.lexsort((cids[cand], -row[cand]))
    return cand[sub[:n]]


def brute_force_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    drop_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: cross join + per-query window rank.

    Both inputs must expose (id_col, vec_col as array<double>). The
    query side is expected to be small (it is broadcast); the corpus
    streams. Deterministic tie-break: cosine desc, neighbor id asc.

    ``drop_self`` (default True) filters query_id == neighbor_id —
    correct when queries are drawn from the corpus (self-search). Pass
    False for the retrieval shape where query and corpus ids live in
    different namespaces, so an accidental id collision isn't dropped
    (mirrors ivf_knn, which keeps self-matches when ``queries`` is a
    separate DataFrame).
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    # try_divide: a zero-norm vector yields NULL cosine (sorts LAST
    # under desc) on every ANSI setting — plain `/` RAISES under Spark
    # 4's default ANSI mode. pq_knn/ivfadc_knn mirror the ordering by
    # pinning zero-norm rows to -inf (selection parity; value differs)
    cos = F.try_divide(
        dot(F.col("q_emb"), F.col("c_emb")), F.col("q_nrm") * F.col("c_nrm")
    )
    scored = c.crossJoin(F.broadcast(q))
    if drop_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def exact_rerank(
    queries: DataFrame,
    candidates: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "emb",
) -> DataFrame:
    """The production ANN composition's second stage: approximate
    candidates at k′ = r·k (from ``pq_knn`` / ``ivfadc_knn`` /
    ``lsh_knn`` — anything emitting (query_id, neighbor_id) pairs) are
    re-scored EXACTLY against the raw vectors and cut to the true
    top-k of the pool. Compressed-domain scores order the pool but
    never surface: the output cosine is the exact one.

    Scale shape: ``candidates`` is tiny (queries × k′ rows) and is
    BROADCAST into a hash join against the corpus, so the corpus
    streams map-side and only candidate rows are ever scored — the raw
    vectors are touched for |pool| rows, not |corpus|. The final
    window shuffles only the scored pool. Output matches
    ``brute_force_knn``: (query_id, neighbor_id, cosine, rk).

    When the candidate pool provably contains the true top-k (e.g.
    lossless codebooks at k′ >= k, or r sized per the measured recall
    curve — scripts/stress_pq.py), the result EQUALS brute force at
    a fraction of its cost."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # duplicate (query, neighbor) pairs (candidate tiers can overlap)
    # would inflate row_number ranks — dedup the tiny relation
    cand = candidates.select("query_id", "neighbor_id").distinct()
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    pool = c.join(F.broadcast(cand), "neighbor_id").join(
        F.broadcast(q), "query_id"
    )
    cos = F.try_divide(
        dot(F.col("q_emb"), F.col("c_emb")), F.col("q_nrm") * F.col("c_nrm")
    )
    scored = pool.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def ivf_knn(
    df: DataFrame,
    cells: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    cell_id_col: str = "cell_id",
    cell_vec_col: str = "centroid",
    queries: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest cell centroid,
    then for each query probe the ``n_probe`` nearest cells and rerank
    exactly within them.

    ``cells`` is a small (cell_id, centroid array<double>) table —
    broadcast everywhere. The candidate join is an equi-join on
    cell_id: the inverted-file structure means a query scans
    ~n_probe/n_cells of the corpus instead of all of it — the standard
    recall/cost dial at 100 TB. Centroids can come from any trainer
    (k-means, per-label means); the operator only needs the table.

    ``queries=None`` is self-join ANN (every corpus vector is a query;
    self-matches dropped). Pass a separate (id_col, vec_col) ``queries``
    DataFrame for the retrieval shape — brute_force_knn's API — where
    only the query set probes and self-matches are NOT dropped (ids
    live in different namespaces).
    """
    c = cells.select(
        F.col(cell_id_col).alias("cell_id"),
        F.col(cell_vec_col).alias("centroid"),
        norm(F.col(cell_vec_col)).alias("c_cnrm"),
    )
    c = tracked_persist(c)

    def score_cells(side: DataFrame) -> DataFrame:
        base = side.select(id_col, vec_col, norm(F.col(vec_col)).alias("nrm"))
        scored = base.crossJoin(F.broadcast(c)).select(
            id_col,
            vec_col,
            "nrm",
            "cell_id",
            (
                dot(F.col(vec_col), F.col("centroid"))
                / (F.col("nrm") * F.col("c_cnrm"))
            ).alias("_csim"),
        )
        w_cells = W.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("cell_id"))
        return scored.withColumn("_rk", F.row_number().over(w_cells))

    if queries is None:
        # one scored cross join serves BOTH the cell assignment (rank 1)
        # and the probe list (rank <= n_probe); norms computed once
        ranked = tracked_persist(score_cells(df))
        assigned = ranked.filter(F.col("_rk") == 1)
        probes = ranked.filter(F.col("_rk") <= n_probe)
    else:
        assigned = score_cells(df).filter(F.col("_rk") == 1)
        probes = score_cells(queries).filter(F.col("_rk") <= n_probe)
    drop_self = queries is None
    left = probes.select(
        F.col("cell_id").alias("cell"),
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    right = assigned.select(
        F.col("cell_id").alias("cell"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    # In-cell rerank: per-element JVM expressions cost ~µs per cosine;
    # a cell's worth of vectors fits comfortably in memory, so this is
    # the one place the engine drops to Arrow + numpy — one matrix
    # multiply per cell instead of |Q|x|C| folded lambdas.
    import pandas as pd  # local import: only the driver needs it at plan time

    union = left.select(
        "cell",
        F.col("query_id").alias("vid"),
        (F.col("q_emb")).alias("emb"),
        F.col("q_nrm").alias("nrm"),
        F.lit("q").alias("role"),
    ).unionByName(
        right.select(
            "cell",
            F.col("neighbor_id").alias("vid"),
            F.col("c_emb").alias("emb"),
            F.col("c_nrm").alias("nrm"),
            F.lit("c").alias("role"),
        )
    )

    topn = k  # per-cell candidates; final global rank merges probed cells

    def rerank(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        q = pdf[pdf.role == "q"]
        c = pdf[pdf.role == "c"]
        if q.empty or c.empty:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cosine": []}
            ).astype({"query_id": "int64", "neighbor_id": "int64", "cosine": "float64"})
        qm = np.stack(q["emb"].to_numpy()) / q["nrm"].to_numpy()[:, None]
        cm = np.stack(c["emb"].to_numpy()) / c["nrm"].to_numpy()[:, None]
        sims = qm @ cm.T
        qids = q["vid"].to_numpy()
        cids = c["vid"].to_numpy()
        out_q, out_n, out_s = [], [], []
        n_cand = min(topn + 1, sims.shape[1])  # +1 to survive self-drop
        for i in range(sims.shape[0]):
            row = sims[i]
            # deterministic SELECTION, not just ordering (boundary ties)
            idx = local_topk_idx(row, cids, n_cand)
            for j in idx:
                if not drop_self or cids[j] != qids[i]:
                    out_q.append(qids[i])
                    out_n.append(cids[j])
                    out_s.append(float(row[j]))
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "cosine": out_s}
        )

    scored = union.groupBy("cell").applyInPandas(
        rerank, "query_id long, neighbor_id long, cosine double"
    ).distinct()
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def train_ivf_cells(
    df: DataFrame,
    k: int = 10,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    seed: int = 42,
) -> DataFrame:
    """Lloyd's k-means over a vector column -> (cell_id, centroid) for
    ivf_knn — the trainer half of the IVF index.

    Iterative-algorithm shape for Spark: per iteration one distributed
    assignment pass (broadcast the k centroids, rank-1 per vector) and
    one distributed mean pass; only the k x dim centroid table ever
    reaches the driver, where it is re-broadcast as literals — so
    lineage stays flat across iterations (no exponentially growing
    plan, the classic iterative-Spark trap) and each iteration costs
    exactly 2 scans regardless of corpus size.

    Deterministic: init picks the k vectors with the smallest
    xxhash64(id, seed); ties in assignment break by cell_id.
    """
    spark = df.sparkSession
    init_rows = (
        df.select(
            F.col(vec_col).alias("v"),
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"),
            F.col(id_col).alias("_i"),
        )
        # the id tie-break makes the cut deterministic even under
        # duplicate ids / hash collisions (partition order decided
        # boundary ties before)
        .orderBy("_h", "_i")
        .limit(k)
        .collect()
    )
    centers: list[list[float]] = [list(r["v"]) for r in init_rows]
    if not centers:
        raise ValueError("train_ivf_cells: input has no vectors")
    k = len(centers)  # fewer vectors than requested cells: train k=n

    def cells_df(cs: list[list[float]]) -> DataFrame:
        return spark.createDataFrame(
            [(i, c) for i, c in enumerate(cs)],
            "cell_id int, centroid array<double>",
        )

    for _ in range(n_iter):
        c = cells_df(centers).select(
            "cell_id", "centroid", norm(F.col("centroid")).alias("c_nrm")
        )
        base = df.select(id_col, vec_col, norm(F.col(vec_col)).alias("nrm"))
        scored = base.crossJoin(F.broadcast(c)).select(
            id_col,
            vec_col,
            "cell_id",
            (
                dot(F.col(vec_col), F.col("centroid"))
                / (F.col("nrm") * F.col("c_nrm"))
            ).alias("_csim"),
        )
        w = W.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("cell_id"))
        assigned = scored.withColumn("_rk", F.row_number().over(w)).filter(
            F.col("_rk") == 1
        )
        means = (
            assigned.select("cell_id", F.posexplode(vec_col).alias("dim", "v"))
            .groupBy("cell_id", "dim")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell_id"], {})[r["dim"]] = r["m"]
        # empty cells keep their previous center (standard Lloyd's)
        centers = [
            [by_cell[i][d] for d in sorted(by_cell[i])] if i in by_cell else centers[i]
            for i in range(k)
        ]
    return cells_df(centers)


def cosine_neardup_pairs(
    df: DataFrame,
    block_col: str,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    max_block_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks.

    The all-pairs cosine join is O(N^2) and impossible at corpus scale;
    blocking on a partition key (an IVF cell id, an LSH bucket, or any
    clustering label) makes candidate generation an equi-join that
    shuffles each block to one place — the standard scale path for
    embedding dedup. Within a block the comparison is exact, so given
    exact blocks (e.g. from e06's cell assignment) the result is exact
    within-block near-dup pairs. Deterministic output: (block, doc
    pair, cosine); ties impossible by id ordering.

    A block of n vectors still compares n(n-1)/2 pairs — the blocking
    must be fine-grained (many cells). ``max_block_size`` drops blocks
    past the quadratic budget (same rationale as dedup._cap_buckets);
    route oversized blocks through a finer clustering instead. The
    default is None (exact: every within-block pair, matching the
    operator's contract and any SQL oracle); at corpus scale pass an
    explicit cap (e.g. 10k -> <=5e7 pairs/block) to bound a skewed
    block — capping is an explicit accuracy/cost opt-in, never silent.
    """
    base = with_norm(df, vec_col).select(
        F.col(block_col).alias("block"),
        F.col(id_col),
        F.col(vec_col),
        F.col("nrm"),
    )
    from data_governance_spark.operators.dedup import _cap_buckets

    base = _cap_buckets(base, ["block"], max_block_size)
    # both sides of the block self-join read the normed vectors — persist
    # so norms are computed once per vector, not once per side
    base = tracked_persist(base)
    a = base.select(
        "block",
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = base.select(
        "block",
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cos = dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("block", "id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    block_col: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    max_block_size: int | None = None,
    pairs: DataFrame | None = None,
):
    """SemDeDup-style embedding deduplication (Abbas et al. 2023,
    public paper) as one composition of this engine's operators:
    cluster-blocked cosine near-dup pairs -> connected-component
    closure -> keep the smallest-id representative per cluster.

    ``block_col`` is the clustering label (an IVF cell from
    ``train_ivf_cells``/``assign_cells``, or any k-means label) —
    SemDeDup's insight is that near-duplicates share a cluster, so the
    quadratic comparison happens only within blocks. Returns
    ``(labels, kept)``: the full ``(id, comp)`` labeling and the
    deduplicated rows of ``df``. Pure composition — each stage is the
    already-gated operator (e07 pairs, d10 closure), nothing new to
    verify.

    ``pairs`` (optional): a precomputed ``cosine_neardup_pairs``-shaped
    relation (``id_a``, ``id_b``) to reuse — pass a PERSISTED pair set
    when the caller also consumes it (audit output, the e07 gate), so
    the blocked cosine join evaluates once instead of once per
    consumer; the threshold/block args are then ignored for pair
    generation."""
    from data_governance_spark.operators.components import (
        connected_components,
        keep_canonical,
    )

    if pairs is None:
        pairs = cosine_neardup_pairs(
            df, block_col, threshold=threshold, id_col=id_col,
            vec_col=vec_col, max_block_size=max_block_size,
        )
    labels = connected_components(
        pairs, "id_a", "id_b", nodes=df.select(id_col), node_col=id_col
    )
    kept = keep_canonical(df, labels, id_col=id_col)
    return labels, kept


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy dependency in
    the plan; literals are folded into codegen)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-dot-product bucket id (random hyperplane LSH)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(v) for v in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_knn(
    df: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    seed: int = 42,
) -> DataFrame:
    """ANN: bucket by LSH signature, exact cosine rerank within bucket.

    Scale path: the candidate join is an equi-join on bucket (shuffle
    co-partitioned), never a cross join. Recall < 1; raise by probing
    multiple plane sets (union of seeds) if needed.
    """
    planes = hyperplanes(dim, n_planes, seed)
    b = df.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), planes).alias("bucket")
    )
    # both sides of the bucket self-join read the bucketed vectors —
    # persist so the n_planes dot products run once per vector
    b = tracked_persist(with_norm(b, vec_col))
    left = b.select(
        F.col("bucket"),
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    right = b.select(
        F.col("bucket"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    cos = dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    scored = (
        left.join(right, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
