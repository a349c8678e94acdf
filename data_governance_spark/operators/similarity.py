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


def brute_force_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "emb",
) -> DataFrame:
    """Exact cosine top-k: cross join + per-query window rank.

    Both inputs must expose (id_col, vec_col as array<double>). The
    query side is expected to be small (it is broadcast); the corpus
    streams. Deterministic tie-break: cosine desc, neighbor id asc.
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
    cos = dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
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
    """
    c = cells.select(
        F.col(cell_id_col).alias("cell_id"), F.col(cell_vec_col).alias("centroid")
    )

    def nearest_cells(side: DataFrame, n_top: int, out: str) -> DataFrame:
        scored = side.crossJoin(F.broadcast(c)).select(
            id_col,
            vec_col,
            "cell_id",
            (
                dot(F.col(vec_col), F.col("centroid"))
                / (norm(F.col(vec_col)) * norm(F.col("centroid")))
            ).alias("_csim"),
        )
        w = W.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("cell_id"))
        return (
            scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n_top)
            .select(id_col, vec_col, F.col("cell_id").alias(out))
        )

    assigned = nearest_cells(df, 1, "cell").persist()
    probes = nearest_cells(df, n_probe, "cell")
    left = probes.select(
        F.col("cell"),
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        norm(F.col(vec_col)).alias("q_nrm"),
    )
    right = assigned.select(
        F.col("cell"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_emb"),
        norm(F.col(vec_col)).alias("c_nrm"),
    )
    cos = dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    scored = (
        left.join(right, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


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
    b = with_norm(b, vec_col).persist()
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
