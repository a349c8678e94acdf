"""Similarity-search and dedup-sketch suite over ``documents`` +
``embeddings``.

e-queries with oracles run exact math that DuckDB can mirror; the
probabilistic sketches (MinHash, SimHash, LSH-ANN) have no faithful
ANSI-SQL twin (hash functions differ across engines) so they are
registered without oracles — the driver records rows-only checks and
pytest verifies them against exact Jaccard / brute-force cosine on
crafted fixtures (tests/test_dedup.py, tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_governance_spark.functions.text import tokens, word_shingles
from data_governance_spark.operators.dedup import (
    minhash_dedup_pairs,
    simhash_dedup_pairs,
)
from data_governance_spark.operators.similarity import (
    brute_force_knn,
    cosine_neardup_pairs,
    ivf_knn,
    lsh_knn,
)
from data_governance_spark.queries.base import QueryDef, qdef
from data_governance_spark.tables import table

QUERIES: dict[str, QueryDef] = {}

_N_QUERY_VECS = 8
_K = 5


# --------------------------------------------------------------------------
@qdef(
    QUERIES,
    "e01_knn_bruteforce",
    oracle=f"""
    SELECT query_id, neighbor_id, round(cosine, 4) + 0.0 AS cosine, rk FROM (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(n.embedding AS DOUBLE[])) AS cosine,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                               CAST(n.embedding AS DOUBLE[])) DESC,
                        n.vec_id ASC
             ) AS rk
      FROM embeddings q, embeddings n
      WHERE q.vec_id < {_N_QUERY_VECS} AND q.vec_id <> n.vec_id
    ) WHERE rk <= {_K}
    """,
    doc="exact cosine top-k, broadcast query side (ANN baseline)",
)
def e01_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = emb.filter(F.col("vec_id") < _N_QUERY_VECS)
    out = brute_force_knn(q, emb, k=_K)
    # "+ 0.0" normalizes IEEE -0.0 to 0.0 so both engines hash identically
    return out.select(
        "query_id",
        "neighbor_id",
        (F.round("cosine", 4) + F.lit(0.0)).alias("cosine"),
        "rk",
    )


# --------------------------------------------------------------------------
@qdef(
    QUERIES,
    "e02_label_centroids",
    oracle="""
    SELECT label, i - 1 AS dim,
           round(avg(CAST(embedding[i] AS DOUBLE)), 4) + 0.0 AS centroid
    FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
    GROUP BY label, i
    """,
    doc="per-label centroid vector via posexplode + avg per dimension",
)
def e02_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
        )
        .groupBy("label", "dim")
        .agg((F.round(F.avg("v"), 4) + F.lit(0.0)).alias("centroid"))
    )


# --------------------------------------------------------------------------
@qdef(
    QUERIES,
    "e03_minhash_dedup_pairs",
    oracle=None,  # engine-specific hash sketch; verified in tests/test_dedup.py
    doc="MinHash(64) + LSH banding (16x4) near-dup candidate pairs, est Jaccard >= 0.5",
)
def e03_minhash_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pre-materialize tokens: word_shingles indexes the token array per
    # gram position and must not re-run the tokenizer each time
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    return minhash_dedup_pairs(
        docs, F.array_distinct(word_shingles(F.col("toks"), 3)), threshold=0.5
    )


# --------------------------------------------------------------------------
@qdef(
    QUERIES,
    "e04_simhash_dedup_pairs",
    oracle=None,  # engine-specific hash sketch; verified in tests/test_dedup.py
    doc="SimHash64 near-dup candidate pairs via 16-bit chunk blocking, hamming <= 8",
)
def e04_simhash_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return simhash_dedup_pairs(docs, tokens("text"), max_hamming=8)


# --------------------------------------------------------------------------
_NEARDUP_T = 0.30


@qdef(
    QUERIES,
    "e07_cosine_neardup_pairs",
    oracle=f"""
    SELECT label, id_a, id_b, round(cosine, 4) + 0.0 AS cosine FROM (
      SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
             list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) AS cosine
      FROM embeddings a
      JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    ) WHERE cosine >= {_NEARDUP_T}
    """,
    doc="embedding-cosine near-dup pairs, label-blocked (exact within block); "
    "the block key is the O(N^2)->equi-join scale path",
)
def e07_cosine_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    out = cosine_neardup_pairs(emb, "label", threshold=_NEARDUP_T)
    return out.select(
        F.col("block").alias("label"),
        "id_a",
        "id_b",
        (F.round("cosine", 4) + F.lit(0.0)).alias("cosine"),
    )


# --------------------------------------------------------------------------
@qdef(
    QUERIES,
    "e05_lsh_knn",
    oracle=None,  # approximate by design; recall vs e01 checked in tests
    doc="ANN: random-hyperplane LSH buckets + exact cosine rerank within bucket",
)
def e05_lsh_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    return lsh_knn(emb, k=_K, n_planes=10, dim=64)


# --------------------------------------------------------------------------
@qdef(
    QUERIES,
    "e06_ivf_knn",
    oracle=None,  # approximate by design; recall vs e01 checked in tests
    doc="IVF ANN: per-label centroids as cells, n_probe=2, exact in-cell rerank",
)
def e06_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("emb"),
    )
    # deterministic cell centers: per-label mean vectors (a k-means
    # trainer would slot in here unchanged). A 64-wide flat avg
    # aggregate measures the same as this explode shape at test scale
    # (both dominated by fixed JIT/setup cost); explode is kept for the
    # generic-dim code and the smaller generated class.
    cells = (
        emb.select("label", F.posexplode("emb").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim"), F.col("m")))
                ),
                lambda s: s["m"],
            ).alias("centroid")
        )
        .select(F.col("label").alias("cell_id"), "centroid")
    )
    return ivf_knn(emb.select("vec_id", "emb"), cells, k=_K, n_probe=2)
