"""Similarity-search and dedup-sketch suite over ``documents`` +
``embeddings``.

Every query here carries a DuckDB oracle (r5). The probabilistic
sketches (MinHash, SimHash, LSH/IVF-ANN) have no faithful ANSI-SQL twin
for their full output (hash functions differ across engines), so their
gates assert GUARANTEED-exact subsets instead: planted exact-duplicate
pairs every sketch must catch (e03), and configurations where the ANN
is exact by construction (e05). Probabilistic recall behavior stays
verified against exact Jaccard / brute-force cosine on crafted fixtures
(tests/test_dedup.py, tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_governance_spark.cache import tracked_persist
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
# Planted-duplicate ids live far above any real doc_id/vec_id (testdata
# ids are dense and small even at sf0.1).
_DUP_OFFSET = 10_000_000

# DuckDB-side tokenizer identical to functions.text.tokens
_SQL_TOKS = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"


# e03 (merged gate, r5 driver-budget; replaces the no-oracle ex-e03/
# ex-e04 rows with a driver-hashable one): both sketches run over the
# corpus PLUS planted exact duplicates (doc_id + _DUP_OFFSET for every
# doc_id % 5 == 0 with at least one token). An exact duplicate has an
# identical shingle set and token list, so MinHash signatures match on
# every band (est_jaccard exactly 1.0) and SimHash signatures are equal
# (hamming 0, equal chunks) — catching every planted pair is a
# GUARANTEE of the sketch + banding machinery, not a probabilistic
# recall, which is what makes a deterministic DuckDB oracle possible.
# The inner join means a missed pair fails the row-count match loudly.
# Probabilistic near-dup recall stays covered by tests/test_dedup.py
# against exact Jaccard / Hamming on crafted fixtures.
@qdef(
    QUERIES,
    "e03_sketch_dedup_recall",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 5 = 0 AND text IS NOT NULL AND len({_SQL_TOKS}) >= 1
    )
    SELECT 'mh' AS gate,
           CAST(doc_id AS VARCHAR) || '>' || CAST(doc_id + {_DUP_OFFSET} AS VARCHAR)
             AS k,
           CAST(NULL AS VARCHAR) AS v_s, CAST(1.0 AS DOUBLE) AS v_d
    FROM planted
    UNION ALL
    SELECT 'sh',
           CAST(doc_id AS VARCHAR) || '>' || CAST(doc_id + {_DUP_OFFSET} AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(0.0 AS DOUBLE)
    FROM planted
    """,
    doc="merged gate (r5): MinHash(64)+LSH banding (16x4, ex-e03) and "
    "SimHash64 chunk blocking (ex-e04) must catch every planted exact-"
    "duplicate pair with est_jaccard 1.0 / hamming 0 — guaranteed "
    "(identical signatures), so DuckDB can state the expected rows",
)
def e03_sketch_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pre-materialize tokens: word_shingles indexes the token array per
    # gram position and must not re-run the tokenizer each time
    base = (
        table(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") >= 1)
    )
    planted = base.filter(F.col("doc_id") % 5 == 0)
    # both sketches (minhash shingles + simhash tokens) consume the
    # augmented corpus — persist so the scan+tokenize runs once, not
    # once per sketch; repartition first so the 64-hash sketch folds
    # spread across cores (the local parquet is one split — a cluster
    # gets this from its input splits)
    aug = tracked_persist(
        base.unionByName(
            planted.select(
                (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"), "toks"
            )
        ).repartition(spark.sparkContext.defaultParallelism)
    )
    # the two sketch plans are independent lazy builds (the 64-wide
    # hash trees dominate the cold build) — overlap their construction
    # (guide §2.6, the d01/d03/q37 pattern)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        mh_fut = pool.submit(
            lambda: minhash_dedup_pairs(
                aug,
                F.array_distinct(word_shingles(F.col("toks"), 3)),
                threshold=0.5,
            )
        )
        sh_fut = pool.submit(
            lambda: simhash_dedup_pairs(aug, F.col("toks"), max_hamming=8)
        )
        mh, sh = mh_fut.result(), sh_fut.result()
    # derive the expected pairs from the PERSISTED aug, not from base
    # (base would re-scan + re-tokenize the corpus once per sub-gate)
    expected = aug.filter(
        (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < _DUP_OFFSET)
    ).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + _DUP_OFFSET).alias("doc_b"),
    )
    nul_s = F.lit(None).cast("string")
    key = F.concat(
        F.col("doc_a").cast("string"), F.lit(">"), F.col("doc_b").cast("string")
    )
    mh_rows = expected.join(mh, ["doc_a", "doc_b"]).select(
        F.lit("mh").alias("gate"),
        key.alias("k"),
        nul_s.alias("v_s"),
        F.col("est_jaccard").alias("v_d"),
    )
    sh_rows = expected.join(sh, ["doc_a", "doc_b"]).select(
        F.lit("sh").alias("gate"),
        key.alias("k"),
        nul_s.alias("v_s"),
        F.col("hamming").cast("double").alias("v_d"),
    )
    return mh_rows.unionByName(sh_rows)


# --------------------------------------------------------------------------
_NEARDUP_T = 0.30


# e07 (quad-schema since r7): the label-blocked cosine pair set
# ('pairs', the original e07 relation restated as quad rows) + the
# SemDeDup composition over the SAME pair graph ('sd',
# operators/similarity.semantic_dedup: pairs -> connected-component
# closure -> keep the min-id representative per cluster). The oracle
# restates the closure with a recursive CTE (the d10 pattern) over the
# same cosine join and keeps ids equal to their component minimum —
# exactly keep_canonical's default ordering.
@qdef(
    QUERIES,
    "e07_cosine_neardup_pairs",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT label, id_a, id_b, cosine FROM (
        SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
               list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])) AS cosine
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
      ) WHERE cosine >= {_NEARDUP_T}
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    reach AS (
      SELECT vec_id AS id, vec_id AS r FROM embeddings
      UNION
      SELECT e.d AS id, reach.r AS r
      FROM reach JOIN edges e ON e.s = reach.id
    ),
    comp AS (SELECT id, MIN(r) AS c FROM reach GROUP BY id)
    SELECT 'pairs' AS gate,
           CAST(label AS VARCHAR) || ':' || CAST(id_a AS VARCHAR)
             || ':' || CAST(id_b AS VARCHAR) AS k,
           CAST(NULL AS VARCHAR) AS v_s,
           round(cosine, 4) + 0.0 AS v_d
    FROM pairs
    UNION ALL
    SELECT 'sd', CAST(id AS VARCHAR), CAST(NULL AS VARCHAR), 1.0
    FROM comp WHERE id = c
    """,
    doc="merged gate (r7): embedding-cosine near-dup pairs, "
    "label-blocked (exact within block; the block key is the "
    "O(N^2)->equi-join scale path) + the SemDeDup composition "
    "(semantic_dedup: blocked pairs -> component closure -> min-id "
    "representative) — one row per surviving vector, membership "
    "checked by the row multiset",
)
def e07_cosine_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.operators.similarity import semantic_dedup

    # the pair join and the semantic_dedup composition both scan the
    # cast embeddings — persist once (released by the registry sweep).
    # repartition first: the local parquet is ONE split, and the block
    # join broadcasts the small side, so without it the whole blocked
    # cosine filter runs on a single core (a cluster gets this
    # parallelism from its input splits)
    emb = tracked_persist(
        table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("emb"),
        )
    )
    # the pair relation feeds BOTH the 'pairs' rows and the closure's
    # edge list — persist it so the blocked 200k-candidate cosine join
    # evaluates once, not once per consumer (it re-ran inside
    # semantic_dedup before: e07 17.5s -> ~halved)
    out = tracked_persist(
        cosine_neardup_pairs(emb, "label", threshold=_NEARDUP_T)
    )
    nul_s = F.lit(None).cast("string")
    pair_rows = out.select(
        F.lit("pairs").alias("gate"),
        F.concat_ws(
            ":",
            F.col("block").cast("string"),
            F.col("id_a").cast("string"),
            F.col("id_b").cast("string"),
        ).alias("k"),
        nul_s.alias("v_s"),
        (F.round("cosine", 4) + F.lit(0.0)).alias("v_d"),
    )
    _, kept = semantic_dedup(emb, "label", pairs=out)
    sd_rows = kept.select(
        F.lit("sd").alias("gate"),
        F.col("vec_id").cast("string").alias("k"),
        nul_s.alias("v_s"),
        F.lit(1.0).alias("v_d"),
    )
    return pair_rows.unionByName(sd_rows)


# --------------------------------------------------------------------------
# e05 (merged gate, r5 driver-budget; replaces the no-oracle ex-e05/
# ex-e06 rows with a driver-hashable one). Two guaranteed-exact ANN
# properties:
#   'ivf' — ivf_knn probing EVERY cell (n_probe = n_cells) is exact by
#   construction (the global top-k is inside some probed cell's local
#   top-k), so the full IVF machinery — broadcast cell assignment,
#   probe ranking, Arrow/numpy in-cell rerank, global merge — must
#   reproduce DuckDB's brute-force top-k bit-for-bit (queries kept as a
#   separate DataFrame: retrieval shape, self-match included at rk 1).
#   'lsh' — an identical planted vector (vec_id + _DUP_OFFSET) hashes
#   to the SAME hyperplane signs, hence the same bucket, and its cosine
#   (exactly 1.0 after rounding) outranks every other bucket member —
#   so lsh_knn must return it among the top-k for every planted query.
# Approximate-recall behavior (n_probe < n_cells, missed buckets) stays
# covered by tests/test_similarity.py.
@qdef(
    QUERIES,
    "e05_ann_recall",
    oracle=f"""
    -- 'ivf' (all cells probed) and 'pq' (lossless codebooks) are BOTH
    -- exact-by-construction, so one brute-force subquery serves both
    -- gate labels — a single definition cannot silently diverge
    SELECT g.gate,
           CAST(query_id AS VARCHAR) || ':' || CAST(rk AS VARCHAR) || ':'
             || CAST(neighbor_id AS VARCHAR) AS k,
           CAST(NULL AS VARCHAR) AS v_s,
           round(cosine, 4) + 0.0 AS v_d
    FROM (
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
      WHERE q.vec_id % 5 = 0
    ), (SELECT unnest(['ivf', 'pq', 'ivfadc', 'rr']) AS gate) g
    WHERE rk <= {_K}
    UNION ALL
    SELECT 'lsh', CAST(vec_id AS VARCHAR), CAST(NULL AS VARCHAR), 1.0
    FROM embeddings WHERE vec_id % 7 = 0
    """,
    doc="merged gate (r5): IVF ANN with all cells probed == exact "
    "brute-force top-k (ex-e06 machinery under an exact oracle) + LSH "
    "ANN must retrieve a planted identical vector from its own bucket "
    "at cosine 1.0 (ex-e05 machinery, guaranteed self-bucket recall) + "
    "product quantization with LOSSLESS codebooks (one codeword per "
    "distinct subvector) == exact brute-force top-k — the full PQ "
    "machinery (per-subspace argmin encode, reconstructed norms, ADC "
    "lookup-table scoring, partition-local top-k + global merge) under "
    "an exact oracle (operators/pq.py, Jégou 2011; new in r11) + the "
    "IVFADC composition (Jégou 2011 §V: residual-encode per cell, "
    "centroid-dot + residual-ADC) probing ALL cells with lossless "
    "residual codebooks == brute force — the same exactness "
    "construction through the full probe/filter path (new in r11) + "
    "the candidates->exact-rerank production composition: ONE shared "
    "ADC pass at k'=2k feeds both the 'pq' cut and the 'rr' candidate "
    "pool, which exact_rerank re-scores against raw vectors through "
    "broadcast joins to reproduce brute force (new in r12). "
    "SUB-GATE COUNT: 5 (ivf, lsh, pq, ivfadc, rr) — FROZEN as of "
    "r13 per the r12 judge's budget rule: no new e05 sub-gate, period; "
    "new ANN content must retire equivalent cost here first or live in "
    "a budgetless differential test.",
)
def e05_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scanned by the cell trainer, the n_cells count, the query subset,
    # the IVF corpus, and the LSH planted union — persist once
    emb = tracked_persist(
        table(spark, sf_dir, "embeddings").select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("emb"),
        )
    )
    # deterministic cell centers: per-label mean vectors (a k-means
    # trainer would slot in here unchanged — train_ivf_cells). A
    # 64-wide flat avg aggregate measures the same as this explode
    # shape at test scale; explode is kept for the generic-dim code.
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
    # persisted: the float avg aggregate is merge-order nondeterministic
    # at the last bits, and FOUR consumers read cells (ivf_knn, the
    # residual assignment, the residual encode's collect, the ivfadc
    # probe collect) — an unpersisted plan could hand each a bitwise-
    # different centroid and break the lossless-exactness premise at a
    # rounding/rank boundary (review catch)
    cells = tracked_persist(cells)

    # The build phase has four independent eager actions — the n_cells
    # count, the PQ corpus collect (-> codebooks -> the eager pq_wide
    # materialization), and the residual collect (-> residual
    # codebooks) — that ran back to back; each is a small job that
    # leaves most of the 32 cores idle. Overlap them (r14, guide §2.6:
    # independent eager phases back-fill each other's idle cores; same
    # jobs, same results, shorter wall). Imports happen before the
    # threads fork so the pool never races the import lock.
    from concurrent.futures import ThreadPoolExecutor

    from data_governance_spark.operators.pq import (
        codebooks_from_vectors,
        ivfadc_encode,
        ivfadc_knn,
        ivfadc_residuals,
        pq_encode,
        pq_knn,
    )
    from data_governance_spark.operators.similarity import exact_rerank

    def _n_cells() -> int:
        return emb.select("label").distinct().count()

    def _pq_wide() -> DataFrame:
        # pq sub-gate (r11): LOSSLESS codebooks (one codeword per
        # distinct subvector of the corpus — the codebooks_from_vectors
        # exactness construction) make encoding exact and ADC == true
        # cosine, so the whole PQ path must reproduce DuckDB's
        # brute-force top-k. The corpus collect is bounded: embeddings
        # is the chart-sized table (<= 2k rows), and the lossless
        # construction is documented as bounded-corpus-only (real
        # corpora train sampled codebooks).
        vectors = [list(r["emb"]) for r in emb.select("emb").collect()]
        books = codebooks_from_vectors(vectors, m=8)
        codes = pq_encode(emb.select("vec_id", "emb"), books)
        # ONE ADC pass at k' = 2k serves BOTH sub-gates (the e05 growth
        # rule: new sub-gates share relations, never add a scoring
        # pass): rows rk <= k are the 'pq' result; all 2k rows are the
        # 'rr' candidate pool. Lossless codes make the pool provably
        # contain the true top-k, so the rerank must equal brute force
        # exactly.
        wide = tracked_persist(pq_knn(queries, codes, books, k=2 * _K))
        # materialize NOW (bounded: |queries| × 2k rows): the final
        # action otherwise computes this cache from three racing
        # consumers at once — the 'pq' branch, exact_rerank's
        # broadcast-build future, and the rr pool join — and the
        # broadcast job's tasks convoy behind the block locks while
        # holding task slots (measured: a 32-task stage at 262 s task
        # wall / 5.7 s CPU; eager-count cut the cold gate from ~44 s to
        # ~27 s at equal canary)
        wide.count()
        return wide

    def _res_books():
        # ivfadc sub-gate (r11): residuals against the per-label cells,
        # LOSSLESS residual codebooks — collected (bounded, chart-sized
        # corpus) to train the residual codebooks
        res = tracked_persist(
            ivfadc_residuals(emb.select("vec_id", "emb"), cells)
        )
        return res, codebooks_from_vectors(
            [list(r["res"]) for r in res.select("res").collect()], m=8
        )

    queries = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id", "emb")
    with ThreadPoolExecutor(max_workers=3) as pool:
        n_cells_f = pool.submit(_n_cells)
        pq_wide_f = pool.submit(_pq_wide)
        res_books_f = pool.submit(_res_books)
        n_cells = n_cells_f.result()
        pq_wide = pq_wide_f.result()
        res, res_books = res_books_f.result()

    ivf = ivf_knn(
        emb.select("vec_id", "emb"), cells, k=_K, n_probe=n_cells, queries=queries
    )
    nul_s = F.lit(None).cast("string")

    def _topk_rows(df, gate):
        return df.select(
            F.lit(gate).alias("gate"),
            F.concat(
                F.col("query_id").cast("string"), F.lit(":"),
                F.col("rk").cast("string"), F.lit(":"),
                F.col("neighbor_id").cast("string"),
            ).alias("k"),
            nul_s.alias("v_s"),
            (F.round("cosine", 4) + F.lit(0.0)).alias("v_d"),
        )

    ivf_rows = _topk_rows(ivf, "ivf")
    planted = emb.filter(F.col("vec_id") % 7 == 0)
    aug = emb.select("vec_id", "emb").unionByName(
        planted.select((F.col("vec_id") + _DUP_OFFSET).alias("vec_id"), "emb")
    )
    knn = lsh_knn(aug, k=_K, n_planes=10, dim=64)
    lsh_rows = knn.filter(
        (F.col("neighbor_id") == F.col("query_id") + _DUP_OFFSET)
        & (F.col("query_id") % 7 == 0)
        & (F.col("query_id") < _DUP_OFFSET)
    ).select(
        F.lit("lsh").alias("gate"),
        F.col("query_id").cast("string").alias("k"),
        nul_s.alias("v_s"),
        (F.round("cosine", 4) + F.lit(0.0)).alias("v_d"),
    )
    pq = pq_wide.filter(F.col("rk") <= _K)

    # rr sub-gate (r12): the production composition — approximate
    # candidates re-scored EXACTLY against raw vectors via a broadcast
    # semi-join (operators/similarity.py exact_rerank), cut to top-k
    rr = exact_rerank(queries, pq_wide, emb.select("vec_id", "emb"), k=_K)

    # ivfadc sub-gate (r11): the composition — residuals, lossless
    # residual codebooks (trained above), ALL cells probed:
    # centroid-dot + residual-ADC must reproduce brute force through
    # the probe/filter machinery (same shared oracle subquery)
    index = ivfadc_encode(res, cells, res_books)
    ivfadc = ivfadc_knn(
        queries, index, cells, res_books, k=_K, n_probe=n_cells
    )
    return (
        ivf_rows.unionByName(lsh_rows)
        .unionByName(_topk_rows(pq, "pq"))
        .unionByName(_topk_rows(ivfadc, "ivfadc"))
        .unionByName(_topk_rows(rr, "rr"))
    )
