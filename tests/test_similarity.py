"""ANN operator quality: brute force is exact; LSH and IVF recover
within-cluster neighbors on crafted clustered vectors."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from data_governance_spark.operators.similarity import (
    brute_force_knn,
    cosine_neardup_pairs,
    ivf_knn,
    lsh_knn,
    train_ivf_cells,
)

DIM = 16
N_CLUSTERS = 3
PER_CLUSTER = 20


def _clustered_vectors():
    rng = random.Random(7)
    centers = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(N_CLUSTERS)]
    rows = []
    vid = 0
    for cid, center in enumerate(centers):
        for _ in range(PER_CLUSTER):
            vec = [c + rng.gauss(0, 0.05) for c in center]
            rows.append((vid, cid, vec))
            vid += 1
    return rows, centers


@pytest.fixture(scope="module")
def vectors(spark):
    rows, centers = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, cluster int, emb array<double>")
    return df, centers


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_local_topk_idx_matches_full_lexsort():
    """The argpartition-widened cut must select EXACTLY what the full
    lexsort reference selects, under heavy score ties (quantized grids
    force boundary ties) and for every n including n >= len(row)."""
    import numpy as np

    from data_governance_spark.operators.similarity import local_topk_idx

    rng = np.random.default_rng(42)
    for trial in range(200):
        c = int(rng.integers(1, 40))
        # coarse quantization => lots of exact ties at the boundary
        row = np.round(rng.random(c) * 4) / 4.0
        cids = rng.permutation(c).astype(np.int64)
        for n in (1, 2, c // 2 or 1, c - 1 or 1, c, c + 3):
            ref = np.lexsort((cids, -row))[: min(n, c)]
            got = local_topk_idx(row, cids, n)
            assert list(got) == list(ref), (trial, n, row.tolist())


def test_brute_force_exact_same_cluster(vectors):
    df, _ = vectors
    out = brute_force_knn(df.select("vec_id", "emb"), df.select("vec_id", "emb"), k=3)
    cluster_of = {r["vec_id"]: r["cluster"] for r in df.collect()}
    rows = out.collect()
    # with tight clusters every exact neighbor is in the same cluster
    assert all(cluster_of[r["query_id"]] == cluster_of[r["neighbor_id"]] for r in rows)
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in rows)
    assert len({r["query_id"] for r in rows}) == N_CLUSTERS * PER_CLUSTER


def test_lsh_recall_on_clusters(vectors, spark):
    df, _ = vectors
    base = df.select("vec_id", "emb")
    truth = _pairs(brute_force_knn(base, base, k=3))
    approx = _pairs(lsh_knn(base, k=3, n_planes=6, dim=DIM))
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5  # clustered data: bucket collisions keep clusters together


def test_ivf_high_recall_with_true_centers(vectors, spark):
    df, centers = vectors
    cells = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], "cell_id int, centroid array<double>"
    )
    base = df.select("vec_id", "emb")
    truth = _pairs(brute_force_knn(base, base, k=3))
    approx = _pairs(ivf_knn(base, cells, k=3, n_probe=1))
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.95  # probing the true cell recovers nearly all


def test_kmeans_trainer_recovers_clusters(vectors, spark):
    df, centers = vectors
    base = df.select("vec_id", "emb")
    cells = train_ivf_cells(base, k=N_CLUSTERS, n_iter=5)
    # trained cells should serve IVF as well as the true centers do
    truth = _pairs(brute_force_knn(base, base, k=3))
    approx = _pairs(ivf_knn(base, cells, k=3, n_probe=1))
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.95
    # each trained centroid is close (cosine > 0.99) to one true center
    import math as m

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            m.sqrt(sum(x * x for x in a)) * m.sqrt(sum(y * y for y in b))
        )
    got = [r["centroid"] for r in cells.collect()]
    for c in centers:
        assert max(cos(c, g) for g in got) > 0.99


def test_kmeans_trainer_deterministic(vectors, spark):
    df, _ = vectors
    base = df.select("vec_id", "emb")
    a = sorted(map(str, train_ivf_cells(base, k=3, n_iter=2).collect()))
    b = sorted(map(str, train_ivf_cells(base, k=3, n_iter=2).collect()))
    assert a == b


def test_cosine_neardup_exact_within_block(vectors, spark):
    df, _ = vectors
    t = 0.9
    out = cosine_neardup_pairs(
        df.select("vec_id", F.col("cluster").alias("block"), "emb"),
        "block",
        threshold=t,
    ).collect()
    # python ground truth restricted to same-cluster pairs
    rows = df.collect()
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))
    truth = {
        (a["vec_id"], b["vec_id"])
        for a in rows
        for b in rows
        if a["cluster"] == b["cluster"]
        and a["vec_id"] < b["vec_id"]
        and cos(a["emb"], b["emb"]) >= t
    }
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert got == truth
    assert len(truth) > 0  # tight clusters: plenty of near-dups exist
    assert all(r["cosine"] >= t for r in out)


def test_cosine_neardup_block_cap(vectors, spark):
    df, _ = vectors
    blocked = df.select("vec_id", F.col("cluster").alias("block"), "emb")
    # every cluster has PER_CLUSTER members; a cap below that drops all
    capped = cosine_neardup_pairs(
        blocked, "block", threshold=0.5, max_block_size=PER_CLUSTER - 1
    )
    assert capped.count() == 0
    uncapped = cosine_neardup_pairs(blocked, "block", threshold=0.5)
    assert uncapped.count() > 0


def test_ivf_separate_query_set(vectors, spark):
    """Retrieval shape: a disjoint query set probes the corpus; results
    match brute force on clustered data and self-matches are kept
    (different id namespaces)."""
    df, centers = vectors
    cells = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], "cell_id int, centroid array<double>"
    )
    corpus = df.filter(F.col("vec_id") % 5 != 0).select("vec_id", "emb")
    qs = df.filter(F.col("vec_id") % 5 == 0).select("vec_id", "emb")
    approx = ivf_knn(corpus, cells, k=3, n_probe=1, queries=qs)
    rows = approx.collect()
    assert {r["query_id"] for r in rows} == {
        r["vec_id"] for r in qs.collect()
    }
    # neighbors come from the corpus only
    corpus_ids = {r["vec_id"] for r in corpus.collect()}
    assert all(r["neighbor_id"] in corpus_ids for r in rows)
    # vs brute force over the same (queries, corpus) split; drop_self=False
    # mirrors ivf_knn's separate-namespace retrieval semantics
    truth = _pairs(brute_force_knn(qs, corpus, k=3, drop_self=False))
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert len(truth & got) / len(truth) >= 0.95


def test_ivf_deterministic(vectors, spark):
    df, centers = vectors
    cells = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], "cell_id int, centroid array<double>"
    )
    base = df.select("vec_id", "emb")
    a = sorted(map(str, ivf_knn(base, cells, k=2).collect()))
    b = sorted(map(str, ivf_knn(base, cells, k=2).collect()))
    assert a == b


def test_semantic_dedup_composition(spark):
    """SemDeDup composition: near-identical vectors within a block
    collapse to one representative; distinct vectors all survive."""
    from data_governance_spark.operators.similarity import semantic_dedup

    rows = [
        (1, 0, [1.0, 0.0, 0.0]),
        (2, 0, [0.999, 0.01, 0.0]),   # ~dup of 1 (same block)
        (3, 0, [0.0, 1.0, 0.0]),      # distinct
        (4, 1, [1.0, 0.0, 0.0]),      # identical to 1 but other block
        (5, 1, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, cell int, emb array<double>")
    labels, kept = semantic_dedup(df, "cell", threshold=0.99)
    lab = {r["id"]: r["comp"] for r in labels.collect()}
    assert lab[2] == lab[1] == 1  # collapsed
    assert lab[3] == 3 and lab[4] == 4 and lab[5] == 5
    assert sorted(r["vec_id"] for r in kept.collect()) == [1, 3, 4, 5]
    # precomputed-pairs reuse path (what the e07 gate persists) gives
    # the identical result
    from data_governance_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    pre = cosine_neardup_pairs(df, "cell", threshold=0.99)
    _, kept2 = semantic_dedup(df, "cell", pairs=pre)
    assert sorted(r["vec_id"] for r in kept2.collect()) == [1, 3, 4, 5]


# --------------------------------------------------------------------------
# exact_rerank (r12): the candidates -> exact-rerank production shape
# --------------------------------------------------------------------------


def _rk_map(df):
    return {
        (r["query_id"], r["rk"]): (r["neighbor_id"], round(r["cosine"], 9))
        for r in df.collect()
    }


def test_rerank_equals_brute_force_with_lossless_candidates(vectors, spark):
    """Lossless PQ candidates at k' = 2k provably contain the true
    top-k, so rerank must reproduce brute force bit-for-bit — ids,
    ranks, AND exact cosines."""
    from data_governance_spark.operators.pq import (
        codebooks_from_vectors,
        pq_encode,
        pq_knn,
    )
    from data_governance_spark.operators.similarity import exact_rerank

    df, _ = vectors
    corpus = df.select("vec_id", "emb")
    queries = df.filter(F.col("vec_id") % 10 == 0).select("vec_id", "emb")
    vecs = [list(r["emb"]) for r in corpus.collect()]
    books = codebooks_from_vectors(vecs, m=4)
    codes = pq_encode(corpus, books)
    cand = pq_knn(queries, codes, books, k=6)
    got = exact_rerank(queries, cand, corpus, k=3)
    ref = brute_force_knn(queries, corpus, k=3, drop_self=False)
    assert _rk_map(got) == _rk_map(ref)


def test_rerank_recovers_ranking_from_lossy_candidates(vectors, spark):
    """With LOSSY trained codebooks the ADC order is approximate; the
    rerank must (a) emit EXACT cosines for whatever pool it got and
    (b) never do worse than the raw ADC cut at the same k."""
    from data_governance_spark.operators.pq import (
        pq_encode,
        pq_knn,
        train_pq_codebooks,
    )
    from data_governance_spark.operators.similarity import exact_rerank

    df, _ = vectors
    corpus = df.select("vec_id", "emb")
    queries = df.filter(F.col("vec_id") % 10 == 0).select("vec_id", "emb")
    books = train_pq_codebooks(corpus, m=4, ks=8, sample_n=60, seed=11)
    codes = pq_encode(corpus, books)
    k = 3
    cand = pq_knn(queries, codes, books, k=4 * k)
    got = exact_rerank(queries, cand, corpus, k=k)
    ref = brute_force_knn(queries, corpus, k=k, drop_self=False)
    truth = {}
    exact_cos = {}
    for r in ref.collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        exact_cos[(r["query_id"], r["neighbor_id"])] = r["cosine"]
    pool = {}
    for r in cand.collect():
        pool.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    adc_top = {}
    for r in cand.filter(F.col("rk") <= k).collect():
        adc_top.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    rerank_top = {}
    for r in got.collect():
        rerank_top.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        # (a) exact cosines: match brute force where the pair is shared
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert abs(r["cosine"] - exact_cos[key]) < 1e-12
    for qid, t in truth.items():
        # (b) within the pool, rerank picks the exact best — recall can
        # only improve over the ADC cut
        hits_rr = len(rerank_top.get(qid, set()) & t)
        hits_adc = len(adc_top.get(qid, set()) & t)
        assert hits_rr >= hits_adc
        # everything the pool contains of the truth must surface
        assert rerank_top.get(qid, set()) & t == pool.get(qid, set()) & t


def test_rerank_dedups_overlapping_candidate_tiers(vectors, spark):
    """Two candidate tiers naming the same (query, neighbor) pair must
    not inflate ranks — ranks stay 1..k, each neighbor once."""
    from data_governance_spark.operators.similarity import exact_rerank

    df, _ = vectors
    corpus = df.select("vec_id", "emb")
    queries = df.filter(F.col("vec_id") % 15 == 0).select("vec_id", "emb")
    cand = brute_force_knn(queries, corpus, k=5, drop_self=False)
    doubled = cand.unionByName(cand)
    got = exact_rerank(queries, doubled, corpus, k=5).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append((r["rk"], r["neighbor_id"]))
    for qid, rows in per_q.items():
        rks = sorted(rk for rk, _ in rows)
        assert rks == list(range(1, len(rows) + 1))
        nbrs = [n for _, n in rows]
        assert len(nbrs) == len(set(nbrs))


def test_rerank_plan_broadcasts_candidates(vectors, spark):
    """The corpus side must stream through broadcast hash joins — a
    sort-merge join (corpus shuffle) would defeat the composition's
    whole point at scale."""
    from data_governance_spark.operators.similarity import exact_rerank

    df, _ = vectors
    corpus = df.select("vec_id", "emb")
    queries = df.filter(F.col("vec_id") % 15 == 0).select("vec_id", "emb")
    cand = brute_force_knn(queries, corpus, k=5, drop_self=False)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = (
        exact_rerank(queries, cand, corpus, k=3)
        ._jdf.queryExecution()
        .explainString(mode)
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
