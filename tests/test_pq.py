"""Product quantization (operators/pq.py, Jégou 2011): lossless-
codebook exactness vs brute force (the machinery pin), trained-codebook
recall on clustered data, encode/ADC mechanics, and guards."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_governance_spark.operators.pq import (
    PQCodebooks,
    codebooks_from_vectors,
    pq_encode,
    pq_knn,
    train_pq_codebooks,
)
from data_governance_spark.operators.similarity import brute_force_knn

DIM = 16
M = 4


def _vecs(spark, vectors):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
        "vec_id long, emb array<double>",
    )


def _rand_vectors(n, dim=DIM, seed=3):
    rng = random.Random(seed)
    return [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n)]


def _knn_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append(
            (r["rk"], r["neighbor_id"])
        )
    return {q: [n for _rk, n in sorted(v)] for q, v in out.items()}


def test_lossless_codebooks_reproduce_brute_force(spark):
    """With one codeword per distinct subvector, encoding is exact and
    ADC top-k must equal brute-force top-k (ranks and neighbors), with
    cosines equal to 1e-9 — the e05-'ivf' style machinery pin."""
    vectors = _rand_vectors(60)
    df = _vecs(spark, vectors)
    books = codebooks_from_vectors(vectors, m=M)
    codes = pq_encode(df, books)
    q = df.filter(F.col("vec_id") < 7)
    got = pq_knn(q, codes, books, k=5)
    want = brute_force_knn(q, df, k=5, drop_self=False)
    assert _knn_sets(got) == _knn_sets(want)
    by_pair = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in want.collect()
    }
    for r in got.collect():
        assert abs(r["cosine"] - by_pair[(r["query_id"], r["neighbor_id"])]) < 1e-9


def test_encode_is_lossless_with_full_codebooks(spark):
    vectors = _rand_vectors(20)
    df = _vecs(spark, vectors)
    books = codebooks_from_vectors(vectors, m=M)
    rows = pq_encode(df, books).collect()
    for r in rows:
        # reconstructed norm equals the true norm when codes are exact
        vid = r["vec_id"]
        true_nrm = float(np.linalg.norm(vectors[vid]))
        assert abs(r["pq_nrm"] - true_nrm) < 1e-9
        assert len(r["pq_code"]) == M


def test_trained_codebooks_preserve_cluster_structure(spark):
    """10 well-separated clusters, ks=16 codewords/subspace. Within a
    tight cluster PQ codes COLLIDE by design (members quantize to the
    same codewords), so ADC cannot reproduce within-cluster rank order
    — the paper's resolution limit. What training + quantization must
    preserve: (a) every ADC top-5 neighbor comes from the query's own
    cluster (between-cluster separation survives), and (b) the true
    brute-force top-5 sits inside a modest ADC candidate set
    (recall@30 >= 90% — the rerank-after-ADC production shape)."""
    rng = random.Random(7)
    centers = [
        [rng.uniform(-5, 5) for _ in range(DIM)] for _ in range(10)
    ]
    vectors = [
        [c + rng.gauss(0, 0.15) for c in centers[i % 10]]
        for i in range(300)
    ]
    df = _vecs(spark, vectors)
    books = train_pq_codebooks(
        df, m=M, ks=16, sample_n=300, n_iter=8, seed=1
    )
    codes = pq_encode(df, books)
    q = df.filter(F.col("vec_id") < 20)
    got5 = _knn_sets(pq_knn(q, codes, books, k=5))
    for qid, nbrs in got5.items():
        assert all(n % 10 == qid % 10 for n in nbrs), (qid, nbrs)
    got30 = _knn_sets(pq_knn(q, codes, books, k=30))
    want = _knn_sets(brute_force_knn(q, df, k=5, drop_self=False))
    hits = total = 0
    for qid, nbrs in want.items():
        total += len(nbrs)
        hits += len(set(nbrs) & set(got30[qid]))
    assert hits / total >= 0.9, f"recall@30 {hits}/{total}"


def test_compression_shape_and_determinism(spark):
    vectors = _rand_vectors(100)
    df = _vecs(spark, vectors)
    books = train_pq_codebooks(df, m=M, ks=8, sample_n=100, seed=5)
    assert books.m == M and books.dsub == DIM // M
    assert all(b.shape == (8, DIM // M) for b in books.books)
    c1 = sorted(map(tuple, (r["pq_code"] for r in pq_encode(df, books).collect())))
    books2 = train_pq_codebooks(df, m=M, ks=8, sample_n=100, seed=5)
    c2 = sorted(map(tuple, (r["pq_code"] for r in pq_encode(df, books2).collect())))
    assert c1 == c2  # same seed -> same codebooks -> same codes
    assert all(0 <= c < 8 for row in c1 for c in row)


def test_quantization_error_shrinks_with_ks(spark):
    vectors = _rand_vectors(200, seed=11)
    df = _vecs(spark, vectors)
    x = np.asarray(vectors)

    def mean_err(ks):
        books = train_pq_codebooks(df, m=M, ks=ks, sample_n=200, seed=2)
        errs = []
        for r in pq_encode(df, books).collect():
            rec = np.concatenate(
                [books.books[i][r["pq_code"][i]] for i in range(M)]
            )
            errs.append(float(np.linalg.norm(x[r["vec_id"]] - rec)))
        return sum(errs) / len(errs)

    assert mean_err(32) < mean_err(4)


def test_guards(spark):
    vectors = _rand_vectors(10)
    df = _vecs(spark, vectors)
    with pytest.raises(ValueError, match="must divide"):
        train_pq_codebooks(df, m=5)  # 5 does not divide 16
    with pytest.raises(ValueError, match="must divide"):
        codebooks_from_vectors(vectors, m=3)
    with pytest.raises(ValueError, match="non-empty"):
        codebooks_from_vectors([], m=2)
    books = codebooks_from_vectors(vectors, m=M)
    with pytest.raises(ValueError, match="k must be"):
        pq_knn(df, pq_encode(df, books), books, k=0)
    # dim mismatch raises at encode time (executor-side, wrapped)
    bad = _vecs(spark, [[1.0] * 8])
    with pytest.raises(Exception, match="dim"):
        pq_encode(bad, books).collect()
    # empty query set returns an empty, correctly-typed frame
    empty_q = df.filter(F.col("vec_id") < 0)
    out = pq_knn(empty_q, pq_encode(df, books), books, k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "cosine", "rk",
    ]


def test_zero_vector_never_tops(spark):
    """A zero corpus vector has reconstructed norm 0 — it must sort
    LAST like brute_force_knn's NULL cosine (desc puts NULL last), not
    at 0.0 above negative cosines: selection parity with brute force
    on corpora mixing zero vectors and negative cosines."""
    vectors = _rand_vectors(12)
    vectors.append([0.0] * DIM)  # vec_id 12
    df = _vecs(spark, vectors)
    books = codebooks_from_vectors(vectors, m=M)
    codes = pq_encode(df, books)
    q = df.filter(F.col("vec_id") < 3)
    got = pq_knn(q, codes, books, k=4).collect()
    for r in got:
        assert np.isfinite(r["cosine"])
        assert r["neighbor_id"] != 12  # 12 real candidates > k=4
    # selection parity with brute force even when k forces the zero
    # row in: it arrives LAST (rk — brute force ranks its NULL last)
    full = pq_knn(q, codes, books, k=13).collect()
    assert any(
        r["cosine"] < 0.0 for r in full if np.isfinite(r["cosine"])
    ), "fixture must exercise negative cosines"
    bf = brute_force_knn(q, df, k=13, drop_self=False).collect()
    key = lambda rows: sorted((r["query_id"], r["rk"], r["neighbor_id"]) for r in rows)
    assert key(full) == key(bf)
    for r in full:
        if r["neighbor_id"] == 12:
            assert r["rk"] == 13 and r["cosine"] == -np.inf


def test_byte_packing_and_layout_parity(spark):
    """Trained ks<=256 codebooks pack codes as an M-byte binary column
    (the compression PQ exists for); an oversized lossless codebook
    falls back to array<int>. Both layouts must give identical
    neighbors through pq_knn."""
    vectors = _rand_vectors(80, seed=21)
    df = _vecs(spark, vectors)
    trained = train_pq_codebooks(df, m=M, ks=16, sample_n=80, seed=9)
    assert trained.byte_packable
    codes_t = pq_encode(df, trained)
    assert dict(codes_t.dtypes)["pq_code"] == "binary"
    row = codes_t.first()
    assert len(row["pq_code"]) == M  # M bytes, not 4M
    # a fat lossless codebook (>256 codewords in some subspace)
    import numpy as np

    fat = PQCodebooks(
        [np.random.default_rng(0).normal(size=(300, DIM // M))
         for _ in range(M)]
    )
    assert not fat.byte_packable
    codes_f = pq_encode(df, fat)
    assert dict(codes_f.dtypes)["pq_code"] == "array<int>"
    q = df.filter(F.col("vec_id") < 4)
    got_t = _knn_sets(pq_knn(q, codes_t, trained, k=3))
    # same books, re-encoded: identical output regardless of layout
    got_t2 = _knn_sets(pq_knn(q, pq_encode(df, trained), trained, k=3))
    assert got_t == got_t2
    assert set(_knn_sets(pq_knn(q, codes_f, fat, k=3))) == set(got_t)


def test_zero_norm_query_never_nan(spark):
    """An all-zero QUERY vector must yield finite (0.0) cosines, not
    NaN rows ranked first by F.desc (the one-sided-guard regression)."""
    vectors = _rand_vectors(10, seed=5)
    df = _vecs(spark, vectors)
    books = codebooks_from_vectors(vectors + [[0.0] * DIM], m=M)
    codes = pq_encode(df, books)
    zq = _vecs(spark, [[0.0] * DIM])  # query id 0, zero vector
    import numpy as np

    rows = pq_knn(zq, codes, books, k=3).collect()
    assert rows, "zero query should still return rows"
    for r in rows:
        assert np.isfinite(r["cosine"]) and r["cosine"] == 0.0


def test_tied_scores_select_lowest_ids(spark):
    """Boundary TIES must be selected deterministically (lowest
    neighbor ids), not by argpartition's arbitrary subset — many
    identical vectors share one code and tie exactly."""
    base = _rand_vectors(1, seed=13)[0]
    vectors = [list(base) for _ in range(30)]  # 30 exact ties
    df = _vecs(spark, vectors)
    books = codebooks_from_vectors(vectors, m=M)
    codes = pq_encode(df, books)
    got = _knn_sets(pq_knn(df.filter(F.col("vec_id") == 0), codes, books, k=5))
    assert got == {0: [0, 1, 2, 3, 4]}


# --------------------------------------------------------------------------
# IVFADC (Jégou 2011 §V — the IVF × PQ-on-residuals composition)
# --------------------------------------------------------------------------
from data_governance_spark.operators.pq import (  # noqa: E402
    ivfadc_encode,
    ivfadc_knn,
    ivfadc_residuals,
)
from data_governance_spark.operators.similarity import (  # noqa: E402
    train_ivf_cells,
)


def _ivfadc_setup(spark, vectors, n_cells=4, lossless=True, ks=16):
    df = _vecs(spark, vectors)
    cells = train_ivf_cells(df, k=n_cells, n_iter=4, seed=3)
    res = ivfadc_residuals(df, cells)
    if lossless:
        res_vecs = [list(r["res"]) for r in res.collect()]
        books = codebooks_from_vectors(res_vecs, m=M)
    else:
        books = train_pq_codebooks(
            res, m=M, ks=ks, vec_col="res", sample_n=10_000, seed=4
        )
    index = ivfadc_encode(res, cells, books)
    return df, cells, books, index


def test_ivfadc_all_probes_lossless_equals_brute_force(spark):
    """n_probe = n_cells + lossless RESIDUAL codebooks: the full
    composition (assign → residual-encode → probe → centroid-dot +
    residual-ADC → merge) must reproduce brute-force top-k."""
    vectors = _rand_vectors(60, seed=17)
    df, cells, books, index = _ivfadc_setup(spark, vectors, n_cells=4)
    q = df.filter(F.col("vec_id") < 6)
    got = ivfadc_knn(q, index, cells, books, k=5, n_probe=4)
    want = brute_force_knn(q, df, k=5, drop_self=False)
    assert _knn_sets(got) == _knn_sets(want)
    by_pair = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in want.collect()
    }
    for r in got.collect():
        assert abs(r["cosine"] - by_pair[(r["query_id"], r["neighbor_id"])]) < 1e-9


def test_ivfadc_residual_reconstruction_is_exact_when_lossless(spark):
    vectors = _rand_vectors(30, seed=19)
    df, cells, books, index = _ivfadc_setup(spark, vectors, n_cells=3)
    for r in index.collect():
        true_nrm = float(np.linalg.norm(vectors[r["vec_id"]]))
        assert abs(r["pq_nrm"] - true_nrm) < 1e-9


def test_ivfadc_pruning_skips_cells(spark):
    """n_probe=1 on well-separated clusters: every query still finds
    its own-cluster neighbors (the nearest cell IS the right cell),
    and results restricted to the probed cell only."""
    rng = random.Random(23)
    centers = [[rng.uniform(-8, 8) for _ in range(DIM)] for _ in range(4)]
    vectors = [
        [c + rng.gauss(0, 0.05) for c in centers[i % 4]] for i in range(80)
    ]
    df, cells, books, index = _ivfadc_setup(spark, vectors, n_cells=4)
    q = df.filter(F.col("vec_id") < 8)
    got = _knn_sets(ivfadc_knn(q, index, cells, books, k=4, n_probe=1))
    for qid, nbrs in got.items():
        assert all(n % 4 == qid % 4 for n in nbrs), (qid, nbrs)
        assert nbrs[0] == qid  # self at rank 1 (cosine 1.0)


def test_ivfadc_trained_books_recall(spark):
    """Trained residual codebooks at n_probe=2: true top-5 inside the
    ADC top-20 for >= 90% (the rerank shape, as for flat PQ)."""
    rng = random.Random(29)
    centers = [[rng.uniform(-5, 5) for _ in range(DIM)] for _ in range(5)]
    vectors = [
        [c + rng.gauss(0, 0.3) for c in centers[i % 5]] for i in range(250)
    ]
    df, cells, books, index = _ivfadc_setup(
        spark, vectors, n_cells=5, lossless=False, ks=32
    )
    q = df.filter(F.col("vec_id") < 15)
    got = _knn_sets(ivfadc_knn(q, index, cells, books, k=20, n_probe=2))
    want = _knn_sets(brute_force_knn(q, df, k=5, drop_self=False))
    hits = total = 0
    for qid, nbrs in want.items():
        total += len(nbrs)
        hits += len(set(nbrs) & set(got[qid]))
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_ivfadc_guards(spark):
    vectors = _rand_vectors(12, seed=31)
    df, cells, books, index = _ivfadc_setup(spark, vectors, n_cells=2)
    with pytest.raises(ValueError, match="n_probe"):
        ivfadc_knn(df, index, cells, books, k=2, n_probe=0)
    empty_q = df.filter(F.col("vec_id") < 0)
    out = ivfadc_knn(empty_q, index, cells, books, k=2, n_probe=1)
    assert out.count() == 0
