"""Product quantization for embedding similarity search (Jégou,
Douze & Schmid 2011, "Product Quantization for Nearest Neighbor
Search") — the memory tier of ANN: a D-dim float vector becomes M
one-byte-ish codes (one per subspace), a 32-512× compression that is
what actually lets a 100 TB embedding corpus live in scan-able storage.
The IVF operator (``operators/similarity.ivf_knn``) is the *pruning*
dial (scan fewer vectors); PQ is the *per-vector cost* dial (each
scanned vector costs M table lookups instead of D multiplies, and 1/Nth
the bytes) — production systems compose them (IVFADC); here each is a
first-class operator and the composition is a filter + join away.

Pieces:

- ``train_pq_codebooks`` — per-subspace Lloyd's k-means on a BOUNDED
  deterministic hash-sample collected to the driver (the published
  recipe: codebooks train on ~10^4-10^5 vectors regardless of corpus
  size; numpy-vectorized, empty clusters re-seeded from the farthest
  points). Only ``M × ks × D/M`` floats ever exist — the codebook
  broadcasts as a closure constant.
- ``codebooks_from_vectors`` — the lossless/degenerate construction
  (every distinct subvector is a codeword): exact by construction, so
  the driver gate and tests can pin the FULL machinery (encode → LUT →
  ADC → merge) against brute force bit-for-bit, the e05 'ivf'
  all-cells-probed pattern.
- ``pq_encode`` — map-only Arrow pass: per subspace, argmin Euclidean
  distance to the codewords (one ``(batch × ks)`` matrix op per
  subspace); emits the code array plus the RECONSTRUCTED norm (the
  norm of the quantized vector — ADC cosine needs the corpus norm, and
  storing the true norm would hide quantization error from the
  estimate, making scores look exact when they are not).
- ``pq_knn`` — asymmetric distance computation (ADC, the paper's §IV):
  queries stay UNQUANTIZED; per query one ``M × ks`` lookup table of
  subspace dots is built once (driver-side — the query set is the
  small, broadcast side, same contract as ``brute_force_knn``), then
  every corpus code scores with M gathers + a sum: map-only over the
  code table, partition-local top-k, then one tiny global merge —
  no shuffle of the corpus, no Python per-row.

Reference twin: none — training-data extension per SURVEY.md §6
(Jégou 2011 is the published method).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

__all__ = [
    "PQCodebooks",
    "train_pq_codebooks",
    "codebooks_from_vectors",
    "pq_encode",
    "pq_knn",
    "ivfadc_residuals",
    "ivfadc_encode",
    "ivfadc_knn",
]


@dataclass
class PQCodebooks:
    """``books[m]`` is the (ks_m, dsub) codeword matrix of subspace m.
    Subspaces are contiguous equal slices of the vector (the paper's
    natural splitting); ragged ks per subspace is allowed — the
    lossless construction yields one codeword per DISTINCT subvector."""

    books: list[np.ndarray]

    def __post_init__(self):
        if not self.books:
            raise ValueError("empty codebooks")
        dsub = self.books[0].shape[1]
        if any(b.ndim != 2 or b.shape[1] != dsub for b in self.books):
            raise ValueError("all subspace codebooks must be (ks, D/M)")
        if any(b.shape[0] < 1 for b in self.books):
            raise ValueError("every subspace needs >= 1 codeword")

    @property
    def m(self) -> int:
        return len(self.books)

    @property
    def dsub(self) -> int:
        return self.books[0].shape[1]

    @property
    def dim(self) -> int:
        return self.m * self.dsub

    @property
    def byte_packable(self) -> bool:
        """True when every subspace has <= 256 codewords — codes then
        store as ONE byte each (a binary column), the compression PQ
        exists for. The lossless construction can exceed 256 (one
        codeword per distinct subvector) and falls back to array<int>."""
        return all(b.shape[0] <= 256 for b in self.books)


def _check_dim(dim: int, m: int) -> int:
    if m < 1 or dim % m != 0:
        raise ValueError(
            f"m ({m}) must divide the vector dim ({dim}) — PQ subspaces "
            "are equal contiguous slices"
        )
    return dim // m


def _collect_sample(
    df: DataFrame, id_col: str, vec_col: str, sample_n: int, seed: int
) -> np.ndarray:
    """Deterministic bounded training sample: the sample_n vectors with
    the smallest xxhash64(id, seed) — stable under repartition/growth
    (the operators/sampling.py rule: never partition-order sampling)."""
    rows = (
        df.select(
            F.col(vec_col).alias("v"),
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("_h"),
            F.col(id_col).alias("_i"),
        )
        # id tie-break: duplicate ids (or a hash collision) at the
        # sample_n boundary must not be resolved by partition order
        .orderBy("_h", "_i")
        .limit(sample_n)
        .collect()
    )
    if not rows:
        raise ValueError("train_pq_codebooks: input has no vectors")
    return np.asarray([list(r["v"]) for r in rows], dtype=np.float64)


def _sqdist(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(n, k) squared Euclidean distances via the expansion trick —
    shared by the trainer's assignment step and the encoder."""
    return (
        (x * x).sum(1)[:, None]
        - 2.0 * (x @ c.T)
        + (c * c).sum(1)[None, :]
    )


def _encode_subspaces(
    x: np.ndarray, bks: list[np.ndarray], dsub: int
) -> tuple[np.ndarray, np.ndarray]:
    """(codes (n, M), reconstruction (n, D)) — per-subspace argmin to
    the codewords; shared by the flat and residual encoders."""
    codes = np.empty((x.shape[0], len(bks)), dtype=np.int64)
    recon = np.empty_like(x)
    for i, b in enumerate(bks):
        xs = x[:, i * dsub : (i + 1) * dsub]
        codes[:, i] = _sqdist(xs, b).argmin(1)
        recon[:, i * dsub : (i + 1) * dsub] = b[codes[:, i]]
    return codes, recon


def _unpack_codes(raw, packed: bool, m: int) -> np.ndarray:
    """(n, M) int codes from a pandas column of binary (packed) or
    list (unpacked) values; shared by both ADC scorers."""
    if packed:
        return (
            np.frombuffer(b"".join(raw), dtype=np.uint8)
            .reshape(len(raw), m)
            .astype(np.int64)
        )
    return np.stack(raw)


def _kmeans(
    x: np.ndarray, ks: int, n_iter: int, rng: np.random.Generator
) -> np.ndarray:
    """Vectorized Lloyd's on the driver (x is the bounded sample's
    subspace slice). Deterministic given the rng; empty clusters
    re-seed from the points farthest from their centroids (the
    standard fix — a dead codeword wastes 1/ks of the code space)."""
    n = x.shape[0]
    ks = min(ks, n)
    centers = x[rng.permutation(n)[:ks]].copy()
    for _ in range(n_iter):
        d2 = _sqdist(x, centers)
        assign = d2.argmin(1)
        counts = np.bincount(assign, minlength=ks)
        sums = np.zeros_like(centers)
        np.add.at(sums, assign, x)
        nonempty = counts > 0
        centers[nonempty] = sums[nonempty] / counts[nonempty, None]
        if not nonempty.all():
            worst = d2[np.arange(n), assign].argsort()[::-1]
            refill = worst[: (~nonempty).sum()]
            centers[~nonempty] = x[refill]
    return centers


def train_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    ks: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    sample_n: int = 20_000,
    n_iter: int = 10,
    seed: int = 42,
) -> PQCodebooks:
    """Per-subspace k-means codebooks from a bounded hash-sample (see
    module doc). ``ks`` caps at the sample size per subspace."""
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("train_pq_codebooks: input has no vectors")
    dsub = _check_dim(first["d"], m)
    sample = _collect_sample(df, id_col, vec_col, sample_n, seed)
    rng = np.random.default_rng(seed)
    books = [
        _kmeans(
            np.ascontiguousarray(sample[:, i * dsub : (i + 1) * dsub]),
            ks,
            n_iter,
            rng,
        )
        for i in range(m)
    ]
    return PQCodebooks(books)


def codebooks_from_vectors(vectors, m: int) -> PQCodebooks:
    """Lossless codebooks: one codeword per DISTINCT subvector of the
    given vectors (an iterable of equal-length float sequences). With
    these, ``pq_encode`` is exact (every subvector quantizes to itself
    at distance 0) and ``pq_knn`` must reproduce brute-force top-k —
    the exactness construction the driver gate and tests pin the
    machinery with. Only for corpora whose distinct-subvector count is
    codebook-sized; real corpora train with :func:`train_pq_codebooks`."""
    arr = np.asarray(list(vectors), dtype=np.float64)
    if arr.ndim != 2 or arr.shape[0] == 0:
        raise ValueError("need a non-empty (n, dim) vector collection")
    dsub = _check_dim(arr.shape[1], m)
    books = [
        np.unique(arr[:, i * dsub : (i + 1) * dsub], axis=0)
        for i in range(m)
    ]
    return PQCodebooks(books)


def pq_encode(
    df: DataFrame,
    books: PQCodebooks,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    code_col: str = "pq_code",
    nrm_col: str = "pq_nrm",
) -> DataFrame:
    """``(id_col, code_col, nrm_col double)`` — each vector's
    per-subspace nearest-codeword ids plus the RECONSTRUCTED
    (quantized) norm. When the codebooks are ``byte_packable``
    (ks <= 256 everywhere — the trained default) the codes store as a
    BINARY column of M bytes: that one-byte-per-code layout IS the
    compression PQ exists for (the array<int> fallback, used by the
    oversized lossless construction, costs 4 bytes per code). Map-only
    Arrow pass; the codebooks ride the closure (M × ks × dsub floats).
    Ties break toward the lower codeword id (np.argmin)."""
    bks = [b.copy() for b in books.books]
    dsub = books.dsub
    dim = books.dim
    packed = books.byte_packable
    code_type = "binary" if packed else "array<int>"

    @F.pandas_udf(f"{code_col} {code_type}, {nrm_col} double")
    def enc(v: pd.Series) -> pd.DataFrame:
        x = np.asarray([list(e) for e in v], dtype=np.float64)
        if x.shape[0] == 0:  # no rows (x.size==0 would also swallow
            return pd.DataFrame({code_col: [], nrm_col: []})  # dim-0 rows)
        if x.ndim != 2 or x.shape[1] != dim:
            raise ValueError(
                f"vector dim {x.shape[1] if x.ndim == 2 else 0} != "
                f"codebook dim {dim}"
            )
        codes, recon = _encode_subspaces(x, bks, dsub)
        if packed:
            out_codes = [row.astype(np.uint8).tobytes() for row in codes]
        else:
            out_codes = [row.tolist() for row in codes]
        return pd.DataFrame(
            {code_col: out_codes, nrm_col: np.sqrt((recon**2).sum(1))}
        )

    tmp = "_pq_enc"
    return (
        df.withColumn(tmp, enc(F.col(vec_col)))
        .select(id_col, f"{tmp}.{code_col}", f"{tmp}.{nrm_col}")
    )


def pq_knn(
    queries: DataFrame,
    codes: DataFrame,
    books: PQCodebooks,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    code_col: str = "pq_code",
    nrm_col: str = "pq_nrm",
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, cosine, rk) with the cosine
    ESTIMATED from codes (exact when the codebooks are lossless).
    ``queries`` is the small side, collected to the driver — but the
    closure ships only the query matrix + codebooks; each worker
    re-derives the per-query M × ks lookup tables with one matmul per
    partition (see the comment below — driver-built LUTs were ~50 MB
    of pickle per task under the lossless gate books).  ``codes`` is
    the corpus-sized ``pq_encode`` output and never shuffles: each
    partition scores all queries with M gathers + a sum per row, keeps
    its local top-k per query, and only those candidates (partitions ×
    queries × k rows) reach the global merge."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    qrows = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).collect()
    if not qrows:
        spark = codes.sparkSession
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rk int"
        )
    qids = np.asarray([r["qid"] for r in qrows], dtype=np.int64)
    qm = np.asarray([list(r["qv"]) for r in qrows], dtype=np.float64)
    if qm.shape[1] != books.dim:
        raise ValueError(
            f"query dim {qm.shape[1]} != codebook dim {books.dim}"
        )
    dsub = books.dsub
    # LUT[q][m][j] = dot(query_q's m-th subvector, codeword j) — ragged
    # ks per subspace, a list of (nq, ks_m) arrays. Computed LAZILY in
    # the worker from (qm, codebooks), NOT on the driver: the closure
    # then ships nq×dim + M×ks×dsub floats instead of nq × Σks — the
    # lossless gate's 2000-codeword books make driver-built LUTs ~50 MB
    # of pickle per task (measured: e05's scoring stage spent 186 s of
    # task wall at 2 s CPU, blocked feeding the closure to 32 workers).
    # One matmul per partition re-derives them bitwise-identically
    # (same numpy op on the same operands).
    bks = [b.copy() for b in books.books]
    q_nrm = np.sqrt((qm * qm).sum(1))
    # zero-norm QUERY guard, mirroring the corpus-side one: 0/0 would
    # be NaN, and F.desc ranks NaN above every real cosine
    q_nrm = np.where(q_nrm == 0.0, np.inf, q_nrm)
    packed = books.byte_packable
    n_books = books.m
    topk = k

    def score(batches):
        luts = None
        for pdf in batches:
            if pdf.empty:
                continue
            if luts is None:
                luts = [
                    qm[:, i * dsub : (i + 1) * dsub] @ b.T
                    for i, b in enumerate(bks)
                ]
            cids = pdf["_pq_id"].to_numpy()
            nrms = pdf["_pq_nrm"].to_numpy(dtype=np.float64)
            cm = _unpack_codes(pdf["_pq_code"].to_numpy(), packed, n_books)
            # dots[q, c] = sum over m of LUT[q][m][code[c, m]]
            dots = np.zeros((len(qids), cm.shape[0]), dtype=np.float64)
            for i, lut in enumerate(luts):
                dots += lut[:, cm[:, i]]
            denom = q_nrm[:, None] * np.where(nrms == 0.0, np.inf, nrms)
            sims = dots / denom
            # zero-norm corpus rows: brute_force_knn yields NULL cosine
            # (sorts LAST under desc); 0/inf = 0.0 would sort above
            # negative cosines and diverge the SELECTION — pin to -inf
            # so they are picked only when k exceeds the real candidates
            # (the cosine VALUE then reads -inf vs brute force's NULL)
            sims[:, nrms == 0.0] = -np.inf
            from data_governance_spark.operators.similarity import (
                local_topk_idx,
            )

            out_q, out_n, out_s = [], [], []
            for qi in range(sims.shape[0]):
                row = sims[qi]
                # deterministic SELECTION under score ties (PQ code
                # collisions tie routinely) — argpartition alone keeps
                # an arbitrary, batch-layout-dependent tie subset
                idx = local_topk_idx(row, cids, topk)
                out_q.extend([int(qids[qi])] * len(idx))
                out_n.extend(int(cids[j]) for j in idx)
                out_s.extend(float(row[j]) for j in idx)
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_s}
            )

    cand = codes.select(
        F.col(id_col).alias("_pq_id"),
        F.col(code_col).alias("_pq_code"),
        F.col(nrm_col).alias("_pq_nrm"),
    ).mapInPandas(score, "query_id long, neighbor_id long, cosine double")
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return cand.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )


# --------------------------------------------------------------------------
# IVFADC — the published composition (Jégou 2011 §V): IVF prunes WHICH
# vectors a query scores (probe the n_probe nearest cells), PQ
# compresses WHAT each scored vector costs — and the codes quantize the
# RESIDUAL x − centroid(cell), not x itself: residuals concentrate near
# zero, so the same ks buys far finer quantization than coding raw
# vectors. dot(q, x) = dot(q, c) + dot(q, r) — the first term is one
# number per (query, probed cell), the second is the ADC gather over
# the residual codebooks.
# --------------------------------------------------------------------------


def ivfadc_residuals(
    df: DataFrame,
    cells: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    cell_id_col: str = "cell_id",
    cell_vec_col: str = "centroid",
) -> DataFrame:
    """(id_col, cell_id, ``res`` array<double>) — each vector's nearest
    cell (max cosine, ``ivf_knn``'s assignment rule) and its residual
    ``x − centroid``. Train the residual codebooks on THIS relation
    (``train_pq_codebooks(residuals, vec_col="res")``) — codebooks
    trained on raw vectors mis-model the residual distribution, the
    point of the composition. Broadcast cells + one window; map-only
    otherwise."""
    from data_governance_spark.operators.similarity import dot, norm

    c = cells.select(
        F.col(cell_id_col).alias("cell_id"),
        F.col(cell_vec_col).alias("_ctr"),
        norm(F.col(cell_vec_col)).alias("_cnrm"),
    )
    scored = df.select(
        id_col, vec_col, norm(F.col(vec_col)).alias("_vnrm")
    ).crossJoin(F.broadcast(c)).select(
        id_col,
        vec_col,
        "cell_id",
        "_ctr",
        (
            dot(F.col(vec_col), F.col("_ctr"))
            / (F.col("_vnrm") * F.col("_cnrm"))
        ).alias("_csim"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("cell_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            id_col,
            "cell_id",
            F.zip_with(
                F.col(vec_col), F.col("_ctr"), lambda x, y: x - y
            ).alias("res"),
        )
    )


def ivfadc_encode(
    residuals: DataFrame,
    cells: DataFrame,
    books: PQCodebooks,
    id_col: str = "vec_id",
    cell_id_col: str = "cell_id",
    cell_vec_col: str = "centroid",
    res_col: str = "res",
) -> DataFrame:
    """The IVFADC index: ``(id_col, cell_id, pq_code, pq_nrm)`` where
    the code quantizes the RESIDUAL and ``pq_nrm`` is the norm of the
    RECONSTRUCTED vector ``centroid + recon(residual)`` (the cosine
    denominator must carry quantization error, same rule as
    ``pq_encode``). Map-only Arrow pass; centroids ride the closure."""
    rows = cells.select(
        F.col(cell_id_col).alias("c"), F.col(cell_vec_col).alias("v")
    ).collect()
    ctr = {int(r["c"]): np.asarray(list(r["v"]), dtype=np.float64) for r in rows}
    if not ctr:
        raise ValueError("ivfadc_encode: empty cells table")
    bks = [b.copy() for b in books.books]
    dsub = books.dsub
    dim = books.dim
    packed = books.byte_packable
    code_type = "binary" if packed else "array<int>"

    @F.pandas_udf(f"pq_code {code_type}, pq_nrm double")
    def enc(res: pd.Series, cell: pd.Series) -> pd.DataFrame:
        x = np.asarray([list(e) for e in res], dtype=np.float64)
        if x.shape[0] == 0:
            return pd.DataFrame({"pq_code": [], "pq_nrm": []})
        if x.ndim != 2 or x.shape[1] != dim:
            raise ValueError(
                f"residual dim {x.shape[1] if x.ndim == 2 else 0} != "
                f"codebook dim {dim}"
            )
        codes, recon = _encode_subspaces(x, bks, dsub)
        try:
            cent = np.stack([ctr[int(cc)] for cc in cell])
        except KeyError as e:
            raise ValueError(
                f"ivfadc_encode: residual row references cell_id {e} "
                "absent from the cells table — the residuals must have "
                "been built against THIS cells table (ivfadc_residuals)"
            ) from None
        nrm = np.sqrt(((cent + recon) ** 2).sum(1))
        if packed:
            out = [row.astype(np.uint8).tobytes() for row in codes]
        else:
            out = [row.tolist() for row in codes]
        return pd.DataFrame({"pq_code": out, "pq_nrm": nrm})

    tmp = "_ivfadc"
    return (
        residuals.withColumn(
            tmp, enc(F.col(res_col), F.col(cell_id_col))
        )
        .select(
            id_col,
            cell_id_col,
            f"{tmp}.pq_code",
            f"{tmp}.pq_nrm",
        )
    )


def ivfadc_knn(
    queries: DataFrame,
    index: DataFrame,
    cells: DataFrame,
    books: PQCodebooks,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    cell_id_col: str = "cell_id",
    cell_vec_col: str = "centroid",
) -> DataFrame:
    """Top-k over the IVFADC index: each query probes its ``n_probe``
    highest-cosine cells and ADC-scores only those cells' codes —
    ``dot(q, x) ≈ dot(q, centroid) + Σ_m LUT[m][code_m]`` over the
    residual codebooks, divided by ``q_nrm × pq_nrm``. With
    ``n_probe = n_cells`` and lossless residual codebooks the result
    equals brute force (the driver gate's exactness construction).

    Scale shape: queries AND cells are the small driver-side tables
    (probe lists + per-(query, cell) centroid dots are numpy on the
    driver, shipped in the closure; the residual-ADC LUTs are
    re-derived IN the worker from the query matrix + codebooks — see
    pq_knn); the corpus-sized index never shuffles — map-only scoring
    with partition-local top-k, then the tiny global merge. Probing
    skips (query, cell) pairs map-side: a batch's rows only score
    against the queries that probe their cell."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_probe < 1:
        raise ValueError(f"n_probe must be >= 1, got {n_probe}")
    qrows = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).collect()
    if not qrows:
        spark = index.sparkSession
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rk int"
        )
    crows = cells.select(
        F.col(cell_id_col).alias("c"), F.col(cell_vec_col).alias("v")
    ).collect()
    if not crows:
        raise ValueError("ivfadc_knn: empty cells table")
    qids = np.asarray([r["qid"] for r in qrows], dtype=np.int64)
    qm = np.asarray([list(r["qv"]) for r in qrows], dtype=np.float64)
    if qm.shape[1] != books.dim:
        raise ValueError(
            f"query dim {qm.shape[1]} != codebook dim {books.dim}"
        )
    cell_ids = np.asarray([int(r["c"]) for r in crows], dtype=np.int64)
    if len(set(cell_ids.tolist())) != len(cell_ids):
        raise ValueError(
            "ivfadc_knn: duplicate cell_id rows in the cells table — "
            "a duplicate would double-probe its cell and emit duplicate "
            "candidates that push real neighbors out of the top-k"
        )
    cm = np.asarray([list(r["v"]) for r in crows], dtype=np.float64)
    q_nrm = np.sqrt((qm * qm).sum(1))
    q_nrm = np.where(q_nrm == 0.0, np.inf, q_nrm)
    c_nrm = np.sqrt((cm * cm).sum(1))
    c_nrm = np.where(c_nrm == 0.0, np.inf, c_nrm)
    qc_dot = qm @ cm.T  # (nq, ncells): dot(q, centroid) — term 1
    # probe selection per query: cosine desc, cell id asc (ivf rule)
    csim = qc_dot / (q_nrm[:, None] * c_nrm[None, :])
    from data_governance_spark.operators.similarity import local_topk_idx

    np_probe = min(n_probe, len(cell_ids))
    probing: dict[int, list[int]] = {}  # cell_id -> query indices
    for qi in range(len(qids)):
        for j in local_topk_idx(csim[qi], cell_ids, np_probe):
            probing.setdefault(int(cell_ids[j]), []).append(qi)
    qc_by_cell = {int(cell_ids[j]): qc_dot[:, j] for j in range(len(cell_ids))}
    dsub = books.dsub
    # residual-ADC LUTs are worker-built from (qm, codebooks) — see
    # pq_knn: driver-built (nq × Σks) tables bloat the task closure by
    # ~50 MB under the lossless gate's 2000-codeword books
    bks = [b.copy() for b in books.books]
    packed = books.byte_packable
    n_books = books.m
    topk = k

    def score(batches):
        luts = None
        for pdf in batches:
            if pdf.empty:
                continue
            if luts is None:
                luts = [
                    qm[:, i * dsub : (i + 1) * dsub] @ b.T
                    for i, b in enumerate(bks)
                ]
            cells_arr = pdf["_iv_cell"].to_numpy()
            ids_arr = pdf["_iv_id"].to_numpy()
            nrms = pdf["_iv_nrm"].to_numpy(dtype=np.float64)
            codes = _unpack_codes(pdf["_iv_code"].to_numpy(), packed, n_books)
            out_q, out_n, out_s = [], [], []
            # per-query row accumulators across the batch's cells
            acc: dict[int, tuple[list, list]] = {}
            for cell in np.unique(cells_arr):
                qis = probing.get(int(cell))
                if not qis:
                    continue
                mask = cells_arr == cell
                sub_codes = codes[mask]
                sub_ids = ids_arr[mask]
                sub_nrm = np.where(nrms[mask] == 0.0, np.inf, nrms[mask])
                res_dot = np.zeros(
                    (len(qis), sub_codes.shape[0]), dtype=np.float64
                )
                for i, lut in enumerate(luts):
                    res_dot += lut[np.ix_(qis, sub_codes[:, i])]
                dots = res_dot + qc_by_cell[int(cell)][qis][:, None]
                sims = dots / (q_nrm[qis][:, None] * sub_nrm[None, :])
                # match brute force's NULL-sorts-last for zero-norm rows
                # (see pq_knn): selection parity, value reads -inf
                sims[:, nrms[mask] == 0.0] = -np.inf
                for row_i, qi in enumerate(qis):
                    sc, ni = acc.setdefault(qi, ([], []))
                    sc.append(sims[row_i])
                    ni.append(sub_ids)
            for qi, (sc, ni) in acc.items():
                row = np.concatenate(sc)
                nbr = np.concatenate(ni)
                idx = local_topk_idx(row, nbr, topk)
                out_q.extend([int(qids[qi])] * len(idx))
                out_n.extend(int(nbr[j]) for j in idx)
                out_s.extend(float(row[j]) for j in idx)
            if out_q:
                yield pd.DataFrame(
                    {"query_id": out_q, "neighbor_id": out_n, "cosine": out_s}
                )

    cand = index.select(
        F.col(id_col).alias("_iv_id"),
        F.col(cell_id_col).alias("_iv_cell"),
        F.col("pq_code").alias("_iv_code"),
        F.col("pq_nrm").alias("_iv_nrm"),
    ).mapInPandas(score, "query_id long, neighbor_id long, cosine double")
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return cand.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
