"""Trainable text-quality classifier: hashed bag-of-ngrams + logistic
regression — the linear fastText tier (Joulin et al. 2016, "Bag of
Tricks for Efficient Text Classification") that production LLM
pipelines use as the learned quality filter (the GPT-3 data work
trains exactly this shape against a high-quality reference corpus and
keeps documents the classifier scores well; DSIR — operators/dsir.py —
is the importance-weighting sibling, this is the discriminative one).

Model: score(doc) = sigmoid(w . x + b) where x is the L1-normalized
hashed count vector of word unigrams (+bigrams, the fastText default)
— feature index = xxhash64(gram) mod dim (the hashing trick; no vocab
to build, collisions are the standard capacity/memory trade).

Training is full-batch logistic regression by gradient descent where
EVERY iteration is one distributed pass, the textbook data-parallel
shape:

1. broadcast the (dim+1)-float weight vector (the +1 lane is the bias,
   carried as a virtual always-on feature, so one gradient path serves
   both);
2. map: per-document residual r = sigmoid(w . x) - y via an
   Arrow-batched pandas UDF (one vectorized gather + segment-sum per
   batch against the broadcast vector — no per-row Python loop);
3. one aggregation: grad[j] = sum_docs r * x_j — an explode + hash
   aggregate whose partial (map-side) combine bounds every reducer at
   (#map tasks) rows per feature index regardless of feature skew;
4. driver update: w -= lr * (grad / n + l2 * w). Driver memory is
   bounded by dim+1 floats — never by corpus size.

The feature relation is built once and persisted; each iteration costs
one job over it (map + one shuffle of at most (#map tasks) x dim
partial rows + a <= dim+1-row collect). At 100 TB the honest cost is
`iters` passes over the hashed features — fastText's own trade; for a
quality filter dim=2^18 and iters ~ tens is the published regime.

Determinism: features, residuals and updates are deterministic given
the input; gradient sums are floating-point and partition-order
dependent at the last ulp, so exact-value reproducibility is not
promised — LABEL decisions on margin-separated data are (the d07
'clf' gate and the tests pin labels, mirroring the d01 'zr' decision
-gate pattern).

Reference twin: none — training-data extension per SURVEY.md §6
(Joulin et al. 2016 / Brown et al. 2020 §A are the published methods).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_governance_spark.functions.text import tokens
from data_governance_spark.operators.dsir import _grams


@dataclass
class TextClassifier:
    """Fitted model. ``weights`` has ``dim + 1`` entries — the last is
    the bias lane (virtual always-on feature)."""

    weights: np.ndarray
    dim: int
    bigrams: bool

    def __post_init__(self):
        if len(self.weights) != self.dim + 1:
            raise ValueError(
                f"weights must have dim+1={self.dim + 1} entries "
                f"(bias lane), got {len(self.weights)}"
            )


def hashed_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1 << 18,
    bigrams: bool = True,
) -> DataFrame:
    """(id, idxs array<int>, vals array<double>): L1-normalized hashed
    n-gram counts plus the trailing bias lane (idx=dim, val=1.0).
    Index arrays are sorted — deterministic, and the dot product in
    the scorer streams them in order. NULL/empty text yields just the
    bias lane (a valid, constant-feature document)."""
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    toksed = docs.select(
        F.col(id_col).alias("_tc_id"), tokens(text_col).alias("_tc_toks")
    ).sample(1.0, seed=0)  # fence: HOF consumers below read _tc_toks
    grams = toksed.select(
        "_tc_id",
        (
            _grams(F.col("_tc_toks"))
            if bigrams
            else F.col("_tc_toks")
        ).alias("_tc_grams"),
    )
    ex = grams.select(
        "_tc_id", F.explode("_tc_grams").alias("_tc_g")
    ).select(
        "_tc_id", F.pmod(F.xxhash64("_tc_g"), F.lit(dim)).cast("int").alias("_tc_idx")
    )
    counted = ex.groupBy("_tc_id", "_tc_idx").agg(
        F.count(F.lit(1)).alias("_tc_n")
    )
    per_doc = counted.groupBy("_tc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("_tc_idx", "_tc_n"))
        ).alias("_tc_pairs"),
        F.sum("_tc_n").alias("_tc_tot"),
    )
    # L1-normalize and append the bias lane; docs with no grams at all
    # (NULL/empty text) are reattached with only the bias lane
    feats = per_doc.select(
        "_tc_id",
        F.concat(
            F.transform(F.col("_tc_pairs"), lambda p: p["_tc_idx"]),
            F.array(F.lit(dim).cast("int")),
        ).alias("idxs"),
        F.concat(
            F.transform(
                F.col("_tc_pairs"),
                lambda p: p["_tc_n"].cast("double") / F.col("_tc_tot"),
            ),
            F.array(F.lit(1.0)),
        ).alias("vals"),
    )
    empty_docs = docs.select(F.col(id_col).alias("_tc_id")).join(
        feats.select("_tc_id"), "_tc_id", "left_anti"
    ).select(
        "_tc_id",
        F.array(F.lit(dim).cast("int")).alias("idxs"),
        F.array(F.lit(1.0)).alias("vals"),
    )
    return feats.unionByName(empty_docs).withColumnRenamed("_tc_id", id_col)


def _residual_udf(bc, with_label: bool):
    """sigmoid(w . x) [- y] over (idxs, vals[, y]) — Arrow-batched and
    batch-VECTORIZED: the sparse rows are flattened into one gather +
    multiply and segment-summed with ``np.add.reduceat`` (no per-row
    Python loop — this UDF is the hot path, one corpus pass per
    training iteration). ``bc`` is a SparkContext broadcast of the
    weight vector, fetched once per executor instead of pickled into
    every task closure (at dim=2^20 the closure would carry ~8 MB)."""

    @F.pandas_udf("double")
    def resid(idxs: pd.Series, vals: pd.Series, y: pd.Series) -> pd.Series:
        w = bc.value
        k = len(idxs)
        if k == 0:
            return pd.Series(np.empty(0, dtype="float64"))
        ix_arrs = [np.asarray(ix, dtype=np.int64) for ix in idxs]
        lens = np.fromiter((a.size for a in ix_arrs), dtype=np.int64, count=k)
        if lens.min() == 0:
            # reduceat needs strictly one segment per row; real feature
            # rows always carry at least the bias lane
            raise ValueError(
                "feature row without the bias lane — build features "
                "with hashed_features (every row carries idx=dim)"
            )
        flat_ix = np.concatenate(ix_arrs)
        flat_v = np.concatenate(
            [np.asarray(v, dtype=np.float64) for v in vals]
        )
        offs = np.zeros(k, dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        m = np.add.reduceat(w[flat_ix] * flat_v, offs)
        out = 1.0 / (1.0 + np.exp(-m))
        if with_label:
            out = out - y.to_numpy(dtype="float64")
        return pd.Series(out)

    return resid


# Dense partial-gradient path bounds (r14, guide §2.4/§2.6): the
# driver receives one (dim+1)-double vector per partition, so the path
# only runs when P * (dim+1) * 8 stays small; bigger fits fall back to
# the explode + hash-aggregate shape whose collect is bounded by dim
# rows regardless of partition count (the 100 TB shape — see the
# module docstring). 25k feature rows per task keeps the per-pass
# fixed cost (task scheduling + Arrow round-trips) proportional to the
# DATA, not to however many partitions the featurization join left.
_PARTIAL_GRAD_MAX_BYTES = 128 * 1024 * 1024
_PARTIAL_GRAD_ROWS_PER_TASK = 25_000


def _partial_grad_fn(bc, dim: int):
    """mapInPandas partition function: one ``(rows, grad)`` record per
    partition — residual + gradient fused in a single stage (no
    explode, no exchange). Same vectorized arithmetic as
    :func:`_residual_udf`; float summation order differs only in how
    partials merge, which the fit contract already leaves free (see
    the determinism note in the module docstring)."""

    def part(batches):
        w = bc.value
        grad = np.zeros(dim + 1)
        rows = 0
        for pdf in batches:
            k = len(pdf)
            if k == 0:
                continue
            ix_arrs = [np.asarray(ix, dtype=np.int64) for ix in pdf["idxs"]]
            lens = np.fromiter(
                (a.size for a in ix_arrs), dtype=np.int64, count=k
            )
            if lens.min() == 0:
                raise ValueError(
                    "feature row without the bias lane — build features "
                    "with hashed_features (every row carries idx=dim)"
                )
            flat_ix = np.concatenate(ix_arrs)
            flat_v = np.concatenate(
                [np.asarray(v, dtype=np.float64) for v in pdf["vals"]]
            )
            offs = np.zeros(k, dtype=np.int64)
            np.cumsum(lens[:-1], out=offs[1:])
            m = np.add.reduceat(w[flat_ix] * flat_v, offs)
            r = 1.0 / (1.0 + np.exp(-m)) - pdf["_tc_y"].to_numpy(
                dtype="float64"
            )
            np.add.at(grad, flat_ix, flat_v * np.repeat(r, lens))
            rows += k
        yield pd.DataFrame({"n": [rows], "grad": [grad]})

    return part


def fit_text_classifier(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1 << 18,
    bigrams: bool = True,
    iters: int = 20,
    lr: float = 2.0,
    l2: float = 0.0,
    features: DataFrame | None = None,
) -> TextClassifier:
    """Fit the classifier on ``docs`` with binary ``label_col``
    (0/1). ``features`` reuses a precomputed :func:`hashed_features`
    relation (must carry ``id_col``, ``idxs``, ``vals`` and have been
    built with the same ``dim``/``bigrams``) — the same reuse hook
    pattern as ``semantic_dedup(pairs=)``.

    Iteration shape (r14): when ``partitions * (dim+1) * 8`` bytes fit
    under ``_PARTIAL_GRAD_MAX_BYTES``, each pass is ONE single-stage
    job — per-partition dense partial gradients summed on the driver,
    with the row count fused into the first pass (measured on the d07
    fixture: 5 iterations 2.9 s -> 1.3 s; the explode + exchange +
    final-aggregate stages and the separate count job were all fixed
    overhead at that size). Larger fits keep the explode + hash-
    aggregate shape whose driver collect is bounded by ``dim`` rows no
    matter how many partitions feed it. Both paths compute the same
    gradient up to float summation order, which the contract above
    already leaves free; labels on margin-separated data are identical."""
    from data_governance_spark.cache import tracked_persist

    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if lr <= 0:
        raise ValueError(f"lr must be > 0, got {lr}")
    if features is None:
        features = hashed_features(
            docs, id_col=id_col, text_col=text_col, dim=dim, bigrams=bigrams
        )
    labeled = tracked_persist(
        features.join(
            docs.select(
                F.col(id_col),
                F.col(label_col).cast("double").alias("_tc_y"),
            ),
            id_col,
        ).select("idxs", "vals", "_tc_y")
    )
    sc = docs.sparkSession.sparkContext
    w = np.zeros(dim + 1)
    p0 = labeled.rdd.getNumPartitions()
    if p0 * (dim + 1) * 8 <= _PARTIAL_GRAD_MAX_BYTES:
        n = None
        src = labeled
        for _ in range(iters):
            bc = sc.broadcast(w)
            parts = src.mapInPandas(
                _partial_grad_fn(bc, dim), "n long, grad array<double>"
            ).collect()
            bc.destroy()
            if n is None:
                # first pass doubles as the count job (w=0 residuals do
                # not depend on n); later passes read a right-sized
                # coalesce over the SAME cached blocks (narrow dep)
                n = sum(p["n"] for p in parts)
                if n == 0:
                    raise ValueError("no labeled documents to fit on")
                tgt = max(
                    1, min(p0, -(-n // _PARTIAL_GRAD_ROWS_PER_TASK))
                )
                if tgt < p0:
                    src = labeled.coalesce(tgt)
            grad = np.zeros(dim + 1)
            for p in parts:
                grad += np.asarray(p["grad"])
            penalty = l2 * w
            penalty[-1] = 0.0
            w -= lr * (grad / n + penalty)
        return TextClassifier(weights=w, dim=dim, bigrams=bigrams)
    n = labeled.count()
    if n == 0:
        raise ValueError("no labeled documents to fit on")
    for _ in range(iters):
        bc = sc.broadcast(w)
        resid = _residual_udf(bc, with_label=True)
        grad_rows = (
            labeled.withColumn(
                "_tc_r", resid(F.col("idxs"), F.col("vals"), F.col("_tc_y"))
            )
            .select(
                F.explode(F.arrays_zip("idxs", "vals")).alias("p"), "_tc_r"
            )
            .groupBy(F.col("p.idxs").alias("j"))
            .agg(F.sum(F.col("p.vals") * F.col("_tc_r")).alias("g"))
            .collect()
        )
        bc.destroy()  # the collect above was this broadcast's only job
        grad = np.zeros(dim + 1)
        for r in grad_rows:
            grad[r["j"]] = r["g"]
        # standard logistic regression leaves the intercept
        # unregularized — shrinking the bias skews scores toward 0.5
        # on imbalanced training sets
        penalty = l2 * w
        penalty[-1] = 0.0
        w -= lr * (grad / n + penalty)
    return TextClassifier(weights=w, dim=dim, bigrams=bigrams)


def predict_text(
    docs: DataFrame,
    model: TextClassifier,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "quality_score",
    label_col: str = "quality_label",
    features: DataFrame | None = None,
) -> DataFrame:
    """``docs`` plus sigmoid score and 0/1 label columns (map-only
    after the featurization join)."""
    if features is None:
        features = hashed_features(
            docs,
            id_col=id_col,
            text_col=text_col,
            dim=model.dim,
            bigrams=model.bigrams,
        )
    # the broadcast outlives this call on purpose: the returned
    # DataFrame is lazy and the scorer closure holds the handle, so the
    # ContextCleaner reclaims it once the plan itself is unreachable
    bc = docs.sparkSession.sparkContext.broadcast(model.weights)
    scorer = _residual_udf(bc, with_label=False)
    scored = features.select(
        F.col(id_col),
        scorer(F.col("idxs"), F.col("vals"), F.lit(0.0)).alias(score_col),
    )
    return docs.join(scored, id_col).withColumn(
        label_col, (F.col(score_col) >= 0.5).cast("int")
    )
