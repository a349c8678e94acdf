"""DSIR-style importance resampling for training-data selection.

Data Selection via Importance Resampling (Xie et al. 2023, public
paper) scores every raw-corpus document by how much more likely its
hashed n-gram features are under a TARGET distribution (a curated
corpus — Wikipedia, books, an in-domain sample) than under the raw
corpus itself, then selects documents with probability proportional to
the importance weight. It is the standard cheap alternative to a
trained quality classifier. Spark-first decomposition:

- ``fit_log_ratios``: bucket the target and raw samples' unigram +
  bigram multisets into ``n_buckets`` hashed features and return the
  per-bucket smoothed log-probability ratios as a plain Python list.
  Two explode->groupBy(bucket) aggregations and one B-row collect —
  the ONLY driver materialization, chart-sized by construction
  (B ~ 10^2..10^4 regardless of corpus size).
- ``importance_scores``: per-doc score = sum over the doc's grams of
  ``lr[bucket(gram)]``. The ratio vector ships as ONE array literal
  and the sum is a higher-order fold over the gram array — MAP-ONLY,
  zero shuffle, runs at scan speed on 100 TB. The fold runs in
  INTEGER micro-units (the ratios are fixed-decimal by construction),
  so the score is exact, order-independent and bit-identical across
  engines — which is what lets a DuckDB oracle restate it
  (queries/documents.py d07 'dsir'); see the function docstring for
  the float-fold rounding hazard this sidesteps.
- ``select_top_k``: deterministic selection — distributed
  TakeOrdered, never a global sort materialization.
- ``gumbel_top_k``: the paper's sampling-without-replacement variant
  (Gumbel-top-k trick): add ``-ln(-ln(u))`` noise with ``u`` derived
  from md5(seed:id) — deterministic given the seed, so runs are
  reproducible across cluster sizes.

Feature hashing uses the first 6 hex chars of md5 — the same
engine-portable idiom as operators/sampling.py and packing.py, so any
SQL system can restate the bucketing bit-for-bit.

Reference twin: none — training-data extension per SURVEY.md §6.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_governance_spark.functions.text import tokens, word_shingles


def _grams(toks: Column) -> Column:
    """Unigrams ++ bigrams (space-joined), in document order — the
    deterministic feature sequence both the scorer's fold and the SQL
    oracle iterate. Docs with < 2 tokens contribute unigrams only
    (word_shingles' short-doc fallback would emit the whole doc — or
    an EMPTY-STRING gram for an empty doc — as a pseudo-bigram)."""
    empty = F.array().cast("array<string>")
    return F.concat(
        toks,
        F.when(F.size(toks) >= 2, word_shingles(toks, 2)).otherwise(empty),
    )


def _bucket(gram: Column, n_buckets: int) -> Column:
    """md5-derived feature bucket in [0, n_buckets) — first 6 hex
    chars as an integer, the engine-portable hash this repo uses for
    every deterministic assignment."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 6), 16, 10).cast("long")
        % n_buckets
    )


def _bucket_counts(
    docs: DataFrame, text_col: str, n_buckets: int
) -> dict[int, int]:
    """Gram-occurrence counts per bucket (B rows to the driver)."""
    toked = docs.select(tokens(text_col).alias("_t"))
    rows = (
        toked.select(
            F.explode(_grams(F.col("_t"))).alias("g")
        )
        .select(_bucket(F.col("g"), n_buckets).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r["b"]: r["n"] for r in rows}


def _ratios_from_counts(
    t: dict[int, int],
    r: dict[int, int],
    n_buckets: int,
    alpha: float,
    ndigits: int,
) -> list[float]:
    tot_t = sum(t.values())
    tot_r = sum(r.values())
    return [
        round(
            math.log((t.get(b, 0) + alpha) / (tot_t + alpha * n_buckets))
            - math.log((r.get(b, 0) + alpha) / (tot_r + alpha * n_buckets)),
            ndigits,
        )
        for b in range(n_buckets)
    ]


def _check_fit_args(n_buckets: int, alpha: float) -> None:
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")


def fit_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 256,
    alpha: float = 1.0,
    ndigits: int = 6,
) -> list[float]:
    """Per-bucket importance log-ratios
    ``log((t_b+alpha)/(T+alpha*B)) - log((r_b+alpha)/(R+alpha*B))``
    (Laplace-smoothed so unseen buckets stay finite), rounded to
    ``ndigits`` decimals — the rounding makes the vector a portable
    decimal literal: any engine parsing the same decimals gets the
    same doubles, so downstream scores reproduce exactly.

    Two independent DataFrames = the primary DSIR shape (target is a
    separate curated corpus). When the target is a SLICE of the raw
    corpus, ``fit_log_ratios_split`` counts both sides in one scan."""
    _check_fit_args(n_buckets, alpha)
    t = _bucket_counts(target, text_col, n_buckets)
    r = _bucket_counts(raw, text_col, n_buckets)
    return _ratios_from_counts(t, r, n_buckets, alpha, ndigits)


def fit_log_ratios_split(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    n_buckets: int = 256,
    alpha: float = 1.0,
    ndigits: int = 6,
) -> list[float]:
    """``fit_log_ratios(docs.filter(target_pred), docs)`` in ONE scan:
    target counts via a conditional aggregate next to the raw counts —
    half the fit cost when the target distribution is an in-corpus
    slice (a language, a source, a labeled subset). Identical output
    to the two-DataFrame form (differentially tested)."""
    _check_fit_args(n_buckets, alpha)
    toked = docs.select(
        target_pred.alias("_is_t"), tokens(text_col).alias("_t")
    )
    rows = (
        toked.select("_is_t", F.explode(_grams(F.col("_t"))).alias("g"))
        .select("_is_t", _bucket(F.col("g"), n_buckets).alias("b"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("r"),
            F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("t"),
        )
        .collect()
    )
    t = {row["b"]: row["t"] for row in rows if row["t"]}
    r = {row["b"]: row["r"] for row in rows}
    return _ratios_from_counts(t, r, n_buckets, alpha, ndigits)


def importance_scores(
    corpus: DataFrame,
    log_ratios: list[float],
    text_col: str = "text",
    score_col: str = "dsir_score",
    ndigits: int = 6,
) -> DataFrame:
    """Corpus with a ``score_col`` column: the summed log-ratio of the
    doc's hashed grams. Map-only — the ratio vector is one array
    literal. Empty/NULL texts score 0.0 (no features, no evidence).

    EXACT arithmetic: the ratios are ``ndigits``-decimal values (what
    ``fit_log_ratios`` emits — pass the same ``ndigits``), so the fold
    runs in integer micro-units (``lr * 10^ndigits`` as LONG) and only
    the final total divides back to a double. Integer addition is
    associative, so the score is independent of fold/partition order
    and bit-identical across engines — a float fold instead puts score
    sums ON the decimal grid where Spark (rounds the shortest decimal
    repr via BigDecimal.valueOf) and DuckDB/C (round the binary value)
    disagree at round-half boundaries; measured: doc 750 at sf0.1,
    -0.19215 -> -0.1922 vs -0.1921."""
    n_buckets = len(log_ratios)
    if n_buckets < 1:
        raise ValueError("log_ratios must be non-empty")
    scale = 10**ndigits
    micro = [int(round(float(x) * scale)) for x in log_ratios]
    lr = F.lit(micro)
    # TWO staging selects: tokens must be a REAL column before
    # word_shingles indexes it (an inline tokens() re-runs the
    # tokenizer per gram position — measured 28x slower on 2000-token
    # docs), and the gram array must be a real column before the fold
    # reads it (functions/text.shingle_hashes documents the trap)
    staged = corpus.select(
        "*", tokens(text_col).alias("_ds_toks")
    ).select("*", _grams(F.col("_ds_toks")).alias("_ds_grams"))
    total = F.aggregate(
        F.col("_ds_grams"),
        F.lit(0).cast("long"),
        lambda acc, g: acc + F.element_at(lr, (_bucket(g, n_buckets) + 1).cast("int")),
    )
    return staged.select(
        *corpus.columns,
        (F.coalesce(total, F.lit(0)) / F.lit(float(scale))).alias(score_col),
    )


def select_top_k(
    scored: DataFrame,
    k: int,
    score_col: str = "dsir_score",
    id_col: str = "doc_id",
) -> DataFrame:
    """The k highest-scoring documents, ties broken by ``id_col`` —
    fully deterministic. ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject: each partition keeps a k-heap and the
    driver merges k*partitions rows — no global sort materialization,
    safe at any corpus size for chart-sized k."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return scored.orderBy(F.desc(score_col), F.asc(id_col)).limit(k)


def gumbel_top_k(
    scored: DataFrame,
    k: int,
    score_col: str = "dsir_score",
    id_col: str = "doc_id",
    seed: str = "dsir",
) -> DataFrame:
    """Sample k documents WITHOUT replacement with probability
    proportional to ``exp(score)`` via the Gumbel-top-k trick: top-k
    of ``score + g_i`` with ``g_i = -ln(-ln(u_i))`` i.i.d. Gumbel.
    ``u_i`` comes from md5(seed:id) (uniform strictly inside (0,1),
    the same deterministic-hash idiom as operators/sampling.py), so
    the sample is reproducible and cluster-size independent."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # 13 hex chars = 52 bits < double mantissa: exact uniform grid.
    # (h+1)/(16^13+1) keeps u STRICTLY inside (0,1): u=1.0 (an
    # all-'f' hash prefix, p=16^-13 per id — real at 10^10 docs)
    # would make -ln(-ln(u)) hit ln(0) -> NULL and silently exile
    # that doc to the bottom of the sample order
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed), F.lit(":"), F.col(id_col).cast("string")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**13 + 1))
    g = -F.log(-F.log(u))
    keyed = scored.withColumn("_ds_gumbel", F.col(score_col) + g)
    return (
        keyed.orderBy(F.desc("_ds_gumbel"), F.asc(id_col))
        .limit(k)
        .drop("_ds_gumbel")
    )
