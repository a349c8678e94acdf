"""Deterministic content-hash sampling and dataset splitting.

A training-data pipeline needs holdout assignment that is STABLE: the
same document must land in the same split on every run, on any cluster
size, after any repartition, and when the corpus grows (adding docs
must not reshuffle existing assignments). Spark's ``df.sample`` /
``randomSplit`` give none of that — they are partition-order dependent.
The standard fix (used by every published web-corpus pipeline) is to
key the decision on a content hash:

    h = first 8 hex chars of md5(seed || ':' || key)

``h`` is uniform over [00000000, ffffffff], and because fixed-width
lowercase hex compares lexicographically exactly as it compares
numerically, split assignment is a plain string comparison against
precomputed hex thresholds — pure Catalyst expressions, no UDF, no
bigint conversion, trivially mirrored in any SQL oracle.

NULL-key contract (both sides of the mirror agree — NULL propagates
through the concat and every comparison): ``hash_sample`` DROPS
NULL-key rows (NULL predicate), and ``hash_split`` routes them all to
the LAST declared split (every WHEN is NULL, the otherwise fires).
Keys are identities; assign real ids upstream rather than leaning on
either behavior.

Scale shape: both operators are stateless per-row projections/filters —
no shuffle, no state, fully pushdown-compatible (a ``hash_sample``
filter reaches the scan like any other predicate). At 100 TB they cost
one md5 per row and nothing else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 0xFFFFFFFF


def _bucket_hex(key: Column, seed: str) -> Column:
    """First 8 md5 hex chars of ``seed || ':' || key`` — the uniform
    sampling coordinate. Seed participates in the hash so independent
    decisions (a split, then a sample of one split) decorrelate."""
    return F.substring(
        F.md5(F.concat(F.lit(seed), F.lit(":"), key.cast("string"))), 1, 8
    )


def threshold_hex(frac: float) -> str:
    """The 8-hex-digit threshold such that P(h < threshold) == frac
    (up to 1/2^32). Shared by the Spark and oracle sides."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    v = int(frac * (_HEX_SPAN + 1))
    if v > _HEX_SPAN:
        # frac == 1.0: 'g' sorts after every hex digit, so h < 'g'
        # includes everything ("100000000" would NOT — '1' < 'f')
        return "g"
    return format(v, "08x")


def hash_sample(
    df: DataFrame, frac: float, key_col: str, seed: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli sample of ``frac`` of the rows, keyed on
    ``key_col``'s content hash. Unlike ``df.sample`` the result is a
    pure filter: same rows every run, survives repartitioning, and
    composes with predicate pushdown."""
    return df.filter(
        _bucket_hex(F.col(key_col), seed) < F.lit(threshold_hex(frac))
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str,
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test...)
    by cumulative hash thresholds. Weights must sum to 1 (±1e-9);
    assignment is exhaustive and disjoint by construction. Insertion
    order of ``weights`` fixes the threshold layout, so pass an
    explicit order and keep it stable across runs."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    h = _bucket_hex(F.col(key_col), seed)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        cond = h < F.lit(threshold_hex(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def split_case_sql(
    weights: dict[str, float], key_expr: str, seed: str = "split"
) -> str:
    """The DuckDB/ANSI mirror of ``hash_split`` as a CASE expression —
    kept next to the operator so the two sides share one threshold
    computation."""
    h = f"substr(md5('{seed}:' || CAST({key_expr} AS STRING)), 1, 8)"
    names = list(weights)
    parts = []
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        parts.append(f"WHEN {h} < '{threshold_hex(cum)}' THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def sample_pred_sql(frac: float, key_expr: str, seed: str = "sample") -> str:
    """The DuckDB/ANSI mirror of ``hash_sample``'s predicate."""
    h = f"substr(md5('{seed}:' || CAST({key_expr} AS STRING)), 1, 8)"
    return f"{h} < '{threshold_hex(frac)}'"
