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


def hash_sample_stratified(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str,
    seed: str = "sample",
    default_frac: float = 0.0,
) -> DataFrame:
    """Deterministic PER-STRATUM Bernoulli sampling — the domain
    re-weighting step of a training-data mix (down-sample web crawl,
    keep all books): each row keeps with its stratum's fraction,
    decided by the same content-hash coordinate as ``hash_sample`` so
    the result is stable across runs/cluster sizes/corpus growth and
    strata stay MUTUALLY CONSISTENT (a row's coordinate doesn't change
    if its stratum's fraction does — raising a fraction only ADDS
    rows, it never swaps them; the same monotonicity published
    pipelines rely on when iterating on mix weights).

    ``fractions`` maps stratum value -> keep fraction in [0, 1];
    strata not listed (and NULL strata) use ``default_frac`` (default
    0.0 = drop — an unlisted domain must be an explicit decision, not
    a silent pass-through). Pure projection+filter: one md5 per row,
    no shuffle, pushdown-compatible. NULL keys drop (NULL predicate),
    matching ``hash_sample``.
    """
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(
                f"fraction for stratum {name!r} must be in [0, 1], "
                f"got {frac}"
            )
    if not 0.0 <= default_frac <= 1.0:
        raise ValueError(
            f"default_frac must be in [0, 1], got {default_frac}"
        )
    h = _bucket_hex(F.col(key_col), seed)
    s = F.col(strata_col)
    thr = F.lit(threshold_hex(default_frac))
    for name, frac in fractions.items():
        thr = F.when(s == name, threshold_hex(frac)).otherwise(thr)
    return df.filter(h < thr)


def stratified_pred_sql(
    fractions: dict[str, float],
    strata_expr: str,
    key_expr: str,
    seed: str = "sample",
    default_frac: float = 0.0,
) -> str:
    """The DuckDB/ANSI mirror of ``hash_sample_stratified``'s
    predicate (shared threshold computation). An empty ``fractions``
    degenerates to the plain default-threshold comparison (a CASE
    with zero WHENs would not parse)."""
    h = f"substr(md5('{seed}:' || CAST({key_expr} AS STRING)), 1, 8)"
    if not fractions:
        return f"{h} < '{threshold_hex(default_frac)}'"
    case = " ".join(
        f"WHEN {strata_expr} = '{name}' THEN '{threshold_hex(frac)}'"
        for name, frac in fractions.items()
    )
    return (
        f"{h} < (CASE {case} ELSE '{threshold_hex(default_frac)}' END)"
    )
