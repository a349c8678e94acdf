"""Z-order (Morton curve) multi-column data layout for scan pruning —
the lakehouse OPTIMIZE-ZORDER capability, Spark-first.

Why it matters at 100 TB: parquet scans skip row groups / files whose
min-max column statistics exclude the predicate. Sorting by ONE column
gives perfect pruning on that column and none on the others; a
Z-order sort interleaves the bits of several columns' rank buckets so
every file covers a small HYPER-RECTANGLE of the combined key space —
predicates on ANY of the layout columns prune effectively.

Shape:

- ``column_buckets``: rank-bucket each column into ``2^bits`` buckets
  using quantile boundaries from ``DataFrame.stat.approxQuantile``
  (sampling-based, driver-cheap, skew-robust — equal-POPULATION
  buckets, unlike min-max scaling which collapses under outliers).
- ``zorder_key``: interleave the bucket bits JVM-side (shift/or
  expression tree — no UDF). Boundary lookup is a balanced nested
  ``CASE WHEN`` binary-search tree: codegen'd, O(bits) comparisons
  per row (each row walks ONE root-to-leaf path). Spark's native
  ``width_bucket`` was deliberately NOT used — it is equal-WIDTH
  binning over [min, max], which collapses under skew; these are
  equal-POPULATION quantile buckets with arbitrary boundaries.
- ``write_zordered``: range-partition + sort by the key and write —
  ``repartitionByRange`` does a sampling pass so files get even row
  counts, then the within-partition sort makes each file a contiguous
  key range.
- ``layout_stats``: per-file min/max boxes of the layout columns from
  the written files — the measurable pruning proxy (normalized box
  volume; a random layout scores ~1, a good Z-order far below).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def column_buckets(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    rel_err: float | None = None,
) -> dict[str, list[float]]:
    """Quantile bucket boundaries per column: ``2^bits - 1`` interior
    cut points from approxQuantile (one sampling job for all cols).
    ``rel_err`` defaults to a quarter of the bucket spacing
    (1 / (4 * 2^bits)) — a fixed coarse error would let adjacent
    boundaries collide and leave buckets empty/uneven, defeating the
    equal-population property."""
    if bits < 1 or bits > 16:
        raise ValueError("bits must be in [1, 16]")
    if rel_err is None:
        rel_err = 1.0 / (4 * (1 << bits))
    n = (1 << bits) - 1
    probs = [(i + 1) / (n + 1) for i in range(n)]
    quantiles = df.stat.approxQuantile(cols, probs, rel_err)
    return {c: q for c, q in zip(cols, quantiles)}


def _bucket_expr(col: str, bounds: list[float]) -> Column:
    """Bucket index = number of boundaries <= value (sorted bounds),
    as a balanced binary-search tree of nested CASE WHEN: each row
    evaluates O(bits) comparisons down one path, and CaseWhen stays
    inside whole-stage codegen (vs the earlier ``size(filter(...))``
    HOF — interpreted CodegenFallback doing O(2^bits) comparisons per
    row; pinned equivalent in tests/test_zorder.py, including NULL →
    bucket 0 and NaN → top bucket edge semantics)."""
    bs = [float(b) for b in bounds]
    v = F.col(col).cast("double")

    def search(lo: int, hi: int) -> Column:
        # invariant: bucket index is known to lie in [lo, hi]
        if lo >= hi:
            return F.lit(lo).cast("bigint")
        m = (lo + hi) // 2  # test boundary bs[m]: true => bucket > m
        return F.when(v >= F.lit(bs[m]), search(m + 1, hi)).otherwise(
            search(lo, m)
        )

    return search(0, len(bs))


def _check_geometry(boundaries: dict[str, list[float]], bits: int) -> list[str]:
    cols = sorted(boundaries)  # deterministic column order
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 63:
        # JVM long shifts wrap the amount mod 64: positions past 63
        # would silently OR into other lanes (and 63 is the sign bit,
        # breaking the range-partition ordering)
        raise ValueError(
            f"bits ({bits}) x columns ({len(cols)}) must be <= 63 "
            "to fit a signed 64-bit Morton key"
        )
    for c in cols:
        if len(boundaries[c]) != (1 << bits) - 1:
            raise ValueError(
                f"boundaries for {c!r} have {len(boundaries[c])} cut "
                f"points but bits={bits} needs {(1 << bits) - 1} — "
                "reused boundaries must be applied with the bits they "
                "were built for"
            )
    return cols


def _interleave(bucket_cols: list[Column], bits: int) -> Column:
    key = F.lit(0).cast("bigint")
    n = len(bucket_cols)
    for i in range(bits):
        for j, b in enumerate(bucket_cols):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j).cast("bigint"))
    return key


def zorder_key(
    boundaries: dict[str, list[float]], bits: int = 8
) -> Column:
    """The Morton key: bit i of column j lands at position
    i * n_cols + j (columns in sorted-name order). Pure shift/or
    Column expression, no UDF. The inline form repeats each bucket
    tree per bit reference (codegen subexpression elimination usually
    dedups it, but don't rely on that); the WRITE path goes through
    ``write_zordered``, which materializes the bucket columns once
    before interleaving."""
    cols = _check_geometry(boundaries, bits)
    return _interleave([_bucket_expr(c, boundaries[c]) for c in cols], bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 16,
    boundaries: dict[str, list[float]] | None = None,
) -> dict[str, list[float]]:
    """Write ``df`` as parquet in Z-order layout over ``cols``.
    Returns the boundaries used (pass them back in to lay out later
    increments in the SAME key space)."""
    if boundaries is None:
        boundaries = column_buckets(df, cols, bits)
    ordered = _check_geometry(boundaries, bits)
    # stage the bucket lookups as REAL columns first: one evaluation
    # each, instead of `bits` textual repeats inside the interleave
    # (codegen subexpr elimination would probably dedup the CaseWhen
    # trees, but a materialized column is guaranteed and keeps the
    # interleave expression small)
    staged = df.select(
        "*",
        *[
            _bucket_expr(c, boundaries[c]).alias(f"_zb{j}")
            for j, c in enumerate(ordered)
        ],
    )
    z = _interleave([F.col(f"_zb{j}") for j in range(len(ordered))], bits)
    (
        staged.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[f"_zb{j}" for j in range(len(ordered))])
        .write.mode("overwrite")
        .parquet(path)
    )
    return boundaries


def layout_stats(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file min/max of the layout columns plus the normalized box
    volume (product over cols of the file's value-range share of the
    global range). Mean volume is the pruning proxy: the expected
    fraction of files a uniformly-placed equality/range predicate on
    ALL cols must read; per-dimension width does the same for
    single-column predicates."""
    df = spark.read.parquet(path).select(
        F.col("_metadata.file_path").alias("file"),
        *[F.col(c).cast("double").alias(c) for c in cols],
    )
    per_file = df.groupBy("file").agg(
        *[F.min(c).alias(f"{c}_min") for c in cols],
        *[F.max(c).alias(f"{c}_max") for c in cols],
        F.count(F.lit(1)).alias("rows"),
    )
    glob = df.agg(
        *[F.min(c).alias(f"{c}_lo") for c in cols],
        *[F.max(c).alias(f"{c}_hi") for c in cols],
    )
    joined = per_file.crossJoin(F.broadcast(glob))
    vol = F.lit(1.0)
    for c in cols:
        width = (F.col(f"{c}_max") - F.col(f"{c}_min")) / F.greatest(
            F.col(f"{c}_hi") - F.col(f"{c}_lo"), F.lit(1e-12)
        )
        joined = joined.withColumn(f"{c}_width", width)
        vol = vol * width
    return joined.withColumn("box_volume", vol)
