"""Z-order layout (operators/zorder.py): Morton key differential vs a
pure-Python reference, and the measurable pruning property — z-ordered
files carry far tighter per-file min/max boxes than a linear sort."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_governance_spark.operators.zorder import (
    column_buckets,
    layout_stats,
    write_zordered,
    zorder_key,
)


def ref_morton(vals: dict[str, int], bits: int) -> int:
    """Pure-Python reference interleave, independent structure."""
    out = 0
    cols = sorted(vals)
    for i in range(bits):
        for j, c in enumerate(cols):
            if (vals[c] >> i) & 1:
                out |= 1 << (i * len(cols) + j)
    return out


def test_zorder_key_matches_reference(spark):
    bits = 4
    # boundaries at 10,20,...,150: bucket(v) = number of bounds <= v
    bounds = {"a": [float(10 * (i + 1)) for i in range(15)],
              "b": [float(10 * (i + 1)) for i in range(15)]}
    rows = [(i, (7 * i) % 160, (13 * i) % 160) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {
        r["id"]: r["z"]
        for r in df.withColumn("z", zorder_key(bounds, bits)).collect()
    }
    for i, a, b in rows:
        ba = sum(1 for x in bounds["a"] if x <= a)
        bb = sum(1 for x in bounds["b"] if x <= b)
        assert got[i] == ref_morton({"a": ba, "b": bb}, bits), (i, a, b)


def test_zorder_locality_property(spark):
    """Points close in (a, b) space get close Morton keys: the key
    range spanned by a small tile is far below the global key range."""
    bounds = {"a": [float(i + 1) for i in range(255)],
              "b": [float(i + 1) for i in range(255)]}
    tile = [(i, 40 + i % 4, 80 + i // 4) for i in range(16)]  # 4x4 tile
    df = spark.createDataFrame(tile, "id long, a long, b long")
    keys = [
        r["z"] for r in df.withColumn("z", zorder_key(bounds, 8)).collect()
    ]
    assert max(keys) - min(keys) < 1 << 8  # tile stays in a tiny range
    assert len(set(keys)) == 16  # distinct cells -> distinct keys


def test_write_zordered_tightens_boxes(spark, tmp_path):
    """The pruning proxy: mean per-file box volume under Z-order must
    be dramatically below a single-column linear sort's, and BOTH
    dimensions' mean widths must be small (linear sort is tight on its
    sort column and ~1.0 on the other)."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    cols = ["l_orderkey", "l_partkey"]
    zp = str(tmp_path / "zord")
    write_zordered(li, zp, cols, bits=8, num_files=16)
    lp = str(tmp_path / "linear")
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.parquet(lp)
    )
    zs = layout_stats(spark, zp, cols).agg(
        F.avg("box_volume").alias("v"),
        F.avg("l_orderkey_width").alias("wa"),
        F.avg("l_partkey_width").alias("wb"),
    ).collect()[0]
    ls = layout_stats(spark, lp, cols).agg(
        F.avg("box_volume").alias("v"),
        F.avg("l_orderkey_width").alias("wa"),
        F.avg("l_partkey_width").alias("wb"),
    ).collect()[0]
    # linear: tight on orderkey, blind on partkey
    assert ls["wa"] < 0.2 and ls["wb"] > 0.8
    # z-order: BOTH dims bounded — the worst dimension (what a
    # single-column predicate on the "wrong" column sees) improves
    # ~3x over linear's blind dimension. NOTE the combined box VOLUME
    # does NOT discriminate: any space-filling layout's volume ~= the
    # file's row share (linear 1/16 x 1.0 ~= z-order 1/4 x 1/4); the
    # per-dimension width is the real any-column pruning metric.
    assert zs["wa"] < 0.5 and zs["wb"] < 0.5
    assert max(zs["wa"], zs["wb"]) < max(ls["wa"], ls["wb"]) * 0.6
    # volume stays within the jaggedness factor of the ideal 1/16
    assert zs["v"] < 0.25
    # row conservation
    assert spark.read.parquet(zp).count() == li.count()


def test_boundaries_reuse_for_increments(spark, tmp_path, monkeypatch):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    cols = ["l_orderkey", "l_partkey"]
    b = write_zordered(li.limit(500), str(tmp_path / "w1"), cols, bits=6)
    # later increment laid out in the SAME key space: with boundaries
    # passed in, write_zordered must NOT recompute them
    import data_governance_spark.operators.zorder as zo

    def boom(*a, **k):
        raise AssertionError("boundaries were recomputed")

    monkeypatch.setattr(zo, "column_buckets", boom)
    b2 = write_zordered(
        li.limit(900), str(tmp_path / "w2"), cols, bits=6, boundaries=b
    )
    assert b2 is b
    # mismatched bits for reused boundaries is an error, not a silent
    # degenerate key space
    with pytest.raises(ValueError, match="cut"):
        write_zordered(
            li.limit(100), str(tmp_path / "w3"), cols, bits=4, boundaries=b
        )


def test_bucket_expr_tree_matches_hof_reference(spark):
    """Pin the CASE-WHEN binary-search bucket lookup against the
    original count-of-boundaries-<= HOF semantics, across the edge
    cases where they could plausibly diverge: exact boundary hits,
    duplicated boundary values, NULL (bucket 0) and NaN (top bucket,
    Spark orders NaN above everything)."""
    from data_governance_spark.operators.zorder import _bucket_expr

    bounds = [1.0, 2.0, 2.0, 3.5, 3.5, 3.5, 10.0]  # dups on purpose
    vals = [0.5, 1.0, 1.5, 2.0, 2.5, 3.5, 9.99, 10.0, 11.0,
            None, float("nan"), -1e18, 1e18]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )
    arr = F.array(*[F.lit(b) for b in bounds])
    hof = F.size(
        F.filter(arr, lambda b: b <= F.col("v").cast("double"))
    ).cast("bigint")
    out = df.select(
        "id", "v",
        _bucket_expr("v", bounds).alias("tree"), hof.alias("hof"),
    ).collect()
    for r in out:
        assert r["tree"] == r["hof"], (r["v"], r["tree"], r["hof"])
    # explicit edge pins (don't just trust the HOF reference)
    got = {r["id"]: r["tree"] for r in out}
    assert got[9] == 0  # NULL -> bucket 0
    assert got[10] == len(bounds)  # NaN -> top bucket
    assert got[3] == 3  # v == 2.0 counts both 2.0 boundaries + 1.0


def test_bucket_expr_stays_in_codegen(spark):
    """The write-path motivation for the tree: the bucket stage must
    be codegen'd (the old HOF showed up as an interpreted
    CodegenFallback filter/size over a 2^bits literal array)."""
    from data_governance_spark.operators.zorder import _bucket_expr

    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    bounds = [float(i + 1) for i in range(255)]  # bits=8 geometry
    staged = df.select(_bucket_expr("v", bounds).alias("b"))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = staged._jdf.queryExecution().explainString(mode)
    # formatted mode tags codegen'd nodes with "[codegen id : N]" and
    # a "*" prefix; the projection node must carry one
    assert "Project [codegen id :" in plan
    assert "CASE WHEN" in plan
    # no HOF artifacts left in the projection
    assert "filter(" not in plan and "size(" not in plan


def test_invalid_params(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="bits"):
        column_buckets(df, ["a"], bits=0)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key({}, 8)
    # 64-bit overflow guard: 5 cols x 16 bits = 80 > 63 must raise
    too_many = {f"c{i}": [float(j + 1) for j in range(65535)]
                for i in range(5)}
    with pytest.raises(ValueError, match="63"):
        zorder_key(too_many, 16)
