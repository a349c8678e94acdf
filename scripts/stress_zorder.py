#!/usr/bin/env python
"""Z-order layout under duplication skew (DEPLOY.md evidence, r8).

Writes orders (o_custkey, o_totalprice) x``FACTOR`` identical copies —
the adversarial case for quantile bucketing: every value's frequency
is multiplied, so approxQuantile sees massive ties — in three layouts:

1. zordered (write_zordered, quantile boundaries computed ON the
   skewed data),
2. zordered with boundaries from the x1 data (the incremental-append
   path: old boundaries, new skew),
3. unordered baseline (repartition by an unrelated key).

Reports layout_stats' pruning proxies per layout: mean box volume
plus per-dimension MEAN and WORST file width. Measured lesson (r8):
the WORST width is ~1.0 for some file in ANY linearized Z-order —
range-cut files that straddle a Morton high-bit transition (e.g. the
custkey-MSB flip) span that dimension's full range; this is inherent
to contiguous cuts of a space-filling curve, not a skew effect. The
MEAN width is the sound pruning proxy (the expected fraction of files
a uniformly-placed single-column predicate reads), so the pass
criterion is: both zordered variants keep every dimension's MEAN
width well under the unordered baseline's ~1.0, at every factor.

Usage: python scripts/stress_zorder.py [factor]   (default 32)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_ZO_DIR (default /tmp/stress_zorder)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.operators.zorder import (  # noqa: E402
    column_buckets,
    layout_stats,
    write_zordered,
)
from data_governance_spark.session import get_spark  # noqa: E402
from data_governance_spark.tables import table  # noqa: E402

COLS = ["o_custkey", "o_totalprice"]


def report(spark, path, label):
    stats = layout_stats(spark, path, COLS)
    row = stats.agg(
        F.avg("box_volume").alias("vol"),
        *[F.avg(f"{c}_width").alias(f"m_{c}") for c in COLS],
        *[F.max(f"{c}_width").alias(f"w_{c}") for c in COLS],
        F.count(F.lit(1)).alias("files"),
    ).collect()[0]
    widths = ", ".join(
        f"{c} mean={row[f'm_{c}']:.3f} worst={row[f'w_{c}']:.3f}"
        for c in COLS
    )
    print(
        f"{label}: files={row['files']} mean_box_volume={row['vol']:.4f} "
        f"{widths}"
    )
    return {c: row[f"m_{c}"] for c in COLS}


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.environ.get("SPARK_GRAFT_ZO_DIR", "/tmp/stress_zorder")
    shutil.rmtree(root, ignore_errors=True)
    spark = get_spark("stress_zorder")

    base = table(spark, sf_dir, "orders").select(
        "o_orderkey", *COLS
    )
    copies = spark.range(factor).select(F.col("id").alias("c"))
    skewed = base.crossJoin(copies).drop("c").cache()
    n = skewed.count()
    print(f"orders x{factor}: {n} rows")

    t0 = time.time()
    write_zordered(skewed, f"{root}/zo", COLS, bits=8, num_files=32)
    t_zo = time.time() - t0
    # the incremental-append path: boundaries computed on x1, applied
    # to the skewed corpus
    b1 = column_buckets(base, COLS, 8)
    t0 = time.time()
    write_zordered(
        skewed, f"{root}/zo_old", COLS, bits=8, num_files=32, boundaries=b1
    )
    t_old = time.time() - t0
    t0 = time.time()
    (
        skewed.repartition(32, "o_orderkey")
        .write.mode("overwrite").parquet(f"{root}/base")
    )
    t_base = time.time() - t0
    print(
        f"write walls: zordered {t_zo:.1f}s, old-boundaries {t_old:.1f}s, "
        f"baseline {t_base:.1f}s"
    )

    w_zo = report(spark, f"{root}/zo", "zordered (skewed boundaries)")
    w_old = report(spark, f"{root}/zo_old", "zordered (x1 boundaries)")
    w_base = report(spark, f"{root}/base", "unordered baseline")
    for c in COLS:
        assert w_zo[c] < 0.5 * w_base[c], (
            f"{c}: zorder mean width {w_zo[c]:.3f} did not beat "
            f"baseline {w_base[c]:.3f} under x{factor} duplication"
        )
        assert w_old[c] < 0.5 * w_base[c], (
            f"{c}: x1-boundary zorder degraded to {w_old[c]:.3f} vs "
            f"baseline {w_base[c]:.3f}"
        )
    print("PASS: per-dimension mean width holds under duplication skew")


if __name__ == "__main__":
    main()
