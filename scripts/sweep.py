#!/usr/bin/env python
"""One-shot driver-contract sweep: run registered queries against their
DuckDB oracles (the same comparison the driver's correctness gate does).

Usage: python scripts/sweep.py [query-name-substring ...]
Env: SWEEP_SF_DIR (default /root/testdata/sf0.001), SWEEP_CPUS (default 8).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.001")
    cpus = os.environ.get("SWEEP_CPUS", "8")
    pats = sys.argv[1:]

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_governance_spark.queries.registry import QUERIES
    from data_governance_spark.testing import assert_matches_oracle, duckdb_conn

    con = duckdb_conn(sf)
    ok, bad = 0, []
    for name, q in sorted(QUERIES.items()):
        if pats and not any(p in name for p in pats):
            continue
        try:
            df = q.fn(spark, sf)
            if q.oracle is None:
                print(f"{name}: rows-only ({df.count()})")
            else:
                assert_matches_oracle(df, con, q.oracle)
                print(f"{name}: OK")
            ok += 1
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"{name}: FAIL\n{str(e)[:2000]}")
    print(f"\n{ok} ok, {len(bad)} bad: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
