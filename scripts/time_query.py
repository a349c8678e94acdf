#!/usr/bin/env python
"""Isolated per-query timing: min/median of N runs through the noop sink
(same methodology as bench.py, without the 49 other gates around it).

Usage: python scripts/time_query.py <query-name-substring> [...]
Env: TQ_SF_DIR (default /root/testdata/sf0.1), TQ_CPUS (default 32),
     TQ_RUNS (default 3).
Prints per-run seconds plus the canary bracketing so a steal wave is
visible in-band (same pinned canary as bench.py).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_governance_spark.cache import release_caches  # noqa: E402
from data_governance_spark.session import get_spark  # noqa: E402


def main() -> int:
    pats = sys.argv[1:]
    if not pats:
        print("usage: time_query.py <pattern> [...]")
        return 2
    sf = os.environ.get("TQ_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("TQ_RUNS", "3"))

    spark = get_spark("dg_spark_time_query")
    spark.range(1000).selectExpr("sum(id)").collect()

    import bench

    from data_governance_spark.queries.registry import QUERIES

    bench._canary(spark)  # codegen warmup, untimed
    pre = bench._canary(spark)
    print(f"canary_pre {pre}")
    for name, q in sorted(QUERIES.items()):
        if not any(p in name for p in pats):
            continue
        times = []
        builds = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"time {name}")
            t0 = time.perf_counter()
            df = q.fn(spark, sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            builds.append(round(t1 - t0, 3))
            release_caches()
        print(f"{name}: min {min(times)} runs {times} (build-phase {builds})")
    post = bench._canary(spark)
    print(f"canary_post {post}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
