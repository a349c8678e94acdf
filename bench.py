#!/usr/bin/env python
"""Benchmark harness: runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully via the noop sink (no driver collect, no
result materialization cost — measures the plan, not toPandas).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from data_governance_spark.cache import release_caches  # noqa: E402
from data_governance_spark.queries.registry import QUERIES  # noqa: E402
from data_governance_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # remove any previous run's file copy up front: a mid-sweep crash
    # must not leave a stale bench_out.json that a file-fallback reader
    # would mistake for THIS run's results
    out_path = os.path.join(REPO, "bench_out.json")
    if os.path.exists(out_path):
        os.remove(out_path)

    spark = get_spark("dg_spark_bench")
    # JVM/codegen warmup on a tiny query so q1 isn't charged for startup
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, object] = {}
    for name, q in sorted(QUERIES.items()):
        # Failure-isolated: one bad query records an error entry instead of
        # killing the sweep — a partial bench still emits its JSON line.
        t0 = time.perf_counter()
        try:
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            timings[name] = {"error": f"{type(exc).__name__}: {exc}"[:500]}
        # Release between queries (after the timing is recorded, so release
        # cost is not charged to any query).
        release_caches()

    total = round(sum(t for t in timings.values() if isinstance(t, float)), 3)
    payload = json.dumps(
        {
            "metric": "total_query_sec",
            "value": total,
            "unit": "sec",
            # totals are only comparable at equal suite size — the
            # query count grows round-over-round as operators gain
            # oracle gates; compare per-query times across rounds
            "n_queries": len(timings),
            "queries": timings,
            "sf": sf,
        }
    )
    # stdout for the driver, plus a file copy: the driver's tail-capture
    # truncated the stdout line in r4 (BENCH_r04 parsed: null), so the
    # canonical JSON also lands in bench_out.json next to this script
    print(payload)
    with open(out_path, "w") as f:
        f.write(payload + "\n")


if __name__ == "__main__":
    main()
