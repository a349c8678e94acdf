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

import pandas as pd  # module-level: the warmup UDF's type hints must
                     # resolve in module globals (PEP 563 annotations)

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from data_governance_spark.cache import release_caches  # noqa: E402
from data_governance_spark.queries.registry import QUERIES  # noqa: E402
from data_governance_spark.session import get_spark  # noqa: E402


def _canary(spark) -> float:
    """Fixed-cost host-drift calibration: a constant synthetic workload
    (no input tables, no registry queries — pinned as of r12, never
    change it) timed the same way as the scored queries. Cross-round
    bench comparisons divide by this to separate host load from real
    plan changes (the r11 driver run read 1.39× on totals while 44
    unchanged gates moved 1.36× — pure drift, only decomposable by
    hand back then). Shape mirrors the suite: a wide scan with hashing
    + string work, a shuffle agg, and a broadcast join."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    base = spark.range(0, 16_000_000, 1, 32).select(
        (F.col("id") % 9973).alias("k"),
        F.xxhash64("id").alias("h"),
        F.sha2(F.conv(F.col("id"), 10, 16), 256).alias("s"),
    )
    dim = spark.range(0, 9973).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    agg = (
        base.join(F.broadcast(dim), "k")
        .groupBy("grp")
        .agg(
            F.bit_xor("h").alias("x"),
            F.sum(F.length("s")).alias("n"),
        )
    )
    agg.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


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
    # Python-worker warmup for the same reason (r14 measurement fix,
    # stated in OPTIMIZATION_r14.md): the first Arrow/pandas-UDF stage
    # of the run pays daemon fork + pandas/pyarrow import in every
    # worker (~4 s on 32 cores). That is one-time process startup, not
    # query cost, exactly like the JVM warmup above — so pay it here,
    # once, with one worker per core, instead of charging it to
    # whichever query happens to run first (d01 at current sort order).
    from pyspark.sql import functions as F  # noqa: PLC0415

    @F.pandas_udf("long")
    def _warm_py(s: pd.Series) -> pd.Series:
        return s

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(0, cpus, 1, cpus).select(F.sum(_warm_py("id"))).collect()

    # host-drift canary, sampled before AND after the suite (load can
    # arrive mid-run); canary_sec is the mean — divide totals by it.
    # One untimed run first: the codegen compile must not be charged to
    # the pre sample only (it would skew pre vs post asymmetrically)
    _canary(spark)
    canary_pre = _canary(spark)

    # mid-run canary samples every ~10 queries: steal waves routinely
    # arrive AND leave entirely between the pre/post brackets (r13
    # judge: a clean 1.76→1.48 bracket around a 454 s contaminated
    # total), so the bracket alone can't localize contamination.
    # canary_mid pins which 10-query segment a wave hit. The workload
    # itself is the pinned r12 canary — never change it.
    canary_mid: list[float] = []
    timings: dict[str, object] = {}
    for i, (name, q) in enumerate(sorted(QUERIES.items())):
        if i and i % 10 == 0:
            canary_mid.append(_canary(spark))
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

    canary_post = _canary(spark)

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
            # fixed-cost calibration (see _canary): cross-round deltas
            # should be read as (total/canary_sec) ratios, not raw totals
            "canary_sec": round((canary_pre + canary_post) / 2, 3),
            "canary_pre_sec": canary_pre,
            "canary_post_sec": canary_post,
            # one sample per 10 queries, in suite order — localizes a
            # mid-run steal wave to its segment (r13 brief #4)
            "canary_mid": canary_mid,
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
