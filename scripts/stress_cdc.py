#!/usr/bin/env python
"""Measured evidence for the FastCDC tier (operators/cdc.py):

1. per-core boundary throughput across data shapes (text / binary /
   zeros / pathological short-period),
2. Spark-parallel chunking throughput on local[32] (the map-only
   surface over a blob corpus),
3. the dedup payoff at corpus scale: two crawl-snapshot versions
   (v2 = v1 with per-doc point edits) chunked and joined on
   chunk_hash — bytes shared vs a fixed-size-block baseline.

Usage: python scripts/stress_cdc.py [factor]  (default 4)
"""

from __future__ import annotations

import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.operators.cdc import (  # noqa: E402
    cdc_boundaries,
    cdc_chunks,
)
from data_governance_spark.session import get_spark  # noqa: E402


def phase1_core() -> None:
    rng = random.Random(7)
    shapes = {
        "text": b"".join(
            rng.choices(
                [b"the quick brown fox ", b'{"url": "x", "s": 200}\n'],
                k=800_000,
            )
        ),
        "binary": rng.randbytes(16_000_000),
        "zeros": b"\x00" * 16_000_000,
        "short-period": b"abcd" * 4_000_000,
    }
    for name, data in shapes.items():
        t0 = time.time()
        ends = cdc_boundaries(data)
        w = time.time() - t0
        mb = len(data) / 1e6
        print(
            f"  {name}: {mb:.0f} MB -> {len(ends)} chunks in {w:.2f}s "
            f"= {mb / w:.1f} MB/s/core"
        )


def _corpus(spark, n_docs: int, doc_kb: int):
    rng = random.Random(11)
    rows = []
    for i in range(n_docs):
        body = rng.randbytes(doc_kb * 1024)
        rows.append((f"v1:{i}", bytearray(body)))
        # v2: a point edit (insert) at a random offset — the daily-
        # snapshot shape chunk dedup exists for
        p = rng.randrange(len(body))
        rows.append(
            (f"v2:{i}", bytearray(body[:p] + b"<edit>" + body[p:]))
        )
    return spark.createDataFrame(
        rows, "doc_id string, content binary"
    ).repartition(64)


def phase2_spark(spark, factor: int) -> None:
    n_docs = 64 * factor
    docs = _corpus(spark, n_docs, doc_kb=512).persist()
    total_mb = docs.select(
        F.sum(F.length("content"))
    ).collect()[0][0] / 1e6
    docs.count()
    cdc_chunks(docs).count()  # warm the python workers + cache path —
    # the corpus here is a driver-built local relation whose first
    # materialization (not the operator) otherwise dominates the wall
    t0 = time.time()
    ch = cdc_chunks(docs).persist()
    n_chunks = ch.count()
    w = time.time() - t0
    print(
        f"  cdc_chunks (warm): {2 * n_docs} blobs / {total_mb:.0f} MB "
        f"-> {n_chunks} chunks in {w:.1f}s = {total_mb / w:.0f} MB/s "
        f"on local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    # phase 3: dedup payoff — bytes covered by chunks shared between
    # the two versions, vs an 8 KB fixed-block baseline
    t0 = time.time()
    ver = ch.withColumn("ver", F.substring("doc_id", 1, 2))
    shared = (
        ver.groupBy("chunk_hash", "size")
        .agg(F.countDistinct("ver").alias("nv"))
        .filter(F.col("nv") == 2)
        .agg(F.sum("size"))
        .collect()[0][0]
        or 0
    )
    v1_bytes = ver.filter(F.col("ver") == "v1").agg(
        F.sum("size")
    ).collect()[0][0]
    w = time.time() - t0
    fixed = (
        docs.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        ((F.length("content") - 1) / 8192).cast("int"),
                    ),
                    lambda i: F.xxhash64(
                        F.substring(
                            "content",
                            (i * 8192 + 1).cast("int"),
                            8192,
                        )
                    ),
                )
            ).alias("h"),
        )
        .withColumn("ver", F.substring("doc_id", 1, 2))
        .groupBy("h")
        .agg(F.countDistinct("ver").alias("nv"))
        .filter(F.col("nv") == 2)
        .count()
    )
    n_fixed_v1 = int(v1_bytes // 8192) + n_docs
    print(
        f"  dedup payoff: {shared / v1_bytes:.1%} of v1 bytes shared "
        f"with the edited v2 via CDC (join on chunk_hash, {w:.1f}s) "
        f"vs ~{fixed / n_fixed_v1:.1%} of fixed 8 KB blocks shared "
        "(point edits shift every later block)"
    )
    ch.unpersist()
    docs.unpersist()


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print("phase 1: per-core boundary throughput")
    phase1_core()
    spark = get_spark("stress_cdc")
    print("phase 2/3: Spark-parallel chunking + dedup payoff")
    phase2_spark(spark, factor)


if __name__ == "__main__":
    main()
