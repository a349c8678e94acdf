#!/usr/bin/env python
"""Product-quantization scale evidence (DEPLOY.md, r11).

Duplicates the sf embeddings table x``FACTOR`` with distinct ids and
per-copy jitter on ONE dimension (so codes are genuinely recomputed,
not collapsed), then measures the three PQ phases:

1. codebook training — bounded by sample_n, NOT corpus size (the
   published property: the collect is the hash-sample, never the
   corpus);
2. encode throughput — the map-only Arrow pass (vectors/s), plus the
   compression ratio actually achieved (float64 dims -> M int codes);
3. ADC query throughput — corpus codes scored against NQ unquantized
   queries (corpus-rows x queries scored pairs/s), with the recall@k
   of the true brute-force top-k inside the ADC top-(4k) candidate
   set on a brute-forceable slice (the rerank-after-ADC production
   shape).

Usage: python scripts/stress_pq.py [factor]   (default 80)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.operators.pq import (  # noqa: E402
    pq_encode,
    pq_knn,
    train_pq_codebooks,
)
from data_governance_spark.operators.similarity import (  # noqa: E402
    brute_force_knn,
)
from data_governance_spark.session import get_spark  # noqa: E402
from data_governance_spark.tables import table  # noqa: E402

M = 8
KS = 256
K = 10
NQ = 64


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress_pq")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    n0 = emb.count()
    copies = spark.range(factor).select(F.col("id").alias("c"))
    # per-copy jitter on dim 0 keeps every copy a distinct vector (an
    # exact copy would quantize identically and hide encode cost in
    # repeated rows); ids disjoint per copy
    corpus = (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("c") * n0 * 10).alias("vec_id"),
            F.concat(
                F.array(F.element_at("emb", 1) + F.col("c") * 0.001),
                F.slice("emb", 2, 63),
            ).alias("emb"),
        )
        .repartition(n_shuffle)
        .cache()
    )
    n = corpus.count()
    print(f"corpus: {n} vectors x 64 dims (x{factor})")

    t0 = time.time()
    books = train_pq_codebooks(
        corpus, m=M, ks=KS, sample_n=20_000, n_iter=10, seed=42
    )
    t_train = time.time() - t0
    print(
        f"train: {t_train:.1f}s (sample-bounded; {M} x {KS} x "
        f"{books.dsub} codebooks)"
    )

    t0 = time.time()
    codes = pq_encode(corpus, books).cache()
    n_codes = codes.count()
    t_enc = time.time() - t0
    raw_bytes = n * 64 * 8
    assert books.byte_packable  # ks=256: codes materialize as M BYTES
    code_bytes = n * (M + 8)  # binary codes + the 8-byte recon norm
    print(
        f"encode: {n_codes} vectors in {t_enc:.1f}s = "
        f"{n_codes / t_enc:,.0f} vec/s; materialized payload "
        f"{raw_bytes} -> {code_bytes} bytes ({raw_bytes / code_bytes:.0f}x"
        f"; {64 * 8 // M}x on the codes alone)"
    )

    queries = emb.filter(F.col("vec_id") < NQ).select("vec_id", "emb")
    t0 = time.time()
    top = pq_knn(queries, codes, books, k=K)
    n_top = top.count()
    t_adc = time.time() - t0
    print(
        f"adc: {NQ} queries x {n} codes in {t_adc:.1f}s = "
        f"{NQ * n / t_adc:,.0f} scored pairs/s ({n_top} result rows)"
    )

    # recall of true top-k inside the ADC top-4k candidates, on the
    # x1 slice (brute force over the full x-corpus would dwarf the run)
    slice_df = emb
    slice_codes = pq_encode(slice_df, books)
    want = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_knn(
            queries, slice_df, k=K, drop_self=False
        ).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_knn(queries, slice_codes, books, k=4 * K).collect()
    }
    recall = len(want & got) / len(want)
    print(f"recall@{4 * K} of true top-{K} (x1 slice): {recall:.2%}")


if __name__ == "__main__":
    main()
