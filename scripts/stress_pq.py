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

r12 adds the IVFADC phase: index build wall (cell training + residual
codebooks + encode) and a PROBE SWEEP — n_probe = 1/2/4/8 of 32 cells,
recording recall@10 of the true (full-corpus brute-force) top-10 and
the actual fraction of the corpus scored per probe setting. This is
the pruning dial users need numbers for: how much recall does skipping
1 - n_probe/32 of the corpus cost on real embeddings.

Usage: python scripts/stress_pq.py [factor]   (default 80)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
     SPARK_GRAFT_PHASES=pq,ivfadc (default both; comma-separated)
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


NC = 32  # IVFADC cells
PROBES = (1, 2, 4, 8)


def ivfadc_phase(spark, corpus, n, queries):
    """Index build wall + the n_probe recall/fraction sweep."""
    import numpy as np

    from data_governance_spark.operators.pq import (
        ivfadc_encode,
        ivfadc_knn,
        ivfadc_residuals,
    )
    from data_governance_spark.operators.similarity import train_ivf_cells

    t0 = time.time()
    cells = train_ivf_cells(corpus, k=NC, n_iter=5).cache()
    cells.count()
    t_cells = time.time() - t0
    t0 = time.time()
    res = ivfadc_residuals(corpus, cells).cache()
    res.count()
    # residual codebooks train on the RESIDUAL distribution (pq.py doc)
    res_books = train_pq_codebooks(
        res, m=M, ks=KS, vec_col="res", sample_n=20_000, n_iter=10, seed=7
    )
    index = ivfadc_encode(res, cells, res_books).cache()
    n_idx = index.count()
    t_index = time.time() - t0
    res.unpersist()
    print(
        f"ivfadc build: cells {t_cells:.1f}s + residual-books/encode "
        f"{t_index:.1f}s ({n_idx} rows, {NC} cells)"
    )

    # true top-K over the FULL x-corpus (one brute-force window pass —
    # NQ x n pairs through codegen, the honest recall denominator)
    t0 = time.time()
    want = {}
    for r in brute_force_knn(queries, corpus, k=K, drop_self=False).collect():
        want.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    t_bf = time.time() - t0
    print(f"brute force truth: {NQ} x {n} in {t_bf:.1f}s")

    # probe selection mirror (ivf rule: cosine desc, cell id asc) to
    # report the ACTUAL fraction of corpus rows each sweep setting scores
    crows = cells.collect()
    cell_ids = np.asarray([r["cell_id"] for r in crows])
    cm = np.asarray([list(r["centroid"]) for r in crows])
    sizes = {
        r["cell_id"]: r["n"]
        for r in index.groupBy("cell_id").agg(F.count("*").alias("n")).collect()
    }
    qrows = queries.collect()
    qm = np.asarray([list(r["emb"]) for r in qrows])
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    cn = np.linalg.norm(cm, axis=1, keepdims=True).T
    csim = (qm @ cm.T) / (qn * cn)
    order = np.lexsort((np.broadcast_to(cell_ids, csim.shape), -csim), axis=1)

    def _recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(want[q] & got.get(q, set())) for q in want)
        return hits / sum(len(v) for v in want.values())

    for n_probe in PROBES:
        scored = sum(
            sizes.get(int(cell_ids[j]), 0)
            for qi in range(len(qrows))
            for j in order[qi, :n_probe]
        )
        frac = scored / (len(qrows) * n)
        t0 = time.time()
        top = ivfadc_knn(queries, index, cells, res_books, k=K, n_probe=n_probe)
        recall = _recall(top)
        t_q = time.time() - t0
        print(
            f"ivfadc n_probe={n_probe}/{NC}: recall@{K} {recall:.2%}, "
            f"corpus scored {frac:.1%}, query wall {t_q:.1f}s"
        )

    # rerank sweep (exact_rerank, the production composition): k' = r*K
    # approximate candidates re-scored exactly — recall@K vs r. Lossy
    # ADC scores can DISPLACE true neighbors as more candidates enter
    # (recall vs n_probe is not monotone above); the rerank repairs the
    # ordering from raw vectors, so recall becomes monotone in r.
    from data_governance_spark.operators.similarity import exact_rerank

    for r_factor in (1, 2, 4, 8):
        t0 = time.time()
        cand = ivfadc_knn(
            queries, index, cells, res_books, k=r_factor * K, n_probe=4
        )
        rr = exact_rerank(queries, cand, corpus, k=K)
        recall = _recall(rr)
        t_q = time.time() - t0
        print(
            f"rerank r={r_factor} (k'={r_factor * K}, n_probe=4): "
            f"recall@{K} {recall:.2%}, wall {t_q:.1f}s"
        )


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    phases = set(
        os.environ.get("SPARK_GRAFT_PHASES", "pq,ivfadc").split(",")
    )
    unknown = phases - {"pq", "ivfadc"}
    if unknown:
        raise SystemExit(f"unknown SPARK_GRAFT_PHASES: {sorted(unknown)}")
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
    queries = emb.filter(F.col("vec_id") < NQ).select("vec_id", "emb")

    if "ivfadc" in phases:
        ivfadc_phase(spark, corpus, n, queries)
    if "pq" not in phases:
        return

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
