#!/usr/bin/env python
"""Duplication-scaling stress for the WHOLE corpus pipeline
(corpus.prepare_corpus): inflate the sf0.1 corpus with exact copies —
the LSH worst case, every copy lands in every band bucket of its
original — and time end-to-end. Measured (local[32]):

    x1  (5k rows):   18.0 s   kept=2573  packs=191
    x8  (40k rows):  14.9 s   kept=2573  packs=191
    x32 (160k rows): 36.1 s   kept=2573  packs=191

2x wall for 32x rows, identical survivor set and pack layout at every
multiple — exact_precluster collapses the inflation before any sketch
runs, and the deterministic split/pack reproduce byte-identically.
DEPLOY.md cites these numbers."""
import sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from data_governance_spark.session import get_spark
from data_governance_spark.tables import table
from data_governance_spark.corpus import prepare_corpus
spark = get_spark("corpus_scale")
spark.sparkContext.setLogLevel("ERROR")
base = table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
for mult in (1, 8, 32):
    docs = base
    if mult > 1:
        copies = [
            base.select((F.col("doc_id") + 1_000_000 * k).alias("doc_id"), "text")
            for k in range(1, mult)
        ]
        for c in copies:
            docs = docs.unionByName(c)
    t0 = time.perf_counter()
    r = prepare_corpus(docs, persist_clean=True)
    kept = r.kept.count()
    packs = r.packed.select("split", "pack_bucket", "pack_id").distinct().count()
    print(f"x{mult}: rows={docs.count()} kept={kept} packs={packs} "
          f"wall={time.perf_counter()-t0:.1f}s", flush=True)
    r.clean.unpersist()
