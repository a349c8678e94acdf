#!/usr/bin/env python
"""ExactSubstr scale evidence (DEPLOY.md, r10; the r8 brief's stress
item): measure the window relation's honest O(corpus tokens) cost and
the broadcast-vs-shuffle marking join under a planted
boilerplate-heavy corpus — EVERY document shares one 60-token license
header (prepended), while bodies are made copy-unique by salting each
body token with its copy id, so the duplicated-window set is exactly
the header's pure-header windows (11 distinct windows at width 50,
each occurring once per document — the billion-page boilerplate skew
shape the operator's algebraic min/count aggregate is built for).

Reports, at x1 and x``FACTOR`` duplication of the sf documents table:

1. total window rows (== the O(corpus tokens) relation size) and the
   marking wall / windows-per-second,
2. dedup_substrings end-to-end wall per strategy (shuffle vs
   broadcast) + checksum equality between the two,
3. the marking join's plan: BroadcastHashJoin under
   strategy='broadcast', shuffle join under the default,
4. semantics: exactly ONE document corpus-wide keeps the header
   (keep='first'), every other document loses precisely those tokens.

Usage: python scripts/stress_exsubstr.py [factor]   (default 32)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_EXS_DIR (scratch, default /tmp/stress_exsubstr)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.functions.text import tokens  # noqa: E402
from data_governance_spark.operators.exsubstr import (  # noqa: E402
    dedup_substrings,
    duplicated_window_starts,
)
from data_governance_spark.session import get_spark  # noqa: E402
from data_governance_spark.tables import table  # noqa: E402

WIDTH = 50  # Lee et al. 2022's published span threshold
HEADER_TOKENS = [f"lic{i}clause" for i in range(60)]
HEADER = " ".join(HEADER_TOKENS)


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scratch = os.environ.get("SPARK_GRAFT_EXS_DIR", "/tmp/stress_exsubstr")
    spark = get_spark("stress_exsubstr")

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()

    def build(fac: int):
        """fac copies with disjoint ids; every copy's body tokens are
        salted with the copy id (so bodies never duplicate across
        copies) and the SAME license header is prepended to all."""
        copies = spark.range(fac).select(F.col("id").alias("c"))
        # repartition: the local one-split parquet crossJoin would
        # build (and salt) the whole corpus on ONE task before the
        # write; the measured sections read the written parquet, whose
        # splits restore parallelism either way
        return docs.crossJoin(copies).repartition(32).select(
            (F.col("doc_id") + F.col("c") * n_docs * 10).alias("doc_id"),
            F.concat(
                F.lit(HEADER + " "),
                F.concat_ws(
                    " ",
                    F.transform(
                        tokens("text"),
                        lambda t: F.concat(
                            t, F.lit("x"), F.col("c").cast("string")
                        ),
                    ),
                ),
            ).alias("text"),
        )

    for fac in (1, factor):
        path = f"{scratch}/x{fac}"
        shutil.rmtree(path, ignore_errors=True)
        build(fac).write.mode("overwrite").parquet(path)
        corpus = spark.read.parquet(path)
        n = corpus.count()
        n_windows = corpus.select(
            F.sum(
                F.greatest(F.size(tokens("text")) - (WIDTH - 1), F.lit(0))
            )
        ).collect()[0][0]

        # 1. marking cost (window relation + ONE algebraic aggregate +
        # the dup join), per strategy — this is the scale-critical half
        for strategy in ("shuffle", "broadcast"):
            rem = duplicated_window_starts(
                corpus, width=WIDTH, strategy=strategy
            )
            t0 = time.time()
            n_marked = rem.count()
            wall = time.time() - t0
            print(
                f"x{fac}: mark[{strategy}] {n} docs, {n_windows} windows, "
                f"{n_marked} removals in {wall:.1f}s "
                f"({n_windows / wall / 1e6:.2f}M windows/s)"
            )
            plan = rem._jdf.queryExecution().executedPlan().toString()
            print(
                f"x{fac}: mark[{strategy}] plan: "
                f"bhj={'BroadcastHashJoin' in plan} "
                f"exchanges={plan.count('Exchange')}"
            )

        # 2. end-to-end rebuild per strategy + cross-strategy checksum
        sums = {}
        for strategy in ("shuffle", "broadcast"):
            t0 = time.time()
            out = dedup_substrings(corpus, width=WIDTH, strategy=strategy)
            row = out.select(
                F.count(F.lit(1)).alias("n"),
                # bit_xor: order-independent row checksum that cannot
                # overflow (ANSI mode makes sum(hash) abort on overflow)
                F.expr("bit_xor(xxhash64(doc_id, text))").alias("s"),
            ).collect()[0]
            wall = time.time() - t0
            sums[strategy] = (row["n"], row["s"])
            print(f"x{fac}: dedup[{strategy}] e2e {wall:.1f}s")
            spark.catalog.clearCache()  # tracked persists between runs
        assert sums["shuffle"] == sums["broadcast"], sums

        # 3. semantics: exactly one doc corpus-wide keeps the header
        out = dedup_substrings(corpus, width=WIDTH, strategy="broadcast")
        probe = " ".join(HEADER_TOKENS[:2])
        n_keep = out.filter(F.col("text").contains(probe)).count()
        print(f"x{fac}: docs retaining header after dedup: {n_keep}")
        assert n_keep == 1, n_keep
        spark.catalog.clearCache()
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
