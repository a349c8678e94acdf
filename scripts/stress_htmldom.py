#!/usr/bin/env python
"""DOM-tier extraction throughput (DEPLOY.md evidence, r10): the
stdlib-parser main-content extractor is the newest opt-in Python pass
(operators/htmldom.py), so it owes a docs/sec + MB/sec number and a
regex-tier comparison on the same corpus.

Synthesizes realistic page chrome around every sf document's text
(nav + link rows + footer, the planted-gate shape at corpus scale),
then times (1) the regex tier (functions/html.html_to_text — pure
Catalyst) and (2) the DOM tier (extract_main_text — Arrow-batched
html.parser) over the corpus duplicated x``FACTOR``, and verifies the
DOM tier actually removed the chrome the regex tier cannot.

Usage: python scripts/stress_htmldom.py [factor]   (default 8)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.functions.html import html_to_text  # noqa: E402
from data_governance_spark.operators.htmldom import (  # noqa: E402
    extract_main_text,
)
from data_governance_spark.session import get_spark  # noqa: E402
from data_governance_spark.tables import table  # noqa: E402

CHROME_HEAD = (
    "<html><head><title>t</title><script>var x=1;</script></head><body>"
    "<nav><a href='/'>Home</a><a href='/a'>About</a>"
    "<a href='/b'>Products</a><a href='/c'>Contact</a></nav>"
    "<div><a href='/promo'>Subscribe to our newsletter today</a></div><p>"
)
CHROME_TAIL = (
    "</p><aside>Related: <a href='/r1'>story one</a> "
    "<a href='/r2'>story two</a></aside>"
    "<footer>Copyright 2026 Example Corp. All rights reserved.</footer>"
    "</body></html>"
)


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress_htmldom")

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    copies = spark.range(factor).select(F.col("id").alias("c"))
    corpus = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("c") * n_docs * 10).alias("doc_id"),
            F.concat(
                F.lit(CHROME_HEAD), F.col("text"), F.lit(CHROME_TAIL)
            ).alias("text"),
        )
        .repartition(32)  # the one-split local-parquet lesson
        .cache()
    )
    n = corpus.count()
    mb = (
        corpus.select(F.sum(F.length("text"))).collect()[0][0] / 1e6
    )
    print(f"corpus: {n} docs, {mb:.0f} MB of HTML")

    for name, out in (
        ("regex", corpus.withColumn("text", html_to_text("text"))),
        ("dom", extract_main_text(corpus)),
    ):
        t0 = time.time()
        row = out.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text")).alias("chars"),
            F.sum(
                F.col("text").contains("Copyright 2026").cast("int")
            ).alias("chrome"),
        ).collect()[0]
        wall = time.time() - t0
        print(
            f"{name}: {wall:.1f}s = {n / wall:.0f} docs/s, "
            f"{mb / wall:.1f} MB/s; docs still carrying footer chrome: "
            f"{row['chrome']}"
        )
        if name == "dom":
            assert row["chrome"] == 0, "DOM tier failed to remove chrome"


if __name__ == "__main__":
    main()
