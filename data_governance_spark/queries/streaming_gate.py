"""q47: the Structured-Streaming windowed aggregation under the oracle
gate. The driver gate runs batch DataFrames, but an availableNow
stream drains to completion synchronously — so the query stages the
events table as a file-stream source, runs the REAL streaming plan
(watermark + tumbling windows) through a memory sink, and returns the
drained result. This is the engine's only path that exercises the
streaming runtime inside the correctness gate; the stateful
sessionizer keeps its batch-equivalence pytest (its multi-batch
watermark protocol can't drain in one pass).

Counts only: the streaming agg sums raw doubles (q15, the batch twin,
gates the decimal-cast sum), and float summation order would
hash-diverge between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_governance_spark.queries.base import QueryDef, qdef
from data_governance_spark.tables import table

QUERIES: dict[str, QueryDef] = {}


@qdef(
    QUERIES,
    "q47_streaming_windows",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
    doc="streaming tumbling windows (watermark + availableNow drain "
    "through a memory sink) == the batch hourly counts",
)
def q47_streaming_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from data_governance_spark.streaming.events import (
        read_event_stream,
        run_available_now,
        windowed_counts,
    )

    work = tempfile.mkdtemp(prefix="dg_q47_")
    src = os.path.join(work, "src")
    table(spark, sf_dir, "events").write.parquet(src)
    stream = read_event_stream(spark, src)
    agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
    name = f"q47_windows_{uuid.uuid4().hex[:8]}"
    run_available_now(agg, os.path.join(work, "ckpt"), query_name=name)
    return spark.table(name).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
    )
