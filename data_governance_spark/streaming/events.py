"""Streaming twin of the batch event analytics (q15): file-source
Structured Streaming with watermarked tumbling windows.

Design: Trigger.AvailableNow processes whatever has landed and stops —
the cloud-native version of the reference's scheduled batch re-runs
(S2's watermark-filtered re-harvest becomes checkpointed exactly-once
incremental processing). On a real cluster the same code runs
continuously off a Kafka/file source; watermarking bounds state so a
1000-executor job's window store doesn't grow unboundedly with
late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of event parquet drops."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window count+sum per event_type with late-data bound."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_available_now(
    agg: DataFrame, checkpoint: str, query_name: str = "event_windows"
):
    """Drain the source once (batch-style) with streaming semantics;
    returns the finished StreamingQuery. Results land in the in-memory
    sink table ``query_name`` (tests) — swap for a parquet/Delta sink
    in production."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
