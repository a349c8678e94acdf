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


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of q19's gap-based sessionization: custom
    stateful operator via applyInPandasWithState.

    Per-user state = the open session (start, last event, count).
    Events extend the session if they arrive within ``gap_minutes`` of
    its last event, else the old session is emitted and a new one
    opens. The open session is emitted when the event-time timeout
    fires (watermark passes last_event + gap) — so output is
    append-mode and exactly the closed sessions, the semantics a batch
    recompute of q19 would produce. Watermarking bounds state: one
    in-flight session struct per active user, dropped at timeout —
    state size tracks ACTIVE users, not history, which is what lets
    this run indefinitely on a 1000-executor cluster.
    """
    import pandas as pd  # driver-side import; executors get it via Arrow path

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = gap_minutes * 60

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.to_datetime(start, unit="s")],
                    "session_end": [pd.to_datetime(last, unit="s")],
                    "n_events": [n],
                }
            )
            return
        secs: list[int] = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["ts"])
            secs.extend((ts.astype("int64") // 1_000_000_000).tolist())
        secs.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed: list[tuple[int, int, int]] = []
        for s in secs:
            if start is None:
                start, last, n = s, s, 1
            elif s - last > gap_s:
                closed.append((start, last, n))
                start, last, n = s, s, 1
            else:
                last, n = s, n + 1
        if start is None:  # no rows and no prior state: nothing to track
            return
        state.update((start, last, n))
        # fire once the watermark passes the session gap
        state.setTimeoutTimestamp((last + gap_s) * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.to_datetime(c[0], unit="s") for c in closed],
                    "session_end": [pd.to_datetime(c[1], unit="s") for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType="user_id long, session_start timestamp, "
            "session_end timestamp, n_events long",
            stateStructType="start long, last long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_available_now(
    agg: DataFrame,
    checkpoint: str,
    query_name: str = "event_windows",
    output_mode: str = "complete",
    path: str | None = None,
):
    """Drain the source once (batch-style) with streaming semantics;
    returns the finished StreamingQuery. Without ``path`` results land
    in the in-memory sink table ``query_name`` (single-run tests; no
    checkpoint recovery); with ``path`` they append to a parquet sink,
    which supports restart-from-checkpoint — the production shape.
    Windowed aggs use complete mode; the stateful sessionizer emits
    closed sessions in append mode."""
    w = agg.writeStream.outputMode(output_mode).option(
        "checkpointLocation", checkpoint
    ).trigger(availableNow=True)
    if path is None:
        q = w.format("memory").queryName(query_name).start()
    else:
        q = w.format("parquet").option("path", path).start()
    q.awaitTermination()
    return q
