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
    max_buffer_events: int | None = None,
) -> DataFrame:
    """Streaming twin of q19's gap-based sessionization: custom
    stateful operator via applyInPandasWithState.

    Correctness contract: a session is emitted ONLY once the watermark
    has passed session_end + gap — until then a watermark-admitted
    late event could still land inside or adjacent to it and change
    its boundaries. Per-user state is therefore the event-time buffer
    (microseconds, sorted on read) of every event not yet part of an
    emitted session; on each invocation the buffer is re-sessionized
    from scratch, watermark-confirmed sessions are emitted and their
    events dropped from state, and the event-time timeout re-arms at
    last_event + gap so the tail session flushes when the stream goes
    quiet. Events older than the current watermark are dropped
    explicitly (applyInPandasWithState leaves late-row filtering to
    the operator). State is bounded by the watermark horizon: an event
    lives in the buffer only until the watermark passes its session's
    end + gap, so per-user state tracks the (watermark delay + gap)
    window, not history.

    ``max_buffer_events`` is the unbounded-session safety valve: a user
    emitting continuously with no gap keeps one session open forever,
    and its buffer would grow without bound. When the per-user buffer
    exceeds the cap, every session (including the still-open tail) is
    force-closed and emitted and the buffer cleared; subsequent events
    start a NEW session even if they arrive within the gap — a
    documented divergence (a session longer than the cap splits). None
    (default) preserves exact semantics.
    """
    import pandas as pd  # driver-side import; executors get it via Arrow path

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def sessionize(buf: list[int]) -> list[tuple[int, int, int]]:
        out: list[tuple[int, int, int]] = []
        start = last = buf[0]
        n = 1
        for t in buf[1:]:
            if t - last > gap_us:
                out.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        out.append((start, last, n))
        return out

    def emit(user_id, sessions):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": [pd.to_datetime(s[0], unit="us") for s in sessions],
                "session_end": [pd.to_datetime(s[1], unit="us") for s in sessions],
                "n_events": [s[2] for s in sessions],
            }
        )

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        buf: list[int] = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["ts"])
            # late-data contract: INCOMING events at/before the watermark
            # are dropped (applyInPandasWithState leaves that to the
            # operator). Buffered events are never re-filtered — they can
            # sit at/below the watermark while their session is still
            # within its confirmation window.
            buf.extend(t for t in (ts.astype("int64") // 1_000).tolist() if t > wm_us)
        buf.sort()
        if not buf:
            state.remove()
            return
        sessions = sessionize(buf)
        if max_buffer_events is not None and len(buf) > max_buffer_events:
            # safety valve: force-close everything, clear state
            final, keep = sessions, []
        else:
            final = [s for s in sessions if s[1] + gap_us <= wm_us]
            keep = [s for s in sessions if s[1] + gap_us > wm_us]
        if keep:
            kept_events = [t for t in buf if t >= keep[0][0]]
            state.update((kept_events,))
            # re-arm: fire once the watermark passes the tail gap (the
            # kept sessions' ends all exceed wm, so this is > watermark)
            state.setTimeoutTimestamp((keep[-1][1] + gap_us) // 1000)
        else:
            state.remove()
        if final:
            yield emit(user_id, final)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType="user_id long, session_start timestamp, "
            "session_end timestamp, n_events long",
            stateStructType="events array<long>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup — the continuous-ingest twin of the d03
    batch exact-dedup family: the first row per key passes, duplicates
    arriving within the watermark horizon are dropped.

    Uses ``dropDuplicatesWithinWatermark`` so the per-key state expires
    once the watermark passes the first occurrence — bounded state, the
    property plain streaming ``dropDuplicates`` lacks (its key store
    grows with every distinct key forever, which at 100 TB/day of
    ingest is an OOM countdown). The trade-off is the dedup horizon: a
    duplicate arriving later than the watermark delay after its
    original is NOT dropped — downstream batch dedup (d03/d09) remains
    the exactness backstop, exactly like every published ingest+compact
    corpus design.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def windowed_distinct_sketch(
    events: DataFrame,
    key_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    k: int = 4096,
) -> DataFrame:
    """Streaming distinct-count per tumbling window with a MERGEABLE
    sketch as the state (operators/sketches.KmvSketch) — the streaming
    twin of the batch sketch tier.

    Why a sketch and not ``approx_count_distinct``: the output row
    carries the window's serialized sketch next to its estimate, so
    downstream jobs can MERGE windows into day/week/corpus distinct
    counts without reprocessing the stream — COUNT(DISTINCT) is not
    summable across windows, sketches are.  State per window is O(k)
    bytes regardless of traffic; hashing happens JVM-side
    (``xxhash64``) before rows reach the stateful operator.

    Emission contract mirrors ``sessionize_stream``: a window is
    emitted ONLY once the watermark passes its end (append semantics;
    the event-time timeout just triggers the flush invocation and the
    operator re-checks the watermark itself).  Rows for a window whose
    end is already behind the watermark — i.e. a window that has
    already fired — are dropped, never re-emitted.  In the KMV exact
    regime (distinct keys per window ≤ k) the emitted estimate IS the
    exact distinct count, which is how the q48 'wsk' sub-gate pins
    this operator against plain SQL.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from data_governance_spark.operators.sketches import KmvSketch

    dur_us = int(pd.Timedelta(window).total_seconds()) * 1_000_000

    def fn(key, pdfs, state: GroupState):
        import numpy as np

        (wstart,) = key
        wstart_us = pd.Timestamp(wstart).value // 1000
        wend_us = wstart_us + dur_us
        wm_us = state.getCurrentWatermarkMs() * 1000
        if not state.exists and wend_us <= wm_us:
            # late-beyond-watermark rows for an already-fired window
            for _ in pdfs:
                pass
            return
        sk = (
            KmvSketch.from_bytes(bytes(state.get[0]))
            if state.exists
            else KmvSketch(k)
        )
        for pdf in pdfs:
            arr = pdf["h"].to_numpy(np.int64).astype(np.uint64)
            if len(arr):
                sk.add_hashes(arr)
        if wend_us <= wm_us:
            state.remove()
            yield pd.DataFrame(
                {
                    "window_start": [pd.to_datetime(wstart_us, unit="us")],
                    "n_distinct": [sk.estimate()],
                    "sketch": [sk.to_bytes()],
                }
            )
        else:
            state.update((sk.to_bytes(),))
            state.setTimeoutTimestamp(wend_us // 1000)

    pre = events.withWatermark("ts", watermark).select(
        "ts",
        F.window("ts", window).getField("start").alias("wstart"),
        F.xxhash64(F.col(key_col)).alias("h"),
    )
    return pre.groupBy("wstart").applyInPandasWithState(
        fn,
        outputStructType="window_start timestamp, n_distinct double, "
        "sketch binary",
        stateStructType="blob binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def windowed_topk_sketch(
    events: DataFrame,
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
    k: int = 64,
    topn: int = 5,
) -> DataFrame:
    """Streaming heavy hitters per tumbling window — the Misra-Gries
    twin of :func:`windowed_distinct_sketch`.  State per window is the
    serialized ≤k-counter MG sketch (O(k) regardless of traffic);
    emission mirrors the sessionizer contract (watermark re-checked by
    the operator, the timeout only triggers the flush).  Each emitted
    row carries the window's top-n values/estimates AND the sketch
    blob, which merges across windows into day-level heavy hitters
    without reprocessing.  In the exact regime (distinct keys per
    window ≤ k, no decrement) the estimates are exact counts; beyond
    it the MG undercount bound n/(k+1) applies."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from data_governance_spark.operators.sketches import MgSketch

    dur_us = int(pd.Timedelta(window).total_seconds()) * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (wstart,) = key
        wstart_us = pd.Timestamp(wstart).value // 1000
        wend_us = wstart_us + dur_us
        wm_us = state.getCurrentWatermarkMs() * 1000
        if not state.exists and wend_us <= wm_us:
            for _ in pdfs:  # late rows for an already-fired window
                pass
            return
        sk = (
            MgSketch.from_bytes(bytes(state.get[0]))
            if state.exists
            else MgSketch(k)
        )
        for pdf in pdfs:
            if len(pdf):
                sk.add_counts(pdf["v"].value_counts().to_dict())
        if wend_us <= wm_us:
            state.remove()
            top = sorted(
                sk.counters.items(), key=lambda kv: (-kv[1], kv[0])
            )[:topn]
            yield pd.DataFrame(
                {
                    "window_start": [pd.to_datetime(wstart_us, unit="us")],
                    "values": [[t[0] for t in top]],
                    "counts": [[int(t[1]) for t in top]],
                    "sketch": [sk.to_bytes()],
                }
            )
        else:
            state.update((sk.to_bytes(),))
            state.setTimeoutTimestamp(wend_us // 1000)

    pre = events.withWatermark("ts", watermark).select(
        "ts",
        F.window("ts", window).getField("start").alias("wstart"),
        F.col(key_col).cast("string").alias("v"),
    ).where(F.col("v").isNotNull())
    return pre.groupBy("wstart").applyInPandasWithState(
        fn,
        outputStructType="window_start timestamp, values array<string>, "
        "counts array<long>, sketch binary",
        stateStructType="blob binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
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
