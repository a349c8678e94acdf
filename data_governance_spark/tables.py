"""Parquet table loaders for the driver-provided testdata star schema.

Tables: region nation customer supplier part orders lineitem events
documents embeddings (TESTDATA.md). On a production cluster these would
be partitioned external tables; the loaders keep the access path behind
one function so partition pruning / bucketing strategies can evolve
without touching query code.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that are always small enough to broadcast, at any SF.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


# Sessions whose events-path confs are already pinned. spark.conf.set
# is an RPC; paying it twice per table() call on every invocation
# measurably drags hot sweep queries (q18 drifted 0.84 s -> 1.50 s when
# the pair was added in r5), so pin once per session instead. A WeakSet
# (identity-hashed, entries die with the session) rather than an
# id()-keyed set: a recycled object address must not make a NEW session
# skip its pinning. Known trade (documented at the call site): a caller
# that mutates these confs after the first events read keeps its
# mutation — the per-call re-pin this replaces would have silently
# reverted it, neither behavior can satisfy both callers, and the
# engine's contract is UTC anyway.
_EVENTS_CONF_PINNED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def _pin_events_confs(spark: SparkSession) -> None:
    if spark in _EVENTS_CONF_PINNED:
        return
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _EVENTS_CONF_PINNED.add(spark)


# Scan-plan memo: spark.read.parquet() pays driver-side source
# resolution (schema read + file listing) on EVERY call — ~84 ms each,
# 74 calls across one bench sweep (measured r14: 6.2 s of pure driver
# wall). The returned DataFrame is an immutable LAZY plan — caching it
# per (session, sf_dir, name) is plan reuse (what a catalog table scan
# would be), not result caching: every action still computes from the
# parquet files. WeakKeyDictionary on the session: entries die with it.
_SCAN_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    cache = _SCAN_MEMO.get(spark)
    if cache is None:
        cache = {}
        _SCAN_MEMO[spark] = cache
    key = (os.path.abspath(sf_dir), name)
    if key in cache:
        return cache[key]
    df = _load_table(spark, sf_dir, name)
    cache[key] = df
    return df


def _load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores ts as parquet TIMESTAMP(NANOS). How that
        # surfaces depends on the Spark line:
        #   * Spark 3.x vectorized reader rejects NANOS unless
        #     spark.sql.legacy.parquet.nanosAsLong=true, which yields a raw
        #     int64 nanos column (bigint) we truncate to micros ourselves.
        #   * Spark 4.x reads NANOS natively as timestamp_ntz (the legacy
        #     conf is a no-op there); the session TZ is pinned to UTC
        #     (session.py) so NTZ -> TZ is value-preserving.
        # Branch on the dtype Spark actually produced so either line works,
        # and fail loudly on anything else rather than letting a future
        # Spark bump surface as dozens of scattered query errors.
        # The NTZ -> timestamp cast below (and every date_format over ts)
        # reads the SESSION timezone. Our own session pins UTC
        # (session.py), but the driver's vanilla session inherits the JVM
        # default — a non-UTC TZ would shift epoch-aligned windows vs the
        # DuckDB oracle's raw NTZ arithmetic. Pin it here so the events
        # path is TZ-correct under ANY session (ADVICE r4), once per
        # session (VERDICT r5 #3: the per-call conf RPC pair cost q18
        # ~0.7 s across a sweep).
        # DELIBERATE GLOBAL SIDE EFFECT: this mutates the caller's
        # session for the rest of its life. The engine's timestamp
        # semantics are defined as UTC (DEPLOY.md); a caller that set a
        # different session TZ on purpose would get shifted not-UTC
        # semantics from every query here anyway, so failing their
        # assumption loudly-in-UTC beats returning windows that silently
        # disagree with the engine's own oracles.
        _pin_events_confs(spark)
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            return df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
        if ts_type in ("timestamp_ntz", "timestamp"):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        raise TypeError(
            "events.ts loaded as unexpected dtype "
            f"{ts_type!r} (expected bigint under Spark 3.x nanosAsLong or "
            "timestamp_ntz under Spark 4.x); the Spark parquet NANOS "
            "handling has likely changed again - update tables.table()."
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
