"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` but every config here is chosen to
also make sense on a large cluster: AQE for runtime re-planning and
skew-join handling, Arrow for the (rare) Pandas-UDF paths, UTC session
time so timestamp semantics are deployment-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "data_governance_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver harness
    contract); on a real cluster the master/resource settings come from
    spark-submit and these local settings are ignored.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # The PySpark-4 DataFrame-debugging origin capture wraps EVERY
        # Column/DataFrame method with ~4 py4j round trips (getActiveSession,
        # conf.get, PySparkCurrentOrigin.set/clear) plus a Python stack walk —
        # measured 50% of q36's plan-construction round trips (23.4k -> 11.9k).
        # It only enriches error messages with user call sites; plans, results
        # and executor behavior are untouched. Flip to "true" when debugging.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
