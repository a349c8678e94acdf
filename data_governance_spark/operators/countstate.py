"""Generic bucketed seen-count state — the shared persistence engine
behind the LINE-dedup state (``operators/lines.py``) and the
exact-substring window state (``operators/exsubstr.py``), extracted at
the third copy (the document-tier ``DedupState`` in
``operators/incremental.py`` carries three interdependent tables and
keeps its own machinery; these tiers all need exactly ONE table of
``(key columns..., n, batch_id)`` rows with additive counts).

Contract shared by every user:

- **Storage**: one parquet table under ``<path>/<part>``, BUCKETED and
  sorted by the key columns through ``incremental.py``'s
  ``_write_bucketed_set`` two-phase staging swap; a ``<path>/params``
  row records the kind tag, bucket count, key columns, and any
  tier-specific parameters (e.g. the substring window width — params
  that change the key semantics MUST live here, never in caller
  defaults).
- **Reads fold**: the table may hold multiple rows per key (one per
  append — LSM-style); every reader aggregates ``sum(n)`` per key,
  which the bucketed distribution keeps Exchange-free.
- **Appends** write only the increment's per-key counts (cost ∝
  increment) as ``(keys..., n, batch_id)``; ``batch_id`` is the heal
  idempotency key — re-running an append of unknown outcome with
  ``heal=True`` anti-joins on ``keys + [batch_id]`` first, so a torn
  append cannot double-count. Single table, so there is no cross-table
  tear ordering.
- **Compaction** folds rows to one per ``(keys..., batch_id)`` with
  ``sum(n)`` (sum-preserving; batch ids survive, so heal keeps working
  across a compaction) and rewrites to one file per bucket.

The ``kind`` tag guards against pointing one tier's loader at another
tier's path — counts are only meaningful under the key definition that
produced them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_governance_spark.operators.incremental import (
    _ensure_bucketed_table,
    _list_data_files,
    _read_state_params,
    _state_table_name,
    _write_bucketed_set,
)


def _require_count_state(
    spark: SparkSession,
    path: str,
    kind: str,
    desc: str,
    caller: str,
    key_cols: list[str] | None = None,
    part: str | None = None,
) -> tuple[int, dict]:
    """Validate the params row at ``path`` (kind tag + bucketed) and
    return (buckets, params dict with ``keys``/``part`` resolved).
    ``desc`` names the expected tier in the error (e.g. 'a line-dedup
    state'). ``key_cols``/``part`` are the CALLER's tier constants:
    they fill in params rows written before the layout fields existed
    (the r11 pre-refactor line-state format recorded only
    kind+buckets), and a stored value that CONTRADICTS them raises —
    that is a real key-definition mismatch, not a migration."""
    p, buckets = _read_state_params(spark, path)
    fields = list(p.__fields__) if hasattr(p, "__fields__") else []
    if "kind" not in fields or p["kind"] != kind:
        raise ValueError(
            f"{caller}: state at {path} is not {desc} "
            f"(other tiers' states are not interchangeable — counts "
            "are only meaningful under the key definition that "
            "produced them)"
        )
    if not buckets:
        raise ValueError(
            f"{caller} requires a bucketed count state (save with "
            "buckets=N)"
        )
    params = {f: p[f] for f in fields}
    for name, given in (("keys", ",".join(key_cols or []) or None),
                        ("part", part)):
        stored = params.get(name)
        if stored is not None and given is not None and stored != given:
            raise ValueError(
                f"{caller}: stored {name}={stored!r} at {path} does "
                f"not match this tier's {name}={given!r}"
            )
        if stored is None:
            if given is None:
                raise ValueError(
                    f"{caller}: state at {path} predates the layout "
                    f"params and the caller supplied no {name}"
                )
            params[name] = given
    return buckets, params


def save_count_state(
    rows: DataFrame,
    path: str,
    buckets: int,
    kind: str,
    key_cols: list[str],
    part: str,
    extra_params: dict | None = None,
) -> None:
    """Persist ``rows`` (key columns + ``n``; ``batch_id`` stamped
    'base' when absent) bucketed by ``key_cols`` under
    ``<path>/<part>``, plus the params row. Two-phase staging swap — a
    same-path resave reads the files it replaces."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    spark = rows.sparkSession
    if "batch_id" not in rows.columns:
        rows = rows.withColumn("batch_id", F.lit("base"))
    cols = list(key_cols) + ["n", "batch_id"]
    _write_bucketed_set(
        [(rows.select(*cols), part, list(key_cols))], path, buckets
    )
    extras = dict(extra_params or {})
    schema = ["kind string", "buckets int", "keys string", "part string"]
    vals: list = [kind, buckets, ",".join(key_cols), part]
    for k, v in extras.items():
        schema.append(f"{k} {'bigint' if isinstance(v, int) else 'string'}")
        vals.append(v)
    spark.createDataFrame([tuple(vals)], ", ".join(schema)).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/params")


def load_count_state(
    spark: SparkSession,
    path: str,
    kind: str,
    desc: str,
    key_cols: list[str] | None = None,
    part: str | None = None,
) -> tuple[DataFrame, dict]:
    """(bucketed-table scan, params dict). The scan's increment joins
    read the corpus-sized side with no Exchange. ``key_cols``/``part``
    are the caller tier's constants (used for pre-layout-params states
    — see ``_require_count_state``)."""
    buckets, params = _require_count_state(
        spark, path, kind, desc, "load_count_state", key_cols, part
    )
    rows = _ensure_bucketed_table(
        spark,
        _state_table_name(path, params["part"]),
        f"{path}/{params['part']}",
        params["keys"].split(","),
        buckets,
    )
    return rows, params


def append_count_state(
    delta: DataFrame,
    path: str,
    kind: str,
    desc: str,
    batch_id: str,
    heal: bool = False,
    key_cols: list[str] | None = None,
    part: str | None = None,
) -> tuple[DataFrame, dict]:
    """Append an increment's per-key counts (see module doc). Returns
    the freshly loaded (rows, params) — chain the next increment off
    the return value."""
    spark = delta.sparkSession
    buckets, params = _require_count_state(
        spark, path, kind, desc, "append_count_state", key_cols, part
    )
    if not batch_id or batch_id == "base":
        raise ValueError(
            "batch_id must be a unique non-'base' increment id "
            "(it is the heal idempotency key)"
        )
    keys = params["keys"].split(",")
    part = params["part"]
    delta = (
        delta.select(*keys, "n")
        .withColumn("batch_id", F.lit(batch_id))
        .localCheckpoint(eager=True)
    )
    stored = _ensure_bucketed_table(
        spark, _state_table_name(path, part), f"{path}/{part}", keys, buckets
    )
    if heal:
        delta = delta.join(
            stored, keys + ["batch_id"], "left_anti"
        ).localCheckpoint(eager=True)
    (
        delta.repartition(buckets, *[F.col(k) for k in keys])
        .write.mode("append")
        .option("path", f"{path}/{part}")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(_state_table_name(path, part))
    )
    return load_count_state(spark, path, kind, desc, key_cols, part)


def count_state_report(
    spark: SparkSession,
    path: str,
    kind: str,
    desc: str,
    key_cols: list[str] | None = None,
    part: str | None = None,
) -> dict:
    """File-count health of the append loop: ``{part: {files, buckets,
    files_per_bucket}}``."""
    buckets, params = _require_count_state(
        spark, path, kind, desc, "count_state_report", key_cols, part
    )
    part = params["part"]
    n = len(_list_data_files(spark, f"{path}/{part}"))
    return {
        part: {
            "files": n,
            "buckets": buckets,
            "files_per_bucket": n / buckets,
        }
    }


def compact_count_state(
    spark: SparkSession,
    path: str,
    kind: str,
    desc: str,
    max_files_per_bucket: int = 1,
    key_cols: list[str] | None = None,
    part: str | None = None,
) -> dict:
    """Fold rows to one per (keys, batch_id) and rewrite to one file
    per bucket when the append loop has grown the table past
    ``buckets * max_files_per_bucket`` files. Sum-preserving; reads
    PLAIN parquet, not the bucketed catalog scan (the planner would
    delete the bucket-aligning repartition and disable bucketed
    reading — the measured trap documented at
    ``incremental.compact_dedup_state``)."""
    if max_files_per_bucket < 1:
        raise ValueError(
            f"max_files_per_bucket must be >= 1, got {max_files_per_bucket}"
        )
    buckets, params = _require_count_state(
        spark, path, kind, desc, "compact_count_state", key_cols, part
    )
    keys = params["keys"].split(",")
    part = params["part"]
    n = len(_list_data_files(spark, f"{path}/{part}"))
    need = n > buckets * max_files_per_bucket
    if need:
        merged = (
            spark.read.parquet(f"{path}/{part}")
            .groupBy(*keys, "batch_id")
            .agg(F.sum("n").alias("n"))
            .select(*keys, "n", "batch_id")
        )
        _write_bucketed_set([(merged, part, keys)], path, buckets)
    return {part: {"files": n, "buckets": buckets, "compacted": need}}
