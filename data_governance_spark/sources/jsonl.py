"""JSONL corpus source/sink — the LLM-data interchange format.

Every open text dataset ships as ``.jsonl`` / ``.jsonl.gz`` (one JSON
object per line: {"id": ..., "text": ..., meta...}), and trainers
consume the same. Spark reads it natively; this module pins the
corpus-grade details that ad-hoc ``spark.read.json`` calls get wrong:

- EXPLICIT schema (no inference pass over 100 TB — schema inference is
  a full extra scan, and a rare field seen in one shard would change
  the schema run to run);
- malformed lines captured, not silently dropped or job-killing:
  PERMISSIVE mode with a ``_corrupt_record`` column, surfaced by
  ``jsonl_documents`` as a separate ``bad`` relation the pipeline can
  count/quarantine (a real crawl dump always has truncated lines);
- gz splittability honesty: ``.jsonl.gz`` is whole-file-decompressed —
  one task per file, same trade as sources/warc.py; shard the dataset
  into many files (they already are) or use zstd/uncompressed.

``write_jsonl`` writes shards (optionally partitioned by ``split``),
one JSON object per line via the native json writer — no Python in
either direction.

Reference twin: none — training-data extension per SURVEY.md §6.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


@dataclass
class JsonlCorpus:
    docs: DataFrame  # well-formed rows, schema columns only
    bad: DataFrame  # (_corrupt_record) raw text of malformed lines


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """Raw permissive read: ``schema`` columns plus
    ``_corrupt_record`` (NULL for well-formed lines)."""
    full = T.StructType(
        list(schema.fields)
        + [T.StructField("_corrupt_record", T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def jsonl_documents(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> JsonlCorpus:
    """The corpus-shaped view: well-formed docs and the quarantine
    relation of malformed raw lines.

    Quarantine semantics (pinned by tests): unparsable JSON *and*
    lines whose fields mismatch the schema's TYPES both land in
    ``bad`` with their raw text — a doc whose ``doc_id`` arrives as a
    string is a producer bug you want surfaced, not silently nulled.
    Fields absent from a line are simply NULL (not corruption). One
    Jackson leniency to know: a JSON NUMBER in a STRING-typed field
    coerces ("text": 5 -> "5") rather than quarantining — only
    narrowing mismatches (string where a number is required, wrong
    structure) are corruption (fuzz-pinned in tests/test_jsonl.py).
    """
    # Both relations parse via text + from_json rather than the raw
    # json reader: Spark forbids plans whose only referenced column of
    # a raw json read is _corrupt_record (QUERY_ONLY_CORRUPT_RECORD_
    # COLUMN — e.g. docs.count() after the corrupt-null filter, or any
    # bad-side query), and the documented workaround is a hidden
    # cache. from_json is the same Jackson parse inside codegen, stays
    # fully lazy, and the optimizer prunes unread struct fields.
    # Blank lines are framing, not corruption.
    full = T.StructType(
        list(schema.fields)
        + [T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = (
        spark.read.text(path)
        .filter(F.trim("value") != "")
        .select(
            "value",
            F.from_json(
                "value", full,
                {"columnNameOfCorruptRecord": "_corrupt_record"},
            ).alias("j"),
        )
    )
    docs = parsed.filter(F.col("j._corrupt_record").isNull()).select(
        *[F.col(f"j.{f.name}").alias(f.name) for f in schema.fields]
    )
    bad = parsed.filter(F.col("j._corrupt_record").isNotNull()).select(
        F.col("value").alias("_corrupt_record")
    )
    return JsonlCorpus(docs=docs, bad=bad)


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    num_files: int | None = None,
    compression: str | None = None,
) -> None:
    """Write one JSON object per line; ``partition_cols`` (e.g.
    ``["split"]``) creates the train/val/test directory layout
    trainers expect, ``num_files`` bounds shard count (repartition
    before write), ``compression`` e.g. 'gzip'/'zstd' (remember: gzip
    shards are non-splittable on re-read)."""
    if num_files is not None:
        df = df.repartition(num_files)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.json(path)
