"""Streaming Solr-format XML source (S8-S11).

The reference ingests iAHx XML dumps (<add><doc><field name=...>) with
lxml.iterparse, one Airflow task per file
(dags/tmgl_metrics/dag_01_full_update.py:83-211): repeated field names
become lists (second occurrence), docs are filtered to
instance='tmgl' and deduped first-in-file-wins.

Spark-first shape: the unit of parallelism is the FILE (dumps are
many-file drops). A DataFrame of paths is repartitioned and each
partition streams its files through stdlib ElementTree.iterparse with
elem.clear() — memory stays bounded per file regardless of dump size,
and 1000 files use 1000 tasks' worth of parallelism. Values are
normalized to array<string> at ingest (F21: the same field may be
string or list per record in the reference; a fixed ArrayType schema
removes the string-or-list ambiguity for every downstream operator).
"""

from __future__ import annotations

import glob as globlib
import os
import xml.etree.ElementTree as ET
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("fields", T.MapType(T.StringType(), T.ArrayType(T.StringType()))),
        T.StructField("_file", T.StringType()),
    ]
)


def _parse_file(path: str) -> Iterator[tuple]:
    """Yield (id, {field: [values...]}, file) per <doc>, streaming."""
    seen_ids: set[str] = set()  # S10: first occurrence per file wins
    for _event, elem in ET.iterparse(path, events=("end",)):
        if elem.tag != "doc":
            continue
        fields: dict[str, list[str]] = {}
        for f in elem.iter("field"):
            name = f.get("name")
            if name is None:
                continue
            fields.setdefault(name, []).append(f.text or "")
        elem.clear()
        doc_id = fields.get("id", [None])[0]
        if doc_id is None or doc_id in seen_ids:
            continue
        seen_ids.add(doc_id)
        yield (doc_id, fields, os.path.basename(path))


def read_solr_xml(
    spark: SparkSession,
    paths: list[str] | str,
    instance_filter: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """paths: list of files or a glob (S11 file-listing source).

    Returns (id, fields: map<string,array<string>>, _file). Apply
    ``instance_filter='tmgl'`` for the reference's S9 ingest filter.
    """
    if isinstance(paths, str):
        paths = sorted(globlib.glob(paths))
    if not paths:
        return spark.createDataFrame([], PARSED_SCHEMA)
    n = num_partitions or min(len(paths), 64)

    path_df = spark.createDataFrame(
        [(p,) for p in paths], T.StructType([T.StructField("path", T.StringType())])
    ).repartition(n, "path")

    def parse_partition(rows: Iterator) -> Iterator[tuple]:
        for row in rows:
            yield from _parse_file(row.path)

    out = path_df.rdd.mapPartitions(parse_partition).toDF(PARSED_SCHEMA)
    if instance_filter is not None:
        out = out.filter(
            F.array_contains(
                F.coalesce(
                    F.col("fields")["instance"], F.array().cast("array<string>")
                ),
                instance_filter,
            )
        )
    return out


def project_fields(df: DataFrame, columns: list[str], scalar: set[str] | None = None) -> DataFrame:
    """Flatten the map into named columns: arrays by default, first
    element for the named scalar fields."""
    scalar = scalar or set()
    cols = [F.col("id")]
    for c in columns:
        v = F.col("fields")[c]
        # F.get: NULL (not an ANSI error) if a scalar field's list is empty
        cols.append((F.get(v, 0) if c in scalar else v).alias(c))
    return df.select(*cols)
