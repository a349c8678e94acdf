"""Pivoted chart-JSON artifact sink (S14,
tmgl_regions/tasks_for_export/journal.py:148-190).

The reference reads metric slices and pivots long -> wide per
(slice, year): rows like {"ano": 2021, "<entity>": count, ...}.
These artifacts are chart-sized (a few hundred rows) — the collect at
the end is the served layer, not a fact-path collect; everything
before it (filter, pivot) is executor-side.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_metric(
    metrics: DataFrame,
    metric_type: str,
    slice_col: str = "region",
    slice_value: str | None = None,
) -> DataFrame:
    """Long metrics (type, slice, name, year, count) -> wide rows
    (ano, <name1>, <name2>, ...) sorted by year (O1)."""
    df = metrics.filter(F.col("type") == metric_type)
    df = (
        df.filter(F.col(slice_col).isNull())
        if slice_value is None
        else df.filter(F.col(slice_col) == slice_value)
    )
    return (
        df.groupBy(F.col("year").alias("ano"))
        .pivot("name")
        .agg(F.first("count"))
        .orderBy("ano")
    )


def chart_json(
    metrics: DataFrame,
    metric_type: str,
    slice_col: str = "region",
    slice_value: str | None = None,
) -> list[dict[str, Any]]:
    """The JSON artifact body: list of wide year-rows with nulls
    dropped (the reference emits only present entities per year)."""
    wide = pivot_metric(metrics, metric_type, slice_col, slice_value)
    return [
        {k: v for k, v in row.asDict().items() if v is not None}
        for row in wide.collect()
    ]


def write_chart_json(
    metrics: DataFrame,
    metric_type: str,
    path: str,
    slice_col: str = "region",
    slice_value: str | None = None,
) -> None:
    payload = chart_json(metrics, metric_type, slice_col, slice_value)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(payload, f, ensure_ascii=False)
