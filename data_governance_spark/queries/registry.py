"""Merged query registry consumed by __spark_entry__.py, tests, bench."""

from __future__ import annotations

from data_governance_spark.queries import (
    documents,
    embeddings,
    metric_queries,
    relational,
)
from data_governance_spark.queries.base import QueryDef

QUERIES: dict[str, QueryDef] = {}
for mod in (relational, documents, embeddings, metric_queries):
    overlap = QUERIES.keys() & mod.QUERIES.keys()
    if overlap:
        raise RuntimeError(f"duplicate query names: {overlap}")
    QUERIES.update(mod.QUERIES)

ORACLES: dict[str, str] = {
    name: q.oracle for name, q in QUERIES.items() if q.oracle is not None
}
