"""data_governance_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference system (an Airflow + MongoDB bibliometric ETL; see
SURVEY.md), re-expressed Spark-first:

- every MongoDB aggregation pipeline becomes a Catalyst-optimized
  DataFrame plan (explode -> derive -> filter -> groupBy),
- every dimension-lookup dict becomes a broadcast hash join,
- every per-region / per-country query loop becomes a single grouped
  aggregation (ROLLUP where the reference computes global+sliced rows),
- record-at-a-time Python transforms become column expressions,
- plus first-class large-scale training-data operators: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard), similarity search, text
  quality/language analytics, and multimodal column plumbing.

Designed for 100 TB: no driver-side collects on fact paths, broadcast
joins for dims, AQE on, partition-count-aware shuffles.
"""

__version__ = "0.1.0"
