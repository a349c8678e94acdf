"""Metric-family runner: the reference's ~20 aggregation DAG files
(tmgl_regions/dag_02_*.py, tmgl_countries/dag_02_*.py) as ONE
parameterized grouped count."""

from data_governance_spark.metrics.runner import MetricSpec, run_metric, run_metrics  # noqa: F401
