from data_governance_spark.queries.registry import ORACLES, QUERIES, QueryDef  # noqa: F401
