"""The TMGL metrics chain (SURVEY §3.2-3.3): iAHx XML dumps ->
landing -> metric families -> chart artifacts / dashboards — three
reference DAG packages (tmgl_metrics, tmgl_regions, tmgl_countries)
as one driver program.

Where the reference runs 11 metric DAGs x (1 global + N regions)
server-side queries plus an Airflow task per country, this computes
every family over ONE pass of the landing table per grouping
(global + region-fanned + country-fanned)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_governance_spark.metrics.runner import (
    attach_slice,
    run_metric,
    run_metrics,
)
from data_governance_spark.metrics.runner import label_join
from data_governance_spark.metrics.tmgl_specs import (
    TMGL_SPECS,
    decs_label_dim,
    map_metric,
    timeline_metric,
)
from data_governance_spark.sources.solr_xml import project_fields, read_solr_xml

# tmgl landing columns read by the metric pipelines (FIXTURES §1.2)
TMGL_COLUMNS = [
    "instance", "dp", "la", "ta", "type", "type_of_study", "mj",
    "tag_dimentions", "tag_mtc_tema2", "tag_mtc_tema3",
    "traditional_medicines_cluster", "who_regions", "fulltext", "cp",
    "pais_afiliacao",
]
# XML repeated-field parsing leaves everything as arrays; these are
# read as scalars by the pipelines (string compare on fulltext, free
# text dp)
TMGL_SCALARS = {"dp", "fulltext"}


def ingest_tmgl_landing(
    spark: SparkSession, xml_glob: str, num_partitions: int | None = None
) -> DataFrame:
    """S8-S11: parse the dumps, keep instance='tmgl', typed columns."""
    raw = read_solr_xml(
        spark, xml_glob, instance_filter="tmgl", num_partitions=num_partitions
    )
    return project_fields(raw, TMGL_COLUMNS, scalar=TMGL_SCALARS)


def compute_metrics(
    landing: DataFrame,
    who_region_dim: DataFrame,
    decs: DataFrame | None = None,
    areas: DataFrame | None = None,
) -> DataFrame:
    """All metric families, global + per-region + per-country, into one
    long table (type, region, country, name, year, count).

    ``decs`` enables the J12 subject decode (numeric ids -> English
    descriptors); ``areas`` the J11 dimension/therapy label decode —
    both applied post-aggregation exactly as the reference does."""
    global_rows = run_metrics(landing, TMGL_SPECS).withColumn(
        "country", F.lit(None).cast("string")
    )

    by_region = attach_slice(
        landing, "cp", who_region_dim, dim_country_col="pais_en",
        dim_slice_col="who_region", slice_col="region",
    )
    region_rows = run_metrics(by_region, TMGL_SPECS, slice_col="region").withColumn(
        "country", F.lit(None).cast("string")
    )

    by_country = attach_slice(
        landing, "cp", who_region_dim, dim_country_col="pais_en",
        dim_slice_col="pais_en", slice_col="country",
    )
    country_rows = (
        run_metrics(by_country, TMGL_SPECS, slice_col="country")
        .withColumnRenamed("country", "_c")
        .withColumn("region", F.lit(None).cast("string"))
        .withColumnRenamed("_c", "country")
    )

    cols = ["type", "region", "country", "name", "year", "count"]
    out = (
        global_rows.select(*cols)
        .unionByName(region_rows.select(*cols))
        .unionByName(country_rows.select(*cols))
    )

    # post-aggregation label decodes (J11/J12), scoped per metric type
    def decode(df: DataFrame, metric_type: str, labels: DataFrame) -> DataFrame:
        target = df.filter(F.col("type") == metric_type)
        rest = df.filter(F.col("type") != metric_type)
        return rest.unionByName(label_join(target, labels).select(*cols))

    if decs is not None:
        out = decode(out, "subject", decs_label_dim(decs))
    if areas is not None:
        for t in ("dimension", "therapy"):
            out = decode(out, t, areas)
    return out


def compute_timeline(landing: DataFrame, who_region_dim: DataFrame) -> DataFrame:
    """A11 global + A12 per-country (type='indicators'/'map' rows in
    the reference's store)."""
    glob = timeline_metric(landing).withColumn("country", F.lit(None).cast("string"))
    by_country = attach_slice(
        landing, "cp", who_region_dim, dim_country_col="pais_en",
        dim_slice_col="pais_en", slice_col="country",
    )
    per_country = map_metric(by_country, slice_col="country")
    cols = ["country", "year", "total", "with_fulltext"]
    return glob.select(*cols).unionByName(per_country.select(*cols))
