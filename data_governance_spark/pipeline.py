"""The reference's main ETL (SURVEY §3.1 DG_00_run_all_incremental) as
one driver program of chained DataFrame stages.

Reference shape: 6 Airflow DAGs — harvest -> standardize (02) -> x01
normalization -> enrich (03) -> export XML — each a separate process
doing read-modify-write against MongoDB. Here the whole chain is one
lazy lineage; ``checkpoint_dir`` optionally materializes each stage as
parquet (the medallion tables), which is what a production deployment
would do for restartability, but nothing requires it.

The per-stage fan-outs of the reference (offset-sliced batch tasks,
dynamic task mapping) disappear into partition parallelism.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame

from data_governance_spark.enrich import (
    enrich_db_instance_ecollection,
    enrich_instance_ecollection,
    enrich_temas,
    union_with_provenance,
)
from data_governance_spark.sinks.xml_sink import doc_xml, write_solr_xml
from data_governance_spark.standardize.transform import standardize
from data_governance_spark.standardize.x01 import (
    normalize_country_fields,
    rename_ai,
)


@dataclass
class Dims:
    """The dimension tables the pipeline joins against (FIXTURES §2)."""

    tabpais: DataFrame
    title_current: DataFrame
    decs: DataFrame
    instance_ecollection: DataFrame | None = None
    db_instance_ecollection: DataFrame | None = None
    temas: dict[str, DataFrame] | None = None
    brisa_ai: DataFrame | None = None


STAGES = ("02_iahx_xml", "02_x01", "03_xml_enriched")


def run_pipeline(
    landing: DataFrame,
    dims: Dims,
    current_year: int,
    checkpoint_dir: str | None = None,
    checkpoint_stages: tuple[str, ...] = STAGES,
    truncate_stages: tuple[str, ...] = (),
    truncate_keep: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """landing zone -> enriched wide table (03-stage equivalent).

    ``checkpoint_stages`` selects which of the medallion tables to
    materialize when ``checkpoint_dir`` is set (default: all three).
    Checkpointing after 02 alone already truncates the big standardize
    expression tree (the Catalyst-analysis memory hog); the later
    stages add restartability at the cost of a disk round-trip each.

    ``truncate_stages`` names stages to cut with ``localCheckpoint``
    instead: the same lineage truncation with no parquet encode/decode
    or file-system round-trip (guide §5 — localCheckpoint is the
    cheaper lineage cut when fault tolerance of the intermediate is
    not needed). Right for gates/benchmarks; production restartability
    still wants ``checkpoint_dir``. A stage named in both uses the
    durable parquet checkpoint.

    ``truncate_keep`` optionally maps a truncated stage name to the
    column subset the CALLER promises the rest of its chain reads. A
    localCheckpoint is an RDD barrier, so Catalyst's column pruning
    cannot reach back through it — without this, the cut materializes
    every wide-select column (the fo/lo citation trees are the most
    expensive expressions in the 02 stage) even when the caller's
    downstream touches a fraction of them (guide §5/§6: pruning must
    reach the materialization). The projection is applied just before
    the cut; a column outside the list that IS read downstream fails
    loudly at analysis, never silently. Ignored for parquet-checkpoint
    stages (the durable medallion table keeps its full schema).
    """

    def checkpoint(df: DataFrame, name: str) -> DataFrame:
        if checkpoint_dir is not None and name in checkpoint_stages:
            path = os.path.join(checkpoint_dir, name)
            df.write.mode("overwrite").parquet(path)
            return df.sparkSession.read.parquet(path)
        if name in truncate_stages:
            keep = (truncate_keep or {}).get(name)
            if keep:
                df = df.select(*keep)
            # eager=False: the logical plan is truncated immediately
            # (same analysis-memory bound), but the blocks materialize
            # inside the caller's first action instead of a separate
            # job here — one fewer job per run, identical rows
            # (equivalence test pins all modes).
            return df.localCheckpoint(eager=False)
        return df

    # stage 02: standardize
    std = standardize(
        landing, dims.tabpais, dims.title_current, dims.decs, current_year
    )
    std = checkpoint(std, "02_iahx_xml")

    # stage 02_x01: normalization + ai rename
    std = normalize_country_fields(std)
    if dims.brisa_ai is not None:
        std = rename_ai(std, dims.brisa_ai)
    std = checkpoint(std, "02_x01")

    # stage 03: enrichment
    enriched = std
    if dims.instance_ecollection is not None:
        enriched = enrich_instance_ecollection(enriched, dims.instance_ecollection)
    if dims.db_instance_ecollection is not None:
        enriched = enrich_db_instance_ecollection(
            enriched, dims.db_instance_ecollection
        )
    if dims.temas:
        enriched = enrich_temas(enriched, union_with_provenance(dims.temas))
    return checkpoint(enriched, "03_xml_enriched")


def export_xml(enriched: DataFrame, out_path: str, single_file: bool = False) -> None:
    """stage 04: the iAHx XML export."""
    write_solr_xml(doc_xml(enriched), out_path, single_file=single_file)
