"""Enrichment stage (reference 03_xml_enriched.py): union view over
thematic collections + three idempotent array-union merges."""

from data_governance_spark.enrich.enrich import (  # noqa: F401
    enrich_db_instance_ecollection,
    enrich_instance_ecollection,
    enrich_temas,
    merge_dyn,
    union_with_provenance,
)
