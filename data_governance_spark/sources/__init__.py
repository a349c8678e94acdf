"""Sources: Solr-format XML ingest, paginated REST harvester plumbing."""
