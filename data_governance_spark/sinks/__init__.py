"""Sinks: Solr-XML export, pivoted chart JSON export."""
