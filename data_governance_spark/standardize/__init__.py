"""Standardize stage: the reference's core record transform
(dags/data_governance/02_create_iahx_xml_collection.py, ~1k LoC of
record-at-a-time Python) as Catalyst column expressions."""
