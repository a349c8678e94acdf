"""Composite operators: dedup sketches (MinHash/SimHash/exact
precluster), similarity search (brute-force/LSH/IVF kNN, cosine
near-dup), connected-components dedup closure + canonical selection,
C4/Gopher intra-document repetition signals, Gopher quality-filter
composition, C4 line-level cleaning + cross-corpus line dedup,
PII detection/redaction, benchmark decontamination
(n-gram overlap vs an eval set), URL/domain filtering (suffix-aware
blocklists + pattern tier), deterministic hash-based holdout
split/sampling, sequence packing, salted-aggregation skew tools,
bucketed co-located joins, and the multimodal Arrow plumbing.
``data_governance_spark.corpus.prepare_corpus`` chains the corpus
subset end-to-end."""
