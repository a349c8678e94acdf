"""Benchmark decontamination: drop training documents that overlap an
evaluation set.

The published pipelines (GPT-3 appendix C, PaLM, Llama) all run this
step: any training document sharing at least one n-token gram
(n typically 8-13) with a benchmark document is contaminated — it could
leak eval answers into training. This module is the Spark-first
version:

- ``benchmark_ngrams``: the DISTINCT n-gram set of the benchmark
  corpus. Eval sets are tiny next to training corpora (1e4-1e6 docs),
  so the gram set comfortably broadcasts.
- ``contaminated_ids``: corpus docs with >= ``min_hits`` grams in the
  benchmark set, with their hit counts (the audit view).
- ``decontaminate``: the corpus minus contaminated docs (anti-join).

Scale shape (100 TB corpus, small benchmark): the benchmark side is
aggregated once (one small shuffle) and broadcast; the corpus side is a
map-only explode + broadcast semi-join + per-doc count — the fact scan
never shuffles on gram keys. Grams are matched as exact strings (no
hash, no false positives). A benchmark too large to broadcast gets the
SHUFFLE tier (``strategy``): both gram relations hash-partition on the
gram key and equi-join — the corpus side pays one shuffle, the honest
cost once the gram set exceeds executor memory. ``strategy="auto"``
picks by counting the benchmark's documents (one cheap job over the
small side) against ``broadcast_max_docs``.

Docs shorter than ``n`` tokens contain no n-gram and are never flagged.

Reference twin: none — training-data extension per SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_governance_spark.functions.text import tokens, word_shingles


def _doc_ngrams(
    docs: DataFrame, n: int, id_cols: list[str], text_col: str
) -> DataFrame:
    """One row per (id_cols, distinct n-gram); docs with < n tokens
    emit nothing. Tokens are materialized before shingling (HOF
    re-evaluation trap — see functions/text.shingle_hashes)."""
    toked = docs.select(*id_cols, tokens(text_col).alias("_t")).filter(
        F.size("_t") >= n
    )
    return toked.select(
        *id_cols,
        F.explode(F.array_distinct(word_shingles(F.col("_t"), n))).alias(
            "gram"
        ),
    )


def benchmark_ngrams(
    benchmark: DataFrame, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """The distinct n-gram set of the benchmark corpus: one small
    relation ``(gram)`` suitable for broadcasting."""
    return _doc_ngrams(benchmark, n, [], text_col).distinct()


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    strategy: str = "broadcast",
    broadcast_max_docs: int = 100_000,
) -> DataFrame:
    """``(id_col, hits)`` for corpus docs sharing >= ``min_hits``
    distinct n-grams with the benchmark. ``min_hits > 1`` trades recall
    for robustness against boilerplate n-grams that happen to appear in
    an eval prompt.

    ``strategy``:

    - ``"broadcast"`` (default — eval sets are small): the distinct
      benchmark gram set ships to every executor; the corpus gram
      relation never shuffles.
    - ``"shuffle"``: plain hash-partitioned equi-join on the gram key —
      the tier for a benchmark whose gram set exceeds executor memory.
      Both sides shuffle on gram; per-gram skew on the corpus side is
      AQE skew-join territory (the benchmark side is distinct, one row
      per gram, so no key explodes the output beyond its corpus
      occurrence count).
    - ``"auto"``: count the benchmark's documents (one job over the
      SMALL side only) and pick broadcast iff
      ``count <= broadcast_max_docs``.
    """
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1, got {min_hits}")
    if strategy not in ("broadcast", "shuffle", "auto"):
        raise ValueError(
            f"strategy must be 'broadcast', 'shuffle' or 'auto', "
            f"got {strategy!r}"
        )
    if strategy == "auto":
        strategy = (
            "broadcast"
            if benchmark.count() <= broadcast_max_docs
            else "shuffle"
        )
    bench = benchmark_ngrams(benchmark, n, bench_text_col)
    if strategy == "broadcast":
        bench = F.broadcast(bench)
    grams = _doc_ngrams(corpus, n, [id_col], text_col)
    return (
        grams.join(bench, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") >= min_hits)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    strategy: str = "broadcast",
    broadcast_max_docs: int = 100_000,
) -> DataFrame:
    """The corpus with contaminated documents removed (left anti-join
    on the contaminated id set). ``strategy`` picks the gram-join tier
    — see ``contaminated_ids``."""
    bad = contaminated_ids(
        corpus,
        benchmark,
        n,
        min_hits,
        id_col,
        text_col,
        bench_text_col,
        strategy,
        broadcast_max_docs,
    ).select(id_col)
    return corpus.join(bad, id_col, "left_anti")
