"""Intra-document repetition statistics — C4/Gopher-family quality
signals that decide whether a scraped document is boilerplate/templated
before it enters a training corpus.

Published heuristics only (public work): C4 (Raffel et al. 2020)
discards documents with repeated lines; Gopher/MassiveText (Rae et al.
2021, appendix A) filters on the fraction of characters in duplicate
lines and the fraction of a document covered by its most frequent
n-gram. This module computes those per-document fractions:

- ``dup_line_stats``: fraction of line-characters that are repeat
  occurrences (every copy of a line beyond its first) — ``dl``.
- ``top_ngram_stats``: fraction of tokens covered by the single most
  frequent token n-gram — ``tg``.

Scale shape: both are explode -> hash-aggregate on a (doc_id, value)
key, then a second per-doc aggregate. Both aggregations are map-side
combinable, there is no per-document quadratic work (no self-join of
lines against lines), and no Python in the hot path — so at 100 TB
these behave exactly like any other two-level hash aggregation: one
shuffle of the (doc, line/ngram) partial counts, partitioned by doc_id.
A pathologically hot doc_id cannot skew the first aggregate because the
key includes the line/ngram value; the second (per-doc) aggregate
receives at most one row per distinct value per doc.

Reference twin: none — the reference pipeline has no training-data
operators; this family extends the engine per SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_governance_spark.functions.text import tokens, word_shingles


def doc_lines(col: Column | str) -> Column:
    """Raw newline-split lines with whitespace-only lines dropped.

    Lines stay untrimmed: C4-style dup detection compares exact lines,
    and the char fraction must weight each occurrence by its real
    length.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, "\n"), lambda x: F.trim(x) != F.lit(""))


def dup_line_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document duplicate-line character fraction ``dl``.

    dl = sum over distinct lines of (occurrences-1) * len(line)
         / sum over distinct lines of occurrences * len(line)

    i.e. the fraction of line-characters belonging to repeat
    occurrences. 0.0 = no line repeats; -> 1.0 = the document is one
    line repeated many times. Documents with no non-empty line emit no
    row (the fraction is undefined).
    """
    lines = docs.select(
        id_col, F.explode(doc_lines(text_col)).alias("_line")
    )
    per_line = lines.groupBy(id_col, "_line").agg(
        F.count(F.lit(1)).alias("_c"), F.length(F.first("_line")).alias("_l")
    )
    c, l = F.col("_c"), F.col("_l")
    return per_line.groupBy(id_col).agg(
        F.round(
            F.sum((c - 1) * l).cast("double") / F.sum(c * l), 4
        ).alias("dl")
    )


def top_ngram_stats(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-n-gram token coverage ``tg``.

    tg = n * max n-gram frequency / token count — the fraction of the
    document's tokens covered by (non-overlapping repeats of) its most
    frequent token n-gram. Documents with fewer than n tokens emit no
    row. Overlapping occurrences make tg > 1 possible for degenerate
    docs ("a a a a": bigram "a a" occurs 3x, tg = 6/4); that
    overshoot is part of the published heuristic (counts are raw
    occurrence counts) and still ranks repetitive docs first.
    """
    toked = docs.select(
        id_col, F.size(tokens(text_col)).alias("_nt"), tokens(text_col).alias("_toks")
    ).filter(F.col("_nt") >= n)
    grams = toked.select(
        id_col, "_nt", F.explode(word_shingles(F.col("_toks"), n)).alias("_g")
    )
    per_gram = grams.groupBy(id_col, "_nt", "_g").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return per_gram.groupBy(id_col, "_nt").agg(
        F.round(F.lit(n) * F.max("_c") / F.col("_nt"), 4).alias("tg")
    ).select(id_col, "tg")
