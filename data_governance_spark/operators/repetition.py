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

Scale shape: both metrics are strictly per-document, so they are
computed as MAP-ONLY higher-order expressions — sort the per-row
line/n-gram array, then one linear pass counts repeats (an element
equal to its sorted predecessor is a repeat) or the longest equal run
(the max n-gram frequency). No explode, no shuffle, no Python: at
100 TB the cost is O(L log L) per document inside whole-stage codegen,
embarrassingly parallel, versus the naive explode -> groupBy(doc, gram)
route which shuffles one row per token of the entire corpus. (The
naive route was this module's first implementation; the map-only
rewrite removed d01's largest shuffle.)

Reference twin: none — the reference pipeline has no training-data
operators; this family extends the engine per SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_governance_spark.cache import column_memo
from data_governance_spark.functions.text import tokens, word_shingles


def doc_lines(col: Column | str) -> Column:
    """Raw newline-split lines with whitespace-only lines dropped.

    Lines stay untrimmed: C4-style dup detection compares exact lines,
    and the char fraction must weight each occurrence by its real
    length.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, "\n"), lambda x: F.trim(x) != F.lit(""))


def _dup_char_count(sorted_arr: Column) -> Column:
    """Characters in elements equal to their sorted predecessor — i.e.
    every occurrence of a value beyond its first, weighted by length.
    One linear fold over the sorted array; state (prev, dup)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("dup"),
    )
    return F.aggregate(
        sorted_arr,
        init,
        lambda acc, x: F.struct(
            x.alias("prev"),
            (
                acc["dup"]
                + F.when(x == acc["prev"], F.length(x)).otherwise(0)
            ).alias("dup"),
        ),
        lambda acc: acc["dup"],
    )


def _max_run_length(sorted_arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a sorted
    array == the max frequency of any value. State (prev, run, best)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )
    run = lambda acc, x: F.when(x == acc["prev"], acc["run"] + 1).otherwise(  # noqa: E731
        F.lit(1).cast("long")
    )
    return F.aggregate(
        sorted_arr,
        init,
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("run"),
            F.greatest(acc["best"], run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def _dup_run_chars(sorted_arr: Column) -> Column:
    """Characters in ALL occurrences of values appearing more than once
    (Gopher's duplicated-n-gram accounting: the first copy counts too).
    Linear fold with end-of-run flush; state (prev, run, dup)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup"),
    )

    def flush(acc):
        # chars of the finished run, counted only if it repeated
        return F.when(
            acc["run"] > 1, acc["run"] * F.length(acc["prev"])
        ).otherwise(F.lit(0).cast("long"))

    return F.aggregate(
        sorted_arr,
        init,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            (
                acc["dup"]
                + F.when(x == acc["prev"], F.lit(0).cast("long")).otherwise(
                    flush(acc)
                )
            ).alias("dup"),
        ),
        lambda acc: acc["dup"] + flush(acc),
    )


def dup_ngram_stats(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-document duplicated-n-gram character fraction ``dg``.

    dg = chars in every occurrence of an n-gram that appears more than
    once / chars in all n-grams — Gopher's "fraction of characters in
    duplicate n-grams" (all copies count, including the first).
    Documents with fewer than n tokens emit no row.

    Map-only like its siblings: sort the n-gram array, one fold sums
    run lengths > 1 — no explode, no shuffle.
    """
    # the gram/fold trees are pure functions of (n, fixed names) —
    # memoized per context (column_memo; several gates compute these)
    tok = F.col(tokens_col) if tokens_col else tokens(text_col)
    toked = docs.select(
        id_col, F.size(tok).alias("_nt"), tok.alias("_toks")
    ).filter(F.col("_nt") >= n)
    grams = toked.select(
        id_col,
        column_memo(
            ("rep_grams", n),
            lambda: F.array_sort(word_shingles(F.col("_toks"), n)).alias("_g"),
        ),
    )

    def _dg_col():
        arr = F.col("_g")
        tot = F.aggregate(
            arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        return F.round(_dup_run_chars(arr).cast("double") / tot, 4).alias("dg")

    return grams.select(id_col, column_memo(("rep_dg",), _dg_col))


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

    Map-only: sort the line array, count chars in elements equal to
    their predecessor — no explode, no shuffle.
    """
    lines = docs.select(
        id_col, F.array_sort(doc_lines(text_col)).alias("_lines")
    ).filter(F.size("_lines") > 0)

    def _dl_col():
        arr = F.col("_lines")
        tot = F.aggregate(
            arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        return F.round(_dup_char_count(arr).cast("double") / tot, 4).alias("dl")

    return lines.select(id_col, column_memo(("rep_dl",), _dl_col))


def top_ngram_stats(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-document top-n-gram token coverage ``tg``.

    tg = n * max n-gram frequency / token count — the fraction of the
    document's tokens covered by (non-overlapping repeats of) its most
    frequent token n-gram. Documents with fewer than n tokens emit no
    row. Overlapping occurrences make tg > 1 possible for degenerate
    docs ("a a a a": bigram "a a" occurs 3x, tg = 6/4); that
    overshoot is part of the published heuristic (counts are raw
    occurrence counts) and still ranks repetitive docs first.

    Map-only: sort the n-gram array, the max frequency is the longest
    equal-adjacent run — no explode, no shuffle.

    Pass ``tokens_col`` to reuse an already-tokenized (e.g. persisted)
    array column instead of re-tokenizing ``text_col``.
    """
    tok = F.col(tokens_col) if tokens_col else tokens(text_col)
    toked = docs.select(
        id_col,
        F.size(tok).alias("_nt"),
        tok.alias("_toks"),
    ).filter(F.col("_nt") >= n)
    # word_shingles must see a materialized column, not an inline
    # expression (HOFs re-evaluate argument expressions per element)
    grams = toked.select(
        id_col,
        "_nt",
        column_memo(
            ("rep_grams", n),
            lambda: F.array_sort(word_shingles(F.col("_toks"), n)).alias("_g"),
        ),
    )
    return grams.select(
        id_col,
        column_memo(
            ("rep_tg", n),
            lambda: F.round(
                F.lit(n) * _max_run_length(F.col("_g")) / F.col("_nt"), 4
            ).alias("tg"),
        ),
    )
