"""C4-style line-level cleaning (Raffel et al. 2020, §2.2).

Gopher-style DOCUMENT filters (operators/quality.py) drop whole pages;
C4's complementary LINE tier rewrites pages: navigation stubs, cookie
banners and menu fragments are short un-punctuated lines inside
otherwise-good pages. The published rules, re-expressed as pure
higher-order column functions:

- keep only lines with >= ``min_words`` words;
- keep only lines ending in terminal punctuation (``. ! ? "``),
  optionally;
- drop lines containing any of ``drop_line_phrases`` (C4: lines with
  the word "javascript");
- after line cleaning, drop DOCUMENTS with fewer than ``min_lines``
  surviving lines, or containing any of ``drop_doc_phrases`` (C4:
  "lorem ipsum", a "{" — code leakage);
- surviving documents get their text REBUILT from the kept lines.

Everything is map-only (split -> filter -> rejoin inside codegen-able
HOFs; zero shuffle) — at 100 TB this runs at scan speed ahead of the
shuffle-bearing dedup stages, exactly where C4 runs it.

Reference twin: none — training-data extension per SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_governance_spark.operators.repetition import doc_lines

# period / exclamation / question mark / straight or curly close quote,
# with trailing whitespace tolerated
_TERMINAL_RE = "[.!?\"”]\\s*$"


def _line_ok(
    min_words: int,
    terminal_punct: bool,
    drop_line_phrases: tuple[str, ...],
):
    def ok(line: Column) -> Column:
        words = F.size(
            F.filter(F.split(line, r"\s+"), lambda w: w != "")
        )
        cond = words >= min_words
        if terminal_punct:
            cond = cond & line.rlike(_TERMINAL_RE)
        low = F.lower(line)
        for p in drop_line_phrases:
            cond = cond & ~low.contains(p.lower())
        return cond

    return ok


def clean_lines(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    terminal_punct: bool = True,
    drop_line_phrases: tuple[str, ...] = ("javascript",),
    min_lines: int = 3,
    drop_doc_phrases: tuple[str, ...] = ("lorem ipsum", "{"),
) -> DataFrame:
    """Apply the C4 line rules; returns the docs that survive, with
    ``text_col`` rebuilt from the kept lines (newline-joined). Schema
    is unchanged. Defaults are the published C4 values; pass
    ``terminal_punct=False`` / ``min_lines=1`` / empty phrase tuples to
    relax individual rules.
    """
    if min_words < 1 or min_lines < 1:
        raise ValueError("min_words and min_lines must be >= 1")
    # materialize the line array as a REAL column before the HOF filter
    # reads it, then fence the document filter behind a Sample(1.0)
    # barrier — without it the optimizer substitutes the HOF aliases
    # into the predicate and re-splits the text per fold (the
    # operators/quality.py _fence lesson, measured 47x there)
    staged = docs.select(
        "*", doc_lines(text_col).alias("_cl_lines")
    ).select(
        "*",
        F.filter(
            "_cl_lines",
            _line_ok(min_words, terminal_punct, drop_line_phrases),
        ).alias("_cl_kept"),
    ).sample(1.0, seed=0)
    low = F.lower(F.col(text_col))
    doc_ok = F.size("_cl_kept") >= min_lines
    for p in drop_doc_phrases:
        doc_ok = doc_ok & ~low.contains(p.lower())
    rebuilt = F.array_join(F.col("_cl_kept"), "\n")
    return staged.filter(doc_ok).select(
        *[
            rebuilt.alias(c) if c == text_col else F.col(c)
            for c in docs.columns
        ]
    )
