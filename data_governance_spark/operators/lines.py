"""Line-level corpus cleaning: C4 rules + cross-corpus line dedup.

Gopher-style DOCUMENT filters (operators/quality.py) drop whole pages;
the LINE tier rewrites pages. Two published operators live here:

``clean_lines`` — C4's intra-document rules (Raffel et al. 2020,
§2.2): navigation stubs, cookie banners and menu fragments are short
un-punctuated lines inside otherwise-good pages. Re-expressed as pure
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

``clean_lines`` is map-only (split -> filter -> rejoin inside
codegen-able HOFs; zero shuffle) — at 100 TB it runs at scan speed
ahead of the shuffle-bearing dedup stages, exactly where C4 runs it.

``dedup_lines_global`` — the INTER-document sibling (RefinedWeb /
MassiveText line dedup, C4's duplicated-span removal): a line
occurring in many documents is boilerplate no intra-doc rule can see
(the same cookie banner on every page of a site). Occurrence counting
is inherently global, so this one DOES shuffle — once on the line key
(window) and once on the doc key (rebuild) — which is the honest
minimum for the semantics; run it after the map-only tiers have cut
the volume.

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


def dedup_lines_global(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_dup: int = 2,
    keep: str = "first",
    strategy: str = "window",
) -> DataFrame:
    """Remove exact-duplicate lines ACROSS the corpus. A non-empty
    line whose TRIMMED form occurs in >= ``min_dup`` places is treated
    as boilerplate (trailing-whitespace variants of a banner are the
    same banner; surviving occurrences keep their raw bytes);
    ``keep="first"`` retains its single first occurrence
    (ordered by (``id_col``, line position) — deterministic),
    ``keep="none"`` removes every occurrence. Unique lines always
    survive. Documents are rebuilt from their surviving lines in
    original order; documents with no surviving line are dropped.
    (Whitespace-only lines never reach the dedup: ``doc_lines`` drops
    them at the split — the "non-empty" wording above rests on that
    upstream invariant.)

    ``strategy``:

    - ``"window"`` (default): posexplode lines -> one window over the
      line key (count + rank) -> filter -> groupBy doc to rebuild ->
      join back for the payload columns. Two key-shuffles total, the
      honest minimum for global semantics — but the window routes ALL
      occurrences of a key to one partition, so a mega-line (the same
      banner on a billion pages) makes one hot partition.
    - ``"broadcast"`` (the skew tier): aggregate per-key count + first
      occurrence with a hash aggregate — partial (map-side) combine
      does the salting implicitly, each map task emits one row per
      key, so no reducer ever sees a key's full occurrence list — then
      keep only keys with ``count >= min_dup`` (the boilerplate set,
      tiny by construction: only REPEATED lines) and broadcast it back
      against the line relation as a line-local filter. One shuffle of
      (key, partial rows) + one broadcast, no hot partition at any
      occurrence skew. Requires the boilerplate set to fit a broadcast
      (lines repeated >= min_dup times — if THAT overflows, raise
      min_dup or fall back to ``"window"`` + AQE skew handling).

    Both strategies produce identical output (differentially tested,
    including an every-doc-shares-a-line adversarial fixture).
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    if min_dup < 2:
        raise ValueError(f"min_dup must be >= 2, got {min_dup}")
    if strategy not in ("window", "broadcast"):
        raise ValueError(
            f"strategy must be 'window' or 'broadcast', got {strategy!r}"
        )
    from pyspark.sql import Window

    lines = docs.select(
        F.col(id_col).alias("_dl_id"),
        F.posexplode(doc_lines(text_col)).alias("_dl_pos", "_dl_line"),
    ).withColumn("_dl_key", F.trim(F.col("_dl_line")))
    # duplicate identity is the TRIMMED line (a banner with a trailing
    # space on some pages is the same boilerplate); the rebuild keeps
    # each surviving occurrence's raw bytes
    if strategy == "window":
        w = Window.partitionBy("_dl_key")
        w_rank = w.orderBy("_dl_id", "_dl_pos")
        ranked = lines.select(
            "_dl_id",
            "_dl_pos",
            "_dl_line",
            F.count(F.lit(1)).over(w).alias("_dl_n"),
            F.row_number().over(w_rank).alias("_dl_rn"),
        )
        survivors = ranked.filter(
            (F.col("_dl_n") < min_dup)
            | (F.lit(keep == "first") & (F.col("_dl_rn") == 1))
        )
    else:
        # count and min-occurrence are both algebraic, so the hash
        # aggregate's partial combine bounds every reducer's input at
        # (#map tasks) rows per key regardless of occurrence skew
        boiler = (
            lines.groupBy("_dl_key")
            .agg(
                F.count(F.lit(1)).alias("_dl_n"),
                F.min(F.struct("_dl_id", "_dl_pos")).alias("_dl_first"),
            )
            .filter(F.col("_dl_n") >= min_dup)
            .select("_dl_key", "_dl_first")
        )
        tagged = lines.join(F.broadcast(boiler), "_dl_key", "left")
        survivors = tagged.filter(
            F.col("_dl_first").isNull()
            | (
                F.lit(keep == "first")
                & (
                    F.struct("_dl_id", "_dl_pos")
                    == F.col("_dl_first")
                )
            )
        )
    rebuilt = (
        survivors.groupBy("_dl_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_dl_pos", "_dl_line"))
                    ),
                    lambda s: s["_dl_line"],
                ),
                "\n",
            ).alias("_dl_text")
        )
    )
    out = docs.join(
        rebuilt, docs[id_col] == rebuilt["_dl_id"], "inner"
    )
    return out.select(
        *[
            F.col("_dl_text").alias(c) if c == text_col else docs[c]
            for c in docs.columns
        ]
    )
