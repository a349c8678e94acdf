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

``dedup_lines_incremental`` + the ``LineState`` save/load/append/
compact family — the batch-vs-state tier (r11): the daily-increment
loop must NOT re-scan the shipped corpus to dedup a day's crawl
against it. State is one table, ``(key, n, batch_id)`` — the trimmed
line key, how many times it has been SEEN corpus-wide (counts include
occurrences that were themselves deduped: one-shot semantics count
before dropping, so equality with the one-shot run needs seen-counts,
not kept-counts), and which append wrote the row. Persisted BUCKETED
by ``key`` through the same machinery as the document-tier state
(``operators/incremental.py``): the increment's count join reads the
corpus-sized side with NO Exchange (rows per key accumulate one per
append — LSM-style — and the pre-join ``groupBy(key).sum(n)`` is
itself Exchange-free on the bucketed distribution), appends write
only the increment's per-key counts (cost ∝ increment), and
compaction rewrites the accumulated per-bucket files back to one.

Corpus-immutable semantics (the document tier's rule): for BATCH rows
the result equals one-shot ``dedup_lines_global`` over the union
(append-only ids; differentially tested, incl. ``min_dup > 2`` where
the stored counts matter) — shipped corpus rows are never rewritten,
so a line that crosses ``min_dup`` only after shipping keeps its
already-shipped occurrences (with ``keep="first"`` that IS the
one-shot answer; with ``keep="none"`` it is the documented
divergence).

Reference twin: none — training-data extension per SURVEY.md §6.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
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

    lines = _line_rows(docs, id_col, text_col)
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
    return _rebuild_docs(docs, survivors, id_col, text_col)


def _rebuild_docs(
    docs: DataFrame, survivors: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Rebuild each document's text from its surviving
    (_dl_id, _dl_pos, _dl_line) rows in original order; docs with no
    surviving line are dropped (inner join)."""
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


def _line_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(_dl_id, _dl_pos, _dl_line, _dl_key) — one row per non-empty
    line; the TRIMMED line is the duplicate identity (module doc)."""
    return docs.select(
        F.col(id_col).alias("_dl_id"),
        F.posexplode(doc_lines(text_col)).alias("_dl_pos", "_dl_line"),
    ).withColumn("_dl_key", F.trim(F.col("_dl_line")))


# --------------------------------------------------------------------------
# state-backed incremental line dedup (r11) — see module doc
# --------------------------------------------------------------------------

_LINES_PART = "lines"
_LINES_KEYS = ["key"]


@dataclass
class LineState:
    """Seen-occurrence counts of an existing corpus's lines. ``lines``
    is ``(key, n, batch_id)`` and may carry MULTIPLE rows per key after
    appends (LSM-style) — every reader aggregates ``sum(n)`` per key,
    which stays Exchange-free on the bucketed storage distribution."""

    lines: DataFrame


@dataclass
class LineIncrementalResult:
    """``kept``: surviving batch docs, text rebuilt (full columns).
    ``delta``: this batch's per-key SEEN counts ``(key, n)`` — what
    :func:`append_line_state` writes; counts include occurrences the
    batch itself dropped (one-shot parity needs seen, not kept)."""

    kept: DataFrame
    delta: DataFrame


def build_line_state(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> LineState:
    """State from the corpus the one-shot dedup ran OVER (pre-drop
    text): seen-occurrence counts per trimmed line. Building from the
    already-deduped output instead under-counts boilerplate by the
    occurrences the one-shot pass removed — future increments would
    then re-admit a line until it re-crosses ``min_dup``."""
    return LineState(
        lines=_line_rows(docs, id_col, text_col)
        .groupBy(F.col("_dl_key").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("batch_id", F.lit("base"))
    )


def dedup_lines_incremental(
    new_docs: DataFrame,
    state: LineState,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_dup: int = 2,
    keep: str = "first",
) -> LineIncrementalResult:
    """Dedup ``new_docs``'s lines within the batch AND against the
    corpus counts in ``state`` — for batch rows, equal to one-shot
    :func:`dedup_lines_global` over corpus ∪ batch under append-only
    ids (differentially tested). A batch line survives when its total
    seen count (state + batch) stays below ``min_dup``; otherwise
    ``keep="first"`` retains only the globally-first occurrence —
    which is in the batch exactly when the state has never seen the
    key — and ``keep="none"`` retains none. Docs with no surviving
    line are dropped.

    Scale shape: one shuffle of the BATCH's per-key counts to the
    state's bucket partitioning; the corpus-sized state side scans its
    buckets with no Exchange (plan-asserted), and the
    ``groupBy(key).sum(n)`` that folds append rows rides the same
    distribution. The boilerplate side of the occurrence join is
    repeated-lines-only (small by construction), so AQE broadcasts it
    back against the batch's line relation."""
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    if min_dup < 2:
        raise ValueError(f"min_dup must be >= 2, got {min_dup}")
    lines = _line_rows(new_docs, id_col, text_col)
    batch_agg = lines.groupBy(F.col("_dl_key").alias("key")).agg(
        F.count(F.lit(1)).alias("_li_nb"),
        F.min(F.struct("_dl_id", "_dl_pos")).alias("_li_first"),
    )
    state_counts = state.lines.groupBy("key").agg(
        F.sum("n").alias("_li_ns")
    )
    joined = batch_agg.join(state_counts, "key", "left")
    boiler = joined.filter(
        F.col("_li_nb") + F.coalesce(F.col("_li_ns"), F.lit(0))
        >= min_dup
    ).select(
        F.col("key").alias("_dl_key"),
        "_li_first",
        F.col("_li_ns").isNotNull().alias("_li_in_state"),
    )
    tagged = lines.join(boiler, "_dl_key", "left")
    survivors = tagged.filter(
        F.col("_li_first").isNull()  # never crossed min_dup: keep
        | (
            F.lit(keep == "first")
            & ~F.col("_li_in_state")  # global first is in the batch
            & (F.struct("_dl_id", "_dl_pos") == F.col("_li_first"))
        )
    )
    return LineIncrementalResult(
        kept=_rebuild_docs(new_docs, survivors, id_col, text_col),
        delta=batch_agg.select("key", F.col("_li_nb").alias("n")),
    )


_LINES_KIND = "lines"
_LINES_DESC = "a line-dedup state (document-tier states live behind load_dedup_state)"


def save_line_state(state: LineState, path: str, buckets: int) -> None:
    """Persist the counts table BUCKETED by ``key`` under ``path``
    (``lines/`` + ``params/``) through the generic count-state store
    (``operators/countstate.py`` — two-phase staging swap; the module
    doc there is the storage contract). Bucketed-only by design: the
    whole point of the state is the Exchange-free corpus side; a plain
    layout would just be :func:`dedup_lines_global` with extra
    steps."""
    from data_governance_spark.operators.countstate import save_count_state

    save_count_state(
        state.lines, path, buckets, _LINES_KIND, _LINES_KEYS, _LINES_PART
    )


def load_line_state(spark: SparkSession, path: str) -> LineState:
    """Load a saved line state as a bucketed-table scan (increment
    joins read it with no Exchange)."""
    from data_governance_spark.operators.countstate import load_count_state

    rows, _ = load_count_state(
        spark, path, _LINES_KIND, _LINES_DESC, _LINES_KEYS, _LINES_PART
    )
    return LineState(lines=rows)


def append_line_state(
    result: LineIncrementalResult,
    path: str,
    batch_id: str,
    heal: bool = False,
) -> LineState:
    """Append an increment's per-key seen counts to the bucketed state
    at ``path`` — cost ∝ increment, not corpus (the generic LSM write
    path: rows land as ``(key, n, batch_id)`` without merging; readers
    fold ``sum(n)`` Exchange-free; each append adds at most one file
    per non-empty bucket — watch :func:`line_state_file_report`, run
    :func:`compact_line_state` every K appends). ``batch_id`` must be
    unique per increment: it is the idempotency key — re-running an
    append whose outcome is unknown (crash) with ``heal=True``
    anti-joins the delta on ``(key, batch_id)`` first, so
    already-landed rows are not double-counted. Returns the freshly
    loaded post-append state — chain the next increment off it."""
    from data_governance_spark.operators.countstate import (
        append_count_state,
    )

    rows, _ = append_count_state(
        result.delta, path, _LINES_KIND, _LINES_DESC, batch_id,
        heal=heal, key_cols=_LINES_KEYS, part=_LINES_PART,
    )
    return LineState(lines=rows)


def line_state_file_report(spark: SparkSession, path: str) -> dict:
    """File-count health of the append loop (the document tier's
    ``state_file_report`` for the single lines table)."""
    from data_governance_spark.operators.countstate import (
        count_state_report,
    )

    return count_state_report(
        spark, path, _LINES_KIND, _LINES_DESC, _LINES_KEYS, _LINES_PART
    )


def compact_line_state(
    spark: SparkSession, path: str, max_files_per_bucket: int = 1
) -> dict:
    """Rewrite the lines table back to one file per bucket when the
    append loop has grown it past ``buckets * max_files_per_bucket``
    files. Sum-preserving row merge per ``(key, batch_id)`` — every
    reader's per-key ``sum(n)`` is unchanged and heal idempotency
    survives the compaction (see ``countstate.compact_count_state``)."""
    from data_governance_spark.operators.countstate import (
        compact_count_state,
    )

    return compact_count_state(
        spark, path, _LINES_KIND, _LINES_DESC, max_files_per_bucket,
        key_cols=_LINES_KEYS, part=_LINES_PART,
    )
