"""Exact substring deduplication — the ExactSubstr tier of Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better"
(arXiv:2107.06499).

Doc-level dedup (exact fingerprint, MinHash) drops whole documents;
line dedup drops whole boilerplate lines. This tier removes REPEATED
SPANS from otherwise-unique documents: license headers, quoted
boilerplate, syndicated paragraphs — text that recurs verbatim across
(or within) documents at the substring level. Lee et al. find these
with a corpus-wide suffix array (single-machine, RAM-bounded); the
Spark-shaped reformulation is the standard fixed-width windowed
variant:

1. tokenize each document (whitespace tokens, the corpus-wide
   ``functions.text.tokens`` definition);
2. emit every ``width``-token window as (doc, start, hash) — any
   duplicated span of length L >= width is exactly covered by its
   L - width + 1 windows, every one of which is itself duplicated, so
   the union of duplicated windows removes the whole span (spans
   shorter than ``width`` are below the dedup threshold by
   definition — Lee et al. use 50 tokens);
3. group windows by content hash; a window occurring >= ``min_count``
   times is duplicated. ``keep="first"`` retains the single globally
   first occurrence (min (id, start) — deterministic), every other
   occurrence is marked for removal; ``keep="none"`` removes all;
4. per document, merge the marked windows' token coverage and rebuild
   the text from the surviving token runs.

Scale posture (the reason this shape, not a distributed suffix array):

- step 2 is generate-only (no shuffle); the window relation is
  O(corpus tokens) rows of (id, pos, 2x64-bit hash) — comparable in
  bytes to the corpus itself, the honest cost of global substring
  visibility;
- step 3 is ONE hash aggregate whose measures (count, min) are both
  algebraic, so partial (map-side) combine bounds every reducer's
  input at (#map tasks) rows per key — a window appearing on a
  billion pages never routes its occurrence list to one reducer;
- marking is an equi-join of the window relation against the
  duplicated-window set only (windows with count >= min_count).
  ``strategy="broadcast"`` broadcasts that set when it is known-small
  (a few boilerplate spans across a huge corpus);
  ``strategy="shuffle"`` (default) is the general tier — AQE handles
  residual skew;
- the rebuild is map-only: one bounded per-doc groupBy of removal
  starts, then an Arrow-batched pandas UDF over ONLY the touched
  documents (untouched documents bypass the Python path entirely and
  keep their bytes verbatim).

Window identity is a 128-bit content hash (two independent xxhash64
seeds over the sliced token ARRAY — element-boundary-preserving, so
no joined-string delimiter can alias two different windows); at 10^12
windows the collision odds are ~1e-14 — the standard sketch trade,
documented here because Lee et al.'s suffix array is exact.

Rebuild semantics (char-exact, not token-normalized): surviving
documents keep their original bytes inside each surviving token run;
removed spans are cut at token-span boundaries and the surviving runs
are joined with a single space. A document whose every token is
removed survives with empty text (callers filter). Documents shorter
than ``width`` tokens carry no windows and are always untouched.

Reference twin: none — training-data extension per SURVEY.md §6
(Lee et al. 2022 is the published method).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_governance_spark.functions.text import tokens

# re.ASCII: Java/Spark `\s` (the marking tokenizer's split) and
# DuckDB/RE2's `\s` are ASCII-only, while Python's default `\S` is
# Unicode-aware — a U+00A0 in HTML-extracted text would make the
# cutter see MORE tokens than the marker indexed, shifting every
# removal window (the same Java-parity reason operators/bpe.py
# compiles its pre-tokenizer with re.ASCII)
_WS = re.compile(r"\S+", re.ASCII)


def _cutter(width: int):
    """Arrow-batched rebuild: cut the token-coverage of the given
    removal starts out of the original text, preserving original bytes
    inside surviving runs (runs joined by a single space)."""

    @F.pandas_udf("string")
    def cut(text: pd.Series, starts: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for t, ss in zip(text, starts):
            if t is None:
                out.append(None)
                continue
            spans = [m.span() for m in _WS.finditer(t)]
            n = len(spans)
            diff = np.zeros(n + 1, dtype=np.int64)
            for s in ss:
                s = int(s)
                if 0 <= s < n:
                    diff[s] += 1
                    diff[min(s + width, n)] -= 1
            covered = np.cumsum(diff[:n]) > 0
            runs = []
            i = 0
            while i < n:
                if covered[i]:
                    i += 1
                    continue
                j = i
                while j + 1 < n and not covered[j + 1]:
                    j += 1
                runs.append(t[spans[i][0] : spans[j][1]])
                i = j + 1
            out.append(" ".join(runs))
        return pd.Series(out, dtype="object")

    return cut


def _window_relation(
    docs: DataFrame, id_col: str, text_col: str, width: int
) -> DataFrame:
    """(_es_id, _es_pos, _es_h1, _es_h2) — one row per width-token
    window occurrence. Docs shorter than ``width`` tokens carry none."""
    # tokens as a REAL column behind a Sample fence — size/sequence/
    # slice all read it, and without the fence projection collapse
    # re-inlines the tokenizer per reference (the operators/quality.py
    # _fence lesson)
    base = docs.select(
        F.col(id_col).alias("_es_id"), tokens(text_col).alias("_es_toks")
    ).sample(1.0, seed=0)
    return (
        base.filter(F.size("_es_toks") >= width)
        .select(
            "_es_id",
            "_es_toks",
            F.explode(
                F.sequence(F.lit(0), F.size("_es_toks") - width)
            ).alias("_es_pos"),
        )
        .select(
            "_es_id",
            "_es_pos",
            # the sliced token ARRAY is the window identity — hashing
            # the array directly keeps element boundaries (a delimiter-
            # joined string would alias ['a<d>b','c'] with ['a','b<d>c']
            # for any delimiter, since tokens only exclude whitespace)
            F.slice("_es_toks", F.col("_es_pos") + 1, width).alias("_es_w"),
        )
        # second fence: both hashes read _es_w; unfenced, the collapsed
        # projection would rebuild the window slice once per hash
        .sample(1.0, seed=0)
        .select(
            "_es_id",
            "_es_pos",
            F.xxhash64("_es_w").alias("_es_h1"),
            F.xxhash64(F.lit("exs2"), F.col("_es_w")).alias("_es_h2"),
        )
    )


def duplicated_window_starts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 50,
    min_count: int = 2,
    keep: str = "first",
    strategy: str = "shuffle",
    windows: DataFrame | None = None,
) -> DataFrame:
    """The marking half of :func:`dedup_substrings`: one row
    (``id_col``, ``pos``) per duplicated ``width``-token window
    occurrence slated for removal. Exposed separately so audits can
    inspect what WOULD be cut (and tests can assert on it) without
    paying the rebuild. ``windows`` is the precomputed-window reuse
    hook (the d05 shared-tokenize pattern): a
    (_es_id, _es_pos, _es_h1, _es_h2) relation from
    :func:`_window_relation` at the SAME width — callers running
    several window consumers over one corpus (e.g. one-shot marking
    plus state building) compute and persist it once."""
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    if strategy not in ("shuffle", "broadcast"):
        raise ValueError(
            f"strategy must be 'shuffle' or 'broadcast', got {strategy!r}"
        )
    wins = (
        windows
        if windows is not None
        else _window_relation(docs, id_col, text_col, width)
    )
    dup = (
        wins.groupBy("_es_h1", "_es_h2")
        .agg(
            F.count(F.lit(1)).alias("_es_n"),
            F.min(F.struct("_es_id", "_es_pos")).alias("_es_keep"),
        )
        .filter(F.col("_es_n") >= min_count)
        .select("_es_h1", "_es_h2", "_es_keep")
    )
    marked = wins.join(
        F.broadcast(dup) if strategy == "broadcast" else dup,
        ["_es_h1", "_es_h2"],
    )
    if keep == "first":
        marked = marked.filter(
            F.struct("_es_id", "_es_pos") != F.col("_es_keep")
        )
    return marked.select(
        F.col("_es_id").alias(id_col), F.col("_es_pos").alias("pos")
    )


def dedup_substrings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 50,
    min_count: int = 2,
    keep: str = "first",
    strategy: str = "shuffle",
    windows: DataFrame | None = None,
) -> DataFrame:
    """Remove duplicated ``width``-token spans from the corpus (see
    module docstring). Returns ``docs`` with ``text_col`` rewritten on
    the touched documents; schema and row count are unchanged (a fully
    duplicated document survives with empty text — callers filter).
    ``id_col`` values must be unique. ``windows`` — see
    :func:`duplicated_window_starts`."""
    removals = duplicated_window_starts(
        docs,
        id_col=id_col,
        text_col=text_col,
        width=width,
        min_count=min_count,
        keep=keep,
        strategy=strategy,
        windows=windows,
    )
    return _apply_removals(docs, removals, id_col, text_col, width)


def _apply_removals(
    docs: DataFrame,
    removals: DataFrame,
    id_col: str,
    text_col: str,
    width: int,
) -> DataFrame:
    """Rebuild ``docs`` with the (``id_col``, pos) removal windows cut
    out (see module doc: char-exact runs, untouched docs bypass
    Python)."""
    from data_governance_spark.cache import tracked_persist

    # starts feeds two join branches (anti for untouched, inner for
    # touched); it is tiny (one row per touched doc) but its LINEAGE is
    # the whole corpus-wide marking pipeline — persist so that runs
    # once instead of relying on exchange reuse
    starts = tracked_persist(
        removals.groupBy(F.col(id_col).alias("_es_rid")).agg(
            F.sort_array(F.collect_set("pos")).alias("_es_starts")
        )
    )
    on = docs[id_col] == starts["_es_rid"]
    untouched = docs.join(starts, on, "left_anti")
    cut = _cutter(width)
    touched = docs.join(starts, on, "inner").select(
        *[
            cut(F.col(text_col), F.col("_es_starts")).alias(c)
            if c == text_col
            else docs[c]
            for c in docs.columns
        ]
    )
    return untouched.unionByName(touched)


# --------------------------------------------------------------------------
# state-backed incremental tier (r11) — the batch-vs-state loop for the
# substring tier, completing the incremental story across all three
# dedup granularities (document: operators/incremental.py; line:
# operators/lines.py; substring: here). State is the generic bucketed
# seen-count table of operators/countstate.py keyed by the 128-bit
# window hash — counts include occurrences the one-shot pass itself
# removed (it counts windows BEFORE cutting), which is what makes batch
# rows equal the one-shot run over corpus ∪ batch under append-only ids
# (differentially tested, incl. min_count > 2). The window WIDTH is
# part of the state (hashes at one width are meaningless at another),
# so save persists it and load reads it back — same rule as the
# document tier's sketch params.
# --------------------------------------------------------------------------

_SUBSTR_KIND = "substr"
_SUBSTR_DESC = (
    "an exact-substring window state (line/document states are not "
    "interchangeable)"
)
_SUBSTR_PART = "windows"
_SUBSTR_KEYS = ["h1", "h2"]


@dataclass
class SubstrState:
    """Seen-occurrence counts of width-token windows. ``windows`` is
    ``(h1, h2, n, batch_id)`` and may carry multiple rows per key after
    appends; readers fold ``sum(n)`` (Exchange-free on the bucketed
    storage)."""

    windows: DataFrame
    width: int


@dataclass
class SubstrIncrementalResult:
    """``kept``: the batch docs with duplicated spans cut (full
    columns, row count unchanged — a fully-duplicated doc survives
    with empty text, same contract as ``dedup_substrings``).
    ``delta``: the batch's per-window seen counts ``(h1, h2, n)`` —
    what :func:`append_substr_state` writes."""

    kept: DataFrame
    delta: DataFrame


def build_substr_state(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 50,
    windows: DataFrame | None = None,
) -> SubstrState:
    """State from the corpus the one-shot pass ran OVER (pre-cut
    text) — seen counts per window hash. Building from the already-cut
    output would under-count exactly the spans the pass removed.
    ``windows`` — see :func:`duplicated_window_starts`."""
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    rows = (
        (windows if windows is not None
         else _window_relation(docs, id_col, text_col, width))
        .groupBy(
            F.col("_es_h1").alias("h1"), F.col("_es_h2").alias("h2")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return SubstrState(windows=rows, width=width)


def dedup_substrings_incremental(
    new_docs: DataFrame,
    state: SubstrState,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    keep: str = "first",
    windows: DataFrame | None = None,
) -> SubstrIncrementalResult:
    """Cut duplicated spans from ``new_docs`` counting occurrences
    within the batch AND against the corpus state — for batch rows,
    equal to one-shot :func:`dedup_substrings` over corpus ∪ batch
    under append-only ids. A batch window is duplicated when its total
    seen count (state + batch) reaches ``min_count``; ``keep="first"``
    spares the globally-first occurrence — in the batch exactly when
    the state has never seen the hash — and ``keep="none"`` spares
    none. The width comes from the STATE (stored with it; a mismatch
    would compare hashes of different spans).

    Scale shape: the batch's window aggregation shuffles batch-sized;
    the corpus-sized state side scans its buckets with no Exchange
    (plan-asserted) and folds append rows on the same distribution;
    the duplicated-key set joins back against the batch's window
    relation (repeated windows only — AQE broadcasts it when small);
    the rebuild is the shared Arrow-batched cutter over touched docs
    only. ``windows`` — see :func:`duplicated_window_starts` (must be
    built at the STATE's width)."""
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    wins = (
        windows
        if windows is not None
        else _window_relation(new_docs, id_col, text_col, state.width)
    )
    batch_agg = wins.groupBy(
        F.col("_es_h1").alias("h1"), F.col("_es_h2").alias("h2")
    ).agg(
        F.count(F.lit(1)).alias("_es_nb"),
        F.min(F.struct("_es_id", "_es_pos")).alias("_es_first"),
    )
    state_counts = state.windows.groupBy("h1", "h2").agg(
        F.sum("n").alias("_es_ns")
    )
    joined = batch_agg.join(state_counts, ["h1", "h2"], "left")
    dup = joined.filter(
        F.col("_es_nb") + F.coalesce(F.col("_es_ns"), F.lit(0))
        >= min_count
    ).select(
        F.col("h1").alias("_es_h1"),
        F.col("h2").alias("_es_h2"),
        "_es_first",
        F.col("_es_ns").isNotNull().alias("_es_in_state"),
    )
    marked = wins.join(dup, ["_es_h1", "_es_h2"])
    if keep == "first":
        # spare the global first only when it is IN the batch (state
        # unseen) — a state hit means the first occurrence shipped
        marked = marked.filter(
            F.col("_es_in_state")
            | (F.struct("_es_id", "_es_pos") != F.col("_es_first"))
        )
    removals = marked.select(
        F.col("_es_id").alias(id_col), F.col("_es_pos").alias("pos")
    )
    return SubstrIncrementalResult(
        kept=_apply_removals(
            new_docs, removals, id_col, text_col, state.width
        ),
        delta=batch_agg.select("h1", "h2", F.col("_es_nb").alias("n")),
    )


def save_substr_state(state: SubstrState, path: str, buckets: int) -> None:
    """Persist the window counts BUCKETED by (h1, h2) plus the width
    (``operators/countstate.py`` is the storage contract)."""
    from data_governance_spark.operators.countstate import save_count_state

    save_count_state(
        state.windows,
        path,
        buckets,
        _SUBSTR_KIND,
        _SUBSTR_KEYS,
        _SUBSTR_PART,
        extra_params={"width": state.width},
    )


def load_substr_state(spark, path: str) -> SubstrState:
    """Load a saved window state; the width comes from the state."""
    from data_governance_spark.operators.countstate import load_count_state

    rows, params = load_count_state(
        spark, path, _SUBSTR_KIND, _SUBSTR_DESC, _SUBSTR_KEYS, _SUBSTR_PART
    )
    return SubstrState(windows=rows, width=int(params["width"]))


def append_substr_state(
    result: SubstrIncrementalResult,
    path: str,
    batch_id: str,
    heal: bool = False,
) -> SubstrState:
    """Append an increment's window counts (cost ∝ increment; unique
    ``batch_id`` is the heal idempotency key; run
    :func:`compact_substr_state` every K appends). Returns the freshly
    loaded post-append state."""
    from data_governance_spark.operators.countstate import (
        append_count_state,
    )

    rows, params = append_count_state(
        result.delta, path, _SUBSTR_KIND, _SUBSTR_DESC, batch_id,
        heal=heal, key_cols=_SUBSTR_KEYS, part=_SUBSTR_PART,
    )
    return SubstrState(windows=rows, width=int(params["width"]))


def substr_state_file_report(spark, path: str) -> dict:
    """Append-loop file health (``{part: {files, buckets, ...}}``)."""
    from data_governance_spark.operators.countstate import (
        count_state_report,
    )

    return count_state_report(
        spark, path, _SUBSTR_KIND, _SUBSTR_DESC, _SUBSTR_KEYS, _SUBSTR_PART
    )


def compact_substr_state(
    spark, path: str, max_files_per_bucket: int = 1
) -> dict:
    """Sum-preserving fold + one-file-per-bucket rewrite (see
    ``countstate.compact_count_state``)."""
    from data_governance_spark.operators.countstate import (
        compact_count_state,
    )

    return compact_count_state(
        spark, path, _SUBSTR_KIND, _SUBSTR_DESC, max_files_per_bucket,
        key_cols=_SUBSTR_KEYS, part=_SUBSTR_PART,
    )
