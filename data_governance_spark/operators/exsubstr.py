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


def duplicated_window_starts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 50,
    min_count: int = 2,
    keep: str = "first",
    strategy: str = "shuffle",
) -> DataFrame:
    """The marking half of :func:`dedup_substrings`: one row
    (``id_col``, ``pos``) per duplicated ``width``-token window
    occurrence slated for removal. Exposed separately so audits can
    inspect what WOULD be cut (and tests can assert on it) without
    paying the rebuild."""
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
    # tokens as a REAL column behind a Sample fence — size/sequence/
    # slice all read it, and without the fence projection collapse
    # re-inlines the tokenizer per reference (the operators/quality.py
    # _fence lesson)
    base = docs.select(
        F.col(id_col).alias("_es_id"), tokens(text_col).alias("_es_toks")
    ).sample(1.0, seed=0)
    wins = (
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
) -> DataFrame:
    """Remove duplicated ``width``-token spans from the corpus (see
    module docstring). Returns ``docs`` with ``text_col`` rewritten on
    the touched documents; schema and row count are unchanged (a fully
    duplicated document survives with empty text — callers filter).
    ``id_col`` values must be unique."""
    from data_governance_spark.cache import tracked_persist

    removals = duplicated_window_starts(
        docs,
        id_col=id_col,
        text_col=text_col,
        width=width,
        min_count=min_count,
        keep=keep,
        strategy=strategy,
    )
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
