"""Trainable byte-pair-encoding (BPE) tokenizer, Spark-first.

Training (the Sennrich 2016 algorithm, the same shape HF tokenizers
uses at scale): the ONLY corpus-scale work is one word-frequency
aggregation — pre-tokenize JVM-side with the shared ``TOKEN_REGEX``,
explode, groupBy word. Merges are then learned driver-side over the
DISTINCT-word frequency table, which is vocabulary-sized (Heaps' law:
~1e5-1e7 rows even for 100 TB corpora), not corpus-sized. A
``max_words`` cap bounds driver memory regardless; the frequency-ranked
tail it drops contributes negligible pair mass. Tie-breaks are fully
deterministic (max count, then lexicographically smallest pair), so the
same corpus always yields the same merge table on any cluster layout.

Application is embarrassingly parallel: a greedy lowest-rank merge
loop per word inside an Arrow-batched pandas UDF with a per-executor
word cache — words repeat heavily (Zipf), so the cache hit rate does
the work. The Python pre-tokenizer compiles the same regex with
``re.ASCII`` so ``\\w``/``\\s`` match Java's ASCII semantics and train
/apply tokenize identically.

The driver training loop maintains pair counts INCREMENTALLY (the
standard production update): each merge touches only the words that
contain the merged pair — their old adjacencies are subtracted, the
rebuilt words' adjacencies added, and the arg-max comes from a
lazy-invalidation max-heap (stale entries are discarded when their
stored count no longer matches the live counter). Per-merge cost is
O(total length of affected words + log-heap), vs the naive
recount-everything O(distinct_words x avg_len) — the difference
between a 32k-merge production vocabulary finishing in seconds and
in hours. Identical merges to the naive loop by construction (exact
integer counts, same (max count, lexicographically least pair)
tie-break), pinned by the reference differential in tests/test_bpe.py
and the 32k-merge run in scripts/stress_bpe.py.
"""

from __future__ import annotations

import heapq
import re
from collections import Counter
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_governance_spark.functions.text import TOKEN_REGEX, regex_tokens

END_OF_WORD = "</w>"

_PY_TOKEN_RE = re.compile(TOKEN_REGEX, re.ASCII)


@dataclass(frozen=True)
class BpeModel:
    """A learned merge table. ``merges[i]`` has rank i (lower merges
    first); ``vocab`` is the resulting symbol inventory."""

    merges: tuple[tuple[str, str], ...]
    vocab: tuple[str, ...] = field(default=())

    def ranks(self) -> dict[tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END_OF_WORD,)


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    min_freq: int = 2,
    max_words: int = 1_000_000,
    lowercase: bool = True,
) -> BpeModel:
    """Learn a BPE merge table from a corpus. One Spark aggregation
    (word frequencies), then driver-side merge learning."""
    if num_merges < 0 or min_freq < 1 or max_words < 1:
        raise ValueError("invalid BPE training parameters")
    c: Column = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    wf_rows = (
        docs.select(F.explode(regex_tokens(c)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        # deterministic cap: frequency-ranked, word as tie-break
        .orderBy(F.desc("f"), "w")
        .limit(max_words)
        .collect()
    )
    words: dict[tuple[str, ...], int] = {}
    for r in wf_rows:
        words[_word_symbols(r["w"])] = r["f"]

    merges = _learn_merges(words, num_merges, min_freq)
    vocab = sorted({s for syms in words for s in syms})
    return BpeModel(merges=tuple(merges), vocab=tuple(vocab))


def _apply_merge(
    syms: tuple[str, ...], best: tuple[str, str], merged: str
) -> tuple[str, ...]:
    """Left-to-right replacement of adjacent (best[0], best[1])."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _learn_merges(
    words: dict[tuple[str, ...], int], num_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    """Incremental Sennrich merge learning over a symbolized word-
    frequency table (mutated in place to the post-merge state).

    Invariants maintained per merge:

    - ``pairs[p]`` = exact occurrence-weighted count of adjacency p
      over all live words (a word with 'aaa' contributes 2 to (a,a)).
    - ``where[p]`` = the set of live word tuples containing p. Word
      tuples are unique per underlying word (they always concatenate
      back to the original word + END_OF_WORD), so tuple identity IS
      word identity and a replaced tuple never reappears.
    - ``heap`` holds (-count, pair) snapshots; an entry is live iff
      its count equals the current counter value (lazy invalidation —
      decremented pairs leave stale higher entries behind, which the
      pop loop discards).
    """
    pairs: Counter = Counter()
    where: dict[tuple[str, str], set[tuple[str, ...]]] = {}
    for syms, f in words.items():
        occ = Counter(zip(syms, syms[1:]))
        for p, k in occ.items():
            pairs[p] += k * f
            where.setdefault(p, set()).add(syms)
    heap: list[tuple[int, tuple[str, str]]] = [
        (-c, p) for p, c in pairs.items()
    ]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges:
        best = None
        while heap:
            negc, p = heap[0]
            if pairs.get(p, 0) != -negc:
                heapq.heappop(heap)  # stale snapshot
                continue
            best = p
            break
        # deterministic best: max count, then lexicographically least
        # (heap orders by (-count, pair), identical tie-break)
        if best is None or pairs[best] < min_freq:
            break
        merges.append(best)
        merged = best[0] + best[1]
        # only words containing the merged pair change — the O(affected)
        # incremental update, not a full recount
        for syms in sorted(where.get(best, ())):
            f = words.pop(syms)
            occ = Counter(zip(syms, syms[1:]))
            for p, k in occ.items():
                c = pairs[p] - k * f
                if c <= 0:
                    pairs.pop(p, None)
                else:
                    pairs[p] = c
                    heapq.heappush(heap, (-c, p))
                ws = where.get(p)
                if ws is not None:
                    ws.discard(syms)
                    if not ws:
                        del where[p]
            new = _apply_merge(syms, best, merged)
            words[new] = f
            occ = Counter(zip(new, new[1:]))
            for p, k in occ.items():
                c = pairs[p] + k * f
                pairs[p] = c
                heapq.heappush(heap, (-c, p))
                where.setdefault(p, set()).add(new)
        # every occurrence of `best` lived in a word indexed by
        # where[best], so its count must have drained to zero. A real
        # exception, not an assert: this invariant rests on word-tuple
        # uniqueness (each tuple concatenates back to a distinct word),
        # and a caller feeding non-unique symbolized words would
        # otherwise corrupt merge counts SILENTLY under ``python -O``.
        if pairs.get(best, 0) != 0:
            raise ValueError(
                f"pair-count invariant violated for merge {best!r}: "
                f"{pairs[best]} occurrences unaccounted — the word "
                "table contains non-unique symbolized words"
            )
        pairs.pop(best, None)
        where.pop(best, None)
    return merges


def bpe_encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Greedy BPE: repeatedly apply the lowest-rank applicable merge
    (the canonical GPT-2/SentencePiece-BPE application order)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    docs: DataFrame,
    model: BpeModel,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize ``text_col`` into BPE subword tokens (array<string>).
    mapInPandas keeps the merge loop Arrow-batched; a per-executor
    word cache exploits Zipf repetition."""
    ranks = model.ranks()
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    schema = f"{out_fields}, {out_col} array<string>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def encode(text) -> list[str]:
            if text is None:
                return []
            if lowercase:
                text = text.lower()
            out: list[str] = []
            for w in _PY_TOKEN_RE.findall(text):
                enc = cache.get(w)
                if enc is None:
                    if len(cache) > 200_000:  # bound executor memory
                        cache.clear()
                    enc = bpe_encode_word(w, ranks)
                    cache[w] = enc
                out.extend(enc)
            return out

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [encode(t) for t in pdf[text_col]]
            yield pdf

    return docs.mapInPandas(run, schema)


def bpe_token_counts(
    docs: DataFrame,
    model: BpeModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Per-document BPE token counts — the packing/budgeting input
    (replaces the whitespace/regex approximation with real subword
    counts once a model is trained)."""
    enc = apply_bpe(docs, model, text_col, "_bpe", lowercase=lowercase)
    return enc.select(
        id_col, F.size("_bpe").cast("long").alias("bpe_token_count")
    )
