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

The driver training loop recounts pairs each merge — O(merges x
distinct_words). For production vocab sizes (32k+) the standard
incremental pair-count update applies; at gate/test scale the naive
loop is clearer and fast enough.
"""

from __future__ import annotations

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

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # deterministic best: max count, then lexicographically least
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_freq:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for syms, f in words.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + f
        words = new_words

    vocab = sorted({s for syms in words for s in syms})
    return BpeModel(merges=tuple(merges), vocab=tuple(vocab))


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
