#!/usr/bin/env python
"""Measured evidence for the unigram-LM tokenizer
(operators/unigram.py):

1. training wall-clock at a realistic vocabulary scale — a synthetic
   syllable language (zipf word frequencies, compositional words) so
   the learned pieces are CHECKABLE: the model should rediscover the
   syllable inventory,
2. distributed apply throughput on local[32] (broadcast model +
   per-executor word cache),
3. compression: mean pieces/word vs the character baseline.

Usage: python scripts/stress_unigram.py [factor]  (default 4)
"""

from __future__ import annotations

import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.operators.unigram import (  # noqa: E402
    apply_unigram,
    train_unigram,
)
from data_governance_spark.session import get_spark  # noqa: E402

_SYLLABLES = [
    c + v for c in "bdfgklmnprstvz" for v in ("a", "e", "i", "o", "u", "ai", "on")
]  # 98 syllables


def _vocabulary(n_words: int, rng: random.Random) -> list[str]:
    words = set()
    while len(words) < n_words:
        words.add(
            "".join(rng.choices(_SYLLABLES, k=rng.randint(2, 4)))
        )
    return sorted(words)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = random.Random(7)
    vocab = _vocabulary(4000, rng)
    # zipf-ish frequencies over the word vocabulary
    weights = [1.0 / (i + 1) ** 1.1 for i in range(len(vocab))]
    n_docs = 25_000 * factor
    docs_py = [
        (i, " ".join(rng.choices(vocab, weights=weights, k=40)))
        for i in range(n_docs)
    ]
    total_mb = sum(len(t) for _, t in docs_py) / 1e6

    spark = get_spark("stress_unigram", shuffle_partitions=32)
    docs = spark.createDataFrame(
        docs_py, "doc_id long, text string"
    ).repartition(32).persist()
    docs.count()

    t0 = time.time()
    model = train_unigram(
        docs, vocab_size=1500, seed_size=12_000, max_piece_len=6
    )
    train_s = time.time() - t0
    multi = [p for p in model.logp if len(p) > 1]
    syl = set(_SYLLABLES)
    syl_hits = sum(1 for p in multi if p in syl or all(
        p[i:i + 2] in syl or p[i:i + 3] in syl for i in (0,)
    ))
    print(
        f"train: {n_docs} docs / {len(vocab)} distinct words -> "
        f"{len(model.logp)} pieces in {train_s:.1f}s "
        f"({len(multi)} multi-char; {syl_hits} start on a true syllable)"
    )

    t0 = time.time()
    out = apply_unigram(docs, model)
    stats = out.select(
        F.sum(F.size("unigram_tokens")).alias("pieces"),
        F.sum(F.length(F.regexp_replace("text", r"\s+", ""))).alias("chars"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    apply_s = time.time() - t0
    print(
        f"apply: {stats['n']} docs ({total_mb:.0f} MB) in {apply_s:.1f}s "
        f"= {stats['n'] / apply_s / 1e3:.1f}k docs/s, "
        f"{total_mb / apply_s:.1f} MB/s on local[32]"
    )
    print(
        f"compression: {stats['pieces'] / (stats['n'] * 40):.2f} pieces/word "
        f"vs {stats['chars'] / (stats['n'] * 40):.2f} chars/word baseline"
    )


if __name__ == "__main__":
    main()
