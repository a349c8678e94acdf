#!/usr/bin/env python
"""Production-vocabulary stress for BPE merge learning (DEPLOY.md
evidence, r8).

The r7 trainer recounted every pair over the full word table per merge
(O(merges x total_word_length)); the incremental learner
(bpe._learn_merges) touches only words containing the merged pair and
arg-maxes from a lazy-invalidation heap. This script shows the
difference is the feasibility line for a real 32k-merge vocabulary:

1. equality check: naive recount loop vs incremental on the corpus
   word table (first N merges identical),
2. naive vs incremental wall at a modest merge budget (the ratio),
3. a full 32k-merge incremental train over the corpus table augmented
   with a large deterministic synthetic vocabulary (the documents
   table alone saturates — every word collapses to one symbol — long
   before 32k).

Usage: python scripts/stress_bpe.py [merges_for_ratio]   (default 500)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import random
import sys
import time
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.functions.text import regex_tokens  # noqa: E402
from data_governance_spark.operators.bpe import (  # noqa: E402
    _learn_merges,
    _word_symbols,
)
from data_governance_spark.session import get_spark  # noqa: E402
from data_governance_spark.tables import table  # noqa: E402


def naive_learn(words, num_merges, min_freq):
    """The r7 recount-everything loop, kept as the reference."""
    words = dict(words)
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_freq:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words = {}
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
    return merges


def corpus_words(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    rows = (
        docs.select(F.explode(regex_tokens(F.lower(F.col("text")))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .collect()
    )
    return {_word_symbols(r["w"]): r["f"] for r in rows}


def synthetic_words(n=200_000, seed=8):
    """Deterministic long-tail vocabulary: enough distinct material to
    sustain 32k merges (Zipf-ish frequencies, 16-symbol alphabet)."""
    rng = random.Random(seed)
    out = {}
    while len(out) < n:
        w = "".join(
            rng.choice("abcdefghijklmnop")
            for _ in range(rng.randint(6, 18))
        )
        if w not in out:
            out[w] = max(1, int(1000 / (1 + len(out) % 997)))
    return {_word_symbols(w): f for w, f in out.items()}


def main():
    ratio_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress_bpe")
    words = corpus_words(spark, sf_dir)
    total_len = sum(len(s) for s in words)
    print(f"corpus word table: {len(words)} words, {total_len} symbols")

    t0 = time.time()
    m_naive = naive_learn(words, ratio_merges, 2)
    t_naive = time.time() - t0
    t0 = time.time()
    m_inc = _learn_merges(dict(words), ratio_merges, 2)
    t_inc = time.time() - t0
    assert m_naive == m_inc, "incremental diverged from naive recount"
    print(
        f"{len(m_naive)} merges: naive {t_naive:.2f}s vs incremental "
        f"{t_inc:.2f}s = {t_naive / max(t_inc, 1e-9):.1f}x"
    )

    big = dict(words)
    big.update(synthetic_words())
    print(f"augmented table: {len(big)} words")
    t0 = time.time()
    m32 = _learn_merges(big, 32_768, 1)
    t32 = time.time() - t0
    print(f"32k-merge train: {len(m32)} merges in {t32:.1f}s")
    naive_est = t_naive / max(len(m_naive), 1) * 32_768 * (
        sum(len(s) for s in big) / max(total_len, 1)
    )
    print(f"(naive extrapolation for the same run: ~{naive_est:.0f}s)")


if __name__ == "__main__":
    main()
