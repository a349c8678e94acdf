#!/usr/bin/env python
"""Language-ID measurement (DEPLOY.md evidence, r14): confusion
matrix + accuracy of the char n-gram NB identifier
(operators/langid.py) across 8 languages including the pt/es close
pair, and the map-only Arrow scoring throughput.

Evaluation corpus: synthetic documents built by concatenating 1-6
HELD-OUT sentences of one language (never seen in training), with
three hostility tiers — full documents, short fragments (first 30
chars of one sentence: the hard regime for any n-gram model), and
10%-noise documents (random ASCII injected between sentences).
Deterministic (seeded PRNG).

Usage: python scripts/stress_langid.py [factor]   (default 4)
"""

from __future__ import annotations

import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.operators.langid import (  # noqa: E402
    LANG_HELDOUT,
    classify,
    detect_language,
    langid_confusion,
    train_langid,
)
from data_governance_spark.session import get_spark  # noqa: E402

BASE_DOCS = 4000  # per tier, split across languages


def build_eval(n_per_tier: int, seed: int = 14):
    rng = random.Random(seed)
    langs = sorted(LANG_HELDOUT)
    rows = []  # (tier, lang, text)
    for i in range(n_per_tier):
        lang = langs[i % len(langs)]
        sents = LANG_HELDOUT[lang]
        doc = " ".join(
            rng.choice(sents) for _ in range(rng.randint(1, 6))
        )
        rows.append(("full", lang, doc))
        frag = rng.choice(sents)[:30]
        rows.append(("short", lang, frag))
        s = rng.choice(sents)
        j = rng.randint(0, max(0, len(s) - 12))
        rows.append(("tiny", lang, s[j: j + 12]))
        noisy = []
        for s in rng.sample(sents, k=min(3, len(sents))):
            noisy.append(s)
            noisy.append(
                "".join(
                    rng.choice("abcdefghijklmnopqrstuvwxyz0123456789 ")
                    for _ in range(max(1, len(s) // 10))
                )
            )
        rows.append(("noisy", lang, " ".join(noisy)))
    return rows


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("stress_langid")
    model = train_langid()
    print(
        f"model: {len(model.langs)} langs, {len(model.gram_index)} grams, "
        f"orders {model.orders}"
    )

    rows = build_eval(BASE_DOCS * factor)
    df = spark.createDataFrame(
        rows, "tier string, lang string, text string"
    ).repartition(32)
    df.persist().count()

    # per-tier accuracy + the full confusion matrix over 'full' docs
    langs = sorted(LANG_HELDOUT)
    for tier in ("full", "short", "tiny", "noisy"):
        sub = df.filter(F.col("tier") == tier)
        cm = {
            (r["lang"], r["predicted"]): r["n"]
            for r in langid_confusion(sub, model).collect()
        }
        total = sum(cm.values())
        correct = sum(n for (a, b), n in cm.items() if a == b)
        print(f"tier={tier}: accuracy {correct}/{total} "
              f"({100.0 * correct / total:.2f}%)")
        if tier == "full":
            hdr = "      " + " ".join(f"{p:>6}" for p in langs + ["und"])
            print(hdr)
            for a in langs:
                line = f"{a:>4}: " + " ".join(
                    f"{cm.get((a, p), 0):>6}" for p in langs + ["und"]
                )
                print(line)
        # the close pair, stated explicitly
        pt_as_es = sum(n for (a, b), n in cm.items()
                       if a == "pt" and b == "es")
        es_as_pt = sum(n for (a, b), n in cm.items()
                       if a == "es" and b == "pt")
        print(f"  close pair: pt->es {pt_as_es}, es->pt {es_as_pt}")

    # throughput: one map-only pass, all tiers
    n = df.count()
    chars = df.agg(F.sum(F.length("text"))).collect()[0][0]
    t0 = time.time()
    detect_language(df, model).agg(
        F.count(F.lit(1)), F.min("lang_pred")
    ).collect()
    dt = time.time() - t0
    print(
        f"scoring: {n} docs / {chars / 1e6:.1f} M chars in {dt:.2f}s = "
        f"{n / dt:,.0f} docs/s, {chars / dt / 1e6:.1f} M chars/s "
        f"(local[32], broadcast model, no shuffle)"
    )

    # single-core driver-side rate for the DEPLOY per-core row
    sample = [r["text"] for r in df.limit(2000).collect()]
    t0 = time.time()
    for t in sample:
        classify(model, t)
    dt1 = time.time() - t0
    print(f"driver single-core: {len(sample) / dt1:,.0f} docs/s")


if __name__ == "__main__":
    main()
