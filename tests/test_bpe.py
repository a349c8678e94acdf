"""Trainable BPE tokenizer (operators/bpe.py) — differential against
an independent paper-style reference implementation (string-join
vocab + regex merging, the Sennrich 2016 reference shape), plus the
distributed apply path."""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest

from data_governance_spark.operators.bpe import (
    END_OF_WORD,
    BpeModel,
    apply_bpe,
    bpe_encode_word,
    bpe_token_counts,
    train_bpe,
)


# ---- independent reference (deliberately different data layout) ----------
def ref_train(word_freqs, num_merges, min_freq=2):
    vocab = {
        " ".join(list(w) + [END_OF_WORD]): f for w, f in word_freqs.items()
    }
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, f in vocab.items():
            syms = w.split()
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_freq:
            break
        merges.append(best)
        pat = re.compile(
            r"(?<!\S)" + re.escape(" ".join(best)) + r"(?!\S)"
        )
        vocab = Counter(
            {pat.sub("".join(best), w): f for w, f in vocab.items()}
        )
    return merges


def ref_encode(word, merges):
    """Sequential in-learned-order exhaustive application — the
    original paper's strategy, vs the operator's greedy
    lowest-rank-first loop. Their agreement is part of what this
    differential verifies."""
    w = " ".join(list(word) + [END_OF_WORD])
    for a, b in merges:
        pat = re.compile(r"(?<!\S)" + re.escape(f"{a} {b}") + r"(?!\S)")
        w = pat.sub(a + b, w)
    return w.split()


SENNRICH = {
    "low": 5, "lower": 2, "newest": 6, "widest": 3,
}


def test_sennrich_example_merges():
    merges = ref_train(SENNRICH, 4)
    # the classic result: es, est, est</w>, then lo
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", END_OF_WORD)]
    assert merges[3] == ("l", "o")


def test_train_matches_reference(spark):
    text = " ".join(w for w, f in SENNRICH.items() for _ in range(f))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    model = train_bpe(docs, num_merges=6, min_freq=2)
    assert list(model.merges) == ref_train(SENNRICH, 6)


def test_random_corpora_differential(spark):
    rng = random.Random(17)
    alphabet = "abcde"
    for trial in range(4):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 7)))
            for _ in range(30)
        ]
        freqs = Counter(rng.choice(words) for _ in range(300))
        text = " ".join(w for w, f in freqs.items() for _ in range(f))
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(text.split("."))],
            "doc_id long, text string",
        )
        model = train_bpe(docs, num_merges=25, min_freq=2)
        want = ref_train(dict(freqs), 25)
        assert list(model.merges) == want, trial
        ranks = model.ranks()
        for w in freqs:
            assert bpe_encode_word(w, ranks) == ref_encode(w, want), (
                trial, w,
            )


def test_encode_greedy_rank_order():
    # merges deliberately ordered so rank matters: ('b','c') outranks
    # ('a','b'), so "abc" must become a + bc, not ab + c
    model = BpeModel(merges=(("b", "c"), ("a", "bc"), ("a", "b")))
    ranks = model.ranks()
    assert bpe_encode_word("abc", ranks) == ["abc", END_OF_WORD]
    model2 = BpeModel(merges=(("b", "c"),))
    assert bpe_encode_word("abc", model2.ranks()) == [
        "a", "bc", END_OF_WORD,
    ]


def test_apply_bpe_distributed(spark):
    docs = spark.createDataFrame(
        [(1, "low lower"), (2, "newest, newest!"), (3, None)],
        "doc_id long, text string",
    )
    train_docs = spark.createDataFrame(
        [(1, " ".join(w for w, f in SENNRICH.items() for _ in range(f)))],
        "doc_id long, text string",
    )
    model = train_bpe(train_docs, num_merges=6)
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in apply_bpe(docs, model).collect()
    }
    ranks = model.ranks()
    want1 = bpe_encode_word("low", ranks) + bpe_encode_word("lower", ranks)
    assert out[1] == want1
    # punctuation splits off as its own symbol token per TOKEN_REGEX
    assert out[2] == (
        bpe_encode_word("newest", ranks)
        + bpe_encode_word(",", ranks)
        + bpe_encode_word("newest", ranks)
        + bpe_encode_word("!", ranks)
    )
    assert out[3] == []
    counts = {
        r["doc_id"]: r["bpe_token_count"]
        for r in bpe_token_counts(docs, model).collect()
    }
    assert counts == {1: len(want1), 2: len(out[2]), 3: 0}


def test_train_determinism_under_input_order(spark):
    rows = [(i, w) for i, w in enumerate(
        ["low lower", "newest widest", "newest newest", "low low low",
         "widest newest newest", "lower newest"]
    )]
    a = train_bpe(
        spark.createDataFrame(rows, "doc_id long, text string"),
        num_merges=10,
    )
    b = train_bpe(
        spark.createDataFrame(rows[::-1], "doc_id long, text string")
        .repartition(7),
        num_merges=10,
    )
    assert a.merges == b.merges and a.vocab == b.vocab


def test_max_words_cap_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd aa bb aa")], "doc_id long, text string"
    )
    m = train_bpe(docs, num_merges=5, min_freq=1, max_words=2)
    # cap keeps the 2 most frequent words (aa x3, bb x2) only
    flat = {s for pair in m.merges for s in pair}
    assert not any("c" in s or "d" in s for s in flat)


def test_invalid_params(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        train_bpe(docs, min_freq=0)


def test_bpe_counts_feed_sequence_packing(spark):
    """The DEPLOY-documented composition: real subword counts from a
    trained BPE replace the whitespace approximation as the packing
    budget (pack_sequences consumes them via token_count_col)."""
    from data_governance_spark.operators.packing import pack_sequences

    train = spark.createDataFrame(
        [(1, " ".join(w for w, f in SENNRICH.items() for _ in range(f)))],
        "doc_id long, text string",
    )
    model = train_bpe(train, num_merges=6)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["low low lower", "newest widest", "low", "newest newest newest"]
        )],
        "doc_id long, text string",
    )
    counted = docs.join(bpe_token_counts(docs, model), "doc_id")
    packed = pack_sequences(
        counted, max_tokens=16, num_buckets=2,
        token_count_col="bpe_token_count",
    )
    rows = {r["doc_id"]: r for r in packed.collect()}
    ranks = model.ranks()
    for i, t in enumerate(
        ["low low lower", "newest widest", "low", "newest newest newest"]
    ):
        want = sum(len(bpe_encode_word(w, ranks)) for w in t.split())
        assert rows[i]["n_tokens"] == want
    # offsets are consistent with the concat-and-chunk layout: within
    # each bucket the docs form one continuous token stream, and each
    # doc's global start (pack_id * max + offset) is the running sum
    # of the BPE counts before it (docs may straddle pack boundaries —
    # that is the layout's contract, not a bug)
    by_bucket = {}
    for r in rows.values():
        by_bucket.setdefault(r["pack_bucket"], []).append(r)
    for group in by_bucket.values():
        group.sort(key=lambda r: (r["pack_id"], r["pack_offset"]))
        acc = 0
        for r in group:
            assert r["pack_id"] * 16 + r["pack_offset"] == acc
            acc += r["n_tokens"]


def test_learn_merges_rejects_non_unique_words():
    """Word tuples that alias after a merge violate the tuple-identity
    invariant the incremental counts rest on; that must raise a real
    exception, not an assert that vanishes under ``python -O``
    (ADVICE r8 finding). Here ('a','b','c') rebuilds to ('ab','c')
    after the first merge, colliding with the existing key."""
    from data_governance_spark.operators.bpe import _learn_merges

    with pytest.raises(ValueError, match="non-unique"):
        _learn_merges({("a", "b", "c"): 1, ("ab", "c"): 1}, 2, 1)
