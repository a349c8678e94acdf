"""Unigram-LM tokenizer (operators/unigram.py): lattice primitives
against brute force, EM monotonicity, prune/coverage invariants,
training determinism, and the distributed Arrow apply against the
driver-side encoder."""

from __future__ import annotations

import math
from itertools import combinations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.unigram import (
    UNK,
    UnigramModel,
    _em_round,
    _forward_backward,
    _prune,
    _seed_vocab,
    _viterbi,
    apply_unigram,
    train_unigram,
    unigram_encode_word,
    unigram_token_counts,
)

_WORDS = {"abab": 50, "ababab": 30, "abc": 10, "cab": 5}


def _toy_model() -> dict[str, float]:
    logp = _seed_vocab(_WORDS, seed_size=50, max_piece_len=6)
    for _ in range(3):
        logp, _ = _em_round(logp=logp, words=_WORDS, max_piece_len=6)
    return logp


def _all_segmentations(word: str, pieces: set[str]):
    """Every way to split ``word`` into pieces (brute force)."""
    n = len(word)
    results = []
    for k in range(n):
        for cuts in combinations(range(1, n), k):
            bounds = (0, *cuts, n)
            segs = [word[bounds[i]: bounds[i + 1]] for i in range(len(bounds) - 1)]
            if all(s in pieces for s in segs):
                results.append(segs)
    return results


# ------------------------------------------------------------- lattice
def test_viterbi_matches_bruteforce():
    logp = _toy_model()
    pieces = set(logp)
    unk = min(logp.values()) - 20.0
    for word in ("abab", "ababab", "abc", "cab", "abcab", "aabbc"):
        segs = _all_segmentations(word, pieces)
        assert segs, word
        best = max(segs, key=lambda s: (sum(logp[p] for p in s)))
        best_score = sum(logp[p] for p in best)
        got = _viterbi(word, logp, 6, unk)
        assert "".join(got) == word
        assert math.isclose(
            sum(logp[p] for p in got), best_score, rel_tol=1e-12
        ), (word, got, best)


def test_forward_backward_matches_bruteforce_likelihood():
    logp = _toy_model()
    pieces = set(logp)
    for word in ("abab", "abc", "cabab"):
        segs = _all_segmentations(word, pieces)
        want = math.log(
            sum(math.exp(sum(logp[p] for p in s)) for s in segs)
        )
        z, exp = _forward_backward(word, logp, 6)
        assert math.isclose(z, want, rel_tol=1e-9), word
        # expected counts: sum over segmentations of count(p) weighted
        # by the segmentation's posterior
        for p in exp:
            want_c = sum(
                math.exp(sum(logp[q] for q in s) - want) * s.count(p)
                for s in segs
            )
            assert math.isclose(exp[p], want_c, rel_tol=1e-9, abs_tol=1e-12)


def test_viterbi_unseen_char_roundtrip():
    logp = _toy_model()
    unk = min(logp.values()) - 20.0
    got = _viterbi("zabz", logp, 6, unk)
    assert "".join(got) == "zabz"
    assert "z" in got


@settings(max_examples=40, deadline=None)
@given(st.text(alphabet="abc", min_size=1, max_size=12))
def test_viterbi_lossless_any_word(word):
    logp = _toy_model()
    unk = min(logp.values()) - 20.0
    assert "".join(_viterbi(word, logp, 6, unk)) == word


# ------------------------------------------------------------ training
def test_em_loglik_nondecreasing():
    logp = _seed_vocab(_WORDS, seed_size=50, max_piece_len=6)
    lls = []
    for _ in range(5):
        logp, ll = _em_round(_WORDS, logp, 6)
        lls.append(ll)
    assert all(b >= a - 1e-9 for a, b in zip(lls, lls[1:])), lls


def test_prune_keeps_chars_and_target():
    logp = _toy_model()
    pruned = _prune(_WORDS, logp, 6, 6)
    assert len(pruned) <= 6
    for ch in "abc":
        assert ch in pruned
    # probabilities renormalized
    assert math.isclose(
        sum(math.exp(v) for v in pruned.values()), 1.0, rel_tol=1e-9
    )


def test_prune_noop_when_under_target():
    logp = _toy_model()
    assert _prune(_WORDS, logp, 10_000, 6) is logp


@pytest.fixture(scope="module")
def toy_docs(spark):
    rows = [
        (0, "abab ababab abab"),
        (1, "abc cab abab"),
        (2, "ababab ababab cab abc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_unigram_learns_multichar_pieces(spark, toy_docs):
    model = train_unigram(
        toy_docs, vocab_size=10, seed_size=60, max_piece_len=6
    )
    assert UNK in model.logp
    assert "ab" in model.logp or "abab" in model.logp
    toks = unigram_encode_word("ababab", model)
    assert "".join(toks) == "ababab"
    assert len(toks) < 6  # beats character-level


def test_train_unigram_deterministic(spark, toy_docs):
    m1 = train_unigram(toy_docs, vocab_size=10, seed_size=60)
    m2 = train_unigram(toy_docs, vocab_size=10, seed_size=60)
    assert m1.logp == m2.logp


def test_train_unigram_validation(spark, toy_docs):
    with pytest.raises(ValueError):
        train_unigram(toy_docs, vocab_size=1)
    with pytest.raises(ValueError):
        train_unigram(toy_docs, vocab_size=10, seed_size=5)
    with pytest.raises(ValueError):
        train_unigram(toy_docs, shrink=1.5)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty"):
        train_unigram(empty)


def test_vocab_floors_at_char_inventory(spark):
    # 30 distinct chars, vocab_size 8 < coverage: training must
    # terminate (the no-op prune guard) and keep every char
    alphabet = "abcdefghijklmnopqrstuvwxyz0123"
    docs = spark.createDataFrame(
        [(i, " ".join(alphabet[i: i + 3] for i in range(27)))
         for i in range(2)],
        "doc_id long, text string",
    )
    model = train_unigram(docs, vocab_size=8, seed_size=64,
                          max_piece_len=4)
    for ch in alphabet[:27]:
        assert ch in model.logp


# ----------------------------------------------------------- apply
def test_apply_unigram_matches_driver(spark, toy_docs):
    model = train_unigram(toy_docs, vocab_size=10, seed_size=60)
    rows = apply_unigram(toy_docs, model).orderBy("doc_id").collect()
    import re as _re

    from data_governance_spark.functions.text import TOKEN_REGEX

    pat = _re.compile(TOKEN_REGEX, _re.ASCII)
    for r in rows:
        want = []
        for w in pat.findall(r["text"].lower()):
            want.extend(unigram_encode_word(w, model))
        assert list(r["unigram_tokens"]) == want


def test_apply_unigram_null_text(spark):
    model = UnigramModel({"a": -0.5, UNK: -20.0}, 4)
    df = spark.createDataFrame(
        [(0, None), (1, "a aa")], "doc_id long, text string"
    )
    rows = apply_unigram(df, model).orderBy("doc_id").collect()
    assert list(rows[0]["unigram_tokens"]) == []
    assert list(rows[1]["unigram_tokens"]) == ["a", "a", "a"]


def test_gate_pins_reproduce(spark):
    """The d05 'uni' oracle literals must be regenerated exactly by
    training (the bpe-gate pinning pattern).  Margin: the learned
    piece log-probs are separated by >0.15 nats and the kept/dropped
    boundary by >600 nats, so last-ulp libm variance cannot flip any
    pinned row."""
    from data_governance_spark.queries.documents import (
        _BPE_ROWS,
        _UNI_COUNTS,
        _UNI_SEGS,
        _UNI_VOCAB,
    )

    docs = spark.createDataFrame(
        list(_BPE_ROWS), "doc_id long, text string"
    )
    model = train_unigram(docs, vocab_size=12, seed_size=60,
                          max_piece_len=6)
    assert len(model.logp) == _UNI_VOCAB
    for w, s in _UNI_SEGS:
        assert "+".join(unigram_encode_word(w, model)) == s
    got = {
        r["doc_id"]: r["unigram_token_count"]
        for r in unigram_token_counts(docs, model).collect()
    }
    assert tuple(got[i] for i in range(4)) == _UNI_COUNTS
    # the margin claims themselves
    vals = sorted(model.logp.values(), reverse=True)
    gaps = [a - b for a, b in zip(vals, vals[1:]) if a != b]
    assert min(g for g in gaps if g > 0) > 0.15


def test_unigram_token_counts(spark, toy_docs):
    model = train_unigram(toy_docs, vocab_size=10, seed_size=60)
    rows = (
        unigram_token_counts(toy_docs, model).orderBy("doc_id").collect()
    )
    for r in rows:
        assert r["unigram_token_count"] > 0
    assert "unigram_tokens" not in rows[0].asDict()
