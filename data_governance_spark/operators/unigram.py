"""Trainable unigram-LM (SentencePiece-style) tokenizer, Spark-first.

The second industry-standard subword algorithm next to BPE (Kudo 2018,
"Subword Regularization"; the default in SentencePiece/T5/mT5/ALBERT).
Where BPE greedily grows a merge table, the unigram model starts from
a LARGE seed vocabulary and prunes: pieces carry probabilities, a
word's segmentation is the max-probability path through its substring
lattice (Viterbi), and training alternates EM (expected piece counts
over all lattice paths, forward-backward) with loss-ranked pruning
until the target vocabulary size.

Spark shape — identical to ``bpe.py`` by design:

- the ONLY corpus-scale work is ONE word-frequency aggregation
  (JVM-side ``TOKEN_REGEX`` pre-tokenize → explode → groupBy).  The
  EM loop runs driver-side over the DISTINCT-word table, which is
  vocabulary-sized (Heaps' law), never corpus-sized; ``max_words``
  caps driver memory outright.
- application is embarrassingly parallel: Viterbi per word inside an
  Arrow-batched pandas UDF over a broadcast piece table, with a
  per-executor word cache (Zipf does the work).

Determinism: the word table is collected with a (freq desc, word)
deterministic order, EM is plain float arithmetic over that table,
pruning sorts by (loss desc, piece), and Viterbi tie-breaks prefer the
LONGER piece then the lexicographically smaller one — same corpus,
same model, any cluster layout; pinned by tests and the d05 'uni'
sub-gate's literal restatement.

Scope choices vs the SentencePiece binary, stated honestly:
- seeding uses all substrings (≤ ``max_piece_len``) of the capped word
  table scored by freq·len — the paper's "frequent substrings" seed
  without the suffix-array machinery (the word table is already
  bounded, so the quadratic-in-word-length enumeration is cheap);
- pruning keeps every single-character piece (full character coverage
  of the training corpus; unseen characters at apply time take the
  UNK piece, never a crash);
- subword-regularization SAMPLING (the paper's §3) is out of scope —
  this is the deterministic tokenizer tier, not a training-time
  augmenter.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_governance_spark.functions.text import TOKEN_REGEX, regex_tokens

__all__ = [
    "UnigramModel",
    "train_unigram",
    "unigram_encode_word",
    "apply_unigram",
    "unigram_token_counts",
]

UNK = "<unk>"
_UNK_PENALTY = 20.0  # nats below the worst real piece

_PY_TOKEN_RE = re.compile(TOKEN_REGEX, re.ASCII)


@dataclass(frozen=True)
class UnigramModel:
    """piece → log probability (natural log, normalized over pieces).
    ``logp[UNK]`` is the fallback score for characters never seen in
    training."""

    logp: dict[str, float]
    max_piece_len: int

    def items(self):
        return self.logp.items()


# --------------------------------------------------------------------------
# lattice primitives (driver-side training AND executor-side apply)
# --------------------------------------------------------------------------
def _viterbi(word: str, logp: dict[str, float], max_len: int,
             unk_lp: float) -> list[str]:
    """Max-log-prob segmentation; ties prefer the longer piece, then
    the lexicographically smaller one.  Unknown single characters take
    the UNK score but emit the character itself (lossless round-trip)."""
    n = len(word)
    best = [(-math.inf, 0)] * (n + 1)  # (score, start_of_last_piece)
    best[0] = (0.0, 0)
    for end in range(1, n + 1):
        b_score, b_start = -math.inf, end - 1
        lo = max(0, end - max_len)
        for start in range(lo, end):
            prev = best[start][0]
            if prev == -math.inf:
                continue
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                if end - start > 1:
                    continue
                lp = unk_lp
            s = prev + lp
            # tie-break: longer piece == smaller start; then lex
            if s > b_score or (
                s == b_score
                and (start < b_start
                     or (start == b_start and piece < word[b_start:end]))
            ):
                b_score, b_start = s, start
        best[end] = (b_score, b_start)
    out: list[str] = []
    end = n
    while end > 0:
        start = best[end][1]
        out.append(word[start:end])
        end = start
    out.reverse()
    return out


def _forward_backward(
    word: str, logp: dict[str, float], max_len: int
) -> tuple[float, dict[str, float]]:
    """(total log-likelihood, expected piece counts) over ALL lattice
    segmentations of ``word``.  Single characters are always in the
    vocabulary during training, so the lattice is never disconnected."""
    n = len(word)
    # log-domain forward/backward with manual logsumexp
    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    arcs: list[list[tuple[int, str, float]]] = [[] for _ in range(n + 1)]
    for end in range(1, n + 1):
        acc = -math.inf
        for start in range(max(0, end - max_len), end):
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None or alpha[start] == -math.inf:
                continue
            arcs[end].append((start, piece, lp))
            v = alpha[start] + lp
            acc = v if acc == -math.inf else (
                max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
            )
        alpha[end] = acc
    z = alpha[n]
    if z == -math.inf:
        return z, {}
    beta = [-math.inf] * (n + 1)
    beta[n] = 0.0
    for end in range(n, 0, -1):
        if beta[end] == -math.inf:
            continue
        for start, piece, lp in arcs[end]:
            v = beta[end] + lp
            b = beta[start]
            beta[start] = v if b == -math.inf else (
                max(b, v) + math.log1p(math.exp(-abs(b - v)))
            )
    exp: dict[str, float] = {}
    for end in range(1, n + 1):
        for start, piece, lp in arcs[end]:
            post = math.exp(alpha[start] + lp + beta[end] - z)
            exp[piece] = exp.get(piece, 0.0) + post
    return z, exp


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------
def _seed_vocab(
    words: dict[str, int], seed_size: int, max_piece_len: int
) -> dict[str, float]:
    """Initial piece log-probs: all substrings ≤ max_piece_len of the
    capped word table, scored freq·len, top ``seed_size`` kept, single
    chars always included."""
    counts: Counter = Counter()
    chars: Counter = Counter()
    for w, f in words.items():
        n = len(w)
        for i in range(n):
            chars[w[i]] += f
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                counts[w[i:j]] += f
    multi = {p: c * len(p) for p, c in counts.items() if len(p) > 1}
    keep = sorted(
        multi, key=lambda p: (-multi[p], p)
    )[: max(0, seed_size - len(chars))]
    seed = {p: float(counts[p]) for p in keep}
    for ch, c in chars.items():
        seed[ch] = float(c)
    total = sum(seed.values())
    return {p: math.log(c / total) for p, c in seed.items()}


def _em_round(
    words: dict[str, int], logp: dict[str, float], max_piece_len: int
) -> tuple[dict[str, float], float]:
    """One EM iteration: returns (new log-probs, corpus log-likelihood
    under the CURRENT model)."""
    exp: dict[str, float] = {}
    ll = 0.0
    for w, f in words.items():
        z, e = _forward_backward(w, logp, max_piece_len)
        if z == -math.inf:
            continue
        ll += f * z
        for p, c in e.items():
            exp[p] = exp.get(p, 0.0) + f * c
    total = sum(exp.values())
    new = {
        p: math.log(c / total) for p, c in exp.items() if c > 0.0
    }
    # single chars must survive EM even at zero expectation (coverage)
    floor = min(new.values()) - _UNK_PENALTY if new else -_UNK_PENALTY
    for p in logp:
        if len(p) == 1 and p not in new:
            new[p] = floor
    return new, ll


def _prune(
    words: dict[str, int],
    logp: dict[str, float],
    target: int,
    max_piece_len: int,
) -> dict[str, float]:
    """Loss-ranked pruning (the paper's criterion, computed directly):
    a multi-char piece's loss is its freq-weighted Viterbi usage times
    (its log-prob minus the best alternative segmentation of its own
    string without it).  Keep the ``target`` highest-loss pieces;
    single chars are never pruned."""
    if len(logp) <= target:
        return logp
    usage: Counter = Counter()
    unk_lp = min(logp.values()) - _UNK_PENALTY
    for w, f in words.items():
        for p in _viterbi(w, logp, max_piece_len, unk_lp):
            usage[p] += f
    losses: dict[str, float] = {}
    for p in list(logp):
        if len(p) == 1:
            continue
        u = usage.get(p, 0)
        if u == 0:
            losses[p] = -math.inf  # unused: first to go
            continue
        # evaluate the alternative segmentation with p temporarily
        # removed (pop/restore — copying the vocab dict per candidate
        # would make pruning O(V^2) at production seed sizes)
        lp_p = logp.pop(p)
        alt = sum(
            logp.get(q, unk_lp)
            for q in _viterbi(p, logp, max_piece_len, unk_lp)
        )
        logp[p] = lp_p
        losses[p] = u * (lp_p - alt)
    chars = [p for p in logp if len(p) == 1]
    budget = max(0, target - len(chars))
    keep = sorted(losses, key=lambda p: (-losses[p], p))[:budget]
    kept = {p: logp[p] for p in keep}
    for ch in chars:
        kept[ch] = logp[ch]
    # renormalize over the survivors
    z = math.log(sum(math.exp(v) for v in kept.values()))
    return {p: v - z for p, v in kept.items()}


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 200,
    seed_size: int = 2000,
    max_piece_len: int = 8,
    em_iters: int = 2,
    shrink: float = 0.75,
    max_words: int = 1_000_000,
    lowercase: bool = True,
) -> UnigramModel:
    """Learn a unigram-LM vocabulary: one Spark word-frequency
    aggregation, then driver-side EM + prune rounds (each round runs
    ``em_iters`` EM steps, then prunes to ``shrink``× the current size
    until ``vocab_size``)."""
    if vocab_size < 2 or seed_size < vocab_size or max_piece_len < 1:
        raise ValueError("invalid unigram training parameters")
    if not 0 < shrink < 1:
        raise ValueError(f"shrink must be in (0,1), got {shrink}")
    c: Column = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    wf_rows = (
        docs.select(F.explode(regex_tokens(c)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.desc("f"), "w")
        .limit(max_words)
        .collect()
    )
    words = {r["w"]: r["f"] for r in wf_rows}
    if not words:
        raise ValueError("empty training corpus")
    logp = _seed_vocab(words, seed_size, max_piece_len)
    while True:
        for _ in range(em_iters):
            logp, _ll = _em_round(words, logp, max_piece_len)
        if len(logp) <= vocab_size:
            break
        nxt = max(vocab_size, int(len(logp) * shrink))
        before = len(logp)
        logp = _prune(words, logp, nxt, max_piece_len)
        if nxt == vocab_size or len(logp) == before:
            # done, or pruning is a no-op (single-char coverage alone
            # exceeds vocab_size — chars are never pruned, so the
            # model floors at the character inventory)
            for _ in range(em_iters):
                logp, _ll = _em_round(words, logp, max_piece_len)
            break
    unk_lp = min(logp.values()) - _UNK_PENALTY
    out = dict(logp)
    out[UNK] = unk_lp
    return UnigramModel(out, max_piece_len)


# --------------------------------------------------------------------------
# application
# --------------------------------------------------------------------------
def unigram_encode_word(word: str, model: UnigramModel) -> list[str]:
    return _viterbi(word, model.logp, model.max_piece_len,
                    model.logp[UNK])


def apply_unigram(
    df: DataFrame,
    model: UnigramModel,
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """``df`` plus an array<string> column of unigram tokens.  Arrow
    map pass over a broadcast piece table with a per-executor word
    cache."""
    sc = df.sparkSession.sparkContext
    b = sc.broadcast((model.logp, model.max_piece_len))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        logp, max_len = b.value
        unk_lp = logp[UNK]
        cache: dict[str, list[str]] = {}

        def encode(text) -> list[str]:
            if text is None:
                return []
            if lowercase:
                text = text.lower()
            out: list[str] = []
            for w in _PY_TOKEN_RE.findall(text):
                got = cache.get(w)
                if got is None:
                    got = _viterbi(w, logp, max_len, unk_lp)
                    if len(cache) < 100_000:
                        cache[w] = got
                out.extend(got)
            return out

        for pdf in batches:
            pdf[out_col] = pdf[text_col].map(encode)
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<string>"
    return df.mapInPandas(run, schema)


def unigram_token_counts(
    df: DataFrame,
    model: UnigramModel,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """df columns + ``unigram_token_count`` (the sequence-length
    accounting a packing/budget stage needs)."""
    toks = apply_unigram(df, model, text_col, "_uni", lowercase)
    return toks.withColumn(
        "unigram_token_count", F.size("_uni")
    ).drop("_uni")
