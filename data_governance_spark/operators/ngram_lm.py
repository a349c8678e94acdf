"""Kneser-Ney n-gram language-model perplexity scoring — the
KenLM-tier quality filter of CCNet (Wenzek et al. 2020, "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data"):
train a smoothed n-gram LM on a high-quality reference corpus
(Wikipedia in the paper), score every candidate document by
perplexity, and cut or bucket on it. DSIR (operators/dsir.py) is the
importance-weighting tier and textclf the discriminative tier; this is
the generative one — the third standard published quality signal.

Model: interpolated Kneser-Ney with one fixed discount D per order
(Kneser & Ney 1995; Chen & Goodman 1999 eq. 16 shape). Order-k
probabilities use CONTINUATION counts below the top order (KenLM's own
lower-order entries), with the full recursion

    P(w | h) = max(A(hw) - D, 0) / denom(h)
             + D * N1+(h.) / denom(h) * P(w | h')

where ``A`` is the raw count at the top order and N1+(.g) (distinct
left-context count) below, h' drops the leftmost context word, and an
unseen context h backs off straight to P(w | h'). The unigram level
interpolates with a uniform 1/(V+1) floor so OOV tokens score finite
perplexity (the +1 reserves mass for the unseen event). The exact
arithmetic is pinned by a pure-Python reference differential in
tests/test_ngram_lm.py.

Spark-first decomposition (every corpus-scale step is one aggregate
whose measures are algebraic — map-side combine bounds reducers under
any gram skew):

1. one gram-count aggregation per order 1..n over the REFERENCE corpus
   (space-joined token windows; tokens are whitespace-split so the
   join is injective);
2. continuation tables ``N1+(.g)`` and context tables
   ``(denom, n-types)`` derived from the order-(k+1) table by prefix/
   suffix grouping — `substring_index` keeps it JVM-side;
3. each table collects to the driver CAPPED at ``max_ngrams`` rows,
   frequency-ranked with the gram string as a deterministic tie-break
   (the KenLM pruning trade: a pruned gram backs off, exactly like a
   never-seen one; the capped tail is the rare mass);
4. scoring is map-only: the tables broadcast once, an Arrow-batched
   pandas UDF walks each document's tokens with the recursion above
   (pure dict lookups — no corpus-size driver state anywhere).

At 100 TB the honest training cost is n passes over the reference
corpus (which is the SMALL side — CCNet's reference is Wikipedia, not
the crawl) and scoring is one map-only pass over the candidates.

Train/score tokenizer parity: training tokenizes JVM-side with the
corpus-wide whitespace ``functions.text.tokens``; the scorer compiles
``\\S+`` with ``re.ASCII`` so Python's Unicode ``\\s`` cannot see
different token boundaries than Java's ASCII one (the same parity trap
operators/exsubstr.py and operators/bpe.py document).

Reference twin: none — training-data extension per SURVEY.md §6
(Kneser & Ney 1995 / Wenzek et al. 2020 are the published methods).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_governance_spark.functions.text import tokens

_WS = re.compile(r"\S+", re.ASCII)

# Scoring-memo ceiling (entries), checked at doc boundaries: ~500k
# (h, w) tuples is tens of MB — a real cap well above any single
# document's gram count, well below executor-memory trouble.
_MEMO_MAX_ENTRIES = 500_000


@dataclass(frozen=True)
class NGramLM:
    """A fitted LM. ``num[k]`` maps an order-k gram (space-joined) to
    its adjusted count (raw at order n, continuation below); ``ctx[k]``
    maps an order-k CONTEXT (k-1 tokens) to ``(denom, n_types)``.
    ``n_types1``/``denom1`` are the unigram level; ``vocab`` is the
    raw distinct-unigram count feeding the 1/(V+1) floor."""

    order: int
    discount: float
    num: tuple[dict, ...]  # index k-1 -> order-k numerator table
    ctx: tuple[dict, ...]  # index k-2 -> order-k context table (k>=2)
    denom1: int
    n_types1: int
    vocab: int

    def log_prob(self, w: str, context: tuple[str, ...]) -> float:
        """ln P(w | context) — context is the up-to-(order-1) preceding
        tokens; shorter contexts enter at the matching lower order."""
        return math.log(self._p(w, context[-(self.order - 1):]
                                if self.order > 1 else ()))

    def _p(self, w: str, h: tuple[str, ...]) -> float:
        d = self.discount
        if not h:
            a = self.num[0].get(w, 0)
            lam = d * self.n_types1 / self.denom1
            return (
                max(a - d, 0.0) / self.denom1
                + lam * (1.0 / (self.vocab + 1))
            )
        k = len(h) + 1
        c = self.ctx[k - 2].get(" ".join(h))
        if c is None:  # unseen context: straight to the backoff
            return self._p(w, h[1:])
        denom, n_types = c
        a = self.num[k - 1].get(" ".join(h) + " " + w, 0)
        lam = d * n_types / denom
        return max(a - d, 0.0) / denom + lam * self._p(w, h[1:])

    def doc_perplexity(
        self, toks: list[str], cache: dict | None = None
    ) -> float | None:
        """``cache`` (optional) memoizes ln P(w|h) across calls — the
        scorer UDF passes one dict per Arrow batch because text repeats
        grams heavily, so distinct (h, w) pairs are far fewer than
        tokens (measured 3-4x throughput in
        scripts/stress_ngram_lm.py). Bounded by the batch's distinct
        gram count; never shared across batches."""
        if not toks:
            return None
        total = 0.0
        n1 = self.order - 1
        if cache is None:
            for i, w in enumerate(toks):
                total += self.log_prob(w, tuple(toks[max(0, i - n1): i]))
            return math.exp(-total / len(toks))
        for i, w in enumerate(toks):
            h = tuple(toks[max(0, i - n1): i])
            key = (h, w)
            lp = cache.get(key)
            if lp is None:
                lp = self.log_prob(w, h)
                if len(cache) >= _MEMO_MAX_ENTRIES:
                    # enforced PER INSERT, not per document: one
                    # adversarial mostly-unique-token mega-document
                    # must not blow past the ceiling mid-call
                    cache.clear()
                cache[key] = lp
            total += lp
        return math.exp(-total / len(toks))


def _gram_counts(docs: DataFrame, text_col: str, order: int) -> DataFrame:
    """(_lm_k, g, c): raw gram counts for EVERY order 1..``order`` in
    one generate + ONE algebraic hash aggregate — a single pass over
    (and a single tokenization of) the reference corpus instead of one
    per order (r14, guide §2.3/§1.2: same shuffled gram rows in total,
    ``order``-times fewer corpus scans)."""
    base = docs.select(tokens(text_col).alias("_lm_toks")).sample(
        1.0, seed=0
    )  # fence: size/sequence/slice all read the token array
    ex = (
        base.filter(F.size("_lm_toks") >= 1)
        .select(
            "_lm_toks",
            # k ascends 1..min(order, len): guarded by the filter above
            # so sequence() never sees stop < start (it would generate
            # a DESCENDING range, not an empty one)
            F.explode(
                F.sequence(
                    F.lit(1), F.least(F.lit(order), F.size("_lm_toks"))
                )
            ).alias("_lm_k"),
        )
        .select(
            "_lm_k",
            "_lm_toks",
            F.explode(
                F.sequence(F.lit(0), F.size("_lm_toks") - F.col("_lm_k"))
            ).alias("_lm_pos"),
        )
        .select(
            "_lm_k",
            F.concat_ws(
                " ",
                F.slice("_lm_toks", F.col("_lm_pos") + 1, F.col("_lm_k")),
            ).alias("g"),
        )
    )
    return ex.groupBy("_lm_k", "g").agg(F.count(F.lit(1)).alias("c"))


def _capped(df: DataFrame, count_col: str, max_rows: int) -> list:
    """Deterministic frequency-ranked cap (count desc, gram asc) —
    the BPE max_words pattern."""
    return (
        df.orderBy(F.desc(count_col), "g").limit(max_rows).collect()
    )


def train_ngram_lm(
    docs: DataFrame,
    text_col: str = "text",
    order: int = 3,
    discount: float = 0.75,
    max_ngrams: int = 1_000_000,
) -> NGramLM:
    """Fit an interpolated Kneser-Ney LM on the reference corpus
    ``docs`` (see module docstring). One gram aggregation per order;
    driver memory is bounded by ``max_ngrams`` rows per table, never
    by corpus size.

    When the ``max_ngrams`` cap binds, numerator tables are pruned but
    each context's denominator still comes from the UNCAPPED aggregate,
    so pruned grams leak a little probability mass (sum over w of
    P(w|h) < 1 beyond the discount) — the standard
    prune-without-renormalize trade (KenLM behaves the same way); the
    reference differentials in tests/test_ngram_lm.py run uncapped so
    the exact arithmetic stays pinned."""
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    if not (0.0 < discount < 1.0):
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    if max_ngrams < 1:
        raise ValueError(f"max_ngrams must be >= 1, got {max_ngrams}")
    from concurrent.futures import ThreadPoolExecutor

    from data_governance_spark.cache import tracked_persist

    # ONE persisted (order, gram, count) table feeds every per-order
    # derivation (one corpus scan/tokenization total — r14); the count
    # below materializes it, so the table builds that follow are small
    # cache-backed jobs
    fused = tracked_persist(_gram_counts(docs, text_col, order))
    raw = [
        fused.filter(F.col("_lm_k") == k).select("g", "c")
        for k in range(1, order + 1)
    ]
    vocab = raw[0].count()
    if vocab == 0:
        raise ValueError("empty reference corpus — no unigrams to fit on")

    def _num_table(k: int) -> dict:
        if k == order:
            adj = raw[k - 1]  # top order keeps raw counts
        else:
            # N1+(.g): each order-(k+1) table row is a DISTINCT gram,
            # so grouping by its k-token suffix counts distinct left
            # contexts with a plain count (no countDistinct shuffle)
            adj = (
                raw[k]
                .select(F.substring_index("g", " ", -k).alias("g"))
                .groupBy("g")
                .agg(F.count(F.lit(1)).alias("c"))
            )
        return {r["g"]: r["c"] for r in _capped(adj, "c", max_ngrams)}

    def _ctx_table(k: int) -> dict:
        if k == order:
            adj = raw[k - 1]
        else:
            adj = (
                raw[k]
                .select(F.substring_index("g", " ", -k).alias("g"))
                .groupBy("g")
                .agg(F.count(F.lit(1)).alias("c"))
            )
        # context table: denom(h) = sum_w A(hw), N1+(h.) = distinct
        # extensions — both one grouping of the order-k adjusted
        # table by its (k-1)-token prefix
        crows = _capped(
            adj.select(
                F.substring_index("g", " ", k - 1).alias("g"),
                "c",
            )
            .groupBy("g")
            .agg(F.sum("c").alias("c"), F.count(F.lit(1)).alias("t")),
            "c",
            max_ngrams,
        )
        return {r["g"]: (r["c"], r["t"]) for r in crows}

    # the per-order table builds are independent capped collects over
    # the SAME persisted fused table — overlap them (guide §2.6) so
    # their small sequential jobs back-fill each other's idle cores
    with ThreadPoolExecutor(max_workers=2 * order - 1) as pool:
        num_f = [pool.submit(_num_table, k) for k in range(1, order + 1)]
        ctx_f = [pool.submit(_ctx_table, k) for k in range(2, order + 1)]
        num = [f.result() for f in num_f]
        ctx = [f.result() for f in ctx_f]
    denom1 = sum(v for v in num[0].values())
    n_types1 = len(num[0])
    if denom1 == 0 and order >= 2:
        # order >= 2 only: the unigram level is the CONTINUATION table
        # derived from the bigram counts, so a reference corpus of
        # single-token documents leaves it empty — scoring would
        # ZeroDivisionError inside the executor UDF (opaque task
        # failure). Fail at train time with the actionable message
        # instead.
        raise ValueError(
            "no order-2 grams in the reference corpus (every "
            "document is a single token), so the order>=2 "
            "continuation counts are undefined — use order=1 "
            "or a reference corpus with multi-token documents"
        )
    return NGramLM(
        order=order,
        discount=discount,
        num=tuple(num),
        ctx=tuple(ctx),
        denom1=denom1,
        n_types1=n_types1,
        vocab=vocab,
    )


def perplexity(
    docs: DataFrame,
    lm: NGramLM,
    text_col: str = "text",
    out_col: str = "perplexity",
) -> DataFrame:
    """``docs`` plus a per-document perplexity column (map-only; the
    LM tables broadcast once, fetched per executor). NULL/empty text
    scores NULL — missing content has no fluency, and every bounded
    filter treats NULL as a drop."""
    bc = docs.sparkSession.sparkContext.broadcast(lm)

    @F.pandas_udf("double")
    def ppl(text: pd.Series) -> pd.Series:
        model = bc.value
        # per-batch (h, w) -> ln P memo. BOUNDED inside doc_perplexity
        # itself (cleared per-insert at _MEMO_MAX_ENTRIES): on
        # low-repetition text distinct grams approach the token count,
        # and an unbounded dict (plus its pinned token strings) is
        # executor-OOM territory — a single adversarial mega-document
        # must not exceed the ceiling either.
        cache: dict = {}
        out = [
            None
            if t is None
            else model.doc_perplexity(_WS.findall(t), cache)
            for t in text
        ]
        return pd.Series(out, dtype="float64")

    return docs.withColumn(out_col, ppl(F.col(text_col)))


def bucket_by_perplexity(
    docs: DataFrame,
    lm: NGramLM | None = None,
    text_col: str = "text",
    ppl_col: str = "perplexity",
    tier_col: str = "ppl_tier",
    quantiles: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.4): score
    the corpus with the reference LM, compute the perplexity quantile
    cutoffs ON THE CORPUS ITSELF, and label each document with its
    tier — the published alternative to a hard perplexity cut (the
    paper buckets into terciles per language; downstream recipes keep
    head+middle or curriculum-order by tier).

    ``docs`` is scored with ``lm`` unless it already carries
    ``ppl_col`` (pre-scored reuse hook — ``lm`` may then be omitted).
    Tier assignment is by VALUE against the cutoffs: documents with
    ``ppl <= cutoff[i]`` get ``labels[i]`` (first match ascending),
    the rest get ``labels[-1]``; NULL perplexity (missing content)
    gets a NULL tier, consistent with every bounded quality filter.

    Cutoffs come from one ``percentile_approx`` aggregate — the
    signal_summary contract: with ``accuracy >= the number of
    non-null scores`` the Greenwald-Khanna sketch is exact and each
    cutoff is the order statistic at rank ``ceil(q * n)``; below that
    it is rank-accurate to ``n / accuracy`` rows at bounded executor
    memory (the 100 TB setting — cutoff exactness is a statistical
    knob there, not a correctness one).

    Scale shape: one map-only scoring pass (LM broadcast once), one
    algebraic sketch aggregate (driver receives len(quantiles)
    values), one map-only tier projection over the persisted scored
    frame. No joins, no corpus-sized driver state."""
    qs = [float(q) for q in quantiles]
    if not qs:
        raise ValueError("quantiles must be non-empty")
    if any(not (0.0 < q < 1.0) for q in qs) or any(
        a >= b for a, b in zip(qs, qs[1:])
    ):
        raise ValueError(
            f"quantiles must be strictly increasing within (0, 1), "
            f"got {quantiles}"
        )
    if len(labels) != len(qs) + 1:
        raise ValueError(
            f"need exactly len(quantiles)+1 labels "
            f"({len(qs) + 1}), got {len(labels)}: {labels}"
        )
    if len(set(labels)) != len(labels):
        raise ValueError(f"labels must be distinct, got {labels}")
    if accuracy < 1:
        raise ValueError(f"accuracy must be >= 1, got {accuracy}")
    if ppl_col not in docs.columns:
        if lm is None:
            raise ValueError(
                f"docs has no {ppl_col!r} column and no lm= was "
                "given — pass a trained NGramLM or pre-scored docs"
            )
        from data_governance_spark.cache import tracked_persist

        # persisted: the cutoff aggregate AND the output projection
        # both read the scored frame, and the pandas-UDF scoring pass
        # is the expensive step
        docs = tracked_persist(
            perplexity(docs, lm, text_col=text_col, out_col=ppl_col)
        )
    cuts = docs.select(
        F.percentile_approx(ppl_col, qs, F.lit(accuracy)).alias("c")
    ).collect()[0]["c"]
    if cuts is None:
        # no non-null scores anywhere: every tier is NULL
        return docs.withColumn(tier_col, F.lit(None).cast("string"))
    tier = F.when(F.col(ppl_col) <= float(cuts[0]), F.lit(labels[0]))
    for c, lab in zip(cuts[1:], labels[1:-1]):
        tier = tier.when(F.col(ppl_col) <= float(c), F.lit(lab))
    tier = tier.otherwise(F.lit(labels[-1]))
    # NULL ppl must stay NULL — an unguarded CASE would fall through
    # to the last label (NULL <= c is NULL, not false)
    return docs.withColumn(
        tier_col, F.when(F.col(ppl_col).isNotNull(), tier)
    )
