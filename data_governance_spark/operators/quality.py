"""Corpus quality filtering: the Gopher-rule composition, one call.

``corpus_signals`` annotates every document with the engine's per-doc
quality signals — token count, mean token length, stopword ratio,
top-bigram coverage, duplicated-5-gram char fraction, duplicate-line
char fraction — all MAP-ONLY column expressions (tokenize once, fold
per row; zero shuffle, plan shape identical to operators/repetition).
``filter_corpus`` applies threshold rules over those signals, defaulted
to the published Gopher ranges (Rae et al. 2021, appendix A1) scaled to
this engine's whitespace tokenizer.

At 100 TB this is the first pass of a training-data pipeline: a pure
projection+filter that Catalyst fuses into the scan stage, dropping
boilerplate before any shuffle-bearing operator (dedup, packing) runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_governance_spark.functions.text import (
    stopword_count,
    tokens,
    word_shingles,
)
from data_governance_spark.operators.repetition import (
    _dup_char_count,
    _dup_run_chars,
    _max_run_length,
    doc_lines,
)

# Gopher-flavored defaults: (signal, min, max); None = unbounded.
# replacement_char_frac is the mojibake detector (fraction of U+FFFD
# from a broken decode) the post-Gopher pipelines added.
DEFAULT_RULES: dict[str, tuple[float | None, float | None]] = {
    "n_tokens": (50, 100_000),
    "mean_token_len": (2.0, 10.0),
    "stopword_ratio": (0.01, None),
    "top_bigram_frac": (None, 0.30),
    "dup_5gram_frac": (None, 0.30),
    "dup_line_frac": (None, 0.30),
    "replacement_char_frac": (None, 0.05),
}


# Which _materialize() source column each signal reads. Lets
# filter_corpus skip building sources no rule touches (a token-only
# rule set never splits lines), and lets a caller with a PRE-TOKENIZED
# relation (tokens_col=) run token-signal rules without a text column.
_SIGNAL_SOURCE: dict[str, str] = {
    "n_tokens": "toks",
    "mean_token_len": "toks",
    "stopword_ratio": "toks",
    "top_bigram_frac": "toks",
    "dup_5gram_frac": "toks",
    "dup_line_frac": "lines",
    "replacement_char_frac": "text",
}


def _materialize(
    docs: DataFrame,
    text_col: str,
    tokens_col: str | None = None,
    needs: frozenset[str] | set[str] = frozenset({"text", "toks", "lines"}),
) -> DataFrame:
    """Token and line arrays as REAL columns before any higher-order
    fold touches them: HOFs re-evaluate inline argument expressions per
    element access, so word_shingles over an inline tokens() would
    re-run the tokenizer once per n-gram (measured 10x+ slowdown —
    the same trap functions/text.shingle_hashes documents).

    ``tokens_col`` reuses an existing token-array column (caller
    already tokenized — e.g. a persisted relation shared with other
    signal consumers) instead of re-running ``tokens(text_col)``.
    ``needs`` ⊆ {text, toks, lines} limits which source columns are
    built; a source not built must not be referenced downstream (the
    caller selects only signals whose source is in ``needs``).

    NOTE the projection alone does NOT protect ``filter_corpus``:
    the optimizer substitutes these aliases into the filter predicate
    and prunes the projections away, re-inlining ``tokens()`` into
    every fold (measured: the collapsed predicate carried 72 copies of
    ``split(text)``, 57 s for 5 000 docs). ``filter_corpus`` therefore
    inserts a structural barrier — see ``_fence``."""
    cols: list = ["*"]
    if "text" in needs:
        cols.append(F.col(text_col).alias("_qm_text"))
    if "toks" in needs:
        tok = F.col(tokens_col) if tokens_col is not None else tokens(text_col)
        cols.append(tok.alias("_qm_toks"))
    if "lines" in needs:
        cols.append(doc_lines(text_col).alias("_qm_lines"))
    return docs.select(*cols)


def _fence(df: DataFrame) -> DataFrame:
    """Optimizer barrier between the signal projection and the filter:
    ``Sample(0, 1.0)`` keeps every row (Bernoulli keep is rand() < 1.0
    and rand() ∈ [0,1)) but predicates cannot be pushed through a
    Sample node and alias substitution stops at it, so the filter
    evaluates the MATERIALIZED signal columns instead of re-inlining
    ``tokens()`` into every fold at the scan. Effect at sf0.1 / 5 000
    docs: 57 s -> ~2 s (the collapsed predicate carried 72 copies of
    ``split(text)``).

    Rejected alternatives, both defeated by the optimizer (verified):
    a nondeterministic fence CONJUNCT (pushdown partitions a
    conjunction and pushes every deterministic conjunct regardless of
    position), and a nondeterministic CASE wrapper around the whole
    predicate (aliases still get substituted into the filter and the
    projections pruned away). ``rand() >= -1`` specifically is folded
    to true by Spark 4's rand-domain awareness."""
    return df.sample(1.0, seed=0)


def _signal_cols() -> dict[str, Column]:
    """Signal expressions over the _materialize() columns — a pure
    function of the fixed ``_qm_*`` names, memoized per context
    (column_memo): every filter_corpus/corpus_signals/signal_summary
    call across the suite otherwise rebuilds ~0.5 s of fold trees."""
    from data_governance_spark.cache import column_memo

    return column_memo(("q_signal_cols",), _build_signal_cols)


def _build_signal_cols() -> dict[str, Column]:
    raw = F.col("_qm_toks")
    nt = F.size(raw)
    sum_len = F.aggregate(
        raw, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    # lowercase before the stopword probe: an ALL-CAPS document ('THE
    # TERMS OF...') must not score stopword_ratio 0 and get rejected
    n_stop = stopword_count(F.transform(raw, F.lower))
    grams2 = F.array_sort(word_shingles(raw, 2))
    grams5 = F.array_sort(word_shingles(raw, 5))
    g5_tot = F.aggregate(
        grams5, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    lines = F.array_sort(F.col("_qm_lines"))
    l_tot = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    txt = F.col("_qm_text")
    n_chars = F.length(txt)
    n_repl = n_chars - F.length(F.replace(txt, F.lit("�"), F.lit("")))
    return {
        "n_tokens": nt.cast("long"),
        "mean_token_len": F.when(nt > 0, sum_len / nt),
        "stopword_ratio": F.when(nt > 0, n_stop / nt),
        "top_bigram_frac": F.when(
            nt >= 2, F.lit(2) * _max_run_length(grams2) / nt
        ),
        "dup_5gram_frac": F.when(nt >= 5, _dup_run_chars(grams5) / g5_tot),
        "dup_line_frac": F.when(
            F.size(lines) > 0, _dup_char_count(lines) / l_tot
        ),
        "replacement_char_frac": F.when(n_chars > 0, n_repl / n_chars),
    }


def corpus_signals(
    docs: DataFrame, text_col: str = "text", tokens_col: str | None = None
) -> DataFrame:
    """Annotate with all quality signals (NULL where undefined — empty
    doc, fewer tokens than the n-gram width). ``tokens_col`` reuses a
    precomputed token-array column instead of re-tokenizing
    ``text_col`` (the text column must still exist — line and
    replacement-char signals read it).

    Fenced like ``filter_corpus``: a caller filtering on the returned
    signal columns (the natural audit query) would otherwise hit the
    same predicate-inlining blowup."""
    sig = _signal_cols()
    return _fence(
        _materialize(docs, text_col, tokens_col=tokens_col).select(
            *docs.columns, *[c.alias(n) for n, c in sig.items()]
        )
    )


def signal_summary(
    docs: DataFrame,
    text_col: str = "text",
    probs: tuple[float, ...] = (0.01, 0.25, 0.5, 0.75, 0.99),
    signals: tuple[str, ...] | None = None,
    accuracy: int = 10_000,
    tokens_col: str | None = None,
) -> DataFrame:
    """Quantiles of every quality signal in ONE aggregation pass — the
    dashboard a pipeline owner reads before picking ``filter_corpus``
    thresholds (eyeballing where the corpus mass sits beats copying
    another corpus's cutoffs). Returns a single row with one
    ``array<double>`` per signal, ordered like ``probs``;
    approx_percentile keeps it a bounded-memory partial aggregate, so
    at 100 TB this is one scan + one tiny shuffle.

    ``signals`` restricts the dashboard to named signals (default:
    all); only the source columns those signals read are built, so a
    token-only subset never splits lines. ``accuracy`` is
    percentile_approx's knob: with ``accuracy >= #non-null rows`` the
    sketch retains every value and the result is the EXACT order
    statistic at rank ceil(p*n) — the regime the driver gate pins;
    the default stays the approximate bounded-memory regime."""
    sig_all = _signal_cols()
    names = list(sig_all) if signals is None else list(signals)
    unknown = set(names) - sig_all.keys()
    if unknown:
        raise ValueError(f"unknown quality signals: {sorted(unknown)}")
    needs = {_SIGNAL_SOURCE[n] for n in names}
    sig = _fence(
        _materialize(docs, text_col, tokens_col=tokens_col, needs=needs).select(
            *[sig_all[n].alias(n) for n in names]
        )
    )
    p = F.array(*[F.lit(x) for x in probs])
    return sig.agg(
        *[F.percentile_approx(n, p, accuracy).alias(n) for n in names]
    )


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    ratio_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """Append ``ratio_col``: ``len(zlib(text)) / len(text)`` over the
    UTF-8 bytes — the Dolma/RedPajama-tier quality signal the
    Catalyst-only signals can't express (no compression primitive in
    Spark SQL). Boilerplate and template spam compress far below
    natural text (< ~0.2 vs ~0.35-0.6), so a low ratio flags
    machine-generated repetition that token-level rules miss; an
    unusually HIGH ratio (~1.0) flags binary junk in a text column.
    Empty/NULL text yields NULL (no evidence, same convention as the
    other signals).

    Implementation: an Arrow-batched pandas UDF (the sanctioned slow
    path — ~100x a row-at-a-time Python UDF); still map-only, no
    shuffle, so at 100 TB it composes into the scan stage like every
    other signal. zlib's DEFLATE output is deterministic for a given
    (level, input) across CPython builds (same bundled zlib
    algorithm), which is what lets a driver gate pin keep/drop
    decisions with comfortable margins."""
    import pandas as pd  # noqa: F401 (typing of the UDF)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _zr(texts):
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, level)) / len(raw)

        return texts.map(one)

    return docs.withColumn(ratio_col, _zr(F.col(text_col)))


def filter_corpus(
    docs: DataFrame,
    rules: dict[str, tuple[float | None, float | None]] | None = None,
    text_col: str = "text",
    keep_signals: bool = False,
    tokens_col: str | None = None,
) -> DataFrame:
    """Keep documents whose signals fall inside every rule's
    [min, max] range. A NULL signal fails any bounded rule on it (an
    empty doc has no business in a training corpus). Unknown rule keys
    raise — a typo must not silently disable a filter.

    ``tokens_col`` reuses a precomputed token-array column (skipping
    the tokenize). Only the source columns the RULED signals read are
    built (unless ``keep_signals``, which returns all signals): with
    token-only rules and ``tokens_col`` set, ``text_col`` need not
    even exist — a persisted (id, tokens) relation is a valid input.
    """
    rules = DEFAULT_RULES if rules is None else rules
    sig = _signal_cols()
    unknown = rules.keys() - sig.keys()
    if unknown:
        raise ValueError(f"unknown quality signals: {sorted(unknown)}")
    if keep_signals:
        needs = frozenset(_SIGNAL_SOURCE.values())
    else:
        needs = frozenset(_SIGNAL_SOURCE[n] for n in rules)
    annotated = _materialize(
        docs, text_col, tokens_col=tokens_col, needs=needs
    ).select(
        *docs.columns,
        *[
            c.alias(f"_q_{n}")
            for n, c in sig.items()
            if _SIGNAL_SOURCE[n] in needs
        ],
    )
    pred = F.lit(True)
    for name, (lo, hi) in rules.items():
        c = F.col(f"_q_{name}")
        if lo is not None:
            pred = pred & (c >= lo)
        if hi is not None:
            pred = pred & (c <= hi)
        if lo is not None or hi is not None:
            pred = pred & c.isNotNull()
    out = _fence(annotated).filter(pred)
    if keep_signals:
        return out.select(
            *docs.columns,
            *[F.col(f"_q_{n}").alias(n) for n in sig],
        )
    return out.select(*docs.columns)
