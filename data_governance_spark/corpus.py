"""The training-corpus preparation pipeline as one composable call.

``prepare_corpus`` chains the engine's corpus operators in the order
every published web-corpus pipeline uses them — cheapest and most
selective first, shuffle-bearing stages only after the row count has
been cut down:

    [URL filter] -> [html_to_text] -> [C4 line cleaning]
    -> [global line dedup] -> quality filter -> [decontamination]
    -> PII redaction
    -> exact precluster -> MinHash near-dup -> component closure
    -> canonical selection -> holdout split -> sequence packing

Each stage is the real operator (operators/*, functions/html.py); this
module adds no logic of its own beyond wiring and defaults. All knobs
surface as keyword arguments and every intermediate worth inspecting
is returned.

Execution model (honest, not "fully lazy"): the component-closure
stage (``connected_components``) is iterative — it runs Spark jobs AT
CALL TIME (per-round localCheckpoint + convergence count). Everything
upstream of it therefore executes during ``prepare_corpus`` itself,
which is why ``persist_clean=True`` (default) persists the filtered+
scrubbed corpus first: without it each closure round would recompute
html_to_text + the quality signals + the PII regexes from the raw
scan. The dedup stage ALSO caches internally (``minhash_dedup_pairs``
tracked-persists its signature DataFrame). The caller owns the
release: call ``result.release()`` when done — it unpersists ``clean``
and exactly the tracked persists THIS run created (captured via
``cache.tracked_mark``/``tracked_since``), so repeated invocations on
a long-lived session don't accumulate persisted RDDs and concurrent
results' caches stay untouched. (Or pass ``persist_clean=False`` and
manage ``cache.release_caches()`` yourself.)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_governance_spark.functions.html import html_to_text
from data_governance_spark.functions.text import tokens, word_shingles
from data_governance_spark.operators.decontam import decontaminate
from data_governance_spark.operators.lines import (
    clean_lines,
    dedup_lines_global,
)
from data_governance_spark.operators.urlfilter import (
    filter_domains,
    filter_url_patterns,
)
from data_governance_spark.operators.components import (
    connected_components,
    keep_canonical,
)
from data_governance_spark.operators.dedup import (
    exact_precluster,
    minhash_dedup_pairs,
)
from data_governance_spark.operators.packing import pack_sequences
from data_governance_spark.operators.pii import redact_pii
from data_governance_spark.operators.quality import filter_corpus
from data_governance_spark.operators.sampling import hash_split

DEFAULT_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


@dataclass
class CorpusResult:
    """Lazy stage outputs of ``prepare_corpus``."""

    clean: DataFrame  # quality-filtered, PII-redacted documents
    dup_pairs: DataFrame  # near-dup (doc_a, doc_b) pairs incl. exact
    kept: DataFrame  # one canonical survivor per dup cluster
    split: DataFrame  # kept + 'split' assignment column
    packed: DataFrame  # (split, doc, pack_bucket, pack_id, pack_offset)
    _caches: list[DataFrame] | None = None  # this run's tracked persists

    def report(self) -> dict:
        """The data-card numbers a corpus release ships with:
        clean/kept doc counts, dup-pair count, per-split doc and token
        totals, pack count. Only scalars reach the driver, but each
        stage is its own Spark JOB over that stage's lineage — with
        ``persist_clean=True`` (the default) the quality/PII work is
        read from cache, while ``dup_pairs.count()`` always replays the
        sketch band join. Call it BEFORE ``release()``, and expect one
        full pipeline recompute per stage if ``persist_clean=False``."""
        per_split = {
            r["split"]: {
                "docs": r["docs"],
                "tokens": r["tokens"],
                "packs": r["packs"],
            }
            for r in self.packed.groupBy("split")
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("n_tokens").alias("tokens"),
                F.countDistinct("pack_bucket", "pack_id").alias("packs"),
            )
            .collect()
        }
        return {
            "clean_docs": self.clean.count(),
            "dup_pairs": self.dup_pairs.count(),
            "kept_docs": self.kept.count(),
            "splits": per_split,
        }

    def release(self) -> None:
        """Release the caches THIS run created — the ``clean`` persist
        and the operator-internal tracked persists captured during the
        call (the MinHash signature DataFrame) — leaving other runs' and
        operators' caches alone. Call after the terminal action;
        re-evaluating the stage DataFrames afterwards stays correct,
        just uncached."""
        from data_governance_spark.cache import release_tracked

        try:
            self.clean.unpersist()
        except Exception:
            pass  # session stopped; nothing to release
        if self._caches:
            release_tracked(self._caches)
            self._caches = []


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    html: bool = False,
    html_tier: str = "regex",
    url_blocklist: list[str] | DataFrame | None = None,
    url_patterns: list[str] | None = None,
    url_col: str = "url",
    c4_lines: bool = False,
    dedup_lines: bool = False,
    dedup_substr_width: int | None = None,
    quality_rules: dict | None = None,
    compression_bounds: tuple[float, float] | None = None,
    classifier=None,
    min_quality_score: float = 0.5,
    perplexity_lm=None,
    perplexity_bounds: tuple[float, float] | None = None,
    perplexity_buckets: tuple[float, float] | None = None,
    perplexity_keep: tuple[str, ...] = ("head", "middle"),
    benchmark: DataFrame | None = None,
    decontam_n: int = 13,
    pii: bool = True,
    pii_passes: int = 2,
    shingle_n: int = 3,
    minhash_threshold: float = 0.5,
    minhash_hashes: int = 64,
    minhash_bands: int = 16,
    split_weights: dict[str, float] | None = None,
    max_tokens: int = 4096,
    num_buckets: int = 64,
    persist_clean: bool = True,
) -> CorpusResult:
    """Run the full preparation chain; see module docstring.

    ``html=True`` inserts HTML extraction first (WARC ``response``
    records): ``html_tier="regex"`` (default) is the scan-speed
    Catalyst tier (functions/html.html_to_text); ``"dom"`` is the
    Boilerpipe/jusText-shape main-content extractor
    (operators/htmldom.extract_main_text — Arrow-batched Python, drops
    nav/footer/link-dense boilerplate blocks, not just their tags).
    ``quality_rules=None`` means the Gopher defaults
    (operators/quality.DEFAULT_RULES). Splits are always packed with
    ``partition_cols=[split]`` so no pack mixes holdout splits.
    ``pii_passes`` defaults to 2 — the second pass catches adjacent
    items the boundary-guarded patterns miss in one pass (see
    operators/pii.redact_pii). ``benchmark`` (optional) drops documents
    sharing a ``decontam_n``-token gram with the eval set
    (operators/decontam.py), after the quality cut and before PII
    redaction. ``url_blocklist``/``url_patterns`` run the URL tier
    first (operators/urlfilter.py); passing either requires the corpus
    to carry ``url_col`` (targeted ValueError otherwise).
    ``c4_lines=True`` inserts the C4 line-level cleaning pass
    (operators/lines.py, published defaults) after extraction;
    ``dedup_lines=True`` adds cross-corpus boilerplate-line removal
    (``dedup_lines_global``) after it. ``dedup_substr_width=N`` adds
    the ExactSubstr tier (operators/exsubstr.py, Lee et al. 2022):
    duplicated N-token spans removed from all-but-first occurrence,
    after line dedup and before the quality cut.
    ``minhash_hashes``/``minhash_bands`` size the sketch
    (rows-per-band = hashes/bands sets the LSH S-curve; the 64/16
    default matches the published web-dedup configs).
    ``compression_bounds=(lo, hi)`` adds the zlib compression-ratio
    cut (Dolma/RedPajama tier) after the Catalyst quality rules —
    docs whose ratio falls outside [lo, hi] (or is NULL) drop.
    ``classifier=`` (an ``operators.textclf.TextClassifier``) adds the
    learned-quality tier after both: documents scoring below
    ``min_quality_score`` drop (the GPT-3-style discriminative filter;
    train one with ``fit_text_classifier`` against a high-quality
    reference corpus). ``perplexity_lm=`` (an
    ``operators.ngram_lm.NGramLM``) with ``perplexity_bounds=(lo, hi)``
    adds the KenLM-tier generative cut (CCNet): documents whose LM
    perplexity falls outside the band drop. ``perplexity_buckets=
    (q1, q2)`` instead buckets by COMPUTED perplexity quantile cutoffs
    into head/middle/tail (the paper's actual tercile method —
    ``operators.ngram_lm.bucket_by_perplexity``) and keeps the tiers
    in ``perplexity_keep`` (default head+middle, the published
    recipe); exactly one of bounds/buckets must accompany the LM.
    """
    from data_governance_spark.cache import tracked_mark, tracked_since

    mark = tracked_mark()
    # URL tier first: the cheapest cut a web pipeline has (row-local
    # predicates, no content inspection)
    if (url_blocklist is not None or url_patterns) and url_col not in docs.columns:
        raise ValueError(
            f"url_blocklist/url_patterns require column {url_col!r} "
            f"(url_col=) on the corpus; got columns {docs.columns}"
        )
    if url_blocklist is not None:
        docs = filter_domains(docs, url_blocklist, url_col=url_col, id_col=id_col)
    if url_patterns:
        docs = filter_url_patterns(docs, url_patterns, url_col=url_col)
    # validated UNCONDITIONALLY: a caller opting into the dom tier but
    # forgetting html=True must fail loud, not silently feed raw HTML
    # into the quality signals
    if html_tier not in ("regex", "dom"):
        raise ValueError(
            f"html_tier must be 'regex' or 'dom', got {html_tier!r}"
        )
    if html_tier != "regex" and not html:
        raise ValueError(
            "html_tier='dom' has no effect without html=True — pass "
            "html=True (or drop html_tier)"
        )
    if html:
        if html_tier == "regex":
            docs = docs.withColumn(text_col, html_to_text(text_col))
        else:
            from data_governance_spark.operators.htmldom import (
                extract_main_text,
            )

            docs = extract_main_text(docs, text_col=text_col)
    if c4_lines:
        # C4's order: line cleaning right after extraction, so the
        # doc-level Gopher signals see the rebuilt text
        docs = clean_lines(docs, text_col=text_col)
    if dedup_lines:
        # cross-corpus boilerplate removal (2 shuffles — the one
        # non-map-only pre-filter stage, hence opt-in)
        docs = dedup_lines_global(docs, id_col=id_col, text_col=text_col)
    if dedup_substr_width is not None:
        # ExactSubstr tier (Lee et al. 2022): remove duplicated
        # dedup_substr_width-token spans from all-but-first occurrence.
        # Runs with the other rewrite tiers, BEFORE the quality cut so
        # the Gopher signals score the deduplicated text (a page that
        # is 90% boilerplate should be judged on its own 10%).
        from data_governance_spark.operators.exsubstr import (
            dedup_substrings,
        )

        docs = dedup_substrings(
            docs, id_col=id_col, text_col=text_col,
            width=dedup_substr_width,
        )
    filtered = filter_corpus(docs, quality_rules, text_col=text_col)
    if compression_bounds is not None:
        # zlib-ratio cut (operators/quality.compression_ratio): the
        # one pandas-UDF stage in the chain — run it AFTER the
        # Catalyst-only rules so the Arrow transfer sees the smaller
        # surviving corpus; NULL ratios (empty docs) drop like every
        # bounded quality rule
        lo, hi = compression_bounds
        from data_governance_spark.operators.quality import (
            compression_ratio,
        )

        # reserved scratch name: a caller's own compression_ratio
        # column must survive untouched
        filtered = (
            compression_ratio(filtered, text_col=text_col, ratio_col="_zr_ratio")
            .filter(F.col("_zr_ratio").between(float(lo), float(hi)))
            .drop("_zr_ratio")
        )
    if perplexity_lm is not None:
        # KenLM-tier generative quality cut (operators/ngram_lm.py,
        # the CCNet method): map-only scoring against the broadcast
        # reference LM. Two published shapes — a hard band
        # (perplexity_bounds) or the paper's tercile bucketing on
        # computed cutoffs (perplexity_buckets + perplexity_keep).
        # One is mandatory: an LM without a cut filters nothing,
        # which is silently keeping everything.
        if perplexity_bounds is not None and perplexity_buckets is not None:
            raise ValueError(
                "pass perplexity_bounds OR perplexity_buckets, not "
                "both — a hard band and computed-quantile tiers are "
                "alternative cuts over the same score"
            )
        if perplexity_bounds is None and perplexity_buckets is None:
            raise ValueError(
                "perplexity_lm requires perplexity_bounds=(lo, hi) or "
                "perplexity_buckets=(q1, q2) — CCNet keeps the "
                "head/middle of the distribution"
            )
        if perplexity_bounds is not None:
            from data_governance_spark.operators.ngram_lm import perplexity

            plo, phi = perplexity_bounds
            filtered = (
                perplexity(filtered, perplexity_lm, text_col=text_col,
                           out_col="_ppl_score")
                .filter(F.col("_ppl_score").between(float(plo), float(phi)))
                .drop("_ppl_score")
            )
        else:
            # tercile bucketing: cutoffs computed on the corpus itself
            # (one sketch aggregate — runs Spark jobs AT CALL TIME,
            # like the other fitted tiers); scratch columns reserved
            from data_governance_spark.operators.ngram_lm import (
                bucket_by_perplexity,
            )

            labels = ("head", "middle", "tail")
            if len(perplexity_buckets) != 2:
                # validate HERE, in this function's own vocabulary —
                # letting it reach bucket_by_perplexity raises about a
                # 'labels' argument prepare_corpus does not expose
                raise ValueError(
                    f"perplexity_buckets must be exactly two quantiles "
                    f"(q1, q2) for the head/middle/tail tercile split, "
                    f"got {perplexity_buckets}"
                )
            keep = tuple(perplexity_keep)
            if not keep or not set(keep) <= set(labels):
                raise ValueError(
                    f"perplexity_keep must be a non-empty subset of "
                    f"{labels}, got {perplexity_keep}"
                )
            filtered = (
                bucket_by_perplexity(
                    filtered,
                    perplexity_lm,
                    text_col=text_col,
                    ppl_col="_ppl_score",
                    tier_col="_ppl_tier",
                    quantiles=perplexity_buckets,
                    labels=labels,
                )
                .filter(F.col("_ppl_tier").isin(*keep))
                .drop("_ppl_score", "_ppl_tier")
            )
    if classifier is not None:
        # learned-quality tier (operators/textclf.py, the fastText
        # shape): scored AFTER the cheap rule/ratio cuts so the
        # featurization join only sees survivors; docs scoring below
        # min_quality_score drop. Scratch columns are reserved names.
        from data_governance_spark.operators.textclf import predict_text

        filtered = (
            predict_text(
                filtered,
                classifier,
                id_col=id_col,
                text_col=text_col,
                score_col="_clf_score",
                label_col="_clf_label",
            )
            .filter(F.col("_clf_score") >= float(min_quality_score))
            .drop("_clf_score", "_clf_label")
        )
    if benchmark is not None:
        # decontaminate AFTER the quality cut (fewer docs to gram) and
        # BEFORE PII redaction (placeholders must not mask an overlap
        # with the raw eval text)
        filtered = decontaminate(
            filtered, benchmark, n=decontam_n,
            id_col=id_col, text_col=text_col,
        )
    clean = (
        redact_pii(filtered, text_col=text_col, passes=pii_passes)
        if pii
        else filtered
    )
    if persist_clean:
        # tracked: lands in result._caches (scoped release) AND in the
        # global registry, so registry-driven sweeps (bench, the
        # correctness gate) release it between queries like every other
        # operator-internal cache
        from data_governance_spark.cache import tracked_persist

        clean = tracked_persist(clean)

    canonical, mapping = exact_precluster(
        clean, F.md5(text_col), id_col=id_col
    )
    shingled = canonical.select(
        id_col, tokens(text_col).alias("_t")
    ).select(
        id_col,
        F.array_distinct(word_shingles(F.col("_t"), shingle_n)).alias("_sh"),
    )
    near = minhash_dedup_pairs(
        shingled,
        F.col("_sh"),
        id_col=id_col,
        num_hashes=minhash_hashes,
        bands=minhash_bands,
        threshold=minhash_threshold,
    ).select("doc_a", "doc_b")
    exact_pairs = mapping.filter(
        F.col(id_col) != F.col("canon_id")
    ).select(F.col(id_col).alias("doc_a"), F.col("canon_id").alias("doc_b"))
    dup_pairs = near.unionByName(exact_pairs)

    if minhash_threshold > 1.0:
        # Algebraic short-circuit: with the sketch stage disabled
        # (threshold > 1 provably emits no near pairs), dup_pairs ==
        # exact_pairs, and that edge set is a star forest by
        # construction — every doc points at the min-id member of its
        # fingerprint group, and ``mapping`` already labels EVERY
        # clean doc with that minimum (singletons with themselves).
        # The transitive closure of a star forest is itself, so the
        # closure result is ``mapping`` verbatim and the iterative
        # operator (eager edge-cache count + convergence rounds /
        # union-find collect AT CALL TIME) would recompute the whole
        # upstream quality chain just to relearn it. Skipping it keeps
        # prepare_corpus fully lazy in this regime; the real closure
        # still runs whenever the sketch stage can emit pairs.
        comp = mapping.select(
            F.col(id_col).alias("id"), F.col("canon_id").alias("comp")
        )
    else:
        comp = connected_components(
            dup_pairs, "doc_a", "doc_b",
            nodes=clean.select(id_col), node_col=id_col,
        )
    kept = keep_canonical(clean, comp, id_col=id_col)
    split = hash_split(
        kept, split_weights or DEFAULT_SPLITS, id_col
    )
    packed = pack_sequences(
        split,
        max_tokens=max_tokens,
        num_buckets=num_buckets,
        id_col=id_col,
        text_col=text_col,
        partition_cols=["split"],
    )
    return CorpusResult(
        clean=clean,
        dup_pairs=dup_pairs,
        kept=kept,
        split=split,
        packed=packed,
        _caches=tracked_since(mark),
    )


@dataclass
class MediaCorpusResult:
    """Stage outputs of ``prepare_media_corpus``. The stage
    DataFrames are lazy, but constructing the result runs one cheap
    aggregate job up front: ``media_repartition`` collects the total
    byte count to size partitions (a sum over payload lengths, not a
    decode)."""

    sized: DataFrame  # byte-budget repartitioned input
    exact_groups: DataFrame  # (media_id, canonical_id, group_size)
    kept: DataFrame  # one canonical row per byte-identical group
    features: DataFrame  # per-kept-row feature vectors
    near_pairs: DataFrame | None = None  # near-dup pairs among kept


def prepare_media_corpus(
    media: DataFrame,
    decoder: str = "fake",
    dim: int = 8,
    near_dedup: bool = False,
    near_threshold: float = 0.98,
    n_planes: int = 8,
    target_bytes: int = 128 << 20,
    max_block_size: int | None = None,
) -> MediaCorpusResult:
    """The multimodal counterpart of ``prepare_corpus``, same
    cheapest-first discipline: size partitions by BYTE budget (row
    counts are meaningless for binary columns), drop byte-identical
    duplicates while shuffling only (hash, id) — never the payloads —
    and only then run the expensive step (decode + feature extraction)
    over the canonical survivors. ``near_dedup=True`` additionally
    flags re-encode/minor-edit pairs among the survivors via the
    LSH-blocked cosine tier (``dedup_media_near``).

    Composition of gated operators (media_repartition,
    dedup_media_exact, extract_features: q45; cosine_neardup_pairs:
    e07) — this function adds ordering, not logic."""
    from data_governance_spark.cache import tracked_persist
    from data_governance_spark.operators.multimodal import (
        dedup_media_exact,
        dedup_media_near,
        extract_features,
        media_repartition,
    )

    sized = media_repartition(media, target_bytes)
    groups = dedup_media_exact(sized)
    canon = groups.filter(
        F.col("media_id") == F.col("canonical_id")
    ).select("media_id")
    kept = sized.join(canon, "media_id", "left_semi")
    feats = extract_features(kept, dim=dim, decoder=decoder)
    if near_dedup:
        # evaluating .features AND .near_pairs must decode once, not
        # twice — sharing the lazy DataFrame alone would re-run the
        # mapInPandas decode per action, so persist it (tracked: the
        # registry/caller releases via cache.release_tracked)
        feats = tracked_persist(feats)
    near = (
        dedup_media_near(
            kept,
            decoder=decoder,
            dim=dim,
            n_planes=n_planes,
            threshold=near_threshold,
            max_block_size=max_block_size,
            features=feats,
        )
        if near_dedup
        else None
    )
    return MediaCorpusResult(
        sized=sized,
        exact_groups=groups,
        kept=kept,
        features=feats,
        near_pairs=near,
    )
