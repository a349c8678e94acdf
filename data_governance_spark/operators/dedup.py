"""Near-duplicate detection sketches: MinHash+LSH and SimHash.

Both are fully JVM-side (xxhash64 + hash aggregates) so they scale
linearly; candidate generation is always an equi-join on a band/bucket
key — never an all-pairs comparison. These complement the exact paths
in queries/documents.py (exact groupBy dedup, md5 fingerprints,
rare-shingle Jaccard).

Implementation note (scale): signatures are computed as
explode(features) -> N hash columns -> groupBy(min/sum) rather than
per-row array lambdas. Hash aggregates get partial (map-side) combine
and whole-stage codegen; nested higher-order array functions do not —
an earlier lambda formulation recomputed the shingle array once per
hash seed and was ~100x slower.

MinHash: k permutations approximated by xxhash64(seed, shingle); the
estimated Jaccard of two docs is the fraction of matching minima.
Banding (b bands of r rows, k = b*r) makes the candidate probability
an S-curve around (1/b)^(1/r).

SimHash: 64-bit signature where bit j is the sign of the sum over
tokens of ±1 by the token hash's bit j; near-dups have small Hamming
distance. Candidates via 4x16-bit chunk blocking (any equal chunk).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_governance_spark.cache import column_memo, tracked_persist


def _cap_buckets(
    banded: DataFrame, keys: list[str], max_bucket_size: int | None
) -> DataFrame:
    """Drop LSH buckets larger than ``max_bucket_size`` before the
    self-join. A bucket of n members emits n(n-1)/2 candidate pairs —
    quadratic in per-bucket duplication, the one place sketch dedup can
    blow up at corpus scale (mass-duplicated boilerplate all lands in
    the same bucket). Oversized buckets are almost always exact-dup
    clusters or degenerate features (empty text); handle those with
    exact_precluster / d04 clusters instead of pair enumeration.
    None = uncapped."""
    if max_bucket_size is None:
        return banded
    small = (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_bucket_size)
        .select(*keys)
    )
    return banded.join(small, keys, "left_semi")


def exact_precluster(
    docs: DataFrame, fingerprint_col: Column, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Collapse exact-duplicate documents before sketching.

    Returns (canonical_docs, mapping) where mapping is
    (id_col, canon_id): every doc points to the min-id member of its
    fingerprint cluster, and canonical_docs keeps one row per cluster.
    Run the near-dup sketch on canonical_docs (cuts the quadratic
    bucket blow-up at its source: k exact copies contribute ONE bucket
    member instead of k) and expand sketch pairs through the mapping if
    per-copy pairs are needed."""
    # NULL fingerprints (e.g. md5 of NULL text) must not vanish in the
    # equi-join: such docs pass through as their own canonical
    m = docs.select(
        F.col(id_col),
        F.coalesce(
            fingerprint_col, F.concat(F.lit("\0null-fp:"), F.col(id_col).cast("string"))
        ).alias("_fp"),
    )
    canon = m.groupBy("_fp").agg(F.min(id_col).alias("canon_id"))
    # canon has one row per DISTINCT fingerprint — corpus-sized, so this
    # is a shuffle equi-join on _fp, never a broadcast
    mapping = m.join(canon, "_fp").select(id_col, "canon_id")
    canonical = docs.join(
        mapping.filter(F.col(id_col) == F.col("canon_id")).select(id_col),
        id_col,
        "left_semi",
    )
    return canonical, mapping


def minhash_signatures(
    docs: DataFrame,
    shingles_col: Column,
    id_col: str = "doc_id",
    num_hashes: int = 64,
) -> DataFrame:
    """(doc_id, sig: array<long>[num_hashes]) MinHash signatures.

    One shuffle: explode distinct shingles, hash once per seed as flat
    columns, min-aggregate per doc. Docs with zero shingles drop out.
    """
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles_col)).alias("sh"),
    )
    # hash the variable-length shingle string ONCE, then derive the k
    # permutations by re-hashing the resulting 8-byte long (a standard
    # universal-hashing family) — k x cheaper than k string hashes,
    # and codegen subexpression elimination shares the inner hash.
    # The three k-wide projections below are pure functions of
    # num_hashes over fixed internal names — memoized per context
    # (column_memo): several gates build signatures in one process and
    # each k-wide list costs hundreds of py4j round trips.
    pre = sh.select("doc_id", F.xxhash64("sh").alias("h"))
    hashed = pre.select(
        "doc_id",
        *column_memo(
            ("mh_hashed", num_hashes),
            lambda: [
                F.xxhash64(F.lit(i), F.col("h")).alias(f"h{i}")
                for i in range(num_hashes)
            ],
        ),
    )
    agg = hashed.groupBy("doc_id").agg(
        *column_memo(
            ("mh_agg", num_hashes),
            lambda: [F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)],
        )
    )
    return agg.select(
        "doc_id",
        column_memo(
            ("mh_sig_array", num_hashes),
            lambda: F.array(
                *[F.col(f"h{i}") for i in range(num_hashes)]
            ).alias("sig"),
        ),
    )


def minhash_bands(sig: Column, bands: int = 16, rows: int = 4) -> Column:
    """array<struct<band:int, key:long>> — one LSH bucket key per band."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[sig[b * rows + r] for r in range(rows)]).alias("key"),
            )
            for b in range(bands)
        ]
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    shingles_col: Column,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs with estimated Jaccard >= threshold.

    Plan shape: signature scan -> explode bands -> self equi-join on
    (band, key) -> distinct pairs -> estimate from signatures.
    ``max_bucket_size`` caps the per-bucket pair blow-up (_cap_buckets).
    """
    if bands < 1 or bands > num_hashes:
        raise ValueError(
            f"bands must be in [1, num_hashes]; got bands={bands}, "
            f"num_hashes={num_hashes}"
        )
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}) — a "
            "non-divisor would silently drop the trailing hashes and "
            "shift the LSH S-curve"
        )
    if threshold > 1.0:
        # estimated Jaccard is matching-hash-count / num_hashes <= 1.0,
        # so a threshold above 1 provably emits zero pairs — skip the
        # signature computation entirely (callers use threshold=1.01 to
        # disable the sketch stage while keeping the pipeline shape,
        # e.g. an exact-oracle gate over prepare_corpus). limit(0) over
        # the typed projection keeps the exact output schema and is
        # folded to an empty relation by OptimizeLimitZero — no scan.
        return docs.select(
            F.col(id_col).alias("doc_a"),
            F.col(id_col).alias("doc_b"),
            # None-cast, not lit(0.0): keeps the column NULLABLE like
            # the real path's join-derived estimate, so the schemas are
            # byte-identical (the frame is empty either way)
            F.lit(None).cast("double").alias("est_jaccard"),
        ).limit(0)
    rows = num_hashes // bands
    # signatures feed the band join AND two estimate joins — persist so
    # the explode+64-hash aggregation runs once, not three times
    sigs = tracked_persist(minhash_signatures(docs, shingles_col, id_col, num_hashes))
    banded = sigs.select(
        "doc_id",
        column_memo(
            ("mh_banded", bands, rows),
            lambda: F.explode(
                minhash_bands(F.col("sig"), bands, rows)
            ).alias("bk"),
        ),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    banded = _cap_buckets(banded, ["band", "key"], max_bucket_size)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = column_memo(
        ("mh_est", num_hashes),
        lambda: F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(float(num_hashes)),
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(est, 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def simhash_signatures(
    docs: DataFrame, tokens_col: Column, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, sig: long) 64-bit SimHash signatures.

    Term frequency weights naturally via explode (duplicate tokens
    contribute once each). Bit j = sign of sum over tokens of
    (bit j of xxhash64(token) ? +1 : -1).
    """
    tok = docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens_col).alias("t"))

    # the three 64-wide projections are pure functions of fixed internal
    # names — memoized per context (hundreds of py4j round trips each)
    def _bits_cols():
        h = F.xxhash64(F.col("t"))
        return [
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{j}")
            for j in range(64)
        ]

    bits = tok.select("doc_id", *column_memo(("sh_bits",), _bits_cols))
    agg = bits.groupBy("doc_id").agg(
        *column_memo(
            ("sh_agg",),
            lambda: [F.sum(f"b{j}").alias(f"b{j}") for j in range(64)],
        )
    )

    # disjoint bit values sum to the OR of the bits; bit 63 is the signed
    # long's min value, which two's-complement addition handles correctly
    def _sig_col():
        sig = F.lit(0).cast("long")
        for j in range(64):
            bit_val = (1 << j) if j < 63 else -(1 << 63)
            sig = sig + F.when(
                F.col(f"b{j}") > 0, F.lit(bit_val).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return sig.alias("sig")

    return agg.select("doc_id", column_memo(("sh_sig",), _sig_col))


def simhash_chunks(sig: Column, n_chunks: int = 4) -> Column:
    """n_chunks equal bit-slices of the signature (struct array).

    Pigeonhole: two signatures within Hamming distance n_chunks-1
    MUST share at least one chunk — pick n_chunks > max_hamming for
    guaranteed recall. More chunks = smaller keys = bigger candidate
    buckets (the recall/cost dial: 4x16-bit scales furthest, 8x8-bit
    guarantees recall for distance<=7 but keys collide 256x more)."""
    width = 64 // n_chunks
    mask = (1 << width) - 1
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright(sig, i * width).bitwiseAND(F.lit(mask)).alias("key"),
            )
            for i in range(n_chunks)
        ]
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dedup_pairs(
    docs: DataFrame,
    tokens_col: Column,
    id_col: str = "doc_id",
    max_hamming: int = 8,
    n_chunks: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs with Hamming(simhash) <= max_hamming,
    blocked on equal signature chunks (guaranteed recall for distance
    <= n_chunks-1; probabilistic beyond — see simhash_chunks).
    ``max_bucket_size`` caps the per-bucket pair blow-up (_cap_buckets)."""
    # both sides of the chunk self-join read the signatures — persist
    sigs = tracked_persist(simhash_signatures(docs, tokens_col, id_col))
    chunked = sigs.select(
        "doc_id",
        "sig",
        column_memo(
            ("sh_chunked", n_chunks),
            lambda: F.explode(
                simhash_chunks(F.col("sig"), n_chunks)
            ).alias("ck"),
        ),
    ).select(
        "doc_id", "sig", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key")
    )
    chunked = _cap_buckets(chunked, ["chunk", "key"], max_bucket_size)
    a = chunked.alias("a")
    b = chunked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming64(F.col("a.sig"), F.col("b.sig")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
