"""Mergeable sketches (operators/sketches.py): error bounds vs exact,
merge laws, exact regimes, serialization, and the distributed builders
over real DataFrames.

Bound tests use fixed-seed data so a red run is a real regression, not
draw luck; hypothesis covers the merge laws over arbitrary partition
splits (pinning policy per tests/conftest.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.sketches import (
    HllSketch,
    KllSketch,
    KmvSketch,
    MgSketch,
    SketchGuaranteeError,
    heavy_hitters_exact,
    hll_build,
    kll_build,
    kmv_build,
    load_sketch,
    mg_build,
    save_sketch,
)


def _u64(seed: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 63, size=n, dtype=np.int64).astype(np.uint64) * np.uint64(2) + np.uint64(1)


# ---------------------------------------------------------------- KMV
def test_kmv_exact_regime():
    h = np.unique(_u64(1, 1000))
    sk = KmvSketch(4096).add_hashes(h)
    assert not sk.full
    assert sk.estimate() == float(len(h))


def test_kmv_estimate_bound_full():
    # 200k distinct hashes, k=1024: relative error well under 5/sqrt(k)
    h = np.unique(_u64(2, 200_000))
    sk = KmvSketch(1024).add_hashes(h)
    assert sk.full
    rel = abs(sk.estimate() - len(h)) / len(h)
    assert rel < 5 / math.sqrt(1024), rel


def test_kmv_merge_equals_oneshot():
    h = np.unique(_u64(3, 50_000))
    one = KmvSketch(512).add_hashes(h)
    parts = np.array_split(h, 7)
    merged = KmvSketch(512)
    for p in parts:
        merged = merged.merge(KmvSketch(512).add_hashes(p))
    assert np.array_equal(one.hashes, merged.hashes)
    assert one.estimate() == merged.estimate()


def test_kmv_jaccard_and_intersection():
    a = np.unique(_u64(4, 30_000))
    # overlap spread across the hash space (a[::2]), NOT a prefix of
    # the sorted hashes — a prefix would concentrate the overlap in
    # exactly the bottom-k region both sketches retain and bias the
    # common-threshold estimator by construction
    b = np.unique(np.concatenate([a[::2], np.unique(_u64(5, 15_000))]))
    ska = KmvSketch(2048).add_hashes(a)
    skb = KmvSketch(2048).add_hashes(b)
    true_i = len(np.intersect1d(a, b))
    true_u = len(np.union1d(a, b))
    assert abs(ska.jaccard(skb) - true_i / true_u) < 0.05
    est_i = ska.intersection_estimate(skb)
    assert abs(est_i - true_i) / true_i < 0.15


def test_kmv_jaccard_exact_when_not_full():
    a = np.unique(_u64(6, 500))
    b = np.concatenate([a[:250], np.unique(_u64(7, 250))])
    b = np.unique(b)
    ska = KmvSketch(4096).add_hashes(a)
    skb = KmvSketch(4096).add_hashes(b)
    assert ska.jaccard(skb) == len(np.intersect1d(a, b)) / len(
        np.union1d(a, b)
    )


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(1, 1 << 62), min_size=0, max_size=400),
       st.integers(1, 6))
def test_kmv_merge_order_insensitive(vals, nsplit):
    h = np.unique(np.asarray(vals, dtype=np.uint64)) if vals else np.empty(0, np.uint64)
    one = KmvSketch(64).add_hashes(h)
    acc = KmvSketch(64)
    for p in np.array_split(h, nsplit):
        acc = KmvSketch(64).add_hashes(p).merge(acc)  # reversed order too
    assert np.array_equal(one.hashes, acc.hashes)


def test_kmv_k_mismatch_raises():
    with pytest.raises(ValueError, match="k mismatch"):
        KmvSketch(64).merge(KmvSketch(128))


# ---------------------------------------------------------------- HLL
def test_hll_error_bound():
    # standard error 1.04/sqrt(m); assert 4 sigma at p=12 over 150k
    h = np.unique(_u64(8, 150_000))
    sk = HllSketch(12).add_hashes(h)
    rel = abs(sk.estimate() - len(h)) / len(h)
    assert rel < 4 * 1.04 / math.sqrt(1 << 12), rel


def test_hll_small_range_linear_counting():
    h = np.unique(_u64(9, 300))
    sk = HllSketch(12).add_hashes(h)
    # linear-counting regime: near-exact for n << m
    assert abs(sk.estimate() - len(h)) / len(h) < 0.05


def test_hll_merge_equals_oneshot():
    h = np.unique(_u64(10, 80_000))
    one = HllSketch(11).add_hashes(h)
    merged = HllSketch(11)
    for p in np.array_split(h, 5):
        merged = merged.merge(HllSketch(11).add_hashes(p))
    assert np.array_equal(one.regs, merged.regs)


def test_hll_rho_exact_near_power_boundaries():
    # values whose suffix starts with exactly r zero bits; float log2
    # would misrank these — the unpackbits path must not
    p = 8
    for r in (1, 5, 20, 40, 55):
        h = np.array([np.uint64(1) << np.uint64(64 - p - r)], dtype=np.uint64)
        sk = HllSketch(p).add_hashes(h)
        assert int(sk.regs.max()) == r, (r, int(sk.regs.max()))


def test_hll_all_zero_suffix_max_rho():
    p = 8
    h = np.array([np.uint64(0b10110101) << np.uint64(56)], dtype=np.uint64)
    sk = HllSketch(p).add_hashes(h)
    assert int(sk.regs.max()) == 64 - p + 1


def test_hll_rho_differential_vs_unpackbits():
    # the byte-lookup lz path must agree with a naive full unpackbits
    # rho on random and adversarial inputs
    p = 12
    rng = np.random.default_rng(33)
    h = rng.integers(-(1 << 63), 1 << 63, size=20_000, dtype=np.int64).astype(
        np.uint64
    )
    # adversarial: single-bit words at every position
    h = np.concatenate(
        [h, (np.uint64(1) << np.arange(64, dtype=np.uint64))]
    )
    got = HllSketch(p).add_hashes(h).regs
    w = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    bits = np.unpackbits(w.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1)
    allzero = bits.max(axis=1) == 0
    rho = np.where(allzero, 64 - p + 1, bits.argmax(axis=1) + 1)
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    want = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(want, bucket, rho.astype(np.uint8))
    assert np.array_equal(got, want)


def test_hll_p_validation():
    with pytest.raises(ValueError):
        HllSketch(3)
    with pytest.raises(ValueError):
        HllSketch(19)


# ---------------------------------------------------------------- KLL
def test_kll_exact_regime():
    vals = np.arange(1000, dtype=np.float64)
    rng = np.random.default_rng(11)
    rng.shuffle(vals)
    sk = KllSketch(2048).update_many(vals)
    for phi in (0.01, 0.25, 0.5, 0.75, 0.99):
        expect = np.sort(vals)[max(1, math.ceil(phi * 1000)) - 1]
        assert sk.quantile(phi) == expect, phi


def test_kll_rank_error_bound():
    # 100k values, k=200: empirical rank error comfortably under 3/k
    n = 100_000
    rng = np.random.default_rng(12)
    vals = rng.normal(size=n)
    sk = KllSketch(200).update_many(vals)
    svals = np.sort(vals)
    worst = 0.0
    for phi in np.linspace(0.05, 0.95, 19):
        q = sk.quantile(float(phi))
        true_rank = np.searchsorted(svals, q, side="right") / n
        worst = max(worst, abs(true_rank - phi))
    assert worst < 3.0 / 200 * 3, worst  # 3x slack on the 1/k-ish bound


def test_kll_merge_vs_oneshot_error():
    n = 60_000
    rng = np.random.default_rng(13)
    vals = rng.exponential(size=n)
    merged = KllSketch(200)
    for p in np.array_split(vals, 9):
        merged = merged.merge(KllSketch(200).update_many(p))
    assert merged.n == n
    svals = np.sort(vals)
    for phi in (0.1, 0.5, 0.9):
        q = merged.quantile(phi)
        true_rank = np.searchsorted(svals, q, side="right") / n
        assert abs(true_rank - phi) < 0.05


def test_kll_nan_excluded_and_empty_raises():
    sk = KllSketch(64).update_many(np.array([np.nan, np.nan]))
    assert sk.n == 0
    with pytest.raises(ValueError, match="empty"):
        sk.quantile(0.5)


def test_kll_phi_validation():
    sk = KllSketch(64).update_many(np.array([1.0]))
    with pytest.raises(ValueError):
        sk.quantile(1.5)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=300))
def test_kll_exact_regime_any_values(vals):
    sk = KllSketch(512).update_many(np.asarray(vals))
    sv = np.sort(np.asarray(vals, dtype=np.float64))
    for phi in (0.0, 0.5, 1.0):
        assert sk.quantile(phi) == sv[max(1, math.ceil(phi * len(vals))) - 1]


# ----------------------------------------------------------------- MG
def test_mg_exact_regime_any_merge_order():
    counts = {f"t{i}": 10 * (i + 1) for i in range(20)}
    one = MgSketch(64).add_counts(counts)
    left = MgSketch(64).add_counts({k: v for k, v in list(counts.items())[:7]})
    right = MgSketch(64).add_counts({k: v for k, v in list(counts.items())[7:]})
    assert one.counters == left.merge(right).counters == right.merge(left).counters
    assert one.counters == counts  # exact: no decrement fired


def test_mg_undercount_bound():
    # zipf-ish stream: every estimate within n/(k+1) of truth
    rng = np.random.default_rng(14)
    stream = rng.zipf(1.3, size=50_000)
    stream = stream[stream < 5000].astype(str)
    true: dict = {}
    for s in stream:
        true[s] = true.get(s, 0) + 1
    sk = MgSketch(32)
    for chunk in np.array_split(stream, 11):
        c: dict = {}
        for s in chunk:
            c[s] = c.get(s, 0) + 1
        sk = sk.merge(MgSketch(32).add_counts(c))
    bound = sk.error_bound()
    assert sk.n == len(stream)
    for key, est in sk.counters.items():
        assert est <= true[key] <= est + bound, key
    # survival guarantee: anything above the bound is in the sketch
    for key, cnt in true.items():
        if cnt > bound:
            assert key in sk.counters, (key, cnt, bound)


def test_mg_reduce_keeps_k():
    sk = MgSketch(3).add_counts({str(i): i + 1 for i in range(10)})
    assert len(sk.counters) <= 3
    assert sk.n == sum(range(1, 11))


# ------------------------------------------------------ serialization
@pytest.mark.parametrize("make", [
    lambda: KmvSketch(256).add_hashes(np.unique(_u64(20, 5000))),
    lambda: HllSketch(10).add_hashes(_u64(21, 5000)),
    lambda: KllSketch(128).update_many(np.random.default_rng(22).normal(size=5000)),
    lambda: MgSketch(16).add_counts({f"k{i}": i * 3 + 1 for i in range(40)}),
])
def test_roundtrip_bytes(make):
    sk = make()
    back = type(sk).from_bytes(sk.to_bytes())
    assert type(back) is type(sk)
    if isinstance(sk, KmvSketch):
        assert np.array_equal(sk.hashes, back.hashes) and sk.k == back.k
    elif isinstance(sk, HllSketch):
        assert np.array_equal(sk.regs, back.regs) and sk.p == back.p
    elif isinstance(sk, KllSketch):
        assert sk.n == back.n and sk.compactors == back.compactors
        assert sk.quantile(0.5) == back.quantile(0.5)
    else:
        assert sk.counters == back.counters and sk.n == back.n


def test_mg_roundtrip_hostile_keys():
    # corpus strings are arbitrary: newlines, tabs, unicode, empties
    sk = MgSketch(8).add_counts(
        {"a\nb": 5, "t\tab": 3, "": 2, "ünï\x00code": 7, "plain": 1}
    )
    back = MgSketch.from_bytes(sk.to_bytes())
    assert back.counters == sk.counters and back.n == sk.n


def test_from_bytes_rejects_wrong_tag():
    with pytest.raises(ValueError):
        KmvSketch.from_bytes(b"HLL1 10\n" + b"\0" * 1024)


_FUZZ_BLOBS = {
    "kmv": lambda: KmvSketch(64).add_hashes(
        np.arange(1, 100, dtype=np.uint64)
    ).to_bytes(),
    "hll": lambda: HllSketch(8).add_hashes(
        np.arange(1, 100, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    ).to_bytes(),
    "kll": lambda: KllSketch(64).update_many(
        np.arange(100, dtype=float)
    ).to_bytes(),
    "mg": lambda: MgSketch(8).add_counts({"a": 3, "b": 2, "ü\n": 7}).to_bytes(),
}
_FUZZ_CLS = {
    "kmv": KmvSketch, "hll": HllSketch, "kll": KllSketch, "mg": MgSketch,
}


@settings(max_examples=120, deadline=None)
@given(
    st.sampled_from(sorted(_FUZZ_BLOBS)),
    st.integers(0, 2),
    st.integers(0, 1 << 30),
    st.integers(0, 255),
)
def test_from_bytes_hostile_mutations_stay_typed(name, op, pos, val):
    """Every single-byte flip/delete/insert of a valid blob either
    parses or raises ValueError — never IndexError/struct.error/etc.
    (the typed-boundary contract every byte parser in this repo
    holds).  The MG struct.error and the HLL gigabit-header
    allocation were caught by exactly this fuzz shape."""
    blob = bytearray(_FUZZ_BLOBS[name]())
    if op == 0:
        blob[pos % len(blob)] = val
    elif op == 1:
        del blob[pos % len(blob)]
    else:
        blob.insert(pos % (len(blob) + 1), val)
    try:
        _FUZZ_CLS[name].from_bytes(bytes(blob))
    except ValueError:
        pass  # typed — includes UnicodeDecodeError


def test_hll_hostile_header_does_not_allocate():
    # a lying p must fail BEFORE materializing 2^p registers
    with pytest.raises(ValueError, match="out of range"):
        HllSketch.from_bytes(b"HLL1 1000000000\n" + b"\0" * 64)


def test_kmv_rejects_unsorted_payload():
    good = KmvSketch(64).add_hashes(np.arange(1, 50, dtype=np.uint64))
    blob = bytearray(good.to_bytes())
    nl = bytes(blob).index(b"\n")
    # swap two hash words -> decreasing pair (uint64-wrap-safe check)
    blob[nl + 1: nl + 9], blob[nl + 9: nl + 17] = (
        blob[nl + 9: nl + 17], blob[nl + 1: nl + 9],
    )
    with pytest.raises(ValueError, match="sorted-unique"):
        KmvSketch.from_bytes(bytes(blob))


# ------------------------------------------- distributed builders
@pytest.fixture(scope="module")
def docs(spark):
    from data_governance_spark.tables import table

    return table(spark, "/root/testdata/sf0.01", "documents")


def test_kmv_build_exact_on_doc_ids(spark, docs):
    sk = kmv_build(docs, "doc_id", k=8192)
    assert sk.estimate() == float(docs.select("doc_id").distinct().count())


def test_kmv_build_full_regime(spark, docs):
    sk = kmv_build(docs, "doc_id", k=64)
    true = docs.select("doc_id").distinct().count()
    assert sk.full
    assert abs(sk.estimate() - true) / true < 5 / math.sqrt(64)


def test_hll_build_on_text(spark, docs):
    sk = hll_build(docs, "text", p=12)
    true = docs.where("text is not null").select("text").distinct().count()
    assert abs(sk.estimate() - true) / true < 0.05


def test_kll_build_matches_exact_median(spark, docs):
    from pyspark.sql import functions as F

    lens = docs.where("text is not null").select(
        F.length("text").alias("v")
    )
    sk = kll_build(lens, "v", k=4096)  # exact regime at this SF
    vals = np.sort(np.array([r[0] for r in lens.collect()], dtype=float))
    n = len(vals)
    assert sk.n == n
    assert sk.quantile(0.5) == vals[max(1, math.ceil(0.5 * n)) - 1]


def test_kmv_grouped_exact_and_merges(spark, docs):
    from pyspark.sql import functions as F

    from data_governance_spark.operators.sketches import kmv_grouped

    rows = kmv_grouped(docs, "lang", "text", k=8192).collect()
    want = {
        r["lang"]: r["nd"]
        for r in docs.where("text is not null")
        .groupBy("lang")
        .agg(F.countDistinct("text").alias("nd"))
        .collect()
    }
    got = {r["lang"]: r["n_distinct"] for r in rows}
    assert got == {kk: float(v) for kk, v in want.items()}
    # the artifact property: group blobs merge to the corpus distinct
    merged = KmvSketch(8192)
    for r in rows:
        merged = merged.merge(KmvSketch.from_bytes(bytes(r["sketch"])))
    total = docs.where("text is not null").select("text").distinct().count()
    assert merged.estimate() == float(total)


def test_kll_grouped_quantile_exact_regime(spark, docs):
    from pyspark.sql import functions as F

    from data_governance_spark.operators.sketches import (
        kll_grouped_quantile,
    )

    lens = docs.where("text is not null").select(
        "lang", F.length("text").alias("v")
    )
    got = {
        r["lang"]: r["q"]
        for r in kll_grouped_quantile(lens, "lang", "v", 0.5, k=4096).collect()
    }
    rows = lens.collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(float(r["v"]))
    for lang, vals in by_lang.items():
        vals.sort()
        expect = vals[max(1, math.ceil(0.5 * len(vals))) - 1]
        assert got[lang] == expect, lang


def test_heavy_hitters_exact_matches_groupby(spark, docs):
    from pyspark.sql import functions as F

    toks = docs.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("t")
    ).where("t <> ''")
    got = heavy_hitters_exact(toks, "t", topn=5, k=512, strict=True)
    want = (
        toks.groupBy(F.col("t").alias("value"))
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("value"))
        .limit(5)
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_heavy_hitters_strict_raises_when_unproven(spark):
    # 600 distinct keys, each once, k=8: nothing clears n/(k+1)
    df = spark.range(600).selectExpr("cast(id as string) as v")
    with pytest.raises(SketchGuaranteeError):
        heavy_hitters_exact(df, "v", topn=3, k=8, strict=True)


def test_save_load_sketch(spark, tmp_path, docs):
    sk = kmv_build(docs, "doc_id", k=1024)
    path = str(tmp_path / "kmv_state")
    save_sketch(spark, sk, path)
    back = load_sketch(spark, path)
    assert isinstance(back, KmvSketch)
    assert np.array_equal(back.hashes, sk.hashes)
    # the daily-increment shape: merge persisted state with new data
    merged = back.merge(kmv_build(docs.limit(10), "doc_id", k=1024))
    assert merged.estimate() == sk.estimate()  # subset adds nothing
