"""Mergeable sketches — one-pass, bounded-state distributed summaries.

The 100 TB problem: COUNT(DISTINCT url), "p99 document length", and
"top tokens by frequency" are all trivially exact on one machine and
brutally expensive at corpus scale — exact distinct and exact heavy
hitters shuffle EVERY row on the key, and exact quantiles sort the
whole column.  The classical answer (Agarwal et al., "Mergeable
Summaries", PODS 2012) is a sketch: a small fixed-size state S(P) per
partition with a merge operator such that merge(S(A), S(B)) summarizes
A ∪ B within the same error bound.  Mergeability is exactly Spark's
aggregation contract, so every sketch here builds as

    JVM-side hash (``xxhash64``) → per-partition numpy partial
    (``mapPartitions``) → ``treeAggregate`` merge of the tiny states

— a map-only pass over the corpus plus a driver-side merge of
``num_partitions`` objects of a few KiB each.  No shuffle of raw
values, ever; the driver never holds keys, only summaries.  The
sketches are serializable (``save_sketch`` / ``load_sketch``) so the
daily-increment loop can persist yesterday's summary and merge
today's — the same state-artifact shape as ``bloom.save_bloom``.

Four summaries, all from their public papers:

- :class:`KmvSketch` — k-minimum-values / bottom-k theta sketch
  (Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007) for distinct
  counting AND set algebra: union / intersection / Jaccard of corpora
  summarized independently.  **Exact regime**: while fewer than k
  distinct hashes are seen the sketch stores all of them, so the
  estimate equals the true distinct count (up to 64-bit hash
  collisions, ~n²/2⁶⁵ — negligible and deterministic); the d05 'sk'
  gate pins this regime against a SQL ``COUNT(DISTINCT)``.
- :class:`HllSketch` — HyperLogLog (Flajolet et al., AofA 2007) with
  the standard small-range linear-counting correction; the 64-bit
  hash removes the large-range correction (Heule et al., EDBT 2013).
  6 KiB at p=12 for ~1.6 % relative error at any cardinality.
- :class:`KllSketch` — KLL quantile sketch (Karnin, Lang, Liberty,
  FOCS 2016): geometrically-capped compactor levels, O(k) space for
  uniform rank error ~1/k.  Unlike ``percentile_approx`` (a one-shot
  aggregate) the sketch is a REUSABLE artifact: persist, merge across
  days, query any quantile later.  Compaction coins are deterministic
  (per-level alternation) so builds are reproducible; the paper's
  random coin only tightens constants, the rank-error bound is
  asserted empirically in tests.  **Exact regime**: with total
  capacity ≥ n no compaction fires and quantiles are exact ranks.
- :class:`MgSketch` — Misra-Gries heavy hitters (Misra & Gries 1982)
  with the mergeable batch reduction of Agarwal et al. 2012:
  any item with true frequency > n/(k+1) is GUARANTEED to survive,
  and estimates undercount by at most n/(k+1).  **Exact regime**:
  while distinct keys ≤ k no decrement ever fires and counts are
  exact regardless of merge order.

:func:`heavy_hitters_exact` composes MG into the production shape:
map-only candidate pass → exact count of only the candidate keys
(the shuffle carries ≤ |candidates| × partitions partial rows, not
the corpus) → top-n, with the survival guarantee CHECKED against the
observed counts (``strict=True`` raises when the regime cannot be
proven).

No reference-parity citation: the reference has no sketch tier; this
is part of the extended training-data scope (corpus accounting,
dedup-rate dashboards, length-distribution monitoring at 100 TB).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "KmvSketch",
    "HllSketch",
    "KllSketch",
    "MgSketch",
    "SketchGuaranteeError",
    "kmv_build",
    "kmv_grouped",
    "hll_build",
    "kll_build",
    "kll_grouped_quantile",
    "mg_build",
    "heavy_hitters_exact",
    "save_sketch",
    "load_sketch",
]

_U64 = np.uint64
_TWO64 = float(1 << 64)


class SketchGuaranteeError(ValueError):
    """The requested exactness/completeness guarantee does not hold
    for the observed data (e.g. a top-n whose survival bound fails)."""


# --------------------------------------------------------------------------
# KMV / bottom-k theta
# --------------------------------------------------------------------------
class KmvSketch:
    """k smallest DISTINCT uint64 hashes, sorted ascending."""

    def __init__(self, k: int, hashes: np.ndarray | None = None):
        if k < 2:
            raise ValueError(f"kmv k must be >= 2, got {k}")
        self.k = k
        self.hashes = (
            np.empty(0, dtype=_U64) if hashes is None else hashes
        )

    def add_hashes(self, h: np.ndarray) -> "KmvSketch":
        if len(h):
            merged = np.union1d(self.hashes, h.astype(_U64))
            self.hashes = merged[: self.k]
        return self

    def merge(self, other: "KmvSketch") -> "KmvSketch":
        if other.k != self.k:
            raise ValueError(f"kmv k mismatch: {self.k} vs {other.k}")
        return KmvSketch(self.k, np.union1d(self.hashes, other.hashes)[: self.k])

    @property
    def full(self) -> bool:
        return len(self.hashes) >= self.k

    def _threshold(self) -> float:
        """Exclusive hash-space threshold below which the retained set
        is a COMPLETE sample of the distinct hashes."""
        return float(self.hashes[-1]) if self.full else _TWO64

    def estimate(self) -> float:
        """Distinct-count estimate: exact size when not full, else the
        classical (k-1) / U_(k) KMV estimator."""
        if not self.full:
            return float(len(self.hashes))
        return (self.k - 1) * _TWO64 / float(self.hashes[-1])

    def jaccard(self, other: "KmvSketch") -> float:
        """Jaccard similarity via the common-threshold trick (Beyer
        2007): compare only hashes strictly below min(θa, θb), where
        both retained sets are complete samples."""
        thr = min(self._threshold(), other._threshold())
        a = self.hashes[self.hashes < thr]
        b = other.hashes[other.hashes < thr]
        union = len(np.union1d(a, b))
        if union == 0:
            return 0.0
        return len(np.intersect1d(a, b)) / union

    def union(self, other: "KmvSketch") -> "KmvSketch":
        return self.merge(other)

    def intersection_estimate(self, other: "KmvSketch") -> float:
        return self.jaccard(other) * self.merge(other).estimate()

    def to_bytes(self) -> bytes:
        head = f"KMV1 {self.k} {len(self.hashes)}\n".encode()
        return head + self.hashes.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "KmvSketch":
        nl = data.index(b"\n")
        tag, k, n = data[:nl].split()
        if tag != b"KMV1":
            raise ValueError("not a serialized KmvSketch")
        h = np.frombuffer(data[nl + 1:], dtype="<u8").astype(_U64)
        if len(h) != int(n):
            raise ValueError("KmvSketch payload length mismatch")
        k = int(k)
        # invariants the estimator relies on: bottom-k, sorted, unique
        # (elementwise compare, NOT np.diff — uint64 diff wraps on a
        # decreasing pair and reads as a huge positive)
        if len(h) > k or (len(h) > 1 and not np.all(h[1:] > h[:-1])):
            raise ValueError("KmvSketch hashes not sorted-unique bottom-k")
        return cls(k, h)


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------
# leading-zero count of a nonzero byte (index 0 unused in practice —
# all-zero words are handled separately)
_LZ8 = np.array(
    [8] + [8 - int(b).bit_length() for b in range(1, 256)],
    dtype=np.uint8,
)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


class HllSketch:
    """2^p uint8 registers; register j holds max leading-zero rank of
    the hash suffix among keys bucketed to j."""

    def __init__(self, p: int, regs: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError(f"hll p must be in [4, 18], got {p}")
        self.p = p
        self.m = 1 << p
        self.regs = (
            np.zeros(self.m, dtype=np.uint8) if regs is None else regs
        )

    def add_hashes(self, h: np.ndarray) -> "HllSketch":
        if not len(h):
            return self
        h = h.astype(_U64)
        bucket = (h >> _U64(64 - self.p)).astype(np.int64)
        # suffix bits aligned to the top; exact vectorized leading-zero
        # count: first nonzero big-endian byte + an in-byte lz lookup
        # (float log2 would misrank near power boundaries, full
        # unpackbits costs 8x the memory traffic — both test-pinned)
        w = (h << _U64(self.p)) & _U64(0xFFFFFFFFFFFFFFFF)
        byts = w.astype(">u8").view(np.uint8).reshape(-1, 8)
        nz = byts != 0
        first = nz.argmax(axis=1)
        allzero = ~nz.any(axis=1)
        lz_in = _LZ8[byts[np.arange(len(w)), first]]
        rho = np.where(
            allzero, 64 - self.p + 1, first * 8 + lz_in + 1
        ).astype(np.uint8)
        np.maximum.at(self.regs, bucket, rho)
        return self

    def merge(self, other: "HllSketch") -> "HllSketch":
        if other.p != self.p:
            raise ValueError(f"hll p mismatch: {self.p} vs {other.p}")
        return HllSketch(self.p, np.maximum(self.regs, other.regs))

    def estimate(self) -> float:
        m = self.m
        raw = _alpha(m) * m * m / float(
            np.sum(np.ldexp(1.0, -self.regs.astype(np.int64)))
        )
        zeros = int(np.count_nonzero(self.regs == 0))
        if raw <= 2.5 * m and zeros:
            return m * math.log(m / zeros)  # linear counting
        return raw

    def to_bytes(self) -> bytes:
        return f"HLL1 {self.p}\n".encode() + self.regs.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HllSketch":
        nl = data.index(b"\n")
        tag, p = data[:nl].split()
        if tag != b"HLL1":
            raise ValueError("not a serialized HllSketch")
        p = int(p)
        # validate BEFORE the shift — a hostile header ("HLL1 1e9")
        # must not materialize a gigabit register target
        if not 4 <= p <= 18:
            raise ValueError(f"HllSketch p out of range: {p}")
        regs = np.frombuffer(data[nl + 1:], dtype=np.uint8).copy()
        if len(regs) != 1 << p:
            raise ValueError("HllSketch payload length mismatch")
        return cls(p, regs)


# --------------------------------------------------------------------------
# KLL quantiles
# --------------------------------------------------------------------------
_KLL_C = 2.0 / 3.0  # level-capacity decay from the KLL paper


class KllSketch:
    """Compactor levels; items at level h carry weight 2^h."""

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError(f"kll k must be >= 8, got {k}")
        self.k = k
        self.compactors: list[list[float]] = [[]]
        self.n = 0
        self._coins: list[int] = [0]

    def _cap(self, level: int) -> int:
        height = len(self.compactors)
        return max(2, int(math.ceil(self.k * _KLL_C ** (height - 1 - level))))

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def _capacity(self) -> int:
        return sum(self._cap(h) for h in range(len(self.compactors)))

    def update_many(self, vals: np.ndarray) -> "KllSketch":
        vals = np.asarray(vals, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if not len(vals):
            return self
        self.compactors[0].extend(vals.tolist())
        self.n += len(vals)
        self._compress()
        return self

    def _compress(self) -> None:
        while self._size() > self._capacity():
            for h in range(len(self.compactors)):
                if len(self.compactors[h]) > self._cap(h):
                    self._compact(h)
                    break
            else:
                break

    def _compact(self, h: int) -> None:
        if h + 1 == len(self.compactors):
            self.compactors.append([])
            self._coins.append(0)
        items = sorted(self.compactors[h])
        # deterministic alternating coin: reproducible builds; the
        # paper's random coin only affects constants, and the rank
        # error bound is asserted empirically in tests
        off = self._coins[h]
        self._coins[h] ^= 1
        self.compactors[h + 1].extend(items[off::2])
        self.compactors[h] = []

    def merge(self, other: "KllSketch") -> "KllSketch":
        if other.k != self.k:
            raise ValueError(f"kll k mismatch: {self.k} vs {other.k}")
        out = KllSketch(self.k)
        height = max(len(self.compactors), len(other.compactors))
        out.compactors = [[] for _ in range(height)]
        out._coins = [0] * height
        for h in range(height):
            for src in (self, other):
                if h < len(src.compactors):
                    out.compactors[h].extend(src.compactors[h])
        out.n = self.n + other.n
        out._compress()
        return out

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, items in enumerate(self.compactors):
            vals.extend(items)
            wts.extend([1 << h] * len(items))
        v = np.asarray(vals, dtype=np.float64)
        w = np.asarray(wts, dtype=np.int64)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, phi: float) -> float:
        """Value at rank ceil(phi·n) (1-indexed, lower interpolation) —
        in the exact regime this is exactly sorted[ceil(phi·n)]."""
        if not 0 <= phi <= 1:
            raise ValueError(f"phi must be in [0,1], got {phi}")
        if self.n == 0:
            raise ValueError("quantile of an empty sketch")
        v, w = self._weighted()
        target = max(1, math.ceil(phi * self.n))
        cum = np.cumsum(w)
        idx = int(np.searchsorted(cum, target))
        return float(v[min(idx, len(v) - 1)])

    def rank(self, x: float) -> float:
        """Estimated number of items ≤ x."""
        v, w = self._weighted()
        return float(w[v <= x].sum())

    def to_bytes(self) -> bytes:
        head = f"KLL1 {self.k} {self.n} {len(self.compactors)}\n".encode()
        parts = [head]
        for items, coin in zip(self.compactors, self._coins):
            arr = np.asarray(items, dtype="<f8")
            parts.append(f"{len(items)} {coin}\n".encode())
            parts.append(arr.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KllSketch":
        nl = data.index(b"\n")
        tag, k, n, height = data[:nl].split()
        if tag != b"KLL1":
            raise ValueError("not a serialized KllSketch")
        out = cls(int(k))
        out.n = int(n)
        if out.n < 0:
            raise ValueError("KllSketch negative n")
        out.compactors = []
        out._coins = []
        pos = nl + 1
        for _ in range(int(height)):
            nl2 = data.index(b"\n", pos)
            cnt, coin = data[pos:nl2].split()
            cnt = int(cnt)
            pos = nl2 + 1
            arr = np.frombuffer(data[pos: pos + 8 * cnt], dtype="<f8")
            if len(arr) != cnt:
                raise ValueError("KllSketch payload length mismatch")
            pos += 8 * cnt
            out.compactors.append(arr.tolist())
            out._coins.append(int(coin))
        if not out.compactors:
            out.compactors, out._coins = [[]], [0]
        return out


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters
# --------------------------------------------------------------------------
class MgSketch:
    """≤ k counters; estimates undercount by at most n/(k+1)."""

    def __init__(self, k: int, counters: dict | None = None, n: int = 0):
        if k < 1:
            raise ValueError(f"mg k must be >= 1, got {k}")
        self.k = k
        self.counters: dict = counters or {}
        self.n = n  # total weight observed (for the survival bound)

    def add_counts(self, counts: dict) -> "MgSketch":
        c = self.counters
        for key, v in counts.items():
            c[key] = c.get(key, 0) + v
            self.n += v
        self._reduce()
        return self

    def _reduce(self) -> None:
        if len(self.counters) <= self.k:
            return
        # batch decrement (Agarwal 2012): subtract the (k+1)-th
        # largest count from all, drop non-positive — ≤ k survive
        vals = sorted(self.counters.values(), reverse=True)
        dec = vals[self.k]
        self.counters = {
            key: v - dec for key, v in self.counters.items() if v > dec
        }

    def merge(self, other: "MgSketch") -> "MgSketch":
        if other.k != self.k:
            raise ValueError(f"mg k mismatch: {self.k} vs {other.k}")
        out = MgSketch(self.k, dict(self.counters), self.n)
        out.add_counts(other.counters)
        out.n = self.n + other.n  # add_counts added counter weight only
        return out

    def candidates(self) -> list:
        return sorted(self.counters, key=lambda x: (-self.counters[x], x))

    def error_bound(self) -> float:
        return self.n / (self.k + 1)

    def to_bytes(self) -> bytes:
        """Length-prefixed records — keys are arbitrary corpus strings
        (may contain newlines/tabs), so no delimiter format is safe."""
        import struct

        head = f"MG1 {self.k} {self.n} {len(self.counters)}\n".encode()
        parts = [head]
        for key, v in sorted(self.counters.items()):
            kb = key.encode("utf-8")
            parts.append(struct.pack("<qI", v, len(kb)))
            parts.append(kb)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "MgSketch":
        import struct

        nl = data.index(b"\n")
        tag, k, n, cnt = data[:nl].split()
        if tag != b"MG1":
            raise ValueError("not a serialized MgSketch")
        counters = {}
        pos = nl + 1
        for _ in range(int(cnt)):
            try:
                v, klen = struct.unpack_from("<qI", data, pos)
            except struct.error as e:  # truncated record header
                raise ValueError(f"MgSketch record truncated: {e}") from e
            pos += 12
            key_b = data[pos: pos + klen]
            if len(key_b) != klen:
                raise ValueError("MgSketch key truncated")
            # strict decode: UnicodeDecodeError IS a ValueError, so a
            # corrupt key fails typed instead of parsing mangled
            if v <= 0:
                raise ValueError(f"MgSketch non-positive count {v}")
            counters[key_b.decode("utf-8")] = v
            pos += klen
        if pos != len(data):
            raise ValueError("MgSketch payload length mismatch")
        n = int(n)
        if n < 0:
            raise ValueError("MgSketch negative total weight")
        return cls(int(k), counters, n)


# --------------------------------------------------------------------------
# Distributed builders: JVM hash → Arrow partition partial → blob merge
# --------------------------------------------------------------------------
# Each builder is one Arrow-batched map pass (numpy per batch, never a
# per-row Python loop) yielding ONE serialized sketch per partition,
# then a merge of the KB-sized blobs.  When the input has many
# partitions the blobs are pre-merged EXECUTOR-SIDE in a coalesce(16)
# pass (no shuffle) so the driver never collects more than ~16 states
# — the treeAggregate shape, expressed over DataFrames so the scan
# side stays Arrow-vectorized.
_PREMERGE_ABOVE = 64


def _hashed(df: DataFrame, col: str):
    return df.where(F.col(col).isNotNull()).select(
        F.xxhash64(F.col(col)).alias("h")
    )


def _collect_merge(blobs: DataFrame, zero):
    cls = type(zero)
    if blobs.rdd.getNumPartitions() > _PREMERGE_ABOVE:
        import pandas as pd

        def merge_part(batches):
            acc = zero
            for pdf in batches:
                for b in pdf["blob"]:
                    acc = acc.merge(cls.from_bytes(bytes(b)))
            yield pd.DataFrame({"blob": [acc.to_bytes()]})

        blobs = blobs.coalesce(16).mapInPandas(merge_part, "blob binary")
    out = zero
    for r in blobs.collect():
        out = out.merge(cls.from_bytes(bytes(r["blob"])))
    return out


def _hash_partials(df: DataFrame, col: str, zero, addfn) -> DataFrame:
    import pandas as pd

    def part(batches):
        sk = zero
        for pdf in batches:
            arr = pdf["h"].to_numpy(np.int64).astype(_U64)
            if len(arr):
                addfn(sk, arr)
        yield pd.DataFrame({"blob": [sk.to_bytes()]})

    return _hashed(df, col).mapInPandas(part, "blob binary")


def kmv_build(df: DataFrame, col: str, k: int = 4096) -> KmvSketch:
    """One Arrow map pass; ≤ 8k-byte state per partition.  NULLs
    excluded (join/COUNT DISTINCT semantics)."""
    partials = _hash_partials(
        df, col, KmvSketch(k), lambda sk, arr: sk.add_hashes(arr)
    )
    return _collect_merge(partials, KmvSketch(k))


def hll_build(df: DataFrame, col: str, p: int = 14) -> HllSketch:
    partials = _hash_partials(
        df, col, HllSketch(p), lambda sk, arr: sk.add_hashes(arr)
    )
    return _collect_merge(partials, HllSketch(p))


def kll_build(df: DataFrame, col: str, k: int = 200) -> KllSketch:
    """Numeric column → quantile sketch; NULL/NaN excluded."""
    import pandas as pd

    vals = df.where(F.col(col).isNotNull()).select(
        F.col(col).cast("double").alias("v")
    )

    def part(batches):
        sk = KllSketch(k)
        for pdf in batches:
            sk.update_many(pdf["v"].to_numpy(np.float64))
        yield pd.DataFrame({"blob": [sk.to_bytes()]})

    return _collect_merge(vals.mapInPandas(part, "blob binary"), KllSketch(k))


def mg_build(df: DataFrame, col: str, k: int = 512) -> MgSketch:
    """String-keyed heavy-hitter pass.  Each Arrow batch is counted
    vectorized (``value_counts``) and flushed into the k-bounded
    sketch, so executor memory stays O(k + batch) even on an
    adversarially high-NDV partition."""
    import pandas as pd

    keyed = df.where(F.col(col).isNotNull()).select(
        F.col(col).cast("string").alias("v")
    )

    def part(batches):
        sk = MgSketch(k)
        for pdf in batches:
            if len(pdf):
                sk.add_counts(pdf["v"].value_counts().to_dict())
        yield pd.DataFrame({"blob": [sk.to_bytes()]})

    return _collect_merge(keyed.mapInPandas(part, "blob binary"), MgSketch(k))


def heavy_hitters_exact(
    df: DataFrame,
    col: str,
    topn: int,
    k: int = 512,
    strict: bool = False,
) -> DataFrame:
    """Two-pass exact top-n: map-only MG candidate pass, then exact
    counts of ONLY the candidate keys (the groupBy shuffles ≤
    |candidates| × partitions partial rows, never the corpus), sorted
    (count desc, value asc).  Completeness is guaranteed when the
    n-th exact count exceeds the MG survival bound n_total/(k+1);
    ``strict=True`` raises :class:`SketchGuaranteeError` otherwise."""
    sk = mg_build(df, col, k=k)
    cand = sk.candidates()
    # exact regime: no decrement ever fired iff counter weight still
    # equals the total observed weight — then the candidate set is ALL
    # keys and any result is complete by exhaustion
    exact_regime = sum(sk.counters.values()) == sk.n
    if not cand:
        if strict and not exact_regime and sk.n > 0:
            raise SketchGuaranteeError(
                f"top-{topn} completeness unproven: every counter "
                f"decremented away under the survival bound "
                f"{sk.error_bound():.1f} (raise k)"
            )
        return df.sparkSession.createDataFrame(
            [], "value string, n_exact long"
        )
    exact = (
        df.where(F.col(col).cast("string").isin(cand))
        .groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("value"))
        .limit(topn)
    )
    if strict:
        rows = exact.collect()
        if not exact_regime:
            nth = rows[-1]["n_exact"] if len(rows) >= topn else 0
            if nth <= sk.error_bound():
                raise SketchGuaranteeError(
                    f"top-{topn} completeness unproven: n-th count "
                    f"{nth} <= survival bound "
                    f"{sk.error_bound():.1f} (raise k)"
                )
        return df.sparkSession.createDataFrame(rows, exact.schema)
    return exact


def kmv_grouped(
    df: DataFrame,
    key: str,
    col: str,
    k: int = 4096,
) -> DataFrame:
    """Per-group distinct-count sketches ("distinct URLs PER DOMAIN"):
    partition-local per-group KMV partials (``mapInPandas`` over the
    JVM-hashed column) → ``groupBy(key)`` over serialized BLOBS (the
    shuffle carries one ≤8k-byte row per (partition, group), never
    keys) → merged sketch per group.  Returns ``(key, n_distinct,
    sketch)`` — the sketch column is the persistable artifact: merge
    any subset of groups (or days) for a combined distinct count
    without touching the corpus again.  NULL keys/values excluded.
    Exact while a group's distinct count stays ≤ k."""
    import pandas as pd

    sel = df.where(
        F.col(key).isNotNull() & F.col(col).isNotNull()
    ).select(
        F.col(key).cast("string").alias("k_"),
        F.xxhash64(F.col(col)).alias("h"),
    )

    def partials(batches):
        sks: dict[str, KmvSketch] = {}
        for pdf in batches:
            for kk, grp in pdf.groupby("k_"):
                sks.setdefault(kk, KmvSketch(k)).add_hashes(
                    grp["h"].to_numpy(np.int64).astype(_U64)
                )
        if sks:
            yield pd.DataFrame(
                {"k_": list(sks),
                 "blob": [s.to_bytes() for s in sks.values()]}
            )

    blobs = sel.mapInPandas(partials, "k_ string, blob binary")

    def finish(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = KmvSketch(k)
        for b in pdf["blob"]:
            sk = sk.merge(KmvSketch.from_bytes(bytes(b)))
        return pd.DataFrame(
            {
                "k_": [pdf["k_"].iloc[0]],
                "n_distinct": [sk.estimate()],
                "sketch": [sk.to_bytes()],
            }
        )

    return (
        blobs.groupBy("k_")
        .applyInPandas(finish, "k_ string, n_distinct double, sketch binary")
        .withColumnRenamed("k_", key)
    )


def kll_grouped_quantile(
    df: DataFrame,
    key: str,
    col: str,
    phi: float,
    k: int = 200,
) -> DataFrame:
    """Per-group quantile ("median doc length PER LANGUAGE") at corpus
    scale: partition-local per-group sketches (``mapInPandas``) →
    ``groupBy(key)`` over the serialized SKETCH BLOBS — the shuffle
    carries one ~KB row per (partition, group), never raw values —
    → merge + query (``applyInPandas``).  Compare the naive
    ``percentile_approx`` groupBy, whose shuffle carries every row.

    NULL keys and NULL/NaN values are excluded.  In the exact regime
    (group size ≤ sketch capacity, no compaction) the result is the
    exact rank-ceil(phi·n) value regardless of merge order; beyond it
    the KLL bound applies.  Partition-local state is O(groups-per-
    partition × k); grouped quantiles assume group cardinality is
    manageable, as any per-group aggregation does."""
    import pandas as pd

    if not 0 <= phi <= 1:
        raise ValueError(f"phi must be in [0,1], got {phi}")
    sel = df.where(
        F.col(key).isNotNull() & F.col(col).isNotNull()
    ).select(
        F.col(key).cast("string").alias("k_"),
        F.col(col).cast("double").alias("v_"),
    )

    def partials(batches):
        sks: dict[str, KllSketch] = {}
        for pdf in batches:
            for kk, grp in pdf.groupby("k_"):
                sks.setdefault(kk, KllSketch(k)).update_many(
                    grp["v_"].to_numpy()
                )
        if sks:
            yield pd.DataFrame(
                {
                    "k_": list(sks),
                    "blob": [s.to_bytes() for s in sks.values()],
                }
            )

    blobs = sel.mapInPandas(partials, "k_ string, blob binary")

    def finish(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = KllSketch(k)
        for b in pdf["blob"]:
            sk = sk.merge(KllSketch.from_bytes(bytes(b)))
        return pd.DataFrame({"k_": [pdf["k_"].iloc[0]], "q": [sk.quantile(phi)]})

    return (
        blobs.groupBy("k_")
        .applyInPandas(finish, "k_ string, q double")
        .withColumnRenamed("k_", key)
    )


# --------------------------------------------------------------------------
# state persistence (the bloom.save_bloom artifact shape)
# --------------------------------------------------------------------------
_TAGS = {
    b"KMV1": KmvSketch,
    b"HLL1": HllSketch,
    b"KLL1": KllSketch,
    b"MG1": MgSketch,
}


def save_sketch(spark, sketch, path: str) -> None:
    spark.createDataFrame(
        [(bytearray(sketch.to_bytes()),)], "payload binary"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_sketch(spark, path: str):
    rows = spark.read.parquet(path).collect()
    if len(rows) != 1:
        raise ValueError(f"sketch state at {path!r} has {len(rows)} rows")
    data = bytes(rows[0]["payload"])
    tag = data.split(b" ", 1)[0]
    cls = _TAGS.get(tag)
    if cls is None:
        raise ValueError(f"unknown sketch tag {tag!r}")
    return cls.from_bytes(data)
