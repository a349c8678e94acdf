"""Bloom-filter membership at corpus scale — the shuffle-avoidance
primitive for dedup and decontamination joins.

The 100 TB problem: "drop every corpus row whose key appears in this
reference set" is a semi/anti join, and a plain join SHUFFLES THE
CORPUS on the key.  When the reference is small enough to summarize
(an eval benchmark, a seen-URL set, yesterday's fingerprints), a
Bloom filter turns that into a MAP-SIDE prefilter: the corpus never
shuffles, and only the tiny might-match fraction (≈ the false-positive
rate) reaches the exact join that removes the false positives.  This
is exactly the runtime-filter rewrite Spark applies to selective
star-joins internally (`bloom_filter_agg` / `might_contain`), which
is not exposed to SQL — so it is built here from public parts:

- **Hashing lives in the JVM on both sides** (`xxhash64` twice, the
  second salted) so build and probe can never disagree; Python only
  does vectorized bit arithmetic on the (h1, h2) pairs.  k indexes
  come from standard double hashing g_i = h1 + i·h2 (Kirsch &
  Mitzenmacher 2006).
- **Distributed build**: per-partition numpy bit arrays, OR-combined
  with ``treeReduce`` — the driver holds exactly one m/8-byte array,
  never the keys.  m is capped (256 MiB of bits) and sized from
  (expected_n, fpr) by the textbook formulas.
- **Probe** is a map-only Arrow-batched pandas UDF over a
  ``SparkContext.broadcast`` of the bit array — shipped once per
  executor, not per task.
- **No false negatives, ever** — so :func:`bloom_semi_join` /
  anti-join compositions return EXACTLY the plain-join answer (the
  gate states the equivalence analytically in SQL), while at scale
  the shuffled fraction is ≈ fpr instead of 1.0.

NULL keys follow join semantics: never members, never matched.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["BloomFilter", "bloom_build", "bloom_might_contain",
           "bloom_semi_join", "save_bloom", "load_bloom"]

_SALT = 0x5F3759DF  # probe/build second-hash salt (any fixed constant)
_MAX_BITS = 1 << 31  # 256 MiB of driver/executor bit-array — hard cap


def _hash_cols(col: Column):
    """(h1, h2) — both computed in the JVM so build == probe."""
    return (
        F.xxhash64(col),
        F.xxhash64(col, F.lit(_SALT)),
    )


class BloomFilter:
    """m-bit filter + k double-hash probes over (h1, h2) int64 pairs."""

    def __init__(self, bits: np.ndarray, m: int, k: int, n_added: int):
        self.bits = bits  # uint8 array of m/8 bytes
        self.m = m
        self.k = k
        self.n_added = n_added

    def indexes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(k, n) bit positions; uint64 arithmetic wraps per spec of
        double hashing (signed int64 in, unsigned out)."""
        a = h1.astype(np.uint64)
        b = h2.astype(np.uint64)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((a[None, :] + i * b[None, :]) % np.uint64(self.m)).astype(
            np.int64
        )

    def contains(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        idx = self.indexes(h1, h2)
        hit = (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return hit.all(axis=0)

    def to_bytes(self) -> bytes:
        head = f"BLM1 {self.m} {self.k} {self.n_added}\n".encode()
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        nl = data.index(b"\n")
        tag, m, k, n = data[:nl].split()
        if tag != b"BLM1":
            raise ValueError("not a serialized BloomFilter")
        bits = np.frombuffer(data[nl + 1:], dtype=np.uint8).copy()
        if len(bits) != (int(m) + 7) // 8:
            raise ValueError("BloomFilter payload length mismatch")
        return cls(bits, int(m), int(k), int(n))


def _size(expected_n: int, fpr: float) -> tuple[int, int]:
    n = max(1, expected_n)
    m = math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))
    m = max(64, min(m, _MAX_BITS))
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def bloom_build(
    df: DataFrame,
    col: str,
    expected_n: int | None = None,
    fpr: float = 0.001,
) -> BloomFilter:
    """Build a filter over ``df[col]`` (NULLs excluded).  One pass:
    JVM hashes, per-partition numpy bit arrays, treeReduce OR.  With
    ``expected_n`` omitted a count() pass sizes the filter first —
    pass it when you already know the cardinality."""
    if not 0 < fpr < 1:
        raise ValueError(f"fpr must be in (0,1), got {fpr}")
    h1, h2 = _hash_cols(F.col(col))
    keyed = df.where(F.col(col).isNotNull()).select(
        h1.alias("h1"), h2.alias("h2")
    )
    if expected_n is None:
        expected_n = keyed.count()
    m, k = _size(expected_n, fpr)
    nbytes = (m + 7) // 8

    def build_part(rows):
        bits = np.zeros(nbytes, dtype=np.uint8)
        h1s, h2s = [], []
        for r in rows:
            h1s.append(r[0])
            h2s.append(r[1])
        if h1s:
            a = np.asarray(h1s, dtype=np.int64).astype(np.uint64)
            b = np.asarray(h2s, dtype=np.int64).astype(np.uint64)
            for i in range(k):
                idx = ((a + np.uint64(i) * b) % np.uint64(m)).astype(
                    np.int64
                )
                np.bitwise_or.at(
                    bits, idx >> 3, np.uint8(1) << (idx & 7).astype(
                        np.uint8
                    )
                )
        yield bits

    bits = keyed.rdd.mapPartitions(build_part).treeReduce(np.bitwise_or)
    return BloomFilter(bits, m, k, expected_n)


def bloom_might_contain(
    df: DataFrame, col: str, bf: BloomFilter, out_col: str = "might"
) -> DataFrame:
    """``df`` plus a boolean ``out_col``: False is DEFINITE absence,
    True means "must check exactly".  NULL keys are False.  Map-only;
    the bit array ships once per executor as a broadcast."""
    sc = df.sparkSession.sparkContext
    b_bits = sc.broadcast(bf.bits.tobytes())
    m, k = bf.m, bf.k

    @F.pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series, isnull: pd.Series) -> pd.Series:
        local = BloomFilter(
            np.frombuffer(b_bits.value, dtype=np.uint8), m, k, 0
        )
        res = local.contains(
            h1.to_numpy(np.int64), h2.to_numpy(np.int64)
        )
        res = np.where(isnull.to_numpy(bool), False, res)
        return pd.Series(res)

    h1, h2 = _hash_cols(F.col(col))
    return df.withColumn(out_col, probe(h1, h2, F.col(col).isNull()))


def bloom_semi_join(
    corpus: DataFrame,
    reference: DataFrame,
    on: str,
    how: str = "semi",
    fpr: float = 0.001,
    bf: BloomFilter | None = None,
) -> DataFrame:
    """EXACT ``left_semi`` / ``left_anti`` of ``corpus`` against
    ``reference`` on column ``on``, with the corpus prefiltered
    map-side so only the might-match fraction (≈ fpr) reaches the
    join shuffle.  Exactness by construction: no false negatives
    means the definite-absent rows the prefilter removes (semi) or
    passes through (anti) are decided correctly, and the exact join
    settles the rest.  Pass ``bf`` to reuse a filter built once (the
    daily-increment loop); the reference side still participates in
    the exact join, so a stale-but-superset filter stays correct."""
    if how not in ("semi", "anti"):
        raise ValueError(f"how must be 'semi' or 'anti', got {how!r}")
    if bf is None:
        bf = bloom_build(reference, on, fpr=fpr)
    probed = bloom_might_contain(corpus, on, bf, out_col="_bloom_might")
    maybe = probed.filter(F.col("_bloom_might")).drop("_bloom_might")
    ref_keys = reference.select(on).where(F.col(on).isNotNull()).distinct()
    if how == "semi":
        return maybe.join(ref_keys, on, "left_semi")
    definite_out = probed.filter(~F.col("_bloom_might")).drop(
        "_bloom_might"
    )
    survivors = maybe.join(ref_keys, on, "left_anti")
    return definite_out.unionByName(survivors)


def save_bloom(spark, bf: BloomFilter, path: str) -> None:
    """Persist the filter as a one-row parquet (header + bit array as
    binary) — the daily-increment loop's state artifact, readable by
    any Spark session regardless of driver memory layout."""
    spark.createDataFrame(
        [(bytearray(bf.to_bytes()),)], "payload binary"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_bloom(spark, path: str) -> BloomFilter:
    rows = spark.read.parquet(path).collect()
    if len(rows) != 1:
        raise ValueError(f"bloom state at {path!r} has {len(rows)} rows")
    return BloomFilter.from_bytes(bytes(rows[0]["payload"]))
