"""Sequence packing (operators/packing.py): assignment invariants,
determinism, and the documented overflow semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_governance_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def corpus(spark):
    # ~200 docs, 1-40 tokens each, deterministic
    return spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), (F.col("id") % 40 + 1).cast("int")),
                lambda i: F.concat(F.lit("w"), i.cast("string")),
            ),
        ).alias("text"),
    )


class TestPackSequences:
    def test_every_doc_assigned_exactly_once(self, spark, corpus):
        out = pack_sequences(corpus, max_tokens=100, num_buckets=8)
        assert out.count() == 200
        assert out.select("doc_id").distinct().count() == 200

    def test_offsets_tile_each_pack_contiguously(self, spark, corpus):
        """Docs sharing a pack tile contiguously: each doc starts where
        the previous one ends (offset_i+1 == offset_i + n_i). The first
        doc of a pack may start at offset > 0 — that shadow region is
        the previous pack's straddling doc overflowing in (documented
        semantics)."""
        out = pack_sequences(corpus, max_tokens=100, num_buckets=8).collect()
        packs = {}
        for r in out:
            packs.setdefault((r["pack_bucket"], r["pack_id"]), []).append(
                (r["pack_offset"], r["n_tokens"])
            )
        for key, docs in packs.items():
            docs.sort()
            for (off1, n1), (off2, _) in zip(docs, docs[1:]):
                assert off2 == off1 + n1, (key, docs)

    def test_overflow_bounded_by_one_doc(self, spark, corpus):
        L = 100
        out = pack_sequences(corpus, max_tokens=L, num_buckets=8)
        per_pack = (
            out.groupBy("pack_bucket", "pack_id")
            .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"))
            .collect()
        )
        for r in per_pack:
            assert r["tot"] <= L + r["mx"], r

    def test_deterministic_across_repartition(self, spark, corpus):
        a = {
            r["doc_id"]: (r["pack_bucket"], r["pack_id"], r["pack_offset"])
            for r in pack_sequences(corpus, 100, num_buckets=8).collect()
        }
        b = {
            r["doc_id"]: (r["pack_bucket"], r["pack_id"], r["pack_offset"])
            for r in pack_sequences(
                corpus.repartition(13), 100, num_buckets=8
            ).collect()
        }
        assert a == b

    def test_oversized_doc_owns_its_packs(self, spark):
        docs = spark.createDataFrame(
            [(1, " ".join(["t"] * 250))], "doc_id long, text string"
        )
        r = pack_sequences(docs, max_tokens=100, num_buckets=4).first()
        assert r["n_tokens"] == 250
        assert r["pack_offset"] == 0  # starts its own pack

    def test_zero_token_docs_dropped(self, spark):
        docs = spark.createDataFrame(
            [(1, ""), (2, "  "), (3, "a b")], "doc_id long, text string"
        )
        got = pack_sequences(docs, 10).select("doc_id").collect()
        assert [r["doc_id"] for r in got] == [3]

    def test_precomputed_token_counts(self, spark):
        docs = spark.createDataFrame(
            [(1, 5), (2, 7), (3, 9)], "doc_id long, nt long"
        )
        out = pack_sequences(
            docs, 10, num_buckets=1, token_count_col="nt"
        ).collect()
        assert sum(r["n_tokens"] for r in out) == 21

    def test_bad_max_tokens_rejected(self, spark, corpus):
        with pytest.raises(ValueError):
            pack_sequences(corpus, 0)

    def test_plan_single_exchange_per_lane_window(self, spark, corpus):
        # one hash-partition shuffle (the lane split) + in-lane window;
        # no global single-partition sort
        df = pack_sequences(corpus, 100, num_buckets=8)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        ex = [
            l
            for l in plan.splitlines()
            if l.startswith("(") and "Exchange" in l
        ]
        assert len(ex) == 1, plan
        assert "SinglePartition" not in plan


class TestPartitionCols:
    def test_splits_never_share_a_pack(self, spark, corpus):
        from data_governance_spark.operators.sampling import hash_split

        split = hash_split(
            corpus, {"train": 0.5, "test": 0.5}, "doc_id"
        )
        out = pack_sequences(
            split, max_tokens=100, num_buckets=4, partition_cols=["split"]
        )
        # within one split, tiling still holds
        rows = out.collect()
        packs = {}
        for r in rows:
            packs.setdefault(
                (r["split"], r["pack_bucket"], r["pack_id"]), []
            ).append((r["pack_offset"], r["n_tokens"]))
        for key, docs in packs.items():
            docs.sort()
            for (o1, n1), (o2, _) in zip(docs, docs[1:]):
                assert o2 == o1 + n1, (key, docs)
        assert out.count() == 200

    def test_duplicate_ids_do_not_share_offsets(self, spark):
        """ROWS frame regression: tied (hash, id) rows must each get
        their own running sum, not the RANGE-frame shared one."""
        from pyspark.sql import functions as F

        dup = spark.createDataFrame(
            [(1, "a b c"), (1, "a b c"), (2, "d e")],
            "doc_id long, text string",
        )
        out = pack_sequences(dup, max_tokens=100, num_buckets=1).collect()
        offs = sorted(
            (r["pack_offset"], r["n_tokens"]) for r in out
        )
        for (o1, n1), (o2, _) in zip(offs, offs[1:]):
            assert o2 == o1 + n1, offs


class TestWritePacked:
    def test_shards_are_pack_ordered(self, spark, corpus, tmp_path):
        from data_governance_spark.operators.packing import write_packed
        from data_governance_spark.operators.sampling import hash_split

        split = hash_split(corpus, {"train": 0.7, "test": 0.3}, "doc_id")
        assigned = pack_sequences(
            split, max_tokens=100, num_buckets=4, partition_cols=["split"]
        ).join(corpus, "doc_id")
        out = str(tmp_path / "shards")
        write_packed(assigned, out, partition_cols=["split"])

        got = spark.read.parquet(out)
        assert got.count() == 200
        assert set(r["split"] for r in got.select("split").distinct().collect()) == {
            "train", "test"
        }
        # per-file row order: within each parquet file, rows must be
        # sorted by (pack_bucket, pack_id, pack_offset)
        import glob as g

        files = g.glob(out + "/split=*/part-*.parquet")
        assert files
        import pyarrow.parquet as pq

        for f in files:
            t = pq.read_table(
                f, columns=["pack_bucket", "pack_id", "pack_offset"]
            ).to_pydict()
            triples = list(
                zip(t["pack_bucket"], t["pack_id"], t["pack_offset"])
            )
            assert triples == sorted(triples), f


    def test_lanes_never_split_and_num_files_controls_width(
        self, spark, corpus, tmp_path
    ):
        """ADVICE r5: files hold one-or-more WHOLE lanes; write width
        defaults to the lane count and num_files overrides it."""
        import glob as g

        from pyspark.sql import functions as F

        from data_governance_spark.operators.packing import write_packed

        assigned = pack_sequences(corpus, max_tokens=100, num_buckets=6)
        out = str(tmp_path / "lanes")
        write_packed(assigned, out)  # default: distinct lane count (6)
        files = g.glob(out + "/part-*.parquet")
        assert 0 < len(files) <= 6
        got = spark.read.parquet(out).select(
            "pack_bucket", F.input_file_name().alias("f")
        )
        per_lane = (
            got.groupBy("pack_bucket")
            .agg(F.countDistinct("f").alias("nf"))
            .collect()
        )
        assert all(r["nf"] == 1 for r in per_lane)

        out2 = str(tmp_path / "one")
        write_packed(assigned, out2, num_files=1)
        assert len(g.glob(out2 + "/part-*.parquet")) == 1


# --------------------------------------------------------------------------
# Randomized differential: the whole assignment recomputed in pure
# Python (hashlib md5, same seed/layout) must match Spark bit-for-bit.
def _py_pack(rows, max_tokens, num_buckets, seed="pack"):
    import hashlib

    lanes = {}
    for i, n in rows:
        if n <= 0:
            continue
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        b = int(h[:6], 16) % num_buckets
        lanes.setdefault(b, []).append((h, i, n))
    out = {}
    for b, lane in lanes.items():
        start = 0
        for _h, i, n in sorted(lane):
            out[i] = (b, start // max_tokens, start % max_tokens)
            start += n
    return out


def test_randomized_differential_vs_python(spark):
    import random

    rng = random.Random(20260814)
    rows = [(i, rng.randint(0, 300)) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, nt long")
    got = {
        r["doc_id"]: (r["pack_bucket"], r["pack_id"], r["pack_offset"])
        for r in pack_sequences(
            docs, max_tokens=128, num_buckets=16, token_count_col="nt"
        ).collect()
    }
    want = _py_pack(rows, max_tokens=128, num_buckets=16)
    assert got == want
