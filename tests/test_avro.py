"""Avro container source (sources/avro.py): encode/decode round trips
across every stdlib codec and type, multi-block and multi-file reads,
the Spark schema mapping, hostile-input fuzz (typed-only), and the
q43 'avro' gate fixture."""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.sources.avro import (
    AvroError,
    avro_rows,
    avro_schema,
    avro_shards,
    avro_to_spark_type,
    read_avro,
    write_avro,
    write_avro_files,
)

SCHEMA = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "int"}},
        {"name": "kind",
         "type": {"type": "enum", "name": "K", "symbols": ["A", "B"]}},
        {"name": "raw", "type": "bytes"},
        {"name": "fx",
         "type": {"type": "fixed", "name": "F8", "size": 4}},
        {"name": "nested",
         "type": {"type": "record", "name": "N", "fields": [
             {"name": "x", "type": "int"},
             {"name": "y", "type": "float"},
         ]}},
    ],
}
ROWS = [
    {"id": 1, "name": "alpha", "score": 1.5, "flag": True,
     "tags": ["x", "y"], "attrs": {"a": 1, "b": -2}, "kind": "A",
     "raw": b"\x00\x01", "fx": b"abcd",
     "nested": {"x": 7, "y": 0.5}},
    {"id": -9, "name": None, "score": -2.25, "flag": False,
     "tags": [], "attrs": {}, "kind": "B", "raw": b"", "fx": b"\0\0\0\0",
     "nested": {"x": -1, "y": -0.25}},
]


class TestRoundTrip:
    @pytest.mark.parametrize(
        "codec", ["null", "deflate", "bzip2", "xz", "zstd"]
    )
    def test_codecs(self, codec):
        data = write_avro(SCHEMA, ROWS * 5, codec=codec, block_rows=3)
        assert avro_rows(data) == ROWS * 5
        assert avro_schema(data) == SCHEMA

    def test_zigzag_extremes(self):
        sch = {"type": "record", "name": "R",
               "fields": [{"name": "v", "type": "long"}]}
        vals = [0, -1, 1, 2**62, -(2**62), 63, -64]
        rows = [{"v": v} for v in vals]
        assert [r["v"] for r in avro_rows(write_avro(sch, rows))] == vals

    def test_unsupported_codec_and_union(self):
        with pytest.raises(AvroError, match="codec"):
            write_avro(SCHEMA, ROWS, codec="lzo9")
        data = bytearray(write_avro(SCHEMA, ROWS))
        i = data.index(b"null")  # avro.codec value
        data[i : i + 4] = b"lzo9"
        # metadata value lengths: replace like-for-like is fine
        with pytest.raises(AvroError, match="codec"):
            avro_rows(bytes(data))
        with pytest.raises(AvroError, match="union"):
            avro_to_spark_type(["int", "string"])

    def test_zstd_codec_hostile_block(self):
        # a declared-zstd block whose payload is not a zstd frame must
        # quarantine typed (the r14 boundary-close keeps the taxonomy)
        data = bytearray(write_avro(SCHEMA, ROWS, codec="null"))
        i = data.index(b"null")  # avro.codec value
        data[i : i + 4] = b"zstd"
        with pytest.raises(AvroError, match="zstd"):
            avro_rows(bytes(data))

    def test_sync_mismatch_and_truncation(self):
        good = write_avro(SCHEMA, ROWS)
        bad = bytearray(good)
        bad[-1] ^= 0xFF  # final sync marker byte
        with pytest.raises(AvroError, match="sync"):
            avro_rows(bytes(bad))
        with pytest.raises(AvroError, match="truncated"):
            avro_rows(good[: len(good) - 20])

    def test_spark_type_mapping(self):
        t = avro_to_spark_type(SCHEMA)
        assert t["name"].dataType.typeName() == "string"
        assert t["tags"].dataType.typeName() == "array"
        assert t["attrs"].dataType.typeName() == "map"
        assert t["fx"].dataType.typeName() == "binary"
        assert t["nested"].dataType["y"].dataType.typeName() == "float"


class TestFuzz:
    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=1024))
    def test_random_binary_typed_only(self, data):
        try:
            avro_rows(data)
        except AvroError:
            pass

    @settings(max_examples=120, deadline=None)
    @given(st.integers(0, 10**9), st.integers(0, 255))
    def test_corrupted_valid_typed_only(self, pos, val):
        d = bytearray(write_avro(SCHEMA, ROWS, codec="deflate"))
        d[pos % len(d)] = val
        try:
            out = avro_rows(bytes(d))
            assert isinstance(out, list)
        except AvroError:
            pass

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(-(2**40), 2**40),
                      st.one_of(st.none(), st.text(max_size=20))),
            max_size=30,
        )
    )
    def test_value_round_trip_property(self, pairs):
        sch = {"type": "record", "name": "R", "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
        ]}
        rows = [{"a": a, "b": b} for a, b in pairs]
        assert avro_rows(write_avro(sch, rows, codec="deflate")) == rows


class TestSparkSource:
    def test_read_avro_multi_file(self, spark, tmp_path):
        d = tmp_path / "av"
        d.mkdir()
        (d / "a.avro").write_bytes(
            write_avro(SCHEMA, ROWS, codec="deflate")
        )
        more = [dict(ROWS[0], id=100, name="third")]
        (d / "b.avro").write_bytes(write_avro(SCHEMA, more))
        df = read_avro(spark, str(d / "*.avro"))
        got = {r["id"]: r for r in df.collect()}
        assert set(got) == {1, -9, 100}
        assert got[1]["tags"] == ["x", "y"]
        assert got[1]["attrs"] == {"a": 1, "b": -2}
        assert got[-9]["name"] is None
        assert bytes(got[100]["raw"]) == b"\x00\x01"
        assert got[1]["nested"]["x"] == 7

    def test_read_avro_empty_glob_and_non_record(self, spark, tmp_path):
        with pytest.raises(Exception):  # no files -> typed inside py4j
            read_avro(spark, str(tmp_path / "none" / "*.avro"))
        f = tmp_path / "scalar.avro"
        sch = "long"
        # write a scalar-schema container by hand via write_avro on a
        # record then patching is overkill: use the writer directly
        from data_governance_spark.sources.avro import _MAGIC, _zigzag

        f.write_bytes(
            write_avro({"type": "record", "name": "R", "fields": []}, [{}])
        )
        import json

        data = bytearray(f.read_bytes())
        # swap the schema JSON for a bare "long" of equal length? not
        # needed — just check the record requirement with a crafted one
        f2 = tmp_path / "s2.avro"
        out = bytearray(_MAGIC)
        meta = [("avro.codec", b"null"), ("avro.schema", b'"long"')]
        out += _zigzag(len(meta))
        for k, v in meta:
            out += _zigzag(len(k.encode())) + k.encode()
            out += _zigzag(len(v)) + v
        out += _zigzag(0) + b"\x07" * 16
        f2.write_bytes(bytes(out))
        with pytest.raises(AvroError, match="record"):
            read_avro(spark, str(f2))


class TestSnappy:
    def test_avro_snappy_round_trip(self):
        data = write_avro(SCHEMA, ROWS * 7, codec="snappy", block_rows=4)
        assert avro_rows(data) == ROWS * 7

    def test_crc_mismatch_typed(self):
        from data_governance_spark.sources.avro import snappy_decompress

        data = bytearray(write_avro(SCHEMA, ROWS, codec="snappy"))
        # the CRC is the 4 bytes right before the trailing sync marker
        data[-17] ^= 0xFF
        with pytest.raises(AvroError, match="CRC|snappy|sync"):
            avro_rows(bytes(data))

    def test_copy_ops_hand_vectors(self):
        from data_governance_spark.sources.avro import snappy_decompress

        def lit(b: bytes) -> bytes:
            assert len(b) <= 60
            return bytes([(len(b) - 1) << 2]) + b

        def pre(n: int) -> bytes:
            out = bytearray()
            while True:
                x = n & 0x7F
                n >>= 7
                out.append(x | 0x80 if n else x)
                if not n:
                    return bytes(out)

        # copy-1 (tag 01): len=4..11, offset = 3-bit high | byte
        v = pre(9) + lit(b"abc") + bytes([(2 << 2) | 1, 3])
        assert snappy_decompress(v) == b"abcabcabc"  # overlapping x2
        # copy-2 (tag 10): 2-byte LE offset, len = (tag>>2)+1
        v = pre(10) + lit(b"hello") + bytes([(4 << 2) | 2]) + (5).to_bytes(
            2, "little"
        )
        assert snappy_decompress(v) == b"hellohello"
        # copy-4 (tag 11): 4-byte LE offset
        v = pre(8) + lit(b"wxyz") + bytes([(3 << 2) | 3]) + (4).to_bytes(
            4, "little"
        )
        assert snappy_decompress(v) == b"wxyzwxyz"
        # overlapping single-byte pattern run (offset 1); copy-1's
        # 3-bit length field stores len-4, so field 2 -> len 6
        v = pre(7) + lit(b"A") + bytes([(2 << 2) | 1, 1])
        assert snappy_decompress(v) == b"AAAAAAA"
        # long literal (2-byte length form)
        body = bytes(range(256)) * 2
        v = pre(512) + bytes([61 << 2]) + (511).to_bytes(2, "little") + body
        assert snappy_decompress(v) == body

    def test_malformed_typed(self):
        from data_governance_spark.sources.avro import snappy_decompress

        for bad in (
            b"",                      # no preamble
            b"\x05\x00",              # literal runs past input
            b"\x03\x08\x00abc",       # wait-structured below
            b"\x06" + bytes([(2 << 2) | 1, 9]) + b"ab",  # offset > out
            b"\x02" + bytes([0x00]) + b"ab",  # output exceeds preamble
        ):
            with pytest.raises(AvroError):
                snappy_decompress(bad)

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=4096))
    def test_compress_round_trip(self, data):
        from data_governance_spark.sources.avro import (
            snappy_compress,
            snappy_decompress,
        )

        assert snappy_decompress(snappy_compress(data)) == data

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=512))
    def test_decompress_fuzz_typed_only(self, data):
        from data_governance_spark.sources.avro import snappy_decompress

        try:
            out = snappy_decompress(data)
            assert isinstance(out, bytes)
        except AvroError:
            pass


class TestSink:
    def test_shards_round_trip(self, spark):
        rows = [
            (1, "alpha", 1.5, True, ["x", "y"], {"a": 1}, b"\x00\x01",
             (7, 0.5)),
            (2, None, -2.0, False, [], {}, b"", (-1, -0.25)),
        ]
        df = spark.createDataFrame(
            rows,
            "id long, name string, score double, flag boolean, "
            "tags array<string>, attrs map<string,int>, raw binary, "
            "nested struct<x:int, y:double>",
        )
        shards = avro_shards(df).collect()
        got = []
        for s in shards:
            got.extend(avro_rows(bytes(s["content"])))
        got.sort(key=lambda r: r["id"])
        assert got[0]["name"] == "alpha"
        assert got[0]["tags"] == ["x", "y"]
        assert got[0]["attrs"] == {"a": 1}
        assert got[0]["nested"] == {"x": 7, "y": 0.5}
        assert got[1]["name"] is None
        assert got[1]["raw"] == b""
        assert sum(s["n_rows"] for s in shards) == 2

    def test_write_then_read_back_through_source(self, spark, tmp_path):
        df = spark.range(200).selectExpr(
            "id",
            "CASE WHEN id % 7 = 0 THEN NULL "
            "ELSE concat('row ', id) END AS name",
            "CAST(id % 5 AS INT) AS mkt",
        )
        out = str(tmp_path / "sink")
        n_files = write_avro_files(df, out, codec="snappy")
        assert n_files >= 1
        back = read_avro(spark, out + "/*.avro")
        assert back.count() == 200
        a = {r["id"]: (r["name"], r["mkt"]) for r in back.collect()}
        b = {r["id"]: (r["name"], r["mkt"]) for r in df.collect()}
        assert a == b

    def test_unmappable_types_typed(self, spark):
        df = spark.createDataFrame([({1: "x"},)], "m map<int,string>")
        with pytest.raises(Exception, match="string keys"):
            avro_shards(df)


class TestReviewFindings:
    def test_negative_fixed_size_no_hang(self):
        # hostile schema: fixed size -1 moved the reader cursor
        # BACKWARD — an infinite loop, not a typed error (review repro)
        import json
        from data_governance_spark.sources.avro import _MAGIC, _zigzag

        sch = json.dumps({
            "type": "record", "name": "R",
            "fields": [{"name": "a", "type": {
                "type": "array", "items": {
                    "type": "fixed", "name": "F", "size": -1}}}],
        }).encode()
        out = bytearray(_MAGIC)
        meta = [("avro.codec", b"null"), ("avro.schema", sch)]
        out += _zigzag(len(meta))
        for k, v in meta:
            out += _zigzag(len(k.encode())) + k.encode()
            out += _zigzag(len(v)) + v
        out += _zigzag(0) + b"\x07" * 16
        body = _zigzag(1) + b""  # array block count 1, then nothing
        out += _zigzag(1) + _zigzag(len(body)) + body + b"\x07" * 16
        with pytest.raises(AvroError):
            avro_rows(bytes(out))

    def test_deflate_block_trailing_bytes_typed(self):
        # an avro block is exactly ONE raw stream — trailing bytes
        # after its end marker are corruption, not a second member
        import zlib as _z

        data = bytearray(write_avro(SCHEMA, ROWS, codec="deflate"))
        # rebuild the single block with junk appended to its payload
        good = write_avro(SCHEMA, ROWS, codec="null")
        # simpler: craft via the writer internals is overkill; patch a
        # deflate container by appending to the payload is fiddly, so
        # assert at the helper level instead:
        from data_governance_spark.operators.archives import (
            bounded_decompress,
        )

        raw = _z.compress(b"payload")[2:-4] + b"JUNKJUNK"
        with pytest.raises(AvroError, match="trailing"):
            bounded_decompress(raw, "deflate", 10**6,
                               bomb_error=AvroError,
                               parse_error=AvroError,
                               multi_member=False)
        with pytest.raises(AvroError, match="truncated"):
            bounded_decompress(_z.compress(b"payload")[2:-4][:-2],
                               "deflate", 10**6,
                               bomb_error=AvroError,
                               parse_error=AvroError,
                               multi_member=False)


class TestSplitReads:
    SCHEMA = {"type": "record", "name": "R", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "blob", "type": "bytes"}]}

    def _rows(self, n=500):
        # every 11th blob CONTAINS the writer's sync marker bytes, so
        # the range scanner's candidate VALIDATION is load-bearing: a
        # coincidental marker inside a payload must not misalign it
        return [
            {"id": i, "name": None if i % 7 == 0 else f"n{i}",
             "blob": b"\x07" * 48 if i % 11 == 0 else b"x%d" % i}
            for i in range(n)
        ]

    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_exactly_once_over_tilings(self, tmp_path, codec):
        from data_governance_spark.sources.avro import avro_rows_range

        rows = self._rows()
        data = write_avro(self.SCHEMA, rows, codec=codec, block_rows=13)
        pth = tmp_path / "big.avro"
        pth.write_bytes(data)
        n = len(data)
        for split in (23, 101, 997, 4096, n, n + 50):
            got = []
            for s in range(0, n, split):
                got.extend(
                    avro_rows_range(str(pth), s, min(s + split, n))
                )
            assert sorted(got, key=lambda r: r["id"]) == rows, split

    def test_truncated_block_typed_even_at_range_start(self, tmp_path):
        from data_governance_spark.sources.avro import avro_rows_range

        data = write_avro(self.SCHEMA, self._rows(100), block_rows=9)
        pth = tmp_path / "t.avro"
        pth.write_bytes(data[:-20])
        with pytest.raises(AvroError, match="truncated"):
            got = []
            for s in range(0, len(data) - 20, 313):
                got.extend(
                    avro_rows_range(str(pth), s,
                                    min(s + 313, len(data) - 20))
                )

    def test_read_avro_split_matches_per_file_reader(
        self, spark, tmp_path
    ):
        from data_governance_spark.sources.avro import read_avro_split

        d = tmp_path / "huge"
        d.mkdir()
        rows = self._rows(800)
        (d / "a.avro").write_bytes(
            write_avro(self.SCHEMA, rows[:500], block_rows=21)
        )
        (d / "b.avro").write_bytes(
            write_avro(self.SCHEMA, rows[500:], block_rows=7)
        )
        df = read_avro_split(spark, str(d / "*.avro"), split_bytes=777)
        got = sorted(
            ((r["id"], r["name"], bytes(r["blob"])) for r in df.collect())
        )
        want = sorted(
            (r["id"], r["name"], r["blob"]) for r in rows
        )
        assert got == want
        ref = read_avro(spark, str(d / "*.avro"))
        assert df.schema == ref.schema

    def test_read_avro_split_param_and_missing(self, spark, tmp_path):
        from data_governance_spark.sources.avro import read_avro_split

        with pytest.raises(AvroError, match="split_bytes"):
            read_avro_split(spark, str(tmp_path / "x.avro"),
                            split_bytes=0)
        with pytest.raises(AvroError, match="stat"):
            read_avro_split(spark, str(tmp_path / "none.avro"))
