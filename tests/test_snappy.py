"""Framed snappy (operators/snappy.py): CRC32C pinned against the
RFC 3720 check value, the RAW block layer differentially tested
against pyarrow's bundled snappy in BOTH directions (its compressor's
output decodes through sources/avro.py's from-spec decoder; the
repo's literal-only compressor decodes under the reference library),
framing round-trips via the module's writer twin, chunk-type
semantics (padding/skippable/reserved/repeated-stream-id), mid-stream
bomb caps, and never-raises-untyped fuzz."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.snappy import (
    STREAM_ID,
    SnappyBombError,
    SnappyError,
    SnappyParseError,
    SnappyUnsupportedError,
    crc32c,
    snappy_frame_compress,
    snappy_frame_decompress,
)
from data_governance_spark.sources.avro import (
    AvroError,
    snappy_compress,
    snappy_decompress,
)

pa = pytest.importorskip("pyarrow")
if not pa.Codec.is_available("snappy"):  # pragma: no cover
    pytest.skip("pyarrow without snappy", allow_module_level=True)


def reference_frame(raw: bytes, chunk: int = 4096) -> bytes:
    """A framing stream whose 0x00 chunks carry REFERENCE-library raw
    payloads (real copy tags) — the q43 'arc' .tar.sz payload is
    pinned against this builder (deterministic: snappy has no levels
    and pyarrow's bundled encoder is stable, the gzip-payload
    standing)."""
    from data_governance_spark.operators.snappy import _mask

    c = pa.Codec("snappy")
    out = bytearray(STREAM_ID)
    for i in range(0, len(raw), chunk):
        piece = raw[i : i + chunk]
        enc = bytes(c.compress(piece))
        body = struct.pack("<I", _mask(crc32c(piece))) + enc
        out.append(0x00)
        out += len(body).to_bytes(3, "little") + body
    return bytes(out)


def _shapes() -> dict[str, bytes]:
    random.seed(43)
    return {
        "empty": b"",
        "one": b"q",
        "short": b"snappy snappy snappy",
        "runs": b"cd" * 60_000,
        "text": bytes(random.choices(b"etaoin shrdlu\n", k=180_000)),
        "binary": random.randbytes(120_000),
        "mixed": b"".join(
            random.choices(
                [b"lorem ipsum dolor ", b"<tr><td>1</td></tr>\n",
                 random.randbytes(23)],
                k=8_000,
            )
        ),
    }


class TestCrc32c:
    def test_rfc3720_check_value(self):
        # the canonical Castagnoli test vector (RFC 3720 B.4)
        assert crc32c(b"123456789") == 0xE3069283

    def test_empty_and_zeros(self):
        assert crc32c(b"") == 0
        # 32 zero bytes: another RFC 3720 B.4 vector
        assert crc32c(b"\x00" * 32) == 0x8A9136AA

    def test_ones_vector(self):
        # 32 x 0xFF: RFC 3720 B.4
        assert crc32c(b"\xff" * 32) == 0x62A8AB43


class TestRawDifferential:
    def test_reference_output_decodes_here(self):
        c = pa.Codec("snappy")
        for name, raw in _shapes().items():
            enc = bytes(c.compress(raw))
            assert snappy_decompress(enc) == raw, name

    def test_our_output_decodes_there(self):
        c = pa.Codec("snappy")
        for name, raw in _shapes().items():
            enc = snappy_compress(raw)
            got = bytes(c.decompress(enc, decompressed_size=len(raw)))
            assert got == raw, name


class TestFraming:
    @pytest.mark.parametrize("compress", [True, False])
    def test_roundtrip_all_shapes(self, compress):
        for name, raw in _shapes().items():
            fr = snappy_frame_compress(raw, compress=compress)
            assert snappy_frame_decompress(fr) == raw, name

    def test_small_chunks_multi(self):
        raw = _shapes()["mixed"]
        fr = snappy_frame_compress(raw, chunk=4096)
        assert snappy_frame_decompress(fr) == raw

    def test_reference_compressed_chunks_decode(self):
        # a framing stream whose 0x00 chunks carry REFERENCE-library
        # raw payloads (real copies/matches, not literal-only)
        raw = _shapes()["mixed"]
        assert snappy_frame_decompress(
            reference_frame(raw, chunk=65536)
        ) == raw

    def test_concatenated_streams(self):
        fr = (snappy_frame_compress(b"part one ")
              + snappy_frame_compress(b"part two"))
        # a second stream identifier mid-stream is the concatenation
        # idiom and must validate + skip
        assert snappy_frame_decompress(fr) == b"part one part two"

    def test_padding_and_skippable_chunks(self):
        fr = bytearray(snappy_frame_compress(b"payload"))
        fr += bytes([0xFE]) + (4).to_bytes(3, "little") + b"\x00" * 4
        fr += bytes([0x90]) + (2).to_bytes(3, "little") + b"zz"
        assert snappy_frame_decompress(bytes(fr)) == b"payload"

    def test_reserved_unskippable_typed_named(self):
        fr = bytearray(snappy_frame_compress(b"payload"))
        fr += bytes([0x42]) + (1).to_bytes(3, "little") + b"x"
        with pytest.raises(SnappyUnsupportedError) as ei:
            snappy_frame_decompress(bytes(fr))
        assert ei.value.feature == "snappy-chunk-42"

    def test_crc_mismatch_typed(self):
        fr = bytearray(snappy_frame_compress(b"payload payload"))
        fr[len(STREAM_ID) + 4] ^= 0xFF  # first CRC byte
        with pytest.raises(SnappyParseError, match="CRC32C"):
            snappy_frame_decompress(bytes(fr))

    def test_corrupted_repeated_stream_id_typed(self):
        fr = bytearray(snappy_frame_compress(b"a") + STREAM_ID)
        fr[-1] ^= 0xFF
        with pytest.raises(SnappyParseError, match="identifier"):
            snappy_frame_decompress(bytes(fr))

    def test_missing_stream_id_typed(self):
        with pytest.raises(SnappyParseError, match="identifier"):
            snappy_frame_decompress(b"\x01\x05\x00\x00xxxxx")

    def test_ceiling_enforced_on_uncompressed_chunk(self):
        from data_governance_spark.operators.snappy import _mask

        big = b"z" * 65537  # one byte past the framing ceiling
        body = struct.pack("<I", _mask(crc32c(big))) + big
        fr = (STREAM_ID + bytes([0x01])
              + len(body).to_bytes(3, "little") + body)
        with pytest.raises(SnappyParseError, match="ceiling"):
            snappy_frame_decompress(fr)

    def test_bomb_cap_chunk_by_chunk(self):
        raw = b"x" * 300_000
        fr = snappy_frame_compress(raw)
        with pytest.raises(SnappyBombError):
            snappy_frame_decompress(fr, max_out=299_999)

    def test_writer_rejects_oversized_chunk_param(self):
        with pytest.raises(SnappyParseError, match="chunk size"):
            snappy_frame_compress(b"x", chunk=65537)


class TestFuzz:
    def test_garbage_typed(self):
        for bad in (b"", b"\xff", b"sNaPpY", STREAM_ID[:-1],
                    b"not snappy framing at all"):
            with pytest.raises(SnappyError):
                snappy_frame_decompress(bad)

    @settings(max_examples=300, deadline=None)
    @given(st.binary(min_size=0, max_size=300))
    def test_random_binary_only_typed(self, data):
        try:
            snappy_frame_decompress(STREAM_ID + data, max_out=1 << 20)
        except SnappyError:
            pass

    @settings(max_examples=400, deadline=None)
    @given(st.integers(min_value=0, max_value=5000),
           st.integers(min_value=0, max_value=255))
    def test_corrupted_stream_only_typed(self, pos, val):
        raw = _shapes()["mixed"][:50_000]
        fr = bytearray(snappy_frame_compress(raw, chunk=8192))
        fr[pos % len(fr)] = val
        try:
            got = snappy_frame_decompress(bytes(fr), max_out=1 << 22)
        except SnappyError:
            return
        # every data chunk is CRC32C-protected: surviving decodes must
        # be output-neutral mutations (skippable/padding regions or
        # val == original)
        assert got == raw

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=0, max_value=2000),
           st.integers(min_value=0, max_value=255))
    def test_corrupted_raw_block_only_typed(self, pos, val):
        enc = bytearray(
            bytes(pa.Codec("snappy").compress(_shapes()["mixed"][:20_000]))
        )
        enc[pos % len(enc)] = val
        try:
            snappy_decompress(bytes(enc), max_out=1 << 22)
        except AvroError:
            pass
