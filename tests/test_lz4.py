"""lz4 decoder (operators/lz4.py): interop differential against REAL
lz4 frames (pyarrow bundles liblz4 — a genuine second implementation,
not a transcription), a from-spec frame writer for the paths real
encoders rarely emit (content size, block/content checksums, linked
blocks, uncompressed blocks, skippable and legacy frames) whose
output liblz4 itself decodes — so this module's XXH32 is verified by
the reference implementation in BOTH directions — plus mid-stream
bomb caps and never-raises-untyped fuzz."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.lz4 import (
    Lz4BombError,
    Lz4Error,
    Lz4ParseError,
    Lz4UnsupportedError,
    lz4_block_decompress,
    lz4_decompress,
    lz4_decompress_auto,
    xxh32,
)

pa = pytest.importorskip("pyarrow")
if not pa.Codec.is_available("lz4"):  # pragma: no cover
    pytest.skip("pyarrow without lz4", allow_module_level=True)


def lc(data: bytes) -> bytes:
    return pa.Codec("lz4").compress(data, asbytes=True)


def ld(data: bytes, size: int) -> bytes:
    return bytes(pa.Codec("lz4").decompress(data, decompressed_size=size))


# ===================================================================
# from-spec encoders (block + frame + legacy + skippable) — liblz4
# decodes their output, closing the differential loop
# ===================================================================
def spec_block(raw: bytes) -> bytes:
    """Greedy from-spec block compressor: hash the last position of
    every 4-gram, emit a match when one lands within the 64 KB
    window, honor the end-of-block rules (last 5 bytes literal, no
    match starting within the last 12)."""
    n = len(raw)
    out = bytearray()
    lit_start = 0
    pos = 0
    last: dict[bytes, int] = {}

    def emit(lit: bytes, mlen: int | None, off: int | None) -> None:
        ltok = min(len(lit), 15)
        mtok = 0 if mlen is None else min(mlen - 4, 15)
        out.append((ltok << 4) | mtok)
        if ltok == 15:
            rest = len(lit) - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)
        out.extend(lit)
        if mlen is None:
            return
        out.extend(struct.pack("<H", off))
        if mtok == 15:
            rest = mlen - 4 - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)

    while pos + 12 <= n:
        key = raw[pos : pos + 4]
        cand = last.get(key)
        last[key] = pos
        if cand is not None and pos - cand <= 65535:
            mlen = 4
            limit = n - 5  # matches must stop 5 bytes short of the end
            while (
                pos + mlen < limit
                and raw[cand + mlen] == raw[pos + mlen]
            ):
                mlen += 1
            if mlen >= 4:
                emit(raw[lit_start:pos], mlen, pos - cand)
                pos += mlen
                lit_start = pos
                continue
        pos += 1
    emit(raw[lit_start:], None, None)
    return bytes(out)


def spec_frame(
    content: bytes,
    *,
    block_size: int = 1 << 16,
    indep: bool = True,
    block_cksum: bool = False,
    content_size: bool = False,
    content_cksum: bool = False,
    bd_code: int = 4,
    raw_blocks: bool = False,
) -> bytes:
    """LZ4 Frame assembled field by field from the spec."""
    flg = (0b01 << 6) | (0x20 if indep else 0) \
        | (0x10 if block_cksum else 0) | (0x08 if content_size else 0) \
        | (0x04 if content_cksum else 0)
    desc = bytearray([flg, bd_code << 4])
    if content_size:
        desc += struct.pack("<Q", len(content))
    out = bytearray(struct.pack("<I", 0x184D2204))
    out += desc
    out.append((xxh32(bytes(desc)) >> 8) & 0xFF)
    for i in range(0, max(len(content), 1), block_size):
        chunk = content[i : i + block_size]
        if not chunk:
            break
        comp = None if raw_blocks else spec_block(chunk)
        if comp is None or len(comp) >= len(chunk):
            out += struct.pack("<I", 0x80000000 | len(chunk))
            body = chunk
        else:
            out += struct.pack("<I", len(comp))
            body = comp
        out += body
        if block_cksum:
            out += struct.pack("<I", xxh32(body))
    out += struct.pack("<I", 0)  # EndMark
    if content_cksum:
        out += struct.pack("<I", xxh32(content))
    return bytes(out)


def legacy_frame(content: bytes) -> bytes:
    out = bytearray(struct.pack("<I", 0x184C2102))
    for i in range(0, len(content), 8 * 1024 * 1024):
        comp = spec_block(content[i : i + 8 * 1024 * 1024])
        out += struct.pack("<I", len(comp)) + comp
    return bytes(out)


def skippable(payload: bytes, nibble: int = 3) -> bytes:
    return struct.pack("<II", 0x184D2A50 + nibble, len(payload)) + payload


def _shapes() -> dict[str, bytes]:
    random.seed(41)
    return {
        "empty": b"",
        "one": b"z",
        "short": b"hello world, hello world, hello world",
        "runs": b"ab" * 50_000,
        "text": bytes(
            random.choices(b"etaoin shrdlu\n", k=200_000)
        ),
        "binary": random.randbytes(150_000),
        "mixed": b"".join(
            random.choices(
                [b"the quick brown fox ", b"{\"k\": 1}\n",
                 random.randbytes(29)],
                k=9_000,
            )
        ),
    }


class TestXxh32:
    def test_public_vectors(self):
        # xxHash repository's documented check values
        assert xxh32(b"") == 0x02CC5D05
        assert xxh32(b"", seed=1) != xxh32(b"")

    def test_header_checksum_differential(self):
        # liblz4 computes the frame descriptor HC byte with ITS xxh32;
        # every pyarrow frame pins one byte of ours
        for raw in _shapes().values():
            fr = lc(raw)
            assert fr[6] == (xxh32(fr[4:6]) >> 8) & 0xFF

    def test_liblz4_accepts_our_checksums(self):
        # the reverse differential: frames with block AND content
        # checksums computed by THIS module decode under liblz4,
        # which verifies both — a wrong xxh32 would raise there
        for raw in _shapes().values():
            fr = spec_frame(
                raw, block_cksum=True, content_cksum=True,
                content_size=True,
            )
            assert ld(fr, len(raw)) == raw


class TestInterop:
    def test_all_shapes(self):
        for name, raw in _shapes().items():
            assert lz4_decompress(lc(raw)) == raw, name

    def test_multiframe_concat(self):
        fr = lc(b"alpha ") + lc(b"beta ") + lc(b"gamma")
        assert lz4_decompress(fr) == b"alpha beta gamma"

    def test_skippable_frames_between(self):
        fr = (skippable(b"metadata") + lc(b"alpha ")
              + skippable(b"", nibble=0) + lc(b"beta"))
        assert lz4_decompress(fr) == b"alpha beta"


class TestSpecFrames:
    @pytest.mark.parametrize("bd_code", [4, 5, 6, 7])
    def test_block_sizes(self, bd_code):
        raw = _shapes()["mixed"]
        fr = spec_frame(raw, block_size=1 << 14, bd_code=bd_code)
        assert lz4_decompress(fr) == raw
        assert ld(fr, len(raw)) == raw  # liblz4 agrees

    def test_content_size_verified(self):
        raw = b"payload " * 100
        fr = bytearray(spec_frame(raw, content_size=True))
        assert lz4_decompress(bytes(fr)) == raw
        # lie about the size (and re-fix the header checksum so the
        # size check itself is what trips)
        struct.pack_into("<Q", fr, 6, len(raw) + 1)
        fr[14] = (xxh32(bytes(fr[4:14])) >> 8) & 0xFF
        with pytest.raises(Lz4ParseError, match="content size"):
            lz4_decompress(bytes(fr))

    def test_content_checksum_verified(self):
        raw = b"payload " * 100
        fr = bytearray(spec_frame(raw, content_cksum=True))
        assert lz4_decompress(bytes(fr)) == raw
        fr[-1] ^= 0xFF
        with pytest.raises(Lz4ParseError, match="content checksum"):
            lz4_decompress(bytes(fr))

    def test_block_checksum_verified(self):
        raw = b"payload " * 100
        fr = bytearray(spec_frame(raw, block_cksum=True))
        assert lz4_decompress(bytes(fr)) == raw
        fr[-5] ^= 0x01  # inside the last block's checksum
        with pytest.raises(Lz4ParseError, match="checksum"):
            lz4_decompress(bytes(fr))

    def test_header_checksum_verified(self):
        fr = bytearray(spec_frame(b"x"))
        fr[6] ^= 0xFF
        with pytest.raises(Lz4ParseError, match="descriptor checksum"):
            lz4_decompress(bytes(fr))

    def test_uncompressed_blocks(self):
        raw = _shapes()["binary"]  # incompressible -> raw blocks
        fr = spec_frame(raw, raw_blocks=True)
        assert lz4_decompress(fr) == raw
        assert ld(fr, len(raw)) == raw

    def test_linked_blocks_cross_block_match(self):
        # a second block whose match reaches into the first —
        # liblz4 emits independent blocks, so build it by hand
        a = b"0123456789abcdef" * 16  # 256 bytes
        b_lit = b"??"
        # block 2: two literals, an 18-byte match at offset 258
        # (reaching into block 1), then the mandatory literal tail
        tail = b"!!!!!!!!!!!!"  # 12 literals: liblz4's end rules
        blk2 = (bytes([(2 << 4) | (18 - 4)]) + b_lit
                + struct.pack("<H", 258) + bytes([len(tail) << 4]) + tail)
        flg = (0b01 << 6)  # linked (no 0x20 bit)
        desc = bytes([flg, 4 << 4])
        fr = (struct.pack("<I", 0x184D2204) + desc
              + bytes([(xxh32(desc) >> 8) & 0xFF])
              + struct.pack("<I", 0x80000000 | len(a)) + a
              + struct.pack("<I", len(blk2)) + blk2
              + struct.pack("<I", 0))
        want = a + b_lit + (a + b_lit)[:18] + tail
        assert lz4_decompress(fr) == want
        assert ld(fr, len(want)) == want  # liblz4 agrees

    def test_independent_block_cannot_reach_back(self):
        # same frame but with Block_Indep set: the offset-258 match
        # now reaches before its own block start -> typed
        a = b"0123456789abcdef" * 16
        blk2 = (bytes([(2 << 4) | (18 - 4)]) + b"??"
                + struct.pack("<H", 258) + bytes([12 << 4])
                + b"!!!!!!!!!!!!")
        desc = bytes([(0b01 << 6) | 0x20, 4 << 4])
        fr = (struct.pack("<I", 0x184D2204) + desc
              + bytes([(xxh32(desc) >> 8) & 0xFF])
              + struct.pack("<I", 0x80000000 | len(a)) + a
              + struct.pack("<I", len(blk2)) + blk2
              + struct.pack("<I", 0))
        with pytest.raises(Lz4ParseError, match="history"):
            lz4_decompress(fr)

    def test_match_cannot_cross_frame_boundary(self):
        # frame 2's first block matches at offset 3 with nothing
        # decoded yet in THAT frame — must not read frame 1's output
        blk = bytes([(0 << 4) | (8 - 4)]) + struct.pack("<H", 3) \
            + bytes([0x10]) + b"x"
        desc = bytes([(0b01 << 6), 4 << 4])
        f2 = (struct.pack("<I", 0x184D2204) + desc
              + bytes([(xxh32(desc) >> 8) & 0xFF])
              + struct.pack("<I", len(blk)) + blk
              + struct.pack("<I", 0))
        with pytest.raises(Lz4ParseError, match="history"):
            lz4_decompress(lc(b"abcabcabc") + f2)

    def test_dictionary_typed_unsupported(self):
        desc = bytearray([(0b01 << 6) | 0x01, 4 << 4])
        desc += struct.pack("<I", 77)  # Dictionary_ID
        fr = (struct.pack("<I", 0x184D2204) + bytes(desc)
              + bytes([(xxh32(bytes(desc)) >> 8) & 0xFF]))
        with pytest.raises(Lz4UnsupportedError, match="dict") as ei:
            lz4_decompress(fr)
        assert ei.value.feature == "lz4-dict"  # structured, not sniffed

    def test_future_version_typed_unsupported(self):
        desc = bytes([(0b10 << 6), 4 << 4])
        fr = (struct.pack("<I", 0x184D2204) + desc
              + bytes([(xxh32(desc) >> 8) & 0xFF])
              + struct.pack("<I", 0))
        with pytest.raises(Lz4UnsupportedError, match="version") as ei:
            lz4_decompress(fr)
        assert ei.value.feature == "lz4-version"

    def test_reserved_bits_rejected(self):
        for flg, bd in (((0b01 << 6) | 0x02, 4 << 4), ((0b01 << 6), 0x48)):
            desc = bytes([flg, bd])
            fr = (struct.pack("<I", 0x184D2204) + desc
                  + bytes([(xxh32(desc) >> 8) & 0xFF]))
            with pytest.raises(Lz4ParseError, match="reserved"):
                lz4_decompress(fr)

    def test_skippable_only_input_is_empty(self):
        assert lz4_decompress(skippable(b"junk")) == b""


class TestLegacy:
    def test_roundtrip(self):
        for name, raw in _shapes().items():
            if not raw:
                continue
            assert lz4_decompress(legacy_frame(raw)) == raw, name

    def test_legacy_then_modern(self):
        fr = legacy_frame(b"old part ") + lc(b"new part")
        assert lz4_decompress(fr) == b"old part new part"

    def test_empty_legacy_typed(self):
        with pytest.raises(Lz4ParseError, match="no blocks"):
            lz4_decompress(struct.pack("<I", 0x184C2102))

    def test_over_8mb_block_is_parse_not_bomb(self):
        # a block expanding past the 8 MB LEGACY FORMAT limit under a
        # far larger caller cap is a format violation (parse), not a
        # bomb; under a small caller cap it IS a bomb (review catch:
        # the two quarantine columns must not conflate)
        blk = bytearray([(4 << 4) | 15]) + b"abcd" + struct.pack("<H", 4)
        ext = 9_000_000 - 4 - 15
        while ext >= 255:
            blk.append(255)
            ext -= 255
        blk.append(ext)
        blk += bytes([1 << 4]) + b"x"
        fr = (struct.pack("<I", 0x184C2102)
              + struct.pack("<I", len(blk)) + bytes(blk))
        with pytest.raises(Lz4ParseError, match="8 MB"):
            lz4_decompress(fr, max_out=1 << 30)
        with pytest.raises(Lz4BombError):
            lz4_decompress(fr, max_out=100_000)


class TestBombsAndFuzz:
    def test_declared_size_over_cap(self):
        fr = spec_frame(b"x" * 1000, content_size=True)
        with pytest.raises(Lz4BombError):
            lz4_decompress(fr, max_out=999)

    def test_cap_enforced_mid_stream(self):
        # no content-size field: a 4-byte seed + one huge match must
        # trip the cap DURING the copy, not after materializing it
        mlen = 10_000_000
        ext = mlen - 4 - 15
        blk = bytearray([(4 << 4) | 15]) + b"abcd" + struct.pack("<H", 4)
        while ext >= 255:
            blk.append(255)
            ext -= 255
        blk.append(ext)
        blk += bytes([0x10]) + b"x"  # final literal run
        desc = bytes([(0b01 << 6), 7 << 4])
        fr = (struct.pack("<I", 0x184D2204) + desc
              + bytes([(xxh32(desc) >> 8) & 0xFF])
              + struct.pack("<I", len(blk)) + bytes(blk)
              + struct.pack("<I", 0))
        with pytest.raises(Lz4BombError):
            lz4_decompress(fr, max_out=100_000)

    def test_block_decoding_past_declared_max_typed(self):
        # BD says 64 KB but the block expands to ~1 MB -> typed
        blk = bytearray([(4 << 4) | 15]) + b"abcd" + struct.pack("<H", 4)
        ext = 1_000_000 - 4 - 15
        while ext >= 255:
            blk.append(255)
            ext -= 255
        blk.append(ext)
        blk += bytes([0x10]) + b"x"
        desc = bytes([(0b01 << 6), 4 << 4])
        fr = (struct.pack("<I", 0x184D2204) + desc
              + bytes([(xxh32(desc) >> 8) & 0xFF])
              + struct.pack("<I", len(blk)) + bytes(blk)
              + struct.pack("<I", 0))
        with pytest.raises(Lz4ParseError, match="declared maximum"):
            lz4_decompress(fr)

    def test_garbage_typed(self):
        for bad in (b"", b"\x00", b"not lz4 at all", b"\x04\x22\x4d"):
            with pytest.raises(Lz4Error):
                lz4_decompress(bad)

    @settings(max_examples=300, deadline=None)
    @given(st.binary(min_size=0, max_size=400))
    def test_random_binary_only_typed(self, data):
        try:
            lz4_decompress(data, max_out=1 << 20)
        except Lz4Error:
            pass

    @settings(max_examples=400, deadline=None)
    @given(st.integers(min_value=0, max_value=4000),
           st.integers(min_value=0, max_value=255))
    @example(pos=6, val=0)    # header checksum byte
    @example(pos=4, val=255)  # FLG
    @example(pos=15, val=0)   # first block size word
    def test_corrupted_real_frame_only_typed(self, pos, val):
        raw = _shapes()["mixed"][:40_000]
        fr = bytearray(
            spec_frame(raw, block_size=1 << 14, block_cksum=True,
                       content_cksum=True, content_size=True)
        )
        fr[pos % len(fr)] = val
        try:
            got = lz4_decompress(bytes(fr), max_out=1 << 22)
        except Lz4Error:
            return
        # fully-checksummed frame: a mutation either raises typed or
        # was output-neutral — silent WRONG output must not survive
        assert got == raw

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=0, max_value=200),
           st.integers(min_value=0, max_value=255))
    def test_corrupted_block_only_typed(self, pos, val):
        blk = bytearray(spec_block(b"abcd" * 100 + b"tail-literals"))
        blk[pos % len(blk)] = val
        out = bytearray()
        try:
            lz4_block_decompress(bytes(blk), out, 0, 1 << 20)
        except Lz4Error:
            pass


class TestNativeFastPath:
    def test_parity_on_valid_frames(self, monkeypatch):
        monkeypatch.delenv("DG_SPARK_LZ4_NATIVE", raising=False)
        for raw in _shapes().values():
            fr = spec_frame(raw, content_size=True, content_cksum=True)
            assert lz4_decompress_auto(fr) == raw
            assert lz4_decompress_auto(fr) == lz4_decompress(fr)

    def test_no_content_size_routes_from_spec(self, monkeypatch):
        monkeypatch.delenv("DG_SPARK_LZ4_NATIVE", raising=False)
        # pyarrow frames carry no content size -> from-spec path;
        # answers must match anyway
        for raw in _shapes().values():
            fr = lc(raw)
            assert lz4_decompress_auto(fr) == raw

    def test_bomb_cap_identical(self, monkeypatch):
        monkeypatch.delenv("DG_SPARK_LZ4_NATIVE", raising=False)
        fr = spec_frame(b"y" * 5000, content_size=True)
        with pytest.raises(Lz4BombError):
            lz4_decompress_auto(fr, max_out=4999)

    def test_kill_switch(self, monkeypatch):
        monkeypatch.setenv("DG_SPARK_LZ4_NATIVE", "0")
        from data_governance_spark.operators import lz4 as m

        assert m._native_codec() is None
        raw = b"kill switch parity"
        fr = spec_frame(raw, content_size=True)
        assert lz4_decompress_auto(fr) == raw
