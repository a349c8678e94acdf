"""zstd decoder (operators/zstd.py): interop differential against
REAL zstd frames (pyarrow bundles libzstd — a genuine second
implementation, not a transcription), a from-spec frame writer for
the paths real encoders rarely emit (RLE blocks, checksummed frames,
every FCS width, skippable frames, dictionary refusal), XXH64 public
vectors, mid-stream bomb caps, and never-raises-untyped fuzz."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.zstd import (
    ZstdBombError,
    ZstdError,
    ZstdParseError,
    ZstdUnsupportedError,
    xxh64,
    zstd_decompress,
)

pa = pytest.importorskip("pyarrow")
if not pa.Codec.is_available("zstd"):  # pragma: no cover
    pytest.skip("pyarrow without zstd", allow_module_level=True)


def zc(data: bytes, level: int = 3) -> bytes:
    return pa.Codec("zstd", compression_level=level).compress(
        data, asbytes=True)


# ===================================================================
# from-spec frame writer (raw/RLE blocks + full frame scaffolding —
# enough to pin the frame-layer paths libzstd won't emit)
# ===================================================================
def spec_frame(
    content: bytes,
    rle_runs: bool = False,
    checksum: bool = False,
    fcs_width: int | None = None,
    single_segment: bool = True,
    dict_id: int = 0,
) -> bytes:
    """RFC 8878 frame holding ``content`` as raw blocks (or RLE blocks
    for runs when ``rle_runs``), assembled field by field."""
    out = bytearray(struct.pack("<I", 0xFD2FB528))
    did_flag = 0 if dict_id == 0 else (1 if dict_id < 256 else 2)
    if fcs_width is None:
        fcs_width = 0
    fcs_flag = {0: 0, 1: 0, 2: 1, 4: 2, 8: 3}[fcs_width]
    fhd = (fcs_flag << 6) | (0x20 if single_segment else 0) \
        | (0x04 if checksum else 0) | did_flag
    out.append(fhd)
    if not single_segment:
        out.append(0x88)  # exponent 17, mantissa 0 -> 128 KB window
    if did_flag == 1:
        out.append(dict_id)
    elif did_flag == 2:
        out += struct.pack("<H", dict_id)
    if single_segment and fcs_width == 0:
        fcs_width = 1
        if len(content) > 255:
            fcs_width = 4
            fhd = (2 << 6) | (fhd & 0x3F)
            out[4] = fhd
    if fcs_width == 1:
        out.append(len(content))
    elif fcs_width == 2:
        assert len(content) >= 256
        out += struct.pack("<H", len(content) - 256)
    elif fcs_width == 4:
        out += struct.pack("<I", len(content))
    elif fcs_width == 8:
        out += struct.pack("<Q", len(content))
    # blocks: rle_runs True -> every run is an RLE block;
    # "auto" -> runs >= 64 become RLE, the rest accumulate raw
    # (compact deterministic frames for run-heavy payloads like tar)
    blocks = []
    if rle_runs and content:
        pending = bytearray()
        i = 0
        while i < len(content):
            j = i
            while j < len(content) and content[j] == content[i]:
                j += 1
            if rle_runs == "auto" and j - i < 64:
                pending += content[i:j]
            else:
                if pending:
                    blocks.append(("raw", bytes(pending)))
                    pending.clear()
                blocks.append(("rle", content[i:j]))
            i = j
        if pending:
            blocks.append(("raw", bytes(pending)))
    else:
        step = 65536
        for i in range(0, max(len(content), 1), step):
            blocks.append(("raw", content[i: i + step]))
    for k, (kind, chunk) in enumerate(blocks):
        last = 1 if k == len(blocks) - 1 else 0
        if kind == "raw":
            out += struct.pack("<I", last | (0 << 1)
                               | (len(chunk) << 3))[:3]
            out += chunk
        else:
            out += struct.pack("<I", last | (1 << 1)
                               | (len(chunk) << 3))[:3]
            out.append(chunk[0])
    if checksum:
        out += struct.pack("<I", xxh64(content) & 0xFFFFFFFF)
    return bytes(out)


def skippable(payload: bytes, nibble: int = 3) -> bytes:
    return struct.pack("<II", 0x184D2A50 + nibble, len(payload)) + payload


# ===================================================================
# XXH64 public vectors
# ===================================================================
class TestXxh64:
    def test_public_vectors(self):
        assert xxh64(b"") == 0xEF46DB3751D8E999
        assert xxh64(b"abc") == 0x44BC2CF5AD770999
        # longer-than-32-byte input exercises the 4-lane path
        assert xxh64(b"abcdefghijklmnopqrstuvwxyz0123456789") \
            == 0x64F23ECF1609B766
        assert xxh64(b"", seed=1) == 0xD5AFBA1336A3BE4B

    def test_matches_spark_xxhash64(self, spark):
        """Differential vs the JVM's xxhash64 (Spark exposes the same
        XXH64 over its serialized row form for LONG columns — use
        binary column form, seed 42)."""
        from pyspark.sql import functions as F

        rows = [(b"zstd checksum",), (b"",), (bytes(range(200)),)]
        df = spark.createDataFrame(rows, "b binary")
        got = [r[0] for r in
               df.select(F.xxhash64("b")).collect()]
        want = [_signed(xxh64(b, seed=42)) for (b,) in rows]
        assert got == want


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


# ===================================================================
# interop differential (the real gate: libzstd is the encoder)
# ===================================================================
def _shapes() -> dict[str, bytes]:
    rng = random.Random(13)
    words = ("the quick brown fox jumps over lazy zstd dog frame "
             "huffman sequence literal match offset corpus").split()
    return {
        "empty": b"",
        "one": b"a",
        "hello": b"hello world",
        "repetitive": b"hello hello hello zstd " * 10,
        "cycle": bytes(range(256)) * 40,
        "runs": b"abc" * 5000,
        "text": " ".join(rng.choice(words)
                         for _ in range(60_000)).encode(),
        "random": bytes(rng.getrandbits(8) for _ in range(120_000)),
        "semi": b"".join(bytes([rng.getrandbits(8)])
                         * rng.randint(1, 30) for _ in range(8_000)),
        "cjk": ("日本語テキストの統計解析、" * 2000).encode(),
    }


class TestInterop:
    @pytest.mark.parametrize("level", [1, 3, 9, 19])
    def test_all_shapes(self, level):
        for name, data in _shapes().items():
            assert zstd_decompress(zc(data, level)) == data, \
                f"{name} @ level {level}"

    def test_multiblock_and_multiframe(self):
        rng = random.Random(7)
        big = bytes(rng.getrandbits(8) & 0x3F
                    for _ in range(700_000))  # > 5 blocks
        assert zstd_decompress(zc(big)) == big
        a, b = zc(b"first frame "), zc(b"second")
        assert zstd_decompress(a + b) == b"first frame second"
        assert zstd_decompress(
            a + skippable(b"ignored metadata") + b
        ) == b"first frame second"


# ===================================================================
# frame-layer paths via the spec writer
# ===================================================================
class TestSpecFrames:
    def test_raw_and_rle_blocks(self):
        data = b"AAAAABBBBBBBBCCCCCCCCCCCCCCCCCC"
        assert zstd_decompress(spec_frame(data)) == data
        assert zstd_decompress(spec_frame(data, rle_runs=True)) == data
        assert zstd_decompress(spec_frame(b"")) == b""

    def test_checksum_verified(self):
        data = b"checksummed content"
        frame = spec_frame(data, checksum=True)
        assert zstd_decompress(frame) == data
        bad = bytearray(frame)
        bad[-1] ^= 0xFF
        with pytest.raises(ZstdParseError, match="checksum"):
            zstd_decompress(bytes(bad))

    @pytest.mark.parametrize("width,size", [(1, 200), (2, 300),
                                            (4, 300), (8, 300)])
    def test_every_fcs_width(self, width, size):
        data = bytes(size)  # width 1 caps at 255; width 2 floors at 256
        assert zstd_decompress(
            spec_frame(data, fcs_width=width)) == data

    def test_window_descriptor_path(self):
        data = b"window descriptor, not single-segment " * 20
        frame = spec_frame(data, single_segment=False, fcs_width=4)
        assert zstd_decompress(frame) == data

    def test_fcs_lie_rejected(self):
        frame = bytearray(spec_frame(bytes(300), fcs_width=4))
        frame[5] ^= 1  # FCS field now disagrees with the content
        with pytest.raises(ZstdParseError, match="declared"):
            zstd_decompress(bytes(frame))

    def test_dictionary_typed_unsupported(self):
        for did in (7, 1234):
            with pytest.raises(ZstdUnsupportedError, match="dict"):
                zstd_decompress(spec_frame(b"x", dict_id=did))

    def test_reserved_fhd_bit_rejected(self):
        frame = bytearray(spec_frame(b"x"))
        frame[4] |= 0x08
        with pytest.raises(ZstdParseError, match="reserved"):
            zstd_decompress(bytes(frame))

    def test_skippable_only_input(self):
        assert zstd_decompress(skippable(b"meta")) == b""


# ===================================================================
# hand-built one-sequence frames (predefined FSE tables): pin the
# frame-independence rule — an offset reaching into a PREVIOUS frame's
# bytes is corruption per RFC 8878, not usable history
# ===================================================================
def _state_for(default, sym: int) -> int:
    from data_governance_spark.operators.zstd import _fse_build_dtable

    al, probs = default
    for s, (symbol, _nb, _base) in enumerate(
            _fse_build_dtable(al, probs)):
        if symbol == sym:
            return s
    raise AssertionError(f"no state for symbol {sym}")


def _one_seq_frame(lit: bytes, ll_code: int, of_code: int,
                   of_extra: int) -> bytes:
    """Single-segment frame: one compressed block, raw literals, ONE
    sequence (ll from ll_code, ml=3, offset from of_code+of_extra),
    backward bitstream assembled by hand."""
    from data_governance_spark.operators import zstd as Z

    acc = 1  # sentinel
    for v, n in ((_state_for(Z._LL_DEFAULT, ll_code), 6),
                 (_state_for(Z._OF_DEFAULT, of_code), 5),
                 (_state_for(Z._ML_DEFAULT, 0), 6),
                 (of_extra, of_code)):
        acc = (acc << n) | v
    bs = acc.to_bytes((acc.bit_length() + 7) // 8, "little")
    block = bytes([len(lit) << 3]) + lit + bytes([1, 0]) + bs
    bh = struct.pack("<I", 1 | (2 << 1) | (len(block) << 3))[:3]
    regen = len(lit) + 3
    return struct.pack("<I", 0xFD2FB528) + bytes([0x20, regen]) \
        + bh + block


class TestFrameIndependence:
    def test_hand_built_sequence_decodes(self):
        # ll=4 literals, then match offset 3 (value 6 = code 2 + 2),
        # ml=3 -> "ABCD" + "BCD"
        assert zstd_decompress(_one_seq_frame(b"ABCD", 4, 2, 2)) \
            == b"ABCDBCD"

    def test_offset_past_frame_start_typed(self):
        # offset 15 (value 18 = code 4 + 2) with 1 byte of output
        bad = _one_seq_frame(b"A", 1, 4, 2)
        with pytest.raises(ZstdParseError, match="frame start"):
            zstd_decompress(bad)
        # and STILL typed when a previous frame supplied enough bytes
        # for the offset to land in — frames are independent
        with pytest.raises(ZstdParseError, match="frame start"):
            zstd_decompress(zc(b"0123456789abcdef" * 4) + bad)


# ===================================================================
# bomb caps + hostile bytes
# ===================================================================
class TestBombsAndFuzz:
    def test_cap_enforced_mid_stream(self):
        big = zc(bytes(5_000_000))  # 5 MB of zeros, tiny frame
        with pytest.raises(ZstdBombError):
            zstd_decompress(big, max_out=100_000)
        # cap respected exactly at the boundary
        data = bytes(100_000)
        assert zstd_decompress(zc(data), max_out=100_000) == data

    def test_garbage_typed(self):
        for payload in (b"", b"\x28\xb5\x2f", b"\x28\xb5\x2f\xfdjunk",
                        b"not zstd at all", bytes(16)):
            with pytest.raises(ZstdError):
                zstd_decompress(payload)
        with pytest.raises(ZstdParseError):
            zstd_decompress("not bytes")  # type: ignore[arg-type]

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=2048))
    def test_random_binary_only_typed(self, data):
        try:
            out = zstd_decompress(b"\x28\xb5\x2f\xfd" + data,
                                  max_out=1 << 20)
            assert isinstance(out, bytes)
        except ZstdError:
            pass

    @settings(max_examples=150, deadline=None)
    @example(pos=0, val=0)
    @given(st.integers(0, 10**9), st.integers(0, 255))
    def test_corrupted_real_frame_only_typed(self, pos, val):
        base = zc(b"hello hello hello zstd " * 8, 3)
        d = bytearray(base)
        d[pos % len(d)] = val
        try:
            out = zstd_decompress(bytes(d), max_out=1 << 20)
            assert isinstance(out, bytes)
        except ZstdError:
            pass

    @settings(max_examples=60, deadline=None)
    @given(st.integers(0, 10**9), st.integers(0, 255))
    def test_corrupted_big_text_frame_only_typed(self, pos, val):
        d = bytearray(_CORPUS_FRAME)
        d[pos % len(d)] = val
        try:
            out = zstd_decompress(bytes(d), max_out=1 << 22)
            assert isinstance(out, bytes)
        except ZstdError:
            pass


_rng = random.Random(99)
_WORDS = "alpha beta gamma delta zstd frame huffman fse".split()
_CORPUS_FRAME = zc(
    " ".join(_rng.choice(_WORDS) for _ in range(30_000)).encode(), 19
)


# ===================================================================
# r14: native fast path (zstd_decompress_auto) parity
# ===================================================================
class TestNativeFastPath:
    def test_parity_on_valid_frames(self):
        from data_governance_spark.operators.zstd import (
            zstd_decompress_auto,
        )

        rng = random.Random(14)
        cases = [zc(data, lv)
                 for data in _shapes().values()
                 for lv in (1, 9)]
        cases += [
            zc(bytes(rng.getrandbits(8) & 0x3F
                     for _ in range(400_000))),  # multi-block
            spec_frame(b"spec " * 100, checksum=True, fcs_width=4),
            spec_frame(b"", fcs_width=4),  # empty content, FCS=0
        ]
        for blob in cases:
            assert zstd_decompress_auto(blob) == zstd_decompress(blob)

    def test_multiframe_falls_back_same_answer(self):
        from data_governance_spark.operators.zstd import (
            zstd_decompress_auto,
        )

        blob = zc(b"first frame ") + skippable(b"meta") + zc(b"second")
        assert zstd_decompress_auto(blob) == b"first frame second"
        # skippable-FIRST blobs skip the fast path entirely
        blob2 = skippable(b"meta") + zc(b"only frame")
        assert zstd_decompress_auto(blob2) == b"only frame"

    def test_no_fcs_routes_to_from_spec(self):
        from data_governance_spark.operators import zstd as Z

        # single-segment frames ALWAYS carry an FCS byte; only a
        # windowed frame with fcs_flag=0 truly omits it
        blob = spec_frame(b"no fcs stated", fcs_width=0,
                          single_segment=False)
        assert Z._first_frame_fcs(blob) is None
        assert Z.zstd_decompress_auto(blob) == b"no fcs stated"
        # and the single-segment implied-FCS byte IS read by the
        # fast-path gate (it's a real declaration)
        ss = spec_frame(b"implied", fcs_width=0)
        assert Z._first_frame_fcs(ss) == 7

    def test_bomb_cap_identical(self):
        from data_governance_spark.operators.zstd import (
            ZstdBombError,
            zstd_decompress_auto,
        )

        blob = zc(bytes(1_000_000))
        with pytest.raises(ZstdBombError):
            zstd_decompress_auto(blob, max_out=1000)
        with pytest.raises(ZstdBombError):
            zstd_decompress(blob, max_out=1000)

    def test_corrupt_checksummed_frame_typed_both_paths(self):
        from data_governance_spark.operators.zstd import (
            zstd_decompress_auto,
        )

        blob = bytearray(spec_frame(b"payload " * 500, checksum=True,
                                    fcs_width=4))
        blob[len(blob) // 2] ^= 0xFF
        with pytest.raises(ZstdParseError):
            zstd_decompress_auto(bytes(blob))
        with pytest.raises(ZstdParseError):
            zstd_decompress(bytes(blob))

    def test_trailing_garbage_typed_both_paths(self):
        from data_governance_spark.operators.zstd import (
            zstd_decompress_auto,
        )

        blob = zc(b"valid frame") + b"\xde\xad\xbe\xef"
        with pytest.raises(ZstdParseError):
            zstd_decompress_auto(blob)
        with pytest.raises(ZstdParseError):
            zstd_decompress(blob)

    def test_kill_switch(self, monkeypatch):
        from data_governance_spark.operators import zstd as Z

        calls = []
        real = Z.zstd_decompress

        def spy(data, max_out=1 << 30):
            calls.append(len(data))
            return real(data, max_out)

        monkeypatch.setattr(Z, "zstd_decompress", spy)
        blob = zc(b"switchable content")
        monkeypatch.setenv("DG_SPARK_ZSTD_NATIVE", "0")
        assert Z.zstd_decompress_auto(blob) == b"switchable content"
        assert calls, "kill switch did not route to the from-spec path"
        calls.clear()
        monkeypatch.delenv("DG_SPARK_ZSTD_NATIVE")
        assert Z.zstd_decompress_auto(blob) == b"switchable content"
        assert not calls, "native path not taken with switch off"

    @settings(max_examples=120, deadline=None)
    @given(st.binary(max_size=256), st.integers(0, 10**9),
           st.integers(0, 255))
    def test_auto_never_raises_untyped(self, tail, pos, val):
        from data_governance_spark.operators.zstd import (
            ZstdError,
            zstd_decompress_auto,
        )

        blob = bytearray(zc(b"fuzz me " * 30) + tail)
        blob[pos % len(blob)] = val
        try:
            zstd_decompress_auto(bytes(blob))
        except ZstdError:
            pass
