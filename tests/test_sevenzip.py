"""7z reader (operators/sevenzip.py): an independent WRITER twin
transcribed from the public 7zFormat.txt spec (the avro precedent —
no 7z tool or library exists in this environment), covering Copy /
LZMA1 / LZMA2 / bzip2 / deflate folders, solid and per-file layouts,
substream splitting, encoded headers, empty files + directories, CRC
verification, typed boundaries (AES, coder chains, unknown coders),
bomb caps, and never-raises-untyped fuzz.  The codec layer is stdlib
``lzma``/``bz2``/``zlib`` on BOTH sides — the twins share only the
public container spec, not code."""

from __future__ import annotations

import bz2
import lzma
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.sevenzip import (
    SevenZipBombError,
    SevenZipError,
    SevenZipParseError,
    SevenZipUnsupportedError,
    sevenzip_members,
)


# ===================================================================
# writer twin
# ===================================================================
def wnum(v: int) -> bytes:
    """7z NUMBER: inverse of the reader's codec — smallest i extra LE
    bytes with the first byte's top i bits set and its low (7-i) bits
    carrying the value's high part."""
    if v < 0x80:
        return bytes([v])
    for i in range(1, 8):
        if v < (1 << (7 - i)) << (8 * i):
            b0 = (0x100 - (1 << (8 - i))) | (v >> (8 * i))
            return bytes([b0]) + (v & ((1 << (8 * i)) - 1)).to_bytes(
                i, "little")
    return bytes([0xFF]) + v.to_bytes(8, "little")


def wbits(flags: list[bool]) -> bytes:
    out = bytearray()
    b = 0
    n = 0
    for f in flags:
        b = (b << 1) | int(f)
        n += 1
        if n == 8:
            out.append(b)
            b = n = 0
    if n:
        out.append(b << (8 - n))
    return bytes(out)


_CODECS = {
    # name -> (coder id, props, compress fn)
    "copy": (b"\x00", b"", lambda d: d),
    "lzma2": (
        b"\x21", bytes([24]),  # dict-size code 24 = 16 MiB
        lambda d: _lz(d, [{"id": lzma.FILTER_LZMA2,
                           "dict_size": 1 << 24}]),
    ),
    "lzma1": (
        b"\x03\x01\x01",
        bytes([93]) + struct.pack("<I", 1 << 20),  # lc3 lp0 pb2
        lambda d: _lz(d, [{"id": lzma.FILTER_LZMA1, "lc": 3, "lp": 0,
                           "pb": 2, "dict_size": 1 << 20}]),
    ),
    "bzip2": (b"\x04\x02\x02", b"", bz2.compress),
    "deflate": (b"\x04\x01\x08", b"", lambda d: _deflate(d)),
}


def _lz(d: bytes, filters) -> bytes:
    c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=filters)
    return c.compress(d) + c.flush()


def _deflate(d: bytes) -> bytes:
    c = zlib.compressobj(level=6, wbits=-15)
    return c.compress(d) + c.flush()


# two-coder BCJ/delta chains (r14): the folder lists the LZMA coder
# first and the branch filter second, bind pair (InIndex=1, OutIndex=0)
# routing LZMA's output into the filter — the shape 7-Zip itself
# writes. Branch filters are length-preserving, so both out-stream
# sizes equal the final size.
_CHAINS = {
    # name -> (branch id, branch props, lzma codec name, filter spec)
    "x86+lzma2": (b"\x03\x03\x01\x03", b"", "lzma2",
                  {"id": lzma.FILTER_X86}),
    "x86+lzma1": (b"\x03\x03\x01\x03", b"", "lzma1",
                  {"id": lzma.FILTER_X86}),
    "delta4+lzma2": (b"\x03", bytes([3]), "lzma2",
                     {"id": lzma.FILTER_DELTA, "dist": 4}),
    "arm+lzma2": (b"\x03\x03\x05\x01", b"", "lzma2",
                  {"id": lzma.FILTER_ARM}),
    "armt+lzma2": (b"\x03\x03\x07\x01", b"", "lzma2",
                   {"id": lzma.FILTER_ARMTHUMB}),
    "sparc+lzma2": (b"\x03\x03\x08\x05", b"", "lzma2",
                    {"id": lzma.FILTER_SPARC}),
    "ppc+lzma2": (b"\x03\x03\x02\x05", b"", "lzma2",
                  {"id": lzma.FILTER_POWERPC}),
    "ia64+lzma2": (b"\x03\x03\x04\x01", b"", "lzma2",
                   {"id": lzma.FILTER_IA64}),
}

_LZ_SPECS = {
    "lzma2": {"id": lzma.FILTER_LZMA2, "dict_size": 1 << 24},
    "lzma1": {"id": lzma.FILTER_LZMA1, "lc": 3, "lp": 0, "pb": 2,
              "dict_size": 1 << 20},
}


def _comp_fn(codec: str):
    if codec in _CHAINS:
        _, _, lzname, fspec = _CHAINS[codec]
        if fspec is None or lzname not in _LZ_SPECS:
            # boundary-shape tests (filter-over-bzip2, unknown branch):
            # the reader refuses BEFORE decoding, so bytes don't matter
            return _CODECS[lzname][2]
        return lambda d: _lz(d, [fspec, _LZ_SPECS[lzname]])
    return _CODECS[codec][2]


def _coder_bytes(cid: bytes, props: bytes) -> bytes:
    out = bytes([len(cid) | (0x20 if props else 0)]) + cid
    if props:
        out += wnum(len(props)) + props
    return out


def _folder_bytes(codec: str) -> bytes:
    if codec in _CHAINS:
        bid, bprops, lzname, _ = _CHAINS[codec]
        cid, props, _ = _CODECS[lzname]
        return (
            bytes([2])  # NumCoders
            + _coder_bytes(cid, props)   # coder 0: compressor
            + _coder_bytes(bid, bprops)  # coder 1: branch filter
            + wnum(1) + wnum(0)          # bind pair: filter.in <- lzma.out
        )
    cid, props, _ = _CODECS[codec]
    return bytes([1]) + _coder_bytes(cid, props)


def _n_out_streams(codec: str) -> int:
    return 2 if codec in _CHAINS else 1


def write_7z(
    files: list[tuple[str, bytes]],
    codec: str = "lzma2",
    solid: bool = True,
    dirs: tuple[str, ...] = (),
    encoded_header: bool = False,
    folder_crcs: bool = True,
) -> bytes:
    """ISO-down-to-the-byte 7z writer: signature header, packed
    streams, plain or LZMA2-ENCODED header."""
    comp = _comp_fn(codec)
    nonempty = [(n, d) for n, d in files if d]
    empty = [(n, d) for n, d in files if not d]
    if solid and nonempty:
        blobs = [b"".join(d for _, d in nonempty)]
        counts = [len(nonempty)]
    else:
        blobs = [d for _, d in nonempty]
        counts = [1] * len(nonempty)
    packs = [comp(b) for b in blobs]

    def streams_info(pack_pos: int, with_sub: bool) -> bytes:
        h = bytearray()
        h += wnum(0x06) + wnum(pack_pos) + wnum(len(packs))  # PackInfo
        h += wnum(0x09)
        for p in packs:
            h += wnum(len(p))
        h += wnum(0x00)
        h += wnum(0x07) + wnum(0x0B) + wnum(len(blobs)) + b"\x00"
        for _ in blobs:
            h += _folder_bytes(codec)
        h += wnum(0x0C)
        for b in blobs:
            # one size per OUT stream; branch filters are 1:1 so the
            # intermediate equals the final size
            for _ in range(_n_out_streams(codec)):
                h += wnum(len(b))
        if folder_crcs:
            h += wnum(0x0A) + b"\x01"  # allAreDefined
            for b in blobs:
                h += struct.pack("<I", zlib.crc32(b))
        h += wnum(0x00)  # end UnpackInfo
        if with_sub and (solid and len(nonempty) > 1):
            h += wnum(0x08) + wnum(0x0D)
            for c in counts:
                h += wnum(c)
            h += wnum(0x09)
            for (n, d) in nonempty[:-1]:
                h += wnum(len(d))
            # substream CRCs for multi-stream folders
            need = [d for d in (d for _, d in nonempty)] \
                if counts and counts[0] > 1 else []
            if need:
                h += wnum(0x0A) + b"\x01"
                for d in need:
                    h += struct.pack("<I", zlib.crc32(d))
            h += wnum(0x00)
        h += wnum(0x00)  # end StreamsInfo
        return bytes(h)

    # FilesInfo: order = non-empty files, then empty files, then dirs
    all_names = [n for n, _ in nonempty] + [n for n, _ in empty] \
        + list(dirs)
    n_files = len(all_names)
    fi = bytearray()
    fi += wnum(0x05) + wnum(n_files)
    es_flags = [False] * len(nonempty) + [True] * (len(empty)
                                                  + len(dirs))
    if any(es_flags):
        v = wbits(es_flags)
        fi += wnum(0x0E) + wnum(len(v)) + v
        ef_flags = [True] * len(empty) + [False] * len(dirs)
        if any(ef_flags):
            v = wbits(ef_flags)
            fi += wnum(0x0F) + wnum(len(v)) + v
    names = b"\x00" + b"".join(
        n.encode("utf-16-le") + b"\x00\x00" for n in all_names)
    fi += wnum(0x11) + wnum(len(names)) + names
    fi += wnum(0x00)

    hdr = wnum(0x01) + wnum(0x04) + streams_info(0, True) \
        + bytes(fi) + wnum(0x00)
    body = b"".join(packs)
    if encoded_header:
        hcomp = _lz(hdr, [{"id": lzma.FILTER_LZMA2,
                           "dict_size": 1 << 24}])
        enc = bytearray(wnum(0x17))
        enc += wnum(0x06) + wnum(len(body)) + wnum(1)
        enc += wnum(0x09) + wnum(len(hcomp)) + wnum(0x00)
        enc += wnum(0x07) + wnum(0x0B) + wnum(1) + b"\x00"
        enc += _folder_bytes("lzma2")
        enc += wnum(0x0C) + wnum(len(hdr))
        enc += wnum(0x0A) + b"\x01" + struct.pack("<I", zlib.crc32(hdr))
        enc += wnum(0x00) + wnum(0x00)
        body += hcomp
        hdr = bytes(enc)
    tail = struct.pack("<QQI", len(body), len(hdr), zlib.crc32(hdr))
    sig = b"7z\xbc\xaf\x27\x1c" + b"\x00\x04" \
        + struct.pack("<I", zlib.crc32(tail)) + tail
    return sig + body + hdr


def rows(data: bytes):
    return [(r["member"], r["size"], r["content"], r["err"])
            for r in sevenzip_members(data)]


FILES = [("docs/a.txt", b"first member body"),
         ("b.bin", bytes(range(256)) * 3),
         ("c.txt", b"third")]


# ===================================================================
# tests
# ===================================================================
class TestRoundTrips:
    @pytest.mark.parametrize("codec", sorted(_CODECS))
    @pytest.mark.parametrize("solid", [True, False])
    def test_codecs_solid_and_per_file(self, codec, solid):
        data = write_7z(FILES, codec=codec, solid=solid)
        assert rows(data) == [
            ("docs/a.txt", 17, b"first member body", None),
            ("b.bin", 768, bytes(range(256)) * 3, None),
            ("c.txt", 5, b"third", None),
        ]

    def test_empty_files_and_dirs(self):
        data = write_7z(
            [("a.txt", b"x"), ("empty.txt", b"")],
            dirs=("somedir", "another/dir"),
        )
        # dirs emit NO rows; the empty FILE keeps a b"" row
        assert rows(data) == [
            ("a.txt", 1, b"x", None),
            ("empty.txt", 0, b"", None),
        ]

    def test_encoded_header(self):
        data = write_7z(FILES, encoded_header=True)
        assert [r[0] for r in rows(data)] == \
            ["docs/a.txt", "b.bin", "c.txt"]

    def test_unicode_names(self):
        data = write_7z([("日本語/ファイル.txt", b"cjk")])
        assert rows(data) == [("日本語/ファイル.txt", 3, b"cjk", None)]

    def test_empty_archive(self):
        data = write_7z([])
        assert rows(data) == []

    def test_archive_properties_skipped(self):
        """kArchiveProperties (0x02) between kHeader and the streams
        info is reserved spec surface — must be skipped, not rejected."""
        data = write_7z(FILES)
        hdr_off = 32 + struct.unpack("<Q", data[12:20])[0]
        hdr = data[hdr_off:]
        assert hdr[0] == 0x01  # kHeader
        props = bytes([0x02, 0x30, 2, 0xAB, 0xCD, 0x00])  # one prop
        new_hdr = hdr[:1] + props + hdr[1:]
        body = data[32:hdr_off]
        tail = struct.pack("<QQI", len(body), len(new_hdr),
                           zlib.crc32(new_hdr))
        sig = data[:8] + struct.pack("<I", zlib.crc32(tail)) + tail
        patched = sig + body + new_hdr
        assert [r[0] for r in rows(patched)] == \
            ["docs/a.txt", "b.bin", "c.txt"]


class TestIntegrity:
    def test_folder_crc_verified(self):
        data = bytearray(write_7z([("a", b"payload body here")],
                                  codec="copy"))
        # flip a content byte: the folder CRC must catch it and
        # quarantine the member row (archive survives)
        idx = data.find(b"payload")
        data[idx] ^= 0xFF
        r = rows(bytes(data))
        assert r[0][3] == "SevenZipParseError"

    def test_next_header_crc_verified(self):
        data = bytearray(write_7z(FILES))
        data[-1] ^= 0xFF
        with pytest.raises(SevenZipParseError, match="CRC"):
            sevenzip_members(bytes(data))

    def test_signature_crc_verified(self):
        data = bytearray(write_7z(FILES))
        data[13] ^= 0xFF  # inside the 20-byte start-header area
        with pytest.raises(SevenZipParseError, match="CRC"):
            sevenzip_members(bytes(data))

    def test_bad_folder_quarantines_members_not_archive(self):
        # corrupt the LZMA2 pack stream of a solid folder: all its
        # members quarantine typed, the parse itself survives
        good = write_7z(FILES, codec="lzma2", solid=True)
        data = bytearray(good)
        data[40] ^= 0xFF  # inside the packed stream
        r = rows(bytes(data))
        assert len(r) == 3
        assert all(x[3] is not None for x in r)


class TestBoundaries:
    def test_aes_typed(self):
        # register a pseudo-codec that writes the AES coder id (the
        # content bytes are irrelevant — the reader must refuse the
        # folder typed-and-named before touching them)
        _CODECS["aes"] = (b"\x06\xf1\x07\x01", b"", lambda d: d)
        try:
            data = write_7z(FILES, codec="aes")
        finally:
            del _CODECS["aes"]
        r = rows(data)
        assert r and all(
            x[3] == "SevenZipUnsupportedError:7z-aes" for x in r)
        from data_governance_spark.operators.sevenzip import (
            _decode_single,
        )

        with pytest.raises(SevenZipUnsupportedError) as ei:
            _decode_single(b"\x06\xf1\x07\x01", b"", b"x", 1)
        assert ei.value.feature == "7z-aes"
        with pytest.raises(SevenZipUnsupportedError) as ei:
            _decode_single(b"\x09\x99", b"", b"x", 1)
        assert ei.value.feature.startswith("7z-coder-")

    def test_member_bomb_cap(self):
        data = write_7z([("big", bytes(200_000)), ("ok", b"fine")])
        r = [(m, s, e) for m, s, c, e in
             ((x["member"], x["size"], x["content"], x["err"])
              for x in sevenzip_members(data, max_member=1000))]
        assert r[0] == ("big", None, "SevenZipBombError")
        assert r[1] == ("ok", 4, None)

    def test_total_bomb_cap(self):
        data = write_7z(FILES)
        with pytest.raises(SevenZipBombError):
            sevenzip_members(data, max_total=10)

    def test_garbage_typed(self):
        for payload in (b"", b"7z\xbc\xaf\x27\x1c", b"junk",
                        b"7z\xbc\xaf\x27\x1c" + bytes(26)):
            with pytest.raises(SevenZipError):
                sevenzip_members(payload)


class TestFuzz:
    @settings(max_examples=120, deadline=None)
    @given(st.binary(max_size=1024))
    def test_random_tail_only_typed(self, tail):
        try:
            out = sevenzip_members(b"7z\xbc\xaf\x27\x1c" + tail)
            assert isinstance(out, list)
        except SevenZipError:
            pass

    @settings(max_examples=120, deadline=None)
    @given(st.integers(0, 10**9), st.integers(0, 255))
    def test_corrupted_valid_archive_only_typed(self, pos, val):
        d = bytearray(write_7z(FILES))
        d[pos % len(d)] = val
        try:
            out = sevenzip_members(bytes(d))
            assert isinstance(out, list)
        except SevenZipError:
            pass

    @settings(max_examples=60, deadline=None)
    @given(st.integers(0, 10**9), st.integers(0, 255))
    def test_corrupted_encoded_header_only_typed(self, pos, val):
        d = bytearray(write_7z(FILES, encoded_header=True))
        d[pos % len(d)] = val
        try:
            out = sevenzip_members(bytes(d))
            assert isinstance(out, list)
        except SevenZipError:
            pass


class TestNumberCodec:
    @settings(max_examples=200, deadline=None)
    @given(st.integers(0, (1 << 64) - 1))
    def test_wnum_reader_round_trip(self, v):
        from data_governance_spark.operators.sevenzip import _Rd

        r = _Rd(wnum(v))
        assert r.num() == v
        assert r.p == len(wnum(v))


# ===================================================================
# r14 hardening (r13 ADVICE + VERDICT nits)
# ===================================================================
def _repack(data: bytes, old: bytes, new: bytes) -> bytes:
    """Surgically replace a byte run inside the (plain) next header
    and re-seal both CRC tiers."""
    hdr_off = 32 + struct.unpack("<Q", data[12:20])[0]
    hdr = data[hdr_off:]
    assert old in hdr, "patch target not found"
    new_hdr = hdr.replace(old, new, 1)
    body = data[32:hdr_off]
    tail = struct.pack("<QQI", len(body), len(new_hdr),
                       zlib.crc32(new_hdr))
    sig = data[:8] + struct.pack("<I", zlib.crc32(tail)) + tail
    return sig + body + new_hdr


class TestR14Hardening:
    def test_bzip2_lying_unpack_size_bomb_capped(self):
        """r13 ADVICE (high): one-shot ``bz2.decompress`` materialized
        a bomb's full output before the declared-size check ran.  The
        cap must bind WHILE feeding the decompressor (``max_length``),
        like the LZMA and deflate paths."""
        import tracemalloc

        from data_governance_spark.operators.sevenzip import (
            _decode_single,
        )

        bomb = bz2.compress(bytes(8_000_000))  # ~8 MB of zeros
        tracemalloc.start()
        out = _decode_single(b"\x04\x02\x02", b"", bomb, 100)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert out == bytes(100)
        assert peak < 2_000_000, \
            f"bomb materialized {peak} bytes despite 100-byte claim"

    def test_bzip2_shorter_than_declared_typed(self):
        from data_governance_spark.operators.sevenzip import (
            _decode_single,
        )

        short = bz2.compress(b"abc")
        with pytest.raises(SevenZipParseError, match="shorter"):
            _decode_single(b"\x04\x02\x02", b"", short, 10)

    def test_substream_crc_verified_solid(self):
        """r13 ADVICE: solid-folder kCRC digests were parsed and
        discarded.  Corrupt ONE member of a copy-codec solid folder
        (the folder-tier CRC is only checked for single-stream
        folders): that member must quarantine, siblings survive."""
        data = bytearray(write_7z(FILES, codec="copy", solid=True))
        idx = data.find(b"third")
        assert idx > 0
        data[idx] ^= 0xFF
        r = rows(bytes(data))
        assert r[0][3] is None and r[1][3] is None
        assert r[2] == ("c.txt", None, None, "SevenZipParseError")

    def test_substream_crc_clean_solid_still_passes(self):
        data = write_7z(FILES, codec="copy", solid=True)
        assert all(x[3] is None for x in rows(data))

    def test_empty_file_before_empty_stream_typed(self):
        """r13 VERDICT nit: a hostile header ordering kEmptyFile
        before kEmptyStream silently turned empty files into
        directories (dropped rows); it must raise typed."""
        data = write_7z([("a.txt", b"x"), ("empty.txt", b"")],
                        dirs=("d",))
        # es = [False, True, True] -> 0x60 ; ef = [True, False] -> 0x80
        old = bytes([0x0E, 0x01, 0x60, 0x0F, 0x01, 0x80])
        new = bytes([0x0F, 0x01, 0x80, 0x0E, 0x01, 0x60])
        patched = _repack(data, old, new)
        with pytest.raises(SevenZipParseError, match="kEmptyFile"):
            sevenzip_members(patched)

    def test_odd_length_names_blob_typed(self):
        """r13 VERDICT nit: a trailing odd byte on the UTF-16 names
        vector parsed clean (the split loop never saw it); the blob
        must be exactly whole code units."""
        names = b"\x00" + b"".join(
            n.encode("utf-16-le") + b"\x00\x00"
            for n in ("docs/a.txt", "b.bin", "c.txt"))
        old = bytes([0x11]) + wnum(len(names)) + names
        new = bytes([0x11]) + wnum(len(names) + 1) + names + b"\xAA"
        patched = _repack(write_7z(FILES), old, new)
        with pytest.raises(SevenZipParseError, match="odd-length"):
            sevenzip_members(patched)


# ===================================================================
# r14: BCJ/delta filter chains (stdlib lzma raw filter lists)
# ===================================================================
CHAIN_FILES = [
    # x86-call-looking bytes (0xE8/0xE9 present) so BCJ actually
    # transforms; a delta-friendly ramp; and plain text
    ("bin/boot.so", bytes(range(256)) * 16),
    ("data.raw", bytes((i * 7) & 0xFF for i in range(4096))),
    ("readme.txt", b"plain text body that the filter passes through"),
]


class TestChains:
    @pytest.mark.parametrize("codec", sorted(_CHAINS))
    @pytest.mark.parametrize("solid", [True, False])
    def test_chain_roundtrip(self, codec, solid):
        data = write_7z(CHAIN_FILES, codec=codec, solid=solid)
        assert rows(data) == [
            (n, len(b), b, None) for n, b in CHAIN_FILES
        ]

    def test_chain_encoded_header(self):
        data = write_7z(CHAIN_FILES, codec="x86+lzma2",
                        encoded_header=True)
        assert [r[0] for r in rows(data)] == [n for n, _ in CHAIN_FILES]

    def test_chain_filter_order_agnostic(self):
        """7-Zip writes compressor-first; the reader must accept the
        filter-first layout too (roles resolved by coder id, bind pair
        checked per layout)."""
        data = write_7z(CHAIN_FILES, codec="x86+lzma2", solid=True)
        # locate the folder bytes: NumCoders=2, lzma2 coder, bcj coder,
        # bind pair (1, 0) -> swap to bcj-first with bind pair (0, 1)
        old = (bytes([2]) + _coder_bytes(b"\x21", bytes([24]))
               + _coder_bytes(b"\x03\x03\x01\x03", b"")
               + wnum(1) + wnum(0))
        new = (bytes([2]) + _coder_bytes(b"\x03\x03\x01\x03", b"")
               + _coder_bytes(b"\x21", bytes([24]))
               + wnum(0) + wnum(1))
        assert len(old) == len(new)
        patched = _repack(data, old, new)
        assert rows(patched) == [
            (n, len(b), b, None) for n, b in CHAIN_FILES
        ]

    def test_chain_corrupt_pack_quarantines(self):
        data = bytearray(write_7z(CHAIN_FILES, codec="delta4+lzma2",
                                  solid=True))
        data[40] ^= 0xFF  # inside the packed stream
        r = rows(bytes(data))
        assert len(r) == 3
        assert all(x[3] is not None for x in r)

    def test_chain_crc_still_verified(self):
        data = write_7z(CHAIN_FILES, codec="x86+lzma2", solid=False,
                        folder_crcs=True)
        assert all(x[3] is None for x in rows(data))

    def test_filter_over_bzip2_stays_typed(self):
        """liblzma can't put bzip2 at the end of a raw chain — the
        reader must refuse the folder NAMED, not misdecode."""
        _CHAINS["x86+bzip2"] = (b"\x03\x03\x01\x03", b"", "bzip2", None)
        try:
            data = write_7z(CHAIN_FILES, codec="x86+bzip2")
        finally:
            del _CHAINS["x86+bzip2"]
        r = rows(data)
        assert r and all(
            x[3] == "SevenZipUnsupportedError:7z-chain" for x in r)

    def test_unknown_branch_filter_stays_typed(self):
        """ARM64 (0x0a) has no stdlib constant — NAMED boundary."""
        _CHAINS["arm64+lzma2"] = (b"\x0a", b"", "lzma2", None)
        try:
            data = write_7z(CHAIN_FILES, codec="arm64+lzma2")
        finally:
            del _CHAINS["arm64+lzma2"]
        r = rows(data)
        assert r and all(
            x[3] == "SevenZipUnsupportedError:7z-chain" for x in r)

    def test_delta_props_required(self):
        from data_governance_spark.operators.sevenzip import (
            _branch_filter_spec,
        )

        assert _branch_filter_spec(b"\x03", bytes([3])) == {
            "id": lzma.FILTER_DELTA, "dist": 4}
        with pytest.raises(SevenZipParseError, match="delta"):
            _branch_filter_spec(b"\x03", b"")
        with pytest.raises(SevenZipParseError, match="x86"):
            _branch_filter_spec(b"\x03\x03\x01\x03", b"\x01")
        assert _branch_filter_spec(b"\x03\x03\x01\x03",
                                   struct.pack("<I", 16)) == {
            "id": lzma.FILTER_X86, "start_offset": 16}

    @settings(max_examples=80, deadline=None)
    @given(st.integers(0, 10**9), st.integers(0, 255))
    def test_corrupted_chain_archive_only_typed(self, pos, val):
        d = bytearray(write_7z(CHAIN_FILES, codec="x86+lzma2"))
        d[pos % len(d)] = val
        try:
            out = sevenzip_members(bytes(d))
            assert isinstance(out, list)
        except SevenZipError:
            pass
