"""Legacy Word .doc extraction (operators/cfb.py + office.doc_text):
an independent CFB WRITER + [MS-DOC] piece-table builder transcribed
from the public specs validate the reader end-to-end — multi-piece
mixed cp1252/UTF-16 text, out-of-order byte layout, both table
streams, the ccpText main-body cut, control-char scrub, encrypted
flag, mini-stream vs FAT-chained streams, hostile chain cycles, and
corruption fuzz (typed-only)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.cfb import CfbError, CfbFile
from data_governance_spark.operators.office import (
    OfficeEncryptedError,
    OfficeError,
    OfficeParseError,
    OfficeUnsupportedError,
    doc_text,
    office_format,
    office_text,
)

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD


# ===================================================================
# independent CFB writer ([MS-CFB] v3, 512-byte sectors)
# ===================================================================
def build_cfb(streams: list[tuple[str, bytes]], cutoff: int = 4096) -> bytes:
    """Minimal spec-conformant v3 compound file: directory first, then
    mini-FAT + mini-stream, then FAT-chained big streams, FAT last."""
    ssz, mssz = 512, 64

    def pad(b: bytes, n: int) -> bytes:
        return b + b"\0" * (-len(b) % n)

    minis = [(n, d) for n, d in streams if 0 < len(d) < cutoff]
    bigs = [(n, d) for n, d in streams if len(d) >= cutoff or len(d) == 0]

    # mini stream + miniFAT
    ministream = b""
    minifat: list[int] = []
    mini_start: dict[str, int] = {}
    for name, d in minis:
        first = len(ministream) // mssz
        k = (len(d) + mssz - 1) // mssz
        mini_start[name] = first
        ministream += pad(d, mssz)
        minifat.extend(range(first + 1, first + k))
        minifat.append(ENDOFCHAIN)

    n_dir = (1 + len(streams) + 3) // 4
    n_mf = (len(minifat) * 4 + ssz - 1) // ssz if minifat else 0
    n_ms = (len(ministream) + ssz - 1) // ssz
    big_lens = [(len(pad(d, ssz)) // ssz) if d else 0 for _, d in bigs]
    n_big = sum(big_lens)
    body = n_dir + n_mf + n_ms + n_big
    n_fat = 1
    while (body + n_fat + ssz // 4 - 1) // (ssz // 4) > n_fat:
        n_fat += 1
    total = body + n_fat

    # sector ids
    dir_start = 0
    mf_start = n_dir if n_mf else ENDOFCHAIN
    ms_start = n_dir + n_mf if n_ms else ENDOFCHAIN
    big_start: dict[str, int] = {}
    nxt = n_dir + n_mf + n_ms
    for (name, d), k in zip(bigs, big_lens):
        big_start[name] = nxt if k else ENDOFCHAIN
        nxt += k
    fat_ids = list(range(body, body + n_fat))

    # FAT
    fat = [FREESECT] * (n_fat * (ssz // 4))

    def chain(first: int, k: int):
        for i in range(k):
            fat[first + i] = first + i + 1 if i < k - 1 else ENDOFCHAIN

    chain(dir_start, n_dir)
    if n_mf:
        chain(mf_start, n_mf)
    if n_ms:
        chain(ms_start, n_ms)
    for (name, d), k in zip(bigs, big_lens):
        if k:
            chain(big_start[name], k)
    for f in fat_ids:
        fat[f] = FATSECT

    # directory
    def entry(name: str, otype: int, start: int, size: int,
              child: int = FREESECT) -> bytes:
        nm = name.encode("utf-16-le")
        e = bytearray(128)
        e[: len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm) + 2)
        e[66] = otype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, FREESECT, FREESECT, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    ents = [
        entry("Root Entry", 5, ms_start if n_ms else ENDOFCHAIN,
              len(ministream), child=1 if streams else FREESECT)
    ]
    for name, d in streams:
        if (name, d) in minis:
            ents.append(entry(name, 2, mini_start[name], len(d)))
        else:
            ents.append(entry(name, 2, big_start[name], len(d)))
    dir_bytes = pad(b"".join(ents), ssz)
    assert len(dir_bytes) == n_dir * ssz

    mf_bytes = pad(
        b"".join(struct.pack("<I", v) for v in minifat), ssz
    ) if n_mf else b""
    ms_bytes = pad(ministream, ssz)
    big_bytes = b"".join(pad(d, ssz) for _, d in bigs if d)
    fat_bytes = b"".join(struct.pack("<I", v) for v in fat)

    hdr = bytearray(512)
    hdr[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<HHHHH", hdr, 24, 0x3E, 3, 0xFFFE, 9, 6)
    struct.pack_into("<I", hdr, 44, n_fat)
    struct.pack_into("<I", hdr, 48, dir_start)
    struct.pack_into("<I", hdr, 56, cutoff)
    struct.pack_into("<I", hdr, 60, mf_start)
    struct.pack_into("<I", hdr, 64, n_mf)
    struct.pack_into("<I", hdr, 68, ENDOFCHAIN)
    struct.pack_into("<I", hdr, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<I", hdr, 76 + 4 * i,
            fat_ids[i] if i < len(fat_ids) else FREESECT,
        )
    out = bytes(hdr) + dir_bytes + mf_bytes + ms_bytes + big_bytes + fat_bytes
    assert len(out) == 512 + total * ssz
    return out


# ===================================================================
# [MS-DOC] writer: FIB + piece table
# ===================================================================
def word_doc(
    pieces: list[tuple[str, bool]],
    which_table: int = 0,
    encrypted: bool = False,
    extra_region: str | None = None,
    pad_word_to: int = 0,
    cutoff: int = 4096,
) -> bytes:
    """A real .doc: ``pieces`` are (text, compressed) for the MAIN
    body; ``extra_region`` adds a trailing piece PAST ccpText (the
    header/footnote cp space) that extraction must exclude.  Pieces
    are laid out in REVERSE byte order inside WordDocument so cp
    order != fc order."""
    fib = bytearray(0x600)
    struct.pack_into("<H", fib, 0, 0xA5EC)
    struct.pack_into("<H", fib, 2, 0x00C1)  # nFib: Word 97
    flags = (0x0200 if which_table else 0) | (0x0100 if encrypted else 0)
    struct.pack_into("<H", fib, 0x0A, flags)
    ccp = sum(len(t) for t, _ in pieces)
    struct.pack_into("<I", fib, 0x4C, ccp)

    all_pieces = list(pieces) + (
        [(extra_region, True)] if extra_region else []
    )
    # byte layout reversed vs cp order
    blobs = []
    for text, comp in all_pieces:
        blobs.append(
            text.encode("cp1252") if comp else text.encode("utf-16-le")
        )
    offsets: dict[int, int] = {}
    pos = len(fib)
    for i in reversed(range(len(all_pieces))):
        offsets[i] = pos
        pos += len(blobs[i])
    word = bytearray(pos)
    word[: len(fib)] = fib
    for i, b in enumerate(blobs):
        word[offsets[i] : offsets[i] + len(b)] = b

    cps = [0]
    for text, _ in all_pieces:
        cps.append(cps[-1] + len(text))
    plc = b"".join(struct.pack("<I", c) for c in cps)
    for i, (text, comp) in enumerate(all_pieces):
        fc = (offsets[i] * 2) | 0x40000000 if comp else offsets[i]
        plc += struct.pack("<HIH", 0, fc, 0)
    # a Prc block before the Pcdt exercises the skip loop
    clx = b"\x01\x04\x00JUNK" + b"\x02" + struct.pack("<I", len(plc)) + plc
    table = b"\xee" * 24 + clx  # nonzero fcClx
    struct.pack_into("<I", word, 0x01A2, 24)
    struct.pack_into("<I", word, 0x01A6, len(clx))
    if pad_word_to and len(word) < pad_word_to:
        word += b"\0" * (pad_word_to - len(word))

    streams = [
        ("WordDocument", bytes(word)),
        ("1Table" if which_table else "0Table", table),
        ("\x05SummaryInformation", b"\x00" * 48),
    ]
    return build_cfb(streams, cutoff=cutoff)


# ===================================================================
# CFB reader
# ===================================================================
class TestCfb:
    def test_round_trip_mini_and_big(self):
        big = b"B" * 9000
        small = b"small stream"
        data = build_cfb([("Big", big), ("Small", small)])
        cf = CfbFile(data)
        assert sorted(cf.streams()) == ["Big", "Small"]
        assert cf.read("Big") == big
        assert cf.read("Small") == small
        assert cf.read("small") == small  # case-insensitive
        assert cf.has("Big") and not cf.has("absent")
        with pytest.raises(CfbError, match="no stream"):
            cf.read("absent")

    def test_cutoff_zero_forces_fat_chains(self):
        data = build_cfb([("S", b"tiny")], cutoff=0)
        assert CfbFile(data).read("S") == b"tiny"

    def test_empty_stream(self):
        data = build_cfb([("E", b""), ("S", b"x" * 5000)])
        cf = CfbFile(data)
        assert cf.read("E") == b""
        assert cf.read("S") == b"x" * 5000

    def test_chain_cycle_detected(self):
        data = bytearray(build_cfb([("S", b"y" * 9000)]))
        # point the directory chain at itself via the FAT (last sector)
        fat_off = len(data) - 512
        struct.pack_into("<I", data, fat_off, 0)  # FAT[0] = 0 (dir cycle)
        with pytest.raises(CfbError, match="cycle"):
            CfbFile(bytes(data))

    def test_truncated_and_garbage(self):
        data = build_cfb([("S", b"z" * 9000)])
        with pytest.raises(CfbError):
            CfbFile(data[:700])
        with pytest.raises(CfbError):
            CfbFile(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\0" * 600)
        with pytest.raises(CfbError):
            CfbFile(b"not a compound file at all")


# ===================================================================
# .doc extraction
# ===================================================================
class TestDocText:
    def test_mixed_pieces_reverse_layout(self):
        d = word_doc(
            [("Compressed start. ", True),
             ("Unicode — café päragraph. ", False),
             ("Tail piece.", True)]
        )
        assert office_format(d) == "doc"
        assert doc_text(d) == (
            "Compressed start. Unicode — café päragraph. Tail piece."
        )
        assert office_text(d) == doc_text(d)

    def test_table_stream_selection(self):
        for which in (0, 1):
            d = word_doc([("table pick", True)], which_table=which)
            assert doc_text(d) == "table pick"

    def test_ccptext_cut_excludes_header_region(self):
        d = word_doc(
            [("main body only", True)],
            extra_region="HEADER TEXT MUST NOT APPEAR",
        )
        assert doc_text(d) == "main body only"

    def test_control_char_scrub(self):
        d = word_doc(
            [("para one\rpara two\x0bline\x07cell\x1ehy\x1fphen"
              "\x13 FIELD \x14result\x15 end", True)]
        )
        assert doc_text(d) == (
            "para one\npara two\nline\tcell-hyphen FIELD result end"
        )

    def test_big_word_stream_fat_path(self):
        d = word_doc([("fat-chained body", True)], pad_word_to=20_000)
        assert doc_text(d) == "fat-chained body"

    def test_encrypted_flag_raises(self):
        d = word_doc([("secret", True)], encrypted=True)
        with pytest.raises(OfficeEncryptedError, match="fEncrypted"):
            office_text(d)

    def test_legacy_xls_ppt_and_ecma_encrypted(self):
        # Workbook/PowerPoint Document streams now EXTRACT (BIFF8 /
        # record walk; empty content -> empty text); BIFF5 stays typed
        xls = build_cfb([("Workbook", b"\x09\x08\x00\x00" + b"\0" * 16)])
        assert office_text(xls) == ""
        b5 = build_cfb([("Book", b"\x09\x00\x04\x00\0\0\0\0")])
        with pytest.raises(OfficeUnsupportedError, match="BIFF5"):
            office_text(b5)
        ppt = build_cfb([("PowerPoint Document", b"\0" * 64)])
        assert office_text(ppt) == ""
        enc = build_cfb(
            [("EncryptionInfo", b"\x04\x00\x02\x00" + b"\0" * 40),
             ("EncryptedPackage", b"\0" * 64)]
        )
        with pytest.raises(OfficeEncryptedError, match="ECMA-376"):
            office_text(enc)
        other = build_cfb([("Whatever", b"\0" * 16)])
        with pytest.raises(OfficeUnsupportedError, match="recognized"):
            office_text(other)

    def test_structural_lies_typed(self):
        base = word_doc([("x", True)])
        cf = CfbFile(base)
        word = bytearray(cf.read("WordDocument"))
        # bad wIdent
        bad = bytearray(word)
        struct.pack_into("<H", bad, 0, 0x1234)
        d = build_cfb([("WordDocument", bytes(bad)),
                       ("0Table", cf.read("0Table"))])
        with pytest.raises(OfficeParseError, match="wIdent"):
            doc_text(d)
        # Clx out of bounds
        bad = bytearray(word)
        struct.pack_into("<I", bad, 0x01A2, 10_000_000)
        d = build_cfb([("WordDocument", bytes(bad)),
                       ("0Table", cf.read("0Table"))])
        with pytest.raises(OfficeParseError, match="bounds"):
            doc_text(d)
        # missing table stream
        d = build_cfb([("WordDocument", bytes(word))])
        with pytest.raises(OfficeParseError, match="0Table"):
            doc_text(d)

    @settings(max_examples=80, deadline=None)
    @given(st.integers(0, 10**9), st.integers(0, 255))
    def test_corruption_fuzz_only_typed(self, pos, val):
        d = bytearray(word_doc(
            [("stable main body text", True), ("uni", False)]
        ))
        d[pos % len(d)] = val
        try:
            out = office_text(bytes(d))
            assert isinstance(out, str)
        except OfficeError:
            pass

    @settings(max_examples=100, deadline=None)
    @given(st.binary(min_size=0, max_size=1600))
    def test_cfb_magic_fuzz_only_typed(self, tail):
        try:
            office_text(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + tail)
        except OfficeError:
            pass


def gate_doc_payload() -> tuple[bytes, str]:
    d = word_doc(
        [("Legacy piece one. ", True),
         ("Unicode — café. ", False),
         ("Last\rline.", True)],
        which_table=1,
        extra_region="EXCLUDED HEADER",
    )
    return d, "Legacy piece one. Unicode — café. Last\nline."


def test_gate_doc_payload_pin():
    from data_governance_spark.queries import sink_source_gates as g

    data, want = gate_doc_payload()
    assert office_text(data) == want
    assert bytes.fromhex(g._OFFICE_DOC_HEX) == data, (
        "q41 'office' planted .doc payload drifted from the writer"
    )
    assert g._OFFICE_DOC_TEXT == want
