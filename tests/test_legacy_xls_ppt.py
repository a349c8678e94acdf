"""Legacy .xls (BIFF8) and .ppt extraction (office.xls_text /
ppt_text over operators/cfb.py): spec-writer round trips incl. the
SST CONTINUE split rule, all RK forms, MULRK, record nesting,
encryption records, BIFF5 detection, corruption fuzz (typed-only),
and the q41 gate payload pins."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.office import (
    OfficeEncryptedError,
    OfficeError,
    OfficeParseError,
    OfficeUnsupportedError,
    office_format,
    office_text,
    ppt_text,
    xls_text,
)
from tests.test_doc import build_cfb


# ===================================================================
# writers ([MS-PPT] records / [MS-XLS] BIFF8)
# ===================================================================
def prec(rectype: int, body: bytes, container: bool = False,
         instance: int = 0) -> bytes:
    verinst = (0xF if container else 0) | (instance << 4)
    return struct.pack("<HHI", verinst, rectype, len(body)) + body


def make_ppt(records: bytes) -> bytes:
    return build_cfb(
        [("PowerPoint Document", records), ("Current User", b"\0" * 16)]
    )


def brec(rid: int, body: bytes) -> bytes:
    return struct.pack("<HH", rid, len(body)) + body


def sst_record(strings: list[str], compressed: set[int] = frozenset(),
               rich_runs: dict[int, int] | None = None) -> bytes:
    body = struct.pack("<ii", len(strings), len(strings))
    for i, s_ in enumerate(strings):
        rich = (rich_runs or {}).get(i, 0)
        grp = (0 if i in compressed else 1) | (0x08 if rich else 0)
        body += struct.pack("<HB", len(s_), grp)
        if rich:
            body += struct.pack("<H", rich)
        body += (s_.encode("latin-1") if i in compressed
                 else s_.encode("utf-16-le"))
        body += b"\0" * (4 * rich)  # FormatRun placeholders
    return brec(0x00FC, body)


def labelsst(rw, col, isst):
    return brec(0x00FD, struct.pack("<HHHi", rw, col, 0, isst))


def number(rw, col, v):
    return brec(0x0203, struct.pack("<HHH", rw, col, 0)
                + struct.pack("<d", v))


def rkrec(rw, col, rk):
    return brec(0x027E, struct.pack("<HHHI", rw, col, 0, rk))


def make_xls(cells: bytes, sst: bytes = b"") -> bytes:
    wb = (brec(0x0809, struct.pack("<HHHHI", 0x0600, 5, 0, 0, 0))
          + sst + cells + brec(0x000A, b""))
    return build_cfb([("Workbook", wb)])


# ===================================================================
# PPT
# ===================================================================
class TestPpt:
    def test_atoms_in_nested_containers(self):
        slide = (prec(0x0FA0, "Unicode títle".encode("utf-16-le"))
                 + prec(0x0FA8, "Byte¶text".encode("cp1252")))
        doc = prec(0x03E8, prec(0x0FBA, "CStr".encode("utf-16-le"))
                   + prec(0x03E9, slide, container=True),
                   container=True)
        p = make_ppt(doc)
        assert office_format(p) == "ppt"
        assert ppt_text(p) == "CStr\nUnicode títle\nByte¶text"
        assert office_text(p) == ppt_text(p)

    def test_cr_and_vt_become_newlines(self):
        p = make_ppt(prec(0x0FA8, b"line one\rline two\x0bline three"))
        assert ppt_text(p) == "line one\nline two\nline three"

    def test_truncated_tail_keeps_parsed_text(self):
        rec = prec(0x0FA8, b"kept text")
        trunc = rec + struct.pack("<HHI", 0, 0x0FA8, 100) + b"short"
        assert ppt_text(make_ppt(trunc)) == "kept text"

    def test_encrypted_raises(self):
        p = make_ppt(prec(0x2F14, b"\0" * 8, container=True))
        with pytest.raises(OfficeEncryptedError, match="ppt"):
            office_text(p)

    def test_deep_nesting_typed(self):
        body = prec(0x0FA8, b"x")
        for _ in range(100):
            body = prec(0x03E8, body, container=True)
        with pytest.raises(OfficeParseError, match="nesting"):
            ppt_text(make_ppt(body))


# ===================================================================
# XLS
# ===================================================================
class TestXls:
    def test_cell_records_and_row_layout(self):
        sst = sst_record(["hello", "wörld"])
        cells = (labelsst(0, 0, 0) + number(0, 1, 42.5)
                 + rkrec(0, 2, (7 << 2) | 2)
                 + labelsst(1, 0, 1)
                 + rkrec(1, 1, ((1250 << 2) | 2) | 1))  # int/100
        x = make_xls(cells, sst)
        assert office_format(x) == "xls"
        assert xls_text(x) == "hello\t42.5\t7\nwörld\t12.5"

    def test_rk_forms(self):
        # float-payload RK: top 30 bits of an IEEE double
        import struct as _s

        bits = _s.unpack("<Q", _s.pack("<d", 2.5))[0]
        rk_float = (bits >> 32) & 0xFFFFFFFC
        neg = (-30) & ((1 << 30) - 1)  # 30-bit negative int
        cells = (rkrec(0, 0, rk_float)
                 + rkrec(0, 1, (neg << 2) | 2)
                 + rkrec(0, 2, rk_float | 1))  # 2.5/100
        assert xls_text(make_xls(cells)) == "2.5\t-30\t0.025"

    def test_mulrk(self):
        body = (struct.pack("<HH", 3, 0)
                + struct.pack("<HI", 0, (5 << 2) | 2)
                + struct.pack("<HI", 0, (6 << 2) | 2)
                + struct.pack("<H", 1))
        x = make_xls(brec(0x00BD, body))
        assert xls_text(x) == "5\t6"

    def test_sst_continue_split_with_fresh_flags(self):
        # a string split across SST/CONTINUE: the continuation opens
        # with a NEW grpbit byte (here: compressed tail after a
        # unicode head — the corner the spec calls out)
        head = "ABC"
        tail = "defg"
        sst_body = struct.pack("<ii", 1, 1)
        sst_body += struct.pack("<HB", len(head) + len(tail), 1)
        sst_body += head.encode("utf-16-le")
        cont = bytes([0]) + tail.encode("latin-1")
        wb = (brec(0x0809, struct.pack("<HHHHI", 0x0600, 5, 0, 0, 0))
              + brec(0x00FC, sst_body) + brec(0x003C, cont)
              + labelsst(0, 0, 0) + brec(0x000A, b""))
        x = build_cfb([("Workbook", wb)])
        assert xls_text(x) == "ABCdefg"

    def test_compressed_and_rich_sst(self):
        sst = sst_record(["plain", "rïch"], compressed={0},
                         rich_runs={1: 2})
        cells = labelsst(0, 0, 0) + labelsst(0, 1, 1)
        assert xls_text(make_xls(cells, sst)) == "plain\trïch"

    def test_bad_sst_index_typed(self):
        x = make_xls(labelsst(0, 0, 9), sst_record(["only"]))
        with pytest.raises(OfficeParseError, match="out of range"):
            xls_text(x)

    def test_encrypted_and_biff5(self):
        x = make_xls(brec(0x002F, b"\0\0\0\0"))
        with pytest.raises(OfficeEncryptedError, match="xls"):
            office_text(x)
        b5 = build_cfb([("Book", b"\x09\x00\x04\x00\0\0\0\0")])
        with pytest.raises(OfficeUnsupportedError, match="BIFF5"):
            office_text(b5)

    def test_inline_label(self):
        body = (struct.pack("<HHH", 2, 0, 0)
                + struct.pack("<HB", 4, 0) + b"text")
        x = make_xls(brec(0x0204, body))
        assert xls_text(x) == "text"


class TestFuzz:
    @settings(max_examples=60, deadline=None)
    @given(st.integers(0, 10**9), st.integers(0, 255))
    def test_corrupted_xls_typed_only(self, pos, val):
        d = bytearray(make_xls(
            labelsst(0, 0, 0) + number(1, 0, 3.25),
            sst_record(["stable string content"]),
        ))
        d[pos % len(d)] = val
        try:
            out = office_text(bytes(d))
            assert isinstance(out, str)
        except OfficeError:
            pass

    @settings(max_examples=60, deadline=None)
    @given(st.integers(0, 10**9), st.integers(0, 255))
    def test_corrupted_ppt_typed_only(self, pos, val):
        base = make_ppt(
            prec(0x03E8, prec(0x0FA8, b"stable ppt body text"),
                 container=True)
        )
        d = bytearray(base)
        d[pos % len(d)] = val
        try:
            out = office_text(bytes(d))
            assert isinstance(out, str)
        except OfficeError:
            pass


# ===================================================================
# gate payload pins (q41 'office' xls/ppt)
# ===================================================================
def gate_payloads() -> dict[str, tuple[bytes, str]]:
    xls = make_xls(
        labelsst(0, 0, 0) + number(0, 1, 19.5)
        + rkrec(1, 0, (64 << 2) | 2) + labelsst(1, 1, 1),
        sst_record(["planted cell", "tail"]),
    )
    ppt = make_ppt(
        prec(0x03E8,
             prec(0x0FA0, "Planted slide".encode("utf-16-le"))
             + prec(0x0FA8, b"byte atom"),
             container=True)
    )
    return {
        "xls9": (xls, "planted cell\t19.5\n64\ttail"),
        "ppt9": (ppt, "Planted slide\nbyte atom"),
    }


def test_gate_payloads_extract():
    for key, (data, want) in gate_payloads().items():
        assert office_text(data) == want, key


def test_gate_payload_pin():
    from data_governance_spark.queries import sink_source_gates as g

    for key, (data, want) in gate_payloads().items():
        pinned = getattr(g, f"_OFFICE_{key.upper()}_HEX")
        assert bytes.fromhex(pinned) == data, (
            f"q41 'office' planted payload {key} drifted"
        )
        assert getattr(g, f"_OFFICE_{key.upper()}_TEXT") == want


class TestSstBounds:
    def test_trailing_padding_not_ghost_strings(self):
        # cstUnique bounds the parse — trailing junk after the last
        # string must not fabricate entries (review finding)
        body = struct.pack("<ii", 1, 1)
        body += struct.pack("<HB", 2, 1) + "ok".encode("utf-16-le")
        body += b"\x00" * 12  # padding that LOOKS like another header
        wb = (brec(0x0809, struct.pack("<HHHHI", 0x0600, 5, 0, 0, 0))
              + brec(0x00FC, body) + labelsst(0, 0, 0)
              + brec(0x000A, b""))
        x = build_cfb([("Workbook", wb)])
        assert xls_text(x) == "ok"
        # and an index into the ghost region is typed out-of-range
        wb2 = (brec(0x0809, struct.pack("<HHHHI", 0x0600, 5, 0, 0, 0))
               + brec(0x00FC, body) + labelsst(0, 0, 1)
               + brec(0x000A, b""))
        with pytest.raises(OfficeParseError, match="out of range"):
            xls_text(build_cfb([("Workbook", wb2)]))

    def test_huge_cst_unique_typed(self):
        body = struct.pack("<ii", 2_000_000, 2_000_000)
        wb = (brec(0x0809, struct.pack("<HHHHI", 0x0600, 5, 0, 0, 0))
              + brec(0x00FC, body) + brec(0x000A, b""))
        with pytest.raises(OfficeParseError, match="declares"):
            xls_text(build_cfb([("Workbook", wb)]))

    def test_declared_more_than_present_typed(self):
        body = struct.pack("<ii", 3, 3)
        body += struct.pack("<HB", 2, 1) + "ab".encode("utf-16-le")
        wb = (brec(0x0809, struct.pack("<HHHHI", 0x0600, 5, 0, 0, 0))
              + brec(0x00FC, body) + brec(0x000A, b""))
        with pytest.raises(OfficeParseError, match="SST"):
            xls_text(build_cfb([("Workbook", wb)]))
