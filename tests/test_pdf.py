"""PDF text-extraction tests (operators/pdf.py).

Strategy mirrors the codec suites (test_vp8l/test_jpeg): a minimal SPEC
WRITER builds real PDFs from scratch — correct offsets, xref, trailer —
so every feature round-trips against an independently-constructed file,
and the malformed cases (truncated xref, lying /Length, encryption,
unsupported filters, image-only pages) are produced by deliberately
corrupting writer output, not by hand-typed blobs.
"""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.pdf import (
    PdfEncryptedError,
    PdfError,
    PdfImageOnlyError,
    PdfParseError,
    PdfUnsupportedFilterError,
    extract_pdf_text,
    pdf_text,
)

# --------------------------------------------------------------------------
# spec writer
# --------------------------------------------------------------------------


def build_pdf(objs: dict[int, bytes], trailer: bytes) -> bytes:
    """Assemble numbered object bodies into a complete PDF: header,
    bodies, a CORRECT xref table, and the trailer dict."""
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_pos = len(out)
    maxn = max(objs) if objs else 0
    out += f"xref\n0 {maxn + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, maxn + 1):
        if num in objs:
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        else:
            out += b"0000000000 65535 f \n"
    out += b"trailer\n" + trailer
    out += f"\nstartxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out)


def stream_body(d: bytes, data: bytes) -> bytes:
    """A stream object body: dict (with /Length injected) + data."""
    return (
        b"<< " + d + f" /Length {len(data)} >>".encode()
        + b"\nstream\n" + data + b"\nendstream"
    )


def simple_pdf(
    content: bytes,
    font_body: bytes = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    compress: bool = False,
    extra: dict[int, bytes] | None = None,
    page_extra: bytes = b"",
    trailer_extra: bytes = b"",
) -> bytes:
    """One-page skeleton: 1=catalog 2=pages 3=page 4=content 5=font."""
    if compress:
        cbody = stream_body(b"/Filter /FlateDecode", zlib.compress(content))
    else:
        cbody = stream_body(b"", content)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R "
            + page_extra + b" >>"
        ),
        4: cbody,
        5: font_body,
    }
    if extra:
        objs.update(extra)
    return build_pdf(objs, b"<< /Size 6 /Root 1 0 R " + trailer_extra + b">>")


HELLO = b"BT /F1 12 Tf 72 720 Td (Hello World) Tj ET"


# --------------------------------------------------------------------------
# happy paths
# --------------------------------------------------------------------------


def test_simple_tj():
    assert pdf_text(simple_pdf(HELLO)) == "Hello World"


def test_flate_content():
    assert pdf_text(simple_pdf(HELLO, compress=True)) == "Hello World"


def test_td_newlines_and_same_line():
    content = (
        b"BT /F1 12 Tf 72 720 Td (Line one) Tj "
        b"0 -14 Td (Line two) Tj "
        b"200 0 Td ( cont) Tj "  # ty=0: same line
        b"0 -14 Td (Line three) Tj ET"
    )
    assert pdf_text(simple_pdf(content)) == "Line one\nLine two cont\nLine three"


def test_tstar_quote_dquote():
    content = (
        b"BT /F1 12 Tf 14 TL 72 720 Td (A) Tj T* (B) Tj "
        b"(C) ' 1 2 (D) \" ET"
    )
    assert pdf_text(simple_pdf(content)) == "A\nB\nC\nD"


def test_tm_vertical_move_breaks_line():
    content = (
        b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (X) Tj "
        b"1 0 0 1 300 720 Tm (Y) Tj "  # same y: same line
        b"1 0 0 1 72 700 Tm (Z) Tj ET"
    )
    assert pdf_text(simple_pdf(content)) == "XY\nZ"


def test_tj_kerning_vs_word_gap():
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"[(Hel) -20 (lo) -250 (World) 50 (!)] TJ ET"
    )
    assert pdf_text(simple_pdf(content)) == "Hello World!"


def test_contents_array():
    pdf = simple_pdf(b"", extra={
        6: stream_body(b"", b"BT /F1 10 Tf 72 720 Td (part one) Tj"),
        7: stream_body(b"", b"0 -12 Td (part two) Tj ET"),
    })
    # rewire page contents to the array
    pdf = pdf.replace(b"/Contents 4 0 R", b"/Contents [6 0 R 7 0 R]")
    assert pdf_text(pdf) == "part one\npart two"


def test_multipage_and_inherited_resources():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (
            b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"
        ),
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: stream_body(b"", b"BT /F1 12 Tf 72 720 Td (page one) Tj ET"),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        6: b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>",
        7: stream_body(b"", b"BT /F1 12 Tf 72 720 Td (page two) Tj ET"),
    }
    pdf = build_pdf(objs, b"<< /Size 8 /Root 1 0 R >>")
    assert pdf_text(pdf) == "page one\npage two"


def test_literal_string_escapes():
    content = (
        rb"BT /F1 12 Tf 72 720 Td"
        b" (a\\(b\\)c (nested) \\\\ \\101\\66 d\\\ne) Tj ET"
    )
    assert pdf_text(simple_pdf(content)) == "a(b)c (nested) \\ A6 de"


def test_hex_string_and_odd_padding():
    # <48656C6C6F> = Hello ; <7> pads to 0x70 = p
    content = b"BT /F1 12 Tf 72 720 Td <48656C6C6F> Tj <7> Tj ET"
    assert pdf_text(simple_pdf(content)) == "Hellop"


def test_winansi_bytes():
    # 0x93/0x94 curly quotes, 0xE9 eacute in WinAnsi
    content = b"BT /F1 12 Tf 72 720 Td (\x93caf\xe9\x94) Tj ET"
    pdf = simple_pdf(
        content,
        font_body=(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>"
        ),
    )
    assert pdf_text(pdf) == "“café”"


def test_differences_encoding():
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom /Encoding "
        b"<< /BaseEncoding /WinAnsiEncoding "
        b"/Differences [65 /bullet /emdash 97 /Euro] >> >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (A B a z) Tj ET"
    assert pdf_text(simple_pdf(content, font_body=font)) == "• — € z"


TOUNI_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange <0000> <FFFF> endcodespacerange
2 beginbfchar
<0001> <0048>
<0002> <0065006C>
endbfchar
2 beginbfrange
<0010> <0012> <006F>
<0020> <0021> [<0057> <0064>]
endbfrange
endcmap end end"""


def test_tounicode_cmap_2byte():
    # codes: 0001=H 0002=el 0010..0012=o,p,q 0020=W 0021=d
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /X "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td <000100020010> Tj <00200021> Tj ET"
    pdf = simple_pdf(
        content, font_body=font, extra={6: stream_body(b"", TOUNI_CMAP)}
    )
    assert pdf_text(pdf) == "HeloWd"


def test_type0_without_tounicode_yields_nothing():
    font = b"<< /Type /Font /Subtype /Type0 /BaseFont /X /Encoding /Identity-H >>"
    content = b"BT /F1 12 Tf 72 720 Td <00410042> Tj ET"
    assert pdf_text(simple_pdf(content, font_body=font)) == ""


def test_form_xobject_recursion():
    inner = b"BT /F1 10 Tf 10 10 Td (from form) Tj ET"
    pdf = simple_pdf(
        b"BT /F1 12 Tf 72 720 Td (before) Tj ET /X1 Do",
        page_extra=(
            b"/Resources << /Font << /F1 5 0 R >> "
            b"/XObject << /X1 6 0 R >> >>"
        ),
        extra={
            6: stream_body(
                b"/Type /XObject /Subtype /Form "
                b"/Resources << /Font << /F1 5 0 R >> >>",
                inner,
            )
        },
    )
    # page_extra duplicates /Resources — parser keeps the later key
    assert pdf_text(pdf) == "before\nfrom form"


def test_objstm_expansion():
    """Catalog/pages/page/font live inside a compressed object stream —
    the modern-writer layout; only streams stay top-level."""
    inner_objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (
            3,
            b"<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        ),
        (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    parts, offsets, off = [], [], 0
    for num, body in inner_objs:
        offsets.append((num, off))
        parts.append(body)
        off += len(body) + 1
    header = " ".join(f"{n} {o}" for n, o in offsets).encode()
    payload = header + b"\n" + b"\n".join(parts)
    first = len(header) + 1
    objstm = stream_body(
        f"/Type /ObjStm /N {len(inner_objs)} /First {first} "
        "/Filter /FlateDecode".encode(),
        zlib.compress(payload),
    )
    objs = {
        4: stream_body(b"", b"BT /F1 12 Tf 72 720 Td (in objstm) Tj ET"),
        6: objstm,
    }
    pdf = build_pdf(objs, b"<< /Size 7 /Root 1 0 R >>")
    assert pdf_text(pdf) == "in objstm"


def test_filter_chain_a85_flate():
    import base64

    data = base64.a85encode(zlib.compress(HELLO)) + b"~>"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
        ),
        4: stream_body(b"/Filter [/ASCII85Decode /FlateDecode]", data),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    assert pdf_text(build_pdf(objs, b"<< /Root 1 0 R >>")) == "Hello World"


def test_asciihex_and_runlength():
    hex_data = HELLO.hex().encode() + b">"
    pdf = simple_pdf(b"")
    pdf = pdf.replace(
        stream_body(b"", b""), stream_body(b"/Filter /ASCIIHexDecode", hex_data)
    )
    assert pdf_text(pdf) == "Hello World"
    # RunLength: encode HELLO as literal runs of <=128
    rle = bytearray()
    for i in range(0, len(HELLO), 100):
        chunk = HELLO[i : i + 100]
        rle.append(len(chunk) - 1)
        rle += chunk
    rle.append(128)
    pdf2 = simple_pdf(b"").replace(
        stream_body(b"", b""),
        stream_body(b"/Filter /RunLengthDecode", bytes(rle)),
    )
    assert pdf_text(pdf2) == "Hello World"


def test_incremental_update_later_wins():
    pdf = simple_pdf(HELLO)
    # append an updated content object 4 (incremental update section)
    newc = stream_body(b"", b"BT /F1 12 Tf 72 720 Td (updated) Tj ET")
    pdf2 = pdf + b"\n4 0 obj\n" + newc + b"\nendobj\n"
    assert pdf_text(pdf2) == "updated"


def test_inline_image_skipped():
    content = (
        b"BT /F1 12 Tf 72 720 Td (before) Tj ET "
        b"BI /W 2 /H 2 /CS /G /BPC 8 ID \x00\xffTj(\x80 EI "
        b"BT /F1 12 Tf 72 700 Td (after) Tj ET"
    )
    assert pdf_text(simple_pdf(content)) == "before\nafter"


def test_inline_image_length_hint_guards_embedded_ei():
    # the image DATA contains a whitespace+EI byte pattern; without the
    # /L hint the skip would end early and parse the tail (`(junk) Tj`)
    # as real operators — with /L it must jump straight past it
    data = b"\x01\x02 EI (junk) Tj \x03\x04"
    content = (
        b"BT /F1 12 Tf 72 720 Td (before) Tj ET "
        b"BI /W 2 /H 2 /CS /G /BPC 8 /L " + str(len(data)).encode()
        + b" ID " + data + b" EI "
        b"BT /F1 12 Tf 72 700 Td (after) Tj ET"
    )
    assert pdf_text(simple_pdf(content)) == "before\nafter"


def test_inline_image_lying_length_hint_falls_back():
    # /L points past the real EI into absent bytes — the rescan from the
    # data start must still find the terminator, not discard the page tail
    content = (
        b"BT /F1 12 Tf 72 720 Td (before) Tj ET "
        b"BI /W 1 /H 1 /CS /G /BPC 8 /L 999999 ID \x7f EI "
        b"BT /F1 12 Tf 72 700 Td (after) Tj ET"
    )
    assert pdf_text(simple_pdf(content)) == "before\nafter"


def test_empty_page_returns_empty():
    assert pdf_text(simple_pdf(b"")) == ""


# --------------------------------------------------------------------------
# malformed + boundaries
# --------------------------------------------------------------------------


def test_truncated_xref_still_extracts():
    pdf = simple_pdf(HELLO)
    cut = pdf[: pdf.rindex(b"xref") + 10]  # xref table chopped mid-way
    assert pdf_text(cut) == "Hello World"


def test_lying_length_falls_back_to_endstream():
    pdf = simple_pdf(HELLO)
    good = f"/Length {len(HELLO)}".encode()
    assert good in pdf
    for bad in (b"/Length 7", b"/Length 99999", b"/Length 9 0 R"):
        assert pdf_text(pdf.replace(good, bad)) == "Hello World"


def test_encrypted_raises():
    pdf = simple_pdf(HELLO, trailer_extra=b"/Encrypt 9 0 R ")
    with pytest.raises(PdfEncryptedError):
        pdf_text(pdf)


def test_dct_only_stream_raises():
    pdf = simple_pdf(b"").replace(
        stream_body(b"", b""),
        stream_body(b"/Filter /DCTDecode", b"\xff\xd8\xff\xd9"),
    )
    with pytest.raises(PdfUnsupportedFilterError):
        pdf_text(pdf)


# --------------------------------------------------------------------------
# LZWDecode (r11): spec vector + encoder round-trips
# --------------------------------------------------------------------------


def lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Spec encoder (test-only): MSB-first, 9-bit start, ClearTable
    first, table reset before overflow, EarlyChange width bumps."""
    out = bytearray()
    acc = accbits = 0

    def emit(code: int, width: int):
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    def reset():
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, next_code, width = reset()
    emit(256, width)
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        # the encoder's table is one entry AHEAD of the decoder's at
        # emission time, so its bump threshold is the decoder's
        # (len + early >= 1<<width) shifted by one
        if next_code + early >= (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4095:  # reset before the table overflows
            emit(256, width)
            table, next_code, width = reset()
        w = c
    if w:
        emit(table[w], width)
    emit(257, width)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def test_lzw_spec_vector():
    """ISO 32000-1 §7.4.4's worked example: encoded 80 0B 60 50 22 0C
    0C 85 01 decodes to bytes (decimal) 45×5 65 45×3 66."""
    from data_governance_spark.operators.pdf import _lzw_decode

    enc = bytes.fromhex("800B6050220C0C8501")
    assert _lzw_decode(enc) == bytes([45] * 5 + [65] + [45] * 3 + [66])


@pytest.mark.parametrize("early", [0, 1])
def test_lzw_roundtrip_across_width_boundaries(early):
    """Data with enough distinct pairs to push the table past the
    511/1023/2047 width boundaries AND past 4095 (mid-stream clear),
    plus a KwKwK run, round-trips bit-exactly."""
    from data_governance_spark.operators.pdf import _lzw_decode

    import random

    rng = random.Random(11)
    data = bytes(rng.randrange(256) for _ in range(60_000))
    assert _lzw_decode(lzw_encode(data, early), early) == data
    runs = b"".join(bytes([i % 251]) * (i % 7 + 1) for i in range(9000))
    assert _lzw_decode(lzw_encode(runs, early), early) == runs
    kwk = b"aaaaaaaaaaaaaaaaaaaaaaaaab" * 3
    assert _lzw_decode(lzw_encode(kwk, early), early) == kwk


def test_lzw_truncation_and_bad_codes():
    from data_governance_spark.operators.pdf import _lzw_decode

    enc = lzw_encode(b"hello hello hello world")
    full = _lzw_decode(enc)
    cut = _lzw_decode(enc[: len(enc) // 2])
    assert full.startswith(cut)  # implicit EOD, prefix decoded
    # a first code beyond the table is typed, not an IndexError
    with pytest.raises(PdfError):
        _lzw_decode(bytes([0xFF, 0xFF]))


def test_lzw_content_stream_extracts():
    pdf = simple_pdf(b"").replace(
        stream_body(b"", b""),
        stream_body(b"/Filter /LZWDecode", lzw_encode(HELLO)),
    )
    assert pdf_text(pdf) == "Hello World"
    # EarlyChange=0 honored via DecodeParms
    pdf0 = simple_pdf(b"").replace(
        stream_body(b"", b""),
        stream_body(
            b"/Filter /LZWDecode /DecodeParms << /EarlyChange 0 >>",
            lzw_encode(HELLO, early=0),
        ),
    )
    assert pdf_text(pdf0) == "Hello World"


def test_image_only_page_raises():
    pdf = simple_pdf(
        b"q 100 0 0 100 0 0 cm /Im1 Do Q",
        page_extra=(
            b"/Resources << /XObject << /Im1 6 0 R >> >>"
        ),
        extra={
            6: stream_body(
                b"/Type /XObject /Subtype /Image /Width 1 /Height 1 "
                b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
                b"/Filter /DCTDecode",
                b"\xff\xd8\xff\xd9",
            )
        },
    )
    with pytest.raises(PdfImageOnlyError):
        pdf_text(pdf)


def test_text_plus_image_is_fine():
    pdf = simple_pdf(
        b"BT /F1 12 Tf 72 720 Td (caption) Tj ET /Im1 Do",
        page_extra=(
            b"/Resources << /Font << /F1 5 0 R >> "
            b"/XObject << /Im1 6 0 R >> >>"
        ),
        extra={
            6: stream_body(
                b"/Type /XObject /Subtype /Image /Width 1 /Height 1 "
                b"/Filter /DCTDecode",
                b"\xff\xd8\xff\xd9",
            )
        },
    )
    assert pdf_text(pdf) == "caption"


def test_garbage_raises_parse_error():
    with pytest.raises(PdfParseError):
        pdf_text(b"this is not a pdf at all, just words")
    with pytest.raises(PdfParseError):
        pdf_text(b"%PDF-1.4\nnothing else of substance here")


def test_broken_catalog_degrades_to_page_scan():
    pdf = simple_pdf(HELLO)
    pdf = pdf.replace(b"/Type /Catalog /Pages 2 0 R", b"/Type /Catalog")
    assert pdf_text(pdf) == "Hello World"


def test_page_tree_cycle_guard():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 2 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
        ),
        4: stream_body(b"", HELLO),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    assert pdf_text(build_pdf(objs, b"<< /Root 1 0 R >>")) == "Hello World"


def test_reference_cycle_in_length():
    pdf = simple_pdf(HELLO)
    # /Length pointing at an object that is a ref back to itself-ish
    pdf = pdf.replace(
        f"/Length {len(HELLO)}".encode(), b"/Length 6 0 R"
    ) + b"\n6 0 obj\n6 0 R\nendobj\n"
    assert pdf_text(pdf) == "Hello World"


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_fuzz_never_raises_untyped(data):
    """Any byte soup either extracts to a str or raises a typed
    PdfError — never an IndexError/RecursionError/etc."""
    try:
        out = pdf_text(data)
    except PdfError:
        return
    assert isinstance(out, str)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=600))
def test_fuzz_corrupted_valid_pdf(data):
    """Splice random bytes into a valid PDF at a random offset — typed
    errors or str, never an untyped crash."""
    base = simple_pdf(HELLO)
    pos = (sum(data) * 7919) % max(1, len(base))
    mutated = base[:pos] + data + base[pos + len(data):]
    try:
        out = pdf_text(mutated)
    except PdfError:
        return
    assert isinstance(out, str)


# --------------------------------------------------------------------------
# Spark frame op
# --------------------------------------------------------------------------


def test_extract_pdf_text_frame(spark):
    good = simple_pdf(HELLO)
    updated = simple_pdf(b"BT /F1 9 Tf 5 5 Td (doc two) Tj ET")
    enc = simple_pdf(HELLO, trailer_extra=b"/Encrypt 9 0 R ")
    rows = [
        (1, bytearray(good)),
        (2, bytearray(updated)),
        (3, bytearray(enc)),
        (4, bytearray(b"not a pdf")),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = extract_pdf_text(df, error_col="pdf_err").orderBy("doc_id").collect()
    assert [r["text"] for r in out] == [
        "Hello World", "doc two", None, None, None,
    ]
    assert [r["pdf_err"] for r in out] == [
        None, None, "PdfEncryptedError", "PdfParseError", None,
    ]
    # errors='raise' propagates the typed error through the UDF
    bad = spark.createDataFrame(rows[2:3], "doc_id long, content binary")
    with pytest.raises(Exception, match="Encrypt"):
        extract_pdf_text(bad, errors="raise").collect()


def test_gate_payload_pin():
    """The q41 'pdf' planted Flate payload: regenerate it from the spec
    writer and pin both the bytes and the extracted text the oracle
    states. If this test needs updating, the gate constant in
    queries/sink_source_gates.py must move in lockstep."""
    from data_governance_spark.queries.sink_source_gates import (
        _PDF_FLATE_HEX,
        _PDF_FLATE_TEXT,
        _PDF_LZW_HEX,
        _PDF_LZW_TEXT,
    )

    pdf = bytes.fromhex(_PDF_FLATE_HEX)
    assert pdf_text(pdf) == _PDF_FLATE_TEXT
    assert pdf_text(bytes.fromhex(_PDF_LZW_HEX)) == _PDF_LZW_TEXT
    # the LZW payload regenerates from this file's spec encoder
    content = (
        b"BT /F1 12 Tf 72 720 Td (Legacy LZW stream decoded) Tj "
        b"0 -14 Td [(kern) -12 (ed) -280 (gap)] TJ ET"
    )
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
        ),
        4: stream_body(b"/Filter /LZWDecode", lzw_encode(content)),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    assert build_pdf(objs, b"<< /Size 6 /Root 1 0 R >>").hex() == _PDF_LZW_HEX


def test_gate_encrypted_payload_pin():
    """The q41 'pdf' planted ENCRYPTED payload (r12): regenerate from
    this suite's independent spec encryptor (defined below in the
    encryption section) and pin bytes + extracted text."""
    from data_governance_spark.queries.sink_source_gates import (
        _PDF_ENC_HEX,
        _PDF_ENC_TEXT,
    )

    assert pdf_text(bytes.fromhex(_PDF_ENC_HEX)) == _PDF_ENC_TEXT
    content = (
        b"BT /F1 12 Tf 72 720 Td (RC4 empty-password decrypt) Tj "
        b"0 -14 Td [(per) -8 (mission) -260 (bits only)] TJ ET"
    )
    assert encrypted_pdf(content=content, compress=True).hex() == _PDF_ENC_HEX


# --------------------------------------------------------------------------
# review-pass regressions (r11): each of these crashed, hung, or
# silently corrupted before the fix
# --------------------------------------------------------------------------


def test_corrupt_cmap_tokens_degrade_not_crash():
    """Empty '<>' and odd-digit CMap tokens must not raise untyped
    ValueError past the errors='null' quarantine — the mapping is lost,
    the doc is not."""
    bad_cmap = (
        b"1 begincodespacerange <> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <> <0041> <004> <0042> endbfchar\n"
        b"2 beginbfrange <> <0002> <0041> <0001> <0002> <00412> endbfrange"
    )
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /X "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td <0001> Tj ET"
    pdf = simple_pdf(
        content, font_body=font, extra={6: stream_body(b"", bad_cmap)}
    )
    out = pdf_text(pdf)  # must not raise
    assert isinstance(out, str)


def test_adversarial_bfrange_is_time_bounded(time_budget):
    """A lying bfrange hi bound (<FFFFFFFFFFFF>) must be capped, not
    iterated — one crawled file must not pin an executor core."""
    import time

    bad_cmap = (
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfrange <0000> <FFFFFFFFFFFF> <0041> endbfrange"
    )
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /X "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td <0000> Tj ET"
    pdf = simple_pdf(
        content, font_body=font, extra={6: stream_body(b"", bad_cmap)}
    )
    t0 = time.time()
    assert pdf_text(pdf) == "A"  # range base maps code 0 -> U+0041
    # load-calibrated bound: guards the unbounded-bfrange blow-up
    # (minutes), not steady-state speed — must not flake on a loaded
    # host (r12: a 10 s sibling bound read 23 s under contention)
    assert time.time() - t0 < time_budget(30.0)


def test_deep_nesting_never_recursionerror():
    """5000 nested brackets must never escape as RecursionError (an
    untyped crash past the quarantine): the object parser raises the
    typed PdfParseError at _MAX_NEST_DEPTH, and the document layer
    degrades by DROPPING the unparseable object (lenient scan) — here
    the poisoned catalog is lost and the direct page scan still
    extracts the page."""
    from data_governance_spark.operators.pdf import _parse_object

    deep = b"[" * 5000
    with pytest.raises(PdfParseError, match="nesting"):
        _parse_object(deep, 0)
    pdf = simple_pdf(HELLO)
    pdf = pdf.replace(
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R /Junk " + deep + b" >>",
    )
    assert pdf_text(pdf) == "Hello World"  # degraded page scan
    # deep nesting inside a CONTENT stream degrades without raising
    # (content operands are parsed leniently, one token at a time)
    pdf2 = simple_pdf(deep + b" BT /F1 12 Tf 72 720 Td (ok) Tj ET")
    assert pdf_text(pdf2) == "ok"


def test_obj_pattern_inside_stream_does_not_shadow():
    """'N G obj' bytes inside stream DATA must not overwrite a real
    object (embedded PDFs / binary Flate bytes); 'trailer /Encrypt'
    bytes inside a stream must not raise a spurious encryption error."""
    evil = b"4 0 obj (overwritten) endobj trailer << /Encrypt 9 0 R >>"
    pdf = simple_pdf(
        HELLO,
        extra={6: stream_body(b"/Subtype /Junk", evil)},
    )
    assert pdf_text(pdf) == "Hello World"


def test_short_decodeparms_array_still_decodes_all_filters():
    """/DecodeParms shorter than /Filter must not truncate the chain
    through zip() — that returned still-encoded bytes as 'text'."""
    import base64

    data = base64.a85encode(zlib.compress(HELLO)) + b"~>"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
        ),
        4: stream_body(
            b"/Filter [/ASCII85Decode /FlateDecode] /DecodeParms [null]",
            data,
        ),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    assert pdf_text(build_pdf(objs, b"<< /Root 1 0 R >>")) == "Hello World"


def test_incremental_update_new_catalog_wins():
    """An incremental update appending a NEW catalog + trailer must be
    honored (last trailer wins), consistent with later-object-wins."""
    pdf = simple_pdf(HELLO)
    extra = (
        b"\n10 0 obj\n<< /Type /Catalog /Pages 11 0 R >>\nendobj\n"
        b"11 0 obj\n<< /Type /Pages /Kids [12 0 R] /Count 1 >>\nendobj\n"
        b"12 0 obj\n<< /Type /Page /Parent 11 0 R /Resources "
        b"<< /Font << /F1 5 0 R >> >> /Contents 13 0 R >>\nendobj\n"
        b"13 0 obj\n"
        + stream_body(b"", b"BT /F1 12 Tf 72 720 Td (updated tree) Tj ET")
        + b"\nendobj\ntrailer\n<< /Size 14 /Root 10 0 R >>\n"
    )
    assert pdf_text(pdf + extra) == "updated tree"


def test_flate_with_png_predictor():
    """A Flate stream with /Predictor 12 (PNG Up) round-trips through
    the shared _png_unfilter path."""
    content = HELLO
    rowlen = 10
    # pad to whole rows, apply Up filtering (delta rows)
    padded = content + b" " * ((-len(content)) % rowlen)
    rows = [padded[i : i + rowlen] for i in range(0, len(padded), rowlen)]
    filtered = bytearray()
    prev = bytes(rowlen)
    for row in rows:
        filtered.append(2)  # Up
        filtered += bytes((b - p) & 0xFF for b, p in zip(row, prev))
        prev = row
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
        ),
        4: stream_body(
            b"/Filter /FlateDecode /DecodeParms << /Predictor 12 "
            b"/Columns 10 >>",
            zlib.compress(bytes(filtered)),
        ),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    assert pdf_text(build_pdf(objs, b"<< /Root 1 0 R >>")).startswith(
        "Hello World"
    )


def test_lzw_table_cap_bounds_adversarial_memory(time_budget):
    """A clear-free stream must not grow table entries past the 12-bit
    spec ceiling (4096) — uncapped, an adversarial stream grows one
    byte per code FOREVER (quadratic memory, executor OOM). A long
    KwKwK-style run decodes in bounded time/memory and round-trips."""
    import time

    from data_governance_spark.operators.pdf import _lzw_decode

    # legit long input whose encoding crosses the cap region via resets
    data = bytes((i * 7 + (i >> 3)) & 0xFF for i in range(200_000))
    t0 = time.time()
    assert _lzw_decode(lzw_encode(data)) == data
    # load-calibrated: the uncapped-table regression this guards is
    # quadratic (minutes on this input); 3 s isolated, but r12 measured
    # 23 s under full-suite host contention — don't flake on load
    assert time.time() - t0 < time_budget(50.0)
    # adversarial: max-width codes climbing without a clear — decode
    # must stay bounded (entries stop growing at 4096) and return/raise
    # typed quickly rather than ballooning
    evil = bytearray()
    acc = accbits = 0
    def emit(code, width):
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            accbits -= 8
            evil.append((acc >> accbits) & 0xFF)
    emit(65, 9)  # first literal
    # then repeat the KwKwK code (== next table index) as it climbs
    width = 9
    nxt = 258
    for _ in range(30_000):
        emit(min(nxt, 4095), width)
        if nxt < 4096:
            nxt += 1
        if nxt + 1 >= (1 << width) and width < 12:
            width += 1
    if accbits:
        evil.append((acc << (8 - accbits)) & 0xFF)
    t0 = time.time()
    try:
        out = _lzw_decode(bytes(evil))
        assert len(out) < 200_000_000  # bounded, not quadratic blow-up
    except PdfError:
        pass
    # the size assert above is the real guard; the time bound only
    # catches a pathological slowdown — keep it load-calibrated
    assert time.time() - t0 < time_budget(50.0)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4096))
def test_lzw_fuzz_never_untyped(data):
    from data_governance_spark.operators.pdf import _lzw_decode

    try:
        out = _lzw_decode(data)
    except PdfError:
        return
    assert isinstance(out, bytes)


# --------------------------------------------------------------------------
# standard security handler (r12): independent spec encryptor + round-trips
# --------------------------------------------------------------------------
# The encryptor below is transcribed DIRECTLY from ISO 32000-1 §7.6.3
# (Algorithms 1-5) — it shares no code with operators/pdf.py, so a
# decrypt of its output is a genuine two-implementation differential
# (same pattern as the LZW/PNG/FLAC spec encoders in this suite).

import hashlib
import struct

ENC_PAD_T = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA0108"
    "2E2E00B6D0683E802F0CA9FE6453697A"
)


def rc4_t(key: bytes, data: bytes) -> bytes:
    s = bytearray(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) % 256
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    i = j = 0
    for c in data:
        i = (i + 1) % 256
        j = (j + s[i]) % 256
        s[i], s[j] = s[j], s[i]
        out.append(c ^ s[(s[i] + s[j]) % 256])
    return bytes(out)


def std_keys_t(
    user_pwd: bytes,
    owner_pwd: bytes,
    perms: int,
    id0: bytes,
    r: int,
    nbits: int,
) -> tuple[bytes, bytes, bytes]:
    """(file_key, /O, /U) per Algorithms 3, 2, 4/5."""
    n = nbits // 8
    # Algorithm 3: /O
    opad = ((owner_pwd or user_pwd) + ENC_PAD_T)[:32]
    h = hashlib.md5(opad).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:n]
    upad = (user_pwd + ENC_PAD_T)[:32]
    o = rc4_t(okey, upad)
    if r >= 3:
        for i in range(1, 20):
            o = rc4_t(bytes(b ^ i for b in okey), o)
    # Algorithm 2: file key
    key = hashlib.md5(upad + o + struct.pack("<i", perms) + id0).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    key = key[:n]
    # Algorithm 4 (r=2) / 5 (r=3): /U
    if r == 2:
        u = rc4_t(key, ENC_PAD_T)
    else:
        u = rc4_t(key, hashlib.md5(ENC_PAD_T + id0).digest())
        for i in range(1, 20):
            u = rc4_t(bytes(b ^ i for b in key), u)
        u = u + bytes(16)  # 16 arbitrary padding bytes
    return key, o, u


def obj_key_t(key: bytes, num: int, gen: int = 0) -> bytes:
    h = hashlib.md5(
        key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    ).digest()
    return h[: min(len(key) + 5, 16)]


def encrypted_pdf(
    content: bytes = HELLO,
    r: int = 3,
    nbits: int = 128,
    user_pwd: bytes = b"",
    owner_pwd: bytes = b"owner-secret",
    perms: int = -44,
    id0: bytes = b"\xab\xcd\x12\x34" * 4,
    compress: bool = False,
    extra: dict[int, bytes] | None = None,
    gen4: int = 0,
) -> bytes:
    """One-page encrypted PDF: objects 1-5 as simple_pdf, 6 = the
    /Encrypt dict (never encrypted), content stream 4 RC4'd with its
    object key. ``extra`` bodies are used VERBATIM (pre-encrypt them
    with obj_key_t yourself). ``gen4`` writes the content stream as
    generation ``gen4`` to pin the per-object-key gen path."""
    key, o, u = std_keys_t(user_pwd, owner_pwd, perms, id0, r, nbits)
    data = zlib.compress(content) if compress else content
    edata = rc4_t(obj_key_t(key, 4, gen4), data)
    v = 1 if r == 2 else 2
    length = f" /Length {nbits}" if v == 2 else ""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
        ),
        4: stream_body(
            b"/Filter /FlateDecode" if compress else b"", edata
        ),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        6: (
            f"<< /Filter /Standard /V {v} /R {r}{length} /P {perms} "
            f"/O <{o.hex()}> /U <{u.hex()}> >>"
        ).encode(),
    }
    if extra:
        objs.update(extra)
    idhex = id0.hex().encode()
    pdf = build_pdf(
        objs,
        b"<< /Size 9 /Root 1 0 R /Encrypt 6 0 R /ID [<"
        + idhex + b"> <" + idhex + b">] >>",
    )
    if gen4:
        pdf = pdf.replace(b"4 0 obj", f"4 {gen4} obj".encode())
    return pdf


def test_rc4_known_vectors_and_parity():
    """Classic RC4 vectors pin BOTH implementations to the cipher, not
    just to each other."""
    from data_governance_spark.operators.pdf import _rc4

    vectors = [
        (b"Key", b"Plaintext", "bbf316e8d940af0ad3"),
        (b"Wiki", b"pedia", "1021bf0420"),
        (b"Secret", b"Attack at dawn", "45a01f645fc35b383552544b9bf5"),
    ]
    for k, pt, ct in vectors:
        assert _rc4(k, pt).hex() == ct
        assert rc4_t(k, pt).hex() == ct
        assert _rc4(k, bytes.fromhex(ct)) == pt  # symmetric


def test_encrypted_r3_empty_user_password_extracts():
    assert pdf_text(encrypted_pdf(r=3, nbits=128)) == "Hello World"


def test_encrypted_r2_40bit_extracts():
    assert pdf_text(encrypted_pdf(r=2, nbits=40)) == "Hello World"


def test_encrypted_r3_40bit_and_56bit():
    # /Length varies in the wild; any multiple of 8 in [40, 128]
    assert pdf_text(encrypted_pdf(r=3, nbits=40)) == "Hello World"
    assert pdf_text(encrypted_pdf(r=3, nbits=56)) == "Hello World"


def test_encrypted_flate_chain():
    """Encryption wraps OUTSIDE the filter chain: stored bytes are
    RC4(deflate(content)) — decrypt must happen before inflate."""
    assert pdf_text(encrypted_pdf(compress=True)) == "Hello World"


def test_encrypted_nonzero_generation_object():
    """Per-object keys mix in the GENERATION number (Algorithm 1) — a
    '4 1 obj' stream encrypted with gen=1 only decrypts if the reader
    tracked the gen from the object header."""
    assert pdf_text(encrypted_pdf(gen4=1)) == "Hello World"


def test_encrypted_string_objects_decrypt():
    """Strings in dicts are encrypted per-object too (§7.6.2)."""
    from data_governance_spark.operators.pdf import _Doc

    key, _, _ = std_keys_t(
        b"", b"owner-secret", -44, b"\xab\xcd\x12\x34" * 4, 3, 128
    )
    secret = rc4_t(obj_key_t(key, 8), b"Top Secret Title")
    pdf = encrypted_pdf(
        extra={8: b"<< /Title <" + secret.hex().encode() + b"> >>"}
    )
    doc = _Doc(pdf)
    assert doc.objects[8]["Title"] == b"Top Secret Title"


def test_encrypted_objstm_contents_not_double_decrypted():
    """Objects inside an ObjStm are NOT individually encrypted — only
    the ObjStm's own stream is (§7.6.2 note). The font dict lives in an
    encrypted ObjStm; extraction must still work."""
    key, _, _ = std_keys_t(
        b"", b"owner-secret", -44, b"\xab\xcd\x12\x34" * 4, 3, 128
    )
    inner = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    payload = b"5 0 " + inner
    raw = rc4_t(obj_key_t(key, 8), payload)
    objstm = stream_body(
        b"/Type /ObjStm /N 1 /First 4", raw
    )
    pdf = encrypted_pdf(extra={8: objstm})
    # remove the top-level font object so the ObjStm copy is the one used
    pdf = pdf.replace(
        b"5 0 obj\n" + inner + b"\nendobj\n", b"", 1
    )
    assert pdf_text(pdf) == "Hello World"


def test_encrypted_wrong_password_still_raises():
    pdf = encrypted_pdf(user_pwd=b"real-user-password")
    with pytest.raises(PdfEncryptedError):
        pdf_text(pdf)


def test_encrypted_unknown_v_raises():
    """V=6 doesn't exist — must stay a typed boundary.  (V=4/R=4 and
    V=5/R=5,6 DECRYPT as of r13 — see tests/test_pdf_aes.py.)"""
    pdf = encrypted_pdf()
    pdf = pdf.replace(b"/V 2 /R 3", b"/V 6 /R 7")
    with pytest.raises(PdfEncryptedError):
        pdf_text(pdf)


def test_encrypted_v4_without_cf_is_identity_not_crash():
    """A lying file: claims V4/R4 but carries no /CF, so StrF/StmF
    default to Identity (nothing to decrypt) while its stream bytes
    are actually RC4 ciphertext.  Spec behavior is to treat streams
    as plaintext — the garbage must degrade typed/empty, never crash
    untyped."""
    pdf = encrypted_pdf().replace(b"/V 2 /R 3", b"/V 4 /R 4")
    try:
        out = pdf_text(pdf)
        assert isinstance(out, str)
    except PdfError:
        pass


def test_encrypted_nonstandard_handler_raises():
    pdf = encrypted_pdf()
    pdf = pdf.replace(b"/Filter /Standard", b"/Filter /MyCustomSec")
    with pytest.raises(PdfEncryptedError):
        pdf_text(pdf)


def test_encrypted_no_id_entry():
    """Some writers omit /ID; both sides then derive with id0 = b''."""
    pdf = encrypted_pdf(id0=b"")
    assert pdf_text(pdf) == "Hello World"


def test_encrypted_tampered_u_raises():
    """A corrupted /U must fail authentication (typed), not decrypt to
    garbage text."""
    pdf = encrypted_pdf()
    _, _, u = std_keys_t(
        b"", b"owner-secret", -44, b"\xab\xcd\x12\x34" * 4, 3, 128
    )
    bad = bytes([u[0] ^ 0xFF]) + u[1:]
    pdf = pdf.replace(u.hex().encode(), bad.hex().encode())
    with pytest.raises(PdfEncryptedError):
        pdf_text(pdf)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 3))
def test_encrypted_fuzz_corruption_never_untyped(seed, nflips):
    """Byte-flipping an ENCRYPTED pdf (keys, dict, ciphertext) must
    extract or raise a typed PdfError — never an untyped exception."""
    import random as _random

    base = bytearray(encrypted_pdf())
    rng = _random.Random(seed)
    for _ in range(nflips):
        i = rng.randrange(len(base))
        base[i] ^= 1 << rng.randrange(8)
    try:
        out = pdf_text(bytes(base))
        assert isinstance(out, str)
    except PdfError:
        pass


# --------------------------------------------------------------------------
# embedded images (r12): pdf_images / extract_pdf_images
# --------------------------------------------------------------------------


def _image_pdf(extra_objs: dict[int, bytes], xobject_entries: bytes,
               content: bytes = HELLO) -> bytes:
    """One-page PDF whose page resources carry image XObjects."""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> /XObject << " + xobject_entries
            + b" >> >> /Contents 4 0 R >>"
        ),
        4: stream_body(b"", content),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    objs.update(extra_objs)
    return build_pdf(objs, b"<< /Size 20 /Root 1 0 R >>")


def test_pdf_images_dct_matches_bare_jpeg():
    """The judge differential: a known spec-writer JPEG embedded as a
    DCTDecode XObject must yield the SAME bytes and the SAME features
    as decoding the bare JPEG directly."""
    import numpy as np

    from data_governance_spark.operators.jpeg import decode_jpeg
    from data_governance_spark.operators.multimodal import _img_stats
    from data_governance_spark.operators.pdf import pdf_images
    from tests.test_jpeg_codec import _smooth, jpeg_bytes

    img = _smooth(24, 16, rgb=True)
    jpg = jpeg_bytes(img, quality=90)
    body = stream_body(
        b"/Type /XObject /Subtype /Image /Width 16 /Height 24 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode",
        jpg,
    )
    pdf = _image_pdf({6: body}, b"/Im1 6 0 R")
    recs = pdf_images(pdf)
    assert len(recs) == 1
    r = recs[0]
    assert r["err"] is None and r["format"] == "jpeg"
    assert (r["page"], r["img_idx"], r["width"], r["height"]) == (1, 0, 16, 24)
    assert r["image"] == jpg
    want = _img_stats(decode_jpeg(jpg))
    assert np.allclose(r["feature"], want)


def test_pdf_images_flate_raster_gray_and_rgb():
    """Flate rasters decode through the standard filter chain into
    netpbm payloads the multimodal tier consumes directly."""
    import numpy as np

    from data_governance_spark.operators.multimodal import decode_image
    from data_governance_spark.operators.pdf import pdf_images

    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    rgb = rng.integers(0, 256, (4, 3, 3), dtype=np.uint8)
    g_body = stream_body(
        b"/Type /XObject /Subtype /Image /Width 7 /Height 5 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode",
        zlib.compress(gray.tobytes()),
    )
    c_body = stream_body(
        b"/Type /XObject /Subtype /Image /Width 3 /Height 4 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode",
        zlib.compress(rgb.tobytes()),
    )
    pdf = _image_pdf({6: g_body, 7: c_body}, b"/ImA 6 0 R /ImB 7 0 R")
    recs = pdf_images(pdf)
    assert [r["err"] for r in recs] == [None, None]
    assert [r["img_idx"] for r in recs] == [0, 1]  # name-sorted ImA, ImB
    assert np.array_equal(decode_image(recs[0]["image"]), gray)
    assert np.array_equal(decode_image(recs[1]["image"]), rgb)


def test_pdf_images_subbyte_gray_and_imagemask():
    """1/2/4-bit gray scale to 0..255 with byte-padded rows; /ImageMask
    stencils decode as 1-bit gray."""
    import numpy as np

    from data_governance_spark.operators.multimodal import decode_image
    from data_governance_spark.operators.pdf import pdf_images

    # 1-bit 10x2: rows pad to 2 bytes; pattern 1010101010
    row = 0b10101010_10000000
    packed = row.to_bytes(2, "big") * 2
    mask_body = stream_body(
        b"/Type /XObject /Subtype /Image /Width 10 /Height 2 "
        b"/ImageMask true /Filter /FlateDecode",
        zlib.compress(packed),
    )
    # 4-bit 3x1 gray: samples 0x0, 0xF, 0x8 -> 0, 255, 136
    four_body = stream_body(
        b"/Type /XObject /Subtype /Image /Width 3 /Height 1 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 4",
        bytes([0x0F, 0x80]),
    )
    pdf = _image_pdf(
        {6: mask_body, 7: four_body}, b"/ImA 6 0 R /ImB 7 0 R"
    )
    recs = pdf_images(pdf)
    assert [r["err"] for r in recs] == [None, None]
    m = decode_image(recs[0]["image"])
    assert m.shape == (2, 10)
    assert list(m[0]) == [255, 0] * 5
    f = decode_image(recs[1]["image"])
    assert list(f[0]) == [0, 255, 136]


def test_pdf_images_unsupported_typed_per_image():
    """A JPX image records a typed err; the OTHER image on the same
    page still decodes, and pdf_text is unaffected."""
    import numpy as np

    from data_governance_spark.operators.pdf import pdf_images

    gray = np.full((2, 2), 9, dtype=np.uint8)
    good = stream_body(
        b"/Type /XObject /Subtype /Image /Width 2 /Height 2 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8",
        gray.tobytes(),
    )
    jpx = stream_body(
        b"/Type /XObject /Subtype /Image /Width 2 /Height 2 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /JPXDecode",
        b"\x00\x00\x00\x0cjP  ",
    )
    cmyk = stream_body(
        b"/Type /XObject /Subtype /Image /Width 2 /Height 2 "
        b"/ColorSpace /DeviceCMYK /BitsPerComponent 8",
        bytes(16),
    )
    pdf = _image_pdf(
        {6: good, 7: jpx, 8: cmyk},
        b"/ImA 6 0 R /ImB 7 0 R /ImC 8 0 R",
    )
    recs = pdf_images(pdf)
    errs = {r["img_idx"]: r["err"] for r in recs}
    assert errs[0] is None
    assert errs[1] == "PdfUnsupportedFilterError"
    assert errs[2] == "PdfImageDecodeError"
    assert pdf_text(pdf) == "Hello World"


def test_pdf_images_inside_form_xobject_and_encrypted():
    """Images reached through a Form XObject's resources are found;
    an ENCRYPTED (rev 3 RC4) document's images decrypt and decode."""
    import numpy as np

    from data_governance_spark.operators.multimodal import decode_image
    from data_governance_spark.operators.pdf import pdf_images

    gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
    img_body = stream_body(
        b"/Type /XObject /Subtype /Image /Width 3 /Height 2 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8",
        gray.tobytes(),
    )
    form_body = stream_body(
        b"/Type /XObject /Subtype /Form "
        b"/Resources << /XObject << /ImZ 6 0 R >> >>",
        b"",
    )
    pdf = _image_pdf({6: img_body, 7: form_body}, b"/Fm 7 0 R")
    recs = pdf_images(pdf)
    assert len(recs) == 1 and recs[0]["err"] is None
    assert np.array_equal(decode_image(recs[0]["image"]), gray)

    # encrypted: image stream RC4'd with its object key
    key, _, _ = std_keys_t(
        b"", b"owner-secret", -44, b"\xab\xcd\x12\x34" * 4, 3, 128
    )
    enc_img = stream_body(
        b"/Type /XObject /Subtype /Image /Width 3 /Height 2 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8",
        rc4_t(obj_key_t(key, 8), gray.tobytes()),
    )
    epdf = encrypted_pdf(extra={8: enc_img})
    # reference the image from the page (object 3 in encrypted_pdf)
    epdf = epdf.replace(
        b"/Resources << /Font << /F1 5 0 R >> >>",
        b"/Resources << /Font << /F1 5 0 R >> "
        b"/XObject << /Im1 8 0 R >> >>",
    )
    recs = pdf_images(epdf)
    assert len(recs) == 1 and recs[0]["err"] is None
    assert np.array_equal(decode_image(recs[0]["image"]), gray)


def test_extract_pdf_images_frame(spark):
    """The frame op: one row per image, doc-level failures and no-image
    docs keep one row each (rows never vanish), features flow into the
    multimodal tier."""
    import numpy as np

    from data_governance_spark.operators.pdf import extract_pdf_images

    gray = np.full((2, 2), 40, dtype=np.uint8)
    body = stream_body(
        b"/Type /XObject /Subtype /Image /Width 2 /Height 2 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8",
        gray.tobytes(),
    )
    with_img = _image_pdf({6: body}, b"/Im1 6 0 R")
    no_img = simple_pdf(HELLO)
    rows = spark.createDataFrame(
        [
            (1, bytearray(with_img)),
            (2, bytearray(no_img)),
            (3, bytearray(b"not a pdf at all")),
            (4, None),
        ],
        "doc_id long, content binary",
    )
    got = {r["doc_id"]: r for r in extract_pdf_images(rows).collect()}
    assert len(got) == 4
    assert got[1]["err"] is None and got[1]["format"] == "ppm"
    assert got[1]["feature"][0] == 2.0 and got[1]["feature"][3] == 40.0
    assert got[2]["page"] is None and got[2]["err"] is None
    assert got[3]["err"] == "PdfParseError"
    assert got[4]["err"] == "null-content"


def test_gate_pdf_images_payload_pin():
    """The q45 'pdfi' planted payload: regenerate from this suite's
    spec writer (embedding the 'jpg' sub-gate's pinned JPEG) and pin
    bytes + per-image features the oracle states as constants."""
    import numpy as np

    from data_governance_spark.operators.pdf import pdf_images
    from data_governance_spark.queries.multimodal_gate import (
        _JPG_HEX,
        _PDFI_HEX,
        _PDFI_IMGS,
    )

    jpg = bytes.fromhex(_JPG_HEX)
    gray = bytes([77]) * 6
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> /XObject "
            b"<< /ImA 6 0 R /ImB 7 0 R >> >> /Contents 4 0 R >>"
        ),
        4: stream_body(b"", HELLO),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        6: stream_body(
            b"/Type /XObject /Subtype /Image /Width 16 /Height 16 "
            b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
            b"/Filter /DCTDecode",
            jpg,
        ),
        7: stream_body(
            b"/Type /XObject /Subtype /Image /Width 3 /Height 2 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
            b"/Filter /FlateDecode",
            zlib.compress(gray),
        ),
    }
    assert build_pdf(objs, b"<< /Size 8 /Root 1 0 R >>").hex() == _PDFI_HEX
    recs = pdf_images(bytes.fromhex(_PDFI_HEX))
    assert len(recs) == len(_PDFI_IMGS)
    for r, (idx, consts, sd) in zip(recs, _PDFI_IMGS):
        assert r["img_idx"] == idx and r["err"] is None
        assert np.allclose(r["feature"][:6], consts)
        assert round(r["feature"][6], 4) == round(sd, 4)


# --------------------------------------------------------------------------
# review-pass regressions (r12)
# --------------------------------------------------------------------------


def test_pdf_images_12bit_jpeg_stays_per_image():
    """decode_jpeg raises NotImplementedError for 12-bit precision —
    it must land in the image's err field, never escape untyped."""
    from data_governance_spark.operators.pdf import pdf_images
    from data_governance_spark.queries.multimodal_gate import _JPG_HEX

    jpg = bytearray(bytes.fromhex(_JPG_HEX))
    sof = jpg.index(b"\xff\xc0")
    assert jpg[sof + 4] == 8  # precision byte
    jpg[sof + 4] = 12
    body = stream_body(
        b"/Type /XObject /Subtype /Image /Width 16 /Height 16 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode",
        bytes(jpg),
    )
    pdf = _image_pdf({6: body}, b"/Im1 6 0 R")
    recs = pdf_images(pdf)
    assert len(recs) == 1
    assert recs[0]["err"] == "PdfImageDecodeError"
    assert pdf_text(pdf) == "Hello World"


def test_encrypted_oversized_object_number_stays_typed():
    """An object number >= 2**32 in an encrypted file must not raise
    an untyped struct.error from key derivation."""
    pdf = encrypted_pdf()
    evil = pdf + b"\n4294967296 0 obj (x) endobj\n"
    assert pdf_text(evil) == "Hello World"  # shrugs off the junk object


def test_local_topk_idx_nan_boundary_keeps_finite_candidates():
    """Fewer than n finite scores: the fast path's boundary is NaN and
    `row >= NaN` selects nothing — must fall back to the full sort and
    keep the real candidates (matching the lexsort reference)."""
    import numpy as np

    from data_governance_spark.operators.similarity import local_topk_idx

    row = np.array([0.9, np.nan, np.nan, np.nan, 0.5])
    cids = np.arange(5, dtype=np.int64)
    got = list(local_topk_idx(row, cids, 4))
    ref = list(np.lexsort((cids, -row))[:4])
    assert got == ref
    assert got[:2] == [0, 4]  # the finite candidates lead


def test_pdf_images_decode_inversion_and_partial_raises():
    """/Decode [1 0] inverts (the stencil form); a partial-range map
    records a typed err instead of silently wrong pixels."""
    import numpy as np

    from data_governance_spark.operators.multimodal import decode_image
    from data_governance_spark.operators.pdf import pdf_images

    gray = np.array([[0, 100, 255]], dtype=np.uint8)
    inv = stream_body(
        b"/Type /XObject /Subtype /Image /Width 3 /Height 1 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Decode [1 0]",
        gray.tobytes(),
    )
    part = stream_body(
        b"/Type /XObject /Subtype /Image /Width 3 /Height 1 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Decode [0 0.5]",
        gray.tobytes(),
    )
    ident = stream_body(
        b"/Type /XObject /Subtype /Image /Width 3 /Height 1 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Decode [0 1]",
        gray.tobytes(),
    )
    pdf = _image_pdf(
        {6: inv, 7: part, 8: ident},
        b"/ImA 6 0 R /ImB 7 0 R /ImC 8 0 R",
    )
    recs = {r["img_idx"]: r for r in pdf_images(pdf)}
    assert list(decode_image(recs[0]["image"])[0]) == [255, 155, 0]
    assert recs[1]["err"] == "PdfImageDecodeError"
    assert list(decode_image(recs[2]["image"])[0]) == [0, 100, 255]


def test_pdf_images_lying_dict_dims_report_decoded_geometry():
    """The DCT path's width/height columns must match the DECODED
    JPEG (feature[0:2]), not the untrusted XObject dict."""
    from data_governance_spark.operators.pdf import pdf_images
    from data_governance_spark.queries.multimodal_gate import _JPG_HEX

    jpg = bytes.fromhex(_JPG_HEX)  # really 16x16
    body = stream_body(
        b"/Type /XObject /Subtype /Image /Width 8 /Height 4 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode",
        jpg,
    )
    recs = pdf_images(_image_pdf({6: body}, b"/Im1 6 0 R"))
    r = recs[0]
    assert r["err"] is None
    assert (r["width"], r["height"]) == (16, 16)
    assert (r["feature"][0], r["feature"][1]) == (16.0, 16.0)
