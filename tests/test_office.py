"""Office-document extraction (operators/office.py): spec-writer
round-trips per format, container sniffing, typed error taxonomy,
bomb caps, generative fuzz (never raises untyped), and the Spark
quarantine operator.

The writers here double as the gate-payload generators: the q41
'office' planted payloads in queries/sink_source_gates.py are pinned
against bytes these functions regenerate (test_gate_payload_pin), so
gate and tests can never drift apart.  All payload zips use STORED
members and a fixed 1980 timestamp — bit-deterministic with no
dependency on zlib's encoder."""

from __future__ import annotations

import io
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators import office as off
from data_governance_spark.operators.office import (
    OfficeBombError,
    OfficeEncryptedError,
    OfficeError,
    OfficeParseError,
    OfficeUnsupportedError,
    docx_text,
    epub_text,
    extract_office_text,
    odf_text,
    office_format,
    office_text,
    office_text_column,
    pptx_text,
    rtf_text,
    xlsx_text,
)

W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
P = "http://schemas.openxmlformats.org/presentationml/2006/main"
A = "http://schemas.openxmlformats.org/drawingml/2006/main"
R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
PR = "http://schemas.openxmlformats.org/package/2006/relationships"
T = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
O = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
CN = "urn:oasis:names:tc:opendocument:xmlns:container"
OPF = "http://www.idpf.org/2007/opf"
XH = "http://www.w3.org/1999/xhtml"

CFB = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


# ===================================================================
# deterministic writers (STORED + fixed timestamp == pinnable bytes)
# ===================================================================
def make_zip(members: list[tuple[str, bytes | str]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, data in members:
            zi = zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0))
            z.writestr(zi, data)
    return buf.getvalue()


def make_docx(body_xml: str) -> bytes:
    return make_zip(
        [
            (
                "[Content_Types].xml",
                '<Types xmlns="http://schemas.openxmlformats.org/package'
                '/2006/content-types"/>',
            ),
            (
                "word/document.xml",
                f'<w:document xmlns:w="{W}"><w:body>{body_xml}'
                "</w:body></w:document>",
            ),
        ]
    )


def make_xlsx(
    sheets_xml: list[str],
    shared_xml: str | None = None,
    workbook_order: list[int] | None = None,
) -> bytes:
    """sheets_xml[i] -> xl/worksheets/sheet{i+1}.xml; workbook_order
    lists 1-based sheet numbers in DECLARATION order."""
    order = workbook_order or list(range(1, len(sheets_xml) + 1))
    wb = "".join(
        f'<sheet name="s{i}" sheetId="{i}" r:id="rId{i}"/>' for i in order
    )
    rels = "".join(
        f'<Relationship Id="rId{i}" Type="t" '
        f'Target="worksheets/sheet{i}.xml"/>'
        for i in range(1, len(sheets_xml) + 1)
    )
    members: list = [
        ("[Content_Types].xml", '<Types xmlns="x"/>'),
        (
            "xl/workbook.xml",
            f'<workbook xmlns="{S}" xmlns:r="{R}"><sheets>{wb}'
            "</sheets></workbook>",
        ),
        (
            "xl/_rels/workbook.xml.rels",
            f'<Relationships xmlns="{PR}">{rels}</Relationships>',
        ),
    ]
    if shared_xml is not None:
        members.append(
            ("xl/sharedStrings.xml", f'<sst xmlns="{S}">{shared_xml}</sst>')
        )
    for i, sx in enumerate(sheets_xml, 1):
        members.append(
            (
                f"xl/worksheets/sheet{i}.xml",
                f'<worksheet xmlns="{S}"><sheetData>{sx}'
                "</sheetData></worksheet>",
            )
        )
    return make_zip(members)


def make_pptx(slides_xml: list[str], id_order: list[int] | None = None) -> bytes:
    """slides_xml[i] -> ppt/slides/slide{i+1}.xml; id_order lists
    1-based slide numbers in PRESENTATION order."""
    order = id_order or list(range(1, len(slides_xml) + 1))
    lst = "".join(
        f'<p:sldId id="{255 + i}" r:id="rId{i}"/>' for i in order
    )
    rels = "".join(
        f'<Relationship Id="rId{i}" Type="t" Target="slides/slide{i}.xml"/>'
        for i in range(1, len(slides_xml) + 1)
    )
    members: list = [
        ("[Content_Types].xml", '<Types xmlns="x"/>'),
        (
            "ppt/presentation.xml",
            f'<p:presentation xmlns:p="{P}" xmlns:r="{R}">'
            f"<p:sldIdLst>{lst}</p:sldIdLst></p:presentation>",
        ),
        (
            "ppt/_rels/presentation.xml.rels",
            f'<Relationships xmlns="{PR}">{rels}</Relationships>',
        ),
    ]
    for i, sx in enumerate(slides_xml, 1):
        members.append(
            (
                f"ppt/slides/slide{i}.xml",
                f'<p:sld xmlns:p="{P}" xmlns:a="{A}">{sx}</p:sld>',
            )
        )
    return make_zip(members)


def make_odt(body_xml: str) -> bytes:
    return make_zip(
        [
            ("mimetype", "application/vnd.oasis.opendocument.text"),
            (
                "content.xml",
                f'<office:document-content xmlns:office="{O}" '
                f'xmlns:text="{T}"><office:body><office:text>{body_xml}'
                "</office:text></office:body></office:document-content>",
            ),
        ]
    )


def make_epub(chapters: list[tuple[str, str]], spine: list[str],
              extra_items: str = "") -> bytes:
    """chapters: (href, xhtml body); spine: hrefs in spine order."""
    ids = {href: f"c{i}" for i, (href, _) in enumerate(chapters)}
    manifest = "".join(
        f'<item id="{ids[h]}" href="{h}" '
        'media-type="application/xhtml+xml"/>'
        for h, _ in chapters
    ) + extra_items
    spine_xml = "".join(f'<itemref idref="{ids[h]}"/>' for h in spine)
    members: list = [
        ("mimetype", "application/epub+zip"),
        (
            "META-INF/container.xml",
            f'<container xmlns="{CN}"><rootfiles><rootfile '
            'full-path="OEBPS/content.opf" '
            'media-type="application/oebps-package+xml"/>'
            "</rootfiles></container>",
        ),
        (
            "OEBPS/content.opf",
            f'<package xmlns="{OPF}"><manifest>{manifest}</manifest>'
            f"<spine>{spine_xml}</spine></package>",
        ),
    ]
    from urllib.parse import unquote

    for href, body in chapters:
        members.append((f"OEBPS/{unquote(href)}", body))
    return make_zip(members)


# ===================================================================
# DOCX
# ===================================================================
class TestDocx:
    def test_runs_tabs_breaks_tables(self):
        d = make_docx(
            "<w:p><w:r><w:t>Hello </w:t></w:r>"
            '<w:r><w:t xml:space="preserve">world</w:t></w:r></w:p>'
            "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/>"
            "<w:t>c</w:t><w:cr/><w:t>d</w:t></w:r></w:p>"
            "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell</w:t></w:r></w:p>"
            "</w:tc></w:tr></w:tbl>"
        )
        assert office_format(d) == "docx"
        assert docx_text(d) == "Hello world\na\tb\nc\nd\ncell"

    def test_tracked_deletions_and_field_instructions_excluded(self):
        d = make_docx(
            "<w:p><w:del><w:r><w:delText>GONE</w:delText></w:r></w:del>"
            "<w:r><w:t>kept</w:t></w:r></w:p>"
            "<w:p><w:r><w:instrText>HYPERLINK x</w:instrText></w:r>"
            "<w:r><w:t>result</w:t></w:r></w:p>"
        )
        assert docx_text(d) == "kept\nresult"

    def test_no_break_hyphen_and_empty_doc(self):
        d = make_docx("<w:p><w:r><w:t>a</w:t><w:noBreakHyphen/>"
                      "<w:t>b</w:t></w:r></w:p>")
        assert docx_text(d) == "a-b"
        assert docx_text(make_docx("")) == ""

    def test_missing_document_part_raises_typed(self):
        z = make_zip([("[Content_Types].xml", "<T/>"),
                      ("word/other.xml", "<x/>")])
        with pytest.raises(OfficeUnsupportedError):
            office_text(z)

    def test_doctype_rejected(self):
        d = make_docx("")
        z = make_zip(
            [
                ("[Content_Types].xml", "<T/>"),
                (
                    "word/document.xml",
                    '<!DOCTYPE d [<!ENTITY a "aaaa">]>'
                    f'<w:document xmlns:w="{W}"><w:body/></w:document>',
                ),
            ]
        )
        assert isinstance(docx_text(d), str)  # control
        with pytest.raises(OfficeParseError, match="DTD"):
            docx_text(z)

    def test_doctype_after_comment_padding_rejected(self):
        # a prefix-only DTD scan is defeated by >4KB of comments
        pad = "<!-- " + "x" * 8192 + " -->"
        z = make_zip(
            [
                ("[Content_Types].xml", "<T/>"),
                (
                    "word/document.xml",
                    f'{pad}<!DOCTYPE d [<!ENTITY a "boom">]>'
                    f'<w:document xmlns:w="{W}"><w:body/></w:document>',
                ),
            ]
        )
        with pytest.raises(OfficeParseError, match="DTD"):
            docx_text(z)

    def test_deep_nesting_no_recursion_error(self):
        # hostile nesting must not escape as an untyped RecursionError
        depth = 6000
        body = (
            "<w:p>" + "<w:smartTag>" * depth
            + "<w:r><w:t>deep</w:t></w:r>"
            + "</w:smartTag>" * depth + "</w:p>"
        )
        assert docx_text(make_docx(body)) == "deep"


# ===================================================================
# XLSX
# ===================================================================
class TestXlsx:
    def test_shared_inline_raw_and_rich(self):
        x = make_xlsx(
            [
                '<row><c t="s"><v>0</v></c><c><v>42.5</v></c></row>'
                '<row><c t="inlineStr"><is><t>inl</t></is></c>'
                '<c t="s"><v>1</v></c></row>'
            ],
            shared_xml="<si><t>plain</t></si>"
            '<si><r><t>rich</t></r><r><t xml:space="preserve"> run</t></r>'
            "</si>",
        )
        assert office_format(x) == "xlsx"
        assert xlsx_text(x) == "plain\t42.5\ninl\trich run"

    def test_phonetic_runs_not_duplicated(self):
        """<rPh> furigana hints inside a shared-string item are
        reading metadata, not content — their <t> nodes must not be
        appended to the cell text (r12 ADVICE: Japanese workbooks were
        extracting '東京とうきょう')."""
        x = make_xlsx(
            ['<row><c t="s"><v>0</v></c></row>'],
            shared_xml=(
                "<si><t>東京</t>"
                '<rPh sb="0" eb="2"><t>とうきょう</t>'
                "</rPh><phoneticPr fontId=\"1\"/></si>"
            ),
        )
        assert xlsx_text(x) == "東京"

    def test_workbook_order_not_zip_order(self):
        x = make_xlsx(
            ["<row><c><v>first</v></c></row>",
             "<row><c><v>second</v></c></row>"],
            workbook_order=[2, 1],
        )
        assert xlsx_text(x) == "second\nfirst"

    def test_bad_shared_ref_raises_typed(self):
        x = make_xlsx(['<row><c t="s"><v>7</v></c></row>'],
                      shared_xml="<si><t>only</t></si>")
        with pytest.raises(OfficeParseError, match="shared-string"):
            xlsx_text(x)
        # negative indexes would WRAP via Python indexing — must raise,
        # not silently return the last shared string
        neg = make_xlsx(['<row><c t="s"><v>-1</v></c></row>'],
                        shared_xml="<si><t>only</t></si>")
        with pytest.raises(OfficeParseError, match="shared-string"):
            xlsx_text(neg)

    def test_unresolvable_sheet_raises_typed(self):
        members = [
            ("[Content_Types].xml", '<Types xmlns="x"/>'),
            (
                "xl/workbook.xml",
                f'<workbook xmlns="{S}" xmlns:r="{R}"><sheets>'
                '<sheet name="s" sheetId="1" r:id="rId1"/>'
                "</sheets></workbook>",
            ),
        ]
        with pytest.raises(OfficeParseError, match="resolvable"):
            xlsx_text(make_zip(members))

    def test_empty_cells_and_no_shared_strings(self):
        x = make_xlsx(["<row><c/><c><v>x</v></c></row><row/>"])
        assert xlsx_text(x) == "\tx\n"


# ===================================================================
# PPTX
# ===================================================================
class TestPptx:
    def test_presentation_order_and_breaks(self):
        x = make_pptx(
            ["<a:p><a:r><a:t>later</a:t></a:r></a:p>",
             "<a:p><a:r><a:t>first</a:t></a:r><a:br/>"
             "<a:r><a:t>more</a:t></a:r></a:p>"],
            id_order=[2, 1],
        )
        assert office_format(x) == "pptx"
        assert pptx_text(x) == "first\nmore\nlater"

    def test_missing_slide_raises_typed(self):
        members = [
            ("[Content_Types].xml", '<Types xmlns="x"/>'),
            (
                "ppt/presentation.xml",
                f'<p:presentation xmlns:p="{P}" xmlns:r="{R}">'
                '<p:sldIdLst><p:sldId id="256" r:id="rId1"/></p:sldIdLst>'
                "</p:presentation>",
            ),
        ]
        with pytest.raises(OfficeParseError, match="resolvable"):
            pptx_text(make_zip(members))


# ===================================================================
# ODF
# ===================================================================
class TestOdf:
    def test_paragraphs_spaces_tabs_breaks(self):
        o = make_odt(
            "<text:h>Title</text:h>"
            '<text:p>a<text:s text:c="3"/>b<text:tab/>c'
            "<text:line-break/>d</text:p>"
            "<text:p>x <text:span>span</text:span> tail</text:p>"
        )
        assert office_format(o) == "odf"
        assert odf_text(o) == "Title\na   b\tc\nd\nx span tail"

    def test_notes_excluded(self):
        o = make_odt(
            "<text:p>body<text:note><text:note-body><text:p>FOOT"
            "</text:p></text:note-body></text:note> after</text:p>"
        )
        assert odf_text(o) == "body after"

    def test_spreadsheet_flavor_cells(self):
        # ods cells hold text:p inside table:table-cell — iter finds
        # them without spreadsheet-specific code
        table_ns = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
        buf = make_zip(
            [
                ("mimetype",
                 "application/vnd.oasis.opendocument.spreadsheet"),
                (
                    "content.xml",
                    f'<office:document-content xmlns:office="{O}" '
                    f'xmlns:text="{T}" xmlns:table="{table_ns}">'
                    "<office:body><office:spreadsheet><table:table>"
                    "<table:table-row><table:table-cell>"
                    "<text:p>A1</text:p></table:table-cell>"
                    "<table:table-cell><text:p>B1</text:p>"
                    "</table:table-cell></table:table-row>"
                    "</table:table></office:spreadsheet></office:body>"
                    "</office:document-content>",
                ),
            ]
        )
        assert odf_text(buf) == "A1\nB1"


# ===================================================================
# EPUB
# ===================================================================
class TestEpub:
    def test_spine_order_and_percent_decoding(self):
        e = make_epub(
            [
                ("ch%201.xhtml",
                 f'<html xmlns="{XH}"><head><title>DROP</title></head>'
                 "<body><p>One.</p><script>DROP()</script>"
                 "<p>Two <b>bold</b>.</p></body></html>"),
                ("ch2.xhtml",
                 f'<html xmlns="{XH}"><body><p>Three.</p></body></html>'),
            ],
            spine=["ch2.xhtml", "ch%201.xhtml"],
        )
        assert office_format(e) == "epub"
        assert epub_text(e) == "Three.\n\nOne.\nTwo bold."

    def test_deep_nesting_chapter_no_recursion_error(self):
        depth = 6000
        chap = ("<html><body>" + "<span>" * depth + "deep"
                + "</span>" * depth + "</body></html>")
        e = make_epub([("c.xhtml", chap)], spine=["c.xhtml"])
        assert epub_text(e) == "deep"

    def test_fallback_tier_for_tag_soup_chapter(self):
        e = make_epub(
            [("c.xhtml",
              "<html><body><p>Sloppy <br> soup &amp; entities</p></body>")],
            spine=["c.xhtml"],
        )
        assert epub_text(e) == "Sloppy\nsoup & entities"

    def test_non_text_spine_items_skipped(self):
        e = make_epub(
            [("c.xhtml", f'<html xmlns="{XH}"><body><p>ok</p></body></html>')],
            spine=["c.xhtml"],
            extra_items='<item id="css" href="s.css" media-type="text/css"/>',
        )
        assert epub_text(e) == "ok"

    def test_missing_chapter_raises_typed(self):
        e = make_epub(
            [("c.xhtml", "<html><body>x</body></html>")], spine=["c.xhtml"]
        )
        # remove the chapter member by rebuilding without it
        zf = zipfile.ZipFile(io.BytesIO(e))
        members = [
            (n, zf.read(n)) for n in zf.namelist() if not n.endswith(".xhtml")
        ]
        with pytest.raises(OfficeParseError, match="missing"):
            epub_text(make_zip(members))

    def test_empty_spine_raises_typed(self):
        e = make_epub(
            [("c.xhtml", "<html><body>x</body></html>")], spine=[]
        )
        with pytest.raises(OfficeParseError, match="spine"):
            epub_text(e)


# ===================================================================
# RTF
# ===================================================================
class TestRtf:
    def test_basic_paragraphs_and_formatting_words_dropped(self):
        s = rb"{\rtf1\ansi Hello {\b bold} plain\par Second\tab col}"
        assert rtf_text(s) == "Hello bold plain\nSecond\tcol"

    def test_unicode_with_uc_skip(self):
        assert rtf_text(rb"{\rtf1 caf\u233 ?x}") == "caféx"
        assert rtf_text(rb"{\rtf1\uc2 a\u233 ??b}") == "aéb"
        assert rtf_text(rb"{\rtf1\uc0 a\u233 b}") == "aéb"
        # negative param wraps per spec
        assert rtf_text(rb"{\rtf1\uc0 \u-3825 }") == ""
        # fallback may be an \'xx escape — consumed as ONE char
        assert rtf_text(rb"{\rtf1 x\u8364 \'80y}") == "x€y"

    def test_hex_bytes_honor_ansicpg(self):
        assert rtf_text(rb"{\rtf1\ansicpg1252 \'e9}") == "é"
        assert rtf_text(rb"{\rtf1\ansicpg1251 \'e9}") == "й"  # Cyrillic
        # unknown codepage keeps the cp1252 default
        assert rtf_text(rb"{\rtf1\ansicpg99999 \'e9}") == "é"

    def test_destinations_skipped_results_kept(self):
        s = (rb"{\rtf1{\fonttbl{\f0 Arial;}}{\colortbl;\red0;}"
             rb"{\info{\author X}}"
             rb"{\field{\*\fldinst HYPERLINK url}{\fldrslt shown}}body}")
        assert rtf_text(s) == "shownbody"

    def test_ignorable_destination_skipped(self):
        assert rtf_text(rb"{\rtf1 a{\*\anything deep {\nested x}}b}") == "ab"

    def test_escapes_and_symbols(self):
        s = rb"{\rtf1 a\{b\}c\\d\~e\_f\emdash g\lquote h}"
        assert rtf_text(s) == "a{b}c\\d e-f-g'h"

    def test_bin_skip(self):
        s = rb"{\rtf1 a{\*\picprop\bin5 " + b"\x01{}\\}" + rb"x}b}"
        assert rtf_text(s) == "ab"
        s2 = rb"{\rtf1 a\bin3 {{{b}"
        assert rtf_text(s2) == "ab"

    def test_truncated_is_tolerant_non_rtf_raises(self):
        assert rtf_text(rb"{\rtf1 partial tex") == "partial tex"
        with pytest.raises(OfficeParseError):
            rtf_text(b"not rtf")

    def test_raw_newlines_between_tokens_not_text(self):
        assert rtf_text(b"{\\rtf1 a\r\nb\\par\r\nc}") == "ab\nc"


# ===================================================================
# sniffing + taxonomy + bombs
# ===================================================================
class TestContainer:
    def test_cfb_legacy_and_encrypted(self):
        # real containers via the test_doc CFB writer: .doc/.xls/.ppt
        # all EXTRACT now (see test_doc.py / test_legacy_xls_ppt.py);
        # ECMA-376-encrypted stays typed; structurally-broken CFB is a
        # parse error
        from tests.test_doc import build_cfb

        assert office_format(
            build_cfb([("Workbook", b"\x09\x08\x00\x00")])
        ) == "xls"
        enc = build_cfb(
            [("EncryptionInfo", b"\x04\x00\x02\x00" + b"\0" * 40)]
        )
        with pytest.raises(OfficeEncryptedError):
            office_text(enc)
        with pytest.raises(OfficeParseError):
            office_text(CFB + b"\x00" * 64)

    def test_unknown_zip_and_garbage(self):
        with pytest.raises(OfficeUnsupportedError, match="recognized"):
            office_text(make_zip([("random.txt", "hi")]))
        with pytest.raises(OfficeParseError):
            office_text(b"complete garbage")
        with pytest.raises(OfficeParseError):
            office_text(b"")
        with pytest.raises(OfficeParseError):
            office_format("not bytes")  # type: ignore[arg-type]

    def test_truncated_zip_raises_typed(self):
        d = make_docx("<w:p><w:r><w:t>x</w:t></w:r></w:p>")
        with pytest.raises(OfficeError):
            office_text(d[: len(d) // 2])

    def test_member_count_cap(self, monkeypatch):
        monkeypatch.setattr(off, "_MAX_MEMBERS", 3)
        z = make_zip([(f"f{i}", "x") for i in range(5)])
        with pytest.raises(OfficeBombError, match="members"):
            office_format(z)

    def test_declared_size_caps(self, monkeypatch):
        monkeypatch.setattr(off, "_MAX_MEMBER_UNCOMPRESSED", 10)
        z = make_docx("<w:p><w:r><w:t>0123456789abcdef</w:t></w:r></w:p>")
        with pytest.raises(OfficeBombError, match="declares"):
            office_format(z)
        monkeypatch.setattr(off, "_MAX_MEMBER_UNCOMPRESSED", 10**9)
        monkeypatch.setattr(off, "_MAX_TOTAL_UNCOMPRESSED", 10)
        with pytest.raises(OfficeBombError, match="total"):
            office_format(z)

    def test_lying_header_read_time_cap(self, monkeypatch):
        # declared sizes are attacker-controlled: shrink every size
        # field to 1 so the up-front check passes, then the bounded
        # read must still catch the real inflation
        body = "A" * 4096
        z = bytearray(
            make_zip([("mimetype", "application/epub+zip"),
                      ("META-INF/container.xml", body)])
        )
        import struct

        n = z.find(b"PK\x01\x02")
        while n != -1:
            # central header: compressed size @20, uncompressed @24
            declared = struct.unpack_from("<I", z, n + 24)[0]
            if declared > 1:
                struct.pack_into("<I", z, n + 24, 1)
            n = z.find(b"PK\x01\x02", n + 4)
        monkeypatch.setattr(off, "_MAX_MEMBER_UNCOMPRESSED", 100)
        with pytest.raises(OfficeError):
            # zipfile itself may reject the size mismatch (typed via
            # _zread) or our cap trips — either way typed, never raw
            office_text(bytes(z))


# ===================================================================
# fuzz: never raises untyped
# ===================================================================
class TestFuzz:
    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=2048))
    def test_random_binary_only_typed_errors(self, data):
        try:
            out = office_text(data)
            assert isinstance(out, str)
        except OfficeError:
            pass

    @settings(max_examples=100, deadline=None)
    @given(st.binary(max_size=512))
    def test_rtf_fuzz_tolerant(self, tail):
        out = rtf_text(b"{\\rtf1" + tail)
        assert isinstance(out, str)

    @settings(max_examples=80, deadline=None)
    @given(st.integers(0, 10**9), st.integers(0, 255))
    def test_corrupted_docx_only_typed(self, pos, val):
        d = bytearray(
            make_docx("<w:p><w:r><w:t>stable text body</w:t></w:r></w:p>")
        )
        d[pos % len(d)] = val
        try:
            out = office_text(bytes(d))
            assert isinstance(out, str)
        except OfficeError:
            pass

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.text(
                    alphabet="abcdefghij/._[]", min_size=1, max_size=30
                ),
                st.binary(max_size=200),
            ),
            max_size=8,
        )
    )
    def test_random_zip_members_only_typed(self, members):
        seen = set()
        uniq = []
        for name, data in members:
            if name in seen or name.endswith("/"):
                continue
            seen.add(name)
            uniq.append((name, data))
        try:
            out = office_text(make_zip(uniq))
            assert isinstance(out, str)
        except OfficeError:
            pass


# ===================================================================
# Spark operator surface
# ===================================================================
class TestSparkOperator:
    def test_extract_with_quarantine_and_format(self, spark):
        rows = [
            ("a", make_docx("<w:p><w:r><w:t>doc text</w:t></w:r></w:p>")),
            ("b", rb"{\rtf1 rtf text}"),
            ("c", b"garbage bytes"),
            ("d", None),
            ("e", CFB + b"\x00" * 32),  # broken OLE: typed parse error
        ]
        df = spark.createDataFrame(rows, "doc_id string, content binary")
        out = extract_office_text(
            df, error_col="err", format_col="fmt"
        ).select("doc_id", "text", "err", "fmt")
        got = {r["doc_id"]: (r["text"], r["err"], r["fmt"])
               for r in out.collect()}
        assert got["a"] == ("doc text", None, "docx")
        assert got["b"] == ("rtf text", None, "rtf")
        assert got["c"] == (None, "OfficeParseError", None)
        assert got["d"] == (None, None, None)
        assert got["e"] == (None, "OfficeParseError", None)

    def test_column_form_null_vs_raise(self, spark):
        df = spark.createDataFrame(
            [("x", b"junk")], "doc_id string, content binary"
        )
        assert (
            df.select(office_text_column("content").alias("t"))
            .collect()[0]["t"]
            is None
        )
        with pytest.raises(Exception, match="OfficeParseError"):
            df.select(
                office_text_column("content", errors="raise").alias("t")
            ).collect()
        with pytest.raises(ValueError, match="errors must be"):
            office_text_column("content", errors="bogus")
        with pytest.raises(ValueError, match="require"):
            extract_office_text(df, errors="raise", error_col="e")


# ===================================================================
# gate payload pin (the q41 'office' planted payloads)
# ===================================================================
def gate_payloads() -> dict[str, tuple[bytes, str]]:
    """(bytes, expected text) per planted gate key — REGENERATED here
    and pinned against the hex constants in sink_source_gates.py."""
    docx = make_docx(
        "<w:p><w:r><w:t>Planted docx body</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>cell</w:t><w:tab/><w:t>aligned</w:t></w:r></w:p>"
    )
    xlsx = make_xlsx(
        ['<row><c t="s"><v>0</v></c><c><v>314</v></c></row>'],
        shared_xml="<si><t>planted sheet</t></si>",
    )
    pptx = make_pptx(
        ["<a:p><a:r><a:t>slide two</a:t></a:r></a:p>",
         "<a:p><a:r><a:t>slide one</a:t></a:r></a:p>"],
        id_order=[2, 1],
    )
    odt = make_odt(
        "<text:h>Planted ODT</text:h>"
        '<text:p>alpha<text:s text:c="2"/>beta</text:p>'
    )
    epub = make_epub(
        [
            ("one.xhtml",
             f'<html xmlns="{XH}"><body><p>Spine first.</p></body></html>'),
            ("two.xhtml",
             f'<html xmlns="{XH}"><body><p>Spine second.</p></body></html>'),
        ],
        spine=["one.xhtml", "two.xhtml"],
    )
    return {
        "docx": (docx, "Planted docx body\ncell\taligned"),
        "xlsx": (xlsx, "planted sheet\t314"),
        "pptx": (pptx, "slide one\nslide two"),
        "odt": (odt, "Planted ODT\nalpha  beta"),
        "epub": (epub, "Spine first.\n\nSpine second."),
    }


def test_gate_payloads_extract():
    for key, (data, want) in gate_payloads().items():
        assert office_text(data) == want, key


def test_gate_payload_pin():
    from data_governance_spark.queries import sink_source_gates as g

    for key, (data, _) in gate_payloads().items():
        pinned = getattr(g, f"_OFFICE_{key.upper()}_HEX")
        assert bytes.fromhex(pinned) == data, (
            f"q41 'office' planted payload {key!r} drifted from the "
            "writer — regenerate the hex constant"
        )
        want_text = getattr(g, f"_OFFICE_{key.upper()}_TEXT")
        assert office_text(data) == want_text, key


class TestTextBoxDedup:
    def test_alternate_content_not_duplicated(self):
        # text boxes arrive as mc:AlternateContent with IDENTICAL
        # payloads under Choice and Fallback, nested INSIDE a w:p —
        # naive double-walking extracted the box text 4x (review repro)
        mc = "http://schemas.openxmlformats.org/markup-compatibility/2006"
        box = (
            '<w:p><w:r><w:t>before</w:t></w:r>'
            f'<mc:AlternateContent xmlns:mc="{mc}">'
            "<mc:Choice><w:drawing><w:txbxContent>"
            "<w:p><w:r><w:t>boxtext</w:t></w:r></w:p>"
            "</w:txbxContent></w:drawing></mc:Choice>"
            "<mc:Fallback><w:pict><w:txbxContent>"
            "<w:p><w:r><w:t>boxtext</w:t></w:r></w:p>"
            "</w:txbxContent></w:pict></mc:Fallback>"
            "</mc:AlternateContent>"
            "<w:r><w:t>after</w:t></w:r></w:p>"
            "<w:p><w:r><w:t>second para</w:t></w:r></w:p>"
        )
        got = docx_text(make_docx(box))
        assert got.count("boxtext") == 1
        assert got == "before\nboxtext\nafter\nsecond para"


class TestEpubDoctype:
    def test_epub2_doctype_reaches_et_tier(self):
        # EPUB 2 REQUIRES an XHTML 1.1 DOCTYPE; the external-subset
        # form must not banish spec-conforming chapters to the regex
        # fallback (review finding). The marker: ET drops '>' chars
        # inside attribute values correctly where the regex tier
        # mangles them.
        chap = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.1//EN" '
            '"http://www.w3.org/TR/xhtml11/DTD/xhtml11.dtd">\n'
            f'<html xmlns="{XH}"><body>'
            '<p title="a &gt; b">Structured text.</p></body></html>'
        )
        e = make_epub([("c.xhtml", chap)], spine=["c.xhtml"])
        assert epub_text(e) == "Structured text."

    def test_internal_subset_still_rejected_to_fallback(self):
        chap = (
            '<!DOCTYPE html [<!ENTITY x "boom">]>'
            "<html><body><p>fallback text</p></body></html>"
        )
        e = make_epub([("c.xhtml", chap)], spine=["c.xhtml"])
        # entity bomb vector stays out of ET; regex tier still extracts
        assert "fallback text" in epub_text(e)
