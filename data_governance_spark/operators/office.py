"""Office / e-book document text extraction — DOCX, XLSX, PPTX,
ODF (odt/ods/odp), EPUB, RTF — pure stdlib, Arrow-batched.

After PDF (``operators/pdf.py``), office formats are the next-largest
class of opaque binary documents in a crawled corpus.  This module
turns their bytes into the text layer a training pipeline feeds into
quality filtering / dedup / lang-ID, with the same contracts the PDF
tier established:

- **Typed error taxonomy** (:class:`OfficeError` subclasses) — a
  corrupt or hostile file NEVER raises an untyped exception out of
  ``office_text`` (pinned by generative fuzzers in
  ``tests/test_office.py``), so one bad document quarantines instead
  of killing a 100 TB Spark job.
- **Quarantine-shaped operator** (:func:`extract_office_text`):
  map-only ``pandas_udf``, NULL-in → NULL-out, optional ``error_col``
  capturing the typed class name per row (the JSONL/CSV ``bad``-frame
  pattern).  No shuffle, no driver state — scales linearly with
  executors.
- **Bomb-bounded container handling**: the OOXML/ODF/EPUB formats are
  ZIP archives, and ZIP archives lie — declared sizes are checked
  AND every member read is re-capped during decompression
  (:class:`OfficeBombError`), so a 42.zip-style payload costs one
  typed row, not an executor OOM.

Formats are sniffed from magic bytes + container structure
(:func:`office_format`), never from file extensions (crawled URLs
lie about extensions constantly):

========  ==========================================================
format    implemented surface (public specs only)
========  ==========================================================
docx      ISO/IEC 29500 WordprocessingML ``word/document.xml``:
          paragraphs in document order (incl. table cells and text
          boxes), ``w:t`` runs, ``w:tab``/``w:br``/``w:cr``,
          tracked DELETIONS excluded, field instructions excluded
          (field results kept).
xlsx      ISO/IEC 29500 SpreadsheetML: shared strings (incl. rich
          runs), inline strings, raw cell values; sheets in
          WORKBOOK order via ``workbook.xml`` + its rels (not zip
          member order).  Cell VALUES as stored — this is text
          extraction, not grid/formula reconstruction (stated).
pptx      ISO/IEC 29500 PresentationML: slides in PRESENTATION
          order via ``sldIdLst`` + rels, ``a:t`` runs, ``a:br``.
odt/…     OASIS ODF 1.2 ``content.xml``: ``text:p``/``text:h`` in
          document order, ``text:s`` (run-length spaces),
          ``text:tab``, ``text:line-break``.
epub      EPUB OCF container → OPF package → SPINE order; XHTML
          chapters extracted via ElementTree (spec requires
          well-formed XML) with a regex fallback tier for the
          real-world not-quite-XHTML files.
rtf       Word2007 RTF 1.9.1 control-word tokenizer: groups,
          ignorable/skip destinations, ``\\uN`` Unicode with ``\\uc``
          fallback skipping, ``\\'xx`` bytes via ``\\ansicpgN``,
          ``\\binN`` raw-binary skip, escaped braces.
doc       legacy Word binary over a real [MS-CFB] reader
          (``operators/cfb.py``): FIB → 0Table/1Table per
          ``fWhichTblStm`` → Clx/Pcdt piece table → cp1252-compressed
          and UTF-16LE pieces, cut at ``ccpText`` (main body only);
          ``fEncrypted`` raises typed.
xls       legacy Excel binary (BIFF8, [MS-XLS]): SST shared strings
          incl. the CONTINUE split rule (fresh compression flag at
          every record boundary), LABELSST/NUMBER/RK/MULRK/LABEL
          cells in stream order; FILEPASS encryption and BIFF5
          ('Book') raise typed.
ppt       legacy PowerPoint binary ([MS-PPT]): the record tree of
          the PowerPoint Document stream walked for
          TextCharsAtom/TextBytesAtom/CString leaves;
          CryptSession10 raises typed.
…         ECMA-376 encrypted OOXML (CFB with ``EncryptionInfo``)
          stays typed :class:`OfficeEncryptedError`; zstd-class
          gaps keep the same honesty rule as the MP3/H.264 codec
          boundaries.
========  ==========================================================

Reference parity note: the reference system (bireme/data-governance)
has no office-document surface — this tier belongs to the extended
training-data scope, like PDF/WARC/codecs.  Everything here derives
from the public format specifications cited above.
"""

from __future__ import annotations

import html as _htmlmod
import io
import posixpath
import re
import struct
import zipfile
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "OfficeError",
    "OfficeParseError",
    "OfficeEncryptedError",
    "OfficeUnsupportedError",
    "OfficeBombError",
    "office_format",
    "office_text",
    "docx_text",
    "xlsx_text",
    "pptx_text",
    "odf_text",
    "epub_text",
    "rtf_text",
    "doc_text",
    "xls_text",
    "ppt_text",
    "office_text_column",
    "extract_office_text",
]


class OfficeError(ValueError):
    """Base for every typed office-extraction failure."""


class OfficeParseError(OfficeError):
    """Structurally broken: not an office file, truncated/corrupt ZIP,
    missing required part, malformed XML, DTD smuggling."""


class OfficeEncryptedError(OfficeError):
    """ECMA-376 encrypted OOXML (CFB wrapper + EncryptionInfo)."""


class OfficeUnsupportedError(OfficeError):
    """Recognized but out of scope (legacy OLE .doc/.xls/.ppt, a ZIP
    that is none of the known document containers)."""


class OfficeBombError(OfficeError):
    """Decompression bomb: declared or actual expansion over the cap."""


# -- container caps (per DOCUMENT, enforced twice: declared sizes up
# front, then re-checked during each member read because ZIP headers
# lie) ---------------------------------------------------------------
_MAX_TOTAL_UNCOMPRESSED = 256 * 1024 * 1024
_MAX_MEMBER_UNCOMPRESSED = 128 * 1024 * 1024
_MAX_MEMBERS = 10_000

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def _open_zip(data: bytes) -> zipfile.ZipFile:
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except (zipfile.BadZipFile, OSError, EOFError, ValueError,
            NotImplementedError) as e:
        # NotImplementedError: zipfile rejects hostile version-needed
        # fields at CONSTRUCTION time (fuzz-caught)
        raise OfficeParseError(f"bad zip container: {e}") from None
    try:
        infos = zf.infolist()
        if len(infos) > _MAX_MEMBERS:
            raise OfficeBombError(
                f"{len(infos)} zip members (cap {_MAX_MEMBERS})"
            )
        total = 0
        for zi in infos:
            if zi.file_size > _MAX_MEMBER_UNCOMPRESSED:
                raise OfficeBombError(
                    f"member {zi.filename!r} declares {zi.file_size} bytes"
                )
            total += zi.file_size
            if total > _MAX_TOTAL_UNCOMPRESSED:
                raise OfficeBombError(
                    f"archive declares > {total} bytes total"
                )
    except OfficeError:
        zf.close()
        raise
    return zf


def _zread(zf: zipfile.ZipFile, name: str) -> bytes:
    """Read one member with the cap enforced DURING decompression —
    the declared size is attacker-controlled."""
    try:
        with zf.open(name) as fh:
            out = fh.read(_MAX_MEMBER_UNCOMPRESSED + 1)
    except KeyError:
        raise OfficeParseError(f"missing zip member {name!r}") from None
    except (zipfile.BadZipFile, OSError, EOFError, ValueError,
            NotImplementedError) as e:
        # NotImplementedError: unsupported compression method id
        raise OfficeParseError(f"unreadable member {name!r}: {e}") from None
    if len(out) > _MAX_MEMBER_UNCOMPRESSED:
        raise OfficeBombError(f"member {name!r} inflates past the cap")
    return out


def _xml(data: bytes, what: str) -> ET.Element:
    # expat expands internal entities (billion-laughs); no office
    # format needs a DTD, so the presence of one is hostile.  The
    # WHOLE buffer is scanned — a prefix-only check is defeated by
    # comment padding before the DOCTYPE.  (A literal "<!ENTITY"
    # could only legitimately appear inside CDATA, which no office
    # format emits — acceptable false-positive surface.)
    if b"<!DOCTYPE" in data or b"<!ENTITY" in data:
        raise OfficeParseError(f"{what}: DTD/entity declarations rejected")
    try:
        return ET.fromstring(data)
    except ET.ParseError as e:
        raise OfficeParseError(f"{what}: malformed XML: {e}") from None


def _names(zf: zipfile.ZipFile) -> set:
    return set(zf.namelist())


# ===================================================================
# format sniffing
# ===================================================================
def office_format(data: bytes) -> str:
    """Sniff the document family from bytes: ``docx xlsx pptx odf
    epub rtf`` — or raise typed (:class:`OfficeEncryptedError` for
    encrypted OOXML, :class:`OfficeUnsupportedError` for legacy OLE /
    unknown ZIP, :class:`OfficeParseError` otherwise)."""
    if not isinstance(data, (bytes, bytearray)):
        raise OfficeParseError(f"expected bytes, got {type(data).__name__}")
    data = bytes(data)
    if data[:5] == b"{\\rtf":
        return "rtf"
    if data[:8] == _CFB_MAGIC:
        from data_governance_spark.operators.cfb import CfbError, CfbFile

        try:
            cf = CfbFile(data)
        except CfbError as e:
            raise OfficeParseError(f"broken OLE container: {e}") from None
        if cf.has("EncryptionInfo"):
            raise OfficeEncryptedError(
                "ECMA-376 encrypted OOXML (OLE wrapper with "
                "EncryptionInfo) — password-protected documents are "
                "quarantined"
            )
        if cf.has("WordDocument"):
            return "doc"
        if cf.has("Workbook"):
            return "xls"
        if cf.has("Book"):
            raise OfficeUnsupportedError(
                "BIFF5 .xls ('Book' stream) is out of scope — BIFF8 "
                "('Workbook') decodes"
            )
        if cf.has("PowerPoint Document"):
            return "ppt"
        raise OfficeUnsupportedError(
            "OLE compound document without a recognized document stream"
        )
    if data[:4] not in (b"PK\x03\x04", b"PK\x05\x06", b"PK\x07\x08"):
        raise OfficeParseError("not a recognized office document")
    zf = _open_zip(data)
    try:
        names = _names(zf)
        if "[Content_Types].xml" in names:
            if "word/document.xml" in names:
                return "docx"
            if "xl/workbook.xml" in names:
                return "xlsx"
            if "ppt/presentation.xml" in names:
                return "pptx"
            raise OfficeUnsupportedError(
                "OOXML package without a word/xl/ppt document part"
            )
        if "content.xml" in names and "mimetype" in names:
            mt = _zread(zf, "mimetype")[:64]
            if mt.startswith(b"application/vnd.oasis.opendocument"):
                return "odf"
        if "META-INF/container.xml" in names:
            return "epub"
        if "mimetype" in names and _zread(zf, "mimetype").startswith(
            b"application/epub+zip"
        ):
            return "epub"
        raise OfficeUnsupportedError(
            "zip archive without a recognized document structure"
        )
    finally:
        zf.close()


# ===================================================================
# DOCX — WordprocessingML
# ===================================================================
_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_MC = "{http://schemas.openxmlformats.org/markup-compatibility/2006}"
_WML_SKIP = frozenset(
    (
        _W + "del",        # tracked deletion
        _W + "moveFrom",   # tracked move source
        _W + "instrText",  # field INSTRUCTION (the result run is kept)
        _W + "delText",
        _W + "delInstrText",
        # mc:AlternateContent carries the SAME payload twice (Choice
        # for new readers, Fallback for old) — walking both would
        # duplicate every text box (review repro)
        _MC + "Fallback",
    )
)


def _wml_para(p) -> str:
    # iterative DFS: a hostile document can nest elements thousands
    # deep, and a RecursionError is NOT a typed OfficeError — it
    # would escape the quarantine and kill the Spark task
    parts: list[str] = []
    stack: list = [p]
    while stack:
        e = stack.pop()
        if isinstance(e, str):  # pending separator
            parts.append(e)
            continue
        tag = e.tag
        if tag in _WML_SKIP:
            continue
        if tag == _W + "t":
            parts.append(e.text or "")
            continue
        if tag == _W + "tab":
            parts.append("\t")
        elif tag in (_W + "br", _W + "cr"):
            parts.append("\n")
        elif tag == _W + "noBreakHyphen":
            parts.append("-")
        elif tag == _W + "p" and e is not p:
            # a NESTED paragraph (text-box content): its own line,
            # opened AND closed
            parts.append("\n")
            stack.append("\n")
        stack.extend(reversed(list(e)))
    return "".join(parts)


def docx_text(data: bytes) -> str:
    """Paragraph text of ``word/document.xml`` in document order, one
    line per TOP-LEVEL ``w:p`` (table-cell paragraphs are top-level;
    text-box paragraphs nest INSIDE a ``w:p`` and emit inline on their
    own lines — walking them twice would duplicate the content, the
    review-caught bug).  ``mc:Fallback`` duplicates are skipped."""
    zf = _open_zip(data)
    try:
        root = _xml(_zread(zf, "word/document.xml"), "word/document.xml")
    finally:
        zf.close()
    paras: list[str] = []
    stack = [root]
    while stack:
        e = stack.pop()
        if e.tag == _W + "p":
            paras.append(_wml_para(e))
            continue  # nested w:p handled inline by _wml_para
        if e.tag in _WML_SKIP:
            continue
        stack.extend(reversed(list(e)))
    return "\n".join(paras)


# ===================================================================
# XLSX — SpreadsheetML
# ===================================================================
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_PR = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_OR = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _rels(zf: zipfile.ZipFile, part: str) -> dict:
    """rId -> zip path, resolved relative to the part's directory."""
    d = posixpath.dirname(part)
    rels_path = posixpath.join(d, "_rels", posixpath.basename(part) + ".rels")
    if rels_path not in _names(zf):
        return {}
    root = _xml(_zread(zf, rels_path), rels_path)
    out = {}
    for rel in root.iter(_PR + "Relationship"):
        rid, target = rel.get("Id"), rel.get("Target")
        if not rid or not target:
            continue
        if target.startswith("/"):
            out[rid] = target.lstrip("/")
        else:
            out[rid] = posixpath.normpath(posixpath.join(d, target))
    return out


def _si_text(si) -> str:
    """Text of one shared-string item: one ``<t>`` or rich runs
    ``<r><t>…`` — but NOT ``<rPh>``/``<phoneticPr>`` subtrees, whose
    ``<t>`` nodes are furigana reading hints that would duplicate the
    text of Japanese workbooks (r12 ADVICE)."""
    skip = (_S + "rPh", _S + "phoneticPr")
    out: list[str] = []
    stack = [si]
    while stack:
        el = stack.pop()
        if el.tag in skip:
            continue
        if el.tag == _S + "t":
            out.append(el.text or "")
            continue
        # children in reverse so the pop order is document order
        stack.extend(reversed(list(el)))
    return "".join(out)


def xlsx_text(data: bytes) -> str:
    """Cell text of every sheet, sheets in WORKBOOK order; cells
    tab-joined per row, rows newline-joined.  Values appear as stored
    (numbers unformatted) — extraction, not rendering (stated)."""
    zf = _open_zip(data)
    try:
        names = _names(zf)
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            sroot = _xml(_zread(zf, "xl/sharedStrings.xml"),
                         "xl/sharedStrings.xml")
            shared = [_si_text(si) for si in sroot.iter(_S + "si")]
        wb = _xml(_zread(zf, "xl/workbook.xml"), "xl/workbook.xml")
        rels = _rels(zf, "xl/workbook.xml")
        lines: list[str] = []
        for sheet in wb.iter(_S + "sheet"):
            rid = sheet.get(_OR + "id")
            path = rels.get(rid)
            if path is None or path not in names:
                raise OfficeParseError(
                    f"workbook sheet {sheet.get('name')!r} has no "
                    f"resolvable part (rId {rid!r})"
                )
            sroot = _xml(_zread(zf, path), path)
            for row in sroot.iter(_S + "row"):
                cells: list[str] = []
                for c in row.iter(_S + "c"):
                    t = c.get("t", "n")
                    if t == "s":
                        v = c.find(_S + "v")
                        try:
                            idx = int((v.text or "").strip())
                            if idx < 0:  # negative would wrap silently
                                raise IndexError(idx)
                            cells.append(shared[idx])
                        except (AttributeError, ValueError, IndexError):
                            raise OfficeParseError(
                                "bad shared-string reference in "
                                f"{path!r}"
                            ) from None
                    elif t == "inlineStr":
                        is_ = c.find(_S + "is")
                        cells.append(_si_text(is_) if is_ is not None else "")
                    else:  # n / str / b / e / d — the raw stored value
                        v = c.find(_S + "v")
                        cells.append(v.text or "" if v is not None else "")
                lines.append("\t".join(cells))
        return "\n".join(lines)
    finally:
        zf.close()


# ===================================================================
# PPTX — PresentationML
# ===================================================================
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"


def _dml_para(p) -> str:
    parts: list[str] = []
    stack = [p]
    while stack:  # iterative: see _wml_para
        e = stack.pop()
        if e.tag == _A + "t":
            parts.append(e.text or "")
            continue
        if e.tag == _A + "br":
            parts.append("\n")
        stack.extend(reversed(list(e)))
    return "".join(parts)


def pptx_text(data: bytes) -> str:
    """Text runs of every slide, slides in PRESENTATION order
    (``sldIdLst`` through the presentation rels — zip member order
    and slide file names are NOT authoritative)."""
    zf = _open_zip(data)
    try:
        names = _names(zf)
        pres = _xml(_zread(zf, "ppt/presentation.xml"),
                    "ppt/presentation.xml")
        rels = _rels(zf, "ppt/presentation.xml")
        lines: list[str] = []
        for sid in pres.iter(_P + "sldId"):
            rid = sid.get(_OR + "id")
            path = rels.get(rid)
            if path is None or path not in names:
                raise OfficeParseError(
                    f"slide rId {rid!r} has no resolvable part"
                )
            sroot = _xml(_zread(zf, path), path)
            for p in sroot.iter(_A + "p"):
                lines.append(_dml_para(p))
        return "\n".join(lines)
    finally:
        zf.close()


# ===================================================================
# ODF — OpenDocument (odt/ods/odp share the text: namespace)
# ===================================================================
_T = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_OFF = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"


def _odf_para(p) -> str:
    parts: list[str] = []
    # iterative DFS (see _wml_para); literal strings on the stack are
    # pending tail text / marker output in document order
    stack: list = [(p, True)]
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            parts.append(item)
            continue
        e, top = item
        if not top:
            tag = e.tag
            if tag == _T + "s":
                try:
                    n = int(e.get(_T + "c", "1"))
                except ValueError:
                    n = 1
                parts.append(" " * max(1, min(n, 10_000)))
            elif tag == _T + "tab":
                parts.append("\t")
            elif tag == _T + "line-break":
                parts.append("\n")
            elif tag == _T + "note":  # foot/endnote bodies stay out
                continue
        if e.text:
            parts.append(e.text)
        kids: list = []
        for c in e:
            kids.append((c, False))
            if c.tail:
                kids.append(c.tail)
        stack.extend(reversed(kids))
    return "".join(parts)


def odf_text(data: bytes) -> str:
    """``text:p``/``text:h`` paragraphs of ``content.xml`` in document
    order — covers odt, and the cell paragraphs of ods/odp for free
    (ODF spreadsheets/presentations hold text in the same elements)."""
    zf = _open_zip(data)
    try:
        root = _xml(_zread(zf, "content.xml"), "content.xml")
    finally:
        zf.close()
    body = root.find(_OFF + "body")
    scope = body if body is not None else root
    out: list[str] = []
    stack = [scope]
    # explicit DFS keeping only TOP-LEVEL paragraphs (a text:p nested
    # inside another paragraph's frame must not double-emit)
    while stack:
        e = stack.pop()
        if e.tag in (_T + "p", _T + "h"):
            out.append(_odf_para(e))
            continue
        stack.extend(reversed(list(e)))
    return "\n".join(out)


# ===================================================================
# EPUB — OCF container -> OPF spine -> XHTML chapters
# ===================================================================
_CN = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF = "{http://www.idpf.org/2007/opf}"
_XH = "{http://www.w3.org/1999/xhtml}"

_HTML_DROP = frozenset(
    ("script", "style", "head", "noscript", "template", "svg")
)
_HTML_BLOCK = frozenset(
    "p div br li ul ol h1 h2 h3 h4 h5 h6 tr table section article "
    "header footer blockquote pre hr".split()
)
_RX_DROP = re.compile(
    r"(?is)<(script|style|head|noscript|template|svg)[^>]*>.*?</\1\s*>"
)
_RX_COMMENT = re.compile(r"(?s)<!--.*?-->")
_RX_BLOCK = re.compile(
    r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|"
    r"footer|blockquote|pre|hr)[^>]*>"
)
_RX_TAG = re.compile(r"(?s)<[^>]+>")


def _local(tag) -> str:
    tag = str(tag)
    return tag.rsplit("}", 1)[-1].lower()


def _xhtml_walk(root, parts: list) -> None:
    # iterative DFS (see _wml_para); literal strings on the stack are
    # pending tail text / post-order block newlines
    stack: list = [root]
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            parts.append(item)
            continue
        name = _local(item.tag)
        if name in _HTML_DROP:
            continue
        if name == "br":
            parts.append("\n")
        if item.text:
            parts.append(item.text)
        kids: list = []
        for c in item:
            kids.append(c)
            if c.tail:
                kids.append(c.tail)
        if name in _HTML_BLOCK:
            kids.append("\n")
        stack.extend(reversed(kids))


def _tidy_lines(s: str) -> str:
    lines = [re.sub(r"[ \t\r\f\v]+", " ", ln).strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


# EPUB 2 chapters carry a spec-REQUIRED XHTML 1.1 DOCTYPE; only its
# external-subset form (no '[' internal subset — the entity-bomb
# vector) is stripped so those chapters still reach the ET tier
# instead of always falling back to regex (review finding)
_RX_SAFE_DOCTYPE = re.compile(
    rb"^(\s*<\?xml[^>]*\?>)?\s*<!DOCTYPE[^\[>]*>", re.S
)


def _xhtml_text(data: bytes, what: str) -> str:
    """ET tier for the spec-required well-formed chapters; regex
    fallback (same drop/block/strip discipline as
    ``functions/html.py``'s scan tier) for the real-world rest."""
    try:
        m = _RX_SAFE_DOCTYPE.match(data)
        if m:
            data = data[: len(m.group(1) or b"")] + data[m.end():]
        root = _xml(data, what)
        parts: list = []
        _xhtml_walk(root, parts)
        return _tidy_lines("".join(parts))
    except OfficeParseError:
        txt = data.decode("utf-8", errors="replace")
        txt = _RX_DROP.sub(" ", txt)
        txt = _RX_COMMENT.sub(" ", txt)
        txt = _RX_BLOCK.sub("\n", txt)
        txt = _RX_TAG.sub(" ", txt)
        return _tidy_lines(_htmlmod.unescape(txt))


def epub_text(data: bytes) -> str:
    """Chapter text in SPINE order: container.xml -> OPF package ->
    manifest hrefs (percent-decoded, fragment-stripped) -> XHTML
    extraction per chapter, chapters separated by blank lines."""
    from urllib.parse import unquote

    zf = _open_zip(data)
    try:
        names = _names(zf)
        croot = _xml(_zread(zf, "META-INF/container.xml"),
                     "META-INF/container.xml")
        opf_path = None
        for rf in croot.iter(_CN + "rootfile"):
            if rf.get("media-type") == "application/oebps-package+xml":
                opf_path = rf.get("full-path")
                break
            if opf_path is None:
                opf_path = rf.get("full-path")
        if not opf_path or opf_path not in names:
            raise OfficeParseError("container.xml names no readable OPF")
        opf = _xml(_zread(zf, opf_path), opf_path)
        base = posixpath.dirname(opf_path)
        items: dict = {}
        for it in opf.iter(_OPF + "item"):
            iid, href = it.get("id"), it.get("href")
            if not iid or not href:
                continue
            href = unquote(href.split("#", 1)[0])
            items[iid] = (
                posixpath.normpath(posixpath.join(base, href)),
                it.get("media-type", ""),
            )
        chapters: list[str] = []
        for ref in opf.iter(_OPF + "itemref"):
            entry = items.get(ref.get("idref"))
            if entry is None:
                continue
            path, mtype = entry
            if "xhtml" not in mtype and "html" not in mtype:
                continue  # spine can reference non-text items
            if path not in names:
                raise OfficeParseError(f"spine chapter {path!r} missing")
            chapters.append(_xhtml_text(_zread(zf, path), path))
        if not chapters:
            raise OfficeParseError("OPF spine has no XHTML chapters")
        return "\n\n".join(chapters)
    finally:
        zf.close()


# ===================================================================
# RTF — control-word tokenizer (RTF 1.9.1)
# ===================================================================
# destinations whose content is never document text.  \* -prefixed
# (ignorable) destinations are skipped wholesale per spec.
_RTF_SKIP_DEST = frozenset(
    """fonttbl colortbl stylesheet info pict object themedata datastore
    listtable listoverridetable revtbl xmlnstbl fldinst header footer
    headerl headerr headerf footerl footerr footerf ftnsep ftnsepc
    aftnsep aftnsepc generator leveltext levelnumbers""".split()
)
_RTF_NL = frozenset(("par", "line", "row", "sect", "page"))
_RTF_TAB = frozenset(("tab", "cell", "nestcell"))
_RTF_CHARS = {
    "emdash": "-",
    "endash": "-",
    "lquote": "'",
    "rquote": "'",
    "ldblquote": '"',
    "rdblquote": '"',
    "bullet": "*",
    "emspace": " ",
    "enspace": " ",
    "qmspace": " ",
}
_RX_CW = re.compile(rb"\\([a-zA-Z]{1,32})(-?\d{1,10})? ?")


def _rtf_skip_group(s: bytes, i: int) -> int:
    """``i`` just past a ``{``; return index just past the matching
    ``}`` — honoring escaped braces and ``\\binN`` raw bytes."""
    depth = 1
    n = len(s)
    while i < n and depth:
        c = s[i]
        if c == 0x5C:  # backslash
            m = _RX_CW.match(s, i)
            if m:
                if m.group(1) == b"bin":
                    skip = int(m.group(2) or 0)
                    i = m.end() + max(0, skip)
                else:
                    i = m.end()
            else:
                i += 2  # control symbol (incl. \{ \} \\)
        elif c == 0x7B:
            depth += 1
            i += 1
        elif c == 0x7D:
            depth -= 1
            i += 1
        else:
            i += 1
    return i


def rtf_text(data: bytes) -> str:
    """Document text of an RTF file.  Tolerant by design (truncated
    files and unbalanced groups yield the text parsed so far) but the
    magic is required — anything else raises
    :class:`OfficeParseError`.  Handles ``\\uN`` (with ``\\ucN``
    fallback skipping, group-scoped), ``\\'xx`` via ``\\ansicpgN``,
    ``\\binN``, ignorable/skip destinations, escaped braces."""
    if not isinstance(data, (bytes, bytearray)):
        raise OfficeParseError(f"expected bytes, got {type(data).__name__}")
    data = bytes(data)
    if data[:5] != b"{\\rtf":
        raise OfficeParseError("not an RTF file")
    out: list[str] = []
    codec = "cp1252"
    uc = 1
    stack: list[int] = []
    pending_bytes = bytearray()  # run of \'xx bytes decoded together

    def flush():
        nonlocal pending_bytes
        if pending_bytes:
            out.append(pending_bytes.decode(codec, errors="replace"))
            pending_bytes = bytearray()

    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c == 0x7B:  # {
            # an ignorable destination ({\*\word …}) or a known
            # skip-destination group drops wholesale
            m = _RX_CW.match(data, i + 1)
            if data[i + 1 : i + 3] == b"\\*":
                flush()
                i = _rtf_skip_group(data, i + 1)
                continue
            if m and m.group(1).decode() in _RTF_SKIP_DEST:
                flush()
                i = _rtf_skip_group(data, i + 1)
                continue
            stack.append(uc)
            i += 1
        elif c == 0x7D:  # }
            if stack:
                uc = stack.pop()
            i += 1
        elif c == 0x5C:  # backslash
            nxt = data[i + 1 : i + 2]
            if nxt == b"'":
                hx = data[i + 2 : i + 4]
                try:
                    pending_bytes.append(int(hx, 16))
                except ValueError:
                    pass
                i += 4
                continue
            m = _RX_CW.match(data, i)
            if not m:
                flush()
                sym = nxt.decode("latin-1", errors="replace")
                if sym in "\\{}":
                    out.append(sym)
                elif sym == "~":
                    out.append(" ")
                elif sym == "_":
                    out.append("-")
                elif sym in "\r\n":
                    out.append("\n")  # escaped newline == \par
                # \- (optional hyphen), \: and unknown symbols: drop
                i += 2
                continue
            word = m.group(1).decode()
            param = int(m.group(2)) if m.group(2) else None
            i = m.end()
            if word == "u" and param is not None:
                flush()
                cp = param + 65536 if param < 0 else param
                out.append(chr(cp) if 0 <= cp < 0x110000 else "\ufffd")
                # skip `uc` fallback chars: plain bytes or \'xx each
                skipped = 0
                while skipped < uc and i < n:
                    if data[i : i + 2] == b"\\'":
                        i += 4
                        skipped += 1
                    elif data[i] in (0x7B, 0x7D, 0x5C):
                        break  # group/control boundary ends fallback
                    else:
                        i += 1
                        skipped += 1
                continue
            flush()
            if word == "uc" and param is not None:
                uc = max(0, param)
            elif word == "ansicpg" and param is not None:
                import codecs

                try:
                    # explicit lookup: b"".decode() short-circuits
                    # WITHOUT validating the codec name
                    codecs.lookup(f"cp{param}")
                    codec = f"cp{param}"
                except LookupError:
                    pass  # unknown page: keep cp1252
            elif word in _RTF_NL:
                out.append("\n")
            elif word in _RTF_TAB:
                out.append("\t")
            elif word in _RTF_CHARS:
                out.append(_RTF_CHARS[word])
            elif word == "bin" and param:
                i += max(0, param)
            # every other control word is formatting — dropped
        elif c in (0x0D, 0x0A, 0x00):
            i += 1  # raw CR/LF/NUL between tokens is not text
        else:
            j = i
            while j < n and data[j] not in (0x5C, 0x7B, 0x7D, 0x0D, 0x0A,
                                            0x00):
                j += 1
            flush()
            out.append(data[i:j].decode(codec, errors="replace"))
            i = j
    flush()
    return "".join(out)


# ===================================================================
# DOC — legacy Word binary ([MS-DOC] FIB + piece table over [MS-CFB])
# ===================================================================
# main-body control characters -> text ([MS-DOC] §2.3; everything not
# listed passes through)
_DOC_SCRUB = {
    0x0D: "\n",   # paragraph mark
    0x0B: "\n",   # hard line break
    0x0C: "\n",   # page/section break
    0x07: "\t",   # cell/row mark
    0x1E: "-",    # non-breaking hyphen
    0x1F: "",     # optional hyphen
    0x01: "",     # embedded-object anchor
    0x02: "",     # footnote-reference auto-number
    0x05: "",     # annotation reference
    0x08: "",     # drawn-object anchor
    0x13: "",     # field begin
    0x14: "",     # field separator (the instruction before it is
                  # carried by its own pieces; see note in doc_text)
    0x15: "",     # field end
}


def _u16(b: bytes, o: int) -> int:
    if o + 2 > len(b):
        raise OfficeParseError("FIB truncated")
    return int.from_bytes(b[o : o + 2], "little")


def _u32(b: bytes, o: int) -> int:
    if o + 4 > len(b):
        raise OfficeParseError("FIB truncated")
    return int.from_bytes(b[o : o + 4], "little")


def doc_text(data: bytes) -> str:
    """Main-document text of a legacy Word binary (.doc), via the
    [MS-DOC] retrieval chain: WordDocument stream FIB → table stream
    (0Table/1Table per ``fWhichTblStm``) → Clx at ``fcClx`` → Pcdt →
    piece table (PlcPcd) → per-piece 8-bit-compressed (cp1252) or
    UTF-16LE text runs, cut at ``ccpText`` so headers/footnotes/
    annotation regions past the main body stay out.

    Scope (stated): piece TEXT only — field instructions between the
    begin/separator marks come through as their literal instruction
    text (dropping them needs grpprl parsing, out of scope), and
    tracked deletions are not filtered (same reason).  Encrypted
    documents (``fEncrypted``) raise :class:`OfficeEncryptedError`.
    """
    from data_governance_spark.operators.cfb import CfbError, CfbFile

    try:
        cf = CfbFile(data)
        word = cf.read("WordDocument")
    except CfbError as e:
        raise OfficeParseError(f"broken OLE container: {e}") from None
    if _u16(word, 0) != 0xA5EC:
        raise OfficeParseError(
            f"WordDocument wIdent {_u16(word, 0):#x} != 0xa5ec"
        )
    flags = _u16(word, 0x0A)
    if flags & 0x0100:  # fEncrypted
        raise OfficeEncryptedError(
            "encrypted .doc (fEncrypted) — XOR/RC4 Office binary "
            "crypto is quarantined"
        )
    table_name = "1Table" if flags & 0x0200 else "0Table"
    try:
        tbl = cf.read(table_name)
    except CfbError as e:
        raise OfficeParseError(f"missing {table_name}: {e}") from None
    ccp_text = _u32(word, 0x004C)
    fc_clx = _u32(word, 0x01A2)
    lcb_clx = _u32(word, 0x01A6)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(tbl):
        raise OfficeParseError("Clx out of table-stream bounds")
    clx = tbl[fc_clx : fc_clx + lcb_clx]
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:  # Prc property blocks
        if pos + 3 > len(clx):
            raise OfficeParseError("truncated Prc")
        pos += 3 + int.from_bytes(clx[pos + 1 : pos + 3], "little")
    if pos >= len(clx) or clx[pos] != 0x02:
        raise OfficeParseError("Clx has no Pcdt")
    if pos + 5 > len(clx):
        raise OfficeParseError("truncated Pcdt")
    lcb = int.from_bytes(clx[pos + 1 : pos + 5], "little")
    plc = clx[pos + 5 : pos + 5 + lcb]
    if len(plc) != lcb or lcb < 16 or (lcb - 4) % 12:
        raise OfficeParseError(f"bad PlcPcd size {lcb}")
    n = (lcb - 4) // 12
    cps = [int.from_bytes(plc[4 * i : 4 * i + 4], "little")
           for i in range(n + 1)]
    if any(cps[i] >= cps[i + 1] for i in range(n)):
        raise OfficeParseError("piece CPs not strictly increasing")
    parts: list[str] = []
    remaining = ccp_text  # the MAIN document; later cp regions are
    # headers/footnotes/etc. and stay out
    base = 4 * (n + 1)
    for i in range(n):
        if remaining <= 0:
            break
        take = min(cps[i + 1] - cps[i], remaining)
        fc_field = int.from_bytes(
            plc[base + 8 * i + 2 : base + 8 * i + 6], "little"
        )
        off = fc_field & 0x3FFFFFFF
        if fc_field & 0x40000000:  # fCompressed: 8-bit text at fc/2
            off //= 2
            end = off + take
            if end > len(word):
                raise OfficeParseError("piece runs past WordDocument")
            # replace, not strict: a cp1252 hole byte in a corrupted
            # piece is content damage, not structure — and a strict
            # UnicodeDecodeError would escape the typed taxonomy
            parts.append(word[off:end].decode("cp1252", errors="replace"))
        else:
            end = off + 2 * take
            if end > len(word):
                raise OfficeParseError("piece runs past WordDocument")
            parts.append(
                word[off:end].decode("utf-16-le", errors="replace")
            )
        remaining -= take
    text = "".join(parts)
    return text.translate(_DOC_SCRUB)


# ===================================================================
# PPT — legacy PowerPoint binary ([MS-PPT] record walk over [MS-CFB])
# ===================================================================
_PPT_TEXTCHARS = 0x0FA0   # UTF-16LE text atom
_PPT_TEXTBYTES = 0x0FA8   # 8-bit (cp1252) text atom
_PPT_CSTRING = 0x0FBA     # UTF-16LE CString (titles, notes)
_PPT_CRYPT = 0x2F14       # CryptSession10Container -> encrypted


def ppt_text(data: bytes) -> str:
    """Text atoms of a legacy .ppt: the PowerPoint Document stream is
    a tree of 8-byte-headed records ([MS-PPT] §2.3 RecordHeader);
    containers (recVer 0xF) nest, and the text lives in
    TextCharsAtom (UTF-16LE) / TextBytesAtom (cp1252) / CString
    leaves — collected in stream order, one line each.  A
    CryptSession10Container raises typed; truncated record tails keep
    the text parsed so far (crawl tolerance)."""
    from data_governance_spark.operators.cfb import CfbError, CfbFile

    try:
        cf = CfbFile(data)
        stream = cf.read("PowerPoint Document")
    except CfbError as e:
        raise OfficeParseError(f"broken OLE container: {e}") from None
    texts: list[str] = []

    def walk(lo: int, hi: int, depth: int) -> None:
        if depth > 64:
            raise OfficeParseError("ppt record nesting too deep")
        pos = lo
        while pos + 8 <= hi:
            verinst = int.from_bytes(stream[pos : pos + 2], "little")
            rectype = int.from_bytes(stream[pos + 2 : pos + 4], "little")
            reclen = int.from_bytes(stream[pos + 4 : pos + 8], "little")
            body_lo = pos + 8
            body_hi = body_lo + reclen
            if body_hi > hi:
                return  # truncated tail: keep what parsed
            if rectype == _PPT_CRYPT:
                raise OfficeEncryptedError(
                    "encrypted .ppt (CryptSession10) is quarantined"
                )
            if verinst & 0xF == 0xF:  # container
                walk(body_lo, body_hi, depth + 1)
            elif rectype in (_PPT_TEXTCHARS, _PPT_CSTRING):
                texts.append(
                    stream[body_lo:body_hi].decode(
                        "utf-16-le", errors="replace"
                    )
                )
            elif rectype == _PPT_TEXTBYTES:
                texts.append(
                    stream[body_lo:body_hi].decode(
                        "cp1252", errors="replace"
                    )
                )
            pos = body_hi

    walk(0, len(stream), 0)
    out = "\n".join(texts)
    return out.translate({0x0D: "\n", 0x0B: "\n"})


# ===================================================================
# XLS — legacy Excel binary (BIFF8, [MS-XLS] over [MS-CFB])
# ===================================================================
def _rk_number(rk: int) -> float:
    """RkNumber ([MS-XLS] §2.5.217): bit0 = /100, bit1 = 30-bit int
    vs truncated-double payload."""
    div100 = rk & 1
    if rk & 2:
        v = rk >> 2
        if v & (1 << 29):  # sign-extend the 30-bit int
            v -= 1 << 30
        val = float(v)
    else:
        val = struct.unpack("<d", b"\0\0\0\0" + struct.pack(
            "<I", rk & 0xFFFFFFFC))[0]
    return val / 100.0 if div100 else val


def _num_str(v: float) -> str:
    """Stored-value rendering matched to xlsx_text's raw-value rule:
    integral doubles print without the trailing .0."""
    return str(int(v)) if v == int(v) and abs(v) < 1e15 else repr(v)


def _biff_records(stream: bytes):
    pos = 0
    n = len(stream)
    while pos + 4 <= n:
        rid = int.from_bytes(stream[pos : pos + 2], "little")
        rlen = int.from_bytes(stream[pos + 2 : pos + 4], "little")
        if pos + 4 + rlen > n:
            return  # truncated tail
        yield rid, stream[pos + 4 : pos + 4 + rlen]
        pos += 4 + rlen


def _parse_sst(body: bytes, continues: list[bytes]) -> list[str]:
    """XLUnicodeRichExtendedString array ([MS-XLS] §2.5.293) with the
    CONTINUE-record rule: a string may split across records, and at
    every continuation boundary a FRESH grpbit byte restates the
    compression of the following chars."""
    chunks = [body] + continues
    ci = 0
    pos = 8  # cstTotal + cstUnique
    out: list[str] = []

    def u8() -> int:
        nonlocal ci, pos
        while pos >= len(chunks[ci]):
            ci += 1
            pos = 0
            if ci >= len(chunks):
                raise OfficeParseError("SST truncated")
        b = chunks[ci][pos]
        pos += 1
        return b

    def u16() -> int:
        return u8() | (u8() << 8)

    def u32() -> int:
        return u16() | (u16() << 16)

    def chars(cch: int, high: bool) -> str:
        nonlocal ci, pos
        parts: list[str] = []
        remaining = cch
        while remaining:
            if pos >= len(chunks[ci]):
                ci += 1
                pos = 0
                if ci >= len(chunks):
                    raise OfficeParseError("SST string truncated")
                # a continuation restates the compression flag
                high = bool(u8() & 1)
            avail = len(chunks[ci]) - pos
            width = 2 if high else 1
            take = min(remaining, avail // width)
            if take == 0:
                # a 2-byte char split across records cannot happen per
                # spec (boundaries are char-aligned) — treat as corrupt
                raise OfficeParseError("SST char split across records")
            raw = chunks[ci][pos : pos + take * width]
            pos += take * width
            parts.append(
                raw.decode("utf-16-le" if high else "latin-1",
                           errors="replace")
            )
            remaining -= take
        return "".join(parts)

    cst_unique = int.from_bytes(body[4:8], "little") if len(body) >= 8 \
        else 0
    if cst_unique > 1_000_000:
        raise OfficeParseError(f"SST declares {cst_unique} strings")
    # exactly cstUnique strings — parsing to exhaustion would turn
    # trailing padding into ghost strings (review finding)
    for _ in range(cst_unique):
        cch = u16()
        grp = u8()
        high = bool(grp & 0x01)
        ext = bool(grp & 0x04)
        rich = bool(grp & 0x08)
        c_run = u16() if rich else 0
        cb_ext = u32() if ext else 0
        out.append(chars(cch, high))
        for _ in range(c_run * 4):
            u8()
        for _ in range(cb_ext):
            u8()
    return out


def xls_text(data: bytes) -> str:
    """Cell text of a legacy .xls (BIFF8): SST shared strings (incl.
    the CONTINUE split rule), LABELSST / NUMBER / RK / MULRK / LABEL
    cells in stream order — tab-joined within a row, rows
    newline-joined, matching :func:`xlsx_text`'s stored-value
    discipline.  FILEPASS (encryption) raises typed; a 'Book' stream
    (BIFF5) raises typed unsupported."""
    from data_governance_spark.operators.cfb import CfbError, CfbFile

    try:
        cf = CfbFile(data)
        if not cf.has("Workbook") and cf.has("Book"):
            raise OfficeUnsupportedError(
                "BIFF5 (.xls 'Book' stream) is out of scope — BIFF8 "
                "('Workbook') decodes"
            )
        stream = cf.read("Workbook")
    except CfbError as e:
        raise OfficeParseError(f"broken OLE container: {e}") from None
    # pass 1: SST (with its CONTINUE records)
    sst: list[str] = []
    recs = list(_biff_records(stream))
    for i, (rid, body) in enumerate(recs):
        if rid == 0x002F:  # FilePass
            raise OfficeEncryptedError(
                "encrypted .xls (FilePass) is quarantined"
            )
        if rid == 0x00FC:  # SST
            cont: list[bytes] = []
            for rid2, body2 in recs[i + 1 :]:
                if rid2 != 0x003C:  # Continue
                    break
                cont.append(body2)
            sst = _parse_sst(body, cont)
    # pass 2: cells in stream order
    lines: list[str] = []
    row_cells: list[str] = []
    cur_row = None

    def flush():
        nonlocal row_cells
        if row_cells:
            lines.append("\t".join(row_cells))
            row_cells = []

    def cell(rw: int, text: str):
        nonlocal cur_row
        if rw != cur_row:
            flush()
            cur_row = rw
        row_cells.append(text)

    for rid, body in recs:
        try:
            if rid == 0x00FD and len(body) >= 10:  # LabelSst
                rw = int.from_bytes(body[0:2], "little")
                isst = int.from_bytes(body[6:10], "little")
                if not 0 <= isst < len(sst):
                    raise OfficeParseError(
                        f"LabelSst index {isst} out of range"
                    )
                cell(rw, sst[isst])
            elif rid == 0x0203 and len(body) >= 14:  # Number
                rw = int.from_bytes(body[0:2], "little")
                cell(rw, _num_str(
                    struct.unpack("<d", body[6:14])[0]))
            elif rid == 0x027E and len(body) >= 10:  # RK
                rw = int.from_bytes(body[0:2], "little")
                cell(rw, _num_str(_rk_number(
                    int.from_bytes(body[6:10], "little"))))
            elif rid == 0x00BD and len(body) >= 12:  # MulRk
                rw = int.from_bytes(body[0:2], "little")
                n_cells = (len(body) - 6) // 6
                for j in range(n_cells):
                    off = 4 + 6 * j + 2
                    cell(rw, _num_str(_rk_number(
                        int.from_bytes(body[off : off + 4], "little"))))
            elif rid == 0x0204 and len(body) >= 9:  # Label (inline)
                rw = int.from_bytes(body[0:2], "little")
                cch = int.from_bytes(body[6:8], "little")
                high = body[8] & 1
                raw = body[9 : 9 + cch * (2 if high else 1)]
                cell(rw, raw.decode(
                    "utf-16-le" if high else "latin-1",
                    errors="replace"))
        except struct.error:
            raise OfficeParseError(f"corrupt BIFF record {rid:#x}")
    flush()
    return "\n".join(lines)


# ===================================================================
# dispatcher + Spark surface
# ===================================================================
_EXTRACTORS = {
    "docx": docx_text,
    "xlsx": xlsx_text,
    "pptx": pptx_text,
    "odf": odf_text,
    "epub": epub_text,
    "rtf": rtf_text,
    "doc": doc_text,
    "xls": xls_text,
    "ppt": ppt_text,
}


def office_text(data: bytes) -> str:
    """Sniff + extract: the single entry point corpus jobs use.
    Raises only :class:`OfficeError` subclasses (fuzz-pinned)."""
    return _EXTRACTORS[office_format(data)](data)


def office_text_column(col: Column | str, errors: str = "null") -> Column:
    """Column form over a ``binary`` column.  ``errors="null"`` maps
    any :class:`OfficeError` to NULL (one hostile file must not kill
    a corpus job); ``errors="raise"`` propagates (gates/tests)."""
    if errors not in ("null", "raise"):
        raise ValueError(f"errors must be 'null' or 'raise', got {errors!r}")

    @F.pandas_udf("string")
    def extract(c: pd.Series) -> pd.Series:
        out = []
        for v in c:
            if v is None:
                out.append(None)
            elif errors == "raise":
                out.append(office_text(bytes(v)))
            else:
                try:
                    out.append(office_text(bytes(v)))
                except OfficeError:
                    out.append(None)
        return pd.Series(out, dtype="object")

    return extract(F.col(col) if isinstance(col, str) else col)


def extract_office_text(
    docs: DataFrame,
    content_col: str = "content",
    out_col: str = "text",
    errors: str = "null",
    error_col: str | None = None,
    format_col: str | None = None,
) -> DataFrame:
    """``docs`` with ``out_col`` added: the text layer of the office
    bytes in ``content_col`` (NULL in → NULL out).  ``error_col``
    captures the typed error class name per row (quarantine
    pattern); ``format_col`` the sniffed family (``docx``/…/``rtf``)
    for corpus routing.  Map-only, Arrow-batched; no shuffle, no
    driver state — the exact contract of
    :func:`operators.pdf.extract_pdf_text`."""
    if error_col is None and format_col is None:
        return docs.withColumn(
            out_col, office_text_column(content_col, errors)
        )
    if errors != "null":
        raise ValueError("error_col/format_col require errors='null'")

    @F.pandas_udf("text string, err string, fmt string")
    def extract(c: pd.Series) -> pd.DataFrame:
        texts, errs, fmts = [], [], []
        for v in c:
            if v is None:
                texts.append(None)
                errs.append(None)
                fmts.append(None)
                continue
            b = bytes(v)
            fmt = None
            try:
                fmt = office_format(b)
                texts.append(_EXTRACTORS[fmt](b))
                errs.append(None)
            except OfficeError as e:
                texts.append(None)
                errs.append(type(e).__name__)
            fmts.append(fmt)
        return pd.DataFrame({"text": texts, "err": errs, "fmt": fmts})

    tmp = "_office_extract"
    res = docs.withColumn(tmp, extract(F.col(content_col)))
    res = res.withColumn(out_col, F.col(tmp)["text"])
    if error_col is not None:
        res = res.withColumn(error_col, F.col(tmp)["err"])
    if format_col is not None:
        res = res.withColumn(format_col, F.col(tmp)["fmt"])
    return res.drop(tmp)