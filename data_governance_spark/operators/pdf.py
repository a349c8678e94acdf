"""PDF text extraction — the largest document-source format after HTML
in a training-data pipeline, implemented on the stdlib only (``zlib``,
``base64``, ``re``; no pdfminer/PyMuPDF — this container has neither,
and the machine-generated-PDF tier they all share is what bulk corpus
ingest actually runs).

What decodes for REAL:

- **Object layer**: a LINEAR scan for ``N G obj`` bodies (robust where
  an xref walk is not — truncated or lying xref tables are the single
  most common corruption in crawled PDFs; the xref is never consulted),
  full object grammar (dicts, arrays, names with ``#hh`` escapes,
  literal strings with octal/escape/nested-paren rules, hex strings,
  refs, booleans/null), later duplicate definitions win (incremental
  updates), ``/Type /ObjStm`` compressed object streams expanded (PDF
  1.5+ — most modern writers put the catalog/page/font dicts there).
- **Stream filters**: FlateDecode (zlib, with raw-deflate and
  truncated-tail fallbacks), LZWDecode (MSB-first 9→12-bit codes with
  /EarlyChange, validated against ISO 32000-1's own worked example —
  the legacy-PDF compressor), ASCIIHexDecode, ASCII85Decode,
  RunLengthDecode, filter chains, PNG/TIFF predictors
  (``/DecodeParms``). A declared ``/Length`` is VALIDATED against the
  following ``endstream`` and ignored when it lies (the second most
  common corruption) — the extent then comes from the ``endstream``
  marker itself.
- **Page layer**: catalog → page-tree walk (``/Kids`` recursion, cycle
  + depth guarded, ``/Resources`` inherited), degraded direct
  ``/Type /Page`` scan when the catalog is missing/broken.
- **Text layer**: content-stream tokenizer (same object grammar plus
  operators and ``BI``…``ID``…``EI`` inline-image skip) driving a small
  text state machine — ``Tj``/``'``/``"``/``TJ`` show ops (TJ gaps
  below ``-TJ_SPACE_GAP`` thousandths of an em become spaces — the
  standard kerning-vs-word-break heuristic), ``Td``/``TD``/``Tm``/
  ``T*`` line-matrix tracking (a vertical move is a line break),
  ``Do`` form-XObject recursion, per-font decoders: ``/ToUnicode``
  CMaps (bfchar + both bfrange forms, codespace-derived code width),
  WinAnsi/MacRoman/Standard base encodings with ``/Differences``
  glyph-name mapping (AGL subset + ``uniXXXX``).

- **Encryption**: the standard security handler with the EMPTY user
  password decrypts for real across all its public revisions — the
  overwhelmingly common crawled case, where ``/Encrypt`` exists only
  to carry permission bits:

  - rev 2/3 RC4 (``hashlib.md5`` key derivation per ISO 32000-1
    Algorithms 1/2, /U authentication per Algorithms 4/5/6);
  - rev 4 crypt filters — /CFM ``AESV2`` (AES-128-CBC via the
    from-spec ``operators/aes.py``, per-object key with the spec's
    ``sAlT`` suffix) and ``V2`` (RC4 under the V4 wrapper), honoring
    ``/EncryptMetadata false``;
  - rev 5/6 ``AESV3`` (AES-256; SHA-256 family authentication —
    ISO 32000-2 Algorithm 2.B hardened hash for rev 6 — file key
    unwrapped from /UE or /OE, empty owner password tried when the
    empty user password fails).

  Strings + streams decrypt in place before the filter chain (stream
  bodies lazily).

Loud typed boundaries (the VP8L rule — raise, never silently fake):

- ``PdfEncryptedError`` — a REAL password (neither the empty user nor
  empty owner password authenticates), a non-Standard security
  handler, V > 5, or an unknown crypt-filter method; the remaining
  ciphertext cases where any "text" pulled from the stream bytes
  would be noise.
- ``PdfUnsupportedFilterError`` — DCTDecode / JPXDecode / JBIG2Decode /
  CCITTFaxDecode / Crypt on a stream we must read (all raster/crypto
  codecs — never text-layer carriers).
- ``PdfImageOnlyError`` — pages carry raster images but zero text
  operators: a scanned PDF has no text layer; it needs OCR, not an
  extractor, and returning ``""`` would silently drop the document's
  content.
- ``PdfParseError`` — no parseable objects / no pages.

Scale shape: map-only — one Arrow-batched pandas UDF over a binary
column, no shuffle, no driver state; same opt-in Python-tier story as
the DOM extractor (``operators/htmldom.py``). ``errors="null"``
(default for the frame op) quarantines bad files as NULL text with the
typed error name in an optional side column, so one scanned PDF cannot
kill a 100 TB ingest.

Reference twin: none — training-data extension per SURVEY.md §6 (the
PDF grammar is ISO 32000-1, public).
"""

from __future__ import annotations

import base64
import bisect
import hashlib
import re
import struct
import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PdfError",
    "PdfParseError",
    "PdfEncryptedError",
    "PdfUnsupportedFilterError",
    "PdfImageOnlyError",
    "PdfImageDecodeError",
    "pdf_text",
    "extract_pdf_text",
    "pdf_text_column",
    "pdf_images",
    "extract_pdf_images",
]

# TJ gap (in thousandths of an em, i.e. text-space units) at or beyond
# which a negative kerning adjustment is a word break, not a kern. A
# space glyph is ~250-333/1000 em in the standard fonts; kerns are tens.
TJ_SPACE_GAP = 180.0

_MAX_RESOLVE_DEPTH = 32
_MAX_TREE_DEPTH = 64
_MAX_XOBJECT_DEPTH = 16


class PdfError(ValueError):
    """Base for all typed PDF extraction failures."""


class PdfParseError(PdfError):
    """Not a parseable PDF (no objects, no pages, truncated beyond use)."""


class PdfEncryptedError(PdfError):
    """Undecryptable encryption: a real (non-empty) password, a
    non-Standard handler, V > 5, or an unknown crypt-filter method.
    The empty-password tiers (rev 2/3 RC4, rev 4 AESV2/V2, rev 5/6
    AESV3) decrypt instead of raising."""


class PdfUnsupportedFilterError(PdfError):
    """A stream we must read uses DCT/JPX/JBIG2/CCITT/Crypt."""


class PdfImageOnlyError(PdfError):
    """Raster images but zero text operators — scanned PDF, needs OCR."""


class PdfImageDecodeError(PdfError):
    """One embedded image is undecodable (unsupported colorspace /
    bits / size mismatch). Per-image only: ``pdf_images`` records it in
    that image's ``err`` field and keeps the document."""


# --------------------------------------------------------------------------
# object grammar
# --------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Name(str):
    """A PDF name (/X) — distinct from a text string in dict values."""

    __slots__ = ()


class _Ref(tuple):
    __slots__ = ()

    def __new__(cls, num: int, gen: int):
        return super().__new__(cls, (num, gen))


class _Stream:
    """A stream object: its dict plus the raw (still-encoded) bytes.
    ``enc_key`` carries a pending per-object ``(cipher, key)`` pair
    (cipher ``"rc4"`` or ``"aes"``) for LAZY body decryption — most
    streams in an encrypted file (e.g. embedded images during
    pdf_text) are never read, and the pure-Python cipher pass is the
    expensive part; access raw through :func:`_stream_raw`."""

    __slots__ = ("d", "raw", "enc_key")

    def __init__(self, d: dict, raw: bytes):
        self.d = d
        self.raw = raw
        self.enc_key = None


def _stream_raw(s: "_Stream") -> bytes:
    if s.enc_key is not None:
        cipher, key = s.enc_key
        s.raw = (_rc4(key, s.raw) if cipher == "rc4"
                 else _aes_decrypt_pdf(key, s.raw))
        s.enc_key = None
    return s.raw


def _skip_ws(buf: bytes, pos: int) -> int:
    n = len(buf)
    while pos < n:
        c = buf[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # '%' comment to EOL
            while pos < n and buf[pos] not in b"\r\n":
                pos += 1
        else:
            break
    return pos


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_INT_RE = re.compile(rb"\d+")
_KW_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")


def _parse_name(buf: bytes, pos: int) -> tuple[_Name, int]:
    # at '/'; #hh escapes decoded
    pos += 1
    out = bytearray()
    n = len(buf)
    while pos < n:
        c = buf[pos]
        if c in _WS or c in _DELIM:
            break
        if c == 0x23 and pos + 2 < n:  # '#'
            try:
                out.append(int(buf[pos + 1 : pos + 3], 16))
                pos += 3
                continue
            except ValueError:
                pass
        out.append(c)
        pos += 1
    return _Name(out.decode("latin-1")), pos


_LIT_ESC = {
    0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b", 0x66: b"\f",
    0x28: b"(", 0x29: b")", 0x5C: b"\\",
}


def _parse_lit_string(buf: bytes, pos: int) -> tuple[bytes, int]:
    # at '('; balanced parens, escapes, octal, line continuations
    pos += 1
    out = bytearray()
    depth = 1
    n = len(buf)
    while pos < n:
        c = buf[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = buf[pos]
            if e in _LIT_ESC:
                out += _LIT_ESC[e]
                pos += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                val = 0
                k = 0
                while pos < n and k < 3 and 0x30 <= buf[pos] <= 0x37:
                    val = val * 8 + (buf[pos] - 0x30)
                    pos += 1
                    k += 1
                out.append(val & 0xFF)
            elif e in b"\r\n":  # line continuation
                pos += 1
                if e == 0x0D and pos < n and buf[pos] == 0x0A:
                    pos += 1
            else:  # unknown escape: the char itself
                out.append(e)
                pos += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                pos += 1
                break
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    return bytes(out), pos


def _parse_hex_string(buf: bytes, pos: int) -> tuple[bytes, int]:
    # at '<' (not '<<'); odd final digit padded with 0
    pos += 1
    digits = bytearray()
    n = len(buf)
    while pos < n and buf[pos] != 0x3E:  # '>'
        c = buf[pos]
        if (
            0x30 <= c <= 0x39
            or 0x41 <= c <= 0x46
            or 0x61 <= c <= 0x66
        ):
            digits.append(c)
        pos += 1
    pos = min(pos + 1, n)
    if len(digits) % 2:
        digits.append(0x30)
    return bytes.fromhex(digits.decode("ascii")), pos


# nesting cap for dicts/arrays: recursion per level, and RecursionError
# is not a PdfError — an adversarial '['*5000 must raise TYPED, not
# blow the interpreter stack past the errors='null' quarantine
_MAX_NEST_DEPTH = 100


def _parse_object(buf: bytes, pos: int, depth: int = 0):
    """Parse one object at pos → (value, new_pos). Raises PdfParseError
    on impossible input (caller decides how loud to be)."""
    if depth > _MAX_NEST_DEPTH:
        raise PdfParseError(f"object nesting deeper than {_MAX_NEST_DEPTH}")
    pos = _skip_ws(buf, pos)
    n = len(buf)
    if pos >= n:
        raise PdfParseError("unexpected end of data")
    c = buf[pos]
    if c == 0x2F:  # '/'
        return _parse_name(buf, pos)
    if c == 0x28:  # '('
        return _parse_lit_string(buf, pos)
    if c == 0x3C:  # '<'
        if buf[pos : pos + 2] == b"<<":
            pos += 2
            d: dict = {}
            while True:
                pos = _skip_ws(buf, pos)
                if buf[pos : pos + 2] == b">>":
                    return d, pos + 2
                if pos >= n:
                    return d, pos  # truncated dict: keep what we have
                if buf[pos] != 0x2F:
                    # stray token inside dict — skip one object, stay lenient
                    _, pos = _parse_object(buf, pos, depth + 1)
                    continue
                key, pos = _parse_name(buf, pos)
                val, pos = _parse_object(buf, pos, depth + 1)
                d[str(key)] = val
        return _parse_hex_string(buf, pos)
    if c == 0x5B:  # '['
        pos += 1
        arr = []
        while True:
            pos = _skip_ws(buf, pos)
            if pos >= n:
                return arr, pos
            if buf[pos] == 0x5D:
                return arr, pos + 1
            val, pos = _parse_object(buf, pos, depth + 1)
            arr.append(val)
    m = _NUM_RE.match(buf, pos)
    if m:
        tok = m.group()
        end = m.end()
        if b"." not in tok:
            num = int(tok)
            # ref lookahead: INT INT 'R'
            p2 = _skip_ws(buf, end)
            m2 = _INT_RE.match(buf, p2)
            if m2 and num >= 0 and tok[:1] != b"+":
                p3 = _skip_ws(buf, m2.end())
                if buf[p3 : p3 + 1] == b"R" and (
                    p3 + 1 >= n or buf[p3 + 1] in _WS or buf[p3 + 1] in _DELIM
                ):
                    return _Ref(num, int(m2.group())), p3 + 1
            return num, end
        return float(tok), end
    m = _KW_RE.match(buf, pos)
    if m:
        kw = m.group()
        if kw == b"true":
            return True, m.end()
        if kw == b"false":
            return False, m.end()
        if kw == b"null":
            return None, m.end()
        raise PdfParseError(f"unexpected keyword {kw[:20]!r} at {pos}")
    raise PdfParseError(f"unparseable byte {c:#x} at {pos}")


# --------------------------------------------------------------------------
# filters
# --------------------------------------------------------------------------

_UNSUPPORTED_FILTERS = {
    "DCTDecode", "DCT", "JPXDecode", "JBIG2Decode",
    "CCITTFaxDecode", "CCF", "Crypt",
}


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF/TIFF LZW (ISO 32000-1 §7.4.4): MSB-first bit packing, 9-bit
    start, 256=ClearTable, 257=EOD, table entries from 258, 12-bit max;
    ``early`` is /EarlyChange (default 1 — the code width bumps one
    entry before the table size strictly requires it, the published
    off-by-one both sides of the format agreed on). Validated against
    the spec's own worked example plus encoder round-trips crossing
    every width boundary (tests/test_pdf.py). Truncated data yields
    what was decodable (implicit EOD), matching the Flate fallback's
    lenient posture; impossible codes raise typed."""
    out = bytearray()
    acc = accbits = i = 0
    width = 9
    base = [bytes([b]) for b in range(256)] + [b"", b""]
    table = list(base)
    prev = None
    n = len(data)
    while True:
        while accbits < width:
            if i >= n:
                return bytes(out)  # truncated: implicit EOD
            acc = (acc << 8) | data[i]
            i += 1
            accbits += 8
        accbits -= width
        code = (acc >> accbits) & ((1 << width) - 1)
        # drop the consumed bits: an unmasked accumulator grows by 8
        # bits per input byte and each << 8 copies the whole integer —
        # measured quadratic (64 KB: 2.0 s, 256 KB: 33.9 s before)
        acc &= (1 << accbits) - 1
        if code == 257:
            return bytes(out)
        if code == 256:
            table = list(base)
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise PdfParseError(f"LZW: bad first code {code}")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise PdfParseError(f"LZW: code {code} out of range")
            # 4096-entry cap (the spec's 12-bit ceiling): a conforming
            # encoder clears before the table fills, but an ADVERSARIAL
            # clear-free stream would otherwise grow entries by one
            # byte per code forever — quadratic memory in stream size,
            # an executor OOM from one crawled file. At the cap the
            # width is already 12, so every readable code stays < 4096.
            if len(table) < 4096:
                table.append(prev + entry[:1])
        out += entry
        prev = entry
        if len(table) + early >= (1 << width) and width < 12:
            width += 1


def _inflate(data: bytes) -> bytes:
    try:
        return zlib.decompress(data)
    except zlib.error:
        pass
    try:  # raw deflate (some writers omit the zlib wrapper)
        return zlib.decompress(data, -15)
    except zlib.error:
        pass
    # truncated tail: decompress what is there, skip the checksum
    try:
        d = zlib.decompressobj()
        out = d.decompress(data)
        return out + d.flush()
    except zlib.error as e:
        raise PdfParseError(f"FlateDecode failed: {e}") from None


def _rle_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        l = data[i]
        i += 1
        if l == 128:
            break
        if l < 128:
            out += data[i : i + l + 1]
            i += l + 1
        else:
            if i < n:
                out += bytes([data[i]]) * (257 - l)
                i += 1
    return bytes(out)


def _unpredict(data: bytes, parms: dict) -> bytes:
    pred = parms.get("Predictor", 1)
    if not isinstance(pred, int) or pred <= 1:
        return data
    colors = parms.get("Colors", 1)
    bpc = parms.get("BitsPerComponent", 8)
    columns = parms.get("Columns", 1)
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (colors * bpc * columns + 7) // 8
    if pred == 2:  # TIFF horizontal (byte-aligned case only)
        if bpc != 8:
            raise PdfUnsupportedFilterError(
                "TIFF predictor with sub-byte components"
            )
        out = bytearray(data)
        for r in range(0, len(out) - rowlen + 1, rowlen):
            for i in range(r + bpp, r + rowlen):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    # PNG predictors (10..15): per-row filter byte — the SAME row
    # reconstruction the PNG decoder runs; reuse its vectorized
    # implementation rather than keeping a second Paeth to maintain
    from data_governance_spark.operators.multimodal import _png_unfilter

    ph = len(data) // (1 + rowlen)
    if ph == 0:
        return b""
    try:
        return _png_unfilter(data, 0, ph, rowlen, bpp).tobytes()
    except ValueError as e:  # unknown filter byte: typed, not a crash
        raise PdfParseError(f"predictor row failed: {e}") from None


def _decode_stream(doc: "_Doc", s: _Stream) -> bytes:
    filt = doc.resolve(s.d.get("Filter"))
    parms = doc.resolve(s.d.get("DecodeParms", s.d.get("DP")))
    if filt is None:
        return _stream_raw(s)
    if not isinstance(filt, list):
        filt = [filt]
    if not isinstance(parms, list):
        parms = [parms] * len(filt)
    elif len(parms) < len(filt):
        # a short /DecodeParms array must not TRUNCATE the filter chain
        # through zip() — that would return still-encoded bytes as text
        parms = parms + [None] * (len(filt) - len(parms))
    data = _stream_raw(s)
    for f, p in zip(filt, parms):
        f = str(doc.resolve(f))
        p = doc.resolve(p) or {}
        if f in ("FlateDecode", "Fl"):
            data = _inflate(data)
            data = _unpredict(data, {k: doc.resolve(v) for k, v in p.items()})
        elif f in ("LZWDecode", "LZW"):
            early = doc.resolve(p.get("EarlyChange", 1))
            data = _lzw_decode(
                data, 1 if not isinstance(early, int) else early
            )
            data = _unpredict(data, {k: doc.resolve(v) for k, v in p.items()})
        elif f in ("ASCIIHexDecode", "AHx"):
            digits = re.sub(rb"[^0-9A-Fa-f>]", b"", data)
            digits = digits.split(b">", 1)[0]
            if len(digits) % 2:
                digits += b"0"
            data = bytes.fromhex(digits.decode("ascii"))
        elif f in ("ASCII85Decode", "A85"):
            body = data.split(b"~>", 1)[0]
            body = re.sub(rb"\s", b"", body)
            if body.startswith(b"<~"):
                body = body[2:]
            try:
                data = base64.a85decode(body)
            except ValueError as e:
                raise PdfParseError(f"ASCII85Decode failed: {e}") from None
        elif f in ("RunLengthDecode", "RL"):
            data = _rle_decode(data)
        elif f in _UNSUPPORTED_FILTERS:
            raise PdfUnsupportedFilterError(
                f"stream filter {f} not supported (raster/crypto codec "
                "— no text layer behind it to extract)"
            )
        else:
            raise PdfUnsupportedFilterError(f"unknown stream filter {f}")
    return data


# --------------------------------------------------------------------------
# standard security handler (ISO 32000-1 §7.6.3): rev 2/3 RC4, empty
# user password — the overwhelmingly common case in crawled corpora,
# where /Encrypt exists only to carry permission bits. A real password,
# rev >= 4 (AESV2/crypt filters), or a non-Standard handler still raise
# PdfEncryptedError: any "text" pulled from ciphertext would be noise.
# --------------------------------------------------------------------------

# the spec's 32-byte password pad (ISO 32000-1 Table 2, Algorithm 2 step a)
_ENC_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (ARC4) — the rev 2/3 stream cipher. Symmetric, so the
    test suite's independent spec writer encrypts with its own copy and
    round-trips validate both sides."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for t, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[t] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _std_file_key(
    password: bytes, o: bytes, p: int, id0: bytes, r: int, nbytes: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from a (padded) password.
    For r >= 4 with ``/EncryptMetadata false`` the spec appends
    0xFFFFFFFF to the hash input (step f)."""
    padded = (password + _ENC_PAD)[:32]
    tail = b""
    if r >= 4 and not encrypt_metadata:
        tail = b"\xff\xff\xff\xff"
    h = hashlib.md5(
        padded + o[:32] + struct.pack("<I", p & 0xFFFFFFFF) + id0 + tail
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:nbytes]).digest()
    return h[:nbytes]


def _std_user_check(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (r=2) / 5 (r=3): the /U value implied by ``key``.
    For r >= 3 only the first 16 bytes are significant."""
    if r == 2:
        return _rc4(key, _ENC_PAD)
    h = hashlib.md5(_ENC_PAD + id0).digest()
    u = _rc4(key, h)
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in key), u)
    return u


def _std_object_key(key: bytes, num: int, gen: int,
                    aes: bool = False) -> bytes:
    """Algorithm 1: the per-object key. Only the low 3/2 bytes of
    num/gen enter the hash (spec), so oversized scanned object numbers
    (the _OBJ_RE pattern allows 10 digits) mask instead of raising an
    untyped struct.error.  For AESV2 the spec additionally salts the
    hash with the fixed bytes ``sAlT`` (0x73 41 6C 54)."""
    h = hashlib.md5(
        key
        + struct.pack("<I", num & 0xFFFFFFFF)[:3]
        + struct.pack("<I", gen & 0xFFFFFFFF)[:2]
        + (b"sAlT" if aes else b"")
    ).digest()
    return h[: min(len(key) + 5, 16)]


def _aes_decrypt_pdf(key: bytes, data: bytes) -> bytes:
    """AESV2/AESV3 payload decryption: the first 16 bytes are the IV,
    the rest is CBC ciphertext with PKCS#5/7 padding.  Hostile-bytes
    tolerant (this runs inside the quarantine, where raising on one
    malformed string would lose the document): short/ragged ciphertext
    truncates to whole blocks, an invalid padding byte is kept rather
    than mis-stripped."""
    from .aes import AesError, cbc_decrypt

    if len(data) < 32:
        return b""  # no full ciphertext block behind the IV
    body = data[16:]
    body = body[: len(body) - (len(body) % 16)]
    try:
        out = cbc_decrypt(key, data[:16], body)
    except AesError as e:
        # defense in depth: a malformed key must surface typed in the
        # Pdf taxonomy, never as an AesError on the executor
        raise PdfParseError(f"AES payload: {e}") from None
    pad = out[-1]
    if 1 <= pad <= 16 and out.endswith(bytes([pad]) * pad):
        out = out[:-pad]
    return out


def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B (the rev 6 hardened hash): iterated
    SHA-256/384/512 keyed by an AES-128-CBC pass over 64 repetitions
    of (password + K + udata); at least 64 rounds, stopping when the
    last byte of the AES output is <= round - 32."""
    from .aes import cbc_encrypt

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384,
             hashlib.sha512)[sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _decrypt_val(v, str_key, stm_key):
    """Decrypt every string (bytes) and stream body reachable from a
    parsed object value, in place for streams. Names/numbers/refs pass
    through — only strings and stream data are encrypted (ISO 32000-1
    §7.6.2). Depth is bounded by the parser's own nesting cap.

    ``str_key``/``stm_key`` are per-object ``(cipher, key)`` pairs —
    separate because V4 crypt filters may set /StrF and /StmF
    differently (either may be None = Identity)."""
    if isinstance(v, bytes):
        if str_key is None:
            return v
        cipher, key = str_key
        return (_rc4(key, v) if cipher == "rc4"
                else _aes_decrypt_pdf(key, v))
    if isinstance(v, list):
        return [_decrypt_val(x, str_key, stm_key) for x in v]
    if isinstance(v, dict):
        return {k: _decrypt_val(x, str_key, stm_key)
                for k, x in v.items()}
    if isinstance(v, _Stream):
        v.d = _decrypt_val(v.d, str_key, stm_key)
        v.enc_key = stm_key  # body decrypts lazily on first _stream_raw
        return v
    return v


# --------------------------------------------------------------------------
# document: linear object scan + trailer + page tree
# --------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d{1,10})[\x00\t\n\x0c\r ]+(\d{1,5})[\x00\t\n\x0c\r ]+obj\b")
_TRAILER_RE = re.compile(rb"trailer\b")
_STREAM_RE = re.compile(rb"stream(\r\n|\n|\r)")
_ENDSTREAM_RE = re.compile(rb"endstream")


class _Doc:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.objects: dict[int, object] = {}
        self._gens: dict[int, int] = {}  # per-object key derivation
        self.root = None
        self._font_cache: dict[int, "_FontDecoder"] = {}
        # (start, end) extents of raw stream DATA, in file order — the
        # scan must not parse 'N G obj' / 'trailer' byte patterns that
        # merely occur INSIDE stream bytes (embedded PDFs, binary Flate
        # data): a shadow match would overwrite a real object
        # (later-definition-wins) and silently destroy the extraction
        self._stream_spans: list[tuple[int, int]] = []
        self._parse()

    def _in_stream(self, pos: int) -> bool:
        spans = self._stream_spans
        i = bisect.bisect_right(spans, (pos, len(self.buf) + 1)) - 1
        return i >= 0 and spans[i][0] <= pos < spans[i][1]

    # -- parsing ------------------------------------------------------
    def _parse(self) -> None:
        buf = self.buf
        found = 0
        for m in _OBJ_RE.finditer(buf):
            if self._in_stream(m.start()):
                continue
            num = int(m.group(1))
            try:
                val, pos = _parse_object(buf, m.end())
            except PdfParseError:
                continue
            found += 1
            pos2 = _skip_ws(buf, pos)
            sm = _STREAM_RE.match(buf, pos2)
            if sm and isinstance(val, dict):
                raw, end = self._stream_extent(val, sm.end())
                self._stream_spans.append((sm.end(), end))
                val = _Stream(val, raw)
            # later definition wins (incremental updates append)
            self.objects[num] = val
            self._gens[num] = int(m.group(2))
        if not found:
            raise PdfParseError("no PDF objects found")
        self._check_encryption()
        self._expand_objstms()
        self.root = self._find_root()

    def _stream_extent(self, d: dict, start: int) -> tuple[bytes, int]:
        """(raw stream bytes, end offset). /Length is validated against
        the following endstream and ignored when it lies (fallback: the
        marker)."""
        buf = self.buf
        length = d.get("Length")
        if isinstance(length, _Ref):
            length = self._raw_lookup(length)
        if isinstance(length, int) and 0 <= length <= len(buf) - start:
            after = _skip_ws(buf, start + length)
            if buf[after : after + 9] == b"endstream":
                return buf[start : start + length], start + length
        em = _ENDSTREAM_RE.search(buf, start)
        if em is None:
            return buf[start:], len(buf)  # truncated: best effort to EOF
        raw = buf[start : em.start()]
        # strip the spec's single EOL before endstream
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n") or raw.endswith(b"\r"):
            raw = raw[:-1]
        return raw, em.start()

    def _raw_lookup(self, ref: _Ref):
        """Length-ref lookup usable mid-parse: scan for the object."""
        v = self.objects.get(ref[0])
        if v is not None:
            return v
        pat = re.compile(
            rb"(?<![0-9])"
            + str(ref[0]).encode()
            + rb"[\x00\t\n\x0c\r ]+\d{1,5}[\x00\t\n\x0c\r ]+obj\b"
        )
        for m in pat.finditer(self.buf):
            if self._in_stream(m.start()):
                continue
            try:
                val, _ = _parse_object(self.buf, m.end())
            except PdfParseError:
                return None
            return val
        return None

    def _check_encryption(self) -> None:
        enc = None  # LAST /Encrypt seen (trailer or xref stream)
        enc_id = None  # /ID from the SAME source as enc
        last_id = None  # last /ID seen anywhere (fallback)
        for m in _TRAILER_RE.finditer(self.buf):
            if self._in_stream(m.start()):
                continue  # 'trailer' bytes inside stream data
            try:
                d, _ = _parse_object(self.buf, m.end())
            except PdfParseError:
                continue
            if isinstance(d, dict):
                if isinstance(d.get("ID"), list):
                    last_id = d["ID"]
                if d.get("Encrypt") is not None:
                    enc = d["Encrypt"]
                    enc_id = d["ID"] if isinstance(d.get("ID"), list) else None
                if "Root" in d:
                    # the LAST trailer wins: an incremental update that
                    # introduces a new catalog appends a new trailer,
                    # consistent with the scan's later-definition rule
                    self.root = d["Root"]
        # xref-stream trailers (PDF 1.5+: no 'trailer' keyword) fill in
        # the Root only when no trailer keyword named one; /Encrypt is
        # honored from either source (later in file wins)
        for v in self.objects.values():
            if isinstance(v, _Stream) and v.d.get("Type") == "XRef":
                if isinstance(v.d.get("ID"), list):
                    last_id = v.d["ID"]
                if v.d.get("Encrypt") is not None:
                    enc = v.d["Encrypt"]
                    enc_id = (
                        v.d["ID"] if isinstance(v.d.get("ID"), list) else None
                    )
                if self.root is None and "Root" in v.d:
                    self.root = v.d["Root"]
        if enc is not None:
            self._decrypt_document(enc, enc_id if enc_id else last_id)

    def _decrypt_document(self, enc, ids) -> None:
        """Attempt the standard handler with the EMPTY user password
        (empty owner password as the V5 fallback): rev 2/3 RC4, rev 4
        AESV2/V2 crypt filters, rev 5/6 AESV3.  Decrypt every string
        and stream in place on success, raise
        :class:`PdfEncryptedError` otherwise."""
        skip = enc[0] if isinstance(enc, _Ref) else None
        try:
            d = self.resolve(enc)
        except PdfParseError:
            d = None
        if not isinstance(d, dict):
            raise PdfEncryptedError(
                "PDF is encrypted and the /Encrypt dict is unresolvable"
            )
        filt = self.resolve(d.get("Filter"))
        if filt != "Standard":
            raise PdfEncryptedError(
                f"unsupported security handler {str(filt)!r} (only the "
                "standard handler decrypts)"
            )
        v = self.resolve(d.get("V", 0))
        r = self.resolve(d.get("R", 0))
        if v == 5 and r in (5, 6):
            key = self._v5_file_key(d)
            self._decrypt_all(key, skip, str_cf="aes", stm_cf="aes")
            return
        if v == 4 and r == 4:
            key, str_cf, stm_cf = self._v4_file_key(d, ids)
            self._decrypt_all(key, skip, str_cf=str_cf, stm_cf=stm_cf)
            return
        if v not in (1, 2) or r not in (2, 3):
            raise PdfEncryptedError(
                f"unsupported encryption V={v!r} R={r!r} — rev 2/3 RC4, "
                "rev 4 AESV2/V2 and rev 5/6 AESV3 decrypt"
            )
        o = self.resolve(d.get("O"))
        u = self.resolve(d.get("U"))
        p = self.resolve(d.get("P"))
        if (
            not isinstance(o, bytes)
            or not isinstance(u, bytes)
            or isinstance(p, bool)
            or not isinstance(p, int)
        ):
            raise PdfEncryptedError("malformed /Encrypt dict (O/U/P)")
        nbits = self.resolve(d.get("Length", 40)) if v == 2 else 40
        if not isinstance(nbits, int) or not (40 <= nbits <= 128) or nbits % 8:
            raise PdfEncryptedError(f"invalid RC4 key length {nbits!r}")
        id0 = self._id0(ids)
        key = _std_file_key(b"", o, p, id0, r, nbits // 8)
        expect = _std_user_check(key, id0, r)
        ok = expect[:16] == u[:16] if r >= 3 else expect == u[:32]
        if not ok:
            raise PdfEncryptedError(
                "password-protected (the empty user password does not "
                "authenticate) — cannot decrypt without the password"
            )
        self._decrypt_all(key, skip, str_cf="rc4", stm_cf="rc4")

    @staticmethod
    def _id0(ids) -> bytes:
        if isinstance(ids, list) and ids and isinstance(ids[0], bytes):
            return ids[0]
        return b""

    def _v4_file_key(self, d: dict, ids):
        """V=4/R=4 crypt filters: resolve /CF + /StrF + /StmF to a
        cipher per class, authenticate the empty user password with
        the same Algorithms 2/5 as rev 3 (plus the /EncryptMetadata
        step f), and return (file_key, str_cipher, stm_cipher) where a
        cipher is 'aes', 'rc4' or None (Identity)."""
        cf = self.resolve(d.get("CF")) or {}
        if not isinstance(cf, dict):
            raise PdfEncryptedError("malformed /CF (not a dict)")

        def method(name):
            if name in (None, "Identity"):
                return None
            f = self.resolve(cf.get(name)) if name in cf else None
            cfm = self.resolve(f.get("CFM")) if isinstance(f, dict) else None
            if cfm == "AESV2":
                return "aes"
            if cfm == "V2":
                return "rc4"
            raise PdfEncryptedError(
                f"unsupported crypt filter {str(name)!r} "
                f"(CFM={str(cfm)!r} — AESV2 and V2 decrypt)"
            )

        str_cf = method(self.resolve(d.get("StrF", "Identity")))
        stm_cf = method(self.resolve(d.get("StmF", "Identity")))
        o = self.resolve(d.get("O"))
        u = self.resolve(d.get("U"))
        p = self.resolve(d.get("P"))
        if (
            not isinstance(o, bytes)
            or not isinstance(u, bytes)
            or isinstance(p, bool)
            or not isinstance(p, int)
        ):
            raise PdfEncryptedError("malformed /Encrypt dict (O/U/P)")
        nbits = self.resolve(d.get("Length", 128))
        if not isinstance(nbits, int) or not (40 <= nbits <= 128) or nbits % 8:
            raise PdfEncryptedError(f"invalid key length {nbits!r}")
        if "aes" in (str_cf, stm_cf) and nbits != 128:
            # AESV2 keys are 128-bit (spec); a shorter declared /Length
            # makes Algorithm 1 emit a <16-byte object key, which is
            # not an AES key size — typed here, not an AesError on the
            # executor (r13 review repro: authenticating /Length 40)
            raise PdfEncryptedError(
                f"AESV2 with /Length {nbits} (must be 128)"
            )
        em = self.resolve(d.get("EncryptMetadata", True))
        id0 = self._id0(ids)
        key = _std_file_key(b"", o, p, id0, 4, nbits // 8,
                            encrypt_metadata=em is not False)
        expect = _std_user_check(key, id0, 4)
        if expect[:16] != u[:16]:
            raise PdfEncryptedError(
                "password-protected (the empty user password does not "
                "authenticate) — cannot decrypt without the password"
            )
        return key, str_cf, stm_cf

    def _v5_file_key(self, d: dict) -> bytes:
        """V=5/R=5,6 (AESV3): authenticate the empty USER password
        against /U (SHA-256 for R=5, Algorithm 2.B for R=6) and unwrap
        the 32-byte file key from /UE; fall back to the empty OWNER
        password via /O + /OE (which hash over U[0:48] too)."""
        from .aes import AesError, cbc_decrypt

        r = self.resolve(d.get("R"))
        u = self.resolve(d.get("U"))
        o = self.resolve(d.get("O"))
        ue = self.resolve(d.get("UE"))
        oe = self.resolve(d.get("OE"))
        if not isinstance(u, bytes) or len(u) < 48:
            raise PdfEncryptedError("malformed /U (need 48 bytes for V5)")

        def hashed(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
            if r == 5:
                return hashlib.sha256(pw + salt + udata).digest()
            return _hash_2b(pw, salt, udata)

        def unwrap(inter: bytes, wrapped) -> bytes:
            if not isinstance(wrapped, bytes) or len(wrapped) != 32:
                raise PdfEncryptedError("malformed /UE//OE key blob")
            try:
                return cbc_decrypt(inter, bytes(16), wrapped)
            except AesError as e:
                raise PdfEncryptedError(f"key unwrap failed: {e}") from None

        if hashed(b"", u[32:40]) == u[:32]:
            return unwrap(hashed(b"", u[40:48]), ue)
        if isinstance(o, bytes) and len(o) >= 48:
            if hashed(b"", o[32:40], u[:48]) == o[:32]:
                return unwrap(hashed(b"", o[40:48], u[:48]), oe)
        raise PdfEncryptedError(
            "password-protected (neither the empty user nor the empty "
            "owner password authenticates) — cannot decrypt without "
            "the password"
        )

    def _decrypt_all(self, key: bytes, skip_num, str_cf, stm_cf) -> None:
        """Per-object decryption pass.  ``str_cf``/``stm_cf`` name the
        cipher per class ('rc4'/'aes'/None).  AESV3 (32-byte key) uses
        the FILE key directly for every object (ISO 32000-2 dropped
        Algorithm 1); AESV2 salts Algorithm 1 with ``sAlT``."""
        v5 = len(key) == 32
        for num in list(self.objects):
            if num == skip_num:
                continue  # the /Encrypt dict itself is never encrypted
            v = self.objects[num]
            if isinstance(v, _Stream) and v.d.get("Type") == "XRef":
                continue  # xref streams are never encrypted (spec)
            gen = self._gens.get(num, 0)

            def okey(cf):
                if cf is None:
                    return None
                if v5:
                    return (cf, key)
                return (cf, _std_object_key(key, num, gen,
                                            aes=cf == "aes"))

            self.objects[num] = _decrypt_val(v, okey(str_cf),
                                             okey(stm_cf))

    def _expand_objstms(self) -> None:
        top = set(self.objects)
        for v in list(self.objects.values()):
            if not (isinstance(v, _Stream) and v.d.get("Type") == "ObjStm"):
                continue
            try:
                data = _decode_stream(self, v)
            except PdfError:
                continue  # a broken ObjStm loses its objects, not the doc
            n = self.resolve(v.d.get("N", 0))
            first = self.resolve(v.d.get("First", 0))
            if not isinstance(n, int) or not isinstance(first, int):
                continue
            ints = [int(x) for x in _INT_RE.findall(data[:first])]
            for i in range(min(n, len(ints) // 2)):
                onum, off = ints[2 * i], ints[2 * i + 1]
                if onum in top:  # top-level (newer) definition wins
                    continue
                try:
                    val, _ = _parse_object(data, first + off)
                except PdfParseError:
                    continue
                self.objects[onum] = val

    def _find_root(self):
        if self.root is not None:
            return self.root
        for num, v in self.objects.items():
            if isinstance(v, dict) and v.get("Type") == "Catalog":
                return _Ref(num, 0)
        return None

    # -- access -------------------------------------------------------
    def resolve(self, val, depth: int = 0):
        while isinstance(val, _Ref):
            if depth > _MAX_RESOLVE_DEPTH:
                raise PdfParseError("reference cycle")
            val = self.objects.get(val[0])
            depth += 1
        return val

    def pages(self) -> list[dict]:
        """Page dicts in tree order, /Resources inherited. Degrades to
        a direct /Type /Page scan when the catalog/tree is broken."""
        out: list[dict] = []
        root = self.resolve(self.root)
        if isinstance(root, dict):
            tree = self.resolve(root.get("Pages"))
            if isinstance(tree, dict):
                self._walk(tree, None, out, set(), 0)
        if not out:  # degraded: object order
            for num in sorted(self.objects):
                v = self.objects[num]
                if isinstance(v, dict) and v.get("Type") == "Page":
                    out.append(v)
        if not out:
            raise PdfParseError("no page objects found")
        return out

    def _walk(self, node: dict, res, out: list, seen: set, depth: int) -> None:
        if depth > _MAX_TREE_DEPTH or id(node) in seen:
            return
        seen.add(id(node))
        res = node.get("Resources", res)
        if node.get("Type") == "Page":
            if "Resources" not in node and res is not None:
                node = dict(node)
                node["Resources"] = res
            out.append(node)
            return
        kids = self.resolve(node.get("Kids"))
        if isinstance(kids, list):
            for k in kids:
                kid = self.resolve(k)
                if isinstance(kid, dict):
                    self._walk(kid, res, out, seen, depth + 1)


# --------------------------------------------------------------------------
# font decoding
# --------------------------------------------------------------------------

# Adobe Glyph List subset: everything the standard encodings name for
# the Latin repertoire, plus the common typographic glyphs.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteright": "’", "quoteleft": "‘",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "dagger": "†", "daggerdbl": "‡",
    "fi": "ﬁ", "fl": "ﬂ", "florin": "ƒ",
    "copyright": "©", "registered": "®", "trademark": "™",
    "section": "§", "paragraph": "¶", "degree": "°",
    "plusminus": "±", "multiply": "×", "divide": "÷",
    "cent": "¢", "sterling": "£", "yen": "¥",
    "Euro": "€", "currency": "¤", "exclamdown": "¡",
    "questiondown": "¿", "guillemotleft": "«",
    "guillemotright": "»", "guilsinglleft": "‹",
    "guilsinglright": "›", "perthousand": "‰",
    "middot": "·", "periodcentered": "·", "nbspace": " ",
    "softhyphen": "­", "minus": "−", "fraction": "⁄",
    "circumflex": "ˆ", "tilde": "˜", "macron": "¯",
    "breve": "˘", "dotaccent": "˙", "dieresis": "¨",
    "ring": "˚", "cedilla": "¸", "caron": "ˇ",
    "hungarumlaut": "˝", "ogonek": "˛", "acute": "´",
    "brokenbar": "¦", "logicalnot": "¬", "mu": "µ",
    "onesuperior": "¹", "twosuperior": "²",
    "threesuperior": "³", "onequarter": "¼",
    "onehalf": "½", "threequarters": "¾", "ordfeminine": "ª",
    "ordmasculine": "º", "eth": "ð", "thorn": "þ",
    "Eth": "Ð", "Thorn": "Þ", "germandbls": "ß",
    "dotlessi": "ı", "OE": "Œ", "oe": "œ",
    "Scaron": "Š", "scaron": "š", "Zcaron": "Ž",
    "zcaron": "ž", "Ydieresis": "Ÿ", "Lslash": "Ł",
    "lslash": "ł", "AE": "Æ", "ae": "æ",
    "Oslash": "Ø", "oslash": "ø", "Aring": "Å",
    "aring": "å",
}
# letters map to themselves; accented latin-1 names: Xacute/Xgrave/...
for _ch in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
    _AGL[_ch] = _ch
for _base, _accents in (
    ("aeiouyAEIOUY", "acute"),
    ("aeiouAEIOU", "grave"),
    ("aeiouyAEIOUY", "dieresis"),
    ("aeiouAEIOU", "circumflex"),
    ("anoANO", "tilde"),
    ("cC", "cedilla"),
):
    for _c in _base:
        _name = _c + _accents
        try:
            import unicodedata as _ud

            _AGL.setdefault(
                _name,
                _ud.lookup(
                    f"LATIN {'CAPITAL' if _c.isupper() else 'SMALL'} LETTER "
                    f"{_c.upper()} WITH {_accents.upper()}"
                ),
            )
        except KeyError:
            pass


def _glyph_to_char(name: str) -> str:
    if name in _AGL:
        return _AGL[name]
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4})", name)
    if m:
        return chr(int(m.group(1), 16))
    m = re.fullmatch(r"u([0-9A-Fa-f]{4,6})", name)
    if m:
        cp = int(m.group(1), 16)
        if cp <= 0x10FFFF:
            return chr(cp)
    return ""


# WinAnsiEncoding == cp1252 for all defined points; the five cp1252
# holes (0x81 8D 8F 90 9D) render as bullets per the WinAnsi table.
def _winansi_table() -> list[str]:
    table = []
    for b in range(256):
        try:
            table.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            table.append("•")
    return table


_WINANSI = _winansi_table()
_MACROMAN = [bytes([b]).decode("mac_roman") for b in range(256)]
# StandardEncoding: ASCII except quoteright at 0x27 / quoteleft at 0x60;
# upper range sparse — latin-1 is the pragmatic fallback there.
_STANDARD = [chr(b) if b < 128 else bytes([b]).decode("latin-1") for b in range(256)]
_STANDARD[0x27] = "’"
_STANDARD[0x60] = "‘"

_BASE_ENCODINGS = {
    "WinAnsiEncoding": _WINANSI,
    "MacRomanEncoding": _MACROMAN,
    "StandardEncoding": _STANDARD,
    "PDFDocEncoding": _WINANSI,
}

_CMAP_CODESPACE_RE = re.compile(
    rb"begincodespacerange(.*?)endcodespacerange", re.S
)
_CMAP_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_CMAP_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_TOK_RE = re.compile(rb"<([0-9A-Fa-f]*)>")


# corrupt-CMap cap: a bfrange like <0000> <FFFFFFFF> is linear in the
# range size — unbounded iteration is a CPU DoS from one crawled file.
# 0xFFFF spans any real CMap's code plane.
_MAX_BFRANGE = 0x10000


def _utf16be(hexs: bytes) -> str:
    h = hexs.decode("ascii")
    if len(h) % 2:  # odd digit count: fromhex would raise
        h += "0"
    raw = bytes.fromhex(h)
    if len(raw) % 2:
        raw += b"\x00"
    return raw.decode("utf-16-be", errors="replace")


def _hex_int(tok: bytes) -> int | None:
    """int of a CMap hex token; None for the empty '<>' token a corrupt
    CMap can produce (int(b'', 16) raises plain ValueError, which would
    escape the typed-PdfError quarantine)."""
    return int(tok, 16) if tok else None


class _FontDecoder:
    """Maps show-string bytes → text for one font."""

    def __init__(self, doc: _Doc, font: dict | None):
        self.code_len = 1
        self.cmap: dict[int, str] | None = None
        self.table: list[str] = _WINANSI
        self.skip_unmapped = False
        if font is None:
            return
        subtype = font.get("Subtype")
        if subtype == "Type0":
            self.code_len = 2
            self.skip_unmapped = True  # CIDs are not unicode
        tu = doc.resolve(font.get("ToUnicode"))
        if isinstance(tu, _Stream):
            try:
                self._parse_cmap(_decode_stream(doc, tu))
            except (PdfError, ValueError):
                # a broken ToUnicode loses its mapping, not the doc
                self.cmap = None
        if self.cmap is None and subtype != "Type0":
            enc = doc.resolve(font.get("Encoding"))
            if isinstance(enc, _Name) or isinstance(enc, str):
                self.table = _BASE_ENCODINGS.get(str(enc), _WINANSI)
            elif isinstance(enc, dict):
                base = _BASE_ENCODINGS.get(
                    str(doc.resolve(enc.get("BaseEncoding")) or ""), _STANDARD
                )
                table = list(base)
                diffs = doc.resolve(enc.get("Differences"))
                if isinstance(diffs, list):
                    code = 0
                    for item in diffs:
                        item = doc.resolve(item)
                        if isinstance(item, (int, float)):
                            code = int(item)
                        elif isinstance(item, _Name) and 0 <= code < 256:
                            table[code] = _glyph_to_char(str(item))
                            code += 1
                self.table = table

    def _parse_cmap(self, data: bytes) -> None:
        cmap: dict[int, str] = {}
        for m in _CMAP_CODESPACE_RE.finditer(data):
            toks = _HEX_TOK_RE.findall(m.group(1))
            if toks and toks[0]:
                self.code_len = max(1, len(toks[0]) // 2)
        for m in _CMAP_BFCHAR_RE.finditer(data):
            toks = _HEX_TOK_RE.findall(m.group(1))
            for i in range(0, len(toks) - 1, 2):
                src = _hex_int(toks[i])
                if src is not None:
                    cmap[src] = _utf16be(toks[i + 1])
        for m in _CMAP_BFRANGE_RE.finditer(data):
            body = m.group(1)
            pos = 0
            while True:
                lm = _HEX_TOK_RE.search(body, pos)
                if not lm:
                    break
                hm = _HEX_TOK_RE.search(body, lm.end())
                if not hm:
                    break
                pos = hm.end()
                lo, hi = _hex_int(lm.group(1)), _hex_int(hm.group(1))
                if lo is None or hi is None:
                    continue  # corrupt '<>' bound: skip this entry
                # cap the iteration, not just the insert — a lying hi
                # is otherwise a per-file CPU DoS
                hi = min(hi, lo + _MAX_BFRANGE - 1)
                nxt = _skip_ws(body, pos)
                if body[nxt : nxt + 1] == b"[":
                    end = body.find(b"]", nxt)
                    arr = _HEX_TOK_RE.findall(body[nxt : end if end >= 0 else len(body)])
                    for i, code in enumerate(
                        range(lo, min(hi, lo + len(arr) - 1) + 1)
                    ):
                        cmap[code] = _utf16be(arr[i])
                    pos = (end + 1) if end >= 0 else len(body)
                else:
                    dm = _HEX_TOK_RE.search(body, pos)
                    if not dm:
                        break
                    pos = dm.end()
                    base_raw = bytes.fromhex(
                        dm.group(1).decode("ascii")
                        + ("0" if len(dm.group(1)) % 2 else "")
                    )
                    if len(base_raw) % 2:
                        base_raw += b"\x00"
                    base_last = int.from_bytes(base_raw[-2:], "big") if base_raw else 0
                    prefix = base_raw[:-2]
                    for i, code in enumerate(range(lo, hi + 1)):
                        unit = base_last + i
                        if unit <= 0xFFFF:
                            cmap[code] = (prefix + unit.to_bytes(2, "big")).decode(
                                "utf-16-be", errors="replace"
                            )
        self.cmap = cmap if cmap else None

    def decode(self, raw: bytes) -> str:
        if self.cmap is not None:
            out = []
            cl = self.code_len
            for i in range(0, len(raw) - cl + 1, cl):
                code = int.from_bytes(raw[i : i + cl], "big")
                ch = self.cmap.get(code)
                if ch is not None:
                    out.append(ch)
                elif not self.skip_unmapped and cl == 1:
                    out.append(self.table[code])
            return "".join(out)
        if self.skip_unmapped:  # Type0 without ToUnicode: CIDs, unmappable
            return ""
        return "".join(self.table[b] for b in raw)


_DEFAULT_DECODER = _FontDecoder.__new__(_FontDecoder)
_DEFAULT_DECODER.code_len = 1
_DEFAULT_DECODER.cmap = None
_DEFAULT_DECODER.table = _WINANSI
_DEFAULT_DECODER.skip_unmapped = False


# --------------------------------------------------------------------------
# content-stream interpretation
# --------------------------------------------------------------------------

_EI_RE = re.compile(rb"[\x00\t\n\x0c\r ]EI(?=[\x00\t\n\x0c\r ()<>\[\]{}/%]|$)")
_ID_RE = re.compile(rb"ID(?=[\x00\t\n\x0c\r ])")


def _skip_inline_image(content: bytes, pos: int) -> int:
    """Advance past a ``BI`` … ``ID`` <data> ``EI`` inline image, given
    ``pos`` just after the ``BI`` keyword. Parses the image dict and
    honors the ``/L`` (ISO 32000-2) / ``/Length`` length hint when
    present, so binary image data that happens to contain a
    whitespace+``EI`` byte pattern does not end the skip early (which
    would parse the image tail as garbage operators). Falls back to the
    ``EI`` regex when no usable hint exists."""
    n = len(content)
    # parse dict entries up to the ID keyword
    params: dict = {}
    key = None
    p = pos
    while p < n:
        p = _skip_ws(content, p)
        if p >= n:
            return n
        m = _ID_RE.match(content, p)
        if m:
            p = m.end()
            break
        try:
            val, p2 = _parse_object(content, p)
        except PdfParseError:
            # unparseable dict — fall back to the EI scan from here
            em = _EI_RE.search(content, p)
            return em.end() if em else n
        p = p2
        if key is None:
            key = str(val) if isinstance(val, _Name) else None
        else:
            params[key] = val
            key = None
    else:
        return n
    # one whitespace byte separates ID from the data
    if p < n and content[p] in b"\x00\t\n\x0c\r ":
        p += 1
    length = params.get("L", params.get("Length"))
    if isinstance(length, int) and 0 <= length <= n - p:
        after = p + length
        em = _EI_RE.search(content, max(after - 1, p))
        if em and em.start() <= after + 2:
            return em.end()
        # hint contradicted by the bytes — rescan from the data start
    em = _EI_RE.search(content, p)
    return em.end() if em else n


class _TextState:
    """Per-document extraction state shared across pages/XObjects."""

    __slots__ = ("lines", "_line", "image_seen", "shows")

    def __init__(self):
        self.lines: list[str] = []
        self._line: list[str] = []
        self.image_seen = False
        self.shows = 0  # show operators encountered (mapped or not)

    def show(self, text: str) -> None:
        self.shows += 1
        if text:
            self._line.append(text)

    def space(self) -> None:
        if self._line and not self._line[-1].endswith(" "):
            self._line.append(" ")

    def newline(self) -> None:
        line = "".join(self._line).rstrip()
        if line:
            self.lines.append(line)
        self._line = []

    def page_break(self) -> None:
        self.newline()


def _interpret(
    doc: _Doc,
    content: bytes,
    resources,
    state: _TextState,
    depth: int = 0,
) -> None:
    res = doc.resolve(resources)
    fonts = doc.resolve(res.get("Font")) if isinstance(res, dict) else None
    xobjects = doc.resolve(res.get("XObject")) if isinstance(res, dict) else None

    stack: list = []
    decoder = _DEFAULT_DECODER
    # text line matrix (a b c d e f); track f (y) for line breaks
    tlm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    leading = 0.0
    pos, n = 0, len(content)
    while pos < n:
        pos = _skip_ws(content, pos)
        if pos >= n:
            break
        c = content[pos]
        if c in b"/<([+-.0123456789":
            try:
                val, pos = _parse_object(content, pos)
            except PdfParseError:
                pos += 1
                continue
            stack.append(val)
            continue
        m = _KW_RE.match(content, pos)
        if not m:
            pos += 1
            continue
        op = m.group().decode("latin-1")
        pos = m.end()

        if op == "Tj" or op == "'":
            if op == "'":
                state.newline()
                tlm = _td(tlm, 0.0, -leading)
            if stack and isinstance(stack[-1], bytes):
                state.show(decoder.decode(stack[-1]))
        elif op == '"':
            state.newline()
            tlm = _td(tlm, 0.0, -leading)
            if stack and isinstance(stack[-1], bytes):
                state.show(decoder.decode(stack[-1]))
        elif op == "TJ":
            if stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        state.show(decoder.decode(el))
                    elif isinstance(el, (int, float)) and el <= -TJ_SPACE_GAP:
                        state.space()
        elif op == "Td" or op == "TD":
            if len(stack) >= 2 and all(
                isinstance(v, (int, float)) for v in stack[-2:]
            ):
                tx, ty = float(stack[-2]), float(stack[-1])
                if op == "TD":
                    leading = -ty
                new = _td(tlm, tx, ty)
                if abs(new[5] - tlm[5]) > 1e-6:
                    state.newline()
                tlm = new
        elif op == "Tm":
            if len(stack) >= 6 and all(
                isinstance(v, (int, float)) for v in stack[-6:]
            ):
                new = tuple(float(v) for v in stack[-6:])
                if abs(new[5] - tlm[5]) > 1e-6 and (state._line or state.lines):
                    state.newline()
                tlm = new
        elif op == "T*":
            state.newline()
            tlm = _td(tlm, 0.0, -leading)
        elif op == "TL":
            if stack and isinstance(stack[-1], (int, float)):
                leading = float(stack[-1])
        elif op == "Tf":
            if len(stack) >= 2 and isinstance(stack[-2], _Name):
                decoder = _font_decoder(doc, fonts, str(stack[-2]))
        elif op == "BT":
            tlm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
        elif op == "ET":
            pass
        elif op == "Do":
            if stack and isinstance(stack[-1], _Name) and isinstance(xobjects, dict):
                xo = doc.resolve(xobjects.get(str(stack[-1])))
                if isinstance(xo, _Stream):
                    sub = xo.d.get("Subtype")
                    if sub == "Image":
                        state.image_seen = True
                    elif sub == "Form" and depth < _MAX_XOBJECT_DEPTH:
                        try:
                            data = _decode_stream(doc, xo)
                        except PdfUnsupportedFilterError:
                            raise
                        except PdfError:
                            data = b""
                        _interpret(
                            doc,
                            data,
                            xo.d.get("Resources", resources),
                            state,
                            depth + 1,
                        )
        elif op == "BI":
            # inline image: parse the dict (honoring /L), skip the data
            state.image_seen = True
            pos = _skip_inline_image(content, pos)
        stack.clear()


def _td(tlm: tuple, tx: float, ty: float) -> tuple:
    a, b, c, d, e, f = tlm
    return (a, b, c, d, tx * a + ty * c + e, tx * b + ty * d + f)


def _font_decoder(doc: _Doc, fonts, name: str) -> _FontDecoder:
    if not isinstance(fonts, dict):
        return _DEFAULT_DECODER
    ref = fonts.get(name)
    font = doc.resolve(ref)
    if not isinstance(font, dict):
        return _DEFAULT_DECODER
    key = id(font)
    dec = doc._font_cache.get(key)
    if dec is None:
        dec = _FontDecoder(doc, font)
        doc._font_cache[key] = dec
    return dec


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


def _require_pdf(data) -> bytes:
    """Shared input guard for pdf_text/pdf_images — ONE definition of
    what bytes are worth parsing, so the two extractors cannot diverge
    in their accepted-input contract."""
    if not isinstance(data, (bytes, bytearray)):
        raise PdfParseError("expected bytes")
    if b"%PDF" not in data[:1024] and b" obj" not in data[:4096]:
        raise PdfParseError("not a PDF (no %PDF header, no objects)")
    return bytes(data)


def pdf_text(data: bytes) -> str:
    """Extract the text layer of a PDF. Pure function (the UDF below
    maps it); raises the typed :class:`PdfError` subclasses documented
    in the module docstring. Pages join with newlines; a page's lines
    follow the content stream's own line-matrix moves."""
    doc = _Doc(_require_pdf(data))
    state = _TextState()
    for page in doc.pages():
        contents = doc.resolve(page.get("Contents"))
        streams = contents if isinstance(contents, list) else [contents]
        data_parts = []
        for s in streams:
            s = doc.resolve(s)
            if isinstance(s, _Stream):
                data_parts.append(_decode_stream(doc, s))
        if data_parts:
            _interpret(
                doc, b"\n".join(data_parts), page.get("Resources"), state
            )
        state.page_break()
    text = "\n".join(state.lines)
    if not text and state.shows == 0 and state.image_seen:
        raise PdfImageOnlyError(
            "pages contain raster images but no text operators — "
            "scanned PDF with no text layer; needs OCR, not extraction"
        )
    return text


# --------------------------------------------------------------------------
# embedded images (r12): image XObjects -> standalone decodable payloads
# --------------------------------------------------------------------------

_DCT_NAMES = ("DCTDecode", "DCT")


def _collect_images(doc: _Doc, resources, out: list, seen: set, depth: int):
    """Append (name, xo) for every /Subtype /Image XObject reachable
    from ``resources``, recursing through Form XObjects; name-sorted
    per level for deterministic image indexes."""
    res = doc.resolve(resources)
    if not isinstance(res, dict) or depth > _MAX_XOBJECT_DEPTH:
        return
    xobjects = doc.resolve(res.get("XObject"))
    if not isinstance(xobjects, dict):
        return
    for name in sorted(xobjects):
        try:
            xo = doc.resolve(xobjects[name])
        except PdfParseError:
            continue
        if not isinstance(xo, _Stream) or id(xo) in seen:
            continue
        sub = xo.d.get("Subtype")
        if sub == "Image":
            seen.add(id(xo))
            out.append((str(name), xo))
        elif sub == "Form":
            seen.add(id(xo))
            _collect_images(doc, xo.d.get("Resources"), out, seen, depth + 1)


def _raster_array(data: bytes, w: int, h: int, bits: int, channels: int):
    """Packed PDF image samples -> uint8 numpy array (H, W) or
    (H, W, 3). Rows pad to byte boundaries (ISO 32000-1 §8.9.3); sub-
    byte gray depths scale to 0..255 like the PNG path."""
    import numpy as np

    stride = (w * channels * bits + 7) // 8
    need = stride * h
    if len(data) < need:
        raise PdfImageDecodeError(
            f"image data short: {len(data)} < {need} ({w}x{h}x{channels}"
            f"@{bits})"
        )
    rows = np.frombuffer(data[:need], dtype=np.uint8).reshape(h, stride)
    if bits == 8:
        flat = rows[:, : w * channels]
        return (
            flat.reshape(h, w)
            if channels == 1
            else flat.reshape(h, w, channels)
        )
    # sub-byte depths are gray-only (guarded by the caller)
    b = np.unpackbits(rows, axis=1)
    if bits == 1:
        vals = b[:, :w] * 255
    else:
        weights = (1 << np.arange(bits - 1, -1, -1)).astype(np.uint16)
        grouped = b[:, : (w * bits)].reshape(h, w, bits)
        vals = (grouped * weights).sum(axis=2) * (255 // ((1 << bits) - 1))
    return vals.astype(np.uint8)


def _to_netpbm(arr) -> bytes:
    """uint8 (H, W) -> P5 / (H, W, 3) -> P6 — a standalone payload the
    multimodal tier (decode_image / extract_features / media dedup)
    consumes directly."""
    h, w = arr.shape[0], arr.shape[1]
    magic = b"P5" if arr.ndim == 2 else b"P6"
    return magic + f" {w} {h} 255\n".encode() + arr.tobytes()


def _image_record(doc: _Doc, xo: _Stream, page: int, idx: int) -> dict:
    from data_governance_spark.operators.multimodal import _img_stats

    d = xo.d
    rec = {
        "page": page,
        "img_idx": idx,
        "width": None,
        "height": None,
        "format": None,
        "image": None,
        "feature": None,
        "err": None,
    }
    try:
        w = doc.resolve(d.get("Width"))
        h = doc.resolve(d.get("Height"))
        if not isinstance(w, int) or not isinstance(h, int) or w < 1 or h < 1:
            raise PdfImageDecodeError(f"bad image dims {w!r}x{h!r}")
        rec["width"], rec["height"] = w, h
        if w * h > 64_000_000:
            raise PdfImageDecodeError(f"image too large: {w}x{h}")
        filt = doc.resolve(d.get("Filter"))
        names = [
            str(doc.resolve(f))
            for f in (filt if isinstance(filt, list) else [filt])
            if f is not None
        ]
        if names and names[-1] in _DCT_NAMES:
            # the stream IS a JPEG once the preceding filters unwrap —
            # route to the repo's real decoder (operators/jpeg.py)
            if len(names) == 1:
                jpeg = _stream_raw(xo)
            else:
                parms = doc.resolve(d.get("DecodeParms", d.get("DP")))
                if not isinstance(parms, list):
                    parms = [parms] * len(names)
                d2 = dict(d)
                d2["Filter"] = [_Name(n) for n in names[:-1]]
                d2["DecodeParms"] = parms[: len(names) - 1]
                jpeg = _decode_stream(doc, _Stream(d2, _stream_raw(xo)))
            from data_governance_spark.operators.jpeg import decode_jpeg

            try:
                arr = decode_jpeg(jpeg)
            except (ValueError, NotImplementedError) as e:
                # decode_jpeg raises NotImplementedError for in-spec
                # corners it doesn't do (12-bit precision, exotic
                # sampling) — both must stay per-image, never kill the
                # document (let alone the Spark task)
                raise PdfImageDecodeError(f"embedded JPEG: {e}") from None
            rec["format"] = "jpeg"
            rec["image"] = bytes(jpeg)
            rec["feature"] = _img_stats(arr)
            # the dict's /Width //Height are untrusted; the decoded
            # JPEG's own geometry is what downstream consumers get in
            # feature[0:2] — report the same truth in the columns
            rec["width"] = int(arr.shape[1])
            rec["height"] = int(arr.shape[0])
            return rec
        if names and names[-1] in ("CCITTFaxDecode", "CCF"):
            # scanned-document tier (operators/ccitt.py): the whole /K
            # space decodes to gray pixels directly — G4 (/K < 0), G3
            # mixed 2D (/K > 0), and /K = 0 in both framings (EOL
            # sniffed; /EndOfLine defaults to false, i.e. bare MH)
            from data_governance_spark.operators.ccitt import (
                decode_g3,
                decode_g4,
                decode_mh,
            )

            parms = doc.resolve(d.get("DecodeParms", d.get("DP")))
            if not isinstance(parms, list):
                parms = [parms] * len(names)
            elif len(parms) < len(names):
                # short /DecodeParms array: same pad rule as
                # _decode_stream — indexing would IndexError untyped
                parms = parms + [None] * (len(names) - len(parms))
            p = doc.resolve(parms[len(names) - 1])
            p = p if isinstance(p, dict) else {}
            kk = doc.resolve(p.get("K", 0))
            if not isinstance(kk, int):
                raise PdfImageDecodeError(f"CCITT bad /K {kk!r}")
            cols = doc.resolve(p.get("Columns", 1728))
            # the w*h guard above used the DICT dims; the allocation is
            # sized by /Columns x h — bound THAT (adversarial parms)
            if (
                not isinstance(cols, int)
                or cols < 1
                or cols * h > 64_000_000
            ):
                raise PdfImageDecodeError(f"CCITT bad /Columns {cols!r}")
            if len(names) == 1:
                payload = _stream_raw(xo)
            else:
                d2 = dict(d)
                d2["Filter"] = [_Name(n) for n in names[:-1]]
                d2["DecodeParms"] = parms[: len(names) - 1]
                payload = _decode_stream(doc, _Stream(d2, _stream_raw(xo)))
            aligned = doc.resolve(p.get("EncodedByteAlign")) is True
            try:
                if kk < 0:  # G4/MMR — the scanned-document default
                    arr = decode_g4(payload, cols, rows=h,
                                    byte_align=aligned)
                elif kk > 0:  # G3 mixed 2D: EOL+tag framing (spec-
                    # required for 2D; byte-align fill is zeros, which
                    # the EOL seek already skips)
                    arr = decode_g3(payload, cols, rows=h, two_d=True)
                elif (
                    len(payload) >= 2
                    and int.from_bytes(payload[:2], "big") >> 4 == 1
                ):
                    # /K = 0 WITH EOL framing: PDF's /EndOfLine
                    # defaults to FALSE, so sniff — a stream whose
                    # first 12 bits are 000000000001 is EOL-framed (no
                    # legit run code has more than 7 leading zeros)
                    arr = decode_g3(payload, cols, rows=h, two_d=False)
                else:
                    # /K = 0 EOL-less (the default): back-to-back MH
                    # lines, byte-aligned iff /EncodedByteAlign
                    arr = decode_mh(payload, cols, h, byte_align=aligned)
            except ValueError as e:
                raise PdfImageDecodeError(f"CCITT: {e}") from None
            if doc.resolve(p.get("BlackIs1")) is True:
                arr = 255 - arr
            channels = 1
            rec["width"] = int(arr.shape[1])
            rec["height"] = int(arr.shape[0])
        else:
            # raster path: the existing filter chain (incl. predictors)
            # yields packed samples
            data = _decode_stream(doc, xo)
            mask = doc.resolve(d.get("ImageMask")) is True
            bits = 1 if mask else doc.resolve(d.get("BitsPerComponent", 8))
            cs = doc.resolve(d.get("ColorSpace"))
            if isinstance(cs, list) and cs:
                cs = doc.resolve(cs[0])
            cs_name = str(cs) if isinstance(cs, _Name) else None
            if mask or cs_name in ("DeviceGray", "CalGray", "G"):
                channels = 1
            elif cs_name in ("DeviceRGB", "CalRGB", "RGB"):
                channels = 3
            else:
                raise PdfImageDecodeError(
                    f"unsupported colorspace {cs_name or cs!r} (gray/RGB "
                    "rasters and DCT-embedded JPEGs decode)"
                )
            if bits not in (1, 2, 4, 8) or (channels == 3 and bits != 8):
                raise PdfImageDecodeError(
                    f"unsupported bits/channels: {bits}@{channels}"
                )
            arr = _raster_array(data, w, h, bits, channels)
        # /Decode sample mapping (§8.9.5.2): identity passes through,
        # full inversion ([1 0] per component — the common ImageMask
        # stencil form) is applied, anything else raises typed rather
        # than silently emitting wrong pixel values
        decode = doc.resolve(d.get("Decode"))
        if decode is not None:
            vals = [doc.resolve(x) for x in decode] if isinstance(
                decode, list
            ) else None
            if vals == [0, 1] * channels:
                pass
            elif vals == [1, 0] * channels:
                arr = 255 - arr
            else:
                raise PdfImageDecodeError(
                    f"unsupported /Decode array {vals!r} (identity and "
                    "full inversion decode; partial-range maps raise)"
                )
        rec["format"] = "ppm"
        rec["image"] = _to_netpbm(arr)
        rec["feature"] = _img_stats(arr)
        return rec
    except PdfError as e:
        rec["err"] = type(e).__name__
        return rec


def pdf_images(data: bytes) -> list[dict]:
    """Embedded raster images of a PDF, one dict per image per page:
    ``(page, img_idx, width, height, format, image, feature, err)``.

    - ``DCTDecode`` XObjects route to the repo's real JPEG decoder
      (``operators/jpeg.py``); ``image`` is the standalone JPEG bytes.
    - Flate/LZW/... rasters (gray 1/2/4/8-bit incl. /ImageMask
      stencils, RGB 8-bit, PNG/TIFF predictors) decode through the
      standard filter chain; ``image`` is a netpbm (P5/P6) payload.
    - Either way ``image`` is magic-sniffable and feeds the multimodal
      tier directly (``decode_image`` / ``extract_features(decoder=
      'real')`` / media dedup), and ``feature`` is the same 7-wide
      stats vector ``image_features`` yields.
    - ``CCITTFaxDecode`` G4 (/K < 0 — the scanned-document default)
      decodes through ``operators/ccitt.py`` into the same netpbm
      shape, honoring /Columns, /Rows, /BlackIs1, /EncodedByteAlign.
    - Unsupported images (JPX/JBIG2, CCITT /K >= 0, exotic
      colorspaces, 16-bit) record a typed ``err`` PER IMAGE — the
      document and its other images survive.

    Document-level failures (not a PDF, undecryptable encryption)
    raise the usual typed errors; encrypted rev 2/3 documents decrypt
    first, so their images extract too."""
    doc = _Doc(_require_pdf(data))
    out: list[dict] = []
    for pno, page in enumerate(doc.pages(), 1):
        imgs: list = []
        _collect_images(doc, page.get("Resources"), imgs, set(), 0)
        for idx, (_name, xo) in enumerate(imgs):
            out.append(_image_record(doc, xo, pno, idx))
    return out


def extract_pdf_images(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per embedded image per document:
    ``(id_col, page, img_idx, width, height, format, image, feature,
    err)`` — the PDF counterpart of ``frame_features`` (one row per
    video frame). Map-only ``mapInPandas``; a document whose bytes are
    NULL or fail doc-level (quarantine semantics) keeps ONE row with
    NULL page and the error name in ``err``, so documents never vanish
    silently. Feed ``image`` into the multimodal tier for
    feature-extraction or media dedup."""
    import pyspark.sql.types as T

    id_field = docs.schema[id_col]
    schema = T.StructType(
        [
            id_field,
            T.StructField("page", T.IntegerType()),
            T.StructField("img_idx", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("format", T.StringType()),
            T.StructField("image", T.BinaryType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
            T.StructField("err", T.StringType()),
        ]
    )
    cols = [
        "page", "img_idx", "width", "height", "format", "image",
        "feature", "err",
    ]

    def run(batches):
        for pdf in batches:
            rows: list[dict] = []
            for did, c in zip(pdf[id_col], pdf[content_col]):
                base = {id_col: did, **{k: None for k in cols}}
                if c is None:
                    base["err"] = "null-content"
                    rows.append(base)
                    continue
                try:
                    recs = pdf_images(bytes(c))
                except PdfError as e:
                    base["err"] = type(e).__name__
                    rows.append(base)
                    continue
                if not recs:
                    rows.append(base)  # no images: one all-NULL row
                    continue
                for r in recs:
                    rows.append({id_col: did, **r})
            yield pd.DataFrame(rows, columns=[id_col, *cols])

    return docs.select(id_col, content_col).mapInPandas(run, schema)


def pdf_text_column(
    col: Column | str,
    errors: str = "null",
) -> Column:
    """Column form over a ``binary`` column. ``errors="null"`` maps any
    :class:`PdfError` to NULL (one scanned/broken file must not kill a
    corpus job); ``errors="raise"`` propagates (gates/tests)."""
    if errors not in ("null", "raise"):
        raise ValueError(f"errors must be 'null' or 'raise', got {errors!r}")

    @F.pandas_udf("string")
    def extract(c: pd.Series) -> pd.Series:
        out = []
        for v in c:
            if v is None:
                out.append(None)
            elif errors == "raise":
                out.append(pdf_text(bytes(v)))
            else:
                try:
                    out.append(pdf_text(bytes(v)))
                except PdfError:
                    out.append(None)
        return pd.Series(out, dtype="object")

    return extract(F.col(col) if isinstance(col, str) else col)


def extract_pdf_text(
    docs: DataFrame,
    content_col: str = "content",
    out_col: str = "text",
    errors: str = "null",
    error_col: str | None = None,
) -> DataFrame:
    """``docs`` with ``out_col`` added: the extracted text layer of the
    PDF bytes in ``content_col`` (NULL in → NULL out). With the default
    ``errors="null"``, undecodable files land as NULL text; pass
    ``error_col`` to also capture the typed error class name per row —
    the quarantine pattern (filter ``error_col IS NOT NULL`` into a
    side table, like the JSONL/CSV sources' ``bad`` frames). Map-only,
    Arrow-batched; no shuffle, no driver state."""
    if error_col is None:
        return docs.withColumn(out_col, pdf_text_column(content_col, errors))
    if errors != "null":
        raise ValueError("error_col requires errors='null'")

    @F.pandas_udf("text string, err string")
    def extract(c: pd.Series) -> pd.DataFrame:
        texts, errs = [], []
        for v in c:
            if v is None:
                texts.append(None)
                errs.append(None)
                continue
            try:
                texts.append(pdf_text(bytes(v)))
                errs.append(None)
            except PdfError as e:
                texts.append(None)
                errs.append(type(e).__name__)
        return pd.DataFrame({"text": texts, "err": errs})

    tmp = "_pdf_extract"
    return (
        docs.withColumn(tmp, extract(F.col(content_col)))
        .withColumn(out_col, F.col(tmp)["text"])
        .withColumn(error_col, F.col(tmp)["err"])
        .drop(tmp)
    )
