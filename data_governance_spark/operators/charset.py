"""Charset detection + transcoding for crawled bytes.

A crawl pipeline meets document bytes whose encoding is unknown or
mis-declared (HTTP headers lie, HTML meta tags lie differently, and
~half the long tail is legacy 8-bit).  This module turns a ``binary``
column into ``(text, encoding)`` deterministically — no ML model, no
external library — with the detection ladder the big WET-style
extractors use:

1. **BOM** — UTF-32 LE/BE checked BEFORE UTF-16 (the UTF-32LE BOM
   starts with the UTF-16LE BOM), then UTF-16 LE/BE, then UTF-8.
   A BOM wins outright; the payload decodes with ``errors="replace"``
   so a truncated tail yields U+FFFD instead of a crash.
2. **NUL-pattern UTF-16 sniff** — BEFORE the UTF-8 probe, because
   UTF-16LE-encoded ASCII *is* valid UTF-8 (every other byte NUL), so
   probing UTF-8 first would mis-label it.  Real text never contains
   NUL; alternating-position NUL density picks the byte order.
3. **Strict UTF-8 probe** — covers ASCII for free.
4. **8-bit fallback** — cp1252 (the web's de-facto "latin-1"), unless
   a byte undefined in cp1252 appears (0x81 8D 8F 90 9D), in which
   case ISO-8859-1 (where every byte is defined).  Neither can fail,
   so the ladder is total: every input produces text.

Declared charsets (HTTP ``Content-Type`` or HTML ``<meta>``) are
honored when they parse AND decode strictly — a declaration that
produces decode errors is a lie and falls back to detection
(:func:`decode_declared`).

All detection is per-document and stateless: the Spark surface
(:func:`decode_text`) is a map-only Arrow-batched pandas UDF — no
shuffle, no driver state, scales linearly with executors, same
contract as the PDF/office extraction tiers.

This belongs to the extended training-data scope (the reference
system ingests database records, not crawled bytes); the ladder
derives from the public Unicode/WHATWG encoding standards.
"""

from __future__ import annotations

import codecs
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "detect_decode",
    "decode_declared",
    "charset_from_content_type",
    "charset_from_html",
    "decode_text_column",
    "decode_text",
]

_BOMS = (
    # order matters: UTF-32 BOMs contain UTF-16 BOMs as prefixes
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
    (codecs.BOM_UTF8, "utf-8"),
)

# bytes with no assignment in cp1252; present => the text is some
# other 8-bit family, and ISO-8859-1 (total function) is the honest
# "preserve the bytes" choice
_CP1252_HOLES = frozenset(b"\x81\x8d\x8f\x90\x9d")

_SNIFF = 4096  # detection window: enough for any realistic header/lead


def _utf16_sniff(data: bytes) -> str | None:
    """NUL-pattern byte-order detection over the sniff window.
    ASCII-heavy UTF-16LE has NULs at odd offsets, BE at even; demand a
    strong majority AND strong asymmetry so binary junk with scattered
    NULs falls through to the 8-bit tier."""
    win = data[: _SNIFF]
    if len(win) < 4 or b"\x00" not in win:
        return None
    z_even = win[0::2].count(0)
    z_odd = win[1::2].count(0)
    n_even = len(win[0::2])
    n_odd = len(win[1::2])
    if n_odd and z_odd / n_odd > 0.4 and z_odd > 4 * (z_even + 1):
        return "utf-16-le"
    if n_even and z_even / n_even > 0.4 and z_even > 4 * (z_odd + 1):
        return "utf-16-be"
    return None


def detect_decode(data: bytes) -> tuple[str, str]:
    """``(text, encoding)`` for arbitrary bytes — total (never raises
    on any byte string; only non-bytes input is a ``ValueError``)."""
    if not isinstance(data, (bytes, bytearray)):
        raise ValueError(f"expected bytes, got {type(data).__name__}")
    data = bytes(data)
    for bom, enc in _BOMS:
        if data.startswith(bom):
            return data[len(bom):].decode(enc, errors="replace"), enc
    enc = _utf16_sniff(data)
    if enc is not None:
        return data.decode(enc, errors="replace"), enc
    try:
        return data.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        pass
    if any(b in _CP1252_HOLES for b in set(data[: _SNIFF])):
        return data.decode("iso-8859-1"), "iso-8859-1"
    # cp1252 defines everything outside the five holes — but the tail
    # beyond the sniff window may still contain one, so replace
    return data.decode("cp1252", errors="replace"), "cp1252"


_LABEL_ALIASES = {
    # WHATWG-style label folding for the declarations the web emits
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    "latin1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "l1": "iso-8859-1",
    "iso8859-1": "iso-8859-1",
    "iso_8859-1": "iso-8859-1",
    "ansi_x3.4-1968": "ascii",
    "us-ascii": "ascii",
    "windows-1252": "cp1252",
    "win-1252": "cp1252",
    "x-cp1252": "cp1252",
}


def _normalize_label(label: str) -> str | None:
    lab = label.strip().strip("'\"").lower()
    if not lab:
        return None
    lab = _LABEL_ALIASES.get(lab, lab)
    try:
        info = codecs.lookup(lab)
    except (LookupError, ValueError):
        # ValueError: labels with embedded NULs (hostile declarations)
        return None
    # 'hex', 'base64', 'zlib', 'rot13', ... are REGISTERED codecs that
    # are not text encodings — bytes.decode() raises LookupError for
    # them at DECODE time, which would escape the totality contract
    # (review repro: charset=hex)
    if not getattr(info, "_is_text_encoding", True):
        return None
    return lab


def decode_declared(data: bytes, declared: str | None) -> tuple[str, str]:
    """Honor a declared charset when it is a known codec AND the bytes
    decode strictly under it; otherwise fall back to
    :func:`detect_decode`.  Two byte-evidence overrides, because
    declarations lie in exactly these two ways:

    - a BOM beats any declaration;
    - strictly-valid UTF-8 that actually USES multi-byte sequences
      beats an 8-bit declaration (every 8-bit codec decodes those
      bytes "successfully" into mojibake — `é` -> `Ã©` — the single
      most common declaration lie on the web)."""
    if not isinstance(data, (bytes, bytearray)):
        raise ValueError(f"expected bytes, got {type(data).__name__}")
    data = bytes(data)
    for bom, enc in _BOMS:
        if data.startswith(bom):
            return data[len(bom):].decode(enc, errors="replace"), enc
    lab = _normalize_label(declared) if declared else None
    if lab not in (None, "utf-8") and max(data, default=0) >= 0x80:
        try:
            return data.decode("utf-8"), "utf-8"
        except UnicodeDecodeError:
            pass  # genuinely not UTF-8: the declaration gets its say
    if lab is not None:
        try:
            return data.decode(lab), lab
        except (UnicodeDecodeError, ValueError, LookupError):
            pass  # the declaration lied (or names a non-text codec)
    return detect_decode(data)


_CT_CHARSET = re.compile(r"charset\s*=\s*([^\s;,]+)", re.I)
# both <meta charset=...> and the http-equiv Content-Type form
_META_CHARSET = re.compile(
    rb"<meta[^>]{0,256}?charset\s*=\s*['\"]?([A-Za-z0-9._-]{1,40})", re.I
)


def charset_from_content_type(content_type: str | None) -> str | None:
    """The charset parameter of an HTTP ``Content-Type`` value, or
    None (``text/html; charset=ISO-8859-1`` -> ``ISO-8859-1``)."""
    if not content_type:
        return None
    m = _CT_CHARSET.search(content_type)
    return m.group(1) if m else None


def charset_from_html(data: bytes, window: int = 2048) -> str | None:
    """The first ``<meta charset>`` declaration within the lead
    ``window`` bytes (the WHATWG prescan), or None."""
    if not isinstance(data, (bytes, bytearray)):
        return None
    m = _META_CHARSET.search(bytes(data[:window]))
    return m.group(1).decode("ascii", errors="replace") if m else None


def decode_text_column(
    col: Column | str, declared_col: Column | str | None = None
) -> Column:
    """Struct column ``(text, encoding)`` over a ``binary`` column;
    optional ``declared_col`` (string) feeds :func:`decode_declared`.
    NULL bytes in -> NULL struct fields out."""

    @F.pandas_udf("text string, encoding string")
    def detect(c: pd.Series) -> pd.DataFrame:
        texts, encs = [], []
        for v in c:
            if v is None:
                texts.append(None)
                encs.append(None)
            else:
                t, e = detect_decode(bytes(v))
                texts.append(t)
                encs.append(e)
        return pd.DataFrame({"text": texts, "encoding": encs})

    @F.pandas_udf("text string, encoding string")
    def declared(c: pd.Series, d: pd.Series) -> pd.DataFrame:
        texts, encs = [], []
        for v, lab in zip(c, d):
            if v is None:
                texts.append(None)
                encs.append(None)
            else:
                t, e = decode_declared(
                    bytes(v), None if lab is None else str(lab)
                )
                texts.append(t)
                encs.append(e)
        return pd.DataFrame({"text": texts, "encoding": encs})

    c = F.col(col) if isinstance(col, str) else col
    if declared_col is None:
        return detect(c)
    d = (
        F.col(declared_col)
        if isinstance(declared_col, str)
        else declared_col
    )
    return declared(c, d)


def decode_text(
    docs: DataFrame,
    content_col: str = "content",
    out_col: str = "text",
    encoding_col: str = "encoding",
    declared_col: str | None = None,
) -> DataFrame:
    """``docs`` with ``out_col`` (decoded text) and ``encoding_col``
    (the encoding actually used) added.  Total: every non-NULL byte
    string decodes (worst case with U+FFFD replacements), so there is
    no quarantine column — mojibake is a quality-filter concern
    downstream, not an ingest failure.  Map-only, Arrow-batched."""
    tmp = "_charset_decode"
    res = docs.withColumn(
        tmp, decode_text_column(content_col, declared_col)
    )
    return (
        res.withColumn(out_col, F.col(tmp)["text"])
        .withColumn(encoding_col, F.col(tmp)["encoding"])
        .drop(tmp)
    )


def unicode_normalize(col: Column | str, form: str = "NFC") -> Column:
    """Unicode-normalize a string column (NULL passes through).

    Dedup-prep: the same visible text arrives from the web in composed
    and decomposed spellings (``é`` vs ``e``+U+0301) and exact/hash
    dedup treats them as different documents — NFC is the standard
    canonical form (NFKC additionally folds compatibility characters:
    ligatures, full-width forms; more aggressive, lossy).  Python-side
    by necessity (Spark has no normalization expression), but
    Arrow-batched and map-only like the rest of the ingest tiers."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"form must be NFC/NFD/NFKC/NFKD, got {form!r}")
    import unicodedata

    @F.pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None if v is None else unicodedata.normalize(form, v)
        )

    return norm(F.col(col) if isinstance(col, str) else col)
