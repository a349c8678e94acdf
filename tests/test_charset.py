"""Charset detection/transcoding (operators/charset.py): the
detection ladder (BOM > NUL-pattern UTF-16 > strict UTF-8 > 8-bit
fallback), declaration honoring with the two byte-evidence overrides,
label normalization, HTML/HTTP charset extraction, totality fuzz, and
the Spark operator."""

from __future__ import annotations

import codecs

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.charset import (
    charset_from_content_type,
    charset_from_html,
    decode_declared,
    decode_text,
    detect_decode,
)


class TestDetect:
    def test_utf8_and_ascii(self):
        assert detect_decode(b"plain ascii") == ("plain ascii", "utf-8")
        assert detect_decode("héllo ≠ wörld".encode()) == (
            "héllo ≠ wörld",
            "utf-8",
        )
        assert detect_decode(b"") == ("", "utf-8")

    def test_boms_win_and_strip(self):
        boms = {
            "utf-8": codecs.BOM_UTF8,
            "utf-16-le": codecs.BOM_UTF16_LE,
            "utf-16-be": codecs.BOM_UTF16_BE,
            "utf-32-le": codecs.BOM_UTF32_LE,
            "utf-32-be": codecs.BOM_UTF32_BE,
        }
        for enc, bom in boms.items():
            data = bom + "text".encode(enc)
            assert detect_decode(data) == ("text", enc), enc

    def test_utf32_bom_not_mistaken_for_utf16(self):
        data = codecs.BOM_UTF32_LE + "x".encode("utf-32-le")
        assert detect_decode(data)[1] == "utf-32-le"

    def test_bomless_utf16_nul_pattern(self):
        s = "ordinary web page text, mostly ascii"
        assert detect_decode(s.encode("utf-16-le")) == (s, "utf-16-le")
        assert detect_decode(s.encode("utf-16-be")) == (s, "utf-16-be")

    def test_utf16_sniff_beats_utf8_probe(self):
        # UTF-16LE ASCII is VALID UTF-8 (NULs are legal) — the ladder
        # must classify it as UTF-16, not UTF-8-with-NULs
        data = "would pass a utf-8 probe".encode("utf-16-le")
        data.decode("utf-8")  # proves the trap exists
        assert detect_decode(data)[1] == "utf-16-le"

    def test_scattered_nuls_do_not_sniff_as_utf16(self):
        # binary junk with a few NULs must fall through to 8-bit
        data = b"abc\x00defghij\x00klmnop\xe9qrstuv"
        text, enc = detect_decode(data)
        assert enc == "cp1252"

    def test_8bit_fallback_cp1252_vs_latin1(self):
        assert detect_decode("café".encode("latin-1"))[1] == "cp1252"
        # 0x93/0x94 are curly quotes in cp1252, undefined in latin-1's
        # printable story — cp1252 is the right default
        assert detect_decode(b"\x93quoted\x94") == ("“quoted”", "cp1252")
        # a cp1252 hole byte forces ISO-8859-1 (total, byte-preserving)
        text, enc = detect_decode(b"hole \x8d here")
        assert enc == "iso-8859-1"
        assert text == "hole \x8d here"

    def test_non_bytes_raises(self):
        with pytest.raises(ValueError, match="expected bytes"):
            detect_decode("already text")  # type: ignore[arg-type]


class TestDeclared:
    def test_honored_when_valid(self):
        t, e = decode_declared("Résumé".encode("latin-1"), "ISO-8859-1")
        assert (t, e) == ("Résumé", "iso-8859-1")
        t, e = decode_declared("Résumé".encode("cp1252"), "windows-1252")
        assert (t, e) == ("Résumé", "cp1252")

    def test_label_aliases_and_junk_labels(self):
        assert decode_declared(b"x", "UTF8")[1] == "utf-8"
        assert decode_declared(b"x", "latin1")[1] == "iso-8859-1"
        assert decode_declared(b"x", '"utf-8"')[1] == "utf-8"
        # unknown label -> detection
        assert decode_declared(b"x", "klingon-8")[1] == "utf-8"
        assert decode_declared(b"x", None)[1] == "utf-8"
        assert decode_declared(b"x", "")[1] == "utf-8"

    def test_lying_declaration_falls_back(self):
        # declared utf-8 but bytes are latin-1 -> strict decode fails
        # -> detection
        t, e = decode_declared("Résumé".encode("latin-1"), "utf-8")
        assert (t, e) == ("Résumé", "cp1252")

    def test_multibyte_utf8_beats_8bit_declaration(self):
        # the web's most common lie: real UTF-8 declared as latin-1.
        # An 8-bit decode would "succeed" as mojibake (é -> Ã©)
        t, e = decode_declared("Résumé café".encode("utf-8"), "ISO-8859-1")
        assert (t, e) == ("Résumé café", "utf-8")
        # pure ASCII: the declaration is harmless — honor it
        t, e = decode_declared(b"plain", "ISO-8859-1")
        assert (t, e) == ("plain", "iso-8859-1")

    def test_bom_beats_declaration(self):
        data = codecs.BOM_UTF16_LE + "x".encode("utf-16-le")
        assert decode_declared(data, "ISO-8859-1")[1] == "utf-16-le"

    def test_utf16_declaration_honored(self):
        s = "declared utf-16 content"
        t, e = decode_declared(s.encode("utf-16-le"), "utf-16-le")
        assert (t, e) == (s, "utf-16-le")


class TestExtraction:
    def test_content_type(self):
        assert charset_from_content_type(
            "text/html; charset=ISO-8859-1"
        ) == "ISO-8859-1"
        assert charset_from_content_type(
            'text/html;charset="utf-8"; boundary=x'
        ) == '"utf-8"'  # quotes stripped later by _normalize_label
        assert charset_from_content_type("text/html") is None
        assert charset_from_content_type(None) is None

    def test_html_meta(self):
        assert charset_from_html(
            b'<html><head><meta charset="utf-8"></head>'
        ) == "utf-8"
        assert charset_from_html(
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=windows-1252">'
        ) == "windows-1252"
        assert charset_from_html(b"<html>no meta</html>") is None
        # outside the prescan window -> not found
        page = b"<p>" + b"x" * 4096 + b'</p><meta charset="utf-8">'
        assert charset_from_html(page) is None
        assert charset_from_html(None) is None  # type: ignore[arg-type]


class TestFuzz:
    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=1024))
    def test_detect_is_total(self, data):
        text, enc = detect_decode(data)
        assert isinstance(text, str)
        assert enc in (
            "utf-8", "utf-16-le", "utf-16-be", "utf-32-le", "utf-32-be",
            "cp1252", "iso-8859-1",
        )

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=512), st.text(max_size=12))
    def test_declared_is_total(self, data, label):
        text, enc = decode_declared(data, label)
        assert isinstance(text, str) and isinstance(enc, str)

    @settings(max_examples=150, deadline=None)
    @given(st.text(max_size=200))
    def test_utf8_round_trip(self, s):
        text, enc = detect_decode(s.encode("utf-8"))
        # NUL-heavy or BOM-leading text may legitimately classify
        # otherwise; everything else must round-trip exactly
        if enc == "utf-8" and not s.startswith("﻿"):
            assert text == s


class TestSparkOperator:
    def test_decode_text_mixed(self, spark):
        rows = [
            ("u8", "héllo".encode("utf-8"), None),
            ("l1", "Résumé".encode("latin-1"), None),
            ("w16", "wide text goes here".encode("utf-16-le"), None),
            ("dec", "Résumé".encode("latin-1"), "ISO-8859-1"),
            ("lie", "Résumé".encode("utf-8"), "ISO-8859-1"),
            ("nul", None, None),
        ]
        df = spark.createDataFrame(
            rows, "doc_id string, content binary, declared string"
        )
        out = decode_text(df, declared_col="declared")
        got = {r["doc_id"]: (r["text"], r["encoding"])
               for r in out.collect()}
        assert got["u8"] == ("héllo", "utf-8")
        assert got["l1"] == ("Résumé", "cp1252")
        assert got["w16"] == ("wide text goes here", "utf-16-le")
        assert got["dec"] == ("Résumé", "iso-8859-1")
        assert got["lie"] == ("Résumé", "utf-8")
        assert got["nul"] == (None, None)

    def test_decode_text_without_declared(self, spark):
        df = spark.createDataFrame(
            [("a", "plain".encode())], "doc_id string, content binary"
        )
        r = decode_text(df).collect()[0]
        assert (r["text"], r["encoding"]) == ("plain", "utf-8")


class TestUnicodeNormalize:
    def test_nfc_composes(self, spark):
        from data_governance_spark.operators.charset import (
            unicode_normalize,
        )

        rows = [
            ("a", "Café niño Å"),
            ("b", "already café"),
            ("c", None),
            ("d", "ﬁne"),  # fi ligature: NFC keeps, NFKC folds
        ]
        df = spark.createDataFrame(rows, "k string, s string")
        nfc = {
            r["k"]: r["n"]
            for r in df.select(
                "k", unicode_normalize("s").alias("n")
            ).collect()
        }
        assert nfc["a"] == "Café niño Å"
        assert nfc["b"] == "already café"
        assert nfc["c"] is None
        assert nfc["d"] == "ﬁne"
        nfkc = df.select(
            "k", unicode_normalize("s", "NFKC").alias("n")
        ).collect()
        assert {r["k"]: r["n"] for r in nfkc}["d"] == "fine"
        import pytest as _pytest

        with _pytest.raises(ValueError, match="form"):
            unicode_normalize("s", "NFX")


class TestNonTextCodecLabels:
    def test_registered_non_text_codecs_fall_back(self):
        # 'hex'/'base64'/'rot13'/... pass codecs.lookup but raise
        # LookupError at bytes.decode() time — the totality contract
        # must hold (review repro: charset=hex)
        for label in ("hex", "base64", "zlib", "rot13", "uu", "bz2"):
            t, e = decode_declared(b"hello world", label)
            assert (t, e) == ("hello world", "utf-8"), label
        t, e = decode_declared("Résumé".encode("latin-1"), "hex")
        assert e == "cp1252"
