"""Binary WARC reader + HTTP content-encoding decode
(sources/warc.py read_warc_binary / decode_http_payload /
warc_documents_binary): spec framing via Content-Length (the
false-split caveat of the string reader closed), chunked
transfer-encoding, gzip/deflate/br bodies, charset composition, and
quarantine rows for framing violations."""

from __future__ import annotations

import gzip
import zlib

import pyarrow as pa
import pytest

from data_governance_spark.sources.warc import (
    decode_http_payload,
    read_warc_binary,
    warc_documents_binary,
)


def _record(wtype: str, uri: str, rid: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Length: {len(payload)}\r\n"
    ).encode()
    return head + b"\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, *headers: str) -> bytes:
    head = "HTTP/1.1 200 OK\r\n" + "".join(h + "\r\n" for h in headers)
    return head.encode() + b"\r\n" + body


def _chunked(body: bytes, size: int = 7) -> bytes:
    out = bytearray()
    for i in range(0, len(body), size):
        chunk = body[i: i + size]
        out += f"{len(chunk):x}".encode() + b"\r\n" + chunk + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)


_BR = lambda b: bytes(pa.Codec("brotli", compression_level=5).compress(b))  # noqa: E731


# --------------------------------------------------- decode_http_payload
def test_plain_and_wet_passthrough():
    assert decode_http_payload(b"bare wet text") == (b"bare wet text", None, None)
    body, ctype, err = decode_http_payload(_http(b"hello", "Content-Type: text/html"))
    assert (body, ctype, err) == (b"hello", "text/html", None)


def test_gzip_deflate_br_bodies():
    raw = b"the decoded body contents " * 20
    for enc, blob in (
        ("gzip", gzip.compress(raw, mtime=0)),
        ("deflate", zlib.compress(raw)),                  # zlib-wrapped
        ("deflate", (lambda c: c.compress(raw) + c.flush())(
            zlib.compressobj(wbits=-15))),                # raw (historical)
        ("br", _BR(raw)),
    ):
        body, _, err = decode_http_payload(
            _http(blob, f"Content-Encoding: {enc}")
        )
        assert err is None, (enc, err)
        assert body == raw, enc


def test_chunked_then_gzip():
    raw = b"chunked and gzipped payload " * 10
    payload = _http(
        _chunked(gzip.compress(raw, mtime=0), 11),
        "Transfer-Encoding: chunked",
        "Content-Encoding: gzip",
    )
    body, _, err = decode_http_payload(payload)
    assert err is None
    assert body == raw


def test_bad_encoding_quarantines_not_mangles():
    body, _, err = decode_http_payload(
        _http(b"\xff\xfenot really brotli", "Content-Encoding: br")
    )
    assert err is not None and err.startswith("http-br:")
    assert body == b"\xff\xfenot really brotli"  # raw, not garbage
    body, _, err = decode_http_payload(
        _http(b"x", "Content-Encoding: zstd-unknown")
    )
    assert err.startswith("http-encoding-unsupported")


def test_chunked_truncation_typed():
    payload = _http(b"b\r\nshort", "Transfer-Encoding: chunked")
    body, _, err = decode_http_payload(payload)
    assert err is not None and err.startswith("http-chunked")


def test_headers_only_response():
    assert decode_http_payload(b"HTTP/1.1 304 Not Modified\r\nETag: x")[0] == b""


# ----------------------------------------------------- read_warc_binary
@pytest.fixture()
def warc_file(tmp_path):
    raw = b"the brotli-encoded crawl body: " * 30
    records = (
        _record("warcinfo", "", "<urn:info>", b"software: test")
        + _record(
            "response", "http://a.example/br", "<urn:r1>",
            _http(_BR(raw), "Content-Encoding: br",
                  "Content-Type: text/html; charset=utf-8"),
        )
        + _record(
            "response", "http://a.example/plain", "<urn:r2>",
            _http("unicode köröper".encode(), "Content-Type: text/plain; charset=utf-8"),
        )
        + _record(
            "conversion", "http://a.example/wet", "<urn:r3>",
            b"wet extract text",
        )
        # payload containing the record marker: spec framing must NOT
        # false-split (the string reader's documented caveat)
        + _record(
            "response", "http://a.example/tricky", "<urn:r4>",
            _http(b"body mentions WARC/1.0\r\n\r\nliterally"),
        )
    )
    p = tmp_path / "t.warc"
    p.write_bytes(records)
    return str(p), raw


def test_read_warc_binary_frames_exactly(spark, warc_file):
    path, _ = warc_file
    rows = {r["record_id"]: r for r in read_warc_binary(spark, path).collect()}
    assert len(rows) == 5 and all(r["err"] is None for r in rows.values())
    assert bytes(rows["<urn:r4>"]["body"]).endswith(b"literally")


def test_read_warc_binary_gz_whole_file(spark, tmp_path, warc_file):
    path, _ = warc_file
    gz = tmp_path / "t2.warc.gz"
    gz.write_bytes(gzip.compress(open(path, "rb").read(), mtime=0))
    rows = read_warc_binary(spark, str(gz)).collect()
    assert len(rows) == 5 and all(r["err"] is None for r in rows)


def test_read_warc_binary_quarantines_bad_framing(spark, tmp_path):
    p = tmp_path / "bad.warc"
    p.write_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nno length")
    rows = read_warc_binary(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0]["err"].startswith("WarcParseError")


def test_warc_documents_binary_end_to_end(spark, warc_file):
    path, raw = warc_file
    docs = {r["url"]: r for r in warc_documents_binary(spark, path).collect()}
    assert docs["http://a.example/br"]["text"] == raw.decode()
    assert docs["http://a.example/br"]["err"] is None
    assert docs["http://a.example/plain"]["text"] == "unicode köröper"
    assert docs["http://a.example/wet"]["text"] == "wet extract text"
    # doc_ids stable + distinct
    ids = [r["doc_id"] for r in docs.values()]
    assert len(set(ids)) == len(ids)
