"""WARC (Web ARChive, ISO 28500) source — the Common Crawl format,
read with zero UDFs.

A WARC file is a concatenation of records, each:

    WARC/1.0\r\n
    <Name>: <value>\r\n ... (WARC headers)
    \r\n
    <payload>\r\n\r\n

``spark.read.text`` with ``lineSep="WARC/1.0\\r\\n"`` splits the file
into one row per record at scan time (the JVM text reader does the
splitting — records never pass through Python), and header fields /
payload come out with ordinary column expressions. The result maps
straight onto the ``documents`` ingest schema.

Compression caveat (stated, not hidden): Common Crawl ships
``.warc.gz`` with **per-record** gzip members; Spark's codec path
decompresses whole files, which concatenates the members correctly
(gzip is concatenation-closed) but makes the file non-splittable — one
task per file. That is exactly how every JVM-based Common Crawl reader
without a custom InputFormat behaves; for splittable scale-out,
recompress to uncompressed/zstd-framed WARC or bucket into many files
(Common Crawl's 1 GB segment files already are many files — the
parallelism unit is the file, and 100 TB is ~100k files, plenty).

HTTP ``response`` records carry "HTTP/1.1 200 OK\\r\\nheaders\\r\\n\\r\\n
body" as payload; ``http_body`` strips that envelope. ``conversion``
records (Common Crawl's WET text extracts) carry bare text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Split on the version prefix, not a full pinned version: records then
# begin "0\r\n..." / "1\r\n..." and both WARC/1.0 and WARC/1.1 (the
# current ISO 28500 revision) parse. Known limitation of separator
# splitting (stated): a payload that itself contains the literal
# marker bytes (a page ABOUT web archiving) false-splits that record —
# the corrupted fragment drops at the warc_type filter, the remainder
# surfaces as a bogus record. Record-framed parsing needs a custom
# InputFormat; every lineSep-based reader shares this trade.
_RECORD_SEP = "WARC/1."
_HDR_BODY_SEP = "\r\n\r\n"


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """One row per WARC record: ``warc_type, target_uri, record_id,
    content_length, date, headers, payload``.

    The leading splinter row (bytes before the first record marker,
    usually empty) is dropped, as are rows with no parsable header
    block.
    """
    raw = spark.read.option("lineSep", _RECORD_SEP).text(path)
    # strip the residual version digits + CRLF ("0\r\n" / "1\r\n")
    rec = F.regexp_replace(F.col("value"), r"^[0-9]+\r\n", "")
    sep_pos = F.instr(rec, _HDR_BODY_SEP)
    headers = F.when(sep_pos > 0, rec.substr(F.lit(1), sep_pos - 1))
    payload = F.when(sep_pos > 0, rec.substr(sep_pos + 4, F.length(rec)))

    def hdr(name: str):
        # header values end at CR; (?m) anchors ^ per line
        return F.regexp_extract(headers, f"(?m)^{name}: ([^\r\n]*)", 1)

    out = (
        raw.filter(sep_pos > 0)
        .select(
            hdr("WARC-Type").alias("warc_type"),
            hdr("WARC-Target-URI").alias("target_uri"),
            hdr("WARC-Record-ID").alias("record_id"),
            hdr("Content-Length").cast("long").alias("content_length"),
            hdr("WARC-Date").alias("date"),
            headers.alias("headers"),
            # trailing record terminator (\r\n\r\n or a tail \r\n) is
            # framing, not payload
            F.regexp_replace(payload, r"(\r\n)+$", "").alias("payload"),
        )
        .filter(F.col("warc_type") != "")
    )
    return out


def http_body(payload_col):
    """Strip the HTTP response envelope from a ``response`` record's
    payload (everything through the first blank line); payloads without
    an envelope (WET conversion records) pass through unchanged.

    Empty-body responses (204/304/redirects — common in any real
    crawl) have had their envelope-terminating blank line consumed by
    read_warc's trailing-CRLF strip, so instr finds no separator:
    those yield '' rather than a garbled substring of the headers."""
    c = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    pos = F.instr(c, _HDR_BODY_SEP)
    stripped = F.when(pos > 0, c.substr(pos + 4, F.length(c))).otherwise(
        F.lit("")
    )
    return F.when(c.startswith("HTTP/"), stripped).otherwise(c)


class WarcParseError(ValueError):
    """Record framing violated (binary reader)."""


_MAX_WARC_RECORD = 64 * 1024 * 1024
_HTTP_BODY_CAP = 64 * 1024 * 1024


def read_warc_binary(
    spark: SparkSession,
    path: str,
    max_record: int = _MAX_WARC_RECORD,
) -> DataFrame:
    """Record-framed BINARY WARC reader — the path for ``response``
    records whose bodies are content-encoded (gzip/brotli) or
    transfer-chunked, which the string reader necessarily mangles
    (``spark.read.text`` decodes bytes as UTF-8).

    Framing follows ISO 28500 exactly: each record is a header block,
    ``Content-Length`` payload BYTES, then CRLF CRLF — so unlike the
    separator-splitting string reader, a payload containing the
    literal ``WARC/1.`` marker does NOT false-split (the spec framing
    caveat of ``read_warc`` closed).  ``.warc.gz`` whole-file /
    per-record-member compression is handled first (gzip is
    concatenation-closed; bounded by the archive tier's shared
    incremental decompressor).  One row per record:
    ``(warc_type, target_uri, record_id, date, http_headers, body,
    err)`` where ``body`` is raw payload BYTES and framing violations
    quarantine the remainder of that FILE as one err row (documents
    never vanish silently).  Parallelism unit is the file, as for
    every record-framed WARC reader."""
    import pandas as pd

    from data_governance_spark.operators.archives import (
        ArchiveError,
        bounded_decompress,
    )

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def _records(data: bytes):
        pos = 0
        n = len(data)
        while pos < n:
            # skip inter-record padding
            while pos < n and data[pos: pos + 1] in (b"\r", b"\n"):
                pos += 1
            if pos >= n:
                return
            if data[pos: pos + 7] != b"WARC/1.":
                raise WarcParseError(f"bad record marker at {pos}")
            hdr_end = data.find(b"\r\n\r\n", pos)
            if hdr_end < 0:
                raise WarcParseError("unterminated header block")
            headers = data[pos:hdr_end].decode("latin-1")
            m = {}
            for line in headers.split("\r\n")[1:]:
                k, _, v = line.partition(":")
                m[k.strip().lower()] = v.strip()
            try:
                clen = int(m.get("content-length", ""))
            except ValueError:
                raise WarcParseError("missing/bad Content-Length") from None
            if clen < 0 or clen > max_record:
                raise WarcParseError(f"record length {clen} out of range")
            body_start = hdr_end + 4
            if body_start + clen > n:
                raise WarcParseError("payload truncated")
            yield m, data[body_start: body_start + clen]
            pos = body_start + clen

    def run(batches):
        cols = ["warc_type", "target_uri", "record_id", "date",
                "body", "err"]
        for pdf in batches:
            rows = []
            for pth, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    try:
                        data = bounded_decompress(
                            data, "gzip", max_out=4 * max_record
                        )
                    except ArchiveError as e:
                        rows.append(
                            {c: None for c in cols}
                            | {"err": f"{type(e).__name__}: {e}"}
                        )
                        continue
                try:
                    for m, body in _records(data):
                        rows.append({
                            "warc_type": m.get("warc-type"),
                            "target_uri": m.get("warc-target-uri"),
                            "record_id": m.get("warc-record-id"),
                            "date": m.get("warc-date"),
                            "body": body,
                            "err": None,
                        })
                except WarcParseError as e:
                    rows.append(
                        {c: None for c in cols}
                        | {"err": f"WarcParseError: {e}"}
                    )
            yield pd.DataFrame(
                rows,
                columns=cols,
            )

    return files.mapInPandas(
        run,
        "warc_type string, target_uri string, record_id string, "
        "date string, body binary, err string",
    )


def decode_http_payload(payload: bytes) -> tuple[bytes, str | None, str | None]:
    """(body bytes, content-type header, error) for one HTTP response
    payload: envelope split, ``Transfer-Encoding: chunked`` de-chunked,
    ``Content-Encoding`` gzip/x-gzip/deflate/br decoded (deflate tries
    zlib-wrapped then raw — the historical HTTP ambiguity), identity
    passed through; unknown encodings and decode failures return the
    raw body with a typed error string instead of mangled bytes."""
    from data_governance_spark.operators.archives import (
        ArchiveError,
        bounded_decompress,
    )
    from data_governance_spark.operators.brotli import (
        BrotliError,
        brotli_decompress_auto,
    )

    if not payload.startswith(b"HTTP/"):
        return payload, None, None  # WET / bare payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return b"", None, None  # headers-only (204/304)
    head = payload[:sep].decode("latin-1")
    body = payload[sep + 4:]
    h = {}
    for line in head.split("\r\n")[1:]:
        k, _, v = line.partition(":")
        h[k.strip().lower()] = v.strip()
    ctype = h.get("content-type")
    if "chunked" in h.get("transfer-encoding", "").lower():
        out = bytearray()
        pos = 0
        try:
            while True:
                eol = body.index(b"\r\n", pos)
                size = int(
                    body[pos:eol].split(b";")[0].strip() or b"-1", 16
                )
                if size < 0:
                    raise ValueError("bad chunk size")
                if size == 0:
                    break
                if len(out) + size > _HTTP_BODY_CAP:
                    return body, ctype, "http-chunk-bomb"
                start = eol + 2
                if start + size > len(body):
                    raise ValueError("chunk truncated")
                out += body[start: start + size]
                pos = start + size + 2  # skip chunk CRLF
        except ValueError as e:
            return body, ctype, f"http-chunked: {e}"
        body = bytes(out)
    import zlib

    enc = h.get("content-encoding", "identity").lower().strip()
    if enc in ("", "identity"):
        return body, ctype, None
    try:
        if enc in ("gzip", "x-gzip"):
            return (
                bounded_decompress(body, "gzip", max_out=_HTTP_BODY_CAP),
                ctype,
                None,
            )
        if enc == "deflate":
            try:
                return zlib.decompress(body, zlib.MAX_WBITS), ctype, None
            except zlib.error:
                return zlib.decompress(body, -zlib.MAX_WBITS), ctype, None
        if enc == "br":
            return (
                brotli_decompress_auto(body, max_out=_HTTP_BODY_CAP),
                ctype,
                None,
            )
    except (ArchiveError, BrotliError) as e:
        return body, ctype, f"http-{enc}: {type(e).__name__}"
    except zlib.error:
        return body, ctype, "http-deflate: zlib.error"
    return body, ctype, f"http-encoding-unsupported: {enc}"


def warc_documents_binary(spark: SparkSession, path: str) -> DataFrame:
    """The real-crawl ingest composition: binary record framing →
    HTTP envelope/chunked/content-encoding decode → charset detection
    (``operators/charset.decode_declared``, honoring the Content-Type
    charset) → ``(doc_id, url, text, enc, err)``.  This is where the
    brotli tier earns its keep — ``Content-Encoding: br`` is brotli's
    main habitat."""
    import pandas as pd

    from data_governance_spark.operators.charset import (
        charset_from_content_type,
        decode_declared,
    )

    rec = read_warc_binary(spark, path).filter(
        F.col("err").isNull()
        & F.col("warc_type").isin("conversion", "response")
    )

    def run(batches):
        for pdf in batches:
            out = {"url": [], "text": [], "enc": [], "err": [],
                   "_key": []}
            for uri, rid, body in zip(
                pdf["target_uri"], pdf["record_id"], pdf["body"]
            ):
                body = bytes(body) if body is not None else b""
                decoded, ctype, err = decode_http_payload(body)
                declared = charset_from_content_type(ctype)
                text, enc = decode_declared(decoded, declared)
                out["url"].append(uri)
                out["text"].append(text)
                out["enc"].append(enc)
                out["err"].append(err)
                if rid:
                    out["_key"].append(rid)
                else:
                    # no WARC-Record-ID: content digest, not length —
                    # two same-URI no-id records must not collide
                    import hashlib

                    out["_key"].append(
                        f"noid:{uri}:{hashlib.md5(body).hexdigest()}"
                    )
            yield pd.DataFrame(out)

    rows = rec.mapInPandas(
        run, "url string, text string, enc string, err string, _key string"
    )
    return rows.select(
        F.xxhash64("_key").alias("doc_id"),
        "url",
        "text",
        "enc",
        "err",
    )


def warc_documents(spark: SparkSession, path: str) -> DataFrame:
    """WET/response records as the engine's ``documents`` ingest shape:
    ``doc_id`` (stable hash of record id), ``url``, ``text``."""
    rec = read_warc(spark, path).filter(
        F.col("warc_type").isin("conversion", "response")
    )
    # records missing WARC-Record-ID (extract returns '') must NOT all
    # collapse onto xxhash64('') — fall back to a content+URI hash
    rid = F.col("record_id")
    key = F.when(rid != "", rid).otherwise(
        F.concat(F.lit("noid:"), F.col("target_uri"), F.lit(":"), F.col("payload"))
    )
    return rec.select(
        F.xxhash64(key).alias("doc_id"),
        F.col("target_uri").alias("url"),
        http_body("payload").alias("text"),
    )
