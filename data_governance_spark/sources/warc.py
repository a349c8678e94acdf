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
