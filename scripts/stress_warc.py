#!/usr/bin/env python
"""Measured evidence for the binary WARC tier (sources/warc.py):

1. record framing throughput (records/s, MB/s) over a synthetic
   multi-record WARC with realistic header blocks,
2. HTTP body decode throughput per content-encoding
   (identity / gzip / deflate / br-native / chunked+gzip),
3. end-to-end ``warc_documents_binary`` docs/s on local[32].

Usage: python scripts/stress_warc.py [factor]  (default 4)
"""

from __future__ import annotations

import gzip
import os
import random
import sys
import time
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyarrow as pa  # noqa: E402

from data_governance_spark.session import get_spark  # noqa: E402
from data_governance_spark.sources.warc import (  # noqa: E402
    decode_http_payload,
    warc_documents_binary,
)

_WORDS = [w.encode() for w in (
    "the of and to in a is that for it as was with be by on not he "
    "this are or his from at which but have an they you were her all "
    "she there would their we him been has information development"
).split()]


def _page(rng: random.Random, n_words: int = 3000) -> bytes:
    return b" ".join(rng.choice(_WORDS) for _ in range(n_words))


def _record(wtype: str, uri: str, rid: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {uri}\r\n"
        f"WARC-Record-ID: {rid}\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Length: {len(payload)}\r\n"
    ).encode()
    return head + b"\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, *headers: str) -> bytes:
    head = "HTTP/1.1 200 OK\r\n" + "".join(h + "\r\n" for h in headers)
    return head.encode() + b"\r\n" + body


def _chunked(body: bytes, size: int = 1024) -> bytes:
    out = bytearray()
    for i in range(0, len(body), size):
        c = body[i: i + size]
        out += f"{len(c):x}".encode() + b"\r\n" + c + b"\r\n"
    return bytes(out + b"0\r\n\r\n")


def _br(b: bytes) -> bytes:
    return bytes(pa.Codec("brotli", compression_level=5).compress(b))


def build_warc(rng: random.Random, n_records: int) -> bytes:
    recs = []
    for i in range(n_records):
        page = _page(rng)
        kind = i % 5
        if kind == 0:
            payload = _http(page, "Content-Type: text/plain; charset=utf-8")
        elif kind == 1:
            payload = _http(gzip.compress(page, mtime=0),
                            "Content-Encoding: gzip",
                            "Content-Type: text/html")
        elif kind == 2:
            payload = _http(_br(page), "Content-Encoding: br",
                            "Content-Type: text/html; charset=utf-8")
        elif kind == 3:
            payload = _http(_chunked(gzip.compress(page, mtime=0)),
                            "Transfer-Encoding: chunked",
                            "Content-Encoding: gzip")
        else:
            payload = page  # WET-style conversion record
        recs.append(_record(
            "response" if kind != 4 else "conversion",
            f"http://ex.com/{i}", f"<urn:r{i}>", payload,
        ))
    return b"".join(recs)


def phase1_decode_core(rng: random.Random) -> None:
    print("phase 1: decode_http_payload per encoding (1-core)")
    page = _page(rng, 40000)  # ~250 KB page
    cases = {
        "identity": _http(page, "Content-Type: text/plain"),
        "gzip": _http(gzip.compress(page, mtime=0), "Content-Encoding: gzip"),
        "deflate": _http(zlib.compress(page), "Content-Encoding: deflate"),
        "br(native)": _http(_br(page), "Content-Encoding: br"),
        "chunked+gzip": _http(_chunked(gzip.compress(page, mtime=0)),
                              "Transfer-Encoding: chunked",
                              "Content-Encoding: gzip"),
    }
    decode_http_payload(cases["gzip"])  # warm lazy imports once
    for name, payload in cases.items():
        reps = 40
        t0 = time.time()
        for _ in range(reps):
            body, _, err = decode_http_payload(payload)
        w = time.time() - t0
        assert err is None and body == page, name
        mb = reps * len(page) / 1e6
        print(f"  {name}: {mb / w:.0f} MB/s decoded body")


def phase2_spark(factor: int) -> None:
    rng = random.Random(7)
    n_files = 8 * factor
    recs_per_file = 400
    spark = get_spark("stress_warc", shuffle_partitions=32)
    import tempfile

    d = tempfile.mkdtemp(prefix="dg_warc_stress_")
    total_bytes = 0
    for i in range(n_files):
        blob = build_warc(rng, recs_per_file)
        total_bytes += len(blob)
        with open(os.path.join(d, f"f{i}.warc"), "wb") as f:
            f.write(blob)
    print(
        f"phase 2: {n_files} files x {recs_per_file} records "
        f"({total_bytes / 1e6:.0f} MB) on local[32]"
    )
    docs = warc_documents_binary(spark, d + "/*.warc")
    expr = ["count(*) as n", "sum(if(err is not null, 1, 0)) as e"]
    docs.selectExpr(*expr).collect()  # warm: JVM listing + py workers
    t0 = time.time()
    n, nerr = docs.selectExpr(*expr).collect()[0]
    w = time.time() - t0
    print(
        f"  end-to-end (warm): {n} docs in {w:.1f}s = "
        f"{n / w / 1e3:.1f}k docs/s, "
        f"{total_bytes / w / 1e6:.0f} MB/s raw warc; decode errs {nerr}"
    )
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    phase1_decode_core(random.Random(3))
    phase2_spark(factor)


if __name__ == "__main__":
    main()
