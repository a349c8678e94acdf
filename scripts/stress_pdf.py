#!/usr/bin/env python
"""PDF tier throughput (DEPLOY.md evidence, r12): text extraction,
rev 2/3 RC4 decryption, and embedded-image extraction are all
Arrow-batched Python passes (operators/pdf.py), so they owe docs/sec
numbers — including how much the decrypt pass costs on top of parse,
and the quarantine behavior under a corrupt-file mix.

Builds five realistic variants with the TEST SUITE's spec writers
(plain text, Flate multi-page, RC4-encrypted Flate, two embedded
images incl. a G4 fax scan, and garbage bytes), duplicates them to
``5000 x FACTOR`` rows, and times extract_pdf_text / extract_pdf_images
over the mix.

Usage: python scripts/stress_pdf.py [factor]   (default 8)
"""

from __future__ import annotations

import os
import sys
import time
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))  # spec-writer imports

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.operators.pdf import (  # noqa: E402
    extract_pdf_images,
    extract_pdf_text,
)
from data_governance_spark.session import get_spark  # noqa: E402

BASE_DOCS = 5000


def _variants():
    from tests.test_ccitt import _rand_bw, g4_encode
    from tests.test_jpeg_codec import _smooth, jpeg_bytes
    from tests.test_pdf import (
        build_pdf,
        encrypted_pdf,
        simple_pdf,
        stream_body,
    )

    text = (
        b"BT /F1 12 Tf 72 720 Td (A realistic paragraph of scanned "
        b"report prose) Tj 0 -14 Td [(kerned) -250 (words) -10 "
        b"( follow)] TJ ET"
    )
    plain = simple_pdf(text)
    # genuinely MULTI-PAGE flate: three pages, three content streams —
    # exercises the page-tree walk per doc, not just one page repeated
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    kids = []
    for i in range(3):
        pnum, cnum = 10 + 2 * i, 11 + 2 * i
        kids.append(f"{pnum} 0 R".encode())
        objs[pnum] = (
            b"<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> >> /Contents "
            + f"{cnum} 0 R >>".encode()
        )
        objs[cnum] = stream_body(
            b"/Filter /FlateDecode", zlib.compress(text * 2)
        )
    objs[2] = (
        b"<< /Type /Pages /Kids [" + b" ".join(kids) + b"] /Count 3 >>"
    )
    flate = build_pdf(objs, b"<< /Size 20 /Root 1 0 R >>")
    enc = encrypted_pdf(content=text * 6, compress=True)
    jpg = jpeg_bytes(_smooth(32, 32, rgb=True), quality=85)
    fax = _rand_bw(64, 96, 3, p=0.15)
    img_objs = {
        6: stream_body(
            b"/Type /XObject /Subtype /Image /Width 32 /Height 32 "
            b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
            b"/Filter /DCTDecode",
            jpg,
        ),
        7: stream_body(
            b"/Type /XObject /Subtype /Image /Width 96 /Height 64 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
            b"/Filter /CCITTFaxDecode "
            b"/DecodeParms << /K -1 /Columns 96 /Rows 64 >>",
            g4_encode(fax),
        ),
    }
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> /XObject "
            b"<< /ImA 6 0 R /ImB 7 0 R >> >> /Contents 4 0 R >>"
        ),
        4: stream_body(b"/Filter /FlateDecode", zlib.compress(text)),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        **img_objs,
    }
    images = build_pdf(objs, b"<< /Size 8 /Root 1 0 R >>")
    garbage = b"%PDF-1.4 not really a pdf " + bytes(range(256)) * 4
    # r13: AESV2-encrypted Flate (same plaintext as 'encrypted', so
    # aes-only vs encrypted-only isolates AES-CBC vs RC4 cost)
    from tests.test_pdf_aes import v4_pdf
    aes = v4_pdf(content=text * 6, compress=True)
    return [
        ("plain", plain),
        ("flate", flate),
        ("encrypted", enc),
        ("aes", aes),
        ("images", images),
        ("garbage", garbage),
    ]


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("stress_pdf")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    variants = _variants()
    total_bytes_per_doc = {k: len(v) for k, v in variants}
    print("variant sizes:", total_bytes_per_doc)

    n = BASE_DOCS * factor
    base = spark.createDataFrame(
        [(i, k, bytearray(v)) for i, (k, v) in enumerate(variants)],
        "vid long, kind string, content binary",
    )
    copies = spark.range(n // len(variants)).select(F.col("id").alias("c"))
    docs = (
        base.crossJoin(copies)
        .select(
            (F.col("c") * len(variants) + F.col("vid")).alias("doc_id"),
            "kind",
            "content",
        )
        .repartition(n_shuffle)
        .cache()
    )
    n = docs.count()
    mb = sum(
        total_bytes_per_doc.values()
    ) / len(variants) * n / 1e6
    print(f"corpus: {n} docs (~{mb:.0f} MB of PDF bytes)")

    # text tier over the full mix (quarantine included)
    t0 = time.time()
    out = extract_pdf_text(docs, errors="null", error_col="err")
    got = (
        out.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("err").isNull(), 0).otherwise(1)).alias(
                "quarantined"
            ),
            F.sum(F.length("text")).alias("chars"),
        )
        .collect()
    )
    wall = time.time() - t0
    print(
        f"extract_pdf_text: {n} docs in {wall:.1f}s = {n / wall:,.0f} "
        f"docs/s ({mb / wall:.1f} MB/s)"
    )
    for r in sorted(got, key=lambda r: r["kind"]):
        print(
            f"  {r['kind']}: {r['n']} docs, quarantined "
            f"{r['quarantined']}, {r['chars'] or 0} chars"
        )

    # decrypt cost: encrypted-only / aes-only slices vs flate-only
    # (same plaintext) — the deltas ARE the RC4 and AES-CBC passes
    for kind in ("flate", "encrypted", "aes"):
        sub = docs.filter(F.col("kind") == kind)
        n_sub = sub.count()
        t0 = time.time()
        extract_pdf_text(sub).agg(F.sum(F.length("text"))).collect()
        wall = time.time() - t0
        print(f"  {kind}-only: {n_sub} docs in {wall:.1f}s = "
              f"{n_sub / wall:,.0f} docs/s")

    # image tier over the image variant
    sub = docs.filter(F.col("kind") == "images")
    n_sub = sub.count()
    t0 = time.time()
    stats = (
        extract_pdf_images(sub)
        .groupBy("format")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    wall = time.time() - t0
    n_imgs = sum(r["n"] for r in stats if r["format"] is not None)
    print(
        f"extract_pdf_images: {n_sub} docs -> {n_imgs} images in "
        f"{wall:.1f}s = {n_imgs / wall:,.0f} images/s "
        f"({sorted((r['format'], r['n']) for r in stats)})"
    )


if __name__ == "__main__":
    main()
