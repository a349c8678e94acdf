#!/usr/bin/env python
"""One-time generator for operators/brotli_data.py — the RFC 7932
static data (Appendix A dictionary, Appendix B transforms, §7.1
context lookup tables, §6 block-count code ranges).

The bytes ARE the RFC's appendix content; this script extracts them
from the publicly distributed libbrotlicommon 1.2.0 shipped in this
environment (conda package) instead of retyping 122 KB of hex from
the RFC text.  Every extracted table is sanity-pinned here (sizes,
CRCs, the canonical 'timedownlifeleft...' dictionary head, the first
five transforms against the RFC list) and the REAL proof is the
differential decode suite in tests/test_brotli.py — a wrong byte in
any table fails parity with libbrotli output immediately.

Usage: python scripts/gen_brotli_data.py [libpath]
"""

from __future__ import annotations

import base64
import ctypes
import os
import struct
import sys
import zlib

LIB = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/miniconda/pkgs/libbrotlicommon-1.2.0-h32cd6e7_0/lib/"
    "libbrotlicommon.so.1.2.0"
)
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data_governance_spark",
    "operators",
    "brotli_data.py",
)


class BrotliDictionary(ctypes.Structure):
    _fields_ = [
        ("size_bits_by_length", ctypes.c_uint8 * 32),
        ("offsets_by_length", ctypes.c_uint32 * 32),
        ("data_size", ctypes.c_size_t),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
    ]


class BrotliTransforms(ctypes.Structure):
    _fields_ = [
        ("prefix_suffix_size", ctypes.c_uint16),
        ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
        ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
        ("num_transforms", ctypes.c_uint32),
        ("transforms", ctypes.POINTER(ctypes.c_uint8)),
        ("params", ctypes.POINTER(ctypes.c_uint8)),
        ("cutOffTransforms", ctypes.c_int16 * 10),
    ]


def main() -> None:
    lib = ctypes.CDLL(LIB)

    ctx_p = ctypes.cast(
        getattr(lib, "_kBrotliContextLookupTable"),
        ctypes.POINTER(ctypes.c_uint8),
    )
    ctx = bytes(ctx_p[i] for i in range(2048))
    assert len(set(ctx[0:256])) == 64  # LSB6 p1 half
    assert ctx[256:512] == b"\x00" * 256  # LSB6 p2 half is zero

    lib.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
    d = lib.BrotliGetDictionary().contents
    assert d.data_size == 122784, d.data_size  # RFC Appendix A size
    data = bytes(d.data[i] for i in range(d.data_size))
    assert data[:16] == b"timedownlifeleft"  # canonical head
    assert zlib.crc32(data) == 0x5136CB04
    size_bits = list(d.size_bits_by_length)
    offsets = list(d.offsets_by_length)
    assert size_bits[4] == 10 and size_bits[24] == 5
    # internal consistency: offsets accumulate NWORDS(len)*len
    for ln in range(4, 25):
        assert offsets[ln + 1] == offsets[ln] + (1 << size_bits[ln]) * ln

    lib.BrotliGetTransforms.restype = ctypes.POINTER(BrotliTransforms)
    t = lib.BrotliGetTransforms().contents
    assert t.num_transforms == 121  # RFC Appendix B count
    ps = bytes(t.prefix_suffix[i] for i in range(t.prefix_suffix_size))

    def s(idx: int) -> bytes:
        off = t.prefix_suffix_map[idx]
        return ps[off + 1: off + 1 + ps[off]]

    transforms = []
    for i in range(t.num_transforms):
        pfx = s(t.transforms[i * 3])
        typ = t.transforms[i * 3 + 1]
        sfx = s(t.transforms[i * 3 + 2])
        transforms.append((pfx, typ, sfx))
    # RFC Appendix B rows 0..4
    assert transforms[0] == (b"", 0, b"")
    assert transforms[1] == (b"", 0, b" ")
    assert transforms[2] == (b" ", 0, b" ")
    assert transforms[3] == (b"", 12, b"")  # OmitFirst1
    assert transforms[4] == (b"", 10, b" ")  # UppercaseFirst

    pr = ctypes.cast(
        getattr(lib, "_kBrotliPrefixCodeRanges"),
        ctypes.POINTER(ctypes.c_uint8),
    )
    raw = bytes(pr[i] for i in range(104))
    blk = [struct.unpack_from("<HBx", raw, i * 4) for i in range(26)]
    assert blk[0] == (1, 2) and blk[-1] == (16625, 24)

    dict_b85 = base64.b85encode(zlib.compress(data, 9)).decode()
    ctx_b85 = base64.b85encode(ctx).decode()

    def wrap(txt: str, width: int = 72) -> str:
        return "\n".join(
            f'    "{txt[i: i + width]}"' for i in range(0, len(txt), width)
        )

    with open(OUT, "w") as f:
        f.write('"""RFC 7932 (brotli) static data: the Appendix A dictionary,\n')
        f.write("Appendix B transforms, the section 7.1 context lookup tables and\n")
        f.write("the section 6 block-count code ranges.  PUBLIC content of the RFC\n")
        f.write("itself, extracted by scripts/gen_brotli_data.py from the\n")
        f.write("publicly distributed libbrotlicommon in this environment and\n")
        f.write("pinned there (sizes, CRC32 0x5136cb04, canonical head, the first\n")
        f.write("RFC transform rows); proven byte-correct by the libbrotli\n")
        f.write('differential suite in tests/test_brotli.py."""\n\n')
        f.write("import base64 as _b64\nimport zlib as _zlib\n\n")
        f.write("# 2048 bytes: 4 context modes x (lut[p1] | lut[256+p2])\n")
        f.write("CONTEXT_LUT = _b64.b85decode(\n" + wrap(ctx_b85) + "\n)\n\n")
        f.write("# 122,784 dictionary bytes (zlib-compressed, base85)\n")
        f.write(
            "DICT_DATA = _zlib.decompress(_b64.b85decode(\n"
            + wrap(dict_b85)
            + "\n))\n\n"
        )
        f.write(f"DICT_SIZE_BITS = {size_bits[:25]!r}\n")
        f.write(f"DICT_OFFSETS = {offsets[:26]!r}\n\n")
        f.write("# 121 transforms: (prefix, elementary-transform id, suffix);\n")
        f.write("# ids: 0 Identity, 1-9 OmitLast1-9, 10 UppercaseFirst,\n")
        f.write("# 11 UppercaseAll, 12-20 OmitFirst1-9\n")
        f.write("TRANSFORMS = [\n")
        for pfx, typ, sfx in transforms:
            f.write(f"    ({pfx!r}, {typ}, {sfx!r}),\n")
        f.write("]\n\n")
        f.write("# block-count code: 26 x (offset, extra bits)\n")
        f.write(f"BLOCK_COUNT_RANGES = {blk!r}\n")
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
