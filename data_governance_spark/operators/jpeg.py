"""Baseline JPEG decoder, pure stdlib+numpy — no Pillow/libjpeg.

JPEG's baseline (SOF0) pipeline is entirely expressible with the
stdlib and numpy: marker walk, canonical Huffman tables from DHT,
entropy decode with byte-unstuffing and restart-marker segmentation,
dequantize + de-zigzag, a batched orthonormal 8x8 IDCT (one einsum per
component instead of per-block Python loops), chroma upsampling for
4:2:0/4:2:2, and the JFIF YCbCr->RGB transform. Progressive (SOF2),
arithmetic coding, 12-bit precision and CMYK raise the clearly-typed
NotImplementedError — the honest boundary of this tier.

Validated three ways (tests/test_jpeg_codec.py): round-trips through a
spec encoder (gray / 4:4:4 / 4:2:0, with and without restart markers)
within quantization tolerance, exact reconstruction of solid-color
images planted on the quantization grid, and real-world baseline
JPEGs shipped with the OS and with Spark itself (the mllib test
images), whose decoded dimensions and brightness are checked.

Scale note: Huffman entropy decode is inherently serial per scan
segment, so per-image cost is Python-speed; parallelism at corpus
scale comes from mapInPandas over Arrow batches (one image per row,
thousands of images per partition), same as the other codecs in
``operators/multimodal.py``.
"""

from __future__ import annotations

# natural-order index for each zigzag position (generated, not typed)
ZIGZAG: list[int] = []
for _s in range(15):
    _rng = range(max(0, _s - 7), min(_s, 7) + 1)
    for _r in _rng if _s % 2 else reversed(_rng):
        ZIGZAG.append(_r * 8 + (_s - _r))


def _idct_basis():
    import numpy as np

    u = np.arange(8)
    x = np.arange(8)
    b = np.cos((2 * x[None, :] + 1) * u[:, None] * np.pi / 16)
    b[0] *= 1 / np.sqrt(2)
    return b * 0.5  # orthonormal: spatial = B.T @ F @ B


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (already
    unstuffed: 0xFF00 -> 0xFF, restart markers removed)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def read_bit(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise ValueError("truncated JPEG entropy data")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("corrupt JPEG Huffman stream")


def _extend(v: int, n: int) -> int:
    # DC/AC magnitude category decode: top bit 0 means negative branch
    if n and v < (1 << (n - 1)):
        return v - (1 << n) + 1
    return v


def _build_huff(bits: list[int], vals: bytes) -> dict:
    """Canonical JPEG Huffman code assignment: codes of each length in
    value order, starting from (prev_code + 1) << 1."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def decode_jpeg(content: bytes):
    """Baseline JPEG -> numpy uint8 (H, W, 3) RGB or (H, W) grayscale."""
    import struct

    import numpy as np

    if content[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    try:
        return _decode_jpeg_body(content)
    except (IndexError, struct.error, KeyError) as exc:
        raise ValueError(f"truncated or corrupt JPEG payload: {exc}")


def _decode_jpeg_body(content: bytes):
    import struct

    import numpy as np

    qt: dict[int, np.ndarray] = {}  # id -> natural-order 8x8 float
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> code table
    sof = None
    restart_interval = 0
    i = 2
    while i < len(content) - 1:
        if content[i] != 0xFF:
            raise ValueError(f"marker expected at offset {i}")
        marker = content[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        ln = struct.unpack_from(">H", content, i + 2)[0]
        seg = content[i + 4 : i + 2 + ln]
        i += 2 + ln
        if marker == 0xDB:  # DQT (tables may be concatenated)
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                p += 1
                n = np.zeros(64)
                for k in range(64):
                    if prec:
                        n[ZIGZAG[k]] = struct.unpack_from(">H", seg, p)[0]
                        p += 2
                    else:
                        n[ZIGZAG[k]] = seg[p]
                        p += 1
                qt[tid] = n.reshape(8, 8)
        elif marker == 0xC4:  # DHT (may be concatenated)
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                huff[(cls, tid)] = _build_huff(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15,
                     "tq": seg[8 + 3 * c]}
                )
            sof = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            kind = "progressive" if marker == 0xC2 else f"SOF{marker - 0xC0}"
            raise NotImplementedError(
                f"{kind} JPEG not supported (baseline/extended-sequential "
                "Huffman only)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS: scan header then entropy data
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cid, tabs >> 4, tabs & 15))
            return _decode_scan(
                content, i, sof, scan, qt, huff, restart_interval
            )
        elif marker == 0xD9:  # EOI before any scan
            break
        # APPn / COM / others: skipped via ln
    raise ValueError("JPEG contains no scan")


def _split_segments(content: bytes, start: int):
    """Unstuff entropy-coded data and split at restart markers; stops
    at the first real marker (EOI or a following segment)."""
    segs = []
    cur = bytearray()
    i = start
    n = len(content)
    while i < n:
        b = content[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = content[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs


def _decode_scan(content, start, sof, scan, qt, huff, ri):
    import numpy as np

    w, h, comps = sof
    if len(comps) not in (1, 3):
        raise NotImplementedError(
            f"{len(comps)}-component JPEG not supported (gray/YCbCr only)"
        )
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    order = []  # (comp, dc_table, ac_table) in scan order
    for cid, td, ta in scan:
        c = by_id[cid]
        order.append((c, huff[(0, td)], huff[(1, ta)]))
        c["blocks"] = np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.float64
        )
    segs = _split_segments(content, start)
    basis = _idct_basis()

    br = _BitReader(segs[0])
    seg_idx = 0
    preds = [0] * len(order)
    for m in range(mcux * mcuy):
        if ri and m and m % ri == 0:  # restart: next segment, reset DC
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing JPEG restart segment")
            br = _BitReader(segs[seg_idx])
            preds = [0] * len(order)
        my, mx = divmod(m, mcux)
        for ci, (c, dct, act) in enumerate(order):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coefs = np.zeros(64)
                    t = _huff_decode(br, dct)
                    preds[ci] += _extend(br.read_bits(t), t)
                    coefs[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(br, act)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        coefs[ZIGZAG[k]] = _extend(br.read_bits(s), s)
                        k += 1
                    c["blocks"][my * c["v"] + by, mx * c["h"] + bx] = coefs

    planes = []
    for c in comps:
        nby, nbx, _ = c["blocks"].shape
        f = c["blocks"].reshape(nby, nbx, 8, 8) * qt[c["tq"]]
        # batched orthonormal IDCT: spatial = B.T @ F @ B per block
        sp = np.einsum("ux,mnuv,vy->mnxy", basis, f, basis)
        plane = sp.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise NotImplementedError("non-integer JPEG sampling ratio")
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    import numpy as _np

    return _np.clip(_np.stack([r, g, b], axis=2).round(), 0, 255).astype(
        _np.uint8
    )
