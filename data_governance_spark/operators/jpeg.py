"""JPEG decoder (baseline AND progressive), pure stdlib+numpy — no
Pillow/libjpeg.

Huffman-coded JPEG is entirely expressible with the stdlib and numpy:
marker walk, canonical Huffman tables from DHT, entropy decode with
byte-unstuffing and restart-marker segmentation, dequantize +
de-zigzag, a batched orthonormal 8x8 IDCT (one einsum per component
instead of per-block Python loops), chroma upsampling for 4:2:0/4:2:2,
and the JFIF YCbCr->RGB transform.

One scan decoder serves both modes: sequential (SOF0/SOF1) is the
degenerate progressive scan (Ss=0, Se=63, Ah=Al=0), while progressive
(SOF2) accumulates DC/AC coefficients across spectral-selection and
successive-approximation scans — including the EOB-run and
AC-refinement correction-bit algorithms — and reconstructs once at
EOI. Arithmetic coding, hierarchical mode, 12-bit precision and CMYK
raise the clearly-typed NotImplementedError — the honest boundary of
this tier.

Validated (tests/test_jpeg_codec.py): round-trips through a spec
encoder (gray / 4:4:4 / 4:2:0, with and without restart markers)
within quantization tolerance, exact reconstruction of solid-color
images planted on the quantization grid, real-world baseline JPEGs
shipped with Spark itself (the mllib test images), real-world
progressive JPEGs (whose near-white content is checked semantically),
and a cross-format consistency check between a progressive grayscale
fixture and the luma of its baseline color sibling.

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
    """JPEG (baseline or progressive, Huffman-coded) -> numpy uint8
    (H, W, 3) RGB or (H, W) grayscale."""
    import struct

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
    geom = None  # (hmax, vmax, mcux, mcuy) once SOF is known
    restart_interval = 0
    saw_scan = False
    i = 2
    while i < len(content) - 1:
        if content[i] != 0xFF:
            raise ValueError(f"marker expected at offset {i}")
        marker = content[i + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: optional 0xFF fill bytes
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
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
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            h, w = struct.unpack_from(">HH", seg, 1)
            if w == 0 or h == 0:
                raise ValueError("malformed JPEG SOF: zero dimension")
            nc = seg[5]
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG not supported (gray/YCbCr only)"
                )
            comps = []
            for c in range(nc):
                hv = seg[7 + 3 * c]
                comps.append(
                    {"id": seg[6 + 3 * c], "h": hv >> 4, "v": hv & 15,
                     "tq": seg[8 + 3 * c], "pred": 0}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                # full padded MCU-coverage block grid, int coefficients
                # (progressive refinement needs exact bit semantics)
                c["blocks"] = np.zeros(
                    (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
                )
                # non-interleaved scan grid (un-padded component dims)
                cw = (w * c["h"] + hmax - 1) // hmax
                ch = (h * c["v"] + vmax - 1) // vmax
                c["nbx"], c["nby"] = (cw + 7) // 8, (ch + 7) // 8
            sof = (w, h, comps)
            geom = (hmax, vmax, mcux, mcuy)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{marker - 0xC0} JPEG not supported (Huffman "
                "sequential/progressive only)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            by_id = {c["id"]: c for c in sof[2]}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((by_id[cid], tabs >> 4, tabs & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            segs, i = _split_segments(content, i)
            _decode_scan(
                segs, scan, huff, restart_interval, geom,
                ss, se, a >> 4, a & 15,
            )
            saw_scan = True
        # APPn / COM / DNL / others: skipped via ln
    if not saw_scan:
        raise ValueError("JPEG contains no scan")
    return _reconstruct(sof, geom, qt)


def _split_segments(content: bytes, start: int):
    """Unstuff entropy-coded data and split at restart markers; stops
    at the first real marker. Returns (segments, marker_offset)."""
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
    return segs, i


def _decode_scan(segs, scan, huff, ri, geom, ss, se, ah, al):
    """Decode one scan (sequential or progressive) into the scan
    components' coefficient grids. `scan` is [(comp, dc_tid, ac_tid)]."""
    hmax, vmax, mcux, mcuy = geom
    tables = [
        (c, huff.get((0, td)) if ss == 0 else None,
         huff.get((1, ta)) if se > 0 else None)
        for c, td, ta in scan
    ]
    if ss == 0 and ah == 0 and any(t[1] is None for t in tables):
        raise ValueError("JPEG scan references missing DC table")
    if se > 0 and any(t[2] is None for t in tables):
        raise ValueError("JPEG scan references missing AC table")

    if len(scan) > 1:  # interleaved: MCU traversal
        units = mcux * mcuy

        def blocks_of(u):
            my, mx = divmod(u, mcux)
            for c, dct, act in tables:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        yield c, dct, act, my * c["v"] + by, mx * c["h"] + bx
    else:  # non-interleaved: the component's own un-padded block grid
        c0 = tables[0][0]
        units = c0["nbx"] * c0["nby"]

        def blocks_of(u):
            by, bx = divmod(u, c0["nbx"])
            yield tables[0][0], tables[0][1], tables[0][2], by, bx

    state = {"eobrun": 0}
    br = _BitReader(segs[0])
    seg_idx = 0
    for c, _d, _a in tables:
        c["pred"] = 0
    for u in range(units):
        if ri and u and u % ri == 0:  # restart: next segment, reset
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing JPEG restart segment")
            br = _BitReader(segs[seg_idx])
            state["eobrun"] = 0
            for c, _d, _a in tables:
                c["pred"] = 0
        for c, dct, act, by, bx in blocks_of(u):
            block = c["blocks"][by, bx]
            _decode_block(br, block, c, dct, act, ss, se, ah, al, state)


def _decode_block(br, block, comp, dct, act, ss, se, ah, al, state):
    if ss == 0:
        if ah == 0:  # DC first (or sequential)
            t = _huff_decode(br, dct)
            comp["pred"] += _extend(br.read_bits(t), t)
            block[0] = comp["pred"] << al
        else:  # DC refinement: one bit
            if br.read_bit():
                block[0] |= 1 << al
    lo = max(ss, 1)
    if se < lo:
        return
    if ah == 0:
        _ac_first(br, block, act, lo, se, al, state)
    else:
        _ac_refine(br, block, act, lo, se, al, state)


def _ac_first(br, block, act, lo, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = lo
    while k <= se:
        rs = _huff_decode(br, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eob = (1 << r) - 1
            if r:
                eob += br.read_bits(r)
            state["eobrun"] = eob
            return
        k += r
        if k > se:
            raise ValueError("JPEG AC index overflow")
        block[ZIGZAG[k]] = _extend(br.read_bits(s), s) << al
        k += 1


def _ac_refine(br, block, act, lo, se, al, state):
    """Successive-approximation AC refinement: correction bits for
    already-nonzero coefficients, new +/-1<<al coefficients at
    zero-history positions, and EOB runs that still carry correction
    bits for the rest of the band."""
    p1 = 1 << al
    m1 = -1 << al
    k = lo
    if state["eobrun"] == 0:
        while k <= se:
            rs = _huff_decode(br, act)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:  # EOBn. Unlike AC-first, the CURRENT block
                    # still consumes correction bits for its remaining
                    # nonzero coefficients, so the run count includes
                    # this block (1<<r, decremented after the tail loop)
                    eob = 1 << r
                    if r:
                        eob += br.read_bits(r)
                    state["eobrun"] = eob
                    break
                # r == 15 (ZRL): skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("corrupt JPEG AC refinement symbol")
                val = p1 if br.read_bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                if block[z] != 0:
                    if br.read_bit() and (int(block[z]) & p1) == 0:
                        block[z] += p1 if block[z] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[ZIGZAG[k]] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            z = ZIGZAG[k]
            if block[z] != 0 and br.read_bit() and (int(block[z]) & p1) == 0:
                block[z] += p1 if block[z] > 0 else m1
            k += 1
        state["eobrun"] -= 1


def _reconstruct(sof, geom, qt):
    import numpy as np

    w, h, comps = sof
    hmax, vmax, _mcux, _mcuy = geom
    basis = _idct_basis()
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("JPEG component references missing DQT")
        nby, nbx, _ = c["blocks"].shape
        f = c["blocks"].reshape(nby, nbx, 8, 8).astype(np.float64)
        f *= qt[c["tq"]]
        # batched orthonormal IDCT: spatial = B.T @ F @ B per block
        sp = np.einsum("ux,mnuv,vy->mnxy", basis, f, basis)
        plane = sp.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
        if vmax % c["v"] or hmax % c["h"]:
            raise NotImplementedError("non-integer JPEG sampling ratio")
        ry, rx = vmax // c["v"], hmax // c["h"]
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
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(
        np.uint8
    )
