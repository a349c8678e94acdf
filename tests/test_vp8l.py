"""WEBP-lossless (VP8L) decoder (operators/vp8l.py) — validated by a
spec ENCODER built here from the published bitstream specification,
independently of the decoder's tables (the PNG/GIF/JPEG planted-payload
recipe): canonical-Huffman round-trips over random images, simple and
normal prefix-code forms, LZ77 refs (incl. overlapping), the color
cache, delta-coded palettes with sub-byte pixel bundling, subtract-
green, meta-prefix groups, and every documented loud boundary."""

from __future__ import annotations

import heapq
import itertools
import struct
from collections import Counter

import numpy as np
import pytest

from data_governance_spark.operators.vp8l import (
    CODE_LENGTH_ORDER,
    BitReader,
    _prefix_value,
    decode_vp8l,
)

# ---------------------------------------------------------------- encoder


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:  # LSB-first value bits
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def write_code(self, code: int, length: int) -> None:  # MSB-first
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def huff_lengths(freqs: dict[int, int], limit: int = 15) -> dict[int, int]:
    """Plain heapq Huffman code lengths; rebuilt with equal weights
    (complete tree, depth <= ceil(log2 k)) if the limit is exceeded."""
    syms = sorted(s for s, f in freqs.items() if f > 0)
    if not syms:
        raise ValueError("no symbols")
    if len(syms) == 1:
        return {syms[0]: 1}
    cnt = itertools.count()
    heap = [(freqs[s], next(cnt), (s,)) for s in syms]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, next(cnt), g1 + g2))
    if max(depth.values()) > limit:
        return huff_lengths({s: 1 for s in syms}, limit)
    return depth


def canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """sym -> (code, len), DEFLATE assignment; the 1-symbol degenerate
    tree costs zero bits (matching the decoder)."""
    nz = sorted((ln, s) for s, ln in lengths.items() if ln)
    if len(nz) == 1:
        return {nz[0][1]: (0, 0)}
    out = {}
    code = 0
    prev = 0
    for ln, sym in nz:
        code <<= ln - prev
        prev = ln
        out[sym] = (code, ln)
        code += 1
    return out


def write_prefix_code(bw: BitWriter, freqs: dict[int, int], alphabet: int):
    """Choose stored form (simple when 1-2 symbols all < 256, normal
    otherwise), write it, return the canonical code map."""
    lengths = huff_lengths(freqs)
    nz = sorted(lengths)
    if len(nz) <= 2 and all(s < 256 for s in nz):
        bw.write(1, 1)  # simple form
        bw.write(len(nz) - 1, 1)
        s0 = nz[0]
        if s0 < 2:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
            return canonical({nz[0]: 1, nz[1]: 1})
        return canonical({s0: 1})
    bw.write(0, 1)  # normal form: code-length-coded lengths
    seq = [lengths.get(s, 0) for s in range(alphabet)]
    cl_lengths = huff_lengths(Counter(seq), limit=7)
    last = max(
        i for i, s in enumerate(CODE_LENGTH_ORDER) if cl_lengths.get(s, 0)
    )
    num = max(4, last + 1)
    bw.write(num - 4, 4)
    for i in range(num):
        bw.write(cl_lengths.get(CODE_LENGTH_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max-symbol budget
    cl_codes = canonical(cl_lengths)
    for ln in seq:  # no 16/17/18 RLE — plain, always valid
        c, n = cl_codes[ln]
        bw.write_code(c, n)
    return canonical(lengths)


def prefix_encode(v: int) -> tuple[int, int, int]:
    """(code, n_extra_bits, extra) — inverse of the decoder's
    _prefix_value, derived independently from the spec ranges."""
    m = v - 1
    if m < 4:
        return m, 0, 0
    b = m.bit_length() - 1
    if m < (3 << (b - 1)):
        return 2 * b, b - 1, m - (1 << b)
    return 2 * b + 1, b - 1, m - (3 << (b - 1))


def _cache_index(px: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)


def emit_image_data(
    bw: BitWriter,
    seq: list[tuple[int, tuple]],
    n_groups: int,
    cache_bits: int,
    level0: bool,
    meta_spec=None,
) -> None:
    """seq: ordered (group_idx, token); token is ('lit', a, r, g, b),
    ('copy', length, dist) with a DIRECT distance, or ('cache', idx).
    meta_spec: (prefix_bits, group_idx_2d) for level-0 multi-group."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        if meta_spec is None:
            bw.write(0, 1)
        else:
            prefix_bits, gidx = meta_spec
            bw.write(1, 1)
            bw.write(prefix_bits - 2, 3)
            meta_seq = [
                (0, ("lit", 0, (int(v) >> 8) & 0xFF, int(v) & 0xFF, 0))
                for v in gidx.reshape(-1)
            ]
            emit_image_data(bw, meta_seq, 1, 0, False)
    g_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    freqs = [
        {"g": Counter(), "r": Counter(), "b": Counter(), "a": Counter(),
         "d": Counter()}
        for _ in range(n_groups)
    ]
    for gi, t in seq:
        f = freqs[gi]
        if t[0] == "lit":
            _, a, r, g, b = t
            f["g"][g] += 1
            f["r"][r] += 1
            f["b"][b] += 1
            f["a"][a] += 1
        elif t[0] == "copy":
            c, _, _ = prefix_encode(t[1])
            f["g"][256 + c] += 1
            dc, _, _ = prefix_encode(t[2] + 120)
            f["d"][dc] += 1
        else:
            f["g"][280 + t[1]] += 1
    codes = []
    for f in freqs:
        for k in ("g", "r", "b", "a", "d"):
            if not f[k]:
                f[k][0] = 1  # every tree must exist even when unused
        codes.append(
            (
                write_prefix_code(bw, f["g"], g_alpha),
                write_prefix_code(bw, f["r"], 256),
                write_prefix_code(bw, f["b"], 256),
                write_prefix_code(bw, f["a"], 256),
                write_prefix_code(bw, f["d"], 40),
            )
        )
    for gi, t in seq:
        G, R, B, A, D = codes[gi]
        if t[0] == "lit":
            _, a, r, g, b = t
            for cm, s in ((G, g), (R, r), (B, b), (A, a)):
                c, n = cm[s]
                bw.write_code(c, n)
        elif t[0] == "copy":
            c, ne, e = prefix_encode(t[1])
            cc, n = G[256 + c]
            bw.write_code(cc, n)
            bw.write(e, ne)
            c2, ne2, e2 = prefix_encode(t[2] + 120)
            cc2, n2 = D[c2]
            bw.write_code(cc2, n2)
            bw.write(e2, ne2)
        else:
            cc, n = G[280 + t[1]]
            bw.write_code(cc, n)


def webp_container(bitstream: bytes) -> bytes:
    vp8l = b"\x2f" + bitstream
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def literal_seq(img: np.ndarray) -> list[tuple[int, tuple]]:
    """(h, w, 4) RGBA -> all-literal token sequence, row-major."""
    h, w, _ = img.shape
    return [
        (
            0,
            (
                "lit",
                int(img[y, x, 3]),
                int(img[y, x, 0]),
                int(img[y, x, 1]),
                int(img[y, x, 2]),
            ),
        )
        for y in range(h)
        for x in range(w)
    ]


def encode_simple(img: np.ndarray, cache_bits: int = 0) -> bytes:
    """Whole-image encoder: header + no transforms + literals (or
    cache hits when cache_bits > 0)."""
    h, w, _ = img.shape
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    if cache_bits == 0:
        seq = literal_seq(img)
    else:
        cache = [None] * (1 << cache_bits)
        seq = []
        for _, t in literal_seq(img):
            _, a, r, g, b = t
            px = (a << 24) | (r << 16) | (g << 8) | b
            idx = _cache_index(px, cache_bits)
            if cache[idx] == px:
                seq.append((0, ("cache", idx)))
            else:
                seq.append((0, t))
            cache[idx] = px
    emit_image_data(bw, seq, 1, cache_bits, True)
    return webp_container(bw.tobytes())


def expected_rgb_or_rgba(img: np.ndarray) -> np.ndarray:
    return img[:, :, :3] if (img[:, :, 3] == 255).all() else img


def rng_image(seed: int, h: int, w: int, colors: int, alpha=255):
    r = np.random.RandomState(seed)
    pal = r.randint(0, 256, size=(colors, 3), dtype=np.uint8)
    idx = r.randint(0, colors, size=(h, w))
    img = np.zeros((h, w, 4), dtype=np.uint8)
    img[:, :, :3] = pal[idx]
    img[:, :, 3] = alpha
    return img


# ---------------------------------------------------------------- tests


def test_prefix_encode_decode_inverse():
    for v in list(range(1, 2000)) + [65536, 10**6]:
        code, ne, extra = prefix_encode(v)
        assert 0 <= code < 40
        bw = BitWriter()
        bw.write(extra, ne)
        br = BitReader(bw.tobytes() or b"\x00")
        assert _prefix_value(code, br) == v, v


@pytest.mark.parametrize("colors,size", [(1, (1, 1)), (2, (3, 5)),
                                         (4, (7, 4)), (40, (16, 16)),
                                         (200, (23, 9))])
def test_literal_round_trip(colors, size):
    """Covers the 1-symbol degenerate tree (zero-bit reads), the
    simple 2-symbol form, and normal code-length-coded trees."""
    h, w = size
    img = rng_image(colors * 31 + h, h, w, colors)
    out = decode_vp8l(encode_simple(img))
    assert out.shape == (h, w, 3)
    assert (out == img[:, :, :3]).all()


def test_alpha_round_trip_returns_rgba():
    img = rng_image(7, 5, 6, 8, alpha=255)
    img[2, 3, 3] = 128  # one translucent pixel
    out = decode_vp8l(encode_simple(img))
    assert out.shape == (5, 6, 4)
    assert (out == img).all()


def test_many_random_round_trips():
    for seed in range(25):
        h, w = 1 + seed % 13, 1 + (seed * 7) % 17
        img = rng_image(seed, h, w, 1 + seed % 11)
        assert (decode_vp8l(encode_simple(img))
                == expected_rgb_or_rgba(img)).all(), seed


def test_lz77_copy_round_trip():
    """Second row copies the first (dist=w), then an OVERLAPPING run
    (dist=1) fills the third — the sequential-copy semantics."""
    w = 9
    img = np.zeros((3, w, 4), dtype=np.uint8)
    r = np.random.RandomState(3)
    img[0, :, :3] = r.randint(0, 256, size=(w, 3))
    img[:, :, 3] = 255
    img[1] = img[0]
    img[2, :] = img[1, w - 1]  # dist=1 overlap replicates last pixel
    seq = [t for t in literal_seq(img[:1])]
    seq.append((0, ("copy", w, w)))
    seq.append((0, ("copy", w, 1)))
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(2, 14)  # h-1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)
    emit_image_data(bw, seq, 1, 0, True)
    out = decode_vp8l(webp_container(bw.tobytes()))
    assert (out == img[:, :, :3]).all()


def test_color_cache_round_trip():
    img = rng_image(11, 12, 10, 3)  # few colors -> real cache hits
    payload = encode_simple(img, cache_bits=4)
    assert (decode_vp8l(payload) == img[:, :, :3]).all()
    # the cache genuinely fired: payload smaller than literals-only
    assert len(payload) < len(encode_simple(img))


def test_subtract_green_round_trip():
    img = rng_image(13, 6, 7, 9)
    h, w, _ = img.shape
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)  # one transform
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # end of transforms
    sub = img.astype(np.int16).copy()
    sub[:, :, 0] = (sub[:, :, 0] - sub[:, :, 1]) % 256  # r -= g
    sub[:, :, 2] = (sub[:, :, 2] - sub[:, :, 1]) % 256  # b -= g
    emit_image_data(bw, literal_seq(sub.astype(np.uint8)), 1, 0, True)
    out = decode_vp8l(webp_container(bw.tobytes()))
    assert (out == img[:, :, :3]).all()


def _encode_palette_image(idx: np.ndarray, pal_rgba: np.ndarray) -> bytes:
    """COLOR_INDEXING: delta-coded palette subimage + (optionally
    bundled) index image."""
    h, w = idx.shape
    n = len(pal_rgba)
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(n - 1, 8)
    deltas = np.diff(
        np.vstack([np.zeros((1, 4), np.int16), pal_rgba.astype(np.int16)]),
        axis=0,
    ) % 256
    pal_seq = [
        (0, ("lit", int(d[3]), int(d[0]), int(d[1]), int(d[2])))
        for d in deltas
    ]
    emit_image_data(bw, pal_seq, 1, 0, False)  # subimage: no meta
    bw.write(0, 1)  # end of transforms
    if n <= 2:
        bits = 3
    elif n <= 4:
        bits = 2
    elif n <= 16:
        bits = 1
    else:
        bits = 0
    per = 1 << bits
    ib = 8 >> bits
    packed_w = (w + per - 1) // per
    greens = np.zeros((h, packed_w), dtype=np.int32)
    for i in range(per):
        cols = idx[:, i::per]
        greens[:, : cols.shape[1]] |= cols.astype(np.int32) << (i * ib)
    seq = [
        (0, ("lit", 0, 0, int(greens[y, x]), 0))
        for y in range(h)
        for x in range(packed_w)
    ]
    emit_image_data(bw, seq, 1, 0, True)
    return webp_container(bw.tobytes())


@pytest.mark.parametrize("n_colors", [2, 4, 13, 16, 190])
def test_color_indexing_round_trip(n_colors):
    r = np.random.RandomState(n_colors)
    pal = r.randint(0, 256, size=(n_colors, 4), dtype=np.uint8)
    pal[:, 3] = 255
    h, w = 5, 11  # w deliberately not a multiple of the bundle width
    idx = r.randint(0, n_colors, size=(h, w))
    out = decode_vp8l(_encode_palette_image(idx, pal))
    assert (out == pal[idx][:, :, :3]).all()


def test_meta_prefix_groups_round_trip():
    """Two prefix-code groups via an entropy image: left half literal
    colors, right half different colors — each group's trees only know
    its own symbols, so a group-lookup bug cannot decode."""
    h, w, pb = 4, 8, 2  # 4-pixel blocks -> meta image 2x1
    img = rng_image(17, h, w, 3)
    img[:, 4:, :3] = rng_image(18, h, 4, 3)[:, :, :3] // 2 + 128
    gidx = np.array([[0, 1]])
    seq = [
        (0 if x < 4 else 1, t)
        for (_, t), (y, x) in zip(
            literal_seq(img),
            ((y, x) for y in range(h) for x in range(w)),
        )
    ]
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    emit_image_data(bw, seq, 2, 0, True, meta_spec=(pb, gidx))
    out = decode_vp8l(webp_container(bw.tobytes()))
    assert (out == img[:, :, :3]).all()


def test_loud_boundaries():
    img = rng_image(1, 2, 2, 2)
    # 2D distance codes raise (direct distances are dist+120)
    bw = BitWriter()
    bw.write(1, 14)
    bw.write(1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)
    seq = literal_seq(img)[:1] + [(0, ("copy", 1, -119))]  # dist_code=1
    emit_image_data(bw, seq, 1, 0, True)
    with pytest.raises(NotImplementedError, match="2D distance"):
        decode_vp8l(webp_container(bw.tobytes()))
    # PREDICTOR transform raises at read time
    bw = BitWriter()
    bw.write(1, 14)
    bw.write(1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    with pytest.raises(NotImplementedError, match="PREDICTOR"):
        decode_vp8l(webp_container(bw.tobytes()))
    # lossy VP8 chunk raises
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack(
        "<I", 0
    )
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_vp8l(lossy)
    # corrupt container / signature / truncation are ValueErrors
    with pytest.raises(ValueError, match="RIFF"):
        decode_vp8l(b"nope")
    good = encode_simple(img)
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(good[:20] + b"\x00" + good[21:])
    with pytest.raises(ValueError):
        decode_vp8l(good[:24])


def test_decode_image_dispatch():
    from data_governance_spark.operators.multimodal import decode_image

    img = rng_image(5, 4, 6, 5)
    out = decode_image(encode_simple(img))
    assert (out == img[:, :, :3]).all()
