"""WEBP-lossless (VP8L) decoder — numpy/stdlib only, no libwebp.

Implements the public "WebP Lossless Bitstream Specification" (Google):
RIFF/VP8L container, LSB-first bit reading with MSB-first canonical
prefix codes (the DEFLATE convention VP8L inherits), both prefix-code
stored forms (simple 1-2-symbol codes and the code-length-coded normal
form incl. the 16/17/18 repeat codes and the optional max-symbol
budget), meta-prefix entropy images (per-block prefix-code groups),
the color cache (0x1e35a7bd multiplicative hash), LZ77 backward
references with the prefix-coded length/distance scheme, and two of
the four transforms: SUBTRACT_GREEN and COLOR_INDEXING (delta-coded
palette, sub-byte pixel bundling at palette sizes <= 16).

Honest boundaries (loud, typed — the 16-bit-PNG contract):

- Distance codes 1..120 (the 2D near-neighborhood map) raise
  NotImplementedError. The map is a fixed 120-entry table in the spec;
  this container has no libwebp and ships no .webp fixtures, so a
  transcription error would SILENTLY corrupt real files while
  self-round-trip tests still pass — a loud raise is the only
  validatable behavior. Direct distances (codes > 120, what the test
  encoder emits) are fully supported.
- PREDICTOR and COLOR transforms raise NotImplementedError for the
  same reason: their per-edge prediction rules cannot be validated
  against an independent implementation here.
- Animation/VP8X-extended features and lossy VP8 chunks raise.

Everything implemented is pinned by a spec ENCODER in
tests/test_vp8l.py (the q45 planted-payload recipe: JPEG/PNG/GIF all
ship their own spec encoders) — round-trips over random images,
palettes, LZ77 refs, cache hits, and multi-group meta images, plus
hand-built bitstreams for the corner rules (zero-length codes, repeat
overflow, single-symbol trees).

Reference twin: none — training-data extension per SURVEY.md §6
(multimodal ingest; the published spec is the method).
"""

from __future__ import annotations

import struct

import numpy as np

# code-length-code symbol order (spec constant, shared with the tests'
# encoder; identical in role to DEFLATE's order but a different list)
CODE_LENGTH_ORDER = (
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
)
_NUM_LITERAL = 256
_NUM_LENGTH = 24
_NUM_DISTANCE = 40


class BitReader:
    """LSB-first bit reader. ``read(n)`` composes n sequential bits
    little-endian (first bit read is the value's bit 0); ``read_code``
    walks prefix-code bits MSB-first — the two cursors VP8L (like
    DEFLATE) interleaves over one byte stream."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte_idx = self.pos >> 3
            if byte_idx >= len(self.data):
                raise ValueError("truncated VP8L bitstream")
            v |= ((self.data[byte_idx] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class PrefixCode:
    """Canonical prefix code from code lengths (DEFLATE assignment:
    codes ordered by (length, symbol)). Decoding walks bit-by-bit —
    fine for the planted-payload/test scale this runs at; a production
    hot loop would table-ize."""

    def __init__(self, lengths: list[int]):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("prefix code with no symbols")
        self.single = nz[0][1] if len(nz) == 1 else None
        if self.single is not None:
            # degenerate tree: the symbol costs zero bits (spec allows
            # exactly this one incomplete form)
            return
        # Kraft check: a wrong tree must fail loudly, not mis-decode
        kraft = sum(2 ** -ln for ln, _ in nz)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError(f"invalid prefix code (Kraft sum {kraft})")
        self.table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = 0
        for ln, sym in sorted(nz):
            code <<= ln - prev_len
            prev_len = ln
            self.table[(ln, code)] = sym
            code += 1
        self.max_len = prev_len

    def read_symbol(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix-code bit sequence")


def _read_code_lengths(br: BitReader, alphabet_size: int) -> list[int]:
    """The 'normal' stored form: a code-length code over the 19-entry
    order, then the alphabet's lengths with 16/17/18 repeats and the
    optional max-symbol budget."""
    num_codes = 4 + br.read(4)
    if num_codes > len(CODE_LENGTH_ORDER):
        raise ValueError("too many code-length codes")
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = PrefixCode(cl_lengths)

    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("max_symbol exceeds alphabet")
    else:
        max_symbol = alphabet_size

    lengths = [0] * alphabet_size
    prev_nz = 8  # spec: repeats of 'previous' start from 8
    sym = 0
    budget = max_symbol
    while sym < alphabet_size:
        if budget <= 0:
            break
        budget -= 1
        code = cl_code.read_symbol(br)
        if code < 16:
            lengths[sym] = code
            sym += 1
            if code:
                prev_nz = code
        elif code == 16:
            rep = 3 + br.read(2)
            if sym + rep > alphabet_size:
                raise ValueError("code-length repeat overruns alphabet")
            for _ in range(rep):
                lengths[sym] = prev_nz
                sym += 1
        elif code == 17:
            rep = 3 + br.read(3)
            if sym + rep > alphabet_size:
                raise ValueError("code-length repeat overruns alphabet")
            sym += rep
        else:  # 18
            rep = 11 + br.read(7)
            if sym + rep > alphabet_size:
                raise ValueError("code-length repeat overruns alphabet")
            sym += rep
    return lengths


def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixCode:
    if br.read(1):  # simple code: 1 or 2 symbols, stored directly
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits, else 1 bit
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            if sym0 == sym1:
                raise ValueError("simple code repeats a symbol")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            if sym0 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            lengths[sym0] = 1  # degenerate single-symbol tree
        return PrefixCode(lengths)
    return PrefixCode(_read_code_lengths(br, alphabet_size))


def _prefix_value(code: int, br: BitReader) -> int:
    """LZ77 length/distance prefix decode (the shared 24/40-symbol
    scheme): small codes are direct, larger ones carry extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _ceil_shift(v: int, bits: int) -> int:
    return (v + (1 << bits) - 1) >> bits


def _decode_image_stream(
    br: BitReader, w: int, h: int, level0: bool
) -> np.ndarray:
    """One VP8L image stream -> (h, w) uint32 ARGB array. ``level0``
    gates transforms and the meta-prefix recursion (subimages carry
    neither, per spec)."""
    transforms = []  # applied in reverse order after decode
    xsize = w
    if level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype == 2:  # SUBTRACT_GREEN
                transforms.append(("subtract_green",))
            elif ttype == 3:  # COLOR_INDEXING
                n_colors = br.read(8) + 1
                palette_img = _decode_image_stream(br, n_colors, 1, False)
                # palette entries are delta-coded per channel
                pal = palette_img[0].view(np.uint8).reshape(n_colors, 4)
                pal = np.cumsum(pal.astype(np.uint16), axis=0).astype(
                    np.uint8
                )
                if n_colors <= 2:
                    pack_bits = 3
                elif n_colors <= 4:
                    pack_bits = 2
                elif n_colors <= 16:
                    pack_bits = 1
                else:
                    pack_bits = 0
                transforms.append(("palette", pal, pack_bits, xsize))
                xsize = _ceil_shift(xsize, pack_bits)
            elif ttype in (0, 1):
                raise NotImplementedError(
                    "VP8L PREDICTOR/COLOR transforms not supported — "
                    "no independent reference exists in this container "
                    "to validate their per-edge rules, and a silently "
                    "wrong prediction corrupts; re-encode without "
                    "spatial prediction or use a libwebp-equipped "
                    "cluster"
                )

    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"invalid color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    # meta-prefix groups (level0 only)
    meta_idx = None
    prefix_bits = 0
    num_groups = 1
    if level0 and br.read(1):
        prefix_bits = br.read(3) + 2
        mw = _ceil_shift(xsize, prefix_bits)
        mh = _ceil_shift(h, prefix_bits)
        meta_img = _decode_image_stream(br, mw, mh, False)
        # group index = (red << 8) | green of the entropy pixel
        meta_idx = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta_idx.max()) + 1

    g_alpha = _NUM_LITERAL + _NUM_LENGTH + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, g_alpha),
                _read_prefix_code(br, _NUM_LITERAL),  # red
                _read_prefix_code(br, _NUM_LITERAL),  # blue
                _read_prefix_code(br, _NUM_LITERAL),  # alpha
                _read_prefix_code(br, _NUM_DISTANCE),
            )
        )

    cache = [0] * cache_size

    def cache_insert(px: int):
        if cache_size:
            cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    n = xsize * h
    argb = np.zeros(n, dtype=np.uint32)
    pos = 0
    while pos < n:
        if meta_idx is not None:
            x, y = pos % xsize, pos // xsize
            gcode, rcode, bcode, acode, dcode = groups[
                int(meta_idx[y >> prefix_bits, x >> prefix_bits])
            ]
        else:
            gcode, rcode, bcode, acode, dcode = groups[0]
        s = gcode.read_symbol(br)
        if s < _NUM_LITERAL:  # literal pixel: G then R, B, A
            g = s
            r = rcode.read_symbol(br)
            b = bcode.read_symbol(br)
            a = acode.read_symbol(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            argb[pos] = px
            cache_insert(px)
            pos += 1
        elif s < _NUM_LITERAL + _NUM_LENGTH:  # LZ77 backward reference
            length = _prefix_value(s - _NUM_LITERAL, br)
            dist_code = _prefix_value(dcode.read_symbol(br), br)
            if dist_code <= 120:
                raise NotImplementedError(
                    "VP8L 2D distance codes (<=120) not supported — "
                    "the spec's 120-entry neighborhood table cannot be "
                    "validated without libwebp in this container and a "
                    "transcription error would corrupt silently; "
                    "direct distances decode fully"
                )
            dist = dist_code - 120
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            for i in range(length):  # sequential: refs may overlap
                px = int(argb[pos - dist + i])
                argb[pos + i] = px
                cache_insert(px)
            pos += length
        else:  # color-cache hit
            idx = s - _NUM_LITERAL - _NUM_LENGTH
            if idx >= cache_size:
                raise ValueError("color-cache index out of range")
            px = cache[idx]
            argb[pos] = px
            cache_insert(px)
            pos += 1

    img = argb.reshape(h, xsize)

    for t in reversed(transforms):
        if t[0] == "subtract_green":
            ch = img.view(np.uint8).reshape(h, img.shape[1], 4)
            # little-endian uint32 ARGB -> byte order B, G, R, A
            g = ch[:, :, 1].astype(np.uint16)
            ch[:, :, 2] = ((ch[:, :, 2] + g) & 0xFF).astype(np.uint8)
            ch[:, :, 0] = ((ch[:, :, 0] + g) & 0xFF).astype(np.uint8)
        else:  # palette
            _, pal, pack_bits, true_w = t
            greens = ((img >> 8) & 0xFF).astype(np.uint16)
            if pack_bits:
                per = 1 << pack_bits
                ib = 8 >> pack_bits  # index width in bits
                cols = []
                for i in range(per):
                    cols.append((greens >> (i * ib)) & ((1 << ib) - 1))
                idx = np.stack(cols, axis=2).reshape(h, -1)[:, :true_w]
            else:
                idx = greens
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("VP8L palette index out of range")
            px = pal[idx.astype(np.int64)]  # (h, w, 4) B,G,R,A bytes
            img = px.copy().view(np.uint32).reshape(h, true_w)

    return img


def decode_vp8l(content: bytes) -> np.ndarray:
    """RIFF/WEBP/VP8L payload -> (H, W, 3) uint8 RGB, or (H, W, 4)
    RGBA when any pixel's alpha is not 255 (the decode_png shape
    contract). Lossy VP8 and VP8X-extended containers raise."""
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a WEBP RIFF container")
    off = 12
    payload = None
    while off + 8 <= len(content):
        tag = content[off:off + 4]
        (size,) = struct.unpack("<I", content[off + 4:off + 8])
        body = content[off + 8:off + 8 + size]
        if tag == b"VP8L":
            payload = body
            break
        if tag in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                f"WEBP {tag.decode().strip()} (lossy/extended) decode "
                "requires libwebp — only simple lossless (VP8L) "
                "containers are supported"
            )
        off += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8L chunk in WEBP container")
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-hint (informational)
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    img = _decode_image_stream(br, w, h, True)
    ch = img.view(np.uint8).reshape(h, w, 4)  # B, G, R, A (LE uint32)
    rgba = ch[:, :, [2, 1, 0, 3]]
    if bool((rgba[:, :, 3] == 255).all()):
        return np.ascontiguousarray(rgba[:, :, :3])
    return np.ascontiguousarray(rgba)
