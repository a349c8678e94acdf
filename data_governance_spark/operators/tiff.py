"""TIFF decoder — pure stdlib+numpy, the same codec-tier rules as
PNG/JPEG/VP8L (operators/multimodal.py, jpeg.py, vp8l.py): decode for
REAL what the format's public spec (TIFF 6.0, Adobe 1992) makes
stdlib-feasible, raise a LOUD typed error everywhere else, never
silently fake pixels.

What decodes for REAL:

- **Container**: both byte orders (``II``/``MM``), IFD walk with
  bounded entry counts, inline-vs-offset value resolution for all the
  baseline field types, multi-page via ``decode_tiff_pages`` (the
  first page is ``decode_tiff``'s contract, matching the AVI
  first-frame thumbnail rule).
- **Layouts**: stripped images (``RowsPerStrip``/``StripOffsets``/
  ``StripByteCounts``), gray 1/4/8-bit (both ``PhotometricInterpretation``
  polarities — WhiteIsZero inverts), 8-bit RGB / RGBA (extra samples
  kept, matching decode_png's gray+alpha posture), palette
  (``ColorMap``'s 16-bit entries scale down to 8).
- **Compressions**: none (1), LZW (5 — the SAME MSB-first 9→12-bit
  coder as PDF's LZWDecode, reused from ``operators/pdf.py`` where it
  is validated against ISO 32000-1's own worked example; TIFF always
  uses EarlyChange=1), PackBits (32773), Deflate (8 and the old 32946
  code, stdlib zlib), each optionally under the horizontal-differencing
  predictor (tag 317 = 2, per-sample cumulative sum), and the fax tier
  — CCITT G4/MMR (4), G3 with EOL framing (3, 1D and T4Options-bit-0
  mixed 2D) and 1-D Modified Huffman (2) via ``operators/ccitt.py``
  (bilevel, per-strip streams, both photometric polarities, both fill
  orders).

Loud typed boundaries (``ValueError``, matching decode_image's
contract): tiled layouts (322/324), old-style and new-style
JPEG-in-TIFF (6/7), 16-bit samples, planar configuration 2, float
samples. Each names the exact unsupported feature.

Reference twin: none — training-data extension per SURVEY.md §6 (TIFF
6.0 is a public spec; scanned-document corpora are full of it).
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["decode_tiff", "decode_tiff_pages", "is_tiff_payload"]

# baseline tags
_W, _H = 256, 257
_BITS = 258
_COMP = 259
_PHOTO = 262
_STRIP_OFF = 273
_SPP = 277
_ROWS_PER_STRIP = 278
_STRIP_CNT = 279
_PREDICTOR = 317
_COLORMAP = 320
_TILE_W = 322
_TILE_OFF = 324
_PLANAR = 284
_FILL_ORDER = 266
_T4_OPTIONS = 292

# field type byte widths (TIFF 6.0 §2)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
# per-byte bit reversal for FillOrder 2 (LSB-first bytes)
_BITREV = bytes(int(f"{i:08b}"[::-1], 2) for i in range(256))
_MAX_IFD_ENTRIES = 4096
_MAX_PAGES = 64


def is_tiff_payload(content: bytes) -> bool:
    return content[:4] in (b"II*\x00", b"MM\x00*")


def _packbits(data: bytes, expect: int) -> bytes:
    """PackBits RLE (TIFF 6.0 §9). Unlike PDF RunLengthDecode's 128
    EOD, 0x80 is a no-op here; decoding stops at ``expect`` bytes."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expect:
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            if i < n:
                out += bytes([data[i]]) * (257 - c)
                i += 1
        # c == 128: no-op
    return bytes(out)


def _read_ifd(buf: bytes, off: int, fmt: str) -> tuple[dict, int]:
    """One IFD -> ({tag: value-or-list}, next_ifd_offset)."""
    if off + 2 > len(buf):
        raise ValueError("TIFF: IFD offset out of range")
    (count,) = struct.unpack_from(fmt + "H", buf, off)
    if count > _MAX_IFD_ENTRIES:
        raise ValueError(f"TIFF: IFD entry count {count} over cap")
    entries: dict[int, object] = {}
    pos = off + 2
    for _ in range(count):
        if pos + 12 > len(buf):
            raise ValueError("TIFF: truncated IFD entry")
        tag, typ, n = struct.unpack_from(fmt + "HHI", buf, pos)
        size = _TYPE_SIZE.get(typ, 0) * n
        if size == 0:
            pos += 12
            continue  # unknown field type: skip, per spec readers may
        if size <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(fmt + "I", buf, pos + 8)
            if voff + size > len(buf):
                raise ValueError(f"TIFF: tag {tag} value out of range")
        if typ in (3, 8):  # SHORT
            vals = list(struct.unpack_from(f"{fmt}{n}H", buf, voff))
        elif typ in (4, 9):  # LONG
            vals = list(struct.unpack_from(f"{fmt}{n}I", buf, voff))
        elif typ in (1, 6, 7, 2):  # BYTE-ish
            vals = list(buf[voff : voff + n])
        elif typ in (5, 10):  # RATIONAL: keep numerators, unused here
            vals = [
                struct.unpack_from(fmt + "II", buf, voff + 8 * i)[0]
                for i in range(n)
            ]
        else:
            vals = []
        entries[tag] = vals[0] if n == 1 else vals
        pos += 12
    if pos + 4 > len(buf):
        return entries, 0  # truncated next-IFD pointer: last page
    (nxt,) = struct.unpack_from(fmt + "I", buf, pos)
    return entries, nxt


def _as_list(v) -> list:
    return v if isinstance(v, list) else [v]


def _decode_page(buf: bytes, d: dict, fmt: str):
    import numpy as np

    w = d.get(_W)
    h = d.get(_H)
    if not isinstance(w, int) or not isinstance(h, int) or w < 1 or h < 1:
        raise ValueError(f"TIFF: bad dimensions {w!r}x{h!r}")
    if w * h > 64_000_000:
        raise ValueError(f"TIFF: image too large {w}x{h}")
    if _TILE_W in d or _TILE_OFF in d:
        raise ValueError("TIFF: tiled layout not supported (strips only)")
    if d.get(_PLANAR, 1) != 1:
        raise ValueError("TIFF: planar configuration 2 not supported")
    comp = d.get(_COMP, 1)
    if comp in (6, 7):
        raise ValueError("TIFF: JPEG-in-TIFF not supported")
    if comp not in (1, 2, 3, 4, 5, 8, 32773, 32946):
        raise ValueError(f"TIFF: unknown compression {comp}")
    photo = d.get(_PHOTO, 1)
    spp = d.get(_SPP, 1)
    bits_l = _as_list(d.get(_BITS, 1 if spp == 1 else [8] * spp))
    if len(set(bits_l)) != 1:
        raise ValueError(f"TIFF: mixed bits per sample {bits_l}")
    bits = bits_l[0]
    if spp == 1:
        if bits not in (1, 4, 8):
            raise ValueError(f"TIFF: unsupported gray depth {bits}")
    else:
        if bits != 8:
            raise ValueError(f"TIFF: {bits}-bit multi-sample not supported")
        if spp not in (3, 4):
            raise ValueError(f"TIFF: {spp} samples/pixel not supported")
    if photo not in (0, 1, 2, 3):
        raise ValueError(f"TIFF: photometric {photo} not supported")
    if photo == 3 and (spp != 1 or bits not in (1, 4, 8)):
        raise ValueError("TIFF: palette requires 1/4/8-bit single sample")

    offs = [v for v in _as_list(d.get(_STRIP_OFF, [])) if isinstance(v, int)]
    cnts = [v for v in _as_list(d.get(_STRIP_CNT, [])) if isinstance(v, int)]
    if not offs:
        raise ValueError("TIFF: no strip offsets")
    if len(cnts) < len(offs):
        raise ValueError("TIFF: strip counts shorter than offsets")
    rps = d.get(_ROWS_PER_STRIP, h)
    if not isinstance(rps, int) or rps < 1:
        rps = h

    fill = d.get(_FILL_ORDER, 1)
    if fill not in (1, 2):
        raise ValueError(f"TIFF: bad FillOrder {fill!r}")

    def _fix_fill(raw: bytes) -> bytes:
        # FillOrder 2 (LSB-first bytes — common in fax-originated
        # TIFFs): bit-reverse every byte so all downstream bit readers
        # stay MSB-first. Silently ignoring the tag would bit-reverse
        # every sub-byte image with NO error.
        if fill == 1:
            return raw
        a = np.frombuffer(raw, dtype=np.uint8)
        return np.frombuffer(_BITREV, dtype=np.uint8)[a].tobytes()

    if comp in (2, 3, 4):
        # fax tier (operators/ccitt.py): bilevel only; each strip is an
        # independent G4/MH/G3 stream of its rows. Decoded pixels are
        # ink-black=0 / paper-white=255 — photometric 0 (WhiteIsZero,
        # the fax default) is that orientation already; 1 inverts.
        if spp != 1 or bits != 1:
            raise ValueError(
                f"TIFF: CCITT requires 1-bit single-sample, got "
                f"{bits}@{spp}"
            )
        if photo == 3:
            raise ValueError(
                "TIFF: palette-over-fax not supported (the ColorMap "
                "would be silently ignored)"
            )
        from data_governance_spark.operators.ccitt import (
            decode_g3,
            decode_g4,
            decode_mh,
        )

        t4opts = d.get(_T4_OPTIONS, 0)
        g3_2d = isinstance(t4opts, int) and bool(t4opts & 1)
        parts = []
        for i, off in enumerate(offs):
            if off + cnts[i] > len(buf):
                raise ValueError("TIFF: strip out of range")
            nrows = min(rps, h - i * rps)
            if nrows <= 0:
                break
            raw = _fix_fill(buf[off : off + cnts[i]])
            if comp == 4:
                parts.append(decode_g4(raw, w, rows=nrows))
            elif comp == 3:
                parts.append(decode_g3(raw, w, rows=nrows, two_d=g3_2d))
            else:
                parts.append(decode_mh(raw, w, nrows))
        img = np.concatenate(parts, axis=0)
        if img.shape[0] < h:
            raise ValueError(
                f"TIFF: fax strips cover {img.shape[0]} of {h} rows"
            )
        return img if photo != 1 else 255 - img

    stride = (w * spp * bits + 7) // 8

    rows = []
    for i, off in enumerate(offs):
        if off + cnts[i] > len(buf):
            raise ValueError("TIFF: strip out of range")
        raw = buf[off : off + cnts[i]]
        if fill == 2:
            if comp == 1 and bits < 8:
                raw = _fix_fill(raw)  # uncompressed bilevel fax scans
            else:
                raise ValueError(
                    "TIFF: FillOrder 2 only supported for fax "
                    "compressions or uncompressed sub-byte data"
                )
        nrows = min(rps, h - i * rps)
        if nrows <= 0:
            break
        expect = stride * nrows
        if comp == 1:
            data = raw
        elif comp == 5:
            from data_governance_spark.operators.pdf import (
                PdfError,
                _lzw_decode,
            )

            try:
                data = _lzw_decode(raw, early=1)
            except PdfError as e:
                raise ValueError(f"TIFF: LZW strip: {e}") from None
        elif comp in (8, 32946):
            try:
                data = zlib.decompress(raw)
            except zlib.error as e:
                raise ValueError(f"TIFF: deflate strip: {e}") from None
        else:  # 32773
            data = _packbits(raw, expect)
        if len(data) < expect:
            raise ValueError(
                f"TIFF: strip {i} short: {len(data)} < {expect}"
            )
        rows.append(
            np.frombuffer(data[:expect], np.uint8).reshape(nrows, stride)
        )
    arr = np.concatenate(rows, axis=0)
    if arr.shape[0] < h:
        raise ValueError(f"TIFF: strips cover {arr.shape[0]} of {h} rows")

    if d.get(_PREDICTOR, 1) == 2:
        if bits != 8:
            raise ValueError("TIFF: predictor 2 requires 8-bit samples")
        # horizontal differencing: per-sample cumulative sum along rows
        samples = arr[:, : w * spp].reshape(h, w, spp)
        arr = np.cumsum(samples.astype(np.uint32), axis=1).astype(
            np.uint8
        ).reshape(h, w * spp)
        stride = w * spp
    elif d.get(_PREDICTOR, 1) != 1:
        raise ValueError(f"TIFF: predictor {d.get(_PREDICTOR)} unsupported")

    # unpack samples
    if bits == 8:
        flat = arr[:, : w * spp]
        img = flat.reshape(h, w) if spp == 1 else flat.reshape(h, w, spp)
        vals = img
    else:
        b = np.unpackbits(arr, axis=1)
        if bits == 1:
            vals = b[:, :w]
        else:  # 4
            grouped = b[:, : w * 4].reshape(h, w, 4)
            weights = np.array([8, 4, 2, 1], dtype=np.uint16)
            vals = (grouped * weights).sum(axis=2)
    if photo == 3:
        cmap = _as_list(d.get(_COLORMAP, []))
        n_ent = 1 << bits
        if len(cmap) < 3 * n_ent:
            raise ValueError("TIFF: palette shorter than 3*2^bits")
        import numpy as _np

        pal = (
            _np.asarray(cmap[: 3 * n_ent], dtype=_np.uint32)
            .reshape(3, n_ent)
            .T
        )
        pal8 = (pal // 257).astype(_np.uint8)  # 16-bit entries scale
        idx = vals.astype(_np.int64)
        if int(idx.max()) >= n_ent:
            raise ValueError("TIFF: palette index out of range")
        return pal8[idx]
    if spp == 1:
        if bits == 1:
            out = vals.astype(np.uint8) * 255
        elif bits == 4:
            out = (vals * 17).astype(np.uint8)
        else:
            out = vals.astype(np.uint8)
        if photo == 0:  # WhiteIsZero: invert so 0 is black like PNG/PPM
            out = 255 - out
        return out
    return vals  # RGB / RGBA uint8


def decode_tiff_pages(content: bytes, max_pages: int | None = None):
    """All pages (IFDs) of a TIFF -> list of numpy uint8 arrays. Page
    count is bounded; an IFD-offset cycle raises."""
    if not is_tiff_payload(content):
        raise ValueError("not a TIFF payload (no II*/MM* header)")
    if len(content) < 8:
        raise ValueError("TIFF: truncated header")
    fmt = "<" if content[:2] == b"II" else ">"
    (off,) = struct.unpack_from(fmt + "I", content, 4)
    out = []
    seen = set()
    cap = min(max_pages or _MAX_PAGES, _MAX_PAGES)
    while off and len(out) < cap:
        if off in seen:
            raise ValueError("TIFF: IFD offset cycle")
        seen.add(off)
        d, off = _read_ifd(content, off, fmt)
        out.append(_decode_page(content, d, fmt))
    if not out:
        raise ValueError("TIFF: no IFDs")
    return out


def decode_tiff(content: bytes):
    """First page of a TIFF -> numpy uint8 (H, W) / (H, W, 3) /
    (H, W, 4) — the same thumbnail contract as AVI's first frame."""
    return decode_tiff_pages(content, max_pages=1)[0]
