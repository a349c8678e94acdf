"""Real numpy/stdlib media decoders (operators/multimodal.py)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from data_governance_spark.operators.multimodal import (
    decode_bmp,
    decode_image,
    decode_ppm,
    decode_wav,
    extract_features,
    image_features,
)


def ppm_bytes(w, h, pix=None, comment=False):
    """pix: (h, w, 3) uint8 array or None for a gradient."""
    if pix is None:
        pix = np.arange(w * h * 3, dtype=np.int64).reshape(h, w, 3) % 251
        pix = pix.astype(np.uint8)
    hdr = b"P6\n" + (b"# synthetic\n" if comment else b"") + (
        f"{w} {h}\n255\n".encode()
    )
    return hdr + pix.astype(np.uint8).tobytes(), pix.astype(np.uint8)


def bmp_bytes(w, h, pix):
    """pix: (h, w, 3) uint8 RGB, top-down logical; writes bottom-up."""
    row_bytes = (w * 3 + 3) & ~3
    data_off = 54
    size = data_off + row_bytes * h
    hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, data_off)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       row_bytes * h, 2835, 2835, 0, 0)
    body = b""
    for r in range(h - 1, -1, -1):  # bottom-up
        row = pix[r][:, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (row_bytes - len(row))
    return hdr + body


def wav_bytes(rate=8000, n=64, channels=1):
    samples = (np.arange(n * channels, dtype=np.int64) % 2003 - 1001).astype(
        np.int16
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue(), samples.reshape(-1, channels), rate


def test_ppm_roundtrip_with_comment_header():
    raw, pix = ppm_bytes(5, 3, comment=True)
    got = decode_ppm(raw)
    assert got.shape == (3, 5, 3)
    assert np.array_equal(got, pix)


def test_pgm_grayscale():
    pix = (np.arange(12, dtype=np.int64) % 200).astype(np.uint8).reshape(3, 4)
    raw = b"P5\n4 3\n255\n" + pix.tobytes()
    got = decode_ppm(raw)
    assert got.shape == (3, 4) and np.array_equal(got, pix)


def test_ppm_truncated_raises():
    raw, _ = ppm_bytes(4, 4)
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(raw[:-5])


def test_ppm_malformed_header_raises_clearly():
    # truncated INSIDE the header (fewer than 3 tokens present)
    with pytest.raises(ValueError, match="malformed netpbm header"):
        decode_ppm(b"P6\n4 ")
    # negative width: must be a header error, not a numpy reshape blowup
    with pytest.raises(ValueError, match="malformed netpbm header"):
        decode_ppm(b"P6\n-4 3\n255\n" + b"\x00" * 64)
    # non-numeric token
    with pytest.raises(ValueError, match="malformed netpbm header"):
        decode_ppm(b"P6\nfour 3\n255\n" + b"\x00" * 64)


def test_bmp_roundtrip_padding_and_bgr():
    pix = (np.arange(3 * 3 * 3, dtype=np.int64) % 250).astype(
        np.uint8
    ).reshape(3, 3, 3)  # w=3 -> 9 bytes/row, padded to 12
    got = decode_bmp(bmp_bytes(3, 3, pix))
    assert np.array_equal(got, pix)


def test_wav_roundtrip():
    raw, samples, rate = wav_bytes(channels=2)
    arr, got_rate = decode_wav(raw)
    assert got_rate == rate and np.array_equal(arr, samples)


def test_dispatch_and_compressed_magic():
    raw, _ = ppm_bytes(2, 2)
    assert decode_image(raw).shape == (2, 2, 3)
    # JPEG now dispatches to the REAL baseline decoder; a garbled
    # payload surfaces its typed corruption error
    with pytest.raises(ValueError, match="JPEG"):
        decode_image(b"\xff\xd8\xff\xe0rest")
    # WEBP now dispatches to the REAL VP8L decoder (r10): a container
    # with no VP8L chunk is a typed corruption error, and a LOSSY VP8
    # chunk still raises the documented environment-constraint error
    with pytest.raises(ValueError, match="VP8L"):
        decode_image(b"RIFFxxxxWEBP")
    import struct as _struct

    lossy = (
        b"RIFF" + _struct.pack("<I", 12) + b"WEBP"
        + b"VP8 " + _struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_image(lossy)
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"???")


def test_image_features_analytic():
    pix = np.zeros((2, 4, 3), dtype=np.uint8)
    pix[:, :, 0] = 10  # R plane constant
    pix[:, :, 1] = 20
    pix[:, :, 2] = 250
    raw = b"P6\n4 2\n255\n" + pix.tobytes()
    f = image_features(raw)
    assert f[:6] == [4.0, 2.0, 3.0, 10.0, 20.0, 250.0]
    assert f[6] == pytest.approx(np.array([10, 20, 250] * 8).std())


def test_extract_features_real_decoder(spark):
    raw1, pix1 = ppm_bytes(4, 2)
    rows = [(1, "image", bytearray(raw1), None)]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary, "
        "meta struct<mime:string,width:int,height:int,"
        "duration_ms:long,sample_rate:int>",
    )
    out = extract_features(df, decoder="real").collect()
    assert len(out) == 1
    f = out[0]["feature"]
    assert f[0] == 4.0 and f[1] == 2.0 and f[2] == 3.0
    assert out[0]["n_bytes"] == len(raw1)


# ---- GIF: hand-rolled spec encoder for round-trip testing ----------------
def _lzw_encode(indices, mcs):
    clear, end = 1 << mcs, (1 << mcs) + 1
    codes = [(clear, mcs + 1)]
    width = mcs + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    w = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        codes.append((table[w], width))
        if next_code < 4096:
            table[wk] = next_code
            # spec timing (matches real encoders + our decoder): bump
            # AFTER defining slot 1<<width — defining is free, only
            # wire codes are width-limited, and that slot is only
            # referenced post-bump
            if next_code >= (1 << width) and width < 12:
                width += 1
            next_code += 1
        w = (k,)
    if w:
        codes.append((table[w], width))
    codes.append((end, width))
    # LSB-first bit packing
    acc = bitn = 0
    out = bytearray()
    for code, cw in codes:
        acc |= code << bitn
        bitn += cw
        while bitn >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bitn -= 8
    if bitn:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_bytes(pix_idx, palette, interlace=False, animated_ext=False):
    """Minimal GIF89a: global palette, one image descriptor."""
    import struct

    h = len(pix_idx)
    w = len(pix_idx[0])
    n = len(palette)
    size_bits = max((n - 1).bit_length(), 1) - 1
    full = 2 ** (size_bits + 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_bits, 0, 0)
    for r, g, b in palette + [(0, 0, 0)] * (full - n):
        out += bytes((r, g, b))
    if animated_ext:  # a graphics-control extension to skip over
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    rows = list(range(h))
    if interlace:
        rows = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
    flat = [v for r in rows for v in pix_idx[r]]
    mcs = max(size_bits + 1, 2)
    data = _lzw_encode(flat, mcs)
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )
    out += bytes([mcs])
    for i in range(0, len(data), 200):
        chunk = data[i : i + 200]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


PALETTE4 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]


def test_gif_roundtrip_basic():
    from data_governance_spark.operators.multimodal import decode_gif

    pix = [[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]]
    got = decode_gif(gif_bytes(pix, PALETTE4))
    assert got.shape == (3, 4, 3)
    for r in range(3):
        for c in range(4):
            assert tuple(got[r][c]) == PALETTE4[pix[r][c]], (r, c)


def test_gif_lzw_dictionary_growth_and_random():
    """Random larger images force real dictionary growth (and width
    bumps) through encode->decode."""
    import random

    import numpy as np

    from data_governance_spark.operators.multimodal import decode_gif

    rng = random.Random(11)
    for trial in range(4):
        h, w = rng.randrange(5, 40), rng.randrange(5, 40)
        # runs of repeated values exercise KwKwK and growth
        pix = [
            [
                rng.choice([0, 1, 2, 3]) if rng.random() < 0.4 else 0
                for _ in range(w)
            ]
            for _ in range(h)
        ]
        got = decode_gif(gif_bytes(pix, PALETTE4))
        want = np.array(PALETTE4, dtype=np.uint8)[np.array(pix)]
        assert np.array_equal(got, want), trial


def test_gif_interlaced_and_extension_skip():
    import numpy as np

    from data_governance_spark.operators.multimodal import decode_gif

    pix = [[(r + c) % 4 for c in range(6)] for r in range(9)]
    got = decode_gif(
        gif_bytes(pix, PALETTE4, interlace=True, animated_ext=True)
    )
    want = np.array(PALETTE4, dtype=np.uint8)[np.array(pix)]
    assert np.array_equal(got, want)


def test_gif_dispatch_and_features():
    from data_governance_spark.operators.multimodal import (
        decode_image,
        image_features,
    )

    pix = [[0, 1], [2, 3]]
    raw = gif_bytes(pix, PALETTE4)
    img = decode_image(raw)
    assert img.shape == (2, 2, 3)
    f = image_features(raw)
    assert f[0] == 2.0 and f[1] == 2.0 and f[2] == 3.0
    # mean_R over palette entries 0..3
    assert f[3] == (255 + 0 + 0 + 10) / 4


def test_gif_malformed():
    import pytest as _pytest

    from data_governance_spark.operators.multimodal import decode_gif

    with _pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"GIF66aXXXX")
    ok = gif_bytes([[0, 1], [2, 3]], PALETTE4)
    with _pytest.raises(ValueError):
        decode_gif(ok[:20])  # truncated mid-structure


# ---- PNG: hand-rolled spec encoder for round-trip testing ----------------
def _png_chunk(typ, data):
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth_ref(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_pass(rows, bpp, filters):
    """Filter raw scanlines the NAIVE per-byte spec way (deliberately
    independent of the decoder's vectorized Sub/Up paths)."""
    out = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for y, raw in enumerate(rows):
        ft = filters[y % len(filters)]
        out.append(ft)
        for i, x in enumerate(raw):
            a = raw[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = x - a
            elif ft == 2:
                v = x - b
            elif ft == 3:
                v = x - ((a + b) >> 1)
            else:
                v = x - _paeth_ref(a, b, c)
            out.append(v & 0xFF)
        prev = raw
    return bytes(out)


_PNG_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def png_bytes(samples, ctype, depth=8, filters=(0,), interlace=False,
              palette=None):
    """samples: (h, w, channels) uint8 array of raw sample values
    (palette indices for ctype 3, un-scaled gray for depth<8)."""
    import zlib

    samples = np.asarray(samples, dtype=np.uint8)
    if samples.ndim == 2:
        samples = samples[:, :, None]
    h, w, channels = samples.shape
    bpp = max(1, channels * depth // 8)

    def pack_rows(sub):
        rows = []
        for y in range(sub.shape[0]):
            flat = sub[y].reshape(-1)
            if depth == 8:
                rows.append(bytes(flat))
            else:
                bits = np.unpackbits(flat[:, None], axis=1)[:, 8 - depth:]
                rows.append(bytes(np.packbits(bits.reshape(-1))))
        return rows

    body = bytearray()
    passes = _PNG_PASSES if interlace else ((0, 0, 1, 1),)
    for x0, y0, dx, dy in passes:
        sub = samples[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        body += _filter_pass(pack_rows(sub), bpp, filters)
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _png_chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, int(interlace)),
    )
    if palette is not None:
        out += _png_chunk(b"PLTE", bytes(v for rgb in palette for v in rgb))
    out += _png_chunk(b"IDAT", zlib.compress(bytes(body)))
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def test_png_rgb_all_filter_types():
    from data_governance_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(7)
    pix = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    for filters in [(0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)]:
        got = decode_png(png_bytes(pix, ctype=2, filters=filters))
        assert np.array_equal(got, pix), filters


def test_png_color_types_roundtrip():
    from data_governance_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(13)
    gray = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    assert np.array_equal(decode_png(png_bytes(gray, 0, filters=(4,))), gray)
    ga = rng.integers(0, 256, (4, 3, 2), dtype=np.uint8)
    assert np.array_equal(decode_png(png_bytes(ga, 4, filters=(3,))), ga)
    rgba = rng.integers(0, 256, (6, 5, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(png_bytes(rgba, 6, filters=(1, 4))), rgba)
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    idx = rng.integers(0, 4, (5, 5), dtype=np.uint8)
    got = decode_png(png_bytes(idx, 3, palette=pal, filters=(2,)))
    assert np.array_equal(got, np.array(pal, np.uint8)[idx])


def test_png_sub_byte_depths():
    from data_governance_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(3)
    for depth in (1, 2, 4):
        hi = 1 << depth
        g = rng.integers(0, hi, (6, 11), dtype=np.uint8)  # odd width: pad bits
        got = decode_png(png_bytes(g, 0, depth=depth))
        assert np.array_equal(got, g * (255 // (hi - 1))), depth
    # palette at depth 4
    pal = [(i * 16, 255 - i * 16, i) for i in range(16)]
    idx = rng.integers(0, 16, (7, 5), dtype=np.uint8)
    got = decode_png(png_bytes(idx, 3, depth=4, palette=pal))
    assert np.array_equal(got, np.array(pal, np.uint8)[idx])


def test_png_adam7_interlace():
    from data_governance_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(23)
    for h, w in [(1, 1), (3, 9), (7, 5), (16, 16), (13, 2)]:
        pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        got = decode_png(
            png_bytes(pix, 2, filters=(0, 1, 2, 3, 4), interlace=True)
        )
        assert np.array_equal(got, pix), (h, w)
    # interlaced palette at depth 2
    pal = [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)]
    idx = rng.integers(0, 4, (9, 7), dtype=np.uint8)
    got = decode_png(png_bytes(idx, 3, depth=2, palette=pal, interlace=True))
    assert np.array_equal(got, np.array(pal, np.uint8)[idx])


def test_png_unfilter_differential_vs_naive():
    """The decoder's vectorized Sub/cumsum and Up paths vs a direct
    per-byte spec reconstruction of the same filtered stream."""
    from data_governance_spark.operators.multimodal import _png_unfilter

    rng = np.random.default_rng(41)
    raw_rows = [bytes(rng.integers(0, 256, 15, dtype=np.uint8))
                for _ in range(8)]
    bpp = 3
    stream = _filter_pass(raw_rows, bpp, (1, 2, 0, 4, 3))
    got = _png_unfilter(stream, 0, 8, 15, bpp)
    want = np.frombuffer(b"".join(raw_rows), np.uint8).reshape(8, 15)
    assert np.array_equal(got, want)


def test_png_real_world_fixtures():
    """Decode PNGs shipped with the OS (independent producers — not
    our encoder): shape must match the IHDR, and values must be
    plausible pixels. Skips if the files are absent."""
    import glob
    import os

    from data_governance_spark.operators.multimodal import decode_png

    candidates = sorted(
        glob.glob("/usr/share/doc/python3/_static/*.png")
        + glob.glob("/usr/share/gitweb/static/*.png")
    )
    if not candidates:
        pytest.skip("no system PNG fixtures on this host")
    decoded = 0
    for path in candidates[:12]:
        content = open(path, "rb").read()
        w, h = struct.unpack_from(">II", content, 16)
        depth, ctype = content[24], content[25]
        if depth == 16:
            continue
        img = decode_png(content)
        assert img.shape[0] == h and img.shape[1] == w, path
        assert img.dtype == np.uint8
        decoded += 1
    assert decoded >= 3  # the python3-doc icons are 8-bit; they decode


def test_png_malformed():
    from data_governance_spark.operators.multimodal import decode_png

    ok = png_bytes(np.zeros((4, 4, 3), np.uint8), 2)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNX" + ok[4:])
    corrupt = bytearray(ok)
    corrupt[40] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))
    with pytest.raises(ValueError):
        decode_png(ok[:30])  # truncated mid-chunk
    deep = png_bytes(np.zeros((2, 2), np.uint8), 0)
    deep = bytearray(deep)
    deep[24] = 16  # claim 16-bit in IHDR
    # re-CRC the IHDR so the depth check (not the CRC check) fires
    import zlib as _zlib

    ihdr = bytes(deep[12:16]) + bytes(deep[16:29])
    deep[29:33] = struct.pack(">I", _zlib.crc32(ihdr) & 0xFFFFFFFF)
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_png(bytes(deep))


def test_png_dispatch_and_features():
    from data_governance_spark.operators.multimodal import (
        decode_image,
        image_features,
    )

    pix = np.zeros((2, 3, 4), np.uint8)
    pix[:, :, 0] = 8
    pix[:, :, 1] = 16
    pix[:, :, 2] = 32
    pix[:, :, 3] = 255
    raw = png_bytes(pix, 6)
    assert decode_image(raw).shape == (2, 3, 4)
    f = image_features(raw)
    assert f[:6] == [3.0, 2.0, 4.0, 8.0, 16.0, 32.0]
    # gray+alpha: gray mean repeated, channel count 2
    ga = np.zeros((2, 2, 2), np.uint8)
    ga[:, :, 0] = 77
    ga[:, :, 1] = 200
    f2 = image_features(png_bytes(ga, 4))
    assert f2[:6] == [2.0, 2.0, 2.0, 77.0, 77.0, 77.0]


# ---- compressed audio: G.711 + IMA ADPCM --------------------------------
def wav_container(tag, n_ch, rate, bits, block_align, data, extensible=False):
    fmt = struct.pack("<HHIIHH", 0xFFFE if extensible else tag, n_ch, rate,
                      rate * block_align, block_align, bits)
    if extensible:
        # cbSize=22, validbits, chanmask, GUID starting with the tag
        fmt += struct.pack("<HHI", 22, bits, 0) + struct.pack("<H", tag)
        fmt += b"\x00\x00" + b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    riff = b"WAVE"
    riff += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_g711_luts_match_audioop_exhaustively():
    audioop = pytest.importorskip("audioop")

    from data_governance_spark.operators.multimodal import _g711_luts

    mu, al = _g711_luts()
    codes = bytes(range(256))
    assert np.array_equal(mu, np.frombuffer(audioop.ulaw2lin(codes, 2),
                                            np.int16))
    assert np.array_equal(al, np.frombuffer(audioop.alaw2lin(codes, 2),
                                            np.int16))


def test_g711_wav_end_to_end():
    audioop = pytest.importorskip("audioop")

    t = np.arange(240, dtype=np.float64)
    pcm = (12000 * np.sin(t / 7)).astype(np.int16)
    for tag, enc, dec in ((7, audioop.lin2ulaw, audioop.ulaw2lin),
                          (6, audioop.lin2alaw, audioop.alaw2lin)):
        coded = enc(pcm.tobytes(), 2)
        raw = wav_container(tag, 1, 8000, 8, 1, coded)
        arr, rate = decode_wav(raw)
        want = np.frombuffer(dec(coded, 2), np.int16)
        assert rate == 8000
        assert np.array_equal(arr[:, 0], want)


def test_g711_stereo_and_extensible():
    audioop = pytest.importorskip("audioop")

    pcm = (np.arange(120, dtype=np.int64) * 257 - 15000).astype(np.int16)
    coded = audioop.lin2ulaw(pcm.tobytes(), 2)
    raw = wav_container(7, 2, 16000, 8, 2, coded, extensible=True)
    arr, rate = decode_wav(raw)
    want = np.frombuffer(audioop.ulaw2lin(coded, 2), np.int16).reshape(-1, 2)
    assert rate == 16000 and np.array_equal(arr, want)


def test_float32_wav():
    x = (np.sin(np.arange(50) / 3.0)).astype(np.float32)
    raw = wav_container(3, 1, 44100, 32, 4, x.tobytes())
    arr, rate = decode_wav(raw)
    assert rate == 44100 and arr.dtype == np.float32
    assert np.array_equal(arr[:, 0], x)


def test_ima_nibble_core_matches_audioop():
    """audioop.adpcm2lin is the same Intel/DVI algorithm minus WAV
    block framing (and packs high-nibble-first): random code streams
    decoded from random valid states must agree sample-for-sample,
    including predictor clamping and end state."""
    audioop = pytest.importorskip("audioop")

    import random

    from data_governance_spark.operators.multimodal import (
        _ima_decode_nibbles,
    )

    rng = random.Random(99)
    for _ in range(20):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(4, 60)))
        pred = rng.randrange(-30000, 30000)
        idx = rng.randrange(0, 89)
        dec, (p_ref, i_ref) = audioop.adpcm2lin(data, 2, (pred, idx))
        want = np.frombuffer(dec, np.int16)
        nib = []
        for b in data:  # audioop emits the HIGH nibble first
            nib.append(b >> 4)
            nib.append(b & 0x0F)
        out, p, i = _ima_decode_nibbles(nib, pred, idx)
        assert np.array_equal(np.asarray(out, np.int16), want)
        assert (p, i) == (p_ref, i_ref)


def ima_wav_bytes(samples, rate=8000, block_samples=505):
    """Test-side IMA ADPCM WAV encoder (mono): per-block 4-byte header
    (first sample verbatim + step index), then low-nibble-first codes.
    Emits the spec-required fmt extension (wSamplesPerBlock) and fact
    chunk (true sample count), so final-block pad nibbles must NOT
    surface as trailing samples."""
    from data_governance_spark.operators.multimodal import (
        _IMA_INDEX,
        _IMA_STEPS,
        _ima_decode_nibbles,
    )

    samples = list(int(s) for s in samples)
    idx = 0
    blocks = bytearray()
    block_align = 4 + (block_samples - 1 + 1) // 2
    i = 0
    while i < len(samples):
        chunk = samples[i : i + block_samples]
        i += block_samples
        pred = chunk[0]
        blocks += struct.pack("<hBB", pred, idx, 0)
        nibs = []
        for s in chunk[1:]:
            step = _IMA_STEPS[idx]
            delta = s - pred
            code = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                code |= 4
                delta -= step
            if delta >= step >> 1:
                code |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                code |= 1
            out, pred, idx = _ima_decode_nibbles([code], pred, idx)
            nibs.append(code)
        while len(nibs) < (block_align - 4) * 2:
            nibs.append(0)  # pad the block
        for a, b in zip(nibs[0::2], nibs[1::2]):
            blocks.append(a | (b << 4))  # low nibble first
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, rate, rate, block_align, 4,
                      2, block_samples)
    riff = b"WAVE"
    riff += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"fact" + struct.pack("<II", 4, len(samples))
    riff += b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    if len(blocks) % 2:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_ima_adpcm_wav_roundtrip():
    t = np.arange(1200, dtype=np.float64)
    pcm = (9000 * np.sin(t / 11) + 2000 * np.sin(t / 3)).astype(np.int16)
    raw = ima_wav_bytes(pcm, block_samples=505)
    arr, rate = decode_wav(raw)
    # fact + wSamplesPerBlock: the decoded length is EXACT — final-
    # block pad nibbles never surface as trailing samples
    assert arr.shape == (len(pcm), 1)
    got = arr[:, 0].astype(np.float64)
    err = np.abs(got - pcm.astype(np.float64))
    # ADPCM is lossy; error is bounded by the adaptive step size, and
    # the first samples carry the step-adaptation ramp (index starts 0)
    assert err.mean() < 120
    assert np.corrcoef(got, pcm)[0, 1] > 0.995
    assert np.corrcoef(got[100:], pcm[100:])[0, 1] > 0.999


def test_wav_corrupt_is_typed_valueerror():
    # truncated fmt chunk must be ValueError, not a raw struct.error
    bad = b"RIFF\x10\x00\x00\x00WAVEfmt \x04\x00\x00\x00\x01\x00\x01\x00"
    with pytest.raises(ValueError, match="WAV"):
        decode_wav(bad)
    # empty data chunk -> typed error from audio_features, not NaNs
    from data_governance_spark.operators.multimodal import audio_features

    empty = wav_container(1, 1, 8000, 16, 2, b"")
    with pytest.raises(ValueError, match="no samples"):
        audio_features(empty)


def test_wav_unknown_compression_raises():
    raw = wav_container(0x55, 1, 8000, 0, 1, b"\x00" * 16)  # MP3-in-WAV
    with pytest.raises(NotImplementedError, match="0x55"):
        decode_wav(raw)


def test_audio_features_and_arrow_dispatch(spark):
    from data_governance_spark.operators.multimodal import audio_features

    raw, samples, rate = wav_bytes(rate=8000, n=64, channels=2)
    f = audio_features(raw)
    assert f[:3] == [64.0, 2.0, 8000.0]
    assert f[3] == pytest.approx(samples.mean())
    # WAV payloads flow through the same decoder="real" Arrow path
    df = spark.createDataFrame(
        [(1, "audio", bytearray(raw), None)],
        "media_id long, kind string, content binary, "
        "meta struct<mime:string,width:int,height:int,"
        "duration_ms:long,sample_rate:int>",
    )
    out = extract_features(df, decoder="real").collect()
    assert out[0]["feature"][0] == 64.0 and out[0]["feature"][2] == 8000.0


# ---- media dedup ---------------------------------------------------------
def test_dedup_media_exact(spark):
    from data_governance_spark.operators.multimodal import dedup_media_exact

    rows = [
        (1, bytearray(b"payload-A")),
        (2, bytearray(b"payload-B")),
        (3, bytearray(b"payload-A")),  # exact dup of 1
        (7, bytearray(b"payload-A")),  # and another
        (9, bytearray(b"payload-C")),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r["media_id"]: (r["canonical_id"], r["group_size"])
        for r in dedup_media_exact(media).collect()
    }
    assert got == {1: (1, 3), 3: (1, 3), 7: (1, 3), 2: (2, 1), 9: (9, 1)}


def test_dedup_media_near(spark):
    from data_governance_spark.operators.multimodal import dedup_media_near

    # fake-decoder features are folded byte histograms: identical bytes
    # -> identical features (cosine 1); a small byte edit -> near-dup;
    # different content -> distant
    base = b"the quick brown fox jumps over the lazy dog " * 4
    near = b"the quick brown fox jumps over the lazy cat " * 4
    # the fake features are POSITIONAL byte histograms (bin = i % dim);
    # text has a near-uniform one, so 'far' must concentrate its mass
    # in a single position class to be genuinely distant in cosine
    far = bytes(255 if i % 8 == 0 else 0 for i in range(120))
    media = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(near)), (3, bytearray(far)),
         (4, bytearray(base))],
        "media_id long, content binary",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup_media_near(media, threshold=0.99).collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] == pytest.approx(1.0)
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert not any(3 in p for p in pairs)


def test_prepare_media_corpus(spark):
    from data_governance_spark.corpus import prepare_media_corpus

    rows = [
        (1, "image", bytearray(b"AAAA" * 10), None),
        (2, "image", bytearray(b"BBBB" * 10), None),
        (3, "image", bytearray(b"AAAA" * 10), None),  # exact dup of 1
        (4, "image", bytearray(b"AAAB" * 10), None),  # near-dup of 1
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary, "
        "meta struct<mime:string,width:int,height:int,"
        "duration_ms:long,sample_rate:int>",
    )
    res = prepare_media_corpus(media, near_dedup=True, near_threshold=0.9)
    kept_ids = {r["media_id"] for r in res.kept.collect()}
    assert kept_ids == {1, 2, 4}  # 3 collapsed into 1
    feats = res.features.collect()
    assert {r["media_id"] for r in feats} == kept_ids
    groups = {
        r["media_id"]: r["group_size"] for r in res.exact_groups.collect()
    }
    assert groups[1] == 2 and groups[2] == 1
    pairs = {(r["id_a"], r["id_b"]) for r in res.near_pairs.collect()}
    assert (1, 4) in pairs  # survivor-level near-dup flagged


def test_dedup_media_exact_null_payloads_are_singletons(spark):
    """A missing payload is unknown content, not a duplicate of other
    missing payloads — null-content rows must each survive as their
    own group (rows never vanish)."""
    from data_governance_spark.operators.multimodal import dedup_media_exact

    media = spark.createDataFrame(
        [(1, bytearray(b"X")), (2, None), (3, None), (4, bytearray(b"X"))],
        "media_id long, content binary",
    )
    got = {
        r["media_id"]: (r["canonical_id"], r["group_size"])
        for r in dedup_media_exact(media).collect()
    }
    assert got == {1: (1, 2), 4: (1, 2), 2: (2, 1), 3: (3, 1)}


def test_decode_image_avi_first_frame_and_wav_guidance():
    from test_jpeg_codec import avi_bytes, jpeg_bytes

    img = np.full((8, 8), 131, np.uint8)
    raw = avi_bytes([jpeg_bytes(img, quality=90)])
    first = decode_image(raw)
    assert first.shape == (8, 8)
    wav, _, _ = wav_bytes()
    with pytest.raises(ValueError, match="audio"):
        decode_image(wav)


# ---- Sun AU + AIFF -------------------------------------------------------
def _cpy_test_dir():
    """CPython's own test-data directory (ships with every <=3.12)."""
    import os
    import test

    return os.path.dirname(test.__file__)


_CPY_TEST = _cpy_test_dir()


def test_au_mulaw_fixture_matches_sunau_reference():
    """CPython's audiotest.au is a real mu-law recording: decode must
    equal audioop.ulaw2lin over the raw frames sunau returns."""
    import os

    audioop = pytest.importorskip("audioop")
    sunau = pytest.importorskip("sunau")

    from data_governance_spark.operators.multimodal import decode_au

    path = os.path.join(_CPY_TEST, "audiotest.au")
    if not os.path.exists(path):
        pytest.skip("no CPython AU fixture on this host")
    arr, rate = decode_au(open(path, "rb").read())
    with sunau.open(path) as f:
        assert f.getcomptype() == "ULAW"
        # sunau.readframes ALREADY mu-law-decodes via audioop — the
        # stdlib chain is the independent reference for our LUT path
        want = np.frombuffer(f.readframes(f.getnframes()), np.int16)
        assert rate == f.getframerate()
    assert arr.shape == (len(want), 1)
    assert np.array_equal(arr[:, 0], want)


def test_au_pcm16_and_synthetic_encodings():
    import struct

    from data_governance_spark.operators.multimodal import decode_au

    pcm = (np.arange(40, dtype=np.int64) * 331 - 6000).astype(np.int16)

    def au(enc, payload, n_ch=2, rate=44100):
        return (
            b".snd"
            + struct.pack(">IIIII", 24, len(payload), enc, rate, n_ch)
            + payload
        )

    arr, rate = decode_au(au(3, pcm.astype(">i2").tobytes()))
    assert rate == 44100 and np.array_equal(arr, pcm.reshape(-1, 2))
    s8 = (np.arange(20, dtype=np.int64) % 200 - 100).astype(np.int8)
    arr8, _ = decode_au(au(2, s8.tobytes(), n_ch=1))
    assert np.array_equal(arr8[:, 0], s8)
    with pytest.raises(NotImplementedError, match="encoding 6"):
        decode_au(au(6, b"\x00" * 16))
    with pytest.raises(ValueError, match="not an AU"):
        decode_au(b"nope")


def test_aiff_fixture_matches_aifc_reference():
    import os
    import warnings

    aifc = pytest.importorskip("aifc")

    from data_governance_spark.operators.multimodal import decode_aiff

    path = os.path.join(_CPY_TEST, "sndhdrdata", "sndhdr.aiff")
    if not os.path.exists(path):
        pytest.skip("no CPython AIFF fixture on this host")
    arr, rate = decode_aiff(open(path, "rb").read())
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        f = aifc.open(path)
        want = np.frombuffer(
            f.readframes(f.getnframes()), ">i2"
        ).astype(np.int16).reshape(-1, f.getnchannels())
        assert rate == int(f.getframerate())
        f.close()
    assert np.array_equal(arr, want)


def test_aiff_synthetic_roundtrip_via_stdlib_writer(tmp_path):
    """aifc WRITES the file (an independent producer), we decode it —
    incl. the 80-bit extended-float rate field. (A real file path:
    aifc.close() patches the header and closes the underlying file.)"""
    import warnings

    aifc = pytest.importorskip("aifc")

    from data_governance_spark.operators.multimodal import decode_aiff

    pcm = (np.arange(120, dtype=np.int64) * 97 - 5000).astype(np.int16)
    path = str(tmp_path / "synth.aiff")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        f = aifc.open(path, "wb")
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(22050)
        f.writeframes(pcm.astype(">i2").tobytes())
        f.close()
    arr, rate = decode_aiff(open(path, "rb").read())
    assert rate == 22050
    assert np.array_equal(arr, pcm.reshape(-1, 2))


def test_decode_audio_dispatch_and_features():
    from data_governance_spark.operators.multimodal import (
        audio_features,
        decode_audio,
    )
    import struct

    raw, samples, rate = wav_bytes()
    arr, r = decode_audio(raw)
    assert r == rate and np.array_equal(arr, samples)
    pcm = np.full(32, 1000, np.int16)
    au = (b".snd" + struct.pack(">IIIII", 24, 64, 3, 8000, 1)
          + pcm.astype(">i2").tobytes())
    f = audio_features(au)
    assert f[:3] == [32.0, 1.0, 8000.0] and f[3] == 1000.0
    with pytest.raises(ValueError, match="unrecognized audio"):
        decode_audio(b"????" * 4)


def test_au_honors_declared_data_size():
    import struct

    from data_governance_spark.operators.multimodal import decode_au

    pcm = np.arange(10, dtype=np.int16)
    payload = pcm.astype(">i2").tobytes()
    raw = (b".snd" + struct.pack(">IIIII", 24, len(payload), 3, 8000, 1)
           + payload + b"TRAILING-ANNOTATION-GARBAGE!")
    arr, _ = decode_au(raw)
    # trailing bytes after the declared size are NOT audio
    assert arr.shape == (10, 1) and np.array_equal(arr[:, 0], pcm)


def test_aiff_corrupt_exponent_is_typed_valueerror():
    import struct

    from data_governance_spark.operators.multimodal import decode_aiff

    comm = struct.pack(">hIh", 1, 0, 16) + struct.pack(">H", 0x7FFE) \
        + struct.pack(">Q", 1 << 63)
    body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">III", 12, 0, 0) + b"\x00\x00\x00\x00")
    raw = b"FORM" + struct.pack(">I", len(body)) + body
    with pytest.raises(ValueError, match="AIFF"):
        decode_aiff(raw)


def test_aiff_ssnd_padding_not_decoded():
    """COMM numSampleFrames bounds the output, like the aifc
    reference — SSND block padding is not audio."""
    import struct

    from data_governance_spark.operators.multimodal import decode_aiff

    pcm = np.arange(6, dtype=np.int16)
    data = pcm.astype(">i2").tobytes() + b"\x00" * 8  # 4 pad "frames"
    comm = struct.pack(">hIh", 1, 6, 16) + struct.pack(">H", 16398) \
        + struct.pack(">Q", 0xAC44 << 48)
    body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">III", len(data) + 8, 0, 0)[:4]
            + struct.pack(">II", 0, 0) + data)
    raw = b"FORM" + struct.pack(">I", len(body)) + body
    arr, rate = decode_aiff(raw)
    assert arr.shape == (6, 1) and np.array_equal(arr[:, 0], pcm)
    assert rate == 44100
