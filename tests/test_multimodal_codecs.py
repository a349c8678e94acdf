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
    with pytest.raises(NotImplementedError, match="JPEG"):
        decode_image(b"\xff\xd8\xff\xe0rest")
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
