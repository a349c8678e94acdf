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
