"""Baseline JPEG decoder (operators/jpeg.py) — round-trips through a
hand-rolled spec encoder, exact solid-color reconstruction, and
real-world fixtures from independent encoders (OS + Spark mllib)."""

from __future__ import annotations

import glob
import struct

import numpy as np
import pytest

from data_governance_spark.operators.jpeg import ZIGZAG, decode_jpeg


# ---- spec encoder (tests only) -------------------------------------------
def _fdct_basis():
    u = np.arange(8)
    x = np.arange(8)
    b = np.cos((2 * x[None, :] + 1) * u[:, None] * np.pi / 16)
    b[0] *= 1 / np.sqrt(2)
    return b * 0.5


def _quant_tables(quality):
    base = 16 + 2.0 * (np.arange(8)[:, None] + np.arange(8)[None, :])
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    lum = np.clip((base * scale + 50) // 100, 1, 255)
    return lum, np.clip(lum * 1.5, 1, 255)


def _cat(v):
    """(size, raw-bits) for a DC diff / AC coefficient value."""
    s = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _block_ops(qcoefs, pred):
    """Entropy ops for one quantized block (natural order) given the
    component's DC predictor; returns (ops, new_pred). Each op is
    (kind, sym, extra_bits_val, extra_bits_n) with kind 'dc'/'ac'."""
    ops = []
    dc = int(qcoefs[0])
    s, bits = _cat(dc - pred)
    ops.append(("dc", s, bits, s))
    run = 0
    zz = [int(qcoefs[ZIGZAG[k]]) for k in range(64)]
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ops.append(("ac", 0xF0, 0, 0))
            run -= 16
        s, bits = _cat(v)
        ops.append(("ac", (run << 4) | s, bits, s))
        run = 0
    if run:
        ops.append(("ac", 0x00, 0, 0))
    return ops, dc


def _fixed_table(symbols):
    """A valid canonical Huffman table with all codes the same length:
    simple, complete enough, and the all-ones code stays unused (the
    spec reserves it). DHT carries it, so the decoder needs no
    assumptions about 'standard' tables."""
    syms = sorted(set(symbols)) or [0]
    n = len(syms)
    length = 1
    while (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return syms, bits, {s: (length, i) for i, s in enumerate(syms)}


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1-bits
        return bytes(self.buf)


def jpeg_bytes(img, quality=90, subsample=False, restart_interval=0):
    """Baseline JFIF encoder: gray (h,w) or RGB (h,w,3) uint8;
    optional 4:2:0 subsampling and restart markers."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    qlum, qchr = _quant_tables(quality)
    if gray:
        planes = [img]
        samp = [(1, 1)]
        qts = [0]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            h2 = (cb.shape[0] + 1) // 2 * 2
            w2 = (cb.shape[1] + 1) // 2 * 2
            cb = np.pad(cb, ((0, h2 - cb.shape[0]), (0, w2 - cb.shape[1])),
                        mode="edge")
            cr = np.pad(cr, ((0, h2 - cr.shape[0]), (0, w2 - cr.shape[1])),
                        mode="edge")
            cb = cb.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qts = [0, 1, 1]
    h, w = img.shape[0], img.shape[1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    basis = _fdct_basis()
    qtabs = [qlum, qchr]

    # quantize every block of every component (padded to MCU coverage)
    qblocks = []
    for p, (sh, sv), tq in zip(planes, samp, qts):
        need_h, need_w = mcuy * sv * 8, mcux * sh * 8
        p = np.pad(p, ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])),
                   mode="edge")
        nby, nbx = need_h // 8, need_w // 8
        blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3) - 128.0
        f = np.einsum("ux,mnxy,vy->mnuv", basis, blocks, basis)
        qblocks.append(np.round(f / qtabs[tq]))

    # entropy ops per restart segment (DC preds reset per segment)
    segments = [[]]
    preds = [0] * len(planes)
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            segments.append([])
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, (sh, sv) in enumerate(samp):
            for by in range(sv):
                for bx in range(sh):
                    blk = qblocks[ci][my * sv + by, mx * sh + bx].reshape(64)
                    ops, preds[ci] = _block_ops(blk, preds[ci])
                    segments[-1].extend(
                        (ci == 0, kind, sym, val, nb)
                        for kind, sym, val, nb in ops
                    )

    tables = {}  # (cls, tid) -> (syms, bits, code_map)
    for cls, kind in ((0, "dc"), (1, "ac")):
        for tid, is_lum in ((0, True), (1, False)):
            if gray and not is_lum:
                continue
            syms = [
                sym
                for seg in segments
                for lum, knd, sym, _v, _n in seg
                if knd == kind and lum == is_lum
            ]
            if not gray or is_lum:
                tables[(cls, tid)] = _fixed_table(syms)

    out = bytearray(b"\xff\xd8")
    for tid, qtab in enumerate(qtabs[: 1 if gray else 2]):
        zz = bytes(int(qtab.reshape(64)[ZIGZAG[k]]) for k in range(64))
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes((ci + 1, (samp[ci][0] << 4) | samp[ci][1], qts[ci]))
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for (cls, tid), (syms, bits, _m) in sorted(tables.items()):
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for ci in range(nc):
        tid = 0 if ci == 0 else 1
        sos += bytes((ci + 1, (tid << 4) | tid))
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    for si, seg in enumerate(segments):
        bw = _BitWriter()
        for is_lum, kind, sym, val, nb in seg:
            cls = 0 if kind == "dc" else 1
            tid = 0 if (is_lum or gray) else 1
            ln, code = tables[(cls, tid)][2][sym]
            bw.write(code, ln)
            if nb:
                bw.write(val, nb)
        out += bw.flush()
        if si < len(segments) - 1:
            out += bytes((0xFF, 0xD0 + si % 8))
    out += b"\xff\xd9"
    return bytes(out)


def _smooth(h, w, rgb=True, seed=5):
    """Low-frequency test image: quantization error stays small."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = 96 + 48 * np.sin(yy / 9.0) + 48 * np.cos(xx / 11.0)
    if not rgb:
        return np.clip(base, 0, 255).astype(np.uint8)
    return np.clip(
        np.stack([base, 255 - base, base / 2 + 60], axis=2), 0, 255
    ).astype(np.uint8)


def test_jpeg_gray_roundtrip():
    img = _smooth(24, 33, rgb=False)
    got = decode_jpeg(jpeg_bytes(img, quality=95))
    assert got.shape == img.shape
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 3 and err.max() < 32


def test_jpeg_rgb_444_roundtrip():
    img = _smooth(17, 26)
    got = decode_jpeg(jpeg_bytes(img, quality=95))
    assert got.shape == img.shape
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 4 and err.max() < 48


def test_jpeg_rgb_420_with_restarts():
    img = _smooth(37, 45)
    raw = jpeg_bytes(img, quality=92, subsample=True, restart_interval=2)
    assert b"\xff\xdd" in raw and b"\xff\xd0" in raw  # DRI + RST0 present
    got = decode_jpeg(raw)
    assert got.shape == img.shape
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 6 and err.max() < 64


def test_jpeg_solid_color_exact():
    """A solid color whose DC lands on the quantization grid must
    reconstruct EXACTLY: all AC are zero and round(F00/q)*q == F00."""
    qlum, _ = _quant_tables(90)
    q00 = qlum[0, 0]
    val = int(128 + q00)  # Y DC diff = 8*(val-128) = 8*q00 -> exact
    img = np.full((16, 16), val, np.uint8)
    got = decode_jpeg(jpeg_bytes(img, quality=90))
    assert np.array_equal(got, img)


def test_jpeg_real_world_fixtures():
    """Baseline JPEGs from independent encoders: Spark's own mllib
    test images and the gcloud/requests docs. Shape must match the
    SOF0 header; pixel stats must be plausible photographs."""
    candidates = sorted(
        glob.glob(
            "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
            "kittens/*.jpg"
        )
        + glob.glob(
            "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/"
            "requests/ext/*.jpg"
        )
    )
    if not candidates:
        pytest.skip("no baseline JPEG fixtures on this host")
    decoded = 0
    for path in candidates[:3]:
        content = open(path, "rb").read()
        img = decode_jpeg(content)
        assert img.ndim == 3 and img.dtype == np.uint8
        assert 10 < img.mean() < 245 and img.std() > 5, path
        decoded += 1
    assert decoded >= 1


def test_jpeg_progressive_white_stripe_semantics():
    """Real progressive (SOF2) fixtures whose CONTENT is known from
    the filename: the nodejs doc images are white stripes, so the
    decoded pixels must be overwhelmingly near-white — a semantic
    check no structural parse can fake."""
    path = "/usr/share/doc/nodejs/full-white-stripe.jpg"
    if not glob.glob(path):
        pytest.skip("no progressive fixture on this host")
    img = decode_jpeg(open(path, "rb").read())
    assert img.shape == (312, 493, 3)
    assert (img.min(axis=2) > 240).mean() > 0.9


def test_jpeg_progressive_vs_baseline_cross_format():
    """Spark mllib ships the same scene twice: a PROGRESSIVE grayscale
    and a BASELINE color image. Decoding both through the two code
    paths and correlating gray vs luma cross-validates the
    progressive spectral-selection/refinement algorithms against the
    independently-exercised sequential path (and against two
    independent third-party encoders)."""
    base = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
    gpath = base + "multi-channel/grayscale.jpg"
    cpath = base + "multi-channel/chr30.4.184.jpg"
    if not (glob.glob(gpath) and glob.glob(cpath)):
        pytest.skip("no mllib fixtures on this host")
    g = decode_jpeg(open(gpath, "rb").read()).astype(float)
    c = decode_jpeg(open(cpath, "rb").read()).astype(float)
    luma = 0.299 * c[:, :, 0] + 0.587 * c[:, :, 1] + 0.114 * c[:, :, 2]
    assert g.shape == luma.shape
    corr = np.corrcoef(g.ravel(), luma.ravel())[0, 1]
    assert corr > 0.99
    assert np.abs(g - luma).mean() < 8


def test_jpeg_malformed():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\xff\xd7junk")
    ok = jpeg_bytes(_smooth(8, 8, rgb=False))
    with pytest.raises(ValueError):
        decode_jpeg(ok[: len(ok) // 2])


def test_jpeg_dispatch_and_features():
    from data_governance_spark.operators.multimodal import (
        decode_image,
        image_features,
    )

    img = _smooth(16, 16)
    raw = jpeg_bytes(img, quality=95)
    assert decode_image(raw).shape == (16, 16, 3)
    f = image_features(raw)
    assert f[:3] == [16.0, 16.0, 3.0]
    assert abs(f[3] - img[:, :, 0].mean()) < 4


# ---- MJPEG-in-AVI video --------------------------------------------------
def avi_bytes(frame_payloads, usec_per_frame=40000):
    """Minimal AVI muxer: hdrl with avih (frame rate), movi LIST of
    00dc chunks. Word-aligns odd-length chunks per RIFF rules."""

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack("<14I", usec_per_frame, 0, 0, 0x10,
                       len(frame_payloads), 0, 1, 0, 0, 0, 0, 0, 0, 0)
    hdrl = b"LIST" + struct.pack(
        "<I", 4 + len(chunk(b"avih", avih))
    ) + b"hdrl" + chunk(b"avih", avih)
    movi_body = b"".join(chunk(b"00dc", p) for p in frame_payloads)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_mjpeg_frame_decode():
    from data_governance_spark.operators.multimodal import decode_avi_mjpeg
    from data_governance_spark.operators.jpeg import decode_jpeg  # noqa: F401

    # solid grays on the quantization grid decode EXACTLY (see
    # test_jpeg_solid_color_exact), so frame content is checkable
    qlum, _ = _quant_tables(90)
    q00 = int(qlum[0, 0])
    vals = [128 + q00 * k for k in (-2, -1, 0, 1, 2)]
    frames = [jpeg_bytes(np.full((16, 24), v, np.uint8), quality=90)
              for v in vals]
    raw = avi_bytes(frames, usec_per_frame=100000)  # 10 fps
    got, fps = decode_avi_mjpeg(raw)
    assert fps == pytest.approx(10.0)
    assert len(got) == 5
    for img, v in zip(got, vals):
        assert img.shape == (16, 24)
        assert np.array_equal(img, np.full((16, 24), v, np.uint8))
    # frame sampling: every 2nd frame
    got2, _ = decode_avi_mjpeg(raw, every_n=2)
    assert [int(f[0, 0]) for f in got2] == [vals[0], vals[2], vals[4]]
    got3, _ = decode_avi_mjpeg(raw, max_frames=2)
    assert len(got3) == 2


def test_avi_malformed_and_non_mjpeg():
    from data_governance_spark.operators.multimodal import decode_avi_mjpeg

    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_mjpeg(b"RIFFxxxxWAVEdata")
    empty = avi_bytes([])
    with pytest.raises(ValueError, match="no stream-0"):
        decode_avi_mjpeg(empty)
    with pytest.raises(NotImplementedError, match="not MJPEG"):
        decode_avi_mjpeg(avi_bytes([b"\x00\x01\x02\x03"]))


def test_frame_features_arrow_path(spark):
    from data_governance_spark.operators.multimodal import frame_features

    qlum, _ = _quant_tables(90)
    q00 = int(qlum[0, 0])
    vals = [128 + q00, 128 - q00 * 2]
    frames = [jpeg_bytes(np.full((8, 8), v, np.uint8), quality=90)
              for v in vals]
    raw = avi_bytes(frames, usec_per_frame=50000)
    df = spark.createDataFrame(
        [(7, "video", bytearray(raw), None)],
        "media_id long, kind string, content binary, "
        "meta struct<mime:string,width:int,height:int,"
        "duration_ms:long,sample_rate:int>",
    )
    rows = frame_features(df).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in rows] == [0, 1]
    assert rows[0]["fps"] == pytest.approx(20.0)
    for r, v in zip(rows, vals):
        f = r["feature"]
        assert f[:3] == [8.0, 8.0, 1.0]
        assert f[3] == float(v) and f[6] == 0.0


def test_jpeg_fill_bytes_between_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker; real encoders emit them for alignment."""
    img = _smooth(8, 8, rgb=False)
    ok = jpeg_bytes(img, quality=95)
    # inject fill bytes before the DQT marker (right after SOI)
    padded = ok[:2] + b"\xff\xff\xff" + ok[2:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(ok))


def test_avi_corrupt_is_typed_valueerror():
    from data_governance_spark.operators.multimodal import decode_avi_mjpeg

    img = _smooth(8, 8, rgb=False)
    ok = avi_bytes([jpeg_bytes(img)])
    # LIST length pointing past EOF: either a typed ValueError or a
    # clean decode of whatever frames survive the clamp — never a raw
    # struct.error/RecursionError, and never silent garbage
    bogus = bytearray(ok)
    bogus[16:20] = struct.pack("<I", 2**31)
    try:
        frames, _fps = decode_avi_mjpeg(bytes(bogus))
    except ValueError:
        pass
    else:
        assert all(f.shape == (8, 8) for f in frames)
    # truncated mid-container
    with pytest.raises(ValueError):
        decode_avi_mjpeg(ok[:40])


def test_frame_features_null_content_row_preserved(spark):
    from data_governance_spark.operators.multimodal import frame_features

    img = _smooth(8, 8, rgb=False)
    raw = avi_bytes([jpeg_bytes(img)])
    df = spark.createDataFrame(
        [(1, "video", bytearray(raw), None), (2, "video", None, None)],
        "media_id long, kind string, content binary, "
        "meta struct<mime:string,width:int,height:int,"
        "duration_ms:long,sample_rate:int>",
    )
    rows = {r["media_id"]: r for r in frame_features(df).collect()}
    assert set(rows) == {1, 2}  # the null-content row did NOT vanish
    assert rows[2]["feature"] is None and rows[2]["frame_idx"] is None
    assert rows[1]["feature"] is not None
