"""FLAC decoder (operators/flac.py) — LOSSLESS means the round-trip
through this spec encoder must be bit-EXACT, across subframe types,
Rice partition orders, escape partitions, stereo decorrelation modes
and multi-frame streams. CRCs are computed here with table-based
implementations (vs the decoder's bit-loop ones) so a polynomial slip
cannot cancel."""

from __future__ import annotations

import numpy as np
import pytest

from data_governance_spark.operators.flac import FIXED_COEFS, decode_flac


def _make_crc_table(poly, width):
    table = []
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_T8 = _make_crc_table(0x07, 8)
_T16 = _make_crc_table(0x8005, 16)


def crc8(data):
    crc = 0
    for b in data:
        crc = _T8[crc ^ b]
    return crc


def crc16(data):
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _T16[(crc >> 8) ^ b]
    return crc


class _BW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, val, bits):
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = self.n = 0

    def sw(self, val, bits):
        self.w(val & ((1 << bits) - 1), bits)

    def unary(self, q):
        for _ in range(q):
            self.w(0, 1)
        self.w(1, 1)

    def align(self):
        while self.n:
            self.w(0, 1)


def _rice_encode(bw, values, k, escape_bits=None, kbits=4):
    if escape_bits is not None:  # verbatim partition
        bw.w((1 << kbits) - 1, kbits)
        bw.w(escape_bits, 5)
        for v in values:
            bw.sw(v, escape_bits)
        return
    bw.w(k, kbits)
    for v in values:
        u = (v << 1) if v >= 0 else (-v << 1) - 1
        bw.unary(u >> k)
        if k:
            bw.w(u & ((1 << k) - 1), k)


def _pick_k(values):
    if not values:
        return 0
    m = sum(abs(v) for v in values) / len(values)
    k = 0
    while (1 << k) < m + 1 and k < 14:
        k += 1
    return k


def _encode_subframe(bw, samples, bps, mode, fixed_order, p_order,
                     force_escape, wasted=0, kbits=4,
                     lpc=None):
    if wasted:
        assert all(s % (1 << wasted) == 0 for s in samples)
        samples = [s >> wasted for s in samples]
        bps -= wasted

    def wasted_flag():
        if wasted:
            bw.w(1, 1)
            bw.unary(wasted - 1)
        else:
            bw.w(0, 1)

    if mode == "constant":
        bw.w(0, 1)
        bw.w(0, 6)
        wasted_flag()
        bw.sw(samples[0], bps)
        return
    if mode == "verbatim":
        bw.w(0, 1)
        bw.w(1, 6)
        wasted_flag()
        for s in samples:
            bw.sw(s, bps)
        return
    if mode == "lpc":
        coefs, shift, precision = lpc
        order = len(coefs)
        bw.w(0, 1)
        bw.w(32 | (order - 1), 6)
        wasted_flag()
        for s in samples[:order]:
            bw.sw(s, bps)
        bw.w(precision - 1, 4)
        bw.sw(shift, 5)
        for c in coefs:
            bw.sw(c, precision)
        res = [
            samples[i]
            - (sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
               >> shift)
            for i in range(order, len(samples))
        ]
    else:
        order = fixed_order
        bw.w(0, 1)
        bw.w(8 + order, 6)
        wasted_flag()
        for s in samples[:order]:
            bw.sw(s, bps)
        coefs = FIXED_COEFS[order]
        res = [
            samples[i]
            - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, len(samples))
        ]
    bw.w(kbits - 4, 2)  # 0 = 4-bit Rice, 1 = 5-bit Rice
    bw.w(p_order, 4)
    n_parts = 1 << p_order
    bs = len(samples)
    assert bs % n_parts == 0
    assert bs // n_parts > order, "first partition must outlast warmup"
    idx = 0
    for part in range(n_parts):
        n = bs // n_parts - (order if part == 0 else 0)
        chunk = res[idx : idx + n]
        idx += n
        if force_escape and part == 0:
            bits = max((abs(v).bit_length() + 1 for v in chunk), default=1)
            _rice_encode(bw, chunk, 0, escape_bits=bits, kbits=kbits)
        else:
            _rice_encode(bw, chunk, _pick_k(chunk), kbits=kbits)


def flac_bytes(samples, rate=8000, bps=16, blocksize=192, mode="fixed",
               fixed_order=2, stereo=None, p_order=0, force_escape=False,
               wasted=0, kbits=4, lpc=None):
    """samples: (n, ch) int array. stereo: None|'ls'|'rs'|'ms'."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, n_ch = samples.shape
    out = bytearray(b"fLaC")
    si = _BW()
    si.w(blocksize, 16)
    si.w(blocksize, 16)
    si.w(0, 24)
    si.w(0, 24)
    si.w(rate, 20)
    si.w(n_ch - 1, 3)
    si.w(bps - 1, 5)
    si.w(n, 36)
    si.buf += bytes(16)  # md5 unset
    out += bytes([0x80]) + len(si.buf).to_bytes(3, "big") + si.buf

    for fno, start in enumerate(range(0, n, blocksize)):
        blk = samples[start : start + blocksize]
        bs = blk.shape[0]
        hdr = _BW()
        hdr.w(0x3FFE, 14)
        hdr.w(0, 1)
        hdr.w(0, 1)  # fixed blocking
        hdr.w(7, 4)  # blocksize: 16-bit value-1 follows
        hdr.w(0, 4)  # sample rate from STREAMINFO
        if stereo is None:
            hdr.w(n_ch - 1, 4)
        else:
            hdr.w({"ls": 8, "rs": 9, "ms": 10}[stereo], 4)
        hdr.w(0, 3)  # sample size from STREAMINFO
        hdr.w(0, 1)
        assert fno < 128
        hdr.w(fno, 8)  # UTF-8 single byte
        hdr.w(bs - 1, 16)
        hdr.align()
        frame = bytearray(hdr.buf)
        frame.append(crc8(frame))

        body = _BW()
        if stereo is None:
            chans = [(blk[:, c].tolist(), bps) for c in range(n_ch)]
        else:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = (left - right).tolist()
            if stereo == "ls":
                chans = [(left.tolist(), bps), (side, bps + 1)]
            elif stereo == "rs":
                chans = [(side, bps + 1), (right.tolist(), bps)]
            else:
                mid = ((left + right) >> 1).tolist()
                chans = [(mid, bps), (side, bps + 1)]
        for ch, cbps in chans:
            _encode_subframe(body, ch, cbps, mode, fixed_order, p_order,
                             force_escape, wasted=wasted, kbits=kbits,
                             lpc=lpc)
        body.align()
        frame += body.buf
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)


def _sig(n, ch=1, seed=3, amp=9000):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    base = amp * np.sin(t[:, None] / (5 + np.arange(ch)))
    return (base + rng.integers(-40, 40, (n, ch))).astype(np.int16)


def test_flac_fixed_orders_exact():
    pcm = _sig(400)
    for order in (0, 1, 2, 3, 4):
        raw = flac_bytes(pcm, mode="fixed", fixed_order=order)
        arr, rate = decode_flac(raw)
        assert rate == 8000
        assert np.array_equal(arr, pcm), order


def test_flac_constant_verbatim_and_partitions():
    const = np.full((192, 1), -1234, np.int16)
    arr, _ = decode_flac(flac_bytes(const, mode="constant"))
    assert np.array_equal(arr, const)
    pcm = _sig(192)
    arr, _ = decode_flac(flac_bytes(pcm, mode="verbatim"))
    assert np.array_equal(arr, pcm)
    for p in (1, 2, 3):
        arr, _ = decode_flac(flac_bytes(pcm, fixed_order=2, p_order=p))
        assert np.array_equal(arr, pcm), p
    # escape (verbatim) partition
    arr, _ = decode_flac(flac_bytes(pcm, fixed_order=1, force_escape=True))
    assert np.array_equal(arr, pcm)


def test_flac_stereo_modes_exact():
    pcm = _sig(384, ch=2)
    for st in (None, "ls", "rs", "ms"):
        arr, _ = decode_flac(flac_bytes(pcm, stereo=st))
        assert np.array_equal(arr, pcm), st


def test_flac_multi_frame_stream():
    pcm = _sig(1000)  # 6 frames at blocksize 192
    arr, rate = decode_flac(flac_bytes(pcm, blocksize=192, fixed_order=2))
    assert arr.shape == (1000, 1)
    assert np.array_equal(arr, pcm)


def test_flac_crc_detects_corruption():
    pcm = _sig(192)
    ok = flac_bytes(pcm)
    bad = bytearray(ok)
    bad[-40] ^= 0x10  # flip a bit inside the frame payload
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"fLaX" + ok[4:])
    with pytest.raises(ValueError):
        decode_flac(ok[: len(ok) // 2])


def test_flac_audio_dispatch():
    from data_governance_spark.operators.multimodal import (
        audio_features,
        decode_audio,
    )

    pcm = _sig(200)
    raw = flac_bytes(pcm, rate=16000)
    arr, rate = decode_audio(raw)
    assert rate == 16000 and np.array_equal(arr, pcm)
    f = audio_features(raw)
    assert f[:3] == [200.0, 1.0, 16000.0]


def test_flac_lpc_wasted_bits_and_rice5():
    """The real-world-dominant paths: LPC subframes (precision/shift/
    coefficient parse + shifted prediction), wasted-bits unpacking,
    and the 5-bit Rice parameter width — all bit-exact."""
    pcm = _sig(384)
    # LPC order 2, coefs in 4-bit signed range, shift 1
    arr, _ = decode_flac(
        flac_bytes(pcm, mode="lpc", lpc=([3, -1], 1, 4))
    )
    assert np.array_equal(arr, pcm)
    # LPC order 3 with a bigger shift and 6-bit precision
    arr, _ = decode_flac(
        flac_bytes(pcm, mode="lpc", lpc=([5, -4, 2], 2, 6))
    )
    assert np.array_equal(arr, pcm)
    # wasted bits: samples divisible by 4 -> encoder strips 2 bits,
    # decoder must shift them back in (on fixed AND constant paths)
    pcm4 = (pcm.astype(np.int32) & ~3).astype(np.int16)
    arr, _ = decode_flac(flac_bytes(pcm4, mode="fixed", wasted=2))
    assert np.array_equal(arr, pcm4)
    const = np.full((192, 1), -4096, np.int16)
    arr, _ = decode_flac(flac_bytes(const, mode="constant", wasted=3))
    assert np.array_equal(arr, const)
    # 5-bit Rice parameter width (residual method 1)
    arr, _ = decode_flac(flac_bytes(pcm, fixed_order=2, kbits=5))
    assert np.array_equal(arr, pcm)
    # LPC under mid/side stereo too
    st = _sig(192, ch=2)
    arr, _ = decode_flac(
        flac_bytes(st, mode="lpc", lpc=([3, -1], 1, 4), stereo="ms")
    )
    assert np.array_equal(arr, st)


def test_flac_frame_bps_mismatch_rejected():
    pcm = _sig(192)
    ok = bytearray(flac_bytes(pcm))
    # frame header byte carrying ss_code: flip 'from STREAMINFO' (000)
    # to 24-bit (110); find it right after the 4-byte sync+codes —
    # header layout: 2B sync/flags, 1B bs|sr codes, 1B ch|ss codes
    fstart = ok.index(b"\xff\xf8")
    b3 = ok[fstart + 3]
    ok[fstart + 3] = (b3 & 0xF1) | (6 << 1)  # ss_code=6 (24-bit)
    import struct as _s
    # re-CRC the header so the bps check (not CRC-8) fires
    from data_governance_spark.operators.flac import _crc8
    hdr_end = fstart + 6  # sync..coded number(1B)+blocksize(2B)? find CRC byte by re-scan
    # simpler: recompute over the real header span: everything up to
    # the old CRC byte, whose position is unchanged by the bit edit
    # (header length is fixed for this encoder: 4 + 1 + 2 = 7 bytes)
    hdr_len = 7
    ok[fstart + hdr_len] = _crc8(bytes(ok[fstart : fstart + hdr_len]))
    with pytest.raises(ValueError, match="sample size exceeds"):
        decode_flac(bytes(ok))
