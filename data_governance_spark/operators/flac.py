"""FLAC decoder, pure stdlib+numpy — no libFLAC.

FLAC is lossless: Rice-coded residuals of fixed or LPC linear
predictors, with optional inter-channel decorrelation. Everything is
bit arithmetic — no transform math, no codec library — so a complete
decoder fits here: stream/metadata parse (STREAMINFO), frame headers
(UTF-8-coded frame numbers, CRC-8 verified), all four subframe types
(CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32), Rice
partition decoding with both 4- and 5-bit parameter widths and the
escape-to-verbatim case, wasted-bits unpacking, and the left/side,
right/side and mid/side stereo reconstructions.

Validation (tests/test_flac_codec.py): decoding is LOSSLESS, so the
round-trip through the test-side spec encoder must be bit-EXACT —
a far stricter oracle than the tolerance checks lossy codecs get —
across subframe types, Rice partition orders, stereo modes and
multi-frame streams; the Rice/unary and fixed-predictor primitives
are additionally pinned against hand-computed bitstreams.

Scale note: same as the other codecs — per-payload decode is
Python-speed serial bit work; corpus-scale parallelism comes from
mapInPandas over Arrow batches.
"""

from __future__ import annotations

FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


class _Bits:
    """MSB-first bit reader with byte-position access (CRC spans)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        d = self.data
        if p + n > len(d) * 8:
            raise ValueError("truncated FLAC bitstream")
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        p = self.pos
        d = self.data
        nbits = len(d) * 8
        while p < nbits and not (d[p >> 3] >> (7 - (p & 7))) & 1:
            q += 1
            p += 1
        if p >= nbits:
            raise ValueError("truncated FLAC unary run")
        self.pos = p + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


def _read_utf8_number(br: _Bits) -> int:
    """FLAC's UTF-8-style coded frame/sample number (up to 7 bytes)."""
    first = br.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x40
    while first & mask:
        n += 1
        mask >>= 1
    if n == 0 or n > 6:
        raise ValueError("corrupt FLAC coded number")
    val = first & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("corrupt FLAC coded number continuation")
        val = (val << 6) | (c & 0x3F)
    return val


_BLOCKSIZE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_SAMPLE_SIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _decode_residual(br: _Bits, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    kbits = 4 + method  # Rice parameter width
    escape = (1 << kbits) - 1
    p_order = br.read(4)
    out: list[int] = []
    n_parts = 1 << p_order
    if blocksize % n_parts:
        raise ValueError("FLAC partition order does not divide blocksize")
    for part in range(n_parts):
        n = blocksize // n_parts - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        k = br.read(kbits)
        if k == escape:  # verbatim partition
            raw_bits = br.read(5)
            for _ in range(n):
                out.append(br.sread(raw_bits) if raw_bits else 0)
        else:
            for _ in range(n):
                q = br.unary()
                v = (q << k) | br.read(k)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _predict(warmup: list[int], residual: list[int], coefs: list[int],
             shift: int) -> list[int]:
    out = list(warmup)
    o = len(coefs)
    for r in residual:
        acc = sum(c * out[-1 - j] for j, c in enumerate(coefs))
        out.append(r + (acc >> shift))
    return out


def _decode_subframe(br: _Bits, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("corrupt FLAC subframe header padding bit")
    t = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits flag: unary count - 1 follows
        wasted = br.unary() + 1
        bps -= wasted
    if t == 0:  # CONSTANT
        out = [br.sread(bps)] * blocksize
    elif t == 1:  # VERBATIM
        out = [br.sread(bps) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # FIXED order t-8
        order = t - 8
        warmup = [br.sread(bps) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        out = _predict(warmup, res, FIXED_COEFS[order], 0)
    elif t >= 32:  # LPC order t-31
        order = t - 31
        warmup = [br.sread(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = br.sread(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.sread(precision) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        out = _predict(warmup, res, coefs, shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(content: bytes):
    """FLAC -> (numpy int16/int32 array of shape (frames, channels),
    sample_rate). Verifies each frame header's CRC-8."""
    import numpy as np

    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    try:
        pos = 4
        streaminfo = None
        while pos + 4 <= len(content):
            hdr = content[pos]
            ln = int.from_bytes(content[pos + 1 : pos + 4], "big")
            body = content[pos + 4 : pos + 4 + ln]
            pos += 4 + ln
            if hdr & 0x7F == 0:
                streaminfo = body
            if hdr & 0x80:  # last metadata block
                break
        if streaminfo is None or len(streaminfo) < 18:
            raise ValueError("FLAC missing STREAMINFO")
        si = _Bits(streaminfo)
        si.read(16)  # min blocksize
        si.read(16)  # max blocksize
        si.read(24)
        si.read(24)
        rate = si.read(20)
        n_ch = si.read(3) + 1
        bps = si.read(5) + 1
        total = si.read(36)
        if rate == 0 or bps > 32:
            raise ValueError("malformed FLAC STREAMINFO")

        channels: list[list[int]] = [[] for _ in range(n_ch)]
        br = _Bits(content, pos * 8)
        while (total == 0 or len(channels[0]) < total) and (
            br.pos + 16 <= len(content) * 8
        ):
            frame_start_byte = br.pos >> 3
            sync = br.read(14)
            if sync != 0x3FFE:
                raise ValueError("lost FLAC frame sync")
            br.read(1)  # reserved
            br.read(1)  # blocking strategy
            bs_code = br.read(4)
            sr_code = br.read(4)
            ch_code = br.read(4)
            ss_code = br.read(3)
            br.read(1)  # reserved
            _read_utf8_number(br)
            if bs_code == 0:
                raise ValueError("reserved FLAC blocksize code")
            elif bs_code in _BLOCKSIZE:
                blocksize = _BLOCKSIZE[bs_code]
            elif bs_code == 6:
                blocksize = br.read(8) + 1
            elif bs_code == 7:
                blocksize = br.read(16) + 1
            else:  # 8-15
                blocksize = 256 << (bs_code - 8)
            if sr_code == 12:
                br.read(8)
            elif sr_code in (13, 14):
                br.read(16)
            fbps = _SAMPLE_SIZE.get(ss_code, bps)
            if fbps > bps:
                # the output dtype is sized from STREAMINFO's bps; a
                # wider frame would silently wrap sample values
                raise ValueError(
                    "FLAC frame sample size exceeds STREAMINFO bps"
                )
            br.align()  # header ends byte-aligned before CRC-8
            hdr_end = br.pos >> 3
            if _crc8(content[frame_start_byte:hdr_end]) != content[hdr_end]:
                raise ValueError("FLAC frame header CRC-8 mismatch")
            br.read(8)  # the CRC byte itself

            if ch_code < 8:
                if ch_code + 1 != n_ch:
                    raise ValueError("FLAC frame channel-count mismatch")
                subs = [
                    _decode_subframe(br, blocksize, fbps)
                    for _ in range(n_ch)
                ]
            elif ch_code in (8, 9, 10):
                if n_ch != 2:
                    raise ValueError("FLAC stereo decorrelation on non-stereo")
                # the SIDE channel carries one extra bit
                if ch_code == 8:  # left/side
                    left = _decode_subframe(br, blocksize, fbps)
                    side = _decode_subframe(br, blocksize, fbps + 1)
                    subs = [left, [l - s for l, s in zip(left, side)]]
                elif ch_code == 9:  # right/side (side first)
                    side = _decode_subframe(br, blocksize, fbps + 1)
                    right = _decode_subframe(br, blocksize, fbps)
                    subs = [[r + s for r, s in zip(right, side)], right]
                else:  # mid/side
                    mid = _decode_subframe(br, blocksize, fbps)
                    side = _decode_subframe(br, blocksize, fbps + 1)
                    subs = [[], []]
                    for m, s in zip(mid, side):
                        m2 = (m << 1) | (s & 1)
                        subs[0].append((m2 + s) >> 1)
                        subs[1].append((m2 - s) >> 1)
            else:
                raise ValueError("reserved FLAC channel assignment")
            br.align()
            frame_end = br.pos >> 3
            crc = int.from_bytes(content[frame_end : frame_end + 2], "big")
            if _crc16(content[frame_start_byte:frame_end]) != crc:
                raise ValueError("FLAC frame CRC-16 mismatch")
            br.read(16)
            for c in range(n_ch):
                channels[c].extend(subs[c])
    except IndexError as exc:
        raise ValueError(f"truncated or corrupt FLAC payload: {exc}")

    n = len(channels[0]) if total == 0 else min(len(channels[0]), total)
    dtype = np.int16 if bps <= 16 else np.int32
    arr = np.empty((n, n_ch), dtype)
    for c in range(n_ch):
        arr[:, c] = channels[c][:n]
    return arr, rate
