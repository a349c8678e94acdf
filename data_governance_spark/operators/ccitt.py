"""CCITT Group 4 (ITU-T T.6 MMR) and Modified-Huffman fax decoding —
the scanned-document compression behind PDF ``CCITTFaxDecode`` image
XObjects and TIFF compressions 2/4, pure stdlib+numpy.

Why this table transcription is admissible under the VP8L rule
("never ship spec tables you cannot validate — silent corruption is
worse than a raise"): MH run-length coding is SELF-CHECKING in a way
VP8L's predictor tables are not. Every decoded line's runs must sum
EXACTLY to ``columns`` and the mode stream must stay in sync with the
reference line's changing elements — a transcription error in a code
assignment almost surely breaks the width accounting or desyncs the
prefix stream within a line, which this decoder turns into a typed
``ValueError``, not plausible wrong pixels. Residual risk (two errors
cancelling inside one line) is documented here, and the tests pin the
structural properties the spec fixes: the code sets are prefix-free,
Kraft-complete together with the EOL region, the famous codewords
(white-0 ``00110101``, black-0 ``0000110111``, V0 ``1``, H ``001``,
P ``0001``) are hard-coded, and encoder round-trips cover EVERY run
length 0..2560 in both colors plus randomized images.

Supported: T.6 (G4/MMR — PDF /K < 0, TIFF compression 4) with
optional ``EncodedByteAlign``; T.4 one-dimensional Modified Huffman
WITHOUT EOLs (TIFF compression 2, byte-aligned rows); T.4 Group 3
with EOL framing in both 1D (PDF /K = 0) and mixed 2D (/K > 0, tag
bit per line) modes — TIFF compression 3 with or without T4Options
bit 0.

Output convention: a uint8 gray image, 0 = black ink, 255 = white
paper (CCITT lines start white). PDF's ``BlackIs1`` only matters when
re-packing to 1-bit samples — the callers handle polarity.

Reference twin: none — training-data extension per SURVEY.md §6
(ITU-T T.4/T.6 are public specs).
"""

from __future__ import annotations

import bisect

__all__ = [
    "decode_g4",
    "decode_g3",
    "decode_mh",
    "WHITE_CODES",
    "BLACK_CODES",
]

# ITU-T T.4 §2.4.2: terminating (0..63) + makeup (64..1728) codes,
# (run: (bit_length, code_value)). Extended makeups (1792..2560,
# T.4 §2.4.2.1) are shared by both colors.
WHITE_CODES = {
    0: (8, 0x35), 1: (6, 0x07), 2: (4, 0x07), 3: (4, 0x08),
    4: (4, 0x0B), 5: (4, 0x0C), 6: (4, 0x0E), 7: (4, 0x0F),
    8: (5, 0x13), 9: (5, 0x14), 10: (5, 0x07), 11: (5, 0x08),
    12: (6, 0x08), 13: (6, 0x03), 14: (6, 0x34), 15: (6, 0x35),
    16: (6, 0x2A), 17: (6, 0x2B), 18: (7, 0x27), 19: (7, 0x0C),
    20: (7, 0x08), 21: (7, 0x17), 22: (7, 0x03), 23: (7, 0x04),
    24: (7, 0x28), 25: (7, 0x2B), 26: (7, 0x13), 27: (7, 0x24),
    28: (7, 0x18), 29: (8, 0x02), 30: (8, 0x03), 31: (8, 0x1A),
    32: (8, 0x1B), 33: (8, 0x12), 34: (8, 0x13), 35: (8, 0x14),
    36: (8, 0x15), 37: (8, 0x16), 38: (8, 0x17), 39: (8, 0x28),
    40: (8, 0x29), 41: (8, 0x2A), 42: (8, 0x2B), 43: (8, 0x2C),
    44: (8, 0x2D), 45: (8, 0x04), 46: (8, 0x05), 47: (8, 0x0A),
    48: (8, 0x0B), 49: (8, 0x52), 50: (8, 0x53), 51: (8, 0x54),
    52: (8, 0x55), 53: (8, 0x24), 54: (8, 0x25), 55: (8, 0x58),
    56: (8, 0x59), 57: (8, 0x5A), 58: (8, 0x5B), 59: (8, 0x4A),
    60: (8, 0x4B), 61: (8, 0x32), 62: (8, 0x33), 63: (8, 0x34),
    64: (5, 0x1B), 128: (5, 0x12), 192: (6, 0x17), 256: (7, 0x37),
    320: (8, 0x36), 384: (8, 0x37), 448: (8, 0x64), 512: (8, 0x65),
    576: (8, 0x68), 640: (8, 0x67), 704: (9, 0xCC), 768: (9, 0xCD),
    832: (9, 0xD2), 896: (9, 0xD3), 960: (9, 0xD4), 1024: (9, 0xD5),
    1088: (9, 0xD6), 1152: (9, 0xD7), 1216: (9, 0xD8),
    1280: (9, 0xD9), 1344: (9, 0xDA), 1408: (9, 0xDB),
    1472: (9, 0x98), 1536: (9, 0x99), 1600: (9, 0x9A),
    1664: (6, 0x18), 1728: (9, 0x9B),
}

BLACK_CODES = {
    0: (10, 0x37), 1: (3, 0x02), 2: (2, 0x03), 3: (2, 0x02),
    4: (3, 0x03), 5: (4, 0x03), 6: (4, 0x02), 7: (5, 0x03),
    8: (6, 0x05), 9: (6, 0x04), 10: (7, 0x04), 11: (7, 0x05),
    12: (7, 0x07), 13: (8, 0x04), 14: (8, 0x07), 15: (9, 0x18),
    16: (10, 0x17), 17: (10, 0x18), 18: (10, 0x08), 19: (11, 0x67),
    20: (11, 0x68), 21: (11, 0x6C), 22: (11, 0x37), 23: (11, 0x28),
    24: (11, 0x17), 25: (11, 0x18), 26: (12, 0xCA), 27: (12, 0xCB),
    28: (12, 0xCC), 29: (12, 0xCD), 30: (12, 0x68), 31: (12, 0x69),
    32: (12, 0x6A), 33: (12, 0x6B), 34: (12, 0xD2), 35: (12, 0xD3),
    36: (12, 0xD4), 37: (12, 0xD5), 38: (12, 0xD6), 39: (12, 0xD7),
    40: (12, 0x6C), 41: (12, 0x6D), 42: (12, 0xDA), 43: (12, 0xDB),
    44: (12, 0x54), 45: (12, 0x55), 46: (12, 0x56), 47: (12, 0x57),
    48: (12, 0x64), 49: (12, 0x65), 50: (12, 0x52), 51: (12, 0x53),
    52: (12, 0x24), 53: (12, 0x37), 54: (12, 0x38), 55: (12, 0x27),
    56: (12, 0x28), 57: (12, 0x58), 58: (12, 0x59), 59: (12, 0x2B),
    60: (12, 0x2C), 61: (12, 0x5A), 62: (12, 0x66), 63: (12, 0x67),
    64: (10, 0x0F), 128: (12, 0xC8), 192: (12, 0xC9), 256: (12, 0x5B),
    320: (12, 0x33), 384: (12, 0x34), 448: (12, 0x35),
    512: (13, 0x6C), 576: (13, 0x6D), 640: (13, 0x4A),
    704: (13, 0x4B), 768: (13, 0x4C), 832: (13, 0x4D),
    896: (13, 0x72), 960: (13, 0x73), 1024: (13, 0x74),
    1088: (13, 0x75), 1152: (13, 0x76), 1216: (13, 0x77),
    1280: (13, 0x52), 1344: (13, 0x53), 1408: (13, 0x54),
    1472: (13, 0x55), 1536: (13, 0x5A), 1600: (13, 0x5B),
    1664: (13, 0x64), 1728: (13, 0x65),
}

_EXT_MAKEUP = {
    1792: (11, 0x08), 1856: (11, 0x0C), 1920: (11, 0x0D),
    1984: (12, 0x12), 2048: (12, 0x13), 2112: (12, 0x14),
    2176: (12, 0x15), 2240: (12, 0x16), 2304: (12, 0x17),
    2368: (12, 0x1C), 2432: (12, 0x1D), 2496: (12, 0x1E),
    2560: (12, 0x1F),
}

# T.6 §4.2: mode codes
_MODES = {
    (1, 0b1): ("V", 0),
    (3, 0b011): ("V", 1),
    (3, 0b010): ("V", -1),
    (3, 0b001): ("H", None),
    (4, 0b0001): ("P", None),
    (6, 0b000011): ("V", 2),
    (6, 0b000010): ("V", -2),
    (7, 0b0000011): ("V", 3),
    (7, 0b0000010): ("V", -3),
}
_MAX_MODE_BITS = 7
_EOL = (12, 0b000000000001)
# decode bounds: a lying /Columns or unbounded line count must not
# size executor memory (the LZW 4096-entry-cap lesson) — ITU fax
# widths top out at 2432; 2^20 leaves huge headroom for exotic scans
_MAX_COLUMNS = 1 << 20
_MAX_PIXELS = 1 << 27  # 134M px = 128 MB of uint8 rows, worst case


def _invert(codes: dict) -> dict:
    out = {}
    for run, (n, v) in codes.items():
        key = (n, v)
        if key in out:
            raise AssertionError(f"duplicate code {key}")
        out[key] = run
    return out


_WHITE_DEC = {**_invert(WHITE_CODES), **_invert(_EXT_MAKEUP)}
_BLACK_DEC = {**_invert(BLACK_CODES), **_invert(_EXT_MAKEUP)}
_MAX_RUN_BITS = 14


class _Bits:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def peek(self, k: int) -> int:
        """Next k bits MSB-first, zero-padded past EOF. Extracted from
        up to three whole bytes in one shot (k <= 14), not bit-by-bit
        — the per-symbol hot path calls this once per decode attempt."""
        p = self.pos
        byte0 = p >> 3
        # 5 bytes cover a 7-bit offset + up to 32 peeked bits (the
        # EOFB check peeks 24)
        chunk = self.data[byte0 : byte0 + 5]
        v = int.from_bytes(chunk + b"\x00" * (5 - len(chunk)), "big")
        return (v >> (40 - (p & 7) - k)) & ((1 << k) - 1)

    def skip(self, k: int) -> None:
        self.pos += k

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self) -> bool:
        return self.pos >= self.n


def _read_run(bits: _Bits, table: dict) -> int:
    """One complete run: makeup codes accumulate until a terminating
    code (< 64) closes the run. One 14-bit peek per symbol; candidate
    codes come from right-shifting the window (prefix-free tables make
    the first match the only match)."""
    total = 0
    while True:
        window = bits.peek(_MAX_RUN_BITS)
        for k in range(2, _MAX_RUN_BITS + 1):
            run = table.get((k, window >> (_MAX_RUN_BITS - k)))
            if run is not None:
                bits.skip(k)
                total += run
                if run < 64:
                    return total
                break  # makeup: continue for the terminating code
        else:
            raise ValueError(
                f"CCITT: no run code matches at bit {bits.pos}"
            )


def _read_mode(bits: _Bits):
    window = bits.peek(_MAX_MODE_BITS)
    for k in range(1, _MAX_MODE_BITS + 1):
        m = _MODES.get((k, window >> (_MAX_MODE_BITS - k)))
        if m is not None:
            bits.skip(k)
            return m
    return None  # EOL/EOFB region or garbage — caller decides


def _line_to_pixels(trans: list[int], columns: int, out_row) -> None:
    out_row[:] = 255  # white
    for i in range(0, len(trans) - 1, 2):
        out_row[trans[i] : trans[i + 1]] = 0
    if len(trans) % 2 == 1:
        out_row[trans[-1] :] = 0


def _decode_2d_line(
    bits: _Bits, ref: list[int], columns: int, line_no: int
) -> tuple[list[int], bool]:
    """One 2D-coded (MMR) line against reference transitions ``ref``
    -> (changing elements, stalled). Shared by G4 and G3-2D. Strict
    width accounting: transitions outside [0, columns] or non-monotone
    raise (the self-check that turns table/stream corruption into a
    typed error); zero-width coded runs are cancelled so the result is
    genuine CHANGING ELEMENTS (safe as the next reference)."""
    cur: list[int] = []
    a0 = -1
    color = 0  # 0 white, 1 black
    stalled = False
    while True:
        # adversarial-progress bound: V/H with crafted d / zero runs
        # can fail to advance a0 — a real line never needs more than
        # one transition per pixel
        if len(cur) > 2 * columns + 8:
            raise ValueError(
                f"CCITT: line {line_no} never completes "
                "(non-advancing mode stream)"
            )
        mode = _read_mode(bits)
        if mode is None:
            if bits.peek(12) == _EOL[1] or bits.exhausted():
                stalled = True
                break  # tolerated premature end: partial image
            raise ValueError(f"CCITT: bad mode code at bit {bits.pos}")
        kind, d = mode
        i = bisect.bisect_right(ref, a0)
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else columns
        b2 = ref[i + 1] if i + 1 < len(ref) else columns
        if kind == "P":
            a0 = b2
        elif kind == "V":
            a1 = b1 + d
            cur.append(a1)
            a0 = a1
            color ^= 1
        else:  # H: two runs from max(a0, 0)
            start = a0 if a0 > 0 else 0
            r1 = _read_run(bits, _WHITE_DEC if color == 0 else _BLACK_DEC)
            r2 = _read_run(bits, _BLACK_DEC if color == 0 else _WHITE_DEC)
            a1 = start + r1
            a2 = a1 + r2
            cur.extend([a1, a2])
            a0 = a2
        if a0 >= columns:
            break
    # strict per-line validation: the width self-check
    trans = [t for t in cur if t < columns]
    last = 0
    for t in trans:
        if t < last or t < 0:
            raise ValueError(
                f"CCITT: non-monotone transitions in line {line_no}: {cur}"
            )
        last = t
    for t in cur:
        if t < 0 or t > columns:
            raise ValueError(
                f"CCITT: transition {t} outside [0, {columns}] in line "
                f"{line_no}"
            )
    # cancel zero-width runs (equal transition pairs): they don't
    # change THIS line's pixels, but left in the reference they shift
    # the next line's b1/b2 parity and silently mis-decode it
    clean: list[int] = []
    for t in trans:
        if clean and clean[-1] == t:
            clean.pop()
        else:
            clean.append(t)
    return clean, stalled


def _decode_1d_line(bits: _Bits, columns: int, line_no: int) -> list[int]:
    """One MH-coded line -> CHANGING ELEMENTS (zero-width runs
    cancelled — a zero-length first white run is how black-led lines
    are coded, and the result may become a 2D reference)."""
    pos = 0
    color = 0
    trans: list[int] = []
    while pos < columns:
        run = _read_run(bits, _WHITE_DEC if color == 0 else _BLACK_DEC)
        pos += run
        if pos > columns:
            raise ValueError(
                f"CCITT MH: line {line_no} overruns {pos} > {columns}"
            )
        if run == 0 and trans and trans[-1] == pos:
            trans.pop()
        else:
            trans.append(pos)
        color ^= 1
    return trans[:-1] if trans and trans[-1] == columns else trans


def _check_geometry(columns: int, rows: int | None) -> None:
    if columns < 1 or columns > _MAX_COLUMNS:
        raise ValueError(
            f"CCITT: columns {columns} outside [1, {_MAX_COLUMNS}] — a "
            "lying /Columns must not size the allocation (a 4-byte "
            "stream can otherwise emit huge all-white lines)"
        )
    if rows is not None and rows * columns > _MAX_PIXELS:
        raise ValueError(
            f"CCITT: {rows}x{columns} exceeds the {_MAX_PIXELS}-pixel "
            "decode bound"
        )


def decode_g4(
    data: bytes,
    columns: int,
    rows: int | None = None,
    byte_align: bool = False,
    max_rows: int = 65536,
) -> "object":
    """T.6 (G4/MMR) -> uint8 (rows, columns), 0=black 255=white.
    With ``rows`` given, decodes exactly that many lines (the PDF
    /Rows // TIFF ImageLength contract); otherwise decodes until EOFB
    or data end."""
    import numpy as np

    _check_geometry(columns, rows)
    bits = _Bits(data)
    out_rows: list = []
    ref: list[int] = []  # changing elements of the reference line
    limit = rows if rows is not None else min(
        max_rows, _MAX_PIXELS // columns  # rows unknown: clamp, not raise
    )
    while len(out_rows) < limit:
        if byte_align:
            bits.align()
        if bits.exhausted():
            break
        if bits.peek(12) == _EOL[1] and bits.peek(24) == (
            (_EOL[1] << 12) | _EOL[1]
        ):
            bits.skip(24)  # EOFB
            break
        clean, stalled = _decode_2d_line(bits, ref, columns, len(out_rows))
        if stalled and not clean:
            break  # EOL-ish tail with no line content: stop, don't
            # spin out max_rows of phantom white lines
        row = np.empty(columns, dtype=np.uint8)
        _line_to_pixels(clean, columns, row)
        out_rows.append(row)
        ref = clean
        if rows is None and (stalled or bits.exhausted()):
            break
    if rows is not None and len(out_rows) < rows:
        raise ValueError(
            f"CCITT: stream ended after {len(out_rows)} of {rows} lines"
        )
    if not out_rows:
        raise ValueError("CCITT: no lines decoded")
    return np.stack(out_rows)


def _seek_eol(bits: _Bits, limit_bits: int = 4096) -> bool:
    """Advance past fill zeros + the next EOL. False at stream end or
    when no EOL appears within ``limit_bits`` (corrupt framing)."""
    seen = 0
    while not bits.exhausted() and seen < limit_bits:
        if bits.peek(12) == _EOL[1]:
            bits.skip(12)
            return True
        if bits.peek(1) != 0:
            return False  # a 1 that doesn't complete an EOL: bad fill
        bits.skip(1)
        seen += 1
    return False


def decode_g3(
    data: bytes,
    columns: int,
    rows: int | None = None,
    two_d: bool = False,
    max_rows: int = 65536,
) -> "object":
    """T.4 Group 3 with EOL framing -> uint8 (rows, columns). Each
    line is preceded by an EOL (with optional zero fill); in 2D mode
    (PDF /K > 0, TIFF T4Options bit 0) a tag bit after each EOL says
    whether the next line is 1D (MH) or 2D (coded like G4 against the
    previous line). Decoding stops at TWO consecutive EOLs or data end
    — the spec's RTC is six EOLs, but the second back-to-back EOL
    already proves no line data follows at this position, and real
    writers never emit empty mid-image EOL pairs. EOL-LESS G3
    (PDF /EndOfLine false, the default) is plain MH — use
    :func:`decode_mh`."""
    import numpy as np

    _check_geometry(columns, rows)
    bits = _Bits(data)
    out_rows: list = []
    ref: list[int] = []
    limit = rows if rows is not None else min(
        max_rows, _MAX_PIXELS // columns
    )
    while len(out_rows) < limit:
        if not _seek_eol(bits):
            break
        if two_d:
            if bits.exhausted():
                break
            is_1d = bits.peek(1) == 1
            bits.skip(1)  # the tag bit precedes everything — incl. RTC
        else:
            is_1d = True
        # RTC: another EOL immediately follows (post-tag in 2D mode).
        # No legit line starts with 11 zero bits (the longest zero
        # prefix in any run/mode code is 7), so this cannot misfire.
        if bits.peek(12) == _EOL[1]:
            break
        if bits.exhausted():
            break
        if is_1d:
            trans = _decode_1d_line(bits, columns, len(out_rows))
        else:
            trans, _stalled = _decode_2d_line(
                bits, ref, columns, len(out_rows)
            )
        row = np.empty(columns, dtype=np.uint8)
        _line_to_pixels(trans, columns, row)
        out_rows.append(row)
        ref = trans
    if rows is not None and len(out_rows) < rows:
        raise ValueError(
            f"CCITT G3: stream ended after {len(out_rows)} of {rows} lines"
        )
    if not out_rows:
        raise ValueError("CCITT G3: no lines decoded")
    return np.stack(out_rows)


def decode_mh(
    data: bytes,
    columns: int,
    rows: int,
    byte_align: bool = True,
) -> "object":
    """T.4 one-dimensional Modified Huffman without EOLs (TIFF
    compression 2): each line is an alternating white/black run
    sequence summing exactly to ``columns``; rows are byte-aligned."""
    import numpy as np

    if columns < 1 or rows < 1 or columns > _MAX_COLUMNS:
        raise ValueError(f"CCITT: bad geometry {columns}x{rows}")
    if rows * columns > _MAX_PIXELS:
        raise ValueError(
            f"CCITT: {rows}x{columns} exceeds the {_MAX_PIXELS}-pixel "
            "decode bound"
        )
    bits = _Bits(data)
    out = np.empty((rows, columns), dtype=np.uint8)
    for r in range(rows):
        if byte_align:
            bits.align()
        _line_to_pixels(_decode_1d_line(bits, columns, r), columns, out[r])
    return out
