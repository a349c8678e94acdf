"""CCITT G4/MH decoder tests (operators/ccitt.py).

Validation strategy (the module docstring's admissibility argument,
executed): (1) STRUCTURAL — the transcribed T.4 tables must be
prefix-free and Kraft-complete together with the EOL region, and the
famous codewords are hard-coded here independently; (2) ROUND-TRIP —
a spec G4/MH encoder below covers every run length 0..2560 in both
colors plus randomized images; (3) SELF-CHECK — corrupt streams must
raise typed ValueError through the width accounting, never return
plausible wrong pixels silently.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.ccitt import (
    BLACK_CODES,
    WHITE_CODES,
    decode_g4,
    decode_mh,
)
from data_governance_spark.operators.ccitt import _EXT_MAKEUP  # noqa


# --------------------------------------------------------------------------
# spec encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)


def put_run(w: _BitWriter, run: int, color: int):
    """MH run emission: extended + standard makeups then terminating."""
    table = WHITE_CODES if color == 0 else BLACK_CODES
    while run >= 64:
        if run >= 2624:
            mk = 2560
            n, v = _EXT_MAKEUP[mk]
        else:
            mk = (run // 64) * 64
            n, v = _EXT_MAKEUP[mk] if mk >= 1792 else table[mk]
        w.put(v, n)
        run -= mk
    n, v = table[run]
    w.put(v, n)


def _transitions(row) -> list[int]:
    """Changing elements of a 0/255 row (positions where color flips;
    rows start white=255)."""
    t = []
    prev = 255
    for i, px in enumerate(row):
        if px != prev:
            t.append(i)
            prev = px
    return t


def g4_encode(img: np.ndarray) -> bytes:
    """Standard T.6 coder — per-line 2D coding shared with the G3-2D
    encoder via _encode_2d_line (one copy, like the decoder side)."""
    h, wpx = img.shape
    w = _BitWriter()
    ref: list[int] = []
    for r in range(h):
        cur = _transitions(img[r])
        _encode_2d_line(w, cur, ref, wpx)
        ref = cur
    w.put(0b000000000001, 12)
    w.put(0b000000000001, 12)  # EOFB
    return w.bytes()


def mh_encode(img: np.ndarray) -> bytes:
    h, wpx = img.shape
    w = _BitWriter()
    for r in range(h):
        w.align()
        _put_1d_line(w, img[r], wpx)
    return w.bytes()


def _rand_bw(h, w, seed, p=0.4):
    rng = np.random.default_rng(seed)
    return np.where(rng.random((h, w)) < p, 0, 255).astype(np.uint8)


def _encode_2d_line(w: _BitWriter, cur: list[int], ref: list[int],
                    wpx: int) -> None:
    """One 2D-coded line (shared by g4_encode-style logic and G3-2D)."""
    import bisect

    a0, color = -1, 0
    while True:
        i = bisect.bisect_right(ref, a0)
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else wpx
        b2 = ref[i + 1] if i + 1 < len(ref) else wpx
        j = bisect.bisect_right(cur, a0)
        if (j & 1) != color:
            j += 1
        a1 = cur[j] if j < len(cur) else wpx
        if b2 < a1:
            w.put(0b0001, 4)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            d = a1 - b1
            code = {
                0: (1, 0b1), 1: (3, 0b011), -1: (3, 0b010),
                2: (6, 0b000011), -2: (6, 0b000010),
                3: (7, 0b0000011), -3: (7, 0b0000010),
            }[d]
            w.put(code[1], code[0])
            a0 = a1
            color ^= 1
        else:
            a2 = cur[j + 1] if j + 1 < len(cur) else wpx
            start = a0 if a0 > 0 else 0
            w.put(0b001, 3)
            put_run(w, a1 - start, color)
            put_run(w, a2 - a1, color ^ 1)
            a0 = a2
        if a0 >= wpx:
            break


def _put_1d_line(w: _BitWriter, row, wpx: int) -> None:
    trans = _transitions(row) + [wpx]
    pos, color = 0, 0
    for t in trans:
        put_run(w, t - pos, color)
        pos = t
        color ^= 1


def g3_encode(img: np.ndarray, two_d: bool = False,
              alternate: bool = True) -> bytes:
    """T.4 G3 spec encoder: EOL before every line; in 2D mode a tag
    bit follows the EOL (1 = 1D line, 0 = 2D against the previous
    line). ``alternate`` follows the standard K-factor shape: a 1D
    line first, then 2D lines (re-syncing to 1D never hurts)."""
    h, wpx = img.shape
    w = _BitWriter()
    ref: list[int] = []
    for r in range(h):
        w.put(0b000000000001, 12)
        if not two_d:
            _put_1d_line(w, img[r], wpx)
            continue
        is_1d = r == 0 or not alternate
        w.put(1 if is_1d else 0, 1)
        if is_1d:
            _put_1d_line(w, img[r], wpx)
        else:
            _encode_2d_line(w, _transitions(img[r]), ref, wpx)
        ref = _transitions(img[r])
    # RTC: six EOLs
    for _ in range(6):
        w.put(0b000000000001, 12)
        if two_d:
            w.put(1, 1)
    return w.bytes()


# --------------------------------------------------------------------------
# structural table validation
# --------------------------------------------------------------------------


def test_famous_codewords_pinned_independently():
    assert WHITE_CODES[0] == (8, 0b00110101)
    assert WHITE_CODES[1] == (6, 0b000111)
    assert WHITE_CODES[64] == (5, 0b11011)
    assert WHITE_CODES[1728] == (9, 0b010011011)
    assert BLACK_CODES[0] == (10, 0b0000110111)
    assert BLACK_CODES[1] == (3, 0b010)
    assert BLACK_CODES[2] == (2, 0b11)
    assert BLACK_CODES[3] == (2, 0b10)
    assert BLACK_CODES[64] == (10, 0b0000001111)
    assert _EXT_MAKEUP[1792] == (11, 0b00000001000)
    assert _EXT_MAKEUP[2560] == (12, 0b000000011111)


@pytest.mark.parametrize("codes", [WHITE_CODES, BLACK_CODES])
def test_tables_prefix_free_and_kraft_complete(codes):
    """Each color's runs + shared extended makeups + the EOL prefix
    must form a prefix-free code; together they tile the code space
    (Kraft sum == 1) — a transcription typo in any bit length or code
    value breaks one of these."""
    entries = list(codes.values()) + list(_EXT_MAKEUP.values())
    entries.append((12, 0b000000000001))  # EOL region
    seen = set()
    for n, v in entries:
        assert (n, v) not in seen
        seen.add((n, v))
    # prefix-freeness
    by_bits = sorted(entries)
    for i, (n1, v1) in enumerate(by_bits):
        for n2, v2 in by_bits[i + 1 :]:
            if n2 > n1 and (v2 >> (n2 - n1)) == v1:
                raise AssertionError(
                    f"{v1:0{n1}b} is a prefix of {v2:0{n2}b}"
                )
    kraft = sum(2.0 ** -n for n, _v in entries)
    # the code space tiles EXACTLY except the spec's reserved
    # eight-zero EOL/fill region: the sixteen 12-bit strings starting
    # 00000000, one of which (the EOL itself) is already counted —
    # leaving precisely 15 * 2^-12 unassigned
    assert kraft == 1.0 - 15 * 2.0**-12


def test_mode_codes_prefix_free():
    from data_governance_spark.operators.ccitt import _MODES

    entries = list(_MODES.keys()) + [(12, 0b000000000001)]
    for i, (n1, v1) in enumerate(entries):
        for n2, v2 in entries:
            if n2 > n1 and (v2 >> (n2 - n1)) == v1:
                raise AssertionError(f"mode prefix clash {v1} {v2}")


# --------------------------------------------------------------------------
# round-trips
# --------------------------------------------------------------------------


def test_every_run_length_round_trips_mh():
    """One two-run line per run length r: white r + black (cols-r) —
    exercises EVERY white terminating/makeup entry; the mirrored image
    exercises every black entry."""
    cols = 2700  # > 2624 forces extended makeups too
    img_w = np.full((len(range(0, cols + 1, 7)), cols), 255, np.uint8)
    for i, r in enumerate(range(0, cols + 1, 7)):
        img_w[i, r:] = 0
    assert np.array_equal(
        decode_mh(mh_encode(img_w), cols, img_w.shape[0]), img_w
    )
    img_b = 255 - img_w  # black-led lines: zero-length white first run
    assert np.array_equal(
        decode_mh(mh_encode(img_b), cols, img_b.shape[0]), img_b
    )


def test_all_exact_run_lengths_dense():
    """Every run length 0..600 exactly (both colors, dense sweep)."""
    cols = 601
    rows = []
    for r in range(0, 601, 1):
        row = np.full(cols, 255, np.uint8)
        row[:r] = 0  # black prefix length r
        rows.append(row)
    img = np.stack(rows)
    got = decode_mh(mh_encode(img), cols, img.shape[0])
    assert np.array_equal(got, img)


def test_g4_round_trip_patterns():
    checker = np.indices((8, 10)).sum(0) % 2 * 255
    cases = [
        np.full((3, 17), 255, np.uint8),          # all white
        np.zeros((3, 17), np.uint8),              # all black
        checker.astype(np.uint8),                 # max vertical churn
        _rand_bw(20, 64, 1),
        _rand_bw(7, 1728, 2, p=0.1),              # fax width
        _rand_bw(16, 33, 3, p=0.9),
    ]
    for img in cases:
        got = decode_g4(g4_encode(img), img.shape[1], rows=img.shape[0])
        assert np.array_equal(got, img)


def test_g4_without_rows_stops_at_eofb():
    img = _rand_bw(9, 40, 4)
    got = decode_g4(g4_encode(img), 40)
    assert np.array_equal(got, img)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1),
       st.floats(0.05, 0.95))
def test_g4_fuzz_round_trip(h, w, seed, p):
    img = _rand_bw(h, w, seed, p)
    got = decode_g4(g4_encode(img), w, rows=h)
    assert np.array_equal(got, img)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 24), st.integers(1, 80), st.integers(0, 2**32 - 1))
def test_mh_fuzz_round_trip(h, w, seed):
    img = _rand_bw(h, w, seed)
    got = decode_mh(mh_encode(img), w, h)
    assert np.array_equal(got, img)


# --------------------------------------------------------------------------
# self-check + adversarial
# --------------------------------------------------------------------------


def test_corrupt_stream_raises_not_garbage():
    img = _rand_bw(10, 64, 7)
    enc = bytearray(g4_encode(img))
    raises = 0
    diverges = 0
    for i in range(len(enc)):
        bad = bytearray(enc)
        bad[i] ^= 0xFF
        try:
            got = decode_g4(bytes(bad), 64, rows=10)
            if not np.array_equal(got, img):
                diverges += 1
        except ValueError:
            raises += 1
    # the self-check argument: most corruption is DETECTED
    assert raises >= diverges


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=512), st.integers(1, 100))
def test_fuzz_never_untyped_and_time_bounded(data, cols):
    try:
        out = decode_g4(data, cols, rows=None, max_rows=64)
        assert out.dtype == np.uint8
    except ValueError:
        pass


def test_non_advancing_stream_is_bounded():
    """A crafted VL3/VR3 ping-pong must hit the per-line transition cap
    (typed), not loop forever."""
    from data_governance_spark.operators.ccitt import _Bits  # noqa

    # many VL(1) codes: a1 = b1 - 1 with empty ref (b1 = columns) gives
    # monotone-violating transitions; a long stream of H with 0-runs
    # stalls a0 — both must raise or terminate quickly
    w = _BitWriter()
    for _ in range(5000):
        w.put(0b001, 3)          # H
        w.put(0b00110101, 8)     # white 0
        w.put(0b0000110111, 10)  # black 0
    with pytest.raises(ValueError):
        decode_g4(w.bytes(), 100, rows=2)


# --------------------------------------------------------------------------
# integration: TIFF comp 2/4 and PDF CCITTFaxDecode XObjects
# --------------------------------------------------------------------------


def test_tiff_g4_and_mh_roundtrip():
    from tests.test_tiff_codec import write_tiff

    from data_governance_spark.operators.tiff import decode_tiff

    img = _rand_bw(10, 33, 21)
    for comp, enc in ((4, g4_encode(img)), (2, mh_encode(img))):
        t = write_tiff(
            [
                dict(
                    data_raw_strips=[enc], data=b"", w=33, h=10,
                    bits=1, comp=comp, photo=0,
                )
            ]
        )
        assert np.array_equal(decode_tiff(t), img)


def test_tiff_g4_multi_strip_and_photometric_1():
    from tests.test_tiff_codec import write_tiff

    from data_governance_spark.operators.tiff import decode_tiff

    img = _rand_bw(8, 20, 5)
    strips = [g4_encode(img[:4]), g4_encode(img[4:])]
    t = write_tiff(
        [
            dict(
                data_raw_strips=strips, data=b"", w=20, h=8, bits=1,
                comp=4, photo=0, rows_per_strip=4,
            )
        ]
    )
    assert np.array_equal(decode_tiff(t), img)
    t1 = write_tiff(
        [
            dict(
                data_raw_strips=strips, data=b"", w=20, h=8, bits=1,
                comp=4, photo=1, rows_per_strip=4,
            )
        ]
    )
    assert np.array_equal(decode_tiff(t1), 255 - img)


def test_tiff_g3_roundtrip_1d_and_2d():
    from tests.test_tiff_codec import write_tiff

    from data_governance_spark.operators.tiff import decode_tiff

    img = _rand_bw(6, 28, 17)
    t1 = write_tiff(
        [
            dict(
                data_raw_strips=[g3_encode(img, two_d=False)], data=b"",
                w=28, h=6, bits=1, comp=3, photo=0,
            )
        ]
    )
    assert np.array_equal(decode_tiff(t1), img)
    t2 = write_tiff(
        [
            dict(
                data_raw_strips=[g3_encode(img, two_d=True)], data=b"",
                w=28, h=6, bits=1, comp=3, photo=0,
                extra_tags=[(292, 4, 1, 1)],  # T4Options bit 0 = 2D
            )
        ]
    )
    assert np.array_equal(decode_tiff(t2), img)


def test_pdf_ccitt_image_xobject_decodes():
    from tests.test_pdf import HELLO, _image_pdf, stream_body

    from data_governance_spark.operators.multimodal import decode_image
    from data_governance_spark.operators.pdf import pdf_images, pdf_text

    img = _rand_bw(6, 24, 9)
    enc = g4_encode(img)
    body = stream_body(
        b"/Type /XObject /Subtype /Image /Width 24 /Height 6 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        b"/Filter /CCITTFaxDecode "
        b"/DecodeParms << /K -1 /Columns 24 /Rows 6 >>",
        enc,
    )
    pdf = _image_pdf({6: body}, b"/Im1 6 0 R")
    recs = pdf_images(pdf)
    assert len(recs) == 1 and recs[0]["err"] is None
    assert recs[0]["format"] == "ppm"
    assert np.array_equal(decode_image(recs[0]["image"]), img)
    assert pdf_text(pdf) == "Hello World"  # text layer unaffected


def test_pdf_ccitt_blackis1_and_g3_raise_path():
    from tests.test_pdf import _image_pdf, stream_body

    from data_governance_spark.operators.multimodal import decode_image
    from data_governance_spark.operators.pdf import pdf_images

    img = _rand_bw(4, 16, 11)
    enc = g4_encode(img)
    b1 = stream_body(
        b"/Type /XObject /Subtype /Image /Width 16 /Height 4 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        b"/Filter /CCITTFaxDecode "
        b"/DecodeParms << /K -1 /Columns 16 /BlackIs1 true >>",
        enc,
    )
    g3 = stream_body(
        b"/Type /XObject /Subtype /Image /Width 16 /Height 4 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        b"/Filter /CCITTFaxDecode /DecodeParms << /K 0 /Columns 16 >>",
        enc,
    )
    pdf = _image_pdf({6: b1, 7: g3}, b"/ImA 6 0 R /ImB 7 0 R")
    recs = {r["img_idx"]: r for r in pdf_images(pdf)}
    assert recs[0]["err"] is None
    assert np.array_equal(decode_image(recs[0]["image"]), 255 - img)
    assert recs[1]["err"] == "PdfImageDecodeError"  # K >= 0


# --------------------------------------------------------------------------
# review-pass regressions (r12)
# --------------------------------------------------------------------------


def test_pdf_ccitt_short_decodeparms_array_stays_typed():
    """DecodeParms shorter than the Filter chain must not IndexError
    past the per-image quarantine."""
    import zlib

    from tests.test_pdf import _image_pdf, stream_body

    from data_governance_spark.operators.pdf import pdf_images

    img = _rand_bw(3, 8, 2)
    enc = zlib.compress(g4_encode(img))
    body = stream_body(
        b"/Type /XObject /Subtype /Image /Width 8 /Height 3 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        b"/Filter [/FlateDecode /CCITTFaxDecode] "
        b"/DecodeParms [<< /K -1 /Columns 8 >>]",  # 1 entry, 2 filters
        enc,
    )
    recs = pdf_images(_image_pdf({6: body}, b"/Im1 6 0 R"))
    assert len(recs) == 1
    # padded parms: the LAST filter's parms slot is None -> defaults
    # (K=0) -> typed per-image err, never an escaped IndexError
    assert recs[0]["err"] == "PdfImageDecodeError"


def test_pdf_ccitt_lying_columns_bounded():
    """/Columns must not size executor memory past the pixel guard."""
    from tests.test_pdf import _image_pdf, stream_body

    from data_governance_spark.operators.pdf import pdf_images

    body = stream_body(
        b"/Type /XObject /Subtype /Image /Width 16 /Height 1000 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        b"/Filter /CCITTFaxDecode "
        b"/DecodeParms << /K -1 /Columns 2000000000 >>",
        b"\xff\xff\xff\xff",
    )
    recs = pdf_images(_image_pdf({6: body}, b"/Im1 6 0 R"))
    assert recs[0]["err"] == "PdfImageDecodeError"


def test_decode_g4_columns_bound_direct():
    with pytest.raises(ValueError, match="outside|exceeds"):
        decode_g4(b"\xff" * 4, 50_000_000)
    with pytest.raises(ValueError, match="exceeds"):
        decode_g4(b"\xff" * 4, 1 << 20, rows=1 << 12)


def test_zero_width_runs_do_not_poison_reference():
    """A line coded with zero-width runs decodes the same pixels, and
    the NEXT line (coded against changing elements) must too — the
    silent-wrong-pixels repro from the review."""
    w = _BitWriter()
    # line 1: H(white 5, black 0) then V0 closes at columns against
    # ref=[] (b1=10): all-white pixels but coded transitions [5,5,10]
    w.put(0b001, 3)
    put_run(w, 5, 0)
    put_run(w, 0, 1)
    w.put(0b1, 1)  # V0 -> a1 = b1 = 10
    # line 2: V0 against line 1's CHANGING ELEMENTS (none) -> all white
    w.put(0b1, 1)
    w.put(0b000000000001, 12)
    w.put(0b000000000001, 12)
    got = decode_g4(w.bytes(), 10, rows=2)
    assert (got == 255).all()


def test_tiff_fillorder2_fax_and_uncompressed():
    from tests.test_tiff_codec import write_tiff

    from data_governance_spark.operators.tiff import _BITREV, decode_tiff

    img = _rand_bw(5, 19, 31)
    enc = g4_encode(img)
    rev = bytes(_BITREV[b] for b in enc)
    t = write_tiff(
        [
            dict(
                data_raw_strips=[rev], data=b"", w=19, h=5, bits=1,
                comp=4, photo=0, extra_tags=[(266, 3, 1, 2)],
            )
        ]
    )
    assert np.array_equal(decode_tiff(t), img)
    # uncompressed 1-bit with FillOrder 2
    packed = np.packbits((img == 0).astype(np.uint8), axis=1)
    revraw = bytes(_BITREV[b] for b in packed.tobytes())
    t2 = write_tiff(
        [
            dict(
                data_raw_strips=[revraw], data=b"", w=19, h=5, bits=1,
                comp=1, photo=0, extra_tags=[(266, 3, 1, 2)],
            )
        ]
    )
    # photo 0 (WhiteIsZero): bit 1 = black; our packed bits set 1 where
    # img is black
    assert np.array_equal(decode_tiff(t2), img)
    # FillOrder 2 with 8-bit LZW: typed, not silent
    t3 = write_tiff(
        [dict(data=img.tobytes(), w=19, h=5, comp=5,
              extra_tags=[(266, 3, 1, 2)])]
    )
    with pytest.raises(ValueError, match="FillOrder"):
        decode_tiff(t3)


def test_tiff_palette_fax_raises():
    from tests.test_tiff_codec import write_tiff

    from data_governance_spark.operators.tiff import decode_tiff

    img = _rand_bw(3, 8, 13)
    t = write_tiff(
        [
            dict(
                data_raw_strips=[g4_encode(img)], data=b"", w=8, h=3,
                bits=1, comp=4, photo=3,
                colormap=[0] * (3 * 2),
            )
        ]
    )
    with pytest.raises(ValueError, match="palette-over-fax"):
        decode_tiff(t)


# --------------------------------------------------------------------------
# G3 (T.4 with EOL framing)
# --------------------------------------------------------------------------


def test_g3_1d_round_trip():
    from data_governance_spark.operators.ccitt import decode_g3

    img = _rand_bw(9, 31, 41)
    got = decode_g3(g3_encode(img, two_d=False), 31, rows=9)
    assert np.array_equal(got, img)
    # rows=None: RTC stops it
    got2 = decode_g3(g3_encode(img, two_d=False), 31)
    assert np.array_equal(got2, img)


def test_g3_2d_round_trip():
    from data_governance_spark.operators.ccitt import decode_g3

    img = _rand_bw(12, 40, 43)
    got = decode_g3(g3_encode(img, two_d=True), 40, rows=12, two_d=True)
    assert np.array_equal(got, img)
    # all-1D lines under 2D framing (alternate=False)
    got2 = decode_g3(
        g3_encode(img, two_d=True, alternate=False), 40, rows=12,
        two_d=True,
    )
    assert np.array_equal(got2, img)
    # rows=None must stop at RTC, not mis-read the RTC tag bits
    got3 = decode_g3(g3_encode(img, two_d=True), 40, two_d=True)
    assert np.array_equal(got3, img)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 24), st.integers(1, 48), st.integers(0, 2**32 - 1),
       st.booleans())
def test_g3_fuzz_round_trip(h, w, seed, two_d):
    from data_governance_spark.operators.ccitt import decode_g3

    img = _rand_bw(h, w, seed)
    got = decode_g3(g3_encode(img, two_d=two_d), w, rows=h, two_d=two_d)
    assert np.array_equal(got, img)


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=384), st.integers(1, 64), st.booleans())
def test_g3_fuzz_never_untyped(data, cols, two_d):
    from data_governance_spark.operators.ccitt import decode_g3

    try:
        out = decode_g3(data, cols, two_d=two_d)
        assert out.dtype == np.uint8
    except ValueError:
        pass


def test_pdf_ccitt_g3_k0_and_k_positive_decode():
    """PDF /K = 0 (pure 1D) and /K > 0 (mixed 2D) now decode; the old
    typed raise is gone."""
    from tests.test_pdf import _image_pdf, stream_body

    from data_governance_spark.operators.multimodal import decode_image
    from data_governance_spark.operators.pdf import pdf_images

    img = _rand_bw(5, 16, 47)
    k0 = stream_body(
        b"/Type /XObject /Subtype /Image /Width 16 /Height 5 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        b"/Filter /CCITTFaxDecode /DecodeParms << /K 0 /Columns 16 >>",
        g3_encode(img, two_d=False),
    )
    kp = stream_body(
        b"/Type /XObject /Subtype /Image /Width 16 /Height 5 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        b"/Filter /CCITTFaxDecode /DecodeParms << /K 4 /Columns 16 >>",
        g3_encode(img, two_d=True),
    )
    pdf = _image_pdf({6: k0, 7: kp}, b"/ImA 6 0 R /ImB 7 0 R")
    recs = {r["img_idx"]: r for r in pdf_images(pdf)}
    assert recs[0]["err"] is None and recs[1]["err"] is None
    assert np.array_equal(decode_image(recs[0]["image"]), img)
    assert np.array_equal(decode_image(recs[1]["image"]), img)


def test_pdf_ccitt_k0_eol_less_default_decodes():
    """PDF /EndOfLine defaults to FALSE: a /K 0 stream with NO EOLs is
    back-to-back MH — the review-found gap where spec-default G3 data
    failed entirely. Both byte-aligned and bit-contiguous forms."""
    from tests.test_pdf import _image_pdf, stream_body

    from data_governance_spark.operators.multimodal import decode_image
    from data_governance_spark.operators.pdf import pdf_images

    img = _rand_bw(4, 12, 53)
    aligned = mh_encode(img)  # byte-aligned rows
    # bit-contiguous rows (no per-line align)
    w = _BitWriter()
    for r in range(4):
        _put_1d_line(w, img[r], 12)
    contiguous = w.bytes()
    a_body = stream_body(
        b"/Type /XObject /Subtype /Image /Width 12 /Height 4 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        b"/Filter /CCITTFaxDecode "
        b"/DecodeParms << /K 0 /Columns 12 /EncodedByteAlign true >>",
        aligned,
    )
    c_body = stream_body(
        b"/Type /XObject /Subtype /Image /Width 12 /Height 4 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        b"/Filter /CCITTFaxDecode /DecodeParms << /K 0 /Columns 12 >>",
        contiguous,
    )
    pdf = _image_pdf({6: a_body, 7: c_body}, b"/ImA 6 0 R /ImB 7 0 R")
    recs = {r["img_idx"]: r for r in pdf_images(pdf)}
    assert recs[0]["err"] is None and recs[1]["err"] is None
    assert np.array_equal(decode_image(recs[0]["image"]), img)
    assert np.array_equal(decode_image(recs[1]["image"]), img)


def test_gate_fax_payload_pin():
    """The q45 'fax' planted payload: regenerate from this suite's G4
    encoder + the TIFF writer and pin bytes + the analytic constants
    the oracle states (checkerboard: mean and std both exactly 127.5)."""
    from tests.test_tiff_codec import write_tiff

    from data_governance_spark.operators.multimodal import image_features
    from data_governance_spark.queries.multimodal_gate import (
        _FAX_CONSTS,
        _FAX_HEX,
        _FAX_SD,
    )

    img = np.where(
        np.indices((4, 8)).sum(0) % 2 == 0, 0, 255
    ).astype(np.uint8)
    t = write_tiff(
        [
            dict(
                data_raw_strips=[g4_encode(img)], data=b"", w=8, h=4,
                bits=1, comp=4, photo=0,
            )
        ],
        little=False,
    )
    assert t.hex() == _FAX_HEX
    f = image_features(t)
    assert tuple(f[:6]) == _FAX_CONSTS
    assert f[6] == _FAX_SD
