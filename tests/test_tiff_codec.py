"""TIFF decoder tests (operators/tiff.py).

Same strategy as the other codec suites: a minimal SPEC WRITER builds
real TIFFs from scratch (IFDs, strip tables, both byte orders, every
supported compression), so every feature round-trips against an
independently-constructed file; unsupported features are produced by
writer flags and must raise their documented typed errors.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.tiff import (
    decode_tiff,
    decode_tiff_pages,
    is_tiff_payload,
)

# --------------------------------------------------------------------------
# spec writer
# --------------------------------------------------------------------------


def packbits_encode(data: bytes) -> bytes:
    """Straight PackBits encoder (TIFF 6.0 §9): runs of >= 3 become
    repeat packets, everything else literal packets of <= 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i
        while (
            j < n
            and j - i < 128
            and not (j + 2 < n and data[j] == data[j + 1] == data[j + 2])
        ):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF LZW == PDF LZW with EarlyChange=1 — reuse the validated
    spec encoder from the PDF suite."""
    from tests.test_pdf import lzw_encode

    return lzw_encode(data, early=1)


def write_tiff(
    pages: list[dict],
    little: bool = True,
) -> bytes:
    """Each page dict: {data: raw sample bytes, w, h, spp, bits,
    photo, comp, predictor?, rows_per_strip?, colormap?, extra_tags?}.
    Strips are split per rows_per_strip; compression applies per strip.
    """
    fmt = "<" if little else ">"
    out = bytearray(b"II*\x00" if little else b"MM\x00*")
    out += b"\x00\x00\x00\x00"  # first IFD offset patched below
    ifd_offsets = []
    for page in pages:
        w, h = page["w"], page["h"]
        spp = page.get("spp", 1)
        bits = page.get("bits", 8)
        comp = page.get("comp", 1)
        rps = page.get("rows_per_strip", h)
        stride = (w * spp * bits + 7) // 8
        data = page["data"]
        # encode strips — or take PRE-ENCODED strips verbatim (the
        # CCITT integration tests encode with their own G4/MH coder)
        if page.get("data_raw_strips") is not None:
            strips = list(page["data_raw_strips"])
        else:
            strips = []
            r = 0
            while r < h:
                nrows = min(rps, h - r)
                chunk = data[r * stride : (r + nrows) * stride]
                if comp == 1:
                    enc = chunk
                elif comp == 5:
                    enc = tiff_lzw_encode(chunk)
                elif comp in (8, 32946):
                    enc = zlib.compress(chunk)
                elif comp == 32773:
                    enc = packbits_encode(chunk)
                else:
                    enc = chunk  # writer passthrough for raise-tests
                strips.append(enc)
                r += nrows
        strip_offs = []
        for s in strips:
            strip_offs.append(len(out))
            out += s
        # long arrays that don't fit inline
        def _put_longs(vals):
            off = len(out)
            for v in vals:
                out.extend(struct.pack(fmt + "I", v))
            return off

        def _put_shorts(vals):
            off = len(out)
            for v in vals:
                out.extend(struct.pack(fmt + "H", v))
            if len(vals) % 2:
                out.extend(b"\x00\x00")
            return off

        entries = []  # (tag, type, count, value_or_offset, inline)

        def tag_short(tag, v):
            entries.append((tag, 3, 1, v))

        def tag_long(tag, v):
            entries.append((tag, 4, 1, v))

        def tag_longs(tag, vals):
            if len(vals) == 1:
                tag_long(tag, vals[0])
            else:
                entries.append((tag, 4, len(vals), _put_longs(vals)))

        tag_long(_TAG_W, w)
        tag_long(_TAG_H, h)
        if spp == 1:
            tag_short(_TAG_BITS, bits)
        else:
            entries.append((_TAG_BITS, 3, spp, _put_shorts([bits] * spp)))
        tag_short(_TAG_COMP, comp)
        tag_short(_TAG_PHOTO, page.get("photo", 1))
        tag_longs(_TAG_STRIP_OFF, strip_offs)
        tag_short(_TAG_SPP, spp)
        tag_long(_TAG_RPS, rps)
        tag_longs(_TAG_STRIP_CNT, [len(s) for s in strips])
        if page.get("predictor"):
            tag_short(_TAG_PRED, page["predictor"])
        if page.get("colormap") is not None:
            cm = page["colormap"]
            entries.append((_TAG_CMAP, 3, len(cm), _put_shorts(cm)))
        for t, ty, n, v in page.get("extra_tags", []):
            entries.append((t, ty, n, v))
        entries.sort()
        ifd_offsets.append(len(out))
        out += struct.pack(fmt + "H", len(entries))
        for tag, typ, n, val in entries:
            out += struct.pack(fmt + "HHI", tag, typ, n)
            size = {3: 2, 4: 4}[typ] * n
            if size <= 4 and typ == 3 and n == 1:
                out += struct.pack(fmt + "H", val) + b"\x00\x00"
            elif size <= 4 and typ == 4 and n == 1:
                out += struct.pack(fmt + "I", val)
            else:
                out += struct.pack(fmt + "I", val)
        out += b"\x00\x00\x00\x00"  # next-IFD patched below
    # link IFDs
    struct.pack_into(fmt + "I", out, 4, ifd_offsets[0])
    for i in range(len(ifd_offsets) - 1):
        # next-IFD field sits after the entry table of IFD i
        d_off = ifd_offsets[i]
        (cnt,) = struct.unpack_from(fmt + "H", out, d_off)
        struct.pack_into(
            fmt + "I", out, d_off + 2 + cnt * 12, ifd_offsets[i + 1]
        )
    return bytes(out)


_TAG_W, _TAG_H, _TAG_BITS, _TAG_COMP = 256, 257, 258, 259
_TAG_PHOTO, _TAG_STRIP_OFF, _TAG_SPP = 262, 273, 277
_TAG_RPS, _TAG_STRIP_CNT, _TAG_PRED, _TAG_CMAP = 278, 279, 317, 320


def _gray(h, w, seed=1):
    return np.random.default_rng(seed).integers(0, 256, (h, w), np.uint8)


def _rgb(h, w, seed=2):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)


# --------------------------------------------------------------------------
# round-trips
# --------------------------------------------------------------------------


@pytest.mark.parametrize("little", [True, False])
@pytest.mark.parametrize("comp", [1, 5, 8, 32946, 32773])
def test_gray8_roundtrip_all_compressions(little, comp):
    img = _gray(7, 11)
    t = write_tiff(
        [dict(data=img.tobytes(), w=11, h=7, comp=comp)], little=little
    )
    assert is_tiff_payload(t)
    assert np.array_equal(decode_tiff(t), img)


@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
def test_rgb_roundtrip_multi_strip(comp):
    img = _rgb(10, 6)
    t = write_tiff(
        [
            dict(
                data=img.tobytes(), w=6, h=10, spp=3, photo=2,
                comp=comp, rows_per_strip=3,
            )
        ]
    )
    assert np.array_equal(decode_tiff(t), img)


def test_rgba_keeps_alpha():
    img = np.random.default_rng(5).integers(0, 256, (4, 5, 4), np.uint8)
    t = write_tiff([dict(data=img.tobytes(), w=5, h=4, spp=4, photo=2)])
    assert np.array_equal(decode_tiff(t), img)


@pytest.mark.parametrize("comp", [5, 8])
def test_predictor2_roundtrip(comp):
    """Horizontal differencing: the writer diffs per sample, the
    decoder cumsums back."""
    img = _rgb(5, 9, seed=7)
    diff = img.astype(np.int16)
    diff[:, 1:, :] -= img[:, :-1, :].astype(np.int16)
    data = (diff % 256).astype(np.uint8).tobytes()
    t = write_tiff(
        [
            dict(
                data=data, w=9, h=5, spp=3, photo=2, comp=comp,
                predictor=2,
            )
        ]
    )
    assert np.array_equal(decode_tiff(t), img)


def test_gray1_and_gray4_with_row_padding():
    # 1-bit 10 wide: 2-byte rows
    bits1 = np.zeros((2, 10), np.uint8)
    bits1[0, ::2] = 1
    rows = []
    for r in range(2):
        packed = np.packbits(bits1[r])
        rows.append(packed.tobytes())
    t1 = write_tiff([dict(data=b"".join(rows), w=10, h=2, bits=1)])
    got = decode_tiff(t1)
    assert got.shape == (2, 10)
    assert list(got[0]) == [255, 0] * 5
    # 4-bit: samples 0..15 scale by 17
    t4 = write_tiff([dict(data=bytes([0x0F, 0x80]), w=3, h=1, bits=4)])
    assert list(decode_tiff(t4)[0]) == [0, 255, 8 * 17]


def test_white_is_zero_inverts():
    img = _gray(3, 4, seed=9)
    t = write_tiff([dict(data=img.tobytes(), w=4, h=3, photo=0)])
    assert np.array_equal(decode_tiff(t), 255 - img)


def test_palette_expansion():
    # 8-bit palette with 16-bit colormap entries (v * 257)
    idx = np.array([[0, 1], [2, 1]], np.uint8)
    colors = [(10, 20, 30), (200, 0, 100), (0, 255, 7)]
    cmap = [0] * (3 * 256)
    for i, (r, g, b) in enumerate(colors):
        cmap[i] = r * 257
        cmap[256 + i] = g * 257
        cmap[512 + i] = b * 257
    t = write_tiff(
        [dict(data=idx.tobytes(), w=2, h=2, photo=3, colormap=cmap)]
    )
    got = decode_tiff(t)
    assert got.shape == (2, 2, 3)
    assert tuple(got[0, 1]) == colors[1]
    assert tuple(got[1, 0]) == colors[2]


def test_multipage():
    a, b = _gray(2, 2, seed=3), _gray(3, 3, seed=4)
    t = write_tiff(
        [
            dict(data=a.tobytes(), w=2, h=2),
            dict(data=b.tobytes(), w=3, h=3, comp=5),
        ]
    )
    pages = decode_tiff_pages(t)
    assert len(pages) == 2
    assert np.array_equal(pages[0], a)
    assert np.array_equal(pages[1], b)
    assert np.array_equal(decode_tiff(t), a)  # first-page contract


def test_decode_image_dispatch():
    from data_governance_spark.operators.multimodal import (
        decode_image,
        image_features,
    )

    img = _gray(4, 4, seed=11)
    t = write_tiff([dict(data=img.tobytes(), w=4, h=4)], little=False)
    assert np.array_equal(decode_image(t), img)
    f = image_features(t)
    assert f[0] == 4.0 and f[2] == 1.0


# --------------------------------------------------------------------------
# typed boundaries + malformed
# --------------------------------------------------------------------------


def test_unsupported_features_raise_named():
    img = _gray(2, 2)
    cases = [
        (dict(comp=4), "CCITT"),
        (dict(comp=7), "JPEG-in-TIFF"),
        (dict(extra_tags=[(322, 4, 1, 16)]), "tiled"),
        (dict(extra_tags=[(284, 3, 1, 2)]), "planar"),
        (dict(bits=16), "16"),
    ]
    for kw, msg in cases:
        t = write_tiff([dict(data=img.tobytes(), w=2, h=2, **kw)])
        with pytest.raises(ValueError, match=msg):
            decode_tiff(t)


def test_truncated_and_garbage_raise_typed():
    img = _gray(4, 4)
    t = write_tiff([dict(data=img.tobytes(), w=4, h=4, comp=5)])
    with pytest.raises(ValueError):
        decode_tiff(t[:20])
    with pytest.raises(ValueError):
        decode_tiff(b"II*\x00" + b"\xff" * 40)
    with pytest.raises(ValueError):
        decode_tiff(b"PK\x03\x04 not a tiff")


def test_strip_short_raises_not_garbage():
    img = _gray(4, 4)
    t = bytearray(write_tiff([dict(data=img.tobytes(), w=4, h=4)]))
    # lie the height up: strips then cover fewer rows than claimed
    fmt = "<I"
    # height tag value: find 257 entry — simpler: the writer put h=4;
    # decoding after patching H to 8 must raise, not fabricate rows
    idx = t.find(struct.pack("<HHI", 257, 4, 1))
    assert idx >= 0
    struct.pack_into(fmt, t, idx + 8, 8)
    with pytest.raises(ValueError):
        decode_tiff(bytes(t))


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=2048), st.integers(0, 3))
def test_fuzz_never_untyped(data, hdr):
    headers = [b"", b"II*\x00", b"MM\x00*", b"II*\x00\x08\x00\x00\x00"]
    payload = headers[hdr] + data
    try:
        out = decode_tiff(payload)
        assert out.dtype == np.uint8
    except ValueError:
        pass


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 16),
    st.integers(1, 16),
    st.sampled_from([1, 5, 8, 32773]),
    st.integers(1, 6),
    st.integers(0, 2**32 - 1),
)
def test_fuzz_gray8_roundtrip(w, h, comp, rps, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w), np.uint8)
    t = write_tiff(
        [dict(data=img.tobytes(), w=w, h=h, comp=comp, rows_per_strip=rps)]
    )
    assert np.array_equal(decode_tiff(t), img)


def test_gate_payload_pin():
    """The q45 'tif' planted payload: regenerate from this suite's spec
    writer and pin bytes + features the oracle states as constants."""
    from data_governance_spark.operators.multimodal import image_features
    from data_governance_spark.queries.multimodal_gate import (
        _TIF_CONSTS,
        _TIF_HEX,
        _TIF_SD,
    )

    palette = [(128, 0, 64), (32, 96, 160), (0, 255, 17), (80, 80, 80)]
    img = np.zeros((4, 8, 3), np.uint8)
    for r in range(4):
        for c in range(8):
            img[r, c] = palette[(r + c) % 4]
    diff = img.astype(np.int16)
    diff[:, 1:, :] -= img[:, :-1, :].astype(np.int16)
    t = write_tiff(
        [
            dict(
                data=(diff % 256).astype(np.uint8).tobytes(),
                w=8, h=4, spp=3, photo=2, comp=5, predictor=2,
                rows_per_strip=2,
            )
        ],
        little=False,
    )
    assert t.hex() == _TIF_HEX
    f = image_features(t)
    assert tuple(f[:6]) == _TIF_CONSTS
    assert round(f[6], 4) == _TIF_SD


def test_real_world_fixture_decodes():
    """CPython ships a real 16x16 RGBA TIFF (test/imghdrdata) written
    by an independent encoder — container+layout validation beyond our
    own spec writer (the GIF/PNG suites' OS-fixture rule)."""
    import glob
    import os

    paths = sorted(
        glob.glob(
            os.path.join(
                os.path.dirname(os.__file__), "test", "imghdrdata",
                "python.tiff",
            )
        )
    )
    if not paths:
        pytest.skip("CPython test fixture not present")
    img = decode_tiff(open(paths[0], "rb").read())
    assert img.shape == (16, 16, 4)
    assert img.dtype == np.uint8
    # the Python-logo thumbnail: not degenerate
    assert 50 < float(img.mean()) < 200
