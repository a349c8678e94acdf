"""Property-based tests (hypothesis) for the pure normalization
functions whose IDEMPOTENCY the pipeline's re-run convergence rests on:
x01 re-applies country title-casing on every run (test_pipeline's
idempotent-rerun test is one fixed case; these sweep the input space).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.standardize.udfs import (
    normalize_afiliacao_string,
    normalize_country_name,
    strip_diacritics,
)

# realistic bibliographic text: latin letters incl. accents, digits,
# spaces, and the token punctuation the grammar handles
_ALPHA = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "áéíóúâêôãõàçÁÉÍÓÚÂÊÔÃÕÀÇüÜñÑ"
    "0123456789 -()'"
)
_text = st.text(alphabet=_ALPHA, max_size=40)


@given(_text)
@settings(max_examples=300, deadline=None)
def test_strip_diacritics_idempotent(s):
    once = strip_diacritics(s)
    assert strip_diacritics(once) == once


@given(_text)
@settings(max_examples=300, deadline=None)
def test_normalize_country_name_idempotent(s):
    once = normalize_country_name(s)
    assert normalize_country_name(once) == once


@given(st.lists(_text, max_size=4), st.sampled_from("iepf"))
@settings(max_examples=200, deadline=None)
def test_normalize_afiliacao_idempotent(segs, marker):
    s = "".join(f"^{marker}{seg}" for seg in segs)
    once = normalize_afiliacao_string(s)
    assert normalize_afiliacao_string(once) == once


@given(_text)
@settings(max_examples=200, deadline=None)
def test_strip_diacritics_preserves_ascii(s):
    ascii_only = "".join(c for c in s if ord(c) < 128)
    assert strip_diacritics(ascii_only) == ascii_only


# --------------------------------------------------------------------------
# operators/sampling.threshold_hex: the entire split/sample design rests
# on "fixed-width lowercase hex compares lexicographically exactly as it
# compares numerically" — sweep that claim, not just three examples.
from data_governance_spark.operators.sampling import threshold_hex


@given(st.integers(0, 0xFFFFFFFF), st.floats(0.0, 1.0, allow_nan=False))
@settings(max_examples=500, deadline=None)
def test_threshold_membership_equals_numeric(v, frac):
    h = format(v, "08x")
    expected = v < min(int(frac * 2**32), 2**32)
    assert (h < threshold_hex(frac)) == expected


@given(
    st.floats(0.0, 1.0, allow_nan=False),
    st.floats(0.0, 1.0, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_threshold_hex_monotone(a, b):
    lo, hi = sorted((a, b))
    assert threshold_hex(lo) <= threshold_hex(hi)


# ---- codec round-trip fuzz (hypothesis) ----------------------------------
from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    data=st.data(),
    interlace=st.booleans(),
)
def test_png_roundtrip_fuzz(h, w, data, interlace):
    """Any uint8 RGB image survives encode->decode bit-exact, under
    random per-row filter choices and optional Adam7."""
    import numpy as np

    from data_governance_spark.operators.multimodal import decode_png
    from test_multimodal_codecs import png_bytes

    pix = np.array(
        data.draw(
            st.lists(
                st.lists(
                    st.tuples(*[st.integers(0, 255)] * 3),
                    min_size=w, max_size=w,
                ),
                min_size=h, max_size=h,
            )
        ),
        dtype=np.uint8,
    )
    filters = tuple(
        data.draw(st.lists(st.integers(0, 4), min_size=1, max_size=5))
    )
    got = decode_png(png_bytes(pix, ctype=2, filters=filters,
                               interlace=interlace))
    assert np.array_equal(got, pix)


@settings(max_examples=20, deadline=None)
@given(
    n8=st.integers(1, 37),
    order=st.integers(0, 4),
    p_order=st.integers(0, 2),
    data=st.data(),
)
def test_flac_roundtrip_fuzz(n8, order, p_order, data):
    """FLAC is lossless: ANY int16 signal must round-trip bit-exact
    through every fixed-predictor order and partition order (blocksize
    padded to make partitions divide)."""
    import numpy as np

    from data_governance_spark.operators.flac import decode_flac
    from test_flac_codec import flac_bytes

    from hypothesis import assume

    n = n8 * 8  # multiple of 8 so every partition order divides
    # spec constraint: the first partition must still hold samples
    # after the predictor warmup (hypothesis found the n=8, order=3,
    # p_order=2 violation — the decoder rightly rejects such streams)
    assume(n // (1 << p_order) > order)
    pcm = np.array(
        data.draw(
            st.lists(st.integers(-32768, 32767), min_size=n, max_size=n)
        ),
        dtype=np.int16,
    )[:, None]
    raw = flac_bytes(pcm, blocksize=n, mode="fixed", fixed_order=order,
                     p_order=p_order)
    arr, _ = decode_flac(raw)
    assert np.array_equal(arr, pcm)
