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
