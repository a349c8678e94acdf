"""P4: the reference's country-match predicate, reproduced exactly
(dags/tmgl_metrics/misc.py:4-40).

A document matches a country when any of:
- ``pais_afiliacao`` element matches ``(?i)\\^i<country>`` (prefix
  after the ^i subfield marker),
- ``cp`` element matches ``(?i)<country>`` — a SUBSTRING match
  ('Zealand' matches 'New Zealand'; this looseness is reference
  behavior, kept bug-for-bug),
- single-country queries only: ``who_regions`` element matches
  ``(?i)/<country_with_underscores>$`` (the multi-country/region form
  omits this clause — misc.py:25-40).

``attach_slice_p4`` evaluates every region's country list in ONE scan
(an array of when()s, exploded), replacing the reference's N+1
per-region server queries while keeping its exact match semantics.
The join-based ``runner.attach_slice`` remains the scale path for
normalized data (exact keys, broadcast join); use this one when parity
with the regex semantics matters.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EMPTY = "array<string>"


def _any_rlike(col: Column, pattern: str) -> Column:
    return F.exists(
        F.coalesce(col, F.array().cast(_EMPTY)), lambda x: x.rlike(pattern)
    )


# (?iu): Mongo's $regex 'i' option case-folds Unicode; Java's (?i)
# alone is ASCII-only, which would silently drop accented country
# names (Türkiye, Côte d'Ivoire) from their slices
_CI = "(?iu)"


def country_match(
    country: str,
    pais_afiliacao: Column,
    cp: Column,
    who_regions: Column | None = None,
) -> Column:
    """Single-country predicate (misc.py:4-22); pass who_regions=None
    for the multi-country clause set (misc.py:25-40)."""
    esc = re.escape(country)
    out = _any_rlike(pais_afiliacao, f"{_CI}\\^i{esc}") | _any_rlike(
        cp, f"{_CI}{esc}"
    )
    if who_regions is not None:
        und = country.replace(" ", "_")
        out = out | _any_rlike(who_regions, f"{_CI}/{und}$")
    return out


def countries_match(
    countries: list[str], pais_afiliacao: Column, cp: Column
) -> Column:
    """Region form: per-country clauses folded into ONE alternation
    pattern per field (misc.py:25-40 builds a big $or; a 200-country
    region as 400 chained rlike nodes would blow up Catalyst analysis
    — '(a|b|...)' is semantically identical and O(1) expressions)."""
    if not countries:
        return F.lit(False)
    alts = "|".join(re.escape(c) for c in countries)
    return _any_rlike(pais_afiliacao, f"{_CI}\\^i(?:{alts})") | _any_rlike(
        cp, f"{_CI}(?:{alts})"
    )


def attach_slice_p4(
    facts: DataFrame,
    slice_countries: dict[str, list[str]],
    slice_col: str = "region",
    pais_afiliacao_col: str = "pais_afiliacao",
    cp_col: str = "cp",
) -> DataFrame:
    """One-scan fan-out: a row is duplicated once per matching slice
    (rows matching nothing keep slice NULL), with the reference's exact
    regex semantics. Slice count is small (6 WHO regions / ~200
    countries) so the when()-array stays a single projection."""
    from data_governance_spark.cache import column_memo

    # pure function of (slice map, column names) — memoized per context
    # (~0.9 s of regex-alternation Column builds per call; q37's bundle
    # and the sliced metric gates rebuild identical trees)
    key = (
        "p4_slice_matches",
        tuple((n, tuple(cs)) for n, cs in sorted(slice_countries.items())),
        pais_afiliacao_col,
        cp_col,
    )

    def _build() -> Column:
        pa = F.col(pais_afiliacao_col)
        cp = F.col(cp_col)
        return F.array_compact(
            F.array(
                *[
                    F.when(countries_match(cs, pa, cp), F.lit(name))
                    for name, cs in sorted(slice_countries.items())
                ]
            )
        )

    matches = column_memo(key, _build)
    return facts.withColumn(slice_col, F.explode_outer(matches))
