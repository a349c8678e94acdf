"""PII detection and redaction for training corpora.

Web-scale training pipelines scrub obvious personal identifiers before
a corpus ships (the published pipelines — C4, RefinedWeb, Dolma — all
run a regex pass of exactly this shape). This module provides the
standard four detectors as pure Catalyst regex expressions:

- email addresses
- phone-number-shaped digit runs (international/US formats)
- IPv4 addresses
- URLs (http/https/www)

``pii_counts`` annotates per-document match counts (the audit view);
``redact_pii`` replaces matches with typed placeholder tokens
(``<EMAIL>`` etc.), the corpus-mutation view. Both are map-only
projections — no shuffle, no UDF; at 100 TB they fuse into the scan.

Patterns are deliberately conservative (high precision over recall):
a training-data scrub that eats ordinary prose does more damage than
one that misses an exotic phone format. Recall-critical deployments
(GDPR erasure, medical records) need NER models, not regexes — that is
out of scope here, as in the published pipelines.

Order matters in ``redact_pii``: URLs are redacted BEFORE emails and
phones so a URL containing an @ or digit run collapses to one <URL>
token instead of a mixed redaction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Conservative shared-dialect regexes (no lookaround, no \b ambiguity
# across engines; Java and RE2 both accept these).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"(https?://|www\.)[^\s<>\"']+"
IPV4_RE = r"(^|[^0-9.])((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])($|[^0-9.])"
# +country / (area) / dash- or space-grouped digits, guarded by
# non-digit boundaries so the engine can't backtrack into a longer
# digit run ("2024 2025" must not yield "024 2025"). Deliberately NOT
# dotted groups: "192.168" inside any IPv4 would match a dotted phone
# (precision-over-recall, like the rest of this module).
#
# Boundary guards CONSUME one character (no lookaround: the same
# patterns run under DuckDB's RE2 in the d05 oracle, which has none),
# so two phones/IPs separated by a single character leave the second
# undetected in that pass — a stated limitation; redact_pii(passes=2)
# catches it (prepare_corpus's default).
PHONE_RE = r"(^|[^0-9])((\+[0-9]{1,3}[ -]?)?(\([0-9]{2,4}\)[ -]?)?[0-9]{3}[ -][0-9]{3,4}([ -][0-9]{2,4})?)($|[^0-9-])"

PII_PATTERNS: dict[str, str] = {
    "url": URL_RE,
    "email": EMAIL_RE,
    "ipv4": IPV4_RE,
    "phone": PHONE_RE,
}


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def pii_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Annotate with ``n_<kind>`` match counts per document — the audit
    pass a pipeline runs to size the scrub before mutating anything."""
    c = F.col(text_col)
    return docs.select(
        "*",
        *[
            _count(c, p).alias(f"n_{kind}")
            for kind, p in PII_PATTERNS.items()
        ],
    )


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("url", "email", "ipv4", "phone"),
    out_col: str | None = None,
    passes: int = 1,
) -> DataFrame:
    """Replace each PII match with its ``<KIND>`` placeholder, in the
    declared order (URL first — see module docstring). Writes over
    ``text_col`` unless ``out_col`` names a new column.

    ``passes=2`` runs the whole scrub twice: the boundary-guarded
    patterns (ipv4/phone) consume one surrounding character, so
    ADJACENT items ('1.2.3.4,5.6.7.8') leave the second undetected in a
    single pass — the second pass catches it. Still a pure projection
    (the regex chain just doubles); more than 2 passes only matters for
    runs of 3+ back-to-back guarded items, vanishingly rare in prose.
    """
    unknown = set(kinds) - PII_PATTERNS.keys()
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    if passes < 1:
        raise ValueError(f"passes must be >= 1, got {passes}")
    c = F.col(text_col)
    # boundary-guarded patterns consume their surrounding chars — keep
    # them (the named groups) around the placeholder
    _guarded = {"ipv4": r"$1<IPV4>$5", "phone": r"$1<PHONE>$6"}
    for _ in range(passes):
        for kind in kinds:
            c = F.regexp_replace(
                c,
                PII_PATTERNS[kind],
                _guarded.get(kind, f"<{kind.upper()}>"),
            )
    if out_col:
        return docs.select("*", c.alias(out_col))
    return docs.select(
        *[
            c.alias(text_col) if x == text_col else F.col(x)
            for x in docs.columns
        ]
    )
