"""Text analytics column builders (tokens, shingles, quality, lang-id).

These power the training-data-pipeline operators (dedup, quality
scoring, language ID) over the ``documents`` table. Everything here is
a pure Catalyst column expression — no Python UDFs — so the plans stay
in whole-stage codegen and scale linearly with executors.

Reference parity notes: the reference normalizes join keys with
lower+trim (dags/data_governance/misc.py:45,50,62,78) and strips
diacritics via NFKD (misc.py:33-35); ``norm_key`` is the centralized
equivalent (SURVEY §7.4 item 7).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Language marker tokens for the n-gram/stopword language-ID heuristic.
# Deliberately tiny + deterministic so the oracle SQL can mirror it.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
}

STOPWORDS: tuple[str, ...] = tuple(sorted({w for ws in LANG_MARKERS.values() for w in ws}))

# BPE-ish token regex: runs of word chars OR single non-space symbols.
TOKEN_REGEX = r"[\w]+|[^\w\s]"


def norm_key(col: Column | str) -> Column:
    """lower(trim(x)) — the canonical join-key normalization."""
    return F.lower(F.trim(F.col(col) if isinstance(col, str) else col))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty tokens dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def regex_tokens(col: Column | str) -> Column:
    """BPE-ish tokenization: word runs + individual symbols.

    idx=0 (whole match) is required: the pattern has no capture group
    and Spark's regexp_extract_all defaults to group 1."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0)


def word_shingles(tokens_col: Column, n: int = 3) -> Column:
    """n-gram word shingles from a token array → array<string>.

    transform over sequence keeps this JVM-side; used as the MinHash /
    Jaccard feature set.
    """
    return F.when(
        F.size(tokens_col) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens_col) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tokens_col, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array(F.concat_ws(" ", tokens_col)))


def stopword_count(tokens_col: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(tokens_col, lambda t: t.isin(*stopwords)))


def marker_score(tokens_col: Column, lang: str) -> Column:
    """Occurrence count of a language's marker tokens."""
    return F.size(F.filter(tokens_col, lambda t: t.isin(*LANG_MARKERS[lang])))


def shingle_hashes(shingles_col: Column) -> Column:
    """Positional rolling-hash sequence: md5 of each k-gram shingle.

    md5 (not xxhash64) so the DuckDB oracle computes bit-identical
    hashes; the hex strings compare lexicographically exactly as the
    128-bit values compare numerically, which is all winnowing needs.
    IMPORTANT: materialize the input shingle array as a real column
    first — higher-order functions re-evaluate argument expressions on
    every element access (see winnow_fingerprints).
    """
    return F.transform(shingles_col, lambda s: F.md5(s))


def winnow_fingerprints(hashes_col: Column, window: int = 4) -> Column:
    """Winnowing (Schleimer et al., SIGMOD 2003): the document
    fingerprint set is the min hash of every ``window`` consecutive
    shingle hashes. Guarantees any shared run of window+k-1 tokens
    between two documents yields a shared fingerprint, while keeping
    the fingerprint density ~2/(window+1) — the standard local
    plagiarism/near-dup sketch. Short documents (< window shingles)
    contribute their single global min.

    Returns array<string> (md5 hex) with duplicates removed.
    """
    wins = F.transform(
        F.sequence(F.lit(0), F.size(hashes_col) - window),
        lambda j: F.array_min(F.slice(hashes_col, j + 1, window)),
    )
    return F.array_distinct(
        F.when(F.size(hashes_col) >= window, wins).otherwise(
            F.array(F.array_min(hashes_col))
        )
    )


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    Normalization = lower, collapse whitespace, trim — so trivially
    reformatted duplicates collapse to one fingerprint.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))
