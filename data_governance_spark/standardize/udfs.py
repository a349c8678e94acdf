"""The only two Python UDF families in the engine (SURVEY §7.3):
diacritics stripping and Portuguese-stopword-aware title casing.
Everything else is a native column expression.

Both run on the FACT path (J7 probes every exploded `database` entry;
x01 normalizes `pais_afiliacao`/`pais_publicacao` on every record), so
they are Arrow-batched Pandas UDFs, not row-at-a-time `F.udf` — the
per-row Python-call overhead is the difference between a per-batch
Arrow transfer and 100TB x per-row pickling.
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import functions as F
from pyspark.sql import types as T


def strip_diacritics(s: str | None) -> str | None:
    """F3 (misc.py:33-35): NFKD normalize, drop combining marks."""
    if s is None:
        return None
    nfkd = unicodedata.normalize("NFKD", s)
    return "".join(c for c in nfkd if not unicodedata.combining(c))


def _series_udf(fn):
    """Wrap a str->str pure function as an Arrow-batched Pandas UDF.
    (Annotation-free lambdas inside: `str | None` hints on the plain
    functions confuse eval-type inference, ADVICE r2.)"""
    return F.pandas_udf(
        lambda s: s.map(lambda x: None if x is None else fn(x)),
        T.StringType(),
    )


strip_diacritics_udf = _series_udf(strip_diacritics)


# F19 (02_x01_create_iahx_xml_collection.py:26-57): country-name title
# casing with Portuguese prepositions kept lowercase, parenthesized and
# hyphenated tokens recursed, and ^x-subfield-aware application.
_PREPOSITIONS = {
    "de", "do", "da", "dos", "das", "e", "em", "no", "na", "nos", "nas",
    "à", "às", "ao", "aos", "por", "para", "com", "sem", "sob", "sobre", "entre",
}


def _remove_accents_nfd(text: str) -> str:
    # the reference's remove_accents uses NFD + category Mn (x01:31-32),
    # subtly different from F3's NFKD + combining()
    return "".join(
        c for c in unicodedata.normalize("NFD", text)
        if unicodedata.category(c) != "Mn"
    )


def _normalize_word(word: str) -> str:
    plain = _remove_accents_nfd(word).lower()
    if plain in _PREPOSITIONS:
        return word.lower()
    return word.capitalize()


def normalize_country_name(text: str | None) -> str | None:
    if text is None:
        return None

    def normalize_token(token: str) -> str:
        if token.startswith("(") and token.endswith(")"):
            return f"({normalize_country_name(token[1:-1])})"
        parts = token.split("-")
        return "-".join(
            " ".join(_normalize_word(w) for w in part.split()) for part in parts
        )

    tokens = re.findall(r"\([^\)]+\)|[^\s]+", text)
    return " ".join(normalize_token(t) for t in tokens)


def normalize_afiliacao_string(pais_str: str | None) -> str | None:
    """Apply the title-casing to each ^x-prefixed segment (x01:53-57)."""
    if pais_str is None:
        return None

    def repl(m: re.Match) -> str:
        return f"{m.group(1)}{normalize_country_name(m.group(2))}"

    return re.sub(
        r"(\^[a-z])([A-ZÇÁÉÍÓÚÂÊÔÃÕÄËÏÖÜÀÈÌÒÙÑ ()\-\w]+)", repl, pais_str
    )


normalize_country_name_udf = _series_udf(normalize_country_name)
normalize_afiliacao_string_udf = _series_udf(normalize_afiliacao_string)

# array<string> variant for pais_afiliacao lists (x01 fact path)
normalize_afiliacao_list_udf = F.pandas_udf(
    lambda s: s.map(
        lambda xs: None
        if xs is None
        else [normalize_afiliacao_string(x) for x in xs]
    ),
    T.ArrayType(T.StringType()),
)
