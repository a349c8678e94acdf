"""F11/F12: the citation (`fo`) and location (`lo`) string builders —
the two largest string-assembly functions of the reference transform
(02_create_iahx_xml_collection.py:273-459 and :194-270), re-expressed
as pure column expression trees (no UDFs; punctuation is bug-for-bug).
"""

from __future__ import annotations

import weakref

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_governance_spark.standardize.fields import _s, nz


def _opt(cond: Column, *parts: Column) -> Column:
    """Append parts when cond, else ''."""
    return F.when(cond, F.concat(*parts)).otherwise(F.lit(""))


def _splitlines_join(c: Column, sep: str = "; ") -> Column:
    """The reference's `x if isinstance(x, list) else x.splitlines()`
    then '; '.join — our schema normalizes to string, so split on
    newlines and rejoin (F21)."""
    return F.array_join(F.split(c, r"\r\n|\r|\n"), sep)


def _last_page_part(pages: Column, field: str) -> Column:
    """The reference's loop keeps the LAST non-empty value per subfield
    across page entries (:286-293)."""
    safe = F.coalesce(
        pages,
        F.array().cast("array<struct<_f:string,_l:string,text:string,f:string,_e:string>>"),
    )
    vals = F.filter(F.transform(safe, lambda p: p[field]), nz)
    return F.when(F.size(vals) > 0, F.element_at(vals, -1))


def _desc_b(di: Column) -> Column:
    """', '.join of non-empty _b subfields of descriptive_information."""
    vals = F.filter(
        F.transform(
            F.coalesce(di, F.array().cast("array<struct<_b:string>>")),
            lambda e: e["_b"],
        ),
        nz,
    )
    return F.when(F.size(vals) > 0, F.array_join(vals, ", "))


def _texts_join(entries: Column, sep: str) -> Column:
    vals = F.filter(
        F.coalesce(
            F.transform(entries, lambda e: e["text"]),
            F.array().cast("array<string>"),
        ),
        lambda x: x.isNotNull(),
    )
    return F.when(F.size(vals) > 0, F.array_join(vals, sep))


def _fo_as(c: dict[str, Column]) -> Column:
    """:274-308 — analytic-in-serial citation."""
    ts = c["title_serial"]
    pf = _last_page_part(c["pages"], "_f")
    pl = _last_page_part(c["pages"], "_l")
    ptx = _last_page_part(c["pages"], "text")
    desc = _desc_b(c["descriptive_information"])
    return F.trim(
        F.concat(
            _opt(nz(ts), ts),
            _opt(nz(c["volume_serial"]), F.lit(";"), c["volume_serial"]),
            _opt(nz(c["issue_number"]), F.lit("("), c["issue_number"], F.lit(")")),
            _opt(pf.isNotNull(), F.lit(": "), pf),
            _opt(pl.isNotNull(), F.lit("-"), pl),
            _opt(ptx.isNotNull(), ptx),
            _opt(nz(c["publication_date"]), F.lit(", "), c["publication_date"], F.lit(".")),
            _opt(desc.isNotNull(), F.lit(" "), desc),
        )
    )


def _fo_am(c: dict[str, Column]) -> Column:
    """:310-375 — analytic-in-monograph citation."""
    ind = _texts_join(c["individual_author_monographic"], "; ")
    corp = _texts_join(c["corporate_author_monographic"], "; ")
    titles = _texts_join(c["title_monographic"], " / ")
    ts = c["title_serial"]
    pf = _last_page_part(c["pages"], "_f")
    pl = _last_page_part(c["pages"], "_l")
    ptx = _last_page_part(c["pages"], "text")
    desc = _desc_b(c["descriptive_information"])
    has_ind = c["individual_author_monographic"].isNotNull() & (
        F.size(c["individual_author_monographic"]) > 0
    )
    has_corp = c["corporate_author_monographic"].isNotNull() & (
        F.size(c["corporate_author_monographic"]) > 0
    )
    authors = F.when(has_ind, ind).when(has_corp, corp)
    return F.trim(
        F.concat(
            _opt(has_ind | has_corp, F.lit("In. ")),
            _opt((has_ind | has_corp) & authors.isNotNull(), authors, F.lit(". ")),
            _opt(titles.isNotNull(), titles, F.lit(".")),
            _opt(nz(c["publication_city"]), F.lit(" "), c["publication_city"], F.lit(", ")),
            _opt(
                nz(c["publisher"]), _splitlines_join(c["publisher"]), F.lit(", ")
            ),
            _opt(nz(c["edition"]), _splitlines_join(c["edition"]), F.lit(", ")),
            _opt(nz(c["publication_date"]), c["publication_date"], F.lit(".")),
            _opt(pf.isNotNull() & pl.isNotNull(), F.lit(" p. "), pf, F.lit("-"), pl),
            _opt(ptx.isNotNull(), F.lit(" p. "), ptx),
            _opt(desc.isNotNull(), F.lit(", "), desc, F.lit(". ")),
            _opt(nz(ts), F.lit("("), ts),
            _opt(nz(c["volume_serial"]), F.lit(", "), c["volume_serial"]),
            _opt(nz(c["issue_number"]), F.lit(", "), c["issue_number"]),
            _opt(nz(ts), F.lit(").")),
            _opt(nz(c["symbol"]), F.lit(" ("), c["symbol"], F.lit(").")),
        )
    )


def _paren_block(c: dict[str, Column]) -> Column:
    ts = c["title_serial"]
    return F.concat(
        _opt(nz(ts), F.lit("("), ts),
        _opt(nz(c["volume_serial"]), F.lit(", "), c["volume_serial"]),
        _opt(nz(c["issue_number"]), F.lit(", "), c["issue_number"]),
        _opt(nz(ts), F.lit(").")),
        _opt(nz(c["symbol"]), F.lit(" ("), c["symbol"], F.lit(").")),
    )


def _pages_m(c: dict[str, Column]) -> Column:
    pm = c["pages_monographic"]
    return _opt(
        nz(pm),
        F.when(F.instr(pm, "p") > 0, F.concat(pm, F.lit(" "))).otherwise(
            F.concat(pm, F.lit(" p. "))
        ),
    )


def _fo_m(c: dict[str, Column]) -> Column:
    """:377-430 — monograph citation."""
    desc = _desc_b(c["descriptive_information"])
    imprint = (
        nz(c["publication_city"]) | nz(c["edition"]) | nz(c["publisher"])
    )
    with_imprint = F.concat(
        _opt(nz(c["publication_city"]), c["publication_city"], F.lit("; ")),
        _opt(nz(c["publisher"]), _splitlines_join(c["publisher"]), F.lit("; ")),
        _opt(nz(c["edition"]), _splitlines_join(c["edition"]), F.lit("; ")),
        _opt(nz(c["publication_date"]), c["publication_date"], F.lit(". ")),
        _pages_m(c),
        _opt(desc.isNotNull(), desc, F.lit(".")),
        _paren_block(c),
    )
    return F.trim(F.when(imprint, with_imprint).otherwise(_paren_block(c)))


def _fo_c(c: dict[str, Column]) -> Column:
    """:432-447 — collection citation (everything gated on city)."""
    desc = _desc_b(c["descriptive_information"])
    return F.trim(
        _opt(
            nz(c["publication_city"]),
            c["publication_city"], F.lit("; "),
            _opt(nz(c["publisher"]), _splitlines_join(c["publisher"]), F.lit("; ")),
            _opt(nz(c["edition"]), _splitlines_join(c["edition"]), F.lit("; ")),
            _opt(nz(c["publication_date"]), c["publication_date"], F.lit(". ")),
            _pages_m(c),
            _opt(desc.isNotNull(), desc, F.lit(".")),
        )
    )


def fo(cols: dict[str, Column]) -> Column:
    """Dispatch by treatment_level (:449-459): as / am* / m* / c.
    Returns NULL for other levels and for empty results (P8)."""
    tl = F.lower(_s(cols["treatment_level"]))
    out = (
        F.when(tl == "as", _fo_as(cols))
        .when(tl.startswith("am"), _fo_am(cols))
        .when(tl.startswith("m"), _fo_m(cols))
        .when(tl == "c", _fo_c(cols))
    )
    return F.when(nz(out), out)


FO_FIELDS = (
    "treatment_level", "title_serial", "volume_serial", "issue_number",
    "pages", "pages_monographic", "publication_date", "publication_city",
    "publisher", "edition", "descriptive_information", "symbol",
    "individual_author_monographic", "corporate_author_monographic",
    "title_monographic",
)


def fo_from(df_cols) -> Column:
    """Convenience: build fo from a DataFrame's columns by name."""
    return fo({name: F.col(name) for name in FO_FIELDS})


# ---------------------------------------------------------------------------
# Memoized standard trees. Building the fo tree costs ~2.5 s of pure
# py4j round-trips (measured; lo ~0.5 s) and the standard invocation —
# unresolved F.col references over the canonical field names — is
# identical everywhere it appears (transform.standardize, the q23/q36
# gates), so build it once per SparkContext. The store is a
# WeakKeyDictionary keyed by the context OBJECT (a Column wraps a JVM
# handle): entries die with their context, so a stopped+restarted
# context can neither serve a stale tree via a recycled object address
# (the id()-keyed design's failure mode) nor accumulate dead entries.
_PER_CONTEXT = weakref.WeakKeyDictionary()


def per_context_cache() -> dict:
    """The expression-tree memo dict scoped to the active SparkContext
    (shared with transform.py's wide-select cache). Returns a throwaway
    dict when no context is active — building a Column would fail there
    anyway, so nothing cacheable can arise."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None:
        return {}
    cache = _PER_CONTEXT.get(sc)
    if cache is None:
        cache = {}
        _PER_CONTEXT[sc] = cache
    return cache


def fo_standard() -> Column:
    """``fo`` over the standard FO_FIELDS names, memoized per context."""
    cache = per_context_cache()
    if "fo" not in cache:
        cache["fo"] = fo({name: F.col(name) for name in FO_FIELDS})
    return cache["fo"]


def lo_standard() -> Column:
    """``lo`` over the standard call_number column, memoized per
    context."""
    cache = per_context_cache()
    if "lo" not in cache:
        cache["lo"] = lo(F.col("call_number"))
    return cache["lo"]


# --------------------------------------------------------------------------
# F12: lo location builder (:194-270)
_SUBFIELDS = [
    ("_d", ", "), ("_e", ", "), ("_f", ", "), ("_g", ", "),
    ("_h", ". "), ("_i", ","), ("_j", ". "), ("_k", ". "),
    ("_l", ". "), ("_m", ". "), ("_n", ". "), ("_o", ". "),
    ("_p", ". "), ("_q", ". "), ("_r", ". "), ("_s", ". "),
    ("_t", ". "), ("_u", ". "), ("_v", ". "), ("_w", ". "),
    ("_x", ". "), ("_y", ". "), ("_z", ". "), ("_0", ". "),
    ("_1", ". "), ("_2", ". "), ("_3", ". "), ("_4", ". "),
    ("_5", ". "),
]
_LAST_FIELDS = [("_7", ". "), ("_8", ". "), ("_9", ". ")]


def _lo_entry(e: Column) -> Column:
    text = F.trim(_s(e["text"]))
    a = F.trim(_s(e["_a"]))
    b = F.trim(_s(e["_b"]))
    c = F.trim(_s(e["_c"]))
    used_a = a != ""
    used_b = b != ""
    parts = [
        _opt(text != "", text, F.lit(";")),
        _opt(used_a, F.when(text != "", F.lit(" ")).otherwise(F.lit("")), a),
        _opt(used_b, F.when(used_a, F.lit(", ")).otherwise(F.lit("")), b),
        _opt(c != "", F.when(used_a | used_b, F.lit(", ")).otherwise(F.lit("")), c),
    ]
    for key, sep in _SUBFIELDS:
        v = F.trim(_s(e[key]))
        parts.append(_opt(v != "", F.lit(sep), v))
    six = F.trim(_s(e["_6"]))
    parts.append(
        _opt(
            six != "",
            F.when(text == "", F.lit(". ")).otherwise(F.lit(" ")),
            six,
        )
    )
    for key, sep in _LAST_FIELDS:
        v = F.trim(_s(e[key]))
        parts.append(_opt(v != "", F.lit(sep), v))
    joined = F.trim(F.concat(*parts))
    # drop a dangling trailing ';'
    return F.trim(
        F.when(joined.endswith(";"), F.rtrim(F.substring(joined, 1, F.length(joined) - 1)))
        .otherwise(joined)
    )


def lo(call_number: Column) -> Column:
    """' / '-joined formatted call_number entries; NULL when none."""
    fields = ["text"] + [f"_{c}" for c in "abcdefghijklmnopqrstuvwxyz0123456789"]
    empty_type = "array<struct<" + ",".join(f"{f}:string" for f in fields) + ">>"
    entries = F.filter(
        F.transform(
            F.coalesce(call_number, F.array().cast(empty_type)),
            _lo_entry,
        ),
        lambda x: x != "",
    )
    return F.when(F.size(entries) > 0, F.array_join(entries, " / "))
