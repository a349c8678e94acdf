"""Column-expression builders for the standardize stage (SURVEY §2.7).

Each builder re-expresses one standardize_* function of the reference's
core transform (citations are into /root/reference/). Semantics are
bug-for-bug, with two documented divergences (SURVEY §7.4): Python
``set()`` orderings become sorted arrays (the reference's orders are
hash-nondeterministic), and wall-clock year is an injected parameter.

Falsy-string semantics: the reference treats '' and missing alike
(``if page['_f']``), so builders test both null and ''.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nz(c: Column) -> Column:
    """Python-truthy test for a string column: present and non-empty."""
    return c.isNotNull() & (c != "")


def _s(c: Column) -> Column:
    """Null -> '' (the reference's .get(key, '') default)."""
    return F.coalesce(c, F.lit(""))


# --------------------------------------------------------------------------
# F9: pages (02_create_iahx_xml_collection.py:69-81)
def pages(pages_col: Column) -> Column:
    """array<string>: '_f-_l' if both, else text, else f, else _e;
    entries with none of them are dropped."""
    formatted = F.transform(
        pages_col,
        lambda p: F.when(
            nz(p["_f"]) & nz(p["_l"]), F.concat(p["_f"], F.lit("-"), p["_l"])
        )
        .when(nz(p["text"]), p["text"])
        .when(nz(p["f"]), p["f"])
        .when(nz(p["_e"]), p["_e"]),
    )
    return F.filter(formatted, lambda x: x.isNotNull())


def pg(pages_col: Column, pages_monographic: Column) -> Column:
    """:781-786 — pages list if the field exists, else pages_monographic
    (string) when present. Spark: array from pages, else wrap the
    monographic string."""
    return F.when(pages_col.isNotNull(), pages(pages_col)).otherwise(
        F.when(nz(pages_monographic), F.array(pages_monographic))
    )


# --------------------------------------------------------------------------
# F7: language-keyed pivot of title/abstract (:84-95, :148-164)
def _lang_of(entry: Column) -> Column:
    # NULL _i behaves like the reference's .get('_i', '') — the bare
    # field. Without the coalesce a NULL lang would become a NULL map
    # key (map_from_arrays rejects those) and poison has_en's exists().
    return F.coalesce(F.lower(_s(entry["_i"])), F.lit(""))


def title_lang_map(titles: Column) -> Column:
    """map<lang, array<title_text>>; lang '' = the bare `ti` field.

    Per-row pivot without a shuffle: distinct langs, then one filtered
    projection per lang (O(L^2) on a tiny L).
    """
    entries = F.filter(titles, lambda t: t["text"].isNotNull())
    langs = F.array_distinct(F.transform(entries, _lang_of))
    return F.map_from_arrays(
        langs,
        F.transform(
            langs,
            lambda lang: F.transform(
                F.filter(entries, lambda t: _lang_of(t) == lang),
                lambda t: t["text"],
            ),
        ),
    )


def scrub_text(c: Column) -> Column:
    """:157-158 — '\\r\\n' -> ' ', control chars -> ' ' (F6)."""
    return F.regexp_replace(
        F.regexp_replace(c, r"\r\n", " "), "[\x00-\x08\x0b-\x0c\x0e-\x1f]", " "
    )


def abstract_lang_map(abstracts: Column) -> Column:
    """map<lang, text>: same-language abstracts concatenated with ' '
    in array order (:160-163)."""
    entries = F.filter(abstracts, lambda t: t["text"].isNotNull())
    langs = F.array_distinct(F.transform(entries, _lang_of))
    return F.map_from_arrays(
        langs,
        F.transform(
            langs,
            lambda lang: F.array_join(
                F.transform(
                    F.filter(entries, lambda t: _lang_of(t) == lang),
                    lambda t: scrub_text(t["text"]),
                ),
                " ",
            ),
        ),
    )


# --------------------------------------------------------------------------
# F8: multilingual title dispatch (:98-145)
def multilingual_title(
    treatment_level: Column,
    literature_type: Column,
    title: Column,
    title_monographic: Column,
    title_collection: Column,
    english_translated_title: Column,
    english_title_monographic: Column,
    english_title_collection: Column,
) -> Column:
    """map<lang, array<text>> chosen by treatment_level prefix:
    a* -> title (+english_translated_title as 'en' when no en entry),
    m* -> title_monographic (+title_collection when tl='mc' and
    lit in {mc,m}), c -> title_collection. Missing lists behave as []
    (the reference's .get(field, []))."""
    tl = F.lower(_s(treatment_level))
    lit = F.lower(_s(literature_type))

    def empty_if_null(c: Column) -> Column:
        return F.coalesce(c, F.array().cast("array<struct<text:string,_i:string>>"))

    def has_en(lst: Column) -> Column:
        return F.exists(lst, lambda t: _lang_of(t) == "en")

    def with_fallback(lst: Column, fallback: Column) -> Column:
        base = title_lang_map(lst)
        return F.when(
            ~has_en(lst) & nz(fallback),
            F.map_concat(base, F.create_map(F.lit("en"), F.array(fallback))),
        ).otherwise(base)

    m_list = F.when(
        (tl == "mc") & lit.isin("mc", "m"),
        F.concat(empty_if_null(title_monographic), empty_if_null(title_collection)),
    ).otherwise(empty_if_null(title_monographic))

    return (
        F.when(tl.startswith("a"), with_fallback(empty_if_null(title), english_translated_title))
        .when(tl.startswith("m"), with_fallback(m_list, english_title_monographic))
        .when(tl == "c", with_fallback(empty_if_null(title_collection), english_title_collection))
        .otherwise(F.create_map().cast("map<string,array<string>>"))
    )


# --------------------------------------------------------------------------
# F10: electronic_address / URL classification (:167-191)
def _valid_ea(e: Column) -> Column:
    return nz(e["_u"])


def ur(ea: Column) -> Column:
    return F.transform(F.filter(ea, _valid_ea), lambda e: e["_u"])


def ur_multimedia(ea: Column) -> Column:
    """_y contains 'MULTIM' — case-sensitive on the RAW value (:182-183)."""
    return F.transform(
        F.filter(ea, lambda e: _valid_ea(e) & (F.instr(_s(e["_y"]), "MULTIM") > 0)),
        lambda e: e["_u"],
    )


def ur_audio(ea: Column) -> Column:
    """_y contains 'UDIO' — raw value, so 'AUDIO'/'ÁUDIO' match
    (:185-186; contrast the dead lowered check in doctype F15)."""
    return F.transform(
        F.filter(ea, lambda e: _valid_ea(e) & (F.instr(_s(e["_y"]), "UDIO") > 0)),
        lambda e: e["_u"],
    )


def ur_meta(ea: Column) -> Column:
    return F.transform(
        F.filter(ea, lambda e: _valid_ea(e) & nz(e["_x"])), lambda e: e["_u"]
    )


def fulltext_flag(ea: Column) -> Column:
    """1 when any url mentions www/internet/http (:178-179); int in this
    pipeline, string '1' in the XML-sourced TMGL zone (SURVEY §7.4.5)."""
    has = F.exists(
        ea,
        lambda e: _valid_ea(e)
        & (
            (F.instr(F.lower(e["_u"]), "www") > 0)
            | (F.instr(F.lower(e["_u"]), "internet") > 0)
            | (F.instr(F.lower(e["_u"]), "http") > 0)
        ),
    )
    return F.when(has, F.lit(1))


# --------------------------------------------------------------------------
# F13: id synthesis (:556-562)
def doc_id(id_pk: Column, lilacs_original_id: Column) -> Column:
    return F.when(
        nz(lilacs_original_id), F.concat(F.lit("lil-"), lilacs_original_id)
    ).otherwise(F.concat(F.lit("biblio-"), id_pk.cast("string")))


def alternate_id(alternate_ids: Column, id_value: Column) -> Column:
    """:917 — drop empties and the doc's own id."""
    return F.filter(
        alternate_ids, lambda x: nz(x) & (x != id_value)
    )


# --------------------------------------------------------------------------
# F18: ta_fascic (:608-620) — quirk preserved: when volume & issue are
# both absent the suffix degenerates to '; , <year>'.
def ta_fascic(
    ta_var: Column, volume_serial: Column, issue_number: Column, year: Column
) -> Column:
    suffix_core = F.concat_ws(
        " ",
        *[
            F.when(nz(volume_serial), volume_serial),
            F.when(nz(issue_number), F.concat(F.lit("("), issue_number, F.lit(")"))),
        ],
    )
    suffix = F.concat(F.lit("; "), suffix_core, F.lit(", "), _s(year))
    return F.when(
        ta_var.isNull() | (F.size(ta_var) == 0), F.array().cast("array<string>")
    ).otherwise(
        F.concat(ta_var, F.transform(ta_var, lambda t: F.concat(t, suffix)))
    )


# --------------------------------------------------------------------------
# F15: document-type derivation (:623-677)
_VIDEO_EXTS = (".mp4", ".avi", ".wmv", ".mpeg", ".mpe", ".mpg")
_AUDIO_EXTS = (".wma", ".mp3", ".mp4", ".wav")
_CONGRESS = ("mc", "mcp", "msc", "nc", "sc", "scp")
_PROJECT = ("mcp", "mp", "msp", "np", "scp", "sp")


def _contains_any(c: Column, needles: tuple[str, ...]) -> Column:
    out = F.lit(False)
    for n in needles:
        out = out | (F.instr(c, n) > 0)
    return out


def document_type(literature_type: Column, ea: Column) -> Column:
    """array<string> of derived types. Char containment on
    literature_type ('msc' yields monography AND article), exact-code
    sets for congress/project, media sniffing on electronic_address.
    The reference's 'UDIO' in lowered _y (:671) can never match — the
    dead branch is reproduced by omission. Output sorted (the
    reference's set() order is nondeterministic — documented
    divergence)."""
    lt = F.lower(_s(literature_type))
    ea_safe = F.coalesce(
        ea, F.array().cast("array<struct<_u:string,_y:string,_z:string,_x:string,_q:string>>")
    )
    video = F.exists(
        ea_safe,
        lambda e: (F.instr(F.lower(_s(e["_y"])), "multim") > 0)
        | (F.instr(F.lower(_s(e["_z"])), "deo") > 0)
        | _contains_any(F.lower(_s(e["_u"])), _VIDEO_EXTS),
    )
    podcast = F.exists(
        ea_safe,
        lambda e: _contains_any(F.lower(_s(e["_q"])), _AUDIO_EXTS)
        | _contains_any(F.lower(_s(e["_u"])), _AUDIO_EXTS),
    )
    flags = [
        (F.instr(lt, "s") > 0, "article"),
        (F.instr(lt, "m") > 0, "monography"),
        (F.instr(lt, "n") > 0, "non-conventional"),
        (F.instr(lt, "t") > 0, "thesis"),
        (lt.isin(*_CONGRESS), "congress and conference"),
        (lt.isin(*_PROJECT), "project document"),
        (video, "video"),
        (podcast, "podcast"),
    ]
    arr = F.array(*[F.when(cond, F.lit(name)) for cond, name in flags])
    return F.array_sort(F.filter(arr, lambda x: x.isNotNull()))


# --------------------------------------------------------------------------
# A18: weight (:680-712) — wall-clock year injected (SURVEY §7.4.4)
def weight(
    literature_type: Column,
    publication_date_normalized: Column,
    abstract: Column,
    ea: Column,
    current_year: int,
) -> Column:
    lt = F.lower(_s(literature_type))
    base = (
        F.when(lt.startswith("s"), 15)
        .when(lt.startswith("t"), 10)
        .when(lt.startswith("m"), 5)
        .when(lt.startswith("n"), 2)
        .otherwise(0)
    )
    year4 = F.substring(_s(publication_date_normalized), 1, 4).try_cast("int")
    recency = F.when(
        year4.isNotNull(), F.lit(20) - (F.lit(current_year) - year4)
    ).otherwise(0)
    has_abstract = F.when(abstract.isNotNull() & (F.size(abstract) > 0), 5).otherwise(0)
    has_ea = F.when(ea.isNotNull() & (F.size(ea) > 0), 5).otherwise(0)
    return F.greatest(base + recency + has_abstract + has_ea, F.lit(0))


# --------------------------------------------------------------------------
# F16: status decode (:903-911)
STATUS_LABELS = {
    -3: "Migrado",
    -2: "Coletado",
    -1: "Rascunho",
    0: "LILACS-Express",
    1: "Publicado",
    2: "Recusado",
    3: "Apagado",
}


def status_label(status: Column) -> Column:
    decode = F.create_map(
        *[F.lit(x) for kv in STATUS_LABELS.items() for x in kv]
    )
    return F.element_at(decode, status)


# --------------------------------------------------------------------------
# F17: date slicing (:942,:949,:973,:982)
def da(publication_date_normalized: Column) -> Column:
    return F.when(
        nz(publication_date_normalized), F.substring(publication_date_normalized, 1, 6)
    )


def entry_date(created_time: Column, transfer_date_to_database: Column) -> Column:
    """created_time (fallback transfer_date) [:10] with '-' removed."""
    src = F.coalesce(created_time, transfer_date_to_database, F.lit(""))
    return F.regexp_replace(F.substring(src, 1, 10), "-", "")


def update_date(updated_time: Column) -> Column:
    return F.regexp_replace(F.substring(_s(updated_time), 1, 10), "-", "")


# --------------------------------------------------------------------------
# F14: SUS-digital theme extraction (:731-753, applied :881-894)
def _susdigital_theme(item: Column) -> Column:
    """pt/pt-br occurrence of the '|'-split, segment after last '/'.
    'pt' substring-matches (the reference checks 'pt' in occurrence, so
    any segment containing 'pt' qualifies — including 'pt-br')."""
    occurrences = F.split(item, r"\|")
    # F.get, not [0]: ANSI mode (Spark 4 default) raises on an
    # out-of-bounds index, and the no-pt-occurrence case is legitimate
    pt_version = F.get(
        F.array_compact(
            F.transform(
                occurrences,
                lambda o: F.when(
                    (F.instr(o, "pt-br") > 0) | (F.instr(o, "pt") > 0), F.trim(o)
                ),
            )
        ),
        0,
    )
    return F.when(
        pt_version.isNotNull(),
        F.trim(F.element_at(F.split(pt_version, "/"), -1)),
    )


def susdigital_themes(paths: Column, marker: str) -> Column:
    """array<string> of themes from path items containing the marker
    ('Programas' or 'Alvo')."""
    safe = F.coalesce(paths, F.array().cast("array<string>"))
    return F.array_compact(
        F.transform(
            F.filter(safe, lambda i: F.instr(i, marker) > 0), _susdigital_theme
        )
    )


# --------------------------------------------------------------------------
# misc projections of the main transform (:913-996)
def descritores_locais(local: Column) -> Column:
    """splitlines on the string form (:898-899); already-array passes
    through upstream normalization (F21)."""
    return F.when(nz(local), F.split(local, r"\r\n|\r|\n"))


def th_le(leaders: Column) -> Column:
    return F.transform(
        F.filter(F.coalesce(leaders, F.array().cast("array<struct<text:string>>")),
                 lambda x: x["text"].isNotNull()),
        lambda x: x["text"],
    )


def ec_flag(clinical_trial_registry_name: Column) -> Column:
    return F.when(nz(clinical_trial_registry_name), F.lit(1))


def no_indexing(descriptors_primary: Column, descriptors_secondary: Column) -> Column:
    empty_p = descriptors_primary.isNull() | (F.size(descriptors_primary) == 0)
    empty_s = descriptors_secondary.isNull() | (F.size(descriptors_secondary) == 0)
    return F.when(empty_p & empty_s, F.lit(1))


def vi(volume_monographic: Column, volume_serial: Column) -> Column:
    return F.filter(F.array(volume_monographic, volume_serial), nz)


def book_title(
    title_monographic: Column, literature_type: Column, treatment_level: Column
) -> Column:
    """:925-939 — first monographic title text, unless lit type T/N with
    a non-'a' treatment level."""
    blocked = F.upper(_s(literature_type)).isin("T", "N") & ~F.lower(
        _s(treatment_level)
    ).startswith("a")
    return F.when(
        title_monographic.isNotNull() & (F.size(title_monographic) > 0) & ~blocked,
        title_monographic[0]["text"],
    )


def ai_corporate(corporate_author: Column, corporate_author_monographic: Column) -> Column:
    """:918 — corporate text values from both fields, in order (nulls kept
    out; the reference emits None entries which the null-prune later
    removes only if the whole list is empty — we drop null texts)."""
    def texts(c: Column) -> Column:
        return F.coalesce(
            F.transform(c, lambda x: x["text"]), F.array().cast("array<string>")
        )

    return F.concat(texts(corporate_author), texts(corporate_author_monographic))
