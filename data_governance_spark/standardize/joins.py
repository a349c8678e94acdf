"""Dimension-lookup joins of the standardize stage (SURVEY §2.3).

The reference loads each dimension into a task-memory dict and probes
it record-at-a-time (misc.py:38-209); here each becomes a broadcast
hash join — same semantics, executor-parallel, no driver collect.
All dim preps normalize join keys with lower(trim) (+ diacritics strip
where the reference does).

Order preservation: the reference emits derived arrays in author/tag
file order with first-occurrence dedup; joins go through
posexplode + sort_array(collect_list(struct(pos, ...))) so the
reassembled arrays match, and dedup is an ordered fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_governance_spark.standardize.fields import nz
from data_governance_spark.standardize.udfs import strip_diacritics_udf


def _key(c: Column) -> Column:
    return F.lower(F.trim(c))


def _memo(key, build):
    """Per-SparkContext memo for STATIC Column trees (pure functions of
    column NAMES — no caller state). Building these trees is driver-side
    py4j chatter (~0.5 ms/round-trip × hundreds of calls for the big
    author/DECS lambdas — guide §5: driver work is serial wall-clock),
    paid per helper call without this. Unresolved Columns are immutable
    and plan-independent, so reuse across DataFrames is safe — the same
    pattern as transform.py's wide-select cache (r5). Within one bench
    process the suite shares these: q25/q26/q29 warm the trees q36's
    composed chain then reuses."""
    from data_governance_spark.standardize.citation import per_context_cache

    cache = per_context_cache()
    if key not in cache:
        cache[key] = build()
    return cache[key]


# --------------------------------------------------------------------------
# tabpais (J1/J2 build side, misc.py:68-84): one probe row per name or
# synonym, carrying the full language struct.
def tabpais_lookup(tabpais: DataFrame) -> DataFrame:
    """Input schema (FIXTURES §2.1): pt,en,es,fr,pais_2:string,
    sinonimo:array<string>. Output: (ck, en, es, pt, fr, pais_2,
    sinonimo) keyed by every lower-trimmed name/synonym."""
    keys = _memo(
        ("j", "tabpais_keys"),
        lambda: F.array_distinct(
            F.filter(
                F.concat(
                    F.array(
                        *[_key(F.col(c)) for c in ("pt", "en", "es", "fr", "pais_2")]
                    ),
                    F.transform(
                        F.coalesce(
                            F.col("sinonimo"), F.array().cast("array<string>")
                        ),
                        _key,
                    ),
                ),
                nz,
            )
        ),
    )
    return tabpais.select(
        F.explode(keys).alias("ck"),
        "pt", "en", "es", "fr", "pais_2", "sinonimo",
    )


def _encode_pais(prefix_cols) -> Column:
    """'^i{en}^e{es}^p{pt}^f{fr}' — missing langs stringify as 'None',
    matching the reference's f-string over dict.get()
    (02_create_iahx_xml_collection.py:543,589)."""
    en, es, pt, fr = prefix_cols
    none = F.lit("None")
    return F.concat(
        F.lit("^i"), F.coalesce(en, none),
        F.lit("^e"), F.coalesce(es, none),
        F.lit("^p"), F.coalesce(pt, none),
        F.lit("^f"), F.coalesce(fr, none),
    )


def add_country_fields(
    df: DataFrame,
    tabpais: DataFrame,
    title_current: DataFrame | None = None,
    country_col: str = "publication_country",
) -> DataFrame:
    """J1 + J5: cp (all names+synonyms of the matched country) and
    pais_publicacao ('^i..^e..^p..^f..'), with the journal-country
    fallback when publication_country is missing (:826-838).

    Divergences (documented, SURVEY §7.4): the reference's cp is a
    Python set() -> nondeterministic order (we sort); its fallback has
    a stale-variable bug carrying the previous record's country when
    both sources miss (we don't)."""
    src = F.col(country_col)
    if title_current is not None:
        fallback = title_current.select(
            _key(F.col("shortened_title")).alias("_tck"),
            F.col("country").alias("_tc_country"),
        ).filter(nz(F.col("_tck"))).dropDuplicates(["_tck"])
        df = df.join(
            F.broadcast(fallback),
            _key(F.coalesce(F.col("title_serial"), F.lit(""))) == F.col("_tck"),
            "left",
        )
        # F.get, not [0]: ANSI mode (Spark 4 default) raises on index 0 of
        # an empty country array; the reference guards with `if countries`
        src = F.coalesce(src, F.get(F.col("_tc_country"), 0))
    lk = tabpais_lookup(tabpais).select(
        F.col("ck").alias("_pck"),
        F.col("en").alias("_p_en"), F.col("es").alias("_p_es"),
        F.col("pt").alias("_p_pt"), F.col("fr").alias("_p_fr"),
        F.col("pais_2").alias("_p_p2"), F.col("sinonimo").alias("_p_sin"),
    ).dropDuplicates(["_pck"])
    df = df.join(F.broadcast(lk), _key(F.coalesce(src, F.lit(""))) == F.col("_pck"), "left")

    def _country_trees():
        cp = F.array_sort(
            F.array_distinct(
                F.filter(
                    F.concat(
                        F.array(
                            F.col("_p_pt"), F.col("_p_en"), F.col("_p_es"),
                            F.col("_p_fr"), F.col("_p_p2"),
                        ),
                        F.coalesce(F.col("_p_sin"), F.array().cast("array<string>")),
                    ),
                    nz,
                )
            )
        )
        matched = F.col("_p_en").isNotNull() | F.col("_p_es").isNotNull() | F.col(
            "_p_pt"
        ).isNotNull() | F.col("_p_fr").isNotNull()
        pais = F.when(
            matched,
            _encode_pais(
                (F.col("_p_en"), F.col("_p_es"), F.col("_p_pt"), F.col("_p_fr"))
            ),
        )
        return F.when(matched, cp), pais

    cp_tree, pais_tree = _memo(("j", "country_trees"), _country_trees)
    # one select instead of withColumn+withColumn+drop: each DataFrame
    # op re-analyzes the whole deepening plan (guide §5 driver wall)
    drop = {"_pck", "_p_en", "_p_es", "_p_pt", "_p_fr", "_p_p2", "_p_sin"}
    if title_current is not None:
        drop |= {"_tck", "_tc_country"}
    return df.select(
        *[c for c in df.columns if c not in drop],
        cp_tree.alias("cp"),
        pais_tree.alias("pais_publicacao"),
    )


# --------------------------------------------------------------------------
# J2: individual/corporate author processing (:469-553) — explode,
# broadcast country join, ordered reassembly.
AUTHOR_OUT_FIELDS = (
    "au", "afiliacao_autor", "af", "instituicao_pais_afiliacao",
    "pais_afiliacao", "auid", "email",
)


def _ordered_dedup(arr: Column) -> Column:
    """First-occurrence dedup preserving order (Python `not in list`)."""
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            x.isNotNull() & ~F.array_contains(acc, x), F.concat(acc, F.array(x))
        ).otherwise(acc),
    )


def add_author_fields(
    df: DataFrame,
    tabpais: DataFrame,
    id_col: str = "id_pk",
    authors_col: str = "individual_author",
) -> DataFrame:
    """Derive au / afiliacao_autor / af / instituicao_pais_afiliacao /
    pais_afiliacao / auid / email from the (already priority-dispatched,
    :801-814) author list."""
    lk = tabpais_lookup(tabpais).select(
        *_memo(
            ("j", "author_lk_cols"),
            lambda: [
                F.col("ck").alias("_ack"),
                F.col("en").alias("_a_en"), F.col("es").alias("_a_es"),
                F.col("pt").alias("_a_pt"), F.col("fr").alias("_a_fr"),
            ],
        )
    ).dropDuplicates(["_ack"])

    exploded = df.select(
        *_memo(
            ("j", "author_exploded", id_col, authors_col),
            lambda: [
                F.col(id_col).alias("_aid"),
                F.posexplode_outer(F.col(authors_col)).alias("_pos", "_a"),
            ],
        )
    )
    joined = exploded.join(
        F.broadcast(lk),
        _memo(
            ("j", "author_join_key"),
            lambda: _key(F.coalesce(F.col("_a._p"), F.lit(""))) == F.col("_ack"),
        ),
        "left",
    )
    rows = joined.groupBy("_aid").agg(
        _memo(
            ("j", "author_agg"),
            lambda: F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_pos").alias("pos"),
                        F.col("_a").alias("a"),
                        F.col("_a_en").alias("en"), F.col("_a_es").alias("es"),
                        F.col("_a_pt").alias("pt"), F.col("_a_fr").alias("fr"),
                    )
                )
            ).alias("_rows"),
        )
    )

    r = F.col("_rows")
    named = F.filter(r, lambda x: nz(x["a"]["text"]))

    def afil(x: Column) -> Column:
        # name ; inst . inst2 . inst3 . city . country, or 's.af' when
        # no institution (:499-514). The reference lstrip('; ')s the
        # joined string — visible when the NAME itself starts with
        # spaces/semicolons (caught by the randomized differential).
        base = F.concat(
            x["a"]["text"],
            F.when(nz(x["a"]["_1"]), F.concat(F.lit("; "), x["a"]["_1"])).otherwise(F.lit("")),
            F.when(nz(x["a"]["_2"]), F.concat(F.lit(". "), x["a"]["_2"])).otherwise(F.lit("")),
            F.when(nz(x["a"]["_3"]), F.concat(F.lit(". "), x["a"]["_3"])).otherwise(F.lit("")),
            F.when(nz(x["a"]["_c"]), F.concat(F.lit(". "), x["a"]["_c"])).otherwise(F.lit("")),
            F.when(nz(x["a"]["_p"]), F.concat(F.lit(". "), x["a"]["_p"])).otherwise(F.lit("")),
        )
        return F.when(
            nz(x["a"]["_1"]), F.regexp_replace(base, r"^[; ]+", "")
        ).otherwise(F.lit("s.af"))

    # af: per author, institution (deduped) else unconditional 's.af',
    # then _2/_3/_c deduped (:517-531)
    def af_fold(acc: Column, x: Column) -> Column:
        def add_dedup(a: Column, v: Column) -> Column:
            return F.when(
                nz(v) & ~F.array_contains(a, v), F.concat(a, F.array(v))
            ).otherwise(a)

        step1 = F.when(
            nz(x["a"]["_1"]), add_dedup(acc, x["a"]["_1"])
        ).otherwise(F.concat(acc, F.array(F.lit("s.af"))))
        step2 = add_dedup(step1, x["a"]["_2"])
        step3 = add_dedup(step2, x["a"]["_3"])
        return add_dedup(step3, x["a"]["_c"])

    auid_of = lambda x: F.when(x["a"]["_k"].isNotNull(), x["a"]["_k"]).otherwise(x["a"]["_w"])  # noqa: E731
    enc = lambda x: _encode_pais((x["en"], x["es"], x["pt"], x["fr"]))  # noqa: E731
    matched = lambda x: x["en"].isNotNull() | x["es"].isNotNull() | x["pt"].isNotNull() | x["fr"].isNotNull()  # noqa: E731

    out = rows.select(
        "_aid",
        *_memo(
            ("j", "author_out_cols"),
            lambda: [
                F.transform(named, lambda x: x["a"]["text"]).alias("au"),
                F.transform(named, afil).alias("afiliacao_autor"),
                # fold only over real author rows: posexplode_outer emits
                # one synthetic null-author row for docs whose author list
                # is null or empty, and the reference returns af=[] for
                # those (:517-531 iterates the list, so an empty list
                # contributes nothing).
                F.aggregate(
                    F.filter(r, lambda x: x["a"].isNotNull()),
                    F.array().cast("array<string>"),
                    af_fold,
                ).alias("af"),
                _ordered_dedup(
                    F.transform(
                        F.filter(r, lambda x: nz(x["a"]["_1"]) & nz(x["a"]["_p"])),
                        lambda x: F.concat(x["a"]["_1"], F.lit("+"), x["a"]["_p"]),
                    )
                ).alias("instituicao_pais_afiliacao"),
                _ordered_dedup(
                    F.transform(
                        F.filter(r, lambda x: nz(x["a"]["_p"]) & matched(x)), enc
                    )
                ).alias("pais_afiliacao"),
                F.filter(F.transform(r, auid_of), nz).alias("auid"),
                F.filter(F.transform(r, lambda x: x["a"]["_e"]), nz).alias("email"),
            ],
        )
    )
    return df.join(out, F.col(id_col) == F.col("_aid"), "left").drop("_aid")


# --------------------------------------------------------------------------
# J3: DECS thesaurus join (misc.py:87-158; applied :843-879)
def decs_lookup(decs: DataFrame) -> DataFrame:
    """(term, mfn): every descriptor/synonym, diacritics-stripped and
    lowered; mfn zero-stripped (None when all zeros). Later rows win on
    duplicate terms (dict overwrite order) — emulated by max row id."""
    desc_cols = [
        "descritor_ingles", "descritor_portugues", "descritor_espanhol",
        "descritor_frances", "descritor_espanhol_espanha",
        "versao_alternativa_ingles", "versao_alternativa_espanhol",
        "versao_alternativa_portugues",
    ]
    syn_cols = [
        "sinonimos_ingles", "sinonimos_espanhol", "sinonimos_portugues",
        "sinonimos_espanha", "sinonimos_frances",
    ]
    terms = F.concat(
        F.array(*[F.col(c) for c in desc_cols]),
        *[F.coalesce(F.col(c), F.array().cast("array<string>")) for c in syn_cols],
    )
    mfn = F.regexp_replace(F.col("mfn"), "^0+", "")
    with_id = decs.withColumn("_row", F.monotonically_increasing_id())
    exploded = with_id.select(
        F.explode(F.filter(terms, nz)).alias("_term"),
        F.when(mfn != "", mfn).alias("_mfn"),
        "_row",
    ).select(
        strip_diacritics_udf(F.lower(F.trim(F.col("_term")))).alias("term"),
        "_mfn",
        "_row",
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("term").orderBy(F.desc("_row"))
    return (
        exploded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("term", F.col("_mfn").alias("mfn"))
    )


def decs_code_array(
    df: DataFrame,
    decs_lk: DataFrame,
    src_col: Column,
    out_col: str,
    id_col: str = "id_pk",
) -> DataFrame:
    """Single-field J3 — see decs_code_arrays for the batched form."""
    return decs_code_arrays(df, decs_lk, [(src_col, out_col)], id_col=id_col)


def decs_code_arrays(
    df: DataFrame,
    decs_lk: DataFrame,
    specs: list[tuple[Column, str]],
    id_col: str = "id_pk",
) -> DataFrame:
    """get_decs_mfn (misc.py:129-158) over MANY array columns in ONE
    pass: digit-leading keywords pass through as '^d<kw>'; otherwise
    diacritics-stripped lowered term splits on '/' into main +
    qualifier; '^d<main_mfn>' or '^d<main>^s<qual>' (qualifier miss
    nulls the whole entry); main miss drops the entry.

    Batching matters twice over: per-field calls cost one explode + two
    broadcast builds of the lookup + one groupBy shuffle + one join-back
    EACH (standardize has four DECS fields -> 4 shuffles, 8 broadcast
    builds, 4 diacritics-UDF passes); tagging every keyword with its
    field and pushing the union through one pipeline costs exactly one
    of each, at identical per-field semantics. Every doc keeps one
    (possibly null-keyword) row, so each output array is [] — never
    NULL — exactly like the per-field posexplode_outer did."""
    empty = F.array().cast("array<string>")

    def tag_fn(tag: str):
        return lambda x, i: F.struct(
            F.lit(tag).alias("f"), i.alias("p"), x.alias("kw")
        )

    tagged = F.concat(
        *[
            F.transform(F.coalesce(src, empty), tag_fn(out_col))
            for src, out_col in specs
        ]
    )
    exploded = df.select(
        F.col(id_col).alias("_did"), F.explode_outer(tagged).alias("_e")
    ).select(
        "_did",
        F.col("_e.f").alias("_fld"),
        F.col("_e.p").alias("_pos"),
        F.col("_e.kw").alias("_kw"),
    )
    kw = F.col("_kw")

    def _decs_keys():
        clean = strip_diacritics_udf(F.lower(F.trim(kw)))
        main_key = F.split(clean, "/")[0]
        qual_key = F.when(
            F.size(F.split(clean, "/")) > 1,
            F.concat(F.lit("/"), F.split(clean, "/")[1]),
        )
        return main_key.alias("_main_key"), qual_key.alias("_qual_key")

    e = exploded.select(
        "_did", "_fld", "_pos", "_kw", *_memo(("j", "decs_keys"), _decs_keys)
    )
    main_lk = decs_lk.select(
        F.col("term").alias("_main_key"), F.col("mfn").alias("_main_mfn")
    )
    qual_lk = decs_lk.select(
        F.col("term").alias("_qual_key"), F.col("mfn").alias("_qual_mfn")
    )
    e = e.join(F.broadcast(main_lk), "_main_key", "left").join(
        F.broadcast(qual_lk), "_qual_key", "left"
    )
    # RAW first char, not trimmed: the reference tests keyword[0] — a
    # ' 12x' keyword goes down the term path, not the passthrough.
    # Documented divergence (ADVICE r4): [0-9] is ASCII-only, while the
    # reference's str.isdigit() is also True for non-ASCII Unicode digits
    # (e.g. Arabic-Indic '١٢'), which there take the ^d passthrough. Such
    # keywords do not occur in the corpus; ASCII is kept so the check
    # stays a codegen'd rlike instead of a per-row Python UDF.
    def _decs_formatted():
        digit_lead = F.substring(kw, 1, 1).rlike("[0-9]")
        return F.when(
            ~nz(kw), F.lit(None).cast("string")
        ).when(digit_lead, F.concat(F.lit("^d"), kw)).when(
            F.col("_main_mfn").isNotNull() & F.col("_qual_key").isNull(),
            F.concat(F.lit("^d"), F.col("_main_mfn")),
        ).when(
            F.col("_main_mfn").isNotNull() & F.col("_qual_mfn").isNotNull(),
            F.concat(
                F.lit("^d"), F.col("_main_mfn"), F.lit("^s"), F.col("_qual_mfn")
            ),
        )

    formatted = _memo(("j", "decs_formatted"), _decs_formatted)

    def field_agg(out_col: str) -> Column:
        # collect_list skips nulls, so the when() routes each keyword
        # to its own field's aggregate only
        return _memo(
            ("j", "decs_field_agg", out_col),
            lambda: F.filter(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_fld") == out_col,
                                F.struct(
                                    F.col("_pos").alias("pos"),
                                    F.col("_fmt").alias("v"),
                                ),
                            )
                        )
                    ),
                    lambda x: x["v"],
                ),
                lambda v: v.isNotNull(),
            ).alias(out_col),
        )

    agg = (
        e.withColumn("_fmt", formatted)
        .groupBy("_did")
        .agg(*[field_agg(out_col) for _, out_col in specs])
    )
    return df.join(agg, F.col(id_col) == F.col("_did"), "left").drop("_did")


# --------------------------------------------------------------------------
# J4: journal-title lookup (misc.py:4-53; probe :594-605)
def title_values_expr() -> Column:
    """_get_title_values (misc.py:4-30): '^'-prefix-stripped title,
    shortened, medline, parallel lists, other titles — in order."""
    def _build() -> Column:
        head = lambda c: F.split(c, r"\^")[0]  # noqa: E731
        singles = F.filter(
            F.array(
                F.when(nz(F.col("title")), head(F.col("title"))),
                F.when(nz(F.col("shortened_title")), head(F.col("shortened_title"))),
                F.when(
                    nz(F.col("medline_shortened_title")),
                    head(F.col("medline_shortened_title")),
                ),
            ),
            lambda x: x.isNotNull(),
        )
        lists = F.concat(
            *[
                F.transform(
                    F.coalesce(F.col(c), F.array().cast("array<string>")), head
                )
                for c in ("parallel_titles", "shortened_parallel_titles", "other_titles")
            ]
        )
        return F.concat(singles, lists)

    return _memo(("j", "title_values"), _build)


def add_ta_var(
    df: DataFrame, title_current: DataFrame, id_col: str = "id_pk"
) -> DataFrame:
    """ta_var: ISSN lookup, falling back to lower(shortened_title)
    (:594-605) — two broadcast left joins + coalesce."""
    base = title_current.withColumn("_tv", title_values_expr())
    by_issn = (
        base.filter(nz(F.col("issn")))
        .select(_key(F.col("issn")).alias("_ik"), F.col("_tv").alias("_tv_issn"))
        .dropDuplicates(["_ik"])
    )
    by_st = (
        base.filter(nz(F.col("shortened_title")))
        .select(
            _key(F.col("shortened_title")).alias("_sk"),
            F.col("_tv").alias("_tv_st"),
        )
        .dropDuplicates(["_sk"])
    )
    joined = df.join(
        F.broadcast(by_issn),
        _key(F.coalesce(F.col("issn"), F.lit(""))) == F.col("_ik"),
        "left",
    ).join(
        F.broadcast(by_st),
        _key(F.coalesce(F.col("shortened_title"), F.lit(""))) == F.col("_sk"),
        "left",
    )
    # one select instead of withColumn+drop (guide §5: fewer analysis
    # passes over the deepening plan)
    return joined.select(
        *df.columns,
        F.coalesce(F.col("_tv_issn"), F.col("_tv_st")).alias("ta_var"),
    )
