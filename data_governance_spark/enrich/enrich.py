"""Enrichment joins J6-J8 + U1/U2 (SURVEY §2.3/§2.6).

The reference enriches 03_xml_enriched in-place with MongoDB
`$setUnion` update pipelines, batched by skip/limit offsets
(03_xml_enriched.py:210-500). Here each enrichment is a broadcast (J6/
J7) or shuffle (J8) join + grouped set-aggregation + one array-union
merge back into the fact table — no read-modify-write cycles, no
manual pagination; re-running converges exactly like the reference's
$setUnion (idempotency tested).

Dynamically-named fields (`collection_<x>`, `tag_<x>`, contexto keys)
land in one ``dyn: map<string, array<string>>`` column (SURVEY §7.1);
sinks flatten the map into real fields.

Determinism divergence (documented): Mongo's $setUnion and Python
set() orders are unspecified; every merged array here is
sorted-distinct.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_governance_spark.standardize.fields import nz
from data_governance_spark.standardize.udfs import strip_diacritics_udf

EMPTY_ARR = "array<string>"
DYN_TYPE = "map<string,array<string>>"


# --------------------------------------------------------------------------
# U1: union with provenance (:102-148)
def union_with_provenance(dfs: dict[str, DataFrame]) -> DataFrame:
    """unionByName(allowMissingColumns) of named inputs with a _source
    column — the TEMAS_BVS2 union view. _source_pos records the
    view-definition position so "first row" consumers (enrich_temas)
    can order by it instead of by lexicographic source name."""
    tagged = [
        df.withColumn("_source", F.lit(name)).withColumn("_source_pos", F.lit(i))
        for i, (name, df) in enumerate(dfs.items())
    ]
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), tagged)


# --------------------------------------------------------------------------
# U2: idempotent set-union merge
def set_union(existing: Column, new: Column) -> Column:
    """$setUnion([$ifNull([$f,[]]), new]) -> sorted-distinct union."""
    return F.array_sort(
        F.array_union(
            F.coalesce(existing, F.array().cast(EMPTY_ARR)),
            F.coalesce(new, F.array().cast(EMPTY_ARR)),
        )
    )


def merge_dyn(existing: Column, new: Column) -> Column:
    """Map-wise set_union of two map<string,array<string>> columns."""
    e = F.coalesce(existing, F.create_map().cast(DYN_TYPE))
    n = F.coalesce(new, F.create_map().cast(DYN_TYPE))
    keys = F.array_distinct(F.concat(F.map_keys(e), F.map_keys(n)))
    return F.map_from_arrays(
        keys,
        F.transform(keys, lambda k: set_union(F.element_at(e, k), F.element_at(n, k))),
    )


def _ensure_dyn(df: DataFrame) -> DataFrame:
    if "dyn" not in df.columns:
        df = df.withColumn("dyn", F.create_map().cast(DYN_TYPE))
    return df


def _apply(df: DataFrame, agg: DataFrame, id_col: str, merge_db: bool = False) -> DataFrame:
    """Left-join the aggregated enrichment and fold it into
    instance/dyn (and db when merge_db)."""
    df = _ensure_dyn(df)
    out = df.join(agg, F.col(id_col) == F.col("_eid"), "left")
    # one select instead of 2-3 withColumns + drop: each DataFrame op
    # re-analyzes the whole deepening plan (guide §5 driver wall); the
    # fold expressions and output column order are unchanged
    existing_inst = (
        F.col("instance") if "instance" in df.columns else F.lit(None).cast(EMPTY_ARR)
    )
    inst_expr = (
        F.when(
            F.col("_instances").isNotNull() & (F.size("_instances") > 0),
            set_union(existing_inst, F.col("_instances")),
        )
        .otherwise(existing_inst)
        .alias("instance")
    )
    db_expr = (
        F.when(
            F.col("_dbs").isNotNull() & (F.size("_dbs") > 0),
            set_union(F.col("db"), F.col("_dbs")),
        )
        .otherwise(F.col("db"))
        .alias("db")
    )
    dyn_expr = (
        F.when(
            F.col("_dyn").isNotNull(), merge_dyn(F.col("dyn"), F.col("_dyn"))
        )
        .otherwise(F.col("dyn"))
        .alias("dyn")
    )
    cols = []
    for c in df.columns:
        if c == "instance":
            cols.append(inst_expr)
        elif c == "db" and merge_db:
            cols.append(db_expr)
        elif c == "dyn":
            cols.append(dyn_expr)
        else:
            cols.append(F.col(c))
    if "instance" not in df.columns:
        cols.append(inst_expr)
    return out.select(*cols)


def _string_or_list(c: Column) -> Column:
    """Dims carry string-or-list fields (FIXTURES §2.6/2.7); normalized
    upstream to array — this guards scalar inputs at the expression
    level when a raw dim sneaks through."""
    return c  # schema normalization happens in the dim loaders


# --------------------------------------------------------------------------
# J6: instanceEcollection enrichment (:210-280)
def enrich_instance_ecollection(
    df: DataFrame, dim: DataFrame, id_col: str = "id"
) -> DataFrame:
    """explode(db) ⋈ dim on exact db key; merge dim instances into
    `instance`, and for each collection_instance value ci, add the
    matching db names under dyn[ci]."""
    exploded = df.select(
        F.col(id_col).alias("_eid"), F.explode_outer("db").alias("_db")
    )
    d = dim.select(
        F.col("db").alias("_db"),
        F.col("instance").alias("_di"),
        F.col("collection_instance").alias("_dci"),
    )
    j = exploded.join(F.broadcast(d), "_db")
    pairs = (
        j.select(
            "_eid", "_db", F.explode_outer(F.filter(F.col("_dci"), nz)).alias("_ci")
        )
        .filter(F.col("_ci").isNotNull())
        .groupBy("_eid", "_ci")
        .agg(F.array_sort(F.collect_set("_db")).alias("_dbs_for_ci"))
        .groupBy("_eid")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("_ci", "_dbs_for_ci")))
            ).alias("_dyn")
        )
    )
    inst = j.groupBy("_eid").agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(F.coalesce("_di", F.array().cast(EMPTY_ARR)))))
        ).alias("_instances")
    )
    agg = inst.join(pairs, "_eid", "left")
    return _apply(df, agg, id_col)


# --------------------------------------------------------------------------
# J7: DBinstanceEcollection enrichment (:283-382)
def enrich_db_instance_ecollection(
    df: DataFrame, dim: DataFrame, id_col: str = "id"
) -> DataFrame:
    """explode(database) with NFKD-stripped lower(trim) key ⋈ dim;
    merge dim.db into `db`, instances into `instance`, and split each
    collection_instance 'key:value' into dyn[key] += value."""
    exploded = df.select(
        F.col(id_col).alias("_eid"), F.explode_outer("database").alias("_raw")
    ).withColumn("_key", strip_diacritics_udf(F.lower(F.trim(F.col("_raw")))))
    d = dim.select(
        F.lower(F.trim(F.col("database_campo4"))).alias("_key"),
        F.col("db").alias("_dd"),
        F.col("instance").alias("_di"),
        F.col("collection_instance").alias("_dci"),
    )
    j = exploded.join(F.broadcast(d), "_key")
    pairs = (
        j.select("_eid", F.explode_outer(F.filter(F.col("_dci"), nz)).alias("_ci"))
        .filter(F.col("_ci").contains(":"))
        .select(
            "_eid",
            F.split(F.col("_ci"), ":")[0].alias("_k"),
            F.split(F.col("_ci"), ":")[1].alias("_v"),
        )
        .groupBy("_eid", "_k")
        .agg(F.array_sort(F.collect_set("_v")).alias("_vals"))
        .groupBy("_eid")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("_k", "_vals")))
            ).alias("_dyn")
        )
    )
    base = j.groupBy("_eid").agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(F.coalesce("_di", F.array().cast(EMPTY_ARR)))))
        ).alias("_instances"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(F.coalesce("_dd", F.array().cast(EMPTY_ARR)))))
        ).alias("_dbs"),
    )
    agg = base.join(pairs, "_eid", "left")
    return _apply(df, agg, id_col, merge_db=True)


# --------------------------------------------------------------------------
# J8: thematic enrichment (:385-500)
def _pairwise_entries(arr: Column) -> Column:
    """F20: [k1,v1,k2,v2,...] -> array<struct<k,v>>; odd length pads the
    last value with NULL (:429-447)."""
    idx = F.sequence(F.lit(0), F.greatest(F.ceil(F.size(arr) / 2) - 1, F.lit(0)))
    return F.when(
        F.size(arr) > 0,
        F.transform(
            idx,
            lambda i: F.struct(
                F.try_element_at(arr, (i * 2 + 1).cast("int")).alias("k"),
                F.try_element_at(arr, (i * 2 + 2).cast("int")).alias("v"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<k:string,v:string>>"))


def enrich_temas(
    df: DataFrame, temas_union: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Fact ⋈ TEMAS union view on id (J8):
    - instance_iahx values -> `instance`
    - each collection_iahx name c -> dyn[c] += first matching row's db
      (the reference keeps only the FIRST temas row's db payload per
      doc, :424-428). "First" in the reference is Mongo cursor order
      over the union view — collections in view-definition order, then
      insertion order. Spark has no stable intra-file row order, so we
      take the first row under the deterministic ordering
      (_source, db): union-view position is respected exactly, and
      within one source collection the smallest db wins (a documented
      determinism divergence; per-doc multi-row-same-source cases are
      rare and the reference's own order there is load-dependent).
    - tema_subtema+tema and projeto parsed pairwise -> dyn[k] += v
    """
    if "_source_pos" in temas_union.columns:
        src = F.col("_source_pos").cast("long")
    elif "_source" in temas_union.columns:
        src = F.xxhash64("_source")  # stable but arbitrary source order
    else:
        src = F.lit(0).cast("long")
    t = temas_union.select(
        F.col("id_iahx").alias("_eid"),
        src.alias("_tsrc"),
        F.coalesce("instance_iahx", F.array().cast(EMPTY_ARR)).alias("_ti"),
        F.coalesce("collection_iahx", F.array().cast(EMPTY_ARR)).alias("_tc"),
        F.concat(
            F.coalesce("tema_subtema", F.array().cast(EMPTY_ARR)),
            F.coalesce("tema", F.array().cast(EMPTY_ARR)),
        ).alias("_tags"),
        F.coalesce("projeto", F.array().cast(EMPTY_ARR)).alias("_ctx"),
        F.coalesce(F.col("db"), F.lit("")).alias("_tdb"),
    )
    inst = t.groupBy("_eid").agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_ti")))).alias(
            "_instances"
        ),
        # first row under (_source_pos, db): union-view position first,
        # db as the deterministic tie-break within one source collection
        F.min(F.struct(F.col("_tsrc"), F.col("_tdb")))["_tdb"].alias("_first_db"),
    )
    coll_entries = (
        t.select("_eid", F.explode("_tc").alias("_c"))
        .distinct()
        .join(inst.select("_eid", "_first_db"), "_eid")
        .groupBy("_eid", "_c")
        .agg(F.array_sort(F.collect_set("_first_db")).alias("_vals"))
        .select("_eid", F.struct(F.col("_c").alias("_k"), F.col("_vals")).alias("_e"))
    )
    tag_entries = (
        t.select(
            "_eid",
            F.explode(
                F.concat(_pairwise_entries(F.col("_tags")), _pairwise_entries(F.col("_ctx")))
            ).alias("_kv"),
        )
        .filter(F.col("_kv.k").isNotNull())
        .groupBy("_eid", F.col("_kv.k").alias("_k"))
        # collect_list/set drop NULLs, but the reference's odd-length
        # padding emits None values that survive $setUnion — wrap in a
        # struct to carry them through the aggregation
        .agg(
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        F.collect_list(F.struct(F.col("_kv.v").alias("v"))),
                        lambda s: s["v"],
                    )
                )
            ).alias("_vals")
        )
        .select("_eid", F.struct("_k", "_vals").alias("_e"))
    )
    dyn = (
        coll_entries.unionByName(tag_entries)
        .groupBy("_eid", F.col("_e._k").alias("_k"))
        .agg(F.array_sort(F.array_distinct(F.flatten(F.collect_list(F.col("_e._vals"))))).alias("_vals"))
        .groupBy("_eid")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("_k", "_vals")))
            ).alias("_dyn")
        )
    )
    agg = inst.select("_eid", "_instances").join(dyn, "_eid", "left")
    return _apply(df, agg, id_col)
