"""Parameterized metric runner — the Spark-first collapse of the
reference's BASE_PIPELINE clones.

The reference computes every metric as a MongoDB pipeline of the shape
(SURVEY §2.4, e.g. dags/tmgl_regions/dag_02_languages.py:11-48):

    $match(entity exists) -> $unwind(entity)
    -> $addFields(year := toInt(regexFind('\\d{4}', dp) ?? 0))
    -> $match(year >= 1500) -> $group((entity, year), count)

…cloned across ~10 files x 2 packages, then re-run once per WHO region
(dag_02_languages.py:93-142) and once per country
(tmgl_countries/dag_02_indicators.py:53-93) — an N+1 server-side query
loop. Here the whole family is one spec-driven job: the slice (region
or country) is a column attached once via a broadcast join against the
who_region dimension (J10), and per-slice + global rows come from ONE
scan via grouping sets — global rows carry slice=NULL exactly like the
reference's region=None metric documents.

Scale: single scan of the fact table per metric batch, broadcast dims,
partial-agg-friendly hash aggregates, no per-slice jobs, ever.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# attach_slice inlines the (country -> regions) dim as a literal map when
# it has at most this many countries; beyond that it joins (see fallback).
_INLINE_DIM_MAX = 500


def year_from_freetext(dp: Column | str) -> Column:
    """F1: first 4-digit run in the free-text date, else 0
    (dags/tmgl_regions/dag_02_languages.py:13-38)."""
    c = F.col(dp) if isinstance(dp, str) else dp
    extracted = F.regexp_extract(c, r"(\d{4})", 1)
    return F.coalesce(
        F.when(extracted != "", extracted).cast("int"), F.lit(0)
    )


@dataclass(frozen=True)
class MetricSpec:
    """One metric family (one reference dag_02_* file).

    name          -> the 'type' key of the metrics table
    entity_col    -> column holding the entity (array -> exploded)
    entity_expr   -> optional fn(Column) -> Column applied post-explode
                     (lowercasing A1, regex capture A5/A6/A10, …);
                     returning NULL drops the row (regex miss)
    prefilter     -> optional fn(DataFrame) -> DataFrame (A2 article-only)
    recode        -> optional {value: label} map (A3/A4 $switch tables);
                     unmatched values PASS THROUGH unchanged, matching
                     the reference's "default": "$type" branches
                     (dag_02_doc_type.py:28, dag_02_study_type.py:44)
    min_year      -> P6 value-range filter (reference: 1500)
    """

    name: str
    entity_col: str
    entity_expr: object | None = None
    prefilter: object | None = None
    recode: dict[str, str] | None = None
    min_year: int = 1500


def attach_slice(
    facts: DataFrame,
    countries_col: str,
    dim: DataFrame,
    dim_country_col: str = "country_key",
    dim_slice_col: str = "who_region",
    slice_col: str = "region",
) -> DataFrame:
    """Attach the slice dimension (J10 region->countries) as a column.

    A fact row belongs to a region if ANY of its countries is in the
    region — and is counted ONCE per region even when several of its
    countries belong to it (the reference's per-region $match is a
    filter, not a fan-out).

    The dim is a true dimension (a few hundred (country, region) rows —
    the reference loads it into task memory as a dict, tmgl_regions/
    misc.py:4-24), so it is collected once and embedded as a literal
    country->regions map: the fan-out becomes a row-local array lookup
    + explode with ZERO shuffles and no synthetic row key. (An earlier
    version joined back on monotonically_increasing_id, which is
    nondeterministic under recompute — AQE/task retries could re-id
    rows and mis-assign slices.) Dims too large to inline fall back to
    an explode/join/collect_set plan over a localCheckpoint snapshot
    whose row ids are frozen by lineage truncation.
    """
    empty = F.array().cast("array<string>")
    dim_pairs = (
        dim.select(
            F.lower(F.trim(F.col(dim_country_col))).alias("ck"),
            F.col(dim_slice_col).cast("string").alias("s"),
        )
        .distinct()
        .groupBy("ck")
        .agg(F.sort_array(F.collect_set("s")).alias("ss"))
    )
    # one scan: take(N+1) and branch on length (ADVICE r2). 500-entry cap
    # keeps the inlined literal map small enough that Catalyst analysis
    # stays cheap — a bigger dim goes through the join fallback below.
    taken = dim_pairs.take(_INLINE_DIM_MAX + 1)
    rows = taken if len(taken) <= _INLINE_DIM_MAX else None
    if rows is not None:
        if rows:
            lookup = F.create_map(
                *[x for r in rows for x in (F.lit(r["ck"]), F.lit(r["ss"]))]
            )
        else:
            lookup = F.lit(None).cast("map<string,array<string>>")
        regions = F.array_distinct(
            F.flatten(
                F.transform(
                    F.coalesce(F.col(countries_col), empty),
                    lambda c: F.coalesce(
                        F.element_at(lookup, F.lower(F.trim(c))), empty
                    ),
                )
            )
        )
        # explode_outer(0-region row) -> one slice=NULL row, preserving
        # the fact exactly like the join path did
        return facts.withColumn(slice_col, F.explode_outer(regions))

    # fallback: dim too big to inline. monotonically_increasing_id is
    # nondeterministic under recompute, so freeze it with an eager
    # localCheckpoint: lineage is truncated, AQE/task retries replay the
    # materialized blocks and can never re-derive (and re-number) the
    # ids. Blocks are reclaimed by the ContextCleaner when the plan is
    # GC'd — no session-long persist leak (ADVICE r2). Caveats (ADVICE
    # r3): eager = a Spark job fires at plan-construction time even if
    # the result is never executed, and checkpoint blocks are
    # non-replicated — losing an executor FAILS the job instead of
    # recomputing (eager=False would NOT be safe: lazy checkpoint can
    # re-run the id assignment). If executor loss under dynamic
    # allocation matters, use reliable checkpoint storage instead.
    marked = facts.withColumn("_rid", F.monotonically_increasing_id()).localCheckpoint()
    exploded = marked.select(
        "_rid", F.explode_outer(F.col(countries_col)).alias("_country")
    )
    dim_small = dim.select(
        F.lower(F.trim(F.col(dim_country_col))).alias("_ck"),
        # cast to string like the inline path, so both emit one schema
        F.col(dim_slice_col).cast("string").alias(slice_col),
    ).distinct()
    regions = (
        exploded.join(
            F.broadcast(dim_small),
            F.lower(F.trim(F.col("_country"))) == F.col("_ck"),
            "left",
        )
        .groupBy("_rid")
        .agg(F.collect_set(slice_col).alias("_regions"))
    )
    return (
        marked.join(regions, "_rid")
        .withColumn(slice_col, F.explode_outer("_regions"))
        .drop("_rid", "_regions")
    )


def run_metric(
    facts: DataFrame,
    spec: MetricSpec,
    date_col: str = "dp",
    slice_col: str | None = None,
) -> DataFrame:
    """Compute one metric family -> (type, <slice>, name, year, count).

    This is the reference's metrics-collection schema (keyed upserts,
    dag_02_languages.py:72-90,124-138). When ``slice_col`` is set the
    facts must already carry it (see attach_slice) and only non-null
    slice rows are returned; global (slice=None) rows come from a
    separate pass over the un-fanned facts (run_metric_sliced) so a
    document in two regions is still counted once globally — matching
    the reference, where the global pipeline never sees the region
    fan-out.
    """
    df = facts
    if spec.prefilter is not None:
        df = spec.prefilter(df)
    df = df.withColumn("year", year_from_freetext(date_col)).filter(
        F.col("year") >= spec.min_year
    )

    dtype = dict(df.dtypes).get(spec.entity_col)
    if dtype is None:
        raise KeyError(f"{spec.entity_col} not in {df.columns}")
    if dtype.startswith("array"):
        df = df.withColumn("_entity", F.explode(spec.entity_col))
    else:
        df = df.withColumn("_entity", F.col(spec.entity_col))
    ent = F.col("_entity")
    if spec.entity_expr is not None:
        ent = spec.entity_expr(ent)
    if spec.recode is not None:
        decode = F.create_map(*[F.lit(x) for kv in spec.recode.items() for x in kv])
        ent = F.coalesce(F.element_at(decode, ent), ent)
    df = df.withColumn("name", ent).filter(F.col("name").isNotNull())

    out_slice = slice_col or "region"
    if slice_col is not None:
        out = (
            df.filter(F.col(slice_col).isNotNull())
            .groupBy(slice_col, "name", "year")
            .agg(F.count(F.lit(1)).alias("count"))
        )
    else:
        out = (
            df.groupBy("name", "year")
            .agg(F.count(F.lit(1)).alias("count"))
            .withColumn(out_slice, F.lit(None).cast("string"))
        )
    return out.withColumn("type", F.lit(spec.name)).select(
        "type", out_slice, "name", "year", "count"
    )


def run_metric_sliced(
    facts: DataFrame,
    spec: MetricSpec,
    countries_col: str,
    dim: DataFrame,
    date_col: str = "dp",
    slice_col: str = "region",
    **attach_kwargs,
) -> DataFrame:
    """Global + per-region rows for one metric family: one pass over the
    region-fanned facts for slices, one over the raw facts for the
    global (slice=None) rows — 2 scans total vs the reference's N+1
    per-region server queries."""
    fanned = attach_slice(
        facts, countries_col, dim, slice_col=slice_col, **attach_kwargs
    )
    sliced = run_metric(fanned, spec, date_col=date_col, slice_col=slice_col)
    global_rows = run_metric(facts, spec, date_col=date_col)
    if slice_col != "region":
        global_rows = global_rows.withColumnRenamed("region", slice_col)
    return sliced.unionByName(global_rows.select(*sliced.columns))


def run_metrics(facts: DataFrame, specs: list[MetricSpec], **kwargs) -> DataFrame:
    """All metric families into one long metrics table (the reference
    writes each family separately into tmgl_charts.02_metrics)."""
    out = None
    for spec in specs:
        part = run_metric(facts, spec, **kwargs)
        out = part if out is None else out.unionByName(part)
    return out


def run_metrics_single_scan(
    facts: DataFrame, specs: list[MetricSpec], date_col: str = "dp"
) -> DataFrame:
    """All metric families in ONE scan of the fact table — SURVEY §3.2's
    'one multi-metric job via unpivot' upgrade over run_metrics (which
    scans once per family).

    One projection computes a cleaned entity ARRAY per family (scalar
    entities wrapped, entity_expr/recode applied inside a transform,
    nulls dropped), then stack() unpivots (family, entities), explode
    flattens, and a single hash aggregate counts (type, name, year).
    At 100 TB this is the difference between F scans of the corpus and
    1: the unpivot multiplies only the tiny cleaned entity arrays, not
    the scan.

    DataFrame-level prefilters can't fold into a shared projection —
    express them as entity_expr NULLs (rows drop) or use run_metrics.
    Entities are normalized to STRINGS (stack() needs one type across
    families): non-string entity columns must supply an entity_expr
    casting to string, else this raises rather than silently diverging
    from run_metrics' native-typed names.
    """
    import re as _re

    if any(s.prefilter is not None for s in specs):
        raise ValueError("prefilter specs need run_metrics (per-family scan)")
    for s in specs:
        # names are interpolated into the generated stack() SQL
        if not _re.fullmatch(r"[A-Za-z0-9_\- ]+", s.name):
            raise ValueError(f"metric name {s.name!r} unsafe for stack() SQL")
    min_years = {s.min_year for s in specs}
    if len(min_years) != 1:
        raise ValueError("single-scan requires one shared min_year")
    (min_year,) = min_years

    dtypes = dict(facts.dtypes)
    arrays = []
    for i, spec in enumerate(specs):
        if spec.entity_col not in dtypes:
            raise KeyError(f"{spec.entity_col} not in {facts.columns}")
        elem_type = dtypes[spec.entity_col]
        if elem_type.startswith("array<"):
            elem_type = elem_type[len("array<"):-1]
        if spec.entity_expr is None and elem_type != "string":
            raise ValueError(
                f"spec {spec.name!r}: entity column {spec.entity_col!r} is "
                f"{elem_type}; single-scan normalizes names to string — "
                "add an entity_expr casting to string, or use run_metrics"
            )
        base = (
            F.col(spec.entity_col)
            if dtypes[spec.entity_col].startswith("array")
            else F.array(spec.entity_col)
        )

        # single-arg closure: F.transform dispatches on lambda arity, so
        # a second (defaulted) parameter would be fed the element INDEX
        def make_clean(spec: MetricSpec):
            def clean(ent: Column) -> Column:
                if spec.entity_expr is not None:
                    ent = spec.entity_expr(ent)
                if spec.recode is not None:
                    decode = F.create_map(
                        *[F.lit(x) for kv in spec.recode.items() for x in kv]
                    )
                    ent = F.coalesce(F.element_at(decode, ent), ent)
                return ent

            return clean

        arrays.append(
            F.filter(F.transform(base, make_clean(spec)), lambda x: x.isNotNull())
            # normalize element nullability: stack() requires all family
            # columns to have the exact same type incl. containsNull
            .cast("array<string>")
            .alias(f"_m_{i}")
        )

    wide = facts.select(
        year_from_freetext(date_col).alias("year"), *arrays
    ).filter(F.col("year") >= min_year)
    stack_args = ", ".join(f"'{s.name}', _m_{i}" for i, s in enumerate(specs))
    long = wide.select(
        "year",
        F.expr(f"stack({len(specs)}, {stack_args}) AS (type, _entities)"),
    )
    return (
        long.select("type", "year", F.explode("_entities").alias("name"))
        .groupBy("type", "name", "year")
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn("region", F.lit(None).cast("string"))
        .select("type", "region", "name", "year", "count")
    )


def label_join(
    metrics: DataFrame,
    labels: DataFrame,
    code_col: str = "code_xml",
    label_col: str = "label_en",
) -> DataFrame:
    """Post-aggregation label decode (J11 tmgl_areas / J12 DECS MFN):
    broadcast join on the aggregated name, label preferred when found."""
    return (
        metrics.join(F.broadcast(labels), metrics["name"] == labels[code_col], "left")
        .withColumn("name", F.coalesce(F.col(label_col), F.col("name")))
        .drop(code_col, label_col)
    )


def top_k(
    metrics: DataFrame,
    k: int,
    year_min: int | None = None,
    year_max: int | None = None,
    group_cols: tuple[str, ...] = ("type", "region"),
) -> DataFrame:
    """A19/O2: the dashboards' client-side JS (filter year range -> sum
    per entity -> sort desc -> head K) as a window query. Deterministic
    tie-break: total desc, name asc (SURVEY §7.4 item 8)."""
    df = metrics
    if year_min is not None:
        df = df.filter(F.col("year") >= year_min)
    if year_max is not None:
        df = df.filter(F.col("year") <= year_max)
    sums = df.groupBy(*group_cols, "name").agg(F.sum("count").alias("total"))
    w = W.partitionBy(*group_cols).orderBy(F.desc("total"), F.asc("name"))
    return sums.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
