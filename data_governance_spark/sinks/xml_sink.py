"""Solr-XML document sink (S12, reference 04_export_xml.py:82-128).

Per doc: <doc boost=weight> with one repeated <field name=...> per
value, keys emitted in sorted order, list values flattened, null/''/
[]-valued fields pruned (P8 — pruning is a sink concern here, the
stage tables keep fixed schemas), and invalid-XML characters stripped
(F6 extended set: control chars, DEL, surrogates, U+FFFE/FFFF).

Scale shape: serialization happens executor-side as a column
expression pipeline into one XML string per doc; the driver never
materializes documents. ``write_solr_xml`` writes partitioned text
shards each wrapped as a valid <add> file (N shard files instead of
the reference's single file — each shard is independently loadable;
pass single_file=True for byte-compatible single-file output on
small data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# escape sequences are resolved by the JVM regex engine (a literal
# surrogate in the pattern string would be unencodable over py4j)
_INVALID_RE = (
    "[\\x00-\\x08\\x0B-\\x0C\\x0E-\\x1F\\x7F"
    "\\uD800-\\uDFFF\\uFFFE\\uFFFF]"
)

XML_HEADER = '<?xml version="1.0" encoding="UTF-8"?>\n<add>\n'
XML_FOOTER = "</add>"


def _xml_escape(c: Column, attr: bool = False) -> Column:
    c = F.regexp_replace(c, _INVALID_RE, "")
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    # inside name="...": quotes would terminate the attribute. Matters
    # for dyn-map keys, which are data-derived (collection_instance
    # values, tema keys); ET.SubElement in the reference escapes these
    # on serialization too.
    return F.regexp_replace(c, '"', "&quot;") if attr else c


def doc_xml(
    df: DataFrame,
    boost_col: str = "weight",
    exclude: tuple[str, ...] = (),
    dyn_col: str | None = "dyn",
) -> DataFrame:
    """Add an ``xml`` column: the full <doc> element per row.

    Scalar columns become single fields; array columns repeated fields;
    map columns (the dynamic enrichment fields) are flattened into one
    field per key. Fields whose value is null/''/empty-list are
    omitted (P8).
    """
    dtypes = dict(df.dtypes)
    field_cols = [
        c for c in sorted(df.columns)
        if c not in exclude and c != boost_col and c != dyn_col
    ]

    def _named_elems(name_expr: Column, values: Column) -> Column:
        clean = F.filter(
            F.coalesce(values, F.array().cast("array<string>")),
            lambda x: x.isNotNull() & (x != ""),
        )
        return F.transform(
            clean,
            lambda v: F.concat(
                F.lit('  <field name="'), _xml_escape(name_expr, attr=True),
                F.lit('">'), _xml_escape(v), F.lit("</field>"),
            ),
        )

    def _map_elems(col_name: str, dtype: str, prefixed: bool) -> Column:
        # map columns: dynamic enrichment fields emit their keys as
        # field names; ti/ab-style maps emit '<col>_<key>' (bare <col>
        # for the '' key — the reference's un-languaged ti/ab)
        value_is_array = dtype.startswith("map<string,array")
        entries = F.map_entries(F.coalesce(F.col(col_name), F.create_map().cast(dtype)))
        if prefixed:
            name_of = lambda e: F.when(  # noqa: E731
                e["key"] == "", F.lit(col_name)
            ).otherwise(F.concat(F.lit(col_name + "_"), e["key"]))
        else:
            name_of = lambda e: e["key"]  # noqa: E731
        return F.flatten(
            F.transform(
                entries,
                lambda e: _named_elems(
                    name_of(e),
                    e["value"] if value_is_array else F.array(e["value"]),
                ),
            )
        )

    parts: list[Column] = []
    for c in field_cols:
        col = F.col(c)
        if dtypes[c].startswith("array"):
            parts.append(_named_elems(F.lit(c), col.cast("array<string>")))
        elif dtypes[c].startswith("map"):
            parts.append(_map_elems(c, dtypes[c], prefixed=True))
        else:
            values = F.when(
                col.isNotNull() & (col.cast("string") != ""),
                F.array(col.cast("string")),
            ).otherwise(F.array().cast("array<string>"))
            parts.append(_named_elems(F.lit(c), values))
    body = F.flatten(F.array(*parts))
    if dyn_col is not None and dyn_col in df.columns:
        body = F.concat(body, _map_elems(dyn_col, dtypes[dyn_col], prefixed=False))
    boost = F.coalesce(F.col(boost_col).cast("string"), F.lit("")) if boost_col in df.columns else F.lit("")
    xml = F.concat(
        F.lit('<doc boost="'), boost, F.lit('">\n'),
        F.array_join(body, "\n"),
        F.lit("\n</doc>"),
    )
    return df.withColumn("xml", xml)


def write_solr_xml(
    xml_df: DataFrame, path: str, single_file: bool = False
) -> None:
    """Write <add>-wrapped XML text. Partitioned shards by default;
    single_file coalesces to 1 (small exports only)."""
    df = xml_df.select("xml")
    if single_file:
        df = df.coalesce(1)

    def wrap(rows):
        yield (XML_HEADER.rstrip("\n"),)
        for r in rows:
            yield (r.xml,)
        yield (XML_FOOTER,)

    wrapped = df.rdd.mapPartitions(wrap).toDF("xml string")
    wrapped.write.mode("overwrite").text(path)
