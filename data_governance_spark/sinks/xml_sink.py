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


def _xml_escape(c: Column) -> Column:
    c = F.regexp_replace(c, _INVALID_RE, "")
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def _field_elems(name: str, values: Column) -> Column:
    """array<string> of '  <field name="k">v</field>' lines."""
    return F.transform(
        values,
        lambda v: F.concat(
            F.lit(f'  <field name="{name}">'), _xml_escape(v), F.lit("</field>")
        ),
    )


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
    parts: list[Column] = []
    for c in field_cols:
        col = F.col(c)
        if dtypes[c].startswith("array"):
            values = F.filter(
                col.cast("array<string>"), lambda x: x.isNotNull() & (x != "")
            )
        else:
            values = F.when(
                col.isNotNull() & (col.cast("string") != ""),
                F.array(col.cast("string")),
            ).otherwise(F.array().cast("array<string>"))
        parts.append(_field_elems(c, values))
    body = F.flatten(F.array(*parts))
    if dyn_col is not None and dyn_col in df.columns:
        dyn_body = F.flatten(
            F.transform(
                F.map_entries(F.coalesce(F.col(dyn_col), F.create_map().cast(dtypes[dyn_col]))),
                lambda e: F.transform(
                    F.filter(e["value"], lambda x: x.isNotNull() & (x != "")),
                    lambda v: F.concat(
                        F.lit('  <field name="'), e["key"], F.lit('">'),
                        _xml_escape(v), F.lit("</field>"),
                    ),
                ),
            )
        )
        body = F.concat(body, dyn_body)
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
