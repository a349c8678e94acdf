"""CSV corpus source with corrupt-row quarantine — sources/jsonl.py's
sibling for the other interchange format the data world actually
ships (metadata tables, label files, crawl indexes).

Same corpus-grade stance as the JSONL source:

- EXPLICIT schema — no inference scan, no run-to-run schema drift;
- malformed rows (wrong column count, un-castable values, broken
  quoting) captured as a separate ``bad`` relation with the raw line,
  not silently nulled or job-killing;
- both relations parse via ``text`` + ``from_csv`` for the same
  reason jsonl uses ``from_json``: Spark forbids plans whose only
  referenced column of a raw csv read is the corrupt-record column
  (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the documented workaround
  is a hidden cache. ``from_csv`` is the same Univocity parse inside
  codegen, fully lazy.
- the header line (when ``header=True``) is dropped by VALUE match on
  the expected header — deterministic under Spark's text reader,
  which carries no row order guarantee across files: any line equal
  to the header string is framing, not data (a real CSV cannot carry
  a data row that collides with the header unless its first column
  VALUE equals the first column NAME — name your id columns unlike
  their values).

One deliberate divergence from the JSONL source: a ROW SHORTER than
the schema quarantines (missing columns = structural damage in CSV,
where fields are positional — from_csv's PERMISSIVE mode flags both
short and long rows via the corrupt-record column, empirically
verified) — whereas JSONL treats absent fields as NULL (keys are
named, absence is legitimate sparsity).

ONE-RECORD-PER-LINE contract (the same contract as Spark's own
default ``multiLine=false`` CSV reader): a quoted field containing a
NEWLINE spans physical lines, which a line-based reader cannot
reassemble. Rather than silently truncating such records (what a
plain ``spark.read.csv`` does), ``csv_documents`` quarantines their
fragments via a quote-parity probe: an RFC-4180 single-line record
always carries an EVEN number of quote chars (embedded quotes are
doubled), so an odd-quote line is a broken fragment, never a clean
record. The head and tail fragments of a split record are always
odd-parity; an interior fragment (3+-line fields) has no quotes and
is caught by the column-count flag unless it coincidentally parses —
if your corpus carries newline-bearing text, use the JSONL source
(newlines are escaped there) or strip newlines before ``write_csv``.

Reference twin: none — training-data extension per SURVEY.md §6.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class CsvCorpus:
    docs: DataFrame  # well-formed rows, schema columns only
    bad: DataFrame  # (_corrupt_record) raw text of malformed rows


def csv_documents(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ",",
    header: bool = True,
) -> CsvCorpus:
    """Split a CSV dataset into well-formed ``docs`` and quarantined
    ``bad`` raw lines. ``schema`` is required (positional columns have
    no self-describing fallback). Quarantine semantics (pinned by
    tests): un-castable values, EXTRA columns and MISSING columns all
    quarantine; empty lines are framing and are skipped."""
    full = T.StructType(
        list(schema.fields)
        + [T.StructField("_corrupt_record", T.StringType())]
    )
    opts = {
        "columnNameOfCorruptRecord": "_corrupt_record",
        "mode": "PERMISSIVE",
        "sep": sep,
        # RFC-4180 quoting: '"' quotes, '""' escapes an embedded quote
        # (from_csv does NOT unquote without these — verified; and the
        # writer below mirrors escape='"' so round-trips agree)
        "quote": '"',
        "escape": '"',
    }
    lines = spark.read.text(path).filter(F.trim("value") != "")
    if header:
        header_line = sep.join(f.name for f in schema.fields)
        lines = lines.filter(F.col("value") != header_line)
    # from_csv wants a DDL string, not a StructType (unlike from_json)
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in full.fields
    )
    parsed = lines.select(
        "value",
        F.from_csv("value", ddl, opts).alias("c"),
    )
    # from_csv's PERMISSIVE mode flags BOTH short and long rows via
    # the corrupt-record column (verified empirically on this Spark).
    # The one failure it cannot see line-locally: fragments of a
    # quoted MULTI-LINE record (see module docstring) — caught by
    # quote parity: a well-formed single-line record always has an
    # even number of '"' chars
    n_quotes = F.length("value") - F.length(
        F.replace(F.col("value"), F.lit('"'), F.lit(""))
    )
    odd_quotes = n_quotes % 2 == 1
    is_bad = F.col("c._corrupt_record").isNotNull() | odd_quotes
    docs = parsed.filter(~is_bad).select(
        *[F.col(f"c.{f.name}").alias(f.name) for f in schema.fields]
    )
    bad = parsed.filter(is_bad).select(
        F.col("value").alias("_corrupt_record")
    )
    return CsvCorpus(docs=docs, bad=bad)


def write_csv(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    num_files: int | None = None,
    sep: str = ",",
    header: bool = True,
    compression: str | None = None,
) -> None:
    """Shard-writer mirror (native csv writer, no Python in the
    plan); same knobs as write_jsonl. NOTE the module's
    one-record-per-line contract: a text value containing a newline
    writes as a quoted multi-line record that the line-based reader
    QUARANTINES on read-back (never silently truncates) — strip
    newlines first, or ship such corpora as JSONL."""
    if num_files is not None:
        df = df.repartition(num_files)
    w = (
        df.write.mode("overwrite")
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("quote", '"')
        .option("escape", '"')
    )
    if compression:
        w = w.option("compression", compression)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.csv(path)
