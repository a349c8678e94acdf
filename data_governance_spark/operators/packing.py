"""Sequence packing: assign documents to fixed-token-budget packs.

LLM training consumes fixed-length token sequences; the standard
pre-processing step concatenates documents into "packs" of at most
``max_tokens`` tokens (with the tail doc overflowing or truncated,
depending on the trainer). The interesting part at corpus scale is the
assignment, not the concatenation — this operator computes a
deterministic ``(pack_bucket, pack_id)`` for every document:

1. Every doc hashes to one of ``num_buckets`` independent lanes
   (md5-keyed, so the layout is stable across runs/cluster sizes —
   same property as operators/sampling).
2. Within a lane, docs are ordered by the same hash and packed by
   exclusive prefix-sum: a doc starts the pack its running-start token
   offset falls in (``pack_id = floor(start_offset / max_tokens)``).

Semantics (documented, deterministic): a pack targets ``max_tokens``
and may overflow by at most one document's tokens (the straddling doc
belongs to the pack its start falls in); a document longer than
``max_tokens`` spans its own pack(s). Trainers that need hard caps
truncate at materialization — assignment stays the same.

Scale shape: one shuffle (hash-partition by lane) + one window
prefix-sum per lane. Lanes are independent, so parallelism is
``num_buckets`` regardless of corpus size — size it ≥ cluster cores.
A single global ordering would funnel the whole corpus through one
window partition; the lane split is what makes packing feasible at
100 TB, at the cost of lane-boundary fragmentation (≤ one underfull
pack per lane, negligible for lanes ≫ max_tokens).

Reference twin: none — training-data extension per SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_governance_spark.functions.text import tokens


def write_packed(
    assigned: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    num_files: int | None = None,
) -> None:
    """Materialize a ``pack_sequences`` assignment (joined back with
    whatever payload columns the trainer needs) as consumable shards:
    every file holds one-or-more WHOLE pack lanes (a lane never splits
    across files — the repartition key is the full lane key), rows
    physically ordered by (pack_bucket, pack_id, pack_offset) so a
    reader streams concatenation-ready sequences without sorting.
    Readers distinguish co-resident lanes by ``pack_bucket`` (each
    lane's pack_id sequence restarts at 0) — do NOT assume one lane
    per file.

    ``num_files`` sets the shuffle partition count (== max output
    files, == write parallelism). Pass the lane count — ``num_buckets``
    times the cardinality of ``partition_cols`` values — so parallelism
    scales with the lanes you configured instead of silently capping at
    ``spark.sql.shuffle.partitions`` (with 8-16k lanes at 100 TB the
    default 200 would bottleneck the write and pile ~40-80 lanes into
    every file). Default: the distinct lane count, computed with one
    cheap lane-key aggregation over the assignment.

    Layout: ``path/[partition=value/]part-*`` via parquet
    ``partitionBy`` on ``partition_cols`` (pass ``["split"]`` when the
    assignment carries holdout splits). Parquet preserves row order
    within a file.
    """
    parts = list(partition_cols or [])
    lane_cols = parts + ["pack_bucket"]
    if num_files is None:
        num_files = max(assigned.select(*lane_cols).distinct().count(), 1)
    writer = (
        assigned.repartition(num_files, *[F.col(c) for c in lane_cols])
        .sortWithinPartitions("pack_bucket", "pack_id", "pack_offset")
        .write.mode("overwrite")
    )
    if parts:
        writer = writer.partitionBy(*parts)
    writer.parquet(path)


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    num_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    partition_cols: list[str] | None = None,
    seed: str = "pack",
) -> DataFrame:
    """Returns ``[*partition_cols,] id_col, n_tokens, pack_bucket,
    pack_id, pack_offset`` — pack_offset is the doc's token start
    position within its pack.

    ``partition_cols`` scopes the pack space: lanes become
    (partition values x pack_bucket), so documents with different
    partition values NEVER share a pack. When packing the output of
    ``hash_split``, PASS ``partition_cols=["split"]`` — otherwise a
    pack's token range interleaves train/val/test documents and
    materializing the packs leaks holdout text into training
    sequences.

    Pass ``token_count_col`` when token counts are precomputed (e.g.
    by d01); otherwise the whitespace tokenizer runs inline. Docs with
    zero tokens are dropped (nothing to pack).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    parts = list(partition_cols or [])
    nt = (
        F.col(token_count_col)
        if token_count_col
        else F.size(tokens(text_col))
    )
    h = F.md5(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    )
    base = (
        docs.select(
            *parts,
            id_col,
            nt.cast("long").alias("n_tokens"),
            (
                F.conv(F.substring(h, 1, 6), 16, 10).cast("long")
                % num_buckets
            ).alias("pack_bucket"),
            h.alias("_h"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    # ROWS frame, not the default RANGE: rows tied on (_h, id) — e.g.
    # duplicate ids in un-deduped input — must not share an inclusive
    # running sum, or they'd claim the same offset and break tiling
    w = (
        Window.partitionBy(*parts, "pack_bucket")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.coalesce(
        F.sum("n_tokens").over(w) - F.col("n_tokens"), F.lit(0)
    )
    return base.select(
        *parts,
        id_col,
        "n_tokens",
        "pack_bucket",
        F.floor(start / max_tokens).alias("pack_id"),
        (start % max_tokens).alias("pack_offset"),
    )
