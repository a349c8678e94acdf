"""q45: the multimodal column plumbing under the oracle gate.

Binary content is synthesized deterministically from `customer`
(utf-8 bytes of 'blob<ck>'), so the DuckDB oracle can recompute the
fake feature extractor's folded byte histogram analytically — gating
the REAL Arrow path: BinaryType columns through mapInPandas batches,
byte-budget repartitioning, and the frame-sampling explode. The codec
itself stays the documented stub (operators/multimodal.py); this gate
certifies everything around it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_governance_spark.queries.base import QueryDef, qdef
from data_governance_spark.tables import table

QUERIES: dict[str, QueryDef] = {}

_DIM = 8  # histogram bins; oracle mirrors via range(b+1, len+1, 8)


def _s(c: Column) -> Column:
    return c.cast("string")


@qdef(
    QUERIES,
    "q45_multimodal_features",
    oracle=f"""
    WITH f AS (
      SELECT c_custkey AS ck, 'blob' || CAST(c_custkey AS VARCHAR) AS s
      FROM customer
    ),
    h AS (
      SELECT ck, s, length(s) AS n,
        CAST(list_sum(list_transform(range(1, length(s) + 1),
                                     i -> ascii(substr(s, i, 1)))) AS DOUBLE) AS total
      FROM f
    )
    SELECT ck AS media_id, CAST(n AS BIGINT) AS n_bytes,
      {", ".join(
        "round(CAST(CAST(COALESCE(list_sum(list_transform("
        f"range({b} + 1, n + 1, {_DIM}), i -> ascii(substr(s, i, 1)))), 0)"
        f" / total AS FLOAT) AS DOUBLE), 4) + 0.0 AS f{b}"
        for b in range(4)
      )},
      CASE WHEN ck % 3 = 0 THEN ck % 5 + 1 END AS n_frames
    FROM h
    """,
    doc="multimodal plumbing: BinaryType through Arrow mapInPandas "
    "(fake codec histogram), byte-budget repartition, frame-sample plan",
)
def q45_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.operators.multimodal import (
        extract_features,
        media_repartition,
        sample_frames,
    )

    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    media = cust.select(
        k.alias("media_id"),
        F.when(k % 3 == 0, F.lit("video")).otherwise(F.lit("image")).alias("kind"),
        F.encode(F.concat(F.lit("blob"), _s(k)), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            # duration ck%5*1000+500 -> ck%5+1 sampled frames at 1s steps
            ((k % 5) * 1000 + 500).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    feats = extract_features(media_repartition(media), dim=_DIM)
    n_frames = (
        sample_frames(media)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
    )
    out = feats.join(n_frames, "media_id", "left")
    fcols = [
        (F.round(F.get(F.col("feature"), b).cast("double"), 4) + F.lit(0.0)).alias(
            f"f{b}"
        )
        for b in range(4)
    ]
    return out.select("media_id", "n_bytes", *fcols, "n_frames")
