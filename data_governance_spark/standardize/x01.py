"""The x01 normalization pass (02_x01_create_iahx_xml_collection.py):
country-name title-casing applied to the encoded country fields, and
the corporate-author rename join (J9).

The reference runs these as two in-place read-modify-write sweeps over
02_iahx_xml; here they are column rewrites in the same lineage — no
second pass over storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from data_governance_spark.standardize.udfs import (
    normalize_afiliacao_list_udf,
    normalize_afiliacao_string_udf,
)


def normalize_country_fields(df: DataFrame) -> DataFrame:
    """x01 passes 1-2 (:62-117): title-case every ^x segment of
    pais_afiliacao (array) and pais_publicacao (string)."""
    # one withColumns call = one analysis pass (guide §5), not one per
    # rewritten column
    rewrites = {}
    if "pais_afiliacao" in df.columns:
        rewrites["pais_afiliacao"] = normalize_afiliacao_list_udf(
            F.col("pais_afiliacao")
        )
    if "pais_publicacao" in df.columns:
        rewrites["pais_publicacao"] = normalize_afiliacao_string_udf(
            F.col("pais_publicacao")
        )
    return df.withColumns(rewrites) if rewrites else df


def brisa_ai_map(brisa: DataFrame) -> DataFrame:
    """J9 build side (:122-167): (key=trim(ai1 item), ai2), empty ai2
    rows skipped, later rows win on duplicate keys (dict overwrite)."""
    with_id = brisa.withColumn("_row", F.monotonically_increasing_id())
    exploded = (
        with_id.filter(F.col("ai2").isNotNull() & (F.trim(F.col("ai2")) != ""))
        .select(F.explode("ai1").alias("_k"), "ai2", "_row")
        .withColumn("_k", F.trim(F.col("_k")))
        .filter(F.col("_k") != "")
    )
    w = W.partitionBy("_k").orderBy(F.desc("_row"))
    return (
        exploded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("_k").alias("key"), F.col("ai2").alias("replacement"))
    )


def rename_ai(df: DataFrame, brisa: DataFrame, id_col: str = "id") -> DataFrame:
    """J9 probe (:169-221): replace each element of `ai` whose trimmed
    value is a map key; order preserved via posexplode reassembly."""
    lk = brisa_ai_map(brisa)
    exploded = df.select(
        F.col(id_col).alias("_xid"), F.posexplode_outer("ai").alias("_pos", "_v")
    )
    joined = exploded.join(
        F.broadcast(lk), F.trim(F.coalesce(F.col("_v"), F.lit(""))) == F.col("key"), "left"
    )
    agg = (
        joined.groupBy("_xid")
        .agg(
            F.transform(
                F.array_sort(
                    # posexplode_outer emits a (NULL pos, NULL value) row
                    # for empty/NULL arrays; the when() maps it to NULL and
                    # collect_list drops it, so an empty `ai` stays [] after
                    # reassembly (the reference skips those docs unchanged)
                    F.collect_list(
                        F.when(
                            F.col("_pos").isNotNull(),
                            F.struct(
                                F.col("_pos").alias("pos"),
                                F.coalesce(F.col("replacement"), F.col("_v")).alias("v"),
                            ),
                        )
                    )
                ),
                lambda s: s["v"],
            ).alias("_new_ai")
        )
    )
    # one select instead of withColumn+drop (guide §5: fewer analysis
    # passes over the deepening plan)
    return df.join(agg, F.col(id_col) == F.col("_xid"), "left").select(
        *[
            F.when(F.col("ai").isNotNull(), F.col("_new_ai")).alias("ai")
            if c == "ai"
            else c
            for c in df.columns
        ]
    )
