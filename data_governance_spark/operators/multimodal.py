"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery (schemas, batch shapes, partition sizing) is
real and tested; the actual codec calls are STUBBED — media libraries
(Pillow/ffmpeg/torchaudio) are not in this environment. Each stub is
either a clearly-marked NotImplementedError (``decode_image``) or a
deterministic fake (``fake_image_features``) so pipelines exercise
end-to-end without the codecs; swap the inner function when the
libraries are available.

Scale notes: media bytes never pass through Python row-at-a-time —
mapInPandas streams Arrow record batches; ``media_repartition`` sizes
partitions by total byte budget (binary columns make row-count-based
partitioning useless: 10k rows can be 10 MB or 100 GB).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(content: bytes) -> object:
    """STUB: real image decode requires Pillow/opencv — not installed.

    Replace the body with e.g. ``PIL.Image.open(io.BytesIO(content))``
    when available; the surrounding Spark plumbing needs no change.
    """
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use fake_image_features for the deterministic test path"
    )


def fake_image_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature extractor: a dim-wide folded
    byte histogram, normalized. Stable across runs/machines."""
    acc = [0] * dim
    for i, b in enumerate(content):
        acc[i % dim] += b
    total = float(sum(acc)) or 1.0
    return [a / total for a in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.

    The inner call is the stub; everything else (batch iteration,
    schema, null handling) is the production shape.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fake_image_features(c, dim) if c is not None else None
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explodes planned frame
    timestamps from metadata (the decode of each frame is the stubbed
    step; the partition-parallel explode shape is the real one)."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.greatest(
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0).cast("long")) - 1,
                    F.lit(0).cast("long"),
                ),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_ts_ms"),
    )
    return frames


def media_repartition(media: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Partition by byte budget, not row count: estimates total size
    from a cheap aggregate and repartitions so each partition carries
    roughly target_bytes of media payload."""
    total = media.select(
        F.sum(F.coalesce(F.length("content"), F.lit(0))).alias("b")
    ).collect()[0]["b"] or 0
    n = max(1, int(total / target_bytes) + 1)
    return media.repartition(n, "media_id")
