"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas`` (SURVEY.md build mandate).

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_image_features`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake extractor
(byte-length / first-byte statistics) runs instead. Everything
Spark-side — the schema contract, the Arrow batch shape, partitioning,
and the ``mapInPandas`` plumbing — is real and tested.

At scale: binary payloads stay columnar in Parquet; ``mapInPandas``
streams Arrow batches through Python with no row-at-a-time overhead;
``spark.sql.files.maxPartitionBytes`` bounds batch memory; feature
extraction parallelizes per-partition with zero shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("head_hash", StringType()),
    ]
)


def _fake_feature_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake 'decode': byte statistics of the payload."""
    import hashlib

    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "media_type": pdf["media_type"],
            "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
            "byte_mean": payloads.map(
                lambda b: float(sum(b)) / len(b) if b else 0.0
            ),
            "head_hash": payloads.map(
                lambda b: hashlib.md5(bytes(b[:16]) if b else b"").hexdigest()
            ),
        }
    )


def decode_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Feature extraction over binary media columns via mapInPandas.

    ``fake=False`` is the production path and raises
    ``NotImplementedError`` here — a real deployment drops in
    PIL/torchvision inside ``batch_fn`` with the identical plumbing.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/cv2 (not in this container); "
            "call with fake=True for the deterministic stub"
        )

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_feature_batch(pdf)

    return media.mapInPandas(batch_fn, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: explodes a timestamp
    grid per video (native, no UDF); the frame decode itself would slot
    into a mapInPandas like decode_image_features."""
    return (
        media.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_ms",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))),
        )
        .select("media_id", "frame_ms")
    )
