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
    """Deterministic fake 'decode': byte statistics of the payload.

    n_bytes/byte_mean are vectorized (`.str.len` works on a bytes
    Series; the mean reduces one numpy buffer per row). head_hash is a
    per-row md5 by necessity — a real decoder (PIL/cv2) is per-payload
    anyway, so this stub matches the production batch shape."""
    import hashlib

    import numpy as np

    payloads = pdf["payload"]
    n_bytes = payloads.str.len().fillna(0).astype("int64")
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "media_type": pdf["media_type"],
            "n_bytes": n_bytes,
            "byte_mean": payloads.map(
                lambda b: float(np.frombuffer(b, dtype=np.uint8).mean())
                if b
                else 0.0
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


PCM_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("peak", LongType()),
        StructField("rms", DoubleType()),
        StructField("mean_level", DoubleType()),
    ]
)


def decode_pcm_features(media: DataFrame) -> DataFrame:
    """REAL audio decode path: interpret the binary payload as 16-bit
    little-endian PCM and extract waveform statistics (sample count,
    peak, RMS, mean level) — vectorized numpy inside Arrow-batched
    ``mapInPandas``. Unlike ``decode_image_features`` this needs no
    external media library, so the production path actually runs: the
    byte buffer is reinterpreted with ``np.frombuffer`` and reduced
    with array ops, exactly how a real featurizer would slot in.

    A trailing odd byte is truncated (PCM frames are 2 bytes). At
    scale the same notes as the image path apply: payloads stay
    columnar, batches stream through Python via Arrow, zero shuffles.
    """
    import numpy as np

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # fully vectorized over the whole Arrow batch: all payloads
            # concatenate into ONE sample buffer, and the per-sample
            # reductions (sum, sum-of-squares, peak) run as segmented
            # numpy ops — the only remaining per-ROW Python is the
            # bytes normalization list-comp (object handling, O(rows),
            # not O(samples))
            bufs = [
                bytes(p)[: 2 * (len(p) // 2)] if p is not None else b""
                for p in pdf["payload"]
            ]
            lens = np.fromiter(
                (len(b) // 2 for b in bufs), dtype=np.int64, count=len(bufs)
            )
            a = np.frombuffer(b"".join(bufs), dtype="<i2").astype(np.float64)
            offs = np.concatenate(([0], np.cumsum(lens)))
            # segmented sums via cumsum differencing (robust to empty
            # segments, where reduceat misbehaves); the cumulative fold
            # differs from a SQL AVG's per-group fold by ~1e-10
            # relative — downstream consumers round to 4dp
            csum = np.concatenate(([0.0], np.cumsum(a)))
            sums = csum[offs[1:]] - csum[offs[:-1]]
            csum2 = np.concatenate(([0.0], np.cumsum(a * a)))
            sums2 = csum2[offs[1:]] - csum2[offs[:-1]]
            safe = np.maximum(lens, 1).astype(np.float64)
            peaks = np.zeros(len(bufs), dtype=np.int64)
            nonempty = lens > 0
            if a.size:
                # empty segments are zero-width, so consecutive
                # NONEMPTY starts bound exactly one real segment each
                peaks[nonempty] = np.maximum.reduceat(
                    np.abs(a), offs[:-1][nonempty]
                ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": lens,
                    "peak": peaks,
                    "rms": np.sqrt(sums2 / safe),
                    "mean_level": sums / safe,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batch_fn, schema=PCM_SCHEMA
    )
