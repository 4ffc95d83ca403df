"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas`` (SURVEY.md build mandate).

``decode_image_features(fake=True)`` remains the deterministic test
seam (payload byte statistics — what the corpus oracle pairs against).
The production path (``fake=False``) performs a REAL image decode:
PIL when importable, otherwise the built-in pure-numpy PNG decoder
below (IHDR parse, concatenated-IDAT inflate, full filter
reconstruction — None/Sub/Up/Average/Paeth), and emits statistics of
the DECODED PIXELS. Audio PCM decode (``decode_pcm_features``) was
always real.

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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type -> channel count (8-bit, non-interlaced support)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(buf: bytes):
    """Decode a PNG byte payload to an (H, W, C) uint8 numpy array —
    stdlib ``zlib``/``struct`` + numpy only, no image library.

    Supports the overwhelmingly common on-disk shape: bit depth 8,
    color types greyscale/RGB/grey+alpha/RGBA, non-interlaced,
    arbitrary many IDAT chunks, all five scanline filters (None, Sub,
    Up, Average, Paeth per the PNG spec §9). Sub reconstruction is
    vectorized as a per-lane cumulative sum; Up is a vector add;
    Average/Paeth fall back to a per-byte loop (rare in practice —
    encoders that emit them would route through PIL in a deployment
    with image libraries installed). Palette, 16-bit, and Adam7 raise
    ``ValueError``.
    """
    import struct
    import zlib

    import numpy as np

    if not buf or bytes(buf[:8]) != _PNG_MAGIC:
        raise ValueError("not a PNG payload (bad signature)")
    pos, idat, header = 8, [], None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = bytes(buf[pos + 4 : pos + 8])
        data = bytes(buf[pos + 8 : pos + 8 + length])
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IHDR":
            header = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if header is None or not idat:
        raise ValueError("truncated PNG (missing IHDR or IDAT)")
    width, height, depth, color, comp, filt, interlace = header
    if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG shape (depth={depth}, color={color}, "
            f"interlace={interlace}); needs PIL"
        )
    channels = _PNG_CHANNELS[color]
    stride = width * channels
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if raw.size != height * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    rows = raw.reshape(height, stride + 1)
    filters, scan = rows[:, 0], rows[:, 1:]
    out = np.empty((height, stride), np.uint16)
    prev = np.zeros(stride, np.uint16)
    for y in range(height):
        f, row = int(filters[y]), scan[y].astype(np.uint16)
        if f == 0:
            pass
        elif f == 1:  # Sub: cumulative sum mod 256 within each lane
            row = np.cumsum(
                row.reshape(width, channels), axis=0, dtype=np.uint32
            ).reshape(stride) & 0xFF
        elif f == 2:  # Up
            row = (row + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = row[x - channels] if x >= channels else 0
                row[x] = (row[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - channels]) if x >= channels else 0
                b = int(prev[x])
                c = int(prev[x - channels]) if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = row
        prev = out[y]
    return out.astype(np.uint8).reshape(height, width, channels)


def _decode_any_image(buf: bytes):
    """(H, W, C) uint8 pixels for a payload: PIL when importable (any
    format), else the built-in PNG decoder."""
    try:
        import io as _io

        from PIL import Image  # noqa: PLC0415 — optional accelerator

        import numpy as np

        with Image.open(_io.BytesIO(bytes(buf))) as im:
            arr = np.asarray(im.convert("RGBA" if "A" in im.getbands() else "RGB"))
        return arr if arr.ndim == 3 else arr[:, :, None]
    except ImportError:
        return decode_png(buf)


def _real_feature_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Decoded-pixel statistics per payload (same output contract as
    the fake seam, different measurement surface): ``n_bytes`` = size
    of the decoded pixel buffer, ``byte_mean`` = mean pixel intensity,
    ``head_hash`` = md5 of the first 16 decoded bytes. A payload that
    fails to decode yields n_bytes = -1 with an empty-hash sentinel —
    quarantine-not-crash, the batch pipeline rule."""
    import hashlib
    from zlib import error as zlib_error

    out = {"media_id": [], "media_type": [], "n_bytes": [],
           "byte_mean": [], "head_hash": []}
    for mid, mtype, payload in zip(
        pdf["media_id"], pdf["media_type"], pdf["payload"]
    ):
        out["media_id"].append(mid)
        out["media_type"].append(mtype)
        try:
            px = _decode_any_image(payload)
            flat = px.reshape(-1)
            out["n_bytes"].append(int(flat.size))
            out["byte_mean"].append(float(flat.mean()) if flat.size else 0.0)
            out["head_hash"].append(
                hashlib.md5(flat[:16].tobytes()).hexdigest()
            )
        except (ValueError, OSError, zlib_error):
            out["n_bytes"].append(-1)
            out["byte_mean"].append(0.0)
            out["head_hash"].append("")
    return pd.DataFrame(out)


def decode_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Feature extraction over binary media columns via mapInPandas.

    ``fake=True``: deterministic payload-byte statistics — the test
    seam the corpus oracle pairs against. ``fake=False``: REAL decode
    (PIL if importable, else the built-in numpy PNG decoder) emitting
    decoded-pixel statistics in the same schema; undecodable payloads
    are quarantined as ``n_bytes = -1`` rows rather than failing the
    batch."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_feature_batch(pdf) if fake else _real_feature_batch(pdf)

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
