"""Multimodal (image/audio/video) columns as opaque binary + metadata.

The Spark-side plumbing — schema, partition-sized Arrow batching,
mapInPandas signatures, feature-column contracts — is real and tested;
the actual codec step is STUBBED behind ``_decode_payload`` (the
image/audio libraries are not in this container): it produces a
deterministic fake pixel buffer from the payload bytes, clearly marked.
Swapping in PIL/ffmpeg changes one function, not the pipeline.

Design for 100 TB: binaries stay in their parquet row groups until the
mapInPandas stage; decode/resize/feature-extract run per Arrow batch
(spark.sql.execution.arrow.maxRecordsPerBatch caps batch memory);
nothing is collected to the driver.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, mean_byte double, feature array<float>"


def synth_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int")
    )
    payload = F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 512).cast("binary")
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("id") % 64 + 16).cast("int").alias("width"),
        (F.col("id") % 48 + 16).cast("int").alias("height"),
        (F.col("id") * 100 % 60000).cast("int").alias("duration_ms"),
    )


def _decode_payload(payload: bytes, width: int, height: int):
    """STUB decoder — deterministic fake pixel buffer.

    Real deployment: replace with PIL.Image.open / soundfile / pyav.
    Raises NotImplementedError for real media mime types so misuse is
    loud, and fakes only the synthetic octet-stream payloads.
    """
    import numpy as np

    if payload is None:
        raise NotImplementedError("real media decoding requires PIL/ffmpeg (not in this container)")
    raw = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(width * height / len(raw))) if len(raw) else 1
    return np.tile(raw, reps)[: width * height].reshape(height, width)


def decode_images(media: DataFrame, batch_features: int = 8) -> DataFrame:
    """mapInPandas decode + feature extraction over image rows.

    Output: FEATURE_SCHEMA — byte stats + a fixed-size feature vector
    (row-mean downsample of the decoded buffer)."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = batch_features
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            payloads = pdf["payload"].tolist()
            # --- byte stats: one reduceat over the whole Arrow batch ---
            n_bytes = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.float64)
            starts = np.concatenate(([0], np.cumsum(n_bytes)[:-1]))
            mean_byte = np.add.reduceat(flat, starts) / n_bytes
            # --- decode (per item: the codec bound — PIL/ffmpeg are
            # inherently per-object) then a single vectorized feature
            # pass over all decoded pixels in the batch ---
            widths = pdf["width"].to_numpy(np.int64)
            heights = pdf["height"].to_numpy(np.int64)
            pix = np.concatenate(
                [
                    _decode_payload(p, int(w), int(h)).ravel()
                    for p, w, h in zip(payloads, widths, heights)
                ]
            ).astype(np.float64)
            sizes = widths * heights
            # np.array_split chunk lengths: mod chunks of div+1, rest div
            div, mod = np.divmod(sizes, k)
            chunk_len = div[:, None] + (np.arange(k)[None, :] < mod[:, None])
            flat_len = chunk_len.ravel()
            ends = np.cumsum(flat_len)
            cstarts = np.concatenate(([0], ends[:-1]))
            sums = np.add.reduceat(pix, np.minimum(cstarts, len(pix) - 1))
            feat = np.where(flat_len > 0, sums / np.maximum(flat_len, 1), 0.0)
            feat = feat.reshape(n, k).astype(np.float32)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": n_bytes,
                    "mean_byte": mean_byte,
                    "feature": list(feat),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, schema=FEATURE_SCHEMA)


def extract_image_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Alias shape for decode_images with a chosen feature dim."""
    return decode_images(media, batch_features=dim)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp.

    The frame decode itself is the stub; the explode/batching shape is
    the real 100 TB-scale pattern (rows fan out before decode so frame
    work distributes)."""
    stamps = F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload", "width", "height", F.explode(stamps).alias("ts_ms"))
    )
