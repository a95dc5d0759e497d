"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns (schemas.MEDIA); decode /
feature-extract / resize / frame-sample are Arrow-batched
`mapInPandas` stages. The actual codec work is STUBBED (image/audio
libraries are not in this container): `decode_image_batch` raises
NotImplementedError unless `fake=True`, in which case a deterministic
fake decoder (payload hash → pixel stats) exercises the REAL Spark
plumbing — schema, partitioning, UDF signature, Arrow batch shape —
end-to-end. Tests cover the fake path (tests/test_multimodal.py).

The reference's media handling stops at collecting {alt, src} pairs
(reference web_scraper_js.py:474-476); this module is the engine's
extension for training-data pipelines.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai4orgwebscraper_spark import schemas

DECODED_SCHEMA = (
    "media_ref string, media_type string, n_bytes int, "
    "feat_mean double, feat_std double, width int, height int"
)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = md5-stream bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"media|{i}".encode()).digest() * (4 + i % 8)
        mtype = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                f"/media/{i:04d}",
                mtype,
                bytearray(payload),
                32 + i % 64 if mtype == "image" else None,
                32 + (i * 7) % 64 if mtype == "image" else None,
                1000 * (i % 30) if mtype != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=schemas.MEDIA)


def _fake_decode(payload: bytes) -> tuple[float, float]:
    """Deterministic stand-in for a real codec: byte-stream moments."""
    if not payload:
        return 0.0, 0.0
    n = len(payload)
    mean = sum(payload) / n
    var = sum((b - mean) ** 2 for b in payload) / n
    return mean, var**0.5


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract stage: mapInPandas over MEDIA rows.

    Scale: binary payloads stay columnar through Arrow; repartition
    upstream by a content-hash bucket if payload sizes are skewed.
    Real codecs (PIL/av) plug into `decode` below — the only
    non-plumbing line in the stage.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/av — not in this "
                    "container; pass fake=True for the deterministic stub"
                )
            stats = [_fake_decode(bytes(p) if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "feat_mean": [round(s[0], 6) for s in stats],
                    "feat_std": [round(s[1], 6) for s in stats],
                    "width": pdf["meta_width"],
                    "height": pdf["meta_height"],
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 5000, fake: bool = False) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp — the explode is a JVM-side sequence(), only the (stubbed)
    frame decode would touch Python."""
    videos = df.filter(F.col("media_type") == "video").select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta_duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    if not fake:
        return videos  # plan only; decode stub applies downstream
    return videos.withColumn(
        "frame_id", F.md5(F.concat_ws("@", "media_ref", "frame_ts_ms"))
    )


EMBED_DIM = 16


def _fake_embed(payload: bytes) -> list[float]:
    """Deterministic stand-in for a learned encoder: L2-normalized
    16-bucket byte histogram. A real CLIP/wav2vec encoder plugs in
    here with the identical mapInPandas shape."""
    vec = [0.0] * EMBED_DIM
    if payload:
        for b in payload:
            vec[b % EMBED_DIM] += 1.0
        norm = sum(v * v for v in vec) ** 0.5
        if norm > 0:
            vec = [v / norm for v in vec]
    return [round(v, 6) for v in vec]


def embed_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Media → embedding stage (the multimodal half of the similarity
    pipeline): mapInPandas over MEDIA rows emitting array<float>
    embeddings that feed directly into the ANN operators
    (operators/similarity.py). Payloads stay columnar through Arrow."""

    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake:
                raise NotImplementedError(
                    "real media encoders require torch/PIL/av — not in this "
                    "container; pass fake=True for the deterministic stub"
                )
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "embedding": [
                        _fake_embed(bytes(p) if p is not None else b"")
                        for p in pdf["payload"]
                    ],
                }
            )

    return df.mapInPandas(
        embed_batches, schema="media_ref string, media_type string, embedding array<float>"
    )
