"""Multimodal columns: image/audio/video as opaque `binary` + typed metadata.

The Spark-side plumbing is real — schemas, Arrow-batched `mapInPandas`
transforms, partition sizing — while the codec step is stubbed behind
`_decode_image_bytes` (no image/audio libraries in this container). Swap the
stub for PIL/ffmpeg calls and nothing else changes: the batch shape, schema
contract, and partitioning are what matter at 100 TB (binary payloads make
rows huge — keep `spark.sql.files.maxPartitionBytes` small and NEVER collect
these columns to the driver).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: canonical multimodal schema: payload + typed metadata travel together.
MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id bigint, kind string, feature array<double>, n_bytes int"


def _decode_image_bytes(payload: bytes) -> tuple[int, int]:
    """STUB: image decode (PIL not installed). Deterministic fake: derive
    (width, height) from the payload so tests are stable end-to-end."""
    if not payload:
        return (0, 0)
    return (64 + payload[0] % 64, 64 + payload[-1] % 64)


def extract_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    `mapInPandas` streams column batches through Python once — the right
    shape for codec work: per-batch vectorization, no per-row pickling, and
    the output schema is declared so downstream stays columnar.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                # deterministic fake embedding from byte histogram (stub for
                # a real model forward pass)
                feat = [float((sum(b[i::feat_dim]) % 256) / 255.0) if b else 0.0
                        for i in range(feat_dim)]
                feats.append(feat)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def probe_dimensions(media: DataFrame) -> DataFrame:
    """Decode-and-measure (stubbed decode): returns media rows with width/
    height filled for image kinds."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            # decode ONLY image rows — other kinds keep whatever metadata
            # they arrived with (clobbering a video's real width/height
            # with payload-derived fakes corrupts rows for any consumer
            # that doesn't post-filter kind == 'image')
            is_img = (pdf["kind"] == "image").to_numpy()
            widths = pdf["width"].to_numpy(dtype=object).copy()
            heights = pdf["height"].to_numpy(dtype=object).copy()
            for i, (flag, p) in enumerate(zip(is_img, pdf["payload"])):
                if flag:
                    w, h = _decode_image_bytes(bytes(p) if p is not None else b"")
                    widths[i] = w
                    heights[i] = h
            pdf["width"] = widths
            pdf["height"] = heights
            yield pdf

    return media.mapInPandas(probe, schema=media.schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video payloads: one output row per sampled
    timestamp (decode stubbed; the explode/cadence logic is real). A video
    with NULL duration (unprobed media) still emits its t=0 frame —
    sequence(0, NULL) is NULL and a plain explode would silently drop the
    whole video from every downstream per-media summary."""
    return (
        media.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms", "payload")
    )
