"""Multimodal columns: image/audio/video as opaque `binary` + typed metadata.

The Spark-side plumbing is real — schemas, Arrow-batched `mapInPandas`
transforms, partition sizing — and so is HEADER DECODE for the formats
whose containers are parseable in pure Python: BMP, PNG, PPM (P6), and
WAV ship real byte-level parsers (`parse_media_header`, surfaced through
`decode_headers`), with matching writers (`build_bmp`/`build_png`/
`build_ppm`/`build_wav`) so the round-trip is testable without any codec
library. Full pixel/sample decode for compressed formats stays stubbed
behind `_decode_image_bytes` (no PIL/ffmpeg in this container) — swap
the stub for library calls and nothing else changes: the batch shape,
schema contract, and partitioning are what matter at 100 TB (binary
payloads make rows huge — keep `spark.sql.files.maxPartitionBytes`
small and NEVER collect these columns to the driver).
"""

from __future__ import annotations

import struct
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


# ---------------------------------------------------------------------------
# REAL container parsing (pure Python — BMP/PNG/PPM headers and the WAV
# RIFF chunk walk need no codec library)
# ---------------------------------------------------------------------------

def parse_media_header(payload: bytes) -> dict | None:
    """Byte-level header probe: returns ``{"mime", "width", "height",
    "duration_ms"}`` for recognized containers, ``None`` for anything
    else (caller falls back to stored metadata / the decode stub).

    - BMP: 'BM' magic; int32-LE width/height at offsets 18/22 (negative
      height = top-down DIB -> abs).
    - PNG: 8-byte signature; IHDR width/height big-endian at 16/20 (the
      IHDR chunk is mandatory-first by spec).
    - PPM (P6, binary): ASCII header tokens with '#' comments.
    - WAV: RIFF/WAVE chunk walk — fmt's channels/sample-rate/block-align
      and the data chunk's byte size give exact duration
      (data_bytes * 1000 // byte_rate), integer arithmetic only.
    """
    if payload is None or len(payload) < 12:
        return None
    if payload[:2] == b"BM" and len(payload) >= 26:
        w = struct.unpack_from("<i", payload, 18)[0]
        h = struct.unpack_from("<i", payload, 22)[0]
        return {"mime": "image/bmp", "width": abs(w), "height": abs(h),
                "duration_ms": None}
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack_from(">II", payload, 16)
        return {"mime": "image/png", "width": w, "height": h,
                "duration_ms": None}
    if payload[:2] == b"P6":
        toks: list[int] = []
        i = 2
        while i < len(payload) and len(toks) < 3:
            c = payload[i:i + 1]
            if c == b"#":  # comment to end-of-line
                while i < len(payload) and payload[i:i + 1] != b"\n":
                    i += 1
            elif c.isspace():
                i += 1
            elif c.isdigit():
                j = i
                while j < len(payload) and payload[j:j + 1].isdigit():
                    j += 1
                toks.append(int(payload[i:j]))
                i = j
            else:
                return None  # malformed header
        if len(toks) >= 2:
            return {"mime": "image/x-portable-pixmap", "width": toks[0],
                    "height": toks[1], "duration_ms": None}
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        i = 12
        byte_rate = None
        data_bytes = None
        while i + 8 <= len(payload):
            cid = payload[i:i + 4]
            size = struct.unpack_from("<I", payload, i + 4)[0]
            if cid == b"fmt " and i + 8 + 16 <= len(payload):
                (_fmt, _ch, _rate, brate, _align, _bits) = struct.unpack_from(
                    "<HHIIHH", payload, i + 8
                )
                byte_rate = brate
            elif cid == b"data":
                data_bytes = size
            i += 8 + size + (size % 2)  # RIFF chunks pad to even
        if byte_rate and data_bytes is not None:
            return {"mime": "audio/wav", "width": None, "height": None,
                    "duration_ms": data_bytes * 1000 // byte_rate}
        return None
    return None


def build_bmp(width: int, height: int, body: bytes = b"") -> bytes:
    """Minimal valid BMP (BITMAPINFOHEADER, 24bpp, no pixel data needed
    for header probing): the writer twin of `parse_media_header`."""
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835,
        0, 0,
    )
    return header + body


def build_png(width: int, height: int, body: bytes = b"") -> bytes:
    """PNG signature + IHDR (CRC not computed — header probing ignores
    it, and writing pixel data is the codec stub's job)."""
    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
        + body
    )


def build_ppm(width: int, height: int, body: bytes = b"") -> bytes:
    return f"P6\n# synthetic\n{width} {height}\n255\n".encode() + body


def build_wav(
    sample_rate: int, channels: int, n_samples: int, bits: int = 16
) -> bytes:
    """Minimal valid RIFF/WAVE with a zeroed data chunk of exactly
    ``n_samples`` frames."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data = bytes(n_samples * block_align)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


DECODED_SCHEMA = MEDIA_SCHEMA  # decode_headers preserves the media schema


def decode_headers(media: DataFrame) -> DataFrame:
    """REAL header decode over binary payloads (Arrow-batched
    `mapInPandas`, same batch shape as the stubbed feature path): rows
    whose payload carries a recognized container magic (BMP/PNG/PPM/WAV)
    get mime/width/height/duration_ms re-derived FROM THE BYTES;
    unrecognized payloads pass through with their stored metadata
    untouched (never clobber a row the prober can't read)."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            mimes = pdf["mime"].to_numpy(dtype=object).copy()
            widths = pdf["width"].to_numpy(dtype=object).copy()
            heights = pdf["height"].to_numpy(dtype=object).copy()
            durs = pdf["duration_ms"].to_numpy(dtype=object).copy()
            for i, p in enumerate(pdf["payload"]):
                meta = parse_media_header(
                    bytes(p) if p is not None else None
                )
                if meta is not None:
                    mimes[i] = meta["mime"]
                    widths[i] = meta["width"]
                    heights[i] = meta["height"]
                    durs[i] = meta["duration_ms"]
            pdf["mime"] = mimes
            pdf["width"] = widths
            pdf["height"] = heights
            pdf["duration_ms"] = durs
            yield pdf

    return media.mapInPandas(probe, schema=media.schema)


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
