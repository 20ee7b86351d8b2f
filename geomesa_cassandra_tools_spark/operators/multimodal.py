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
import sys
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
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI " and len(payload) >= 88:
        # RIFF/AVI: the mandatory LIST hdrl's avih chunk carries
        # microseconds-per-frame, total frames, and frame dimensions —
        # enough for exact duration without touching the movi data
        i = 12
        while i + 8 <= len(payload):
            cid = payload[i:i + 4]
            size = struct.unpack_from("<I", payload, i + 4)[0]
            if cid == b"LIST" and payload[i + 8:i + 12] == b"hdrl":
                j = i + 12
                while j + 8 <= i + 8 + size:
                    sub = payload[j:j + 4]
                    ssz = struct.unpack_from("<I", payload, j + 4)[0]
                    if sub == b"avih" and ssz >= 40:
                        (us_per_frame, _mbps, _pad, _flags, total_frames,
                         _init, _streams, _buf, w, h) = struct.unpack_from(
                            "<10I", payload, j + 8
                        )
                        return {
                            "mime": "video/x-msvideo", "width": w,
                            "height": h,
                            "duration_ms":
                                total_frames * us_per_frame // 1000,
                        }
                    j += 8 + ssz + (ssz % 2)
            i += 8 + size + (size % 2)
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


# ---------------------------------------------------------------------------
# FULL PIXEL DECODE (r12): BMP 24bpp, PPM P6, and PNG (zlib is stdlib —
# IDAT inflate + all five scanline filters), plus pixel-writing twins.
# Compressed codecs (JPEG etc.) stay out of scope in this container.

def build_bmp_pixels(width: int, height: int, rgb: bytes) -> bytes:
    """24bpp BMP around TOP-DOWN RGB pixel bytes: rows stored
    BOTTOM-UP as BGR with 4-byte row padding (the format's layout —
    exactly what `decode_pixels` must undo)."""
    pad = (-(width * 3)) % 4
    rows = []
    for y in range(height - 1, -1, -1):
        row = bytearray()
        for x in range(width):
            i = (y * width + x) * 3
            r, g, b = rgb[i], rgb[i + 1], rgb[i + 2]
            row += bytes((b, g, r))
        rows.append(bytes(row) + b"\x00" * pad)
    body = b"".join(rows)
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    return header + body


def build_ppm_pixels(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6) around top-down RGB bytes — raw, no padding."""
    return f"P6\n{width} {height}\n255\n".encode() + bytes(rgb)


def build_png_pixels(width: int, height: int, rgb: bytes) -> bytes:
    """Real PNG around top-down RGB bytes: IHDR + one zlib IDAT
    (filter 0 per scanline) + IEND, all with correct CRCs."""
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(rgb[y * width * 3:(y + 1) * width * 3])
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, width: int, height: int) -> bytes:
    """Undo PNG scanline filters (0 None, 1 Sub, 2 Up, 3 Average,
    4 Paeth) for 8-bit RGB — returns top-down RGB bytes."""
    stride = width * 3
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _y in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos:pos + stride])
        pos += stride
        if ftype == 1:  # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else (
                    b if pb <= pc else c
                )
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG filter {ftype} unsupported")
        out += line
        prev = line
    return bytes(out)


def decode_pixels(payload: bytes) -> tuple[int, int, bytes] | None:
    """FULL image decode to (width, height, top-down RGB bytes) for the
    pure-Python containers: BMP 24bpp (bottom-up BGR rows, 4-byte
    padding — or top-down when the height field is negative), PPM P6,
    PNG 8-bit RGB color-type 2 (zlib IDAT + the five scanline filters).
    None for anything else — callers keep such rows undecoded."""
    import zlib

    if payload is None or len(payload) < 8:
        return None
    if payload[:2] == b"BM" and len(payload) >= 54:
        width = struct.unpack_from("<i", payload, 18)[0]
        height_raw = struct.unpack_from("<i", payload, 22)[0]
        bpp = struct.unpack_from("<H", payload, 28)[0]
        off = struct.unpack_from("<I", payload, 10)[0]
        if bpp != 24 or width <= 0 or height_raw == 0:
            return None
        height = abs(height_raw)
        top_down = height_raw < 0
        stride = width * 3 + ((-(width * 3)) % 4)
        if len(payload) < off + stride * height:
            return None
        rgb = bytearray(width * height * 3)
        for row in range(height):
            y = row if top_down else (height - 1 - row)
            base = off + row * stride
            for x in range(width):
                b = payload[base + x * 3]
                g = payload[base + x * 3 + 1]
                r = payload[base + x * 3 + 2]
                i = (y * width + x) * 3
                rgb[i], rgb[i + 1], rgb[i + 2] = r, g, b
        return (width, height, bytes(rgb))
    if payload[:2] == b"P6":
        parts: list[bytes] = []
        i = 2
        while len(parts) < 3 and i < len(payload):
            while i < len(payload) and payload[i:i + 1].isspace():
                i += 1
            if payload[i:i + 1] == b"#":
                while i < len(payload) and payload[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j:j + 1].isspace():
                j += 1
            parts.append(payload[i:j])
            i = j
        if len(parts) < 3:
            return None
        width, height, maxv = (int(x) for x in parts)
        if maxv != 255:
            return None
        i += 1  # single whitespace after maxval
        need = width * height * 3
        if len(payload) < i + need:
            return None
        return (width, height, bytes(payload[i:i + need]))
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        i = 8
        width = height = None
        idat = bytearray()
        ok_format = False
        while i + 8 <= len(payload):
            size = struct.unpack_from(">I", payload, i)[0]
            tag = payload[i + 4:i + 8]
            body = payload[i + 8:i + 8 + size]
            if tag == b"IHDR" and size >= 13:
                width, height = struct.unpack_from(">II", body, 0)
                bit_depth, color_type = body[8], body[9]
                ok_format = bit_depth == 8 and color_type == 2
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            i += 12 + size  # len + tag + body + crc
        if not (ok_format and width and height and idat):
            return None
        try:
            raw = zlib.decompress(bytes(idat))
        except zlib.error:
            return None
        if len(raw) != height * (1 + width * 3):
            return None
        return (width, height, _png_unfilter(raw, width, height))
    return None


def ahash_hex(rgb: bytes, width: int, height: int) -> str | None:
    """64-bit average-hash of a top-down RGB image as a 16-char lowercase
    hex string — ALL-INTEGER so a SQL oracle reproduces it exactly:
    gray = (299r + 587g + 114b) // 1000, 8×8 block means (floor), global
    mean (floor), bit = block >= mean; byte per block-row, MSB = x 0."""
    if width % 8 or height % 8 or width == 0 or height == 0:
        return None
    bw, bh = width // 8, height // 8
    blocks = [[0] * 8 for _ in range(8)]
    for y in range(height):
        for x in range(width):
            i = (y * width + x) * 3
            g = (299 * rgb[i] + 587 * rgb[i + 1] + 114 * rgb[i + 2]) // 1000
            blocks[y // bh][x // bw] += g
    vals = [
        [blocks[by][bx] // (bw * bh) for bx in range(8)] for by in range(8)
    ]
    mean = sum(v for row in vals for v in row) // 64
    out = []
    for by in range(8):
        byte = 0
        for bx in range(8):
            if vals[by][bx] >= mean:
                byte |= 1 << (7 - bx)
        out.append(f"{byte:02x}")
    return "".join(out)


def image_ahash(media: DataFrame, id_cols: list[str]) -> DataFrame:
    """Arrow-batched FULL decode + perceptual hash: (id_cols..., width,
    height, ahash hex) per decodable payload; undecodable rows emit
    nulls (never dropped silently)."""
    out_schema = ", ".join(
        f"{c} {t}" for c, t in zip(
            id_cols,
            [dict(media.dtypes)[c] for c in id_cols],
        )
    ) + ", width int, height int, ahash string"

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {c: pdf[c] for c in id_cols}
            ws, hs, hx = [], [], []
            for p in pdf["payload"]:
                dec = decode_pixels(bytes(p) if p is not None else None)
                if dec is None:
                    ws.append(None), hs.append(None), hx.append(None)
                else:
                    w, h, rgb = dec
                    ws.append(w), hs.append(h)
                    hx.append(ahash_hex(rgb, w, h))
            out = pd.DataFrame(cols)
            out["width"], out["height"], out["ahash"] = ws, hs, hx
            yield out

    return media.mapInPandas(probe, schema=out_schema)


def ahash_near_pairs(
    hashes: DataFrame, id_col: str, hash_col: str = "ahash",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate image pairs by HAMMING-BANDED LSH over 64-bit
    ahashes: 4 bands of 16 bits — by pigeonhole two hashes within
    Hamming distance 3 share at least one untouched band, so for
    ``max_hamming`` <= 3 the banded candidate set has EXACT recall (no
    all-pairs comparison anywhere); candidates verify with an exact
    bit_count(xor) over 16-bit chunks (no 64-bit sign traps). Returns
    (a, b, hamming), a < b."""
    if max_hamming > 3:
        raise ValueError(
            "4x16-bit banding guarantees recall only for max_hamming <= 3;"
            " raise the band count for looser thresholds"
        )
    h = hashes.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("__id"), F.col(hash_col).alias("__h")
    )
    bands = h.select(
        "__id", "__h",
        F.explode(
            F.array(*[
                F.concat(
                    F.lit(str(i)),
                    F.substring(F.col("__h"), 1 + 4 * i, 4),
                ) for i in range(4)
            ])
        ).alias("__band"),
    )
    cand = (
        bands.alias("l")
        .join(bands.alias("r"), ["__band"])
        .where(F.col("l.__id") < F.col("r.__id"))
        .select(
            F.col("l.__id").alias("a"), F.col("r.__id").alias("b"),
            F.col("l.__h").alias("ha"), F.col("r.__h").alias("hb"),
        )
        .distinct()
    )
    chunks = [
        F.bit_count(
            F.conv(F.substring("ha", 1 + 4 * i, 4), 16, 10)
            .cast("long")
            .bitwiseXOR(
                F.conv(F.substring("hb", 1 + 4 * i, 4), 16, 10)
                .cast("long")
            )
        )
        for i in range(4)
    ]
    ham = chunks[0]
    for c in chunks[1:]:
        ham = ham + c
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# --- audio PCM content analysis (r13 — the q198 byte-decode pattern
# extended to the audio modality: real sample decode, not just the RIFF
# header walk) ----------------------------------------------------------


def build_wav_pcm(sample_rate: int, channels: int, pcm: bytes) -> bytes:
    """Real RIFF/WAVE container around 16-bit little-endian PCM frames —
    the writer twin of `decode_wav_pcm` (`build_wav` zero-fills; this
    carries actual samples)."""
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


def decode_wav_pcm(payload: bytes) -> tuple[int, int, "array.array"] | None:
    """FULL PCM decode of a 16-bit RIFF/WAVE payload: the chunk walk of
    `parse_media_header` continued into the ``data`` chunk. Returns
    (sample_rate, channels, int16 samples) or None for anything that is
    not uncompressed 16-bit PCM (compressed codecs are out of scope —
    the disclosed boundary of the stdlib-only container layer)."""
    import array

    if payload is None or len(payload) < 44:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i = 12
    rate = channels = bits = fmt_tag = None
    data = None
    while i + 8 <= len(payload):
        tag = payload[i:i + 4]
        (size,) = struct.unpack_from("<I", payload, i + 4)
        body = payload[i + 8:i + 8 + size]
        if tag == b"fmt " and size >= 16:
            fmt_tag, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
        elif tag == b"data":
            data = body
        i += 8 + size + (size % 2)  # RIFF chunks pad to even
    if fmt_tag != 1 or bits != 16 or rate is None or data is None:
        return None
    samples = array.array("h")
    samples.frombytes(data[: len(data) - (len(data) % 2)])
    if sys.byteorder == "big":  # WAV PCM is little-endian
        samples.byteswap()
    return rate, channels, samples


def audio_pcm_stats(
    media: DataFrame, id_cols: list[str], silence_threshold: int = 256
) -> DataFrame:
    """Arrow-batched PCM CONTENT statistics per payload (the loudness /
    silence / clipping triage every audio ingestion pipeline runs before
    feature extraction) — all-integer so the certification hash is
    bit-exact across engines:

      sample_rate, n_samples        — from the decoded container
      peak                          — max |sample|
      sum_sq                        — Σ sample² (the exact loudness
                                      basis; RMS = sqrt(sum_sq/n) is a
                                      lossy float and stays out of the
                                      hash)
      n_clipped                     — samples at the int16 rails
      n_zero_cross                  — sign changes (sign(0) = +1)
      max_silence_run               — longest run with |s| <
                                      ``silence_threshold``

    Undecodable / non-PCM payloads emit -1 sentinels (never dropped,
    never NULL — the q198 NaN-through-pandas lesson). One mapInPandas
    pass; binary columns never collect."""
    out_schema = ", ".join(
        f"{c} {t}" for c, t in zip(
            id_cols, [dict(media.dtypes)[c] for c in id_cols]
        )
    ) + (
        ", sample_rate bigint, n_samples bigint, peak bigint,"
        " sum_sq bigint, n_clipped bigint, n_zero_cross bigint,"
        " max_silence_run bigint"
    )
    thr = int(silence_threshold)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {c: pdf[c] for c in id_cols}
            stats = {k: [] for k in (
                "sample_rate", "n_samples", "peak", "sum_sq",
                "n_clipped", "n_zero_cross", "max_silence_run",
            )}
            for p in pdf["payload"]:
                dec = decode_wav_pcm(bytes(p) if p is not None else None)
                if dec is None:
                    for k in stats:
                        stats[k].append(-1)
                    continue
                rate, _ch, s = dec
                peak = sum_sq = clipped = crossings = 0
                run = best_run = 0
                prev_sign = 1
                for v in s:
                    a = -v if v < 0 else v
                    if a > peak:
                        peak = a
                    sum_sq += v * v
                    if v == 32767 or v == -32768:
                        clipped += 1
                    sign = 1 if v >= 0 else -1
                    if sign != prev_sign:
                        crossings += 1
                    prev_sign = sign
                    if a < thr:
                        run += 1
                        if run > best_run:
                            best_run = run
                    else:
                        run = 0
                stats["sample_rate"].append(rate)
                stats["n_samples"].append(len(s))
                stats["peak"].append(peak)
                stats["sum_sq"].append(sum_sq)
                stats["n_clipped"].append(clipped)
                stats["n_zero_cross"].append(crossings)
                stats["max_silence_run"].append(best_run)
            out = pd.DataFrame(cols)
            for k, v in stats.items():
                out[k] = pd.Series(v, dtype="int64")
            yield out

    return media.mapInPandas(probe, schema=out_schema)


# --- uncompressed-AVI video content decode (r13 — closes the video
# modality the way q198 closed images and q202 closed audio: REAL frame
# bytes through a real container walk; compressed codecs stay the
# disclosed out-of-scope boundary of the stdlib-only layer) -------------


def build_avi(
    width: int, height: int, fps: int, frames: list[bytes]
) -> bytes:
    """Real RIFF/AVI container around uncompressed 24bpp DIB frames
    (fourcc 'DIB ', biCompression 0): each frame is stored the DIB way —
    bottom-up BGR rows, 4-byte row padding (exactly `build_bmp_pixels`'
    body layout) — in one '00db' chunk inside LIST movi. The writer twin
    of `decode_avi_frames`."""
    import numpy as np

    def dib_body(rgb: bytes) -> bytes:
        pad = (-(width * 3)) % 4
        a = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
        a = a[::-1, :, ::-1].reshape(height, width * 3)
        if pad:
            a = np.concatenate(
                [a, np.zeros((height, pad), dtype=np.uint8)], axis=1
            )
        return a.tobytes()

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    frame_bytes = [dib_body(f) for f in frames]
    buf = max((len(b) for b in frame_bytes), default=0)
    us_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<10I16x", us_per_frame, buf * fps, 0, 0x10, len(frames),
        0, 1, buf, width, height,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, fps, 0, len(frames),
            buf, 0, 0, 0, 0, width, height,
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0,
        len(frame_bytes[0]) if frame_bytes else 0, 2835, 2835, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_frames(
    payload: bytes,
) -> tuple[int, int, int, list[bytes]] | None:
    """FULL frame decode of an uncompressed 24bpp RIFF/AVI payload:
    the chunk walk continued into LIST movi; each '00db' DIB body is
    row-flipped and BGR->RGB'd back to top-down RGB (the BMP rule).
    Returns (width, height, us_per_frame, [rgb frames]) or None for
    anything compressed / non-24bpp / malformed — the disclosed codec
    boundary, refused loudly rather than misdecoded."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    width = height = None
    us_per_frame = None
    compression = None
    bits = None
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal width, height, us_per_frame, compression, bits
        i = lo
        while i + 8 <= hi:
            cid = payload[i:i + 4]
            size = struct.unpack_from("<I", payload, i + 4)[0]
            body_lo = i + 8
            if cid == b"LIST":
                walk(body_lo + 4, body_lo + size)
            elif cid == b"avih" and size >= 40:
                vals = struct.unpack_from("<10I", payload, body_lo)
                us_per_frame = vals[0]
                width, height = vals[8], vals[9]
            elif cid == b"strf" and size >= 40:
                (_sz, _w, _h, _planes, bits_, comp) = struct.unpack_from(
                    "<IiiHHI", payload, body_lo
                )
                bits = bits_
                compression = comp
            elif cid in (b"00db", b"00dc"):
                frames.append(payload[body_lo:body_lo + size])
            i = body_lo + size + (size % 2)

    walk(12, 8 + struct.unpack_from("<I", payload, 4)[0])
    if (
        width is None or height is None or us_per_frame is None
        or compression not in (0, None) or (bits not in (24, None))
    ):
        return None
    pad = (-(width * 3)) % 4
    stride = width * 3 + pad
    out: list[bytes] = []
    import numpy as np

    for body in frames:
        if len(body) < stride * height:
            return None  # truncated frame — refuse, never misdecode
        # vectorized DIB undo: drop row padding, flip bottom-up rows,
        # swap BGR->RGB — byte-identical to the scalar walk (unit-pinned)
        a = np.frombuffer(body[: stride * height], dtype=np.uint8)
        a = a.reshape(height, stride)[:, : width * 3]
        a = a.reshape(height, width, 3)[::-1, :, ::-1]
        out.append(a.tobytes())
    return width, height, us_per_frame, out


def video_frame_ahash(
    media: DataFrame, id_cols: list[str], every_ms: int = 1000
) -> DataFrame:
    """REAL frame sampling + perceptual hash over video payloads
    (upgrades `sample_frames`' cadence plan with actual decode for the
    uncompressed-AVI container): one Arrow pass decodes each payload's
    frames, samples at the ``every_ms`` cadence against the container's
    own frame period (frame_idx = ts * 1000 // us_per_frame), and
    computes the q198 64-bit average hash per sampled frame. Rows:
    (id_cols..., frame_idx, frame_ts_ms, ahash). Undecodable payloads
    emit one (-1, -1, null) sentinel row — never silently dropped."""
    out_schema = ", ".join(
        f"{c} {t}" for c, t in zip(
            id_cols, [dict(media.dtypes)[c] for c in id_cols]
        )
    ) + ", frame_idx bigint, frame_ts_ms bigint, ahash string"

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in id_cols}
            out.update(frame_idx=[], frame_ts_ms=[], ahash=[])

            def emit(row_i, idx, ts, hx):
                for c in id_cols:
                    out[c].append(pdf[c].iloc[row_i])
                out["frame_idx"].append(idx)
                out["frame_ts_ms"].append(ts)
                out["ahash"].append(hx)

            for row_i, p in enumerate(pdf["payload"]):
                dec = decode_avi_frames(bytes(p) if p is not None else None)
                if dec is None:
                    emit(row_i, -1, -1, None)
                    continue
                w, h, uspf, frames = dec
                dur_ms = len(frames) * uspf // 1000
                ts = 0
                seen = set()
                while ts == 0 or ts < dur_ms:
                    idx = ts * 1000 // uspf
                    if idx >= len(frames):
                        break
                    if idx not in seen:
                        seen.add(idx)
                        emit(row_i, idx, ts, ahash_hex(frames[idx], w, h))
                    ts += every_ms
            res = pd.DataFrame(out)
            res["frame_idx"] = res["frame_idx"].astype("int64")
            res["frame_ts_ms"] = res["frame_ts_ms"].astype("int64")
            yield res

    return media.mapInPandas(probe, schema=out_schema)
