"""Multimodal column plumbing (north star: image/audio/video as
opaque binary columns with typed metadata).

Image DIMENSIONS are parsed for real from container headers — pure
Python over the public format specs (PNG IHDR, GIF logical screen
descriptor, JPEG SOFn segment, BMP info header), no codec library
needed. Full pixel decode still requires a codec that is not in this
container and stays a stub (NotImplementedError) behind a
deterministic fake. The Spark plumbing — schemas, Arrow-batched
mapInPandas with bounded batch sizes, blob-never-hits-driver — is
real either way.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed-metadata schema attached to every decoded asset.
ASSET_META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("status", StringType()),
    ]
)


def decode_image(blob: bytes) -> tuple[int, int]:
    """Full pixel decode — requires a codec library that is not in
    this container. Deliberately unimplemented; header-only metadata
    comes from parse_image_dims, tests of the pixel path use
    fake_decode_dims."""
    raise NotImplementedError("no image codec available in this environment")


def parse_image_dims(blob: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from container headers, or None if the
    blob is not a recognized image. Pure-Python struct reads of the
    public specs:

    - PNG: 8-byte signature, then the IHDR chunk — width/height are
      big-endian uint32 at offsets 16/20.
    - GIF: 'GIF87a'/'GIF89a', logical screen w/h little-endian uint16
      at offsets 6/8.
    - JPEG: SOI then marker segments; any SOFn (0xC0–0xCF minus the
      non-frame C4/C8/CC) carries height/width big-endian uint16 at
      segment offsets 3/5.
    - BMP: 'BM', BITMAPINFOHEADER width/height int32 LE at 18/22
      (height may be negative = top-down).
    """
    if len(blob) >= 24 and blob[:8] == b"\x89PNG\r\n\x1a\n" and blob[12:16] == b"IHDR":
        w, h = struct.unpack(">II", blob[16:24])
        return "png", w, h
    if len(blob) >= 10 and blob[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", blob[6:10])
        return "gif", w, h
    if len(blob) >= 4 and blob[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(blob):
            if blob[i] != 0xFF:
                return None  # marker desync — not a well-formed JPEG
            marker = blob[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers, no length field
                continue
            if i + 4 > len(blob):
                return None
            seg_len = struct.unpack(">H", blob[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(blob):
                    return None
                h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
                return "jpeg", w, h
            if marker == 0xDA:  # entropy-coded data begins; no SOF seen
                return None
            i += 2 + seg_len
        return None
    if len(blob) >= 26 and blob[:2] == b"BM":
        w, h = struct.unpack("<ii", blob[18:26])
        return "bmp", w, abs(h)
    return None


def synthesize_png(width: int, height: int) -> bytes:
    """Minimal valid PNG header (signature + IHDR chunk with CRC) for
    a given geometry — the deterministic image fixture for tests and
    the q_image_header_dims oracle round-trip."""
    import zlib

    ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def parse_wav_meta(blob: bytes) -> tuple[int, int, int, float] | None:
    """(channels, sample_rate, bits_per_sample, duration_s) from a
    RIFF/WAVE header — pure-Python struct reads of the public spec:
    'RIFF'<size>'WAVE', then chunks; 'fmt ' carries channels/rate/
    bits at offsets 2/4/14 of its body, 'data' carries the payload
    size that determines duration. Returns None for non-WAV blobs."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    channels = rate = bits = None
    data_size = None
    i = 12
    while i + 8 <= len(blob):
        cid = blob[i : i + 4]
        (size,) = struct.unpack("<I", blob[i + 4 : i + 8])
        if cid == b"fmt " and i + 8 + 16 <= len(blob):
            channels, rate = struct.unpack("<HI", blob[i + 10 : i + 16])
            (bits,) = struct.unpack("<H", blob[i + 22 : i + 24])
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or data_size is None or not channels or not bits or not rate:
        return None
    if bits % 8 != 0:  # sub-byte PCM (e.g. ADPCM) — not parseable here
        return None
    bytes_per_sec = rate * channels * (bits // 8)
    return channels, rate, bits, round(data_size / bytes_per_sec, 6)


def synthesize_wav(channels: int, rate: int, bits: int, n_samples: int) -> bytes:
    """Minimal valid WAV header + silent payload for the given
    geometry — the deterministic audio fixture."""
    payload = b"\x00" * (n_samples * channels * (bits // 8))
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * (bits // 8), channels * (bits // 8), bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def fake_decode_dims(blob: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: derives (width, height)
    from blob content so tests exercise the full pipeline shape."""
    n = len(blob)
    return (n % 640) + 1, ((n * 31) % 480) + 1


def extract_asset_metadata(df: DataFrame, id_col: str, blob_col: str, media_type: str) -> DataFrame:
    """mapInPandas over binary blobs → typed metadata rows.

    Arrow-batched: each pandas batch holds spark.sql.execution.arrow
    .maxRecordsPerBatch rows; blobs never concatenate into one driver
    buffer. This is the pattern a real decode/resize/frame-sample
    kernel plugs into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            blobs = pdf[blob_col]
            dims, statuses = [], []
            for b in blobs:
                parsed = parse_image_dims(bytes(b))
                if parsed is not None:
                    fmt, w, h = parsed
                    dims.append((w, h))
                    statuses.append(f"decoded_header:{fmt}")
                else:
                    dims.append(fake_decode_dims(b))
                    statuses.append("decoded_fake")
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": media_type,
                    "n_bytes": blobs.map(len).astype("int64"),
                    "checksum": blobs.map(lambda b: zlib.crc32(b)).astype("int64"),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "status": statuses,
                }
            )

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(run, ASSET_META_SCHEMA)


def documents_as_blobs(documents: DataFrame) -> DataFrame:
    """Adapter: treat documents.text as utf-8 blobs so the multimodal
    path has a real fixture to run against (FIXTURES.md)."""
    return documents.select(
        F.col("doc_id").alias("asset_id"), F.encode("text", "utf-8").alias("blob")
    )


def image_feature_vector(blob: bytes, dim: int = 4) -> list[float] | None:
    """Geometry-derived feature vector from an image header —
    [w, h, round(w/h, 6), round(log2(w·h), 6)]. The full pixel-space
    embedding needs a codec (decode_image — NotImplementedError in
    this container); the Spark-side plumbing (binary → array<float>
    through Arrow batches) is identical either way, so swapping the
    real encoder in is a one-function change."""
    import math

    parsed = parse_image_dims(blob)
    if parsed is None:
        return None
    _, w, h = parsed
    return [float(w), float(h), round(w / h, 6), round(math.log2(w * h), 6)][:dim]


def extract_image_features(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """mapInPandas: binary image column → fixed-dim array<float>
    feature column. Arrow-batched, one Python roundtrip per batch —
    the multimodal embed stage shape (north star)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [image_feature_vector(bytes(b)) for b in pdf[blob_col]]
            yield pd.DataFrame({"asset_id": pdf[id_col].astype("int64"), "features": feats})

    return df.mapInPandas(run, "asset_id long, features array<double>")


FAKE_VIDEO_MAGIC = b"FAKV"


def synthesize_video(n_frames: int, fps: int) -> bytes:
    """Minimal fake video container: magic + uint32 frame count +
    uint32 fps — the deterministic stand-in for a real container
    (no codecs here), with the same parse-then-sample dataflow."""
    return FAKE_VIDEO_MAGIC + struct.pack(">II", n_frames, fps)


def parse_video_meta(blob: bytes) -> tuple[int, int] | None:
    """(n_frames, fps) from the fake container header."""
    if len(blob) >= 12 and blob[:4] == FAKE_VIDEO_MAGIC:
        return struct.unpack(">II", blob[4:12])
    return None


def decode_video_frame(blob: bytes, frame_idx: int) -> bytes:
    """Pixel decode of one frame — codec-gated like decode_image."""
    raise NotImplementedError("no video codec available in this environment")


def sample_video_frames(df: DataFrame, id_col: str, blob_col: str, k: int = 3) -> DataFrame:
    """mapInPandas: video binary → k uniformly-spaced frame indices
    with their timestamps (frame i of n at fps → ts = i/fps). Frame
    PIXELS stay undecodable here (decode_video_frame raises); the
    sampling plan, schema, and batch shape are the real pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_ids, out_idx, out_ts = [], [], []
        for pdf in batches:
            for aid, b in zip(pdf[id_col], pdf[blob_col]):
                meta = parse_video_meta(bytes(b))
                if meta is None:
                    continue
                n_frames, fps = meta
                kk = min(k, n_frames)
                for j in range(kk):
                    idx = (j * n_frames) // kk  # uniform spacing, floor
                    out_ids.append(int(aid))
                    out_idx.append(idx)
                    out_ts.append(round(idx / fps, 6))
            yield pd.DataFrame(
                {"asset_id": out_ids, "frame_idx": out_idx, "frame_ts_s": out_ts}
            )
            out_ids, out_idx, out_ts = [], [], []

    return df.mapInPandas(run, "asset_id long, frame_idx int, frame_ts_s double")
