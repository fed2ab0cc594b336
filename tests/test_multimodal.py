"""Multimodal plumbing tests: binary columns + Arrow-batched
mapInPandas metadata extraction (north-star multimodal ops; decode
kernels are stubbed per environment constraints)."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from timestream_travel_spark.functions.multimodal import (
    ASSET_META_SCHEMA,
    decode_image,
    documents_as_blobs,
    extract_asset_metadata,
    fake_decode_dims,
)
from timestream_travel_spark.tables import load_table


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_fake_decode_deterministic():
    assert fake_decode_dims(b"abc") == fake_decode_dims(b"abc")
    w, h = fake_decode_dims(b"x" * 1000)
    assert 1 <= w <= 640 and 1 <= h <= 480


def _png(w, h):
    import struct
    import zlib as z

    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", z.crc32(chunk))
    )


def _gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def _jpeg(w, h):
    import struct

    # SOI, APP0 (JFIF), DHT-ish filler segment, SOF0, then junk
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xda\x00\x02" + b"\x12\x34"


def _bmp(w, h):
    import struct

    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 10


def test_parse_image_dims_headers():
    from timestream_travel_spark.functions.multimodal import parse_image_dims

    assert parse_image_dims(_png(640, 480)) == ("png", 640, 480)
    assert parse_image_dims(_gif(13, 37)) == ("gif", 13, 37)
    assert parse_image_dims(_jpeg(1920, 1080)) == ("jpeg", 1920, 1080)
    assert parse_image_dims(_bmp(800, 600)) == ("bmp", 800, 600)
    assert parse_image_dims(_bmp(800, -600)) == ("bmp", 800, 600)  # top-down BMP
    assert parse_image_dims(b"not an image at all") is None
    assert parse_image_dims(b"\x89PNG\r\n\x1a\n") is None  # truncated
    assert parse_image_dims(b"\xff\xd8\xff\xda\x00\x02") is None  # JPEG w/o SOF


def test_extract_asset_metadata_real_headers(spark):
    """Synthetic PNG/GIF/JPEG blobs through the mapInPandas path:
    dimensions come from the real header parse, not the fake."""
    from timestream_travel_spark.functions.multimodal import extract_asset_metadata

    rows = [
        (1, _png(640, 480)),
        (2, _gif(13, 37)),
        (3, _jpeg(1920, 1080)),
        (4, b"plain text blob"),
    ]
    df = spark.createDataFrame(rows, "asset_id long, blob binary")
    meta = {r["asset_id"]: r for r in extract_asset_metadata(df, "asset_id", "blob", "image/any").collect()}
    assert (meta[1]["width"], meta[1]["height"], meta[1]["status"]) == (640, 480, "decoded_header:png")
    assert (meta[2]["width"], meta[2]["height"], meta[2]["status"]) == (13, 37, "decoded_header:gif")
    assert (meta[3]["width"], meta[3]["height"], meta[3]["status"]) == (1920, 1080, "decoded_header:jpeg")
    assert meta[4]["status"] == "decoded_fake"


def test_extract_asset_metadata(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    blobs = documents_as_blobs(d)
    meta = extract_asset_metadata(blobs, "asset_id", "blob", "text/plain")
    assert meta.schema == ASSET_META_SCHEMA
    rows = meta.collect()
    assert len(rows) == d.count()

    # cross-check n_bytes + checksum against JVM-side truth
    truth = {
        r["asset_id"]: (r["n"], r["c"])
        for r in blobs.select(
            "asset_id", F.octet_length("blob").alias("n"), F.crc32("blob").alias("c")
        ).collect()
    }
    for r in rows:
        n, c = truth[r["asset_id"]]
        assert r["n_bytes"] == n
        assert r["checksum"] == c  # python zlib.crc32 == Spark crc32
        assert r["status"] == "decoded_fake"
        assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480


def test_parse_wav_meta_roundtrip():
    from timestream_travel_spark.functions.multimodal import parse_wav_meta, synthesize_wav

    blob = synthesize_wav(2, 16000, 16, 16000 * 3)  # 3 s stereo
    assert parse_wav_meta(blob) == (2, 16000, 16, 3.0)
    blob = synthesize_wav(1, 8000, 16, 4000)  # 0.5 s mono
    assert parse_wav_meta(blob) == (1, 8000, 16, 0.5)
    assert parse_wav_meta(b"RIFFxxxxNOPE") is None
    assert parse_wav_meta(b"not audio") is None
    assert parse_wav_meta(b"RIFF\x00\x00\x00\x00WAVE") is None  # no fmt/data chunks
