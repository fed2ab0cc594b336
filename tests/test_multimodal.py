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
