"""Multimodal column plumbing (north star: image/audio/video as
opaque binary columns with typed metadata).

The container has no image/audio codecs, so the decode kernels are
STUBS (NotImplementedError) behind a deterministic fake used by
tests. What IS real — and what matters on a cluster — is the Spark
plumbing: schemas, Arrow-batched mapInPandas with bounded batch
sizes, and metadata extraction that never ships the blob to the
driver.
"""

from __future__ import annotations

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
    """Real image decode — requires a codec library that is not in
    this container. Deliberately unimplemented; callers use
    fake_decode_dims in tests."""
    raise NotImplementedError("no image codec available in this environment")


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
            dims = [fake_decode_dims(b) for b in blobs]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": media_type,
                    "n_bytes": blobs.map(len).astype("int64"),
                    "checksum": blobs.map(lambda b: zlib.crc32(b)).astype("int64"),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "status": "decoded_fake",
                }
            )

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(run, ASSET_META_SCHEMA)


def documents_as_blobs(documents: DataFrame) -> DataFrame:
    """Adapter: treat documents.text as utf-8 blobs so the multimodal
    path has a real fixture to run against (FIXTURES.md)."""
    return documents.select(
        F.col("doc_id").alias("asset_id"), F.encode("text", "utf-8").alias("blob")
    )
