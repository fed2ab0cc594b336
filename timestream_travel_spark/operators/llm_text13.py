"""LLM-data-pipeline operators, part 13: perceptual image hashing —
the multimodal analog of SimHash text dedup.

Average-hash (aHash) is the classic perceptual fingerprint: decode,
downsample to 8×8 luma, threshold each cell against the mean, pack 64
bits. Identical hashes ⇒ visually-identical images, so exact groupBy
on the hash deduplicates an image corpus the same way md5 groupBy
deduplicates text. The pixel DECODE step is the codec-gated swap
(functions/multimodal.decode_image raises in this container); here
the 8×8 grid travels INSIDE the blob as a planted pixel chunk, so the
Spark side still exercises the real path: binary column → byte
parsing → threshold → packed hash, Arrow-batched end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

PIXEL_MAGIC = b"pIXL"  # planted 8x8 grayscale chunk tag
N_PIX = 64


def _planted_pixel(doc_id: int, i: int) -> int:
    """Deterministic fake luma grid — the stand-in for the codec
    decode, recomputable in SQL for the oracle round-trip."""
    return (doc_id * 31 + i * 17) % 256


def _ahash_from_blob(blob: bytes) -> str | None:
    """Locate the planted pixel chunk in the blob and compute the
    64-bit average hash as a bitstring (portable across engines —
    a packed int64 would fight the sign bit)."""
    at = blob.find(PIXEL_MAGIC)
    if at < 0 or at + 4 + N_PIX > len(blob):
        return None
    pix = blob[at + 4 : at + 4 + N_PIX]
    mean = sum(pix) / float(N_PIX)
    return "".join("1" if p >= mean else "0" for p in pix)


@query(
    "q_image_ahash",
    oracle=f"""
    WITH px AS (
      SELECT doc_id, j,
             (doc_id * 31 + j * 17) % 256 AS p
      FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d,
           unnest(generate_series(0, {N_PIX - 1})) AS t(j)
    ), m AS (
      SELECT doc_id, SUM(p) / {N_PIX}.0 AS mean FROM px GROUP BY doc_id
    ), h AS (
      SELECT px.doc_id,
             string_agg(CASE WHEN px.p >= m.mean THEN '1' ELSE '0' END,
                        '' ORDER BY px.j) AS ahash
      FROM px JOIN m ON px.doc_id = m.doc_id
      GROUP BY px.doc_id
    )
    SELECT doc_id AS asset_id, ahash,
           CAST(COUNT(*) OVER (PARTITION BY ahash) AS BIGINT) AS n_same_hash
    FROM h
    """,
)
def q_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash per image asset + exact-duplicate
    group size (n_same_hash > 1 ⇒ visually-identical candidates).

    Plumbing is the real multimodal path: synthesize a PNG per doc
    with the 8×8 luma grid planted as a trailing chunk, push the
    binary column through Arrow-batched mapInPandas byte parsing,
    threshold against the mean, emit the 64-bit hash as a bitstring.
    The oracle recomputes the planted grid in SQL, so a hash match
    proves the binary→hash path, not just the formula. At 100 TB the
    shape is one narrow map stage producing a 64-char key + one
    hash-partitioned window — same cost as exact text dedup; swapping
    the codec in (decode_image) changes no Spark topology."""
    from timestream_travel_spark.functions.multimodal import synthesize_png

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did, n in zip(pdf["doc_id"], pdf["n_chars"]):
                png = synthesize_png((int(n) % 640) + 1, (int(n) % 480) + 1)
                pix = bytes(
                    _planted_pixel(int(did), i) for i in range(N_PIX)
                )
                blobs.append(png + PIXEL_MAGIC + pix)
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"].astype("int64"), "blob": blobs}
            )

    def hash_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "ahash": [_ahash_from_blob(bytes(b)) for b in pdf["blob"]],
                }
            )

    blobs = d.select("doc_id", "n_chars").mapInPandas(
        synth, "asset_id long, blob binary"
    )
    hashed = blobs.mapInPandas(hash_stage, "asset_id long, ahash string")
    return hashed.select(
        "asset_id",
        "ahash",
        F.count("*").over(Window.partitionBy("ahash")).cast("bigint").alias(
            "n_same_hash"
        ),
    )
