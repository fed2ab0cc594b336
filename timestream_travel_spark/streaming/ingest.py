"""Streaming incremental-ingest dedup (round 3): a foreachBatch
pipeline that keeps a persistent Bloom bitmap of every fingerprint
ever accepted and drops probable duplicates from each micro-batch
before they reach the corpus sink.

Per micro-batch:
  1. probe the batch against the stored bitmap (broadcast join —
     the accepted corpus is never re-read),
  2. append surviving rows to the corpus sink,
  3. fold the survivors' bits into the bitmap (bit_or merge — Bloom
     bitmaps are mergeable, so the update is a 2048-row groupBy, not
     a rebuild).

False positives drop a few novel docs (tunable via M/K); false
negatives cannot happen, so nothing accepted is ever a missed exact
duplicate of an earlier acceptance. At 100 TB the bitmap stays
O(M/64) rows forever — state does not grow with the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.bloom import (
    _fingerprint,
    bloom_build,
    bloom_probe,
)


def _read_bitmap(spark: SparkSession, bitmap_dir: str) -> DataFrame | None:
    if not os.path.isdir(bitmap_dir) or not any(
        f.endswith(".parquet") for f in os.listdir(bitmap_dir)
    ):
        return None
    return spark.read.parquet(bitmap_dir)


def dedup_ingest_batch(
    batch: DataFrame, corpus_dir: str, bitmap_dir: str, id_col: str = "doc_id"
) -> tuple[int, int]:
    """Process one micro-batch; returns (accepted, dropped). The
    batch must carry (id_col, text)."""
    spark = batch.sparkSession
    fp = batch.select(
        F.col(id_col), F.col("text"), _fingerprint(F.col("text")).alias("fp")
    )
    # exact-dup pressure inside the batch itself: keep first per fp
    fp = fp.dropDuplicates(["fp"])
    bitmap = _read_bitmap(spark, bitmap_dir)
    if bitmap is None:
        fresh = fp
    else:
        verdicts = bloom_probe(fp.select(id_col, "fp"), bitmap, id_col)
        fresh = fp.join(
            verdicts.filter(~F.col("probably_dup")).select(id_col), id_col, "left_semi"
        )
    fresh = fresh.persist()
    n_fresh = fresh.count()
    n_dropped = fp.count() - n_fresh
    if n_fresh:
        fresh.select(id_col, "text").write.mode("append").parquet(corpus_dir)
        delta = bloom_build(fresh.select("fp"))
        merged = (
            delta
            if bitmap is None
            else delta.unionByName(bitmap).groupBy("word").agg(
                F.bit_or("bits").alias("bits")
            )
        )
        # bitmap is ≤2048 rows: rewrite atomically via a staging dir
        # (write target ≠ read source, so no self-overwrite hazard)
        tmp = bitmap_dir + ".staging"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        import shutil

        if os.path.isdir(bitmap_dir):
            shutil.rmtree(bitmap_dir)
        os.replace(tmp, bitmap_dir)
    fresh.unpersist()
    return n_fresh, n_dropped


def bloom_dedup_sink(stream: DataFrame, corpus_dir: str, bitmap_dir: str, checkpoint: str):
    """writeStream wiring: every micro-batch flows through
    dedup_ingest_batch."""
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda df, _eid: dedup_ingest_batch(df, corpus_dir, bitmap_dir)
        )
    )
