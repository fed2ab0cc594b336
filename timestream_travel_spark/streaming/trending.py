"""Streaming trending terms (round 4): a persistent Misra-Gries
counter summary maintained across micro-batches in foreachBatch —
the frequency sibling of ingest.py's Bloom bitmap.

Per micro-batch:
  1. sketch the batch's tokens per partition with bounded MG counters
     (operators/llm_text7.mg_sketch_partitions — tokens never
     shuffle),
  2. merge with the stored summary (groupBy-sum over ≤ k·P + k rows),
  3. compact back to k counters with the mergeable-summaries
     reduction (Agarwal et al., PODS'12): subtract the (k+1)-th
     largest count from every counter, keep the positive ones.

State is ≤ k rows FOREVER — a trending-terms dashboard over an
unbounded 100 TB/day stream carries a fixed-size summary whose error
is bounded by n/(k+1) of the total token count, the same guarantee
the batch q_mg_heavy_hitters pytest pins.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.operators.llm_text7 import mg_sketch_partitions

MG_STATE_K = 64  # counters kept across batches


def _read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    if not os.path.isdir(state_dir) or not any(
        f.endswith(".parquet") for f in os.listdir(state_dir)
    ):
        return None
    return spark.read.parquet(state_dir)


def trending_update_batch(
    batch: DataFrame, state_dir: str, k: int = MG_STATE_K
) -> int:
    """Fold one micro-batch of documents into the persistent summary;
    returns the number of counters now stored. The global window in
    the compaction is safe: it orders ≤ k·P + k candidate rows (the
    merged counter table), never raw tokens."""
    spark = batch.sparkSession
    words = batch.select(F.explode(doc_words(F.col("text"))).alias("word"))
    sk = mg_sketch_partitions(words)
    state = _read_state(spark, state_dir)
    merged = (sk if state is None else sk.unionByName(state)).groupBy("word").agg(
        F.sum("cnt").alias("cnt")
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    ranked = merged.withColumn("rk", F.row_number().over(w))
    sub = ranked.filter(F.col("rk") == k + 1).select(F.col("cnt").alias("sub"))
    compacted = (
        ranked.join(F.broadcast(sub), how="left")
        .withColumn("kept", F.col("cnt") - F.coalesce("sub", F.lit(0)))
        .filter((F.col("rk") <= k) & (F.col("kept") > 0))
        .select("word", F.col("kept").alias("cnt"))
    )
    tmp = state_dir + ".staging"
    compacted.coalesce(1).write.mode("overwrite").parquet(tmp)
    if os.path.isdir(state_dir):
        shutil.rmtree(state_dir)
    os.replace(tmp, state_dir)
    return spark.read.parquet(state_dir).count()


def trending_topk(spark: SparkSession, state_dir: str, t: int = 10) -> DataFrame:
    """Current trending view: top-t surviving counters (estimates are
    under-counts by at most n/(k+1))."""
    state = _read_state(spark, state_dir)
    if state is None:
        return spark.createDataFrame([], "word string, cnt long")
    return state.orderBy(F.desc("cnt"), F.asc("word")).limit(t)


def trending_sink(stream: DataFrame, state_dir: str, checkpoint: str):
    """writeStream wiring: every micro-batch folds into the summary."""
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(lambda df, _eid: trending_update_batch(df, state_dir))
    )
