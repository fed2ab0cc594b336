"""Streaming quantile-summary maintenance: the incrementally
maintained store answers quantiles within the sketch's rank-error
bound, total weight is exact across batches, and recompression
bounds the store without breaking the estimates."""

from __future__ import annotations

from pyspark.sql import functions as F

from timestream_travel_spark.tables import load_table


def test_streaming_quantile_store_matches_exact_ranks(spark, sf_dir, tmp_path):
    from timestream_travel_spark.operators.sketches import SKETCH_SIZE
    from timestream_travel_spark.streaming.quantiles import (
        estimate_quantiles,
        maintain_quantile_summary,
        recompress_summary,
    )

    src = str(tmp_path / "ev_src")
    ev = load_table(spark, sf_dir, "events")
    ev.withColumn("bucket", (F.col("event_id") % 3).cast("int")).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,"
            " value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/bucket=*")
    )
    store = str(tmp_path / "qstore")
    q = maintain_quantile_summary(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    summary = spark.read.parquet(store)
    n_exact = ev.count()
    # exact weight conservation across micro-batches
    assert summary.agg(F.sum("w")).collect()[0][0] == n_exact

    vals = sorted(r.value for r in ev.select("value").collect())
    qs = [0.5, 0.9, 0.99]
    # batches arrive as ≥3 file drops; each contributing summary adds
    # ≤ ceil(n_b/S) + 1 rank slack — bound generously by n/S + 8·P
    parts = spark.sparkContext.defaultParallelism
    bound = n_exact / SKETCH_SIZE + 8 * parts

    def check(summ):
        out = {r.q: r.est for r in estimate_quantiles(summ, qs).collect()}
        for quant, est in out.items():
            rank = sum(1 for v in vals if v <= est)
            assert abs(rank - quant * n_exact) <= bound, (quant, rank, bound)
        assert out[0.5] <= out[0.9] <= out[0.99]

    check(summary)

    # recompression bounds the store and keeps weight + estimates
    compact = recompress_summary(spark, store)
    rows = compact.collect()
    assert len(rows) <= SKETCH_SIZE + 1
    assert sum(r.w for r in rows) == n_exact
    check(compact)
