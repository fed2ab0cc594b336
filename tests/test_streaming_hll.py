"""Streaming HLL distinct-count maintenance: the incrementally
maintained sketch store matches a one-shot rebuild exactly (register
merge is associative — batch boundaries are invisible), estimates
track exact distincts within the lgK error bound, and compaction
bounds the store without moving any estimate."""

from __future__ import annotations

from pyspark.sql import functions as F

from timestream_travel_spark.tables import load_table

_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,"
    " value DOUBLE, props STRING"
)


def _estimates(spark, store):
    from timestream_travel_spark.streaming.hll import estimate_distinct

    return sorted(tuple(r) for r in estimate_distinct(spark, store).collect())


def test_streaming_hll_store_tracks_exact_distincts(spark, sf_dir, tmp_path):
    from timestream_travel_spark.streaming.hll import (
        COMPACT_EPOCH,
        compact_sketch_store,
        estimate_distinct_total,
        maintain_distinct_sketch,
    )

    src = str(tmp_path / "ev_src")
    ev = load_table(spark, sf_dir, "events")
    ev.withColumn("bucket", (F.col("event_id") % 3).cast("int")).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(src)

    def run(max_files: int, tag: str) -> str:
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", max_files)
            .parquet(f"{src}/bucket=*")
        )
        store = str(tmp_path / f"store_{tag}")
        q = maintain_distinct_sketch(stream, store, str(tmp_path / f"ckpt_{tag}"))
        q.awaitTermination(180)
        return store

    store = run(1, "inc")  # ≥3 micro-batches
    one_shot = run(64, "one")  # single batch

    # batch boundaries are invisible: union of per-batch sketches ==
    # sketch of everything (same coupon/register content)
    inc_est = _estimates(spark, store)
    assert inc_est == _estimates(spark, one_shot)

    # estimates track exact per-(type, hour) distincts within the
    # lgK=12 bound (~1.6% std error; small hours are coupon-exact)
    exact = {
        (r["event_type"], r["h"]): r["n"]
        for r in ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias(
                "h"
            ),
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert len(inc_est) == len(exact)
    for etype, hour, est, n_rows in inc_est:
        ex = exact[(etype, hour)]
        assert abs(est - ex) <= max(3, 0.05 * ex), (etype, hour, est, ex)
        assert n_rows >= ex

    # exact row-count conservation across micro-batches
    store_df = spark.read.parquet(store)
    assert store_df.agg(F.sum("n_rows")).collect()[0][0] == ev.count()

    # the all-time union answers what exact hourly counts cannot
    total_exact = ev.select("user_id").distinct().count()
    total_est = estimate_distinct_total(spark, store)
    assert abs(total_est - total_exact) <= max(3, 0.05 * total_exact)

    # compaction: ≤1 row per (type, hour), all in the reserved epoch,
    # row-count conserved, and NO estimate moves (union idempotence)
    compact_sketch_store(spark, store)
    compacted = spark.read.parquet(store)
    assert compacted.count() == len(exact)
    assert [r["epoch"] for r in compacted.select("epoch").distinct().collect()] == [
        COMPACT_EPOCH
    ]
    assert compacted.agg(F.sum("n_rows")).collect()[0][0] == ev.count()
    assert _estimates(spark, store) == inc_est
    assert estimate_distinct_total(spark, store) == total_est
