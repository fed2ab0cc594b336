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


def test_epoch_store_swap_recovers_from_crash_points(spark, tmp_path):
    """compact_epoch_store's two renames cannot be atomic together;
    the __swap_pending marker + recover_epoch_store must restore a
    consistent store from either crash window, and the next
    compaction must NOT mistake a crashed swap's `old` for a
    completed swap's leftover (that would delete the only history)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from timestream_travel_spark.streaming.store_util import (
        COMPACT_EPOCH,
        compact_epoch_store,
        recover_epoch_store,
    )

    def build(path):
        for e in (0, 1, 2):
            (
                spark.range(10)
                .select((F.col("id") + 100 * e).alias("v"), F.lit(e).alias("epoch"))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(path)
            )

    def totals(path):
        r = spark.read.parquet(path).agg(
            F.count("*").alias("n"), F.sum("v").alias("s")
        ).collect()[0]
        return (r["n"], r["s"])

    fold = lambda df: df.select("v")  # identity fold (keeps rows)  # noqa: E731

    # crash window A: between the two renames (store gone, old holds
    # the history, tmp holds the fold)
    store = str(tmp_path / "storeA")
    build(store)
    before = totals(store)
    tmp, old, marker = (
        store + ".__compact_tmp",
        store + ".__compact_old",
        store + ".__swap_pending",
    )
    fold(spark.read.parquet(store)).withColumn(
        "epoch", F.lit(COMPACT_EPOCH)
    ).write.partitionBy("epoch").parquet(tmp)
    open(marker, "w").close()
    os.rename(store, old)  # ← crash here
    recover_epoch_store(store)
    assert totals(store) == before
    assert not os.path.exists(old) and not os.path.exists(tmp)
    assert not os.path.exists(marker)

    # crash window B: after the second rename, before cleanup (swap
    # done; old is superseded) — and the NEXT compaction self-recovers
    store = str(tmp_path / "storeB")
    build(store)
    before = totals(store)
    tmp, old, marker = (
        store + ".__compact_tmp",
        store + ".__compact_old",
        store + ".__swap_pending",
    )
    fold(spark.read.parquet(store)).withColumn(
        "epoch", F.lit(COMPACT_EPOCH)
    ).write.partitionBy("epoch").parquet(tmp)
    open(marker, "w").close()
    os.rename(store, old)
    os.rename(tmp, store)  # ← crash here (old + marker left behind)
    compact_epoch_store(spark, store, fold)  # recovery runs inside
    assert totals(store) == before
    assert spark.read.parquet(store).select("epoch").distinct().collect()[0][
        "epoch"
    ] == COMPACT_EPOCH
    assert not os.path.exists(old) and not os.path.exists(marker)
    shutil.rmtree(store, ignore_errors=True)
