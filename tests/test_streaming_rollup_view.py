"""Streaming mergeable rollup view: merged partials equal the batch
rollup byte-exactly on every exact column regardless of arrival
batching (order-free, unlike refresh_rollup's time-ordered
assumption), the distinct estimate tracks exact within the lgK
bound, and compaction — even run twice — moves nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from timestream_travel_spark.tables import load_table

_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,"
    " value DOUBLE, props STRING"
)


def test_rollup_view_matches_batch_rollup(spark, sf_dir, tmp_path):
    from timestream_travel_spark.pipeline.rollup import _hourly
    from timestream_travel_spark.streaming.rollup_maintain import (
        COMPACT_EPOCH,
        compact_rollup_view,
        maintain_rollup_view,
        read_rollup_view,
    )

    src = str(tmp_path / "ev_src")
    ev = load_table(spark, sf_dir, "events")
    # bucket by id → each micro-batch spans the whole time range, so
    # arrival order is maximally out-of-order w.r.t. event time
    ev.withColumn("bucket", (F.col("event_id") % 3).cast("int")).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/bucket=*")
    )
    store = str(tmp_path / "view")
    q = maintain_rollup_view(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    def canon_exact(df):
        return sorted(
            tuple(r)
            for r in df.select(
                "event_type", "__hour", "n_events", "sum_value", "min_value", "max_value"
            ).collect()
        )

    view = read_rollup_view(spark, store)
    batch = _hourly(ev)
    # exact columns: byte-identical to the batch rollup (DECIMAL sums
    # and counts re-aggregate exactly; min/max compose)
    assert canon_exact(view) == canon_exact(batch)
    assert dict(view.select("sum_value").dtypes)["sum_value"] == "decimal(30,4)"

    # distinct estimate tracks the exact per-hour n_users
    exact = {
        (r["event_type"], r["__hour"]): r["n_users"]
        for r in batch.select("event_type", "__hour", "n_users").collect()
    }
    for r in view.select("event_type", "__hour", "n_users_est").collect():
        ex = exact[(r["event_type"], r["__hour"])]
        assert abs(r["n_users_est"] - ex) <= max(3, 0.05 * ex), (r, ex)

    # compaction (twice — folds must be schema- and value-stable)
    est_before = sorted(tuple(r) for r in view.drop("users_sk").collect())
    compact_rollup_view(spark, store)
    compact_rollup_view(spark, store)
    compacted = spark.read.parquet(store)
    assert compacted.count() == len(exact)
    assert [r["epoch"] for r in compacted.select("epoch").distinct().collect()] == [
        COMPACT_EPOCH
    ]
    after = read_rollup_view(spark, store)
    assert sorted(tuple(r) for r in after.drop("users_sk").collect()) == est_before
