"""Streaming mergeable rollup view: maintain the FULL hourly rollup
(pipeline/rollup.py's dashboard table) as a continuously-updated
materialized view, without ever rescanning history.

Every measure the batch rollup carries except the exact per-hour
DISTINCT is mergeable, so each micro-batch contributes a PARTIAL
aggregate row per (event_type, hour) — count, DECIMAL sum, min, max,
HLL user sketch — appended into its own epoch=<batchId> partition
(dynamic overwrite → at-least-once replay replaces exactly its
partition; the shared epoch-store contract in streaming/store_util).
Reads re-aggregate the partials: counts and DECIMAL sums add
EXACTLY, min/max compose, sketches union — so the view's exact
columns are byte-identical to the batch rollup built from the same
rows, at any point in the stream, regardless of how arrivals were
batched. The one non-mergeable measure (exact `n_users`) is served
as the sketch estimate `n_users_est` — the same column
`pipeline/rollup.daily_from_hourly` uses for cross-hour distincts.

Store growth is ≤ |types|×|hours touched| partial rows per batch;
`compact_rollup_view` folds history (the fold IS the read-side
merge, which keeps partial form — fold-then-read ≡ read) so the
view's cost stays O(live hours), not O(stream lifetime).

vs pipeline/rollup.refresh_rollup: the batch path rescans the ingest
tail on a schedule and assumes time-ordered arrival; this view is
incremental per-arrival and ORDER-FREE — a straggler's partial lands
in its true hour no matter when it arrives, which is exactly the
case refresh+repair exists to fix. The two meet at the same output
schema, pinned by the parity pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.pipeline.rollup import USERS_SKETCH_LGK
from timestream_travel_spark.streaming.store_util import (
    COMPACT_EPOCH,
    compact_epoch_store,
    write_epoch_partition,
)

__all__ = [
    "COMPACT_EPOCH",
    "compact_rollup_view",
    "maintain_rollup_view",
    "read_rollup_view",
]

_HOUR = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00")


def maintain_rollup_view(stream: DataFrame, store_path: str, checkpoint: str):
    """Start the maintenance query (availableNow trigger — drains
    the backlog then stops; production drops the trigger)."""

    def update(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_epoch_partition(
            batch_df.groupBy("event_type", _HOUR.alias("__hour")).agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(20,4)")).alias("sum_value"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
                F.hll_sketch_agg("user_id", USERS_SKETCH_LGK).alias("users_sk"),
            ),
            store_path,
            epoch_id,
        )

    return (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _merge(df: DataFrame) -> DataFrame:
    # sum_value pins back to the batch rollup's sum type
    # (decimal(30,4)) so repeated folds keep a stable schema and the
    # batch-parity comparison is type-exact, not just value-exact
    return df.groupBy("event_type", "__hour").agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("sum_value").cast("decimal(30,4)").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        F.hll_union_agg("users_sk").alias("users_sk"),
    )


def read_rollup_view(spark: SparkSession, store_path: str) -> DataFrame:
    """The merged hourly view: exact columns equal the batch rollup's
    (partial sums re-aggregate exactly), distinct users served as the
    sketch estimate."""
    return _merge(spark.read.parquet(store_path)).withColumn(
        "n_users_est",
        F.round(F.hll_sketch_estimate("users_sk"), 0).cast("bigint"),
    )


def compact_rollup_view(spark: SparkSession, store_path: str) -> None:
    """Fold the partial rows to one per (event_type, hour). The fold
    is the read-side merge — sums of sums, min of mins, union of
    sketches — so fold-then-read ≡ read, exactly for the exact
    columns and register-exactly for the sketch."""
    compact_epoch_store(spark, store_path, _merge)
