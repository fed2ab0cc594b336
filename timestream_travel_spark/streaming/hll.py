"""Streaming distinct-count maintenance: keep per-hour mergeable HLL
user sketches current as events arrive, so "distinct users per
window / per day / all-time" dashboards never rescan history.

Each micro-batch aggregates ITS rows into one HLL sketch per
(event_type, hour) — Spark 4's `hll_sketch_agg` (Apache DataSketches,
JVM-side, partial+merge) — and appends the sketch rows into an
epoch=<batchId> partition with dynamic partition overwrite, so an
at-least-once foreachBatch replay replaces exactly its own partition
(the same replays-replace contract as streaming/quantiles and the
Timestream-wire writer). Reads union the per-epoch sketches with
`hll_union_agg`: HLL register merge is associative, commutative and
idempotent, so ANY grouping of arrivals — per batch, per hour, one
big batch — yields the same register state.

Store growth is ≤ |types|×|hours touched| rows per batch (a 4 KiB
sketch each at lgK=12), independent of row volume; `compact_sketch_
store` folds history into the reserved epoch={COMPACT_EPOCH}
partition (union is idempotent, so compaction never changes any
estimate) via the temp-and-swap sequence that keeps the epoch layout
— and therefore replay idempotence — intact.

At 100 TB this is the cardinality-side twin of the quantile-summary
store: per-arrival cost O(batch), answer cost O(store), and the
store's sketches are the SAME column the batch rollup carries
(pipeline/rollup.py `users_sk`), so batch and streaming paths merge.
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
    "compact_sketch_store",
    "estimate_distinct",
    "estimate_distinct_total",
    "maintain_distinct_sketch",
]

_HOUR = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00")


def maintain_distinct_sketch(
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    key_col: str = "user_id",
):
    """Start the maintenance query (availableNow trigger — drains the
    backlog then stops; production would drop the trigger)."""

    def update(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_epoch_partition(
            batch_df.groupBy("event_type", _HOUR.alias("__hour")).agg(
                F.hll_sketch_agg(key_col, USERS_SKETCH_LGK).alias("users_sk"),
                F.count(F.lit(1)).alias("n_rows"),
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


def estimate_distinct(spark: SparkSession, store_path: str) -> DataFrame:
    """Per (event_type, hour) distinct-key estimate from the live
    store: union the per-epoch sketches (register max-merge — exact
    associativity, so batch boundaries are invisible) and estimate.
    Also carries the exact row count for the ratio diagnostics."""
    return (
        spark.read.parquet(store_path)
        .groupBy("event_type", "__hour")
        .agg(
            F.round(F.hll_sketch_estimate(F.hll_union_agg("users_sk")), 0)
            .cast("bigint")
            .alias("n_distinct_est"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
    )


def estimate_distinct_total(spark: SparkSession, store_path: str) -> int:
    """All-time distinct keys across every window — the union the
    exact per-hour counts can never give (distincts do not sum)."""
    row = (
        spark.read.parquet(store_path)
        .agg(
            F.round(F.hll_sketch_estimate(F.hll_union_agg("users_sk")), 0)
            .cast("bigint")
            .alias("n")
        )
        .collect()[0]
    )
    return int(row["n"])


def compact_sketch_store(spark: SparkSession, store_path: str) -> None:
    """Fold the accumulated per-epoch sketch rows to ONE row per
    (event_type, hour) in the reserved epoch={COMPACT_EPOCH}
    partition. Union idempotence makes this estimate-preserving (a
    sketch unioned with itself is itself); layout and swap contract
    in streaming/store_util."""

    def fold(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "__hour").agg(
            F.hll_union_agg("users_sk").alias("users_sk"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )

    compact_epoch_store(spark, store_path, fold)
