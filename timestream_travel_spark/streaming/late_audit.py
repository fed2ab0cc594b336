"""Streaming late-arrival routing (dead-letter channel): split each
micro-batch against the event-time high-water mark of everything
that arrived BEFORE it, landing on-time rows in the main store and
late rows in a quarantine — so out-of-order ingest is observable
(and repairable) instead of silently corrupting time-partitioned
downstream state.

This is the ingest-side completion of the rollup's out-of-order
story: `pipeline/rollup.refresh_rollup` assumes time-ordered ingest
and never revisits hours behind its HWM; the quarantine names
exactly the event-hours that violated that assumption, and
`late_hours()` feeds them to `pipeline/rollup.repair_rollup`, which
rebuilds exactly those partitions. Detect → name → repair, each step
bounded.

Replay determinism: classification compares a row's event hour to
the max event hour over epochs STRICTLY BEFORE the current batch —
never the batch's own writes — so an at-least-once foreachBatch
replay re-derives the identical split, and every sink write goes to
the replaying batch's own epoch=<id> partition with dynamic
partition overwrite (the replays-replace contract shared with
streaming/quantiles and streaming/hll). The HWM store holds ONE
tiny row per epoch (max event hour in that batch), so the per-batch
HWM read is O(#epochs), not O(history); the main store is never
re-read on the hot path.

At 100 TB: per-batch cost is one pass over the batch plus a
broadcast-sized HWM lookup; quarantine volume is the late tail only.
A `grace` interval absorbs benign jitter (rows within grace of the
HWM still count on-time) so the quarantine holds real stragglers,
not clock skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

__all__ = [
    "compact_hwm_store",
    "late_hours",
    "route_late_arrivals",
    "suggest_grace",
]

_HOUR = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00")


def _prior_hwm(spark: SparkSession, hwm_path: str, epoch_id: int) -> str | None:
    """Max event hour over batches that committed before this one.
    Strictly-prior epochs only: a replayed batch must not see its own
    previous write, or the replay would classify differently than the
    original run."""
    try:
        row = (
            spark.read.parquet(hwm_path)
            .filter(F.col("epoch") < epoch_id)
            .agg(F.max("max_hour").alias("h"))
            .collect()[0]
        )
    except AnalysisException:
        return None
    return row["h"]


def route_late_arrivals(
    stream: DataFrame,
    dest_path: str,
    quarantine_path: str,
    hwm_path: str,
    checkpoint: str,
    grace: str = "INTERVAL 0 SECONDS",
):
    """Start the routing query (availableNow trigger — drains the
    backlog then stops; production drops the trigger). Quarantined
    rows carry `observed_hwm` so an audit can show HOW late each
    straggler was."""

    def route(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        hwm = _prior_hwm(spark, hwm_path, epoch_id)
        tagged = batch_df.withColumn("__hour", _HOUR)
        if hwm is None:
            is_late = F.lit(False)
        else:
            is_late = F.col("__hour").cast("timestamp") < (
                F.lit(hwm).cast("timestamp") - F.expr(grace)
            )
        tagged = tagged.withColumn("__late", is_late).localCheckpoint(eager=True)

        from timestream_travel_spark.streaming.store_util import (
            write_epoch_partition,
        )

        write_epoch_partition(
            tagged.filter(~F.col("__late")).drop("__late"), dest_path, epoch_id
        )
        write_epoch_partition(
            tagged.filter(F.col("__late"))
            .drop("__late")
            .withColumn("observed_hwm", F.lit(hwm)),
            quarantine_path,
            epoch_id,
        )
        write_epoch_partition(
            tagged.agg(F.max("__hour").alias("max_hour")), hwm_path, epoch_id
        )

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_hwm_store(spark: SparkSession, hwm_path: str) -> None:
    """The HWM store grows one row per batch forever; fold it to a
    single max row in the reserved compacted epoch so the per-batch
    `_prior_hwm` read stays O(live epochs) over any horizon. Safe
    w.r.t. classification: the compacted epoch (-1) is strictly
    below every real batchId, so it is visible to every later
    batch's strictly-prior filter, and max is merge-equivalent —
    fold-then-read ≡ read. Since round 7 the store's _folded_through
    watermark makes a replayed already-folded epoch a no-op (it no
    longer re-adds itself beside the baseline), and crash-interleaved
    writes are merged back by recovery. The remaining envelope is
    specific to THIS store's semantics: a replayed batch whose epoch
    was folded into the baseline would see its OWN max_hour through
    the strictly-prior filter (epoch -1 < any real id), so run
    compaction only when no written-but-uncommitted batch exists."""
    from timestream_travel_spark.streaming.store_util import compact_epoch_store

    compact_epoch_store(
        spark, hwm_path, lambda df: df.agg(F.max("max_hour").alias("max_hour"))
    )


def suggest_grace(
    spark: SparkSession, quarantine_path: str, q: float = 0.99
) -> str | None:
    """Tune the grace interval from the OBSERVED lateness
    distribution: each quarantined row records how far behind the
    then-current HWM its event hour was; the q-quantile of that gap
    is the grace that would have absorbed a q-fraction of the
    stragglers. Returns an `INTERVAL n SECONDS` string for
    route_late_arrivals, or None when nothing was quarantined (no
    evidence → keep the current setting). One bounded aggregate over
    the quarantine — the late tail, never the stream."""
    try:
        qdf = spark.read.parquet(quarantine_path)
    except AnalysisException:
        return None
    row = qdf.agg(
        F.percentile_approx(
            F.unix_timestamp(F.col("observed_hwm").cast("timestamp"))
            - F.unix_timestamp(F.col("__hour").cast("timestamp")),
            q,
        ).alias("s")
    ).collect()[0]
    if row["s"] is None:
        return None
    return f"INTERVAL {int(row['s'])} SECONDS"


def late_hours(spark: SparkSession, quarantine_path: str) -> list[str]:
    """Distinct event-hours with quarantined stragglers — the input
    `pipeline/rollup.repair_rollup` needs to rebuild exactly the
    partitions out-of-order ingest drifted. Bounded by the hour
    domain, not quarantine volume."""
    try:
        rows = (
            spark.read.parquet(quarantine_path)
            .select("__hour")
            .distinct()
            .collect()
        )
    except AnalysisException:
        return []
    return sorted(r["__hour"] for r in rows)
