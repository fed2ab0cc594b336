"""Streaming quantile-summary maintenance: keep the mergeable
(value, weight) quantile sketch (operators/sketches.py) current as
events arrive, so percentile dashboards never rescan history.

Each micro-batch compresses ITS values into a bounded summary and
appends it to the parquet summary store — incremental cost is
O(batch); merge is UNION ALL by construction (weights add along the
value axis), so the store grows by ≤ SKETCH_SIZE × partitions rows
per batch, not with data volume. A periodic RECOMPRESS pass (same
sort+compress over the summary itself, weights carried) bounds the
store: summaries are themselves weighted value sets, so compressing
a summary is the same operator applied recursively.

At 100 TB this is the observability-side twin of streaming/ingest's
Bloom gate: per-arrival cost stays bounded, and quantile queries
(q_quantile_sketch's cumulative-weight probe) run on the bounded
store at any time.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.sketches import (
    _SUMMARY_SCHEMA,
    compress_weighted,
    estimate_quantiles,
    quantile_summary,
)

__all__ = [
    "COMPACT_EPOCH",
    "compact_summary_store",
    "estimate_quantiles",
    "maintain_quantile_summary",
    "recompress_summary",
]

# Reserved compacted-rows epoch (-1) now lives in the shared
# epoch-store contract module.
from timestream_travel_spark.streaming.store_util import (  # noqa: E402
    COMPACT_EPOCH,
    write_epoch_partition,
)


def maintain_quantile_summary(
    stream: DataFrame, store_path: str, checkpoint: str, value_col: str = "value"
):
    """Start the maintenance query. foreachBatch is at-least-once (a
    batch can be replayed after a failure between the sink write and
    the checkpoint commit), so a blind append would double-count a
    replayed batch's weights; writing each batch into its OWN
    epoch=<id> partition with dynamic partition overwrite makes the
    replay idempotent — the rerun replaces exactly its partition
    (the same batches-own-their-pages contract as the streaming
    Timestream-wire writer)."""

    def update(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_epoch_partition(
            quantile_summary(batch_df, value_col), store_path, epoch_id
        )

    return (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _recompress_partition(batches):
    """The shared weighted fold (operators/sketches.compress_weighted)
    applied to already-weighted summary rows."""
    pairs: list[tuple[float, int]] = []
    for pdf in batches:
        pairs.extend(zip(pdf["v"].to_list(), pdf["w"].to_list()))
    if not pairs:
        return
    out_v, out_w = compress_weighted(pairs)
    yield pd.DataFrame({"v": out_v, "w": out_w})


def recompress_summary(spark: SparkSession, store_path: str) -> DataFrame:
    """Bound the store: fold the accumulated summaries back to
    ≤ SKETCH_SIZE × partitions rows (weights preserved exactly —
    the estimator's rank-error bound degrades by at most one extra
    compression step).

    Returns a LAZY plan still reading store_path — do NOT write it
    back onto store_path (read-while-overwrite corrupts the read);
    use `compact_summary_store` for in-place compaction."""
    return (
        spark.read.parquet(store_path)
        .repartition(1)
        .mapInPandas(_recompress_partition, _SUMMARY_SCHEMA)
    )


def compact_summary_store(spark: SparkSession, store_path: str) -> None:
    """In-place store compaction with the replay contract intact:

    1. recompress into a TEMP sibling path (the lazy recompress plan
       reads store_path, so writing onto store_path directly would
       read-while-overwrite);
    2. land the folded rows in the reserved epoch={COMPACT_EPOCH}
       partition, preserving the epoch-partition layout that
       maintain_quantile_summary's dynamic-overwrite replay
       idempotence depends on — a replayed batch epoch can only ever
       replace its OWN partition, never the compacted baseline;
    3. atomically swap temp → store (rename-rename-delete; on an
       object store run the same sequence through the Hadoop
       FileSystem API — rename is the contract, not POSIX).

    Safe to run between maintenance triggers; running it twice is a
    no-op fold of the already-compacted rows. Layout and swap
    contract shared via streaming/store_util."""
    from timestream_travel_spark.streaming.store_util import compact_epoch_store

    compact_epoch_store(
        spark,
        store_path,
        lambda df: df.repartition(1).mapInPandas(
            _recompress_partition, _SUMMARY_SCHEMA
        ),
    )
