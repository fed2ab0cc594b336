"""Shared epoch-store compaction: fold an epoch-partitioned
append-store into the reserved epoch={COMPACT_EPOCH} partition via
temp-and-swap.

The contract every epoch store in this package shares
(streaming/quantiles, streaming/hll, streaming/rollup_maintain):
each foreachBatch writes its rows into its OWN epoch=<batchId>
partition with dynamic partition overwrite, so an at-least-once
replay replaces exactly its partition. Compaction must preserve that
layout — folded rows land in epoch={COMPACT_EPOCH} (-1; no real
batchId is negative, so no replay can ever clobber the baseline) —
and must never write onto a path a lazy plan is still reading, hence
the temp-write then rename-rename-delete swap. On an object store,
run the same sequence through the Hadoop FileSystem API — rename is
the contract, not POSIX.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["COMPACT_EPOCH", "compact_epoch_store"]

COMPACT_EPOCH = -1


def compact_epoch_store(
    spark: SparkSession,
    store_path: str,
    fold: Callable[[DataFrame], DataFrame],
) -> None:
    """Fold the live store (all epochs) with `fold` — which must be
    merge-equivalent (folding then reading ≡ reading the unfolded
    store) — and swap the folded rows in as the new baseline."""
    tmp = store_path.rstrip("/") + ".__compact_tmp"
    old = store_path.rstrip("/") + ".__compact_old"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        fold(spark.read.parquet(store_path))
        .withColumn("epoch", F.lit(COMPACT_EPOCH))
        .write.mode("overwrite")
        .partitionBy("epoch")
        .parquet(tmp)
    )
    shutil.rmtree(old, ignore_errors=True)
    os.rename(store_path, old)
    os.rename(tmp, store_path)
    shutil.rmtree(old)
