"""Shared epoch-store compaction: fold an epoch-partitioned
append-store into the reserved epoch={COMPACT_EPOCH} partition via a
crash-recoverable temp-and-swap.

The contract every epoch store in this package shares
(streaming/quantiles, streaming/hll, streaming/rollup_maintain,
streaming/late_audit's HWM store): each foreachBatch writes its rows
into its OWN epoch=<batchId> partition with dynamic partition
overwrite, so an at-least-once replay replaces exactly its
partition. Compaction must preserve that layout — folded rows land
in epoch={COMPACT_EPOCH} (-1; no real batchId is negative, so no
replay can ever clobber the baseline) — and must never write onto a
path a lazy plan is still reading, hence temp-write then swap.

Crash safety: the swap is two renames (store→old, tmp→store), which
cannot be atomic together, so a `<store>.__swap_pending` marker
brackets the window and `recover_epoch_store` (run automatically at
the start of every compaction, callable at any startup) rolls the
store to a consistent state from any crash point:

  marker + store missing + old present → crash between the renames:
      rename old back into place, drop the stale tmp;
  marker + store present            → crash after the second rename:
      the swap completed, drop the old copy and the marker.

Without the marker, `old` from a crash is indistinguishable from a
completed swap's leftover, and the next compaction's cleanup would
silently delete the only surviving history.

Operating envelope (unchanged): run compaction only while the store
is quiescent — no stream with a written-but-uncommitted batch — or
a replayed epoch that was already folded would re-add itself beside
the baseline.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "COMPACT_EPOCH",
    "compact_epoch_store",
    "recover_epoch_store",
    "write_epoch_partition",
]

COMPACT_EPOCH = -1


def write_epoch_partition(df: DataFrame, store_path: str, epoch_id: int) -> None:
    """THE append-side of the contract: land this batch's rows in
    their own epoch=<batchId> partition with dynamic partition
    overwrite, so an at-least-once foreachBatch replay replaces
    exactly its partition. Every epoch store appends through here —
    one place to change committer/object-store behavior."""
    (
        df.withColumn("epoch", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(store_path)
    )


def _paths(store_path: str) -> tuple[str, str, str]:
    base = store_path.rstrip("/")
    return base + ".__compact_tmp", base + ".__compact_old", base + ".__swap_pending"


def recover_epoch_store(store_path: str) -> None:
    """Roll a store to a consistent state after a crash mid-swap.
    Idempotent; a no-op when no swap was pending."""
    tmp, old, marker = _paths(store_path)
    if not os.path.exists(marker):
        return
    if not os.path.exists(store_path) and os.path.exists(old):
        # died between the renames — the original store IS `old`
        os.rename(old, store_path)
    # swap either completed (store present, old is the superseded
    # copy) or was just rolled back above — clear the leftovers
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    os.remove(marker)


def compact_epoch_store(
    spark: SparkSession,
    store_path: str,
    fold: Callable[[DataFrame], DataFrame],
) -> None:
    """Fold the live store (all epochs) with `fold` — which must be
    merge-equivalent (folding then reading ≡ reading the unfolded
    store) — and swap the folded rows in as the new baseline."""
    recover_epoch_store(store_path)
    tmp, old, marker = _paths(store_path)
    shutil.rmtree(tmp, ignore_errors=True)
    (
        fold(spark.read.parquet(store_path))
        .withColumn("epoch", F.lit(COMPACT_EPOCH))
        .write.mode("overwrite")
        .partitionBy("epoch")
        .parquet(tmp)
    )
    with open(marker, "w"):
        pass
    os.rename(store_path, old)
    os.rename(tmp, store_path)
    shutil.rmtree(old)
    os.remove(marker)
