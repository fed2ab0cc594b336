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
store to a consistent state from any crash point. The crash window
is disambiguated by the TMP dir, not by store-path presence: a
foreachBatch write interleaved with a crashed swap recreates the
store path, so "store exists" does not imply the swap completed —
but tmp still existing proves the second rename never ran. Epoch
partitions an interleaved write left in the recreated store are
folded back into the surviving history (replacing same-epoch dirs —
exactly the at-least-once replay contract) before the restore.

Replay-after-fold safety: the baseline carries a `_folded_through`
file (max real epoch folded into it; the leading underscore keeps it
invisible to Spark's file index). `write_epoch_partition` drops a
batch whose epoch is ≤ that watermark — its rows are already in the
baseline, so the replay is a no-op instead of a double count. The
file lives INSIDE the swapped directory, so it is atomic with the
baseline it describes.

Operating envelope: a single concurrent writer is safe against a
compaction crash at ANY point — an interleaved epoch write lands
either in the recreated store path (merged back by recovery) or in
the superseded `old` copy (epoch dirs newer than the folded
watermark are rescued before `old` is deleted). Concurrent
compactions, or multiple writers racing the SAME epoch, remain out
of scope.
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
    "folded_through",
    "recover_epoch_store",
    "write_epoch_partition",
]

COMPACT_EPOCH = -1
_FOLDED_FILE = "_folded_through"


def folded_through(store_path: str) -> int | None:
    """Max real epoch folded into the store's baseline, or None when
    the store was never compacted."""
    try:
        with open(os.path.join(store_path, _FOLDED_FILE)) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return None


def write_epoch_partition(df: DataFrame, store_path: str, epoch_id: int) -> None:
    """THE append-side of the contract: land this batch's rows in
    their own epoch=<batchId> partition with dynamic partition
    overwrite, so an at-least-once foreachBatch replay replaces
    exactly its partition. A replay of an epoch already folded into
    the baseline (epoch ≤ `_folded_through`) is a no-op — the rows
    are in the baseline; re-adding them would double-count. Every
    epoch store appends through here — one place to change
    committer/object-store behavior."""
    ft = folded_through(store_path)
    if ft is not None and epoch_id <= ft:
        return
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


def _epoch_dirs(path: str) -> list[tuple[int, str]]:
    out = []
    for name in os.listdir(path):
        if name.startswith("epoch="):
            try:
                out.append((int(name.split("=", 1)[1]), name))
            except ValueError:
                continue
    return out


def _merge_epoch_dirs(src: str, dst: str, min_epoch: int | None = None) -> None:
    """Move epoch partition dirs from src into dst, replacing
    same-epoch dirs (at-least-once replay semantics). When min_epoch
    is given, only epochs strictly greater move (the rest are
    already represented in dst's baseline)."""
    for eid, name in _epoch_dirs(src):
        if eid == COMPACT_EPOCH:
            continue
        if min_epoch is not None and eid <= min_epoch:
            continue
        target = os.path.join(dst, name)
        shutil.rmtree(target, ignore_errors=True)
        os.rename(os.path.join(src, name), target)


def recover_epoch_store(store_path: str) -> None:
    """Roll a store to a consistent state after a crash mid-swap.
    Idempotent; a no-op when no swap was pending. Keyed on the tmp
    dir, not store presence: an interleaved foreachBatch write can
    recreate the store path mid-crash, and treating that as a
    completed swap would delete the only surviving history."""
    tmp, old, marker = _paths(store_path)
    if not os.path.exists(marker):
        return
    if os.path.exists(tmp):
        # pre-swap crash: the second rename (tmp→store) never ran.
        # `old` (when present) is the true store; fold any epoch
        # partitions an interleaved write left at the store path
        # back into it, then restore.
        if os.path.exists(old):
            if os.path.exists(store_path):
                _merge_epoch_dirs(store_path, old)
                shutil.rmtree(store_path)
            os.rename(old, store_path)
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        # the swap completed; `old` is superseded — but rescue any
        # epoch written into it after the fold's read (newer than
        # the new baseline's watermark) before dropping it. A
        # baseline WITHOUT a watermark (pre-watermark layout) can't
        # tell folded epochs from late ones, so nothing is rescued —
        # exactly the old behavior that layout's quiescence
        # requirement assumed.
        if os.path.exists(old):
            ft = folded_through(store_path)
            if ft is not None:
                _merge_epoch_dirs(old, store_path, min_epoch=ft)
            shutil.rmtree(old, ignore_errors=True)
    os.remove(marker)


def compact_epoch_store(
    spark: SparkSession,
    store_path: str,
    fold: Callable[[DataFrame], DataFrame],
) -> None:
    """Fold the live store (all epochs) with `fold` — which must be
    merge-equivalent (folding then reading ≡ reading the unfolded
    store) — and swap the folded rows in as the new baseline.

    The file listing is pinned at read time, so `folded_max` is
    exactly the set of epochs the fold saw; an epoch written while
    the fold runs lands in the pre-swap store dir, travels to `old`
    with the first rename, and is rescued back into the new store
    (it is > folded_max) before `old` is deleted."""
    recover_epoch_store(store_path)
    tmp, old, marker = _paths(store_path)
    shutil.rmtree(tmp, ignore_errors=True)
    live = spark.read.parquet(store_path)
    folded_max = live.agg(F.max("epoch")).first()[0]
    prev = folded_through(store_path)
    watermark = max(
        folded_max if folded_max is not None else COMPACT_EPOCH,
        prev if prev is not None else COMPACT_EPOCH,
    )
    (
        fold(live)
        .withColumn("epoch", F.lit(COMPACT_EPOCH))
        .write.mode("overwrite")
        .partitionBy("epoch")
        .parquet(tmp)
    )
    with open(os.path.join(tmp, _FOLDED_FILE), "w") as fh:
        fh.write(str(watermark))
    with open(marker, "w"):
        pass
    os.rename(store_path, old)
    os.rename(tmp, store_path)
    _merge_epoch_dirs(old, store_path, min_epoch=watermark)
    shutil.rmtree(old)
    os.remove(marker)
