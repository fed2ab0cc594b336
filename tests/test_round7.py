"""Round-7 tests: epoch-store compaction vs interleaved writes
(the r6 verdict's adversarial-concurrency gap), and the late-audit
CLI closure."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from timestream_travel_spark.streaming.store_util import (
    COMPACT_EPOCH,
    _FOLDED_FILE,
    compact_epoch_store,
    folded_through,
    recover_epoch_store,
    write_epoch_partition,
)


def _epoch_rows(spark, e, n=10):
    return spark.range(n).select((F.col("id") + 100 * e).alias("v"))


def _build(spark, path, epochs=(0, 1, 2)):
    for e in epochs:
        write_epoch_partition(_epoch_rows(spark, e), path, e)


def _totals(spark, path):
    r = (
        spark.read.parquet(path)
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()[0]
    )
    return (r["n"], r["s"])


def _fold(df):
    return df.select("v")  # identity fold (keeps rows; merge-equivalent)


def _swap_paths(store):
    return (
        store + ".__compact_tmp",
        store + ".__compact_old",
        store + ".__swap_pending",
    )


def test_folded_through_skips_replayed_epoch(spark, tmp_path):
    """After compaction the baseline carries _folded_through; a
    replayed write of an already-folded epoch is a no-op (not a
    double count), while a genuinely new epoch still lands — and a
    later write does not clobber the watermark file."""
    store = str(tmp_path / "store_ft")
    _build(spark, store)
    before = _totals(spark, store)
    compact_epoch_store(spark, store, _fold)
    assert folded_through(store) == 2
    assert _totals(spark, store) == before

    # at-least-once replay of folded epoch 1: dropped
    write_epoch_partition(_epoch_rows(spark, 1), store, 1)
    assert _totals(spark, store) == before
    assert [r["epoch"] for r in spark.read.parquet(store).select("epoch").distinct().collect()] == [
        COMPACT_EPOCH
    ]

    # new epoch 3 lands beside the baseline, watermark file survives
    # the dynamic-partition-overwrite write
    write_epoch_partition(_epoch_rows(spark, 3), store, 3)
    assert folded_through(store) == 2
    assert _totals(spark, store) == (before[0] + 10, before[1] + sum(range(300, 310)))

    # second compaction folds epoch 3 and advances the watermark
    compact_epoch_store(spark, store, _fold)
    assert folded_through(store) == 3
    write_epoch_partition(_epoch_rows(spark, 3), store, 3)  # replay: no-op
    assert _totals(spark, store) == (before[0] + 10, before[1] + sum(range(300, 310)))


def test_interleaved_write_crash_between_renames(spark, tmp_path):
    """Crash window A (store renamed away, tmp not yet swapped in)
    with a foreachBatch write interleaved AFTER the crash: the write
    recreates the store path, which must NOT be mistaken for a
    completed swap (that would rmtree the only history). Recovery
    merges the interleaved epoch back and restores `old`."""
    store = str(tmp_path / "store_crashA")
    _build(spark, store)
    before = _totals(spark, store)
    tmp, old, marker = _swap_paths(store)
    _fold(spark.read.parquet(store)).withColumn(
        "epoch", F.lit(COMPACT_EPOCH)
    ).write.partitionBy("epoch").parquet(tmp)
    with open(os.path.join(tmp, _FOLDED_FILE), "w") as fh:
        fh.write("2")
    open(marker, "w").close()
    os.rename(store, old)  # ← crash here, between the renames

    # interleaved single-writer activity: a replay of epoch 2 (the
    # recreated store has no watermark yet, so it writes) and a brand
    # new epoch 3 both land at the recreated store path
    write_epoch_partition(_epoch_rows(spark, 2), store, 2)
    write_epoch_partition(_epoch_rows(spark, 3), store, 3)

    recover_epoch_store(store)
    # history intact, replayed epoch 2 replaced (same rows), epoch 3
    # merged in; no leftovers
    assert _totals(spark, store) == (before[0] + 10, before[1] + sum(range(300, 310)))
    assert sorted(
        r["epoch"] for r in spark.read.parquet(store).select("epoch").distinct().collect()
    ) == [0, 1, 2, 3]
    assert not os.path.exists(old) and not os.path.exists(tmp)
    assert not os.path.exists(marker)
    shutil.rmtree(store, ignore_errors=True)


def test_interleaved_write_crash_after_swap(spark, tmp_path):
    """Crash window B (swap done, cleanup pending) with interleaved
    writes: a replayed folded epoch is dropped by the baseline's
    watermark, a new epoch lands in the new store, and an epoch that
    had landed in `old` after the fold's read (concurrent with the
    compaction) is rescued — not deleted with `old`."""
    store = str(tmp_path / "store_crashB")
    _build(spark, store)
    before = _totals(spark, store)
    tmp, old, marker = _swap_paths(store)
    _fold(spark.read.parquet(store)).withColumn(
        "epoch", F.lit(COMPACT_EPOCH)
    ).write.partitionBy("epoch").parquet(tmp)
    with open(os.path.join(tmp, _FOLDED_FILE), "w") as fh:
        fh.write("2")
    open(marker, "w").close()
    os.rename(store, old)
    # concurrent writer raced the swap: its epoch-3 batch landed in
    # the pre-swap dir, which is now `old`
    write_epoch_partition(_epoch_rows(spark, 3), old, 3)
    os.rename(tmp, store)  # ← crash here (old + marker left behind)

    # post-crash interleaved writes against the new store path
    write_epoch_partition(_epoch_rows(spark, 1), store, 1)  # folded replay: no-op
    write_epoch_partition(_epoch_rows(spark, 4), store, 4)  # new epoch: lands

    recover_epoch_store(store)
    assert _totals(spark, store) == (
        before[0] + 20,
        before[1] + sum(range(300, 310)) + sum(range(400, 410)),
    )
    assert sorted(
        r["epoch"] for r in spark.read.parquet(store).select("epoch").distinct().collect()
    ) == [COMPACT_EPOCH, 3, 4]
    assert not os.path.exists(old) and not os.path.exists(marker)
    shutil.rmtree(store, ignore_errors=True)


def test_compact_rescues_epoch_written_during_fold(spark, tmp_path):
    """No crash at all: an epoch written while compact_epoch_store's
    fold is executing misses the (already-pinned) file listing, rides
    the first rename into `old`, and must be rescued into the new
    baseline's store rather than deleted with `old`."""
    store = str(tmp_path / "store_race")
    _build(spark, store)
    before = _totals(spark, store)

    def racing_fold(df):
        # deterministic stand-in for a concurrent writer: the write
        # happens after spark.read.parquet pinned its file listing,
        # so the fold does NOT see epoch 3
        write_epoch_partition(_epoch_rows(spark, 3), store, 3)
        return _fold(df)

    compact_epoch_store(spark, store, racing_fold)
    assert folded_through(store) == 2  # epoch 3 was not folded...
    assert sorted(
        r["epoch"] for r in spark.read.parquet(store).select("epoch").distinct().collect()
    ) == [COMPACT_EPOCH, 3]  # ...but it survived the swap
    assert _totals(spark, store) == (before[0] + 10, before[1] + sum(range(300, 310)))
    # and the next compaction folds it in
    compact_epoch_store(spark, store, _fold)
    assert folded_through(store) == 3
    assert _totals(spark, store) == (before[0] + 10, before[1] + sum(range(300, 310)))
    shutil.rmtree(store, ignore_errors=True)


def test_late_audit_cli_end_to_end(spark, sf_dir, tmp_path, caplog):
    """The detect -> name -> repair story drivable from the shell:
    `late-audit route` splits an out-of-order backlog, `report` names
    the drifted hours, `suggest-grace` tunes the interval, and
    `rollup --repair` closes the loop — all through cli.main."""
    import logging

    from timestream_travel_spark.cli import main as cli_main
    from timestream_travel_spark.pipeline.rollup import build_rollup
    from timestream_travel_spark.streaming.late_audit import late_hours
    from timestream_travel_spark.tables import load_table

    # interleaved buckets make the one-file-per-batch drain arrive
    # out of event-time order -> guaranteed stragglers
    src = str(tmp_path / "ev_src")
    ev = load_table(spark, sf_dir, "events")
    ev.withColumn("bucket", (F.col("event_id") % 4).cast("int")).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(src)

    dest = str(tmp_path / "main")
    quarantine = str(tmp_path / "quarantine")
    route = [
        "late-audit", "route",
        "--source", f"{src}/bucket=*",
        "--dest", dest,
        "--quarantine", quarantine,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--files-per-batch", "1",
    ]
    assert cli_main(route) == 0
    main_df = spark.read.parquet(dest)
    late_df = spark.read.parquet(quarantine)
    assert main_df.count() + late_df.count() == ev.count()
    assert late_df.count() > 0

    with caplog.at_level(logging.INFO):
        assert cli_main(["late-audit", "report", "--quarantine", quarantine]) == 0
    hours = late_hours(spark, quarantine)
    assert f"{len(hours)} drifted hour(s)" in caplog.text
    assert "stragglers=" in caplog.text

    caplog.clear()
    with caplog.at_level(logging.INFO):
        assert cli_main(["late-audit", "suggest-grace", "--quarantine", quarantine]) == 0
    assert "suggested grace" in caplog.text and "SECONDS" in caplog.text

    # close the loop from the shell: a rollup built over the on-time
    # store has drifted (late rows are missing); repair rebuilds the
    # drifted hours from the FULL source
    rollup_dest = str(tmp_path / "rollup")
    build_rollup(spark, main_df.drop("__hour", "bucket"), rollup_dest)
    full_src = str(tmp_path / "ev_full")
    main_df.drop("__hour", "bucket").unionByName(
        late_df.drop("__hour", "observed_hwm", "bucket")
    ).write.mode("overwrite").parquet(full_src)
    assert (
        cli_main(["rollup", "--repair", "--source", full_src, "--dest", rollup_dest])
        == 0
    )
    # after repair the rollup matches a clean full build's totals
    clean = str(tmp_path / "rollup_clean")
    build_rollup(spark, spark.read.parquet(full_src), clean)
    got = spark.read.parquet(rollup_dest).agg(F.sum("n_events")).collect()[0][0]
    want = spark.read.parquet(clean).agg(F.sum("n_events")).collect()[0][0]
    assert got == want

    # report on an empty/never-created quarantine is a clean exit
    assert cli_main(["late-audit", "report", "--quarantine", str(tmp_path / "nope")]) == 0
