"""File-stats manifest + manifest-pruned scan planning
(pipeline/skipping.py): pruning is observable (fewer files read),
exact (always equals the naive full-scan filter), invisible to
ordinary scans (_manifest is a hidden dir), and compounds with the
z-order layout on two-column box predicates."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from timestream_travel_spark.pipeline.skipping import (
    collect_file_stats,
    prune_files,
    pruned_read,
    read_manifest,
    verify_manifest,
    write_manifest,
)
from timestream_travel_spark.pipeline.zorder import write_linear, write_zordered


@pytest.fixture(scope="module")
def ts_store(spark, sf_dir, tmp_path_factory):
    """events laid out sorted by ts, 8 files, manifest on (ts,
    user_id, value)."""
    path = str(tmp_path_factory.mktemp("skip") / "events_by_ts")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n = ev.count()
    (
        ev.repartition(1)
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max(1, n // 8))
        .parquet(path)
    )
    write_manifest(spark, path, ["ts", "user_id", "value"])
    return path, n


def test_manifest_matches_footers_and_data(spark, ts_store):
    path, n = ts_store
    m = read_manifest(spark, path)
    stats = collect_file_stats(path, ["ts", "user_id", "value"])
    assert m.count() == len(stats) >= 8
    assert sum(s["row_count"] for s in stats) == n
    # footer stats agree with a from-the-data recompute, every file
    assert verify_manifest(spark, path, ["ts", "user_id", "value"]).count() == 0


def test_manifest_dir_invisible_to_plain_scans(spark, ts_store):
    path, n = ts_store
    # _manifest lives INSIDE the table dir yet a normal read sees
    # only the data (underscore-prefix convention)
    assert spark.read.parquet(path).count() == n


def test_ts_predicate_prunes_and_stays_exact(spark, ts_store):
    path, n = ts_store
    full = spark.read.parquet(path)
    total_files = len(full.inputFiles())
    lo, hi = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 12)
    conj = [("ts", "between", (lo, hi))]
    kept = prune_files(spark, path, conj)
    # a 2-day slice of a ~30-day ts-sorted store touches a strict
    # minority of files
    assert 0 < len(kept) < total_files / 2
    got = pruned_read(spark, path, conj)
    assert set(os.path.normpath(p.replace("file:", "")) for p in got.inputFiles()) <= {
        os.path.normpath(k) for k in kept
    }
    naive = full.filter(F.col("ts").between(F.lit(lo), F.lit(hi)))
    assert got.count() == naive.count() > 0
    # boundary-inclusive exactness: same rows, not just same count
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_unsorted_column_does_not_prune_but_stays_exact(spark, ts_store):
    path, _ = ts_store
    full = spark.read.parquet(path)
    conj = [("user_id", "=", 3)]
    kept = prune_files(spark, path, conj)
    # user_id is uncorrelated with the ts sort: every file's
    # [min,max] spans it → no files pruned (conservatism, not a bug)
    assert len(kept) == len(full.inputFiles())
    assert (
        pruned_read(spark, path, conj).count()
        == full.filter(F.col("user_id") == 3).count()
    )


def test_empty_survivor_set_returns_empty_with_schema(spark, ts_store):
    path, _ = ts_store
    conj = [("value", ">", 1e12)]
    assert prune_files(spark, path, conj) == []
    got = pruned_read(spark, path, conj)
    assert got.count() == 0
    assert got.columns == spark.read.parquet(path).columns


def test_conjunction_prunes_intersection(spark, ts_store):
    path, _ = ts_store
    lo, hi = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 12)
    both = prune_files(
        spark, path, [("ts", "between", (lo, hi)), ("value", ">", 1e12)]
    )
    assert both == []  # impossible value term kills every ts survivor


def test_zorder_manifest_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """The composition argument: z-order makes per-file (user_id, ts)
    boxes tight, so the SAME manifest machinery prunes on either
    dimension — while the ts-linear layout prunes only on ts."""
    from timestream_travel_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "lin")
    n_z = write_zordered(ev, zpath, "user_id", "ts", rows_per_file=120)
    n_l = write_linear(ev, lpath, "ts", rows_per_file=120)
    assert n_z >= 6 and n_l >= 6
    write_manifest(spark, zpath, ["user_id", "ts"])
    write_manifest(spark, lpath, ["user_id", "ts"])

    conj = [("user_id", "between", (2, 3))]
    z_kept = prune_files(spark, zpath, conj)
    l_kept = prune_files(spark, lpath, conj)
    # z-order: a 2-of-15 user band skips most files; linear-by-ts
    # layout cannot skip any
    assert len(z_kept) < n_z / 2
    assert len(l_kept) == n_l
    # and the z-ordered pruned read is still exact
    got = pruned_read(spark, zpath, conj)
    want = ev.filter(F.col("user_id").between(2, 3))
    assert got.count() == want.count() > 0


def test_update_manifest_incremental_append_and_delete(spark, tmp_path):
    import glob
    import shutil

    from timestream_travel_spark.pipeline.skipping import update_manifest

    path = str(tmp_path / "inc")
    spark.range(0, 300).withColumn("v", F.col("id") * 2).repartition(
        1
    ).sortWithinPartitions("id").write.mode("overwrite").option(
        "maxRecordsPerFile", 100
    ).parquet(path)
    # first call on a bare store == full build
    r0 = update_manifest(spark, path, ["id", "v"])
    assert r0["removed"] == 0 and r0["added"] == r0["total"] >= 3
    # append a new file out-of-band (the ingest pattern)
    extra = str(tmp_path / "extra")
    spark.range(1000, 1100).withColumn("v", F.col("id") * 2).coalesce(
        1
    ).write.mode("overwrite").parquet(extra)
    newf = glob.glob(os.path.join(extra, "*.parquet"))[0]
    dest = os.path.join(path, "part-appended.parquet")
    shutil.copy(newf, dest)
    r1 = update_manifest(spark, path, ["id", "v"])
    assert r1["added"] == 1 and r1["removed"] == 0 and r1["total"] == r0["total"] + 1
    # the appended file is findable through the manifest
    kept = prune_files(spark, path, [("id", ">=", 1000)])
    assert kept == [dest]
    assert pruned_read(spark, path, [("id", ">=", 1000)]).count() == 100
    # delete it (retention) → the row is dropped, not resurrected
    os.remove(dest)
    r2 = update_manifest(spark, path, ["id", "v"])
    assert r2["added"] == 0 and r2["removed"] == 1 and r2["total"] == r0["total"]
    assert prune_files(spark, path, [("id", ">=", 1000)]) == []
    assert verify_manifest(spark, path, ["id", "v"]).count() == 0


def test_manifest_cli_end_to_end(spark, sf_dir, tmp_path, capsys):
    from timestream_travel_spark.cli import main

    path = str(tmp_path / "cli_store")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ev.repartition(1).sortWithinPartitions("user_id").write.mode(
        "overwrite"
    ).option("maxRecordsPerFile", 150).parquet(path)
    assert main(["manifest", "build", "--table", path, "--cols", "user_id,value"]) == 0
    assert main(["manifest", "verify", "--table", path, "--cols", "user_id,value"]) == 0
    assert (
        main(["manifest", "prune", "--table", path, "--where", "user_id:=:3"]) == 0
    )
    kept_stdout = [
        line for line in capsys.readouterr().out.splitlines() if line.strip()
    ]
    total = len(spark.read.parquet(path).inputFiles())
    assert 0 < len(kept_stdout) < total  # user_id-sorted layout prunes
    assert main(["manifest", "update", "--table", path, "--cols", "user_id,value"]) == 0
    # missing --cols on build is a usage error, not a crash
    assert main(["manifest", "build", "--table", path]) == 2


def test_isnull_predicate_uses_null_counts(spark, tmp_path):
    path = str(tmp_path / "nullable")
    df = spark.range(0, 400).select(
        F.col("id"),
        F.when(F.col("id") < 100, None).otherwise(F.col("id")).alias("v"),
    )
    # id-sorted 4-file layout → nulls concentrate in file 1
    (
        df.repartition(1)
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 100)
        .parquet(path)
    )
    write_manifest(spark, path, ["id", "v"])
    kept = prune_files(spark, path, [("v", "isnull", None)])
    assert len(kept) == 1
    assert pruned_read(spark, path, [("v", "isnull", None)]).count() == 100
    # comparison predicates correctly skip the all-NULL-stats file
    kept_cmp = prune_files(spark, path, [("v", ">=", 0)])
    assert len(kept_cmp) == 3
    assert pruned_read(spark, path, [("v", ">=", 0)]).count() == 300


def test_partitioned_store_manifest_and_pruned_read(spark, sf_dir, tmp_path):
    """A hive-partitioned (key=value subdir) layout is a table too:
    the manifest recurses into it, pruned_read keeps the partition
    columns (basePath), and results stay exactly equal to the naive
    full-scan filter."""
    from timestream_travel_spark.tables import load_table

    path = str(tmp_path / "part_store")
    ev = load_table(spark, sf_dir, "events")
    (
        ev.withColumn("day", F.to_date("ts"))
        .repartition("day")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )
    write_manifest(spark, path, ["ts", "value"])
    stats = collect_file_stats(path, ["ts", "value"])
    assert len(stats) == read_manifest(spark, path).count() > 1
    full = spark.read.parquet(path)
    lo = full.agg(F.min("ts")).collect()[0][0]
    hi = lo + dt.timedelta(days=2)
    conj = [("ts", "between", (lo, hi))]
    kept = prune_files(spark, path, conj)
    assert 0 < len(kept) < len(full.inputFiles())
    got = pruned_read(spark, path, conj)
    assert set(got.columns) == set(full.columns)  # partition col kept
    naive = full.filter(F.col("ts").between(F.lit(lo), F.lit(hi)))
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0
    assert got.count() == naive.count() > 0
    # partition keys are not footer columns — naming one is a clear
    # error, not a KeyError from deep inside pyarrow
    with pytest.raises(ValueError, match="not data columns"):
        write_manifest(spark, path, ["day"])


def test_distributed_build_equals_driver_build(spark, sf_dir, tmp_path):
    """write_manifest(distributed=True) — binaryFile listing + Arrow
    executor-side footer reads — produces the identical manifest."""
    path = str(tmp_path / "dist_store")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    (
        ev.repartition(1)
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max(1, ev.count() // 6))
        .parquet(path)
    )
    write_manifest(spark, path, ["ts", "user_id"])
    driver_rows = sorted(map(tuple, read_manifest(spark, path).collect()))
    write_manifest(spark, path, ["ts", "user_id"], distributed=True)
    dist_rows = sorted(map(tuple, read_manifest(spark, path).collect()))
    assert dist_rows == driver_rows and len(dist_rows) >= 6


def test_statless_file_is_kept_not_pruned(spark, tmp_path):
    """A file written WITHOUT parquet statistics (foreign writer) has
    NULL manifest min/max — it must stay a 'may match' for comparison
    predicates (dropping it would violate pruned_read's exactness);
    a provably all-NULL file is still dropped."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    path = str(tmp_path / "mixed")
    os.makedirs(path)
    spark.createDataFrame([(i, float(i)) for i in range(100)], "id long, v double") \
        .coalesce(1).write.mode("append").parquet(path)
    # foreign file: no statistics, but rows that MATCH the predicate
    papq.write_table(
        pa.table({"id": pa.array([1000, 1001], pa.int64()),
                  "v": pa.array([9e6, 9e6 + 1], pa.float64())}),
        os.path.join(path, "foreign-no-stats.parquet"),
        write_statistics=False,
    )
    # all-NULL v file: provably cannot match any comparison
    papq.write_table(
        pa.table({"id": pa.array([2000, 2001], pa.int64()),
                  "v": pa.array([None, None], pa.float64())}),
        os.path.join(path, "all-null.parquet"),
    )
    write_manifest(spark, path, ["v"])
    m = {os.path.basename(r["file"]): r for r in read_manifest(spark, path).collect()}
    assert m["foreign-no-stats.parquet"]["min_v"] is None
    conj = [("v", ">", 1e6)]
    kept = [os.path.basename(p) for p in prune_files(spark, path, conj)]
    assert "foreign-no-stats.parquet" in kept       # may match → kept
    assert "all-null.parquet" not in kept           # provably NULL → dropped
    got = pruned_read(spark, path, conj)
    naive = spark.read.parquet(path).filter(F.col("v") > 1e6)
    assert got.count() == naive.count() == 2
    # isnull with unknown null_count keeps the stats-less file too
    kept_null = [os.path.basename(p) for p in prune_files(spark, path, [("v", "isnull", None)])]
    assert "all-null.parquet" in kept_null and "foreign-no-stats.parquet" in kept_null


def test_verify_manifest_reports_stale_rows(spark, tmp_path):
    """An orphan manifest row (file deleted out-of-band) is a
    verification FAILURE — otherwise a later pruned_read hands a
    nonexistent path to the scan."""
    import glob

    path = str(tmp_path / "stale")
    spark.range(0, 200).withColumn("v", F.col("id") * 3).repartition(
        1
    ).sortWithinPartitions("id").write.mode("overwrite").option(
        "maxRecordsPerFile", 50
    ).parquet(path)
    write_manifest(spark, path, ["id"])
    assert verify_manifest(spark, path, ["id"]).count() == 0
    victim = sorted(glob.glob(os.path.join(path, "*.parquet")))[0]
    os.remove(victim)
    bad = verify_manifest(spark, path, ["id"]).collect()
    assert [r["issue"] for r in bad] == ["stale_manifest_row"]
    assert bad[0]["file"] == victim
    # no .tmp/.old residue from the atomic swap path
    from timestream_travel_spark.pipeline.skipping import update_manifest
    update_manifest(spark, path, ["id"])
    assert verify_manifest(spark, path, ["id"]).count() == 0
    assert not os.path.exists(os.path.join(path, "_manifest.tmp"))
    assert not os.path.exists(os.path.join(path, "_manifest.old"))


def test_streaming_manifest_maintenance(spark, tmp_path):
    """foreachBatch twin: arrivals append to the table AND the
    manifest follows, so pruned_read plans over a current manifest
    without a rebuild."""
    from timestream_travel_spark.streaming.index_maintain import maintain_manifest

    src = str(tmp_path / "src")
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    spark.range(0, 300).withColumn("v", F.col("id") * 2).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = maintain_manifest(stream, table, ckpt, ["id", "v"])
    q.awaitTermination(120)
    m = read_manifest(spark, table)
    assert m.count() == len(spark.read.parquet(table).inputFiles())
    assert verify_manifest(spark, table, ["id", "v"]).count() == 0
    assert pruned_read(spark, table, [("id", ">=", 250)]).count() == 50
    # second wave of arrivals: incremental maintenance, still exact
    spark.range(1000, 1100).withColumn("v", F.col("id") * 2).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q2 = maintain_manifest(
        spark.readStream.schema(schema).parquet(src), table, ckpt, ["id", "v"]
    )
    q2.awaitTermination(120)
    assert pruned_read(spark, table, [("id", ">=", 1000)]).count() == 100
    assert verify_manifest(spark, table, ["id", "v"]).count() == 0


def test_verify_manifest_accepts_statless_files_flags_wrong_stats(spark, tmp_path):
    """A foreign stats-less file's NULL manifest stats are CORRECT
    conservative entries (verify must not flag them); a manifest row
    whose stored stats disagree with the data IS flagged."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    path = str(tmp_path / "vstat")
    os.makedirs(path)
    spark.createDataFrame([(i, float(i)) for i in range(50)], "id long, v double") \
        .coalesce(1).write.mode("append").parquet(path)
    papq.write_table(
        pa.table({"id": pa.array([100, 101], pa.int64()),
                  "v": pa.array([5.0, 6.0], pa.float64())}),
        os.path.join(path, "foreign.parquet"),
        write_statistics=False,
    )
    write_manifest(spark, path, ["v"])
    assert verify_manifest(spark, path, ["v"]).count() == 0
    # corrupt one stored stat out-of-band -> verification failure
    m = read_manifest(spark, path).collect()
    import pyspark.sql.functions as SF
    bad = spark.createDataFrame(m, read_manifest(spark, path).schema).withColumn(
        "min_v", SF.when(SF.col("min_v").isNotNull(), SF.col("min_v") + 1000.0)
    )
    from timestream_travel_spark.pipeline.skipping import _swap_in
    _swap_in(bad, os.path.join(path, "_manifest"))
    issues = verify_manifest(spark, path, ["v"]).collect()
    assert len(issues) == 1 and issues[0]["issue"] == "stats_mismatch"
    # an out-of-band append not yet manifested is also named
    papq.write_table(
        pa.table({"id": pa.array([200], pa.int64()),
                  "v": pa.array([7.0], pa.float64())}),
        os.path.join(path, "new-unmanifested.parquet"),
    )
    kinds = {r["issue"] for r in verify_manifest(spark, path, ["v"]).collect()}
    assert "unmanifested_file" in kinds


def test_verify_manifest_encoded_partition(spark, tmp_path):
    """Partition VALUES with colons/spaces (timestamp-valued keys):
    Spark's writer Hadoop-escapes them into the dir name itself
    (`k=03%3A00` ON DISK) and input_file_name() then percent-encodes
    that once more (%3A → %253A, space → %20). verify_manifest must
    decode its groupBy key back to the raw disk path the manifest
    stores, or every file is falsely stale+unmanifested. A literal
    '+' in the value must survive the decode (URLDecoder folds bare
    '+' to space)."""
    path = str(tmp_path / "enc")
    df = spark.createDataFrame(
        [(i, f"2024-01-0{1 + i % 2} 03:00:00+z") for i in range(40)],
        "id long, k string",
    )
    df.write.partitionBy("k").mode("overwrite").parquet(path)
    write_manifest(spark, path, ["id"])
    assert verify_manifest(spark, path, ["id"]).count() == 0
    # distributed build stores the same raw disk paths
    write_manifest(spark, path, ["id"], distributed=True)
    assert verify_manifest(spark, path, ["id"]).count() == 0
    # and pruning still plans + reads through the escaped dir names
    assert pruned_read(spark, path, [("id", ">=", 30)]).count() == 10
    from timestream_travel_spark.pipeline.skipping import update_manifest

    res = update_manifest(spark, path, ["id"])
    assert res["added"] == 0 and res["removed"] == 0


def test_verify_manifest_flags_null_stats_when_footer_has_them(spark, tmp_path):
    """A manifest row whose min/max are NULL while the file's FOOTER
    carries statistics (e.g. the file was rewritten in place by a
    stats-writing writer after a stats-less original was manifested)
    is a stats_mismatch — the r9 ADVICE gap: the old expression only
    flagged NULL-stored-vs-value for nulls_/row_count, and the footer
    re-read could only excuse suspects, never add one."""
    path = str(tmp_path / "nullstat")
    spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "id long, v double"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    write_manifest(spark, path, ["v"])
    assert verify_manifest(spark, path, ["v"]).count() == 0
    # blank the stored min/max out-of-band: footer still has stats
    m = read_manifest(spark, path)
    blanked = spark.createDataFrame(m.collect(), m.schema).withColumn(
        "min_v", F.lit(None).cast("double")
    ).withColumn("max_v", F.lit(None).cast("double"))
    from timestream_travel_spark.pipeline.skipping import _swap_in

    _swap_in(blanked, os.path.join(path, "_manifest"))
    issues = verify_manifest(spark, path, ["v"]).collect()
    assert [r["issue"] for r in issues] == ["stats_mismatch"]


def test_read_manifest_falls_back_to_old_during_swap_window(spark, tmp_path):
    """_swap_in's promote window (or a crash inside it) leaves only
    `_manifest.old`: read_manifest serves it in place, and
    update_manifest (the single writer) heals by promoting it back
    instead of rebuilding from scratch."""
    from timestream_travel_spark.pipeline.skipping import update_manifest

    path = str(tmp_path / "oldwin")
    spark.range(0, 60).withColumn("v", F.col("id") * 2).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    write_manifest(spark, path, ["id"])
    n = read_manifest(spark, path).count()
    mpath = os.path.join(path, "_manifest")
    os.replace(mpath, mpath + ".old")  # simulate the crash window
    assert read_manifest(spark, path).count() == n  # reader survives
    assert pruned_read(spark, path, [("id", ">=", 0)]).count() == 60
    res = update_manifest(spark, path, ["id"])  # writer heals
    assert os.path.isdir(mpath) and not os.path.isdir(mpath + ".old")
    assert res["added"] == 0 and res["total"] == n


def test_streaming_manifest_replay_is_exactly_once(spark, tmp_path):
    """A replayed foreachBatch epoch (crash after the data append,
    before the checkpoint commit) must NOT duplicate the batch's rows
    — the data table has no read-time dedup key to fall back on. The
    per-epoch staged-rename commit makes the replay a no-op."""
    from timestream_travel_spark.streaming.index_maintain import (
        _commit_batch_exactly_once,
    )

    table = str(tmp_path / "eonce")
    batch = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    assert _commit_batch_exactly_once(batch, table, epoch_id=0) is True
    assert _commit_batch_exactly_once(batch, table, epoch_id=0) is False
    assert spark.read.parquet(table).count() == 100  # not 200
    # a half-moved crash (marker missing, some epoch files present)
    # is healed by the retry, still without duplication
    import glob

    marker = os.path.join(table, "_epoch-1.committed")
    assert _commit_batch_exactly_once(batch, table, epoch_id=1) is True
    os.remove(marker)  # simulate crash before the marker write
    assert _commit_batch_exactly_once(batch, table, epoch_id=1) is True
    assert spark.read.parquet(table).count() == 200
    assert len(glob.glob(os.path.join(table, "part-epoch1-*"))) > 0
