"""Backup verification, incremental export, skew helpers, and
stream-static join tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timestream_travel_spark.operators.skew import salted_aggregate, salted_join
from timestream_travel_spark.pipeline.backup import BackupConfig, backup
from timestream_travel_spark.pipeline.restore import incremental_backup, verify_backup
from timestream_travel_spark.tables import load_table


def test_verify_backup_roundtrip(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "vb")
    ev = load_table(spark, sf_dir, "events")
    cfg = BackupConfig(
        dest=dest, time_from="2024-01-01 00:00:00", time_to="2024-01-31 00:00:00",
        rows_per_chunk=300, tiebreak_col="event_id",
    )
    manifest = backup(spark, ev, cfg)
    report = verify_backup(spark, dest, manifest).collect()
    assert report
    assert all(r["status"] == "ok" for r in report), [r for r in report if r["status"] != "ok"]


def test_verify_backup_detects_tampering(spark, sf_dir, tmp_path):
    import glob
    import os

    dest = str(tmp_path / "vt")
    ev = load_table(spark, sf_dir, "events")
    cfg = BackupConfig(
        dest=dest, time_from="2024-01-01 00:00:00", time_to="2024-01-31 00:00:00",
        rows_per_chunk=300, tiebreak_col="event_id",
    )
    manifest = backup(spark, ev, cfg).cache()
    manifest.count()
    victim = glob.glob(f"{dest}/__part=*/__date=*/*.json.gz")[0]
    os.remove(victim)
    report = verify_backup(spark, dest, manifest).collect()
    bad = [r for r in report if r["status"] != "ok"]
    assert bad, "deleted chunk went undetected"
    assert {r["status"] for r in bad} <= {"missing", "mismatch"}


def test_incremental_backup_exports_only_new_rows(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    cfg1 = BackupConfig(
        dest=str(tmp_path / "full"), time_from="2024-01-01 00:00:00",
        time_to="2024-01-15 00:00:00", tiebreak_col="event_id",
    )
    m1 = incremental_backup(spark, ev, cfg1, None).cache()
    n1 = m1.agg(F.sum("row_count")).collect()[0][0]

    cfg2 = BackupConfig(
        dest=str(tmp_path / "incr"), time_from="2024-01-01 00:00:00",
        time_to="2024-01-31 00:00:00", tiebreak_col="event_id",
    )
    m2 = incremental_backup(spark, ev, cfg2, m1).cache()
    n2 = m2.agg(F.sum("row_count")).collect()[0][0]

    total = ev.filter(F.col("ts").between("2024-01-01", "2024-01-31")).count()
    # manifest carries the epoch-us watermark → exactly-once across runs
    assert n1 + n2 == total


def test_incremental_backup_boundary_second_exact(spark, tmp_path):
    """Rows sharing the high-water second must not re-export: the
    watermark is epoch-us (max_ts_us), not the second-rendered
    max_ts. Fixture plants three rows inside one second straddling
    the first run's window edge."""
    from datetime import datetime

    rows = [
        ("a", 1, datetime(2024, 1, 1, 0, 0, 0, 500000)),
        ("a", 2, datetime(2024, 1, 1, 0, 0, 1, 100000)),
        ("a", 3, datetime(2024, 1, 1, 0, 0, 1, 400000)),  # run-1 max, mid-second
        ("a", 4, datetime(2024, 1, 1, 0, 0, 5, 0)),
    ]
    src = spark.createDataFrame(rows, "event_type string, event_id long, ts timestamp")
    cfg1 = BackupConfig(
        dest=str(tmp_path / "full"), time_from="2024-01-01 00:00:00",
        time_to="2024-01-01 00:00:02", tiebreak_col="event_id", partition_col="event_type",
    )
    m1 = incremental_backup(spark, src, cfg1, None).cache()
    assert m1.agg(F.sum("row_count")).collect()[0][0] == 3
    cfg2 = BackupConfig(
        dest=str(tmp_path / "incr"), time_from="2024-01-01 00:00:00",
        time_to="2024-01-01 00:00:10", tiebreak_col="event_id", partition_col="event_type",
    )
    m2 = incremental_backup(spark, src, cfg2, m1).cache()
    # only id 4 — with the old second-rendered watermark ("00:00:01"),
    # ids 2 and 3 would re-export (3 rows instead of 1)
    assert m2.agg(F.sum("row_count")).collect()[0][0] == 1


def test_incremental_backup_source_partition_column_survives(spark, tmp_path):
    """A source column literally named 'partition' must survive the
    watermark join (ADVICE: hwm columns now aliased __hwm_*)."""
    from datetime import datetime

    rows = [("a", 1, "keepme", datetime(2024, 1, 1, 0, 0, 1)),
            ("a", 2, "keepme2", datetime(2024, 1, 1, 0, 0, 20))]
    src = spark.createDataFrame(
        rows, "event_type string, event_id long, partition string, ts timestamp"
    )
    cfg1 = BackupConfig(
        dest=str(tmp_path / "f"), time_from="2024-01-01 00:00:00",
        time_to="2024-01-01 00:00:05", tiebreak_col="event_id", partition_col="event_type",
    )
    m1 = incremental_backup(spark, src, cfg1, None).cache()
    cfg2 = BackupConfig(
        dest=str(tmp_path / "i"), time_from="2024-01-01 00:00:00",
        time_to="2024-01-01 00:01:00", tiebreak_col="event_id", partition_col="event_type",
    )
    m2 = incremental_backup(spark, src, cfg2, m1)
    assert m2.agg(F.sum("row_count")).collect()[0][0] == 1
    # the exported NDJSON retains the user 'partition' column
    import glob
    import gzip
    import json

    files = glob.glob(str(tmp_path / "i") + "/__part=*/__date=*/*.json.gz")
    recs = [json.loads(line) for f in files for line in gzip.open(f, "rt")]
    assert recs and all("partition" in r for r in recs)
    assert {r["partition"] for r in recs} == {"keepme2"}


def test_verify_reference_layout_crc(spark, sf_dir, tmp_path):
    """Chunk-level CRC contract (cmd/backup.go:308-313): verify must
    pass on a pristine layout and fail after a single corrupted byte."""
    import glob

    from timestream_travel_spark.cli import main as cli_main
    from timestream_travel_spark.pipeline.reference_layout import backup_reference_layout
    from timestream_travel_spark.pipeline.restore import verify_reference_layout

    dest = str(tmp_path / "ref")
    ev = load_table(spark, sf_dir, "events")
    cfg = BackupConfig(
        dest=dest, time_from="2024-01-01 00:00:00", time_to="2024-01-15 00:00:00",
        rows_per_chunk=500, tiebreak_col="event_id",
    )
    keys = [r["key"] for r in backup_reference_layout(spark, ev, cfg, database="db", table="events").collect()]
    report = verify_reference_layout(spark, dest).cache()
    assert report.count() == len(keys)
    assert report.filter(report["status"] != "ok").count() == 0
    assert cli_main(["verify", "--dest", dest, "--layout"]) == 0
    # unpersist or the plan-matched cache would mask the corruption below
    report.unpersist()

    # flip one byte mid-payload of one chunk
    victim = sorted(glob.glob(dest + "/db/events/*/*/*.log.gz"))[0]
    blob = bytearray(open(victim, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(blob))

    bad = verify_reference_layout(spark, dest).filter(F.col("status") != "ok").collect()
    assert len(bad) == 1 and bad[0]["status"] == "crc_mismatch"
    assert cli_main(["verify", "--dest", dest, "--layout"]) == 1


def test_salted_aggregate_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_aggregate(
        li, ["l_returnflag"], {"l_quantity": "sum", "l_orderkey": "count"}
    ).collect()
    plain = (
        li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sum_l_quantity"), F.count("l_orderkey").alias("count_l_orderkey"))
        .collect()
    )
    s = {r["l_returnflag"]: (round(r["sum_l_quantity"], 6), r["count_l_orderkey"]) for r in salted}
    p = {r["l_returnflag"]: (round(r["sum_l_quantity"], 6), r["count_l_orderkey"]) for r in plain}
    assert s == p


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    salted = salted_join(li, od, "l_orderkey", "o_orderkey").groupBy("o_orderpriority").count()
    plain = li.join(od, li.l_orderkey == od.o_orderkey).groupBy("o_orderpriority").count()
    s = {r["o_orderpriority"]: r["count"] for r in salted.collect()}
    p = {r["o_orderpriority"]: r["count"] for r in plain.collect()}
    assert s == p


def _skewed_pair(spark):
    """300k-row fact where 95% of rows share key 7, plus a 1000-row
    dim — the classic hot-key join fixture."""
    large = spark.range(0, 300_000).select(
        F.when((F.col("id") % 100) < 95, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    small = spark.range(1000).select(F.col("id").alias("k2"), (F.col("id") * 3).alias("w"))
    return large, small


def test_aqe_skew_split_matches_salted_join(spark):
    """AQE's runtime skew-split and the explicit salted_join rewrite
    must agree with the plain join on a deliberately hot-keyed
    fixture; the AQE final plan must actually show the skew split
    (skew=true on the sort-merge join)."""
    large, small = _skewed_pair(spark)
    agg = lambda df: {  # noqa: E731
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")).collect()
    }

    plain = agg(large.join(small, large.k == small.k2))
    salted = agg(salted_join(large, small, "k", "k2"))
    assert salted == plain

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        # force SMJ + make the local fixture cross AQE's skew bar
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        joined = large.join(small, large.k == small.k2)
        assert agg(joined) == plain
        # global aggregate: a groupBy on the join key would let
        # Catalyst reuse the join's partitioning, which forbids the
        # skew split (splitting would break the required distribution)
        final_plan = joined.agg(
            F.count("*").alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
        )
        [row] = final_plan.collect()
        assert row["n"] == sum(n for n, _ in plain.values())
        assert row["s"] == sum(s for _, s in plain.values())
        plan_str = final_plan._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan_str, f"AQE did not skew-split:\n{plan_str[:2000]}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_rejects_small_side_preserving_modes(spark):
    large, small = _skewed_pair(spark)
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(large, small, "k", "k2", how=how)
    # left variants stay accepted
    assert salted_join(large, small, "k", "k2", how="left_semi").columns == ["k", "v"]


def test_stream_static_join(spark, sf_dir, tmp_path):
    """Stream-static enrichment: streaming events joined to a static
    dimension (user_id -> parity tag) — the standard streaming lookup
    pattern (B.10)."""
    from timestream_travel_spark.streaming.jobs import read_events_stream

    src = str(tmp_path / "ss_src")
    ev = load_table(spark, sf_dir, "events").limit(500)
    ev.coalesce(2).write.mode("overwrite").parquet(src)
    dim = spark.range(0, 20).select(
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("parity"),
    )
    stream = read_events_stream(spark, src)
    enriched = stream.join(F.broadcast(dim), "user_id", "left")
    q = (
        enriched.groupBy("parity")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName("ss_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["parity"]: r["n"] for r in spark.sql("SELECT * FROM ss_out").collect()}
    want = {
        r["parity"]: r["n"]
        for r in ev.join(dim, "user_id", "left").groupBy("parity").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_compact_parquet(spark, sf_dir, tmp_path):
    from timestream_travel_spark.pipeline.compact import compact_parquet

    src = str(tmp_path / "frag")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(40).write.mode("overwrite").parquet(src)  # fragment
    stats = compact_parquet(spark, src, str(tmp_path / "compacted"), target_file_mb=64)
    assert stats["rows"] == ev.count()
    assert stats["files_before"] == 40
    assert stats["files_after"] < 5


def test_bucketed_join_elides_shuffle(spark, sf_dir):
    """Both sides bucketed by the join key with equal bucket counts →
    the join plan has NO shuffle exchange (the shuffle was paid once
    at write time); results equal the plain join."""
    from timestream_travel_spark.pipeline.bucketing import bucketed_join, write_bucketed

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=8)
        write_bucketed(od, "b_orders", "o_orderkey", n_buckets=8)
        joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, f"bucketing did not elide the shuffle:\n{plan[:1500]}"

        got = {r["o_orderpriority"]: r["n"] for r in
               joined.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()}
        want = {r["o_orderpriority"]: r["n"] for r in
                li.join(od, li.l_orderkey == od.o_orderkey)
                .groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()}
        assert got == want
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_write_bucketed_orphan_scrub_is_scoped(spark, sf_dir):
    """The warehouse scrub fires ONLY for the true orphan case — a
    `spark-warehouse/<table>` dir the catalog does not know about
    (ADVICE r12): a planted orphan is cleared and the write succeeds;
    a catalog-known table overwrites without any rmtree (the sentinel
    we plant next to it survives, proving the scrub didn't run)."""
    import os

    from timestream_travel_spark.pipeline.bucketing import write_bucketed

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    tbl = "b_orphan_scrub"
    path = os.path.join(warehouse, tbl)
    try:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        # plant an orphan: dir exists, catalog doesn't know it
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "junk"), "w") as fh:
            fh.write("orphan")
        write_bucketed(li, tbl, "l_orderkey", n_buckets=4)
        assert spark.table(tbl).count() == li.count()
        assert not os.path.exists(os.path.join(path, "junk"))

        # catalog-known overwrite: the scrub must NOT run at all —
        # a recorded rmtree would mean the old unconditional clobber
        # (which raced a genuinely concurrent writer) is back
        import shutil

        calls: list[str] = []
        real_rmtree = shutil.rmtree
        shutil.rmtree = lambda p, **kw: calls.append(str(p))
        try:
            write_bucketed(li.limit(10), tbl, "l_orderkey", n_buckets=4)
        finally:
            shutil.rmtree = real_rmtree
        assert spark.table(tbl).count() == 10
        assert calls == []
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_incremental_backup_in_place_append(spark, sf_dir, tmp_path):
    """In-place increments: write_mode='append' lands strictly-newer
    rows into the SAME dest; old chunks stay byte-identical, the
    union of manifests reconciles the combined tree."""
    dest = str(tmp_path / "inplace")
    ev = load_table(spark, sf_dir, "events")
    cfg1 = BackupConfig(
        dest=dest, time_from="2024-01-01 00:00:00", time_to="2024-01-15 00:00:00",
        tiebreak_col="event_id",
    )
    m1 = incremental_backup(spark, ev, cfg1, None).cache()
    import glob
    import hashlib

    before = {
        f: hashlib.md5(open(f, "rb").read()).hexdigest()
        for f in glob.glob(f"{dest}/__part=*/__date=*/*.json.gz")
    }

    cfg2 = BackupConfig(
        dest=dest, time_from="2024-01-01 00:00:00", time_to="2024-01-31 00:00:00",
        tiebreak_col="event_id", write_mode="append",
    )
    m2 = incremental_backup(spark, ev, cfg2, m1).cache()

    # pre-existing files untouched by the append
    after = {
        f: hashlib.md5(open(f, "rb").read()).hexdigest()
        for f in glob.glob(f"{dest}/__part=*/__date=*/*.json.gz")
    }
    assert set(before) <= set(after)
    assert all(after[f] == h for f, h in before.items())

    total = ev.filter(F.col("ts").between("2024-01-01", "2024-01-31")).count()
    found = sum(
        1
        for f in after
        for _ in __import__("gzip").open(f, "rt")
    )
    assert found == total
    # combined manifest reconciles the combined tree
    report = verify_backup(spark, dest, m1.unionByName(m2)).collect()
    assert report and all(r["status"] == "ok" for r in report)
