"""Scheduled-rollup materialization + retention enforcement: the
incremental refresh converges to the from-scratch rollup, daily
aggregates derive exactly from the hourly rollup, replays are
idempotent, and retention drops exactly the expired partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from timestream_travel_spark.tables import load_table

CUT = "2024-01-20 00:00:00"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_refresh_converges_to_full_rebuild(spark, sf_dir, tmp_path):
    from timestream_travel_spark.pipeline.rollup import (
        build_rollup,
        refresh_rollup,
        rollup_hwm,
    )

    ev = load_table(spark, sf_dir, "events")
    dest = str(tmp_path / "rollup")
    # day 1..19 ingested, rollup built
    build_rollup(spark, ev.filter(F.col("ts") < CUT), dest)
    hwm1 = rollup_hwm(spark, dest)
    assert hwm1 is not None and hwm1 < CUT
    # the rest of the stream arrives; refresh recomputes only the tail
    n = refresh_rollup(spark, ev, dest)
    assert n >= 1
    # refreshed rollup == from-scratch rollup over all data
    full_dest = str(tmp_path / "rollup_full")
    build_rollup(spark, ev, full_dest)
    assert _canon(spark.read.parquet(dest)) == _canon(spark.read.parquet(full_dest))
    # idempotent: re-running the refresh changes nothing (dynamic
    # overwrite replaces partitions with identical content)
    refresh_rollup(spark, ev, dest)
    assert _canon(spark.read.parquet(dest)) == _canon(spark.read.parquet(full_dest))


def test_daily_from_hourly_matches_direct_daily(spark, sf_dir, tmp_path):
    from timestream_travel_spark.pipeline.rollup import build_rollup, daily_from_hourly

    ev = load_table(spark, sf_dir, "events")
    dest = str(tmp_path / "rollup")
    build_rollup(spark, ev, dest)
    via_rollup = _canon(daily_from_hourly(spark, dest))
    direct = _canon(
        ev.groupBy(
            "event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    assert via_rollup == direct  # DECIMAL sums re-aggregate exactly


def test_retention_drops_only_expired_partitions(spark, sf_dir, tmp_path):
    from timestream_travel_spark.pipeline.backup import BackupConfig, backup
    from timestream_travel_spark.pipeline.retention import (
        enforce_retention,
        list_date_partitions,
    )

    dest = str(tmp_path / "bk")
    ev = load_table(spark, sf_dir, "events")
    cfg = BackupConfig(
        dest=dest,
        time_from="2024-01-01 00:00:00",
        time_to="2024-01-15 00:00:00",
        rows_per_chunk=500,
        tiebreak_col="event_id",
    )
    backup(spark, ev, cfg)
    before = list_date_partitions(spark, dest)
    assert len(before) >= 10
    keep_from = sorted(before)[5]
    # dry run touches nothing
    plan = enforce_retention(spark, dest, keep_from, dry_run=True)
    assert sorted(plan) == sorted(d for d in before if d < keep_from)
    assert list_date_partitions(spark, dest) == before
    # real run drops exactly the expired dates
    done = enforce_retention(spark, dest, keep_from)
    assert done == plan
    after = list_date_partitions(spark, dest)
    assert sorted(after) == sorted(d for d in before if d >= keep_from)
    # the surviving backup is still readable NDJSON
    rows = spark.read.json(f"{dest}/__part=*/__date=*/*.json.gz")
    assert rows.count() > 0


def test_rollup_cli_build_and_refresh(spark, sf_dir, tmp_path):
    from timestream_travel_spark.cli import main as cli_main
    from timestream_travel_spark.pipeline.rollup import rollup_hwm

    dest = str(tmp_path / "ru")
    src = f"{sf_dir}/events.parquet"
    assert cli_main(["rollup", "--source", src, "--dest", dest]) == 0
    h1 = rollup_hwm(spark, dest)
    assert cli_main(["rollup", "--source", src, "--dest", dest, "--refresh"]) == 0
    assert rollup_hwm(spark, dest) == h1  # same data → same HWM
    assert spark.read.parquet(dest).count() > 0


def test_retention_rejects_bad_date(spark, tmp_path):
    import pytest

    from timestream_travel_spark.pipeline.retention import enforce_retention

    with pytest.raises(ValueError, match="yyyyMMdd"):
        enforce_retention(spark, str(tmp_path), "2024-01-01")
