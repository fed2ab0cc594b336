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
    # refreshed rollup == from-scratch rollup over all data (sketch
    # bytes may serialize differently per partition layout — compare
    # the exact columns byte-exact, the sketch via its estimate)
    full_dest = str(tmp_path / "rollup_full")
    build_rollup(spark, ev, full_dest)

    def canon_est(path):
        return _canon(
            spark.read.parquet(path).select(
                "event_type",
                F.col("__hour").cast("string"),
                "n_events",
                "sum_value",
                "min_value",
                "max_value",
                "n_users",
                F.round(F.hll_sketch_estimate("users_sk"), 0).cast("bigint"),
            )
        )

    assert canon_est(dest) == canon_est(full_dest)
    # idempotent: re-running the refresh changes nothing (dynamic
    # overwrite replaces partitions with identical content)
    refresh_rollup(spark, ev, dest)
    assert canon_est(dest) == canon_est(full_dest)


def test_daily_from_hourly_matches_direct_daily(spark, sf_dir, tmp_path):
    from timestream_travel_spark.pipeline.rollup import build_rollup, daily_from_hourly

    ev = load_table(spark, sf_dir, "events")
    dest = str(tmp_path / "rollup")
    build_rollup(spark, ev, dest)
    daily = daily_from_hourly(spark, dest)
    via_rollup = _canon(daily.drop("n_users_est"))
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
    # the mergeable-HLL column answers daily distincts from hourly
    # sketches within the lgK=12 error bound (exact distincts do NOT
    # re-aggregate — that's why the sketch rides in the rollup)
    exact = {
        (r["event_type"], r["day"]): r["n"]
        for r in ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in daily.collect():
        ex = exact[(r["event_type"], r["day"])]
        assert abs(r["n_users_est"] - ex) <= max(3, 0.05 * ex), (r, ex)


def test_daily_from_hourly_on_pre_sketch_store(spark, sf_dir, tmp_path):
    """Schema migration: a rollup whose old partitions predate the
    users_sk column still reads (mergeSchema), sketched days estimate,
    and fully-unsketched days report NULL — never the empty-union 0."""
    from timestream_travel_spark.pipeline.rollup import (
        _hourly,
        daily_from_hourly,
        refresh_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    dest = str(tmp_path / "rollup_old")
    # simulate the pre-sketch release: build without users_sk
    (
        _hourly(ev.filter(F.col("ts") < CUT))
        .drop("users_sk")
        .repartition("__hour")
        .write.mode("overwrite")
        .partitionBy("__hour")
        .parquet(dest)
    )
    # current release refreshes only the tail → mixed-schema store
    refresh_rollup(spark, ev, dest)
    daily = {r["day"]: r["n_users_est"] for r in daily_from_hourly(spark, dest).collect()}
    pre_days = sorted(d for d in daily if d < CUT[:10])
    post_days = sorted(d for d in daily if d >= CUT[:10])
    assert pre_days and post_days
    # any day with an unsketched hour → honest NULL, never a partial
    # undercount; this includes the HWM boundary day, which the
    # refresh re-sketched only partially
    for d in pre_days:
        assert daily[d] is None, (d, daily[d])
    for d in post_days:  # fully refreshed days carry sketches
        assert daily[d] is not None and daily[d] > 0, (d, daily[d])
    # an entirely pre-sketch store also reads (users_sk in no footer)
    dest2 = str(tmp_path / "rollup_old_all")
    (
        _hourly(ev)
        .drop("users_sk")
        .repartition("__hour")
        .write.mode("overwrite")
        .partitionBy("__hour")
        .parquet(dest2)
    )
    assert all(
        r["n_users_est"] is None for r in daily_from_hourly(spark, dest2).collect()
    )


def test_repair_rollup_rebuilds_only_drifted_hours(spark, sf_dir, tmp_path):
    """Out-of-order ingest: rows landing behind the HWM drift the
    rollup silently; repair_rollup detects exactly the drifted hour
    partitions and rebuilds only those."""
    from timestream_travel_spark.pipeline.rollup import (
        build_rollup,
        refresh_rollup,
        repair_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    late = ev.filter(
        (F.col("ts") >= "2024-01-10 00:00:00") & (F.col("ts") < "2024-01-10 03:00:00")
    )
    on_time = ev.exceptAll(late)
    dest = str(tmp_path / "rollup")
    build_rollup(spark, on_time, dest)
    # the late slice arrives behind the HWM; refresh never revisits it
    refresh_rollup(spark, ev, dest)
    hwm_rows = _canon(spark.read.parquet(dest).drop("users_sk"))
    full = str(tmp_path / "rollup_full")
    build_rollup(spark, ev, full)
    assert hwm_rows != _canon(spark.read.parquet(full).drop("users_sk"))
    # repair finds exactly the drifted (late-slice) hours and converges
    expected = sorted(
        r["h"]
        for r in late.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("h")
        )
        .distinct()
        .collect()
    )
    assert expected  # fixture sanity: the late window is non-empty
    repaired = repair_rollup(spark, ev, dest)
    assert repaired == expected
    assert _canon(spark.read.parquet(dest).drop("users_sk")) == _canon(
        spark.read.parquet(full).drop("users_sk")
    )
    # clean rollup → no-op
    assert repair_rollup(spark, ev, dest) == []
    # never-built destination → full-build fallback, every hour named
    fresh = str(tmp_path / "rollup_fresh")
    built = repair_rollup(spark, ev, fresh)
    assert built == sorted(
        r["h"]
        for r in ev.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("h")
        )
        .distinct()
        .collect()
    )


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
    # clean rollup → repair is a no-op that still exits 0
    assert cli_main(["rollup", "--source", src, "--dest", dest, "--repair"]) == 0
    assert rollup_hwm(spark, dest) == h1


def test_retention_rejects_bad_date(spark, tmp_path):
    import pytest

    from timestream_travel_spark.pipeline.retention import enforce_retention

    with pytest.raises(ValueError, match="yyyyMMdd"):
        enforce_retention(spark, str(tmp_path), "2024-01-01")
