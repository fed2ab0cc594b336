"""Streaming late-arrival routing: every row lands exactly once,
each batch's on-time/late split is exactly the strictly-prior-epoch
HWM comparison (self-consistent against the stored epochs, so the
check holds under ANY file-arrival order), and the quarantine's hour
list drives repair_rollup to full convergence — the detect → name →
repair loop closed end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from timestream_travel_spark.tables import load_table

_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,"
    " value DOUBLE, props STRING"
)


def test_late_routing_split_and_repair_loop(spark, sf_dir, tmp_path):
    from timestream_travel_spark.pipeline.rollup import build_rollup, repair_rollup
    from timestream_travel_spark.streaming.late_audit import (
        late_hours,
        route_late_arrivals,
    )

    src = str(tmp_path / "ev_src")
    ev = load_table(spark, sf_dir, "events")
    ev.withColumn("bucket", (F.col("event_id") % 4).cast("int")).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/bucket=*")
    )
    dest = str(tmp_path / "main")
    quarantine = str(tmp_path / "quarantine")
    hwm = str(tmp_path / "hwm")
    q = route_late_arrivals(stream, dest, quarantine, hwm, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    main_df = spark.read.parquet(dest)
    late_df = spark.read.parquet(quarantine)

    # exactly-once routing: main ⊎ quarantine == source
    assert main_df.count() + late_df.count() == ev.count()
    routed_ids = sorted(
        r["event_id"]
        for r in main_df.select("event_id")
        .unionByName(late_df.select("event_id"))
        .collect()
    )
    assert routed_ids == sorted(r["event_id"] for r in ev.select("event_id").collect())
    assert late_df.count() > 0  # interleaved buckets must produce stragglers

    # the split is exactly the strictly-prior-epoch HWM comparison
    hwm_rows = {
        r["epoch"]: r["max_hour"] for r in spark.read.parquet(hwm).collect()
    }

    def prior(e):
        hs = [h for k, h in hwm_rows.items() if k < e]
        return max(hs) if hs else None

    for r in late_df.select("epoch", "__hour", "observed_hwm").collect():
        p = prior(r["epoch"])
        assert p is not None and r["__hour"] < p, r
        assert r["observed_hwm"] == p, r
    for r in main_df.select("epoch", "__hour").collect():
        p = prior(r["epoch"])
        assert p is None or r["__hour"] >= p, r

    # quarantine names exactly the drifted hours; repair converges
    hours = late_hours(spark, quarantine)
    assert hours == sorted(
        r["__hour"] for r in late_df.select("__hour").distinct().collect()
    )
    rollup_dest = str(tmp_path / "rollup")
    build_rollup(
        spark, main_df.drop("epoch", "__hour"), rollup_dest
    )  # on-time rows only
    repaired = repair_rollup(spark, ev, rollup_dest)
    assert repaired == hours
    full = str(tmp_path / "rollup_full")
    build_rollup(spark, ev, full)
    canon = lambda p: sorted(  # noqa: E731 — sketch bytes excluded
        tuple(r) for r in spark.read.parquet(p).drop("users_sk").collect()
    )
    assert canon(rollup_dest) == canon(full)

    # HWM-store compaction: one max row in the reserved epoch; the
    # prior-epoch read any future batch would do is unchanged
    from timestream_travel_spark.streaming.late_audit import compact_hwm_store
    from timestream_travel_spark.streaming.store_util import COMPACT_EPOCH

    overall = max(hwm_rows.values())
    compact_hwm_store(spark, hwm)
    folded = spark.read.parquet(hwm).collect()
    assert len(folded) == 1
    assert folded[0]["epoch"] == COMPACT_EPOCH
    assert folded[0]["max_hour"] == overall

    # grace auto-tuning: the suggested interval is the observed p99
    # lateness; replaying the SAME arrivals with it quarantines ≤1%
    from timestream_travel_spark.streaming.late_audit import suggest_grace

    g = suggest_grace(spark, quarantine)
    assert g is not None and g.startswith("INTERVAL ") and g.endswith(" SECONDS")
    dest3 = str(tmp_path / "main3")
    quarantine3 = str(tmp_path / "quarantine3")
    q3 = route_late_arrivals(
        (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/bucket=*")
        ),
        dest3,
        quarantine3,
        str(tmp_path / "hwm3"),
        str(tmp_path / "ckpt3"),
        grace=g,
    )
    q3.awaitTermination(180)
    try:
        n_late3 = spark.read.parquet(quarantine3).count()
    except Exception:
        n_late3 = 0
    assert n_late3 <= max(1, 0.02 * late_df.count())
    # empty quarantine → no evidence → None
    assert suggest_grace(spark, str(tmp_path / "never_written")) is None

    # grace absorbs everything → empty quarantine
    dest2 = str(tmp_path / "main2")
    q2 = route_late_arrivals(
        (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/bucket=*")
        ),
        dest2,
        str(tmp_path / "quarantine2"),
        str(tmp_path / "hwm2"),
        str(tmp_path / "ckpt2"),
        grace="INTERVAL 100 DAYS",
    )
    q2.awaitTermination(180)
    assert late_hours(spark, str(tmp_path / "quarantine2")) == []
    assert spark.read.parquet(dest2).count() == ev.count()
