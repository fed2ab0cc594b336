"""Watermarked stream-stream LEFT OUTER join at the event-time
boundary (r11 verdict 'Next round #6'): a click EXACTLY at the join
horizon edge (click_ts == purchase_ts − 1h, inclusive per the `>=`
conjunct) must match; one microsecond outside must not; matchless
purchases must flush exactly once with null click columns after the
watermark passes their horizon."""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from timestream_travel_spark.streaming.jobs import stream_stream_attribution_outer

_T0 = datetime(2024, 1, 1, 0, 0, 0)
_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def _rows_df(spark, rows):
    return spark.createDataFrame(
        [
            (eid, _T0 + timedelta(seconds=sec), uid, typ, 0.0, None)
            for eid, sec, uid, typ in rows
        ],
        _SCHEMA,
    )


def test_outer_join_horizon_boundary_and_exact_flush(spark, tmp_path):
    src = str(tmp_path / "boundary_src")
    os.makedirs(src)
    h = 3600  # the 1-hour join horizon, in seconds
    batch1 = [
        # u1: click EXACTLY at purchase_ts − horizon → must match (>=)
        (101, 1 * h, 1, "click"),
        (102, 2 * h, 1, "purchase"),
        # u2: click one second OUTSIDE the horizon → must not match
        (201, 1 * h - 1, 2, "click"),
        (202, 2 * h, 2, "purchase"),
        # u3: no clicks at all → outer row after watermark passes
        (301, 2 * h, 3, "purchase"),
    ]
    # watermark pusher: far-future click for an unrelated user, in a
    # SECOND file so it lands in a later micro-batch and advances the
    # click-side watermark past every purchase's horizon
    # Outer-row flush needs the GLOBAL watermark (the MIN over both
    # legs' watermark operators) past the purchase horizon, and a
    # watermark only takes effect in a batch ~2 after the data that
    # produced it — so each trailing pusher file advances BOTH legs
    # (a click+purchase pair for an unrelated user; pairs match
    # within their own micro-batch, so they emit immediately and
    # batch parity still holds)
    pushers = [
        [
            (900 + 2 * i, (12 + i) * h, 99, "click"),
            (901 + 2 * i, (12 + i) * h + 1, 99, "purchase"),
        ]
        for i in range(4)
    ]
    _rows_df(spark, batch1).coalesce(1).write.parquet(f"{src}/f1")
    for i, push in enumerate(pushers):
        time.sleep(1.1)  # file-source ordering is (mtime, path)
        _rows_df(spark, push).coalesce(1).write.parquet(f"{src}/f{i + 2}")

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    res = stream_stream_attribution_outer(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    q = (
        res.writeStream.format("memory")
        .queryName("boundary_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT purchase_id, click_id FROM boundary_out"
    ).collect()
    pairs = {(r["purchase_id"], r["click_id"]) for r in rows}

    # the boundary click matched; the 1-second-outside click did not
    assert (102, 101) in pairs
    assert all(c != 201 for _, c in pairs if c is not None)
    # matchless purchases flushed with null click — EXACTLY once each
    nulls = [r["purchase_id"] for r in rows if r["click_id"] is None]
    assert sorted(nulls) == [202, 301]
    # the matched purchase never also emitted a spurious null row
    assert 102 not in nulls
    # batch parity: the streaming answer equals the batch left join
    ev = _rows_df(spark, batch1 + [r for push in pushers for r in push])
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (p.user_id == c.c_user)
            & (c.click_ts <= p.purchase_ts)
            & (c.click_ts >= p.purchase_ts - F.expr("INTERVAL 1 HOUR")),
            "left_outer",
        ).collect()
    }
    assert pairs == want
