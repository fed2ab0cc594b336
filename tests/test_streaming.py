"""Structured Streaming tests (SURVEY.md §5.4): batch-replay
equivalence for windowed aggregation, stateful dedup, session
windows, and the foreachBatch gzip sink."""

from __future__ import annotations

import glob
import gzip
import json

from pyspark.sql import functions as F

from timestream_travel_spark.streaming.jobs import (
    read_events_stream,
    session_windows,
    streaming_dedup,
    tumbling_counts,
    write_gzip_json_stream,
)
from timestream_travel_spark.tables import load_table


def _stage_events(spark, sf_dir, tmp_path, n_files: int = 5) -> str:
    """Replay fixture: events re-written as n_files parquet drops in
    ts order (FIXTURES.md streaming replay)."""
    src = str(tmp_path / "stream_src")
    ev = load_table(spark, sf_dir, "events")
    # micro-timestamps survive the round-trip (already truncated to us)
    ev.orderBy("ts").coalesce(1).withColumn(
        "bucket", F.ntile(n_files).over(__import__("pyspark").sql.window.Window.orderBy("ts"))
    ).write.partitionBy("bucket").mode("overwrite").parquet(src)
    return src


def test_tumbling_counts_matches_batch(spark, sf_dir, tmp_path):
    src = _stage_events(spark, sf_dir, tmp_path)
    files = glob.glob(f"{src}/bucket=*/")
    stream = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{src}/bucket=*")
    )
    result = tumbling_counts(stream)
    q = (
        result.writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"]) for r in batch.collect()
    }
    # append mode only emits windows the watermark closed; all emitted
    # windows must match batch exactly, and most windows must emit
    # (the fixture spans 30 days ≫ the 10-minute watermark).
    assert got, "stream produced no closed windows"
    for k, v in got.items():
        assert want[k] == v, f"window {k}: stream {v} != batch {want[k]}"
    assert len(got) >= 0.9 * len(want)


def test_streaming_dedup_drops_duplicates(spark, sf_dir, tmp_path):
    src = str(tmp_path / "dup_src")
    ev = load_table(spark, sf_dir, "events").limit(200)
    ev.unionByName(ev).coalesce(1).write.mode("overwrite").parquet(src)  # every row twice
    stream = read_events_stream(spark, src)
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(*) AS n FROM dedup_out").collect()[0]["n"]
    assert n == 200


def test_session_windows_run(spark, sf_dir, tmp_path):
    src = _stage_events(spark, sf_dir, tmp_path / "sess")
    stream = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
        )
        .parquet(f"{src}/bucket=*")
    )
    q = (
        session_windows(stream)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sess_out").collect()
    assert rows
    for r in rows:
        assert r["session_start"] <= r["session_end"]
        assert r["n_events"] >= 1


def test_foreach_batch_gzip_sink(spark, sf_dir, tmp_path):
    src = str(tmp_path / "sink_src")
    load_table(spark, sf_dir, "events").limit(100).coalesce(1).write.mode("overwrite").parquet(src)
    stream = read_events_stream(spark, src)
    dest = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "ckpt")
    q = write_gzip_json_stream(stream, dest, ckpt).trigger(availableNow=True).start()
    q.awaitTermination(120)
    files = glob.glob(f"{dest}/*.json.gz")
    assert files
    n = 0
    for fp in files:
        with gzip.open(fp, "rt") as fh:
            n += sum(1 for line in fh if line.strip() and json.loads(line))
    assert n == 100


def test_sliding_avg_runs(spark, sf_dir, tmp_path):
    from timestream_travel_spark.streaming.jobs import sliding_avg

    src = str(tmp_path / "slide_src")
    load_table(spark, sf_dir, "events").coalesce(2).write.mode("overwrite").parquet(src)
    stream = read_events_stream(spark, src)
    q = (
        sliding_avg(stream)
        .writeStream.format("memory")
        .queryName("slide_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM slide_out").collect()
    assert rows
    # each (window_start, event_type) appears once; averages are finite
    keys = [(r["window_start"], r["event_type"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_rate_source_demo_with_progress(spark, tmp_path):
    """Fixture-free rate-source pipeline (B.10 round-out): rate →
    tumbling counts → foreachBatch gzip sink, with lastProgress
    metrics asserted (inputRowsPerSecond/numInputRows present and
    non-trivial) and closed windows landing in the sink."""
    import time

    from timestream_travel_spark.streaming.jobs import rate_demo

    dest = str(tmp_path / "rate_out")
    q = rate_demo(
        spark, dest, str(tmp_path / "rate_ck"),
        rows_per_second=200, window="2 seconds", watermark="2 seconds",
    )
    try:
        def sink_rows():
            out = []
            for fp in glob.glob(f"{dest}/*.json.gz"):
                with gzip.open(fp, "rt") as fh:
                    out += [json.loads(line) for line in fh if line.strip()]
            return out

        deadline = time.time() + 120
        seen_input = 0
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["numInputRows"] > 0:
                seen_input += p["numInputRows"]
            # done once a closed window actually landed in the sink
            if seen_input > 400 and sink_rows():
                break
            time.sleep(1)
        p = q.lastProgress
        assert p is not None, "no progress reported"
        assert seen_input > 400, f"too few input rows seen: {seen_input}"
        assert "rate" in p["sources"][0]["description"].lower()
        assert p["sources"][0]["inputRowsPerSecond"] >= 0
        assert q.status["isDataAvailable"] is not None  # status surface present
    finally:
        q.stop()
    rows = sink_rows()
    assert rows, "no closed windows reached the gzip sink"
    # sink rows are closed tumbling windows of the synthetic schema
    for r in rows:
        assert set(r) >= {"window_start", "event_type", "n_events", "sum_value"}
        assert r["event_type"] in {"click", "view", "purchase", "refund", "signup"}


def test_streaming_restart_exactly_once(spark, sf_dir, tmp_path):
    """Checkpoint recovery contract: kill a running file-source →
    parquet-sink query mid-stream, restart it from the same
    checkpoint, and the sink ends up with EXACTLY the source rows —
    no loss, no duplicates (file sink + checkpoint = exactly-once)."""
    import time

    src = str(tmp_path / "drops")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    ev = load_table(spark, sf_dir, "events")
    ev.coalesce(8).write.mode("overwrite").parquet(src)
    total = ev.count()

    def start():
        return (
            read_events_stream(spark, src, max_files_per_trigger=1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .start()
        )

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline:
        p = q.lastProgress
        if p and p["batchId"] >= 2:
            break
        time.sleep(0.5)
    q.stop()  # kill mid-stream

    q2 = start()
    # drain the remainder; availableNow semantics via polling to idle
    deadline = time.time() + 120
    while time.time() < deadline:
        s = q2.status
        p = q2.lastProgress
        if p is not None and not s["isDataAvailable"] and not s["isTriggerActive"]:
            break
        time.sleep(1)
    q2.stop()

    back = spark.read.parquet(out)
    assert back.count() == total, f"{back.count()} != {total}"
    assert back.select("event_id").distinct().count() == ev.select("event_id").distinct().count()


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream inner join (click attribution): the
    streamed pair set must equal the batch join over the same rows —
    and the time-range conjunct is what keeps both state buffers
    bounded, so this is the canonical bounded-state join shape."""
    from timestream_travel_spark.streaming.jobs import stream_stream_click_attribution

    src = _stage_events(spark, sf_dir, tmp_path)
    schema = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(f"{src}/bucket=*")
    )
    res = stream_stream_click_attribution(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    q = (
        res.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT purchase_id, click_id FROM ssj_out").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
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
        ).collect()
    }
    assert want, "fixture must produce attributable pairs"
    assert got == want


def test_dedup_within_watermark_catches_restamped_retries(spark, sf_dir, tmp_path):
    """Retried rows carry the same event_id but a LATER ts (re-stamped
    at retry time): plain dropDuplicates([event_id, ts]) keeps both;
    dropDuplicatesWithinWatermark([event_id]) keeps one."""
    from pyspark.sql import functions as F

    from timestream_travel_spark.streaming.jobs import (
        read_events_stream,
        streaming_dedup_within_watermark,
    )
    from timestream_travel_spark.tables import load_table

    src = str(tmp_path / "restamp_src")
    ev = load_table(spark, sf_dir, "events").limit(200)
    retries = ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 5 MINUTES"))
    ev.unionByName(retries).coalesce(1).write.mode("overwrite").parquet(src)
    q = (
        streaming_dedup_within_watermark(read_events_stream(spark, src))
        .writeStream.format("memory")
        .queryName("dedup_wwm_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_wwm_out"
    ).collect()[0]
    assert out["n"] == 200 and out["d"] == 200


def test_stream_stream_outer_join_emits_unmatched(spark, sf_dir, tmp_path):
    """LEFT OUTER stream-stream join: matched pairs equal the batch
    join, and purchases with no click in the horizon ALSO emit (null
    click) once the watermark passes — the inner join's silent drops
    become explicit rows."""
    from timestream_travel_spark.streaming.jobs import stream_stream_attribution_outer

    src = _stage_events(spark, sf_dir, tmp_path)
    schema = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(f"{src}/bucket=*")
    )
    res = stream_stream_attribution_outer(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    q = (
        res.writeStream.format("memory")
        .queryName("ssoj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT purchase_id, click_id FROM ssoj_out").collect()
    got_pairs = {(r["purchase_id"], r["click_id"]) for r in got if r["click_id"] is not None}
    got_unmatched = {r["purchase_id"] for r in got if r["click_id"] is None}

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    want_pairs = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (p.user_id == c.c_user)
            & (c.click_ts <= p.purchase_ts)
            & (c.click_ts >= p.purchase_ts - F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got_pairs == want_pairs
    # every unmatched emission is genuinely matchless in batch
    matched_purchases = {pid for pid, _ in want_pairs}
    assert got_unmatched.isdisjoint(matched_purchases)
    assert got_unmatched  # final watermark advance flushed some outer rows
