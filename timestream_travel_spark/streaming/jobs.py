"""Structured Streaming jobs (SURVEY.md §2 B.10).

The reference is batch-only, but its domain is continuous time-series
ingest (its default window is "1 hour ago → now", cmd/backup.go:
139-153). These jobs are the streaming form of the batch operators:
same F.window expressions, plus watermarks for late data and
foreachBatch reuse of the gzip NDJSON sink (A23-A26).

Tests replay the events fixture as a file stream and check
batch-equivalence (SURVEY.md §5.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
)


def read_events_stream(spark: SparkSession, src_dir: str, max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over parquet drops of events rows (streams
    need a declared schema — file sources can't infer safely)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def tumbling_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """Event-time tumbling window counts with late-data drop: rows
    later than the watermark never resurrect a closed window."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_avg(stream: DataFrame, window: str = "30 minutes", slide: str = "10 minutes") -> DataFrame:
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "avg_value")
    )


def session_windows(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows with a dynamic gap — the streaming counterpart
    of the batch q_sessionize operator."""
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def streaming_dedup(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Stateful exact dedup on event_id within the watermark horizon —
    state is bounded by the watermark, so it survives unbounded input."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id", "ts"])


def streaming_dedup_within_watermark(
    stream: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Dedup on event_id ALONE where retries may re-stamp the event
    time: `dropDuplicates` needs the event-time column in its key for
    state eviction, so two copies of the same event with different ts
    both survive it. `dropDuplicatesWithinWatermark` evicts on the
    watermark instead of the key, deduping pure-business-key retries
    — the at-least-once ingest case — with state still bounded by the
    watermark horizon."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_stream_click_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "1 hour",
    horizon_expr: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """Watermarked stream-stream INNER join: each purchase pairs with
    the same user's clicks in the hour before it (click attribution).

    State story: both sides carry an event-time watermark and the join
    condition bounds click_ts to [purchase_ts − horizon, purchase_ts],
    so Spark derives a state-eviction watermark for BOTH buffers —
    state is O(events within the horizon), not unbounded. Without the
    time-range conjunct a stream-stream inner join must buffer
    everything forever; this is the canonical bounded-state shape
    (Structured Streaming docs, inner join with time constraint)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    ).withWatermark("purchase_ts", watermark)
    return p.join(
        c,
        (p.user_id == c.c_user)
        & (c.click_ts <= p.purchase_ts)
        & (c.click_ts >= p.purchase_ts - F.expr(horizon_expr)),
        "inner",
    ).select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")


def stream_stream_attribution_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "1 hour",
    horizon_expr: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """LEFT OUTER watermarked stream-stream join: like the inner
    attribution, but purchases with NO click in the preceding hour
    still emit — with null click columns — once the watermark passes
    their join horizon (the engine can only then prove no match will
    arrive). The outer side's emission is thus watermark-delayed by
    design; state stays bounded by the same time-range conjunct."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    ).withWatermark("purchase_ts", watermark)
    return p.join(
        c,
        (p.user_id == c.c_user)
        & (c.click_ts <= p.purchase_ts)
        & (c.click_ts >= p.purchase_ts - F.expr(horizon_expr)),
        "left_outer",
    ).select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")


def read_rate_stream(spark: SparkSession, rows_per_second: int = 500) -> DataFrame:
    """Rate source shaped like the events table — the fixture-free
    demo/load-gen stream (each row: monotonically increasing event_id,
    processing-time ts, synthetic user/type/value)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 97).alias("user_id"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("purchase"), F.lit("refund"), F.lit("signup")),
            (F.col("value") % 5 + 1).cast("int"),
        ).alias("event_type"),
        (F.col("value") % 1000).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    )


def rate_demo(
    spark: SparkSession,
    dest: str,
    checkpoint: str,
    rows_per_second: int = 500,
    window: str = "5 seconds",
    watermark: str = "5 seconds",
):
    """End-to-end fixture-free pipeline: rate source → tumbling
    window counts → foreachBatch gzip NDJSON sink. Returns the
    started StreamingQuery; the caller inspects `lastProgress` for
    input/processed rates and stops it."""
    stream = read_rate_stream(spark, rows_per_second)
    counts = tumbling_counts(stream, window=window, watermark=watermark)
    return write_gzip_json_stream(counts, dest, checkpoint).start()


def write_gzip_json_stream(result: DataFrame, dest: str, checkpoint: str):
    """foreachBatch sink reusing the batch gzip NDJSON writer
    (A23-A26): each micro-batch appends partitioned compressed JSON."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("__batch", F.lit(batch_id))
            .write.mode("append")
            .option("compression", "gzip")
            .json(dest)
        )

    return (
        result.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )


def user_tier_dim(events_batch: DataFrame) -> DataFrame:
    """Static enrichment dimension derived once, batch-side: each
    user's lifetime purchase total bucketed into spend tiers. In
    production this is the warehouse dim table the stream joins
    against."""
    tiers = (
        events_batch.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("spend"))
    )
    return tiers.select(
        "user_id",
        F.when(F.col("spend") >= 1000, "gold")
        .when(F.col("spend") >= 300, "silver")
        .otherwise("bronze")
        .alias("tier"),
    )


def stream_static_enriched_counts(
    stream: DataFrame, dim: DataFrame, window: str = "1 day"
) -> DataFrame:
    """Stream-static join + windowed aggregate: every micro-batch
    joins against the STATIC dim (no watermark needed on the static
    side — it is re-read per batch, and Spark broadcasts it when
    small), then counts per (window, tier). The canonical enrichment
    topology: at scale the static side is a warehouse dim refreshed
    out-of-band; stream state is only the open windows."""
    return (
        stream.withWatermark("ts", "10 minutes")
        .join(dim, "user_id")
        .groupBy(F.window("ts", window).alias("w"), "tier")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "tier", "n_events", "sum_value")
    )
