"""Time-series operators, part 3: time-weighted average and linear
interpolation onto a regular grid — Amazon Timestream's signature
query functions (its query language ships AVG vs time-weighted
interpolation families), re-expressed as window compositions.

Both are one-shuffle plans: everything keys on (user_id) with an
ORDER BY ts window — the same partitioning the as-of join and
sessionize already use, so at 100 TB these pipeline onto an existing
exchange instead of adding one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id, value,
             epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - epoch_us(ts)
               AS dur_us
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           round(CAST(SUM(CAST(value * dur_us AS DECIMAL(30,6))) AS DOUBLE)
                 / SUM(dur_us), 6) AS twa,
           CAST(COUNT(dur_us) AS BIGINT) AS n_segments
    FROM seg
    WHERE dur_us IS NOT NULL AND dur_us > 0
    GROUP BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per series: each sample's value is
    weighted by how long it was current (duration to the NEXT
    sample — step-function/LOCF semantics, the standard irregular-
    series average). Last samples carry no duration and drop, as do
    zero-duration repeats. The value*duration products accumulate as
    DECIMAL (ops.dsum pattern): a plain double SUM is order-dependent
    under partial aggregation and flakes against the oracle at other
    partition counts."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dur_us")
    seg = ev.select("user_id", "value", dur).filter(
        F.col("dur_us").isNotNull() & (F.col("dur_us") > 0)
    )
    wsum = F.sum((F.col("value") * F.col("dur_us")).cast("decimal(30,6)")).cast("double")
    return seg.groupBy("user_id").agg(
        F.round(wsum / F.sum("dur_us"), 6).alias("twa"),
        F.count("dur_us").cast("bigint").alias("n_segments"),
    )


@query(
    "q_interpolate_linear",
    oracle="""
    WITH samples AS (
      SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'purchase'
    ), grid AS (
      SELECT DISTINCT user_id,
             unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
                                    TIMESTAMP '2024-01-25 00:00:00',
                                    INTERVAL 1 DAY)) AS g
      FROM samples
    ), before AS (
      SELECT g.user_id, g.g, s.ts AS t0, s.value AS v0,
             row_number() OVER (PARTITION BY g.user_id, g.g
                                ORDER BY s.ts DESC, s.event_id DESC) AS rn
      FROM grid g JOIN samples s ON s.user_id = g.user_id AND s.ts <= g.g
    ), after AS (
      SELECT g.user_id, g.g, s.ts AS t1, s.value AS v1,
             row_number() OVER (PARTITION BY g.user_id, g.g
                                ORDER BY s.ts ASC, s.event_id ASC) AS rn
      FROM grid g JOIN samples s ON s.user_id = g.user_id AND s.ts > g.g
    )
    SELECT b.user_id,
           strftime(b.g, '%Y-%m-%d %H:%M:%S') AS grid_ts,
           round(b.v0 + (a.v1 - b.v0)
                 * (CAST(epoch_us(b.g) - epoch_us(b.t0) AS DOUBLE)
                    / (epoch_us(a.t1) - epoch_us(b.t0))), 6)
             AS interp
    FROM before b JOIN after a ON a.user_id = b.user_id AND a.g = b.g
    WHERE b.rn = 1 AND a.rn = 1
    """,
)
def q_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation at daily grid points (Timestream's
    INTERPOLATE_LINEAR): for each grid instant, the last sample at-or-
    before and first sample after bracket the point; the value is the
    linear blend. Spark plan: union grid+samples, ONE window pass per
    direction (LOCF forward for (t0,v0), backfill for (t1,v1)) — no
    per-grid-point range join; the union+window is linear in
    rows+grid, the same trick as the as-of join."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    samples = ev.select(
        "user_id", "ts", "value", "event_id", F.lit(0).alias("is_grid")
    )
    grid = (
        samples.select("user_id").distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.to_timestamp(F.lit("2024-01-05 00:00:00")),
                    F.to_timestamp(F.lit("2024-01-25 00:00:00")),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("ts"),
        )
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("double").alias("value"),
            F.lit(None).cast("bigint").alias("event_id"),
            F.lit(1).alias("is_grid"),
        )
    )
    # grid points sort AFTER a sample at the same instant (is_grid
    # tiebreak) so an exact-hit sample counts as "at-or-before"
    unioned = samples.unionByName(grid)
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    sample_ts = F.when(F.col("is_grid") == 0, F.col("ts"))
    enriched = unioned.select(
        "user_id",
        "ts",
        "is_grid",
        F.last(sample_ts, ignorenulls=True).over(w_fwd).alias("t0"),
        F.last(F.when(F.col("is_grid") == 0, F.col("value")), ignorenulls=True).over(w_fwd).alias("v0"),
        F.first(F.when(F.col("is_grid") == 0, F.col("ts")), ignorenulls=True).over(w_bwd).alias("t1"),
        F.first(F.when(F.col("is_grid") == 0, F.col("value")), ignorenulls=True).over(w_bwd).alias("v1"),
    )
    g = enriched.filter(
        (F.col("is_grid") == 1)
        & F.col("t0").isNotNull()
        & F.col("t1").isNotNull()
        & (F.col("t1") > F.col("ts"))  # strict "after" bracket
    )
    frac = (F.unix_micros("ts") - F.unix_micros("t0")).cast("double") / (
        F.unix_micros("t1") - F.unix_micros("t0")
    )
    return g.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("grid_ts"),
        F.round(F.col("v0") + (F.col("v1") - F.col("v0")) * frac, 6).alias("interp"),
    )
