"""Join strategies, part 2: the binned (bucketized) interval join —
the standard rewrite that turns a keyless interval-overlap theta join
(BroadcastNestedLoopJoin / cartesian at scale) into an equi-join on
time bins plus an exact residual filter.

Databricks' range-join optimization and Flink's interval join do this
same binning internally; vanilla open-source Spark does not, so the
engine provides it as an operator rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

BIN = "1 hour"  # bin width must be >= the longest interval for 2-bin bound
WINDOW_MIN = 90  # interval length (minutes)
TOP_WINDOWS = 5  # busiest hours → maintenance windows


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    lo_col: str = "start_ts",
    hi_col: str = "end_ts",
) -> DataFrame:
    """Equi-join `points` (a timestamp each) to `intervals`
    ([lo, hi), hi − lo ≤ 2×bin) WITHOUT a shared key: each interval
    explodes to the hour bins it touches (≤ ceil(len/bin)+1), each
    point maps to its one bin, the join keys on the bin, and the
    exact range predicate filters residually. The shuffle is
    hash-partitioned on bins — no nested-loop, no broadcast of a
    big side; skewed bins split under AQE like any equi-join."""
    binned_iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col(lo_col)),
                F.date_trunc("hour", F.col(hi_col)),
                F.expr(f"INTERVAL {BIN}"),
            )
        ),
    )
    binned_pt = points.withColumn("__bin", F.date_trunc("hour", F.col(ts_col)))
    return binned_pt.join(binned_iv, "__bin").filter(
        (F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) < F.col(hi_col))
    )


@query(
    "q_join_interval_binned",
    oracle=f"""
    WITH busiest AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1
      ORDER BY n DESC, h LIMIT {TOP_WINDOWS}
    ), win AS (
      SELECT h AS start_ts, h + INTERVAL {WINDOW_MIN} MINUTE AS end_ts,
             strftime(h, '%Y-%m-%d %H:%M:%S') AS window_id
      FROM busiest
    )
    SELECT w.window_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM win w JOIN events e
      ON e.ts >= w.start_ts AND e.ts < w.end_ts
    GROUP BY w.window_id
    """,
)
def q_join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval join via binning: the {TOP_WINDOWS} busiest
    hours become {WINDOW_MIN}-minute maintenance windows; every event
    inside any window joins to it with NO user_id equi-key. The
    DuckDB oracle states the plain theta join; the Spark plan is the
    binned equi-join rewrite — same rows, shuffle-join physics."""
    ev = load_table(spark, sf_dir, "events")
    busiest = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("h"))
        .limit(TOP_WINDOWS)
    )
    win = busiest.select(
        F.col("h").alias("start_ts"),
        (F.col("h") + F.expr(f"INTERVAL {WINDOW_MIN} MINUTE")).alias("end_ts"),
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("window_id"),
    )
    joined = binned_interval_join(ev, win)
    return joined.groupBy("window_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )


NEAREST_HORIZON_S = 1800  # ±30 minutes


@query(
    "q_join_asof_nearest",
    oracle=f"""
    WITH p AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ), before AS (
      SELECT p.event_id AS purchase_id, c.event_id AS cid, c.ts AS cts,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM p JOIN c ON c.user_id = p.user_id
       AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL {NEAREST_HORIZON_S} SECOND
    ), after AS (
      SELECT p.event_id AS purchase_id, c.event_id AS cid, c.ts AS cts,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts ASC, c.event_id ASC) AS rn
      FROM p JOIN c ON c.user_id = p.user_id
       AND c.ts > p.ts AND c.ts <= p.ts + INTERVAL {NEAREST_HORIZON_S} SECOND
    )
    SELECT p.event_id AS purchase_id,
           CASE WHEN b.cid IS NOT NULL AND (a.cid IS NULL OR
                     epoch_us(p.ts) - epoch_us(b.cts) <= epoch_us(a.cts) - epoch_us(p.ts))
                THEN b.cid ELSE a.cid END AS nearest_click_id,
           CASE WHEN b.cid IS NOT NULL AND (a.cid IS NULL OR
                     epoch_us(p.ts) - epoch_us(b.cts) <= epoch_us(a.cts) - epoch_us(p.ts))
                THEN epoch_us(p.ts) - epoch_us(b.cts)
                ELSE epoch_us(a.cts) - epoch_us(p.ts) END AS gap_us
    FROM p
    LEFT JOIN before b ON b.purchase_id = p.event_id AND b.rn = 1
    LEFT JOIN after a ON a.purchase_id = p.event_id AND a.rn = 1
    WHERE b.cid IS NOT NULL OR a.cid IS NOT NULL
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time join (the as-of join's bidirectional sibling):
    each purchase pairs with its CLOSEST click within ±{NEAREST_HORIZON_S}s,
    earlier side winning ties. The oracle states the per-purchase
    row_number formulation; the Spark plan is the union+window trick
    (one (user_id, ts) sort, LOCF struct for the last click, backfill
    struct for the next) — linear in rows, never per-purchase range
    joins. Same shape as q_join_asof/q_interpolate_linear, so at
    100 TB it pipelines onto the series exchange."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window as W

    u = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        # clicks sort before purchases at equal ts: an equal-ts click
        # is "before" (matches the oracle's c.ts <= p.ts)
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("kind"),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_next = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    click_struct = F.when(
        F.col("kind") == 0, F.struct(F.col("ts"), F.col("event_id"))
    )
    enriched = u.select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.last(click_struct, ignorenulls=True).over(w_prev).alias("prev_c"),
        F.first(click_struct, ignorenulls=True).over(w_next).alias("next_c"),
    ).filter(F.col("kind") == 1)
    gap_prev = F.unix_micros("ts") - F.unix_micros("prev_c.ts")
    gap_next = F.unix_micros("next_c.ts") - F.unix_micros("ts")
    h_us = NEAREST_HORIZON_S * 1_000_000
    prev_ok = F.col("prev_c").isNotNull() & (gap_prev <= h_us)
    next_ok = F.col("next_c").isNotNull() & (gap_next <= h_us)
    use_prev = prev_ok & (~next_ok | (gap_prev <= gap_next))
    return (
        enriched.filter(prev_ok | next_ok)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.when(use_prev, F.col("prev_c.event_id"))
            .otherwise(F.col("next_c.event_id"))
            .alias("nearest_click_id"),
            F.when(use_prev, gap_prev).otherwise(gap_next).alias("gap_us"),
        )
    )
