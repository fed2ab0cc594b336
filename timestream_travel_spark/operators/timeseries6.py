"""Time-series operators, part 6: classical decomposition — the
trend / seasonal / residual split (STL-family, moving-average
variant) over the hourly event series.

The reference's source engine (Amazon Timestream) leaves
decomposition to clients; a replacement analytics engine should do it
in-plan. The formulation is the textbook additive decomposition:
centered moving-average trend, seasonal = per-phase mean of the
detrended series, residual = remainder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

TREND_HALF = 12  # ±12 hours → 25-point centered moving average


@query(
    "q_seasonal_decompose",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), t AS (
      SELECT event_type, h, v,
             CAST(SUM(CAST(v AS DECIMAL(24,10))) OVER w AS DOUBLE)
               / COUNT(*) OVER w AS trend
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN {TREND_HALF} PRECEDING AND {TREND_HALF} FOLLOWING)
    ), d AS (
      SELECT event_type, h, v, trend, v - trend AS detr,
             CAST(hour(h) AS INT) AS hod
      FROM t
    ), s AS (
      SELECT event_type, hod,
             CAST(SUM(CAST(detr AS DECIMAL(24,10))) AS DOUBLE) / COUNT(*)
               AS seasonal
      FROM d GROUP BY event_type, hod
    )
    SELECT d.event_type, strftime(d.h, '%Y-%m-%d %H:%M:%S') AS hour_ts,
           round(d.v, 6) AS v, round(d.trend, 6) AS trend,
           round(s.seasonal, 6) AS seasonal,
           round(d.detr - s.seasonal, 6) AS resid
    FROM d JOIN s ON d.event_type = s.event_type AND d.hod = s.hod
    """,
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the hourly mean-value
    series per event type: trend = {2 * TREND_HALF + 1}-point centered
    moving average, seasonal = hour-of-day mean of the detrended
    series, residual = what's left. The moving-average variant of
    STL — the loess refinement is a client-side polish; the heavy
    lifting (bucketing, windows, phase means) is what the engine owes.

    Scale shape: raw events reduce to an hourly grid FIRST (one
    aggregation — at 100 TB this is the big shuffle, everything after
    runs on |types|×|hours| rows), then one window and one phase
    aggregation, all partitioned by event_type. Every mean divides a
    DECIMAL-accumulated sum, so partial-agg order can't flip the
    hash."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        (F.sum(F.col("value").cast("decimal(20,6)")).cast("double") / F.count("*")).alias(
            "v"
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-TREND_HALF, TREND_HALF)
    )
    t = hourly.select(
        "event_type",
        "h",
        "v",
        (
            F.sum(F.col("v").cast("decimal(24,10)")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("trend"),
    )
    d = t.select(
        "event_type",
        "h",
        "v",
        "trend",
        (F.col("v") - F.col("trend")).alias("detr"),
        F.hour("h").cast("int").alias("hod"),
    )
    s = d.groupBy("event_type", "hod").agg(
        (
            F.sum(F.col("detr").cast("decimal(24,10)")).cast("double") / F.count("*")
        ).alias("seasonal")
    )
    return d.join(s, ["event_type", "hod"]).select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
        F.round("v", 6).alias("v"),
        F.round("trend", 6).alias("trend"),
        F.round("seasonal", 6).alias("seasonal"),
        F.round(F.col("detr") - F.col("seasonal"), 6).alias("resid"),
    )


@query(
    "q_rolling_median",
    oracle="""
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_id,
           round(quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 6) AS med7
    FROM events WHERE event_type = 'purchase'
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-sample median smoother per series — the robust
    sibling of the moving average (one outlier cannot move it), the
    classic pre-filter before anomaly thresholds. Exact percentile as
    a WINDOW aggregate over a +/-3-row frame: per-frame sort of <=7
    values, no materialized self-join, same single user_id exchange
    as every other series window."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    return ev.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "event_id",
        F.round(F.percentile("value", 0.5).over(w), 6).alias("med7"),
    )


ROLL_DAYS = 7  # trailing window, inclusive


@query(
    "q_rolling_active_users",
    oracle=f"""
    WITH daily AS (
      SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
    ), spine AS (
      SELECT DISTINCT d FROM daily
    )
    SELECT strftime(s.d, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau
    FROM spine s
    JOIN daily a
      ON a.d <= s.d AND a.d > s.d - INTERVAL {ROLL_DAYS} DAY
    GROUP BY s.d
    """,
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {ROLL_DAYS}-day distinct active users per day (the
    WAU curve) — the rolling-DISTINCT aggregate no window frame can
    express (distinct state is not subtractable as the frame slides).
    The scalable rewrite: reduce raw events to DISTINCT (day, user)
    FIRST — at 100 TB that single aggregation is the only
    corpus-sized shuffle, collapsing each user's daily activity to
    one row — then range-join the bounded daily-pairs table to the
    day spine (|days| x avg-DAU x {ROLL_DAYS} rows) and count
    distinct per spine day."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    ).distinct()
    spine = daily.select(F.col("d").alias("sd")).distinct()
    j = spine.join(
        daily,
        (F.col("d") <= F.col("sd"))
        & (F.col("d") > F.col("sd") - F.expr(f"INTERVAL {ROLL_DAYS} DAY")),
    )
    return j.groupBy(F.date_format("sd", "yyyy-MM-dd").alias("day")).agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )


@query(
    "q_session_window_builtin",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
             AS session_end_bound,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def q_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch `F.session_window` — the BUILT-IN dynamic-gap
    sessionizer, pinned cross-engine against the manual lag+cumsum
    rewrite (q_sessionize) re-derived under the built-in's exact
    semantics: micro-precision gaps, a >= 30 min gap starts a new
    session (window ends are exclusive), and the reported session end
    is last-event + gap. Having both formulations green proves the
    built-in and the portable rewrite agree row-for-row - the same
    twin discipline as OHLC's two shapes. One exchange: session
    assignment and the aggregate share the user_id partitioning."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id").agg(
        F.count("*").cast("bigint").alias("n_events")
    )
    return g.select(
        "user_id",
        F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end_bound"),
        "n_events",
    )


ACTIVE_WIN_MIN = 30  # each event opens a 30-minute activity interval


@query(
    "q_covered_time",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL {ACTIVE_WIN_MIN} MINUTE AS e
      FROM events
    ), flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR max(e) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    ), merged AS (
      SELECT user_id, island, min(s) AS ms, max(e) AS me
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(epoch_us(me) - epoch_us(ms)) // 1000000 AS BIGINT)
             AS covered_s
    FROM merged GROUP BY user_id
    """,
)
def q_covered_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total covered time per user after merging overlapping activity
    intervals (each event opens a {ACTIVE_WIN_MIN}-minute window) —
    the gaps-and-islands interval-union aggregate behind uptime and
    usage-billing queries, where naive duration sums double-count
    overlaps.

    The island rewrite: an interval starts a new island exactly when
    its start exceeds the running max of all previous ends; islands
    are then a running sum of those flags. Two window passes and two
    aggregations ALL on the user_id partitioning — one exchange, and
    the merged-interval table entering the final sum is
    |islands| ≤ |events| rows."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(f"INTERVAL {ACTIVE_WIN_MIN} MINUTE")).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max_e = F.max("e").over(w_prev)
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(w_run).alias("island")
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    # integer `div`, not `/`: float division then bigint cast differs
    # cross-engine at .5 (Spark truncates, DuckDB rounds)
    return (
        merged.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_intervals"),
            F.sum(F.unix_micros("me") - F.unix_micros("ms")).alias("us"),
        )
        .select(
            "user_id",
            "n_intervals",
            F.expr("us div 1000000").cast("bigint").alias("covered_s"),
        )
    )
