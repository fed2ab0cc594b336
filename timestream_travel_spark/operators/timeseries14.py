"""Round-8 time-series indicators: Bollinger bands (Bollinger, 1980s;
public formulation) and Donchian price channels (Donchian 1960s) —
the volatility-band and range-channel companions to the r7 indicator
wave (timeseries13: VWAP/stochastic/OBV/drawdown).

Exactness: daily levels are exact DECIMAL sums; window S/Q sums stay
DECIMAL (order-independent); each band/position value is one flat
double expression per output row. Donchian needs no floats at all
until the final channel-position division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

BB_W = 20  # Bollinger window (days)
BB_K = 2  # band half-width in population SDs
DC_W = 20  # Donchian window (days)

_DAILY_SQL = """
      SELECT event_type AS t, date_trunc('day', ts) AS day,
             SUM(CAST(value AS DECIMAL(20,4))) AS v
      FROM events GROUP BY 1, 2
"""


@query(
    "q_bollinger_bands",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), win AS (
      SELECT t, day, v,
             COUNT(*) OVER w AS nw,
             CAST(CAST(SUM(v) OVER w AS VARCHAR) AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(
                 CAST(CAST(v AS VARCHAR) AS DOUBLE)
                 * CAST(CAST(v AS VARCHAR) AS DOUBLE) AS DECIMAL(30,6)))
               OVER w AS VARCHAR) AS DOUBLE) AS q
      FROM daily
      WINDOW w AS (PARTITION BY t ORDER BY day
                   ROWS BETWEEN {BB_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           round(CAST(CAST(v AS VARCHAR) AS DOUBLE), 4) AS level,
           round(s / {BB_W}, 6) AS sma,
           round(s / {BB_W} + {BB_K} * sqrt((q - s * s / {BB_W}) / {BB_W}),
                 6) AS upper_band,
           round(s / {BB_W} - {BB_K} * sqrt((q - s * s / {BB_W}) / {BB_W}),
                 6) AS lower_band,
           round((CAST(CAST(v AS VARCHAR) AS DOUBLE)
                  - (s / {BB_W} - {BB_K} * sqrt((q - s * s / {BB_W}) / {BB_W})))
                 / (2 * {BB_K} * sqrt((q - s * s / {BB_W}) / {BB_W})),
                 6) AS pct_b
    FROM win WHERE nw = {BB_W}
    """,
)
def q_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over each type's daily level: {BB_W}-day SMA ±
    {BB_K} population SDs, plus %B = (v − lower)/(upper − lower) —
    the normalized band position (>1 above the upper band, <0 below
    the lower). Emitted only once the window is full. Window sums of
    v and of DECIMAL-quantized v² stay exact; sqrt/divisions are one
    flat double expression per row. The per-type window sorts
    calendar-bounded slices — never a corpus-sized single partition."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("t"), F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(20,4)")).alias("v"))
    w = (
        Window.partitionBy("t")
        .orderBy("day")
        .rowsBetween(-(BB_W - 1), Window.currentRow)
    )
    vd = F.col("v").cast("double")
    win = daily.select(
        "t",
        "day",
        "v",
        F.count("*").over(w).alias("nw"),
        F.sum("v").over(w).cast("double").alias("s"),
        F.sum((vd * vd).cast("decimal(30,6)")).over(w).cast("double").alias("q"),
    )
    sma = F.col("s") / BB_W
    sd = F.sqrt((F.col("q") - F.col("s") * F.col("s") / BB_W) / BB_W)
    lower = sma - BB_K * sd
    return win.filter(F.col("nw") == BB_W).select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(vd, 4).alias("level"),
        F.round(sma, 6).alias("sma"),
        F.round(sma + BB_K * sd, 6).alias("upper_band"),
        F.round(lower, 6).alias("lower_band"),
        F.round((vd - lower) / (2 * BB_K * sd), 6).alias("pct_b"),
    )


@query(
    "q_donchian_channels",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), win AS (
      SELECT t, day, v,
             COUNT(*) OVER w AS nw,
             MAX(v) OVER w AS hi,
             MIN(v) OVER w AS lo
      FROM daily
      WINDOW w AS (PARTITION BY t ORDER BY day
                   ROWS BETWEEN {DC_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           round(CAST(CAST(hi AS VARCHAR) AS DOUBLE), 4) AS upper_channel,
           round(CAST(CAST(lo AS VARCHAR) AS DOUBLE), 4) AS lower_channel,
           CASE WHEN v = hi THEN 1 ELSE 0 END AS at_high,
           CASE WHEN v = lo THEN 1 ELSE 0 END AS at_low,
           round(CASE WHEN hi = lo THEN 0.5
                      ELSE CAST(CAST(v - lo AS VARCHAR) AS DOUBLE)
                           / CAST(CAST(hi - lo AS VARCHAR) AS DOUBLE) END,
                 6) AS channel_pos
    FROM win WHERE nw = {DC_W}
    """,
)
def q_donchian_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Donchian {DC_W}-day price channels per type: rolling high/low
    of the daily level, breakout flags (level touching either rail),
    and the normalized channel position (v − lo)/(hi − lo). Rolling
    MIN/MAX run entirely on exact DECIMAL daily levels — comparisons
    and the breakout flags never touch a float; the single division
    per row is the only double op (degenerate flat channel pinned to
    0.5 in both engines)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("t"), F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(20,4)")).alias("v"))
    w = (
        Window.partitionBy("t")
        .orderBy("day")
        .rowsBetween(-(DC_W - 1), Window.currentRow)
    )
    win = daily.select(
        "t",
        "day",
        "v",
        F.count("*").over(w).alias("nw"),
        F.max("v").over(w).alias("hi"),
        F.min("v").over(w).alias("lo"),
    )
    pos = F.when(F.col("hi") == F.col("lo"), 0.5).otherwise(
        (F.col("v") - F.col("lo")).cast("double")
        / (F.col("hi") - F.col("lo")).cast("double")
    )
    return win.filter(F.col("nw") == DC_W).select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.col("hi").cast("double"), 4).alias("upper_channel"),
        F.round(F.col("lo").cast("double"), 4).alias("lower_channel"),
        F.when(F.col("v") == F.col("hi"), 1).otherwise(0).alias("at_high"),
        F.when(F.col("v") == F.col("lo"), 1).otherwise(0).alias("at_low"),
        F.round(pos, 6).alias("channel_pos"),
    )
