"""Time-series operators, part 2 (B.9 completeness): EWMA via an
explicit lag kernel, OHLC bars, deterministic sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.ops import ts_str
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

EWMA_ALPHA = 0.5
EWMA_DEPTH = 5


@query(
    "q_ewma",
    oracle=f"""
    WITH lagged AS (
      SELECT event_id, user_id, value,
             {', '.join(f"lag(value, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l{k}" for k in range(1, EWMA_DEPTH))}
      FROM events
    )
    SELECT event_id, user_id,
           round((value {' '.join(f"+ CASE WHEN l{k} IS NULL THEN 0 ELSE {(1-EWMA_ALPHA)**k} * l{k} END" for k in range(1, EWMA_DEPTH))})
                 / (1 {' '.join(f"+ CASE WHEN l{k} IS NULL THEN 0 ELSE {(1-EWMA_ALPHA)**k} END" for k in range(1, EWMA_DEPTH))}),
           6) AS ewma
    FROM lagged
    """,
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average with a truncated kernel
    (depth 5, α=0.5): explicit lag taps with null-aware weight
    renormalization at series starts. A truncated kernel keeps EWMA a
    stateless window expression — the untruncated recurrence needs
    sequential state (that's the streaming stateful operator's job)
    and is numerically explosive as a closed-form window sum."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    num = F.col("value")
    den = F.lit(1.0)
    for k in range(1, EWMA_DEPTH):
        lk = F.lag("value", k).over(w)
        wk = float((1 - EWMA_ALPHA) ** k)
        num = num + F.when(lk.isNull(), 0.0).otherwise(F.lit(wk) * lk)
        den = den + F.when(lk.isNull(), 0.0).otherwise(F.lit(wk))
    return ev.select("event_id", "user_id", F.round(num / den, 6).alias("ewma"))


@query(
    "q_ohlc_hourly",
    oracle="""
    WITH ordered AS (
      SELECT event_type, value, date_trunc('hour', ts) AS hour,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events
    )
    SELECT event_type,
           strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour_s,
           MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
           COUNT(*) AS n_ticks
    FROM ordered
    GROUP BY event_type, hour
    """,
)
def q_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars per (series, hour): open/close via
    deterministic first/last row_number (ts + event_id tiebreak),
    high/low as plain aggregates — one window pass + one aggregation."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", "ts")
    w_open = Window.partitionBy("event_type", hour).orderBy(F.asc("ts"), F.asc("event_id"))
    w_close = Window.partitionBy("event_type", hour).orderBy(F.desc("ts"), F.desc("event_id"))
    ordered = ev.select(
        "event_type",
        "value",
        hour.alias("hour"),
        F.row_number().over(w_open).alias("rn_open"),
        F.row_number().over(w_close).alias("rn_close"),
    )
    return ordered.groupBy("event_type", "hour").agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n_ticks"),
    ).select("event_type", ts_str("hour", "hour_s"), "open", "high", "low", "close", "n_ticks")


@query("q_sample_deterministic")
def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sampling (B.6 adjacent; NS-scale: sampled
    pipelines for quality audits). Rows-only oracle — sampling
    algorithms are engine-specific; determinism across reruns comes
    from the fixed seed + stable input partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.01, seed=42).select("l_orderkey", "l_linenumber", "l_quantity")
