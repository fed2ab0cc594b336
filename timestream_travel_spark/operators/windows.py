"""Window functions (SURVEY.md §2 B.5): ranking, lag/lead deltas,
running/moving aggregates, range frames, LOCF gap-fill, top-k per
group.

Scale note: every window here partitions by a real key (user_id,
custkey) — one shuffle on the key, state bounded per partition. The
only global window (q_limit_offset in relational.py) is limit-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.ops import ts_str
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) t WHERE rnk <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — row_number with a deterministic
    orderkey tiebreaker."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        od.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "q_window_rank_kinds",
    oracle="""
    SELECT c_custkey,
           rank()       OVER (ORDER BY c_acctbal DESC, c_custkey) AS rnk,
           dense_rank() OVER (ORDER BY c_mktsegment)              AS seg_dense,
           ntile(4)     OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
)
def q_window_rank_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile over deterministic total orders."""
    c = load_table(spark, sf_dir, "customer")
    w_bal = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_seg = Window.orderBy(F.asc("c_mktsegment"))
    return c.select(
        "c_custkey",
        F.rank().over(w_bal).alias("rnk"),
        F.dense_rank().over(w_seg).alias("seg_dense"),
        F.ntile(4).over(w_bal).alias("quartile"),
    )


@query(
    "q_window_lag_delta",
    oracle="""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           value,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    """,
)
def q_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-ordered deltas (lag) and lookahead (lead) — the
    fundamental time-series derivative ops over the reference's
    ORDER-BY-time model (cmd/backup.go:241)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        ts_str("ts", "ts_s"),
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "q_window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(20,4)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value
    FROM events
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per user (decimal-accumulated for stability)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(20,4)")).over(w).cast("double").alias("running_value"),
    )


@query(
    "q_window_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(20,4)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(value)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             AS mavg_5
    FROM events
    """,
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row moving average per user (decimal sum / count to keep the
    double bit-identical across engines)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(F.col("value").cast("decimal(20,4)")).over(w).cast("double") / F.count("value").over(w)).alias(
            "mavg_5"
        ),
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id
                          ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
             AS n_last_hour
    FROM events
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range frame: events per user in the trailing hour, via a
    RANGE frame over epoch seconds (B.5 time-range frame)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select("event_id", "user_id", F.count("*").over(w).alias("n_last_hour"))


@query(
    "q_window_locf",
    oracle="""
    SELECT event_id, user_id,
           last_value(big_val IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS locf_big_val
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN value > 100 THEN value END AS big_val
          FROM events) t
    """,
)
def q_window_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap fill: sparse readings
    (value>100, else NULL) forward-filled per user with
    last(ignorenulls) — the B.5/B.9 series gap-fill primitive."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sparse = ev.select(
        "event_id", "user_id", "ts", F.when(F.col("value") > 100, F.col("value")).alias("big_val")
    )
    return sparse.select(
        "event_id", "user_id", F.last("big_val", ignorenulls=True).over(w).alias("locf_big_val")
    )
