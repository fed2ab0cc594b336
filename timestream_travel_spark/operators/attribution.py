"""Click-attribution join — the batch twin of
streaming.jobs.stream_stream_click_attribution (watermarked
stream-stream inner join). Same join condition, same semantics; the
streaming test asserts the stream result equals this plan over the
replayed fixture, and this registry entry gives the shape a DuckDB
oracle row.

Scale notes: the join keys on user_id with a bounded time-range
conjunct — in batch Spark this is one shuffle on user_id for each
side then a range filter inside the sort-merge join (no cartesian);
in streaming the same condition bounds the state buffers. The
aggregate output keeps the result driver-safe at any sf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_click_attribution",
    oracle="""
    SELECT p.user_id,
           CAST(COUNT(DISTINCT p.event_id) AS BIGINT) AS n_attributed_purchases,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(epoch_us(p.ts) - epoch_us(c.ts)) AS DOUBLE)
                 / COUNT(*) / 1e6, 4) AS avg_gap_s
    FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 1 HOUR
    GROUP BY p.user_id
    """,
)
def q_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user click→purchase attribution: every purchase joined to
    the same user's clicks in the preceding hour; aggregated to
    (purchases attributed, click-purchase pairs, mean gap seconds).
    The gap sum accumulates in exact int64 micros and divides in
    double once (oracle-stability rules)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    j = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.click_ts <= p.purchase_ts)
        & (c.click_ts >= p.purchase_ts - F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    gap_us = F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
    return j.groupBy("user_id").agg(
        F.count_distinct("purchase_id").cast("bigint").alias("n_attributed_purchases"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.sum(gap_us).cast("double") / F.count(F.lit(1)) / F.lit(1e6), 4).alias(
            "avg_gap_s"
        ),
    )
