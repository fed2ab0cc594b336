"""Joins, part 4 (round 15): as-of join WITH TOLERANCE — the
pandas merge_asof(tolerance=...) / QuestDB "ASOF ... TOLERANCE"
semantic the plain as-of join (joins.py q_join_asof) lacks: a match
older than the tolerance window is discarded (left row kept,
right columns NULL), which is what feature pipelines need so stale
context never leaks into a training row.

Exactness: the match itself is the priced union+LOCF as-of
composition (joins.py:173 — one window pass, no range join); the
tolerance is a pure timestamp comparison applied identically in
both engines (DuckDB: ASOF LEFT JOIN + CASE on the interval).

Scale shape: identical to q_join_asof — tag+union both sides, ONE
window shuffle on (user_id, ts); the tolerance predicate is a
post-window map, so no extra shuffle. At 100 TB the key
distribution is the same as the plain as-of (already salted-ready).

Reference parity: extends B.3's as-of family (SURVEY §2); the
tolerance mirrors the reference's interval validation
(cmd/backup.go:160-168 — exports bounded to a window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.joins import asof_join
from timestream_travel_spark.ops import ts_str
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

ASOF_TOL_HOURS = 6


@query(
    "q_join_asof_tolerance",
    oracle=f"""
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CASE WHEN c.ts >= p.ts - INTERVAL {ASOF_TOL_HOURS} HOUR
                THEN strftime(c.ts, '%Y-%m-%d %H:%M:%S') END AS click_ts,
           CASE WHEN c.ts >= p.ts - INTERVAL {ASOF_TOL_HOURS} HOUR
                THEN c.value END AS click_value,
           CAST(CASE WHEN c.ts >= p.ts - INTERVAL {ASOF_TOL_HOURS} HOUR
                THEN 1 ELSE 0 END AS INT) AS matched
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a {ASOF_TOL_HOURS}-hour tolerance: for each
    purchase, the most recent prior click by the same user, kept
    only when it happened within the window — otherwise the left row
    survives with NULL context and matched = 0."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "value"],
    )
    in_tol = F.col("right_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {ASOF_TOL_HOURS} HOUR"
    )
    return joined.select(
        "event_id",
        "user_id",
        ts_str("ts", "purchase_ts"),
        F.when(in_tol, F.date_format("right_ts", "yyyy-MM-dd HH:mm:ss")).alias(
            "click_ts"
        ),
        F.when(in_tol, F.col("right_value")).alias("click_value"),
        F.when(in_tol, 1).otherwise(0).cast("int").alias("matched"),
    )
