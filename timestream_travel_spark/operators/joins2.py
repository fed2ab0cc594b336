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
