"""Time-series operators, part 10 (round 5, wave 5): offline
change-point localization by binary segmentation (first split).

Companion to q_cusum_changepoints (streaming-style sequential
alarms): binary segmentation (Scott & Knott 1974 lineage, public) is
the OFFLINE formulation — choose the split that minimizes total
within-segment squared error. This query computes the first (and
most significant) split per series; the full tree is this operator
applied recursively to each side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_binseg_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', date_trunc('day', ts)) AS x,
             SUM(CAST(value AS DECIMAL(18,4))) AS v
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, x, v,
             row_number() OVER w AS k,
             SUM(v) OVER w AS c1,
             SUM(CAST(v * v AS DECIMAL(37,8))) OVER w AS c2,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(v) OVER (PARTITION BY event_type) AS t1,
             SUM(CAST(v * v AS DECIMAL(37,8))) OVER (PARTITION BY event_type) AS t2
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), bridged AS (
      -- DECIMAL→DOUBLE through VARCHAR (ops.dsum_sql rule): c2/t2
      -- exceed 17 significant digits at sf≥0.1 and DuckDB's direct
      -- cast is not correctly rounded there, while Spark's
      -- BigDecimal.doubleValue is
      SELECT event_type, x, k, n,
             CAST(CAST(c1 AS VARCHAR) AS DOUBLE) AS c1d,
             CAST(CAST(c2 AS VARCHAR) AS DOUBLE) AS c2d,
             CAST(CAST(t1 AS VARCHAR) AS DOUBLE) AS t1d,
             CAST(CAST(t2 AS VARCHAR) AS DOUBLE) AS t2d
      FROM cum WHERE k < n
    ), costs AS (
      SELECT event_type, x, k, n,
             (c2d - c1d * c1d / k)
             + ((t2d - c2d) - (t1d - c1d) * (t1d - c1d) / (n - k)) AS cost,
             c1d / k AS mean_left,
             (t1d - c1d) / (n - k) AS mean_right
      FROM bridged
    ), best AS (
      SELECT event_type, x, k, cost, mean_left, mean_right,
             row_number() OVER (PARTITION BY event_type ORDER BY cost, k) AS rn
      FROM costs
    )
    SELECT event_type,
           CAST(k AS BIGINT) AS split_after_k,
           CAST(x AS BIGINT) AS split_after_day,
           cost AS split_cost, mean_left, mean_right
    FROM best WHERE rn = 1
    """,
)
def q_binseg_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First binary-segmentation change point per event type's daily
    value series: the split k minimizing within-segment SSE, via the
    prefix-sum identity SSE = Σx² − (Σx)²/n — so all C(n) candidate
    splits are scored from ONE cumulative window pass, not n
    re-aggregations.

    All prefix sums are exact DECIMAL (v and v² accumulate
    order-independently); each candidate's cost is a fixed double
    expression over those exact inputs, so both engines compute the
    identical cost array and the argmin (earliest-k tiebreak) picks
    the identical split. One event-table reduce + windows over the
    30-row-per-type daily table."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01").cast("date")).alias(
            "x"
        ),
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    v2 = (F.col("v") * F.col("v")).cast("decimal(37,8)")
    cum = daily.select(
        "event_type",
        "x",
        F.row_number().over(Window.partitionBy("event_type").orderBy("x")).alias("k"),
        F.sum("v").over(w).alias("c1"),
        F.sum(v2).over(w).alias("c2"),
        F.count(F.lit(1)).over(wt).alias("n"),
        F.sum("v").over(wt).alias("t1"),
        F.sum(v2).over(wt).alias("t2"),
    ).filter(F.col("k") < F.col("n"))
    c1d, c2d = F.col("c1").cast("double"), F.col("c2").cast("double")
    t1d, t2d = F.col("t1").cast("double"), F.col("t2").cast("double")
    k, n = F.col("k"), F.col("n")
    cost = (c2d - c1d * c1d / k) + ((t2d - c2d) - (t1d - c1d) * (t1d - c1d) / (n - k))
    costs = cum.select(
        "event_type",
        "x",
        "k",
        cost.alias("cost"),
        (c1d / k).alias("mean_left"),
        ((t1d - c1d) / (n - k)).alias("mean_right"),
    )
    wbest = Window.partitionBy("event_type").orderBy("cost", "k")
    return (
        costs.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("k").cast("bigint").alias("split_after_k"),
            F.col("x").cast("bigint").alias("split_after_day"),
            F.col("cost").alias("split_cost"),
            "mean_left",
            "mean_right",
        )
    )
