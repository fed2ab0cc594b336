"""Time-series operators, part 9 (round 5, wave 3): Theil–Sen
robust trend estimation.

Companion to q_series_trend_native (timeseries5.py — least-squares,
outlier-sensitive): the Theil–Sen estimator (public: Theil 1950 /
Sen 1968) is the median of all pairwise slopes, with a 29.3%
breakdown point — the robust slope a monitoring pipeline wants when
a series has spikes.

Median discipline: percentile()/quantile_cont() interpolation
formulas are NOT guaranteed to match across engines for even counts
(a + frac·(b−a) vs (a+b)/2 differ in rounding), so the median here
is an explicit rank selection — row_number over slope order, AVG of
the one or two middle rows — where both engines run the identical
two-double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_theilsen_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', date_trunc('day', ts)) AS x,
             SUM(CAST(value AS DECIMAL(20,4))) AS v
      FROM events GROUP BY 1, 2
    ), slopes AS (
      SELECT a.event_type,
             CAST(b.v - a.v AS DOUBLE) / (b.x - a.x) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.x < b.x
    ), ranked AS (
      SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS m
      FROM slopes
    )
    SELECT event_type,
           CAST(MAX(m) AS BIGINT) AS n_pairs,
           AVG(slope) AS theilsen_slope
    FROM ranked
    WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2
    GROUP BY event_type
    """,
)
def q_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust daily trend per event type: median of the
    C(n,2) pairwise slopes of the exact-DECIMAL daily value series.

    Scale shape: the event-table pass is one map-side-combined daily
    aggregation; the quadratic blowup is BOUNDED per group (the daily
    series has a fixed 30-point span per type at every SF → ≤ 435
    pairs/group), so the pair join is a within-group self-join on a
    tiny table, never on events. Each slope is one correctly-rounded
    double division of an exact decimal delta by an integer day gap;
    the median is the explicit middle-rank selection (AVG of ≤ 2
    rows — identical arithmetic both engines), not an
    interpolation-formula percentile."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01").cast("date")).alias(
            "x"
        ),
    ).agg(F.sum(F.col("value").cast("decimal(20,4)")).alias("v"))
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type")) & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.v") - F.col("a.v")).cast("double") / (F.col("b.x") - F.col("a.x"))
        ).alias("slope"),
    )
    wr = Window.partitionBy("event_type").orderBy("slope")
    wm = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wm).alias("m"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("m") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("m") + 2) / 2))
    )
    return mid.groupBy("event_type").agg(
        F.max("m").cast("bigint").alias("n_pairs"),
        F.avg("slope").alias("theilsen_slope"),
    )
