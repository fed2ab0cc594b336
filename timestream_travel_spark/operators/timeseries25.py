"""Time series, part 25 (round 11): MULTIPLICATIVE Holt-Winters
(Winters, Management Science 1960 — the seasonal-ratio form) on the
global hourly event-count series — the twin of timeseries8's
additive q_holt_winters (the r10 verdict's growth-wave candidate
(d)). Counts have amplitude proportional to level (busy days swing
harder), which is exactly the regime the multiplicative form models:
    l_t = α·(x_t / s_{{t−P}}) + (1−α)·(l_{{t−1}} + b_{{t−1}})
    b_t = β·(l_t − l_{{t−1}}) + (1−β)·b_{{t−1}}
    s_t = γ·(x_t / l_t) + (1−γ)·s_{{t−P}}
with the seasonal ring seeded to ONES (the multiplicative identity;
the additive twin seeds zeros), l_1 = x_1, b_1 = 0.

Exactness: q_macd's contract — the hourly level is an exact integer
count, every recurrence step is the same IEEE sequence in Spark's
mapInPandas carry-state walk and the oracle's recursive CTE (gain
literals inline at both sites), outputs compared UNROUNDED. Gains
α=0.25, β=0.0625, γ=0.125 are binary-exact AND inside the stability
region (the timeseries8 divergence lesson). x ≥ 1 on every emitted
hour (absent hours produce no row), so the divisions never see 0.

Scale shape: one map-side-combined hourly count reduce does the
corpus-sized work; the recurrence walks the bounded aggregate series
in a single sorted partition with an O(24) ring.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

HWM_PERIOD = 24
HWM_A = 0.25  # α — level gain (binary-exact)
HWM_B = 0.0625  # β — trend gain
HWM_G = 0.125  # γ — seasonal gain

_HWM_SCHEMA = "hour string, x double, level double, trend double, seasonal double"


def _hwm_partition(batches):
    """Multiplicative HW over ONE global hourly series; update order
    written EXACTLY as the oracle's recursive CTE."""
    first = True
    lv = tr = 0.0
    seas: list[float] = [1.0] * HWM_PERIOD
    for pdf in batches:
        hours = pdf["hour"].to_list()
        vals = pdf["x"].to_list()
        levels, trends, seasonal = [], [], []
        for x in vals:
            s_old = seas.pop(0)
            if first:
                lv, tr = x, 0.0
                s_new = HWM_G * (x / lv) + (1 - HWM_G) * s_old
                first = False
            else:
                prev = lv
                lv = HWM_A * (x / s_old) + (1 - HWM_A) * (lv + tr)
                tr = HWM_B * (lv - prev) + (1 - HWM_B) * tr
                s_new = HWM_G * (x / lv) + (1 - HWM_G) * s_old
            seas.append(s_new)
            levels.append(lv)
            trends.append(tr)
            seasonal.append(s_new)
        yield pd.DataFrame(
            {
                "hour": hours,
                "x": vals,
                "level": levels,
                "trend": trends,
                "seasonal": seasonal,
            }
        )


@query(
    "q_holt_winters_multiplicative",
    oracle=f"""
    WITH RECURSIVE hourly AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), s AS (
      SELECT hour, x, row_number() OVER (ORDER BY hour) AS rn FROM hourly
    ), r AS (
      SELECT hour, x, rn,
             x AS lv, CAST(0.0 AS DOUBLE) AS tr,
             list_append(list_transform(range({HWM_PERIOD - 1}),
                                        i -> CAST(1.0 AS DOUBLE)),
                         {HWM_G} * (x / x) + {1 - HWM_G} * 1.0) AS seas
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.hour, s.x, s.rn,
             {HWM_A} * (s.x / r.seas[1]) + {1 - HWM_A} * (r.lv + r.tr),
             {HWM_B} * (({HWM_A} * (s.x / r.seas[1])
                          + {1 - HWM_A} * (r.lv + r.tr)) - r.lv)
               + {1 - HWM_B} * r.tr,
             list_append(
               r.seas[2:],
               {HWM_G} * (s.x / ({HWM_A} * (s.x / r.seas[1])
                                 + {1 - HWM_A} * (r.lv + r.tr)))
                 + {1 - HWM_G} * r.seas[1])
      FROM s JOIN r ON s.rn = r.rn + 1
    )
    SELECT hour, x, lv AS level, tr AS trend, seas[{HWM_PERIOD}] AS seasonal
    FROM r
    """,
)
def q_holt_winters_multiplicative(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multiplicative Holt-Winters (level + trend + daily seasonal
    RATIOS) on the global hourly event-count series — see module
    docstring for the recurrence and seeding."""
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            )
        )
        .agg(F.count("*").cast("double").alias("x"))
    )
    return (
        hourly.coalesce(1)
        .sortWithinPartitions("hour")
        .mapInPandas(_hwm_partition, _HWM_SCHEMA)
    )
