"""Time-series operators, part 11 (round 5, wave 6): Croston's
method for intermittent demand.

Completes the forecasting family (EWMA, Holt, Holt-Winters, Kalman):
Croston (1972, public) is THE estimator for sparse/intermittent
series — separate exponential smoothing of the nonzero demand sizes
and of the inter-demand intervals, forecast = size/interval. The
per-user daily purchase counts are genuinely intermittent on this
fixture (≈0.7 purchases/user/day), which is exactly the regime where
plain EWMA over the zero-laden series underestimates.

Execution pattern = q_ewma_batch's: the recurrence walks
repartition(user) + sortWithinPartitions + mapInPandas with state
carried across Arrow batch boundaries (one Python call per batch,
not per series); the oracle is a DuckDB recursive CTE walking the
IDENTICAL IEEE op sequence, compared unrounded.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

CROSTON_ALPHA = 0.2

_SCHEMA = (
    "user_id bigint, day_idx bigint, demand bigint, z double, p double, "
    "forecast double"
)


def _croston_partition(batches):
    """Rows arrive hash-partitioned by user_id and sorted
    (user_id, day_idx); carry (user, z, p) across batch boundaries.
    First demand point seeds z = d, p = q; later points apply
    z = z*0.8 + 0.2*d and p = p*0.8 + 0.2*q — written exactly as the
    oracle's SQL so both engines produce bit-identical doubles."""
    cur_user, z, p = None, 0.0, 1.0
    for pdf in batches:
        zs, ps = [], []
        for u, d, q in zip(pdf["user_id"], pdf["demand"], pdf["q"]):
            if u != cur_user:
                z, p = float(d), float(q)
            else:
                z = z * 0.8 + 0.2 * float(d)
                p = p * 0.8 + 0.2 * float(q)
            cur_user = u
            zs.append(z)
            ps.append(p)
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "day_idx": pdf["day_idx"],
                "demand": pdf["demand"],
                "z": zs,
                "p": ps,
                "forecast": [a / b for a, b in zip(zs, ps)],
            }
        )


@query(
    "q_croston_intermittent",
    oracle=f"""
    WITH RECURSIVE nz AS (
      SELECT user_id,
             date_diff('day', DATE '2024-01-01', date_trunc('day', ts)) + 1 AS day_idx,
             CAST(COUNT(*) AS BIGINT) AS demand
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ), seq AS (
      SELECT user_id, day_idx, demand,
             row_number() OVER (PARTITION BY user_id ORDER BY day_idx) AS rn,
             COALESCE(day_idx - lag(day_idx) OVER (PARTITION BY user_id
                                                   ORDER BY day_idx),
                      day_idx) AS q
      FROM nz
    ), r AS (
      SELECT user_id, day_idx, demand, rn,
             CAST(demand AS DOUBLE) AS z, CAST(q AS DOUBLE) AS p
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.day_idx, s.demand, s.rn,
             r.z * {1 - CROSTON_ALPHA} + {CROSTON_ALPHA} * CAST(s.demand AS DOUBLE),
             r.p * {1 - CROSTON_ALPHA} + {CROSTON_ALPHA} * CAST(s.q AS DOUBLE)
      FROM seq s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, day_idx, demand, z, p, z / p AS forecast
    FROM r
    """,
)
def q_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's intermittent-demand estimator over per-user daily
    purchase counts: smooth nonzero demand sizes (z) and inter-demand
    intervals (p) separately with α={CROSTON_ALPHA}; the demand-rate
    forecast after each observed demand is z/p.

    One map-side-combined (user, day) reduce keeps only nonzero
    demand days (the zeros never materialize — Croston's point);
    intervals come from a lag window on that reduced table; the
    sequential recurrence then walks mapInPandas with carried state
    (the q_ewma_batch shape — one shuffle, O(1) state, one Python
    call per Arrow batch). Demand and interval are exact integers so
    both engines walk the identical IEEE sequence, compared
    unrounded; the forecast is one correctly-rounded division."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    nz = ev.groupBy(
        "user_id",
        (
            F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01").cast("date")) + 1
        ).alias("day_idx"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("demand"))
    w = Window.partitionBy("user_id").orderBy("day_idx")
    seq = nz.select(
        "user_id",
        "day_idx",
        "demand",
        F.coalesce(
            F.col("day_idx") - F.lag("day_idx").over(w), F.col("day_idx")
        ).alias("q"),
    )
    return (
        seq.repartition("user_id")
        .sortWithinPartitions("user_id", "day_idx")
        .mapInPandas(_croston_partition, _SCHEMA)
    )
