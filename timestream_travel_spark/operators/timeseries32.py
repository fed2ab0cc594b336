"""Promoted into load_all()'s round-13 tail: candle transforms — Heikin-Ashi smoothed candles
(the standard noise-reduced OHLC re-representation; Valcu, TASC
2004) and classic floor-trader pivot points (P/R1/S1/R2/S2 from the
prior day's range — the oldest published intraday support/resistance
levels).

Exactness: Heikin-Ashi is special among smoothers — its recurrence
is PURELY DYADIC (ha_close = (O+H+L+C)/4, ha_open = (prev ha_open +
prev ha_close)/2), so the walk stays bit-exact indefinitely on both
engines with no gain-choice caveat; extrema are comparisons of
identical doubles. Pivot points are flat compositions off one /3
division of exact decimals (correctly rounded identically), lagged
one day. Everything emits unrounded — the strictest form of the
cross-engine claim.

Scale shape: one (type, day[, hour]) reduce each; the walk and lag
run on the bounded daily table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.timeseries15 import (
    _DAILY_OHLC_SQL,
    _daily_ohlc,
)
from timestream_travel_spark.registry import query

_HA_SCHEMA = (
    "event_type string, day string, ha_open double, ha_high double,"
    " ha_low double, ha_close double"
)


def _ha_partition(batches):
    """Dyadic Heikin-Ashi walk."""
    cur = None
    ha_o = ha_c = 0.0
    for pdf in batches:
        types = pdf["t"].to_list()
        oo, hh, ll, cc = [], [], [], []
        for t, op, hi, lo, cl in zip(
            types,
            pdf["op"].to_list(),
            pdf["hi"].to_list(),
            pdf["lo"].to_list(),
            pdf["cl"].to_list(),
        ):
            nc = (op + hi + lo + cl) / 4.0
            if t != cur:
                cur = t
                no = (op + cl) / 2.0
            else:
                no = (ha_o + ha_c) / 2.0
            ha_o, ha_c = no, nc
            oo.append(no)
            cc.append(nc)
            hh.append(max(hi, no, nc))
            ll.append(min(lo, no, nc))
        yield pd.DataFrame(
            {
                "event_type": types,
                "day": pdf["day"],
                "ha_open": oo,
                "ha_high": hh,
                "ha_low": ll,
                "ha_close": cc,
            }
        )


@query(
    "q_heikin_ashi",
    oracle=f"""
    WITH RECURSIVE ohlc AS ({_DAILY_OHLC_SQL}
    ), s AS (
      SELECT t, strftime(day, '%Y-%m-%d') AS day,
             CAST(CAST(op AS VARCHAR) AS DOUBLE) AS op,
             CAST(CAST(hi AS VARCHAR) AS DOUBLE) AS hi,
             CAST(CAST(lo AS VARCHAR) AS DOUBLE) AS lo,
             CAST(CAST(cl AS VARCHAR) AS DOUBLE) AS cl,
             row_number() OVER (PARTITION BY t ORDER BY day) AS rn
      FROM ohlc
    ), r AS (
      SELECT t, day, hi, lo, rn,
             (op + cl) / 2.0 AS ha_open,
             (op + hi + lo + cl) / 4.0 AS ha_close
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.t, s.day, s.hi, s.lo, s.rn,
             (r.ha_open + r.ha_close) / 2.0,
             (s.op + s.hi + s.lo + s.cl) / 4.0
      FROM s JOIN r ON s.t = r.t AND s.rn = r.rn + 1
    )
    SELECT t AS event_type, day, ha_open,
           greatest(hi, ha_open, ha_close) AS ha_high,
           least(lo, ha_open, ha_close) AS ha_low,
           ha_close
    FROM r
    """,
)
def q_heikin_ashi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heikin-Ashi candles on the daily OHLC: ha_close =
    (O+H+L+C)/4, ha_open = midpoint of the PREVIOUS ha candle
    (seeded at (O+C)/2), ha_high/ha_low = extrema over {{hi/lo,
    ha_open, ha_close}}. The recurrence is purely dyadic, so the
    walk is bit-exact on both engines; emitted unrounded."""
    ohlc = _daily_ohlc(spark, sf_dir).select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("op").cast("double").alias("op"),
        F.col("hi").cast("double").alias("hi"),
        F.col("lo").cast("double").alias("lo"),
        F.col("cl").cast("double").alias("cl"),
    )
    return (
        ohlc.repartition("t")
        .sortWithinPartitions("t", "day")
        .mapInPandas(_ha_partition, _HA_SCHEMA)
    )


@query(
    "q_pivot_points",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), lagd AS (
      SELECT t, strftime(day, '%Y-%m-%d') AS day,
             CAST(CAST(lag(hi) OVER w AS VARCHAR) AS DOUBLE) AS ph,
             CAST(CAST(lag(lo) OVER w AS VARCHAR) AS DOUBLE) AS pl,
             CAST(CAST(lag(cl) OVER w AS VARCHAR) AS DOUBLE) AS pc
      FROM ohlc
      WINDOW w AS (PARTITION BY t ORDER BY day)
    )
    SELECT t AS event_type, day,
           (ph + pl + pc) / 3.0 AS pivot,
           2.0 * ((ph + pl + pc) / 3.0) - pl AS r1,
           2.0 * ((ph + pl + pc) / 3.0) - ph AS s1,
           (ph + pl + pc) / 3.0 + (ph - pl) AS r2,
           (ph + pl + pc) / 3.0 - (ph - pl) AS s2
    FROM lagd WHERE ph IS NOT NULL
    """,
)
def q_pivot_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic floor-trader pivots for each day from the PRIOR day's
    high/low/close: P = (H+L+C)/3, R1 = 2P−L, S1 = 2P−H, R2 = P +
    (H−L), S2 = P − (H−L). One /3 division of exact-decimal-sourced
    doubles; every level is a flat identically-shaped expression,
    emitted unrounded."""
    ohlc = _daily_ohlc(spark, sf_dir)
    w = Window.partitionBy("t").orderBy("day")
    lagd = ohlc.select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.lag("hi").over(w).cast("double").alias("ph"),
        F.lag("lo").over(w).cast("double").alias("pl"),
        F.lag("cl").over(w).cast("double").alias("pc"),
    ).filter(F.col("ph").isNotNull())
    p = (F.col("ph") + F.col("pl") + F.col("pc")) / F.lit(3.0)
    return lagd.select(
        F.col("t").alias("event_type"),
        "day",
        p.alias("pivot"),
        (F.lit(2.0) * p - F.col("pl")).alias("r1"),
        (F.lit(2.0) * p - F.col("ph")).alias("s1"),
        (p + (F.col("ph") - F.col("pl"))).alias("r2"),
        (p - (F.col("ph") - F.col("pl"))).alias("s2"),
    )
