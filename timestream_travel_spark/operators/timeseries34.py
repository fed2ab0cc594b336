"""Round-14 STAGED: the Parabolic SAR stop-and-reverse system
(Wilder, *New Concepts in Technical Trading Systems*, 1978) on the
daily OHLC — the classic accelerating trailing stop, and the last of
the canonical Wilder indicators still absent (RSI/ATR/ADX-precursor
DM census live in timeseries14/15/20).

Walk contract (the q_trix / q_supertrend pattern): the per-type
recurrence runs in mapInPandas over a type-partitioned sort, and the
DuckDB oracle replays the IDENTICAL IEEE sequence in a recursive
CTE. Per-row inputs are the OHLC levels crossed to double once (the
VARCHAR bridge on the oracle side); every step is the same ordered
float expression in both engines, so the walk is bit-exact and the
output is emitted unrounded.

State per type: trend (±1), sar, ep (extreme point), af
(acceleration {SAR_AF0} start, +{SAR_AF0} per new extreme, capped at
{SAR_AFMAX} via least() — the cap compares the ACCUMULATED float sum
identically in both engines). Convention (documented; variants
differ): the rising SAR is clamped to the PREVIOUS day's low (one
day, not Wilder's two), the flip assigns SAR = the old extreme
point, and day 1 seeds trend=+1, sar=lo₁, ep=hi₁.

Scale shape: one (type, day/hour) reduce; the walk runs per type on
the bounded daily table inside one Arrow batch.

Reference parity: none (cmd/backup.go has no indicator surface) —
north-star derived capability, sibling of timeseries30's SuperTrend.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.timeseries15 import (
    _DAILY_OHLC_SQL,
    _daily_ohlc,
)
from timestream_travel_spark.registry import query

SAR_AF0 = 0.02  # acceleration start / increment
SAR_AFMAX = 0.2  # acceleration cap

_SAR_SCHEMA = "event_type string, day string, psar double, trend int"


def _sar_partition(batches):
    """Wilder SAR walk over (hi, lo) rows, one type per run."""
    cur = None
    sar = ep = af = phi = plo = 0.0
    trend = 1
    for pdf in batches:
        types = pdf["t"].to_list()
        sars, trends = [], []
        for t, hi, lo in zip(types, pdf["hi"].to_list(), pdf["lo"].to_list()):
            if t != cur:
                cur, trend = t, 1
                sar, ep, af = lo, hi, SAR_AF0
            else:
                sar0 = sar + af * (ep - sar)
                if trend == 1:
                    sar1 = min(sar0, plo)
                    if lo < sar1:
                        trend, sar = -1, ep
                        ep, af = lo, SAR_AF0
                    else:
                        sar = sar1
                        if hi > ep:
                            ep, af = hi, min(af + SAR_AF0, SAR_AFMAX)
                else:
                    sar1 = max(sar0, phi)
                    if hi > sar1:
                        trend, sar = 1, ep
                        ep, af = hi, SAR_AF0
                    else:
                        sar = sar1
                        if lo < ep:
                            ep, af = lo, min(af + SAR_AF0, SAR_AFMAX)
            phi, plo = hi, lo
            sars.append(sar)
            trends.append(trend)
        yield pd.DataFrame(
            {
                "event_type": types,
                "day": pdf["day"],
                "psar": sars,
                "trend": pd.array(trends, dtype="int32"),
            }
        )


@query(
    "q_parabolic_sar",
    oracle=f"""
    WITH RECURSIVE ohlc AS ({_DAILY_OHLC_SQL}
    ), s AS (
      SELECT t, strftime(day, '%Y-%m-%d') AS day,
             CAST(CAST(hi AS VARCHAR) AS DOUBLE) AS hi,
             CAST(CAST(lo AS VARCHAR) AS DOUBLE) AS lo,
             row_number() OVER (PARTITION BY t ORDER BY day) AS rn
      FROM ohlc
    ), r AS (
      SELECT t, day, rn, hi, lo,
             lo AS sar, hi AS ep,
             CAST({SAR_AF0} AS DOUBLE) AS af, 1 AS trend
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.t, s.day, s.rn, s.hi, s.lo,
             CASE WHEN r.trend = 1 THEN
               CASE WHEN s.lo < least(r.sar + r.af * (r.ep - r.sar), r.lo)
                    THEN r.ep
                    ELSE least(r.sar + r.af * (r.ep - r.sar), r.lo) END
             ELSE
               CASE WHEN s.hi > greatest(r.sar + r.af * (r.ep - r.sar), r.hi)
                    THEN r.ep
                    ELSE greatest(r.sar + r.af * (r.ep - r.sar), r.hi) END
             END,
             CASE WHEN r.trend = 1 THEN
               CASE WHEN s.lo < least(r.sar + r.af * (r.ep - r.sar), r.lo)
                    THEN s.lo
                    ELSE greatest(r.ep, s.hi) END
             ELSE
               CASE WHEN s.hi > greatest(r.sar + r.af * (r.ep - r.sar), r.hi)
                    THEN s.hi
                    ELSE least(r.ep, s.lo) END
             END,
             CASE WHEN r.trend = 1 THEN
               CASE WHEN s.lo < least(r.sar + r.af * (r.ep - r.sar), r.lo)
                    THEN CAST({SAR_AF0} AS DOUBLE)
                    WHEN s.hi > r.ep
                    THEN least(r.af + {SAR_AF0}, {SAR_AFMAX})
                    ELSE r.af END
             ELSE
               CASE WHEN s.hi > greatest(r.sar + r.af * (r.ep - r.sar), r.hi)
                    THEN CAST({SAR_AF0} AS DOUBLE)
                    WHEN s.lo < r.ep
                    THEN least(r.af + {SAR_AF0}, {SAR_AFMAX})
                    ELSE r.af END
             END,
             CASE WHEN r.trend = 1 THEN
               CASE WHEN s.lo < least(r.sar + r.af * (r.ep - r.sar), r.lo)
                    THEN -1 ELSE 1 END
             ELSE
               CASE WHEN s.hi > greatest(r.sar + r.af * (r.ep - r.sar), r.hi)
                    THEN 1 ELSE -1 END
             END
      FROM s JOIN r ON s.t = r.t AND s.rn = r.rn + 1
    )
    SELECT t AS event_type, day, sar AS psar, CAST(trend AS INT) AS trend
    FROM r
    """,
)
def q_parabolic_sar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parabolic SAR per type-day (module docstring): bit-exact
    accelerating trailing-stop walk under the q_trix mapInPandas /
    recursive-CTE contract, emitted unrounded with the trend sign."""
    ohlc = _daily_ohlc(spark, sf_dir)
    base = ohlc.select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("hi").cast("double").alias("hi"),
        F.col("lo").cast("double").alias("lo"),
    )
    return (
        base.repartition("t")
        .sortWithinPartitions("t", "day")
        .mapInPandas(_sar_partition, _SAR_SCHEMA)
    )
