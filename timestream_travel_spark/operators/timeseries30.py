"""Time-series wave (promoted into load_all()'s round-13 tail): volatility-stop and candle-body
indicators — the Chandelier exit (LeBeau, *Technical Traders Guide*,
1992 — ATR-trailed extrema stops), Qstick (Chande 1992, the candle-
body SMA) beside the per-day Balance of Power (Levine), and the
SuperTrend band-flip indicator (Olivier Seban's formulation of the
ATR trailing stop with hysteresis) as a carry-state walk.

Exactness:
- OHLC levels, true ranges and candle bodies stay exact DECIMAL (the
  timeseries15 substrate); rolling extrema are decimal window
  extrema; ATR is one flat division of a decimal frame sum;
- Chandelier and Qstick emit flat double expressions of those exact
  aggregates;
- Balance of Power (cl−op)/(hi−lo) is a SHORT RATIONAL per row — the
  documented quantization trap — so the per-row value is ONE flat
  division of exact decimals emitted unrounded, and its SMA
  left-associates a lag chain (the q_ease_of_movement fix), never a
  quantized frame sum;
- SuperTrend follows the q_trix walk contract: the band/trend
  recurrence runs in mapInPandas over a type-partitioned sort, and
  the oracle replays the identical IEEE sequence in a recursive CTE
  (inputs per row — midpoint, ATR, close — are bit-identical flat
  doubles first).

Scale shape: one (type, day/hour) reduce per query; windows and the
walk run on the bounded daily table.
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

CE_W = 14  # chandelier lookback = ATR window (days; fixture-scaled)
CE_K = 3  # chandelier ATR multiplier
QS_W = 8  # qstick / BoP smoothing width (days)
ST_W = 10  # supertrend ATR window (days)
ST_M = 3  # supertrend band multiplier

# daily OHLC + exact-DECIMAL true range (hi−lo vs gaps to prev close).
# The greatest() result is pinned to DECIMAL(21,4) explicitly:
# DuckDB's greatest over mixed-width decimal arguments silently
# promotes to DOUBLE (measured: the TR frame sums became inexact
# float sums and SuperTrend diverged at the ulp), while Spark keeps
# a common decimal type.
_TR_SQL = f"""
      SELECT t, day, hi, lo, cl, op,
             CAST(greatest(hi - lo,
                           abs(hi - lag(cl) OVER w),
                           abs(lo - lag(cl) OVER w))
                  AS DECIMAL(21,4)) AS tr,
             row_number() OVER w AS rn
      FROM ohlc
      WINDOW w AS (PARTITION BY t ORDER BY day)
"""


def _tr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ohlc = _daily_ohlc(spark, sf_dir)
    w = Window.partitionBy("t").orderBy("day")
    return ohlc.select(
        "t",
        "day",
        "hi",
        "lo",
        "cl",
        "op",
        F.greatest(
            F.col("hi") - F.col("lo"),
            F.abs(F.col("hi") - F.lag("cl").over(w)),
            F.abs(F.col("lo") - F.lag("cl").over(w)),
        )
        .cast("decimal(21,4)")
        .alias("tr"),
        F.row_number().over(w).alias("rn"),
    )


@query(
    "q_chandelier_exit",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), trr AS ({_TR_SQL}
    ), win AS (
      SELECT t, day, cl,
             MAX(hi) OVER fr AS hh, MIN(lo) OVER fr AS ll,
             SUM(tr) OVER fr AS str, COUNT(tr) OVER fr AS ntr
      FROM trr
      WINDOW fr AS (PARTITION BY t ORDER BY rn
                    ROWS BETWEEN {CE_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           round(CAST(CAST(hh AS VARCHAR) AS DOUBLE)
                 - {CE_K} * (CAST(CAST(str AS VARCHAR) AS DOUBLE) / ntr),
                 6) AS chandelier_long,
           round(CAST(CAST(ll AS VARCHAR) AS DOUBLE)
                 + {CE_K} * (CAST(CAST(str AS VARCHAR) AS DOUBLE) / ntr),
                 6) AS chandelier_short,
           CAST(CASE WHEN CAST(CAST(cl AS VARCHAR) AS DOUBLE)
                          > CAST(CAST(hh AS VARCHAR) AS DOUBLE)
                            - {CE_K} * (CAST(CAST(str AS VARCHAR) AS DOUBLE)
                                        / ntr)
                     THEN 1 ELSE 0 END AS INT) AS long_held
    FROM win WHERE ntr = {CE_W}
    """,
)
def q_chandelier_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chandelier exits on the daily OHLC: long stop = {CE_W}-day
    high − {CE_K}·ATR, short stop = {CE_W}-day low + {CE_K}·ATR
    (ATR = SMA of the exact-DECIMAL true range), plus whether the
    close still holds the long stop. Extrema and the TR sum stay
    DECIMAL; each emitted value is one flat double composition,
    gated on a full ATR frame."""
    trr = _tr(spark, sf_dir)
    fr = Window.partitionBy("t").orderBy("rn").rowsBetween(
        -(CE_W - 1), Window.currentRow
    )
    win = trr.select(
        "t",
        "day",
        "cl",
        F.max("hi").over(fr).alias("hh"),
        F.min("lo").over(fr).alias("ll"),
        F.sum("tr").over(fr).alias("str"),
        F.count("tr").over(fr).alias("ntr"),
    ).filter(F.col("ntr") == CE_W)
    atr = F.col("str").cast("double") / F.col("ntr")
    long_stop = F.col("hh").cast("double") - F.lit(CE_K) * atr
    return win.select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(long_stop, 6).alias("chandelier_long"),
        F.round(
            F.col("ll").cast("double") + F.lit(CE_K) * atr, 6
        ).alias("chandelier_short"),
        F.when(F.col("cl").cast("double") > long_stop, 1)
        .otherwise(0)
        .cast("int")
        .alias("long_held"),
    )


_QS_CHAIN = " + ".join(
    f"lag(bop, {i}) OVER (PARTITION BY t ORDER BY rn)" if i else "bop"
    for i in range(QS_W)
)


@query(
    "q_qstick_bop",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), rn AS (
      SELECT t, day, hi, lo, cl, op,
             row_number() OVER (PARTITION BY t ORDER BY day) AS rn
      FROM ohlc
    ), base AS (
      SELECT t, day, rn,
             SUM(cl - op) OVER (PARTITION BY t ORDER BY rn
                                ROWS BETWEEN {QS_W - 1} PRECEDING
                                AND CURRENT ROW) AS body_sum,
             COUNT(*) OVER (PARTITION BY t ORDER BY rn
                            ROWS BETWEEN {QS_W - 1} PRECEDING
                            AND CURRENT ROW) AS nw,
             CASE WHEN hi = lo THEN 0.0
                  ELSE CAST(CAST(cl - op AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(hi - lo AS VARCHAR) AS DOUBLE)
             END AS bop
      FROM rn
    ), chain AS (
      SELECT t, day, nw, body_sum, bop, ({_QS_CHAIN}) AS bop_chain
      FROM base
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           round(CAST(CAST(body_sum AS VARCHAR) AS DOUBLE) / nw, 6)
             AS qstick,
           bop,
           round(bop_chain / {QS_W}, 6) AS bop_sma
    FROM chain WHERE nw = {QS_W} AND bop_chain IS NOT NULL
    """,
)
def q_qstick_bop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qstick (SMA{QS_W} of the candle body cl−op, exact-DECIMAL
    frame sum, one division) and Balance of Power
    (cl−op)/(hi−lo) per day — a short rational, so it is emitted as
    ONE flat division of exact decimals (unrounded) and its SMA
    left-associates a lag chain rather than quantize-and-sum (the
    q_ease_of_movement lesson); a zero-range day pins BoP to 0."""
    ohlc = _daily_ohlc(spark, sf_dir)
    wn = Window.partitionBy("t").orderBy("day")
    rn = ohlc.withColumn("rn", F.row_number().over(wn))
    wr = Window.partitionBy("t").orderBy("rn")
    fr = wr.rowsBetween(-(QS_W - 1), Window.currentRow)
    bop = F.when(F.col("hi") == F.col("lo"), F.lit(0.0)).otherwise(
        (F.col("cl") - F.col("op")).cast("double")
        / (F.col("hi") - F.col("lo")).cast("double")
    )
    base = rn.select(
        "t",
        "day",
        "rn",
        F.sum(F.col("cl") - F.col("op")).over(fr).alias("body_sum"),
        F.count(F.lit(1)).over(fr).alias("nw"),
        bop.alias("bop"),
    )
    chain = F.col("bop")
    for i in range(1, QS_W):
        chain = chain + F.lag("bop", i).over(wr)
    out = base.select(
        "t", "day", "nw", "body_sum", "bop", chain.alias("bop_chain")
    ).filter((F.col("nw") == QS_W) & F.col("bop_chain").isNotNull())
    return out.select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.col("body_sum").cast("double") / F.col("nw"), 6).alias(
            "qstick"
        ),
        "bop",
        F.round(F.col("bop_chain") / F.lit(QS_W), 6).alias("bop_sma"),
    )


# ---------------------------------------------------------- SuperTrend
_ST_SCHEMA = (
    "event_type string, day string, supertrend double, trend int"
)


def _st_partition(batches):
    """Band/trend hysteresis walk over (mid, atr, cl) rows."""
    cur = None
    f_ub = f_lb = prev_cl = 0.0
    trend = 1
    for pdf in batches:
        types = pdf["t"].to_list()
        sts, trends = [], []
        for t, mid, atr, cl in zip(
            types, pdf["mid"].to_list(), pdf["atr"].to_list(), pdf["cl"].to_list()
        ):
            bub = mid + ST_M * atr
            blb = mid - ST_M * atr
            if t != cur:
                cur, f_ub, f_lb = t, bub, blb
                trend = 1 if cl > bub else -1
            else:
                if bub < f_ub or prev_cl > f_ub:
                    f_ub = bub
                if blb > f_lb or prev_cl < f_lb:
                    f_lb = blb
                if trend == 1:
                    trend = -1 if cl <= f_lb else 1
                else:
                    trend = 1 if cl >= f_ub else -1
            prev_cl = cl
            sts.append(f_lb if trend == 1 else f_ub)
            trends.append(trend)
        yield pd.DataFrame(
            {
                "event_type": types,
                "day": pdf["day"],
                "supertrend": sts,
                "trend": pd.array(trends, dtype="int32"),
            }
        )


@query(
    "q_supertrend",
    oracle=f"""
    WITH RECURSIVE ohlc AS ({_DAILY_OHLC_SQL}
    ), trr AS ({_TR_SQL}
    ), base AS (
      SELECT t, strftime(day, '%Y-%m-%d') AS day,
             CAST(CAST(hi + lo AS VARCHAR) AS DOUBLE) / 2.0 AS mid,
             CAST(CAST(SUM(tr) OVER fr AS VARCHAR) AS DOUBLE)
               / COUNT(tr) OVER fr AS atr,
             CAST(CAST(cl AS VARCHAR) AS DOUBLE) AS cl,
             COUNT(tr) OVER fr AS ntr
      FROM trr
      WINDOW fr AS (PARTITION BY t ORDER BY rn
                    ROWS BETWEEN {ST_W - 1} PRECEDING AND CURRENT ROW)
    ), s AS (
      SELECT t, day, mid, atr, cl,
             row_number() OVER (PARTITION BY t ORDER BY day) AS rn
      FROM base WHERE ntr = {ST_W}
    ), r AS (
      SELECT t, day, cl, rn,
             mid + {ST_M} * atr AS f_ub,
             mid - {ST_M} * atr AS f_lb,
             CASE WHEN cl > mid + {ST_M} * atr THEN 1 ELSE -1 END AS trend
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.t, s.day, s.cl, s.rn,
             CASE WHEN s.mid + {ST_M} * s.atr < r.f_ub OR r.cl > r.f_ub
                  THEN s.mid + {ST_M} * s.atr ELSE r.f_ub END,
             CASE WHEN s.mid - {ST_M} * s.atr > r.f_lb OR r.cl < r.f_lb
                  THEN s.mid - {ST_M} * s.atr ELSE r.f_lb END,
             CASE WHEN r.trend = 1 THEN
               CASE WHEN s.cl <= (CASE WHEN s.mid - {ST_M} * s.atr > r.f_lb
                                            OR r.cl < r.f_lb
                                       THEN s.mid - {ST_M} * s.atr
                                       ELSE r.f_lb END)
                    THEN -1 ELSE 1 END
             ELSE
               CASE WHEN s.cl >= (CASE WHEN s.mid + {ST_M} * s.atr < r.f_ub
                                            OR r.cl > r.f_ub
                                       THEN s.mid + {ST_M} * s.atr
                                       ELSE r.f_ub END)
                    THEN 1 ELSE -1 END
             END
      FROM s JOIN r ON s.t = r.t AND s.rn = r.rn + 1
    )
    SELECT t AS event_type, day,
           CASE WHEN trend = 1 THEN f_lb ELSE f_ub END AS supertrend,
           CAST(trend AS INT) AS trend
    FROM r
    """,
)
def q_supertrend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SuperTrend on the daily OHLC: ATR({ST_W})-width bands around
    the day midpoint with the ratchet-and-flip hysteresis (bands only
    tighten while respected; trend flips when the close crosses the
    ratcheted band). Per-row inputs (mid, ATR, close) are flat
    identical doubles; the walk is the q_trix mapInPandas contract
    with a recursive-CTE oracle replaying the same IEEE sequence;
    emitted once the ATR frame is full."""
    trr = _tr(spark, sf_dir)
    fr = Window.partitionBy("t").orderBy("rn").rowsBetween(
        -(ST_W - 1), Window.currentRow
    )
    base = trr.select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        ((F.col("hi") + F.col("lo")).cast("double") / F.lit(2.0)).alias("mid"),
        (F.sum("tr").over(fr).cast("double") / F.count("tr").over(fr)).alias(
            "atr"
        ),
        F.col("cl").cast("double").alias("cl"),
        F.count("tr").over(fr).alias("ntr"),
    ).filter(F.col("ntr") == ST_W)
    return (
        base.repartition("t")
        .sortWithinPartitions("t", "day")
        .mapInPandas(_st_partition, _ST_SCHEMA)
    )
