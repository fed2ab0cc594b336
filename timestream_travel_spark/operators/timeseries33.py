"""Round-14 STAGED time-series wave: directional / momentum / trend
indicators over the daily OHLC substrate — the Vortex indicator
(Botes & Siepman, *Technical Analysis of Stocks & Commodities* 2010),
the Awesome Oscillator (Bill Williams' 5/34 midpoint-SMA spread,
fixture-scaled to {AO_FAST}/{AO_SLOW}), and the Choppiness index
(E.W. Dreiss; range-compression log ratio).

Exactness:
- the vortex movements |hi − lo_prev| / |lo − hi_prev| and the true
  range stay exact DECIMAL (the timeseries15/30 substrate, TR pinned
  to DECIMAL(21,4) — the DuckDB greatest() promotion trap); VI± is
  ONE flat double division of two decimal frame sums;
- the Awesome Oscillator never divides per row: with mid2 = hi+lo
  (twice the midpoint, exact decimal), AO = SMA_f(mid) − SMA_s(mid)
  = ({AO_SLOW}·Σ_f mid2 − {AO_FAST}·Σ_s mid2) / {AO_DEN} — an exact
  decimal numerator and ONE flat division (the q_ease_of_movement /
  q_awesome pattern: short-rational SMAs are never quantized);
- Choppiness = 100·ln(ΣTR/(hh−ll))/ln({CH_W}): the ln argument is
  one correctly-rounded division of exact decimals, and the emitted
  value is quantized to 6dp AFTER the ln (irrational terms are safe
  to quantize — the Monroe/llm_text29 rule; flat hh=ll windows are
  excluded identically in both engines).

Scale shape: one (type, day/hour) reduce per query; frames run on
the bounded daily table — no raw-row windows anywhere.

Reference parity: none (cmd/backup.go has no indicator surface) —
north-star derived capability, sibling of timeseries29/30.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.timeseries15 import (
    _DAILY_OHLC_SQL,
    _daily_ohlc,
)
from timestream_travel_spark.operators.timeseries30 import _TR_SQL, _tr
from timestream_travel_spark.registry import query

VX_W = 14  # vortex lookback (days)
CH_W = 14  # choppiness lookback (days)
AO_FAST = 5  # awesome-oscillator fast SMA (days; fixture-scaled 5/34)
AO_SLOW = 13  # awesome-oscillator slow SMA (days)
AO_DEN = 2 * AO_FAST * AO_SLOW  # one flat division: /2 (midpoint) ×
# the two SMA widths, folded into a single exact denominator


@query(
    "q_vortex_indicator",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), trr AS ({_TR_SQL}
    ), vm AS (
      SELECT t, day, rn, tr,
             CAST(abs(hi - lag(lo) OVER w) AS DECIMAL(21,4)) AS vmp,
             CAST(abs(lo - lag(hi) OVER w) AS DECIMAL(21,4)) AS vmm
      FROM trr
      WINDOW w AS (PARTITION BY t ORDER BY rn)
    ), win AS (
      SELECT t, day,
             SUM(vmp) OVER fr AS svp, SUM(vmm) OVER fr AS svm,
             SUM(tr) OVER fr AS str, COUNT(vmp) OVER fr AS nv
      FROM vm
      WINDOW fr AS (PARTITION BY t ORDER BY rn
                    ROWS BETWEEN {VX_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           round(CAST(CAST(svp AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(str AS VARCHAR) AS DOUBLE), 6) AS vi_plus,
           round(CAST(CAST(svm AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(str AS VARCHAR) AS DOUBLE), 6) AS vi_minus
    FROM win WHERE nv = {VX_W} AND str > 0
    """,
)
def q_vortex_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vortex VI+/VI− per type-day: {VX_W}-day decimal frame sums of
    the vortex movements over the same-frame true-range sum, one flat
    double division each (module docstring)."""
    trr = _tr(spark, sf_dir)
    w = Window.partitionBy("t").orderBy("rn")
    vm = trr.select(
        "t",
        "day",
        "rn",
        "tr",
        F.abs(F.col("hi") - F.lag("lo").over(w)).cast("decimal(21,4)").alias("vmp"),
        F.abs(F.col("lo") - F.lag("hi").over(w)).cast("decimal(21,4)").alias("vmm"),
    )
    fr = (
        Window.partitionBy("t")
        .orderBy("rn")
        .rowsBetween(-(VX_W - 1), Window.currentRow)
    )
    win = vm.select(
        "t",
        "day",
        F.sum("vmp").over(fr).alias("svp"),
        F.sum("vmm").over(fr).alias("svm"),
        F.sum("tr").over(fr).alias("str"),
        F.count("vmp").over(fr).alias("nv"),
    )
    return (
        win.filter((F.col("nv") == VX_W) & (F.col("str") > 0))
        .select(
            F.col("t").alias("event_type"),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(
                F.col("svp").cast("double") / F.col("str").cast("double"), 6
            ).alias("vi_plus"),
            F.round(
                F.col("svm").cast("double") / F.col("str").cast("double"), 6
            ).alias("vi_minus"),
        )
    )


@query(
    "q_awesome_oscillator",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), mid AS (
      SELECT t, day, CAST(hi + lo AS DECIMAL(21,4)) AS mid2,
             row_number() OVER (PARTITION BY t ORDER BY day) AS rn
      FROM ohlc
    ), win AS (
      SELECT t, day,
             SUM(mid2) OVER ff AS sf, SUM(mid2) OVER fs AS ss,
             COUNT(*) OVER fs AS ns
      FROM mid
      WINDOW ff AS (PARTITION BY t ORDER BY rn
                    ROWS BETWEEN {AO_FAST - 1} PRECEDING AND CURRENT ROW),
             fs AS (PARTITION BY t ORDER BY rn
                    ROWS BETWEEN {AO_SLOW - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           round(CAST(CAST(CAST({AO_SLOW} * sf - {AO_FAST} * ss
                                AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)
                 / {AO_DEN}.0, 6) AS awesome_osc
    FROM win WHERE ns = {AO_SLOW}
    """,
)
def q_awesome_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Awesome Oscillator per type-day: {AO_FAST}-day minus
    {AO_SLOW}-day midpoint SMA, computed as ONE flat division of the
    exact decimal cross-multiplied frame sums (module docstring)."""
    ohlc = _daily_ohlc(spark, sf_dir)
    w = Window.partitionBy("t").orderBy("day")
    mid = ohlc.select(
        "t",
        "day",
        (F.col("hi") + F.col("lo")).cast("decimal(21,4)").alias("mid2"),
        F.row_number().over(w).alias("rn"),
    )
    ff = (
        Window.partitionBy("t")
        .orderBy("rn")
        .rowsBetween(-(AO_FAST - 1), Window.currentRow)
    )
    fs = (
        Window.partitionBy("t")
        .orderBy("rn")
        .rowsBetween(-(AO_SLOW - 1), Window.currentRow)
    )
    win = mid.select(
        "t",
        "day",
        F.sum("mid2").over(ff).alias("sf"),
        F.sum("mid2").over(fs).alias("ss"),
        F.count(F.lit(1)).over(fs).alias("ns"),
    )
    return (
        win.filter(F.col("ns") == AO_SLOW)
        .select(
            F.col("t").alias("event_type"),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(
                (F.lit(AO_SLOW) * F.col("sf") - F.lit(AO_FAST) * F.col("ss"))
                .cast("decimal(38,4)")
                .cast("double")
                / F.lit(float(AO_DEN)),
                6,
            ).alias("awesome_osc"),
        )
    )


@query(
    "q_choppiness_index",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), trr AS ({_TR_SQL}
    ), win AS (
      SELECT t, day,
             SUM(tr) OVER fr AS str, COUNT(tr) OVER fr AS ntr,
             MAX(hi) OVER fr AS hh, MIN(lo) OVER fr AS ll
      FROM trr
      WINDOW fr AS (PARTITION BY t ORDER BY rn
                    ROWS BETWEEN {CH_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           round(100.0 * ln(CAST(CAST(str AS VARCHAR) AS DOUBLE)
                            / CAST(CAST(CAST(hh - ll AS DECIMAL(21,4))
                                        AS VARCHAR) AS DOUBLE))
                 / ln(CAST({CH_W} AS DOUBLE)), 6) AS choppiness
    FROM win WHERE ntr = {CH_W} AND hh > ll AND str > 0
    """,
)
def q_choppiness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Choppiness index per type-day: 100·ln(ΣTR/range)/ln({CH_W})
    over the {CH_W}-day frame — exact decimal frame statistics, one
    flat division, 6dp quantized after the ln (module docstring)."""
    trr = _tr(spark, sf_dir)
    fr = (
        Window.partitionBy("t")
        .orderBy("rn")
        .rowsBetween(-(CH_W - 1), Window.currentRow)
    )
    win = trr.select(
        "t",
        "day",
        F.sum("tr").over(fr).alias("str"),
        F.count("tr").over(fr).alias("ntr"),
        F.max("hi").over(fr).alias("hh"),
        F.min("lo").over(fr).alias("ll"),
    )
    return (
        win.filter(
            (F.col("ntr") == CH_W) & (F.col("hh") > F.col("ll")) & (F.col("str") > 0)
        )
        .select(
            F.col("t").alias("event_type"),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(
                F.lit(100.0)
                * F.log(
                    F.col("str").cast("double")
                    / (F.col("hh") - F.col("ll")).cast("decimal(21,4)").cast("double")
                )
                / F.log(F.lit(float(CH_W))),
                6,
            ).alias("choppiness"),
        )
    )
