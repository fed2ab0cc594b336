"""Round-12 time-series wave: the classical indicators the r8–r11
indicator families left open — Elder Ray bull/bear power (Elder,
*Trading for a Living*, 1993), the Mass index (Dorsey, Technical
Analysis of S&C 1992 — EMA-ratio range-bulge detector), Ease of
Movement (Arms, *Volume Cycles in the Stock Market*, 1989), the Know
Sure Thing composite momentum (Pring, *Martin Pring on Market
Momentum*, 1992), and the Stochastic RSI (Chande & Kroll, *The New
Technical Trader*, 1994) on top of the established Cutler RSI.

Exactness design:
- daily levels / OHLC stay exact DECIMAL (the timeseries15
  substrate); ranges, midpoint moves and gain/loss splits are
  DECIMAL end-to-end;
- EMA-based indicators (Elder Ray, Mass index) reuse q_trix's walk
  contract exactly — one binary-exact-gain (α={EMA_A}) carry-state
  walk per type via mapInPandas over a type-partitioned sort, with a
  recursive-CTE oracle replaying the identical IEEE sequence;
- per-row irrational terms (EMA ratios, EMV, ROCs) quantize to
  DECIMAL(24,12) BEFORE any rolling-frame sum (order-independence);
  the emitted statistic is one flat double expression;
- Stochastic RSI composes q_rsi_indicator's flat per-row RSI double
  (identical on both engines) with window extrema over those
  identical doubles — no new float risk; the degenerate flat-window
  case (max = min) pins to 0.

Scale shape: one (type, day[, hour]) reduce per query is the only
event-table pass; walks and windows run on the bounded daily table
(the timeseries27 argument). Deviation note: classical parameter
sets (13/9/25-period EMAs, Wilder RSI smoothing) are replaced by the
repo's binary-exact α and the established Cutler RSI — documented
parameter swaps, not semantic ones.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.analytics2 import RSI_PERIOD
from timestream_travel_spark.operators.timeseries15 import (
    _DAILY_OHLC_SQL,
    _DAILY_SQL,
    _daily,
    _daily_ohlc,
)
from timestream_travel_spark.registry import query

EMA_A = 0.25  # binary-exact EMA gain (the q_trix/q_dema_tema contract)
MASS_W = 25  # Mass index rolling-sum width (days)
EMV_W = 14  # Ease-of-Movement SMA width (days)
STOCH_W = 14  # Stochastic RSI lookback (days)
# KST lags/smoothers scaled to the 30-day fixture span (classical
# 10/15/20/30 with 10/10/10/15 SMAs would gate out every row); the
# 1:2:3:4 weighting and the ROC→SMA→weighted-sum composition are
# unchanged.
KST_LAGS = (5, 7, 9, 12)  # KST ROC lags (days)
KST_SMA = (5, 5, 5, 7)  # KST per-ROC smoothing widths


# --------------------------------------------------------- Elder Ray
_ER_SCHEMA = "event_type string, day string, bull_power double, bear_power double"


def _er_partition(batches):
    """Single-EMA walk over the daily close; emits hi−EMA / lo−EMA."""
    cur, e1 = None, 0.0
    for pdf in batches:
        types = pdf["t"].to_list()
        bulls, bears = [], []
        for t, cl, hi, lo in zip(
            types, pdf["cl"].to_list(), pdf["hi"].to_list(), pdf["lo"].to_list()
        ):
            if t != cur:
                cur, e1 = t, cl
            else:
                e1 = (1 - EMA_A) * e1 + EMA_A * cl
            bulls.append(hi - e1)
            bears.append(lo - e1)
        yield pd.DataFrame(
            {
                "event_type": types,
                "day": pdf["day"],
                "bull_power": bulls,
                "bear_power": bears,
            }
        )


@query(
    "q_elder_ray",
    oracle=f"""
    WITH RECURSIVE ohlc AS ({_DAILY_OHLC_SQL}
    ), s AS (
      SELECT t, strftime(day, '%Y-%m-%d') AS day,
             CAST(CAST(cl AS VARCHAR) AS DOUBLE) AS cl,
             CAST(CAST(hi AS VARCHAR) AS DOUBLE) AS hi,
             CAST(CAST(lo AS VARCHAR) AS DOUBLE) AS lo,
             row_number() OVER (PARTITION BY t ORDER BY day) AS rn
      FROM ohlc
    ), r AS (
      SELECT t, day, hi, lo, rn, cl AS e1 FROM s WHERE rn = 1
      UNION ALL
      SELECT s.t, s.day, s.hi, s.lo, s.rn,
             {1 - EMA_A} * r.e1 + {EMA_A} * s.cl
      FROM s JOIN r ON s.t = r.t AND s.rn = r.rn + 1
    )
    SELECT t AS event_type, day,
           hi - e1 AS bull_power, lo - e1 AS bear_power
    FROM r
    """,
)
def q_elder_ray(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elder Ray on the daily OHLC of the hourly level series: bull
    power = high − EMA(close), bear power = low − EMA(close)
    (α={EMA_A}, binary-exact walk). Positive bull power with negative
    bear power is Elder's trending-range signature. Same IEEE walk on
    both engines; unrounded."""
    ohlc = _daily_ohlc(spark, sf_dir).select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("cl").cast("double").alias("cl"),
        F.col("hi").cast("double").alias("hi"),
        F.col("lo").cast("double").alias("lo"),
    )
    return (
        ohlc.repartition("t")
        .sortWithinPartitions("t", "day")
        .mapInPandas(_er_partition, _ER_SCHEMA)
    )


# --------------------------------------------------------- Mass index
_MI_SCHEMA = "t string, day string, ratio double"


def _mi_partition(batches):
    """Double-EMA walk over the daily range; emits EMA/EMA-of-EMA."""
    cur, e1, e2 = None, 0.0, 0.0
    for pdf in batches:
        types = pdf["t"].to_list()
        ratios = []
        for t, rg in zip(types, pdf["rg"].to_list()):
            if t != cur:
                cur, e1, e2 = t, rg, rg
            else:
                e1 = (1 - EMA_A) * e1 + EMA_A * rg
                e2 = (1 - EMA_A) * e2 + EMA_A * e1
            ratios.append(e1 / e2 if e2 != 0.0 else 1.0)
        yield pd.DataFrame({"t": types, "day": pdf["day"], "ratio": ratios})


@query(
    "q_mass_index",
    oracle=f"""
    WITH RECURSIVE ohlc AS ({_DAILY_OHLC_SQL}
    ), s AS (
      SELECT t, strftime(day, '%Y-%m-%d') AS day,
             CAST(CAST(hi - lo AS VARCHAR) AS DOUBLE) AS rg,
             row_number() OVER (PARTITION BY t ORDER BY day) AS rn
      FROM ohlc
    ), r AS (
      SELECT t, day, rn, rg AS e1, rg AS e2 FROM s WHERE rn = 1
      UNION ALL
      SELECT s.t, s.day, s.rn,
             {1 - EMA_A} * r.e1 + {EMA_A} * s.rg,
             {1 - EMA_A} * r.e2
               + {EMA_A} * ({1 - EMA_A} * r.e1 + {EMA_A} * s.rg)
      FROM s JOIN r ON s.t = r.t AND s.rn = r.rn + 1
    ), q AS (
      SELECT t, day, rn,
             CAST(CASE WHEN e2 = 0 THEN 1.0 ELSE e1 / e2 END
                  AS DECIMAL(24,12)) AS ratio
      FROM r
    ), win AS (
      SELECT t, day,
             SUM(ratio) OVER w AS mass,
             COUNT(*) OVER w AS nw
      FROM q
      WINDOW w AS (PARTITION BY t ORDER BY rn
                   ROWS BETWEEN {MASS_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type, day,
           CAST(CAST(mass AS VARCHAR) AS DOUBLE) AS mass_index
    FROM win WHERE nw = {MASS_W}
    """,
)
def q_mass_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mass index: Σ over the trailing {MASS_W} days of
    EMA(range)/EMA(EMA(range)) (α={EMA_A} walks, same IEEE sequence
    both engines). Range-bulge values well above the window width
    flag volatility expansions. Each ratio quantizes to
    DECIMAL(24,12) before the exact frame sum; emitted once the
    frame is full."""
    ohlc = _daily_ohlc(spark, sf_dir).select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.col("hi") - F.col("lo")).cast("double").alias("rg"),
    )
    ratios = (
        ohlc.repartition("t")
        .sortWithinPartitions("t", "day")
        .mapInPandas(_mi_partition, _MI_SCHEMA)
        .withColumn("ratio", F.col("ratio").cast("decimal(24,12)"))
    )
    wn = Window.partitionBy("t").orderBy("day")
    w = wn.rowsBetween(-(MASS_W - 1), Window.currentRow)
    return (
        ratios.select(
            "t",
            "day",
            F.sum("ratio").over(w).alias("mass"),
            F.count(F.lit(1)).over(w).alias("nw"),
        )
        .filter(F.col("nw") == MASS_W)
        .select(
            F.col("t").alias("event_type"),
            "day",
            F.col("mass").cast("double").alias("mass_index"),
        )
    )


# --------------------------------------------------- Ease of Movement
_EMV_CHAIN = " + ".join(
    f"lag(emv, {i}) OVER (PARTITION BY t ORDER BY rn)" if i else "emv"
    for i in range(EMV_W)
)


@query(
    "q_ease_of_movement",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), vol AS (
      SELECT event_type AS t, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS vol
      FROM events GROUP BY 1, 2
    ), mid AS (
      SELECT o.t, o.day, v.vol,
             CAST(CAST(o.hi + o.lo AS DECIMAL(15,4))
                  - CAST(lag(o.hi + o.lo)
                         OVER (PARTITION BY o.t ORDER BY o.day)
                         AS DECIMAL(15,4))
                  AS DECIMAL(15,4))
               * CAST(o.hi - o.lo AS DECIMAL(15,4)) AS n,
             row_number() OVER (PARTITION BY o.t ORDER BY o.day) AS rn
      FROM ohlc o JOIN vol v ON v.t = o.t AND v.day = o.day
    ), emv AS (
      SELECT t, day, rn,
             CAST(CAST(n AS VARCHAR) AS DOUBLE) / (2 * vol) AS emv
      FROM mid WHERE n IS NOT NULL
    ), win AS (
      SELECT t, day, emv, rn, ({_EMV_CHAIN}) AS s
      FROM emv
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day, emv,
           round(s / {EMV_W}, 6) AS emv_sma
    FROM win WHERE s IS NOT NULL
    """,
)
def q_ease_of_movement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arms' Ease of Movement on the daily OHLC: EMV = midpoint move
    × box ratio = (Δ(hi+lo)·(hi−lo)) / (2·volume), volume = the
    day's event count. The numerator is one exact DECIMAL product
    (operands rescaled to DECIMAL(15,4) so the product's precision
    31 < 38 — no engine rounds it), so each EMV is ONE flat division
    of identical doubles. The {EMV_W}-day SMA left-associates an
    explicit lag chain (the analytics11 _chain_add idiom) instead of
    quantize-and-frame-sum: a per-row double→DECIMAL quantization is
    the registry's documented half-boundary trap precisely on this
    short-rational input class (measured here: repeating-6 rationals
    flipping at the 12th digit)."""
    ohlc = _daily_ohlc(spark, sf_dir)
    from timestream_travel_spark.tables import load_table

    vol = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"), F.date_trunc("day", "ts").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("vol"))
    )
    wn = Window.partitionBy("t").orderBy("day")
    hl2 = (F.col("hi") + F.col("lo")).cast("decimal(15,4)")
    n = (hl2 - F.lag(hl2).over(wn)).cast("decimal(15,4)") * (
        F.col("hi") - F.col("lo")
    ).cast("decimal(15,4)")
    mid = (
        ohlc.join(vol, ["t", "day"])
        .select(
            "t",
            "day",
            "vol",
            n.alias("n"),
            F.row_number().over(wn).alias("rn"),
        )
        .filter(F.col("n").isNotNull())
    )
    emv = mid.select(
        "t",
        "day",
        "rn",
        (F.col("n").cast("double") / (F.lit(2) * F.col("vol"))).alias("emv"),
    )
    wr = Window.partitionBy("t").orderBy("rn")
    chain = F.col("emv")
    for i in range(1, EMV_W):
        chain = chain + F.lag("emv", i).over(wr)
    win = emv.select("t", "day", "emv", chain.alias("s")).filter(
        F.col("s").isNotNull()
    )
    return win.select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "emv",
        F.round(F.col("s") / F.lit(EMV_W), 6).alias("emv_sma"),
    )


# ------------------------------------------------------ Know Sure Thing
def _kst_roc_sql(i: int, lag: int, sma: int) -> str:
    return f"""
      roc{i} AS (
        SELECT t, day, rn,
               CAST(CAST(CAST(v AS VARCHAR) AS DOUBLE)
                    / CAST(CAST(lag(v, {lag}) OVER (PARTITION BY t ORDER BY rn)
                                AS VARCHAR) AS DOUBLE) - 1.0
                    AS DECIMAL(24,12)) AS roc
        FROM s
      ), sma{i} AS (
        SELECT t, day, rn,
               SUM(roc) OVER w AS sr,
               COUNT(roc) OVER w AS nr
        FROM roc{i}
        WINDOW w AS (PARTITION BY t ORDER BY rn
                     ROWS BETWEEN {sma - 1} PRECEDING AND CURRENT ROW)
      )"""


@query(
    "q_kst",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), s AS (
      SELECT t, strftime(day, '%Y-%m-%d') AS day, v,
             row_number() OVER (PARTITION BY t ORDER BY day) AS rn
      FROM daily
    ), {','.join(_kst_roc_sql(i, lag, sma).lstrip() for i, (lag, sma) in enumerate(zip(KST_LAGS, KST_SMA)))}
    SELECT s0.t AS event_type, s0.day,
           round(1.0 * CAST(CAST(s0.sr AS VARCHAR) AS DOUBLE) / s0.nr
                 + 2.0 * CAST(CAST(s1.sr AS VARCHAR) AS DOUBLE) / s1.nr
                 + 3.0 * CAST(CAST(s2.sr AS VARCHAR) AS DOUBLE) / s2.nr
                 + 4.0 * CAST(CAST(s3.sr AS VARCHAR) AS DOUBLE) / s3.nr,
                 6) AS kst
    FROM sma0 s0
    JOIN sma1 s1 ON s1.t = s0.t AND s1.rn = s0.rn
    JOIN sma2 s2 ON s2.t = s0.t AND s2.rn = s0.rn
    JOIN sma3 s3 ON s3.t = s0.t AND s3.rn = s0.rn
    WHERE s0.rn > {max(lag + sma - 1 for lag, sma in zip(KST_LAGS, KST_SMA))}
    """,
)
def q_kst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pring's Know Sure Thing: KST = Σᵢ (i+1)·SMA_mᵢ(ROC_lagᵢ) with
    lags {KST_LAGS} and smoothing widths {KST_SMA} on the daily
    level. Each ROC = v/v_lag − 1 quantizes to DECIMAL(24,12); the
    SMAs are exact frame sums; the weighted composite is one flat
    double expression, emitted once every frame is full of real
    ROCs (rn gate)."""
    daily = _daily(spark, sf_dir).select(
        "t", F.date_format("day", "yyyy-MM-dd").alias("day"), "v"
    )
    wn = Window.partitionBy("t").orderBy("day")
    s = daily.withColumn("rn", F.row_number().over(wn))
    out = None
    gate = max(lag + sma - 1 for lag, sma in zip(KST_LAGS, KST_SMA))
    for i, (lag, sma) in enumerate(zip(KST_LAGS, KST_SMA)):
        wr = Window.partitionBy("t").orderBy("rn")
        roc = s.select(
            "t",
            "day",
            "rn",
            (
                F.col("v").cast("double") / F.lag("v", lag).over(wr).cast("double")
                - F.lit(1.0)
            )
            .cast("decimal(24,12)")
            .alias("roc"),
        )
        wf = wr.rowsBetween(-(sma - 1), Window.currentRow)
        part = roc.select(
            "t",
            "day",
            "rn",
            F.sum("roc").over(wf).alias(f"sr{i}"),
            F.count("roc").over(wf).alias(f"nr{i}"),
        )
        out = part if out is None else out.join(
            part.drop("day"), ["t", "rn"]
        )
    kst = (
        F.lit(1.0) * F.col("sr0").cast("double") / F.col("nr0")
        + F.lit(2.0) * F.col("sr1").cast("double") / F.col("nr1")
        + F.lit(3.0) * F.col("sr2").cast("double") / F.col("nr2")
        + F.lit(4.0) * F.col("sr3").cast("double") / F.col("nr3")
    )
    return out.filter(F.col("rn") > gate).select(
        F.col("t").alias("event_type"),
        "day",
        F.round(kst, 6).alias("kst"),
    )


# ----------------------------------------------------- Stochastic RSI
@query(
    "q_stochastic_rsi",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             SUM(CAST(value AS DECIMAL(20,4))) AS v
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ), delta AS (
      SELECT event_type, day,
             v - lag(v) OVER (PARTITION BY event_type ORDER BY day) AS d,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ), gl AS (
      SELECT event_type, day, rn,
             CASE WHEN d > 0 THEN d ELSE CAST(0 AS DECIMAL(21,4)) END AS gain,
             CASE WHEN d < 0 THEN -d ELSE CAST(0 AS DECIMAL(21,4)) END AS loss
      FROM delta WHERE d IS NOT NULL
    ), sma AS (
      SELECT event_type, day, rn,
             SUM(gain) OVER w AS sg, SUM(loss) OVER w AS sl,
             COUNT(*) OVER w AS nw
      FROM gl
      WINDOW w AS (PARTITION BY event_type ORDER BY rn
                   ROWS BETWEEN {RSI_PERIOD - 1} PRECEDING AND CURRENT ROW)
    ), rsi AS (
      SELECT event_type, day, rn,
             CASE WHEN sl = 0 THEN CAST(100 AS DOUBLE)
                  ELSE 100 - 100 / (1 + CAST(sg AS DOUBLE) / CAST(sl AS DOUBLE))
             END AS rsi
      FROM sma WHERE nw = {RSI_PERIOD}
    ), st AS (
      SELECT event_type, day, rsi,
             MIN(rsi) OVER w AS mn, MAX(rsi) OVER w AS mx,
             COUNT(*) OVER w AS nw
      FROM rsi
      WINDOW w AS (PARTITION BY event_type ORDER BY rn
                   ROWS BETWEEN {STOCH_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           round(rsi, 6) AS rsi,
           round(CASE WHEN mx = mn THEN 0.0
                 ELSE (rsi - mn) / (mx - mn) END, 6) AS stoch_rsi
    FROM st WHERE nw = {STOCH_W}
    """,
)
def q_stochastic_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic RSI: (RSI − min)/(max − min) over the trailing
    {STOCH_W} RSI values, on top of q_rsi_indicator's Cutler RSI.
    The RSI doubles are identical on both engines (one flat division
    from DECIMAL gains/losses), so the window extrema and the final
    normalization are float-risk-free; a flat window (max = min)
    pins to 0."""
    from timestream_travel_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(20,4)")).alias("v"))
    wn = Window.partitionBy("event_type").orderBy("day")
    delta = daily.select(
        "event_type",
        "day",
        (F.col("v") - F.lag("v").over(wn)).alias("d"),
        F.row_number().over(wn).alias("rn"),
    ).filter(F.col("d").isNotNull())
    zero = F.lit(0).cast("decimal(21,4)")
    gl = delta.select(
        "event_type",
        "day",
        "rn",
        F.when(F.col("d") > 0, F.col("d")).otherwise(zero).alias("gain"),
        F.when(F.col("d") < 0, -F.col("d")).otherwise(zero).alias("loss"),
    )
    wf = Window.partitionBy("event_type").orderBy("rn").rowsBetween(
        -(RSI_PERIOD - 1), Window.currentRow
    )
    sma = gl.select(
        "event_type",
        "day",
        "rn",
        F.sum("gain").over(wf).alias("sg"),
        F.sum("loss").over(wf).alias("sl"),
        F.count(F.lit(1)).over(wf).alias("nw"),
    ).filter(F.col("nw") == RSI_PERIOD)
    rsi = sma.select(
        "event_type",
        "day",
        "rn",
        F.when(F.col("sl") == 0, F.lit(100.0))
        .otherwise(
            F.lit(100.0)
            - F.lit(100.0)
            / (F.lit(1.0) + F.col("sg").cast("double") / F.col("sl").cast("double"))
        )
        .alias("rsi"),
    )
    ws = Window.partitionBy("event_type").orderBy("rn").rowsBetween(
        -(STOCH_W - 1), Window.currentRow
    )
    st = rsi.select(
        "event_type",
        "day",
        "rsi",
        F.min("rsi").over(ws).alias("mn"),
        F.max("rsi").over(ws).alias("mx"),
        F.count(F.lit(1)).over(ws).alias("nw"),
    ).filter(F.col("nw") == STOCH_W)
    return st.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round("rsi", 6).alias("rsi"),
        F.round(
            F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
                (F.col("rsi") - F.col("mn")) / (F.col("mx") - F.col("mn"))
            ),
            6,
        ).alias("stoch_rsi"),
    )
