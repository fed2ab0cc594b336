"""Round-14 time series: the directional-movement system ADX/DMI
(Wilder, *New Concepts in Technical Trading Systems*, 1978 — the
trend-strength companion of the already-green Wilder RSI/ATR/SAR
family), the Relative Vigor Index (Dorsey, TASC 2002 — close-vs-open
conviction normalized by range), Volume Price Trend (volume-weighted
cumulative relative price change), and the Hull Moving Average
(Hull 2005 — the lag-corrected nested WMA).

Exactness design:
- ADX/DMI follows the q_trix/q_parabolic_sar walk contract EXACTLY:
  the daily OHLC DECIMALs bridge to double once (VARCHAR bridge on
  the DuckDB side), then +DM/−DM/TR and the Wilder recurrences are
  the SAME IEEE sequence in Spark's mapInPandas carry-state walk and
  the oracle's recursive CTE (every constant written inline at both
  sites), outputs compared UNROUNDED. Declared conventions: TR/DM
  start at day 2; the first smoothed values at day 15 are plain
  14-term sums; Wilder decay trs − trs/14 + tr afterwards; DX≐0 when
  DI⁺+DI⁻ = 0; ADX seeds at day 28 as the 14-DX mean.
- RVI never leaves integers until one flat division: close−open and
  high−low in exact DECIMAL ten-thousandths, the (1,2,2,1)-weighted
  4-day numerator/denominator and their 10-day sums are BIGINTs.
- VPT declares a TRUNCATED fixed-point convention (the graph15 /
  betweenness precedent, toward-zero via abs() at both sites because
  Spark div truncates while DuckDB // floors): term =
  sign·((|vol·Δc|·{VPT_SCALE}) DIV c_prev) per day, exact BIGINT
  cumulative sum, ONE flat division by the scale.
- Hull MA is an exact integer rational: WMA numerators are weighted
  integer lag chains, raw = 90·W4 − 10·W9 puts both on the /450
  denominator, the outer 3-day WMA numerator stays integer, and the
  emitted double is ONE flat division by 2700·10⁴ (cents scale).

Scale shape: one map-side-combined (type, day) reduce does all the
corpus-sized work; the walks/windows run on |types|×|days| bounded
rows with O(1) state (the q_ewma_batch form).

Reference parity: none (cmd/backup.go has no TA surface) —
north-star derived capability, sibling of timeseries13-34.
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
from timestream_travel_spark.tables import load_table

ADX_W = 14  # Wilder smoothing period
VPT_SCALE = 10**6  # fixed-point scale of the truncated VPT terms

# daily OHLC bridged to double once (day as yyyy-MM-dd string)
_OHLC_X_SQL = f"""
      SELECT t, strftime(day, '%Y-%m-%d') AS day,
             CAST(CAST(hi AS VARCHAR) AS DOUBLE) AS h,
             CAST(CAST(lo AS VARCHAR) AS DOUBLE) AS l,
             CAST(CAST(cl AS VARCHAR) AS DOUBLE) AS c
      FROM ({_DAILY_OHLC_SQL})
"""


def _ohlc_x(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _daily_ohlc(spark, sf_dir).select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("hi").cast("double").alias("h"),
        F.col("lo").cast("double").alias("l"),
        F.col("cl").cast("double").alias("c"),
    )


def _adx_sql() -> str:
    """Recursive-CTE ADX walk over _OHLC_X_SQL (state: raw OHLC of
    the previous day + Wilder sums), mirroring _adx_partition's IEEE
    sequence expression by expression."""
    tr = "greatest(s.h - s.l, abs(s.h - r.c), abs(s.l - r.c))"
    pdm = (
        "(CASE WHEN (s.h - r.h) > (r.l - s.l) AND (s.h - r.h) > 0.0"
        " THEN s.h - r.h ELSE 0.0 END)"
    )
    mdm = (
        "(CASE WHEN (r.l - s.l) > (s.h - r.h) AND (r.l - s.l) > 0.0"
        " THEN r.l - s.l ELSE 0.0 END)"
    )
    trs = (
        f"(CASE WHEN s.rn <= {ADX_W + 1} THEN r.trs + {tr}"
        f" ELSE r.trs - r.trs / 14.0 + {tr} END)"
    )
    pdms = (
        f"(CASE WHEN s.rn <= {ADX_W + 1} THEN r.pdms + {pdm}"
        f" ELSE r.pdms - r.pdms / 14.0 + {pdm} END)"
    )
    mdms = (
        f"(CASE WHEN s.rn <= {ADX_W + 1} THEN r.mdms + {mdm}"
        f" ELSE r.mdms - r.mdms / 14.0 + {mdm} END)"
    )
    dip = f"(100.0 * {pdms} / {trs})"
    dim = f"(100.0 * {mdms} / {trs})"
    dx = (
        f"(CASE WHEN s.rn >= {ADX_W + 1} AND {trs} > 0.0"
        f" AND ({dip} + {dim}) > 0.0"
        f" THEN 100.0 * abs({dip} - {dim}) / ({dip} + {dim})"
        f" WHEN s.rn >= {ADX_W + 1} THEN 0.0 END)"
    )
    dxsum = (
        f"(CASE WHEN s.rn >= {ADX_W + 1} AND s.rn <= {2 * ADX_W}"
        f" THEN r.dxsum + {dx} ELSE r.dxsum END)"
    )
    adx = (
        f"(CASE WHEN s.rn = {2 * ADX_W} THEN {dxsum} / 14.0"
        f" WHEN s.rn > {2 * ADX_W} THEN (r.adx * 13.0 + {dx}) / 14.0 END)"
    )
    return f"""
    WITH RECURSIVE ohlc AS ({_OHLC_X_SQL}
    ), s AS (
      SELECT t, day, h, l, c,
             CAST(row_number() OVER (PARTITION BY t ORDER BY day)
                  AS BIGINT) AS rn
      FROM ohlc
    ), r AS (
      SELECT t, day, h, l, c, rn,
             CAST(0 AS DOUBLE) AS trs, CAST(0 AS DOUBLE) AS pdms,
             CAST(0 AS DOUBLE) AS mdms,
             CAST(NULL AS DOUBLE) AS dip, CAST(NULL AS DOUBLE) AS dim,
             CAST(NULL AS DOUBLE) AS dx,
             CAST(0 AS DOUBLE) AS dxsum, CAST(NULL AS DOUBLE) AS adx
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.t, s.day, s.h, s.l, s.c, s.rn,
             {trs}, {pdms}, {mdms},
             CASE WHEN s.rn >= {ADX_W + 1} AND {trs} > 0.0
                  THEN {dip} END,
             CASE WHEN s.rn >= {ADX_W + 1} AND {trs} > 0.0
                  THEN {dim} END,
             {dx}, {dxsum}, {adx}
      FROM s JOIN r ON s.t = r.t AND s.rn = r.rn + 1
    )
    SELECT t AS event_type, day, dip AS di_plus, dim AS di_minus,
           dx, adx
    FROM r WHERE rn >= {ADX_W + 1}
    """


_ADX_SCHEMA = (
    "event_type string, day string, di_plus double, di_minus double,"
    " dx double, adx double"
)


def _adx_partition(batches):
    """Carry (prev h/l/c, Wilder sums, dxsum, adx) across Arrow
    batches — the exact IEEE sequence of _adx_sql()'s recursion."""
    cur = None
    ph = pl = pc = trs = pdms = mdms = dxsum = 0.0
    adx = None
    rn = 0
    for pdf in batches:
        out = {k: [] for k in ("event_type", "day", "di_plus", "di_minus", "dx", "adx")}
        for t, day, h, l, c in zip(
            pdf["t"], pdf["day"], pdf["h"], pdf["l"], pdf["c"]
        ):
            if t != cur:
                cur, rn = t, 1
                trs = pdms = mdms = dxsum = 0.0
                adx = None
            else:
                rn += 1
                tr = max(h - l, abs(h - pc), abs(l - pc))
                pdm = h - ph if (h - ph) > (pl - l) and (h - ph) > 0.0 else 0.0
                mdm = pl - l if (pl - l) > (h - ph) and (pl - l) > 0.0 else 0.0
                if rn <= ADX_W + 1:
                    trs = trs + tr
                    pdms = pdms + pdm
                    mdms = mdms + mdm
                else:
                    trs = trs - trs / 14.0 + tr
                    pdms = pdms - pdms / 14.0 + pdm
                    mdms = mdms - mdms / 14.0 + mdm
            if rn >= ADX_W + 1:
                dip = 100.0 * pdms / trs if trs > 0.0 else None
                dim = 100.0 * mdms / trs if trs > 0.0 else None
                if trs > 0.0 and (dip + dim) > 0.0:
                    dx = 100.0 * abs(dip - dim) / (dip + dim)
                else:
                    dx = 0.0
                if ADX_W + 1 <= rn <= 2 * ADX_W:
                    dxsum = dxsum + dx
                if rn == 2 * ADX_W:
                    adx = dxsum / 14.0
                elif rn > 2 * ADX_W:
                    adx = (adx * 13.0 + dx) / 14.0
                out["event_type"].append(t)
                out["day"].append(day)
                out["di_plus"].append(dip)
                out["di_minus"].append(dim)
                out["dx"].append(dx)
                out["adx"].append(adx)
            ph, pl, pc = h, l, c
        yield pd.DataFrame(out)


@query("q_adx_dmi", oracle=_adx_sql())
def q_adx_dmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilder's directional-movement system per event type over the
    daily OHLC series: +DI/−DI (smoothed directional movement over
    smoothed true range), DX (their normalized spread), and ADX (the
    Wilder-smoothed DX) — the declared-convention float walk of the
    module docstring, identical IEEE sequence in both engines,
    unrounded output from day {ADX_W + 1}."""
    return (
        _ohlc_x(spark, sf_dir)
        .repartition("t")
        .sortWithinPartitions("t", "day")
        .mapInPandas(_adx_partition, _ADX_SCHEMA)
    )


# --------------------------------------------------------------- RVI

# daily integer ten-thousandths of close−open and high−low, plus the
# close itself and the day's event count (volume) for VPT
_D35_SQL = f"""
      SELECT o.t, o.day,
             CAST((o.cl - o.op) * 10000 AS BIGINT) AS co,
             CAST((o.hi - o.lo) * 10000 AS BIGINT) AS hl,
             CAST(o.cl * 10000 AS BIGINT) AS c4,
             v.vol
      FROM ({_DAILY_OHLC_SQL}) o
      JOIN (
        SELECT event_type AS t, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS vol
        FROM events GROUP BY 1, 2
      ) v ON v.t = o.t AND v.day = o.day
"""


def _d35(spark: SparkSession, sf_dir: str) -> DataFrame:
    ohlc = _daily_ohlc(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    vol = ev.groupBy(
        F.col("event_type").alias("t"), F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("vol"))
    return ohlc.join(vol, ["t", "day"]).select(
        "t",
        "day",
        ((F.col("cl") - F.col("op")) * 10000).cast("bigint").alias("co"),
        ((F.col("hi") - F.col("lo")) * 10000).cast("bigint").alias("hl"),
        (F.col("cl") * 10000).cast("bigint").alias("c4"),
        "vol",
    )


RVI_SUM_W = 10  # trailing window of weighted terms


@query(
    "q_rvi",
    oracle=f"""
    WITH d AS ({_D35_SQL}
    ), w AS (
      SELECT t, strftime(day, '%Y-%m-%d') AS day,
             CAST(row_number() OVER pw AS BIGINT) AS rn,
             lag(co, 3) OVER pw + 2 * lag(co, 2) OVER pw
               + 2 * lag(co, 1) OVER pw + co AS num4,
             lag(hl, 3) OVER pw + 2 * lag(hl, 2) OVER pw
               + 2 * lag(hl, 1) OVER pw + hl AS den4
      FROM d
      WINDOW pw AS (PARTITION BY t ORDER BY day)
    ), s AS (
      SELECT t, day, rn,
             CAST(SUM(num4) OVER (PARTITION BY t ORDER BY rn
                                  ROWS {RVI_SUM_W - 1} PRECEDING)
                  AS BIGINT) AS rvi_num,
             CAST(SUM(den4) OVER (PARTITION BY t ORDER BY rn
                                  ROWS {RVI_SUM_W - 1} PRECEDING)
                  AS BIGINT) AS rvi_den
      FROM w
    )
    SELECT t AS event_type, day, rvi_num, rvi_den,
           CASE WHEN rvi_den <> 0 THEN
             round(CAST(rvi_num AS DOUBLE) / rvi_den, 6) END AS rvi
    FROM s WHERE rn >= {RVI_SUM_W + 3}
    """,
)
def q_rvi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Vigor Index per event type: the (1,2,2,1)-weighted
    4-day close−open momentum summed over {RVI_SUM_W} days, divided
    by the same construction on high−low range — exact BIGINT
    ten-thousandths until ONE guarded flat division."""
    d = _d35(spark, sf_dir)
    pw = Window.partitionBy("t").orderBy("day")
    num4 = (
        F.lag("co", 3).over(pw)
        + 2 * F.lag("co", 2).over(pw)
        + 2 * F.lag("co", 1).over(pw)
        + F.col("co")
    )
    den4 = (
        F.lag("hl", 3).over(pw)
        + 2 * F.lag("hl", 2).over(pw)
        + 2 * F.lag("hl", 1).over(pw)
        + F.col("hl")
    )
    w = d.select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.row_number().over(pw).cast("bigint").alias("rn"),
        num4.alias("num4"),
        den4.alias("den4"),
    )
    ws = (
        Window.partitionBy("t")
        .orderBy("rn")
        .rowsBetween(-(RVI_SUM_W - 1), Window.currentRow)
    )
    s = w.select(
        "t",
        "day",
        "rn",
        F.sum("num4").over(ws).cast("bigint").alias("rvi_num"),
        F.sum("den4").over(ws).cast("bigint").alias("rvi_den"),
    )
    return s.filter(F.col("rn") >= RVI_SUM_W + 3).select(
        F.col("t").alias("event_type"),
        "day",
        "rvi_num",
        "rvi_den",
        F.when(
            F.col("rvi_den") != 0,
            F.round(F.col("rvi_num").cast("double") / F.col("rvi_den"), 6),
        ).alias("rvi"),
    )


# --------------------------------------------------------------- VPT


@query(
    "q_vpt",
    oracle=f"""
    WITH d AS ({_D35_SQL}
    ), dd AS (
      SELECT t, strftime(day, '%Y-%m-%d') AS day, vol, c4,
             lag(c4) OVER (PARTITION BY t ORDER BY day) AS pc4
      FROM d
    ), terms AS (
      SELECT t, day,
             CASE WHEN pc4 IS NULL THEN CAST(0 AS BIGINT)
                  WHEN c4 >= pc4 THEN
                    CAST((vol * (c4 - pc4) * {VPT_SCALE}) // pc4 AS BIGINT)
                  ELSE
                    -CAST((vol * (pc4 - c4) * {VPT_SCALE}) // pc4 AS BIGINT)
             END AS term
      FROM dd
    )
    SELECT t AS event_type, day,
           CAST(SUM(term) OVER (PARTITION BY t ORDER BY day
                                ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS vpt_scaled,
           CAST(SUM(term) OVER (PARTITION BY t ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / {VPT_SCALE}.0 AS vpt
    FROM terms
    """,
)
def q_vpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume Price Trend per event type: the running sum of
    vol_t·(c_t − c_{{t−1}})/c_{{t−1}} under the truncated fixed-point
    convention — each term is an exact toward-zero
    (|vol·Δc|·{VPT_SCALE}) DIV c_prev with the sign reapplied (abs at
    both sites because Spark div truncates while DuckDB // floors),
    the cumulative sum is exact BIGINT, and the emitted double is ONE
    flat division by the scale."""
    d = _d35(spark, sf_dir)
    pw = Window.partitionBy("t").orderBy("day")
    dd = d.select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "vol",
        "c4",
        F.lag("c4").over(pw).alias("pc4"),
    )
    term = (
        F.when(F.col("pc4").isNull(), F.lit(0).cast("bigint"))
        .when(
            F.col("c4") >= F.col("pc4"),
            F.expr(f"CAST((vol * (c4 - pc4) * {VPT_SCALE}) div pc4 AS BIGINT)"),
        )
        .otherwise(
            -F.expr(f"CAST((vol * (pc4 - c4) * {VPT_SCALE}) div pc4 AS BIGINT)")
        )
    )
    terms = dd.select("t", "day", term.alias("term"))
    wc = (
        Window.partitionBy("t")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return terms.select(
        F.col("t").alias("event_type"),
        "day",
        F.sum("term").over(wc).cast("bigint").alias("vpt_scaled"),
        (F.sum("term").over(wc).cast("double") / F.lit(float(VPT_SCALE))).alias(
            "vpt"
        ),
    )


# ----------------------------------------------------------- Hull MA

HMA_N = 9  # base WMA period (half = 4, outer = floor(sqrt(9)) = 3)
HMA_DEN = 6 * 450 * 10**4  # T3 · (T4·T9 common denominator) · cents


@query(
    "q_hull_ma",
    oracle=f"""
    WITH d AS ({_D35_SQL}
    ), w AS (
      SELECT t, strftime(day, '%Y-%m-%d') AS day,
             CAST(row_number() OVER pw AS BIGINT) AS rn,
             lag(c4, 3) OVER pw + 2 * lag(c4, 2) OVER pw
               + 3 * lag(c4, 1) OVER pw + 4 * c4 AS w4,
             lag(c4, 8) OVER pw + 2 * lag(c4, 7) OVER pw
               + 3 * lag(c4, 6) OVER pw + 4 * lag(c4, 5) OVER pw
               + 5 * lag(c4, 4) OVER pw + 6 * lag(c4, 3) OVER pw
               + 7 * lag(c4, 2) OVER pw + 8 * lag(c4, 1) OVER pw
               + 9 * c4 AS w9
      FROM d
      WINDOW pw AS (PARTITION BY t ORDER BY day)
    ), raw AS (
      SELECT t, day, rn, 90 * w4 - 10 * w9 AS rw
      FROM w
    ), h AS (
      SELECT t, day, rn,
             lag(rw, 2) OVER (PARTITION BY t ORDER BY rn)
               + 2 * lag(rw, 1) OVER (PARTITION BY t ORDER BY rn)
               + 3 * rw AS hnum
      FROM raw
    )
    SELECT t AS event_type, day, CAST(hnum AS BIGINT) AS hma_num,
           round(CAST(hnum AS DOUBLE) / {HMA_DEN}.0, 6) AS hull_ma
    FROM h WHERE rn >= {HMA_N + 2}
    """,
)
def q_hull_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hull moving average (n = {HMA_N}) of the daily close per event
    type: HMA = WMA₃(2·WMA₄ − WMA₉) — every weighted numerator is an
    exact integer lag chain over cent ten-thousandths, the nested
    rationals share the fixed denominator 450, and the emitted double
    is ONE flat division by {HMA_DEN} (module docstring)."""
    d = _d35(spark, sf_dir)
    pw = Window.partitionBy("t").orderBy("day")
    w4 = (
        F.lag("c4", 3).over(pw)
        + 2 * F.lag("c4", 2).over(pw)
        + 3 * F.lag("c4", 1).over(pw)
        + 4 * F.col("c4")
    )
    w9 = (
        F.lag("c4", 8).over(pw)
        + 2 * F.lag("c4", 7).over(pw)
        + 3 * F.lag("c4", 6).over(pw)
        + 4 * F.lag("c4", 5).over(pw)
        + 5 * F.lag("c4", 4).over(pw)
        + 6 * F.lag("c4", 3).over(pw)
        + 7 * F.lag("c4", 2).over(pw)
        + 8 * F.lag("c4", 1).over(pw)
        + 9 * F.col("c4")
    )
    w = d.select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.row_number().over(pw).cast("bigint").alias("rn"),
        (90 * w4 - 10 * w9).alias("rw"),
    )
    pr = Window.partitionBy("t").orderBy("rn")
    h = w.select(
        "t",
        "day",
        "rn",
        (
            F.lag("rw", 2).over(pr) + 2 * F.lag("rw", 1).over(pr) + 3 * F.col("rw")
        ).alias("hnum"),
    )
    return h.filter(F.col("rn") >= HMA_N + 2).select(
        F.col("t").alias("event_type"),
        "day",
        F.col("hnum").cast("bigint").alias("hma_num"),
        F.round(F.col("hnum").cast("double") / F.lit(float(HMA_DEN)), 6).alias(
            "hull_ma"
        ),
    )
