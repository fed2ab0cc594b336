"""Round-9 time-series wave 3: the remaining classical technical
indicators beside the r8 volatility family — Williams %R (Williams,
*How I Made One Million Dollars*, 1973), the Commodity Channel Index
(Lambert, Commodities 1980), the Vortex indicator (Botes & Siepman,
Technical Analysis of Stocks & Commodities 2010), Elder's Force
Index (Elder, *Trading for a Living*, 1993), the Detrended Price
Oscillator, and the Coppock curve (Coppock, Barron's 1962) — all on
the daily OHLC of each event type's hourly level series
(timeseries15's `_daily_ohlc`, exact DECIMAL).

Exactness design (the q_atr_keltner discipline): window sums/extrema
stay DECIMAL; per-row divisions are folded into ONE flat double
expression; CCI's mean absolute deviation — the one statistic that
needs every window member's deviation from the CURRENT window's mean
— scales out the mean division (W·x_i − Σx is exact DECIMAL) and
evaluates in-row over a frame-collected array, so no float enters
before the final ratio. Coppock's ROC terms are doubles off
exactly-representable decimals (|v|·10⁴ ≪ 2⁵³), quantized to DECIMAL
at birth so the weighted fold is associative.

Scale shape: one hourly reduce of the corpus, then |types|×days
bounded windows — the established daily-indicator cost class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.timeseries15 import (
    _DAILY_OHLC_SQL,
    _daily_ohlc,
)
from timestream_travel_spark.registry import query

WPR_W = 14  # Williams %R lookback
CCI_W = 20  # CCI window
CCI_C = 0.015  # Lambert's scaling constant
VI_W = 14  # Vortex window
DPO_W = 20  # DPO window
ROC_LONG, ROC_SHORT, WMA_W = 14, 11, 10  # Coppock (daily-scaled)


def _wl():
    return Window.partitionBy("t").orderBy("day")


def _frame(n: int):
    return Window.partitionBy("t").orderBy("day").rowsBetween(-(n - 1), Window.currentRow)


@query(
    "q_williams_r",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), win AS (
      SELECT t, day, cl,
             COUNT(*) OVER w AS nw,
             MAX(hi) OVER w AS hh,
             MIN(lo) OVER w AS ll
      FROM ohlc
      WINDOW w AS (PARTITION BY t ORDER BY day
                   ROWS BETWEEN {WPR_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           round(100.0 * CAST(cl - hh AS DOUBLE) / CAST(hh - ll AS DOUBLE), 6)
             AS williams_r
    FROM win WHERE nw = {WPR_W} AND hh <> ll
    """,
)
def q_williams_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Williams %R over a {WPR_W}-day lookback: −100·(HH − C)/(HH −
    LL), the overbought/oversold position of today's close inside
    the lookback's high-low range (0 = at the high, −100 = at the
    low). HH/LL/C are exact DECIMAL window extrema; one flat double
    ratio per row; degenerate flat windows (HH = LL) are excluded on
    both engines."""
    ohlc = _daily_ohlc(spark, sf_dir)
    w = _frame(WPR_W)
    win = ohlc.select(
        "t",
        "day",
        "cl",
        F.count("*").over(w).alias("nw"),
        F.max("hi").over(w).alias("hh"),
        F.min("lo").over(w).alias("ll"),
    )
    return win.filter((F.col("nw") == WPR_W) & (F.col("hh") != F.col("ll"))).select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        # (cl − hh) keeps the cl == hh case a POSITIVE zero on both
        # engines (−100·(hh−cl) would emit −0.0, which hash-differs)
        F.round(
            100.0
            * (F.col("cl") - F.col("hh")).cast("double")
            / (F.col("hh") - F.col("ll")).cast("double"),
            6,
        ).alias("williams_r"),
    )


@query(
    "q_cci",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), tp AS (
      SELECT t, day, CAST(hi + lo + cl AS DECIMAL(18,4)) AS tp3
      FROM ohlc
    ), win AS (
      SELECT t, day, tp3,
             COUNT(*) OVER w AS nw,
             SUM(tp3) OVER w AS stp,
             list(tp3) OVER w AS wv
      FROM tp
      WINDOW w AS (PARTITION BY t ORDER BY day
                   ROWS BETWEEN {CCI_W - 1} PRECEDING AND CURRENT ROW)
    ), dev AS (
      SELECT t, day,
             CAST({CCI_W} AS DECIMAL(6,0)) * tp3 - stp AS a,
             list_sum(list_transform(wv,
                 x -> abs(CAST({CCI_W} AS DECIMAL(6,0)) * x - stp))) AS s
      FROM win WHERE nw = {CCI_W}
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           round(CAST(CAST(a AS VARCHAR) AS DOUBLE) * {CCI_W}
                 / ({CCI_C!r} * CAST(CAST(s AS VARCHAR) AS DOUBLE)), 6) AS cci
    FROM dev WHERE s <> 0
    """,
)
def q_cci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commodity Channel Index over {CCI_W} days: (TP − SMA(TP)) /
    ({CCI_C}·MD), TP = (H+L+C)/3, MD the mean absolute deviation of
    the window's typical prices from the window's own SMA. Every /3,
    /W and the SMA division are scaled out: with tp3 = H+L+C and
    A = W·tp3 − Σtp3 (exact DECIMAL), CCI = A·W / ({CCI_C}·S) where
    S = Σ_i |W·tp3_i − Σtp3| evaluates in-row over the frame-collected
    window array — exact DECIMAL until the single final ratio. The
    in-row fold is order-independent (absolute values sum over an
    array whose ORDER doesn't matter for +)."""
    ohlc = _daily_ohlc(spark, sf_dir)
    tp = ohlc.select(
        "t", "day",
        (F.col("hi") + F.col("lo") + F.col("cl")).cast("decimal(18,4)").alias("tp3"),
    )
    w = _frame(CCI_W)
    win = tp.select(
        "t",
        "day",
        "tp3",
        F.count("*").over(w).alias("nw"),
        F.sum("tp3").over(w).alias("stp"),
        F.collect_list("tp3").over(w).alias("wv"),
    )
    wlit = F.lit(CCI_W).cast("decimal(6,0)")
    dev = win.filter(F.col("nw") == CCI_W).select(
        "t",
        "day",
        (wlit * F.col("tp3") - F.col("stp")).alias("a"),
        F.aggregate(
            F.transform("wv", lambda x: F.abs(wlit * x - F.col("stp"))),
            F.lit(0).cast("decimal(28,4)"),
            lambda acc, x: (acc + x).cast("decimal(28,4)"),
        ).alias("s"),
    )
    return dev.filter(F.col("s") != 0).select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(
            F.col("a").cast("double") * CCI_W / (CCI_C * F.col("s").cast("double")),
            6,
        ).alias("cci"),
    )


@query(
    "q_vortex",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), lagd AS (
      SELECT t, day, hi, lo,
             lag(hi) OVER (PARTITION BY t ORDER BY day) AS ph,
             lag(lo) OVER (PARTITION BY t ORDER BY day) AS pl,
             lag(cl) OVER (PARTITION BY t ORDER BY day) AS pc
      FROM ohlc
    ), mv AS (
      SELECT t, day,
             abs(hi - pl) AS vmp,
             abs(lo - ph) AS vmm,
             greatest(hi - lo, abs(hi - pc), abs(lo - pc)) AS trng
      FROM lagd WHERE pc IS NOT NULL
    ), win AS (
      SELECT t, day,
             COUNT(*) OVER w AS nw,
             SUM(vmp) OVER w AS svp,
             SUM(vmm) OVER w AS svm,
             SUM(trng) OVER w AS str
      FROM mv
      WINDOW w AS (PARTITION BY t ORDER BY day
                   ROWS BETWEEN {VI_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           round(CAST(CAST(svp AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(str AS VARCHAR) AS DOUBLE), 6) AS vi_plus,
           round(CAST(CAST(svm AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(str AS VARCHAR) AS DOUBLE), 6) AS vi_minus
    FROM win WHERE nw = {VI_W} AND str <> 0
    """,
)
def q_vortex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vortex indicator over {VI_W} days: VI+ = Σ|H_t − L_{{t−1}}| /
    ΣTR and VI− = Σ|L_t − H_{{t−1}}| / ΣTR — upward vs downward
    directional movement normalized by total true range; a VI+/VI−
    cross is the trend-change signal. All movements and true ranges
    are exact DECIMAL; two flat divisions per row."""
    ohlc = _daily_ohlc(spark, sf_dir)
    wl = _wl()
    lagd = ohlc.select(
        "t", "day", "hi", "lo",
        F.lag("hi").over(wl).alias("ph"),
        F.lag("lo").over(wl).alias("pl"),
        F.lag("cl").over(wl).alias("pc"),
    )
    mv = lagd.filter(F.col("pc").isNotNull()).select(
        "t",
        "day",
        F.abs(F.col("hi") - F.col("pl")).alias("vmp"),
        F.abs(F.col("lo") - F.col("ph")).alias("vmm"),
        F.greatest(
            F.col("hi") - F.col("lo"),
            F.abs(F.col("hi") - F.col("pc")),
            F.abs(F.col("lo") - F.col("pc")),
        ).alias("trng"),
    )
    w = _frame(VI_W)
    win = mv.select(
        "t",
        "day",
        F.count("*").over(w).alias("nw"),
        F.sum("vmp").over(w).alias("svp"),
        F.sum("vmm").over(w).alias("svm"),
        F.sum("trng").over(w).alias("str"),
    )
    return win.filter((F.col("nw") == VI_W) & (F.col("str") != 0)).select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.col("svp").cast("double") / F.col("str").cast("double"), 6).alias(
            "vi_plus"
        ),
        F.round(F.col("svm").cast("double") / F.col("str").cast("double"), 6).alias(
            "vi_minus"
        ),
    )


@query(
    "q_force_index",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), vol AS (
      SELECT event_type AS t, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS vol
      FROM events GROUP BY 1, 2
    ), fi AS (
      SELECT o.t, o.day, v.vol,
             o.cl - lag(o.cl) OVER (PARTITION BY o.t ORDER BY o.day) AS dcl
      FROM ohlc o JOIN vol v ON v.t = o.t AND v.day = o.day
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(vol AS BIGINT) AS volume,
           round(CAST(CAST(dcl AS VARCHAR) AS DOUBLE) * vol, 4) AS force_index
    FROM fi WHERE dcl IS NOT NULL
    """,
)
def q_force_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elder's raw Force Index: (close_t − close_{{t−1}}) × volume_t,
    with volume = the day's event count — price change weighted by
    participation. The close delta is exact DECIMAL, the product one
    flat double per row."""
    ohlc = _daily_ohlc(spark, sf_dir)
    from timestream_travel_spark.tables import load_table

    vol = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"), F.date_trunc("day", "ts").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("vol"))
    )
    wl = _wl()
    fi = (
        ohlc.join(vol, ["t", "day"])
        .select(
            "t", "day", "vol", (F.col("cl") - F.lag("cl").over(wl)).alias("dcl")
        )
    )
    return fi.filter(F.col("dcl").isNotNull()).select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("vol").alias("volume"),
        F.round(F.col("dcl").cast("double") * F.col("vol"), 4).alias("force_index"),
    )


@query(
    "q_dpo",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), win AS (
      SELECT t, day,
             lag(cl, {DPO_W // 2 + 1}) OVER (PARTITION BY t ORDER BY day)
               AS shifted,
             COUNT(*) OVER w AS nw,
             SUM(cl) OVER w AS scl
      FROM ohlc
      WINDOW w AS (PARTITION BY t ORDER BY day
                   ROWS BETWEEN {DPO_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           round(CAST(CAST(CAST({DPO_W} AS DECIMAL(6,0)) * shifted - scl
                           AS VARCHAR) AS DOUBLE) / {DPO_W}, 6) AS dpo
    FROM win WHERE nw = {DPO_W} AND shifted IS NOT NULL
    """,
)
def q_dpo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detrended Price Oscillator over {DPO_W} days: the close from
    {DPO_W}//2+1 periods back minus the current {DPO_W}-day SMA —
    removing the longer trend to expose the cycle. The SMA division
    scales out (W·shifted − Σcl is exact DECIMAL); one flat double
    division per row."""
    ohlc = _daily_ohlc(spark, sf_dir)
    w = _frame(DPO_W)
    wl = _wl()
    win = ohlc.select(
        "t",
        "day",
        F.lag("cl", DPO_W // 2 + 1).over(wl).alias("shifted"),
        F.count("*").over(w).alias("nw"),
        F.sum("cl").over(w).alias("scl"),
    )
    return win.filter(
        (F.col("nw") == DPO_W) & F.col("shifted").isNotNull()
    ).select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(
            (F.lit(DPO_W).cast("decimal(6,0)") * F.col("shifted") - F.col("scl"))
            .cast("double")
            / DPO_W,
            6,
        ).alias("dpo"),
    )


@query(
    "q_coppock_curve",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), roc AS (
      SELECT t, day,
             CAST(100.0 * CAST(cl - lag(cl, {ROC_LONG})
                                 OVER (PARTITION BY t ORDER BY day) AS DOUBLE)
                    / CAST(lag(cl, {ROC_LONG})
                             OVER (PARTITION BY t ORDER BY day) AS DOUBLE)
                  + 100.0 * CAST(cl - lag(cl, {ROC_SHORT})
                                   OVER (PARTITION BY t ORDER BY day) AS DOUBLE)
                    / CAST(lag(cl, {ROC_SHORT})
                             OVER (PARTITION BY t ORDER BY day) AS DOUBLE)
                  AS DECIMAL(20,8)) AS rsum,
             row_number() OVER (PARTITION BY t ORDER BY day) AS rn
      FROM ohlc
    ), win AS (
      SELECT t, day, rn,
             COUNT(rsum) OVER w AS nw,
             list_transform(
               list_sort(list({{'r': rn, 'x': rsum}}) OVER w), s -> s.x) AS wv
      FROM roc
      WINDOW w AS (PARTITION BY t ORDER BY rn
                   ROWS BETWEEN {WMA_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           round(CAST(CAST(list_sum(list_transform(
                     list_zip(wv, range(1, {WMA_W + 1})),
                     p -> p[1] * p[2])) AS VARCHAR) AS DOUBLE)
                 / {WMA_W * (WMA_W + 1) // 2}, 6) AS coppock
    FROM win
    WHERE nw = {WMA_W} AND rn >= {ROC_LONG + WMA_W}
    """,
)
def q_coppock_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coppock curve (daily-scaled): the {WMA_W}-period linearly
    weighted moving average of ROC({ROC_LONG}) + ROC({ROC_SHORT}) on
    the daily closes. Each day's ROC sum is a flat double off
    exactly-representable decimals, quantized to DECIMAL(20,8) at
    birth so the weighted fold is exact and associative; the WMA
    evaluates in-row over the frame-collected (rn-sorted) window
    array with integer weights 1..{WMA_W}, and the single float op
    is the final /{WMA_W * (WMA_W + 1) // 2}."""
    ohlc = _daily_ohlc(spark, sf_dir)
    wl = _wl()
    rl = F.lag("cl", ROC_LONG).over(wl)
    rs = F.lag("cl", ROC_SHORT).over(wl)
    rsum = (
        100.0 * (F.col("cl") - rl).cast("double") / rl.cast("double")
        + 100.0 * (F.col("cl") - rs).cast("double") / rs.cast("double")
    ).cast("decimal(20,8)")
    roc = ohlc.select(
        "t",
        "day",
        rsum.alias("rsum"),
        F.row_number().over(wl).alias("rn"),
    )
    w = Window.partitionBy("t").orderBy("rn").rowsBetween(-(WMA_W - 1), Window.currentRow)
    win = roc.select(
        "t",
        "day",
        "rn",
        F.count("rsum").over(w).alias("nw"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("rn").alias("r"), F.col("rsum").alias("x"))
                ).over(w)
            ),
            lambda s: s["x"],
        ).alias("wv"),
    )
    wma_num = F.aggregate(
        F.zip_with(
            F.col("wv"),
            F.sequence(F.lit(1), F.lit(WMA_W)),
            lambda x, i: x * i.cast("decimal(6,0)"),
        ),
        F.lit(0).cast("decimal(30,8)"),
        lambda acc, x: (acc + x).cast("decimal(30,8)"),
    )
    return win.filter(
        (F.col("nw") == WMA_W) & (F.col("rn") >= ROC_LONG + WMA_W)
    ).select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(wma_num.cast("double") / (WMA_W * (WMA_W + 1) // 2), 6).alias(
            "coppock"
        ),
    )
