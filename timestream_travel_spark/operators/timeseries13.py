"""Round-7 time-series wave: classic technical-analysis indicators
over the per-type DAILY series (VWAP, stochastic oscillator, OBV,
max drawdown, turning points, multi-lag autocorrelation).

All public textbook formulas (Murphy, *Technical Analysis of the
Financial Markets*; Box–Jenkins ACF estimator). Exactness follows
the repo rules: the one corpus pass is a map-side-combined daily
DECIMAL aggregation; everything downstream runs on the bounded
per-type daily table (rows = |types| × calendar days — a domain
bound, not data volume, so the per-type windows are bounded-slice
windows); float division happens once per output term, and any sum
OVER float terms quantizes to DECIMAL first (the q_split_kl_drift
rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

_DAILY_SQL = """
      SELECT event_type, date_trunc('day', ts) AS day,
             SUM(CAST(value AS DECIMAL(20,4))) AS v,
             CAST(COUNT(*) AS BIGINT) AS vol
      FROM events GROUP BY event_type, date_trunc('day', ts)
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(20,4)")).alias("v"),
        F.count("*").alias("vol"),
    )


@query(
    "q_vwap_daily",
    oracle="""
    SELECT strftime(date_trunc('day', l_shipdate), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           round(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS VARCHAR) AS DOUBLE),
                 6) AS vwap
    FROM lineitem
    GROUP BY date_trunc('day', l_shipdate)
    HAVING SUM(CAST(l_quantity AS DECIMAL(20,4))) > 0
    """,
)
def q_vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per ship day:
    Σ(extendedprice)/Σ(quantity) — in TPC-H extendedprice is already
    quantity × unit price, so this is the quantity-weighted unit
    price. One map-side-combined aggregation over lineitem, exact
    DECIMAL sums, one double division per output day (the VARCHAR
    decimal→double bridge on the oracle side, ops.dsum_sql's rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(F.date_trunc("day", "l_shipdate").alias("d")).agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(20,4)")).alias("sp"),
        F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("sq"),
    )
    return g.filter(F.col("sq") > 0).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_items",
        F.round(F.col("sp").cast("double") / F.col("sq").cast("double"), 6).alias(
            "vwap"
        ),
    )


STOCH_PERIOD = 14


@query(
    "q_stochastic_oscillator",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), win AS (
      SELECT event_type, day, v,
             min(v) OVER w AS lo,
             max(v) OVER w AS hi,
             COUNT(*) OVER w AS nw
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {STOCH_PERIOD - 1} PRECEDING AND CURRENT ROW)
    ), k AS (
      SELECT event_type, day,
             CASE WHEN hi = lo THEN CAST(50 AS DOUBLE)
                  ELSE 100 * CAST(v - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE)
             END AS pct_k
      FROM win WHERE nw = {STOCH_PERIOD}
    ), d AS (
      SELECT event_type, day, pct_k,
             lag(pct_k, 1) OVER (PARTITION BY event_type ORDER BY day) AS k1,
             lag(pct_k, 2) OVER (PARTITION BY event_type ORDER BY day) AS k2
      FROM k
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           round(pct_k, 6) AS pct_k,
           round((pct_k + k1 + k2) / 3, 6) AS pct_d
    FROM d WHERE k2 IS NOT NULL
    """,
)
def q_stochastic_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator %K/%D over each type's daily level:
    %K = 100·(v − min₁₄)/(max₁₄ − min₁₄) once the window is full,
    %D = 3-sample SMA of %K written as the explicit left-associated
    (k + k₁ + k₂)/3 so both engines add the SAME doubles in the SAME
    order (a windowed AVG would be engine-order float summation —
    the exact trap the repo's DECIMAL rule exists for; with 3 terms
    the explicit form is simpler than quantizing). The flat-window
    0/0 case pins to 50."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(STOCH_PERIOD - 1), Window.currentRow)
    )
    win = _daily(spark, sf_dir).select(
        "event_type",
        "day",
        "v",
        F.min("v").over(w).alias("lo"),
        F.max("v").over(w).alias("hi"),
        F.count(F.lit(1)).over(w).alias("nw"),
    ).filter(F.col("nw") == STOCH_PERIOD)
    pct_k = F.when(F.col("hi") == F.col("lo"), F.lit(50.0)).otherwise(
        100 * (F.col("v") - F.col("lo")).cast("double")
        / (F.col("hi") - F.col("lo")).cast("double")
    )
    wl = Window.partitionBy("event_type").orderBy("day")
    d = win.select(
        "event_type",
        "day",
        pct_k.alias("pct_k"),
    ).select(
        "event_type",
        "day",
        "pct_k",
        F.lag("pct_k", 1).over(wl).alias("k1"),
        F.lag("pct_k", 2).over(wl).alias("k2"),
    )
    return d.filter(F.col("k2").isNotNull()).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round("pct_k", 6).alias("pct_k"),
        F.round((F.col("pct_k") + F.col("k1") + F.col("k2")) / 3, 6).alias("pct_d"),
    )


@query(
    "q_obv",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), d AS (
      SELECT event_type, day, vol,
             CASE WHEN v > lag(v) OVER w THEN CAST(1 AS BIGINT)
                  WHEN v < lag(v) OVER w THEN CAST(-1 AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS dir
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(SUM(dir * vol) OVER (PARTITION BY event_type ORDER BY day
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS obv
    FROM d
    """,
)
def q_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance volume per type: cumulative Σ sign(Δlevel)·volume
    with the day's event count as volume — pure INTEGER arithmetic
    after the exact-DECIMAL daily levels, so the running sum is
    hash-exact with no quantization at all (the first day's NULL
    delta contributes direction 0)."""
    wl = Window.partitionBy("event_type").orderBy("day")
    d = _daily(spark, sf_dir).select(
        "event_type",
        "day",
        "vol",
        F.when(F.col("v") > F.lag("v").over(wl), F.lit(1).cast("bigint"))
        .when(F.col("v") < F.lag("v").over(wl), F.lit(-1).cast("bigint"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("dir"),
    )
    wc = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return d.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.sum(F.col("dir") * F.col("vol")).over(wc).cast("bigint").alias("obv"),
    )


@query(
    "q_max_drawdown",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), dd AS (
      SELECT event_type, day, v,
             max(v) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS runmax
      FROM daily
    ), scored AS (
      SELECT event_type, day,
             CAST(runmax - v AS DOUBLE) / CAST(runmax AS DOUBLE) AS ddf
      FROM dd WHERE runmax > 0
    ), ranked AS (
      SELECT event_type, day, ddf,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ddf DESC, day ASC) AS rk
      FROM scored
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS trough_day,
           round(ddf, 6) AS max_drawdown
    FROM ranked WHERE rk = 1
    """,
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum peak-to-trough drawdown per type on the daily level
    series: dd = (runmax − v)/runmax, reported with the trough day
    (ties broken by earliest day). The running max stays DECIMAL
    (exact); each dd is one double division of identical decimals,
    so ordering by the raw double agrees across engines, and only
    the reported value is rounded."""
    wl = Window.partitionBy("event_type").orderBy("day")
    dd = (
        _daily(spark, sf_dir)
        .select(
            "event_type",
            "day",
            "v",
            F.max("v")
            .over(wl.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("runmax"),
        )
        .filter(F.col("runmax") > 0)
        .select(
            "event_type",
            "day",
            (
                (F.col("runmax") - F.col("v")).cast("double")
                / F.col("runmax").cast("double")
            ).alias("ddf"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.desc("ddf"), F.asc("day"))
    )
    return (
        dd.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("trough_day"),
            F.round("ddf", 6).alias("max_drawdown"),
        )
    )


@query(
    "q_turning_points",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), n AS (
      SELECT event_type, day, v,
             lag(v) OVER w AS pv, lead(v) OVER w AS nv
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), flags AS (
      SELECT event_type, day,
             CASE WHEN v > pv AND v > nv THEN 1 ELSE 0 END AS is_peak,
             CASE WHEN v < pv AND v < nv THEN 1 ELSE 0 END AS is_trough
      FROM n WHERE pv IS NOT NULL AND nv IS NOT NULL
    )
    SELECT event_type,
           CAST(SUM(is_peak) AS BIGINT) AS n_peaks,
           CAST(SUM(is_trough) AS BIGINT) AS n_troughs,
           strftime(min(CASE WHEN is_peak = 1 THEN day END), '%Y-%m-%d')
             AS first_peak_day
    FROM flags GROUP BY event_type
    """,
)
def q_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local extrema census per type: strict peaks (v above both
    neighbors) and troughs on the daily level series, plus the first
    peak day — trend-shape diagnostics on exact DECIMAL comparisons
    (no float enters the query at all)."""
    wl = Window.partitionBy("event_type").orderBy("day")
    n = _daily(spark, sf_dir).select(
        "event_type",
        "day",
        "v",
        F.lag("v").over(wl).alias("pv"),
        F.lead("v").over(wl).alias("nv"),
    ).filter(F.col("pv").isNotNull() & F.col("nv").isNotNull())
    flags = n.select(
        "event_type",
        "day",
        F.when((F.col("v") > F.col("pv")) & (F.col("v") > F.col("nv")), 1)
        .otherwise(0)
        .alias("is_peak"),
        F.when((F.col("v") < F.col("pv")) & (F.col("v") < F.col("nv")), 1)
        .otherwise(0)
        .alias("is_trough"),
    )
    return flags.groupBy("event_type").agg(
        F.sum("is_peak").cast("bigint").alias("n_peaks"),
        F.sum("is_trough").cast("bigint").alias("n_troughs"),
        F.date_format(
            F.min(F.when(F.col("is_peak") == 1, F.col("day"))), "yyyy-MM-dd"
        ).alias("first_peak_day"),
    )


ACF_LAGS = (1, 2, 3, 7)


@query(
    "q_acf_multi_lag",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), series AS (
      SELECT event_type, CAST(v AS DOUBLE) AS x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ), mu AS (
      SELECT event_type,
             CAST(CAST(SUM(CAST(x AS DECIMAL(20,4))) AS VARCHAR) AS DOUBLE)
               / COUNT(*) AS m
      FROM series GROUP BY event_type
    ), centered AS (
      SELECT s.event_type, s.rn, s.x - mu.m AS xc
      FROM series s JOIN mu ON mu.event_type = s.event_type
    ), den AS (
      SELECT event_type,
             CAST(CAST(SUM(CAST(xc * xc AS DECIMAL(30,10))) AS VARCHAR)
                  AS DOUBLE) AS den
      FROM centered GROUP BY event_type
    ), lags AS (SELECT unnest([{", ".join(str(k) for k in ACF_LAGS)}]) AS k
    ), num AS (
      SELECT a.event_type, l.k,
             CAST(CAST(SUM(CAST(a.xc * b.xc AS DECIMAL(30,10))) AS VARCHAR)
                  AS DOUBLE) AS num
      FROM centered a
      JOIN lags l ON TRUE
      JOIN centered b ON b.event_type = a.event_type AND b.rn = a.rn + l.k
      GROUP BY a.event_type, l.k
    )
    SELECT n.event_type, n.k AS lag,
           round(n.num / d.den, 6) AS acf
    FROM num n JOIN den d ON d.event_type = n.event_type
    WHERE d.den <> 0
    """,
)
def q_acf_multi_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box–Jenkins sample autocorrelation at lags {ACF_LAGS} per
    type: r_k = Σ(x_t−μ)(x_{{t+k}}−μ) / Σ(x_t−μ)². Per-term products
    quantize to DECIMAL(30,10) before the order-independent sums
    (float Σ would be engine-order dependent); μ itself is the exact
    decimal-sum mean. The lagged pairing is an equi-join on
    (type, rn+k) against a broadcast 4-row lag table — all work is
    on the bounded daily table."""
    daily = _daily(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy("day")
    series = daily.select(
        "event_type",
        F.col("v").cast("double").alias("x"),
        F.row_number().over(wl).alias("rn"),
    )
    mu = series.groupBy("event_type").agg(
        (
            F.sum(F.col("x").cast("decimal(20,4)")).cast("double") / F.count("*")
        ).alias("m")
    )
    centered = series.join(F.broadcast(mu), "event_type").select(
        "event_type", "rn", "x", "m", (F.col("x") - F.col("m")).alias("xc")
    )
    den = centered.groupBy("event_type").agg(
        F.sum((F.col("xc") * F.col("xc")).cast("decimal(30,10)"))
        .cast("double")
        .alias("den")
    )
    lags = spark.createDataFrame([(k,) for k in ACF_LAGS], "k int")
    a = centered.select("event_type", "rn", F.col("xc").alias("xa"))
    b = centered.select(
        "event_type", F.col("rn").alias("rnb"), F.col("xc").alias("xb")
    )
    num = (
        a.join(F.broadcast(lags))
        .join(
            b,
            (b.event_type == a.event_type) & (F.col("rnb") == F.col("rn") + F.col("k")),
        )
        .drop(b.event_type)
        .groupBy("event_type", "k")
        .agg(
            F.sum((F.col("xa") * F.col("xb")).cast("decimal(30,10)"))
            .cast("double")
            .alias("num")
        )
    )
    return (
        num.join(F.broadcast(den), "event_type")
        .filter(F.col("den") != 0)
        .select(
            "event_type",
            F.col("k").alias("lag"),
            F.round(F.col("num") / F.col("den"), 6).alias("acf"),
        )
    )
