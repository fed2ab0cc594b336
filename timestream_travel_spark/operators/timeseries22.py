"""Round-10 time-series wave 2 (STAGED — registry.STAGED_MODULES):
Hjorth parameters (Hjorth, EEG Clin. Neurophysiol. 1970 — activity/
mobility/complexity, the signal-shape triple EEG pipelines compute
per channel), zero-crossing rate + crest factor (the classic
audio/vibration shape statistics), and the Money Flow Index (the
volume-weighted RSI companion to q_chaikin_money_flow).

Exactness design: every statistic reduces to exact DECIMAL sums of
the hourly level series, its first and second differences — means
scale out (e = n·x − S is exact, and first differences need no
centering at all: Δe = n·Δx), so variance ratios, crossing counts
and crest ratios are flat expressions off bridged exact sums. MFI
compares 3·TP = H+L+C directly (exact DECIMAL) and classifies flow
by the sign of ΔTP3, so Σ⁺/Σ⁻ are exact and the index is one flat
division — the /3 cancels.

Scale: hourly/daily reduces then |types|-bounded windows — the
established cost classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.timeseries15 import (
    _DAILY_OHLC_SQL,
    _daily_ohlc,
)
from timestream_travel_spark.operators.timeseries16 import (
    _HOURLY_IDX_SQL,
    _hourly_idx,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

MFI_W = 14  # Money Flow Index window (days)

# centered series (scaled): e = n·v − S, exact DECIMAL; differences
# of e are n·Δv, so variance ratios of (x, Δx, ΔΔx) are invariant to
# the n× scale and to centering (Δ removes the constant shift)
_E_SQL = f"""
    hourly AS ({_HOURLY_IDX_SQL}
    ), st AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s FROM hourly GROUP BY t
    ), e AS (
      SELECT h.t, h.i, st.n,
             CAST(CAST(st.n AS DECIMAL(6,0)) * CAST(h.v AS DECIMAL(14,4))
                  - CAST(st.s AS DECIMAL(16,4)) AS DECIMAL(19,4)) AS e
      FROM hourly h JOIN st ON st.t = h.t
    )
"""


def _e(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly_idx(spark, sf_dir)
    st = hourly.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("v").alias("s")
    )
    return hourly.join(st, "t").select(
        "t",
        "i",
        "n",
        (
            F.col("n").cast("decimal(6,0)") * F.col("v").cast("decimal(14,4)")
            - F.col("s").cast("decimal(16,4)")
        )
        .cast("decimal(19,4)")
        .alias("e"),
    )


@query(
    "q_hjorth_parameters",
    oracle=f"""
    WITH {_E_SQL},
    lagd AS (
      SELECT t, n, e,
             e - lag(e) OVER (PARTITION BY t ORDER BY i) AS d1,
             e - 2 * lag(e) OVER (PARTITION BY t ORDER BY i)
               + lag(e, 2) OVER (PARTITION BY t ORDER BY i) AS d2
      FROM e
    ), sums AS (
      SELECT t, MAX(n) AS n,
             CAST(CAST(SUM(CAST(e AS DECIMAL(20,4)) * e) AS VARCHAR) AS DOUBLE)
               AS s0,
             CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(CAST(SUM(CAST(d1 AS DECIMAL(20,4)) * d1) AS VARCHAR)
                  AS DOUBLE) AS s1,
             CAST(COUNT(d1) AS BIGINT) AS n1,
             CAST(CAST(SUM(CAST(d2 AS DECIMAL(20,4)) * d2) AS VARCHAR)
                  AS DOUBLE) AS s2,
             CAST(COUNT(d2) AS BIGINT) AS n2
      FROM lagd GROUP BY t
    )
    SELECT t AS event_type, n0 AS n_hours,
           round(s0 / n0 / (CAST(n AS DOUBLE) * n), 6) AS activity,
           round(sqrt((s1 / n1) / (s0 / n0)), 6) AS mobility,
           round(sqrt((s2 / n2) / (s1 / n1)) / sqrt((s1 / n1) / (s0 / n0)), 6)
             AS complexity
    FROM sums
    """,
)
def q_hjorth_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hjorth activity/mobility/complexity of each type's hourly
    level series: activity = var(x); mobility = √(var(Δx)/var(x));
    complexity = mobility(Δx)/mobility(x) — the time-domain spectral
    summary (mobility ≈ dominant frequency, complexity ≈ bandwidth).
    The centered series is exact by the n× scaling (activity divides
    the n² back out; the ratios are scale-invariant); all power sums
    are exact DECIMAL, bridged once."""
    e = _e(spark, sf_dir)
    w = Window.partitionBy("t").orderBy("i")
    lagd = e.select(
        "t",
        "n",
        "e",
        (F.col("e") - F.lag("e").over(w)).alias("d1"),
        (F.col("e") - 2 * F.lag("e").over(w) + F.lag("e", 2).over(w)).alias("d2"),
    )
    big = lambda c: F.col(c).cast("decimal(20,4)")  # noqa: E731
    sums = lagd.groupBy("t").agg(
        F.max("n").alias("n"),
        F.sum(big("e") * F.col("e")).cast("double").alias("s0"),
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum(big("d1") * F.col("d1")).cast("double").alias("s1"),
        F.count("d1").cast("bigint").alias("n1"),
        F.sum(big("d2") * F.col("d2")).cast("double").alias("s2"),
        F.count("d2").cast("bigint").alias("n2"),
    )
    v0 = F.col("s0") / F.col("n0")
    v1 = F.col("s1") / F.col("n1")
    v2 = F.col("s2") / F.col("n2")
    return sums.select(
        F.col("t").alias("event_type"),
        F.col("n0").alias("n_hours"),
        F.round(v0 / (F.col("n").cast("double") * F.col("n")), 6).alias("activity"),
        F.round(F.sqrt(v1 / v0), 6).alias("mobility"),
        F.round(F.sqrt(v2 / v1) / F.sqrt(v1 / v0), 6).alias("complexity"),
    )


@query(
    "q_zero_crossing_crest",
    oracle=f"""
    WITH {_E_SQL},
    lagd AS (
      SELECT t, n, e,
             lag(e) OVER (PARTITION BY t ORDER BY i) AS pe
      FROM e
    ), agg AS (
      SELECT t, MAX(n) AS n,
             CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN pe IS NOT NULL AND e * pe < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS crossings,
             CAST(COUNT(pe) AS BIGINT) AS n_pairs,
             MAX(abs(e)) AS peak,
             CAST(CAST(SUM(CAST(e AS DECIMAL(20,4)) * e) AS VARCHAR) AS DOUBLE)
               AS s0
      FROM lagd GROUP BY t
    )
    SELECT t AS event_type, n0 AS n_hours, crossings,
           round(CAST(crossings AS DOUBLE) / n_pairs, 6) AS zcr,
           round(CAST(CAST(peak AS VARCHAR) AS DOUBLE)
                 / sqrt(s0 / n0), 6) AS crest_factor
    FROM agg
    """,
)
def q_zero_crossing_crest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-crossing rate and crest factor of each type's
    mean-centered hourly series: ZCR = sign flips / pairs (the cheap
    dominant-frequency proxy) and crest = peak/RMS (impulsiveness —
    vibration analysis' spike detector). Centering is exact by the n×
    scaling, which cancels in both statistics: sign(e) = sign(x−μ)
    and peak/RMS is scale-invariant. Crossings are integer counts on
    exact DECIMAL signs."""
    e = _e(spark, sf_dir)
    w = Window.partitionBy("t").orderBy("i")
    lagd = e.select("t", "n", "e", F.lag("e").over(w).alias("pe"))
    agg = lagd.groupBy("t").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum(
            F.when(
                F.col("pe").isNotNull() & (F.col("e") * F.col("pe") < 0), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("crossings"),
        F.count("pe").cast("bigint").alias("n_pairs"),
        F.max(F.abs("e")).alias("peak"),
        F.sum(F.col("e").cast("decimal(20,4)") * F.col("e"))
        .cast("double")
        .alias("s0"),
    )
    return agg.select(
        F.col("t").alias("event_type"),
        F.col("n0").alias("n_hours"),
        "crossings",
        F.round(F.col("crossings").cast("double") / F.col("n_pairs"), 6).alias(
            "zcr"
        ),
        F.round(
            F.col("peak").cast("double") / F.sqrt(F.col("s0") / F.col("n0")), 6
        ).alias("crest_factor"),
    )


@query(
    "q_mfi",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), vol AS (
      SELECT event_type AS t, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS vol
      FROM events GROUP BY 1, 2
    ), tp AS (
      SELECT o.t, o.day, v.vol,
             CAST(o.hi + o.lo + o.cl AS DECIMAL(16,4)) AS tp3
      FROM ohlc o JOIN vol v ON v.t = o.t AND v.day = o.day
    ), flow AS (
      SELECT t, day,
             CASE WHEN tp3 > lag(tp3) OVER w
                  THEN CAST(tp3 AS DECIMAL(18,4)) * vol
                  ELSE CAST(0 AS DECIMAL(34,4)) END AS pos3,
             CASE WHEN tp3 < lag(tp3) OVER w
                  THEN CAST(tp3 AS DECIMAL(18,4)) * vol
                  ELSE CAST(0 AS DECIMAL(34,4)) END AS neg3,
             CASE WHEN lag(tp3) OVER w IS NULL THEN 0 ELSE 1 END AS has_prev
      FROM tp
      WINDOW w AS (PARTITION BY t ORDER BY day)
    ), win AS (
      SELECT t, day,
             SUM(has_prev) OVER ww AS nw,
             SUM(pos3) OVER ww AS sp,
             SUM(neg3) OVER ww AS sn
      FROM flow
      WINDOW ww AS (PARTITION BY t ORDER BY day
                    ROWS BETWEEN {MFI_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           round(100.0 * CAST(CAST(sp AS VARCHAR) AS DOUBLE)
                 / (CAST(CAST(sp AS VARCHAR) AS DOUBLE)
                    + CAST(CAST(sn AS VARCHAR) AS DOUBLE)), 6) AS mfi
    FROM win WHERE nw = {MFI_W} AND sp + sn > 0
    """,
)
def q_mfi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money Flow Index over {MFI_W} days: the volume-weighted RSI —
    MFI = 100·Σ⁺/(Σ⁺ + Σ⁻) where Σ± sum TP·vol on days the typical
    price rose/fell. Works on 3·TP = H+L+C directly (exact DECIMAL;
    the /3 cancels in the ratio), flow classification compares exact
    decimals, and the window sums are exact until one flat final
    division. Unchanged-TP days contribute to neither side (the
    standard convention)."""
    ohlc = _daily_ohlc(spark, sf_dir)
    vol = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"), F.date_trunc("day", "ts").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("vol"))
    )
    tp = ohlc.join(vol, ["t", "day"]).select(
        "t", "day", "vol",
        (F.col("hi") + F.col("lo") + F.col("cl")).cast("decimal(16,4)").alias("tp3"),
    )
    wl = Window.partitionBy("t").orderBy("day")
    prev = F.lag("tp3").over(wl)
    mf3 = F.col("tp3").cast("decimal(18,4)") * F.col("vol")
    zero = F.lit(0).cast("decimal(34,4)")
    flow = tp.select(
        "t",
        "day",
        F.when(F.col("tp3") > prev, mf3).otherwise(zero).alias("pos3"),
        F.when(F.col("tp3") < prev, mf3).otherwise(zero).alias("neg3"),
        F.when(prev.isNull(), 0).otherwise(1).alias("has_prev"),
    )
    ww = (
        Window.partitionBy("t")
        .orderBy("day")
        .rowsBetween(-(MFI_W - 1), Window.currentRow)
    )
    win = flow.select(
        "t",
        "day",
        F.sum("has_prev").over(ww).alias("nw"),
        F.sum("pos3").over(ww).alias("sp"),
        F.sum("neg3").over(ww).alias("sn"),
    )
    return win.filter(
        (F.col("nw") == MFI_W) & (F.col("sp") + F.col("sn") > 0)
    ).select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(
            100.0
            * F.col("sp").cast("double")
            / (F.col("sp").cast("double") + F.col("sn").cast("double")),
            6,
        ).alias("mfi"),
    )
