"""Time-series operators, part 23 (round 10): the Ultimate
Oscillator (Williams, Technical Analysis of Stocks & Commodities
1985) on the daily OHLC bars, and a MASS-style FFT similarity
search (Mueen et al., "The Fastest Similarity Search Algorithm for
Time Series Subsequences under Euclidean Distance", 2017 — the
published algorithm the r9 verdict named as candidate (a)): top-k
nearest length-{MP_W} windows to each series' most recent window.

Why MASS is a QUERY operator here and not a matrix-profile
replacement: the profile needs all-pairs (STOMP's O(n²) streaming
recurrence, timeseries19, is int64-EXACT on tick series and already
removes the pair join); MASS computes ONE query's sliding dot
products in O(n log n), which is the single-query similarity-search
case. FFT dot products are floats and the tick magnitudes exceed
2⁵³ (|QT| ≤ 3e16), so FFT output can NEVER be exact here — instead
the FFT pass only NOMINATES candidates (every window within a
conservative error margin of the k-th best approximate distance),
and the emitted distances come from an EXACT int64 recompute over
the nominated windows alone. Candidate generation is approximate,
the answer is exact — so this query carries a full DuckDB oracle
(the matrix-profile window-pair SQL restricted to the query window)
and must hash-match it.

Exactness: ultimate-oscillator BP/TR terms are exact DECIMAL
(buying pressure / true range against the previous close), the
three window sums stay DECIMAL, and the weighted combination is one
flat double expression via the VARCHAR decimal→double bridge.
MASS distances are exact integers by construction (see above);
sqrt/de-scale/round happen once per emitted row, Spark-side.

Scale shape: one hourly/daily reduce of the corpus, then per-type
span-bounded work — the UO is three window sums per bar; MASS is
one O(n log n) numpy task per series inside applyInPandas (vs the
O(n·w) naive scan per query — the gap that matters when the span or
the query batch grows).
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
from timestream_travel_spark.operators.timeseries16 import (
    _HOURLY_IDX_SQL,
    MP_EXCL,
    MP_W,
    _hourly_idx,
)
from timestream_travel_spark.registry import query

UO_FAST, UO_MID, UO_SLOW = 7, 14, 28  # Williams' published windows
MASS_K = 5  # top-k nearest windows to the query
# conservative FFT absolute-error margin on d² (measured error is
# O(10²) at |QT| ≤ 3e16 with float64 rfft; 1e6 is ~4 orders above)
_MASS_MARGIN = 1.0e6


@query(
    "q_ultimate_oscillator",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), pc AS (
      SELECT t, day, hi, lo, cl,
             lag(cl) OVER (PARTITION BY t ORDER BY day) AS prev_cl
      FROM ohlc
    ), bp AS (
      SELECT t, day,
             cl - LEAST(lo, prev_cl) AS b,
             GREATEST(hi, prev_cl) - LEAST(lo, prev_cl) AS tr
      FROM pc WHERE prev_cl IS NOT NULL
    ), sums AS (
      SELECT t, day,
             COUNT(*) OVER w28 AS nw,
             SUM(b) OVER w7 AS b7, SUM(tr) OVER w7 AS t7,
             SUM(b) OVER w14 AS b14, SUM(tr) OVER w14 AS t14,
             SUM(b) OVER w28 AS b28, SUM(tr) OVER w28 AS t28
      FROM bp
      WINDOW w7 AS (PARTITION BY t ORDER BY day
                    ROWS BETWEEN {UO_FAST - 1} PRECEDING AND CURRENT ROW),
             w14 AS (PARTITION BY t ORDER BY day
                     ROWS BETWEEN {UO_MID - 1} PRECEDING AND CURRENT ROW),
             w28 AS (PARTITION BY t ORDER BY day
                     ROWS BETWEEN {UO_SLOW - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           round(100.0 * (4.0 * (CAST(CAST(b7 AS VARCHAR) AS DOUBLE)
                                 / CAST(CAST(t7 AS VARCHAR) AS DOUBLE))
                          + 2.0 * (CAST(CAST(b14 AS VARCHAR) AS DOUBLE)
                                   / CAST(CAST(t14 AS VARCHAR) AS DOUBLE))
                          + (CAST(CAST(b28 AS VARCHAR) AS DOUBLE)
                             / CAST(CAST(t28 AS VARCHAR) AS DOUBLE))) / 7.0, 6)
             AS uo
    FROM sums
    WHERE nw = {UO_SLOW} AND t7 > 0 AND t14 > 0 AND t28 > 0
    """,
)
def q_ultimate_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Williams' Ultimate Oscillator on each event type's daily OHLC:
    buying pressure BP = C − min(L, prev C) and true range
    TR = max(H, prev C) − min(L, prev C) accumulate over
    {UO_FAST}/{UO_MID}/{UO_SLOW}-day windows, then
    UO = 100·(4·ΣBP₇/ΣTR₇ + 2·ΣBP₁₄/ΣTR₁₄ + ΣBP₂₈/ΣTR₂₈)/7 — the
    multi-horizon divergence oscillator. BP/TR and all six window
    sums are exact DECIMAL; each sum crosses to double once via the
    VARCHAR bridge (registry rule) into one flat expression."""
    ohlc = _daily_ohlc(spark, sf_dir)
    wl = Window.partitionBy("t").orderBy("day")
    pc = ohlc.select(
        "t", "day", "hi", "lo", "cl", F.lag("cl").over(wl).alias("prev_cl")
    ).filter(F.col("prev_cl").isNotNull())
    bp = pc.select(
        "t",
        "day",
        (F.col("cl") - F.least("lo", "prev_cl")).alias("b"),
        (F.greatest("hi", "prev_cl") - F.least("lo", "prev_cl")).alias("tr"),
    )

    def frame(n: int):
        return Window.partitionBy("t").orderBy("day").rowsBetween(
            -(n - 1), Window.currentRow
        )

    sums = bp.select(
        "t",
        "day",
        F.count("*").over(frame(UO_SLOW)).alias("nw"),
        F.sum("b").over(frame(UO_FAST)).alias("b7"),
        F.sum("tr").over(frame(UO_FAST)).alias("t7"),
        F.sum("b").over(frame(UO_MID)).alias("b14"),
        F.sum("tr").over(frame(UO_MID)).alias("t14"),
        F.sum("b").over(frame(UO_SLOW)).alias("b28"),
        F.sum("tr").over(frame(UO_SLOW)).alias("t28"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    return sums.filter(
        (F.col("nw") == UO_SLOW)
        & (F.col("t7") > 0)
        & (F.col("t14") > 0)
        & (F.col("t28") > 0)
    ).select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(
            F.lit(100.0)
            * (
                F.lit(4.0) * (dd("b7") / dd("t7"))
                + F.lit(2.0) * (dd("b14") / dd("t14"))
                + (dd("b28") / dd("t28"))
            )
            / F.lit(7.0),
            6,
        ).alias("uo"),
    )


_MASS_SCHEMA = "event_type string, rk int, win_start bigint, d2 bigint"


def _mass_topk_one(pdf: pd.DataFrame) -> pd.DataFrame:
    """Top-{MASS_K} nearest windows to the LAST window of one tick
    series: FFT sliding dot products nominate every window within
    _MASS_MARGIN of the k-th best approximate d²; the emitted d² are
    exact int64 recomputes over the nominees only."""
    import numpy as np

    pdf = pdf.sort_values("i")
    a = pdf["v"].to_numpy(dtype=np.int64)
    t = pdf["t"].iloc[0]
    n = len(a)
    m = n - MP_W + 1
    empty = pd.DataFrame({"event_type": [], "rk": [], "win_start": [], "d2": []})
    if m <= MP_EXCL:
        return empty
    q = a[m - 1 : m - 1 + MP_W]  # the query: 1-based start i = m
    # MASS: one FFT cross-correlation gives every window's dot
    # product with the query — O(n log n) for the whole series
    size = n + MP_W
    fa = np.fft.rfft(a.astype(np.float64), size)
    fq = np.fft.rfft(q[::-1].astype(np.float64), size)
    qt = np.fft.irfft(fa * fq, size)[MP_W - 1 : MP_W - 1 + m]
    sq = np.concatenate(([0], np.cumsum(a * a)))
    s_win = sq[MP_W:] - sq[:-MP_W]
    q_sq = int(np.sum(q * q))
    d2_approx = s_win.astype(np.float64) + q_sq - 2.0 * qt
    cand = np.arange(m - MP_EXCL)  # 0-based starts with i ≤ m − excl
    d2c = d2_approx[cand]
    k = min(MASS_K, len(cand))
    kth = np.partition(d2c, k - 1)[k - 1]
    sel = cand[d2c <= kth + _MASS_MARGIN]
    # exact integer re-rank of the nominees (each is O(w) int64 work)
    d2x = np.array(
        [int(np.sum((a[j : j + MP_W] - q) ** 2)) for j in sel], dtype=np.int64
    )
    order = np.lexsort((sel, d2x))[:k]
    return pd.DataFrame(
        {
            "event_type": t,
            "rk": np.arange(1, len(order) + 1, dtype=np.int32),
            "win_start": sel[order] + 1,
            "d2": d2x[order],
        }
    )


@query(
    "q_mass_query_topk",
    oracle=f"""
    WITH ticks AS (
      SELECT t, i, CAST(v * 10000 AS BIGINT) AS v
      FROM ({_HOURLY_IDX_SQL})
    ), nmax AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM ticks GROUP BY t
    ), win AS (
      SELECT h.t, h.i,
             list_transform(
               list_sort(list({{'k': h.i, 'x': h.v}}) OVER (
                 PARTITION BY h.t ORDER BY h.i
                 ROWS BETWEEN CURRENT ROW AND {MP_W - 1} FOLLOWING)),
               s -> s.x) AS wv
      FROM ticks h
    ), full_win AS (
      SELECT w.t, w.i, w.wv
      FROM win w JOIN nmax m ON m.t = w.t
      WHERE w.i <= m.n - {MP_W} + 1
    ), qw AS (
      SELECT w.t, w.i AS qi, w.wv AS qv
      FROM win w JOIN nmax m ON m.t = w.t
      WHERE w.i = m.n - {MP_W} + 1
    ), cand AS (
      SELECT a.t, a.i,
             list_sum(list_transform(list_zip(a.wv, q.qv),
                 p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      FROM full_win a
      JOIN qw q ON q.t = a.t AND q.qi - a.i >= {MP_EXCL}
    ), ranked AS (
      SELECT t, i, d2,
             row_number() OVER (PARTITION BY t ORDER BY d2, i) AS rk
      FROM cand
    )
    SELECT t AS event_type, CAST(rk AS INT) AS rk, i AS win_start,
           round(sqrt(CAST(d2 AS DOUBLE)) / 10000.0, 6) AS dist
    FROM ranked WHERE rk <= {MASS_K}
    """,
)
def q_mass_query_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASS similarity search: the {MASS_K} nearest length-{MP_W}
    windows to each event type's MOST RECENT window (non-normalized
    Euclidean, {MP_EXCL}-step trivial-match exclusion, ties to the
    smaller start). One applyInPandas task per series: the FFT pass
    is O(n log n) and only nominates candidates; every emitted
    distance is an exact int64 recompute, so the result hash-matches
    the window-pair SQL oracle despite floats in the search path —
    approximate candidate generation, exact answers (the IVFADC
    exact-re-rank contract, applied to subsequence search)."""
    ticks = _hourly_idx(spark, sf_dir).select(
        "t", "i", (F.col("v") * 10000).cast("bigint").alias("v")
    )
    prof = ticks.groupBy("t").applyInPandas(_mass_topk_one, _MASS_SCHEMA)
    return prof.select(
        "event_type",
        "rk",
        "win_start",
        F.round(F.sqrt(F.col("d2").cast("double")) / 10000.0, 6).alias("dist"),
    )
