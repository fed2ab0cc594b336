"""Timeseries, part 37 (round-16 STAGED wave): three charting
constructions the indicator suite lacks, all EXACT-INTEGER on the
10⁻⁴-unit fixed-point daily level (u = close·10⁴, exact because the
close is a DECIMAL(20,4) hourly-sum extremum — timeseries15):

- q_zigzag_pivots: the ZigZag swing filter (5% reversal): track the
  running extreme in the current direction, emit a confirmed pivot
  when price retraces ≥5% (integer cross-multiply: down-reversal
  20·c ≤ 19·ext, up-reversal 20·c ≥ 21·ext), plus the final
  provisional extreme. Sequential carry-state walk — the q_trix /
  parabolic-SAR contract (mapInPandas walk ≡ recursive-CTE replay).
- q_renko_bricks: Renko brick accumulation with brick size
  B = max(1, c₀ DIV 20) (5% of the initial level, per type): emit
  (c − top) DIV B bricks on an up move, symmetric down; per-day
  cumulative up/down brick counts and the current band. Pure
  integer walk (declared init: top = c₀, bot = c₀ − B).
- q_williams_fractals: Williams ±2-day fractal pivots — a day is a
  fractal high when its high strictly exceeds the highs of the two
  days before AND after (symmetric for lows); pure DECIMAL
  comparisons over lag/lead windows, no walk.

Exactness: every decision is integer or exact-DECIMAL; only the
output levels divide by 10⁴ once (flat double division of int64 —
identical both engines). Integer DIV dividends are positive and
< 2⁵³ (daily level ≤ ~10⁹ units at sf0.1 — pinned in pytest).

Scale shape: one (type, hour) reduce + one (type, day) reduce; the
walks run per type on the DOMAIN-BOUNDED daily series (the
timeseries27 argument); fractals are one window pass.

Reference parity: none — north-star derived capability (the
INTERPOLATE/chart family's sibling).
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

ZZ_NUM, ZZ_DEN = 21, 19  # 5% reversal: up 20c >= 21·ext, down 20c <= 19·ext

_ZZ_SCHEMA = (
    "event_type string, pivot_day string, pivot double,"
    " kind string, is_final int"
)


def _zz_partition(batches):
    """ZigZag walk per type (rows arrive day-sorted per type):
    integer cross-multiplied reversal tests, strict-> extreme
    updates (first extreme kept on ties)."""
    cur = None
    direction, ext, ext_day = 1, 0, ""
    rows: list[tuple] = []

    def flush_final():
        if cur is not None:
            rows.append(
                (cur, ext_day, ext / 10000.0,
                 "high" if direction == 1 else "low", 1)
            )

    for pdf in batches:
        for t, day, u in zip(
            pdf["t"], pdf["day"], pdf["u"]
        ):
            u = int(u)
            if t != cur:
                flush_final()
                cur, direction, ext, ext_day = t, 1, u, day
                continue
            if direction == 1:
                if u > ext:
                    ext, ext_day = u, day
                elif 20 * u <= ZZ_DEN * ext:
                    rows.append((cur, ext_day, ext / 10000.0, "high", 0))
                    direction, ext, ext_day = -1, u, day
            else:
                if u < ext:
                    ext, ext_day = u, day
                elif 20 * u >= ZZ_NUM * ext:
                    rows.append((cur, ext_day, ext / 10000.0, "low", 0))
                    direction, ext, ext_day = 1, u, day
    flush_final()
    yield pd.DataFrame(
        rows,
        columns=["event_type", "pivot_day", "pivot", "kind", "is_final"],
    ).astype({"is_final": "int32"})


_ZZ_WALK_SQL = f"""
    WITH RECURSIVE ohlc AS MATERIALIZED ({_DAILY_OHLC_SQL}
    ), days AS MATERIALIZED (
      SELECT t, strftime(day, '%Y-%m-%d') AS day,
             CAST(cl * 10000 AS BIGINT) AS u,
             row_number() OVER (PARTITION BY t ORDER BY day) AS r,
             count(*) OVER (PARTITION BY t) AS n
      FROM ohlc
    ), walk AS (
      SELECT t, r, n, 1 AS dir, u AS ext, day AS ext_day,
             CAST(NULL AS VARCHAR) AS piv_day,
             CAST(NULL AS BIGINT) AS piv_u,
             CAST(NULL AS VARCHAR) AS piv_kind
      FROM days WHERE r = 1
      UNION ALL
      SELECT d.t, d.r, d.n,
             CASE WHEN w.dir = 1 THEN
                    CASE WHEN d.u > w.ext THEN 1
                         WHEN 20*d.u <= {ZZ_DEN}*w.ext THEN -1 ELSE 1 END
                  ELSE
                    CASE WHEN d.u < w.ext THEN -1
                         WHEN 20*d.u >= {ZZ_NUM}*w.ext THEN 1 ELSE -1 END
             END AS dir,
             CASE WHEN w.dir = 1 THEN
                    CASE WHEN d.u > w.ext THEN d.u
                         WHEN 20*d.u <= {ZZ_DEN}*w.ext THEN d.u ELSE w.ext END
                  ELSE
                    CASE WHEN d.u < w.ext THEN d.u
                         WHEN 20*d.u >= {ZZ_NUM}*w.ext THEN d.u ELSE w.ext END
             END AS ext,
             CASE WHEN w.dir = 1 THEN
                    CASE WHEN d.u > w.ext THEN d.day
                         WHEN 20*d.u <= {ZZ_DEN}*w.ext THEN d.day
                         ELSE w.ext_day END
                  ELSE
                    CASE WHEN d.u < w.ext THEN d.day
                         WHEN 20*d.u >= {ZZ_NUM}*w.ext THEN d.day
                         ELSE w.ext_day END
             END AS ext_day,
             CASE WHEN w.dir = 1 AND d.u <= w.ext
                       AND 20*d.u <= {ZZ_DEN}*w.ext THEN w.ext_day
                  WHEN w.dir = -1 AND d.u >= w.ext
                       AND 20*d.u >= {ZZ_NUM}*w.ext THEN w.ext_day
             END AS piv_day,
             CASE WHEN w.dir = 1 AND d.u <= w.ext
                       AND 20*d.u <= {ZZ_DEN}*w.ext THEN w.ext
                  WHEN w.dir = -1 AND d.u >= w.ext
                       AND 20*d.u >= {ZZ_NUM}*w.ext THEN w.ext
             END AS piv_u,
             CASE WHEN w.dir = 1 AND d.u <= w.ext
                       AND 20*d.u <= {ZZ_DEN}*w.ext THEN 'high'
                  WHEN w.dir = -1 AND d.u >= w.ext
                       AND 20*d.u >= {ZZ_NUM}*w.ext THEN 'low'
             END AS piv_kind
      FROM days d JOIN walk w ON w.t = d.t AND d.r = w.r + 1
    )
"""


@query(
    "q_zigzag_pivots",
    oracle=f"""{_ZZ_WALK_SQL}
    SELECT t AS event_type, piv_day AS pivot_day,
           CAST(piv_u AS DOUBLE) / 10000 AS pivot,
           piv_kind AS kind, CAST(0 AS INT) AS is_final
    FROM walk WHERE piv_day IS NOT NULL
    UNION ALL
    SELECT t, ext_day, CAST(ext AS DOUBLE) / 10000,
           CASE WHEN dir = 1 THEN 'high' ELSE 'low' END, CAST(1 AS INT)
    FROM walk WHERE r = n
    """,
)
def q_zigzag_pivots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZigZag 5% swing pivots per event type on the daily close:
    confirmed pivots as reversals cross the integer 20/19 · 20/21
    thresholds, plus the final provisional extreme (module
    docstring; walk ≡ the oracle's recursive-CTE replay)."""
    daily = _daily_ohlc(spark, sf_dir).select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.col("cl") * 10000).cast("bigint").alias("u"),
    )
    return (
        daily.repartition("t")
        .sortWithinPartitions("t", "day")
        .mapInPandas(_zz_partition, _ZZ_SCHEMA)
    )


_RENKO_SCHEMA = (
    "event_type string, day string, up_cum bigint, down_cum bigint,"
    " top double, bot double"
)


def _renko_partition(batches):
    cur = None
    top = bot = brick = 0
    up = down = 0
    for pdf in batches:
        out = []
        for t, day, u in zip(pdf["t"], pdf["day"], pdf["u"]):
            u = int(u)
            if t != cur:
                cur = t
                brick = max(1, u // 20)
                top, bot = u, u - brick
                up = down = 0
            elif u >= top + brick:
                m = (u - top) // brick
                top += m * brick
                bot = top - brick
                up += m
            elif u <= bot - brick:
                m = (bot - u) // brick
                bot -= m * brick
                top = bot + brick
                down += m
            out.append((t, day, up, down, top / 10000.0, bot / 10000.0))
        yield pd.DataFrame(
            out,
            columns=["event_type", "day", "up_cum", "down_cum", "top", "bot"],
        )


@query(
    "q_renko_bricks",
    oracle=f"""
    WITH RECURSIVE ohlc AS MATERIALIZED ({_DAILY_OHLC_SQL}
    ), days AS MATERIALIZED (
      SELECT t, strftime(day, '%Y-%m-%d') AS day,
             CAST(cl * 10000 AS BIGINT) AS u,
             row_number() OVER (PARTITION BY t ORDER BY day) AS r
      FROM ohlc
    ), walk AS (
      SELECT t, r, day, greatest(1, u // 20) AS brick,
             u AS top, u - greatest(1, u // 20) AS bot,
             CAST(0 AS BIGINT) AS up_cum, CAST(0 AS BIGINT) AS down_cum
      FROM days WHERE r = 1
      UNION ALL
      SELECT d.t, d.r, d.day, w.brick,
             CASE WHEN d.u >= w.top + w.brick
                    THEN w.top + ((d.u - w.top) // w.brick) * w.brick
                  WHEN d.u <= w.bot - w.brick
                    THEN w.bot - ((w.bot - d.u) // w.brick) * w.brick + w.brick
                  ELSE w.top END AS top,
             CASE WHEN d.u >= w.top + w.brick
                    THEN w.top + ((d.u - w.top) // w.brick) * w.brick - w.brick
                  WHEN d.u <= w.bot - w.brick
                    THEN w.bot - ((w.bot - d.u) // w.brick) * w.brick
                  ELSE w.bot END AS bot,
             w.up_cum + CASE WHEN d.u >= w.top + w.brick
                             THEN (d.u - w.top) // w.brick ELSE 0 END AS up_cum,
             w.down_cum + CASE WHEN d.u <= w.bot - w.brick
                               THEN (w.bot - d.u) // w.brick ELSE 0 END
               AS down_cum
      FROM days d JOIN walk w ON w.t = d.t AND d.r = w.r + 1
    )
    SELECT t AS event_type, day, up_cum, down_cum,
           CAST(top AS DOUBLE) / 10000 AS top,
           CAST(bot AS DOUBLE) / 10000 AS bot
    FROM walk
    """,
)
def q_renko_bricks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Renko brick walk per event type on the daily close (brick =
    5% of the initial level, integer units): per-day cumulative
    up/down brick counts and the live band (module docstring)."""
    daily = _daily_ohlc(spark, sf_dir).select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.col("cl") * 10000).cast("bigint").alias("u"),
    )
    return (
        daily.repartition("t")
        .sortWithinPartitions("t", "day")
        .mapInPandas(_renko_partition, _RENKO_SCHEMA)
    )


@query(
    "q_williams_fractals",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), w AS (
      SELECT t, strftime(day, '%Y-%m-%d') AS day, hi, lo,
             lag(hi, 2) OVER win AS h_m2, lag(hi, 1) OVER win AS h_m1,
             lead(hi, 1) OVER win AS h_p1, lead(hi, 2) OVER win AS h_p2,
             lag(lo, 2) OVER win AS l_m2, lag(lo, 1) OVER win AS l_m1,
             lead(lo, 1) OVER win AS l_p1, lead(lo, 2) OVER win AS l_p2
      FROM ohlc
      WINDOW win AS (PARTITION BY t ORDER BY day)
    )
    SELECT t AS event_type, day, 'high' AS kind,
           CAST(hi AS DOUBLE) AS level
    FROM w
    WHERE h_m2 IS NOT NULL AND h_p2 IS NOT NULL
      AND hi > h_m2 AND hi > h_m1 AND hi > h_p1 AND hi > h_p2
    UNION ALL
    SELECT t, day, 'low', CAST(lo AS DOUBLE)
    FROM w
    WHERE l_m2 IS NOT NULL AND l_p2 IS NOT NULL
      AND lo < l_m2 AND lo < l_m1 AND lo < l_p1 AND lo < l_p2
    """,
)
def q_williams_fractals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Williams ±2-day fractal pivots per event type: strict DECIMAL
    extremum-of-five tests on the daily high/low, one window pass."""
    ohlc = _daily_ohlc(spark, sf_dir).select(
        "t", F.date_format("day", "yyyy-MM-dd").alias("day"), "hi", "lo"
    )
    win = Window.partitionBy("t").orderBy("day")
    w = ohlc.select(
        "t",
        "day",
        "hi",
        "lo",
        F.lag("hi", 2).over(win).alias("h_m2"),
        F.lag("hi", 1).over(win).alias("h_m1"),
        F.lead("hi", 1).over(win).alias("h_p1"),
        F.lead("hi", 2).over(win).alias("h_p2"),
        F.lag("lo", 2).over(win).alias("l_m2"),
        F.lag("lo", 1).over(win).alias("l_m1"),
        F.lead("lo", 1).over(win).alias("l_p1"),
        F.lead("lo", 2).over(win).alias("l_p2"),
    )
    highs = w.filter(
        F.col("h_m2").isNotNull()
        & F.col("h_p2").isNotNull()
        & (F.col("hi") > F.col("h_m2"))
        & (F.col("hi") > F.col("h_m1"))
        & (F.col("hi") > F.col("h_p1"))
        & (F.col("hi") > F.col("h_p2"))
    ).select(
        F.col("t").alias("event_type"),
        "day",
        F.lit("high").alias("kind"),
        F.col("hi").cast("double").alias("level"),
    )
    lows = w.filter(
        F.col("l_m2").isNotNull()
        & F.col("l_p2").isNotNull()
        & (F.col("lo") < F.col("l_m2"))
        & (F.col("lo") < F.col("l_m1"))
        & (F.col("lo") < F.col("l_p1"))
        & (F.col("lo") < F.col("l_p2"))
    ).select(
        F.col("t").alias("event_type"),
        "day",
        F.lit("low").alias("kind"),
        F.col("lo").cast("double").alias("level"),
    )
    return highs.unionByName(lows)
