"""Round-11 time series (promoted into load_all()'s round-11 tail —
written in round 10, held out of the registry to respect the
driver's ~50-slot drain): TRIX
(Hutson, Technical Analysis of Stocks & Commodities 1983 — the
1-period rate of change of a triple-smoothed EMA), the Percentage
Price Oscillator (the %-normalized MACD), and the PSY psychological
line (up-day ratio — Japanese technical-analysis staple; pure
integer census).

Exactness: TRIX/PPO follow q_macd's contract EXACTLY — the daily
DECIMAL level bridges to double once, every EMA step is the same
IEEE sequence in Spark's mapInPandas carry-state walk and the
oracle's recursive CTE (gain literals written inline at both
sites), outputs compared UNROUNDED. The chosen periods make the
gains binary-exact (N=7 → α=0.25, N=15 → α=0.125), which costs
nothing and removes even representation noise from the literals.
PSY is an integer window count over sign(Δv) with a DECIMAL diff.

Scale shape: one map-side-combined (event_type, day) reduce does
the corpus-sized work; the recurrences walk |types|×|days| rows
with O(1) state (q_ewma_batch form); PSY is a bounded window count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# binary-exact EMA gains: alpha = 2/(N+1)
TRIX_A = 0.25  # N = 7
PPO_FAST_A = 0.25  # N = 7
PPO_SLOW_A = 0.125  # N = 15
PSY_W = 12  # PSY window (days)

_DAILY_X_SQL = """
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
"""


def _daily_x(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("x"))


_TRIX_SCHEMA = "event_type string, day string, e3 double, trix double"


def _trix_partition(batches):
    """Carry the (e1, e2, e3, prev_e3) state across Arrow batches;
    seeds e1 = e2 = e3 = x_1 (trix row emitted from the 2nd day)."""
    cur, e1, e2, e3, prev3 = None, 0.0, 0.0, 0.0, None
    for pdf in batches:
        types = pdf["event_type"].to_list()
        vals = pdf["x"].to_list()
        e3s, trixs = [], []
        for t, x in zip(types, vals):
            if t != cur:
                cur, e1, e2, e3, prev3 = t, x, x, x, None
                e3s.append(e3)
                trixs.append(None)
            else:
                prev3 = e3
                e1 = (1 - TRIX_A) * e1 + TRIX_A * x
                e2 = (1 - TRIX_A) * e2 + TRIX_A * e1
                e3 = (1 - TRIX_A) * e3 + TRIX_A * e2
                e3s.append(e3)
                trixs.append(100.0 * (e3 - prev3) / prev3 if prev3 != 0.0 else None)
        yield pd.DataFrame(
            {"event_type": types, "day": pdf["day"], "e3": e3s, "trix": trixs}
        )


@query(
    "q_trix",
    oracle=f"""
    WITH RECURSIVE daily AS ({_DAILY_X_SQL}
    ), s AS (
      SELECT event_type, day, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ), r AS (
      SELECT event_type, day, x, rn, x AS e1, x AS e2, x AS e3,
             CAST(NULL AS DOUBLE) AS trix
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.day, s.x, s.rn,
             {1 - TRIX_A} * r.e1 + {TRIX_A} * s.x,
             {1 - TRIX_A} * r.e2
               + {TRIX_A} * ({1 - TRIX_A} * r.e1 + {TRIX_A} * s.x),
             {1 - TRIX_A} * r.e3
               + {TRIX_A} * ({1 - TRIX_A} * r.e2
                 + {TRIX_A} * ({1 - TRIX_A} * r.e1 + {TRIX_A} * s.x)),
             CASE WHEN r.e3 <> 0.0 THEN
               100.0 * (({1 - TRIX_A} * r.e3
                 + {TRIX_A} * ({1 - TRIX_A} * r.e2
                   + {TRIX_A} * ({1 - TRIX_A} * r.e1 + {TRIX_A} * s.x))) - r.e3)
                 / r.e3
             END
      FROM s JOIN r ON s.event_type = r.event_type AND s.rn = r.rn + 1
    )
    SELECT event_type, day, e3, trix FROM r
    """,
)
def q_trix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIX momentum: 100·(E3_t − E3_{t−1})/E3_{t−1} where E3 is the
    EMA(α={TRIX_A}) applied three times to the daily level — the
    triple smoothing suppresses short-cycle noise, the 1-day ROC
    turns it into an oscillator. Same IEEE walk on both engines
    (q_macd contract), α binary-exact, unrounded output."""
    return (
        _daily_x(spark, sf_dir)
        .repartition("event_type")
        .sortWithinPartitions("event_type", "day")
        .mapInPandas(_trix_partition, _TRIX_SCHEMA)
    )


_PPO_SCHEMA = "event_type string, day string, ppo double"


def _ppo_partition(batches):
    cur, ef, es = None, 0.0, 0.0
    for pdf in batches:
        types = pdf["event_type"].to_list()
        vals = pdf["x"].to_list()
        ppos = []
        for t, x in zip(types, vals):
            if t != cur:
                cur, ef, es = t, x, x
            else:
                ef = (1 - PPO_FAST_A) * ef + PPO_FAST_A * x
                es = (1 - PPO_SLOW_A) * es + PPO_SLOW_A * x
            ppos.append(100.0 * (ef - es) / es if es != 0.0 else None)
        yield pd.DataFrame({"event_type": types, "day": pdf["day"], "ppo": ppos})


@query(
    "q_ppo",
    oracle=f"""
    WITH RECURSIVE daily AS ({_DAILY_X_SQL}
    ), s AS (
      SELECT event_type, day, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ), r AS (
      SELECT event_type, day, x, rn, x AS ef, x AS es
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.day, s.x, s.rn,
             {1 - PPO_FAST_A} * r.ef + {PPO_FAST_A} * s.x,
             {1 - PPO_SLOW_A} * r.es + {PPO_SLOW_A} * s.x
      FROM s JOIN r ON s.event_type = r.event_type AND s.rn = r.rn + 1
    )
    SELECT event_type, day,
           CASE WHEN es <> 0.0 THEN 100.0 * (ef - es) / es END AS ppo
    FROM r
    """,
)
def q_ppo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentage Price Oscillator: 100·(EMA_fast − EMA_slow)/
    EMA_slow on the daily level — MACD normalized by the slow EMA so
    series of different magnitude compare directly. Gains α=0.25 /
    α=0.125 (binary-exact); q_macd's IEEE-identical walk contract;
    unrounded output."""
    return (
        _daily_x(spark, sf_dir)
        .repartition("event_type")
        .sortWithinPartitions("event_type", "day")
        .mapInPandas(_ppo_partition, _PPO_SCHEMA)
    )


@query(
    "q_psy_line",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS t, date_trunc('day', ts) AS day,
             SUM(CAST(value AS DECIMAL(20,4))) AS v
      FROM events GROUP BY 1, 2
    ), diffs AS (
      SELECT t, day,
             CASE WHEN v - lag(v) OVER (PARTITION BY t ORDER BY day) > 0
                  THEN 1 ELSE 0 END AS up,
             lag(v) OVER (PARTITION BY t ORDER BY day) AS pv
      FROM daily
    ), win AS (
      SELECT t, day, up,
             COUNT(*) OVER w AS nw,
             CAST(SUM(up) OVER w AS BIGINT) AS ups
      FROM diffs WHERE pv IS NOT NULL
      WINDOW w AS (PARTITION BY t ORDER BY day
                   ROWS BETWEEN {PSY_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           ups AS n_up,
           round(100.0 * ups / {PSY_W}, 6) AS psy
    FROM win WHERE nw = {PSY_W}
    """,
)
def q_psy_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSY psychological line: the percentage of up days in the
    trailing {PSY_W}-day window — a pure INTEGER census over signs
    of exact DECIMAL daily diffs (the one indicator in the family
    with no float before the final scaled ratio)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("t"), F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(20,4)")).alias("v"))
    wl = Window.partitionBy("t").orderBy("day")
    diffs = daily.select(
        "t",
        "day",
        F.when((F.col("v") - F.lag("v").over(wl)) > 0, 1).otherwise(0).alias("up"),
        F.lag("v").over(wl).alias("pv"),
    ).filter(F.col("pv").isNotNull())
    wf = Window.partitionBy("t").orderBy("day").rowsBetween(
        -(PSY_W - 1), Window.currentRow
    )
    win = diffs.select(
        "t",
        "day",
        F.count("*").over(wf).alias("nw"),
        F.sum("up").over(wf).cast("bigint").alias("ups"),
    )
    return win.filter(F.col("nw") == PSY_W).select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("ups").alias("n_up"),
        F.round(F.lit(100.0) * F.col("ups") / PSY_W, 6).alias("psy"),
    )
