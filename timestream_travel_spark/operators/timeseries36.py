"""Round-15 STAGED time series: Negative/Positive Volume Index
(Fosback, *Stock Market Logic*, 1976 — cumulative return indices
gated on volume expansion/contraction days), the Fisher Transform
(Ehlers, TASC 2002 — the inverse-hyperbolic-tangent normalizer that
makes price extremes Gaussian-sharp), and Intraday Intensity (Bollinger
— the close-position-in-range volume flow, the cumulative cousin of
the already-green Chaikin A/D and Ease-of-Movement).

Exactness design:
- NVI/PVI follow the q_trix walk contract: daily close and volume
  bridge to double/BIGINT once, then index = index + index·ROC on
  the gated days is the SAME IEEE sequence in Spark's mapInPandas
  carry-state walk and the oracle's recursive CTE, unrounded output.
- Fisher pre-computes the trailing-{FI_W} window extrema on exact
  DECIMALs in the non-recursive part (bridged to double once per
  row), then the v/fisher recurrences (0.33/0.67 gains, ±0.999
  clamp, 0.5·ln((1+v)/(1−v)) + 0.5·prev) are the identical-literal
  walk at both sites. Declared conventions: the walk seeds v = 0,
  fisher = 0 on the first full-window day; a flat window (max = min)
  contributes raw position 0.5.
- Intraday Intensity declares the truncated fixed-point convention
  (the q_vpt precedent, toward-zero via abs at both sites):
  term = sign·((|vol·(2c−h−l)|·{II_SCALE}) DIV (h−l)) over integer
  ten-thousandths (0 on a flat day), exact BIGINT running and
  {II_W}-day sums, ONE flat division each.

Scale shape: one map-side-combined (type, day) reduce does the
corpus-sized work; walks and windows run on |types|×|days| bounded
rows with O(1) state.

Reference parity: none (cmd/backup.go has no TA surface) —
north-star derived capability, sibling of timeseries35.
"""

from __future__ import annotations

import math

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

NVI_BASE = 1000.0  # conventional index seed
FI_W = 9  # Fisher extrema window
II_SCALE = 10**6  # fixed-point scale of the truncated II terms
II_W = 21  # Intraday Intensity trailing-sum window

# daily close (bridged double) + volume
_CV_SQL = f"""
      SELECT o.t, strftime(o.day, '%Y-%m-%d') AS day,
             CAST(CAST(o.cl AS VARCHAR) AS DOUBLE) AS c,
             v.vol
      FROM ({_DAILY_OHLC_SQL}) o
      JOIN (
        SELECT event_type AS t, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS vol
        FROM events GROUP BY 1, 2
      ) v ON v.t = o.t AND v.day = o.day
"""


def _cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ohlc = _daily_ohlc(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    vol = ev.groupBy(
        F.col("event_type").alias("t"), F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("vol"))
    return ohlc.join(vol, ["t", "day"]).select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("cl").cast("double").alias("c"),
        "vol",
    )


_NVI_SCHEMA = "event_type string, day string, nvi double, pvi double"


def _nvi_partition(batches):
    cur = None
    pc = pvol = None
    nvi = pvi = NVI_BASE
    for pdf in batches:
        out = {k: [] for k in ("event_type", "day", "nvi", "pvi")}
        for t, day, c, vol in zip(pdf["t"], pdf["day"], pdf["c"], pdf["vol"]):
            if t != cur:
                cur = t
                nvi = pvi = NVI_BASE
            else:
                if vol < pvol:
                    nvi = nvi + nvi * ((c - pc) / pc)
                elif vol > pvol:
                    pvi = pvi + pvi * ((c - pc) / pc)
            out["event_type"].append(t)
            out["day"].append(day)
            out["nvi"].append(nvi)
            out["pvi"].append(pvi)
            pc, pvol = c, vol
        yield pd.DataFrame(out)


@query(
    "q_nvi_pvi",
    oracle=f"""
    WITH RECURSIVE cv AS ({_CV_SQL}
    ), s AS (
      SELECT t, day, c, vol,
             CAST(row_number() OVER (PARTITION BY t ORDER BY day)
                  AS BIGINT) AS rn
      FROM cv
    ), r AS (
      SELECT t, day, c, vol, rn,
             CAST({NVI_BASE} AS DOUBLE) AS nvi,
             CAST({NVI_BASE} AS DOUBLE) AS pvi
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.t, s.day, s.c, s.vol, s.rn,
             CASE WHEN s.vol < r.vol
                  THEN r.nvi + r.nvi * ((s.c - r.c) / r.c)
                  ELSE r.nvi END,
             CASE WHEN s.vol > r.vol
                  THEN r.pvi + r.pvi * ((s.c - r.c) / r.c)
                  ELSE r.pvi END
      FROM s JOIN r ON s.t = r.t AND s.rn = r.rn + 1
    )
    SELECT t AS event_type, day, nvi, pvi FROM r
    """,
)
def q_nvi_pvi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative and Positive Volume Indices per event type: the
    {NVI_BASE}-seeded cumulative return indices applied only on
    volume-down (NVI) / volume-up (PVI) days — the q_trix walk
    contract, identical IEEE sequence in both engines, unrounded."""
    return (
        _cv(spark, sf_dir)
        .repartition("t")
        .sortWithinPartitions("t", "day")
        .mapInPandas(_nvi_partition, _NVI_SCHEMA)
    )


# --------------------------------------------------- Fisher transform

# daily close + trailing-window extrema, everything still DECIMAL;
# the bridge to double happens on the three columns at once
_FI_BASE_SQL = f"""
      SELECT t, strftime(day, '%Y-%m-%d') AS day,
             CAST(row_number() OVER pw AS BIGINT) AS rn,
             CAST(CAST(cl AS VARCHAR) AS DOUBLE) AS c,
             CAST(CAST(MIN(cl) OVER fw AS VARCHAR) AS DOUBLE) AS mn,
             CAST(CAST(MAX(cl) OVER fw AS VARCHAR) AS DOUBLE) AS mx
      FROM ({_DAILY_OHLC_SQL})
      WINDOW pw AS (PARTITION BY t ORDER BY day),
             fw AS (PARTITION BY t ORDER BY day
                    ROWS {FI_W - 1} PRECEDING)
"""

_FI_SCHEMA = "event_type string, day string, v double, fisher double"


def _fisher_partition(batches):
    cur = None
    v = fis = 0.0
    for pdf in batches:
        out = {k: [] for k in ("event_type", "day", "v", "fisher")}
        for t, day, rn, c, mn, mx in zip(
            pdf["t"], pdf["day"], pdf["rn"], pdf["c"], pdf["mn"], pdf["mx"]
        ):
            if t != cur:
                cur = t
                v = fis = 0.0
            if rn < FI_W:
                continue
            if rn > FI_W:
                raw = (c - mn) / (mx - mn) if mx > mn else 0.5
                v = 0.33 * (2.0 * (raw - 0.5)) + 0.67 * v
                v = min(max(v, -0.999), 0.999)
                fis = 0.5 * math.log((1.0 + v) / (1.0 - v)) + 0.5 * fis
            out["event_type"].append(t)
            out["day"].append(day)
            out["v"].append(v)
            out["fisher"].append(fis)
        yield pd.DataFrame(out)


@query(
    "q_fisher_transform",
    oracle=f"""
    WITH RECURSIVE base AS ({_FI_BASE_SQL}
    ), s AS (SELECT * FROM base WHERE rn >= {FI_W}
    ), r AS (
      SELECT t, day, rn, c, mn, mx,
             CAST(0 AS DOUBLE) AS v, CAST(0 AS DOUBLE) AS fisher
      FROM s WHERE rn = {FI_W}
      UNION ALL
      SELECT s.t, s.day, s.rn, s.c, s.mn, s.mx,
             least(greatest(
               0.33 * (2.0 * ((CASE WHEN s.mx > s.mn
                                    THEN (s.c - s.mn) / (s.mx - s.mn)
                                    ELSE 0.5 END) - 0.5)) + 0.67 * r.v,
               -0.999), 0.999),
             0.5 * ln((1.0 + least(greatest(
               0.33 * (2.0 * ((CASE WHEN s.mx > s.mn
                                    THEN (s.c - s.mn) / (s.mx - s.mn)
                                    ELSE 0.5 END) - 0.5)) + 0.67 * r.v,
               -0.999), 0.999))
               / (1.0 - least(greatest(
               0.33 * (2.0 * ((CASE WHEN s.mx > s.mn
                                    THEN (s.c - s.mn) / (s.mx - s.mn)
                                    ELSE 0.5 END) - 0.5)) + 0.67 * r.v,
               -0.999), 0.999))) + 0.5 * r.fisher
      FROM s JOIN r ON s.t = r.t AND s.rn = r.rn + 1
    )
    SELECT t AS event_type, day, v, fisher FROM r
    """,
)
def q_fisher_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ehlers Fisher Transform of the daily close's position within
    its trailing {FI_W}-day range: the declared-convention walk of
    the module docstring (seed 0 on the first full-window day, flat
    window ≐ 0.5, ±0.999 clamp), identical IEEE sequence in both
    engines, unrounded output."""
    ohlc = _daily_ohlc(spark, sf_dir)
    pw = Window.partitionBy("t").orderBy("day")
    fw = pw.rowsBetween(-(FI_W - 1), Window.currentRow)
    base = ohlc.select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.row_number().over(pw).cast("bigint").alias("rn"),
        F.col("cl").cast("double").alias("c"),
        F.min("cl").over(fw).cast("double").alias("mn"),
        F.max("cl").over(fw).cast("double").alias("mx"),
    )
    return (
        base.repartition("t")
        .sortWithinPartitions("t", "day")
        .mapInPandas(_fisher_partition, _FI_SCHEMA)
    )


# -------------------------------------------------- Intraday Intensity

_II_SQL = f"""
      SELECT o.t, strftime(o.day, '%Y-%m-%d') AS day,
             CAST(o.hi * 10000 AS BIGINT) AS h4,
             CAST(o.lo * 10000 AS BIGINT) AS l4,
             CAST(o.cl * 10000 AS BIGINT) AS c4,
             v.vol
      FROM ({_DAILY_OHLC_SQL}) o
      JOIN (
        SELECT event_type AS t, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS vol
        FROM events GROUP BY 1, 2
      ) v ON v.t = o.t AND v.day = o.day
"""


@query(
    "q_intraday_intensity",
    oracle=f"""
    WITH d AS ({_II_SQL}
    ), terms AS (
      SELECT t, day,
             CASE WHEN h4 = l4 THEN CAST(0 AS BIGINT)
                  WHEN 2 * c4 - h4 - l4 >= 0 THEN
                    CAST((vol * (2 * c4 - h4 - l4) * {II_SCALE})
                         // (h4 - l4) AS BIGINT)
                  ELSE
                    -CAST((vol * (h4 + l4 - 2 * c4) * {II_SCALE})
                          // (h4 - l4) AS BIGINT)
             END AS term
      FROM d
    )
    SELECT t AS event_type, day,
           CAST(SUM(term) OVER cw AS BIGINT) AS ii_cum_scaled,
           CAST(SUM(term) OVER cw AS DOUBLE) / {II_SCALE}.0 AS ii_cum,
           CAST(SUM(term) OVER tw AS BIGINT) AS ii21_scaled,
           CAST(SUM(term) OVER tw AS DOUBLE) / {II_SCALE}.0 AS ii21
    FROM terms
    WINDOW cw AS (PARTITION BY t ORDER BY day ROWS UNBOUNDED PRECEDING),
           tw AS (PARTITION BY t ORDER BY day ROWS {II_W - 1} PRECEDING)
    """,
)
def q_intraday_intensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraday Intensity per event type: vol·(2c−h−l)/(h−l) under
    the truncated fixed-point convention (toward-zero via abs at both
    sites), with the cumulative and trailing-{II_W}-day sums exact
    BIGINT and ONE flat division each (module docstring)."""
    ohlc = _daily_ohlc(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    vol = ev.groupBy(
        F.col("event_type").alias("t"), F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("vol"))
    d = ohlc.join(vol, ["t", "day"]).select(
        "t",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.col("hi") * 10000).cast("bigint").alias("h4"),
        (F.col("lo") * 10000).cast("bigint").alias("l4"),
        (F.col("cl") * 10000).cast("bigint").alias("c4"),
        "vol",
    )
    term = (
        F.when(F.col("h4") == F.col("l4"), F.lit(0).cast("bigint"))
        .when(
            2 * F.col("c4") - F.col("h4") - F.col("l4") >= 0,
            F.expr(
                f"CAST((vol * (2 * c4 - h4 - l4) * {II_SCALE})"
                " div (h4 - l4) AS BIGINT)"
            ),
        )
        .otherwise(
            -F.expr(
                f"CAST((vol * (h4 + l4 - 2 * c4) * {II_SCALE})"
                " div (h4 - l4) AS BIGINT)"
            )
        )
    )
    terms = d.select("t", "day", term.alias("term"))
    cw = (
        Window.partitionBy("t")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tw = (
        Window.partitionBy("t")
        .orderBy("day")
        .rowsBetween(-(II_W - 1), Window.currentRow)
    )
    return terms.select(
        F.col("t").alias("event_type"),
        "day",
        F.sum("term").over(cw).cast("bigint").alias("ii_cum_scaled"),
        (F.sum("term").over(cw).cast("double") / F.lit(float(II_SCALE))).alias(
            "ii_cum"
        ),
        F.sum("term").over(tw).cast("bigint").alias("ii21_scaled"),
        (F.sum("term").over(tw).cast("double") / F.lit(float(II_SCALE))).alias(
            "ii21"
        ),
    )
