"""Promoted into load_all()'s round-13 tail: the Page–Hinkley drift detector (Page,
Biometrika 1954; Hinkley 1971 — the sequential mean-shift test that
streaming drift monitors like MOA/river implement): accumulate
m_t = Σ(x_i − x̄_i − δ) against the RUNNING mean, track its running
minimum, and alarm when the gap m_t − min(m) exceeds λ. The running-
mean recursion makes it a carry-state walk, not a window — the
q_trix/q_kalman contract.

Exactness: the daily level enters as the VARCHAR-bridged exact-
DECIMAL double; the walk state (running sum, m, min m) evolves by
flat IEEE ops in identical order on both engines (mapInPandas walk
vs recursive-CTE replay), so every emitted statistic is bit-identical
and only the display columns round. δ and λ are binary-exact
constants.

Scale shape: one (type, day) reduce; the walk runs on the bounded
daily series per type (the timeseries27 argument).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.timeseries27 import _DAILY_SQL27, _daily27
from timestream_travel_spark.registry import query

PH_DELTA = 0.5  # drift insensitivity margin (binary-exact)
PH_LAMBDA = 512.0  # alarm threshold on the cumulative gap (2^9)

_PH_SCHEMA = (
    "event_type string, day string, m double, ph double, alarm int"
)


def _ph_partition(batches):
    """Running-mean CUSUM walk; emits m_t, the gap to its running
    minimum, and the λ-threshold alarm flag."""
    cur = None
    s = m = mn = 0.0
    k = 0
    for pdf in batches:
        types = pdf["t"].to_list()
        ms, phs, alarms = [], [], []
        for t, x in zip(types, pdf["x"].to_list()):
            if t != cur:
                cur, s, k = t, x, 1
                m = x - s / 1 - PH_DELTA  # first deviation: x − x̄₁ − δ
                mn = min(0.0, m)
            else:
                k += 1
                s = s + x
                m = m + (x - s / k - PH_DELTA)
                mn = min(mn, m)
            ph = m - mn
            ms.append(m)
            phs.append(ph)
            alarms.append(1 if ph > PH_LAMBDA else 0)
        yield pd.DataFrame(
            {
                "event_type": types,
                "day": pdf["day"],
                "m": ms,
                "ph": phs,
                "alarm": pd.array(alarms, dtype="int32"),
            }
        )


@query(
    "q_page_hinkley",
    oracle=f"""
    WITH RECURSIVE daily AS ({_DAILY_SQL27}
    ), s AS (
      SELECT t, day, CAST(CAST(v AS VARCHAR) AS DOUBLE) AS x,
             row_number() OVER (PARTITION BY t ORDER BY day) AS rn
      FROM daily
    ), r AS (
      SELECT t, day, rn, x AS s, 1 AS k,
             x - x / 1 - {PH_DELTA} AS m,
             least(0.0, x - x / 1 - {PH_DELTA}) AS mn
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.t, s.day, s.rn, r.s + s.x, r.k + 1,
             r.m + (s.x - (r.s + s.x) / (r.k + 1) - {PH_DELTA}),
             least(r.mn,
                   r.m + (s.x - (r.s + s.x) / (r.k + 1) - {PH_DELTA}))
      FROM s JOIN r ON s.t = r.t AND s.rn = r.rn + 1
    )
    SELECT t AS event_type, day, m, m - mn AS ph,
           CAST(CASE WHEN m - mn > {PH_LAMBDA} THEN 1 ELSE 0 END AS INT)
             AS alarm
    FROM r
    """,
)
def q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley upward-drift detector per event type on the
    daily level: m_t = Σ(x_i − x̄_i − δ) with the RUNNING mean
    x̄_i = S_i/i, PH_t = m_t − min_{{s≤t}} m_s, alarm at PH > λ
    (δ={PH_DELTA}, λ={PH_LAMBDA}, both binary-exact). Same IEEE walk
    both engines; m and ph emitted unrounded."""
    daily = _daily27(spark, sf_dir).select(
        "t", "day", F.col("v").cast("double").alias("x")
    )
    return (
        daily.repartition("t")
        .sortWithinPartitions("t", "day")
        .mapInPandas(_ph_partition, _PH_SCHEMA)
    )
