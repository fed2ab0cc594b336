"""Time-series operators, part 12 (round-5 wave 7): fixed-frequency
spectral power (Goertzel/DFT projection), MACD momentum, Kaplan-Meier
survival of session durations, and Haar wavelet energy per scale.

These extend the series-analytics family the reference's domain
implies (Amazon Timestream ships raw SQL to a remote engine,
cmd/backup.go:240-257; periodicity/momentum/survival/multi-resolution
views are the standard follow-on asks on such data). Cross-engine
rules follow the registry contract: exact DECIMAL accumulation,
VARCHAR-bridged DECIMAL→DOUBLE casts in the oracle, shared Python
literals in BOTH plans, deterministic in-row folds instead of
order-dependent double SUMs, and mapInPandas carry-state recurrences
mirrored by recursive-CTE oracles walking the identical IEEE-754 op
sequence.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# ------------------------------------------------------------- Goertzel

# Phase tables for the 24h and 12h harmonics of an hourly series.
# cos/sin evaluated ONCE here in Python and emitted into BOTH engines'
# plans (the q_benford_digits rule: no cross-engine libm) — Spark gets
# the float values as array literals, DuckDB the repr() text, and both
# parse/transfer to the identical double.
_C24 = [math.cos(2.0 * math.pi * h / 24.0) for h in range(24)]
_S24 = [math.sin(2.0 * math.pi * h / 24.0) for h in range(24)]
_C12 = [math.cos(2.0 * math.pi * h / 12.0) for h in range(24)]
_S12 = [math.sin(2.0 * math.pi * h / 12.0) for h in range(24)]

# VARCHAR-bridged literals: a bare decimal literal parses as DECIMAL
# in DuckDB and its DECIMAL→DOUBLE cast is not correctly rounded
# (cos(2π/24) came back one ulp off); the VARCHAR→DOUBLE path (strtod)
# is, and matches Spark's parse of the same repr() text exactly.
_TRIG_SQL_VALUES = ", ".join(
    f"({h}, CAST('{_C24[h]!r}' AS DOUBLE), CAST('{_S24[h]!r}' AS DOUBLE),"
    f" CAST('{_C12[h]!r}' AS DOUBLE), CAST('{_S12[h]!r}' AS DOUBLE))"
    for h in range(24)
)


def _fold_sum(arr_col: str, field: str):
    """Deterministic left fold Σ x.field over a sorted struct array —
    double addition is order-dependent, so the fold order must be
    pinned identically in both engines (acc seeded 0.0, hod order)."""
    return F.aggregate(arr_col, F.lit(0.0), lambda acc, x: acc + x[field])


@query(
    "q_goertzel_power",
    oracle=f"""
    WITH trig(hod, c24, s24, c12, s12) AS (VALUES {_TRIG_SQL_VALUES}),
    hourly AS (
      SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    terms AS (
      SELECT event_type, hod,
             v * c24 AS tc24, v * s24 AS ts24,
             v * c12 AS tc12, v * s12 AS ts12
      FROM hourly JOIN trig USING (hod)
    ),
    folded AS (
      SELECT event_type,
             list_reduce(list_prepend(0.0, list(tc24 ORDER BY hod)), (a, b) -> a + b) AS c24,
             list_reduce(list_prepend(0.0, list(ts24 ORDER BY hod)), (a, b) -> a + b) AS s24,
             list_reduce(list_prepend(0.0, list(tc12 ORDER BY hod)), (a, b) -> a + b) AS c12,
             list_reduce(list_prepend(0.0, list(ts12 ORDER BY hod)), (a, b) -> a + b) AS s12
      FROM terms GROUP BY event_type
    )
    SELECT event_type,
           c24 * c24 + s24 * s24 AS power_24h,
           c12 * c12 + s12 * s12 AS power_12h
    FROM folded
    """,
)
def q_goertzel_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral power of each event_type's value series at the 24h and
    12h harmonics — the Goertzel/single-bin-DFT periodicity probe
    (power_T = (Σ v·cos(2πh/T))² + (Σ v·sin(2πh/T))²).

    Scale shape: ONE map-side-combined (event_type, hour-of-day)
    DECIMAL reduce does all the 100 TB work — the phase of an hourly
    sample at period 24h/12h depends only on hour-of-day, so the trig
    weights join a 24-row literal table (broadcast-sized). The
    order-dependent double Σ v·cos runs as a deterministic in-row
    fold over the hod-sorted 24-entry array (acc seeded 0.0 in both
    engines), never as a partial-aggregated double SUM. The hourly
    sums stay within double precision at test SFs; past that, the
    VARCHAR bridge on the oracle side keeps the cast correctly
    rounded."""
    c24 = F.array(*[F.lit(v) for v in _C24])
    s24 = F.array(*[F.lit(v) for v in _S24])
    c12 = F.array(*[F.lit(v) for v in _C12])
    s12 = F.array(*[F.lit(v) for v in _S12])
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.hour("ts").cast("bigint").alias("hod"))
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"))
    )
    idx = (F.col("hod") + 1).cast("int")
    terms = hourly.select(
        "event_type",
        "hod",
        (F.col("v") * F.element_at(c24, idx)).alias("tc24"),
        (F.col("v") * F.element_at(s24, idx)).alias("ts24"),
        (F.col("v") * F.element_at(c12, idx)).alias("tc12"),
        (F.col("v") * F.element_at(s12, idx)).alias("ts12"),
    )
    folded = terms.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("hod", "tc24", "ts24", "tc12", "ts12"))
        ).alias("arr")
    )
    return folded.select(
        "event_type",
        (
            _fold_sum("arr", "tc24") * _fold_sum("arr", "tc24")
            + _fold_sum("arr", "ts24") * _fold_sum("arr", "ts24")
        ).alias("power_24h"),
        (
            _fold_sum("arr", "tc12") * _fold_sum("arr", "tc12")
            + _fold_sum("arr", "ts12") * _fold_sum("arr", "ts12")
        ).alias("power_12h"),
    )


# ----------------------------------------------------------------- MACD

# MACD gains, 3-place literals written inline in BOTH the Python loop
# and the oracle SQL (the q_holt_winters bit-parity contract; change
# all places together): fast EMA a=0.154 (≈2/13), slow a=0.074
# (≈2/27), signal a=0.2 (=2/10).

_MACD_SCHEMA = (
    "event_type string, day string, x double, macd double,"
    " signal_ema double, histogram double"
)


def _macd_partition(batches):
    """Partition-wise MACD: rows arrive hash-partitioned by
    event_type and sorted (event_type, day); carry the EMA triple
    across Arrow batch boundaries. Seeds: e12 = e26 = x_1 (so
    macd_1 = 0), signal_1 = macd_1."""
    cur, e12, e26, sig = None, 0.0, 0.0, 0.0
    for pdf in batches:
        types = pdf["event_type"].to_list()
        vals = pdf["x"].to_list()
        macds, sigs, hists = [], [], []
        for t, x in zip(types, vals):
            if t != cur:
                cur, e12, e26 = t, x, x
                macd = e12 - e26
                sig = macd
            else:
                e12 = 0.846 * e12 + 0.154 * x
                e26 = 0.926 * e26 + 0.074 * x
                macd = e12 - e26
                sig = 0.8 * sig + 0.2 * macd
            macds.append(macd)
            sigs.append(sig)
            hists.append(macd - sig)
        yield pd.DataFrame(
            {
                "event_type": types,
                "day": pdf["day"],
                "x": vals,
                "macd": macds,
                "signal_ema": sigs,
                "histogram": hists,
            }
        )


@query(
    "q_macd",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type, day, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ), r AS (
      SELECT event_type, day, x, rn, x AS e12, x AS e26,
             CAST(0.0 AS DOUBLE) AS macd, CAST(0.0 AS DOUBLE) AS sig
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.day, s.x, s.rn,
             0.846 * r.e12 + 0.154 * s.x,
             0.926 * r.e26 + 0.074 * s.x,
             (0.846 * r.e12 + 0.154 * s.x) - (0.926 * r.e26 + 0.074 * s.x),
             0.8 * r.sig + 0.2 * ((0.846 * r.e12 + 0.154 * s.x)
                                  - (0.926 * r.e26 + 0.074 * s.x))
      FROM s JOIN r ON s.event_type = r.event_type AND s.rn = r.rn + 1
    )
    SELECT event_type, day, x, macd, sig AS signal_ema,
           macd - sig AS histogram
    FROM r
    """,
)
def q_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD momentum per event_type over the daily value-sum series:
    fast EMA − slow EMA, a signal EMA of the MACD line, and the
    histogram (macd − signal) whose sign flips mark crossovers.

    Scale shape: one map-side-combined (event_type, day) DECIMAL
    reduce does the 100 TB work; the three chained EMA recurrences
    then walk the bounded daily series via the q_ewma_batch
    mapInPandas carry-state form (one shuffle, O(1) state, one Python
    call per Arrow batch — NOT per series). Oracle: recursive CTE
    walking the identical IEEE sequence; compared unrounded, with the
    3-place gain literals written inline at both sites."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("x"))
    return (
        daily.repartition("event_type")
        .sortWithinPartitions("event_type", "day")
        .mapInPandas(_macd_partition, _MACD_SCHEMA)
    )


# --------------------------------------------------------- Kaplan-Meier

from timestream_travel_spark.operators.timeseries import (  # noqa: E402
    SESSION_GAP_S,
    sessionized,
)

KM_CENSOR_S = 1800  # sessions ending within 30 min of the data edge
#                     may still be open → right-censored

_KM_SCHEMA = (
    "dur_min bigint, n_at_risk bigint, d_events bigint,"
    " n_censored bigint, survival double"
)


def _km_partition(batches):
    """Cumulative-product walk over the ascending risk table (ONE
    bounded global series — the caller coalesces to a single sorted
    partition). survival_t = survival_{t-1} * ((n_t - d_t) / n_t),
    written exactly as the oracle so both engines walk the same
    IEEE divide-then-multiply sequence."""
    s = 1.0
    for pdf in batches:
        out = []
        for n, d in zip(pdf["n_at_risk"].to_list(), pdf["d_events"].to_list()):
            s = s * ((n - d) / n)
            out.append(s)
        yield pd.DataFrame(
            {
                "dur_min": pdf["dur_min"],
                "n_at_risk": pdf["n_at_risk"],
                "d_events": pdf["d_events"],
                "n_censored": pdf["n_censored"],
                "survival": out,
            }
        )


@query(
    "q_kaplan_meier",
    oracle=f"""
    WITH RECURSIVE flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
                    > {SESSION_GAP_S}
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS session_id,
             ts, event_id
      FROM flagged
    ), bounds AS (
      SELECT user_id, session_id, MIN(ts) AS t0, MAX(ts) AS t1
      FROM sess GROUP BY user_id, session_id
    ), durs AS (
      SELECT (CAST(floor(epoch(t1)) AS BIGINT)
              - CAST(floor(epoch(t0)) AS BIGINT)) // 60 AS dur_min,
             CASE WHEN t1 >= (SELECT MAX(ts) FROM events)
                            - INTERVAL {KM_CENSOR_S} SECOND
                  THEN 0 ELSE 1 END AS ev
      FROM bounds
    ), risk AS (
      SELECT dur_min,
             SUM(ev) AS d_events,
             SUM(1 - ev) AS n_censored,
             COUNT(*) AS m
      FROM durs GROUP BY dur_min
    ), ordered AS (
      SELECT dur_min, d_events, n_censored,
             (SELECT COUNT(*) FROM durs)
               - SUM(m) OVER (ORDER BY dur_min
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) + m AS n_at_risk,
             row_number() OVER (ORDER BY dur_min) AS rn
      FROM risk
    ), r AS (
      SELECT dur_min, n_at_risk, d_events, n_censored, rn,
             1.0 * ((CAST(n_at_risk - d_events AS DOUBLE))
                    / CAST(n_at_risk AS DOUBLE)) AS survival
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.dur_min, o.n_at_risk, o.d_events, o.n_censored, o.rn,
             r.survival * ((CAST(o.n_at_risk - o.d_events AS DOUBLE))
                           / CAST(o.n_at_risk AS DOUBLE))
      FROM ordered o JOIN r ON o.rn = r.rn + 1
    )
    SELECT CAST(dur_min AS BIGINT) AS dur_min,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(d_events AS BIGINT) AS d_events,
           CAST(n_censored AS BIGINT) AS n_censored,
           survival
    FROM r
    """,
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of session durations (minutes),
    right-censoring sessions that end within {KM_CENSOR_S}s of the
    data edge (they may still be open — their duration is a lower
    bound, so they leave the risk set without counting as an event).
    S(t) = Π_{{u ≤ t}} (1 − d_u/n_u) with the standard
    deaths-before-censorings-at-equal-time convention.

    Scale shape: sessionization (one user_id exchange) + a (dur_min)
    reduce do all the 100 TB work; the risk table is bounded by the
    number of DISTINCT durations in minutes (≤ fixture window
    length), so the global cumulative window and the sequential
    product walk both run over a broadcast-sized table. The product
    recurrence uses the q_holt_winters single-partition mapInPandas
    shape; oracle: recursive CTE over the identical risk table,
    compared unrounded (each factor is one correctly-rounded integer
    division, each step one multiply)."""
    ev = load_table(spark, sf_dir, "events")
    sess = sessionized(ev)
    bounds = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    )
    edge = ev.agg(F.max("ts").alias("max_ts"))  # 1-row broadcast
    durs = bounds.crossJoin(F.broadcast(edge)).select(
        (
            (F.unix_timestamp("t1") - F.unix_timestamp("t0")) / F.lit(60)
        )
        .cast("bigint")
        .alias("dur_min"),
        F.when(
            F.col("t1")
            >= F.col("max_ts") - F.expr(f"INTERVAL {KM_CENSOR_S} SECOND"),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("ev"),
    )
    risk = durs.groupBy("dur_min").agg(
        F.sum("ev").alias("d_events"),
        F.sum(F.lit(1) - F.col("ev")).alias("n_censored"),
        F.count(F.lit(1)).alias("m"),
    )
    # bounded table (distinct minute durations) → global window is fine
    wcum = Window.orderBy("dur_min").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = durs.agg(F.count(F.lit(1)).alias("n_total"))
    ordered = risk.crossJoin(F.broadcast(total)).select(
        "dur_min",
        "d_events",
        "n_censored",
        (F.col("n_total") - F.sum("m").over(wcum) + F.col("m")).alias("n_at_risk"),
    )
    return (
        ordered.coalesce(1)
        .sortWithinPartitions("dur_min")
        .mapInPandas(_km_partition, _KM_SCHEMA)
        .select(
            F.col("dur_min").cast("bigint").alias("dur_min"),
            F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
            F.col("d_events").cast("bigint").alias("d_events"),
            F.col("n_censored").cast("bigint").alias("n_censored"),
            "survival",
        )
    )


# ----------------------------------------------------------- Haar energy

HAAR_N = 32  # dyadic window: first 32 hours of the fixture range
HAAR_LEVELS = 5  # log2(HAAR_N)


def _haar_level_sql(lev: int) -> str:
    """One level's detail energy: coefficients are signed DECIMAL
    sums over 2^lev-hour blocks; energy = Σ coef² / 2^lev."""
    half, block = 2 ** (lev - 1), 2**lev
    return f"""
      SELECT event_type, {lev} AS level,
             CAST(CAST(SUM(coef * coef) AS VARCHAR) AS DOUBLE) / {block} AS energy
      FROM (
        SELECT event_type, h // {block} AS blk,
               CAST(SUM(CASE WHEN (h // {half}) % 2 = 0 THEN v ELSE -v END)
                    AS DECIMAL(18,4)) AS coef
        FROM grid GROUP BY event_type, h // {block}
      ) GROUP BY event_type
    """


_HAAR_ORACLE = f"""
    WITH hourly AS (
      SELECT event_type,
             date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
                       date_trunc('hour', ts)) AS h,
             SUM(CAST(value AS DECIMAL(18,4))) AS v
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT unnest(range({HAAR_N})) AS h) g
    ),
    grid AS (
      SELECT s.event_type, s.h,
             COALESCE(hh.v, CAST(0 AS DECIMAL(18,4))) AS v
      FROM spine s LEFT JOIN hourly hh
        ON s.event_type = hh.event_type AND s.h = hh.h
    )
    {" UNION ALL ".join(_haar_level_sql(lev) for lev in range(1, HAAR_LEVELS + 1))}
    UNION ALL
    SELECT event_type, 0 AS level,
           CAST(CAST(a * a AS VARCHAR) AS DOUBLE) / {HAAR_N} AS energy
    FROM (
      SELECT event_type, CAST(SUM(v) AS DECIMAL(18,4)) AS a
      FROM grid GROUP BY event_type
    )
"""


@query("q_haar_energy", oracle=_HAAR_ORACLE)
def q_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy per scale over each event_type's first
    {HAAR_N} hourly value-sums (zero-filled grid): level-ℓ detail
    coefficients are (first-half − second-half) sums over 2^ℓ-hour
    blocks, energy_ℓ = Σ_k coef²/2^ℓ; level 0 is the approximation
    energy (Σv)²/{HAAR_N}. Orthonormality gives Parseval's identity
    Σ_ℓ energy_ℓ = Σ_h v_h² (pinned by pytest), so the 6-row-per-type
    output is a lossless energy decomposition by time scale —
    which resolutions carry the signal.

    Scale shape: ONE map-side-combined (event_type, hour) DECIMAL
    reduce does the 100 TB work; the {HAAR_N}-slot grid and all 5
    level aggregates run over |types|×{HAAR_N} rows. All arithmetic
    stays exact DECIMAL (coef clamped to DECIMAL(18,4) so coef² fits
    precision 37) until one VARCHAR-bridged double cast, then a
    final division by the exact power of two."""
    ev = load_table(spark, sf_dir, "events")
    epoch0 = F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    hourly = (
        ev.groupBy(
            "event_type",
            (
                (F.unix_timestamp(F.date_trunc("hour", "ts")) - epoch0) / 3600
            )
            .cast("bigint")
            .alias("h"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("v"))
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(spark.range(HAAR_N).select(F.col("id").alias("h")))
    grid = (
        spine.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce(F.col("v"), F.lit(0).cast("decimal(18,4)")).alias("v"),
        )
    )
    levels = []
    for lev in range(1, HAAR_LEVELS + 1):
        half, block = 2 ** (lev - 1), 2**lev
        signed = F.when((F.col("h") / half).cast("bigint") % 2 == 0, F.col("v")).otherwise(
            -F.col("v")
        )
        coefs = grid.groupBy(
            "event_type", (F.col("h") / block).cast("bigint").alias("blk")
        ).agg(F.sum(signed).cast("decimal(18,4)").alias("coef"))
        levels.append(
            coefs.groupBy("event_type").agg(
                (
                    F.sum(F.col("coef") * F.col("coef")).cast("double") / F.lit(block)
                ).alias("energy")
            )
            .select("event_type", F.lit(lev).alias("level"), "energy")
        )
    approx = (
        grid.groupBy("event_type")
        .agg(F.sum("v").cast("decimal(18,4)").alias("a"))
        .select(
            "event_type",
            F.lit(0).alias("level"),
            ((F.col("a") * F.col("a")).cast("double") / F.lit(HAAR_N)).alias("energy"),
        )
    )
    out = levels[0]
    for df in levels[1:]:
        out = out.unionByName(df)
    return out.unionByName(approx).select(
        "event_type", F.col("level").cast("int").alias("level"), "energy"
    )


# ------------------------------------------------------- Fano burstiness


@query(
    "q_fano_burstiness",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
                       date_trunc('hour', ts)) AS h,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT date_diff('hour', MIN(date_trunc('hour', ts)),
                       MAX(date_trunc('hour', ts))) + 1 AS n_hours
      FROM events
    ), moments AS (
      SELECT event_type,
             SUM(c) AS s1,
             SUM(c * c) AS s2
      FROM hourly GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_hours AS BIGINT) AS n_hours,
           CAST(s1 AS BIGINT) AS n_events,
           (CAST(s2 AS DOUBLE) / CAST(n_hours AS DOUBLE)
            - (CAST(s1 AS DOUBLE) / CAST(n_hours AS DOUBLE))
              * (CAST(s1 AS DOUBLE) / CAST(n_hours AS DOUBLE)))
           / (CAST(s1 AS DOUBLE) / CAST(n_hours AS DOUBLE)) AS fano
    FROM moments CROSS JOIN span
    """,
)
def q_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion) of each event_type's hourly
    arrival counts over the fixture's full hour span — variance/mean
    of the count process. ≈1 is Poisson-like arrival, >1 bursty,
    <1 regular; the standard burstiness diagnostic for event
    streams. Zero hours count (they carry the burstiness signal),
    but never materialize: with s1 = Σc and s2 = Σc² over OBSERVED
    hours only, the population moments over ALL n hours are
    mean = s1/n and E[c²] = s2/n exactly (zeros add nothing to
    either sum).

    Scale shape: one map-side-combined (event_type, hour) reduce +
    one tiny moments reduce; the hour span is a 1-row broadcast.
    Every operand is an exact integer entering an identically
    parenthesized double expression — each step correctly rounded
    in both engines — emitted UNROUNDED."""
    ev = load_table(spark, sf_dir, "events")
    epoch0 = F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    hourly = ev.groupBy(
        "event_type",
        ((F.unix_timestamp(F.date_trunc("hour", "ts")) - epoch0) / 3600)
        .cast("bigint")
        .alias("h"),
    ).agg(F.count(F.lit(1)).alias("c"))
    span = ev.agg(
        (
            (
                F.unix_timestamp(F.date_trunc("hour", F.max("ts")))
                - F.unix_timestamp(F.date_trunc("hour", F.min("ts")))
            )
            / 3600
            + 1
        )
        .cast("bigint")
        .alias("n_hours")
    )
    moments = hourly.groupBy("event_type").agg(
        F.sum("c").alias("s1"), F.sum(F.col("c") * F.col("c")).alias("s2")
    )
    mean = F.col("s1").cast("double") / F.col("n_hours").cast("double")
    fano = (
        F.col("s2").cast("double") / F.col("n_hours").cast("double") - mean * mean
    ) / mean
    return moments.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.col("n_hours").cast("bigint").alias("n_hours"),
        F.col("s1").cast("bigint").alias("n_events"),
        fano.alias("fano"),
    )
