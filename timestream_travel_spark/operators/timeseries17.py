"""Round-8 time-series wave E: spectral entropy over the hour-of-day
harmonic grid (Inouye et al., IEEE TBME 1991 — normalized Shannon
entropy of the power spectrum), the Higuchi fractal dimension
(Higuchi, Physica D 1988), and Sharpe / Sortino risk-adjusted return
ratios (Sharpe 1966; Sortino & Price 1994) on the daily level series
— roughness and signal-shape companions to the Hurst exponent and
the volatility estimators (timeseries15).

Exactness design:
- Spectral powers extend q_goertzel_power's single-bin DFT to the
  first five hour-of-day harmonics: trig weights are evaluated ONCE
  in Python and emitted into both plans (array literals / VARCHAR-
  bridged repr text — the no-cross-engine-libm rule), and each
  Σ v·cos runs as the deterministic hod-ordered left fold; the
  5-term entropy chain is written left-associated in both engines.
- Higuchi's per-offset curve lengths come from exact DECIMAL
  |difference| sums over stride-k self-joins; each L_m(k) is one
  flat float, DECIMAL-quantized before the order-independent mean
  over offsets; the four ln L(k) regression weights are literal
  doubles (the Hurst literal-design pattern).
- Returns r_d = v_d/v_{d-1} − 1 are flat floats off bridged DECIMAL
  daily levels; r and r² quantize to DECIMAL before the per-type
  sums, so mean/variance/downside deviation are engine-exact.

Scale shape: every query reduces events to a calendar- or
hod-bounded table first (map-side combined); stride joins and
harmonic folds run on those bounded tables only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.timeseries12 import _fold_sum
from timestream_travel_spark.operators.timeseries16 import (
    _HOURLY_IDX_SQL,
    _hourly_idx,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# ------------------------------------------------- spectral entropy

N_HARM = 5  # harmonics 1..5 of the 24h day (periods 24,12,8,6,4.8h)

_CS = {
    k: (
        [math.cos(2.0 * math.pi * k * h / 24.0) for h in range(24)],
        [math.sin(2.0 * math.pi * k * h / 24.0) for h in range(24)],
    )
    for k in range(1, N_HARM + 1)
}

_SPEC_TRIG_VALUES = ", ".join(
    "(" + str(h) + ", " + ", ".join(
        f"CAST('{_CS[k][0][h]!r}' AS DOUBLE), CAST('{_CS[k][1][h]!r}' AS DOUBLE)"
        for k in range(1, N_HARM + 1)
    ) + ")"
    for h in range(24)
)
_SPEC_TRIG_COLS = ", ".join(f"c{k}, s{k}" for k in range(1, N_HARM + 1))
_SPEC_TERM_COLS = ", ".join(
    f"v * c{k} AS tc{k}, v * s{k} AS ts{k}" for k in range(1, N_HARM + 1)
)
_SPEC_FOLDS = ", ".join(
    f"list_reduce(list_prepend(0.0, list(tc{k} ORDER BY hod)), (a, b) -> a + b) AS c{k},"
    f" list_reduce(list_prepend(0.0, list(ts{k} ORDER BY hod)), (a, b) -> a + b) AS s{k}"
    for k in range(1, N_HARM + 1)
)
_SPEC_POWERS = ", ".join(
    f"c{k} * c{k} + s{k} * s{k} AS p{k}" for k in range(1, N_HARM + 1)
)
_SPEC_TOT = " + ".join(f"p{k}" for k in range(1, N_HARM + 1))
_SPEC_H = " + ".join(
    f"(CASE WHEN p{k} > 0 THEN -(p{k} / tot) * log2(p{k} / tot) ELSE 0 END)"
    for k in range(1, N_HARM + 1)
)


@query(
    "q_spectral_entropy",
    oracle=f"""
    WITH trig(hod, {_SPEC_TRIG_COLS}) AS (VALUES {_SPEC_TRIG_VALUES}),
    hourly AS (
      SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    terms AS (
      SELECT event_type, hod, {_SPEC_TERM_COLS}
      FROM hourly JOIN trig USING (hod)
    ),
    folded AS (
      SELECT event_type, {_SPEC_FOLDS}
      FROM terms GROUP BY event_type
    ),
    powers AS (
      SELECT event_type, {_SPEC_POWERS} FROM folded
    ),
    tot AS (
      SELECT event_type, p1, p2, p3, p4, p5, {_SPEC_TOT} AS tot FROM powers
    )
    SELECT event_type,
           round(({_SPEC_H}), 6) AS spectral_entropy_bits,
           round(({_SPEC_H}) / log2({N_HARM}.0), 6) AS spectral_entropy_norm
    FROM tot
    """,
)
def q_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized spectral entropy of each event type's hour-of-day
    profile over the first {N_HARM} daily harmonics: p_k = P_k/ΣP,
    H = −Σ p_k·log2 p_k, H_norm = H/log2({N_HARM}). Low entropy =
    one dominant periodicity (a clean daily cycle); high = power
    spread across harmonics.

    The single-bin DFT powers reuse q_goertzel_power's plan: ONE
    map-side-combined (type, hod) DECIMAL reduce, 24-row literal
    trig table, deterministic hod-ordered folds; the {N_HARM}-term
    entropy is a left-associated literal chain in both engines."""
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.hour("ts").cast("bigint").alias("hod"))
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"))
    )
    idx = (F.col("hod") + 1).cast("int")
    term_cols = []
    fields = []
    for k in range(1, N_HARM + 1):
        ck = F.array(*[F.lit(v) for v in _CS[k][0]])
        sk = F.array(*[F.lit(v) for v in _CS[k][1]])
        term_cols.append((F.col("v") * F.element_at(ck, idx)).alias(f"tc{k}"))
        term_cols.append((F.col("v") * F.element_at(sk, idx)).alias(f"ts{k}"))
        fields += [f"tc{k}", f"ts{k}"]
    terms = hourly.select("event_type", "hod", *term_cols)
    folded = terms.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("hod", *fields))).alias("arr")
    )
    powers = folded.select(
        "event_type",
        *[
            (
                _fold_sum("arr", f"tc{k}") * _fold_sum("arr", f"tc{k}")
                + _fold_sum("arr", f"ts{k}") * _fold_sum("arr", f"ts{k}")
            ).alias(f"p{k}")
            for k in range(1, N_HARM + 1)
        ],
    )
    tot = None
    for k in range(1, N_HARM + 1):
        tot = F.col(f"p{k}") if tot is None else tot + F.col(f"p{k}")
    powers = powers.withColumn("tot", tot)
    h = None
    for k in range(1, N_HARM + 1):
        pk = F.col(f"p{k}")
        term = F.when(
            pk > 0, -(pk / F.col("tot")) * F.log2(pk / F.col("tot"))
        ).otherwise(0.0)
        h = term if h is None else h + term
    return powers.select(
        "event_type",
        F.round(h, 6).alias("spectral_entropy_bits"),
        F.round(h / F.log2(F.lit(float(N_HARM))), 6).alias(
            "spectral_entropy_norm"
        ),
    )


# ------------------------------------------------- Higuchi fractal dim

HIGUCHI_KS = (1, 2, 4, 8)
# OLS weights for the slope of ln L(k) on ln k at k = 1,2,4,8:
# ln k = (0,1,2,3)·ln2, centered deviations (−1.5,−0.5,0.5,1.5)·ln2,
# w_i = dev_i / Σdev² with Σdev² = 5·ln2² — evaluated once here and
# emitted as literals into both engines (no cross-engine libm).
_HW = [
    (-1.5) / (5.0 * math.log(2.0)),
    (-0.5) / (5.0 * math.log(2.0)),
    (0.5) / (5.0 * math.log(2.0)),
    (1.5) / (5.0 * math.log(2.0)),
]
_H_PIVOT = ", ".join(
    f"MAX(CASE WHEN k = {k} THEN lk END) AS l{k}" for k in HIGUCHI_KS
)
_H_SLOPE = " + ".join(
    f"CAST('{_HW[i]!r}' AS DOUBLE) * ln(l{k})" for i, k in enumerate(HIGUCHI_KS)
)


@query(
    "q_higuchi_fd",
    oracle=f"""
    WITH hourly AS ({_HOURLY_IDX_SQL}
    ), nmax AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM hourly GROUP BY t
    ), diffs AS (
      SELECT a.t, ks.k, CAST((a.i - 1) % ks.k + 1 AS BIGINT) AS m,
             abs(a.v - b.v) AS d
      FROM hourly a
      JOIN (SELECT unnest([{", ".join(str(k) for k in HIGUCHI_KS)}]) AS k) ks ON true
      JOIN hourly b ON b.t = a.t AND b.i = a.i + ks.k
    ), lm AS (
      SELECT t, k, m,
             CAST(CAST(SUM(CAST(d AS DECIMAL(24,4))) AS VARCHAR) AS DOUBLE) AS s,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM diffs GROUP BY t, k, m
    ), lk AS (
      SELECT lm.t, lm.k,
             CAST(CAST(SUM(CAST(lm.s * (nm.n - 1)
                                / (CAST(lm.cnt AS DOUBLE) * lm.k * lm.k)
                                AS DECIMAL(26,8))) AS VARCHAR) AS DOUBLE)
               / lm.k AS lk
      FROM lm JOIN nmax nm ON nm.t = lm.t
      GROUP BY lm.t, lm.k
    ), piv AS (
      SELECT t, {_H_PIVOT} FROM lk GROUP BY t
    )
    SELECT t AS event_type,
           round(l1, 6) AS curve_len_k1,
           round(-({_H_SLOPE}), 6) AS higuchi_fd
    FROM piv
    """,
)
def q_higuchi_fd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higuchi fractal dimension of each event type's hourly level
    series (Higuchi 1988): for stride k ∈ {HIGUCHI_KS} and offset
    m ≤ k, the normalized curve length
    L_m(k) = Σ|x_{{m+jk}} − x_{{m+(j−1)k}}| · (n−1)/(N_mk·k²); L(k)
    is the offset mean, and FD = −slope of ln L(k) on ln k (≈1 for
    smooth curves, →2 for space-filling noise).

    Stride diffs are exact DECIMAL |differences| from a bounded
    self-join on the span-limited hourly table; each L_m(k) is one
    flat float quantized to DECIMAL before the order-independent
    offset mean; the 4-point regression collapses to literal-weight
    ln terms (the q_hurst_rs literal-design pattern), pivoted into
    per-k columns so the final chain is flat."""
    hourly = _hourly_idx(spark, sf_dir)
    nmax = hourly.groupBy("t").agg(F.count("*").alias("n"))
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in HIGUCHI_KS])).alias("k")
    )
    a = hourly.select(F.col("t"), F.col("i"), F.col("v"))
    b = hourly.select(
        F.col("t").alias("tb"), F.col("i").alias("ib"), F.col("v").alias("vb")
    )
    diffs = (
        a.crossJoin(F.broadcast(ks))
        .join(b, (F.col("tb") == F.col("t")) & (F.col("ib") == F.col("i") + F.col("k")))
        .select(
            "t",
            "k",
            ((F.col("i") - 1) % F.col("k") + 1).cast("bigint").alias("m"),
            F.abs(F.col("v") - F.col("vb")).alias("d"),
        )
    )
    lm = diffs.groupBy("t", "k", "m").agg(
        F.sum(F.col("d").cast("decimal(24,4)")).cast("double").alias("s"),
        F.count("*").alias("cnt"),
    )
    lmk = (
        F.col("s")
        * (F.col("n") - 1)
        / (F.col("cnt").cast("double") * F.col("k") * F.col("k"))
    ).cast("decimal(26,8)")
    lk = (
        lm.join(F.broadcast(nmax), "t")
        .groupBy("t", "k")
        .agg(F.sum(lmk).cast("double").alias("ssum"))
        .select("t", "k", (F.col("ssum") / F.col("k")).alias("lk"))
    )
    piv = lk.groupBy("t").agg(
        *[
            F.max(F.when(F.col("k") == k, F.col("lk"))).alias(f"l{k}")
            for k in HIGUCHI_KS
        ]
    )
    slope = None
    for i, k in enumerate(HIGUCHI_KS):
        term = F.lit(_HW[i]) * F.log(F.col(f"l{k}"))
        slope = term if slope is None else slope + term
    return piv.select(
        F.col("t").alias("event_type"),
        F.round(F.col("l1"), 6).alias("curve_len_k1"),
        F.round(-slope, 6).alias("higuchi_fd"),
    )


# ------------------------------------------------- Sharpe / Sortino

_DAILY_RET_SQL = """
      SELECT event_type AS t, date_trunc('day', ts) AS day,
             SUM(CAST(value AS DECIMAL(20,4))) AS v
      FROM events GROUP BY 1, 2
"""


@query(
    "q_sharpe_sortino",
    oracle=f"""
    WITH daily AS ({_DAILY_RET_SQL}
    ), ret AS (
      SELECT t,
             CAST(CAST(CAST(v AS VARCHAR) AS DOUBLE)
                  / CAST(CAST(lag(v) OVER (PARTITION BY t ORDER BY day)
                              AS VARCHAR) AS DOUBLE) - 1.0
                  AS DECIMAL(20,10)) AS r
      FROM daily
      QUALIFY lag(v) OVER (PARTITION BY t ORDER BY day) IS NOT NULL
    ), s AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(r) AS VARCHAR) AS DOUBLE) AS sr,
             CAST(CAST(SUM(CAST(CAST(CAST(r AS VARCHAR) AS DOUBLE)
                                * CAST(CAST(r AS VARCHAR) AS DOUBLE)
                                AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS srr,
             CAST(CAST(SUM(CASE WHEN r < 0 THEN
                   CAST(CAST(CAST(r AS VARCHAR) AS DOUBLE)
                        * CAST(CAST(r AS VARCHAR) AS DOUBLE)
                        AS DECIMAL(24,12)) ELSE CAST(0 AS DECIMAL(24,12)) END)
                  AS VARCHAR) AS DOUBLE) AS sdd
      FROM ret GROUP BY t
    )
    SELECT t AS event_type, n AS n_returns,
           round(sr / n, 6) AS mean_return,
           round((sr / n) / sqrt(srr / n - (sr / n) * (sr / n)), 6) AS sharpe,
           CASE WHEN sdd > 0
                THEN round((sr / n) / sqrt(sdd / n), 6) END AS sortino
    FROM s
    """,
)
def q_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharpe and Sortino ratios of the daily percentage returns of
    each event type's level series (zero risk-free rate, no
    annualization — the per-period textbook forms): Sharpe =
    mean(r)/σ(r) with population σ; Sortino divides by the downside
    deviation sqrt(Σ_{{r<0}} r²/n) instead (NULL when no negative
    return exists).

    Returns are flat floats off VARCHAR-bridged DECIMAL daily
    levels, quantized to DECIMAL(20,10) at birth; r² terms quantize
    at scale 12 — so all three per-type sums are order-independent
    exact and each emitted ratio is one flat double expression."""
    daily = load_table(spark, sf_dir, "events").groupBy(
        F.col("event_type").alias("t"), F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(20,4)")).alias("v"))
    w = Window.partitionBy("t").orderBy("day")
    ret = (
        daily.select(
            "t",
            F.col("v").cast("double").alias("vd"),
            F.lag(F.col("v").cast("double")).over(w).alias("vp"),
        )
        .filter(F.col("vp").isNotNull())
        .select(
            "t", (F.col("vd") / F.col("vp") - 1.0).cast("decimal(20,10)").alias("r")
        )
    )
    rd = F.col("r").cast("double")
    s = ret.groupBy("t").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("r").cast("double").alias("sr"),
        F.sum((rd * rd).cast("decimal(24,12)")).cast("double").alias("srr"),
        F.sum(
            F.when(F.col("r") < 0, (rd * rd).cast("decimal(24,12)")).otherwise(
                F.lit(0).cast("decimal(24,12)")
            )
        )
        .cast("double")
        .alias("sdd"),
    )
    n = F.col("n")
    mean = F.col("sr") / n
    sharpe = mean / F.sqrt(F.col("srr") / n - mean * mean)
    sortino = F.when(F.col("sdd") > 0, F.round(mean / F.sqrt(F.col("sdd") / n), 6))
    return s.select(
        F.col("t").alias("event_type"),
        n.alias("n_returns"),
        F.round(mean, 6).alias("mean_return"),
        F.round(sharpe, 6).alias("sharpe"),
        sortino.alias("sortino"),
    )
