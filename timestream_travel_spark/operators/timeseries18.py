"""Round-8 time-series wave F: detrended fluctuation analysis
(Peng et al., Phys Rev E 1994 — DFA-1, the long-range-correlation
exponent that complements q_hurst_rs) and Goh–Barabási inter-event
burstiness (Goh & Barabási, EPL 2008 — B = (σ−μ)/(σ+μ) of waiting
times, the point-process companion to q_fano_burstiness's count
statistic).

Exactness design:
- DFA's mean-centered profile is kept EXACT by scaling: with S = Σx
  and n the series length, Y_i = n·cumsum_i − i·S is an integral
  multiple of the true profile (n·y_i) in DECIMAL — no division, no
  float drift across 720 cumulative terms. Per-box OLS residual sums
  come from exact DECIMAL box sums (ΣY, ΣtY, ΣY²); each box's RSS is
  one flat float, DECIMAL-quantized before the order-independent
  mean over boxes; the 3-point log-log slope uses literal weights
  (the q_hurst_rs design pattern).
- Burstiness waiting times are exact MICROSECOND integers
  (epoch-µs differences); Σg and Σg² accumulate in DECIMAL and each
  per-type statistic is one flat double expression.

Scale shape: DFA reduces to the span-bounded hourly table first;
box sums are a (type, box-size, box) reduce over that bounded table.
Burstiness's corpus-sized work is the per-(user, type) lag() —
shuffled on the natural user_id key — followed by a map-side
combined per-type reduce.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.timeseries16 import (
    _HOURLY_IDX_SQL,
    _hourly_idx,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

DFA_BOXES = (16, 32, 64)  # box sizes (hours) — the q_hurst_rs grid
# slope weights for ln F(b) on ln b at b = 16,32,64: deviations
# (−1,0,1)·ln2, Σdev² = 2·ln2² → w = (−1,0,1)/(2·ln2); evaluated once
# here, emitted as literals into both engines (no cross-engine libm)
_DFA_W = [(-1.0) / (2.0 * math.log(2.0)), 0.0, (1.0) / (2.0 * math.log(2.0))]
_DFA_PIVOT = ", ".join(
    f"MAX(CASE WHEN b = {b} THEN fb END) AS f{b}" for b in DFA_BOXES
)
_DFA_SLOPE = " + ".join(
    f"CAST('{_DFA_W[i]!r}' AS DOUBLE) * ln(f{b})"
    for i, b in enumerate(DFA_BOXES)
    if _DFA_W[i] != 0.0
)


@query(
    "q_dfa_alpha",
    oracle=f"""
    WITH hourly AS ({_HOURLY_IDX_SQL}
    ), stat AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s FROM hourly GROUP BY t
    ), prof AS (
      SELECT h.t, h.i, st.n,
             CAST(CAST(st.n AS DECIMAL(4,0))
                    * CAST(SUM(h.v) OVER (PARTITION BY h.t ORDER BY h.i
                           ROWS UNBOUNDED PRECEDING) AS DECIMAL(14,4))
                  - CAST(h.i AS DECIMAL(4,0)) * CAST(st.s AS DECIMAL(14,4))
                  AS DECIMAL(18,4)) AS y
      FROM hourly h JOIN stat st ON st.t = h.t
    ), boxed AS (
      SELECT p.t, p.n, bs.b,
             CAST((p.i - 1) // bs.b AS BIGINT) AS box,
             CAST((p.i - 1) % bs.b + 1 AS BIGINT) AS tt, p.y
      FROM prof p
      JOIN (SELECT unnest([{", ".join(str(b) for b in DFA_BOXES)}]) AS b) bs
        ON true
    ), bsum AS (
      SELECT t, n, b, box, CAST(COUNT(*) AS BIGINT) AS cnt,
             SUM(y) AS sy,
             SUM(CAST(tt AS DECIMAL(8,0)) * y) AS sty,
             SUM(CAST(y AS DECIMAL(19,4)) * y) AS syy
      FROM boxed GROUP BY t, n, b, box
    ), rss AS (
      SELECT t, n, b,
             CAST(CAST(syy AS VARCHAR) AS DOUBLE)
               - (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(sy AS VARCHAR) AS DOUBLE)) / b
               - (CAST(CAST(sty AS VARCHAR) AS DOUBLE)
                  - (b + 1.0) / 2.0 * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
                 * (CAST(CAST(sty AS VARCHAR) AS DOUBLE)
                    - (b + 1.0) / 2.0 * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
                 / (CAST(b AS DOUBLE) * (b * b - 1) / 12.0) AS r
      FROM bsum WHERE cnt = b
    ), fb AS (
      SELECT t, b,
             sqrt(greatest(CAST(CAST(SUM(CAST(r / (CAST(b AS DOUBLE) * n * n)
                                             AS DECIMAL(30,10)))
                        AS VARCHAR) AS DOUBLE) / COUNT(*), 0.0)) AS fb
      FROM rss GROUP BY t, b
    ), piv AS (
      SELECT t, {_DFA_PIVOT} FROM fb GROUP BY t
    )
    SELECT t AS event_type,
           round(f16, 6) AS f_16,
           round(f64, 6) AS f_64,
           round({_DFA_SLOPE}, 6) AS dfa_alpha
    FROM piv
    """,
)
def q_dfa_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFA-1 scaling exponent of each event type's hourly level
    series (Peng et al. 1994): integrate the mean-centered series,
    split into boxes of b ∈ {DFA_BOXES} hours, linearly detrend each
    box, and fit ln F(b) ~ α·ln b where F(b) is the RMS residual.
    α ≈ 0.5 = uncorrelated, > 0.5 = persistent, ~1 = 1/f noise —
    read beside q_hurst_rs (R/S estimates the same H family).

    The profile is exact: Y_i = n·cumsum_i − i·S (an integer-scaled
    mean-centered cumulative sum, no division). Per-box RSS =
    Syy − (ΣY)²/b − (ΣtY − (b+1)/2·ΣY)² / (b(b²−1)/12) is one flat
    float over bridged DECIMAL box sums (the centered-OLS identity
    with the exact Σt, Σt² constants); the n² profile scaling
    divides back inside the per-box term, which quantizes to DECIMAL
    before the order-independent box mean. Incomplete tail boxes are
    dropped (cnt = b), the standard DFA convention."""
    hourly = _hourly_idx(spark, sf_dir)
    stat = hourly.groupBy("t").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    wcum = (
        Window.partitionBy("t")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prof = (
        hourly.join(F.broadcast(stat), "t")
        .select(
            "t",
            "i",
            "n",
            (
                F.col("n").cast("decimal(4,0)")
                * F.sum("v").over(wcum).cast("decimal(14,4)")
                - F.col("i").cast("decimal(4,0)") * F.col("s").cast("decimal(14,4)")
            )
            .cast("decimal(18,4)")
            .alias("y"),
        )
    )
    bs = F.explode(F.array(*[F.lit(b) for b in DFA_BOXES])).alias("b")
    boxed = prof.select("t", "n", "i", "y", bs).select(
        "t",
        "n",
        "b",
        ((F.col("i") - 1) / F.col("b")).cast("bigint").alias("box"),
        ((F.col("i") - 1) % F.col("b") + 1).cast("bigint").alias("tt"),
        "y",
    )
    bsum = boxed.groupBy("t", "n", "b", "box").agg(
        F.count("*").alias("cnt"),
        F.sum("y").alias("sy"),
        F.sum(F.col("tt").cast("decimal(8,0)") * F.col("y")).alias("sty"),
        F.sum(F.col("y").cast("decimal(19,4)") * F.col("y")).alias("syy"),
    )
    b = F.col("b")
    syd = F.col("sy").cast("double")
    styd = F.col("sty").cast("double")
    syyd = F.col("syy").cast("double")
    ctr = styd - (b + 1.0) / 2.0 * syd
    r = (
        syyd - syd * syd / b - ctr * ctr / (b.cast("double") * (b * b - 1) / 12.0)
    )
    rss = bsum.filter(F.col("cnt") == b).select(
        "t", "n", "b",
        (r / (b.cast("double") * F.col("n") * F.col("n")))
        .cast("decimal(30,10)")
        .alias("rn"),
    )
    fb = rss.groupBy("t", "b").agg(
        F.sqrt(
            F.greatest(
                F.sum("rn").cast("double") / F.count("*"), F.lit(0.0)
            )
        ).alias("fb")
    )
    piv = fb.groupBy("t").agg(
        *[
            F.max(F.when(F.col("b") == bb, F.col("fb"))).alias(f"f{bb}")
            for bb in DFA_BOXES
        ]
    )
    slope = None
    for i, bb in enumerate(DFA_BOXES):
        if _DFA_W[i] == 0.0:
            continue
        term = F.lit(_DFA_W[i]) * F.log(F.col(f"f{bb}"))
        slope = term if slope is None else slope + term
    return piv.select(
        F.col("t").alias("event_type"),
        F.round(F.col("f16"), 6).alias("f_16"),
        F.round(F.col("f64"), 6).alias("f_64"),
        F.round(slope, 6).alias("dfa_alpha"),
    )


@query(
    "q_interevent_burstiness",
    oracle="""
    WITH gaps AS (
      SELECT event_type AS t,
             epoch_us(ts)
               - lag(epoch_us(ts))
                 OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS g
      FROM events
    ), s AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(g) AS BIGINT) AS sg,
             SUM(CAST(g AS DECIMAL(25,0)) * g) AS sgg
      FROM gaps WHERE g IS NOT NULL GROUP BY t
    )
    SELECT t AS event_type, n AS n_gaps,
           round(CAST(sg AS DOUBLE) / n / 1e6, 3) AS mean_gap_s,
           round((sqrt(greatest(CAST(CAST(sgg AS VARCHAR) AS DOUBLE) / n
                       - (CAST(sg AS DOUBLE) / n) * (CAST(sg AS DOUBLE) / n),
                       0.0))
                  - CAST(sg AS DOUBLE) / n)
                 / (sqrt(greatest(CAST(CAST(sgg AS VARCHAR) AS DOUBLE) / n
                        - (CAST(sg AS DOUBLE) / n) * (CAST(sg AS DOUBLE) / n),
                        0.0))
                    + CAST(sg AS DOUBLE) / n), 6) AS burstiness
    FROM s
    """,
)
def q_interevent_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh–Barabási burstiness of each event type's waiting-time
    process: B = (σ−μ)/(σ+μ) over the inter-event gaps of every
    (user, type) stream. B → −1 for periodic, ≈ 0 for Poisson,
    → +1 for heavy-tailed bursts.

    Gaps are exact epoch-MICROSECOND integer differences; Σg is
    BIGINT and Σg² accumulates in DECIMAL (g² up to ~7e24 for a
    30-day gap), so σ and μ come from exact sufficient statistics
    and B is one flat double expression per type."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gaps = ev.select(
        F.col("event_type").alias("t"), (us - F.lag(us).over(w)).alias("g")
    ).filter(F.col("g").isNotNull())
    s = gaps.groupBy("t").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("sg"),
        F.sum(F.col("g").cast("decimal(25,0)") * F.col("g")).alias("sgg"),
    )
    n = F.col("n")
    mu = F.col("sg").cast("double") / n
    sig = F.sqrt(
        F.greatest(F.col("sgg").cast("double") / n - mu * mu, F.lit(0.0))
    )
    return s.select(
        F.col("t").alias("event_type"),
        n.alias("n_gaps"),
        F.round(mu / 1e6, 3).alias("mean_gap_s"),
        F.round((sig - mu) / (sig + mu), 6).alias("burstiness"),
    )
