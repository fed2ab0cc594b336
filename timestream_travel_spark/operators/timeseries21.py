"""Round-10 time-series wave (STAGED — registry.STAGED_MODULES):
Yule–Walker AR(2) with PACF via the Durbin–Levinson closed form
(Yule 1927; Walker 1931), Allan variance over dyadic averaging times
(Allan, Proc. IEEE 1966 — the clock-stability statistic, here the
hourly-level stability profile), Katz and Petrosian fractal
dimensions (Katz, Comput. Biol. Med. 1988; Petrosian, IEEE CBMS
1995 — the cheap closed forms beside q_higuchi_fd), and three
volume-flow indicators on the daily OHLC: Ease of Movement (Arms),
Chaikin Money Flow and the Accumulation/Distribution line (Chaikin).

Exactness: AR coefficients come from exact-DECIMAL autocovariance
sufficient statistics (scaled-out mean: n·v − S), so r₁, r₂ and the
Durbin–Levinson φ's are flat doubles off bridged exact sums. Allan
variance scales out the block mean (block SUMS difference, /b²
folded into the final division). The fractal dimensions count sign
changes / sum |diffs| in DECIMAL with one log expression per row.
The money-flow volume is an exact rational of scale-4 decimals,
HALF-UP scaled to the integer k = mfv·10⁶ in pure integer arithmetic
(never a double→DECIMAL cast — the engine-divergent trap), so
window/running sums stay exact integers.

Scale: hourly/daily reduces then span-bounded windows; nothing
corpus-sized past the first aggregation.
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

ALLAN_BLOCKS = (16, 32, 64)  # averaging times τ (hours), the R/S grid
CMF_W = 20  # Chaikin Money Flow window (days)


@query(
    "q_yule_walker_ar2",
    oracle=f"""
    WITH hourly AS ({_HOURLY_IDX_SQL}
    ), st AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s FROM hourly GROUP BY t
    ), e AS (
      SELECT h.t, h.i,
             CAST(CAST(st.n AS DECIMAL(6,0)) * CAST(h.v AS DECIMAL(14,4))
                  - CAST(st.s AS DECIMAL(16,4)) AS DECIMAL(19,4)) AS e,
             st.n
      FROM hourly h JOIN st ON st.t = h.t
    ), lags AS (
      SELECT t, n, e,
             lag(e, 1) OVER (PARTITION BY t ORDER BY i) AS e1,
             lag(e, 2) OVER (PARTITION BY t ORDER BY i) AS e2
      FROM e
    ), sums AS (
      SELECT t, MAX(n) AS n,
             CAST(CAST(SUM(CAST(e AS DECIMAL(20,4)) * e) AS VARCHAR) AS DOUBLE)
               AS c0,
             CAST(CAST(SUM(CASE WHEN e1 IS NOT NULL
                                THEN CAST(e AS DECIMAL(20,4)) * e1 END)
                       AS VARCHAR) AS DOUBLE) AS c1,
             CAST(CAST(SUM(CASE WHEN e2 IS NOT NULL
                                THEN CAST(e AS DECIMAL(20,4)) * e2 END)
                       AS VARCHAR) AS DOUBLE) AS c2
      FROM lags GROUP BY t
    )
    SELECT t AS event_type, n AS n_hours,
           round(c1 / c0, 6) AS r1,
           round(c2 / c0, 6) AS r2,
           round((c1 / c0) * (1.0 - c2 / c0)
                 / (1.0 - (c1 / c0) * (c1 / c0)), 6) AS phi1,
           round((c2 / c0 - (c1 / c0) * (c1 / c0))
                 / (1.0 - (c1 / c0) * (c1 / c0)), 6) AS phi2_pacf2
    FROM sums
    """,
)
def q_yule_walker_ar2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule–Walker AR(2) fit of each type's hourly level series via
    the Durbin–Levinson closed form: with autocorrelations r₁, r₂,
    φ₂ = (r₂ − r₁²)/(1 − r₁²) — which IS PACF(2) — and φ₁ =
    r₁(1 − r₂)/(1 − r₁²). The centered series is exact by scaling
    (e = n·v − S in DECIMAL; every r is a ratio of exact bridged
    lag-product sums, invariant to the n× scale). Biased-window
    autocovariances (lag products over the observed overlap), the
    standard Yule–Walker plug-in."""
    hourly = _hourly_idx(spark, sf_dir)
    st = hourly.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("v").alias("s")
    )
    e = hourly.join(st, "t").select(
        "t",
        "i",
        (
            F.col("n").cast("decimal(6,0)") * F.col("v").cast("decimal(14,4)")
            - F.col("s").cast("decimal(16,4)")
        )
        .cast("decimal(19,4)")
        .alias("e"),
        "n",
    )
    w = Window.partitionBy("t").orderBy("i")
    lags = e.select(
        "t", "n", "e",
        F.lag("e", 1).over(w).alias("e1"),
        F.lag("e", 2).over(w).alias("e2"),
    )
    big = lambda col: F.col(col).cast("decimal(20,4)")  # noqa: E731
    sums = lags.groupBy("t").agg(
        F.max("n").alias("n"),
        F.sum(big("e") * F.col("e")).cast("double").alias("c0"),
        F.sum(
            F.when(F.col("e1").isNotNull(), big("e") * F.col("e1"))
        ).cast("double").alias("c1"),
        F.sum(
            F.when(F.col("e2").isNotNull(), big("e") * F.col("e2"))
        ).cast("double").alias("c2"),
    )
    r1 = F.col("c1") / F.col("c0")
    r2 = F.col("c2") / F.col("c0")
    return sums.select(
        F.col("t").alias("event_type"),
        F.col("n").alias("n_hours"),
        F.round(r1, 6).alias("r1"),
        F.round(r2, 6).alias("r2"),
        F.round(r1 * (1.0 - r2) / (1.0 - r1 * r1), 6).alias("phi1"),
        F.round((r2 - r1 * r1) / (1.0 - r1 * r1), 6).alias("phi2_pacf2"),
    )


@query(
    "q_allan_variance",
    oracle=f"""
    WITH hourly AS ({_HOURLY_IDX_SQL}
    ), boxed AS (
      SELECT h.t, bs.b, CAST((h.i - 1) // bs.b AS BIGINT) AS box,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(h.v) AS DECIMAL(16,4)) AS s
      FROM hourly h
      JOIN (SELECT unnest([{", ".join(str(b) for b in ALLAN_BLOCKS)}]) AS b) bs
        ON true
      GROUP BY h.t, bs.b, (h.i - 1) // bs.b
    ), full_boxes AS (
      SELECT t, b, box, s FROM boxed WHERE cnt = b
    ), diffs AS (
      SELECT t, b,
             CAST(s - lag(s) OVER (PARTITION BY t, b ORDER BY box)
                  AS DECIMAL(17,4)) AS ds
      FROM full_boxes
    )
    SELECT t AS event_type, b AS tau_hours,
           CAST(COUNT(ds) AS BIGINT) AS n_pairs,
           round(CAST(CAST(SUM(CAST(ds AS DECIMAL(19,4)) * ds) AS VARCHAR)
                      AS DOUBLE)
                 / (2.0 * COUNT(ds) * CAST(b AS DOUBLE) * b), 6) AS avar
    FROM diffs GROUP BY t, b
    """,
)
def q_allan_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allan variance of each type's hourly level at averaging times
    τ ∈ {ALLAN_BLOCKS} hours: AVAR(τ) = ⟨(ȳ_{{k+1}} − ȳ_k)²⟩/2 over
    consecutive non-overlapping τ-hour block means — white noise
    falls as 1/τ, drift rises, so the profile separates noise from
    wander (the clock-stability read of q_hurst_rs's machinery).
    Block MEANS scale out (block SUM differences, the /τ² folded
    into the final division); everything is exact DECIMAL until that
    one flat expression."""
    hourly = _hourly_idx(spark, sf_dir)
    bs = spark.createDataFrame([(b,) for b in ALLAN_BLOCKS], "b int")
    boxed = (
        hourly.join(F.broadcast(bs))
        .groupBy("t", "b", F.floor((F.col("i") - 1) / F.col("b")).alias("box"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").cast("decimal(16,4)").alias("s"),
        )
        .filter(F.col("cnt") == F.col("b"))
    )
    w = Window.partitionBy("t", "b").orderBy("box")
    diffs = boxed.select(
        "t",
        "b",
        (F.col("s") - F.lag("s").over(w)).cast("decimal(17,4)").alias("ds"),
    )
    return diffs.groupBy(
        F.col("t").alias("event_type"), F.col("b").alias("tau_hours")
    ).agg(
        F.count("ds").cast("bigint").alias("n_pairs"),
        F.round(
            F.sum(F.col("ds").cast("decimal(19,4)") * F.col("ds")).cast("double")
            / (2.0 * F.count("ds") * F.col("tau_hours").cast("double")
               * F.col("tau_hours")),
            6,
        ).alias("avar"),
    )


@query(
    "q_katz_petrosian_fd",
    oracle=f"""
    WITH hourly AS ({_HOURLY_IDX_SQL}
    ), first_v AS (
      SELECT t, MIN({{'i': i, 'v': v}})['v'] AS v0 FROM hourly GROUP BY t
    ), lagd AS (
      SELECT h.t, h.v, f.v0,
             lag(h.v) OVER (PARTITION BY h.t ORDER BY h.i) AS pv,
             lag(h.v, 2) OVER (PARTITION BY h.t ORDER BY h.i) AS ppv
      FROM hourly h JOIN first_v f ON f.t = h.t
    ), agg AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(abs(v - pv)) AS l,
             MAX(abs(v - v0)) AS d,
             CAST(SUM(CASE WHEN pv IS NOT NULL AND ppv IS NOT NULL
                            AND (v - pv) * (pv - ppv) < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS ndelta
      FROM lagd GROUP BY t
    )
    SELECT t AS event_type, n AS n_hours, ndelta AS n_sign_changes,
           round(log10(CAST(n - 1 AS DOUBLE))
                 / (log10(CAST(n - 1 AS DOUBLE))
                    + log10(CAST(CAST(d AS VARCHAR) AS DOUBLE)
                            / CAST(CAST(l AS VARCHAR) AS DOUBLE))), 6)
             AS katz_fd,
           round(log10(CAST(n AS DOUBLE))
                 / (log10(CAST(n AS DOUBLE))
                    + log10(CAST(n AS DOUBLE) / (n + 0.4 * ndelta))), 6)
             AS petrosian_fd
    FROM agg
    """,
)
def q_katz_petrosian_fd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz and Petrosian fractal dimensions of each type's hourly
    level series — the two closed-form FD estimators read beside
    q_higuchi_fd: Katz FD = log₁₀(n)/(log₁₀(n) + log₁₀(d/L)) with
    L = Σ|Δv| (path length) and d = max|v_i − v_1| (diameter);
    Petrosian FD = log₁₀n/(log₁₀n + log₁₀(n/(n + 0.4·N_Δ))) with
    N_Δ = derivative sign changes. L, d and N_Δ are exact
    DECIMAL/integer; each FD is one flat double expression."""
    hourly = _hourly_idx(spark, sf_dir)
    first_v = hourly.groupBy("t").agg(
        F.min(F.struct(F.col("i").alias("i"), F.col("v").alias("v")))["v"].alias("v0")
    )
    w = Window.partitionBy("t").orderBy("i")
    lagd = hourly.join(first_v, "t").select(
        "t",
        "v",
        "v0",
        F.lag("v").over(w).alias("pv"),
        F.lag("v", 2).over(w).alias("ppv"),
    )
    agg = lagd.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.abs(F.col("v") - F.col("pv"))).alias("l"),
        F.max(F.abs(F.col("v") - F.col("v0"))).alias("d"),
        F.sum(
            F.when(
                F.col("pv").isNotNull()
                & F.col("ppv").isNotNull()
                & ((F.col("v") - F.col("pv")) * (F.col("pv") - F.col("ppv")) < 0),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("ndelta"),
    )
    n, nd = F.col("n"), F.col("ndelta")
    ln1 = F.log10((n - 1).cast("double"))
    lnn = F.log10(n.cast("double"))
    return agg.select(
        F.col("t").alias("event_type"),
        n.alias("n_hours"),
        nd.alias("n_sign_changes"),
        F.round(
            ln1 / (ln1 + F.log10(F.col("d").cast("double") / F.col("l").cast("double"))),
            6,
        ).alias("katz_fd"),
        F.round(lnn / (lnn + F.log10(n.cast("double") / (n + 0.4 * nd))), 6).alias(
            "petrosian_fd"
        ),
    )


# Scaled-integer money-flow volume: mfv = vol·(2C−H−L)/(H−L) is an
# exact rational (all scale-4 decimals), and casting its double to
# DECIMAL is the engine-divergent trap the registry header bans
# (measured: one-ulp flips at sf0.01). Instead k = HALF-UP-rounded
# mfv·10⁶ in INTEGER arithmetic — (2·|N|·10⁶ + D) // (2·D), signed —
# so window/running sums are exact integer and the only float is the
# final de-scaling. Magnitude bound: |N| = vol·|2C−H−L|·10⁴ ≤ ~4e11
# at sf0.1, ×2e6 ≈ 8e17 < 2⁶³ (document before running SFs ≥ 1).
_MFV_SQL = """
      SELECT t, day,
             CAST((2 * cl - hi - lo) * 10000 AS BIGINT) AS a_int,
             CAST((hi - lo) * 10000 AS BIGINT) AS r_int
"""


def _mf_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t, day, vol, k): per-day integer k = round_half_up(mfv·10⁶),
    mfv = vol·(2C−H−L)/(H−L), all in exact integer arithmetic."""
    ohlc = _daily_ohlc(spark, sf_dir)
    vol = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"), F.date_trunc("day", "ts").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("vol"))
    )
    base = ohlc.join(vol, ["t", "day"]).select(
        "t",
        "day",
        "vol",
        ((2 * F.col("cl") - F.col("hi") - F.col("lo")) * 10000)
        .cast("bigint")
        .alias("a_int"),
        ((F.col("hi") - F.col("lo")) * 10000).cast("bigint").alias("r_int"),
    )
    n = F.col("vol") * F.col("a_int")
    kdiv = F.expr("(2 * abs(vol * a_int) * 1000000 + r_int) DIV (2 * r_int)")
    k = F.when(F.col("r_int") == 0, F.lit(0).cast("bigint")).otherwise(
        F.when(n < 0, -kdiv).otherwise(kdiv)
    )
    return base.select("t", "day", "vol", k.alias("k"))


_MFV_K_SQL = """
      CASE WHEN r_int = 0 THEN 0
           WHEN vol * a_int < 0
             THEN -((2 * abs(vol * a_int) * 1000000 + r_int) // (2 * r_int))
           ELSE (2 * vol * a_int * 1000000 + r_int) // (2 * r_int)
      END
"""


@query(
    "q_chaikin_money_flow",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), vol AS (
      SELECT event_type AS t, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS vol
      FROM events GROUP BY 1, 2
    ), mf AS (
      SELECT m.t, m.day, v.vol,
             CAST({_MFV_K_SQL} AS BIGINT) AS k
      FROM ({_MFV_SQL} FROM ohlc) m JOIN vol v ON v.t = m.t AND v.day = m.day
    ), win AS (
      SELECT t, day,
             COUNT(*) OVER w AS nw,
             SUM(k) OVER w AS sk,
             SUM(vol) OVER w AS svol
      FROM mf
      WINDOW w AS (PARTITION BY t ORDER BY day
                   ROWS BETWEEN {CMF_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           (CASE WHEN sk < 0 THEN -((2 * abs(sk) + svol) // (2 * svol))
                 ELSE (2 * sk + svol) // (2 * svol) END) / 1000000.0 AS cmf
    FROM win WHERE nw = {CMF_W}
    """,
)
def q_chaikin_money_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chaikin Money Flow over {CMF_W} days: Σ(MFV)/Σ(vol) with
    MFV = vol·(2C−H−L)/(H−L) — accumulation (+) vs distribution (−)
    pressure weighted by participation. MFV is an exact rational of
    scale-4 decimals, HALF-UP scaled to the integer k = mfv·10⁶ in
    pure integer arithmetic (see _MFV_SQL — quantizing the double
    through DECIMAL is the engine-divergent trap), so both window
    sums are exact integers and the 6-decimal output rounds in
    integers too; flat-range days contribute 0 by the standard
    convention."""
    mf = _mf_k(spark, sf_dir)
    w = (
        Window.partitionBy("t")
        .orderBy("day")
        .rowsBetween(-(CMF_W - 1), Window.currentRow)
    )
    win = mf.select(
        "t",
        "day",
        F.count("*").over(w).alias("nw"),
        F.sum("k").over(w).alias("sk"),
        F.sum("vol").over(w).alias("svol"),
    )
    j = F.expr("(2 * abs(sk) + svol) DIV (2 * svol)")
    return win.filter(F.col("nw") == CMF_W).select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.when(F.col("sk") < 0, -j).otherwise(j) / 1000000.0).alias("cmf"),
    )


@query(
    "q_accumulation_distribution",
    oracle=f"""
    WITH ohlc AS ({_DAILY_OHLC_SQL}
    ), vol AS (
      SELECT event_type AS t, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS vol
      FROM events GROUP BY 1, 2
    ), mf AS (
      SELECT m.t, m.day, v.vol,
             CAST({_MFV_K_SQL} AS BIGINT) AS k
      FROM ({_MFV_SQL} FROM ohlc) m JOIN vol v ON v.t = m.t AND v.day = m.day
    )
    SELECT t AS event_type, strftime(day, '%Y-%m-%d') AS day,
           SUM(k) OVER (PARTITION BY t ORDER BY day
                        ROWS UNBOUNDED PRECEDING) / 1000000.0 AS ad_line
    FROM mf
    """,
)
def q_accumulation_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulation/Distribution line: the running sum of the daily
    money-flow volume MFV = vol·(2C−H−L)/(H−L) — divergence between
    the A/D line and the level series is Chaikin's trend-health read.
    Same scaled-integer k = mfv·10⁶ as q_chaikin_money_flow — the
    running sum is an exact integer, and the /10⁶ at output is
    already a 6-decimal value (no rounding step at all). The running
    sum is a |types|-partitioned window over ≤days rows
    (span-bounded, never corpus-sized)."""
    mf = _mf_k(spark, sf_dir)
    w = (
        Window.partitionBy("t")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return mf.select(
        F.col("t").alias("event_type"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.sum("k").over(w) / 1000000.0).alias("ad_line"),
    )
