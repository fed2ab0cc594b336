"""Round-8 analytics: second statistical-test wave — Welch's t
(unequal-variance two-sample), Jarque–Bera normality, Wald–Wolfowitz
runs test, and Grubbs' max-deviation outlier statistic. All public
textbook statistics (Welch Biometrika'47; Jarque & Bera Econ.
Lett.'80; Wald & Wolfowitz AMS'40; Grubbs Technometrics'69).

Exactness design (the analytics5/6 discipline): every corpus-sized
aggregation is an exact-DECIMAL power sum or an integer count; each
output row's statistic is ONE flat double expression over those
bridged sums — no float summation anywhere. Jarque–Bera's x⁴ terms
quantize at scale 2 (x ≤ ~600 → x⁴·10² ≤ ~1.3e13, well inside the
2^53 cross-engine agreement bound — scale chosen for determinism,
not precision: the quantization error is ~5e-14 relative on the
moment, invisible at round-6 outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_welch_t",
    oracle="""
    WITH g AS (
      SELECT c_mktsegment AS seg,
             CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))
                           * CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS q
      FROM customer GROUP BY c_mktsegment
    )
    SELECT a.seg AS seg_a, b.seg AS seg_b, a.ng AS n_a, b.ng AS n_b,
           round(((a.s / a.ng) - (b.s / b.ng))
                 / sqrt(((a.q - (a.s * a.s) / a.ng) / (a.ng - 1)) / a.ng
                        + ((b.q - (b.s * b.s) / b.ng) / (b.ng - 1)) / b.ng),
                 6) AS t_stat,
           round(((((a.q - (a.s * a.s) / a.ng) / (a.ng - 1)) / a.ng
                   + ((b.q - (b.s * b.s) / b.ng) / (b.ng - 1)) / b.ng)
                  * (((a.q - (a.s * a.s) / a.ng) / (a.ng - 1)) / a.ng
                     + ((b.q - (b.s * b.s) / b.ng) / (b.ng - 1)) / b.ng))
                 / ((((a.q - (a.s * a.s) / a.ng) / (a.ng - 1)) / a.ng)
                    * (((a.q - (a.s * a.s) / a.ng) / (a.ng - 1)) / a.ng)
                    / (a.ng - 1)
                    + (((b.q - (b.s * b.s) / b.ng) / (b.ng - 1)) / b.ng)
                      * (((b.q - (b.s * b.s) / b.ng) / (b.ng - 1)) / b.ng)
                      / (b.ng - 1)),
                 4) AS welch_df
    FROM g a JOIN g b ON a.seg < b.seg
    """,
)
def q_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic and Welch–Satterthwaite
    degrees of freedom for every market-segment pair on account
    balance — the robust companion to q_cohens_d's pooled-SD effect
    size (pooling assumes equal variances; Welch does not). Exact
    DECIMAL S/Q per segment; t and df are flat double expressions
    built from se²_g = s²_g/n_g terms written IDENTICALLY (same
    parenthesization) in both engines."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    g = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count("*").alias("ng"),
        F.sum(bal).cast("double").alias("s"),
        F.sum(bal * bal).cast("double").alias("q"),
    )
    a = g.select(
        F.col("seg").alias("seg_a"),
        F.col("ng").alias("n_a"),
        F.col("s").alias("sa"),
        F.col("q").alias("qa"),
    )
    b = g.select(
        F.col("seg").alias("seg_b"),
        F.col("ng").alias("n_b"),
        F.col("s").alias("sb"),
        F.col("q").alias("qb"),
    )
    j = a.join(b, F.col("seg_a") < F.col("seg_b"))
    # se²_g = sample-variance/n, parenthesized exactly as the oracle
    sea = ((F.col("qa") - (F.col("sa") * F.col("sa")) / F.col("n_a")) / (F.col("n_a") - 1)) / F.col("n_a")
    seb = ((F.col("qb") - (F.col("sb") * F.col("sb")) / F.col("n_b")) / (F.col("n_b") - 1)) / F.col("n_b")
    t = ((F.col("sa") / F.col("n_a")) - (F.col("sb") / F.col("n_b"))) / F.sqrt(sea + seb)
    df = ((sea + seb) * (sea + seb)) / (
        (sea * sea) / (F.col("n_a") - 1) + (seb * seb) / (F.col("n_b") - 1)
    )
    return j.select(
        "seg_a",
        "seg_b",
        "n_a",
        "n_b",
        F.round(t, 6).alias("t_stat"),
        F.round(df, 4).alias("welch_df"),
    )


@query(
    "q_jarque_bera",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(20,6))) AS VARCHAR)
                  AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(value * value AS DECIMAL(30,10))) AS VARCHAR)
                  AS DOUBLE) AS s2,
             CAST(CAST(SUM(CAST(value * value * value AS DECIMAL(38,8)))
                       AS VARCHAR) AS DOUBLE) AS s3,
             CAST(CAST(SUM(CAST(value * value * value * value
                               AS DECIMAL(38,2))) AS VARCHAR)
                  AS DOUBLE) AS s4
      FROM events GROUP BY event_type
    ), c AS (
      SELECT event_type, n, s1 / n AS mu,
             (s2 - s1 * s1 / n) / n AS m2,
             (s3 - 3 * (s1 / n) * s2) / n
               + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             (s4 - 4 * (s1 / n) * s3 + 6 * (s1 / n) * (s1 / n) * s2) / n
               - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM m
    )
    SELECT event_type, n,
           round(m3 / pow(m2, 1.5), 6) AS skewness,
           round(m4 / (m2 * m2), 6) AS kurtosis,
           round((CAST(n AS DOUBLE) / 6)
                 * ((m3 / pow(m2, 1.5)) * (m3 / pow(m2, 1.5))
                    + ((m4 / (m2 * m2)) - 3) * ((m4 / (m2 * m2)) - 3) / 4),
                 6) AS jb_stat
    FROM c
    """,
)
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality statistic per event type:
    JB = n/6·(g₁² + (g₂−3)²/4) from population skewness g₁ = m₃/m₂^1.5
    and kurtosis g₂ = m₄/m₂² — both derived from raw DECIMAL power
    sums Σx..Σx⁴ via the central-moment identities (the
    q_skewness_moments trick extended one moment up). The fixture's
    half-normal-ish values give g₂ ≪ 3 → large JB; a normality gate
    in a data-quality pipeline would alarm on exactly this."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    m = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(v.cast("decimal(20,6)")).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(30,10)")).cast("double").alias("s2"),
        F.sum((v * v * v).cast("decimal(38,8)")).cast("double").alias("s3"),
        F.sum((v * v * v * v).cast("decimal(38,2)")).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(x) for x in ("n", "s1", "s2", "s3", "s4"))
    mu = s1 / n
    m2 = (s2 - s1 * s1 / n) / n
    m3 = (s3 - 3 * mu * s2) / n + 2 * mu * mu * mu
    m4 = (s4 - 4 * mu * s3 + 6 * mu * mu * s2) / n - 3 * mu * mu * mu * mu
    skew = m3 / F.pow(m2, 1.5)
    kurt = m4 / (m2 * m2)
    jb = (n.cast("double") / 6) * (skew * skew + (kurt - 3) * (kurt - 3) / 4)
    return m.select(
        "event_type",
        "n",
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis"),
        F.round(jb, 6).alias("jb_stat"),
    )


@query(
    "q_runs_test",
    oracle="""
    WITH daily AS (
      SELECT event_type AS t, date_trunc('day', ts) AS day,
             SUM(CAST(value AS DECIMAL(20,4))) AS v
      FROM events GROUP BY 1, 2
    ), mv AS (
      SELECT t, day, v,
             lag(v) OVER (PARTITION BY t ORDER BY day) AS pv
      FROM daily
    ), sgn AS (
      SELECT t, day, CASE WHEN v > pv THEN 1 ELSE -1 END AS s
      FROM mv WHERE pv IS NOT NULL AND v <> pv
    ), runs AS (
      SELECT t, s,
             CASE WHEN lag(s) OVER (PARTITION BY t ORDER BY day) IS DISTINCT FROM s
                  THEN 1 ELSE 0 END AS brk
      FROM sgn
    ), agg AS (
      SELECT t AS event_type,
             CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
             CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
             CAST(SUM(brk) AS BIGINT) AS n_runs
      FROM runs GROUP BY t
    )
    SELECT event_type, n_up, n_down, n_runs,
           round((n_runs - (2.0 * n_up * n_down / (n_up + n_down) + 1))
                 / sqrt(2.0 * n_up * n_down
                        * (2.0 * n_up * n_down - n_up - n_down)
                        / ((CAST(n_up + n_down AS DOUBLE))
                           * (n_up + n_down) * (n_up + n_down - 1))),
                 6) AS z_score
    FROM agg WHERE n_up > 0 AND n_down > 0 AND n_up + n_down > 1
    """,
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of each type's daily
    up/down move sequence: R = number of maximal same-sign blocks,
    z = (R − μ_R)/σ_R with the exact two-category moments. Counting
    is pure integer on the calendar-bounded daily table (zero-change
    days are dropped — no third category); the z is one flat double
    expression. A trending series gives few long runs (z ≪ 0), an
    oscillating one many short runs (z ≫ 0)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("t"), F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(20,4)")).alias("v"))
    w = Window.partitionBy("t").orderBy("day")
    mv = daily.withColumn("pv", F.lag("v").over(w))
    sgn = mv.filter(F.col("pv").isNotNull() & (F.col("v") != F.col("pv"))).select(
        "t", "day", F.when(F.col("v") > F.col("pv"), 1).otherwise(-1).alias("s")
    )
    brk = (
        ~F.lag("s").over(w).eqNullSafe(F.col("s"))
    ).cast("int")
    runs = sgn.select("t", "s", brk.alias("brk"))
    agg = runs.groupBy(F.col("t").alias("event_type")).agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("bigint").alias("n_up"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).cast("bigint").alias("n_down"),
        F.sum("brk").cast("bigint").alias("n_runs"),
    )
    nu, nd, r = F.col("n_up"), F.col("n_down"), F.col("n_runs")
    mu = 2.0 * nu * nd / (nu + nd) + 1
    var = (
        2.0
        * nu
        * nd
        * (2.0 * nu * nd - nu - nd)
        / ((nu + nd).cast("double") * (nu + nd) * (nu + nd - 1))
    )
    return agg.filter((nu > 0) & (nd > 0) & (nu + nd > 1)).select(
        "event_type",
        "n_up",
        "n_down",
        "n_runs",
        F.round((r - mu) / F.sqrt(var), 6).alias("z_score"),
    )


@query(
    "q_grubbs_outlier",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(20,6))) AS VARCHAR)
                  AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(value * value AS DECIMAL(30,10))) AS VARCHAR)
                  AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, m.n, m.s1 / m.n AS mu,
             sqrt((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1)) AS sd,
             MAX(abs(e.value - m.s1 / m.n)) AS max_dev
      FROM events e JOIN m ON m.event_type = e.event_type
      GROUP BY e.event_type, m.n, m.s1, m.s2
    )
    SELECT event_type, n, round(mu, 6) AS mean, round(sd, 6) AS sd,
           round(max_dev / sd, 6) AS g_stat
    FROM dev
    """,
)
def q_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' outlier statistic per event type: G = max|x − μ|/s
    (sample SD). Two passes — one DECIMAL moment aggregation, then a
    broadcast of the 5-row moment table back over the scan for the
    max deviation. Each per-row deviation is one flat double from
    identical inputs, and MAX over doubles is order-independent, so
    the statistic is hash-deterministic with no quantization. The
    alarm consumer compares G against the critical value for n."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    m = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(v.cast("decimal(20,6)")).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(30,10)")).cast("double").alias("s2"),
    )
    j = ev.join(F.broadcast(m), ev.event_type == m.et)
    mu = F.col("s1") / F.col("n")
    sd = F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1))
    dev = j.groupBy("event_type", "n", "s1", "s2").agg(
        F.max(F.abs(v - mu)).alias("max_dev")
    )
    return dev.select(
        "event_type",
        "n",
        F.round(mu, 6).alias("mean"),
        F.round(sd, 6).alias("sd"),
        F.round(F.col("max_dev") / sd, 6).alias("g_stat"),
    )
