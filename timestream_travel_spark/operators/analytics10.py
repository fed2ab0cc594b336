"""Round-9 analytics (STAGED in round 8 — see registry.STAGED_MODULES):
effect sizes and goodness-of-fit companions to the r7/r8 test waves —
Cliff's delta dominance statistic (Cliff, Psychological Bulletin
1993), eta-squared / omega-squared ANOVA effect sizes (Hays,
*Statistics*, 1963), and the chi-squared goodness-of-fit test against
a discrete uniform (Pearson 1900).

Exactness design (the analytics5/6 discipline): Cliff's dominance
census and the uniform-GOF statistic stay in INTEGER arithmetic to
the end (χ²_uniform collapses algebraically to (k·Σn² − N²)/N — no
per-cell float terms at all); eta²/omega² reuse the ANOVA decimal
sufficient statistics with per-group terms quantized inside the 2^53
agreement bound. One flat double expression per output row, written
identically in both engines.

Scale shape: each query's corpus-sized work is a single map-side-
combined count reduce — (type, value) counts, (nation) balance sums,
or (quantity) counts; everything downstream runs on domain-bounded
tables (the distinct-value grid, 25 nations, 50 quantities).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.analytics5 import (
    _CNT_SQL,
    _PAIRS_SQL,
    _counts,
    _pairs,
    _pair_grid,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_cliffs_delta",
    oracle=f"""
    WITH cnt AS ({_CNT_SQL}
    ), n AS (
      SELECT t, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY t
    ), pairs AS ({_PAIRS_SQL}
    ), merged AS (
      SELECT p.ta, p.tb, p.n_a, p.n_b, c.v,
             SUM(CASE WHEN c.t = p.ta THEN c.c ELSE 0 END) AS ca,
             SUM(CASE WHEN c.t = p.tb THEN c.c ELSE 0 END) AS cb
      FROM pairs p JOIN cnt c ON c.t = p.ta OR c.t = p.tb
      GROUP BY p.ta, p.tb, p.n_a, p.n_b, c.v
    ), cum AS (
      SELECT ta, tb, n_a, n_b, ca, cb,
             COALESCE(SUM(cb) OVER (PARTITION BY ta, tb ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS b_below
      FROM merged
    )
    SELECT ta AS type_a, tb AS type_b,
           CAST(SUM(ca * b_below) AS BIGINT) AS n_gt,
           CAST(SUM(ca * (n_b - b_below - cb)) AS BIGINT) AS n_lt,
           CAST(SUM(ca * cb) AS BIGINT) AS n_tie,
           round(CAST(SUM(ca * b_below) - SUM(ca * (n_b - b_below - cb))
                      AS DOUBLE) / (n_a * n_b), 6) AS cliffs_delta
    FROM cum GROUP BY ta, tb, n_a, n_b
    """,
)
def q_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta for every event-type pair: the dominance census
    δ = (#{a>b} − #{a<b}) / (n_a·n_b), the standard ordinal effect
    size reported beside Mann–Whitney (q_mann_whitney_u shares this
    module's count machinery). The three dominance counts are exact
    integer sums over the merged distinct-value table (#{a>b} =
    Σ_v ca·#{b<v} via one cumulative window); one division at the
    end. Under tie-half-credit δ also equals the rank-biserial
    correlation 2U/(n_a·n_b) − 1."""
    cnt = _counts(spark, sf_dir)
    pairs = _pairs(cnt)
    merged = _pair_grid(spark, sf_dir)
    w = (
        Window.partitionBy("ta", "tb")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = merged.select(
        "ta",
        "tb",
        "n_a",
        "n_b",
        "ca",
        "cb",
        F.coalesce(F.sum("cb").over(w), F.lit(0)).alias("b_below"),
    )
    gt = F.sum(F.col("ca") * F.col("b_below"))
    lt = F.sum(F.col("ca") * (F.col("n_b") - F.col("b_below") - F.col("cb")))
    return cum.groupBy(
        F.col("ta").alias("type_a"), F.col("tb").alias("type_b"), "n_a", "n_b"
    ).agg(
        gt.cast("bigint").alias("n_gt"),
        lt.cast("bigint").alias("n_lt"),
        F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("n_tie"),
        F.round(
            (gt - lt).cast("double") / (F.col("n_a") * F.col("n_b")), 6
        ).alias("cliffs_delta"),
    ).drop("n_a", "n_b")


@query(
    "q_eta_squared",
    oracle="""
    WITH g AS (
      SELECT n.n_name AS grp,
             CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))
                           * CAST(c.c_acctbal AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS q
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name
    ), tot AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(CAST(SUM(CAST(s AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS st
      FROM g
    ), terms AS (
      SELECT CAST((g.ng * ((g.s / g.ng) - (t.st / t.n))
                   * ((g.s / g.ng) - (t.st / t.n))) AS DECIMAL(24,6)) AS ssb_term,
             CAST((g.q - (g.s * g.s) / g.ng) AS DECIMAL(24,4)) AS ssw_term
      FROM g CROSS JOIN tot t
    ), ss AS (
      SELECT t.k, t.n,
             CAST(CAST(SUM(ssb_term) AS VARCHAR) AS DOUBLE) AS ssb,
             CAST(CAST(SUM(ssw_term) AS VARCHAR) AS DOUBLE) AS ssw
      FROM terms CROSS JOIN tot t
      GROUP BY t.k, t.n
    )
    SELECT k, n,
           round(ssb / (ssb + ssw), 6) AS eta_sq,
           round((ssb - (k - 1) * (ssw / (n - k)))
                 / ((ssb + ssw) + (ssw / (n - k))), 6) AS omega_sq
    FROM ss
    """,
)
def q_eta_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eta-squared and omega-squared effect sizes for the one-way
    ANOVA of customer account balance across nations — the
    variance-explained companions to q_anova_f (analytics6.py), built
    from the SAME decimal sufficient statistics: η² = SSB/SST,
    ω² = (SSB − (k−1)·MSW)/(SST + MSW). Per-group terms quantize at
    scales 6/4 inside the 2^53 agreement bound before the
    order-independent decimal sums; the two ratios are flat double
    expressions written identically in both engines."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    g = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("grp"))
        .agg(
            F.count("*").alias("ng"),
            F.sum(bal).cast("double").alias("s"),
            F.sum(bal * bal).cast("double").alias("q"),
        )
    )
    tot = g.agg(
        F.sum("ng").alias("n"),
        F.count("*").alias("k"),
        F.sum(F.col("s").cast("decimal(24,6)")).cast("double").alias("st"),
    )
    mu_g = F.col("s") / F.col("ng")
    mu = F.col("st") / F.col("n")
    terms = g.crossJoin(F.broadcast(tot)).select(
        "k",
        "n",
        (F.col("ng") * (mu_g - mu) * (mu_g - mu)).cast("decimal(24,6)").alias(
            "ssb_term"
        ),
        (F.col("q") - (F.col("s") * F.col("s")) / F.col("ng"))
        .cast("decimal(24,4)")
        .alias("ssw_term"),
    )
    ss = terms.groupBy("k", "n").agg(
        F.sum("ssb_term").cast("double").alias("ssb"),
        F.sum("ssw_term").cast("double").alias("ssw"),
    )
    msw = F.col("ssw") / (F.col("n") - F.col("k"))
    return ss.select(
        "k",
        "n",
        F.round(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6).alias("eta_sq"),
        F.round(
            (F.col("ssb") - (F.col("k") - 1) * msw)
            / ((F.col("ssb") + F.col("ssw")) + msw),
            6,
        ).alias("omega_sq"),
    )


@query(
    "q_chi2_gof_uniform",
    oracle="""
    WITH obs AS (
      SELECT CAST(l_quantity AS BIGINT) AS cell,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(n) AS BIGINT) AS n_total,
           round(CAST(COUNT(*) * SUM(n * n) - SUM(n) * SUM(n) AS DOUBLE)
                 / SUM(n), 6) AS chi2,
           CAST(COUNT(*) - 1 AS BIGINT) AS df
    FROM obs
    """,
)
def q_chi2_gof_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared goodness-of-fit of lineitem order
    quantities against a discrete uniform over the observed cells —
    the "is this dimension flat?" data-quality audit (the
    equal-expected-count special case collapses algebraically:
    χ² = Σ(n_i − N/k)²/(N/k) = (k·Σn_i² − N²)/N, so the whole
    statistic is INTEGER until one final division). One
    map-side-combined count reduce to the ≤50-cell quantity domain;
    the uniform null is the boundary case of q_benford_digits'
    expected-table formulation (analytics2.py) with no per-cell
    float terms at all. int64 bound: k·Σn² and N² stay exact while
    N ≤ ~3e9 rows (√(2^63/k) with k=50); past that, swap the two
    products to DECIMAL(38,0) sums on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.groupBy(F.col("l_quantity").cast("bigint").alias("cell")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    return obs.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.round(
            (
                F.count("*") * F.sum(F.col("n") * F.col("n"))
                - F.sum("n") * F.sum("n")
            ).cast("double")
            / F.sum("n"),
            6,
        ).alias("chi2"),
        (F.count("*") - 1).cast("bigint").alias("df"),
    )
