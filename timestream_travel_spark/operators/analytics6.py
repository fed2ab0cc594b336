"""Round-7 analytics, part B: parametric / categorical association
tests — one-way ANOVA, Cohen's d, Cramér's V, Brown–Forsythe
(median-based Levene). Public textbook statistics.

Exactness notes (extending the q_mutual_information quantization
precedent): group sums and sums of squares accumulate in exact
DECIMAL; where a statistic needs a SUM OF FLOAT TERMS (ANOVA's
Σ n_g(μ_g−μ)², chi-square's Σ o²N/(R·C)), each term quantizes to a
DECIMAL whose scale keeps value·10^scale far below 2^53 — within
that bound both engines round the identical double to the identical
decimal, outside it the binary-expansion vs shortest-repr cast
semantics diverge (the registry's double→DECIMAL caveat). Magnitudes
here are chosen so the bound holds with ≥ 2 digits to spare.
Two-group statistics (Cohen's d) avoid float sums entirely — one
flat double expression per output row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_anova_f",
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
             CAST(CAST(SUM(CAST(s AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS st,
             CAST(CAST(SUM(CAST(q AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS qt
      FROM g
    ), terms AS (
      SELECT CAST((g.ng * ((g.s / g.ng) - (t.st / t.n))
                   * ((g.s / g.ng) - (t.st / t.n))) AS DECIMAL(24,6)) AS ssb_term,
             CAST((g.q - (g.s * g.s) / g.ng) AS DECIMAL(24,4)) AS ssw_term
      FROM g CROSS JOIN tot t
    )
    SELECT t.k, t.n,
           round(CAST(CAST(SUM(ssb_term) AS VARCHAR) AS DOUBLE) / (t.k - 1)
                 / (CAST(CAST(SUM(ssw_term) AS VARCHAR) AS DOUBLE) / (t.n - t.k)),
                 6) AS f_stat
    FROM terms CROSS JOIN tot t
    GROUP BY t.k, t.n
    """,
)
def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F for customer account balance across nations:
    F = [Σ n_g(μ_g−μ)²/(k−1)] / [Σ(Q_g − S_g²/n_g)/(N−k)]. Group
    sums/sums-of-squares are exact DECIMAL; per-group float terms
    (≈1e6 ssb, ≈1e9 ssw) quantize at scales 6/4 — value·10^scale
    ≤ 1e13, safely inside the 2^53 cross-engine agreement bound —
    before the order-independent decimal sum."""
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
        F.sum(F.col("q").cast("decimal(30,4)")).cast("double").alias("qt"),
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
    return terms.groupBy("k", "n").agg(
        F.round(
            (F.sum("ssb_term").cast("double") / (F.col("k") - 1))
            / (F.sum("ssw_term").cast("double") / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_stat")
    )


@query(
    "q_cohens_d",
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
                 / sqrt(((a.q - (a.s * a.s) / a.ng)
                         + (b.q - (b.s * b.s) / b.ng))
                        / (a.ng + b.ng - 2)), 6) AS cohens_d
    FROM g a JOIN g b ON a.seg < b.seg
    """,
)
def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d effect size on account balance for every market-
    segment pair: (μ_a−μ_b)/s_pooled. Exact DECIMAL S and Q per
    segment; each output is ONE flat double expression (no float
    summation anywhere), identical in both engines."""
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
    d = (
        (F.col("sa") / F.col("n_a")) - (F.col("sb") / F.col("n_b"))
    ) / F.sqrt(
        (
            (F.col("qa") - (F.col("sa") * F.col("sa")) / F.col("n_a"))
            + (F.col("qb") - (F.col("sb") * F.col("sb")) / F.col("n_b"))
        )
        / (F.col("n_a") + F.col("n_b") - 2)
    )
    return j.select(
        "seg_a", "seg_b", "n_a", "n_b", F.round(d, 6).alias("cohens_d")
    )


@query(
    "q_cramers_v",
    oracle="""
    WITH cells AS (
      SELECT c.c_mktsegment AS seg, n.n_name AS nat,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ), m AS (
      SELECT seg, nat, o,
             SUM(o) OVER (PARTITION BY seg) AS r,
             SUM(o) OVER (PARTITION BY nat) AS cl,
             CAST(SUM(o) OVER () AS BIGINT) AS n
      FROM cells
    ), terms AS (
      SELECT n,
             CAST((CAST(o AS DOUBLE) * o * n) / (CAST(r AS DOUBLE) * cl)
                  AS DECIMAL(24,8)) AS t
      FROM m
    ), dims AS (
      SELECT CAST(COUNT(DISTINCT seg) AS BIGINT) AS nr,
             CAST(COUNT(DISTINCT nat) AS BIGINT) AS nc
      FROM cells
    )
    SELECT t.n, d.nr AS n_rows, d.nc AS n_cols,
           round(CAST(CAST(SUM(t.t) AS VARCHAR) AS DOUBLE) - t.n, 6) AS chi2,
           round(sqrt((CAST(CAST(SUM(t.t) AS VARCHAR) AS DOUBLE) - t.n)
                      / (t.n * least(d.nr - 1, d.nc - 1))), 6) AS cramers_v
    FROM terms t CROSS JOIN dims d
    GROUP BY t.n, d.nr, d.nc
    """,
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between market segment and nation:
    χ² via the Σ o²N/(R·C) − N identity (one term per OBSERVED cell
    — the algebraic form needs no expected-count table and no
    zero-cell handling), per-cell terms (≤ ~1e5) quantized at scale
    8 inside the 2^53 agreement bound, V = sqrt(χ²/(N·min(r−1,c−1)))."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cells = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("n_name").alias("nat"))
        .agg(F.count("*").alias("o"))
    )
    m = cells.select(
        "seg",
        "nat",
        "o",
        F.sum("o").over(Window.partitionBy("seg")).alias("r"),
        F.sum("o").over(Window.partitionBy("nat")).alias("cl"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    terms = m.select(
        "n",
        (
            (F.col("o").cast("double") * F.col("o") * F.col("n"))
            / (F.col("r").cast("double") * F.col("cl"))
        )
        .cast("decimal(24,8)")
        .alias("t"),
    )
    dims = cells.agg(
        F.count_distinct("seg").alias("nr"), F.count_distinct("nat").alias("nc")
    )
    chi2 = F.sum("t").cast("double") - F.col("n")
    return (
        terms.crossJoin(F.broadcast(dims))
        .groupBy("n", F.col("nr").alias("n_rows"), F.col("nc").alias("n_cols"))
        .agg(
            F.round(chi2, 6).alias("chi2"),
            F.round(
                F.sqrt(
                    chi2
                    / (
                        F.col("n")
                        * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1)
                    )
                ),
                6,
            ).alias("cramers_v"),
        )
    )


@query(
    "q_levene_bf",
    oracle="""
    WITH cnt AS (
      SELECT event_type AS t, value AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT t, v, c,
             SUM(c) OVER (PARTITION BY t ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cu,
             SUM(c) OVER (PARTITION BY t) AS n
      FROM cnt
    ), med AS (
      SELECT t, min(v) AS med FROM cum WHERE 2 * cu >= n GROUP BY t
    ), z AS (
      SELECT e.event_type AS t,
             CAST(abs(CAST(e.value AS DECIMAL(20,4))
                      - CAST(m.med AS DECIMAL(20,4))) AS DECIMAL(12,4)) AS z
      FROM events e JOIN med m ON m.t = e.event_type
    ), g AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(CAST(SUM(z) AS VARCHAR) AS DOUBLE) AS s,
             CAST(CAST(SUM(z * z) AS VARCHAR) AS DOUBLE) AS q
      FROM z GROUP BY t
    ), tot AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(CAST(SUM(CAST(s AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS st
      FROM g
    ), terms AS (
      SELECT CAST((g.ng * ((g.s / g.ng) - (t.st / t.n))
                   * ((g.s / g.ng) - (t.st / t.n))) AS DECIMAL(24,8)) AS ssb_term,
             CAST((g.q - (g.s * g.s) / g.ng) AS DECIMAL(24,6)) AS ssw_term
      FROM g CROSS JOIN tot t
    )
    SELECT t.k, t.n,
           round(CAST(CAST(SUM(ssb_term) AS VARCHAR) AS DOUBLE) / (t.k - 1)
                 / (CAST(CAST(SUM(ssw_term) AS VARCHAR) AS DOUBLE) / (t.n - t.k)),
                 6) AS bf_stat
    FROM terms CROSS JOIN tot t
    GROUP BY t.k, t.n
    """,
)
def q_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test (Levene with group MEDIANS) for equal
    variances of `value` across event types: ANOVA F on the absolute
    deviations z = |x − median_g|. The group median is the exact
    lower median over the domain-bounded (type, value) count table
    (min v with 2·cum ≥ n — integer logic, no interpolation), so z
    stays DECIMAL-exact; the F machinery matches q_anova_f with
    scales fitted to z's ≤1e2 magnitude."""
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy(F.col("event_type").alias("t"), F.col("value").alias("v")).agg(
        F.count("*").alias("c")
    )
    w = (
        Window.partitionBy("t")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cnt.select(
        "t",
        "v",
        F.sum("c").over(w).alias("cu"),
        F.sum("c").over(Window.partitionBy("t")).alias("n"),
    )
    med = (
        cum.filter(2 * F.col("cu") >= F.col("n"))
        .groupBy("t")
        .agg(F.min("v").alias("med"))
    )
    z = ev.join(F.broadcast(med), ev.event_type == med.t).select(
        "t",
        F.abs(
            F.col("value").cast("decimal(20,4)") - F.col("med").cast("decimal(20,4)")
        )
        .cast("decimal(12,4)")
        .alias("z"),
    )
    g = z.groupBy("t").agg(
        F.count("*").alias("ng"),
        F.sum("z").cast("double").alias("s"),
        F.sum(F.col("z") * F.col("z")).cast("double").alias("q"),
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
        (F.col("ng") * (mu_g - mu) * (mu_g - mu)).cast("decimal(24,8)").alias(
            "ssb_term"
        ),
        (F.col("q") - (F.col("s") * F.col("s")) / F.col("ng"))
        .cast("decimal(24,6)")
        .alias("ssw_term"),
    )
    return terms.groupBy("k", "n").agg(
        F.round(
            (F.sum("ssb_term").cast("double") / (F.col("k") - 1))
            / (F.sum("ssw_term").cast("double") / (F.col("n") - F.col("k"))),
            6,
        ).alias("bf_stat")
    )
