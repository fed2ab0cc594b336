"""Round-12 analytics wave: income-inequality / concentration
indices and the Brunner–Munzel rank test — Theil's T and Atkinson's
index (Theil, *Economics and Information Theory*, 1967; Atkinson,
JET 1970), the Hoover / Robin Hood index (Hoover, Rev. Econ. Stat.
1936), the Palma ratio (Palma, Dev. & Change 2011), tail quantile
ratios (p90/p10, p75/p25), and the Brunner–Munzel heteroscedastic
rank-based two-sample test (Brunner & Munzel, Biom. J. 2000 — the
behavior of scipy.stats.brunnermunzel), all over the per-event-type
value distributions.

Exactness design (the analytics5/8/11 discipline):
- the one corpus-sized pass per query is the (type, value) count
  reduce (map-side combined); everything after runs on the bounded
  distinct-value table;
- totals n, S = Σc·v stay exact (BIGINT / DECIMAL); Hoover's
  Σc·|n·v − S| is DECIMAL end-to-end (mean scaled out), one flat
  division at the end;
- Palma / quantile cutoffs are INTEGER rank arithmetic on the
  cumulative count table (ceil(p·n) as (p_num·n + p_den − 1) //
  p_den), so bucket sums are exact decimals and each ratio is one
  flat division;
- Theil / Atkinson per-value transcendental terms ((x/μ)ln(x/μ),
  ln x) quantize to DECIMAL(24,12) BEFORE the count-weighted sum
  (the q_word_entropy idiom), with μ fixed once per type as the
  VARCHAR-bridged exact-decimal mean;
- Brunner–Munzel keeps all rank statistics integral via DOUBLED
  midranks on the merged (pair, value) count table: 2·Rc =
  2(cuma+cumb) − ct + 1 and 2·Ra = 2cuma − ca + 1 are integers, so
  T1 = Σc·(2Rc − 2Ra) and T2 = Σc·(2Rc − 2Ra)² are exact; the
  statistic is one flat double expression over six VARCHAR-bridged
  exact aggregates (divisions and one sqrt, identically shaped on
  both engines).

Scale shape: bounded by the value DOMAIN (2-decimal prices) and the
|types|² pair fan-out, not data volume — the analytics5 boundedness
argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.analytics5 import _CNT_SQL, _counts, _pair_grid
from timestream_travel_spark.registry import query

# totals per type on the exact count table: n rows, S = Σ c·v (DECIMAL)
_TOT_SQL = """
      SELECT t, CAST(SUM(c) AS BIGINT) AS n,
             SUM(c * CAST(v AS DECIMAL(20,4))) AS s
      FROM cnt GROUP BY t
"""


def _totals(cnt: DataFrame) -> DataFrame:
    return cnt.groupBy("t").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("c") * F.col("v").cast("decimal(20,4)")).alias("s"),
    )


@query(
    "q_theil_atkinson",
    oracle=f"""
    WITH cnt0 AS ({_CNT_SQL}
    ), cnt AS (SELECT * FROM cnt0 WHERE v > 0
    ), tot AS ({_TOT_SQL}
    ), mu AS (
      SELECT t, n, CAST(CAST(s AS VARCHAR) AS DOUBLE) / n AS mu FROM tot
    ), terms AS (
      SELECT c.t, m.n, m.mu,
             c.c * CAST((c.v / m.mu) * ln(c.v / m.mu)
                        AS DECIMAL(24,12)) AS th,
             c.c * CAST(ln(c.v) AS DECIMAL(24,12)) AS lx
      FROM cnt c JOIN mu m ON m.t = c.t
    )
    SELECT t AS event_type, n,
           round(CAST(CAST(SUM(th) AS VARCHAR) AS DOUBLE) / n, 6)
             AS theil_t,
           round(1.0 - exp(CAST(CAST(SUM(lx) AS VARCHAR) AS DOUBLE) / n)
                       / ANY_VALUE(mu), 6) AS atkinson_1
    FROM terms GROUP BY t, n
    """,
)
def q_theil_atkinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's T = (1/n)Σ(x/μ)ln(x/μ) and Atkinson's index at ε=1
    (1 − geometric mean / μ) per event type. μ is the VARCHAR-bridged
    exact-decimal mean; each transcendental term quantizes to
    DECIMAL(24,12) once per DISTINCT value and is count-weighted.
    Both indices are defined over POSITIVE values; zero-value rows
    (present from sf0.1 up) are excluded from n, μ and the sums."""
    cnt = _counts(spark, sf_dir).filter(F.col("v") > 0)
    mu = _totals(cnt).select(
        "t", "n", (F.col("s").cast("double") / F.col("n")).alias("mu")
    )
    terms = cnt.join(F.broadcast(mu), "t").select(
        "t",
        "n",
        "mu",
        (
            F.col("c")
            * ((F.col("v") / F.col("mu")) * F.log(F.col("v") / F.col("mu"))).cast(
                "decimal(24,12)"
            )
        ).alias("th"),
        (F.col("c") * F.log("v").cast("decimal(24,12)")).alias("lx"),
    )
    return terms.groupBy(F.col("t").alias("event_type"), "n").agg(
        F.round(F.sum("th").cast("double") / F.col("n"), 6).alias("theil_t"),
        F.round(
            F.lit(1.0)
            - F.exp(F.sum("lx").cast("double") / F.col("n"))
            / F.any_value("mu"),
            6,
        ).alias("atkinson_1"),
    )


@query(
    "q_hoover_index",
    oracle=f"""
    WITH cnt AS ({_CNT_SQL}
    ), tot AS ({_TOT_SQL})
    SELECT c.t AS event_type, ANY_VALUE(m.n) AS n,
           round(CAST(CAST(SUM(c.c * abs(m.n * CAST(c.v AS DECIMAL(20,4))
                                         - m.s)) AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(2 * ANY_VALUE(m.n) * ANY_VALUE(m.s)
                             AS VARCHAR) AS DOUBLE), 6) AS hoover
    FROM cnt c JOIN tot m ON m.t = c.t
    GROUP BY c.t
    """,
)
def q_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoover (Robin Hood) index per event type: half the relative
    mean absolute deviation, Σ|x−μ| / (2Σx) — the share of total
    value that would have to move to equalize. The mean is scaled
    out (|n·x − S| with exact DECIMAL n·x and S), so the numerator
    is DECIMAL end-to-end and the index is one flat division of two
    VARCHAR-bridged exact decimals."""
    # r16: the exact scale-4 deviation census runs driver-side over
    # the collected counts spine (rank_kit; both aggregates verified
    # decimal(38,4) — no precision-loss rounding to replay); the
    # final division below is unchanged Spark expressions.
    from decimal import Decimal

    from timestream_travel_spark.operators.rank_kit import counts_by_type, dec4
    from timestream_travel_spark.tables import bounded_df

    kit = counts_by_type(spark, sf_dir)
    rows = []
    for t in sorted(kit):
        v, c = kit[t]
        v4 = [dec4(x) for x in v.tolist()]
        cs = c.tolist()
        n = sum(cs)
        s = sum(k * x for k, x in zip(cs, v4))
        sdev = sum(k * abs(n * x - s) for k, x in zip(cs, v4))
        rows.append(
            (t, n, Decimal(sdev).scaleb(-4), Decimal(s).scaleb(-4))
        )
    base = bounded_df(
        spark,
        rows,
        "event_type string, n bigint, sdev decimal(38,4), s decimal(38,4)",
    )
    return base.select(
        "event_type",
        "n",
        F.round(
            F.col("sdev").cast("double")
            / (F.lit(2) * F.col("n") * F.col("s")).cast("double"),
            6,
        ).alias("hoover"),
    )


@query(
    "q_palma_ratio",
    oracle=f"""
    WITH cnt AS ({_CNT_SQL}
    ), tot AS (SELECT t, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY t
    ), cum AS (
      SELECT c.t, c.v, c.c, m.n,
             SUM(c.c) OVER (PARTITION BY c.t ORDER BY c.v
                            ROWS UNBOUNDED PRECEDING) AS cm
      FROM cnt c JOIN tot m ON m.t = c.t
    ), shares AS (
      SELECT t, n,
             SUM(CAST(v AS DECIMAL(20,4))
                 * greatest(0, least(cm, (4 * n) // 10) - (cm - c)))
               AS bottom40,
             SUM(CAST(v AS DECIMAL(20,4))
                 * greatest(0, cm - greatest(cm - c, n - n // 10)))
               AS top10
      FROM cum GROUP BY t, n
    )
    SELECT t AS event_type, n,
           CAST(CAST(top10 AS VARCHAR) AS DOUBLE) AS top10_sum,
           CAST(CAST(bottom40 AS VARCHAR) AS DOUBLE) AS bottom40_sum,
           round(CAST(CAST(top10 AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(bottom40 AS VARCHAR) AS DOUBLE), 6) AS palma
    FROM shares
    """,
)
def q_palma_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palma ratio per event type: total value held by the top 10%
    of rows over the bottom 40% (ranks by value ascending). Bucket
    membership is INTEGER rank arithmetic on the cumulative count
    table — a distinct value spanning ranks (cm−c, cm] contributes
    the clipped overlap with each bucket — so both sums are exact
    decimals and the ratio is one flat division. Ties share one
    value, so the overlap split is deterministic."""
    # r16: the clipped-overlap bucket census runs driver-side over
    # the collected counts spine (rank_kit; integer rank arithmetic,
    # scale-4 decimal value sums — verified decimal(38,4), no
    # precision loss); the ratio below is unchanged Spark expressions.
    from decimal import Decimal

    from timestream_travel_spark.operators.rank_kit import counts_by_type, dec4
    from timestream_travel_spark.tables import bounded_df

    kit = counts_by_type(spark, sf_dir)
    rows = []
    for t in sorted(kit):
        v, c = kit[t]
        cs = c.tolist()
        n = sum(cs)
        k40 = (4 * n) // 10
        top_cut = n - n // 10
        bottom = top = 0
        cm = 0
        for x, k in zip(v.tolist(), cs):
            lo = cm
            cm += k
            x4 = dec4(x)
            bottom += x4 * max(0, min(cm, k40) - lo)
            top += x4 * max(0, cm - max(lo, top_cut))
        rows.append(
            (t, n, Decimal(bottom).scaleb(-4), Decimal(top).scaleb(-4))
        )
    shares = bounded_df(
        spark,
        rows,
        "t string, n bigint, bottom40 decimal(38,4), top10 decimal(38,4)",
    )
    return shares.select(
        F.col("t").alias("event_type"),
        "n",
        F.col("top10").cast("double").alias("top10_sum"),
        F.col("bottom40").cast("double").alias("bottom40_sum"),
        F.round(
            F.col("top10").cast("double") / F.col("bottom40").cast("double"),
            6,
        ).alias("palma"),
    )


@query(
    "q_quantile_ratio",
    oracle=f"""
    WITH cnt AS ({_CNT_SQL}
    ), tot AS (SELECT t, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY t
    ), cum AS (
      SELECT c.t, c.v, m.n,
             SUM(c.c) OVER (PARTITION BY c.t ORDER BY c.v
                            ROWS UNBOUNDED PRECEDING) AS cm
      FROM cnt c JOIN tot m ON m.t = c.t
    ), q AS (
      SELECT t, n,
             MIN(CASE WHEN cm >= (9 * n + 9) // 10 THEN v END) AS p90,
             MIN(CASE WHEN cm >= (n + 9) // 10 THEN v END) AS p10,
             MIN(CASE WHEN cm >= (3 * n + 3) // 4 THEN v END) AS p75,
             MIN(CASE WHEN cm >= (n + 3) // 4 THEN v END) AS p25
      FROM cum GROUP BY t, n
    )
    SELECT t AS event_type, n, p90, p10, p75, p25,
           round(p90 / p10, 6) AS ratio_90_10,
           round(p75 / p25, 6) AS ratio_75_25
    FROM q
    """,
)
def q_quantile_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail dispersion ratios p90/p10 and p75/p25 per event type,
    with type-1 (lower empirical CDF inverse) quantiles: x at rank
    ceil(p·n), found as the smallest distinct value whose cumulative
    count reaches the integer cutoff — fully deterministic, no
    interpolation, so both engines pick the identical source double
    and each ratio is one flat division."""
    # r16: the type-1 quantile selection runs driver-side over the
    # collected counts spine (rank_kit; integer rank cutoffs pick raw
    # source doubles); the ratios below are unchanged Spark
    # expressions.
    from timestream_travel_spark.operators.rank_kit import counts_by_type
    from timestream_travel_spark.tables import bounded_df

    kit = counts_by_type(spark, sf_dir)
    rows = []
    for t in sorted(kit):
        v, c = kit[t]
        vs, cs = v.tolist(), c.tolist()
        n = sum(cs)

        def _sel(num: int, den: int):
            cut = (num * n + den - 1) // den
            cm = 0
            for x, k in zip(vs, cs):
                cm += k
                if cm >= cut:
                    return x
            return None

        rows.append((t, n, _sel(9, 10), _sel(1, 10), _sel(3, 4), _sel(1, 4)))
    q = bounded_df(
        spark,
        rows,
        "t string, n bigint, p90 double, p10 double, p75 double, p25 double",
    )
    return q.select(
        F.col("t").alias("event_type"),
        "n",
        "p90",
        "p10",
        "p75",
        "p25",
        F.round(F.col("p90") / F.col("p10"), 6).alias("ratio_90_10"),
        F.round(F.col("p75") / F.col("p25"), 6).alias("ratio_75_25"),
    )


# Brunner–Munzel: merged per-pair count table with doubled midranks.
_BM_SQL = f"""
    WITH cnt AS ({_CNT_SQL}
    ), n AS (SELECT t, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY t
    ), pairs AS (
      SELECT a.t AS ta, b.t AS tb, a.n AS n_a, b.n AS n_b
      FROM n a JOIN n b ON a.t < b.t
    ), merged AS (
      SELECT p.ta, p.tb, p.n_a, p.n_b, c.v,
             SUM(CASE WHEN c.t = p.ta THEN c.c ELSE 0 END) AS ca,
             SUM(CASE WHEN c.t = p.tb THEN c.c ELSE 0 END) AS cb
      FROM pairs p JOIN cnt c ON c.t = p.ta OR c.t = p.tb
      GROUP BY p.ta, p.tb, p.n_a, p.n_b, c.v
    ), cum AS (
      SELECT ta, tb, n_a, n_b, ca, cb,
             SUM(ca) OVER w AS cuma, SUM(cb) OVER w AS cumb
      FROM merged
      WINDOW w AS (PARTITION BY ta, tb ORDER BY v ROWS UNBOUNDED PRECEDING)
    ), ranks AS (
      SELECT ta, tb, n_a, n_b, ca, cb,
             2 * (cuma + cumb) - (ca + cb) + 1 AS rc2,
             2 * cuma - ca + 1 AS ra2,
             2 * cumb - cb + 1 AS rb2
      FROM cum
    ), agg AS (
      SELECT ta, tb, n_a, n_b,
             SUM(CAST(ca * rc2 AS DECIMAL(38,0))) AS ua,
             SUM(CAST(cb * rc2 AS DECIMAL(38,0))) AS ub,
             SUM(CAST(ca * (rc2 - ra2) AS DECIMAL(38,0))) AS t1a,
             SUM(CAST(cb * (rc2 - rb2) AS DECIMAL(38,0))) AS t1b,
             SUM(CAST(ca * (rc2 - ra2) * (rc2 - ra2)
                      AS DECIMAL(38,0))) AS t2a,
             SUM(CAST(cb * (rc2 - rb2) * (rc2 - rb2)
                      AS DECIMAL(38,0))) AS t2b
      FROM ranks GROUP BY ta, tb, n_a, n_b
    )
"""


@query(
    "q_brunner_munzel",
    oracle=f"""{_BM_SQL}
    SELECT ta AS type_a, tb AS type_b, n_a, n_b,
           round((CAST(CAST(ub AS VARCHAR) AS DOUBLE) / (2.0 * n_b)
                  - (n_b + 1) / 2.0) / n_a, 6) AS p_hat,
           round(n_a * n_b
                 * (CAST(CAST(ub AS VARCHAR) AS DOUBLE) / (2.0 * n_b)
                    - CAST(CAST(ua AS VARCHAR) AS DOUBLE) / (2.0 * n_a))
                 / ((n_a + n_b)
                    * sqrt(n_a * ((CAST(CAST(t2a AS VARCHAR) AS DOUBLE)
                                   - CAST(CAST(t1a AS VARCHAR) AS DOUBLE)
                                     * CAST(CAST(t1a AS VARCHAR) AS DOUBLE)
                                     / n_a) / (4.0 * (n_a - 1)))
                           + n_b * ((CAST(CAST(t2b AS VARCHAR) AS DOUBLE)
                                     - CAST(CAST(t1b AS VARCHAR) AS DOUBLE)
                                       * CAST(CAST(t1b AS VARCHAR) AS DOUBLE)
                                       / n_b) / (4.0 * (n_b - 1))))),
                 6) AS w_bm
    FROM agg
    """,
)
def q_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner–Munzel W for every event-type pair (scipy convention:
    positive when sample b stochastically dominates): W =
    n_a·n_b·(R̄b − R̄a) / ((n_a+n_b)·sqrt(n_a·S_a² + n_b·S_b²)), with
    S_i² the variance of (combined − within) midranks. All rank sums
    are exact integers via doubled midranks on the merged distinct-
    value table; the statistic is one flat double expression over
    the six VARCHAR-bridged aggregates. p_hat = P(X<Y) + ½P(X=Y)."""
    # r16: the doubled-midrank census runs driver-side over the
    # collected counts spine (rank_kit; Python ints reproduce the
    # DECIMAL(38,0) widenings exactly); the W/p_hat float
    # composition below is unchanged Spark expressions.
    from decimal import Decimal

    from timestream_travel_spark.operators.rank_kit import (
        counts_by_type,
        merged_pair,
        type_pairs,
    )
    from timestream_travel_spark.tables import bounded_df

    kit = counts_by_type(spark, sf_dir)
    rows = []
    for ta, tb in type_pairs(kit):
        _, ca, cb = merged_pair(kit, ta, tb)
        n_a, n_b = int(ca.sum()), int(cb.sum())
        ua = ub = t1a = t1b = t2a = t2b = 0
        cuma = cumb = 0
        for a_, b_ in zip(ca.tolist(), cb.tolist()):
            cuma += a_
            cumb += b_
            rc2 = 2 * (cuma + cumb) - (a_ + b_) + 1
            ra2 = 2 * cuma - a_ + 1
            rb2 = 2 * cumb - b_ + 1
            ua += a_ * rc2
            ub += b_ * rc2
            da, db = rc2 - ra2, rc2 - rb2
            t1a += a_ * da
            t1b += b_ * db
            t2a += a_ * da * da
            t2b += b_ * db * db
        rows.append(
            (ta, tb, n_a, n_b)
            + tuple(Decimal(x) for x in (ua, ub, t1a, t1b, t2a, t2b))
        )
    agg = bounded_df(
        spark,
        rows,
        "ta string, tb string, n_a bigint, n_b bigint, "
        "ua decimal(38,0), ub decimal(38,0), t1a decimal(38,0), "
        "t1b decimal(38,0), t2a decimal(38,0), t2b decimal(38,0)",
    )
    dbl = lambda name: F.col(name).cast("double")  # noqa: E731
    rbar_a = dbl("ua") / (F.lit(2.0) * F.col("n_a"))
    rbar_b = dbl("ub") / (F.lit(2.0) * F.col("n_b"))
    s2a = (dbl("t2a") - dbl("t1a") * dbl("t1a") / F.col("n_a")) / (
        F.lit(4.0) * (F.col("n_a") - 1)
    )
    s2b = (dbl("t2b") - dbl("t1b") * dbl("t1b") / F.col("n_b")) / (
        F.lit(4.0) * (F.col("n_b") - 1)
    )
    return agg.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        "n_a",
        "n_b",
        F.round(
            (rbar_b - (F.col("n_b") + 1) / F.lit(2.0)) / F.col("n_a"), 6
        ).alias("p_hat"),
        F.round(
            F.col("n_a")
            * F.col("n_b")
            * (rbar_b - rbar_a)
            / (
                (F.col("n_a") + F.col("n_b"))
                * F.sqrt(F.col("n_a") * s2a + F.col("n_b") * s2b)
            ),
            6,
        ).alias("w_bm"),
    )
