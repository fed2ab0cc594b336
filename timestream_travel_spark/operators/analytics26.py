"""Statistical analytics, part 26 (round-16 STAGED wave): three
classical procedures the suite lacks —

- q_pettitt_change: Pettitt's nonparametric change-point test
  (Pettitt, JRSS-C 1979): U_t = Σ_{i≤t}Σ_{j>t} sgn(y_i − y_j) over
  the daily level series per event type, K = max|U_t|, the change
  day at the argmax, and the standard approximate significance
  p ≈ 2·exp(−6K²/(n³+n²)).
- q_kuiper_two_sample: Kuiper's V (Kuiper 1960) between the
  purchase and click value samples — D⁺ + D⁻ of the ECDFs, the
  cyclic-invariant cousin of the existing q_ks_two_sample.
- q_l_moments: sample L-moments λ1..λ4 and L-moment ratios τ3
  (L-skewness) / τ4 (L-kurtosis) of the purchase values (Hosking,
  JRSS-B 1990) via the direct order-statistic estimators
  b_r = Σ y_(i)·ff(i−1,r) / (n·ff(n−1,r)).

Exactness:
- Pettitt: sgn on exact integer cents, U_t exact BIGINT sums; only
  the final p composition is float (identically-shaped exp of one
  flat division; quantized to 6dp — irrational terms quantize
  safely, registry docstring).
- Kuiper: ECDF gaps cross-multiplied by n_a·n_b — exact BIGINT
  maxima, ONE flat double division per statistic.
- L-moments: falling factorials ff(i−1,r) fit int64 (< 8·10¹² at
  sf0.1); each term crosses into DECIMAL(38,0) BEFORE the value
  multiply; the λ/τ numerators and denominators are exact
  DECIMAL(38,0) integer combinations with ONE flat double division
  each — bridged through VARCHAR on the DuckDB side because the
  sums exceed double precision (the dsum_sql rule).

Scale shape: Pettitt runs O(n²) pair sums on the DOMAIN-BOUNDED
daily table (types × 30 days — the timeseries27 argument); Kuiper
and the L-moments are single-window rank passes + one hash agg
over the raw rows (the weighted-quantiles shape); nothing
quadratic touches raw-row granularity.

Reference parity: none (no stats surface in cmd/backup.go) —
north-star derived capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# daily level in exact cents per (type, day) — shared by Pettitt
_DAILY_CENTS_SQL = """
      SELECT event_type AS t,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(SUM(CAST(value AS DECIMAL(20,2)) * 100) AS BIGINT) AS y
      FROM events
      GROUP BY 1, 2
"""


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("event_type").alias("t"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(
        F.sum(F.col("value").cast("decimal(20,2)") * 100)
        .cast("bigint")
        .alias("y")
    )


@query(
    "q_pettitt_change",
    oracle=f"""
    WITH daily AS MATERIALIZED ({_DAILY_CENTS_SQL}
    ), rk AS MATERIALIZED (
      SELECT t, day, y,
             row_number() OVER (PARTITION BY t ORDER BY day) AS r,
             count(*) OVER (PARTITION BY t) AS n
      FROM daily
    ), u AS MATERIALIZED (
      SELECT tt.t, tt.r AS tcut, tt.day, tt.n,
             CAST(SUM(CASE WHEN a.y > b.y THEN 1
                           WHEN a.y < b.y THEN -1 ELSE 0 END) AS BIGINT) AS ut
      FROM rk tt
      JOIN rk a ON a.t = tt.t AND a.r <= tt.r
      JOIN rk b ON b.t = tt.t AND b.r > tt.r
      WHERE tt.r < tt.n
      GROUP BY 1, 2, 3, 4
    ), best AS (
      SELECT t, tcut, day, n, ut, abs(ut) AS k,
             row_number() OVER (PARTITION BY t
                                ORDER BY abs(ut) DESC, tcut) AS rn
      FROM u
    )
    SELECT t AS event_type, CAST(n AS BIGINT) AS n, day AS change_day,
           ut AS u_at_change, k AS k_stat,
           round(2.0*exp(-6.0*(CAST(k AS DOUBLE)*CAST(k AS DOUBLE))
                 /(CAST(n AS DOUBLE)*n*n + CAST(n AS DOUBLE)*n)), 6)
             AS p_approx
    FROM best WHERE rn = 1
    """,
)
def q_pettitt_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt change-point per event type on the daily cent level:
    exact integer U_t over all (i ≤ t < j) sign pairs, the max-|U|
    cut day (earliest on ties), and the quantized approximate p."""
    daily = _daily_cents(spark, sf_dir)
    w = Window.partitionBy("t").orderBy("day")
    rk = daily.select(
        "t",
        "day",
        "y",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("t")).alias("n"),
    )
    tt = rk.filter(F.col("r") < F.col("n")).select(
        F.col("t").alias("tt_t"),
        F.col("r").alias("tcut"),
        F.col("day").alias("cday"),
        F.col("n").alias("nn"),
    )
    a = rk.select(
        F.col("t").alias("a_t"), F.col("r").alias("ar"), F.col("y").alias("ay")
    )
    b = rk.select(
        F.col("t").alias("b_t"), F.col("r").alias("br"), F.col("y").alias("by")
    )
    sgn = (
        F.when(F.col("ay") > F.col("by"), 1)
        .when(F.col("ay") < F.col("by"), -1)
        .otherwise(0)
    )
    u = (
        tt.join(a, (F.col("a_t") == F.col("tt_t")) & (F.col("ar") <= F.col("tcut")))
        .join(b, (F.col("b_t") == F.col("tt_t")) & (F.col("br") > F.col("tcut")))
        .groupBy("tt_t", "tcut", "cday", "nn")
        .agg(F.sum(sgn).cast("bigint").alias("ut"))
    )
    best = u.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("tt_t").orderBy(
                F.abs(F.col("ut")).desc(), F.col("tcut")
            )
        ),
    ).filter(F.col("rn") == 1)
    k = F.abs(F.col("ut"))
    nd = F.col("nn").cast("double")
    return best.select(
        F.col("tt_t").alias("event_type"),
        F.col("nn").cast("bigint").alias("n"),
        F.col("cday").alias("change_day"),
        F.col("ut").alias("u_at_change"),
        k.alias("k_stat"),
        F.round(
            2.0
            * F.exp(
                -6.0
                * (k.cast("double") * k.cast("double"))
                / (nd * F.col("nn") * F.col("nn") + nd * F.col("nn"))
            ),
            6,
        ).alias("p_approx"),
    )


@query(
    "q_kuiper_two_sample",
    oracle="""
    WITH a AS (
      SELECT CAST(CAST(value AS DECIMAL(20,2)) * 100 AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase'
    ), b AS (
      SELECT CAST(CAST(value AS DECIMAL(20,2)) * 100 AS BIGINT) AS v
      FROM events WHERE event_type = 'click'
    ), sizes AS (
      SELECT (SELECT count(*) FROM a) AS na, (SELECT count(*) FROM b) AS nb
    ), pooled AS (
      SELECT v, SUM(ca) AS ca, SUM(cb) AS cb FROM (
        SELECT v, 1 AS ca, 0 AS cb FROM a
        UNION ALL SELECT v, 0, 1 FROM b
      ) GROUP BY v
    ), cum AS (
      SELECT v,
             SUM(ca) OVER (ORDER BY v) AS cca,
             SUM(cb) OVER (ORDER BY v) AS ccb
      FROM pooled
    ), gaps AS (
      SELECT greatest(max(cca*nb - ccb*na), 0) AS dps,
             greatest(max(ccb*na - cca*nb), 0) AS dms
      FROM cum, sizes
      GROUP BY na, nb
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(dps AS BIGINT) AS dplus_scaled,
           CAST(dms AS BIGINT) AS dminus_scaled,
           CAST(dps + dms AS DOUBLE) / (na * nb) AS v_stat
    FROM gaps, sizes
    """,
)
def q_kuiper_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper's V between the purchase and click value samples:
    exact n_a·n_b-scaled ECDF gap maxima (floored at 0), one flat
    double division for V = D⁺ + D⁻."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(20,2)") * 100).cast("bigint")
    a = ev.filter(F.col("event_type") == "purchase").select(
        cents.alias("v"), F.lit(1).alias("ca"), F.lit(0).alias("cb")
    )
    b = ev.filter(F.col("event_type") == "click").select(
        cents.alias("v"), F.lit(0).alias("ca"), F.lit(1).alias("cb")
    )
    pooled = (
        a.unionByName(b)
        .groupBy("v")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = pooled.select(
        F.sum("ca").over(wc).alias("cca"), F.sum("cb").over(wc).alias("ccb")
    )
    sizes = a.select(F.count(F.lit(1)).alias("na")).crossJoin(
        b.select(F.count(F.lit(1)).alias("nb"))
    )
    gaps = (
        cum.crossJoin(F.broadcast(sizes))
        .groupBy("na", "nb")
        .agg(
            F.greatest(
                F.max(F.col("cca") * F.col("nb") - F.col("ccb") * F.col("na")),
                F.lit(0),
            ).alias("dps"),
            F.greatest(
                F.max(F.col("ccb") * F.col("na") - F.col("cca") * F.col("nb")),
                F.lit(0),
            ).alias("dms"),
        )
    )
    return gaps.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("dps").cast("bigint").alias("dplus_scaled"),
        F.col("dms").cast("bigint").alias("dminus_scaled"),
        (
            (F.col("dps") + F.col("dms")).cast("double")
            / (F.col("na") * F.col("nb"))
        ).alias("v_stat"),
    )


def _dd(expr: str) -> str:
    """DuckDB DECIMAL→DOUBLE via VARCHAR (correctly rounded past
    double precision — the dsum_sql rule)."""
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


@query(
    "q_l_moments",
    oracle=f"""
    WITH rk AS (
      SELECT CAST(CAST(value AS DECIMAL(20,2)) * 100 AS BIGINT) AS y,
             row_number() OVER (ORDER BY value, event_id) AS i,
             count(*) OVER () AS n
      FROM events WHERE event_type = 'purchase'
    ), sums AS (
      SELECT max(n) AS n,
             SUM(CAST(y AS DECIMAL(38,0))) AS b0,
             SUM(CAST(y AS DECIMAL(38,0)) * (i - 1)) AS b1,
             SUM(CAST(y AS DECIMAL(38,0)) * ((i - 1) * (i - 2))) AS b2,
             SUM(CAST(y AS DECIMAL(38,0)) * ((i - 1) * (i - 2) * (i - 3))) AS b3
      FROM rk
    ), lam AS (
      SELECT n, b0, b1, b2, b3,
             b0 AS n1,
             2*b1 - (n - 1)*b0 AS n2,
             6*b2 - 6*(n - 2)*b1 + CAST((n - 1)*(n - 2) AS DECIMAL(38,0))*b0 AS n3,
             20*b3 - 30*(n - 3)*b2 + CAST(12*(n - 2)*(n - 3) AS DECIMAL(38,0))*b1
               - CAST((n - 1)*(n - 2)*(n - 3) AS DECIMAL(38,0))*b0 AS n4
      FROM sums
    )
    SELECT CAST(n AS BIGINT) AS n,
           {_dd("n1")} / n AS l1,
           {_dd("n2")} / (CAST(n AS DOUBLE) * (n - 1)) AS l2,
           {_dd("n3")} / (CAST(n AS DOUBLE) * (n - 1) * (n - 2)) AS l3,
           {_dd("n4")} / (CAST(n AS DOUBLE) * (n - 1) * (n - 2) * (n - 3)) AS l4,
           CASE WHEN n2 <> 0 THEN
             {_dd("n3")} / {_dd("CAST(n - 2 AS DECIMAL(38,0)) * n2")} END AS t3,
           CASE WHEN n2 <> 0 THEN
             {_dd("n4")} / {_dd("CAST((n - 2)*(n - 3) AS DECIMAL(38,0)) * n2")}
           END AS t4
    FROM lam
    """,
)
def q_l_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample L-moments λ1..λ4 and ratios τ3/τ4 of the purchase
    cents: exact DECIMAL(38,0) order-statistic weighted sums (module
    docstring), one flat double division per output."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cents = (F.col("value").cast("decimal(20,2)") * 100).cast("bigint")
    rk = ev.select(
        cents.alias("y"),
        F.row_number().over(Window.orderBy("value", "event_id")).alias("i"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    yd = F.col("y").cast("decimal(38,0)")
    ii = F.col("i").cast("bigint")  # row_number is int32; ff3 overflows it
    sums = rk.agg(
        F.max("n").alias("n"),
        F.sum(yd).alias("b0"),
        F.sum(yd * (ii - 1)).alias("b1"),
        F.sum(yd * ((ii - 1) * (ii - 2))).alias("b2"),
        F.sum(yd * ((ii - 1) * (ii - 2) * (ii - 3))).alias("b3"),
    )
    n = F.col("n")
    lam = sums.select(
        n,
        F.col("b0").alias("n1"),
        (2 * F.col("b1") - (n - 1) * F.col("b0")).alias("n2"),
        (
            6 * F.col("b2")
            - 6 * (n - 2) * F.col("b1")
            + ((n - 1) * (n - 2)).cast("decimal(38,0)") * F.col("b0")
        ).alias("n3"),
        (
            20 * F.col("b3")
            - 30 * (n - 3) * F.col("b2")
            + (12 * (n - 2) * (n - 3)).cast("decimal(38,0)") * F.col("b1")
            - ((n - 1) * (n - 2) * (n - 3)).cast("decimal(38,0)") * F.col("b0")
        ).alias("n4"),
    )
    nd = n.cast("double")
    return lam.select(
        n.cast("bigint").alias("n"),
        (F.col("n1").cast("double") / n).alias("l1"),
        (F.col("n2").cast("double") / (nd * (n - 1))).alias("l2"),
        (F.col("n3").cast("double") / (nd * (n - 1) * (n - 2))).alias("l3"),
        (F.col("n4").cast("double") / (nd * (n - 1) * (n - 2) * (n - 3))).alias(
            "l4"
        ),
        F.when(
            F.col("n2") != 0,
            F.col("n3").cast("double")
            / ((n - 2).cast("decimal(38,0)") * F.col("n2")).cast("double"),
        ).alias("t3"),
        F.when(
            F.col("n2") != 0,
            F.col("n4").cast("double")
            / (((n - 2) * (n - 3)).cast("decimal(38,0)") * F.col("n2")).cast(
                "double"
            ),
        ).alias("t4"),
    )
