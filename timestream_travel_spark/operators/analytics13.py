"""Round-10 statistics, wave 2: the ordinal-association siblings of
Goodman–Kruskal gamma — Somers' D (Somers, ASR 1962) and Stuart's
tau-c (Stuart, Biometrika 1953) — Gwet's AC1 chance-corrected
agreement (Gwet, Br. J. Math. Stat. Psychol. 2008), the Theil–Sen
median-of-pairwise-slopes trend estimator (Theil 1950; Sen, JASA
1968). (The Wald–Wolfowitz runs test already lives in analytics7.)

Exactness: Somers/tau-c reuse q_goodman_kruskal_gamma's bounded
ordinal cell census verbatim — concordant/discordant/tied pair
counts are exact integer product sums over the ≤16×16 cell cross;
AC1 is one flat double expression of q_cohens_kappa's integer 2×2
cells; Theil–Sen slopes are correctly-rounded double quotients of
exact DECIMAL diffs over integer index gaps, and the median is an
explicit order statistic (row_number + the two-middle average
written identically in both engines — never an engine median()
whose interpolation rule could differ).

Scale shape: everything reduces first — events to a ≤4×4 cell table,
a (user, day) table, or |types|×days daily levels — then the
statistics run on bounded tables with broadcast crosses. Theil–Sen's
pair fan-out is C(days, 2) PER TYPE (span-bounded, never
corpus-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.analytics8 import _DAILY_SQL, _daily
from timestream_travel_spark.operators.analytics11 import GAMMA_VALUE_BANDS
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# the gamma ordinal coding, shared verbatim (analytics11):
# x = hour-of-day quarter (0-3), y = literal value band (0-3)
_CELLS_SQL = f"""
    cells AS (
      SELECT CAST(EXTRACT(hour FROM ts) // 6 AS BIGINT) AS x,
             CASE WHEN value <= {GAMMA_VALUE_BANDS[0]!r} THEN 0
                  WHEN value <= {GAMMA_VALUE_BANDS[1]!r} THEN 1
                  WHEN value <= {GAMMA_VALUE_BANDS[2]!r} THEN 2
                  ELSE 3 END AS y,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    )
"""

# unordered pair censuses over the ordered cell cross: a strict
# b>a condition on the distinguishing axis counts each unordered
# pair exactly once (the gamma precedent)
_PAIRS_SQL = """
    pairs AS (
      SELECT SUM(CASE WHEN b.x > a.x AND b.y > a.y THEN a.c * b.c ELSE 0 END)
               AS conc,
             SUM(CASE WHEN b.x > a.x AND b.y < a.y THEN a.c * b.c ELSE 0 END)
               AS disc,
             SUM(CASE WHEN b.y = a.y AND b.x > a.x THEN a.c * b.c ELSE 0 END)
               AS ty,
             SUM(CASE WHEN b.x = a.x AND b.y > a.y THEN a.c * b.c ELSE 0 END)
               AS tx
      FROM cells a JOIN cells b ON true
    )
"""


def _gamma_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    y = (
        F.when(F.col("value") <= GAMMA_VALUE_BANDS[0], 0)
        .when(F.col("value") <= GAMMA_VALUE_BANDS[1], 1)
        .when(F.col("value") <= GAMMA_VALUE_BANDS[2], 2)
        .otherwise(3)
    )
    return ev.groupBy(
        F.floor(F.hour("ts") / 6).cast("bigint").alias("x"), y.alias("y")
    ).agg(F.count(F.lit(1)).alias("c"))


def _pair_census(cells: DataFrame) -> DataFrame:
    """(conc, disc, ty, tx) exact unordered-pair counts from the
    bounded cell table — one broadcast cell×cell cross."""
    a = cells.select(
        F.col("x").alias("xa"), F.col("y").alias("ya"), F.col("c").alias("ca")
    )
    b = cells.select(
        F.col("x").alias("xb"), F.col("y").alias("yb"), F.col("c").alias("cb")
    )
    prod = F.col("ca") * F.col("cb")
    gt = lambda p, q: F.col(p) > F.col(q)  # noqa: E731
    eq = lambda p, q: F.col(p) == F.col(q)  # noqa: E731
    return a.join(F.broadcast(b)).agg(
        F.sum(F.when(gt("xb", "xa") & gt("yb", "ya"), prod).otherwise(0)).alias(
            "conc"
        ),
        F.sum(F.when(gt("xb", "xa") & gt("ya", "yb"), prod).otherwise(0)).alias(
            "disc"
        ),
        F.sum(F.when(eq("yb", "ya") & gt("xb", "xa"), prod).otherwise(0)).alias("ty"),
        F.sum(F.when(eq("xb", "xa") & gt("yb", "ya"), prod).otherwise(0)).alias("tx"),
    )


@query(
    "q_somers_d",
    oracle=f"""
    WITH {_CELLS_SQL},
    {_PAIRS_SQL}
    SELECT CAST(conc AS BIGINT) AS c_pairs,
           CAST(disc AS BIGINT) AS d_pairs,
           CAST(ty AS BIGINT) AS ty_pairs,
           CAST(tx AS BIGINT) AS tx_pairs,
           round(CAST(conc - disc AS DOUBLE) / (conc + disc + ty), 6)
             AS somers_d_yx,
           round(CAST(conc - disc AS DOUBLE) / (conc + disc + tx), 6)
             AS somers_d_xy
    FROM pairs
    """,
)
def q_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Somers' D for the gamma ordinal pair (hour quarter × value
    band), both directions: D_yx = (C−D)/(C+D+T_y) treats y as the
    dependent axis (pairs tied on y but split on x count against
    association), D_xy symmetrically. Gamma drops BOTH tie classes;
    Somers' D is the directional refinement. Same bounded cell
    census, two extra integer tie sums, two flat divisions."""
    p = _pair_census(_gamma_cells(spark, sf_dir))
    cd = F.col("conc") - F.col("disc")
    return p.select(
        F.col("conc").cast("bigint").alias("c_pairs"),
        F.col("disc").cast("bigint").alias("d_pairs"),
        F.col("ty").cast("bigint").alias("ty_pairs"),
        F.col("tx").cast("bigint").alias("tx_pairs"),
        F.round(
            cd.cast("double") / (F.col("conc") + F.col("disc") + F.col("ty")), 6
        ).alias("somers_d_yx"),
        F.round(
            cd.cast("double") / (F.col("conc") + F.col("disc") + F.col("tx")), 6
        ).alias("somers_d_xy"),
    )


@query(
    "q_stuart_tau_c",
    oracle=f"""
    WITH {_CELLS_SQL},
    {_PAIRS_SQL},
    dims AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             LEAST(COUNT(DISTINCT x), COUNT(DISTINCT y)) AS m
      FROM cells
    )
    SELECT CAST(conc AS BIGINT) AS c_pairs,
           CAST(disc AS BIGINT) AS d_pairs,
           n AS n_total, CAST(m AS BIGINT) AS m_levels,
           round(CAST(2 * m * (conc - disc) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * n * (m - 1)), 6) AS tau_c
    FROM pairs CROSS JOIN dims
    """,
)
def q_stuart_tau_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuart's tau-c for the same ordinal pair: τ_c = 2m(C−D) /
    (n²(m−1)) with m = min(rows, cols) of the realized table — the
    tie-robust rectangular-table variant of Kendall's tau. Numerator
    stays an exact integer (|2m(C−D)| ≪ 2⁶³ for n ≤ 3·10⁹ ...
    overflow-safe far past the fixture scale); one flat division."""
    cells = _gamma_cells(spark, sf_dir)
    p = _pair_census(cells)
    dims = cells.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.least(F.countDistinct("x"), F.countDistinct("y")).alias("m"),
    )
    return p.crossJoin(F.broadcast(dims)).select(
        F.col("conc").cast("bigint").alias("c_pairs"),
        F.col("disc").cast("bigint").alias("d_pairs"),
        F.col("n").alias("n_total"),
        F.col("m").cast("bigint").alias("m_levels"),
        F.round(
            (F.lit(2) * F.col("m") * (F.col("conc") - F.col("disc"))).cast("double")
            / (F.col("n").cast("double") * F.col("n") * (F.col("m") - 1)),
            6,
        ).alias("tau_c"),
    )


@query(
    "q_gwet_ac1",
    oracle="""
    WITH units AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ra,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS rb
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ), cells AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ra * rb) AS BIGINT) AS a,
             CAST(SUM(ra * (1 - rb)) AS BIGINT) AS b,
             CAST(SUM((1 - ra) * rb) AS BIGINT) AS c,
             CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS d
      FROM units
    )
    SELECT n AS n_units, a, b, c, d,
           round((CAST(a + d AS DOUBLE) / n
                  - 2.0 * (CAST(2 * a + b + c AS DOUBLE) / (2.0 * n))
                    * (1.0 - CAST(2 * a + b + c AS DOUBLE) / (2.0 * n)))
                 / (1.0
                    - 2.0 * (CAST(2 * a + b + c AS DOUBLE) / (2.0 * n))
                      * (1.0 - CAST(2 * a + b + c AS DOUBLE) / (2.0 * n))),
                 6) AS ac1
    FROM cells
    """,
)
def q_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gwet's AC1 on q_cohens_kappa's exact 2×2 (clicked × viewed per
    (user, day)): AC1 = (p_a − p_eγ)/(1 − p_eγ) with p_eγ = 2π(1−π),
    π = (p_A+ + p_B+)/2 — the agreement coefficient that stays stable
    when the trait prevalence is extreme (kappa's documented paradox:
    high raw agreement, near-zero κ). Same integer cells, one flat
    double expression with sub-terms parenthesized identically in
    both engines."""
    ev = load_table(spark, sf_dir, "events")
    units = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("ra"),
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("rb"),
    )
    cells = units.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("ra") * F.col("rb")).cast("bigint").alias("a"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("bigint").alias("c"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb"))).cast("bigint").alias("d"),
    )
    n, a, b, c, d = (F.col(x) for x in "nabcd")
    pi = (F.lit(2) * a + b + c).cast("double") / (F.lit(2.0) * n)
    pe = F.lit(2.0) * pi * (F.lit(1.0) - pi)
    pa = (a + d).cast("double") / n
    return cells.select(
        n.alias("n_units"), a.alias("a"), b.alias("b"), c.alias("c"), d.alias("d"),
        F.round((pa - pe) / (F.lit(1.0) - pe), 6).alias("ac1"),
    )


@query(
    "q_theil_sen",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), idx AS (
      SELECT t, v, row_number() OVER (PARTITION BY t ORDER BY day) AS i
      FROM daily
    ), slopes AS (
      SELECT a.t,
             CAST(CAST(b.v - a.v AS VARCHAR) AS DOUBLE) / (b.i - a.i) AS s
      FROM idx a JOIN idx b ON a.t = b.t AND a.i < b.i
    ), ranked AS (
      SELECT t, s,
             row_number() OVER (PARTITION BY t ORDER BY s) AS r,
             COUNT(*) OVER (PARTITION BY t) AS m
      FROM slopes
    )
    SELECT t AS event_type, CAST(MAX(m) AS BIGINT) AS n_pairs,
           round((MAX(CASE WHEN r = (m + 1) // 2 THEN s END)
                  + MAX(CASE WHEN r = (m + 2) // 2 THEN s END))
                 / 2.0, 6) AS sen_slope
    FROM ranked GROUP BY t
    """,
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen trend of each event type's daily level series: the
    MEDIAN of all C(n,2) pairwise slopes (v_j − v_i)/(j − i) over the
    dense day index — the 29%-breakdown robust alternative to the
    OLS slope the changepoint/trend family assumes. Each slope is ONE
    correctly-rounded double quotient of an exact DECIMAL difference
    by an exact integer gap; the median is an explicit order
    statistic — rank the slopes, average the ⌈m/2⌉-th and ⌊m/2⌋+1-th
    (equal when m is odd; `(s+s)/2` reproduces s exactly) — never an
    engine median() whose interpolation could differ. Pair fan-out is
    C(days, 2) per type: span-bounded (≤ C(31,2) at one month),
    independent of corpus size."""
    daily = _daily(spark, sf_dir)
    idx = daily.select(
        "t", "v", F.row_number().over(Window.partitionBy("t").orderBy("day")).alias("i")
    )
    a = idx.select(F.col("t"), F.col("v").alias("va"), F.col("i").alias("ia"))
    b = idx.select(
        F.col("t").alias("tb"), F.col("v").alias("vb"), F.col("i").alias("ib")
    )
    slopes = a.join(b, (F.col("t") == F.col("tb")) & (F.col("ia") < F.col("ib"))).select(
        "t",
        ((F.col("vb") - F.col("va")).cast("double") / (F.col("ib") - F.col("ia"))).alias(
            "s"
        ),
    )
    wr = Window.partitionBy("t").orderBy("s")
    ranked = slopes.select(
        "t",
        "s",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("t")).alias("m"),
    )
    lo_mid = F.floor((F.col("m") + 1) / 2)
    hi_mid = F.floor((F.col("m") + 2) / 2)
    picked = ranked.groupBy("t").agg(
        F.max("m").cast("bigint").alias("n_pairs"),
        F.max(F.when(F.col("r") == lo_mid, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("r") == hi_mid, F.col("s"))).alias("s2"),
    )
    return picked.select(
        F.col("t").alias("event_type"),
        "n_pairs",
        F.round((F.col("s1") + F.col("s2")) / 2.0, 6).alias("sen_slope"),
    )
