"""Round-9 statistics, wave 2: the nonparametric / categorical
companions the r7–r8 test waves left open — Mood's median test
(Mood, *Introduction to the Theory of Statistics*, 1950), Cohen's
kappa inter-rater agreement (Cohen, Educ. Psychol. Meas. 1960), the
Woolf-CI odds ratio (Woolf, Ann. Hum. Genet. 1955), the G-test of
independence (Sokal & Rohlf, *Biometry*), Durbin–Watson serial
correlation (Durbin & Watson, Biometrika 1950), the Cox–Stuart trend
sign test (Cox & Stuart, Biometrika 1955), Theil's U1 forecast
inequality (Theil, *Applied Economic Forecasting*, 1966), and the
Goodman–Kruskal gamma ordinal association (JASA 1954).

Exactness design (the analytics5/8 discipline):
- every contingency cell, dominance census, and sign count is exact
  INTEGER; cross-multiplied integer differences (d = a·N − n·A) make
  the chi-square numerators exact before the one flat double step;
- k-group float sums either pivot into EVENT_TYPES literal columns
  and left-associate (_chain_add — both engines add in the same
  order) or quantize each transcendental term to DECIMAL before an
  exact associative SUM (the PL2/q_unigram_logprob idiom for the
  G-test's data-dependent lang×source cell set);
- Durbin–Watson and Theil's U1 scale out the mean/lag divisions:
  e_t = n·v_t − S is DECIMAL-exact, and both statistics are ratios
  that are invariant to that scaling, so the only float ops are the
  final division (and sqrt for U1).

Scale shape: every query's corpus-sized work is ONE map-side-combined
reduce — (type, value) counts, (user, day, type) flags, daily levels,
or bounded contingency cells; everything after runs on domain-bounded
tables (value grids, 4×4 ordinal cells, |types| rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.analytics5 import _CNT_SQL, _counts
from timestream_travel_spark.operators.analytics8 import (
    EVENT_TYPES,
    _chain_add,
)
from timestream_travel_spark.operators.timeseries13 import _DAILY_SQL, _daily
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

Z95 = 1.959963984540054  # Φ⁻¹(0.975), emitted as the same literal in both engines

# grand lower weighted median of `value` from the (t, v, c) count
# table: the smallest v whose cumulative count reaches half of N
_MEDIAN_SQL = f"""
    cnt AS ({_CNT_SQL}
    ), vgrid AS (
      SELECT v, CAST(SUM(c) AS BIGINT) AS c FROM cnt GROUP BY v
    ), med AS (
      SELECT MIN(v) AS m FROM (
        SELECT v, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(c) OVER () AS n
        FROM vgrid
      ) WHERE 2 * cum >= n
    )
"""


def _grand_median(cnt: DataFrame) -> DataFrame:
    """1-row (m): the grand lower weighted median of value."""
    vgrid = cnt.groupBy("v").agg(F.sum("c").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vgrid.select(
        "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    return cum.filter(2 * F.col("cum") >= F.col("n")).agg(F.min("v").alias("m"))


_MOOD_PIV = ", ".join(
    f"MAX(CASE WHEN t = '{t}' THEN d END) AS d_{t},"
    f" MAX(CASE WHEN t = '{t}' THEN ng END) AS n_{t}"
    for t in EVENT_TYPES
)
_MOOD_SUM = " + ".join(
    f"CAST(d_{t} AS DOUBLE) * d_{t} / n_{t}" for t in EVENT_TYPES
)


@query(
    "q_mood_median_test",
    oracle=f"""
    WITH {_MEDIAN_SQL},
    per AS (
      SELECT c.t,
             CAST(SUM(c.c) AS BIGINT) AS ng,
             CAST(SUM(CASE WHEN c.v > med.m THEN c.c ELSE 0 END) AS BIGINT) AS ag
      FROM cnt c CROSS JOIN med GROUP BY c.t
    ), tot AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(ag) AS BIGINT) AS a
      FROM per
    ), dd AS (
      SELECT p.t, p.ng, p.ag * t2.n - p.ng * t2.a AS d, t2.n, t2.a
      FROM per p CROSS JOIN tot t2
    ), piv AS (
      SELECT {_MOOD_PIV}, MAX(n) AS n, MAX(a) AS a FROM dd
    )
    SELECT n AS n_total,
           CAST(a AS BIGINT) AS n_above,
           (SELECT round(m, 4) FROM med) AS grand_median,
           CAST({len(EVENT_TYPES) - 1} AS INT) AS df,
           round(({_MOOD_SUM})
                 / (CAST(a AS DOUBLE) * (n - a)), 6) AS chi2
    FROM piv
    """,
)
def q_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across the {k} event types: classify every
    value against the GRAND weighted median, then chi-square the
    above-median counts against their expectations. Algebra keeps it
    exact: with d_j = a_j·N − n_j·A (exact integers), the statistic
    collapses to χ² = Σ_j d_j²/n_j / (A·(N−A)) — per-type d_j pivot
    into EVENT_TYPES literal columns and the k-term sum
    left-associates identically in both engines; d_j² is a double
    product of an exact ≤2⁵³ integer."""
    # r16: grand-median selection + integer above-median census run
    # driver-side over the collected counts spine (rank_kit); the χ²
    # composition below is unchanged Spark expressions.
    from timestream_travel_spark.operators.rank_kit import (
        counts_by_type,
        pooled_grid,
    )
    from timestream_travel_spark.tables import bounded_df

    kit = counts_by_type(spark, sf_dir)
    vs, cs = pooled_grid(kit)
    n_tot = int(cs.sum())
    cum = 0
    m = None
    for x, k in zip(vs.tolist(), cs.tolist()):
        cum += k
        if 2 * cum >= n_tot:
            m = x
            break
    per = {}
    a_tot = 0
    for t in sorted(kit):
        v, c = kit[t]
        ng = int(c.sum())
        ag = sum(k for x, k in zip(v.tolist(), c.tolist()) if x > m)
        per[t] = (ng, ag)
        a_tot += ag
    vals = []
    schema = []
    for t in EVENT_TYPES:
        ng, ag = per[t]
        vals.extend([ag * n_tot - ng * a_tot, ng])
        schema.extend([f"d_{t} bigint", f"n_{t} bigint"])
    vals.extend([n_tot, a_tot, m])
    schema.extend(["n bigint", "a bigint", "m double"])
    piv = bounded_df(spark, [tuple(vals)], ", ".join(schema))
    med = piv.select(F.col("m").alias("m"))
    ssum = _chain_add(
        [
            F.col(f"d_{t}").cast("double") * F.col(f"d_{t}") / F.col(f"n_{t}")
            for t in EVENT_TYPES
        ]
    )
    med_out = med.select(F.round("m", 4).alias("grand_median"))
    return piv.join(F.broadcast(med_out)).select(
        F.col("n").alias("n_total"),
        F.col("a").alias("n_above"),
        "grand_median",
        F.lit(len(EVENT_TYPES) - 1).cast("int").alias("df"),
        F.round(
            ssum / (F.col("a").cast("double") * (F.col("n") - F.col("a"))), 6
        ).alias("chi2"),
    )


@query(
    "q_cohens_kappa",
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
                  - (CAST(a + b AS DOUBLE) * (a + c)
                     + CAST(c + d AS DOUBLE) * (b + d)) / (CAST(n AS DOUBLE) * n))
                 / (1.0
                    - (CAST(a + b AS DOUBLE) * (a + c)
                       + CAST(c + d AS DOUBLE) * (b + d)) / (CAST(n AS DOUBLE) * n)),
                 6) AS kappa
    FROM cells
    """,
)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two binary 'raters' on (user, day)
    units: rater A = the user clicked that day, rater B = the user
    viewed that day — the agreement-beyond-chance statistic, κ =
    (p_o − p_e)/(1 − p_e). The 2×2 cells are exact integers from one
    (user, day) reduce; κ is one flat double expression written
    identically in both engines."""
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
    pe = (
        (a + b).cast("double") * (a + c) + (c + d).cast("double") * (b + d)
    ) / (n.cast("double") * n)
    po = (a + d).cast("double") / n
    return cells.select(
        n.alias("n_units"), a.alias("a"), b.alias("b"), c.alias("c"), d.alias("d"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


@query(
    "q_odds_ratio_ci",
    oracle=f"""
    WITH {_MEDIAN_SQL},
    flagged AS (
      SELECT CASE WHEN EXTRACT(hour FROM ts) >= 12 THEN 1 ELSE 0 END AS exp,
             CASE WHEN value > (SELECT m FROM med) THEN 1 ELSE 0 END AS outc
      FROM events
    ), cells AS (
      SELECT CAST(SUM(exp * outc) AS BIGINT) AS a,
             CAST(SUM(exp * (1 - outc)) AS BIGINT) AS b,
             CAST(SUM((1 - exp) * outc) AS BIGINT) AS c,
             CAST(SUM((1 - exp) * (1 - outc)) AS BIGINT) AS d
      FROM flagged
    )
    SELECT a, b, c, d,
           round(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)
             AS odds_ratio,
           round(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                     - {Z95!r} * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)),
                 6) AS ci_lo,
           round(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                     + {Z95!r} * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)),
                 6) AS ci_hi
    FROM cells
    """,
)
def q_odds_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio with the Woolf 95% log-normal CI for the 2×2 of
    (afternoon event: hour ≥ 12) × (above-median value): OR = ad/bc,
    CI = exp(ln OR ± z·√(1/a+1/b+1/c+1/d)). Cells are exact integer
    sums off one scan (the median subquery reuses the exact weighted-
    median grid); z is the same 17-digit literal in both engines."""
    ev = load_table(spark, sf_dir, "events")
    med = _grand_median(_counts(spark, sf_dir))
    flagged = ev.join(F.broadcast(med)).select(
        F.when(F.hour("ts") >= 12, 1).otherwise(0).alias("exp"),
        F.when(F.col("value") > F.col("m"), 1).otherwise(0).alias("outc"),
    )
    cells = flagged.agg(
        F.sum(F.col("exp") * F.col("outc")).cast("bigint").alias("a"),
        F.sum(F.col("exp") * (1 - F.col("outc"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("exp")) * F.col("outc")).cast("bigint").alias("c"),
        F.sum((1 - F.col("exp")) * (1 - F.col("outc"))).cast("bigint").alias("d"),
    )
    a, b, c, d = (F.col(x) for x in "abcd")
    orx = a.cast("double") * d / (b.cast("double") * c)
    se = F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    return cells.select(
        a.alias("a"), b.alias("b"), c.alias("c"), d.alias("d"),
        F.round(orx, 6).alias("odds_ratio"),
        F.round(F.exp(F.log(orx) - Z95 * se), 6).alias("ci_lo"),
        F.round(F.exp(F.log(orx) + Z95 * se), 6).alias("ci_hi"),
    )


@query(
    "q_g_test",
    oracle="""
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY lang, source
    ), marg AS (
      SELECT c.lang, c.source, c.o,
             SUM(c.o) OVER (PARTITION BY c.lang) AS r,
             SUM(c.o) OVER (PARTITION BY c.source) AS cl,
             SUM(c.o) OVER () AS n
      FROM cells c
    ), terms AS (
      SELECT n,
             CAST(o * ln(CAST(o AS DOUBLE) * n / (CAST(r AS DOUBLE) * cl))
                  AS DECIMAL(20,8)) AS term
      FROM marg
    ), dims AS (
      SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS nr,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS nc
      FROM cells
    )
    SELECT CAST(MAX(t.n) AS BIGINT) AS n_docs,
           CAST((SELECT (nr - 1) * (nc - 1) FROM dims) AS BIGINT) AS df,
           round(2.0 * CAST(SUM(t.term) AS DOUBLE), 6) AS g_stat
    FROM terms t
    """,
)
def q_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (log-likelihood ratio) of lang × source independence on
    the documents table: G = 2·Σ O·ln(O·N/(R·C)) — the additive
    companion to q_chi2_independence. Each cell's transcendental term
    quantizes to DECIMAL(20,8) before the exact associative sum (the
    q_unigram_logprob idiom — the cell set is data-dependent, so a
    literal pivot can't fix the order); marginals are window sums on
    the bounded cell table."""
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    marg = cells.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(Window.partitionBy("lang")).alias("r"),
        F.sum("o").over(Window.partitionBy("source")).alias("cl"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    term = (
        F.col("o")
        * F.log(F.col("o").cast("double") * F.col("n") / (F.col("r").cast("double") * F.col("cl")))
    ).cast("decimal(20,8)")
    terms = marg.select("n", term.alias("term"))
    dims = cells.agg(
        F.countDistinct("lang").alias("nr"), F.countDistinct("source").alias("nc")
    )
    return (
        terms.agg(
            F.max("n").cast("bigint").alias("n_docs"),
            F.round(2.0 * F.sum("term").cast("double"), 6).alias("g_stat"),
        )
        .join(F.broadcast(dims))
        .select(
            "n_docs",
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("df"),
            "g_stat",
        )
    )


@query(
    "q_durbin_watson",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), st AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s
      FROM daily GROUP BY event_type
    ), e AS (
      SELECT d.event_type, d.day,
             CAST(CAST(st.n AS DECIMAL(6,0)) * CAST(d.v AS DECIMAL(14,4))
                  - CAST(st.s AS DECIMAL(16,4)) AS DECIMAL(18,4)) AS ee,
             st.n
      FROM daily d JOIN st ON st.event_type = d.event_type
    ), lagd AS (
      SELECT event_type, n, ee,
             lag(ee) OVER (PARTITION BY event_type ORDER BY day) AS pe
      FROM e
    )
    SELECT event_type, MAX(n) AS n_days,
           round(CAST(CAST(SUM(CAST(ee - pe AS DECIMAL(19,4)) * (ee - pe))
                           AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(SUM(CAST(ee AS DECIMAL(19,4)) * ee)
                             AS VARCHAR) AS DOUBLE), 6) AS dw
    FROM lagd GROUP BY event_type
    """,
)
def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson serial-correlation statistic of each event
    type's mean-centered daily level series: DW = Σ(e_t − e_{t−1})² /
    Σe_t², e = deviations from the series mean. The centering is kept
    EXACT by scaling (e'_t = n·v_t − S in DECIMAL — DW is invariant
    to the n× scale), both sums are exact DECIMAL, and the single
    float op is the final bridged division. DW ≈ 2 means no lag-1
    correlation; < 2 positive, > 2 negative. NULL lag rows (each
    series' first day) drop out of the numerator on both engines."""
    daily = _daily(spark, sf_dir)
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("v").alias("s")
    )
    e = daily.join(st, "event_type").select(
        "event_type",
        "day",
        (
            F.col("n").cast("decimal(6,0)") * F.col("v").cast("decimal(14,4)")
            - F.col("s").cast("decimal(16,4)")
        )
        .cast("decimal(18,4)")
        .alias("ee"),
        "n",
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagd = e.select(
        "event_type", "n", "ee", F.lag("ee").over(w).alias("pe")
    )
    return lagd.groupBy("event_type").agg(
        F.max("n").alias("n_days"),
        F.round(
            F.sum((F.col("ee") - F.col("pe")) * (F.col("ee") - F.col("pe")))
            .cast("double")
            / F.sum(F.col("ee") * F.col("ee")).cast("double"),
            6,
        ).alias("dw"),
    )


@query(
    "q_cox_stuart",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), idx AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ), paired AS (
      SELECT a.event_type,
             CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS pos,
             CASE WHEN b.v < a.v THEN 1 ELSE 0 END AS neg
      FROM idx a
      JOIN idx b ON b.event_type = a.event_type
                AND b.i = a.i + a.n // 2
      WHERE a.i <= a.n // 2
    )
    SELECT event_type,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(neg) AS BIGINT) AS n_neg,
           round((2.0 * SUM(pos) - (SUM(pos) + SUM(neg)))
                 / sqrt(CAST(SUM(pos) + SUM(neg) AS DOUBLE)), 6) AS z
    FROM paired GROUP BY event_type
    """,
)
def q_cox_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox–Stuart trend sign test per event type: pair each of the
    first ⌊n/2⌋ daily levels with its opposite-half partner (i,
    i+⌊n/2⌋), count increases vs decreases (ties drop), and report
    the normal-approximation z = (2·pos − m)/√m. All counting is
    exact integer on exact DECIMAL daily levels; the pair join is a
    self-equi-join on the bounded |types|×days table."""
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    idx = daily.select(
        "event_type",
        "v",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    a = idx.select(
        F.col("event_type").alias("t"), F.col("v").alias("va"),
        F.col("i").alias("ia"), F.col("n").alias("na"),
    ).filter(F.col("ia") <= F.floor(F.col("na") / 2))
    b = idx.select(
        F.col("event_type").alias("tb"), F.col("v").alias("vb"),
        F.col("i").alias("ib"),
    )
    paired = a.join(
        b,
        (F.col("t") == F.col("tb"))
        & (F.col("ib") == F.col("ia") + F.floor(F.col("na") / 2)),
    ).select(
        F.col("t").alias("event_type"),
        F.when(F.col("vb") > F.col("va"), 1).otherwise(0).alias("pos"),
        F.when(F.col("vb") < F.col("va"), 1).otherwise(0).alias("neg"),
    )
    m = F.sum("pos") + F.sum("neg")
    return paired.groupBy("event_type").agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum("neg").cast("bigint").alias("n_neg"),
        F.round(
            (2.0 * F.sum("pos") - m) / F.sqrt(m.cast("double")), 6
        ).alias("z"),
    )


@query(
    "q_theils_u1",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), lagd AS (
      SELECT event_type, CAST(v AS DECIMAL(14,4)) AS v,
             lag(CAST(v AS DECIMAL(14,4)))
               OVER (PARTITION BY event_type ORDER BY day) AS p
      FROM daily
    ), sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM((v - p) * (v - p)) AS VARCHAR) AS DOUBLE) AS sd,
             CAST(CAST(SUM(v * v) AS VARCHAR) AS DOUBLE) AS sa,
             CAST(CAST(SUM(p * p) AS VARCHAR) AS DOUBLE) AS sp
      FROM lagd WHERE p IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n AS n_pairs,
           round(sqrt(sd / n) / (sqrt(sa / n) + sqrt(sp / n)), 6) AS u1
    FROM sums
    """,
)
def q_theils_u1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U1 inequality coefficient of the naive lag-1 forecast
    on each event type's daily levels: U1 = RMS(a−p) / (RMS(a) +
    RMS(p)) with p_t = a_{t−1} — 0 is a perfect forecast, 1 maximal
    inequality; the standard quick read of how forecastable a series
    is before fitting anything. Squared terms are exact DECIMAL
    products of the exact daily levels; the three sums bridge to
    double once and the flat sqrt expression is written identically
    in both engines."""
    daily = _daily(spark, sf_dir).select(
        "event_type", "day", F.col("v").cast("decimal(14,4)").alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagd = daily.select(
        "event_type", "v", F.lag("v").over(w).alias("p")
    ).filter(F.col("p").isNotNull())
    sums = lagd.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("v") - F.col("p")) * (F.col("v") - F.col("p")))
        .cast("double")
        .alias("sd"),
        F.sum(F.col("v") * F.col("v")).cast("double").alias("sa"),
        F.sum(F.col("p") * F.col("p")).cast("double").alias("sp"),
    )
    return sums.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        F.round(
            F.sqrt(F.col("sd") / F.col("n"))
            / (F.sqrt(F.col("sa") / F.col("n")) + F.sqrt(F.col("sp") / F.col("n"))),
            6,
        ).alias("u1"),
    )


# ordinal bands for gamma: hour-of-day quarter × literal value band
GAMMA_VALUE_BANDS = (50.0, 100.0, 200.0)  # 4 ordinal value levels


@query(
    "q_goodman_kruskal_gamma",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(EXTRACT(hour FROM ts) // 6 AS BIGINT) AS x,
             CASE WHEN value <= {GAMMA_VALUE_BANDS[0]!r} THEN 0
                  WHEN value <= {GAMMA_VALUE_BANDS[1]!r} THEN 1
                  WHEN value <= {GAMMA_VALUE_BANDS[2]!r} THEN 2
                  ELSE 3 END AS y,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT SUM(CASE WHEN b.x > a.x AND b.y > a.y THEN a.c * b.c ELSE 0 END)
               AS conc,
             SUM(CASE WHEN b.x > a.x AND b.y < a.y THEN a.c * b.c ELSE 0 END)
               AS disc
      FROM cells a JOIN cells b ON true
    )
    SELECT CAST(conc AS BIGINT) AS c_pairs,
           CAST(disc AS BIGINT) AS d_pairs,
           round(CAST(conc - disc AS DOUBLE) / (conc + disc), 6) AS gamma
    FROM pairs
    """,
)
def q_goodman_kruskal_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman–Kruskal gamma between two ordinal codings of every
    event — hour-of-day quarter (0–3) × literal value band (0–3,
    cuts {GAMMA_VALUE_BANDS}): γ = (C − D)/(C + D) over concordant/
    discordant pairs, ties excluded. The corpus reduces to a ≤4×4
    integer cell table in one pass; the pair census is an exact
    integer product sum over the bounded cell×cell cross (16×16
    rows, broadcast)."""
    ev = load_table(spark, sf_dir, "events")
    y = (
        F.when(F.col("value") <= GAMMA_VALUE_BANDS[0], 0)
        .when(F.col("value") <= GAMMA_VALUE_BANDS[1], 1)
        .when(F.col("value") <= GAMMA_VALUE_BANDS[2], 2)
        .otherwise(3)
    )
    cells = ev.groupBy(
        F.floor(F.hour("ts") / 6).cast("bigint").alias("x"), y.alias("y")
    ).agg(F.count(F.lit(1)).alias("c"))
    a = cells.select(
        F.col("x").alias("xa"), F.col("y").alias("ya"), F.col("c").alias("ca")
    )
    b = cells.select(
        F.col("x").alias("xb"), F.col("y").alias("yb"), F.col("c").alias("cb")
    )
    pairs = a.join(F.broadcast(b)).agg(
        F.sum(
            F.when(
                (F.col("xb") > F.col("xa")) & (F.col("yb") > F.col("ya")),
                F.col("ca") * F.col("cb"),
            ).otherwise(0)
        ).alias("conc"),
        F.sum(
            F.when(
                (F.col("xb") > F.col("xa")) & (F.col("yb") < F.col("ya")),
                F.col("ca") * F.col("cb"),
            ).otherwise(0)
        ).alias("disc"),
    )
    return pairs.select(
        F.col("conc").cast("bigint").alias("c_pairs"),
        F.col("disc").cast("bigint").alias("d_pairs"),
        F.round(
            (F.col("conc") - F.col("disc")).cast("double")
            / (F.col("conc") + F.col("disc")),
            6,
        ).alias("gamma"),
    )
