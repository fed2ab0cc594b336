"""Round-11 statistics (promoted into load_all()'s round-11 tail —
written in round 10, held out of the registry to respect the
driver's ~50-slot drain): Kendall's tau-b
(Kendall, Biometrika 1945 — the tie-corrected square-table sibling
of round-10's Stuart tau-c), the Quade test (Quade, JASA 1979 — the
range-weighted Friedman refinement), the point-biserial correlation
(the Pearson r of a binary × continuous pair), and the first-order
partial correlation r_xy·z (Yule 1907) between daily event-type
levels.

Exactness: tau-b reuses analytics13's exact pair census — one sqrt
of exact-integer products; Quade keeps everything integral with the
DOUBLED-midrank discipline twice over (within-day treatment ranks
AND across-day range ranks: S2 = Q2·(dr − (k+1)) is 4× the textbook
S, and the ×16 cancels in F = (b−1)·ΣT2²/(b·A2 − ΣT2²)); the
point-biserial and Pearson building blocks use DECIMAL(14,4)
products (exact, Spark-precision-safe) whose sums cross to double
once via the VARCHAR bridge into identically-parenthesized flat
expressions.

Scale shape: everything reduces first — the ≤4×4 ordinal cell
table, |days|×k daily levels, or a (user, day) unit table — then
bounded-table arithmetic. Ranks only ever sort k-row day slices or
the ~|days|-row range table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.analytics8 import _DAILY_SQL, EVENT_TYPES, _daily
from timestream_travel_spark.operators.analytics13 import (
    _CELLS_SQL,
    _PAIRS_SQL,
    _gamma_cells,
    _pair_census,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# the partial-correlation triple: x, y, conditioned on z
PC_X, PC_Y, PC_Z = "click", "view", "purchase"


@query(
    "q_kendall_tau_b",
    oracle=f"""
    WITH {_CELLS_SQL},
    {_PAIRS_SQL}
    SELECT CAST(conc AS BIGINT) AS c_pairs,
           CAST(disc AS BIGINT) AS d_pairs,
           CAST(ty AS BIGINT) AS ty_pairs,
           CAST(tx AS BIGINT) AS tx_pairs,
           round(CAST(conc - disc AS DOUBLE)
                 / sqrt(CAST(conc + disc + tx AS DOUBLE)
                        * CAST(conc + disc + ty AS DOUBLE)), 6) AS tau_b
    FROM pairs
    """,
)
def q_kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b for the gamma ordinal pair:
    τ_b = (C−D)/√((C+D+T_x)(C+D+T_y)) — the tie-corrected symmetric
    form between gamma (drops ties) and tau-c (rectangular-table
    correction). Same exact pair census as q_somers_d; one sqrt of
    exact-integer products."""
    p = _pair_census(_gamma_cells(spark, sf_dir))
    cd = F.col("conc") - F.col("disc")
    base = F.col("conc") + F.col("disc")
    return p.select(
        F.col("conc").cast("bigint").alias("c_pairs"),
        F.col("disc").cast("bigint").alias("d_pairs"),
        F.col("ty").cast("bigint").alias("ty_pairs"),
        F.col("tx").cast("bigint").alias("tx_pairs"),
        F.round(
            cd.cast("double")
            / F.sqrt(
                (base + F.col("tx")).cast("double")
                * (base + F.col("ty")).cast("double")
            ),
            6,
        ).alias("tau_b"),
    )


@query(
    "q_quade_test",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), full_days AS (
      SELECT day FROM daily GROUP BY day HAVING COUNT(*) = {len(EVENT_TYPES)}
    ), ranked AS (
      SELECT d.t, d.day, d.v,
             2 * RANK() OVER (PARTITION BY d.day ORDER BY d.v)
               + CAST(COUNT(*) OVER (PARTITION BY d.day, d.v) AS BIGINT)
               - 1 AS dr
      FROM daily d JOIN full_days f ON f.day = d.day
    ), ranges AS (
      SELECT day, MAX(v) - MIN(v) AS rg FROM ranked GROUP BY day
    ), qrank AS (
      SELECT day,
             2 * RANK() OVER (ORDER BY rg)
               + CAST(COUNT(*) OVER (PARTITION BY rg) AS BIGINT) - 1 AS q2
      FROM ranges
    ), s AS (
      SELECT r.t, q.q2 * (r.dr - {len(EVENT_TYPES) + 1}) AS s2
      FROM ranked r JOIN qrank q ON q.day = r.day
    ), t2 AS (
      SELECT t, CAST(SUM(s2) AS BIGINT) AS t2j,
             CAST(COUNT(*) AS BIGINT) AS b
      FROM s GROUP BY t
    ), agg AS (
      SELECT CAST(SUM(t2j * t2j) AS HUGEINT) AS bsum, MAX(b) AS b,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM t2
    ), a2 AS (
      SELECT CAST(SUM(s2 * s2) AS HUGEINT) AS asum FROM s
    )
    SELECT b AS n_blocks, k,
           round((b - 1) * CAST(bsum AS DOUBLE)
                 / (b * CAST(asum AS DOUBLE) - CAST(bsum AS DOUBLE)), 6)
             AS quade_f
    FROM agg CROSS JOIN a2
    """,
)
def q_quade_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Quade test over complete days × the {len(EVENT_TYPES)}
    event types: Friedman weighted by how much each block
    discriminates — blocks are ranked by their value RANGE, and
    S_ij = Q_i·(r_ij − (k+1)/2) feeds F = (b−1)B/(A−B). DOUBLED
    midranks on both rank layers keep S2 = Q2·(dr − (k+1)) = 4S
    integral (ties included), and the common ×16 cancels in the
    final ratio F = (b−1)·ΣT2²/(b·A2 − ΣT2²) — exact integers until
    one flat division. ΣT2² can reach ~(2bk²·2b)² ≈ 10¹³ per term
    squared — Spark sums in BIGINT-safe range at fixture spans and
    the oracle widens to HUGEINT to be explicit."""
    # r16: both doubled-midrank layers (within-day treatment ranks,
    # cross-day range ranks) run driver-side over the collected daily
    # spine (rank_kit; exact Decimal comparisons, integer S2 sums);
    # the F composition below is unchanged Spark expressions.
    from timestream_travel_spark.operators.rank_kit import daily_rows
    from timestream_travel_spark.tables import bounded_df

    k = len(EVENT_TYPES)
    complete = {
        day: rows_
        for day, rows_ in daily_rows(spark, sf_dir).items()
        if len(rows_) == k
    }
    rgs = sorted(max(v for _, v in r_) - min(v for _, v in r_)
                 for r_ in complete.values())
    t2j: dict[str, int] = {}
    nblocks = len(complete)
    asum = 0
    for day, rows_ in complete.items():
        rg = max(v for _, v in rows_) - min(v for _, v in rows_)
        q2 = 2 * (rgs.index(rg) + 1) + rgs.count(rg) - 1
        vals = sorted(v for _, v in rows_)
        for t, v in rows_:
            dr = 2 * (vals.index(v) + 1) + vals.count(v) - 1
            s2 = q2 * (dr - (k + 1))
            t2j[t] = t2j.get(t, 0) + s2
            asum += s2 * s2
    row = (
        (
            sum(s * s for s in t2j.values()),
            nblocks,
            len(t2j),
            asum,
        )
        if t2j
        else (None, None, 0, None)
    )
    agg = bounded_df(
        spark, [row], "bsum bigint, b bigint, k bigint, asum bigint"
    )
    return agg.select(
        F.col("b").alias("n_blocks"),
        "k",
        F.round(
            (F.col("b") - 1)
            * F.col("bsum").cast("double")
            / (
                F.col("b") * F.col("asum").cast("double")
                - F.col("bsum").cast("double")
            ),
            6,
        ).alias("quade_f"),
    )


@query(
    "q_point_biserial",
    oracle="""
    WITH units AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS g,
             SUM(CAST(value AS DECIMAL(14,4))) AS x
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(g) AS BIGINT) AS n1,
             CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CASE WHEN g = 1 THEN x ELSE CAST(0 AS DECIMAL(14,4))
                          END) AS VARCHAR) AS DOUBLE) AS s1
      FROM units
    )
    SELECT n AS n_units, n1 AS n_pos,
           round((s1 / n1 - (sx - s1) / (n - n1))
                 / sqrt(sxx / n - (sx / n) * (sx / n))
                 * sqrt((CAST(n1 AS DOUBLE) * (n - n1)) / (CAST(n AS DOUBLE) * n)),
                 6) AS r_pb
    FROM sums WHERE n1 > 0 AND n1 < n
    """,
)
def q_point_biserial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-biserial correlation between 'the user clicked that day'
    (binary, the kappa unit grid) and the unit's total event value
    (continuous): r_pb = (M₁−M₀)/σ_n · √(n₁n₀/n²). The sufficient
    statistics are exact DECIMAL(14,4) sums (x·x products stay
    well inside Spark's 38-digit cap) bridged to double once; the
    formula is a single flat expression with identical
    parenthesization. Degenerate all-or-nothing days guard on both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    units = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("g"),
        F.sum(F.col("value").cast("decimal(14,4)")).alias("x"),
    )
    zero = F.lit(0).cast("decimal(14,4)")
    sums = units.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("n1"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.when(F.col("g") == 1, F.col("x")).otherwise(zero))
        .cast("double")
        .alias("s1"),
    )
    n, n1 = F.col("n"), F.col("n1")
    sx, sxx, s1 = F.col("sx"), F.col("sxx"), F.col("s1")
    r_pb = (
        (s1 / n1 - (sx - s1) / (n - n1))
        / F.sqrt(sxx / n - (sx / n) * (sx / n))
        * F.sqrt((n1.cast("double") * (n - n1)) / (n.cast("double") * n))
    )
    return sums.filter((n1 > 0) & (n1 < n)).select(
        n.alias("n_units"), n1.alias("n_pos"), F.round(r_pb, 6).alias("r_pb")
    )


def _pearson_sql(a: str, b: str) -> str:
    """Flat SQL Pearson r between two event types' daily levels over
    the shared complete-day grid (CTE `wide` provides x_/y_/z_)."""
    return f"""(n * {a}{b} - {a}_s * {b}_s)
        / sqrt((n * {a}{a} - {a}_s * {a}_s) * (n * {b}{b} - {b}_s * {b}_s))"""


@query(
    "q_partial_corr",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), full_days AS (
      SELECT day FROM daily WHERE t IN ('{PC_X}', '{PC_Y}', '{PC_Z}')
      GROUP BY day HAVING COUNT(*) = 3
    ), wide AS (
      SELECT d.day,
             MAX(CASE WHEN t = '{PC_X}' THEN v END) AS x,
             MAX(CASE WHEN t = '{PC_Y}' THEN v END) AS y,
             MAX(CASE WHEN t = '{PC_Z}' THEN v END) AS z
      FROM daily d JOIN full_days f ON f.day = d.day
      WHERE t IN ('{PC_X}', '{PC_Y}', '{PC_Z}')
      GROUP BY d.day
    ), sums AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(x AS DECIMAL(14,4))) AS VARCHAR) AS DOUBLE) AS x_s,
             CAST(CAST(SUM(CAST(y AS DECIMAL(14,4))) AS VARCHAR) AS DOUBLE) AS y_s,
             CAST(CAST(SUM(CAST(z AS DECIMAL(14,4))) AS VARCHAR) AS DOUBLE) AS z_s,
             CAST(CAST(SUM(CAST(x AS DECIMAL(14,4)) * CAST(x AS DECIMAL(14,4)))
                  AS VARCHAR) AS DOUBLE) AS xx,
             CAST(CAST(SUM(CAST(y AS DECIMAL(14,4)) * CAST(y AS DECIMAL(14,4)))
                  AS VARCHAR) AS DOUBLE) AS yy,
             CAST(CAST(SUM(CAST(z AS DECIMAL(14,4)) * CAST(z AS DECIMAL(14,4)))
                  AS VARCHAR) AS DOUBLE) AS zz,
             CAST(CAST(SUM(CAST(x AS DECIMAL(14,4)) * CAST(y AS DECIMAL(14,4)))
                  AS VARCHAR) AS DOUBLE) AS xy,
             CAST(CAST(SUM(CAST(x AS DECIMAL(14,4)) * CAST(z AS DECIMAL(14,4)))
                  AS VARCHAR) AS DOUBLE) AS xz,
             CAST(CAST(SUM(CAST(y AS DECIMAL(14,4)) * CAST(z AS DECIMAL(14,4)))
                  AS VARCHAR) AS DOUBLE) AS yz
      FROM wide
    ), r AS (
      SELECT n,
             {_pearson_sql("x", "y")} AS rxy,
             {_pearson_sql("x", "z")} AS rxz,
             {_pearson_sql("y", "z")} AS ryz
      FROM sums
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
           round(ryz, 6) AS r_yz,
           round((rxy - rxz * ryz)
                 / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6) AS r_xy_z
    FROM r
    """,
)
def q_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation between {PC_X!r} and {PC_Y!r}
    daily levels controlling for {PC_Z!r}:
    r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)). The three
    Pearson r's share ONE complete-day grid (days where all three
    series exist), each assembled from exact DECIMAL(14,4) sums
    bridged to double once, then the flat composition — every
    operation identically ordered in both engines."""
    daily = _daily(spark, sf_dir).filter(F.col("t").isin(PC_X, PC_Y, PC_Z))
    full_days = daily.groupBy("day").count().filter(F.col("count") == 3).select("day")
    dec = lambda c: F.col(c).cast("decimal(14,4)")  # noqa: E731
    wide = (
        daily.join(full_days, "day")
        .groupBy("day")
        .agg(
            F.max(F.when(F.col("t") == PC_X, F.col("v"))).alias("x"),
            F.max(F.when(F.col("t") == PC_Y, F.col("v"))).alias("y"),
            F.max(F.when(F.col("t") == PC_Z, F.col("v"))).alias("z"),
        )
    )
    sums = wide.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec("x")).cast("double").alias("x_s"),
        F.sum(dec("y")).cast("double").alias("y_s"),
        F.sum(dec("z")).cast("double").alias("z_s"),
        F.sum(dec("x") * dec("x")).cast("double").alias("xx"),
        F.sum(dec("y") * dec("y")).cast("double").alias("yy"),
        F.sum(dec("z") * dec("z")).cast("double").alias("zz"),
        F.sum(dec("x") * dec("y")).cast("double").alias("xy"),
        F.sum(dec("x") * dec("z")).cast("double").alias("xz"),
        F.sum(dec("y") * dec("z")).cast("double").alias("yz"),
    )

    def pear(ab: str, a: str, b: str):
        return (
            F.col("n") * F.col(ab) - F.col(f"{a}_s") * F.col(f"{b}_s")
        ) / F.sqrt(
            (F.col("n") * F.col(a + a) - F.col(f"{a}_s") * F.col(f"{a}_s"))
            * (F.col("n") * F.col(b + b) - F.col(f"{b}_s") * F.col(f"{b}_s"))
        )

    r = sums.select(
        "n",
        pear("xy", "x", "y").alias("rxy"),
        pear("xz", "x", "z").alias("rxz"),
        pear("yz", "y", "z").alias("ryz"),
    )
    return r.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round("rxy", 6).alias("r_xy"),
        F.round("rxz", 6).alias("r_xz"),
        F.round("ryz", 6).alias("r_yz"),
        F.round(
            (F.col("rxy") - F.col("rxz") * F.col("ryz"))
            / F.sqrt(
                (F.lit(1.0) - F.col("rxz") * F.col("rxz"))
                * (F.lit(1.0) - F.col("ryz") * F.col("ryz"))
            ),
            6,
        ).alias("r_xy_z"),
    )
