"""Analytics (promoted into load_all()'s round-13 tail): the scale/location rank tests and the
heteroscedastic ANOVA that complete the k-sample family — Conover's
squared-ranks test for scale (Conover & Iman, Commun. Stat. 1978),
the Cucconi scale-location test (Cucconi, Giorn. Econom. 1968 — the
two-in-one rank test predating Lepage), and Welch's heteroscedastic
one-way ANOVA (Welch, Biometrika 1951) beside the already-green
classic ANOVA F / Levene / Welch-t.

Exactness design (the analytics19/20 discipline):
- Conover ranks |deviation from OWN group mean| across the merged
  pair sample with the means SCALED OUT: comparing |n_a·x − S_a|/n_a
  against |n_b·y − S_b|/n_b cross-multiplies to the exact decimals
  D_a = |n_a·x − S_a|·n_b vs D_b = |n_b·y − S_b|·n_a, so the rank
  table never divides; doubled midranks keep scores integral and the
  quartic permutation moment rides DECIMAL(38,0)/HUGEINT (the
  q_mood_scale_test machinery verbatim);
- Cucconi's U (squared ranks) and V (squared CONTRARY ranks) use the
  same doubled midranks: Σ(2R)² and Σ(2(N+1)−2R)² are exact
  integers, ρ and the final C are flat double compositions;
- Welch pivots the per-type exact sufficient statistics (n, Σx, Σx²
  as DECIMALs) into EVENT_TYPES literal columns and left-associates
  every k-group float sum (the analytics8 _chain_add idiom), so both
  engines add in the same order.

Scale shape: one (type, value) count reduce per query; everything
after runs on the value-domain-bounded tables and the |types|² pair
fan-out (analytics5's boundedness argument).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.analytics5 import _CNT_SQL, _counts, _pair_grid
from timestream_travel_spark.operators.analytics8 import EVENT_TYPES, _chain_add
from timestream_travel_spark.registry import query


# --------------------------------------------- Conover squared ranks
_CONOVER_SQL = f"""
    WITH cnt AS ({_CNT_SQL}
    ), st AS (
      SELECT t, CAST(SUM(c) AS BIGINT) AS n,
             SUM(c * CAST(v AS DECIMAL(20,4))) AS s
      FROM cnt GROUP BY t
    ), pairs AS (
      SELECT a.t AS ta, b.t AS tb, a.n AS n_a, b.n AS n_b,
             a.s AS s_a, b.s AS s_b
      FROM st a JOIN st b ON a.t < b.t
    ), dev AS (
      SELECT p.ta, p.tb, p.n_a, p.n_b,
             CASE WHEN c.t = p.ta
                  THEN abs(p.n_a * CAST(c.v AS DECIMAL(20,4)) - p.s_a) * p.n_b
                  ELSE abs(p.n_b * CAST(c.v AS DECIMAL(20,4)) - p.s_b) * p.n_a
             END AS dv,
             SUM(CASE WHEN c.t = p.ta THEN c.c ELSE 0 END) AS ca,
             SUM(CASE WHEN c.t = p.tb THEN c.c ELSE 0 END) AS cb
      FROM pairs p JOIN cnt c ON c.t = p.ta OR c.t = p.tb
      GROUP BY 1, 2, 3, 4, 5
    ), merged AS (
      SELECT ta, tb, n_a, n_b, dv, SUM(ca) AS ca, SUM(cb) AS cb
      FROM dev GROUP BY ta, tb, n_a, n_b, dv
    ), ranks AS (
      SELECT ta, tb, n_a, n_b, ca, cb,
             2 * (SUM(ca + cb) OVER w) - (ca + cb) + 1 AS r2
      FROM merged
      WINDOW w AS (PARTITION BY ta, tb ORDER BY dv ROWS UNBOUNDED PRECEDING)
    ), agg AS (
      SELECT ta, tb, n_a, n_b,
             SUM(CAST(ca AS HUGEINT) * r2 * r2) AS t1,
             SUM(CAST(ca + cb AS HUGEINT) * r2 * r2) AS sa,
             SUM(CAST(ca + cb AS HUGEINT) * r2 * r2 * r2 * r2) AS sa2
      FROM ranks GROUP BY ta, tb, n_a, n_b
    )
"""


@query(
    "q_conover_squared_ranks",
    oracle=f"""{_CONOVER_SQL}
    SELECT ta AS type_a, tb AS type_b, n_a, n_b,
           round((CAST(CAST(t1 AS VARCHAR) AS DOUBLE)
                  - n_a * CAST(CAST(sa AS VARCHAR) AS DOUBLE)
                    / (n_a + n_b))
                 / sqrt(CAST(n_a AS DOUBLE) * n_b
                        / ((n_a + n_b) * (n_a + n_b - 1.0))
                        * (CAST(CAST(sa2 AS VARCHAR) AS DOUBLE)
                           - CAST(CAST(sa AS VARCHAR) AS DOUBLE)
                             * CAST(CAST(sa AS VARCHAR) AS DOUBLE)
                             / (n_a + n_b))), 6) AS z_conover
    FROM agg
    """,
)
def q_conover_squared_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conover's squared-ranks scale test for every event-type pair:
    rank |x − x̄(own group)| in the merged sample (means scaled out —
    module docstring), T = Σ_a R², standardized by the exact
    permutation moments. Doubled midranks; the statistic is one flat
    double expression over five VARCHAR-bridged exact aggregates
    (z invariant to the common ×2 rank scale)."""
    # r16: the deviation-rank census runs driver-side over the
    # collected counts spine (rank_kit) — dv = |n·v4 − S|·n_other is
    # an exact scale-4 integer, the quartic moments are Python ints
    # (the HUGEINT/DECIMAL(38,0) widenings by construction); the z
    # composition below is unchanged Spark expressions.
    from decimal import ROUND_HALF_UP, Decimal

    from timestream_travel_spark.operators.rank_kit import (
        counts_by_type,
        doubled_midranks,
        type_pairs,
    )
    from timestream_travel_spark.tables import bounded_df

    kit = counts_by_type(spark, sf_dir)
    q4 = Decimal("1e-4")

    def v4_of(x: float) -> int:
        return int(Decimal(repr(x)).quantize(q4, ROUND_HALF_UP).scaleb(4))

    rows = []
    import numpy as np

    for ta, tb in type_pairs(kit):
        va, ca = kit[ta]
        vb, cb = kit[tb]
        n_a, n_b = int(ca.sum()), int(cb.sum())
        s_a = sum(k * v4_of(x) for x, k in zip(va.tolist(), ca.tolist()))
        s_b = sum(k * v4_of(x) for x, k in zip(vb.tolist(), cb.tolist()))
        grid: dict[int, list[int]] = {}
        for x, k in zip(va.tolist(), ca.tolist()):
            dv = abs(n_a * v4_of(x) - s_a) * n_b
            grid.setdefault(dv, [0, 0])[0] += k
        for x, k in zip(vb.tolist(), cb.tolist()):
            dv = abs(n_b * v4_of(x) - s_b) * n_a
            grid.setdefault(dv, [0, 0])[1] += k
        dvs = sorted(grid)
        ga = np.array([grid[d][0] for d in dvs], dtype=np.int64)
        gb = np.array([grid[d][1] for d in dvs], dtype=np.int64)
        r2 = doubled_midranks(ga + gb)
        t1 = sa = sa2 = 0
        for a_, c_, r_ in zip(ga.tolist(), (ga + gb).tolist(), r2.tolist()):
            r2sq = r_ * r_
            t1 += a_ * r2sq
            sa += c_ * r2sq
            sa2 += c_ * r2sq * r2sq
        rows.append((ta, tb, n_a, n_b, Decimal(t1), Decimal(sa), Decimal(sa2)))
    agg = bounded_df(
        spark,
        rows,
        "ta string, tb string, n_a bigint, n_b bigint,"
        " t1 decimal(38,0), sa decimal(38,0), sa2 decimal(38,0)",
    )
    dbl = lambda name: F.col(name).cast("double")  # noqa: E731
    nn = F.col("n_a") + F.col("n_b")
    return agg.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        "n_a",
        "n_b",
        F.round(
            (dbl("t1") - F.col("n_a") * dbl("sa") / nn)
            / F.sqrt(
                F.col("n_a").cast("double")
                * F.col("n_b")
                / (nn * (nn - F.lit(1.0)))
                * (dbl("sa2") - dbl("sa") * dbl("sa") / nn)
            ),
            6,
        ).alias("z_conover"),
    )


# --------------------------------------------------------- Cucconi
_CUCCONI_SQL = f"""
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
    ), ranks AS (
      SELECT ta, tb, n_a, n_b, cb,
             2 * (SUM(ca + cb) OVER w) - (ca + cb) + 1 AS r2
      FROM merged
      WINDOW w AS (PARTITION BY ta, tb ORDER BY v ROWS UNBOUNDED PRECEDING)
    ), agg AS (
      SELECT ta, tb, n_a, n_b,
             SUM(CAST(cb AS HUGEINT) * r2 * r2) AS sr2,
             SUM(CAST(cb AS HUGEINT)
                 * (2 * (n_a + n_b + 1) - r2)
                 * (2 * (n_a + n_b + 1) - r2)) AS sc2
      FROM ranks GROUP BY ta, tb, n_a, n_b
    )
"""


@query(
    "q_cucconi_test",
    oracle=f"""{_CUCCONI_SQL}
    SELECT type_a, type_b, n_a, n_b, round(u_stat, 6) AS u_stat,
           round(v_stat, 6) AS v_stat,
           round((u_stat * u_stat + v_stat * v_stat
                  - 2.0 * rho * u_stat * v_stat)
                 / (2.0 * (1.0 - rho * rho)), 6) AS c_cucconi
    FROM (
      SELECT ta AS type_a, tb AS type_b, n_a, n_b,
             (6.0 * CAST(CAST(sr2 AS VARCHAR) AS DOUBLE) / 4.0
              - n_b * (n_a + n_b + 1.0) * (2 * (n_a + n_b) + 1.0))
             / sqrt(CAST(n_a AS DOUBLE) * n_b * (n_a + n_b + 1.0)
                    * (2 * (n_a + n_b) + 1.0)
                    * (8 * (n_a + n_b) + 11.0) / 5.0) AS u_stat,
             (6.0 * CAST(CAST(sc2 AS VARCHAR) AS DOUBLE) / 4.0
              - n_b * (n_a + n_b + 1.0) * (2 * (n_a + n_b) + 1.0))
             / sqrt(CAST(n_a AS DOUBLE) * n_b * (n_a + n_b + 1.0)
                    * (2 * (n_a + n_b) + 1.0)
                    * (8 * (n_a + n_b) + 11.0) / 5.0) AS v_stat,
             (2.0 * (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b) - 4.0))
             / ((2 * (n_a + n_b) + 1.0) * (8 * (n_a + n_b) + 11.0)) - 1.0
               AS rho
      FROM agg
    )
    """,
)
def q_cucconi_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cucconi's joint scale-location test for every event-type pair:
    U standardizes Σ_b R², V standardizes Σ_b (N+1−R)² (contrary
    ranks), C = (U² + V² − 2ρUV)/(2(1−ρ²)) with the exact
    ρ = 2(N²−4)/((2N+1)(8N+11)) − 1. Doubled midranks make both
    squared-rank sums exact integers (÷4 folded into the flat
    expressions); ties use midranks (the standard large-sample
    convention)."""
    # r16: squared-rank and contrary-rank sums driver-side over the
    # collected counts spine (rank_kit; exact Python-int census); the
    # U/V/C composition below is unchanged Spark expressions.
    from decimal import Decimal

    from timestream_travel_spark.operators.rank_kit import (
        counts_by_type,
        doubled_midranks,
        merged_pair,
        type_pairs,
    )
    from timestream_travel_spark.tables import bounded_df

    kit = counts_by_type(spark, sf_dir)
    rows = []
    for ta, tb in type_pairs(kit):
        _, ca, cb = merged_pair(kit, ta, tb)
        n_a, n_b = int(ca.sum()), int(cb.sum())
        r2 = doubled_midranks(ca + cb)
        sr2 = sc2 = 0
        for b_, r_ in zip(cb.tolist(), r2.tolist()):
            con = 2 * (n_a + n_b + 1) - r_
            sr2 += b_ * r_ * r_
            sc2 += b_ * con * con
        rows.append((ta, tb, n_a, n_b, Decimal(sr2), Decimal(sc2)))
    agg = bounded_df(
        spark,
        rows,
        "ta string, tb string, n_a bigint, n_b bigint,"
        " sr2 decimal(38,0), sc2 decimal(38,0)",
    )
    nn = (F.col("n_a") + F.col("n_b")).cast("double")
    denom = F.sqrt(
        F.col("n_a").cast("double")
        * F.col("n_b")
        * (nn + 1)
        * (2 * nn + 1)
        * (8 * nn + 11)
        / F.lit(5.0)
    )
    u = (
        F.lit(6.0) * F.col("sr2").cast("double") / F.lit(4.0)
        - F.col("n_b") * (nn + 1) * (2 * nn + 1)
    ) / denom
    v = (
        F.lit(6.0) * F.col("sc2").cast("double") / F.lit(4.0)
        - F.col("n_b") * (nn + 1) * (2 * nn + 1)
    ) / denom
    rho = (F.lit(2.0) * (nn * nn - 4)) / ((2 * nn + 1) * (8 * nn + 11)) - 1
    return agg.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        "n_a",
        "n_b",
        F.round(u, 6).alias("u_stat"),
        F.round(v, 6).alias("v_stat"),
        F.round(
            (u * u + v * v - 2 * rho * u * v) / (F.lit(2.0) * (1 - rho * rho)),
            6,
        ).alias("c_cucconi"),
    )


# ------------------------------------------------------ Welch ANOVA
_WA_PIVOT = ",\n             ".join(
    f"MAX(CASE WHEN t = '{t}' THEN n END) AS n_{t},"
    f" MAX(CASE WHEN t = '{t}' THEN sx END) AS s_{t},"
    f" MAX(CASE WHEN t = '{t}' THEN qx END) AS q_{t}"
    for t in EVENT_TYPES
)
_WA_W = " + ".join(f"w_{t}" for t in EVENT_TYPES)
_WA_WM = " + ".join(f"w_{t} * m_{t}" for t in EVENT_TYPES)
_K = len(EVENT_TYPES)


def _wa_sql() -> str:
    stats = ",\n             ".join(
        f"CAST(CAST(s_{t} AS VARCHAR) AS DOUBLE) / n_{t} AS m_{t},"
        f" n_{t} / ((CAST(CAST(q_{t} AS VARCHAR) AS DOUBLE)"
        f" - CAST(CAST(s_{t} AS VARCHAR) AS DOUBLE)"
        f" * CAST(CAST(s_{t} AS VARCHAR) AS DOUBLE) / n_{t})"
        f" / (n_{t} - 1)) AS w_{t}"
        for t in EVENT_TYPES
    )
    num = " + ".join(
        f"w_{t} * (m_{t} - grand) * (m_{t} - grand)" for t in EVENT_TYPES
    )
    lam = " + ".join(
        f"(1.0 - w_{t} / wsum) * (1.0 - w_{t} / wsum) / (n_{t} - 1)"
        for t in EVENT_TYPES
    )
    return f"""
    WITH cnt AS ({_CNT_SQL}
    ), st AS (
      SELECT t, CAST(SUM(c) AS BIGINT) AS n,
             SUM(c * CAST(v AS DECIMAL(20,4))) AS sx,
             SUM(c * CAST(v AS DECIMAL(12,4)) * CAST(v AS DECIMAL(12,4)))
               AS qx
      FROM cnt GROUP BY t
    ), piv AS (
      SELECT {_WA_PIVOT}
      FROM st
    ), ms AS (
      SELECT *,
             {stats}
      FROM piv
    ), gr AS (
      SELECT *, ({_WA_W}) AS wsum, ({_WA_WM}) / ({_WA_W}) AS grand FROM ms
    ), lam AS (
      SELECT *, ({lam}) AS lam_sum FROM gr
    )
    SELECT CAST({_K} AS INT) AS k,
           round(grand, 6) AS grand_mean,
           round((({num}) / {_K - 1})
                 / (1.0 + 2.0 * {_K - 2} * lam_sum / ({_K}.0 * {_K} - 1.0)),
                 6) AS f_welch,
           round(({_K}.0 * {_K} - 1.0) / (3.0 * lam_sum), 6) AS df2
    FROM lam
    """


@query("q_welch_anova", oracle=_wa_sql())
def q_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA across all
    {len(EVENT_TYPES)} event types: F* = Σwᵢ(mᵢ−ȳ)²/(k−1) /
    (1 + 2(k−2)Λ/(k²−1)), df₂ = (k²−1)/(3Λ), with wᵢ = nᵢ/sᵢ² and
    Λ = Σ(1−wᵢ/Σw)²/(nᵢ−1). Sufficient statistics (n, Σx, Σx²) are
    exact DECIMALs per type; the k-group composition pivots into
    EVENT_TYPES literal columns and left-associates every float sum
    (the analytics8 _chain_add idiom) so both engines add in the
    same order."""
    # r16: the exact (n, Σx, Σx²) sufficient statistics run
    # driver-side over the collected counts spine (rank_kit; scale-4
    # integer arithmetic, the DECIMAL twin); the pivoted float
    # composition below is unchanged Spark expressions.
    from decimal import ROUND_HALF_UP, Decimal

    from timestream_travel_spark.operators.rank_kit import counts_by_type
    from timestream_travel_spark.tables import bounded_df

    kit = counts_by_type(spark, sf_dir)
    q4 = Decimal("1e-4")
    vals = []
    schema = []
    for t in EVENT_TYPES:
        v, c = kit[t]
        n = int(c.sum())
        sx = qx = 0
        for x, k in zip(v.tolist(), c.tolist()):
            v4 = int(Decimal(repr(x)).quantize(q4, ROUND_HALF_UP).scaleb(4))
            sx += k * v4
            qx += k * v4 * v4
        vals.extend([n, Decimal(sx).scaleb(-4), Decimal(qx).scaleb(-8)])
        schema.extend(
            [f"n_{t} bigint", f"s_{t} decimal(38,4)", f"q_{t} decimal(38,8)"]
        )
    piv = bounded_df(spark, [tuple(vals)], ", ".join(schema))

    def m(t: str) -> Column:
        return F.col(f"s_{t}").cast("double") / F.col(f"n_{t}")

    def wgt(t: str) -> Column:
        s2 = (
            F.col(f"q_{t}").cast("double")
            - F.col(f"s_{t}").cast("double")
            * F.col(f"s_{t}").cast("double")
            / F.col(f"n_{t}")
        ) / (F.col(f"n_{t}") - 1)
        return F.col(f"n_{t}") / s2

    ms = piv.select(
        "*",
        *[m(t).alias(f"m_{t}") for t in EVENT_TYPES],
        *[wgt(t).alias(f"w_{t}") for t in EVENT_TYPES],
    )
    wsum = _chain_add([F.col(f"w_{t}") for t in EVENT_TYPES])
    wm = _chain_add([F.col(f"w_{t}") * F.col(f"m_{t}") for t in EVENT_TYPES])
    gr = ms.select("*", wsum.alias("wsum"), (wm / wsum).alias("grand"))
    num = _chain_add(
        [
            F.col(f"w_{t}")
            * (F.col(f"m_{t}") - F.col("grand"))
            * (F.col(f"m_{t}") - F.col("grand"))
            for t in EVENT_TYPES
        ]
    )
    lam = _chain_add(
        [
            (F.lit(1.0) - F.col(f"w_{t}") / F.col("wsum"))
            * (F.lit(1.0) - F.col(f"w_{t}") / F.col("wsum"))
            / (F.col(f"n_{t}") - 1)
            for t in EVENT_TYPES
        ]
    )
    k = _K
    return gr.select(
        F.lit(k).cast("int").alias("k"),
        F.round("grand", 6).alias("grand_mean"),
        F.round(
            (num / F.lit(float(k - 1)))
            / (
                F.lit(1.0)
                + F.lit(2.0) * F.lit(k - 2) * lam / F.lit(float(k * k - 1))
            ),
            6,
        ).alias("f_welch"),
        F.round(F.lit(float(k * k - 1)) / (F.lit(3.0) * lam), 6).alias("df2"),
    )
