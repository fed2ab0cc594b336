"""Graph analytics, part 15 (round 13): Brandes betweenness
centrality (Brandes, J. Math. Sociol. 2001) and exact fixed-point
PageRank (Brin & Page, WWW 1998) on the trade backbone — the two
classic centralities the r12 verdict scoped as the family's last
gaps (closeness/harmonic/eccentricity/Katz/k-truss landed in r12,
stress landed with this round's promotions).

Exactness conventions (both engines, identical integer ops only):

- Betweenness is a sum of short rationals σ_st(v)/σ_st — the
  documented double→DECIMAL quantization trap, and the reason the
  σ_st normalization needs a declared convention (VERDICT r12 #5).
  Convention here: each pair-dependency is TRUNCATED at {BET_SCALE}
  fixed-point — term(s,t,v) = (σ_sv·σ_vt·{BET_SCALE}) DIV σ_st, an
  exact integer in both engines (Spark `div`, DuckDB `//`; the
  dividend crosses into DECIMAL(38,0)/HUGEINT BEFORE the product, so
  nothing wraps int64). The emitted double is ONE flat division of
  the exact integer sum by {BET_SCALE}: the sum is < 2⁵³ (each term
  ≤ {BET_SCALE} because σ_sv·σ_vt ≤ σ_st; ≤ |V|²/2 < 400 pairs on
  the ≤25-node backbone → sum < 4·10¹⁴), so the int→double cast is
  exact and the division is IEEE correctly-rounded — bit-identical
  cross-engine with zero reliance on libm. The truncation understates
  true betweenness by < n_pairs·10⁻¹² (documented-rounding oracle,
  the Katz/q_ease_of_movement pattern); the pytest pins the gap
  against an exact-Fraction Brandes recompute.

- PageRank with damping d = 0.85 = 17/20 has 1/deg divisors, so the
  Katz scaled-integer trick (a single dyadic denominator) cannot
  stay exact (VERDICT r12 #7). Convention here: a TRUNCATED
  fixed-point iteration at scale {PR_SCALE} — every iterate is the
  BIGINT recurrence

      share(u)  = r(u) DIV deg(u)
      r'(v)     = (3·{PR_SCALE}) DIV (20·N)
                  + (17 · Σ_{{u∈N(v)}} share(u)) DIV 20

  (teleport (1−d)/N = 3/(20N); integer sums are order-independent,
  DIV is exact in both engines), unrolled {PR_ROUNDS} rounds. Each
  truncation loses < 1 unit = 10⁻¹² of mass per node per round, so
  the iterate sits within K·N·10⁻¹² of true PageRank — pinned by the
  pytest against an exact-Fraction recompute. The emitted double is
  one flat division of the exact scaled integer (< 2⁵³).

Scale shape: the heavy stage stays graph3's fact-table edge
extraction (100 TB of lineitem → ≤{TOP_EDGES}-edge backbone);
betweenness reuses graph13's σ DP (≤|V|² rows, localCheckpoint per
layer) with a ≤|V|³ bounded pair join; PageRank is {PR_ROUNDS}
synchronous rounds of a two-join superstep on the bounded backbone,
localCheckpoint per round (the graph8/9 iterative-lineage lesson).

Reference parity: none (cmd/backup.go has no graph surface) —
north-star derived capability; closes VERDICT r12 next-round #5/#7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.graph3 import (
    _TOP_EDGES_SQL,
    top_trade_edges,
)
from timestream_travel_spark.operators.graph12 import (
    _dist_sql,
    _distances,
    _sym,
)
from timestream_travel_spark.operators.graph13 import _sigma_sql, sigma_table
from timestream_travel_spark.registry import query

BET_SCALE = 10**12  # fixed-point scale of the truncated pair terms
PR_SCALE = 10**12  # fixed-point scale of the PageRank iterates
PR_ROUNDS = 8  # synchronous iterations (fixpoint-gap pytest-pinned)


@query(
    "q_betweenness_centrality",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    {_dist_sql()},
    {_sigma_sql()}
    SELECT x.v AS node,
           CAST(SUM((CAST(x.s AS HUGEINT) * y.s * {BET_SCALE}) // st.s)
                AS BIGINT) AS bet_scaled,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM((CAST(x.s AS HUGEINT) * y.s * {BET_SCALE}) // st.s)
                AS BIGINT) / CAST({BET_SCALE} AS DOUBLE) AS betweenness
    FROM sigma x
    JOIN sigma y ON y.v = x.v AND x.src < y.src
    JOIN sigma st ON st.src = x.src AND st.v = y.src
                 AND st.d = x.d + y.d
    WHERE x.v <> x.src AND x.v <> y.src
    GROUP BY x.v
    """,
)
def q_betweenness_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brandes betweenness per backbone node under the truncated
    fixed-point convention (module docstring): Σ_(s<t) of
    (σ_sv·σ_vt·SCALE) DIV σ_st over pairs with d(s,v)+d(v,t)=d(s,t),
    emitted as the exact integer and ONE flat double division.
    Nodes interior to no shortest path are absent (betweenness 0)."""
    sym = _sym(top_trade_edges(spark, sf_dir)).persist()
    dist = _distances(spark, sf_dir).persist()
    sigma = sigma_table(sym, dist)
    x = sigma.select(
        F.col("src").alias("xs"), F.col("v").alias("node"),
        F.col("d").alias("xd"), F.col("s").alias("xsig"),
    )
    y = sigma.select(
        F.col("src").alias("ys"), F.col("v").alias("ynode"),
        F.col("d").alias("yd"), F.col("s").alias("ysig"),
    )
    st = sigma.select(
        F.col("src").alias("ss"), F.col("v").alias("tt"),
        F.col("d").alias("sd"), F.col("s").alias("stsig"),
    )
    term = F.expr(
        f"(CAST(xsig AS DECIMAL(38,0)) * ysig * {BET_SCALE}) div stsig"
    )
    return (
        x.join(y, (F.col("node") == F.col("ynode")) & (F.col("xs") < F.col("ys")))
        .join(
            st,
            (F.col("ss") == F.col("xs"))
            & (F.col("tt") == F.col("ys"))
            & (F.col("sd") == F.col("xd") + F.col("yd")),
        )
        .filter((F.col("node") != F.col("xs")) & (F.col("node") != F.col("ys")))
        .groupBy("node")
        .agg(
            F.sum(term).cast("bigint").alias("bet_scaled"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
        .select(
            "node",
            "bet_scaled",
            "n_pairs",
            (F.col("bet_scaled").cast("double") / F.lit(float(BET_SCALE))).alias(
                "betweenness"
            ),
        )
    )


def _pr_sql() -> str:
    """Unrolled truncated fixed-point PageRank ending in
    `r{PR_ROUNDS}` (node, r). Requires _TOP_EDGES_SQL's `edges` CTE
    in scope."""
    ctes = [
        "es AS MATERIALIZED (SELECT a, b FROM edges)",
        "sym AS MATERIALIZED (SELECT a AS u, b AS v FROM es"
        " UNION ALL SELECT b, a FROM es)",
        "deg AS MATERIALIZED (SELECT u, CAST(COUNT(*) AS BIGINT) AS dg"
        " FROM sym GROUP BY u)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg)",
        f"r0 AS (SELECT u AS node, CAST({PR_SCALE} AS BIGINT)"
        " // (SELECT n FROM nn) AS r FROM deg)",
    ]
    for k in range(1, PR_ROUNDS + 1):
        ctes.append(
            f"""r{k} AS MATERIALIZED (
      SELECT d.u AS node,
             (SELECT (3 * {PR_SCALE}) // (20 * n) FROM nn)
             + (17 * COALESCE(m.mass, 0)) // 20 AS r
      FROM deg d LEFT JOIN (
        SELECT s.v AS node, CAST(SUM(p.r // dd.dg) AS BIGINT) AS mass
        FROM r{k - 1} p
        JOIN deg dd ON dd.u = p.node
        JOIN sym s ON s.u = p.node
        GROUP BY s.v
      ) m ON m.node = d.u
    )"""
        )
    return ",\n    ".join(ctes)


@query(
    "q_pagerank_backbone",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    {_pr_sql()}
    SELECT node, r AS pr_scaled,
           r / CAST({PR_SCALE} AS DOUBLE) AS pagerank
    FROM r{PR_ROUNDS}
    """,
)
def q_pagerank_backbone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted PageRank over the symmetrized backbone under the
    truncated fixed-point convention (module docstring):
    {PR_ROUNDS} synchronous BIGINT rounds at scale {PR_SCALE}, then
    ONE flat double division. The companion q_nation_pagerank keeps
    the weighted/decimal-quantized variant; this one is the
    INTEGER-EXACT cross-engine fixpoint the r12 verdict asked for."""
    sym = _sym(top_trade_edges(spark, sf_dir)).persist()
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("dg"))
    deg = deg.localCheckpoint(eager=True)
    n_df = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    r = (
        deg.crossJoin(F.broadcast(n_df))
        .selectExpr("u AS node", f"CAST({PR_SCALE} AS BIGINT) div n AS r")
        .localCheckpoint(eager=True)
    )
    base = (
        n_df.selectExpr(f"(3 * {PR_SCALE}) div (20 * n) AS base")
    )
    nbr = sym.select(F.col("u").alias("pu"), F.col("v").alias("pv"))
    for _ in range(PR_ROUNDS):
        mass = (
            r.join(deg.withColumnRenamed("u", "node"), "node")
            .selectExpr("node AS mu", "r div dg AS share")
            .join(nbr, F.col("pu") == F.col("mu"))
            .groupBy(F.col("pv").alias("node"))
            .agg(F.sum("share").cast("bigint").alias("mass"))
        )
        r = (
            deg.select(F.col("u").alias("node"))
            .join(mass, "node", "left")
            .crossJoin(F.broadcast(base))
            .selectExpr(
                "node",
                "base + (17 * COALESCE(mass, CAST(0 AS BIGINT))) div 20 AS r",
            )
            .localCheckpoint(eager=True)
        )
    return r.select(
        "node",
        F.col("r").alias("pr_scaled"),
        (F.col("r").cast("double") / F.lit(float(PR_SCALE))).alias("pagerank"),
    )
