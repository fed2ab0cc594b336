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
    DIST_ROUNDS,
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
    Nodes interior to no shortest path are absent (betweenness 0).

    r15: the σ DP and the truncated pair terms run driver-side over
    the collected backbone (bounded driver state, all-integer — the
    q_kcore_trade pattern; Python // on the non-negative operands is
    the same truncation as Spark div / DuckDB //). Only the exact
    integer sums ship back; the one flat double division stays the
    same Spark expression."""
    from timestream_travel_spark.operators.graph_kit import (
        bfs_distances,
        collect_sym,
        sigma_counts,
    )

    nodes, adj, _ = collect_sym(spark, sf_dir)
    dist = bfs_distances(nodes, adj, DIST_ROUNDS)
    sigma = sigma_counts(nodes, adj, dist, DIST_ROUNDS)
    by_src: dict[int, list] = {}
    for (s, v), (d, sg) in sigma.items():
        by_src.setdefault(s, []).append((v, d, sg))
    bet: dict[int, int] = {}
    npairs: dict[int, int] = {}
    for s in nodes:
        for t in nodes:
            if not s < t:
                continue
            ent_st = sigma.get((s, t))
            if ent_st is None:
                continue
            sd, sig_st = ent_st
            for v, dv, sgv in by_src[s]:
                if v == s or v == t:
                    continue
                ent = sigma.get((t, v))
                if ent is None:
                    continue
                dt, sgt = ent
                if dv + dt == sd:
                    bet[v] = bet.get(v, 0) + (sgv * sgt * BET_SCALE) // sig_st
                    npairs[v] = npairs.get(v, 0) + 1
    from timestream_travel_spark.tables import bounded_df

    rows = sorted((v, int(bet[v]), int(npairs[v])) for v in bet)
    return bounded_df(
        spark, rows, "node int, bet_scaled bigint, n_pairs bigint"
    ).select(
        "node",
        "bet_scaled",
        "n_pairs",
        (F.col("bet_scaled").cast("double") / F.lit(float(BET_SCALE))).alias(
            "betweenness"
        ),
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
    INTEGER-EXACT cross-engine fixpoint the r12 verdict asked for.

    r15: the BIGINT recurrence runs driver-side over the collected
    backbone (bounded driver state; was {PR_ROUNDS} Spark rounds of
    two joins + checkpoint each ≈ 10 jobs). Python // equals Spark
    div on the non-negative iterates; the flat double division stays
    the same Spark expression."""
    from timestream_travel_spark.operators.graph_kit import collect_sym

    nodes, adj, _ = collect_sym(spark, sf_dir)
    deg = {n: len(adj[n]) for n in nodes}
    n = len(nodes)
    base = (3 * PR_SCALE) // (20 * n)
    r = {u: PR_SCALE // n for u in nodes}
    for _ in range(PR_ROUNDS):
        share = {u: r[u] // deg[u] for u in nodes}
        mass = {u: 0 for u in nodes}
        for u in nodes:
            for v in adj[u]:
                mass[v] += share[u]
        r = {u: base + (17 * mass[u]) // 20 for u in nodes}
    from timestream_travel_spark.tables import bounded_df

    rdf = bounded_df(
        spark, sorted((u, int(r[u])) for u in nodes), "node int, r bigint"
    )
    return rdf.select(
        "node",
        F.col("r").alias("pr_scaled"),
        (F.col("r").cast("double") / F.lit(float(PR_SCALE))).alias("pagerank"),
    )
