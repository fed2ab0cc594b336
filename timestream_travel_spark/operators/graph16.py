"""Round-14 STAGED graph analytics: edge betweenness centrality
(Girvan & Newman, PNAS 2002 — the edge-removal criterion of the
classic community algorithm) and global efficiency (Latora &
Marchiori, PRL 2001) on the trade backbone — completing the
betweenness family (node betweenness landed in round 13, graph15).

Exactness:
- edge betweenness inherits graph15's truncated fixed-point
  convention: for edge (a,b) and endpoint pair s<t the through-edge
  path count is σ(s,a)·σ(t,b) (direction a→b, when
  d(s,a)+1+d(b,t) = d(s,t)) plus σ(s,b)·σ(t,a) (direction b→a) —
  both exact integers off graph13's σ DP, the products crossing into
  DECIMAL(38,0)/HUGEINT before multiplying; the pair term is ONE
  truncating division ((n₁+n₂)·{EB_SCALE}) DIV σ_st, the per-edge
  sum stays < 2⁵³ (each term ≤ {EB_SCALE} because through-edge paths
  ≤ σ_st; < 400 pairs), and the emitted double is one flat division;
- global efficiency sums 1/d over the BOUNDED distance domain
  (d ≤ {DIST_ROUNDS}) as the left-associated count_d/d chain (the
  q_closeness_harmonic idiom — no quantization of repeating-decimal
  1/3, 1/6 terms), then ONE flat division by N(N−1).

Scale shape: the heavy stage stays graph3's fact-table edge
extraction; σ/distance tables are ≤|V|² rows on the ≤{TOP_EDGES}-edge
backbone, the edge-pair join ≤|E|·|V|² — all bounded.

Reference parity: none (cmd/backup.go has no graph surface) —
north-star derived capability, sibling of graph12/13/15.
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

EB_SCALE = 10**12  # fixed-point scale of the truncated pair terms


@query(
    "q_edge_betweenness",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    {_dist_sql()},
    {_sigma_sql()},
    dirs AS (
      SELECT e.a, e.b, x.src AS s, y.src AS t, st.s AS sig_st,
             CAST(x.s AS HUGEINT) * y.s AS num
      FROM edges e
      JOIN sigma x ON x.v = e.a
      JOIN sigma y ON y.v = e.b AND x.src < y.src
      JOIN sigma st ON st.src = x.src AND st.v = y.src
                   AND st.d = x.d + 1 + y.d
      UNION ALL
      SELECT e.a, e.b, x.src, y.src, st.s,
             CAST(x.s AS HUGEINT) * y.s
      FROM edges e
      JOIN sigma x ON x.v = e.b
      JOIN sigma y ON y.v = e.a AND x.src < y.src
      JOIN sigma st ON st.src = x.src AND st.v = y.src
                   AND st.d = x.d + 1 + y.d
    ), per_pair AS (
      SELECT a, b, s, t,
             (SUM(num) * {EB_SCALE}) // ANY_VALUE(sig_st) AS term
      FROM dirs GROUP BY a, b, s, t
    )
    SELECT a AS node_a, b AS node_b,
           CAST(SUM(term) AS BIGINT) AS eb_scaled,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(term) AS BIGINT) / CAST({EB_SCALE} AS DOUBLE)
             AS edge_betweenness
    FROM per_pair GROUP BY a, b
    """,
)
def q_edge_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Girvan–Newman edge betweenness per backbone edge under the
    truncated fixed-point convention (module docstring): both
    crossing directions' σ-products summed per endpoint pair, ONE
    truncating division per pair, exact integer sum + one flat
    double division. Edges on no shortest path are absent.

    r15: distances, σ DP, and the per-pair truncated terms run
    driver-side over the collected backbone (bounded driver state,
    all-integer — the q_kcore_trade pattern; was the distributed σ
    unroll + two direction joins ≈ 15 Spark jobs). Python // equals
    Spark div / DuckDB // on the non-negative operands; the flat
    double division stays a Spark expression."""
    from timestream_travel_spark.operators.graph_kit import (
        bfs_distances,
        collect_sym,
        sigma_counts,
    )

    nodes, adj, edge_list = collect_sym(spark, sf_dir)
    dist = bfs_distances(nodes, adj, DIST_ROUNDS)
    sigma = sigma_counts(nodes, adj, dist, DIST_ROUNDS)
    eb: dict[tuple, int] = {}
    npairs: dict[tuple, int] = {}
    for a, b in edge_list:
        for s in nodes:
            for t in nodes:
                if not s < t:
                    continue
                ent_st = sigma.get((s, t))
                if ent_st is None:
                    continue
                sd, sig_st = ent_st
                num = 0
                # direction s→a, b→t
                ex = sigma.get((s, a))
                ey = sigma.get((t, b))
                if ex and ey and ex[0] + 1 + ey[0] == sd:
                    num += ex[1] * ey[1]
                # direction s→b, a→t
                ex = sigma.get((s, b))
                ey = sigma.get((t, a))
                if ex and ey and ex[0] + 1 + ey[0] == sd:
                    num += ex[1] * ey[1]
                if num:
                    key = (a, b)
                    eb[key] = eb.get(key, 0) + (num * EB_SCALE) // sig_st
                    npairs[key] = npairs.get(key, 0) + 1
    from timestream_travel_spark.tables import bounded_df

    rows = sorted((a, b, int(eb[(a, b)]), int(npairs[(a, b)])) for a, b in eb)
    return bounded_df(
        spark, rows, "node_a int, node_b int, eb_scaled bigint, n_pairs bigint"
    ).select(
        "node_a",
        "node_b",
        "eb_scaled",
        "n_pairs",
        (F.col("eb_scaled").cast("double") / F.lit(float(EB_SCALE))).alias(
            "edge_betweenness"
        ),
    )


_EFF_CHAIN = " + ".join(
    f"(CAST(COUNT(CASE WHEN d = {k} THEN 1 END) AS DOUBLE) / {k})"
    for k in range(1, DIST_ROUNDS + 1)
)


@query(
    "q_global_efficiency",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    {_dist_sql()}
    SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes,
           CAST(COUNT(CASE WHEN d >= 1 THEN 1 END) AS BIGINT)
             AS n_reachable_pairs,
           round(({_EFF_CHAIN})
                 / (COUNT(DISTINCT src)
                    * (COUNT(DISTINCT src) - 1.0)), 6) AS global_efficiency
    FROM d{DIST_ROUNDS}
    """,
)
def q_global_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latora–Marchiori global efficiency of the backbone: the mean
    inverse shortest-path length over ordered node pairs (unreachable
    pairs contribute 0) — the harmonic count_d/d chain over the
    bounded distance domain, ONE flat division by N(N−1) (module
    docstring)."""
    dist = _distances(spark, sf_dir)
    terms = [
        F.count(F.when(F.col("d") == k, F.lit(1))).cast("double") / F.lit(float(k))
        for k in range(1, DIST_ROUNDS + 1)
    ]
    chain = terms[0]
    for t in terms[1:]:
        chain = chain + t
    nn = F.countDistinct("src")
    return dist.agg(
        nn.cast("bigint").alias("n_nodes"),
        F.count(F.when(F.col("d") >= 1, F.lit(1)))
        .cast("bigint")
        .alias("n_reachable_pairs"),
        F.round(chain / (nn * (nn - F.lit(1.0))), 6).alias("global_efficiency"),
    )
