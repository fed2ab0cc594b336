"""Graph analytics, part 13 (promoted into load_all()'s round-13 tail): stress centrality
(Shimbel, Bull. Math. Biophys. 1953) on the trade backbone — the
INTEGER-EXACT sibling of betweenness: the number of shortest paths
passing through each node, Σ_{{s<t, v∉{{s,t}}}} σ(s,v)·σ(v,t)·
[d(s,v)+d(v,t)=d(s,t)]. Betweenness normalizes each term by σ(s,t),
making it a sum of short rationals (the documented double→DECIMAL
quantization trap); stress keeps the whole statistic a BIGINT, so
the oracle comparison is exact with zero float risk — and the
σ path-count table it builds is the Brandes forward pass, ready for
a betweenness follow-up.

Exactness: BFS distances are graph12's fixed {DIST_ROUNDS}-round
unroll (fixpoint pytest-pinned); path counts σ(s,v) accumulate
layer-by-layer (σ at distance r sums the σ of distance-(r−1)
neighbors — pure integer DP, one table per layer, unrolled
identically in both engines); the triple join counting v-interior
pairs is exact integer arithmetic end-to-end.

Scale shape: the heavy stage stays the fact-table edge extraction;
distances/σ are ≤|V|² rows, the pair join ≤|V|³ on the bounded
backbone; each Spark layer localCheckpoints (graph8/9 lesson).
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
from timestream_travel_spark.registry import query


def _sigma_sql() -> str:
    """Per-layer path-count CTEs sg0..sg{DIST_ROUNDS} + their union
    `sigma` (src, v, d, s). Requires _dist_sql()'s `sym` and
    d{DIST_ROUNDS} CTEs in scope."""
    ctes = [
        "sg0 AS (SELECT DISTINCT u AS src, u AS v, CAST(1 AS BIGINT) AS s"
        " FROM sym)"
    ]
    for r in range(1, DIST_ROUNDS + 1):
        ctes.append(
            f"""sg{r} AS MATERIALIZED (
      SELECT p.src, s.v, CAST(SUM(p.s) AS BIGINT) AS s
      FROM sg{r - 1} p
      JOIN sym s ON s.u = p.v
      JOIN d{DIST_ROUNDS} dv ON dv.src = p.src AND dv.v = s.v
                            AND dv.d = {r}
      GROUP BY p.src, s.v
    )"""
        )
    union = "\n      UNION ALL ".join(
        f"SELECT src, v, {r} AS d, s FROM sg{r}" for r in range(DIST_ROUNDS + 1)
    )
    ctes.append(f"sigma AS MATERIALIZED (\n      {union}\n    )")
    return ",\n    ".join(ctes)


def sigma_table(sym: DataFrame, dist: DataFrame) -> DataFrame:
    """Shortest-path count table (src, v, s, d) — the Brandes forward
    pass: σ at layer r sums the σ of layer-(r−1) neighbors that are
    genuinely at distance r (pure integer DP, localCheckpoint per
    layer). Shared by stress (graph13) and betweenness (graph15)."""
    layer = (
        sym.select(F.col("u").alias("src"))
        .distinct()
        .select("src", F.col("src").alias("v"), F.lit(1).cast("bigint").alias("s"))
    )
    sigma = layer.withColumn("d", F.lit(0))
    for r in range(1, DIST_ROUNDS + 1):
        nbr = sym.select(F.col("u").alias("pu"), F.col("v").alias("nv"))
        dv = dist.filter(F.col("d") == r).select(
            F.col("src").alias("dsrc"), F.col("v").alias("dvv")
        )
        layer = (
            layer.join(nbr, layer.v == nbr.pu)
            .join(
                dv,
                (F.col("src") == F.col("dsrc")) & (F.col("nv") == F.col("dvv")),
                "left_semi",
            )
            .groupBy("src", F.col("nv").alias("v"))
            .agg(F.sum("s").cast("bigint").alias("s"))
            .localCheckpoint(eager=True)
        )
        sigma = sigma.unionAll(layer.withColumn("d", F.lit(r)))
    return sigma


@query(
    "q_stress_centrality",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    {_dist_sql()},
    {_sigma_sql()},
    dist AS (SELECT src, v, d FROM d{DIST_ROUNDS})
    SELECT x.v AS node, CAST(SUM(x.s * y.s) AS BIGINT) AS stress
    FROM sigma x
    JOIN sigma y ON y.v = x.v AND x.src < y.src
    JOIN dist st ON st.src = x.src AND st.v = y.src
    WHERE x.v <> x.src AND x.v <> y.src
      AND x.d + y.d = st.d
    GROUP BY x.v
    """,
)
def q_stress_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stress centrality per backbone node: how many shortest paths
    pass THROUGH it (σ(s,v)·σ(v,t) summed over endpoint pairs with
    d(s,v)+d(v,t)=d(s,t)) — integer-exact end-to-end (module
    docstring). Nodes interior to no shortest path are absent (their
    stress is 0).

    r15: distances, σ DP, and the pair census all run driver-side
    over the collected backbone (bounded driver state, all-integer —
    the q_kcore_trade pattern; was the distributed σ unroll at ~14
    Spark jobs). graph_kit.bfs_distances/sigma_counts reproduce the
    d{DIST_ROUNDS}/σ tables exactly; the census below is the same
    triple condition the Spark joins expressed."""
    from timestream_travel_spark.operators.graph_kit import (
        bfs_distances,
        collect_sym,
        sigma_counts,
    )

    nodes, adj, _ = collect_sym(spark, sf_dir)
    dist = bfs_distances(nodes, adj, DIST_ROUNDS)
    sigma = sigma_counts(nodes, adj, dist, DIST_ROUNDS)
    stress: dict[int, int] = {}
    by_src: dict[int, list] = {}
    for (s, v), (d, sg) in sigma.items():
        by_src.setdefault(s, []).append((v, d, sg))
    for s in nodes:
        for t in nodes:
            if not s < t:
                continue
            st = dist.get((s, t))
            if st is None:
                continue
            for v, dv, sgv in by_src[s]:
                if v == s or v == t:
                    continue
                ent = sigma.get((t, v))
                if ent is None:
                    continue
                dt, sgt = ent
                if dv + dt == st:
                    stress[v] = stress.get(v, 0) + sgv * sgt
    from timestream_travel_spark.tables import bounded_df

    rows = sorted((v, int(c)) for v, c in stress.items())
    return bounded_df(spark, rows, "node int, stress bigint")
