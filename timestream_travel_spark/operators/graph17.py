"""Graph analytics, part 17 (round 14): the Wiener index (Wiener,
JACS 1947 — the sum of all-pairs shortest-path distances, chemistry's
oldest topological index and the additive companion of graph16's
harmonic global efficiency) on the top-revenue trade backbone, and
the GLOBAL transitivity ratio (Newman, SIAM Rev. 2003 —
3·triangles / connected triples, the whole-graph counterpart of
graph4's per-node local clustering coefficient) on the full distinct
trade graph.

Exactness: both are pure integer censuses with ONE flat division —
the Wiener sum reuses graph12's BFS distance table (every d is an
exact integer; Σd over ordered reachable pairs is even by symmetry,
so W = Σd/2 is exact), and transitivity divides the exact closed-
triple count 3T by the exact connected-triple count Σ_v deg_v·
(deg_v−1)/2 (doubled numerator/denominator to avoid the /2s).

Scale shape: the heavy stages are the already-priced backbone /
distinct-edge extractions (fact scan + broadcast dims, map-side
combine); distances and triangle joins run on the ≤25-node bounded
tables (graph12/graph2 plans, localCheckpoint where referenced
repeatedly).

Reference parity: none (cmd/backup.go has no graph surface) —
north-star derived capability; siblings of graph12/15/16.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.graph2 import _EDGES_SQL
from timestream_travel_spark.operators.graph3 import (
    _TOP_EDGES_SQL,
    top_trade_edges,
)
from timestream_travel_spark.operators.graph12 import (
    DIST_ROUNDS,
    _dist_sql,
    _distances,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_wiener_index",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    {_dist_sql()}
    SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes,
           CAST(COUNT(CASE WHEN d >= 1 THEN 1 END) AS BIGINT)
             AS n_reachable_pairs,
           CAST(SUM(CASE WHEN d >= 1 THEN d ELSE 0 END) // 2 AS BIGINT)
             AS wiener,
           CASE WHEN COUNT(CASE WHEN d >= 1 THEN 1 END) > 0 THEN
             round(CAST(SUM(CASE WHEN d >= 1 THEN d ELSE 0 END) AS DOUBLE)
                   / COUNT(CASE WHEN d >= 1 THEN 1 END), 6)
           END AS avg_path_len
    FROM d{DIST_ROUNDS}
    """,
)
def q_wiener_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wiener index of the trade backbone: W = Σ_{{u<v}} d(u,v) over
    reachable pairs (the ordered BFS table's Σd halved — even by
    symmetry), plus the mean shortest-path length over ordered
    reachable pairs — exact integers, one guarded flat division."""
    dist = _distances(spark, sf_dir)
    reach = F.count(F.when(F.col("d") >= 1, F.lit(1)))
    sumd = F.sum(F.when(F.col("d") >= 1, F.col("d")).otherwise(0))
    return dist.agg(
        F.countDistinct("src").cast("bigint").alias("n_nodes"),
        reach.cast("bigint").alias("n_reachable_pairs"),
        F.expr(
            "CAST(SUM(CASE WHEN d >= 1 THEN d ELSE 0 END) div 2 AS BIGINT)"
        ).alias("wiener"),
        F.when(reach > 0, F.round(sumd.cast("double") / reach, 6)).alias(
            "avg_path_len"
        ),
    )


@query(
    "q_graph_transitivity",
    oracle=f"""
    WITH {_EDGES_SQL},
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM edges e1
      JOIN edges e2 ON e1.b = e2.a
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    ), tcount AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM tri
    ), deg AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS u FROM edges UNION ALL SELECT b FROM edges
      ) GROUP BY u
    ), triads AS (
      SELECT CAST(SUM(d * (d - 1)) AS BIGINT) AS triads2 FROM deg
    )
    SELECT t.n_triangles, CAST(tr.triads2 // 2 AS BIGINT) AS n_triads,
           CASE WHEN tr.triads2 > 0 THEN
             round(CAST(6 * t.n_triangles AS DOUBLE) / tr.triads2, 6)
           END AS transitivity
    FROM tcount t, triads tr
    """,
)
def q_graph_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global transitivity of the distinct nation-trade graph:
    3·triangles / connected triples, computed as 6T / Σ_v d_v(d_v−1)
    so numerator and denominator stay exact integers — one guarded
    flat division (the graph2 triangle join, counted once via the
    a<b<c ordering)."""
    # r16: the distinct undirected edge set derives from the shared
    # graph3.trade_pair_census key set (one fact-scale pass per
    # session instead of one per consumer).
    from timestream_travel_spark.operators.graph3 import trade_pair_census

    edges = (
        trade_pair_census(spark, sf_dir)
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    # ≤ N²/2 rows, referenced four times below — cut the lineage once
    edges = edges.coalesce(1).localCheckpoint(eager=True)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = e1.join(e2, F.col("e1.b") == F.col("e2.a")).join(
        e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b"))
    )
    tcount = tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    deg = (
        edges.select(F.col("a").alias("u"))
        .unionAll(edges.select(F.col("b").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    triads = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1)).cast("bigint").alias("triads2")
    )
    return tcount.crossJoin(F.broadcast(triads)).select(
        "n_triangles",
        F.expr("CAST(triads2 div 2 AS BIGINT)").alias("n_triads"),
        F.when(
            F.col("triads2") > 0,
            F.round(
                (6 * F.col("n_triangles")).cast("double") / F.col("triads2"), 6
            ),
        ).alias("transitivity"),
    )
