"""Graph analytics, part 2: triangle counting on the nation trade
graph.

Companion to q_nation_pagerank (graph.py) and the FastSV connected
components (dedup2.py): triangles are the third standard graph
primitive (clustering coefficient / community density). The graph is
the same one pagerank walks: an undirected edge between two nations
when any supplier in one ships to any customer in the other.

100 TB shape: the heavy work is the edge EXTRACTION (lineitem-scale
joins that Catalyst plans as broadcast-dim hash joins); the triangle
enumeration then runs on the aggregated nation graph (bounded node
set). For a billion-edge graph the same plan applies unchanged with
one standard refinement, stated here for the record: orient each
edge from the lower-degree endpoint to the higher-degree endpoint
before the two-hop self-join, which bounds intermediate wedge counts
by sum(deg^1.5) (Schank & Wagner, WEA'05 — public algorithm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

_EDGES_SQL = """
  edges AS (
    SELECT DISTINCT least(s.s_nationkey, c.c_nationkey) AS a,
                    greatest(s.s_nationkey, c.c_nationkey) AS b
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE s.s_nationkey <> c.c_nationkey
  )
"""

_TRIANGLE_ORACLE = f"""
WITH {_EDGES_SQL},
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
pernode AS (
  SELECT node, COUNT(*) AS triangles
  FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  )
  GROUP BY node
)
SELECT n.n_name AS nation, p.triangles
FROM pernode p JOIN nation n ON p.node = n.n_nationkey
ORDER BY p.triangles DESC, nation
"""


@query("q_triangle_count", oracle=_TRIANGLE_ORACLE)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle participation in the trade graph.

    Plan: fact scan with broadcast supplier/customer dims → distinct
    (a<b) edge set (25-node graph: at most 300 edges) → two-hop
    self-join closed by a third edge join (a<b<c ordering counts each
    triangle exactly once) → explode corners → per-node count →
    broadcast nation-name join.
    """
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

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
    # materialize the ≤ N²/2-row edge set ONCE: the three-way
    # self-join below references `edges` three times, and without a
    # cut each reference re-runs the full fact extraction
    edges = edges.coalesce(1).localCheckpoint(eager=True)
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    pernode = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        pernode.join(F.broadcast(nation), pernode.node == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"), "triangles")
        .orderBy(F.desc("triangles"), "nation")
    )
