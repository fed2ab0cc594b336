"""Graph analytics, part 19 (round 15): degree assortativity
(Newman, PRL 2002 — the Pearson correlation of endpoint degrees
across edges; positive = hubs link hubs, negative = hub-and-spoke)
on the full distinct trade graph (graph2's edges convention).

Exactness: with per-edge endpoint degrees (j, k), M edges and the
integer sums S_jk = Σjk, S_1 = Σ(j+k), S_2 = Σ(j²+k²), the
undirected assortativity is

    r = (4·M·S_jk − S_1²) / (2·M·S_2 − S_1²)

(the standard ½-symmetrized moments cross-multiplied by 4M² so
every term is an exact BIGINT; degrees ≤ 24 on the ≤25-nation
graph, all products ≪ 2⁵³). ONE guarded flat double division.

Scale shape: the heavy stage is the distinct-edge extraction
(fact scan + broadcast dims + map-side-combinable DISTINCT —
graph2's priced plan); degrees and the per-edge moment sums run on
the ≤ N²/2 bounded edge table via two broadcast joins.

Reference parity: none (cmd/backup.go has no graph surface) —
north-star derived capability; sibling of graph17's transitivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.graph2 import _EDGES_SQL
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_graph_assortativity",
    oracle=f"""
    WITH {_EDGES_SQL},
    em AS MATERIALIZED (
      SELECT a, b FROM edges
    ), deg AS MATERIALIZED (
      SELECT u, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT a AS u FROM em UNION ALL SELECT b AS u FROM em)
      GROUP BY u
    ), pere AS (
      SELECT da.d AS j, db.d AS k
      FROM em e
      JOIN deg da ON da.u = e.a
      JOIN deg db ON db.u = e.b
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(SUM(j*k) AS BIGINT) AS sjk,
             CAST(SUM(j + k) AS BIGINT) AS s1,
             CAST(SUM(j*j + k*k) AS BIGINT) AS s2
      FROM pere
    )
    SELECT m AS n_edges, sjk AS sum_jk, s1 AS sum_deg, s2 AS sum_sq,
           CASE WHEN 2*m*s2 - s1*s1 <> 0 THEN
             round(CAST(4*m*sjk - s1*s1 AS DOUBLE)
                   / (2*m*s2 - s1*s1), 6)
           END AS assortativity
    FROM s
    """,
)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the distinct inter-nation trade
    graph: exact integer moment sums over per-edge endpoint degrees,
    one guarded cross-multiplied division (module docstring)."""
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
    # bounded (≤ N²/2 rows), referenced three times — cut lineage once
    edges = edges.coalesce(1).localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("a").alias("u"))
        .unionAll(edges.select(F.col("b").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    pere = (
        edges.join(F.broadcast(da), F.col("a") == F.col("da.u"))
        .join(F.broadcast(db), F.col("b") == F.col("db.u"))
        .select(F.col("da.d").alias("j"), F.col("db.d").alias("k"))
    )
    s = pere.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("j") * F.col("k")).cast("bigint").alias("sjk"),
        F.sum(F.col("j") + F.col("k")).cast("bigint").alias("s1"),
        F.sum(F.col("j") * F.col("j") + F.col("k") * F.col("k"))
        .cast("bigint")
        .alias("s2"),
    )
    return s.select(
        F.col("m").alias("n_edges"),
        F.col("sjk").alias("sum_jk"),
        F.col("s1").alias("sum_deg"),
        F.col("s2").alias("sum_sq"),
        F.when(
            2 * F.col("m") * F.col("s2") - F.col("s1") * F.col("s1") != 0,
            F.round(
                (4 * F.col("m") * F.col("sjk") - F.col("s1") * F.col("s1"))
                .cast("double")
                / (2 * F.col("m") * F.col("s2") - F.col("s1") * F.col("s1")),
                6,
            ),
        ).alias("assortativity"),
    )
