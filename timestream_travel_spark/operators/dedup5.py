"""Dedup, part 5 (round-8 wave): similarity-medoid canonical
selection per near-dup cluster — the second canonicalization policy
beside q_cluster_canonical_stats' keep-the-longest (dedup4.py).
Keep-the-longest optimizes retained bytes; the medoid (the member
most similar to the rest of its cluster) optimizes representativeness
— the policy used when the kept text feeds training and an outlier
member (e.g. a long boilerplate-padded variant) should NOT win.

Reference parity: none (cmd/backup.go is an export CLI) — north-star
dedup capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.dedup3 import _SHINGLES_SQL
from timestream_travel_spark.operators.dedup4 import _REACH_CC_SQL
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# all-pairs jaccard-VALUED edge set (>= 0.5) + the shared recursive
# reachability — the exhaustive twin of the Spark side's LSH-gated
# verified pairs, carrying the same round-4 jaccard the Spark side
# emits so the medoid's edge-weight sums are digit-identical
_MEDOID_CTES = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles
  FROM documents
), jp AS (
  SELECT a.doc_id AS src, b.doc_id AS dst,
         round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / (len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles))), 4) AS j
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / (len(a.shingles) + len(b.shingles)
           - len(list_intersect(a.shingles, b.shingles))) >= 0.5
), sym AS (
  SELECT src AS a, dst AS b, j FROM jp
  UNION ALL
  SELECT dst, src, j FROM jp
), {_REACH_CC_SQL}
"""


@query(
    "q_cluster_medoid",
    oracle=f"""{_MEDOID_CTES},
    sums AS (
      SELECT a AS node,
             CAST(CAST(SUM(CAST(j AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
               AS tsim
      FROM sym GROUP BY a
    ), lab AS (
      SELECT c.node, c.cluster, s.tsim,
             CAST(COUNT(*) OVER (PARTITION BY c.cluster) AS BIGINT)
               AS n_members,
             row_number() OVER (PARTITION BY c.cluster
                                ORDER BY s.tsim DESC, c.node) AS rn
      FROM cc c JOIN sums s ON s.node = c.node
    )
    SELECT cluster, node AS medoid_doc, n_members,
           round(tsim, 4) AS total_sim
    FROM lab WHERE rn = 1
    """,
)
def q_cluster_medoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-medoid per near-dup cluster: the member whose
    summed verified-edge Jaccard to the rest of its cluster is
    largest (doc_id tiebreak) — an O(edges) medoid on the sparse
    verified graph (missing edges contribute 0), never an all-pairs
    member scan. Edge weights are the round-4 Jaccards the verify
    stage already emits; per-node sums accumulate them as exact
    DECIMAL(12,4) (order-independent), so the argmax is
    hash-deterministic.

    Spark edges come from probabilistic MinHash-LSH while the oracle
    is the exhaustive all-pairs join — the dedup.q_lsh_verified_jaccard
    recall argument applies twice here (a missed edge can both split
    a cluster and move a medoid): the fixture's duplicate pairs sit
    at j ≈ 0.97 where 8-band/3-row recall is 1 − (1 − 0.97³)⁸, and no
    fixture pair lands in the flake band (measured at all 3 SFs).

    Plan: LSH-verified pairs (bounded) → large-star/small-star CC
    (logarithmic rounds) → one edge-list aggregation + one window
    argmax partitioned by cluster. Every post-verify stage runs on
    edge/cluster-sized data."""
    from timestream_travel_spark.operators.dedup import lsh_verified_pairs_cached
    from timestream_travel_spark.operators.dedup2 import connected_components_star

    d = load_table(spark, sf_dir, "documents")
    # r15 materialized the pair list once per call; r16 shares the
    # session-cached canonical build across the cluster family
    edges = lsh_verified_pairs_cached(spark, sf_dir)
    cc = connected_components_star(
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    sym = edges.select(
        F.col("doc_a").alias("node"), F.col("jaccard").alias("j")
    ).unionByName(edges.select(F.col("doc_b").alias("node"), F.col("jaccard").alias("j")))
    sums = sym.groupBy("node").agg(
        F.sum(F.col("j").cast("decimal(12,4)")).cast("double").alias("tsim")
    )
    lab = cc.join(sums, "node")
    w_cnt = Window.partitionBy("cluster")
    w_rank = Window.partitionBy("cluster").orderBy(F.desc("tsim"), F.asc("node"))
    ranked = lab.select(
        "node",
        "cluster",
        "tsim",
        F.count("*").over(w_cnt).alias("n_members"),
        F.row_number().over(w_rank).alias("rn"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "cluster",
        F.col("node").alias("medoid_doc"),
        "n_members",
        F.round("tsim", 4).alias("total_sim"),
    )
