"""Dedup clustering: connected components over the near-duplicate
pair graph — the step that turns pairwise matches into dedup groups
(keep one representative per component, drop the rest).

Scale design: iterative min-label propagation, one equi-join shuffle
per round. Rounds needed = graph diameter, which for dedup graphs is
tiny (near-dup clusters are quasi-cliques — 2-4 rounds in practice).
Per-round driver traffic is ONE scalar (the changed-label count),
like the k-means loop in similarity2.py; labels never leave the
cluster. This is the standard large-graph CC recipe (a.k.a.
"hash-to-min"), not a driver-side union-find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20) -> DataFrame:
    """(node, cluster) for every node in `edges`, cluster = min node
    id reachable — deterministic representative labeling.

    Each iteration: push every node's current label to its neighbors,
    take the min of (own label, neighbor labels). Fixpoint when no
    label changes. Labels persist between rounds; the previous
    round's cache is released after the new one materializes."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("cluster"))
        .persist()
    )
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.a == labels.node)
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("cluster").alias("nbr_cluster"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.node2, "left")
            .select(
                "node",
                F.least(F.col("cluster"), F.coalesce("nbr_cluster", "cluster")).alias("cluster"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        # silent non-convergence would return split components — a
        # chain longer than max_iter must be an explicit error
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"({changed} labels still changing — graph diameter exceeds max_iter)"
        )
    return labels


@query(
    "q_dedup_clusters",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) - 2, 1)),
               i -> array_to_string(regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')[i:i+2], ' ')
             )) AS shingles
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5
    ), sym AS (
      SELECT src AS a, dst AS b FROM pairs
      UNION
      SELECT dst, src FROM pairs
    ), reach AS (
      WITH RECURSIVE walk(node, seen) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.b, w.seen FROM walk w JOIN sym s ON s.a = w.node
      )
      SELECT * FROM walk
    )
    SELECT node, MIN(seen) AS cluster FROM reach GROUP BY node
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup groups: connected components over the LSH-verified
    near-dup pairs (≥0.5 true Jaccard). Spark side: LSH candidates →
    exact verify → min-label propagation. Oracle: all-pairs edges +
    recursive CTE reachability. The outputs match because the
    verified pair set is itself oracle-equal (q_lsh_verified_jaccard)."""
    from timestream_travel_spark.operators.dedup import lsh_verified_pairs

    d = load_table(spark, sf_dir, "documents")
    edges = lsh_verified_pairs(d, threshold=0.5).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return connected_components(edges)
