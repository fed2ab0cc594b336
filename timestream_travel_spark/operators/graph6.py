"""Round-10 graph wave (STAGED — registry.STAGED_MODULES): the three
remaining classical link predictors beside q_jaccard_link_prediction
and q_adamic_adar — resource allocation (Zhou, Lü & Zhang, Eur.
Phys. J. B 2009: Σ 1/deg z, the RA refinement that outperforms AA on
dense graphs), preferential attachment (Barabási–Albert:
deg a · deg b), and raw common-neighbor counts — one query, one
wedge pass, three score columns, so the benchmark comparison the
link-prediction literature reports is a single table.

Exactness: common neighbors and preferential attachment are pure
integers; RA's 1/deg terms are exact DECIMAL (deg is a small
integer, 1/deg quantized at 10 decimals before the per-pair sum,
order-independent). Same scale-safe wedge enumeration as the
siblings: candidates come from the join on the SHARED neighbor —
never an all-non-edges cross.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.graph3 import _TOP_EDGES_SQL
from timestream_travel_spark.operators.graph4 import (
    LP_TOP_K,
    _sym,
    trade_edges,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_link_predictors",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    es AS MATERIALIZED (SELECT a, b FROM edges),
    sym AS MATERIALIZED (
      SELECT a AS u, b AS w FROM es
      UNION ALL SELECT b, a FROM es
    ), deg AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS degree FROM sym GROUP BY u
    ), wedge AS (
      SELECT s1.u AS a, s2.u AS b, s1.w AS z
      FROM sym s1 JOIN sym s2 ON s1.w = s2.w AND s1.u < s2.u
    ), sc AS (
      SELECT w.a, w.b,
             CAST(COUNT(*) AS BIGINT) AS common,
             CAST(CAST(SUM(CAST(1.0 / dz.degree AS DECIMAL(16,10)))
                       AS VARCHAR) AS DOUBLE) AS ra_score
      FROM wedge w JOIN deg dz ON dz.u = w.z
      GROUP BY w.a, w.b
    ), nonedge AS (
      SELECT sc.* FROM sc ANTI JOIN es e ON e.a = sc.a AND e.b = sc.b
    )
    SELECT na.n_name AS nation_a, nb.n_name AS nation_b,
           ne.common AS common_neighbors,
           round(ne.ra_score, 6) AS resource_allocation,
           CAST(da.degree * db.degree AS BIGINT) AS preferential_attachment
    FROM nonedge ne
    JOIN deg da ON da.u = ne.a
    JOIN deg db ON db.u = ne.b
    JOIN nation na ON na.n_nationkey = ne.a
    JOIN nation nb ON nb.n_nationkey = ne.b
    ORDER BY resource_allocation DESC, nation_a, nation_b
    LIMIT {LP_TOP_K}
    """,
)
def q_link_predictors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common neighbors, resource allocation RA(a,b) = Σ_{{z}} 1/deg z
    and preferential attachment deg a · deg b for every non-edge
    candidate pair of the top-revenue trade backbone — the three-way
    score table the link-prediction literature benchmarks against
    q_adamic_adar's AA. Top-{LP_TOP_K} by RA with name tiebreak.

    Plan: ONE wedge join (the shared neighbor z enumerates
    candidates — never all non-edges) with z's degree joined before
    aggregation; endpoint degrees broadcast back for PA. RA's 1/deg
    terms quantize to DECIMAL(16,10) (deg ≥ 1 integer) so the
    per-pair sum is order-independent."""
    edges = trade_edges(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sym = _sym(edges)
    deg = sym.groupBy("u").agg(F.count("*").cast("bigint").alias("degree"))
    s1 = sym.select(F.col("u").alias("a"), F.col("w").alias("w1"))
    s2 = sym.select(F.col("u").alias("b"), F.col("w").alias("w2"))
    wedge = s1.join(
        s2, (F.col("w1") == F.col("w2")) & (F.col("a") < F.col("b"))
    ).select("a", "b", F.col("w1").alias("z"))
    dz = deg.select(F.col("u").alias("z"), "degree")
    sc = (
        wedge.join(F.broadcast(dz), "z")
        .groupBy("a", "b")
        .agg(
            F.count("*").cast("bigint").alias("common"),
            F.sum((F.lit(1.0) / F.col("degree")).cast("decimal(16,10)"))
            .cast("double")
            .alias("ra_score"),
        )
    )
    nonedge = sc.join(
        edges.select(F.col("a").alias("ea"), F.col("b").alias("eb")),
        (F.col("a") == F.col("ea")) & (F.col("b") == F.col("eb")),
        "left_anti",
    )
    da = deg.select(F.col("u").alias("ka_d"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("u").alias("kb_d"), F.col("degree").alias("deg_b"))
    na = nation.select(
        F.col("n_nationkey").alias("ka"), F.col("n_name").alias("nation_a")
    )
    nb = nation.select(
        F.col("n_nationkey").alias("kb"), F.col("n_name").alias("nation_b")
    )
    return (
        nonedge.join(F.broadcast(da), F.col("a") == F.col("ka_d"))
        .join(F.broadcast(db), F.col("b") == F.col("kb_d"))
        .join(F.broadcast(na), F.col("a") == F.col("ka"))
        .join(F.broadcast(nb), F.col("b") == F.col("kb"))
        .select(
            "nation_a",
            "nation_b",
            F.col("common").alias("common_neighbors"),
            F.round(F.col("ra_score"), 6).alias("resource_allocation"),
            (F.col("deg_a") * F.col("deg_b"))
            .cast("bigint")
            .alias("preferential_attachment"),
        )
        .orderBy(F.desc("resource_allocation"), "nation_a", "nation_b")
        .limit(LP_TOP_K)
    )
