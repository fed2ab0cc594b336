"""Graph analytics, part 14 (promoted into load_all()'s round-13 tail): the co-purchase
backbone — the market-basket pair graph (Agrawal & Srikant, VLDB
1994 association-rule censuses, reduced to the pair level): which
part pairs appear in the same order far more often than chance,
scored by support and lift.

Exactness: supports are exact integer censuses of DISTINCT
(order, part) incidence; lift = n_co·N / (n_a·n_b) is one flat
double division of exact integers, rounded at the boundary; the
top-k cut is deterministic (support DESC, part-pair ASC).

Scale shape: the pair fan-out is per-ORDER (≤ C(13,2) = 78 pairs per
order at any SF — order size is domain-bounded, not data-bounded),
so the self-join explodes linearly in orders, map-side combines into
the pair census, and only the census shuffles. Part supports are one
more census on the same incidence table; the 1-row order total
broadcasts. No stage is quadratic in parts or orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

COPURCHASE_TOP_K = 50


@query(
    "q_copurchase_pairs",
    oracle=f"""
    WITH inc AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), pairs AS (
      SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS n_co
      FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
    ), sup AS (
      SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM inc GROUP BY p
    ), tot AS (
      SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM inc
    ), scored AS (
      SELECT pr.pa, pr.pb, pr.n_co, sa.n AS n_a, sb.n AS n_b,
             t.n_orders,
             round(CAST(pr.n_co AS DOUBLE) * t.n_orders
                   / (sa.n * sb.n), 6) AS lift
      FROM pairs pr
      JOIN sup sa ON sa.p = pr.pa
      JOIN sup sb ON sb.p = pr.pb
      CROSS JOIN tot t
    )
    SELECT pa, pb, n_co, n_a, n_b, n_orders, lift
    FROM scored
    ORDER BY n_co DESC, pa, pb LIMIT {COPURCHASE_TOP_K}
    """,
)
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{COPURCHASE_TOP_K} co-purchased part pairs by exact
    co-order support, with per-part supports and the lift ratio
    n_co·N/(n_a·n_b) (>1 ⇒ the parts co-occur more than independent
    purchasing would predict). The per-order pair fan-out is bounded
    by order size (≤13 items at every SF), so the self-join is
    linear in orders."""
    # r15 (guide §2.4 remove shuffles outright): the r13 form
    # persisted the distinct (o, p) incidence and SELF-JOINED it on o
    # — one exchange per join side plus the persist. Order size is
    # domain-bounded (≤13 items), so the per-order pair fan-out is
    # better generated IN-ROW: one exchange builds the per-order
    # sorted distinct part set, pairs/supports/total all derive from
    # that single spine with no join. Exactness unchanged: n_co still
    # counts distinct (order, part-pair) incidence, sup the distinct
    # (order, part) incidence, tot the distinct orders.
    orders = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o")
        .agg(F.array_sort(F.collect_set("p")).alias("parts"))
    )
    ps = F.col("parts")
    pair_structs = F.flatten(
        F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + 2, F.size(ps)),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    pairs = (
        orders.select(F.explode(pair_structs).alias("pr"))
        .select("pr.pa", "pr.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_co"))
    )
    sup = (
        orders.select(F.explode("parts").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = orders.agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    scored = (
        pairs.join(sup.select(F.col("p").alias("pa"), F.col("n").alias("n_a")), "pa")
        .join(sup.select(F.col("p").alias("pb"), F.col("n").alias("n_b")), "pb")
        .crossJoin(F.broadcast(tot))
        .select(
            "pa",
            "pb",
            "n_co",
            "n_a",
            "n_b",
            "n_orders",
            F.round(
                F.col("n_co").cast("double")
                * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
    # r15 (guide §2.5 single-task stragglers): row_number over a
    # GLOBAL window forced every pair row through one WindowExec
    # task; the rank key (n_co desc, pa, pb) is a total order and rn
    # was dropped, so top-K under it is exactly orderBy().limit() —
    # planned as TakeOrderedAndProject, a parallel bounded heap.
    return scored.orderBy(
        F.desc("n_co"), F.asc("pa"), F.asc("pb")
    ).limit(COPURCHASE_TOP_K)
