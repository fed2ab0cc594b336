"""Graph analytics, part 3: degree assortativity and k-core
decomposition on the thresholded nation trade graph.

Companions to q_nation_pagerank (graph.py) and q_triangle_count
(graph2.py). Those walk the FULL trade graph — which at sf ≥ 0.01 is
the complete K₂₅ (every nation trades with every other), where degree
statistics degenerate (all degrees equal → zero variance). So these
two queries first THRESHOLD to the top-{TOP_EDGES} undirected edges
by exact decimal trade revenue (deterministic tiebreak on the node
pair) — the 'significant trade links' backbone — which has genuine
degree structure at every SF.

100 TB shape: identical to the siblings — the heavy stage is the
fact-table edge extraction (broadcast-dim joins, map-side-combined
revenue agg to ≤ N²/2 weighted edges); the top-K cut is a TakeOrdered
over that bounded table, and everything after runs on ≤ {TOP_EDGES}
edges. The assortativity sums are pure integers (degrees), so the
Pearson correlation is bit-exact on both engines up to one final
sqrt (IEEE-correctly-rounded everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

TOP_EDGES = 100

_TOP_EDGES_SQL = f"""
  weighted AS (
    SELECT least(s.s_nationkey, c.c_nationkey) AS a,
           greatest(s.s_nationkey, c.c_nationkey) AS b,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS w
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE s.s_nationkey <> c.c_nationkey
    GROUP BY 1, 2
  ),
  edges AS (
    SELECT a, b FROM weighted ORDER BY w DESC, a, b LIMIT {TOP_EDGES}
  )
"""


def top_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_EDGES} undirected (a < b) nation pairs by exact
    decimal trade revenue — deterministic at every SF because the
    weight is an exact DECIMAL sum and ties break on the node pair."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .agg(F.sum(rev).alias("w"))
        .orderBy(F.desc("w"), "a", "b")
        .limit(TOP_EDGES)
        .select("a", "b")
    )


@query(
    "q_degree_assortativity",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    sym AS (
      SELECT a AS u, b AS v FROM edges
      UNION ALL
      SELECT b, a FROM edges
    ),
    deg AS (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY u
    ),
    pairs AS (
      SELECT du.d AS dx, dv.d AS dy
      FROM sym
      JOIN deg du ON du.node = sym.u
      JOIN deg dv ON dv.node = sym.v
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(dx) AS BIGINT) AS sx,
             CAST(SUM(dy) AS BIGINT) AS sy,
             CAST(SUM(dx * dy) AS BIGINT) AS sxy,
             CAST(SUM(dx * dx) AS BIGINT) AS sxx,
             CAST(SUM(dy * dy) AS BIGINT) AS syy
      FROM pairs
    )
    SELECT m AS n_endpoints,
           CAST(m * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                    * CAST(m * syy - sy * sy AS DOUBLE)) AS assortativity
    FROM sums
    """,
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the thresholded trade graph: the
    Pearson correlation of endpoint degrees over the symmetrized edge
    list (Newman, PRL 2002's degree-correlation measure in its common
    edge-list form) — positive means high-trade nations link to each
    other (rich-club), negative means hub-and-spoke.

    After the fact-scale edge extraction, everything runs on the
    ≤ 2·{TOP_EDGES}-row symmetrized list: one bounded degree
    aggregation, two broadcast-sized joins, one 6-sum reduce. Every
    sum is over integers (degrees), so both engines agree bit-exactly
    through the final sqrt (IEEE-correctly-rounded on every libm)."""
    edges = top_trade_edges(spark, sf_dir)
    sym = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    du = deg.select(F.col("node").alias("nu"), F.col("d").alias("dx"))
    dv = deg.select(F.col("node").alias("nv"), F.col("d").alias("dy"))
    pairs = (
        sym.join(F.broadcast(du), sym.u == du.nu)
        .join(F.broadcast(dv), sym.v == dv.nv)
        .select("dx", "dy")
    )
    sums = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("dx").cast("bigint").alias("sx"),
        F.sum("dy").cast("bigint").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("bigint").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("bigint").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("syy"),
    )
    m, sx, sy = F.col("m"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return sums.select(
        m.alias("n_endpoints"),
        (
            (m * sxy - sx * sy).cast("double")
            / F.sqrt(
                (m * sxx - sx * sx).cast("double") * (m * syy - sy * sy).cast("double")
            )
        ).alias("assortativity"),
    )


def kcore_decomposition(
    edges: DataFrame, max_rounds: int = 200, stats: dict | None = None
) -> DataFrame:
    """(node, core) for every node in the undirected `edges` (a, b)
    frame: core = the largest k such that the node survives in the
    k-core (the maximal subgraph where every node has degree ≥ k).

    Distributed peeling (the classic Matula–Beck order, public,
    expressed as bounded Spark rounds): for k = 1, 2, …, repeatedly
    delete nodes whose CURRENT degree is < k; nodes deleted while
    peeling at level k get core = k − 1; when no node has degree < k
    the loop advances k. Each round is one degree aggregation + one
    anti-join, with the surviving edge set localCheckpoint'ed so
    lineage stays flat. Total rounds ≤ max-core + number of
    cascade rounds — degeneracy-bounded, NOT diameter-bounded (a
    50-round chain cascade at the same k is many rounds but each is
    one cheap job on a shrinking edge set).

    `stats`, when given, receives {"rounds": n} for test assertions.
    """
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                    F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    cores = sym.sparkSession.createDataFrame([], "node bigint, core bigint")
    # explicit alive set: a node whose last edges vanish because its
    # NEIGHBORS were deleted has no rows left in `remaining`, so an
    # edge-side degree groupBy would silently drop it — the left join
    # gives such survivors degree 0 and they peel on the next round
    alive = sym.select(F.col("u").alias("node")).distinct().localCheckpoint(eager=True)
    k = 1
    rounds = 0
    remaining = sym
    while rounds < max_rounds:
        rounds += 1
        edge_deg = remaining.groupBy(F.col("u").alias("dnode")).agg(
            F.count(F.lit(1)).alias("d0")
        )
        deg = alive.join(edge_deg, alive.node == F.col("dnode"), "left").select(
            "node", F.coalesce("d0", F.lit(0)).alias("d")
        )
        below = deg.filter(F.col("d") < k).select("node").localCheckpoint(eager=True)
        if below.count() == 0:
            if alive.count() == 0:
                break
            k += 1
            continue
        cores = cores.unionAll(
            below.select(
                F.col("node").cast("bigint").alias("node"),
                F.lit(k - 1).cast("bigint").alias("core"),
            )
        )
        alive = alive.join(below, "node", "left_anti").localCheckpoint(eager=True)
        remaining = (
            remaining.join(
                below.withColumnRenamed("node", "du"), remaining.u == F.col("du"), "left_anti"
            )
            .join(
                below.withColumnRenamed("node", "dv"), remaining.v == F.col("dv"), "left_anti"
            )
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(f"kcore_decomposition did not finish in {max_rounds} rounds")
    if stats is not None:
        stats["rounds"] = rounds
    return cores


@query("q_kcore_trade")
def q_kcore_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core number of every nation in the thresholded trade graph —
    the standard graph-degeneracy peel (k-core): which nations remain
    in the densest mutually-trading backbone. Iterative (rows-only by
    design — recursive CTEs cannot aggregate inside the recursion);
    correctness is pinned by a pure-Python peeling parity test on
    random graphs (tests/test_round5_wave3.py)."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cores = kcore_decomposition(top_trade_edges(spark, sf_dir))
    return (
        cores.join(F.broadcast(nation), cores.node == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"), "core")
        .orderBy(F.desc("core"), "nation")
    )
