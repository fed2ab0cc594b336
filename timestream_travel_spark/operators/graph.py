"""Graph analytics over aggregated relational data: weighted
PageRank on the nation-to-nation trade network.

Companion to the FastSV connected components in dedup2.py — together
they cover the two standard iterative-graph shapes: CC over a
billion-edge similarity graph (edge-parallel, log-diameter rounds)
and centrality over an AGGREGATED graph whose node set is bounded
(here: 25 nations), where the 100 TB work is the edge extraction and
the iterations are a driver-coordinated loop over broadcast-sized
state, exactly like the k-means Lloyd loop in similarity2.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

N_NATIONS = 25  # TPC-H nation is a constant-size dimension
DAMPING = 0.85
TELEPORT = 0.15 / N_NATIONS  # identical literal both engines
PR_ITERS = 5


def _pagerank_sql() -> str:
    """Chained-CTE oracle: p0 = 1/N, then PR_ITERS exact steps.
    Every incoming-mass sum accumulates in DECIMAL(24,15) and every
    iterate is quantized to DECIMAL(20,12), so the fixpoint walk is
    order-independent and bit-identical on both engines."""
    base = f"""
    WITH e AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                  AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY s.s_nationkey, c.c_nationkey
    ), outw AS (
      SELECT src, CAST(SUM(CAST(w AS DECIMAL(24,4))) AS DOUBLE) AS tw
      FROM e GROUP BY src
    ), en AS (
      SELECT e.src, e.dst, e.w / outw.tw AS frac
      FROM e JOIN outw ON e.src = outw.src
    ), p0 AS (
      SELECT n_nationkey AS node, CAST(1.0 / {N_NATIONS} AS DOUBLE) AS p
      FROM nation
    )"""
    prev = "p0"
    steps = []
    for i in range(1, PR_ITERS + 1):
        steps.append(f""", p{i} AS (
      SELECT n.node,
             CAST(CAST({TELEPORT!r} + {DAMPING} * COALESCE(m.mass, 0.0)
                  AS DECIMAL(20,12)) AS DOUBLE) AS p
      FROM (SELECT node FROM p0) n
      LEFT JOIN (
        SELECT en.dst AS node,
               CAST(SUM(CAST({prev}.p * en.frac AS DECIMAL(24,15))) AS DOUBLE)
                 AS mass
        FROM en JOIN {prev} ON en.src = {prev}.node
        GROUP BY en.dst
      ) m ON n.node = m.node
    )""")
        prev = f"p{i}"
    return (
        base
        + "".join(steps)
        + f"""
    SELECT na.n_name AS nation, round({prev}.p, 10) AS pagerank
    FROM {prev} JOIN nation na ON {prev}.node = na.n_nationkey
    """
    )


@query("q_nation_pagerank", oracle=_pagerank_sql())
def q_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 5 synchronous iterations)
    over the nation trade graph: edge (supplier nation → customer
    nation) weighted by lineitem revenue — 'which economies sit at
    the center of the order flow'.

    Scale split: the expensive stage is the edge extraction — the
    same fact-fact shuffle as TPC-H Q7 — which reduces 100 TB of
    lineitem to ≤ 25×25 weighted edges. The iterations then run on
    that bounded table as chained DataFrame joins: each step's
    incoming-mass sums accumulate in DECIMAL(24,15) and each iterate
    quantizes to DECIMAL(20,12) (both engines), so five rounds of
    FP arithmetic stay bit-identical. Dangling-node mass is dropped
    (teleport-only), the common simplification; TPC-H's trade graph
    has no dangling nations."""
    en, na = _pagerank_edges(spark, sf_dir)
    # r15 (the graph_kit pattern): the normalized edge table is
    # bounded by the CONSTANT nation dimension (≤ 25×25 rows), so the
    # five chained iterations run driver-side over the collected rows
    # instead of five join+agg rounds against a checkpoint (30 → ~5
    # Spark jobs; the fact-scale extraction stays distributed and
    # dominant). The decimal bridges are replayed exactly — see
    # _pagerank_iterate; strict-oracle-verified at 3 SFs, and the
    # distributed formulation stays below as
    # q_nation_pagerank_distributed with a parity pytest.
    en_rows = [(int(r.src), int(r.dst), float(r.frac)) for r in en.collect()]
    node_ids = [int(r.n_nationkey) for r in na.select("n_nationkey").collect()]
    p = _pagerank_iterate(en_rows, node_ids)
    from timestream_travel_spark.tables import bounded_df

    pdf = bounded_df(
        spark, [(n, p[n]) for n in node_ids], "node int, p double"
    )
    return pdf.join(F.broadcast(na), pdf.node == na.n_nationkey).select(
        F.col("n_name").alias("nation"), F.round("p", 10).alias("pagerank")
    )


def _pagerank_edges(spark: SparkSession, sf_dir: str):
    """(en, nation): the distributed fact-scale extraction — the only
    corpus-sized work — producing the ≤ N_NATIONS²-row normalized
    edge table (src, dst, frac). r16: the (src, dst, Σrev) census is
    the shared graph3.trade_pair_census (identical groupBy + DECIMAL
    sum; the cast to double is unchanged)."""
    from timestream_travel_spark.operators.graph3 import trade_pair_census

    na = load_table(spark, sf_dir, "nation")
    e = trade_pair_census(spark, sf_dir).select(
        "src", "dst", F.col("w").cast("double").alias("w")
    )
    outw = e.groupBy("src").agg(
        F.sum(F.col("w").cast("decimal(24,4)")).cast("double").alias("tw")
    )
    en = e.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("tw")).alias("frac")
    )
    return en, na


def _pagerank_iterate(en_rows, node_ids):
    """Driver-side replay of the PR_ITERS decimal-bridged power steps,
    bit-identical to the distributed/oracle formulation:

    - double → DECIMAL(s) casts round the SHORTEST-REPR decimal of the
      double HALF_UP (Java BigDecimal.valueOf(d) uses Double.toString,
      Python Decimal(repr(x)) the same shortest round-trip digits);
    - the DECIMAL(24,15) mass sum is exact integer-scaled arithmetic
      in both runtimes (order-independent);
    - DECIMAL → double is the correctly-rounded IEEE conversion in
      both (BigDecimal.doubleValue / float(Decimal));
    - TELEPORT + DAMPING·mass is the same flat double expression.
    """
    from decimal import ROUND_HALF_UP, Decimal

    q15, q12 = Decimal("1e-15"), Decimal("1e-12")
    p = {n: 1.0 / N_NATIONS for n in node_ids}
    for _ in range(PR_ITERS):
        acc: dict[int, Decimal] = {}
        for src, dst, frac in en_rows:
            term = Decimal(repr(p[src] * frac)).quantize(q15, ROUND_HALF_UP)
            acc[dst] = acc.get(dst, Decimal(0)) + term
        mass = {d: float(v) for d, v in acc.items()}
        p = {
            n: float(
                Decimal(repr(TELEPORT + DAMPING * mass.get(n, 0.0))).quantize(
                    q12, ROUND_HALF_UP
                )
            )
            for n in node_ids
        }
    return p


def q_nation_pagerank_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r15 distributed iteration (each power step a broadcast
    join + decimal agg against the checkpointed edge table) — kept as
    the documented path for graphs NOT bounded by a constant
    dimension; parity-pytested against the driver-side replay."""
    en, na = _pagerank_edges(spark, sf_dir)
    en = en.coalesce(1).localCheckpoint(eager=True)

    nodes = na.select(F.col("n_nationkey").alias("node"))
    p = nodes.select("node", F.lit(1.0 / N_NATIONS).alias("p"))
    for _ in range(PR_ITERS):
        mass = (
            en.join(F.broadcast(p), en.src == p.node)
            .groupBy(F.col("dst").alias("mnode"))
            .agg(
                F.sum((F.col("p") * F.col("frac")).cast("decimal(24,15)"))
                .cast("double")
                .alias("mass")
            )
        )
        p = nodes.join(mass, nodes.node == mass.mnode, "left").select(
            "node",
            (F.lit(TELEPORT) + F.lit(DAMPING) * F.coalesce("mass", F.lit(0.0)))
            .cast("decimal(20,12)")
            .cast("double")
            .alias("p"),
        )
    return p.join(F.broadcast(na), p.node == na.n_nationkey).select(
        F.col("n_name").alias("nation"), F.round("p", 10).alias("pagerank")
    )
