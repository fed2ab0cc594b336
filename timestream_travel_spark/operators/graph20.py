"""Graph analytics, part 20 (round-16 STAGED wave): SimRank
(Jeh & Widom, KDD 2002 — "two objects are similar if they are
referenced by similar objects") on the top-revenue trade backbone
(graph3's ≤{TOP_EDGES}-edge, ≤25-node convention), undirected
neighbor form with C = 0.8.

Exactness: TRUNCATED FIXED-POINT convention (the HITS / PageRank /
betweenness family, graph5.py:292): similarities iterate at scale
10¹² as BIGINTs, s'(u,v) = (8·Σ_{{a∈N(u),b∈N(v)}} s(a,b)) DIV
(10·deg(u)·deg(v)) with s'(u,u) ≡ 10¹², {SIM_ITERS} synchronous
rounds from the identity start. Dividends are < 8·24²·10¹² ≈
4.6·10¹⁵ < 2⁵³ (backbone degree ≤ 24 — pinned in pytest), so
integer DIV agrees exactly in Python bigint, Spark and DuckDB
(HUGEINT-exact sums on the oracle side, CAST back to BIGINT).

Scale shape: the heavy stage is the backbone extraction (priced in
graph3); the iteration runs driver-side on the collected ≤100-row
edge table — the documented bounded-backbone pattern (ROADMAP r13;
Louvain/kcore precedents). The distributed path for an unbounded
graph (pair-table joins per round, exactly the oracle's aggk
shape) is what the oracle replays.

Reference parity: none — north-star derived capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.graph3 import (
    TOP_EDGES,
    _TOP_EDGES_SQL,
    top_trade_edges,
)
from timestream_travel_spark.registry import query

SIM_ITERS = 5
SIM_SCALE = 10**12
SIM_TOPK = 20


def _simrank_iter_sql(k: int) -> str:
    return f"""agg{k} AS MATERIALIZED (
      SELECT ua.u AS a, ub.u AS b, SUM(sp.s) AS ssum
      FROM und ua, und ub, s{k - 1} sp
      WHERE sp.a = ua.v AND sp.b = ub.v
      GROUP BY 1, 2
    ), s{k} AS MATERIALIZED (
      SELECT p.a, p.b,
             CAST(CASE WHEN p.a = p.b THEN {SIM_SCALE}
                  ELSE (8 * COALESCE(g.ssum, 0)) // (10 * da.d * db.d)
             END AS BIGINT) AS s
      FROM pairs p
      JOIN deg da ON da.u = p.a
      JOIN deg db ON db.u = p.b
      LEFT JOIN agg{k} g ON g.a = p.a AND g.b = p.b
    )"""


@query(
    "q_simrank_backbone",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    und AS MATERIALIZED (
      SELECT a AS u, b AS v FROM edges
      UNION ALL SELECT b AS u, a AS v FROM edges
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT u FROM und
    ), deg AS MATERIALIZED (
      SELECT u, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u
    ), pairs AS MATERIALIZED (
      SELECT n1.u AS a, n2.u AS b FROM nodes n1, nodes n2
    ), s0 AS MATERIALIZED (
      SELECT a, b,
             CAST(CASE WHEN a = b THEN {SIM_SCALE} ELSE 0 END AS BIGINT) AS s
      FROM pairs
    ), {", ".join(_simrank_iter_sql(k) for k in range(1, SIM_ITERS + 1))}
    SELECT CAST(a AS BIGINT) AS node_a, CAST(b AS BIGINT) AS node_b,
           s AS simrank_fp,
           CAST(s AS DOUBLE) / {SIM_SCALE} AS simrank
    FROM s{SIM_ITERS}
    WHERE a < b
    ORDER BY s DESC, a, b
    LIMIT {SIM_TOPK}
    """,
)
def q_simrank_backbone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{SIM_TOPK} SimRank pairs on the trade backbone after
    {SIM_ITERS} truncated fixed-point rounds (module docstring);
    driver-side loop on the collected bounded edge table with the
    SAME integer algebra as the oracle's unrolled iterations."""
    edges = [(r["a"], r["b"]) for r in top_trade_edges(spark, sf_dir).collect()]
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    nodes = sorted(nbrs)
    s = {(u, v): (SIM_SCALE if u == v else 0) for u in nodes for v in nodes}
    for _ in range(SIM_ITERS):
        nxt = {}
        for u in nodes:
            for v in nodes:
                if u == v:
                    nxt[(u, v)] = SIM_SCALE
                    continue
                acc = 0
                for a in nbrs[u]:
                    for b in nbrs[v]:
                        acc += s[(a, b)]
                nxt[(u, v)] = (8 * acc) // (10 * len(nbrs[u]) * len(nbrs[v]))
        s = nxt
    ranked = sorted(
        ((u, v, sv) for (u, v), sv in s.items() if u < v),
        key=lambda x: (-x[2], x[0], x[1]),
    )[:SIM_TOPK]
    return spark.createDataFrame(
        [(u, v, sv, sv / SIM_SCALE) for u, v, sv in ranked],
        "node_a bigint, node_b bigint, simrank_fp bigint, simrank double",
    )
