"""Round-15 STAGED graph analytics: bridges (cut edges) and
articulation points (cut vertices) of the trade backbone — the two
classical robustness censuses (Tarjan, SIAM J. Comput. 1972 gives the
linear-time algorithm; here the bounded ≤25-node backbone admits the
simpler removal-recount form): an edge/vertex is critical iff its
removal increases the number of connected components.

Exactness / convention: components are counted by {LP_ROUNDS}-round
MIN-LABEL propagation (label = own id, then lbl ← min(lbl, labels of
neighbors), unrolled) — {LP_ROUNDS} ≥ n−1 guarantees convergence on
the ≤25-node backbone, so the count equals true connected components
and each label is the component's minimum node id. The DuckDB oracle
runs the propagation once per removal candidate (plus the intact
baseline) over a (removal × half-edge) fan-out that stays ≤ |E|²
rows; Spark collects the bounded edge set ONCE and runs exact BFS
driver-side (the Louvain/HL bounded-backbone pattern — min-id BFS
labels ≡ converged min-label propagation). All outputs are integers.

Scale shape: the heavy stage is graph3's fact-table edge extraction;
everything after runs on the ≤{{TOP_EDGES}}-edge backbone. At larger
backbones the removal-recount form degrades quadratically — the
documented scale path is Tarjan's low-link DFS driver-side (the
backbone stays collectible by construction).

Reference parity: none — north-star derived capability, sibling of
graph15/16/17.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.graph3 import (
    _TOP_EDGES_SQL,
    top_trade_edges,
)
from timestream_travel_spark.registry import query

LP_ROUNDS = 24  # ≥ n−1 on the ≤25-node backbone → guaranteed converged


def _lp_sql(removal_kind: str) -> str:
    """Unrolled min-label propagation per removal candidate.

    removal_kind = 'edge': candidates are edge ids (0 = intact
    baseline); half-edges of the removed edge are excluded.
    removal_kind = 'node': candidates are node ids (−1 = baseline);
    the removed node and its half-edges are excluded.
    Ends in `comp` (rid, nc = component count)."""
    if removal_kind == "edge":
        ctes = [
            "eid AS MATERIALIZED (SELECT a, b, CAST(row_number() OVER"
            " (ORDER BY a, b) AS BIGINT) AS id FROM edges)",
            "removals AS (SELECT CAST(0 AS BIGINT) AS rid"
            " UNION ALL SELECT id FROM eid)",
            "symh AS MATERIALIZED (SELECT id, a AS u, b AS v FROM eid"
            " UNION ALL SELECT id, b, a FROM eid)",
            "hedges AS MATERIALIZED (SELECT r.rid, s.u, s.v"
            " FROM removals r JOIN symh s ON s.id <> r.rid)",
            "nodes AS (SELECT DISTINCT u AS n FROM symh)",
            "s0 AS (SELECT r.rid, nd.n AS node, nd.n AS lbl"
            " FROM removals r CROSS JOIN nodes nd)",
        ]
    else:
        ctes = [
            "symh AS MATERIALIZED (SELECT a AS u, b AS v FROM edges"
            " UNION ALL SELECT b, a FROM edges)",
            "nodes AS (SELECT DISTINCT u AS n FROM symh)",
            "removals AS (SELECT CAST(-1 AS BIGINT) AS rid"
            " UNION ALL SELECT CAST(n AS BIGINT) FROM nodes)",
            "hedges AS MATERIALIZED (SELECT r.rid, s.u, s.v"
            " FROM removals r JOIN symh s"
            " ON s.u <> r.rid AND s.v <> r.rid)",
            "s0 AS (SELECT r.rid, nd.n AS node, nd.n AS lbl"
            " FROM removals r JOIN nodes nd ON nd.n <> r.rid)",
        ]
    for k in range(1, LP_ROUNDS + 1):
        ctes.append(
            f"""s{k} AS MATERIALIZED (
      SELECT s.rid, s.node, least(s.lbl, COALESCE(m.ml, s.lbl)) AS lbl
      FROM s{k - 1} s LEFT JOIN (
        SELECT h.rid, h.v AS node, MIN(p.lbl) AS ml
        FROM hedges h JOIN s{k - 1} p ON p.rid = h.rid AND p.node = h.u
        GROUP BY h.rid, h.v
      ) m ON m.rid = s.rid AND m.node = s.node
    )"""
        )
    ctes.append(
        f"comp AS (SELECT rid, CAST(COUNT(DISTINCT lbl) AS BIGINT) AS nc"
        f" FROM s{LP_ROUNDS} GROUP BY rid)"
    )
    return ",\n    ".join(ctes)


def _components(nodes: list, adj: dict, skip_node=None, skip_edge=None) -> int:
    """Exact BFS component count with optional node/edge removal."""
    seen: set = set()
    nc = 0
    for s in nodes:
        if s == skip_node or s in seen:
            continue
        nc += 1
        seen.add(s)
        q = deque([s])
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v == skip_node or v in seen:
                    continue
                if skip_edge and (min(u, v), max(u, v)) == skip_edge:
                    continue
                seen.add(v)
                q.append(v)
    return nc


def _backbone(spark: SparkSession, sf_dir: str):
    edges = sorted(
        (min(r.a, r.b), max(r.a, r.b))
        for r in top_trade_edges(spark, sf_dir).collect()
    )
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return edges, sorted(adj), adj


@query(
    "q_bridge_edges",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    {_lp_sql("edge")}
    SELECT e.a, e.b, base.nc AS n_components,
           c.nc AS n_components_removed,
           CAST(CASE WHEN c.nc > base.nc THEN 1 ELSE 0 END AS INT)
             AS is_bridge
    FROM eid e
    JOIN comp c ON c.rid = e.id
    CROSS JOIN (SELECT nc FROM comp WHERE rid = 0) base
    """,
)
def q_bridge_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bridge census of the trade backbone: per edge, the component
    count after removing it vs the intact baseline (module-docstring
    convention — converged min-label ≡ BFS components); is_bridge = 1
    iff removal disconnects."""
    edges, nodes, adj = _backbone(spark, sf_dir)
    base = _components(nodes, adj)
    rows = [
        (a, b, base, _components(nodes, adj, skip_edge=(a, b)))
        for a, b in edges
    ]
    return spark.createDataFrame(
        [(a, b, nc0, nc1, 1 if nc1 > nc0 else 0) for a, b, nc0, nc1 in rows],
        "a int, b int, n_components bigint, n_components_removed bigint,"
        " is_bridge int",
    )


@query(
    "q_articulation_points",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    {_lp_sql("node")}
    SELECT nd.n AS node, base.nc AS n_components,
           c.nc AS n_components_removed,
           CAST(CASE WHEN c.nc > base.nc THEN 1 ELSE 0 END AS INT)
             AS is_articulation
    FROM nodes nd
    JOIN comp c ON c.rid = nd.n
    CROSS JOIN (SELECT nc FROM comp WHERE rid = -1) base
    """,
)
def q_articulation_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Articulation-point census of the trade backbone: per node, the
    component count among the REMAINING nodes after its removal vs
    the intact baseline; is_articulation = 1 iff removal splits the
    rest (same converged-propagation convention as q_bridge_edges)."""
    edges, nodes, adj = _backbone(spark, sf_dir)
    base = _components(nodes, adj)
    rows = [
        (n, base, _components(nodes, adj, skip_node=n)) for n in nodes
    ]
    return spark.createDataFrame(
        [(n, nc0, nc1, 1 if nc1 > nc0 else 0) for n, nc0, nc1 in rows],
        "node int, n_components bigint, n_components_removed bigint,"
        " is_articulation int",
    )
