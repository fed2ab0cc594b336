"""Driver-side bounded-backbone graph toolkit (round-15 optimization).

The backbone-graph family iterates over a ≤TOP_EDGES-edge /
≤N_NATIONS-node graph, but until r15 each query ran its iteration as
per-round Spark jobs with eager localCheckpoints — 10-14 jobs of pure
scheduling overhead per query at any scale, because the iterated
state is bounded driver state by construction (the same argument, and
the same fix, as q_kcore_trade's r14 conversion: collect the bounded
backbone once, iterate driver-side, keep the distributed formulation
documented for unbounded graphs).

Everything here is INTEGER arithmetic — BFS layers, path counts,
scaled fixed-point iterates — so the driver-side results are
bit-identical to the distributed ones (no float op anywhere; the
queries keep their final float expressions in Spark, unchanged).
Python's arbitrary-precision ints make the DECIMAL(38,0)/HUGEINT
widenings of the distributed/oracle formulations exact by default;
`//` on the non-negative operands used here equals Spark's `div` and
DuckDB's `//`.

Scale note (guide §1.2): the heavy stage of every consumer stays the
distributed fact-table edge extraction (graph3.top_trade_edges — at
100 TB that is the only corpus-sized work); only the ≤|V|²-row
iteration state moves to the driver.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def collect_sym(spark: SparkSession, sf_dir: str):
    """(nodes, adj) of the symmetrized top-trade backbone — one Spark
    job (the fact-scale extraction), bounded driver state out."""
    from timestream_travel_spark.operators.graph3 import top_trade_edges

    edges = [(int(r.a), int(r.b)) for r in top_trade_edges(spark, sf_dir).collect()]
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    return nodes, {n: sorted(vs) for n, vs in adj.items()}, sorted(edges)


def bfs_distances(nodes, adj, max_d: int) -> dict:
    """{(src, v): d} for every pair reachable within max_d hops,
    including (src, src): 0 — exactly the fixed-round min-plus
    relaxation table d{max_d} of graph12's _dist_sql()."""
    dist: dict = {}
    for s in nodes:
        dist[(s, s)] = 0
        frontier = [s]
        seen = {s}
        for d in range(1, max_d + 1):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in seen:
                        seen.add(v)
                        dist[(s, v)] = d
                        nxt.append(v)
            if not nxt:
                break
            frontier = nxt
    return dist


def sigma_counts(nodes, adj, dist, max_d: int) -> dict:
    """{(src, v): (d, sigma)} — the Brandes forward pass over the
    truncated distance table: σ(s,s)=1; σ at layer r sums the σ of
    layer-(r−1) neighbors (graph13.sigma_table / _sigma_sql)."""
    sigma: dict = {}
    for s in nodes:
        sigma[(s, s)] = (0, 1)
        cur = {s: 1}
        for r in range(1, max_d + 1):
            layer: dict = {}
            for u, sg in cur.items():
                for v in adj[u]:
                    if dist.get((s, v)) == r:
                        layer[v] = layer.get(v, 0) + sg
            if not layer:
                break
            for v, sg in layer.items():
                sigma[(s, v)] = (r, sg)
            cur = layer
    return sigma
