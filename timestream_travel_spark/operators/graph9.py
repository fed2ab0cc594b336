"""Graph analytics, part 9 (round 11): k-core extraction (Seidman,
Social Networks 1983) on the top-revenue trade backbone — the
maximal subgraph in which every node keeps degree ≥ k, by the
standard peeling iteration: repeatedly drop nodes whose degree among
SURVIVORS falls below k. The k-core is the classic graph-robustness
/ nucleus statistic the backbone family (degree census, rich club,
clustering coefficient, LPA) did not yet cover.

Exactness: pure integer degree censuses; the peel unrolls a FIXED
{KCORE_ROUNDS} rounds in both engines (the q_label_propagation
determinism trade) — the pytest asserts the fixpoint is actually
reached on the fixture (round r+1 removes nobody), so the fixed
unroll IS the true k-core there, and both engines agree by
construction even before the fixpoint.

Scale shape: the heavy stage stays graph3's fact-table edge
extraction (paid once); each peel round is one degree census + one
semi-join on the ≤2·TOP_EDGES-row symmetrized backbone — the Pregel
superstep shape again, fixed rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.graph3 import (
    _TOP_EDGES_SQL,
    top_trade_edges,
)
from timestream_travel_spark.registry import query

KCORE_K = 3
KCORE_ROUNDS = 6


def _kcore_sql() -> str:
    """Unrolled peeling CTE chain ending in `s{KCORE_ROUNDS}`
    (node): survivors after each round's degree-≥-k filter."""
    ctes = [
        "es AS MATERIALIZED (SELECT a, b FROM edges)",
        "sym AS MATERIALIZED (SELECT a AS u, b AS v FROM es"
        " UNION ALL SELECT b, a FROM es)",
        "s0 AS (SELECT DISTINCT u AS node FROM sym)",
    ]
    for it in range(1, KCORE_ROUNDS + 1):
        prev, cur = f"s{it - 1}", f"s{it}"
        ctes.append(
            f"""{cur} AS (
      SELECT s.u AS node
      FROM sym s
      JOIN {prev} pu ON pu.node = s.u
      JOIN {prev} pv ON pv.node = s.v
      GROUP BY s.u HAVING COUNT(*) >= {KCORE_K}
    )"""
        )
    return ",\n    ".join(ctes)


@query(
    "q_kcore_membership",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    {_kcore_sql()},
    deg AS (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM sym GROUP BY u
    )
    SELECT d.node, d.degree,
           CASE WHEN k.node IS NOT NULL THEN 1 ELSE 0 END AS in_kcore
    FROM deg d LEFT JOIN s{KCORE_ROUNDS} k ON k.node = d.node
    """,
)
def q_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_K}-core membership of every backbone node after
    {KCORE_ROUNDS} fixed peel rounds, beside its full-graph degree
    (so `degree ≥ {KCORE_K}` but `in_kcore = 0` rows expose nodes the
    peel cascaded away — the statistic's whole point).

    r15: the fixed-round peel runs driver-side over the collected
    backbone (bounded driver state, pure integer — the q_kcore_trade
    pattern in THIS module's own sibling; was {KCORE_ROUNDS} Spark
    rounds of semi-join+checkpoint ≈ 8 jobs)."""
    from timestream_travel_spark.operators.graph_kit import collect_sym

    nodes, adj, _ = collect_sym(spark, sf_dir)
    surv = set(nodes)
    for _ in range(KCORE_ROUNDS):
        surv = {u for u in surv if len([v for v in adj[u] if v in surv]) >= KCORE_K}
    from timestream_travel_spark.tables import bounded_df

    rows = sorted(
        (u, len(adj[u]), 1 if u in surv else 0) for u in nodes
    )
    return bounded_df(spark, rows, "node int, degree bigint, in_kcore int")
