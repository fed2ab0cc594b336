"""Graph analytics, part 7 (round 10): community detection on the
top-revenue trade backbone — synchronous label propagation
(Raghavan, Albert & Kumara, Phys. Rev. E 2007) made DETERMINISTIC
(fixed iteration count, most-frequent-neighbor-label updates with a
smallest-label tiebreak — the async random-order variant of the
paper is replaced by the synchronous deterministic form so both
engines compute the identical partition), and the Newman–Girvan
modularity of the resulting partition (Newman & Girvan, Phys. Rev.
E 2004) — the one classical graph family (communities) the
graph3–graph6 backbone suite did not yet cover.

Exactness: labels are integer nation keys; each LPA round is an
integer neighbor-label frequency census with a lexicographic
(count DESC, label ASC) argmax — exactly expressible in both
engines — and {LPA_ITERS} rounds unroll into chained CTEs in the
oracle. Modularity is assembled from exact integers (intra-community
edge counts e_c, community degree sums D_c, edge total m) via
Q = (4m·Σe_c − ΣD_c²) / (4m²) — one double division at the end.

Scale shape: the heavy stage is graph3's fact-table edge extraction
(broadcast dims + map-side revenue agg, paid once and persisted);
every LPA round is a join+census on the ≤2·{TOP_EDGES}-row
symmetrized edge list. At a real 100 TB graph the same synchronous
update is the textbook Pregel iteration: label table partitioned by
node, edge-partitioned join per superstep — the plan shape here IS
that superstep, looped a fixed number of times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.graph3 import (
    TOP_EDGES,
    _TOP_EDGES_SQL,
    top_trade_edges,
)
from timestream_travel_spark.registry import query

LPA_ITERS = 4  # fixed synchronous rounds (converges in 2-3 on the backbone)


def _lpa_sql(final: str) -> str:
    """Unrolled synchronous-LPA CTE chain ending in `{final}`
    (node, lab). l0 seeds every node with its own key; each round
    adopts the most frequent neighbor label, ties to the smallest."""
    ctes = [
        "es AS MATERIALIZED (SELECT a, b FROM edges)",
        "sym AS MATERIALIZED (SELECT a AS u, b AS v FROM es"
        " UNION ALL SELECT b, a FROM es)",
        "l0 AS (SELECT DISTINCT u AS node, u AS lab FROM sym)",
    ]
    for it in range(1, LPA_ITERS + 1):
        prev, cur = f"l{it - 1}", f"l{it}" if it < LPA_ITERS else final
        ctes.append(
            f"""{cur} AS (
      SELECT u AS node, lab FROM (
        SELECT s.u, p.lab, COUNT(*) AS c,
               row_number() OVER (PARTITION BY s.u
                                  ORDER BY COUNT(*) DESC, p.lab) AS rn
        FROM sym s JOIN {prev} p ON p.node = s.v
        GROUP BY s.u, p.lab
      ) WHERE rn = 1
    )"""
        )
    return ",\n    ".join(ctes)


def _lpa_driver(spark: SparkSession, sf_dir: str, backbone=None) -> dict:
    """{node: lab} after {LPA_ITERS} synchronous rounds, computed
    driver-side over the collected backbone (r15 — bounded driver
    state, pure integer, the q_kcore_trade pattern; each round adopts
    the most frequent neighbor label, ties to the smallest — the
    exact tiebreak of the distributed window rank below). `backbone`
    (a collect_sym result) lets callers share one extraction job."""
    from timestream_travel_spark.operators.graph_kit import collect_sym

    nodes, adj, _ = backbone if backbone is not None else collect_sym(spark, sf_dir)
    lab = {n: n for n in nodes}
    for _ in range(LPA_ITERS):
        new = {}
        for u in nodes:
            counts: dict[int, int] = {}
            for v in adj[u]:
                counts[lab[v]] = counts.get(lab[v], 0) + 1
            new[u] = min(counts, key=lambda k: (-counts[k], k))
        lab = new
    return lab


def _lpa_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, lab) after {LPA_ITERS} synchronous rounds — driver-side
    since r15 (see _lpa_driver); _lpa_labels_distributed keeps the
    Pregel-shaped plan as the documented unbounded-graph path."""
    from timestream_travel_spark.tables import bounded_df

    lab = _lpa_driver(spark, sf_dir)
    return bounded_df(
        spark, sorted((n, int(c)) for n, c in lab.items()), "node int, lab int"
    )


def _lpa_labels_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r15 distributed rounds. The symmetrized edge table is
    persisted ONCE — every round's join re-scans the
    ≤2·{TOP_EDGES}-row cache, never the 4-table fact extraction (the
    graph5 plan-audit lesson). Parity with _lpa_labels is pinned in
    test_r15_optimization."""
    e = top_trade_edges(spark, sf_dir)
    sym = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .persist()
    )
    lab = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    w = Window.partitionBy("u").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(LPA_ITERS):
        # explicit aliases: lab derives FROM sym after round 1, so
        # bare column refs would be ambiguous in the self-join
        lab = (
            sym.alias("s")
            .join(lab.alias("p"), F.col("p.node") == F.col("s.v"))
            .groupBy(F.col("s.u").alias("u"), F.col("p.lab").alias("lab"))
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("u").alias("node"), "lab")
        )
    return lab


@query(
    "q_label_propagation",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    {_lpa_sql("lfin")}
    SELECT node, lab AS community FROM lfin
    """,
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation on the
    top-{TOP_EDGES} trade backbone, {LPA_ITERS} rounds: each node
    adopts its neighbors' most frequent label (ties to the smallest
    label). Returns every node's final community label — the exact
    partition, not a summary, so the oracle pins each assignment."""
    return _lpa_labels(spark, sf_dir).select(
        "node", F.col("lab").alias("community")
    )


@query(
    "q_lpa_modularity",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    {_lpa_sql("lfin")},
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM es),
    deg AS (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY u
    ),
    dc AS (
      SELECT l.lab, CAST(SUM(deg.d) AS BIGINT) AS dsum
      FROM deg JOIN lfin l ON l.node = deg.node GROUP BY l.lab
    ),
    ec AS (
      SELECT la.lab, CAST(COUNT(*) AS BIGINT) AS e_in
      FROM es
      JOIN lfin la ON la.node = es.a
      JOIN lfin lb ON lb.node = es.b
      WHERE la.lab = lb.lab GROUP BY la.lab
    ),
    parts AS (
      SELECT CAST(SUM(COALESCE(ec.e_in, 0)) AS BIGINT) AS intra,
             CAST(SUM(dc.dsum * dc.dsum) AS BIGINT) AS d2,
             CAST(COUNT(*) AS BIGINT) AS nc
      FROM dc LEFT JOIN ec ON ec.lab = dc.lab
    )
    SELECT m.m AS m_edges, parts.nc AS n_communities,
           parts.intra AS intra_edges,
           round(CAST(4 * m.m * parts.intra - parts.d2 AS DOUBLE)
                 / (4.0 * m.m * m.m), 6) AS modularity
    FROM parts CROSS JOIN m
    """,
)
def q_lpa_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman–Girvan modularity of the LPA partition:
    Q = Σ_c [e_c/m − (D_c/2m)²] = (4m·Σe_c − ΣD_c²)/(4m²), assembled
    entirely from exact integers (intra-community edge counts,
    community degree sums, the edge total) with ONE double division.
    Communities with zero internal edges still contribute their D_c²
    term.

    r15: labels AND the integer censuses (degree sums per community,
    intra-edge counts, m) run driver-side over the collected backbone
    (bounded driver state — one fact-scale extraction job instead of
    the LPA rounds + three census joins); the single rounded double
    division stays a Spark expression over the exact integers."""
    from timestream_travel_spark.operators.graph_kit import collect_sym

    backbone = collect_sym(spark, sf_dir)
    nodes, adj, edges = backbone
    lab = _lpa_driver(spark, sf_dir, backbone)
    m = len(edges)
    dsum: dict[int, int] = {}
    for u in nodes:
        dsum[lab[u]] = dsum.get(lab[u], 0) + len(adj[u])
    e_in: dict[int, int] = {}
    for a, b in edges:
        if lab[a] == lab[b]:
            e_in[lab[a]] = e_in.get(lab[a], 0) + 1
    intra = sum(e_in.get(c, 0) for c in dsum)
    d2 = sum(d * d for d in dsum.values())
    nc = len(dsum)
    from timestream_travel_spark.tables import bounded_df

    parts = bounded_df(
        spark,
        [(int(m), int(nc), int(intra), int(d2))],
        "m bigint, nc bigint, intra bigint, d2 bigint",
    )
    return parts.select(
        F.col("m").alias("m_edges"),
        F.col("nc").alias("n_communities"),
        F.col("intra").alias("intra_edges"),
        F.round(
            (F.lit(4) * F.col("m") * F.col("intra") - F.col("d2")).cast("double")
            / (F.lit(4.0) * F.col("m") * F.col("m")),
            6,
        ).alias("modularity"),
    )
