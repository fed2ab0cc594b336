"""Graph analytics, part 12 (round 12): the distance- and
support-based centrality family on the top-revenue trade backbone —
k-truss edge decomposition (Cohen, NSA tech report 2008 — the
triangle-support analogue of the k-core), closeness + harmonic
centrality (Bavelas 1950 / Marchiori & Latora 2000), graph
eccentricity (with per-node reach), and Katz centrality (Katz,
Psychometrika 1953) with an exact dyadic attenuation.

Exactness:
- BFS distances come from a FIXED {DIST_ROUNDS}-round min-plus
  relaxation unrolled identically in both engines (the graph9
  fixed-unroll trade); the pytest asserts the fixpoint is reached on
  the fixture, so the unroll IS the true distance table there;
- harmonic centrality sums 1/d over the BOUNDED distance domain
  (d ≤ {DIST_ROUNDS}) as a left-associated chain of count/d terms —
  same addition order on both engines, no quantization of the
  repeating-decimal 1/3, 1/6 terms (the q_ease_of_movement lesson);
- Katz iterates x ← 1 + α·A·x with α = 1/{KATZ_DEN} in SCALED
  INTEGERS (y_t = {KATZ_DEN}^t·x_t stays a BIGINT recurrence), so
  the emitted centrality y/{KATZ_DEN}^{KATZ_ROUNDS} is a dyadic
  rational converted exactly to double;
- k-truss support censuses are pure integer triangle counts over the
  surviving edge set, peeled a fixed {TRUSS_ROUNDS} rounds.

Scale shape: the heavy stage stays graph3's fact-table edge
extraction (broadcast-dim joins, map-side-combined revenue agg);
everything here runs on the ≤{TOP_EDGES}-edge backbone — distance
tables are ≤ |V|² rows, each Spark round localCheckpoints to stop
the iterative-lineage plan-width doubling (the graph8/9 lesson).
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

DIST_ROUNDS = 6  # BFS relaxation rounds (≥ backbone diameter; pytest-pinned)
KATZ_DEN = 8  # Katz attenuation denominator (α = 1/8, dyadic-exact)
KATZ_ROUNDS = 4
KTRUSS_K = 4  # k-truss: every surviving edge in ≥ k−2 surviving triangles
TRUSS_ROUNDS = 5


def _sym(e: DataFrame) -> DataFrame:
    return e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


# ------------------------------------------------------ distances
def _dist_sql() -> str:
    """Unrolled min-plus BFS ending in `d{DIST_ROUNDS}` (src, v, d)."""
    ctes = [
        "es AS MATERIALIZED (SELECT a, b FROM edges)",
        "sym AS MATERIALIZED (SELECT a AS u, b AS v FROM es"
        " UNION ALL SELECT b, a FROM es)",
        "d0 AS (SELECT DISTINCT u AS src, u AS v, 0 AS d FROM sym)",
    ]
    for it in range(1, DIST_ROUNDS + 1):
        prev, cur = f"d{it - 1}", f"d{it}"
        ctes.append(
            f"""{cur} AS MATERIALIZED (
      SELECT src, v, MIN(d) AS d FROM (
        SELECT src, v, d FROM {prev}
        UNION ALL
        SELECT p.src, s.v, p.d + 1 FROM {prev} p JOIN sym s ON s.u = p.v
      ) GROUP BY src, v
    )"""
        )
    return ",\n    ".join(ctes)


def _distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, v, d) BFS distance table of the backbone, truncated at
    d ≤ {DIST_ROUNDS} — the exact table _dist_sql()'s unrolled
    min-plus relaxation produces.

    r15 optimization: the relaxation used to run as {DIST_ROUNDS}
    Spark rounds with eager localCheckpoints (~12 jobs of scheduling
    overhead on a ≤25-node graph); the BFS is pure-integer bounded
    driver state, so it now runs driver-side over the collected
    backbone (the q_kcore_trade r14 pattern) and ships back as one
    small local relation. The distributed relaxation for unbounded
    graphs is _distances_distributed below (parity-pytested)."""
    from timestream_travel_spark.operators.graph_kit import (
        bfs_distances,
        collect_sym,
    )

    from timestream_travel_spark.tables import bounded_df

    nodes, adj, _ = collect_sym(spark, sf_dir)
    dist = bfs_distances(nodes, adj, DIST_ROUNDS)
    rows = sorted((s, v, d) for (s, v), d in dist.items())
    return bounded_df(spark, rows, "src int, v int, d int")


def _distances_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r15 distributed relaxation — {DIST_ROUNDS} rounds,
    each localCheckpointed (the round references dist twice). Kept as
    the documented scale path for graphs whose node set is NOT
    bounded driver state; test_r15_optimization pins parity with the
    driver-side table."""
    sym = _sym(top_trade_edges(spark, sf_dir)).persist()
    dist = sym.select(F.col("u").alias("src"), F.col("u").alias("v")).distinct()
    dist = dist.withColumn("d", F.lit(0))
    for _ in range(DIST_ROUNDS):
        nbr = sym.select(F.col("u").alias("hop_u"), F.col("v").alias("hop_v"))
        hop = dist.join(nbr, dist.v == nbr.hop_u).select(
            "src", F.col("hop_v").alias("v"), (F.col("d") + 1).alias("d")
        )
        dist = (
            dist.unionAll(hop)
            .groupBy("src", "v")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)
        )
    return dist


_HARMONIC_CHAIN = " + ".join(
    f"(CAST(COUNT(CASE WHEN d = {k} THEN 1 END) AS DOUBLE) / {k})"
    for k in range(1, DIST_ROUNDS + 1)
)


@query(
    "q_closeness_harmonic",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    {_dist_sql()}
    SELECT src AS node,
           CAST(COUNT(*) AS BIGINT) AS n_reach,
           CAST(SUM(d) AS BIGINT) AS sum_dist,
           round(CAST(COUNT(*) - 1 AS DOUBLE) / SUM(d), 6) AS closeness,
           round({_HARMONIC_CHAIN}, 6) AS harmonic
    FROM d{DIST_ROUNDS}
    GROUP BY src
    """,
)
def q_closeness_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closeness (n_reach−1)/Σd and harmonic Σ 1/d centrality per
    backbone node, on the fixed-unroll BFS distances. Harmonic
    left-associates count_d/d over the bounded distance domain
    instead of summing per-row 1/d doubles — identical addition
    order on both engines, no quantization of repeating decimals."""
    dist = _distances(spark, sf_dir)
    counts = [
        F.count(F.when(F.col("d") == k, 1)).cast("double") / F.lit(float(k))
        for k in range(1, DIST_ROUNDS + 1)
    ]
    harmonic = counts[0]
    for c in counts[1:]:
        harmonic = harmonic + c
    return dist.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reach"),
        F.sum("d").cast("bigint").alias("sum_dist"),
        F.round(
            (F.count(F.lit(1)) - 1).cast("double") / F.sum("d"), 6
        ).alias("closeness"),
        F.round(harmonic, 6).alias("harmonic"),
    )


@query(
    "q_graph_eccentricity",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    {_dist_sql()},
    ecc AS (
      SELECT src AS node, CAST(MAX(d) AS BIGINT) AS eccentricity,
             CAST(COUNT(*) AS BIGINT) AS n_reach
      FROM d{DIST_ROUNDS} GROUP BY src
    )
    SELECT node, eccentricity, n_reach,
           CAST(MIN(eccentricity) OVER () AS BIGINT) AS radius,
           CAST(MAX(eccentricity) OVER () AS BIGINT) AS diameter,
           CASE WHEN eccentricity = MIN(eccentricity) OVER ()
                THEN 1 ELSE 0 END AS is_center
    FROM ecc
    """,
)
def q_graph_eccentricity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node eccentricity (max BFS distance to any reachable
    node) with the graph's radius/diameter and center membership —
    integer statistics on the fixed-unroll distance table."""
    dist = _distances(spark, sf_dir)
    from pyspark.sql.window import Window

    ecc = dist.groupBy(F.col("src").alias("node")).agg(
        F.max("d").cast("bigint").alias("eccentricity"),
        F.count(F.lit(1)).cast("bigint").alias("n_reach"),
    )
    w = Window.partitionBy()
    return ecc.select(
        "node",
        "eccentricity",
        "n_reach",
        F.min("eccentricity").over(w).cast("bigint").alias("radius"),
        F.max("eccentricity").over(w).cast("bigint").alias("diameter"),
        F.when(
            F.col("eccentricity") == F.min("eccentricity").over(w), 1
        )
        .otherwise(0)
        .alias("is_center"),
    )


# ------------------------------------------------------------ Katz
def _katz_sql() -> str:
    ctes = [
        "es AS MATERIALIZED (SELECT a, b FROM edges)",
        "sym AS MATERIALIZED (SELECT a AS u, b AS v FROM es"
        " UNION ALL SELECT b, a FROM es)",
        "y0 AS (SELECT DISTINCT u AS node, CAST(1 AS BIGINT) AS y FROM sym)",
    ]
    for it in range(1, KATZ_ROUNDS + 1):
        prev, cur = f"y{it - 1}", f"y{it}"
        ctes.append(
            f"""{cur} AS MATERIALIZED (
      SELECT s.u AS node,
             CAST({KATZ_DEN ** it} + SUM(p.y) AS BIGINT) AS y
      FROM sym s JOIN {prev} p ON p.node = s.v
      GROUP BY s.u
    )"""
        )
    return ",\n    ".join(ctes)


@query(
    "q_katz_centrality",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    {_katz_sql()}
    SELECT node, y AS katz_scaled,
           CAST(y AS DOUBLE) / {KATZ_DEN ** KATZ_ROUNDS} AS katz
    FROM y{KATZ_ROUNDS}
    """,
)
def q_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality after {KATZ_ROUNDS} fixed iterations of
    x ← 1 + α·A·x from x₀ = 1, α = 1/{KATZ_DEN}: run entirely in
    scaled integers (y_t = {KATZ_DEN}ᵗ·x_t, so y_{{t+1}} =
    {KATZ_DEN}^(t+1) + Σ_neighbors y_t), making the emitted value a
    dyadic rational that converts to double EXACTLY — no float op
    anywhere in the iteration.

    r15: the BIGINT recurrence runs driver-side over the collected
    backbone (bounded driver state; was {KATZ_ROUNDS} Spark rounds of
    join+agg+checkpoint) — same integers, the final dyadic division
    stays the same Spark expression."""
    from timestream_travel_spark.operators.graph_kit import collect_sym

    nodes, adj, _ = collect_sym(spark, sf_dir)
    y = {n: 1 for n in nodes}
    for it in range(1, KATZ_ROUNDS + 1):
        y = {n: KATZ_DEN**it + sum(y[v] for v in adj[n]) for n in nodes}
    from timestream_travel_spark.tables import bounded_df

    ydf = bounded_df(
        spark, sorted((n, int(y[n])) for n in nodes), "node int, y bigint"
    )
    return ydf.select(
        "node",
        F.col("y").alias("katz_scaled"),
        (F.col("y").cast("double") / F.lit(KATZ_DEN**KATZ_ROUNDS)).alias(
            "katz"
        ),
    )


# ---------------------------------------------------------- k-truss
def _ktruss_sql() -> str:
    """Unrolled support peel ending in `e{TRUSS_ROUNDS}` (a, b)."""
    ctes = ["e0 AS MATERIALIZED (SELECT a, b FROM edges)"]
    for it in range(1, TRUSS_ROUNDS + 1):
        prev, cur = f"e{it - 1}", f"e{it}"
        ctes.append(
            f"""sym{it} AS MATERIALIZED (
      SELECT a AS u, b AS v FROM {prev} UNION ALL SELECT b, a FROM {prev}
    ), {cur} AS MATERIALIZED (
      SELECT e.a, e.b
      FROM {prev} e
      JOIN sym{it} x ON x.u = e.a
      JOIN sym{it} y ON y.u = e.b AND y.v = x.v
      GROUP BY e.a, e.b HAVING COUNT(*) >= {KTRUSS_K - 2}
    )"""
        )
    return ",\n    ".join(ctes)


@query(
    "q_ktruss_edges",
    oracle=f"""
    WITH {_TOP_EDGES_SQL},
    {_ktruss_sql()},
    symf AS (SELECT a AS u, b AS v FROM e{TRUSS_ROUNDS}
             UNION ALL SELECT b, a FROM e{TRUSS_ROUNDS})
    SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS support
    FROM e{TRUSS_ROUNDS} e
    JOIN symf x ON x.u = e.a
    JOIN symf y ON y.u = e.b AND y.v = x.v
    GROUP BY e.a, e.b
    """,
)
def q_ktruss_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KTRUSS_K}-truss of the backbone: repeatedly drop edges in
    fewer than {KTRUSS_K}−2 triangles among SURVIVORS
    ({TRUSS_ROUNDS} fixed peel rounds — the graph9 determinism
    trade; the pytest pins the fixpoint), emitting each surviving
    edge with its final triangle support. Pure integer censuses on
    the bounded edge set.

    r15: the peel runs driver-side over the collected backbone
    (bounded driver state; was {TRUSS_ROUNDS} Spark rounds of
    triangle-join+checkpoint ≈ 12 jobs) — identical integer censuses,
    identical surviving edge set."""
    from timestream_travel_spark.operators.graph_kit import collect_sym

    _, _, edges = collect_sym(spark, sf_dir)

    def _support(es: list) -> dict:
        nbrs: dict[int, set[int]] = {}
        for a, b in es:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        return {(a, b): len(nbrs[a] & nbrs[b]) for a, b in es}

    e = list(edges)
    for _ in range(TRUSS_ROUNDS):
        sup = _support(e)
        e = [ab for ab in e if sup[ab] >= KTRUSS_K - 2]
    final = _support(e)
    from timestream_travel_spark.tables import bounded_df

    rows = sorted((a, b, int(c)) for (a, b), c in final.items())
    return bounded_df(spark, rows, "a int, b int, support bigint")
