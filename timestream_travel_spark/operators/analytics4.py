"""Round-6 analytics: mutual information between categorical
dimensions, and multi-point weighted quantiles via the sharded
two-phase prefix sum.

Both follow the repo's exactness rules: counts stay integer until a
single double division per term, per-term log contributions quantize
to DECIMAL(24,15) before the order-independent sum (the
q_split_kl_drift rule), and weighted-rank crossings compare in
DECIMAL with integer multipliers (no float fractions of a total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# weighted-quantile shard width — same bounded-domain argument as
# timeseries7._WM_SHARD_WIDTH
_WQ_SHARD_WIDTH = 512


@query(
    "q_mutual_information",
    oracle="""
    WITH cells AS (
      SELECT event_type AS x, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS y,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT x, y, c,
             SUM(c) OVER (PARTITION BY x) AS cx,
             SUM(c) OVER (PARTITION BY y) AS cy,
             SUM(c) OVER () AS n
      FROM cells
    ), terms AS (
      SELECT x, CAST((CAST(c AS DOUBLE) / n)
                     * log2((CAST(c AS DOUBLE) * n)
                            / (CAST(cx AS DOUBLE) * cy))
                     AS DECIMAL(24,15)) AS t,
             c, n
      FROM m
    )
    SELECT x AS event_type,
           CAST(SUM(c) AS BIGINT) AS n_events,
           round(CAST(SUM(t) AS DOUBLE), 6) AS mi_contrib_bits
    FROM terms GROUP BY x
    """,
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(event_type; hour-of-day) in bits,
    reported as per-event-type contributions Σ_y p(x,y)·log2(p(x,y)
    /(p(x)p(y))) — the feature-association diagnostic behind "does
    this categorical carry any time signal" decisions in a training
    pipeline (near-zero MI columns are dead weight; high-MI columns
    leak time into supposedly time-free features).

    Scale shape: ONE map-side-combined (type, hod) reduce does all
    the 100 TB work; the cell table is |types|×24 rows, so the three
    marginal window sums and the term arithmetic run on a
    broadcast-sized table. Exactness: counts stay BIGINT through the
    marginals, each term does the identically-parenthesized double
    expression in both engines, quantizes to DECIMAL(24,15), and the
    per-type sum is therefore associative and order-independent (the
    q_split_kl_drift discipline)."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("x"),
        F.hour("ts").cast("bigint").alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    wall = Window.partitionBy()
    m = cells.select(
        "x",
        "y",
        "c",
        F.sum("c").over(wx).alias("cx"),
        F.sum("c").over(wy).alias("cy"),
        F.sum("c").over(wall).alias("n"),
    )
    term = (
        (F.col("c").cast("double") / F.col("n"))
        * F.log2(
            (F.col("c").cast("double") * F.col("n"))
            / (F.col("cx").cast("double") * F.col("cy"))
        )
    ).cast("decimal(24,15)")
    return (
        m.select("x", "c", term.alias("t"))
        .groupBy("x")
        .agg(
            F.sum("c").cast("bigint").alias("n_events"),
            F.round(F.sum("t").cast("double"), 6).alias("mi_contrib_bits"),
        )
        .select(F.col("x").alias("event_type"), "n_events", "mi_contrib_bits")
    )


@query(
    "q_weighted_quantiles",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_extendedprice,
             SUM(CAST(l_quantity AS DECIMAL(20,4))) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(CAST(l_quantity AS DECIMAL(20,4))) OVER (
               PARTITION BY l_returnflag) AS tot
      FROM lineitem
    ), qs(k, q) AS (VALUES (1, 'p25'), (2, 'p50'), (3, 'p75'))
    SELECT l_returnflag, q, MIN(l_extendedprice) AS wq_price
    FROM c JOIN qs ON 4 * cw >= k * tot
    GROUP BY l_returnflag, q
    """,
)
def q_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted p25/p50/p75 extended price per return flag —
    the multi-point generalization of q_weighted_median, on the SAME
    value-range-sharded two-phase prefix sum (one plan serves all
    three probes; a naive per-quantile approach would re-scan per
    point).

    Plan: ONE (flag, price-shard) DECIMAL groupBy (the only
    corpus-sized shuffle) → prefix sums over the tiny shard table →
    each quantile tags its one crossing shard via a 3-row literal
    cross join → only tagged shards' rows are re-scanned and
    cumulative-windowed (bounded slices, parallel across flag ×
    quantile × shard). Crossing tests stay DECIMAL with INTEGER
    multipliers (4·cw ≥ k·tot) — no float fraction of a total, so
    the crossing row is engine-exact. Prices monotone across shards
    ⇒ the min within the crossing shard is the global answer."""
    from timestream_travel_spark.operators._sharded import (
        sharded_weighted_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem")
    qdec = F.col("l_quantity").cast("decimal(20,4)")
    shard = F.floor(F.col("l_extendedprice") / _WQ_SHARD_WIDTH).cast("bigint")
    rows = li.select(
        "l_returnflag",
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        qdec.alias("qty"),
        shard.alias("shard"),
    )
    cand = sharded_weighted_quantiles(
        rows,
        ["l_returnflag"],
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        [(1, 4, "p25"), (2, 4, "p50"), (3, 4, "p75")],
    )
    return cand.groupBy("l_returnflag", "q").agg(
        F.min("l_extendedprice").alias("wq_price")
    )
