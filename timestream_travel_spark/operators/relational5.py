"""Relational surface, part 5: pivot (long→wide), unpivot/melt
(wide→long), and exact percentiles — reshaping + distribution
primitives every analytics engine needs.

Scale notes: pivot with an EXPLICIT value list is one partial-agg
shuffle (no extra distinct-scan to discover columns — at 100 TB the
implicit-values variant adds a full pass); unpivot is a zero-shuffle
stack expression; percentiles here are exact (single sort-based agg);
the sketch variant is bounded by
tests/test_properties.py::test_percentile_approx_error_bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.ops import dsum, dsum_sql
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

EVENT_TYPES = ["click", "purchase", "refund", "signup", "view"]


@query(
    "q_pivot_wide",
    oracle="""
    SELECT dayname(ts) AS day,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'refund') AS refund,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'view') AS view
    FROM events
    GROUP BY dayname(ts)
    """,
)
def q_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide: per-weekday event-type counts via pivot with an
    explicit value list (no discovery pass; deterministic columns).
    NULL event_types fall outside the listed values, matching the
    FILTER semantics in the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_format("ts", "EEEE"))
        .groupBy("day")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


@query(
    "q_unpivot_melt",
    oracle=f"""
    SELECT 'l_discount' AS metric, {dsum_sql('l_discount', 'total', 4)} FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', {dsum_sql('l_extendedprice', 'total', 4)} FROM lineitem
    UNION ALL
    SELECT 'l_quantity', {dsum_sql('l_quantity', 'total', 4)} FROM lineitem
    UNION ALL
    SELECT 'l_tax', {dsum_sql('l_tax', 'total', 4)} FROM lineitem
    """,
)
def q_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long: melt four measure columns into (metric, value)
    rows — a zero-shuffle stack expression — then one decimal-exact
    aggregate per metric."""
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ids=[],
        values=["l_discount", "l_extendedprice", "l_quantity", "l_tax"],
        variableColumnName="metric",
        valueColumnName="v",
    )
    return melted.groupBy("metric").agg(dsum("v", "total", scale=4))


@query(
    "q_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark
    `percentile` == DuckDB `quantile_cont`, both lo+(hi-lo)·frac on
    the sorted values; rounded to 4dp at the output boundary to
    absorb the final double ulp)."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = lambda p, a: F.round(F.percentile("l_extendedprice", F.lit(p)), 4).alias(a)  # noqa: E731
    return li.groupBy("l_returnflag").agg(
        pct(0.25, "p25"), pct(0.5, "p50"), pct(0.75, "p75"), pct(0.9, "p90")
    )


@query(
    "q_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
                        AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native SQL EXISTS / NOT EXISTS — Catalyst decorrelates these
    into left-semi/left-anti joins (vs the hand-decorrelated
    composition in q_correlated_subquery). Verified against DuckDB's
    own decorrelation."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_r5")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_r5")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer_r5
        WHERE EXISTS (SELECT 1 FROM orders_r5
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders_r5
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
                            AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        """
    )


@query(
    "q_recursive_cte_spine",
    oracle="""
    WITH RECURSIVE spine(d) AS (
      SELECT TIMESTAMP '1997-01-01 00:00:00'
      UNION ALL
      SELECT d + INTERVAL 1 DAY FROM spine WHERE d < TIMESTAMP '1997-01-31 00:00:00'
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, COUNT(o_orderkey) AS n_orders
    FROM spine LEFT JOIN orders ON CAST(o_orderdate AS DATE) = CAST(d AS DATE)
    GROUP BY d
    """,
)
def q_recursive_cte_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): generate a January-1997 date spine
    recursively, left-join order counts onto it — days with zero
    orders survive (the gap-fill idiom in pure SQL, cross-engine)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_r5b")
    return spark.sql(
        """
        WITH RECURSIVE spine(d) AS (
          SELECT TIMESTAMP '1997-01-01 00:00:00'
          UNION ALL
          SELECT d + INTERVAL 1 DAY FROM spine WHERE d < TIMESTAMP '1997-01-31 00:00:00'
        )
        SELECT date_format(d, 'yyyy-MM-dd') AS day, COUNT(o_orderkey) AS n_orders
        FROM spine LEFT JOIN orders_r5b ON CAST(o_orderdate AS DATE) = CAST(d AS DATE)
        GROUP BY d
        """
    )


@query(
    "q_listagg",
    oracle="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg / string_agg with deterministic WITHIN-GROUP ordering —
    the SQL:2023 ordered string concatenation aggregate."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_r5c")
    return spark.sql(
        """
        SELECT l_returnflag,
               listagg(DISTINCT l_linestatus, ',') WITHIN GROUP (ORDER BY l_linestatus)
                 AS statuses
        FROM lineitem_r5c
        GROUP BY l_returnflag
        """
    )


@query("q_hll_sketch_union")
def q_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (DataSketches): build per-half sketches
    of distinct o_custkey, UNION them, estimate — the 100 TB
    cardinality pattern (sketches merge across partitions/days
    without re-scanning; a plain approx_count_distinct can't be
    incrementally maintained). Rows-only oracle (sketch binaries are
    engine-specific); pytest bounds the estimate against the exact
    count and asserts union(sketch(A), sketch(B)) == sketch(A ∪ B)."""
    od = load_table(spark, sf_dir, "orders")
    halves = od.withColumn("half", (F.col("o_orderkey") % 2).cast("int"))
    sketches = halves.groupBy("half").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"), F.count("*").alias("n_rows")
    )
    merged = sketches.agg(
        F.hll_union_agg("sk").alias("sk_all"), F.sum("n_rows").alias("n_rows")
    )
    return merged.select(
        F.round(F.hll_sketch_estimate("sk_all"), 0).cast("bigint").alias("approx_custkeys"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    )


@query(
    "q_hash_sample",
    oracle="""
    SELECT event_type, COUNT(*) AS n, CAST(MIN(event_id) AS BIGINT) AS min_id
    FROM events
    WHERE (CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4) AS INT) % 100) < 10
      AND event_type IS NOT NULL
    GROUP BY event_type
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% hash sample: md5(key) bucket < 10% — the
    reproducible, engine-portable, cluster-stable sampling method
    (same rows selected on every engine, every run, every partition
    layout — unlike rand()-based sampling). The seeded-rand variant
    stays as q_sample_deterministic (rows-only)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    bucket = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10).cast(
        "int"
    ) % 100
    return (
        ev.filter(bucket < 10)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.min("event_id").cast("bigint").alias("min_id"))
    )
