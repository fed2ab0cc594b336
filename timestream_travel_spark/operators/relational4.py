"""Relational surface, part 4: upsert (MERGE-shaped) composition and
column profiling (data-quality accounting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


def upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE-shaped upsert as a plan (no table format required):
    rows present in `updates` replace their `target` counterparts;
    unmatched update rows insert. Columns must match by name.

    One full-outer join on the key — the engine-level core of what
    Delta/Iceberg MERGE does before file rewriting."""
    t = target.alias("t")
    u = updates.alias("u")
    cond = F.col(f"t.{key}") == F.col(f"u.{key}")
    cols = target.columns
    merged = t.join(u, cond, "full_outer").select(
        *[F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")).alias(c) for c in cols]
    )
    return merged


@query(
    "q_upsert",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             round(o_totalprice * 1.1, 2) AS o_totalprice,
             o_orderdate, 'URGENT' AS o_orderpriority
      FROM orders WHERE o_orderkey < 100
      UNION ALL
      SELECT 9000000 + o_orderkey, o_custkey, 'N', o_totalprice, o_orderdate, 'NEW'
      FROM orders WHERE o_orderkey < 10
    )
    SELECT m.o_orderkey, m.o_totalprice, m.o_orderpriority
    FROM (
      SELECT COALESCE(u.o_orderkey, t.o_orderkey) AS o_orderkey,
             COALESCE(u.o_totalprice, t.o_totalprice) AS o_totalprice,
             COALESCE(u.o_orderpriority, t.o_orderpriority) AS o_orderpriority
      FROM orders t FULL OUTER JOIN updates u ON t.o_orderkey = u.o_orderkey
    ) m
    WHERE m.o_orderkey < 200 OR m.o_orderkey >= 9000000
    """,
)
def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert: reprice orders <100 (+10%, priority URGENT) and insert
    10 synthetic new orders; output the affected neighborhood."""
    od = load_table(spark, sf_dir, "orders")
    src = load_table(spark, sf_dir, "orders")
    updates = src.filter(F.col("o_orderkey") < 100).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
        "o_orderdate",
        F.lit("URGENT").alias("o_orderpriority"),
    ).unionByName(
        src.filter(F.col("o_orderkey") < 10).select(
            (F.col("o_orderkey") + 9000000).alias("o_orderkey"),
            "o_custkey",
            F.lit("N").alias("o_orderstatus"),
            "o_totalprice",
            "o_orderdate",
            F.lit("NEW").alias("o_orderpriority"),
        )
    )
    merged = upsert(od, updates, "o_orderkey")
    return merged.filter((F.col("o_orderkey") < 200) | (F.col("o_orderkey") >= 9000000)).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


@query(
    "q_profile_columns",
    oracle="""
    SELECT 'event_type' AS col, COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT(event_type) AS BIGINT) AS n_nulls,
           COUNT(DISTINCT event_type) AS n_distinct,
           CAST(MIN(event_type) AS VARCHAR) AS min_s,
           CAST(MAX(event_type) AS VARCHAR) AS max_s
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*),
           CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
           COUNT(DISTINCT user_id),
           CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
    FROM events
    UNION ALL
    SELECT 'value', COUNT(*),
           CAST(COUNT(*) - COUNT(value) AS BIGINT),
           COUNT(DISTINCT value),
           CAST(CAST(MIN(value) AS DECIMAL(12,2)) AS VARCHAR),
           CAST(CAST(MAX(value) AS DECIMAL(12,2)) AS VARCHAR)
    FROM events
    """,
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (null rate, cardinality, bounds) — the
    data-quality accounting pass every ingest pipeline runs. One scan
    per Spark plan (the three profiles aggregate in a single pass
    before the union of 1-row results)."""
    ev = load_table(spark, sf_dir, "events")

    def profile(col: str, render) -> DataFrame:
        return ev.agg(
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            render(F.min(col)).alias("min_s"),
            render(F.max(col)).alias("max_s"),
        ).select(F.lit(col).alias("col"), "n_rows", "n_nulls", "n_distinct", "min_s", "max_s")

    as_str = lambda c: c.cast("string")  # noqa: E731
    as_dec = lambda c: c.cast("decimal(12,2)").cast("string")  # noqa: E731
    return (
        profile("event_type", as_str)
        .unionByName(profile("user_id", as_str))
        .unionByName(profile("value", as_dec))
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 50000), 9) AS INT) AS bucket,
           COUNT(*) AS n_orders,
           CAST(round(CAST(MIN(o_totalprice) AS DECIMAL(12,2)), 2) AS DOUBLE) AS lo,
           CAST(round(CAST(MAX(o_totalprice) AS DECIMAL(12,2)), 2) AS DOUBLE) AS hi
    FROM orders
    GROUP BY least(floor(o_totalprice / 50000), 9)
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (10 × 50k buckets, top bucket clamped) —
    the distribution-profiling primitive: one partial-aggregated scan,
    10 rows out regardless of input size."""
    od = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9)).cast("int")
    return od.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.min("o_totalprice").cast("decimal(12,2)"), 2)
        .cast("double")
        .alias("lo"),
        F.round(F.max("o_totalprice").cast("decimal(12,2)"), 2)
        .cast("double")
        .alias("hi"),
    )
