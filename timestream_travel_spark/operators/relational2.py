"""Relational surface, part 2 (SURVEY.md §2 B.4/B.6/B.8 gaps):
pivot, HAVING, scalar/correlated subqueries, exact percentiles,
stddev/variance, min_by/max_by, cube, weekly resample, sampling,
and the faithful stringly export projection (A21/A22) oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.functions.faithful import faithful_projection
from timestream_travel_spark.ops import dsum, dsum_sql
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q_pivot",
    oracle=f"""
    SELECT user_id,
           {', '.join(f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}" for t in EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type → per-user count columns. The value list is
    explicit — open-ended pivot needs a collect() of distinct values
    first, which is a scan you don't want twice at scale."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).agg(F.count(F.lit(1))).na.fill(0)


@query(
    "q_having",
    oracle=f"""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice', 'total_spend')}
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return (
        od.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total_spend"))
        .filter(F.col("n_orders") >= 12)
    )


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                                       / COUNT(*) FROM orders)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery comparison (orders above 1.5× global mean) via
    a broadcast cross-join of the 1-row aggregate — no collect()."""
    od = load_table(spark, sf_dir, "orders")
    stats = od.agg(
        (F.sum(F.col("o_totalprice").cast("decimal(20,4)")).cast("double") / F.count("*")).alias("avg_price")
    )
    return (
        od.crossJoin(F.broadcast(stats))
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q_correlated_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > (
      SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*) * 1.5
      FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery (orders 1.5× above the customer's own
    mean), decorrelated by hand into agg + equi-join — exactly the
    rewrite Catalyst would do, stated explicitly."""
    od = load_table(spark, sf_dir, "orders")
    per_cust = load_table(spark, sf_dir, "orders").groupBy(F.col("o_custkey").alias("ck")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(20,4)")).cast("double") / F.count("*")).alias("cust_avg")
    )
    return (
        od.join(per_cust, od.o_custkey == per_cust.ck)
        .filter(F.col("o_totalprice") > F.col("cust_avg") * 1.5)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`). The approx_percentile sketch is the scale path;
    it's exercised rows-only next to approx_count_distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


@query(
    "q_minby_maxby",
    oracle="""
    SELECT o_orderpriority,
           arg_min(o_orderkey, o_totalprice * 10000000 + o_orderkey) AS cheapest_order,
           arg_max(o_orderkey, o_totalprice * 10000000 + o_orderkey) AS priciest_order,
           round(MAX(o_totalprice) - MIN(o_totalprice), 2) AS price_spread
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg_min/arg_max aggregation. o_totalprice has duplicate values
    at sf≥0.1, so the ordering key composes (price, orderkey) into one
    double (price×1e7 + key; exact enough at these magnitudes, and
    identical FP ops in both engines — DuckDB's arg_min can't order
    structs)."""
    od = load_table(spark, sf_dir, "orders")
    key = F.col("o_totalprice") * 10000000 + F.col("o_orderkey")
    return od.groupBy("o_orderpriority").agg(
        F.min_by("o_orderkey", key).alias("cheapest_order"),
        F.max_by("o_orderkey", key).alias("priciest_order"),
        F.round(F.max("o_totalprice") - F.min("o_totalprice"), 2).alias("price_spread"),
    )


@query(
    "q_cube",
    oracle="""
    SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
           COALESCE(CAST(c_nationkey AS VARCHAR), 'ALL') AS nation,
           COUNT(*) AS n_custs
    FROM customer
    GROUP BY CUBE (c_mktsegment, c_nationkey)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over (segment, nation) — 4 grouping sets in one pass."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.cube("c_mktsegment", "c_nationkey")
        .agg(F.count("*").alias("n_custs"))
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            F.coalesce(F.col("c_nationkey").cast("string"), F.lit("ALL")).alias("nation"),
            "n_custs",
        )
    )


@query(
    "q_resample_weekly",
    oracle="""
    SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS weekly_revenue
    FROM orders GROUP BY date_trunc('week', o_orderdate)
    """,
)
def q_resample_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly resample (ISO weeks — Spark and DuckDB both truncate to
    Monday)."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.groupBy(F.date_trunc("week", "o_orderdate").alias("wk"))
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "weekly_revenue"))
        .select(F.date_format("wk", "yyyy-MM-dd").alias("week_start"), "n_orders", "weekly_revenue")
    )


@query(
    "q_faithful_export",
    oracle="""
    SELECT COALESCE(CAST(event_id AS VARCHAR), 'NULL') AS event_id,
           COALESCE(strftime(ts, '%Y-%m-%d %H:%M:%S'), 'NULL') AS ts,
           COALESCE(CAST(user_id AS VARCHAR), 'NULL') AS user_id,
           COALESCE(event_type, 'NULL') AS event_type,
           COALESCE(CAST(value AS VARCHAR), 'NULL') AS value,
           COALESCE(props, 'NULL') AS props
    FROM events WHERE event_type = 'error'
    """,
)
def q_faithful_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's faithful sink rendering as a query: every
    scalar stringly, NULL → \"NULL\" (helpers/helpers.go:5-10),
    timestamps in the Go wire layout (cmd/backup.go:25)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    return faithful_projection(ev)
