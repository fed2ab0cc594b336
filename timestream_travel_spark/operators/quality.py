"""Data-quality constraint checking — the expectations layer every
ingest pipeline runs before publishing a table (dbt tests /
Deequ-style): primary-key uniqueness, non-null, value ranges,
set membership, referential integrity.

Scale shape: each check is an aggregate or anti-join counting
VIOLATIONS (never materializing passing rows); the per-table checks
share one scan via a multi-aggregate, the FK check is one left-anti
join against the (broadcastable or shuffled) parent keys. Output is
check-count-sized regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


def check_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    # one scan of orders covers three checks (multi-aggregate)
    orders_checks = od.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("pk_dup"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("custkey_null"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("price_range"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("status_domain"),
    )
    rows = orders_checks.select(
        F.explode(
            F.array(
                F.struct(F.lit("orders.o_orderkey unique").alias("check"), F.col("pk_dup").alias("n_violations")),
                F.struct(F.lit("orders.o_custkey not_null").alias("check"), F.col("custkey_null").alias("n_violations")),
                F.struct(F.lit("orders.o_totalprice > 0").alias("check"), F.col("price_range").alias("n_violations")),
                F.struct(F.lit("orders.o_orderstatus in (O,F,P)").alias("check"), F.col("status_domain").alias("n_violations")),
            )
        ).alias("r")
    ).select("r.check", "r.n_violations")

    # referential integrity: lineitem rows whose order doesn't exist
    fk = (
        li.join(od.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count("*").alias("n_violations"))
        .select(F.lit("lineitem.l_orderkey -> orders").alias("check"), "n_violations")
    )
    return rows.unionByName(fk)


@query(
    "q_data_quality_report",
    oracle="""
    SELECT 'orders.o_orderkey unique' AS check,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders.o_custkey not_null',
           CAST(COUNT(*) FILTER (o_custkey IS NULL) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'orders.o_totalprice > 0',
           CAST(COUNT(*) FILTER (o_totalprice <= 0) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'orders.o_orderstatus in (O,F,P)',
           CAST(COUNT(*) FILTER (o_orderstatus NOT IN ('O','F','P')) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'lineitem.l_orderkey -> orders',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    """,
)
def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint report: (check, n_violations) for PK uniqueness,
    non-null, range, domain, and FK integrity — counting violations
    only, one multi-agg scan per table + one anti-join."""
    return check_report(spark, sf_dir)
