"""Relational core: projection / filter / aggregate / sort / limit /
set ops (SURVEY.md §2 B.2, B.4, B.6, B.7).

The reference's emitted-SQL semantics covered here:
- time-range predicate  (cmd/backup.go:171, 241)  → q_time_range_filter
- DISTINCT via GROUP BY (cmd/backup.go:170-178)   → q_partition_discovery
- NULL-skip             (cmd/backup.go:198-203)   → q_partition_discovery
- per-partition counts  (cmd/backup.go:299-301)   → q_partition_counts
- ORDER BY .. DESC      (cmd/backup.go:241)       → q_orderby_limit
- LIMIT/pagination      (cmd/backup.go:191, 256)  → q_orderby_limit

All plans are plain Catalyst DataFrame pipelines: filters and
projections reach the parquet scan (PushedFilters/ReadSchema), and
aggregations run partial→final with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.ops import davg, davg_sql, dsum, dsum_sql, revenue_col, REVENUE_SQL, ts_str
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_events_window, load_table

TIME_FROM = "2024-01-05 00:00:00"
TIME_TO = "2024-01-20 00:00:00"


@query(
    "q_time_range_filter",
    oracle=f"""
    SELECT event_id, user_id, event_type, value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM events
    WHERE ts >= TIMESTAMP '{TIME_FROM}' AND ts <= TIMESTAMP '{TIME_TO}'
      AND event_type = 'purchase'
    """,
)
def q_time_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range + equality predicate scan — the reference's export
    WHERE clause (cmd/backup.go:240-248), as pushed-down parquet
    filters instead of interpolated SQL strings."""
    ev = load_events_window(spark, sf_dir, TIME_FROM, TIME_TO)
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "event_type", "value", ts_str("ts", "ts_s")
    )


@query(
    "q_partition_discovery",
    oracle=f"""
    SELECT event_type
    FROM events
    WHERE ts >= TIMESTAMP '{TIME_FROM}' AND ts <= TIMESTAMP '{TIME_TO}'
      AND event_type IS NOT NULL
    GROUP BY event_type
    """,
)
def q_partition_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-value discovery: DISTINCT-via-GROUP-BY within a time
    range, nulls skipped (cmd/backup.go:170-209). Column pruning means
    the scan reads only (ts, event_type)."""
    ev = load_events_window(spark, sf_dir, TIME_FROM, TIME_TO)
    return ev.where(F.col("event_type").isNotNull()).select("event_type").distinct()


@query(
    "q_partition_counts",
    oracle="SELECT event_type, COUNT(*) AS n_rows FROM events GROUP BY event_type",
)
def q_partition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition row counts (cmd/backup.go:299-301, 352) — a hash
    aggregate instead of mutex-guarded driver-side map accumulation."""
    return load_table(spark, sf_dir, "events").groupBy("event_type").agg(F.count("*").alias("n_rows"))


@query(
    "q_groupby_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity', 'sum_qty')},
           {dsum_sql('l_extendedprice', 'sum_base_price')},
           {dsum_sql(REVENUE_SQL, 'sum_disc_price', 8)},
           {davg_sql('l_quantity', 'avg_qty')},
           {davg_sql('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: multi-key hash aggregate with
    exact decimal accumulation (partial+final agg, map-side combine)."""
    from timestream_travel_spark.tables import spread

    li = load_table(spark, sf_dir, "lineitem")
    # r15: 5 decimal casts+sums per row after a single-row-group scan
    # ran on one core (2.4 s of the r14 bench); spread is size-gated
    # (no-op at scale) and decimal/count aggregation is
    # order-independent, so results are bit-identical.
    return (
        spread(
            li.filter(
                F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp")
            ).select(
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
            )
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(revenue_col(), "sum_disc_price", scale=8),
            davg("l_quantity", "avg_qty"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return od.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"), F.count("*").alias("n_orders")
    )


@query(
    "q_rollup",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (B.4 grouping sets). NULL grouping markers
    coalesced to 'ALL' so the output is hash-stable."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
    )


@query(
    "q_filtered_agg",
    oracle=f"""
    SELECT l_returnflag,
           {dsum_sql("CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END", 'hi_disc_price')},
           COUNT(CASE WHEN l_tax > 0.04 THEN 1 END) AS n_hi_tax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: sum(when(cond, x)) — a single pass
    where a naive engine would run two filtered scans."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dsum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(F.lit(0)), "hi_disc_price"),
        F.count(F.when(F.col("l_tax") > 0.04, F.lit(1))).alias("n_hi_tax"),
    )


@query(
    "q_collect_set",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv
    FROM events GROUP BY user_id
    """,
)
def q_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set assembly per key (GEN of the reference's time-series map
    assembly, helpers/helpers.go:12-25), emitted as a sorted CSV
    string for order-insensitive cross-engine comparison."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types_csv")
    )


@query(
    "q_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY .. DESC + LIMIT (cmd/backup.go:241 order,
    :256 page limit). Catalyst plans this as TakeOrderedAndProject —
    no global sort materialization, exactly what you want at scale."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@query(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn > 10 AND rn <= 30
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination (page 2 of 20) via row_number — the deterministic
    form of the reference's NextToken paging (cmd/backup.go:205-208)."""
    from pyspark.sql.window import Window

    od = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        od.select("o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter((F.col("rn") > 10) & (F.col("rn") <= 30))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q_union_except_intersect",
    oracle="""
    SELECT c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    ) u
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY' AND c_acctbal < 0
    """,
)
def q_union_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra chain (B.7): union-distinct, intersect, except."""
    c = load_table(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    even = c.filter(F.col("c_custkey") % 2 == 0).select("c_custkey")
    bad = c.filter((F.col("c_mktsegment") == "MACHINERY") & (F.col("c_acctbal") < 0)).select("c_custkey")
    return building.union(rich).distinct().intersect(even).exceptAll(bad).distinct()


@query(
    "q_in_null_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_type LIKE '%AND%'
      AND p_size IS NOT NULL
      AND NOT (p_retailprice < 0)
    """,
)
def q_in_null_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate kit: IN-list, LIKE, IS NOT NULL, NOT (B.2)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .filter(F.col("p_type").like("%AND%"))
        .filter(F.col("p_size").isNotNull())
        .filter(~(F.col("p_retailprice") < 0))
        .select("p_partkey", "p_name", "p_brand")
    )


@query(
    "q_approx_count_distinct",
)
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct (B.4, NS-scale). No SQL oracle: the
    sketch estimate is engine-specific — driver does rows-only; the
    pytest suite bounds its relative error against the exact count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )
