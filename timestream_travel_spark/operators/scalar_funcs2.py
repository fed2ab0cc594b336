"""Scalar function surface, part 2 (B.8 completeness): extended
date/time, string, and math kits, set-op ALL variants, window
distribution functions, sliding windows in batch, and time-spine gap
filling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.ops import ts_str
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_datetime_funcs2",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow,
           strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus_month,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INT) AS days_to_2002
    FROM orders WHERE o_orderkey < 500
    """,
)
def q_datetime_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended date kit: quarter/ISO week/ISO weekday, month
    arithmetic, month-end, day differences."""
    od = load_table(spark, sf_dir, "orders")
    return od.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        # Spark dayofweek is 1=Sunday; ISO wants 1=Monday
        F.when(F.dayofweek("o_orderdate") == 1, 7)
        .otherwise(F.dayofweek("o_orderdate") - 1)
        .cast("int")
        .alias("iso_dow"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 1 MONTH"), "yyyy-MM-dd").alias("plus_month"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("days_to_2002"),
    )


@query(
    "q_string_funcs2",
    oracle="""
    SELECT p_partkey,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
           reverse(p_brand) AS brand_rev,
           repeat(p_type, 2) AS type_twice,
           replace(p_name, ' ', '_') AS name_snake,
           CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
           left(p_name, 4) AS name4,
           right(p_brand, 2) AS brand_num,
           CAST(starts_with(p_type, 'S') AS BOOLEAN) AS is_s_type,
           CAST(contains(p_name, 'steel') AS BOOLEAN) AS has_steel
    FROM part
    """,
)
def q_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string kit: padding, reverse, repeat, replace,
    position, prefix/suffix slicing, predicates."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_type", 2).alias("type_twice"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.instr("p_name", "a").cast("bigint").alias("first_a"),
        F.substring("p_name", 1, 4).alias("name4"),
        F.substring("p_brand", -2, 2).alias("brand_num"),
        F.startswith(F.col("p_type"), F.lit("S")).alias("is_s_type"),
        F.contains(F.col("p_name"), F.lit("steel")).alias("has_steel"),
    )


@query(
    "q_math_funcs2",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(exp(l_discount), 6) AS disc_exp,
           CAST(sign(l_quantity - 25) AS INT) AS qty_sign,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate,
           round(log10(l_extendedprice), 6) AS price_log10,
           CAST(l_orderkey // 100 AS BIGINT) AS key_bucket,
           round(cbrt(l_extendedprice), 6) AS price_cbrt
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def q_math_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended math kit: exp, sign, greatest/least, log10, integer
    division, cube root."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") < 200).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("qty_sign"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.expr("l_orderkey div 100").alias("key_bucket"),
        F.round(F.cbrt("l_extendedprice"), 6).alias("price_cbrt"),
    )


@query(
    "q_set_ops_all",
    oracle="""
    SELECT c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 0
      UNION ALL
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ) u
    INTERSECT ALL
    SELECT c_custkey FROM customer
    EXCEPT ALL
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    """,
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (UNION/INTERSECT/EXCEPT ALL) —
    multiplicity-preserving variants of B.7."""
    c = load_table(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 0).select("c_custkey")
    bld = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    allc = load_table(spark, sf_dir, "customer").select("c_custkey")
    rich = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return pos.unionAll(bld).intersectAll(allc).exceptAll(rich)


@query(
    "q_window_distribution",
    oracle="""
    SELECT c_custkey,
           round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pct_rank,
           round(cume_dist() OVER (ORDER BY c_acctbal, c_custkey), 6) AS cume,
           first_value(c_custkey) OVER (PARTITION BY c_mktsegment
                                        ORDER BY c_acctbal DESC, c_custkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS segment_top_cust,
           nth_value(c_custkey, 2) OVER (PARTITION BY c_mktsegment
                                         ORDER BY c_acctbal DESC, c_custkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS segment_second_cust
    FROM customer
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank, cume_dist,
    first/nth value over full-partition frames (B.5 completeness).

    100 TB plan (round-6 rewrite; the r5 form ran Window.orderBy with
    no partitioning — Spark's own `WindowExec: No Partition Defined`
    single-task warning): the ordering (c_acctbal, c_custkey) is
    total (custkey unique → no ties), so percent_rank = (rk−1)/(n−1)
    and cume_dist = rk/n with rk the global row rank — computed by
    the Gini-style sharded two-phase prefix sum (analytics2.py):
    rows shard by a fixed acctbal-range bucket (monotone in the
    leading sort key), rank = local row_number within the shard +
    the prefix count of earlier shards from a TINY shard-count
    table; no row ever crosses a single-task window. The per-segment
    first/nth_value reduce to the segment's top-2 custkeys: local
    top-2 per (segment, shard) — parallel bounded windows — then a
    final window over ≤2·#shards candidate rows per segment.
    Oracle unchanged: same values, scale-safe plan."""
    c = load_table(spark, sf_dir, "customer")
    rows = c.select(
        "c_custkey",
        "c_acctbal",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 128).cast("bigint").alias("shard"),
    )
    # Two-phase distributed rank: bounded shard-count table carries
    # both the prefix offset and the grand total.
    w_prev = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    shard_off = (
        rows.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "shard",
            F.coalesce(F.sum("cnt").over(w_prev), F.lit(0)).alias("off"),
            F.sum("cnt").over(w_all).alias("n"),
        )
    )
    w_local = Window.partitionBy("shard").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    ranked = rows.join(F.broadcast(shard_off), "shard").select(
        "c_custkey",
        "c_acctbal",
        "c_mktsegment",
        (F.row_number().over(w_local) + F.col("off")).alias("rk"),
        "n",
    )
    # Segment top-2: per-(segment, shard) bounded top-2, then a final
    # window over the tiny candidate set.
    w_ls = Window.partitionBy("c_mktsegment", "shard").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    cands = (
        rows.withColumn("lrn", F.row_number().over(w_ls))
        .filter(F.col("lrn") <= 2)
        .drop("lrn")
    )
    w_seg = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    seg_top = (
        cands.withColumn("rn", F.row_number().over(w_seg))
        .filter(F.col("rn") <= 2)
        .groupBy("c_mktsegment")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("c_custkey"))).alias(
                "segment_top_cust"
            ),
            F.max(F.when(F.col("rn") == 2, F.col("c_custkey"))).alias(
                "segment_second_cust"
            ),
        )
    )
    rk, n = F.col("rk"), F.col("n")
    pct = F.when(n > 1, (rk - 1).cast("double") / (n - 1)).otherwise(F.lit(0.0))
    return ranked.join(F.broadcast(seg_top), "c_mktsegment").select(
        "c_custkey",
        F.round(pct, 6).alias("pct_rank"),
        F.round(rk.cast("double") / n, 6).alias("cume"),
        "segment_top_cust",
        "segment_second_cust",
    )


@query(
    "q_sliding_window",
    oracle="""
    WITH buckets AS (
      SELECT event_type, value,
             to_timestamp(floor(epoch(ts) / 300) * 300) AS b
      FROM events
    ), slides AS (
      SELECT event_type, value, b - (INTERVAL 5 MINUTE * g) AS window_start
      FROM buckets, generate_series(0, 2) AS t(g)
    )
    SELECT event_type,
           strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events
    FROM slides
    GROUP BY event_type, window_start
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows in batch: 15-minute windows sliding every 5 —
    F.window assigns each row to its 3 overlapping windows (the same
    construct Structured Streaming uses, B.9/B.10 bridge)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "15 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select("event_type", ts_str(F.col("w.start"), "window_start"), "n_events")
    )


@query(
    "q_gap_fill_spine",
    oracle="""
    WITH spine AS (
      SELECT u.user_id, d.d AS day
      FROM (SELECT DISTINCT user_id FROM events) u,
           generate_series(TIMESTAMP '2024-01-01 00:00:00',
                           TIMESTAMP '2024-01-30 00:00:00',
                           INTERVAL 1 DAY) AS d(d)
    ), daily AS (
      SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n
      FROM events GROUP BY user_id, date_trunc('day', ts)
    )
    SELECT s.user_id,
           strftime(s.day, '%Y-%m-%d') AS day,
           COALESCE(d.n, 0) AS n_events
    FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def q_gap_fill_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-spine gap filling: generate a dense (user, day) grid with
    sequence+explode, left-join sparse daily counts, fill zeros — the
    resample-with-holes primitive (B.9). The spine is tiny relative to
    data (users × days), so it broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    spine = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-30 00:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    daily = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(F.count("*").alias("n"))
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
    )
