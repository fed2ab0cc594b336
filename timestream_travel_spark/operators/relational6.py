"""Relational operators, part 6: MERGE-style upsert, windowed
distinct counting, rank-distribution statistics, and deterministic
per-group mode.

The reference ships plain SELECTs to a remote engine
(cmd/backup.go:240-257); these are the standard warehouse-surface
operators any engine replacing it needs. All four are pure DataFrame
compositions — no UDFs — so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.ops import ts_str
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

MERGE_CUTOFF = "2001-01-01"  # source = orders on/after this date (late
# cutoff: most target rows take the 'keep' branch, a minority match)


@query(
    "q_merge_upsert",
    oracle=f"""
    WITH target AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 7 <> 0
    ), source AS (
      SELECT o_custkey AS c_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS delta
      FROM orders WHERE o_orderdate >= TIMESTAMP '{MERGE_CUTOFF} 00:00:00'
      GROUP BY o_custkey
    )
    SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
           CASE WHEN t.c_custkey IS NULL THEN 'insert'
                WHEN s.c_custkey IS NULL THEN 'keep'
                ELSE 'update' END AS action,
           round(COALESCE(t.c_acctbal, 0.0) + COALESCE(s.delta, 0.0), 2)
             AS new_acctbal
    FROM target t FULL JOIN source s ON t.c_custkey = s.c_custkey
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as a full-outer-join composition — the
    SQL:2003 upsert the reference's warehouse context implies:

      WHEN MATCHED              THEN UPDATE (acctbal += recent spend)
      WHEN NOT MATCHED          THEN INSERT (new account at spend)
      WHEN NOT MATCHED BY SOURCE THEN keep the target row unchanged

    Target is the customer dim minus every 7th key (so the insert
    branch fires); source is recent-order spend per customer (so some
    target rows see no source row and take the keep branch). One
    full outer join on the merge key: at 100 TB both sides shuffle
    once on c_custkey and every branch is a projection — exactly how
    Delta/Iceberg engines execute MERGE's join phase."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    target = cust.filter(F.col("c_custkey") % 7 != 0).select("c_custkey", "c_acctbal")
    source = (
        orders.filter(F.col("o_orderdate") >= MERGE_CUTOFF)
        .groupBy(F.col("o_custkey").alias("s_custkey"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("delta")
        )
    )
    j = target.join(source, target.c_custkey == source.s_custkey, "full")
    action = (
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("s_custkey").isNull(), "keep")
        .otherwise("update")
    )
    return j.select(
        F.coalesce("c_custkey", "s_custkey").alias("c_custkey"),
        action.alias("action"),
        F.round(
            F.coalesce("c_acctbal", F.lit(0.0)) + F.coalesce("delta", F.lit(0.0)), 2
        ).alias("new_acctbal"),
    )


@query(
    "q_window_count_distinct",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id,
             CASE WHEN row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
             THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_id,
           CAST(SUM(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_distinct_types
    FROM s
    """,
)
def q_window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — which no engine
    supports directly (Spark and DuckDB both reject DISTINCT window
    aggregates) — via the standard first-occurrence rewrite: flag each
    row that introduces a new (user, event_type), then running-sum the
    flags. Two window passes sharing the user_id partitioning, so one
    exchange; no per-row distinct state, which is what makes this
    shape viable on unbounded history at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_seen = F.when(F.row_number().over(w_first) == 1, 1).otherwise(0)
    return ev.select(
        "user_id",
        "ts",
        "event_id",
        first_seen.alias("first_seen"),
    ).select(
        "user_id",
        ts_str("ts", "ts"),
        "event_id",
        F.sum("first_seen").over(w_run).cast("bigint").alias("n_distinct_types"),
    )


@query(
    "q_rank_distribution",
    oracle="""
    WITH r AS (
      SELECT event_type, value,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd,
             ntile(10) OVER w AS decile
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    )
    SELECT event_type, decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(min(pr), 6) AS min_pr, round(max(pr), 6) AS max_pr,
           round(max(cd), 6) AS max_cd,
           round(min(value), 6) AS lo_value, round(max(value), 6) AS hi_value
    FROM r GROUP BY event_type, decile
    """,
)
def q_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile over per-type value order,
    folded into a decile summary table (the remaining B.5 analytic
    rank functions; row_number/rank/dense_rank/ntile already have a
    dedicated query). The event_id tiebreaker makes the ordering
    total, so rank values are engine-deterministic. Window and
    aggregate share the event_type partitioning — one exchange, and
    the output is a fixed |types|×10 grid."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = ev.select(
        "event_type",
        "value",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(10).over(w).alias("decile"),
    )
    return r.groupBy("event_type", "decile").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.min("pr"), 6).alias("min_pr"),
        F.round(F.max("pr"), 6).alias("max_pr"),
        F.round(F.max("cd"), 6).alias("max_cd"),
        F.round(F.min("value"), 6).alias("lo_value"),
        F.round(F.max("value"), 6).alias("hi_value"),
    )


@query(
    "q_mode_per_group",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type
    ), rk AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS r
      FROM c
    )
    SELECT user_id, event_type AS mode_type, n FROM rk WHERE r = 1
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent event_type per
    user). The built-in mode() aggregate breaks ties arbitrarily in
    both engines, so this is the portable formulation: count + argmax
    window with an explicit lexicographic tiebreak. Count and window
    share the user_id grouping; the candidate table entering the
    window is |users|×|types|, not the raw event count."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        c.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )


@query(
    "q_lateral_topk",
    oracle="""
    SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS c_acctbal
    FROM nation n,
    LATERAL (SELECT c_name, c_acctbal FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 2) t
    """,
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999 lateral derived table):
    per outer row, an ordered-and-limited inner scan - 'top-2
    customers per nation' phrased the way analysts write it. Catalyst
    decorrelates this into the same window-rank plan the DataFrame
    top-k-per-group query builds by hand (q_window_topk_per_group is
    the API twin); DuckDB runs the identical statement, pinning the
    decorrelation semantics cross-engine."""
    from timestream_travel_spark.tables import load_tables

    load_tables(spark, sf_dir, ["nation", "customer"])
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS c_acctbal
        FROM nation n,
        LATERAL (SELECT c_name, c_acctbal FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        """
    )


@query(
    "q_nullsafe_join",
    oracle="""
    WITH labeled AS (
      SELECT c_custkey, nullif(c_nationkey % 5, 4) AS seg
      FROM customer
    ), dim AS (
      SELECT nullif(j, 4) AS seg,
             CASE WHEN nullif(j, 4) IS NULL THEN 'unassigned'
                  ELSE 'segment_' || CAST(j AS VARCHAR) END AS seg_name
      FROM unnest(generate_series(0, 4)) AS t(j)
    )
    SELECT d.seg_name, CAST(COUNT(l.c_custkey) AS BIGINT) AS n_customers
    FROM labeled l JOIN dim d ON l.seg IS NOT DISTINCT FROM d.seg
    GROUP BY d.seg_name
    """,
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (Spark `<=>` == SQL IS NOT DISTINCT FROM):
    customers carry a nullable segment key (every 5th bucket is
    unassigned → NULL) and the dim carries a NULL row for it; the
    null-safe predicate pairs them where a plain `=` would silently
    drop every unassigned customer. Catalyst plans `<=>` as a HASH
    join key (null-safe equality is still hashable) — no fallback to
    nested-loop, which is what makes the idiom usable on a 100 TB
    fact side."""
    cust = load_table(spark, sf_dir, "customer")
    labeled = cust.select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(4)).alias("seg")
    )
    dim = (
        spark.range(5)
        .select(F.nullif(F.col("id"), F.lit(4)).alias("seg"), F.col("id"))
        .select(
            "seg",
            F.when(F.col("seg").isNull(), "unassigned")
            .otherwise(F.concat(F.lit("segment_"), F.col("id").cast("string")))
            .alias("seg_name"),
        )
    )
    j = labeled.join(F.broadcast(dim), labeled.seg.eqNullSafe(dim.seg))
    return j.groupBy("seg_name").agg(
        F.count("c_custkey").cast("bigint").alias("n_customers")
    )


@query(
    "q_distinct_intersection",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_both
    FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
)
def q_distinct_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-set intersection cardinality (users who both
    clicked AND purchased) via INTERSECT of the two distinct key
    sets - the oracle twin of q_hll_intersection_est. Each side
    reduces to distinct user_ids BEFORE the intersect, so the set op
    runs on |users| rows, not |events|."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return clicks.intersect(buys).agg(
        F.count("*").cast("bigint").alias("n_both")
    )


@query("q_hll_intersection_est")
def q_hll_intersection_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct intersection by HLL inclusion-exclusion:
    |A∩B| ≈ est(A) + est(B) − est(A∪B), from three mergeable
    sketches built in ONE pass over events (conditional sketch aggs).
    The 100 TB story: sketches are constant-size, mergeable across
    partitions and across DAYS — a daily sketch table answers any
    period's intersection without rescanning events (the same
    incremental-cardinality motivation as q_hll_sketch_union).
    Rows-only (sketch binaries are engine-specific); pytest bounds
    the estimate against the exact INTERSECT twin."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    sk = ev.agg(
        F.hll_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("sk_a"),
        F.hll_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("sk_b"),
        F.hll_sketch_agg("user_id").alias("sk_u"),
    )
    est = sk.select(
        F.round(F.hll_sketch_estimate("sk_a"), 0).cast("bigint").alias("n_click_est"),
        F.round(F.hll_sketch_estimate("sk_b"), 0).cast("bigint").alias("n_purchase_est"),
        F.round(F.hll_sketch_estimate("sk_u"), 0).cast("bigint").alias("n_union_est"),
    )
    return est.select(
        "n_click_est",
        "n_purchase_est",
        "n_union_est",
        (F.col("n_click_est") + F.col("n_purchase_est") - F.col("n_union_est"))
        .cast("bigint")
        .alias("n_both_est"),
    )
