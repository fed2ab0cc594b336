"""Join surface (SURVEY.md §2 B.3).

The reference performs no joins — its per-partition fan-out
(cmd/backup.go:228-231) is the moral equivalent of a semi-join of the
fact table against discovered partition values, expressed here as a
real broadcast semi-join. Everything else is the standard surface a
query engine needs, planned for scale:

- dimension joins carry an explicit ``F.broadcast`` hint (region,
  nation, supplier are tiny at any SF; customer broadcasts to ~100 MB
  even at sf100);
- fact-fact joins (orders ⋈ lineitem) shuffle on the join key and are
  AQE-managed (skew split, SMJ→broadcast demotion);
- the as-of join is the union+window composition — one shuffle on
  (key), no range explosion, scales linearly with input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.ops import dsum, dsum_sql, revenue_col, REVENUE_SQL, ts_str
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_join_broadcast_dims",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(20,4))) AS DOUBLE) AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dimension join chain with explicit broadcast hints:
    customer ⋈ nation ⋈ region never shuffles the fact side."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.count("*").alias("n_custs"), dsum("c_acctbal", "sum_acctbal"))
    )


@query(
    "q_join_fact",
    oracle=f"""
    SELECT o.o_orderpriority,
           {dsum_sql(REVENUE_SQL, 'revenue', 8)},
           COUNT(*) AS n_items
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o.o_orderpriority
    """,
)
def q_join_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join (orders ⋈ lineitem) shuffled on orderkey;
    the o_orderdate filter is pushed below the join into the scan."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.filter(F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(dsum(revenue_col(), "revenue", scale=8), F.count("*").alias("n_items"))
    )


@query(
    "q_join_outer",
    oracle="""
    SELECT n.n_name AS nation_name, COUNT(c.c_custkey) AS n_custs
    FROM nation n LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving empty nations (count(col) skips the
    null-extended rows, so empty nations show 0)."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.count("c_custkey").alias("n_custs"))
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi-join — the generalized form of the reference's
    'process only discovered partition values' (cmd/backup.go:228-231)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti-join: customers with no pending ('P') order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    pending = o.filter(F.col("o_orderstatus") == "P")
    return c.join(pending, c.c_custkey == pending.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_cross",
    oracle="""
    SELECT r1.r_name AS r1_name, r2.r_name AS r2_name
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey < r2.r_regionkey
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (unordered-pair enumeration) — only ever sane on
    small/broadcastable inputs, which is how it's planned here."""
    r = load_table(spark, sf_dir, "region")
    r1 = r.select(F.col("r_regionkey").alias("k1"), F.col("r_name").alias("r1_name"))
    r2 = r.select(F.col("r_regionkey").alias("k2"), F.col("r_name").alias("r2_name"))
    return r1.crossJoin(F.broadcast(r2)).filter(F.col("k1") < F.col("k2")).select("r1_name", "r2_name")


@query(
    "q_join_range",
    oracle="""
    SELECT o.o_orderkey, COUNT(*) AS n_fast_items
    FROM orders o JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 7 DAY
    GROUP BY o.o_orderkey
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join: the equi key carries the shuffle, the
    range predicate evaluates post-match — no cartesian blowup."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 7 DAY"))
    )
    return o.join(li, cond).groupBy("o_orderkey").agg(F.count("*").alias("n_fast_items"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """As-of join (nearest prior right row per left row) via the
    union+window composition — SURVEY.md §4 item 3.

    Instead of a range join (quadratic blowup per key), tag and union
    both inputs, sort within each key by (ts, side), and carry the
    most recent right-side values forward with last(ignorenulls) over
    an unbounded-preceding frame. One shuffle on `on`, linear in
    rows — survives 100 TB where a per-key range join dies. Right rows
    at exactly left_ts match (side ordering puts right first on ties),
    matching DuckDB ASOF JOIN `>=` semantics.
    """
    lcols = left.columns
    carried = [f"__r_{c}" for c in right_cols]
    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(rc) for c, rc in zip(right_cols, carried)],
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(rc) for c, rc in zip(right_cols, carried)],
    )
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "*", *[F.last(rc, ignorenulls=True).over(w).alias(f"__f_{rc}") for rc in carried]
    )
    out = filled.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__f___r_{c}").alias(f"right_{c}") for c in right_cols]
    )
    if how == "inner":
        out = out.dropna(subset=[f"right_{right_cols[0]}"])
    return out


@query(
    "q_join_asof",
    oracle="""
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent prior click by
    the same user. Time-series core op (B.3); DuckDB ASOF JOIN oracle."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = asof_join(purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", right_cols=["ts", "value"])
    return joined.select(
        "event_id",
        "user_id",
        ts_str("ts", "purchase_ts"),
        ts_str("right_ts", "click_ts"),
        F.col("right_value").alias("click_value"),
    )


@query(
    "q_join_interval_overlap",
    oracle="""
    WITH sess AS (
      SELECT user_id, ts AS start_ts, ts + INTERVAL 30 MINUTE AS end_ts, event_id
      FROM events WHERE event_type = 'signup'
    )
    SELECT s.event_id AS signup_event, COUNT(e.event_id) AS n_overlapping
    FROM sess s JOIN events e
      ON s.user_id = e.user_id
     AND e.ts >= s.start_ts AND e.ts <= s.end_ts
     AND e.event_id <> s.event_id
    GROUP BY s.event_id
    """,
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: events falling inside a 30-minute window
    after each signup, equi-keyed on user_id so the range predicate
    only filters within key groups."""
    ev = load_table(spark, sf_dir, "events")
    sess_src = load_table(spark, sf_dir, "events")
    sess = sess_src.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("end_ts"),
        F.col("event_id").alias("signup_event"),
    )
    cond = (
        (sess.s_user == ev.user_id)
        & (ev.ts >= sess.start_ts)
        & (ev.ts <= sess.end_ts)
        & (ev.event_id != sess.signup_event)
    )
    return sess.join(ev, cond).groupBy("signup_event").agg(F.count("event_id").alias("n_overlapping"))
