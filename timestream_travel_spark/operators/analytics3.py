"""Product & financial analytics, part 3 (round 5, wave 4):
contingency-table independence, deterministic A/B testing, skyline
(Pareto-front) extraction, ABC classification, and top session
paths.

Float discipline per ops.py: integer/decimal sufficient statistics,
one correctly-rounded double expression at the end, DECIMAL-quantized
terms wherever a multi-row float sum exists, and DECIMAL (not float)
threshold comparisons for share cutoffs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.timeseries import sessionized
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_chi2_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type, CAST(hour(ts) // 6 AS BIGINT) AS day_quarter,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, day_quarter, n,
             SUM(n) OVER (PARTITION BY event_type) AS row_tot,
             SUM(n) OVER (PARTITION BY day_quarter) AS col_tot,
             SUM(n) OVER () AS grand
      FROM cells
    ), scored AS (
      SELECT event_type, day_quarter, n,
             CAST(row_tot * col_tot AS DOUBLE) / grand AS expected,
             CAST((n - CAST(row_tot * col_tot AS DOUBLE) / grand)
                  * (n - CAST(row_tot * col_tot AS DOUBLE) / grand)
                  / (CAST(row_tot * col_tot AS DOUBLE) / grand)
                  AS DECIMAL(20,10)) AS term
      FROM tot
    )
    SELECT event_type, day_quarter, n, expected,
           CAST(SUM(term) OVER () AS DOUBLE) AS chi2
    FROM scored
    """,
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between event type and
    time-of-day (four 6-hour quarters): the 'is user behaviour
    time-homogeneous' diagnostic. Expected cell counts are
    row·col/N on INTEGER marginals (one double division each,
    correctly rounded on both engines); each (o−e)²/e term is
    DECIMAL-quantized before the 20-cell sum so the statistic is
    order-independent.

    One map-side-combined groupBy reduces events to ≤ |types|×4
    cells; all three marginals ride window sums over that bounded
    table (no second event scan)."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        F.floor(F.hour("ts") / 6).cast("bigint").alias("day_quarter"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = cells.select(
        "event_type",
        "day_quarter",
        "n",
        F.sum("n").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("n").over(Window.partitionBy("day_quarter")).alias("col_tot"),
        F.sum("n").over(Window.partitionBy()).alias("grand"),
    )
    expected = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("grand")
    term = ((F.col("n") - expected) * (F.col("n") - expected) / expected).cast(
        "decimal(20,10)"
    )
    scored = tot.select(
        "event_type", "day_quarter", "n", expected.alias("expected"), term.alias("term")
    )
    return scored.select(
        "event_type",
        "day_quarter",
        "n",
        "expected",
        F.sum("term").over(Window.partitionBy()).cast("double").alias("chi2"),
    )


@query(
    "q_ab_test_zscore",
    oracle="""
    WITH assigned AS (
      SELECT user_id,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 2
               AS grp,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS c
      FROM events GROUP BY user_id
    ), arms AS (
      SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN grp = 0 THEN c ELSE 0 END) AS BIGINT) AS s_a,
             CAST(SUM(CASE WHEN grp = 1 THEN c ELSE 0 END) AS BIGINT) AS s_b,
             CAST(SUM(CASE WHEN grp = 0 THEN c * c ELSE 0 END) AS BIGINT) AS q_a,
             CAST(SUM(CASE WHEN grp = 1 THEN c * c ELSE 0 END) AS BIGINT) AS q_b
      FROM assigned
    ), stats AS (
      SELECT n_a, n_b, s_a, s_b,
             CAST(s_a AS DOUBLE) / n_a AS mean_a,
             CAST(s_b AS DOUBLE) / n_b AS mean_b,
             (CAST(n_a * q_a - s_a * s_a AS DOUBLE) / (n_a * (n_a - 1))) / n_a
               + (CAST(n_b * q_b - s_b * s_b AS DOUBLE) / (n_b * (n_b - 1))) / n_b
               AS se2
      FROM arms
    )
    SELECT n_a, n_b, s_a, s_b, mean_a, mean_b,
           CASE WHEN se2 = 0 THEN CAST(0 AS DOUBLE)
                ELSE (mean_a - mean_b) / sqrt(se2) END AS z_stat
    FROM stats
    """,
)
def q_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample z statistic on a deterministic 50/50 user
    split: users hash (md5) into arms A/B — reproducible on every
    engine and partition layout, the same seedless-randomness rule
    as q_weighted_sample — comparing mean purchases per user. For a
    hash split |z| > 1.96 is itself a data-quality alarm (the split
    should be behaviour-neutral).

    Sufficient statistics are six exact integers (n, Σc, Σc² per
    arm) from one map-side-combined per-user reduce + one aggregate
    row; means, the Welch standard error n·Σc²−(Σc)² form, and the
    final sqrt are each single correctly-rounded IEEE ops, with the
    degenerate zero-variance case pinned to z = 0 on both engines."""
    ev = load_table(spark, sf_dir, "events")
    grp = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % 2
    )
    assigned = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("c")
        )
        .select(grp.alias("grp"), "c")
    )
    is_a = F.col("grp") == 0
    arms = assigned.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(is_a, F.col("c")).otherwise(0)).cast("bigint").alias("s_a"),
        F.sum(F.when(~is_a, F.col("c")).otherwise(0)).cast("bigint").alias("s_b"),
        F.sum(F.when(is_a, F.col("c") * F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("q_a"),
        F.sum(F.when(~is_a, F.col("c") * F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("q_b"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    s_a, s_b, q_a, q_b = (F.col(c) for c in ("s_a", "s_b", "q_a", "q_b"))
    mean_a = s_a.cast("double") / n_a
    mean_b = s_b.cast("double") / n_b
    se2 = ((n_a * q_a - s_a * s_a).cast("double") / (n_a * (n_a - 1))) / n_a + (
        (n_b * q_b - s_b * s_b).cast("double") / (n_b * (n_b - 1))
    ) / n_b
    stats = arms.select(
        "n_a",
        "n_b",
        "s_a",
        "s_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        se2.alias("se2"),
    )
    z = F.when(F.col("se2") == 0, F.lit(0.0)).otherwise(
        (F.col("mean_a") - F.col("mean_b")) / F.sqrt(F.col("se2"))
    )
    return stats.select(
        "n_a", "n_b", "s_a", "s_b", "mean_a", "mean_b", z.alias("z_stat")
    )


@query(
    "q_skyline_parts",
    oracle="""
    WITH pts AS (
      SELECT p_brand, p_retailprice, p_size,
             CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(MIN(p_partkey) AS BIGINT) AS min_partkey
      FROM part GROUP BY 1, 2, 3
    ), flagged AS (
      SELECT p_brand, p_retailprice, p_size, n_parts, min_partkey,
             MIN(p_size) OVER (PARTITION BY p_brand
                               ORDER BY p_retailprice, p_size
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS mprev
      FROM pts
    )
    SELECT p_brand, p_retailprice, CAST(p_size AS BIGINT) AS p_size,
           n_parts, min_partkey
    FROM flagged WHERE mprev IS NULL OR p_size < mprev
    """,
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand 2D skyline (Pareto front, Börzsönyi et al. ICDE'01
    public operator): the parts not dominated on (price ↓, size ↓) —
    'no cheaper-and-smaller alternative exists in the brand'.

    The classic sort-based 2D trick, not an all-pairs anti-join: on
    DISTINCT (price, size) points sorted by (price, size), a point is
    dominated iff the running size-minimum over STRICTLY preceding
    rows is ≤ its size — so the skyline falls out of one window pass
    over the deduplicated point set. One exchange on brand serves
    both the dedup groupBy and the window (same partitioning). At
    100 TB the per-brand point set is bounded by the price×size
    domain, not the row count — dedup first is the scale move."""
    p = load_table(spark, sf_dir, "part")
    pts = p.groupBy("p_brand", "p_retailprice", "p_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.min("p_partkey").cast("bigint").alias("min_partkey"),
    )
    w = (
        Window.partitionBy("p_brand")
        .orderBy("p_retailprice", "p_size")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = pts.select(
        "p_brand",
        "p_retailprice",
        "p_size",
        "n_parts",
        "min_partkey",
        F.min("p_size").over(w).alias("mprev"),
    )
    return flagged.filter(
        F.col("mprev").isNull() | (F.col("p_size") < F.col("mprev"))
    ).select(
        "p_brand",
        "p_retailprice",
        F.col("p_size").cast("bigint").alias("p_size"),
        "n_parts",
        "min_partkey",
    )


@query(
    "q_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS r
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT l_partkey, r,
             SUM(r) OVER (ORDER BY r DESC, l_partkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(r) OVER () AS tot
      FROM rev
    ), classed AS (
      SELECT l_partkey, r,
             CASE WHEN 5 * cum <= 4 * tot THEN 'A'
                  WHEN 20 * cum <= 19 * tot THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(CAST(SUM(r) AS VARCHAR) AS DOUBLE) AS class_revenue,
           CAST(CAST(SUM(r) AS VARCHAR) AS DOUBLE)
             / (SELECT CAST(CAST(SUM(r) AS VARCHAR) AS DOUBLE) FROM rev)
             AS revenue_share
    FROM classed GROUP BY abc_class
    """,
)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification (public Pareto-analysis rule):
    parts sorted by revenue descending; class A = the head covering
    ≤ 80% of cumulative revenue, B = next 15%, C = the tail. The
    class cutoffs compare 5·cum ≤ 4·tot and 20·cum ≤ 19·tot in exact
    DECIMAL — never a float share against 0.8 — so boundary parts
    classify identically on both engines.

    The cumulative revenue uses one ordered window over the
    PART-count table (per-part totals, map-side combined). On this
    engine the window runs range-sharded in spirit via the same
    distributed-rank pattern as q_gini_concentration; here the
    direct form is kept because the classed output feeds a 3-row
    aggregate, and Spark's window on the part table is the exact
    shape AQE handles — the 100 TB upgrade is mechanical (shard by
    revenue bucket exactly as gini does)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
        ).alias("r")
    )
    wcum = Window.orderBy(F.desc("r"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy()
    ranked = rev.select(
        "l_partkey",
        "r",
        F.sum("r").over(wcum).alias("cum"),
        F.sum("r").over(wtot).alias("tot"),
    )
    abc = (
        F.when(F.lit(5) * F.col("cum") <= F.lit(4) * F.col("tot"), "A")
        .when(F.lit(20) * F.col("cum") <= F.lit(19) * F.col("tot"), "B")
        .otherwise("C")
    )
    classed = ranked.select("l_partkey", "r", abc.alias("abc_class"))
    total = rev.agg(F.sum("r").cast("double").alias("tot_d"))
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("r").cast("double").alias("class_revenue"),
        )
        .join(F.broadcast(total))
        .select(
            "abc_class",
            "n_parts",
            "class_revenue",
            (F.col("class_revenue") / F.col("tot_d")).alias("revenue_share"),
        )
    )


PATH_LEN = 5
TOP_PATHS = 20


@query(
    "q_session_paths",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    ), paths AS (
      SELECT user_id, session_id,
             array_to_string(
               list_sort(list(strftime(ts, '%Y-%m-%d %H:%M:%S') || '|'
                              || lpad(CAST(event_id AS VARCHAR), 12, '0') || '|'
                              || event_type))[1:{PATH_LEN}]
               , '>') AS tagged
      FROM sessions GROUP BY user_id, session_id
    ), cleaned AS (
      SELECT regexp_replace(tagged, '[^>]*\\|[^>]*\\|', '', 'g') AS path
      FROM paths
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM cleaned GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT {TOP_PATHS}
    """,
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_PATHS} session prefixes: the first {PATH_LEN} event
    types of each 30-minute-gap session joined into a path string —
    the 'most common user journeys' table.

    The per-session ordered prefix is a grouped sort-collect (the
    q_cdc_passage_dedup reassembly pattern): each event is tagged
    with a lexically-sortable (timestamp|zero-padded-id) prefix,
    sorted IN-ROW after collect_list (no second window), sliced to
    {PATH_LEN}, and stripped back to the bare event types. Session
    derivation shares the one user_id exchange; the path count is a
    map-side-combined groupBy on short strings; TakeOrdered returns
    the top {TOP_PATHS} with a deterministic path tiebreak."""
    ev = load_table(spark, sf_dir, "events")
    sess = sessionized(ev, "event_type")
    tag = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        F.lit("|"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
        F.lit("|"),
        F.col("event_type"),
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.slice(F.array_sort(F.collect_list(tag)), 1, PATH_LEN), ">"
        ).alias("tagged")
    )
    cleaned = paths.select(
        F.regexp_replace("tagged", r"[^>]*\|[^>]*\|", "").alias("path")
    )
    return (
        cleaned.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(TOP_PATHS)
    )
