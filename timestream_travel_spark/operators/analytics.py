"""Event-sequence analytics over the events table: ordered funnel
conversion and weekly cohort retention — the product-analytics query
family a time-series store (the reference's Timestream source,
SURVEY.md §1.1) exists to serve.

Scale shape: every stage keys on user_id — one hash partitioning
reused across the per-stage aggregates and joins (Catalyst reuses the
exchange), and each stage's output is one row per user, so the joins
shrink monotonically down the funnel. The final outputs are
stage-count rows (funnel) or (cohort, week) cells (retention) — both
parameter-sized at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_funnel_conversion",
    oracle="""
    WITH fv AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), fc AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > fv.v_ts
      GROUP BY e.user_id
    ), fp AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN fc ON fc.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > fc.c_ts
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM fv) AS BIGINT) AS n_view_users,
           CAST((SELECT COUNT(*) FROM fc) AS BIGINT) AS n_click_users,
           CAST((SELECT COUNT(*) FROM fp) AS BIGINT) AS n_purchase_users,
           round(CAST((SELECT COUNT(*) FROM fc) AS DOUBLE)
                 / (SELECT COUNT(*) FROM fv), 6) AS view_to_click,
           round(CAST((SELECT COUNT(*) FROM fp) AS DOUBLE)
                 / (SELECT COUNT(*) FROM fc), 6) AS click_to_purchase
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase: a user converts a stage
    only with an event STRICTLY AFTER their first event of the prior
    stage. Per-stage first-times are per-user aggregates (one row per
    user), so each inter-stage join is small-side-shrinking on the
    same user_id partitioning; the output is one summary row."""
    ev = load_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    fc = (
        ev.filter(F.col("event_type") == "click")
        .join(fv, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    nv = fv.agg(F.count("*").cast("bigint").alias("n_view_users"))
    nc = fc.agg(F.count("*").cast("bigint").alias("n_click_users"))
    np_ = fp.agg(F.count("*").cast("bigint").alias("n_purchase_users"))
    # three 1-row aggregates — the crossJoin is driver-trivial
    out = nv.crossJoin(nc).crossJoin(np_)
    return out.select(
        "n_view_users",
        "n_click_users",
        "n_purchase_users",
        F.round(F.col("n_click_users").cast("double") / F.col("n_view_users"), 6).alias(
            "view_to_click"
        ),
        F.round(
            F.col("n_purchase_users").cast("double") / F.col("n_click_users"), 6
        ).alias("click_to_purchase"),
    )


@query(
    "q_retention_cohorts",
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort, a.wk) / 7 AS INT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM act a JOIN first f ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the Monday of
    their first event's week; each (cohort, week_offset) cell counts
    distinct users from that cohort active that week. Both sides
    aggregate to one-row-per-user(-week) BEFORE the join — the join
    input is already minimal, and the cell grid output is tiny."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort"))
    act = ev.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    j = act.join(first, "user_id")
    return (
        j.groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )


@query(
    "q_scd2_intervals",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS is_change
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
      SELECT user_id, event_type, ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM marked WHERE is_change = 1
    )
    SELECT user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           coalesce(strftime(next_ts, '%Y-%m-%d %H:%M:%S'), 'current') AS valid_to
    FROM changes
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event stream:
    collapse per-user runs of the same event_type into
    [valid_from, valid_to) intervals, open interval marked 'current' —
    the standard warehouse dimension-history derivation (run-length
    encoding via a change-flag window, then lead() for the closing
    bound). Two window passes on one (user_id, ts) ordering — the
    sort is paid once."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type"))
        ).cast("int").alias("is_change"),
    )
    changes = marked.filter(F.col("is_change") == 1).select(
        "user_id",
        "event_type",
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
    )
    return changes.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format("next_ts", "yyyy-MM-dd HH:mm:ss"), F.lit("current")
        ).alias("valid_to"),
    )


@query(
    "q_latency_percentiles",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day exact p50/p95/p99 of the value distribution — the
    observability dashboard query. Exact sort-based percentile per
    (day) group; at 100 TB the approx_percentile sketch twin
    (q_percentiles) is the scan-shaped path, this is the
    oracle-exact one."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    pct = lambda p, a: F.round(F.percentile("value", F.lit(p)), 4).alias(a)  # noqa: E731
    return ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        pct(0.5, "p50"),
        pct(0.95, "p95"),
        pct(0.99, "p99"),
    )
