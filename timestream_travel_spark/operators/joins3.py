"""Join operators, part 3 (round-5 wave 9): Allen's interval
algebra (Allen, CACM'83 — public) over session intervals ×
maintenance windows.

The interval-overlap join (joins.py) answers "do they intersect";
Allen's 13 relations answer HOW two intervals relate — before,
meets, overlaps, starts, during, finishes, equals, and their
inverses — the vocabulary temporal reasoning and conflict
detection are built on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.joins2 import TOP_WINDOWS, WINDOW_MIN
from timestream_travel_spark.operators.timeseries import sessionized
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


def _allen_case(s1, e1, s2, e2) -> Column:
    """The 13-way classification on second-precision bounds. Order
    matters: equality tests first, then containment, then overlap,
    then disjoint — each pair matches exactly one relation."""
    return (
        F.when((s1 == s2) & (e1 == e2), "equals")
        .when((s1 == s2) & (e1 < e2), "starts")
        .when((s1 == s2) & (e1 > e2), "started_by")
        .when((e1 == e2) & (s1 > s2), "finishes")
        .when((e1 == e2) & (s1 < s2), "finished_by")
        .when(e1 == s2, "meets")
        .when(e2 == s1, "met_by")
        .when((s1 > s2) & (e1 < e2), "during")
        .when((s1 < s2) & (e1 > e2), "contains")
        .when((s1 < s2) & (e1 > s2) & (e1 < e2), "overlaps")
        .when((s2 < s1) & (e2 > s1) & (e2 < e1), "overlapped_by")
        .when(e1 < s2, "before")
        .otherwise("after")
    )


_ALLEN_CASE_SQL = """
    CASE WHEN s1 = s2 AND e1 = e2 THEN 'equals'
         WHEN s1 = s2 AND e1 < e2 THEN 'starts'
         WHEN s1 = s2 AND e1 > e2 THEN 'started_by'
         WHEN e1 = e2 AND s1 > s2 THEN 'finishes'
         WHEN e1 = e2 AND s1 < s2 THEN 'finished_by'
         WHEN e1 = s2 THEN 'meets'
         WHEN e2 = s1 THEN 'met_by'
         WHEN s1 > s2 AND e1 < e2 THEN 'during'
         WHEN s1 < s2 AND e1 > e2 THEN 'contains'
         WHEN s1 < s2 AND e1 > s2 AND e1 < e2 THEN 'overlaps'
         WHEN s2 < s1 AND e2 > s1 AND e2 < e1 THEN 'overlapped_by'
         WHEN e1 < s2 THEN 'before'
         ELSE 'after' END
"""


@query(
    "q_allen_relations",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS session_id,
             ts
      FROM flagged
    ), ivals AS (
      SELECT user_id, session_id,
             CAST(floor(epoch(MIN(ts))) AS BIGINT) AS s1,
             CAST(floor(epoch(MAX(ts))) AS BIGINT) AS e1
      FROM sess GROUP BY user_id, session_id
    ), win AS (
      SELECT CAST(floor(epoch(h)) AS BIGINT) AS s2,
             CAST(floor(epoch(h)) AS BIGINT) + {WINDOW_MIN} * 60 AS e2
      FROM (
        SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
        FROM events GROUP BY 1
        ORDER BY n DESC, h LIMIT {TOP_WINDOWS}
      )
    )
    SELECT {_ALLEN_CASE_SQL} AS relation, COUNT(*) AS n_pairs
    FROM ivals CROSS JOIN win
    GROUP BY 1
    """,
)
def q_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of Allen interval relations between every user
    session interval and the {TOP_WINDOWS} busiest maintenance
    windows — how does user activity RELATE to the windows (inside
    them, straddling their start, strictly before, ...), not just
    whether it overlaps.

    Scale shape: sessions reduce to (s, e) second-bounds (the
    q_sessionize exchange); the window side is TOP_WINDOWS rows —
    a broadcast — so the 13-way CASE runs map-side on
    |sessions|×{TOP_WINDOWS} rows with a map-side-combined count.
    Between two corpus-sized interval sets the same classification
    gates on the binned interval join (joins2.binned_interval_join)
    first and classifies only candidate pairs, with disjoint pairs
    counted arithmetically instead of materialized."""
    sess = sessionized(load_table(spark, sf_dir, "events"))
    ivals = sess.groupBy("user_id", "session_id").agg(
        F.unix_timestamp(F.min("ts")).alias("s1"),
        F.unix_timestamp(F.max("ts")).alias("e1"),
    )
    ev = load_table(spark, sf_dir, "events")
    win = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("h"))
        .limit(TOP_WINDOWS)
        .select(
            F.unix_timestamp("h").alias("s2"),
            (F.unix_timestamp("h") + WINDOW_MIN * 60).alias("e2"),
        )
    )
    pairs = ivals.crossJoin(F.broadcast(win))
    rel = _allen_case(F.col("s1"), F.col("e1"), F.col("s2"), F.col("e2"))
    return pairs.groupBy(rel.alias("relation")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


# ------------------------------------------------- event-pattern match

# MATCH_RECOGNIZE-lite: each session becomes a string of event-type
# initials in time order; row-pattern queries are then plain regexes
# over that string. Patterns shared by both engines (Java ∩ DuckDB-RE2
# subset — the q_pii_scrub rule: no lookbehind, no backrefs).
EVENT_PATTERNS: list[tuple[str, str]] = [
    ("view_to_purchase", "v.*c.*p"),  # funnel: view ... click ... purchase
    ("double_error", "e.*e"),  # at least two errors in one session
    ("signup_first", "^s"),  # session opens with a signup
]


@query(
    "q_event_pattern_match",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS session_id
      FROM flagged
    ), strings AS (
      SELECT user_id, session_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      FROM sess GROUP BY user_id, session_id
    ), pat(pattern_name, pattern) AS (
      VALUES {", ".join(f"('{n}', '{p}')" for n, p in EVENT_PATTERNS)}
    )
    SELECT p.pattern_name,
           COUNT(*) FILTER (WHERE regexp_matches(s.seq, p.pattern)) AS n_matched,
           COUNT(*) AS n_sessions
    FROM strings s CROSS JOIN pat p
    GROUP BY p.pattern_name
    """,
)
def q_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching over sessions (MATCH_RECOGNIZE-lite):
    each session reduces to its time-ordered string of event-type
    initials, and patterns like view→…→click→…→purchase become plain
    regexes over that string — the composable poor-man's form of
    SQL:2016 row-pattern recognition, strictly more expressive than
    the fixed-stage funnel (q_funnel_conversion) for ordering
    constraints.

    Scale shape: the shared sessionizer's one user_id exchange +
    a per-session sort-collect (session-bounded strings, the
    q_session_paths shape); the pattern table is a literal broadcast,
    so matching is a map-side regexp over |sessions|×|patterns|
    rows with a combined count."""
    sess = sessionized(load_table(spark, sf_dir, "events"), "event_type")
    strings = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("i"))
                        )
                    ),
                    lambda s: s["i"],
                ),
                "",
            ).alias("seq")
        )
    )
    pats = spark.createDataFrame(EVENT_PATTERNS, "pattern_name string, pattern string")
    return (
        strings.crossJoin(F.broadcast(pats))
        .groupBy("pattern_name")
        .agg(
            F.sum(F.regexp_like(F.col("seq"), F.col("pattern")).cast("bigint")).alias("n_matched"),
            F.count(F.lit(1)).alias("n_sessions"),
        )
    )
