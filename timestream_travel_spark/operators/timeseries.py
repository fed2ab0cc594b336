"""Time-series operators (SURVEY.md §2 B.9) — the reference's domain,
generalized: resampling, tumbling windows, sessionization, series
pivot (the Timestream TimeSeries type, helpers/helpers.go:12-25), and
the chunked-export bounds computation (cmd/backup.go:266-281).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.ops import davg, davg_sql, ts_str
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_resample_hourly",
    oracle=f"""
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_s,
           COUNT(*) AS n_events,
           {davg_sql('value', 'avg_value')}
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def q_resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample to hourly buckets per series (date_trunc + agg) —
    the canonical resample; partial aggregation makes this one of the
    cheapest possible plans at 100 TB (combine before shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("n_events"), davg("value", "avg_value"))
        .select("event_type", ts_str("hour", "hour_s"), "n_events", "avg_value")
    )


@query(
    "q_tumbling_window",
    oracle="""
    SELECT event_type,
           strftime(to_timestamp(floor(epoch(ts) / 300) * 300), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type, floor(epoch(ts) / 300)
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling windows via F.window — the same construct the
    streaming jobs use (B.10), here in batch."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("sum_value"),
        )
        .select("event_type", ts_str(F.col("w.start"), "window_start"), "n_events", "sum_value")
    )


SESSION_GAP_S = 1800  # 30-min inactivity gap, shared engine-wide


def sessionized(ev, *extra_cols: str):
    """(user_id, ts, event_id, *extra_cols, session_id): THE
    sessionizer — gap > SESSION_GAP_S starts a new session; lag-flag
    + running sum over the (user_id, ts, event_id) order, one
    user_id exchange. Shared by q_sessionize, session transitions
    (analytics2), session paths (analytics3), and Kaplan-Meier
    session durations (timeseries12) so the gap rule and tie-break
    can never drift between operators."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > SESSION_GAP_S),
        F.lit(1),
    ).otherwise(F.lit(0))
    return ev.select(
        "user_id",
        "ts",
        "event_id",
        *extra_cols,
        F.sum(new_session).over(wrun).alias("session_id"),
    )


@query(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, event_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30 min starts a new session. lag-flag +
    running sum — one shuffle on user_id, linear state (B.9)."""
    sessions = sessionized(load_table(spark, sf_dir, "events"))
    return sessions.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id")).agg(
        F.count("*").alias("n_events"),
        ts_str(F.min("ts"), "session_start"),
        ts_str(F.max("ts"), "session_end"),
    )


@query(
    "q_series_pivot",
    oracle="""
    SELECT user_id,
           array_to_string(
             list_sort(list(strftime(ts, '%Y-%m-%d %H:%M:%S') || '=' ||
                            CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR))),
             '|') AS series
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def q_series_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series assembly: the Timestream TimeSeries type (time→value
    map, helpers/helpers.go:12-25) built with collect_list; emitted as
    a sorted joined string so map ordering can't break comparison
    (SURVEY.md §7 risk note)."""
    ev = load_table(spark, sf_dir, "events")
    entry = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        F.lit("="),
        F.col("value").cast("decimal(12,2)").cast("string"),
    )
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.array_join(F.sort_array(F.collect_list(entry)), "|").alias("series"))
    )


def chunk_manifest(
    df: DataFrame,
    partition_col: str,
    ts_col: str,
    rows_per_chunk: int,
    tiebreak_col: str,
    with_crc: bool = False,
) -> DataFrame:
    """Chunked-export manifest: ORDER BY ts DESC within each partition
    value, bucket rows into chunks of N, report per-chunk bounds.

    Re-expresses cmd/backup.go:240-281 (per-partition `ORDER BY time
    DESC` + paginated chunks of ≤`--rows`, chunk min/max from page
    edge rows) — and fixes the reference's single-row-page bug where
    `from` stays zero (backup.go:271-281 branches are mutually
    exclusive; SURVEY.md §2 quirks).

    One shuffle (window on partition_col); chunk ids via
    floor((row_number()-1)/N); min/max/count per chunk. With
    with_crc=True, also crc32 over the newline-joined JSON rendering
    of the chunk (cmd/backup.go:308-309) — kept optional because the
    row-order-sensitive concat is inherently heavier than the bounds.
    """
    w = Window.partitionBy(partition_col).orderBy(F.desc(ts_col), F.desc(tiebreak_col))
    bucketed = df.withColumn(
        "chunk", F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(rows_per_chunk))
    )
    aggs = [
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"),
        F.count("*").alias("row_count"),
    ]
    if with_crc:
        line = F.to_json(F.struct(*[c for c in df.columns]))
        bucketed = bucketed.withColumn("__line", line).withColumn(
            "__rn", F.row_number().over(w)
        )
        aggs.append(
            F.crc32(
                F.concat_ws(
                    "\n", F.array_sort(F.collect_list(F.struct("__rn", "__line"))).getField("__line")
                ).cast("binary")
            ).alias("crc32")
        )
    return bucketed.groupBy(partition_col, "chunk").agg(*aggs)


@query(
    "q_chunk_bounds",
    oracle="""
    WITH numbered AS (
      SELECT event_type, ts, event_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_type,
           CAST(floor((rn - 1) / 100) AS BIGINT) AS chunk,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS min_ts_s,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS max_ts_s,
           COUNT(*) AS row_count
    FROM numbered
    GROUP BY event_type, floor((rn - 1) / 100)
    """,
)
def q_chunk_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship reference-shaped computation: per-partition DESC
    export chunks of ≤100 rows with min/max bounds per chunk."""
    ev = load_table(spark, sf_dir, "events")
    m = chunk_manifest(ev, "event_type", "ts", 100, "event_id")
    return m.select(
        "event_type",
        "chunk",
        ts_str("min_ts", "min_ts_s"),
        ts_str("max_ts", "max_ts_s"),
        "row_count",
    )
