"""Registry entries for the backup pipeline (SURVEY.md §7 flagship).

q_backup_manifest is the flagship query: the full reference-shaped
computation — time-window filter → partition discovery → per-partition
DESC ordering → chunk bucketing → per-chunk bounds + counts
(cmd/backup.go:128-281) — as one Catalyst plan. The CRC column is
exercised in pytest (DuckDB has no crc32), so the oracle covers the
bounds/count part.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.timeseries import chunk_manifest
from timestream_travel_spark.ops import ts_str
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_events_window

WINDOW_FROM = "2024-01-03 00:00:00"
WINDOW_TO = "2024-01-28 00:00:00"
ROWS_PER_CHUNK = 250


@query(
    "q_backup_manifest",
    oracle=f"""
    WITH windowed AS (
      SELECT * FROM events
      WHERE ts >= TIMESTAMP '{WINDOW_FROM}' AND ts <= TIMESTAMP '{WINDOW_TO}'
        AND event_type IS NOT NULL
    ), numbered AS (
      SELECT event_type, ts,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM windowed
    )
    SELECT event_type AS partition,
           CAST(floor((rn - 1) / {ROWS_PER_CHUNK}) AS BIGINT) AS chunk,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS max_ts,
           COUNT(*) AS row_count
    FROM numbered
    GROUP BY event_type, floor((rn - 1) / {ROWS_PER_CHUNK})
    """,
)
def q_backup_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: export-chunk manifest for a time-windowed backup of
    `events`, partitioned by event_type, ≤250 rows per chunk."""
    windowed = load_events_window(spark, sf_dir, WINDOW_FROM, WINDOW_TO).filter(
        F.col("event_type").isNotNull()
    )
    m = chunk_manifest(windowed, "event_type", "ts", ROWS_PER_CHUNK, "event_id")
    return m.select(
        F.col("event_type").alias("partition"),
        "chunk",
        ts_str("min_ts", "min_ts"),
        ts_str("max_ts", "max_ts"),
        "row_count",
    )
