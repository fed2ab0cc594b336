"""Fixture catalog: schema-on-read parquet loading.

Mirrors the reference's dynamic-schema model (helpers/helpers.go:43-46:
column names/types discovered per query, never declared): we never
hard-code schemas — `spark.read.parquet` infers them from footers,
and Catalyst prunes columns/pushes filters into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def ensure_timestamp(df: DataFrame, ts_col: str) -> DataFrame:
    """Normalize a TIMESTAMP(NANOS) column read as long (under
    spark.sql.legacy.parquet.nanosAsLong) to TimestampType: truncate
    ns→us exactly like DuckDB's TIMESTAMP_NS→TIMESTAMP cast. Integer
    `div` — double math would lose precision at 1.7e18."""
    if dict(df.dtypes).get(ts_col) == "bigint":
        df = df.withColumn(ts_col, F.expr(f"timestamp_micros({ts_col} div 1000)"))
    return df


def time_window_filter(df: DataFrame, ts_col: str, lo: str, hi: str) -> DataFrame:
    """Time-range predicate that reaches the parquet scan even when
    ts_col is raw TIMESTAMP(NANOS) int64.

    The ns→us conversion (`timestamp_micros(ts div 1000)`) is opaque
    to pushdown, so `converted_ts BETWEEN lo AND hi` scans everything.
    The conversion is monotonic, so the exact raw-ns equivalent is
    ns ∈ [lo_us·1000, hi_us·1000 + 999] — pushable int64 bounds that
    let parquet row-group stats skip data. Bounds are second-precision
    timestamps interpreted as UTC (the engine session timezone)."""
    from datetime import datetime, timezone

    if dict(df.dtypes).get(ts_col) == "bigint":
        fmt = "%Y-%m-%d %H:%M:%S"
        lo_us = int(datetime.strptime(lo, fmt).replace(tzinfo=timezone.utc).timestamp()) * 1_000_000
        hi_us = int(datetime.strptime(hi, fmt).replace(tzinfo=timezone.utc).timestamp()) * 1_000_000
        return df.filter(F.col(ts_col).between(lo_us * 1000, hi_us * 1000 + 999))
    return df.filter(
        F.col(ts_col).between(F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp"))
    )


def load_events_window(spark: SparkSession, sf_dir: str, lo: str, hi: str) -> DataFrame:
    """events scan with the time window pushed to the raw column,
    then normalized to TimestampType."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ensure_timestamp(time_window_filter(raw, "ts", lo, hi), "ts")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS); a vanilla session
        # (e.g. the driver's) can't scan it without this runtime conf.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = ensure_timestamp(df, "ts")
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load fixture tables lazily; optionally register temp views so
    the same names resolve in spark.sql() as in the DuckDB oracle."""
    out: dict[str, DataFrame] = {}
    for name in names or TABLES:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
