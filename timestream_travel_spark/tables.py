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
