"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[$SPARK_GRAFT_CPUS]; the same settings
(AQE, partition coalescing, skew-join handling, Arrow) are the ones
you want on a 1000-executor cluster — only shuffle partition counts
and memory sizing change with the deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "timestream-travel-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    - UTC session timezone: deterministic date_format/date_trunc
      output regardless of host TZ (also matches the DuckDB oracle,
      which operates on naive timestamps).
    - AQE on: runtime coalescing, skew-join splitting, and
      sort-merge→broadcast demotion — the knobs that matter at 100 TB.
    - Arrow on: vectorized pandas_udf / toPandas transfer.
    """
    cpus = cpus if cpus is not None else os.environ.get("SPARK_GRAFT_CPUS", "*")
    nshuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # INT64-micros timestamps (not legacy INT96): INT96 carries
        # NO parquet min/max statistics, which blinds both row-group
        # pushdown and the file-stats manifest (pipeline/skipping) on
        # every instant-typed ts column — at 100 TB that is the
        # difference between pruning on time (the dominant predicate)
        # and full scans. Micros also round-trips the fixtures'
        # timestamp[us] exactly.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # Single mid-size parquet files must still fan out across
        # cores: with the default 4 MiB open-cost a 20 MB file scans
        # as ~3 tasks on 32 cores. 512 KiB open-cost lets split size
        # follow totalBytes/defaultParallelism down to row-group
        # granularity. maxPartitionBytes stays 128 MiB — the right
        # split at 100 TB; this knob only affects the small-file tail.
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
