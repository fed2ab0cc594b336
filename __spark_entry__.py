"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship reference-shaped query on sf0.001.
queries()      — named-query registry (SURVEY.md §2 Part B surface).
oracle_sql()   — DuckDB oracle SQL for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timestream_travel_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the backup-export
    chunk manifest over events (SURVEY.md §7 minimum slice)."""
    from timestream_travel_spark.registry import QUERIES

    return QUERIES["q_backup_manifest"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
