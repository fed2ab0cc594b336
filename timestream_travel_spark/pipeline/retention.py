"""Retention / data-lifecycle enforcement (round-5 wave 10) — the
engine's answer to Amazon Timestream's memory/magnetic-store
retention periods: partitions of the date-partitioned backup sink
older than the retention window are dropped as WHOLE directories.

Deletion is partition-metadata work, never row work: the sink is
partitioned by `__date` (pipeline/backup.py), so expiry = listing
the date directories (one FileSystem call, scheme-aware — works on
file://, s3a://, hdfs:// like reference_layout's rename pass) and
deleting the expired ones. No file is ever read; cost is
O(#partitions), not O(rows) — the only shape that works at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def list_date_partitions(spark: SparkSession, dest: str) -> dict[str, list[str]]:
    """{yyyyMMdd: [partition-dir paths]} across all __part dirs."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(dest)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    out: dict[str, list[str]] = {}
    if not fs.exists(root):
        return out
    for part in fs.listStatus(root):
        if not part.isDirectory() or not part.getPath().getName().startswith("__part="):
            continue
        for date_dir in fs.listStatus(part.getPath()):
            name = date_dir.getPath().getName()
            if date_dir.isDirectory() and name.startswith("__date="):
                out.setdefault(name.split("=", 1)[1], []).append(
                    date_dir.getPath().toString()
                )
    return out


def enforce_retention(
    spark: SparkSession, dest: str, keep_from_date: str, dry_run: bool = False
) -> dict[str, int]:
    """Drop every __date partition strictly before `keep_from_date`
    (yyyyMMdd). Returns {date: n_dirs_deleted}. `dry_run` reports
    what would be deleted without touching the store (the reference
    CLI's --dry-run contract, cmd/backup.go:102-105)."""
    if not (len(keep_from_date) == 8 and keep_from_date.isdigit()):
        raise ValueError(f"keep_from_date must be yyyyMMdd, got {keep_from_date!r}")
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(dest).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    deleted: dict[str, int] = {}
    for date, dirs in sorted(list_date_partitions(spark, dest).items()):
        if date >= keep_from_date:
            continue
        for d in dirs:
            if not dry_run:
                fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)
            deleted[date] = deleted.get(date, 0) + 1
    return deleted
