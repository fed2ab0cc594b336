"""Small-file compaction — the operational follow-up every chunked
exporter needs at scale.

The reference writes one object per ≤1000-row page (cmd/backup.go:
253-297); at 100 TB that's tens of millions of small objects, which
breaks both S3 listing and downstream scan planning. compact()
rewrites a directory of small files into size-targeted files,
preserving content and (optionally) the partition layout.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_mb: int = 128,
    partition_by: list[str] | None = None,
) -> dict[str, int]:
    """Rewrite src parquet into ~target_file_mb files at dest.

    File count derives from actual input bytes (not row counts —
    row width varies); AQE coalescing handles the remainder skew.
    Returns {'rows': n, 'files_before': a, 'files_after': b}."""
    df = spark.read.parquet(src)
    # input bytes from the filesystem metadata — no data scan. The
    # inputFiles() listing is driver-side; fine for a maintenance job
    # (a 100 TB dir at 128 MB/file lists ~1M strings).
    sc = spark.sparkContext
    hconf = sc._jsc.hadoopConfiguration()
    jvm_path = sc._jvm.org.apache.hadoop.fs.Path
    files = df.inputFiles()
    total_bytes = 0
    for f in files:
        p = jvm_path(f)
        total_bytes += p.getFileSystem(hconf).getFileStatus(p).getLen()
    n_files = int(max(1, total_bytes // (target_file_mb * 1024 * 1024)))
    files_before = len(files)
    writer = df.repartition(n_files)
    w = writer.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(dest)
    out = spark.read.parquet(dest)
    return {
        "rows": out.count(),
        "files_before": files_before,
        "files_after": len(out.inputFiles()),
    }
