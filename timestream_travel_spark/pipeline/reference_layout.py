"""Byte-level key parity with the reference's S3 layout
(cmd/backup.go:311-313):

    <database>/<table>/<partitionValue>/<yyyyMMdd>/<minIso>_<maxIso>_<crc32hex>.log.gz

Spark names its output files itself, so exact keys need a post-write
pass. The trick that makes files == chunks: write partitioned by the
partition value ONLY (no date dirs), with the stream sorted ORDER BY
ts DESC inside each partition and maxRecordsPerFile=N — the writer
then cuts the sorted stream into successive ≤N-row files, which are
exactly the reference's result pages (backup.go:253-257). The rename
pass streams each file once to recover (min_ts, max_ts, crc32 of the
gzipped bytes — same checksum target as backup.go:308-309) and moves
it to its reference key.

Time formats: yyyyMMdd for the dir (Go layout '20060102',
backup.go:24), basic-ISO seconds for the bounds ('20060102T150405Z',
backup.go:26-27).

The stats+rename pass is DISTRIBUTED: a `binaryFile` scan of the
staging dir (one Spark task per file — listing, CRC, bounds all
executor-side, the blob never reaches the driver), then the rename
runs inside the same mapInPandas task, mirroring the reference's
worker-side uploads (backup.go:317-328: each goroutine PUTs its own
object). Only the final key strings are collected — parameter-sized,
like the reference's key log. Retry-safe: a re-executed task finds
its source gone + target present and treats the move as done; a
genuine key collision (two chunks, same partition/bounds/CRC) raises.
"""

from __future__ import annotations

import gzip
import json
import os
import zlib
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.pipeline.backup import MAX_ROWS_PER_CHUNK, TIME_FMT, BackupConfig, resolve_window

ISO_BASIC = "%Y%m%dT%H%M%SZ"


def _local_path(uri: str) -> str:
    """file:/x or file:///x → /x; plain paths pass through."""
    if uri.startswith("file:"):
        path = uri[len("file:") :]
        while path.startswith("//"):
            path = path[1:]
        return path
    return uri


def backup_reference_layout(
    spark: SparkSession, source: DataFrame, cfg: BackupConfig, database: str, table: str
) -> list[str]:
    """Run the export and lay the output out under the reference's
    exact key scheme. Returns the sorted list of final keys (relative
    to cfg.dest)."""
    from timestream_travel_spark.functions.faithful import faithful_projection
    from timestream_travel_spark.tables import ensure_timestamp, time_window_filter

    if not cfg.faithful:
        raise ValueError(
            "reference layout requires faithful mode (bounds are parsed "
            "from the reference's 'yyyy-MM-dd HH:mm:ss' renderings)"
        )
    rows = min(cfg.rows_per_chunk, MAX_ROWS_PER_CHUNK)
    t_from, t_to = resolve_window(cfg.time_from, cfg.time_to)
    windowed = ensure_timestamp(
        time_window_filter(source, cfg.ts_col, t_from.strftime(TIME_FMT), t_to.strftime(TIME_FMT)),
        cfg.ts_col,
    ).filter(F.col(cfg.partition_col).isNotNull())

    staging = os.path.join(cfg.dest, "_staging")
    out = faithful_projection(windowed) if cfg.faithful else windowed
    (
        out.withColumn("__part", F.col(cfg.partition_col))
        .repartition(F.col("__part"))
        .sortWithinPartitions(F.desc(cfg.ts_col))
        .write.mode("overwrite")
        .partitionBy("__part")
        .option("compression", "gzip")
        .option("maxRecordsPerFile", rows)
        .json(staging)
    )

    # Distributed stats+rename: binaryFile gives (path, content) one
    # row per staged object. The partition value comes from the
    # '__part=' path segment, percent-UNESCAPED (the writer escapes
    # ' ', ':', '/', '%', ... via ExternalCatalogUtils %XX codes —
    # urllib.parse.unquote is the exact inverse); path parsing rather
    # than Spark's partition-column inference so numeric-looking
    # values ("00123") aren't type-mangled.
    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.json.gz")
        .load(staging)
        .select("path", "content")
    )

    ts_col, dest = cfg.ts_col, cfg.dest

    def stat_and_rename(batches):
        from urllib.parse import unquote

        import pandas as pd

        for pdf in batches:
            keys_out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                part_val = unquote(_local_path(path).split("__part=")[1].split(os.sep)[0])
                crc = zlib.crc32(bytes(content))  # over the gzipped object, backup.go:308-309
                min_ts = max_ts = None
                for line in gzip.decompress(bytes(content)).decode("utf-8").splitlines():
                    if not line.strip():
                        continue
                    ts = json.loads(line)[ts_col]
                    min_ts = ts if min_ts is None or ts < min_ts else min_ts
                    max_ts = ts if max_ts is None or ts > max_ts else max_ts
                lo = datetime.strptime(min_ts, TIME_FMT)
                hi = datetime.strptime(max_ts, TIME_FMT)
                key = os.path.join(
                    database,
                    table,
                    part_val,
                    lo.strftime("%Y%m%d"),
                    f"{lo.strftime(ISO_BASIC)}_{hi.strftime(ISO_BASIC)}_{crc:08x}.log.gz",
                )
                src = _local_path(path)
                final = os.path.join(dest, key)
                os.makedirs(os.path.dirname(final), exist_ok=True)
                try:
                    # atomic claim: O_EXCL create, then replace — two
                    # concurrent tasks can't both win the same key
                    os.close(os.open(final, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
                except FileExistsError:
                    if not os.path.exists(src):
                        pass  # task retry: move already happened — idempotent
                    elif os.path.getsize(final) == 0:
                        # orphaned placeholder: a prior attempt died
                        # between claim and replace — finish the move
                        os.replace(src, final)
                    else:
                        raise FileExistsError(
                            f"reference-key collision: {key} already exists "
                            f"(two chunks with identical bounds+CRC)"
                        ) from None
                else:
                    os.replace(src, final)
                keys_out.append(key)
            yield pd.DataFrame({"key": keys_out})

    keys = [r["key"] for r in listing.mapInPandas(stat_and_rename, "key string").collect()]
    # drop the staging skeleton (empty dirs + _SUCCESS markers)
    for dirpath, dirs, files in os.walk(staging, topdown=False):
        for f in files:
            os.remove(os.path.join(dirpath, f))
        os.rmdir(dirpath)
    return sorted(keys)
