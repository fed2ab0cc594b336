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

The stats pass is DISTRIBUTED: a `binaryFile` scan of the staging dir
(one Spark task per file — listing, CRC, bounds all executor-side,
the blob never reaches the driver). The rename is scheme-aware:

- local/file destinations: the rename runs inside the same
  mapInPandas task (mirroring the reference's worker-side uploads,
  backup.go:317-328: each goroutine PUTs its own object). Retry-safe:
  a re-executed task finds its source gone + target present and
  treats the move as done; a genuine key collision (two chunks, same
  partition/bounds/CRC) raises.
- any other scheme (s3a://, hdfs://, ...): executors must NOT touch
  the POSIX API (os.replace against an object-store URI would mislay
  files under a literal 's3a:/...' local directory), so the stat pass
  only emits (src, key) pairs and the move runs through the Hadoop
  FileSystem API — fs.rename is a metadata op on HDFS and the
  CopyObject/DeleteObject pair on S3A, the object-store variant of
  the same loop. The pair list is chunk-count-sized (key strings,
  like the reference's key log), never row data. NB rename-onto-
  existing-target is IMPLEMENTATION-DEFINED across FileSystems
  (HDFS returns false; RawLocalFileSystem clobbers, POSIX heritage —
  pinned by test_rawlocal_filesystem_rename_contract), so the claim
  loop never relies on rename-no-overwrite: the fs.exists(final)
  check BEFORE the rename is the only portable collision guard.

In both modes the final keys are WRITTEN as a parquet manifest under
<dest>/_keys by the executors and returned as a DataFrame — the key
list never collects to the driver.
"""

from __future__ import annotations

import gzip
import json
import os
import zlib
from datetime import datetime
from urllib.parse import urlsplit

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.pipeline.backup import MAX_ROWS_PER_CHUNK, TIME_FMT, BackupConfig, resolve_window

ISO_BASIC = "%Y%m%dT%H%M%SZ"

KEYS_MANIFEST_DIR = "_keys"


def _local_path(uri: str) -> str:
    """file:/x or file:///x → /x; plain paths pass through."""
    if uri.startswith("file:"):
        path = uri[len("file:") :]
        while path.startswith("//"):
            path = path[1:]
        return path
    return uri


def _is_local_uri(uri: str) -> bool:
    return urlsplit(uri).scheme in ("", "file")


def _hadoop_fs(spark: SparkSession, uri: str):
    """(Path, FileSystem) for a URI through the JVM gateway — the
    scheme picks the implementation (LocalFileSystem, S3AFileSystem,
    DistributedFileSystem, ...)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(uri)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return path, fs


def _hadoop_delete(spark: SparkSession, uri: str) -> None:
    path, fs = _hadoop_fs(spark, uri)
    fs.delete(path, True)


def backup_reference_layout(
    spark: SparkSession,
    source: DataFrame,
    cfg: BackupConfig,
    database: str,
    table: str,
    use_filesystem_api: bool | None = None,
) -> DataFrame:
    """Run the export and lay the output out under the reference's
    exact key scheme. Writes the final keys as a parquet manifest at
    <dest>/_keys and returns them as a one-column DataFrame (`key`,
    ordered) — parameter-sized, but never collected here.

    use_filesystem_api: None → auto (Hadoop FileSystem API for any
    non-local dest scheme); True forces the FileSystem path even on
    file:// (the LocalFileSystem contract test uses this)."""
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

    # Distributed stats: binaryFile gives (path, content) one row per
    # staged object. The partition value comes from the '__part=' path
    # segment, percent-UNESCAPED (the writer escapes ' ', ':', '/',
    # '%', ... via ExternalCatalogUtils %XX codes — urllib.parse.
    # unquote is the exact inverse); path parsing rather than Spark's
    # partition-column inference so numeric-looking values ("00123")
    # aren't type-mangled.
    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.json.gz")
        .load(staging)
        .select("path", "content")
    )

    ts_col, dest = cfg.ts_col, cfg.dest
    fs_api = use_filesystem_api if use_filesystem_api is not None else not _is_local_uri(dest)

    def compute_key(path: str, content: bytes) -> str:
        """Reference key for one staged chunk: partition value from
        the path, bounds from the rows, CRC over the gzipped object
        (backup.go:308-313)."""
        from urllib.parse import unquote

        part_val = unquote(path.split("__part=")[1].split("/")[0])
        crc = zlib.crc32(content)
        min_ts = max_ts = None
        for line in gzip.decompress(content).decode("utf-8").splitlines():
            if not line.strip():
                continue
            ts = json.loads(line)[ts_col]
            min_ts = ts if min_ts is None or ts < min_ts else min_ts
            max_ts = ts if max_ts is None or ts > max_ts else max_ts
        lo = datetime.strptime(min_ts, TIME_FMT)
        hi = datetime.strptime(max_ts, TIME_FMT)
        return "/".join(
            (
                database,
                table,
                part_val,
                lo.strftime("%Y%m%d"),
                f"{lo.strftime(ISO_BASIC)}_{hi.strftime(ISO_BASIC)}_{crc:08x}.log.gz",
            )
        )

    keys_dir = os.path.join(dest, KEYS_MANIFEST_DIR)

    if not fs_api:
        # local FS: rename executor-side inside the stat task

        def stat_and_rename(batches):
            import pandas as pd

            for pdf in batches:
                keys_out = []
                for path, content in zip(pdf["path"], pdf["content"]):
                    content = bytes(content)
                    key = compute_key(_local_path(path).replace(os.sep, "/"), content)
                    src = _local_path(path)
                    final = os.path.join(dest, key)
                    os.makedirs(os.path.dirname(final), exist_ok=True)
                    try:
                        # atomic claim-and-move: hard-link the staged file
                        # to its final key (fails atomically if the key
                        # exists), then drop the staged name. Unlike an
                        # O_EXCL placeholder + replace, there is NO window
                        # in which another task can observe a half-claimed
                        # (empty) target and misread it as orphaned — the
                        # race a loaded full-suite run actually hit.
                        os.link(src, final)
                        os.unlink(src)
                    except FileExistsError:
                        if not os.path.exists(src):
                            pass  # task retry: move already happened — idempotent
                        elif os.path.samefile(src, final):
                            # prior attempt died between link and unlink —
                            # finish the move
                            os.unlink(src)
                        else:
                            raise FileExistsError(
                                f"reference-key collision: {key} already exists "
                                f"(two chunks with identical bounds+CRC)"
                            ) from None
                    keys_out.append(key)
                yield pd.DataFrame({"key": keys_out})

        # writing the manifest materializes the rename pass exactly once,
        # executor-side — no key ever reaches the driver
        listing.mapInPandas(stat_and_rename, "key string").write.mode("overwrite").parquet(keys_dir)
    else:
        # object store / HDFS: executors only stat; the move goes
        # through the Hadoop FileSystem API (rename == CopyObject+
        # DeleteObject on S3A). Pairs are chunk-count-sized strings.

        def stat_only(batches):
            import pandas as pd

            for pdf in batches:
                srcs, keys_out = [], []
                for path, content in zip(pdf["path"], pdf["content"]):
                    srcs.append(path)
                    keys_out.append(compute_key(path, bytes(content)))
                yield pd.DataFrame({"src": srcs, "key": keys_out})

        pairs_dir = os.path.join(dest, "_keys_pending")
        listing.mapInPandas(stat_only, "src string, key string").write.mode(
            "overwrite"
        ).parquet(pairs_dir)

        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        fs = jvm.org.apache.hadoop.fs.Path(dest).getFileSystem(hconf)
        pairs = spark.read.parquet(pairs_dir)
        # toLocalIterator: one partition of key strings in driver
        # memory at a time, not the whole listing
        for row in pairs.toLocalIterator():
            src = jvm.org.apache.hadoop.fs.Path(row["src"])
            final = jvm.org.apache.hadoop.fs.Path(dest + "/" + row["key"])
            if fs.exists(final):
                if fs.exists(src):
                    raise FileExistsError(
                        f"reference-key collision: {row['key']} already exists "
                        f"(two chunks with identical bounds+CRC)"
                    )
                continue  # rerun: move already happened — idempotent
            fs.mkdirs(final.getParent())
            if not fs.rename(src, final):
                raise IOError(f"FileSystem.rename failed: {row['src']} -> {row['key']}")
        pairs.select("key").write.mode("overwrite").parquet(keys_dir)
        _hadoop_delete(spark, pairs_dir)

    # drop the staging skeleton (empty dirs + _SUCCESS markers) via the
    # scheme's own FileSystem — works on file://, s3a://, hdfs://
    _hadoop_delete(spark, staging)
    return spark.read.parquet(keys_dir).orderBy("key")
