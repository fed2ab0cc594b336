"""The backup/export pipeline — the reference's single command
(`timestream-travel backup`, main.go:30-32, cmd/backup.go), rebuilt
as one lazy Spark plan instead of a driver-side page loop.

Reference behaviors covered (SURVEY.md §2 Part A):
- A2/A3  absolute/relative time window + validation (backup.go:128-168)
- A6     time-range filter (backup.go:171, 241)
- A7/A8  partition discovery, NULL-skipped (backup.go:170-209)
- A10    rows-per-chunk clamp to 1000 (backup.go:213-217)
- A11    per-partition parallelism — Spark tasks, not goroutines
- A14    per-partition ORDER BY time DESC (backup.go:241)
- A15    chunking ≤ rows per output object (backup.go:253-257)
- A17    chunk min/max time bounds (backup.go:266-281)
- A21/A22 faithful NULL→"NULL" stringly JSON rows (helpers.go:5-10)
- A23    gzip NDJSON objects (backup.go:263-297)
- A24    CRC32 checksums, manifest-side (backup.go:308-313)
- A25    hierarchical layout <partition>/<yyyyMMdd>/ (backup.go:311-313)
- A27    per-partition row counts (backup.go:299-301, 352)
- A28    dry-run mode (backup.go:102-105, 303-306)

Scale: the write is a single shuffle (repartition on the layout keys)
followed by a partitioned, chunked write — file count = O(partitions
× dates × chunks), each file ≤ rows_per_chunk rows. No driver-side
iteration; 1000 executors write 1000 files at a time.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.functions.faithful import faithful_projection
from timestream_travel_spark.operators.timeseries import chunk_manifest

MAX_ROWS_PER_CHUNK = 1000  # hard clamp, cmd/backup.go:213-217
# go-str2duration grammar (cmd/backup.go:20,134,148): a sequence of
# <number><unit> terms, units w/d/h/m/s/ms/us/ns, e.g. "1h30m", "1d12h",
# "90s". Multi-char units must precede their single-char prefixes.
_REL_TERM = re.compile(r"(\d+)(ms|us|µs|ns|[wdhms])")
_REL_RE = re.compile(r"^(?:\d+(?:ms|us|µs|ns|[wdhms]))+$")
_UNITS = {
    "w": "weeks",
    "d": "days",
    "h": "hours",
    "m": "minutes",
    "s": "seconds",
    "ms": "milliseconds",
    "us": "microseconds",
    "µs": "microseconds",
    "ns": None,  # sub-microsecond: floors to 0 in timedelta terms
}
TIME_FMT = "%Y-%m-%d %H:%M:%S"  # Go layout 2006-01-02 15:04:05, backup.go:25


def parse_duration(spec: str) -> timedelta:
    """Parse a go-str2duration-style compound duration ("1h30m",
    "1d12h", "90s") into a timedelta. Raises ValueError on anything
    else (empty string, unknown unit, trailing garbage)."""
    if not _REL_RE.match(spec):
        raise ValueError(f"unparseable duration: {spec!r}")
    total = timedelta()
    for m in _REL_TERM.finditer(spec):
        unit = _UNITS[m.group(2)]
        if unit is None:  # ns — floor like timedelta would
            total += timedelta(microseconds=int(m.group(1)) // 1000)
        else:
            total += timedelta(**{unit: int(m.group(1))})
    return total


def resolve_window(
    from_spec: str | None,
    to_spec: str | None,
    now: datetime | None = None,
) -> tuple[datetime, datetime]:
    """Absolute/relative time-window resolution (backup.go:128-156):
    each bound parses as 'yyyy-MM-dd HH:mm:ss', else as a relative
    go-str2duration compound ('90s', '1h30m', '1d12h'); `to` is
    relative to now, `from` relative to `to`. Defaults: to=now,
    from=to−1h (backup.go:139-153)."""
    now = now or datetime.utcnow()

    def parse(spec: str | None, anchor: datetime, default_delta: timedelta | None) -> datetime:
        if spec is None:
            return anchor - default_delta if default_delta else anchor
        try:
            return datetime.strptime(spec, TIME_FMT)
        except ValueError:
            try:
                delta = parse_duration(spec)
            except ValueError:
                raise ValueError(f"unparseable time spec: {spec!r}") from None
            return anchor - delta

    t_to = parse(to_spec, now, None)
    t_from = parse(from_spec, t_to, timedelta(hours=1))
    # interval validation, backup.go:160-168
    if t_from > t_to:
        raise ValueError(f"from ({t_from}) is after to ({t_to})")
    if t_from == t_to:
        raise ValueError(f"from equals to ({t_from})")
    return t_from, t_to


@dataclass
class BackupConfig:
    """The reference's flag surface (cmd/backup.go:34-93) minus AWS
    plumbing: dest path instead of an S3 bucket (s3a:// URIs work
    unchanged through Hadoop S3A)."""

    dest: str
    partition_col: str = "event_type"  # default measure_name, backup.go:59-64
    ts_col: str = "ts"
    time_from: str | None = None
    time_to: str | None = None
    rows_per_chunk: int = 1000
    faithful: bool = True
    dry_run: bool = False
    tiebreak_col: str | None = None
    # "overwrite" for full exports; "append" lets incremental_backup
    # land strictly-newer rows into the SAME dest (rows are above the
    # epoch-us watermark, so append cannot duplicate; a failed
    # increment must be retried with the same watermark, not resumed)
    write_mode: str = "overwrite"


def backup(
    spark: SparkSession,
    source: DataFrame,
    cfg: BackupConfig,
    observation: "Observation | None" = None,
) -> DataFrame:
    """Run the export; returns the manifest DataFrame
    (partition, date, chunk, min_ts, max_ts, max_ts_us, row_count, crc32).

    `observation`: pass a fresh pyspark.sql.Observation to receive
    write-side accounting (rows_written, partitions_written) that
    piggybacks on the write job — read `observation.get` after this
    returns. One Observation instance per backup() call (Spark
    Observations are single-use). Ignored in dry-run mode.

    In dry-run mode (backup.go:102-105) the plan runs — discovery,
    decode, counting — but nothing is written."""
    from timestream_travel_spark.tables import ensure_timestamp, time_window_filter

    rows = min(cfg.rows_per_chunk, MAX_ROWS_PER_CHUNK)
    t_from, t_to = resolve_window(cfg.time_from, cfg.time_to)

    # window-filter BEFORE the ns→us conversion so the range predicate
    # pushes to the parquet scan (tables.time_window_filter)
    windowed = ensure_timestamp(
        time_window_filter(source, cfg.ts_col, t_from.strftime(TIME_FMT), t_to.strftime(TIME_FMT)),
        cfg.ts_col,
    ).filter(F.col(cfg.partition_col).isNotNull())

    tiebreak = cfg.tiebreak_col or source.columns[0]

    # Manifest (it also drives the dry-run row counts). CRC32 is
    # computed over the chunk's newline-joined JSON rendering — the
    # moral equivalent of the reference's gzip-buffer CRC
    # (backup.go:308-309), stable across file-layout details.
    manifest = (
        chunk_manifest(windowed, cfg.partition_col, cfg.ts_col, rows, tiebreak, with_crc=True)
        .withColumnRenamed(cfg.partition_col, "partition")
        .select(
            "partition",
            # the reference keys a chunk under its min-time's yyyyMMdd
            # (backup.go:311-313, chunk.From)
            F.date_format("min_ts", "yyyyMMdd").alias("date"),
            "chunk",
            F.date_format("min_ts", "yyyy-MM-dd HH:mm:ss").alias("min_ts"),
            F.date_format("max_ts", "yyyy-MM-dd HH:mm:ss").alias("max_ts"),
            # full-precision watermark for incremental_backup: the
            # second-rendered max_ts above re-exports every row in the
            # final second of the previous run (boundary-second dup)
            F.unix_micros(F.col("max_ts")).alias("max_ts_us"),
            "row_count",
            "crc32",
        )
    )

    if not cfg.dry_run:
        out = faithful_projection(windowed) if cfg.faithful else windowed
        # to_timestamp is a no-op on typed ts and re-parses faithful's
        # string rendering, so one expression covers both modes.
        out = out.withColumn("__part", F.col(cfg.partition_col)).withColumn(
            "__date", F.date_format(F.to_timestamp(F.col(cfg.ts_col)), "yyyyMMdd")
        )
        if observation is not None:
            # Observation: write-side accounting (rows/partitions
            # actually written) piggybacks on the write job — ZERO
            # extra scan, the metrics ride the task results (cf. the
            # reference's end-of-run per-partition counters,
            # cmd/backup.go:299-301, which cost it nothing because the
            # driver loop already had the rows). The caller owns the
            # Observation and reads .get after we return.
            out = out.observe(
                observation,
                F.count(F.lit(1)).alias("rows_written"),
                # DISTINCT aggregates are disallowed in observed
                # metrics; the HLL++ sketch is exact only while in
                # sparse mode, which covers realistic partition-value
                # cardinalities (thousands) but is approximate beyond
                F.approx_count_distinct("__part").alias("partitions_written"),
            )
        (
            out.repartition(F.col("__part"), F.col("__date"))
            .sortWithinPartitions(F.desc(cfg.ts_col))
            .write.mode(cfg.write_mode)
            .partitionBy("__part", "__date")
            .option("compression", "gzip")
            .option("maxRecordsPerFile", rows)
            .json(cfg.dest)
        )
    return manifest
