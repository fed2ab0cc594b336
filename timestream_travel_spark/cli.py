"""CLI parity with the reference's single `backup` command
(main.go:13-35, cmd/backup.go:34-93).

Flag mapping (reference flag → ours):
  --region        (AWS plumbing; not applicable — Spark cluster conf)
  --database/--table (backup.go:41-52) → --source parquet path/URI
  --s3-bucket     (backup.go:53-58)    → --dest path/URI (s3a:// works)
  --column        (backup.go:59-64)    → --partition-col
  --from/--to     (backup.go:65-76)    → --from/--to (same formats:
                    absolute 'yyyy-MM-dd HH:mm:ss' or relative 1m/1h/1d/1w)
  --rows          (backup.go:77-81)    → --rows (clamped to 1000)
  --dry-run       (backup.go:82-86)    → --dry-run
  --verbose       (backup.go:87-92)    → --verbose

Usage:
  python -m timestream_travel_spark backup \
      --source /data/events.parquet --dest /backups/events \
      --partition-col event_type --ts-col ts --from 1d --rows 500

S3 contract (A26, cmd/backup.go:317-328): --dest/--source accept any
Hadoop-FS URI. For s3a:// the cluster must carry hadoop-aws +
aws-java-sdk on the classpath and the standard S3A conf, e.g.:

  spark.hadoop.fs.s3a.access.key / .secret.key   (or an IAM role /
  spark.hadoop.fs.s3a.aws.credentials.provider)
  spark.hadoop.fs.s3a.endpoint                   (non-AWS stores)
  spark.hadoop.fs.s3a.path.style.access=true     (MinIO et al.)

All writes go through the Hadoop committer — no code path is
local-FS-specific: reference_layout's rename pass is scheme-aware
(executor-side os.replace for file:// destinations; the Hadoop
FileSystem API — fs.rename == CopyObject+DeleteObject on S3A — for
any other scheme). This sandbox has no S3 endpoint, so the FileSystem
branch is contract-tested against LocalFileSystem, which exercises
the identical fs.exists/fs.mkdirs/fs.rename call sequence.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="timestream-travel-spark")
    sub = p.add_subparsers(dest="command", required=True)
    b = sub.add_parser("backup", help="export a time-series table to gzip NDJSON chunks")
    b.add_argument("--source", required=True, help="input parquet path/URI (the database.table)")
    b.add_argument("--dest", required=True, help="output path/URI (the S3 bucket)")
    b.add_argument("--partition-col", default="event_type", help="column to partition the export by")
    b.add_argument("--ts-col", default="ts", help="time column")
    b.add_argument("--from", dest="time_from", default=None, help="window start (absolute or 1m/1h/1d/1w)")
    b.add_argument("--to", dest="time_to", default=None, help="window end (absolute or relative)")
    b.add_argument("--rows", type=int, default=1000, help="max rows per output chunk (clamped to 1000)")
    b.add_argument("--tiebreak-col", default=None, help="deterministic secondary sort column")
    b.add_argument("--typed", action="store_true", help="native JSON types instead of faithful strings")
    b.add_argument(
        "--chain",
        action="store_true",
        help="generation-tagged incremental chain: export only rows past the "
        "chain watermark, record the manifest under _manifest/gen=N",
    )
    b.add_argument("--dry-run", action="store_true", help="run queries + counts, skip the write")
    b.add_argument("--verbose", action="store_true")
    v = sub.add_parser("verify", help="reconcile a backup against its stored manifest")
    v.add_argument("--dest", required=True, help="backup output path (must contain _manifest/)")
    v.add_argument(
        "--layout",
        action="store_true",
        help="reference-layout mode: recompute per-chunk CRC32 and check it "
        "against the crc embedded in each object key",
    )
    v.add_argument("--verbose", action="store_true")
    r = sub.add_parser("restore", help="rehydrate a gzip-NDJSON backup into parquet")
    r.add_argument("--backup", required=True, help="backup output path (the backup --dest)")
    r.add_argument("--dest", required=True, help="parquet output directory")
    r.add_argument("--schema", default=None, help="DDL schema to cast faithful strings back to types")
    r.add_argument("--dedup-key", default=None, help="drop duplicate rows by this key (keep max ts)")
    r.add_argument("--as-of", default=None, help="point-in-time restore: only rows with ts <= 'yyyy-MM-dd HH:mm:ss' (partition-pruned read)")
    r.add_argument(
        "--generation",
        type=int,
        default=None,
        help="time travel by backup generation: rebuild the table as the "
        "chain knew it after _manifest/gen=N (chains built with backup --chain)",
    )
    r.add_argument("--verbose", action="store_true")
    c = sub.add_parser("compact", help="rewrite fragmented parquet into size-targeted files")
    c.add_argument("--src", required=True, help="fragmented parquet directory")
    c.add_argument("--dest", required=True, help="compacted output directory")
    c.add_argument("--target-mb", type=int, default=128, help="target file size in MiB")
    c.add_argument("--partition-by", default=None, help="comma-separated partition columns")
    c.add_argument("--verbose", action="store_true")
    z = sub.add_parser(
        "zorder",
        help="rewrite parquet along a 2-dim Morton curve for multi-dim data skipping",
    )
    z.add_argument("--src", required=True, help="source parquet directory")
    z.add_argument("--dest", required=True, help="z-ordered output directory")
    z.add_argument("--cols", required=True, help="two comma-separated layout columns, e.g. user_id,ts")
    z.add_argument("--rows-per-file", type=int, default=100_000, help="rows per output file")
    z.add_argument("--verbose", action="store_true")
    ru = sub.add_parser(
        "rollup", help="materialize or refresh the hourly scheduled-rollup table"
    )
    ru.add_argument("--source", required=True, help="events parquet path or table dir")
    ru.add_argument("--dest", required=True, help="rollup table destination")
    ru.add_argument(
        "--repair",
        action="store_true",
        help="detect hour partitions drifted by out-of-order ingest and "
        "rebuild exactly those (use after a late-arrival audit fires)",
    )
    ru.add_argument(
        "--refresh",
        action="store_true",
        help="incremental refresh from the stored high-water mark (default: full build)",
    )
    ru.add_argument("--verbose", action="store_true")

    rt = sub.add_parser(
        "retention", help="drop backup __date partitions older than the retention window"
    )
    rt.add_argument("--dest", required=True, help="backup destination to expire")
    rt.add_argument(
        "--keep-from", required=True, help="first yyyyMMdd date to KEEP (older dates drop)"
    )
    rt.add_argument("--dry-run", action="store_true", help="report only, delete nothing")
    rt.add_argument("--verbose", action="store_true")

    la = sub.add_parser(
        "late-audit",
        help="route out-of-order ingest to a quarantine, report stragglers, or tune grace",
    )
    la.add_argument(
        "action",
        choices=["route", "report", "suggest-grace"],
        help="route: drain --source into --dest with late rows quarantined; "
        "report: per-hour straggler counts (feed `rollup --repair`); "
        "suggest-grace: grace interval from the observed lateness quantile",
    )
    la.add_argument("--source", default=None, help="parquet path/glob to ingest as a stream (route)")
    la.add_argument("--dest", default=None, help="main store for on-time rows (route)")
    la.add_argument("--quarantine", required=True, help="dead-letter store for late rows")
    la.add_argument("--hwm", default=None, help="high-water-mark store (route; default <quarantine>_hwm)")
    la.add_argument("--checkpoint", default=None, help="stream checkpoint (route; default <dest>_ckpt)")
    la.add_argument("--grace", default="INTERVAL 0 SECONDS", help="lateness tolerated as on-time (route)")
    la.add_argument(
        "--files-per-batch",
        type=int,
        default=0,
        help="maxFilesPerTrigger for the drain (0 = one batch for the whole backlog)",
    )
    la.add_argument("--quantile", type=float, default=0.99, help="lateness quantile (suggest-grace)")
    la.add_argument("--verbose", action="store_true")

    ix = sub.add_parser(
        "index",
        help="build or query a persisted similarity/dedup index "
        "(minhash signatures, PQ codes, cell-partitioned IVFADC)",
    )
    ix.add_argument(
        "action",
        choices=["build", "query"],
        help="build: materialize the index from --data; "
        "query: run the from-index search (candidates / top-k)",
    )
    ix.add_argument(
        "--kind", required=True, choices=["minhash", "pq", "ivfpq"],
        help="minhash: dedup signature table (documents); "
        "pq / ivfpq: ANN code tables (embeddings)",
    )
    ix.add_argument("--data", required=True, help="directory holding the parquet tables")
    ix.add_argument("--index", required=True, help="index directory (build target / query source)")
    ix.add_argument("--limit", type=int, default=20, help="rows to show on query (0 = just the count)")
    ix.add_argument("--verbose", action="store_true")

    mf = sub.add_parser(
        "manifest",
        help="file-stats manifest for a parquet table dir: build/"
        "update it from footers, prune a scan with it, or audit it",
    )
    mf.add_argument(
        "action",
        choices=["build", "update", "prune", "verify"],
        help="build: full footer pass; update: incremental (new files "
        "appended, deleted files dropped); prune: list surviving files "
        "for --where; verify: recompute stats from data and diff",
    )
    mf.add_argument("--table", required=True, help="parquet table directory")
    mf.add_argument(
        "--cols", default=None,
        help="comma-separated stat columns (build/update/verify)",
    )
    mf.add_argument(
        "--where", action="append", default=[],
        help="prune conjunct as col:op:value (op in <,<=,>,>=,=; "
        "repeatable; value parsed as number else kept as string)",
    )
    mf.add_argument(
        "--distributed", action="store_true",
        help="build via binaryFile listing + executor-side footer "
        "reads (the 100k+-file path; default is the driver loop)",
    )
    mf.add_argument("--verbose", action="store_true")

    q = sub.add_parser("query", help="run a named engine query against a table directory")
    q.add_argument("name", nargs="?", default=None, help="registry query name (omit to list all)")
    q.add_argument("--data", default=None, help="directory holding the parquet tables")
    q.add_argument("--limit", type=int, default=20, help="rows to show (0 = just the count)")
    q.add_argument("--dest", default=None, help="also write the full result to this parquet path")
    q.add_argument("--explain", action="store_true", help="print the formatted physical plan instead of rows")
    q.add_argument("--verbose", action="store_true")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
    )
    log = logging.getLogger("backup")

    from timestream_travel_spark.pipeline.backup import BackupConfig, backup
    from timestream_travel_spark.session import get_spark

    if args.command == "verify":
        from timestream_travel_spark.pipeline.restore import verify_backup, verify_reference_layout

        spark = get_spark("timestream-travel-verify")
        if args.layout:
            # chunk-level CRC contract (cmd/backup.go:308-313); one
            # distributed scan — the report is chunk-count-sized, so
            # collect once instead of re-CRCing the tree per action
            rows = verify_reference_layout(spark, args.dest).collect()
            bad = [r for r in rows if r["status"] != "ok"]
            n = len(rows)
            for r in bad:
                log.error(
                    "key=%s stored=%s actual=%s status=%s",
                    r["key"], r["stored_crc"], r["actual_crc"], r["status"],
                )
            if bad:
                log.error("CRC verification FAILED for %d of %d chunk(s)", len(bad), n)
                return 1
            log.info("CRC verification OK (%d chunks)", n)
            return 0
        manifest = spark.read.parquet(f"{args.dest}/_manifest")
        report = verify_backup(spark, args.dest, manifest).collect()
        bad = [r for r in report if r["status"] != "ok"]
        for r in report:
            log.info(
                "partition=%s expected=%s found=%s status=%s",
                r["partition"], r["expected_rows"], r["found_rows"], r["status"],
            )
        if bad:
            log.error("verification FAILED for %d partition(s)", len(bad))
            return 1
        log.info("verification OK (%d partitions)", len(report))
        return 0

    if args.command == "restore":
        from timestream_travel_spark.pipeline.restore import restore_as_of, restore_backup

        spark = get_spark("timestream-travel-restore")
        if args.generation is not None:
            from timestream_travel_spark.pipeline.generations import restore_generation

            try:
                stats = restore_generation(
                    spark, args.backup, args.dest, args.generation, schema=args.schema
                )
            except ValueError as e:
                log.error("%s", e)
                return 2
            log.info(
                "restored %d rows as of generation %d -> %s",
                stats["rows_out"],
                stats["generation"],
                args.dest,
            )
            return 0
        if args.as_of:
            stats = restore_as_of(
                spark, args.backup, args.dest, args.as_of, schema=args.schema
            )
            log.info("restored %d rows as of %s -> %s", stats["rows_out"], args.as_of, args.dest)
            return 0
        stats = restore_backup(
            spark, args.backup, args.dest, schema=args.schema, dedup_key=args.dedup_key
        )
        log.info("restored %d rows (%d read) -> %s", stats["rows_out"], stats["rows_in"], args.dest)
        return 0

    if args.command == "rollup":
        from timestream_travel_spark.pipeline.rollup import (
            build_rollup,
            refresh_rollup,
            repair_rollup,
        )
        from timestream_travel_spark.tables import ensure_timestamp

        spark = get_spark("timestream-travel-rollup")
        events = ensure_timestamp(spark.read.parquet(args.source), "ts")
        if args.repair:
            hours = repair_rollup(spark, events, args.dest)
            log.info(
                "repaired %d drifted hour partition(s) -> %s%s",
                len(hours),
                args.dest,
                f" ({hours[0]} .. {hours[-1]})" if hours else "",
            )
        elif args.refresh:
            n = refresh_rollup(spark, events, args.dest)
            log.info("refreshed %d hour partition(s) -> %s", n, args.dest)
        else:
            build_rollup(spark, events, args.dest)
            log.info("built rollup -> %s", args.dest)
        return 0

    if args.command == "retention":
        from timestream_travel_spark.pipeline.retention import enforce_retention

        spark = get_spark("timestream-travel-retention")
        dropped = enforce_retention(
            spark, args.dest, args.keep_from, dry_run=args.dry_run
        )
        verb = "would drop" if args.dry_run else "dropped"
        for date, n in sorted(dropped.items()):
            log.info("%s %d partition dir(s) for __date=%s", verb, n, date)
        log.info("%s %d expired date(s) before %s", verb, len(dropped), args.keep_from)
        return 0

    if args.command == "late-audit":
        from pyspark.errors import AnalysisException

        from timestream_travel_spark.streaming.late_audit import (
            late_hours,
            route_late_arrivals,
            suggest_grace,
        )

        spark = get_spark("timestream-travel-late-audit")

        if args.action == "route":
            if not args.source or not args.dest:
                log.error("route needs --source and --dest")
                return 2
            schema = spark.read.parquet(args.source).schema
            reader = spark.readStream.schema(schema)
            if args.files_per_batch:
                reader = reader.option("maxFilesPerTrigger", args.files_per_batch)
            stream = reader.parquet(args.source)
            hwm = args.hwm or args.quarantine.rstrip("/") + "_hwm"
            ckpt = args.checkpoint or args.dest.rstrip("/") + "_ckpt"
            route_late_arrivals(
                stream, args.dest, args.quarantine, hwm, ckpt, grace=args.grace
            ).awaitTermination()
            hours = late_hours(spark, args.quarantine)
            n_late = 0
            try:
                n_late = spark.read.parquet(args.quarantine).count()
            except AnalysisException:
                pass
            log.info(
                "routed: %d on-time row(s) -> %s, %d late row(s) over %d hour(s) -> %s",
                spark.read.parquet(args.dest).count(),
                args.dest,
                n_late,
                len(hours),
                args.quarantine,
            )
            return 0

        if args.action == "report":
            try:
                qdf = spark.read.parquet(args.quarantine)
            except AnalysisException:
                log.info("no quarantine at %s (nothing was late)", args.quarantine)
                return 0
            from pyspark.sql import functions as F

            rows = (
                qdf.groupBy("__hour")
                .agg(
                    F.count("*").alias("n"),
                    F.max(
                        F.unix_timestamp(F.col("observed_hwm").cast("timestamp"))
                        - F.unix_timestamp(F.col("__hour").cast("timestamp"))
                    ).alias("max_lag_s"),
                )
                .orderBy("__hour")
                .collect()
            )
            for r in rows:
                log.info(
                    "hour=%s stragglers=%d max_lag=%ds",
                    r["__hour"], r["n"], r["max_lag_s"],
                )
            log.info(
                "%d drifted hour(s); rebuild them with: rollup --repair --source ... --dest ...",
                len(rows),
            )
            return 0

        g = suggest_grace(spark, args.quarantine, q=args.quantile)
        if g is None:
            log.info("no quarantined rows at %s — keep the current grace", args.quarantine)
        else:
            log.info("suggested grace (q=%.2f): %s", args.quantile, g)
        return 0

    if args.command == "index":
        from timestream_travel_spark.tables import load_table

        spark = get_spark("timestream-travel-index")
        if args.action == "build":
            if args.kind == "minhash":
                from timestream_travel_spark.operators.dedup import build_minhash_index

                build_minhash_index(
                    load_table(spark, args.data, "documents"), args.index
                )
            elif args.kind == "pq":
                from timestream_travel_spark.operators.similarity6 import build_pq_index

                build_pq_index(spark, args.data, args.index)
            else:
                from timestream_travel_spark.operators.similarity7 import (
                    build_ivfpq_index,
                )

                build_ivfpq_index(spark, args.data, args.index)
            log.info("built %s index -> %s", args.kind, args.index)
            return 0
        if args.kind == "minhash":
            from timestream_travel_spark.operators.dedup import (
                minhash_candidates_from_index,
            )

            df = minhash_candidates_from_index(spark, args.index)
        elif args.kind == "pq":
            from timestream_travel_spark.operators.similarity6 import (
                pq_topk_from_index,
            )

            df = pq_topk_from_index(spark, args.data, args.index)
        else:
            from timestream_travel_spark.operators.similarity7 import (
                ivfpq_topk_from_index,
            )

            df = ivfpq_topk_from_index(spark, args.data, args.index)
        n = df.count()
        if args.limit:
            df.show(args.limit, truncate=False)
        log.info("%s index query: %d rows", args.kind, n)
        return 0

    if args.command == "manifest":
        from timestream_travel_spark.pipeline import skipping

        spark = get_spark("timestream-travel-manifest")
        if args.action in ("build", "update", "verify") and not args.cols:
            log.error("--cols is required for %s", args.action)
            return 2
        cols = [c.strip() for c in args.cols.split(",")] if args.cols else []
        if args.action == "build":
            mpath = skipping.write_manifest(
                spark, args.table, cols, distributed=args.distributed
            )
            n = skipping.read_manifest(spark, args.table).count()
            log.info("manifest built: %d file(s) -> %s", n, mpath)
            return 0
        if args.action == "update":
            r = skipping.update_manifest(spark, args.table, cols)
            log.info(
                "manifest updated: +%d -%d = %d file(s)",
                r["added"], r["removed"], r["total"],
            )
            return 0
        if args.action == "verify":
            bad = skipping.verify_manifest(spark, args.table, cols).collect()
            for r in bad:
                log.error("%s: %s", r["issue"], r["file"])
            if bad:
                log.error("manifest verification FAILED for %d file(s)", len(bad))
                return 1
            log.info("manifest verification OK")
            return 0
        conj = []
        for w in args.where:
            col, op, raw = w.split(":", 2)
            try:
                val = float(raw) if "." in raw or "e" in raw.lower() else int(raw)
            except ValueError:
                val = raw
            conj.append((col, op, val))
        kept = skipping.prune_files(spark, args.table, conj)
        for f in kept:
            print(f)
        log.info("%d file(s) survive the manifest prune", len(kept))
        return 0

    if args.command == "query":
        from timestream_travel_spark import registry

        registry.load_all()
        if args.name is None:
            for name in sorted(registry.QUERIES):
                oracle = "oracle" if name in registry.ORACLES else "rows-only"
                print(f"{name}  [{oracle}]")
            return 0
        if args.name not in registry.QUERIES:
            log.error("unknown query %r (run `query` with no name to list)", args.name)
            return 2
        if not args.data:
            log.error("--data is required to run a query")
            return 2
        spark = get_spark("timestream-travel-query")
        df = registry.QUERIES[args.name](spark, args.data)
        if args.explain:
            # Public API (prints the formatted plan to stdout) — the
            # py4j internals route breaks under Spark Connect and
            # across Spark versions.
            df.explain(mode="formatted")
            return 0
        if args.dest:
            df.write.mode("overwrite").parquet(args.dest)
            df = spark.read.parquet(args.dest)  # count the materialized result
        n = df.count()
        if args.limit:
            df.show(args.limit, truncate=False)
        log.info("%s: %d rows%s", args.name, n, f" -> {args.dest}" if args.dest else "")
        return 0

    if args.command == "zorder":
        from timestream_travel_spark.pipeline.zorder import write_zordered

        cols = [c.strip() for c in args.cols.split(",") if c.strip()]
        if len(cols) != 2:
            log.error("--cols needs exactly two columns, got %r", args.cols)
            return 2
        spark = get_spark("timestream-travel-zorder")
        n = write_zordered(
            spark.read.parquet(args.src),
            args.dest,
            cols[0],
            cols[1],
            rows_per_file=args.rows_per_file,
        )
        log.info("z-ordered %s by (%s, %s) into %d files at %s",
                 args.src, cols[0], cols[1], n, args.dest)
        return 0

    if args.command == "compact":
        from timestream_travel_spark.pipeline.compact import compact_parquet

        spark = get_spark("timestream-travel-compact")
        stats = compact_parquet(
            spark,
            args.src,
            args.dest,
            target_file_mb=args.target_mb,
            partition_by=args.partition_by.split(",") if args.partition_by else None,
        )
        log.info(
            "compacted %d files -> %d (%d rows) at %s",
            stats["files_before"], stats["files_after"], stats["rows"], args.dest,
        )
        return 0

    spark = get_spark("timestream-travel-backup")
    t0 = time.perf_counter()
    source = spark.read.parquet(args.source)
    cfg = BackupConfig(
        dest=args.dest,
        partition_col=args.partition_col,
        ts_col=args.ts_col,
        time_from=args.time_from,
        time_to=args.time_to,
        rows_per_chunk=args.rows,
        faithful=not args.typed,
        dry_run=args.dry_run,
        tiebreak_col=args.tiebreak_col,
    )
    from pyspark.sql import functions as F

    try:
        if args.chain:
            from timestream_travel_spark.pipeline.generations import (
                backup_next_generation,
                generation_ledger,
            )

            gen = backup_next_generation(spark, source, cfg)
            if args.dry_run:
                log.info(
                    "dry-run: would export generation %d -> %s (ledger untouched)",
                    gen,
                    args.dest,
                )
                return 0
            rows = (
                generation_ledger(spark, args.dest)
                .filter(F.col("gen") == gen)
                .collect()
            )
            if rows:  # an empty increment records no gen=N partition
                log.info(
                    "chain generation %d: %d chunks, %d rows -> %s",
                    gen,
                    rows[0]["n_chunks"],
                    rows[0]["n_rows"] or 0,
                    args.dest,
                )
            else:
                log.info("chain generation %d: no rows past the watermark", gen)
            return 0
        from timestream_travel_spark.pipeline.generations import chain_manifest

        existing = None if args.dry_run else chain_manifest(spark, args.dest)
        if existing is not None and "gen" in existing.columns:
            # a plain overwrite of _manifest would silently delete the
            # chain's whole generation ledger
            log.error(
                "%s holds a generation-tagged chain (_manifest/gen=*); "
                "use backup --chain, or a fresh dest for a plain backup",
                args.dest,
            )
            return 2
        manifest = backup(spark, source, cfg)
        if not args.dry_run:
            # persist the manifest beside the data (underscore prefix →
            # invisible to downstream Spark/Hadoop scans of the payload);
            # written distributed — the manifest itself is millions of
            # rows at 100 TB, never collect() it
            manifest.write.mode("overwrite").parquet(f"{args.dest}/_manifest")
            manifest = spark.read.parquet(f"{args.dest}/_manifest")
        # per-partition totals, as the reference logs at the end
        # (cmd/backup.go:338, 352) — aggregated executor-side, only
        # one row per partition value reaches the driver
        totals = (
            manifest.groupBy("partition")
            .agg(F.sum("row_count").alias("rows"), F.count("*").alias("chunks"))
            .collect()
        )
    except ValueError as e:
        log.error("%s", e)
        return 2
    for r in sorted(totals, key=lambda r: r["partition"]):
        log.info("partition=%s rows=%d", r["partition"], r["rows"])
    log.info(
        "backup %s in %.2fs: %d chunks, %d rows%s",
        "planned (dry-run)" if args.dry_run else "completed",
        time.perf_counter() - t0,
        sum(r["chunks"] for r in totals),
        sum(r["rows"] for r in totals),
        " (nothing written)" if args.dry_run else f" -> {args.dest}",
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
