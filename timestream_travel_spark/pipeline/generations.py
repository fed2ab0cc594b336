"""Generation-tagged backup chains: every increment of an
incremental-backup chain records its manifest under
`_manifest/gen=<n>`, giving the archive a queryable history — which
chunks each run added, the chain's watermark after each run — and
TIME TRAVEL BY GENERATION: rebuild the table exactly as the backup
chain knew it after increment N.

Composition, not reinvention: increments come from
pipeline/restore.incremental_backup (epoch-us watermark, append
write mode) and the rebuild delegates to pipeline/restore.
restore_as_of with the chosen generation's watermark as the cutoff —
in a time-ordered chain, "state after gen N" IS "rows at or before
gen N's max timestamp" (every later row landed in a later gen, which
is the chain's invariant, not an assumption).

Precision: the cutoff is the generation's microsecond watermark
(max_ts_us), so TYPED chains (cfg.faithful=False — JSON keeps the
micros) restore exactly. FAITHFUL chains render timestamps at second
precision (reference parity, functions/faithful.REF_TS_FMT), so a
boundary second shared by two generations cannot be split on
restore — the same documented caveat as incremental_backup's legacy
second-precision watermark fallback.

100 TB shape: the ledger is one tiny parquet row-group per
generation (manifest rows, not data); restore prunes chunk
directories by the sink's __date partition FIRST (restore_as_of),
so traveling to an early generation reads only that prefix of the
archive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from timestream_travel_spark.pipeline.backup import BackupConfig
from timestream_travel_spark.pipeline.restore import incremental_backup, restore_as_of

__all__ = [
    "backup_next_generation",
    "chain_manifest",
    "generation_ledger",
    "restore_generation",
]

_MANIFEST = "_manifest"


def chain_manifest(spark: SparkSession, dest: str) -> DataFrame | None:
    """Union of every generation's manifest — the chain's full chunk
    set (increments only ever ADD chunks). None if no chain exists."""
    try:
        return spark.read.parquet(f"{dest}/{_MANIFEST}")
    except AnalysisException:
        return None


def backup_next_generation(
    spark: SparkSession, source: DataFrame, cfg: BackupConfig
) -> int:
    """Run the chain's next increment: export rows strictly newer
    than the chain watermark (the union manifest's max_ts_us) and
    land the new manifest under `_manifest/gen=<n>`. Returns n.
    Generation 0 is the full export; later generations force
    append mode (the chain contract — see BackupConfig.write_mode)."""
    prev = chain_manifest(spark, cfg.dest)
    gen = 0
    if prev is not None:
        if "gen" not in prev.columns:
            raise ValueError(
                f"{cfg.dest}/{_MANIFEST} is not generation-tagged (plain "
                "backup manifest) — start the chain in a fresh dest"
            )
        gen = prev.agg(F.max("gen")).collect()[0][0] + 1
        prev = prev.drop("gen")
        if cfg.write_mode != "append":
            cfg = BackupConfig(**{**cfg.__dict__, "write_mode": "append"})
    manifest = incremental_backup(spark, source, cfg, prev)
    if cfg.dry_run:
        # backup() skipped the data write; recording the manifest
        # anyway would advance the chain watermark past rows that
        # were never exported — permanent data loss on the next
        # increment. A dry run must leave the ledger untouched.
        return gen
    (
        manifest.withColumn("gen", F.lit(gen))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("gen")
        .parquet(f"{cfg.dest}/{_MANIFEST}")
    )
    return gen


def generation_ledger(spark: SparkSession, dest: str) -> DataFrame:
    """One row per generation: chunks, rows, and the chain watermark
    after that generation (running max — a generation that added no
    rows inherits its predecessor's watermark). A never-written chain
    (e.g. a first increment whose window held zero rows) yields an
    empty ledger instead of raising."""
    m = chain_manifest(spark, dest)
    if m is None:
        return spark.createDataFrame(
            [], "gen int, n_chunks bigint, n_rows bigint, watermark_us bigint"
        )
    if "gen" not in m.columns:
        raise ValueError(
            f"{dest}/{_MANIFEST} is not generation-tagged (plain backup "
            "manifest) — generation queries need a backup --chain dest"
        )
    per_gen = m.groupBy("gen").agg(
        F.count("*").alias("n_chunks"),
        F.sum("row_count").cast("bigint").alias("n_rows"),
        F.max("max_ts_us").alias("gen_max_ts_us"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("gen").rowsBetween(Window.unboundedPreceding, 0)
    # bounded table (one row per generation) — the single-partition
    # window is over the ledger, never data
    return per_gen.select(
        "gen",
        "n_chunks",
        "n_rows",
        F.max("gen_max_ts_us").over(w).alias("watermark_us"),
    )


def restore_generation(
    spark: SparkSession,
    backup_dir: str,
    out: str,
    gen: int,
    schema: str | None = None,
    ts_col: str = "ts",
) -> dict[str, int]:
    """Rebuild the table as the chain knew it after generation `gen`
    (inclusive). Raises ValueError for an unknown generation."""
    ledger = {r["gen"]: r["watermark_us"] for r in generation_ledger(spark, backup_dir).collect()}
    if gen not in ledger:
        raise ValueError(f"unknown generation {gen}; chain has {sorted(ledger)}")
    import datetime

    # integer timedelta math — float epoch-seconds only carry ~0.2 µs
    # at 2024 magnitudes, enough to misplace a boundary row
    hwm = datetime.datetime(1970, 1, 1) + datetime.timedelta(
        microseconds=int(ledger[gen])
    )
    cutoff = hwm.strftime("%Y-%m-%d %H:%M:%S.%f")
    res = restore_as_of(spark, backup_dir, out, cutoff, schema=schema, ts_col=ts_col)
    res["generation"] = gen
    return res
