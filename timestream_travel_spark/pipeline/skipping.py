"""File-statistics manifest + manifest-pruned scan planning — the
Delta/Iceberg-style metadata layer that turns a directory of parquet
into a skippable table (public layout idea: Delta Lake's per-file
stats in the transaction log, Iceberg's manifest min/max bounds).

Directory partitioning (pipeline/reference_layout.py) prunes on the
partition columns only; parquet row-group stats prune only AFTER a
task has opened the footer. The gap at 100 TB is scan PLANNING: with
~800k files (128 MB each), listing + footer-reading every file per
query is minutes of driver/executor time before the first byte of
data moves. A manifest — one row per file with min/max/null-count
per column — moves that decision into a single small parquet table:
the planner filters the manifest (a distributed filter at scale, a
driver-side collect of only the SURVIVING paths), then schedules
tasks for those files alone.

Composes with the z-order write path (pipeline/zorder.py): Morton
layout makes each file's (x, y) min/max box TIGHT, which is exactly
what makes manifest pruning effective on more than one column.

Stats come from parquet FOOTERS via pyarrow — building the manifest
reads zero data pages. Pruning is conservative and exact:
- a file survives iff its [min, max] interval can possibly satisfy
  the predicate, and the full predicate is re-applied to the rows
  that are read (file granularity prunes, the residual filter keeps
  row-level exactness);
- parquet min/max statistics exclude NULLs, so an all-NULL file
  carries NULL stats and is dropped — correct for every comparison
  predicate (SQL: NULL fails them all); `("col", "isnull", None)`
  keeps files via the null_count stat instead.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"  # underscore prefix: invisible to Spark scans

# predicate ops understood by prune_files / pruned_read; each maps to
# the manifest-interval test a file must pass to possibly hold a match
_OPS = ("<", "<=", ">", ">=", "=", "between", "isnull")


def _local(path: str) -> str:
    """file:///x/y → /x/y (pyarrow wants plain paths for local FS)."""
    p = urlparse(path)
    return p.path if p.scheme in ("file", "") else path


def collect_file_stats(data_path: str, stat_cols: list[str]) -> list[dict]:
    """One dict per data file: row_count plus min_/max_/nulls_ for each
    stat column, aggregated over the file's row groups — read from
    parquet footers only (no data pages). Driver-side file listing is
    the same cost class compact_parquet already accepts for
    maintenance jobs; at cluster scale run this per-partition over a
    binaryFile listing instead."""
    root = _local(data_path)
    files = sorted(
        os.path.join(root, f)
        for f in os.listdir(root)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ) if os.path.isdir(root) else [root]
    rows = []
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
        rec: dict = {"file": fp, "row_count": md.num_rows}
        for col in stat_cols:
            lo = hi = None
            nulls = 0
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                if st is None:
                    nulls = None
                    break
                nulls += st.null_count if st.null_count is not None else 0
                if st.has_min_max:
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
            rec[f"min_{col}"] = lo
            rec[f"max_{col}"] = hi
            rec[f"nulls_{col}"] = nulls
        rows.append(rec)
    return rows


def _spark_type(arrow_type):
    import pyarrow as pa
    from pyspark.sql import types as T

    if pa.types.is_timestamp(arrow_type):
        return T.TimestampType()
    if pa.types.is_integer(arrow_type):
        return T.LongType()
    if pa.types.is_floating(arrow_type):
        return T.DoubleType()
    if pa.types.is_date(arrow_type):
        return T.DateType()
    if pa.types.is_boolean(arrow_type):
        return T.BooleanType()
    if pa.types.is_string(arrow_type) or pa.types.is_large_string(arrow_type):
        return T.StringType()
    raise TypeError(f"no stats mapping for arrow type {arrow_type}")


def write_manifest(
    spark: SparkSession, data_path: str, stat_cols: list[str]
) -> str:
    """Build the stats manifest for `data_path` and persist it INSIDE
    the table directory at `<data_path>/_manifest` — the underscore
    prefix keeps every ordinary Spark/parquet scan of the table from
    picking it up (same convention as _SUCCESS/_metadata). Returns the
    manifest path.

    The schema is EXPLICIT, mapped from the table's arrow schema: an
    all-NULL file must surface as a true SQL NULL stat (pandas
    inference would float it to NaN, and Spark orders NaN above every
    number — `NaN >= v` is TRUE — which would silently disable the
    null-stats pruning rule)."""
    from pyspark.sql import types as T

    stats = collect_file_stats(data_path, stat_cols)
    root = _local(data_path)
    mpath = os.path.join(root, MANIFEST_DIR)
    sample = next(
        os.path.join(root, f)
        for f in sorted(os.listdir(root))
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ) if os.path.isdir(root) else root
    arrow_schema = pq.ParquetFile(sample).schema_arrow
    fields = [
        T.StructField("file", T.StringType(), False),
        T.StructField("row_count", T.LongType(), False),
    ]
    for c in stat_cols:
        ct = _spark_type(arrow_schema.field(c).type)
        fields += [
            T.StructField(f"min_{c}", ct, True),
            T.StructField(f"max_{c}", ct, True),
            T.StructField(f"nulls_{c}", T.LongType(), True),
        ]
    schema = T.StructType(fields)
    rows = [tuple(rec[f.name] for f in fields) for rec in stats]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(mpath)
    return mpath


def update_manifest(
    spark: SparkSession, data_path: str, stat_cols: list[str]
) -> dict:
    """Incremental manifest maintenance for append-only stores (the
    ingest pattern of streaming/index_maintain.py): footer-read ONLY
    the files the manifest doesn't know yet and append their rows —
    cost proportional to arrivals, not table size. Files deleted by
    compaction/retention get their rows dropped (a manifest row whose
    file is gone would otherwise resurrect pruned-away paths). Rebuild
    from scratch (write_manifest) after an in-place rewrite, which
    changes bytes under an EXISTING path."""
    root = _local(data_path)
    mpath = os.path.join(root, MANIFEST_DIR)
    if not os.path.isdir(mpath):
        write_manifest(spark, data_path, stat_cols)
        n = read_manifest(spark, data_path).count()
        return {"added": n, "removed": 0, "total": n}
    known = {
        r["file"] for r in read_manifest(spark, data_path).select("file").collect()
    }
    on_disk = {
        os.path.join(root, f)
        for f in os.listdir(root)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    }
    new_files, gone = sorted(on_disk - known), known - on_disk
    survivors = read_manifest(spark, data_path).filter(
        ~F.col("file").isin(list(gone)) if gone else F.lit(True)
    )
    if new_files:
        fresh_rows = []
        for fp in new_files:
            fresh_rows += collect_file_stats(fp, stat_cols)
        fresh = spark.createDataFrame(fresh_rows, survivors.schema)
        survivors = survivors.unionByName(fresh)
    # rewrite via a temp dir: the plan reads the dir being replaced
    tmp = mpath + ".tmp"
    survivors.coalesce(1).write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(mpath)
    os.replace(tmp, mpath)
    total = read_manifest(spark, data_path).count()
    return {"added": len(new_files), "removed": len(gone), "total": total}


def read_manifest(spark: SparkSession, data_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(_local(data_path), MANIFEST_DIR))


def _survival(col: str, op: str, val) -> F.Column:
    """Manifest-side condition under which a file MAY contain a row
    satisfying (col op val). Conservative by construction: interval
    overlap, never value equality."""
    lo, hi, nulls = F.col(f"min_{col}"), F.col(f"max_{col}"), F.col(f"nulls_{col}")
    if op == "<":
        return lo < F.lit(val)
    if op == "<=":
        return lo <= F.lit(val)
    if op == ">":
        return hi > F.lit(val)
    if op == ">=":
        return hi >= F.lit(val)
    if op == "=":
        return (lo <= F.lit(val)) & (hi >= F.lit(val))
    if op == "between":
        b_lo, b_hi = val
        return (lo <= F.lit(b_hi)) & (hi >= F.lit(b_lo))
    if op == "isnull":
        return nulls > 0
    raise ValueError(f"op must be one of {_OPS}, got {op!r}")


def _residual(col: str, op: str, val) -> F.Column:
    """Row-side filter for (col op val) — re-applied after pruning so
    results are exact regardless of how coarse the file stats are."""
    c = F.col(col)
    if op == "<":
        return c < F.lit(val)
    if op == "<=":
        return c <= F.lit(val)
    if op == ">":
        return c > F.lit(val)
    if op == ">=":
        return c >= F.lit(val)
    if op == "=":
        return c == F.lit(val)
    if op == "between":
        return c.between(F.lit(val[0]), F.lit(val[1]))
    if op == "isnull":
        return c.isNull()
    raise ValueError(f"op must be one of {_OPS}, got {op!r}")


def prune_files(
    spark: SparkSession, data_path: str, conjuncts: list[tuple]
) -> list[str]:
    """Files that may contain rows matching ALL conjuncts, per the
    manifest. The filter runs as a Spark plan over the manifest table
    (distributed at scale); only the surviving path strings are
    collected."""
    m = read_manifest(spark, data_path)
    for col, op, val in conjuncts:
        m = m.filter(_survival(col, op, val))
    return [r["file"] for r in m.select("file").collect()]


def pruned_read(
    spark: SparkSession, data_path: str, conjuncts: list[tuple]
) -> DataFrame:
    """Manifest-pruned scan: plan over the manifest, read only the
    surviving files, re-apply the full predicate row-level. Exactly
    equivalent to `spark.read.parquet(path).filter(pred)` — the
    manifest only removes files that cannot match."""
    kept = prune_files(spark, data_path, conjuncts)
    residual = None
    for col, op, val in conjuncts:
        term = _residual(col, op, val)
        residual = term if residual is None else residual & term
    if not kept:
        # correct empty result with the table's schema, no file reads
        return spark.read.parquet(_local(data_path)).filter(F.lit(False))
    df = spark.read.parquet(*kept)
    return df.filter(residual) if residual is not None else df


def verify_manifest(
    spark: SparkSession, data_path: str, stat_cols: list[str]
) -> DataFrame:
    """Audit job: recompute per-file min/max/null-count FROM THE DATA
    (groupBy input_file_name) and anti-join against the manifest —
    returns the files whose stored stats disagree (empty = manifest
    faithful). Full-scan cost, run like any table maintenance."""
    aggs = [F.count("*").alias("row_count")]
    for c in stat_cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.count_if(F.col(c).isNull()).cast("bigint").alias(f"nulls_{c}"),
        ]
    actual = (
        spark.read.parquet(_local(data_path))
        .groupBy(
            F.regexp_replace(F.input_file_name(), "^file:/+", "/").alias("file")
        )
        .agg(*aggs)
    )
    manifest = read_manifest(spark, data_path).select(actual.columns)
    return actual.exceptAll(manifest)
