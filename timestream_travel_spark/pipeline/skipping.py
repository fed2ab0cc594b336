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
- parquet min/max statistics exclude NULLs. A file whose stats are
  absent is dropped for a comparison predicate ONLY when it is
  provably all-NULL (null_count == row_count; SQL comparisons fail
  on NULL); a file whose writer simply omitted statistics keeps its
  "may match" status — foreign-written files (the out-of-band-append
  ingest pattern update_manifest exists for) must never be silently
  pruned. `("col", "isnull", None)` keeps files via the null_count
  stat, conservatively keeping files whose null_count is unknown.
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
    """file:///x/y → /x/y (pyarrow wants plain paths for local FS).

    Deliberately does NOT percent-decode: disk names legitimately
    contain literal %XX — Spark's partitioned writer escapes special
    chars in partition VALUES into the directory name itself
    (``k=03:00`` is ``k=03%3A00`` on disk), and the binaryFile
    source's `path` column returns that raw disk path with only a
    `file:` prefix (measured, not assumed). Unquoting here would
    corrupt those names. The one producer of genuinely
    percent-ENCODED URIs is input_file_name(), which double-encodes
    the disk name (`%3A` → `%253A`, space → `%20`); verify_manifest
    decodes that one at its groupBy key."""
    p = urlparse(path)
    return p.path if p.scheme in ("file", "") else path


def _list_parquet(root: str) -> list[str]:
    """All data files under `root`, RECURSIVELY — partitioned layouts
    (key=value subdirs) are tables too. Hidden dirs/files (`_`/`.`
    prefix: _manifest, _SUCCESS, .crc side-files) are skipped at
    every level, matching what a Spark scan of the same path sees."""
    if not os.path.isdir(root):
        return [root]
    out: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        out += [
            os.path.join(dirpath, f)
            for f in filenames
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
    return sorted(out)


def _file_stats_record(fp: str, stat_cols: list[str]) -> dict:
    """Footer-only stats for ONE parquet file. Missing statistics are
    honest NULLs, never guesses:
    - min/max are populated only when EVERY row group either carries
      min/max or is provably all-NULL (its non-null values are zero,
      so it cannot widen the file interval); one stats-less row group
      with data ⇒ the file's interval is unknown ⇒ NULL min/max;
    - nulls is NULL as soon as any row group omits null_count.
    _survival() treats NULL stats as 'may match' unless the file is
    provably all-NULL — conservative, so foreign writers that skip
    statistics cost pruning efficiency, never correctness."""
    md = pq.ParquetFile(fp).metadata
    idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
    rec: dict = {"file": fp, "row_count": md.num_rows}
    for col in stat_cols:
        lo = hi = None
        nulls: int | None = 0
        bounded = True  # min/max cover every non-null value so far
        for rg in range(md.num_row_groups):
            rgmeta = md.row_group(rg)
            st = rgmeta.column(idx[col]).statistics
            if st is None:
                nulls = None
                bounded = False
                break
            if nulls is not None and st.null_count is not None:
                nulls += st.null_count
            else:
                nulls = None
            if st.has_min_max:
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            elif st.null_count != rgmeta.num_rows:
                # data rows without bounds → file interval unknown
                bounded = False
        if not bounded:
            lo = hi = None
        rec[f"min_{col}"] = lo
        rec[f"max_{col}"] = hi
        rec[f"nulls_{col}"] = nulls
    return rec


def collect_file_stats(data_path: str, stat_cols: list[str]) -> list[dict]:
    """One dict per data file (recursive over partitioned layouts):
    row_count plus min_/max_/nulls_ for each stat column, aggregated
    over the file's row groups — read from parquet footers only (no
    data pages). Driver-side sequential loop: the same cost class
    compact_parquet already accepts for maintenance jobs at this
    scale; `write_manifest(distributed=True)` is the executor-side
    path for 100k+-file stores."""
    return [_file_stats_record(fp, stat_cols) for fp in _list_parquet(_local(data_path))]


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


def _manifest_schema(data_path: str, stat_cols: list[str]):
    """Explicit manifest schema, mapped from one data file's arrow
    schema: an all-NULL file must surface as a true SQL NULL stat
    (pandas inference would float it to NaN, and Spark orders NaN
    above every number — `NaN >= v` is TRUE — which would silently
    disable the null-stats pruning rule)."""
    from pyspark.sql import types as T

    files = _list_parquet(_local(data_path))
    if not files:
        raise ValueError(
            f"no parquet data files under {data_path!r} — cannot infer a "
            "manifest schema for an empty store"
        )
    arrow_schema = pq.ParquetFile(files[0]).schema_arrow
    missing = [c for c in stat_cols if c not in arrow_schema.names]
    if missing:
        raise ValueError(
            f"stat columns {missing} are not data columns of {data_path!r} — "
            "partition keys live in directory names, not parquet footers; "
            "manifest stats apply to footer-backed columns only"
        )
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
    return T.StructType(fields)


def _stats_df(
    spark: SparkSession, data_path: str, stat_cols: list[str], distributed: bool
) -> DataFrame:
    """Stats rows as a DataFrame with the explicit manifest schema.

    distributed=True is the 100k+-file path: Spark's binaryFile
    source LISTS the store (distributed listing, `content` column
    never selected so no data bytes move) and the footer reads run
    executor-side in an Arrow-batched mapInPandas — build cost is
    per-executor, not driver-bound. The driver loop (default) stays
    correct for small stores and for the incremental per-file calls
    update_manifest makes."""
    schema = _manifest_schema(data_path, stat_cols)
    if not distributed:
        import pandas as pd

        rows = [
            tuple(rec[f.name] for f in schema.fields)
            for rec in collect_file_stats(data_path, stat_cols)
        ]
        # r15: the plain list-of-tuples createDataFrame pays a
        # multi-second py4j/pickle conversion on EVERY downstream
        # action (measured 5-7 s for 65 manifest rows at each
        # manifest write; the Arrow/pandas path is ~0.3 s — the
        # bounded_df lesson). dtype=object keeps missing stats as
        # true None → SQL NULL (the NaN-ordering trap in
        # _manifest_schema's docstring), verified by the multifile
        # pruning tests.
        pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields], dtype=object)
        return spark.createDataFrame(pdf, schema)

    import pandas as pd

    names = [f.name for f in schema.fields]
    cols = list(stat_cols)

    def footer_stats(batches):
        for pdf in batches:
            recs = [
                _file_stats_record(_local(p), cols) for p in pdf["path"].to_list()
            ]
            yield pd.DataFrame(
                {n: [r[n] for r in recs] for n in names}, dtype=object
            )

    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(_local(data_path))
        .select("path")
    )
    par = spark.sparkContext.defaultParallelism
    return listing.repartition(par).mapInPandas(footer_stats, schema)


def write_manifest(
    spark: SparkSession,
    data_path: str,
    stat_cols: list[str],
    distributed: bool = False,
) -> str:
    """Build the stats manifest for `data_path` (recursing into
    partitioned key=value layouts) and persist it INSIDE the table
    directory at `<data_path>/_manifest` — the underscore prefix
    keeps every ordinary Spark/parquet scan of the table from picking
    it up (same convention as _SUCCESS/_metadata). Returns the
    manifest path. `distributed=True` lists via Spark's binaryFile
    source and footer-reads executor-side (the path for stores too
    large to list on the driver)."""
    root = _local(data_path)
    mpath = os.path.join(root, MANIFEST_DIR)
    stats = _stats_df(spark, data_path, stat_cols, distributed)
    _swap_in(stats, mpath)
    return mpath


def _swap_in(df: DataFrame, mpath: str) -> None:
    """Replace the manifest dir: write to `.tmp`, rename any current
    manifest aside to `.old`, promote `.tmp` with an atomic rename,
    then delete `.old`. os.replace cannot overwrite a non-empty dir,
    so the rename-aside is unavoidable and there IS a brief window
    (between the two renames) with nothing at `mpath`; a crash there
    leaves only `.old`. Either manifest is therefore always
    RECOVERABLE after a crash, and read_manifest / update_manifest
    fall back to `.old` when `mpath` is missing, so concurrent
    planners keep working through both the window and the crash
    case. Single writer assumed (the update_manifest contract); the
    `.old` cleanup at the end means a reader that resolved to `.old`
    must finish its scan before the NEXT swap starts."""
    import shutil

    tmp, old = mpath + ".tmp", mpath + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    # repartition(1), NOT coalesce(1): coalesce folds the whole plan
    # into ONE task, so the distributed footer-read stage upstream
    # (repartition(par) + mapInPandas) runs its 32 partitions
    # sequentially in that single task, each paying its own Python-
    # runner round-trip — measured 4.6 s vs 0.65 s at 64 files. The
    # repartition shuffles only the finished manifest ROWS (one per
    # file, stats-width) to the single writer while the footer reads
    # stay parallel in the map stage.
    df.repartition(1).write.mode("overwrite").parquet(tmp)
    if os.path.isdir(mpath):
        os.replace(mpath, old)
    os.replace(tmp, mpath)
    shutil.rmtree(old, ignore_errors=True)


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
    if not os.path.isdir(mpath) and os.path.isdir(mpath + ".old"):
        # a crash inside _swap_in's promote window left only the
        # renamed-aside copy: recover it instead of rebuilding (this
        # is the writer, so the promote cannot race another swap)
        os.replace(mpath + ".old", mpath)
    if not os.path.isdir(mpath):
        write_manifest(spark, data_path, stat_cols)
        n = read_manifest(spark, data_path).count()
        return {"added": n, "removed": 0, "total": n}
    known = {
        r["file"] for r in read_manifest(spark, data_path).select("file").collect()
    }
    on_disk = set(_list_parquet(root))
    new_files, gone = sorted(on_disk - known), known - on_disk
    survivors = read_manifest(spark, data_path).filter(
        ~F.col("file").isin(list(gone)) if gone else F.lit(True)
    )
    if new_files:
        fresh_rows = [
            tuple(rec[f.name] for f in survivors.schema.fields)
            for fp in new_files
            for rec in collect_file_stats(fp, stat_cols)
        ]
        fresh = spark.createDataFrame(fresh_rows, survivors.schema)
        survivors = survivors.unionByName(fresh)
    # the plan reads the dir being replaced, so materialize to a temp
    # dir first; _swap_in keeps a valid manifest visible at every
    # instant (rename-aside, never an rmtree-then-rename window)
    _swap_in(survivors, mpath)
    total = read_manifest(spark, data_path).count()
    return {"added": len(new_files), "removed": len(gone), "total": total}


def read_manifest(spark: SparkSession, data_path: str) -> DataFrame:
    mpath = os.path.join(_local(data_path), MANIFEST_DIR)
    if not os.path.isdir(mpath) and os.path.isdir(mpath + ".old"):
        # _swap_in's promote window (or a crash inside it): serve the
        # renamed-aside copy. Read it in place — promoting it back
        # here could collide with the writer's own rename — and leave
        # the heal to update_manifest (the single writer). The read is
        # MATERIALIZED eagerly (localCheckpoint severs the plan from
        # the path): a lazy plan would re-scan `.old` at action time,
        # after the writer's next swap or heal may have renamed or
        # removed it. A manifest is one row per data file, so the
        # eager read is bounded and cheap.
        return spark.read.parquet(mpath + ".old").localCheckpoint(eager=True)
    return spark.read.parquet(mpath)


def _survival(col: str, op: str, val) -> F.Column:
    """Manifest-side condition under which a file MAY contain a row
    satisfying (col op val). Conservative by construction: interval
    overlap, never value equality — and NULL stats only prune when
    they PROVE absence. A comparison's interval test is SQL-NULL when
    min/max are NULL, which happens both for all-NULL files (parquet
    min/max exclude NULLs) and for files whose writer omitted
    statistics; only the first may be dropped (comparisons fail on
    NULL values), so the fallback keeps the file unless
    nulls == row_count proves it all-NULL. An unknown null_count
    keeps the file too."""
    lo, hi, nulls = F.col(f"min_{col}"), F.col(f"max_{col}"), F.col(f"nulls_{col}")
    # NULL-stat fallback for comparison ops: may match, unless the
    # file is provably all-NULL (then no comparison can succeed)
    no_stats_keep = F.coalesce(nulls != F.col("row_count"), F.lit(True))

    def cmp(test: F.Column) -> F.Column:
        return F.coalesce(test, no_stats_keep)

    if op == "<":
        return cmp(lo < F.lit(val))
    if op == "<=":
        return cmp(lo <= F.lit(val))
    if op == ">":
        return cmp(hi > F.lit(val))
    if op == ">=":
        return cmp(hi >= F.lit(val))
    if op == "=":
        return cmp((lo <= F.lit(val)) & (hi >= F.lit(val)))
    if op == "between":
        b_lo, b_hi = val
        return cmp((lo <= F.lit(b_hi)) & (hi >= F.lit(b_lo)))
    if op == "isnull":
        # unknown null_count → may contain NULLs → keep
        return F.coalesce(nulls > 0, F.lit(True))
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
    # basePath: surviving leaf files under a partitioned (key=value)
    # layout keep their partition columns, so the result schema is
    # identical to the naive full-table scan
    df = spark.read.option("basePath", _local(data_path)).parquet(*kept)
    return df.filter(residual) if residual is not None else df


def verify_manifest(
    spark: SparkSession, data_path: str, stat_cols: list[str]
) -> DataFrame:
    """Audit job: recompute per-file min/max/null-count FROM THE DATA
    (groupBy input_file_name) and reconcile against the manifest via
    a full-outer join on the file path — one row per discrepancy with
    an `issue` column:
    - 'stale_manifest_row': the manifest names a file the data scan
      never produced (deleted out-of-band) — the orphan that would
      otherwise hand pruned_read a nonexistent path;
    - 'unmanifested_file': the data holds a file the manifest lacks
      (out-of-band append before update_manifest ran);
    - 'stats_mismatch': row_count differs, a STORED min/max/null
      stat differs from the recompute, or a stat is NULL where the
      writer provided one (collect_file_stats would have captured
      it). A manifest NULL for a stats-less foreign file is a
      CORRECT conservative entry, not a failure — _survival already
      treats it as 'may match' — so NULL-vs-value alone doesn't flag
      unless a fresh footer read disagrees.
    Empty = manifest faithful. Full-scan cost plus one footer pass
    over rows with NULL stats; run like any table maintenance."""
    aggs = [F.count("*").alias("row_count")]
    for c in stat_cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.count_if(F.col(c).isNull()).cast("bigint").alias(f"nulls_{c}"),
        ]
    # input_file_name() percent-encodes the ON-DISK name once more
    # (space → %20; a literal % in a Hadoop-escaped partition dir like
    # `k=03%3A00` → %25): ONE url_decode recovers exactly the raw
    # disk path the manifest stores. Literal '+' is NOT encoded by
    # input_file_name but URLDecoder folds '+' to a space, so
    # pre-escape it to %2B first (both behaviors measured —
    # tests/test_skipping.py::test_verify_manifest_encoded_partition).
    decoded_file = F.url_decode(
        F.regexp_replace(
            F.regexp_replace(F.input_file_name(), "^file:/+", "/"), r"\+", "%2B"
        )
    )
    actual = (
        spark.read.parquet(_local(data_path))
        .groupBy(decoded_file.alias("file"))
        .agg(*aggs)
    )
    cols = actual.columns
    manifest = read_manifest(spark, data_path).select(cols)
    a = actual.select([F.col(c).alias(f"a_{c}") for c in cols])
    m = manifest.select([F.col(c).alias(f"m_{c}") for c in cols])
    j = m.join(a, F.col("m_file") == F.col("a_file"), "full_outer")
    # a stored stat must match the recompute; a NULL stored stat is
    # only acceptable if the footer genuinely lacks it — re-read the
    # footer for those rows (cheap: only NULL-stat rows) and compare
    null_stat_files = [
        r["m_file"]
        for r in j.filter(
            F.col("a_file").isNotNull()
            & F.col("m_file").isNotNull()
            & (
                # any stored stat NULL while data has non-null values
                _any_null_stat(stat_cols)
            )
        )
        .select("m_file")
        .collect()
    ]
    footer_ok = set()
    if null_stat_files:
        # ONE manifest job for every suspect (not a per-file
        # filter().collect() loop — that is N+1 Spark jobs); the
        # footer re-reads stay driver-side pyarrow, one per suspect
        stored = {
            r["file"]: r
            for r in read_manifest(spark, data_path)
            .filter(F.col("file").isin(null_stat_files))
            .collect()
        }
        for fp in null_stat_files:
            rec = _file_stats_record(fp, stat_cols)
            row = stored[fp]
            if all(row[k] == rec[k] for k in rec):
                footer_ok.add(fp)
    mismatch = F.lit(False)
    for c in cols[1:]:  # row_count + stats
        am, mm = F.col(f"a_{c}"), F.col(f"m_{c}")
        mismatch = mismatch | (
            mm.isNotNull() & (am.isNull() | (am != mm))
        )
        # a NULL stored stat where the data has values is a suspect
        # for EVERY stat class (min/max included — a file rewritten
        # in place by a stats-writing writer must surface); the
        # footer_ok whitelist below excuses files whose footer
        # genuinely lacks the stat (honest foreign writers)
        mismatch = mismatch | (mm.isNull() & am.isNotNull())
    out = j.select(
        F.coalesce("m_file", "a_file").alias("file"),
        F.when(F.col("a_file").isNull(), "stale_manifest_row")
        .when(F.col("m_file").isNull(), "unmanifested_file")
        .when(mismatch, "stats_mismatch")
        .otherwise(None)
        .alias("issue"),
    ).filter(F.col("issue").isNotNull())
    # NULL min/max rows whose footer re-read confirms the store has
    # no stats are conservative truth, not mismatches
    suspects = out.filter(F.col("issue") == "stats_mismatch")
    confirmed_bad = suspects.filter(~F.col("file").isin(list(footer_ok)) if footer_ok else F.lit(True))
    return out.filter(F.col("issue") != "stats_mismatch").unionByName(confirmed_bad)


def _any_null_stat(stat_cols: list[str]) -> F.Column:
    """Manifest rows whose stored stats are NULL where the DATA has
    values — candidates for the footer re-read (legit for stats-less
    writers, a mismatch otherwise)."""
    cond = F.lit(False)
    for c in stat_cols:
        cond = (
            cond
            | (F.col(f"m_min_{c}").isNull() & F.col(f"a_min_{c}").isNotNull())
            | (F.col(f"m_max_{c}").isNull() & F.col(f"a_max_{c}").isNotNull())
            | (F.col(f"m_nulls_{c}").isNull() & F.col(f"a_nulls_{c}").isNotNull())
        )
    return cond
