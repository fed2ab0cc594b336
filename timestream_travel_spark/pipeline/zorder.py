"""Z-order (Morton-curve) data layout for multi-dimensional data
skipping — the write-side locality optimization that makes
min/max-based pruning work on MORE than one filter column.

A table sorted by `ts` alone packs each file into a narrow ts range,
so a ts predicate prunes files — but a user_id predicate touches
every file. Interleaving the bits of (user_id, ts) into one Morton
key and sorting by THAT packs each file into a small hyper-rectangle
of the (user_id, ts) plane, so box predicates on either or both
dimensions skip most files. This is the same layout idea Delta
Lake's OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite apply at
warehouse scale (public knowledge); here it is a plain Spark write
path: normalize → interleave (pure JVM expression tree) → sort →
chunked parquet.

At 100 TB the win compounds: file-level min/max pruning happens in
the scan planner BEFORE tasks launch, so a dashboard box query over
a z-ordered store schedules a handful of tasks instead of a full
scan's worth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits per dimension → 32-bit Morton key for 2 dims


def _normalize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) with the dimension's
    observed (lo, hi) — a rank-free affine quantization (cheap, one
    pass of min/max parameters; production systems use file-stat
    histograms the same way)."""
    span = max(hi - lo, 1e-12)
    scaled = (col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit((1 << bits) - 1)
    return F.least(
        F.greatest(F.round(scaled, 0).cast("bigint"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def morton_key(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low `bits` of two quantized columns into one
    Morton key — a pure expression tree (shift/and/or terms, no UDF),
    whole-stage-codegen friendly."""
    terms = []
    for b in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b))
        terms.append(F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    rows_per_file: int = 2000,
    bits: int = Z_BITS,
) -> int:
    """Write `df` as parquet laid out along the (col_x, col_y) Morton
    curve: files are cut from the z-sorted stream, so each holds a
    compact hyper-rectangle of the two-dimensional space. Returns the
    number of data files written.

    col_y may be a timestamp column (quantized via epoch micros).
    The min/max bounds are two 1-row aggregates (parameters, not
    data). repartition(1) here is the LOCAL demonstration of a
    globally-sorted write — at cluster scale use
    `repartitionByRange(n, zkey)` + sortWithinPartitions(zkey), which
    yields the same per-file locality with n-way parallelism."""
    x_raw = F.col(col_x).cast("double")
    y_col = df.schema[col_y].dataType.typeName()
    y_raw = (
        F.unix_micros(F.col(col_y)).cast("double")
        if y_col.startswith("timestamp")
        else F.col(col_y).cast("double")
    )
    bounds = df.agg(
        F.min(x_raw).alias("x_lo"),
        F.max(x_raw).alias("x_hi"),
        F.min(y_raw).alias("y_lo"),
        F.max(y_raw).alias("y_hi"),
    ).collect()[0]
    zkey = morton_key(
        _normalize(x_raw, bounds["x_lo"], bounds["x_hi"], bits),
        _normalize(y_raw, bounds["y_lo"], bounds["y_hi"], bits),
        bits,
    )
    (
        df.withColumn("__z", zkey)
        .repartition(1)
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(path)
    )
    import glob
    import os

    return len(glob.glob(os.path.join(path, "*.parquet")))


def write_linear(
    df: DataFrame, path: str, order_col: str, rows_per_file: int = 2000
) -> int:
    """Single-dimension sorted layout (the baseline the z-order test
    compares against)."""
    (
        df.repartition(1)
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(path)
    )
    import glob
    import os

    return len(glob.glob(os.path.join(path, "*.parquet")))


def files_touched(spark_df: DataFrame) -> int:
    """Distinct data files a (filtered) scan actually reads —
    the observable data-skipping metric."""
    return (
        spark_df.select(F.input_file_name().alias("f")).distinct().count()
    )
