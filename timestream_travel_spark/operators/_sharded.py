"""Shared value-range-sharded two-phase weighted prefix sum — the
one copy of the machinery behind q_weighted_median (timeseries7),
q_weighted_quantiles (analytics4) and, in its unweighted rank form,
q_window_distribution / q_gini_concentration.

Why it exists (the 100 TB argument, stated once): a cumulative
window partitioned by a low-cardinality group sorts each group's
ENTIRE slice through one WindowExec task. Sharding the ordering's
leading value column into fixed-width buckets makes phase 1 a plain
(group, shard) groupBy — map-side combined, fully parallel, the only
corpus-sized shuffle — and phase 2 a prefix sum over the TINY shard
table (bounded by the value domain, not data volume) that tags, per
group × probe, the ONE shard whose cumulative weight crosses the
probed fraction. Only tagged shards' rows are re-scanned and
cumulative-windowed (bounded slices, parallel across group × probe ×
shard). Crossing tests stay DECIMAL with INTEGER multipliers
(den·cw ≥ num·tot — never a float fraction of a total), so the
crossing row is engine-exact against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sharded_weighted_quantiles(
    rows: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    probes: list[tuple[int, int, str]],
) -> DataFrame:
    """`rows` must carry `group_cols`, `order_cols` (leading column =
    the sharded value), a DECIMAL `qty` weight, and a `shard` id
    monotone in the leading order column (equal values share a
    shard, so shards partition the sort order). `probes` are
    (num, den, tag) fractions num/den in (0, 1].

    Returns the crossing candidate rows — one slice per group ×
    probe, already filtered to den·cw ≥ num·tot — with columns
    group_cols + [value, q, tot, cw]; callers finish with
    groupBy(...).agg(min(value)) (prices are monotone across shards,
    so the min within the crossing shard is the global answer)."""
    value = order_cols[0]
    shard_w = rows.groupBy(*group_cols, "shard").agg(F.sum("qty").alias("sw"))
    w_prev = (
        Window.partitionBy(*group_cols)
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_grp = Window.partitionBy(*group_cols)
    marked = shard_w.select(
        *group_cols,
        "shard",
        F.coalesce(F.sum("sw").over(w_prev), F.lit(0).cast("decimal(20,4)")).alias(
            "off"
        ),
        "sw",
        F.sum("sw").over(w_grp).alias("tot"),
    )
    qtags = rows.sparkSession.createDataFrame(
        probes, "num int, den int, q string"
    )
    crossing = marked.crossJoin(F.broadcast(qtags)).filter(
        (F.col("den") * (F.col("off") + F.col("sw")) >= F.col("num") * F.col("tot"))
        & (F.col("den") * F.col("off") < F.col("num") * F.col("tot"))
    )
    w_local = (
        Window.partitionBy(*group_cols, "shard", "q")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cand = rows.join(
        F.broadcast(
            crossing.select(*group_cols, "shard", "num", "den", "q", "off", "tot")
        ),
        [*group_cols, "shard"],
    ).select(
        *group_cols,
        value,
        "num",
        "den",
        "q",
        "tot",
        (F.col("off") + F.sum("qty").over(w_local)).alias("cw"),
    )
    return cand.filter(
        F.col("den") * F.col("cw") >= F.col("num") * F.col("tot")
    ).drop("num", "den")
