"""Mergeable quantile-summary sketch (round-5 wave 8).

Rounds out the sketch family (HLL cardinality, Count-Min frequency,
Misra-Gries heavy hitters, Bloom membership) with the quantile
member: each partition compresses its sorted values into a bounded
(value, weight) summary — the t-digest/GK family's core move — and
the merged summaries answer any quantile with rank error ≤ n/S per
partition summary (pinned by pytest against exact percentiles).
`approx_percentile` already exists as the built-in twin
(q_percentiles); this operator is the CUSTOM mergeable-state
implementation the engine would persist and union incrementally,
exactly like the HLL/Bloom/MG state tables.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

SKETCH_SIZE = 64  # summary points per partition
QS = [0.5, 0.9, 0.99]  # probed quantiles

_SUMMARY_SCHEMA = "v double, w bigint"


def _summarize_partition(batches):
    """Sort the partition's values and emit SKETCH_SIZE evenly-spaced
    (value, weight) points: point i covers the run of values whose
    representative (the run's LAST value — an upper rank bound) it
    is. Per-partition rank error ≤ ceil(n_p / SKETCH_SIZE)."""
    vals: list[float] = []
    for pdf in batches:
        vals.extend(pdf["value"].to_list())
    if not vals:
        return
    vals.sort()
    n = len(vals)
    out_v, out_w = [], []
    step = max(1, (n + SKETCH_SIZE - 1) // SKETCH_SIZE)
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        out_v.append(vals[hi - 1])
        out_w.append(hi - lo)
    yield pd.DataFrame({"v": out_v, "w": out_w})


def quantile_summary(df: DataFrame, col: str) -> DataFrame:
    """The mergeable sketch table: bounded (v, w) rows per partition.
    Merging two sketches is UNION ALL (weights add along the value
    axis) — the same persist/union incremental contract as the HLL
    and Bloom state tables."""
    return df.select(F.col(col).alias("value")).mapInPandas(
        _summarize_partition, _SUMMARY_SCHEMA
    )


def estimate_quantiles(summary: DataFrame, qs: list[float]) -> DataFrame:
    """Cumulative-weight probe over ANY summary table (one-shot
    sketch, live streaming store, or recompressed store): the
    estimate for q is the smallest summary value whose cumulative
    weight reaches q·n. The summary is bounded, so the global window
    is parameter-sized."""
    wcum = Window.orderBy("v", "w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = summary.withColumn("cw", F.sum("w").over(wcum)).crossJoin(
        F.broadcast(summary.agg(F.sum("w").alias("n")))
    )
    probes = None
    for q in qs:
        est = (
            cum.filter(F.col("cw") * 1.0 >= F.lit(q) * F.col("n"))
            .orderBy("v", "w")
            .limit(1)
            .select(
                F.lit(q).alias("q"),
                F.col("v").alias("est"),
                F.col("n").cast("bigint").alias("n"),
            )
        )
        probes = est if probes is None else probes.unionByName(est)
    return probes


@query("q_quantile_sketch")
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of events.value from the merged
    per-partition quantile summaries: the estimate for q is the
    smallest summary value whose cumulative weight reaches q·n.
    Rows-only (the summary depends on the partitioning); pytest pins
    the rank error of every estimate against the exact percentile
    (≤ one summary step per contributing partition).

    Scale shape: the only corpus-sized work is the one-pass
    per-partition sort+compress (mapInPandas, bounded output of
    SKETCH_SIZE rows per partition); the cumulative-weight window
    then runs on the #partitions × SKETCH_SIZE summary — a bounded
    table, same class as the Kaplan-Meier risk table. At 100 TB the
    summary IS the persisted artifact: unioning daily summaries and
    re-running the window gives incremental quantiles without
    rescanning history."""
    ev = load_table(spark, sf_dir, "events")
    return estimate_quantiles(quantile_summary(ev, "value"), QS)
