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


def compress_weighted(pairs: list[tuple[float, int]]) -> tuple[list[float], list[int]]:
    """Sort (value, weight) pairs and fold runs of ≈ total/SKETCH_SIZE
    cumulative weight into single points whose representative is the
    run's LAST value (an upper rank bound). Rank error per point ≤
    its weight ≤ ceil(total/SKETCH_SIZE). The base summarizer is the
    w=1 case; the streaming recompressor applies the SAME fold to
    already-weighted summaries — one algorithm, one error argument."""
    pairs.sort()
    total = sum(w for _, w in pairs)
    step = max(1, (total + SKETCH_SIZE - 1) // SKETCH_SIZE)
    out_v: list[float] = []
    out_w: list[int] = []
    acc = 0
    for v, w in pairs:
        acc += w
        if out_v and acc <= step * len(out_v):
            out_w[-1] += w
            out_v[-1] = v
        else:
            out_v.append(v)
            out_w.append(w)
    return out_v, out_w


def _summarize_partition(batches):
    """Per-partition sketch: the weighted fold applied to unit
    weights. Per-partition rank error ≤ ceil(n_p / SKETCH_SIZE)."""
    vals: list[float] = []
    for pdf in batches:
        vals.extend(pdf["value"].to_list())
    if not vals:
        return
    out_v, out_w = compress_weighted([(v, 1) for v in vals])
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
    weight reaches q·n. ONE aggregation answers every probe —
    min(v) over the qualifying rows per q — so the summary subplan
    (which may wrap a corpus-sized mapInPandas) executes exactly
    once, not once per probe per referenced branch. The summary is
    bounded, so the windowed cumulative table is parameter-sized."""
    wcum = Window.orderBy("v", "w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = summary.select(
        "v", "w", F.sum("w").over(wcum).alias("cw"), F.sum("w").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n")
    )
    one = cum.agg(
        F.max("n").alias("n"),
        *[
            F.min(F.when(F.col("cw") * 1.0 >= F.lit(q) * F.col("n"), F.col("v"))).alias(
                f"est_{i}"
            )
            for i, q in enumerate(qs)
        ],
    )
    # unpivot the single row via ONE explode (three union branches
    # would reference — and potentially re-execute — the aggregate
    # subtree three times)
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.col(f"est_{i}").alias("est"),
                        F.col("n").cast("bigint").alias("n"),
                    )
                    for i, q in enumerate(qs)
                ]
            )
        ).alias("e")
    ).select("e.q", "e.est", "e.n")


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
