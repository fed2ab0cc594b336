"""Time-series operators, part 7 (round 5): change detection and
series diagnostics — one-sided CUSUM change-point alarms, lag-1
autocorrelation, day-over-day top movers, and a weighted median.

Same series model as timeseries3–6 (events partitioned by user_id,
ordered (ts, event_id)); every double aggregate goes through exact
DECIMAL accumulation (ops.dsum rules) and every recurrence walks the
identical IEEE-754 op sequence as its DuckDB oracle so hashes match
bit-for-bit (the q_ewma_batch discipline).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# CUSUM drift reference (target + slack) and alarm threshold for the
# purchase-value series (mean ≈ 52): accumulate positive drift above
# 60, alarm when the accumulated excursion passes 150.
CUSUM_REF = 60.0
CUSUM_H = 150.0

_CUSUM_SCHEMA = "user_id bigint, ts string, event_id bigint, cusum double, alarm boolean"


def _cusum_partition(batches):
    """Partition-wise one-sided CUSUM: rows arrive hash-partitioned
    by user_id and sorted (user_id, ts, event_id); carry (user, s)
    across Arrow batch boundaries. The recurrence
    s_t = max(0, s_{t-1} + x_t − CUSUM_REF) is written exactly as the
    oracle's `greatest(0.0, cusum + value - 60.0)` so both engines
    walk the same IEEE-754 sequence — raw doubles out, no rounding
    (the q_ewma_batch bit-stability rule)."""
    cur_user, s = None, 0.0
    for pdf in batches:
        users = pdf["user_id"].to_list()
        vals = pdf["value"].to_list()
        out = []
        for u, x in zip(users, vals):
            if u != cur_user:
                s = 0.0
            s = max(0.0, s + float(x) - CUSUM_REF)
            cur_user = u
            out.append(s)
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "ts": pdf["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
                "event_id": pdf["event_id"],
                "cusum": out,
                "alarm": [v > CUSUM_H for v in out],
            }
        )


@query(
    "q_cusum_changepoints",
    oracle=f"""
    WITH RECURSIVE s AS (
      SELECT user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type = 'purchase'
    ), r AS (
      SELECT user_id, ts, event_id, rn,
             greatest(0.0, 0.0 + value - {CUSUM_REF}) AS cusum
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.ts, s.event_id, s.rn,
             greatest(0.0, r.cusum + s.value - {CUSUM_REF})
      FROM s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_id,
           cusum, cusum > {CUSUM_H} AS alarm
    FROM r
    """,
)
def q_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point detection per series (Page 1954,
    public): accumulate positive drift above a reference level, alarm
    when the cumulative excursion crosses the decision threshold —
    the classical upward-shift detector for metric streams.

    Like EWMA, the recurrence is inherently sequential per series, so
    it runs as repartition(user_id) + sortWithinPartitions +
    mapInPandas with (user, s) carried across Arrow batches: one
    Python call per ~10k-row batch, one shuffle, O(1) state per
    series — the high-cardinality recurrence shape (SCALING.md)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        ev.select("user_id", "ts", "event_id", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(_cusum_partition, _CUSUM_SCHEMA)
    )


AC_MIN_N = 10  # minimum lag-pairs per series


@query(
    "q_autocorr_lag1",
    oracle=f"""
    WITH p AS (
      SELECT user_id, value AS x, lead(value) OVER w AS y
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sums AS (
      SELECT user_id,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(20,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(20,4))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(30,8))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(30,8))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(30,8))) AS DOUBLE) AS syy
      FROM p WHERE y IS NOT NULL
      GROUP BY user_id HAVING COUNT(*) >= {AC_MIN_N}
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
           (n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS acf1
    FROM sums
    WHERE (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
    """,
)
def q_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per series (the first ACF coefficient —
    the standard is-this-series-white diagnostic): Pearson r between
    (x_t, x_{t+1}) pairs. All six sufficient statistics accumulate as
    exact DECIMALs (2-decimal inputs → 4/8-decimal products are
    exact), so partial aggregation cannot reorder float error; the
    final r is one double expression written identically to the
    oracle — bit-stable without rounding. One window + one groupBy on
    the series partitioning."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        "user_id",
        F.col("value").alias("x"),
        F.lead("value").over(w).alias("y"),
    ).filter(F.col("y").isNotNull())
    sums = (
        p.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.col("x").cast("decimal(20,4)")).cast("double").alias("sx"),
            F.sum(F.col("y").cast("decimal(20,4)")).cast("double").alias("sy"),
            F.sum((F.col("x") * F.col("y")).cast("decimal(30,8)")).cast("double").alias("sxy"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(30,8)")).cast("double").alias("sxx"),
            F.sum((F.col("y") * F.col("y")).cast("decimal(30,8)")).cast("double").alias("syy"),
        )
        .filter(F.col("n") >= AC_MIN_N)
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
    return sums.filter(den2 > 0).select(
        "user_id",
        n.cast("bigint").alias("n_pairs"),
        ((n * sxy - sx * sy) / F.sqrt(den2)).alias("acf1"),
    )


TOP_MOVERS_K = 20


@query(
    "q_top_movers",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS day_sum
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, date_trunc('day', ts)
    ), lagged AS (
      SELECT user_id, day, day_sum,
             lag(day_sum) OVER (PARTITION BY user_id ORDER BY day) AS prev_sum
      FROM daily
    )
    SELECT user_id, day, prev_sum, day_sum,
           (day_sum - prev_sum) / abs(prev_sum) AS pct_change
    FROM lagged
    WHERE prev_sum IS NOT NULL AND prev_sum <> 0
    ORDER BY abs((day_sum - prev_sum) / abs(prev_sum)) DESC, user_id, day
    LIMIT {TOP_MOVERS_K}
    """,
)
def q_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day top movers: per-series daily totals (exact
    DECIMAL sums), previous-active-day delta via lag, top {TOP_MOVERS_K}
    by absolute relative change with a deterministic (user, day)
    tiebreak. The daily reduce is the only corpus-sized shuffle; the
    lag window rides the same (user_id) partitioning; the top-k is a
    TakeOrdered, never a global sort materialization."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        "user_id", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("day_sum"))
    w = Window.partitionBy("user_id").orderBy("day")
    lagged = daily.withColumn("prev_sum", F.lag("day_sum").over(w)).filter(
        F.col("prev_sum").isNotNull() & (F.col("prev_sum") != 0)
    )
    pct = (F.col("day_sum") - F.col("prev_sum")) / F.abs(F.col("prev_sum"))
    return (
        lagged.select("user_id", "day", "prev_sum", "day_sum", pct.alias("pct_change"))
        .orderBy(F.abs(F.col("pct_change")).desc(), F.asc("user_id"), F.asc("day"))
        .limit(TOP_MOVERS_K)
    )


# Weighted-median shard width (price units per shard). TPC-H
# l_extendedprice spans ~[900, 105k] → ~200 shards at width 512; the
# shard count is bounded by the PRICE DOMAIN, not the data volume, so
# the phase-2 prefix-sum table stays tiny at any SF while the one
# crossing shard that reaches a WindowExec holds ~1/#shards of a
# flag's rows. Narrow the width to shrink that bounded slice further.
_WM_SHARD_WIDTH = 512


@query(
    "q_weighted_median",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_extendedprice,
             SUM(CAST(l_quantity AS DECIMAL(20,4))) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(CAST(l_quantity AS DECIMAL(20,4))) OVER (
               PARTITION BY l_returnflag) AS tot
      FROM lineitem
    )
    SELECT l_returnflag, MIN(l_extendedprice) AS weighted_median_price,
           CAST(MAX(tot) AS DOUBLE) AS total_qty
    FROM c WHERE 2 * cw >= tot GROUP BY l_returnflag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (50th weighted percentile): the
    quantity-weighted median extended price per return flag — the
    first cumulative-weight crossing of half the group total, on the
    fully deterministic ordering (price, orderkey, linenumber) so
    the crossing row is engine-independent; the crossing test
    `2·cw ≥ tot` stays in DECIMAL (no float half-total).

    100 TB plan (round-6 rewrite; the r5 form ran the cumulative
    window partitioned by l_returnflag — 3 distinct values, so every
    flag's entire lineitem slice sorted through ONE WindowExec task):
    the Gini-style value-range-sharded two-phase prefix sum
    (q_gini_concentration, analytics2.py). Rows shard by a fixed
    price bucket (shard id monotone in the ordering's leading key;
    equal prices land in the same shard, so shards partition the
    sort order). Phase 1 is a plain (flag, shard) groupBy — map-side
    combined, fully parallel, the only corpus-sized shuffle. Phase 2
    prefix-sums the TINY (flag, shard) weight table (bounded by the
    price domain, not the data volume) to find, per flag, the ONE
    shard whose cumulative weight crosses half the total. Only that
    crossing shard's rows — a bounded 1/#shards slice, tunable via
    _WM_SHARD_WIDTH — are re-scanned and sorted by the local
    cumulative window; every other row never reaches a WindowExec.
    Prices are monotone across shards, so the min-crossing-price
    within the crossing shard IS the global answer. Weights stay
    DECIMAL end-to-end; total_qty exact by the same sums."""
    from timestream_travel_spark.operators._sharded import (
        sharded_weighted_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem")
    qdec = F.col("l_quantity").cast("decimal(20,4)")
    shard = F.floor(F.col("l_extendedprice") / _WM_SHARD_WIDTH).cast("bigint")
    rows = li.select(
        "l_returnflag",
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        qdec.alias("qty"),
        shard.alias("shard"),
    )
    # the single-probe (1/2) case of the shared sharded machinery —
    # q_weighted_quantiles is the same helper with three probes
    cand = sharded_weighted_quantiles(
        rows,
        ["l_returnflag"],
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        [(1, 2, "p50")],
    )
    return cand.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("weighted_median_price"),
        F.max("tot").cast("double").alias("total_qty"),
    )


def _lttb_true_series(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """True LTTB (Steinarsson 2013) for ONE series, sequential by
    construction: the triangle anchor is the previously SELECTED
    point, not the prior bucket's centroid."""
    import pandas as pd

    pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    wk = pdf["ts"].dt.to_period("W-SUN").dt.start_time
    buckets = [g.index.to_list() for _, g in pdf.groupby(wk, sort=True)]
    xs = pdf["ts"].astype("int64").to_numpy() / 1e9
    ys = pdf["value"].to_numpy()
    if len(buckets) == 0:
        return pdf.iloc[0:0][["user_id", "ts", "event_id", "value"]]
    chosen = [buckets[0][0]]  # first point of first bucket
    for i in range(1, len(buckets) - 1):
        nxt = buckets[i + 1]
        cx, cy = xs[nxt].mean(), ys[nxt].mean()
        ax, ay = xs[chosen[-1]], ys[chosen[-1]]
        idx = buckets[i]
        # vectorized triangle areas for the whole bucket (numpy),
        # first-max argmax == the sequential scan's tie behavior
        areas = abs((ax - cx) * (ys[idx] - ay) - (ax - xs[idx]) * (cy - ay))
        chosen.append(idx[int(areas.argmax())])
    if len(buckets) > 1:
        chosen.append(buckets[-1][-1])  # last point of last bucket
    out = pdf.iloc[chosen]
    return pd.DataFrame(
        {
            "user_id": out["user_id"].astype("int64"),
            "ts": out["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
            "event_id": out["event_id"].astype("int64"),
            "value": out["value"].round(6),
        }
    )


LTTB_SERIES_CAP = 100  # the dashboard's selected-series bound


@query("q_lttb_true")
def q_lttb_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True LTTB plot downsampling (previous-SELECTED-point anchor —
    the exact Steinarsson 2013 recurrence, sequential per series), the
    fidelity twin of q_lttb_downsample's parallel centroid-anchor
    variant. Runs as applyInPandas per series: unlike the EWMA-family
    recurrences (millions of tiny groups → mapInPandas carry-state),
    plot downsampling is invoked for the bounded set of series a
    dashboard draws, so per-group pandas overhead is the right trade
    for the simpler whole-series walk — and the query enforces that
    bound (user_id < {LTTB_SERIES_CAP}: the dashboard's selected
    series; bucket areas are numpy-vectorized per bucket). Rows-only
    (sequential anchor has no SQL form); pytest replays the identical
    algorithm in pure Python and pins one-point-per-bucket + endpoint
    preservation."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .filter(F.col("user_id") < LTTB_SERIES_CAP)
        .select("user_id", "ts", "event_id", "value")
    )
    return ev.groupBy("user_id").applyInPandas(
        lambda pdf: _lttb_true_series(pdf),
        "user_id bigint, ts string, event_id bigint, value double",
    )
