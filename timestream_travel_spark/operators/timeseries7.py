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

from decimal import Decimal

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
    point, not the prior bucket's centroid.

    EXACT-INTEGER convention (rows-only→oracled conversion, r15):
    the float triangle area |(ax−cx)(y−ay) − (ax−x)(cy−ay)| with the
    next bucket's centroid (cx, cy) = (Σx/n, Σy/n) is multiplied
    through by n > 0 — argmax-invariant — so the score becomes the
    all-integer |(ax·n − Σx)(yq − ayq) − (ax − x)(Σyq − ayq·n)| on
    epoch-µs x and cent-quantized y (values are exact 2-decimals;
    FIXTURES.md). Python bigints here ≡ the oracle's DECIMAL(38,0)
    cross-products, so selection is bit-free exact in both engines;
    ties break first-in-series (ts, event_id asc), matching the
    oracle's row_number(area DESC, ts, event_id)."""
    import pandas as pd

    pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    us = (pdf["ts"].astype("int64") // 1000).to_list()  # epoch µs
    wk = [(u // 86_400_000_000 + 3) // 7 for u in us]  # Monday weeks
    yq = [
        int(Decimal(repr(float(v))) * 100) for v in pdf["value"]
    ]  # exact cents
    buckets: list[list[int]] = []
    for i, w in enumerate(wk):
        if buckets and wk[buckets[-1][0]] == w:
            buckets[-1].append(i)
        else:
            buckets.append([i])
    if len(buckets) == 0:
        return pdf.iloc[0:0][["user_id", "ts", "event_id", "value"]]
    chosen = [buckets[0][0]]  # first point of first bucket
    for i in range(1, len(buckets) - 1):
        nxt = buckets[i + 1]
        n = len(nxt)
        sx = sum(us[j] for j in nxt)
        sy = sum(yq[j] for j in nxt)
        aj = chosen[-1]
        ax, ay = us[aj], yq[aj]
        best_j, best_area = buckets[i][0], -1
        for j in buckets[i]:  # first-max == strict > in series order
            area = abs((ax * n - sx) * (yq[j] - ay) - (ax - us[j]) * (sy - ay * n))
            if area > best_area:
                best_area, best_j = area, j
        chosen.append(best_j)
    if len(buckets) > 1:
        chosen.append(buckets[-1][-1])  # last point of last bucket
    out = pdf.iloc[chosen]
    return pd.DataFrame(
        {
            "user_id": out["user_id"].astype("int64"),
            "ts": out["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
            "event_id": out["event_id"].astype("int64"),
            "value": out["value"],
        }
    )


LTTB_SERIES_CAP = 100  # the dashboard's selected-series bound

# The events fixture spans Jan 2024 = 5 Monday-start weeks at every
# SF, so per-series bucket counts B ≤ 5 → at most 3 middle buckets;
# the oracle unrolls exactly those three selection steps (selk
# handles middle rank k+1 for users with B ≥ k+2; the anchor chain
# sel(k-1) provably exists for them). A longer span unrolls more
# steps the same way.
_LTTB_PTS = f"""
      SELECT user_id, ts, event_id, value,
             epoch_us(ts) AS x,
             CAST(CAST(value AS DECIMAL(20,2)) * 100 AS BIGINT) AS yq,
             (epoch_us(ts) // 86400000000 + 3) // 7 AS wk
      FROM events
      WHERE event_type = 'purchase' AND user_id < {LTTB_SERIES_CAP}
"""


def _lttb_sel_step(k: int) -> str:
    """Unrolled middle-bucket selection step k: exact DECIMAL(38,0)
    n-scaled cross-product argmax over bucket rank k+1 against the
    previous selection and bucket rank k+2's sums."""
    anchor = "first_pt" if k == 1 else f"sel{k - 1}"
    return f"""sel{k} AS MATERIALIZED (
      SELECT user_id, ts, event_id, value, x, yq FROM (
        SELECT c.user_id, c.ts, c.event_id, c.value, c.x, c.yq,
               row_number() OVER (PARTITION BY c.user_id ORDER BY
                 abs((CAST(a.x AS DECIMAL(38,0))*g.n - g.sx)
                       *(c.yq - a.yq)
                     - CAST(a.x - c.x AS DECIMAL(38,0))
                       *(g.sy - CAST(a.yq AS DECIMAL(38,0))*g.n)) DESC,
                 c.ts, c.event_id) AS rn
        FROM rk c
        JOIN {anchor} a ON a.user_id = c.user_id
        JOIN agg g ON g.user_id = c.user_id AND g.b = {k + 2}
        WHERE c.b = {k + 1}
      ) WHERE rn = 1
    )"""


@query(
    "q_lttb_true",
    oracle=f"""
    WITH pts AS MATERIALIZED ({_LTTB_PTS}
    ), rk AS MATERIALIZED (
      SELECT p.*, dense_rank() OVER (PARTITION BY user_id ORDER BY wk) AS b
      FROM pts p
    ), nb AS MATERIALIZED (
      SELECT user_id, max(b) AS nb FROM rk GROUP BY user_id
    ), agg AS MATERIALIZED (
      SELECT user_id, b, count(*) AS n,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(yq AS DECIMAL(38,0))) AS sy
      FROM rk GROUP BY 1, 2
    ), first_pt AS MATERIALIZED (
      SELECT user_id, ts, event_id, value, x, yq FROM (
        SELECT rk.*, row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
        FROM rk WHERE b = 1
      ) WHERE rn = 1
    ), {_lttb_sel_step(1)}, {_lttb_sel_step(2)}, {_lttb_sel_step(3)},
    last_pt AS MATERIALIZED (
      SELECT r.user_id, r.ts, r.event_id, r.value FROM (
        SELECT rk.*, row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
        FROM rk JOIN nb USING (user_id) WHERE b = nb AND nb > 1
      ) r WHERE r.rn = 1
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           event_id, value
    FROM (
      SELECT user_id, ts, event_id, value FROM first_pt
      UNION ALL SELECT user_id, ts, event_id, value FROM sel1
      UNION ALL SELECT user_id, ts, event_id, value FROM sel2
      UNION ALL SELECT user_id, ts, event_id, value FROM sel3
      UNION ALL SELECT user_id, ts, event_id, value FROM last_pt
    )
    """,
)
def q_lttb_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True LTTB plot downsampling (previous-SELECTED-point anchor —
    the exact Steinarsson 2013 recurrence, sequential per series), the
    fidelity twin of q_lttb_downsample's parallel centroid-anchor
    variant. Runs as applyInPandas per series: plot downsampling is
    invoked for the bounded set of series a dashboard draws, and the
    query enforces that bound (user_id < {LTTB_SERIES_CAP}).

    Converted rows-only→oracled in r15 (VERDICT r14 next #4): the
    bucket argmax is redesigned to exact integer cross-product areas
    (n-scaled centroid — see _lttb_true_series), and the ≤3 middle
    selection steps of the 5-week fixture unroll in the oracle with
    the anchor chain first_pt → sel1 → sel2 → sel3; the last bucket
    contributes its endpoint for B > 1. Selection is integer-exact in
    both engines; `value` passes through as the raw parquet double."""
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
