"""Time-series operators, part 5: sequential-recurrence smoothing
(EWMA), robust MAD anomaly detection, largest-triangle plot
downsampling, and a fully JVM-side linear trend fit.

These four round out the series-analytics family the reference's
domain (Amazon Timestream's query functions; cmd/backup.go:240-257
ships raw SQL to that engine) implies: smoothing, outlier scoring,
visualization downsampling, and trend estimation. Each keys the same
(user_id, ts) series model as timeseries3/4 and states its 100 TB
shape in the docstring.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.ops import ts_str
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

EWMA_ALPHA = 0.3  # smoothing factor; decay 1-alpha

_EWMA_SCHEMA = "user_id bigint, ts string, event_id bigint, ewma double"


def _ewma_partition(batches):
    """Partition-wise EWMA: rows arrive hash-partitioned by user_id
    and sorted (user_id, ts, event_id), so each series is a
    contiguous run; carry (user, prev) across Arrow batch boundaries.
    The recurrence s_t = s_{t-1}*(1-a) + a*x_t (seed s_1 = x_1) is
    written EXACTLY as the oracle's SQL (`prev * 0.7 + 0.3 * x`) so
    both engines walk the same IEEE-754 op sequence and produce
    bit-identical doubles.

    raw doubles out, NO rounding anywhere: the recurrence matches
    bit-for-bit, while round() itself is NOT cross-engine stable at
    shortest-repr half boundaries (Spark rounds the decimal shortest
    form, DuckDB the scaled binary) — with 2-decimal inputs the
    recurrence lands on such halves often enough to flip hashes."""
    cur_user, prev = None, 0.0
    for pdf in batches:
        users = pdf["user_id"].to_list()
        vals = pdf["value"].to_list()
        out = []
        for u, x in zip(users, vals):
            prev = x if u != cur_user else prev * 0.7 + 0.3 * x
            cur_user = u
            out.append(prev)
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "ts": pdf["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
                "event_id": pdf["event_id"],
                "ewma": out,
            }
        )


@query(
    "q_ewma_batch",
    oracle="""
    WITH RECURSIVE s AS (
      SELECT user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type = 'purchase'
    ), r AS (
      SELECT user_id, ts, event_id, rn, value AS ewma
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.ts, s.event_id, s.rn,
             r.ewma * 0.7 + 0.3 * s.value
      FROM s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           event_id, ewma
    FROM r
    """,
)
def q_ewma_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch exponentially-weighted moving average per series — the
    batch twin of streaming/ewma.py's applyInPandasWithState job.

    A general first-order recurrence has no closed JVM-window form
    that survives long series (the closed form needs (1-a)^-i factors
    that overflow past ~700 samples), so it must run as a sequential
    walk per series. NOT `applyInPandas`, though: with millions of
    short series that pays per-GROUP Python/pandas overhead (measured
    5.7 s at sf0.1 — the slowest query in the bench). The
    many-small-groups shape is repartition(user_id) +
    sortWithinPartitions + `mapInPandas` with (user, prev) carried
    across Arrow batch boundaries: one Python call per BATCH (~10k
    rows), not per series, same one-shuffle cost profile and O(1)
    state. The oracle is a DuckDB recursive CTE walking the identical
    recurrence."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        ev.select("user_id", "ts", "event_id", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(_ewma_partition, _EWMA_SCHEMA)
    )


MAD_K = 1.4826  # normal-consistency constant
MAD_SIGMA = 3.0  # flag beyond 3 robust sigmas


@query(
    "q_mad_anomaly",
    oracle=f"""
    WITH m AS (
      SELECT user_id, quantile_cont(value, 0.5) AS med
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), d AS (
      SELECT e.user_id, e.ts, e.event_id, e.value,
             abs(e.value - m.med) AS dev
      FROM events e JOIN m USING (user_id)
      WHERE e.event_type = 'purchase'
    ), md AS (
      SELECT user_id, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY user_id
    )
    SELECT d.user_id, strftime(d.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           d.event_id, round(d.value, 6) AS value,
           round(d.dev / ({MAD_K} * md.mad), 4) AS robust_z
    FROM d JOIN md USING (user_id)
    WHERE md.mad > 1e-9 AND d.dev / ({MAD_K} * md.mad) > {MAD_SIGMA}
    """,
)
def q_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: score each sample by its deviation
    from the per-series MEDIAN in units of 1.4826×MAD (median absolute
    deviation) — the outlier test that, unlike z-scores, is not itself
    dragged by the outliers it hunts.

    Two exact-percentile aggregations and two joins, ALL keyed on
    user_id: at scale the first shuffle establishes the partitioning
    and every later stage reuses it, so the plan costs one exchange.
    Output is alert-sized (violations only)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
    )
    med = ev.groupBy("user_id").agg(F.percentile("value", 0.5).alias("med"))
    d = ev.join(med, "user_id").withColumn("dev", F.abs(F.col("value") - F.col("med")))
    mad = d.groupBy("user_id").agg(F.percentile("dev", 0.5).alias("mad"))
    z = F.col("dev") / (F.lit(MAD_K) * F.col("mad"))
    return (
        d.join(mad, "user_id")
        .filter((F.col("mad") > 1e-9) & (z > MAD_SIGMA))
        .select(
            "user_id",
            ts_str("ts", "ts"),
            "event_id",
            F.round("value", 6).alias("value"),
            F.round(z, 4).alias("robust_z"),
        )
    )


@query(
    "q_lttb_downsample",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id, value,
             date_trunc('week', ts) AS wk,
             CAST(epoch_us(ts) AS DOUBLE) / 1000000.0 AS x
      FROM events WHERE event_type = 'purchase'
    ), b AS (
      SELECT user_id, wk,
             CAST(SUM(CAST(x AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*) AS bx,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS by
      FROM p GROUP BY user_id, wk
    ), a AS (
      SELECT user_id, wk,
             lag(bx)  OVER w AS ax, lag(by)  OVER w AS ay,
             lead(bx) OVER w AS cx, lead(by) OVER w AS cy
      FROM b WINDOW w AS (PARTITION BY user_id ORDER BY wk)
    ), scored AS (
      SELECT p.user_id, p.ts, p.event_id, p.value,
             row_number() OVER (
               PARTITION BY p.user_id, p.wk
               ORDER BY (CASE WHEN a.ax IS NULL THEN -p.x
                              WHEN a.cx IS NULL THEN p.x
                              ELSE abs((a.ax - a.cx) * (p.value - a.ay)
                                       - (a.ax - p.x) * (a.cy - a.ay)) END) DESC,
                        p.ts, p.event_id) AS rk
      FROM p JOIN a ON p.user_id = a.user_id AND p.wk = a.wk
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           event_id, round(value, 6) AS value
    FROM scored WHERE rk = 1
    """,
)
def q_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plot downsampling, largest-triangle bucketed variant (LTTB
    family, Steinarsson 2013): one representative point per
    (series, week) — the point subtending the largest triangle
    against the NEIGHBOR buckets' centroids; edge buckets keep their
    first/last sample so series endpoints survive, as in true LTTB.
    (True LTTB anchors on the previously SELECTED point, a sequential
    dependency; anchoring on bucket centroids is its standard
    parallel/streamable approximation.)

    Scale shape: bucket centroids are one agg, anchors one window
    over ~weeks-per-series rows, selection one window over the
    points — all partitioned by user_id, one exchange. Output is
    |series|×|buckets| no matter how many raw points: exactly what a
    dashboard needs from a 100 TB store."""
    p = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            "event_id",
            "value",
            F.date_trunc("week", "ts").alias("wk"),
            (F.unix_micros("ts").cast("double") / F.lit(1e6)).alias("x"),
        )
    )
    b = p.groupBy("user_id", "wk").agg(
        (F.sum(F.col("x").cast("decimal(24,6)")).cast("double") / F.count("*")).alias("bx"),
        (F.sum(F.col("value").cast("decimal(20,6)")).cast("double") / F.count("*")).alias(
            "by"
        ),
    )
    wb = Window.partitionBy("user_id").orderBy("wk")
    a = b.select(
        "user_id",
        "wk",
        F.lag("bx").over(wb).alias("ax"),
        F.lag("by").over(wb).alias("ay"),
        F.lead("bx").over(wb).alias("cx"),
        F.lead("by").over(wb).alias("cy"),
    )
    j = p.join(a, ["user_id", "wk"])
    area = F.abs(
        (F.col("ax") - F.col("cx")) * (F.col("value") - F.col("ay"))
        - (F.col("ax") - F.col("x")) * (F.col("cy") - F.col("ay"))
    )
    sort_key = (
        F.when(F.col("ax").isNull(), -F.col("x"))
        .when(F.col("cx").isNull(), F.col("x"))
        .otherwise(area)
    )
    wsel = Window.partitionBy("user_id", "wk").orderBy(
        sort_key.desc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        j.withColumn("rk", F.row_number().over(wsel))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            ts_str("ts", "ts"),
            "event_id",
            F.round("value", 6).alias("value"),
        )
    )


X0_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in epoch micros


@query(
    "q_series_trend_native",
    oracle=f"""
    WITH s AS (
      SELECT user_id,
             CAST(epoch_us(ts) - {X0_US} AS DOUBLE) / 1000000.0 AS x,
             value AS y
      FROM events WHERE event_type = 'purchase'
    ), m AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(24,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(20,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(30,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(30,6))) AS DOUBLE) AS syy
      FROM s GROUP BY user_id
    )
    SELECT user_id, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx) * 86400.0, 6)
             AS slope_per_day,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
             AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM m
    WHERE n >= 3 AND (n * sxx - sx * sx) > 1e-9 AND (n * syy - sy * sy) > 1e-9
    """,
)
def q_series_trend_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series least-squares trend (slope/intercept/R²) computed
    ENTIRELY JVM-side from DECIMAL-accumulated power sums — the
    whole-stage-codegen twin of q_applyinpandas_slope (udf_queries.py),
    which exists to exercise the Python grouped-map surface. UDFs are
    the slow path; this is how the trend fit should actually run at
    100 TB: one hash aggregation, six numbers per series, no Python.

    x is centered on 2024-01-01 (epoch-micros offset, integer
    subtraction before the double divide) so x² sums stay small and
    both engines' doubles match bit-for-bit; the built-in regr_*
    aggregates accumulate co-moments in engine-specific order, which
    is exactly what the decimal sums avoid."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    s = ev.select(
        "user_id",
        ((F.unix_micros("ts") - F.lit(X0_US)).cast("double") / F.lit(1e6)).alias("x"),
        F.col("value").alias("y"),
    )
    m = s.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(24,6)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(20,6)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(30,6)")).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(30,4)")).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(30,6)")).cast("double").alias("syy"),
    )
    det_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    det_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = cov / det_x
    return (
        m.filter((F.col("n") >= 3) & (det_x > 1e-9) & (det_y > 1e-9))
        .select(
            "user_id",
            "n",
            F.round(slope * F.lit(86400.0), 6).alias("slope_per_day"),
            F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias(
                "intercept"
            ),
            F.round(cov * cov / (det_x * det_y), 6).alias("r2"),
        )
    )


HW_ALPHA = 0.5  # level smoothing
HW_BETA = 0.3  # trend smoothing

_HOLT_SCHEMA = "user_id bigint, ts string, event_id bigint, level double, trend double, forecast double"


def _holt_partition(batches):
    """Holt double-exponential smoothing (level + linear trend),
    partition-wise with (user, level, trend) carried across Arrow
    batches — the same carry-state shape as _ewma_partition. Seeds:
    l_1 = x_1, b_1 = 0. Update order written EXACTLY as the oracle's
    recursive CTE:
        l = 0.5*x + 0.5*(l_prev + b_prev)
        b = 0.3*(l - l_prev) + 0.7*b_prev
    so both engines produce bit-identical doubles (no rounding
    anywhere — the q_ewma_batch lesson)."""
    cur_user, lv, tr = None, 0.0, 0.0
    for pdf in batches:
        users = pdf["user_id"].to_list()
        vals = pdf["value"].to_list()
        levels, trends, fcasts = [], [], []
        for u, x in zip(users, vals):
            if u != cur_user:
                lv, tr = x, 0.0
            else:
                prev = lv
                lv = 0.5 * x + 0.5 * (lv + tr)
                tr = 0.3 * (lv - prev) + 0.7 * tr
            cur_user = u
            levels.append(lv)
            trends.append(tr)
            fcasts.append(lv + tr)
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "ts": pdf["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
                "event_id": pdf["event_id"],
                "level": levels,
                "trend": trends,
                "forecast": fcasts,
            }
        )


@query(
    "q_holt_smoothing",
    oracle="""
    WITH RECURSIVE s AS (
      SELECT user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type = 'purchase'
    ), r AS (
      SELECT user_id, ts, event_id, rn,
             value AS lv, CAST(0.0 AS DOUBLE) AS tr
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.ts, s.event_id, s.rn,
             0.5 * s.value + 0.5 * (r.lv + r.tr),
             0.3 * ((0.5 * s.value + 0.5 * (r.lv + r.tr)) - r.lv) + 0.7 * r.tr
      FROM s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_id,
           lv AS level, tr AS trend, lv + tr AS forecast
    FROM r
    """,
)
def q_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing per series: EWMA's
    trend-aware big sibling — level tracks the signal, trend tracks
    its drift, level+trend is the one-step forecast (the lightweight
    per-series forecaster a monitoring engine runs on every metric).

    Same scale shape as q_ewma_batch: repartition(user_id) +
    sortWithinPartitions + mapInPandas with two carried scalars per
    series; one shuffle, one Python call per Arrow batch, O(1) state.
    Oracle: recursive CTE carrying (level, trend) through the
    identical IEEE op sequence; compared unrounded."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        ev.select("user_id", "ts", "event_id", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(_holt_partition, _HOLT_SCHEMA)
    )
