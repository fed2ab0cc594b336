"""Time-series operators, part 4: the rest of the Timestream
query-function family — rate of change (DERIVATIVE), trapezoidal
integral (INTEGRAL), rolling z-score anomaly flags, and cross-series
correlation — re-expressed as window/aggregate compositions.

All four key on the same (user_id | day) partitionings the engine's
other series ops use, and every double aggregate goes through exact
DECIMAL accumulation (ops.dsum rules) so partial-aggregation order
can never flip a hash against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.ops import ts_str
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_series_derivative",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, value,
             lead(value) OVER w AS v1,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur_us
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           (v1 - value) / (CAST(dur_us AS DOUBLE) / 1000000.0)
             AS rate_per_s
    FROM s WHERE dur_us IS NOT NULL AND dur_us > 0
    """,
)
def q_series_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series rate of change (Timestream DERIVATIVE): value delta
    to the NEXT sample over elapsed seconds. One window pass on the
    (user_id, ts) ordering every other series op already uses —
    pipelines onto the existing exchange at scale.

    The rate is emitted as the RAW IEEE-754 quotient (like
    q_ewma_batch / q_holt_smoothing): both engines evaluate the same
    double subtraction and division on identical inputs, so the bits
    match exactly, whereas round(x, 6) on a double is not
    cross-engine stable at decimal half boundaries (Spark rounds the
    exact BigDecimal expansion HALF_UP; DuckDB rounds in binary)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur_us = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
    rate = (F.lead("value").over(w) - F.col("value")) / (
        dur_us.cast("double") / F.lit(1e6)
    )
    return (
        ev.select(
            "user_id",
            ts_str("ts", "ts"),
            dur_us.alias("dur_us"),
            rate.alias("rate_per_s"),
        )
        .filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
        .drop("dur_us")
    )


@query(
    "q_series_auc",
    oracle="""
    WITH s AS (
      SELECT user_id, CAST(value AS DECIMAL(12,4)) AS v0,
             CAST(lead(value) OVER w AS DECIMAL(12,4)) AS v1,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur_us
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(CAST(SUM(CAST((v0 + v1) * dur_us AS DECIMAL(38,4)))
                     AS VARCHAR) AS DOUBLE) / 2000000.0 AS auc,
           CAST(COUNT(*) AS BIGINT) AS n_segments
    FROM s WHERE dur_us IS NOT NULL AND dur_us > 0
    GROUP BY user_id
    """,
)
def q_series_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trapezoidal integral per series (Timestream INTEGRAL): each
    adjacent sample pair contributes mean-value × elapsed-seconds;
    segment areas accumulate as DECIMAL for order-independence. Same
    single-window shape as the derivative."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur_us = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
    # EXACT decimal arithmetic end-to-end: (v0+v1)·dur_us has no
    # intermediate double, so there is no double→decimal cast to land
    # on a shortest-repr half boundary (at sf0.1 the old
    # area-as-double formulation flipped the 6th decimal on one row
    # per engine). The single /2e6 happens once, in double, AFTER the
    # exact sum crosses engines via the dsum VARCHAR bridge.
    v0 = F.col("value").cast("decimal(12,4)")
    v1 = F.lead("value").over(w).cast("decimal(12,4)")
    seg = ev.select(
        "user_id",
        dur_us.alias("dur_us"),
        ((v0 + v1) * dur_us).alias("area_u"),
    ).filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
    return seg.groupBy("user_id").agg(
        (
            F.sum(F.col("area_u").cast("decimal(38,4)")).cast("double")
            / F.lit(2000000.0)
        ).alias("auc"),
        F.count("*").cast("bigint").alias("n_segments"),
    )


ZS_WIN = 3  # ±3 rows → 7-sample rolling frame


@query(
    "q_rolling_zscore",
    oracle=f"""
    WITH s AS (
      SELECT user_id, ts, event_id, value,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) OVER w AS DOUBLE) AS s1,
             CAST(SUM(CAST(value * value AS DECIMAL(30,12))) OVER w AS DOUBLE) AS s2
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ZS_WIN} PRECEDING AND {ZS_WIN} FOLLOWING)
    )
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           round((value - s1 / n)
                 / sqrt((s2 - s1 * s1 / n) / (n - 1)), 4) AS z
    FROM s
    WHERE n >= 4 AND (s2 - s1 * s1 / n) / (n - 1) > 1e-12
    """,
)
def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly signal: each sample scored against the
    mean/std of its ±{ZS_WIN}-row neighborhood. Variance derives from
    DECIMAL-accumulated Σx and Σx² — NOT stddev_samp, whose
    Welford-style accumulation differs across engines in the last
    ulp. The ORDER BY inside the frame makes the window sums exact
    decimals, so both engines compute bit-identical doubles."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZS_WIN, ZS_WIN)
    )
    n = F.count("*").over(w).cast("bigint")
    s1 = F.sum(F.col("value").cast("decimal(20,6)")).over(w).cast("double")
    s2 = F.sum((F.col("value") * F.col("value")).cast("decimal(30,12)")).over(w).cast(
        "double"
    )
    scored = ev.select(
        "user_id",
        ts_str("ts", "ts"),
        "value",
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return (
        scored.filter((F.col("n") >= 4) & (var > 1e-12))
        .select(
            "user_id",
            "ts",
            F.round(
                (F.col("value") - F.col("s1") / F.col("n")) / F.sqrt(var), 4
            ).alias("z"),
        )
    )


@query(
    "q_series_correlation",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS DOUBLE) AS x,
             CAST(SUM(CAST(value AS DECIMAL(20,6)))
                  FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS y
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(20,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(30,8))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(30,8))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(30,8))) AS DOUBLE) AS syy
      FROM daily WHERE y IS NOT NULL
    )
    SELECT n AS n_days,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
             AS click_purchase_corr
    FROM m
    """,
)
def q_series_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between the daily click count and the
    daily purchase-value total (Timestream CORR over aligned series).
    Two stacked aggregations, both through DECIMAL sums — corr()
    built-ins accumulate co-moments in double and disagree across
    engines in the last ulp, so the moments are assembled manually."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).cast("double").alias("x"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).cast(
                "decimal(20,6)"
            )
        )
        .cast("double")
        .alias("y"),
    )
    m = daily.filter(F.col("y").isNotNull()).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(20,6)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(20,6)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(30,8)")).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(30,8)")).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(30,8)")).cast("double").alias("syy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        F.col("n").alias("n_days"), F.round(corr, 6).alias("click_purchase_corr")
    )


GAP_THRESHOLD_S = 86_400  # report gaps longer than a day


@query(
    "q_series_gaps",
    oracle=f"""
    WITH s AS (
      SELECT user_id, ts, lead(ts) OVER w AS nxt,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur_us
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS gap_start,
           strftime(nxt, '%Y-%m-%d %H:%M:%S') AS gap_end,
           round(CAST(dur_us AS DOUBLE) / 1000000.0, 3) AS gap_s
    FROM s WHERE dur_us > {GAP_THRESHOLD_S} * 1000000::BIGINT
    """,
)
def q_series_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-gap detection: adjacent-sample intervals longer than
    the threshold — the monitoring query behind 'is this series still
    reporting?'. Same lead window as the derivative; emits only the
    violating intervals, so output is alert-sized."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    dur_us = F.unix_micros(nxt) - F.unix_micros("ts")
    return (
        ev.select(
            "user_id",
            ts_str("ts", "gap_start"),
            ts_str(nxt, "gap_end"),
            dur_us.alias("dur_us"),
        )
        .filter(F.col("dur_us") > GAP_THRESHOLD_S * 1_000_000)
        .select(
            "user_id",
            "gap_start",
            "gap_end",
            F.round(F.col("dur_us").cast("double") / F.lit(1e6), 3).alias("gap_s"),
        )
    )


@query(
    "q_ohlc_bars",
    oracle="""
    WITH s AS (
      SELECT user_id, date_trunc('day', ts) AS day, value,
             first_value(value) OVER w AS open,
             last_value(value) OVER w AS close
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts)
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           round(min(open), 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(min(close), 6) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM s GROUP BY user_id, day
    """,
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per (user, day) via first_value/last_value
    over the full frame — the windowed-navigation formulation, vs
    q_ohlc_hourly (timeseries2.py) which keys (event_type, hour) and
    extracts open/close by row_number flags inside the aggregation.
    Both are engine-portable where composite-key arg_min is not;
    keeping both pins the two standard physical shapes for this
    downsample. Window and groupBy share the (user_id, day)
    partitioning: one shuffle total."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    day = F.date_trunc("day", "ts")
    w = (
        Window.partitionBy("user_id", day)
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    s = ev.select(
        "user_id",
        day.alias("day"),
        "value",
        F.first("value").over(w).alias("open"),
        F.last("value").over(w).alias("close"),
    )
    return s.groupBy("user_id", F.date_format("day", "yyyy-MM-dd").alias("day")).agg(
        F.round(F.min("open"), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.min("close"), 6).alias("close"),
        F.count("*").cast("bigint").alias("n_ticks"),
    )


@query(
    "q_skewness_moments",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value * value AS DECIMAL(30,10))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(value * value * value AS DECIMAL(38,8))) AS DOUBLE) AS s3
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           round(s1 / n, 6) AS mean,
           round((s2 - s1 * s1 / n) / n, 6) AS var_pop,
           round(((s3 - 3 * (s1 / n) * s2) / n + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / pow((s2 - s1 * s1 / n) / n, 1.5), 6) AS skewness
    FROM m
    """,
)
def q_skewness_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population mean/variance/skewness per event type from raw
    power sums (m3 identity: E[(x−μ)³] = (Σx³ − 3μΣx²)/n + 2μ³).
    The built-in skewness() aggregates central moments in double with
    engine-specific update order — raw DECIMAL power sums make both
    engines derive identical doubles, the same trick as the rolling
    z-score. One hash aggregation; five numbers per group."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    m = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(v.cast("decimal(20,6)")).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(30,10)")).cast("double").alias("s2"),
        F.sum((v * v * v).cast("decimal(38,8)")).cast("double").alias("s3"),
    )
    mu = F.col("s1") / F.col("n")
    var_pop = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n")
    m3 = (F.col("s3") - 3 * mu * F.col("s2")) / F.col("n") + 2 * mu * mu * mu
    return m.select(
        "event_type",
        "n",
        F.round(mu, 6).alias("mean"),
        F.round(var_pop, 6).alias("var_pop"),
        F.round(m3 / F.pow(var_pop, F.lit(1.5)), 6).alias("skewness"),
    )
