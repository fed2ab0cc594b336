"""Time-series operators, part 8: state-space and symbolic methods —
a local-level Kalman filter, additive Holt-Winters (triple
exponential) smoothing, and SAX symbolization.

These complete the smoothing/forecasting ladder started in
timeseries2 (EWMA) and timeseries5 (Holt): Kalman adds
uncertainty-weighted gain (the gain adapts instead of being a fixed
alpha), Holt-Winters adds a seasonal component, and SAX (Lin et al.,
DMKD'07 — public algorithm) turns series into strings so
text-indexing machinery (the repo's inverted index / winnowing
fingerprints) applies to waveforms.

All recurrences follow the q_ewma_batch discipline: Spark runs them
as mapInPandas carry-state loops over hash-partitioned, in-partition
sorted series (one shuffle, O(state) memory per series); the DuckDB
oracle walks the IDENTICAL IEEE op sequence via a recursive CTE, and
outputs compare unrounded (round() itself is not cross-engine stable
— rounding would break the hash, raw bit-identical doubles don't).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# ---------------------------------------------------------------- Kalman

KF_Q = 0.05  # process-noise variance
KF_R = 1.0  # observation-noise variance

_KF_SCHEMA = (
    "user_id bigint, ts string, event_id bigint, level double, gain double"
)


def _kalman_partition(batches):
    """Local-level Kalman filter, partition-wise with (user, level,
    variance) carried across Arrow batches. Seeds: l_1 = x_1,
    P_1 = 1.0. Per step, EXACTLY the oracle's op order:
        Pp = P + 0.05
        K  = Pp / (Pp + 1.0)
        l  = l + K * (x - l)
        P  = (1.0 - K) * Pp
    """
    cur_user, lv, pv = None, 0.0, 1.0
    for pdf in batches:
        users = pdf["user_id"].to_list()
        vals = pdf["value"].to_list()
        levels, gains = [], []
        for u, x in zip(users, vals):
            if u != cur_user:
                lv, pv, k = x, 1.0, 0.0
            else:
                pp = pv + KF_Q
                k = pp / (pp + KF_R)
                lv = lv + k * (x - lv)
                pv = (1.0 - k) * pp
            cur_user = u
            levels.append(lv)
            gains.append(k)
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "ts": pdf["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
                "event_id": pdf["event_id"],
                "level": levels,
                "gain": gains,
            }
        )


@query(
    "q_kalman_filter",
    oracle=f"""
    WITH RECURSIVE s AS (
      SELECT user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type = 'purchase'
    ), r AS (
      SELECT user_id, ts, event_id, rn,
             value AS lv, CAST(1.0 AS DOUBLE) AS pv, CAST(0.0 AS DOUBLE) AS k
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.ts, s.event_id, s.rn,
             r.lv + ((r.pv + {KF_Q}) / ((r.pv + {KF_Q}) + {KF_R})) * (s.value - r.lv),
             (1.0 - ((r.pv + {KF_Q}) / ((r.pv + {KF_Q}) + {KF_R}))) * (r.pv + {KF_Q}),
             (r.pv + {KF_Q}) / ((r.pv + {KF_Q}) + {KF_R})
      FROM s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_id,
           lv AS level, k AS gain
    FROM r
    """,
)
def q_kalman_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-level (random-walk-plus-noise) Kalman filter per series.

    Where EWMA uses a FIXED alpha, the Kalman gain adapts: it starts
    high (uncertain prior) and settles to the steady-state ratio
    determined by Q/R — the principled version of "how much do I
    trust the new point". Same 100 TB shape as q_ewma_batch:
    repartition(user_id) + sortWithinPartitions + mapInPandas with
    two carried scalars; one shuffle, O(1) state per series.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        ev.select("user_id", "ts", "event_id", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(_kalman_partition, _KF_SCHEMA)
    )


# ----------------------------------------------------------- Holt-Winters

HW_PERIOD = 24  # hourly series, daily seasonality
# Gains sit inside the additive-HW stability region: the original
# (0.5, 0.3, 0.2) choice DIVERGED (seasonal amplitude grew ~e^t on a
# pure period-24 sine — caught by the seasonal-learning pytest, not
# the oracle, since both engines compute the same divergent doubles).
HWS_ALPHA = 0.3  # NB: written as inline literals in BOTH the Python
HWS_BETA = 0.05  # loop and the oracle SQL (the bit-parity contract);
HWS_GAMMA = 0.1  # change all three places together

_HW_SCHEMA = "hour string, x double, level double, trend double, seasonal double"


def _hw_partition(batches):
    """Additive Holt-Winters over ONE global hourly series (the
    caller coalesces to a single sorted partition — the series is an
    aggregate, bounded at one row per hour). State: level, trend and
    a 24-slot seasonal ring seeded to zeros; l_1 = x_1, b_1 = 0.
    Update order written EXACTLY as the oracle's recursive CTE:
        l = 0.3*(x - s_old) + 0.7*(l_prev + b_prev)
        b = 0.05*(l - l_prev) + 0.95*b_prev
        s = 0.1*(x - l) + 0.9*s_old
    where s_old is the seasonal value from PERIOD steps back.
    """
    first = True
    lv = tr = 0.0
    seas: list[float] = [0.0] * HW_PERIOD
    for pdf in batches:
        hours = pdf["hour"].to_list()
        vals = pdf["x"].to_list()
        levels, trends, seasonal = [], [], []
        for x in vals:
            s_old = seas.pop(0)
            if first:
                lv, tr = x, 0.0
                s_new = 0.1 * (x - lv) + 0.9 * s_old
                first = False
            else:
                prev = lv
                lv = 0.3 * (x - s_old) + 0.7 * (lv + tr)
                tr = 0.05 * (lv - prev) + 0.95 * tr
                s_new = 0.1 * (x - lv) + 0.9 * s_old
            seas.append(s_new)
            levels.append(lv)
            trends.append(tr)
            seasonal.append(s_new)
        yield pd.DataFrame(
            {
                "hour": hours,
                "x": vals,
                "level": levels,
                "trend": trends,
                "seasonal": seasonal,
            }
        )


@query(
    "q_holt_winters",
    oracle=f"""
    WITH RECURSIVE hourly AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), s AS (
      SELECT hour, x, row_number() OVER (ORDER BY hour) AS rn FROM hourly
    ), r AS (
      SELECT hour, x, rn,
             x AS lv, CAST(0.0 AS DOUBLE) AS tr,
             list_append(list_transform(range({HW_PERIOD - 1}),
                                        i -> CAST(0.0 AS DOUBLE)),
                         0.1 * (x - x) + 0.9 * 0.0) AS seas
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.hour, s.x, s.rn,
             0.3 * (s.x - r.seas[1]) + 0.7 * (r.lv + r.tr),
             0.05 * ((0.3 * (s.x - r.seas[1]) + 0.7 * (r.lv + r.tr)) - r.lv)
               + 0.95 * r.tr,
             list_append(
               r.seas[2:],
               0.1 * (s.x - (0.3 * (s.x - r.seas[1]) + 0.7 * (r.lv + r.tr)))
                 + 0.9 * r.seas[1])
      FROM s JOIN r ON s.rn = r.rn + 1
    )
    SELECT hour, x, lv AS level, tr AS trend, seas[{HW_PERIOD}] AS seasonal
    FROM r
    """,
)
def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (level + trend + daily seasonality) on
    the global hourly event-count series.

    The aggregation (events → one row per hour) is the distributed
    100 TB work; the recurrence then runs over the bounded aggregate
    series in a single sorted partition with an O(24) seasonal ring —
    the same aggregate-then-iterate shape as q_nation_pagerank.
    Oracle: recursive CTE carrying (level, trend, 24-slot seasonal
    LIST) through the identical IEEE op sequence; compared unrounded.
    """
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            )
        )
        .agg(F.count("*").cast("double").alias("x"))
    )
    return (
        hourly.coalesce(1)
        .sortWithinPartitions("hour")
        .mapInPandas(_hw_partition, _HW_SCHEMA)
    )


# ------------------------------------------------------------------- SAX

SAX_BP_LO = -0.6745  # ~25th pct of N(0,1); identical literal both engines
SAX_BP_HI = 0.6745


@query(
    "q_sax_symbols",
    oracle=f"""
    WITH stats AS (
      SELECT user_id,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS mu,
             sqrt(
               CAST(SUM(CAST(value * value AS DECIMAL(24,8))) AS DOUBLE)
                 / COUNT(*)
               - (CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*))
                 * (CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*))
             ) AS sigma
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ), paa AS (
      SELECT e.user_id,
             strftime(date_trunc('day', e.ts), '%Y-%m-%d') AS day,
             CAST(floor(extract(hour FROM e.ts) / 6) AS INT) AS seg,
             CAST(SUM(CAST(e.value AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*)
               AS seg_avg
      FROM events e WHERE e.event_type = 'purchase'
      GROUP BY e.user_id, 2, 3
    ), symbols AS (
      SELECT p.user_id, p.day, p.seg,
             CASE
               WHEN s.sigma = 0 THEN 'b'
               WHEN (p.seg_avg - s.mu) / s.sigma < {SAX_BP_LO} THEN 'a'
               WHEN (p.seg_avg - s.mu) / s.sigma < 0.0 THEN 'b'
               WHEN (p.seg_avg - s.mu) / s.sigma < {SAX_BP_HI} THEN 'c'
               ELSE 'd'
             END AS sym
      FROM paa p JOIN stats s ON p.user_id = s.user_id
    )
    SELECT user_id, day,
           string_agg(sym, '' ORDER BY seg) AS sax
    FROM symbols
    GROUP BY user_id, day
    """,
)
def q_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization: each (user, day) becomes a 1-4 char string
    over alphabet a-d — PAA (6-hour segment means) of the
    per-user z-normalized purchase series mapped through fixed N(0,1)
    breakpoints. Series-as-string unlocks the corpus machinery
    (inverted index, winnowing, n-gram dedup) for waveform data.

    100 TB shape: two groupBy passes (per-user moments, per-segment
    means) + a per-user stats join that AQE broadcasts; no windows,
    no Python. Hash-stability: moments and segment means accumulate
    in DECIMAL; the z-score division and breakpoint compares are
    identical IEEE ops on both engines; symbols are discrete so the
    output hash is exact.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value")
    )
    dval = F.col("value").cast("decimal(20,6)")
    dval2 = (F.col("value") * F.col("value")).cast("decimal(24,8)")
    mu = F.sum(dval).cast("double") / F.count("*")
    stats = ev.groupBy("user_id").agg(
        mu.alias("mu"),
        F.sqrt(
            F.sum(dval2).cast("double") / F.count("*") - mu * mu
        ).alias("sigma"),
    )
    paa = ev.groupBy(
        "user_id",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.floor(F.hour("ts") / 6).cast("int").alias("seg"),
    ).agg((F.sum(dval).cast("double") / F.count("*")).alias("seg_avg"))
    z = (F.col("seg_avg") - F.col("mu")) / F.col("sigma")
    sym = (
        F.when(F.col("sigma") == 0, F.lit("b"))
        .when(z < SAX_BP_LO, F.lit("a"))
        .when(z < 0.0, F.lit("b"))
        .when(z < SAX_BP_HI, F.lit("c"))
        .otherwise(F.lit("d"))
    )
    return (
        paa.join(stats, "user_id")
        .select("user_id", "day", "seg", sym.alias("sym"))
        .groupBy("user_id", "day")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("seg", "sym"))).getField("sym")
            ).alias("sax")
        )
    )


# ---------------------------------------------------- cross-correlation

XCORR_MAX_LAG = 6  # hours, both directions


@query(
    "q_xcorr_lags",
    oracle=f"""
    WITH c AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, COUNT(*) AS x
      FROM events WHERE event_type = 'click' GROUP BY 1
    ), p AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, COUNT(*) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), lags AS (
      SELECT unnest(range(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG + 1})) AS lag
    ), m AS (
      SELECT lags.lag, c.x, p.y
      FROM c CROSS JOIN lags
      JOIN p ON p.h = c.h + lags.lag
    ), sums AS (
      SELECT lag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM m GROUP BY lag
    )
    SELECT lag, CAST(n AS BIGINT) AS n_hours,
           (n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS xcorr
    FROM sums
    WHERE (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
    ORDER BY lag
    """,
)
def q_xcorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the hourly click and purchase
    count series (lead/lag discovery: 'do clicks predict purchases N
    hours later?') — Pearson r on the overlapping hour grid at every
    lag in ±{XCORR_MAX_LAG}h.

    100 TB shape: two hourly reduces shrink the corpus to bounded
    grids; the lag fan-out is a 13x multiply of the SMALL series (not
    the corpus) followed by an equi-join on shifted hour keys and a
    13-group aggregate. Sufficient statistics are integer sums
    (counts), exact under any partial-agg order; the final r is one
    double expression written identically to the oracle."""
    ev = load_table(spark, sf_dir, "events")
    h = F.floor(F.unix_timestamp("ts") / 3600).cast("bigint")
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(h.alias("h"))
        .agg(F.count("*").alias("x"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(h.alias("h"))
        .agg(F.count("*").alias("y"))
    )
    m = c.select(
        F.col("h").alias("ch"),
        "x",
        F.explode(
            F.sequence(F.lit(-XCORR_MAX_LAG), F.lit(XCORR_MAX_LAG))
        ).alias("lag"),
    ).join(p, p.h == F.col("ch") + F.col("lag"))
    sums = m.groupBy("lag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
    return (
        sums.filter(den2 > 0)
        .select(
            "lag",
            n.cast("bigint").alias("n_hours"),
            ((n * sxy - sx * sy) / F.sqrt(den2)).alias("xcorr"),
        )
        .orderBy("lag")
    )
