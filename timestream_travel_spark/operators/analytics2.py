"""Product & financial analytics, part 2 (round 5, wave 3): session
Markov transitions, a window-expressible RSI momentum indicator,
a Benford first-digit audit, and a Gini revenue-concentration
coefficient.

Reference parity: the reference (mgjules/timestream-travel) delegates
analytics SQL to its backing store; these are the event-stream /
order-book analytics a user of that store would run on the same
tables, re-expressed as Catalyst-optimizable DataFrame plans
(SURVEY.md §2 Part B.9 extended surface).

Float discipline follows the repo-wide rules (ops.py): every
aggregated double accumulates in DECIMAL and crosses to double
through one cast (VARCHAR bridge on the DuckDB side where magnitude
can exceed double precision); shared irrational constants are emitted
once as Python literals embedded in BOTH engines' plans so no libm
call has to agree cross-engine.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

from timestream_travel_spark.operators.timeseries import (  # noqa: E402
    SESSION_GAP_S,
    sessionized,
)


@query(
    "q_session_transitions",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
                    > {SESSION_GAP_S}
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    ), tr AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id, session_id
                                   ORDER BY ts, event_id) AS prev_type,
             event_type AS next_type
      FROM sessions
    ), counted AS (
      SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM tr WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n,
           CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type) AS p
    FROM counted
    """,
)
def q_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behaviour:
    within each 30-minute-gap session (exact q_sessionize semantics),
    count consecutive event-type pairs and normalize per source state
    — the 'what do users do after an error' table behind funnel and
    next-action models.

    Scale shape: ONE shuffle on user_id serves both windows (the
    session running-sum and the lag — same partitioning, Catalyst
    reuses the sort); the transition count is a map-side-combinable
    groupBy on a 25-cell key space, and the probability normalizer is
    a window over that bounded matrix, not the event table. The
    probability is an exact bigint/bigint double division —
    cross-engine stable without quantization."""
    ev = load_table(spark, sf_dir, "events")
    sess = sessionized(ev, "event_type")
    ws = Window.partitionBy("user_id", "session_id").orderBy(F.asc("ts"), F.asc("event_id"))
    tr = sess.select(
        F.lag("event_type").over(ws).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counted = tr.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wnorm = Window.partitionBy("prev_type")
    return counted.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wnorm)).alias("p"),
    )


RSI_PERIOD = 14


@query(
    "q_rsi_indicator",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             SUM(CAST(value AS DECIMAL(20,4))) AS v
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ), delta AS (
      SELECT event_type, day,
             v - lag(v) OVER (PARTITION BY event_type ORDER BY day) AS d,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ), gl AS (
      SELECT event_type, day, rn,
             CASE WHEN d > 0 THEN d ELSE CAST(0 AS DECIMAL(21,4)) END AS gain,
             CASE WHEN d < 0 THEN -d ELSE CAST(0 AS DECIMAL(21,4)) END AS loss
      FROM delta WHERE d IS NOT NULL
    ), sma AS (
      SELECT event_type, day, rn,
             SUM(gain) OVER (PARTITION BY event_type ORDER BY rn
                             ROWS BETWEEN {RSI_PERIOD - 1} PRECEDING AND CURRENT ROW)
               AS sg,
             SUM(loss) OVER (PARTITION BY event_type ORDER BY rn
                             ROWS BETWEEN {RSI_PERIOD - 1} PRECEDING AND CURRENT ROW)
               AS sl,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY rn
                            ROWS BETWEEN {RSI_PERIOD - 1} PRECEDING AND CURRENT ROW)
               AS nw
      FROM gl
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CASE WHEN sl = 0 THEN CAST(100 AS DOUBLE)
                ELSE 100 - 100 / (1 + CAST(sg AS DOUBLE) / CAST(sl AS DOUBLE))
           END AS rsi
    FROM sma WHERE nw = {RSI_PERIOD}
    """,
)
def q_rsi_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI (simple-moving-average relative strength index,
    public TA formula) over each event type's DAILY value series:
    100 − 100/(1 + SMA₁₄(gains)/SMA₁₄(losses)), emitted once the
    window holds {RSI_PERIOD} full deltas.

    The daily aggregation is the only event-table pass (map-side
    combined, exact DECIMAL sums); deltas, the two {RSI_PERIOD}-row
    frame sums, and the frame-fullness count all share one window
    partitioning over the 30-row-per-type daily table. Gains/losses
    stay DECIMAL end-to-end — the single double division in the final
    expression is correctly rounded on both engines, and the sl=0
    branch pins the all-gains case to exactly 100."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(20,4)")).alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    delta = daily.select(
        "event_type",
        "day",
        (F.col("v") - F.lag("v").over(w)).alias("d"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("d").isNotNull())
    zero = F.lit(0).cast("decimal(21,4)")
    gl = delta.select(
        "event_type",
        "day",
        "rn",
        F.when(F.col("d") > 0, F.col("d")).otherwise(zero).alias("gain"),
        F.when(F.col("d") < 0, -F.col("d")).otherwise(zero).alias("loss"),
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(-(RSI_PERIOD - 1), Window.currentRow)
    )
    sma = gl.select(
        "event_type",
        "day",
        F.sum("gain").over(wf).alias("sg"),
        F.sum("loss").over(wf).alias("sl"),
        F.count(F.lit(1)).over(wf).alias("nw"),
    ).filter(F.col("nw") == RSI_PERIOD)
    rsi = F.when(F.col("sl") == 0, F.lit(100.0)).otherwise(
        100 - 100 / (1 + F.col("sg").cast("double") / F.col("sl").cast("double"))
    )
    return sma.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        rsi.alias("rsi"),
    )


# Benford expected first-digit frequencies, emitted once from Python
# as 15-digit literals shared by BOTH engines — neither engine's
# log10 has to agree with the other's libm.
_BENFORD = {d: f"{math.log10(1 + 1 / d):.15f}" for d in range(1, 10)}
_BENFORD_SQL_VALUES = ", ".join(f"({d}, {p})" for d, p in _BENFORD.items())


@query(
    "q_benford_digits",
    oracle=f"""
    WITH expected(digit, exp_freq) AS (VALUES {_BENFORD_SQL_VALUES}),
    obs AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders WHERE o_totalprice >= 1
      GROUP BY 1
    ), joined AS (
      -- the VALUES literals parse as DECIMAL in DuckDB; cast to
      -- DOUBLE so both engines hold the identical binary64 value
      SELECT e.digit, COALESCE(o.n, 0) AS n,
             CAST(e.exp_freq AS DOUBLE) AS exp_freq,
             CAST(SUM(COALESCE(o.n, 0)) OVER () AS BIGINT) AS total
      FROM expected e LEFT JOIN obs o ON o.digit = e.digit
    ), contrib AS (
      SELECT digit, n, total,
             CAST(n AS DOUBLE) / total AS obs_freq, exp_freq,
             CAST((CAST(n AS DOUBLE) / total - exp_freq)
                  * (CAST(n AS DOUBLE) / total - exp_freq) / exp_freq
                  AS DECIMAL(20,12)) AS term
      FROM joined
    )
    SELECT digit, n, obs_freq, exp_freq,
           CAST(SUM(term) OVER () AS DOUBLE) * total AS chi2
    FROM contrib
    """,
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law data-quality audit of order amounts (public
    forensic-accounting test): observed first-significant-digit
    frequencies of o_totalprice vs log10(1+1/d), plus the chi-square
    statistic χ² = N·Σ(obs−exp)²/exp repeated on each of the 9 rows.

    The first digit comes from the DECIMAL(18,2) string rendering —
    identical on both engines — never from log10 on a double. The
    digit histogram is one map-side-combined groupBy to 9 rows; the
    expected table is a 9-row literal broadcast; each χ² term is
    quantized to DECIMAL(20,12) before the 9-term sum so the total is
    order-independent."""
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    obs = od.groupBy(
        F.substring(F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    expected = spark.createDataFrame(
        [(d, float(p)) for d, p in _BENFORD.items()], "digit bigint, exp_freq double"
    )
    joined = expected.join(F.broadcast(obs), "digit", "left").select(
        "digit", F.coalesce("n", F.lit(0)).alias("n"), "exp_freq"
    )
    wall = Window.partitionBy()
    withtot = joined.select(
        "digit", "n", "exp_freq", F.sum("n").over(wall).cast("bigint").alias("total")
    )
    obs_freq = F.col("n").cast("double") / F.col("total")
    term = (
        (obs_freq - F.col("exp_freq"))
        * (obs_freq - F.col("exp_freq"))
        / F.col("exp_freq")
    ).cast("decimal(20,12)")
    contrib = withtot.select(
        "digit", "n", "total", obs_freq.alias("obs_freq"), "exp_freq", term.alias("term")
    )
    return contrib.select(
        "digit",
        "n",
        "obs_freq",
        "exp_freq",
        (F.sum("term").over(wall).cast("double") * F.col("total")).alias("chi2"),
    )


@query(
    "q_gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS r
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT r, row_number() OVER (ORDER BY r, o_custkey) AS rk FROM rev
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(r) AS VARCHAR) AS DOUBLE) AS s0,
             CAST(CAST(SUM(CAST(rk * r AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) AS s1
      FROM ranked
    )
    SELECT n AS n_customers, s0 AS total_revenue,
           2 * s1 / (n * s0) - CAST(n + 1 AS DOUBLE) / n AS gini
    FROM sums
    """,
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers
    (public order-statistics form: G = 2·Σᵢ i·xᵢ/(n·Σx) − (n+1)/n
    over ascending-sorted totals) — the 'how top-heavy is the
    customer base' number behind mixture and sampling decisions.

    Per-customer totals are exact DECIMAL sums (one map-side-combined
    shuffle). The ascending rank is DISTRIBUTED — no global
    single-partition window: rows shard by a fixed revenue-range
    bucket (shard id monotone in r, so shards partition the sort
    order), rank = local row_number within the shard + the cumulative
    count of earlier shards (a doc_offsets-style two-phase prefix sum
    over the tiny shard table; per-customer totals don't grow with
    corpus size, so the shard count stays bounded at any SF). The
    shard-count branch references the same per-customer aggregate a
    second time — AQE's exchange reuse collapses it to ONE orders
    scan at runtime (verified: final adaptive plan shows
    ReusedExchange over the o_custkey aggregation).
    Rank·revenue products and both grand totals stay DECIMAL until a
    single VARCHAR-bridged double cast each (the dsum_sql rule — at
    100 TB the weighted sum exceeds double precision and DuckDB's
    direct decimal→double cast is not correctly rounded). The custkey
    tiebreak makes equal-revenue ranks deterministic; Σrk·r is
    invariant across tie orderings anyway (equal r)."""
    od = load_table(spark, sf_dir, "orders")
    rev = od.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(20,2)")).alias("r")
    )
    sharded = rev.withColumn("shard", F.floor(F.col("r") / 100000).cast("bigint"))
    wshard = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    shard_off = (
        sharded.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("off", F.coalesce(F.sum("cnt").over(wshard), F.lit(0)))
        .select("shard", "off")
    )
    wlocal = Window.partitionBy("shard").orderBy("r", "o_custkey")
    ranked = sharded.join(shard_off, "shard").select(
        "r", (F.row_number().over(wlocal) + F.col("off")).alias("rk")
    )
    sums = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("double").alias("s0"),
        F.sum((F.col("rk") * F.col("r")).cast("decimal(38,2)"))
        .cast("double")
        .alias("s1"),
    )
    n, s0, s1 = F.col("n"), F.col("s0"), F.col("s1")
    return sums.select(
        n.alias("n_customers"),
        s0.alias("total_revenue"),
        (2 * s1 / (n * s0) - (n + 1).cast("double") / n).alias("gini"),
    )
