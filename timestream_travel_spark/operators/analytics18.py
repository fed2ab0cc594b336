"""Round-11 analytics, part D: the Q–Q decile table (Wilk &
Gnanadesikan, Biometrika 1968 — the quantile-quantile comparison
behind Q-Q plots) for every event-type pair, and the Lorenz decile
share table (Lorenz, JASA 1905 — the curve behind
q_gini_concentration's single number): which population decile owns
which share of total value.

Exactness: both reuse the scaled-integer order-statistic discipline
(analytics16): at p = d/10 the interpolation fraction is rem/10 with
rem ∈ {{0..9}}, so the DECUPLED quantile q10 = 10·v[k+1] +
(v[k+2] − v[k+1])·rem is an exact DECIMAL(18,4) combination; display
bridges the exact decimal to double and divides by 10.0 — the same
single IEEE op on both engines. Lorenz shares are exact decimal
cumulative sums at integer rank cutoffs ⌊d·n/10⌋ over one flat
division each.

Scale shape: one per-type slice rank (value-domain bounded, the
analytics5 argument); the needed order statistics (≤18 ranks/type
for Q–Q, ≤10 cutoffs/type for Lorenz) are derived from the bounded
(t, n) table and broadcast-joined back onto the ranked rows, so
each event row is touched once — no per-row ×9/×10 fan-out. The
Q–Q pair table is |types|²·9 rows, Lorenz |types|·10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

_RANKED_SQL = """
      SELECT event_type AS t, CAST(value AS DECIMAL(18,4)) AS v,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
"""

# decupled exact interpolated decile d/10 from 1-indexed order stats
_DEC_SQL = """
      SELECT t, d,
             10 * MAX(CASE WHEN rn = 1 + (d * (n - 1)) // 10 THEN v END)
             + COALESCE(
                 (MAX(CASE WHEN rn = 2 + (d * (n - 1)) // 10 THEN v END)
                  - MAX(CASE WHEN rn = 1 + (d * (n - 1)) // 10 THEN v END))
                 * MAX((d * (n - 1)) % 10),
                 CAST(0 AS DECIMAL(18,4))) AS q10
      FROM ranked CROSS JOIN (SELECT unnest(range(1, 10)) AS d)
      GROUP BY t, d
"""


@query(
    "q_qq_deciles",
    oracle=f"""
    WITH ranked AS ({_RANKED_SQL}
    ), deciles AS ({_DEC_SQL}
    )
    SELECT a.t AS type_a, b.t AS type_b, CAST(a.d AS INT) AS decile,
           CAST(CAST(a.q10 AS VARCHAR) AS DOUBLE) / 10.0 AS q_a,
           CAST(CAST(b.q10 AS VARCHAR) AS DOUBLE) / 10.0 AS q_b,
           CAST(CAST(b.q10 - a.q10 AS VARCHAR) AS DOUBLE) / 10.0 AS q_gap
    FROM deciles a JOIN deciles b ON a.d = b.d AND a.t < b.t
    """,
)
def q_qq_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q–Q table at deciles 1..9 for every event-type pair: the two
    exact interpolated deciles side-by-side plus their gap — the
    tabular Q-Q plot (points off q_a = q_b flag distributional
    differences location-by-location, where KS/CvM give one number).
    Decupled exact decimals (×10), bridged and divided by 10.0 only
    at the output."""
    ev = load_table(spark, sf_dir, "events")
    wr = Window.partitionBy("t").orderBy("v")
    vals = ev.select(
        F.col("event_type").alias("t"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    ranked = vals.select("t", "v", F.row_number().over(wr).alias("rn"))
    # The 9 decile targets need only ranks k+1 / k+2 per (type, d) —
    # ≤18 ranks per type, all derivable from the bounded (t, n)
    # table. Broadcast-joining those target ranks back onto the
    # ranked rows touches each event row ONCE; the old form
    # crossJoined every row ×9 before aggregating (r11 verdict
    # "What's wrong #2").
    nt = vals.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    ds = spark.range(1, 10).select(F.col("id").alias("d"))
    k = F.floor((F.col("d") * (F.col("n") - 1)) / 10)
    rem = (F.col("d") * (F.col("n") - 1)) % 10
    tg = nt.crossJoin(F.broadcast(ds)).select(
        "t",
        "d",
        (k + 1).alias("r_lo"),
        (k + 2).alias("r_hi"),
        rem.alias("rem"),
    )
    targets = tg.select(
        "t", "d", "rem", F.col("r_lo").alias("rn"), F.lit("lo").alias("which")
    ).unionByName(
        tg.select(
            "t", "d", "rem", F.col("r_hi").alias("rn"), F.lit("hi").alias("which")
        )
    )
    j = ranked.join(F.broadcast(targets), ["t", "rn"])
    zero = F.lit(0).cast("decimal(18,4)")
    lo = F.max(F.when(F.col("which") == "lo", F.col("v")))
    hi = F.max(F.when(F.col("which") == "hi", F.col("v")))
    dec = j.groupBy("t", "d").agg(
        (
            F.lit(10) * lo + F.coalesce((hi - lo) * F.max("rem"), zero)
        ).alias("q10")
    )
    a = dec.select(
        F.col("t").alias("type_a"), "d", F.col("q10").alias("qa10")
    )
    b = dec.select(
        F.col("t").alias("type_b"), F.col("d").alias("db"), F.col("q10").alias("qb10")
    )
    return (
        a.join(b, (a.d == b.db) & (F.col("type_a") < F.col("type_b")))
        .select(
            "type_a",
            "type_b",
            F.col("d").cast("int").alias("decile"),
            (F.col("qa10").cast("double") / F.lit(10.0)).alias("q_a"),
            (F.col("qb10").cast("double") / F.lit(10.0)).alias("q_b"),
            (
                (F.col("qb10") - F.col("qa10")).cast("double") / F.lit(10.0)
            ).alias("q_gap"),
        )
    )


@query(
    "q_lorenz_deciles",
    oracle=f"""
    WITH ranked AS ({_RANKED_SQL}
    ), cum AS (
      SELECT t, rn, n,
             SUM(v) OVER (PARTITION BY t ORDER BY rn
                          ROWS UNBOUNDED PRECEDING) AS cv,
             SUM(v) OVER (PARTITION BY t) AS tot
      FROM ranked
    )
    SELECT t AS event_type, CAST(d.d AS INT) AS decile,
           CAST((d.d * n) // 10 AS BIGINT) AS n_members,
           round(CAST(CAST(cv AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(tot AS VARCHAR) AS DOUBLE), 6) AS cum_share
    FROM cum CROSS JOIN (SELECT unnest(range(1, 11)) AS d) d
    WHERE rn = (d.d * n) // 10 AND (d.d * n) // 10 >= 1
    """,
)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve sampled at population deciles per event type: the
    bottom ⌊d·n/10⌋ values' exact DECIMAL share of total value — the
    table under q_gini_concentration's single number (decile 10 is
    1.0 by construction; a flat distribution reads d/10 everywhere).
    One flat division per row off exact cumulative sums."""
    ev = load_table(spark, sf_dir, "events")
    wr = Window.partitionBy("t").orderBy("v")
    wn = Window.partitionBy("t")
    wc = (
        Window.partitionBy("t")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vals = ev.select(
        F.col("event_type").alias("t"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    ranked = vals.select("t", "v", F.row_number().over(wr).alias("rn"))
    cum = ranked.select(
        "t",
        "rn",
        F.sum("v").over(wc).alias("cv"),
        F.sum("v").over(wn).alias("tot"),
    )
    # The 10 decile cutoffs ⌊d·n/10⌋ per type come from the bounded
    # (t, n) table; broadcast-joining them onto the cumulative rows
    # touches each row once instead of fanning every row ×10 (r11
    # verdict "What's wrong #2").
    nt = vals.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    ds = spark.range(1, 11).select(F.col("id").alias("d"))
    cut = F.floor((F.col("d") * F.col("n")) / 10)
    tg = (
        nt.crossJoin(F.broadcast(ds))
        .select("t", "d", cut.alias("rn"))
        .filter(F.col("rn") >= 1)
    )
    return cum.join(F.broadcast(tg), ["t", "rn"]).select(
        F.col("t").alias("event_type"),
        F.col("d").cast("int").alias("decile"),
        F.col("rn").cast("bigint").alias("n_members"),
        F.round(
            F.col("cv").cast("double") / F.col("tot").cast("double"), 6
        ).alias("cum_share"),
    )
