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
    # r16: the interpolated-decile selection and the pair fan-out run
    # driver-side over the collected dec4 census (rank_kit; exact
    # scaled-integer arithmetic); the /10 bridges below are unchanged
    # Spark expressions.
    from decimal import Decimal

    from timestream_travel_spark.operators.rank_kit import dec4_by_type
    from timestream_travel_spark.tables import bounded_df

    blocks_t = dec4_by_type(spark, sf_dir)
    q10: dict[str, list[int]] = {}
    for t, blocks in blocks_t.items():
        vs = sorted(blocks)
        n = sum(blocks.values())

        def _rank(r: int):
            cm = 0
            for x in vs:
                cm += blocks[x]
                if cm >= r:
                    return x
            return None

        decs = []
        for d in range(1, 10):
            kf, rem = divmod(d * (n - 1), 10)
            lo = _rank(kf + 1)
            hi = _rank(kf + 2)
            decs.append(10 * lo + ((hi - lo) * rem if hi is not None else 0))
        q10[t] = decs
    ts = sorted(q10)
    rows = [
        (
            ta,
            tb,
            d + 1,
            Decimal(q10[ta][d]).scaleb(-4),
            Decimal(q10[tb][d]).scaleb(-4),
        )
        for i, ta in enumerate(ts)
        for tb in ts[i + 1 :]
        for d in range(9)
    ]
    return bounded_df(
        spark,
        rows,
        "type_a string, type_b string, decile int, "
        "qa10 decimal(38,4), qb10 decimal(38,4)",
    ).select(
        "type_a",
        "type_b",
        "decile",
        (F.col("qa10").cast("double") / F.lit(10.0)).alias("q_a"),
        (F.col("qb10").cast("double") / F.lit(10.0)).alias("q_b"),
        (
            (F.col("qb10") - F.col("qa10")).cast("double") / F.lit(10.0)
        ).alias("q_gap"),
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
    # r16: the cumulative-share-at-cutoff selection runs driver-side
    # over the collected dec4 census (rank_kit; exact scaled-integer
    # block sums); the one division below is unchanged Spark
    # expressions.
    from decimal import Decimal

    from timestream_travel_spark.operators.rank_kit import dec4_by_type
    from timestream_travel_spark.tables import bounded_df

    rows = []
    for t, blocks in sorted(dec4_by_type(spark, sf_dir).items()):
        vs = sorted(blocks)
        n = sum(blocks.values())
        tot = sum(x * c for x, c in blocks.items())
        for d in range(1, 11):
            cut = (d * n) // 10
            if cut < 1:
                continue
            cv = cm = 0
            for x in vs:
                c = blocks[x]
                take = min(c, cut - cm)
                cv += x * take
                cm += take
                if cm >= cut:
                    break
            rows.append(
                (
                    t,
                    d,
                    cut,
                    Decimal(cv).scaleb(-4),
                    Decimal(tot).scaleb(-4),
                )
            )
    return bounded_df(
        spark,
        rows,
        "event_type string, decile int, n_members bigint, "
        "cv decimal(38,4), tot decimal(38,4)",
    ).select(
        "event_type",
        "decile",
        "n_members",
        F.round(
            F.col("cv").cast("double") / F.col("tot").cast("double"), 6
        ).alias("cum_share"),
    )
