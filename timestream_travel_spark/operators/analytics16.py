"""Analytics, part 16 (promoted into load_all()'s round-11 tail): Tukey
fences (Tukey, *Exploratory Data Analysis*, 1977) per event type —
the boxplot outlier rule [Q1 − 1.5·IQR, Q3 + 1.5·IQR] with an
integer census of values outside each fence. The robust companion
to q_anomaly_zscore / q_mad_anomaly: quartile-based, so the fences
themselves are immune to the outliers they flag.

Exactness — fully EXACT, scaled-integer decimals throughout (no
float quartiles, and no decimal DIVISION — DuckDB's `/` on decimals
returns DOUBLE, the first-draft divergence the strict gate caught):
with the linear-interpolation convention pos = (n−1)·p, the
fractional part at p ∈ {{¼, ¾}} is rem/4 with rem ∈ {{0,1,2,3}}, so
the QUADRUPLED quartile q4 = 4·v[k+1] + (v[k+2] − v[k+1])·rem is an
exact DECIMAL(18,4) combination, and the OCTUPLED fences are the
integer combinations lo8 = 5·q1_4 − 3·q3_4, hi8 = 5·q3_4 − 3·q1_4.
The outlier census compares 8·v against the fences decimal-vs-
decimal; display values bridge the exact decimal to double and
divide by 4.0/8.0 — powers of two, bit-exact on both engines.

Scale shape: one (type, value) order-statistic pass — row_number
per type — then the bounded 2-row order-stat reduce and one integer
census over the original rows (broadcast 5-row fence table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

_VALS_SQL = """
      SELECT event_type AS t, CAST(value AS DECIMAL(18,4)) AS v
      FROM events
"""

# quadrupled exact interpolated quartile from 1-indexed order stats:
# k = ({num}·(n−1)) // 4, rem = ({num}·(n−1)) % 4,
# q4 = 4·v[k+1] + (v[k+2] − v[k+1])·rem
_Q_SQL = """
      SELECT r.t,
             4 * MAX(CASE WHEN r.rn = 1 + ({num} * (r.n - 1)) // 4
                          THEN r.v END)
             + COALESCE(
                 (MAX(CASE WHEN r.rn = 2 + ({num} * (r.n - 1)) // 4
                           THEN r.v END)
                  - MAX(CASE WHEN r.rn = 1 + ({num} * (r.n - 1)) // 4
                             THEN r.v END))
                 * MAX(({num} * (r.n - 1)) % 4),
                 CAST(0 AS DECIMAL(18,4))) AS q4
      FROM ranked r
      WHERE r.rn <= 2 + ({num} * (r.n - 1)) // 4
      GROUP BY r.t
"""


@query(
    "q_tukey_fences",
    oracle=f"""
    WITH vals AS ({_VALS_SQL}
    ), ranked AS (
      SELECT t, v,
             row_number() OVER (PARTITION BY t ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY t) AS n
      FROM vals
    ), q1 AS ({_Q_SQL.format(num=1)}
    ), q3 AS ({_Q_SQL.format(num=3)}
    ), f AS (
      SELECT q1.t, q1.q4 AS q1_4, q3.q4 AS q3_4,
             5 * q1.q4 - 3 * q3.q4 AS lo8,
             5 * q3.q4 - 3 * q1.q4 AS hi8
      FROM q1 JOIN q3 ON q3.t = q1.t
    )
    SELECT f.t AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(q1_4 AS VARCHAR) AS DOUBLE) / 4.0 AS q1,
           CAST(CAST(q3_4 AS VARCHAR) AS DOUBLE) / 4.0 AS q3,
           CAST(CAST(lo8 AS VARCHAR) AS DOUBLE) / 8.0 AS lo_fence,
           CAST(CAST(hi8 AS VARCHAR) AS DOUBLE) / 8.0 AS hi_fence,
           CAST(SUM(CASE WHEN 8 * vals.v < lo8 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below,
           CAST(SUM(CASE WHEN 8 * vals.v > hi8 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above
    FROM f JOIN vals ON vals.t = f.t
    GROUP BY f.t, q1_4, q3_4, lo8, hi8
    """,
)
def q_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey boxplot fences per event type with exact scaled-integer
    decimal quartiles (see module docstring) and the integer outlier
    census outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR]."""
    # r16: the interpolated-quartile selection and the integer
    # outlier census run driver-side over the collected dec4 census
    # (rank_kit; exact scaled-integer arithmetic); the /4 and /8
    # bridges below are unchanged Spark expressions.
    from decimal import Decimal

    from timestream_travel_spark.operators.rank_kit import dec4_by_type
    from timestream_travel_spark.tables import bounded_df

    out = []
    for t, blocks in sorted(dec4_by_type(spark, sf_dir).items()):
        vs = sorted(blocks)
        n = sum(blocks.values())

        def _rank(r: int):
            cm = 0
            for x in vs:
                cm += blocks[x]
                if cm >= r:
                    return x
            return None

        def quart4(num: int) -> int:
            kf, rem = divmod(num * (n - 1), 4)
            lo = _rank(kf + 1)
            hi = _rank(kf + 2)
            return 4 * lo + ((hi - lo) * rem if hi is not None else 0)

        q1_4, q3_4 = quart4(1), quart4(3)
        lo8, hi8 = 5 * q1_4 - 3 * q3_4, 5 * q3_4 - 3 * q1_4
        n_below = sum(c for x, c in blocks.items() if 8 * x < lo8)
        n_above = sum(c for x, c in blocks.items() if 8 * x > hi8)
        out.append(
            (
                t,
                Decimal(q1_4).scaleb(-4),
                Decimal(q3_4).scaleb(-4),
                Decimal(lo8).scaleb(-4),
                Decimal(hi8).scaleb(-4),
                n,
                n_below,
                n_above,
            )
        )
    return (
        bounded_df(
            spark,
            out,
            "event_type string, q1_4 decimal(38,4), q3_4 decimal(38,4), "
            "lo8 decimal(38,4), hi8 decimal(38,4), n bigint, "
            "n_below bigint, n_above bigint",
        )
        .select(
            "event_type",
            "n",
            (F.col("q1_4").cast("double") / F.lit(4.0)).alias("q1"),
            (F.col("q3_4").cast("double") / F.lit(4.0)).alias("q3"),
            (F.col("lo8").cast("double") / F.lit(8.0)).alias("lo_fence"),
            (F.col("hi8").cast("double") / F.lit(8.0)).alias("hi_fence"),
            "n_below",
            "n_above",
        )
    )
