"""Round-11 analytics, part C: the two-sample Cramér–von Mises test
(Anderson, Ann. Math. Stat. 1962 — the integrated-squared-ECDF-gap
companion to KS's max gap) across event-type pairs, and robust
location estimates — the trimmed and winsorized means (Tukey &
McLaughlin, Sankhyā 1963) per event type.

Exactness: CvM is assembled on the analytics5 value-census — at
every merged distinct value the ECDF gap cross-multiplies to the
exact integer g = cum_a·n_b − cum_b·n_a, and the statistic's sum
Σ count·g² stays integral to the single final division
T = Σ / (n_a·n_b·N²) (Anderson's computing form: T = U/(n_a·n_b·N)
− (4·n_a·n_b − 1)/(6N) is algebraically regrouped so every term
keeps an exact integer numerator; we publish the direct
ω² = Σ cp·g² / (n_a·n_b·N²) integral form with the gap measured AT
each observation). The trimmed/winsorized means keep the Tukey-
fences scaled-integer discipline: order statistics of DECIMAL(18,4)
values, integer trim counts k = ⌊α·n⌋, exact decimal middle sums
(winsorizing adds k·(v[k+1] + v[n−k]) exactly), one flat division.

Scale shape: one (type, value) census bounds everything by the
value DOMAIN (analytics5 argument); the robust means add one
window rank over per-type slices and one bounded reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.analytics5 import (
    _CNT_SQL,
    _PAIRS_SQL,
    _counts,
    _pairs,
    _pair_grid,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

TRIM_ALPHA_NUM, TRIM_ALPHA_DEN = 1, 10  # 10% trim from each tail


@query(
    "q_cramer_von_mises",
    oracle=f"""
    WITH cnt AS ({_CNT_SQL}
    ), n AS (
      SELECT t, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY t
    ), pairs AS ({_PAIRS_SQL}
    ), merged AS (
      SELECT p.ta, p.tb, p.n_a, p.n_b, c.v,
             SUM(CASE WHEN c.t = p.ta THEN c.c ELSE 0 END) AS ca,
             SUM(CASE WHEN c.t = p.tb THEN c.c ELSE 0 END) AS cb
      FROM pairs p JOIN cnt c ON c.t = p.ta OR c.t = p.tb
      GROUP BY p.ta, p.tb, p.n_a, p.n_b, c.v
    ), cum AS (
      SELECT ta, tb, n_a, n_b, ca + cb AS cp,
             SUM(ca) OVER w AS cuma, SUM(cb) OVER w AS cumb
      FROM merged
      WINDOW w AS (PARTITION BY ta, tb ORDER BY v ROWS UNBOUNDED PRECEDING)
    ), agg AS (
      SELECT ta, tb, n_a, n_b,
             CAST(SUM(cp * (cuma * n_b - cumb * n_a)
                         * (cuma * n_b - cumb * n_a)) AS HUGEINT) AS s
      FROM cum GROUP BY ta, tb, n_a, n_b
    )
    SELECT ta AS type_a, tb AS type_b, n_a, n_b,
           round(CAST(s AS DOUBLE)
                 / (CAST(n_a AS DOUBLE) * n_b * (n_a + n_b) * (n_a + n_b)),
                 6) AS cvm_t
    FROM agg
    """,
)
def q_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises statistic per event-type pair:
    T = Σ_obs (F_a − F_b)² · n_a·n_b/N² evaluated on the merged
    distinct-value census as the EXACT integer Σ count·(cum_a·n_b −
    cum_b·n_a)² with ONE final division by n_a·n_b·N² — the
    integrated companion to q_ks_two_sample's max gap (same census,
    same windows, sum instead of max)."""
    # r16: the exact integer Σ cp·g² census runs driver-side over the
    # collected counts spine (rank_kit; Python ints reproduce the
    # DECIMAL widenings); the single division below is unchanged
    # Spark expressions.
    from decimal import Decimal

    from timestream_travel_spark.operators.rank_kit import (
        counts_by_type,
        merged_pair,
        type_pairs,
    )
    from timestream_travel_spark.tables import bounded_df

    kit = counts_by_type(spark, sf_dir)
    rows = []
    for ta, tb in type_pairs(kit):
        _, ca, cb = merged_pair(kit, ta, tb)
        n_a, n_b = int(ca.sum()), int(cb.sum())
        s = cuma = cumb = 0
        for a_, b_ in zip(ca.tolist(), cb.tolist()):
            cuma += a_
            cumb += b_
            g = cuma * n_b - cumb * n_a
            s += (a_ + b_) * g * g
        rows.append((ta, tb, n_a, n_b, Decimal(s)))
    agg = bounded_df(
        spark,
        rows,
        "type_a string, type_b string, n_a bigint, n_b bigint, "
        "s decimal(38,0)",
    )
    return agg.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        F.round(
            F.col("s").cast("double")
            / (
                F.col("n_a").cast("double")
                * F.col("n_b")
                * (F.col("n_a") + F.col("n_b"))
                * (F.col("n_a") + F.col("n_b"))
            ),
            6,
        ).alias("cvm_t"),
    )


@query(
    "q_trimmed_winsorized_mean",
    oracle=f"""
    WITH vals AS (
      SELECT event_type AS t, CAST(value AS DECIMAL(18,4)) AS v
      FROM events
    ), ranked AS (
      SELECT t, v,
             row_number() OVER (PARTITION BY t ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY t) AS n
      FROM vals
    ), k AS (
      SELECT t, MAX(n) AS n,
             MAX(({TRIM_ALPHA_NUM} * n) // {TRIM_ALPHA_DEN}) AS k
      FROM ranked GROUP BY t
    ), mid AS (
      SELECT r.t,
             SUM(CASE WHEN r.rn > k.k AND r.rn <= k.n - k.k
                      THEN r.v ELSE CAST(0 AS DECIMAL(18,4)) END) AS mid_sum,
             MAX(CASE WHEN r.rn = k.k + 1 THEN r.v END) AS lo_v,
             MAX(CASE WHEN r.rn = k.n - k.k THEN r.v END) AS hi_v
      FROM ranked r JOIN k ON k.t = r.t
      GROUP BY r.t
    )
    SELECT m.t AS event_type, k.n, k.k AS n_trimmed_each,
           round(CAST(CAST(m.mid_sum AS VARCHAR) AS DOUBLE)
                 / (k.n - 2 * k.k), 6) AS trimmed_mean,
           round(CAST(CAST(m.mid_sum + k.k * m.lo_v + k.k * m.hi_v
                           AS VARCHAR) AS DOUBLE) / k.n, 6)
             AS winsorized_mean
    FROM mid m JOIN k ON k.t = m.t
    """,
)
def q_trimmed_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{TRIM_ALPHA_NUM}/{TRIM_ALPHA_DEN}-trimmed and winsorized means
    per event type, exact to the final division: k = ⌊α·n⌋ order
    statistics drop (trim) or clamp to v[k+1]/v[n−k] (winsorize);
    the middle sum and the k·(lo+hi) replacement mass stay exact
    DECIMAL(18,4) (the Tukey-fences discipline); one flat division
    each."""
    # r16: the k-th/(n−k)-th order statistics and the clipped middle
    # sum run driver-side over the collected counts spine (rank_kit;
    # the decimal(18,4) cast is the dec4 bridge, rank ranges are
    # integer block overlaps — no per-event sort); the two divisions
    # below are unchanged Spark expressions.
    from decimal import Decimal

    from timestream_travel_spark.operators.rank_kit import dec4_by_type
    from timestream_travel_spark.tables import bounded_df

    rows = []
    for t, blocks in sorted(dec4_by_type(spark, sf_dir).items()):
        n = sum(blocks.values())
        k = (TRIM_ALPHA_NUM * n) // TRIM_ALPHA_DEN
        lo_rank, hi_rank = k + 1, n - k
        mid_sum = 0
        lo_v = hi_v = None
        cm = 0
        for v4 in sorted(blocks):
            c_ = blocks[v4]
            lo, hi = cm, cm + c_  # ranks (lo, hi]
            cm = hi
            mid_sum += v4 * max(0, min(hi, n - k) - max(lo, k))
            if lo < lo_rank <= hi:
                lo_v = v4
            if lo < hi_rank <= hi:
                hi_v = v4
        q4 = Decimal(1).scaleb(-4)
        rows.append(
            (
                t,
                n,
                k,
                Decimal(mid_sum).scaleb(-4),
                None if lo_v is None else Decimal(lo_v).scaleb(-4).quantize(q4),
                None if hi_v is None else Decimal(hi_v).scaleb(-4).quantize(q4),
            )
        )
    mid = bounded_df(
        spark,
        rows,
        "t string, n bigint, k bigint, mid_sum decimal(38,4), "
        "lo_v decimal(18,4), hi_v decimal(18,4)",
    )
    return mid.select(
        F.col("t").alias("event_type"),
        "n",
        F.col("k").alias("n_trimmed_each"),
        F.round(
            F.col("mid_sum").cast("double") / (F.col("n") - 2 * F.col("k")), 6
        ).alias("trimmed_mean"),
        F.round(
            (
                F.col("mid_sum")
                + F.col("k") * F.col("lo_v")
                + F.col("k") * F.col("hi_v")
            ).cast("double")
            / F.col("n"),
            6,
        ).alias("winsorized_mean"),
    )
