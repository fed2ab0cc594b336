"""Round-14 STAGED analytics: order/extrema-based classical tests —
the Wald–Wolfowitz two-sample runs test (Wald & Wolfowitz, AMS 1940),
the
Freeman–Tukey goodness-of-fit statistic (Freeman & Tukey, AMS 1950;
the variance-stabilized sibling of the already-green Pearson χ² GOF),
Tukey's quick two-sample pocket test (Tukey, Technometrics 1959),
and the trimean / quartile-coefficient-of-dispersion robust-location
panel (Tukey, EDA 1977).

Exactness design:
- runs: the merged block sequence orders the distinct-value count
  table by (v, t) — the DECLARED tie convention (cross-sample ties
  make the classical run count ill-defined; both engines use the
  identical deterministic order) — and counts label changes as exact
  integers; z standardizes by the flat double composition of the
  permutation moments (same shape both engines);
- Freeman–Tukey: T² = Σ_t (√O_t + √(O_t+1) − √(4E+1))² over the
  EVENT_TYPES literal domain, chain-added left-associatively (the
  analytics8 _chain_add idiom) so both engines add the k=5 irrational
  terms in the same order; 4E+1 = 4N/k+1 is ONE division;
- Tukey–Duckworth: pure integer exceedance counts against the other
  sample's extrema (both directions emitted; the classical
  'ends from different samples' gate is left to the reader as the
  counts make it checkable);
- trimean/QCD: type-1 quantiles over integer CENTS (smallest value
  whose cumulative count reaches ⌈p·n⌉) — exact integers; trimean is
  ONE flat division by 400 (cents × the /4), QCD one flat ratio.

Scale shape: every query is one (type, value) count reduce (or one
5-row count pivot) + value-domain-bounded windows — nothing touches
raw rows twice.

Reference parity: none (cmd/backup.go has no statistics surface) —
north-star derived capability, sibling of analytics19-22.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.analytics5 import _CNT_SQL, _counts
from timestream_travel_spark.operators.analytics8 import EVENT_TYPES, _chain_add
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

_PAIRS_SQL = """
    n AS (SELECT t, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY t),
    pairs AS (
      SELECT a.t AS ta, b.t AS tb, a.n AS n_a, b.n AS n_b
      FROM n a JOIN n b ON a.t < b.t
    )
"""


def _pairs(cnt: DataFrame) -> DataFrame:
    n = cnt.groupBy("t").agg(F.sum("c").cast("bigint").alias("n"))
    a = n.select(F.col("t").alias("ta"), F.col("n").alias("n_a"))
    b = n.select(F.col("t").alias("tb"), F.col("n").alias("n_b"))
    return a.join(b, F.col("ta") < F.col("tb"))


@query(
    "q_runs_two_sample",
    oracle=f"""
    WITH cnt AS ({_CNT_SQL}),
    {_PAIRS_SQL},
    seq AS (
      SELECT p.ta, p.tb, p.n_a, p.n_b, c.t,
             lag(c.t) OVER (PARTITION BY p.ta, p.tb
                            ORDER BY c.v, c.t) AS pt
      FROM pairs p JOIN cnt c ON c.t = p.ta OR c.t = p.tb
    )
    SELECT ta AS type_a, tb AS type_b, n_a, n_b,
           CAST(SUM(CASE WHEN pt IS NULL OR t <> pt THEN 1 ELSE 0 END)
                AS BIGINT) AS n_runs,
           round((SUM(CASE WHEN pt IS NULL OR t <> pt THEN 1 ELSE 0 END)
                  - (2.0 * n_a * n_b / (n_a + n_b) + 1))
                 / sqrt(2.0 * n_a * n_b * (2.0 * n_a * n_b - n_a - n_b)
                        / ((n_a + n_b) * (n_a + n_b)
                           * (n_a + n_b - 1.0))), 6) AS z_runs
    FROM seq GROUP BY ta, tb, n_a, n_b
    """,
)
def q_runs_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz two-sample runs test per event-type pair over
    the merged (v, t)-ordered block sequence (module docstring):
    exact integer run count, flat-composition z."""
    # r16: the integer run count runs driver-side over the collected
    # counts spine (rank_kit) — one pass over each pair's merged
    # (v, t)-ordered block sequence; the z composition below is
    # unchanged Spark expressions.
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
        n_runs = 0
        prev = None
        for a_, b_ in zip(ca.tolist(), cb.tolist()):
            for t in ((ta,) if a_ else ()) + ((tb,) if b_ else ()):
                if t != prev:
                    n_runs += 1
                    prev = t
        rows.append((ta, tb, int(ca.sum()), int(cb.sum()), n_runs))
    seq = bounded_df(
        spark,
        rows,
        "type_a string, type_b string, n_a bigint, n_b bigint, runs bigint",
    )
    na, nb = F.col("n_a"), F.col("n_b")
    runs = F.col("runs")
    return seq.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        runs.cast("bigint").alias("n_runs"),
        F.round(
            (runs - (F.lit(2.0) * na * nb / (na + nb) + 1))
            / F.sqrt(
                F.lit(2.0)
                * na
                * nb
                * (F.lit(2.0) * na * nb - na - nb)
                / ((na + nb) * (na + nb) * (na + nb - F.lit(1.0)))
            ),
            6,
        ).alias("z_runs"),
    )


_FT_K = len(EVENT_TYPES)
_FT_PIVOT = ",\n             ".join(
    f"MAX(CASE WHEN t = '{t}' THEN n END) AS n_{t}" for t in EVENT_TYPES
)
_FT_N = " + ".join(f"n_{t}" for t in EVENT_TYPES)
_FT_TERMS_SQL = "".join(
    (
        f"(sqrt(CAST(n_{t} AS DOUBLE)) + sqrt(n_{t} + 1.0)"
        f" - sqrt(4.0 * ({_FT_N}) / {_FT_K} + 1.0))"
        f" * (sqrt(CAST(n_{t} AS DOUBLE)) + sqrt(n_{t} + 1.0)"
        f" - sqrt(4.0 * ({_FT_N}) / {_FT_K} + 1.0))"
        + (" + " if i < _FT_K - 1 else "")
    )
    for i, t in enumerate(EVENT_TYPES)
)


@query(
    "q_freeman_tukey_gof",
    oracle=f"""
    WITH obs AS (
      SELECT event_type AS t, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), piv AS (
      SELECT {_FT_PIVOT}
      FROM obs
    )
    SELECT CAST({_FT_K} AS BIGINT) AS k,
           CAST({_FT_N} AS BIGINT) AS n_total,
           round({_FT_TERMS_SQL}, 6) AS ft_t2
    FROM piv
    """,
)
def q_freeman_tukey_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freeman–Tukey goodness-of-fit of the event-type frequencies
    against a uniform null: T² = Σ(√O + √(O+1) − √(4E+1))² over the
    EVENT_TYPES literal domain, chain-added so both engines sum the
    irrational terms in the same order (module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    piv = obs.agg(
        *[
            F.max(F.when(F.col("t") == t, F.col("n"))).alias(f"n_{t}")
            for t in EVENT_TYPES
        ]
    )
    ncols = [F.col(f"n_{t}") for t in EVENT_TYPES]
    n_total = _chain_add(ncols)
    e_term = F.sqrt(F.lit(4.0) * n_total / _FT_K + F.lit(1.0))
    terms = [
        (F.sqrt(c.cast("double")) + F.sqrt(c + F.lit(1.0)) - e_term)
        * (F.sqrt(c.cast("double")) + F.sqrt(c + F.lit(1.0)) - e_term)
        for c in ncols
    ]
    return piv.select(
        F.lit(_FT_K).cast("bigint").alias("k"),
        n_total.cast("bigint").alias("n_total"),
        F.round(_chain_add(terms), 6).alias("ft_t2"),
    )


@query(
    "q_tukey_duckworth",
    oracle=f"""
    WITH cnt AS ({_CNT_SQL}),
    {_PAIRS_SQL},
    bounds AS (
      SELECT t, MIN(v) AS mn, MAX(v) AS mx FROM cnt GROUP BY t
    )
    SELECT p.ta AS type_a, p.tb AS type_b, p.n_a, p.n_b,
           CAST(COALESCE(SUM(CASE WHEN c.t = p.ta AND c.v < bb.mn
                                  THEN c.c END), 0)
                + COALESCE(SUM(CASE WHEN c.t = p.tb AND c.v > ba.mx
                                    THEN c.c END), 0) AS BIGINT) AS t_ab,
           CAST(COALESCE(SUM(CASE WHEN c.t = p.tb AND c.v < ba.mn
                                  THEN c.c END), 0)
                + COALESCE(SUM(CASE WHEN c.t = p.ta AND c.v > bb.mx
                                    THEN c.c END), 0) AS BIGINT) AS t_ba
    FROM pairs p
    JOIN bounds ba ON ba.t = p.ta
    JOIN bounds bb ON bb.t = p.tb
    JOIN cnt c ON c.t = p.ta OR c.t = p.tb
    GROUP BY 1, 2, 3, 4
    """,
)
def q_tukey_duckworth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's quick two-sample pocket test per event-type pair:
    exact integer counts of a-values strictly below b's minimum plus
    b-values strictly above a's maximum (t_ab) and the mirror
    direction (t_ba) — module docstring."""
    # r16: the pure-integer exceedance census runs driver-side over
    # the collected counts spine (rank_kit); every output column is
    # an exact integer, so the whole result is a bounded_df.
    from timestream_travel_spark.operators.rank_kit import (
        counts_by_type,
        type_pairs,
    )
    from timestream_travel_spark.tables import bounded_df

    kit = counts_by_type(spark, sf_dir)
    rows = []
    for ta, tb in type_pairs(kit):
        va, ca = kit[ta]
        vb, cb = kit[tb]
        n_a, n_b = int(ca.sum()), int(cb.sum())
        mn_a, mx_a = va[0], va[-1]
        mn_b, mx_b = vb[0], vb[-1]
        t_ab = int(ca[va < mn_b].sum()) + int(cb[vb > mx_a].sum())
        t_ba = int(cb[vb < mn_a].sum()) + int(ca[va > mx_b].sum())
        rows.append((ta, tb, n_a, n_b, t_ab, t_ba))
    return bounded_df(
        spark,
        rows,
        "type_a string, type_b string, n_a bigint, n_b bigint, "
        "t_ab bigint, t_ba bigint",
    )


@query(
    "q_trimean_qcd",
    oracle="""
    WITH cnt AS (
      SELECT event_type AS t,
             CAST(round(value * 100, 0) AS BIGINT) AS vc,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT t, vc, SUM(c) OVER (PARTITION BY t ORDER BY vc
                                 ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER (PARTITION BY t) AS n
      FROM cnt
    )
    SELECT t AS event_type, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum >= (n + 3) // 4 THEN vc END)
                AS BIGINT) AS q1_cents,
           CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN vc END)
                AS BIGINT) AS q2_cents,
           CAST(MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN vc END)
                AS BIGINT) AS q3_cents,
           round((MIN(CASE WHEN cum >= (n + 3) // 4 THEN vc END)
                  + 2 * MIN(CASE WHEN cum >= (n + 1) // 2 THEN vc END)
                  + MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN vc END))
                 / 400.0, 6) AS trimean,
           CASE WHEN MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN vc END)
                     + MIN(CASE WHEN cum >= (n + 3) // 4 THEN vc END) <> 0
                THEN round(
                 CAST(MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN vc END)
                      - MIN(CASE WHEN cum >= (n + 3) // 4 THEN vc END)
                      AS DOUBLE)
                 / (MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN vc END)
                    + MIN(CASE WHEN cum >= (n + 3) // 4 THEN vc END)),
                 6) END AS qcd
    FROM cum GROUP BY t
    """,
)
def q_trimean_qcd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey trimean + quartile coefficient of dispersion per event
    type over integer cents: type-1 quantiles (smallest value whose
    cumulative count reaches ⌈p·n⌉) are exact integers; trimean is
    one flat /400 division, QCD one flat ratio (module docstring)."""
    # r16: the integer-cents quantile selection runs driver-side over
    # the collected counts spine (rank_kit; Spark's round(v*100) is
    # BigDecimal(Double.toString) HALF_UP, which Decimal(repr)
    # reproduces); the trimean/QCD compositions below are unchanged
    # Spark expressions.
    from timestream_travel_spark.operators.rank_kit import cents_by_type
    from timestream_travel_spark.tables import bounded_df

    rows = []
    for t, cents in sorted(cents_by_type(spark, sf_dir).items()):
        vs = sorted(cents)
        n = sum(cents.values())

        def _sel(cut: int):
            cm = 0
            for x in vs:
                cm += cents[x]
                if cm >= cut:
                    return x
            return None

        rows.append(
            (t, n, _sel((n + 3) // 4), _sel((n + 1) // 2), _sel((3 * n + 3) // 4))
        )
    cum = bounded_df(
        spark,
        rows,
        "event_type string, n bigint, q1_cents bigint, q2_cents bigint, "
        "q3_cents bigint",
    )
    q1, q2, q3 = F.col("q1_cents"), F.col("q2_cents"), F.col("q3_cents")
    return cum.select(
        "event_type",
        "n",
        "q1_cents",
        "q2_cents",
        "q3_cents",
        F.round((q1 + 2 * q2 + q3) / F.lit(400.0), 6).alias("trimean"),
        # q3 + q1 == 0 is reachable with negative cent values; both
        # engines emit NULL there (DuckDB's IEEE division would
        # otherwise yield Inf/NaN while Spark yields NULL — ADVICE r13)
        F.when(
            (q3 + q1) != 0, F.round((q3 - q1).cast("double") / (q3 + q1), 6)
        ).alias("qcd"),
    )
