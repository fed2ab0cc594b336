"""Round-15 STAGED analytics: the Siegel–Tukey dispersion test
(Siegel & Tukey, JASA 1960 — Wilcoxon on extremes-inward zigzag
ranks; the historical companion of the already-green Ansari–Bradley,
kept distinct because its rank scheme and tie behavior differ), the
Gini mean difference per event type (Gini 1912 — the L-scale
dispersion E|X−X'|, the location-free sibling of the revenue Gini),
the Bowley quartile skewness + Moors octile kurtosis panel (Bowley
1901; Moors, The Statistician 1988 — quantile-based shape without
moments), and the bias-corrected Cramér's V (Bergsma, J. Korean
Stat. Soc. 2013 — the small-sample-honest version of q_cramers_v).

Exactness design:
- Siegel–Tukey zigzag scores over positions 1..N are computed in
  closed form PER MERGED-VALUE BLOCK (bottom/middle/top split; the
  block's score sum S is exact integer — ST scores are a permutation
  of 1..N, pytest-pinned), and tied midranks S/c enter under the
  TRUNCATED fixed-point convention at scale {ST_SCALE} (the
  graph15/HL precedent): per block, the a-mass term (ca·S·SCALE)
  DIV c and the squared-midrank mass (S²·SCALE) DIV c are exact
  integers in both engines (HUGEINT/DECIMAL(38,0) before the
  product); T and Σmidrank² bridge to double once (VARCHAR rule),
  and z standardizes by the exact tie-corrected permutation moments
  (midranks always sum to N(N+1)/2).
- GMD uses the block-summed sorted-rank identity over the per-type
  cents count table (the q_token_gini form): GMD = 2(2Σi·x −
  (n+1)Σx)/(n(n−1)) exact integers, relative Gini = N₂/(2(n−1)Σx),
  two flat divisions.
- Bowley/Moors use type-1 octiles on integer cents (smallest value
  whose cumulative count reaches ⌈k·n/8⌉), then ONE guarded flat
  division each.
- corrected V reuses q_cramers_v's Σo²N/(RC) − N χ² identity
  (per-cell terms quantized DECIMAL(24,8) inside the agreement
  bound) on the (priority × status) table, then the Bergsma
  φ̃²/r̃/c̃ corrections as identically-shaped double compositions.

Scale shape: everything reduces to bounded count tables first (one
map-side-combined shuffle over events/orders); pair joins, window
sums and closed-form block scores run on domain-bounded rows.

Reference parity: none — north-star derived capability, sibling of
analytics22/24.
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

ST_SCALE = 10**12  # fixed-point scale of the truncated ST midranks


# ---------------------------------------------------- Siegel–Tukey

# closed-form zigzag score sum over a block of consecutive sorted
# positions [pl, pr] of N: bottom scores 2k−[k odd], top scores
# (k-th from top) 2k−[k even], middle (N odd) scores N
_ST_S_SQL = """
      (CASE WHEN pl <= least(pr, nn // 2) THEN
         (least(pr, nn // 2) * (least(pr, nn // 2) + 1) - (pl - 1) * pl)
         - ((least(pr, nn // 2) + 1) // 2 - pl // 2)
       ELSE 0 END)
      + (CASE WHEN nn % 2 = 1 AND pl <= (nn + 1) // 2
              AND (nn + 1) // 2 <= pr THEN nn ELSE 0 END)
      + (CASE WHEN greatest(pl, nn // 2 + 1 + nn % 2) <= pr THEN
           ((nn + 1 - greatest(pl, nn // 2 + 1 + nn % 2))
              * (nn + 2 - greatest(pl, nn // 2 + 1 + nn % 2))
            - (nn - pr) * (nn + 1 - pr))
           - ((nn + 1 - greatest(pl, nn // 2 + 1 + nn % 2)) // 2
              - (nn - pr) // 2)
         ELSE 0 END)
"""


@query(
    "q_siegel_tukey",
    oracle=f"""
    WITH cnt AS ({_CNT_SQL}
    ), n AS (SELECT t, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY t
    ), pairs AS ({_PAIRS_SQL}
    ), merged AS (
      SELECT p.ta, p.tb, p.n_a, p.n_b, c.v,
             SUM(CASE WHEN c.t = p.ta THEN c.c ELSE 0 END) AS ca,
             SUM(CASE WHEN c.t = p.tb THEN c.c ELSE 0 END) AS cb
      FROM pairs p JOIN cnt c ON c.t = p.ta OR c.t = p.tb
      GROUP BY p.ta, p.tb, p.n_a, p.n_b, c.v
    ), pos AS (
      SELECT ta, tb, n_a, n_b, ca, cb, ca + cb AS c,
             n_a + n_b AS nn,
             (SUM(ca + cb) OVER w) - (ca + cb) + 1 AS pl,
             SUM(ca + cb) OVER w AS pr
      FROM merged
      WINDOW w AS (PARTITION BY ta, tb ORDER BY v ROWS UNBOUNDED PRECEDING)
    ), blocks AS (
      SELECT ta, tb, n_a, n_b, nn, ca, c,
             CAST({_ST_S_SQL} AS BIGINT) AS s
      FROM pos
    ), agg AS (
      SELECT ta, tb, n_a, n_b, ANY_VALUE(nn) AS nn,
             SUM((CAST(ca AS HUGEINT) * s * {ST_SCALE}) // c) AS t_fp,
             SUM((CAST(s AS HUGEINT) * s * {ST_SCALE}) // c) AS s2_fp
      FROM blocks GROUP BY ta, tb, n_a, n_b
    )
    SELECT ta AS type_a, tb AS type_b, n_a, n_b,
           round(CAST(CAST(t_fp AS VARCHAR) AS DOUBLE) / {ST_SCALE}.0, 6)
             AS st_t,
           round((CAST(CAST(t_fp AS VARCHAR) AS DOUBLE) / {ST_SCALE}.0
                  - CAST(n_a AS DOUBLE) * (nn + 1) / 2.0)
                 / sqrt(CAST(n_a AS DOUBLE) * n_b
                        / (CAST(nn AS DOUBLE) * (nn - 1.0))
                        * (CAST(CAST(s2_fp AS VARCHAR) AS DOUBLE)
                             / {ST_SCALE}.0
                           - CAST(nn AS DOUBLE) * (nn + 1.0) * (nn + 1.0)
                             / 4.0)), 6) AS z_st
    FROM agg
    """,
)
def q_siegel_tukey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Siegel–Tukey zigzag-rank dispersion z for every event-type
    pair under the truncated fixed-point midrank convention (module
    docstring): T = Σ_a midrank_ST, standardized by the exact
    tie-corrected permutation moments — closed-form block score sums,
    two fixed-point term classes, one z composition."""
    # r16: the zigzag block-score census runs driver-side over the
    # collected counts spine (rank_kit) — the same closed-form block
    # sums in exact Python-int arithmetic (// on the non-negative
    # operands equals the oracle's HUGEINT floor division; no LONG
    # wrap possible); the z composition below is unchanged Spark
    # expressions.
    from decimal import Decimal

    from timestream_travel_spark.operators.rank_kit import (
        counts_by_type,
        merged_pair,
        type_pairs,
    )
    from timestream_travel_spark.tables import bounded_df

    def st_block_score(pl: int, pr: int, nn: int) -> int:
        s = 0
        lim = min(pr, nn // 2)
        if pl <= lim:
            s += (lim * (lim + 1) - (pl - 1) * pl) - ((lim + 1) // 2 - pl // 2)
        if nn % 2 == 1 and pl <= (nn + 1) // 2 <= pr:
            s += nn
        g = max(pl, nn // 2 + 1 + nn % 2)
        if g <= pr:
            s += (
                (nn + 1 - g) * (nn + 2 - g) - (nn - pr) * (nn + 1 - pr)
            ) - ((nn + 1 - g) // 2 - (nn - pr) // 2)
        return s

    kit = counts_by_type(spark, sf_dir)
    rows = []
    for ta, tb in type_pairs(kit):
        _, ca, cb = merged_pair(kit, ta, tb)
        n_a, n_b = int(ca.sum()), int(cb.sum())
        nn_i = n_a + n_b
        t_fp = s2_fp = 0
        pr = 0
        for a_, c_ in zip(ca.tolist(), (ca + cb).tolist()):
            pl = pr + 1
            pr += c_
            s = st_block_score(pl, pr, nn_i)
            t_fp += (a_ * s * ST_SCALE) // c_
            s2_fp += (s * s * ST_SCALE) // c_
        rows.append((ta, tb, n_a, n_b, nn_i, Decimal(t_fp), Decimal(s2_fp)))
    agg = bounded_df(
        spark,
        rows,
        "ta string, tb string, n_a bigint, n_b bigint, nn bigint,"
        " t_fp decimal(38,0), s2_fp decimal(38,0)",
    )
    scale = F.lit(float(ST_SCALE))
    t_d = F.col("t_fp").cast("double") / scale
    s2_d = F.col("s2_fp").cast("double") / scale
    nn = F.col("nn")
    mean = F.col("n_a").cast("double") * (nn + 1) / F.lit(2.0)
    var = (
        F.col("n_a").cast("double")
        * F.col("n_b")
        / (nn.cast("double") * (nn - F.lit(1.0)))
        * (s2_d - nn.cast("double") * (nn + F.lit(1.0)) * (nn + F.lit(1.0)) / F.lit(4.0))
    )
    return agg.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        "n_a",
        "n_b",
        F.round(t_d, 6).alias("st_t"),
        F.round((t_d - mean) / F.sqrt(var), 6).alias("z_st"),
    )


# -------------------------------------------- Gini mean difference

_GMD_CNT_SQL = """
      SELECT event_type AS t, CAST(round(value * 100, 0) AS BIGINT) AS vc,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
"""


@query(
    "q_gini_mean_difference",
    oracle=f"""
    WITH cnt AS ({_GMD_CNT_SQL}
    ), cums AS (
      SELECT t, vc, c,
             SUM(c) OVER (PARTITION BY t ORDER BY vc
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM cnt
    ), agg AS (
      SELECT t, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(vc * c) AS BIGINT) AS s0,
             CAST(SUM(vc * (cum * (cum + 1)
                            - (cum - c) * (cum - c + 1))) AS BIGINT) AS s1_2
      FROM cums GROUP BY t
    )
    SELECT t AS event_type, n,
           round(CAST(2 * (s1_2 - (n + 1) * s0) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (n - 1) * 100.0), 6) AS gmd,
           CASE WHEN s0 <> 0 THEN
             round(CAST(2 * (s1_2 - (n + 1) * s0) AS DOUBLE)
                   / (2.0 * (n - 1) * CAST(s0 AS DOUBLE)), 6)
           END AS rel_gini
    FROM agg
    """,
)
def q_gini_mean_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini mean difference E|X−X'| per event type (in value units)
    plus the relative Gini GMD/(2·mean) — the block-summed
    sorted-rank identity over the cents count table (q_token_gini
    form), exact integers and two flat divisions."""
    # r16: the block-summed sorted-rank census runs driver-side over
    # the collected counts spine (rank_kit; cents via the Decimal
    # bridge, exact integers); the two divisions below are unchanged
    # Spark expressions.
    from timestream_travel_spark.operators.rank_kit import cents_by_type
    from timestream_travel_spark.tables import bounded_df

    rows = []
    for t, blocks in sorted(cents_by_type(spark, sf_dir).items()):
        n = s0 = s1_2 = cum = 0
        for vc in sorted(blocks):
            c_ = blocks[vc]
            prev = cum
            cum += c_
            n += c_
            s0 += vc * c_
            s1_2 += vc * (cum * (cum + 1) - prev * (prev + 1))
        rows.append((t, n, s0, s1_2))
    agg = bounded_df(
        spark, rows, "t string, n bigint, s0 bigint, s1_2 bigint"
    )
    n, s0 = F.col("n"), F.col("s0")
    num = 2 * (F.col("s1_2") - (n + 1) * s0)
    return agg.select(
        F.col("t").alias("event_type"),
        "n",
        F.round(
            num.cast("double") / (n.cast("double") * (n - 1) * F.lit(100.0)), 6
        ).alias("gmd"),
        F.when(
            s0 != 0,
            F.round(
                num.cast("double") / (F.lit(2.0) * (n - 1) * s0.cast("double")),
                6,
            ),
        ).alias("rel_gini"),
    )


# ------------------------------------------------- Bowley + Moors


@query(
    "q_bowley_moors",
    oracle=f"""
    WITH cnt AS ({_GMD_CNT_SQL}
    ), cums AS (
      SELECT t, vc,
             SUM(c) OVER (PARTITION BY t ORDER BY vc
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER (PARTITION BY t) AS n
      FROM cnt
    ), oct AS (
      SELECT t, CAST(MAX(n) AS BIGINT) AS n,
             MIN(CASE WHEN cum >= (1 * n + 7) // 8 THEN vc END) AS e1,
             MIN(CASE WHEN cum >= (2 * n + 7) // 8 THEN vc END) AS e2,
             MIN(CASE WHEN cum >= (3 * n + 7) // 8 THEN vc END) AS e3,
             MIN(CASE WHEN cum >= (4 * n + 7) // 8 THEN vc END) AS e4,
             MIN(CASE WHEN cum >= (5 * n + 7) // 8 THEN vc END) AS e5,
             MIN(CASE WHEN cum >= (6 * n + 7) // 8 THEN vc END) AS e6,
             MIN(CASE WHEN cum >= (7 * n + 7) // 8 THEN vc END) AS e7
      FROM cums GROUP BY t
    )
    SELECT t AS event_type, n,
           CAST(e2 AS BIGINT) AS q1_cents, CAST(e4 AS BIGINT) AS q2_cents,
           CAST(e6 AS BIGINT) AS q3_cents,
           CASE WHEN e6 > e2 THEN
             round(CAST(e6 + e2 - 2 * e4 AS DOUBLE) / (e6 - e2), 6)
           END AS bowley_skew,
           CASE WHEN e6 > e2 THEN
             round(CAST((e7 - e5) + (e3 - e1) AS DOUBLE) / (e6 - e2), 6)
           END AS moors_kurt
    FROM oct
    """,
)
def q_bowley_moors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowley quartile skewness (Q3+Q1−2Q2)/(Q3−Q1) and Moors octile
    kurtosis ((E7−E5)+(E3−E1))/(E6−E2) per event type — type-1
    octiles on integer cents (smallest value whose cumulative count
    reaches ⌈k·n/8⌉), two guarded flat divisions."""
    # r16: the type-1 octile selection runs driver-side over the
    # collected cents census (rank_kit); the two guarded divisions
    # below are unchanged Spark expressions.
    from timestream_travel_spark.operators.rank_kit import cents_by_type
    from timestream_travel_spark.tables import bounded_df

    rows = []
    for t, blocks in sorted(cents_by_type(spark, sf_dir).items()):
        vs = sorted(blocks)
        n = sum(blocks.values())

        def _sel(cut: int):
            cm = 0
            for x in vs:
                cm += blocks[x]
                if cm >= cut:
                    return x
            return None

        rows.append(
            (t, n) + tuple(_sel((k * n + 7) // 8) for k in range(1, 8))
        )
    oct_ = bounded_df(
        spark,
        rows,
        "t string, n bigint, "
        + ", ".join(f"e{k} bigint" for k in range(1, 8)),
    )
    e2, e4, e6 = F.col("e2"), F.col("e4"), F.col("e6")
    return oct_.select(
        F.col("t").alias("event_type"),
        "n",
        e2.cast("bigint").alias("q1_cents"),
        e4.cast("bigint").alias("q2_cents"),
        e6.cast("bigint").alias("q3_cents"),
        F.when(
            e6 > e2, F.round((e6 + e2 - 2 * e4).cast("double") / (e6 - e2), 6)
        ).alias("bowley_skew"),
        F.when(
            e6 > e2,
            F.round(
                ((F.col("e7") - F.col("e5")) + (F.col("e3") - F.col("e1"))).cast(
                    "double"
                )
                / (e6 - e2),
                6,
            ),
        ).alias("moors_kurt"),
    )


# ------------------------------------- bias-corrected Cramér's V


@query(
    "q_cramers_v_corrected",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS r, o_orderstatus AS cl,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders GROUP BY 1, 2
    ), m AS (
      SELECT r, cl, o,
             SUM(o) OVER (PARTITION BY r) AS nr,
             SUM(o) OVER (PARTITION BY cl) AS nc,
             CAST(SUM(o) OVER () AS BIGINT) AS n
      FROM cells
    ), terms AS (
      SELECT n,
             CAST((CAST(o AS DOUBLE) * o * n) / (CAST(nr AS DOUBLE) * nc)
                  AS DECIMAL(24,8)) AS t
      FROM m
    ), dims AS (
      SELECT CAST(COUNT(DISTINCT r) AS BIGINT) AS kr,
             CAST(COUNT(DISTINCT cl) AS BIGINT) AS kc
      FROM cells
    ), chi AS (
      SELECT t.n, d.kr, d.kc,
             CAST(CAST(SUM(t.t) AS VARCHAR) AS DOUBLE) - t.n AS chi2
      FROM terms t CROSS JOIN dims d
      GROUP BY t.n, d.kr, d.kc
    )
    SELECT n, kr AS n_rows, kc AS n_cols, round(chi2, 6) AS chi2,
           round(greatest(chi2 / n
                          - CAST((kr - 1) * (kc - 1) AS DOUBLE) / (n - 1),
                          0.0), 6) AS phi2_corrected,
           round(sqrt(greatest(chi2 / n
                               - CAST((kr - 1) * (kc - 1) AS DOUBLE) / (n - 1),
                               0.0)
                      / (least(kr - CAST((kr - 1) * (kr - 1) AS DOUBLE)
                                    / (n - 1),
                               kc - CAST((kc - 1) * (kc - 1) AS DOUBLE)
                                    / (n - 1)) - 1.0)), 6)
             AS cramers_v_corrected
    FROM chi
    """,
)
def q_cramers_v_corrected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bergsma bias-corrected Cramér's V on the (order priority ×
    order status) table: φ̃² = max(0, φ² − (r−1)(c−1)/(n−1)),
    Ṽ = sqrt(φ̃² / min(r̃−1, c̃−1)) with r̃ = r − (r−1)²/(n−1) —
    χ² via the Σo²N/(RC) − N identity with DECIMAL(24,8)-quantized
    terms (the q_cramers_v spine), then identically-shaped double
    compositions."""
    # r16: the integer cells come from the session-cached collect
    # shared with GK lambda / Theil's U (_order_cells); every double
    # composition below stays unchanged Spark expressions over the
    # bounded cells.
    from timestream_travel_spark.operators.analytics24 import _order_cells
    from timestream_travel_spark.tables import bounded_df

    cells = bounded_df(
        spark, _order_cells(spark, sf_dir), "r string, cl string, o bigint"
    )
    m = cells.select(
        "r",
        "cl",
        "o",
        F.sum("o").over(Window.partitionBy("r")).alias("nr"),
        F.sum("o").over(Window.partitionBy("cl")).alias("nc"),
        F.sum("o").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    terms = m.select(
        "n",
        (
            (F.col("o").cast("double") * F.col("o") * F.col("n"))
            / (F.col("nr").cast("double") * F.col("nc"))
        )
        .cast("decimal(24,8)")
        .alias("t"),
    )
    dims = cells.agg(
        F.count_distinct("r").cast("bigint").alias("kr"),
        F.count_distinct("cl").cast("bigint").alias("kc"),
    )
    chi = (
        terms.crossJoin(F.broadcast(dims))
        .groupBy("n", "kr", "kc")
        .agg((F.sum("t").cast("double") - F.col("n")).alias("chi2"))
    )
    n, kr, kc = F.col("n"), F.col("kr"), F.col("kc")
    chi2 = F.col("chi2")
    phi2c = F.greatest(
        chi2 / n - ((kr - 1) * (kc - 1)).cast("double") / (n - 1), F.lit(0.0)
    )
    r_t = kr - ((kr - 1) * (kr - 1)).cast("double") / (n - 1)
    c_t = kc - ((kc - 1) * (kc - 1)).cast("double") / (n - 1)
    return chi.select(
        "n",
        kr.alias("n_rows"),
        kc.alias("n_cols"),
        F.round(chi2, 6).alias("chi2"),
        F.round(phi2c, 6).alias("phi2_corrected"),
        F.round(
            F.sqrt(phi2c / (F.least(r_t, c_t) - F.lit(1.0))), 6
        ).alias("cramers_v_corrected"),
    )
