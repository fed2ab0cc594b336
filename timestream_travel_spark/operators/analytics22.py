"""Analytics, part B (promoted into load_all()'s round-13 tail): the remaining classical
two-sample machinery — the Ansari–Bradley dispersion test (Ansari &
Bradley, AMS 1960), the Lepage combined location-scale test (Lepage,
Biometrika 1971 — standardized Wilcoxon² + standardized
Ansari–Bradley², the rank analogue of a joint mean/variance test),
and the Hodges–Lehmann two-sample shift estimator (Hodges & Lehmann,
AMS 1963 — the median of all n_a·n_b pairwise differences, the
robust effect-size companion to the already-green Mann–Whitney U).

Exactness design:
- Ansari–Bradley scores fold the doubled midranks symmetrically:
  a2 = min(r2, 2(N+1) − r2) is an exact integer per merged distinct
  value; T, ΣA and ΣA² (quadratic only — no quartic here) stay in
  BIGINT/DECIMAL(38,0), and z standardizes by the exact tie-robust
  permutation moments (the q_mood_scale_test form);
- Lepage reuses the same doubled midranks for Wilcoxon's rank sum
  (midrank mean is ALWAYS (N+1)/2, ties or not, so only the second
  moment needs the census) and the AB scores above; L = U² + V² is
  one flat composition of the two standardized statistics;
- Hodges–Lehmann NEVER materializes the pairwise-difference grid
  (even the distinct-value grid is |domain|² ≈ 1e8 rows per pair at
  sf0.1 — the first cut timed out on exactly that): the k-th
  smallest difference is found by BINARY SEARCH over integer cents,
  each probe a merged-rank count over the two DOMAIN-bounded
  distinct-cents count tables, which are collected once and probed
  driver-side (bounded-backbone pattern — see the query docstring).
  The DuckDB oracle unrolls the identical {HL_ITERS}-step search
  with ASOF-joined cumulative counts (MATERIALIZED per step — a
  plain CTE chain re-executes per reference and goes exponential).

Scale shape: one (type, value) count reduce; the rank tests run on
the value-domain-bounded merged table; the HL search does
{HL_ITERS} probes of O(|domain|) work each — no stage anywhere is
quadratic in the domain or linear in raw rows beyond the reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.analytics5 import _CNT_SQL, _counts, _pair_grid
from timestream_travel_spark.registry import query

# merged per-pair count table with doubled midranks (the analytics19
# Brunner–Munzel spine, reused verbatim by both rank tests here)
_AB_BASE_SQL = f"""
    WITH cnt AS ({_CNT_SQL}
    ), n AS (SELECT t, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY t
    ), pairs AS (
      SELECT a.t AS ta, b.t AS tb, a.n AS n_a, b.n AS n_b
      FROM n a JOIN n b ON a.t < b.t
    ), merged AS (
      SELECT p.ta, p.tb, p.n_a, p.n_b, c.v,
             SUM(CASE WHEN c.t = p.ta THEN c.c ELSE 0 END) AS ca,
             SUM(CASE WHEN c.t = p.tb THEN c.c ELSE 0 END) AS cb
      FROM pairs p JOIN cnt c ON c.t = p.ta OR c.t = p.tb
      GROUP BY p.ta, p.tb, p.n_a, p.n_b, c.v
    ), ranks AS (
      SELECT ta, tb, n_a, n_b, ca, cb,
             2 * (SUM(ca + cb) OVER w) - (ca + cb) + 1 AS r2,
             least(2 * (SUM(ca + cb) OVER w) - (ca + cb) + 1,
                   2 * (n_a + n_b + 1)
                   - (2 * (SUM(ca + cb) OVER w) - (ca + cb) + 1)) AS a2
      FROM merged
      WINDOW w AS (PARTITION BY ta, tb ORDER BY v ROWS UNBOUNDED PRECEDING)
    ), agg AS (
      SELECT ta, tb, n_a, n_b,
             SUM(CAST(ca * a2 AS DECIMAL(38,0))) AS t_ab,
             SUM(CAST((ca + cb) * a2 AS DECIMAL(38,0))) AS s_ab,
             SUM(CAST((ca + cb) * a2 AS DECIMAL(38,0)) * a2) AS s_ab2,
             SUM(CAST(ca * r2 AS DECIMAL(38,0))) AS t_w,
             SUM(CAST((ca + cb) * r2 AS DECIMAL(38,0)) * r2) AS s_w2
      FROM ranks GROUP BY ta, tb, n_a, n_b
    )
"""

# standardized AB and Wilcoxon z expressions over the exact aggregates
# (both doubled-scale; z is invariant). nn = n_a + n_b.
_Z_AB = """
           (CAST(CAST(t_ab AS VARCHAR) AS DOUBLE)
            - n_a * CAST(CAST(s_ab AS VARCHAR) AS DOUBLE) / (n_a + n_b))
           / sqrt(CAST(n_a AS DOUBLE) * n_b
                  / ((n_a + n_b) * (n_a + n_b - 1.0))
                  * (CAST(CAST(s_ab2 AS VARCHAR) AS DOUBLE)
                     - CAST(CAST(s_ab AS VARCHAR) AS DOUBLE)
                       * CAST(CAST(s_ab AS VARCHAR) AS DOUBLE)
                       / (n_a + n_b)))
"""
_Z_W = """
           (CAST(CAST(t_w AS VARCHAR) AS DOUBLE)
            - CAST(n_a AS DOUBLE) * (n_a + n_b + 1))
           / sqrt(CAST(n_a AS DOUBLE) * n_b
                  / ((n_a + n_b) * (n_a + n_b - 1.0))
                  * (CAST(CAST(s_w2 AS VARCHAR) AS DOUBLE)
                     - CAST(n_a + n_b AS DOUBLE) * (n_a + n_b + 1)
                       * (n_a + n_b + 1)))
"""


def _rank_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact twin of _AB_BASE_SQL's `agg` table.

    r16: the doubled-midrank/Ansari-score census runs driver-side
    over the collected counts spine (rank_kit; Python ints reproduce
    the DECIMAL(38,0) widenings); the z compositions in the two
    consumers are unchanged Spark expressions."""
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
        nn2 = 2 * (n_a + n_b + 1)
        t_ab = s_ab = s_ab2 = t_w = s_w2 = 0
        cum = 0
        for a_, b_ in zip(ca.tolist(), cb.tolist()):
            cp = a_ + b_
            cum += cp
            r2 = 2 * cum - cp + 1
            a2 = min(r2, nn2 - r2)
            t_ab += a_ * a2
            s_ab += cp * a2
            s_ab2 += cp * a2 * a2
            t_w += a_ * r2
            s_w2 += cp * r2 * r2
        rows.append(
            (ta, tb, n_a, n_b)
            + tuple(Decimal(x) for x in (t_ab, s_ab, s_ab2, t_w, s_w2))
        )
    return bounded_df(
        spark,
        rows,
        "ta string, tb string, n_a bigint, n_b bigint, "
        "t_ab decimal(38,0), s_ab decimal(38,0), s_ab2 decimal(38,0), "
        "t_w decimal(38,0), s_w2 decimal(38,0)",
    )


def _z_ab_col() -> F.Column:
    dbl = lambda name: F.col(name).cast("double")  # noqa: E731
    nn = F.col("n_a") + F.col("n_b")
    return (dbl("t_ab") - F.col("n_a") * dbl("s_ab") / nn) / F.sqrt(
        F.col("n_a").cast("double")
        * F.col("n_b")
        / (nn * (nn - F.lit(1.0)))
        * (dbl("s_ab2") - dbl("s_ab") * dbl("s_ab") / nn)
    )


def _z_w_col() -> F.Column:
    dbl = lambda name: F.col(name).cast("double")  # noqa: E731
    nn = F.col("n_a") + F.col("n_b")
    return (
        dbl("t_w") - F.col("n_a").cast("double") * (nn + 1)
    ) / F.sqrt(
        F.col("n_a").cast("double")
        * F.col("n_b")
        / (nn * (nn - F.lit(1.0)))
        * (dbl("s_w2") - nn.cast("double") * (nn + 1) * (nn + 1))
    )


@query(
    "q_ansari_bradley",
    oracle=f"""{_AB_BASE_SQL}
    SELECT ta AS type_a, tb AS type_b, n_a, n_b,
           CAST(CAST(t_ab AS VARCHAR) AS DOUBLE) / 2.0 AS ab_stat,
           round({_Z_AB}, 6) AS z_ab
    FROM agg
    """,
)
def q_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari–Bradley dispersion test for every event-type pair:
    scores min(R, N+1−R) fold the midranks symmetrically (small
    scores at both extremes ⇒ a MORE dispersed sample collects
    smaller scores), T = Σ_a scores, standardized by the exact
    tie-robust permutation moments. Doubled midranks keep every
    aggregate integral; ab_stat is T halved back to the classical
    scale (exact — T is even-denominated)."""
    agg = _rank_aggregates(spark, sf_dir)
    return agg.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        "n_a",
        "n_b",
        (F.col("t_ab").cast("double") / F.lit(2.0)).alias("ab_stat"),
        F.round(_z_ab_col(), 6).alias("z_ab"),
    )


@query(
    "q_lepage_test",
    oracle=f"""{_AB_BASE_SQL}
    SELECT ta AS type_a, tb AS type_b, n_a, n_b,
           round({_Z_W}, 6) AS z_wilcoxon,
           round({_Z_AB}, 6) AS z_ab,
           round(({_Z_W}) * ({_Z_W}) + ({_Z_AB}) * ({_Z_AB}), 6) AS l_lepage
    FROM agg
    """,
)
def q_lepage_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lepage's combined location-scale test: L = Z_Wilcoxon² +
    Z_AnsariBradley² (asymptotically χ²₂ under H₀ — sensitive to a
    shift OR a scale change). The Wilcoxon mean needs no tie census
    (midranks always average (N+1)/2); both second moments come from
    the same exact doubled-midrank aggregate table; L is one flat
    composition."""
    agg = _rank_aggregates(spark, sf_dir)
    zw, zab = _z_w_col(), _z_ab_col()
    return agg.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        "n_a",
        "n_b",
        F.round(zw, 6).alias("z_wilcoxon"),
        F.round(zab, 6).alias("z_ab"),
        F.round(zw * zw + zab * zab, 6).alias("l_lepage"),
    )


# ---------------------------------------------- Hodges–Lehmann shift
# The naive estimator materializes the n_a·n_b pairwise-difference
# grid — at sf0.1 the distinct-value grid alone is ~10k² = 1e8 rows
# PER PAIR through a single-task window (measured: the first cut of
# this query timed out the 3-SF gate). The scale-correct form is a
# SELECTION problem: the k-th smallest difference is found by binary
# search over integer CENTS, where each probe asks "how many pairs
# have difference ≤ δ" — a merged-rank count over the two bounded
# distinct-value tables, never a grid. {HL_ITERS} fixed iterations
# cover the full cent range (2^{HL_ITERS} > max−min spread).
HL_ITERS = 17


def _hl_sql() -> str:
    ctes = [
        f"cnt0 AS ({_CNT_SQL})",
        "cnt AS MATERIALIZED (SELECT t, CAST(round(v * 100, 0) AS BIGINT)"
        " AS vc, c FROM cnt0)",
        "n AS (SELECT t, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY t)",
        "bounds AS (SELECT t, MIN(vc) AS mn, MAX(vc) AS mx"
        " FROM cnt GROUP BY t)",
        "cuma AS MATERIALIZED (SELECT t, vc,"
        " CAST(SUM(c) OVER (PARTITION BY t ORDER BY vc"
        " ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM cnt)",
        # DISTINCT: an odd n_a·n_b makes both middle order statistics
        # the SAME k — duplicate (ta, tb, k) state rows would double
        # every probe count after the GROUP BY (measured: exactly the
        # odd-pair rows diverged); the final SELECT restores the
        # double weight by parity instead.
        """s0 AS (
      SELECT DISTINCT a.t AS ta, b.t AS tb, a.n AS n_a, b.n AS n_b,
             CASE WHEN kk.kk = 1 THEN (a.n * b.n + 1) // 2
                  ELSE (a.n * b.n + 2) // 2 END AS k,
             bb.mn - ba.mx AS lo, bb.mx - ba.mn AS hi
      FROM n a JOIN n b ON a.t < b.t
      JOIN bounds ba ON ba.t = a.t JOIN bounds bb ON bb.t = b.t
      CROSS JOIN (SELECT 1 AS kk UNION ALL SELECT 2) kk
    )""",
    ]
    for i in range(1, HL_ITERS + 1):
        prev = f"s{i - 1}"
        ctes.append(
            f"""p{i} AS MATERIALIZED (
      SELECT *, CAST(floor((lo + hi) / 2.0) AS BIGINT) AS mid FROM {prev}
    ), pr{i} AS MATERIALIZED (
      SELECT p.ta, p.tb, p.k, p.n_a, p.n_b,
             cb.vc - p.mid - 1 AS key, cb.c AS cb
      FROM p{i} p JOIN cnt cb ON cb.t = p.tb
    ), c{i} AS MATERIALIZED (
      SELECT pr.ta, pr.tb, pr.k,
             CAST(ANY_VALUE(pr.n_a) * ANY_VALUE(pr.n_b)
                  - SUM(pr.cb * COALESCE(ca.cum, 0)) AS BIGINT) AS cnt_le
      FROM pr{i} pr
      ASOF LEFT JOIN cuma ca ON ca.t = pr.ta AND pr.key >= ca.vc
      GROUP BY 1, 2, 3
    ), s{i} AS MATERIALIZED (
      SELECT p.ta, p.tb, p.n_a, p.n_b, p.k,
             CASE WHEN p.lo >= p.hi THEN p.lo
                  WHEN c.cnt_le >= p.k THEN p.lo ELSE p.mid + 1 END AS lo,
             CASE WHEN p.lo >= p.hi THEN p.hi
                  WHEN c.cnt_le >= p.k THEN p.mid ELSE p.hi END AS hi
      FROM p{i} p JOIN c{i} c
        ON c.ta = p.ta AND c.tb = p.tb AND c.k = p.k
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT ta AS type_a, tb AS type_b, n_a, n_b,
           CAST(SUM(hi * CASE WHEN (n_a * n_b) % 2 = 1
                              THEN 2 ELSE 1 END) AS DOUBLE)
           / 200.0 AS hl_shift
    FROM s{HL_ITERS} GROUP BY 1, 2, 3, 4
    """


@query("q_hodges_lehmann_shift", oracle=_hl_sql())
def q_hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann two-sample shift estimate for every event-type
    pair: the median of all n_a·n_b pairwise differences (y − x),
    WITHOUT materializing the grid — a binary search over integer
    cents finds the two middle order statistics, each probe a
    merged-rank count over the two distinct-cents count tables.

    The count table is DOMAIN-bounded: one row per (type, cent), so
    ≤ |types|·(value-spread·100) rows regardless of event count (49k
    at sf0.1; the same bound the DuckDB oracle's materialized cuma
    CTE relies on). The distributed stage is the groupBy count over
    raw events; the selection then collects the bounded table ONCE
    and runs entirely driver-side on numpy cumulative arrays — the
    bounded-backbone pattern (cf. Louvain, graph11). The r13
    implementation probed via per-round Spark window jobs (~5 jobs,
    ~10 s at sf0.1 and 2.5× that inside a busy bench session); zero
    in-loop jobs removes both costs. For a genuinely unbounded value
    domain the scale path is re-quantization to a coarser fixed grid
    + a final exact pass over the one surviving bracket, or the r13
    distributed merged-rank probe (git history).

    The SQL oracle keeps the unrolled binary chain — same selection,
    same exact integer answer; the emitted estimate is exact integer
    cents halved once."""
    import numpy as np

    # r16: reuse the session-cached collected spine (rank_kit) and
    # quantize to cents driver-side — Spark's round(v*100) is
    # BigDecimal(Double.toString) HALF_UP, which Decimal(repr)
    # reproduces exactly (the trimean/welch bridge).
    from timestream_travel_spark.operators.rank_kit import cents_by_type

    by_t: dict[str, list[tuple[int, int]]] = {
        t: list(acc.items())
        for t, acc in cents_by_type(spark, sf_dir).items()
    }
    vcs: dict[str, "np.ndarray"] = {}
    cum: dict[str, "np.ndarray"] = {}
    info: dict[str, tuple[int, int, int]] = {}  # t -> (n, mn, mx)
    for t, pairs in by_t.items():
        pairs.sort()
        v = np.array([p[0] for p in pairs], dtype=np.int64)
        c = np.cumsum(np.array([p[1] for p in pairs], dtype=np.int64))
        vcs[t], cum[t] = v, c
        info[t] = (int(c[-1]), int(v[0]), int(v[-1]))

    cnts = {t: np.diff(cum[t], prepend=0) for t in cum}  # raw c per vc
    cum0 = {t: np.concatenate(([0], cum[t])) for t in cum}

    def cnt_le(ta: str, tb: str, mid: int) -> int:
        # pairs with y − x ≤ mid ⟺ x ≥ y − mid; count via the strict
        # complement: n_a·n_b − Σ_y c_b(y)·cumA(y − mid − 1)
        idx = np.searchsorted(vcs[ta], vcs[tb] - mid - 1, side="right")
        cum_lt = int((cnts[tb] * cum0[ta][idx]).sum())
        return info[ta][0] * info[tb][0] - cum_lt

    types = sorted(info)
    out_rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            (n_a, mn_a, mx_a), (n_b, mn_b, mx_b) = info[ta], info[tb]
            np_ = n_a * n_b
            k_lo, k_hi = (np_ + 1) // 2, (np_ + 2) // 2
            total = 0
            for k, weight in ((k_lo, 1), (k_hi, 1)) if k_lo != k_hi else ((k_lo, 2),):
                lo, hi = mn_b - mx_a, mx_b - mn_a
                for _ in range(HL_ITERS):
                    if lo >= hi:
                        break
                    # Python // floors, matching the oracle's
                    # floor((lo+hi)/2.0) on negative midpoints too
                    mid = (lo + hi) // 2
                    if cnt_le(ta, tb, mid) >= k:
                        hi = mid
                    else:
                        lo = mid + 1
                total += weight * hi
            out_rows.append((ta, tb, n_a, n_b, total / 200.0))
    return spark.createDataFrame(
        out_rows,
        "type_a string, type_b string, n_a long, n_b long, hl_shift double",
    )
