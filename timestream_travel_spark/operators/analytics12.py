"""Round-10 statistics (STAGED — see registry.STAGED_MODULES; the
round-9 registry is frozen at the driver's ~50-slot drain capacity):
Yule's Q association (Yule, JRSS 1900), Kendall's coefficient of
concordance W (Kendall & Babington Smith, Ann. Math. Stat. 1939),
the paired sign test (Arbuthnott 1710 / Dixon & Mood 1946), the
Lo–MacKinlay variance-ratio test (Rev. Fin. Studies 1988), and
Hellinger / Bhattacharyya / total-variation distances between
per-source unigram distributions (Bhattacharyya 1943).

Exactness: Yule's Q and the sign test are pure integer census
statistics; Kendall's W reuses the Friedman doubled-midrank
machinery (analytics8) — W = χ²_F / (n·(k−1)) is one extra flat
factor; the variance ratio scales out the mean (n·d_t − ΣD is exact
DECIMAL) so both variances are exact sums until the final ratio;
the distribution distances quantize each √(p·q) term to DECIMAL
(transcendental, q_unigram_logprob idiom) while TV stays an exact
integer cross-difference |c_a·N_b − c_b·N_a| summed before ONE
division.

Scale: (user, day) / daily / token reduces — the established
map-side-combined cost classes; the source-pair grid is dense and
bounded (|sources|²·vocab, the js_divergence shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.analytics8 import EVENT_TYPES, _DAILY_SQL, _daily
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

VR_Q = 5  # variance-ratio aggregation horizon (days)
SIGN_A, SIGN_B = "click", "view"  # paired daily series for the sign test


@query(
    "q_yule_q",
    oracle="""
    WITH units AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ra,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS rb
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ), cells AS (
      SELECT CAST(SUM(ra * rb) AS BIGINT) AS a,
             CAST(SUM(ra * (1 - rb)) AS BIGINT) AS b,
             CAST(SUM((1 - ra) * rb) AS BIGINT) AS c,
             CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS d
      FROM units
    )
    SELECT a, b, c, d,
           round(CAST(a * d - b * c AS DOUBLE) / (a * d + b * c), 6) AS yule_q
    FROM cells
    """,
)
def q_yule_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's Q association for the q_cohens_kappa 2×2 (clicked ×
    viewed per user-day): Q = (ad − bc)/(ad + bc) ∈ [−1, 1] — the
    odds-ratio transform that reads as a correlation. Integer cells,
    one flat division."""
    ev = load_table(spark, sf_dir, "events")
    units = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("ra"),
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("rb"),
    )
    cells = units.agg(
        F.sum(F.col("ra") * F.col("rb")).cast("bigint").alias("a"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("bigint").alias("c"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb"))).cast("bigint").alias("d"),
    )
    a, b, c, d = (F.col(x) for x in "abcd")
    return cells.select(
        a.alias("a"), b.alias("b"), c.alias("c"), d.alias("d"),
        F.round(
            (a * d - b * c).cast("double") / (a * d + b * c), 6
        ).alias("yule_q"),
    )


@query(
    "q_kendalls_w",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), full_days AS (
      SELECT day FROM daily GROUP BY day HAVING COUNT(*) = {len(EVENT_TYPES)}
    ), ranked AS (
      SELECT d.t, d.day,
             2 * RANK() OVER (PARTITION BY d.day ORDER BY d.v)
               + CAST(COUNT(*) OVER (PARTITION BY d.day, d.v) AS BIGINT)
               - 1 AS dr
      FROM daily d JOIN full_days f ON f.day = d.day
    ), rsum AS (
      SELECT t, CAST(SUM(dr) AS BIGINT) AS r2j, CAST(COUNT(*) AS BIGINT) AS n
      FROM ranked GROUP BY t
    ), agg AS (
      SELECT CAST(SUM(r2j * r2j) AS BIGINT) AS ssq,
             CAST(COUNT(*) AS BIGINT) AS k, MAX(n) AS n
      FROM rsum
    )
    SELECT n AS n_blocks, k,
           round((3.0 * ssq / (CAST(n AS DOUBLE) * k * (k + 1))
                  - 3.0 * n * (k + 1)) / (CAST(n AS DOUBLE) * (k - 1)), 6)
             AS kendalls_w
    FROM agg
    """,
)
def q_kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance: do the calendar days
    (judges) agree on how the {k} event types rank by daily level?
    W = χ²_F / (n·(k−1)) ∈ [0, 1] off the exact Friedman
    doubled-midrank machinery (analytics8) — 0 = no agreement, 1 =
    every day ranks the types identically."""
    # r16: the shared Friedman census runs driver-side
    # (rank_kit.friedman_r2 over the collected daily spine); the W
    # composition below is unchanged Spark expressions.
    from timestream_travel_spark.operators.rank_kit import (
        daily_rows,
        friedman_r2,
    )
    from timestream_travel_spark.tables import bounded_df

    r2j, nblocks = friedman_r2(daily_rows(spark, sf_dir), len(EVENT_TYPES))
    row = (
        (sum(s * s for s in r2j.values()), len(r2j), nblocks)
        if r2j
        else (None, 0, None)
    )
    agg = bounded_df(spark, [row], "ssq bigint, k bigint, n bigint")
    n, k, ssq = F.col("n"), F.col("k"), F.col("ssq")
    chi2 = 3.0 * ssq / (n.cast("double") * k * (k + 1)) - 3.0 * n * (k + 1)
    return agg.select(
        n.alias("n_blocks"),
        k.alias("k"),
        F.round(chi2 / (n.cast("double") * (k - 1)), 6).alias("kendalls_w"),
    )


@query(
    "q_sign_test",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), paired AS (
      SELECT a.day, a.v AS va, b.v AS vb
      FROM daily a JOIN daily b ON b.day = a.day
      WHERE a.t = '{SIGN_A}' AND b.t = '{SIGN_B}'
    )
    SELECT CAST(SUM(CASE WHEN va > vb THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN va < vb THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
           round((2.0 * SUM(CASE WHEN va > vb THEN 1 ELSE 0 END)
                  - (SUM(CASE WHEN va > vb THEN 1 ELSE 0 END)
                     + SUM(CASE WHEN va < vb THEN 1 ELSE 0 END)))
                 / sqrt(CAST(SUM(CASE WHEN va > vb THEN 1 ELSE 0 END)
                             + SUM(CASE WHEN va < vb THEN 1 ELSE 0 END)
                        AS DOUBLE)), 6) AS z
    FROM paired
    """,
)
def q_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test between the '{SIGN_A}' and '{SIGN_B}' daily
    level series (paired by calendar day): S⁺ vs S⁻ with ties
    dropped and the normal approximation z = (2S⁺ − m)/√m — the
    assumption-free companion to q_wilcoxon_signed_rank. Exact
    DECIMAL comparisons, integer counts, one flat z."""
    daily = _daily(spark, sf_dir)
    a = daily.filter(F.col("t") == SIGN_A).select("day", F.col("v").alias("va"))
    b = daily.filter(F.col("t") == SIGN_B).select("day", F.col("v").alias("vb"))
    paired = a.join(b, "day")
    pos = F.sum(F.when(F.col("va") > F.col("vb"), 1).otherwise(0))
    neg = F.sum(F.when(F.col("va") < F.col("vb"), 1).otherwise(0))
    m = pos + neg
    return paired.agg(
        pos.cast("bigint").alias("n_pos"),
        neg.cast("bigint").alias("n_neg"),
        F.round((2.0 * pos - m) / F.sqrt(m.cast("double")), 6).alias("z"),
    )


@query(
    "q_variance_ratio",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), idx AS (
      SELECT t, CAST(v AS DECIMAL(14,4)) AS v,
             row_number() OVER (PARTITION BY t ORDER BY day) AS i
      FROM daily
    ), d1 AS (
      SELECT a.t, CAST(b.v - a.v AS DECIMAL(15,4)) AS d
      FROM idx a JOIN idx b ON b.t = a.t AND b.i = a.i + 1
    ), dq AS (
      SELECT a.t, CAST(b.v - a.v AS DECIMAL(15,4)) AS d
      FROM idx a JOIN idx b ON b.t = a.t AND b.i = a.i + {VR_Q}
    ), s1 AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n, SUM(d) AS s,
             SUM(CAST(d AS DECIMAL(19,4)) * d) AS q
      FROM d1 GROUP BY t
    ), sq AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n, SUM(d) AS s,
             SUM(CAST(d AS DECIMAL(19,4)) * d) AS q
      FROM dq GROUP BY t
    )
    SELECT s1.t AS event_type, s1.n AS n_1, sq.n AS n_q,
           round(((CAST(CAST(sq.q AS VARCHAR) AS DOUBLE)
                    - CAST(CAST(sq.s AS VARCHAR) AS DOUBLE)
                      * CAST(CAST(sq.s AS VARCHAR) AS DOUBLE) / sq.n) / sq.n)
                 / ({VR_Q} * ((CAST(CAST(s1.q AS VARCHAR) AS DOUBLE)
                    - CAST(CAST(s1.s AS VARCHAR) AS DOUBLE)
                      * CAST(CAST(s1.s AS VARCHAR) AS DOUBLE) / s1.n) / s1.n)),
                 6) AS vr
    FROM s1 JOIN sq ON sq.t = s1.t
    """,
)
def q_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo–MacKinlay variance ratio VR({VR_Q}) per event type:
    population variance of {VR_Q}-day level changes over {VR_Q}× the
    variance of 1-day changes — 1 under a random walk, > 1 momentum,
    < 1 mean reversion. Differences and their squares are exact
    DECIMAL; each variance is (Q − S²/n)/n off bridged exact sums;
    one flat ratio."""
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("t").orderBy("day")
    idx = daily.select(
        "t",
        F.col("v").cast("decimal(14,4)").alias("v"),
        F.row_number().over(w).alias("i"),
    )

    def sums(lag: int):
        a = idx.select("t", F.col("v").alias("va"), F.col("i").alias("ia"))
        b = idx.select(
            F.col("t").alias("tb"), F.col("v").alias("vb"), F.col("i").alias("ib")
        )
        d = (
            a.join(b, (F.col("t") == F.col("tb")) & (F.col("ib") == F.col("ia") + lag))
            .select("t", (F.col("vb") - F.col("va")).cast("decimal(15,4)").alias("d"))
        )
        return d.groupBy("t").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("d").alias("s"),
            F.sum(F.col("d").cast("decimal(19,4)") * F.col("d")).alias("q"),
        )

    s1 = sums(1).select(
        "t", F.col("n").alias("n1"), F.col("s").alias("ss1"), F.col("q").alias("q1")
    )
    sq = sums(VR_Q).select(
        F.col("t").alias("tq"), F.col("n").alias("nq"),
        F.col("s").alias("ssq"), F.col("q").alias("qq"),
    )
    j = s1.join(sq, F.col("t") == F.col("tq"))
    var1 = (
        F.col("q1").cast("double")
        - F.col("ss1").cast("double") * F.col("ss1").cast("double") / F.col("n1")
    ) / F.col("n1")
    varq = (
        F.col("qq").cast("double")
        - F.col("ssq").cast("double") * F.col("ssq").cast("double") / F.col("nq")
    ) / F.col("nq")
    return j.select(
        F.col("t").alias("event_type"),
        F.col("n1").alias("n_1"),
        F.col("nq").alias("n_q"),
        F.round(varq / (VR_Q * var1), 6).alias("vr"),
    )


@query(
    "q_distribution_distances",
    oracle="""
    WITH words AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x <> '')) AS w
      FROM documents
    ), wc AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM words GROUP BY source, w
    ), n AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM wc GROUP BY source
    ), pairs AS (
      SELECT a.source AS sa, b.source AS sb, a.n AS na, b.n AS nb
      FROM n a JOIN n b ON a.source < b.source
    ), grid AS (
      SELECT p.sa, p.sb, p.na, p.nb, w.w,
             COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
      FROM pairs p
      JOIN (SELECT DISTINCT w FROM wc) w ON true
      LEFT JOIN wc ca ON ca.source = p.sa AND ca.w = w.w
      LEFT JOIN wc cb ON cb.source = p.sb AND cb.w = w.w
      WHERE COALESCE(ca.c, 0) + COALESCE(cb.c, 0) > 0
    ), terms AS (
      SELECT sa, sb, na, nb,
             CAST(sqrt(CAST(ca AS DOUBLE) * cb / (CAST(na AS DOUBLE) * nb))
                  AS DECIMAL(20,10)) AS bc_term,
             abs(ca * nb - cb * na) AS tv_num
      FROM grid
    )
    SELECT sa AS source_a, sb AS source_b,
           round(CAST(CAST(SUM(bc_term) AS VARCHAR) AS DOUBLE), 6)
             AS bhattacharyya,
           round(sqrt(greatest(1.0 - CAST(CAST(SUM(bc_term) AS VARCHAR)
                                          AS DOUBLE), 0.0)), 6) AS hellinger,
           round(CAST(SUM(tv_num) AS DOUBLE)
                 / (2.0 * CAST(MAX(na) AS DOUBLE) * MAX(nb)), 6)
             AS total_variation
    FROM terms GROUP BY sa, sb, na, nb
    """,
)
def q_distribution_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bhattacharyya coefficient, Hellinger distance and total
    variation between every source pair's unigram distributions:
    BC = Σ√(p·q), H = √(1−BC), TV = ½Σ|p−q| — the bounded-metric
    companions to q_js_divergence_sources (same dense pair×vocab
    grid off ONE token reduce). Each √(p·q) term quantizes to
    DECIMAL before the exact sum; TV's numerator is the exact
    integer |c_a·N_b − c_b·N_a| summed before a single division."""
    d = load_table(spark, sf_dir, "documents")
    from timestream_travel_spark.operators.llm_text6 import doc_words

    words = d.select("source", F.explode(doc_words("text")).alias("w"))
    wc = words.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    n = wc.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    a = n.select(F.col("source").alias("sa"), F.col("n").alias("na"))
    b = n.select(F.col("source").alias("sb"), F.col("n").alias("nb"))
    pairs = a.join(b, F.col("sa") < F.col("sb"))
    vocab = wc.select("w").distinct()
    ca = wc.select(
        F.col("source").alias("src_a"), F.col("w").alias("wa"), F.col("c").alias("ca")
    )
    cb = wc.select(
        F.col("source").alias("src_b"), F.col("w").alias("wb"), F.col("c").alias("cb")
    )
    grid = (
        pairs.join(F.broadcast(vocab))
        .join(ca, (F.col("sa") == F.col("src_a")) & (F.col("w") == F.col("wa")), "left")
        .join(cb, (F.col("sb") == F.col("src_b")) & (F.col("w") == F.col("wb")), "left")
        .select(
            "sa", "sb", "na", "nb",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .filter(F.col("ca") + F.col("cb") > 0)
    )
    bc_term = F.sqrt(
        F.col("ca").cast("double") * F.col("cb")
        / (F.col("na").cast("double") * F.col("nb"))
    ).cast("decimal(20,10)")
    tv_num = F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
    terms = grid.select("sa", "sb", "na", "nb", bc_term.alias("bc"), tv_num.alias("tv"))
    bc = F.sum("bc").cast("double")
    return terms.groupBy("sa", "sb", "na", "nb").agg(
        F.round(bc, 6).alias("bhattacharyya"),
        F.round(F.sqrt(F.greatest(1.0 - bc, F.lit(0.0))), 6).alias("hellinger"),
        F.round(
            F.sum("tv").cast("double")
            / (2.0 * F.max("na").cast("double") * F.max("nb")),
            6,
        ).alias("total_variation"),
    ).select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        "bhattacharyya",
        "hellinger",
        "total_variation",
    )
