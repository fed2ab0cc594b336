"""LLM-corpus ops, wave 25 (round-10 STAGED): corpus-linguistics
keyness and dispersion — Dunning's log-likelihood keyness (Dunning,
Comp. Ling. 1993 — THE standard "what words characterize source A
vs source B" statistic, far better calibrated than chi-square on
sparse counts), per-word burstiness (Church & Gale 1995:
variance-to-mean of per-document counts — content words are bursty,
function words Poisson), and Juilland's dispersion D (Juilland &
Chang-Rodríguez 1964: how evenly a word spreads across corpus
slices — the statistic frequency dictionaries pair with raw counts).

Exactness: all three reduce to integer count tables; Dunning's
x·ln x terms quantize to DECIMAL before the exact sum (the
established idiom for data-dependent cell sets); burstiness and D
use exact integer/decimal sufficient statistics with one flat
expression per word. Vocabulary-bounded outputs (top-k by the
statistic with word tiebreaks).

Scale: one token reduce each; everything downstream is
vocabulary-sized. The corpus-slice assignment for D is a pure
function of doc_id (deciles by modulus), so no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

KEY_A, KEY_B = "src0", "src1"  # keyness contrast pair (fixture sources)
KEY_TOP = 25  # keywords emitted per direction
BURST_MIN_DOCS = 5  # burstiness needs a few docs to be meaningful
BURST_TOP = 30
DISP_SLICES = 10  # Juilland corpus slices (doc_id % 10)
DISP_TOP = 30
DISP_MIN_N = 50  # dispersion reported for words with >= this count

_XLX = "CAST({x} * ln(CAST({x} AS DOUBLE)) AS DECIMAL(24,8))"


@query(
    "q_dunning_keyness",
    oracle=f"""
    WITH words AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x <> '')) AS w
      FROM documents WHERE source IN ('{KEY_A}', '{KEY_B}')
    ), wc AS (
      SELECT w,
             CAST(SUM(CASE WHEN source = '{KEY_A}' THEN 1 ELSE 0 END) AS BIGINT)
               AS a,
             CAST(SUM(CASE WHEN source = '{KEY_B}' THEN 1 ELSE 0 END) AS BIGINT)
               AS b
      FROM words GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb FROM wc
    ), g AS (
      SELECT w, a, b, na, nb,
             2.0 * CAST(
               (CASE WHEN a > 0 THEN {_XLX.format(x="a")} ELSE 0 END)
               + (CASE WHEN b > 0 THEN {_XLX.format(x="b")} ELSE 0 END)
               + {_XLX.format(x="(a + b)")}
                 * CAST(-1 AS DECIMAL(2,0))
               + CAST((a + b) * ln(CAST(na AS DOUBLE) + nb) AS DECIMAL(24,8))
               - CAST(a * ln(CAST(na AS DOUBLE)) AS DECIMAL(24,8))
               - CAST(b * ln(CAST(nb AS DOUBLE)) AS DECIMAL(24,8))
               AS DOUBLE) AS g2
      FROM wc CROSS JOIN tot
    )
    SELECT w AS word, a AS count_a, b AS count_b,
           round(g2, 6) AS g2,
           CASE WHEN a * CAST(nb AS DOUBLE) > b * CAST(na AS DOUBLE)
                THEN '{KEY_A}' ELSE '{KEY_B}' END AS keyword_of
    FROM g
    ORDER BY g2 DESC, word
    LIMIT {KEY_TOP}
    """,
)
def q_dunning_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood keyness between sources '{KEY_A}' and
    '{KEY_B}': per word, G² = 2·[a·ln a + b·ln b − (a+b)·ln(a+b) +
    (a+b)·ln(N_a+N_b) − a·ln N_a − b·ln N_b] (the 2×2 G-test
    collapsed with column margins fixed) — high G² words are the
    vocabulary that distinguishes the two sources, signed by which
    side over-uses them. Each x·ln x term quantizes to DECIMAL
    before the exact per-word sum; top-{KEY_TOP} by G² with word
    tiebreak."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin(KEY_A, KEY_B)
    )
    words = d.select("source", F.explode(doc_words("text")).alias("w"))
    wc = words.groupBy("w").agg(
        F.sum(F.when(F.col("source") == KEY_A, 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("source") == KEY_B, 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
    )
    tot = wc.agg(
        F.sum("a").cast("bigint").alias("na"), F.sum("b").cast("bigint").alias("nb")
    )

    def xlx(col):
        return (col * F.log(col.cast("double"))).cast("decimal(24,8)")

    a, b = F.col("a"), F.col("b")
    na, nb = F.col("na"), F.col("nb")
    g2 = 2.0 * (
        F.when(a > 0, xlx(a)).otherwise(F.lit(0).cast("decimal(24,8)"))
        + F.when(b > 0, xlx(b)).otherwise(F.lit(0).cast("decimal(24,8)"))
        + xlx(a + b) * F.lit(-1).cast("decimal(2,0)")
        + ((a + b) * F.log(na.cast("double") + nb)).cast("decimal(24,8)")
        - (a * F.log(na.cast("double"))).cast("decimal(24,8)")
        - (b * F.log(nb.cast("double"))).cast("decimal(24,8)")
    ).cast("double")
    return (
        wc.join(F.broadcast(tot))
        .select(
            F.col("w").alias("word"),
            a.alias("count_a"),
            b.alias("count_b"),
            F.round(g2, 6).alias("g2"),
            F.when(
                a * nb.cast("double") > b * na.cast("double"), KEY_A
            )
            .otherwise(KEY_B)
            .alias("keyword_of"),
        )
        .orderBy(F.desc("g2"), "word")
        .limit(KEY_TOP)
    )


@query(
    "q_word_burstiness",
    oracle=f"""
    WITH perdoc AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x <> '')) AS w
      FROM documents
    ), n_docs AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
                  FROM documents),
    cnt AS (
      SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM perdoc GROUP BY w, doc_id
    ), stats AS (
      SELECT w,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS q
      FROM cnt GROUP BY w
    )
    SELECT w AS word, s AS n_occurrences, df AS n_docs_with,
           round((CAST(q AS DOUBLE) / nd
                  - (CAST(s AS DOUBLE) / nd) * (CAST(s AS DOUBLE) / nd))
                 / (CAST(s AS DOUBLE) / nd), 6) AS vmr
    FROM stats CROSS JOIN n_docs
    WHERE df >= {BURST_MIN_DOCS}
    ORDER BY vmr DESC, word
    LIMIT {BURST_TOP}
    """,
)
def q_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-word burstiness (Church & Gale): the variance-to-mean
    ratio of per-DOCUMENT counts over all documents (absent docs
    count 0 — the zero mass rides in the N_docs denominator, not in
    the stored rows). VMR ≈ 1 is Poisson scatter (function words);
    VMR ≫ 1 is bursty content vocabulary. Exact integer sufficient
    statistics (Σc, Σc² over stored rows only); top-{BURST_TOP} by
    VMR among words in ≥ {BURST_MIN_DOCS} docs."""
    d = load_table(spark, sf_dir, "documents")
    nd = d.agg(F.countDistinct("doc_id").cast("bigint").alias("nd"))
    perdoc = d.select("doc_id", F.explode(doc_words("text")).alias("w"))
    cnt = perdoc.groupBy("w", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    stats = cnt.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("nd")
    vmr = (F.col("q").cast("double") / F.col("nd") - mean * mean) / mean
    return (
        stats.join(F.broadcast(nd))
        .filter(F.col("df") >= BURST_MIN_DOCS)
        .select(
            F.col("w").alias("word"),
            F.col("s").alias("n_occurrences"),
            F.col("df").alias("n_docs_with"),
            F.round(vmr, 6).alias("vmr"),
        )
        .orderBy(F.desc("vmr"), "word")
        .limit(BURST_TOP)
    )


@query(
    "q_juilland_dispersion",
    oracle=f"""
    WITH words AS (
      SELECT doc_id % {DISP_SLICES} AS sl,
             unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x <> '')) AS w
      FROM documents
    ), cnt AS (
      SELECT w, sl, CAST(COUNT(*) AS BIGINT) AS c FROM words GROUP BY w, sl
    ), grid AS (
      SELECT wv.w, s.sl, COALESCE(cnt.c, 0) AS c
      FROM (SELECT DISTINCT w FROM cnt) wv
      CROSS JOIN (SELECT unnest(generate_series(0, {DISP_SLICES - 1})) AS sl) s
      LEFT JOIN cnt ON cnt.w = wv.w AND cnt.sl = s.sl
    ), stats AS (
      SELECT w,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c * c) AS BIGINT) AS q
      FROM grid GROUP BY w
    )
    SELECT w AS word, n AS n_occurrences,
           round(1.0 - sqrt(greatest(
                   CAST({DISP_SLICES} AS DOUBLE) * q
                     / (CAST(n AS DOUBLE) * n) - 1.0, 0.0))
                 / sqrt({DISP_SLICES - 1}.0), 6) AS juilland_d
    FROM stats
    WHERE n >= {DISP_MIN_N}
    ORDER BY juilland_d ASC, word
    LIMIT {DISP_TOP}
    """,
)
def q_juilland_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Juilland's dispersion D over {DISP_SLICES} corpus slices
    (doc_id mod {DISP_SLICES} — a pure function, no global sort):
    D = 1 − CV/√(k−1) where CV is the coefficient of variation of
    the word's per-slice counts — 1 means perfectly even spread,
    near 0 means the word lives in one slice (topic/boilerplate
    concentration). CV² collapses to k·Σc²/(Σc)² − 1 in exact
    integers, so D is one flat expression. The LEAST-dispersed
    frequent words (n ≥ {DISP_MIN_N}) surface first — those are the
    curation targets."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        (F.col("doc_id") % DISP_SLICES).alias("sl"),
        F.explode(doc_words("text")).alias("w"),
    )
    cnt = words.groupBy("w", "sl").agg(F.count(F.lit(1)).alias("c"))
    # zero slices contribute 0 to both Σc and Σc², so the stored rows
    # alone carry the sufficient statistics — no dense grid needed
    # Spark-side (the oracle's grid exists only for readability)
    stats = cnt.groupBy("w").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    k = float(DISP_SLICES)
    cv2 = k * F.col("q").cast("double") / (F.col("n").cast("double") * F.col("n")) - 1.0
    dd = 1.0 - F.sqrt(F.greatest(cv2, F.lit(0.0))) / (DISP_SLICES - 1) ** 0.5
    return (
        stats.filter(F.col("n") >= DISP_MIN_N)
        .select(
            F.col("w").alias("word"),
            F.col("n").alias("n_occurrences"),
            F.round(dd, 6).alias("juilland_d"),
        )
        .orderBy(F.asc("juilland_d"), "word")
        .limit(DISP_TOP)
    )
