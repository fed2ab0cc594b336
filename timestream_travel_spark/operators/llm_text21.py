"""LLM-corpus ops, wave 21: source-level stylometry and
distributional distance — Burrows' Delta (Burrows, LLC 2002; the
standard authorship/stylometric attribution distance, Argamon's
formalization LLC 2008) and pairwise Jensen–Shannon divergence
between source unigram distributions (Lin, IEEE IT 1991). Together
they audit WHICH sources write alike — the curation signal behind
source-mixing decisions (q_lang_mixture_weights, q_token_budget_mix)
and drift monitors (q_split_kl_drift, q_ngram_novelty).

Exactness design: both statistics reduce the corpus ONCE to
(source, word) counts over a deterministically capped vocabulary
(top-{V} corpus words, count-then-word tiebreak — the PMI_TOP_V
discipline; caps are part of the definition, applied identically in
the oracle). All relative frequencies are flat floats off integer
counts; every per-word float term quantizes to DECIMAL before the
order-independent sums over the bounded (source × word) and
(pair × word) grids; each output row spends flat double arithmetic
only.

Scale shape: ONE token explode + (source, word) reduce (map-side
combined) bounds everything; the dense grids are |sources|×V and
|source-pairs|×V rows — source-count bounds, not data-volume bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

DELTA_V = 20  # Burrows: most-frequent-word budget
JS_V = 500  # JS: vocabulary cap (fixture vocab is smaller; the cap
# is the 100 TB bound and part of both engines' definition)

_WORDS_SQL = """
      SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
      FROM documents
"""


def _source_word_counts(spark: SparkSession, sf_dir: str, v: int):
    """(counts, totals, vocab): (source, word) counts over the top-v
    corpus vocabulary, per-source token totals WITHIN that
    vocabulary, and the capped vocab itself."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count("*").alias("cw"))
        .orderBy(F.desc("cw"), "w")
        .limit(v)
        .select("w")
    )
    counts = (
        words.join(F.broadcast(vocab), "w")
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    totals = counts.groupBy("source").agg(F.sum("c").alias("n"))
    return counts, totals, vocab


def _grid_sql(v: int) -> str:
    """Shared oracle CTE block: capped vocab, dense (source, word)
    grid with zero fill, per-source totals within the cap."""
    return f"""
    WITH words AS ({_WORDS_SQL}
    ), vocab AS (
      SELECT w FROM (
        SELECT w, COUNT(*) AS cw FROM words GROUP BY w
        ORDER BY cw DESC, w LIMIT {v}
      )
    ), cnt AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM words WHERE w IN (SELECT w FROM vocab)
      GROUP BY source, w
    ), tot AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY source
    ), grid AS (
      SELECT t.source, vb.w, t.n, CAST(COALESCE(c.c, 0) AS BIGINT) AS c
      FROM tot t CROSS JOIN vocab vb
      LEFT JOIN cnt c ON c.source = t.source AND c.w = vb.w
    )"""


@query(
    "q_burrows_delta",
    oracle=f"""{_grid_sql(DELTA_V)}
    , freq AS (
      SELECT source, w, CAST(CAST(c AS DOUBLE) / n AS DECIMAL(16,12)) AS f
      FROM grid
    ), wstat AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(CAST(SUM(f) AS VARCHAR) AS DOUBLE) AS sf,
             CAST(CAST(SUM(CAST(CAST(CAST(f AS VARCHAR) AS DOUBLE)
                                * CAST(CAST(f AS VARCHAR) AS DOUBLE)
                                AS DECIMAL(26,18))) AS VARCHAR) AS DOUBLE) AS sff
      FROM freq GROUP BY w
    ), z AS (
      SELECT fr.source, fr.w,
             (CAST(CAST(fr.f AS VARCHAR) AS DOUBLE) - ws.sf / ws.k)
             / sqrt(greatest(ws.sff / ws.k
                             - (ws.sf / ws.k) * (ws.sf / ws.k), 1e-300)) AS z
      FROM freq fr JOIN wstat ws ON ws.w = fr.w
    ), pairterm AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(abs(a.z - b.z) AS DECIMAL(16,10)) AS term
      FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
    )
    SELECT source_a, source_b,
           round(CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
             AS delta
    FROM pairterm GROUP BY source_a, source_b
    ORDER BY delta, source_a, source_b
    """,
)
def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between every source pair: z-score each
    source's relative frequency of the top-{DELTA_V} corpus words
    against the across-source mean/population-sd, then
    Delta = mean_w |z_a − z_b| (mean over the words actually in the
    capped vocabulary) — low Delta = stylistically alike
    sources (candidates for merged mixing weights or provenance
    review).

    Relative frequencies quantize to DECIMAL(16,12) at birth so the
    across-source moment sums are order-independent; z and the
    per-word |z_a − z_b| are flat floats, the latter quantized to
    DECIMAL(16,10) before the {DELTA_V}-term pair sum. A degenerate
    word (zero variance across sources) is guarded by the 1e-300
    variance floor — its z is then ~0 for every source and the word
    contributes nothing, matching the stylometric convention of
    dropping invariant markers."""
    counts, totals, vocab = _source_word_counts(spark, sf_dir, DELTA_V)
    grid = (
        totals.crossJoin(F.broadcast(vocab))
        .join(counts, ["source", "w"], "left")
        .select(
            "source", "w", "n", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
    )
    freq = grid.select(
        "source",
        "w",
        (F.col("c").cast("double") / F.col("n")).cast("decimal(16,12)").alias("f"),
    )
    fd = F.col("f").cast("double")
    wstat = freq.groupBy("w").agg(
        F.count("*").alias("k"),
        F.sum("f").cast("double").alias("sf"),
        F.sum((fd * fd).cast("decimal(26,18)")).cast("double").alias("sff"),
    )
    mean = F.col("sf") / F.col("k")
    sd = F.sqrt(
        F.greatest(F.col("sff") / F.col("k") - mean * mean, F.lit(1e-300))
    )
    z = freq.join(F.broadcast(wstat), "w").select(
        "source", "w", ((fd - mean) / sd).alias("z")
    )
    a = z.select(
        F.col("source").alias("source_a"), "w", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("source_b"),
        F.col("w").alias("wb"),
        F.col("z").alias("zb"),
    )
    pairterm = a.join(
        b, (F.col("w") == F.col("wb")) & (F.col("source_a") < F.col("source_b"))
    ).select(
        "source_a",
        "source_b",
        F.abs(F.col("za") - F.col("zb")).cast("decimal(16,10)").alias("term"),
    )
    return (
        pairterm.groupBy("source_a", "source_b")
        .agg(
            F.round(F.sum("term").cast("double") / F.count("*"), 6).alias(
                "delta"
            )
        )
        .orderBy("delta", "source_a", "source_b")
    )


@query(
    "q_js_divergence_sources",
    oracle=f"""{_grid_sql(JS_V)}
    , pairterm AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(
               (CASE WHEN a.c > 0 THEN
                  (CAST(a.c AS DOUBLE) / a.n)
                  * log2((CAST(a.c AS DOUBLE) / a.n)
                         / ((CAST(a.c AS DOUBLE) / a.n
                             + CAST(b.c AS DOUBLE) / b.n) / 2.0))
                ELSE 0 END)
               + (CASE WHEN b.c > 0 THEN
                  (CAST(b.c AS DOUBLE) / b.n)
                  * log2((CAST(b.c AS DOUBLE) / b.n)
                         / ((CAST(a.c AS DOUBLE) / a.n
                             + CAST(b.c AS DOUBLE) / b.n) / 2.0))
                ELSE 0 END)
               AS DECIMAL(18,12)) AS term
      FROM grid a JOIN grid b ON a.w = b.w AND a.source < b.source
    )
    SELECT source_a, source_b,
           round(CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE) / 2.0, 6)
             AS js_divergence
    FROM pairterm GROUP BY source_a, source_b
    ORDER BY js_divergence, source_a, source_b
    """,
)
def q_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence (bits) between source
    unigram distributions over the top-{JS_V} corpus vocabulary:
    JS(P,Q) = ½·KL(P‖M) + ½·KL(Q‖M), M = (P+Q)/2 — symmetric,
    bounded by 1 bit, zero iff the sources share a word
    distribution. The symmetric, finite companion to
    q_split_kl_drift's one-sided KL.

    Each (pair, word) term is one flat double expression off integer
    counts (zero-count sides contribute 0 exactly — the CASE guard,
    not a smoothing hack), DECIMAL-quantized before the bounded
    vocab sum; one division per output row."""
    counts, totals, vocab = _source_word_counts(spark, sf_dir, JS_V)
    grid = (
        totals.crossJoin(F.broadcast(vocab))
        .join(counts, ["source", "w"], "left")
        .select(
            "source", "w", "n", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
    )
    a = grid.select(
        F.col("source").alias("source_a"),
        "w",
        F.col("n").alias("na"),
        F.col("c").alias("ca"),
    )
    b = grid.select(
        F.col("source").alias("source_b"),
        F.col("w").alias("wb"),
        F.col("n").alias("nb"),
        F.col("c").alias("cb"),
    )
    p = F.col("ca").cast("double") / F.col("na")
    q = F.col("cb").cast("double") / F.col("nb")
    m = (p + q) / 2.0
    term = (
        F.when(F.col("ca") > 0, p * F.log2(p / m)).otherwise(0.0)
        + F.when(F.col("cb") > 0, q * F.log2(q / m)).otherwise(0.0)
    ).cast("decimal(18,12)")
    pairterm = a.join(
        b, (F.col("w") == F.col("wb")) & (F.col("source_a") < F.col("source_b"))
    ).select("source_a", "source_b", term.alias("term"))
    return (
        pairterm.groupBy("source_a", "source_b")
        .agg(
            F.round(F.sum("term").cast("double") / 2.0, 6).alias(
                "js_divergence"
            )
        )
        .orderBy("js_divergence", "source_a", "source_b")
    )
