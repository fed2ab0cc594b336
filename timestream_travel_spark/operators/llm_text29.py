"""LLM-text, part 29 (round 12): Monroe–Colaresi–Quinn log-odds
keyness with an informative Dirichlet prior ("Fightin' Words",
Political Analysis 2008) — the variance-stabilized per-word
group-association z-score that fixed the known biases of both plain
log-odds and Dunning keyness (q_dunning_keyness): rare words are
shrunk toward the corpus prior instead of dominating the ranking.

Per language ℓ vs the rest of the corpus, with prior α_w =
g_w/{PRIOR_DEN} (g_w = corpus count — the "informative" choice that
makes the prior the scaled background distribution):

  δ_w = ln((y + α_w)/(n_ℓ + α₀ − y − α_w))
      − ln((y' + α_w)/(n' + α₀' − y' − α_w))
  σ²_w ≈ 1/(y + α_w) + 1/(y' + α_w),   z_w = δ_w / √σ²_w

Exactness: every ln/division argument (y + g/{PRIOR_DEN}, the four
complement masses) is an exact DECIMAL built from integer counts,
converted to double once (correctly rounded identically), so δ, σ
and z are flat identically-shaped double expressions. ln() itself is
NOT guaranteed correctly rounded in both libm and Math.log, so the
top-k cut orders by the QUANTIZED round(z, 6) (the emitted score)
with a word tiebreak — a ≤1-ulp raw-z gap at the rank-K boundary
then cannot flip the emitted set cross-engine (ADVICE r12).

Scale shape: one token reduce to (lang, word) counts (map-side
combined), a broadcast of the |langs|-row mass table, and a top-k
window over the vocabulary-bounded count table. Candidates are
words PRESENT in the language (y ≥ 1) — an absent word cannot be
over-represented, so no (lang × vocab) grid materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

PRIOR_DEN = 100  # α_w = corpus_count/100, so α₀ = N/100
MONROE_TOP_K = 10  # emitted over-represented words per language
MONROE_MIN_G = 5  # ignore corpus-rare words (prior too diffuse)


@query(
    "q_monroe_log_odds",
    oracle=f"""
    WITH words AS (
      SELECT lang,
             lower(unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                      x -> x <> ''))) AS w
      FROM documents
    ), wc AS (
      SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS y
      FROM words GROUP BY lang, w
    ), gw AS (
      SELECT w, CAST(SUM(y) AS BIGINT) AS g FROM wc GROUP BY w
    ), mass AS (
      SELECT lang, CAST(SUM(y) AS BIGINT) AS nl FROM wc GROUP BY lang
    ), tot AS (SELECT CAST(SUM(g) AS BIGINT) AS nn FROM gw
    ), scored AS (
      SELECT c.lang, c.w, c.y, g.g, m.nl, t.nn,
             ln((c.y + CAST(g.g AS DECIMAL(20,2)) / {PRIOR_DEN})
                / (m.nl + CAST(t.nn AS DECIMAL(20,2)) / {PRIOR_DEN}
                   - c.y - CAST(g.g AS DECIMAL(20,2)) / {PRIOR_DEN}))
             - ln(((g.g - c.y) + CAST(g.g AS DECIMAL(20,2)) / {PRIOR_DEN})
                  / ((t.nn - m.nl)
                     + CAST(t.nn AS DECIMAL(20,2)) / {PRIOR_DEN}
                     - (g.g - c.y)
                     - CAST(g.g AS DECIMAL(20,2)) / {PRIOR_DEN})) AS delta,
             1.0 / (c.y + CAST(g.g AS DECIMAL(20,2)) / {PRIOR_DEN})
             + 1.0 / ((g.g - c.y)
                      + CAST(g.g AS DECIMAL(20,2)) / {PRIOR_DEN}) AS var
      FROM wc c
      JOIN gw g ON g.w = c.w
      JOIN mass m ON m.lang = c.lang
      CROSS JOIN tot t
      WHERE g.g >= {MONROE_MIN_G}
    ), ranked AS (
      -- rank by the QUANTIZED z (the emitted score), not raw ln()
      -- doubles: libm log and Math.log are not both correctly
      -- rounded, so a <=1-ulp z gap at the rank-K boundary could
      -- flip the top-k set cross-engine (ADVICE r12)
      SELECT lang, w, y, g,
             round(delta / sqrt(var), 6) AS z_monroe,
             row_number() OVER (PARTITION BY lang
                                ORDER BY round(delta / sqrt(var), 6) DESC, w
                               ) AS rnk
      FROM scored
    )
    SELECT lang, w AS word, y AS n_in_lang, g AS n_corpus,
           CAST(rnk AS INT) AS rnk, z_monroe
    FROM ranked WHERE rnk <= {MONROE_TOP_K}
    """,
)
def q_monroe_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{MONROE_TOP_K} most over-represented words per language
    by the Monroe log-odds z with informative Dirichlet prior
    (module docstring). Counts are exact integers; prior-smoothed
    masses are exact decimals; δ/√σ² is one flat double expression
    per (lang, word)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("lang", F.explode(doc_words("text")).alias("w")).select(
        "lang", F.lower("w").alias("w")
    )
    wc = words.groupBy("lang", "w").agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    glob = wc.groupBy("w").agg(F.sum("y").cast("bigint").alias("g"))
    mass = wc.groupBy("lang").agg(F.sum("y").cast("bigint").alias("nl"))
    tot = glob.agg(F.sum("g").cast("bigint").alias("nn"))
    alpha = F.col("g").cast("decimal(20,2)") / F.lit(PRIOR_DEN)
    alpha0 = F.col("nn").cast("decimal(20,2)") / F.lit(PRIOR_DEN)
    y, g, nl, nn = F.col("y"), F.col("g"), F.col("nl"), F.col("nn")
    delta = F.log(
        (y + alpha) / (nl + alpha0 - y - alpha)
    ) - F.log(
        ((g - y) + alpha) / ((nn - nl) + alpha0 - (g - y) - alpha)
    )
    var = F.lit(1.0) / (y + alpha) + F.lit(1.0) / ((g - y) + alpha)
    scored = (
        # vocab-sized side: co-shuffled on w, NOT broadcast (at corpus
        # scale the vocabulary outgrows a broadcast; langs/tot don't)
        wc.join(glob.filter(F.col("g") >= MONROE_MIN_G), "w")
        .join(F.broadcast(mass), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "w",
            "y",
            "g",
            # quantize BEFORE ranking so boundary order is
            # ulp-insensitive cross-engine (ADVICE r12): ln() itself
            # is not correctly rounded identically in libm vs
            # Math.log, only the decimal→double inputs are
            F.round(delta / F.sqrt(var), 6).alias("z"),
        )
    )
    w_rank = Window.partitionBy("lang").orderBy(F.desc("z"), F.asc("w"))
    return (
        scored.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= MONROE_TOP_K)
        .select(
            "lang",
            F.col("w").alias("word"),
            F.col("y").alias("n_in_lang"),
            F.col("g").alias("n_corpus"),
            F.col("rnk").cast("int").alias("rnk"),
            F.col("z").alias("z_monroe"),
        )
    )
