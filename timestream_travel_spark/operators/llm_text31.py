"""LLM-corpus ops, wave 31 (round 14): concentration and diversity
of the token-frequency distribution — the Gini coefficient of word
frequencies (how head-heavy is the vocabulary — the corpus-curation
twin of q_zipf_slope's power-law fit), Simpson's diversity /
inverse-Simpson (Simpson, Nature 1949 — the collision probability of
two random tokens, the effective-vocabulary-size diagnostic), and
the SMOG readability grade per source (McLaughlin, J. Reading 1969 —
the polysyllable-based grade the round-9 ARI/CL/Flesch/fog panel
left out, aggregated per source where its 30-sentence normalization
is meaningful).

Exactness design:
- the Gini NEVER ranks individual words: grouping by frequency f
  (m_f words each) makes the sorted-rank identity block-summable —
  Σᵢ i·x₍ᵢ₎ doubles to Σ_f f·(cum·(cum+1) − (cum−m)·(cum−m+1)) with
  cum the running word count, so G = (S1₂ − (V+1)·N)/(V·N) is exact
  integers and ONE flat division (the q_gini_concentration identity
  without any per-row rank);
- Simpson is Σf·(f−1)/(N·(N−1)) exact, inverse Simpson one
  identically-shaped double composition N·N/Σf²;
- SMOG sums the per-doc vowel-group polysyllable and sentence counts
  (exact integers, the llm_text23 proxy) per source; the grade is
  ONE sqrt composition with the published constants as shared
  literals.

Scale shape: one explode → (word, count) map-side-combined reduce is
the corpus cost (already priced by q_token_frequency); the Gini and
Simpson run on the (f, m_f) table, whose size is bounded by the
maximum frequency, not the vocabulary; SMOG is per-doc in-row HOF
counts reduced per source.

Reference parity: none (cmd/backup.go has no text surface) —
north-star derived capability, sibling of llm_text23/25.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.operators.llm_text20 import _WS_SQL
from timestream_travel_spark.operators.llm_text23 import _SENT_SQL, _sentences
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

_FREQ_SQL = """
      SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM (
        SELECT lower(unnest(list_filter(
                 regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))) AS w
        FROM documents
      ) GROUP BY w
"""


def _freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w0"))
        .filter(F.col("w0") != "")
        .select(F.lower("w0").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )


@query(
    "q_token_gini",
    oracle=f"""
    WITH freq AS ({_FREQ_SQL}
    ), byf AS (
      SELECT f, CAST(COUNT(*) AS BIGINT) AS m FROM freq GROUP BY f
    ), cums AS (
      SELECT f, m,
             SUM(m) OVER (ORDER BY f ROWS UNBOUNDED PRECEDING) AS cum
      FROM byf
    ), agg AS (
      SELECT CAST(SUM(m) AS BIGINT) AS v,
             CAST(SUM(f * m) AS BIGINT) AS n,
             CAST(SUM(f * (cum * (cum + 1)
                           - (cum - m) * (cum - m + 1))) AS BIGINT) AS s1_2
      FROM cums
    )
    SELECT v AS vocab, n AS total_tokens,
           CASE WHEN v > 0 AND n > 0 THEN
             round(CAST(s1_2 - (v + 1) * n AS DOUBLE)
                   / (CAST(v AS DOUBLE) * n), 6) END AS gini
    FROM agg
    """,
)
def q_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the corpus word-frequency distribution via
    the block-summed sorted-rank identity over the (frequency, word
    count) table — exact integers, one guarded flat division (module
    docstring)."""
    byf = _freqs(spark, sf_dir).groupBy("f").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    wc = Window.orderBy("f").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cums = byf.select("f", "m", F.sum("m").over(wc).alias("cum"))
    agg = cums.agg(
        F.sum("m").cast("bigint").alias("v"),
        F.sum(F.col("f") * F.col("m")).cast("bigint").alias("n"),
        F.sum(
            F.col("f")
            * (
                F.col("cum") * (F.col("cum") + 1)
                - (F.col("cum") - F.col("m")) * (F.col("cum") - F.col("m") + 1)
            )
        )
        .cast("bigint")
        .alias("s1_2"),
    )
    v, n = F.col("v"), F.col("n")
    return agg.select(
        v.alias("vocab"),
        n.alias("total_tokens"),
        F.when(
            (v > 0) & (n > 0),
            F.round(
                (F.col("s1_2") - (v + 1) * n).cast("double")
                / (v.cast("double") * n),
                6,
            ),
        ).alias("gini"),
    )


@query(
    "q_simpson_diversity",
    oracle=f"""
    WITH freq AS ({_FREQ_SQL}
    ), agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v,
             CAST(SUM(f) AS BIGINT) AS n,
             CAST(SUM(f * (f - 1)) AS BIGINT) AS coll2,
             CAST(SUM(f * f) AS BIGINT) AS f2
      FROM freq
    )
    SELECT v AS vocab, n AS total_tokens,
           CASE WHEN n > 1 THEN
             round(CAST(coll2 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)), 6)
           END AS simpson_d,
           CASE WHEN f2 > 0 THEN
             round(CAST(n AS DOUBLE) * n / f2, 6) END AS inv_simpson
    FROM agg
    """,
)
def q_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's diversity of the corpus unigram distribution:
    D = Σf(f−1)/(N(N−1)) (the exact two-token collision probability)
    and the inverse-Simpson effective vocabulary size N²/Σf² — exact
    integer aggregates, two guarded identically-shaped divisions."""
    agg = _freqs(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.sum("f").cast("bigint").alias("n"),
        F.sum(F.col("f") * (F.col("f") - 1)).cast("bigint").alias("coll2"),
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("f2"),
    )
    n = F.col("n")
    return agg.select(
        F.col("v").alias("vocab"),
        n.alias("total_tokens"),
        F.when(
            n > 1,
            F.round(
                F.col("coll2").cast("double") / (n.cast("double") * (n - 1)), 6
            ),
        ).alias("simpson_d"),
        F.when(
            F.col("f2") > 0,
            F.round(n.cast("double") * n / F.col("f2"), 6),
        ).alias("inv_simpson"),
    )


@query(
    "q_smog_source",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, {_WS_SQL} AS ws, text FROM documents
    ), per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM({_SENT_SQL}) AS BIGINT) AS n_sentences,
             CAST(SUM(len(list_filter(ws,
                 w -> len(regexp_extract_all(lower(w), '[aeiouy]+')) >= 3)))
               AS BIGINT) AS n_complex
      FROM d WHERE len(ws) > 0 GROUP BY source
    )
    SELECT source, n_docs, n_sentences, n_complex,
           round(1.043 * sqrt(30.0 * n_complex / n_sentences) + 3.1291, 4)
             AS smog
    FROM per
    """,
)
def q_smog_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMOG readability grade per source: 1.043·sqrt(30·polysyllables
    /sentences) + 3.1291 over the source's pooled sentence and
    ≥3-vowel-group word counts (the llm_text23 syllable proxy) — the
    counts are exact integers, the grade one sqrt composition with
    shared literals."""
    d = load_table(spark, sf_dir, "documents")
    ws = doc_words("text")
    groups = lambda w: F.size(  # noqa: E731
        F.regexp_extract_all(F.lower(w), F.lit("[aeiouy]+"), 0)
    )
    per = (
        d.select(
            "source",
            F.size(ws).alias("n_words"),
            _sentences().cast("bigint").alias("sents"),
            F.size(F.filter(ws, lambda w: groups(w) >= 3))
            .cast("bigint")
            .alias("cx"),
        )
        .filter(F.col("n_words") > 0)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("sents").cast("bigint").alias("n_sentences"),
            F.sum("cx").cast("bigint").alias("n_complex"),
        )
    )
    return per.select(
        "source",
        "n_docs",
        "n_sentences",
        "n_complex",
        F.round(
            F.lit(1.043)
            * F.sqrt(F.lit(30.0) * F.col("n_complex") / F.col("n_sentences"))
            + F.lit(3.1291),
            4,
        ).alias("smog"),
    )
