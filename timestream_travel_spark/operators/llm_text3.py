"""LLM-pipeline operators, part 3: char-n-gram similarity, composed
corpus construction, and z-score anomaly detection (B.11/B.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.dedup import normalized_text
from timestream_travel_spark.operators.llm_text import quality_score
from timestream_travel_spark.ops import let_
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

CHARGRAM_K = 8


def char_shingles(text: Column | str, k: int = CHARGRAM_K) -> Column:
    """Distinct k-char shingles of the normalized text — the
    tokenization-free near-dup feature (robust to word-boundary
    noise where word shingles are not). The normalized text is
    let_-bound so the per-position lambda references it instead of
    re-running the normalization regex per position (ops.let_;
    measured 7× at sf0.1)."""

    def body(t: Column) -> Column:
        n = F.length(t)
        idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
        return F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(k))))

    return let_(normalized_text(text), body)


@query(
    "q_chargram_jaccard_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang, source,
             list_distinct(list_transform(
               generate_series(1, greatest(length(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) - {CHARGRAM_K} + 1, 1)),
               i -> substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), i, {CHARGRAM_K})
             )) AS grams
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4)
             AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.12
    """,
)
def q_chargram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by char-8-gram Jaccard, blocked on (lang,
    source) — complements word-shingle Jaccard for texts where
    whitespace tokenization is unreliable."""
    d = load_table(spark, sf_dir, "documents")
    d2 = load_table(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id").alias("doc_a"), "lang", "source", char_shingles("text").alias("g_a"))
    b = d2.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("source_b"),
        char_shingles("text").alias("g_b"),
    )
    joined = a.join(b, (a.lang == b.lang_b) & (a.source == b.source_b) & (a.doc_a < b.doc_b))
    inter = F.size(F.array_intersect("g_a", "g_b")).cast("double")
    union = F.size("g_a") + F.size("g_b") - F.size(F.array_intersect("g_a", "g_b"))
    jac = inter / union
    return joined.select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard")).filter(jac >= 0.12)


@query(
    "q_corpus_build",
    oracle="""
    WITH deduped AS (
      SELECT doc_id, lang, source, text FROM (
        SELECT doc_id, lang, source, text,
               row_number() OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                                  ORDER BY doc_id) AS rn
        FROM documents) t
      WHERE rn = 1
    ), scored AS (
      SELECT lang, source,
        (CASE WHEN length(text) >= 100 AND length(text) <= 1000 THEN 1.0 ELSE 0.0 END
         + CASE WHEN CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
                     / length(text) < 0.1 THEN 1.0 ELSE 0.0 END
         + CASE WHEN CAST(len(regexp_extract_all(lower(text), '\\b(the|a|and|of|to|in)\\b')) AS DOUBLE)
                     / len(regexp_split_to_array(trim(text), '\\s+')) > 0.05 THEN 1.0 ELSE 0.0 END
        ) / 3.0 AS score
      FROM deduped
      WHERE lang IN ('en', 'de', 'fr')
    )
    SELECT lang, source, COUNT(*) AS n_docs
    FROM scored WHERE score >= 0.6
    GROUP BY lang, source
    """,
)
def q_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-corpus construction: dedup (keep-first by
    fingerprint) → language filter → quality gate → per-(lang,source)
    accounting. The composition exercises operator chaining the way a
    real data pipeline does — one plan, no intermediate
    materialization."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(normalized_text("text"))).orderBy(F.asc("doc_id"))
    deduped = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        deduped.filter(F.col("lang").isin("en", "de", "fr"))
        .withColumn("score", quality_score(F.col("text")))
        .filter(F.col("score") >= 0.6)
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "q_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*) AS mu,
             stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sigma, 2) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs((e.value - s.mu) / s.sigma) > 3
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series z-score outliers (|z| > 3): a broadcast join of the
    tiny per-series stats table against the fact scan — the streaming
    twin would keep (mu, sigma) as applyInPandasWithState state.
    z rounded at 1e-2 (raw sigma differs across engines at ~1e-10)."""
    ev = load_table(spark, sf_dir, "events")
    stats = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("et"))
        .agg(
            (F.sum(F.col("value").cast("decimal(20,4)")).cast("double") / F.count("*")).alias("mu"),
            F.stddev_samp("value").alias("sigma"),
        )
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), ev.event_type == stats.et)
        .filter(F.abs(z) > 3)
        .select("event_id", "event_type", F.round(z, 2).alias("zscore"))
    )
