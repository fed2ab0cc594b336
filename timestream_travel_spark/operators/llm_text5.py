"""LLM-pipeline operators, part 5 (round 3): sentence segmentation
statistics — the per-document sentence profile a training-data
pipeline uses for quality gating (too-few/too-long sentences flag
boilerplate or OCR junk) — and deterministic stratified sampling for
class-balanced corpus construction.

All in-row array transforms over built-in functions — no UDF, no
explode until the final per-language rollup, so the hot path stays
inside whole-stage codegen at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# sentence boundary: terminal punctuation run followed by whitespace.
# Same regex source text in Spark (Java regex) and DuckDB (RE2) —
# the subset used ([.!?]+\s+) parses identically in both.
_SENT_RE = "[.!?]+\\s+"


def sentences(text: Column | str) -> Column:
    """Non-empty sentences of a document (trailing terminator keeps
    the last sentence; empties from punctuation runs are dropped)."""
    t = F.trim(text if isinstance(text, Column) else F.col(text))
    return F.filter(F.split(t, _SENT_RE), lambda s: F.trim(s) != "")


@query(
    "q_sentence_stats",
    oracle=f"""
    WITH sent AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(trim(text), '{_SENT_RE}'),
                         s -> trim(s) <> '') AS ss
      FROM documents
    ), per_doc AS (
      SELECT doc_id, lang,
             len(ss) AS n_sentences,
             CAST(len(string_split_regex(trim(array_to_string(ss, ' ')), '\\s+')) AS DOUBLE)
               / len(ss) AS words_per_sentence
      FROM sent WHERE len(ss) > 0
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_sentences) AS BIGINT) AS total_sentences,
           round(CAST(SUM(n_sentences) AS DOUBLE) / COUNT(*), 4) AS avg_sentences_per_doc,
           round(CAST(SUM(CAST(words_per_sentence AS DECIMAL(20,6))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_words_per_sentence
    FROM per_doc
    GROUP BY lang
    """,
)
def q_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sentence profile: document counts, total
    sentences, mean sentences/document, mean words/sentence. The
    per-document words/sentence ratios accumulate as DECIMAL before
    the double division (oracle-stability rules); sentence and word
    splitting stay in-row."""
    d = load_table(spark, sf_dir, "documents")
    ss = sentences("text")
    n_sent = F.size(ss)
    n_words = F.size(
        F.filter(F.split(F.trim(F.array_join(ss, " ")), "\\s+"), lambda w: w != "")
    )
    per_doc = d.select(
        "lang",
        n_sent.alias("n_sentences"),
        (n_words.cast("double") / n_sent).alias("words_per_sentence"),
    ).filter(F.col("n_sentences") > 0)
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_sentences").cast("bigint").alias("total_sentences"),
        F.round(F.sum("n_sentences").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_sentences_per_doc"
        ),
        F.round(
            F.sum(F.col("words_per_sentence").cast("decimal(20,6)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_words_per_sentence"),
    )


@query(
    "q_balanced_sample",
    oracle="""
    WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    k AS (SELECT MIN(n) AS k FROM counts),
    ranked AS (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM ranked, k WHERE rn <= k.k
    GROUP BY lang
    """,
)
def q_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified class-balancing: downsample every
    language to the smallest language's document count, picking docs
    in md5(doc_id) order — a reproducible, seedless shuffle (the
    standard corpus-balancing step before training). The per-class
    quota is a 1-row aggregate (bounded → broadcast is safe); ranking
    is one window pass per language partition; output is the per-class
    audit (count + id checksum), driver-safe at any sf."""
    d = load_table(spark, sf_dir, "documents")
    k = d.groupBy("lang").count().agg(F.min("count").alias("k"))
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), F.asc("doc_id"))
    ranked = d.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
    return (
        ranked.join(F.broadcast(k))
        .filter(F.col("rn") <= F.col("k"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
    )
