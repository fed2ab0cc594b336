"""Text/embedding pipeline operators, part 2: TF-IDF term scoring and
blocked embedding near-duplicate pairs (SURVEY.md §2 B.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.functions.vectors import cosine, to_double_array
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

N_LANGS = 5


@query(
    "q_tfidf_top_terms",
    oracle=f"""
    WITH words AS (
      SELECT lang, lower(w) AS word
      FROM documents, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t(w)
    ), tf AS (
      SELECT lang, word, COUNT(*) AS tf FROM words GROUP BY lang, word
    ), df AS (
      SELECT word, COUNT(DISTINCT lang) AS df FROM words GROUP BY word
    ), scored AS (
      SELECT tf.lang, tf.word,
             round(tf.tf * ln({N_LANGS} / CAST(df.df AS DOUBLE)), 6) AS tfidf
      FROM tf JOIN df ON tf.word = df.word
    )
    SELECT lang, word, tfidf FROM (
      SELECT lang, word, tfidf,
             row_number() OVER (PARTITION BY lang ORDER BY tfidf DESC, word) AS rn
      FROM scored
    ) t WHERE rn <= 5
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per language (documents-as-corpus, language
    as the document unit). Two aggregations + a broadcast-able join on
    the term dictionary; the explode never leaves the executor."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")).select(
        "lang", F.lower("w").alias("word")
    )
    tf = words.groupBy("lang", "word").agg(F.count("*").alias("tf"))
    df_ = words.groupBy("word").agg(F.countDistinct("lang").alias("df"))
    scored = tf.join(df_, "word").select(
        "lang",
        "word",
        F.round(F.col("tf") * F.log(F.lit(N_LANGS) / F.col("df").cast("double")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).select("lang", "word", "tfidf")
    )


@query(
    "q_embedding_neardup_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 300)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
           round(
             list_sum(list_transform(generate_series(1, len(a.embedding)),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           4) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE
             list_sum(list_transform(generate_series(1, len(a.embedding)),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
           >= 0.25
    """,
)
def q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked on label (the
    LSH-bucket stand-in): the equi-join bounds the pair space, the
    cosine evaluates post-match. vec_id < 300 keeps the oracle's
    O(n²)-per-block cost test-sized; the Spark plan is the one that
    scales (block key → shuffle key)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    e2 = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("label").alias("label"), F.col("embedding").alias("emb_a"))
    b = e2.select(F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"), F.col("embedding").alias("emb_b"))
    sim = cosine(to_double_array(F.col("emb_a")), to_double_array(F.col("emb_b")))
    return (
        a.join(b, (a.label == b.label_b) & (a.vec_a < b.vec_b))
        .filter(sim >= 0.25)
        .select("vec_a", "vec_b", "label", F.round(sim, 4).alias("cos_sim"))
    )
