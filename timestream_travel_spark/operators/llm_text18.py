"""LLM-data-pipeline operators, part 18 (round-8 wave): corpus
n-gram novelty drift per source over ingest order — the freshness
twin of llm_text12's train/val KL drift audit. A crawl source whose
late epochs stop producing never-seen-before n-grams has gone stale
(re-crawls, boilerplate, mirrored content) and is a deweighting
candidate; a source whose novelty stays high keeps paying for its
token budget. Same diagnostic family as the RefinedWeb/Gopher corpus
curation audits (public).

Reference parity: none (cmd/backup.go) — north-star text-analysis
capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.llm_text6 import _shingles, doc_words
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

N_EPOCHS = 4  # ingest-order quarters (doc_id is the ingest sequence)


@query(
    "q_ngram_novelty",
    oracle=f"""
    WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
    w AS (
      SELECT source,
             CAST((doc_id * {N_EPOCHS}) // (mx.m + 1) AS INT) AS epoch,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS ws
      FROM documents, mx
    ),
    sh AS (
      SELECT source, epoch,
             unnest(list_transform(range(1, len(ws) - 1),
                                   i -> array_to_string(ws[i:i+2], ' '))) AS s
      FROM w WHERE len(ws) >= 3
    ),
    dse AS (SELECT DISTINCT source, epoch, s FROM sh),
    fe AS (
      SELECT source, epoch, s,
             MIN(epoch) OVER (PARTITION BY s) AS first_epoch
      FROM dse
    )
    SELECT source, epoch,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN epoch = first_epoch THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(CAST(SUM(CASE WHEN epoch = first_epoch THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS novelty
    FROM fe GROUP BY source, epoch
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, ingest-quarter) n-gram novelty: of the DISTINCT
    word-3-grams a source contributes in epoch e, the fraction whose
    corpus-wide FIRST appearance is e (novel) vs already seen in an
    earlier epoch by any source. Epoch = doc_id quartile via exact
    integer division (doc_id is the ingest sequence; no timestamp
    column exists on documents). Epoch-0 rows are 1.0 by
    construction — the cold-start baseline; the drift signal is the
    e≥1 trajectory per source.

    Plan: ONE corpus explode → DISTINCT (source, epoch, s) reduce
    (map-side combined); first-appearance via a window keyed on the
    shingle (each slice bounded by sources × epochs = O(80) rows,
    never corpus-sized); final aggregate lands on ≤ sources × epochs
    rows. All counting is integer; one division per output row. At
    100 TB this is the same single explode + keyed-reduce shape as
    q_contamination_ngrams, with the shingle-keyed exchange reused
    by the window."""
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("m"))
    w = d.crossJoin(F.broadcast(mx)).select(
        "source",
        F.expr(f"CAST((doc_id * {N_EPOCHS}) DIV (m + 1) AS INT)").alias("epoch"),
        doc_words("text").alias("ws"),
    )
    sh = w.select("source", "epoch", F.explode(_shingles(F.col("ws"), 3)).alias("s"))
    dse = sh.groupBy("source", "epoch", "s").agg(F.lit(1).alias("_one")).drop("_one")
    fe = dse.withColumn("first_epoch", F.min("epoch").over(Window.partitionBy("s")))
    novel = F.sum(F.when(F.col("epoch") == F.col("first_epoch"), 1).otherwise(0))
    return fe.groupBy("source", "epoch").agg(
        F.count("*").alias("n_grams"),
        novel.cast("bigint").alias("n_novel"),
        F.round(novel.cast("double") / F.count("*"), 6).alias("novelty"),
    )
