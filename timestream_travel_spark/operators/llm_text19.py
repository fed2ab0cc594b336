"""LLM-data-pipeline operators, part 19 (round-8 wave): two lexical
diversity diagnostics — MATTR (moving-average type-token ratio,
Covington & McFall, J. Quant. Linguistics 2010) and the per-source
hapax-legomenon ratio (classic corpus-linguistics vocabulary-growth
signal). MATTR fixes plain TTR's length bias (q_type_token_ratio
falls as documents grow even at constant diversity) by averaging TTR
over fixed-width sliding windows; the hapax ratio flags sources
whose vocabulary is dominated by one-off tokens (fresh/creative
text) vs repeated boilerplate.

Reference parity: none (cmd/backup.go) — north-star text-analysis
capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

MATTR_W = 25  # window width in tokens


@query(
    "q_mattr",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS ws
      FROM documents
    )
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(len(ws) - {MATTR_W} + 1 AS BIGINT) AS n_windows,
           round(CAST(list_sum(list_transform(
                        range(1, len(ws) - {MATTR_W} + 2),
                        i -> len(list_distinct(ws[i:i+{MATTR_W - 1}]))))
                      AS DOUBLE)
                 / ({MATTR_W} * (len(ws) - {MATTR_W} + 1)), 6) AS mattr
    FROM w WHERE len(ws) >= {MATTR_W}
    """,
)
def q_mattr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average type-token ratio per document: the mean TTR of
    every {MATTR_W}-token sliding window, computed as the INTEGER sum
    of per-window distinct counts divided once by W·n_windows — no
    float accumulates. All window work is in-row (one transform over
    window starts + array_distinct per slice, O(len·W) per document,
    JVM-side higher-order functions) — zero shuffles beyond the scan;
    at 100 TB this is a map-only pass. Documents shorter than the
    window are skipped (MATTR is undefined there; plain TTR covers
    them).

    The token array is materialized before the window lambda captures
    it: an outer expression inside a higher-order-function lambda is
    re-evaluated per element (here: one regex re-split per window
    start — O(len) splits per document)."""
    d = load_table(spark, sf_dir, "documents")
    d = d.select("doc_id", doc_words("text").alias("__ws"))
    ws = F.col("__ws")
    n = F.size(ws)
    nw = n - (MATTR_W - 1)
    dsum = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), nw),
            lambda i: F.size(F.array_distinct(F.slice(ws, i, MATTR_W))),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        d.filter(n >= MATTR_W)
        .select(
            "doc_id",
            n.cast("bigint").alias("n_words"),
            nw.cast("bigint").alias("n_windows"),
            F.round(dsum.cast("double") / (MATTR_W * nw), 6).alias("mattr"),
        )
    )


@query(
    "q_hapax_ratio",
    oracle="""
    WITH wc AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (
        SELECT source,
               unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> x <> '')) AS w
        FROM documents
      ) GROUP BY source, w
    ), tot AS (
      SELECT source, w, c,
             SUM(c) OVER (PARTITION BY w) AS corpus_c
      FROM wc
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN corpus_c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           round(CAST(SUM(CASE WHEN corpus_c = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS hapax_ratio
    FROM tot GROUP BY source
    """,
)
def q_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source hapax ratio: of the distinct word types a source
    uses, the fraction that occur exactly ONCE in the whole corpus
    (a corpus-wide hapax necessarily belongs to exactly one source,
    so the per-source ratios are well-defined). High ratio = fresh
    vocabulary; near-zero = the source only re-treads corpus-common
    tokens. All counting is integer; one division per source.

    Plan: one explode → (source, w) count reduce (map-side combined);
    the corpus total per word is a window over the reduced table
    keyed on the word (each slice bounded by |sources|); the final
    aggregate lands on |sources| rows — the q_ngram_novelty exchange
    shape."""
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select("source", F.explode(doc_words("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    tot = wc.withColumn("corpus_c", F.sum("c").over(Window.partitionBy("w")))
    hap = F.sum(F.when(F.col("corpus_c") == 1, 1).otherwise(0))
    return tot.groupBy("source").agg(
        F.count("*").alias("n_types"),
        hap.cast("bigint").alias("n_hapax"),
        F.round(hap.cast("double") / F.count("*"), 6).alias("hapax_ratio"),
    )
