"""LLM-pipeline operators, part 9 (round 3): Count-Min sketch
frequency estimation (the third sketch family after HLL and
Misra-Gries) and CCNet-style unigram log-prob (perplexity) quality
filtering.

The CM sketch is a pure expression tree — d×w bounded counters built
with one groupBy, probed via a broadcast join; no UDF, no token ever
reaches the driver. The log-prob scorer decimal-accumulates per-term
log2 values (the repo's order-independent sum rule) so the Spark and
DuckDB results hash-match despite shuffled aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

CM_D = 4  # hash rows
CM_W = 8192  # counters per row; overestimate ≤ ~e·n/W w.h.p.


def _cm_cells(word_col) -> F.Column:
    """Array of (row, col) cells a token increments."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(F.xxhash64(word_col, F.lit(r)), F.lit(CM_W)).alias("c"),
            )
            for r in range(CM_D)
        ]
    )


def cm_sketch(words: DataFrame) -> DataFrame:
    """(r, c, cnt) counter table — exactly d×w rows regardless of
    corpus size; the only shuffle is the bounded-key count."""
    return (
        words.select(F.explode(_cm_cells(F.col("word"))).alias("cell"))
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query("q_cm_sketch_estimates")
def q_cm_sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min estimates for the exact top-30 tokens: build the
    d×w sketch in one pass, then probe each candidate token with a
    broadcast join against the (bounded) counter table and take the
    row-wise minimum. est ≥ true always; pytest bounds the
    overestimate at 3·n/W. Rows-only oracle (xxhash64); the exact
    counts travel alongside so the error is visible in the output."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(doc_words("text")).alias("word"))
    sketch = cm_sketch(words)
    top = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("word"))
        .limit(30)
    )
    probes = top.select(
        "word", "true_cnt", F.explode(_cm_cells(F.col("word"))).alias("cell")
    ).select("word", "true_cnt", F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
    return (
        probes.join(F.broadcast(sketch), ["r", "c"])
        .groupBy("word", "true_cnt")
        .agg(F.min("cnt").cast("bigint").alias("est_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("word"))
        .select(
            "word",
            F.col("true_cnt").cast("bigint").alias("true_cnt"),
            "est_cnt",
        )
    )


@query(
    "q_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS word
      FROM documents
    ),
    total AS (SELECT COUNT(*) AS n FROM toks),
    uni AS (
      SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word
    ),
    scored AS (
      SELECT t.doc_id,
             CAST(log2(CAST(u.cnt AS DOUBLE) / tt.n) AS DECIMAL(20,8)) AS lp
      FROM toks t JOIN uni u ON t.word = u.word CROSS JOIN total tt
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           round(-CAST(SUM(lp) AS DOUBLE) / COUNT(*), 4) AS bits_per_token
    FROM scored GROUP BY doc_id
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram cross-entropy (bits/token) under the
    corpus's own unigram distribution — the perplexity-style quality
    filter (CCNet family): repetitive low-entropy spam scores low,
    rare-token soup scores high. Each token's log2 prob is rounded to
    DECIMAL(20,8) BEFORE the per-doc sum on both engines, so the
    aggregation is associative/order-independent (oracle-stability
    rule) and immune to libm last-ulp drift. The unigram table is
    vocab-sized; the join is AQE-sized, never forced."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(doc_words("text")).alias("word"))
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    uni = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    lp = F.log2(F.col("cnt").cast("double") / F.col("n")).cast("decimal(20,8)")
    scored = (
        toks.join(uni, "word")
        .join(F.broadcast(total))
        .select("doc_id", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok"),
        F.round(-(F.sum("lp").cast("double")) / F.count(F.lit(1)), 4).alias(
            "bits_per_token"
        ),
    )
