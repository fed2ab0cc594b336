"""LLM-pipeline operators, part 17 (round-5 wave 8): Kneser-Ney
smoothed bigram language model (Kneser & Ney, ICASSP'95; the
interpolated form of Chen & Goodman '98 — public).

Extends q_bigram_lm's MLE head with the smoothing every production
n-gram LM uses: absolute discounting plus a continuation-probability
backoff that scores words by how many CONTEXTS they follow (the
"Francisco" problem — frequent but context-locked words must not
inherit high backoff mass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.llm_text11 import BIGRAM_SUPPORT, bigram_counts
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

KN_DELTA = 0.75  # absolute discount; exactly representable in binary
KN_SUPPORT = BIGRAM_SUPPORT  # context floor, SHARED with q_bigram_lm


@query(
    "q_kneser_ney_bigram",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
               AS tokens
      FROM documents
    ), bg AS (
      SELECT tokens[i] AS w1, tokens[i + 1] AS w2
      FROM toks, unnest(generate_series(1, len(tokens) - 1)) AS t(i)
    ), cnt AS (
      SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2
    ), ctx AS (
      SELECT w1, SUM(c) AS n, COUNT(*) AS d1 FROM cnt GROUP BY w1
    ), cont AS (
      SELECT w2, COUNT(*) AS cw FROM cnt GROUP BY w2
    ), types AS (
      SELECT COUNT(*) AS bt FROM cnt
    ), scored AS (
      SELECT cnt.w1, cnt.w2,
             (CAST(cnt.c AS DOUBLE) - {KN_DELTA}) / CAST(ctx.n AS DOUBLE)
               + (({KN_DELTA} * CAST(ctx.d1 AS DOUBLE)) / CAST(ctx.n AS DOUBLE))
                 * (CAST(cont.cw AS DOUBLE) / CAST(types.bt AS DOUBLE)) AS p_kn,
             row_number() OVER (PARTITION BY cnt.w1
                                ORDER BY cnt.c DESC, cnt.w2) AS rk
      FROM cnt
      JOIN ctx ON ctx.w1 = cnt.w1
      JOIN cont ON cont.w2 = cnt.w2
      CROSS JOIN types
      WHERE ctx.n >= {KN_SUPPORT}
    )
    SELECT w1, w2, p_kn, CAST(rk AS INT) AS rk FROM scored WHERE rk <= 3
    """,
)
def q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities, top-3 successors
    per context with ≥{KN_SUPPORT} occurrences:
    P_KN(w2|w1) = (c(w1,w2) − δ)/c(w1·)
                  + (δ·N1+(w1·)/c(w1·)) · N1+(·w2)/N1+(··), δ={KN_DELTA}.

    Scale shape: everything reduces to the (w1, w2) count table
    first — the context totals/fanouts, continuation counts, and the
    1-row bigram-type total are all aggregates OF that table, so the
    shuffles move count pairs, never documents; the type total is a
    1-row broadcast. Cross-engine: every operand is an exact integer
    (or the exactly-representable δ=0.75) entering an identically
    parenthesized double expression — each step correctly rounded in
    both engines — and p_kn is emitted UNROUNDED (the
    q_series_derivative lesson: round() on computed doubles is not
    cross-engine stable at half boundaries)."""
    d = load_table(spark, sf_dir, "documents")
    # shared with q_bigram_lm (llm_text11); lazily checkpointed
    # because FOUR consumers reference it (ctx, cont, types, the
    # scored join) and Catalyst re-executes an un-materialized
    # subtree per reference (measured 7.3 s → ~2 s at sf0.1)
    cnt = bigram_counts(d).localCheckpoint(eager=False)
    ctx = cnt.groupBy("w1").agg(
        F.sum("c").alias("n"), F.count("*").alias("d1")
    ).filter(F.col("n") >= KN_SUPPORT)
    cont = cnt.groupBy("w2").agg(F.count("*").alias("cw"))
    types = cnt.agg(F.count("*").alias("bt"))  # 1-row broadcast
    delta = F.lit(KN_DELTA)
    p_kn = (F.col("c").cast("double") - delta) / F.col("n").cast("double") + (
        (delta * F.col("d1").cast("double")) / F.col("n").cast("double")
    ) * (F.col("cw").cast("double") / F.col("bt").cast("double"))
    scored = (
        cnt.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("w1").orderBy(F.desc("c"), F.asc("w2"))
            ),
        )
        .filter(F.col("rk") <= 3)
    )
    return scored.select(
        "w1", "w2", p_kn.alias("p_kn"), F.col("rk").cast("int").alias("rk")
    )
