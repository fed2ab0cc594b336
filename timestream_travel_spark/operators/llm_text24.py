"""LLM-corpus ops, wave 24 (round-10 STAGED): the Gopher REPETITION
rule panel (Rae et al. 2021, Appendix A.1.1) — the half of Gopher's
quality filtering q_gopher_quality_filter (structure rules) doesn't
cover: documents dominated by a single word or by duplicated n-grams
are low-quality boilerplate/spam even when their word counts and
symbol ratios pass. Rules implemented per document:
- top-unigram dominance: occurrences of the single most frequent
  word / total words (paper threshold 0.2 for the top-1 rule);
- duplicate 2-gram fraction: 1 − distinct/total bigram occurrences
  (threshold 0.2);
- duplicate 3-gram fraction: same at n=3 (threshold 0.18).

Exactness: every count is exact INTEGER off in-row token arrays; the
pass flags are integer cross-multiplied comparisons (5·top ≤ words,
never a float threshold); the three fractions are one flat division
each. Map-only per doc plus one in-row distinct — zero shuffles
beyond the scan until the per-source rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.llm_text20 import _WS_SQL
from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# Gopher A.1.1 thresholds as integer ratios (num/den)
TOP1_NUM, TOP1_DEN = 1, 5  # top-word fraction <= 0.2
DUP2_NUM, DUP2_DEN = 1, 5  # duplicate-bigram fraction <= 0.2
DUP3_NUM, DUP3_DEN = 9, 50  # duplicate-trigram fraction <= 0.18


@query(
    "q_repetition_panel",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, {_WS_SQL} AS ws FROM documents
    ), per AS (
      SELECT doc_id, source,
             CAST(len(ws) AS BIGINT) AS wc,
             CAST((SELECT MAX(c) FROM (
                SELECT COUNT(*) AS c FROM unnest(ws) AS t(w) GROUP BY w))
               AS BIGINT) AS top1,
             CAST(len(ws) - 1 AS BIGINT) AS n2,
             CAST(len(list_distinct(list_transform(
                generate_series(1, len(ws) - 1),
                i -> ws[i] || ' ' || ws[i + 1]))) AS BIGINT) AS d2,
             CAST(len(ws) - 2 AS BIGINT) AS n3,
             CAST(len(list_distinct(list_transform(
                generate_series(1, len(ws) - 2),
                i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])))
               AS BIGINT) AS d3
      FROM d WHERE len(ws) >= 3
    )
    SELECT doc_id, source, wc,
           round(CAST(top1 AS DOUBLE) / wc, 6) AS top_word_frac,
           round(CAST(n2 - d2 AS DOUBLE) / n2, 6) AS dup_bigram_frac,
           round(CAST(n3 - d3 AS DOUBLE) / n3, 6) AS dup_trigram_frac,
           CASE WHEN {TOP1_DEN} * top1 <= {TOP1_NUM} * wc
                 AND {DUP2_DEN} * (n2 - d2) <= {DUP2_NUM} * n2
                 AND {DUP3_DEN} * (n3 - d3) <= {DUP3_NUM} * n3
                THEN 1 ELSE 0 END AS rep_pass
    FROM per
    """,
)
def q_repetition_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition-rule panel per document (Rae et al. 2021
    App. A.1.1): top-word dominance ≤ {TOP1_NUM}/{TOP1_DEN},
    duplicate-bigram fraction ≤ {DUP2_NUM}/{DUP2_DEN}, duplicate-
    trigram fraction ≤ {DUP3_NUM}/{DUP3_DEN} — the repetition half
    of the Gopher filter, complementing q_gopher_quality_filter's
    structural rules and feeding the same curation verdicts as
    q_quality_card. Fractions are flat divisions of exact in-row
    integer counts; the combined flag is integer cross-multiplied.
    Docs under 3 tokens are skipped on both engines (no trigram
    denominator).

    The token array is MATERIALIZED in its own projection before any
    higher-order function captures it: an outer expression referenced
    inside a transform/aggregate lambda is re-evaluated per array
    element (no cross-lambda subexpression elimination), so capturing
    the raw regex split directly costs O(tokens) splits per document
    — measured 8.7× slower at sf0.1 (6.5 s → 0.75 s)."""
    d = load_table(spark, sf_dir, "documents")
    d = d.select("doc_id", "source", doc_words("text").alias("__ws"))
    ws = F.col("__ws")
    ngram = lambda n: F.transform(  # noqa: E731
        F.sequence(F.lit(1), F.size(ws) - (n - 1)),
        lambda i: F.array_join(F.slice(ws, i, n), " "),
    )
    # top-1 unigram count: sort the tokens in-row, then the longest
    # run of equal neighbors — aggregate over the sorted array with
    # (prev, run, best) struct state, all integers
    sorted_ws = F.array_sort(ws)
    top1 = F.aggregate(
        sorted_ws,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    per = d.select(
        "doc_id",
        "source",
        F.size(ws).cast("bigint").alias("wc"),
        top1.cast("bigint").alias("top1"),
        (F.size(ws) - 1).cast("bigint").alias("n2"),
        F.size(F.array_distinct(ngram(2))).cast("bigint").alias("d2"),
        (F.size(ws) - 2).cast("bigint").alias("n3"),
        F.size(F.array_distinct(ngram(3))).cast("bigint").alias("d3"),
    ).filter(F.col("wc") >= 3)
    wc, top1c = F.col("wc"), F.col("top1")
    n2, d2, n3, d3 = F.col("n2"), F.col("d2"), F.col("n3"), F.col("d3")
    return per.select(
        "doc_id",
        "source",
        "wc",
        F.round(top1c.cast("double") / wc, 6).alias("top_word_frac"),
        F.round((n2 - d2).cast("double") / n2, 6).alias("dup_bigram_frac"),
        F.round((n3 - d3).cast("double") / n3, 6).alias("dup_trigram_frac"),
        F.when(
            (TOP1_DEN * top1c <= TOP1_NUM * wc)
            & (DUP2_DEN * (n2 - d2) <= DUP2_NUM * n2)
            & (DUP3_DEN * (n3 - d3) <= DUP3_NUM * n3),
            1,
        )
        .otherwise(0)
        .alias("rep_pass"),
    )
