"""Retrieval, part 6 (round 11): the retrieval EVAL harness — the
r10 verdict's growth-wave candidate (e). Standard ranked-retrieval
metrics (recall@k, precision@k, MRR — Manning, Raghavan & Schütze,
IIR ch. 8) of the q_bm25_topk ranking, judged against the repo's
deterministic relevance labels: the contamination set (training docs
sharing word-5-gram shingles with the doc_id%{BENCH_MOD}==0
benchmark slice — q_contamination_ngrams' output). The labels are
arbitrary-but-deterministic, which is exactly what the harness
needs: the deliverable is the metric machinery (rank extraction,
first-relevant reciprocal rank, set intersections), reusable against
any (query, qrels) pair by swapping the two CTEs.

Exactness: ranks come from the established deterministic order
(DECIMAL-summed BM25 score DESC, doc_id ASC); hit counts are exact
integers; each metric is one flat division rounded at the boundary.

Scale shape: the BM25 side is q_bm25_topk's postings-pruned plan
(broadcast df/stats, TOP_K-bounded output); the label side is
q_contamination_ngrams' dedup-shingle semi-join. The metric join is
TOP_K rows × a broadcast label set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.llm_text6 import BENCH_MOD
from timestream_travel_spark.operators.retrieval import (
    _BM25_CTES,
    TOP_K,
    bm25_scores_cached,
)
from timestream_travel_spark.registry import query


@query(
    "q_retrieval_eval_bm25",
    oracle=f"""{_BM25_CTES},
    ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
      FROM scored ORDER BY score DESC, doc_id LIMIT {TOP_K}
    ), w AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS ws
      FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws) - 3),
                                   i -> array_to_string(ws[i:i+4], ' '))) AS s
      FROM w WHERE len(ws) >= 5
    ), bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % {BENCH_MOD} = 0),
    relevant AS (
      SELECT DISTINCT t.doc_id
      FROM sh t JOIN bench b ON t.s = b.s
      WHERE t.doc_id % {BENCH_MOD} <> 0
    ), nrel AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rel FROM relevant),
    hits AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_hits,
             MIN(r.rnk) AS first_rank
      FROM ranked r JOIN relevant v ON v.doc_id = r.doc_id
    )
    SELECT CAST({TOP_K} AS INT) AS k, nrel.n_rel AS n_relevant,
           hits.n_hits,
           round(CAST(hits.n_hits AS DOUBLE) / nrel.n_rel, 6) AS recall_at_k,
           round(CAST(hits.n_hits AS DOUBLE) / {TOP_K}, 6) AS precision_at_k,
           round(COALESCE(1.0 / hits.first_rank, 0.0), 6) AS mrr
    FROM nrel CROSS JOIN hits
    """,
)
def q_retrieval_eval_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@{TOP_K} / precision@{TOP_K} / MRR of the BM25 ranking
    against the contamination relevance labels (one summary row).
    MRR is the reciprocal rank of the FIRST relevant doc in the
    top-k, 0 when none lands there."""
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = (
        bm25_scores_cached(spark, sf_dir)
        .orderBy(F.desc("score"), "doc_id")
        .limit(TOP_K)
        .withColumn("rnk", F.row_number().over(w))
        .select("doc_id", "rnk")
    )
    # r15: BM25 scores and the relevance label set come from the
    # session caches (retrieval.bm25_scores_cached /
    # retrieval8.relevant_docs_cached) — per-metric work is then
    # rank/set reduces over ≤TOP_K + |labels| rows.
    from timestream_travel_spark.operators.retrieval8 import relevant_docs_cached

    relevant = relevant_docs_cached(spark, sf_dir)
    nrel = relevant.agg(F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    hits = ranked.join(F.broadcast(relevant), "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        F.min("rnk").alias("first_rank"),
    )
    return nrel.crossJoin(F.broadcast(hits)).select(
        F.lit(TOP_K).cast("int").alias("k"),
        F.col("n_rel").alias("n_relevant"),
        "n_hits",
        F.round(F.col("n_hits").cast("double") / F.col("n_rel"), 6).alias(
            "recall_at_k"
        ),
        F.round(F.col("n_hits").cast("double") / TOP_K, 6).alias(
            "precision_at_k"
        ),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("first_rank"), F.lit(0.0)), 6
        ).alias("mrr"),
    )
