"""Retrieval, part 7 (promoted into load_all()'s round-11 tail):
nDCG@k (Järvelin & Kekäläinen, TOIS 2002) of the BM25 ranking with
GRADED relevance — retrieval6's binary recall/MRR harness upgraded
to graded gains, the metric that distinguishes "found the relevant
docs" from "found the MOST relevant first". Grades come from the
contamination machinery: a doc's grade is its n_contaminated count
(how many of its shingles hit the benchmark slice), so the label
side is deterministic and already oracle-pinned.

Exactness: ranks come from the deterministic DECIMAL-score order;
each DCG/IDCG term grade/log2(rank+1) quantizes to DECIMAL(24,12)
before its sum (order-independence — the q_dunning_keyness trick);
one flat division at the end. log2(x) is written ln(x)/ln(2) with
the IDENTICAL expression text on both engines.

Scale shape: the BM25 side is the postings-pruned TOP_K plan; the
grade side is the contamination semi-join aggregate; DCG joins
TOP_K rows × a broadcast grade table; IDCG sorts the bounded grade
table once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.llm_text6 import (
    BENCH_MOD,
    _shingles,
    doc_words,
)
from timestream_travel_spark.operators.retrieval import (
    _BM25_CTES,
    TOP_K,
    bm25_scores_cached,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_ndcg_bm25",
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
    grades AS (
      SELECT t.doc_id, CAST(COUNT(DISTINCT t.s) AS BIGINT) AS grade
      FROM sh t JOIN bench b ON t.s = b.s
      WHERE t.doc_id % {BENCH_MOD} <> 0
      GROUP BY t.doc_id
    ), dcg AS (
      SELECT CAST(CAST(SUM(CAST(
               CAST(g.grade AS DOUBLE) / (ln(r.rnk + 1.0) / ln(2.0))
               AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS dcg
      FROM ranked r JOIN grades g ON g.doc_id = r.doc_id
    ), ideal AS (
      SELECT grade,
             row_number() OVER (ORDER BY grade DESC, doc_id) AS rnk
      FROM grades ORDER BY grade DESC, doc_id LIMIT {TOP_K}
    ), idcg AS (
      SELECT CAST(CAST(SUM(CAST(
               CAST(grade AS DOUBLE) / (ln(rnk + 1.0) / ln(2.0))
               AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS idcg
      FROM ideal
    )
    SELECT CAST({TOP_K} AS INT) AS k,
           round(COALESCE(dcg.dcg, 0.0), 6) AS dcg_at_k,
           round(idcg.idcg, 6) AS idcg_at_k,
           round(COALESCE(dcg.dcg, 0.0) / idcg.idcg, 6) AS ndcg_at_k
    FROM dcg CROSS JOIN idcg
    """,
)
def q_ndcg_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{TOP_K} of the BM25 ranking with graded relevance
    (grade = a doc's distinct contaminated-shingle count):
    DCG = Σ grade_i / log₂(rank_i + 1) over the top-k, normalized by
    the ideal ordering of ALL graded docs truncated at k. Terms
    quantize to DECIMAL(24,12) before the sum; ties in the ideal
    ordering break on doc_id."""
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = (
        bm25_scores_cached(spark, sf_dir)
        .orderBy(F.desc("score"), "doc_id")
        .limit(TOP_K)
        .withColumn("rnk", F.row_number().over(w))
        .select("doc_id", "rnk")
    )
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    sh = d.select("doc_id", F.explode(_shingles(doc_words("text"))).alias("s"))
    bench = sh.filter(F.col("doc_id") % BENCH_MOD == 0).select("s").distinct()
    grades = (
        sh.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(bench, "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count_distinct("s").cast("bigint").alias("grade"))
    )
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731
    term = lambda grade, rnk: (  # noqa: E731
        grade.cast("double") / log2(rnk + F.lit(1.0))
    ).cast("decimal(24,12)")
    dcg = (
        ranked.join(F.broadcast(grades), "doc_id")
        .agg(F.sum(term(F.col("grade"), F.col("rnk"))).cast("double").alias("dcg"))
    )
    wi = Window.orderBy(F.desc("grade"), F.asc("doc_id"))
    ideal = (
        grades.orderBy(F.desc("grade"), "doc_id")
        .limit(TOP_K)
        .withColumn("rnk", F.row_number().over(wi))
    )
    idcg = ideal.agg(
        F.sum(term(F.col("grade"), F.col("rnk"))).cast("double").alias("idcg")
    )
    return dcg.crossJoin(F.broadcast(idcg)).select(
        F.lit(TOP_K).cast("int").alias("k"),
        F.round(F.coalesce("dcg", F.lit(0.0)), 6).alias("dcg_at_k"),
        F.round("idcg", 6).alias("idcg_at_k"),
        F.round(F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"), 6).alias(
            "ndcg_at_k"
        ),
    )
