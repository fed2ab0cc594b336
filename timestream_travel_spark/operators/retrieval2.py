"""Retrieval, part 2 (round 5, wave 6): hybrid keyword + vector
retrieval via Reciprocal Rank Fusion.

RRF (Cormack, Clarke & Buettcher, SIGIR 2009, public): fuse rankers
by score(d) = Σᵣ 1/(K + rankᵣ(d)) — the standard way modern search
stacks combine BM25 with embedding similarity, robust to the two
score scales being incomparable. The fixture's doc_id and vec_id key
spaces align 1:1, so the documents corpus and its embedding table
describe the same items.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.functions.vectors import cosine, query_vector_lit, to_double_array
from timestream_travel_spark.operators.retrieval import QUERY_TERMS, bm25_scores_cached
from timestream_travel_spark.operators.similarity import QUERY_VEC_ID, _query_vec
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

RRF_K = 60
RRF_BRANCH_TOP = 100  # fuse the top-100 of each ranker
RRF_TOP = 20

_TERMS_SQL = "'" + "', '".join(QUERY_TERMS) + "'"

_RRF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS ws
  FROM documents
), stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(len(ws)) AS DOUBLE) / COUNT(*) AS avgdl
  FROM toks
), tf AS (
  SELECT doc_id, w AS term, COUNT(*) AS tf, any_value(dl) AS dl
  FROM (SELECT doc_id, unnest(ws) AS w, len(ws) AS dl FROM toks)
  WHERE w IN ({_TERMS_SQL})
  GROUP BY doc_id, w
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), idf AS (
  SELECT term,
         CAST(ln((stats.n_docs - df + 0.5) / (df + 0.5) + 1.0)
              AS DECIMAL(20,8)) AS idf
  FROM df, stats
), scored AS (
  SELECT tf.doc_id,
         CAST(SUM(CAST(
           CAST(idf.idf AS DOUBLE)
           * (tf.tf * (1.2 + 1.0))
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / stats.avgdl))
           AS DECIMAL(20,8))) AS DOUBLE) AS score
  FROM tf JOIN idf ON tf.term = idf.term, stats
  GROUP BY tf.doc_id
), kw AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM scored ORDER BY score DESC, doc_id LIMIT {RRF_BRANCH_TOP}
), q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
sims AS (
  SELECT v.vec_id,
         round(
           list_sum(list_transform(generate_series(1, len(v.embedding)),
             i -> CAST(v.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
         4) AS cos_sim
  FROM embeddings v, q
  WHERE v.vec_id <> {QUERY_VEC_ID}
), vec AS (
  SELECT vec_id, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS r
  FROM sims ORDER BY cos_sim DESC, vec_id LIMIT {RRF_BRANCH_TOP}
), fused AS (
  SELECT COALESCE(kw.doc_id, vec.vec_id) AS doc_id,
         kw.r AS bm25_rank, vec.r AS cos_rank,
         COALESCE(1.0 / ({RRF_K} + kw.r), 0)
           + COALESCE(1.0 / ({RRF_K} + vec.r), 0) AS rrf_score
  FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.vec_id
)
SELECT doc_id, rrf_score,
       CAST(bm25_rank AS BIGINT) AS bm25_rank,
       CAST(cos_rank AS BIGINT) AS cos_rank
FROM fused
ORDER BY rrf_score DESC, doc_id LIMIT {RRF_TOP}
"""


@query("q_rrf_hybrid", oracle=_RRF_ORACLE)
def q_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: RRF over the BM25 keyword ranking and the
    embedding-cosine ranking for the same fixed query, fusing each
    branch's TOP-{RRF_BRANCH_TOP} (truncated RRF — items outside a
    branch's head contribute 0 from that branch).

    Scale shape: both branch rankings reduce to bounded candidate
    sets BEFORE any global ordering — BM25 scores only postings-
    pruned docs and TakeOrdereds its head; cosine TakeOrdereds the
    one-scan similarity table — so the rank windows and the full
    outer join run on ≤ 2·{RRF_BRANCH_TOP} rows. Each RRF term is an
    exact-rational double division; the fused score is one fixed
    two-term sum, identical on both engines."""
    kw_top = (
        bm25_scores_cached(spark, sf_dir)
        .orderBy(F.desc("score"), "doc_id")
        .limit(RRF_BRANCH_TOP)
    )
    kw = kw_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .alias("bm25_rank"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qv = query_vector_lit(_query_vec(spark, sf_dir))
    sim = F.round(cosine(to_double_array(F.col("embedding")), qv), 4)
    vec_top = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(RRF_BRANCH_TOP)
    )
    vec = vec_top.select(
        "vec_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cos_sim"), "vec_id"))
        .alias("cos_rank"),
    )
    fused = kw.join(vec, kw.doc_id == vec.vec_id, "full_outer").select(
        F.coalesce(kw.doc_id, vec.vec_id).alias("doc_id"),
        (
            F.coalesce(1.0 / (RRF_K + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("cos_rank")), F.lit(0.0))
        ).alias("rrf_score"),
        F.col("bm25_rank").cast("bigint").alias("bm25_rank"),
        F.col("cos_rank").cast("bigint").alias("cos_rank"),
    )
    return fused.select("doc_id", "rrf_score", "bm25_rank", "cos_rank").orderBy(
        F.desc("rrf_score"), "doc_id"
    ).limit(RRF_TOP)
