"""Keyword retrieval, part 5 (STAGED in round 8 — see
registry.STAGED_MODULES): the two remaining classic ranking models
beside BM25 (retrieval.py), PL2 (retrieval4.py), and the
Dirichlet-smoothed query likelihood (retrieval3.py) —

1. Jelinek-Mercer-smoothed query likelihood (Jelinek & Mercer 1980;
   Zhai & Lafferty, SIGIR'01): score(d) = Σ_w ln(λ·tf/dl +
   (1−λ)·cf/C) — the fixed-coefficient interpolation twin of the
   Dirichlet scorer, better for verbose queries per Zhai & Lafferty.
2. tf-idf cosine ranking (Salton's vector space model, 1975): the
   textbook VSM score cos(d, q) with w = tf·ln(N/df), the baseline
   every IR course builds first.

Reference parity: no retrieval surface exists in the reference
(cmd/backup.go) — north-star training-data-curation capability.

Scale shape: JM is explode-free (fixed per-term array filters like
q_ql_dirichlet_topk — |query| columns, one 1-row stats broadcast,
one TakeOrdered). Cosine pays the standard one postings explode
(corpus-sized, map-side combined into (doc, term) counts); the
df/idf table is vocabulary-bounded, the norm reduce is per-doc, and
the query-side join touches |query| postings rows only. Per-term
norm contributions quantize to DECIMAL before the per-doc sum so
the reduce is order-independent (the analytics5/benford discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.retrieval import QUERY_TERMS, _TERMS_SQL
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

JM_LAMBDA = 0.7  # Zhai & Lafferty's verbose-query sweet spot
JM_TOP_K = 20
COS_TOP_K = 20

_JM_TF_SQL = ",\n         ".join(
    f"len(list_filter(ws, x -> x = '{t}')) AS tf{i+1}"
    for i, t in enumerate(QUERY_TERMS)
)
_JM_CF_SQL = ",\n         ".join(
    f"CAST(SUM(tf{i+1}) AS BIGINT) AS cf{i+1}" for i in range(len(QUERY_TERMS))
)
_JM_SCORE_SQL = "\n           + ".join(
    f"ln({JM_LAMBDA} * (tf{i+1} * 1.0 / dl)"
    f" + {1.0 - JM_LAMBDA} * (cf{i+1} * 1.0 / ctot))"
    for i in range(len(QUERY_TERMS))
)

_JM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS ws
  FROM documents
), pd AS (
  SELECT doc_id, len(ws) AS dl,
         {_JM_TF_SQL}
  FROM toks
  WHERE len(ws) > 0
), coll AS (
  SELECT CAST(SUM(dl) AS BIGINT) AS ctot,
         {_JM_CF_SQL}
  FROM pd
)
SELECT doc_id,
       round({_JM_SCORE_SQL},
             8) AS jm_score
FROM pd, coll
ORDER BY jm_score DESC, doc_id
LIMIT {JM_TOP_K}
"""


@query("q_ql_jelinek_mercer", oracle=_JM_ORACLE)
def q_ql_jelinek_mercer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer query-likelihood top-k: score(d) =
    Σ_w ln(λ·tf(w,d)/dl + (1−λ)·cf(w)/C), λ=0.7 — the
    fixed-interpolation twin of q_ql_dirichlet_topk
    (retrieval3.py:169), same explode-free plan: per-term counts via
    JVM-side array filters (|query| fixed columns), one 1-row
    collection-stats broadcast, one TakeOrdered. Docs with dl=0 are
    excluded in BOTH engines (tf/dl is undefined for them; Dirichlet
    dodges this via the +μ mass, JM cannot). The score is a
    fixed-shape 3-term ordered sum, identical in both engines;
    ties after round-8 break on doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("ws"),
    )

    def _tf(term: str):
        # single-arg lambda — see retrieval3's q_ql_dirichlet_topk
        return F.size(F.filter("ws", lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"tf{i+1}") for i, t in enumerate(QUERY_TERMS)]
    pd = toks.select("doc_id", F.size("ws").alias("dl"), *tf_cols).filter(
        F.col("dl") > 0
    )
    coll = pd.agg(
        F.sum("dl").cast("bigint").alias("ctot"),
        *[
            F.sum(f"tf{i+1}").cast("bigint").alias(f"cf{i+1}")
            for i in range(len(QUERY_TERMS))
        ],
    )
    score = None
    for i in range(len(QUERY_TERMS)):
        term = F.log(
            F.lit(JM_LAMBDA) * (F.col(f"tf{i+1}") * F.lit(1.0) / F.col("dl"))
            + F.lit(1.0 - JM_LAMBDA)
            * (F.col(f"cf{i+1}") * F.lit(1.0) / F.col("ctot"))
        )
        score = term if score is None else score + term
    return (
        pd.crossJoin(F.broadcast(coll))
        .select("doc_id", F.round(score, 8).alias("jm_score"))
        .orderBy(F.desc("jm_score"), "doc_id")
        .limit(JM_TOP_K)
    )


_COS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS ws
  FROM documents
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM toks
), tf AS (
  SELECT doc_id, w AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(ws) AS w FROM toks)
  GROUP BY doc_id, w
), idf AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
         CAST(ln(n.n_docs * 1.0 / COUNT(*)) AS DECIMAL(20,8)) AS idf
  FROM tf, n GROUP BY term, n.n_docs
), norm AS (
  SELECT tf.doc_id,
         CAST(CAST(SUM(CAST(
           (tf.tf * CAST(idf.idf AS DOUBLE)) * (tf.tf * CAST(idf.idf AS DOUBLE))
           AS DECIMAL(24,10))) AS VARCHAR) AS DOUBLE) AS norm2
  FROM tf JOIN idf ON idf.term = tf.term
  GROUP BY tf.doc_id
), qnorm AS (
  SELECT CAST(CAST(SUM(CAST(
           CAST(idf AS DOUBLE) * CAST(idf AS DOUBLE) AS DECIMAL(24,10)))
         AS VARCHAR) AS DOUBLE) AS qnorm2
  FROM idf WHERE term IN ({_TERMS_SQL})
), dot AS (
  SELECT tf.doc_id,
         CAST(CAST(SUM(CAST(
           tf.tf * CAST(idf.idf AS DOUBLE) * CAST(idf.idf AS DOUBLE)
           AS DECIMAL(24,10))) AS VARCHAR) AS DOUBLE) AS dot
  FROM tf JOIN idf ON idf.term = tf.term
  WHERE tf.term IN ({_TERMS_SQL})
  GROUP BY tf.doc_id
)
SELECT d.doc_id,
       round(d.dot / (sqrt(nm.norm2) * sqrt(q.qnorm2)), 8) AS cosine
FROM dot d JOIN norm nm ON nm.doc_id = d.doc_id, qnorm q
ORDER BY cosine DESC, d.doc_id
LIMIT {COS_TOP_K}
"""


@query("q_tfidf_cosine_topk", oracle=_COS_ORACLE)
def q_tfidf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf cosine top-k (Salton's vector space model): documents
    as tf·idf vectors with idf = ln(N/df), query = the QUERY_TERMS
    one-hot vector (so its tf-idf weight per term is idf itself),
    score = dot/(|d|·|q|). The ONE corpus-sized op is the postings
    explode → (doc, term, tf) map-side-combined reduce shared shape
    with q_bm25_topk; df/idf is vocabulary-bounded and the
    query-side dot touches |query| postings rows only. The per-doc
    norm Σ(tf·idf)² runs over every term of the doc, so each term
    quantizes to DECIMAL(24,10) before the sum — order-independent
    on both engines; idf itself is pinned at DECIMAL(20,8) exactly
    like BM25's. Final cosine is one flat double expression; ties
    after round-8 break on doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("ws"),
    )
    n = toks.agg(F.count("*").cast("bigint").alias("n_docs"))
    tf = (
        toks.select("doc_id", F.explode("ws").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            F.log(F.col("n_docs") * F.lit(1.0) / F.col("df"))
            .cast("decimal(20,8)")
            .alias("idf"),
        )
    )
    weighted = tf.join(idf, "term").select(
        "doc_id",
        "term",
        "tf",
        F.col("idf").cast("double").alias("idf_d"),
    )
    norm = weighted.groupBy("doc_id").agg(
        F.sum(
            ((F.col("tf") * F.col("idf_d")) * (F.col("tf") * F.col("idf_d")))
            .cast("decimal(24,10)")
        )
        .cast("double")
        .alias("norm2")
    )
    qnorm = (
        idf.filter(F.col("term").isin(*QUERY_TERMS))
        .agg(
            F.sum(
                (F.col("idf").cast("double") * F.col("idf").cast("double"))
                .cast("decimal(24,10)")
            )
            .cast("double")
            .alias("qnorm2")
        )
    )
    dot = (
        weighted.filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id")
        .agg(
            F.sum(
                (F.col("tf") * F.col("idf_d") * F.col("idf_d")).cast(
                    "decimal(24,10)"
                )
            )
            .cast("double")
            .alias("dot")
        )
    )
    return (
        dot.join(norm, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .select(
            "doc_id",
            F.round(
                F.col("dot") / (F.sqrt("norm2") * F.sqrt("qnorm2")), 8
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "doc_id")
        .limit(COS_TOP_K)
    )
