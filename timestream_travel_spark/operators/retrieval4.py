"""Keyword retrieval, part 4: PL2 divergence-from-randomness
ranking (Amati & van Rijsbergen, TOIS 2002 — the Poisson model with
Laplace after-effect and H2 length normalization), the third classic
lexical ranker beside BM25 (retrieval.py) and Dirichlet query
likelihood (retrieval3.py); Terrier ships it as its default DFR
model.

    tfn      = tf · log2(1 + c·avgdl/dl)            (H2, c = 1)
    lambda_t = F_t / N                              (collection prior)
    score(d) = sum_t (1/(tfn+1)) · ( tfn·log2(tfn/lambda_t)
               + (lambda_t − tfn)·log2(e) + 0.5·log2(2·pi·tfn) )

Exactness design (the BM25 discipline): per-(doc, term) contributions
are ONE flat double expression over exact integer inputs (tf, dl,
F_t, N) plus the shared double avgdl; each contribution quantizes to
DECIMAL(20,8) before the per-doc exact sum (bounded by |query|
terms), so partial-agg order cannot flip the hash. log2(e) and 2·pi
are written as exact double literals in BOTH engines — computing
them via exp/pi risks a cross-libm ulp.

Scale shape: identical to BM25 — one corpus scan, postings pruned to
the query terms BEFORE any shuffle, the |query|-row collection-stats
table and the 1-row (N, avgdl) stats broadcast, top-k via
TakeOrderedAndProject with a doc_id tiebreak.

Reference parity: none (cmd/backup.go has no retrieval surface) —
north-star training-data-curation capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.retrieval import (
    QUERY_TERMS,
    TOP_K,
    _TERMS_SQL,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

PL2_C = 1.0  # H2 length-normalization parameter (Terrier default)
LOG2_E = 1.4426950408889634  # exact double repr of log2(e)
TWO_PI = 6.283185307179586  # exact double repr of 2*pi

_PL2_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS ws
  FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(ws)) AS DOUBLE) / COUNT(*) AS avgdl
  FROM toks
), tf AS (
  SELECT doc_id, w AS term, CAST(COUNT(*) AS BIGINT) AS tf,
         CAST(any_value(dl) AS BIGINT) AS dl
  FROM (SELECT doc_id, unnest(ws) AS w, len(ws) AS dl FROM toks)
  WHERE w IN ({_TERMS_SQL})
  GROUP BY doc_id, w
), cf AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY term
), contrib AS (
  SELECT tf.doc_id,
         CAST(
           (1.0 / (tf.tf * log2(1.0 + {PL2_C} * stats.avgdl / tf.dl) + 1.0))
           * ( tf.tf * log2(1.0 + {PL2_C} * stats.avgdl / tf.dl)
               * log2(tf.tf * log2(1.0 + {PL2_C} * stats.avgdl / tf.dl)
                      / (CAST(cf.cf AS DOUBLE) / stats.n_docs))
             + (CAST(cf.cf AS DOUBLE) / stats.n_docs
                - tf.tf * log2(1.0 + {PL2_C} * stats.avgdl / tf.dl)) * {LOG2_E}
             + 0.5 * log2({TWO_PI}
                          * (tf.tf * log2(1.0 + {PL2_C} * stats.avgdl / tf.dl))) )
           AS DECIMAL(20,8)) AS part
  FROM tf JOIN cf ON tf.term = cf.term, stats
)
SELECT doc_id,
       CAST(CAST(SUM(part) AS VARCHAR) AS DOUBLE) AS score
FROM contrib
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT {TOP_K}
"""


@query("q_pl2_topk", oracle=_PL2_ORACLE)
def q_pl2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PL2 divergence-from-randomness top-k retrieval for the fixed
    keyword query (Amati & van Rijsbergen 2002): Poisson randomness
    model, Laplace after-effect 1/(tfn+1), H2 normalization
    tfn = tf·log2(1 + avgdl/dl).

    Plan: one documents scan → tokenize → explode pruned to
    QUERY_TERMS before any shuffle → per-(doc, term) tf — then the
    |query|-row collection-frequency table and the 1-row stats both
    BROADCAST into a flat per-contribution projection, quantized to
    DECIMAL(20,8) and exact-summed per doc; top-{TOP_K} with doc_id
    tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("ws"),
    )
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        (F.sum(F.size("ws")).cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        toks.select(
            "doc_id", F.size("ws").alias("dl"), F.explode("ws").alias("term")
        )
        .filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.any_value("dl").alias("dl"))
    )
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    tfn = F.col("tf") * F.log2(
        F.lit(1.0) + F.lit(PL2_C) * F.col("avgdl") / F.col("dl")
    )
    lam = F.col("cf").cast("double") / F.col("n_docs")
    part = (
        (F.lit(1.0) / (tfn + F.lit(1.0)))
        * (
            tfn * F.log2(tfn / lam)
            + (lam - tfn) * F.lit(LOG2_E)
            + F.lit(0.5) * F.log2(F.lit(TWO_PI) * tfn)
        )
    ).cast("decimal(20,8)")
    return (
        tf.join(F.broadcast(cf), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", part.alias("part"))
        .groupBy("doc_id")
        .agg(F.sum("part").cast("double").alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(TOP_K)
    )
