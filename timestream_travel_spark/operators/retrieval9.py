"""Round-14 STAGED retrieval: rank-biased overlap between the BM25
and query-likelihood rankers (Webber, Moffat & Zobel, TOIS 2010 —
"how much do two lexical rankers agree?", the standard
ranker-diagnostic; the embedding ranker was rejected for this pair
because the fixture's random embeddings are uncorrelated with the
text, making the overlap identically zero — fixture-degenerate) and
bpref (Buckley & Voorhees, SIGIR 2004 — the judged-pool-robust
cousin of MAP).

Exactness:
- RBO@{RBO_D} with persistence p = 9/10 is EXACT: with o_d the
  top-d overlap between the two rankings, the truncated statistic
  (1−p)·Σ_{{d≤D}} p^(d−1)·o_d/d rationalizes over the common
  denominator Q = 10^{RBO_D}·lcm(1..{RBO_D}) — each item in both
  heads contributes the INTEGER weight W(m) = Σ_{{d≥m}}
  9^(d−1)·10^({RBO_D}−d)·(lcm/d) at m = max(rank_a, rank_b), the
  weights are 10 precomputed literals (< 2⁵³ total), and the emitted
  double is ONE flat division by Q;
- bpref follows retrieval8's label spine: for each relevant hit at
  rank r with relevant-ordinal j, the non-relevant-above count is
  the exact integer r−j; with R' = least(n_rel, {TOP_K}) (the MAP@k
  normalizer), bpref = Σ(R' − least(r−j, R')) / (R'·R') — an exact
  integer numerator and ONE flat division.

Scale shape: both rankers reduce to bounded candidate heads before
any global ordering (the retrieval2/retrieval8 plans); every metric
then reduces ≤{TOP_K}-row tables.

Reference parity: none (cmd/backup.go has no retrieval surface) —
north-star derived capability, sibling of retrieval6/7/8.
"""

from __future__ import annotations

from math import lcm

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.retrieval import (
    _BM25_CTES,
    TOP_K,
    bm25_scores_cached,
)
from timestream_travel_spark.operators.retrieval3 import (
    _QL_CF_SQL,
    _QL_SCORE_SQL,
    _QL_TF_SQL,
    ql_scores_cached,
)
from timestream_travel_spark.operators.retrieval8 import _EVAL_CTES, _hits
from timestream_travel_spark.registry import query

RBO_D = 10  # evaluation depth
_LCM = lcm(*range(1, RBO_D + 1))  # 2520
RBO_Q = 10**RBO_D * _LCM  # the exact common denominator

# W(m) = Σ_{d=m..D} 9^(d−1) · 10^(D−d) · (lcm/d): the integer RBO
# weight of an item first present in both top-d heads at depth m.
RBO_W = {
    m: sum(9 ** (d - 1) * 10 ** (RBO_D - d) * (_LCM // d) for d in range(m, RBO_D + 1))
    for m in range(1, RBO_D + 1)
}

_W_CASE_SQL = (
    "CASE greatest(ra, rb) "
    + " ".join(f"WHEN {m} THEN {w}" for m, w in RBO_W.items())
    + " END"
)

# the QL scored table, q-prefixed so its CTE names don't collide
# with _BM25_CTES' (both tokenize `documents`)
_QLS_CTES = f"""qtoks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ws
      FROM documents
    ), qpd AS (
      SELECT doc_id, len(ws) AS dl,
             {_QL_TF_SQL}
      FROM qtoks
    ), qcoll AS (
      SELECT CAST(SUM(dl) AS BIGINT) AS ctot,
             {_QL_CF_SQL}
      FROM qpd
    ), qls AS (
      SELECT doc_id,
             round({_QL_SCORE_SQL},
                   8) AS ql_score
      FROM qpd, qcoll
    )"""


@query(
    "q_rbo_rankers",
    oracle=f"""{_BM25_CTES},
    {_QLS_CTES},
    kw AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS ra
      FROM scored ORDER BY score DESC, doc_id LIMIT {RBO_D}
    ), qr AS (
      SELECT doc_id, row_number() OVER (ORDER BY ql_score DESC, doc_id) AS rb
      FROM qls ORDER BY ql_score DESC, doc_id LIMIT {RBO_D}
    ), common AS (
      SELECT kw.ra, qr.rb FROM kw JOIN qr ON kw.doc_id = qr.doc_id
    )
    SELECT CAST({RBO_D} AS INT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_common,
           CAST(COALESCE(SUM({_W_CASE_SQL}), 0) AS BIGINT) AS rbo_num,
           round(COALESCE(SUM({_W_CASE_SQL}), 0)
                 / CAST({RBO_Q} AS DOUBLE), 6) AS rbo
    FROM common
    """,
)
def q_rbo_rankers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap at depth {RBO_D} (p=9/10) between the
    BM25 and Dirichlet query-likelihood rankings of the same fixed
    query — exact integer weights at max(rank_a, rank_b), one flat
    division (module docstring)."""
    kw = (
        bm25_scores_cached(spark, sf_dir)
        .orderBy(F.desc("score"), "doc_id")
        .limit(RBO_D)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("score"), "doc_id"))
            .alias("ra"),
        )
    )
    qr = (
        ql_scores_cached(spark, sf_dir)
        .orderBy(F.desc("ql_score"), "doc_id")
        .limit(RBO_D)
        .select(
            F.col("doc_id").alias("qdoc"),
            F.row_number()
            .over(Window.orderBy(F.desc("ql_score"), "doc_id"))
            .alias("rb"),
        )
    )
    common = kw.join(qr, kw.doc_id == qr.qdoc).select("ra", "rb")
    wcol = F.greatest("ra", "rb")
    weight = F.lit(None).cast("bigint")
    for m in range(RBO_D, 0, -1):
        weight = F.when(wcol == m, F.lit(RBO_W[m]).cast("bigint")).otherwise(weight)
    z = F.lit(0).cast("bigint")
    return common.agg(
        F.lit(RBO_D).cast("int").alias("depth"),
        F.count(F.lit(1)).cast("bigint").alias("n_common"),
        F.coalesce(F.sum(weight), z).cast("bigint").alias("rbo_num"),
        F.round(
            F.coalesce(F.sum(weight), z) / F.lit(float(RBO_Q)), 6
        ).alias("rbo"),
    )


@query(
    "q_retrieval_bpref",
    oracle=f"""{_EVAL_CTES},
    rr AS (SELECT least(n_rel, {TOP_K}) AS rp FROM nrel),
    num AS (
      SELECT CAST(COALESCE(SUM(rr.rp - least(h.rnk - h.j, rr.rp)), 0)
                  AS BIGINT) AS bnum,
             CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM hit h CROSS JOIN rr
    )
    SELECT CAST({TOP_K} AS INT) AS k, nrel.n_rel AS n_relevant,
           num.n_hits, num.bnum AS bpref_num,
           round(CAST(num.bnum AS DOUBLE) / (rr.rp * rr.rp), 6) AS bpref
    FROM nrel CROSS JOIN num CROSS JOIN rr
    """,
)
def q_retrieval_bpref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bpref over the BM25 top-{TOP_K} with the contamination labels:
    per relevant hit the exact non-relevant-above count r−j, clamped
    and normalized by R' = least(n_rel, {TOP_K}) — integer numerator,
    one flat division (module docstring)."""
    hit, nrel = _hits(spark, sf_dir)
    rr = nrel.select(
        "n_rel", F.least(F.col("n_rel"), F.lit(TOP_K)).alias("rp")
    )
    z = F.lit(0).cast("bigint")
    num = (
        hit.crossJoin(F.broadcast(rr))
        .select(
            (F.col("rp") - F.least(F.col("rnk") - F.col("j"), F.col("rp"))).alias(
                "contrib"
            )
        )
        .agg(
            F.coalesce(F.sum("contrib"), z).cast("bigint").alias("bnum"),
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        )
    )
    return (
        nrel.crossJoin(num)
        .crossJoin(rr.select("rp"))
        .select(
            F.lit(TOP_K).cast("int").alias("k"),
            F.col("n_rel").alias("n_relevant"),
            "n_hits",
            F.col("bnum").alias("bpref_num"),
            F.round(
                F.col("bnum").cast("double") / (F.col("rp") * F.col("rp")), 6
            ).alias("bpref"),
        )
    )
