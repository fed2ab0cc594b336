"""Round-15 STAGED retrieval: the 11-point interpolated
precision–recall curve of the BM25 ranking (van Rijsbergen 1979; the
TREC-standard curve whose area cousin MAP is already green) — the
per-level view of ranking quality the single-number metrics average
away.

Relevance spine: a document is relevant iff EVERY query term occurs
at least {REL_TF} times in it — the strict high-grade subset of the
soft BM25 signal. (The retrieval8 shingle-leakage labels were
REJECTED for this query as fixture-degenerate: the BM25 top-{TOP_K}
contains ≤1 leaked doc at every SF, flattening the curve to zero;
the tf-threshold labels interleave with the ranking at all three
SFs — gaps at ranks 5/6/10/15… — so the curve actually bends.)

Exactness: R′ = min(n_rel, {TOP_K}) (the MAP@k convention). For each
recall level ℓ = k/10, qualifying hits satisfy j·10 ≥ k·R′ (exact
integer cross-multiplication); the interpolated precision is the
maximum j/rnk among them — the argmax is taken on round(j/rnk, 6)
with (rnk, j) tiebreaks (every j/rnk with rnk ≤ {TOP_K} either
terminates within 6 decimals or is boundary-free, so the quantized
order is the exact order), and the emitted value is that ONE flat
division. Levels with no qualifying hit emit 0.0.

Scale shape: the ranking reduces to the bounded {TOP_K}-row head
before any global ordering (retrieval2's postings-pruned plan); the
relevance census is one map-side-combined (doc, term) reduce
filtered to the query terms; the curve is an 11×|hits| bounded join.

Reference parity: none — north-star derived capability, sibling of
retrieval8/9/10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.retrieval import (
    _BM25_CTES,
    _TERMS_SQL,
    QUERY_TERMS,
    TOP_K,
    bm25_scores_cached,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

REL_TF = 3  # every query term must occur at least this often

_LEVELS_SQL = "SELECT unnest(range(0, 11)) AS k"


@query(
    "q_pr_curve_bm25",
    oracle=f"""{_BM25_CTES},
    ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
      FROM scored ORDER BY score DESC, doc_id LIMIT {TOP_K}
    ), rel AS (
      SELECT doc_id FROM (
        SELECT doc_id, w, COUNT(*) AS f FROM (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(lower(text),
                                                       '[^a-z0-9]+'),
                                    x -> x <> '')) AS w
          FROM documents
        ) WHERE w IN ({_TERMS_SQL}) GROUP BY doc_id, w
      ) WHERE f >= {REL_TF}
      GROUP BY doc_id HAVING COUNT(*) = {len(QUERY_TERMS)}
    ), nrel AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rel FROM rel),
    hit AS (
      SELECT r.rnk, row_number() OVER (ORDER BY r.rnk) AS j
      FROM ranked r JOIN rel v ON v.doc_id = r.doc_id
    ),
    rp AS (SELECT least(n_rel, {TOP_K}) AS rp FROM nrel),
    lv AS ({_LEVELS_SQL}),
    qual AS (
      SELECT lv.k, h.j, h.rnk,
             round(CAST(h.j AS DOUBLE) / h.rnk, 6) AS p6
      FROM lv JOIN hit h ON h.j * 10 >= lv.k * (SELECT rp FROM rp)
    ), best AS (
      SELECT k, j, rnk, p6,
             row_number() OVER (PARTITION BY k
                                ORDER BY p6 DESC, rnk, j) AS rn
      FROM qual
    )
    SELECT lv.k AS level_tenths,
           lv.k / 10.0 AS recall_level,
           CAST(COALESCE(b.j, 0) AS BIGINT) AS best_j,
           CAST(COALESCE(b.rnk, 0) AS BIGINT) AS best_rnk,
           COALESCE(b.p6, 0.0) AS p_interp
    FROM lv LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.k = lv.k
    """,
)
def q_pr_curve_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """11-point interpolated precision–recall curve of the BM25
    ranking against the strict tf≥{REL_TF} relevance labels:
    P_interp(k/10) = max{{ j/rnk : j/R′ ≥ k/10 }} with exact integer
    qualification and a quantized-score argmax (module docstring);
    empty levels emit 0.0."""
    ranked = (
        bm25_scores_cached(spark, sf_dir)
        .orderBy(F.desc("score"), "doc_id")
        .limit(TOP_K)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("score"), "doc_id"))
            .alias("rnk"),
        )
    )
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim("text")), "[^a-z0-9]+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .filter(F.col("w").isin(*QUERY_TERMS))
    )
    rel = (
        words.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("f"))
        .filter(F.col("f") >= REL_TF)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nt"))
        .filter(F.col("nt") == len(QUERY_TERMS))
        .select("doc_id")
    )
    nrel = rel.agg(F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    hit = (
        ranked.join(F.broadcast(rel), "doc_id")
        .withColumn("j", F.row_number().over(Window.orderBy("rnk")))
        .select("rnk", "j")
    )
    rp = nrel.select(
        F.least(F.col("n_rel"), F.lit(TOP_K)).cast("bigint").alias("rp")
    )
    lv = spark.range(0, 11).select(F.col("id").cast("bigint").alias("k"))
    qual = (
        lv.crossJoin(F.broadcast(rp))
        .join(hit, F.col("j") * 10 >= F.col("k") * F.col("rp"))
        .select(
            "k",
            "j",
            "rnk",
            F.round(F.col("j").cast("double") / F.col("rnk"), 6).alias("p6"),
        )
    )
    best = qual.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("k").orderBy(F.desc("p6"), "rnk", "j")
        ),
    ).filter(F.col("rn") == 1)
    return (
        lv.join(best.select("k", "j", "rnk", "p6"), "k", "left")
        .select(
            F.col("k").alias("level_tenths"),
            (F.col("k") / F.lit(10.0)).alias("recall_level"),
            F.coalesce(F.col("j"), F.lit(0)).cast("bigint").alias("best_j"),
            F.coalesce(F.col("rnk"), F.lit(0)).cast("bigint").alias("best_rnk"),
            F.coalesce(F.col("p6"), F.lit(0.0)).alias("p_interp"),
        )
    )
