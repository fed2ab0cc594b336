"""Similarity search, part 3: diversity-aware retrieval — maximal
marginal relevance (MMR, Carbonell & Goldstein SIGIR'98) re-ranking
of a cosine candidate pool.

Plain top-k returns near-duplicates of each other; MMR greedily
trades relevance against similarity to what's already picked:
    pick argmax  λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s).
The RAG retrieval staple — and on a training-data pipeline, the
"diverse exemplars" selector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.functions.vectors import cosine, to_double_array
from timestream_travel_spark.operators.similarity import (
    QUERY_VEC_ID,
    _query_vec,
    cosine_topk,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

MMR_LAMBDA = 0.7
MMR_K = 5
MMR_POOL = 50

_COS = (
    "round(list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) "
    "/ (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) "
    "* sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)"
)


def _mmr_sql() -> str:
    """Chained-CTE greedy MMR: the pool and its pairwise-sim table
    once, then MMR_K argmax steps (the PageRank-oracle technique —
    a driver-coordinated loop on the Spark side is a static CTE chain
    on the oracle side). Relevance and pairwise sims round to 4
    decimals BEFORE any scoring, so the greedy argmax compares
    identical doubles on both engines."""
    cos_vq = _COS.format(a="v.embedding", b="q.qe")
    cos_ab = _COS.format(a="a.embedding", b="b.embedding")
    sql = f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    pool AS (
      SELECT v.vec_id, v.embedding, {cos_vq} AS rel
      FROM embeddings v, q WHERE v.vec_id <> {QUERY_VEC_ID}
      ORDER BY rel DESC, vec_id LIMIT {MMR_POOL}
    ),
    pw AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib, {cos_ab} AS s
      FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
    ),
    s1 AS (SELECT vec_id, 1 AS rank, CAST(rel AS DOUBLE) AS mmr
           FROM pool ORDER BY rel DESC, vec_id LIMIT 1),
    sel1 AS (SELECT vec_id FROM s1)"""
    prev_sel = "sel1"
    picks = ["s1"]
    for r in range(2, MMR_K + 1):
        sql += f""",
    c{r} AS (
      SELECT p.vec_id, {MMR_LAMBDA} * p.rel - {1 - MMR_LAMBDA:.1f} * max(pw.s) AS mmr
      FROM pool p
      JOIN pw ON pw.ia = p.vec_id AND pw.ib IN (SELECT vec_id FROM {prev_sel})
      WHERE p.vec_id NOT IN (SELECT vec_id FROM {prev_sel})
      GROUP BY p.vec_id, p.rel
    ),
    s{r} AS (SELECT vec_id, {r} AS rank, mmr FROM c{r}
             ORDER BY mmr DESC, vec_id LIMIT 1),
    sel{r} AS (SELECT vec_id FROM {prev_sel} UNION ALL SELECT vec_id FROM s{r})"""
        prev_sel = f"sel{r}"
        picks.append(f"s{r}")
    union = " UNION ALL ".join(f"SELECT * FROM {p}" for p in picks)
    return sql + f"""
    SELECT rank, vec_id, round(mmr, 4) AS mmr FROM ({union}) ORDER BY rank
    """


@query("q_mmr_diverse_topk", oracle=_mmr_sql())
def q_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-{MMR_K} (λ={MMR_LAMBDA}) from the
    {MMR_POOL}-candidate cosine pool of vec_id={QUERY_VEC_ID}.

    Scale split, same as every iterative op here: the DISTRIBUTED
    stage is the corpus-wide cosine scan producing the bounded pool
    (TakeOrderedAndProject — the 100 TB part); the greedy loop then
    runs {MMR_K} driver-coordinated rounds of joins over ≤{MMR_POOL}
    rows. Nothing but loop control leaves the cluster; relevance and
    pairwise sims are rounded to 4 decimals before scoring so the
    argmax ordering is engine-deterministic."""
    e = load_table(spark, sf_dir, "embeddings")
    qvec = _query_vec(spark, sf_dir)
    pool = (
        cosine_topk(e, qvec, MMR_POOL)
        .withColumnRenamed("cos_sim", "rel")
        .join(e.select("vec_id", "embedding"), "vec_id")
        .persist()
    )
    va, vb = to_double_array(F.col("a.embedding")), to_double_array(F.col("b.embedding"))
    pw = (
        pool.alias("a")
        .join(pool.alias("b"), F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            F.round(cosine(va, vb), 4).alias("s"),
        )
        .persist()
    )
    selected = (
        pool.orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(1)
        .select("vec_id", F.lit(1).alias("rank"), F.col("rel").cast("double").alias("mmr"))
    )
    for r in range(2, MMR_K + 1):
        sel_ids = selected.select("vec_id")
        ms = (
            pw.join(sel_ids, pw.ib == sel_ids.vec_id)
            .groupBy("ia")
            .agg(F.max("s").alias("ms"))
        )
        scored = (
            pool.join(sel_ids, "vec_id", "left_anti")
            .join(ms, pool.vec_id == ms.ia)
            .select(
                "vec_id",
                (
                    F.lit(MMR_LAMBDA) * F.col("rel")
                    - F.lit(round(1 - MMR_LAMBDA, 1)) * F.col("ms")
                ).alias("mmr"),
            )
        )
        pick = (
            scored.orderBy(F.desc("mmr"), F.asc("vec_id"))
            .limit(1)
            .select("vec_id", F.lit(r).alias("rank"), "mmr")
        )
        selected = selected.unionByName(pick)
    # materialize the K-row selection (parameter-sized, the k-means
    # centroid-collect rule) so pool/pw can be unpersisted without
    # handing the caller a plan that rescans the corpus per round
    rows = (
        selected.select("rank", "vec_id", F.round("mmr", 4).alias("mmr"))
        .orderBy("rank")
        .collect()
    )
    pool.unpersist()
    pw.unpersist()
    return spark.createDataFrame(rows, "rank int, vec_id bigint, mmr double")
