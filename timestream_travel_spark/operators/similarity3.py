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
    plus its pairwise-sim matrix (TakeOrderedAndProject + a
    {MMR_POOL}²-row self-join — the 100 TB part); both are
    parameter-sized ({MMR_POOL} + {MMR_POOL}² rows, the k-means
    centroid-collect rule), so they collect ONCE and the greedy
    argmax loop runs in pure Python on the driver. The r5 form
    instead ran the loop as {MMR_K} rounds of driver-coordinated
    joins over the cached pool — same answer, but each round's pick
    re-planned the whole growing union (7.3 s of pure job-scheduling
    overhead at sf0.1 for 50 cached rows; now ~1 s). Relevance and
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
    pw_rows = (
        pool.alias("a")
        .join(pool.alias("b"), F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            F.round(cosine(va, vb), 4).alias("s"),
        )
        .collect()
    )
    pool_rows = pool.select("vec_id", "rel").collect()
    pool.unpersist()
    rel = {r["vec_id"]: float(r["rel"]) for r in pool_rows}
    sim: dict[tuple[int, int], float] = {
        (r["ia"], r["ib"]): float(r["s"]) for r in pw_rows
    }
    # greedy MMR, identical tie-breaks to the SQL oracle:
    # rank 1 = max rel (vec_id asc); rank r = max λ·rel − (1−λ)·max
    # sim-to-selected (vec_id asc)
    picks: list[tuple[int, int, float]] = []
    chosen: set[int] = set()
    if rel:
        first = min(rel, key=lambda v: (-rel[v], v))
        picks.append((1, first, rel[first]))
        chosen.add(first)
    lam, mu = MMR_LAMBDA, round(1 - MMR_LAMBDA, 1)
    for r in range(2, MMR_K + 1):
        best = None
        for v in rel:
            if v in chosen:
                continue
            ms = max(sim[(v, c)] for c in chosen)
            mmr = lam * rel[v] - mu * ms
            key = (-mmr, v)
            if best is None or key < best[0]:
                best = (key, v, mmr)
        if best is None:  # pool smaller than K — emit fewer rows,
            break  # like the r5 Spark-loop form did
        picks.append((r, best[1], best[2]))
        chosen.add(best[1])
    # final rounding stays ENGINE-side (F.round is HALF_UP like the
    # DuckDB oracle; Python round() is banker's — a silent hash
    # hazard at exact .00005 boundaries)
    return spark.createDataFrame(
        picks, "rank int, vec_id bigint, mmr double"
    ).select("rank", "vec_id", F.round("mmr", 4).alias("mmr"))
