"""Similarity search over embeddings (SURVEY.md §2 B.11 / north star):
brute-force cosine top-k as the correctness baseline, an LSH-bucketed
variant as the 100 TB scale path, and pairwise label-blocked cosine.

Vector math is functions.vectors — zip_with/aggregate expression
trees, evaluated inside whole-stage codegen; no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.functions.vectors import cosine, dot, query_vector_lit, to_double_array
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

QUERY_VEC_ID = 0
TOP_K = 10


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    """Fetch the query vector (a parameter, not data: one row)."""
    e = load_table(spark, sf_dir, "embeddings")
    row = e.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").head()
    return [float(x) for x in row[0]]


def cosine_topk(embeddings: DataFrame, qvec: list[float], k: int) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector: one
    scan, TakeOrderedAndProject — the exact baseline every ANN
    variant is measured against."""
    q = query_vector_lit(qvec)
    v = to_double_array(F.col("embedding"))
    sim = F.round(cosine(v, q), 4)
    return (
        embeddings.select("vec_id", sim.alias("cos_sim"))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


@query(
    "q_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
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
    )
    SELECT vec_id, cos_sim FROM sims
    ORDER BY cos_sim DESC, vec_id
    LIMIT {TOP_K}
    """,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 nearest embeddings to vec_id=0 by cosine similarity
    (rounded before ordering so the cross-engine tie order is
    deterministic)."""
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(e, _query_vec(spark, sf_dir), TOP_K)


@query(
    "q_cosine_topk_per_label",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    sims AS (
      SELECT v.vec_id, v.label,
             round(
               list_sum(list_transform(generate_series(1, len(v.embedding)),
                 i -> CAST(v.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
             4) AS cos_sim
      FROM embeddings v, q
      WHERE v.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, label, cos_sim FROM (
      SELECT vec_id, label, cos_sim,
             row_number() OVER (PARTITION BY label ORDER BY cos_sim DESC, vec_id) AS rn
      FROM sims
    ) t WHERE rn <= 3
    """,
)
def q_cosine_topk_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per label — grouped ANN retrieval: one scan, window
    top-k inside each label partition."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = query_vector_lit(_query_vec(spark, sf_dir))
    sim = F.round(cosine(to_double_array(F.col("embedding")), qv), 4)
    w = Window.partitionBy("label").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", sim.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("vec_id", "label", "cos_sim")
    )


# ------------------------------------------------- LSH-bucketed ANN (scale path)

N_PLANES = 6  # 64 buckets; multiprobe (bucket + 6 one-bit flips) ⇒ ~11% of corpus scanned


def random_planes(dim: int, n_planes: int = N_PLANES, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure python LCG so the
    result is engine- and platform-independent)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        plane = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            plane.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(plane)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: bit b = sign(vec · plane_b).
    Literal plane vectors → JVM expression, broadcast-free."""
    bucket = F.lit(0).cast("bigint")
    for b, plane in enumerate(planes):
        d = dot(vec, query_vector_lit(plane))
        bucket = bucket + F.when(d > 0, F.lit(1 << b).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return bucket


@query("q_ann_lsh_topk")
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's
    random-projection bucket and its 1-bit-flip neighbors (multiprobe),
    then exact cosine on candidates only. At 100 TB the bucket column
    is a partition/cluster key and the probe prunes ~(1 - 13/2^12) of
    the corpus before any vector math. Rows-only oracle; pytest
    checks recall vs brute force."""
    e = load_table(spark, sf_dir, "embeddings")
    qvec = _query_vec(spark, sf_dir)
    planes = random_planes(len(qvec))
    # driver-side bucket of the query vector (plain python dot)
    qbits = 0
    for b, plane in enumerate(planes):
        if sum(x * y for x, y in zip(qvec, plane)) > 0:
            qbits |= 1 << b
    probes = [qbits] + [qbits ^ (1 << b) for b in range(len(planes))]
    v = to_double_array(F.col("embedding"))
    bucketed = e.withColumn("bucket", lsh_bucket(v, planes))
    cand = bucketed.filter(F.col("bucket").isin(probes)).filter(F.col("vec_id") != QUERY_VEC_ID)
    sim = F.round(cosine(to_double_array(F.col("embedding")), query_vector_lit(qvec)), 4)
    return (
        cand.select("vec_id", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )
