"""Similarity operators, part 6 (round-5 wave 7): product
quantization ANN (Jégou et al., TPAMI'11, public).

PQ is the third memory-bounded ANN path beside int8 affine codes
(q_ann_quantized_topk) and IVF cells (q_ann_ivf_*): split the
embedding into M subvectors, learn a K-centroid codebook per
subspace, store each vector as M one-byte codes, and score queries
against an M×K asymmetric-distance lookup table (ADC) — at 100 TB
the index is M bytes/vector instead of 4·dim, and scoring is M
table lookups instead of a dim-length dot product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.functions.vectors import to_double_array
from timestream_travel_spark.operators.similarity import QUERY_VEC_ID, TOP_K, _query_vec
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

PQ_M = 8  # subspaces
PQ_D = 8  # dims per subspace (M * D = 64 = embedding dim)
PQ_K = 16  # centroids per subspace (4-bit codes)
PQ_ITERS = 3
PQ_SHORTLIST = 64  # ADC candidates kept for the exact re-rank


def _l2sq(a, b):
    """Squared L2 between an array column and a literal list —
    sequential in-row fold (deterministic accumulation)."""
    lit = F.array(*[F.lit(float(x)) for x in b])
    return F.aggregate(
        F.zip_with(a, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _subvectors(emb: DataFrame) -> DataFrame:
    """(vec_id, m, sv): explode each embedding into its M subvectors
    — one in-row slice, no shuffle."""
    v = to_double_array(F.col("embedding"))
    parts = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"), F.slice(v, m * PQ_D + 1, PQ_D).alias("sv")
            )
            for m in range(PQ_M)
        ]
    )
    return (
        emb.select("vec_id", F.explode(parts).alias("e"))
        .select("vec_id", F.col("e.m").alias("m"), F.col("e.sv").alias("sv"))
    )


def train_pq_codebooks(emb: DataFrame) -> list[list[list[float]]]:
    """Lloyd's k-means per subspace, all M subspaces trained in ONE
    DataFrame job per iteration (the subvector table carries the
    subspace id as a grouping key). Init: subvectors of the first
    PQ_K vectors by vec_id (deterministic). Only the M×K×D codebook
    (bounded: 8×16×8 doubles) ever reaches the driver — assignment
    and the mean-update are full scans, the shape that holds at
    100 TB (ITERS × one scan)."""
    subs = _subvectors(emb)
    init_rows = (
        _subvectors(emb.orderBy("vec_id").limit(PQ_K))
        .collect()
    )
    by_m: dict[int, list[list[float]]] = {m: [] for m in range(PQ_M)}
    for r in sorted(init_rows, key=lambda r: (r["m"], r["vec_id"])):
        if len(by_m[r["m"]]) < PQ_K:
            by_m[r["m"]].append(list(r["sv"]))
    books = [by_m[m] for m in range(PQ_M)]
    for _ in range(PQ_ITERS):
        assigned = subs.withColumn("code", _assign_code(books))
        new = (
            assigned.select("m", "code", F.posexplode("sv").alias("pos", "x"))
            .groupBy("m", "code", "pos")
            .agg(F.avg("x").alias("c"))
            .groupBy("m", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("e"))
            .select(
                "m", "code", F.transform("e", lambda s: s.getField("c")).alias("cent")
            )
            .collect()
        )
        got = {(r["m"], r["code"]): list(r["cent"]) for r in new}
        # empty cells keep their previous centroid
        books = [
            [got.get((m, k), books[m][k]) for k in range(PQ_K)] for m in range(PQ_M)
        ]
    return books


def _assign_code(books: list[list[list[float]]]):
    """Nearest-centroid code within the row's subspace: distance
    array per subspace selected by m, argmin via array_position
    (first match → deterministic tie-break toward the lower code)."""
    dists_by_m = F.array(
        *[
            F.array(*[_l2sq(F.col("sv"), c) for c in books[m]])
            for m in range(PQ_M)
        ]
    )
    d = F.element_at(dists_by_m, (F.col("m") + 1).cast("int"))
    return (F.array_position(d, F.array_min(d)) - 1).cast("int")


@query("q_pq_ann_topk")
def q_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} ANN via product quantization with asymmetric
    distance and exact re-rank (ADC-R): encode the corpus as
    M={PQ_M} 4-bit codes, score every vector as Σ_m table[m][code_m]
    against the query's driver-side M×K distance table (bounded — a
    query parameter, broadcast as literals), keep the
    {PQ_SHORTLIST}-candidate shortlist, then re-rank the shortlist
    with EXACT L2 on the raw embeddings. Ascending exact distance,
    vec_id tie-break. Rows-only oracle (depends on learned
    codebooks); pytest pins recall against the exact L2 top-k.

    Scale shape: training and encoding are full scans with bounded
    driver state (the codebook); ADC scoring is an in-row M-element
    lookup-sum — no join, no shuffle except the shortlist TakeOrdered
    — and only the bounded shortlist ever touches raw floats again
    (a broadcast semi-join back to the embedding table). At 100 TB
    the encoded table is the persistent artifact: {PQ_M} 4-bit codes
    per vector vs 256 bytes of floats, with shortlist size as the
    recall/IO knob."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(emb)
    qvec = _query_vec(spark, sf_dir)
    # driver-side ADC table: dist(q_m, centroid[m][k])
    table = [
        [
            sum((qvec[m * PQ_D + i] - books[m][k][i]) ** 2 for i in range(PQ_D))
            for k in range(PQ_K)
        ]
        for m in range(PQ_M)
    ]
    table_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in table]
    )
    codes = (
        _subvectors(emb)
        .withColumn("code", _assign_code(books))
        .groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("m", "code"))).alias("mc"))
    )
    adc = F.aggregate(
        "mc",
        F.lit(0.0),
        lambda acc, e: acc
        + F.element_at(
            F.element_at(table_lit, (e["m"] + 1).cast("int")),
            (e["code"] + 1).cast("int"),
        ),
    )
    shortlist = (
        codes.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", adc.alias("adc"))
        .orderBy(F.asc("adc"), F.asc("vec_id"))
        .limit(PQ_SHORTLIST)
        .select("vec_id")
    )
    exact = _l2sq(to_double_array(F.col("embedding")), qvec)
    return (
        emb.join(F.broadcast(shortlist), "vec_id")
        .select("vec_id", F.round(exact, 6).alias("l2sq"))
        .orderBy(F.asc("l2sq"), F.asc("vec_id"))
        .limit(TOP_K)
    )
