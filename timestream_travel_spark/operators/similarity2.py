"""Similarity search, part 2: IVF-style ANN (coarse quantizer →
inverted lists → probe top cells) and positional array expansion.

IVF is the second scale path next to sign-LSH (similarity.py): at
100 TB the centroid assignment becomes the partition/cluster key of
the stored index, and a query touches only nprobe cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.functions.vectors import cosine, query_vector_lit, to_double_array
from timestream_travel_spark.operators.similarity import QUERY_VEC_ID, TOP_K, _query_vec
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

N_PROBE = 3


def label_centroids(embeddings: DataFrame) -> list[tuple[int, list[float]]]:
    """Coarse quantizer: per-label elementwise mean. A production IVF
    trains k-means; labels give a deterministic stand-in with the same
    plumbing (centroid table is tiny → driver-side parameters)."""
    cent = (
        embeddings.select("label", F.posexplode(to_double_array(F.col("embedding"))).alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("entries"))
        .select("label", F.transform("entries", lambda e: e.getField("m")).alias("centroid"))
        .collect()
    )
    return [(r["label"], list(r["centroid"])) for r in cent]


@query("q_ann_ivf_topk")
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: assign vectors to nearest centroid (inverted lists),
    probe the query's top-3 cells, exact cosine within them. Rows-only
    oracle (cell assignment is quantizer-specific); pytest bounds
    recall vs brute force."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = label_centroids(e)
    qvec = _query_vec(spark, sf_dir)

    def py_cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb)

    probe_cells = [
        lab for lab, _ in sorted(cents, key=lambda lc: -py_cos(qvec, lc[1]))[:N_PROBE]
    ]
    # cell assignment: argmax cosine over centroids. One sims array +
    # array_position — a when/otherwise max-chain would nest every
    # previous cosine into each comparison (exponential expression
    # tree; measured 38s → ~1s for 10 centroids).
    v = to_double_array(F.col("embedding"))
    sims = F.array(*[cosine(v, query_vector_lit(cvec)) for _, cvec in cents])
    labels_lit = F.array(*[F.lit(lab) for lab, _ in cents])
    idx = F.array_position(sims, F.array_max(sims)).cast("int")
    assigned = e.withColumn("cell", F.element_at(labels_lit, idx))
    cand = assigned.filter(F.col("cell").isin(probe_cells)).filter(F.col("vec_id") != QUERY_VEC_ID)
    sim = F.round(cosine(to_double_array(F.col("embedding")), query_vector_lit(qvec)), 4)
    return (
        cand.select("vec_id", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@query(
    "q_posexplode",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) AS INT) AS pos,
           round(CAST(unnest(embedding) AS DOUBLE), 6) AS val
    FROM embeddings WHERE vec_id < 20
    """,
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional array expansion (posexplode ≍ unnest WITH
    ORDINALITY) — the row-wise view of the array type (A19)."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.filter(F.col("vec_id") < 20)
        .select("vec_id", F.posexplode("embedding").alias("pos", "v"))
        .select(
            "vec_id",
            (F.col("pos") + 1).cast("int").alias("pos"),
            F.round(F.col("v").cast("double"), 6).alias("val"),
        )
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the non-hierarchical cousin of
    rollup/cube), via Spark SQL over the registered views."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


def _assign_cell(v, cents: list[list[float]]):
    """argmax-cosine cell id via sims array + array_position (never a
    when-chain — see module history)."""
    sims = F.array(*[cosine(v, query_vector_lit(c)) for c in cents])
    return F.array_position(sims, F.array_max(sims)).cast("int") - 1


def kmeanspp_init(embeddings: DataFrame, k: int) -> list[list[float]]:
    """Deterministic k-means++-style seeding (farthest-point /
    Gonzalez variant): start from the min-vec_id vector, then k−1
    times pick the vector farthest (1 − max cosine) from the chosen
    set — argmax instead of k-means++'s D²-weighted sample, so runs
    are reproducible without a random stream. Each pick is one
    TakeOrdered scan; k×dim floats total reach the driver.

    k-scaling: this is k−1 SEQUENTIAL full-scan driver round-trips —
    the right trade at IVF-cell counts like k≤64 (each scan is a
    cheap argmax, no shuffle), but at k in the thousands switch to an
    oversampling scheme (k-means‖: sample O(k) candidates per pass in
    ~log n passes, then cluster the candidate set driver-side) so the
    number of full scans is O(log n), not O(k)."""
    v = to_double_array(F.col("embedding"))
    first = (
        embeddings.orderBy("vec_id").limit(1).select(v.alias("e")).collect()[0]["e"]
    )
    cents = [list(first)]
    for _ in range(k - 1):
        sims = F.array(*[cosine(v, query_vector_lit(c)) for c in cents])
        far = (
            embeddings.select("vec_id", v.alias("e"), (1 - F.array_max(sims)).alias("d"))
            .orderBy(F.desc("d"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        cents.append(list(far["e"]))
    return cents


def kmeans_parallel_init(
    embeddings: DataFrame, k: int, oversample: int | None = None, passes: int = 2
) -> list[list[float]]:
    """Deterministic k-means‖-shape seeding (Bahmani et al.,
    VLDB'12, public): replaces kmeanspp_init's k−1 SEQUENTIAL
    full-scan driver round-trips with `passes` scans that each
    TakeOrdered the ℓ = oversample (default 2k) rows FARTHEST from
    the current candidate set — a deterministic stand-in for the
    paper's D²-proportional sample with the same
    oversample-then-reduce structure, reproducible without a random
    stream — then reduces the ≤ 1 + passes·ℓ candidates to k centers
    DRIVER-SIDE by greedy farthest-point over the candidate matrix
    (candidate-pool-sized work, no Spark jobs).

    Scan count is O(passes), independent of k: the seeding that
    still works when k reaches IVF-at-scale cell counts (k ≈ √n in
    the thousands), where kmeanspp_init's k−1 scans do not. Each
    pass's comparison set grows by ℓ, so keep passes small (2–3 —
    the paper's own guidance is O(log n) rounds but ~5 suffices)."""
    if oversample is None:
        oversample = 2 * k
    v = to_double_array(F.col("embedding"))
    first = embeddings.orderBy("vec_id").limit(1).select(v.alias("e")).collect()[0]["e"]
    cands: list[list[float]] = [list(first)]
    for _ in range(passes):
        sims = F.array(*[cosine(v, query_vector_lit(c)) for c in cands])
        far = (
            embeddings.select("vec_id", v.alias("e"), (1 - F.array_max(sims)).alias("d"))
            .orderBy(F.desc("d"), F.asc("vec_id"))
            .limit(oversample)
            .collect()
        )
        cands.extend(list(r["e"]) for r in far)

    def py_cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb) if na and nb else 0.0

    cents = [cands[0]]
    chosen = {0}
    while len(cents) < k and len(chosen) < len(cands):
        best_i, best_d = -1, -1.0
        for i, c in enumerate(cands):
            if i in chosen:
                continue
            d = min(1 - py_cos(c, ch) for ch in cents)
            if d > best_d:
                best_i, best_d = i, d
        chosen.add(best_i)
        cents.append(cands[best_i])
    return cents


def train_kmeans_centroids(
    embeddings: DataFrame, k: int = 8, iters: int = 3, init: str = "first"
) -> list[list[float]]:
    """Lloyd's k-means as a driver-side loop over DataFrame
    aggregations: assign (argmax cosine), recompute means
    (posexplode + avg), collect the k×dim centroid table. Only the
    tiny centroid table ever reaches the driver; assignment and the
    mean-update are full-cluster scans — the shape that holds at
    100 TB (iters × one scan each).

    init: 'first' = first k vectors by vec_id; 'farthest' =
    deterministic k-means++-style spread seeding (kmeanspp_init,
    k−1 scans); 'parallel' = k-means‖-shape oversampled seeding
    (kmeans_parallel_init, O(passes) scans — the large-k path)."""
    if init == "farthest":
        cents = kmeanspp_init(embeddings, k)
    elif init == "parallel":
        cents = kmeans_parallel_init(embeddings, k)
    else:
        rows = (
            embeddings.orderBy("vec_id").limit(k)
            .select(to_double_array(F.col("embedding")).alias("e"))
            .collect()
        )
        cents = [list(r["e"]) for r in rows]
    v = to_double_array(F.col("embedding"))
    for _ in range(iters):
        assigned = embeddings.withColumn("cell", _assign_cell(v, cents))
        new = (
            assigned.select("cell", F.posexplode(v).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("entries"))
            .select("cell", F.transform("entries", lambda e: e.getField("m")).alias("centroid"))
            .collect()
        )
        by_cell = {r["cell"]: list(r["centroid"]) for r in new}
        # empty cells keep their previous centroid
        cents = [by_cell.get(i, cents[i]) for i in range(k)]
    return cents


def _ivf_topk(spark: SparkSession, sf_dir: str, init: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    cents = train_kmeans_centroids(e, k=8, iters=3, init=init)
    qvec = _query_vec(spark, sf_dir)

    def py_cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / ((sum(x * x for x in a) ** 0.5) * (sum(x * x for x in b) ** 0.5))

    probe = sorted(range(len(cents)), key=lambda i: -py_cos(qvec, cents[i]))[:N_PROBE]
    v = to_double_array(F.col("embedding"))
    cand = (
        e.withColumn("cell", _assign_cell(v, cents))
        .filter(F.col("cell").isin(probe))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
    )
    sim = F.round(cosine(to_double_array(F.col("embedding")), query_vector_lit(qvec)), 4)
    return (
        cand.select("vec_id", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@query("q_ann_ivf_kmeanspp_topk")
def q_ann_ivf_kmeanspp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with deterministic k-means++-style (farthest-point)
    seeding before Lloyd — better-spread cells than first-k init.
    Rows-only oracle; pytest bounds recall vs brute force."""
    return _ivf_topk(spark, sf_dir, init="farthest")


@query("q_ann_ivf_kmeanspar_topk")
def q_ann_ivf_kmeanspar_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN seeded by the k-means‖-shape init (O(passes) full
    scans instead of k−1 — the seeding that scales to thousands of
    IVF cells) before Lloyd. Rows-only oracle; pytest bounds recall
    vs brute force and asserts the seed spread matches the
    sequential farthest-point init."""
    return _ivf_topk(spark, sf_dir, init="parallel")


@query("q_ann_ivf_kmeans_topk")
def q_ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a k-means-trained coarse quantizer (vs the
    label-mean stand-in of q_ann_ivf_topk): 8 Lloyd cells, probe the
    top-3 nearest to the query, exact cosine inside. Rows-only
    oracle; pytest bounds recall."""
    return _ivf_topk(spark, sf_dir, init="first")


@query(
    "q_label_centroids",
    oracle="""
    SELECT label, pos, round(AVG(v), 6) AS centroid_v FROM (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) AS INT) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ) t
    GROUP BY label, pos
    """,
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF coarse-quantizer training aggregate as a first-class
    query: per-label elementwise embedding mean (posexplode + avg —
    one shuffle keyed (label, pos); k×dim rows out regardless of
    corpus size). This is the distributed half of label_centroids();
    only the collect differs."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode(to_double_array(F.col("embedding"))).alias("pos0", "v"))
        .groupBy("label", (F.col("pos0") + 1).cast("int").alias("pos"))
        .agg(F.round(F.avg("v"), 6).alias("centroid_v"))
    )
