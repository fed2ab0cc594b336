"""Cluster/index-quality audits, part 2 (round 9): per-cell recall
audit of the IVFADC index — the quality probe the persisted-index
lifecycle was missing (r8 verdict). An IVF index's recall is not one
number: it is per-CELL, because residual-PQ distortion varies with a
cell's radius and population (Jégou et al. TPAMI'11 §5 report
per-list recall curves for exactly this reason). A cell whose ADC
ranking diverges from exact L2 is the cell whose nprobe visits are
wasted — the audit names those cells so retraining / re-clustering
is targeted, the same detect→name→repair contract as
streaming/late_audit + repair_rollup.

Method: for every coarse cell, rank that cell's members by (a) the
ADC approximation (the query's residual against the cell centroid,
scored on the cell's PQ codes — exactly what q_ivfpq_topk computes
for probed cells) and (b) exact L2 to the query; recall@k is the
overlap of the two top-k sets, k capped at the cell population.

Scale shape: ONE Arrow pass emits (vec_id, cell, adc, l2sq) — the
per-cell ADC tables are bounded driver state (cells × M × K) — then
two window ranks partitioned BY CELL (each cell's rank is a bounded
independent task; no global sort) and one per-cell aggregate. At
100 TB this is a full-scan audit job, the verify_manifest cost
class, run per retrain cycle, and reads the persisted (cell, codes)
table instead of re-encoding when given an index path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.functions.vectors import to_double_array
from timestream_travel_spark.operators.similarity import QUERY_VEC_ID, TOP_K, _query_vec
from timestream_travel_spark.operators.similarity6 import (
    PQ_M,
    _codes_for,
    _embedding_matrix,
    _np_books,
)
from timestream_travel_spark.operators.similarity7 import (
    _assign_cells,
    _cents_matrix,
    _ivfpq_state,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query("q_ivfpq_cell_recall")
def q_ivfpq_cell_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell recall@k of the IVFADC approximation against exact
    L2, for EVERY coarse cell (not just the query's nprobe cells —
    the audit must cover the lists a different query would probe).
    Output: (cell, n_vectors, k, recall) ascending by cell; k =
    min({TOP_K}, cell population). Rows-only oracle (learned
    centroids + codebooks); pytest bounds: recall ∈ [0,1] per cell,
    population-weighted mean recall ≥ 0.5, and every cell audited."""
    import numpy as np

    cents, books = _ivfpq_state(spark, sf_dir)
    C = _cents_matrix(cents)
    b = _np_books(books)
    qvec = np.asarray(_query_vec(spark, sf_dir), dtype=np.float64)
    # one ADC table per cell — bounded driver state (cells × M × K)
    tables = np.stack(
        [(((qvec - C[c]).reshape(PQ_M, 1, -1) - b) ** 2).sum(axis=-1)
         for c in range(C.shape[0])]
    )
    Cl, Tl, ql = C.tolist(), tables.tolist(), qvec.tolist()

    def score(batches):
        import pyarrow as pa

        Cn = np.asarray(Cl, dtype=np.float64)
        Tn = np.asarray(Tl, dtype=np.float64)
        qn = np.asarray(ql, dtype=np.float64)
        for batch in batches:
            ids = batch.column("vec_id").to_numpy()
            x = _embedding_matrix(batch)
            if x.size == 0:
                continue
            cells = _assign_cells(x, Cn)
            codes = _codes_for(x - Cn[cells], b)
            adc = Tn[cells][np.arange(len(ids))[:, None],
                            np.arange(PQ_M)[None, :], codes].sum(axis=1)
            l2 = ((x - qn[None, :]) ** 2).sum(axis=1)
            yield pa.record_batch(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "cell": pa.array(cells.astype("int32")),
                    "adc": pa.array(adc),
                    "l2sq": pa.array(l2),
                }
            )

    emb = load_table(spark, sf_dir, "embeddings")
    v = to_double_array(F.col("embedding"))
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", v.alias("embedding"))
        .mapInArrow(score, "vec_id bigint, cell int, adc double, l2sq double")
    )
    w_adc = Window.partitionBy("cell").orderBy(F.asc("adc"), F.asc("vec_id"))
    w_l2 = Window.partitionBy("cell").orderBy(F.asc("l2sq"), F.asc("vec_id"))
    w_cell = Window.partitionBy("cell")
    ranked = scored.select(
        "cell",
        F.row_number().over(w_adc).alias("r_adc"),
        F.row_number().over(w_l2).alias("r_l2"),
        F.least(F.lit(TOP_K), F.count(F.lit(1)).over(w_cell)).alias("k"),
        F.count(F.lit(1)).over(w_cell).alias("n_in_cell"),
    )
    return (
        ranked.groupBy("cell")
        .agg(
            F.max("n_in_cell").alias("n_vectors"),
            F.max("k").alias("k"),
            F.count_if(
                (F.col("r_adc") <= F.col("k")) & (F.col("r_l2") <= F.col("k"))
            ).alias("hits"),
        )
        .select(
            "cell",
            "n_vectors",
            "k",
            F.round(F.col("hits") / F.col("k"), 4).alias("recall"),
        )
        .orderBy("cell")
    )


def ivfpq_cell_recall_from_index(
    spark: SparkSession, sf_dir: str, path: str
) -> DataFrame:
    """The same per-cell recall audit computed FROM the persisted
    IVFADC index (similarity7.build_ivfpq_index): stored (vec_id,
    cell, codes) rows are scored with per-cell ADC tables dispatched
    by a bounded CASE over ALL cells (the audit covers every list,
    unlike the query path's nprobe pruning), exact L2 comes from one
    join back to the embeddings table, and the window-rank recall is
    identical to q_ivfpq_cell_recall — pytest pins the two outputs
    row-equal. This is the retrain-cycle entry point: the encode pass
    never re-runs; the audit reads codes as written."""
    import numpy as np

    from timestream_travel_spark.operators.similarity6 import PQ_K
    from timestream_travel_spark.functions.vectors import to_double_array

    coarse = sorted(
        spark.read.parquet(f"{path}/coarse").collect(), key=lambda r: r["cell"]
    )
    C = np.asarray([list(r["cent"]) for r in coarse], dtype=np.float64)
    cb = spark.read.parquet(f"{path}/codebook").collect()
    books = [[None] * PQ_K for _ in range(PQ_M)]
    for r in cb:
        books[r["m"]][r["k"]] = list(r["cent"])
    b = _np_books(books)
    qvec = np.asarray(_query_vec(spark, sf_dir), dtype=np.float64)
    adc = None
    for c in range(C.shape[0]):
        qr = (qvec - C[c]).reshape(PQ_M, 1, -1)
        t = ((qr - b) ** 2).sum(axis=-1)  # (M, K) bounded literal
        t_lit = F.array(
            *[F.array(*[F.lit(float(x)) for x in row]) for row in t.tolist()]
        )
        terms = [
            F.element_at(
                F.element_at(t_lit, m + 1), F.element_at("codes", m + 1) + 1
            )
            for m in range(PQ_M)
        ]
        s = terms[0]
        for x in terms[1:]:
            s = s + x
        adc = F.when(F.col("cell") == c, s) if adc is None else adc.when(
            F.col("cell") == c, s
        )
    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("vec_id") != QUERY_VEC_ID
    )
    emb = load_table(spark, sf_dir, "embeddings")
    v = to_double_array(F.col("embedding"))
    ql = [float(x) for x in qvec.tolist()]
    qlit = F.array(*[F.lit(x) for x in ql])
    l2 = F.aggregate(
        F.zip_with(v, qlit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    scored = codes.select("vec_id", "cell", adc.alias("adc")).join(
        emb.select("vec_id", l2.alias("l2sq")), "vec_id"
    )
    w_adc = Window.partitionBy("cell").orderBy(F.asc("adc"), F.asc("vec_id"))
    w_l2 = Window.partitionBy("cell").orderBy(F.asc("l2sq"), F.asc("vec_id"))
    w_cell = Window.partitionBy("cell")
    ranked = scored.select(
        "cell",
        F.row_number().over(w_adc).alias("r_adc"),
        F.row_number().over(w_l2).alias("r_l2"),
        F.least(F.lit(TOP_K), F.count(F.lit(1)).over(w_cell)).alias("k"),
        F.count(F.lit(1)).over(w_cell).alias("n_in_cell"),
    )
    return (
        ranked.groupBy("cell")
        .agg(
            F.max("n_in_cell").alias("n_vectors"),
            F.max("k").alias("k"),
            F.count_if(
                (F.col("r_adc") <= F.col("k")) & (F.col("r_l2") <= F.col("k"))
            ).alias("hits"),
        )
        .select(
            "cell",
            "n_vectors",
            "k",
            F.round(F.col("hits") / F.col("k"), 4).alias("recall"),
        )
        .orderBy("cell")
    )
