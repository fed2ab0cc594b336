"""Similarity / embedding analytics, part 5 (round 5, wave 5):
principal-component extraction over the embedding table.

The top principal component of an embedding corpus is the
workhorse diagnostic for anisotropy ('rogue dimensions') and the
first step of all-but-the-top post-processing (Mu & Viswanath,
ICLR 2018, public) — a training-data pipeline wants it to audit and
whiten embedding spaces at corpus scale.

Rows-only by design: the distributed covariance accumulation sums
float64 partial Gram matrices whose within-partition order Spark
does not fix, so the eigenvector is reproducible only to float
tolerance — correctness is pinned by a numpy parity test
(tests/test_round5_wave5.py) instead of a bit-exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

PCA_DIM = 64


def covariance_matrix(emb: DataFrame, dim: int = PCA_DIM):
    """(mean, cov, n) of an `embedding array<float>` column as numpy
    arrays, accumulated DISTRIBUTED: mapInArrow emits one partial
    (n, Σx, ΣxᵀX) row per partition batch (dim+1 × dim numbers), the
    driver reduces the ≤ #partitions partials — the embedding table
    itself never reaches the driver."""
    import numpy as np

    def partials(batches):
        import pyarrow as pa

        for batch in batches:
            x = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
            if x.size == 0:
                continue
            yield pa.record_batch(
                {
                    "n": pa.array([x.shape[0]], pa.int64()),
                    "s": pa.array([x.sum(axis=0).tolist()]),
                    "g": pa.array([(x.T @ x).reshape(-1).tolist()]),
                }
            )

    rows = (
        emb.select("embedding")
        .mapInArrow(partials, "n bigint, s array<double>, g array<double>")
        .collect()
    )
    n = sum(r.n for r in rows)
    s = np.sum([np.asarray(r.s) for r in rows], axis=0)
    g = np.sum([np.asarray(r.g).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return mean, cov, n


@query("q_embedding_pca_top1")
def q_embedding_pca_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus: (dim_idx,
    weight) rows for the unit leading eigenvector (sign fixed:
    largest-|w| component positive) plus the eigenvalue and
    explained-variance ratio repeated per row.

    Scale split: the only corpus-sized work is the one-pass partial
    Gram accumulation (mapInArrow, one (dim+1)×dim partial per
    partition — the classic distributed covariance shape); the
    eigendecomposition runs on the driver over the bounded 64×64
    matrix (parameter-sized math, same class as the k-means centroid
    collect — a power iteration was rejected because the synthetic
    embeddings are near-isotropic and its eigengap-bound convergence
    stalls). Rows-only: see module docstring."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    _, cov, _ = covariance_matrix(emb)
    w, vecs = np.linalg.eigh(cov)
    v = vecs[:, -1]
    lam = float(w[-1])
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    evr = lam / float(np.trace(cov))
    out = [
        (i, float(v[i]), round(lam, 6), round(evr, 6)) for i in range(PCA_DIM)
    ]
    return spark.createDataFrame(
        out, "dim_idx int, weight double, eigenvalue double, explained_var_ratio double"
    )
