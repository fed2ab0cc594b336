"""Vector math over array<float|double> columns — built-in higher-
order functions only (zip_with / aggregate / transform), fully
JVM-side: no Python in the per-row hot path (B.11 embedding ops).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic accumulation order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def query_vector_lit(vec: list[float]) -> Column:
    """Materialize a driver-side query vector as a literal array —
    a broadcast scalar parameter, not data (no join needed)."""
    return F.array(*[F.lit(float(v)) for v in vec])
