"""UDF surface (SURVEY.md §2 B.12): vectorized pandas UDFs (scalar,
grouped-agg), applyInPandas grouped-map, and SQL registration.

The reference's client-side decode layer (helpers/helpers.go:5-63) is
its moral UDF surface; here the rule is: built-ins first (B.8), Arrow
pandas UDFs when Python is unavoidable, never row-at-a-time F.udf in
a hot path (10-100× slower — Arrow batches amortize serialization).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# NB: DataType objects, not DDL strings — string return types make
# pandas_udf parse DDL at decoration time, which requires an active
# SparkSession and breaks plain `import` of this module.


@pandas_udf(DoubleType())
def vector_norm_udf(emb: pd.Series) -> pd.Series:
    """Scalar pandas UDF: L2 norm of an array<float> column. One
    Arrow batch in, one out; numpy does the math in C."""
    return emb.map(lambda v: float(np.sqrt(np.dot(v, v))))


@pandas_udf(DoubleType())
def weighted_value_udf(value: pd.Series, k: pd.Series) -> pd.Series:
    """Two-column scalar pandas UDF (value weighted by json-extracted
    k)."""
    return value * (1.0 + k / 100.0)


@pandas_udf(DoubleType())
def mean_value_gagg(value: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-aggregate pandas UDF: mean via numpy."""
    return float(value.mean())


def trend_slope_per_user(events: DataFrame) -> DataFrame:
    """applyInPandas grouped-map: per-user least-squares slope of
    value over time — the UDTF-equivalent surface. Output matches
    SQL regr_slope semantics (oracle-checkable)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["ts"].astype("int64") / 1e9  # epoch seconds
        y = pdf["value"]
        if len(pdf) < 2 or x.nunique() < 2:
            slope = float("nan")
        else:
            xm, ym = x.mean(), y.mean()
            slope = float(((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum())
        return pd.DataFrame({"user_id": [pdf["user_id"].iloc[0]], "slope": [slope]})

    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandas(
        fit, "user_id bigint, slope double"
    )


def register_sql_udfs(spark: SparkSession) -> None:
    """Expose the pandas UDFs to SQL (spark.udf.register) so
    spark.sql('SELECT vector_norm(embedding) ...') works."""
    spark.udf.register("vector_norm", vector_norm_udf)
    spark.udf.register("weighted_value", weighted_value_udf)
