"""Oracle-checked queries exercising the UDF surface (B.12): each
pandas UDF reimplements an SQL-expressible function, so DuckDB can
verify the Python path end-to-end."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.functions.udfs import trend_slope_per_user, vector_norm_udf
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_pandas_udf_norm",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS norm
    FROM embeddings WHERE vec_id < 200
    """,
)
def q_pandas_udf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF vs DuckDB's list math. numpy
    float64 accumulation agrees with sequential sum to ≪1e-4 at
    64 dims, so round(,4) is stable."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id") < 200).select(
        "vec_id", F.round(vector_norm_udf(F.col("embedding")), 4).alias("norm")
    )


@query(
    "q_applyinpandas_slope",
    oracle="""
    SELECT user_id,
           round(regr_slope(value, floor(epoch(ts))) * 86400, 6) AS slope_per_day
    FROM events GROUP BY user_id
    """,
)
def q_applyinpandas_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas least-squares slope per user vs SQL regr_slope.
    ts truncates to whole epoch seconds on both sides; the slope is
    rescaled to per-day before rounding — per-second slopes are ~1e-5,
    where round(,6) amplifies engine-level FP noise into mismatches."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.to_timestamp(F.from_unixtime(F.unix_timestamp("ts")))
    )
    slope = F.when(F.isnan("slope"), F.lit(None)).otherwise(F.col("slope"))
    return trend_slope_per_user(ev).select(
        "user_id", F.round(slope * 86400, 6).alias("slope_per_day")
    )


@query(
    "q_mapinarrow_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tok,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def q_mapinarrow_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-NATIVE batch transform (mapInArrow — the zero-copy
    sibling of mapInPandas): per-document token/char counts computed
    with pyarrow.compute kernels directly on RecordBatches, no pandas
    materialization. Completes the B.12 UDF-surface matrix (F.udf /
    pandas_udf / applyInPandas / mapInPandas / UDTF /
    transformWithState / mapInArrow). Oracle-checked against the
    plain SQL equivalent, so the Arrow kernel semantics (whitespace
    split + empty-token drop) are pinned cross-engine."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for batch in batches:
            text = batch.column("text")
            trimmed = pc.utf8_trim_whitespace(text)
            toks = pc.split_pattern_regex(trimmed, r"\s+")
            # drop empty tokens (split of "" yields [""]): Arrow has no
            # per-list filter kernel, so subtract each row's
            # empty-string count from its list length
            n_tok = pc.list_value_length(toks)
            flat = pc.list_flatten(toks)
            empty_mask = pc.equal(flat, "")
            # per-list empties via parent indices
            parents = pc.list_parent_indices(toks)
            empties = pa.Table.from_arrays(
                [parents.filter(empty_mask)], names=["p"]
            )
            counts = empties.group_by("p").aggregate([("p", "count")])
            empty_per_row = dict(
                zip(
                    counts.column("p").to_pylist(),
                    counts.column("p_count").to_pylist(),
                )
            )
            n_tok_py = [
                int(n) - empty_per_row.get(i, 0)
                for i, n in enumerate(n_tok.to_pylist())
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pa.array(n_tok_py, type=pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                ],
                names=["doc_id", "n_tok", "n_chars"],
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(stats, schema="doc_id bigint, n_tok bigint, n_chars bigint")


@query(
    "q_pandas_udf_grouped_agg",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(sqrt(CAST(SUM(CAST(value * value AS DECIMAL(30,10))) AS DOUBLE)
                      / COUNT(*)), 6) AS rms
    FROM events GROUP BY event_type
    """,
)
def q_pandas_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the last cell of the B.12 matrix
    (scalar pandas_udf / applyInPandas / mapInPandas / mapInArrow /
    UDTF / transformWithState already have queries): per-type root
    mean square computed in Python, hash-matched against the SQL
    aggregate.

    The parity trick is applying the engine's own oracle-stability
    rule INSIDE the UDF: each x² quantizes to DECIMAL(30,10) exactly
    as Spark's double→decimal cast does (shortest-repr string →
    half-up), and Python's arbitrary-precision Decimal sum IS the
    decimal accumulation — so the Python aggregate and the two SQL
    engines produce the same double to the last bit. Arrow ships one
    batch per group partition; the aggregate output is |types| rows."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def rms_agg(v: pd.Series) -> float:
        q = Decimal(1).scaleb(-10)
        total = Decimal(0)
        for x in v:
            # mirror Spark's cast(value*value AS DECIMAL(30,10)):
            # double product -> shortest decimal repr -> half-up
            total += Decimal(repr(x * x)).quantize(q, rounding=ROUND_HALF_UP)
        return (float(total) / len(v)) ** 0.5

    @pandas_udf("long")
    def n_agg(v: pd.Series) -> int:
        # grouped-agg UDFs cannot mix with JVM aggregates in one
        # groupBy, so the row count is a (trivial) pandas agg too
        return len(v)

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        n_agg("value").alias("n"),
        F.round(rms_agg("value"), 6).alias("rms"),
    )
