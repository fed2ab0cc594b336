"""UDF-surface queries, part 2 (round 5, wave 5): the grouped
`applyInArrow` API (Spark 4) — the last cell of the SURVEY B.12
UDF/UDAF/UDTF matrix (pandas_udf scalar / GROUPED_AGG, applyInPandas,
mapInPandas, mapInArrow, UDTF, SQL-registered are already covered).

applyInArrow hands each group to Python as a single pyarrow.Table —
no pandas conversion, so no dtype coercion surprises — and the UDF
below does only INTEGER arithmetic (value quantized to exact cents)
so the result is bit-identical to the DuckDB oracle regardless of
row order within the group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


def _value_stats(table):  # pyarrow.Table -> pyarrow.Table
    import pyarrow as pa
    import pyarrow.compute as pc

    cents = pc.cast(pc.round(pc.multiply(table.column("value"), 100.0)), pa.int64())
    n = table.num_rows
    s = pc.sum(cents).as_py() or 0
    mx = pc.max(cents).as_py() if n else None
    return pa.table(
        {
            "event_type": pa.array([table.column("event_type")[0].as_py()]),
            "n_events": pa.array([n], pa.int64()),
            "sum_cents": pa.array([s], pa.int64()),
            "max_cents": pa.array([mx], pa.int64()),
            "mean_value": pa.array([s / (100.0 * n)], pa.float64()),
        }
    )


@query(
    "q_applyinarrow_value_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(*))
             AS mean_value
    FROM events GROUP BY event_type
    """,
)
def q_applyinarrow_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value statistics through the grouped
    `applyInArrow` API: each group arrives as one pyarrow.Table and
    is reduced with pyarrow.compute kernels only — zero pandas, zero
    Python-loop rows.

    Cross-engine discipline: `value` carries 2 decimal places, so the
    UDF quantizes to exact int64 cents first; every aggregate is then
    integer arithmetic (order-independent), and the one double
    division at the end is correctly rounded on both engines. Scale
    shape: one shuffle on the group key; the Arrow transfer is one
    zero-copy batch per group."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").applyInArrow(
        _value_stats,
        schema=(
            "event_type string, n_events bigint, sum_cents bigint, "
            "max_cents bigint, mean_value double"
        ),
    )
