"""Data-profiling operators (round-5 wave 9): one-pass column
profile — the "DESCRIBE my table for real" audit every warehouse
runs before trusting a new feed (null counts, exact cardinalities,
typed extrema).

The reference's schema-on-read model (helpers.go:43-63 decodes
whatever columns arrive) makes profiling the natural first query
against an unknown table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# (column, render) pairs: typed min/max are computed FIRST, then
# rendered — doubles render through DECIMAL(18,4) (raw storage
# values — the cast is cross-engine exact for fixture scales),
# timestamps through the second-precision format, so both engines
# emit identical strings.
_PROFILE_COLS: list[tuple[str, str]] = [
    ("l_orderkey", "bigint"),
    ("l_partkey", "bigint"),
    ("l_suppkey", "bigint"),
    ("l_linenumber", "bigint"),
    ("l_quantity", "double"),
    ("l_extendedprice", "double"),
    ("l_discount", "double"),
    ("l_tax", "double"),
    ("l_returnflag", "string"),
    ("l_linestatus", "string"),
    ("l_shipdate", "timestamp"),
]


def _render(col: Column, kind: str) -> Column:
    if kind == "double":
        return col.cast("decimal(18,4)").cast("string")
    if kind == "timestamp":
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def _render_sql(expr: str, kind: str) -> str:
    if kind == "double":
        return f"CAST(CAST({expr} AS DECIMAL(18,4)) AS VARCHAR)"
    if kind == "timestamp":
        return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"
    return f"CAST({expr} AS VARCHAR)"


def _profile_oracle() -> str:
    parts = []
    for c, kind in _PROFILE_COLS:
        parts.append(
            f"""
    SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT({c}) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           {_render_sql(f"MIN({c})", kind)} AS min_repr,
           {_render_sql(f"MAX({c})", kind)} AS max_repr
    FROM lineitem"""
        )
    return " UNION ALL ".join(parts)


@query("q_table_profile", oracle=_profile_oracle())
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of lineitem: per column, row count, null
    count, EXACT distinct count, and typed min/max rendered to
    stable strings — one row per column.

    Scale shape: ONE aggregation pass computes all
    {len(_PROFILE_COLS)}×4 statistics (count_distinct rewrites to
    expand+partial-agg internally, but the scan happens once and
    every aggregate map-side-combines); the per-column rows come
    from a single explode of the 1-row result — the aggregate
    subtree is referenced once, never per column. At 100 TB swap
    the exact count_distinct for approx_count_distinct per column
    (the profile's cardinality column is advisory) — the rest of
    the pass is unchanged."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in _PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
        aggs.append(_render(F.min(c), kind).alias(f"mn_{c}"))
        aggs.append(_render(F.max(c), kind).alias(f"mx_{c}"))
    one = li.agg(*aggs)
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"nn_{c}").alias("n_nulls"),
                        F.col(f"nd_{c}").alias("n_distinct"),
                        F.col(f"mn_{c}").alias("min_repr"),
                        F.col(f"mx_{c}").alias("max_repr"),
                    )
                    for c, _ in _PROFILE_COLS
                ]
            )
        ).alias("e")
    ).select("e.*")
