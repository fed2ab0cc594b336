"""Relational operators, part 7 (round 5): grouping-set metadata
(GROUPING/GROUPING_ID) and explicit NULLS FIRST/LAST ordering — the
two remaining ANSI surface rows whose DEFAULTS differ between
engines, which is exactly why they need explicit, oracle-checked
forms.

- Spark's ASC default is NULLS FIRST; DuckDB's (and Postgres') is
  NULLS LAST. Any ORDER BY ... LIMIT over a nullable key silently
  returns different ROWS on each engine unless the placement is
  written out.
- GROUPING()/GROUPING_ID() distinguish "NULL because subtotal row"
  from "NULL because the data is NULL" — without them a rollup over
  a nullable column is ambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
             AS gid,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING flags and the composed GROUPING_ID
    bitmask: subtotal rows carry g_*=1 so a NULL group key is
    distinguishable from NULL data — the metadata BI layers need to
    render rollups. The gid is written as the explicit g_flag·2 +
    g_status composition because engines disagree on GROUPING_ID's
    bit order; the composed form is portable by construction. Same
    single-pass expanded aggregate as q_rollup (one exchange,
    map-side combined)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("bigint")
        .alias("gid"),
        F.sum(F.col("l_quantity").cast("decimal(20,4)")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


NULLS_K = 50


@query(
    "q_nulls_ordering",
    oracle=f"""
    SELECT event_id, props
    FROM events
    ORDER BY props ASC NULLS LAST, event_id
    LIMIT {NULLS_K}
    """,
)
def q_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS LAST top-k over a nullable key. Spark's ASC
    default is NULLS FIRST while DuckDB/Postgres default to NULLS
    LAST, so the un-annotated form of this query returns DIFFERENT
    ROWS on each engine — the classic silent portability bug. Writing
    `asc_nulls_last` (and the mirror `NULLS LAST` in the SQL) makes
    the k selected rows engine-independent; the deterministic
    event_id tiebreak does the rest. TakeOrdered top-k, no global
    sort."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "props")
        .orderBy(F.col("props").asc_nulls_last(), F.col("event_id").asc())
        .limit(NULLS_K)
    )
