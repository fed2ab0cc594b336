"""Scalar/array surface, part 3: array set algebra, safe casting
(try_cast), null-preserving explode (B.8 completeness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_array_set_ops",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS words,
             regexp_split_to_array('the data spark join scan', ' ') AS probe
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(len(list_intersect(words, probe)) AS INT) AS n_common,
           CAST(len(list_distinct(list_concat(words, probe))) AS INT) AS n_union,
           CAST(len(list_filter(words, w -> NOT list_contains(probe, w))) AS INT) AS n_only_doc,
           COALESCE(array_to_string(list_sort(list_intersect(words, probe)), ','), '')
             AS common_csv  -- DuckDB renders an empty list as NULL; Spark's array_join as ''
    FROM t
    """,
)
def q_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra against a fixed probe vocabulary:
    intersect/union/except sizes + sorted materialization (B.8 array
    family; the set primitives under Jaccard-style similarity)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))
    probe = F.split(F.lit("the data spark join scan"), " ")
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.size(F.array_intersect(words, probe)).alias("n_common"),
        F.size(F.array_distinct(F.concat(words, probe))).alias("n_union"),
        F.size(F.array_except(words, probe)).alias("n_only_doc"),
        F.array_join(F.array_sort(F.array_intersect(words, probe)), ",").alias("common_csv"),
    )


@query(
    "q_try_cast_safe",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           TRY_CAST(event_type AS BIGINT) AS type_as_num,
           COALESCE(TRY_CAST(event_type AS BIGINT), -1) AS type_or_default
    FROM events WHERE event_id < 1000
    """,
)
def q_try_cast_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe casting: malformed input → NULL instead of job failure —
    the ingestion-hardening primitive (a 100 TB job must not die on
    row 3 trillion's bad string)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") < 1000).select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_num"),
        F.col("event_type").try_cast("bigint").alias("type_as_num"),
        F.coalesce(F.col("event_type").try_cast("bigint"), F.lit(-1)).alias("type_or_default"),
    )


@query(
    "q_explode_outer",
    oracle="""
    WITH t AS (
      SELECT user_id,
             CASE WHEN user_id % 3 = 0 THEN NULL
                  ELSE regexp_split_to_array(CAST(user_id AS VARCHAR) || ',x', ',') END AS arr
      FROM (SELECT DISTINCT user_id FROM events) u
    )
    SELECT user_id, u.w AS item
    FROM t LEFT JOIN LATERAL unnest(t.arr) AS u(w) ON TRUE
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving explode: rows with NULL arrays survive with a
    NULL item (explode_outer ≍ LEFT JOIN LATERAL unnest) — the
    difference between dropping and keeping sparse records."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    arr = F.when(
        F.col("user_id") % 3 == 0, F.lit(None).cast("array<string>")
    ).otherwise(F.split(F.concat(F.col("user_id").cast("string"), F.lit(",x")), ","))
    return users.select("user_id", arr.alias("arr")).select(
        "user_id", F.explode_outer("arr").alias("item")
    )
