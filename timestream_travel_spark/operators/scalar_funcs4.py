"""Scalar-function surface, part 4: higher-order MAP functions
(transform_keys/values, map_filter, map_zip_with, str_to_map) and
SQL LATERAL VIEW / stack TVF — closing the remaining gaps of B.8's
map family and B.12's table-generating surface.

All in-row JVM expressions (whole-stage codegen); maps are rendered
as sorted `k=v` CSV at the output boundary because map column
ordering is engine-specific (MEMORY: oracle stability rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


def _map_as_sorted_csv(m) -> F.Column:
    entries = F.transform(
        F.map_entries(m),
        lambda e: F.concat(e.getField("key"), F.lit("="), e.getField("value").cast("string")),
    )
    return F.array_join(F.array_sort(entries), ",")


@query(
    "q_map_transform",
    oracle="""
    WITH pairs AS (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events WHERE event_type IS NOT NULL
      GROUP BY user_id, event_type
    )
    SELECT user_id,
           array_to_string(list_sort(list(upper(event_type) || '=' || CAST(cnt * 2 AS VARCHAR))), ',')
             AS doubled,
           array_to_string(list_sort(list(event_type || '=' || CAST(cnt AS VARCHAR)) FILTER (cnt > 1)), ',')
             AS frequent
    FROM pairs
    GROUP BY user_id
    """,
)
def q_map_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order map ops over the per-user event-type count map:
    transform_keys (upper), transform_values (double), map_filter
    (cnt > 1) — all inside the row, rendered as sorted CSV."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "cnt"))).alias("m")
    )
    doubled = F.transform_values(
        F.transform_keys(F.col("m"), lambda k, v: F.upper(k)), lambda k, v: v * 2
    )
    frequent = F.map_filter(F.col("m"), lambda k, v: v > 1)
    return m.select(
        "user_id",
        _map_as_sorted_csv(doubled).alias("doubled"),
        _map_as_sorted_csv(frequent).alias("frequent"),
    )


@query(
    "q_str_to_map",
    oracle="""
    SELECT o_orderkey,
           map_from_entries(list_transform(
             regexp_split_to_array('status:' || o_orderstatus || ',prio:' || o_orderpriority, ','),
             kv -> struct_pack(k := split_part(kv, ':', 1), v := split_part(kv, ':', 2))
           ))['prio'][1] AS prio
    FROM orders WHERE o_orderkey < 500
    """,
)
def q_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str_to_map: parse 'k:v,k:v' strings into maps and extract a
    key — the config-column pattern (tags, annotations). DuckDB map
    subscripts yield a list; `[1]` unwraps the match."""
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    encoded = F.concat(
        F.lit("status:"), F.col("o_orderstatus"), F.lit(",prio:"), F.col("o_orderpriority")
    )
    m = F.str_to_map(encoded, F.lit(","), F.lit(":"))
    return od.select("o_orderkey", F.element_at(m, "prio").alias("prio"))


@query(
    "q_lateral_view_stack",
    oracle="""
    SELECT o_orderkey, metric, val FROM (
      SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS val
      FROM orders WHERE o_orderkey < 200
      UNION ALL
      SELECT o_orderkey, 'totalprice', o_totalprice
      FROM orders WHERE o_orderkey < 200
    ) t
    """,
)
def q_lateral_view_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LATERAL VIEW over the stack() table-generating function —
    HiveQL's row-expansion idiom (the TVF cousin of unpivot)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sf4")
    return spark.sql(
        """
        SELECT o_orderkey, metric, val
        FROM orders_sf4
        LATERAL VIEW stack(2,
          'custkey', CAST(o_custkey AS DOUBLE),
          'totalprice', o_totalprice
        ) t AS metric, val
        WHERE o_orderkey < 200
        """
    )


@query(
    "q_variant_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_props,
           CAST(SUM(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
                    THEN CAST(json_extract(props, '$.k') AS BIGINT) ELSE 0 END) AS BIGINT)
             AS big_k_sum,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    WHERE props IS NOT NULL AND event_type IS NOT NULL
    GROUP BY event_type
    """,
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json once into a
    variant column, then typed variant_get extraction — the
    open-schema ingestion model (vs per-access get_json_object
    re-parsing, which re-tokenizes the string per extraction)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("props").isNotNull() & F.col("event_type").isNotNull()
    )
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "bigint")
    return v.groupBy("event_type").agg(
        F.count("*").alias("n_props"),
        F.sum(F.when(k > 50, k).otherwise(F.lit(0))).cast("bigint").alias("big_k_sum"),
        F.max(k).cast("bigint").alias("max_k"),
    )


@query(
    "q_url_funcs",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || lang || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
               || '?src=' || source || '&v=2' AS url
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]src=([^&]*)', 1) AS src_param,
           replace(regexp_extract(url, '^https?://([^/]+)', 1) , '.example.com', '')
             AS subdomain
    FROM u
    """,
)
def q_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family: parse_url HOST/PATH/QUERY-with-key — the web-corpus
    provenance columns every crawl pipeline extracts. The oracle
    re-derives each part with regexes (DuckDB has no parse_url)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    url = F.concat(
        F.lit("https://"), F.col("lang"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?src="), F.col("source"), F.lit("&v=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("src")).alias("src_param"),
        F.regexp_replace(F.parse_url("url", F.lit("HOST")), r"\.example\.com$", "").alias(
            "subdomain"
        ),
    )
