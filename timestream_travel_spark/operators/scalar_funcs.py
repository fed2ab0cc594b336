"""Scalar function surface (SURVEY.md §2 B.8): date/time, string,
math, hash, array/map, JSON, conditional, cast — exercised as named
queries so every family is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.functions.faithful import faithful_scalar
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           strftime(o_orderdate, '%Y%m%d') AS yyyymmdd,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d %H:%M:%S') AS due_ts
    FROM orders WHERE o_orderkey < 500
    """,
)
def q_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time kit incl. the reference's yyyyMMdd S3-key part
    (cmd/backup.go:24, 313) and relative-time interval arithmetic
    (cmd/backup.go:134-156)."""
    od = load_table(spark, sf_dir, "orders")
    return od.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("yyyymmdd"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), "yyyy-MM-dd HH:mm:ss").alias("due_ts"),
    )


@query(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_up,
           lower(p_brand) AS brand_lo,
           substring(p_type, 1, 3) AS type3,
           CAST(length(p_name) AS INT) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           trim(concat('  ', p_name, '  ')) AS trimmed,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           split_part(p_name, ' ', 1) AS first_word
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String kit incl. the sprintf-style key assembly the reference
    does for S3 keys (cmd/backup.go:313), as concat()."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_up"),
        F.lower("p_brand").alias("brand_lo"),
        F.substring("p_type", 1, 3).alias("type3"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           round(sqrt(l_extendedprice), 4) AS price_sqrt,
           round(ln(l_extendedprice + 1), 4) AS price_ln,
           round(pow(l_tax + 1, 2), 6) AS tax_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod
    FROM lineitem WHERE l_orderkey < 300
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math kit. round() on already-computed doubles is stable here
    because inputs are identical bit patterns in both engines (no
    accumulation involved)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") < 300).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "q_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256
    FROM documents WHERE doc_id < 100
    """,
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hashing (md5/sha2) — the dedup-key primitives. The
    reference's crc32 (cmd/backup.go:308-309) is exercised in the
    backup pipeline tests (DuckDB lacks crc32)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS sum_vals,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
    FROM embeddings WHERE vec_id < 100
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array kit over the embedding column: size/index/max plus
    higher-order transform/filter/aggregate (GEN of A19)."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.filter(F.col("vec_id") < 100).select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.col("embedding").getItem(0).cast("double"), 6).alias("first_val"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 6).alias("sum_vals"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(event_type || '=' || CAST(cnt AS VARCHAR))), ',')
             AS type_counts
    FROM (SELECT user_id, event_type, COUNT(*) AS cnt
          FROM events GROUP BY user_id, event_type) t
    GROUP BY user_id
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map assembly per key (map_from_entries over collected structs —
    GEN of the TimeSeries decode A20), compared as sorted k=v CSV."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "cnt"))).alias("m")
    )
    entries = F.transform(
        F.map_entries("m"), lambda e: F.concat(e.getField("key"), F.lit("="), e.getField("value").cast("string"))
    )
    return m.select("user_id", F.array_join(F.array_sort(entries), ",").alias("type_counts"))


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events WHERE event_type = 'click'
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props payload (B.8 JSON family; the
    reference JSON-encodes rows at the sink, cmd/backup.go:283-292 —
    here we also parse)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.filter(F.col("event_type") == "click").select(
        "event_id",
        k.alias("k_val"),
        F.when(k > 50, "high").otherwise("low").alias("k_band"),
    )


@query(
    "q_conditional_cast",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_masked,
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS bal_str,
           COALESCE(CAST(NULLIF(c_custkey % 3, 0) AS VARCHAR), 'NULL') AS mod_faithful
    FROM customer
    """,
)
def q_conditional_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce, nullif, casts — including the
    reference's NULL→\"NULL\" faithful rendering (helpers.go:5-10)
    via functions.faithful."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias("seg_masked"),
        F.col("c_acctbal").cast("decimal(12,2)").cast("string").alias("bal_str"),
        faithful_scalar(F.nullif(F.col("c_custkey") % 3, F.lit(0))).alias("mod_faithful"),
    )
