"""Relational surface, part 3: statistical aggregates, regexp kit,
bitwise ops, deterministic full-row dedup (B.4/B.8/B.11 completeness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_stats_moments",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 2) AS price_sd,
           round(var_samp(l_discount), 6) AS disc_var,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_discount, l_tax), 8) AS disc_tax_cov
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates. Rounding grids sit ≥3 orders of
    magnitude above the engines' numerical disagreement (merge-order
    effects in single-pass moment updates), chosen per column scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_sd"),
        F.round(F.var_samp("l_discount"), 6).alias("disc_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_discount", "l_tax"), 8).alias("disc_tax_cov"),
    )


@query(
    "q_regexp_kit",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+) (join|scan|sort)', 1) AS verb_subject,
           regexp_extract(text, '([a-z]+) (join|scan|sort)', 2) AS verb,
           CAST(len(regexp_extract_all(text, '\\bdata\\b')) AS INT) AS n_data,
           CAST(regexp_matches(text, 'window') AS BOOLEAN) AS mentions_window,
           regexp_replace(text, '^(\\w+) ', 'FIRST:\\1 ') AS tagged_head
    FROM documents WHERE doc_id < 150
    """,
)
def q_regexp_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp kit: group extraction, match counting, boolean match,
    backreference replacement (B.8 string family completeness)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 150).select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+) (join|scan|sort)", 1).alias("verb_subject"),
        F.regexp_extract("text", r"([a-z]+) (join|scan|sort)", 2).alias("verb"),
        F.size(F.regexp_extract_all("text", F.lit(r"\bdata\b"), 0)).alias("n_data"),
        F.col("text").rlike("window").alias("mentions_window"),
        F.regexp_replace("text", r"^(\w+) ", r"FIRST:$1 ").alias("tagged_head"),
    )


@query(
    "q_bitwise",
    oracle="""
    SELECT e1.event_id,
           e1.event_id & 255 AS low_byte,
           e1.event_id | 4096 AS with_flag,
           xor(e1.event_id, e1.user_id) AS id_xor,
           e1.event_id << 2 AS shifted_l,
           e1.event_id >> 3 AS shifted_r,
           CAST(bit_count(e1.event_id) AS INT) AS popcount
    FROM events e1 WHERE e1.event_id < 2000
    """,
)
def q_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise ops (the SimHash/bucketing substrate, B.8)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") < 2000).select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("id_xor"),
        F.expr("shiftleft(event_id, 2)").alias("shifted_l"),
        F.expr("shiftright(event_id, 3)").alias("shifted_r"),
        F.bit_count("event_id").cast("int").alias("popcount"),
    )


@query(
    "q_dedup_keep_first",
    oracle="""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                                ORDER BY doc_id) AS rn
      FROM documents
    ) t WHERE rn = 1
    """,
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row dedup keeping the lowest-id row per normalized
    fingerprint — the deterministic form of dropDuplicates (whose
    keep-first is partition-order-dependent, hence unusable for
    reproducible corpus builds)."""
    from timestream_travel_spark.operators.dedup import normalized_text

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(normalized_text("text"))).orderBy(F.asc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
    )
