"""LLM-corpus text analysis, part 33 (round 15): cross-document
boilerplate detection and deterministic corpus splitting — two
pipeline stages every large pretraining build runs.

- q_boilerplate_lines: CCNet-style cross-document line dedup signal
  (Wenzek et al., LREC 2020 — CCNet dedups paragraphs that repeat
  across a shard; boilerplate headers/footers dominate those). Lines
  come from the same deterministic wrap rendering the C4 panel
  derives in-query (llm_text30.py: ll = 4 + doc_id%5 words/line —
  the fixture's texts are flat word streams), WITHOUT the planted
  C4 triggers: repetition arises naturally from the fixture's small
  vocabulary. A line is boilerplate when it occurs ≥ {BOILER_MIN}
  times across its source (CCNet dedups paragraphs seen more than
  once; measured: the ≥3 threshold is fixture-degenerate at
  sf0.001 — zero hits — while ≥2 fires at every SF: 52/38/853); the page keep decision is the exact
  integer cross-multiply n_boiler·100 ≤ n_lines·{BOILER_MAX_PCT}
  (no floats anywhere).
- q_hash_split: deterministic train/val/test assignment by document
  content hash (the standard leakage-safe split: hash the text, not
  the id, so re-shards keep assignments stable), bucketed via the
  established md5-hex-prefix bridge (conv ≡ CAST('0x'||…)); output
  is the per (split, lang) doc/token census a data card reports.

Exactness: both queries are integer counting + string ops only.

Scale shape: boilerplate = one explode to line granularity (linear,
partition-local), one (source, line) count window, one doc-level
hash agg — the same two-shuffle shape as the winnowing queries;
hash_split = one narrow scan + hash agg, no window. Reference
parity: none (no text surface in cmd/backup.go) — north-star
derived capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

BOILER_MIN = 2  # CCNet convention: a line repeated within its source
BOILER_MAX_PCT = 40  # keep pages with <= 40% boilerplate lines

SPLIT_TRAIN_END = 80  # md5 bucket < 80  -> train
SPLIT_VAL_END = 90  # 80 <= bucket < 90 -> val; else test


@query(
    "q_boilerplate_lines",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, CAST(doc_id AS BIGINT) AS did,
             str_split(text, ' ') AS ws,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS nw,
             4 + CAST(doc_id AS BIGINT) % 5 AS ll
      FROM documents
    ), lines AS (
      SELECT doc_id, source, ws, ll,
             unnest(generate_series(0, (nw + ll - 1) // ll - 1)) AS i
      FROM base
    ), rendered AS (
      SELECT doc_id, source,
             array_to_string(ws[i*ll+1 : i*ll+ll], ' ') AS line
      FROM lines
    ), counted AS (
      SELECT doc_id, source, line,
             count(*) OVER (PARTITION BY source, line) AS occ
      FROM rendered
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN occ >= {BOILER_MIN} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boiler,
           CAST(CASE WHEN SUM(CASE WHEN occ >= {BOILER_MIN} THEN 1 ELSE 0 END)
                          * 100 <= COUNT(*) * {BOILER_MAX_PCT}
                THEN 1 ELSE 0 END AS INT) AS page_kept
    FROM counted GROUP BY doc_id
    """,
)
def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate-line census: lines of the derived
    wrap rendering that repeat ≥ BOILER_MIN times within the doc's
    source, and the integer cross-multiplied page keep decision."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    did = F.col("doc_id").cast("bigint")
    ws = F.split("text", " ")
    base = d.select(
        "doc_id",
        "source",
        ws.alias("ws"),
        F.size(ws).cast("bigint").alias("nw"),
        (F.lit(4) + did % 5).alias("ll"),
    )
    lines = base.select(
        "doc_id",
        "source",
        "ws",
        "ll",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"), F.expr("(nw + ll - 1) div ll - 1")
            )
        ).alias("i"),
    )
    rendered = lines.select(
        "doc_id",
        "source",
        F.array_join(
            F.slice(
                F.col("ws"),
                (F.col("i") * F.col("ll") + 1).cast("int"),
                F.col("ll").cast("int"),
            ),
            " ",
        ).alias("line"),
    )
    counted = rendered.withColumn(
        "occ", F.count(F.lit(1)).over(Window.partitionBy("source", "line"))
    )
    boiler = F.sum((F.col("occ") >= BOILER_MIN).cast("int"))
    return counted.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        boiler.cast("bigint").alias("n_boiler"),
        (boiler * 100 <= F.count(F.lit(1)) * BOILER_MAX_PCT)
        .cast("int")
        .alias("page_kept"),
    )


@query(
    "q_hash_split",
    oracle=f"""
    WITH assigned AS (
      SELECT lang,
             CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 100 AS b,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT CASE WHEN b < {SPLIT_TRAIN_END} THEN 'train'
                WHEN b < {SPLIT_VAL_END} THEN 'val'
                ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM assigned GROUP BY 1, 2
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/val/test split census per
    language: bucket = first 8 md5-hex digits of the TEXT mod 100
    (stable under resharding and id reassignment — the leakage-safe
    convention), 80/10/10. One narrow scan + hash agg."""
    d = load_table(spark, sf_dir, "documents").select("lang", "text")
    b = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint") % 100
    assigned = d.select(
        "lang",
        b.alias("b"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    split = (
        F.when(F.col("b") < SPLIT_TRAIN_END, "train")
        .when(F.col("b") < SPLIT_VAL_END, "val")
        .otherwise("test")
    )
    return assigned.groupBy(split.alias("split"), "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
