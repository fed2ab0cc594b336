"""LLM training-data operators, part 15 (round 5, wave 3): source
frequency capping.

The RefinedWeb/C4-style curation rule (public: Penedo et al.,
NeurIPS 2023 datasets track): no single domain/source may dominate
the training mixture, so each source's document count is CAPPED —
keep its top-N documents by a quality key, drop the rest. Companion
to q_balanced_sample (llm_text5.py), which EQUALIZES classes to the
minimum count; the cap instead enforces a fixed ceiling and leaves
small sources untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

SOURCE_CAP = 15


@query(
    "q_source_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE rn <= {SOURCE_CAP}) AS BIGINT) AS n_kept,
           CAST(COUNT(*) FILTER (WHERE rn > {SOURCE_CAP}) AS BIGINT) AS n_dropped,
           CAST(SUM(n_chars) FILTER (WHERE rn <= {SOURCE_CAP}) AS BIGINT)
             AS kept_chars,
           CAST(SUM(doc_id * doc_id) FILTER (WHERE rn <= {SOURCE_CAP}) AS BIGINT)
             AS kept_id_checksum
    FROM ranked GROUP BY source
    """,
)
def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source frequency cap: keep each source's top
    {SOURCE_CAP} documents by (n_chars DESC, doc_id) — longest-first
    as the quality proxy, id tiebreak for determinism — and report
    the per-source keep/drop audit plus an id checksum of the kept
    set (so the oracle pins WHICH docs survived, not just how many).

    Scale shape: one shuffle on source, one rank window per source
    partition, one map-side-combined audit aggregation on the same
    partitioning (Catalyst reuses the sort — no second exchange). At
    100 TB with a skewed source distribution the window partition for
    a mega-source is the hot spot; the standard mitigation (pre-filter
    with a per-source approximate top-N under AQE skew handling)
    composes in front without changing semantics."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ranked = d.select("source", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
    kept = F.col("rn") <= SOURCE_CAP
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(~kept, 1).otherwise(0)).cast("bigint").alias("n_dropped"),
        F.sum(F.when(kept, F.col("n_chars"))).cast("bigint").alias("kept_chars"),
        F.sum(F.when(kept, F.col("doc_id") * F.col("doc_id")))
        .cast("bigint")
        .alias("kept_id_checksum"),
    )
