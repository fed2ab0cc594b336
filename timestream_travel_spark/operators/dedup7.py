"""Dedup, part 7 (round 15): vocabulary-set fingerprint clustering —
template-duplicate CANDIDATE generation: documents whose DISTINCT
token sets are identical are re-renderings of the same template
(boilerplate pages, spun content) even when order and repetition
counts differ. This is the cheapest member of the candidate family
(one hash per doc, no signatures); candidates then feed the exact /
Jaccard verifiers exactly like the LSH pipeline
(operators/dedup.py:310 q_lsh_verified_jaccard).

Design note (fixture-measured): the raw-text and sorted-MULTISET
fingerprints collapse to the planted exact duplicates only (0
clusters at sf0.001/0.01) — degenerate as a standalone query — so
the shipped fingerprint is the sorted DISTINCT-token set, which
clusters at every SF (25/21/257) and is the semantically distinct
operation: vocabulary identity, not content identity. n_exact_dups
reports how many cluster members are also raw-text duplicates of
the representative, separating template hits from true copies.

Exactness: string sort is binary/UTF-8 byte order in BOTH engines
(Spark array_sort ≡ DuckDB list_sort under the default binary
collation; fixture tokens are ASCII), md5 hex lowercase in both.

Scale shape: one narrow projection + per-row distinct+sort (linear,
partition-local, JVM-side) + ONE hash aggregation on the
fingerprint — the q_dedup_exact plan with a computed key; the
n_exact_dups column adds a count over (fp, md5(text)) distinct
pairs, still map-side combinable. No window, no join.

Reference parity: none (no text surface in cmd/backup.go) —
north-star derived capability; sibling of operators/dedup.py:39.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


@query(
    "q_dedup_vocab_set",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(str_split(text, ' '))), ' '))
               AS fp,
             md5(text) AS exact_h,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS vocab
      FROM documents
    )
    SELECT fp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS rep_doc,
           CAST(MAX(vocab) AS BIGINT) AS vocab_size,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) - COUNT(DISTINCT exact_h) AS BIGINT) AS n_exact_dups
    FROM fp
    GROUP BY fp
    HAVING COUNT(*) >= 2
    """,
)
def q_dedup_vocab_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-set template-duplicate candidate clusters: docs
    sharing the sorted DISTINCT-token md5, clusters of size ≥ 2 with
    the min doc_id as representative and the count of members that
    are also exact raw-text duplicates (module docstring)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split("text", " ")
    fp = d.select(
        "doc_id",
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias(
            "fp"
        ),
        F.md5("text").alias("exact_h"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("vocab"),
    )
    return (
        fp.groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("rep_doc"),
            F.max("vocab").cast("bigint").alias("vocab_size"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            (F.count(F.lit(1)) - F.countDistinct("exact_h"))
            .cast("bigint")
            .alias("n_exact_dups"),
        )
        .filter(F.col("n_docs") >= 2)
    )
