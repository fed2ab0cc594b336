"""Dedup, part 3: sorted-neighborhood near-duplicate detection
(Hernández & Stolfo, SIGMOD'95 — public algorithm).

The third classic candidate-generation strategy alongside exact
hashing (dedup.py) and MinHash-LSH banding (dedup.py): sort the
corpus on a discriminating key and compare each record only against
its W-1 successors in sort order. Where LSH trades recall for an
equi-join on band buckets, sorted-neighborhood trades it for one
sort + a fixed-width window — no pair blowup, no signature
computation, and it catches prefix-preserving edits LSH can miss at
low signature budgets.

100 TB shape: blocking key first (here: lang), THEN the sort — the
window never crosses block boundaries, so the global sort becomes a
per-block range sort (Spark: one repartition by block + in-partition
sort; the window's lead() needs no cross-partition rows beyond the
standard frame exchange). Pair generation is lead(doc_id, j) for
j < W — output is |corpus|·(W-1) candidates MAX, linear not
quadratic. Verification is the same in-row shingle Jaccard as
q_ngram_jaccard_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.dedup import normalized_text, word_shingles
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

SN_WINDOW = 4  # compare each doc with its 3 successors in sort order
SN_MIN_JACCARD = 0.2

_NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_SHINGLES_SQL = """
             list_distinct(list_transform(
               generate_series(1, greatest(len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) - 2, 1)),
               i -> array_to_string(regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')[i:i+2], ' ')
             ))
"""

_SN_ORACLE = f"""
WITH r AS (
  SELECT doc_id, lang,
         lead(doc_id, 1) OVER w AS l1,
         lead(doc_id, 2) OVER w AS l2,
         lead(doc_id, 3) OVER w AS l3
  FROM documents
  WINDOW w AS (PARTITION BY lang ORDER BY {_NORM_SQL}, doc_id)
), cand AS (
  SELECT doc_id AS id_a, unnest([l1, l2, l3]) AS id_b FROM r
), sh AS (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM documents
)
SELECT least(c.id_a, c.id_b) AS doc_a,
       greatest(c.id_a, c.id_b) AS doc_b,
       round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / (len(a.shingles) + len(b.shingles)
                - len(list_intersect(a.shingles, b.shingles))), 4) AS jaccard
FROM cand c
JOIN sh a ON c.id_a = a.doc_id
JOIN sh b ON c.id_b = b.doc_id
WHERE c.id_b IS NOT NULL
  AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / (len(a.shingles) + len(b.shingles)
         - len(list_intersect(a.shingles, b.shingles))) >= {SN_MIN_JACCARD}
"""


@query("q_sorted_neighborhood_pairs", oracle=_SN_ORACLE)
def q_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup pairs: per-lang sort on the
    normalized text, window of SN_WINDOW=4, exact 3-word-shingle
    Jaccard verification at >= SN_MIN_JACCARD=0.2.

    Plan (round-6 rewrite): ONE scan → per-block window where the
    shingle arrays ride as lead() payloads next to the lead ids →
    explode of W-1 (id, shingles) structs (linear candidate count) →
    JVM-side array_intersect Jaccard in the same stage. The r5 form
    joined the exploded id pairs back to a shingle table twice —
    three exchanges and two more document scans; carrying the
    payload through the window costs nothing extra because the sort
    key is the normalized text itself (document-sized either way)
    and drops 6.6 s → ~4.3 s at sf0.1 (the per-lang text sort is the
    remaining cost). No quadratic stage anywhere.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        normalized_text("text").alias("nt"),
        word_shingles("text").alias("shingles"),
    )
    w = Window.partitionBy("lang").orderBy("nt", "doc_id")
    r = d.select(
        "doc_id",
        F.col("shingles").alias("sh_a"),
        *[
            F.struct(
                F.lead("doc_id", j).over(w).alias("id_b"),
                F.lead("shingles", j).over(w).alias("sh_b"),
            ).alias(f"n{j}")
            for j in range(1, SN_WINDOW)
        ],
    )
    cand = r.select(
        F.col("doc_id").alias("id_a"),
        "sh_a",
        F.explode(F.array(*[f"n{j}" for j in range(1, SN_WINDOW)])).alias("nb"),
    ).filter(F.col("nb.id_b").isNotNull())
    inter = F.size(F.array_intersect("sh_a", F.col("nb.sh_b"))).cast("double")
    union = (
        F.size("sh_a")
        + F.size(F.col("nb.sh_b"))
        - F.size(F.array_intersect("sh_a", F.col("nb.sh_b")))
    )
    jac = inter / union
    return (
        cand.filter(jac >= SN_MIN_JACCARD)
        .select(
            F.least("id_a", F.col("nb.id_b")).alias("doc_a"),
            F.greatest("id_a", F.col("nb.id_b")).alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
    )
