"""Dedup, part 6: asymmetric shingle CONTAINMENT pairs (Broder,
SEQUENCES'97 — the companion statistic to resemblance/Jaccard).
Jaccard misses subset relations: a short document fully quoted
inside a long one scores |A|/|B| << 1 on Jaccard but 1.0 on
containment c(A,B) = |A∩B|/|A|. Training-data curation needs the
DIRECTION — the contained side is the redundant one to drop.

Same blocked-pair plan as q_ngram_jaccard_pairs (dedup.py): the
(lang, source) block join bounds candidates, shingle sets stay
in-row arrays, sizes are integers, and each emitted row spends two
float divisions. 100 TB: blocking is the corpus-side bound; the
shingle arrays never explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.dedup import word_shingles
from timestream_travel_spark.operators.dedup3 import _SHINGLES_SQL
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

CONTAIN_MIN = 0.5  # report pairs where either direction >= 0.5


@query(
    "q_containment_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang, source, {_SHINGLES_SQL} AS shingles
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / len(a.shingles), 4) AS contain_a_in_b,
           round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / len(b.shingles), 4) AS contain_b_in_a
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / len(a.shingles) >= {CONTAIN_MIN}
       OR CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / len(b.shingles) >= {CONTAIN_MIN}
    """,
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle-containment pairs: c(A,B) = |A∩B|/|A| and
    c(B,A) = |A∩B|/|B| for every (lang, source)-blocked pair where
    either direction reaches {CONTAIN_MIN} — the subset/quote
    relation Jaccard dilutes (Broder's resemblance-vs-containment
    distinction). The higher direction names the CONTAINED (more
    redundant) document.

    Plan: identical blocked self-join to q_ngram_jaccard_pairs —
    3-word shingle arrays stay in-row, intersection sizes are
    integers, two divisions per emitted row."""
    d = load_table(spark, sf_dir, "documents")
    a = d.select(
        F.col("doc_id").alias("doc_a"), "lang", "source",
        word_shingles("text").alias("sh_a"),
    )
    b = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("source_b"),
        word_shingles("text").alias("sh_b"),
    )
    joined = a.join(
        b,
        (F.col("lang") == F.col("lang_b"))
        & (F.col("source") == F.col("source_b"))
        & (F.col("doc_a") < F.col("doc_b")),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    c_ab = inter / F.size("sh_a")
    c_ba = inter / F.size("sh_b")
    return (
        joined.filter((c_ab >= CONTAIN_MIN) | (c_ba >= CONTAIN_MIN))
        .select(
            "doc_a",
            "doc_b",
            F.round(c_ab, 4).alias("contain_a_in_b"),
            F.round(c_ba, 4).alias("contain_b_in_a"),
        )
    )
