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

    Plan: co-occurrence-gated, NOT blocked all-pairs. The distinct
    shingles explode once; an equi-join on (lang, source, shingle)
    emits one integer row per SHARED shingle, and |A∩B| is a count
    aggregation — pairs sharing nothing never materialize (their
    containment is 0 < {CONTAIN_MIN}, so skipping them is exact).
    At sf0.1 that is ~16k tiny count rows instead of ~159k
    array_intersect evaluations; at 100 TB the fan-out is
    Σ_shingle C(df,2) within a block — df-bounded co-occurrence, the
    same shape as q_lcs_contamination's shingle join, where a max-df
    hot-shingle cap is the documented relief valve if a corpus
    develops boilerplate shingles.

    |A| is the exploded-row count per doc (word_shingles is
    distinct), broadcast back onto the pair counts — deliberately
    NOT a size() column computed beside the explode: CollapseProject
    would inline the whole shingle expression into the post-Generate
    projection and recompute it from `text` once per exploded row
    (the minhash_candidates lesson, dedup.py)."""
    d = load_table(spark, sf_dir, "documents")
    # persist(): the exploded table feeds FOUR branches (both join
    # sides + both size lookups); without the barrier each branch
    # re-runs the regexp/split/transform shingle pipeline over the
    # corpus (the minhash_candidates precedent, dedup.py — measured
    # 8.0 s → 2.6 s at sf0.1). On a cluster the persisted form is
    # small: (ids, block keys, one shingle string) per row.
    ex = d.select(
        "doc_id", "lang", "source",
        F.explode(word_shingles("text")).alias("s"),
    ).persist()
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = ex.select(
        F.col("doc_id").alias("doc_a"), "lang", "source", "s",
    )
    b = ex.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("source_b"),
        F.col("s").alias("s_b"),
    )
    pairs = (
        a.join(
            b,
            (F.col("s") == F.col("s_b"))
            & (F.col("lang") == F.col("lang_b"))
            & (F.col("source") == F.col("source_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("double").alias("inter"))
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))),
            "doc_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))),
            "doc_b",
        )
    )
    c_ab = F.col("inter") / F.col("n_a")
    c_ba = F.col("inter") / F.col("n_b")
    return (
        pairs.filter((c_ab >= CONTAIN_MIN) | (c_ba >= CONTAIN_MIN))
        .select(
            "doc_a",
            "doc_b",
            F.round(c_ab, 4).alias("contain_a_in_b"),
            F.round(c_ba, 4).alias("contain_b_in_a"),
        )
    )
