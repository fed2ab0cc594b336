"""LLM training-data operators, part 10: information-theoretic
quality filtering (word-distribution entropy) and SemDeDup-style
semantic deduplication against cluster representatives.

Both stay JVM-side: entropy is two hash aggregations (word counts →
per-doc moments), semantic dedup is a 10-row broadcast join + codegen
vector math — no Python per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.functions.vectors import cosine, to_double_array
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# Calibrated to the synthetic fixture's cosine spread (reps' cohort
# sits ≤ ~0.33): real corpora run this at ~0.95+.
SEMANTIC_DUP_TAU = 0.30


@query(
    "q_word_entropy",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
      FROM documents
    ), wc AS (
      SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_words,
           round(log2(SUM(c))
                 - CAST(SUM(CAST(c * log2(c) AS DECIMAL(20,6))) AS DOUBLE)
                   / SUM(c), 4) AS entropy_bits
    FROM wc GROUP BY doc_id
    """,
)
def q_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the word distribution —
    low-entropy docs are repetitive/templated (a standard LLM-corpus
    quality signal alongside the Gopher repetition metrics).

    H = log2(N) − Σ c·log2(c) / N needs ONE pass over the word counts
    (no p_i materialization); the c·log2(c) terms accumulate as
    DECIMAL so partial-aggregation order can't flip the hash vs the
    oracle. Two hash aggs total, both keyed on doc_id — at 100 TB this
    is a shuffle of (doc_id, word) counts, never of documents."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    n = F.sum("c")
    return wc.groupBy("doc_id").agg(
        n.cast("bigint").alias("n_words"),
        F.round(
            F.log2(n)
            - F.sum((F.col("c") * F.log2("c")).cast("decimal(20,6)")).cast("double") / n,
            4,
        ).alias("entropy_bits"),
    )


@query(
    "q_semantic_dedup",
    oracle=f"""
    WITH rep AS (
      SELECT label, min(vec_id) AS rep_id FROM embeddings GROUP BY label
    ), r AS (
      SELECT rep.label, rep.rep_id, e.embedding AS remb
      FROM rep JOIN embeddings e ON e.vec_id = rep.rep_id
    ), scored AS (
      SELECT e.vec_id, e.label, r.rep_id,
             round(
               list_sum(list_transform(generate_series(1, len(e.embedding)),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(r.remb[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(r.remb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
             4) AS cos_to_rep
      FROM embeddings e JOIN r ON e.label = r.label
    )
    SELECT vec_id, label, cos_to_rep,
           (vec_id <> rep_id AND cos_to_rep >= {SEMANTIC_DUP_TAU}) AS is_dup
    FROM scored
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup: each vector scores against its
    cluster's representative (min vec_id per IVF label); vectors
    within the similarity ball (cos ≥ τ) are flagged as semantic
    duplicates of the representative.

    The scale property that matters: O(n) cosine evaluations — one
    per vector against a k-row broadcast of representatives — never
    the O(n²/k) within-cluster all-pairs matrix. τ is fixture-
    calibrated (see SEMANTIC_DUP_TAU); the plan is threshold-
    independent."""
    e = load_table(spark, sf_dir, "embeddings")
    rep_ids = e.groupBy("label").agg(F.min("vec_id").alias("rep_id"))
    reps = rep_ids.join(
        e.select(F.col("vec_id").alias("rep_id"), F.col("embedding").alias("remb")),
        "rep_id",
    )
    scored = e.join(F.broadcast(reps), "label").select(
        "vec_id",
        "label",
        "rep_id",
        F.round(
            cosine(to_double_array(F.col("embedding")), to_double_array(F.col("remb"))), 4
        ).alias("cos_to_rep"),
    )
    return scored.select(
        "vec_id",
        "label",
        "cos_to_rep",
        (
            (F.col("vec_id") != F.col("rep_id"))
            & (F.col("cos_to_rep") >= F.lit(SEMANTIC_DUP_TAU))
        ).alias("is_dup"),
    )


@query(
    "q_image_features",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST((n_chars % 640) + 1 AS DOUBLE) AS f_width,
           CAST((n_chars % 480) + 1 AS DOUBLE) AS f_height,
           round(CAST((n_chars % 640) + 1 AS DOUBLE) / ((n_chars % 480) + 1), 6)
             AS f_aspect,
           round(log2(((n_chars % 640) + 1) * ((n_chars % 480) + 1)), 6)
             AS f_log2_area
    FROM documents WHERE doc_id < 200
    """,
)
def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature-extraction plumbing: synthesize a PNG per
    doc (planted geometry), Arrow-batch the binary column through
    extract_image_features' mapInPandas, return the feature vectors
    the header parser produced. The oracle recomputes the planted
    features in SQL — a hash match proves the binary→vector path is
    real. The pixel-space encoder is the one codec-gated swap
    (functions/multimodal.decode_image). The vector is projected to
    scalar f_* columns at the output boundary: the external checker
    canonicalizes via pandas sort_values, which cannot hash array
    cells (the array form stays available via
    functions.multimodal.extract_image_features)."""
    from timestream_travel_spark.functions.multimodal import (
        extract_image_features,
        synthesize_png,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].astype("int64"),
                    "blob": [
                        synthesize_png((int(n) % 640) + 1, (int(n) % 480) + 1)
                        for n in pdf["n_chars"]
                    ],
                }
            )

    blobs = d.select("doc_id", "n_chars").mapInPandas(synth, "asset_id long, blob binary")
    feats = extract_image_features(blobs, "asset_id", "blob")
    return feats.select(
        "asset_id",
        F.col("features")[0].alias("f_width"),
        F.col("features")[1].alias("f_height"),
        F.col("features")[2].alias("f_aspect"),
        F.col("features")[3].alias("f_log2_area"),
    )


@query(
    "q_video_frame_sample",
    oracle="""
    WITH meta AS (
      SELECT doc_id AS asset_id,
             CAST((n_chars % 100) + 10 AS INT) AS n_frames,
             CAST(CASE WHEN n_chars % 2 = 0 THEN 24 ELSE 30 END AS INT) AS fps
      FROM documents WHERE doc_id < 200
    )
    SELECT asset_id,
           CAST((j * n_frames) // 3 AS INT) AS frame_idx,
           round(CAST((j * n_frames) // 3 AS DOUBLE) / fps, 6) AS frame_ts_s
    FROM meta, unnest(generate_series(0, 2)) AS t(j)
    """,
)
def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: synthesize a container header
    per doc (planted frame count + fps), mapInPandas parses it and
    emits 3 uniformly-spaced frame indices with timestamps. Frame
    pixels stay codec-gated (decode_video_frame raises); the oracle
    recomputes the sample plan from the planted metadata."""
    from timestream_travel_spark.functions.multimodal import (
        sample_video_frames,
        synthesize_video,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].astype("int64"),
                    "blob": [
                        synthesize_video((int(n) % 100) + 10, 24 if int(n) % 2 == 0 else 30)
                        for n in pdf["n_chars"]
                    ],
                }
            )

    blobs = d.select("doc_id", "n_chars").mapInPandas(synth, "asset_id long, blob binary")
    return sample_video_frames(blobs, "asset_id", "blob", k=3)
