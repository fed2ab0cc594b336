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

# Max-df hot-shingle cap (the relief valve q_lcs_contamination
# already carries, LCS_MAX_SHINGLE_DF in llm_text16.py): the
# co-occurrence join fans out Σ_shingle C(df, 2) rows, so ONE
# boilerplate shingle shared by a large fraction of a block is
# quadratic in the corpus. A shingle appearing in more than this
# many documents is boilerplate, not evidence of containment —
# containment is computed over the CAPPED vocabulary on BOTH sides
# (numerator and denominator), so the statistic stays a true
# set-containment of the informative shingles and the oracle can
# express the identical cap. word_shingles is distinct-per-doc, so
# count(*) per shingle IS document frequency.
#
# The effective cap is SCALE-AWARE: max(floor, N_docs // denom). An
# absolute 64-doc cap is inert at the test SFs (max df ≈ 5 at sf0.1)
# but aggressively lossy for containment RECALL on a 10⁹-doc corpus
# — anything quoted in more than 64 documents would vanish from the
# statistic. Growing the cap with the corpus keeps widely-quoted
# informative text visible while still bounding the fan-out at
# C(N/denom, 2) per shingle; the recall/cost trade and the choice of
# denom are documented in SCALING.md §containment-cap. Both knobs
# appear verbatim in the oracle so plan and SQL stay in lockstep.
CONTAIN_MAX_SHINGLE_DF = 64  # absolute floor of the cap
CONTAIN_DF_DENOM = 1000  # cap grows as corpus_docs // this


@query(
    "q_containment_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang, source, {_SHINGLES_SQL} AS shingles
      FROM documents
    ),
    ex AS (
      SELECT doc_id, lang, source, unnest(shingles) AS s FROM sh
    ),
    hot AS (
      SELECT s FROM ex GROUP BY s
      HAVING count(*) > greatest(
        {CONTAIN_MAX_SHINGLE_DF},
        (SELECT count(*) FROM documents) // {CONTAIN_DF_DENOM})
    ),
    kept AS (SELECT ex.* FROM ex ANTI JOIN hot USING (s)),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS DOUBLE) AS i
      FROM kept a JOIN kept b
        ON a.s = b.s AND a.lang = b.lang AND a.source = b.source
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(i / sa.n, 4) AS contain_a_in_b,
           round(i / sb.n, 4) AS contain_b_in_a
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i / sa.n >= {CONTAIN_MIN} OR i / sb.n >= {CONTAIN_MIN}
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
    shingles explode once; shingles over the CONTAIN_MAX_SHINGLE_DF
    document-frequency cap (boilerplate) are dropped by a broadcast
    anti-join BEFORE anything pairs — the hot table is bounded by
    |corpus| / CAP, always broadcastable — then an equi-join on
    (lang, source, shingle) emits one integer row per SHARED kept
    shingle, and |A∩B| is a count aggregation — pairs sharing nothing
    never materialize (their containment is 0 < {CONTAIN_MIN}, so
    skipping them is exact). Containment is over the capped
    vocabulary on both sides (sizes count kept shingles too), so the
    SQL oracle expresses the identical statistic. At 100 TB the
    fan-out is Σ_shingle C(df,2) with df ≤ CAP — at most CAP²/2 rows
    per shingle, linear in the distinct-shingle count, never
    quadratic in a hot shingle's corpus frequency (the same valve as
    q_lcs_contamination's LCS_MAX_SHINGLE_DF).

    |A| is the exploded-row count per doc (word_shingles is
    distinct), broadcast back onto the pair counts — deliberately
    NOT a size() column computed beside the explode: CollapseProject
    would inline the whole shingle expression into the post-Generate
    projection and recompute it from `text` once per exploded row
    (the minhash_candidates lesson, dedup.py)."""
    d = load_table(spark, sf_dir, "documents")
    # persist() the RAW exploded table once: it feeds the hot gate
    # plus (through the lazy anti-join) both join sides and both size
    # lookups. Without the barrier each branch re-runs the
    # regexp/split/transform shingle pipeline over the corpus (the
    # minhash_candidates precedent, dedup.py — measured 8.0 s → 2.6 s
    # at sf0.1). The capped table `ex` is deliberately NOT persisted:
    # re-deriving it is one broadcast anti-join over the cached rows,
    # far cheaper than a second corpus-sized cache materialization.
    # On a cluster the persisted form is small: (ids, block keys,
    # one shingle string) per row.
    raw = d.select(
        "doc_id", "lang", "source",
        F.explode(word_shingles("text")).alias("s"),
    ).persist()
    # hot-shingle gate FIRST (df = count(*) since shingles are
    # distinct-per-doc): map-side-combined scalar agg, then a
    # broadcast anti-join drops boilerplate shingles before sizes or
    # pairs ever see them — the quadratic C(df,2) fan-out is capped
    # at C(CAP,2) per shingle.
    # scale-aware threshold max(floor, N_docs // denom) joined in as
    # a broadcast 1-row scalar — no driver-side count() job, the
    # whole gate stays one declarative plan
    n_docs = d.select(F.count(F.lit(1)).alias("n_docs"))
    hot = (
        raw.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(
            F.col("df")
            > F.greatest(
                F.lit(CONTAIN_MAX_SHINGLE_DF),
                F.floor(F.col("n_docs") / F.lit(CONTAIN_DF_DENOM)),
            )
        )
        .select("s")
    )
    ex = raw.join(F.broadcast(hot), "s", "left_anti")
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
