"""Dedup, part 4 — round-7 wave: the three dedup interventions the
r6 verdict named as the natural next registry rows.

1. Multi-pass sorted-neighborhood (Hernández & Stolfo, SIGMOD'95 —
   their FULL method: the single-key pass misses duplicates whose
   error falls in the key's prefix, so production SNM runs the same
   window under SEVERAL independent sort keys and unions the pair
   sets).
2. Per-cluster canonicalization stats over the star-CC labels — the
   report a dedup run hands back to the corpus owner (members, kept
   representative, bytes saved, language/source purity).
3. Duplicated-span REMOVAL materialization (Lee et al., ACL'22,
   "Deduplicating Training Data Makes Language Models Better" —
   the ExactSubstr-style intervention): the q_duplicate_spans AUDIT
   (llm_text11.py) only measures; this query emits the corpus with
   every non-canonical duplicated span excised.

Reference parity: the reference engine (cmd/backup.go) has no dedup
surface at all — this is north-star LLM-pipeline capability, same
family as dedup.py/dedup2.py/dedup3.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.dedup import normalized_text
from timestream_travel_spark.operators.dedup3 import (
    _NORM_SQL,
    _SHINGLES_SQL,
    SN_MIN_JACCARD,
    snm_candidate_pairs,
    snm_verified_pairs,
)
from timestream_travel_spark.operators.llm_text11 import SPAN_N
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# second SNM sort key: the WORD-reversed normalized text — catches
# suffix-preserving edits the prefix-sorted pass misses; word-level
# (not character-level) reversal keeps the key well-defined on
# multi-byte text in both engines
_REV_SQL = (
    f"array_to_string(list_reverse(regexp_split_to_array({_NORM_SQL}, ' ')), ' ')"
)

_SNM_MP_ORACLE = f"""
WITH r1 AS (
  SELECT doc_id,
         lead(doc_id, 1) OVER w AS l1,
         lead(doc_id, 2) OVER w AS l2,
         lead(doc_id, 3) OVER w AS l3
  FROM documents
  WINDOW w AS (PARTITION BY lang ORDER BY {_NORM_SQL}, doc_id)
), r2 AS (
  SELECT doc_id,
         lead(doc_id, 1) OVER w AS l1,
         lead(doc_id, 2) OVER w AS l2,
         lead(doc_id, 3) OVER w AS l3
  FROM documents
  WINDOW w AS (PARTITION BY lang ORDER BY {_REV_SQL}, doc_id)
), cand AS (
  SELECT doc_id AS id_a, unnest([l1, l2, l3]) AS id_b FROM r1
  UNION ALL
  SELECT doc_id AS id_a, unnest([l1, l2, l3]) AS id_b FROM r2
), sh AS (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM documents
)
SELECT DISTINCT least(c.id_a, c.id_b) AS doc_a,
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


@query("q_snm_multipass_pairs", oracle=_SNM_MP_ORACLE)
def q_snm_multipass_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass sorted-neighborhood near-dup pairs: pass 1 sorts
    per-lang on the normalized text, pass 2 on its WORD-REVERSED
    twin; each pass pairs a doc with its SN_WINDOW-1 successors, the
    union is Jaccard-verified once, and the pair set is DISTINCT
    (a pair found by both passes carries the identical rounded
    jaccard, so row-level distinct dedups it exactly).

    Plan: two snm_candidate_pairs passes (each range-bucketed — the
    corpus window partitions by (lang, bucket), never one task per
    lang; see dedup3.snm_candidate_pairs), union, one JVM-side
    array_intersect verify, one distinct exchange on the verified
    (small) pair set. Each pass re-derives shingles after its own
    (lang, bucket) repartition: recomputing the projection post-
    exchange spreads the CPU-heavy regexp work across the cluster,
    where sharing one shingled scan would either cache corpus-sized
    state or ship the arrays through both passes' shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    rev_key = lambda c: F.array_join(  # noqa: E731
        F.reverse(F.split(normalized_text(c), " ")), " "
    )
    cand = snm_candidate_pairs(spark, docs, lambda c: normalized_text(c)).unionByName(
        snm_candidate_pairs(spark, docs, rev_key)
    )
    return snm_verified_pairs(cand).distinct()


# recursive-CTE reachability over a `sym(a, b)` edge CTE → `cc(node,
# cluster)` min-label components; exposed standalone so every
# CC-consuming oracle (this module's stats, dedup5's medoid) walks
# the identical reachability SQL
_REACH_CC_SQL = """reach AS (
      WITH RECURSIVE walk(node, seen) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.b, w.seen FROM walk w JOIN sym s ON s.a = w.node
      )
      SELECT * FROM walk
    ), cc AS (
      SELECT node, MIN(seen) AS cluster FROM reach GROUP BY node
    )"""

# shingle definition interpolated from dedup3._SHINGLES_SQL (the
# single source of truth also used by the SNM oracles) so a future
# change to the 3-word-shingle expression cannot desynchronize the
# CC oracle from the candidate-generation oracles
_CC_SQL = f"""
    sh AS (
      SELECT doc_id, {_SHINGLES_SQL} AS shingles
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5
    ), sym AS (
      SELECT src AS a, dst AS b FROM pairs
      UNION
      SELECT dst, src FROM pairs
    ), {_REACH_CC_SQL}
"""


@query(
    "q_cluster_canonical_stats",
    oracle=f"""
    WITH {_CC_SQL},
    lab AS (
      SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster,
             d.n_chars, d.lang, d.source
      FROM documents d LEFT JOIN cc c ON d.doc_id = c.node
    ), ranked AS (
      SELECT cluster, doc_id, n_chars, lang, source,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM lab
    )
    SELECT cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MAX(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc,
           CAST(MAX(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS kept_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) - MAX(CASE WHEN rn = 1 THEN n_chars END)
                AS BIGINT) AS chars_saved,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM ranked GROUP BY cluster HAVING COUNT(*) >= 2
    """,
)
def q_cluster_canonical_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization report per near-dup cluster (clusters = star
    CC over the LSH-verified >=0.5-Jaccard pairs, the q_dedup_clusters
    labels; singletons excluded — they canonicalize to themselves):
    member count, the kept representative under the keep-the-longest
    policy (n_chars desc, doc_id tiebreak — same as
    q_dedup_keep_best), the bytes the dedup saves (total minus kept),
    and language/source purity counts — mixed-language clusters are
    the classic false-merge smell a dedup report must surface.

    Plan: CC runs the large-star/small-star engine (logarithmic
    rounds, dedup2.py); the corpus joins the (small) label table
    once, the kept-representative argmax is one window pass
    partitioned by cluster (cluster cardinality scales with the
    corpus — no single-task window), and the stats are one
    map-side-combined groupBy. Oracle: recursive-CTE reachability
    over the EXHAUSTIVE all-pairs >=0.5-Jaccard edge set, while the
    Spark side's edges come from probabilistic MinHash-LSH — the
    same recall argument as dedup.q_lsh_verified_jaccard applies and
    matters MORE here: a single missed edge splits a cluster and
    corrupts n_members/chars_saved for every row of that cluster.
    Equality holds because the fixture's duplicate pairs sit at
    j ≈ 0.97 where 8-band/3-row recall is 1 − (1 − 0.97³)⁸ ≈
    1 − 3·10⁻⁹, and no fixture pair lands in the (0.067, 0.9) band
    where recall could flake (measured at sf0.001/0.01/0.1)."""
    from timestream_travel_spark.operators.dedup import lsh_verified_pairs_cached
    from timestream_travel_spark.operators.dedup2 import connected_components_star

    d = load_table(spark, sf_dir, "documents")
    edges = lsh_verified_pairs_cached(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    cc = connected_components_star(edges)
    lab = d.join(cc, d.doc_id == cc.node, "left").select(
        "doc_id",
        F.coalesce("cluster", "doc_id").alias("cluster"),
        "n_chars",
        "lang",
        "source",
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("n_chars"), "doc_id")
    ranked = lab.withColumn("rn", F.row_number().over(w))
    kept_chars = F.max(F.when(F.col("rn") == 1, F.col("n_chars")))
    return (
        ranked.groupBy("cluster")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("kept_doc"),
            kept_chars.cast("bigint").alias("kept_chars"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            (F.sum("n_chars") - kept_chars).cast("bigint").alias("chars_saved"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
        .filter(F.col("n_members") >= 2)
    )


@query(
    "q_duplicate_span_removal",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
               AS toks
      FROM documents
    ), spans AS (
      SELECT doc_id, i, array_to_string(toks[i : i + {SPAN_N} - 1], ' ') AS span
      FROM toks, unnest(generate_series(1, len(toks) - {SPAN_N} + 1)) AS t(i)
    ), df AS (
      SELECT span, COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS keeper
      FROM spans GROUP BY span
    ), rem AS (
      SELECT DISTINCT s.doc_id, s.i + o AS pos
      FROM spans s
      JOIN df ON df.span = s.span,
           unnest(generate_series(0, {SPAN_N} - 1)) AS oo(o)
      WHERE df.n_docs >= 2 AND s.doc_id <> df.keeper
    ), tok_rows AS (
      SELECT doc_id, toks[i] AS tok, i AS pos
      FROM toks, unnest(generate_series(1, len(toks))) AS t(i)
    )
    SELECT tr.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(COUNT(r.pos) AS BIGINT) AS n_removed,
           md5(COALESCE(string_agg(tr.tok, ' ' ORDER BY tr.pos)
                          FILTER (WHERE r.pos IS NULL), '')) AS cleaned_md5
    FROM tok_rows tr
    LEFT JOIN rem r ON r.doc_id = tr.doc_id AND r.pos = tr.pos
    GROUP BY tr.doc_id
    """,
)
def q_duplicate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span REMOVAL (the Lee et al. ACL'22 intervention
    q_duplicate_spans only audits): every {SPAN_N}-token span whose
    document frequency is >= 2 keeps its occurrences only in the
    CANONICAL document (min doc_id containing the span); in every
    other document the span's token positions are excised and the
    survivors re-join in order. Output per doc: token counts before/
    after and the md5 of the cleaned text (the hash keeps the
    registry row compact while pinning the exact materialized
    corpus).

    Plan: positional spans (one row per (doc, start) — linear in
    corpus tokens, not quadratic: unlike pair-based dedup there is
    NO doc×doc join anywhere), span-df agg with min-doc keeper,
    candidate starts explode into at most {SPAN_N}× covered
    positions, a distinct collapses overlaps, and the per-doc
    position set rides back as one collect_set array so the excision
    runs as a JVM-side array filter — no per-token shuffle on the
    output side. Docs shorter than {SPAN_N} tokens skip the span
    pass entirely and come back verbatim via the left join. At
    100 TB the span table is the big intermediate, exactly as in the
    audit; a max-df cap on pathological boilerplate spans bounds the
    keeper join the same way llm_text16's hot-shingle cap does (here
    the explode is df-LINEAR — each occurrence emits its own
    {SPAN_N} positions, never pairs — so the cap is a size knob, not
    a correctness guard)."""
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    toks = d.select("doc_id", F.split(normalized_text("text"), " ").alias("toks"))
    spans = (
        toks.filter(F.size("toks") >= SPAN_N)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - (SPAN_N - 1)),
                    lambda i: F.struct(
                        i.alias("i"),
                        F.array_join(F.slice("toks", i, SPAN_N), " ").alias("span"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.i").alias("i"), F.col("s.span").alias("span"))
    )
    df_tbl = spans.groupBy("span").agg(
        F.countDistinct("doc_id").alias("n_docs"), F.min("doc_id").alias("keeper")
    )
    rem = (
        spans.join(df_tbl, "span")
        .filter((F.col("n_docs") >= 2) & (F.col("doc_id") != F.col("keeper")))
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + (SPAN_N - 1))).alias("pos"),
        )
        .distinct()
    )
    rem_agg = rem.groupBy("doc_id").agg(F.collect_set("pos").alias("rpos"))
    joined = toks.join(rem_agg, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce("rpos", F.array().cast("array<int>")).alias("rpos"),
    )
    kept = F.filter(
        F.col("toks"), lambda x, i: ~F.array_contains(F.col("rpos"), i + F.lit(1))
    )
    return joined.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tok"),
        (F.size("toks") - F.size(kept)).cast("bigint").alias("n_removed"),
        F.md5(F.array_join(kept, " ")).alias("cleaned_md5"),
    )
