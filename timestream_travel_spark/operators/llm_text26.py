"""LLM-corpus ops, wave 26 (round 10): the trigram extension of the
Kneser–Ney LM (Kneser & Ney, ICASSP'95; interpolated form of Chen &
Goodman '98 — the r9 verdict's named candidate (c)), the LIX / RIX
readability indices (Björnsson 1968; Anderson, J. Reading Behavior
1983 — the European long-word siblings of ARI/Coleman–Liau), and
Honoré's R / Sichel's S hapax-based vocabulary-richness statistics
(Honoré, ALLC Bull. 1979; Sichel, JRSS-A 1975) beside llm_text23's
Guiraud/Herdan/Yule panel.

Exactness: every count is an exact integer off one tokenize pass;
the three-level KN interpolation is ONE flat double expression of
integer counts and the exactly-representable δ = 0.75, emitted
UNROUNDED (the bigram-KN precedent — round() on computed doubles is
not cross-engine stable at half boundaries); LIX/RIX are flat
integer ratios; Honoré's ln N follows the herdan_c precedent (libm
ln of an exact integer, identical in both engines, round 6).

Scale shape: the KN statistics all reduce to the (w1, w2, w3) count
table first — context totals, continuation counts and the type
total are aggregates OF that table (shuffles move count triples,
never documents), and the count table is lazily checkpointed
because FIVE consumers reference it. LIX/RIX are map-only in-row
HOFs; Honoré/Sichel are two map-side-combined reduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.dedup import normalized_text
from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.operators.llm_text20 import _WS_SQL
from timestream_travel_spark.operators.llm_text23 import (
    _LC_WORDS_SQL,
    _SENT_SQL,
    _sentences,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

KN3_DELTA = 0.75  # absolute discount, exactly representable
KN3_SUPPORT = 10  # (w1, w2) context occurrence floor (trigram
# contexts are ~50x sparser than bigram ones; 10 keeps ~900 contexts
# live at every fixture SF where 50 left zero below sf0.1)
LIX_LONG = 7  # LIX/RIX long-word threshold (chars)


def trigram_counts(d: DataFrame) -> DataFrame:
    """(w1, w2, w3, c) trigram count table over normalized tokens —
    the bigram_counts (llm_text11) shape with one more offset; the
    shuffle moves count triples, never documents."""
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism, "doc_id")
    tokens = F.split(normalized_text("text"), " ")
    # r15 (guide §2.3 "project before the exchange", applied to the
    # Generate): the old posexplode carried the WHOLE token array
    # beside each exploded position (Generate copies its input row per
    # output row → O(tokens²) bytes per document) just to index
    # toks[i+1]/toks[i+2]. arrays_zip of three shifted slices builds
    # the (w1, w2, w3) structs in-array once per document — identical
    # trigram rows, linear bytes. Measured 2x warm / 6x cold on the
    # count-table build at sf0.1.
    n2 = F.greatest(F.size(F.col("toks")) - 2, F.lit(0))
    tri = (
        d.select(tokens.alias("toks"))
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("toks"), 1, n2),
                    F.slice(F.col("toks"), 2, n2),
                    F.slice(F.col("toks"), 3, n2),
                )
            ).alias("t")
        )
        .select(
            F.col("t.0").alias("w1"),
            F.col("t.1").alias("w2"),
            F.col("t.2").alias("w3"),
        )
    )
    return tri.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c"))


@query(
    "q_kneser_ney_trigram",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
               AS tokens
      FROM documents
    ), tgr AS (
      SELECT tokens[i] AS w1, tokens[i + 1] AS w2, tokens[i + 2] AS w3
      FROM toks, unnest(generate_series(1, len(tokens) - 2)) AS t(i)
    ), tg AS MATERIALIZED (
      SELECT w1, w2, w3, COUNT(*) AS c FROM tgr GROUP BY w1, w2, w3
    ), ctx3 AS (
      SELECT w1, w2, SUM(c) AS n3, COUNT(*) AS d3 FROM tg GROUP BY w1, w2
    ), mid AS MATERIALIZED (
      SELECT w2, w3, COUNT(*) AS cm FROM tg GROUP BY w2, w3
    ), midctx AS (
      SELECT w2, SUM(cm) AS nm2, COUNT(*) AS d2m FROM mid GROUP BY w2
    ), cont AS (
      SELECT w3, COUNT(*) AS cw FROM mid GROUP BY w3
    ), types AS (
      SELECT COUNT(*) AS bt FROM mid
    ), scored AS (
      SELECT tg.w1, tg.w2, tg.w3,
             (CAST(tg.c AS DOUBLE) - {KN3_DELTA}) / CAST(ctx3.n3 AS DOUBLE)
               + (({KN3_DELTA} * CAST(ctx3.d3 AS DOUBLE)) / CAST(ctx3.n3 AS DOUBLE))
                 * ((CAST(mid.cm AS DOUBLE) - {KN3_DELTA}) / CAST(midctx.nm2 AS DOUBLE)
                    + (({KN3_DELTA} * CAST(midctx.d2m AS DOUBLE))
                       / CAST(midctx.nm2 AS DOUBLE))
                      * (CAST(cont.cw AS DOUBLE) / CAST(types.bt AS DOUBLE)))
               AS p_kn3,
             row_number() OVER (PARTITION BY tg.w1, tg.w2
                                ORDER BY tg.c DESC, tg.w3) AS rk
      FROM tg
      JOIN ctx3 ON ctx3.w1 = tg.w1 AND ctx3.w2 = tg.w2
      JOIN mid ON mid.w2 = tg.w2 AND mid.w3 = tg.w3
      JOIN midctx ON midctx.w2 = tg.w2
      JOIN cont ON cont.w3 = tg.w3
      CROSS JOIN types
      WHERE ctx3.n3 >= {KN3_SUPPORT}
    )
    SELECT w1, w2, w3, p_kn3, CAST(rk AS INT) AS rk FROM scored WHERE rk <= 3
    """,
)
def q_kneser_ney_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney TRIGRAM probabilities, top-3
    successors per (w1, w2) context with ≥{KN3_SUPPORT} occurrences:

    P(w3|w1w2) = (c₃−δ)/c(w1w2·) + λ(w1w2)·P_cont(w3|w2)
    P_cont(w3|w2) = (N1+(·w2w3)−δ)/N1+(·w2·) + λ'(w2)·N1+(··w3)/N1+(···)

    with λ = δ·N1+(w1w2·)/c(w1w2·) and λ' = δ·N1+(w2·)/N1+(·w2·) —
    all lower-order mass comes from CONTINUATION type counts derived
    from the trigram table (the 'Francisco' correction at both
    levels). Every operand is an exact integer (or δ = 0.75) in one
    identically-parenthesized double expression; p_kn3 is emitted
    unrounded (the bigram precedent)."""
    d = load_table(spark, sf_dir, "documents")
    # five consumers of the trigram count table (ctx3, mid→midctx,
    # mid→cont, the 1-row type total, and the scored join) — lazily
    # checkpointed per the kneser_ney_bigram lesson
    tg = trigram_counts(d).localCheckpoint(eager=False)
    ctx3 = (
        tg.groupBy("w1", "w2")
        .agg(F.sum("c").alias("n3"), F.count("*").alias("d3"))
        .filter(F.col("n3") >= KN3_SUPPORT)
    )
    mid = tg.groupBy("w2", "w3").agg(F.count("*").alias("cm")).localCheckpoint(
        eager=False
    )
    midctx = mid.groupBy("w2").agg(
        F.sum("cm").alias("nm2"), F.count("*").alias("d2m")
    )
    cont = mid.groupBy("w3").agg(F.count("*").alias("cw"))
    types = mid.agg(F.count("*").alias("bt"))  # 1-row broadcast
    delta = F.lit(KN3_DELTA)
    p_low = (F.col("cm").cast("double") - delta) / F.col("nm2").cast("double") + (
        (delta * F.col("d2m").cast("double")) / F.col("nm2").cast("double")
    ) * (F.col("cw").cast("double") / F.col("bt").cast("double"))
    p_kn3 = (F.col("c").cast("double") - delta) / F.col("n3").cast("double") + (
        (delta * F.col("d3").cast("double")) / F.col("n3").cast("double")
    ) * p_low
    scored = (
        tg.join(ctx3, ["w1", "w2"])
        .join(mid, ["w2", "w3"])
        .join(midctx, "w2")
        .join(cont, "w3")
        .crossJoin(F.broadcast(types))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("w1", "w2").orderBy(F.desc("c"), F.asc("w3"))
            ),
        )
        .filter(F.col("rk") <= 3)
    )
    return scored.select(
        "w1", "w2", "w3", p_kn3.alias("p_kn3"), F.col("rk").cast("int").alias("rk")
    )


@query(
    "q_lix_rix",
    oracle=f"""
    WITH per AS (
      SELECT doc_id,
             CAST(len({_WS_SQL}) AS BIGINT) AS n_words,
             CAST(len(list_filter({_WS_SQL}, w -> length(w) >= {LIX_LONG}))
               AS BIGINT) AS n_long,
             CAST({_SENT_SQL} AS BIGINT) AS n_sent
      FROM documents
    )
    SELECT doc_id, n_words, n_long, n_sent,
           round(CAST(n_words AS DOUBLE) / n_sent
                 + 100.0 * CAST(n_long AS DOUBLE) / n_words, 6) AS lix,
           round(CAST(n_long AS DOUBLE) / n_sent, 6) AS rix
    FROM per WHERE n_words > 0
    """,
)
def q_lix_rix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIX = words/sentences + 100·longwords/words and RIX =
    longwords/sentences per document (long word: ≥{LIX_LONG} chars)
    — the European readability pair that needs no syllable proxy at
    all, so every operand is an exact integer census from one in-row
    HOF pass. Two flat ratios, map-only at any scale."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != "")
    per = d.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_words"),
        F.size(F.filter(ws, lambda w: F.length(w) >= LIX_LONG))
        .cast("bigint")
        .alias("n_long"),
        _sentences().cast("bigint").alias("n_sent"),
    )
    return per.filter(F.col("n_words") > 0).select(
        "doc_id",
        "n_words",
        "n_long",
        "n_sent",
        F.round(
            F.col("n_words").cast("double") / F.col("n_sent")
            + F.lit(100.0) * F.col("n_long").cast("double") / F.col("n_words"),
            6,
        ).alias("lix"),
        F.round(F.col("n_long").cast("double") / F.col("n_sent"), 6).alias("rix"),
    )


@query(
    "q_honore_sichel",
    oracle=f"""
    WITH words AS ({_LC_WORDS_SQL}
    ), freq AS (
      SELECT lang, w, COUNT(*) AS m FROM words GROUP BY lang, w
    ), agg AS (
      SELECT lang,
             CAST(SUM(m) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
             CAST(SUM(CASE WHEN m = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2
      FROM freq GROUP BY lang
    )
    SELECT lang, n AS n_tokens, v AS n_types, v1 AS n_hapax, v2 AS n_dis,
           round(100.0 * ln(CAST(n AS DOUBLE))
                 / (1.0 - CAST(v1 AS DOUBLE) / v), 6) AS honore_r,
           round(CAST(v2 AS DOUBLE) / v, 6) AS sichel_s
    FROM agg WHERE v1 < v
    """,
)
def q_honore_sichel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Honoré's R = 100·ln N / (1 − V₁/V) and Sichel's S = V₂/V per
    language — the hapax/dis-legomena richness pair (V₁ once-words,
    V₂ twice-words): R grows as hapaxes dominate (V₁→V ⇒ R→∞, hence
    the V₁<V guard on both engines), S is stable across text lengths.
    One (lang, w) frequency reduce; ln N follows the herdan_c libm
    precedent; both outputs round 6."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("lang", F.explode(doc_words("text")).alias("w")).select(
        "lang", F.lower("w").alias("w")
    )
    freq = words.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("m"))
    agg = freq.groupBy("lang").agg(
        F.sum("m").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.sum(F.when(F.col("m") == 1, 1).otherwise(0)).cast("bigint").alias("v1"),
        F.sum(F.when(F.col("m") == 2, 1).otherwise(0)).cast("bigint").alias("v2"),
    )
    n, v, v1, v2 = F.col("n"), F.col("v"), F.col("v1"), F.col("v2")
    return agg.filter(v1 < v).select(
        "lang",
        n.alias("n_tokens"),
        v.alias("n_types"),
        v1.alias("n_hapax"),
        v2.alias("n_dis"),
        F.round(
            F.lit(100.0)
            * F.log(n.cast("double"))
            / (F.lit(1.0) - v1.cast("double") / v),
            6,
        ).alias("honore_r"),
        F.round(v2.cast("double") / v, 6).alias("sichel_s"),
    )
