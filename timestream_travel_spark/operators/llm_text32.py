"""Round-15 STAGED LLM-corpus ops: %DIFF keyness (Gabrielatos &
Marchi 2011 — the normalized-frequency-difference keyness measure
corpus linguists report beside the already-green Dunning LLR and
Monroe log-odds) for the token-richest source against the rest of
the corpus, and the remaining classical lexical-diversity
transformations — Maas a² (Maas 1972, the most length-robust of the
classical indices), Carroll's corrected TTR (CTTR), and Brunet's W
(Brunet 1978) — per language, completing the llm_text23 richness
panel (Guiraud/Herdan/Yule/TTR are green).

Exactness design:
- %DIFF never materializes a frequency-per-million: the score is
  100·(f_s·N_r − f_r·N_s)/(f_r·N_s) — exact integer numerator and
  denominator, ONE flat division; the top-{PD_TOP_K} selection ranks
  on the QUANTIZED round(score, 6) with a word tiebreak (the Monroe
  r13 lesson), and the focus source is chosen deterministically
  (most tokens, ties by name). Words must appear in BOTH sides
  (f_r ≥ {PD_MIN_REST}) — the standard guard against division blowup.
- Maas = (ln N − ln V)/(ln N)², CTTR = V/sqrt(2N), and
  Brunet W = exp(ln N · exp(−0.165·ln V)) are identically-shaped
  double compositions of the exact integer (V, N) — Brunet's
  fractional power is spelled exp/ln at BOTH sites so the engines
  run the same operation sequence.

Scale shape: one explode → (source/lang, word, count) map-side-
combined reduce is the corpus cost (the q_token_frequency class);
keyness joins run on the bounded focus vocabulary; the diversity
panel is a 5-row aggregate.

Reference parity: none — north-star derived capability, sibling of
llm_text23/29/31.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

PD_TOP_K = 20  # keyness rows emitted
PD_MIN_REST = 1  # word must appear in the rest corpus

_SRC_WORDS_SQL = """
      SELECT source,
             lower(unnest(list_filter(
               regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))) AS w
      FROM documents
"""


@query(
    "q_pct_diff_keyness",
    oracle=f"""
    WITH words AS ({_SRC_WORDS_SQL}
    ), sc AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS f
      FROM words GROUP BY source, w
    ), tot AS (
      SELECT source, CAST(SUM(f) AS BIGINT) AS n FROM sc GROUP BY source
    ), focus AS (
      SELECT source AS fs, n AS ns FROM tot
      ORDER BY n DESC, source LIMIT 1
    ), rest AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nr FROM tot, focus
      WHERE source <> fs
    ), fw AS (
      SELECT sc.w, sc.f AS f_s FROM sc, focus WHERE sc.source = fs
    ), rw AS (
      SELECT sc.w, CAST(SUM(sc.f) AS BIGINT) AS f_r
      FROM sc, focus WHERE sc.source <> fs GROUP BY sc.w
    ), scored AS (
      SELECT fw.w AS word, fw.f_s, rw.f_r,
             round(100.0 * (fw.f_s * nr - rw.f_r * ns)
                   / (CAST(rw.f_r AS DOUBLE) * ns), 6) AS pct_diff
      FROM fw JOIN rw ON rw.w = fw.w AND rw.f_r >= {PD_MIN_REST},
           focus, rest
    )
    SELECT (SELECT fs FROM focus) AS focus_source, word, f_s, f_r, pct_diff
    FROM scored
    ORDER BY pct_diff DESC, word LIMIT {PD_TOP_K}
    """,
)
def q_pct_diff_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """%DIFF keyness of the token-richest source vs the rest of the
    corpus: 100·(f_s·N_r − f_r·N_s)/(f_r·N_s) per shared word —
    exact integer cross-multiplication, one flat division, top-{PD_TOP_K}
    on the quantized score with a word tiebreak (module docstring)."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(
            "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w0")
        )
        .filter(F.col("w0") != "")
        .select("source", F.lower("w0").alias("w"))
    )
    sc = words.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    sc = sc.localCheckpoint(eager=True)
    tot = sc.groupBy("source").agg(F.sum("f").cast("bigint").alias("n"))
    focus = (
        tot.orderBy(F.desc("n"), "source")
        .limit(1)
        .select(F.col("source").alias("fs"), F.col("n").alias("ns"))
    )
    rest = (
        tot.crossJoin(F.broadcast(focus))
        .filter(F.col("source") != F.col("fs"))
        .agg(F.sum("n").cast("bigint").alias("nr"))
    )
    fw = (
        sc.crossJoin(F.broadcast(focus))
        .filter(F.col("source") == F.col("fs"))
        .select("w", F.col("f").alias("f_s"), "fs", "ns")
    )
    rw = (
        sc.crossJoin(F.broadcast(focus.select("fs")))
        .filter(F.col("source") != F.col("fs"))
        .groupBy("w")
        .agg(F.sum("f").cast("bigint").alias("f_r"))
        .filter(F.col("f_r") >= PD_MIN_REST)
    )
    scored = (
        fw.join(rw, "w")
        .crossJoin(F.broadcast(rest))
        .select(
            F.col("fs").alias("focus_source"),
            F.col("w").alias("word"),
            "f_s",
            "f_r",
            F.round(
                F.lit(100.0)
                * (F.col("f_s") * F.col("nr") - F.col("f_r") * F.col("ns"))
                / (F.col("f_r").cast("double") * F.col("ns")),
                6,
            ).alias("pct_diff"),
        )
    )
    return scored.orderBy(F.desc("pct_diff"), "word").limit(PD_TOP_K)


@query(
    "q_maas_cttr_brunet",
    oracle="""
    WITH words AS (
      SELECT lang,
             lower(unnest(list_filter(
               regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))) AS w
      FROM documents
    ), freq AS (
      SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS f
      FROM words GROUP BY lang, w
    ), agg AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS v,
             CAST(SUM(f) AS BIGINT) AS n
      FROM freq GROUP BY lang
    )
    SELECT lang, v AS vocab, n AS total_tokens,
           round((ln(CAST(n AS DOUBLE)) - ln(CAST(v AS DOUBLE)))
                 / (ln(CAST(n AS DOUBLE)) * ln(CAST(n AS DOUBLE))), 6)
             AS maas_a2,
           round(CAST(v AS DOUBLE) / sqrt(2.0 * n), 6) AS cttr,
           round(exp(ln(CAST(n AS DOUBLE))
                     * exp(-0.165 * ln(CAST(v AS DOUBLE)))), 6) AS brunet_w
    FROM agg
    """,
)
def q_maas_cttr_brunet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maas a², Carroll's CTTR and Brunet's W per language from the
    exact (vocabulary, token) counts — identically-shaped double
    compositions, Brunet's fractional power spelled exp/ln at both
    sites (module docstring)."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select("lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w0"))
        .filter(F.col("w0") != "")
        .select("lang", F.lower("w0").alias("w"))
    )
    agg = (
        words.groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("v"),
            F.sum("f").cast("bigint").alias("n"),
        )
    )
    v, n = F.col("v").cast("double"), F.col("n").cast("double")
    return agg.select(
        "lang",
        F.col("v").alias("vocab"),
        F.col("n").alias("total_tokens"),
        F.round((F.log(n) - F.log(v)) / (F.log(n) * F.log(n)), 6).alias(
            "maas_a2"
        ),
        F.round(v / F.sqrt(F.lit(2.0) * F.col("n")), 6).alias("cttr"),
        F.round(
            F.exp(F.log(n) * F.exp(F.lit(-0.165) * F.log(v))), 6
        ).alias("brunet_w"),
    )
