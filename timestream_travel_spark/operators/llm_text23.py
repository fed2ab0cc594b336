"""LLM-corpus ops, wave 23 (round 9): readability and lexical-
richness panels — the classical document-quality signals corpus
curation pipelines report beside the Gopher rules. Readability:
Automated Readability Index (Senter & Smith 1967), Coleman–Liau
(1975), Flesch Reading Ease (Flesch 1948) and Gunning fog (Gunning
1952) with the standard vowel-group syllable proxy. Richness: Yule's
characteristic K (Yule, *Statistical Study of Literary Vocabulary*,
1944), Simpson's lexical D, Guiraud's R / Herdan's C (1954/1960),
lexical density (content-word fraction), a per-source punctuation
profile, and per-language character-trigram entropy.

Exactness design: every count (words, chars, sentences, vowel
groups, punctuation classes, n-gram frequencies) is exact INTEGER
from one explode/HOF pass; each published formula is ONE flat double
expression with its magic constants written as identical literals in
both engines; entropy uses H = log2 N − (Σ c·log2 c)/N with each
transcendental term DECIMAL-quantized before the exact associative
sum (the q_unigram_logprob idiom).

Scale shape: all per-doc work is in-row higher-order functions over
the token array (map-only); the per-lang/per-source statistics are
map-side-combined reduces; the trigram explode is the corpus cost
class already accepted for shingle passes, reduced immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.llm_text4 import _SW_SQL, STOPWORDS
from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.operators.llm_text20 import _WS_SQL
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

_SENT_SQL = "greatest(len(regexp_extract_all(text, '[.!?]+')), 1)"
_CHARS_SQL = "list_sum(list_transform(ws, w -> length(w)))"


def _sentences():
    return F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)), F.lit(1)
    )


def _chars(ws):
    return F.aggregate(
        F.transform(ws, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )


@query(
    "q_readability_ari_cl",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_WS_SQL} AS ws, text FROM documents
    ), per AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST({_CHARS_SQL} AS BIGINT) AS n_chars,
             CAST({_SENT_SQL} AS BIGINT) AS n_sentences
      FROM d WHERE len(ws) > 0
    )
    , rat AS (
      SELECT doc_id, n_words, n_chars, n_sentences,
             471 * n_chars * n_sentences + 50 * n_words * n_words
               - 2143 * n_words * n_sentences AS na,
             100 * n_words * n_sentences AS da,
             588 * n_chars - 2960 * n_sentences - 1580 * n_words AS nc,
             100 * n_words AS dc
      FROM per
    )
    SELECT doc_id, n_words, n_chars, n_sentences,
           (CASE WHEN na < 0 THEN -((2 * abs(na) * 10000 + da) // (2 * da))
                 ELSE (2 * na * 10000 + da) // (2 * da) END) / 10000.0 AS ari,
           (CASE WHEN nc < 0 THEN -((2 * abs(nc) * 10000 + dc) // (2 * dc))
                 ELSE (2 * nc * 10000 + dc) // (2 * dc) END) / 10000.0
             AS coleman_liau
    FROM rat
    """,
)
def q_readability_ari_cl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automated Readability Index and Coleman–Liau grade per
    document — the two readability formulas that need NO syllable
    model (characters/words/sentences only, so the counts are exact):
    ARI = 4.71·C/W + 0.5·W/S − 21.43; CL = 0.0588·L − 0.296·S′ −
    15.8 with L, S′ per-100-word rates. Sentences count [.!?]+ runs
    (min 1 — headline-style docs). One in-row pass per doc."""
    d = load_table(spark, sf_dir, "documents")
    ws = doc_words("text")
    per = d.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_words"),
        _chars(ws).cast("bigint").alias("n_chars"),
        _sentences().cast("bigint").alias("n_sentences"),
    ).filter(F.col("n_words") > 0)
    w, c, s = F.col("n_words"), F.col("n_chars"), F.col("n_sentences")
    # Both formulas are exact integer rationals N/D, and a rational
    # CAN land exactly on a .00005 rounding boundary (measured:
    # 22113/2400 = 9.21375) — where Spark's shortest-repr HALF_UP and
    # DuckDB's binary-value round disagree. So the 4-decimal HALF_UP
    # happens in INTEGER arithmetic ((2·|N|·10⁴ + D) DIV 2D, signed),
    # and the single float op is the final /10⁴ of identical ints.
    rat = per.select(
        "doc_id",
        "n_words",
        "n_chars",
        "n_sentences",
        (471 * c * s + 50 * w * w - 2143 * w * s).alias("na"),
        (100 * w * s).alias("da"),
        (588 * c - 2960 * s - 1580 * w).alias("nc"),
        (100 * w).alias("dc"),
    )

    def half_up(n, d):
        k = F.expr(f"(2 * abs({n}) * 10000 + {d}) DIV (2 * {d})")
        return F.when(F.col(n) < 0, -k).otherwise(k) / 10000.0

    return rat.select(
        "doc_id",
        "n_words",
        "n_chars",
        "n_sentences",
        half_up("na", "da").alias("ari"),
        half_up("nc", "dc").alias("coleman_liau"),
    )


@query(
    "q_readability_flesch_fog",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_WS_SQL} AS ws, text FROM documents
    ), per AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST({_SENT_SQL} AS BIGINT) AS n_sentences,
             CAST(list_sum(list_transform(ws,
                 w -> greatest(len(regexp_extract_all(lower(w), '[aeiouy]+')), 1)))
               AS BIGINT) AS n_syllables,
             CAST(len(list_filter(ws,
                 w -> len(regexp_extract_all(lower(w), '[aeiouy]+')) >= 3))
               AS BIGINT) AS n_complex
      FROM d WHERE len(ws) > 0
    )
    SELECT doc_id, n_words, n_sentences, n_syllables, n_complex,
           round(206.835 - 1.015 * CAST(n_words AS DOUBLE) / n_sentences
                 - 84.6 * CAST(n_syllables AS DOUBLE) / n_words, 4)
             AS flesch_ease,
           round(0.4 * (CAST(n_words AS DOUBLE) / n_sentences
                        + 100.0 * n_complex / n_words), 4) AS gunning_fog
    FROM per
    """,
)
def q_readability_flesch_fog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch Reading Ease and Gunning fog per document with the
    standard vowel-GROUP syllable proxy (a maximal [aeiouy]+ run ≈
    one syllable, min 1/word; complex word = ≥3 groups): FRE =
    206.835 − 1.015·W/S − 84.6·Syl/W; fog = 0.4·(W/S + 100·Cx/W).
    The proxy is deterministic and identical in both engines (same
    regex, same lower()), so the counts are exact integers."""
    d = load_table(spark, sf_dir, "documents")
    ws = doc_words("text")
    groups = lambda w: F.size(  # noqa: E731
        F.regexp_extract_all(F.lower(w), F.lit("[aeiouy]+"), 0)
    )
    per = d.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_words"),
        _sentences().cast("bigint").alias("n_sentences"),
        F.aggregate(
            F.transform(ws, lambda w: F.greatest(groups(w), F.lit(1))),
            F.lit(0),
            lambda a, x: a + x,
        )
        .cast("bigint")
        .alias("n_syllables"),
        F.size(F.filter(ws, lambda w: groups(w) >= 3)).cast("bigint").alias(
            "n_complex"
        ),
    ).filter(F.col("n_words") > 0)
    w, s = F.col("n_words"), F.col("n_sentences")
    syl, cx = F.col("n_syllables"), F.col("n_complex")
    return per.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        "n_complex",
        F.round(
            206.835 - 1.015 * w.cast("double") / s - 84.6 * syl.cast("double") / w, 4
        ).alias("flesch_ease"),
        F.round(0.4 * (w.cast("double") / s + 100.0 * cx / w), 4).alias(
            "gunning_fog"
        ),
    )


_LC_WORDS_SQL = """
      SELECT lang,
             lower(unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                      x -> x <> ''))) AS w
      FROM documents
"""


@query(
    "q_yules_k",
    oracle=f"""
    WITH words AS ({_LC_WORDS_SQL}
    ), wc AS (
      SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS m FROM words GROUP BY lang, w
    ), spectrum AS (
      SELECT lang, m, CAST(COUNT(*) AS BIGINT) AS vm FROM wc GROUP BY lang, m
    ), agg AS (
      SELECT lang,
             CAST(SUM(m * vm) AS BIGINT) AS n,
             CAST(SUM(m * m * vm) AS BIGINT) AS s2
      FROM spectrum GROUP BY lang
    )
    SELECT lang, n AS n_tokens,
           round(10000.0 * (s2 - n) / (CAST(n AS DOUBLE) * n), 6) AS yules_k
    FROM agg
    """,
)
def q_yules_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per language: K = 10⁴·(Σm²V_m − N)/N²
    over the frequency spectrum (V_m = word types occurring m times)
    — the repeat-rate constant that is length-invariant where raw TTR
    is not. Two integer reduces (word counts → spectrum), one flat
    division."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("lang", F.explode(doc_words("text")).alias("w")).select(
        "lang", F.lower("w").alias("w")
    )
    wc = words.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("m"))
    spectrum = wc.groupBy("lang", "m").agg(F.count(F.lit(1)).alias("vm"))
    agg = spectrum.groupBy("lang").agg(
        F.sum(F.col("m") * F.col("vm")).cast("bigint").alias("n"),
        F.sum(F.col("m") * F.col("m") * F.col("vm")).cast("bigint").alias("s2"),
    )
    return agg.select(
        "lang",
        F.col("n").alias("n_tokens"),
        F.round(
            10000.0 * (F.col("s2") - F.col("n"))
            / (F.col("n").cast("double") * F.col("n")),
            6,
        ).alias("yules_k"),
    )


@query(
    "q_lexical_richness",
    oracle=f"""
    WITH words AS ({_LC_WORDS_SQL}
    ), agg AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT w) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN list_contains({_SW_SQL}, w) THEN 0 ELSE 1 END)
               AS BIGINT) AS content
      FROM words GROUP BY lang
    ), pairs AS (
      SELECT lang, CAST(SUM(m * (m - 1)) AS BIGINT) AS rep
      FROM (SELECT lang, w, COUNT(*) AS m FROM words GROUP BY lang, w)
      GROUP BY lang
    )
    SELECT a.lang, a.n AS n_tokens, a.v AS n_types,
           round(CAST(a.v AS DOUBLE) / sqrt(CAST(a.n AS DOUBLE)), 6)
             AS guiraud_r,
           round(ln(CAST(a.v AS DOUBLE)) / ln(CAST(a.n AS DOUBLE)), 6)
             AS herdan_c,
           round(CAST(p.rep AS DOUBLE)
                 / (CAST(a.n AS DOUBLE) * (a.n - 1)), 8) AS simpson_d,
           round(CAST(a.content AS DOUBLE) / a.n, 6) AS lexical_density
    FROM agg a JOIN pairs p ON p.lang = a.lang
    """,
)
def q_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language lexical-richness panel: Guiraud's R = V/√N,
    Herdan's C = ln V / ln N (the length-robust TTR transforms),
    Simpson's lexical D = Σm(m−1)/(N(N−1)) (repeat probability), and
    lexical density (non-stopword token fraction). All counts exact
    integers off one token reduce; four flat expressions."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("lang", F.explode(doc_words("text")).alias("w")).select(
        "lang", F.lower("w").alias("w")
    )
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    agg = words.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("w").cast("bigint").alias("v"),
        F.sum(F.when(F.array_contains(sw, F.col("w")), 0).otherwise(1))
        .cast("bigint")
        .alias("content"),
    )
    wc = words.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("m"))
    pairs = wc.groupBy("lang").agg(
        F.sum(F.col("m") * (F.col("m") - 1)).cast("bigint").alias("rep")
    )
    n, v = F.col("n"), F.col("v")
    return agg.join(pairs, "lang").select(
        "lang",
        n.alias("n_tokens"),
        v.alias("n_types"),
        F.round(v.cast("double") / F.sqrt(n.cast("double")), 6).alias("guiraud_r"),
        F.round(F.log(v.cast("double")) / F.log(n.cast("double")), 6).alias(
            "herdan_c"
        ),
        F.round(F.col("rep").cast("double") / (n.cast("double") * (n - 1)), 8).alias(
            "simpson_d"
        ),
        F.round(F.col("content").cast("double") / n, 6).alias("lexical_density"),
    )


@query(
    "q_punctuation_profile",
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(SUM(length(text)) AS BIGINT) AS n_chars,
             CAST(SUM(len(regexp_extract_all(text, '\\.'))) AS BIGINT) AS periods,
             CAST(SUM(len(regexp_extract_all(text, ','))) AS BIGINT) AS commas,
             CAST(SUM(len(regexp_extract_all(text, '[?!]'))) AS BIGINT) AS exclaim_q,
             CAST(SUM(len(regexp_extract_all(text, '[0-9]'))) AS BIGINT) AS digits
      FROM documents GROUP BY source
    )
    SELECT source, n_chars,
           round(1000.0 * periods / n_chars, 4) AS periods_per_1k,
           round(1000.0 * commas / n_chars, 4) AS commas_per_1k,
           round(1000.0 * exclaim_q / n_chars, 4) AS exclaim_q_per_1k,
           round(1000.0 * digits / n_chars, 4) AS digits_per_1k
    FROM per
    """,
)
def q_punctuation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source punctuation/digit profile (rates per 1000 chars):
    period, comma, terminal-emphasis ([?!]) and digit densities — the
    cheap formatting fingerprint curation dashboards track per crawl
    source. Exact integer counts off one scan; four flat rates."""
    d = load_table(spark, sf_dir, "documents")
    cnt = lambda pat: F.size(  # noqa: E731
        F.regexp_extract_all(F.col("text"), F.lit(pat), 0)
    )
    per = d.groupBy("source").agg(
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        F.sum(cnt(r"\.")).cast("bigint").alias("periods"),
        F.sum(cnt(",")).cast("bigint").alias("commas"),
        F.sum(cnt("[?!]")).cast("bigint").alias("exclaim_q"),
        F.sum(cnt("[0-9]")).cast("bigint").alias("digits"),
    )
    n = F.col("n_chars")
    return per.select(
        "source",
        "n_chars",
        F.round(1000.0 * F.col("periods") / n, 4).alias("periods_per_1k"),
        F.round(1000.0 * F.col("commas") / n, 4).alias("commas_per_1k"),
        F.round(1000.0 * F.col("exclaim_q") / n, 4).alias("exclaim_q_per_1k"),
        F.round(1000.0 * F.col("digits") / n, 4).alias("digits_per_1k"),
    )


@query(
    "q_char_trigram_entropy",
    oracle="""
    WITH norm AS (
      SELECT lang, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
      FROM documents
    ), tri AS (
      SELECT lang, substr(t, i, 3) AS g
      FROM norm, unnest(generate_series(1, length(t) - 2)) AS s(i)
      WHERE length(t) >= 3
    ), gc AS (
      SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS c FROM tri GROUP BY lang, g
    ), agg AS (
      SELECT lang,
             CAST(SUM(c) AS BIGINT) AS n,
             SUM(CAST(c * log2(CAST(c AS DOUBLE)) AS DECIMAL(24,8))) AS slog
      FROM gc GROUP BY lang
    )
    SELECT lang, n AS n_trigrams,
           round(log2(CAST(n AS DOUBLE))
                 - CAST(CAST(slog AS VARCHAR) AS DOUBLE) / n, 6)
             AS trigram_entropy_bits
    FROM agg
    """,
)
def q_char_trigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram entropy per language (bits): H = log2 N −
    (Σ c·log2 c)/N over the trigram frequency table of the
    whitespace-normalized lowercased text — the language-ID /
    gibberish signal (natural language sits in a narrow band; key
    mash and boilerplate fall outside). Each c·log2 c term quantizes
    to DECIMAL before the exact sum (order-independent); one flat
    expression per language."""
    from timestream_travel_spark.tables import spread

    # r15: single-row-group scan serializes the ~per-char trigram
    # explode onto one core — spread first (size-gated; results are a
    # count aggregation, order-independent)
    d = spread(load_table(spark, sf_dir, "documents"))
    t = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    norm = d.select("lang", t.alias("t")).filter(F.length("t") >= 3)
    # substr with a per-element start position — SQL expr form (the
    # python F.substring signature takes only literal positions)
    gc = (
        norm.select(
            "lang",
            F.explode(
                F.expr("transform(sequence(1, length(t) - 2), i -> substr(t, i, 3))")
            ).alias("g"),
        )
        .groupBy("lang", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    term = (F.col("c") * F.log2(F.col("c").cast("double"))).cast("decimal(24,8)")
    agg = gc.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n"), F.sum(term).alias("slog")
    )
    return agg.select(
        "lang",
        F.col("n").alias("n_trigrams"),
        F.round(
            F.log2(F.col("n").cast("double"))
            - F.col("slog").cast("double") / F.col("n"),
            6,
        ).alias("trigram_entropy_bits"),
    )
