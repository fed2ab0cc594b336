"""Text-analysis operators for LLM training-data pipelines
(SURVEY.md §2 B.11 + north-star NS ops): text stats, token counting,
quality scoring, language-ID heuristic, document fingerprinting,
token frequency.

All hot paths are built-in expression trees (regexp/split/length) —
whole-stage-codegen'd JVM code, no Python per row. That is the
difference between hours and days on 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.ops import davg, davg_sql
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# BPE-ish pre-tokenizer: word pieces or single non-space symbols.
TOKEN_RE = r"\w+|[^\w\s]"


def word_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(F.trim(c), r"\s+"))


def token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), 0))


@query(
    "q_text_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           {davg_sql('CAST(n_chars AS DOUBLE)', 'avg_chars')},
           CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_words,
           CAST(SUM(len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats per language: doc counts, avg length, whitespace
    word counts, BPE-ish token counts — all JVM-side regexes."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        davg(F.col("n_chars").cast("double"), "avg_chars"),
        F.sum(word_count("text").cast("bigint")).alias("total_words"),
        F.sum(token_count("text").cast("bigint")).alias("total_tokens"),
    )


@query(
    "q_token_frequency",
    oracle="""
    SELECT word, n FROM (
      SELECT lower(w) AS word, COUNT(*) AS n
      FROM documents, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t(w)
      GROUP BY lower(w)
    ) g
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def q_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 word frequency: explode + two-phase aggregate —
    the shuffle carries only (word, partial-count) pairs thanks to
    map-side combine."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .select(F.lower("w").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


def quality_score(text: Column) -> Column:
    """Heuristic quality score in [0,1]: length band + punctuation
    ratio + stopword presence. Deterministic, SQL-expressible (the
    oracle mirrors it term by term)."""
    n_chars = F.length(text).cast("double")
    n_words = word_count(text).cast("double")
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0)).cast("double")
    n_stop = F.size(F.regexp_extract_all(F.lower(text), F.lit(r"\b(the|a|and|of|to|in)\b"), 0)).cast("double")
    len_ok = F.when((n_chars >= 100) & (n_chars <= 1000), 1.0).otherwise(0.0)
    punct_ok = F.when((n_punct / n_chars) < 0.1, 1.0).otherwise(0.0)
    stop_ok = F.when((n_stop / n_words) > 0.05, 1.0).otherwise(0.0)
    return (len_ok + punct_ok + stop_ok) / 3.0


@query(
    "q_quality_score",
    oracle="""
    SELECT lang,
           round(CAST(SUM(CAST(score AS DECIMAL(12,6))) AS DOUBLE) / COUNT(*), 6) AS avg_quality
    FROM (
      SELECT lang,
        (CASE WHEN length(text) >= 100 AND length(text) <= 1000 THEN 1.0 ELSE 0.0 END
         + CASE WHEN CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
                     / length(text) < 0.1 THEN 1.0 ELSE 0.0 END
         + CASE WHEN CAST(len(regexp_extract_all(lower(text), '\\b(the|a|and|of|to|in)\\b')) AS DOUBLE)
                     / len(regexp_split_to_array(trim(text), '\\s+')) > 0.05 THEN 1.0 ELSE 0.0 END
        ) / 3.0 AS score
      FROM documents
    ) t GROUP BY lang
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average document-quality score per language."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select("lang", quality_score(F.col("text")).alias("score"))
    return scored.groupBy("lang").agg(
        F.round(F.sum(F.col("score").cast("decimal(12,6)")).cast("double") / F.count("*"), 6).alias(
            "avg_quality"
        )
    )


# Marker words per language for the n-gram/stopword language-ID
# heuristic. The fixture text is synthetic English-ish OLAP prose, so
# the detector's value here is determinism, not linguistic accuracy.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "zh": ["的", "是", "了"],
}


def _marker_score(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def detect_language(text: Column) -> Column:
    """Argmax over per-language marker-word counts, ties broken by a
    fixed language priority (en > es > de > fr > zh, then 'und' when
    every score is 0)."""
    scores = {lang: _marker_score(text, words) for lang, words in LANG_MARKERS.items()}
    result = F.lit("und")
    best = F.lit(0)
    for lang in reversed(["en", "es", "de", "fr", "zh"]):
        s = scores[lang]
        result = F.when(s >= best, F.lit(lang)).otherwise(result)
        best = F.when(s >= best, s).otherwise(best)
    # A zero score everywhere must stay 'und'
    any_pos = None
    for s in scores.values():
        any_pos = s > 0 if any_pos is None else (any_pos | (s > 0))
    return F.when(any_pos, result).otherwise(F.lit("und"))


@query(
    "q_lang_id",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
        len(regexp_extract_all(lower(text), '\\b(the|and|of)\\b')) AS s_en,
        len(regexp_extract_all(lower(text), '\\b(el|la|de)\\b'))   AS s_es,
        len(regexp_extract_all(lower(text), '\\b(der|die|und)\\b')) AS s_de,
        len(regexp_extract_all(lower(text), '\\b(le|la|et)\\b'))   AS s_fr,
        len(regexp_extract_all(lower(text), '\\b(的|是|了)\\b'))    AS s_zh
      FROM documents
    ), labeled AS (
      SELECT lang,
        CASE
          WHEN s_en = 0 AND s_es = 0 AND s_de = 0 AND s_fr = 0 AND s_zh = 0 THEN 'und'
          WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
          WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
          WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
          WHEN s_fr >= s_zh THEN 'fr'
          ELSE 'zh' END AS predicted
      FROM scored
    )
    SELECT lang, predicted, COUNT(*) AS n_docs
    FROM labeled GROUP BY lang, predicted
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion counts: labeled lang × predicted lang."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", detect_language(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "q_doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents WHERE doc_id < 200
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint: whitespace-collapsed lowercase
    md5 — the exact-dedup key that survives formatting noise."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("fingerprint"),
    )


@query(
    "q_binary_meta",
    oracle="""
    SELECT lang,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           COUNT(*) AS n_blobs
    FROM documents GROUP BY lang
    """,
)
def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing (multimodal model, SURVEY B.11 /
    north star): documents' text treated as utf-8 blobs with typed
    metadata. The real decode path lives in functions/multimodal.py."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "utf-8")
    return d.select("lang", blob.alias("blob")).groupBy("lang").agg(
        F.sum(F.octet_length("blob")).alias("total_bytes"), F.count("*").alias("n_blobs")
    )


@query(
    "q_image_header_dims",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST((n_chars % 640) + 1 AS INT) AS width,
           CAST((n_chars % 480) + 1 AS INT) AS height,
           'decoded_header:png' AS status
    FROM documents WHERE doc_id < 200
    """,
)
def q_image_header_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image-metadata extraction end-to-end: synthesize a valid
    PNG header per document (geometry derived from n_chars),
    Arrow-batch it through extract_asset_metadata's mapInPandas, and
    return the dimensions the PURE-PYTHON header parser recovered
    (functions/multimodal.py parse_image_dims — PNG IHDR struct read,
    public spec). The oracle recomputes the planted geometry in SQL;
    a hash match proves the parse is real, not the fake fallback."""
    from timestream_travel_spark.functions.multimodal import (
        extract_asset_metadata,
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
    meta = extract_asset_metadata(blobs, "asset_id", "blob", "image/png")
    return meta.select("asset_id", "width", "height", "status")
