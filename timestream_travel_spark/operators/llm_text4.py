"""Text analysis, part 4: stopword-filtered corpus build, corpus
bigram statistics, and vocabulary richness (type-token ratio) — the
remaining standard text-pipeline accounting ops.

Scale notes: everything is built-in split/transform/explode + hash
aggregation (whole-stage codegen, no Python); the bigram top-k ends
in TakeOrderedAndProject. The per-doc stopword pass never explodes —
the token array is filtered inside the row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.dedup import normalized_text
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

STOPWORDS = ["a", "an", "and", "in", "is", "of", "the", "to"]
_SW_SQL = "['a','an','and','in','is','of','the','to']"


@query(
    "q_stopword_corpus",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tokens
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id, lang,
           CAST(len(tokens) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(tokens, t -> NOT list_contains({_SW_SQL}, t))) AS BIGINT)
             AS n_content_tokens,
           round(CAST(len(list_filter(tokens, t -> NOT list_contains({_SW_SQL}, t))) AS DOUBLE)
                 / len(tokens), 4) AS content_ratio,
           md5(array_to_string(list_filter(tokens, t -> NOT list_contains({_SW_SQL}, t)), ' '))
             AS content_fp
    FROM toks
    """,
)
def q_stopword_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-removal corpus build: per document, token counts
    before/after stopword filtering, the content ratio, and the
    fingerprint of the cleaned text (the dedup key a training-data
    pipeline stores). The filter runs inside the token array — no
    explode, no shuffle until nothing is left to shuffle."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    tokens = F.split(normalized_text("text"), " ")
    content = F.filter(tokens, lambda t: ~F.array_contains(sw, t))
    return d.select(
        "doc_id",
        "lang",
        F.size(tokens).cast("bigint").alias("n_tokens"),
        F.size(content).cast("bigint").alias("n_content_tokens"),
        F.round(F.size(content).cast("double") / F.size(tokens), 4).alias("content_ratio"),
        F.md5(F.array_join(content, " ")).alias("content_fp"),
    )


@query(
    "q_bigram_counts",
    oracle="""
    WITH toks AS (
      SELECT regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tokens
      FROM documents
    ), bigrams AS (
      SELECT unnest(list_transform(
               generate_series(1, len(tokens) - 1),
               i -> tokens[i] || ' ' || tokens[i+1]
             )) AS bigram
      FROM toks WHERE len(tokens) >= 2
    )
    SELECT bigram, COUNT(*) AS n
    FROM bigrams
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 25
    """,
)
def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram frequencies, top 25 (deterministic
    tiebreak on the bigram itself). Adjacent-pair construction stays
    inside the row (transform over indices), then one explode +
    two-phase count."""
    d = load_table(spark, sf_dir, "documents")
    # materialized split (captured-expression rule: an outer
    # expression inside the transform lambda re-evaluates per bigram)
    d = d.select(F.split(normalized_text("text"), " ").alias("__toks"))
    tokens = F.col("__toks")
    idx = F.sequence(F.lit(1), F.size(tokens) - 1)
    bigrams = F.transform(
        idx, lambda i: F.concat(F.element_at(tokens, i), F.lit(" "), F.element_at(tokens, i + 1))
    )
    return (
        d.filter(F.size(tokens) >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(25)
    )


@query(
    "q_type_token_ratio",
    oracle="""
    WITH toks AS (
      SELECT lang,
             unnest(regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT tok) AS n_types,
           round(CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*), 6) AS ttr
    FROM toks
    GROUP BY lang
    """,
)
def q_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary richness per language: distinct token types over
    total tokens — the corpus-quality scalar every dataset card
    reports. Explode + count-distinct aggregation."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(F.split(normalized_text("text"), " ")).alias("tok"))
    return toks.groupBy("lang").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("tok").alias("n_types"),
        F.round(F.countDistinct("tok").cast("double") / F.count("*"), 6).alias("ttr"),
    )


ROLL_B = 131
ROLL_M = 1_000_000_007


@query(
    "q_rolling_hash_fp",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tokens
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(tokens,
                 t -> CAST(length(t) * {ROLL_B} + ascii(t) * 31 + ascii(reverse(t)) AS BIGINT))),
             (acc, v) -> (acc * {ROLL_B} + v) % {ROLL_M}
           ) AS fp
    FROM toks
    """,
)
def q_rolling_hash_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint (Rabin-Karp
    style): fold acc = (acc·B + v(token)) mod M over the token
    stream, v(t) = len·B + ascii(first) · 31 + ascii(last). Engine-
    portable arithmetic (no murmur3), order-sensitive — unlike the
    md5 set fingerprint, token REORDERING changes the hash. One
    in-row fold, no shuffle."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    tokens = F.split(normalized_text("text"), " ")
    v = lambda t: (  # noqa: E731
        F.length(t) * ROLL_B + F.ascii(t) * 31 + F.ascii(F.reverse(t))
    ).cast("bigint")
    fp = F.aggregate(
        tokens,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * ROLL_B + v(t)) % ROLL_M,
    )
    return d.select("doc_id", fp.alias("fp"))


@query(
    "q_audio_header_meta",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(1 + (n_chars % 2) AS INT) AS channels,
           CAST(CASE WHEN n_chars % 3 = 0 THEN 8000 ELSE 16000 END AS INT) AS sample_rate,
           CAST(16 AS INT) AS bits,
           round(CAST(n_chars * 10 AS DOUBLE)
                 / (CASE WHEN n_chars % 3 = 0 THEN 8000 ELSE 16000 END), 6) AS duration_s
    FROM documents WHERE doc_id < 200
    """,
)
def q_audio_header_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio metadata for real: synthesize a valid RIFF/WAVE header
    per document (geometry from n_chars), Arrow-batch through
    mapInPandas, and return what the pure-Python WAV header parser
    recovered (functions/multimodal.py parse_wav_meta — public RIFF
    spec). The oracle recomputes the planted geometry in SQL."""
    from timestream_travel_spark.functions.multimodal import parse_wav_meta, synthesize_wav

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {"asset_id": [], "channels": [], "sample_rate": [], "bits": [], "duration_s": []}
            for doc_id, n in zip(pdf["doc_id"], pdf["n_chars"]):
                n = int(n)
                blob = synthesize_wav(1 + n % 2, 8000 if n % 3 == 0 else 16000, 16, n * 10)
                meta = parse_wav_meta(blob)
                ch, rate, bits, dur = meta if meta else (None, None, None, None)
                out["asset_id"].append(int(doc_id))
                out["channels"].append(ch)
                out["sample_rate"].append(rate)
                out["bits"].append(bits)
                out["duration_s"].append(dur)
            yield pd.DataFrame(out)

    return d.select("doc_id", "n_chars").mapInPandas(
        run, "asset_id long, channels int, sample_rate int, bits int, duration_s double"
    )


CHUNK_SIZE = 200
CHUNK_STEP = 150  # size - overlap(50)


@query(
    "q_text_chunks",
    oracle=f"""
    SELECT doc_id,
           CAST((chunk_start - 1) / {CHUNK_STEP} AS INT) AS chunk_id,
           chunk_start,
           substr(text, chunk_start, {CHUNK_SIZE}) AS chunk
    FROM (
      SELECT doc_id, text,
             CAST(unnest(generate_series(1, greatest(length(text) - {CHUNK_STEP}, 1), {CHUNK_STEP})) AS INT)
               AS chunk_start
      FROM documents WHERE doc_id < 200
    ) t
    """,
)
def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping text chunking (the RAG/training-window primitive):
    {CHUNK_SIZE}-char chunks every {CHUNK_STEP} chars (50-char
    overlap). Chunk starts are generated INSIDE the row (sequence +
    explode) and sliced with substring — whole-stage codegen, no
    Python. The UDTF variant (tests/test_sources_udfs.py) returns
    identical rows through the Python table-function API."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length("text") - CHUNK_STEP, F.lit(1)),
        F.lit(CHUNK_STEP),
    )
    return (
        d.select("doc_id", "text", F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            ((F.col("chunk_start") - 1) / CHUNK_STEP).cast("int").alias("chunk_id"),
            F.col("chunk_start").cast("int").alias("chunk_start"),
            F.substring(F.col("text"), F.col("chunk_start"), F.lit(CHUNK_SIZE)).alias("chunk"),
        )
    )


@query(
    "q_edit_distance_neardups",
    oracle="""
    WITH sh AS (
      SELECT doc_id, text,
             list_distinct(list_transform(
               generate_series(1, greatest(len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) - 2, 1)),
               i -> array_to_string(regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')[i:i+2], ' ')
             )) AS shingles
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(substr(a.text, 1, 120), substr(b.text, 1, 120)) AS INT) AS edit_dist
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5
    """,
)
def q_edit_distance_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of near-dup pairs: levenshtein on
    the first 120 chars of each LSH-verified pair (capped prefix —
    full-text edit distance is O(len²) per pair and belongs on a
    bounded candidate set only, never the corpus). Pair set is the
    oracle-stable LSH-verified output; the oracle recomputes it
    all-pairs."""
    from timestream_travel_spark.operators.dedup import lsh_verified_pairs_cached

    d = load_table(spark, sf_dir, "documents")
    pairs = lsh_verified_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    ta = d.select(F.col("doc_id").alias("doc_a"), F.substring("text", 1, 120).alias("pa"))
    tb = d.select(F.col("doc_id").alias("doc_b"), F.substring("text", 1, 120).alias("pb"))
    return (
        tb.join(F.broadcast(ta.join(F.broadcast(pairs), "doc_a")), "doc_b")
        .select(
            "doc_a", "doc_b", F.levenshtein("pa", "pb").cast("int").alias("edit_dist")
        )
    )


@query(
    "q_chunk_corpus",
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id, lang,
             substr(text, chunk_start, {CHUNK_SIZE}) AS chunk
      FROM (
        SELECT doc_id, lang, text,
               CAST(unnest(generate_series(1, greatest(length(text) - {CHUNK_STEP}, 1), {CHUNK_STEP})) AS INT)
                 AS chunk_start
        FROM documents
      ) t
    ), deduped AS (
      SELECT lang, md5(chunk) AS fp,
             MIN(length(chunk)) AS chunk_chars,
             COUNT(*) AS n_copies
      FROM chunks
      GROUP BY lang, md5(chunk)
    )
    SELECT lang,
           COUNT(*) AS n_unique_chunks,
           CAST(SUM(n_copies) AS BIGINT) AS n_total_chunks,
           CAST(SUM(n_copies) - COUNT(*) AS BIGINT) AS n_dropped_dups,
           CAST(SUM(chunk_chars) AS BIGINT) AS unique_chars
    FROM deduped
    GROUP BY lang
    """,
)
def q_chunk_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data chunk corpus in ONE plan: overlapping chunking
    (in-row) → exact chunk dedup by content fingerprint → per-lang
    accounting (unique/total/dropped chunks, surviving characters).
    This is the RAG/pretraining prep flagship: the only shuffles are
    the two hash aggregations, both keyed on (lang, fp) — chunk text
    itself never shuffles (the fingerprint does)."""
    d = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text") - CHUNK_STEP, F.lit(1)), F.lit(CHUNK_STEP)
    )
    chunks = d.select(
        "lang", F.explode(starts).alias("s"),
        F.substring(F.col("text"), F.col("s"), F.lit(CHUNK_SIZE)).alias("chunk"),
    )
    deduped = (
        chunks.select("lang", F.md5("chunk").alias("fp"), F.length("chunk").alias("chars"))
        .groupBy("lang", "fp")
        .agg(F.min("chars").alias("chunk_chars"), F.count("*").alias("n_copies"))
    )
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_unique_chunks"),
        F.sum("n_copies").cast("bigint").alias("n_total_chunks"),
        (F.sum("n_copies") - F.count("*")).cast("bigint").alias("n_dropped_dups"),
        F.sum("chunk_chars").cast("bigint").alias("unique_chars"),
    )
