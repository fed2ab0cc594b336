"""LLM-pipeline operators, part 6 (round 3): the corpus-preparation
steps between raw text and a tokenizer/training run — BPE merge-pair
statistics, benchmark-contamination detection, PII scrubbing,
Gopher-style repetition metrics, an inverted index, and relative-
threshold heavy hitters.

Everything stays in built-in expression trees (split / transform /
aggregate / regexp) until the final aggregation, so the per-document
work is whole-stage-codegen'd JVM code and the only shuffles are the
final key-hashed aggregations — the shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.ops import let_
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


# deterministic bench/train split: doc_id % BENCH_MOD == 0 is the
# benchmark slice. SHARED by the candidate stage here and the LCS
# verification stage (llm_text16) — change it in one place only.
BENCH_MOD = 29


def doc_words(text: Column | str) -> Column:
    """Non-empty whitespace tokens of a document."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != "")


@query(
    "q_bpe_pair_counts",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair
      FROM words WHERE length(w) >= 2
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 30
    """,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair statistics — the inner counting step of one BPE
    tokenizer-training iteration: frequency of every adjacent symbol
    pair inside words, top 30. The explode fans out to ~word-length
    rows but the aggregation key space is tiny (alphabet²), so the
    map-side partial aggregation collapses almost everything before
    the single exchange; the top-30 is TakeOrderedAndProject with a
    deterministic pair tiebreaker."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(F.explode(doc_words("text")).alias("w")).filter(F.length("w") >= 2)
    pairs = w.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(30)
    )


# word-5-gram shingles as plain strings: cross-engine deterministic
# (at production scale you'd hash them — xxhash64(shingle) — to cut
# shuffle width; joined here unhashed so the DuckDB oracle can mirror
# the join exactly).
def _shingles(words: Column, n: int = 5) -> Column:
    # Short inputs (< n words) yield NO shingles — without the guard,
    # F.sequence(1, size-(n-1)) with start > stop defaults to step -1
    # (descending) and slices at invalid positions, while the oracle's
    # range() yields an empty set. The word array is let_-bound so a
    # computed argument (e.g. doc_words(...)) isn't re-evaluated per
    # shingle position inside the lambda (ops.let_).
    def body(ws: Column) -> Column:
        return F.when(
            F.size(ws) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - (n - 1)),
                lambda i: F.array_join(F.slice(ws, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return let_(words, body)


@query(
    "q_contamination_ngrams",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS ws
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws) - 3),
                                   i -> array_to_string(ws[i:i+4], ' '))) AS s
      FROM w WHERE len(ws) >= 5
    ),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % {BENCH_MOD} = 0),
    train AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % {BENCH_MOD} <> 0),
    base AS (SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY doc_id),
    hits AS (
      SELECT t.doc_id, COUNT(*) AS n_contaminated
      FROM train t JOIN bench b ON t.s = b.s GROUP BY t.doc_id
    )
    SELECT h.doc_id, b.n_shingles, h.n_contaminated,
           round(CAST(h.n_contaminated AS DOUBLE) / b.n_shingles, 6) AS contamination_ratio
    FROM hits h JOIN base b ON h.doc_id = b.doc_id
    """,
)
def q_contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: which training documents share
    word-5-grams with a held-out benchmark set (here the deterministic
    doc_id%29 slice standing in for an eval suite). Shingling is
    in-row; both sides reduce to DISTINCT shingle sets before the
    equi-join, so the join runs on deduplicated keys. In production
    the benchmark side is a fixed eval suite (bounded — broadcast it);
    here it scales with the fixture so the hint is left to AQE.
    Pre-explode repartition per the minhash_signatures rule: a
    single parquet split must not serialize the shingle pass."""
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    sh = d.select(
        "doc_id", F.explode(_shingles(doc_words("text"))).alias("s")
    )
    bench = sh.filter(F.col("doc_id") % BENCH_MOD == 0).select("s").distinct()
    train = sh.filter(F.col("doc_id") % BENCH_MOD != 0).distinct()
    base = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        train.join(bench, "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return hits.join(base, "doc_id").select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        F.round(F.col("n_contaminated").cast("double") / F.col("n_shingles"), 6).alias(
            "contamination_ratio"
        ),
    )


_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\b555-[0-9]{4}\b"


@query(
    "q_pii_scrub",
    oracle=f"""
    WITH with_pii AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or call 555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
                  ELSE text END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
    FROM with_pii
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: mask e-mail addresses and phone numbers before
    training. The fixture text carries no PII, so a deterministic
    synthetic footer (e-mail + 555-line phone derived from doc_id) is
    appended to every third document — the scrubber must mask exactly
    those and leave clean documents byte-identical. Regexes use the
    Java∩RE2 common subset so Spark and the oracle see identical
    semantics; pure regexp_replace stays in codegen, no UDF."""
    d = load_table(spark, sf_dir, "documents")
    footer = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" now"),
    )
    t = F.when(F.col("doc_id") % 3 == 0, footer).otherwise(F.col("text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), 0)).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(_PHONE_RE), 0)).cast("bigint").alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )


@query(
    "q_repetition_metrics",
    oracle="""
    WITH w AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS ws
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(ws) AS n_words,
             len(list_distinct(ws)) AS n_distinct,
             list_max(list_transform(list_distinct(ws),
                                     dw -> len(list_filter(ws, x -> x = dw)))) AS top_cnt,
             length(text) AS n_chars,
             list_transform(list_distinct(string_split(text, '')),
                            ch -> length(text) - length(replace(text, ch, ''))) AS char_cnts
      FROM w WHERE len(ws) > 1
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           round(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 6) AS dup_word_frac,
           round(CAST(top_cnt AS DOUBLE) / n_words, 6) AS top_word_frac,
           round(1.0 - CAST(list_sum(list_transform(char_cnts, c -> c * (c - 1))) AS DOUBLE)
                       / (CAST(n_chars AS DOUBLE) * (n_chars - 1)), 6) AS char_simpson
    FROM m
    """,
)
def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/diversity filters: duplicate-word
    fraction, top-word fraction, and character-level Simpson diversity
    (1 − Σc(c−1)/N(N−1)). Simpson replaces Shannon entropy on purpose:
    every intermediate is an exact integer, so the metric is bit-
    identical across engines and partitionings with a single final
    double division — no order-dependent float accumulation (the
    repo's oracle-stability rule). All per-document array work is
    in-row higher-order functions; no shuffle at all until the scan's
    natural partitioning returns rows.

    The token array is materialized before any lambda captures it (a
    captured outer expression re-evaluates per element), and the
    top-word count is the longest equal-neighbor run of the SORTED
    array — O(n log n) per document instead of the O(distinct·n)
    filter-per-distinct-word scan."""
    d = load_table(spark, sf_dir, "documents")
    d = d.select("doc_id", "text", doc_words("text").alias("__ws"))
    ws = F.col("__ws")
    n_words = F.size(ws)
    n_distinct = F.size(F.array_distinct(ws))
    top_cnt = F.aggregate(
        F.array_sort(ws),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    n_chars = F.length("text")
    char_cnts = F.transform(
        F.array_distinct(F.split(F.col("text"), "")),
        lambda ch: n_chars - F.length(F.replace(F.col("text"), ch)),
    )
    pair_sum = F.aggregate(
        char_cnts,
        F.lit(0).cast("long"),
        lambda acc, c: acc + c.cast("long") * (c.cast("long") - 1),
    )
    return (
        d.filter(n_words > 1)
        .select(
            "doc_id",
            n_words.cast("bigint").alias("n_words"),
            F.round(F.lit(1.0) - n_distinct.cast("double") / n_words, 6).alias(
                "dup_word_frac"
            ),
            F.round(top_cnt.cast("double") / n_words, 6).alias("top_word_frac"),
            F.round(
                F.lit(1.0)
                - pair_sum.cast("double") / (n_chars.cast("double") * (n_chars - 1)),
                6,
            ).alias("char_simpson"),
        )
    )


@query(
    "q_inverted_index",
    oracle="""
    WITH dw AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> '')) AS word
      FROM documents
    )
    SELECT word, CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string((list_sort(list(doc_id)))[1:8], ',') AS postings
    FROM dw GROUP BY word HAVING COUNT(*) >= 10
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: term → document frequency + the first 8
    postings (sorted doc_ids). One explode, one DISTINCT, one grouped
    collect — the posting lists aggregate where the term's rows hash,
    never through the driver. The df≥10 floor plus the fixed-width
    posting prefix bound the output row size, which is what keeps a
    full-corpus index build memory-safe per reducer at 100 TB (full
    posting lists would instead go to a (term, bucket) two-level
    layout). Postings emit as a comma-joined string at the output
    boundary: the external checker canonicalizes via pandas
    sort_values, which cannot hash array cells."""
    d = load_table(spark, sf_dir, "documents")
    dw = d.select("doc_id", F.explode(doc_words("text")).alias("word")).distinct()
    return (
        dw.groupBy("word")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 8), ","
            ).alias("postings"),
        )
        .filter(F.col("df") >= 10)
    )


@query(
    "q_heavy_hitters",
    oracle="""
    WITH words AS (
      SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> '')) AS word
      FROM documents
    ),
    total AS (SELECT COUNT(*) AS n FROM words),
    cnts AS (SELECT word, COUNT(*) AS cnt FROM words GROUP BY word)
    SELECT c.word, CAST(c.cnt AS BIGINT) AS cnt,
           round(CAST(c.cnt AS DOUBLE) / t.n, 6) AS share
    FROM cnts c, total t
    WHERE c.cnt > t.n / 200.0
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-threshold heavy hitters: tokens whose global frequency
    exceeds n/200 — the exact two-pass counterpart of a Misra-Gries
    sketch (and the verifier you'd run against one). The total is a
    1-row aggregate (bounded → broadcast is safe by definition); the
    token counts partial-aggregate map-side so the exchange carries
    one row per distinct token, not per occurrence."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(doc_words("text")).alias("word"))
    total = words.agg(F.count(F.lit(1)).alias("n"))
    cnts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        cnts.join(F.broadcast(total))
        .filter(F.col("cnt") > F.col("n") / 200.0)
        .select(
            "word",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(F.col("cnt").cast("double") / F.col("n"), 6).alias("share"),
        )
    )
