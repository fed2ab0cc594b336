"""LLM training-data operators, part 11: winnowing fingerprints
(Schleimer et al., SIGMOD'03 — the MOSS local-dedup selection rule),
a bigram language model, a deterministic distributed corpus shuffle,
and per-source token-budget selection.

Scale notes per op in the docstrings; the common thread is that every
global ordering is realized as (shard, within-shard window) + a tiny
offset join — never a single-partition window over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.dedup import normalized_text
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# q_rolling_hash_fp's engine-portable token hash (llm_text4.py):
# v(t) = len·B + ascii(first)·31 + ascii(last), folded mod M.
WIN_B = 131
WIN_M = 1_000_000_007
WIN_K = 4  # tokens per k-gram
WIN_W = 5  # winnowing window (k-grams per selection window)
# pos-packing for the rightmost-min tie-break: keys compare first on
# hash then on DESCENDING position, in one bigint
POS_CAP = 100_000


@query(
    "q_winnowing_fingerprints",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
               AS tokens
      FROM documents WHERE doc_id < 100
    ), grams AS (
      SELECT doc_id, i AS pos,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(tokens[i : i + {WIN_K} - 1],
                   t -> CAST(length(t) * {WIN_B} + ascii(t) * 31 + ascii(reverse(t)) AS BIGINT))),
               (acc, v) -> (acc * {WIN_B} + v) % {WIN_M}
             ) AS h
      FROM toks, unnest(generate_series(1, len(tokens) - {WIN_K} + 1)) AS t(i)
    ), keyed AS (
      SELECT doc_id, pos, h,
             min(h * {POS_CAP} + ({POS_CAP} - 1 - pos))
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING) AS min_key,
             count(*) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING) AS n_in_win
      FROM grams
    )
    SELECT DISTINCT doc_id,
           CAST({POS_CAP} - 1 - (min_key % {POS_CAP}) AS BIGINT) AS pos,
           CAST(min_key // {POS_CAP} AS BIGINT) AS fp
    FROM keyed WHERE n_in_win = {WIN_W}
    """,
)
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints: hash every {WIN_K}-token
    k-gram, then from each window of {WIN_W} consecutive hashes keep
    the minimum (rightmost on ties — the guarantee-bearing selection
    rule from the paper); the distinct kept (pos, hash) set is the
    fingerprint. Cross-engine rightmost-min without argmin support:
    pack (h, pos) into one bigint key h·CAP + (CAP−1−pos), window-min
    the key, unpack.

    Scale: hashes explode to (doc, pos) rows partitioned by doc_id —
    windows are per-document, so no cross-doc shuffle beyond the
    initial repartition; fingerprint density is 2/(w+1), bounding
    output size."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    # materialize the split BEFORE the gram-hash lambda captures it:
    # a captured outer expression re-evaluates per array element
    # (one normalization regex + split per k-gram position)
    d = d.select("doc_id", F.split(normalized_text("text"), " ").alias("__toks"))
    tokens = F.col("__toks")
    # Docs shorter than the k-gram width yield NO grams. Without this
    # filter F.sequence(1, size - (k-1)) would see start > stop and
    # default to step -1 (a DESCENDING sequence → slice() at invalid
    # positions), where the oracle's generate_series yields an empty
    # set — a latent cross-engine divergence for short docs.
    d = d.filter(F.size(tokens) >= WIN_K)
    v = lambda t: (  # noqa: E731
        F.length(t) * WIN_B + F.ascii(t) * 31 + F.ascii(F.reverse(t))
    ).cast("bigint")
    gram_hash = lambda i: F.aggregate(  # noqa: E731
        F.slice(tokens, i, WIN_K),
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * WIN_B + v(t)) % WIN_M,
    )
    grams = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size(tokens) - (WIN_K - 1)), gram_hash
            )
        ).alias("pos0", "h"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WIN_W - 1)
    key = F.col("h") * POS_CAP + (F.lit(POS_CAP - 1) - F.col("pos"))
    keyed = grams.select(
        "doc_id",
        F.min(key).over(w).alias("min_key"),
        F.count("*").over(w).alias("n_in_win"),
    ).filter(F.col("n_in_win") == WIN_W)
    return keyed.select(
        "doc_id",
        (F.lit(POS_CAP - 1) - F.col("min_key") % POS_CAP).cast("bigint").alias("pos"),
        (F.col("min_key") / POS_CAP).cast("bigint").alias("fp"),
    ).distinct()


def bigram_counts(d: DataFrame) -> DataFrame:
    """(w1, w2, c) bigram count table over normalized tokens — the
    shared statistic behind the MLE head (q_bigram_lm) and the
    Kneser-Ney head (llm_text17): one tokenize + posexplode + hash
    agg; the shuffle moves (w1, w2) count pairs, never documents.
    Pre-explode repartition per the minhash_signatures rule: a
    single parquet split must not serialize the tokenize pass."""
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism, "doc_id")
    tokens = F.split(normalized_text("text"), " ")
    # r15: arrays_zip of two shifted slices instead of posexplode
    # carrying the whole token array per position (Generate copies its
    # input per output row → quadratic bytes; see trigram_counts)
    n1 = F.greatest(F.size(F.col("toks")) - 1, F.lit(0))
    pairs = (
        d.select(tokens.alias("toks"))
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("toks"), 1, n1),
                    F.slice(F.col("toks"), 2, n1),
                )
            ).alias("t")
        )
        .select(F.col("t.0").alias("w1"), F.col("t.1").alias("w2"))
    )
    return pairs.groupBy("w1", "w2").agg(F.count("*").alias("c"))


# context-support floor shared by both LM heads
BIGRAM_SUPPORT = 500


@query(
    "q_bigram_lm",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
               AS tokens
      FROM documents
    ), bg AS (
      SELECT tokens[i] AS w1, tokens[i + 1] AS w2
      FROM toks, unnest(generate_series(1, len(tokens) - 1)) AS t(i)
    ), cnt AS (
      SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2
    ), tot AS (
      SELECT w1, SUM(c) AS n FROM cnt GROUP BY w1
    ), ranked AS (
      SELECT cnt.w1, cnt.w2,
             round(CAST(cnt.c AS DOUBLE) / tot.n, 6) AS p,
             row_number() OVER (PARTITION BY cnt.w1
                                ORDER BY cnt.c DESC, cnt.w2) AS rk
      FROM cnt JOIN tot ON tot.w1 = cnt.w1
      WHERE tot.n >= 500
    )
    SELECT w1, w2, p, CAST(rk AS INT) AS rk FROM ranked WHERE rk <= 3
    """,
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language model head: P(w2|w1) = c(w1,w2)/c(w1·) with
    the top-3 successors per context, for contexts seen ≥500 times.
    Two hash aggs + a per-context window — the shuffle moves (w1,w2)
    count pairs, never documents; the n≥500 support floor keeps the
    context set bounded however large the corpus."""
    d = load_table(spark, sf_dir, "documents")
    cnt = bigram_counts(d)
    tot = cnt.groupBy("w1").agg(F.sum("c").alias("n")).filter(F.col("n") >= BIGRAM_SUPPORT)
    ranked = (
        cnt.join(tot, "w1")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("w1").orderBy(F.desc("c"), F.asc("w2"))
            ),
        )
        .filter(F.col("rk") <= 3)
    )
    return ranked.select(
        "w1",
        "w2",
        F.round(F.col("c").cast("double") / F.col("n"), 6).alias("p"),
        F.col("rk").cast("int").alias("rk"),
    )


SHUFFLE_SEED = "shuf1"


@query(
    "q_corpus_shuffle",
    oracle=f"""
    SELECT doc_id,
           md5('{SHUFFLE_SEED}' || CAST(doc_id AS VARCHAR)) AS h,
           CAST(row_number() OVER (
             ORDER BY md5('{SHUFFLE_SEED}' || CAST(doc_id AS VARCHAR))) AS BIGINT)
             AS pos
    FROM documents
    """,
)
def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle (the training-order
    manifest): position = rank of md5(seed ‖ doc_id). NOT a global
    row_number window (single partition = the classic scale bug):
    the md5 hex's first digit shards the order into 16 groups whose
    lexicographic order IS the global order, so within-shard
    row_number + a 16-row cumulative-offset broadcast join
    reconstructs exact global positions — the same two-phase prefix
    sum as sequence packing (llm_text7)."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit(SHUFFLE_SEED), F.col("doc_id").cast("string")))
    hashed = d.select("doc_id", h.alias("h"), F.substring(h, 1, 1).alias("shard"))
    w = Window.partitionBy("shard").orderBy("h")
    numbered = hashed.withColumn("rn", F.row_number().over(w))
    # 16-row offset table: cumulative count of lexicographically
    # earlier shards
    wo = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        hashed.groupBy("shard")
        .agg(F.count("*").alias("cnt"))
        .select("shard", F.coalesce(F.sum("cnt").over(wo), F.lit(0)).alias("off"))
    )
    return (
        numbered.join(F.broadcast(offsets), "shard")
        .select("doc_id", "h", (F.col("off") + F.col("rn")).cast("bigint").alias("pos"))
    )


TOKEN_BUDGET = 5000  # whitespace tokens per source


@query(
    "q_token_budget_mix",
    oracle=f"""
    WITH sized AS (
      SELECT source, doc_id,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
             md5('mix1' || CAST(doc_id AS VARCHAR)) AS pri
      FROM documents
    ), cum AS (
      SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY pri, doc_id) AS cum_tok
      FROM sized
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens_kept
    FROM cum WHERE cum_tok <= {TOKEN_BUDGET}
    GROUP BY source
    """,
)
def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget selection (dataset mixing): docs take
    a deterministic md5 priority within their source; the running
    token total (window prefix sum, partitioned by source — never
    global) admits docs until the source's budget fills. Output is
    the per-source admission summary the mixture-weight planner
    consumes."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    pri = F.md5(F.concat(F.lit("mix1"), F.col("doc_id").cast("string")))
    sized = d.select("source", "doc_id", n_tok.alias("n_tok"), pri.alias("pri"))
    w = (
        Window.partitionBy("source")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = sized.withColumn("cum_tok", F.sum("n_tok").over(w))
    return (
        cum.filter(F.col("cum_tok") <= TOKEN_BUDGET)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs_kept"),
            F.sum("n_tok").cast("bigint").alias("n_tokens_kept"),
        )
    )


SPAN_N = 5  # tokens per span shingle


@query(
    "q_duplicate_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
               AS tokens
      FROM documents
    ), spans AS (
      SELECT DISTINCT doc_id,
             array_to_string(tokens[i : i + {SPAN_N} - 1], ' ') AS span
      FROM toks, unnest(generate_series(1, len(tokens) - {SPAN_N} + 1)) AS t(i)
    ), df AS (
      SELECT span, COUNT(*) AS n_docs FROM spans GROUP BY span
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(COUNT(*) FILTER (WHERE df.n_docs >= 2) AS BIGINT) AS n_dup_spans,
           round(CAST(COUNT(*) FILTER (WHERE df.n_docs >= 2) AS DOUBLE)
                 / COUNT(*), 6) AS dup_frac
    FROM spans s JOIN df ON df.span = s.span
    GROUP BY s.doc_id
    """,
)
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-corpus duplicated-span audit (the 'dedup training data'
    diagnostic from Lee et al., ACL'22, at span granularity): a doc's
    distinct {SPAN_N}-token spans are checked against the corpus-wide
    span document-frequency; the duplicated fraction flags
    boilerplate-heavy documents. Unlike q_contamination_ngrams
    (train×bench semi-join) this is corpus×itself.

    Scale: spans stay distinct-per-doc (no positional explosion
    beyond the shingle pass), and the span document-frequency
    attaches via ONE count-over-window on the span partitioning —
    no self-join, one fewer exchange than the agg+join formulation
    (and measured equal output). At 100 TB the span table is the big
    intermediate; a frequency floor or a Bloom pre-filter (bloom.py)
    bounds it. The pre-explode repartition is the minhash_signatures
    rule: a single parquet split must not serialize the CPU-bound
    shingle pass onto one core (4x at sf0.1)."""
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    # materialized split (captured-expression rule, see winnowing)
    d = d.select("doc_id", F.split(normalized_text("text"), " ").alias("__toks"))
    tokens = F.col("__toks")
    # Same short-doc guard as q_winnowing_fingerprints: keep
    # F.sequence from descending (step -1) when size(tokens) < SPAN_N,
    # mirroring the oracle's empty generate_series.
    d = d.filter(F.size(tokens) >= SPAN_N)
    spans = (
        d.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(tokens) - (SPAN_N - 1)),
                    lambda i: F.array_join(F.slice(tokens, i, SPAN_N), " "),
                )
            ).alias("span"),
        )
        .distinct()
    )
    joined = spans.withColumn(
        "n_docs", F.count("*").over(Window.partitionBy("span"))
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.count(F.when(F.col("n_docs") >= 2, 1)).cast("bigint").alias("n_dup_spans"),
        F.round(
            F.count(F.when(F.col("n_docs") >= 2, 1)).cast("double") / F.count("*"), 6
        ).alias("dup_frac"),
    )


PIPE_BUDGET = 20_000  # tokens per source in the e2e pipeline


@query(
    "q_corpus_pipeline_e2e",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, lang, text,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
      FROM documents
    ), deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM scored WHERE n_tok BETWEEN 20 AND 5000
      ) WHERE rn = 1
    ), admitted AS (
      SELECT * FROM (
        SELECT *, SUM(n_tok) OVER (PARTITION BY source
                                   ORDER BY md5('mix1' || CAST(doc_id AS VARCHAR)), doc_id)
                    AS cum_tok
        FROM deduped
      ) WHERE cum_tok <= {PIPE_BUDGET}
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM admitted GROUP BY source
    """,
)
def q_corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-build capstone: quality gate (token-length band) →
    exact dedup keep-first (normalized-text md5, the q_dedup_exact
    rule) → per-source token-budget admission (md5 priority prefix
    sum) → per-source dataset-card stats. One composition of the
    engine's own stages, oracle-checked end-to-end — the proof that
    the pieces compose without driver round-trips: the whole pipeline
    is ONE lazy plan (scan → window dedup on fp → window prefix-sum
    on source → rollup)."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    fp = F.md5(normalized_text("text"))
    scored = d.select("doc_id", "source", "lang", n_tok.alias("n_tok"), fp.alias("fp"))
    quality = scored.filter(F.col("n_tok").between(20, 5000))
    w_dedup = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (
        quality.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    pri = F.md5(F.concat(F.lit("mix1"), F.col("doc_id").cast("string")))
    w_budget = (
        Window.partitionBy("source")
        .orderBy(pri, "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    admitted = deduped.withColumn("cum_tok", F.sum("n_tok").over(w_budget)).filter(
        F.col("cum_tok") <= PIPE_BUDGET
    )
    return admitted.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
    )
