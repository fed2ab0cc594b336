"""LLM-pipeline operators, part 9 (round 3): Count-Min sketch
frequency estimation (the third sketch family after HLL and
Misra-Gries) and CCNet-style unigram log-prob (perplexity) quality
filtering.

The CM sketch is a pure expression tree — d×w bounded counters built
with one groupBy, probed via a broadcast join; no UDF, no token ever
reaches the driver. The log-prob scorer decimal-accumulates per-term
log2 values (the repo's order-independent sum rule) so the Spark and
DuckDB results hash-match despite shuffled aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

CM_D = 4  # hash rows
CM_W = 8192  # counters per row; overestimate ≤ ~e·n/W w.h.p.


def _cm_cells(word_col) -> F.Column:
    """Array of (row, col) cells a token increments."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(F.xxhash64(word_col, F.lit(r)), F.lit(CM_W)).alias("c"),
            )
            for r in range(CM_D)
        ]
    )


def cm_sketch(words: DataFrame) -> DataFrame:
    """(r, c, cnt) counter table — exactly d×w rows regardless of
    corpus size; the only shuffle is the bounded-key count."""
    return (
        words.select(F.explode(_cm_cells(F.col("word"))).alias("cell"))
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query("q_cm_sketch_estimates")
def q_cm_sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min estimates for the exact top-30 tokens: build the
    d×w sketch in one pass, then probe each candidate token with a
    broadcast join against the (bounded) counter table and take the
    row-wise minimum. est ≥ true always; pytest bounds the
    overestimate at 3·n/W. Rows-only oracle (xxhash64); the exact
    counts travel alongside so the error is visible in the output."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(doc_words("text")).alias("word"))
    sketch = cm_sketch(words)
    top = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("word"))
        .limit(30)
    )
    probes = top.select(
        "word", "true_cnt", F.explode(_cm_cells(F.col("word"))).alias("cell")
    ).select("word", "true_cnt", F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
    return (
        probes.join(F.broadcast(sketch), ["r", "c"])
        .groupBy("word", "true_cnt")
        .agg(F.min("cnt").cast("bigint").alias("est_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("word"))
        .select(
            "word",
            F.col("true_cnt").cast("bigint").alias("true_cnt"),
            "est_cnt",
        )
    )


@query(
    "q_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS word
      FROM documents
    ),
    total AS (SELECT COUNT(*) AS n FROM toks),
    uni AS (
      SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word
    ),
    scored AS (
      SELECT t.doc_id,
             CAST(log2(CAST(u.cnt AS DOUBLE) / tt.n) AS DECIMAL(20,8)) AS lp
      FROM toks t JOIN uni u ON t.word = u.word CROSS JOIN total tt
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           round(-CAST(SUM(lp) AS DOUBLE) / COUNT(*), 4) AS bits_per_token
    FROM scored GROUP BY doc_id
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram cross-entropy (bits/token) under the
    corpus's own unigram distribution — the perplexity-style quality
    filter (CCNet family): repetitive low-entropy spam scores low,
    rare-token soup scores high. Each token's log2 prob is rounded to
    DECIMAL(20,8) BEFORE the per-doc sum on both engines, so the
    aggregation is associative/order-independent (oracle-stability
    rule) and immune to libm last-ulp drift. The unigram table is
    vocab-sized; the join is AQE-sized, never forced."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(doc_words("text")).alias("word"))
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    uni = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    lp = F.log2(F.col("cnt").cast("double") / F.col("n")).cast("decimal(20,8)")
    scored = (
        toks.join(uni, "word")
        .join(F.broadcast(total))
        .select("doc_id", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok"),
        F.round(-(F.sum("lp").cast("double")) / F.count(F.lit(1)), 4).alias(
            "bits_per_token"
        ),
    )


@query(
    "q_split_leakage",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 100 < 80
                  THEN 'train'
                  WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 100 < 90
                  THEN 'val' ELSE 'test' END AS split
      FROM documents
    )
    SELECT fp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM d GROUP BY fp
    HAVING COUNT(DISTINCT split) > 1
    """,
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit: content fingerprints that appear in
    MORE THAN ONE split of the md5 80/10/10 partition — exactly the
    eval-contamination the split must not have (near-dups that
    straddle the boundary). One fingerprint groupBy over the corpus;
    the leak set is by construction small, so the report is
    driver-safe at any scale. Composes q_doc_fingerprint's key with
    q_train_split_manifest's assignment."""
    from timestream_travel_spark.operators.llm_text7 import md5_bucket

    d = load_table(spark, sf_dir, "documents")
    b = md5_bucket(F.col("doc_id"))
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    fp = F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
    return (
        d.select(fp.alias("fp"), split.alias("split"), "doc_id")
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("split").cast("bigint").alias("n_splits"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_splits") > 1)
    )


@query("q_ann_quantized_topk")
def q_ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 nearest neighbors computed on int8-QUANTIZED embeddings
    (per-dimension affine codes from q_embedding_quantize's scheme,
    reconstructed to doubles) — the memory-bounded ANN path: a
    billion-vector index at 1/4 the bytes. Output ordering uses the
    quantized cosine with vec_id tiebreak; pytest measures recall
    against the full-precision q_cosine_topk (≥0.8 at 8-bit).
    Rows-only oracle (depends on quantizer codes)."""
    from timestream_travel_spark.functions.vectors import cosine, to_double_array
    from timestream_travel_spark.operators.similarity import QUERY_VEC_ID, TOP_K

    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "xf")
    ).select("vec_id", "pos", F.col("xf").cast("double").alias("x"))
    stats = flat.groupBy("pos").agg(F.min("x").alias("dmin"), F.max("x").alias("dmax"))
    scale = (F.col("dmax") - F.col("dmin")) / 255.0
    code = F.when(F.col("dmax") == F.col("dmin"), F.lit(0)).otherwise(
        F.least(
            F.lit(255),
            F.floor((F.col("x") - F.col("dmin")) / scale + 0.5).cast("bigint"),
        )
    )
    deq = (F.col("dmin") + code * scale).alias("xq")
    recon = (
        flat.join(F.broadcast(stats), "pos")
        .select("vec_id", "pos", deq)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "xq"))), lambda s: s["xq"]
            ).alias("qvec")
        )
    )
    qrow = recon.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("qvec").alias("query_vec")
    )
    sim = F.round(cosine(F.col("qvec"), F.col("query_vec")), 4)
    return (
        recon.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qrow))
        .select("vec_id", sim.alias("cos_sim_q"))
        .orderBy(F.desc("cos_sim_q"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@query(
    "q_corpus_card",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS word
      FROM documents
    ),
    total AS (SELECT COUNT(*) AS n FROM toks),
    uni AS (SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word),
    lp AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tok,
             round(-CAST(SUM(CAST(log2(CAST(u.cnt AS DOUBLE) / tt.n) AS DECIMAL(20,8))) AS DOUBLE)
                   / COUNT(*), 4) AS bits_per_token
      FROM toks t JOIN uni u ON t.word = u.word CROSS JOIN total tt
      GROUP BY t.doc_id
    )
    SELECT d.doc_id, d.lang, d.source,
           CASE WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS INT) % 100 < 80
                THEN 'train'
                WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS INT) % 100 < 90
                THEN 'val' ELSE 'test' END AS split,
           lp.n_tok,
           round((CASE WHEN length(d.text) >= 100 AND length(d.text) <= 1000 THEN 1.0 ELSE 0.0 END
            + CASE WHEN CAST(len(regexp_extract_all(d.text, '[^\\w\\s]')) AS DOUBLE)
                        / length(d.text) < 0.1 THEN 1.0 ELSE 0.0 END
            + CASE WHEN CAST(len(regexp_extract_all(lower(d.text), '\\b(the|a|and|of|to|in)\\b')) AS DOUBLE)
                        / len(regexp_split_to_array(trim(d.text), '\\s+')) > 0.05 THEN 1.0 ELSE 0.0 END
           ) / 3.0, 4) AS quality,
           lp.bits_per_token,
           md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS fp
    FROM documents d JOIN lp ON d.doc_id = lp.doc_id
    """,
)
def q_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole preparation pipeline denormalized into one
    per-document corpus card: split assignment, token count, quality
    score, unigram bits/token (perplexity), and the dedup
    fingerprint — the table a curation UI or mixture-weighting job
    reads. One corpus scan feeds the row-local columns; the unigram
    cross-entropy reuses the vocab join; everything else is
    stateless expressions, so the card costs one join more than
    q_unigram_logprob alone."""
    from timestream_travel_spark.operators.llm_text import quality_score
    from timestream_travel_spark.operators.llm_text7 import md5_bucket

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(doc_words("text")).alias("word"))
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    uni = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    lpv = F.log2(F.col("cnt").cast("double") / F.col("n")).cast("decimal(20,8)")
    lp = (
        toks.join(uni, "word")
        .join(F.broadcast(total))
        .select("doc_id", lpv.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.round(-(F.sum("lp").cast("double")) / F.count(F.lit(1)), 4).alias(
                "bits_per_token"
            ),
        )
    )
    b = md5_bucket(F.col("doc_id"))
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    base = d.select(
        "doc_id",
        "lang",
        "source",
        split.alias("split"),
        F.round(quality_score(F.col("text")), 4).alias("quality"),
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("fp"),
    )
    return base.join(lp, "doc_id").select(
        "doc_id", "lang", "source", "split", "n_tok", "quality", "bits_per_token", "fp"
    )
