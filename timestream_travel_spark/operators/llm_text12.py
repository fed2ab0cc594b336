"""LLM-data-pipeline operators, part 12: distribution-aware data
selection — DSIR-style hashed-feature importance weights and
train/val token-distribution KL drift.

Both are corpus-statistics ops a 100 TB training-data pipeline runs
before (selection) and after (audit) building a mixture: DSIR
(Xie et al., NeurIPS 2023, public) scores every candidate document by
how target-like its hashed n-gram features are; the KL audit detects
distribution shift between materialized splits. Reference context:
the reference engine (cmd/backup.go) exports corpora; these decide
WHAT to export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.operators.llm_text7 import md5_bucket
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

DSIR_BUCKETS = 256  # hashed feature space size


@query(
    "q_dsir_importance",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> '')) AS word
      FROM documents
    ),
    toks AS (
      SELECT doc_id, lang,
             CAST('0x' || substr(md5(word), 1, 4) AS INT) % {DSIR_BUCKETS} AS b
      FROM words
    ),
    tgt AS (SELECT b, COUNT(*) AS ct FROM toks WHERE lang = 'en' GROUP BY b),
    raw AS (SELECT b, COUNT(*) AS cr FROM toks GROUP BY b),
    tot AS (
      SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) AS nt,
             CAST(COUNT(*) AS DOUBLE) AS nr
      FROM toks
    ),
    w AS (
      SELECT raw.b,
             CAST(log2(((COALESCE(tgt.ct, 0) + 1.0) / (tot.nt + {DSIR_BUCKETS}.0))
                       / ((raw.cr + 1.0) / (tot.nr + {DSIR_BUCKETS}.0)))
                  AS DECIMAL(20,8)) AS lw
      FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(CAST(SUM(w.lw) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_llr_bits
    FROM toks t JOIN w ON t.b = w.b
    GROUP BY t.doc_id
    """,
)
def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023): every document
    scored by the average log-likelihood ratio of its hashed word
    features under the TARGET distribution (here: the English slice)
    vs the RAW corpus distribution — the statistic importance
    resampling then samples against.

    Scale shape: the feature space is a fixed {DSIR_BUCKETS}-bucket
    hash (md5-derived, engine-portable), so both distribution tables
    are bounded and broadcast; the corpus-side cost is one token
    explode + one broadcast join + one doc_id aggregation. No
    vocabulary-sized shuffle ever happens — that boundedness is the
    whole point of hashed DSIR at 100 TB. Per-token log ratios are
    quantized to DECIMAL(20,8) before summing (order-independent,
    libm-ulp-immune: the q_unigram_logprob rule)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", "lang", F.explode(doc_words("text")).alias("word"))
    toks = words.select(
        "doc_id", "lang", md5_bucket(F.col("word"), DSIR_BUCKETS).alias("b")
    )
    # r15 (guide §1.2 step 1): tgt / raw / tot were three separate
    # plan branches over the corpus-sized token explode (plus the
    # final join — four md5 passes per run). ONE bucket census now
    # carries both counts (cr = all tokens, ct = target-slice tokens;
    # a bucket absent from the old tgt side surfaces as ct = 0, which
    # the +1 smoothing maps to the same value the old NULL-coalesce
    # did), and the 1-row totals derive from the BOUNDED census
    # instead of rescanning tokens. Exact integers throughout → the
    # smoothed ratios and quantized log weights are bit-identical.
    census = toks.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ct"),
    )
    tot = census.agg(
        F.sum("ct").cast("double").alias("nt"),
        F.sum("cr").cast("double").alias("nr"),
    )
    p_t = (F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / (
        F.col("nt") + F.lit(float(DSIR_BUCKETS))
    )
    p_r = (F.col("cr") + 1.0) / (F.col("nr") + F.lit(float(DSIR_BUCKETS)))
    w = (
        census.join(F.broadcast(tot))
        .select("b", F.log2(p_t / p_r).cast("decimal(20,8)").alias("lw"))
    )
    return (
        toks.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            # raw double after the exact-decimal sum (VARCHAR bridge on
            # the oracle side): round()-on-double flipped -0.00005-class
            # values at sf0.1 (-0.0001 Spark vs -0.0 DuckDB)
            (F.sum("lw").cast("double") / F.count(F.lit(1))).alias(
                "avg_llr_bits"
            ),
        )
    )


@query(
    "q_split_kl_drift",
    oracle="""
    WITH toks AS (
      SELECT CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                       AS INT) % 100 < 80
                  THEN 'train' ELSE 'val' END AS split,
             unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> '')) AS word
      FROM documents
    ),
    c AS (
      SELECT word,
             SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS ct,
             SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS cv
      FROM toks GROUP BY word
    ),
    tot AS (
      SELECT CAST(SUM(ct) AS DOUBLE) AS nt, CAST(SUM(cv) AS DOUBLE) AS nv,
             CAST(COUNT(*) AS DOUBLE) AS v
      FROM c
    ),
    terms AS (
      SELECT CAST(((c.ct + 1.0) / (tot.nt + tot.v))
                  * log2(((c.ct + 1.0) / (tot.nt + tot.v))
                         / ((c.cv + 1.0) / (tot.nv + tot.v)))
                  AS DECIMAL(24,15)) AS tv,
             CAST(((c.cv + 1.0) / (tot.nv + tot.v))
                  * log2(((c.cv + 1.0) / (tot.nv + tot.v))
                         / ((c.ct + 1.0) / (tot.nt + tot.v)))
                  AS DECIMAL(24,15)) AS vt
      FROM c CROSS JOIN tot
    )
    SELECT CAST((SELECT v FROM tot) AS BIGINT) AS n_vocab,
           CAST((SELECT nt FROM tot) AS BIGINT) AS n_train_tok,
           CAST((SELECT nv FROM tot) AS BIGINT) AS n_val_tok,
           round(CAST(SUM(tv) AS DOUBLE), 6) AS kl_train_val_bits,
           round(CAST(SUM(vt) AS DOUBLE), 6) AS kl_val_train_bits
    FROM terms
    """,
)
def q_split_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift audit between the md5 train/val
    splits: symmetric pair of smoothed KL divergences (bits) over the
    JOINT vocabulary — the post-split sanity check that a hash split
    did not concentrate a language or domain on one side (a healthy
    hash split shows near-zero KL; topical splits do not).

    One token explode, one word-level count carrying both splits as
    conditional sums (no per-split scans), one bounded totals row
    broadcast back, one final sum. Per-word KL terms quantize to
    DECIMAL(24,15) before summing so the reduction is associative and
    order-independent at any partition count."""
    d = load_table(spark, sf_dir, "documents")
    split = F.when(md5_bucket(F.col("doc_id")) < 80, "train").otherwise("val")
    toks = d.select(
        split.alias("split"), F.explode(doc_words("text")).alias("word")
    )
    c = toks.groupBy("word").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("cv"),
    )
    tot = c.agg(
        F.sum("ct").cast("double").alias("nt"),
        F.sum("cv").cast("double").alias("nv"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    j = c.join(F.broadcast(tot))
    p = (F.col("ct") + 1.0) / (F.col("nt") + F.col("v"))
    q = (F.col("cv") + 1.0) / (F.col("nv") + F.col("v"))
    terms = j.select(
        "nt",
        "nv",
        "v",
        (p * F.log2(p / q)).cast("decimal(24,15)").alias("tv"),
        (q * F.log2(q / p)).cast("decimal(24,15)").alias("vt"),
    )
    return terms.groupBy("nt", "nv", "v").agg(
        F.round(F.sum("tv").cast("double"), 6).alias("kl_train_val_bits"),
        F.round(F.sum("vt").cast("double"), 6).alias("kl_val_train_bits"),
    ).select(
        F.col("v").cast("bigint").alias("n_vocab"),
        F.col("nt").cast("bigint").alias("n_train_tok"),
        F.col("nv").cast("bigint").alias("n_val_tok"),
        "kl_train_val_bits",
        "kl_val_train_bits",
    )
