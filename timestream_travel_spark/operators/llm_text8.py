"""LLM-pipeline operators, part 8 (round 3): vocabulary coverage
(OOV rate against a frequency-built vocab) and int8 embedding
quantization with reconstruction-error audit — the compression step
in front of any billion-vector ANN index.

Both are pure expression trees. The vocab is genuinely bounded (top
1000) so its broadcast hint is legitimate under the repo's
bounded-only-broadcast rule; the quantizer's per-dimension min/max
table is dim-sized (64 rows) and joins back by position via AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

VOCAB_SIZE = 1000


@query(
    "q_oov_rate",
    oracle=f"""
    WITH toks AS (
      SELECT lang,
             unnest(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS word
      FROM documents
    ),
    vocab AS (
      SELECT word FROM (
        SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word
      ) ORDER BY cnt DESC, word LIMIT {VOCAB_SIZE}
    )
    SELECT t.lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) FILTER (WHERE v.word IS NULL) AS BIGINT) AS n_oov,
           round(CAST(COUNT(*) FILTER (WHERE v.word IS NULL) AS DOUBLE) / COUNT(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.word = v.word
    GROUP BY t.lang
    """,
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language against a top-{VOCAB_SIZE}
    frequency vocabulary built from the corpus itself — the coverage
    check run before freezing a tokenizer. The vocab is bounded by
    construction (LIMIT {VOCAB_SIZE} with a deterministic tiebreak),
    so broadcasting it is safe at any corpus size; tokens then never
    shuffle — the probe is a map-side broadcast lookup and the only
    exchange is the per-lang rollup."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(doc_words("text")).alias("word"))
    vocab = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(VOCAB_SIZE)
        .select(F.col("word").alias("vword"))
    )
    j = toks.join(F.broadcast(vocab), toks.word == F.col("vword"), "left")
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.count(F.when(F.col("vword").isNull(), 1)).cast("bigint").alias("n_oov"),
        F.round(
            F.count(F.when(F.col("vword").isNull(), 1)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("oov_rate"),
    )


@query(
    "q_embedding_quantize",
    oracle="""
    WITH flat AS (
      SELECT vec_id, pos - 1 AS pos, CAST(x AS DOUBLE) AS x
      FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings)
    ),
    stats AS (
      SELECT pos, MIN(x) AS dmin, MAX(x) AS dmax FROM flat GROUP BY pos
    ),
    q AS (
      SELECT f.pos, f.x, s.dmin, s.dmax,
             CASE WHEN s.dmax = s.dmin THEN 0
                  ELSE least(255, CAST(floor((f.x - s.dmin) / ((s.dmax - s.dmin) / 255.0) + 0.5) AS BIGINT))
             END AS code
      FROM flat f JOIN stats s ON f.pos = s.pos
    )
    SELECT pos,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(MIN(dmin), 4) AS dmin,
           round(MAX(dmax), 4) AS dmax,
           CAST(SUM(CAST(abs(x - (dmin + code * ((dmax - dmin) / 255.0))) AS DECIMAL(20,8))) AS DOUBLE) AS abs_err_sum
    FROM q GROUP BY pos
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding corpus: per-dimension
    min/max → affine code in [0,255] → reconstruction-error audit per
    dimension (decimal-accumulated absolute error, the repo's
    order-independent sum rule). The stats table is dim-sized (64
    rows) — a bounded broadcast back onto the flattened corpus; at
    100 TB the flatten is the scan itself (posexplode is in-row) and
    the only shuffle is the 64-key stats aggregation. Arithmetic is
    written with identical parenthesization on both engines so the
    IEEE-double codes match bit-for-bit."""
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "xf")
    ).select("vec_id", "pos", F.col("xf").cast("double").alias("x"))
    stats = flat.groupBy("pos").agg(
        F.min("x").alias("dmin"), F.max("x").alias("dmax")
    )
    q = flat.join(stats, "pos")
    scale = (F.col("dmax") - F.col("dmin")) / 255.0
    code = F.when(F.col("dmax") == F.col("dmin"), F.lit(0)).otherwise(
        F.least(
            F.lit(255),
            F.floor((F.col("x") - F.col("dmin")) / scale + 0.5).cast("bigint"),
        )
    )
    dequant = F.col("dmin") + code * scale
    return q.groupBy("pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.min("dmin"), 4).alias("dmin"),
        F.round(F.max("dmax"), 4).alias("dmax"),
        F.sum(F.abs(F.col("x") - dequant).cast("decimal(20,8)"))
        .cast("double")
        .alias("abs_err_sum"),
    )


MIX_TEMP = 2.0  # sampling temperature for multilingual mixing


@query(
    "q_lang_mixture_weights",
    oracle=f"""
    WITH c AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                      x -> x <> ''))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    t AS (SELECT SUM(n_tokens) AS total FROM c),
    w AS (
      SELECT lang, n_docs, n_tokens,
             pow(CAST(n_tokens AS DOUBLE) / t.total, 1.0 / {MIX_TEMP}) AS raw
      FROM c, t
    )
    SELECT lang, n_docs, n_tokens,
           round(raw / SUM(raw) OVER (), 6) AS mix_weight,
           round((raw / SUM(raw) OVER ()) / (CAST(n_tokens AS DOUBLE)
                 / SUM(n_tokens) OVER ()), 6) AS upsample_factor
    FROM w
    """,
)
def q_lang_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multilingual mixture weights (T={MIX_TEMP}):
    w_l ∝ (token_share_l)^(1/T), the standard upsampling rule that
    flattens the language distribution for training (XLM-R-style,
    public). Per-lang token counts reduce to |langs| rows, so every
    window/normalization step after the first aggregation runs on a
    bounded table — the corpus is scanned exactly once."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(doc_words("text"))).cast("bigint").alias("n_tokens"),
    )
    from pyspark.sql.window import Window

    all_w = Window.partitionBy()
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(all_w)
    raw = F.pow(share, 1.0 / MIX_TEMP)
    mix = raw / F.sum(raw).over(all_w)
    return c.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(mix, 6).alias("mix_weight"),
        F.round(mix / share, 6).alias("upsample_factor"),
    )


N_LEN_BUCKETS = 10


@query(
    "q_length_buckets",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS n_tok
      FROM documents
    ),
    b AS (
      SELECT doc_id, n_tok,
             ntile({N_LEN_BUCKETS}) OVER (ORDER BY n_tok, doc_id) AS bucket
      FROM d
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_tok) AS BIGINT) AS min_tok,
           CAST(MAX(n_tok) AS BIGINT) AS max_tok,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
           CAST(MAX(n_tok) * COUNT(*) - SUM(n_tok) AS BIGINT) AS pad_waste
    FROM b GROUP BY bucket
    """,
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit: documents are split into
    {N_LEN_BUCKETS} equal-size buckets by token length (ntile with a
    deterministic tiebreak) and each bucket reports its padding waste
    (bucket_max×count − sum) — the quantity length-bucketing
    minimizes vs naive global-max padding. ntile needs a global
    order: at fixture scale that is one window; at 100 TB the same
    audit runs on percentile boundaries from approx_quantile + a
    range join, trading exactness of the bucket EDGES (not of the
    audit math) for a scan-shaped plan — documented, not silently
    swapped."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    toks = d.select("doc_id", F.size(doc_words("text")).alias("n_tok"))
    w = Window.orderBy(F.asc("n_tok"), F.asc("doc_id"))
    b = toks.withColumn("bucket", F.ntile(N_LEN_BUCKETS).over(w))
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("n_tok").cast("bigint").alias("min_tok"),
        F.max("n_tok").cast("bigint").alias("max_tok"),
        F.sum("n_tok").cast("bigint").alias("sum_tok"),
        (F.max("n_tok") * F.count(F.lit(1)) - F.sum("n_tok"))
        .cast("bigint")
        .alias("pad_waste"),
    )


@query("q_length_buckets_approx")
def q_length_buckets_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB variant of q_length_buckets: bucket EDGES come from
    approxQuantile (Greenwald-Khanna, driver receives 9 scalars) and
    rows are assigned by comparing against the broadcast cut array —
    no global window, no total order, scan-shaped at any corpus size.
    Bucket boundaries are approximate; the audit math per bucket is
    exact. Rows-only oracle (GK sketch is engine-specific); pytest
    asserts per-bucket populations stay within tolerance of the exact
    ntile twin."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.size(doc_words("text")).alias("n_tok"))
    cuts = toks.stat.approxQuantile(
        "n_tok", [i / N_LEN_BUCKETS for i in range(1, N_LEN_BUCKETS)], 0.001
    )
    bucket = F.lit(1) + F.size(
        F.filter(
            F.array(*[F.lit(float(c)) for c in cuts]),
            lambda c: F.col("n_tok") > c,
        )
    )
    b = toks.withColumn("bucket", bucket)
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("n_tok").cast("bigint").alias("min_tok"),
            F.max("n_tok").cast("bigint").alias("max_tok"),
            F.sum("n_tok").cast("bigint").alias("sum_tok"),
            (F.max("n_tok") * F.count(F.lit(1)) - F.sum("n_tok"))
            .cast("bigint")
            .alias("pad_waste"),
        )
        .orderBy("bucket")
    )
