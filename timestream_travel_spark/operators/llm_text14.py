"""LLM training-data operators, part 14 (round 5): corpus-law
diagnostics and mixture plumbing — Zipf rank-frequency slope,
CCNet-style perplexity terciles, tokenizer fertility, and packing
efficiency.

Every query is DuckDB-oracled; float discipline follows the
repo-wide rules (exact-integer ratios emitted as raw double
divisions; log-space terms quantized to DECIMAL before summation —
the q_unigram_logprob pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.operators.llm_text7 import CHUNK_TOKENS, doc_offsets
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

ZIPF_TOP = 100


@query(
    "q_zipf_slope",
    oracle=f"""
    WITH w AS (
      SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> '')) AS word
      FROM documents
    ), top AS (
      SELECT word, COUNT(*) AS cnt FROM w GROUP BY word
      ORDER BY cnt DESC, word LIMIT {ZIPF_TOP}
    ), ranked AS (
      SELECT CAST(log2(row_number() OVER (ORDER BY cnt DESC, word)) AS DECIMAL(20,8)) AS x,
             CAST(log2(cnt) AS DECIMAL(20,8)) AS y
      FROM top
    ), sums AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(30,8))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,8))) AS DOUBLE) AS sxx
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_top,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS zipf_slope
    FROM sums
    """,
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus: least-squares slope of
    log2(count) vs log2(rank) for the top {ZIPF_TOP} words (a natural
    corpus scores ≈ −1; synthetic or template-heavy corpora drift
    off it — a cheap corpus-health diagnostic). The word count is the
    only corpus-sized aggregation (map-side combined); ranking and
    regression run on the fixed {ZIPF_TOP}-row table. Log terms and
    their products are quantized to DECIMAL before summation so the
    regression sums are order-independent; the slope is one double
    expression mirrored exactly in the oracle."""
    d = load_table(spark, sf_dir, "documents")
    top = (
        d.select(F.explode(doc_words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(ZIPF_TOP)
    )
    rw = Window.orderBy(F.desc("cnt"), F.asc("word"))
    ranked = top.select(
        F.log2(F.row_number().over(rw)).cast("decimal(20,8)").alias("x"),
        F.log2("cnt").cast("decimal(20,8)").alias("y"),
    )
    xd, yd = F.col("x").cast("double"), F.col("y").cast("double")
    sums = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((xd * yd).cast("decimal(30,8)")).cast("double").alias("sxy"),
        F.sum((xd * xd).cast("decimal(30,8)")).cast("double").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    return sums.select(
        n.cast("bigint").alias("n_top"),
        ((n * sxy - sx * sy) / (n * sxx - sx * sx)).alias("zipf_slope"),
    )


@query(
    "q_perplexity_buckets",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS word
      FROM documents
    ),
    total AS (SELECT COUNT(*) AS n FROM toks),
    uni AS (SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word),
    scored AS (
      SELECT t.doc_id,
             CAST(log2(CAST(u.cnt AS DOUBLE) / tt.n) AS DECIMAL(20,8)) AS lp
      FROM toks t JOIN uni u ON t.word = u.word CROSS JOIN total tt
    ),
    bpt AS (
      SELECT doc_id,
             round(-CAST(SUM(lp) AS DOUBLE) / COUNT(*), 4) AS bits_per_token
      FROM scored GROUP BY doc_id
    ),
    bucketed AS (
      SELECT d.lang, b.bits_per_token,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY b.bits_per_token, b.doc_id) AS tercile
      FROM bpt b JOIN documents d ON d.doc_id = b.doc_id
    )
    SELECT lang,
           CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(CAST(SUM(CAST(bits_per_token AS DECIMAL(20,4))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_bits_per_token
    FROM bucketed GROUP BY lang, tercile
    """,
)
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al., LREC 2020,
    public): split each language's documents into head / middle /
    tail terciles of unigram cross-entropy (the q_unigram_logprob
    score standing in for the LM perplexity) — the standard recipe
    for perplexity-stratified sampling of web corpora. The per-doc
    score is one vocab join + doc agg; the ntile window runs on the
    doc-count-sized score table partitioned by lang, with a doc_id
    tiebreak so tercile boundaries are deterministic."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(doc_words("text")).alias("word"))
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    uni = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    lp = F.log2(F.col("cnt").cast("double") / F.col("n")).cast("decimal(20,8)")
    bpt = (
        toks.join(uni, "word")
        .join(F.broadcast(total))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.round(-(F.sum("lp").cast("double")) / F.count(F.lit(1)), 4).alias(
                "bits_per_token"
            )
        )
    )
    w = Window.partitionBy("lang").orderBy("bits_per_token", "doc_id")
    bucketed = bpt.join(d.select("doc_id", "lang"), "doc_id").select(
        "lang", "bits_per_token", F.ntile(3).over(w).alias("tercile")
    )
    bucket = (
        F.when(F.col("tercile") == 1, "head")
        .when(F.col("tercile") == 2, "middle")
        .otherwise("tail")
    )
    return bucketed.groupBy("lang", "tercile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            F.sum(F.col("bits_per_token").cast("decimal(20,4)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_bits_per_token"),
    ).select("lang", bucket.alias("bucket"), "n_docs", "avg_bits_per_token")


@query(
    "q_token_fertility",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                    x -> x <> ''))) AS BIGINT) AS n_words,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE)
             / SUM(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                   x -> x <> ''))) AS chars_per_word
    FROM documents GROUP BY lang, source
    """,
)
def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility proxy per (lang, source): characters per
    whitespace token — the compression-rate planning number for
    token-budget estimates (a BPE tokenizer's bytes-per-token tracks
    this). Pure integer sums with one final double division — no
    float accumulation anywhere; one map-side-combined groupBy."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(doc_words("text"))
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(n_words).cast("bigint").alias("n_words"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.sum(n_words)).alias("chars_per_word"),
    )


@query(
    "q_packing_stats",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''))
               AS n_tok
      FROM documents
    ),
    nz AS (SELECT * FROM d WHERE n_tok > 0),
    c AS (
      SELECT doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM nz
    ),
    spans AS (
      SELECT n_tok,
             CAST(off // {CHUNK_TOKENS} AS BIGINT) AS first_chunk,
             CAST((off + n_tok - 1) // {CHUNK_TOKENS} AS BIGINT) AS last_chunk
      FROM c
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN last_chunk > first_chunk THEN 1 ELSE 0 END) AS BIGINT)
             AS n_split_docs,
           CAST(SUM(CASE WHEN last_chunk > first_chunk THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS split_frac,
           CAST(MAX(last_chunk) + 1 AS BIGINT) AS n_chunks,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tok) AS DOUBLE)
             / ((MAX(last_chunk) + 1) * {CHUNK_TOKENS}) AS fill_frac
    FROM spans
    """,
)
def q_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit of the q_pack_sequences layout: how
    many documents straddle a {CHUNK_TOKENS}-token training-sequence
    boundary (their loss windows see a mid-document cut), and the
    fill fraction of the chunked corpus. Shares doc_offsets()'s
    two-phase distributed prefix sum — no global window — and
    reduces to one integer-only aggregate row."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.size(doc_words("text")).alias("n_tok"))
    off = doc_offsets(toks)
    spans = off.select(
        "n_tok",
        F.floor(F.col("off") / CHUNK_TOKENS).cast("bigint").alias("first_chunk"),
        F.floor((F.col("off") + F.col("n_tok") - 1) / CHUNK_TOKENS)
        .cast("bigint")
        .alias("last_chunk"),
    )
    is_split = F.when(F.col("last_chunk") > F.col("first_chunk"), 1).otherwise(0)
    return spans.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(is_split).cast("bigint").alias("n_split_docs"),
        (F.sum(is_split).cast("double") / F.count(F.lit(1))).alias("split_frac"),
        (F.max("last_chunk") + 1).cast("bigint").alias("n_chunks"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        (
            F.sum("n_tok").cast("double")
            / ((F.max("last_chunk") + 1) * CHUNK_TOKENS)
        ).alias("fill_frac"),
    )


CDC_MOD = 16  # expected passage length = CDC_MOD words


@query(
    "q_cdc_passage_dedup",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS ws
      FROM documents
    ), pos AS (
      SELECT doc_id, i AS pos, ws[i] AS word,
             CASE WHEN CAST('0x' || substr(md5(ws[i]), 1, 4) AS INT) % {CDC_MOD} = 0
                  THEN 1 ELSE 0 END AS boundary
      FROM w, unnest(generate_series(1, len(ws))) AS t(i)
    ), pid AS (
      SELECT doc_id, pos, word,
             COALESCE(SUM(boundary) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS passage_id
      FROM pos
    ), passages AS (
      SELECT doc_id, passage_id,
             md5(string_agg(word, ' ' ORDER BY pos)) AS fp
      FROM pid GROUP BY doc_id, passage_id
    ), df AS (
      SELECT fp, COUNT(DISTINCT doc_id) AS n_docs FROM passages GROUP BY fp
    )
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_passages,
           CAST(COUNT(*) FILTER (WHERE df.n_docs >= 2) AS BIGINT) AS n_dup_passages,
           CAST(COUNT(*) FILTER (WHERE df.n_docs >= 2) AS DOUBLE) / COUNT(*)
             AS dup_frac
    FROM passages p JOIN df ON df.fp = p.fp
    GROUP BY p.doc_id
    """,
)
def q_cdc_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking for passage-level dedup (the
    FastCDC/rolling-divider idea at word granularity, public): a word
    whose md5 lands in bucket 0 of {CDC_MOD} closes the current
    passage, so passage BOUNDARIES are content-anchored — an edit
    shifts at most its own passage, where fixed-width n-gram windows
    shift every downstream shingle. Expected passage length is
    {CDC_MOD} words (geometric), bounding fingerprint count at
    corpus_words/{CDC_MOD}.

    Scale shape: one posexplode partitioned by doc_id, a prefix-sum
    window on that same partitioning, passage reassembly as a grouped
    sort-collect, then a fingerprint-keyed DF join — the
    q_duplicate_spans topology with content-defined instead of
    sliding spans (no positional blowup; spans never overlap)."""
    from timestream_travel_spark.operators.llm_text7 import md5_bucket

    d = load_table(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id", F.posexplode(doc_words("text")).alias("pos0", "word")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "word",
        F.when(md5_bucket(F.col("word"), CDC_MOD) == 0, 1).otherwise(0).alias("boundary"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pid = pos.select(
        "doc_id",
        "pos",
        "word",
        F.coalesce(F.sum("boundary").over(w), F.lit(0)).alias("passage_id"),
    )
    passages = pid.groupBy("doc_id", "passage_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s.getField("word"),
                ),
                " ",
            )
        ).alias("fp")
    )
    df_tab = passages.groupBy("fp").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    joined = passages.join(df_tab, "fp")
    is_dup = F.when(F.col("n_docs") >= 2, 1).otherwise(0)
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_passages"),
        F.sum(is_dup).cast("bigint").alias("n_dup_passages"),
        (F.sum(is_dup).cast("double") / F.count(F.lit(1))).alias("dup_frac"),
    )


WS_K = 50  # weighted-sample size


@query(
    "q_weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             CAST(ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1)
                     / 4294967296.0) / n_chars AS DECIMAL(20,8)) AS k
      FROM documents WHERE n_chars > 0
    ), top AS (
      SELECT * FROM keyed ORDER BY k DESC, doc_id LIMIT {WS_K}
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(row_number() OVER (ORDER BY k DESC, doc_id) AS BIGINT) AS sample_rank
    FROM top
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES, IPL 2006, public): each row draws
    u ∈ (0,1] from md5(doc_id) — reproducible on every engine, run,
    and partition layout, unlike rand() — and the top {WS_K} rows by
    key ln(u)/weight are a probability-proportional-to-size sample
    (ln is monotone in the paper's u^(1/w)). The key is quantized to
    DECIMAL(20,8) on both engines so the one libm call cannot flip a
    boundary rank. This is the sampler the kmeans‖-style seeding and
    mixture builders need at scale: one scan + TakeOrdered top-k, no
    global sort, no driver randomness."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        + 1
    ) / F.lit(4294967296.0)
    k = (F.log(u) / F.col("n_chars")).cast("decimal(20,8)")
    top = (
        d.select("doc_id", "lang", "n_chars", k.alias("k"))
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(WS_K)
    )
    # rank window runs on the already-limited WS_K rows — bounded
    w = Window.orderBy(F.desc("k"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.row_number().over(w).cast("bigint").alias("sample_rank"),
    )
