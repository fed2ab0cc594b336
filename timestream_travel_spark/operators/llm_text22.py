"""LLM-corpus ops, wave 22 (round 9): the two curation artifacts the
r8 verdict named — (1) the token-level DEDUP-AWARE LOSS-MASKING
manifest (Lee et al., ACL'22 §5: instead of excising duplicated
spans from the corpus, train on the full text but zero the LM loss
on every non-canonical occurrence — the intervention that keeps
document flow intact while removing the memorization gradient), and
(2) the per-document combined QUALITY CARD (CCNet, Wenzek et al.
LREC'20 / RedPajama-style): one row per document joining the
independent quality signals this engine already computes — Gopher
rule panel, duplicated-span fraction, unigram cross-entropy with a
per-language perplexity bucket, type-token ratio — plus a composite
keep/drop verdict, so a curation pipeline reads ONE table instead of
five.

Exactness: mask runs are pure integer position arithmetic (the
pos − row_number() run-grouping identity); every card rule is an
integer cross-multiplied comparison (the llm_text20 discipline);
the cross-entropy term quantizes log2 to DECIMAL(20,8) before the
per-doc sum (the q_unigram_logprob pattern) and the per-language
tercile orders by the exact decimal sum ratio with a doc_id
tiebreak.

Scale shape: everything is explode→reduce with vocabulary/span-table
intermediates (the established corpus cost class); the card's five
signal branches all join back on doc_id — co-partitioned after the
initial repartition, no corpus×corpus joins anywhere; the tercile is
a per-language window over doc-level rows (|docs| per lang, not
token-level data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.dedup import normalized_text
from timestream_travel_spark.operators.llm_text4 import _SW_SQL, STOPWORDS
from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.operators.llm_text11 import SPAN_N
from timestream_travel_spark.operators.llm_text20 import (
    G_ALPHA_DEN,
    G_ALPHA_NUM,
    G_MAX_MWL,
    G_MAX_WORDS,
    G_MIN_MWL,
    G_MIN_WORDS,
    G_SYMBOL_DEN,
    G_SYMBOL_NUM,
    G_MIN_STOPWORDS,
    _WS_SQL,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# keep-verdict thresholds (documented policy constants, integer
# cross-multiplied: dup_frac <= DUP_NUM/DUP_DEN, bucket <= KEEP_BUCKET)
DUP_NUM, DUP_DEN = 1, 5  # duplicated-span fraction <= 0.2
KEEP_BUCKET = 2  # CCNet head+middle kept, tail dropped

_TOKS_SQL = f"""
    SELECT doc_id,
           regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
             AS toks
    FROM documents
"""


@query(
    "q_loss_mask_manifest",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}
    ), spans AS (
      SELECT doc_id, i, array_to_string(toks[i : i + {SPAN_N} - 1], ' ') AS span
      FROM toks, unnest(generate_series(1, len(toks) - {SPAN_N} + 1)) AS t(i)
    ), df AS (
      SELECT span, COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS keeper
      FROM spans GROUP BY span
    ), rem AS (
      SELECT DISTINCT s.doc_id, s.i + o AS pos
      FROM spans s
      JOIN df ON df.span = s.span,
           unnest(generate_series(0, {SPAN_N} - 1)) AS oo(o)
      WHERE df.n_docs >= 2 AND s.doc_id <> df.keeper
    ), runs AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM rem
    ), iv AS (
      SELECT doc_id, grp, MIN(pos) AS s, MAX(pos) AS e
      FROM runs GROUP BY doc_id, grp
    ), per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_runs,
             CAST(SUM(e - s + 1) AS BIGINT) AS n_masked,
             string_agg(s || '-' || e, ',' ORDER BY s) AS mask_ranges
      FROM iv GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tok,
           COALESCE(p.n_masked, 0) AS n_masked,
           COALESCE(p.n_runs, 0) AS n_runs,
           COALESCE(p.mask_ranges, '') AS mask_ranges,
           round(CAST(COALESCE(p.n_masked, 0) AS DOUBLE) / len(t.toks), 6)
             AS mask_frac
    FROM toks t LEFT JOIN per_doc p USING (doc_id)
    """,
)
def q_loss_mask_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level loss-masking manifest (Lee et al. ACL'22 §5):
    every {SPAN_N}-token span with corpus document frequency >= 2
    keeps loss ONLY in its canonical document (min doc_id); in every
    other document the span's token positions are masked. Output one
    row per document: token count, masked-token count, the number of
    contiguous masked runs, the runs themselves as a compact
    'start-end,start-end' string (1-based, inclusive — the artifact
    a data loader consumes), and the masked fraction.

    Plan: identical linear span machinery as q_duplicate_span_removal
    (positional spans → span-df with min-doc keeper → covered
    positions, never a doc×doc join); runs come from the
    pos − row_number() grouping identity (one doc-partitioned window
    over MASKED positions only — far smaller than the token table);
    docs shorter than {SPAN_N} tokens or fully canonical surface with
    an empty mask via the left join. Reference: none (north-star
    training-data capability)."""
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    toks = d.select("doc_id", F.split(normalized_text("text"), " ").alias("toks"))
    spans = (
        toks.filter(F.size("toks") >= SPAN_N)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - (SPAN_N - 1)),
                    lambda i: F.struct(
                        i.alias("i"),
                        F.array_join(F.slice("toks", i, SPAN_N), " ").alias("span"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.i").alias("i"), F.col("s.span").alias("span"))
    )
    df_tbl = spans.groupBy("span").agg(
        F.countDistinct("doc_id").alias("n_docs"), F.min("doc_id").alias("keeper")
    )
    rem = (
        spans.join(df_tbl, "span")
        .filter((F.col("n_docs") >= 2) & (F.col("doc_id") != F.col("keeper")))
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + (SPAN_N - 1))).alias("pos"),
        )
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    iv = (
        rem.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("s"), F.max("pos").alias("e"))
    )
    per_doc = iv.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("n_masked"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "e"))),
                lambda r: F.concat_ws(
                    "-", r["s"].cast("string"), r["e"].cast("string")
                ),
            ),
            ",",
        ).alias("mask_ranges"),
    )
    return toks.select(
        "doc_id", F.size("toks").cast("bigint").alias("n_tok")
    ).join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tok",
        F.coalesce("n_masked", F.lit(0)).cast("bigint").alias("n_masked"),
        F.coalesce("n_runs", F.lit(0)).cast("bigint").alias("n_runs"),
        F.coalesce("mask_ranges", F.lit("")).alias("mask_ranges"),
        F.round(
            F.coalesce("n_masked", F.lit(0)).cast("double") / F.col("n_tok"), 6
        ).alias("mask_frac"),
    )


@query(
    "q_quality_card",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, source, {_WS_SQL} AS ws, text FROM documents
    ), base AS (
      SELECT doc_id, lang, source,
             len(ws) AS wc,
             len(list_distinct(ws)) AS wdist,
             list_sum(list_transform(ws, w -> length(w))) AS chars,
             len(regexp_extract_all(text, '[#…]')) AS syms,
             len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]'))) AS alpha_w,
             len(list_intersect(list_distinct(ws), {_SW_SQL})) AS sw
      FROM d
    ), nt AS ({_TOKS_SQL}
    ), sp AS (
      SELECT DISTINCT doc_id, array_to_string(toks[i : i + {SPAN_N} - 1], ' ') AS span
      FROM nt, unnest(generate_series(1, len(toks) - {SPAN_N} + 1)) AS t(i)
    ), spdf AS (
      SELECT doc_id, span, COUNT(*) OVER (PARTITION BY span) AS n_docs FROM sp
    ), dup AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(COUNT(*) FILTER (WHERE n_docs >= 2) AS BIGINT) AS n_dup
      FROM spdf GROUP BY doc_id
    ), utoks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> '')) AS word
      FROM documents
    ), tot AS (SELECT COUNT(*) AS n FROM utoks),
    uni AS (SELECT word, COUNT(*) AS cnt FROM utoks GROUP BY word),
    lpsum AS (
      SELECT t.doc_id,
             SUM(CAST(log2(CAST(u.cnt AS DOUBLE) / tt.n) AS DECIMAL(20,8)))
               AS slp,
             COUNT(*) AS n_tok
      FROM utoks t JOIN uni u ON t.word = u.word CROSS JOIN tot tt
      GROUP BY t.doc_id
    ), card AS (
      SELECT b.doc_id, b.lang, b.source,
             CAST(b.wc AS BIGINT) AS wc,
             round(CAST(b.wdist AS DOUBLE) / b.wc, 6) AS ttr,
             CASE WHEN b.wc >= {G_MIN_WORDS} AND b.wc <= {G_MAX_WORDS}
                   AND b.chars >= {G_MIN_MWL} * b.wc
                   AND b.chars <= {G_MAX_MWL} * b.wc
                   AND {G_SYMBOL_DEN} * b.syms <= {G_SYMBOL_NUM} * b.wc
                   AND {G_ALPHA_DEN} * b.alpha_w >= {G_ALPHA_NUM} * b.wc
                   AND b.sw >= {G_MIN_STOPWORDS}
                  THEN 1 ELSE 0 END AS gopher_pass,
             COALESCE(u.n_spans, 0) AS n_spans,
             COALESCE(u.n_dup, 0) AS n_dup,
             round(CAST(COALESCE(u.n_dup, 0) AS DOUBLE)
                   / greatest(COALESCE(u.n_spans, 0), 1), 6) AS dup_frac,
             round(-CAST(CAST(l.slp AS VARCHAR) AS DOUBLE) / l.n_tok, 4)
               AS bits_per_token,
             ntile(3) OVER (
               PARTITION BY b.lang
               ORDER BY -CAST(CAST(l.slp AS VARCHAR) AS DOUBLE) / l.n_tok,
                        b.doc_id) AS ppl_bucket
      FROM base b
      LEFT JOIN dup u ON u.doc_id = b.doc_id
      JOIN lpsum l ON l.doc_id = b.doc_id
    )
    SELECT doc_id, lang, source, wc, ttr, gopher_pass, n_spans, dup_frac,
           bits_per_token, CAST(ppl_bucket AS INT) AS ppl_bucket,
           CASE WHEN gopher_pass = 1
                 AND {DUP_DEN} * n_dup <= {DUP_NUM} * n_spans
                 AND ppl_bucket <= {KEEP_BUCKET}
                THEN 1 ELSE 0 END AS keep
    FROM card
    """,
)
def q_quality_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document combined quality card (CCNet / RedPajama shape):
    ONE row per document carrying every independent curation signal —
    word count, type-token ratio, the all-rules Gopher pass flag
    (Rae et al. 2021 App. A, integer cross-multiplied), distinct
    {SPAN_N}-token span count with duplicated fraction (Lee et al.
    ACL'22 audit), unigram cross-entropy bits/token (CCNet's LM
    signal, DECIMAL-quantized terms) with the per-LANGUAGE tercile
    bucket (CCNet's head/middle/tail split — ordered by the exact
    decimal sum ratio, doc_id tiebreak) — plus the composite keep
    verdict: Gopher pass AND dup_frac <= {DUP_NUM}/{DUP_DEN} AND
    bucket <= {KEEP_BUCKET}. Downstream samplers read this table
    instead of re-deriving five signals.

    Scale shape: three linear explode→reduce branches (raw words,
    normalized spans, unigram tokens) re-joined on doc_id; the only
    window is the per-language tercile over DOC-level rows. The keep
    rule is all-integer, so the verdict is engine-exact even where
    the float signals are displayed rounded."""
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id").persist()
    ws = doc_words("text")
    base = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(ws).alias("wc"),
        F.size(F.array_distinct(ws)).alias("wdist"),
        F.aggregate(
            F.transform(ws, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
        ).alias("chars"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[#…]"), 0)).alias("syms"),
        F.size(F.filter(ws, lambda w: w.rlike("[a-zA-Z]"))).alias("alpha_w"),
        F.size(
            F.array_intersect(
                F.array_distinct(ws), F.array(*[F.lit(s) for s in STOPWORDS])
            )
        ).alias("sw"),
    )
    ntoks = d.select("doc_id", F.split(normalized_text("text"), " ").alias("toks"))
    sp = (
        ntoks.filter(F.size("toks") >= SPAN_N)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - (SPAN_N - 1)),
                    lambda i: F.array_join(F.slice("toks", i, SPAN_N), " "),
                )
            ).alias("span"),
        )
        .distinct()
    )
    spdf = sp.withColumn(
        "n_docs", F.count(F.lit(1)).over(Window.partitionBy("span"))
    )
    dup = spdf.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.count_if(F.col("n_docs") >= 2).cast("bigint").alias("n_dup"),
    )
    utoks = d.select("doc_id", F.explode(ws).alias("word"))
    tot = utoks.agg(F.count(F.lit(1)).alias("n"))
    uni = utoks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    lp = F.log2(F.col("cnt").cast("double") / F.col("n")).cast("decimal(20,8)")
    lpsum = (
        utoks.join(uni, "word")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.sum(lp).alias("slp"), F.count(F.lit(1)).alias("n_tok"))
    )
    bpt = -(F.col("slp").cast("double")) / F.col("n_tok")
    card = (
        base.join(dup, "doc_id", "left")
        .join(lpsum, "doc_id")
        .select(
            "doc_id",
            "lang",
            "source",
            F.col("wc").cast("bigint").alias("wc"),
            F.round(F.col("wdist").cast("double") / F.col("wc"), 6).alias("ttr"),
            F.when(
                (F.col("wc") >= G_MIN_WORDS)
                & (F.col("wc") <= G_MAX_WORDS)
                & (F.col("chars") >= G_MIN_MWL * F.col("wc"))
                & (F.col("chars") <= G_MAX_MWL * F.col("wc"))
                & (G_SYMBOL_DEN * F.col("syms") <= G_SYMBOL_NUM * F.col("wc"))
                & (G_ALPHA_DEN * F.col("alpha_w") >= G_ALPHA_NUM * F.col("wc"))
                & (F.col("sw") >= G_MIN_STOPWORDS),
                1,
            )
            .otherwise(0)
            .alias("gopher_pass"),
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("n_dup", F.lit(0)).cast("bigint").alias("n_dup"),
            F.round(
                F.coalesce("n_dup", F.lit(0)).cast("double")
                / F.greatest(F.coalesce("n_spans", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_frac"),
            F.round(bpt, 4).alias("bits_per_token"),
            F.ntile(3)
            .over(Window.partitionBy("lang").orderBy(bpt.asc(), F.col("doc_id")))
            .alias("ppl_bucket"),
        )
    )
    return card.select(
        "doc_id",
        "lang",
        "source",
        "wc",
        "ttr",
        "gopher_pass",
        "n_spans",
        "dup_frac",
        "bits_per_token",
        "ppl_bucket",
        F.when(
            (F.col("gopher_pass") == 1)
            & (DUP_DEN * F.col("n_dup") <= DUP_NUM * F.col("n_spans"))
            & (F.col("ppl_bucket") <= KEEP_BUCKET),
            1,
        )
        .otherwise(0)
        .alias("keep"),
    )
