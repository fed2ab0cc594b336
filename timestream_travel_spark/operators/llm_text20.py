"""LLM-corpus ops, wave 20: the Gopher quality-rule panel (Rae et
al. 2021, *Scaling Language Models: ... Gopher*, Appendix A — the
most-cited public pretraining filter rules) and Heaps'-law
vocabulary-growth estimation (Heaps 1978; Herdan 1960), the
companion scaling law to q_zipf_slope (llm_text14).

Exactness design: every Gopher rule evaluates as an INTEGER
cross-multiplied comparison (10·symbols <= words instead of a float
ratio test), so per-doc pass flags are engine-exact; the only float
op in the filter is the final per-source pass-rate division. Heaps'
log-log OLS quantizes each per-doc ln() term to DECIMAL before the
corpus-wide exact sums (the q_word_entropy pattern) and spends its
float ops in the per-output-row slope/intercept expression.

Scale shape: the filter is one map-side-combined reduce keyed on
source. Heaps needs a GLOBAL running (tokens, vocab) prefix — the
classic low-cardinality-window trap — so the cumsum is two-phase
range-sharded (the _sharded.py argument): per-doc stats reduce into
doc-id shards, the shard offsets form a tiny prefix table, and the
intra-shard windows run parallel per shard. No unpartitioned window
touches corpus-sized data.

Reference parity: none (cmd/backup.go has no corpus surface) —
north-star training-data-curation capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.llm_text4 import STOPWORDS, _SW_SQL
from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# Gopher Appendix-A thresholds (public paper values)
G_MIN_WORDS = 50
G_MAX_WORDS = 100_000
G_MIN_MWL = 3  # mean word length bounds
G_MAX_MWL = 10
G_SYMBOL_NUM, G_SYMBOL_DEN = 1, 10  # symbol-to-word ratio <= 0.1
G_ALPHA_NUM, G_ALPHA_DEN = 4, 5  # >= 80% words contain a letter
G_MIN_STOPWORDS = 2  # >= 2 distinct stopwords present (the paper's
# rule uses its own 8-word list; this engine applies its STOPWORDS
# constant so the rule has signal on any corpus sharing that list)

_WS_SQL = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"


@query(
    "q_gopher_quality_filter",
    oracle=f"""
    WITH d AS (
      SELECT source, {_WS_SQL} AS ws, text FROM documents
    ), per AS (
      SELECT source,
             len(ws) AS wc,
             list_sum(list_transform(ws, w -> length(w))) AS chars,
             len(regexp_extract_all(text, '[#…]')) AS syms,
             len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))
               AS alpha_w,
             len(list_intersect(list_distinct(ws), {_SW_SQL})) AS sw
      FROM d
    ), flags AS (
      SELECT source,
        CASE WHEN wc >= {G_MIN_WORDS} AND wc <= {G_MAX_WORDS}
             THEN 1 ELSE 0 END AS ok_wc,
        CASE WHEN chars >= {G_MIN_MWL} * wc AND chars <= {G_MAX_MWL} * wc
             THEN 1 ELSE 0 END AS ok_mwl,
        CASE WHEN {G_SYMBOL_DEN} * syms <= {G_SYMBOL_NUM} * wc
             THEN 1 ELSE 0 END AS ok_sym,
        CASE WHEN {G_ALPHA_DEN} * alpha_w >= {G_ALPHA_NUM} * wc
             THEN 1 ELSE 0 END AS ok_alpha,
        CASE WHEN sw >= {G_MIN_STOPWORDS} THEN 1 ELSE 0 END AS ok_sw
      FROM per
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ok_wc) AS BIGINT) AS pass_word_count,
           CAST(SUM(ok_mwl) AS BIGINT) AS pass_mean_word_len,
           CAST(SUM(ok_sym) AS BIGINT) AS pass_symbol_ratio,
           CAST(SUM(ok_alpha) AS BIGINT) AS pass_alpha_ratio,
           CAST(SUM(ok_sw) AS BIGINT) AS pass_stopwords,
           CAST(SUM(ok_wc * ok_mwl * ok_sym * ok_alpha * ok_sw) AS BIGINT)
             AS pass_all,
           round(CAST(SUM(ok_wc * ok_mwl * ok_sym * ok_alpha * ok_sw)
                      AS DOUBLE) / COUNT(*), 6) AS pass_rate
    FROM flags GROUP BY source
    """,
)
def q_gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gopher quality-rule panel (Rae et al. 2021, App. A):
    word count in [50, 100k], mean word length in [3, 10],
    symbol-to-word ratio <= 0.1 (#/ellipsis), >= 80% of words contain
    a letter, and >= 2 distinct stopwords present — per-rule pass
    counts, the all-rules pass count, and the pass rate.

    Every rule is an integer cross-multiplied comparison (chars >=
    3·wc, 10·syms <= wc, 5·alpha >= 4·wc), never a float ratio —
    per-doc flags are engine-exact; the single float op is the final
    pass-rate division. One corpus scan, all per-doc work in-row
    higher-order functions, one map-side-combined reduce on source."""
    d = load_table(spark, sf_dir, "documents")
    ws = doc_words("text")
    wc = F.size(ws)
    chars = F.aggregate(
        F.transform(ws, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    syms = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[#…]"), 0))
    alpha_w = F.size(F.filter(ws, lambda w: w.rlike("[a-zA-Z]")))
    sw = F.size(
        F.array_intersect(
            F.array_distinct(ws), F.array(*[F.lit(s) for s in STOPWORDS])
        )
    )
    ok = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    per = d.select(
        "source",
        ok((wc >= G_MIN_WORDS) & (wc <= G_MAX_WORDS)).alias("ok_wc"),
        ok((chars >= G_MIN_MWL * wc) & (chars <= G_MAX_MWL * wc)).alias("ok_mwl"),
        ok(F.lit(G_SYMBOL_DEN) * syms <= G_SYMBOL_NUM * wc).alias("ok_sym"),
        ok(F.lit(G_ALPHA_DEN) * alpha_w >= G_ALPHA_NUM * wc).alias("ok_alpha"),
        ok(sw >= G_MIN_STOPWORDS).alias("ok_sw"),
    )
    allf = (
        F.col("ok_wc") * F.col("ok_mwl") * F.col("ok_sym")
        * F.col("ok_alpha") * F.col("ok_sw")
    )
    return per.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("ok_wc").cast("bigint").alias("pass_word_count"),
        F.sum("ok_mwl").cast("bigint").alias("pass_mean_word_len"),
        F.sum("ok_sym").cast("bigint").alias("pass_symbol_ratio"),
        F.sum("ok_alpha").cast("bigint").alias("pass_alpha_ratio"),
        F.sum("ok_sw").cast("bigint").alias("pass_stopwords"),
        F.sum(allf).cast("bigint").alias("pass_all"),
        F.round(F.sum(allf).cast("double") / F.count("*"), 6).alias("pass_rate"),
    )


HEAPS_SHARD = 512  # doc-ids per cumsum shard


@query(
    "q_heaps_law",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
      FROM documents
    ), firstocc AS (
      SELECT w, min(doc_id) AS first_doc FROM words GROUP BY w
    ), perdoc AS (
      SELECT d.doc_id,
             CAST(COUNT(*) AS BIGINT) AS toks,
             CAST(COALESCE(any_value(f.nv), 0) AS BIGINT) AS nv
      FROM words d
      LEFT JOIN (SELECT first_doc, COUNT(*) AS nv FROM firstocc
                 GROUP BY first_doc) f
        ON f.first_doc = d.doc_id
      GROUP BY d.doc_id
    ), cum AS (
      SELECT doc_id,
             SUM(toks) OVER w AS ct, SUM(nv) OVER w AS cv
      FROM perdoc
      WINDOW w AS (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
    ), pts AS (
      SELECT CAST(ln(ct) AS DECIMAL(16,10)) AS x,
             CAST(ln(cv) AS DECIMAL(16,10)) AS y
      FROM cum
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM pts
    ), b AS (
      SELECT n,
             CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
             CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxyd,
             CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxxd
      FROM s
    )
    SELECT n AS n_docs,
           round((n * sxyd - sxd * syd) / (n * sxxd - sxd * sxd), 6)
             AS heaps_beta,
           round((syd - ((n * sxyd - sxd * syd) / (n * sxxd - sxd * sxd))
                        * sxd) / n, 6)
             AS heaps_ln_k
    FROM b
    """,
)
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law exponent: V(n) = K·n^beta fitted by OLS on
    (ln cumulative_tokens, ln cumulative_vocab) over the doc_id-
    ordered corpus prefix — beta (typically 0.4-0.6 for natural
    text) plus ln K from the intercept.

    The global running (tokens, new-vocab) prefix is computed
    two-phase: per-doc stats reduce into doc-id range shards
    (doc_id // {HEAPS_SHARD}), shard totals prefix-sum over the tiny
    shard table, and intra-shard cumulative windows run PARTITIONED
    BY SHARD — no unpartitioned window ever sees corpus-sized data
    (the _sharded.py argument; the DuckDB oracle can afford the
    single-partition window). ln() terms quantize to DECIMAL(16,10)
    before the exact corpus-wide OLS sums (q_word_entropy pattern);
    the slope/intercept are flat per-output-row float expressions
    over the VARCHAR-bridged decimal sufficient statistics
    (ops.dsum_sql rationale)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(doc_words("text")).alias("w"))
    firstocc = words.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    nv = firstocc.groupBy("first_doc").agg(F.count("*").alias("nv"))
    perdoc = (
        words.groupBy("doc_id")
        .agg(F.count("*").alias("toks"))
        .join(nv, F.col("doc_id") == F.col("first_doc"), "left")
        .select(
            "doc_id",
            "toks",
            F.coalesce(F.col("nv"), F.lit(0)).alias("nv"),
            (F.col("doc_id") / HEAPS_SHARD).cast("bigint").alias("shard"),
        )
    )
    shard_tot = perdoc.groupBy("shard").agg(
        F.sum("toks").alias("st"), F.sum("nv").alias("sv")
    )
    w_prev = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = shard_tot.select(
        "shard",
        F.coalesce(F.sum("st").over(w_prev), F.lit(0)).alias("ot"),
        F.coalesce(F.sum("sv").over(w_prev), F.lit(0)).alias("ov"),
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        perdoc.join(F.broadcast(offsets), "shard")
        .select(
            "doc_id",
            (F.col("ot") + F.sum("toks").over(w_in)).alias("ct"),
            (F.col("ov") + F.sum("nv").over(w_in)).alias("cv"),
        )
    )
    pts = cum.select(
        F.log("ct").cast("decimal(16,10)").alias("x"),
        F.log("cv").cast("decimal(16,10)").alias("y"),
    )
    s = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd = F.col("sxx").cast("double")
    beta = (n * sxyd - sxd * syd) / (n * sxxd - sxd * sxd)
    lnk = (syd - beta * sxd) / n
    return s.select(
        n.cast("bigint").alias("n_docs"),
        F.round(beta, 6).alias("heaps_beta"),
        F.round(lnk, 6).alias("heaps_ln_k"),
    )
