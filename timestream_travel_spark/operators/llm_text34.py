"""LLM-corpus text analysis, part 34 (round-16 STAGED wave): four
lexical/keyword measures the suite lacks —

- q_mtld: the Measure of Textual Lexical Diversity (McCarthy &
  Jarvis, BRM 2010): walk the token stream counting "factors" —
  maximal runs whose running TTR stays ≥ 0.72 (exact integer test
  100·distinct < 72·count closes a factor) — in BOTH directions;
  the remainder contributes the partial factor (1 − TTR_end)/0.28.
  MTLD = mean of N/factors_fwd and N/factors_bwd. The per-doc walk
  is sequential — mapInPandas ≡ the oracle's recursive-CTE lockstep
  walk carrying the ≤|vocab| seen-list as state.
- q_rake_keywords: RAKE keyword extraction (Rose et al. 2010):
  phrases = stopword-delimited token runs of ≤ {RAKE_MAX_LEN}
  words (the standard RAKE candidate cap — the fixture's 6.6%
  stopword density makes uncapped runs span whole documents),
  word score =
  degree/frequency over the source's phrases, phrase score = Σ word
  scores (each word score quantized to 6dp DECIMAL so the sum is
  exact and order-free), top-5 distinct phrases per source.
- q_gries_dp: Gries' deviation of proportions DP (Gries, IJCL
  2008) for the corpus' top-20 words with sources as parts:
  DP = Σ_parts |v_i − s_i|/2, cross-multiplied to the exact integer
  Σ|f_wi·N − f_w·N_i| with ONE flat division by 2·f_w·N — absent
  (word, part) cells contribute f_w·N_i exactly.
- q_msttr: mean segmental TTR (Johnson 1944): the source's pooled
  token stream in (doc_id, position) order, segments of
  {MSTTR_SEG} tokens (final partial dropped), MSTTR =
  Σ distinct / ({MSTTR_SEG}·n_segments) — integer sums, one flat
  division.

Exactness: every decision predicate is integer; RAKE's rational
word scores quantize to 6dp before the (exact, decimal) phrase
sum; MTLD's partial-factor composition uses the literal 0.28 at
every site in both engines (never 1 − 0.72).

Scale shape: all four are explode + hash-agg/window shapes, linear
in tokens; MTLD's walk state is one ≤|vocab| list per document
(docs are bounded; the lockstep recursion advances every doc one
token per round). Reference parity: none — north-star derived.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.llm_text4 import _SW_SQL, STOPWORDS
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

MTLD_NUM, MTLD_DEN = 72, 100  # factor closes when 100·distinct < 72·count
RAKE_TOPK = 5
RAKE_MAX_LEN = 4  # standard RAKE candidate cap; rare stopwords make longer runs degenerate
DP_TOP_WORDS = 20
MSTTR_SEG = 50

# ------------------------------------------------------------ MTLD

_MTLD_SCHEMA = (
    "doc_id bigint, n_tokens bigint, factors_fwd double,"
    " factors_bwd double, mtld double"
)


def _mtld_factors(tokens: list[str]) -> float:
    """One-direction MTLD factor count: full factors + the partial
    remainder (1 − TTR_end)/0.28 — the exact composition the oracle
    replays."""
    full = 0
    seen: set[str] = set()
    cnt = 0
    for w in tokens:
        cnt += 1
        seen.add(w)
        if MTLD_DEN * len(seen) < MTLD_NUM * cnt:
            full += 1
            seen = set()
            cnt = 0
    partial = 0.0
    if cnt > 0:
        partial = (1.0 - len(seen) / cnt) / 0.28
    return full + partial


def _mtld_batch(batches):
    for pdf in batches:
        out = []
        for did, text in zip(pdf["doc_id"], pdf["text"]):
            ws = text.split(" ")
            ff = _mtld_factors(ws)
            fb = _mtld_factors(ws[::-1])
            mtld = None
            if ff > 0 and fb > 0:
                mtld = (len(ws) / ff + len(ws) / fb) / 2.0
            out.append((int(did), len(ws), ff, fb, mtld))
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id",
                "n_tokens",
                "factors_fwd",
                "factors_bwd",
                "mtld",
            ],
        )


def _mtld_walk_sql(name: str, tok: str) -> str:
    """Lockstep recursive factor walk over the `{tok}` position
    table: state (full, seen list, cnt) per doc; the close test and
    list update mirror _mtld_factors exactly."""
    return f"""{name} AS (
      SELECT doc_id, 0 AS pos, 0 AS nfull,
             CAST([] AS VARCHAR[]) AS seen, 0 AS cnt
      FROM base
      UNION ALL
      SELECT doc_id, pos,
             CASE WHEN fin THEN nfull + 1 ELSE nfull END,
             CASE WHEN fin THEN CAST([] AS VARCHAR[]) ELSE seen2 END,
             CASE WHEN fin THEN 0 ELSE cnt2 END
      FROM (
        SELECT t.doc_id, t.pos, wk.nfull,
               CASE WHEN list_contains(wk.seen, t.w) THEN wk.seen
                    ELSE list_append(wk.seen, t.w) END AS seen2,
               wk.cnt + 1 AS cnt2,
               {MTLD_DEN} * len(CASE WHEN list_contains(wk.seen, t.w)
                                     THEN wk.seen
                                     ELSE list_append(wk.seen, t.w) END)
                 < {MTLD_NUM} * (wk.cnt + 1) AS fin
        FROM {name} wk JOIN {tok} t
          ON t.doc_id = wk.doc_id AND t.pos = wk.pos + 1
      )
    )"""


@query(
    "q_mtld",
    oracle=f"""
    WITH RECURSIVE base AS MATERIALIZED (
      SELECT doc_id, str_split(text, ' ') AS ws,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS n
      FROM documents
    ), tokf AS MATERIALIZED (
      SELECT doc_id, i AS pos, ws[i] AS w
      FROM (SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws))) AS i FROM base)
    ), tokb AS MATERIALIZED (
      SELECT doc_id, i AS pos, ws[len(ws) + 1 - i] AS w
      FROM (SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws))) AS i FROM base)
    ), {_mtld_walk_sql("wf", "tokf")}, {_mtld_walk_sql("wb", "tokb")},
    ends_f AS MATERIALIZED (
      SELECT wf.doc_id,
             wf.nfull + CASE WHEN wf.cnt > 0
               THEN (1.0 - CAST(len(wf.seen) AS DOUBLE) / wf.cnt) / 0.28
               ELSE 0.0 END AS ff
      FROM wf JOIN base ON base.doc_id = wf.doc_id AND wf.pos = base.n
    ), ends_b AS MATERIALIZED (
      SELECT wb.doc_id,
             wb.nfull + CASE WHEN wb.cnt > 0
               THEN (1.0 - CAST(len(wb.seen) AS DOUBLE) / wb.cnt) / 0.28
               ELSE 0.0 END AS fb
      FROM wb JOIN base ON base.doc_id = wb.doc_id AND wb.pos = base.n
    )
    SELECT b.doc_id, b.n AS n_tokens, f.ff AS factors_fwd,
           bb.fb AS factors_bwd,
           CASE WHEN f.ff > 0 AND bb.fb > 0
                THEN (CAST(b.n AS DOUBLE) / f.ff
                      + CAST(b.n AS DOUBLE) / bb.fb) / 2.0 END AS mtld
    FROM base b
    JOIN ends_f f ON f.doc_id = b.doc_id
    JOIN ends_b bb ON bb.doc_id = b.doc_id
    """,
)
def q_mtld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional MTLD per document (module docstring): exact
    integer factor-close test, literal-0.28 partial composition,
    mean of the two direction scores."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_mtld_batch, _MTLD_SCHEMA)


# ------------------------------------------------------------ RAKE


@query(
    "q_rake_keywords",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, source, i AS pos, ws[i] AS w,
             CASE WHEN list_contains({_SW_SQL}, ws[i]) THEN 1 ELSE 0 END
               AS is_stop
      FROM (SELECT doc_id, source, str_split(text, ' ') AS ws,
                   unnest(generate_series(1, len(str_split(text, ' ')))) AS i
            FROM documents)
    ), marked AS MATERIALIZED (
      SELECT doc_id, source, pos, w, is_stop,
             SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS pid
      FROM toks
    ), phrase_words AS MATERIALIZED (
      SELECT * FROM (
        SELECT doc_id, source, pid, pos, w,
               count(*) OVER (PARTITION BY doc_id, pid) AS plen
        FROM marked WHERE is_stop = 0
      ) WHERE plen <= 4
    ), word_stats AS MATERIALIZED (
      SELECT source, w,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS deg
      FROM phrase_words GROUP BY 1, 2
    ), scored_words AS MATERIALIZED (
      SELECT source, w,
             CAST(round(CAST(deg AS DOUBLE) / freq, 6) AS DECIMAL(18,6))
               AS wscore
      FROM word_stats
    ), phrases AS MATERIALIZED (
      SELECT pw.doc_id, pw.source, pw.pid,
             string_agg(pw.w, ' ' ORDER BY pw.pos) AS phrase,
             CAST(max(pw.plen) AS BIGINT) AS n_words,
             SUM(sw.wscore) AS score_d
      FROM phrase_words pw
      JOIN scored_words sw ON sw.source = pw.source AND sw.w = pw.w
      GROUP BY 1, 2, 3
    ), distinct_phrases AS MATERIALIZED (
      SELECT source, phrase, min(n_words) AS n_words,
             min(score_d) AS score_d
      FROM phrases GROUP BY 1, 2
    )
    SELECT source, phrase, n_words,
           CAST(score_d AS DOUBLE) AS score, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY source
                     ORDER BY score_d DESC, phrase) AS BIGINT) AS rank
      FROM distinct_phrases
    ) WHERE rank <= {RAKE_TOPK}
    """,
)
def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE top-{RAKE_TOPK} keyphrases per source (module
    docstring): stopword-delimited phrases, 6dp-quantized
    degree/frequency word scores, exact decimal phrase sums."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    toks = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("pos0", "w"),
    ).select(
        "doc_id",
        "source",
        (F.col("pos0") + 1).alias("pos"),
        "w",
        F.col("w").isin(*STOPWORDS).cast("int").alias("is_stop"),
    )
    marked = toks.withColumn(
        "pid",
        F.sum("is_stop").over(
            Window.partitionBy("doc_id").orderBy("pos")
        ),
    )
    pw = (
        marked.filter(F.col("is_stop") == 0)
        .withColumn(
            "plen", F.count(F.lit(1)).over(Window.partitionBy("doc_id", "pid"))
        )
        .filter(F.col("plen") <= RAKE_MAX_LEN)
    )
    word_stats = pw.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("deg"),
    )
    scored = word_stats.select(
        "source",
        "w",
        F.round(F.col("deg").cast("double") / F.col("freq"), 6)
        .cast("decimal(18,6)")
        .alias("wscore"),
    )
    phrases = (
        pw.join(scored, ["source", "w"])
        .groupBy("doc_id", "source", "pid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.col("w").alias("w")))
                    ),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("phrase"),
            F.max("plen").cast("bigint").alias("n_words"),
            F.sum("wscore").alias("score_d"),
        )
    )
    dp = phrases.groupBy("source", "phrase").agg(
        F.min("n_words").alias("n_words"), F.min("score_d").alias("score_d")
    )
    ranked = dp.withColumn(
        "rank",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.col("score_d").desc(), "phrase"
            )
        )
        .cast("bigint"),
    ).filter(F.col("rank") <= RAKE_TOPK)
    return ranked.select(
        "source",
        "phrase",
        "n_words",
        F.col("score_d").cast("double").alias("score"),
        "rank",
    )


# -------------------------------------------------------- Gries DP


@query(
    "q_gries_dp",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT source, unnest(str_split(text, ' ')) AS w FROM documents
    ), parts AS MATERIALIZED (
      SELECT source, CAST(count(*) AS BIGINT) AS ni FROM toks GROUP BY 1
    ), total AS MATERIALIZED (
      SELECT CAST(SUM(ni) AS BIGINT) AS n FROM parts
    ), wf AS MATERIALIZED (
      SELECT w, source, CAST(count(*) AS BIGINT) AS fwi
      FROM toks GROUP BY 1, 2
    ), topw AS MATERIALIZED (
      SELECT w, fw FROM (
        SELECT w, CAST(SUM(fwi) AS BIGINT) AS fw,
               row_number() OVER (ORDER BY SUM(fwi) DESC, w) AS rn
        FROM wf GROUP BY w
      ) WHERE rn <= {DP_TOP_WORDS}
    )
    SELECT tw.w AS word, tw.fw AS freq,
           CAST(SUM(abs(COALESCE(wf.fwi, 0)*t.n - tw.fw*p.ni)) AS DOUBLE)
             / (2.0 * tw.fw * t.n) AS dp
    FROM topw tw
    CROSS JOIN parts p
    CROSS JOIN total t
    LEFT JOIN wf ON wf.w = tw.w AND wf.source = p.source
    GROUP BY tw.w, tw.fw, t.n
    """,
)
def q_gries_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gries' DP dispersion for the corpus' top-{DP_TOP_WORDS}
    words over source parts: exact cross-multiplied integer
    deviations, one flat division (module docstring)."""
    d = load_table(spark, sf_dir, "documents").select("source", "text")
    toks = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    parts = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("ni")
    )
    total = parts.agg(F.sum("ni").cast("bigint").alias("n"))
    wf = toks.groupBy("w", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("fwi")
    )
    topw = (
        wf.groupBy("w")
        .agg(F.sum("fwi").cast("bigint").alias("fw"))
        .withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.col("fw").desc(), "w")),
        )
        .filter(F.col("rn") <= DP_TOP_WORDS)
        .select("w", "fw")
    )
    grid = topw.crossJoin(F.broadcast(parts)).crossJoin(F.broadcast(total))
    joined = grid.join(
        wf.withColumnRenamed("w", "w2").withColumnRenamed("source", "source2"),
        (F.col("w") == F.col("w2")) & (F.col("source") == F.col("source2")),
        "left",
    )
    dev = F.abs(
        F.coalesce(F.col("fwi"), F.lit(0)) * F.col("n")
        - F.col("fw") * F.col("ni")
    )
    return (
        joined.groupBy("w", "fw", "n")
        .agg(F.sum(dev).alias("devsum"))
        .select(
            F.col("w").alias("word"),
            F.col("fw").alias("freq"),
            (
                F.col("devsum").cast("double")
                / (2.0 * F.col("fw") * F.col("n"))
            ).alias("dp"),
        )
    )


# ----------------------------------------------------------- MSTTR


@query(
    "q_msttr",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT source, doc_id, i AS pos, ws[i] AS w
      FROM (SELECT source, doc_id, str_split(text, ' ') AS ws,
                   unnest(generate_series(1, len(str_split(text, ' ')))) AS i
            FROM documents)
    ), idx AS MATERIALIZED (
      SELECT source, w,
             (row_number() OVER (PARTITION BY source
                                 ORDER BY doc_id, pos) - 1)
               // {MSTTR_SEG} AS seg
      FROM toks
    ), segs AS MATERIALIZED (
      SELECT source, seg,
             CAST(count(*) AS BIGINT) AS sz,
             CAST(count(DISTINCT w) AS BIGINT) AS dist
      FROM idx GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(SUM(dist) AS BIGINT) AS distinct_sum,
           CAST(SUM(dist) AS DOUBLE) / ({MSTTR_SEG} * count(*)) AS msttr
    FROM segs WHERE sz = {MSTTR_SEG}
    GROUP BY source
    """,
)
def q_msttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean segmental TTR per source over {MSTTR_SEG}-token
    segments of the (doc_id, position)-ordered pooled stream; the
    final partial segment drops (module docstring)."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "text"
    )
    toks = d.select(
        "source",
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "w"),
    )
    idx = toks.select(
        "source",
        "w",
        (
            (
                F.row_number().over(
                    Window.partitionBy("source").orderBy("doc_id", "pos")
                )
                - 1
            )
            / MSTTR_SEG
        )
        .cast("bigint")
        .alias("seg"),
    )
    segs = idx.groupBy("source", "seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz"),
        F.countDistinct("w").cast("bigint").alias("dist"),
    )
    return (
        segs.filter(F.col("sz") == MSTTR_SEG)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum("dist").cast("bigint").alias("distinct_sum"),
            (
                F.sum("dist").cast("double")
                / (MSTTR_SEG * F.count(F.lit(1)))
            ).alias("msttr"),
        )
    )
