"""LLM-pipeline operators, part 7 (round 3): the last mile before a
training run — deterministic train/val/test splitting, GPT-style
concat-and-chunk sequence packing (as a two-phase distributed prefix
sum), a Misra-Gries mergeable heavy-hitters sketch, and an iterative
BPE merge trainer.

Scale shapes: the split is a stateless hash bucket (embarrassingly
parallel); packing computes the global token offset without a global
window — shard-local cumsum + a tiny shard-offset join — so no stage
ever single-threads the corpus; the MG sketch shuffles only k
counters per partition instead of the full token stream; the BPE loop
is driver-coordinated like k-means but each iteration moves one
(pair, count) row to the driver, never data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

# ---------------------------------------------------------------- split


def md5_bucket(key: Column, n: int = 100) -> Column:
    """Deterministic engine-portable bucket in [0, n): first 16 bits
    of md5(key) mod n — same rows land in the same split on every
    engine, every run, every partition layout (rand() guarantees none
    of those)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("int") % n


@query(
    "q_train_split_manifest",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS n_tok,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 100 AS b
      FROM documents
    )
    SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM d GROUP BY split, lang
    """,
)
def q_train_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split manifest: every
    document is assigned by md5(doc_id) bucket (never rand(), so the
    split is reproducible and cluster-stable), audited per split and
    language with document/token counts and an id checksum. The
    assignment is a stateless row expression — the split of a 100 TB
    corpus is a filter, not a shuffle."""
    d = load_table(spark, sf_dir, "documents")
    b = md5_bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split")
    )
    return (
        d.select(split, "lang", F.size(doc_words("text")).alias("n_tok"), "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
    )


# ---------------------------------------------------------------- packing

CHUNK_TOKENS = 256  # training sequence length
PACK_SHARD = 256  # docs per prefix-sum shard


@query(
    "q_pack_sequences",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS n_tok
      FROM documents
    ),
    nz AS (SELECT * FROM d WHERE n_tok > 0),
    c AS (
      SELECT doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM nz
    ),
    e AS (
      SELECT doc_id, n_tok, off,
             unnest(range(CAST(off // {CHUNK_TOKENS} AS BIGINT),
                          CAST((off + n_tok - 1) // {CHUNK_TOKENS} + 1 AS BIGINT))) AS chunk_id
      FROM c
    )
    SELECT chunk_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(least((chunk_id + 1) * {CHUNK_TOKENS}, off + n_tok)
                    - greatest(chunk_id * {CHUNK_TOKENS}, off)) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM e GROUP BY chunk_id
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: documents are
    concatenated in doc_id order and cut into fixed {CHUNK_TOKENS}-token
    training sequences; output is the per-chunk manifest (contributing
    docs, tokens, doc span). The global token offset is a distributed
    prefix sum — shard-local window cumsum (shard = doc_id div
    {PACK_SHARD}, so shards are contiguous id ranges) plus an exclusive
    shard-offset table joined back — NOT a single global window, so no
    stage serializes the corpus through one task. The shard-offset
    table has |corpus|/{PACK_SHARD} rows (the only all-to-one step, a
    two-level recursion away from any practical scale); the join is
    size-driven via AQE, not force-broadcast."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.size(doc_words("text")).alias("n_tok"))
    return pack_chunks(toks)


def doc_offsets(toks: DataFrame) -> DataFrame:
    """(doc_id, n_tok, off): each document's exclusive global token
    offset in doc_id order, via the two-phase distributed prefix sum
    (shard-local window cumsum + tiny shard-offset join) — no global
    window anywhere."""
    nz = toks.filter(F.col("n_tok") > 0)
    nz = nz.withColumn("shard", F.floor(F.col("doc_id") / PACK_SHARD))
    shard_w = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    shard_off = (
        nz.groupBy("shard")
        .agg(F.sum("n_tok").alias("tot"))
        .withColumn("shard_off", F.coalesce(F.sum("tot").over(shard_w), F.lit(0)))
        .select("shard", "shard_off")
    )
    local_w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = (F.coalesce(F.sum("n_tok").over(local_w), F.lit(0)) + F.col("shard_off")).alias(
        "off"
    )
    return nz.join(shard_off, "shard").select("doc_id", "n_tok", off)


def pack_chunks(toks: DataFrame, budget: int = CHUNK_TOKENS) -> DataFrame:
    """Per-chunk packing manifest for any (doc_id, n_tok) frame — the
    distributed-prefix-sum core of q_pack_sequences, factored out so
    the scale test can feed synthetic multi-million-row corpora."""
    c = doc_offsets(toks)
    B = budget
    first = F.floor(F.col("off") / B)
    last = F.floor((F.col("off") + F.col("n_tok") - 1) / B)
    e = c.select(
        "doc_id",
        "n_tok",
        "off",
        F.explode(F.sequence(first, last)).alias("chunk_id"),
    )
    tok_in_chunk = F.least((F.col("chunk_id") + 1) * B, F.col("off") + F.col("n_tok")) - F.greatest(
        F.col("chunk_id") * B, F.col("off")
    )
    return e.groupBy("chunk_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(tok_in_chunk).cast("bigint").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ------------------------------------------------------- Misra-Gries sketch

MG_K = 2000  # counters per partition; merged error ≤ n/(K+1)
HH_SHARE = 1.0 / 200.0  # heavy-hitter threshold (matches q_heavy_hitters)


def mg_sketch_partitions(words: DataFrame, k: int = MG_K) -> DataFrame:
    """Per-partition Misra-Gries counters: one pass, bounded memory
    (k counters), no token ever shuffles — only the k×P residual
    counters do. est(w) ∈ [true(w) − n/(k+1), true(w)] after the
    counter merge (Agarwal et al., "Mergeable Summaries", PODS'12 —
    public result)."""
    import pandas as pd

    def sketch(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for w in pdf["word"]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < k:
                    counters[w] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"word": list(counters.keys()), "cnt": list(counters.values())}
        )

    return words.mapInPandas(sketch, schema="word string, cnt long")


@query("q_mg_heavy_hitters")
def q_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters via a mergeable Misra-Gries sketch:
    per-partition bounded-memory counting, then a counter merge
    (groupBy-sum over ≤ k×P rows) and a threshold that keeps every
    true >1/200 token (filter at n·(1/200 − 1/(K+1)), the sketch's
    worst-case underestimate). This is the one-pass/no-token-shuffle
    twin of q_heavy_hitters, which is its exact verifier — pytest
    asserts the superset property and the error bound. Rows-only
    oracle: counter residuals depend on partition layout."""
    d = load_table(spark, sf_dir, "documents")
    words = d.repartition(8).select(F.explode(doc_words("text")).alias("word"))
    sketches = mg_sketch_partitions(words)
    merged = sketches.groupBy("word").agg(F.sum("cnt").alias("est"))
    total = words.agg(F.count(F.lit(1)).alias("n"))
    floor_share = HH_SHARE - 1.0 / (MG_K + 1)
    return (
        merged.join(F.broadcast(total))
        .filter(F.col("est") > F.col("n") * floor_share)
        .select("word", F.col("est").cast("bigint").alias("est"))
        .orderBy(F.desc("est"), F.asc("word"))
    )


# ---------------------------------------------------------------- BPE loop

BPE_MERGES = 4


def bpe_merge_table(
    docs: DataFrame, n_merges: int = BPE_MERGES, batch: int = 1
) -> list[tuple]:
    """Train the first `n_merges` BPE merges over the corpus.

    r15 optimization (guide §1.2 "the distributed algorithm" /
    bounded-driver-state precedent of q_kcore_trade, HL, graph18):
    the corpus-sized stage — explode words, count frequencies — stays
    distributed (one map-side-combined aggregation), and the trainer
    loop runs DRIVER-SIDE over the collected (word, freq) table. That
    table is the tokenizer-training working set: vocab-bounded
    (millions of rows at 100 TB, not trillions), which is exactly how
    reference BPE trainers operate (Sennrich et al. 2016 learn_bpe
    trains from an in-memory word-count dictionary). The per-round
    pair-count aggregation, deterministic argmax, and greedy merge
    fold are byte-identical to the distributed formulation below
    (bpe_merge_table_distributed, the documented path when the vocab
    itself exceeds driver memory) — a parity pytest pins
    driver == distributed == pure-Python-replay. Perf: the
    distributed loop paid 2 Spark jobs per merge round (7.5 s at
    sf0.1 in BENCH_r14); this pays 1 aggregation job total.
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    rows = (
        docs.repartition(par)
        .select(F.explode(doc_words("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.length("w") >= 2)
        .collect()
    )
    # driver-side trainer — the same batched algorithm, same
    # deterministic ordering (cnt DESC, then lexicographic pair), same
    # over-fetch + symbol-disjoint selection, same greedy fold
    vocab = {r["w"]: int(r["freq"]) for r in rows}
    state = {w: tuple(w) for w in vocab}
    merges: list[tuple] = []
    while len(merges) < n_merges and state:
        pair_counts: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            f = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
        if not pair_counts:
            break
        ranked = sorted(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want = min(batch, n_merges - len(merges))
        selected: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for (p1, p2), cnt in ranked[: want * 4]:
            if len(selected) >= want:
                break
            if {p1, p2, p1 + p2} & used:
                continue
            selected.append((p1, p2, cnt))
            used |= {p1, p2, p1 + p2}
        if not selected:
            break
        for p1, p2, cnt in selected:
            merges.append((len(merges) + 1, p1, p2, p1 + p2, int(cnt)))
        fuse = {(p1, p2): p1 + p2 for p1, p2, _ in selected}
        nxt: dict[str, tuple] = {}
        for w, syms in state.items():
            acc = [syms[0]]
            for x in syms[1:]:
                m = fuse.get((acc[-1], x))
                if m is not None:
                    acc[-1] = m
                else:
                    acc.append(x)
            if len(acc) >= 2:
                nxt[w] = tuple(acc)
        state = nxt
    return merges


def bpe_merge_table_distributed(
    docs: DataFrame, n_merges: int = BPE_MERGES, batch: int = 1
) -> list[tuple]:
    """Train the first `n_merges` BPE merges over the corpus in the
    classical word-frequency formulation (Sennrich et al. 2016,
    public): the distributed state is the DISTINCT word table with
    occurrence counts — vocab-bounded, not corpus-bounded — and pair
    counts are frequency-weighted. Per iteration: weighted pair
    groupBy (partial-aggregated, key space ≤ alphabet²-bounded), a
    deterministic argmax (cnt desc, then lexicographic pair), and a
    left-to-right greedy merge fold over each distinct word's symbol
    array. Only the single winning (pair, count) row reaches the
    driver each round; the word table stays distributed and is
    persisted between rounds to stop lineage recompute — the
    k-means-loop shape. At 100 TB the word-frequency table is the
    tokenizer-training working set (millions of rows, not trillions):
    one corpus-sized aggregation up front, vocab-sized work per
    round.

    batch > 1 is the round-count lever for real vocabularies (the
    SCALING.md item): each round selects up to `batch`
    SYMBOL-DISJOINT pairs from the one pair-count aggregation and
    applies them in a single fold pass. Disjointness (no shared p1/p2
    and no selected pair equal to another's merged symbol) makes the
    batched application equal to applying those merges sequentially,
    and the recorded counts — the pre-batch counts — are exact for
    each selected pair because merging a disjoint pair cannot create
    or destroy its occurrences. The trade vs classical BPE: a new
    pair involving a just-merged symbol cannot win until the NEXT
    round, so batch=k divides the round count by ~k at the cost of a
    slightly different (still deterministic) merge order. batch=1 is
    exactly the classical loop."""
    # pre-explode repartition (minhash_signatures rule): one parquet
    # split must not serialize the corpus word explode onto one core
    par = docs.sparkSession.sparkContext.defaultParallelism
    syms = (
        docs.repartition(par).select(F.explode(doc_words("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.filter(F.split(F.col("w"), ""), lambda ch: ch != "").alias("a"), "freq"
        )
    )
    syms = syms.filter(F.size("a") >= 2).persist()
    syms.count()
    merges: list[tuple] = []
    while len(merges) < n_merges:
        pairs = syms.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("a") - 1),
                    lambda i: F.struct(
                        F.element_at("a", i).alias("p1"),
                        F.element_at("a", i + 1).alias("p2"),
                    ),
                )
            ).alias("p"),
            "freq",
        )
        want = min(batch, n_merges - len(merges))
        # over-fetch so disjoint filtering can skip conflicting pairs;
        # the fetch is pair-rank-sized, never corpus-sized
        top = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("p.p1"), F.asc("p.p2"))
            .head(want * 4)
        )
        if not top:
            break
        selected: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for row in top:
            (p1, p2), cnt = row["p"], row["cnt"]
            if len(selected) >= want:
                break
            if {p1, p2, p1 + p2} & used:
                continue
            selected.append((p1, p2, int(cnt)))
            used |= {p1, p2, p1 + p2}
        if not selected:
            break
        for p1, p2, cnt in selected:
            merges.append((len(merges) + 1, p1, p2, p1 + p2, cnt))

        # left-to-right greedy merge fold applying every selected
        # (disjoint) pair in one pass: if last(acc)==p1_i and x==p2_i,
        # fuse pair i; else append. Pure expression tree — no UDF.
        def make_step(sel):
            def step(acc, x):
                expr = F.concat(acc, F.array(x))
                for p1, p2, _ in reversed(sel):
                    expr = F.when(
                        (F.element_at(acc, -1) == p1) & (x == p2),
                        F.concat(
                            F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(p1 + p2))
                        ),
                    ).otherwise(expr)
                return expr

            return step

        fold = F.aggregate(
            F.slice(F.col("a"), 2, F.greatest(F.size("a") - 1, F.lit(0))),
            F.slice(F.col("a"), 1, 1),
            make_step(tuple(selected)),
        )
        nxt = syms.select(fold.alias("a"), "freq").filter(F.size("a") >= 2).persist()
        nxt.count()
        syms.unpersist()
        syms = nxt
    syms.unpersist()
    return merges


@query("q_bpe_merge_loop")
def q_bpe_merge_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 4 BPE tokenizer merges (rank, pair, merged symbol,
    count). Iterative — driver-coordinated loop, so no SQL oracle
    (same category as k-means); pytest replays the identical
    algorithm in pure Python over the collected corpus and asserts
    the merge tables match exactly."""
    from timestream_travel_spark.tables import bounded_df

    d = load_table(spark, sf_dir, "documents")
    merges = bpe_merge_table(d)
    return bounded_df(
        spark, merges, "merge_rank int, p1 string, p2 string, merged string, cnt bigint"
    ).orderBy("merge_rank")


def _merge_fold(arr_col: Column, p1: str, p2: str) -> Column:
    """Left-to-right greedy application of one merge to a symbol
    array — same fold as the trainer."""
    return F.aggregate(
        F.slice(arr_col, 2, F.greatest(F.size(arr_col) - 1, F.lit(0))),
        F.slice(arr_col, 1, 1),
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == p1) & (x == p2),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(p1 + p2))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


@query("q_bpe_tokenize")
def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained BPE merge table to tokenize the corpus and
    report per-language compression: token counts fall as the 4
    learned merges fuse frequent pairs. The fold runs once per
    DISTINCT word (vocab-bounded, like the trainer) and per-document
    counts come from joining token counts back onto the exploded
    corpus — the expensive symbolic work never touches duplicate
    words. Rows-only oracle (depends on the iterative trainer);
    pytest replays the pipeline in pure Python."""
    d = load_table(spark, sf_dir, "documents")
    merges = bpe_merge_table(d)
    dw = d.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).select("doc_id", "lang", F.explode(doc_words("text")).alias("w"))
    wtab = dw.select("w").distinct().select(
        "w", F.filter(F.split(F.col("w"), ""), lambda ch: ch != "").alias("a")
    )
    for _, p1, p2, _, _ in merges:
        wtab = wtab.select("w", _merge_fold(F.col("a"), p1, p2).alias("a"))
    wn = wtab.select("w", F.size("a").alias("n_sym"), F.length("w").alias("n_chr"))
    return (
        dw.join(wn, "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
            F.sum("n_chr").cast("bigint").alias("n_chars"),
            F.round(
                F.sum("n_chr").cast("double") / F.sum("n_sym"), 4
            ).alias("chars_per_token"),
        )
    )
