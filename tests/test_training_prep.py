"""Property tests for the round-3 training-prep operators
(operators/llm_text7.py): BPE merge loop vs a pure-Python reference,
Misra-Gries sketch bounds vs exact counts, and sequence-packing
invariants."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from timestream_travel_spark.operators.llm_text7 import (
    CHUNK_TOKENS,
    HH_SHARE,
    MG_K,
    bpe_merge_table,
    mg_sketch_partitions,
)
from timestream_travel_spark.tables import load_table


def _words(spark, sf_dir) -> list[str]:
    rows = load_table(spark, sf_dir, "documents").select("text").collect()
    out: list[str] = []
    for (text,) in rows:
        out.extend(w for w in re.split(r"\s+", text.strip()) if w)
    return out


def _bpe_reference(words: list[str], n_merges: int) -> list[tuple]:
    """Pure-Python replay of the identical algorithm (word-frequency
    BPE, greedy left-to-right merge application)."""
    vocab = Counter(words)
    state = {w: tuple(w) for w in vocab if len(w) >= 2}
    merges = []
    for rank in range(1, n_merges + 1):
        pair_counts: Counter = Counter()
        for w, syms in state.items():
            f = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        (p1, p2), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, p1, p2, p1 + p2, cnt))
        nxt = {}
        for w, syms in state.items():
            acc = [syms[0]]
            for x in syms[1:]:
                if acc[-1] == p1 and x == p2:
                    acc[-1] = p1 + p2
                else:
                    acc.append(x)
            if len(acc) >= 2:
                nxt[w] = tuple(acc)
        state = nxt
    return merges


def test_bpe_merge_loop_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = bpe_merge_table(docs, n_merges=4)
    want = _bpe_reference(_words(spark, sf_dir), n_merges=4)
    assert got == want


def test_mg_sketch_bounds_and_superset(spark, sf_dir):
    """Merged Misra-Gries estimates: est ≤ true ≤ est + n/(K+1), and
    every true heavy hitter survives the thresholded query."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.repartition(8).select(
        F.explode(
            F.filter(F.split(F.trim("text"), r"\s+"), lambda w: w != "")
        ).alias("word")
    )
    est = {
        r["word"]: r["est"]
        for r in mg_sketch_partitions(words)
        .groupBy("word")
        .agg(F.sum("cnt").alias("est"))
        .collect()
    }
    true = Counter(_words(spark, sf_dir))
    n = sum(true.values())
    err = n / (MG_K + 1)
    for w, e in est.items():
        assert e <= true[w] <= e + err, (w, e, true[w])
    # superset: every true HH clears the query's lowered threshold
    for w, t in true.items():
        if t > n * HH_SHARE:
            assert w in est and est[w] > n * (HH_SHARE - 1.0 / (MG_K + 1)), w


def test_pack_sequences_invariants(spark, sf_dir):
    """Every chunk except the last is exactly CHUNK_TOKENS; totals
    reconcile with the corpus token count; doc spans are contiguous."""
    import __spark_entry__ as entrymod

    res = entrymod.queries()["q_pack_sequences"](spark, sf_dir)
    rows = sorted((r["chunk_id"], r["n_tokens"], r["first_doc"], r["last_doc"]) for r in res.collect())
    assert [c for c, *_ in rows] == list(range(len(rows)))
    assert all(t == CHUNK_TOKENS for _, t, _, _ in rows[:-1])
    assert 0 < rows[-1][1] <= CHUNK_TOKENS
    total = sum(t for _, t, _, _ in rows)
    assert total == len(_words(spark, sf_dir))
    # chunks consume docs in doc_id order: the next chunk starts at the
    # boundary-straddling doc or later, never backwards
    for (_, _, _, last_prev), (_, _, first_cur, _) in zip(rows, rows[1:]):
        assert first_cur >= last_prev


def test_pack_sequences_plan_has_no_global_corpus_window(spark, sf_dir):
    """The corpus-side cumsum must window per shard (hashpartitioning
    on shard), never pull the whole corpus through one task; the only
    SinglePartition exchange allowed is the tiny shard-offset table."""
    import __spark_entry__ as entrymod

    physical = (
        entrymod.queries()["q_pack_sequences"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(shard" in physical
    # the shard-offset branch reads only (doc_id→shard, n_tok): its
    # single-partition window input is aggregate rows, not the corpus
    assert physical.count("SinglePartition") <= 1


def test_oov_vocab_join_is_broadcast(spark, sf_dir):
    import __spark_entry__ as entrymod

    physical = (
        entrymod.queries()["q_oov_rate"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in physical


def test_embedding_quantize_codes_roundtrip(spark, sf_dir):
    """Reconstruction error per dimension is bounded by scale/2 per
    element: abs_err_sum ≤ n · (dmax−dmin)/255/2 (+ float slack)."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["q_embedding_quantize"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        bound = r["n"] * (r["dmax"] - r["dmin"]) / 255.0 / 2.0
        assert r["abs_err_sum"] <= bound * 1.01 + 1e-9, r


def test_bloom_probe_no_false_negatives_and_fp_bound(spark, sf_dir):
    """Planted verbatim duplicates must ALL flag probably_dup (Bloom
    filters cannot false-negative); novel docs flag at below ~10× the
    designed FP rate (slack for small-sample variance)."""
    import math

    import __spark_entry__ as entrymod

    from timestream_travel_spark.operators.bloom import K_HASHES, M_BITS
    from timestream_travel_spark.tables import load_table

    rows = entrymod.queries()["q_bloom_dedup_probe"](spark, sf_dir).collect()
    dup_rows = [r for r in rows if r["probe_id"] < 1_000_000]
    novel_rows = [r for r in rows if r["probe_id"] >= 1_000_000]
    assert dup_rows and novel_rows
    assert all(r["probably_dup"] for r in dup_rows)
    n = load_table(spark, sf_dir, "documents").count()
    fp_rate = (1 - math.exp(-K_HASHES * n / M_BITS)) ** K_HASHES
    observed = sum(1 for r in novel_rows if r["probably_dup"]) / len(novel_rows)
    assert observed <= max(10 * fp_rate, 0.02), (observed, fp_rate)


def test_length_buckets_approx_tracks_exact(spark, sf_dir):
    """Approx-quantile bucketing must roughly reproduce the exact
    ntile populations (equal deciles): every bucket within ±30% of
    the ideal size, and total docs/tokens reconcile exactly."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    exact = {r["bucket"]: r for r in qs["q_length_buckets"](spark, sf_dir).collect()}
    approx = {r["bucket"]: r for r in qs["q_length_buckets_approx"](spark, sf_dir).collect()}
    n_total = sum(r["n_docs"] for r in exact.values())
    assert sum(r["n_docs"] for r in approx.values()) == n_total
    assert sum(r["sum_tok"] for r in approx.values()) == sum(
        r["sum_tok"] for r in exact.values()
    )
    ideal = n_total / len(exact)
    for r in approx.values():
        assert r["n_docs"] <= ideal * 1.3 + 2, r


def test_pack_chunks_scale_smoke(spark):
    """The prefix-sum packing machinery on a 2M-doc synthetic corpus
    (~400M tokens): totals reconcile exactly and every chunk except
    the last is full — no global window, so this is shard-parallel
    all the way."""
    from pyspark.sql import functions as SF

    from timestream_travel_spark.operators.llm_text7 import pack_chunks

    toks = spark.range(2_000_000).select(
        SF.col("id").alias("doc_id"), (SF.col("id") % 400 + 1).alias("n_tok")
    )
    res = pack_chunks(toks, budget=2048)
    agg = res.agg(
        SF.sum("n_tokens").alias("tok"),
        SF.count(SF.lit(1)).alias("n_chunks"),
        SF.sum(SF.when(SF.col("n_tokens") != 2048, 1).otherwise(0)).alias("partial"),
    ).collect()[0]
    expected_tokens = sum(i % 400 + 1 for i in range(2_000_000))
    assert agg["tok"] == expected_tokens
    assert agg["partial"] <= 1
    assert agg["n_chunks"] == -(-expected_tokens // 2048)


def test_bpe_tokenize_matches_python_reference(spark, sf_dir):
    """Per-lang BPE token counts after applying the learned merges
    must equal a pure-Python replay."""
    import __spark_entry__ as entrymod

    from timestream_travel_spark.tables import load_table

    rows = load_table(spark, sf_dir, "documents").select("lang", "text").collect()
    merges = [(m[1], m[2]) for m in _bpe_reference(_words(spark, sf_dir), 4)]
    want: dict[str, list[int]] = {}
    for lang, text in rows:
        for w in re.split(r"\s+", text.strip()):
            if not w:
                continue
            syms = list(w)
            for p1, p2 in merges:
                acc = [syms[0]]
                for x in syms[1:]:
                    if acc[-1] == p1 and x == p2:
                        acc[-1] = p1 + p2
                    else:
                        acc.append(x)
                syms = acc
            want.setdefault(lang, [0, 0, 0])
            want[lang][0] += 1
            want[lang][1] += len(syms)
            want[lang][2] += len(w)
    got = {
        r["lang"]: (r["n_words"], r["n_bpe_tokens"], r["n_chars"])
        for r in entrymod.queries()["q_bpe_tokenize"](spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_packed_sequences_reconstruct_corpus(spark, sf_dir, tmp_path):
    """Flattening the written training shards in chunk order must
    reproduce the exact whitespace token stream of the corpus in
    doc_id order; all chunks but the last are full."""
    from timestream_travel_spark.pipeline.training_export import (
        packed_sequences,
        write_training_shards,
    )
    from timestream_travel_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    dest = str(tmp_path / "shards")
    n_chunks = write_training_shards(docs, dest, budget=128)
    got = spark.read.parquet(dest).orderBy("chunk_id").collect()
    assert len(got) == n_chunks
    flat = [t for r in got for t in r["tokens"]]
    want = []
    for _, text in sorted(
        (r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()
    ):
        want.extend(w for w in re.split(r"\s+", text.strip()) if w)
    assert flat == want
    assert all(r["n_tokens"] == 128 for r in got[:-1])
    # manifest agreement: same chunk count as the registry query's math
    assert n_chunks == -(-len(want) // 128)
    # direct (non-written) path agrees
    direct = packed_sequences(docs, budget=128).agg(
        F.sum("n_tokens").alias("s")
    ).collect()[0]["s"]
    assert direct == len(want)


def test_cm_sketch_overestimates_within_bound(spark, sf_dir):
    """Count-Min: est ≥ true for every probed token, and the
    overestimate stays within 3·n/W (generous vs the e·n/W w.h.p.
    bound, deterministic here)."""
    import __spark_entry__ as entrymod

    from timestream_travel_spark.operators.llm_text9 import CM_W

    rows = entrymod.queries()["q_cm_sketch_estimates"](spark, sf_dir).collect()
    assert len(rows) == 30
    n = len(_words(spark, sf_dir))
    for r in rows:
        assert r["est_cnt"] >= r["true_cnt"], r
        assert r["est_cnt"] - r["true_cnt"] <= 3 * n / CM_W + 1, r


def test_split_leakage_detects_planted_cross_split_dup(spark):
    """A text planted under two doc_ids that hash to different splits
    must surface in the leakage report (doc_id=1 → train, 0 → test
    under the md5 bucket rule)."""
    from timestream_travel_spark.operators.llm_text7 import md5_bucket
    from timestream_travel_spark.operators.llm_text9 import q_split_leakage  # noqa: F401

    df = spark.createDataFrame(
        [(0, "identical leaked text"), (1, "identical leaked text"), (2, "unique text")],
        "doc_id bigint, text string",
    )
    b = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("int") % 100
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    fp = F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
    leaks = (
        df.select(fp.alias("fp"), split.alias("split"))
        .groupBy("fp")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert leaks == 1
    assert md5_bucket is not None


def test_quantized_ann_recall(spark, sf_dir):
    """Quantized top-10 must recall ≥0.8 of the full-precision
    top-10 (8-bit codes are near-lossless at this dim)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    exact = {r["vec_id"] for r in qs["q_cosine_topk"](spark, sf_dir).collect()}
    quant = {r["vec_id"] for r in qs["q_ann_quantized_topk"](spark, sf_dir).collect()}
    assert len(exact & quant) / len(exact) >= 0.8


def _bpe_reference_batched(words: list[str], n_merges: int, batch: int) -> list[tuple]:
    """Pure-Python replay of the batched variant: per round take the
    top symbol-disjoint `batch` pairs from one count pass, apply all
    in a single left-to-right sweep."""
    vocab = Counter(words)
    state = {w: tuple(w) for w in vocab if len(w) >= 2}
    merges: list[tuple] = []
    while len(merges) < n_merges and state:
        pair_counts: Counter = Counter()
        for w, syms in state.items():
            f = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        ranked = sorted(pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        want = min(batch, n_merges - len(merges))
        selected, used = [], set()
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
            merges.append((len(merges) + 1, p1, p2, p1 + p2, cnt))
        fuse = {(p1, p2): p1 + p2 for p1, p2, _ in selected}
        nxt = {}
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


def test_bpe_batched_merges_match_python_reference(spark, sf_dir):
    """batch=2 halves the round count; the merge table matches a pure
    Python replay of the same batched algorithm, and batch=1 stays
    exactly the classical loop."""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(spark, sf_dir)
    assert bpe_merge_table(docs, n_merges=4, batch=1) == _bpe_reference(words, 4)
    got = bpe_merge_table(docs, n_merges=4, batch=2)
    want = _bpe_reference_batched(words, n_merges=4, batch=2)
    assert got == want
    assert len(got) == 4
