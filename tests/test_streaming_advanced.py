"""Advanced streaming: exact stateful EWMA (batch-equivalence) and a
watermarked stream-stream interval join (B.10 completeness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from timestream_travel_spark.streaming.ewma import ALPHA, streaming_ewma
from timestream_travel_spark.tables import load_table


def _stage_ordered(spark, sf_dir, tmp_path, n_files=4):
    """Event-time-ordered file drops: file i holds the i-th time
    slice, so per-key arrival order matches event order."""
    from pyspark.sql.window import Window

    src = str(tmp_path / "ord_src")
    ev = load_table(spark, sf_dir, "events")
    ev.coalesce(1).withColumn(
        "bucket", F.ntile(n_files).over(Window.orderBy("ts", "event_id"))
    ).write.partitionBy("bucket").mode("overwrite").parquet(src)
    return f"{src}/bucket=*"


def test_streaming_ewma_matches_exact_recurrence(spark, sf_dir, tmp_path):
    src = _stage_ordered(spark, sf_dir, tmp_path)
    stream = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_ewma(stream)
        .writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["event_id"]: r["ewma"] for r in spark.sql("SELECT * FROM ewma_out").collect()}

    # exact recurrence computed driver-side from the batch fixture
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .orderBy("ts", "event_id")
        .collect()
    )
    want: dict[int, float] = {}
    state: dict[int, float] = {}
    for r in rows:
        prev = state.get(r["user_id"])
        cur = r["value"] if prev is None else ALPHA * r["value"] + (1 - ALPHA) * prev
        state[r["user_id"]] = cur
        want[r["event_id"]] = cur

    assert len(got) == len(want)
    worst = max(abs(got[k] - want[k]) for k in want)
    assert worst < 1e-9, f"streaming EWMA diverges from exact recurrence by {worst}"


def test_stream_stream_interval_join(spark, sf_dir, tmp_path):
    """Watermarked stream-stream join: purchases matched to clicks by
    the same user within the preceding hour."""
    src = _stage_ordered(spark, sf_dir, tmp_path / "ssj", n_files=2)
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"

    def stream():
        return spark.readStream.schema(schema).parquet(src)

    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id"))
        .withWatermark("p_ts", "30 minutes")
    )
    clicks = (
        stream()
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id"))
        .withWatermark("c_ts", "30 minutes")
    )
    joined = purchases.join(
        clicks,
        F.expr("p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["p_id"], r["c_id"]) for r in spark.sql("SELECT p_id, c_id FROM ssj_out").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    want = {
        (r["p_id"], r["c_id"])
        for r in p.join(
            c, F.expr("p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts")
        ).collect()
    }
    # streaming emits a subset bounded by watermark semantics, but on
    # this in-order replay it should find (nearly) everything
    assert got <= want
    assert len(got) >= 0.9 * len(want), f"stream join found {len(got)}/{len(want)}"


def test_drop_duplicates_within_watermark(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate event_ids arriving
    within the watermark horizon are dropped even when their ts
    differs slightly (the at-least-once-ingest dedup primitive)."""
    src = str(tmp_path / "ddw_src")
    ev = load_table(spark, sf_dir, "events").limit(300)
    dup = ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 5 SECONDS"))
    ev.unionByName(dup).coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
        ).parquet(src)
    )
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("ddw_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(*) AS n, count(distinct event_id) AS d FROM ddw_out").collect()[0]
    assert n["n"] == 300 and n["d"] == 300


def test_bloom_dedup_ingest_stream(spark, sf_dir, tmp_path):
    """Streaming incremental-ingest dedup: batch 2 re-sends half of
    batch 1 (must be dropped by the persistent Bloom bitmap) plus
    novel docs (must be accepted); the bitmap state stays bounded."""
    import os

    from pyspark.sql import functions as F

    from timestream_travel_spark.operators.bloom import M_BITS
    from timestream_travel_spark.streaming.ingest import bloom_dedup_sink
    from timestream_travel_spark.tables import load_table

    src = tmp_path / "src"
    corpus_dir = str(tmp_path / "corpus")
    bitmap_dir = str(tmp_path / "bitmap")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(40)
    b1 = docs.filter(F.col("doc_id") < 20)
    # batch 2: duplicates of batch 1 (shifted ids — dedup is by TEXT
    # fingerprint, not id) + genuinely novel rows
    dup_half = b1.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    novel = docs.filter(F.col("doc_id") >= 20)
    b2 = dup_half.unionByName(novel)

    b1.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    schema = "doc_id bigint, text string"

    def run_batch(path):
        stream = (
            spark.readStream.schema(schema).parquet(path)
        )
        q = bloom_dedup_sink(stream, corpus_dir, bitmap_dir, ckpt).trigger(
            availableNow=True
        ).start()
        q.awaitTermination(120)

    run_batch(str(src / "b1"))
    n_after_b1 = spark.read.parquet(corpus_dir).count()
    assert n_after_b1 == b1.count()

    b2.coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))
    ckpt2 = str(tmp_path / "ckpt2")
    stream2 = spark.readStream.schema(schema).parquet(str(src / "b2"))
    q2 = bloom_dedup_sink(stream2, corpus_dir, bitmap_dir, ckpt2).trigger(
        availableNow=True
    ).start()
    q2.awaitTermination(120)

    final = spark.read.parquet(corpus_dir)
    kept_ids = {r["doc_id"] for r in final.collect()}
    # every resent duplicate dropped (no false negatives)
    assert not any(i >= 10_000 for i in kept_ids)
    # all novel docs accepted (FP rate ~0 at this fill factor)
    assert {r["doc_id"] for r in novel.collect()} <= kept_ids
    # bitmap state bounded
    assert spark.read.parquet(bitmap_dir).count() <= M_BITS // 64


def test_streaming_corpus_prep_matches_batch(spark, sf_dir, tmp_path):
    """The streaming corpus-prep pipeline must produce row-for-row
    the same prepared corpus as the batch expression over the same
    input (stateless pipeline ⇒ exact parity, not just counts)."""
    from timestream_travel_spark.streaming.corpus import (
        corpus_prep_stream,
        prepare_corpus,
    )
    from timestream_travel_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "src")
    docs.write.parquet(src)

    dest = str(tmp_path / "prepared")
    ckpt = str(tmp_path / "ckpt")
    schema = docs.schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = corpus_prep_stream(stream, dest, ckpt).trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = {tuple(r) for r in spark.read.parquet(dest).collect()}
    want = {tuple(r) for r in prepare_corpus(docs).collect()}
    assert got == want and len(want) > 0
    # the gate actually drops something on the fixture
    assert len(want) < docs.count()


def test_streaming_trending_mg_state(spark, sf_dir, tmp_path):
    """Trending-terms summary across micro-batches: after replaying
    the corpus in parts, the persistent Misra-Gries state (≤ k rows)
    contains every true heavy token with the n/(k+1) merged-summary
    error bound, and never overestimates."""
    import os

    from pyspark.sql import functions as F

    from timestream_travel_spark.operators.llm_text6 import doc_words
    from timestream_travel_spark.streaming.trending import (
        MG_STATE_K,
        trending_sink,
        trending_topk,
    )
    from timestream_travel_spark.tables import load_table

    src = tmp_path / "src"
    state_dir = str(tmp_path / "mg_state")
    os.makedirs(src)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    schema = "doc_id bigint, text string"
    # two separate replays exercise merge-with-existing-state
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(2).write.mode(
        "overwrite"
    ).parquet(str(src / "b1"))
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(2).write.mode(
        "overwrite"
    ).parquet(str(src / "b2"))

    for i, part in enumerate(("b1", "b2")):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / part))
        )
        q = trending_sink(
            stream, state_dir, str(tmp_path / f"ckpt{i}")
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    state = spark.read.parquet(state_dir)
    est = {r["word"]: r["cnt"] for r in state.collect()}
    assert len(est) <= MG_STATE_K

    truth_rows = (
        docs.select(F.explode(doc_words("text")).alias("word"))
        .groupBy("word")
        .count()
        .collect()
    )
    truth = {r["word"]: r["count"] for r in truth_rows}
    n = sum(truth.values())
    bound = n / (MG_STATE_K + 1)
    for word, e in est.items():
        assert e <= truth[word], f"{word} overestimated"
        assert truth[word] - e <= bound
    for word, c in truth.items():
        if c > bound:
            assert word in est, f"heavy token {word} missing from summary"

    top = trending_topk(spark, state_dir, 5).collect()
    assert len(top) == 5 and top[0]["cnt"] >= top[-1]["cnt"]


def test_stream_static_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static enrichment: replaying the stream through the
    static-dim join yields exactly the batch join's per-window tier
    aggregates for every closed window."""
    import glob
    import os

    from pyspark.sql import functions as F

    from timestream_travel_spark.streaming.jobs import (
        stream_static_enriched_counts,
        user_tier_dim,
    )
    from timestream_travel_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    dim = user_tier_dim(ev)

    src = str(tmp_path / "src")
    ev.orderBy("ts").coalesce(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_static_enriched_counts(stream, dim)
        .writeStream.format("memory")
        .queryName("tier_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = (
        ev.join(dim, "user_id")
        .groupBy(F.window("ts", "1 day").alias("w"), "tier")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "tier", "n_events", "sum_value")
    )
    got = {
        (r["window_start"], r["tier"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tier_counts").collect()
    }
    want = {
        (r["window_start"], r["tier"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got, "no closed windows emitted"
    for k, v in got.items():
        assert want[k] == v
    assert len(got) >= 0.9 * len(want)


def test_streaming_cusum_matches_batch_operator(spark, sf_dir, tmp_path):
    """Streaming CUSUM replay equals the batch q_cusum_changepoints
    operator value-for-value on the purchase series (same IEEE
    recurrence, state carried across micro-batches)."""
    from timestream_travel_spark.operators.timeseries7 import q_cusum_changepoints
    from timestream_travel_spark.streaming.cusum import streaming_cusum

    src = _stage_ordered(spark, sf_dir, tmp_path)
    stream = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_cusum(stream.filter(F.col("event_type") == "purchase"))
        .writeStream.format("memory")
        .queryName("cusum_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["event_id"]: (r["cusum"], r["alarm"])
        for r in spark.sql("SELECT * FROM cusum_out").collect()
    }
    want = {
        r["event_id"]: (r["cusum"], r["alarm"])
        for r in q_cusum_changepoints(spark, sf_dir).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want  # bit-identical doubles, not approx


def test_streaming_minhash_index_matches_batch(spark, sf_dir, tmp_path):
    """An index maintained incrementally by the stream (3 file drops,
    foreachBatch appends) yields EXACTLY the candidate pairs of the
    batch-built index — the dedup index never needs a full rebuild."""
    from timestream_travel_spark.operators.dedup import (
        minhash_candidates,
        minhash_candidates_from_index,
    )
    from timestream_travel_spark.streaming.index_maintain import (
        maintain_minhash_index,
    )

    src = str(tmp_path / "docs_src")
    docs = load_table(spark, sf_dir, "documents")
    docs.withColumn("bucket", (F.col("doc_id") % 3).cast("int")).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(
            "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/bucket=*")
    )
    idx = str(tmp_path / "sig_idx")
    q = maintain_minhash_index(stream, idx, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    from_stream_index = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in minhash_candidates_from_index(spark, idx).collect()
    }
    direct = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in minhash_candidates(docs).collect()
    }
    assert from_stream_index == direct
    # every doc got exactly one signature row
    assert spark.read.parquet(idx).count() == docs.count()


def test_streaming_kalman_matches_batch_operator(spark, sf_dir, tmp_path):
    """Streaming Kalman replay equals the batch q_kalman_filter
    operator value-for-value on the purchase series (same IEEE
    recurrence, (level, variance) carried across micro-batches)."""
    from timestream_travel_spark.operators.timeseries8 import q_kalman_filter
    from timestream_travel_spark.streaming.kalman import streaming_kalman

    src = _stage_ordered(spark, sf_dir, tmp_path)
    stream = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_kalman(stream.filter(F.col("event_type") == "purchase"))
        .writeStream.format("memory")
        .queryName("kalman_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["event_id"]: (r["level"], r["gain"])
        for r in spark.sql("SELECT * FROM kalman_out").collect()
    }
    want = {
        r["event_id"]: (r["level"], r["gain"])
        for r in q_kalman_filter(spark, sf_dir).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want  # bit-identical doubles, not approx


def test_streaming_transitions_match_batch_matrix(spark, sf_dir, tmp_path):
    """The streamed per-event transitions, aggregated, equal the
    batch q_session_transitions Markov matrix exactly — per-user
    state (one second+type pair) survives micro-batch boundaries."""
    from timestream_travel_spark.operators.analytics2 import q_session_transitions
    from timestream_travel_spark.streaming.transitions import streaming_transitions

    src = _stage_ordered(spark, sf_dir, tmp_path)
    stream = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_transitions(stream)
        .writeStream.format("memory")
        .queryName("transitions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in spark.sql(
            "SELECT prev_type, next_type, COUNT(*) AS n FROM transitions_out "
            "GROUP BY prev_type, next_type"
        ).collect()
    }
    want = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in q_session_transitions(spark, sf_dir).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want
