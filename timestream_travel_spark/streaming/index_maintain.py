"""Streaming MinHash-index maintenance: keep the persisted dedup
signature index (operators/dedup.build_minhash_index) current as
documents arrive, so near-dup candidate generation never re-shingles
the corpus.

Each micro-batch computes signatures for ITS documents only and
appends them to the parquet index — incremental cost is
O(batch), not O(corpus), and the index stays byte-compatible with
`minhash_candidates_from_index`. foreachBatch (not a streaming sink
directly) because signature computation reuses the batch expression
pipeline unchanged — the same pattern as streaming/jobs.py's gzip
sink and streaming/ingest.py's Bloom update.

At 100 TB this is the ingestion-side half of the dedup story: the
corpus-sized shingle+minhash pass amortizes over arrival instead of
re-running per dedup job, and LSH candidate generation reads the
index (bucket equi-join) at query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from timestream_travel_spark.operators.dedup import N_HASHES, minhash_signatures


def maintain_minhash_index(
    stream: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = N_HASHES,
):
    """Start the maintenance query: append per-batch signatures to
    the parquet index. Exactly-once per micro-batch via the
    checkpoint; replayed batches overwrite by epoch directory
    semantics of the parquet append + checkpoint dedup."""

    def update(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            minhash_signatures(batch_df, id_col, text_col, n_hashes)
            .write.mode("append")
            .parquet(index_path)
        )

    return (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def maintain_pq_index(
    stream,
    index_path: str,
    checkpoint: str,
    books: list[list[list[float]]],
):
    """Streaming PQ-index maintenance: encode each micro-batch's
    vectors against the FROZEN codebook (standard PQ practice —
    codebooks train once, arrivals are coded forever after) and
    append to the index's codes table. Incremental cost is O(batch);
    the encoded index stays byte-compatible with
    similarity6.pq_topk_from_index. Appends are safe to replay only
    because encoding is deterministic (argmin takes the first
    minimum) — a replayed batch writes identical rows; dedup by
    vec_id at read time is unnecessary for exactly-once sources and
    available via dropDuplicates for at-least-once ones."""
    from pyspark.sql import DataFrame

    from timestream_travel_spark.operators.similarity6 import encode_pq_codes

    def update(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        encode_pq_codes(batch_df, books).write.mode("append").parquet(
            f"{index_path}/codes"
        )

    return (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def maintain_ivfpq_index(
    stream,
    index_path: str,
    checkpoint: str,
    cents,
    books: list[list[list[float]]],
):
    """Streaming IVFADC-index maintenance: assign each micro-batch's
    vectors to their coarse cell and PQ-encode the RESIDUAL against
    the frozen coarse centroids + codebooks (train-once/code-forever,
    the maintain_pq_index contract extended to the composite index),
    appending (vec_id, cell, codes) partitioned BY CELL so queries
    keep pruning to their nprobe cell directories as the index grows.
    Replay-safe for the same reason as the PQ sink: cell assignment
    and encoding are deterministic (argmin takes the first minimum),
    so a replayed batch writes identical rows."""
    from pyspark.sql import DataFrame

    from timestream_travel_spark.operators.similarity7 import encode_ivfpq_codes

    def update(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        encode_ivfpq_codes(batch_df, cents, books).write.partitionBy(
            "cell"
        ).mode("append").parquet(f"{index_path}/codes")

    return (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def maintain_manifest(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    stat_cols: list[str],
):
    """Streaming file-stats-manifest maintenance (pipeline/skipping):
    each micro-batch appends its rows to the parquet table, then
    update_manifest footer-reads ONLY the files that append created —
    incremental cost is O(batch files), not O(table), the same
    train-once/maintain-forever contract as the MinHash and PQ index
    sinks above. The manifest swap keeps a valid manifest visible at
    every instant, so concurrent pruned_read planners never see a
    missing store. Exactly-once per micro-batch via the checkpoint."""
    from timestream_travel_spark.pipeline.skipping import update_manifest

    def update(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.write.mode("append").parquet(table_path)
        update_manifest(batch_df.sparkSession, table_path, stat_cols)

    return (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
