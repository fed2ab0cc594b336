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

import os

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
    the parquet index, exactly-once per micro-batch — foreachBatch
    alone is only at-least-once (a crash between the append and the
    checkpoint commit replays the epoch), so the append goes through
    `_commit_batch_exactly_once`'s per-epoch staged-rename commit and
    a replayed epoch is a no-op. Signatures are also deterministic,
    so even a lost marker file only ever costs identical rows (dedup
    by doc_id at read time), never divergent ones."""

    def update(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _commit_batch_exactly_once(
            minhash_signatures(batch_df, id_col, text_col, n_hashes),
            index_path,
            epoch_id,
        )

    return (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _commit_batch_exactly_once(
    batch_df: DataFrame, table_path: str, epoch_id: int
) -> bool:
    """Idempotent per-epoch append: stage the batch into a hidden
    `_epoch-<id>.tmp` dir inside the table, rename its part files to
    deterministic `part-epoch<id>-<i>.parquet` names, then drop a
    `_epoch-<id>.committed` marker. A replayed epoch (foreachBatch is
    otherwise only at-least-once: a crash after a plain append but
    before the checkpoint commit would re-append the same rows under
    NEW part names) sees the marker and becomes a no-op; a crash
    mid-rename is healed by scrubbing the epoch's deterministic names
    and re-staging. Hidden `_`-prefixed staging dirs are invisible to
    Spark scans throughout, so readers only ever see whole epochs.
    Local-FS/HDFS rename semantics; on S3 use a transactional table
    format instead (rename is copy+delete there). Single writer per
    table assumed (the streaming-query contract). Returns True when
    this call performed the commit."""
    import glob
    import shutil

    os.makedirs(table_path, exist_ok=True)
    marker = os.path.join(table_path, f"_epoch-{epoch_id}.committed")
    tmp = os.path.join(table_path, f"_epoch-{epoch_id}.tmp")
    if os.path.exists(marker):
        # a crash after the marker write but before the final cleanup
        # leaves an (empty-of-parts) staging dir behind — scrub it on
        # the replay path too, or it accumulates across crashes
        shutil.rmtree(tmp, ignore_errors=True)
        return False
    # scrub half-moved files from a crashed previous attempt — the
    # deterministic names make exactly this epoch's files identifiable
    for f in glob.glob(os.path.join(table_path, f"part-epoch{epoch_id}-*")):
        os.remove(f)
    shutil.rmtree(tmp, ignore_errors=True)
    batch_df.write.mode("overwrite").parquet(tmp)
    for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
        os.replace(
            f, os.path.join(table_path, f"part-epoch{epoch_id}-{i:05d}.parquet")
        )
    with open(marker, "w"):
        pass
    shutil.rmtree(tmp, ignore_errors=True)
    return True


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
    each micro-batch appends its rows to the parquet table through
    `_commit_batch_exactly_once` — foreachBatch alone is only
    at-least-once, and unlike the signature/code indexes the DATA
    table has no read-time dedup key to fall back on, so a replayed
    plain append would silently duplicate rows in every downstream
    query. The per-epoch marker makes replays no-ops. After the data
    commit, update_manifest footer-reads ONLY the files the commit
    created — incremental cost is O(batch files), not O(table). A
    crash between the data commit and the manifest update leaves the
    manifest stale for one epoch, not wrong: the replay skips the
    data append but still runs update_manifest, which diffs manifest
    paths against the directory and picks the epoch's files up."""
    from timestream_travel_spark.pipeline.skipping import update_manifest

    def update(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _commit_batch_exactly_once(batch_df, table_path, epoch_id)
        update_manifest(batch_df.sparkSession, table_path, stat_cols)

    return (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
