"""Round-8 sixth-wave infrastructure: persisted IVFADC index
(build-once/read-many + partition pruning) and its streaming
maintenance twin — the composite-index completion of the
minhash/PQ index-lifecycle pattern."""

from __future__ import annotations

from pyspark.sql import functions as F

from timestream_travel_spark.tables import load_table


def test_ivfpq_index_roundtrip_matches_direct_query(spark, sf_dir, tmp_path):
    """build_ivfpq_index → ivfpq_topk_from_index returns EXACTLY the
    rows of q_ivfpq_topk (same frozen coarse centroids + residual
    codebooks, both sides sum the M ADC terms left-to-right)."""
    from timestream_travel_spark.operators.similarity7 import (
        build_ivfpq_index,
        ivfpq_topk_from_index,
        q_ivfpq_topk,
    )

    idx = str(tmp_path / "ivfpq_idx")
    build_ivfpq_index(spark, sf_dir, idx)
    direct = [(r.vec_id, r.l2sq) for r in q_ivfpq_topk(spark, sf_dir).collect()]
    from_index = [
        (r.vec_id, r.l2sq)
        for r in ivfpq_topk_from_index(spark, sf_dir, idx).collect()
    ]
    assert direct == from_index
    # the stored index is M small ints + a cell id per vector
    codes = spark.read.parquet(f"{idx}/codes")
    n = load_table(spark, sf_dir, "embeddings").count()
    assert codes.count() == n
    assert codes.select(F.min(F.size("codes")), F.max(F.size("codes"))).collect()[
        0
    ] == (8, 8)


def test_ivfpq_index_scan_prunes_to_probed_cells(spark, sf_dir, tmp_path):
    """The codes table is partitioned by cell, so a probed-cells scan
    prunes at the DIRECTORY level (PartitionFilters), not per-row —
    the access pattern that makes IVF the 100 TB path."""
    from timestream_travel_spark.operators.similarity7 import build_ivfpq_index

    idx = str(tmp_path / "ivfpq_prune_idx")
    build_ivfpq_index(spark, sf_dir, idx)
    pruned = spark.read.parquet(f"{idx}/codes").filter(F.col("cell").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the IN predicate lands in PartitionFilters (directory pruning),
    # NOT in PushedFilters (row-group skipping) — cell is a partition
    # column, so the non-probed directories are never opened
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "cell" in pf and "IN(0,1)" in pf.replace(" ", "")
    # and the directory layout really is one dir per cell
    import os

    cells = sorted(
        d for d in os.listdir(f"{idx}/codes") if d.startswith("cell=")
    )
    assert len(cells) > 2  # more cells exist than the scan probes


def test_streaming_ivfpq_maintenance_matches_batch_encode(spark, sf_dir, tmp_path):
    """(cell, codes) appended per micro-batch against the frozen
    coarse centroids + codebooks equal the batch encode exactly
    (cell argmin and code argmin are both deterministic)."""
    from timestream_travel_spark.operators.similarity7 import (
        _ivfpq_state,
        encode_ivfpq_codes,
    )
    from timestream_travel_spark.streaming.index_maintain import (
        maintain_ivfpq_index,
    )

    cents, books = _ivfpq_state(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")

    src = str(tmp_path / "emb_src")
    emb.withColumn("bucket", (F.col("vec_id") % 3).cast("int")).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/bucket=*")
    )
    idx = str(tmp_path / "ivfpq_stream_idx")
    q = maintain_ivfpq_index(stream, idx, str(tmp_path / "ckpt"), cents, books)
    q.awaitTermination(180)

    streamed = {
        r.vec_id: (r.cell, list(r.codes))
        for r in spark.read.parquet(f"{idx}/codes").collect()
    }
    batch = {
        r.vec_id: (r.cell, list(r.codes))
        for r in encode_ivfpq_codes(emb, cents, books).collect()
    }
    assert streamed == batch


def test_index_cli_end_to_end(spark, sf_dir, tmp_path, caplog):
    """The index lifecycle drivable from the shell: `index build`
    materializes each kind, `index query` searches from the stored
    index, and the ivfpq CLI path returns exactly the direct query's
    rows — all through cli.main."""
    import logging

    from timestream_travel_spark.cli import main as cli_main
    from timestream_travel_spark.operators.similarity7 import q_ivfpq_topk

    for kind in ("minhash", "pq", "ivfpq"):
        idx = str(tmp_path / f"{kind}_idx")
        assert (
            cli_main(
                ["index", "build", "--kind", kind, "--data", sf_dir, "--index", idx]
            )
            == 0
        )
        caplog.clear()
        with caplog.at_level(logging.INFO):
            assert (
                cli_main(
                    [
                        "index", "query",
                        "--kind", kind,
                        "--data", sf_dir,
                        "--index", idx,
                        "--limit", "0",
                    ]
                )
                == 0
            )
        assert f"{kind} index query:" in caplog.text

    # the CLI-built ivfpq index serves exactly the direct query's rows
    from timestream_travel_spark.operators.similarity7 import ivfpq_topk_from_index

    direct = [(r.vec_id, r.l2sq) for r in q_ivfpq_topk(spark, sf_dir).collect()]
    via_cli_index = [
        (r.vec_id, r.l2sq)
        for r in ivfpq_topk_from_index(
            spark, sf_dir, str(tmp_path / "ivfpq_idx")
        ).collect()
    ]
    assert direct == via_cli_index


def test_ivfpq_index_compaction_preserves_results(spark, sf_dir, tmp_path):
    """Streaming maintenance appends one file-set per micro-batch —
    the classic small-file pathology. compact_parquet rewrites the
    codes table (preserving the cell partitioning) and the from-index
    query returns identical rows from strictly fewer files."""
    from timestream_travel_spark.operators.similarity7 import (
        _ivfpq_state,
        build_ivfpq_index,
        ivfpq_topk_from_index,
    )
    from timestream_travel_spark.pipeline.compact import compact_parquet
    from timestream_travel_spark.streaming.index_maintain import (
        maintain_ivfpq_index,
    )

    # frozen state (coarse + codebook) from the batch build…
    idx = str(tmp_path / "ivfpq_idx")
    build_ivfpq_index(spark, sf_dir, idx)
    # …but the CODES arrive via streaming maintenance, one file-set
    # per micro-batch — overwrite the batch codes with the streamed
    # ones so the table is genuinely fragmented
    import shutil

    shutil.rmtree(f"{idx}/codes")
    cents, books = _ivfpq_state(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    src = str(tmp_path / "emb_src")
    emb.withColumn("bucket", (F.col("vec_id") % 4).cast("int")).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/bucket=*")
    )
    q = maintain_ivfpq_index(stream, idx, str(tmp_path / "ckpt"), cents, books)
    q.awaitTermination(180)

    before = [
        (r.vec_id, r.l2sq)
        for r in ivfpq_topk_from_index(spark, sf_dir, idx).collect()
    ]

    compacted = str(tmp_path / "ivfpq_compacted")
    stats = compact_parquet(
        spark, f"{idx}/codes", f"{compacted}/codes", partition_by=["cell"]
    )
    assert stats["files_after"] < stats["files_before"]
    assert stats["rows"] == spark.read.parquet(f"{idx}/codes").count()
    # the compacted index needs the frozen state alongside the codes
    for part in ("coarse", "codebook"):
        spark.read.parquet(f"{idx}/{part}").write.mode("overwrite").parquet(
            f"{compacted}/{part}"
        )
    after = [
        (r.vec_id, r.l2sq)
        for r in ivfpq_topk_from_index(spark, sf_dir, compacted).collect()
    ]
    assert before == after
