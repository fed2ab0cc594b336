"""Write-side of the timestream_like Python DataSource: batch writer
(staged pages + driver commit), overwrite semantics, and the
streaming writer's idempotent per-batch commit."""

from __future__ import annotations

import glob
import json
import os
import time

from pyspark.sql import functions as F

from timestream_travel_spark.sources.timestream_like import (
    NULL_STR,
    TimestreamLikeDataSource,
)


def _register(spark):
    try:
        spark.dataSource.register(TimestreamLikeDataSource)
    except Exception:
        pass  # already registered in this session


def test_writer_roundtrips_through_reader(spark, tmp_path):
    """df → wire-shape pages → reader yields the faithful strings
    (None → "NULL") — an exact connector round-trip."""
    _register(spark)
    out = str(tmp_path / "pages")
    df = spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, "gamma")], "id bigint, name string"
    ).repartition(2)
    df.write.format("timestream_like").option("path", out).mode("append").save()

    pages = sorted(glob.glob(f"{out}/page-*.json"))
    assert len(pages) == 2  # one page per partition
    assert not glob.glob(f"{out}/*.tmp")  # staging fully committed
    first = json.load(open(pages[0]))
    assert [ci["Name"] for ci in first["ColumnInfo"]] == ["id", "name"]

    back = (
        spark.read.format("timestream_like")
        .option("path", out)
        .load()
        .collect()
    )
    got = sorted((r.id, r.name) for r in back)
    assert got == [("1", "alpha"), ("2", NULL_STR), ("3", "gamma")]


def test_writer_overwrite_replaces_pages(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "pages_ow")
    a = spark.createDataFrame([(1,)], "id bigint").coalesce(1)
    b = spark.createDataFrame([(2,), (3,)], "id bigint").coalesce(1)
    a.write.format("timestream_like").option("path", out).mode("append").save()
    a.write.format("timestream_like").option("path", out).mode("append").save()
    assert len(glob.glob(f"{out}/page-*.json")) == 2
    b.write.format("timestream_like").option("path", out).mode("overwrite").save()
    rows = (
        spark.read.format("timestream_like").option("path", out).load().collect()
    )
    assert sorted(r.id for r in rows) == ["2", "3"]


def test_stream_writer_batches_are_idempotent_pages(spark, tmp_path):
    """rate-source micro-batches land as page-b<batch>-NNN.json; the
    reader sees every streamed row exactly once."""
    _register(spark)
    out = str(tmp_path / "stream_pages")
    ckpt = str(tmp_path / "ckpt")
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")
        .load()
        .select(F.col("value").cast("string").alias("v"))
    )
    q = (
        src.writeStream.format("timestream_like")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    time.sleep(0.2)
    pages = glob.glob(f"{out}/page-b*.json")
    assert pages, "stream writer produced no pages"
    assert not glob.glob(f"{out}/*.tmp")
    back = spark.read.format("timestream_like").option("path", out).load().collect()
    vals = sorted(int(r.v) for r in back)
    assert vals == sorted(set(vals)), "duplicate rows across batch commits"


def test_batch_page_numbering_survives_five_digit_rollover(tmp_path):
    """Past page-99999 the %05d pad widens to 6 digits; the next-index
    scan must still parse those names (or it would stick at 100000 and
    collide forever), and page order must stay numeric."""
    import json
    import os

    from timestream_travel_spark.sources.timestream_like import (
        PageCommit,
        TimestreamLikeWriter,
    )

    d = str(tmp_path / "pages")
    os.makedirs(d)
    for n in (99999, 100000):
        with open(os.path.join(d, f"page-{n:05d}.json"), "w") as fh:
            json.dump({}, fh)
    w = TimestreamLikeWriter(d, fields=["a"], overwrite=False)
    assert max(n for n, _ in w._batch_pages()) == 100000
    staged = os.path.join(d, "stage-x.json.tmp")
    with open(staged, "w") as fh:
        json.dump({}, fh)
    w._finalize([PageCommit(staged=staged, rows=0)])
    assert os.path.exists(os.path.join(d, "page-100001.json"))
    # reader-side ordering: (len, name) == numeric for padded names
    names = [f"page-{n:05d}.json" for n in (7, 99999, 100000, 100001)]
    assert sorted(names, key=lambda p: (len(p), p)) == names
