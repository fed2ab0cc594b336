"""Z-order layout: multi-dimensional data-skipping evidence.

The observable metric is matching-file locality — how many data
files contain ANY row matching a box predicate. That is exactly the
quantity file-level min/max pruning exploits (a file with no
matching rows has disjoint stats and is skipped by the planner), so
fewer matching files == more skippable scan at warehouse scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timestream_travel_spark.pipeline.zorder import (
    files_touched,
    write_linear,
    write_zordered,
)
from timestream_travel_spark.tables import load_table


def test_zorder_improves_two_dim_locality(spark, sf_dir, tmp_path):
    sf_dir = "/root/testdata/sf0.01"  # enough rows for ~20 files
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")

    z_path = str(tmp_path / "z")
    l_path = str(tmp_path / "linear")
    n_files_z = write_zordered(ev, z_path, "user_id", "ts", rows_per_file=500)
    n_files_l = write_linear(ev, l_path, "ts", rows_per_file=500)
    assert n_files_z >= 10 and n_files_l >= 10

    zdf = spark.read.parquet(z_path)
    ldf = spark.read.parquet(l_path)

    # correctness: identical row sets for the box query on both layouts
    box = lambda df: df.filter(  # noqa: E731
        (F.col("user_id").between(10, 24))
        & (F.col("ts").between("2024-01-05", "2024-01-12"))
    )
    assert sorted(r["event_id"] for r in box(zdf).collect()) == sorted(
        r["event_id"] for r in box(ldf).collect()
    )

    # 1-dim user filter: ts-sorted layout scatters every user across
    # all files; z-order confines the user range to a fraction
    user_only = lambda df: df.filter(F.col("user_id").between(10, 24))  # noqa: E731
    touched_z = files_touched(user_only(zdf))
    touched_l = files_touched(user_only(ldf))
    assert touched_l >= n_files_l * 0.9, "ts-sort should scatter users everywhere"
    assert touched_z <= touched_l * 0.6, (touched_z, touched_l)

    # 2-dim box: z-order must touch fewer files than the linear layout
    assert files_touched(box(zdf)) < files_touched(box(ldf)), (
        files_touched(box(zdf)),
        files_touched(box(ldf)),
    )


def test_morton_key_is_monotone_in_quadrants(spark):
    """Morton interleave sanity: keys of the four quadrant corners of
    a 2-bit space sort in Z traversal order."""
    from timestream_travel_spark.pipeline.zorder import morton_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1)], "x long, y long"
    ).select("x", "y", morton_key(F.col("x"), F.col("y"), bits=1).alias("z"))
    got = {(r["x"], r["y"]): r["z"] for r in df.collect()}
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3}


def test_zorder_cli_roundtrip(spark, sf_dir, tmp_path):
    """`zorder` CLI subcommand: rewrites a parquet directory along the
    Morton curve with identical data."""
    from timestream_travel_spark.cli import main as cli_main

    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts").write.parquet(src)
    dest = str(tmp_path / "z")
    rc = cli_main([
        "zorder", "--src", src, "--dest", dest,
        "--cols", "user_id,ts", "--rows-per-file", "500",
    ])
    assert rc == 0
    back = spark.read.parquet(dest)
    assert back.count() == spark.read.parquet(src).count()
    assert sorted(back.columns) == ["event_id", "ts", "user_id"]
    # bad --cols rejected
    assert cli_main(["zorder", "--src", src, "--dest", dest, "--cols", "user_id"]) == 2
