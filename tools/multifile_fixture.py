"""Multi-file fixture layout builder (r11 verdict "What's missing
#6"): every driver fixture is a single parquet file, so plan audits
only ever show single-task scans. This tool rewrites the big fact
tables (events, lineitem) of a fixture as N-part parquet DIRECTORIES
(still named `<table>.parquet`, so `tables.load_table` reads them
unchanged) and symlinks the remaining tables — producing a layout
with a real file population for multi-task scan / bin-packing / AQE
coalescing evidence, with bit-identical data.

Usage as a library (plan_audit, pytest):
    from tools.multifile_fixture import build_multifile
    mdir = build_multifile(spark, "/root/testdata/sf0.1", out_dir, 64)
"""

from __future__ import annotations

import os

from timestream_travel_spark.tables import TABLES

MULTI_TABLES = ("events", "lineitem")


def build_multifile(
    spark, sf_dir: str, out_dir: str, n_files: int = 64
) -> str:
    """Write `events`/`lineitem` as n_files-part directories under
    out_dir, symlink every other table; returns out_dir. The raw
    parquet read is rewritten (no ensure_timestamp cast), so the
    on-disk schema matches the single-file original."""
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        src = os.path.join(sf_dir, f"{name}.parquet")
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(dst) or os.path.islink(dst):
            continue
        if name in MULTI_TABLES:
            spark.read.parquet(src).repartition(n_files).write.parquet(dst)
        else:
            os.symlink(src, dst)
    return out_dir
