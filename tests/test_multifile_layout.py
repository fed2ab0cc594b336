"""Multi-file layout parity (r11 verdict 'What's missing #6'): the
same queries on a single-file fixture and an N-part rewrite of its
fact tables must return identical results, while the multi-file scan
actually fans out into multiple tasks."""

from __future__ import annotations

import pytest

from timestream_travel_spark import registry
from timestream_travel_spark.registry import QUERIES
from tools.multifile_fixture import build_multifile

registry.load_all()

PARITY_QUERIES = ["q_groupby_agg", "q_time_range_filter", "q_join_fact"]


@pytest.fixture(scope="module")
def multi_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("multifile"))
    return build_multifile(spark, sf_dir, out, n_files=8)


def test_fact_scan_is_multi_task(spark, multi_dir):
    for tbl in ("events", "lineitem"):
        df = spark.read.parquet(f"{multi_dir}/{tbl}.parquet")
        assert df.rdd.getNumPartitions() >= 2


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_results_identical_across_layouts(spark, sf_dir, multi_dir, name):
    single = sorted(map(str, QUERIES[name](spark, sf_dir).collect()))
    multi = sorted(map(str, QUERIES[name](spark, multi_dir).collect()))
    assert single == multi


def test_pushdown_survives_multifile(spark, multi_dir):
    plan = (
        QUERIES["q_groupby_agg"](spark, multi_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    assert any(
        seg.split("]")[0].strip()
        for seg in plan.split("PushedFilters: [")[1:]
    )
