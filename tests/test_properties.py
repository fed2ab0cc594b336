"""Property-style spot checks (SURVEY.md §5.5) + plan-shape
assertions that guard the scale story (pushdown, broadcast)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from timestream_travel_spark.tables import load_table


def test_topk_is_prefix_of_global_sort(spark, sf_dir):
    qs = entrymod.queries()
    topk = [r["o_orderkey"] for r in qs["q_orderby_limit"](spark, sf_dir).collect()]
    full = (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey")
        .limit(len(topk))
        .collect()
    )
    assert topk == [r["o_orderkey"] for r in full]


def test_union_except_algebra(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    # x ∪ x == x (distinct); x − x == ∅
    assert c.union(c).distinct().count() == c.distinct().count()
    assert c.exceptAll(c).count() == 0


def test_asof_result_is_latest_prior(spark, sf_dir):
    qs = entrymod.queries()
    rows = qs["q_join_asof"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["click_ts"] is not None:
            assert r["click_ts"] <= r["purchase_ts"]


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plan = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]" in plan


def test_column_pruning_reaches_parquet_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plan = li.select("l_orderkey").  _jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<l_orderkey:bigint>" in plan


def test_dim_join_is_broadcast(spark, sf_dir):
    qs = entrymod.queries()
    plan = qs["q_join_broadcast_dims"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_global_topk_avoids_total_sort(spark, sf_dir):
    qs = entrymod.queries()
    plan = qs["q_orderby_limit"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
