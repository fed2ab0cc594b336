"""Round-5 ninth-wave operators: Allen interval algebra and the
one-pass column profile. Both are DuckDB-oracled (strict at 3 SFs);
these tests pin the CLASSIFIER against hand-built interval pairs
covering all 13 relations, and the profile against directly computed
statistics."""

from __future__ import annotations

from pyspark.sql import functions as F

from timestream_travel_spark.tables import load_table


def test_allen_case_classifies_all_13_relations(spark):
    from timestream_travel_spark.operators.joins3 import _allen_case

    # (s1, e1, s2, e2, expected)
    cases = [
        (0, 10, 0, 10, "equals"),
        (0, 5, 0, 10, "starts"),
        (0, 10, 0, 5, "started_by"),
        (5, 10, 0, 10, "finishes"),
        (0, 10, 5, 10, "finished_by"),
        (0, 5, 5, 10, "meets"),
        (5, 10, 0, 5, "met_by"),
        (3, 7, 0, 10, "during"),
        (0, 10, 3, 7, "contains"),
        (0, 6, 4, 10, "overlaps"),
        (4, 10, 0, 6, "overlapped_by"),
        (0, 3, 5, 10, "before"),
        (5, 10, 0, 3, "after"),
    ]
    df = spark.createDataFrame(cases, "s1 bigint, e1 bigint, s2 bigint, e2 bigint, expected string")
    rel = _allen_case(F.col("s1"), F.col("e1"), F.col("s2"), F.col("e2"))
    rows = df.select("expected", rel.alias("got")).collect()
    for r in rows:
        assert r.got == r.expected, (r.expected, r.got)


def test_allen_relations_partition_all_pairs(spark, sf_dir):
    """Every (session, window) pair lands in exactly one relation:
    the counts sum to |sessions| × TOP_WINDOWS."""
    from timestream_travel_spark.operators.joins3 import TOP_WINDOWS, q_allen_relations
    from timestream_travel_spark.operators.timeseries import sessionized

    out = q_allen_relations(spark, sf_dir).collect()
    n_sessions = (
        sessionized(load_table(spark, sf_dir, "events"))
        .select("user_id", "session_id")
        .distinct()
        .count()
    )
    assert sum(r.n_pairs for r in out) == n_sessions * TOP_WINDOWS
    assert all(r.n_pairs > 0 for r in out)


def test_table_profile_matches_direct_stats(spark, sf_dir):
    from timestream_travel_spark.operators.profiling import q_table_profile

    out = {r.column_name: r for r in q_table_profile(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    assert set(out) == {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    }
    direct_distinct = li.select(
        F.count_distinct("l_orderkey").alias("ok"),
        F.count_distinct("l_returnflag").alias("rf"),
        F.min("l_quantity").alias("qmin"),
        F.max("l_quantity").alias("qmax"),
    ).collect()[0]
    for r in out.values():
        assert r.n_rows == n and r.n_nulls == 0
    assert out["l_orderkey"].n_distinct == direct_distinct.ok
    assert out["l_returnflag"].n_distinct == direct_distinct.rf
    assert float(out["l_quantity"].min_repr) == direct_distinct.qmin
    assert float(out["l_quantity"].max_repr) == direct_distinct.qmax
