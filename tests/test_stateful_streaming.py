"""applyInPandasWithState custom stateful operator test (B.10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timestream_travel_spark.streaming.jobs import read_events_stream
from timestream_travel_spark.streaming.stateful import running_user_counters
from timestream_travel_spark.tables import load_table


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_running_user_counters_match_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "stateful_src")
    ev = load_table(spark, sf_dir, "events")
    # several files so state actually carries across micro-batches
    ev.repartition(6).write.mode("overwrite").parquet(src)

    stream = read_events_stream(spark, src, max_files_per_trigger=2)
    q = (
        running_user_counters(stream)
        .writeStream.format("memory")
        .queryName("counters_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # update mode re-emits per batch: the LAST emission per user must
    # equal the batch aggregate over everything
    final = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) AS rn
          FROM counters_out) WHERE rn = 1
        """
    ).collect()
    want = {
        r["user_id"]: (r["n"], r["t"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert final
    for r in final:
        n, t = want[r["user_id"]]
        assert r["n_events"] == n
        assert abs(r["total_value"] - t) < 1e-6


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState needs google.protobuf (state-server proto "
    "wire format), not present in this container — the "
    "applyInPandasWithState twin above covers the running-totals "
    "semantics; running_totals_tws itself is exercised on clusters "
    "with protobuf installed",
)
def test_transform_with_state_matches_batch(spark, sf_dir, tmp_path):
    """transformWithStateInPandas running totals: the LAST update per
    user across all micro-batches must equal the batch groupBy."""
    from timestream_travel_spark.streaming.jobs import read_events_stream
    from timestream_travel_spark.streaming.stateful import running_totals_tws

    src = str(tmp_path / "tws_src")
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    ev.coalesce(4).write.mode("overwrite").parquet(src)

    stream = read_events_stream(spark, src, max_files_per_trigger=2)
    q = (
        running_totals_tws(stream.filter(F.col("user_id") < 50))
        .writeStream.format("memory")
        .queryName("tws_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "tws_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # update mode appends one row per user per batch; keep the final
    # (max n_events) row per user
    got = {}
    for r in spark.sql("SELECT * FROM tws_out").collect():
        cur = got.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            got[r["user_id"]] = (r["n_events"], round(r["total_value"], 6))
    want = {
        r["user_id"]: (r["n"], round(r["t"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == want
