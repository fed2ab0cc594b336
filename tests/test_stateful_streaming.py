"""applyInPandasWithState custom stateful operator test (B.10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from timestream_travel_spark.streaming.jobs import read_events_stream
from timestream_travel_spark.streaming.stateful import running_user_counters
from timestream_travel_spark.tables import load_table


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
