"""Streaming Page–Hinkley batch-replay parity (the r13/r14 verdict's
named template: streaming/cusum.py's applyInPandasWithState shape +
bit-identical equality vs the batch operator q_page_hinkley)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.timeseries27 import _daily27
from timestream_travel_spark.operators.timeseries31 import (
    PH_LAMBDA,
    q_page_hinkley,
)
from timestream_travel_spark.streaming.page_hinkley import (
    _update,
    streaming_page_hinkley,
)


def _stage_daily_ordered(spark, sf_dir, tmp_path, n_files=4):
    """Replay the batch daily table as time-ordered file drops: file
    i holds the i-th slice of days, so per-type arrival order matches
    event-time order (the production watermarked-rollup contract)."""
    src = str(tmp_path / "daily_src")
    daily = _daily27(spark, sf_dir).select(
        "t", "day", F.col("v").cast("double").alias("x")
    )
    daily.coalesce(1).withColumn(
        "bucket", F.ntile(n_files).over(Window.orderBy("day", "t"))
    ).write.partitionBy("bucket").mode("overwrite").parquet(src)
    return f"{src}/bucket=*"


def test_streaming_page_hinkley_matches_batch_operator(spark, sf_dir, tmp_path):
    """Streaming replay equals q_page_hinkley value-for-value: the
    same IEEE walk folds across micro-batch boundaries through the
    (s, k, m, mn) state, so m/ph/alarm are bit-identical doubles."""
    src = _stage_daily_ordered(spark, sf_dir, tmp_path)
    stream = (
        spark.readStream.schema("t STRING, day STRING, x DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_page_hinkley(stream)
        .writeStream.format("memory")
        .queryName("ph_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["event_type"], r["day"]): (r["m"], r["ph"], r["alarm"])
        for r in spark.sql("SELECT * FROM ph_out").collect()
    }
    want = {
        (r["event_type"], r["day"]): (r["m"], r["ph"], r["alarm"])
        for r in q_page_hinkley(spark, sf_dir).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want  # bit-identical doubles, not approx


def test_page_hinkley_state_fold_detects_planted_drift():
    """Processor-level check without a Spark session: a planted
    upward mean shift fed through _update in two chunks alarms after
    the shift and never before, and the state round-trips across the
    chunk boundary exactly like one continuous fold."""
    import pandas as pd

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)
            self.exists = True

    base = [100.0] * 30
    drift = [100.0 + 40.0 * (i + 1) for i in range(20)]
    days = [f"2025-01-{i + 1:02d}" for i in range(30)] + [
        f"2025-02-{i + 1:02d}" for i in range(20)
    ]
    xs = base + drift

    # one continuous fold
    st1 = FakeState()
    (whole,) = list(
        _update(("a",), iter([pd.DataFrame({"day": days, "x": xs})]), st1)
    )
    # same rows in two chunks through a fresh state
    st2 = FakeState()
    (c1,) = list(
        _update(
            ("a",), iter([pd.DataFrame({"day": days[:25], "x": xs[:25]})]), st2
        )
    )
    (c2,) = list(
        _update(
            ("a",), iter([pd.DataFrame({"day": days[25:], "x": xs[25:]})]), st2
        )
    )
    chunked = pd.concat([c1, c2], ignore_index=True)
    assert whole["m"].to_list() == chunked["m"].to_list()
    assert whole["ph"].to_list() == chunked["ph"].to_list()
    assert st1.get == st2.get

    alarms = whole["alarm"].to_list()
    assert all(a == 0 for a in alarms[:30])  # quiet on the level run
    assert alarms[-1] == 1  # drift crosses λ
    assert max(whole["ph"][:30]) <= PH_LAMBDA
