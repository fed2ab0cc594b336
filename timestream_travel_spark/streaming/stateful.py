"""Custom stateful streaming operator (SURVEY.md §2 B.10):
applyInPandasWithState — per-key running aggregates that survive
across micro-batches, the primitive for operators Structured
Streaming's built-in windows can't express.

Implemented op: per-user running counters (events seen, value sum,
max ts) emitted once per micro-batch per active user. State is a
single row per user — bounded, watermark-free (counters never
expire); a production variant would add timeout-based eviction via
GroupStateTimeout.ProcessingTimeTimeout.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
STATE_SCHEMA = "n bigint, total double, last_ts timestamp"


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_ts = state.get
    else:
        n, total, last_ts = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total], "last_ts": [last_ts]}
    )


def running_user_counters(stream: DataFrame) -> DataFrame:
    """Stateful per-user counters over an unbounded event stream."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4's arbitrary-state API, successor to
# applyInPandasWithState): typed per-key ValueState managed by the
# state store, schema evolution + multiple state variables supported.

TWS_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"


def running_totals_tws(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum) via transformWithStateInPandas —
    same semantics as running_user_counters but on the newer API
    (explicit ValueState handle instead of the GroupState tuple).

    Environment note: the transformWithState state server speaks
    protobuf; this container lacks google.protobuf, so the pytest is
    skipif-gated (the applyInPandasWithState twin proves the
    semantics here; this path runs on any cluster with protobuf)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n bigint, total double")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            prev = self._state.get() if self._state.exists() else None
            n, total = (prev[0], prev[1]) if prev else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, float(total)))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return (
        stream.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
