"""Streaming one-sided CUSUM change-point alarms — the streaming
twin of operators/timeseries7.q_cusum_changepoints (Page 1954).

Like streaming EWMA the recurrence s_t = max(0, s_{t-1} + x_t − ref)
is inherently sequential per key, so applyInPandasWithState carries
one scalar of state per series; each micro-batch folds its rows in
event-time order. Same ordering assumption as streaming/ewma.py
(ordered file replay here; watermark + reorder buffer in
production). Alarms stream out the moment the excursion crosses the
threshold — the monitoring use the batch op can only do after the
fact.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from timestream_travel_spark.operators.timeseries7 import CUSUM_H, CUSUM_REF

OUTPUT_SCHEMA = "user_id bigint, event_id bigint, cusum double, alarm boolean"
STATE_SCHEMA = "s double, n bigint"


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    s, n = state.get if state.exists else (0.0, 0)
    out_ids, out_vals = [], []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for eid, x in zip(pdf["event_id"], pdf["value"]):
            s = max(0.0, s + float(x) - CUSUM_REF)
            n += 1
            out_ids.append(int(eid))
            out_vals.append(s)
    state.update((s, n))
    yield pd.DataFrame(
        {
            "user_id": user_id,
            "event_id": out_ids,
            "cusum": out_vals,
            "alarm": [v > CUSUM_H for v in out_vals],
        }
    )


def streaming_cusum(stream: DataFrame) -> DataFrame:
    """Per-user CUSUM over an unbounded stream; state is one scalar
    (plus a count) per key — constant regardless of stream length."""
    return (
        stream.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
