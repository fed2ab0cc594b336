"""Streaming local-level Kalman filter — the streaming twin of
operators/timeseries8.q_kalman_filter.

Same family as streaming/ewma.py and streaming/cusum.py: the
recurrence is inherently sequential per key, so
applyInPandasWithState carries (level, variance) per series and each
micro-batch folds its rows in event-time order — the filtered level
and the adaptive gain stream out per event. The recurrence is
written EXACTLY as the batch operator's (and the recursive-CTE
oracle's) IEEE op sequence, so a full replay is bit-identical to the
batch result. Ordering assumption as the siblings: ordered file
replay here; watermark + reorder buffer in production.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from timestream_travel_spark.operators.timeseries8 import KF_Q, KF_R

OUTPUT_SCHEMA = "user_id bigint, event_id bigint, level double, gain double"
STATE_SCHEMA = "lv double, pv double, n bigint"


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        lv, pv, n = state.get
    else:
        lv, pv, n = 0.0, 1.0, 0
    out_ids, out_lv, out_k = [], [], []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for eid, x in zip(pdf["event_id"], pdf["value"]):
            x = float(x)
            if n == 0:
                lv, pv, k = x, 1.0, 0.0
            else:
                pp = pv + KF_Q
                k = pp / (pp + KF_R)
                lv = lv + k * (x - lv)
                pv = (1.0 - k) * pp
            n += 1
            out_ids.append(int(eid))
            out_lv.append(lv)
            out_k.append(k)
    state.update((lv, pv, n))
    yield pd.DataFrame(
        {
            "user_id": user_id,
            "event_id": out_ids,
            "level": out_lv,
            "gain": out_k,
        }
    )


def streaming_kalman(stream: DataFrame) -> DataFrame:
    """Per-user Kalman filtering over an unbounded stream; state is
    two scalars (plus a count) per key — constant regardless of
    stream length."""
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
