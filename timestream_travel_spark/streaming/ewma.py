"""Streaming EWMA — the untruncated recurrence the batch operator
deliberately avoids (operators/timeseries2.q_ewma uses a 5-tap
kernel because closed-form window sums of α-powers explode
numerically; the recurrence s_t = α·x_t + (1-α)·s_{t-1} is inherently
sequential state).

applyInPandasWithState keeps (last_ewma, last_ts) per key; each
micro-batch folds its rows in event-time order. Correct under the
same assumption every streaming recurrence needs: per-key batches
arrive in order (guaranteed here by the ordered file-replay source;
production would pair this with a watermark + reorder buffer).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, event_id bigint, ewma double"
STATE_SCHEMA = "last_ewma double, n bigint"
ALPHA = 0.5


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_ewma, n = state.get if state.exists else (None, 0)
    out_ids, out_vals = [], []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for eid, x in zip(pdf["event_id"], pdf["value"]):
            last_ewma = float(x) if last_ewma is None else ALPHA * float(x) + (1 - ALPHA) * last_ewma
            n += 1
            out_ids.append(int(eid))
            out_vals.append(last_ewma)
    state.update((last_ewma, n))
    yield pd.DataFrame({"user_id": user_id, "event_id": out_ids, "ewma": out_vals})


def streaming_ewma(stream: DataFrame) -> DataFrame:
    """Per-user exact EWMA over an unbounded stream; state is two
    scalars per key."""
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
