"""Streaming session-transition extraction — the streaming twin of
operators/analytics2.q_session_transitions.

Per-user state is ONE (last_event_second, last_event_type) pair:
each incoming event either starts a new session (gap > 30 min — no
transition emitted) or emits the (prev_type → next_type) Markov
transition the batch operator derives with its lag window. The
downstream transition-matrix aggregation is a plain streaming
groupBy count; this operator is the stateful edge extraction.

Same ordering assumption as streaming/ewma.py and cusum.py: ordered
file replay here; watermark + reorder buffer in production.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800  # same 30-min gap as the batch operator

OUTPUT_SCHEMA = "user_id bigint, event_id bigint, prev_type string, next_type string"
STATE_SCHEMA = "last_s bigint, last_type string"


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_s, last_type = state.get if state.exists else (None, None)
    out_ids, out_prev, out_next = [], [], []
    # a key's rows within one micro-batch can span multiple Arrow
    # chunks in arbitrary order — materialize them all and sort ONCE,
    # or the carry-state walk diverges from batch semantics whenever
    # a later chunk holds earlier rows (state stays one pair per key;
    # only the micro-batch's own rows are buffered)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        # floor-seconds, matching batch unix_timestamp() semantics
        secs = pdf["ts"].astype("int64") // 1_000_000_000
        for eid, s, etype in zip(pdf["event_id"], secs, pdf["event_type"]):
            s = int(s)
            if last_s is not None and (s - last_s) <= SESSION_GAP_S:
                out_ids.append(int(eid))
                out_prev.append(last_type)
                out_next.append(str(etype))
            last_s, last_type = s, str(etype)
    state.update((last_s, last_type))
    yield pd.DataFrame(
        {
            "user_id": user_id,
            "event_id": out_ids,
            "prev_type": out_prev,
            "next_type": out_next,
        }
    )


def streaming_transitions(stream: DataFrame) -> DataFrame:
    """Per-user session transitions over an unbounded stream; state
    is one (second, type) pair per key — constant regardless of
    stream length."""
    return (
        stream.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
