"""Custom stateful streaming operator via applyInPandasWithState.

The north-star streaming surface (SURVEY.md §2.2): when
``session_window`` / built-in aggregations can't express the logic —
here, a running per-user session COUNTER that survives across
micro-batches — the engine drops to ``applyInPandasWithState``:
per-key state in the state store, Arrow-batched user code, watermark-
driven cleanup.  This is the Structured Streaming twin of
``operators/sessionize.py::session_counts`` and is cross-checked
against it in tests.

State layout per user: (last_event_ts_ns, n_sessions).  Each batch
sorts its rows by event time, continues the gap rule from the stored
last timestamp, and emits the updated running count.

Cross-batch caveat (inherent to the operator, documented here): the
gap rule is order-sensitive, so correctness across batches requires
event-time-ordered arrival per key (watermark + source ordering); the
deterministic test drives a single batch, the multi-batch path is
exercised for liveness.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

NS_PER_MIN = 60 * 1_000_000_000

OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_ts_ns long, n_sessions long, n_events long"


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_ns: int,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_ts, n_sessions, n_events = state.get
    else:
        last_ts, n_sessions, n_events = None, 0, 0
    for pdf in pdfs:
        ts_sorted = pdf.sort_values("ts_ns")["ts_ns"]
        for ts in ts_sorted:
            ts = int(ts)
            if last_ts is None or (ts - last_ts) > gap_ns:
                n_sessions += 1
            last_ts = ts
            n_events += 1
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def stateful_session_counts(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Running per-user session counts over a stream (or batch-shaped
    single-batch stream).  Input needs columns (user_id, ts_ns)."""
    gap_ns = gap_minutes * NS_PER_MIN

    def fn(key, pdfs, state):
        return _update(key, pdfs, state, gap_ns)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
