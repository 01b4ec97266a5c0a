"""Stateful streaming sessionization (applyInPandasWithState).

The batch twin is ``events_sessionize_30m`` (lag + prefix-sum windows);
this is the *streaming* form: per-user session state carried across
micro-batches, closed sessions emitted in append mode. State per key is
four scalars — bounded by active users, independent of event volume, the
shape that survives a 100 TB/day event stream (state store keyed by
user_id, sized by concurrency not history).

Determinism: batch boundaries only affect WHEN a session is emitted,
never its contents (events are processed in (ts, event_id) order within
and across batches for time-split sources); sums are integer cents. The
test suite replays a time-split parquet source and checks closed
sessions equal the batch sessionizer's output exactly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

#: (session_start_us, last_ts_us, n_events, sum_cents)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _sessionize_key(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"])
    if state.exists:
        start_us, last_us, n, cents = state.get
    else:
        start_us = last_us = -1
        n = cents = 0
    closed: list[tuple[Any, ...]] = []
    for ts, value in zip(rows["ts"], rows["value"]):
        ts_us = int(ts.value // 1_000)  # pandas ns → µs
        v_cents = int(round(float(value) * 100))
        if last_us >= 0 and ts_us - last_us > GAP_US:
            closed.append((user_id, start_us, last_us, n, cents / 100.0))
            start_us, n, cents = ts_us, 0, 0
        if last_us < 0:
            start_us = ts_us
        last_us = ts_us
        n += 1
        cents += v_cents
    state.update((start_us, last_us, n, cents))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                "n_events": [c[3] for c in closed],
                "sum_value": [c[4] for c in closed],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events(user_id, ts, event_id, value) stream → closed-session
    stream. One state-store shuffle on user_id; emits in append mode."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_key,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
