"""Stateful streaming sessionization (applyInPandasWithState).

The batch twin is ``events_sessionize_30m`` (lag + prefix-sum windows);
this is the *streaming* form: per-user session state carried across
micro-batches, closed sessions emitted in append mode. State per key is
five scalars — bounded by active users, independent of event volume, the
shape that survives a 100 TB/day event stream (state store keyed by
user_id, sized by concurrency not history).

Out-of-order arrival (round-10 verdict: FileStreamSource delivered a
late-half file first on an mtime tie and the old gap check silently
merged the early events into the open session, moving ``last_us``
BACKWARD and emitting sessions with start > end). Events are sorted
within a micro-batch, so disorder is only visible ACROSS batches, as an
arriving ``ts_us < last_us``. Explicit late-event policy, chosen per
where the late event lands:

- ``start_us <= ts_us < last_us`` — inside the OPEN session's span:
  merged (n/sum only). Order-safe AND batch-equivalent: an event inside
  [start, last] can only subdivide intra-session gaps that are already
  <= GAP, so the batch twin puts it in this exact session with the same
  boundaries.
- ``ts_us < start_us`` — before the open session began: it belongs to
  (or bridges) history that may already be emitted; merging is what
  produced the inverted sessions. Dropped and COUNTED — the count is
  surfaced as ``n_late`` on the key's next closed-session row, so data
  loss is observable in the output, never silent.

Two variants ship, differing in what they pay for disorder:
:func:`sessionize_stream` keeps O(1) state per key and sheds all
before-start disorder (counted); :func:`sessionize_stream_reorder`
buffers events within an event-time watermark and folds them in exact
order — byte-identical to batch under any disorder the watermark
bounds, at O(rate × watermark) state per key. Unbounded-disorder
sources (a reversed whole-file replay) exceed any finite watermark,
so the reorder variant too counts-and-drops past its bound.

Determinism: batch boundaries only affect WHEN a session is emitted,
never its contents (in-order sources process events in (ts, event_id)
order within and across batches); sums are integer cents. The test
suite replays a time-split parquet source in BOTH file orders: in-order
must equal the batch sessionizer exactly with every n_late = 0;
reversed must never emit an inverted session and must account for every
dropped event in n_late.
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
        # late events dropped for this key while this session was open
        # (ts before the session's start — see module docstring)
        T.StructField("n_late", T.LongType()),
    ]
)

#: (session_start_us, last_ts_us, n_events, sum_cents, late_dropped)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
        T.StructField("late", T.LongType()),
    ]
)


def _sessionize_key(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"])
    if state.exists:
        start_us, last_us, n, cents, late = state.get
    else:
        start_us = last_us = -1
        n = cents = late = 0
    closed: list[tuple[Any, ...]] = []
    for ts, value in zip(rows["ts"], rows["value"]):
        ts_us = int(ts.value // 1_000)  # pandas ns → µs
        v_cents = int(round(float(value) * 100))
        if last_us >= 0 and ts_us < last_us:
            # LATE: an earlier-timestamped event arriving after a
            # later one was folded (cross-batch disorder only — the
            # in-batch sort above rules it out within a batch).
            if ts_us >= start_us:
                # inside the open session's span: order-safe merge —
                # boundaries and membership match the batch twin
                n += 1
                cents += v_cents
            else:
                # before the open session began: folding it would move
                # last_us backward (the start > end corruption) — drop
                # and count instead, surfaced as n_late at close time
                late += 1
            continue
        if last_us >= 0 and ts_us - last_us > GAP_US:
            closed.append(
                (user_id, start_us, last_us, n, cents / 100.0, late)
            )
            start_us, n, cents, late = ts_us, 0, 0, 0
        if last_us < 0:
            start_us = ts_us
        last_us = ts_us
        n += 1
        cents += v_cents
    state.update((start_us, last_us, n, cents, late))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                "n_events": [c[3] for c in closed],
                "sum_value": [c[4] for c in closed],
                "n_late": [c[5] for c in closed],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events(user_id, ts, event_id, value) stream → closed-session
    stream (+ ``n_late`` dropped-late accounting per session). One
    state-store shuffle on user_id; emits in append mode."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_key,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Watermark-reorder variant: disorder WITHIN the watermark folds
# exactly; only genuinely-late data (older than the watermark) drops.
# ---------------------------------------------------------------------------

#: (folded-session scalars, watermark-pending event buffer). The
#: buffer holds events newer than the current watermark — bounded by
#: rate × watermark horizon per key, the standard stream-stream-join
#: state shape (vs the O(1)-per-key base sessionizer, which buys that
#: bound by dropping ALL before-start disorder).
REORDER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
        T.StructField("late", T.LongType()),
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_cents", T.ArrayType(T.LongType())),
    ]
)


def _sessionize_reorder_key(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    wm_us = state.getCurrentWatermarkMs() * 1_000
    if state.exists:
        start_us, last_us, n, cents, late, b_ts, b_eid, b_c = state.get
        buf = list(zip(b_ts, b_eid, b_c))
    else:
        start_us = last_us = -1
        n = cents = late = 0
        buf = []
    if not state.hasTimedOut:
        frames = [f for f in pdfs if len(f)]
        if frames:
            rows = pd.concat(frames, ignore_index=True)
            for ts, eid, value in zip(
                rows["ts"], rows["event_id"], rows["value"]
            ):
                ts_us = int(ts.value // 1_000)
                if ts_us < wm_us:
                    # older than the allowed-lateness bound: the one
                    # disorder class this variant still sheds (counted,
                    # surfaced at the next session close)
                    late += 1
                else:
                    buf.append(
                        (ts_us, int(eid), int(round(float(value) * 100)))
                    )
    # Fold the watermark-CONFIRMED prefix: an event <= wm is final —
    # any future arrival below wm is dropped above, so the folded
    # order can never be contradicted. Events > wm stay buffered.
    buf.sort()
    closed: list[tuple[Any, ...]] = []
    keep: list[tuple[int, int, int]] = []
    for ts_us, eid, v_cents in buf:
        if ts_us > wm_us:
            keep.append((ts_us, eid, v_cents))
            continue
        if last_us >= 0 and ts_us - last_us > GAP_US:
            closed.append(
                (user_id, start_us, last_us, n, cents / 100.0, late)
            )
            start_us, n, cents, late = ts_us, 0, 0, 0
        if last_us < 0:
            start_us = ts_us
        last_us = ts_us
        n += 1
        cents += v_cents
    # Watermark-based close: once wm > last + GAP, every still-
    # admissible event has ts >= wm > last + GAP, so nothing can
    # extend the open session — emit it WITHOUT waiting for a
    # successor (a session whose user went quiet closes when the
    # watermark proves the gap, not when they eventually return).
    if last_us >= 0 and wm_us > last_us + GAP_US:
        closed.append((user_id, start_us, last_us, n, cents / 100.0, late))
        start_us = last_us = -1
        n = cents = late = 0
    state.update(
        (
            start_us,
            last_us,
            n,
            cents,
            late,
            [b[0] for b in keep],
            [b[1] for b in keep],
            [b[2] for b in keep],
        )
    )
    if keep:
        # Event-time timeout at the oldest pending event (+1 ms: the
        # engine requires a timestamp strictly above the watermark):
        # when the watermark passes it, this key is re-invoked with no
        # data and the newly-confirmed prefix folds — including on the
        # trailing no-data micro-batch, which is what flushes the
        # final folds in an availableNow replay.
        state.setTimeoutTimestamp(keep[0][0] // 1_000 + 1)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                "n_events": [c[3] for c in closed],
                "sum_value": [c[4] for c in closed],
                "n_late": [c[5] for c in closed],
            }
        )


def sessionize_stream_reorder(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """The reorder-within-watermark upgrade of :func:`sessionize_stream`:
    arriving events buffer in state until the event-time watermark
    confirms no earlier arrival is still admissible, then fold in
    exact (ts, event_id) order — so ANY disorder bounded by
    ``watermark`` yields byte-identical sessions to the batch
    sessionizer (test-proven on an out-of-order delivery the base
    sessionizer can only drop-and-count), and only data older than
    the watermark is dropped-and-counted into ``n_late``. Sessions
    also close by WATERMARK, not just by successor event: once the
    watermark passes last_event + gap, nothing admissible can extend
    the session, so it emits even if its user never returns (the base
    variant holds such sessions open forever). The price is the
    buffer: state per key grows from 5 scalars to
    O(rate × watermark), which is why both variants exist — pick by
    whether the source's disorder bound is worth that state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_reorder_key,
            outputStructType=SESSION_SCHEMA,
            stateStructType=REORDER_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
