"""Custom stateful sessionization via ``applyInPandasWithState``
(SURVEY.md §7.1 M7 — the custom-stateful-operator pattern).

Gap-based sessions: a session closes after ``gap`` of inactivity per user.
The batch twin (lag + cumulative sum window) is oracle-checked as
``events_sessionize``; this streaming form maintains per-user state
(current session start/end/count) across micro-batches and emits one row
per CLOSED session, using event-time timeouts so state is reclaimed.

This is the Arrow-batched slow path by design — Spark has no built-in
gap-session aggregation with custom emission (``session_window`` exists
for windows-as-groupBy; this operator demonstrates arbitrary stateful
logic: per-group state schema, timeout handling, incremental emission).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)

# state: (session_start_ms, session_end_ms, n_events)
STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n", IntegerType()),
    ]
)


def _session_fn_factory(gap_ms: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start_ms, end_ms, n = state.get
                state.remove()
                yield _emit(user_id, start_ms, end_ms, n)
            return

        ts_ms: list[int] = []
        for pdf in pdfs:
            ts_ms.extend(
                (pdf["ts"].astype("int64") // 1_000_000).tolist()
            )
        ts_ms.sort()
        if not ts_ms:
            return

        closed: list[tuple[int, int, int]] = []
        if state.exists:
            start_ms, end_ms, n = state.get
        else:
            start_ms, end_ms, n = ts_ms[0], ts_ms[0], 0

        for t in ts_ms:
            if t - end_ms > gap_ms:
                closed.append((start_ms, end_ms, n))
                start_ms, n = t, 0
            end_ms = max(end_ms, t)
            n += 1

        state.update((start_ms, end_ms, n))
        state.setTimeoutTimestamp(end_ms + gap_ms)
        for s, e, c in closed:
            yield _emit(user_id, s, e, c)

    return fn


def _utc_naive(ms: int) -> dt.datetime:
    # utcfromtimestamp is deprecated since 3.12; same naive-UTC value.
    return dt.datetime.fromtimestamp(ms / 1000, tz=dt.timezone.utc).replace(
        tzinfo=None
    )


def _emit(user_id: int, start_ms: int, end_ms: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [_utc_naive(start_ms)],
            "session_end": [_utc_naive(end_ms)],
            "n_events": [n],
        }
    )


def sessionize_stateful(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming gap-sessionization. Input must be a streaming DataFrame
    with (user_col, ts_col); emits closed sessions."""
    amount, unit = gap.split()
    mult = {"minutes": 60_000, "minute": 60_000, "seconds": 1000, "second": 1000}[unit]
    gap_ms = int(amount) * mult
    return (
        events.withWatermark(ts_col, watermark)
        .select(user_col, ts_col)
        .withColumnRenamed(ts_col, "ts")
        .groupBy(user_col)
        .applyInPandasWithState(
            _session_fn_factory(gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
