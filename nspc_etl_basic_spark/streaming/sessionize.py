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

# state: (session_start_us, session_end_us, n_events)
#
# Precision contract: state and gap arithmetic ride epoch-MICROSECONDS
# (Spark TimestampType's native resolution; the Arrow boundary delivers
# datetime64[ns] whose sub-µs part is always zero). Emitted bounds
# reconstruct the full µs value — never truncate to ms here: the corpus
# carries sub-millisecond residue at every scale tier, and flooring to
# ms silently shifts session_start/session_end by the µs tail.
# GroupState.setTimeoutTimestamp alone is millisecond-based, so only
# the timeout derives an ms value (floor is safe: gap >> 1 ms).
#
# CHECKPOINT COMPATIBILITY: the pre-µs build stored a positionally
# identical (long, long, int) struct holding MILLISECOND values; a
# checkpoint from that build restoring into µs arithmetic would close
# every session instantly with 1970-era bounds. The leading ``v``
# field makes old checkpoints incompatible BY CONSTRUCTION: Spark's
# state-schema compatibility check rejects the 3-field stored schema
# against this 4-field one at query start, and even if a store skipped
# that check, ``_require_version`` raises before any bound is emitted.
STATE_VERSION = 2  # 1 = ms-era (implicit, unversioned); 2 = epoch-µs

STATE_SCHEMA = StructType(
    [
        StructField("v", IntegerType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", IntegerType()),
    ]
)


def _require_version(v: int) -> None:
    if v != STATE_VERSION:
        raise ValueError(
            f"sessionize state version {v} != {STATE_VERSION}: checkpoint "
            "was written by an incompatible build (ms-era state would be "
            "reinterpreted as µs). Restart from a fresh checkpoint."
        )


def _session_fn_factory(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                v, start_us, end_us, n = state.get
                _require_version(v)
                state.remove()
                yield _emit(user_id, start_us, end_us, n)
            return

        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(
                (pdf["ts"].astype("int64") // 1_000).tolist()
            )
        ts_us.sort()
        if not ts_us:
            return

        closed: list[tuple[int, int, int]] = []
        if state.exists:
            v, start_us, end_us, n = state.get
            _require_version(v)
        else:
            start_us, end_us, n = ts_us[0], ts_us[0], 0

        for t in ts_us:
            if t - end_us > gap_us:
                closed.append((start_us, end_us, n))
                start_us, n = t, 0
            end_us = max(end_us, t)
            n += 1

        state.update((STATE_VERSION, start_us, end_us, n))
        # setTimeoutTimestamp is ms-based; floor(end/1000) + gap_ms is
        # still >= end + gap - 1ms, and the sentinel-slice replay never
        # relies on timeout firing order anyway.
        state.setTimeoutTimestamp(end_us // 1_000 + gap_us // 1_000)
        for s, e, c in closed:
            yield _emit(user_id, s, e, c)

    return fn


def _emit(user_id: int, start_us: int, end_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            # unit="us" keeps the full microsecond tail (dividing floats
            # through fromtimestamp would reintroduce rounding error).
            "session_start": [pd.to_datetime(start_us, unit="us")],
            "session_end": [pd.to_datetime(end_us, unit="us")],
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
    mult = {
        "minutes": 60_000_000,
        "minute": 60_000_000,
        "seconds": 1_000_000,
        "second": 1_000_000,
    }[unit]
    gap_us = int(amount) * mult
    return (
        events.withWatermark(ts_col, watermark)
        .select(user_col, ts_col)
        .withColumnRenamed(ts_col, "ts")
        .groupBy(user_col)
        .applyInPandasWithState(
            _session_fn_factory(gap_us),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
