"""Watermarked stream-stream join (attribution-style).

Joins two event streams on a key within a bounded event-time lag —
"each purchase matched to the same user's views in the preceding hour".
Spark keeps BOTH sides' unmatched rows in state; the join is only
scale-safe when (a) both sides carry a watermark and (b) the join
condition bounds the right side's event time relative to the left's, so
the state store can evict rows older than watermark + lag. Without the
time bound the state grows forever — this module makes the bound part
of the operator signature rather than hoping callers remember.

Batch twin: the same function applied to batch DataFrames (watermarks
are no-ops there) — used by the parity test, and semantically equal to
``operators.interval_join`` with intervals [ts - max_lag, ts]. The
bucketed interval join stays the right BATCH plan (equi-join, no state);
this operator is the STREAMING plan (incremental, stateful, bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attribution_join"]


def attribution_join(
    left: DataFrame,
    right: DataFrame,
    on_key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
    right_suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows with the same ``on_key`` whose
    timestamp falls in ``[left_ts - max_lag, left_ts]``.

    Right-side columns are suffixed (the two sides usually share a
    schema). ``how`` may be ``inner`` or ``leftOuter`` (left rows with
    no in-window match null-extend once the watermark passes)."""
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"attribution_join supports inner/leftOuter, got {how!r}")
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, f"{c}{right_suffix}")
    l_wm = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r_wm = (
        r.withWatermark(f"{right_ts}{right_suffix}", watermark)
        if right.isStreaming
        else r
    )
    rkey, rts = f"{on_key}{right_suffix}", f"{right_ts}{right_suffix}"
    cond = (
        (F.col(on_key) == F.col(rkey))
        & (F.col(rts) >= F.col(left_ts) - F.expr(f"INTERVAL {max_lag}"))
        & (F.col(rts) <= F.col(left_ts))
    )
    return l_wm.join(r_wm, cond, how)
