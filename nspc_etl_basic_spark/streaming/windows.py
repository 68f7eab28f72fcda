"""Event-time windowed aggregation with watermarks (SURVEY.md §7.1 M7).

Works identically on batch and streaming DataFrames — the batch twin is
what the driver's oracle checks (``events_windowed`` in
``__spark_entry__.py``); the streaming form adds the watermark so state
for closed windows is dropped (bounded state at 100 TB/day rates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _agg_exprs() -> list[Column]:
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("sum_value"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_value"),
    ]


def windowed_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time window per key. With ``watermark`` set (streaming),
    late rows beyond the bound are dropped and window state is reclaimed."""
    df = events
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, window), F.col(key_col)).agg(*_agg_exprs())


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str | None = None,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Sliding (overlapping) event-time windows — each row lands in
    window/slide buckets."""
    df = events
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(ts_col, window, slide), F.col(key_col)
    ).agg(*_agg_exprs())


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Spark's NATIVE ``session_window`` (dynamic windows that extend
    while events keep arriving within ``gap``), batch and streaming.
    Streaming requires the watermark: a session only closes — and its
    state is only dropped — once the watermark passes its end, so this
    is append-mode with bounded state. The applyInPandasWithState
    sessionizer (streaming/sessionize.py) remains the tier for
    per-session custom logic; this is the declarative fast path the
    engine should prefer when the aggregate IS expressible."""
    df = events
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    sess = df.groupBy(
        F.session_window(F.col(ts_col), gap), F.col(key_col)
    ).agg(*_agg_exprs())
    return sess.select(
        key_col,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        "sum_value",
        "avg_value",
    )
