"""Streaming deduplication: the streaming twin of ``operators.dedup``'s
exact tier (no reference counterpart — the reference is batch-only; this
is the M7 extension surface, SURVEY.md §7.1).

Two shapes, both state-bounded via watermark so they survive unbounded
streams:

  - ``stream_dedup_exact``: drop every record whose content fingerprint
    was already seen within the watermark horizon —
    ``dropDuplicatesWithinWatermark`` keys state by the 32-byte md5, so
    document bodies never enter the state store, and state older than the
    horizon is reclaimed (the batch analogue of exact_dedup's
    hash-groupBy contract).
  - ``stream_dedup_keys``: exactly-once-per-key emission for id streams
    (e.g. upsert change feeds) — classic ``dropDuplicates`` on the key
    plus event-time watermark.

At 100 TB/day the state store is the scale limit, which is why state
holds (hash, timestamp) only and the watermark bounds its cardinality to
the horizon's traffic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit only the first occurrence of each distinct content within the
    watermark horizon. State is keyed by md5(text) — 32 bytes per distinct
    document, bodies never stored."""
    return (
        stream.withColumn("__fp", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def stream_dedup_keys(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-wins per key within the watermark horizon."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
