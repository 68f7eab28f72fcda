"""Slowly-changing-dimension Type 2 history building and incremental apply.

Extends the reference's MERGE upsert surface (`file-to-sql-loader.py`
D1/D2: keyed last-wins upsert) with the other classic warehouse merge:
instead of overwriting, every attribute change opens a new validity
interval (`valid_from`, `valid_to`, `is_current`).

Two forms:

* :func:`scd2_from_feed` — batch-rebuild the full history from a change
  feed. One shuffle (window partitioned by business key), no joins.
* :func:`scd2_apply_changes` — incrementally fold a new batch of changes
  into an existing SCD2 table (DLT ``APPLY CHANGES``-style). Only the
  keys present in the batch are rewritten; untouched keys pass through —
  pair it with the bucketed differential sink so a trickle batch rewrites
  min(K, N) buckets, not the table.

Scale: both are single-key-shuffle plans. The window frames are bounded
(lag/lead of 1); change compression happens before the second window so
state per key stays O(changes), never O(rows).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _attr_struct(attr_cols: Sequence[str]):
    return F.struct(*[F.col(c) for c in attr_cols])


def scd2_from_feed(
    feed: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Build a full Type-2 history from a change feed.

    Ordering within a key is (``ts_col``, *tiebreak_cols) — pass a unique
    tiebreak (e.g. the source row id) so same-timestamp changes order
    deterministically. Consecutive rows whose ``attr_cols`` are unchanged
    are compressed away (no zero-length "change"); the surviving rows get
    ``valid_from`` = their ts, ``valid_to`` = next change's ts (null for
    the current row), ``is_current``.

    Plan: ONE hash shuffle on ``key_cols``; both windows (the lag for
    change compression, the lead for interval close) reuse the same
    partitioning, so Spark sorts once per key-partition and pipelines.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(*order)

    attrs = _attr_struct(attr_cols)
    changed = feed.withColumn(
        "_prev_attrs", F.lag(attrs).over(w)
    ).where(F.col("_prev_attrs").isNull() | (attrs != F.col("_prev_attrs")))

    w2 = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(*order)
    out = changed.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
    return out


def scd2_apply_changes(
    existing: DataFrame,
    batch: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Fold a batch of new changes into an existing SCD2 table.

    Semantics: for every key in ``batch``, replay that key's existing
    intervals (re-expanded to their opening change) plus the new changes
    through :func:`scd2_from_feed`; keys absent from the batch are passed
    through untouched (no shuffle for them beyond the anti-join).

    This is idempotent for replayed batches (the change compression drops
    a re-delivered identical change) — the property the streaming ingest
    relies on for exactly-once effect.

    Same-(key, ts) collisions resolve as: a batch change REPLACES the
    same-timestamp history row (correction semantics — matches a rebuild
    over the last-wins-deduped raw change log); within a batch the
    highest ``tiebreak_cols`` value wins. Two same-(key, ts) batch rows
    WITHOUT a tiebreak order nondeterministically — dedupe upstream
    (the pipeline's scd2 mode last-wins on input order first).

    ASSUMPTION (standard CDC ordering): a batch change for key k must not
    predate k's existing history. The SCD2 table is compressed state —
    consecutive identical changes leave no trace — so a LATE-arriving
    change timestamped inside an existing interval cannot re-split a run
    the compression already collapsed, and ``apply == rebuild`` then
    breaks. For in-order feeds (each key's new changes at or after its
    last ``valid_from``) incremental apply equals the full rebuild
    (`tests/test_scd_randomized.py`); out-of-order arrivals need the raw
    change log, not the table — rebuild from it.
    """
    batch_keys = batch.select(*key_cols).dropDuplicates(list(key_cols))

    untouched = existing.join(F.broadcast(batch_keys), list(key_cols), "left_anti")

    touched_hist = existing.join(F.broadcast(batch_keys), list(key_cols), "left_semi")
    tb = list(tiebreak_cols or [])
    # re-expand history rows to their opening change event; reopened rows
    # have no original tiebreak value — null sorts first (asc NULLS
    # FIRST), so at an equal timestamp the pre-existing change
    # deterministically precedes the batch's
    reopened = touched_hist.select(
        *key_cols,
        *attr_cols,
        F.col("valid_from").alias(ts_col),
        *[
            F.lit(None).cast(batch.schema[c].dataType).alias(c)
            for c in tb
        ],
    ).withColumn("_prio", F.lit(0))
    new_changes = batch.select(
        *key_cols, *attr_cols, F.col(ts_col), *tb
    ).withColumn("_prio", F.lit(1))

    # one change per (key, ts): the BATCH row wins a timestamp collision
    # with reopened history (correction semantics — matches a rebuild
    # over the last-wins-deduped raw change log; keeping both would emit
    # a phantom zero-length interval), and re-delivered identical
    # changes collapse the same way.
    w = Window.partitionBy(*[F.col(k) for k in key_cols], F.col(ts_col)).orderBy(
        F.col("_prio").desc(),
        *[F.col(c).desc_nulls_last() for c in tb],
    )
    feed = (
        reopened.unionByName(new_changes)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )
    rebuilt = scd2_from_feed(
        feed,
        key_cols,
        ts_col,
        attr_cols,
        tb or None,
    ).select(*key_cols, *attr_cols, "valid_from", "valid_to", "is_current")
    return untouched.unionByName(rebuilt)
