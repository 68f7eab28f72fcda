"""Distributed range (interval) join — points matched to containing time
intervals. Spark OSS has no range-join strategy: the naive
``ON p.ts BETWEEN i.start AND i.end`` plans a broadcast-nested-loop (or
cartesian) join, O(|points| x |intervals|) — the exact shape the 100 TB
rule forbids. (Databricks' range-join optimization does server-side what
this operator does explicitly; no reference counterpart.)

Bucketed equi-join form:

  1. pick a bucket width W (ideally >= typical interval length);
  2. each point lands in ONE bucket (floor(ts / W));
  3. each interval explodes into the buckets it overlaps —
     ceil(len/W) + 1 rows, bounded when interval length is bounded;
  4. equi-join on (by-keys, bucket) — a plain shuffled/broadcast hash
     join — then filter exact containment.

A point lives in exactly one bucket, so no dedup pass is needed after
the containment filter. Cost: one shuffle keyed by (by, bucket); the
interval explode factor is len/W + 1 (pick W accordingly). Skewed
buckets split like any other join key under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing it:
    ``start <= ts <= end`` within the same ``by`` group.

    ``how='inner'`` (default) keeps matched pairs; ``'left'`` keeps
    unmatched points with NULL interval columns (implemented as inner +
    anti-union so the equi-join stays a hash join)."""
    by = by or []
    w_us = bucket_seconds * 1_000_000

    p = points.withColumn(
        "__b", F.floor(F.unix_micros(F.col(ts_col)) / w_us)
    )
    i = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / w_us),
                F.floor(F.unix_micros(F.col(end_col)) / w_us),
            )
        ),
    )
    matched = (
        p.join(i, on=[*by, "__b"], how="inner")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__b")
    )
    if how == "inner":
        return matched
    if how == "left":
        interval_cols = [
            c for c in intervals.columns if c not in by
        ]
        unmatched = points.join(
            matched.select(*points.columns), on=points.columns, how="left_anti"
        )
        for c in interval_cols:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(dict(intervals.dtypes)[c])
            )
        return matched.unionByName(unmatched)
    raise ValueError(f"unsupported how: {how!r}")
