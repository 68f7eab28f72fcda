"""Distributed as-of join — an operator Spark's DataFrame API lacks
(pandas has ``merge_asof``; DuckDB/kdb have ASOF JOIN; no reference
counterpart — training-data/feature pipelines need it to attach the most
recent prior observation to each event).

Implementation is the union-window form, NOT a range-explode or a
per-key loop:

  1. tag right rows 0 and left rows 1, union them aligned on
     (by-keys, event-time, tag);
  2. one window per by-key ordered by (time, tag) carries the LAST right
     payload seen so far (right sorts before left at equal times, so
     exact-time matches are included, pandas ``allow_exact_matches``
     semantics);
  3. keep the left rows, now holding their as-of match.

Cost at any scale: ONE shuffle on the by-keys + one per-partition sort —
the same price as a groupBy over the same keys. No O(n·m) pair blowup,
no driver loop, no state. Skewed by-keys are split by AQE like any other
window/shuffle key.

The right payload is carried as a STRUCT: ``last(..., ignorenulls)``
must skip rows, not values, so a right row whose payload fields are NULL
still matches (the struct itself is non-null for every right row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``on`` <= left's ``on`` within the same ``by`` group (NULLs when no
    prior right row exists). ``right_cols`` are the right columns to
    carry (default: all except ``on``/``by``), renamed with ``suffix``.

    The right side should be unique per (by, on) — pre-dedup if not, or
    ties resolve by union order (nondeterministic under shuffle)."""
    by = by or []
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    carry = [on, *right_cols]

    # the right payload struct; the left side carries a typed NULL of the
    # same struct so the union lines up
    r_payload = F.struct(*[F.col(c).alias(c) for c in carry])
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("__side"),
        r_payload.alias("__rp"),
    )
    l_cols = left.columns
    l_union = left.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__rp"].dataType).alias("__rp"),
        F.struct(*[F.col(c).alias(c) for c in l_cols]).alias("__lp"),
    )
    r_union = r_tagged.withColumn(
        "__lp", F.lit(None).cast(l_union.schema["__lp"].dataType)
    )

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_union.unionByName(r_union)
        .withColumn("__match", F.last("__rp", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col(f"__lp.{c}").alias(c) for c in l_cols]
    out_cols += [
        F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in carry
    ]
    return matched.select(*out_cols)
