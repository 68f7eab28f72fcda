"""Distributed as-of join — an operator Spark's DataFrame API lacks
(pandas has ``merge_asof``; DuckDB/kdb have ASOF JOIN; no reference
counterpart — training-data/feature pipelines need it to attach the most
recent prior observation to each event).

Implementation is the union-window form, NOT a range-explode or a
per-key loop:

  1. tag right rows 0 and left rows 1, union them aligned on
     (by-keys, event-time, tag);
  2. one window per by-key ordered by (time, tag) carries the LAST right
     payload seen so far (the tag ordering decides whether an equal-time
     right row sorts before the left row — pandas
     ``allow_exact_matches``);
  3. keep the left rows, now holding their as-of match.

Cost at any scale: ONE shuffle on the by-keys + one per-partition sort
per direction — the same price as a groupBy over the same keys
(``nearest`` runs two window sorts over the one exchange). No O(n·m)
pair blowup, no driver loop, no state. Skewed by-keys are split by AQE
like any other window/shuffle key.

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
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance: float | None = None,
) -> DataFrame:
    """pandas ``merge_asof`` semantics, distributed.

    For every left row, attach the right row within the same ``by``
    group chosen by ``direction``:

      backward  greatest right ``on`` <= left's (default);
      forward   smallest right ``on`` >= left's;
      nearest   whichever of the two is closer (ties -> backward,
                matching pandas).

    ``allow_exact_matches=False`` makes the comparisons strict.
    ``tolerance`` (same units as ``on`` for numerics; SECONDS for
    timestamp columns) null-outs matches farther than the bound.
    ``right_cols`` are the right columns to carry (default: all except
    ``on``/``by``), renamed with ``suffix``.

    The right side should be unique per (by, on) — pre-dedup if not, or
    ties resolve by union order (nondeterministic under shuffle)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction}")
    from pyspark.sql import types as T

    on_is_time = isinstance(
        left.schema[on].dataType,
        (T.TimestampType, T.TimestampNTZType, T.DateType),
    )

    def dist(a, b):
        # |a-b| in the on-column's units (seconds for time columns —
        # exact: µs integers, one division). Branch chosen at PLAN time
        # from the column dtype, never by runtime casting.
        if on_is_time:
            return F.abs(
                (
                    F.unix_micros(a.cast("timestamp"))
                    - F.unix_micros(b.cast("timestamp"))
                ).cast("double")
            ) / 1e6
        return F.abs(a.cast("double") - b.cast("double"))

    by = by or []
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    carry = [on, *right_cols]

    # NULL on-keys: pandas merge_asof rejects them outright; here they
    # are simply never matches. Right rows with NULL `on` must be dropped
    # BEFORE the union — under the window sort (asc NULLS FIRST / desc
    # NULLS LAST) they would otherwise sort to an edge and be "seen" by
    # every left row as a phantom earliest/latest observation.
    right = right.filter(F.col(on).isNotNull())

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
    unioned = l_union.unionByName(r_union)

    # side ordering encodes allow_exact_matches: right-before-left at
    # equal times includes the exact match; left-before-right excludes it
    side_inclusive = F.col("__side").asc()   # right (0) first
    side_exclusive = F.col("__side").desc()  # left (1) first

    def backward_match(df):
        w = (
            Window.partitionBy(*by)
            .orderBy(
                F.col(on).asc(),
                side_inclusive if allow_exact_matches else side_exclusive,
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn("__m_bwd", F.last("__rp", ignorenulls=True).over(w))

    def forward_match(df):
        w = (
            Window.partitionBy(*by)
            .orderBy(
                F.col(on).desc(),
                side_inclusive if allow_exact_matches else side_exclusive,
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn("__m_fwd", F.last("__rp", ignorenulls=True).over(w))

    if direction == "backward":
        matched = backward_match(unioned).withColumn("__match", F.col("__m_bwd"))
    elif direction == "forward":
        matched = forward_match(unioned).withColumn("__match", F.col("__m_fwd"))
    else:
        matched = backward_match(forward_match(unioned))
        bwd, fwd = F.col("__m_bwd"), F.col("__m_fwd")
        d_bwd = dist(F.col(on), bwd[on])
        d_fwd = dist(F.col(on), fwd[on])
        matched = matched.withColumn(
            "__match",
            F.when(bwd.isNull(), fwd)
            .when(fwd.isNull(), bwd)
            # tie -> backward (pandas nearest semantics)
            .when(d_fwd < d_bwd, fwd)
            .otherwise(bwd),
        )

    matched = matched.filter(F.col("__side") == 1)
    # a left row with NULL `on` stays unmatched (under desc NULLS LAST it
    # would otherwise pick up the minimum right `on` as a spurious
    # forward match)
    matched = matched.withColumn(
        "__match", F.when(F.col(on).isNotNull(), F.col("__match"))
    )
    if tolerance is not None:
        within = dist(F.col(on), F.col("__match")[on]) <= F.lit(float(tolerance))
        matched = matched.withColumn(
            "__match", F.when(within, F.col("__match"))
        )

    out_cols = [F.col(f"__lp.{c}").alias(c) for c in l_cols]
    out_cols += [
        F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in carry
    ]
    return matched.select(*out_cols)

