"""Incremental materialized-view maintenance over a CDC change feed.

A grouped-aggregate MV (``GROUP BY dims -> count + decimal sums``) is
kept current by folding a Delta-CDF-style change feed (the shape
``operators/merge.merge_changes`` emits: ``op`` in {'insert',
'update_preimage', 'update_postimage', 'delete'}) into it — the fact
table itself is never rescanned.

Why count + sum: both are *self-maintainable* aggregates — each change
row contributes a signed delta, so the refreshed MV is computable from
(old MV, feed) alone (the classic incremental-view-maintenance result;
cf. Delta Live Tables / Materialize). min/max are NOT self-maintainable
under deletes (a retracted row may have carried the extremum) and are
deliberately excluded; derive avg = sum/count downstream.

All sums are carried as DECIMAL(28,4): decimal addition is exact and
associative, so the incrementally maintained MV is bit-identical to a
full recompute — pinned by pytest AND by the driver oracle, whose SQL
recomputes the post-merge table from scratch.

100 TB shape: ``mv_delta`` aggregates ONLY the feed (batch-sized,
orders of magnitude under the fact table); ``mv_apply_delta`` is one
outer join keyed on the group dims between the MV (|groups| rows) and
the delta (≤ |feed| groups, broadcastable when the batch is small).
Refresh cost is proportional to the CHANGE, not the table — at 100 TB
the alternative full re-aggregation is a full scan + shuffle per
refresh.

Reference parity: the reference loader recomputes destination-table
statistics from scratch after every merge (file-to-sql-loader.py's
post-load stats pass); this module is the incremental counterpart that
a lake-scale deployment needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(28,4)"

# Signed contribution of each CDC op to the group's row count.
_OP_SIGN = {
    "insert": 1,
    "update_postimage": 1,
    "update_preimage": -1,
    "delete": -1,
}


def _sum_alias(c: str) -> str:
    return f"sum_{c}"


def summary_mv(
    df: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Full (re)build of the MV: one shuffle keyed on the group dims,
    map-side partial aggregation; sums exact in DECIMAL(28,4)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).cast("decimal(18,4)")).cast(_DEC).alias(_sum_alias(c))
        for c in sum_cols
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def mv_delta(
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Signed per-group delta from a change feed. Unknown op values
    raise at plan time via a CASE with no ELSE -> null sign, which the
    following filter drops; callers wanting strictness validate ops
    upstream (merge_changes only emits the three known ops)."""
    sign = F.create_map(
        *[x for k, v in _OP_SIGN.items() for x in (F.lit(k), F.lit(v))]
    )[F.col(op_col)]
    signed = changes.where(sign.isNotNull()).withColumn("__sign", sign)
    aggs = [F.sum("__sign").alias("n_rows")] + [
        F.sum(
            F.col("__sign").cast(_DEC) * F.col(c).cast("decimal(18,4)")
        ).cast(_DEC).alias(_sum_alias(c))
        for c in sum_cols
    ]
    return signed.groupBy(*group_cols).agg(*aggs)


def mv_apply_delta(
    mv: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    broadcast_delta: bool = True,
) -> DataFrame:
    """Fold a delta into the MV: full-outer join on the group dims
    (new groups appear, emptied groups — n_rows falls to 0 — drop).
    ``broadcast_delta`` reflects the common shape (batch ≪ table);
    pass False for backfill-sized feeds and let AQE pick the join.

    A full-outer broadcast is not a Spark physical plan, so the
    broadcast hint applies to the delta side and AQE falls back to a
    shuffled join only when it must; with the default hint Spark plans
    the outer join as two broadcast legs at batch scale."""
    d = delta
    if broadcast_delta:
        d = F.broadcast(d)
    val_cols = ["n_rows"] + [_sum_alias(c) for c in sum_cols]
    mv_r = mv.select(
        *group_cols, *[F.col(c).alias(f"__m_{c}") for c in val_cols]
    )
    d_r = d.select(
        *group_cols, *[F.col(c).alias(f"__d_{c}") for c in val_cols]
    )
    joined = mv_r.join(d_r, group_cols, "full_outer")
    zero = {c: F.lit(0).cast("long") if c == "n_rows" else F.lit(0).cast(_DEC)
            for c in val_cols}
    out = joined.select(
        *group_cols,
        *[
            (
                F.coalesce(F.col(f"__m_{c}"), zero[c])
                + F.coalesce(F.col(f"__d_{c}"), zero[c])
            ).cast("long" if c == "n_rows" else _DEC).alias(c)
            for c in val_cols
        ],
    )
    return out.where(F.col("n_rows") > 0)


def incremental_refresh(
    mv: DataFrame,
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    op_col: str = "op",
    broadcast_delta: bool = True,
) -> DataFrame:
    """delta + apply in one call — the per-batch refresh step."""
    d = mv_delta(changes, group_cols, sum_cols, op_col=op_col)
    return mv_apply_delta(
        mv, d, group_cols, sum_cols, broadcast_delta=broadcast_delta
    )
