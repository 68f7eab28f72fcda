"""Skew-mitigation join: salting for hot keys.

At 100 TB a handful of hot join keys (a viral user, a null-heavy FK, a
default value) concentrate a shuffle partition onto one task. AQE's
skew-join split handles sort-merge joins after the fact; explicit salting
handles it *by construction* and also covers the shuffled-hash path and
aggregate skew. (No reference counterpart — the reference engine is
single-node pandas and never shuffles; this operator exists for the
cluster deployment.)

Mechanics (classic N-way salt):

  - the LARGE (skewed) side gets a per-row salt in ``[0, n_salt)`` —
    derived deterministically from a fingerprint of the whole row, so
    replays/retries land identically (no ``rand()``);
  - the SMALL side is exploded ``n_salt`` times, once per salt value;
  - the equi-join runs on ``(key, salt)`` — each hot key now spreads
    over ``n_salt`` shuffle partitions.

Cost model: the small side is duplicated ``n_salt``×, so this is for
joins whose small side fits comfortably even replicated (dimension-ish
tables too big to broadcast, or broadcast-disabled environments). The
result set is IDENTICAL to the unsalted join — salting is pure physical
rewrite, which is what makes it oracle-checkable against a plain SQL
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_count_by_key"]

_SALT = "__salt"


def _row_salt(df: DataFrame, n_salt: int):
    """Deterministic per-row salt: xxhash64 over every column. Identical
    duplicate rows share a salt — acceptable (load spreading only needs
    the *hot key's* rows to scatter, and a key's rows differ in their
    payload columns)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[tuple[str, str]],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large`` (skewed) to ``small`` with an ``n_salt``-way
    salt on the join key.

    ``on`` is a list of ``(large_col, small_col)`` key pairs. Returns the
    same rows as the plain join (all columns from both sides, salt
    dropped). ``how`` supports ``inner`` and ``left`` (outer semantics
    are preserved: every large-side row keeps exactly its one salt, so a
    left join yields one null-extended row per unmatched large row, not
    ``n_salt``)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_large = large.withColumn(_SALT, _row_salt(large, n_salt))
    # explode the small side once per salt value: a bounded n_salt x |small|
    # blowup that buys per-salt key spreading on the shuffle
    salted_small = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    cond = [salted_large[_SALT] == salted_small[_SALT]]
    for lc, rc in on:
        cond.append(salted_large[lc] == salted_small[rc])
    joined = salted_large.join(
        salted_small, on=cond[0] & _and_all(cond[1:]), how=how
    )
    return joined.drop(_SALT)


def _and_all(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def salted_count_by_key(
    df: DataFrame, keys: list[str], n_salt: int = 8
) -> DataFrame:
    """Two-phase skew-safe count: partial count on ``(keys, salt)`` — the
    map-side/first shuffle spreads a hot key over ``n_salt`` reducers —
    then final sum on ``keys``. Result identical to a plain
    ``groupBy(keys).count()``; the second shuffle moves ``n_salt`` rows
    per key, not the raw rows.

    (For sum/min/max the same shape applies; count is the demonstrator
    Spark's own partial aggregation already covers — this operator is the
    explicit form for aggregates partial-agg can't spread, e.g.
    ``collect_list`` or exact distinct counting per hot key.)"""
    partial = (
        df.withColumn(_SALT, _row_salt(df, n_salt))
        .groupBy(*keys, _SALT)
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("_partial").cast("long").alias("n"))
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 20,
) -> DataFrame:
    """Join-key skew diagnosis: the measurement that decides WHETHER to
    salt and BY HOW MUCH, as one aggregate + one top-k.

    Per top-``top_n`` hot key: ``(key, cnt, share_ppm, skew_x,
    salt_factor)`` where ``skew_x`` = how many times the mean per-key
    count this key holds (floored int), and ``salt_factor`` = the
    suggested salting fan-out ``ceil(cnt / mean_cnt)`` capped at 256 —
    the number a caller passes straight to :func:`salted_join`. A key
    at skew_x=1 is uniform; a key holding 30% of a 100 TB shuffle is
    the single straggler task that decides the job's wall clock, and
    this report finds it with one map-side-combined groupBy over the
    key (8-byte rows), never a sort of the full table.

    All outputs are integer arithmetic (ppm via truncating div on
    non-negative counts), so the report value-hashes across engines.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(top_n)
    return (
        top.crossJoin(F.broadcast(totals))  # 1-row scalar broadcast
        .select(
            "key",
            F.col("cnt").cast("long").alias("cnt"),
            F.expr("(1000000 * cnt) div total").cast("long").alias("share_ppm"),
            # mean per-key count = total/n_keys; skew_x = cnt/mean,
            # computed as exact integer (cnt*n_keys) div total
            F.expr("(cnt * n_keys) div total").cast("long").alias("skew_x"),
            F.least(
                # ceil(cnt*n_keys/total) in pure integers
                F.expr("(cnt * n_keys + total - 1) div total"),
                F.lit(256).cast("long"),
            ).cast("long").alias("salt_factor"),
        )
    )


def join_cardinality_report(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
    top_n: int = 10,
) -> DataFrame:
    """Pre-flight inner-equi-join sizing: the exact output cardinality
    and its per-key concentration, computed WITHOUT running the join —
    the planner-side companion to :func:`skew_report` (which diagnoses
    one table) and the stats-index/bloom pruning family.

    Two map-side-combined per-key count aggregations (8-byte key rows —
    the payload never moves), then a full outer join of the two
    DISTINCT-KEY tables (key-cardinality-sized, orders below the row
    counts). Output: the ``top_n`` largest-output keys, each row also
    carrying the global summary (1-row broadcast, same shape as
    ``skew_report``):

      key, rows_left, rows_right, out_rows, share_ppm,
      est_total_rows  — exact inner-join output size sum(cl*cr)
      matched_keys / left_only_keys / right_only_keys

    ``out_rows`` per key is how a 100 TB join melts down: one hot key
    producing 10^12 output rows is invisible in either input's row count
    and obvious here; ``share_ppm`` over ``est_total_rows`` says whether
    to salt (pass the hot keys to :func:`salted_join`), bloom-prune the
    only-keys, or re-plan entirely. Products and sums run in
    DECIMAL(38,0) (exact, order-independent, overflow-proof at any
    scale); outputs cast to BIGINT.
    """
    right_key = right_key or left_key
    cl = left.groupBy(F.col(left_key).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt_l")
    )
    cr = right.groupBy(F.col(right_key).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt_r")
    )
    per_key = cl.join(cr, "key", "full_outer").select(
        "key",
        F.coalesce("cnt_l", F.lit(0)).cast("long").alias("rows_left"),
        F.coalesce("cnt_r", F.lit(0)).cast("long").alias("rows_right"),
        F.expr(
            "CAST(coalesce(cnt_l, 0) AS DECIMAL(38,0)) * coalesce(cnt_r, 0)"
        ).alias("__out"),
    )
    totals = per_key.agg(
        F.sum("__out").cast("decimal(38,0)").alias("__total"),
        F.sum(F.when(F.col("__out") > 0, 1).otherwise(0))
        .cast("long")
        .alias("matched_keys"),
        F.sum(F.when((F.col("rows_left") > 0) & (F.col("rows_right") == 0), 1)
              .otherwise(0)).cast("long").alias("left_only_keys"),
        F.sum(F.when((F.col("rows_right") > 0) & (F.col("rows_left") == 0), 1)
              .otherwise(0)).cast("long").alias("right_only_keys"),
    )
    top = (
        per_key.filter(F.col("__out") > 0)
        .orderBy(F.col("__out").desc(), F.col("key").asc())
        .limit(top_n)
    )
    return top.crossJoin(F.broadcast(totals)).select(
        "key",
        "rows_left",
        "rows_right",
        F.col("__out").cast("long").alias("out_rows"),
        F.expr("(CAST(1000000 AS DECIMAL(38,0)) * __out) div __total")
        .cast("long")
        .alias("share_ppm"),
        F.col("__total").cast("long").alias("est_total_rows"),
        "matched_keys",
        "left_only_keys",
        "right_only_keys",
    )
