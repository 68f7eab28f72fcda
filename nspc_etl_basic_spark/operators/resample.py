"""Time-series resampling: regular per-key grids with forward fill.

Spark has windowed AGGREGATION (`F.window`, session_window) but no
resample: pandas' ``df.resample('6h').last().ffill()`` — snap
observations to a regular grid and carry the last observation across
empty buckets — has no built-in equivalent, yet it is the standard
feature-engineering step before any ML on irregular event streams
(sensor readings, account balances, metric gauges).

DataFrame construction, all deterministic integer arithmetic:

  1. bucket = ``(unix_micros(ts) - unix_micros(ts) % step_us) / 1e6``
     — a pure projection; exact (the subtraction yields a multiple of
     the step, and every intermediate fits a double's 2^53 integer
     range for any real epoch);
  2. last observation per (key, bucket): ``max(struct(us, value))`` —
     one map-side-combined aggregate, ties broken by value, no window
     over raw events;
  3. the grid: per-key (min, max) bucket from the SAME aggregate pass
     shape, exploded with ``F.sequence`` — output-proportional, no
     driver loop;
  4. forward fill: ``last(value, ignorenulls=True)`` over the
     key-partitioned grid ordered by bucket — the window runs on the
     GRID (span/step rows per key), never on the raw events.

Scale: two key-keyed exchanges (bucket-last aggregate, grid window) —
the same price as any per-key rollup; the explode is grid-sized. A
key observed over a huge span with a tiny step produces a huge grid —
that is a property of the ASK (span/step rows must exist in the
output), not of the plan. NULL observations are dropped before
bucketing (an explicit NULL reading is "no observation", matching
pandas ``last()`` + ``ffill`` semantics).

The whole construction is replayable in ANSI SQL (epoch_us, arg-max
by (us, value), generate_series, last_value IGNORE NULLS) — see the
``events_resample`` oracle in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _grid_joined(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Shared stages 1-3: bucket, per-bucket arg-max observation,
    per-key grid, left-joined — ``(key_col, __bk, __o{s,v} | null)``."""
    if step_seconds < 1:
        raise ValueError(f"step_seconds must be >= 1, got {step_seconds}")
    step_us = step_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    bk = ((us - us % F.lit(step_us)) / F.lit(1_000_000)).cast("long")

    obs = df.where(F.col(value_col).isNotNull()).select(
        F.col(key_col),
        bk.alias("__bk"),
        F.struct(us.alias("s"), F.col(value_col).alias("v")).alias("__o"),
    )
    bucket_last = obs.groupBy(key_col, "__bk").agg(F.max("__o").alias("__o"))
    spans = obs.groupBy(key_col).agg(
        F.min("__bk").alias("__b0"), F.max("__bk").alias("__b1")
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence(
                F.col("__b0"), F.col("__b1"), F.lit(int(step_seconds))
            )
        ).alias("__bk"),
    )
    return grid.join(bucket_last, [key_col, "__bk"], "left")


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
    grid_col: str = "grid_epoch",
    observed_col: str = "is_observed",
) -> DataFrame:
    """Per ``key_col``, a regular grid every ``step_seconds`` from the
    key's first to last observation bucket, with ``value_col`` =
    last-observation-carried-forward. Returns
    ``(key_col, grid_col [epoch seconds, long], value_col,
    observed_col)``. See module docstring for semantics and cost."""
    j = _grid_joined(df, key_col, ts_col, value_col, step_seconds)
    w = (
        Window.partitionBy(key_col)
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        key_col,
        F.col("__bk").alias(grid_col),
        F.last(F.col("__o.v"), ignorenulls=True).over(w).alias(value_col),
        F.col("__o").isNotNull().alias(observed_col),
    )


def ewma_by_key(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average over the
    time-ordered observations (pandas ``ewm(alpha, adjust=False)
    .mean()``'s final value): ``y_0 = v_0; y_t = y_{t-1}*(1-a) + v_t*a``.
    Returns one row per key: ``(key_col, n_obs, out_col)``.

    The recurrence is inherently sequential, so it runs as an IN-ROW
    fold: one map-side-combined ``collect_list(struct(us, v))`` per key
    (ties ordered by value — deterministic), ``sort_array``, then
    ``F.aggregate`` with the pinned step ``(acc * (1-a)) + (v * a)`` —
    the exact op order DuckDB's ``list_reduce`` replays, so the EWMA
    itself sits behind the value-hashed oracle (round 6).

    Contract: the per-key series materializes in one row — right for
    bounded histories (a user's events, a sensor's day). For unbounded
    series, resample first (``resample_ffill`` downsamples the series
    to span/step points) or maintain the EWMA incrementally per batch
    (the recurrence folds left-to-right, so a stored (y, n) advances
    with each micro-batch exactly)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    us = F.unix_micros(F.col(ts_col))
    obs = df.where(F.col(value_col).isNotNull()).select(
        F.col(key_col),
        F.struct(
            us.alias("s"), F.col(value_col).cast("double").alias("v")
        ).alias("__o"),
    )
    ser = obs.groupBy(key_col).agg(
        F.sort_array(F.collect_list("__o")).alias("__ser"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    vs = F.transform(F.col("__ser"), lambda o: o["v"])
    a, b = float(alpha), 1.0 - float(alpha)
    fold = F.aggregate(
        vs,
        F.lit(None).cast("double"),
        lambda acc, v: F.when(acc.isNull(), v).otherwise(
            acc * F.lit(b) + v * F.lit(a)
        ),
    )
    return ser.select(key_col, "n_obs", F.round(fold, 6).alias(out_col))


def twap_by_key(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key TIME-weighted average (TWAP) under step semantics: each
    observation's value holds until the next observation, so

        twap = Σ v_i · (t_{i+1} - t_i) / (t_n - t_0)

    — the standard correction when observations are irregular and a
    plain mean over-weights bursty periods. Returns one row per key:
    ``(key_col, n_obs, span_seconds, twap)``; keys with a single
    observation (zero span) get ``twap = value``.

    Determinism: weights are exact integer micros (lead over the pinned
    (ts, order_cols) order) and the weighted sum accumulates in
    DECIMAL — v·Δt products and their sum are exact, so partitioning
    never changes the result; only the final divide is a double. The
    lead window partitions per key; the aggregate is map-side combined.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = [F.col("__us")] + [F.col(c) for c in (order_cols or [])]
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(key_col),
        us.alias("__us"),
        F.col(value_col).cast("decimal(18,6)").alias("__vd"),
        *[F.col(c) for c in (order_cols or [])],
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead("__us").over(w)
    stepped = base.select(
        F.col(key_col),
        "__us",
        "__vd",
        (nxt - F.col("__us")).alias("__dt"),
    )
    agg = stepped.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.min("__us").alias("__t0"),
        F.max("__us").alias("__tn"),
        F.sum(
            F.col("__vd") * F.col("__dt").cast("decimal(20,0)")
        ).cast("decimal(38,6)").alias("__wsum"),
        F.max(F.when(F.col("__dt").isNull(), F.col("__vd"))).alias(
            "__last"
        ),
    )
    span = F.col("__tn") - F.col("__t0")
    twap = F.when(
        span > 0,
        F.col("__wsum").cast("double") / span.cast("double"),
    ).otherwise(F.col("__last").cast("double"))
    return agg.select(
        key_col,
        "n_obs",
        F.floor(span.cast("double") / F.lit(1e6)).cast("long").alias(
            "span_seconds"
        ),
        F.round(twap, 6).alias("twap"),
    )


def rolling_time_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int = 86400,
) -> DataFrame:
    """Per-key rolling aggregates over a TIME range frame
    ``[t - window, t]``: appends ``rolling_n`` and ``rolling_mean``.
    The sliding-window primitive behind rate limiting, burst scoring
    and trailing-24h metrics — and deliberately a RANGE frame, not a
    ROWS frame: the frame is defined by timestamp VALUES, so rows with
    equal timestamps share one frame and no tie-break is needed for
    determinism (a ROWS frame would need one).

    The summed term rides DECIMAL — the frame aggregator is free to
    associate additions however it likes without changing the result,
    which is what lets a SQL oracle replay every row. One
    key-partitioned sort; the frame walk is the window executor's
    two-pointer pass, no self-join blow-up."""
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.where(F.col(value_col).isNotNull()).withColumn(
        "__us", us
    ).withColumn("__vd", F.col(value_col).cast("decimal(18,6)"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__us"))
        .rangeBetween(-int(window_seconds) * 1_000_000, 0)
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum("__vd").over(w)
    return base.withColumn("rolling_n", n.cast("long")).withColumn(
        "rolling_mean",
        F.round(s.cast("double") / n.cast("double"), 6),
    ).drop("__us", "__vd")


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
    grid_col: str = "grid_epoch",
    observed_col: str = "is_observed",
) -> DataFrame:
    """Like :func:`resample_ffill` but LINEARLY interpolating between
    the surrounding observations (pandas ``.interpolate('linear')`` on
    the resampled series). The grid is bounded by observation buckets,
    so every grid point has both a preceding and a following
    observation — no edge extrapolation cases. Two grid windows (the
    backward last + forward first carry struct(bucket, value), same
    exchange) and one projection:

        v = v_prev + (v_next - v_prev) * (t - t_prev) / (t_next - t_prev)

    computed in that exact IEEE order (round-6), so a SQL oracle
    replays the interpolated values bit-for-bit."""
    j = _grid_joined(df, key_col, ts_col, value_col, step_seconds)
    carried = j.select(
        key_col,
        "__bk",
        F.col("__o").isNotNull().alias(observed_col),
        F.when(
            F.col("__o").isNotNull(),
            F.struct(F.col("__bk").alias("b"), F.col("__o.v").alias("v")),
        ).alias("__ob"),
    )
    wb = (
        Window.partitionBy(key_col)
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy("__bk")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    both = carried.select(
        key_col,
        "__bk",
        observed_col,
        F.last("__ob", ignorenulls=True).over(wb).alias("__p"),
        F.first("__ob", ignorenulls=True).over(wf).alias("__n"),
    )
    p_v, n_v = F.col("__p.v"), F.col("__n.v")
    p_b, n_b = F.col("__p.b"), F.col("__n.b")
    interp = F.when(n_b == p_b, p_v).otherwise(
        F.round(
            p_v
            + (n_v - p_v)
            * (F.col("__bk") - p_b).cast("double")
            / (n_b - p_b).cast("double"),
            6,
        )
    )
    return both.select(
        key_col,
        F.col("__bk").alias(grid_col),
        interp.alias(value_col),
        observed_col,
    )
