"""Per-group trend estimation: exact-sufficient-statistics OLS.

``grouped_ols`` fits ``y = intercept + slope * x`` per group with x =
whole seconds since the group's first observation — the drift/trend
primitive behind monitoring ("is this metric creeping?"), data-quality
regression ("is doc length trending down per source?") and feature
engineering.

Determinism is the design center, the same trick as
``operators/anomaly.py``: every sufficient statistic (Σx, Σy, Σxy, Σx²,
Σy²) accumulates in DECIMAL — exact, associative, partition-order-
independent — and only the final slope/intercept/r² arithmetic drops to
doubles, in one pinned operation order a SQL oracle replays bit-for-bit.
(A float ``covar_pop``/``regr_slope`` could never sit behind a
value-hashed cross-engine gate.)

Scale: two map-side-combined aggregate passes — per-group min timestamp
(broadcast back: |groups| rows), then the five sums in ONE aggregate.
No window, no sort, no per-row state. Decimal headroom: x is capped at
~1e12 seconds (30k years) by DECIMAL(12,0); Σx² at DECIMAL(38,0) holds
1e13 rows of century-long series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cusum_alarms(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
    slack_sigmas: float = 0.5,
    threshold_sigmas: float = 4.0,
) -> DataFrame:
    """Per-key one-sided CUSUM change-point detection (Page 1954):
    ``(key_col, n_obs, n_alarms, first_alarm_ts)`` — how many times the
    positive cumulative deviation statistic CROSSED the threshold from
    below (rising edges: ``s > h`` where the previous observation had
    ``s <= h``; a sustained shift is one alarm, not one per in-alarm
    row), and when it first did. Classic CUSUM resets S to 0 after an
    alarm — a reset the prefix-min rewrite below cannot express — so an
    edge here marks the start of a distinct exceedance EPISODE of the
    un-reset statistic, which is the monitoring-useful count.

    The recurrence ``S_t = max(0, S_{t-1} + x_t)`` is rewritten as the
    prefix identity ``S_t = P_t - min(0, min_{j<=t} P_j)`` with
    ``P_t = Σ x_i`` — two cumulative windows instead of a sequential
    fold, so the walk stays a key-partitioned window (parallel with
    keys, no per-row Python, no in-row array).

    Determinism is engineered, not hoped for: the deviations
    ``x = v - (μ + slack·σ)`` are computed in DECIMAL, with μ and
    slack·σ QUANTIZED to 6 decimals via floor (the repo's standard
    floor(·*1e6)/1e6 pin) before entering the sum — cumulative DECIMAL
    sums are exact and order-independent, so the running P and its
    running min are bit-identical in any engine regardless of how the
    window executor sums (a DOUBLE running sum would depend on the
    aggregator's internal association). μ and σ come from decimal
    sufficient statistics; sqrt is IEEE-correctly-rounded everywhere.

    Scale: one stats aggregate (broadcast back, |keys| rows) + one
    key-partitioned sort for the two stacked cumulative windows (they
    share the exchange and the sort) + a final per-key aggregate.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(key_col),
        F.col(ts_col),
        us.alias("__us"),
        *[F.col(c) for c in (order_cols or [])],
        F.col(value_col).cast("decimal(18,6)").alias("__vd"),
    )
    stats = base.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__vd").cast("decimal(38,6)").alias("__sv"),
        F.sum(F.col("__vd") * F.col("__vd")).cast("decimal(38,12)").alias(
            "__svv"
        ),
    )
    nd = F.col("__n").cast("double")
    sv = F.col("__sv").cast("double")
    svv = F.col("__svv").cast("double")
    var = F.when(
        F.col("__n") > 1, (nd * svv - sv * sv) / (nd * (nd - F.lit(1.0)))
    )
    sigma = F.sqrt(var)
    mu = sv / nd
    q = lambda c: (F.floor(c * F.lit(1e6)) / F.lit(1e6)).cast(  # noqa: E731
        "decimal(18,6)"
    )
    params = stats.select(
        key_col,
        q(mu + F.lit(float(slack_sigmas)) * sigma).alias("__ref"),
        q(F.lit(float(threshold_sigmas)) * sigma).alias("__h"),
    ).where(F.col("__h").isNotNull() & (F.col("__h") > 0))
    j = base.join(F.broadcast(params), key_col)
    order = [F.col("__us")] + [F.col(c) for c in (order_cols or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = F.col("__vd") - F.col("__ref")
    p = F.sum(x).over(w)
    stepped = j.withColumn("__p", p)
    runmin = F.min("__p").over(w)
    s = F.col("__p") - F.least(runmin, F.lit(0).cast("decimal(18,6)"))
    # rising-edge detection: lag shares the cumulative windows' exchange
    # and sort (same partitioning + order), so this adds no shuffle
    wo = Window.partitionBy(key_col).orderBy(*order)
    over = stepped.withColumn("__over", (s > F.col("__h")).cast("int"))
    alarmed = over.withColumn(
        "__alarm",
        (
            (F.col("__over") == 1)
            & (F.coalesce(F.lag("__over").over(wo), F.lit(0)) == 0)
        ).cast("int"),
    )
    return alarmed.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("__alarm").cast("long").alias("n_alarms"),
        F.min(F.when(F.col("__alarm") == 1, F.col(ts_col))).alias(
            "first_alarm_ts"
        ),
    )


def welch_t(
    df: DataFrame,
    key_col: str,
    value_col: str,
    flag_col: str,
    critical: float = 1.959964,
) -> DataFrame:
    """Per-key Welch's unequal-variance t-test between the flag=true
    and flag=false populations: ``(key_col, n_a, n_b, mean_a, mean_b,
    t_stat, df, significant)`` — the A/B comparison primitive
    (before/after a change, treatment/control, first/second half).

    Single pass: all six sufficient statistics (n, Σv, Σv² per side)
    come from ONE map-side-combined aggregate with conditional decimal
    sums — exact and partition-order-independent — and the
    t/Welch–Satterthwaite-df finale is pinned double arithmetic the
    oracle replays term-for-term. ``significant`` compares |t| against
    a caller-supplied critical value (default: two-sided normal 5% —
    the large-sample approximation; for small n supply the t-quantile
    yourself, this operator does not ship an incomplete-beta CDF
    because transcendental CDFs are not cross-engine replayable).
    Keys missing either side, or with a zero-variance side, return
    null t/df/significant."""
    vd = F.col(value_col).cast("decimal(18,6)")
    is_a = F.col(flag_col)
    agg = df.where(F.col(value_col).isNotNull()).groupBy(key_col).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(is_a, vd)).cast("decimal(38,6)").alias("__sa"),
        F.sum(F.when(~is_a, vd)).cast("decimal(38,6)").alias("__sb"),
        F.sum(F.when(is_a, vd * vd)).cast("decimal(38,12)").alias("__qa"),
        F.sum(F.when(~is_a, vd * vd)).cast("decimal(38,12)").alias("__qb"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    sa = F.col("__sa").cast("double")
    sb = F.col("__sb").cast("double")
    qa = F.col("__qa").cast("double")
    qb = F.col("__qb").cast("double")
    # every division guarded by a when() excluding its zero divisor —
    # ANSI mode errors on x/0 even for null numerators, and CASE WHEN
    # is the short-circuit that keeps the degenerate rows null
    ma = F.when(F.col("n_a") > 0, sa / na)
    mb = F.when(F.col("n_b") > 0, sb / nb)
    va = F.when(
        F.col("n_a") > 1, (na * qa - sa * sa) / (na * (na - F.lit(1.0)))
    )
    vb = F.when(
        F.col("n_b") > 1, (nb * qb - sb * sb) / (nb * (nb - F.lit(1.0)))
    )
    sea = F.when(F.col("n_a") > 1, va / na)
    seb = F.when(F.col("n_b") > 1, vb / nb)
    ok = (
        (F.col("n_a") > 1)
        & (F.col("n_b") > 1)
        & ((sea + seb) > 0)  # null (missing side) compares to false
    )
    tstat = F.when(ok, (ma - mb) / F.sqrt(sea + seb))
    dfw = F.when(
        ok & (va > 0) & (vb > 0),
        ((sea + seb) * (sea + seb))
        / (
            (sea * sea) / (na - F.lit(1.0))
            + (seb * seb) / (nb - F.lit(1.0))
        ),
    )
    return agg.select(
        key_col,
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(tstat, 6).alias("t_stat"),
        F.round(dfw, 4).alias("df"),
        F.when(
            tstat.isNotNull(), F.abs(tstat) > F.lit(float(critical))
        ).alias("significant"),
    )


def grouped_ols(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """``(key_col, n, slope, intercept, r2)`` per group; slope/r²
    rounded to 8, intercept to 6. Degenerate groups (constant x) get
    null slope/intercept/r²; constant y (zero variance) gets null r².
    slope units: value per second."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(key_col),
        us.alias("__us"),
        F.col(value_col).cast("double").alias("__y"),
    )
    mins = base.groupBy(key_col).agg(F.min("__us").alias("__us0"))
    j = base.join(F.broadcast(mins), key_col)
    xd = F.expr("(__us - __us0) div 1000000").cast("decimal(12,0)")
    yd = F.col("__y").cast("decimal(18,6)")
    a = j.select(F.col(key_col), xd.alias("__xd"), yd.alias("__yd")).groupBy(
        key_col
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__xd").cast("decimal(38,0)").alias("__sx"),
        F.sum("__yd").cast("decimal(38,6)").alias("__sy"),
        F.sum(F.col("__xd") * F.col("__yd")).cast("decimal(38,6)").alias(
            "__sxy"
        ),
        F.sum(F.col("__xd") * F.col("__xd")).cast("decimal(38,0)").alias(
            "__sxx"
        ),
        F.sum(F.col("__yd") * F.col("__yd")).cast("decimal(38,12)").alias(
            "__syy"
        ),
    )
    nd = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    num = nd * sxy - sx * sy
    denx = nd * sxx - sx * sx
    deny = nd * syy - sy * sy
    slope = F.when(denx > 0, num / denx)
    intercept = F.when(denx > 0, (sy - (num / denx) * sx) / nd)
    r2 = F.when(
        (denx > 0) & (deny > 0), (num * num) / (denx * deny)
    )
    return a.select(
        key_col,
        "n",
        F.round(slope, 8).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 8).alias("r2"),
    )
