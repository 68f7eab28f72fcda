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
