"""Robust per-key statistics: median / MAD and winsorized aggregates.

Outlier-resistant summaries for metric streams whose tails lie (p99
latencies, ad-hoc value columns): the median absolute deviation is the
standard robust scale estimate (breakdown point 50%, vs 0% for the
stddev), and winsorization clamps rather than drops the tails so the
mean stays defined over the full population.

Determinism: both quantile passes use exact linear-interpolation
percentile (Spark ``percentile`` == DuckDB ``quantile_cont`` — the
same cross-engine identity events_percentiles pins); derived doubles
round at 6 per the engine contract.

Scale: ``robust_stats_by_key`` is two key-keyed aggregates with a join
between (the second pass needs each row's deviation from ITS key's
median — a broadcastable |keys|-row table for grouped metrics);
``winsorize_by_key`` is one aggregate + one broadcast join + a clamp
projection. Exact percentile sorts each group — the oracle-checkable
tier; at extreme cardinality swap ``approx_percentile`` in and accept
bounded error, same trade the percentile query documents.

Reference parity: no counterpart in /root/reference — extension
surface (analytics family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["robust_stats_by_key", "winsorize_by_key"]


def _null_safe_key_join(df: DataFrame, small: DataFrame, key_col: str):
    """Broadcast equi-join that keeps the NULL-key group: a plain
    ``join(key)`` drops null-key rows (NULL != NULL), silently losing a
    legitimate group from the stats."""
    other = small.withColumnRenamed(key_col, "__k")
    return df.join(
        F.broadcast(other), F.col(key_col).eqNullSafe(F.col("__k"))
    ).drop("__k")


def robust_stats_by_key(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key ``(median, mad, n)`` — MAD = median(|v - median_k|),
    both medians exact-interpolated, rounded 6. A NULL key is a real
    group and is retained (null-safe join)."""
    med = df.groupBy(key_col).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("__med"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = _null_safe_key_join(df, med, key_col).select(
        key_col,
        "__med",
        "n",
        F.abs(F.col(value_col) - F.col("__med")).alias("__adev"),
    )
    return dev.groupBy(key_col).agg(
        F.round(F.first("__med"), 6).alias("median"),
        F.round(F.percentile(F.col("__adev"), F.lit(0.5)), 6).alias("mad"),
        F.first("n").alias("n"),
    )


def winsorize_by_key(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Clamp ``value_col`` to its key's [lo_q, hi_q] exact quantiles:
    returns the input rows plus ``<value>_wins`` (clamped, rounded 6).
    Tail values are retained at the fence, not dropped — the winsorized
    mean downstream stays a full-population statistic."""
    if not 0.0 <= lo_q < hi_q <= 1.0:
        raise ValueError(f"need 0 <= lo_q < hi_q <= 1, got ({lo_q}, {hi_q})")
    fences = df.groupBy(key_col).agg(
        F.percentile(F.col(value_col), F.lit(lo_q)).alias("__lo"),
        F.percentile(F.col(value_col), F.lit(hi_q)).alias("__hi"),
    )
    return (
        _null_safe_key_join(df, fences, key_col)
        .withColumn(
            f"{value_col}_wins",
            F.round(
                F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
                6,
            ),
        )
        .drop("__lo", "__hi")
    )
