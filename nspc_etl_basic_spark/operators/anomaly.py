"""Group-wise anomaly detection over metric streams.

Z-score outlier flagging per group (e.g. per event_type): one aggregate
pass computes each group's sufficient statistics (n, Σx, Σx²), a
broadcast join re-attaches them, and a projection computes the deviation.
No window function — a ``Window.partitionBy(group)`` would put every row
of a group on one task (catastrophic for a 5-group, 100 TB events table);
the agg+broadcast form keeps the scan embarrassingly parallel and the
only "shuffle" is the tiny stats table.

Determinism: Σx and Σx² accumulate in DECIMAL, which is exact and
associative — the flagged set is bitwise-identical at any partition
count (double sums are order-dependent and would flutter at the
threshold boundary). The sufficient statistics are also MERGEABLE
(plain sums), which is what the streaming tier
(`streaming/anomaly.py`) exploits: per-batch stats accumulate in a
keyed store and z-scores apply against the corpus-to-date moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sufficient_stats(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group (``_n``, ``_s1``, ``_s2``) — count, decimal-exact sum
    and sum of squares. Mergeable: stats from partial scans ADD.

    decimal(18,6) operands: the product type (37,12) stays within
    precision 38 in BOTH Spark and the DuckDB oracle — wider operands
    would overflow 38 and the two engines round differently.
    """
    v = F.col(value_col).cast("decimal(18,6)")
    return df.groupBy(group_col).agg(
        F.count(F.col(value_col)).alias("_n"),
        F.sum(v).alias("_s1"),
        F.sum(v * v).alias("_s2"),
    )


def moments(stats: DataFrame, group_col: str) -> DataFrame:
    """(group, ``_mean``, ``_sd``, ``_n``) from sufficient statistics,
    keeping only groups with n >= 2 and positive variance."""
    n = F.col("_n").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    return stats.select(
        group_col,
        (s1 / n).alias("_mean"),
        F.sqrt(
            F.greatest((s2 - s1 * s1 / n) / (n - F.lit(1.0)), F.lit(0.0))
        ).alias("_sd"),
        "_n",
    ).where((F.col("_n") >= 2) & (F.col("_sd") > 0))


def zscore_against(
    df: DataFrame,
    group_moments: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Flag rows of ``df`` whose value deviates > ``threshold`` stddevs
    from the given per-group moments (broadcast re-attach, no window)."""
    z = (F.col(value_col) - F.col("_mean")) / F.col("_sd")
    return (
        df.join(F.broadcast(group_moments), group_col)
        .where(F.abs(z) > threshold)
        .select(
            *df.columns,
            F.round("_mean", 4).alias("mean"),
            F.round("_sd", 4).alias("stddev"),
            F.round(z, 4).alias("z"),
        )
    )


def zscore_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Rows whose value deviates > ``threshold`` sample stddevs from their
    group mean. Adds ``mean``, ``stddev``, ``z`` (all rounded to 4) to the
    input columns. Groups with < 2 rows or zero variance yield no outliers.
    """
    stats = sufficient_stats(df, group_col, value_col)
    return zscore_against(
        df, moments(stats, group_col), group_col, value_col, threshold
    )
