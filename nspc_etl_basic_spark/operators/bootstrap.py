"""Deterministic Poisson bootstrap: confidence intervals for grouped
means without resampling shuffles — and without randomness an oracle
can't replay.

The Poisson bootstrap (Chamandy et al., "Estimating uncertainty for
massive data streams", Google 2012) replaces sampling-with-replacement
by giving every row an independent Poisson(1) weight per replicate —
the standard large-scale bootstrap because it needs no global n and
streams in one pass. This implementation makes it REPLAYABLE:

  - the per-(replicate, row) uniform is the md5-hex-slice integer over
    2^32 (an exact power-of-two division — the KMV trick),
  - the Poisson(1) weight is a fixed CASE ladder over literal cumulative
    probabilities (truncated at 8; tail mass < 1e-6),
  - replicate sums ride DECIMAL (exact, order-independent),
  - the CI picks order statistics of the B replicate means by pinned
    integer indexing of the sorted list.

Scale: ONE pass — each row explodes into B (replicate, weight) cells
that aggregate map-side into |groups|·B partial sums; the quantile pick
then sorts B numbers per group IN-ROW. No data-sized shuffle beyond the
groupBy the plain mean already pays, no window over data rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: cumulative Poisson(1) probabilities, P(X <= k) for k = 0..7, rounded
#: to 9 decimals — shared literals with the SQL oracle; weights beyond 8
#: are truncated (tail mass ~1e-7)
POISSON1_CDF = [
    0.367879441,
    0.735758882,
    0.919698603,
    0.981011843,
    0.996340153,
    0.999405815,
    0.999916759,
    0.999989751,
]

_HASH_DOMAIN = float(1 << 32)


def _weight_expr(u):
    w = F.lit(8)
    for k in reversed(range(len(POISSON1_CDF))):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w


def bootstrap_mean_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    n_replicates: int = 20,
    alpha: float = 0.05,
    salt: str = "boot",
) -> DataFrame:
    """``(key_col, n, mean, boot_lo, boot_hi)`` — the exact grouped mean
    plus an (1-alpha) percentile-bootstrap interval from
    ``n_replicates`` Poisson-weighted replicate means. ``id_col`` must
    be unique per row (it seeds the per-row uniforms)."""
    if n_replicates < 4:
        raise ValueError("n_replicates must be >= 4")
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    b_col = F.explode(
        F.sequence(F.lit(0), F.lit(int(n_replicates) - 1))
    ).alias("__b")
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(key_col),
        F.col(id_col).cast("string").alias("__id"),
        F.col(value_col).cast("decimal(18,6)").alias("__vd"),
        b_col,
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(salt),
                        F.col("__b").cast("string"),
                        F.col("__id"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(_HASH_DOMAIN)
    )
    # hoist u into a named column BEFORE the CASE ladder: conditional
    # branches are not CSE'd, so an inlined u would recompute the md5
    # up to 8x per row (measured ~3x on the full query)
    cells = (
        base.withColumn("__u", u)
        .withColumn("__w", _weight_expr(F.col("__u")))
        .groupBy(key_col, "__b")
        .agg(
            F.sum("__w").cast("long").alias("__nw"),
            F.sum(F.col("__w").cast("decimal(18,6)") * F.col("__vd"))
            .cast("decimal(38,12)")
            .alias("__sw"),
        )
        .where(F.col("__nw") > 0)
    )
    rep_mean = (
        F.col("__sw").cast("double") / F.col("__nw").cast("double")
    )
    means = cells.select(key_col, rep_mean.alias("__m"))
    # nearest-rank order statistics: rank ceil(q*B) is the canonical
    # inverse-CDF pick; the previous int(q*(B-1))+1 indexing drifted low
    # (at the B=20/alpha=.05 defaults it picked rank 19 instead of 20
    # for boot_hi; boot_lo is rank 1 — the minimum — under BOTH
    # conventions there, which is inherent to nearest-rank at small B:
    # ceil(0.025*20) = 1. Raise B past 40 for an interior lower bound.)
    lo_idx = max(1, math.ceil((alpha / 2.0) * n_replicates))
    hi_idx = min(n_replicates, math.ceil((1.0 - alpha / 2.0) * n_replicates))
    boot = means.groupBy(key_col).agg(
        F.sort_array(F.collect_list("__m")).alias("__ms")
    ).select(
        key_col,
        F.round(
            F.element_at(
                "__ms", F.least(F.lit(lo_idx), F.size("__ms"))
            ),
            6,
        ).alias("boot_lo"),
        F.round(
            F.element_at(
                "__ms", F.least(F.lit(hi_idx), F.size("__ms"))
            ),
            6,
        ).alias("boot_hi"),
    )
    exact = df.where(F.col(value_col).isNotNull()).groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean"),
    )
    return exact.join(boot, key_col)
