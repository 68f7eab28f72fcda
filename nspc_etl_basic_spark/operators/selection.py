"""Exact global top-fraction selection WITHOUT a global sort — the
"keep the best X% of the corpus by classifier score" stage that follows
``operators/classifier.py`` in a curation pipeline.

The naive formulations both fail at 100 TB: a global
``row_number() OVER (ORDER BY score DESC)`` funnels the corpus through
ONE task (no partition key), and ``ORDER BY ... LIMIT k`` with corpus-
proportional k materializes a full range-partitioned sort. Exact
``percentile()`` aggregates buffer values per group — corpus-sized here.

This operator instead finds the selection BOUNDARY by iterative
histogram narrowing, then applies it as a scan filter:

1. one aggregate gives (n, min, max) of the integer score column;
   k = floor(n * frac) is the target size;
2. repeatedly bucket the current [lo, hi] score range into <= 4096
   equal-width buckets with ONE map-side-combined aggregate per pass,
   walk the histogram from the top to find the bucket containing the
   k-th largest value, and recurse into it until the bucket width is 1
   — that score is the boundary s*. Passes are logarithmic in the
   score domain with fanout 4096 (two passes cover 2^24 distinct
   values, three cover 2^36); each pass scans only the (id, score)
   projection;
3. ties AT the boundary are broken deterministically by ``id_col``
   ascending (the engine-wide tie rule): the same narrowing runs over
   the id domain WITHIN the boundary stratum to find the id cutoff
   that lands the selection at exactly k rows.

The result is a pure filter — ``score > s* OR (score == s* AND
id <= id*)`` — that arrives with the scan under whole-stage codegen,
so the selection costs a handful of narrow-projection aggregates plus
one filtered pass, never a shuffle of the corpus. All arithmetic is
integer; a DuckDB ``QUALIFY row_number() OVER (ORDER BY score DESC,
id)`` replays the identical row set, which is what makes the operator
oracle-ready for the driver contract.

Driver-side state per pass is one <=4096-row histogram — independent
of corpus size. Scores must be integral (the classifier/DSIR scores
are BIGINT by construction); floats would need quantization first.

Reference parity: no counterpart in /root/reference — extension
surface (LLM-pipeline family).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["select_by_pr_threshold", "top_fraction"]

_FANOUT = 4096


def _kth_largest(df: DataFrame, col: str, k: int, lo: int, hi: int) -> int:
    """The k-th largest value of integer column ``col`` within
    [lo, hi], by histogram narrowing. ``df`` must already be filtered
    to that range and contain >= k rows in it."""
    while lo < hi:
        width = max(1, (hi - lo + 1 + _FANOUT - 1) // _FANOUT)
        hist = {
            r["b"]: r["c"]
            for r in df.select(
                # BIGINT `div`, not `/`: double division loses exactness
                # past 2^53 and classifier scores reach ~1e16
                F.expr(
                    f"CAST((`{col}` - CAST({lo} AS BIGINT)) div "
                    f"CAST({width} AS BIGINT) AS BIGINT)"
                ).alias("b")
            )
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        remaining = k
        # walk buckets from the TOP (largest values first)
        for b in sorted(hist, reverse=True):
            if remaining <= hist[b]:
                lo_b = lo + b * width
                hi_b = min(hi, lo_b + width - 1)
                lo, hi = lo_b, hi_b
                k = remaining
                break
            remaining -= hist[b]
        else:  # fewer than k rows in range — caller guarantees not
            raise ValueError(f"fewer than k rows in [{lo}, {hi}]")
        df = df.where((F.col(col) >= lo) & (F.col(col) <= hi))
    return lo


def _kth_smallest(df: DataFrame, col: str, k: int, lo: int, hi: int) -> int:
    """The k-th smallest value of integer column ``col`` within
    [lo, hi] — same narrowing, walked from the bottom."""
    while lo < hi:
        width = max(1, (hi - lo + 1 + _FANOUT - 1) // _FANOUT)
        hist = {
            r["b"]: r["c"]
            for r in df.select(
                # BIGINT `div`, not `/`: double division loses exactness
                # past 2^53 and classifier scores reach ~1e16
                F.expr(
                    f"CAST((`{col}` - CAST({lo} AS BIGINT)) div "
                    f"CAST({width} AS BIGINT) AS BIGINT)"
                ).alias("b")
            )
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        remaining = k
        for b in sorted(hist):
            if remaining <= hist[b]:
                lo_b = lo + b * width
                hi_b = min(hi, lo_b + width - 1)
                lo, hi = lo_b, hi_b
                k = remaining
                break
            remaining -= hist[b]
        else:
            raise ValueError(f"fewer than k rows in [{lo}, {hi}]")
        df = df.where((F.col(col) >= lo) & (F.col(col) <= hi))
    return lo


def top_fraction(
    df: DataFrame,
    frac: float | Fraction,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Keep exactly ``floor(n * frac)`` rows: the largest by
    ``score_col``, ties at the boundary broken by ``id_col`` ascending
    — the row set of ``QUALIFY row_number() OVER (ORDER BY score DESC,
    id) <= k``, computed without a global sort. Null scores never
    qualify. Requires integer score and id columns."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    scored = df.where(F.col(score_col).isNotNull())
    stats = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(score_col).alias("lo"),
        F.max(score_col).alias("hi"),
    ).collect()[0]
    n = int(stats["n"] or 0)
    # floor(n * frac) in exact arithmetic — float multiplication can
    # disagree with the true floor for large n (n * 0.1 landing one ULP
    # past an integer), which would break the exact-k contract the
    # oracle replays. A float frac is read as the DECIMAL literal the
    # caller typed (str() round-trips the shortest repr: 0.6 -> 3/5),
    # not its binary expansion; pass a Fraction for full control.
    frac_exact = frac if isinstance(frac, Fraction) else Fraction(str(frac))
    k = int(frac_exact * n)
    if k <= 0:
        return df.where(F.lit(False))
    if k >= n:
        return scored
    s_star = _kth_largest(
        scored.select(score_col), score_col, k, int(stats["lo"]), int(stats["hi"])
    )
    above = scored.where(F.col(score_col) > s_star)
    n_above = above.count()
    k_ties = k - n_above
    keep_above = F.col(score_col) > s_star
    if k_ties <= 0:
        # boundary stratum contributes nothing (k landed exactly on the
        # count above s*; cannot happen by construction of s*, but the
        # guard keeps the filter total)
        return scored.where(keep_above)
    stratum = scored.where(F.col(score_col) == s_star).select(id_col)
    id_stats = stratum.agg(
        F.count(F.lit(1)).alias("m"),
        F.min(id_col).alias("ilo"),
        F.max(id_col).alias("ihi"),
    ).collect()[0]
    if k_ties >= int(id_stats["m"]):
        return scored.where(keep_above | (F.col(score_col) == s_star))
    id_star = _kth_smallest(
        stratum, id_col, k_ties, int(id_stats["ilo"]), int(id_stats["ihi"])
    )
    return scored.where(
        keep_above
        | ((F.col(score_col) == s_star) & (F.col(id_col) <= id_star))
    )


def select_by_pr_threshold(
    scored: DataFrame,
    curve: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    target_precision_ppm: int | None = None,
) -> DataFrame:
    """Keep the rows of ``scored`` that clear an operating point chosen
    FROM a held-out PR curve (``classifier_pr_curve``'s output) — the
    measured replacement for an arbitrary fixed keep-fraction: the
    threshold is justified by precision/recall observed on data the
    scorer never trained on.

    Default objective is max-F1 (ties -> the highest threshold, i.e.
    the smallest selection); with ``target_precision_ppm`` the chosen
    row is instead the LOWEST threshold whose held-out precision still
    meets the target — maximum recall subject to the precision floor.
    EITHER path selects nothing when no operating point exists: no
    curve row meets the precision target, or the curve itself is EMPTY
    (an empty or unlabeled eval slice — e.g. a degenerate corpus whose
    cluster-keyed split collapses to one slice, the measured sf1
    case). An empty selection is the honest answer when no threshold
    was ever validated; callers that would rather fail loudly should
    assert the curve is non-empty before selecting.

    Scale: the operating point is a 1-row frame derived from the
    curve (already aggregate-sized, never the corpus) and broadcast
    into a pure scan filter over ``scored`` — no shuffle, no global
    sort, no driver round-trip; composes with any scored frame the
    same trained weights produced (test slice, full corpus, a future
    batch)."""
    best = curve
    if target_precision_ppm is not None:
        best = best.where(
            F.col("precision_ppm") >= int(target_precision_ppm)
        ).orderBy(F.col("threshold").asc())
    else:
        best = best.orderBy(
            F.col("f1_ppm").desc(), F.col("threshold").desc()
        )
    thr = best.limit(1).select(F.col("threshold").alias("__thr"))
    return (
        scored.crossJoin(F.broadcast(thr))
        .where(F.col(score_col) >= F.col("__thr"))
        .drop("__thr")
    )
