"""Preference-pair mining — (chosen, rejected) training pairs for
reward-model / DPO-style finetuning data prep.

Given any per-document score (quality score, DSIR target-likeness,
length — the operator is score-agnostic), produce pairs of documents
from the SAME stratum (language, topic cluster, source) where the
chosen member outscores the rejected one by at least ``min_gap``.
Pairing adjacent ranks within the stratum — rank r with rank r+1 —
is the standard low-variance construction: every document appears in
at most two pairs, the score gap is as small as the data allows (hard
pairs), and the pairing is a PURE FUNCTION of (score, id) — fully
deterministic under ties via the id tie-break.

Plan: ONE window pass — rank + lead over (stratum, score desc, id) —
no self-join (the naive rank-to-rank+1 join shuffles twice and breaks
under ties). One shuffle on the stratum; at 100 TB that is the same
price as any per-stratum rollup, and strata are the natural partition
unit. Skewed strata are bounded by the window's sort, not by any
driver state.

Reference parity: no counterpart in /root/reference — extension
surface (LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["preference_pairs"]


def preference_pairs(
    df: DataFrame,
    id_col: str,
    score_col: str,
    strata_col: str,
    min_gap: int = 1,
) -> DataFrame:
    """Adjacent-rank preference pairs per stratum: ``(strata_col,
    chosen_id, rejected_id, chosen_score, rejected_score, gap)`` with
    ``gap = chosen_score - rejected_score >= min_gap`` (equal-score
    neighbors make no pair when min_gap >= 1 — a tie teaches a reward
    model nothing). Ordering is (score desc, id asc): deterministic
    under ties, replayable in SQL."""
    if min_gap < 0:
        raise ValueError(f"min_gap must be >= 0, got {min_gap}")
    w = Window.partitionBy(strata_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    paired = df.select(
        strata_col,
        F.col(id_col).alias("chosen_id"),
        F.col(score_col).alias("chosen_score"),
        F.lead(id_col).over(w).alias("rejected_id"),
        F.lead(score_col).over(w).alias("rejected_score"),
    )
    gap = F.col("chosen_score") - F.col("rejected_score")
    return paired.where(
        F.col("rejected_id").isNotNull() & (gap >= min_gap)
    ).select(
        strata_col,
        "chosen_id",
        "rejected_id",
        "chosen_score",
        "rejected_score",
        gap.alias("gap"),
    )
