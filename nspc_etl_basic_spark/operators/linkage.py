"""Record linkage / fuzzy entity matching: blocking + edit-distance
verify.

The blocking-then-verify shape is the entity-resolution twin of the
repo's LSH-then-Jaccard dedup pipeline: never compare all pairs —
equi-join on cheap block keys to get candidates, then verify only the
candidates with the expensive measure. Used for joining noisy catalogs,
deduplicating entity tables (suppliers, authors, domains) where exact
and near-dup text matching both miss single-typo variants.

Reference parity: no counterpart in /root/reference (its loader joins
on exact primary keys only) — extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_match(
    left: DataFrame,
    right: DataFrame,
    id_l: str,
    id_r: str,
    col_l: str,
    col_r: str,
    max_distance: int = 2,
    block_len: int = 3,
) -> DataFrame:
    """Candidate pairs ``(id_l, id_r, name_l, name_r, distance)`` with
    ``levenshtein(name_l, name_r) <= max_distance`` (names compared
    lowercased), found via MULTI-KEY BLOCKING: a pair is a candidate if
    it agrees on the first ``block_len`` chars OR the last ``block_len``
    chars — an edit anywhere except simultaneously at both ends cannot
    escape both keys, so single-edit recall is structural, not
    probabilistic. A length-band predicate (``abs(len_l - len_r) <=
    max_distance``, a necessary condition for the distance bound)
    prunes candidates before the O(n*m) edit-distance verify runs.

    Scale: two equi-joins on short block keys + a distinct on the id
    pair + a projection-level verify — never a cross join. Block-key
    skew (a prefix shared by a huge brand family) is ordinary equi-join
    skew: diagnose with ``skew_report`` on the key columns and route
    hot blocks through ``salted_join``; adding more selective keys
    (longer prefixes, token-sorted keys) is the standard ER remedy and
    changes only the candidate set's size, never the verified result.
    Everything is deterministic string algebra in the engine-shared
    subset (left/right/levenshtein), so the driver oracle replays it
    exactly.
    """
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    if block_len < 1:
        raise ValueError(f"block_len must be >= 1, got {block_len}")

    ln = left.select(
        F.col(id_l).alias("__il"),
        F.lower(F.col(col_l)).alias("__nl"),
    ).select(
        "*",
        F.expr(f"left(__nl, {int(block_len)})").alias("__pl"),
        F.expr(f"right(__nl, {int(block_len)})").alias("__sl"),
        F.length("__nl").alias("__ll"),
    )
    rn = right.select(
        F.col(id_r).alias("__ir"),
        F.lower(F.col(col_r)).alias("__nr"),
    ).select(
        "*",
        F.expr(f"left(__nr, {int(block_len)})").alias("__pr"),
        F.expr(f"right(__nr, {int(block_len)})").alias("__sr"),
        F.length("__nr").alias("__lr"),
    )
    band = F.abs(F.col("__ll") - F.col("__lr")) <= max_distance
    by_prefix = ln.join(rn, (F.col("__pl") == F.col("__pr")) & band)
    by_suffix = ln.join(rn, (F.col("__sl") == F.col("__sr")) & band)
    cand = (
        by_prefix.select("__il", "__ir", "__nl", "__nr")
        .unionByName(by_suffix.select("__il", "__ir", "__nl", "__nr"))
        .distinct()
    )
    return cand.select(
        F.col("__il").alias("id_l"),
        F.col("__ir").alias("id_r"),
        F.col("__nl").alias("name_l"),
        F.col("__nr").alias("name_r"),
        F.levenshtein("__nl", "__nr").alias("distance"),
    ).filter(F.col("distance") <= max_distance)
