"""Event-sequence mining: per-key transition (Markov) statistics.

``transition_counts`` builds the first-order transition matrix of an
event stream — for every (from, to) pair of consecutive events WITHIN a
key's timeline, the count and the row-normalized transition probability.
The classic product-analytics / behavioral-modeling primitive (what
comes after a click?) and the sufficient statistic for a first-order
Markov chain over event types.

Scale: the lead() window partitions BY KEY (user), so the sequence walk
parallelizes with the keys — no unpartitioned window touches data rows.
The pair aggregation is map-side combined down to at most |types|² rows;
the per-from normalization then windows over that TINY matrix, not the
data. Ties at equal timestamps are pinned by the caller's unique
``order_cols`` tie-break, which is what makes the result deterministic
and oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    top_k: int = 100,
) -> DataFrame:
    """Market-basket co-occurrence: ``(item_a, item_b, cnt)`` for the
    ``top_k`` most frequent unordered item pairs sharing a basket —
    the support-counting core of frequent-itemset mining (Apriori's
    k=2 pass) and of 'bought-together' recommendations.

    Scale: the pair generation is a SELF-JOIN CO-PARTITIONED ON THE
    BASKET KEY (both sides shuffle once on the same key — never a
    cartesian), so the blow-up is bounded by Σ C(basket_size, 2), a
    per-basket quantity; the ``item_a < item_b`` predicate halves it
    and canonicalizes pair order. Dedup-first keeps quantity columns
    from inflating supports. Top-k runs as TakeOrdered (no global
    sort), totally ordered by (cnt DESC, item_a, item_b) so the cut
    boundary is deterministic and oracle-replayable."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    items = df.select(
        F.col(basket_col).alias("__bk"), F.col(item_col).alias("__it")
    ).distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__bk") == F.col("b.__bk"))
        & (F.col("a.__it") < F.col("b.__it")),
    ).select(
        F.col("a.__it").alias("item_a"), F.col("b.__it").alias("item_b")
    )
    counts = pairs.groupBy("item_a", "item_b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.orderBy(
        F.col("cnt").desc(), F.col("item_a"), F.col("item_b")
    ).limit(int(top_k))


def transition_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    event_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """``(from_event, to_event, cnt, prob)`` with prob floored to 6
    decimals (floor(cnt*1e6/row_total)/1e6 — exact-order IEEE ops any
    engine replays bit-for-bit)."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(event_col).over(w)
    pairs = (
        df.select(
            F.col(event_col).alias("from_event"), nxt.alias("to_event")
        )
        .where(F.col("to_event").isNotNull())
    )
    counts = pairs.groupBy("from_event", "to_event").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = F.sum("cnt").over(Window.partitionBy("from_event"))
    return counts.select(
        "from_event",
        "to_event",
        "cnt",
        (
            F.floor(F.col("cnt") * F.lit(1e6) / tot.cast("double"))
            / F.lit(1e6)
        ).alias("prob"),
    )
