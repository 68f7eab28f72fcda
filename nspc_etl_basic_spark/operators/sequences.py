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
