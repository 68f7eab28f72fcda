"""Deterministic corpus sampling, splitting, and budget selection.

Training-data pipelines need REPRODUCIBLE subset selection: the same
document must land in the same sample/split on every run, on any cluster
layout, after any retry. ``df.sample()``/``sampleBy()`` are seeded per
partition — repartition the input and membership changes. These
operators instead derive membership from a hash of the row KEY:

    bucket(key) = int(md5(salt || key)[:8], 16) % 10_000

which is a pure projection (no shuffle, no state, no partition
sensitivity) and replayable in any engine with md5 — the driver oracle
recomputes membership in DuckDB SQL exactly.

``take_until_budget`` is the scale-safe form of "take documents until N
tokens": a naive ``Window.orderBy(...)`` with no partition key collapses
the whole corpus onto ONE task. Here the global prefix sum is
range-bucketed: deterministic equal-width key buckets, per-bucket
subtotals (driver-bounded: one row per bucket), per-bucket offsets
joined back, then a windowed cumsum WITHIN each bucket — every stage
parallel, no single-partition window. (Same decomposition as parallel
prefix-scan; no reference counterpart — the reference engine is
single-node pandas.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "hash_bucket",
    "hash_sample",
    "md5_ring32",
    "stratified_sample",
    "assign_split",
    "take_until_budget",
    "pack_sequences",
    "mixture_order",
    "epoch_shuffle",
]

_BUCKETS = 10_000


def md5_ring32(key_col, salt: str = "") -> "F.Column":
    """THE engine-wide deterministic hash: 32-bit ring position from
    md5 of ``salt || key`` — first 8 hex chars -> long (conv base
    16 -> 10). Pure projection; identical arithmetic is expressible in
    DuckDB (``CAST('0x' || substr(md5(salt || key), 1, 8) AS
    BIGINT)``), which is what makes every hash-derived operator
    value-replayable. Every ring consumer (bucketing, sampling,
    packing, sharding, token/n-gram hashing) derives from this one
    definition — change it here or nowhere."""
    h = F.md5(F.concat(F.lit(salt), key_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def hash_bucket(key_col, salt: str = "") -> "F.Column":
    """Deterministic bucket in [0, 10000): ``md5_ring32 % 10000``."""
    return md5_ring32(key_col, salt) % _BUCKETS


def hash_sample(df: DataFrame, key: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` of the bucket
    space. Reproducible across runs/partitionings; disjoint salts give
    independent samples."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    # round(), never int(): 0.57 * 10000 is 5699.999... in IEEE double and
    # int() would silently drop one bucket, diverging from any decimal
    # replay of the same threshold
    return df.filter(hash_bucket(F.col(key), salt) < round(fraction * _BUCKETS))


def stratified_sample(
    df: DataFrame, key: str, strata_col: str, fractions: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash sampling (e.g. downsample per language/source to
    rebalance a corpus). ``fractions`` maps stratum value -> keep
    fraction; missing strata keep NOTHING (explicit is better than
    accidental passthrough of an unlisted language). One projection +
    filter — no shuffle, no per-stratum jobs."""
    bucket = hash_bucket(F.col(key), salt)
    threshold = F.lit(-1)
    for value, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        threshold = F.when(
            F.col(strata_col) == value, F.lit(round(frac * _BUCKETS))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def assign_split(
    df: DataFrame, key: str, weights: dict[str, float], salt: str = "split",
) -> DataFrame:
    """Label every row with a split name ('train'/'val'/'test', any
    names) by hash-bucket range. Splits are disjoint and exhaustive
    (weights must sum to 1 within rounding); membership is a pure
    function of the key, so a document can never migrate between splits
    when the corpus grows. Adds a ``split`` column."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(F.col(key), salt)
    expr = None
    cum = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        cum += w
        cond = bucket < round(cum * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def _bucketed_prefix_sum(
    df: DataFrame,
    order_key: str,
    weight_col: str,
    n_buckets: int,
    max_offset: int | None = None,
):
    """Distributed global prefix sum over a NUMERIC unique order key.
    Returns ``(frame_with_cum_weight, empty)``.

      1. deterministic equal-width buckets from min/max of the key (two
         scalar aggregates — no sampled RangePartitioner, so the
         bucketing is stable across runs/retries);
      2. per-bucket subtotals -> driver (``n_buckets`` rows, bounded);
      3. cumulative offset per bucket, rejoined as a broadcast literal
         when-chain;
      4. windowed cumsum PARTITIONED BY bucket + the bucket's offset —
         no unpartitioned window anywhere.

    With ``max_offset`` set, buckets whose starting offset already
    reaches it are pruned before the window (their rows cannot matter to
    a ``cum_weight <= max_offset`` consumer)."""
    lo, hi = df.agg(
        F.min(order_key).cast("long"), F.max(order_key).cast("long")
    ).first()
    if lo is None:
        return df.withColumn("cum_weight", F.lit(None).cast("long")).limit(0), True
    width = max((hi - lo + n_buckets) // n_buckets, 1)
    bucket = ((F.col(order_key).cast("long") - F.lit(lo)) / F.lit(width)).cast(
        "long"
    )
    b = df.withColumn("__bucket", bucket)
    subtotals = (
        b.groupBy("__bucket")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("__subtotal"))
        .collect()
    )
    # a bucket whose every weight is NULL sums to None — treat as 0, the
    # same contribution its rows make to the cumulative sum
    totals = {r["__bucket"]: (r["__subtotal"] or 0) for r in subtotals}
    offsets, acc = {}, 0
    for bk in sorted(totals):
        offsets[bk] = acc
        acc += totals[bk]
    # keep boundary buckets (<=, not <): a zero-weight row at the head of
    # a bucket starting exactly at max_offset has cum_weight == max_offset
    # and a `cum_weight <= budget` consumer keeps it
    live = [
        bk for bk in offsets if max_offset is None or offsets[bk] <= max_offset
    ]
    offset_expr = F.lit(0)
    for bk in live:
        offset_expr = F.when(F.col("__bucket") == bk, F.lit(offsets[bk])).otherwise(
            offset_expr
        )
    w = Window.partitionBy("__bucket").orderBy(order_key)
    out = (
        b.filter(F.col("__bucket").isin(live))
        .withColumn(
            "cum_weight",
            F.sum(F.col(weight_col).cast("long")).over(w) + offset_expr,
        )
        .drop("__bucket")
    )
    return out, False


def take_until_budget(
    df: DataFrame,
    order_key: str,
    weight_col: str,
    budget: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Rows in ``order_key`` order until the running sum of ``weight_col``
    exceeds ``budget`` (greedy prefix selection: a row is kept iff its
    cumulative weight, itself included, is within budget). Adds a
    ``cum_weight`` column (exact integer arithmetic); see
    ``_bucketed_prefix_sum`` for the scale decomposition."""
    out, empty = _bucketed_prefix_sum(
        df, order_key, weight_col, n_buckets, max_offset=budget
    )
    if empty:
        return out
    return out.filter(F.col("cum_weight") <= budget)


def pack_sequences(
    df: DataFrame,
    order_key: str,
    weight_col: str,
    seq_len: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents laid end-to-end in
    ``order_key`` order form one logical token stream; each row gets the
    fixed-length training sequence(s) it lands in —

        seq_start = floor((cum_weight - weight) / seq_len)
        seq_end   = floor((cum_weight - 1) / seq_len)

    (``n_seqs = seq_end - seq_start + 1`` counts the chunks a document
    spans; a document shorter than ``seq_len`` usually has
    ``seq_start == seq_end``). This is the standard pretraining packing
    layout; the global offsets come from the same range-bucketed prefix
    sum as ``take_until_budget`` — no unpartitioned window. Adds
    ``cum_weight``, ``seq_start``, ``seq_end``, ``n_seqs``."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    out, empty = _bucketed_prefix_sum(df, order_key, weight_col, n_buckets)
    if empty:
        return (
            out.withColumn("seq_start", F.lit(None).cast("long"))
            .withColumn("seq_end", F.lit(None).cast("long"))
            .withColumn("n_seqs", F.lit(None).cast("long"))
        )
    start = F.floor(
        (F.col("cum_weight") - F.col(weight_col).cast("long")) / seq_len
    )
    end = F.floor((F.col("cum_weight") - 1) / seq_len)
    return (
        out.withColumn("seq_start", start)
        .withColumn("seq_end", end)
        .withColumn("n_seqs", F.col("seq_end") - F.col("seq_start") + 1)
    )


def mixture_order(
    df: DataFrame,
    source_col: str,
    key: str,
    weights: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Deterministic weighted interleaving for mixing corpus sources into
    one training stream (stride scheduling): source ``s`` with weight
    ``w`` fills a slot every ``1/w`` positions, so every prefix of the
    priority-ordered stream holds sources in weight proportion —
    "60% web, 30% code, 10% books" without materializing a shuffle of
    the whole corpus into one sequence.

    Rows rank WITHIN their source by (hash of key, key) — hash-first so
    the stream isn't ingestion-ordered — then

        mix_priority = (mix_rank - 0.5) / weight[source]

    Consumers stream in ``mix_priority`` order (a range-partitioned sort
    at write time); this operator itself is one per-source window + a
    projection, no global window. Sources absent from ``weights`` are
    dropped (explicit mixture, no accidental passthrough). Adds
    ``mix_rank`` and ``mix_priority``."""
    for s, w in weights.items():
        if w <= 0:
            raise ValueError(f"weight for {s!r} must be positive, got {w}")
    bucket = hash_bucket(F.col(key), salt)
    w_expr = F.lit(None).cast("double")
    for s, w in sorted(weights.items()):
        w_expr = F.when(F.col(source_col) == s, F.lit(float(w))).otherwise(w_expr)
    win = Window.partitionBy(source_col).orderBy(bucket, F.col(key))
    return (
        df.filter(F.col(source_col).isin(list(weights)))
        .withColumn("mix_rank", F.row_number().over(win).cast("long"))
        .withColumn(
            "mix_priority",
            F.round((F.col("mix_rank") - 0.5) / w_expr, 6),
        )
    )


def epoch_shuffle(
    df: DataFrame,
    key: str,
    seed: int,
    n_shards: int,
    salt: str = "epoch",
) -> DataFrame:
    """Deterministic per-epoch global shuffle + shard assignment for
    training-order randomization: every row gets ``(shard, pos)`` —
    which output shard file it belongs to and its 1-based position
    within that shard — purely from ``md5(salt || seed || '|' || key)``.
    Same (seed, key) -> same slot on any cluster layout, any retry;
    a new seed is a fresh independent permutation (new epoch).

    Scale: NO global sort and NO unpartitioned window. The md5 hex is
    split into independent digit fields: digits 1-8 pick the shard
    (mod ``n_shards``), digits 9-10 a 256-way POSITION BUCKET inside
    the shard. Per-(shard, bucket) counts aggregate map-side into
    ``n_shards*256`` rows; their within-shard cumulative offsets come
    from a window over that TINY table, broadcast back; the final
    row_number window is partitioned by (shard, bucket) — at 100 TB
    every stage is parallel and the widest window partition is
    ~|shard|/256 rows. Writing ``partitionBy(shard)`` sorted by pos
    streams each shard in shuffled order.

    Replayable in any engine: pos == row_number() over (partition by
    shard order by bucket, hash, key) — the driver oracle does exactly
    that."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    hk = F.md5(
        F.concat(F.lit(f"{salt}{int(seed)}|"), F.col(key).cast("string"))
    )
    base = (
        df.withColumn("__hk", hk)
        .withColumn(
            "shard",
            (
                F.conv(F.substring(F.col("__hk"), 1, 8), 16, 10).cast("long")
                % int(n_shards)
            ),
        )
        .withColumn(
            "__pb",
            F.conv(F.substring(F.col("__hk"), 9, 2), 16, 10).cast("long"),
        )
    )
    counts = base.groupBy("shard", "__pb").agg(
        F.count(F.lit(1)).alias("__c")
    )
    wb = Window.partitionBy("shard").orderBy("__pb")
    offsets = counts.withColumn(
        "__off", F.sum("__c").over(wb) - F.col("__c")
    ).drop("__c")
    wr = Window.partitionBy("shard", "__pb").orderBy("__hk", F.col(key))
    return (
        base.join(F.broadcast(offsets), ["shard", "__pb"])
        .withColumn(
            "pos", (F.col("__off") + F.row_number().over(wr)).cast("long")
        )
        .drop("__hk", "__pb", "__off")
    )


def temperature_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    alpha: float = 0.5,
    target_rows: int | None = None,
    salt: str = "",
) -> DataFrame:
    """Temperature-based corpus rebalancing (the standard multilingual
    mixture rule): stratum g gets sampling weight n_g^alpha / Σ n^alpha,
    so alpha=1 preserves natural proportions, alpha=0 makes strata
    uniform, and alpha≈0.5 lifts low-resource strata without drowning
    high-resource ones. Per-stratum keep fraction is
    ``min(1, target_rows * w_g / n_g)`` (default target: the corpus
    size), applied as the same deterministic md5-bucket filter as
    :func:`hash_sample` — one projection + filter, no shuffle of data.

    The only driver-side work is the per-stratum count collect (bounded
    by the number of strata). Thresholds use ``floor`` (not round) so
    any engine replaying the identical double arithmetic lands on the
    same bucket cutoff; with alpha=0.5 the power is ``sqrt`` (correctly
    rounded IEEE, bit-identical across engines) — other alphas depend on
    the platform ``pow`` and may drift one bucket at the edge.
    """
    import math

    counts = {
        r[0]: r[1] for r in df.groupBy(strata_col).count().collect()
    }
    if not counts:
        return df
    total = sum(counts.values())
    target = total if target_rows is None else int(target_rows)
    # canonical left-to-right summation in stratum order: float addition
    # is order-dependent in the last ulp, and the threshold floor must be
    # replayable by an oracle summing in the same declared order
    wsum = 0.0
    for value in sorted(counts, key=str):
        wsum += math.pow(counts[value], alpha)
    bucket = hash_bucket(F.col(key), salt)
    threshold = F.lit(-1)
    for value, n in sorted(counts.items(), key=lambda kv: str(kv[0])):
        frac = min(1.0, (target * math.pow(n, alpha) / wsum) / n)
        threshold = F.when(
            F.col(strata_col) == value,
            F.lit(int(math.floor(frac * _BUCKETS))),
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def cap_per_group(
    df: DataFrame,
    key: str,
    group_col: str,
    max_rows: int,
    salt: str = "",
) -> DataFrame:
    """At most ``max_rows`` rows per group, chosen by the deterministic
    md5 hash order (ties by key) — the per-domain document cap every
    web-corpus recipe applies (C4/Dolma cap pages per registered
    domain) so no single source dominates the training mixture.

    Hash order rather than "first N": which rows survive is a property
    of the DATA (replayable in any engine, stable under repartition),
    not of arrival order — and it is an unbiased draw within the group,
    where newest-N or longest-N would skew the corpus.

    One group-keyed exchange (row_number's sort is within partitions of
    that exchange); groups at or under the cap pass through unchanged.
    Skew note: the window sorts each group's rows in ONE task — fine
    for per-domain caps (even the fattest domain is task-sized); for
    groups of billions switch to ``hash_sample`` with per-group
    fractions (see ``temperature_sample``), which needs no sort at all.
    """
    if max_rows < 1:
        raise ValueError(f"max_rows must be >= 1, got {max_rows}")
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key), salt).asc(),
        F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))).asc(),
        F.col(key).asc(),
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= max_rows)
        .drop("__rk")
    )


def leakage_safe_split(
    df: DataFrame,
    components: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    component_col: str = "component_id",
    salt: str = "split",
) -> DataFrame:
    """Train/val/test split that can never leak near-duplicates across
    the boundary: membership hashes the DUPLICATE-CLUSTER id
    (``neardup_components`` output), not the document id, so every
    member of a cluster lands on the same side — the contamination
    mode a doc-id split silently permits (a test document's near-copy
    in train) is structurally impossible. One equi-join on the id plus
    the same pure-projection bucket rule as ``assign_split``; splits
    stay stable under corpus growth for unchanged clusters (a cluster
    MERGE, however, re-keys to the new minimum id — re-split after
    large dedup refreshes, which a curation pipeline does anyway)."""
    j = df.join(components.select(id_col, component_col), id_col)
    return assign_split(j, component_col, weights, salt)


def hash_ring_negatives(
    df: DataFrame,
    key: str,
    k: int = 4,
    n_buckets: int = 256,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor row gets up to ``k`` pseudo-random negatives —
    ``(key, neg_rank, neg_<key>)`` — without any global sort or
    per-anchor randomness bookkeeping.

    Construction: every key hashes onto a ring of ``n_buckets`` cells
    (md5, like all sampling in this module); each cell's REPRESENTATIVE
    is its min-(hash, key) member (deterministic); anchor a's j-th
    negative is the representative of cell ``(cell(a) + j) % n_buckets``.
    Hash placement makes the pairing pseudo-random w.r.t. any data
    attribute while staying a pure function of the data — replayable
    cross-engine, stable under repartition and corpus append (an
    append only changes pairings whose cells' representative changed).

    Scale: the representative table is ``n_buckets`` short rows — a
    broadcast — so the whole operator is one map-side-combined
    aggregate + a projection (explode k) + a broadcast equi-join; the
    corpus never shuffles. Empty cells (or the anchor's own cell as
    representative) drop that (anchor, j) pair — "up to k", the usual
    contrastive-batch contract."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    cell = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets
    reps = (
        df.select(
            cell.alias("__cell"),
            F.struct(h.alias("h"), F.col(key).alias("k")).alias("__m"),
        )
        .groupBy("__cell")
        .agg(F.min("__m").alias("__m"))
        .select("__cell", F.col("__m.k").alias(f"neg_{key}"))
    )
    anchors = df.select(F.col(key), cell.alias("__acell")).select(
        key,
        F.explode(
            F.array(*[F.lit(j) for j in range(1, k + 1)])
        ).alias("neg_rank"),
        "__acell",
    )
    paired = anchors.join(
        F.broadcast(reps),
        ((F.col("__acell") + F.col("neg_rank")) % n_buckets)
        == F.col("__cell"),
    )
    return paired.where(F.col(key) != F.col(f"neg_{key}")).select(
        key, "neg_rank", f"neg_{key}"
    )
