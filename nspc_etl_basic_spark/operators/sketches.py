"""Deterministic distinct-count sketching (KMV / k-minimum-values).

Spark ships HyperLogLog (``approx_count_distinct``) and DataSketches HLL
(``hll_sketch_agg``) — the right production tools, and
``tests/test_sketches.py`` covers them. Their estimates are
implementation-specific, though: no other engine reproduces them
bit-for-bit, so they can never sit behind a value-hashed oracle check.

KMV is the classical alternative (Bar-Yossef et al., "Counting distinct
elements in a data stream", RANDOM 2002) with a fully deterministic
construction: hash every key with md5, map the first 8 hex digits to a
uniform value u in [0,1) (an EXACT power-of-two division — no float
drift), keep the k smallest distinct u per group, and estimate

    n̂ = (k - 1) / u_(k)        (u_(k) = k-th smallest hash)

falling back to the exact kept-count when a group has fewer than k
distinct keys (the sketch then IS the distinct set). Every step is
integer or IEEE-exact-op arithmetic on md5 output, so DuckDB replays it
bit-for-bit — a sketch the correctness gate can actually gate.

Scale contract: one projection computes the hash; dedup + per-group
k-smallest is one shuffle on the group key (the same price as the
groupBy any aggregate pays). The per-group sort ranks DISTINCT hashes
only. For very-high-cardinality groups, uniformity gives a free
pre-filter — P(u < t) = t, so ``u < (c*k)/n_lower`` for any cardinality
lower bound keeps the expected survivor set at c*k while never touching
the k smallest; pass ``prefilter`` to apply it.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: 2^32 — the hash domain; division by it is exact in binary floating point
_HASH_DOMAIN = float(1 << 32)


def _uniform_hash(key) -> "F.Column":
    """md5(key)'s first 8 hex digits as an integer in [0, 2^32)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
    prefilter: float | None = None,
) -> DataFrame:
    """Per-group KMV distinct-count estimate:
    ``(*group_cols, n_exact, kmv_estimate, rel_error)``.

    ``n_exact`` (the true distinct count) is emitted alongside the
    estimate so the error is observable — a production pipeline that
    only needs the estimate drops that aggregate and with it the only
    full-cardinality computation. ``prefilter`` (a fraction in (0,1])
    drops hashes above the threshold BEFORE the shuffle — sound whenever
    every group's cardinality makes k survivors below the threshold
    overwhelmingly likely (see module docstring)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    # distinct (group, hash): duplicate keys collapse map-side first
    hashed = df.select(
        *group_cols, _uniform_hash(F.col(key_col)).alias("__h")
    ).distinct()
    if prefilter is None:
        # single-pass form: rank AND per-group cardinality off the SAME
        # window exchange (row_number needs the ordered frame anyway;
        # count over the unbounded partition adds no exchange), so the
        # whole sketch is distinct-shuffle -> group-shuffle -> (reused
        # partitioning) groupBy — one scan of the input, no second
        # aggregate branch re-reading it
        wp = Window.partitionBy(*group_cols)
        wo = wp.orderBy(F.col("__h").asc())
        ranked = hashed.select(
            *group_cols,
            "__h",
            F.row_number().over(wo).alias("__rk"),
            F.count(F.lit(1)).over(wp).alias("__n_exact"),
        ).filter(F.col("__rk") <= k)
        sketch = ranked.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("__n_kept"),
            F.max("__h").alias("__h_k"),
            F.max("__n_exact").alias("n_exact"),
        )
    else:
        # prefiltered form: the rank input shrinks to ~prefilter fraction
        # BEFORE the sort; n_exact stays a property of the UNFILTERED key
        # set, which needs its own aggregate branch (it is the
        # demo/validation column — a production sketch-only pipeline
        # drops it and with it the full-cardinality pass entirely)
        kept = (
            hashed.filter(F.col("__h") < F.lit(int(prefilter * _HASH_DOMAIN)))
            .withColumn(
                "__rk",
                F.row_number().over(
                    Window.partitionBy(*group_cols).orderBy(F.col("__h").asc())
                ),
            )
            .filter(F.col("__rk") <= k)
        )
        # LEFT join FROM the exact side: a group whose every hash fell
        # above the prefilter threshold must still appear (with 0
        # survivors), not silently vanish from the output
        sketch = hashed.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("n_exact")
        ).join(
            kept.groupBy(*group_cols).agg(
                F.count(F.lit(1)).alias("__n_kept"),
                F.max("__h").alias("__h_k"),
            ),
            list(group_cols),
            "left",
        ).withColumn("__n_kept", F.coalesce(F.col("__n_kept"), F.lit(0)))
    if prefilter is None:
        est = F.when(
            F.col("__n_kept") < k, F.col("__n_kept").cast("double")
        ).otherwise(
            # (k-1) / u_k with u_k = h_k / 2^32; both divisions IEEE-exact-op
            F.lit(float(k - 1))
            / (F.col("__h_k").cast("double") / F.lit(_HASH_DOMAIN))
        )
    else:
        # under a prefilter the "< k survivors -> sketch IS the set"
        # fallback is WRONG (the filter cut keys, so the survivor count
        # is not the distinct count); the threshold itself acts as the
        # k-th hash: inverse-probability scaling n_kept / prefilter is
        # the adaptive-sampling estimator for that regime
        est = F.when(
            F.col("__n_kept") >= k,
            F.lit(float(k - 1))
            / (F.col("__h_k").cast("double") / F.lit(_HASH_DOMAIN)),
        ).otherwise(F.col("__n_kept").cast("double") / F.lit(float(prefilter)))
    return sketch.select(
        *group_cols,
        "n_exact",
        (F.floor(est * 1e6) / 1e6).alias("kmv_estimate"),
        (
            F.floor(
                F.abs(est - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double")
                * 1e6
            )
            / 1e6
        ).alias("rel_error"),
    )


#: above this many candidates the exact-count phase joins a broadcast
#: candidate DataFrame instead of inlining an ``isin`` literal list
_ISIN_LITERAL_CAP = 1000


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold_frac: float,
    support: float | None = None,
) -> DataFrame:
    """EXACT heavy hitters via the two-phase frequent-items pattern:
    ``(key_col, cnt, share)`` for every key whose frequency is at least
    ``ceil(threshold_frac * N)``.

    The naive plan — groupBy the key, count, filter — shuffles every row
    of the table to count a tail that is then thrown away. The classical
    streaming fix (Karp-Shenker-Papadimitriou / Misra-Gries counters) is
    a single bounded-memory pass that yields a SUPERSET of all keys with
    frequency > support; Spark ships it JVM-side as
    ``DataFrame.stat.freqItems``. Phase 2 then counts ONLY the candidate
    keys exactly: the candidate filter sits before the shuffle (as an
    ``isin`` literal it reaches the parquet scan as a pushed filter), so
    the groupBy exchange carries candidate rows only — at 100 TB with a
    Zipfian key the shuffle shrinks from the full table to the head.

    Because phase 1 is guaranteed-superset and phase 2 is exact, the
    output is deterministic and engine-independent — a plain GROUP BY ..
    HAVING replays it, so it sits behind the value-hashed oracle gate
    (unlike the sketch-internal counters, which are never exposed).

    ``support`` defaults to ``threshold_frac / 2`` (a safety margin; the
    freqItems contract only guarantees keys with frequency > support,
    and candidate memory is O(1/support)).
    """
    if not 0.0 < threshold_frac <= 1.0:
        raise ValueError("threshold_frac must be in (0, 1]")
    if support is None:
        # freqItems enforces a 1e-4 floor (candidate memory would
        # otherwise be unbounded); stay above it while preserving the
        # superset guarantee (support <= threshold)
        support = max(threshold_frac / 2.0, 1e-4)
    if support > threshold_frac:
        raise ValueError("support must be <= threshold_frac (superset guarantee)")
    if support < 1e-4:
        raise ValueError(
            "freqItems requires support >= 1e-4; thresholds below that "
            "need the plain groupBy/HAVING path (the head IS the table "
            "at that selectivity)"
        )
    # phase 1: one JVM-side pass; candidate count is bounded by 1/support
    row = df.stat.freqItems([key_col], support).head()
    candidates = [c for c in row[0] if c is not None]
    total = df.count()
    min_cnt = max(1, math.ceil(threshold_frac * total)) if total else 1

    if not candidates:
        pruned = df.where(F.lit(False))
    elif len(candidates) <= _ISIN_LITERAL_CAP:
        pruned = df.where(F.col(key_col).isin(candidates))
    else:
        cand_df = df.sparkSession.createDataFrame(
            [(c,) for c in candidates], df.select(key_col).schema
        )
        pruned = df.join(F.broadcast(cand_df), key_col, "left_semi")
    return (
        pruned.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_cnt)
        .select(
            key_col,
            "cnt",
            # cnt * 1e6 / N, floored: IEEE-exact op order a SQL oracle
            # replays as floor(cnt * 1000000.0 / N) / 1000000.0
            (
                F.floor(F.col("cnt") * F.lit(1e6) / F.lit(float(total)))
                / F.lit(1e6)
            ).alias("share"),
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    bins: int = 64,
) -> DataFrame:
    """Per-group robust clipping (winsorization) at deterministic
    histogram quantiles: outliers beyond the (lo_q, hi_q) estimates are
    clamped, not dropped — the standard robust-scaling step before
    training on heavy-tailed features.

    Built on ``histogram_quantiles``, so the bounds are engine-
    replayable (no percentile_approx); the clip itself is a pure
    projection after a BROADCAST of the per-group bounds (|groups|
    rows) — the data never shuffles. Adds a ``clipped`` column."""
    if not 0.0 <= lo_q < hi_q <= 1.0:
        raise ValueError("need 0 <= lo_q < hi_q <= 1")
    hq = histogram_quantiles(
        df, value_col, group_col, qs=(lo_q, hi_q), bins=bins
    )
    bounds = hq.groupBy(group_col).agg(
        F.max(F.when(F.col("q") == float(lo_q), F.col("est"))).alias("__lo"),
        F.max(F.when(F.col("q") == float(hi_q), F.col("est"))).alias("__hi"),
    )
    out = df.join(F.broadcast(bounds), group_col)
    clipped = F.least(
        F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")
    )
    return out.withColumn("clipped", clipped).drop("__lo", "__hi")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005)
    as a tiny DataFrame of counter cells: ``(row_idx, bucket, cnt)``
    with ``depth`` hash rows × ``width`` buckets.

    Each input row lands in one bucket per hash row; the bucket is
    md5-derived (``md5(row_idx || '|' || key)`` first 8 hex digits mod
    width — the repo's shared Spark ``conv(h,16,10)`` == DuckDB
    ``CAST('0x'||h AS BIGINT)`` identity), so the sketch is
    deterministic and any engine replays it bit-for-bit — unlike
    Spark's built-in CountMinSketch aggregate, whose internal seeds no
    oracle can reproduce.

    Scale: one projection (depth md5s per row via a ``depth``-element
    explode) feeding a map-side-combined groupBy onto at most
    ``depth*width`` cells — the shuffle carries partial cells per task,
    not rows. Cells are MERGEABLE: sketches of disjoint slices (time
    windows, incremental batches) sum cell-wise (``cms_merge``), the
    property that makes CMS the standard distributed/streaming
    frequency sketch. Estimate error: ±N·e/width with prob 1-e^-depth,
    always an OVER-estimate (pinned by pytest).
    """
    if depth < 1 or width < 2:
        raise ValueError("depth must be >= 1 and width >= 2")
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    keyed = df.select(
        F.col(key_col).cast("string").alias("__k"),
        w.alias("__w"),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(depth) - 1))
        ).alias("row_idx"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col("row_idx").cast("string"), F.col("__k")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % int(width)
    )
    return (
        keyed.withColumn("bucket", bucket)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with the SAME (depth, width):
    the CMS merge operation. Cheap by construction — both inputs are
    ≤ depth*width rows."""
    return (
        a.unionByName(b)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-frequency estimates for ``keys`` (one row per distinct
    key): ``(key_col, cms_est)`` with ``cms_est = min over hash rows of
    that row's bucket counter`` (0 when a bucket is empty — the key was
    never inserted).

    Scale: the sketch is ≤ depth*width cells, so it BROADCASTS to the
    probe side regardless of how many keys are probed; probing is a
    map-only join, no shuffle of the (possibly large) key set beyond
    its own distinct."""
    probes = keys.select(
        F.col(key_col).cast("string").alias("__k"), key_col
    ).distinct().withColumn(
        "row_idx",
        F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1))),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col("row_idx").cast("string"), F.col("__k")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % int(width)
    )
    joined = probes.withColumn("bucket", bucket).join(
        F.broadcast(cells), ["row_idx", "bucket"], "left"
    )
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
            "cms_est"
        )
    )


def histogram_quantiles(
    df,
    value_col: str,
    group_col: str,
    qs: "Sequence[float]" = (0.5, 0.9, 0.99),
    bins: int = 64,
):
    """Deterministic quantile estimation from an equi-width histogram.

    Spark's ``percentile_approx`` (Greenwald-Khanna) and t-digest are the
    production approximate-quantile tools, but — like HLL — their
    estimates are implementation-specific, so no cross-engine oracle can
    gate them. The equi-width histogram estimator is the classical
    deterministic alternative: per group, (min, max, n) in one aggregate,
    bin counts ``clamp(floor((x-min)/(max-min)*bins))`` in a second, and
    the q-quantile read off the cumulative histogram with linear
    interpolation inside the target bin:

        t   = floor(q*(n-1)) + 1          (1-based target rank)
        est = lo(b) + (t - cum_before(b)) / count(b) * width

    Every step is plain IEEE double arithmetic in a fixed order, so
    DuckDB replays it bit-for-bit. Error is bounded by one bin width —
    the standard histogram-sketch trade, tunable via ``bins``.

    Scale: two map-side-combined aggregate passes over the data (stats,
    bin counts — the stats re-attach by broadcast), then the per-group
    quantile walk is IN-ROW array algebra over ≤ ``bins`` entries
    (sorted ``collect_list`` of (bin, count) per group — never a window
    over data rows, never a sort of the column). Histograms are
    mergeable: bin counts from partial scans sum.

    Returns ``(group_col, q, est)`` with ``est`` rounded to 6.
    """
    v = F.col(value_col)
    stats = df.groupBy(group_col).agg(
        F.min(v).alias("__mn"),
        F.max(v).alias("__mx"),
        F.count(v).alias("__n"),
    ).where(F.col("__n") >= 1)

    joined = df.join(F.broadcast(stats), group_col)
    width = (F.col("__mx") - F.col("__mn")) / F.lit(float(bins))
    bin_col = F.least(
        F.greatest(
            F.floor((v - F.col("__mn")) / (F.col("__mx") - F.col("__mn")) * bins),
            F.lit(0),
        ),
        F.lit(bins - 1),
    ).cast("int")

    counts = (
        # null values are excluded from n by count(v); they must be
        # excluded here too — a null bin would sort FIRST in the
        # cumulative walk and shift every rank target
        joined.where((F.col("__mx") > F.col("__mn")) & v.isNotNull())
        .groupBy(group_col, bin_col.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    hists = counts.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__b"), F.col("__c")))
        ).alias("__hist")
    ).join(stats, group_col)

    def est_for(q: float):
        t = (F.floor(F.lit(float(q)) * (F.col("__n") - 1)) + 1).cast("long")
        w = width

        def step(acc, e):
            before = acc.getField("cum")
            cum2 = before + e.getField("__c")
            hit = acc.getField("est").isNull() & (cum2 >= t)
            est = F.when(
                hit,
                F.col("__mn")
                + e.getField("__b").cast("double") * w
                + (t - before).cast("double")
                / e.getField("__c").cast("double")
                * w,
            ).otherwise(acc.getField("est"))
            return F.struct(cum2.alias("cum"), est.alias("est"))

        return F.aggregate(
            F.col("__hist"),
            F.struct(
                F.lit(0).cast("long").alias("cum"),
                F.lit(None).cast("double").alias("est"),
            ),
            step,
        ).getField("est")

    per_q = F.array(
        *[
            F.struct(
                F.lit(float(q)).alias("q"),
                F.round(est_for(q), 6).alias("est"),
            )
            for q in qs
        ]
    )
    with_bins = hists.select(group_col, F.explode(per_q).alias("__e")).select(
        group_col, "__e.q", "__e.est"
    )

    # degenerate groups (all values equal, or a single value): est = min
    flat = (
        stats.where(F.col("__mx") <= F.col("__mn"))
        .select(
            group_col,
            F.explode(
                F.array(*[F.lit(float(q)) for q in qs])
            ).alias("q"),
            F.round(F.col("__mn").cast("double"), 6).alias("est"),
        )
    )
    return with_bins.unionByName(flat)
