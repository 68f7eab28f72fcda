"""N-gram novelty profile — how much genuinely NEW content each slice
of a corpus contributes.

The standard corpus-growth diagnostic (dedup-adjacent, but about
attribution rather than removal): for every group (source, crawl
snapshot, time bucket), count the distinct word n-grams present, and
how many of them appear in NO earlier group — "first seen here". A
source whose novelty fraction collapses is re-crawling what the corpus
already has; a snapshot whose fraction spikes changed its upstream.

Group order is the natural ordering of the group column (documented:
lexicographic for strings) — callers who need a different timeline
should pass a sortable group key.

Plan shape — ONE corpus pass (all built-ins):
  1. explode word 3-grams, hash to the 32-bit md5 ring (rows shrink to
     (group, hash) pairs — the text never shuffles);
  2. one (group, hash) aggregate carrying the instance count — the only
     corpus-proportional shuffle, map-side combined;
  3. first-seen flags via min(group) over a hash-partitioned window on
     the already-aggregated pairs (distinct-pair sized, much smaller
     than instances);
  4. one per-group rollup (instances / distinct / new in a single
     aggregate), broadcast-joined onto the group list so empty groups
     report zeros.

Scale: the (group, hash) aggregate is the same price as any exact
distinct; the window and rollup run over distinct pairs only. The
corpus is scanned once — naive three-branch formulations re-run the
explode per metric.

Reference parity: no counterpart in /root/reference — extension
surface (LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.text import word_tokens

__all__ = ["ngram_novelty", "ngram_overlap_matrix"]


def _ngram_hashes(text_col, n: int):
    """Word n-gram 32-bit md5 hashes as an array column. Empty for
    documents with fewer than n words (guarded: F.sequence would
    otherwise count DOWN and fabricate n-grams).

    The tokenization is BOUND ONCE per row through a single-element
    transform: higher-order lambdas are interpreted and not CSE'd, so
    referencing ``word_tokens(text)`` directly inside the per-position
    lambda re-runs the full-text regexp for every position times every
    element_at — measured 12.8 s -> ~1 s on corpus_ngram_novelty at
    sf0.1 (the same cliff the pack fold documents)."""
    from nspc_etl_basic_spark.operators.sampling import md5_ring32

    def build(ws):
        idxs = F.when(
            F.size(ws) >= n, F.sequence(F.lit(1), F.size(ws) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))

        def gram(i):
            parts = [F.element_at(ws, i + j) for j in range(n)]
            return md5_ring32(F.concat_ws(" ", *parts))

        return F.transform(idxs, gram)

    return F.element_at(
        F.transform(F.array(word_tokens(text_col)), build), 1
    )


def ngram_novelty(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-group n-gram novelty: ``(group_col, n_instances, n_distinct,
    n_new, novelty_frac)`` where ``n_new`` counts n-grams whose first
    occurrence (min over the group column's natural order) is in this
    group and ``novelty_frac = round(n_new / n_distinct, 6)``. Groups
    with no n-grams long enough report zeros."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    from pyspark.sql.window import Window

    pairs = df.select(
        F.col(group_col).alias("g"),
        F.explode(_ngram_hashes(F.col(text_col), n)).alias("h"),
    )
    # the single corpus-proportional shuffle: (g, h) instance counts
    gh = pairs.groupBy("g", "h").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    first = (
        F.col("g") == F.min("g").over(Window.partitionBy("h"))
    ).cast("long")
    profile = (
        gh.withColumn("__first", first)
        .groupBy("g")
        .agg(
            F.sum("cnt").cast("long").alias("n_instances"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum("__first").cast("long").alias("n_new"),
        )
    )
    groups = df.select(F.col(group_col).alias("g")).distinct()
    return (
        groups.join(F.broadcast(profile), "g", "left")
        .select(
            F.col("g").alias(group_col),
            F.coalesce("n_instances", F.lit(0)).cast("long").alias("n_instances"),
            F.coalesce("n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            F.when(
                F.coalesce("n_distinct", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_new", F.lit(0)).cast("double")
                    / F.col("n_distinct").cast("double"),
                    6,
                ),
            ).alias("novelty_frac"),
        )
    )


def ngram_overlap_matrix(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Pairwise n-gram overlap between groups — the cross-source
    contamination matrix: for every ordered group pair (a < b), how
    many distinct n-grams they share and the containment fraction
    ``shared / min(|a|, |b|)``. The number a curator reads before
    merging two crawls or checking a benchmark's n-grams against every
    source at once.

    Plan: the same single-pass (group, hash) distinct as
    ``ngram_novelty``, then a hash-partitioned SELF-JOIN on the n-gram
    (both sides are the same child plan — Spark reuses the exchange),
    counted per pair, with per-group totals broadcast in for the
    fraction. The group column must be COARSE (sources, snapshots —
    tens to thousands): the matrix is |groups| choose 2 and an n-gram
    present in every group contributes |groups|^2 join rows; for
    per-document overlap use the LSH dedup family instead.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    gh = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(_ngram_hashes(F.col(text_col), n)).alias("h"),
        )
        .groupBy("g", "h")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select("g", "h")
    )
    totals = gh.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    )
    a = gh.select(F.col("g").alias("ga"), "h")
    b = gh.select(F.col("g").alias("gb"), "h")
    shared = (
        a.join(b, "h")
        .where(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    ta = totals.select(F.col("g").alias("ga"), F.col("n_distinct").alias("__na"))
    tb = totals.select(F.col("g").alias("gb"), F.col("n_distinct").alias("__nb"))
    return (
        shared.join(F.broadcast(ta), "ga")
        .join(F.broadcast(tb), "gb")
        .select(
            F.col("ga").alias(f"{group_col}_a"),
            F.col("gb").alias(f"{group_col}_b"),
            "shared",
            F.round(
                F.col("shared").cast("double")
                / F.least("__na", "__nb").cast("double"),
                6,
            ).alias("containment"),
        )
    )
