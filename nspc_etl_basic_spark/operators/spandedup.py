"""Exact-substring span deduplication (RefinedWeb / Lee et al. style).

MinHash/SimHash (``operators/dedup.py``) drop whole near-duplicate
documents; this operator instead removes *duplicated spans inside
otherwise-unique documents* — the boilerplate headers, license blocks and
navigation chrome that survive document-level dedup. Any n-token span
occurring in ≥ ``min_count`` places corpus-wide is cut from every
document (suffix-array exact-substring dedup approximated at n-gram
granularity, which is the shuffle-friendly distributed form).

Plan shape (three stages, all key-shuffles — nothing all-pairs):

1. gram inventory: per doc, tokenize once and project (start, xxhash64 of
   the n-gram) pairs — narrow, no shuffle; token bodies never leave the
   row.
2. global gram counts: groupBy gram hash (map-side combined), filter to
   count ≥ min_count — the only corpus-wide shuffle, and it shuffles
   8-byte hashes, not text.
3. flagged starts join back on gram hash, collect per-doc start list
   (doc_id-keyed shuffle of *positions only*), then one doc_id join
   against the corpus re-attaches text and the covered ranges are removed
   with in-row array algebra (``F.filter`` with positional lambda).

At 100 TB the heavy stages move only (hash, position) pairs; the single
text-carrying shuffle is the final doc_id join, which AQE can convert to
broadcast when the flagged-doc set is small.

The incremental tier (:func:`build_gram_store` /
:func:`incremental_dedup_spans` / :func:`merge_gram_store`) makes span
dedup a per-batch cost against a persisted (gram-hash, count) store —
the same continuous-ingest shape as ``dedup.py``'s incremental LSH: the
batch's grams probe the store (batch-side broadcast, the store never
rescans the corpus text), combined counts decide the flags, and the
store advances additively. Pair the store with the bucketed
differential sink keyed on the gram hash so each batch rewrites only
touched buckets.

Hash note: grams are keyed by ``xxhash64`` (8 bytes) instead of the gram
string; a false merge needs a 64-bit collision between two distinct grams
(~1e-9 at a billion distinct grams) — the standard trade at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import word_tokens


def _tokenized(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # null text tokenizes to the EMPTY array, not null: F.size(null) is
    # -1, which would corrupt n_tokens and clean_text for null-text docs
    return df.select(
        F.col(id_col),
        F.coalesce(
            word_tokens(F.col(text_col)), F.array().cast("array<string>")
        ).alias("_toks"),
    )


def _gram_inventory(toks: DataFrame, id_col: str, n: int) -> DataFrame:
    """(id, start, gh) rows — stage 1; 0-based starts, narrow projection."""
    return toks.select(
        F.col(id_col),
        F.explode(
            F.transform(
                # sequence() counts DOWN when start > stop, so guard the
                # short-doc case with an explicit empty array
                F.when(
                    F.size("_toks") >= n, F.sequence(F.lit(0), F.size("_toks") - n)
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.struct(
                    i.alias("start"),
                    F.xxhash64(
                        F.array_join(F.slice("_toks", i + 1, n), "\x1f")
                    ).alias("gh"),
                ),
            )
        ).alias("g"),
    ).select(id_col, F.col("g.start").alias("start"), F.col("g.gh").alias("gh"))


def _remove_flagged(
    toks: DataFrame, flagged_starts: DataFrame, id_col: str, n: int
) -> DataFrame:
    """Stage 3: union flagged start ranges per doc and cut the covered
    tokens with in-row array algebra."""
    flagged = flagged_starts.groupBy(id_col).agg(
        F.collect_set("start").alias("_starts")
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform(F.col("_starts"), lambda s: F.sequence(s, s + n - 1))
        )
    )
    return (
        toks.join(flagged, id_col, "left")
        .withColumn("_cov", F.coalesce(covered, F.array().cast("array<int>")))
        .select(
            F.col(id_col),
            F.array_join(
                F.filter(
                    "_toks", lambda t, i: ~F.array_contains("_cov", i.cast("int"))
                ),
                " ",
            ).alias("clean_text"),
            F.size("_toks").alias("n_tokens"),
            F.size("_cov").alias("n_removed"),
        )
    )


def dedup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Remove every n-token span that occurs ``min_count``+ times corpus-wide.

    Returns ``(id_col, clean_text, n_tokens, n_removed)`` where
    ``clean_text`` is the document with all covered tokens dropped
    (remaining tokens re-joined with single spaces) and ``n_removed`` is
    the number of tokens cut. Overlapping flagged spans union their
    ranges. Documents shorter than ``n`` tokens pass through unchanged.
    """
    toks = _tokenized(df, text_col, id_col)
    grams = _gram_inventory(toks, id_col, n)

    # stage 2: corpus-wide gram counts (hash-only shuffle, map-side combine)
    dup_grams = (
        grams.groupBy("gh").count().where(F.col("count") >= min_count).select("gh")
    )

    flagged_starts = grams.join(dup_grams, "gh").select(id_col, "start")
    return _remove_flagged(toks, flagged_starts, id_col, n)


def build_gram_store(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """(gh, count) table for the already-ingested corpus — the persisted
    state of the incremental tier. One hash-keyed aggregate; 16 bytes/row."""
    return (
        _gram_inventory(_tokenized(df, text_col, id_col), id_col, n)
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def merge_gram_store(store: DataFrame, batch_counts: DataFrame) -> DataFrame:
    """Advance the store by a batch's gram counts (additive union-agg).

    Persisted via any keyed sink; with the bucketed differential table
    keyed on ``gh`` only batch-touched buckets rewrite.
    """
    return (
        store.unionByName(batch_counts)
        .groupBy("gh")
        .agg(F.sum("count").alias("count"))
    )


def incremental_dedup_spans(
    batch: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_count: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Span-dedup an incoming batch against the persisted gram store.

    A span is flagged when (its count within the batch) + (its stored
    corpus count) reaches ``min_count`` — so boilerplate shared with
    ALREADY-INGESTED documents is cut from the new batch without ever
    rescanning the corpus text. Returns ``(cleaned_batch,
    batch_gram_counts)``; callers advance the store with
    :func:`merge_gram_store` (previously-written docs are not
    retro-cleaned — run :func:`dedup_spans` offline for that).

    Plan: the only store-sized work is the gram-hash join of the
    *batch's* grams against the store — batch-side broadcastable; the
    corpus never re-enters the plan.
    """
    toks = _tokenized(batch, text_col, id_col)
    grams = _gram_inventory(toks, id_col, n)
    batch_counts = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("count"))

    combined = (
        batch_counts.alias("b")
        .join(store.alias("s"), "gh", "left")
        .select(
            "gh",
            (
                F.col("b.count") + F.coalesce(F.col("s.count"), F.lit(0))
            ).alias("total"),
        )
    )
    dup_grams = combined.where(F.col("total") >= min_count).select("gh")
    flagged_starts = grams.join(dup_grams, "gh").select(id_col, "start")
    return _remove_flagged(toks, flagged_starts, id_col, n), batch_counts
