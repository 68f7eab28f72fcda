"""Retirement (takedown / purge) for the persisted text-tier dedup
stores — the third leg of the store maintenance trio (ingest, update,
retire) that :mod:`nspc_etl_basic_spark.streaming.semdedup` established
for the semantic label store. Corpus-wide takedown is a first-class
operation for a training-data pipeline: a document removed for legal or
quality reasons must stop influencing EVERY derived asset, not just the
corpus table.

Two stores get the leg here:

* the LSH **band store** + component **label table** behind the
  continuous-ingest near-dup tier (``operators/dedup.py``:
  ``build_band_store`` / ``incremental_lsh_pairs`` /
  ``incremental_components``) — :func:`retire_from_band_store`;
* the ``(gh, count)`` **gram store** behind the incremental span-dedup
  tier (``operators/spandedup.py``: ``build_gram_store`` /
  ``incremental_dedup_spans`` / ``merge_gram_store``) —
  :func:`retire_from_gram_store`.

Both return DataFrames rather than writing anywhere: callers persisting
the stores should write the relabeled/decremented outputs BEFORE
deleting the old snapshots (the relabel-then-delete order the streaming
semantic store uses), so an interrupted takedown converges on re-run.
(The gram decrement is a fully lazy plan; the band retire, like every
connected-components caller, runs its bounded fixpoint — and one
batch-bounded bucket-decrement materialization — at call time.)

100 TB stance (shared by both functions): the retired-id set is
batch-bounded and always the BROADCAST side; the corpus-sized store and
label table are only ever scanned against broadcast probes — no
corpus-wide shuffle, no corpus text, and the connected-components
fixpoint reruns only over the touched components' membership, never the
corpus graph.

Reference parity: no counterpart in /root/reference — extension surface
(LLM-pipeline family; the reference's closest behavior is metadata-table
row deletes, src/file-to-sql-loader.py's MERGE path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.dedup import (
    incremental_components,
    neardup_components,
)
from nspc_etl_basic_spark.operators.spandedup import build_gram_store

__all__ = ["retire_from_band_store", "retire_from_gram_store"]


def _bucket_pairs(bands: DataFrame, id_col: str) -> DataFrame:
    """Distinct within-bucket candidate pairs (id_a < id_b) from a band
    table — the self-join shape shared by the phase-1 touched-membership
    rebuild and the phase-2 cap-reappearance sweep (and semantically by
    ``lsh_candidate_pairs``, minus the shared-band count components
    never read)."""
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_key") == F.col("b.band_key"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def retire_from_band_store(
    band_store: DataFrame,
    labels: DataFrame,
    retired_ids: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
    max_iter: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """Remove retired documents from the persisted LSH band store and
    component label table; returns ``(new_store, new_labels)``.

    Contract: ``new_labels`` equals a from-scratch
    ``neardup_components`` over the SURVIVORS' band rows (with the same
    ``max_bucket_size`` cap applied to the post-retirement bucket
    sizes), and ``new_store`` is the band store a from-scratch
    ``build_band_store`` of the survivors would yield — including the
    refreshed ``bucket_size`` column when the input store carries one.
    Retiring an id the store never saw is a no-op; re-running the same
    retirement is a no-op (the rows are already gone).

    How it stays component-local: removing a node only removes edges,
    so only the components CONTAINING a retired id can split or lose
    their min-id label — those components' surviving membership is
    re-paired from the post-retirement store and re-labeled from
    scratch (touched-membership-sized work). The one way a retirement
    can ADD edges is the bucket cap: a mega-bucket that drops back to
    ``<= max_bucket_size`` exposes pairs the cap previously skipped.
    Those buckets are exactly the retired ids' buckets whose size
    crossed the cap downward — batch-bounded — and their new pairs are
    absorbed through ``incremental_components``' contraction (adding
    edges never needs a rebuild). With ``max_bucket_size=None`` (how
    the label tier is built) the cap phase is skipped entirely.

    Cap-equality caveat: the crossing test reads the store's
    ``bucket_size`` column, so from-scratch equality under a cap holds
    when those counts are accurate (built by ``build_band_store``,
    maintained by this function's decrement). Batches appended without
    a size refresh degrade the cap the same way they already do for
    ``incremental_lsh_pairs`` — the store's documented staleness trade.
    """
    retired = retired_ids.select(id_col).distinct()
    has_sizes = "bucket_size" in band_store.columns
    if max_bucket_size is not None and not has_sizes:
        # a silent uncapped run would break the from-scratch-equality
        # contract AND re-open the O(bucket^2) hot-key path the cap
        # exists to close — refuse rather than guess
        raise ValueError(
            "max_bucket_size requires the store's bucket_size column "
            "(build the store with build_band_store)"
        )

    # ---- store maintenance: drop the retired ids' band rows and
    # decrement the touched buckets' stored sizes (both passes are
    # broadcast probes into the store — scan-only, never a shuffle)
    victim_rows = band_store.join(F.broadcast(retired), id_col, "left_semi")
    kept = band_store.join(F.broadcast(retired), id_col, "left_anti")
    bucket_dec = None
    if has_sizes:
        # batch-bounded (<= retired x bands buckets); materialized once
        # so the two consumers (size decrement, cap-reappearance sweep)
        # share ONE victim scan of the store
        bucket_dec = victim_rows.groupBy("band_id", "band_key").agg(
            F.count(F.lit(1)).alias("__dec"),
            F.first("bucket_size").alias("__old"),
        ).localCheckpoint(eager=True)
        new_store = (
            kept.join(
                F.broadcast(bucket_dec.select("band_id", "band_key", "__dec")),
                ["band_id", "band_key"],
                "left",
            )
            .withColumn(
                "bucket_size",
                F.col("bucket_size") - F.coalesce(F.col("__dec"), F.lit(0)),
            )
            .drop("__dec")
        )
    else:
        new_store = kept

    # ---- label maintenance, phase 1 (edge deletions): rebuild the
    # touched components from the survivors' post-retirement band rows
    touched_comps = (
        labels.join(F.broadcast(retired), id_col, "left_semi")
        .select("component_id")
        .distinct()
    )
    survivors_t = (
        labels.join(F.broadcast(touched_comps), "component_id", "left_semi")
        .join(F.broadcast(retired), id_col, "left_anti")
        .select(id_col)
    )
    # no broadcast HINT on survivors_t: it is touched-component-
    # MEMBERSHIP-sized, which a boilerplate mega-component makes
    # arbitrarily large — AQE broadcasts it when small and falls back
    # to a shuffle join otherwise, instead of failing at the broadcast
    # limit (only the batch-bounded retired/touched-comps frames carry
    # the hint)
    mem_bands = new_store.join(survivors_t, id_col, "left_semi")
    if max_bucket_size is not None:
        mem_bands = mem_bands.filter(F.col("bucket_size") <= max_bucket_size)
    pairs_t = _bucket_pairs(mem_bands, id_col)
    relabeled_t = neardup_components(
        survivors_t, pairs_t, id_col=id_col, max_iter=max_iter
    )
    new_labels = labels.join(
        F.broadcast(touched_comps), "component_id", "left_anti"
    ).unionByName(relabeled_t.select(id_col, "component_id"))

    # ---- label maintenance, phase 2 (cap reappearance): buckets the
    # retirement pulled back under the cap expose previously-skipped
    # pairs — pure edge ADDITIONS, absorbed by contraction
    if max_bucket_size is not None:
        uncapped = bucket_dec.filter(
            (F.col("__old") > max_bucket_size)
            & (F.col("__old") - F.col("__dec") <= max_bucket_size)
        ).select("band_id", "band_key")
        # unconditional (no eager emptiness probe — the function stays
        # a pure plan builder): with zero newly-uncapped buckets the
        # pair frame is empty and incremental_components contracts to
        # a label passthrough
        ub = new_store.join(
            F.broadcast(uncapped), ["band_id", "band_key"], "left_semi"
        )
        new_pairs = _bucket_pairs(ub, id_col)
        spark = band_store.sparkSession
        new_labels = incremental_components(
            spark.createDataFrame([], f"{id_col} long"),
            new_pairs,
            new_labels,
            id_col=id_col,
        )
    return new_store, new_labels


def retire_from_gram_store(
    store: DataFrame,
    retired_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Remove retired documents' n-gram counts from the persisted
    ``(gh, count)`` gram store; returns the decremented store.

    ``retired_docs`` must carry the retired documents' TEXT as
    originally ingested (the store holds only 8-byte hashes, so the
    grams to subtract are recomputed from the rows being taken down —
    the takedown workflow has those rows by definition). The result
    equals ``build_gram_store`` over the survivors when every retired
    doc was ingested exactly once and is retired exactly once — the
    same additivity contract ``merge_gram_store`` already relies on.
    Rows whose count reaches zero are dropped, so spans duplicated
    ONLY against retired documents stop being flagged by
    ``incremental_dedup_spans``.

    Negative-count guard: the decrement floors at zero (a retirement
    of a never-ingested or doubly-retired doc cannot push counts
    negative and poison future flag thresholds); such a call is a
    caller contract violation, and flooring bounds its blast radius to
    the offending grams.

    Plan: one gram pass over the batch-sized retired rows (the exact
    ``build_gram_store`` aggregate), then a broadcast left join into
    the store — scan-only over the corpus-sized side, touched buckets
    only when persisted through the bucketed differential sink.
    """
    victim = build_gram_store(retired_docs, text_col, id_col, n).select(
        "gh", F.col("count").alias("__dec")
    )
    return (
        store.join(F.broadcast(victim), "gh", "left")
        .select(
            "gh",
            F.greatest(
                F.col("count") - F.coalesce(F.col("__dec"), F.lit(0)),
                F.lit(0),
            ).alias("count"),
        )
        .filter(F.col("count") > 0)
    )
