"""Streaming semantic deduplication: each micro-batch of embeddings
merges into a persistent LABEL STORE via the incremental-components
contraction — the live twin of ``operators/semdedup.py`` and the 14th
member of the streaming-replay family.

Per micro-batch (a corpus drop of embedding rows):
  1. assign the batch to the FROZEN coarse codebook (a projection —
     the codebook rides the plan as literals; retraining per batch
     would move cell boundaries, see semantic_dedup_incremental);
  2. form within-cell candidate pairs: batch-batch plus batch-store,
     the batch side broadcast and the store side pruned to the batch's
     touched cells BEFORE the cosine verify — per-batch work is
     batch-vs-cell-sized, never store-quadratic;
  3. absorb the pairs with ``incremental_components`` (the fixpoint
     runs on the contracted batch graph; the store's label column is
     scanned against broadcast batch-sized sides);
  4. upsert into the bucketed store: the batch's new rows plus ONLY
     the existing rows whose group label changed (component merges).

Equivalence: by induction over batches, the union of all pair sets
ever formed is exactly the within-cell pair set of the full corpus, so
after draining, the store equals the from-scratch
``semantic_dedup(all_batches, centroids)`` — which is what the driver
oracle replays.

Replay safety: a replayed batch re-derives pairs among rows already in
the store; ``incremental_components`` contracts re-ingested ids to
their existing components (idempotent), the relabel set is empty or
identical, and a re-ingested vec_id's STORE ROW is excluded from the
upsert (left_anti against the store), so its original vector and cell
are kept — first-write-wins on the vector payload. Vector UPDATES are
therefore unsupported: re-ingesting an id with a changed embedding
silently keeps the original vector (only group labels can move, via
the relabel path). This is the contract replay idempotency requires —
a replayed batch must not perturb the store; ingest a changed vector
under a new id (or rebuild from scratch) instead.

State size: one row per corpus vector (id, cell, double vector,
group_id) — the same asymptotic state as any exact semantic-dup
tracker; the vector must be kept because FUTURE batches verify cosine
against it.

Precision contract: vectors cross into the store as float64 arrays
cast once at assignment; cosines are the engine-wide round-6 doubles;
ids/cells/labels are BIGINT. No Arrow kernel anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.dedup import incremental_components
from nspc_etl_basic_spark.operators.semdedup import _assign_cells
from nspc_etl_basic_spark.operators.similarity import dot, norm
from nspc_etl_basic_spark.sinks.bucketed_merge import BucketedTable


def label_store_table(spark, path: str, n_buckets: int = 16) -> BucketedTable:
    """The persisted label store: vec_id -> (cell, embedding, group_id),
    bucketed differential table keyed on vec_id (last-wins upserts)."""
    return BucketedTable(spark, path, ["vec_id"], n_buckets=n_buckets)


def run_stream_semdedup(
    df: DataFrame,
    store: BucketedTable,
    checkpoint_path: str,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_name: str = "stream_semdedup",
):
    """Drain an AvailableNow embedding stream into the label store
    (see module docstring). Batch rows must be key-unique on
    ``id_col`` within a batch (dedup upstream). Report with
    :func:`semdedup_from_store`."""
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_a = _assign_cells(
            batch_df, centroids, id_col, vec_col
        ).localCheckpoint(eager=True)

        def _side(d: DataFrame, suffix: str) -> DataFrame:
            return d.select(
                F.col(id_col).alias(f"id_{suffix}"),
                F.col("__v").alias(f"__v{suffix}"),
                F.col("__n").alias(f"__n{suffix}"),
                "cell",
            )

        cos = F.round(
            dot(F.col("__va"), F.col("__vb"))
            / (F.col("__na") * F.col("__nb")),
            6,
        )
        batch_batch = (
            _side(batch_a, "a")
            .join(_side(batch_a, "b"), "cell")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", cos.alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold)
        )
        if store.exists():
            state = store.read()
            existing = state.select(
                F.col("vec_id").alias(id_col),
                F.col("group_id").alias("component_id"),
            )
            state_side = state.select(
                F.col("vec_id").alias("id_b"),
                F.col("embedding").alias("__vb"),
                norm(F.col("embedding")).alias("__nb"),
                "cell",
            )
            batch_state = (
                F.broadcast(_side(batch_a, "a"))
                .join(state_side, "cell")
                .filter(F.col("id_a") != F.col("id_b"))
                .select("id_a", "id_b", cos.alias("cos_sim"))
                .filter(F.col("cos_sim") >= threshold)
            )
            pairs = batch_batch.unionByName(batch_state).select(
                "id_a", "id_b"
            )
        else:
            state = None
            existing = spark.createDataFrame(
                [], f"{id_col} long, component_id long"
            )
            pairs = batch_batch.select("id_a", "id_b")

        labels = incremental_components(
            batch_a.select(id_col), pairs, existing, id_col=id_col
        ).localCheckpoint(eager=True)

        new_rows = batch_a.join(labels, id_col).select(
            F.col(id_col).alias("vec_id"),
            F.col("cell").cast("long").alias("cell"),
            F.col("__v").alias("embedding"),
            F.col("component_id").cast("long").alias("group_id"),
        )
        if state is not None:
            # only rows whose label moved are rewritten; a re-ingested
            # batch id is excluded from new_rows (its store row wins)
            new_rows = new_rows.join(
                state.select("vec_id"), "vec_id", "left_anti"
            )
            # two-step relabel so vectors stay put: the moved set is
            # found on LABEL-ONLY columns (16-byte rows keyed on the
            # id), and only then attached back to the store rows —
            # moved is touched-components-sized, so AQE broadcasts it
            # against the vector-bearing state in the common case
            moved = (
                state.select("vec_id", "group_id")
                .join(
                    labels.select(
                        F.col(id_col).alias("vec_id"),
                        F.col("component_id").alias("__new"),
                    ),
                    "vec_id",
                )
                .where(F.col("group_id") != F.col("__new"))
                .select("vec_id", "__new")
            )
            relabeled = state.join(moved, "vec_id").select(
                "vec_id",
                "cell",
                "embedding",
                F.col("__new").cast("long").alias("group_id"),
            )
            upsert = new_rows.unionByName(relabeled)
        else:
            upsert = new_rows
        store.merge(upsert)

    q = (
        df.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def semdedup_from_store(store: BucketedTable) -> DataFrame:
    """The corpus-wide semantic-dedup view: ``(vec_id, cell, group_id,
    keep)`` — one scan of the label store, keep = representative."""
    return store.read().select(
        "vec_id",
        F.col("cell").cast("long").alias("cell"),
        F.col("group_id").cast("long").alias("group_id"),
        (F.col("vec_id") == F.col("group_id")).alias("keep"),
    )
