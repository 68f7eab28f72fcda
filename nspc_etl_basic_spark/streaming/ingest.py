"""Streaming directory ingest — the idiomatic Spark upgrade of the
reference's checkpointed batch loop (SURVEY.md §2 J / §7.1 M7).

The reference polls a directory, anti-joins against a completed-files
statistics table (D3, loader.py:231-251), retries, and resumes batches
within 24 h (D4, loader.py:170-229). Structured Streaming's file source IS
that loop, hardened: the checkpoint log records processed files exactly
once, ``Trigger.AvailableNow`` gives the drain-then-stop batch semantics,
and ``maxFilesPerTrigger`` bounds per-micro-batch work.

Scale: the file-source listing is incremental; each micro-batch is a
normal Catalyst-planned job, so everything in operators/ composes
unchanged over ``readStream`` inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stream_directory(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    fmt: str = "csv",
    options: dict | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over a directory. Streaming sources require an
    explicit schema — pass the inference result from a representative file
    (operators.schema_inference.infer_schema on a batch read)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt in ("csv", "psv"):
        reader = reader.option("header", True)
    if fmt == "psv":
        reader = reader.format("csv").option("sep", "|")
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def run_available_now(
    df: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    fmt: str = "parquet",
    output_mode: str = "append",
    query_name: str = "ingest",
):
    """Drain all currently-available input, then stop — the exact semantics
    of the reference's one-shot directory batch (process all pending files,
    checkpoint each). Returns the finished StreamingQuery."""
    q = (
        df.writeStream.format(fmt)
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode(output_mode)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _content_last_wins(
    batch_df: DataFrame, pk_cols: list[str], dedup_order_col: str | None
) -> DataFrame:
    """Deterministic within-batch PK dedup for streaming merges.

    Deliberately NOT operators.merge.dedup_last_wins: that contract keys
    on the reader's unique ``__seq`` (no ties possible); a stream batch
    has no such column, so the winner must be pinned by a CONTENT
    tie-break — otherwise a replayed batch after a crash between data
    commit and checkpoint write could pick a different row and break the
    merge-idempotence argument."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tiebreak = [
        F.col(c).desc()
        for c in batch_df.columns
        if c not in pk_cols and c != dedup_order_col
    ]
    order = (
        [F.col(dedup_order_col).desc()] if dedup_order_col else []
    ) + tiebreak
    if not order:
        # pk-only schema: duplicate rows are identical — any pick is the
        # same row
        return batch_df.dropDuplicates(pk_cols)
    w = Window.partitionBy(*pk_cols).orderBy(*order)
    return (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def run_stream_upsert(
    df: DataFrame,
    warehouse,
    table: str,
    pk_cols: list[str],
    checkpoint_path: str,
    dedup_order_col: str | None = None,
    query_name: str = "stream_upsert",
):
    """Continuous upsert: every micro-batch MERGEs into the warehouse
    snapshot via ``foreachBatch`` — the streaming twin of the H5/H6
    upsert path, against the same manifest-committed table the batch
    engine writes.

    Semantics per micro-batch: last-wins dedup on the PK within the
    batch (ordered by ``dedup_order_col`` if given, the E1 contract),
    then operators.merge.merge_upsert against the current snapshot and a
    manifest-pointer commit. The checkpoint makes file delivery
    exactly-once; the MERGE makes re-delivery idempotent anyway
    (replaying a batch re-merges the same rows to the same result), so a
    crash between the data commit and the checkpoint write cannot
    duplicate rows — the safety argument the reference's per-file
    stats-table dance approximates.

    ``warehouse`` is a sinks.writer.ParquetWarehouse. Single writer per
    table (same model as the batch engine).

    Scale note: each micro-batch pays a snapshot REWRITE proportional to
    |table|, not |batch| — the same trade the batch upsert makes, priced
    per trigger. Right for moderate-rate upsert streams into mid-size
    tables (bound the trigger rate with maxFilesPerTrigger / scheduled
    AvailableNow drains); for high-rate streams into 100 TB tables the
    upgrade path is a row-level-merge table format (Delta/Iceberg),
    which slots in behind this same foreachBatch without changing the
    operator's contract.
    """
    from nspc_etl_basic_spark.operators.merge import merge_upsert

    def _merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        src = _content_last_wins(batch_df, pk_cols, dedup_order_col)
        if warehouse.exists(table):
            merged = merge_upsert(warehouse.read(table), src, pk_cols)
        else:
            merged = src
        warehouse.overwrite_snapshot(merged, table)

    q = (
        df.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_stream_upsert_bucketed(
    df: DataFrame,
    table,
    checkpoint_path: str,
    dedup_order_col: str | None = None,
    query_name: str = "stream_upsert_bucketed",
):
    """Continuous upsert into a ``sinks.bucketed_merge.BucketedTable``:
    each micro-batch rewrites ONLY the buckets its keys touch — the
    streaming sink shape that stays runnable when the target table is far
    larger than any batch (the snapshot-path ``run_stream_upsert`` pays
    |table| per trigger; this pays ~min(K, N)/N of it).

    Same exactly-once argument as the other foreachBatch sinks: the
    checkpoint is at-least-once, the content tie-break pins the winning
    row deterministically, and the bucketed merge is idempotent under
    replay of the same batch content."""

    def _merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        table.merge(_content_last_wins(batch_df, table.pk_cols, dedup_order_col))

    q = (
        df.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_stream_upsert_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    pk_cols: list[str],
    checkpoint_path: str,
    options: dict | None = None,
    dialect: str = "ansi",
    dedup_order_col: str | None = None,
    batch_size: int = 1000,
    query_name: str = "stream_upsert_jdbc",
):
    """Continuous keyed upsert into a JDBC target: every micro-batch runs
    the staging-table + server-side MERGE path (sinks/jdbc_merge.py) via
    ``foreachBatch`` — the streaming twin of the reference's poll-and-load
    loop against its actual SQL Server deployment.

    Exactly-once: the checkpoint gives at-least-once micro-batch
    delivery, and the MERGE is idempotent under replay of the same batch
    content (the content tie-break dedup pins WHICH row wins a duplicate
    key deterministically), so crash-replays converge to the same table
    state. Scale: per trigger, Spark moves only the batch (parallel
    staging load); the server matches against its own indexes — the
    target never transits Spark regardless of its size.
    """
    from nspc_etl_basic_spark.sinks.jdbc_merge import jdbc_upsert

    def _merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        src = _content_last_wins(batch_df, pk_cols, dedup_order_col)
        jdbc_upsert(
            batch_df.sparkSession, src, url, table, pk_cols,
            options=options, dialect=dialect, batch_size=batch_size,
        )

    q = (
        df.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_stream_upsert_cdc(
    df: DataFrame,
    warehouse,
    table: str,
    pk_cols: list[str],
    checkpoint_path: str,
    dedup_order_col: str | None = None,
    query_name: str = "stream_upsert_cdc",
):
    """``run_stream_upsert`` plus a change-data-feed: every micro-batch
    also APPENDS its ``operators.merge.merge_changes`` rows — tagged
    with the batch id — to the append-only ``<table>_changes`` table,
    so downstream consumers (SCD2 folds, CDC export, cache
    invalidation) tail a feed instead of diffing snapshots.

    Idempotency: the snapshot merge is naturally idempotent under
    micro-batch replay, but an APPEND is not — so the feed write is
    guarded by the recorded ``batch_id`` high-water mark (the standard
    foreachBatch exactly-once recipe): a replayed batch whose id is
    already present in the feed skips the append and only re-runs the
    idempotent merge. Feed rows therefore appear exactly once per
    logical batch across crash/restart (pinned by the restart test).

    Scale: the feed legs are map-only broadcast semi/anti joins (the
    target never shuffles — see ``merge_changes``); the feed table is
    append-only and output-proportional. The high-water-mark read is a
    1-row max over the feed's column-pruned ``batch_id`` column.
    """
    from pyspark.sql import functions as F

    from nspc_etl_basic_spark.operators.merge import merge_changes, merge_upsert

    changes_table = f"{table}_changes"

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        src = _content_last_wins(batch_df, pk_cols, dedup_order_col)
        feed_done = False
        if warehouse.exists(changes_table):
            hwm = (
                warehouse.read(changes_table)
                .agg(F.max("batch_id").alias("m"))
                .collect()[0]["m"]
            )
            feed_done = hwm is not None and int(hwm) >= int(batch_id)
        caches: list[DataFrame] = []
        if warehouse.exists(table):
            tgt = warehouse.read(table)
            feed = merge_changes(tgt, src, pk_cols, caches=caches)
            merged = merge_upsert(tgt, src, pk_cols)
        else:
            feed = src.select(F.lit("insert").alias("op"), "*")
            merged = src
        try:
            if not feed_done:
                warehouse.write(
                    feed.withColumn("batch_id", F.lit(int(batch_id))),
                    changes_table,
                    mode="append",
                )
            warehouse.overwrite_snapshot(merged, table)
        finally:
            # per-batch cache, per-batch release: a long-running stream
            # must not accumulate one pinned plan per micro-batch
            for c in caches:
                c.unpersist()

    q = (
        df.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
