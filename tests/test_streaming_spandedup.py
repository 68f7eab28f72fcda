"""Streaming span dedup: cross-batch boilerplate removal, additive store
accounting keyed by (gh, batch_id), and replay idempotency."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nspc_etl_basic_spark.streaming.spandedup import (
    gram_store_table,
    read_gram_counts,
    run_stream_span_dedup,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BOILER = "all rights reserved see license file for details"


def _drain(spark, src, store, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).format("parquet").load(str(src))
    run_stream_span_dedup(stream, store, str(out), ckpt)


def test_stream_span_dedup_cleans_later_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    store = gram_store_table(spark, str(tmp_path / "store"), n_buckets=8)

    # batch 1: boilerplate appears once — kept (nothing to compare against)
    spark.createDataFrame(
        [(1, f"first ingested doc {BOILER}")], SCHEMA
    ).coalesce(1).write.parquet(str(src), mode="append")
    _drain(spark, src, store, out, ckpt)
    got1 = {r["doc_id"]: r for r in spark.read.parquet(str(out)).collect()}
    assert got1[1]["n_removed"] == 0

    # batch 2: the boilerplate now collides with the store — cut
    spark.createDataFrame(
        [(10, f"{BOILER} fresh unique content here"),
         (11, "nothing shared at all with anything else")],
        SCHEMA,
    ).coalesce(1).write.parquet(str(src), mode="append")
    _drain(spark, src, store, out, ckpt)
    got2 = {r["doc_id"]: r for r in spark.read.parquet(str(out)).collect()}
    assert got2[10]["clean_text"] == "fresh unique content here"
    assert got2[10]["n_removed"] == 8
    assert got2[11]["n_removed"] == 0

    # store accounting: boiler grams counted once per batch occurrence
    counts = {r["gh"]: r["count"] for r in read_gram_counts(store).collect()}
    assert max(counts.values()) == 2  # boiler grams: batch1 + batch2

    # restart with no new files: no-op, no double counting
    _drain(spark, src, store, out, ckpt)
    counts2 = {r["gh"]: r["count"] for r in read_gram_counts(store).collect()}
    assert counts2 == counts


def test_stream_span_dedup_store_merge_is_replay_idempotent(spark, tmp_path):
    """Simulate at-least-once redelivery: merging the same (gh, batch_id)
    rows twice leaves the aggregated counts unchanged (last-wins on the
    composite key), unlike a naive additive merge."""
    store = gram_store_table(spark, str(tmp_path / "store"), n_buckets=4)
    rows = spark.createDataFrame(
        [(111, 0, 3), (222, 0, 1)], "gh LONG, batch_id LONG, count LONG"
    )
    store.init(rows)
    before = sorted(map(tuple, read_gram_counts(store).collect()))
    store.merge(rows)  # redelivery of the same micro-batch
    after = sorted(map(tuple, read_gram_counts(store).collect()))
    assert before == after == [(111, 3), (222, 1)]
    # a NEW batch adds
    store.merge(
        spark.createDataFrame([(111, 1, 2)], "gh LONG, batch_id LONG, count LONG")
    )
    assert sorted(map(tuple, read_gram_counts(store).collect())) == [
        (111, 5), (222, 1),
    ]
