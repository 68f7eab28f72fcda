"""Streaming anomaly scoring against accumulated statistics: parity with
the batch operator on the concatenated corpus, and replay-safe store."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nspc_etl_basic_spark.operators.anomaly import zscore_outliers
from nspc_etl_basic_spark.streaming.anomaly import (
    run_stream_anomaly,
    stats_store_table,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("g", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _drain(spark, src, store, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).format("parquet").load(str(src))
    run_stream_anomaly(stream, store, str(out), ckpt, "g", "v", threshold=2.0)


def test_stream_anomaly_accumulates_and_matches_batch(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    store = stats_store_table(spark, str(tmp_path / "store"), "g", n_buckets=4)

    batch1 = [(i, "a", 10.0 + (i % 3)) for i in range(20)]
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    _drain(spark, src, store, out, ckpt)

    # batch 2 carries a spike; it is scored against batch1+batch2 stats
    batch2 = [(100, "a", 11.0), (101, "a", 99.0)]
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    _drain(spark, src, store, out, ckpt)

    flagged = spark.read.parquet(str(out)).collect()
    assert [r["event_id"] for r in flagged] == [101]

    # parity: the batch operator over the concatenated corpus flags the
    # same batch-2 rows with the same z
    full = spark.createDataFrame(batch1 + batch2, SCHEMA)
    want = {
        r["event_id"]: r["z"]
        for r in zscore_outliers(full, "g", "v", threshold=2.0).collect()
        if r["event_id"] >= 100
    }
    got = {r["event_id"]: r["z"] for r in flagged}
    assert got == want

    # re-drain with no new data: no new outliers, no stat double-count
    n_store = store.read().count()
    _drain(spark, src, store, out, ckpt)
    assert spark.read.parquet(str(out)).count() == 1
    assert store.read().count() == n_store
    # accumulated n equals total rows seen
    total_n = store.read().agg(F.sum("_n")).collect()[0][0]
    assert total_n == len(batch1) + len(batch2)
