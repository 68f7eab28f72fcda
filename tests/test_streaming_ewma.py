"""Streaming EWMA: batch-operator parity on the concatenated history,
replay safety of the state store."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nspc_etl_basic_spark.operators.resample import ewma_by_key
from nspc_etl_basic_spark.streaming.ewma import (
    ewma_from_store,
    ewma_store_table,
    run_stream_ewma,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _drain(spark, src, store, ckpt):
    stream = spark.readStream.schema(SCHEMA).format("parquet").load(str(src))
    run_stream_ewma(stream, store, ckpt, "k", "ts", "v", alpha=0.3)


def _rows(base_h, spec):
    return [
        (k, dt.datetime(2024, 6, 1, base_h, m), float(v))
        for k, m, v in spec
    ]


def test_stream_ewma_matches_batch_over_history(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    store = ewma_store_table(spark, str(tmp_path / "store"), "k", n_buckets=4)

    b1 = _rows(1, [("a", 0, 1.0), ("a", 10, 2.0), ("b", 5, 7.0)])
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    _drain(spark, src, store, ckpt)

    b2 = _rows(2, [("a", 0, 5.0), ("b", 1, 1.0), ("c", 2, 4.0)])
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    _drain(spark, src, store, ckpt)

    got = {
        r["k"]: (r["n_obs"], r["ewma"])
        for r in ewma_from_store(store, "k").collect()
    }
    full = spark.createDataFrame(b1 + b2, SCHEMA)
    want = {
        r["k"]: (r["n_obs"], r["ewma"])
        for r in ewma_by_key(full, "k", "ts", "v", alpha=0.3).collect()
    }
    assert got == want and set(got) == {"a", "b", "c"}

    # re-drain with no new data: store unchanged (no double folding)
    snap = sorted(tuple(r) for r in store.read().collect())
    _drain(spark, src, store, ckpt)
    assert sorted(tuple(r) for r in store.read().collect()) == snap
    # simulated redelivery: re-merging a batch's own rows is idempotent
    store.merge(store.read())
    assert sorted(tuple(r) for r in store.read().collect()) == snap
