"""Streaming SCD2 fold: incremental micro-batches == full rebuild, and
replay after checkpoint loss converges (idempotent apply-changes)."""

from __future__ import annotations

import datetime
import shutil

from pyspark.sql import types as T

from nspc_etl_basic_spark.operators.scd import scd2_from_feed
from nspc_etl_basic_spark.sinks.writer import ParquetWarehouse
from nspc_etl_basic_spark.streaming.scd import run_stream_scd2

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.DateType()),
        T.StructField("status", T.StringType()),
    ]
)

D = datetime.date


def _rows_phase1():
    return [
        (1, D(2024, 1, 1), "NEW"),
        (1, D(2024, 2, 1), "SHIP"),
        (2, D(2024, 1, 5), "NEW"),
    ]


def _rows_phase2():
    return [
        (1, D(2024, 3, 1), "DONE"),
        (3, D(2024, 3, 2), "NEW"),
    ]


def test_stream_scd2_incremental_equals_rebuild_and_survives_replay(
    spark, tmp_path
):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))

    def drain():
        stream = (
            spark.readStream.schema(SCHEMA).format("parquet").load(str(src))
        )
        run_stream_scd2(
            stream, wh, "dim_hist", ["k"], "ts", ["status"], ckpt
        )

    def state():
        return sorted(map(tuple, wh.read("dim_hist").collect()))

    spark.createDataFrame(_rows_phase1(), SCHEMA).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    drain()
    s1 = state()
    # key 1 has two intervals chained, key 2 one open interval
    assert len(s1) == 3

    spark.createDataFrame(_rows_phase2(), SCHEMA).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    drain()
    s2 = state()

    full = scd2_from_feed(
        spark.createDataFrame(_rows_phase1() + _rows_phase2(), SCHEMA),
        ["k"], "ts", ["status"],
    )
    assert s2 == sorted(map(tuple, full.collect()))

    # checkpoint loss -> full directory replay; idempotent convergence
    shutil.rmtree(ckpt)
    drain()
    assert state() == s2
