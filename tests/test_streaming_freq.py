"""Streaming heavy hitters: superset guarantee, exact-from-candidacy
counts, replay safety of the additive count store."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nspc_etl_basic_spark.streaming.freq import (
    TOTAL_KEY,
    count_store_table,
    heavy_hitters_from_store,
    run_stream_heavy_hitters,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("k", T.StringType()),
    ]
)


def _drain(spark, src, store, ckpt, support):
    stream = spark.readStream.schema(SCHEMA).format("parquet").load(str(src))
    run_stream_heavy_hitters(stream, store, ckpt, "k", support=support)


def test_stream_heavy_hitters_tracks_and_reports(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    store = count_store_table(spark, str(tmp_path / "store"), n_buckets=4)

    # batch 1: 'hot' dominates, long unique tail
    b1 = [(i, "hot") for i in range(60)] + [
        (100 + i, f"tail{i}") for i in range(40)
    ]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    _drain(spark, src, store, ckpt, support=0.1)

    # batch 2: 'hot' continues, 'warm' emerges
    b2 = [(200 + i, "hot") for i in range(30)] + [
        (300 + i, "warm") for i in range(60)
    ] + [(400 + i, f"tl{i}") for i in range(10)]
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    _drain(spark, src, store, ckpt, support=0.1)

    out = {
        r["key"]: (r["cnt"], r["max_undercount"])
        for r in heavy_hitters_from_store(store, 0.25, 0.1).collect()
    }
    # 200 rows total; threshold 25% = 50. hot: 90 (exact — candidate
    # from batch 1). warm: 60, candidate from batch 2 where its batch
    # share is 0.6 — tracked exactly there, total exact too.
    assert set(out) == {"hot", "warm"}
    assert out["hot"][0] == 90
    assert out["warm"][0] == 60
    assert all(u == 20 for _, u in out.values())  # support * N = 0.1*200

    # totals sentinel: one row per batch, sums to all rows seen
    totals = store.read().where(F.col("key") == TOTAL_KEY)
    assert totals.count() == 2
    assert totals.agg(F.sum("cnt")).collect()[0][0] == 200


def test_stream_heavy_hitters_replay_safe(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    store = count_store_table(spark, str(tmp_path / "store"), n_buckets=4)
    rows = [(i, "a") for i in range(30)] + [(50 + i, "b") for i in range(10)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    _drain(spark, src, store, ckpt, support=0.2)
    snap = sorted(tuple(r) for r in store.read().collect())
    # re-drain with no new files: store byte-identical (no double adds)
    _drain(spark, src, store, ckpt, support=0.2)
    assert sorted(tuple(r) for r in store.read().collect()) == snap
    # simulated redelivery of the same batch id: merging the same rows
    # again is idempotent (last-wins on (key, batch_id))
    first = store.read().where(F.col("key") != TOTAL_KEY)
    store.merge(first)
    assert sorted(tuple(r) for r in store.read().collect()) == snap


def test_superset_guarantee_across_skewed_batches(spark, tmp_path):
    """A key spread thinly but above threshold globally must appear:
    by the average argument it crosses the batch support somewhere."""
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    store = count_store_table(spark, str(tmp_path / "store"), n_buckets=4)
    # 'x' is 30% of every batch -> 30% globally; support 0.25 < 0.3
    for b in range(3):
        rows = [(b * 1000 + i, "x") for i in range(30)] + [
            (b * 1000 + 500 + i, f"u{b}_{i}") for i in range(70)
        ]
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src), mode="append"
        )
        _drain(spark, src, store, ckpt, support=0.25)
    got = {
        r["key"]: r["cnt"]
        for r in heavy_hitters_from_store(store, 0.3, 0.25).collect()
    }
    assert got == {"x": 90}
