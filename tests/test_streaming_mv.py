"""Streaming incremental MV maintenance (streaming/mv.run_stream_mv):
MV == summary_mv(base) after every drain, across restarts, and under
full checkpoint-loss replay (batch-id HWM skips the re-fold)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nspc_etl_basic_spark.operators.mv import summary_mv
from nspc_etl_basic_spark.sinks.writer import ParquetWarehouse
from nspc_etl_basic_spark.streaming.ingest import stream_directory
from nspc_etl_basic_spark.streaming.mv import run_stream_mv

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _mv_rows(wh):
    return sorted(
        tuple(r)
        for r in wh.read("mv")
        .select("grp", "n_rows", F.col("sum_v").cast("double"))
        .collect()
    )


def _expected(wh):
    return sorted(
        tuple(r)
        for r in summary_mv(wh.read("base"), ["grp"], ["v"])
        .select("grp", "n_rows", F.col("sum_v").cast("double"))
        .collect()
    )


def _drain(spark, src, wh, ckpt):
    stream = stream_directory(spark, src, SCHEMA, fmt="csv")
    run_stream_mv(
        stream, wh, "base", "mv", ["id"], ["grp"], ["v"], ckpt,
        dedup_order_col="seq",
    )


def test_mv_tracks_base_across_batches_and_restart(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))

    (src / "a.csv").write_text(
        "id,grp,v,seq\n1,a,10.0,1\n2,a,20.0,1\n3,b,30.0,1\n"
    )
    _drain(spark, str(src), wh, ckpt)
    assert _mv_rows(wh) == _expected(wh)

    # second drain: update id 1 (a -> b migration), insert id 4,
    # in-batch duplicate for id 4 resolved by seq last-wins
    (src / "b.csv").write_text(
        "id,grp,v,seq\n1,b,11.0,2\n4,c,40.0,1\n4,c,44.0,2\n"
    )
    _drain(spark, str(src), wh, ckpt)
    got = _mv_rows(wh)
    assert got == _expected(wh)
    as_map = {g: (n, s) for g, n, s in got}
    assert as_map["a"] == (1, 20.0)  # id 1 left 'a'
    assert as_map["b"] == (2, 41.0)  # 30 + migrated 11
    assert as_map["c"] == (1, 44.0)  # seq=2 row won the in-batch dup


def test_checkpoint_loss_replay_converges(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    (src / "a.csv").write_text("id,grp,v,seq\n1,a,10.0,1\n2,b,20.0,1\n")
    _drain(spark, str(src), wh, str(tmp_path / "ck1"))
    before = _mv_rows(wh)

    # lose the checkpoint: the whole directory replays as batch 0 again.
    # The MV's batch-id HWM (>= 0) skips the re-fold; the base re-merge
    # is idempotent — state must not change.
    _drain(spark, str(src), wh, str(tmp_path / "ck2"))
    assert _mv_rows(wh) == before
    assert _mv_rows(wh) == _expected(wh)


def test_mv_drops_emptied_group_on_migration(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    (src / "a.csv").write_text("id,grp,v,seq\n1,solo,5.0,1\n2,big,1.0,1\n")
    _drain(spark, str(src), wh, ckpt)
    (src / "b.csv").write_text("id,grp,v,seq\n1,big,5.0,2\n")
    _drain(spark, str(src), wh, ckpt)
    got = {r["grp"] for r in wh.read("mv").collect()}
    assert got == {"big"}  # 'solo' emptied and dropped
