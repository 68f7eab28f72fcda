"""epoch_shuffle: partition-layout-insensitive deterministic shuffle
with dense per-shard positions and seed independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.sampling import epoch_shuffle


def _docs(spark, n=300):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def _assign(df, seed, shards=4):
    return {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in epoch_shuffle(df, "doc_id", seed, shards).collect()
    }


def test_positions_are_dense_per_shard(spark):
    out = epoch_shuffle(_docs(spark), "doc_id", seed=1, n_shards=4)
    per = (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pos").alias("mn"),
            F.max("pos").alias("mx"),
            F.countDistinct("pos").alias("nd"),
        )
        .collect()
    )
    assert len(per) == 4
    for r in per:
        assert (r["mn"], r["mx"], r["nd"]) == (1, r["n"], r["n"])


def test_layout_insensitive(spark):
    df = _docs(spark)
    a = _assign(df, seed=3)
    b = _assign(df.repartition(13), seed=3)
    assert a == b


def test_seed_changes_order(spark):
    df = _docs(spark)
    a = _assign(df, seed=1)
    b = _assign(df, seed=2)
    assert a != b  # a new epoch is a fresh permutation


def test_shards_roughly_balanced(spark):
    out = epoch_shuffle(_docs(spark, 1000), "doc_id", seed=5, n_shards=4)
    sizes = [r["n"] for r in out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n")).collect()]
    assert len(sizes) == 4
    assert max(sizes) < 2 * min(sizes)


def test_validation(spark):
    with pytest.raises(ValueError):
        epoch_shuffle(_docs(spark), "doc_id", seed=1, n_shards=0)
