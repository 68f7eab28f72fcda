"""Count-min sketch (sketches.cms_build/cms_merge/cms_estimate):
overcount-only error, mergeability, weighted inserts, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def test_estimate_is_overcount_only_and_exact_when_sparse(spark):
    keys = ["a"] * 10 + ["b"] * 5 + ["c"] * 1
    df = _df(spark, keys)
    sk = cms_build(df, "k", depth=4, width=64)
    est = {
        r["k"]: r["cms_est"]
        for r in cms_estimate(sk, df, "k", depth=4, width=64).collect()
    }
    true = {"a": 10, "b": 5, "c": 1}
    for k, t in true.items():
        assert est[k] >= t  # the CMS guarantee
    # 3 keys in a 4x64 sketch: collisions impossible across all 4 rows
    # only if buckets differ; with overwhelming likelihood est == true
    assert est == true


def test_merge_equals_whole(spark):
    a = _df(spark, ["x"] * 7 + ["y"] * 3)
    b = _df(spark, ["y"] * 4 + ["z"] * 2)
    whole = a.unionByName(b)
    merged = cms_merge(
        cms_build(a, "k", depth=3, width=32),
        cms_build(b, "k", depth=3, width=32),
    )
    direct = cms_build(whole, "k", depth=3, width=32)
    m = sorted(tuple(r) for r in merged.collect())
    d = sorted(tuple(r) for r in direct.collect())
    assert m == d


def test_weighted_build(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 2), ("b", 10)], "k string, w long"
    )
    sk = cms_build(df, "k", depth=4, width=64, weight_col="w")
    est = {
        r["k"]: r["cms_est"]
        for r in cms_estimate(sk, df.select("k"), "k", depth=4, width=64)
        .collect()
    }
    assert est["a"] >= 7 and est["b"] >= 10


def test_never_inserted_key_estimates_zero_or_collision(spark):
    df = _df(spark, ["only"])
    sk = cms_build(df, "k", depth=4, width=64)
    probe = _df(spark, ["absent"])
    (row,) = cms_estimate(sk, probe, "k", depth=4, width=64).collect()
    assert row["cms_est"] in (0, 1)  # 0 unless all 4 buckets collide
    assert row["cms_est"] == 0  # md5 of distinct strings: no 4-way hit here


def test_validation(spark):
    df = _df(spark, ["a"])
    with pytest.raises(ValueError):
        cms_build(df, "k", depth=0)
    with pytest.raises(ValueError):
        cms_build(df, "k", width=1)


def test_total_count_preserved_per_row(spark):
    keys = ["a", "b", "c", "a"]
    sk = cms_build(_df(spark, keys), "k", depth=4, width=16)
    per_row = {
        r["row_idx"]: r["s"]
        for r in sk.groupBy("row_idx").agg(F.sum("cnt").alias("s")).collect()
    }
    assert per_row == {0: 4, 1: 4, 2: 4, 3: 4}
