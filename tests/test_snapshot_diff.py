"""snapshot_diff: minimal op set, null-safe comparison, and the
reconstruction identity old + diff == new."""

from __future__ import annotations

from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.merge import snapshot_diff


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, s string, v double")


def test_minimal_ops_and_reconstruction(spark):
    old = _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
    new = _df(spark, [(1, "a", 1.0), (2, "b", 9.0), (4, "d", 4.0)])
    d = snapshot_diff(old, new, ["id"]).collect()
    ops = {(r["op"], r["id"]) for r in d}
    assert ops == {
        ("delete", 3),
        ("insert", 4),
        ("update_preimage", 2),
        ("update_postimage", 2),
    }
    # unchanged row 1 must NOT appear (minimality vs merge_changes)
    assert not any(r["id"] == 1 for r in d)
    # reconstruction: old - deletes - preimages + inserts + postimages
    dd = snapshot_diff(old, new, ["id"])
    removed = dd.where(F.col("op").isin("delete", "update_preimage")).select(
        "id", "s", "v"
    )
    added = dd.where(F.col("op").isin("insert", "update_postimage")).select(
        "id", "s", "v"
    )
    rebuilt = old.join(removed.select("id"), "id", "left_anti").unionByName(
        added
    )
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_null_safe_value_comparison(spark):
    old = _df(spark, [(1, None, 1.0), (2, "b", None)])
    new = _df(spark, [(1, None, 1.0), (2, None, None)])
    d = snapshot_diff(old, new, ["id"]).collect()
    # row 1: null == null -> unchanged, absent; row 2: "b" -> null changes
    ids = {(r["op"], r["id"]) for r in d}
    assert ids == {("update_preimage", 2), ("update_postimage", 2)}


def test_identical_snapshots_diff_empty(spark):
    a = _df(spark, [(1, "a", 1.0)])
    assert snapshot_diff(a, a, ["id"]).count() == 0
