"""Bucketed-table layout (sinks/bucketed.py): the co-located join
contract — two tables bucketed identically on the join key must join
with ZERO Exchange nodes, and results must equal the plain join."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.sinks.bucketed import read_bucketed, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    a = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 100).alias("a_val")
    )
    b = spark.range(1500).select(
        F.col("id").alias("k"), (F.col("id") * 11 % 100).alias("b_val")
    )
    write_bucketed(a, "t_buck_a", ["k"], 8, path=str(tmp_path / "a"), sort_cols=["k"])
    write_bucketed(b, "t_buck_b", ["k"], 8, path=str(tmp_path / "b"), sort_cols=["k"])
    yield a, b
    spark.sql("DROP TABLE IF EXISTS t_buck_a")
    spark.sql("DROP TABLE IF EXISTS t_buck_b")


def test_colocated_join_has_no_exchange(spark, bucketed_pair):
    # bucketing targets the regime where NEITHER side broadcasts (two
    # fact tables); disable broadcast so the contract is visible at
    # test scale
    a, b = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, "t_buck_a").join(
            read_bucketed(spark, "t_buck_b"), "k"
        )
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # and the layout is semantics-free: same rows as the plain join
        expected = sorted(map(tuple, a.join(b, "k").collect()))
        assert sorted(map(tuple, j.collect())) == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    g = (
        read_bucketed(spark, "t_buck_a")
        .groupBy("k")
        .agg(F.sum("a_val").alias("s"))
    )
    assert "Exchange" not in _plan(g), _plan(g)


def test_path_read_discards_bucket_spec(spark, tmp_path, bucketed_pair):
    """The failure mode read_bucketed exists to prevent: path reads lose
    the bucket metadata and the join shuffles again."""
    a = spark.read.parquet(str(tmp_path / "a"))
    b = spark.read.parquet(str(tmp_path / "b"))
    assert "Exchange" in _plan(a.join(b, "k"))


def test_write_bucketed_rejects_bad_bucket_count(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        write_bucketed(df, "t_bad", ["k"], 0)


def test_partitioned_write_prunes_at_plan_time(spark, tmp_path):
    from nspc_etl_basic_spark.sinks.bucketed import write_partitioned

    df = spark.range(1000).select(
        F.col("id").alias("v"),
        F.concat(F.lit("2024-01-0"), (F.col("id") % 5 + 1)).alias("day"),
    )
    path = str(tmp_path / "part")
    write_partitioned(df, path, ["day"])
    back = spark.read.parquet(path)
    q = back.filter(F.col("day") == "2024-01-03").select(F.sum("v").alias("s"))
    plan = _plan(q)
    # pruning happens at planning: the partition filter is in the scan's
    # PartitionFilters, NOT a post-scan Filter over all partitions
    assert "PartitionFilters" in plan
    scan_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "day" in scan_line.split("PartitionFilters")[1].split("PushedFilters")[0]
    expected = sum(v for v in range(1000) if v % 5 + 1 == 3)
    assert q.collect()[0].s == expected


def test_merge_schema_reads_across_schema_drift(spark, tmp_path):
    """Ingest-over-time schema drift: files written before a column
    existed must null-extend under mergeSchema, and pruning/pushdown
    still work on the union schema."""
    p = str(tmp_path / "drift")
    spark.createDataFrame([(1, "a")], ["id", "name"]).write.parquet(f"{p}/d1")
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "name", "score"]
    ).write.parquet(f"{p}/d2")
    df = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(p)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}
