"""File-level min/max stats index: driver-side file pruning
(sinks/stats_index.py) — correctness AND the actual skip."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.sinks.stats_index import (
    INDEX_NAME,
    build_stats_index,
    load_stats_index,
    prune_files,
    pruned_scan,
)
from nspc_etl_basic_spark.sinks.writer import ParquetWarehouse


@pytest.fixture()
def clustered_dir(spark, sf_dir, tmp_path):
    """customer range-partitioned on c_custkey into 8 files: each file
    covers a disjoint key range, so a narrow range predicate should
    touch ~1 file."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = str(tmp_path / "cust_clustered")
    (
        cust.repartitionByRange(8, "c_custkey")
        .sortWithinPartitions("c_custkey")
        .write.parquet(out)
    )
    return out


def test_pruned_scan_matches_full_filter_and_skips_files(spark, clustered_dir):
    full = spark.read.parquet(clustered_dir)
    lo, hi = 100, 140
    want = sorted(
        r["c_custkey"]
        for r in full.where(F.col("c_custkey").between(lo, hi)).collect()
    )
    build_stats_index(spark, clustered_dir, ["c_custkey"])
    pruned = pruned_scan(spark, clustered_dir, "c_custkey", lo, hi)
    got = sorted(r["c_custkey"] for r in pruned.collect())
    assert got == want and want
    n_total = len(
        [f for f in os.listdir(clustered_dir) if f.endswith(".parquet")]
    )
    n_read = len({os.path.basename(f) for f in pruned.inputFiles()})
    assert n_total == 8
    assert n_read < n_total  # the driver actually dropped files


def test_prune_never_carries_correctness(spark, clustered_dir):
    """A file the index would keep may still hold non-matching rows —
    the re-applied predicate filters them; and without any index the
    scan silently degrades to full."""
    # no index yet -> full scan, still correct
    df = pruned_scan(spark, clustered_dir, "c_custkey", 1, 10)
    keys = [r["c_custkey"] for r in df.collect()]
    assert keys and all(1 <= k <= 10 for k in keys)


def test_empty_intersection_returns_empty_with_schema(spark, clustered_dir):
    build_stats_index(spark, clustered_dir, ["c_custkey"])
    full = spark.read.parquet(clustered_dir)
    hi = full.agg(F.max("c_custkey")).collect()[0][0]
    out = pruned_scan(spark, clustered_dir, "c_custkey", hi + 10, hi + 20)
    assert out.count() == 0
    assert out.columns == full.columns


def test_string_and_null_semantics(spark, tmp_path):
    out = str(tmp_path / "strtab")
    spark.createDataFrame(
        [("apple", 1), ("banana", 2)], ["w", "i"]
    ).coalesce(1).write.parquet(out)
    spark.createDataFrame(
        [("melon", 3), ("pear", 4)], ["w", "i"]
    ).coalesce(1).write.mode("append").parquet(out)
    spark.createDataFrame(
        [(None, 5)], "w string, i int"
    ).coalesce(1).write.mode("append").parquet(out)
    idx = build_stats_index(spark, out, ["w"])
    # lexicographic pruning: 'c'..'n' intersects only the melon file
    keep = prune_files(idx, out, "w", "c", "n")
    assert len(keep) == 1
    # the all-null file is dropped for any range (range never matches NULL)
    got = {r["w"] for r in pruned_scan(spark, out, "w", "a", "z").collect()}
    assert got == {"apple", "banana", "melon", "pear"}


def test_warehouse_integration_and_version_consistency(spark, sf_dir, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    wh.write(cust.repartitionByRange(4, "c_custkey"), "cust")
    wh.analyze("cust", ["c_custkey"])
    assert os.path.exists(os.path.join(wh.data_path("cust"), INDEX_NAME))
    got = wh.read_pruned("cust", "c_custkey", 1, 25).count()
    want = cust.where(F.col("c_custkey").between(1, 25)).count()
    assert got == want
    # a new commit makes a fresh version dir WITHOUT an index: pruned
    # read degrades to a (correct) full scan, old sidecar stays with
    # its own version
    wh.write(cust.where(F.col("c_custkey") > 10), "cust")
    assert load_stats_index(wh.data_path("cust")) is None
    got2 = wh.read_pruned("cust", "c_custkey", 1, 25).count()
    want2 = cust.where(F.col("c_custkey").between(11, 25)).count()
    assert got2 == want2


def test_pipeline_maintains_stats_index(spark, tmp_path):
    """database.stats_columns: every pipeline commit rebuilds the
    file-level index for the new current version."""
    import nspc_etl_basic_spark as eng
    from nspc_etl_basic_spark.plans.pipeline import process_file

    src = tmp_path / "measurements.csv"
    src.write_text(
        "id,reading\n" + "\n".join(f"{i},{i * 2}" for i in range(1, 51)) + "\n"
    )
    cfg = eng.load_config(
        overrides={
            "database": {
                "warehouse_path": str(tmp_path / "wh"),
                "stats_columns": ["id", "reading"],
            },
            "loader": {"table_mode": "upsert", "primary_key_columns": ["id"]},
        }
    )
    r = process_file(spark, str(src), cfg, move_files=False)
    assert r.status == "Completed", r.error_message
    assert r.details.get("stats_index") == ["id", "reading"]
    tname = r.table_name
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    assert load_stats_index(wh.data_path(tname)) is not None
    got = wh.read_pruned(tname, "id", 10, 20).count()
    assert got == 11
    # a second commit (upsert) re-analyzes the NEW version
    src2 = tmp_path / "measurements2.csv"
    src2.write_text("id,reading\n60,120\n")
    cfg2 = eng.load_config(
        overrides={
            "database": {
                "warehouse_path": str(tmp_path / "wh"),
                "stats_columns": ["id"],
            },
            "loader": {
                "table_mode": "upsert",
                "primary_key_columns": ["id"],
                "override_table_name": tname,
            },
        }
    )
    r2 = process_file(spark, str(src2), cfg2, move_files=False)
    assert r2.status == "Completed", r2.error_message
    assert load_stats_index(wh.data_path(tname)) is not None
    assert wh.read_pruned(tname, "id", 55, 70).count() == 1


def test_compact_carries_stats_index(spark, sf_dir, tmp_path):
    """Maintenance must not silently strip file skipping: compact()
    rebuilds the index for the columns the old version tracked."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    wh.write(cust.repartition(24), "cust")
    wh.analyze("cust", ["c_custkey"])
    assert wh.compact("cust", target_file_mb=256) is not None
    idx = load_stats_index(wh.data_path("cust"))
    assert idx is not None and idx["columns"] == ["c_custkey"]
    got = wh.read_pruned("cust", "c_custkey", 1, 30).count()
    assert got == cust.where(F.col("c_custkey").between(1, 30)).count()
