"""Dry-run (validate-only) mode: the full read -> authority -> cast ->
quality chain runs and reports, but NOTHING is written or moved."""

from __future__ import annotations

import os

from nspc_etl_basic_spark import load_config
from nspc_etl_basic_spark.plans.pipeline import process_file
from nspc_etl_basic_spark.sinks.writer import ParquetWarehouse


def _cfg(tmp_path, **loader):
    return load_config(
        overrides={
            "database": {"warehouse_path": str(tmp_path / "wh")},
            "loader": loader,
        }
    )


def test_dry_run_validates_and_writes_nothing(spark, tmp_path):
    src = tmp_path / "sales.csv"
    src.write_text("id,amount,when\n1,10.50,2024-01-02\n2,7.25,2024-01-03\n")
    cfg = _cfg(tmp_path, table_mode="append")
    res = process_file(spark, str(src), cfg, dry_run=True)
    assert res.status == "Validated"
    assert res.rows_read == 2 and res.rows_failed == 0
    assert res.rows_inserted == 0 and res.rows_updated == 0
    # the preflight still reports the inferred DDL types
    assert set(res.details["sql_types"]) == {"id", "amount", "when"}
    # NOTHING landed: no tables (the warehouse dir itself is created by
    # the constructor), no metadata, no move
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    assert not wh.exists(res.table_name)
    assert not wh.exists("EtlJobStatistics")
    assert os.listdir(str(tmp_path / "wh")) == []
    assert src.exists()
    assert not (tmp_path / "processed").exists()


def test_dry_run_fails_like_a_real_load_without_side_effects(spark, tmp_path):
    # seed a typed table so strict upsert has a schema authority
    seed = tmp_path / "t_typed.csv"
    seed.write_text("id,n\n1,10\n")
    cfg = _cfg(
        tmp_path, table_mode="upsert", transaction_mode="strict",
        primary_key_columns=["id"], override_table_name="t_typed",
    )
    assert process_file(spark, str(seed), cfg, move_files=False).status == "Completed"
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    before = wh.read("t_typed").collect()
    stats_before = wh.read("EtlJobStatistics").count()  # the seed load's row

    bad = tmp_path / "bad.csv"
    bad.write_text("id,n\n2,not_a_number\n")
    res = process_file(spark, str(bad), cfg, dry_run=True)
    assert res.status == "Failed" and "strict mode" in res.error_message
    # the target is untouched, the bad file not moved, and the dry-run
    # added NO metadata rows (the seed load's stats row stays the only one)
    assert wh.read("t_typed").collect() == before
    assert bad.exists() and not (tmp_path / "error" / "bad.csv").exists()
    assert not wh.exists("EtlJobError")
    assert wh.read("EtlJobStatistics").count() == stats_before


def test_cli_dry_run_exit_codes(spark, tmp_path):
    from nspc_etl_basic_spark.__main__ import main

    src = tmp_path / "ok.csv"
    src.write_text("id,v\n1,a\n")
    wh = str(tmp_path / "wh")
    assert (
        main([str(src), "--warehouse", wh, "--dry-run", "--no-move"]) == 0
    )
    assert os.listdir(wh) == []  # validated, nothing written
    # a real load afterwards still works and exits 0
    assert main([str(src), "--warehouse", wh, "--no-move"]) == 0
    assert os.path.exists(wh)
