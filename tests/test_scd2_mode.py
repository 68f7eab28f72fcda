"""scd2 table mode: files are CDC change feeds folded into a Type-2
dimension-history table through the standard pipeline."""

from __future__ import annotations

import nspc_etl_basic_spark as eng
from nspc_etl_basic_spark.operators.scd import scd2_from_feed
from nspc_etl_basic_spark.plans.pipeline import process_file
from nspc_etl_basic_spark.sinks.writer import ParquetWarehouse


def _cfg(tmp_path):
    return eng.load_config(
        overrides={
            "database": {"warehouse_path": str(tmp_path / "wh")},
            "override_table_name": "dim_cust",
            "loader": {
                "table_mode": "scd2",
                "primary_key_columns": ["id"],
                "scd2": {"ts_column": "ts"},
            },
        }
    )


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_scd2_mode_two_files_equals_rebuild(spark, tmp_path):
    cfg = _cfg(tmp_path)
    f1 = _write(
        tmp_path, "d1.csv",
        "id,ts,status\n1,2024-01-01,NEW\n1,2024-02-01,SHIP\n2,2024-01-05,NEW\n",
    )
    r1 = process_file(spark, f1, cfg, move_files=False)
    assert r1.status == "Completed", r1.error_message

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    t1 = wh.read("dim_cust").collect()
    assert len(t1) == 3
    assert sum(1 for r in t1 if r["is_current"]) == 2

    f2 = _write(
        tmp_path, "d2.csv",
        "id,ts,status\n1,2024-03-01,DONE\n3,2024-03-02,NEW\n",
    )
    r2 = process_file(spark, f2, cfg, move_files=False)
    assert r2.status == "Completed", r2.error_message

    got = sorted(
        (r["id"], r["status"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in wh.read("dim_cust").collect()
    )
    # equals the rebuild from the concatenated feed
    full_feed = spark.createDataFrame(
        [("1", "2024-01-01", "NEW"), ("1", "2024-02-01", "SHIP"),
         ("2", "2024-01-05", "NEW"), ("1", "2024-03-01", "DONE"),
         ("3", "2024-03-02", "NEW")],
        ["id", "ts", "status"],
    )
    # pipeline inference types id as INT and ts as TIMESTAMP; mirror that
    full_feed = full_feed.selectExpr(
        "CAST(id AS INT) id", "CAST(ts AS TIMESTAMP) ts", "status"
    )
    want = sorted(
        (r["id"], r["status"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_from_feed(full_feed, ["id"], "ts", ["status"]).collect()
    )
    assert got == want


def test_scd2_mode_duplicate_key_ts_last_wins(spark, tmp_path):
    cfg = _cfg(tmp_path)
    f1 = _write(
        tmp_path, "dup.csv",
        "id,ts,status\n1,2024-01-01,A\n1,2024-01-01,B\n",
    )
    r = process_file(spark, f1, cfg, move_files=False)
    assert r.status == "Completed", r.error_message
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    rows = wh.read("dim_cust").collect()
    assert len(rows) == 1 and rows[0]["status"] == "B"  # E1 last wins


def test_scd2_mode_requires_ts_column(spark, tmp_path):
    cfg = _cfg(tmp_path)
    cfg["loader"]["scd2"] = {}
    f1 = _write(tmp_path, "x.csv", "id,ts,status\n1,2024-01-01,A\n")
    r = process_file(spark, f1, cfg, move_files=False)
    assert r.status == "Failed" and "ts_column" in r.error_message
