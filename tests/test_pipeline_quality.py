"""Pipeline-integrated quality gate: quality.checks run on the valid
rows, results land in EtlQualityCheck, action=fail aborts before the
sink with the target untouched."""

from __future__ import annotations

import nspc_etl_basic_spark as eng
from nspc_etl_basic_spark.plans.pipeline import process_file
from nspc_etl_basic_spark.sinks.metadata import MetadataStore
from nspc_etl_basic_spark.sinks.writer import ParquetWarehouse


def _csv(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


CSV = "id,qty\n1,5\n2,7\n3,200\n"


def _cfg(tmp_path, action):
    return eng.load_config(
        overrides={
            "database": {"warehouse_path": str(tmp_path / "wh")},
            "quality": {
                "action": action,
                "checks": [
                    {"name": "id_unique", "type": "uniqueness",
                     "columns": ["id"], "lo": 1.0},
                    {"name": "qty_max", "type": "max", "column": "qty",
                     "hi": 100.0},
                ],
            },
        }
    )


def test_quality_log_records_and_loads(spark, tmp_path):
    cfg = _cfg(tmp_path, "log")
    res = process_file(
        spark, _csv(tmp_path, "a.csv", CSV), cfg, move_files=False
    )
    assert res.status == "Completed"
    assert res.details["quality"] == {"id_unique": 1.0, "qty_max": 200.0}

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    meta = MetadataStore(wh, cfg)
    q = {r["CheckName"]: r for r in meta.read_quality_results().collect()}
    assert q["id_unique"]["Passed"] is True
    assert q["qty_max"]["Passed"] is False and q["qty_max"]["Value"] == 200.0
    # log action: the load went through despite the violation
    assert wh.exists(res.table_name)


def test_quality_fail_aborts_before_sink(spark, tmp_path):
    cfg = _cfg(tmp_path, "fail")
    res = process_file(
        spark, _csv(tmp_path, "b.csv", CSV), cfg, move_files=False
    )
    assert res.status == "Failed"
    assert "qty_max" in (res.error_message or "")

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    # target untouched; the violating results ARE recorded
    assert not wh.exists(res.table_name)
    meta = MetadataStore(wh, cfg)
    assert meta.read_quality_results().count() == 2


def test_quality_fail_passes_clean_file(spark, tmp_path):
    cfg = _cfg(tmp_path, "fail")
    res = process_file(
        spark, _csv(tmp_path, "c.csv", "id,qty\n1,5\n2,7\n"), cfg,
        move_files=False,
    )
    assert res.status == "Completed"
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    assert wh.exists(res.table_name)
