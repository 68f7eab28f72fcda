"""Extended source formats (parquet/ORC/JSONL/TSV) through the sniffer,
the all-string reader contract, and the full load pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.sources.reader import read_any
from nspc_etl_basic_spark.sources.sniffer import detect_file_type


def test_sniffer_magic_bytes_parquet_orc(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    pq_dir, orc_dir = str(tmp_path / "p"), str(tmp_path / "o")
    df.coalesce(1).write.parquet(pq_dir)
    df.coalesce(1).write.orc(orc_dir)
    import glob

    pq_file = glob.glob(f"{pq_dir}/part-*.parquet")[0]
    orc_file = glob.glob(f"{orc_dir}/part-*.orc")[0]
    assert detect_file_type(pq_file) == "parquet"
    assert detect_file_type(orc_file) == "orc"


def test_sniffer_jsonl_vs_json(tmp_path):
    jl = tmp_path / "data.txt"
    jl.write_text('{"id": 1, "v": "a"}\n{"id": 2, "v": "b"}\n')
    assert detect_file_type(str(jl)) == "jsonl"
    j = tmp_path / "doc.txt"
    j.write_text('[{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]\n')
    assert detect_file_type(str(j)) == "json"


def test_sniffer_tsv(tmp_path):
    t = tmp_path / "data.txt"
    t.write_text("id\tv\n1\ta\n2\tb\n")
    assert detect_file_type(str(t)) == "tsv"


def test_sniffer_unknown_binary_raises(tmp_path):
    b = tmp_path / "blob.bin"
    b.write_bytes(bytes(range(256)) * 4)
    with pytest.raises(ValueError):
        detect_file_type(str(b))


def test_read_any_all_string_contract_every_format(spark, tmp_path):
    """Whatever the physical format, read_any yields the same all-string
    table — the inference pass owns typing."""
    rows = [(1, "alpha", "2024-01-02 10:00:00"), (2, "beta", "2024-02-03 11:30:00")]

    tsv = tmp_path / "t.tsv"
    tsv.write_text(
        "id\tname\tcreated\n"
        + "\n".join("\t".join(map(str, r)) for r in rows)
        + "\n"
    )
    jl = tmp_path / "d.jsonl"
    jl.write_text(
        '{"id": "1", "name": "alpha", "created": "2024-01-02 10:00:00"}\n'
        '{"id": "2", "name": "beta", "created": "2024-02-03 11:30:00"}\n'
    )
    typed = spark.createDataFrame(
        [(1, "alpha", "2024-01-02 10:00:00"), (2, "beta", "2024-02-03 11:30:00")],
        "id long, name string, created string",
    ).select(
        "id", "name",
        # store a REAL timestamp in the columnar files
        F.to_timestamp("created").alias("created"),
    )
    import glob

    typed.coalesce(1).write.parquet(str(tmp_path / "pq"))
    typed.coalesce(1).write.orc(str(tmp_path / "oc"))
    pq = glob.glob(f"{tmp_path}/pq/part-*.parquet")[0]
    oc = glob.glob(f"{tmp_path}/oc/part-*.orc")[0]

    expected = {("1", "alpha", "2024-01-02 10:00:00"), ("2", "beta", "2024-02-03 11:30:00")}
    for path in (str(tsv), str(jl), pq, oc):
        df = read_any(spark, path)
        assert all(t == "string" for _, t in df.dtypes), (path, df.dtypes)
        got = {(r["id"], r["name"], r["created"]) for r in df.collect()}
        assert got == expected, path


def test_pipeline_loads_parquet_end_to_end(spark, tmp_path):
    """A parquet drop flows through the full pipeline: all-string read,
    type inference (INT/NVARCHAR/DATETIME2), warehouse write."""
    import glob

    from nspc_etl_basic_spark import load_config
    from nspc_etl_basic_spark.plans.pipeline import process_file
    from nspc_etl_basic_spark.sinks.writer import ParquetWarehouse

    src = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id long, name string"
    ).withColumn("created", F.to_timestamp(F.lit("2024-01-02 10:00:00")))
    src.coalesce(1).write.parquet(str(tmp_path / "drop"))
    pq = glob.glob(f"{tmp_path}/drop/part-*.parquet")[0]

    cfg = load_config(
        overrides={"database": {"warehouse_path": str(tmp_path / "wh")}}
    )
    r = process_file(spark, pq, cfg, move_files=False)
    assert r.status == "Completed", r.error_message
    assert r.details["sql_types"]["id"] == "INT"
    assert r.details["sql_types"]["created"] == "DATETIME2"
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    back = wh.read(r.table_name)
    assert back.count() == 2


def test_csv_quoted_embedded_newline_single_row(spark, tmp_path):
    """RFC 4180 quoted fields may contain newlines — the reference's
    pandas reader parses them as one record; so must we."""
    f = tmp_path / "embed.csv"
    f.write_text('id,note\n1,"line one\nline two"\n2,simple\n')
    df = read_any(spark, str(f))
    rows = {r["id"]: r["note"] for r in df.collect()}
    assert rows == {"1": "line one\nline two", "2": "simple"}


def test_csv_utf8_bom_stripped_from_header(spark, tmp_path):
    f = tmp_path / "bom.csv"
    f.write_bytes("﻿id,name\n1,alice\n".encode("utf-8"))
    df = read_any(spark, str(f))
    assert df.columns == ["id", "name"]
