"""JDBC sink (sinks/writer.jdbc_write) against embedded Apache Derby —
the JDBC driver Spark itself ships for the Hive metastore, so the test
runs with no extra dependencies. Covers the reference's primary sink
path: create-with-DDL (createTableColumnTypes from H1 inference), write,
read-back, append, and the H1->Spark DDL translation."""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest

from nspc_etl_basic_spark.sinks.writer import h1_to_spark_ddl, jdbc_write

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/derbydb;create=true"


def _opts():
    return {"driver": DERBY_DRIVER}


def test_h1_to_spark_ddl_translation():
    # Spark validates createTableColumnTypes with its own parser: the
    # reference's SQL Server spellings must map to Spark DDL
    assert h1_to_spark_ddl("NVARCHAR(50)") == "VARCHAR(50)"
    assert h1_to_spark_ddl("NVARCHAR(255)") == "VARCHAR(255)"
    assert h1_to_spark_ddl("DATETIME2") == "TIMESTAMP"
    assert h1_to_spark_ddl("DECIMAL(18,4)") == "DECIMAL(18,4)"
    assert h1_to_spark_ddl("INT") == "INT"


def test_jdbc_roundtrip_with_h1_ddl(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "alpha", Decimal("10.5000"), datetime.datetime(2024, 1, 2, 3, 4, 5)),
            (2, "beta", Decimal("7.0000"), datetime.datetime(2024, 2, 3, 0, 0, 0)),
        ],
        "id long, name string, amount decimal(18,4), ts timestamp",
    )
    url = _derby_url(tmp_path)
    sql_types = {
        "id": "INT",
        "name": "NVARCHAR(50)",
        "amount": "DECIMAL(18,4)",
        "ts": "DATETIME2",
    }
    jdbc_write(
        df.coalesce(1), url, "loaded", mode="drop_recreate",
        sql_types=sql_types, options=_opts(),
    )
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "loaded")
        .option("driver", DERBY_DRIVER)
        .load()
        .orderBy("id")
    )
    rows = back.collect()
    assert [(r.id, r.name, r.amount, r.ts) for r in rows] == [
        (1, "alpha", Decimal("10.5000"), datetime.datetime(2024, 1, 2, 3, 4, 5)),
        (2, "beta", Decimal("7.0000"), datetime.datetime(2024, 2, 3, 0, 0, 0)),
    ]
    # DDL parity observable: the NVARCHAR(50) bucket became a bounded
    # VARCHAR — an over-length insert must be rejected by the database
    too_long = spark.createDataFrame(
        [(3, "x" * 80, Decimal("1.0000"), datetime.datetime(2024, 1, 1))],
        "id long, name string, amount decimal(18,4), ts timestamp",
    )
    with pytest.raises(Exception):
        jdbc_write(too_long.coalesce(1), url, "loaded", mode="append", options=_opts())


def test_jdbc_append_and_fail_modes(spark, tmp_path):
    url = _derby_url(tmp_path)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    jdbc_write(df.coalesce(1), url, "t2", mode="drop_recreate", options=_opts())
    jdbc_write(
        spark.createDataFrame([(2, "b")], "id long, v string").coalesce(1),
        url, "t2", mode="append", options=_opts(),
    )
    back = (
        spark.read.format("jdbc")
        .option("url", url).option("dbtable", "t2")
        .option("driver", DERBY_DRIVER).load()
    )
    assert sorted((r.id, r.v) for r in back.collect()) == [(1, "a"), (2, "b")]
    with pytest.raises(Exception):
        jdbc_write(df.coalesce(1), url, "t2", mode="fail", options=_opts())
