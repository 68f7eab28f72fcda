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


# ---------------------------------------------------------------------------
# keyed upsert: staging + server-side MERGE (sinks/jdbc_merge.py)
# ---------------------------------------------------------------------------

def _read_back(spark, url, table):
    return (
        spark.read.format("jdbc")
        .option("url", url).option("dbtable", table)
        .option("driver", DERBY_DRIVER).load()
    )


def test_jdbc_upsert_creates_then_merges(spark, tmp_path):
    from nspc_etl_basic_spark.sinks.jdbc_merge import jdbc_upsert

    url = _derby_url(tmp_path)
    first = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, name string, score long"
    )
    c1 = jdbc_upsert(spark, first.coalesce(1), url, "scores", ["id"], options=_opts())
    assert (c1.inserted, c1.updated) == (2, 0)

    # second batch: one update (id=2 changes), one insert (id=3)
    second = spark.createDataFrame(
        [(2, "b2", 25), (3, "c", 30)], "id long, name string, score long"
    )
    c2 = jdbc_upsert(spark, second.coalesce(1), url, "scores", ["id"], options=_opts())
    assert (c2.inserted, c2.updated) == (1, 1)

    rows = sorted(
        (r.id, r.name, r.score) for r in _read_back(spark, url, "scores").collect()
    )
    assert rows == [(1, "a", 10), (2, "b2", 25), (3, "c", 30)]
    # staging table must be gone
    import pytest as _pt
    with _pt.raises(Exception):
        _read_back(spark, url, "scores_stg").collect()


def test_jdbc_upsert_last_wins_within_batch(spark, tmp_path):
    from nspc_etl_basic_spark.sinks.jdbc_merge import jdbc_upsert

    url = _derby_url(tmp_path)
    base = spark.createDataFrame([(1, "old")], "id long, v string")
    jdbc_upsert(spark, base.coalesce(1), url, "lw", ["id"], options=_opts())

    # duplicate key inside one batch: the LAST occurrence wins (E1), and
    # the split counts the key once
    batch = spark.createDataFrame(
        [(1, "mid"), (1, "new"), (2, "x")], "id long, v string"
    )
    from pyspark.sql import functions as F
    batch = batch.withColumn("__seq", F.monotonically_increasing_id())
    c = jdbc_upsert(spark, batch.coalesce(1), url, "lw", ["id"], options=_opts())
    assert (c.inserted, c.updated) == (1, 1)
    rows = sorted((r.id, r.v) for r in _read_back(spark, url, "lw").collect())
    assert rows == [(1, "new"), (2, "x")]


def test_render_merge_sql_dialects_and_injection_guard():
    from nspc_etl_basic_spark.sinks.jdbc_merge import render_merge_sql

    ansi = render_merge_sql("tgt", "stg", ["id", "v"], ["id"])
    assert ansi == (
        'MERGE INTO tgt t USING stg s ON (t."id" = s."id")'
        ' WHEN MATCHED THEN UPDATE SET t."v" = s."v"'
        ' WHEN NOT MATCHED THEN INSERT ("id", "v") VALUES (s."id", s."v")'
    )
    mssql = render_merge_sql("tgt", "stg", ["id", "v"], ["id"], dialect="sqlserver")
    assert "WITH (HOLDLOCK)" in mssql and mssql.endswith(";")
    # all-key table: no WHEN MATCHED clause
    allkey = render_merge_sql("tgt", "stg", ["id"], ["id"])
    assert "WHEN MATCHED" not in allkey
    import pytest as _pt
    with _pt.raises(ValueError):
        render_merge_sql("tgt; DROP TABLE x", "stg", ["id"], ["id"])


def test_process_file_routes_to_jdbc(spark, tmp_path):
    """End-to-end reference deployment shape: process_file with
    database.type=jdbc lands data in the DATABASE (insert then keyed
    upsert with true counts), while metadata stays in the warehouse."""
    from nspc_etl_basic_spark import load_config
    from nspc_etl_basic_spark.plans.pipeline import process_file

    url = _derby_url(tmp_path)
    cfg = load_config(
        overrides={
            "database": {
                "type": "jdbc",
                "url": url,
                "driver": DERBY_DRIVER,
                "warehouse_path": str(tmp_path / "wh"),
            },
            "loader": {"table_mode": "upsert", "primary_key_columns": ["id"]},
        }
    )

    f1 = tmp_path / "items.csv"
    f1.write_text("id,name,amount\n1,alpha,10.5\n2,beta,20.25\n")
    r1 = process_file(spark, str(f1), cfg, move_files=False)
    assert r1.status == "Completed", r1.error_message
    assert (r1.rows_inserted, r1.rows_updated) == (2, 0)

    # second file: update id=2, insert id=3 — and the EXISTING JDBC
    # table's schema governs the cast
    f2 = tmp_path / "items2.csv"
    f2.write_text("id,name,amount\n2,beta2,21.0\n3,gamma,30.0\n")
    cfg2 = dict(cfg)
    cfg2["override_table_name"] = r1.table_name
    r2 = process_file(spark, str(f2), cfg2, move_files=False)
    assert r2.status == "Completed", r2.error_message
    assert (r2.rows_inserted, r2.rows_updated) == (1, 1)

    back = _read_back(spark, url, r1.table_name).orderBy("id").collect()
    assert [(r[0], r[1]) for r in back] == [(1, "alpha"), (2, "beta2"), (3, "gamma")]

    # strict upsert of a bad value into the typed table -> Failed, target unchanged
    f3 = tmp_path / "items3.csv"
    f3.write_text("id,name,amount\nnotanint,x,1.0\n")
    r3 = process_file(spark, str(f3), cfg2, move_files=False)
    assert r3.status == "Failed"
    assert _read_back(spark, url, r1.table_name).count() == 3


def test_jdbc_upsert_with_credentials_options(spark, tmp_path):
    """user/password in options flow through to the driver-side
    DriverManager connection (ADVICE r3: url-only getConnection fails on
    any authenticated target). Embedded Derby accepts-and-ignores
    credentials, so this exercises the two-arg overload end to end."""
    from nspc_etl_basic_spark.sinks.jdbc_merge import jdbc_upsert

    url = _derby_url(tmp_path)
    opts = {**_opts(), "user": "app", "password": "secret"}
    first = spark.createDataFrame([(1, "a")], "id long, v string")
    c1 = jdbc_upsert(spark, first.coalesce(1), url, "authed", ["id"], options=opts)
    assert (c1.inserted, c1.updated) == (1, 0)
    c2 = jdbc_upsert(
        spark,
        spark.createDataFrame([(1, "a2"), (2, "b")], "id long, v string").coalesce(1),
        url, "authed", ["id"], options=opts,
    )
    assert (c2.inserted, c2.updated) == (1, 1)


def test_introspect_sql_types_matches_target_ddl(spark, tmp_path):
    """When the caller has no stored H1 DDL, the staging table's types
    come from the live target's JDBC metadata — sized VARCHARs keep
    their length instead of degrading to CLOB (ADVICE r3)."""
    from nspc_etl_basic_spark.sinks.jdbc_merge import (
        _connect,
        introspect_sql_types,
        jdbc_upsert,
    )

    url = _derby_url(tmp_path)
    df = spark.createDataFrame(
        [(1, "alpha", Decimal("10.5000"))],
        "id long, name string, amount decimal(18,4)",
    )
    jdbc_write(
        df, url, "typed", mode="drop_recreate",
        sql_types={"id": "BIGINT", "name": "NVARCHAR(50)",
                   "amount": "DECIMAL(18,4)"},
        options=_opts(),
    )
    conn = _connect(spark, url, DERBY_DRIVER)
    try:
        types = introspect_sql_types(conn, "typed")
    finally:
        conn.close()
    assert types["name"] == "VARCHAR(50)"
    assert types["id"] == "BIGINT"
    assert types["amount"] == "DECIMAL(18,4)"

    # and jdbc_upsert uses them for staging even with sql_types=None
    c = jdbc_upsert(
        spark,
        spark.createDataFrame(
            [(2, "beta", Decimal("1.0000"))],
            "id long, name string, amount decimal(18,4)",
        ).coalesce(1),
        url, "typed", ["id"], sql_types=None, options=_opts(),
    )
    assert (c.inserted, c.updated) == (1, 0)
