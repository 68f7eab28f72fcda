"""Schema evolution (writer.evolve_schema / ParquetWarehouse.
append_evolve): lossless widening lattice, null-extension both ways,
plain-append fast path when nothing changes, loud refusal otherwise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nspc_etl_basic_spark.sinks.writer import (
    ParquetWarehouse,
    SchemaEvolutionError,
    _join_type,
    evolve_schema,
)


def test_join_type_lattice():
    assert _join_type(T.IntegerType(), T.LongType()) == T.LongType()
    assert _join_type(T.LongType(), T.ShortType()) == T.LongType()
    assert _join_type(T.FloatType(), T.DoubleType()) == T.DoubleType()
    assert _join_type(T.IntegerType(), T.DoubleType()) == T.DoubleType()
    assert _join_type(T.NullType(), T.StringType()) == T.StringType()
    assert _join_type(
        T.DecimalType(10, 2), T.DecimalType(12, 4)
    ) == T.DecimalType(12, 4)  # max int digits 8 + max scale 4
    with pytest.raises(SchemaEvolutionError):
        _join_type(T.LongType(), T.DoubleType())  # lossy
    with pytest.raises(SchemaEvolutionError):
        _join_type(T.StringType(), T.LongType())  # incompatible


def test_evolve_schema_report():
    cur = T.StructType(
        [
            T.StructField("a", T.IntegerType(), False),
            T.StructField("b", T.StringType(), True),
        ]
    )
    inc = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("c", T.DoubleType(), True),
        ]
    )
    target, rep = evolve_schema(cur, inc)
    assert [f.name for f in target.fields] == ["a", "b", "c"]
    assert target["a"].dataType == T.LongType()
    assert rep["added"] == ["c"]
    assert rep["widened"] == [("a", "int", "bigint")]


def test_append_evolve_round_trip(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    first = spark.createDataFrame([(1, "x")], "k int, s string")
    batch = spark.createDataFrame([(2, 2.5)], "k long, v double")
    wh.write(first, "t")
    rep = wh.append_evolve(batch, "t")
    assert rep["rewrite"] is True
    assert rep["added"] == ["v"]
    out = wh.read("t")
    assert dict(out.dtypes)["k"] == "bigint"
    rows = {r["k"]: (r["s"], r["v"]) for r in out.collect()}
    assert rows == {1: ("x", None), 2: (None, 2.5)}


def test_append_evolve_same_schema_is_plain_append(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.write(spark.createDataFrame([(1, "x")], "k long, s string"), "t")
    v_before = wh.current_version("t")
    rep = wh.append_evolve(
        spark.createDataFrame([(2, "y")], "k long, s string"), "t"
    )
    assert rep["rewrite"] is False and rep["added"] == []
    # no new snapshot version: files landed inside the current one
    assert wh.current_version("t") == v_before
    assert wh.read("t").count() == 2


def test_append_evolve_refuses_narrowing(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.write(spark.createDataFrame([(1,)], "k long"), "t")
    with pytest.raises(SchemaEvolutionError):
        wh.append_evolve(
            spark.createDataFrame([("zz",)], "k string"), "t"
        )
    # table untouched by the refused append
    assert [r["k"] for r in wh.read("t").collect()] == [1]


def test_append_evolve_missing_column_null_fills(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.write(spark.createDataFrame([(1, "x")], "k long, s string"), "t")
    rep = wh.append_evolve(spark.createDataFrame([(2,)], "k long"), "t")
    # schema unchanged (s already nullable) -> fast path, batch null-fills
    assert rep["rewrite"] is False
    rows = {r["k"]: r["s"] for r in wh.read("t").collect()}
    assert rows == {1: "x", 2: None}


def test_append_evolve_creates_missing_table(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    rep = wh.append_evolve(spark.createDataFrame([(1,)], "k long"), "t")
    assert rep["added"] == ["k"]
    assert wh.read("t").count() == 1
