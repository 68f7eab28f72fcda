"""pseudonymize: joinability under a shared salt, unlinkability across
salts, null passthrough, collision-guard validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.privacy import pseudonymize


def test_same_salt_preserves_joinability(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, a string")
    b = spark.createDataFrame([(1, "p"), (3, "q")], "id long, b string")
    ta = pseudonymize(a, ["id"], salt="k")
    tb = pseudonymize(b, ["id"], salt="k")
    j = ta.join(tb, "id").collect()
    assert len(j) == 1 and j[0]["a"] == "x" and j[0]["b"] == "p"


def test_salt_rotation_unlinks(spark):
    a = spark.createDataFrame([(1,)], "id long")
    t1 = pseudonymize(a, ["id"], salt="k1").collect()[0]["id"]
    t2 = pseudonymize(a, ["id"], salt="k2").collect()[0]["id"]
    assert t1 != t2
    assert len(t1) == 64  # full sha256 hex


def test_null_ids_stay_null(spark):
    a = spark.createDataFrame([(None,), (1,)], "id long")
    toks = [r["id"] for r in pseudonymize(a, ["id"], salt="k").collect()]
    assert None in toks
    assert sum(t is not None for t in toks) == 1


def test_token_prefix_and_guard(spark):
    a = spark.createDataFrame([(1,)], "id long")
    t = pseudonymize(a, ["id"], salt="k", token_hex_len=16).collect()[0]["id"]
    assert len(t) == 16
    with pytest.raises(ValueError):
        pseudonymize(a, ["id"], salt="k", token_hex_len=8)


def test_raw_ids_absent_from_output(spark):
    a = spark.createDataFrame([(12345678901,)], "id long")
    out = pseudonymize(a, ["id"], salt="k")
    assert out.where(F.col("id") == "12345678901").count() == 0
