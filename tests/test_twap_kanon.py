"""twap_by_key step semantics + k_anonymity_report exposure math."""

from __future__ import annotations

import datetime

import pytest

from nspc_etl_basic_spark.operators.privacy import k_anonymity_report
from nspc_etl_basic_spark.operators.resample import twap_by_key


def _ts(s):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def test_twap_weights_by_holding_time(spark):
    # value 10 held for 90s, value 20 held for 10s -> twap = 11
    rows = [
        ("u", _ts(0), 1, 10.0),
        ("u", _ts(90), 2, 20.0),
        ("u", _ts(100), 3, 99.0),  # terminal value carries no weight
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v double")
    (row,) = twap_by_key(df, "k", "ts", "v", order_cols=["id"]).collect()
    assert row["n_obs"] == 3
    assert row["span_seconds"] == 100
    assert row["twap"] == pytest.approx((10 * 90 + 20 * 10) / 100)


def test_twap_differs_from_plain_mean_and_degenerates(spark):
    rows = [
        ("bursty", _ts(0), 1, 0.0),
        ("bursty", _ts(1), 2, 0.0),
        ("bursty", _ts(2), 3, 0.0),
        ("bursty", _ts(100), 4, 100.0),
        ("single", _ts(5), 1, 42.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v double")
    out = {r["k"]: r for r in twap_by_key(df, "k", "ts", "v", order_cols=["id"]).collect()}
    # plain mean would be 25; step-hold weighting keeps it 0 until t=100
    assert out["bursty"]["twap"] == 0.0
    assert out["single"]["twap"] == 42.0 and out["single"]["span_seconds"] == 0


def test_k_anonymity_exposure(spark):
    rows = (
        [("a", "x")] * 10  # class of 10
        + [("a", "y")] * 3  # class of 3
        + [("b", "x")]  # class of 1
    )
    df = spark.createDataFrame(rows, "q1 string, q2 string")
    out = {r["k"]: r for r in k_anonymity_report(
        df, ["q1", "q2"], k_thresholds=(2, 5)).collect()}
    assert out[2]["k_anonymity"] == 1
    assert out[2]["n_classes"] == 3
    assert out[2]["n_classes_below"] == 1 and out[2]["rows_below"] == 1
    assert out[5]["n_classes_below"] == 2 and out[5]["rows_below"] == 4
    assert out[5]["rows_below_ppm"] == int(4 * 1_000_000 / 14)


def test_k_anonymity_validation(spark):
    df = spark.createDataFrame([("a",)], "q string")
    with pytest.raises(ValueError):
        k_anonymity_report(df, [])
    with pytest.raises(ValueError):
        k_anonymity_report(df, ["q"], k_thresholds=(1,))
