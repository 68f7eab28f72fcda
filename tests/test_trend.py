"""grouped_ols: matches numpy least squares, handles degenerate groups,
is partition-layout independent (the decimal-sufficient-stats claim)."""

from __future__ import annotations

import datetime

import numpy as np
import pytest

from nspc_etl_basic_spark.operators.trend import grouped_ols


def _ts(s):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k string, ts timestamp, v double"
    )


def test_matches_numpy_polyfit(spark):
    xs = [0, 60, 120, 180, 240, 300]
    ys = [1.0, 2.1, 2.9, 4.2, 4.8, 6.1]
    df = _df(spark, [("g", _ts(x), y) for x, y in zip(xs, ys)])
    (row,) = grouped_ols(df, "k", "ts", "v").collect()
    slope, intercept = np.polyfit(np.array(xs, dtype=float), ys, 1)
    assert row["n"] == 6
    assert row["slope"] == pytest.approx(slope, abs=1e-8)
    assert row["intercept"] == pytest.approx(intercept, abs=1e-6)
    r = np.corrcoef(xs, ys)[0, 1]
    assert row["r2"] == pytest.approx(r * r, abs=1e-8)


def test_degenerate_groups(spark):
    rows = [
        ("one_point", _ts(0), 5.0),
        ("const_x", _ts(0), 1.0),
        ("const_x", _ts(0), 3.0),
        ("const_y", _ts(0), 2.0),
        ("const_y", _ts(100), 2.0),
    ]
    out = {r["k"]: r for r in grouped_ols(_df(spark, rows), "k", "ts", "v").collect()}
    assert out["one_point"]["slope"] is None
    assert out["const_x"]["slope"] is None
    assert out["const_y"]["slope"] == 0.0
    assert out["const_y"]["r2"] is None  # zero y-variance


def test_partition_layout_independent(spark):
    rows = [("g", _ts(i * 7), float((i * 37) % 11)) for i in range(200)]
    df = _df(spark, rows)
    a = grouped_ols(df, "k", "ts", "v").collect()[0]
    b = grouped_ols(df.repartition(17), "k", "ts", "v").collect()[0]
    assert tuple(a) == tuple(b)
