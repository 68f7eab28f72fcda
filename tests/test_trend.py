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


def test_welch_t_matches_scipy_free_reference(spark):
    """Welch t vs a hand-rolled numpy reference (no scipy in env)."""
    import numpy as np

    from nspc_etl_basic_spark.operators.trend import welch_t

    a = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    b = [4.0, 5.0, 6.0, 7.0, 9.0]
    rows = [("g", v, True) for v in a] + [("g", v, False) for v in b]
    df = spark.createDataFrame(rows, "k string, v double, flag boolean")
    (row,) = welch_t(df, "k", "v", "flag").collect()
    va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
    sea, seb = va / len(a), vb / len(b)
    t = (np.mean(a) - np.mean(b)) / np.sqrt(sea + seb)
    dfw = (sea + seb) ** 2 / (sea**2 / (len(a) - 1) + seb**2 / (len(b) - 1))
    assert row["n_a"] == 6 and row["n_b"] == 5
    assert row["t_stat"] == pytest.approx(t, abs=1e-6)
    assert row["df"] == pytest.approx(dfw, abs=1e-4)
    assert row["significant"] == (abs(t) > 1.959964)


def test_welch_t_degenerate_sides(spark):
    from nspc_etl_basic_spark.operators.trend import welch_t

    rows = [("one_side", 1.0, True), ("one_side", 2.0, True),
            ("tiny", 1.0, True), ("tiny", 2.0, False),
            ("zerovar", 3.0, True), ("zerovar", 3.0, True),
            ("zerovar", 3.0, False), ("zerovar", 3.0, False)]
    df = spark.createDataFrame(rows, "k string, v double, flag boolean")
    out = {r["k"]: r for r in welch_t(df, "k", "v", "flag").collect()}
    assert out["one_side"]["t_stat"] is None    # n_b == 0
    assert out["tiny"]["t_stat"] is None        # n == 1 per side
    assert out["zerovar"]["t_stat"] is None     # se sum == 0
