"""resample_ffill (operators/resample.py) vs pandas
``resample().last().ffill()`` — the semantics source of truth."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.resample import resample_ffill


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 3, 1, h, m, s)


def test_gap_fill_known_scenario(spark):
    rows = [
        ("a", _ts(0, 10), 1.0),   # bucket 00
        ("a", _ts(0, 50), 2.0),   # bucket 00 (later -> wins)
        ("a", _ts(3, 5), None),   # NULL observation: ignored
        ("a", _ts(4, 0), 9.0),    # bucket 04; buckets 01-03 filled w/ 2.0
        ("b", _ts(2, 0), 7.0),    # single-bucket key
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = resample_ffill(df, "k", "ts", "v", step_seconds=3600)
    got = {
        (r["k"], r["grid_epoch"]): (r["v"], r["is_observed"])
        for r in out.collect()
    }
    base = int(_ts(0).replace(tzinfo=dt.timezone.utc).timestamp())
    assert got == {
        ("a", base): (2.0, True),
        ("a", base + 3600): (2.0, False),
        ("a", base + 7200): (2.0, False),
        ("a", base + 10800): (2.0, False),
        ("a", base + 14400): (9.0, True),
        ("b", base + 7200): (7.0, True),
    }


def test_matches_pandas_resample_last_ffill(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for k in ("x", "y", "z"):
        t = dt.datetime(2024, 5, 1)
        for _ in range(40):
            t = t + dt.timedelta(minutes=int(rng.randint(30, 60 * 20)))
            rows.append((k, t, float(rng.randn())))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = resample_ffill(df, "k", "ts", "v", step_seconds=21600)
    got = {
        (r["k"], r["grid_epoch"]): r["v"] for r in out.collect()
    }

    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    want = {}
    for k, g in pdf.groupby("k"):
        # 6h divides 24h, so pandas' day-aligned buckets == epoch-aligned
        r = g.set_index("ts")["v"].resample("6h").last().ffill()
        for t, v in r.items():
            want[(k, int(t.replace(tzinfo=dt.timezone.utc).timestamp()))] = v
    assert got.keys() == want.keys()
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=0), key


def test_validation(spark):
    df = spark.createDataFrame(
        [("a", _ts(1), 1.0)], "k string, ts timestamp, v double"
    )
    with pytest.raises(ValueError):
        resample_ffill(df, "k", "ts", "v", step_seconds=0)


def test_interpolate_known_scenario(spark):
    from nspc_etl_basic_spark.operators.resample import resample_interpolate

    rows = [
        ("a", _ts(0, 30), 10.0),  # bucket 00
        ("a", _ts(4, 10), 2.0),   # bucket 04; 01-03 interpolate 8,6,4
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = resample_interpolate(df, "k", "ts", "v", step_seconds=3600)
    base = int(_ts(0).replace(tzinfo=dt.timezone.utc).timestamp())
    got = {r["grid_epoch"]: (r["v"], r["is_observed"]) for r in out.collect()}
    assert got == {
        base: (10.0, True),
        base + 3600: (8.0, False),
        base + 7200: (6.0, False),
        base + 10800: (4.0, False),
        base + 14400: (2.0, True),
    }


def test_interpolate_matches_pandas(spark):
    import numpy as np

    from nspc_etl_basic_spark.operators.resample import resample_interpolate

    rng = np.random.RandomState(11)
    rows = []
    for k in ("x", "y"):
        t = dt.datetime(2024, 5, 1)
        for _ in range(30):
            t = t + dt.timedelta(minutes=int(rng.randint(30, 60 * 18)))
            rows.append((k, t, float(rng.randn())))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = resample_interpolate(df, "k", "ts", "v", step_seconds=21600)
    got = {(r["k"], r["grid_epoch"]): r["v"] for r in out.collect()}

    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    want = {}
    for k, g in pdf.groupby("k"):
        r = (
            g.set_index("ts")["v"].resample("6h").last()
            .interpolate("linear")
        )
        for t, v in r.items():
            want[(k, int(t.replace(tzinfo=dt.timezone.utc).timestamp()))] = v
    assert got.keys() == want.keys()
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=1e-6), key


def test_ewma_matches_pandas(spark):
    import numpy as np

    from nspc_etl_basic_spark.operators.resample import ewma_by_key

    rng = np.random.RandomState(3)
    rows = []
    for k in ("x", "y"):
        t = dt.datetime(2024, 5, 1)
        for _ in range(25):
            t = t + dt.timedelta(minutes=int(rng.randint(5, 500)))
            rows.append((k, t, float(rng.randn())))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        r["k"]: (r["n_obs"], r["ewma"])
        for r in ewma_by_key(df, "k", "ts", "v", alpha=0.3).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    for k, g in pdf.groupby("k"):
        want = (
            g.sort_values("ts")["v"].ewm(alpha=0.3, adjust=False).mean()
            .iloc[-1]
        )
        n, ew = got[k]
        assert n == len(g)
        assert ew == pytest.approx(want, abs=1e-6), k


def test_ewma_validation_and_single_obs(spark):
    from nspc_etl_basic_spark.operators.resample import ewma_by_key

    df = spark.createDataFrame(
        [("a", _ts(1), 5.0)], "k string, ts timestamp, v double"
    )
    out = ewma_by_key(df, "k", "ts", "v").collect()
    assert out[0]["ewma"] == 5.0 and out[0]["n_obs"] == 1
    with pytest.raises(ValueError):
        ewma_by_key(df, "k", "ts", "v", alpha=0.0)
