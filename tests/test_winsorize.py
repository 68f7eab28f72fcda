"""winsorize: every clipped value equals clamp(v, lo, hi) for the
group's histogram-quantile bounds, and bounds come from the group's own
data."""

from __future__ import annotations

import pytest

from nspc_etl_basic_spark.operators.sketches import (
    histogram_quantiles,
    winsorize,
)


def _bounds(df, lo_q=0.05, hi_q=0.95):
    hq = histogram_quantiles(df, "v", "grp", qs=(lo_q, hi_q), bins=64)
    out = {}
    for r in hq.collect():
        out.setdefault(r["grp"], {})[r["q"]] = r["est"]
    return out


def test_clipped_equals_clamp_against_hist_bounds(spark):
    rows = [("g", float(v)) for v in range(1, 101)] + [
        ("g", 1e4),
        ("g", -1e4),
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    b = _bounds(df)["g"]
    lo, hi = b[0.05], b[0.95]
    assert lo < hi
    got = {r["v"]: r["clipped"] for r in winsorize(df, "v", "grp").collect()}
    for v, c in got.items():
        assert c == min(max(v, lo), hi)
    # the outliers really were pulled in
    assert got[1e4] == hi and got[-1e4] == lo


def test_groups_clip_independently(spark):
    rows = [("a", float(v)) for v in range(100)] + [
        ("b", float(v) * 1000) for v in range(100)
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    bs = _bounds(df)
    assert bs["b"][0.95] > 100 * bs["a"][0.95]
    got = {}
    for r in winsorize(df, "v", "grp").collect():
        got.setdefault(r["grp"], {})[r["v"]] = r["clipped"]
    for g in ("a", "b"):
        lo, hi = bs[g][0.05], bs[g][0.95]
        for v, c in got[g].items():
            assert c == min(max(v, lo), hi)


def test_validation(spark):
    df = spark.createDataFrame([("g", 1.0)], "grp string, v double")
    with pytest.raises(ValueError):
        winsorize(df, "v", "grp", lo_q=0.9, hi_q=0.1)
