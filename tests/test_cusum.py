"""cusum_alarms: detects an injected mean shift shortly after onset,
stays quiet on stationary series, and is partition-layout independent."""

from __future__ import annotations

import datetime

from nspc_etl_basic_spark.operators.trend import cusum_alarms


def _ts(i):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i)


def _df(spark, series):
    rows = [
        (k, _ts(i), i, float(v))
        for k, vs in series.items()
        for i, v in enumerate(vs)
    ]
    return spark.createDataFrame(
        rows, "k string, ts timestamp, eid long, v double"
    )


def _run(df, **kw):
    return {
        r["k"]: r
        for r in cusum_alarms(
            df, "k", "ts", "v", order_cols=["eid"], **kw
        ).collect()
    }


def test_detects_shift_and_stays_quiet_on_stationary(spark):
    # alternating ±1 around 0, then a +3 level shift at i=60
    shifted = [(-1) ** i for i in range(60)] + [
        3 + (-1) ** i for i in range(40)
    ]
    quiet = [(-1) ** i for i in range(100)]
    out = _run(_df(spark, {"shifted": shifted, "quiet": quiet}))
    assert out["quiet"]["n_alarms"] == 0
    assert out["quiet"]["first_alarm_ts"] is None
    s = out["shifted"]
    assert s["n_alarms"] > 0
    # first alarm lands after the shift, within a handful of samples
    assert _ts(60) <= s["first_alarm_ts"] <= _ts(75)


def test_sustained_shift_counts_one_crossing(spark):
    # once shifted, the un-reset statistic stays above h for the rest of
    # the series: rising-edge counting reports ONE alarm episode, not
    # one per in-alarm observation
    shifted = [(-1) ** i for i in range(60)] + [
        3 + (-1) ** i for i in range(40)
    ]
    s = _run(_df(spark, {"shifted": shifted}))["shifted"]
    assert s["n_alarms"] == 1


def test_two_episodes_count_two_crossings(spark):
    # shift up (statistic climbs over h), deep negative run (P falls so
    # far the running-min re-anchors and s drops back under h), shift up
    # again -> exactly two rising edges
    up = [3 + (-1) ** i for i in range(40)]
    down = [-6 + (-1) ** i for i in range(80)]
    series = (
        [(-1) ** i for i in range(60)] + up + down + up
    )
    s = _run(_df(spark, {"g": series}))["g"]
    assert s["n_alarms"] == 2


def test_layout_independent(spark):
    series = {"g": [((i * 13) % 7) - 3 for i in range(200)]}
    df = _df(spark, series)
    a = _run(df)["g"]
    b = _run(df.repartition(11))["g"]
    assert tuple(a) == tuple(b)


def test_constant_series_has_no_params_row(spark):
    # zero variance -> h == 0 -> group filtered from the alarm walk
    out = _run(_df(spark, {"flat": [5.0] * 20}))
    assert "flat" not in out
