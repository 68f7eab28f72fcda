"""As-of join (operators/asof.py): most-recent-prior match semantics,
exact-time inclusion, no-match NULLs, NULL right payloads, and per-key
isolation — checked against hand-computed expectations and pandas-style
merge_asof behavior."""

from __future__ import annotations

import datetime

from nspc_etl_basic_spark.operators.asof import asof_join


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(5)), (2, 100, _ts(10)), (3, 200, _ts(7)), (4, 300, _ts(1))],
        "id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts(3), 30.0),
            (100, _ts(8), 80.0),
            (100, _ts(11), 110.0),  # after every left row — never matched
            (200, _ts(7), 70.0),    # exact time — matched (inclusive)
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r.id: (r.ts_r, r.value_r)
        for r in asof_join(left, right, on="ts", by=["user_id"]).collect()
    }
    assert out[1] == (_ts(3), 30.0)   # latest right <= 0:05 is 0:03
    assert out[2] == (_ts(8), 80.0)   # 0:08 beats 0:03
    assert out[3] == (_ts(7), 70.0)   # exact-time match included
    assert out[4] == (None, None)     # user 300 has no right rows


def test_asof_null_payload_still_matches(spark):
    """A right row whose VALUE is NULL is still a match (struct carry —
    last(ignorenulls) must skip rows, not null fields)."""
    left = spark.createDataFrame(
        [(1, 1, _ts(5))], "id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(2), None)], "user_id long, ts timestamp, value double"
    )
    row = asof_join(left, right, on="ts", by=["user_id"]).collect()[0]
    assert row.ts_r == _ts(2) and row.value_r is None


def test_asof_keys_are_isolated(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(9)), (2, 2, _ts(9))], "id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(1), 10.0)], "user_id long, ts timestamp, value double"
    )
    out = {r.id: r.value_r for r in asof_join(left, right, by=["user_id"]).collect()}
    assert out == {1: 10.0, 2: None}


def test_asof_matches_pandas_merge_asof(spark):
    """Random-ish cross-check against pandas merge_asof (the public
    semantic contract this operator mirrors)."""
    import pandas as pd

    lrows = [(i, i % 3, _ts((i * 7) % 50 + 1)) for i in range(40)]
    rrows = [(i % 3, _ts((i * 11) % 50 + 1), float(i)) for i in range(30)]
    # dedup right per (key, ts): keep max value (mirrors the query's rule)
    rdf = (
        pd.DataFrame(rrows, columns=["user_id", "ts", "value"])
        .sort_values(["user_id", "ts", "value"])
        .groupby(["user_id", "ts"], as_index=False)
        .last()
    )
    ldf = pd.DataFrame(lrows, columns=["id", "user_id", "ts"]).sort_values("ts")
    expected = pd.merge_asof(
        ldf, rdf.sort_values("ts"), on="ts", by="user_id"
    ).set_index("id")["value"].to_dict()

    left = spark.createDataFrame(lrows, "id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [
            (int(u), t.to_pydatetime(), float(v))
            for u, t, v in rdf[["user_id", "ts", "value"]].itertuples(
                index=False, name=None
            )
        ],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r.id: r.value_r for r in asof_join(left, right, by=["user_id"]).collect()
    }
    for i in expected:
        e = expected[i]
        g = got[i]
        assert (pd.isna(e) and g is None) or e == g, (i, e, g)


def test_asof_matches_pandas_merge_asof_all_modes(spark):
    """pandas.merge_asof IS the semantic spec — compare every
    direction x allow_exact_matches x tolerance combination on a grid
    that includes exact-time collisions, gaps, and group boundaries."""
    import pandas as pd

    from nspc_etl_basic_spark.operators.asof import asof_join

    left_pd = pd.DataFrame(
        {
            "g": ["a"] * 5 + ["b"] * 4,
            "t": [1.0, 3.0, 5.0, 5.5, 9.0, 2.0, 4.0, 4.0, 8.0],
            "lv": list(range(9)),
        }
    )
    right_pd = pd.DataFrame(
        {
            "g": ["a"] * 4 + ["b"] * 3,
            "t": [1.0, 4.0, 5.5, 7.0, 2.0, 4.0, 6.0],
            "rv": [10, 40, 55, 70, 20, 40, 60],
        }
    )
    left_df = spark.createDataFrame(left_pd.assign(t=left_pd.t))
    right_df = spark.createDataFrame(right_pd)

    for direction in ("backward", "forward", "nearest"):
        for exact in (True, False):
            for tol in (None, 1.5):
                exp = pd.merge_asof(
                    left_pd.sort_values("t"),
                    right_pd.sort_values("t"),
                    on="t", by="g",
                    direction=direction,
                    allow_exact_matches=exact,
                    tolerance=tol,
                )
                got = asof_join(
                    left_df, right_df, on="t", by=["g"],
                    direction=direction, allow_exact_matches=exact,
                    tolerance=tol,
                ).collect()
                got_map = {(r.g, r.t, r.lv): r.rv_r for r in got}
                exp_map = {
                    (r.g, r.t, r.lv): (None if pd.isna(r.rv) else int(r.rv))
                    for r in exp.itertuples()
                }
                assert got_map == exp_map, (direction, exact, tol, got_map, exp_map)


def test_asof_tolerance_on_timestamps_in_seconds(spark):
    import datetime as dt

    from nspc_etl_basic_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=100))], "id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(base + dt.timedelta(seconds=40), "far"),
         (base + dt.timedelta(seconds=95), "near")],
        "ts timestamp, tag string",
    )
    hit = asof_join(left, right, on="ts", tolerance=10.0).collect()[0]
    assert hit.tag_r == "near"
    miss = asof_join(left, right, on="ts", tolerance=2.0).collect()[0]
    assert miss.tag_r is None


def test_asof_null_on_keys_never_match(spark):
    """NULL in the `on` column (either side) produces no match in ANY
    direction — under the window sort NULLs land at an edge and would
    otherwise act as a phantom earliest/latest observation (ADVICE r3);
    pandas merge_asof rejects NULL keys outright."""
    from nspc_etl_basic_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id long, t double"
    )
    right = spark.createDataFrame(
        [(5.0, "r5"), (25.0, "r25"), (None, "rnull")], "t double, tag string"
    )
    for direction in ("backward", "forward", "nearest"):
        got = {
            r.id: r.tag_r
            for r in asof_join(
                left, right, on="t", direction=direction
            ).collect()
        }
        # the NULL left row is unmatched everywhere; the NULL right row
        # is never anyone's match
        assert got[2] is None, (direction, got)
        assert "rnull" not in got.values(), (direction, got)
    # and the non-null rows still match correctly
    fwd = {
        r.id: r.tag_r
        for r in asof_join(left, right, on="t", direction="forward").collect()
    }
    assert fwd[1] == "r25" and fwd[3] is None
    bwd = {
        r.id: r.tag_r
        for r in asof_join(left, right, on="t", direction="backward").collect()
    }
    assert bwd[1] == "r5" and bwd[3] == "r25"
