"""referential_check / referential_suite + sequences.transition_counts."""

from __future__ import annotations

import pytest

from nspc_etl_basic_spark.operators.quality import (
    referential_check,
    referential_suite,
)
from nspc_etl_basic_spark.operators.sequences import transition_counts


def test_referential_counts_split_nulls_from_orphans(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    (row,) = referential_check(
        child, parent, ["fk"], ["pk"], relation="c->p"
    ).collect()
    assert (
        row["relation"],
        row["child_rows"],
        row["null_fk_rows"],
        row["orphan_rows"],
    ) == ("c->p", 4, 1, 1)


def test_referential_composite_key_any_null_is_null_fk(spark):
    child = spark.createDataFrame(
        [(1, "a"), (1, None), (2, "b")], "k1 long, k2 string"
    )
    parent = spark.createDataFrame([(1, "a")], "p1 long, p2 string")
    (row,) = referential_check(
        child, parent, ["k1", "k2"], ["p1", "p2"]
    ).collect()
    assert row["null_fk_rows"] == 1 and row["orphan_rows"] == 1


def test_referential_suite_unions_and_validates(spark):
    child = spark.createDataFrame([(1,)], "fk long")
    parent = spark.createDataFrame([(1,)], "pk long")
    out = referential_suite(
        [
            (child, parent, ["fk"], ["pk"], "r1"),
            (child, parent.limit(0), ["fk"], ["pk"], "r2"),
        ]
    ).collect()
    by_rel = {r["relation"]: r["orphan_rows"] for r in out}
    assert by_rel == {"r1": 0, "r2": 1}
    with pytest.raises(ValueError):
        referential_suite([])
    with pytest.raises(ValueError):
        referential_check(child, parent, ["fk"], [])


def test_transition_counts_matrix(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
        (2, 1, "a"), (2, 2, "b"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, ev string")
    out = {
        (r["from_event"], r["to_event"]): (r["cnt"], r["prob"])
        for r in transition_counts(df, "k", "ts", "ev").collect()
    }
    # a->b twice (both keys), b->a once; a row-normalizes to 1.0
    assert out[("a", "b")] == (2, 1.0)
    assert out[("b", "a")] == (1, 1.0)
    assert ("a", "a") not in out
    # transitions never cross keys: key 1 ends with 'a', key 2 starts
    # with 'a' — no ('a','a') pair appeared above


def test_transition_tie_break_is_deterministic(spark):
    rows = [(1, 5, 10, "x"), (1, 5, 11, "y"), (1, 6, 12, "z")]
    df = spark.createDataFrame(rows, "k long, ts long, id long, ev string")
    out = {
        (r["from_event"], r["to_event"])
        for r in transition_counts(
            df, "k", "ts", "ev", order_cols=["id"]
        ).collect()
    }
    assert out == {("x", "y"), ("y", "z")}


def test_cooccurrence_pairs_counts_and_cut(spark):
    from nspc_etl_basic_spark.operators.sequences import cooccurrence_pairs

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (3, "b"),  # duplicate item in basket must not inflate support
    ]
    df = spark.createDataFrame(rows, "bk long, it string")
    out = [tuple(r) for r in cooccurrence_pairs(df, "bk", "it", top_k=2).collect()]
    assert out[0] == ("a", "b", 3)
    assert out[1] in (("a", "c", 1), ("b", "c", 1))
    assert out[1] == ("a", "c", 1)  # tie broken by (item_a, item_b)


def test_rolling_time_agg_frame(spark):
    import datetime

    from nspc_etl_basic_spark.operators.resample import rolling_time_agg

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("u", t0, 1, 10.0),
        ("u", t0 + datetime.timedelta(hours=12), 2, 20.0),
        ("u", t0 + datetime.timedelta(hours=30), 3, 40.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v double")
    out = {r["id"]: (r["rolling_n"], r["rolling_mean"]) for r in
           rolling_time_agg(df, "k", "ts", "v", window_seconds=86400).collect()}
    assert out[1] == (1, 10.0)
    assert out[2] == (2, 15.0)          # both within 24h
    assert out[3] == (2, 30.0)          # first row aged out of the frame
