"""Unit tests for the sort-free exact top-fraction selection
(operators/selection.py) — the classifier-score keep stage."""

from __future__ import annotations

import random

import pytest

from nspc_etl_basic_spark.operators.selection import top_fraction


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score long")


def _expected(rows, frac):
    n = len([r for r in rows if r[1] is not None])
    k = int(n * frac)
    ordered = sorted(
        (r for r in rows if r[1] is not None),
        key=lambda r: (-r[1], r[0]),
    )
    return {r[0] for r in ordered[:k]}


def test_top_fraction_hand_case(spark):
    rows = [(1, 10), (2, 30), (3, 20), (4, 30), (5, 5)]
    got = {
        r.doc_id
        for r in top_fraction(_df(spark, rows), 0.6, "doc_id", "score").collect()
    }
    # k = 3: scores 30 (ids 2,4) then 20 (id 3)
    assert got == {2, 3, 4}


def test_top_fraction_tie_break_by_id(spark):
    rows = [(i, 7) for i in range(1, 11)]  # all tied
    got = {
        r.doc_id
        for r in top_fraction(_df(spark, rows), 0.5, "doc_id", "score").collect()
    }
    assert got == {1, 2, 3, 4, 5}  # smallest ids win the boundary


def test_top_fraction_edges_and_nulls(spark):
    rows = [(1, 10), (2, None), (3, 20)]
    df = _df(spark, rows)
    assert top_fraction(df, 0.0).count() == 0
    kept_all = {r.doc_id for r in top_fraction(df, 1.0).collect()}
    assert kept_all == {1, 3}  # null score never qualifies
    with pytest.raises(ValueError):
        top_fraction(df, 1.5)


def test_top_fraction_randomized_vs_sort(spark):
    rng = random.Random(80824)
    for trial in range(3):
        # heavy ties + wide magnitudes to cross bucket boundaries, plus
        # values past 2^53 to catch double-division bucketing
        rows = [
            (i, rng.choice([0, 1, 5, 5, 5, 10**6, 2**55 + rng.randrange(100)]))
            for i in range(1, 301)
        ]
        frac = rng.choice([0.1, 0.33, 0.77])
        got = {
            r.doc_id
            for r in top_fraction(
                _df(spark, rows), frac, "doc_id", "score"
            ).collect()
        }
        assert got == _expected(rows, frac), f"trial {trial}"


def test_top_fraction_k_is_exact_floor_not_float_product(spark):
    """k must be floor(frac * n) in exact decimal arithmetic. With
    frac = 1/3 (the float 0.3333333333333333) and n = 3 the float
    product rounds to exactly 1.0 (int() -> 1) while the exact decimal
    product is just below 1 — the floor contract keeps 0. A Fraction
    gives the caller full control (1/3 of 3 keeps exactly 1)."""
    from fractions import Fraction

    rows = [(1, 10), (2, 20), (3, 30)]
    assert top_fraction(_df(spark, rows), 1 / 3, "doc_id", "score").count() == 0
    got = {
        r.doc_id
        for r in top_fraction(
            _df(spark, rows), Fraction(1, 3), "doc_id", "score"
        ).collect()
    }
    assert got == {3}


def test_top_fraction_result_is_scan_filter(spark):
    # the selection must compile to a filter on the scan — no global
    # sort, no window, no exchange in the RESULT plan
    rows = [(i, i % 97) for i in range(1, 501)]
    out = top_fraction(_df(spark, rows), 0.25, "doc_id", "score")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan and "Window" not in plan
    assert "Exchange" not in plan


def _curve(spark, rows):
    # (threshold, precision_ppm, f1_ppm) — the classifier_pr_curve
    # columns select_by_pr_threshold reads
    return spark.createDataFrame(
        rows, "threshold long, precision_ppm long, f1_ppm long"
    )


def test_select_by_pr_threshold_max_f1_ties_highest_threshold(spark):
    from nspc_etl_basic_spark.operators.selection import (
        select_by_pr_threshold,
    )

    scored = _df(spark, [(1, 5), (2, 10), (3, 20), (4, 30)])
    curve = _curve(
        spark,
        [(30, 900000, 700000), (20, 800000, 800000), (10, 600000, 800000)],
    )
    # f1 tie at 800000 between thresholds 20 and 10 -> highest wins (20)
    got = {r.doc_id for r in select_by_pr_threshold(
        scored, curve, "score", "doc_id"
    ).collect()}
    assert got == {3, 4}


def test_select_by_pr_threshold_target_precision_maximizes_recall(spark):
    from nspc_etl_basic_spark.operators.selection import (
        select_by_pr_threshold,
    )

    scored = _df(spark, [(1, 5), (2, 10), (3, 20), (4, 30)])
    curve = _curve(
        spark,
        [(30, 950000, 500000), (20, 900000, 600000), (10, 600000, 700000)],
    )
    # precision floor 900000: thresholds 30 and 20 qualify; the LOWEST
    # qualifying threshold (20) keeps the most rows
    got = {r.doc_id for r in select_by_pr_threshold(
        scored, curve, "score", "doc_id", target_precision_ppm=900000
    ).collect()}
    assert got == {3, 4}
    # unreachable precision floor -> honest empty selection
    assert select_by_pr_threshold(
        scored, curve, "score", "doc_id", target_precision_ppm=990000
    ).isEmpty()
