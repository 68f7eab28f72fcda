"""chi2_drift: hand-computed contingency statistics."""

from __future__ import annotations

import pytest

from nspc_etl_basic_spark.operators.drift import chi2_drift


def _chi2(rows):
    """Independent recomputation with plain Python floats."""
    cats = sorted({c for c, _f in rows})
    na = {c: sum(1 for cc, f in rows if cc == c and not f) for c in cats}
    nb = {c: sum(1 for cc, f in rows if cc == c and f) for c in cats}
    ta, tb = sum(na.values()), sum(nb.values())
    n = ta + tb
    chi2 = 0.0
    for c in cats:
        rt = na[c] + nb[c]
        ea, eb = rt * ta / n, rt * tb / n
        cell = 0.0
        if ea > 0:
            cell += (na[c] - ea) ** 2 / ea
        if eb > 0:
            cell += (nb[c] - eb) ** 2 / eb
        chi2 += round(cell, 6)
    return round(chi2, 6)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "category string, in_b boolean")
    return chi2_drift(df, "category", "in_b").collect()


def test_chi2_zero_when_distributions_identical(spark):
    rows = [(c, f) for c in ("x", "y") for f in (False, True) for _ in range(5)]
    got = _run(spark, rows)
    assert all(r.chi2 == 0.0 and r.contrib == 0.0 for r in got)
    assert got[0].dof == 1


def test_chi2_matches_hand_computation(spark):
    rows = (
        [("x", False)] * 30 + [("x", True)] * 10
        + [("y", False)] * 10 + [("y", True)] * 30
        + [("z", False)] * 5 + [("z", True)] * 5
    )
    got = _run(spark, rows)
    expect = _chi2(rows)
    assert got[0].chi2 == pytest.approx(expect, abs=2e-6)
    assert got[0].dof == 2
    by_cat = {r.category: r for r in got}
    assert by_cat["x"].obs_a == 30 and by_cat["x"].obs_b == 10
    # z is balanced relative to its size but the slices are 45/45 ->
    # expected 5/5 -> zero contribution
    assert by_cat["z"].contrib == 0.0


def test_chi2_category_absent_from_one_slice(spark):
    rows = [("only_a", False)] * 4 + [("both", False)] * 4 + [("both", True)] * 8
    got = {r.category: r for r in _run(spark, rows)}
    assert got["only_a"].obs_b == 0
    assert got["only_a"].contrib > 0  # full absence is maximal drift signal
