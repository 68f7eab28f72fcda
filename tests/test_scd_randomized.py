"""Randomized SCD2 invariants: scd2_from_feed vs a pure-Python reference
model over seeded random change feeds, plus structural invariants
(interval partition, single current row, apply == rebuild)."""

from __future__ import annotations

import datetime

import numpy as np
import pytest

from nspc_etl_basic_spark.operators.scd import scd2_apply_changes, scd2_from_feed


def ref_scd2(rows):
    """Reference model: rows = [(k, ts, attr...)]; returns the set of
    (k, *attrs, valid_from, valid_to, is_current)."""
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)
    out = []
    for k, rs in by_key.items():
        rs = sorted(rs, key=lambda r: (r[1], r[-1]))  # (ts, tiebreak)
        compressed = []
        for r in rs:
            attrs = r[2:-1]
            if not compressed or compressed[-1][1] != attrs:
                compressed.append((r[1], attrs))
        for i, (ts, attrs) in enumerate(compressed):
            nxt = compressed[i + 1][0] if i + 1 < len(compressed) else None
            out.append((k, *attrs, ts, nxt, nxt is None))
    return set(out)


def _random_feed(rng, n_keys=8, n_rows=60):
    base = datetime.date(2024, 1, 1)
    rows = []
    for i in range(n_rows):
        k = int(rng.integers(0, n_keys))
        ts = base + datetime.timedelta(days=int(rng.integers(0, 40)))
        status = ["A", "B", "C"][int(rng.integers(0, 3))]
        qty = int(rng.integers(0, 3))
        rows.append((k, ts, status, qty, i))  # i = unique tiebreak
    # tiebreak must be unique per (k, ts) for determinism; i is globally unique
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_scd2_matches_reference_model(spark, seed):
    rng = np.random.default_rng(seed)
    rows = _random_feed(rng)
    feed = spark.createDataFrame(
        rows, "k INT, ts DATE, status STRING, qty INT, tb INT"
    )
    got = {
        (r["k"], r["status"], r["qty"], r["valid_from"], r["valid_to"],
         r["is_current"])
        for r in scd2_from_feed(
            feed, ["k"], "ts", ["status", "qty"], ["tb"]
        ).collect()
    }
    assert got == ref_scd2(rows)


@pytest.mark.parametrize("seed", [10, 11])
def test_scd2_invariants_and_incremental_consistency(spark, seed):
    rng = np.random.default_rng(seed)
    rows = _random_feed(rng, n_rows=50)
    cut = 35
    head, tail = rows[:cut], rows[cut:]
    schema = "k INT, ts DATE, status STRING, qty INT, tb INT"

    existing = scd2_from_feed(
        spark.createDataFrame(head, schema), ["k"], "ts", ["status", "qty"], ["tb"]
    )
    incr = scd2_apply_changes(
        existing, spark.createDataFrame(tail, schema),
        ["k"], "ts", ["status", "qty"],
    ).collect()

    # invariant 1: exactly one current row per key
    by_key: dict = {}
    for r in incr:
        by_key.setdefault(r["k"], []).append(r)
    for k, rs in by_key.items():
        assert sum(1 for r in rs if r["is_current"]) == 1
        # invariant 2: intervals chain without gaps or overlaps
        rs = sorted(rs, key=lambda r: r["valid_from"])
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"]
        assert rs[-1]["valid_to"] is None
        # invariant 3: consecutive intervals differ in attrs
        for a, b in zip(rs, rs[1:]):
            assert (a["status"], a["qty"]) != (b["status"], b["qty"])


@pytest.mark.parametrize("seed", [20, 21, 22])
def test_scd2_apply_equals_rebuild_for_in_order_batches(spark, seed):
    """apply == rebuild whenever the batch respects the CDC in-order
    assumption (every batch change postdates the key's existing history)
    — here guaranteed by a global time split."""
    rng = np.random.default_rng(seed)
    raw = _random_feed(rng, n_rows=80)
    # apply-changes requires one change per (key, ts): the table cannot
    # preserve tiebreaks of compressed history. Last-wins on tb.
    by_kts = {}
    for r in raw:
        k_ts = (r[0], r[1])
        if k_ts not in by_kts or r[4] > by_kts[k_ts][4]:
            by_kts[k_ts] = r
    rows = list(by_kts.values())
    cutoff = datetime.date(2024, 1, 20)
    head = [r for r in rows if r[1] < cutoff]
    tail = [r for r in rows if r[1] >= cutoff]
    schema = "k INT, ts DATE, status STRING, qty INT, tb INT"

    existing = scd2_from_feed(
        spark.createDataFrame(head, schema), ["k"], "ts",
        ["status", "qty"], ["tb"],
    )
    incr = scd2_apply_changes(
        existing, spark.createDataFrame(tail, schema),
        ["k"], "ts", ["status", "qty"], ["tb"],
    )
    full = scd2_from_feed(
        spark.createDataFrame(rows, schema), ["k"], "ts",
        ["status", "qty"], ["tb"],
    )
    assert sorted(map(tuple, incr.collect())) == sorted(
        map(tuple, full.collect())
    )
