"""Bucketed range join (operators/interval.py): containment semantics,
bucket-boundary spanning, multi-match, left-join NULLs, and the
no-nested-loop plan contract."""

from __future__ import annotations

import datetime

from nspc_etl_basic_spark.operators.interval import interval_join


def _ts(m, s=0):
    return datetime.datetime(2024, 1, 1, 0, m, s)


def _fixtures(spark):
    points = spark.createDataFrame(
        [
            (1, 1, _ts(5)),
            (2, 1, _ts(59, 59)),  # straddles the 1-bucket boundary
            (3, 1, _ts(30)),
            (4, 2, _ts(5)),       # other key: no intervals
        ],
        "id long, k long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (10, 1, _ts(0), _ts(10)),    # contains p1
            (11, 1, _ts(55), _ts(59, 59)),  # end == p2.ts (inclusive)
            (12, 1, _ts(25), _ts(35)),   # contains p3
            (13, 1, _ts(28), _ts(32)),   # ALSO contains p3 (multi-match)
        ],
        "iid long, k long, start timestamp, end timestamp",
    )
    return points, intervals


def test_interval_join_containment_and_multimatch(spark):
    points, intervals = _fixtures(spark)
    out = interval_join(points, intervals, by=["k"], bucket_seconds=600)
    got = sorted((r.id, r.iid) for r in out.collect())
    assert got == [(1, 10), (2, 11), (3, 12), (3, 13)]


def test_interval_join_small_buckets_spanning(spark):
    """Intervals longer than the bucket width explode into several
    buckets; results are identical (each point is in exactly one bucket,
    so no dedup is ever needed)."""
    points, intervals = _fixtures(spark)
    out = interval_join(points, intervals, by=["k"], bucket_seconds=60)
    got = sorted((r.id, r.iid) for r in out.collect())
    assert got == [(1, 10), (2, 11), (3, 12), (3, 13)]


def test_interval_join_left_keeps_unmatched(spark):
    points, intervals = _fixtures(spark)
    out = interval_join(points, intervals, by=["k"], bucket_seconds=600, how="left")
    rows = {r.id: r.iid for r in out.collect() if r.id == 4}
    assert rows == {4: None}
    assert out.count() == 5  # 4 matches + 1 unmatched point


def test_interval_join_plans_hash_join_not_nested_loop(spark):
    points, intervals = _fixtures(spark)
    out = interval_join(points, intervals, by=["k"], bucket_seconds=600)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
