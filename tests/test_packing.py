"""pack_greedy: hand-checked first-fit behavior, invariants, and
partition-layout independence."""

from __future__ import annotations

import pytest

from nspc_etl_basic_spark.operators.packing import pack_greedy


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, w long")


def _collect(df):
    return {r["k"]: r.asDict() for r in df.collect()}


def test_first_fit_hand_computed(spark):
    # single bucket so the walk order is just the ring order; replicate
    # the first-fit walk in python and compare exactly
    rows = [(f"d{i}", w) for i, w in enumerate([6, 3, 5, 2, 7, 1, 4])]
    out = pack_greedy(
        _df(spark, rows), "k", "w", seq_len=10, n_buckets=1
    )
    got = _collect(out)
    assert len(got) == len(rows)

    # replay: same ring order (md5 of salt||key), same first-fit
    import hashlib

    def ring(k):
        return int(hashlib.md5(f"pack{k}".encode()).hexdigest()[:8], 16)

    order = sorted(rows, key=lambda r: (ring(r[0]), r[0]))
    fills: list[int] = []
    expect = {}
    for k, w in order:
        placed = None
        for i, f in enumerate(fills):
            if f + w <= 10:
                placed = i
                break
        if placed is None:
            expect[k] = (len(fills), 0, 0)
            fills.append(w)
        else:
            seg = sum(1 for e in expect.values() if e[0] == placed)
            expect[k] = (placed, seg, fills[placed])
            fills[placed] += w
    for k, (b, s, o) in expect.items():
        r = got[k]
        assert (r["bin"], r["seg_id"], r["offset"]) == (b, s, o), k
        assert r["oversize"] is False


def test_invariants_many_buckets(spark):
    rows = [(f"doc{i}", 1 + (i * 37) % 200) for i in range(400)]
    seq_len = 256
    out = pack_greedy(
        _df(spark, rows), "k", "w", seq_len=seq_len, n_buckets=8
    ).collect()
    assert len(out) == 400
    by_bin: dict[tuple, list] = {}
    for r in out:
        assert not r["oversize"]
        by_bin.setdefault((r["bucket"], r["bin"]), []).append(r)
    for (_, _), members in by_bin.items():
        # capacity respected
        assert sum(m["w"] for m in members) <= seq_len
        # segment ids are 0..n-1 and offsets are the prefix sums in
        # placement (seg) order with no overlap
        members.sort(key=lambda m: m["seg_id"])
        assert [m["seg_id"] for m in members] == list(range(len(members)))
        pos = 0
        for m in members:
            assert m["offset"] == pos
            pos += m["w"]


def test_oversize_passthrough(spark):
    rows = [("small", 5), ("big", 50)]
    got = _collect(
        pack_greedy(_df(spark, rows), "k", "w", seq_len=10, n_buckets=2)
    )
    assert got["big"]["oversize"] is True
    assert got["big"]["bin"] is None
    assert got["small"]["oversize"] is False
    assert got["small"]["bin"] == 0


def test_layout_independent(spark):
    rows = [(f"x{i}", 1 + (i * 13) % 50) for i in range(200)]
    df = _df(spark, rows)
    a = sorted(
        map(tuple, pack_greedy(df, "k", "w", 64, n_buckets=4).collect())
    )
    b = sorted(
        map(
            tuple,
            pack_greedy(
                df.repartition(17), "k", "w", 64, n_buckets=4
            ).collect(),
        )
    )
    assert a == b


def test_validation(spark):
    with pytest.raises(ValueError):
        pack_greedy(_df(spark, [("a", 1)]), "k", "w", 0)
    with pytest.raises(ValueError):
        pack_greedy(_df(spark, [("a", 1)]), "k", "w", 10, n_buckets=0)
