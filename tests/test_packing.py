"""pack_greedy: hand-checked first-fit behavior, invariants, and
partition-layout independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_weightless_rows_kept_not_dropped(spark):
    # one row per INPUT row: zero/null-weight docs pass through with a
    # null bin and oversize=False (distinguishable from too-big)
    from nspc_etl_basic_spark.operators.packing import pack_incremental

    rows = [("ok", 5), ("zero", 0), ("nul", None), ("big", 50)]
    df = spark.createDataFrame(rows, "k string, w long")
    got = _collect(pack_greedy(df, "k", "w", seq_len=10, n_buckets=2))
    assert len(got) == 4
    for k in ("zero", "nul"):
        assert got[k]["bin"] is None and got[k]["oversize"] is False
    assert got["big"]["oversize"] is True
    empty_state = spark.createDataFrame(
        [], "bucket long, fills array<long>, counts array<long>"
    )
    got2 = _collect(
        pack_incremental(df, "k", "w", 10, empty_state, n_buckets=2)
    )
    assert {k: (v["bin"], v["oversize"]) for k, v in got.items()} == {
        k: (v["bin"], v["oversize"]) for k, v in got2.items()
    }


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


def test_incremental_empty_state_equals_from_scratch(spark):
    from nspc_etl_basic_spark.operators.packing import pack_incremental

    rows = [(f"x{i}", 1 + (i * 13) % 50) for i in range(150)]
    df = _df(spark, rows)
    empty_state = spark.createDataFrame(
        [], "bucket long, fills array<long>, counts array<long>"
    )
    a = sorted(map(tuple, pack_greedy(df, "k", "w", 64, n_buckets=4).collect()))
    b = sorted(
        map(
            tuple,
            pack_incremental(
                df, "k", "w", 64, empty_state, n_buckets=4
            ).collect(),
        )
    )
    assert a == b


def test_incremental_appends_without_moving_old(spark):
    from nspc_etl_basic_spark.operators.packing import (
        pack_incremental,
        pack_state,
    )

    old = _df(spark, [(f"old{i}", 1 + (i * 7) % 40) for i in range(80)])
    new = _df(spark, [(f"new{i}", 1 + (i * 11) % 40) for i in range(40)])
    seq_len, nb = 64, 4
    packed_old = pack_greedy(old, "k", "w", seq_len, n_buckets=nb)
    state = pack_state(packed_old, "w")
    inc = pack_incremental(new, "k", "w", seq_len, state, n_buckets=nb)
    old_rows = packed_old.collect()
    new_rows = inc.collect()
    assert len(new_rows) == 40
    # capacity holds over the UNION of old and new assignments, and new
    # docs' segments/offsets continue where the old bin left off
    by_bin: dict[tuple, list] = {}
    for r in [*old_rows, *new_rows]:
        assert not r["oversize"]
        by_bin.setdefault((r["bucket"], r["bin"]), []).append(r)
    for members in by_bin.values():
        assert sum(m["w"] for m in members) <= seq_len
        members.sort(key=lambda m: m["seg_id"])
        assert [m["seg_id"] for m in members] == list(range(len(members)))
        pos = 0
        for m in members:
            assert m["offset"] == pos
            pos += m["w"]


def test_pack_report_hand_computed(spark):
    from nspc_etl_basic_spark.operators.packing import pack_report

    rows = [("a", 6), ("b", 3), ("c", 5), ("big", 50)]
    packed = pack_greedy(_df(spark, rows), "k", "w", 10, n_buckets=1)
    rep = pack_report(packed, "w", 10).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r["n_docs"] == 3 and r["n_oversize"] == 1
    assert r["packed_tokens"] == 14
    assert r["pad_frac"] == round(1.0 - 14 / (r["n_bins"] * 10), 6)


def test_pack_report_passthrough_only_bucket_reports_zero_bins(spark):
    from nspc_etl_basic_spark.operators.packing import pack_report

    # every row oversize -> no bins anywhere; n_bins must be 0 (not
    # null) so downstream consumers don't null-propagate
    rows = [("big1", 50), ("big2", 99)]
    packed = pack_greedy(_df(spark, rows), "k", "w", 10, n_buckets=1)
    rep = pack_report(packed, "w", 10).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r["n_bins"] == 0 and r["n_docs"] == 0 and r["n_oversize"] == 2
    assert r["pad_frac"] is None


def test_pack_report_counts_distinct_bins_on_sparse_input(spark):
    from nspc_etl_basic_spark.operators.packing import (
        pack_incremental,
        pack_report,
        pack_state,
    )

    # old corpus fills several bins; a lone incremental slice touches
    # only some of them — n_bins must count bins TOUCHED, not max+1
    old = [("a", 9), ("b", 9), ("c", 9), ("d", 9)]
    new = [("z", 1)]
    seq_len, nb = 10, 1
    packed_old = pack_greedy(_df(spark, old), "k", "w", seq_len, n_buckets=nb)
    state = pack_state(packed_old, "w")
    inc = pack_incremental(
        _df(spark, new), "k", "w", seq_len, state, n_buckets=nb
    )
    inc_rows = inc.collect()
    assert len(inc_rows) == 1
    touched = {r["bin"] for r in inc_rows}
    rep = pack_report(inc, "w", seq_len).collect()
    assert rep[0]["n_bins"] == len(touched)
    # and over the dense union, countDistinct == max+1 (old behavior)
    union = packed_old.unionByName(inc)
    rep_u = pack_report(union, "w", seq_len).collect()
    n_bins_dense = max(r["bin"] for r in [*packed_old.collect(), *inc_rows]) + 1
    assert rep_u[0]["n_bins"] == n_bins_dense


def test_pack_materialize_hand_computed(spark):
    from nspc_etl_basic_spark.operators.packing import pack_materialize

    # one bucket, seq_len 10: a(6)->bin0, b(3)->bin0, c(5)->bin1;
    # "big" is oversize and must not appear in any sequence
    rows = [("a", 6), ("b", 3), ("c", 5), ("big", 50)]
    packed = pack_greedy(_df(spark, rows), "k", "w", 10, n_buckets=1)
    tok_rows = [
        ("a", [1, 2, 3, 4, 5, 6]),
        ("b", [7, 8, 9]),
        ("c", [10, 11, 12, 13, 14]),
        ("big", list(range(100, 150))),
    ]
    toks = spark.createDataFrame(tok_rows, ["k", "tokens"]).select(
        "k", F.col("tokens").cast("array<long>").alias("tokens")
    )
    out = {
        (r["bucket"], r["bin"]): r
        for r in pack_materialize(packed, toks, "k", seq_len=10).collect()
    }
    assert len(out) == 2
    first = out[(0, 0)]
    assert first["n_segments"] == 2 and first["fill"] == 9
    assert first["input_ids"] == [1, 2, 3, 4, 5, 6, 7, 8, 9, 0]
    assert first["segment_ids"] == [0, 0, 0, 0, 0, 0, 1, 1, 1, -1]
    second = out[(0, 1)]
    assert second["n_segments"] == 1 and second["fill"] == 5
    assert second["input_ids"] == [10, 11, 12, 13, 14, 0, 0, 0, 0, 0]
    assert second["segment_ids"] == [0, 0, 0, 0, 0, -1, -1, -1, -1, -1]


def test_validation(spark):
    with pytest.raises(ValueError):
        pack_greedy(_df(spark, [("a", 1)]), "k", "w", 0)
    with pytest.raises(ValueError):
        pack_greedy(_df(spark, [("a", 1)]), "k", "w", 10, n_buckets=0)


def test_pack_materialize_rejects_weight_token_disagreement(spark):
    """The fixed-length contract is enforced: tokens longer than the
    assignment weights claimed must raise, never silently emit a
    too-long sequence."""
    from nspc_etl_basic_spark.operators.packing import pack_materialize

    rows = [("a", 6), ("b", 3)]
    packed = pack_greedy(_df(spark, rows), "k", "w", 10, n_buckets=1)
    bad_toks = spark.createDataFrame(
        [("a", list(range(9))), ("b", list(range(9)))], ["k", "tokens"]
    ).select("k", F.col("tokens").cast("array<long>").alias("tokens"))
    with pytest.raises(Exception, match="exceed seq_len"):
        pack_materialize(packed, bad_toks, "k", seq_len=10).collect()
    # null tokens for a packed doc raise too
    null_toks = spark.createDataFrame(
        [("a", [1, 2, 3, 4, 5, 6]), ("b", None)], "k string, tokens array<long>"
    )
    with pytest.raises(Exception, match="null tokens"):
        pack_materialize(packed, null_toks, "k", seq_len=10).collect()


def test_pack_materialize_missing_key_raises(spark):
    """A packed key entirely ABSENT from the tokens table must raise,
    not silently shrink the sequence (the join is left-outer from the
    assignment precisely so the null-tokens guard sees missing keys)."""
    from nspc_etl_basic_spark.operators.packing import pack_materialize

    rows = [("a", 6), ("b", 3)]
    packed = pack_greedy(_df(spark, rows), "k", "w", 10, n_buckets=1)
    missing_b = spark.createDataFrame(
        [("a", [1, 2, 3, 4, 5, 6])], "k string, tokens array<long>"
    )
    with pytest.raises(Exception, match="cover every key"):
        pack_materialize(packed, missing_b, "k", seq_len=10).collect()


def test_pack_materialize_multimodal_missing_key_raises(spark):
    from pyspark.sql import functions as F

    from nspc_etl_basic_spark.operators.packing import (
        pack_greedy,
        pack_materialize_multimodal,
    )

    parts = spark.createDataFrame(
        [(1, [11, 12], [0, 0]), (2, [21], [0])],
        "k long, tokens array<long>, modality array<long>",
    )
    weights = parts.select("k", F.size("tokens").cast("long").alias("w"))
    assignment = pack_greedy(
        weights, key_col="k", weight_col="w", seq_len=8, n_buckets=1
    )
    with pytest.raises(Exception, match="cover every key"):
        pack_materialize_multimodal(
            assignment, parts.where("k = 1"), "k", seq_len=8
        ).collect()


def test_pack_materialize_multimodal_alignment_and_padding(spark):
    from nspc_etl_basic_spark.operators.packing import (
        pack_greedy,
        pack_materialize_multimodal,
    )
    from pyspark.sql import functions as F

    # doc 1: 3 text tokens + 2 patch tokens; doc 2: text only
    parts = spark.createDataFrame(
        [
            (1, [11, 12, 13, 901, 902], [0, 0, 0, 1, 1]),
            (2, [21, 22], [0, 0]),
        ],
        "k long, tokens array<long>, modality array<long>",
    )
    weights = parts.select(
        "k", F.size("tokens").cast("long").alias("w")
    )
    assignment = pack_greedy(
        weights, key_col="k", weight_col="w", seq_len=8, n_buckets=1
    )
    out = pack_materialize_multimodal(
        assignment, parts, "k", seq_len=8
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["fill"] == 7 and r["n_segments"] == 2
    assert len(r["input_ids"]) == 8
    assert len(r["segment_ids"]) == 8
    assert len(r["modality_ids"]) == 8
    # per-position alignment: each doc's modality block rides with its
    # tokens; padding gets pad_id/pad_seg/pad_mod
    by_seg = {}
    for tok, seg, mod in zip(
        r["input_ids"], r["segment_ids"], r["modality_ids"]
    ):
        by_seg.setdefault(seg, []).append((tok, mod))
    assert by_seg[-1] == [(0, -1)]  # one pad position
    flat = sorted(
        (tok, mod) for seg, tm in by_seg.items() if seg >= 0 for tok, mod in tm
    )
    assert flat == sorted(
        [(11, 0), (12, 0), (13, 0), (901, 1), (902, 1), (21, 0), (22, 0)]
    )


def test_pack_materialize_multimodal_rejects_misaligned(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F

    from nspc_etl_basic_spark.operators.packing import (
        pack_greedy,
        pack_materialize_multimodal,
    )

    parts = spark.createDataFrame(
        [(1, [11, 12], [0])],  # modality shorter than tokens
        "k long, tokens array<long>, modality array<long>",
    )
    weights = parts.select("k", F.size("tokens").cast("long").alias("w"))
    assignment = pack_greedy(
        weights, key_col="k", weight_col="w", seq_len=8, n_buckets=1
    )
    with _pytest.raises(Exception) as ei:
        pack_materialize_multimodal(assignment, parts, "k", seq_len=8).collect()
    assert "position-aligned" in str(ei.value)
