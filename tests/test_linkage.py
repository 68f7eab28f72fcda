"""fuzzy_match: blocking recall and edit-distance verify, hand-sized."""

from __future__ import annotations

import pytest

from nspc_etl_basic_spark.operators.linkage import fuzzy_match


def _run(spark, left, right, **kw):
    ldf = spark.createDataFrame(left, "id long, name string")
    rdf = spark.createDataFrame(right, "id long, name string")
    return fuzzy_match(ldf, rdf, "id", "id", "name", "name", **kw).collect()


def test_fuzzy_match_finds_single_edits(spark):
    left = [(1, "salmon lemon"), (2, "forest green"), (3, "navy steel")]
    right = [
        (10, "salmon lemn"),    # deletion, d=1 (prefix block)
        (20, "forest grien"),   # substitution, d=1
        (30, "totally other"),  # no match
    ]
    got = {(r.id_l, r.id_r): r.distance for r in _run(spark, left, right)}
    assert got == {(1, 10): 1, (2, 20): 1}


def test_fuzzy_match_suffix_block_catches_prefix_edits(spark):
    # typo INSIDE the prefix key: prefix blocking misses, suffix catches
    left = [(1, "chartreuse plum")]
    right = [(11, "cjartreuse plum")]
    got = _run(spark, left, right)
    assert len(got) == 1 and got[0].distance == 1


def test_fuzzy_match_both_ends_edited_escapes_blocking(spark):
    # documented limitation: simultaneous edits at BOTH ends escape both
    # block keys even though the true distance is within bound
    left = [(1, "abcdefghij")]
    right = [(11, "xbcdefghix")]
    assert _run(spark, left, right) == []


def test_fuzzy_match_length_band_prunes(spark):
    left = [(1, "short")]
    right = [(11, "short plus far too much tail")]
    assert _run(spark, left, right, max_distance=2) == []


def test_fuzzy_match_is_case_insensitive_and_dedupes_dual_blocks(spark):
    # identical name matches through BOTH keys -> one row after distinct
    left = [(1, "Exact Name")]
    right = [(11, "exact name")]
    got = _run(spark, left, right)
    assert len(got) == 1 and got[0].distance == 0


def test_fuzzy_match_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        fuzzy_match(None, None, "a", "b", "c", "d", max_distance=-1)
    with pytest.raises(ValueError):
        fuzzy_match(None, None, "a", "b", "c", "d", block_len=0)
