"""setjoin_exact: no false negatives vs brute force, integer-exact
threshold cut, and the prefix index only helps (never changes answers)."""

from __future__ import annotations

import itertools

import pytest

from nspc_etl_basic_spark.operators.dedup import setjoin_exact


def _brute(docs, t=0.6):
    import re

    toks = {i: set(re.findall(r"[a-z0-9']+", s.lower())) for i, s in docs}
    out = set()
    for (ia, _), (ib, _) in itertools.combinations(docs, 2):
        a, b = toks[ia], toks[ib]
        if not a or not b:
            continue
        c = len(a & b)
        u = len(a | b)
        if c * 1_000_000 >= int(t * 1_000_000) * u:
            out.add((min(ia, ib), max(ia, ib)))
    return out


def test_exactness_vs_brute_force(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over a lazy dog"),   # near-dup of 1
        (3, "completely different words entirely here now"),
        (4, "quick brown fox dog lazy jumps the over"),     # same set as 1
        (5, "the quick brown cat naps under the lazy dog"),
        (6, ""),                                            # empty doc
        (7, "words entirely different completely here now"),  # set-dup of 3
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in setjoin_exact(df, threshold_ppm=600_000, shingle_k=None).collect()
    }
    assert got == _brute(docs, 0.6)
    assert (1, 4) in got  # identical token SETS
    assert (3, 7) in got


def test_jaccard_values_are_exact(spark):
    # docs with token sets {a,b,c,d,e} and {a,b,c,d,f}: J = 4/6
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string"
    )
    rows = setjoin_exact(df, threshold_ppm=600_000, shingle_k=None).collect()
    assert len(rows) == 1
    assert rows[0]["n_common"] == 4
    assert rows[0]["jaccard"] == pytest.approx(4 / 6, abs=1e-6)


def test_threshold_cut_is_integer_exact(spark):
    # J exactly 0.6: {a,b,c} vs {a,b,c,d,e}: c=3, u=5 -> 3/5 = 0.6
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e")], "doc_id long, text string"
    )
    assert setjoin_exact(df, threshold_ppm=600_000, shingle_k=None).count() == 1  # >= keeps
    assert setjoin_exact(df, threshold_ppm=600_001, shingle_k=None).count() == 0


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        setjoin_exact(df, threshold_ppm=0, shingle_k=None)


def test_shingle_mode_finds_near_dups_not_template_matches(spark):
    base = "the patient record was processed on monday with code "
    docs = [
        (1, base + "alpha seven"),
        (2, base + "alpha sevem"),   # one-char edit: shingle near-dup
        (3, "completely unrelated content about gardening and soil"),
        # same VOCABULARY as 1, different order: word-dup, shingle-far
        (4, "code was the monday patient on with processed record alpha seven "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in setjoin_exact(df, threshold_ppm=600_000, shingle_k=8).collect()
    }
    assert (1, 2) in got
    assert (1, 4) not in got  # shuffled words share vocab, not shingles
