"""BM25 retrieval (operators/retrieval.py): hand-computed scores,
ranking invariants, empty-overlap semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _queries(spark, rows):
    return spark.createDataFrame(rows, ["query_id", "query_text"])


def _ref_bm25(corpus, query_terms, k1=1.2, b=0.75):
    """Reference scores in the operator's integer-micros contract."""
    import re

    tok = lambda t: re.findall(r"[a-z0-9']+", t.lower())
    tfs = {d: {} for d, _ in corpus}
    for d, t in corpus:
        for w in tok(t):
            tfs[d][w] = tfs[d].get(w, 0) + 1
    n = len(corpus)
    total = sum(sum(tf.values()) for tf in tfs.values())
    avgdl = total / n
    df = {}
    for d in tfs:
        for w in tfs[d]:
            df[w] = df.get(w, 0) + 1
    out = {}
    for d in tfs:
        s = 0
        for w in set(query_terms):
            if w not in tfs[d]:
                continue
            idf = math.log((n - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
            sat = tfs[d][w] * (k1 + 1.0) / (
                tfs[d][w] + k1 * (1.0 - b + b * (sum(tfs[d].values()) / avgdl))
            )
            s += int(round(idf * sat * 1e6))
        if s:
            out[d] = s
    return out


def test_bm25_hand_case_matches_reference(spark):
    corpus = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "apple cherry cherry date"),
        (4, "elderberry fig"),
    ]
    got = {
        r["doc_id"]: r["score_micro"]
        for r in bm25_topk(
            _docs(spark, corpus),
            _queries(spark, [(100, "apple cherry")]),
            k=10,
        ).collect()
    }
    expected = _ref_bm25(corpus, ["apple", "cherry"])
    assert got == expected
    # doc 4 shares no term: absent, not zero-scored
    assert 4 not in got


def test_bm25_rank_order_and_tiebreak(spark):
    # two identical docs must tie on score and rank by ascending id
    corpus = [(1, "x y"), (2, "x y"), (3, "x x x x")]
    rows = bm25_topk(
        _docs(spark, corpus), _queries(spark, [(9, "x")]), k=3
    ).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows][1:] == [1, 2] or [
        r["doc_id"] for r in rows
    ][:2] == [1, 2]
    assert rows[0]["rank"] == 1
    scores = {r["doc_id"]: r["score_micro"] for r in rows}
    assert scores[1] == scores[2]


def test_bm25_no_overlap_yields_no_rows(spark):
    corpus = [(1, "alpha beta")]
    out = bm25_topk(
        _docs(spark, corpus), _queries(spark, [(5, "gamma")]), k=3
    )
    assert out.count() == 0


def test_bm25_validation(spark):
    with pytest.raises(ValueError, match="k must"):
        bm25_topk(
            _docs(spark, [(1, "a")]), _queries(spark, [(1, "a")]), k=0
        )
