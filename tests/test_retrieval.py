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


def test_rrf_fuse_hand_case(spark):
    import pytest

    from nspc_etl_basic_spark.operators.retrieval import RRF_SCALE, rrf_fuse

    schema = "query_id long, doc_id long, rank long"
    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], schema
    )
    dense = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], schema
    )
    rows = {
        r["doc_id"]: r for r in rrf_fuse([lex, dense], k=10, rrf_k=60).collect()
    }
    # doc 11 appears in both lists (ranks 2 and 1) and must win
    assert rows[11]["rank"] == 1 and rows[11]["n_lists"] == 2
    assert rows[11]["rrf_score"] == RRF_SCALE // 62 + RRF_SCALE // 61
    # single-list docs carry exactly their one reciprocal
    assert rows[10]["rrf_score"] == RRF_SCALE // 61
    assert rows[13]["rrf_score"] == RRF_SCALE // 62
    assert rows[12]["rrf_score"] == RRF_SCALE // 63
    # equal scores tie-break by ascending doc id: 10 (lex r1) vs
    # 13 (dense r2) -> 16393442 vs 16129032, no tie here; check order
    got = sorted(rows.values(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in got] == [11, 10, 13, 12]

    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([], k=5)
    with pytest.raises(ValueError, match="k must be positive"):
        rrf_fuse([lex], k=0)
    with pytest.raises(ValueError, match="rrf_k"):
        rrf_fuse([lex], k=5, rrf_k=-1)


def test_bm25_max_query_terms_prunes_rarest(spark):
    import pytest

    from nspc_etl_basic_spark.operators.retrieval import bm25_topk

    # 'common' appears in every doc (df=4, max); 'rare1'/'rare2' in one
    docs = spark.createDataFrame(
        [
            (1, "common rare1 alpha"),
            (2, "common rare2 beta"),
            (3, "common alpha beta"),
            (4, "common gamma delta"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(100, "common rare1 rare2")], "query_id long, query_text string"
    )
    exact = {r["doc_id"]: r["score_micro"]
             for r in bm25_topk(docs, q, k=10).collect()}
    pruned = {r["doc_id"]: r["score_micro"]
              for r in bm25_topk(docs, q, k=10, max_query_terms=2).collect()}
    # rarest-2 = rare1, rare2 (df=1 each) -> 'common' drops: docs 3/4
    # (matched only via 'common') disappear, 1/2 lose its contribution
    assert set(exact) == {1, 2, 3, 4}
    assert set(pruned) == {1, 2}
    assert pruned[1] < exact[1] and pruned[2] < exact[2]
    # N >= distinct query terms -> no-op, scores equal exact
    noop = {r["doc_id"]: r["score_micro"]
            for r in bm25_topk(docs, q, k=10, max_query_terms=3).collect()}
    assert noop == exact
    with pytest.raises(ValueError, match="max_query_terms"):
        bm25_topk(docs, q, k=10, max_query_terms=0)


def test_bm25_max_df_fraction_caps_common_terms(spark):
    import pytest

    from nspc_etl_basic_spark.operators.retrieval import bm25_topk

    # df profile over N=4: common=4 (100%), mid=2 (50%), rare1/rare2=1
    docs = spark.createDataFrame(
        [
            (1, "common mid rare1"),
            (2, "common mid rare2"),
            (3, "common alpha beta"),
            (4, "common gamma delta"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(100, "common mid rare1")], "query_id long, query_text string"
    )
    exact = {r["doc_id"]: r["score_micro"]
             for r in bm25_topk(docs, q, k=10).collect()}
    assert set(exact) == {1, 2, 3, 4}

    # cap at 50%: 'common' (df 4 > 2) drops, 'mid' (df 2 == 2) KEPT —
    # the predicate is <=, exactly df*1e6 <= ppm*N
    capped = {r["doc_id"]: r["score_micro"]
              for r in bm25_topk(docs, q, k=10, max_df_fraction=0.5).collect()}
    assert set(capped) == {1, 2}  # docs 3/4 matched only via 'common'
    assert capped[1] < exact[1] and capped[2] < exact[2]
    # the kept terms' contributions are unchanged: capped score equals
    # the exact score of the same query WITHOUT the capped term
    q_nocommon = spark.createDataFrame(
        [(100, "mid rare1")], "query_id long, query_text string"
    )
    manual = {r["doc_id"]: r["score_micro"]
              for r in bm25_topk(docs, q_nocommon, k=10).collect()}
    assert capped == manual

    # cap at 100%: nothing can exceed df=N -> no-op
    noop = {r["doc_id"]: r["score_micro"]
            for r in bm25_topk(docs, q, k=10, max_df_fraction=1.0).collect()}
    assert noop == exact

    # composes with max_query_terms: cap first (drops 'common'), then
    # rarest-1 keeps 'rare1' (df 1 < mid's 2)
    combo = {r["doc_id"]: r["score_micro"]
             for r in bm25_topk(
                 docs, q, k=10, max_df_fraction=0.5, max_query_terms=1
             ).collect()}
    q_rare1 = spark.createDataFrame(
        [(100, "rare1")], "query_id long, query_text string"
    )
    rare_only = {r["doc_id"]: r["score_micro"]
                 for r in bm25_topk(docs, q_rare1, k=10).collect()}
    assert combo == rare_only

    # every term capped -> no rows, retrieval semantics
    q_common = spark.createDataFrame(
        [(100, "common")], "query_id long, query_text string"
    )
    assert bm25_topk(docs, q_common, k=10, max_df_fraction=0.5).count() == 0

    with pytest.raises(ValueError, match="max_df_fraction"):
        bm25_topk(docs, q, k=10, max_df_fraction=0.0)
    with pytest.raises(ValueError, match="max_df_fraction"):
        bm25_topk(docs, q, k=10, max_df_fraction=1.5)


def test_hybrid_dense_leg_residual_recall_vs_ivf(spark, sf_dir):
    """The round-11 hybrid dense-leg swap (trained-IVF -> residual
    IVF-PQ) at the hybrid query's exact knobs: the residual tier reads
    16-byte codes instead of full vectors, so its recall of the exact
    cosine top-5 within the depth-10 shortlist may sit slightly BELOW
    the in-cell exact-cosine IVF leg (measured 10 vs 13 at sf0.001,
    15 vs 17 at sf0.01 of 25 exact) — pin that the gap stays bounded
    (>= 70% of the IVF leg's hits) and that both legs feed rrf_fuse
    the same (query_id, doc_id, rank) contract."""
    from nspc_etl_basic_spark.operators.pq import (
        ivf_residual_frame,
        ivfpq_residual_topk,
        train_pq_codebooks,
    )
    from nspc_etl_basic_spark.operators.retrieval import rrf_fuse
    from nspc_etl_basic_spark.operators.similarity import (
        KMEANS_SCALE,
        cosine_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_ivf_centroids(emb, n_cells=16, n_iter=3)
    books = train_pq_codebooks(
        ivf_residual_frame(emb, cents), m=16, k=16, n_iter=3,
        vec_col="__resid", id_col="vec_id",
    )
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = ivf_topk(emb, q, k=10, n_cells=16, n_probe=4, centroids=cents)
    res = ivfpq_residual_topk(
        emb, q, cents, books, k=10, n_probe=4, quantize_scale=KMEANS_SCALE
    )
    exact = cosine_topk(emb, q, k=5)

    def hits(a):
        return exact.join(
            a.select("query_id", "vec_id"), ["query_id", "vec_id"],
            "left_semi",
        ).count()

    h_ivf, h_res = hits(ivf), hits(res)
    assert h_ivf > 0 and h_res > 0
    assert h_res * 10 >= h_ivf * 7, (h_res, h_ivf)
    # both legs fuse under the same contract; every fused doc carries
    # at least one leg's reciprocal and n_lists counts the agreements
    legs = [
        x.select("query_id", F.col("vec_id").alias("doc_id"), "rank")
        for x in (ivf, res)
    ]
    fused = rrf_fuse(legs, k=10, rrf_k=60)
    rows = fused.collect()
    assert rows and all(1 <= r["n_lists"] <= 2 for r in rows)


def test_bm25_df_cap_randomized_vs_reference(spark):
    """Seeded-random corpora: the df-capped operator must equal the
    pure-Python reference scored over exactly the terms the integer
    predicate keeps (df * 1e6 <= round(f * 1e6) * N)."""
    import random
    import re

    rng = random.Random(1186)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(3):
        corpus = [
            (d, " ".join(rng.choices(vocab, k=rng.randint(3, 12))))
            for d in range(1, 9)
        ]
        qtext = " ".join(rng.choices(vocab, k=6))
        frac = rng.choice([0.25, 0.5, 0.75])
        docs = spark.createDataFrame(corpus, "doc_id long, text string")
        q = spark.createDataFrame(
            [(99, qtext)], "query_id long, query_text string"
        )
        got = {
            r["doc_id"]: r["score_micro"]
            for r in bm25_topk(
                docs, q, k=20, max_df_fraction=frac
            ).collect()
        }
        # independent kept-term set + reference scores
        tok = lambda t: re.findall(r"[a-z0-9']+", t.lower())
        df: dict = {}
        for _d, t in corpus:
            for w in set(tok(t)):
                df[w] = df.get(w, 0) + 1
        n = len(corpus)
        ppm = round(frac * 1_000_000)
        kept = [
            w for w in set(tok(qtext))
            if w in df and df[w] * 1_000_000 <= ppm * n
        ]
        expected = _ref_bm25(corpus, kept)
        assert got == expected, (trial, frac, kept)
