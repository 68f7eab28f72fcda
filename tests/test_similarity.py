"""Similarity-operator guards: the failure modes that only show up at
scale (dimension-collapsed LSH signatures, unbounded exact crossJoin)
must fail loudly at small scale instead of silently degrading."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.similarity import (
    cosine_topk,
    rp_lsh_topk,
    rp_signature,
)


def _vec_df(spark, n, dim, id_col="vec_id"):
    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, f"{id_col} long, embedding array<double>")


def test_rp_signature_matching_dim_produces_spread_buckets(spark):
    df = _vec_df(spark, 40, 16)
    sigs = [
        r.sig
        for r in df.select(rp_signature(F.col("embedding"), 8, dim=16).alias("sig")).collect()
    ]
    # dimension-adaptive contract: real signatures, not the all-zero collapse
    assert len(set(sigs)) > 1


def test_rp_signature_dim_mismatch_raises_not_collapses(spark):
    df = _vec_df(spark, 5, 16)
    out = df.select(rp_signature(F.col("embedding"), 8, dim=64).alias("sig"))
    with pytest.raises(Exception, match="rp_signature"):
        out.collect()


def test_rp_lsh_topk_threads_dim(spark):
    corpus = _vec_df(spark, 30, 16)
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = rp_lsh_topk(corpus, queries, k=3, dim=16).collect()
    assert len(res) > 0
    assert all(r.rank <= 3 for r in res)
    # mismatched dim surfaces as an error, not an O(n^2) single bucket
    with pytest.raises(Exception, match="rp_signature"):
        rp_lsh_topk(corpus, queries, k=3, dim=64).collect()


def test_cosine_topk_guard_trips_above_bound(spark):
    corpus = _vec_df(spark, 20, 8)
    queries = corpus.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="max_queries"):
        cosine_topk(corpus, queries, k=2, max_queries=10)


def test_cosine_topk_guard_allows_bounded_and_disabled(spark):
    corpus = _vec_df(spark, 20, 8)
    queries = corpus.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bounded = cosine_topk(corpus, queries, k=2, max_queries=10).collect()
    disabled = cosine_topk(corpus, queries, k=2, max_queries=None).collect()
    assert sorted(map(tuple, bounded)) == sorted(map(tuple, disabled))
    assert {r.query_id for r in bounded} == {0, 1, 2, 3}


def test_train_ivf_centroids_recovers_separated_clusters(spark):
    """Lloyd's on three well-separated clusters must move each centroid
    to (near) its cluster mean, and trained-codebook IVF must assign
    members to their own cluster's cell."""
    import numpy as np

    from nspc_etl_basic_spark.operators.similarity import (
        ivf_centroids,
        train_ivf_centroids,
    )

    rng = np.random.default_rng(42)
    centers = np.array(
        [[10.0] + [0.0] * 7, [0.0] * 4 + [10.0] + [0.0] * 3, [-10.0] + [0.0] * 7]
    )
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(30):
            rows.append((vid, (c + rng.normal(0, 0.3, 8)).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    trained = train_ivf_centroids(df, n_cells=3, n_iter=6)
    assert len(trained) == 3
    got = np.array(sorted([c for _, c in trained], key=lambda v: v[0]))
    exp = np.array(sorted(centers.tolist(), key=lambda v: v[0]))
    # each trained centroid lands within the cluster noise of a true center
    assert np.abs(got - exp).max() < 0.5, got

    # and training strictly refines the naive lowest-id init (which picks
    # 3 vectors from the SAME first cluster)
    naive = ivf_centroids(df, n_cells=3)
    naive_spread = np.array([c for _, c in naive]).std(axis=0).max()
    trained_spread = got.std(axis=0).max()
    assert trained_spread > naive_spread  # centroids actually separated


def test_trained_ivf_centroids_beat_seed_on_clustered_data(spark):
    """On data with real cluster structure (the case IVF exists for),
    the k-means codebook clearly beats the deterministic lowest-id seed:
    seeded centroids all land in whichever clusters the lowest ids
    happen to occupy, so probes miss entire clusters; Lloyd iterations
    spread the codebook out. This is the value claim behind the
    sim_ann_ivf_trained driver query (rows-only checked there because
    float centroid means are not cross-engine deterministic)."""
    import numpy as np
    from pyspark.sql import functions as F

    from nspc_etl_basic_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    rng = np.random.default_rng(3)
    dim, n_clusters, per = 16, 8, 60
    centers = rng.normal(0, 1, (n_clusters, dim))
    rows = []
    vid = 0
    # lowest ids all in cluster 0 -> the seed codebook collapses there
    for c in range(n_clusters):
        for _ in range(per):
            v = centers[c] + rng.normal(0, 0.05, dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    queries = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5).select("query_id", "vec_id")
    n_exact = exact.count()

    def recall(centroids):
        approx = ivf_topk(
            emb, queries, k=5, n_cells=8, n_probe=2, centroids=centroids
        ).select("query_id", "vec_id")
        return (
            exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
            / n_exact
        )

    trained = train_ivf_centroids(emb, n_cells=8, n_iter=5)
    r_trained = recall(trained)
    r_seed = recall(None)
    assert r_trained > r_seed, (r_trained, r_seed)
    assert r_trained >= 0.9, r_trained


def test_knn_graph_finds_planted_neighbors(spark):
    """Two tight clusters + an isolated point: kNN edges stay within
    clusters and rank by cosine."""
    import random

    from nspc_etl_basic_spark.operators.similarity import knn_graph

    rng = random.Random(7)
    dim = 64

    def noisy(base, eps):
        return [b + rng.uniform(-eps, eps) for b in base]

    c1 = [1.0] * 32 + [0.0] * 32
    c2 = [0.0] * 32 + [1.0] * 32
    rows = []
    for i in range(5):
        rows.append((i, noisy(c1, 0.01)))
        rows.append((100 + i, noisy(c2, 0.01)))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = knn_graph(df, k=2, n_tables=2, max_bucket_size=None).collect()
    assert got, "no edges found"
    for r in got:
        same_cluster = (r.vec_id < 100) == (r.nbr_id < 100)
        assert same_cluster, (r.vec_id, r.nbr_id)
        assert r.cos_sim > 0.99
    # every point got at most k edges, ranked 1..k
    from collections import Counter

    per = Counter(r.vec_id for r in got)
    assert all(v <= 2 for v in per.values())


def test_knn_graph_multi_table_recall_superset(spark):
    """Adding a second table can only grow the candidate set: every
    1-table edge set is a subset of the same-k 2-table edges' pairs
    union (per-point top-k may swap, so compare candidate coverage
    via edge existence at k large enough to keep all)."""
    import random

    from nspc_etl_basic_spark.operators.similarity import knn_graph

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    one = {(r.vec_id, r.nbr_id) for r in knn_graph(df, k=30, n_tables=1, max_bucket_size=None).collect()}
    two = {(r.vec_id, r.nbr_id) for r in knn_graph(df, k=30, n_tables=2, max_bucket_size=None).collect()}
    assert one <= two
